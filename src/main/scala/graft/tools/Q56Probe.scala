package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, QueriesPipeline}
import graft.functions.TextFunctions

/** Scratch stage timer for the q56 corpus-prep pipeline (not part of the
  * driver contract). */
object Q56Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); f
      println(f"[probe] $label: ${math.min(t1 - t0, System.nanoTime() - t1) / 1e9}%.3f s")
    }
    val d = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "source", "text"))
    time("scan+rebalance")(d.write.format("noop").mode("overwrite").save())
    val quality = d
      .withColumn("q", TextFunctions.qualityMetrics(col("text")))
      .filter(col("q.quality_ok"))
      .select(col("doc_id"), col("source"), col("text"),
        col("q.n_tokens").as("n_tokens"))
    time("quality")(quality.write.format("noop").mode("overwrite").save())
    val deduped = graft.operators.Dedup.exactDedup(quality, "doc_id", "text")
    time("dedup")(deduped.write.format("noop").mode("overwrite").save())
    val sampled = graft.operators.Sampling.stratifiedLehmerSample(
      deduped, "source", "doc_id", QueriesPipeline.sampleRates)
    time("sample")(sampled.write.format("noop").mode("overwrite").save())
    time("full q56")(QueriesPipeline.corpusPrep(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
