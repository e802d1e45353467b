package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Scratch profiler for the MinHash→LSH pipeline: times each stage in
  * isolation to locate the hot loop (not part of the driver contract). */
object LshProbe {
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
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    time("docs scan")(docs.write.format("noop").mode("overwrite").save())
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text")
    time("signatures")(sigs.write.format("noop").mode("overwrite").save())
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id")
    time("full lsh pairs")(pairs.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
