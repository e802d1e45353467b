package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway component timer for cost attribution (not part of any
  * contract; contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SCRATCH_OHA_THRESHOLD", "128"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warmup
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    import graft.operators.{Dedup, Staging}
    val docs = graft.Tables.rebalance(
      graft.Tables.documents(spark, sfDir).select("doc_id", "text"))
    val sigs = graft.Tables.rebalance(
      Staging.stagedOrDerive(spark, "minhash_sigs",
          Seq(graft.Tables.path(sfDir, "documents"))) {
        Dedup.minHashSignatures(docs, "doc_id", "text")
      })
    time("staged sigs count") { println(sigs.count()) }
    val newSigs = sigs.filter(col("doc_id") % 5 === 0)
    val oldSigs = sigs.filter(col("doc_id") % 5 =!= 0)
    val tagged = newSigs.select(col("doc_id").cast("long").as("id"), col("sig"),
        lit(true).as("is_new"))
      .union(oldSigs.select(col("doc_id").cast("long").as("id"), col("sig"),
        lit(false).as("is_new")))
    time("tagged union count") { println(tagged.count()) }
    val bandCols = Dedup.bandStructs(64, 16)
    val buckets = tagged
      .select(col("id"), col("is_new"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("is_new"), col("bb.band"), col("bb.bucket"))
    time("buckets explode count") { println(buckets.count()) }
    import graft.functions.BoundedCollectLongs.boundedCollectLongs
    val gathered = buckets.groupBy(col("band"), col("bucket"))
      .agg(
        boundedCollectLongs(when(col("is_new"), col("id")), 200).as("new_ids"),
        boundedCollectLongs(when(!col("is_new"), col("id")), 200).as("old_ids"))
      .filter(col("new_ids").isNotNull && col("old_ids").isNotNull &&
        size(col("new_ids")) >= 1)
    time("gathered count") { println(gathered.count()) }
    time("incremental candidates") {
      println(Dedup.incrementalLshCandidatePairs(newSigs, oldSigs, "doc_id").count())
    }
    spark.stop()
  }
}
