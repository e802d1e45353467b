package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway component timer for cost attribution (not part of any
  * contract; contents change per investigation). Current: is the
  * mid-suite sentinel elevation (probe mins 1.2-1.45x the quiet-JVM
  * baseline, flagging every hands-off prodcold run contended) caused by
  * OUR OWN JVM's GC debt — testable by reading the sentinel with and
  * without a System.gc() right after a heavy query burst. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(2000000000L).selectExpr("sum(id * 2 + 1) as s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // quiet-JVM baseline
    val base = (1 to 3).map(_ => sentinel()).min
    println(f"[scratch] baseline: $base%.3f")
    val sfDir = "/root/testdata/sf0.1"
    for (round <- 1 to 3) {
      // heavy burst: a few expensive queries, prodcold style
      Seq("q94_copurchase_pagerank", "q112_corpus_prep2", "q81_incremental_dedup",
          "q92_bm25_topk", "q132_sorted_neighborhood").foreach { n =>
        spark.catalog.clearCache()
        graft.operators.LoopCache.clearMemo()
        graft.Queries.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      val raw1 = sentinel(); val raw2 = sentinel()
      val gt0 = System.nanoTime(); System.gc()
      val gcs = (System.nanoTime() - gt0) / 1e9
      val g1 = sentinel(); val g2 = sentinel()
      println(f"[scratch] round $round: raw min ${math.min(raw1, raw2)}%.3f " +
        f"(${raw1}%.3f/${raw2}%.3f)  gc took $gcs%.3f  " +
        f"post-gc min ${math.min(g1, g2)}%.3f ($g1%.3f/$g2%.3f)")
    }
    spark.stop()
  }
}
