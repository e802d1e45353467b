package graft.tools
import org.apache.spark.sql.SparkSession
import graft.Queries

/** Scratch probe replicating Bench's PRODUCTION-COLD protocol for a
  * subset of queries: one JVM, codegen warmed on sf0.001, then each
  * named query timed with caches + operator memos dropped first — the
  * "first run of the day per query" tier, without the full-suite cost
  * of SPARK_GRAFT_BENCH_MODE=prodcold. */
object ProdColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Queries.benchNames
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup mode: "all" warms every query once on tiny data (untimed),
    // anything else warms only the first (Bench's current protocol)
    val warmAll = sys.env.get("PROBE_WARMUP").contains("all")
    val wt0 = System.nanoTime()
    (if (warmAll) names.distinct else names.headOption.toSeq).foreach { n =>
      try Queries.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    println(f"[prodcold] warmup(warmAll=$warmAll, sf0.001): ${(System.nanoTime() - wt0) / 1e9}%.3f s")
    spark.catalog.clearCache()
    graft.operators.LoopCache.clearMemo()
    var total = 0.0
    names.foreach { n =>
      spark.catalog.clearCache()
      graft.operators.LoopCache.clearMemo()
      val t0 = System.nanoTime()
      Queries.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      total += s
      println(f"[prodcold] $n: $s%.3f s")
    }
    println(f"[prodcold] TOTAL ${total}%.3f s over ${names.size} queries")
    spark.stop()
  }
}
