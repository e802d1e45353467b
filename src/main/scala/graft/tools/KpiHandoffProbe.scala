package graft.tools

import org.apache.spark.sql.SparkSession

/** Fixed-data attribution probe for the r16 q03 warm-tier jump
  * (VERDICT r16 #4: 0.29 -> 1.02 s round-over-round with QueriesKpi
  * untouched). q03 re-aggregates the KB-sized staged KPI frame
  * (QueriesKpi.kpiStaged: persist + memo), so a warm run should cost
  * ~the aggregate over a pinned table; ~1 s means the KPI got
  * recomputed from events instead. This probe times, in one fresh JVM
  * on one corpus, with Bench's exact noop-sink protocol:
  *
  *   1. q03 cold (pays the KPI materialization),
  *   2. q03 warm ×3 (rides the pin),
  *   3. an INTERFERENCE pass (a comma-separated query list — e.g. the
  *      17 r16 newcomers, or the full registry) run once each,
  *   4. q03 warm ×3 again.
  *
  * If (4) ≈ (2), the pin survives the pass and the r16 reading was
  * measurement noise; if (4) ≈ (1), something in the pass evicts or
  * shadows the staged KPI and the diff names the culprit by bisecting
  * the list.
  *
  * Usage: tools/run_main.sh graft.tools.KpiHandoffProbe SF_DIR
  *          [q148_budget_select,q149_...|all]
  */
object KpiHandoffProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val interference: Seq[graft.Queries.Q] =
      if (args.length > 1) {
        if (args(1) == "all") graft.Queries.registry.filter(_.bench)
        else {
          val names = args(1).split(",").map(_.trim).toSet
          graft.Queries.registry.filter(q => names.contains(q.name))
        }
      } else Nil
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", "16777216")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q03 = graft.Queries.registry.find(_.name == "q03_report_endpoint").get

    def time(q: graft.Queries.Q): Double = {
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // codegen warmup at sf0.001 (Bench does this for every query)
    (q03 +: interference).foreach { q =>
      try q.fn(spark, "/root/testdata/sf0.001").write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    graft.operators.LoopCache.clearMemo()

    val cold = time(q03)
    val warmBefore = (1 to 3).map(_ => time(q03))
    println(f"[probe] q03 cold=$cold%.2f s  warm_before=" +
      warmBefore.map(s => f"$s%.2f").mkString(","))
    if (interference.nonEmpty) {
      val t0 = System.nanoTime()
      interference.foreach { q =>
        try time(q)
        catch { case e: Throwable =>
          System.err.println(s"[probe] interference ${q.name} failed: " +
            e.getMessage)
        }
      }
      println(f"[probe] interference pass: ${interference.size} queries, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      val warmAfter = (1 to 3).map(_ => time(q03))
      println(f"[probe] q03 warm_after=" +
        warmAfter.map(s => f"$s%.2f").mkString(",") +
        f"  (before_min=${warmBefore.min}%.2f after_min=${warmAfter.min}%.2f)")
    }
    spark.stop()
  }
}
