package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-rounds cost probe for the k-core peel (companion to the BFS
  * diameter probe, SCALE.md round 14): times `KCore.survivorsAdj` at
  * increasing round budgets on the same corpus. The peel's alive set
  * SHRINKS monotonically and usually fixes within a few rounds, but an
  * adversarial layering (a long chain peels one layer per round) can
  * need deep rounds — this measures whether the plan-identity loop's
  * per-round cost stays flat there the way the re-rooted BFS now does.
  *
  * Usage: tools/run_main.sh graft.tools.KCoreDepthProbe DIR k R1 [R2...]
  */
object KCoreDepthProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args(0)
    val k = args(1).toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- args.drop(2).map(_.toInt)) {
      spark.catalog.clearCache()
      graft.operators.LoopCache.clearMemo()
      val t0 = System.nanoTime()
      val n = graft.operators.KCore
        .survivorsAdj(graft.Tables.copurchaseAdjacency(spark, dir), k, r)
        .count()
      println(f"[kcore-depth] rounds=$r%-3d survivors=$n%-8d " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
