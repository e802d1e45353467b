package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway component timer for cost attribution (not part of any
  * contract; contents change per investigation). Current: full 5-round
  * adjacency PageRank under different engine configs, to size the
  * per-round scheduling overhead (q94 cold ≈ 5 s). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val parts = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    println(s"[scratch] aqe=$aqe parts=$parts")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // mirror q94's full operator, fresh per run (clear cache+memo like prodcold)
    def run(): Unit = {
      spark.catalog.clearCache()
      graft.operators.LoopCache.clearMemo()
      val adj = graft.Tables.copurchaseAdjacency(spark, sfDir)
      val nodes = graft.Tables.copurchaseNodes(spark, sfDir)
      graft.operators.PageRank.fixedPointAdj(adj, nodes, iterations = 5)
        .write.format("noop").mode("overwrite").save()
    }
    time("warmup (sf0.001-ish: first call, codegen)") { run() }
    time("prodcold run 1") { run() }
    time("prodcold run 2") { run() }
    spark.stop()
  }
}
