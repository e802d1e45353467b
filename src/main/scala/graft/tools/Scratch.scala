package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway component timer for cost attribution (not part of any
  * contract; contents change per investigation). Current: dump the
  * physical plan of one loop-tuned PageRank round to confirm the
  * intended shape — stationary adjacency side read from cache with NO
  * Exchange and NO Sort above it, only the node-sized rank table
  * moving. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    val adj = graft.Tables.copurchaseAdjacency(spark, sfDir)
    val nodes = graft.Tables.copurchaseNodes(spark, sfDir)
    // mirror fixedPointAdj's internals for ONE round and dump the plan
    import graft.operators.LoopCache
    val a0 = adj.select(col("src").cast("long").as("src"),
      col("outdeg").cast("long").as("outdeg"),
      col("dsts").cast("array<long>").as("dsts"))
    val w = LoopCache.loopWidth(spark, LoopCache.pinnedRow(
      a0.agg(coalesce(sum(col("outdeg")), lit(0L)))).getLong(0))
    println(s"=== loop width: $w")
    val a = LoopCache.tunedInputs(w, a0).head
      .repartition(w, col("src")).sortWithinPartitions("src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    a.count() // materialize the stationary cache
    val r1 = a.withColumn("r", lit(1000000L))
      .select(expr("(r * 85L) div (100L * outdeg)").as("c"),
        explode(col("dsts")).as("dst"))
      .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      .select(col("dst").as("id"), (lit(1L) + col("contrib")).as("r"))
    val round2 = a.join(r1, col("src") === col("id"), "left")
      .withColumn("r", coalesce(col("r"), lit(7L)))
      .select(expr("(r * 85L) div (100L * outdeg)").as("c"),
        explode(col("dsts")).as("dst"))
      .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
    println("=== round-2 executed plan (tuned session) ===")
    println(round2.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
