package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway component timer for cost attribution (not part of any
  * contract; contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
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
    time("lineitem partkey distinct limit3") {
      graft.Tables.lineitem(spark, sfDir).select(col("l_partkey"))
        .distinct().orderBy(col("l_partkey")).limit(3)
        .write.format("noop").mode("overwrite").save()
    }
    time("lineitem partkey distinct limit3 AGAIN") {
      graft.Tables.lineitem(spark, sfDir).select(col("l_partkey"))
        .distinct().orderBy(col("l_partkey")).limit(3)
        .write.format("noop").mode("overwrite").save()
    }
    time("adjacency read+rebalance+count") {
      graft.Tables.copurchaseAdjacency(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("adjacency explode agg") {
      graft.Tables.copurchaseAdjacency(spark, sfDir)
        .select(explode(col("dsts")).as("dst"))
        .groupBy(col("dst")).agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("lineitem full scan count") {
      println(graft.Tables.lineitem(spark, sfDir).count())
    }
    spark.stop()
  }
}
