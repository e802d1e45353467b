package graft.tools
import org.apache.spark.sql.SparkSession

/** Throwaway component timer for cost attribution (not part of any
  * contract; contents change per investigation). Current: q92 plan dump —
  * where do 57 CPU-s go before the vocabulary collect, and does the
  * vocabulary IN filter reach the postings scan as a pushed filter? */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.Queries.queries("q92_bm25_topk")(spark, "/root/testdata/sf0.1")
    val plan = df.queryExecution.executedPlan.toString
    println("=== q92 executed plan (first 9000 chars) ===")
    println(plan.take(9000))
    spark.stop()
  }
}
