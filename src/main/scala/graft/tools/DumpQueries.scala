package graft

import org.apache.spark.sql.SparkSession

/** Debug helper: dump the named queries' results to parquet so they can
  * be diffed against a local DuckDB oracle run without a full Verify
  * sweep. Usage: runMain graft.DumpQueries <sfDir> <outDir> <name...> */
object DumpQueries {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val outDir = args(1)
    val names  = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      Queries.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"[dump] wrote $outDir/$n")
    }
    spark.stop()
  }
}
