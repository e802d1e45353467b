package graft.tools

import graft.Queries
import org.apache.spark.sql.SparkSession

/** Debug helper: dump the named queries' results to parquet so they can
  * be diffed against a local DuckDB oracle run without a full Verify
  * sweep. Usage: runMain graft.tools.DumpQueries <sfDir> <outDir> <name...> */
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
    // matching oracle subset so tools/check_oracle.py works on the dump dir
    val oracles = names.flatMap(n => Queries.oracleSql.get(n).map(n -> _))
    val json = oracles.map { case (k, v) =>
      "\"" + k + "\": " + com.fasterxml.jackson.databind.json.JsonMapper
        .builder().build().writeValueAsString(v)
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
