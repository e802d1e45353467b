package graft.cli

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.gen.SyntheticBitacora
import graft.ops.Kpi
import graft.report.Report

/** CLI entry points mirroring the reference's run recipe
  * (/root/reference/README.md:100-137):
  *
  *   runMain graft.cli.GenerarDatos   --n_registros 500 --seed 42 --salida out/datos.jsonl
  *   runMain graft.cli.CalcularKpi    --input out/datos.jsonl --output out/kpi
  *   runMain graft.cli.GenerarReporte --input out/kpi --output out/report.html --umbral_p90 300
  */
object CliUtil {
  def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  def session(name: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}

/** Stage [2]: seeded synthetic bitácora → JSONL. */
object GenerarDatos {
  def main(args: Array[String]): Unit = {
    val a = CliUtil.parseArgs(args)
    val spark = CliUtil.session("generar_datos")
    try SyntheticBitacora.writeJsonl(
      SyntheticBitacora.generate(spark,
        n = a.getOrElse("n_registros", "500").toLong,
        seed = a.getOrElse("seed", "42").toLong,
        days = a.getOrElse("days", "3").toInt),
      a.getOrElse("salida", "out/datos_jsonl"),
      singleFile = true)
    finally spark.stop()
  }
}

/** Stage [3]: JSONL bitácora → sorted KPI CSV. */
object CalcularKpi {
  def main(args: Array[String]): Unit = {
    val a = CliUtil.parseArgs(args)
    val spark = CliUtil.session("calcular_kpi")
    try {
      val in = a.getOrElse("input", sys.error("--input required"))
      val out = a.getOrElse("output", sys.error("--output required"))
      Kpi.writeKpiCsv(Kpi.bitacoraKpi(Kpi.readBitacora(spark, in)), out)
    } finally spark.stop()
  }
}

/** Stage [4]: KPI CSV → HTML report + the two chart PNGs
  * (the reference's full artifact set, generar_reporte.py:263-292). */
object GenerarReporte {
  def main(args: Array[String]): Unit = {
    val a = CliUtil.parseArgs(args)
    val spark = CliUtil.session("generar_reporte")
    try {
      val in = a.getOrElse("input", sys.error("--input required"))
      val out = a.getOrElse("output", "out/report.html")
      val umbral = a.getOrElse("umbral_p90", "300").toDouble
      Report.writeReportArtifacts(Kpi.readKpiCsv(spark, in), umbral, Paths.get(out))
      println(s"[generar_reporte] wrote $out (+ ${Report.RequestsPngName}, ${Report.P90PngName})")
    } finally spark.stop()
  }
}
