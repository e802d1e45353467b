package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated name filter] — the filter runs
    // (and dumps oracle SQL for) only the named queries, for cheap
    // targeted re-checks; the driver's two-arg call is unchanged.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet)
      else None
    def keep(name: String) = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Multi-process smoke (VERDICT r14 #1): SPARK_GRAFT_MASTER=
    // local-cluster[2,16,16384] runs the SAME oracle pipeline with real
    // executor JVMs — custom Catalyst expressions, broadcasts, LoopCache
    // pins and DSv2 readers all cross a genuine serialization boundary.
    // Requires SPARK_HOME (executor launch) and SPARK_GRAFT_JARS (the
    // packaged graft jar, fetched by executors at task deserialization).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // rank-filter pre-trim (WindowGroupLimit) for corpus-scale quotas:
      // the 1000-row default defeats it for any realistic target_n
      .config("spark.sql.optimizer.windowGroupLimitThreshold", "16777216")
      // bound dead-shuffle-file accumulation on big heaps (see Bench)
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "120s"))
    sys.env.get("SPARK_GRAFT_JARS").foreach(builder.config("spark.jars", _))
    if (master.startsWith("local-cluster")) {
      // Fail fast (ADVICE r15): without the packaged jar, every task
      // deserializes to ClassNotFoundException on the executors and the
      // per-query catch turns one config mistake into 150 confusing
      // 'failed' lines.
      require(sys.env.contains("SPARK_GRAFT_JARS"),
        "SPARK_GRAFT_MASTER=local-cluster[...] needs SPARK_GRAFT_JARS=" +
          "<path to the packaged graft jar> (sbt package) so executor " +
          "JVMs can deserialize graft classes")
      // Executor JVMs are launched by the in-process Worker; they need the
      // same JDK17 module opens the driver gets from build.sbt/run_main.sh,
      // and a memory setting that fits inside the worker's slice.
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
      builder
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "12g"))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter { case (n, _) => keep(n) }.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query must not leave a STALE result from an earlier run
        // sitting where the checker would read it as current (it would
        // mask the failure as a value mismatch — or worse, a false pass).
        // The cleanup itself must never escape this handler: one query's
        // failure aborting the loop would zero the whole round.
        try {
          val dir = Paths.get(s"$outDir/$name")
          if (Files.exists(dir)) {
            val walk = Files.walk(dir)
            try {
              import scala.jdk.CollectionConverters._
              walk.iterator().asScala.toSeq.reverse
                .foreach(p => Files.deleteIfExists(p))
            } finally walk.close()
          }
        } catch { case c: Throwable =>
          System.err.println(s"[verify] $name stale-cleanup failed: ${c.getMessage}")
        }
      }
      // finished queries' persisted intermediates are dead weight in a
      // 100+-query session (fresh DataFrames each call never reuse them)
      // — drop them so late queries aren't evicting or spilling. In a
      // `finally` so a THROWING query also releases what it pinned. The
      // operator memo goes with it: its entries hold the dropped pins'
      // plans/RDDs, and nothing later reuses them.
      finally {
        spark.catalog.clearCache()
        graft.operators.LoopCache.clearMemo()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // A FILTERED run must not clobber the full oracle_sql.json: stale
    // per-query parquet dirs from a previous full run would remain in
    // outDir, and a later full DuckDB compare against the shrunken map
    // would silently verify fewer queries. Filtered runs write a
    // sibling partial file instead.
    val oracleFile =
      if (only.isDefined) "oracle_sql.partial.json" else "oracle_sql.json"
    Files.writeString(Paths.get(s"$outDir/$oracleFile"), json)
    spark.stop()
  }
}
