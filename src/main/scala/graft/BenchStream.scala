package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming THROUGHPUT bench — the production-path counterpart of the
  * `streaming/Replay` correctness jig (which collects rows to the driver
  * to control batch boundaries and is bench=false by design).
  *
  * Here nothing is ever collected: each stateful tier reads its input
  * from a staged PARQUET FILE SOURCE (the batch table split into many
  * files, `maxFilesPerTrigger` bounding each micro-batch), runs the same
  * transform a production `readStream` would, and discharges into the
  * noop sink. Reported per tier: wall seconds, input rows, rows/sec,
  * micro-batch count, and the state store's final row count and memory
  * footprint (from the query's own progress metrics) — the two numbers
  * that decide whether the operator survives a continuous deployment
  * (throughput ≥ ingest rate, state bounded).
  *
  * Prints ONE JSON line; also written to BENCH_STREAM.json (env
  * SPARK_GRAFT_BENCH_STREAM overrides the path, else the working
  * directory).
  */
object BenchStream {

  private case class TierResult(
      name: String, rows: Long, sec: Double, batches: Int,
      stateRows: Long, stateBytes: Long) {
    def rps: Double = if (sec > 0) rows / sec else 0.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-bench-stream")
    def stage(df: DataFrame, name: String, files: Int): String = {
      val dir = s"$work/$name"
      df.repartition(files).write.mode("overwrite").parquet(dir)
      dir
    }
    // staged sources (setup, NOT timed): the events stream split into 32
    // files (maxFilesPerTrigger=4 → 8 micro-batches), documents with the
    // replay's deterministic synthetic event time
    val eventsDir = stage(
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type")),
      "events", 32)
    val docsDir = stage(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"),
          ((lit(86400000L) + col("doc_id")).cast("double") / 1000.0)
            .cast("timestamp").as("ts")),
      "documents", 32)

    def source(dir: String): DataFrame = {
      val schema = spark.read.parquet(dir).schema
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4).parquet(dir)
    }

    /** Run one tier to completion (AvailableNow: drains the staged files
      * through real micro-batches, then stops); pull rows/batches/state
      * from the query's progress stream — never from the data itself. */
    def runTier(name: String)(pipe: DataFrame => DataFrame)(dir: String): TierResult = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-bs-$name")
      val t0 = System.nanoTime()
      val q = pipe(source(dir)).writeStream
        .format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      val rows = progress.map(_.numInputRows).sum
      val batches = progress.count(_.numInputRows > 0)
      // PEAK state across micro-batches, not the final snapshot: by the
      // time AvailableNow drains, the watermark has evicted most closed
      // windows and the final state understates the sizing question
      // ("how much state does a live deployment hold").
      val stateSnapshots = progress
        .filter(p => p.stateOperators != null && p.stateOperators.nonEmpty)
        .map(p => (p.stateOperators.map(_.numRowsTotal).sum,
          p.stateOperators.map(_.memoryUsedBytes).sum))
      val r = TierResult(name, rows, sec, batches,
        if (stateSnapshots.isEmpty) 0L else stateSnapshots.map(_._1).max,
        if (stateSnapshots.isEmpty) 0L else stateSnapshots.map(_._2).max)
      System.err.println(
        f"[bench-stream] $name: ${r.rows} rows in ${r.sec}%.2f s " +
          f"(${r.rps}%.0f rows/s, ${r.batches} batches, " +
          f"state ${r.stateRows} rows / ${r.stateBytes} B)")
      r
    }

    val results = Seq(
      // gap sessionization: session_window agg, closed sessions emitted
      // as the watermark passes them
      runTier("sessions") { s =>
        streaming.StreamingOps.sessionStream(s, "user_id", "ts",
          gap = "30 minutes", watermark = "1 hour")
      }(eventsDir),
      // ordered funnel: flatMapGroupsWithState advancement emitter
      runTier("funnel") { s =>
        streaming.FunnelStream.funnelStream(s, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), watermark = "1 hour").toDF()
      }(eventsDir),
      // exact digest dedup within the watermark horizon
      runTier("dedup") { s =>
        streaming.StreamingOps.dedupStream(s, "text", "ts",
          watermark = "1 hour")
      }(docsDir))

    def j(r: TierResult): String =
      f""""${r.name}":{"rows":${r.rows},"sec":${r.sec}%.3f,""" +
        f""""rows_per_sec":${r.rps}%.0f,"batches":${r.batches},""" +
        f""""state_rows":${r.stateRows},"state_bytes":${r.stateBytes}}"""
    val total = results.map(_.sec).sum
    val line = f"""{"metric":"stream_total","value":$total%.3f,""" +
      f""""unit":"sec","sf":"$sfDir","tiers":{${results.map(j).mkString(",")}}}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_STREAM",
      java.nio.file.Paths.get("BENCH_STREAM.json").toAbsolutePath.toString)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench-stream] write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
