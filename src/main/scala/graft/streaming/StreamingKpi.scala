package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Kpi, Normalize}

/** Structured Streaming variant of the KPI pipeline (SURVEY §7.1 M5): the
  * same normalization and aggregation semantics, continuous.
  *
  * Streaming-specific choices:
  *  - event time = parsed `timestamp_utc`, with a configurable watermark for
  *    late data (the reference is batch and has no late policy; we default
  *    to 1 hour);
  *  - tumbling 1-day windows stand in for the batch job's calendar-day
  *    group key;
  *  - exact `percentile` is not streaming-incremental, so the streaming tier
  *    uses `percentile_approx` (a mergeable sketch) — the documented
  *    trade-off of SURVEY §7.4 R4;
  *  - output mode `append` with watermark: a day's KPI row is emitted once
  *    the watermark passes the window end (suitable for downstream sinks);
  *    use `update` + foreachBatch for a continuously-revised dashboard.
  */
object StreamingKpi {

  /** Raw string-typed bitácora stream → normalized stream with event time. */
  def normalizedStream(bitacora: DataFrame): DataFrame = {
    val anyCastFailed =
      Normalize.castFailed(col("status_code"), "int") ||
      Normalize.castFailed(col("elapsed_ms"), "double")
    bitacora
      .filter(col("timestamp_utc").isNotNull && col("endpoint").isNotNull)
      .select(
        to_timestamp(col("timestamp_utc"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("event_time"),
        Normalize.endpointBase(col("endpoint")).as("endpoint_base"),
        Normalize.lenientInt(col("status_code")).as("status_code"),
        Normalize.lenientDouble(col("elapsed_ms")).as("elapsed_ms"),
        Normalize.effectiveParseResult(col("parse_result"), anyCastFailed).as("parse_result"))
      .filter(col("event_time").isNotNull)
  }

  /** Windowed KPI aggregate over the normalized stream. */
  def kpiStream(
      normalized: DataFrame,
      watermark: String = "1 hour",
      windowLength: String = "1 day"): DataFrame =
    normalized
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLength), col("endpoint_base"))
      .agg(
        count(lit(1)).as("requests_total"),
        count_if(col("status_code").between(200, 299)).as("success_2xx"),
        count_if(col("status_code").between(400, 499)).as("client_4xx"),
        count_if(col("status_code").between(500, 599)).as("server_5xx"),
        count_if(col("parse_result") =!= "ok").as("parse_errors"),
        bround(avg(col("elapsed_ms")), 2).as("avg_elapsed_ms"),
        bround(percentile_approx(col("elapsed_ms"), lit(0.9), lit(10000)), 2)
          .as("p90_elapsed_ms"))
      .select(
        to_date(col("window.start")).as("date_utc"), col("endpoint_base"),
        col("requests_total"), col("success_2xx"), col("client_4xx"),
        col("server_5xx"), col("parse_errors"),
        col("avg_elapsed_ms"), col("p90_elapsed_ms"))

  /** Per-endpoint running state for the stateful tier. */
  final case class EndpointState(
      requests: Long, errors: Long, lastStatus: Int, consecutiveErrors: Long)

  /** Alert event emitted when an endpoint crosses an error streak. */
  final case class ErrorStreakAlert(
      endpoint_base: String, consecutive_errors: Long, last_status: Int)

  /** Custom streaming state via flatMapGroupsWithState: tracks per-endpoint
    * consecutive-5xx streaks and emits an alert each time the streak
    * reaches `threshold` — the kind of operator-state logic windowed aggs
    * can't express (streaks reset on success, alerts fire mid-window).
    * State lives in the state store; one shuffle on endpoint_base. */
  def errorStreakAlerts(
      normalized: DataFrame, threshold: Long = 3): org.apache.spark.sql.Dataset[ErrorStreakAlert] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = normalized.sparkSession
    import spark.implicits._
    val typed = normalized
      .select(col("endpoint_base"), col("status_code"),
        unix_micros(col("event_time")).as("t"))
      .as[(String, Int, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (endpoint: String, rows: Iterator[(String, Int, Long)], state: GroupState[EndpointState]) =>
          var s = state.getOption.getOrElse(EndpointState(0, 0, 0, 0))
          val alerts = scala.collection.mutable.ArrayBuffer.empty[ErrorStreakAlert]
          // Spark gives no intra-group ordering guarantee for the iterator:
          // sort the micro-batch's rows by event time so "consecutive" is
          // well-defined. (Bounded by the batch's per-group volume; for
          // unbounded groups pre-aggregate upstream.)
          rows.toArray.sortBy(_._3).foreach { case (_, status, _) =>
            val isErr = status >= 500
            val streak = if (isErr) s.consecutiveErrors + 1 else 0L
            s = EndpointState(
              s.requests + 1, s.errors + (if (isErr) 1 else 0), status, streak)
            if (isErr && streak == threshold)
              alerts += ErrorStreakAlert(endpoint, streak, status)
          }
          state.update(s)
          alerts.iterator
      }
  }

  /** File-source entry point: watch a directory of JSONL bitácora files and
    * maintain the KPI table (the streaming analogue of S1 → A1-A6). */
  def fromJsonlDirectory(
      spark: SparkSession, inputDir: String,
      watermark: String = "1 hour"): DataFrame = {
    val raw = spark.readStream
      .schema(Kpi.bitacoraSchema)
      .json(inputDir)
    kpiStream(normalizedStream(raw), watermark)
  }
}
