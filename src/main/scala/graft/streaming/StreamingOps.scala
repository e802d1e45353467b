package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterparts of the training-data batch operators: continuous
  * dedup and gap sessionization over unbounded inputs.
  *
  * Both keep BOUNDED state via watermarks — the property that makes them
  * runnable forever at 100 TB/day: state for a key is dropped once the
  * watermark passes it, so memory is ∝ the in-flight window, not the
  * stream's history.
  */
object StreamingOps {

  /** Continuous exact dedup by content digest: emits the FIRST document
    * seen for each digest, suppresses duplicates arriving within the
    * watermark horizon. (Duplicates straddling more than `watermark` of
    * event time pass through — the documented trade for bounded state;
    * size the horizon to the pipeline's dedup window.) One shuffle on the
    * digest; state = one entry per distinct in-flight digest. */
  def dedupStream(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("digest", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** Continuous gap sessionization via the native `session_window`
    * aggregate: a session closes after `gap` of event-time silence, the
    * closed session's row is emitted once the watermark passes its end.
    * Same semantics as the batch `Sessionize` operator (lag + running
    * session ids), expressed with merging session state instead of a
    * whole-history window sort. */
  def sessionStream(
      events: DataFrame, userCol: String, tsCol: String,
      gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
