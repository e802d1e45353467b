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

  /** Stream-stream interval join: each left event matched to right events
    * of the same key within `[left.ts - before, left.ts + after]`. BOTH
    * sides carry watermarks and the join condition bounds event time in
    * both directions, so Spark can expire buffered rows: state is ∝ the
    * interval + watermark horizon, never the stream history — the form of
    * stream-stream join that runs forever. (An unbounded-time condition
    * would accumulate state without limit; the analyzer only knows state
    * is droppable because the range + watermarks make it provable.)
    *
    * Output columns: key, left `ts`/payload prefixed `l_`, right
    * `ts`/payload prefixed `r_`. */
  def intervalJoinStream(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      before: String = "10 minutes", after: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
      .withWatermark(s"l_$tsCol", watermark)
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$tsCol", watermark)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") - expr(s"INTERVAL $before") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $after"))
  }

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
