package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: a new session starts when
  * the gap to the previous event of the same user exceeds `gapSeconds`.
  * Classic lag + conditional running-sum window pair — one shuffle on the
  * user key, both windows share the same (partition, order) so Catalyst
  * plans a single sort. */
object Sessionize {

  def sessionIds(
      events: DataFrame, userCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    val isNew = when(prevTs.isNull, 1)
      .when(unix_micros(col(tsCol)) - unix_micros(prevTs) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    events.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats: session count and events per session extremes. */
  def userSessionStats(
      events: DataFrame, userCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long): DataFrame = {
    val s = sessionIds(events, userCol, tsCol, tieCol, gapSeconds)
    val perSession = s.groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
    perSession.groupBy(col(userCol))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))
  }
}
