package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * time grid and fill the gaps — the step between raw logs and any
  * windowed model input (the reference's KPI table has this problem
  * latently: a day×endpoint with no traffic is simply absent from its
  * CSV; calcular_kpi.py:86-118 only emits observed groups).
  *
  * Shape: one aggregate to the bucket grain, one tiny span/keys pass,
  * a GENERATED dense grid (sequence explode — never shuffled), a left
  * join of observations onto the grid, and a per-key LOCF window
  * (`last(..., ignoreNulls)`) for carry-forward. The grid is
  * |keys|·|buckets| rows of a few bytes; the window partitions by key,
  * so parallelism is the key cardinality — for very long spans with few
  * keys, sub-partition the span into chunks and stitch (same trick as
  * [[Chunking.packSequences]]' two-level scan).
  */
object Resample {

  /** Hour-grain gap fill: one row per (key, hour) over the FULL observed
    * span, with `n_events` (0 on gaps), `is_gap`, the bucket's exact
    * decimal sum (`sum_value`, null on gaps), and `filled_sum` = last
    * observed sum carried forward (null before a key's first
    * observation).
    *
    * @param df      events with keyCol, tsCol (timestamp), valueCol
    *                (numeric, 2-dp scale — summed as DECIMAL(18,2)) */
  def hourlyGapFill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    // ONE base-table scan: span and keys both derive from the hourly
    // grain table (hour truncation is monotone, so min/max of bucket
    // starts = truncated min/max of raw times; the key set is the grain
    // table's key set). The lazy pin + reRoot materializes the tiny
    // grain table once for its three consumers instead of re-scanning
    // the events three times — with RDD lineage KEPT (r13: the
    // localCheckpoint this replaced cut lineage, so a lost block failed
    // the query instead of recomputing).
    val hourly = org.apache.spark.sql.graftbridge.SqlBridge.reRoot(df
      .groupBy(date_trunc("hour", col(tsCol)).as("h"), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        expr(s"CAST(sum(CAST($valueCol AS DECIMAL(18,2))) AS DOUBLE)")
          .as("sum_value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val span = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val keys = hourly.select(col(keyCol)).distinct()
    val grid = keys.crossJoin(broadcast(span))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("h"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "h"), "left")
      .select(col(keyCol), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.as("is_gap"),
        col("sum_value"),
        last(col("sum_value"), ignoreNulls = true).over(w).as("filled_sum"))
  }
}
