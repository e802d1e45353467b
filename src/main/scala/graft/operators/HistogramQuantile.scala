package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling quantiles from MERGEABLE fixed-width histograms — the
  * quantile member of the rolling-sketch family (q129 does the same for
  * distinct counts with HLL registers). Exact quantiles over a sliding
  * window need every raw value re-sorted per window — O(window·n log n)
  * and a full re-shuffle of the raw rows for EVERY day at 100 TB. A
  * fixed-width histogram is a mergeable summary: per-day bucket counts
  * aggregate map-side to ≤ |buckets| rows per day, window merge is a
  * vector ADD (associative, order-free), and the quantile answer is
  * bucket-resolution — the deliberate, documented trade (same contract
  * as ClickHouse's quantileExact vs histogram estimators, expressed
  * exactly so any engine replays it bit-for-bit: all-integer counts,
  * ceil-threshold in integer arithmetic, lowest qualifying bucket).
  *
  * Scale shape: one groupBy to daily (day, bucket) counts; the window
  * merge uses q129's SPARSE forward-shift (explode ×windowDays, re-agg)
  * — per-day histograms are sparse in practice, so the expansion
  * shuffles ≈ windowDays·hits rows instead of materializing the dense
  * (day × bucket) grid a range-frame window needs; the quantile scan is
  * a per-day window over ≤ |buckets| rows. Nothing row-level survives
  * the first aggregate.
  */
object HistogramQuantile {

  /** Rolling q-quantile (qNum/qDen) per day over `windowDays` trailing
    * days (inclusive), from PRE-BUCKETED rows `df(dayCol: date,
    * bucketCol: int)` — one row per observation. Returns per day:
    * (d, n_rows, q_bucket) where q_bucket is the smallest bucket whose
    * cumulative count reaches ⌈n·qNum/qDen⌉ of the window's rows. */
  def rolling(df: DataFrame, dayCol: String, bucketCol: String,
      windowDays: Int = 7, qNum: Int = 9, qDen: Int = 10): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays must be >= 1")
    require(qNum > 0 && qNum <= qDen, s"quantile $qNum/$qDen not in (0,1]")
    val rows = df.select(col(dayCol).cast("date").as("day"),
      col(bucketCol).cast("int").as("bucket"))
    val daily = rows.groupBy(col("day"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    // "d is a REAL report day" rides the expansion: a real day (≥1 row
    // ⇒ ≥1 daily histogram row) contributes k=0 rows to its own group, a
    // phantom day (date_add overshoot past a gap or the corpus end)
    // never does — so the old `join(broadcast(days))` clip, which paid a
    // SECOND full scan + distinct + broadcast build to re-derive that
    // fact, collapses into a max(k=0) flag reduced per day over the
    // histogram-grid table (≤ days×buckets rows at any corpus scale).
    // The flag window shares the quantile windows' (d)-exchange.
    val merged = daily
      .withColumn("k", explode(expr(s"sequence(0, ${windowDays - 1})")))
      .select(expr("date_add(day, k)").as("d"), col("bucket"), col("n"),
        when(col("k") === 0, 1).otherwise(0).as("k0"))
      .groupBy(col("d"), col("bucket"))
      .agg(sum(col("n")).as("n"), max(col("k0")).as("k0"))
      .withColumn("is_real", max(col("k0")).over(Window.partitionBy(col("d"))))
      .filter(col("is_real") === 1)
      .select(col("d"), col("bucket"), col("n"))
    val cumW = Window.partitionBy(col("d")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = merged
      .withColumn("cum", sum(col("n")).over(cumW))
      .withColumn("total", sum(col("n")).over(Window.partitionBy(col("d"))))
    c.groupBy(col("d"))
      .agg(max(col("total")).as("n_rows"),
        // ceil(total·qNum/qDen) in pure integers; lowest bucket reaching it
        min(when(col("cum") >= expr(s"(total * $qNum + ${qDen - 1}) div $qDen"),
          col("bucket"))).as("q_bucket"))
  }
}
