package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval sweep line: peak concurrency over time from (start, end)
  * interval rows — "how many sessions were in flight at the worst
  * moment of each day", the capacity-planning readout every serving or
  * ingest system wants from its session log.
  *
  * Semantics (exact, engine-portable):
  *  - an interval contributes +1 at `start` and −1 at `end`, END
  *    EXCLUSIVE: at one instant, departures process before arrivals
  *    (deltas order (ts, delta) — the −1 sorts first), so back-to-back
  *    sessions never double-count;
  *  - a day's peak INCLUDES its carry-in level (a day whose first delta
  *    is −1 peaked at the concurrency it inherited at midnight);
  *  - days with no deltas carry silently (they have no rows to measure;
  *    their level is the next day's carry_in — derivable from output).
  *
  * Scale shape — the textbook sweep line is ONE GLOBAL ordered prefix
  * sum, which a single-process engine states directly and a cluster
  * must never run as one task. Same two-level decomposition as
  * [[Sampling.budgetSelect]] / Chunking.packSequences, transposed to
  * time: per-day delta subtotals collect to the driver (bounded by the
  * span in days — a decade is ~3.7k rows), an exclusive scan gives each
  * day its midnight carry, and the running sum is a PER-DAY window over
  * a broadcast base join — the only corpus exchange is the day-keyed
  * one, and no stage sees more than one day's deltas in one sort.
  */
object SweepLine {

  /** Per-day peak concurrency: (day, n_starts, n_ends, carry_in, peak),
    * ordered by day. `startCol`/`endCol` are timestamps; rows with NULL
    * in either are dropped (open intervals are the caller's decision to
    * close — e.g. cap at the log horizon — not a silent default). */
  def dailyPeakConcurrency(intervals: DataFrame,
      startCol: String, endCol: String): DataFrame =
    dailyPeakConcurrency(intervals, startCol, endCol,
      hotDayDeltas = 2000000L)

  /** [[dailyPeakConcurrency]] with the hot-day threshold exposed: when
    * any single day holds more than `hotDayDeltas` delta rows, the
    * per-day running-sum window would sort that whole day in ONE task
    * (day-grain parallelism — the honest 100×-scale caveat from the
    * r16 audit). Above the threshold the operator applies its own
    * two-level decomposition once more WITHIN the day, at hour grain:
    * hour subtotals -> a ≤24-rows-per-day exclusive scan for each
    * hour's carry -> per-(day, hour) windows, which splits a hot day's
    * sort 24 ways while computing the exact same peaks (hour truncation
    * is a prefix of the (ts, delta) order, so per-hour runs concatenate
    * to the per-day run; pinned equal by PipelineOpsSpec/PropertySpec).
    * The decision input is already on the driver — the same bounded
    * per-day subtotal read that computes midnight carries.
    *
    * And once more (r18, VERDICT r17 #4): a day skewed into one HOUR
    * would still sort that hour in one task, so when any single
    * (day, hour) exceeds the SAME threshold the identical pattern
    * recurses to MINUTE grain — minute subtotals -> a ≤60-rows-per-hour
    * exclusive scan for each minute's carry (stacked on the hour
    * carries) -> per-(day, hour, minute) windows, splitting the hot
    * hour's sort a further 60 ways, exact by the same prefix argument.
    * The hour-grain decision needs per-hour counts, which the per-day
    * driver read doesn't carry — so the check is one extra bounded
    * aggregate (a single max row) over the already-persisted deltas,
    * paid ONLY after the day-level threshold has tripped. */
  def dailyPeakConcurrency(intervals: DataFrame, startCol: String,
      endCol: String, hotDayDeltas: Long): DataFrame = {
    // +1/−1 rows come from ONE pass via explode, not a two-branch union
    // (r19, guide §1.2): the union form re-ran the whole upstream
    // interval computation once per branch — for q159 that was the full
    // sessionize (two windows + an aggregate) computed twice, with only
    // the scan exchange reused — and doubled the partition count of
    // every stage over the deltas
    val deltas = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(explode(array(
        struct(col(startCol).as("ts"), lit(1L).as("delta")),
        struct(col(endCol).as("ts"), lit(-1L).as("delta")))).as("d"))
      .select(col("d.ts").as("ts"), col("d.delta").as("delta"))
      .withColumn("day", date_trunc("day", col("ts")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded driver read (one row per active day), exclusive scan for
    // the midnight carry — the budgetSelect base-offset pattern
    val subtotals = deltas.groupBy(col("day"))
      .agg(sum(col("delta")).as("day_sum"),
        count_if(col("delta") === 1L).as("n_starts"),
        count_if(col("delta") === -1L).as("n_ends"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1.getTime)
    val bases = subtotals.scanLeft((null: java.sql.Timestamp, 0L, 0L, 0L, 0L)) {
      case ((_, _, _, _, acc), (day, daySum, ns, ne)) =>
        (day, ns, ne, acc, acc + daySum)
    }.tail.map { case (day, ns, ne, carryIn, _) => (day, ns, ne, carryIn) }
    val spark = intervals.sparkSession
    val base = spark.createDataFrame(bases.toSeq)
      .toDF("day", "n_starts", "n_ends", "carry_in")
    val hot = subtotals.exists { case (_, _, ns, ne) => ns + ne > hotDayDeltas }
    val out = if (!hot) {
      val w = Window.partitionBy(col("day")).orderBy(col("ts"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .withColumn("run", sum(col("delta")).over(w))
        .groupBy(col("day")).agg(max(col("run")).as("max_run"))
        .join(broadcast(base), Seq("day"))
        .select(col("day"), col("n_starts"), col("n_ends"), col("carry_in"),
          greatest(col("carry_in"), col("carry_in") + col("max_run")).as("peak"))
        .orderBy(col("day"))
    } else {
      // hour-nested path: each hour's carry = day carry_in + exclusive
      // within-day prefix of hour subtotals (a ≤24-rows-per-day window,
      // never a big sort); the corpus-sized window partitions by
      // (day, hour). A day's peak is the max over its hours of
      // greatest(hour_carry, hour_carry + max_run) — the first active
      // hour's carry IS the day's carry_in, so the inherited-level
      // peak is covered exactly as in the flat path.
      val hourDeltas = deltas.withColumn("hour", date_trunc("hour", col("ts")))
      val wHour = Window.partitionBy(col("day")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val hourBase = hourDeltas.groupBy(col("day"), col("hour"))
        .agg(sum(col("delta")).as("hsum"))
        .withColumn("hour_offset",
          coalesce(sum(col("hsum")).over(wHour), lit(0L)))
        .join(broadcast(base), Seq("day"))
        .select(col("day"), col("hour"), col("n_starts"), col("n_ends"),
          col("carry_in"),
          (col("carry_in") + col("hour_offset")).as("hour_carry"))
      // one bounded read (a single max row) to see whether the skew is
      // deeper than a hot DAY — a hot HOUR, which hour grain can't split
      val maxHourDeltas = hourDeltas.groupBy(col("day"), col("hour"))
        .agg(count(lit(1)).as("c")).agg(max(col("c")))
        .collect()(0).getLong(0)
      if (maxHourDeltas <= hotDayDeltas) {
        val wRun = Window.partitionBy(col("day"), col("hour"))
          .orderBy(col("ts"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hourDeltas
          .withColumn("run", sum(col("delta")).over(wRun))
          .groupBy(col("day"), col("hour")).agg(max(col("run")).as("max_run"))
          .join(broadcast(hourBase), Seq("day", "hour"))
          .select(col("day"), col("n_starts"), col("n_ends"), col("carry_in"),
            greatest(col("hour_carry"),
              col("hour_carry") + col("max_run")).as("hpeak"))
          .groupBy(col("day"))
          .agg(max(col("n_starts")).as("n_starts"),
            max(col("n_ends")).as("n_ends"),
            max(col("carry_in")).as("carry_in"),
            max(col("hpeak")).as("peak"))
          .orderBy(col("day"))
      } else {
        // minute-nested path: the same decomposition a third time.
        // Each minute's carry = hour_carry + exclusive within-hour
        // prefix of minute subtotals (a ≤60-rows-per-(day,hour) window);
        // the corpus-sized window partitions by (day, hour, minute) —
        // the hot hour's sort splits a further 60 ways. Exact by the
        // same prefix argument: minute truncation is monotone in ts, so
        // per-minute runs concatenate to the per-hour run, and the first
        // active minute's carry IS hour_carry (covering the
        // inherited-level peak). minuteBase is active-minutes-sized
        // (≤1440/day) — joined without a broadcast hint so AQE sizes it.
        val minuteDeltas = hourDeltas
          .withColumn("minute", date_trunc("minute", col("ts")))
        val wMin = Window.partitionBy(col("day"), col("hour"))
          .orderBy(col("minute"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val minuteBase = minuteDeltas
          .groupBy(col("day"), col("hour"), col("minute"))
          .agg(sum(col("delta")).as("msum"))
          .withColumn("minute_offset",
            coalesce(sum(col("msum")).over(wMin), lit(0L)))
          .join(broadcast(hourBase), Seq("day", "hour"))
          .select(col("day"), col("hour"), col("minute"),
            col("n_starts"), col("n_ends"), col("carry_in"),
            (col("hour_carry") + col("minute_offset")).as("minute_carry"))
        val wRunM = Window.partitionBy(col("day"), col("hour"), col("minute"))
          .orderBy(col("ts"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        minuteDeltas
          .withColumn("run", sum(col("delta")).over(wRunM))
          .groupBy(col("day"), col("hour"), col("minute"))
          .agg(max(col("run")).as("max_run"))
          .join(minuteBase, Seq("day", "hour", "minute"))
          .select(col("day"), col("n_starts"), col("n_ends"), col("carry_in"),
            greatest(col("minute_carry"),
              col("minute_carry") + col("max_run")).as("mpeak"))
          .groupBy(col("day"))
          .agg(max(col("n_starts")).as("n_starts"),
            max(col("n_ends")).as("n_ends"),
            max(col("carry_in")).as("carry_in"),
            max(col("mpeak")).as("peak"))
          .orderBy(col("day"))
      }
    }
    LoopCache.finish(out, deltas)
  }
}
