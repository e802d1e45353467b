package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sided integer CUSUM drift detection over a keyed series — the
  * SEQUENTIAL complement to the pointwise 2σ screen (QueriesGraph
  * .rateAnomalies): a 10% level shift never trips a per-point z-test, but
  * its small excesses accumulate linearly in a cumulative sum. Page's
  * classic recursion S⁺_t = max(0, S⁺_{t-1} + x_t − μ − κ) looks
  * order-dependent, but it has a closed window form:
  *
  *   S⁺_t = RS_t − min(0, min_{j≤t} RS_j)   with RS_t = Σ_{i≤t}(x_i − μ − κ)
  *
  * i.e. a running sum minus its own running minimum (the j=0 empty prefix
  * contributes the 0) — two per-key window functions, no recursion, no
  * UDF, replayable verbatim by any engine with standard window frames.
  * S⁻ is the mirror image with +κ and a running maximum.
  *
  * Integer discipline (the repo-wide rule for oracle-checked numerics):
  * everything is denominator-cleared by the per-key point count n, the
  * same trick as rateAnomalies — in cleared units the mean μ becomes the
  * plain sum s (since n·μ = s), so with slack κ = 10% of the mean and
  * threshold h = one full mean-day of accumulated excess:
  *
  *   y⁺_t = n·x_t − s − (s div 10)        (all BIGINT, exact)
  *   alarm when S⁺_t > n·h  ⇔  S⁺_cleared > s
  *
  * No float enters the computation, so results are bit-identical across
  * partition counts and engines.
  *
  * Scale shape: the per-key (n, s) pre-aggregate is key-sized and joins
  * back broadcast; the windows partition by key — series points for one
  * key land in one task, which is the honest minimum for a sequential
  * statistic (a day-granularity series is ≤ a few thousand rows per key
  * even over years, so the per-key window is bounded and tiny next to
  * the raw-event aggregation that produced it). Nothing is global: no
  * single-partition exchange anywhere.
  */
object Cusum {

  /** Per-(key, point) drift state: cleared CUSUM statistics and alarm
    * flags. `df` must hold one row per (key, ord) — aggregate first.
    *
    * Output columns: key, ord, value, cusum_up, cusum_down (both in
    * n-cleared units), drift_up, drift_down.
    */
  def drift(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, slackDen: Long = 10L): DataFrame = {
    require(slackDen > 0, s"slackDen=$slackDen must be positive")
    val stats = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"))
    val run = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Cleared increments: mean-cleared value ± slack (slack = mean/slackDen).
    // Floor division, computed explicitly on BIGINT: Spark's DIV truncates
    // toward zero while DuckDB's // floors, so a bare `s DIV d` would
    // diverge from the oracle whenever a key's sum is negative. Subtracting
    // pmod(s, d) (always in [0, d)) first makes the numerator an exact
    // multiple of d, where truncation ≡ floor — the identity holds for any
    // sign of s, keeping the operator generic over valueCol.
    val kap = expr(s"(s - pmod(s, $slackDen)) DIV $slackDen")
    val yUp = col("n") * col(valueCol) - col("s") - kap
    val yDn = col("n") * col(valueCol) - col("s") + kap
    df.join(broadcast(stats), keyCol)
      .withColumn("rs_up", sum(yUp).over(run))
      .withColumn("rs_dn", sum(yDn).over(run))
      .withColumn("cusum_up",
        col("rs_up") - least(lit(0L), min(col("rs_up")).over(run)))
      .withColumn("cusum_down",
        greatest(lit(0L), max(col("rs_dn")).over(run)) - col("rs_dn"))
      .select(col(keyCol), col(ordCol), col(valueCol),
        col("cusum_up"), col("cusum_down"),
        (col("cusum_up") > col("s")).as("drift_up"),
        (col("cusum_down") > col("s")).as("drift_down"))
  }
}
