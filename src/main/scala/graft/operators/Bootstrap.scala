package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Md5Word32Expression

/** Deterministic Poisson bootstrap — uncertainty intervals for corpus
  * metrics at any scale. The classical bootstrap (resample n rows WITH
  * replacement, B times) needs a global shuffle per replica; the Poisson
  * bootstrap replaces each row's multinomial count with an independent
  * Poisson(1) multiplicity, which is (a) statistically equivalent for
  * large n and (b) embarrassingly parallel: every row decides its own
  * multiplicity in every replica from a hash draw, so ALL B replicas are
  * computed in ONE narrow pass over the corpus — the only exchange is
  * the (group × replica) aggregate, and the quantile step runs over B
  * rows per group. This is the standard error-bar machinery for
  * pipelines where the data never fits one machine.
  *
  * Determinism contract (everything engine-replayable, zero floats):
  *  - draw u = md5word32("key:b") % 1000000 — the same md5-word contract
  *    as every graft split/bucket draw;
  *  - multiplicity m = #{thresholds < u} over the truncated-Poisson(1)
  *    cdf at 6-digit resolution: 367879 / 735759 / 919699 / 981012
  *    (10⁶·e⁻¹·Σ 1/j! ROUNDED to the nearest integer — e.g. 735758.88
  *    → 735759, so not a floor; the residual 1.8988% tail mass is
  *    lumped into m = 4 — documented truncation, exact thresholds
  *    shared verbatim with the q157 oracle);
  *  - replica statistics are exact integer ratios, reported as
  *    `(value·10⁶) div weight` so ordering and quantile cuts are
  *    bit-identical on any engine or partitioning.
  */
object Bootstrap {

  /** CDF thresholds (×10⁻⁶) of Poisson(1) truncated at 4. */
  val Thresholds: Seq[Int] = Seq(367879, 735759, 919699, 981012)

  /** Multiplicity of a row in replica `b`: 0–4 by the truncated-
    * Poisson(1) lookup on the md5 draw of "key:b". */
  def multiplicity(key: Column, b: Column): Column = {
    val u = Md5Word32Expression.md5Word32(
      concat(key.cast("string"), lit(":"), b.cast("string"))) % 1000000L
    Thresholds.map(t => when(u >= t, 1L).otherwise(0L)).reduce(_ + _)
  }

  /** Per-(group, replica) weighted means of an integer metric, scaled:
    * `mean_scaled = (Σ m·x · 10⁶) div Σ m` (null when a replica draws an
    * empty group — possible only for tiny groups; callers see the gap).
    * One explode (×B) that collapses map-side into |groups|·B partial
    * sums before the single exchange. */
  def replicaMeans(df: DataFrame, keyCol: String, groupCol: String,
      valueCol: String, b: Int): DataFrame = {
    require(b >= 2, s"poisson bootstrap needs >= 2 replicas, got $b")
    val reps = df.withColumn("replica",
        explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__m", multiplicity(col(keyCol), col("replica")))
    reps.groupBy(col(groupCol), col("replica"))
      .agg(sum(col("__m") * col(valueCol).cast("long")).as("__num"),
        sum(col("__m")).as("__den"))
      .select(col(groupCol), col("replica"),
        when(col("__den") > 0L,
          expr("(__num * 1000000) div __den")).as("mean_scaled"))
  }

  /** Percentile-method bootstrap interval per group: the replica means
    * at ranks ⌈q·B⌉ in (mean_scaled, replica) order — exact integer
    * order statistics, no interpolation (the documented small-B
    * contract). Returns (group, lo_scaled, hi_scaled, n_replicas). */
  def percentileCi(means: DataFrame, groupCol: String,
      qLoNum: Int = 5, qHiNum: Int = 95, qDen: Int = 100): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("mean_scaled"), col("replica"))
    val ranked = means.filter(col("mean_scaled").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    def rankFor(num: Int): Column = // ceil(q·n) in integer arithmetic
      expr(s"(__n * $num + ${qDen - 1}) div $qDen")
    ranked.groupBy(col(groupCol))
      .agg(max(when(col("__rn") === rankFor(qLoNum),
          col("mean_scaled"))).as("lo_scaled"),
        max(when(col("__rn") === rankFor(qHiNum),
          col("mean_scaled"))).as("hi_scaled"),
        max(col("__n")).as("n_replicas"))
  }
}
