package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Md5Word32Expression

/** Sketch-based join-cardinality estimation — the number an optimizer
  * (or a pipeline author sizing a shuffle) needs BEFORE paying for the
  * join. A count-min row is a width-w histogram of key hashes; the
  * inner product of two relations' rows overestimates the true join
  * size by exactly the hash-collision cross terms, and min over d
  * independent rows is the classic CM estimate (AMS/CM join-size
  * estimation, Alon-Matias-Szegedy / Cormode-Muthukrishnan). The sketch
  * is d×w BIGINT counters per relation — mergeable across shards/days
  * by plain addition — versus an exact answer that costs a full
  * key-keyed shuffle.
  *
  * Engine-exact contract: hash row j of key k is
  * `md5word32("j:" || k) % w` (the same md5-word contract as every
  * graft draw), counters are plain integer counts, the estimate is an
  * integer min-of-dot-products — a DuckDB oracle replays every counter
  * bit-for-bit. No confidence bound is asserted (estimates are exact
  * integers, not luck); the ERROR ITSELF is part of the output, which
  * is what makes the accuracy claim checkable rather than asserted.
  *
  * Scale shape: ONE corpus pass — the per-row d-way explode collapses
  * map-side into d·w partial counts before the only exchange (d·w
  * groups, KBs). Derived coarser widths fold from the wide sketch by
  * re-aggregation (b mod w'), never by re-scanning the corpus.
  */
object JoinEstimate {

  val Depth = 4

  /** The d×w counter table (j, b, cnt) of `keyCol` hashes. */
  def sketch(df: DataFrame, keyCol: String, width: Int): DataFrame = {
    require(width >= 2, s"width=$width must be >= 2")
    df.select(explode(array((0 until Depth).map { j =>
        struct(lit(j).as("j"),
          (Md5Word32Expression.md5Word32(
            concat(lit(s"$j:"), col(keyCol).cast("string"))) % width).as("b"))
      }: _*)).as("h"))
      .groupBy(col("h.j").as("j"), col("h.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold a sketch to a coarser width: the mergeable-histogram
    * property, no corpus re-scan. `coarseWidth` MUST divide the width
    * the sketch was built at — `(h % W) % w == h % w` only when
    * `w | W`; a non-dividing fold would silently produce a table that
    * is NOT the width-`w` sketch of the data, biasing estimates beyond
    * the CM contract (ADVICE r16), so the precondition is enforced. */
  def fold(sk: DataFrame, originalWidth: Int, coarseWidth: Int): DataFrame = {
    require(coarseWidth >= 2, s"coarseWidth=$coarseWidth must be >= 2")
    require(originalWidth % coarseWidth == 0,
      s"coarseWidth=$coarseWidth must divide originalWidth=$originalWidth " +
        "or the folded table is not a CM sketch at that width")
    sk.groupBy(col("j"), (col("b") % coarseWidth).as("b"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Self-join size estimate from a sketch: min over rows j of
    * Σ_b cnt², as one (estimate) row. The same shape with two sketches
    * joined on (j, b) estimates a two-relation equi-join.
    *
    * This is the CM estimator: a guaranteed OVERestimate (collision
    * cross terms only add), expected excess ≈ n²/w — the right number
    * when the question is "is this join shuffle-SAFE" (a conservative
    * upper bound). For an unbiased point estimate use the AMS tier. */
  def selfJoinEstimate(sk: DataFrame): DataFrame =
    sk.groupBy(col("j")).agg(sum(col("cnt") * col("cnt")).as("dot"))
      .agg(min(col("dot")).as("estimate"))

  /** Two-relation equi-join size estimate: min over rows j of the
    * (j, b)-aligned counter inner product — the CM upper bound on
    * |A ⋈ B|. Both sketches must share [[Depth]] and width. */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame): DataFrame =
    skA.join(skB.withColumnRenamed("cnt", "__cntB"), Seq("j", "b"))
      .groupBy(col("j")).agg(sum(col("cnt") * col("__cntB")).as("dot"))
      // a row j with NO shared bucket has dot 0 but vanishes from the
      // inner join — any missing row forces the min to 0
      .agg(when(count(lit(1)) === Depth, min(col("dot")))
        .otherwise(lit(0L)).as("estimate"))

  val SignDepth = 5

  /** AMS (Alon–Matias–Szegedy) signed sketch: counter (j, b) holds
    * Σ s_j(k) over rows hashing there, s_j(k) = ±1 by md5-word parity
    * of "sj:k". The signs make E[Σ_b c²] EXACTLY Σ_k cnt(k)² — the
    * collision cross terms cancel in expectation — so the median over
    * [[SignDepth]] rows is the unbiased join-size point estimate the
    * plain CM min can't give. Same one-pass map-side-collapsing shape,
    * same plain-addition mergeability (signed counters fold with
    * [[fold]] unchanged). */
  def amsSketch(df: DataFrame, keyCol: String, width: Int): DataFrame = {
    require(width >= 2, s"width=$width must be >= 2")
    df.select(explode(array((0 until SignDepth).map { j =>
        val key = col(keyCol).cast("string")
        struct(lit(j).as("j"),
          (Md5Word32Expression.md5Word32(concat(lit(s"$j:"), key))
            % width).as("b"),
          when(Md5Word32Expression.md5Word32(concat(lit(s"s$j:"), key))
            % 2 === 0, 1L).otherwise(-1L).as("s"))
      }: _*)).as("h"))
      .groupBy(col("h.j").as("j"), col("h.b").as("b"))
      .agg(sum(col("h.s")).as("cnt"))
  }

  /** Median-of-rows AMS self-join estimate (exact integer order
    * statistic; the rank window runs over [[SignDepth]] rows, never the
    * corpus). */
  def amsSelfJoinEstimate(sk: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    sk.groupBy(col("j")).agg(sum(col("cnt") * col("cnt")).as("dot"))
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("dot"), col("j"))))
      .filter(col("__rn") === (SignDepth + 1) / 2)
      .select(col("dot").as("estimate"))
  }
}
