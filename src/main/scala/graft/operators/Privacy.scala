package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record-level privacy screens for training corpora — the structured
  * complement of the text-side PII scrub (functions/TextFunctions
  * .piiScrub): where the scrub rewrites free text, these operators
  * reason about QUASI-IDENTIFIERS — combinations of innocuous-looking
  * attributes (region × segment × balance bracket) that single out
  * individuals when their equivalence class is small. k-anonymity is
  * the standard release gate: every kept row must be indistinguishable
  * from at least k−1 others on the quasi-identifier tuple.
  */
object Privacy {

  /** Annotate each row with its quasi-identifier equivalence-class size
    * and a `suppressed` flag (`class_size < k`) — callers either filter
    * on the flag (suppression-mode release) or widen a bucketing column
    * and re-run (one rung of a generalization ladder; the ladder is the
    * caller's loop, each rung this same single pass).
    *
    * Scale shape: ONE keyed exchange — the class size is an unordered
    * window count over the quasi columns (no sort frame, one value per
    * class computed in a single pass), so the corpus is shuffled once on
    * the class key and nothing is collected or broadcast. Skewed class
    * sizes are benign: a giant class is by definition k-anonymous and
    * the count is a per-partition-then-merge aggregate, not a buffered
    * sort. All arithmetic is integer counts — engine-exact. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity: need at least one quasi column")
    require(k >= 1, s"kAnonymity: k must be >= 1, got $k")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("class_size", count(lit(1)).over(w))
      .withColumn("suppressed", col("class_size") < lit(k))
  }
}
