package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Unigram language-model scoring — the KenLM-style "perplexity filter"
  * shape every large pretraining pipeline runs (score each document by its
  * per-token cross-entropy under a corpus LM, then cut or bucket on the
  * score), with the model reduced to unigrams so the whole thing stays a
  * two-pass DataFrame program.
  *
  * Pass 1 fits the model: one groupBy over the exploded tokens for the
  * count table, plus a single-row total. Pass 2 scores: explode again,
  * join token → -ln(count/N), aggregate per document. At 100 TB the count
  * table of a natural-language corpus is ~millions of rows — small enough
  * to broadcast after a `minCount` floor, which is exactly what the
  * `broadcastModel` flag does; leave it false and Catalyst plans an
  * ordinary shuffle join keyed by token (still skew-safe: token frequency
  * skew lands on the AGGREGATED count table, one row per token).
  *
  * Determinism contract (the q03/q50 rule): each token's negative log
  * likelihood goes through an exact DECIMAL(18,6) intermediate before the
  * per-document sum, so the result is independent of summation order and
  * of sub-ULP libm differences between engines (a 1-ULP `ln` divergence
  * flips a 6-dp half-up rounding only within ~2^-52/1e-6 of a boundary —
  * measure-zero in practice).
  */
object NgramLm {

  /** Normalized whitespace tokens (blank-safe). */
  private def toks(textCol: Column): Column = {
    val norm = TextFunctions.normalizeText(textCol)
    when(length(norm) === 0, array().cast("array<string>"))
      .otherwise(split(norm, " "))
  }

  /** Per-document unigram cross-entropy under the corpus's own unigram
    * distribution: (id, n_tokens, avg_nll) where avg_nll is the mean over
    * the document's tokens of -ln(count(token)/N), N = corpus token count.
    * Every scored token is in the model by construction (self-scoring);
    * [[scoreAgainst]] handles the held-out/OOV variant. */
  def unigramScores(df: DataFrame, idCol: String, textCol: String,
      broadcastModel: Boolean = true): DataFrame = {
    val tokens = df
      .select(col(idCol), explode(toks(col(textCol))).as("tok"))
    val model = fitUnigrams(tokens)
    scoreTokens(tokens, idCol, model, broadcastModel)
  }

  /** Fit the unigram NLL table from a (.., tok) token stream:
    * (tok, nll) with nll = -ln(count/N) staged through DECIMAL(18,6). */
  def fitUnigrams(tokens: DataFrame): DataFrame = {
    val counts = tokens.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    // N is one driver-side scalar (bounded: a single long), the price of
    // avoiding a global cross-join or a second shuffle over the counts
    val n = counts.agg(sum(col("c"))).collect()(0).getLong(0)
    counts.select(col("tok"),
      (-log(col("c").cast("double") / lit(n.toDouble)))
        .cast("decimal(18,6)").as("nll"))
  }

  /** Score a token stream against a fitted (tok, nll) model: unseen tokens
    * fall back to `oovNll` (None drops them from both sum and count —
    * "score known mass only"). */
  def scoreTokens(tokens: DataFrame, idCol: String, model: DataFrame,
      broadcastModel: Boolean = true, oovNll: Option[Double] = None): DataFrame = {
    val m = if (broadcastModel) broadcast(model) else model
    val joined = tokens.join(m, Seq("tok"), "left")
    val scored = oovNll match {
      case Some(f) => joined.select(col(idCol),
        coalesce(col("nll"), lit(f).cast("decimal(18,6)")).as("nll"))
      case None => joined.filter(col("nll").isNotNull)
        .select(col(idCol), col("nll"))
    }
    scored.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("nll")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_nll"))
  }
}
