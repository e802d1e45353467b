package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how target-like it is
  * under hashed-n-gram bag-of-words models, then resample the corpus with
  * probability proportional to the importance weight. The method behind
  * "select pretraining data that looks like Wikipedia/books" at corpus
  * scale — a linear scoring pass, no model inference.
  *
  * Pipeline shape (all corpus-scale steps are narrow or map-combined):
  *
  *  1. FEATURES: unigram + bigram tokens hashed into `buckets` buckets via
  *     the first 8 hex digits of md5 (engine-portable, the
  *     [[Sampling.contentSplit]] convention) — a narrow explode, no state.
  *  2. MODELS: one `groupBy(bucket)` over the feature stream counts the
  *     raw corpus and the target slice together (`count` + conditional
  *     `count_if` — one shuffle whose payload is `buckets` rows after
  *     map-side combine). Laplace-smoothed log-likelihood ratio per
  *     bucket, staged through DECIMAL(18,6) so any later sum of LLR terms
  *     is order-independent (q88/q03 determinism rule).
  *  3. WEIGHTS: features broadcast-join the `buckets`-row LLR table and
  *     re-aggregate per doc — the only corpus-keyed shuffle, carrying
  *     fixed-width (doc_id, partial decimal sum) rows after map-side
  *     partial aggregation.
  *  4. RESAMPLE: Gumbel top-k — `score = log_w + g`, `g = -ln(-ln(u))`
  *     with `u` the [[Sampling.lehmerInt]] integer draw (exact in any
  *     engine), so "sample k docs with prob ∝ weight" needs no global
  *     sort: `orderBy(score).limit(k)` is a TakeOrdered tree-reduction
  *     (per-partition top-k, k rows to the driver) at any corpus size.
  *
  * The target model here is fit on an in-corpus slice (a source acting as
  * the "high-quality" domain); a real deployment fits step 2's target
  * counts on an external target corpus — the plan is identical.
  */
object Dsir {

  private val LehmerM = 2147483647L // 2^31 - 1, [[Sampling]]'s modulus

  /** (id, bucket) — one row per unigram/bigram occurrence, tokens from the
    * corpus-standard normalization (lower, collapse whitespace), bucketed
    * by `('0x'||substr(md5(feature),1,8)) % buckets`. Narrow. */
  def featureBuckets(docs: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String], buckets: Int): DataFrame = {
    val grams = withToks(docs,
      graft.functions.TextFunctions.tokensWs(col(textCol)), idCol, carryCols)
    grams.select(
      (col(idCol) +: carryCols.map(col) :+
        explode(concat(col("t"),
          // bigrams: zip each token with its successor. zip_with PADS the
          // shorter array with nulls (it does not stop at it), so both
          // slices are forced to the same length n-1 — shortening either
          // slice expression would null-pad phantom bigrams in
          zip_with(slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
            slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
            (a, b) => concat_ws(" ", a, b)))).as("feature")): _*)
      .withColumn("bucket",
        // one-pass codegen md5 word (functions/Md5Word.scala), bit-equal
        // to the oracle's ('0x'||substr(md5(f),1,8))::BIGINT % buckets.
        // coalesce makes the column provably NON-NULLABLE (it never is —
        // explode yields no null features — but Catalyst can't see
        // that), so the downstream bucket equi-join doesn't infer an
        // IsNotNull filter that would re-evaluate the md5 below this
        // projection: pushdown inlines aliases with no cost check, and
        // the inferred filter was hashing every feature TWICE.
        coalesce(
          pmod(graft.functions.Md5Word32Expression.md5Word32(col("feature")),
            lit(buckets.toLong)), lit(0L)))
      .drop("feature")
  }

  private def withToks(docs: DataFrame, toks: Column, idCol: String,
      carryCols: Seq[String]): DataFrame =
    // no blank filter: tokensWs is blank-safe ([] for empty/null) and the
    // consumer explodes, so an empty token array contributes no rows —
    // the same outcome a `size(t) > 0` filter bought, except the filter
    // was PUSHED below this projection with the tokenize chain inlined
    // (predicate pushdown does not cost-check aliases), tokenizing every
    // document twice
    docs.select((col(idCol) +: carryCols.map(col) :+ toks.as("t")): _*)

  /** Per-bucket Laplace-smoothed LLR table:
    * `llr(b) = ln((c_t(b)+1)/(N_t+buckets)) - ln((c_r(b)+1)/(N_r+buckets))`
    * as DECIMAL(18,6), from ONE pass over the feature stream (raw and
    * target counted in the same aggregate). `buckets` rows out. */
  def llrTable(feats: DataFrame, isTarget: Column, buckets: Int): DataFrame =
    llrFromCounts(feats.groupBy(col("bucket")).agg(
      count(lit(1)).as("c_r"),
      count(when(isTarget, 1)).as("c_t")), buckets)

  /** LLR table from a pre-aggregated per-bucket count table
    * `(bucket, c_r, c_t)` — the tail of [[llrTable]], shared with the
    * one-pass [[importanceWeights]] shape. */
  def llrFromCounts(counts: DataFrame, buckets: Int): DataFrame = {
    // corpus-level totals as a WINDOW over the buckets-row aggregate — a
    // `counts.agg(...)` here would rebuild the counts lineage and pay a
    // second full corpus pass for two scalars. The single-partition
    // window is over ≤`buckets` rows by construction, never the corpus.
    val all = Window.partitionBy(lit(1))
    counts
      .withColumn("n_r", sum(col("c_r")).over(all))
      .withColumn("n_t", sum(col("c_t")).over(all))
      .select(col("bucket"),
        (log((col("c_t") + 1).cast("double") /
            (col("n_t") + buckets).cast("double")) -
          log((col("c_r") + 1).cast("double") /
            (col("n_r") + buckets).cast("double")))
          .cast("decimal(18,6)").as("llr"))
  }

  /** Per-doc importance weights: `(idCol, n_feats, log_w)` where `log_w =
    * Σ llr(bucket)` over the doc's features — DECIMAL-exact, so the value
    * is independent of partitioning and engine. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    // materialize the caller's target predicate BEFORE tokenizing, so the
    // feature stream carries one boolean instead of whichever columns the
    // predicate happens to reference (and the predicate may use any
    // column of `docs`, not a hard-coded one)
    val marked = docs.withColumn("_is_target", isTarget)
    val feats = featureBuckets(marked, idCol, textCol, Seq("_is_target"),
      buckets)
    // ONE tokenize pass, not two: consuming `feats` from both the LLR
    // aggregate and the per-doc weight aggregate duplicates its whole
    // subtree (Catalyst shares nothing across DAG branches), so the
    // corpus was tokenized + md5-bucketed twice per run — the two
    // heaviest stages of the q143 profile at sf0.1 (5.6 s + 8.0 s CPU).
    // Instead the stream collapses FIRST into per-(doc, bucket) counts
    // — the only exchange that sees feature volume, map-combined — and
    // both models derive from that compact table: the bucket model sums
    // `cnt` per bucket (buckets-row output), and the per-doc weight
    // re-aggregates `cnt` and `llr · cnt`. Σ llr over feature rows
    // ≡ Σ llr·cnt over (doc, bucket) rows, term-for-term in exact
    // DECIMAL arithmetic, so the weights are bit-identical.
    val perDocBucket = feats
      .groupBy(col(idCol), col("_is_target"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val counts = perDocBucket.groupBy(col("bucket")).agg(
      sum(col("cnt")).as("c_r"),
      // coalesce: a bucket with no target rows must count 0, not NULL
      // (count(when(...)) in llrTable's path yields 0 there)
      coalesce(sum(when(col("_is_target"), col("cnt"))), lit(0L)).as("c_t"))
    val llr = llrFromCounts(counts, buckets)
    perDocBucket.join(broadcast(llr), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("llr") * col("cnt")).as("log_w_dec"))
  }

  /** Gumbel top-`k` resample over the weight table: append the exact
    * Lehmer-keyed Gumbel perturbation, keep the k highest `score`s (ties
    * broken by id — scores are decimal-exact so the rank is reproducible
    * bit-for-bit across engines). Output: (id, n_feats, log_w, score,
    * rank), rank 1 = first sampled. */
  def gumbelTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    val u = (Sampling.lehmerInt(col(idCol)).cast("double") + lit(0.5)) /
      lit(LehmerM.toDouble)
    val g = (-log(-log(u))).cast("decimal(18,6)")
    val scored = weights
      .withColumn("score_dec", col("log_w_dec") + g)
      .orderBy(col("score_dec").desc, col(idCol)) // TakeOrdered: no global sort
      .limit(k)
    scored
      .withColumn("rank",
        row_number().over( // bounded: k rows, single partition by design
          Window.orderBy(col("score_dec").desc, col(idCol))).cast("long"))
      .select(col(idCol), col("n_feats"),
        col("log_w_dec").cast("double").as("log_w"),
        col("score_dec").cast("double").as("score"),
        col("rank"))
  }
}
