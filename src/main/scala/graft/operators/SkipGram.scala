package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Skip-gram co-occurrence association mining — the word2vec/GloVe
  * PREPROCESSING pass: count unordered token pairs co-occurring within a
  * small forward window, rank them by a PMI-style association ratio.
  * Embedding training consumes exactly this pair table (SGNS draws its
  * positive samples from it; GloVe factorizes it), and the association
  * ranking is the classic collocation report on its own.
  *
  * Exactness rule: PMI's log is a float; the MONOTONE-equivalent integer
  * ratio `c_ab·T·10^6 div (n_a·n_b)` ranks identically and both engines
  * compute it bit-for-bit (the q105 lift trick at token scale). Products
  * stay under 2^63 up to ~10^8 window pairs with 10^3-count hot pairs;
  * past that, stage through DECIMAL like q143.
  *
  * Scale shape: pair generation is NARROW — posexplode + a slice of the
  * following `window` tokens per position, no self-join — so the corpus
  * collapses map-side into the (a, b) count aggregate; the unigram table
  * is vocabulary-sized, the total is one broadcast row, and the top-k is
  * a TakeOrdered with a full (score, a, b) tiebreak, never a global
  * sort. */
object SkipGram {

  /** Top-`topK` unordered token pairs by association ratio among pairs
    * co-occurring within `window` following tokens at least `minCount`
    * times. Returns (a, b, c_ab, score). */
  def associations(docs: DataFrame, textCol: String, window: Int = 2,
      minCount: Long = 5L, topK: Int = 20): DataFrame = {
    require(window >= 1, s"window=$window must be >= 1")
    require(topK >= 1, s"topK=$topK must be >= 1")
    val tk = docs.select(TextFunctions.tokensWs(col(textCol)).as("ts"))
      .filter(size(col("ts")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // narrow pair stream: each position pairs with its next `window`
    // tokens (slice is 1-based; posexplode's p is 0-based)
    val prs = tk
      .select(col("ts"), posexplode(col("ts")).as(Seq("p", "w1")))
      .select(col("w1"), explode(expr(s"slice(ts, p + 2, $window)")).as("w2"))
      .select(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
    val pc = prs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = tk.select(explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    // total window pairs BEFORE the minCount filter — the normalizer is a
    // corpus property, not a property of which pairs cleared the floor
    val tot = prs.agg(coalesce(sum(lit(1L)), lit(0L)).as("t_pairs"))
    val out = pc
      .join(uni.select(col("tok").as("a"), col("n").as("na")), "a")
      .join(uni.select(col("tok").as("b"), col("n").as("nb")), "b")
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("c_ab"),
        expr("(c_ab * t_pairs * 1000000L) div (na * nb)").as("score"))
      .orderBy(col("score").desc, col("a"), col("b"))
      .limit(topK)
    LoopCache.finish(out, tk, pc)
  }
}
