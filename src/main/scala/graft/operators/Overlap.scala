package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Cross-source contamination matrix: for every pair of corpus sources,
  * how many distinct `blockTokens`-token blocks they share. The report a
  * data-mixing owner reads before blending crawls — high overlap between
  * two sources means their mixture weights double-count the same text.
  *
  * Scale shape: blocks are deduplicated to (source, block) and grouped by
  * block; each group carries a `collect_set(source)` bounded by the number
  * of SOURCES (corpus mixes have tens to low hundreds — this is a bounded
  * small set, unlike collecting doc ids), and the pair expansion is a pure
  * array expression (sorted set → upper-triangle pairs) — no self-join of
  * the block table against itself, so the shuffle volume is one row per
  * distinct block, not per candidate pair. The final pair-count groupBy
  * lands on ≤ sources² rows. At 100 TB ride the two block shuffles on
  * xxhash64(block) digests (the dupBlockStats trade) — the exact-text tier
  * is the oracle-checked one.
  */
object Overlap {

  /** The shared blank-safe tokenization contract. */
  private def toks(textCol: Column): Column = TextFunctions.tokensWs(textCol)

  /** (source_a, source_b, n_shared_blocks) for source_a < source_b, only
    * pairs that share at least one block. */
  def sharedBlockMatrix(df: DataFrame, srcCol: String, textCol: String,
      blockTokens: Int = 10): DataFrame = {
    require(blockTokens > 0, s"blockTokens=$blockTokens must be positive")
    val t = toks(col(textCol))
    val blocks = df
      .select(col(srcCol).as("source"), t.as("toks"))
      .select(col("source"),
        // explode-guard, not a filter: a pushed `size(toks) > 0` filter
        // re-ran the tokenize below the projection (Chunking.tokenWindows
        // has the full argument)
        explode(when(size(col("toks")) > 0,
          sequence(lit(0), size(col("toks")) - 1, lit(blockTokens))))
          .as("start"),
        col("toks"))
      .select(col("source"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(blockTokens)))
          .as("block"))
      .distinct()
    val srcSets = blocks
      .groupBy(col("block"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
    // upper-triangle pair expansion over the (bounded) source set: element
    // i pairs with every element after it; slice is 1-based
    val pairs = srcSets.select(
      explode(flatten(transform(col("srcs"), (a, i) =>
        transform(slice(col("srcs"), i + lit(2), size(col("srcs"))),
          b => struct(a.as("source_a"), b.as("source_b")))))).as("p"))
    pairs
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared_blocks"))
  }
}
