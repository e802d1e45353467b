package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via rare-first prefix filtering — the
  * PPJoin-family screen (Chaudhuri et al. SSJoin / Xiao et al. PPJoin),
  * the LOSSLESS member of the near-dup screen family: MinHash-LSH
  * ([[Dedup]]) and SimHash trade false negatives for speed; the prefix
  * filter guarantees completeness — every pair with Jaccard ≥ t shares
  * at least one token in both prefixes (pigeonhole over a global token
  * order), so screen + exact verify returns EXACTLY the ≥ t pairs.
  * That makes the DuckDB oracle self-validating: it computes all-pairs
  * Jaccard with no prefix logic at all, and any screen incompleteness
  * would surface as a missing row in the hash compare.
  *
  * Scale shape: tokens are ordered rarest-first (global document
  * frequency, ties by token), and each set keeps only its first
  * `n − ⌈t·n⌉ + 1` tokens as join keys — frequent tokens (the quadratic
  * buckets) are exactly the ones dropped from prefixes, so candidate
  * buckets stay small by construction; a length filter
  * (`max(|A|,|B|)·tNum ≤ min(|A|,|B|)·tDen`, necessary for J ≥ t)
  * prunes cross-size pairs before the distinct. The per-set ordering
  * window partitions by set id (small per-doc groups, never global).
  * Verification is per-candidate `array_intersect` on the distinct
  * token arrays — integer sizes only, no float similarity anywhere:
  * `jacc_pct = (100·|∩|) div |∪|`.
  */
object PrefixJoin {

  /** Pairs (a < b) of `docs(idCol)` whose DISTINCT `tokensCol` sets have
    * Jaccard ≥ tNum/tDen. Returns (a, b, inter_sz, union_sz, jacc_pct).
    * Token arrays are taken as-is — normalize/tokenize upstream. */
  def selfJoin(docs: DataFrame, idCol: String, tokensCol: String,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val sets = docs.select(col(idCol).cast("long").as("id"),
        array_distinct(col(tokensCol)).as("ts"))
      .filter(size(col("ts")) > 0)
    val tok = sets.select(col("id"), explode(col("ts")).as("tok"))
    val df = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // rare-first rank within each set; prefix keeps pos ≤ n − ⌈t·n⌉ + 1
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("tok"))
    val prefix = tok.join(df, "tok")
      .select(col("id"), col("tok"), col("df"),
        row_number().over(w).as("pos"),
        count(lit(1)).over(Window.partitionBy(col("id"))).as("n"))
      .filter(col("pos") <=
        col("n") - ((col("n") * tNum + tDen - 1) / tDen).cast("long") + 1L)
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          col("a.n") * tNum <= col("b.n") * tDen &&
          col("b.n") * tNum <= col("a.n") * tDen)
      .select(col("a.id").as("a"), col("b.id").as("b")).distinct()
    cand.join(sets.select(col("id").as("a"), col("ts").as("ats")), "a")
      .join(sets.select(col("id").as("b"), col("ts").as("bts")), "b")
      .select(col("a"), col("b"),
        size(array_intersect(col("ats"), col("bts"))).cast("long")
          .as("inter_sz"),
        (size(col("ats")) + size(col("bts"))).cast("long").as("u2"))
      .select(col("a"), col("b"), col("inter_sz"),
        (col("u2") - col("inter_sz")).as("union_sz"))
      .filter(col("inter_sz") * tDen >= col("union_sz") * tNum)
      .select(col("a"), col("b"), col("inter_sz"), col("union_sz"),
        expr("(100 * inter_sz) div union_sz").as("jacc_pct"))
      .orderBy(col("a"), col("b"))
  }
}
