package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge mining (Sennrich et al. 2016, arXiv:
  * 1508.07909): the first step of training a BPE tokenizer — count every
  * adjacent symbol pair across the corpus, weighted by word frequency, and
  * rank the merge candidates. (A full trainer iterates merge→recount; the
  * counting pass is the corpus-scale part, the iteration runs on the
  * vocabulary.)
  *
  * The classic scale trick: pair counting runs over the WORD-TYPE table
  * (distinct words with counts), not the token stream. The corpus-scale
  * work is exactly a word count — one map-combined shuffle whose payload
  * is the vocabulary, which grows ~Heaps-law sublinearly with the corpus
  * (~100× fewer rows than tokens at web scale). Pair expansion then runs
  * narrow over word types, each weighted by its count, and the pair
  * aggregate is another vocabulary-sized map-combined shuffle. The top-k
  * is a TakeOrdered tree-reduction, never a global sort.
  */
object Bpe {

  /** Symbol separator for [[applyMerges]]' wrapped representation —
    * a control char that corpus-normalized text never contains. */
  val Sep = "\u0001"

  /** Apply a STATIC rank-ordered merge list to the word-type table —
    * the encode half of BPE, run exactly as a tokenizer deployment
    * does: the merge list is fixed (mined once), application is a pure
    * per-word function, and the corpus-scale cost is vocabulary-sized
    * because it runs over word TYPES.
    *
    * Representation is the whole trick: each word becomes a WRAPPED
    * symbol string `⸱h⸱e⸱l⸱l⸱o⸱` (every symbol PREFIXED with [[Sep]],
    * one trailing). Merge (l, r) is then the literal left-to-right
    * replace of `⸱l⸱r⸱` with `⸱lr⸱` — which is exactly BPE's greedy
    * leftmost application ("aaa" + (a,a) → [aa][a], the consumed shared
    * separator blocks the overlap), and cannot merge across a symbol
    * boundary (the inner characters of a merged symbol carry no
    * separator). No regex, no lookaround — the same `replace`
    * left-to-right contract on every engine, so a DuckDB recursive CTE
    * replays the fold verbatim.
    *
    * Scope note (q145's): a full TRAINER iterates merge→recount on the
    * vocabulary; this applies one mined list — the deployment path, and
    * the only part that touches corpus-scale data.
    *
    * Adds `sym` (the encoded symbol string) and `n_syms`. */
  def applyMerges(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val sym0 = concat(lit(Sep), regexp_replace(col(wordCol), "(.)", "$1" + Sep))
    val folded = merges.foldLeft(sym0) { case (s, (l, r)) =>
      replace(s, lit(Sep + l + Sep + r + Sep), lit(Sep + l + r + Sep))
    }
    words.withColumn("sym", folded)
      .withColumn("n_syms", (length(col("sym"))
        - length(replace(col("sym"), lit(Sep), lit("")))) - 1)
  }

  /** Top-`k` adjacent character-pair merge candidates over the tokens of
    * `textCol` (corpus-standard normalization). Output: (lhs, rhs,
    * pair_freq, rank) — pair_freq = Σ over word types count(word) ×
    * occurrences(pair in word); ties rank lexicographically. */
  def mergeCandidates(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val words = docs
      .select(explode(
        graft.functions.TextFunctions.tokensWs(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val pairs = words
      .filter(length(col("word")) >= 2)
      .select(col("cnt"), col("word"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(
        col("word").substr(col("i"), lit(1)).as("lhs"),
        col("word").substr(col("i") + 1, lit(1)).as("rhs"),
        col("cnt"))
    pairs.groupBy(col("lhs"), col("rhs"))
      .agg(sum(col("cnt")).as("pair_freq"))
      .orderBy(col("pair_freq").desc, col("lhs"), col("rhs")) // TakeOrdered
      .limit(k)
      .withColumn("rank",
        row_number().over( // bounded: k rows, single partition by design
          Window.orderBy(col("pair_freq").desc, col("lhs"), col("rhs")))
          .cast("long"))
  }
}
