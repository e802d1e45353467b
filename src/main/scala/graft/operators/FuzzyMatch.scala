package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Edit-distance (typo-level) near-duplicate matching — the dedup tier
  * between exact digests (q30) and shingle/minhash similarity (q32):
  * pairs whose normalized text differs by a handful of character edits,
  * the shape OCR noise and hand-edited copies take.
  *
  * All-pairs edit distance is O(n²·len²) — intractable. This uses the
  * standard blocking strategy: candidates must share a `blockLen`-char
  * normalized prefix, so candidate generation is ONE equi-join on the
  * block key (an ordinary shuffle join, Σ blockSize² pairs — the
  * blocking analogue of the LSH band join), and each candidate is then
  * verified by `levenshtein` over a `prefixLen`-char window. Edit costs
  * are unit integers, so the verdict is engine-exact (DuckDB's
  * levenshtein replays it verbatim — no float, no hash).
  *
  * Recall caveat, as with any blocking scheme: an edit INSIDE the block
  * key hides the pair. When recall matters, run extra passes with
  * shifted or suffix block keys and union the results — each pass is
  * the same bounded join.
  */
object FuzzyMatch {

  /** Candidate pairs sharing a `blockLen`-char normalized-prefix block,
    * verified at levenshtein ≤ `maxDist` over `prefixLen`-char windows.
    * Returns (id_a, id_b, edit_distance) with id_a < id_b. */
  def blockedPairs(df: DataFrame, idCol: String, textCol: String,
      blockLen: Int = 12, prefixLen: Int = 64, maxDist: Int = 5): DataFrame = {
    require(blockLen >= 1 && prefixLen >= blockLen && maxDist >= 0,
      s"need 1 <= blockLen ($blockLen) <= prefixLen ($prefixLen), maxDist >= 0")
    val norm = TextFunctions.normalizeText(col(textCol))
    val base = df
      .select(col(idCol).cast("long").as("id"), norm.as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("id"),
        substring(col("norm"), 1, blockLen).as("blk"),
        substring(col("norm"), 1, prefixLen).as("pfx"))
    base.as("x").join(base.as("y"),
        col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        levenshtein(col("x.pfx"), col("y.pfx")).as("edit_distance"))
      .filter(col("edit_distance") <= maxDist)
  }
}
