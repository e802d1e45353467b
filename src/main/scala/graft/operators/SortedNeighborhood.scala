package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sorted-neighborhood dedup screen (Hernández–Stolfo SNM) — the
  * LINEAR-candidates member of the screen family: LSH banding ([[Dedup]])
  * and key blocking ([[FuzzyMatch]]) both emit Σ bucketSize² candidates,
  * which a hot key turns quadratic; SNM sorts records by a key and
  * compares each record only to its `windowSize` nearest neighbors in
  * sort order — candidates ≤ n·w BY CONSTRUCTION, whatever the key
  * distribution. The trade is recall at window edges: near-dups more
  * than w positions apart in sort order are missed (multi-pass SNM with
  * a second sort key is the standard recovery, same bounded cost).
  *
  * Scale shape: a truly global sort window would be a single-partition
  * exchange, so the sort is bucketed — `partitionBy` a `blockLen`-char
  * prefix of the sort key, order by (key, id) inside the block. Blocks
  * are sorted independently in parallel; neighborhoods never span a
  * prefix boundary, which costs nothing real: records differing in the
  * first `blockLen` normalized chars were ≥ w apart in the global order
  * anyway (for any near-dup-sized corpus), so the bucketed screen
  * proposes the same pairs the global sort would. Verification reuses
  * the repo's one exact contract ([[Dedup.shingleJaccardOnCandidates]]):
  * every emitted pair really has shingle jaccard ≥ the threshold.
  */
object SortedNeighborhood {

  /** SNM candidate pairs: ids within `windowSize` positions of each
    * other in the per-block (key, id) sort order. Returns (id_a, id_b)
    * with id_a < id_b; pairs are unique by construction (only the
    * sort-order predecessor proposes a pair, once). */
  def candidates(df: DataFrame, idCol: String, textCol: String,
      windowSize: Int = 3, blockLen: Int = 8): DataFrame = {
    require(windowSize >= 1 && blockLen >= 1,
      s"need windowSize ($windowSize) >= 1 and blockLen ($blockLen) >= 1")
    val norm = TextFunctions.normalizeText(col(textCol))
    val base = df
      .select(col(idCol).cast("long").as("id"), norm.as("key"))
      // a non-numeric id casts to null; such a row would still occupy a
      // window slot and its pairs would vanish in least/greatest below,
      // silently shrinking recall — drop it here so the screen's n·w
      // candidate bound refers to rows that can actually emit pairs
      .filter(col("id").isNotNull && length(col("key")) > 0)
      .withColumn("blk", substring(col("key"), 1, blockLen))
    val w = Window.partitionBy(col("blk")).orderBy(col("key"), col("id"))
    base
      .select(col("id") +: (1 to windowSize).map(k =>
        lead(col("id"), k).over(w).as(s"nb$k")): _*)
      .select(col("id"),
        explode(array((1 to windowSize).map(k => col(s"nb$k")): _*)).as("nb"))
      .filter(col("nb").isNotNull)
      // sort order is by key, not id — orient each pair numerically
      .select(least(col("id"), col("nb")).as("id_a"),
        greatest(col("id"), col("nb")).as("id_b"))
  }

  /** SNM-screened, exactly-verified near-dup pairs:
    * (id_a, id_b, jaccard) for screened pairs with shingle jaccard
    * ≥ `minJaccard` — the same verify contract as q32/q33. */
  def verifiedPairs(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.8, windowSize: Int = 3, blockLen: Int = 8,
      shingleN: Int = 3): DataFrame =
    Dedup.shingleJaccardOnCandidates(df, idCol, textCol,
      candidates(df, idCol, textCol, windowSize, blockLen),
      minJaccard, shingleN)
}
