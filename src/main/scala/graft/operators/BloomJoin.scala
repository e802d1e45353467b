package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter-accelerated semi join — the scale pattern for "filter a
  * huge fact table by a large-but-not-broadcastable key set".
  *
  * A plain semi join shuffles BOTH sides on the key. When the probe side
  * is 100 TB and highly selective (most fact rows do NOT match), that
  * shuffle is mostly wasted motion. The bloom pass builds a compact
  * filter over the build side's keys (an aggregate, driver-merged like
  * any sketch), broadcasts it, and drops non-matching fact rows AT THE
  * SCAN — only the surviving ~matches (plus fpp false positives) reach
  * the real semi join, which then restores EXACT semantics. Result is
  * identical to the plain semi join; the bloom tier only cuts shuffle
  * volume. (Spark's AQE applies the same idea internally as "runtime
  * bloom filter join" for qualifying plans; this operator makes the
  * pattern explicit and tunable.)
  *
  * The membership probe is a Scala UDF over a broadcast sketch — the one
  * place a UDF earns its keep: the alternative (shuffling the fact table)
  * costs orders of magnitude more than the codegen break. */
object BloomJoin {

  /** Exact left-semi join of `left` on `leftKey` against `right.rightKey`,
    * bloom-prefiltered. Keys must be integral (LongType-compatible).
    *
    * Broadcast lifetime: the sketch broadcast must outlive the RETURNED
    * DataFrame (lazy — any later action re-evaluates the filter), so this
    * method cannot destroy it. On a long-lived session issuing many bloom
    * joins, either reuse one returned frame per key-set, or when a result
    * is final, materialize it and release the block yourself:
    * `val (df, bc) = bloomSemiJoinManaged(...); df.write...; bc.destroy()`.
    *
    * @param expectedItems sizing for the sketch (≈ |distinct right keys|)
    * @param fpp           false-positive rate: space/selectivity trade */
  def bloomSemiJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    bloomSemiJoinManaged(left, right, leftKey, rightKey, expectedItems, fpp)._1

  /** [[bloomSemiJoin]] plus the sketch broadcast handle, for callers who
    * need to release the broadcast block (`bc.destroy()`) once the frame
    * is materialized — see the lifetime note above. */
  def bloomSemiJoinManaged(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      expectedItems: Long, fpp: Double = 0.01)
      : (DataFrame, org.apache.spark.broadcast.Broadcast[BloomFilter]) = {
    val spark = left.sparkSession
    val filter: BloomFilter =
      right.stat.bloomFilter(rightKey, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(filter)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    // rename the build-side key before joining: a bare col(rightKey) would
    // be ambiguous whenever leftKey and rightKey share a name
    val keys = right.select(col(rightKey).as("__bloom_join_key"))
    val out = left.filter(mightContain(col(leftKey).cast("long")))
      .join(keys, col(leftKey) === col("__bloom_join_key"), "left_semi")
    (out, bc)
  }
}
