package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-accelerated semi join — the scale pattern for "filter a
  * huge fact table by a large-but-not-broadcastable key set".
  *
  * A plain semi join shuffles BOTH sides on the key. When the probe side
  * is 100 TB and highly selective (most fact rows do NOT match), that
  * shuffle is mostly wasted motion. The bloom pass builds a compact
  * filter over the build side's keys (an aggregate, driver-merged like
  * any sketch) and drops non-matching fact rows AT THE SCAN — only the
  * surviving ~matches (plus fpp false positives) reach the real semi
  * join, which then restores EXACT semantics. Result is identical to the
  * plain semi join; the bloom tier only cuts shuffle volume. (Spark's
  * AQE applies the same idea internally as "runtime bloom filter join"
  * for qualifying plans; this operator makes the pattern explicit and
  * tunable.)
  *
  * The membership probe is Spark's own codegen'd Catalyst predicate
  * (`BloomFilterMightContain`, the expression AQE's runtime filter
  * uses), fed the serialized sketch as a plan literal — no Scala UDF, so
  * the probe stays inside WholeStageCodegen, and the literal ships once
  * per stage via the broadcast task binary (not per row or per task).
  */
object BloomJoin {

  /** Exact left-semi join of `left` on `leftKey` against `right.rightKey`,
    * bloom-prefiltered. Keys must be integral (LongType-compatible).
    *
    * @param expectedItems sizing for the sketch (≈ |distinct right keys|)
    * @param fpp           false-positive rate: space/selectivity trade */
  def bloomSemiJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val filter = right.stat.bloomFilter(rightKey, expectedItems, fpp)
    val bytes = {
      val b = new ByteArrayOutputStream(); filter.writeTo(b); b.toByteArray
    }
    // native predicate over the serialized sketch: `might_contain(lit, key)`
    val probe = SqlBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      SqlBridge.expression(col(leftKey).cast("long"))))
    // rename the build-side key before joining: a bare col(rightKey) would
    // be ambiguous whenever leftKey and rightKey share a name
    val keys = right.select(col(rightKey).as("__bloom_join_key"))
    left.filter(probe)
      .join(keys, col(leftKey) === col("__bloom_join_key"), "left_semi")
  }
}
