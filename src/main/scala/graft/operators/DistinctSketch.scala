package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count registers — the HyperLogLog state machine
  * (Flajolet et al. 2007) re-expressed so the sketch STATE is engine-
  * exact: every piece is integer arithmetic over an md5-derived hash,
  * so a DuckDB/Trino/anything replay of the same SQL produces the same
  * registers bit-for-bit (unlike `approx_count_distinct`, whose
  * HLL++ state is Spark-private).
  *
  * Layout: m = 256 registers (p = 8). For a key k,
  * `reg  = int(md5(k)[0..2), 16)`            — first 8 hash bits,
  * `v    = int(md5(k)[2..15), 16)`           — next 52 bits,
  * `rho  = 53 - bitlength(v)` (53 if v = 0)  — leading-zero rank.
  * The sketch is max(rho) per (group, reg): max is associative,
  * commutative and idempotent, so register tables merge across shards,
  * days, or partial aggregates by union + re-max — THE property that
  * makes the sketch a 2 KB substitute for a 100 TB distinct scan.
  *
  * The summary serializes the harmonic denominator exactly: reg_sum =
  * Σ 2^(53−max_rho) over touched registers is a BIGINT (≤ 2^60), order-
  * invariant, and sufficient (with the touched-register count) to
  * compute the classic HLL estimate — [[estimate]] does, and the spec
  * asserts its accuracy; oracle queries compare the integer state
  * itself.
  */
object DistinctSketch {

  /** Register count (2^8). Std error of the estimate ≈ 1.04/√256 ≈ 6.5%. */
  val M = 256

  // ONE digest per row: reg and rho unpack from the same codegen'd
  // expression (functions/Md5Register.scala) — the hex-string SQL
  // formulation below stays the cross-engine contract the oracles
  // replay, and the expression is spec-pinned bit-equal to it:
  //   reg = conv(substring(md5(k),1,2),16,10)
  //   v   = conv(substring(md5(k),3,13),16,10)
  //   rho = IF(v=0, 53, 53 - length(bin(v)))
  private def packed(key: Column): Column =
    graft.functions.Md5RegisterExpression.md5Register(key)

  /** Register index in [0, 256): the hash's first 8 bits. */
  def reg(key: Column): Column = shiftright(packed(key), 6)

  /** Leading-zero rank in [1, 53] of the hash's next 52 bits (bit
    * length via integer ops — no float log2, cross-engine exact). */
  def rho(key: Column): Column = packed(key).bitwiseAND(lit(63))

  /** Sketch state: one (group..., reg, max_rho) row per touched
    * register — at most 256 rows per group whatever the key count.
    * `max(rho)` per register rides `max(packed)`: packed = reg·64+rho,
    * so within a register group the packed max IS the rho max — one
    * hash, one narrow int column through the whole aggregate. */
  def registers(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame =
    df.select(groupCols.map(col) :+ packed(col(keyCol)).as("_pk"): _*)
      .groupBy(groupCols.map(col) :+ shiftright(col("_pk"), 6).as("reg"): _*)
      .agg(max(col("_pk").bitwiseAND(lit(63))).as("max_rho"))

  /** Merge register tables (per-shard / per-day sketches) into one:
    * union + max per (group, reg). Exactly the partial-aggregation step
    * Spark's own combiner would run — exposed for cross-job reuse. */
  def merge(groupCols: Seq[String], sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(groupCols.map(col) :+ col("reg"): _*)
      .agg(max(col("max_rho")).as("max_rho"))

  /** Integer summary per group: `reg_sum` = Σ 2^(53−max_rho) (BIGINT,
    * order-invariant) and `registers_hit`. */
  def summary(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - max_rho)")).as("reg_sum"),
        count(lit(1)).as("registers_hit"))

  /** The HLL estimate off the integer summary (driver-side math — the
    * distributed work ends at the exact integers). Untouched registers
    * contribute 2^0 to the harmonic sum; small-range linear counting
    * kicks in below 2.5·m when any register is empty. */
  def estimate(regSum: Long, registersHit: Long): Double = {
    val m = M.toDouble
    val zeros = (M - registersHit).toDouble
    val z = (regSum.toDouble + zeros * math.pow(2.0, 53)) / math.pow(2.0, 53)
    val alpha = 0.7213 / (1 + 1.079 / m)
    val raw = alpha * m * m / z
    if (raw <= 2.5 * M && zeros > 0) m * math.log(m / zeros) else raw
  }
}
