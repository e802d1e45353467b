package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.MortonCodeExpression.mortonCode

/** Z-order (Morton-curve) data layout: cluster rows so that per-file
  * min/max ranges stay tight on BOTH layout dimensions, instead of only
  * the leading column of a lexicographic sort. Parquet scans then skip
  * whole files/row-groups for range predicates on EITHER dimension —
  * at 100 TB this is the difference between reading ~1/numFiles of the
  * data and reading all of it for a second-dimension filter.
  *
  * Mechanics: each dimension is scaled to a 16-bit bucket ordinal using
  * its global min/max (one tiny agg job — two doubles per dimension
  * collected to the driver, never data-sized), the two ordinals are
  * bit-interleaved into a single Long z-value (codegen'd
  * `morton_code`), and rows are range-partitioned + sorted by it. The
  * z-value is layout metadata only — it is dropped before the data is
  * returned/written, and the row set is IDENTICAL to the input (the
  * oracle for the q68 query is the plain unclustered scan).
  *
  * Equal-width (not equal-depth) bucketing: quantile buckets would
  * balance ordinals under skew, but need an approxQuantile pass and
  * make the layout data-dependent; 16 bits of equal width is fine-
  * grained enough that residual skew lands across many z-values.
  */
object ZOrder {

  /** Scale `c` into [0, 65535] given global [lo, hi]; constant columns
    * (hi == lo) collapse to ordinal 0. */
  private def ordinal16(c: Column, lo: Double, hi: Double): Column =
    if (hi > lo)
      least(lit(65535), greatest(lit(0),
        ((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(65535.0))
          .cast("int")))
    else lit(0)

  /** Re-cluster `df` on the z-curve over two numeric dimensions into
    * `numFiles` range partitions, each sorted by z-value. Rows are
    * unchanged; only physical order/placement moves. Nulls in either
    * dimension z-sort as ordinal 0 (morton_code's null → first range). */
  def zorderBy(df: DataFrame, dimA: String, dimB: String,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val Array(row) = df.agg(
      min(col(dimA).cast("double")), max(col(dimA).cast("double")),
      min(col(dimB).cast("double")), max(col(dimB).cast("double"))).collect()
    if (row.isNullAt(0) || row.isNullAt(2)) return df // empty/all-null input
    val z = mortonCode(
      ordinal16(col(dimA), row.getDouble(0), row.getDouble(1)),
      ordinal16(col(dimB), row.getDouble(2), row.getDouble(3)))
    df.withColumn("__graft_z", z)
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
  }

  /** z-order `df` on (dimA, dimB) and write it as `numFiles` parquet
    * files at `path` — the layout pass of a lakehouse OPTIMIZE. */
  def zorderWrite(df: DataFrame, path: String, dimA: String, dimB: String,
      numFiles: Int): Unit =
    zorderBy(df, dimA, dimB, numFiles)
      .write.mode("overwrite").parquet(path)
}
