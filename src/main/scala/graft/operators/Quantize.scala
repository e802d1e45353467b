package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 quantization of embedding columns — the standard
  * index-shrink step before ANN at corpus scale (4x smaller vectors, SIMD
  * int8 dot products): per-vector scale = 127 / max|v|, elements mapped by
  * truncation toward zero so every code lies in [-127, 127].
  *
  * All arithmetic is elementwise IEEE double (cast-up from float) — no
  * cross-row accumulation — so the codes are bit-reproducible across
  * engines; graft's oracle replays the same trunc(v * 127 / max|v|) in
  * DuckDB. Zero vectors quantize to all-zero codes (scale guard).
  *
  * This is a narrow map stage: no shuffle, stays inside WholeStageCodegen
  * (array HOFs), composes with any layout/partitioning upstream.
  */
object Quantize {

  /** max|v| over the (non-empty) vector — order-free, exact. */
  def maxAbs(emb: Column): Column =
    array_max(transform(emb, v => abs(v.cast("double"))))

  /** int8 codes as ARRAY<INT> (kept int-typed for portable arithmetic):
    * trunc-toward-zero of v * (127 / max|v|); all-zero when max|v| = 0. */
  def int8Codes(emb: Column): Column = {
    val scale = lit(127.0) / maxAbs(emb)
    when(maxAbs(emb) > 0.0,
      transform(emb, v => (v.cast("double") * scale).cast("int")))
      .otherwise(transform(emb, v => lit(0)))
  }

  /** Per-vector max reconstruction error max|v - q/scale| — elementwise
    * double ops + order-free max, so cross-engine exact. */
  def maxReconError(emb: Column, codes: Column): Column = {
    val invScale = maxAbs(emb) / lit(127.0)
    when(maxAbs(emb) > 0.0,
      array_max(zip_with(emb, codes,
        (v, q) => abs(v.cast("double") - q.cast("double") * invScale))))
      .otherwise(lit(0.0))
  }

  /** Attach quantization columns: `codes` (ARRAY<INT> in [-127,127]),
    * `code_sum` (integer checksum), `max_recon_err`. */
  def quantized(df: DataFrame, embCol: String): DataFrame = {
    val codes = int8Codes(col(embCol))
    df.withColumn("codes", codes)
      .withColumn("code_sum",
        aggregate(col("codes"), lit(0L), (acc, q) => acc + q.cast("long")))
      .withColumn("max_recon_err", maxReconError(col(embCol), col("codes")))
  }
}
