package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss sign projection: compress a d-dim integer
  * embedding to k dims with a fixed ±1 matrix — the standard index-shrink
  * step between quantization (operators/Quantize) and ANN, preserving
  * pairwise L2 order to within the JL distortion bound at a fraction of
  * the storage and distance-evaluation cost.
  *
  * Determinism contract: cell (i, j) of the matrix is the PARITY of the
  * first md5 word of "i:j" (+1 even, −1 odd) — the engine-portable
  * md5Word32 contract (functions/Md5Word.scala) that every graft split /
  * bucket draw already rides, so a DuckDB oracle replays the whole
  * projection with `('0x' || substr(md5(i || ':' || j), 1, 8))::BIGINT`
  * arithmetic and integer sums. No float appears anywhere: int8 codes in,
  * exact BIGINT components out — projected vectors and distances are
  * bit-identical on any engine, any partitioning, any cluster.
  *
  * Scale shape: the matrix is a pure function of indices, materialized
  * ONCE driver-side as a k×d literal (1 KB-scale for d=64, k=16) — zero
  * runtime hashing, zero broadcast, and the projection is a NARROW map
  * stage (one nested HOF per row, d·k integer multiply-adds), so it
  * composes with any upstream layout and shuffles nothing.
  */
object Projection {

  /** ±1 at matrix cell (i = input dim, j = output dim): parity of
    * md5word32("i:j"). */
  def sign(i: Int, j: Int): Int =
    if (graft.functions.Md5Word32Expression.word32(
        s"$i:$j".getBytes("UTF-8")) % 2 == 0) 1 else -1

  /** Append `outCol`: the k-dim BIGINT sign projection of the d-dim
    * integer vector in `codesCol` (element i of every row must exist for
    * i < dIn — ragged inputs are a caller bug surfaced as a null sum). */
  def signProject(df: DataFrame, codesCol: String, dIn: Int, dOut: Int,
      outCol: String = "proj"): DataFrame = {
    require(dIn >= 1 && dOut >= 1 && dOut <= dIn,
      s"signProject: need 1 <= dOut <= dIn, got dIn=$dIn dOut=$dOut")
    val rows: Seq[Seq[Long]] =
      (0 until dOut).map(j => (0 until dIn).map(i => sign(i, j).toLong))
    df.withColumn(outCol, transform(typedLit(rows), row =>
      aggregate(zip_with(col(codesCol), row, (c, s) => c.cast("long") * s),
        lit(0L), (a, v) => a + v)))
  }

  /** Exact squared L2 between two integer array columns, as BIGINT. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => (x.cast("long") - y.cast("long"))
          * (x.cast("long") - y.cast("long"))),
      lit(0L), (acc, v) => acc + v)
}
