package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `ArrayType(Double/Float)` embedding columns.
  * Built on the higher-order functions `zip_with`/`aggregate` (codegen'd,
  * no UDF) — each is a single left-to-right fold, so results are
  * deterministic and engine-portable (DuckDB's list kernels fold the same
  * way). For 100 TB: these run inside the scan projection; the expensive
  * part of similarity search is the pairing strategy (see operators
  * .Similarity), not the arithmetic.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ as a double left fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** cosine(a,b) = dot/(‖a‖·‖b‖) — computed as dot / (na*nb) exactly like
    * DuckDB's list_cosine_similarity so ranking is cross-engine stable. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Deterministic pseudo-random ±1 hyperplane sign for LSH: sign of
    * xxhash64 of (plane, component). Pure function of the indices — every
    * executor and every run derives the same planes with no broadcast of
    * random state. */
  def hyperplaneSign(plane: Int, component: Column): Column =
    when(pmod(xxhash64(lit(plane), component), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane (SimHash) bucket id over `nPlanes` planes: bit i is
    * the sign of the projection of the embedding onto pseudo-random ±1
    * plane i. Vectors in the same bucket are likely cosine-close. */
  def hyperplaneBucket(emb: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (v, i) => v * hyperplaneSign(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
