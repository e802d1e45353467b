package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd kernels for the dense-vector hot loops.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) evaluate their
  * lambdas on the INTERPRETED path — one boxed function call per element —
  * which is exactly wrong for the innermost loop of similarity search over
  * a 100 TB corpus. These expressions do the same arithmetic in a tight
  * primitive loop inside WholeStageCodegen.
  *
  * Bit-compatibility: each kernel performs the IDENTICAL IEEE operation
  * sequence as the fold it replaces (left-to-right accumulation, same
  * operation order), so results are bit-equal to the HOF formulation and
  * to DuckDB's list kernels — ANN rankings stay oracle-stable (asserted
  * in PipelineOpsSpec). The one deliberate divergence: malformed input
  * (length mismatch, null elements) throws a named error where the fold
  * returned a silent null — corrupt embeddings should stop a pipeline,
  * not quietly drop out of its rankings.
  */
object VectorKernels {

  /** Malformed embeddings fail FAST with a named error (ANSI-mode spirit)
    * instead of the HOF fold's silent null — a length-mismatched or
    * null-holed vector in an ANN pipeline is corrupt input, and a null
    * that vanishes in a top-k ranking hides it. */
  private def checkPair(a: ArrayData, b: ArrayData, op: String): Int = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"$op: embedding lengths differ ($n vs ${b.numElements()})")
    n
  }

  private def checkNotNull(arr: ArrayData, i: Int, op: String): Unit =
    if (arr.isNullAt(i))
      throw new IllegalArgumentException(s"$op: null element at index $i")

  /** cosine = (Σaᵢbᵢ) / (sqrt(Σaᵢ²)·sqrt(Σbᵢ²)), one pass. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = checkPair(a, b, "cosine_sim")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      checkNotNull(a, i, "cosine_sim"); checkNotNull(b, i, "cosine_sim")
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Σ (aᵢ−bᵢ)² */
  def l2Sq(a: ArrayData, b: ArrayData): Double = {
    val n = checkPair(a, b, "l2_sq")
    var acc = 0.0
    var i = 0
    while (i < n) {
      checkNotNull(a, i, "l2_sq"); checkNotNull(b, i, "l2_sq")
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Random-hyperplane bucket: bit p = sign of Σᵢ vᵢ·sign(xxhash64(p, i)).
    * Component-inner loop keeps each plane's accumulation order identical
    * to the per-plane left-to-right fold. */
  def hyperplaneBucket(emb: ArrayData, nPlanes: Int): Long = {
    require(nPlanes >= 1 && nPlanes <= 63,
      s"hyperplane_bucket: nPlanes must be in [1, 63], got $nPlanes")
    val t = emb.numElements()
    var c = 0
    while (c < t) { checkNotNull(emb, c, "hyperplane_bucket"); c += 1 }
    val acc = new Array[Double](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val hp = XXH64.hashInt(p, 42L) // xxhash64(p, ·) prefix, seed 42
      var a = 0.0
      var i = 0
      while (i < t) {
        val h = XXH64.hashInt(i, hp)
        // pmod(h, 2) == 0 -> +1 else -1
        val sign = if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
        a += emb.getDouble(i) * sign
        i += 1
      }
      acc(p) = a
      p += 1
    }
    var bucket = 0L
    p = 0
    while (p < nPlanes) {
      if (acc(p) >= 0) bucket += (1L << p)
      p += 1
    }
    bucket
  }
}

case class CosineSimilarityExpression(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // analysis-time coercion: without this, cosine_sim(array(1,2), ...) over
  // an int array passes the analyzer but getDouble reinterprets 4-byte
  // slots as doubles — silently wrong numbers (int arrays now coerce).
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpression =
    copy(left = newLeft, right = newRight)
}

case class L2SqExpression(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2Sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.l2Sq($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqExpression =
    copy(left = newLeft, right = newRight)
}

case class HyperplaneBucketExpression(child: Expression, nPlanes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  // bucket bits live in one Long: plane p sets bit p, so more than 63
  // planes would wrap `1L << p` mod 64 and silently collide buckets
  require(nPlanes >= 1 && nPlanes <= 63,
    s"nPlanes must be in [1, 63], got $nPlanes")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"
  override def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneBucket(input.asInstanceOf[ArrayData], nPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.hyperplaneBucket($c, $nPlanes)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpression =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.SqlBridge

  def cosineSim(a: Column, b: Column): Column =
    SqlBridge.column(CosineSimilarityExpression(
      SqlBridge.expression(a), SqlBridge.expression(b)))

  def l2Sq(a: Column, b: Column): Column =
    SqlBridge.column(L2SqExpression(
      SqlBridge.expression(a), SqlBridge.expression(b)))

  def hyperplaneBucket(emb: Column, nPlanes: Int): Column =
    SqlBridge.column(HyperplaneBucketExpression(
      SqlBridge.expression(emb), nPlanes))
}
