package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Whole MinHash signature of a token array as ONE scalar expression.
  *
  * A MinHash signature is a pure per-document function — min over the
  * document's shingles of each permuted hash — so expressing it
  * relationally (explode shingles → groupBy(doc) with 64 min aggregates)
  * buys nothing and costs a full shuffle of |docs|·|tokens| rows plus an
  * interpreted higher-order-function pass (Spark evaluates `transform`
  * lambdas without codegen). This expression does the whole computation in
  * one tight loop inside WholeStageCodegen: hash tokens, roll n-token
  * windows, track `numPerm` mins — O(tokens · numPerm) per row, zero
  * shuffle. At 100 TB the signature stage becomes embarrassingly parallel
  * map work on the scan; only LSH banding afterwards shuffles.
  *
  * Hash-for-hash identical to the relational formulation it replaces
  * (verified in TextOpsSpec): token hash = `xxhash64(token)`, window hash
  * = `xxhash64(th_1..th_n)`, short-doc (< n tokens) hash =
  * `xxhash64(array(th))`, permutation i = `xxhash64(i, windowHash)` — all
  * with Spark's default seed 42 and left-to-right chaining, via the same
  * [[XXH64]] primitives the built-in expression uses.
  */
case class MinHashSignatureExpression(
    child: Expression, numPerm: Int, shingleN: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  // analysis-time input check: a non-array child would otherwise pass the
  // analyzer and ClassCastException on executors
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    MinHashSignatureExpression.compute(
      input.asInstanceOf[ArrayData], numPerm, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSignatureExpression.compute($c, $numPerm, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpression =
    copy(child = newChild)
}

object MinHashSignatureExpression {
  private val Seed = 42L // Spark's xxhash64 default seed

  /** Static helper shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, numPerm: Int, n: Int): ArrayData = {
    val t = tokens.numElements()
    val th = new Array[Long](t)
    var i = 0
    while (i < t) {
      // null token → hash unchanged from the seed, exactly like the
      // built-in xxhash64 (HashExpression skips null children)
      val s = tokens.getUTF8String(i)
      th(i) = if (s == null) Seed else XXH64.hashUTF8String(s, Seed)
      i += 1
    }
    // window hashes: n-token windows when the doc is long enough, else one
    // hash of the whole token-hash array (same fold xxhash64 applies to a
    // LongType array value)
    val wh =
      if (t >= n) {
        val w0 = t - n + 1
        val a = new Array[Long](w0)
        var w = 0
        while (w < w0) {
          var h = Seed
          var j = 0
          while (j < n) { h = XXH64.hashLong(th(w + j), h); j += 1 }
          a(w) = h
          w += 1
        }
        a
      } else {
        var h = Seed
        var j = 0
        while (j < t) { h = XXH64.hashLong(th(j), h); j += 1 }
        Array(h)
      }
    val sig = new Array[Long](numPerm)
    var p = 0
    while (p < numPerm) {
      val seedP = XXH64.hashInt(p, Seed) // = xxhash64(p, ·) prefix
      var m = Long.MaxValue
      var w = 0
      while (w < wh.length) {
        val v = XXH64.hashLong(wh(w), seedP)
        if (v < m) m = v
        w += 1
      }
      sig(p) = m
      p += 1
    }
    new GenericArrayData(sig)
  }

  /** Column API: `minhash_sig(tokens)` over a `split` token array. */
  def minhashSig(tokens: Column, numPerm: Int = 64, shingleN: Int = 3): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(MinHashSignatureExpression(
      SqlBridge.expression(tokens), numPerm, shingleN))
  }
}
