package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash fingerprint of a token array as ONE scalar expression —
  * majority vote of token-hash bits, occurrence-weighted (a token counted
  * once per occurrence, like the explode-based formulation it replaces).
  *
  * Same reasoning as [[MinHashSignatureExpression]]: the fingerprint is a
  * pure per-document function, so the explode→groupBy(id) formulation
  * (64 sum aggregates over |docs|·|tokens| shuffled rows) wastes a full
  * shuffle on what is one tight loop per row. Hash-for-hash identical to
  * that formulation: token hash = `xxhash64(token)` (seed 42), bit j of
  * the fingerprint set iff strictly more tokens have bit j set than
  * clear (ties → 0, matching `sum > 0`).
  */
case class SimHashExpression(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // analysis-time input check: a non-array child would otherwise pass the
  // analyzer and ClassCastException on executors
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    SimHashExpression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpression =
    copy(child = newChild)
}

object SimHashExpression {
  private val Seed = 42L // Spark's xxhash64 default seed

  /** Static helper shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val t = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < t) {
      // null token → seed, matching the built-in xxhash64's null handling
      val s = tokens.getUTF8String(i)
      val h = if (s == null) Seed else XXH64.hashUTF8String(s, Seed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Column API: `simhash(tokens)` over a `split` token array. */
  def simhash(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(SimHashExpression(SqlBridge.expression(tokens)))
  }
}
