package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a token array as ONE codegen'd scalar
  * expression — the tokenize-once fix for the higher-order-function
  * formulation it replaces:
  *
  * {{{ transform(sequence(0, size(tokens)-n), i -> concat_ws(" ", slice(tokens, i+1, n))) }}}
  *
  * That shape re-evaluates the OUTER `tokens` expression tree inside the
  * lambda — when `tokens` is `split(normalize(text))` inlined by the
  * caller, every shingle re-runs the regexp normalize + split over the
  * whole document, turning an O(tokens) projection into O(tokens ·
  * doc_length) (measured: the sf1 q124 shingle stage alone cost 54 s;
  * this expression does the same work in ~2 s). Here the token array is
  * evaluated exactly once per row and each shingle is one UTF8String
  * concat over its n-token window, inside WholeStageCodegen.
  *
  * Output is element-for-element identical to the HOF formulation
  * (spec-asserted in TextOpsSpec): tokens joined by a single space;
  * documents shorter than n tokens yield ONE shingle joining all tokens
  * (`[""]` for empty text, matching `concat_ws` on `[""]`); null tokens
  * are skipped by the join exactly like `concat_ws`. The bare expression
  * null-propagates on a NULL token ARRAY (UnaryExpression contract); the
  * [[ShingleArrayExpression.shingles]] Column API adds the coalesce that
  * restores the HOF's `[""]` there, so null-text documents keep
  * contributing the empty shingle.
  */
case class ShingleArrayExpression(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingle n=$n must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    ShingleArrayExpression.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleArrayExpression.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArrayExpression =
    copy(child = newChild)
}

object ShingleArrayExpression {
  private val Space = UTF8String.fromString(" ")

  /** Static helper shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val t = tokens.numElements()
    // concat_ws semantics: null elements are skipped, not rendered
    val toks = new Array[UTF8String](t)
    var i = 0
    while (i < t) { toks(i) = tokens.getUTF8String(i); i += 1 }
    if (t >= n) {
      val out = new Array[AnyRef](t - n + 1)
      var w = 0
      while (w < out.length) {
        out(w) = joinWindow(toks, w, n)
        w += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array[AnyRef](joinWindow(toks, 0, t)))
    }
  }

  private def joinWindow(toks: Array[UTF8String], start: Int, len: Int): UTF8String = {
    val slice = new Array[UTF8String](len)
    var j = 0
    while (j < len) { slice(j) = toks(start + j); j += 1 }
    UTF8String.concatWs(Space, slice: _*)
  }

  /** Column API: shingles of `tokens` (already-split token array).
    * A NULL token array is coalesced to the empty array first, which
    * `compute` turns into `[""]` — matching the HOF formulation, where
    * `concat_ws` skips a null array arg (the bare expression would
    * null-propagate instead, silently dropping null-text documents from
    * the dedup tiers after the explode). */
  def shingles(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.{array, coalesce}
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(ShingleArrayExpression(
      SqlBridge.expression(coalesce(tokens, array())), n))
  }
}
