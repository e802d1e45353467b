package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{DataType, DoubleType}

/** CPython-faithful `round(x, n)` for doubles (the reference's P11,
  * /root/reference/src/calcular_kpi.py:151-152).
  *
  * Python rounds the EXACT BINARY value of the double half-even; Spark's
  * `bround` instead rounds the shortest DECIMAL representation
  * (`BigDecimal.valueOf` goes through `Double.toString`). The two differ on
  * any value whose shortest repr is a decimal tie but whose binary value is
  * not: `696.515` is really `696.51499999999999…`, so Python rounds to
  * `696.51` while `bround` sees the string tie and rounds to `696.52` —
  * exactly the one-cell divergence the reference-parity gate caught.
  *
  * `new java.math.BigDecimal(x)` (exact binary expansion, no string) +
  * `setScale(n, HALF_EVEN)` reproduces Python's behavior: ties are decided
  * on the true value, and genuine binary ties (0.125) still go to even. */
case class PyRoundExpression(child: Expression, scale: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(scale >= 0 && scale <= 18, s"scale must be in [0, 18], got $scale")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "py_round"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    PyRoundExpression.round(input.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PyRoundExpression.round($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): PyRoundExpression =
    copy(child = newChild)
}

object PyRoundExpression {
  /** Static helper shared by interpreted eval and generated code. */
  def round(d: Double, scale: Int): Double =
    if (d.isNaN || d.isInfinite) d
    else new java.math.BigDecimal(d)
      .setScale(scale, java.math.RoundingMode.HALF_EVEN)
      .doubleValue()

  /** Column API: Python-semantics `round(c, scale)`. */
  def pyRound(c: Column, scale: Int): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(PyRoundExpression(SqlBridge.expression(c), scale))
  }
}
