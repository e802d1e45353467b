package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-curve) bit-interleave of two 16-bit bucket ordinals — the
  * kernel of the z-order data layout (`operators/ZOrder`): sorting by the
  * interleaved code clusters rows so that EVERY interleaved dimension gets
  * tight per-file min/max ranges, instead of only the leading column of a
  * lexicographic sort.
  *
  * Native codegen'd expression (one multiply-free bit-spread per side, no
  * UDF) so the layout pass stays inside WholeStageCodegen. Inputs outside
  * [0, 65535] are clamped — the caller scales values to bucket ordinals. */
case class MortonCodeExpression(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "morton_code"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MortonCodeExpression.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.MortonCodeExpression.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonCodeExpression =
    copy(left = newLeft, right = newRight)
}

object MortonCodeExpression {
  /** Spread the low 16 bits of `v` to even bit positions (0,2,4,…,30). */
  private def spread(v: Int): Long = {
    var x = (math.min(math.max(v, 0), 0xFFFF)).toLong
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Interleaved z-value: bit i of `a` → bit 2i, bit i of `b` → bit 2i+1. */
  def interleave(a: Int, b: Int): Long = spread(a) | (spread(b) << 1)

  /** Column API: `mortonCode(a, b)` over 16-bit bucket ordinals. */
  def mortonCode(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(MortonCodeExpression(
      SqlBridge.expression(a), SqlBridge.expression(b)))
  }
}
