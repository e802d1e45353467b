package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The first 32 bits of md5 as an unsigned long — the engine-portable
  * bucket key behind [[graft.operators.Sampling.contentSplit]] and
  * `Dsir.featureBuckets`, computed from the digest bytes in one codegen
  * pass instead of the `conv(substring(md5(x),1,8),16,10)` hex chain
  * (which allocates the full hex string and string-parses it back, per
  * row). Bit-equal to that chain — the cross-engine contract the DuckDB
  * oracles replay as `('0x' || substr(md5(x),1,8))::BIGINT` — and
  * spec-pinned to it. Callers apply their own `% buckets`.
  */
case class Md5Word32Expression(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_word32"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    Md5Word32Expression.word32(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Word32Expression.word32($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Word32Expression =
    copy(child = newChild)
}

object Md5Word32Expression {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Hex chars [1,8] of the digest = bytes 0..3 big-endian, unsigned. */
  def word32(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  /** Column API: unsigned first-32-bits of md5(text). */
  def md5Word32(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(Md5Word32Expression(SqlBridge.expression(c)))
  }
}
