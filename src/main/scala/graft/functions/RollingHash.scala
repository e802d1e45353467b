package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (h = h·prime + byte, mod 2^64 via Long overflow)
  * over a string's UTF-8 bytes — a document fingerprint for dedup and
  * sampling that is cheaper than MD5 (no allocation, one multiply-add per
  * byte) and stable across runs/engines.
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so it
  * participates in WholeStageCodegen (a Scala UDF here would break the
  * codegen span around the scan projection — measurably slower at scale).
  */
case class RollingHashExpression(child: Expression, prime: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  // analysis-time coercion: non-string children cast to string rather than
  // ClassCastException-ing on executors
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  // deterministic pure function of the child: lets Catalyst's
  // ConstantFolding collapse rolling_hash(<literal>) at plan time
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    RollingHashExpression.hashBytes(input.asInstanceOf[UTF8String].getBytes, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashExpression.hashBytes($c.getBytes(), ${prime}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpression =
    copy(child = newChild)
}

object RollingHashExpression {
  /** Static helper shared by interpreted eval and generated code. */
  def hashBytes(bytes: Array[Byte], prime: Long): Long = {
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < bytes.length) {
      h = h * prime + bytes(i)
      i += 1
    }
    h
  }

  val DefaultPrime = 31L

  /** Column API: `rolling_hash(text)`. */
  def rollingHash(c: Column, prime: Long = DefaultPrime): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(RollingHashExpression(SqlBridge.expression(c), prime))
  }
}
