package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The HLL register pair (reg, rho) of `operators/DistinctSketch` computed
  * in ONE md5 pass over the key's raw bytes, packed as `reg·64 + rho`
  * (reg ∈ [0,256), rho ∈ [1,53] — 14 bits total).
  *
  * The SQL formulation (`conv(substring(md5(k),1,2),16,10)` +
  * `conv(substring(md5(k),3,13),16,10)` + `length(bin(v))`) is the
  * cross-engine CONTRACT — it's what the DuckDB oracles replay — but as a
  * Spark plan it hashes every row TWICE and round-trips through hex
  * strings and string-to-long parses. This expression produces
  * bit-identical values from the digest bytes directly (first byte =
  * reg; next 52 bits = v; rho = 53 − bitlength(v)), stays inside
  * WholeStageCodegen, and reuses a thread-local MessageDigest (Spark's
  * own `md5()` allocates one per row).
  */
case class Md5RegisterExpression(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "md5_register"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    Md5RegisterExpression.pack(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5RegisterExpression.pack($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5RegisterExpression =
    copy(child = newChild)
}

object Md5RegisterExpression {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Static helper shared by interpreted eval and generated code.
    * Bit-equivalent to the hex formulation: hex chars [1,2] are digest
    * byte 0 (reg); hex chars [3,15] are bytes 1..6 plus byte 7's high
    * nibble (the 52-bit v); `length(bin(v))` is 64 − nlz(v). */
  def pack(bytes: Array[Byte]): Int = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    val reg = d(0) & 0xFF
    val v =
      ((d(1) & 0xFFL) << 44) | ((d(2) & 0xFFL) << 36) |
        ((d(3) & 0xFFL) << 28) | ((d(4) & 0xFFL) << 20) |
        ((d(5) & 0xFFL) << 12) | ((d(6) & 0xFFL) << 4) |
        ((d(7) & 0xFF) >>> 4)
    val rho =
      if (v == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(v))
    (reg << 6) | rho
  }

  /** Column API: packed `reg*64 + rho` for a key (cast to string first,
    * matching `md5(CAST(k AS STRING))` in the SQL contract). */
  def md5Register(key: Column): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(Md5RegisterExpression(SqlBridge.expression(key.cast("string"))))
  }
}
