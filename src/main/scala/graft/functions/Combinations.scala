package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types._

/** All C(k,3) ordered triples of a SORTED long array as one codegen'd
  * scalar expression — the basket-expansion kernel of the frequent-
  * itemset queries (q114).
  *
  * Replaces the higher-order-function formulation
  *
  * {{{ flatten(flatten(transform(sequence(0, n-3), i ->
  *       transform(sequence(i+1, n-2), j ->
  *         transform(sequence(j+1, n-1), k -> struct(...)))))) }}}
  *
  * which pays twice: janino has to compile the triply-nested lambda
  * tree (seconds of codegen on first call — the dominant COLD cost of
  * q114), and evaluation allocates a `sequence` array plus nested
  * array-of-array shells per basket before flattening. Here the same
  * triples come out of one flat three-level loop writing structs
  * directly — no intermediate arrays, trivial codegen (a single static
  * call), identical output order (lexicographic in (i,j,k), which over
  * a sorted input is lexicographic in (p1,p2,p3)).
  *
  * Null array elements are not expected (inputs come from
  * `collect_set`) and would NPE-free read as 0 via `getLong` — callers
  * own pre-filtering, as with the HOF shape. */
case class Combinations3Expression(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("p1", LongType, nullable = false),
      StructField("p2", LongType, nullable = false),
      StructField("p3", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "combinations3"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    Combinations3Expression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Combinations3Expression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Combinations3Expression =
    copy(child = newChild)
}

/** All C(k,2) ordered pairs of a SORTED long array — same flat-loop
  * kernel as [[Combinations3Expression]], used by common-neighbor
  * candidate generation (q120): a node's neighbor list expands to the
  * pairs it is a shared neighbor OF, replacing the wedge self-join with
  * a codegen'd per-row expansion (the join shuffled the full adjacency
  * twice; this streams it once). */
case class Combinations2Expression(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "combinations2"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    Combinations2Expression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Combinations2Expression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Combinations2Expression =
    copy(child = newChild)
}

object Combinations2Expression {

  /** Static helper shared by interpreted eval and generated code. */
  def compute(items: ArrayData): ArrayData = {
    val n = items.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[AnyRef])
    val v = items.toLongArray()
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var w = 0
    var i = 0
    while (i < n - 1) {
      var j = i + 1
      while (j < n) {
        val row = new GenericInternalRow(2)
        row.setLong(0, v(i)); row.setLong(1, v(j))
        out(w) = row
        w += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `combinations2(sortedLongs)` → array of (a,b) structs. */
  def combinations2(sortedLongs: Column): Column =
    SqlBridge.column(Combinations2Expression(SqlBridge.expression(sortedLongs)))
}

/** [[Combinations2Expression]] with the pair PACKED into one long —
  * `(a << 32) | b` — for graphs whose ids fit in 31 bits (callers
  * verify; LinkPredict checks min/max id and falls back to the struct
  * form past the bound). The output is a PRIMITIVE long array: no
  * per-pair row object, no boxed array slots — the struct form
  * allocates a `GenericInternalRow` per pair, which at a billion
  * wedges (q120 @ sf10) made GC and allocation the dominant
  * map-stage cost. Packing is order-preserving for non-negative ids
  * (lexicographic (a,b) == numeric packed order), so downstream
  * sorts/groupings on the packed key match the unpacked pair. */
case class Combinations2PackedExpression(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "combinations2_packed"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    Combinations2PackedExpression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Combinations2PackedExpression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Combinations2PackedExpression =
    copy(child = newChild)
}

object Combinations2PackedExpression {

  /** Static helper shared by interpreted eval and generated code. */
  def compute(items: ArrayData): ArrayData = {
    val n = items.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Long])
    val v = items.toLongArray()
    val out = new Array[Long](n * (n - 1) / 2)
    var w = 0
    var i = 0
    while (i < n - 1) {
      val hi = v(i) << 32
      var j = i + 1
      while (j < n) {
        out(w) = hi | v(j)
        w += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `combinations2Packed(sortedLongs)` → array of packed
    * `(a << 32) | b` longs. Ids must be non-negative and < 2^31. */
  def combinations2Packed(sortedLongs: Column): Column =
    SqlBridge.column(Combinations2PackedExpression(SqlBridge.expression(sortedLongs)))
}

/** Full cross product of two long arrays as (a, b) structs — the
  * new×old pair expansion of incremental dedup buckets
  * (operators/Dedup.incrementalLshCandidatePairs), same flat-loop
  * rationale as [[Combinations2Expression]]. */
case class CrossPairsExpression(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cross_pairs"
  override def foldable: Boolean = left.foldable && right.foldable

  override def nullSafeEval(l: Any, r: Any): Any =
    CrossPairsExpression.compute(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.CrossPairsExpression.compute($l, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CrossPairsExpression =
    copy(left = newLeft, right = newRight)
}

object CrossPairsExpression {

  def compute(ls: ArrayData, rs: ArrayData): ArrayData = {
    val n = ls.numElements(); val m = rs.numElements()
    if (n == 0 || m == 0) return new GenericArrayData(Array.empty[AnyRef])
    val lv = ls.toLongArray(); val rv = rs.toLongArray()
    val out = new Array[AnyRef](n * m)
    var w = 0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        val row = new GenericInternalRow(2)
        row.setLong(0, lv(i)); row.setLong(1, rv(j))
        out(w) = row
        w += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `crossPairs(as, bs)` → array of (a,b) structs. */
  def crossPairs(as: Column, bs: Column): Column =
    SqlBridge.column(CrossPairsExpression(
      SqlBridge.expression(as), SqlBridge.expression(bs)))
}

object Combinations3Expression {

  /** Static helper shared by interpreted eval and generated code. */
  def compute(items: ArrayData): ArrayData = {
    val n = items.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[AnyRef])
    val v = items.toLongArray()
    val out = new Array[AnyRef](n * (n - 1) * (n - 2) / 6)
    var w = 0
    var i = 0
    while (i < n - 2) {
      var j = i + 1
      while (j < n - 1) {
        var k = j + 1
        while (k < n) {
          val row = new GenericInternalRow(3)
          row.setLong(0, v(i)); row.setLong(1, v(j)); row.setLong(2, v(k))
          out(w) = row
          w += 1
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `combinations3(sortedLongs)` → array of (p1,p2,p3)
    * structs. */
  def combinations3(sortedLongs: Column): Column =
    SqlBridge.column(Combinations3Expression(SqlBridge.expression(sortedLongs)))
}
