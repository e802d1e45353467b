package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-entity gapped-subsequence pattern extraction (the q125 kernel):
  * given one entity's per-type summaries
  *
  * {{{ array<struct<ty: string, first: ts, maxt: ts, tss: array<ts>>> }}}
  *
  * (first/max occurrence time and the sorted occurrence list of each
  * event type the entity exhibits), emit every (e1, e2, e3) type triple
  * the entity supports under the greedy witness rule: t1 = first[e1];
  * t2 = earliest e2 occurrence strictly after t1 (binary search in
  * tss[e2]); supported iff any e3 occurrence after t2, i.e.
  * maxt[e3] > t2. Greedy is exact for subsequence EXISTENCE — an
  * earlier intermediate occurrence can only widen the remaining window.
  *
  * This turns support counting into ONE entity-keyed aggregation plus a
  * per-entity O(T²·log n + T³) in-row computation (T = event types the
  * entity exhibits, n = its events) — replacing the three entity-keyed
  * join/aggregate hops whose T²-fanout intermediate (entities × events
  * × patterns rows) dominated the old plan's runtime. T³ is inherent to
  * the problem (it bounds the OUTPUT patterns per entity); corpora with
  * large type vocabularies prune to frequent types before calling, as
  * any PrefixSpan-family implementation does.
  *
  * Timestamps are compared as their physical long (microsecond) values —
  * order-isomorphic to the engine's timestamp comparison, zero
  * arithmetic, bit-exact cross-engine. */
case class SequentialPatternsExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 4 &&
        s(0).dataType == StringType &&
        Seq(1, 2).forall(i =>
          s(i).dataType == TimestampType || s(i).dataType == LongType) &&
        (s(3).dataType match {
          case ArrayType(TimestampType | LongType, _) => true
          case _ => false
        }) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"seq_patterns expects array<struct<ty string, first ts, maxt ts, " +
        s"tss array<ts>>>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("e1", StringType, nullable = false),
      StructField("e2", StringType, nullable = false),
      StructField("e3", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "seq_patterns"

  override def nullSafeEval(input: Any): Any =
    SequentialPatternsExpression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SequentialPatternsExpression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SequentialPatternsExpression =
    copy(child = newChild)
}

object SequentialPatternsExpression {

  /** Static helper shared by interpreted eval and generated code. */
  def compute(summaries: ArrayData): ArrayData = {
    val t = summaries.numElements()
    if (t == 0) return new GenericArrayData(Array.empty[AnyRef])
    val tys = new Array[UTF8String](t)
    val firsts = new Array[Long](t)
    val maxts = new Array[Long](t)
    val tss = new Array[Array[Long]](t)
    var i = 0
    while (i < t) {
      val row = summaries.getStruct(i, 4)
      tys(i) = row.getUTF8String(0)
      firsts(i) = row.getLong(1)
      maxts(i) = row.getLong(2)
      tss(i) = row.getArray(3).toLongArray()
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](t * t * t)
    i = 0
    while (i < t) {
      val t1 = firsts(i)
      var j = 0
      while (j < t) {
        // earliest occurrence of type j strictly after t1
        val arr = tss(j)
        var lo = 0
        var hi = arr.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (arr(mid) > t1) hi = mid else lo = mid + 1
        }
        if (lo < arr.length) {
          val t2 = arr(lo)
          var k = 0
          while (k < t) {
            if (maxts(k) > t2) {
              val row = new GenericInternalRow(3)
              row.update(0, tys(i)); row.update(1, tys(j)); row.update(2, tys(k))
              out += row
            }
            k += 1
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: `seq_patterns(perTypeSummaries)`. */
  def seqPatterns(summaries: Column): Column =
    SqlBridge.column(SequentialPatternsExpression(SqlBridge.expression(summaries)))
}
