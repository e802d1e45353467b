package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All of a document's Gopher repetition statistics in ONE map-side pass
  * over its token array — the zero-shuffle core of operators/Repetition.
  *
  * The relational formulation (explode grams → groupBy (doc, gram) →
  * re-aggregate to doc) routes strictly PER-DOCUMENT state through the
  * engine's shuffle machinery: every metric here is a function of one
  * row's tokens, no cross-document state exists, so the scale-correct
  * shape is a scalar expression — embarrassingly parallel at any corpus
  * size, zero exchanges, and the whole q140 plan collapses to
  * scan→project(→sort for the oracle's ordering). Measured at sf0.1 the
  * exploded plan paid two ~2.8 s gram-aggregation stages; this pass does
  * the same work inside one projection.
  *
  * Semantics are EXACTLY the relational/oracle contract
  * (QueriesText.repetitionCtesSql):
  *  - gram windows follow the shingleArray short-doc contract — a doc
  *    with fewer than n tokens yields ONE gram joining all tokens;
  *  - top bigram = highest count, ties to the lexicographically (UTF8
  *    byte order = DuckDB collation on this normalized corpus) smallest
  *    gram;
  *  - dup5_chars = Σ count·length(gram) over 5-grams with count > 1
  *    (character length, no overlap merge).
  *
  * Returns struct(n_words, n_distinct, top_bigram, top_bigram_count,
  * dup5_chars); null-propagates on a null token array (callers guard —
  * Repetition filters empty/null text before this projection).
  */
case class RepetitionStatsExpression(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = RepetitionStatsExpression.Schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsExpression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RepetitionStatsExpression.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStatsExpression =
    copy(child = newChild)
}

object RepetitionStatsExpression {
  private val Space = UTF8String.fromString(" ")

  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram", StringType, nullable = false),
    StructField("top_bigram_count", LongType, nullable = false),
    StructField("dup5_chars", LongType, nullable = false)))

  /** Column API over an already-split token array. */
  def stats(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(RepetitionStatsExpression(SqlBridge.expression(tokens)))
  }

  /** Static helper shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): InternalRow = {
    val t = tokens.numElements()
    val toks = new Array[UTF8String](t)
    var i = 0
    while (i < t) { toks(i) = tokens.getUTF8String(i); i += 1 }

    val distinct = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < t) { distinct.add(toks(i)); i += 1 }

    // gram windows under the shingleArray short-doc contract
    def grams(n: Int): Array[UTF8String] =
      if (t >= n) {
        val out = new Array[UTF8String](t - n + 1)
        var w = 0
        while (w < out.length) {
          val slice = new Array[UTF8String](n)
          var j = 0
          while (j < n) { slice(j) = toks(w + j); j += 1 }
          out(w) = UTF8String.concatWs(Space, slice: _*)
          w += 1
        }
        out
      } else Array(UTF8String.concatWs(Space, toks: _*))

    def counts(gs: Array[UTF8String]): java.util.HashMap[UTF8String, Long] = {
      val m = new java.util.HashMap[UTF8String, Long](gs.length * 2)
      var k = 0
      while (k < gs.length) {
        val g = gs(k)
        m.put(g, m.getOrDefault(g, 0L) + 1L)
        k += 1
      }
      m
    }

    // top bigram: max count, ties to the smallest gram (UTF8 byte order)
    var bestG: UTF8String = null
    var bestC = 0L
    counts(grams(2)).forEach { (g, c) =>
      if (c > bestC || (c == bestC && g.compareTo(bestG) < 0)) {
        bestC = c; bestG = g
      }
    }

    // duplicated-5-gram character coverage
    var dup5 = 0L
    counts(grams(5)).forEach { (g, c) =>
      if (c > 1) dup5 += c * g.numChars()
    }

    new GenericInternalRow(Array[Any](
      t.toLong, distinct.size.toLong, bestG, bestC, dup5))
  }
}
