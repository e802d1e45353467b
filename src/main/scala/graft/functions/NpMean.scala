package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Bit-exact replay of `np.mean(values)` over a buffered value array —
  * the reference's avg contract (calcular_kpi.py:36-37), completing the
  * [[NpPercentile]] story for the OTHER aggregate the reference computes
  * from its per-group `elapsed` lists.
  *
  * Why the exact-decimal mean is NOT enough (round-13 parity catch): the
  * engine's portable tier computes the mean from an exact DECIMAL sum —
  * the correctly-rounded true mean. numpy's mean is `add.reduce / n`,
  * and `add.reduce` is PAIRWISE SUMMATION run per 8192-element nditer
  * buffer block, accumulated linearly across blocks — usually within an
  * ulp of the true sum but not equal to it. When the group's true mean
  * lands exactly on a 2-decimal midpoint (observed live: 64 values whose
  * exact mean is 373.045; np's pairwise sum reads 373.04499999999996),
  * `py_round` flips the printed cent and the cell-for-cell parity gate
  * fails. Reference-faithful outputs must therefore sum exactly as
  * numpy does. (The cross-engine oracle tier keeps the exact-decimal
  * formulation — DuckDB replays that, and hash-portability is its
  * contract; faithfulness to numpy's accumulation error is THIS tier's.)
  *
  * The replayed algorithm (numpy 1.26 `pairwise_sum_DOUBLE`,
  * umath/loops.c.src, + the nditer buffering):
  *  - n < 8: naive left fold from 0.0;
  *  - n ≤ 128: 8 running accumulators seeded from the first 8 values,
  *    unrolled adds, tree-combined `((r0+r1)+(r2+r3))+((r4+r5)+(r6+r7))`,
  *    scalar tail;
  *  - n > 128: split n2 = n/2 rounded down to a multiple of 8, recurse;
  *  - above 8192 values (NPY_BUFSIZE): per-8192-block pairwise sums
  *    accumulated LINEARLY (verified against np.sum across 1..100k).
  *
  * Mean = blockSum / n in one double division; empty buffer → 0.0
  * (the reference's empty-group guard). Buffer ORDER matters — numpy
  * sums the group's values in insertion order, so feed this an UNSORTED
  * `collect_list` from the same scan order the reference reads
  * (single-partition in the CLI pipeline, like the reference's single
  * sequential pass). */
case class NpMeanExpression(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "np_mean"

  override def nullSafeEval(input: Any): Any =
    NpMeanExpression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NpMeanExpression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NpMeanExpression =
    copy(child = newChild)
}

object NpMeanExpression {
  private val PwBlocksize = 128
  private val BufSize = 8192 // NPY_BUFSIZE: nditer buffer block length

  /** numpy pairwise_sum_DOUBLE over a[off until off+n). */
  private def pairwiseSum(a: Array[Double], off: Int, n: Int): Double =
    if (n < 8) {
      var res = 0.0
      var i = 0
      while (i < n) { res += a(off + i); i += 1 }
      res
    } else if (n <= PwBlocksize) {
      val r = new Array[Double](8)
      var k = 0
      while (k < 8) { r(k) = a(off + k); k += 1 }
      val lim = n - (n % 8)
      var i = 8
      while (i < lim) {
        var j = 0
        while (j < 8) { r(j) += a(off + i + j); j += 1 }
        i += 8
      }
      var res = ((r(0) + r(1)) + (r(2) + r(3))) + ((r(4) + r(5)) + (r(6) + r(7)))
      while (i < n) { res += a(off + i); i += 1 }
      res
    } else {
      var n2 = n / 2
      n2 -= n2 % 8
      pairwiseSum(a, off, n2) + pairwiseSum(a, off + n2, n - n2)
    }

  /** Static helper shared by interpreted eval and generated code. */
  def compute(values: ArrayData): Double = {
    val n = values.numElements()
    if (n == 0) return 0.0
    val a = values.toDoubleArray()
    var res = 0.0
    var off = 0
    while (off < n) {
      val m = math.min(BufSize, n - off)
      res += pairwiseSum(a, off, m)
      off += m
    }
    res / n
  }

  /** Column API: `np_mean(values)` over a collect_list buffer. */
  def npMean(values: Column): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(NpMeanExpression(SqlBridge.expression(values)))
  }
}
