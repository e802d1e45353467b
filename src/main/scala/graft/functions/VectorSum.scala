package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Elementwise sum of long arrays as ONE aggregate — the centroid/
  * mean-vector kernel (IntCluster, q95/q98).
  *
  * Replaces the `posexplode → groupBy (group, dim) → re-gather`
  * formulation, which shuffles rows × dims exploded rows (6.4M for 50k
  * × 128-dim vectors) just to add numbers that live next to each other
  * in one array. Here each partition folds its vectors into a single
  * running array per group (map-side partials in
  * ObjectHashAggregateExec, like `collect_list`), so the exchange
  * carries one array per (partition, group) — groups × dims values
  * total, corpus-size-independent.
  *
  * Arithmetic is exact 64-bit addition, bit-identical to the exploded
  * sum in any grouping/merge order. Null arrays are skipped (SQL
  * aggregate convention); all non-null inputs in a group must share one
  * length — a mismatch throws rather than silently zero-pads, because a
  * ragged "vector" column is an upstream bug. */
case class VectorSumLongs(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorSumLongs.Buffer]
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vector_sum_longs"

  override def createAggregationBuffer(): VectorSumLongs.Buffer =
    new VectorSumLongs.Buffer

  override def update(
      b: VectorSumLongs.Buffer, input: InternalRow): VectorSumLongs.Buffer = {
    val v = child.eval(input)
    if (v != null)
      b.add(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray())
    b
  }

  override def merge(
      b: VectorSumLongs.Buffer, other: VectorSumLongs.Buffer): VectorSumLongs.Buffer = {
    if (other.sums != null) b.add(other.sums)
    b
  }

  override def eval(b: VectorSumLongs.Buffer): Any =
    if (b.sums == null) null else new GenericArrayData(b.sums)

  override def serialize(b: VectorSumLongs.Buffer): Array[Byte] = {
    val n = if (b.sums == null) -1 else b.sums.length
    val bb = ByteBuffer.allocate(4 + 8 * math.max(n, 0))
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(b.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSumLongs.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new VectorSumLongs.Buffer
    val n = bb.getInt
    if (n >= 0) {
      val arr = new Array[Long](n)
      var i = 0
      while (i < n) { arr(i) = bb.getLong; i += 1 }
      b.add(arr)
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumLongs =
    copy(child = newChildren.head)
}

object VectorSumLongs {

  final class Buffer {
    var sums: Array[Long] = _
    def add(v: Array[Long]): Unit =
      if (sums == null) sums = v.clone()
      else {
        require(v.length == sums.length,
          s"vector_sum_longs: ragged input (${v.length} vs ${sums.length})")
        var i = 0
        while (i < v.length) { sums(i) += v(i); i += 1 }
      }
  }

  /** Column API: elementwise long sum of an array column (ints widen). */
  def vectorSum(arr: Column): Column =
    SqlBridge.column(VectorSumLongs(SqlBridge.expression(arr))
      .toAggregateExpression())
}
