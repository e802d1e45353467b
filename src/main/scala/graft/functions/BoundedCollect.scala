package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Collect-with-a-ceiling: gathers up to `maxItems` longs per group and
  * returns NULL for any group that exceeds the cap.
  *
  * The point is the memory bound: `collect_list(...)` + a size filter
  * buffers the WHOLE group before the filter sees it — one pathological
  * key (an LSH mega-bucket, a bot user's million events) OOMs its
  * reducer. This aggregate's buffer physically cannot exceed
  * `maxItems + 1` elements in the partial AND final phases (update and
  * merge both stop storing at the cap and just mark overflow), so the
  * worst key costs the same as a full one. Groups that overflow come
  * back as NULL — "this group was too big to gather" is a first-class
  * answer the caller filters or routes, not an executor death.
  *
  * A `TypedImperativeAggregate` like Spark's own `collect_list` /
  * `percentile`: runs in ObjectHashAggregateExec with map-side partials. */
case class BoundedCollectLongs(
    child: Expression,
    maxItems: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedCollectLongs.Buffer]
    with ImplicitCastInputTypes {

  require(maxItems >= 1, s"maxItems must be >= 1, got $maxItems")

  // analysis-time coercion/rejection of the input type — without this a
  // non-Long child passes analysis and ClassCastExceptions on executors
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_collect_longs"

  override def createAggregationBuffer(): BoundedCollectLongs.Buffer =
    new BoundedCollectLongs.Buffer(maxItems)

  override def update(
      b: BoundedCollectLongs.Buffer, input: InternalRow): BoundedCollectLongs.Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(
      b: BoundedCollectLongs.Buffer,
      other: BoundedCollectLongs.Buffer): BoundedCollectLongs.Buffer = {
    b.mergeIn(other)
    b
  }

  override def eval(b: BoundedCollectLongs.Buffer): Any =
    if (b.overflowed) null
    else new GenericArrayData(java.util.Arrays.copyOf(b.items, b.size))

  override def serialize(b: BoundedCollectLongs.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(1 + 4 + 8 * b.size)
    bb.put(if (b.overflowed) 1.toByte else 0.toByte)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.items(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectLongs.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new BoundedCollectLongs.Buffer(maxItems)
    val overflowed = bb.get() == 1
    val n = bb.getInt
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    if (overflowed) b.markOverflow()
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectLongs =
    copy(child = newChildren.head)
}

object BoundedCollectLongs {

  /** Mutable bounded buffer: at most `cap` stored longs + overflow flag. */
  final class Buffer(cap: Int) {
    var items: Array[Long] = new Array[Long](math.min(cap, 16))
    var size: Int = 0
    var overflowed: Boolean = false

    def markOverflow(): Unit = { overflowed = true; size = 0 }

    def add(v: Long): Unit =
      if (!overflowed) {
        if (size >= cap) markOverflow()
        else {
          if (size == items.length)
            items = java.util.Arrays.copyOf(items, math.min(cap, items.length * 2))
          items(size) = v
          size += 1
        }
      }

    def mergeIn(other: Buffer): Unit =
      if (other.overflowed) markOverflow()
      else {
        var i = 0
        while (i < other.size && !overflowed) { add(other.items(i)); i += 1 }
      }
  }

  /** Column API: `boundedCollectLongs(c, max)` — NULL when the group
    * exceeds `max` elements. */
  def boundedCollectLongs(c: Column, maxItems: Int): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(BoundedCollectLongs(SqlBridge.expression(c), maxItems)
      .toAggregateExpression())
  }
}
