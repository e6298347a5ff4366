package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k aggregate: keeps the k smallest values of `child` (a
  * struct whose field order defines the sort) in a size-k heap, returning
  * them as an ascending array.
  *
  * Why a custom `TypedImperativeAggregate` rather than the
  * `row_number() <= k` window: the window formulation must shuffle and
  * sort *every* input row; this aggregate is partial-mergeable, so each
  * map task reduces its partition to ≤ k rows per group before the
  * shuffle, and merges combine k-heaps. At 100 TB, top-3-per-customer via
  * window moves the whole fact table; via this aggregate it moves
  * ≤ 3·partitions rows per customer. Callers encode direction in the
  * struct (e.g. negate a double for descending) and put tie-break keys
  * next; payload fields after a total key never affect the order.
  *
  * Buffer is a max-heap (head = worst retained row); serialization is
  * length-prefixed UnsafeRow bytes. */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, s"k must be positive, got $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  // Codegen'd comparator, not TypeUtils.getInterpretedOrdering: update()
  // runs once per INPUT row (the whole point of the map-side partial is
  // that inputs vastly outnumber retained rows), and the interpreted
  // ordering boxes every field of both rows per comparison — measured as
  // the dominant term of recommend_topk_bounded's 132 cpu-s aggregate
  // stage (r14 profile). Identical SQL struct ordering semantics, just
  // compiled.
  @transient private lazy val ordering: Ordering[InternalRow] =
    new org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering(
      structType.fields.zipWithIndex.map { case (f, i) =>
        org.apache.spark.sql.catalyst.expressions.SortOrder(
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            i, f.dataType, f.nullable),
          org.apache.spark.sql.catalyst.expressions.Ascending)
      }.toIndexedSeq)

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(ordering) // max-heap: head = largest

  private def offer(buf: mutable.PriorityQueue[InternalRow], row: InternalRow): Unit = {
    if (buf.size < k) {
      buf.enqueue(row)
    } else if (ordering.lt(row, buf.head)) {
      buf.dequeue()
      buf.enqueue(row)
    }
  }

  override def update(
      buf: mutable.PriorityQueue[InternalRow], input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // compare BEFORE copying: once the heap is full, the steady state
      // is one comparison and a rejection — copying every input row
      // first (the old form) allocated per ROW instead of per RETAINED
      // row, and at ≤ k survivors per group that is almost every
      // allocation wasted (r14 profile: the copy+interpreted-compare
      // pair put this aggregate at ~17 µs/input row)
      if (buf.size < k) {
        buf.enqueue(row.copy())
      } else if (ordering.lt(row, buf.head)) {
        buf.dequeue()
        buf.enqueue(row.copy())
      }
    }
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[InternalRow],
      b2: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering).asInstanceOf[Array[Any]])

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buf.toArray
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(rows.length)
    rows.foreach { r =>
      val u = toUnsafe(r)
      d.writeInt(u.getSizeInBytes)
      u.writeToStream(d, new Array[Byte](4096))
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = d.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = d.readInt()
      val arr = new Array[Byte](size)
      d.readFully(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, size)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BoundedTopK =
    copy(child = c.head)

  override def prettyName: String = "graft_topk"
}

object BoundedTopK {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: ascending array of the k smallest structs. */
  def apply(sortStruct: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopK(ColumnBridge.expression(sortStruct), k).toAggregateExpression())
}
