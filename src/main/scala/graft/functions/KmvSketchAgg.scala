package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV sketch aggregate: the k smallest DISTINCT long hash values of
  * `child`, as an ascending array — [[graft.operators.Kmv]]'s summary
  * as ONE partial-mergeable aggregate.
  *
  * Why not `distinct() + BoundedTopK`: that pays a full (group, hash)
  * distinct shuffle before the fold. The set dedups INSIDE the
  * aggregate buffer, so each map task reduces its partition to ≤ k
  * distinct values per group before the shuffle, and merges union
  * k-sets — the identical mergeability that makes the sketch
  * rollup-able across partitions/streams ([[BoundedTopK]] cannot
  * substitute: its heap keeps duplicate values, and k copies of one
  * hot user would evict the true bottom-k). Being a single aggregate
  * also makes it legal as the ONE stateful operator of a streaming
  * query — the windowed sketch twin needs no dedup→agg stateful chain.
  *
  * Buffer: a sorted long set capped at k (insert, then drop the max
  * while over k). Serialization: length-prefixed raw longs. Null
  * inputs are ignored (hash of a null key is null ⇒ absent, matching
  * the distinct-set semantics). */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 1, s"KMV needs k > 1, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def offer(buf: mutable.TreeSet[Long], v: Long): Unit = {
    if (buf.size < k) { buf += v; () }
    else if (v < buf.last && !buf.contains(v)) {
      buf -= buf.last
      buf += v
      ()
    }
  }

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    out.putInt(buf.size)
    buf.foreach(out.putLong)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += in.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = c.head)

  override def prettyName: String = "graft_kmv"
}

object KmvSketchAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: ascending array of the k smallest distinct longs. */
  def apply(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(hash), k).toAggregateExpression())
}
