package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary of size `k`: one pass over the
  * input yields a candidate set GUARANTEED to contain every item whose
  * true count exceeds n/(k+1) (n = non-null input rows), using O(k)
  * memory per task regardless of the number of distinct keys.
  *
  * Why a custom `TypedImperativeAggregate` rather than an exact
  * `groupBy(key).count`: the exact form shuffles one partial row per
  * distinct key per map task — at 100 TB with a high-cardinality key
  * (tokens, URLs, user ids) that is the dominant shuffle. This summary
  * is partial-mergeable (Agarwal et al., "Mergeable Summaries", PODS
  * 2012): each map task reduces its partition to ≤ k (item, est) pairs,
  * merges sum pointwise and re-prune to k, and the guarantee composes —
  * the merged summary's error stays ≤ n/(k+1). The caller then recounts
  * ONLY the ≤ k candidates exactly (a broadcast semi-join + a tiny
  * aggregate), so the final "items with count ≥ t" answer is exact and
  * deterministic whenever t > n/(k+1), even though the intermediate
  * candidate set may vary with partition order (any superset of the
  * true frequent items recounts to the same final answer).
  *
  * Update is the batched-decrement form: insert/increment, and when the
  * map exceeds k entries subtract the minimum count from every entry and
  * drop the zeros — each subtraction of c removes ≥ (k+1)·c count mass,
  * so the total subtracted from any single item is ≤ n/(k+1). Merge
  * subtracts the (k+1)-th largest count (the PODS-2012 prune). When the
  * number of distinct keys never exceeds k, no decrement ever fires and
  * the summary IS the exact count map (spec-asserted).
  *
  * Keys may be any `AtomicType`; `UTF8String` keys are copied on insert
  * (Parquet readers reuse buffers). Output: the candidate items sorted
  * ascending (counts are deliberately NOT exposed — MG estimates are
  * partition-order-dependent; the exact recount is the API for values).
  */
case class FrequentItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  require(k > 0, s"summary size k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StructType] ||
        child.dataType.isInstanceOf[ArrayType] ||
        child.dataType.isInstanceOf[MapType]) {
      TypeCheckResult.TypeCheckFailure(
        s"frequent-items key must be an atomic type, got ${child.dataType}")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  @transient private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  /** Subtract `c` from every count and drop entries that hit zero. */
  private def decrement(buf: mutable.HashMap[Any, Long], c: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[Any]
    buf.mapValuesInPlace { (_, v) => v - c }
    buf.foreach { case (key, v) => if (v <= 0L) dead += key }
    dead.foreach(buf.remove)
  }

  override def update(
      buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val raw = child.eval(input)
    if (raw != null) {
      val key = raw match {
        case s: UTF8String => if (buf.contains(s)) s else s.copy()
        case other => other
      }
      buf.updateWith(key) {
        case Some(v) => Some(v + 1L)
        case None => Some(1L)
      }
      if (buf.size > k) decrement(buf, buf.valuesIterator.min)
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[Any, Long], b2: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b2.foreach { case (key, v) =>
      b1.updateWith(key) {
        case Some(prev) => Some(prev + v)
        case None => Some(v)
      }
    }
    if (b1.size > k) {
      // prune to k entries: subtract the (k+1)-th largest count
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      decrement(b1, counts(counts.length - (k + 1)))
    }
    b1
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any =
    new GenericArrayData(buf.keysIterator.toArray.sorted(keyOrdering))

  @transient private lazy val keyStruct =
    StructType(Seq(StructField("key", child.dataType, nullable = false)))

  @transient private lazy val toUnsafe = UnsafeProjection.create(keyStruct)

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(buf.size)
    val row = new GenericInternalRow(1)
    buf.foreach { case (key, v) =>
      row.update(0, key)
      val u = toUnsafe(row)
      d.writeInt(u.getSizeInBytes)
      u.writeToStream(d, new Array[Byte](4096))
      d.writeLong(v)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = d.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = d.readInt()
      val arr = new Array[Byte](size)
      d.readFully(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, size)
      buf.put(row.get(0, child.dataType), d.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FrequentItems =
    copy(child = c.head)

  override def prettyName: String = "graft_frequent_items"
}

object FrequentItems {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: ascending array of ≤ k candidate items containing
    * every item with true count > n/(k+1). */
  def apply(key: Column, k: Int): Column =
    ColumnBridge.column(
      FrequentItems(ColumnBridge.expression(key), k).toAggregateExpression())
}
