package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch aggregate: a fixed `cells`-long counter array where
  * each input row increments the d cells named by its pre-hashed flat
  * positions (`child` = array of j·w + bucket_j indexes, computed in the
  * projection with the engine/oracle-shared md5→60-bit hash so the
  * sketch contents are DETERMINISTIC and DuckDB-mirrorable — the
  * [[KmvSketchAgg]] discipline applied to frequencies instead of
  * distincts).
  *
  * Counter merges are elementwise adds, so the aggregate is exactly
  * partial-mergeable: map tasks fold their partitions to ONE array per
  * group before the shuffle (the whole point — the shuffle carries
  * d·w longs per group, never rows), sketches of disjoint corpora sum
  * to the corpus sketch (rollup law, spec-pinned), and the same
  * aggregate is legal as a streaming query's single stateful operator.
  * Point estimates come later as min over the d cells of a key — always
  * ≥ the true count, over by at most εn with probability 1−δ for
  * (d, w) = (⌈ln 1/δ⌉, ⌈e/ε⌉).
  *
  * Null/empty position arrays (a null key hashes to null) are ignored,
  * matching a COUNT over non-null keys. */
case class CmsSketchAgg(
    child: Expression,
    cells: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(cells > 0 && cells <= (1 << 24),
    s"CMS cell count out of range: $cells")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        // defensive: a null element would read as position 0 — skip it
        if (!arr.isNullAt(i)) {
          val pos = arr.getLong(i)
          require(pos >= 0 && pos < cells,
            s"CMS position $pos outside [0, $cells) — hash/width mismatch")
          buf(pos.toInt) += 1L
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 * cells)
    buf.foreach(out.putLong)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(cells)(in.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_cms"
}

object CmsSketchAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: the d·w flat counter array. */
  def apply(positions: Column, cells: Int): Column =
    ColumnBridge.column(
      CmsSketchAgg(ColumnBridge.expression(positions), cells)
        .toAggregateExpression())
}
