package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a hard per-group element cap, enforced in the PARTIAL
  * aggregation buffers — the skew-proof building block for inverted-index
  * candidate generation.
  *
  * A hot key (a stop-word shingle shared by half the corpus) never
  * materializes more than `limit` elements anywhere: each map-side partial
  * buffer stops growing at `limit`, merges cap at `limit`, so the biggest
  * buffer that ever crosses the shuffle is `limit` elements regardless of
  * how many rows the key has. Callers that only want groups with at most K
  * members pass `limit = K + 1` and drop groups whose result has K + 1
  * elements: a full-length list (df <= K) is exact, an overflowed one is a
  * sentinel. Contrast with `collect_list` + post-filter, which funnels every
  * row of the hot key through one reducer before discarding it.
  *
  * Which elements survive in an overflowed (dropped anyway) group is
  * partition-order-dependent — irrelevant, callers discard those groups.
  */
case class BoundedCollect(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(limit > 0, s"bounded_collect limit must be positive, got $limit")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect"

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    if (buf.size < limit) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Any], b2: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    var i = 0
    while (b1.size < limit && i < b2.size) {
      b1 += b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: ArrayBuffer[Any]): Any = new GenericArrayData(buf.toArray)

  // partial buffers cross the shuffle as bytes: pack the element list into a
  // single-column UnsafeRow (the same scheme Spark's own Collect uses)
  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: ArrayBuffer[Any]): Array[Byte] =
    bufProjection.apply(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = ArrayBuffer.empty[Any]
    arr.foreach(child.dataType, (_, v) => buf += InternalRow.copyValue(v))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollect =
    copy(child = newChild)
}

object BoundedCollect {
  def of(c: Column, limit: Int): Column =
    GraftSql.column(
      BoundedCollect(GraftSql.expression(c), limit).toAggregateExpression())
}
