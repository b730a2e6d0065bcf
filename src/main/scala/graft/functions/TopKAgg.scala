package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** k-capped ordered MULTISET buffer: a count per distinct struct plus the
  * tracked total, so duplicate input structs survive up to k (a plain
  * TreeSet silently collapses equal structs and can return fewer than k). */
final class TopKBuffer(
    val counts: java.util.TreeMap[InternalRow, Long],
    var total: Int)

/** Top-k elements per group by a total order, with k-bounded state
  * everywhere — the scale-safe twin of `rank() OVER (PARTITION BY g ORDER
  * BY ...) <= k`.
  *
  * The window formulation shuffles EVERY row to its group's reducer and
  * sorts the whole group before discarding all but k rows. Here each
  * map-side partial keeps a k-capped ordered buffer, so the shuffle carries
  * at most k elements per (task, group) and no reducer ever sorts a full
  * group — on a skewed 100 TB group-by that is the difference between a
  * bounded merge and a hot-reducer sort spill.
  *
  * Input must be a struct whose FIRST fields define the ranking (descending
  * lexicographic over the struct's ordering); ties break by the remaining
  * fields. Equal struct values are kept as a multiset (each instance counts
  * toward k), matching the rank()<=k row semantics exactly. The result is
  * the top-k structs, largest first.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer]
    with UnaryLike[Expression] {

  require(k > 0, s"top_k k must be positive, got $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  // total order over the struct's fields, descending priority left-to-right
  @transient private lazy val ordering =
    org.apache.spark.sql.catalyst.expressions.RowOrdering
      .createNaturalAscendingOrdering(structType.fields.map(_.dataType).toSeq)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(new java.util.TreeMap[InternalRow, Long](ordering), 0)

  /** Adds one instance of `row` (must already be safe to retain). */
  private def add(buf: TopKBuffer, row: InternalRow): Unit = {
    val m = buf.counts
    if (buf.total < k) {
      m.merge(row, 1L, (a, b) => a + b)
      buf.total += 1
    } else {
      val first = m.firstEntry() // smallest kept value
      if (ordering.compare(row, first.getKey) > 0) {
        m.merge(row, 1L, (a, b) => a + b)
        // evict one INSTANCE of the smallest — total stays at k
        if (first.getValue == 1L) m.remove(first.getKey)
        else m.put(first.getKey, first.getValue - 1L)
      }
    }
  }

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    val it = b2.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue
      while (c > 0) { add(b1, e.getKey); c -= 1 }
    }
    b1
  }

  /** Buffer expanded to an array of structs, largest first, duplicates
    * repeated by count — the result value AND the serialization payload. */
  private def expand(buf: TopKBuffer): Array[Any] = {
    val out = new Array[Any](buf.total)
    var i = 0
    val it = buf.counts.descendingMap().entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue
      while (c > 0) { out(i) = e.getKey; i += 1; c -= 1 }
    }
    out
  }

  override def eval(buf: TopKBuffer): Any = new GenericArrayData(expand(buf))

  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: TopKBuffer): Array[Byte] =
    bufProjection.apply(InternalRow(new GenericArrayData(expand(buf)))).getBytes

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    val n = arr.numElements()
    val width = structType.length
    var i = 0
    while (i < n) {
      add(buf, arr.getStruct(i, width).copy())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}

object TopKAgg {
  /** top_k(struct(...), k): top-k structs by descending struct order. */
  def of(c: Column, k: Int): Column =
    GraftSql.column(TopKAgg(GraftSql.expression(c), k).toAggregateExpression())
}
