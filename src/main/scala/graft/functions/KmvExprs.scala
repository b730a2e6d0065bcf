package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002 /
  * Beyer et al. 2007, the "theta sketch" family's core. Keep the k
  * smallest DISTINCT hash values of a set; the k-th smallest, read as a
  * fraction of the hash space, estimates the distinct count as (k−1)/frac.
  *
  * Why carry this next to HLL (B11/B59): HLL registers support UNION
  * only. A KMV sketch is a uniform SAMPLE of the distinct elements, so
  * two sketches compose under intersection and difference too — "users
  * in A but not B" at sketch cost — which audience arithmetic needs and
  * HLL fundamentally cannot answer. The price is k·8 bytes vs HLL's
  * 2 KiB for comparable error (1/√k).
  *
  * Representation: hash values are stored SIGN-FLIPPED (h ⊕ 2⁶³), so the
  * natural signed ascending order of the output array equals unsigned
  * ascending order of the raw hashes. Every downstream set operation is
  * then plain `array_sort`/`array_union`/`array_intersect`/`slice` on
  * bigint arrays — built-in, codegen'd, no custom scalar expressions —
  * and the estimate reads the k-th element as (f + 2⁶³ + 1)/2⁶⁴.
  *
  * Determinism: the sketch content is a pure function of the input SET
  * (the k unsigned-smallest distinct hashes — no insertion-order or
  * partitioning dependence), so merge is associative/commutative and
  * replays are bit-identical. When the set has < k distinct hashes the
  * sketch IS the set and every estimate is exact — the exact-regime gate
  * the q222 oracle checks (the q171/q75 sketch-oracle discipline).
  */
object KmvExprs {
  /** kmv_agg(hash, k): signed-ascending array of the k unsigned-smallest
    * distinct (sign-flipped) hash values. */
  def kmvAgg(hash: Column, k: Int): Column =
    GraftSql.column(MinKHashAgg(GraftSql.expression(hash), k).toAggregateExpression())
}

/** Bounded k-minimum-values state: a TreeSet of sign-flipped hashes capped
  * at k entries (drop-largest). Update O(log k), merge O(|b2| log k),
  * state ≤ k longs regardless of input size. */
case class MinKHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k > 1, s"kmv k must be > 1: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_agg"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], flipped: Long): Unit = {
    if (buf.size < k) { buf.add(flipped); () }
    else if (flipped < buf.last()) {
      buf.add(flipped)
      if (buf.size > k) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long] ^ Long.MinValue)
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // ascending — TreeSet iterates in order
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size).order(ByteOrder.LITTLE_ENDIAN)
    val lb = bb.asLongBuffer()
    val it = buf.iterator()
    while (it.hasNext) lb.put(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val lb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer()
    while (lb.hasRemaining) buf.add(lb.get())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKHashAgg =
    copy(child = newChild)
}
