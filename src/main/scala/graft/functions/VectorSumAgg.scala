package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Elementwise sum of `array<double>` vectors — the aggregation kernel of
  * the distributed k-means update step (AnnIvf.trainCentroids).
  *
  * The alternative formulation, `array(sum(element_at(v, 1)), …,
  * sum(element_at(v, dim)))`, builds `dim` separate aggregate expressions:
  * at dim ≥ 256 the generated code blows past the JIT method-size ceiling
  * and the projection falls out of whole-stage codegen. Here the state is
  * ONE fixed-size `Array[Double]` per group, updated in a tight primitive
  * loop, and map-side partials mean each shuffle carries exactly one
  * dim-length vector per (task, group) — at k=10⁵ cells × dim=10³ the
  * per-task shuffle payload is k·dim·8 B regardless of corpus size.
  *
  * Null and empty input arrays are ignored (like built-in `sum` skips
  * nulls); mixed lengths within a group are a caller error and raise.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // a group with no non-null input
  override def prettyName: String = "vector_sum"

  /** Zero-length = "no input seen yet" sentinel: the real dim is fixed by
    * the first vector the buffer absorbs. */
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def absorb(buf: Array[Double], v: ArrayData): Array[Double] = {
    val n = v.numElements()
    if (n == 0) return buf
    if (buf.length == 0) return v.toDoubleArray()
    require(buf.length == n,
      s"vector_sum over mixed dimensions: ${buf.length} vs $n")
    var i = 0
    while (i < n) { buf(i) += v.getDouble(i); i += 1 }
    buf
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf else absorb(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b2.length == 0) b1
    else if (b1.length == 0) b2
    else {
      require(b1.length == b2.length,
        s"vector_sum over mixed dimensions: ${b1.length} vs ${b2.length}")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

object VectorSumAgg {
  /** vector_sum(v): elementwise sum of array<double> over the group. */
  def of(c: Column): Column =
    GraftSql.column(VectorSumAgg(GraftSql.expression(c)).toAggregateExpression())
}
