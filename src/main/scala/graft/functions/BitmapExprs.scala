package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Fixed-width bitset ("bitmap") kernels — the exact-distinct-set algebra
  * OLAP engines (Druid, ClickHouse `groupBitmap`, Kylin) build audience /
  * segment analytics on: represent "the set of user ids in segment s" as
  * bit positions, then EVERY set operation (distinct count, overlap,
  * rolling-window union) is word-wise AND/OR + popcount on fixed-size
  * state instead of a shuffle of the raw id stream.
  *
  * Layout discipline (graft.operators.Bitmaps): ids are block-decomposed
  * as (block = id div numBits, offset = id mod numBits), so one bitmap
  * covers one block and the frame holds (group, block) → bitmap rows.
  * That keeps each aggregation buffer at numBits/8 bytes REGARDLESS of the
  * id domain (a flat bitmap over a 2⁶⁴ id space is impossible; the block
  * grid is how production bitmap indexes shard), makes the state
  * trivially mergeable (word-wise OR — the same bitwise merge law as
  * B103's histogram state), and lets set ops meet on a (block) equi-join
  * where both sides are already bitmap-compressed.
  *
  * The scalar popcount/AND/OR expressions run on block-DOMAIN rows
  * (groups × occupied blocks), never on the raw event stream, so
  * CodegenFallback costs nothing measurable there — the corpus-sized work
  * is the one map-side-combined [[BitmapOrAgg]] pass.
  */
object BitmapExprs {
  /** bitmap_or_agg(offset): bitset of the group's observed offsets. */
  def bitmapAgg(offset: Column, numBits: Int): Column =
    GraftSql.column(
      BitmapOrAgg(GraftSql.expression(offset), numBits).toAggregateExpression())

  /** bitmap_merge_agg(bits): word-wise OR of pre-built equal-width bitmaps. */
  def bitmapMergeAgg(bits: Column): Column =
    GraftSql.column(
      BitmapOrMergeAgg(GraftSql.expression(bits)).toAggregateExpression())

  /** Number of set bits. */
  def bitCount(bits: Column): Column =
    GraftSql.column(BitmapBitCount(GraftSql.expression(bits)))

  /** |A ∩ B| — popcount of the word-wise AND. */
  def andCount(a: Column, b: Column): Column =
    GraftSql.column(BitmapAndCount(GraftSql.expression(a), GraftSql.expression(b)))

  private[functions] def words(bytes: Array[Byte]): Array[Long] = {
    // bitmap_merge_agg is SQL-registered, so arbitrary binaries can reach
    // here: reject misaligned input instead of silently dropping tail bits
    require(bytes.length % 8 == 0,
      s"bitmap binary length ${bytes.length} is not a multiple of 8")
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  private[functions] def bytes(words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    bb.array()
  }
}

/** Bitset over in-block offsets: update sets bit `offset`, merge is
  * word-wise OR, result is BINARY (little-endian words, numBits/8 bytes).
  * An offset outside [0, numBits) is a caller error (the block
  * decomposition guarantees the range) and raises rather than silently
  * corrupting a neighboring block's count. */
case class BitmapOrAgg(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64: $numBits")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_or_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val o = v.asInstanceOf[Long]
      require(o >= 0 && o < numBits, s"bitmap offset $o outside [0, $numBits)")
      buf((o >>> 6).toInt) |= (1L << (o & 63))
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = BitmapExprs.bytes(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = BitmapExprs.bytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BitmapExprs.words(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapOrAgg =
    copy(child = newChild)
}

/** Word-wise OR of already-built equal-width bitmaps — the re-aggregation
  * step (rolling windows, coarser groupings) over [[BitmapOrAgg]] output.
  * Zero-length buffer = "none seen" sentinel; the width is fixed by the
  * first absorbed bitmap and a mismatch raises (mixed widths would
  * silently misalign blocks). */
case class BitmapOrMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // a group with no non-null input
  override def prettyName: String = "bitmap_merge_agg"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def absorb(buf: Array[Long], v: Array[Long]): Array[Long] =
    if (v.length == 0) buf
    else if (buf.length == 0) v.clone()
    else {
      require(buf.length == v.length,
        s"bitmap_merge_agg over mixed widths: ${buf.length} vs ${v.length}")
      var i = 0
      while (i < v.length) { buf(i) |= v(i); i += 1 }
      buf
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else absorb(buf, BitmapExprs.words(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = absorb(b1, b2)

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else BitmapExprs.bytes(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = BitmapExprs.bytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BitmapExprs.words(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOrMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOrMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapOrMergeAgg =
    copy(child = newChild)
}

/** popcount of a bitmap. */
case class BitmapBitCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_bit_count"

  override def nullSafeEval(bits: Any): Any = {
    val bytes = bits.asInstanceOf[Array[Byte]]
    var n = 0L
    var i = 0
    while (i < bytes.length) { n += java.lang.Integer.bitCount(bytes(i) & 0xff); i += 1 }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): BitmapBitCount =
    copy(child = newChild)
}

/** popcount of the word-wise AND of two equal-width bitmaps. */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_and_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ba = a.asInstanceOf[Array[Byte]]
    val bb = b.asInstanceOf[Array[Byte]]
    require(ba.length == bb.length,
      s"bitmap_and_count over mixed widths: ${ba.length} vs ${bb.length}")
    var n = 0L
    var i = 0
    while (i < ba.length) { n += java.lang.Integer.bitCount((ba(i) & bb(i)) & 0xff); i += 1 }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCount =
    copy(left = newLeft, right = newRight)
}
