package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL rank sketch — Karnin, Lang, Liberty, "Optimal Quantile
  * Approximation in Streams" (FOCS 2016) — the UNBOUNDED-domain
  * companion to B103's fixed-grid histogram state: the grid needs a
  * declared (lo, width, nBuckets) value range up front; KLL sketches the
  * rank structure of ANY long-valued column in O(k) space with rank
  * error O(n/k), fully mergeable (map-side combine + shuffle of sketch
  * bytes only — the shape that survives 100 TB).
  *
  * Structure: geometric compactor levels — level i holds items of weight
  * 2^i; level capacities decay by c = 2/3 from the top (capacity k), so
  * total retained items are ≤ ~k/(1−c) = 3k regardless of n. An
  * over-capacity level sorts its buffer and promotes every second item
  * (the survivor parity ALTERNATES per level — the standard
  * derandomized variant, so replays of the same update/merge sequence
  * are bit-identical; an odd trailing item stays at its level, which
  * preserves Σ|level_i|·2^i == n EXACTLY — the merge-law the spec
  * checks).
  *
  * EXACT REGIME (the q171/q222 sketch-oracle discipline): while n ≤ k no
  * compaction has happened, the sketch IS the input multiset at weight 1,
  * and every rank readout is exact — that regime is what the DuckDB gate
  * hash-matches; the sketch regime is law-checked (weight conservation,
  * bounded state, rank-error ceiling) in-query and in specs.
  *
  * Readout: eval emits array<struct<v:long, w:long>> sorted by (v, w);
  * the quantile at fraction p is the smallest v whose cumulative weight
  * reaches max(1, ⌈p·W⌉) — plain built-in array/window code downstream,
  * no custom scalar expressions.
  */
object KllExprs {
  /** kll_agg(value, k): mergeable KLL sketch of a long column. */
  def kllAgg(value: Column, k: Int): Column =
    GraftSql.column(KllAgg(GraftSql.expression(value), k).toAggregateExpression())

  /** KLL over a DOUBLE column (round 14, B275): the values pass through
    * the order-preserving IEEE-754 bits bijection ([[DoubleBits]]) so the
    * long-domain sketch machinery — compactors, wire format, streaming
    * ValueState twin — is reused UNCHANGED; readout maps the retained
    * items back with [[sortableToDouble]]. Order-preserving ⇒ every rank
    * statistic of the mapped longs is the rank statistic of the doubles. */
  def kllAggDouble(value: Column, k: Int): Column =
    GraftSql.column(KllAgg(
      DoubleSortableBits(GraftSql.expression(value)), k).toAggregateExpression())

  /** KLL over PRE-AGGREGATED (value, count) input (round 14, B275):
    * weight w lands by its binary decomposition — one item at level i per
    * set bit i of w, exactly what an item of weight 2^i means to the
    * compactor — so Σ|level_i|·2^i grows by exactly w (the conservation
    * law) and a pre-aggregated feed is sketch-equivalent to replaying the
    * raw rows. Rows with w = 0 are no-ops; negative weights raise. */
  def kllAggWeighted(value: Column, weight: Column, k: Int): Column =
    GraftSql.column(KllAggWeighted(GraftSql.expression(value),
      GraftSql.expression(weight), k).toAggregateExpression())

  /** Inverse bits mapping for double-sketch readout columns. */
  def sortableToDouble(c: Column): Column =
    GraftSql.column(SortableBitsToDouble(GraftSql.expression(c)))

  /** Mutable sketch state: `levels(i)` holds weight-2^i items (unsorted
    * between compactions), `parity(i)` the next survivor phase. */
  final class State(val k: Int) {
    var levels: Array[scala.collection.mutable.ArrayBuffer[Long]] =
      Array(scala.collection.mutable.ArrayBuffer.empty[Long])
    var parity: Array[Boolean] = Array(false)

    def capacity(i: Int): Int = {
      // top level holds k; each level below decays by 2/3, floor 2
      val fromTop = levels.length - 1 - i
      math.max(2, math.ceil(k * math.pow(2.0 / 3.0, fromTop)).toInt)
    }

    def totalItems: Int = { var s = 0; levels.foreach(s += _.length); s }

    def totalWeight: Long = {
      var s = 0L
      var i = 0
      while (i < levels.length) { s += levels(i).length.toLong << i; i += 1 }
      s
    }

    def update(v: Long): Unit = { levels(0) += v; compress() }

    /** Weighted insert: one item at level i per set bit i of `w` (an
      * item at level i carries weight 2^i by construction), then one
      * compress pass. Conserves total weight exactly: Σ|level|·2^i grows
      * by precisely w. */
    def updateWeighted(v: Long, w: Long): Unit = {
      require(w >= 0L, s"kll weighted update: negative weight $w")
      if (w == 0L) return
      var rem = w
      var i = 0
      while (rem != 0L) {
        if ((rem & 1L) == 1L) {
          if (i >= levels.length) grow(i + 1)
          levels(i) += v
        }
        rem >>>= 1
        i += 1
      }
      compress()
    }

    def mergeFrom(o: State): Unit = {
      if (o.levels.length > levels.length) grow(o.levels.length)
      var i = 0
      while (i < o.levels.length) { levels(i) ++= o.levels(i); i += 1 }
      compress()
    }

    private def grow(to: Int): Unit = {
      val nl = Array.fill(to)(scala.collection.mutable.ArrayBuffer.empty[Long])
      val np = Array.fill(to)(false)
      var i = 0
      while (i < levels.length) { nl(i) = levels(i); np(i) = parity(i); i += 1 }
      levels = nl; parity = np
    }

    def compress(): Unit = {
      var i = 0
      while (i < levels.length) {
        if (levels(i).length > capacity(i)) {
          if (i == levels.length - 1) grow(levels.length + 1)
          val sorted = levels(i).sorted
          val m = sorted.length - (sorted.length % 2)
          val start = if (parity(i)) 1 else 0
          parity(i) = !parity(i)
          val keep = scala.collection.mutable.ArrayBuffer.empty[Long]
          if (sorted.length % 2 == 1) keep += sorted(sorted.length - 1)
          var j = start
          while (j < m) { levels(i + 1) += sorted(j); j += 2 }
          levels(i) = keep
        }
        i += 1
      }
    }

    /** (v, w) pairs sorted by (v, w) — the eval/serialize surface. */
    def flattened: Array[(Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => out += ((v, w)))
        i += 1
      }
      out.sortBy(identity).toArray
    }

    /** Smallest v whose cumulative weight reaches fraction `pPct`/100 of
      * the total (the readout the quantile queries and the streaming twin
      * share): min v with 100·cum ≥ pPct·W. */
    def quantile(pPct: Int): Long = {
      val fl = flattened
      val wTot = totalWeight
      var cum = 0L
      var i = 0
      while (i < fl.length) {
        cum += fl(i)._2
        if (cum * 100 >= pPct * wTot) return fl(i)._1
        i += 1
      }
      if (fl.isEmpty) 0L else fl.last._1
    }
  }

  /** Wire format shared by the aggregate buffer and the streaming
    * ValueState twin: k, nLevels, then (len, parity, items) per level. */
  def toBytes(buf: State): Array[Byte] = {
    var bytes = 8
    buf.levels.foreach(l => bytes += 5 + 8 * l.length)
    val bb = ByteBuffer.allocate(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.k)
    bb.putInt(buf.levels.length)
    var i = 0
    while (i < buf.levels.length) {
      bb.putInt(buf.levels(i).length)
      bb.put(if (buf.parity(i)) 1.toByte else 0.toByte)
      buf.levels(i).foreach(bb.putLong)
      i += 1
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val st = new State(bb.getInt)
    val n = bb.getInt
    st.levels = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Long])
    st.parity = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      st.parity(i) = bb.get() == 1
      var j = 0
      while (j < len) { st.levels(i) += bb.getLong; j += 1 }
      i += 1
    }
    st
  }
}

/** TypedImperativeAggregate over [[KllExprs.State]]: update O(1) amortized,
  * merge O(items), state ≤ ~3k longs + level headers regardless of n. */
case class KllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllExprs.State]
    with UnaryLike[Expression] with ExpectsInputTypes {

  require(k >= 8, s"kll k must be >= 8: $k")

  // analysis-time contract (ADVICE r13): update casts to Long, so a
  // non-long child must fail resolution, not execution
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", LongType, nullable = false),
      StructField("w", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_agg"

  override def createAggregationBuffer(): KllExprs.State = new KllExprs.State(k)

  override def update(buf: KllExprs.State, input: InternalRow): KllExprs.State = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: KllExprs.State, b2: KllExprs.State): KllExprs.State = {
    b1.mergeFrom(b2)
    b1
  }

  override def eval(buf: KllExprs.State): Any = {
    val pairs = buf.flattened
    val rows = new Array[Any](pairs.length)
    var i = 0
    while (i < pairs.length) {
      rows(i) = new GenericInternalRow(Array[Any](pairs(i)._1, pairs(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: KllExprs.State): Array[Byte] =
    KllExprs.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): KllExprs.State =
    KllExprs.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllAgg =
    copy(child = newChild)
}

/** Order-preserving bijection double ⇄ long (round 14): the classic
  * IEEE-754 sortable-bits trick — non-negatives keep their raw bits (which
  * already ascend with value); negatives flip their 63 magnitude bits so
  * larger magnitude sorts lower. −0.0 normalizes to +0.0 first (one
  * quantile value, not two); NaN canonicalizes via doubleToLongBits and
  * sorts above +∞. Total order == java.lang.Double.compare on non-NaN. */
object DoubleBits {
  def toSortable(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
    b ^ ((b >> 63) & Long.MaxValue)
  }
  def fromSortable(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))
}

/** double → order-preserving long bits (codegen: one static call). */
case class DoubleSortableBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "double_sortable_bits"
  override protected def nullSafeEval(v: Any): Any =
    DoubleBits.toSortable(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DoubleBits.toSortable($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Inverse of [[DoubleSortableBits]] for sketch readout. */
case class SortableBitsToDouble(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sortable_bits_to_double"
  override protected def nullSafeEval(v: Any): Any =
    DoubleBits.fromSortable(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DoubleBits.fromSortable($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** KLL over pre-aggregated (value, count) rows — same state, same wire
  * format, weighted binary-decomposition update ([[KllExprs.State
  * .updateWeighted]]). The 100 TB shape this serves: an upstream groupBy
  * has already collapsed a huge column to (value, count) pairs; replaying
  * counts as raw rows would undo that compression. */
case class KllAggWeighted(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllExprs.State]
    with BinaryLike[Expression] with ExpectsInputTypes {

  require(k >= 8, s"kll k must be >= 8: $k")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", LongType, nullable = false),
      StructField("w", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_agg_weighted"

  override def createAggregationBuffer(): KllExprs.State = new KllExprs.State(k)

  override def update(buf: KllExprs.State, input: InternalRow): KllExprs.State = {
    val v = left.eval(input)
    val w = right.eval(input)
    if (v != null && w != null)
      buf.updateWeighted(v.asInstanceOf[Long], w.asInstanceOf[Long])
    buf
  }

  override def merge(b1: KllExprs.State, b2: KllExprs.State): KllExprs.State = {
    b1.mergeFrom(b2)
    b1
  }

  override def eval(buf: KllExprs.State): Any = {
    val pairs = buf.flattened
    val rows = new Array[Any](pairs.length)
    var i = 0
    while (i < pairs.length) {
      rows(i) = new GenericInternalRow(Array[Any](pairs(i)._1, pairs(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: KllExprs.State): Array[Byte] =
    KllExprs.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): KllExprs.State =
    KllExprs.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAggWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAggWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllAggWeighted =
    copy(left = newLeft, right = newRight)
}
