package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
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
    with UnaryLike[Expression] {

  require(k >= 8, s"kll k must be >= 8: $k")

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
