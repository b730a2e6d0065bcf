package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distributed set/frequency sketches as native Catalyst aggregates.
  *
  * These are the 100 TB answers to two questions the exact operators answer
  * with corpus-sized shuffles:
  *
  *  - "have I seen this document before?" — [[BloomFilterAgg]] builds a
  *    fixed-size bitset; only `numBits/8` bytes per partition cross the
  *    shuffle (bitwise-OR merge), and the finished filter broadcasts to
  *    probe a new batch with zero joins. Contrast q70's exact incremental
  *    dedup, which shuffles the new batch against the corpus index.
  *  - "how frequent is this token?" — [[CountMinSketchAgg]] keeps a
  *    depth×width counter grid; partials merge by element-wise add, so the
  *    full vocabulary never shuffles (q31/q65 shuffle one row per distinct
  *    token — fine until the vocabulary itself is TB-scale).
  *
  * Both guarantee one-sidedness (no false negatives / never underestimate),
  * which is what the driver-checked gates in SketchOps assert.
  *
  * Hashing: callers pass any 64-bit hash of the value (`xxhash64`); the
  * sketches derive k index functions with the Kirsch–Mitzenmacher double
  * hashing scheme h_i = h1 + i·h2 over murmur-finalized remixes, so results
  * are deterministic across partitionings and engines.
  */
object SketchHash {
  /** MurmurHash3 64-bit finalizer — full-avalanche remix of a hash. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  /** i-th derived index in [0, mod) for input hash v. */
  def index(v: Long, i: Int, mod: Int): Int = {
    val h1 = fmix64(v)
    val h2 = fmix64(v ^ 0x9e3779b97f4a7c15L) | 1L
    java.lang.Math.floorMod(h1 + i.toLong * h2, mod.toLong).toInt
  }

  // Self-describing sketch headers: the build-time parameters ride inside
  // the serialized sketch, so a probe expression derives them instead of
  // trusting a caller-supplied copy — a numHashes/width that disagreed with
  // the build silently produced wrong membership/count answers before.
  // The probe APIs keep their explicit parameters as a cross-check: a
  // mismatch now raises a clear error instead of returning garbage.

  /** First header long of a Bloom binary: magic | version | numHashes. */
  val BloomMagic: Long = 0x4742_4C4FL // "GBLO"
  /** First element of a CMS grid array: magic; then depth, width. */
  val CmsMagic: Long = 0x4743_4D53L // "GCMS"
  val CmsHeaderLen: Int = 3

  def bloomHeader(numHashes: Int): Long =
    (BloomMagic << 32) | numHashes.toLong

  /** numHashes recovered from a Bloom binary's 8-byte header. */
  def bloomNumHashes(bytes: Array[Byte]): Int = {
    require(bytes.length >= 8 && bytes.length % 8 == 0,
      s"not a graft Bloom sketch: length ${bytes.length}")
    val h = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getLong(0)
    require((h >>> 32) == BloomMagic,
      f"not a graft Bloom sketch: header 0x$h%016x")
    (h & 0xffffffffL).toInt
  }
}

/** Bloom filter over 64-bit input hashes. Buffer is a Long-word bitset;
  * merge is bitwise OR; result is BINARY (little-endian): one 8-byte
  * header word (magic + numHashes, see [[SketchHash.bloomHeader]]) followed
  * by the bitset — small enough to broadcast (default 2^21 bits = 256 KiB).
  * The header makes the sketch self-describing, so probes derive k and
  * numBits from the binary instead of trusting the caller. */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64: $numBits")
  require(numHashes > 0, s"numHashes must be positive: $numHashes")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_filter_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val idx = SketchHash.index(h, i, numBits)
        buf(idx >>> 6) |= (1L << (idx & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val bb = ByteBuffer.allocate((buf.length + 1) * 8).order(ByteOrder.LITTLE_ENDIAN)
    val lb = bb.asLongBuffer()
    lb.put(SketchHash.bloomHeader(numHashes))
    lb.put(buf)
    bb.array()
  }

  override def serialize(buf: Array[Long]): Array[Byte] = eval(buf).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8 - 1)
    val lb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer()
    lb.get() // skip header word
    lb.get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

object BloomFilterAgg {
  def of(hash: Column, numBits: Int, numHashes: Int): Column =
    GraftSql.column(
      BloomFilterAgg(GraftSql.expression(hash), numBits, numHashes).toAggregateExpression())
}

/** Membership probe against a [[BloomFilterAgg]] bitset: true iff all k
  * derived bits are set. numBits and k are recovered from the sketch's
  * header/length, so the probe stays correct for any filter the caller
  * built; the explicit `numHashes` is validated against the header — a
  * mismatch errors instead of silently answering wrong. */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(bloom: Any, hash: Any): Any = {
    val bytes = bloom.asInstanceOf[Array[Byte]]
    val k = SketchHash.bloomNumHashes(bytes)
    require(k == numHashes,
      s"bloom_might_contain: numHashes $numHashes does not match the " +
        s"sketch's build-time value $k")
    val h = hash.asInstanceOf[Long]
    val numBits = (bytes.length - 8) * 8
    var i = 0
    while (i < k) {
      val idx = 64 + SketchHash.index(h, i, numBits) // bit offset past header
      if ((bytes(idx >>> 3) & (1 << (idx & 7))) == 0) return java.lang.Boolean.FALSE
      i += 1
    }
    java.lang.Boolean.TRUE
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  def of(bloom: Column, hash: Column, numHashes: Int): Column =
    GraftSql.column(
      BloomMightContain(GraftSql.expression(bloom), GraftSql.expression(hash), numHashes))
}

/** Membership probe against a DRIVER-HELD Bloom bitset (round-15 perf).
  *
  * The crossJoin(broadcast(bloom)) + [[BloomMightContain]] idiom attaches
  * the serialized bitset to every probe row, and each `eval` re-reads it
  * through `UnsafeRow.getBinary`, which COPIES the bytes — a 256 KiB
  * memcpy per probe row (measured: ~150 GB of copy for a 600 k-row probe
  * at the default 2^21-bit filter), plus a CodegenFallback that breaks
  * the scan stage's whole-stage codegen. Here the finished bitset is a
  * constructor argument (the build side is aggregated once on the
  * driver — fixed `numBits/8` bytes, the same state the broadcast
  * carried), decoded into long words once per executor via the reference
  * object, and probed with generated code. Bit-for-bit the same
  * membership answers as [[BloomMightContain]] over the same sketch. */
case class BloomProbeLit(bloomBytes: Array[Byte], child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  @transient private lazy val k: Int = SketchHash.bloomNumHashes(bloomBytes)
  @transient private lazy val words: Array[Long] = {
    val out = new Array[Long](bloomBytes.length / 8 - 1)
    val lb = ByteBuffer.wrap(bloomBytes).order(ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer()
    lb.get() // header word
    lb.get(out)
    out
  }
  @transient private lazy val nBits: Int = words.length * 64

  /** true iff all k derived bits of `h` are set. */
  def probe(h: Long): Boolean = {
    var i = 0
    while (i < k) {
      val idx = SketchHash.index(h, i, nBits)
      if ((words(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(hash: Any): Any = probe(hash.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomProbeLit].getName)
    defineCodeGen(ctx, ev, h => s"$ref.probe($h)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomProbeLit = copy(child = newChild)
}

object BloomProbeLit {
  def of(bloom: Array[Byte], hash: Column): Column =
    GraftSql.column(BloomProbeLit(bloom, GraftSql.expression(hash)))
}

/** Count-min sketch over 64-bit input hashes: depth×width counter grid,
  * counts(d)(index_d(h)) += 1 per row, element-wise-add merge. Result is
  * array<bigint>: a 3-element header (magic, depth, width — so probes can
  * derive the build parameters instead of trusting the caller) followed by
  * the flattened grid (row-major), suitable for broadcast and probing with
  * [[CmsEstimate]]. */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth > 0 && width > 0, s"depth/width must be positive: $depth x $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_sketch_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buf(d * width + SketchHash.index(h, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Long](SketchHash.CmsHeaderLen + buf.length)
    out(0) = SketchHash.CmsMagic
    out(1) = depth.toLong
    out(2) = width.toLong
    System.arraycopy(buf, 0, out, SketchHash.CmsHeaderLen, buf.length)
    new GenericArrayData(out)
  }

  // buffer serialization stays headerless — both sides of a merge were
  // built by this same expression instance, so the parameters cannot drift
  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketchAgg =
    copy(child = newChild)
}

object CountMinSketchAgg {
  def of(hash: Column, depth: Int, width: Int): Column =
    GraftSql.column(
      CountMinSketchAgg(GraftSql.expression(hash), depth, width).toAggregateExpression())
}

/** Point estimate from a [[CountMinSketchAgg]] grid: min over rows of the
  * counter at each row's derived index — never underestimates the true
  * count. depth and width come from the grid's own header; the explicit
  * `width` is validated against it — a mismatch errors instead of silently
  * probing the wrong cells. */
case class CmsEstimate(left: Expression, right: Expression, width: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(grid: Any, hash: Any): Any = {
    val arr = grid.asInstanceOf[ArrayData]
    require(arr.numElements() >= SketchHash.CmsHeaderLen &&
      arr.getLong(0) == SketchHash.CmsMagic,
      "cms_estimate: input is not a graft count-min sketch")
    val depth = arr.getLong(1).toInt
    val w = arr.getLong(2).toInt
    require(w == width,
      s"cms_estimate: width $width does not match the sketch's " +
        s"build-time value $w")
    val h = hash.asInstanceOf[Long]
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = arr.getLong(
        SketchHash.CmsHeaderLen + d * w + SketchHash.index(h, d, w))
      if (c < best) best = c
      d += 1
    }
    java.lang.Long.valueOf(best)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def of(grid: Column, hash: Column, width: Int): Column =
    GraftSql.column(
      CmsEstimate(GraftSql.expression(grid), GraftSql.expression(hash), width))
}
