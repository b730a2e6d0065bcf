package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order laws: exact Morton bit math, square-locality of z-blocks, and
  * the layout payoff — per-partition bounding boxes tight in BOTH dims. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue: hand-computed Morton codes") {
    // x=5 (101b), y=3 (011b): bits interleaved y2 x2 y1 x1 y0 x0
    //   = 0 1 1 0 1 1 = 27? compute: x0=1@0, y0=1@1, x1=0@2, y1=1@3,
    //   x2=1@4, y2=0@5 → 1 + 2 + 8 + 16 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    assert(got == 27L)
    // and the classic corner cases
    val z = (x: Long, y: Long) => Seq((x, y)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z")).as[Long].head()
    assert(z(0L, 0L) == 0L)
    assert(z(255L, 0L) == 0x5555L) // all even bit positions
    assert(z(0L, 255L) == 0xAAAAL) // all odd bit positions
    assert(z(255L, 255L) == 0xFFFFL)
  }

  test("zValueN: 3-column interleave places bit i of col j at i*3+j") {
    val z = (x: Long, y: Long, w: Long) => Seq((x, y, w)).toDF("x", "y", "w")
      .select(Layout.zValueN(Seq(col("x"), col("y"), col("w")), 4).as("z"))
      .as[Long].head()
    assert(z(0L, 0L, 0L) == 0L)
    assert(z(15L, 0L, 0L) == java.lang.Long.parseLong("001001001001", 2))
    assert(z(0L, 15L, 0L) == java.lang.Long.parseLong("010010010010", 2))
    assert(z(0L, 0L, 15L) == java.lang.Long.parseLong("100100100100", 2))
    assert(z(15L, 15L, 15L) == java.lang.Long.parseLong("111111111111", 2))
    assert(z(1L, 1L, 1L) == 7L)
    // 2-col zValue is the k=2 case of the same generator
    intercept[IllegalArgumentException] {
      Layout.zValueN(Seq(col("x"), col("y")), 32) // 64 bits: sign overflow
    }
  }

  test("z-blocks are aligned squares: dropping 2k low bits bounds both dims") {
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val blocks = pts.toDF("x", "y")
      .withColumn("zb", shiftright(Layout.zValue(col("x"), col("y"), 6), 6))
      .groupBy("zb")
      .agg(min("x").as("nx"), max("x").as("xx"),
        min("y").as("ny"), max("y").as("xy"))
      .collect()
    assert(blocks.length == 64) // 64x64 grid / 8x8 squares
    blocks.foreach { r =>
      assert(r.getAs[Long]("xx") - r.getAs[Long]("nx") == 7, r.toString)
      assert(r.getAs[Long]("xy") - r.getAs[Long]("ny") == 7, r.toString)
      assert(r.getAs[Long]("nx") % 8 == 0 && r.getAs[Long]("ny") % 8 == 0)
    }
  }

  test("zorder layout: a narrow y-predicate skips most partitions") {
    // The payoff is NOT total bounding-box area (partitions tile the space,
    // so that is invariant) — it is that every partition bounds BOTH dims,
    // so a min/max check on the non-leading dimension prunes. x-ordered
    // layout: every partition is a full-height x-strip, a y-predicate
    // prunes nothing. z layout: partitions are ~squares, a narrow y-window
    // intersects only the bottom row of them.
    val pts = (for (x <- 0L until 128L; y <- 0L until 128L) yield (x, y))
      .toDF("x", "y")
    def scannedForY(df: org.apache.spark.sql.DataFrame,
        lo: Long, hi: Long): (Int, Int) = {
      val boxes = df.select(col("x"), col("y")).rdd.mapPartitions { it =>
        val ys = it.map(_.getLong(1)).toSeq
        if (ys.isEmpty) Iterator.empty else Iterator((ys.min, ys.max))
      }.collect()
      (boxes.count { case (n, x) => x >= lo && n <= hi }, boxes.length)
    }
    val (zScan, zTotal) =
      scannedForY(Layout.zorder(pts, col("x"), col("y"), 7, 16), 0L, 7L)
    val (linScan, linTotal) = scannedForY(
      pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")),
      0L, 7L)
    assert(linScan == linTotal, "x-strips can never skip on y")
    assert(zScan <= zTotal / 2,
      s"z layout should skip most partitions: scanned $zScan of $zTotal")
  }

  // Canonical xy2d (flip+swap state machine) as the independent reference
  // for the unrolled expression tree.
  private def refHilbert(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbertD: matches the canonical xy2d state machine") {
    val pts = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
      .toDF("x", "y")
    val got = pts.select(col("x"), col("y"),
        Layout.hilbertD(col("x"), col("y"), 4).as("d"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) => assert(d == refHilbert(4, x, y), s"($x,$y)") }
  }

  test("hilbertD: bijection + unit-step adjacency (the property z lacks)") {
    val pts = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val byD = pts.select(Layout.hilbertD(col("x"), col("y"), 5).as("d"),
        col("x"), col("y"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(byD.map(_._1).toSeq == (0L until 1024L).toSeq, "bijection")
    byD.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve must step to a grid neighbor: ($x1,$y1)->($x2,$y2)")
    }
    // and z-order does NOT have this property (documents why hilbert exists)
    val byZ = pts.select(Layout.zValue(col("x"), col("y"), 5).as("z"),
        col("x"), col("y"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val jumps = byZ.sliding(2).count { case Array((_, x1, y1), (_, x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(jumps > 0)
  }

  test("hilbert layout: block bounding boxes never exceed the block size") {
    // 256 cells per block on a 256x256 grid: a connected 256-cell region
    // has bbox side <= 256 cells worth of walk -> both sides <= 31 is the
    // empirical Hilbert bound at this scale; assert the weaker invariant
    // that every block's bbox area stays within 4x the block's cell count
    // (z-order blocks can hit the full-diagonal worst case instead).
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val boxes = pts
      .select(shiftright(Layout.hilbertD(col("x"), col("y"), 6), 6).as("b"),
        col("x"), col("y"))
      .groupBy(col("b"))
      .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    boxes.foreach { case (b, x0, x1, y0, y1, n) =>
      val area = (x1 - x0 + 1) * (y1 - y0 + 1)
      assert(area <= 4 * n, s"block $b bbox area $area vs $n cells")
    }
  }
}
