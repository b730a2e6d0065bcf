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
}
