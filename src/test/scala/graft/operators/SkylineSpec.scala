package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 2-D skyline laws (round 9, B153). */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Naive O(n²) dominance skyline over distinct cells (min x, max y). */
  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val cells = pts.groupBy(identity).map { case (p, v) => (p._1, p._2, v.size.toLong) }
    cells.filter { case (x, y, _) =>
      !cells.exists { case (qx, qy, _) =>
        qx <= x && qy >= y && (qx < x || qy > y)
      }
    }.toSet
  }

  private def run(pts: Seq[(Long, Long)], buckets: Int = 256) =
    Skyline.skyline2d(pts.toDF("x", "y"), "x", "y", buckets)
      .as[(Long, Long, Long)].collect().toSet

  test("skyline2d equals brute-force dominance on random points") {
    val rnd = new scala.util.Random(92)
    val pts = Seq.fill(500)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
    assert(run(pts) == brute(pts))
  }

  test("bucket count does not change the result (1, 3, 256)") {
    val rnd = new scala.util.Random(17)
    val pts = Seq.fill(300)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val expected = brute(pts)
    for (b <- Seq(1, 3, 256)) assert(run(pts, b) == expected, s"buckets=$b")
  }

  test("ties: same x keeps only the max y; duplicate cells keep cnt") {
    val pts = Seq((1L, 5L), (1L, 9L), (1L, 9L), (2L, 9L), (3L, 10L))
    // (1,9)×2 survives (same-x max); (2,9) is dominated by (1,9);
    // (3,10) survives (better y than everything at smaller x)
    assert(run(pts) == Set((1L, 9L, 2L), (3L, 10L, 1L)))
  }

  test("a diagonal staircase is entirely on the skyline") {
    val pts = (1L to 40L).map(i => (i, i)) // x up, y up: nothing dominates
    assert(run(pts) == pts.map(p => (p._1, p._2, 1L)).toSet)
  }

  test("negative coordinates and a single point") {
    assert(run(Seq((-5L, -7L))) == Set((-5L, -7L, 1L)))
    val pts = Seq((-10L, -1L), (-10L, -3L), (0L, 0L), (5L, -2L))
    assert(run(pts) == brute(pts))
  }
}
