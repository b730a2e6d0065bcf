package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grid radius join laws (round 8, B145). */
class SpatialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)], r: Long) =
    (for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts
      if a < b
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= r * r
    } yield (a, b, d2)).toSet

  test("gridRadiusJoin: equals brute force on random points incl. negatives") {
    val rnd = new scala.util.Random(71)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextInt(2001).toLong - 1000L, rnd.nextInt(2001).toLong - 1000L))
    val df = pts.toDF("id", "x", "y")
    for (r <- Seq(40L, 150L)) {
      val got = Spatial.gridRadiusJoin(df, r)
        .as[(Long, Long, Long)].collect()
      assert(got.length == got.toSet.size, s"r=$r produced duplicate pairs")
      assert(got.toSet == brute(pts, r), s"r=$r mismatch")
    }
  }

  test("gridRadiusJoin: boundary pairs at exactly r^2 are kept, r^2+1 dropped") {
    val df = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 5L, 1L))
      .toDF("id", "x", "y")
    // |p1-p2| = 5 exactly; |p1-p3|^2 = 26
    val got = Spatial.gridRadiusJoin(df, 5L).as[(Long, Long, Long)]
      .collect().toSet
    assert(got.contains((1L, 2L, 25L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("gridRadiusJoin: oversized cells stay exact (cell > radius)") {
    val rnd = new scala.util.Random(73)
    val pts = (1L to 200L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val df = pts.toDF("id", "x", "y")
    val want = brute(pts, 60L)
    assert(Spatial.gridRadiusJoin(df, 60L, cell = 200L)
      .as[(Long, Long, Long)].collect().toSet == want)
  }

  test("gridRadiusJoin: co-located points (mass duplicates) pair exactly once each") {
    // 30 points at the same coordinate: C(30,2) zero-distance pairs
    val df = ((1L to 30L).map(i => (i, 7L, 7L)) :+ (99L, 500L, 500L))
      .toDF("id", "x", "y")
    val got = Spatial.gridRadiusJoin(df, 10L).as[(Long, Long, Long)].collect()
    assert(got.length == 30 * 29 / 2)
    assert(got.forall(_._3 == 0L))
  }
}
