package graft.operators

import graft.TestSpark
import graft.functions.BitmapExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Block-bitmap distinct-set algebra laws (round 9, B154/B155). */
class BitmapsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("blockBitmaps popcount == exact distinct per group, across blocks") {
    val rnd = new scala.util.Random(5)
    // ids straddle several 65536-blocks, with duplicates
    val rows = Seq.fill(2000)(
      (s"s${rnd.nextInt(3)}", rnd.nextInt(300000).toLong))
    val df = rows.toDF("seg", "id")
    val got = Bitmaps.blockBitmaps(df, Seq("seg"), col("id"))
      .groupBy(col("seg"))
      .agg(sum(BitmapExprs.bitCount(col("bits"))).as("n"))
      .as[(String, Long)].collect().toMap
    val expected = rows.groupBy(_._1).map { case (s, v) =>
      s -> v.map(_._2).distinct.size.toLong }
    assert(got == expected)
  }

  test("bitwise merge law: merge(bm(A), bm(B)) == bm(A ∪ B) exactly") {
    val a = (0L to 999L).map(i => ("g", i * 7 % 5000))
    val b = (0L to 999L).map(i => ("g", i * 13 % 5000))
    def bm(rows: Seq[(String, Long)]) =
      Bitmaps.blockBitmaps(rows.toDF("seg", "id"), Seq("seg"), col("id"))
    val merged = bm(a).unionAll(bm(b))
      .groupBy(col("seg"), col("block"))
      .agg(BitmapExprs.bitmapMergeAgg(col("bits")).as("bits"))
      .select(col("block"), md5(col("bits")).as("h"))
      .as[(Long, String)].collect().toSet
    val whole = bm(a ++ b)
      .select(col("block"), md5(col("bits")).as("h"))
      .as[(Long, String)].collect().toSet
    assert(merged == whole) // BIT-equal state, not just equal counts
  }

  test("overlapMatrix matches exact distinct-pair counts incl. zero rows") {
    val rows = Seq(
      ("a", 1L), ("a", 2L), ("a", 2L), ("a", 70000L),
      ("b", 2L), ("b", 70000L), ("b", 5L),
      ("c", 999999L)) // c shares no block content with a/b
    val got = Bitmaps.overlapMatrix(rows.toDF("t", "u"), "t", "u")
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"), col("n_both"))
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", "b", 3L, 3L, 2L),
      ("a", "c", 3L, 1L, 0L),
      ("b", "c", 3L, 1L, 0L)))
  }

  test("rollingDistinct: window union == naive range recount") {
    val rnd = new scala.util.Random(11)
    val events = (1 to 3000).map { _ =>
      val day = rnd.nextInt(12)
      (java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:00"),
        rnd.nextInt(400).toLong)
    }
    val df = events.toDF("ts", "user_id")
    val got = Bitmaps.rollingDistinct(df, "user_id", windowDays = 3)
      .as[(String, Long, Long)].collect()
      .map { case (d, a, b) => d -> (a, b) }.toMap
    val byDay = events.groupBy(e => e._1.toString.take(10))
    val days = byDay.keys.toSeq.sorted
    for (d <- days) {
      val sameDay = byDay(d).map(_._2).distinct.size.toLong
      val window = days.filter(x => x <= d && x >= days.min)
        .filter(x => daysBetween(x, d) < 3)
        .flatMap(byDay(_).map(_._2)).distinct.size.toLong
      assert(got(d) == (sameDay, window), s"day $d")
    }
  }

  private def daysBetween(a: String, b: String): Long =
    java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))

  test("an out-of-range offset raises instead of corrupting a neighbor") {
    val err = intercept[Exception] {
      Seq(("g", 70000L)).toDF("seg", "off")
        .groupBy(col("seg"))
        .agg(BitmapExprs.bitmapAgg(col("off"), 65536))
        .collect()
    }
    assert(err.getMessage != null)
  }
}
