package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kaplan–Meier and stratified-ATT laws (round 9, B165/B166). */
class CausalSurvivalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kaplanMeier: textbook hand-computed curve with censoring") {
    // 4 users, first event at hour 0. u1 purchases at h1, u2 at h2,
    // u3 never (censored at corpus end h3), u4 purchases at h3.
    def ev(u: Long, h: Long, t: String) =
      (u, java.sql.Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00"), t)
    val events = Seq(
      ev(1, 0, "view"), ev(1, 1, "purchase"),
      ev(2, 0, "view"), ev(2, 2, "purchase"),
      ev(3, 0, "view"), ev(3, 3, "view"),
      ev(4, 0, "view"), ev(4, 3, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventsOps.kaplanMeier(events, "purchase")
      .orderBy(col("t_hr"))
      .as[(Long, Long, Long, Option[Long])].collect()
    def ln(x: Double) = math.floor(1e6 * math.log(x)).toLong
    // t=1: risk 4, d 1 → ln(3/4); t=2: risk 3, d 1 → +ln(2/3);
    // t=3: risk 2 (u3 censored at 3 still at risk), d 1 → +ln(1/2)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 4L, 1L), (2L, 3L, 1L), (3L, 2L, 1L)))
    assert(got(0)._4.contains(ln(3.0 / 4)))
    assert(got(1)._4.contains(ln(3.0 / 4) + ln(2.0 / 3)))
    assert(got(2)._4.contains(ln(3.0 / 4) + ln(2.0 / 3) + ln(1.0 / 2)))
  }

  test("bootstrapMeanCi: interval brackets the mean and tightens with data") {
    val rnd = new scala.util.Random(8)
    def events(hours: Int, perHour: Int) = (0 until hours).flatMap { h =>
      (0 until perHour + rnd.nextInt(21)).map { _ =>
        Tuple1(java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(1700000000L + h * 3600L)))
      }
    }.toDF("ts")
    val r = EventsOps.bootstrapMeanCi(events(300, 40), b = 200)
      .select(col("mean"), col("lo95"), col("hi95"))
      .as[(String, String, String)].head()
    val (m, lo, hi) = (r._1.toDouble, r._2.toDouble, r._3.toDouble)
    assert(lo <= m && m <= hi, s"($lo, $m, $hi)")
    assert(hi - lo > 0, "degenerate interval")
    // per-hour counts ∈ [40, 60]: a 95% CI of the mean over 300 hours
    // must be far tighter than the data range
    assert(hi - lo < 5.0, s"width ${hi - lo}")
  }

  test("stratifiedAtt recovers the true effect under confounding") {
    // Confound: high-x rows are mostly treated AND have higher baseline y.
    // True additive effect = +100 in every stratum; the NAIVE difference
    // is inflated by the baseline gap, the stratified estimate is not.
    val rnd = new scala.util.Random(3)
    val rows = (1 to 4000).map { _ =>
      val x = rnd.nextInt(100).toDouble
      val treated = rnd.nextInt(100) < (20 + x.toInt / 2) // P(T) grows in x
      val y = 1000L + (x * 10).toLong + (if (treated) 100L else 0L)
      (y, treated, x)
    }
    val out = Profiling.stratifiedAtt(rows.toDF("y", "t", "x"), buckets = 10)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r._4.toDouble).toMap
    val naive = {
      val t = rows.filter(_._2); val c = rows.filterNot(_._2)
      t.map(_._1).sum.toDouble / t.size - c.map(_._1).sum.toDouble / c.size
    }
    assert(naive > 160, s"fixture must be confounded (naive=$naive)")
    val att = out("(all)")
    assert(math.abs(att - 100.0) < 35, s"stratified att=$att")
  }
}
