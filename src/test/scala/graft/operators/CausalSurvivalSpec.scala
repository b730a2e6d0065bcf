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

  test("nelsonAalen: textbook hazard increments on the KM fixture") {
    def ev(u: Long, h: Long, t: String) =
      (u, java.sql.Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00"), t)
    val events = Seq(
      ev(1, 0, "view"), ev(1, 1, "purchase"),
      ev(2, 0, "view"), ev(2, 2, "purchase"),
      ev(3, 0, "view"), ev(3, 3, "view"),
      ev(4, 0, "view"), ev(4, 3, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventsOps.nelsonAalen(events, "purchase")
      .orderBy(col("t_hr"))
      .as[(Long, Long, Long, Long)].collect()
    // same risk table as KM: (1, 4, 1), (2, 3, 1), (3, 2, 1);
    // H = 1/4, then + 1/3, then + 1/2 in floored micro-units
    def mu(x: Double) = math.floor(1e6 * x).toLong
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 4L, 1L), (2L, 3L, 1L), (3L, 2L, 1L)))
    assert(got(0)._4 == mu(0.25))
    assert(got(1)._4 == mu(0.25) + mu(1.0 / 3))
    assert(got(2)._4 == mu(0.25) + mu(1.0 / 3) + mu(0.5))
    // hazard is nondecreasing by construction
    assert(got.map(_._4).toSeq == got.map(_._4).toSeq.sorted)
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

  test("logRankTest: mirrored cohorts score chi2 ~ 0, planted effect does not") {
    def ev(u: Long, h: Long, t: String) =
      (u, java.sql.Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00"), t)
    // mirrored: user 2k and 2k+1 have identical streams → groups identical
    val mirrored = (0L until 40L).flatMap { u =>
      Seq(ev(u, 0, "view"), ev(u, (u / 2) % 7 + 1,
        if ((u / 2) % 3 == 0) "purchase" else "view"))
    }.toDF("user_id", "ts", "event_type")
    val m = EventsOps.logRankTest(mirrored, "purchase")
      .as[(Long, Long, Long, Long, Long, Long, String)].head()
    assert(m._1 == 20 && m._2 == 20)
    assert(m._3 == m._4, "mirrored groups must have equal death counts")
    // E1 = O1 up to the per-time floor error (≤ 1 micro-unit per time)
    assert(math.abs(m._5 - m._3 * 1000000L) <= 20,
      s"e1_micro=${m._5} vs o1=${m._3}")
    assert(m._7.toDouble < 0.01, s"chi2=${m._7}")

    // planted: even users all convert at h1, odd users never (censored h12)
    val planted = (0L until 40L).flatMap { u =>
      if (u % 2 == 0) Seq(ev(u, 0, "view"), ev(u, 1, "purchase"))
      else Seq(ev(u, 0, "view"), ev(u, 12, "view"))
    }.toDF("user_id", "ts", "event_type")
    val p = EventsOps.logRankTest(planted, "purchase")
      .as[(Long, Long, Long, Long, Long, Long, String)].head()
    assert(p._3 == 20 && p._4 == 0)
    assert(p._7.toDouble > 10, s"chi2=${p._7}")
  }

  test("logRankTest matches a sequential brute-force recomputation") {
    val rnd = new scala.util.Random(11)
    def ev(u: Long, h: Long, t: String) =
      (u, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00")
        .toInstant.plusSeconds(h * 3600), t)
    val raw = (0L until 60L).flatMap { u =>
      val first = rnd.nextInt(5).toLong
      val extra = (1 to rnd.nextInt(4)).map(_ =>
        ev(u, first + 1 + rnd.nextInt(20), if (rnd.nextBoolean()) "purchase" else "view"))
      ev(u, first, "view") +: extra
    }
    val df = raw.map { case (u, i, t) => (u, java.sql.Timestamp.from(i), t) }
      .toDF("user_id", "ts", "event_type")
    val got = EventsOps.logRankTest(df, "purchase")
      .as[(Long, Long, Long, Long, Long, Long, String)].head()
    // sequential reference: identical duration/censoring semantics
    val byUser = raw.groupBy(_._1).map { case (u, evs) =>
      val t0 = evs.map(_._2.getEpochSecond).min
      val tp = evs.filter(_._3 == "purchase").map(_._2.getEpochSecond)
        .minOption
      (u, t0, tp)
    }.toSeq
    val tend = raw.map(_._2.getEpochSecond).max
    val durs = byUser.map { case (u, t0, tp) =>
      val g = if (u % 2 == 0) 1 else 2
      (g, (tp.getOrElse(tend) - t0) / 3600L, tp.isDefined)
    }
    val n1tot = durs.count(_._1 == 1); val n2tot = durs.count(_._1 == 2)
    var o1 = 0L; var o2 = 0L; var e1 = 0L; var v = 0L
    for (t <- durs.map(_._2).distinct.sorted) {
      val d1 = durs.count(d => d._1 == 1 && d._2 == t && d._3)
      val d2 = durs.count(d => d._1 == 2 && d._2 == t && d._3)
      val n1 = durs.count(d => d._1 == 1 && d._2 >= t)
      val n2 = durs.count(d => d._1 == 2 && d._2 >= t)
      val d = d1 + d2; val n = n1 + n2
      if (d > 0) {
        o1 += d1; o2 += d2
        e1 += math.floor(1e6 * d.toDouble * n1.toDouble / n.toDouble).toLong
        if (n > 1) v += math.floor(1e6 * d.toDouble * n1.toDouble *
          n2.toDouble * (n - d).toDouble /
          (n.toDouble * n.toDouble * (n - 1).toDouble)).toLong
      }
    }
    assert(got._1 == n1tot && got._2 == n2tot)
    assert(got._3 == o1 && got._4 == o2)
    assert(got._5 == e1, s"e1_micro ${got._5} != $e1")
    assert(got._6 == v, s"v_micro ${got._6} != $v")
  }

  test("permutationTest: zero observed diff → p = 1; planted effect → p ~ 0") {
    def ev(u: Long, v: Double) =
      (u, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "view", v)
    // mirrored spend: users 2k / 2k+1 spend identically → observed diff 0,
    // every permuted |diff| ≥ 0 → n_ge = B exactly
    val mirrored = (0L until 40L).map(u => ev(u, 1.0 + (u / 2).toDouble))
      .toDF("user_id", "ts", "event_type", "value")
    val m = EventsOps.permutationTest(mirrored, b = 100)
      .as[(Long, Long, Long, String, String, Long, String)].head()
    assert(m._1 == 20 && m._2 == 20)
    assert(m._6 == 100, s"n_ge=${m._6}")
    assert(m._7 == "1.0000")

    // maximal separation: even users spend 100.00, odd users 0.01 — no
    // md5 permutation reproduces the perfect split
    val planted = (0L until 40L).map(u =>
      ev(u, if (u % 2 == 0) 100.0 else 0.01))
      .toDF("user_id", "ts", "event_type", "value")
    val p = EventsOps.permutationTest(planted, b = 100)
      .as[(Long, Long, Long, String, String, Long, String)].head()
    assert(p._4 == "100.0000" && p._5 == "0.0100")
    assert(p._6 == 0, s"n_ge=${p._6}")
    // determinism: bit-identical on re-run
    val p2 = EventsOps.permutationTest(planted, b = 100)
      .as[(Long, Long, Long, String, String, Long, String)].head()
    assert(p == p2)
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
