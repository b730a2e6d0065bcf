package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-7 event-analytics additions: hourly gap fill with
  * linear interpolation (q115), freshness-decayed scoring (q116), and the
  * behavioral Markov transition matrix (q119).
  */
class EventsAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000L // one hour of millis
  private def hr(h: Int) = new Timestamp(1704067200000L + h * H) // 2024-01-01 UTC

  private def gapDf(rows: Seq[(Long, Timestamp, Double)]) =
    rows.toDF("user_id", "ts", "value")

  test("gap fill: interior gaps interpolate linearly, edges are observed") {
    val out = EventsOps.gapFillHourly(gapDf(Seq(
        (1L, hr(0), 10.0), (1L, hr(3), 40.0))))
      .orderBy("hour")
      .select(col("filled"), col("is_interpolated"))
      .as[(Double, Int)].collect()
    assert(out.toSeq == Seq((10.0, 0), (20.0, 1), (30.0, 1), (40.0, 0)))
  }

  test("gap fill: same-hour events aggregate before filling") {
    val out = EventsOps.gapFillHourly(gapDf(Seq(
        (1L, hr(0), 1.0), (1L, new Timestamp(hr(0).getTime + 60000L), 2.0),
        (1L, hr(2), 9.0))))
      .orderBy("hour").select(col("filled"), col("is_interpolated"))
      .as[(Double, Int)].collect()
    assert(out.toSeq == Seq((3.0, 0), (6.0, 1), (9.0, 0)))
  }

  test("gap fill: a single active hour yields one observed row; users are independent") {
    val out = EventsOps.gapFillHourly(gapDf(Seq(
        (1L, hr(5), 7.0),
        (2L, hr(0), 1.0), (2L, hr(1), 2.0))))
      .orderBy("user_id", "hour")
      .select(col("user_id"), col("filled"), col("is_interpolated"))
      .as[(Long, Double, Int)].collect()
    assert(out.toSeq == Seq((1L, 7.0, 0), (2L, 1.0, 0), (2L, 2.0, 0)))
  }

  test("decayed score: weight halves per whole day of age, newest event is weight 1") {
    val day = 86400000L
    val t0 = new Timestamp(1704067200000L)
    val rows = Seq(
      (1L, t0, 8.0),                                 // age 2 days → wt 1/4
      (1L, new Timestamp(t0.getTime + day), 8.0),    // age 1 day  → wt 1/2
      (1L, new Timestamp(t0.getTime + 2 * day), 8.0) // age 0      → wt 1
    ).toDF("user_id", "ts", "value")
    val got = EventsOps.decayedScore(rows)
      .select(col("decayed_score"), col("n_events")).as[(Double, Long)].head()
    assert(got == ((8.0 / 4 + 8.0 / 2 + 8.0, 3L)))
  }

  test("decayed score: partial-day ages floor to the day bucket (integer div)") {
    val t0 = new Timestamp(1704067200000L)
    val rows = Seq(
      (1L, t0, 4.0), // age 1.5 days → floor 1 → wt 1/2
      (1L, new Timestamp(t0.getTime + 129600000L), 4.0) // newest, wt 1
    ).toDF("user_id", "ts", "value")
    val got = EventsOps.decayedScore(rows)
      .select(col("decayed_score")).as[Double].head()
    assert(got == 4.0 / 2 + 4.0)
  }

  test("markov: transitions follow each user's own order; probabilities normalize per from-state") {
    val rows = Seq(
      (1L, 1L, hr(0), "a"), (1L, 2L, hr(1), "b"),
      (1L, 3L, hr(2), "a"), (1L, 4L, hr(3), "b"),
      (2L, 5L, hr(0), "b"), (2L, 6L, hr(1), "c")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventsOps.markovTransitions(rows)
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 1.0)),   // both a's were followed by b
      ("b", "a") -> ((1L, 0.5)),   // user 1's first b → a
      ("b", "c") -> ((1L, 0.5)))) // user 2's b → c; no cross-user a→b edge
  }

  test("trending spikes: a burst over a varied baseline is flagged; thin or absent baselines are not") {
    // type 'a': hours 0..23 alternate 1 and 3 events (mean 2, σ≈1.02),
    // hour 24 bursts to 50 → z≈47 → spike. Early hours lack 12 baseline
    // rows → zscore null, no spike.
    val a = (0 until 24).flatMap { h =>
      val reps = if (h % 2 == 0) 1 else 3
      (0 until reps).map(i => (1L, new Timestamp(hr(h).getTime + i * 1000L), "a"))
    } ++ (0 until 50).map(i => (1L, new Timestamp(hr(24).getTime + i * 1000L), "a"))
    // type 'b': active hours 0..11 then one far-away burst at hour 40 —
    // the RANGE frame sees zero baseline hours there (gap), so no spike.
    val b = (0 until 12).map(h => (2L, hr(h), "b")) ++
      (0 until 99).map(i => (2L, new Timestamp(hr(40).getTime + i * 1000L), "b"))
    val got = EventsOps.trendingSpikes((a ++ b).toDF("user_id", "ts", "event_type"))
      .select(col("event_type"), col("hour"), col("n"), col("zscore"), col("is_spike"))
      .as[(String, Timestamp, Long, Option[Double], Int)].collect()
      .map(r => (r._1, r._2.getTime / 3600000L % 100000) -> ((r._3, r._4, r._5))).toMap
    val h0 = hr(0).getTime / 3600000L % 100000
    val spike = got(("a", h0 + 24))
    assert(spike._1 == 50L && spike._3 == 1, s"burst hour should flag: $spike")
    assert(spike._2.exists(z => z > 40), s"z should be huge: $spike")
    assert(got(("a", h0 + 5)) == ((3L, None, 0)), "thin baseline → no z, no spike")
    assert(got(("b", h0 + 40))._2.isEmpty, "gap-isolated burst has no baseline")
    assert(got(("b", h0 + 40))._3 == 0)
  }

  test("association rules: hand-computed support, confidence, lift; same-day duplicates collapse") {
    val day = hr(0)
    val rows = Seq(
      (1L, day, "a"), (1L, day, "b"), (1L, day, "a"), // dup 'a' collapses
      (2L, day, "a"), (2L, day, "b"),
      (3L, day, "a")
    ).toDF("user_id", "ts", "event_type")
    val got = EventsOps.associationRules(rows)
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        col("support"), col("confidence"), col("lift"))
      .as[(String, String, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // 3 baskets; n(a)=3, n(b)=2, n(a,b)=2
    val ab = got(("a", "b"))
    assert(ab._1 == 2L && ab._2 == 2.0 / 3 && ab._3 == 2.0 / 3)
    assert(ab._4 == (2.0 / 3) / (2.0 / 3.0))
    val ba = got(("b", "a"))
    assert(ba._1 == 2L && ba._3 == 1.0 && ba._4 == 1.0 / (3.0 / 3.0))
  }

  test("attribution: last strict-preceding touch within horizon wins; ties break on event_id") {
    def at(sec: Int) = new Timestamp(hr(0).getTime + sec * 1000L)
    val rows = Seq(
      // u1: view@0, click@10, purchase@20 → click (most recent) gets 5.0
      (1L, 1L, at(0), "view", 0.0),
      (1L, 2L, at(10), "click", 0.0),
      (1L, 3L, at(20), "purchase", 5.0),
      // u2: touch 40 min before purchase → outside 30-min horizon
      (2L, 4L, at(0), "view", 0.0),
      (2L, 5L, at(2400), "purchase", 7.0),
      // u3: two touches at the SAME ts → higher event_id (click) wins;
      // the later view is AFTER the purchase and must not count
      (3L, 6L, at(0), "view", 0.0),
      (3L, 7L, at(0), "click", 0.0),
      (3L, 8L, at(5), "purchase", 11.0),
      (3L, 9L, at(10), "view", 0.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = EventsOps.lastTouchAttribution(rows)
      .select(col("touch_type"), col("n_purchases"), col("revenue"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "click" -> ((2L, 16.0)), // u1's 5.0 + u3's 11.0
      "unattributed" -> ((1L, 7.0))))
  }

  test("rolling active users: WAU window covers the trailing 7 days, distinct per window") {
    val d = 86400000L
    def day(n: Int, u: Long) = (u, new Timestamp(hr(0).getTime + n * d))
    // u1 active days 0 and 3 (twice); u2 active day 3 only
    val rows = Seq(day(0, 1L), day(3, 1L), day(3, 1L), day(3, 2L))
      .toDF("user_id", "ts")
    val got = EventsOps.rollingActiveUsers(rows)
      .select(date_format(col("day"), "d").cast("int"), col("dau"),
        col("wau7"), col("stickiness"))
      .as[(Int, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // day 1 (Jan 1): dau {u1}=1; window [day-6, day] sees only u1
    assert(got(1) == ((1L, 1L, 1.0)))
    // day 4 (Jan 4): dau {u1,u2}=2; trailing window also sees day-1 u1 →
    // still 2 DISTINCT users; u1's double activity on day 3 collapses
    assert(got(4) == ((2L, 2L, 1.0)))
    assert(got.size == 2, "only observed days are reported")
  }

  test("markov: per-from probabilities sum to 1") {
    val rows = (0L until 60L).map(i =>
        (i % 5, i, hr(i.toInt), Seq("a", "b", "c")((i % 3).toInt)))
      .toDF("user_id", "event_id", "ts", "event_type")
    val sums = EventsOps.markovTransitions(rows)
      .groupBy("from_type").agg(sum("p").as("s"))
      .select("s").as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("rollingDistinctSketched: exact WAU column matches brute force; gate holds") {
    // 3 users across 3 days; day d's 7-day window covers days d-6..d
    val days = Seq(
      (1L, new Timestamp(1704067200000L)),                 // u1 day0
      (2L, new Timestamp(1704067200000L + 86400000L)),     // u2 day1
      (1L, new Timestamp(1704067200000L + 2 * 86400000L)), // u1 day2
      (3L, new Timestamp(1704067200000L + 2 * 86400000L))  // u3 day2
    ).toDF("user_id", "ts")
    val got = EventsOps.rollingDistinctSketched(days)
      .select(col("win_day").cast("string"), col("wau_exact"), col("ok_est"))
      .as[(String, Long, Boolean)].collect().sortBy(_._1)
    // windows ending day0: {u1}=1; day1: {u1,u2}=2; day2: all three = 3
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L)), got.toSeq)
    // HLL is exact at tiny cardinalities - the gate must hold
    assert(got.forall(_._3), got.toSeq)
  }

  test("decomposeHourly: pure 24h-periodic series has flat trend and zero residual") {
    // 72 hours of period-24 pattern: n = 10 + (hour % 24 == 0 ? 24 : 0)
    // every full 25-window sums to 10*25 + 24 -> constant trend
    val rows = (0 until 72).flatMap { h =>
      val n = if (h % 24 == 0) 34 else 10
      (0 until n).map(i => (h.toLong * 1000 + i, new Timestamp(1704067200000L + h * H)))
    }.toDF("event_id", "ts")
    val got = EventsOps.decomposeHourly(rows)
      .select(col("n"), col("trend"), col("seasonal"), col("resid"))
      .as[(Long, Option[Double], Double, Option[Double])].collect()
    val interior = got.filter(_._2.isDefined)
    assert(interior.nonEmpty)
    // a 25-hour window over a 24-hour cycle holds one spike or two:
    // trend is (250+24)/25 or (250+48)/25, nothing else
    assert(interior.forall(r => r._2.contains(274.0 / 25.0) ||
      r._2.contains(298.0 / 25.0)), interior.take(3).toSeq)
    // residual identically zero on the interior
    assert(interior.forall(_._4.contains(0.0)), interior.take(3).toSeq)
    // seasonal: spike hour carries +24*24/25/... sum of seasonals over a day = 0
    val seasonalByN = got.map(r => r._1 -> r._3).distinct.toMap
    assert(seasonalByN(34L) > 20.0 && seasonalByN(10L) < 0.0)
  }

  test("hourlyAutocorr: perfect period-24 series scores r = 1 at lag 24") {
    val rows = (0 until 96).flatMap { h =>
      val n = 5 + (h % 24)  // sawtooth with period 24
      (0 until n).map(i => (h.toLong * 1000 + i, new Timestamp(1704067200000L + h * H)))
    }.toDF("event_id", "ts")
    val r = EventsOps.hourlyAutocorr(rows, Seq(24))
      .select(col("r")).as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12, s"got $r")
  }

  test("conversionLatency: hand-built funnel latencies") {
    // u1 converts in 3600s; u2 has purchase BEFORE view -> not converted
    val rows = Seq(
      (1L, 1L, hr(0), "view"), (1L, 2L, hr(1), "click"),
      (1L, 3L, new Timestamp(1704067200000L + 3600000L), "purchase"),
      (2L, 4L, hr(2), "purchase"), (2L, 5L, hr(3), "view")
    ).map(r => (r._1, r._2, r._3, r._4, 0.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = EventsOps.conversionLatency(rows, Seq("view", "purchase"))
      .select(col("n_converted"), col("p50_s"), col("p90_s"))
      .as[(Long, Double, Double)].head()
    assert(got == ((1L, 3600.0, 3600.0)), s"got $got")
  }

  test("interArrival: regular schedule scores cv2 = 0; bursty pattern scores high") {
    // u1: events every hour exactly -> all gaps equal -> cv2 0
    val regular = (0 until 10).map(i => (1L, i.toLong, new Timestamp(1704067200000L + i * H)))
    // u2: 9 events in one minute, then one 9 hours later (bursty)
    val bursty = (0 until 9).map(i => (2L, 100L + i, new Timestamp(1704067200000L + i * 6000L))) :+
      ((2L, 200L, new Timestamp(1704067200000L + 9 * H)))
    val df = (regular ++ bursty).toDF("user_id", "event_id", "ts")
    val got = EventsOps.interArrival(df)
      .select(col("user_id"), col("n_gaps"), col("cv2_e4"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((9L, 0L)), s"got $got")
    assert(got(2L)._2 > 30000L, s"bursty cv2 too low: $got") // cv2 >> 1 (e4 units)
  }

  test("bounceRate: single-event sessions bounce, multi-event do not; split by start day") {
    val rows = Seq(
      // u1 day 1: a 2-event session (no bounce)
      (1L, 1L, hr(0)), (1L, 2L, hr(0)),
      // u1 later day 1: isolated event (bounce) - 31+ min after
      (1L, 3L, new Timestamp(1704067200000L + 2 * H)),
      // u2 day 2: one isolated event (bounce)
      (2L, 4L, new Timestamp(1704067200000L + 26 * H))
    ).map(r => (r._1, r._2, r._3, "view", 0.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = EventsOps.bounceRate(rows)
      .select(col("day").cast("string"), col("n_sessions"), col("n_bounce"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map("2024-01-01" -> ((2L, 1L)), "2024-01-02" -> ((1L, 1L))),
      s"got $got")
  }

  /** Reference Holt fold (α = β = 1/2, floor halving) for bit parity. */
  private def holtRef(xs: Seq[Long]): Seq[(Long, Long)] =
    xs.foldLeft(Vector.empty[(Long, Long)]) { (acc, x) =>
      if (acc.isEmpty) acc :+ ((x, 0L))
      else {
        val (l0, b0) = acc.last
        val l = Math.floorDiv(l0 + b0 + x, 2)
        val b = Math.floorDiv(b0 + (l - l0), 2)
        acc :+ ((l, b))
      }
    }

  test("holtHourly: bit parity with the sequential fold, incl. negative trends") {
    // rise then crash: the downswing drives the trend negative, which is
    // exactly where truncating vs flooring division would diverge
    val counts = Seq(5L, 20L, 40L, 65L, 90L, 60L, 25L, 10L, 3L, 1L)
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      (1L to c).map(i => (i, hr(h), "load"))
    }.toDF("user_id", "ts", "event_type")
    val got = EventsOps.holtHourly(rows)
      .orderBy("hr").select(col("cnt"), col("level"), col("trend"),
        col("forecast"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = holtRef(counts)
    assert(got.map(_._1) == counts)
    got.zip(want).foreach { case ((_, l, b, f), (wl, wb)) =>
      assert(l == wl && b == wb && f == wl + wb,
        s"got ${got.map(r => (r._2, r._3))} want $want")
    }
    assert(got.exists(_._3 < 0), "fixture must exercise a negative trend")
  }

  test("crossCorrHourly: recovers a planted 2-hour lead at the argmax lag") {
    // view counts vary; click at hour h replays view's count from h-2
    val viewCounts = Seq(3L, 14L, 9L, 2L, 13L, 5L, 8L, 15L, 4L, 11L,
      6L, 12L, 7L, 10L, 2L, 9L)
    val rows = viewCounts.zipWithIndex.flatMap { case (c, h) =>
      (1L to c).map(i => (i, hr(h), "view")) ++
        (if (h >= 2) (1L to viewCounts(h - 2)).map(i => (i, hr(h), "click"))
         else Nil)
    }.toDF("user_id", "ts", "event_type")
    val r = EventsOps.crossCorrHourly(rows, "click", "view",
        Seq(-2, -1, 0, 1, 2))
      .select(col("lag"), col("r")).as[(Int, Double)].collect().toMap
    // click at t equals view at t-2: perfect correlation at lag +2,
    // and the argmax over lags is unique there
    assert(math.abs(r(2) - 1.0) < 1e-9, s"planted lag must peak: $r")
    assert(r.maxBy(_._2)._1 == 2, s"argmax wrong: $r")
    r.filter(_._1 != 2).values.foreach(v => assert(v < 0.95, s"peak not unique: $r"))
  }

  test("holtHourly: trend converges to the slope of a linear ramp") {
    val counts = (1 to 30).map(t => 10L * t)
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      (1L to c).map(i => (i, hr(h), "ramp"))
    }.toDF("user_id", "ts", "event_type")
    val last = EventsOps.holtHourly(rows).orderBy("hr")
      .select(col("trend")).as[Long].collect().last
    // integer halving quantizes; the smoothed trend must sit at the slope
    assert(math.abs(last - 10L) <= 2, s"trend $last far from slope 10")
  }
}
