package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 operator laws: two-covariate Cox regression. */
class StatTestsR13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one user = two events: a start marker at t0 and either a purchase at
  // t0+dur (event) or a view at t0+dur (censored)
  private def mkEvents(users: Seq[(Long, Long, Boolean)]) = {
    val t0 = 1700000000000L
    users.flatMap { case (uid, durHr, ev) =>
      Seq((uid, new Timestamp(t0), uid * 2, "view"),
        (uid, new Timestamp(t0 + durHr * 3600000L), uid * 2 + 1,
          if (ev) "purchase" else "click"))
    }.toDF("user_id", "ts", "event_id", "event_type")
  }

  test("coxTwoCovariates: singular guard + binary-model agreement") {
    // planted: even users (x1=0 under u%2) die late, odd users die early
    val rnd = new scala.util.Random(327)
    val users = (0L until 240L).map { u =>
      val base = if (u % 2 == 1) 20 else 60
      (u, (base + rnd.nextInt(40)).toLong, rnd.nextInt(10) > 1)
    }
    val ev = mkEvents(users)
    // a CONSTANT x2 makes the information matrix singular: the det > 0
    // guard must freeze Newton at beta = 0 rather than divide by zero
    val frozen = EventsOps.coxTwoCovariates(ev, "purchase",
      u => pmod(u, lit(2L)), _ => lit(0L))
      .select("beta1_e6", "beta2_e6").head()
    assert(frozen.getLong(0) == 0L && frozen.getLong(1) == 0L,
      frozen.toString)
    // an independent, effect-free x2 (u%3, balanced across arms): beta1
    // tracks the binary model's estimate and beta2 stays near zero
    val two = EventsOps.coxTwoCovariates(ev, "purchase",
      u => pmod(u, lit(2L)), u => pmod(u, lit(3L)))
      .select("beta1_e6", "beta2_e6").head()
    val bin = EventsOps.coxBinary(ev, "purchase")
      .select("beta_e6").head().getLong(0)
    assert(math.abs(two.getLong(0) - bin) < 100000L,
      s"beta1 ${two.getLong(0)} vs binary $bin")
    assert(math.abs(two.getLong(1)) < 150000L, two.toString)
  }

  test("coxTwoCovariates: planted independent hazards are both recovered") {
    // deterministic exponential-ish durations: hazard multiplier
    // e^{0.9·x1 − 0.6·x2}; duration = round(-ln(q)/λ) on a fixed unit
    // grid of quantiles per cell, so each (x1, x2) cell carries its
    // exact scaled duration profile
    val users = (0L until 1200L).flatMap { i =>
      val x1 = i % 2; val x2 = i % 3
      val lam = math.exp(0.9 * x1 - 0.6 * x2) / 50.0
      val q = ((i / 6) % 100 + 1).toDouble / 101.0
      val dur = math.max(1L, math.round(-math.log(q) / lam))
      Seq((i, dur, true))
    }
    val r = EventsOps.coxTwoCovariates(mkEvents(users), "purchase",
      u => pmod(u, lit(2L)), u => pmod(u, lit(3L)))
      .select("beta1_e6", "beta2_e6", "d_total").head()
    val b1 = r.getLong(0) / 1e6; val b2 = r.getLong(1) / 1e6
    assert(r.getLong(2) == 1200L)
    assert(math.abs(b1 - 0.9) < 0.15, s"beta1=$b1 want ~0.9")
    assert(math.abs(b2 - (-0.6)) < 0.15, s"beta2=$b2 want ~-0.6")
  }

  test("andersonDarling: positional-formula recompute on tie-free data, " +
      "identical samples ~0, separation blows up") {
    // tie-free: the distinct-value collapse IS Pettitt's positional form
    val xs = Seq(3L, 10L, 24L, 41L, 77L)
    val ys = Seq(6L, 15L, 33L, 58L)
    val df = (xs.map((_, true)) ++ ys.map((_, false)))
      .toDF("v", "is_a")
    val got = Profiling.andersonDarling(df, "v", col("is_a"))
      .select("a2").head().getDouble(0)
    val pooled = (xs.map((_, 1)) ++ ys.map((_, 0))).sortBy(_._1)
    val n = xs.size; val m = ys.size; val nn = n + m
    var num = 0L
    var mk = 0
    (0 until nn - 1).foreach { k =>
      mk += pooled(k)._2
      val diff = (mk.toLong * nn - (k + 1).toLong * n).toDouble
      num += math.floor(1e6 * 1.0 * diff * diff /
        ((k + 1).toLong * (nn - k - 1)).toDouble).toLong
    }
    val naive = num.toDouble / (n.toDouble * m.toDouble * 1e6)
    assert(got == naive, s"$got vs $naive")
    // same distribution on both sides: small; disjoint: large
    val same = (1L to 200L).flatMap(v => Seq((v, true), (v, false)))
      .toDF("v", "is_a")
    assert(Profiling.andersonDarling(same, "v", col("is_a"))
      .select("a2").head().getDouble(0) < 0.1)
    val apart = ((1L to 100L).map((_, true)) ++
      (1000L to 1099L).map((_, false))).toDF("v", "is_a")
    assert(Profiling.andersonDarling(apart, "v", col("is_a"))
      .select("a2").head().getDouble(0) > 10.0)
  }

  test("jarqueBera: symmetric data scores ~0 skew; planted skew detected") {
    // symmetric triangular-ish integers: g1 ~ 0, g2 < 3 (platykurtic)
    val sym = ((-50L to 50L) ++ (-25L to 25L)).map(v => ("g", v))
      .toDF("g", "v")
    val r = Profiling.jarqueBera(sym, "v", "g")
      .select("skew_g1", "kurt_g2", "jb").head()
    assert(math.abs(r.getDouble(0)) < 1e-9, r.toString)
    // one-sided tail: strong positive skew, JB far from 0
    val skewed = ((1L to 100L) ++ Seq.fill(5)(1000L)).map(v => ("g", v))
      .toDF("g", "v")
    val r2 = Profiling.jarqueBera(skewed, "v", "g")
      .select("skew_g1", "jb").head()
    assert(r2.getDouble(0) > 2.0 && r2.getDouble(1) > 100.0, r2.toString)
  }

  test("gridKde: masses match the naive integerized kernel sum") {
    val vs = Seq(100L, 100L, 250L, 900L)
    val df = vs.toDF("v")
    val got = Profiling.gridKde(df, "v", lo = 0L, step = 100L,
      points = 12, h = 150.0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until 12).foreach { i =>
      val g = i * 100L
      val naive = vs.groupBy(identity).map { case (v, g2) =>
        val z = (g.toDouble - v.toDouble) / 150.0
        g2.size.toLong * math.floor(1e9 * math.exp(-1.0 * z * z / 2.0)).toLong
      }.sum
      assert(got(i.toLong) == naive, s"grid $i")
    }
  }

  test("grubbsStatistic: planted outlier is found with the right deviate") {
    val vs = ((1L to 99L) :+ 10000L).map(v => ("g", v))
    val r = Profiling.grubbsStatistic(vs.toDF("g", "v"), "v", "g")
      .select("n", "g_micro", "v_at").head()
    assert(r.getLong(0) == 100L && r.getLong(2) == 10000L)
    val xs = vs.map(_._2.toDouble)
    val mean = xs.sum / xs.size
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1))
    assert(math.abs(r.getLong(1) / 1e6 - (10000.0 - mean) / sd) < 1e-3)
  }

  test("concordanceIndex via planted order: perfect predictor scores 1") {
    // users convert at hour = 100 - score*10: higher score ⇒ earlier
    // event count 2,32,62,92,122 → div-25 score 0..4; ≥2 events so every
    // user's own t0 is the filler, not the purchase (duration > 0)
    val users = (0L until 50L).map { u =>
      (u, 100L - (u % 5) * 10L, (u % 5) * 30 + 2)
    }
    val t0 = 1700000000000L
    val ev = users.flatMap { case (uid, hr, nev) =>
      // nev-1 filler views at t0 then the purchase at t0+hr
      (0L until (nev - 1)).map(k =>
        (uid, new Timestamp(t0 + k), uid * 1000 + k, "view")) :+
        ((uid, new Timestamp(t0 + hr * 3600000L), uid * 1000 + 999L,
          "purchase"))
    }.toDF("user_id", "ts", "event_id", "event_type")
    val r = EventsOps.concordanceIndex(ev, "purchase", scoreCap = 9)
      .select("n_usable", "n_concordant", "c_index").head()
    // 5 cohorts of 10 at distinct times: usable = C(5,2)*100 = 1000,
    // all concordant (higher score strictly earlier)
    assert(r.getLong(0) == 1000L && r.getLong(1) == 1000L, r.toString)
    assert(r.getString(2) == "1.0000", r.toString)
  }

  test("qiniCurve: hand-computed two-score fixture") {
    // score 1 (26+ events): treated convert 100%, control 0%
    // score 0: nobody converts
    val t0 = 1700000000000L
    def mk(uid: Long, nev: Long, convert: Boolean) =
      (0L until nev - 1).map(k =>
        (uid, new Timestamp(t0 + k), uid * 1000 + k, "view")) :+
        ((uid, new Timestamp(t0 + nev), uid * 1000 + 999L,
          if (convert) "purchase" else "click"))
    val ev = ((0L until 8L).flatMap(u => mk(u, 30, convert = u % 2 == 1)) ++
      (8L until 16L).flatMap(u => mk(u, 5, convert = false)))
      .toDF("user_id", "ts", "event_id", "event_type")
    val rows = EventsOps.qiniCurve(ev, "purchase", scoreCap = 9)
      .select("s", "n_t", "n_c", "conv_t", "conv_c", "qini_micro")
      .collect()
    assert(rows.length == 2)
    val top = rows(0)
    assert(top.getLong(0) == 1L && top.getLong(1) == 4L &&
      top.getLong(2) == 4L && top.getLong(3) == 4L &&
      top.getLong(4) == 0L && top.getLong(5) == 4000000L, top.toString)
    val all = rows(1)
    assert(all.getLong(1) == 8L && all.getLong(5) == 4000000L,
      all.toString)
  }

  test("edgeEmbeddedness: hand graph — bridge at 0, triangle edges at 1") {
    // K3 {1,2,3} plus a pendant bridge 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.edgeEmbeddedness(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 3L), got.toString)
  }

  test("logLoss: hand-computed fixtures, clip floor on perfect confidence") {
    // all-stopword text → s = 1000 → clipped 999; no-stopword → 1
    val docs = Seq(("the of and", "en"), ("zebra qux flux", "de"))
      .toDF("text", "lang")
    val r = MlEval.logLoss(docs, "lang = 'en'")
      .select("n", "n_pos", "logloss").head()
    // both rows contribute floor(1e6·ln(0.999)) = −1001
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getString(2) == "0.0010", r.toString)
    // half-stopword text, wrong label: ln(0.5) punished
    val mixed = Seq(("the zebra", "de")).toDF("text", "lang")
    val r2 = MlEval.logLoss(mixed, "lang = 'en'")
      .select("logloss").head().getString(0)
    // −floor(1e6·ln(1 − 0.5))/1e6 = 0.693148
    assert(r2 == "0.6931", r2)
  }

  test("ansariBradley: positional recompute tie-free; dispersion signal") {
    // spread A {1,100} vs concentrated B {40,60}: scores 1,2,2,1 —
    // A's mean score 1.0 sits below the even-N null (N+2)/4 = 1.5
    val df = Seq((1L, true), (100L, true), (40L, false), (60L, false))
      .toDF("v", "is_a")
    val r = Profiling.ansariBradley(df, "v", col("is_a"))
      .select("n_a", "n_b", "w_bar_micro", "e_bar_micro").head()
    assert(r.getLong(0) == 2L && r.getLong(2) == 1000000L &&
      r.getLong(3) == 1500000L, r.toString)
    // tie-free random sides: exact equality with the positional formula
    val rnd = new scala.util.Random(336)
    val vals = rnd.shuffle((1L to 400L).toList)
    val (as, bs) = vals.splitAt(150)
    val df2 = (as.map((_, true)) ++ bs.map((_, false))).toDF("v", "is_a")
    val got = Profiling.ansariBradley(df2, "v", col("is_a"))
      .select("w_bar_micro").head().getLong(0)
    val pooled = (as.map((_, 1)) ++ bs.map((_, 0))).sortBy(_._1)
    val n = pooled.size
    val w = pooled.zipWithIndex.collect { case ((_, 1), i) =>
      math.min(i + 1, n - i).toLong }.sum
    assert(got == w * 1000000L / as.size, s"$got vs ${w * 1000000L / as.size}")
    // identical distributions on both sides: mean score ≈ null
    val same = (1L to 200L).flatMap(v => Seq((v, true), (v, false)))
      .toDF("v", "is_a")
    val r3 = Profiling.ansariBradley(same, "v", col("is_a"))
      .select("w_bar_micro", "e_bar_micro").head()
    assert(math.abs(r3.getLong(0) - r3.getLong(1)) <
      r3.getLong(1) / 50, r3.toString)
  }

  test("plattScaling: gradient vanishes at the fit; slope tracks signal") {
    // texts with exact stopword fractions k/10; label more likely 'en'
    // at high fractions (deterministic pattern) ⇒ positive slope A
    def doc(k: Int) = (Seq.fill(k)("the") ++ Seq.fill(10 - k)("zzz"))
      .mkString(" ")
    val docs = (0 until 400).map { i =>
      val k = i % 11
      (doc(k), if (k >= 6 || (k >= 3 && i % 3 == 0)) "en" else "de")
    }.toDF("text", "lang")
    val r = MlEval.plattScaling(docs, "lang = 'en'")
      .select("n", "n_pos", "a_e6", "b_e6").head()
    val a = r.getLong(2) / 1e6; val b = r.getLong(3) / 1e6
    assert(a > 1.0, s"slope a=$a should be clearly positive")
    // recompute Platt's gradient at (a, b) from the raw histogram
    val nPos = r.getLong(1).toDouble; val nNeg = r.getLong(0) - nPos
    val tPos = (nPos + 1.0) / (nPos + 2.0); val tNeg = 1.0 / (nNeg + 2.0)
    val hist = (0 until 400).map { i =>
      val k = i % 11
      (k * 100L, if (k >= 6 || (k >= 3 && i % 3 == 0)) 1L else 0L)
    }.groupBy(identity).view.mapValues(_.size).toSeq
    var g1 = 0.0; var g2 = 0.0
    hist.foreach { case ((s, y), cnt) =>
      val x = s / 1000.0
      val p = 1.0 / (1.0 + math.exp(-(a * x + b)))
      val t = if (y == 1L) tPos else tNeg
      g1 += cnt * (p - t) * x; g2 += cnt * (p - t)
    }
    assert(math.abs(g1) < 0.01 && math.abs(g2) < 0.01, s"grad=($g1, $g2)")
    // no-signal labels: slope collapses toward zero
    val flat = (0 until 400).map { i =>
      (doc(i % 11), if (i % 4 == 0) "en" else "de") }.toDF("text", "lang")
    val a2 = MlEval.plattScaling(flat, "lang = 'en'")
      .select("a_e6").head().getLong(0) / 1e6
    assert(math.abs(a2) < 0.5, s"no-signal slope $a2")
  }

  test("mantelHaenszel: Simpson fixture — crude OR misleads, MH adjusts") {
    // activity confounds: low-activity users (stratum 0) rarely convert
    // and are mostly EXPOSED (odd ids); high-activity (stratum 3) mostly
    // convert and are mostly unexposed. Within every stratum exposure is
    // null (OR = 1), so MH must sit at ~1 while the crude OR is dragged
    // below it by the imbalance.
    val t0 = 1700000000000L
    def mk(uid: Long, nev: Long, convert: Boolean) =
      (0L until nev - 1).map(k =>
        (uid, new Timestamp(t0 + k), uid * 1000 + k, "view")) :+
        ((uid, new Timestamp(t0 + nev), uid * 1000 + 999L,
          if (convert) "purchase" else "click"))
    // stratum 0 (2 events): 40 exposed + 10 unexposed, 10% convert each
    val lo = (0L until 50L).map { i =>
      val uid = if (i < 40) 2 * i + 1 else 2 * i // 40 odd, 10 even
      (uid, 2L, i % 10 == 0)
    }
    // stratum 3 (200 events): 10 exposed + 40 unexposed, 80% convert
    val hi = (0L until 50L).map { i =>
      val uid = if (i < 10) 2000 + 2 * i + 1 else 2000 + 2 * i
      (uid, 200L, i % 5 != 0)
    }
    val ev = (lo ++ hi).flatMap { case (u, n, c) => mk(u, n, c) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = EventsOps.mantelHaenszel(ev, "purchase", band = 50L)
      .select("n_strata", "n_users", "or_mh", "or_crude").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 100L)
    val mh = r.getString(2).toDouble; val crude = r.getString(3).toDouble
    assert(math.abs(mh - 1.0) < 0.15, s"MH $mh should be ~1")
    assert(crude < 0.5, s"crude $crude should be dragged low")
  }

  test("coxTwoCovariates: score vanishes at the fitted point") {
    // recompute U(beta-hat) naively from the risk sets; Newton converged
    // means both score components are ~0
    val rnd = new scala.util.Random(99)
    val users = (0L until 300L).map { u =>
      (u, (10 + rnd.nextInt(80)).toLong, rnd.nextInt(5) > 0) }
    val ev = mkEvents(users)
    val r = EventsOps.coxTwoCovariates(ev, "purchase",
      u => pmod(u, lit(2L)), u => pmod(u, lit(3L)))
      .select("beta1_e6", "beta2_e6").head()
    val b1 = r.getLong(0) / 1e6; val b2 = r.getLong(1) / 1e6
    // naive: per user (x1, x2, t, ev); Breslow score over event times.
    // Censoring matches the operator: a user with no purchase is at risk
    // until the GLOBAL last event time (all t0 coincide here)
    val maxDur = users.map(_._2).max
    val rows = users.map { case (u, dur, evt) =>
      (u % 2, u % 3, if (evt) dur else maxDur, evt) }
    val times = rows.filter(_._4).map(_._3).distinct.sorted
    var u1 = 0.0; var u2 = 0.0
    times.foreach { t =>
      val risk = rows.filter(_._3 >= t)
      val deaths = rows.filter(x => x._4 && x._3 == t)
      val s0 = risk.map(x => math.exp(b1 * x._1 + b2 * x._2)).sum
      val s1 = risk.map(x => x._1 * math.exp(b1 * x._1 + b2 * x._2)).sum
      val s2 = risk.map(x => x._2 * math.exp(b1 * x._1 + b2 * x._2)).sum
      u1 += deaths.map(_._1).sum - deaths.size * s1 / s0
      u2 += deaths.map(_._2).sum - deaths.size * s2 / s0
    }
    assert(math.abs(u1) < 0.01 && math.abs(u2) < 0.01, s"U=($u1, $u2)")
  }
}
