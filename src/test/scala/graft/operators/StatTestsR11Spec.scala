package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 measurement-layer operators: nDCG, conformal-BH outliers,
  * McNemar, Cohen's d, Cliff's delta, Jaccard link prediction, harmonic
  * centrality, t-closeness, IPW ATE, Mann–Kendall. Each law test
  * recomputes the statistic naively (or from a closed form) on data
  * where the answer is forced. */
class StatTestsR11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d4(x: Double): String =
    new java.math.BigDecimal(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).toPlainString

  // ==== q269 nDCG ============================================================

  test("groupedNdcg: perfect ranking scores 1, a swap scores the hand value") {
    // group a: score order == relevance order -> dcg == idcg
    val a = Seq(("a", 30L, 1L, 3L), ("a", 20L, 2L, 2L), ("a", 10L, 3L, 0L))
    // group b: top item has rel 0, second has rel 3 -> dcg < idcg
    val b = Seq(("b", 30L, 1L, 0L), ("b", 20L, 2L, 3L))
    val df = (a ++ b).toDF("g", "score", "id", "r")
    val got = MlEval.groupedNdcg(df, "g", "score", "id", col("r"), k = 10)
      .select("g", "dcg_micro", "idcg_micro", "ndcg")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val w = MlEval.dcgWeights(10)
    assert(got("a")._2 == 3 * w(0) + 2 * w(1) && got("a")._4 == 1.0)
    assert(got("b")._2 == 3 * w(1) && got("b")._3 == 3 * w(0))
    assert(got("b")._4 == (3.0 * w(1)) / (3.0 * w(0)))
  }

  test("groupedNdcg: items past the cutoff contribute nothing") {
    val rows = (1L to 30L).map(i => ("g", 100L - i, i, 1L))
    val got = MlEval.groupedNdcg(rows.toDF("g", "score", "id", "r"),
      "g", "score", "id", col("r"), k = 10).head()
    // all rel equal: dcg == idcg == sum of the first 10 weights
    assert(got.getAs[Long]("dcg_micro") == MlEval.dcgWeights(10).sum)
    assert(got.getAs[Double]("ndcg") == 1.0)
  }

  // ==== q270 conformal BH ====================================================

  test("conformalBhOutliers: planted heavy tail is rejected, null data is not") {
    // calibration: values 1..400; test: 90 in-distribution + 10 planted at
    // 10_000 (p = 1/401 each -> BH at alpha=.1 must reject the planted set)
    val cal = (1L to 400L).map(v => (v, 1L))           // (value, id%4==3 tag)
    val testIn = (1L to 90L).map(i => (i * 4 % 397 + 1, 0L))
    val testOut = (1L to 10L).map(i => (10000L + i, 0L))
    val df = (cal.map { case (v, _) => (v, 3L) } ++
      (testIn ++ testOut).map { case (v, _) => (v, 0L) })
      .zipWithIndex.map { case ((v, m), i) => (i.toLong * 4 + m, v) }
      .toDF("doc_id", "n_chars")
    val got = MlEval.conformalBhOutliers(df, "n_chars",
      pmod(col("doc_id"), lit(4)) === 3, pmod(col("doc_id"), lit(4)) === 0)
      .head()
    assert(got.getAs[Long]("n_cal") == 400L && got.getAs[Long]("m") == 100L)
    // naive BH on collected p-values must agree exactly
    val calV = cal.map(_._1).sorted
    val testV = (testIn ++ testOut).map(_._1)
    val ps = testV.map(v => (1.0 + calV.count(_ >= v)) / 401.0).sorted
    val kStar = (1 to ps.size).filter(i => ps(i - 1) <= i * 0.1 / ps.size)
      .lastOption.getOrElse(0)
    assert(got.getAs[Long]("n_rejected") == kStar.toLong)
    assert(kStar >= 10, "the 10 planted outliers must be rejectable")
    // null data: test drawn from the calibration range -> nothing rejected
    val nullDf = (cal.map { case (v, _) => (v, 3L) } ++
      testIn.map { case (v, _) => (v, 0L) })
      .zipWithIndex.map { case ((v, m), i) => (i.toLong * 4 + m, v) }
      .toDF("doc_id", "n_chars")
    val got0 = MlEval.conformalBhOutliers(nullDf, "n_chars",
      pmod(col("doc_id"), lit(4)) === 3, pmod(col("doc_id"), lit(4)) === 0)
      .head()
    assert(got0.getAs[Long]("n_rejected") == 0L)
    assert(got0.isNullAt(got0.fieldIndex("thr_value")))
  }

  // ==== q290 conformal Holm ==================================================

  test("conformalHolmOutliers: step-down == naive Holm; FWER ⊆ FDR set") {
    // Holm needs the conformal p floor 1/(n_cal+1) below alpha/m, so the
    // calibration split is 2000 strong (p_floor = 1/2001 < 0.1/100)
    val cal = (1L to 2000L).map(v => (v % 400 + 1, 3L))
    val testIn = (1L to 90L).map(i => (i * 4 % 397 + 1, 0L))
    val testOut = (1L to 10L).map(i => (10000L + i, 0L))
    val df = (cal ++ testIn ++ testOut)
      .zipWithIndex.map { case ((v, m), i) => (i.toLong * 4 + m, v) }
      .toDF("doc_id", "n_chars")
    def run(f: (org.apache.spark.sql.DataFrame, String,
        org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.DataFrame) =
      f(df, "n_chars", pmod(col("doc_id"), lit(4)) === 3,
        pmod(col("doc_id"), lit(4)) === 0).head()
    val holm = run(MlEval.conformalHolmOutliers(_, _, _, _))
    val bh = run(MlEval.conformalBhOutliers(_, _, _, _))
    // naive Holm on collected p-values, tie groups all-or-none at their
    // max index (the operator's declared convention)
    val calV = cal.map(_._1)
    val nCal = calV.size
    val testV = (testIn ++ testOut).map(_._1)
    val ps = testV.map(v => 1L + calV.count(_ >= v)).sorted
    val m = testV.size
    var rejected = 0L
    val groups = ps.groupBy(identity).toSeq.sortBy(_._1)
    groups.iterator.takeWhile { case (p, _) =>
      val maxIdx = ps.count(_ <= p)
      p * 10L * (m - maxIdx + 1) <= 1L * (nCal + 1)
    }.foreach { case (p, _) => rejected = ps.count(_ <= p).toLong }
    assert(holm.getAs[Long]("n_rejected") == rejected)
    assert(rejected >= 10, "the planted outliers are Holm-rejectable")
    // Holm (FWER) can never reject more than BH (FDR) at the same level
    assert(holm.getAs[Long]("n_rejected") <= bh.getAs[Long]("n_rejected"))
  }

  // ==== q291 runs test =======================================================

  test("runsTest: alternating series maxes runs, blocked series minimizes") {
    val t0 = 1700000000000L
    def series(name: String, ys: Seq[Int]) = ys.zipWithIndex.flatMap {
      case (k, h) => Seq.fill(k)(
        (name, new java.sql.Timestamp(t0 + h * 3600000L))) }
    // alternating around median 15 -> every non-tied hour flips sign
    val alt = series("alt", (0 until 40).map(h => if (h % 2 == 0) 10 else 20))
    // blocked: 20 lows then 20 highs -> exactly 2 runs
    val blk = series("blk", (0 until 40).map(h => if (h < 20) 10 else 20))
    val got = Profiling.runsTest(
      (alt ++ blk).toDF("event_type", "ts"))
      .select("event_type", "n_above", "n_below", "runs", "z")
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("alt")._2 == 20L && got("alt")._3 == 20L)
    assert(got("alt")._4 == 40L, "alternating = max runs")
    assert(got("alt")._5.get > 3.0)
    assert(got("blk")._4 == 2L, "blocked = 2 runs")
    assert(got("blk")._5.get < -3.0)
    // z matches the closed form on the alternating series
    val (n1, n0, r) = (20.0, 20.0, 40.0)
    val mu = 2 * n1 * n0 / (n1 + n0) + 1
    val v = 2 * n1 * n0 * (2 * n1 * n0 - (n1 + n0)) /
      ((n1 + n0) * (n1 + n0) * (n1 + n0 - 1))
    assert(math.abs(got("alt")._5.get - (r - mu) / math.sqrt(v)) <= 1e-9)
  }

  // ==== q292 Pettitt =========================================================

  test("pettitt: locates a planted level shift; brute-force K on random data") {
    val t0 = 1700000000000L
    def series(name: String, ys: Seq[Int]) = ys.zipWithIndex.flatMap {
      case (k, h) => Seq.fill(k)(
        (name, new java.sql.Timestamp(t0 + h * 3600000L))) }
    // planted shift at hour 30 of 60: 10s then 30s
    val shift = series("shift",
      (0 until 60).map(h => if (h < 30) 10 else 30))
    val rnd = new scala.util.Random(171)
    val noisyYs = (0 until 50).map(_ => 5 + rnd.nextInt(10))
    val noisy = series("noisy", noisyYs)
    val got = Profiling.pettitt(
      (shift ++ noisy).toDF("event_type", "ts"))
      .select("event_type", "n_hours", "k_stat", "cp_hour")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // the changepoint estimate is the last pre-shift hour (U peaks there)
    assert(got("shift")._4 == t0 / 3600000L + 29,
      s"must locate the shift: ${got("shift")}")
    // brute-force K on the noisy series: U_t = 2W_t − t(n+1), midranks
    val n = noisyYs.size
    def r2(v: Int) = 2 * noisyYs.count(_ < v) + noisyYs.count(_ == v) + 1
    val us = (1 until n).map(t =>
      noisyYs.take(t).map(r2).sum.toLong - t.toLong * (n + 1))
    assert(got("noisy")._3 == us.map(math.abs).max)
  }

  // ==== q293 Friedman ========================================================

  test("friedman matches the textbook recomputation; identical columns ~0") {
    // 5 subjects x 3 treatments with a planted ordering t2 > t1 > t0
    val data = Seq(
      (1L, 1L, 3L, 5L), (2L, 2L, 4L, 6L), (3L, 1L, 2L, 9L),
      (4L, 3L, 3L, 7L), (5L, 2L, 5L, 5L))
    val rows = data.flatMap { case (u, a, b, c) =>
      (1L to a).map(_ => (u, 0)) ++ (1L to b).map(_ => (u, 1)) ++
        (1L to c).map(_ => (u, 2)) }
    val got = Profiling.friedman(rows.toDF("id", "j"), "id",
      Seq(when(col("j") === 0, 1L).otherwise(0L),
        when(col("j") === 1, 1L).otherwise(0L),
        when(col("j") === 2, 1L).otherwise(0L))).head()
    // doubled midranks per subject, textbook chi2
    def r2(xs: Seq[Long], j: Int) =
      2 * xs.count(_ < xs(j)) + xs.count(_ == xs(j)) + 1
    val triples = data.map(d => Seq(d._2, d._3, d._4))
    val rr = (0 until 3).map(j => triples.map(t => r2(t, j).toLong).sum)
    assert((0 until 3).map(j =>
      got.getAs[Long](s"r2_$j")) == rr)
    val n = 5.0
    val chi2 = 3.0 * rr.map(r => r.toDouble * r).sum / (n * 12.0) -
      3.0 * n * 4.0
    assert(math.abs(got.getAs[Double]("chi2") - chi2) <= 1e-9)
    // ties: subjects 4 (pair) and 5 (pair) contribute 6 each
    val corr = 1.0 - 12.0 / (n * 24.0)
    assert(math.abs(got.getAs[Double]("chi2_tie_corrected") - chi2 / corr)
      <= 1e-9)
    // identical treatments: all ranks tie -> chi2 == 0, correction null
    val same = (1L to 6L).flatMap(u => Seq((u, 0), (u, 1), (u, 2)))
    val g0 = Profiling.friedman(same.toDF("id", "j"), "id",
      Seq(when(col("j") === 0, 1L).otherwise(0L),
        when(col("j") === 1, 1L).otherwise(0L),
        when(col("j") === 2, 1L).otherwise(0L))).head()
    assert(g0.getAs[Double]("chi2") == 0.0)
    assert(g0.isNullAt(g0.fieldIndex("chi2_tie_corrected")))
  }

  // ==== q294 PACF ============================================================

  test("pacf == Levinson recomputation; AR(1) cuts off after lag 1") {
    val t0 = 1700000000000L
    // AR(1)-like integer series: y_t = (y_{t-1} * 3 + noise) / 4 + base
    val rnd = new scala.util.Random(181)
    val ys = Iterator.iterate(40)(y =>
      (y * 3 + 40 + rnd.nextInt(21)) / 4).take(120).toVector
    val rows = ys.zipWithIndex.flatMap { case (k, h) =>
      Seq.fill(k)(Tuple1(new java.sql.Timestamp(t0 + h * 3600000L))) }
    val got = EventsOps.pacf(rows.toDF("ts")).head()
    // recompute: exact centered covariances then the same recursion
    val n = ys.size.toLong
    val sy = ys.map(_.toLong).sum
    val z = ys.map(y => BigInt(n) * y - sy)
    def c(k: Int) = (k until ys.size).map(t => z(t) * z(t - k)).sum
    val r = (1 to 4).map(k => c(k).toDouble / c(0).toDouble)
    (1 to 4).foreach(k =>
      assert(math.abs(got.getAs[Double](s"r$k") - r(k - 1)) <= 1e-12))
    val p11 = r(0)
    val p22 = (r(1) - p11 * r(0)) / (1.0 - p11 * r(0))
    val p21 = p11 - p22 * p11
    val p33 = (r(2) - (p21 * r(1) + p22 * r(0))) /
      (1.0 - (p21 * r(0) + p22 * r(1)))
    val p31 = p21 - p33 * p22
    val p32 = p22 - p33 * p21
    val p44 = (r(3) - (p31 * r(2) + p32 * r(1) + p33 * r(0))) /
      (1.0 - (p31 * r(0) + p32 * r(1) + p33 * r(2)))
    assert(math.abs(got.getAs[Double]("pacf1") - p11) <= 1e-12)
    assert(math.abs(got.getAs[Double]("pacf2") - p22) <= 1e-12)
    assert(math.abs(got.getAs[Double]("pacf3") - p33) <= 1e-12)
    assert(math.abs(got.getAs[Double]("pacf4") - p44) <= 1e-12)
    // AR(1) signature: strong direct lag-1, higher partials near zero
    assert(p11 > 0.4, s"AR(1) must show lag-1 structure: $p11")
    assert(math.abs(p33) < 0.25 && math.abs(p44) < 0.25,
      s"higher partials must fade: $p33, $p44")
  }

  // ==== q295 Ljung–Box =======================================================

  test("ljungBox: Q from the closed form; AR series scores far above noise") {
    val t0 = 1700000000000L
    val rnd = new scala.util.Random(191)
    def rowsOf(ys: Seq[Int]) = ys.zipWithIndex.flatMap { case (k, h) =>
      Seq.fill(k)(Tuple1(new java.sql.Timestamp(t0 + h * 3600000L))) }
    val ar = Iterator.iterate(40)(y =>
      (y * 3 + 40 + rnd.nextInt(21)) / 4).take(120).toVector
    val got = EventsOps.ljungBox(rowsOf(ar).toDF("ts")).head()
    val n = ar.size.toDouble
    val q = n * (n + 2.0) * (1 to 4).map { k =>
      val r = got.getAs[Double](s"r$k"); r * r / (n - k) }.sum
    assert(math.abs(got.getAs[Double]("q_lb") - q) <= 1e-9)
    // a (deterministic) white-ish series scores far lower than the AR one
    val noise = (0 until 120).map(_ => 40 + rnd.nextInt(21))
    val q0 = EventsOps.ljungBox(rowsOf(noise).toDF("ts")).head()
      .getAs[Double]("q_lb")
    assert(got.getAs[Double]("q_lb") > 5 * q0,
      s"AR must dominate noise: ${got.getAs[Double]("q_lb")} vs $q0")
  }

  // ==== q296 balance report ==================================================

  test("balanceReport: planted imbalance flagged; degenerate covariate null") {
    val t0 = 1700000000000000L // micros
    val hour = 3600L * 1000000L
    // pre-period: arm 1 (odd users) averages 3x the events of arm 0,
    // with within-arm variance (u-dependent jitter) so SMD is defined;
    // event type is constant -> n_types is the degenerate (null) case
    val rows = (0 until 200).flatMap { u =>
      val pre = (if (u % 2 == 1) 9 else 3) + (u / 2) % 3
      (1 to pre).map(i =>
        (u.toLong, new java.sql.Timestamp((t0 + i * hour) / 1000),
          "view", 10.0)) :+
        ((u.toLong, new java.sql.Timestamp((t0 + 1000 * hour) / 1000),
          "view", 10.0))
    }
    val got = EventsOps.balanceReport(
      rows.toDF("user_id", "ts", "event_type", "value"))
      .select("covariate", "smd", "balanced")
      .collect().map { r =>
        r.getString(0) -> (Option(r.get(1)).map(_.toString.toDouble),
          Option(r.get(2)).map(_.toString.toBoolean)) }
      .toMap
    // 3x mean shift over sd ~0.8: |SMD| >> 0.1 -> flagged unbalanced
    assert(got("n_events")._1.exists(s => math.abs(s) > 2.0),
      s"planted 3x shift must show a large SMD: $got")
    assert(got("n_events")._2.contains(false))
    assert(got("value_cents")._2.contains(false),
      "cents track event counts: same imbalance")
    assert(got("n_types")._1.isEmpty && got("n_types")._2.isEmpty,
      "single event type: zero variance -> degenerate null")
  }

  // ==== q297 Cronbach's alpha ================================================

  test("cronbachAlpha: textbook recomputation; parallel items near 1") {
    // items = per-user counts of three tags
    val rnd = new scala.util.Random(211)
    val users = (1L to 80L).map { u =>
      val base = rnd.nextInt(10)
      (u, base + rnd.nextInt(3), base + rnd.nextInt(3), base + rnd.nextInt(3))
    }
    val rows = users.flatMap { case (u, a, b, c) =>
      (1 to a).map(_ => (u, "a")) ++ (1 to b).map(_ => (u, "b")) ++
        (1 to c).map(_ => (u, "c")) }
    val got = Profiling.cronbachAlpha(rows.toDF("id", "k"), "id",
      Seq(when(col("k") === "a", 1L).otherwise(0L),
        when(col("k") === "b", 1L).otherwise(0L),
        when(col("k") === "c", 1L).otherwise(0L))).head()
    def varU(xs: Seq[Long]) = {
      val m = xs.sum.toDouble / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val (ia, ib, ic) = (users.map(_._2.toLong), users.map(_._3.toLong),
      users.map(_._4.toLong))
    val totV = varU(users.map(u => (u._2 + u._3 + u._4).toLong))
    val alpha = 1.5 * (1.0 - (varU(ia) + varU(ib) + varU(ic)) / totV)
    assert(math.abs(got.getAs[Double]("alpha") - alpha) <= 1e-9)
    // a shared base with small noise -> high reliability
    assert(alpha > 0.6, s"parallel items must score high: $alpha")
    // independent items -> alpha near 0 (can be negative)
    val indep = (1L to 80L).flatMap { u =>
      (1 to rnd.nextInt(5) + 1).map(_ => (u, "a")) ++
        (1 to rnd.nextInt(5) + 1).map(_ => (u, "b")) ++
        (1 to rnd.nextInt(5) + 1).map(_ => (u, "c")) }
    val a0 = Profiling.cronbachAlpha(indep.toDF("id", "k"), "id",
      Seq(when(col("k") === "a", 1L).otherwise(0L),
        when(col("k") === "b", 1L).otherwise(0L),
        when(col("k") === "c", 1L).otherwise(0L))).head()
      .getAs[Double]("alpha")
    assert(a0 < 0.4, s"independent items must score low: $a0")
  }

  // ==== q298 ICC(1) ==========================================================

  test("icc1: textbook one-way ANOVA recomputation; agreement extremes") {
    val rnd = new scala.util.Random(223)
    val users = (1L to 60L).map { u =>
      val base = rnd.nextInt(12)
      (u, base + rnd.nextInt(2), base + rnd.nextInt(2), base + rnd.nextInt(2))
    }
    val rows = users.flatMap { case (u, a, b, c) =>
      (1 to a).map(_ => (u, "a")) ++ (1 to b).map(_ => (u, "b")) ++
        (1 to c).map(_ => (u, "c")) }
    val got = Profiling.icc1(rows.toDF("id", "k"), "id",
      Seq(when(col("k") === "a", 1L).otherwise(0L),
        when(col("k") === "b", 1L).otherwise(0L),
        when(col("k") === "c", 1L).otherwise(0L))).head()
    // textbook one-way ANOVA decomposition
    val xs = users.map(u => Seq(u._2.toDouble, u._3.toDouble, u._4.toDouble))
    val n = xs.size; val k = 3
    val grand = xs.flatten.sum / (n * k)
    val ssw = xs.map(g => g.map(x => math.pow(x - g.sum / k, 2)).sum).sum
    val ssb = xs.map(g => k * math.pow(g.sum / k - grand, 2)).sum
    val msw = ssw / (n * (k - 1)); val msb = ssb / (n - 1)
    val icc = (msb - msw) / (msb + (k - 1) * msw)
    assert(math.abs(got.getAs[Double]("icc1") - icc) <= 1e-9)
    assert(icc > 0.5, s"shared-base raters must agree: $icc")
    // perfect agreement: identical measurements -> ICC exactly 1
    val perfect = (1L to 40L).flatMap { u =>
      val v = (u % 7 + 1).toInt
      (1 to v).flatMap(_ => Seq((u, "a"), (u, "b"), (u, "c"))) }
    val g1 = Profiling.icc1(perfect.toDF("id", "k"), "id",
      Seq(when(col("k") === "a", 1L).otherwise(0L),
        when(col("k") === "b", 1L).otherwise(0L),
        when(col("k") === "c", 1L).otherwise(0L))).head()
    assert(g1.getAs[Double]("icc1") == 1.0)
  }

  // ==== q271 McNemar =========================================================

  test("mcnemar: hand-computed discordant counts and chi2") {
    // 10 subjects: 3 (1,1), 2 (0,0), 4 (1,0), 1 (0,1)
    val rows =
      (1 to 3).flatMap(i => Seq((s"s$i", "a"), (s"s$i", "b"))) ++
        (4 to 5).map(i => (s"s$i", "z")) ++
        (6 to 9).map(i => (s"s$i", "a")) ++
        Seq(("s10", "b"))
    val got = Profiling.mcnemar(rows.toDF("id", "k"), "id",
      col("k") === "a", col("k") === "b").head()
    assert(got.getAs[Long]("n_pairs") == 10L)
    assert(got.getAs[Long]("n_both") == 3L)
    assert(got.getAs[Long]("n_neither") == 2L)
    assert(got.getAs[Long]("b") == 4L && got.getAs[Long]("c") == 1L)
    // chi2 = (|4-1|-1)^2 / 5 = 4/5
    assert(got.getAs[Double]("chi2") == 0.8)
  }

  test("mcnemar: zero discordant pairs yields null chi2, not NaN") {
    val rows = Seq(("s1", "a"), ("s1", "b"), ("s2", "z"))
    val got = Profiling.mcnemar(rows.toDF("id", "k"), "id",
      col("k") === "a", col("k") === "b").head()
    assert(got.getAs[Long]("b") == 0L && got.getAs[Long]("c") == 0L)
    assert(got.isNullAt(got.fieldIndex("chi2")))
  }

  // ==== q272 Cohen's d / Hedges' g ===========================================

  test("cohensD matches the closed form on a hand-built two-group set") {
    val arm0 = Seq(100L, 200L, 300L)
    val arm1 = Seq(300L, 400L, 500L, 600L)
    val rows = arm0.map(v => ("g", v, 1L)) ++ arm1.map(v => ("g", v, 2L))
    val got = Profiling.cohensD(rows.toDF("g", "x", "k"),
      "g", "x", "k % 2 = 0").head()
    def mean(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    def varU(xs: Seq[Long]) = {
      val m = mean(xs)
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val sp2 = ((arm0.size - 1) * varU(arm0) + (arm1.size - 1) * varU(arm1)) /
      (arm0.size + arm1.size - 2).toDouble
    val d = (mean(arm1) - mean(arm0)) / math.sqrt(sp2)
    val g = d * (1.0 - 3.0 / (4.0 * (arm0.size + arm1.size) - 9.0))
    assert(got.getAs[Long]("n0") == 3L && got.getAs[Long]("n1") == 4L)
    assert(math.abs(got.getAs[Double]("d") - d) <= 1e-9)
    assert(math.abs(got.getAs[Double]("g") - g) <= 1e-9)
  }

  // ==== q273 Cliff's delta ===================================================

  test("cliffsDelta == brute-force pair count; disjoint groups hit ±1") {
    val rnd = new scala.util.Random(111)
    val rows = (1 to 800).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextBoolean()))
    val got = Profiling.cliffsDelta(
      rows.toDF("v", "isA"), "v", col("isA")).head()
    val a = rows.filter(_._2).map(_._1)
    val b = rows.filterNot(_._2).map(_._1)
    val gt = a.map(x => b.count(x > _).toLong).sum
    val lt = a.map(x => b.count(x < _).toLong).sum
    assert(got.getAs[Long]("gt_pairs") == gt)
    assert(got.getAs[Long]("lt_pairs") == lt)
    assert(got.getAs[Double]("delta") ==
      (gt - lt).toDouble / (a.size.toLong * b.size))
    // complete dominance: every A above every B
    val dom = Seq((10L, true), (11L, true), (1L, false), (2L, false))
    val g2 = Profiling.cliffsDelta(dom.toDF("v", "isA"), "v", col("isA"))
      .head()
    assert(g2.getAs[Double]("delta") == 1.0)
  }

  // ==== q274 Jaccard links ===================================================

  test("jaccardLinks: exact scores on a hand bipartite graph; hub capped") {
    // buyers: c1 {p1,p2}, c2 {p1,p2}, c3 {p1,p3}; hub c4 buys everything
    val base = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L),
      (3L, 3L))
    val hub = (1L to 10L).map(p => (4L, p))
    val got = Graph.jaccardLinks(
      (base ++ hub).toDF("c", "p"), maxDeg = 5, k = 10)
      .select("p1", "p2", "common", "union_sz", "jacc_micro")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // hub dropped: degrees count kept buyers only
    // deg(p1)=3, deg(p2)=2, deg(p3)=1
    assert(got((1L, 2L))._3 == 2L && got((1L, 2L))._4 == 3L)
    assert(got((1L, 2L))._5 == 2000000L / 3L)
    assert(got((1L, 3L))._3 == 1L && got((1L, 3L))._4 == 3L)
    assert(!got.contains((2L, 3L)), "no shared kept buyer -> no pair")
  }

  // ==== q277 harmonic centrality =============================================

  test("harmonicCentrality: hand values on the 4-path") {
    // path 1-2-3-4 (symmetric)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.harmonicCentrality(edges)
      .select("node", "h_micro").as[(Long, Long)].collect().toMap
    // node 1: d=1 to {2}, d=2 to {3} -> 1 + 1/2
    assert(got(1L) == 1500000L && got(4L) == 1500000L)
    // node 2: d=1 to {1,3}, d=2 to {4} -> 2 + 1/2
    assert(got(2L) == 2500000L && got(3L) == 2500000L)
  }

  // ==== q275 t-closeness =====================================================

  test("tCloseness: a class mirroring the table scores 0; a point mass is far") {
    // global: buckets 0..3 uniform; class A mirrors it exactly, class B
    // concentrates on bucket 0
    val a = (0 to 3).flatMap(b => Seq.fill(10)(("A", b.toLong)))
    val bRows = Seq.fill(40)(("B", 0L))
    // keep the GLOBAL uniform: add a balancing class C
    val c = (0 to 3).flatMap(b => Seq.fill(10)(("C", b.toLong)))
      .map { case (g, v) => (g, (3 - v)) } // same uniform multiset
    val df = (a ++ bRows ++ c).toDF("g", "b")
    val got = Profiling.tCloseness(df, Seq("g"), "b", m = 4)
      .select("g", "t_emd").as[(String, Double)].collect().toMap
    // global counts: b0 = 10+40+10 = 60, b1 = 20, b2 = 20, b3 = 20; N=120
    // class A cum fracs (1/4, 2/4, 3/4) vs global (1/2, 8/12, 10/12)
    val gl = Seq(60L, 20L, 20L)
    val cumG = gl.scanLeft(0L)(_ + _).tail
    def emd(cls: Seq[Long], n: Long): Double = {
      val cum = cls.scanLeft(0L)(_ + _).tail
      cum.zip(cumG).map { case (cc, cg) =>
        math.abs(cc * 120L - cg * n).toDouble }.sum / (n * 120.0 * 3.0)
    }
    assert(d4(got("A")) == d4(emd(Seq(10L, 10L, 10L), 40L)))
    assert(d4(got("B")) == d4(emd(Seq(40L, 0L, 0L), 40L)))
    assert(got("B") > got("A"))
  }

  // ==== q276 IPW ATE =========================================================

  test("ipwAte: recovers a planted effect under confounded assignment") {
    // covariate bin == pre-period activity drives BOTH assignment density
    // and baseline outcome; within every bin treated = control + 300
    // cents, so the true ATE is 3.00 currency units. Naive diff is
    // confounded; IPW must land on the planted effect.
    val ts0 = 1700000000000000L // micros
    val hour = 3600L * 1000000L
    // users: id parity = treatment (the operator's assignment rule)
    val rows = (0 until 400).flatMap { u =>
      val t = u % 2
      val heavy = (u / 2) % 4 == 0 // 1/4 of each arm is heavy
      val pre = if (heavy) 5 else 1
      val base = if (heavy) 2000 else 500
      val y = base + (if (t == 1) 300 else 0)
      // pre-period events (count = covariate), one post-period event
      // carrying the outcome value
      (1 to pre).map(i =>
        (u.toLong, new java.sql.Timestamp((ts0 + i * hour) / 1000), 0.0)) :+
        ((u.toLong,
          new java.sql.Timestamp((ts0 + 1000 * hour) / 1000), y / 100.0))
    }
    val events = rows.toDF("user_id", "ts", "value")
    val got = EventsOps.ipwAte(events).head()
    assert(got.getAs[Long]("n_treated") == 200L)
    assert(got.getAs[Long]("n_control") == 200L)
    assert(got.getAs[Long]("n_bins_trimmed") == 0L)
    assert(math.abs(got.getAs[String]("ate").toDouble - 3.0) <= 1e-3,
      s"IPW must recover the planted +3.00: ${got}")
  }

  // ==== q280/q281 ANOVA F + Levene ===========================================

  test("anovaF matches the closed form; equal group means give F near 0") {
    val g1 = Seq(10L, 20L, 30L)
    val g2 = Seq(110L, 120L, 130L)
    val g3 = Seq(40L, 60L, 80L, 100L)
    val rows = g1.map(("a", _)) ++ g2.map(("b", _)) ++ g3.map(("c", _))
    val got = Profiling.anovaF(rows.toDF("g", "x"), "g", "x").head()
    // closed form with the operator's group-ordered left-to-right fold
    val groups = Seq(g1, g2, g3)
    val n = groups.map(_.size).sum
    val a = groups.map(g => g.sum.toDouble * g.sum / g.size)
      .foldLeft(0.0)(_ + _)
    val s = groups.flatten.sum.toDouble
    val b = s * s / n
    val c = groups.flatten.map(x => x.toDouble * x).sum
    val f = (a - b) * (n - 3) / ((c - a) * 2)
    assert(got.getAs[Long]("k") == 3L && got.getAs[Long]("n") == n.toLong)
    assert(math.abs(got.getAs[Double]("f") - f) <= 1e-9)
    // identical groups: between-variance collapses to ~0
    val same = (1 to 3).flatMap(k => Seq(1L, 2L, 3L).map((s"g$k", _)))
    val f0 = Profiling.anovaF(same.toDF("g", "x"), "g", "x").head()
      .getAs[Double]("f")
    assert(math.abs(f0) <= 1.0, s"equal means must give small F: $f0")
  }

  test("levene: equal-spread groups score low, a wide group scores high") {
    val tight = Seq("a", "b").flatMap(g => (1 to 50).map(i =>
      (g, 1000L + (i % 10))))
    val sameSpread = Profiling.levene(tight.toDF("g", "x"), "g", "x")
      .head().getAs[Double]("w")
    val wide = tight ++ (1 to 50).map(i => ("c", 1000L + (i % 10) * 100))
    val diffSpread = Profiling.levene(wide.toDF("g", "x"), "g", "x")
      .head().getAs[Double]("w")
    assert(sameSpread < 1.0, s"equal spreads must not reject: $sameSpread")
    assert(diffSpread > 10.0, s"a 100x spread must reject: $diffSpread")
  }

  // ==== q282 Durbin–Watson ===================================================

  test("durbinWatson: alternating residuals near 4, a smooth wave near 0") {
    val t0 = 1700000000000L // millis
    // alternating series around a flat trend: e_t flips sign each hour
    // -> (e_t - e_{t-1})^2 = 4e^2 -> DW -> 4
    val alt = (0 until 60).map(h =>
      ("alt", new java.sql.Timestamp(t0 + h * 3600000L),
        if (h % 2 == 0) 100 else 200))
    // slow sine-like wave: adjacent residuals nearly equal -> DW -> 0
    val wave = (0 until 60).map(h =>
      ("wave", new java.sql.Timestamp(t0 + h * 3600000L),
        (150 + 50 * math.sin(h / 30.0 * math.Pi)).toInt))
    val rows = (alt ++ wave).flatMap { case (g, ts, k) =>
      Seq.fill(k)((g, ts)) } // k events in that hour -> hourly count k
    val got = EventsOps.durbinWatson(
      rows.toDF("event_type", "ts"))
      .select("event_type", "n_hours", "dw")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("alt")._2 == 60L)
    assert(got("alt")._3 > 3.5, s"alternating series must push DW to 4: $got")
    assert(got("wave")._3 < 1.0, s"smooth wave must push DW to 0: $got")
  }

  // ==== q284/q285 CvM + energy distance ======================================

  test("cramerVonMises == brute force; identical samples score ~0") {
    val rnd = new scala.util.Random(131)
    val rows = (1 to 600).map(_ =>
      (rnd.nextInt(40).toLong + (if (rnd.nextBoolean()) 5 else 0),
        rnd.nextBoolean()))
    val got = Profiling.cramerVonMises(
      rows.toDF("v", "isA"), "v", col("isA")).head()
    // brute force over the pooled sample (with multiplicity)
    val a = rows.filter(_._2).map(_._1).sorted
    val b = rows.filterNot(_._2).map(_._1).sorted
    val n = a.size.toLong; val m = b.size.toLong
    val num = (a ++ b).map { x =>
      val fa = a.count(_ <= x).toLong * m
      val fb = b.count(_ <= x).toLong * n
      BigInt(fa - fb) * BigInt(fa - fb)
    }.sum
    val t = num.toDouble / ((n + m).toDouble * (n + m) * n * m)
    assert(got.getAs[Long]("n_a") == n && got.getAs[Long]("n_b") == m)
    assert(math.abs(got.getAs[Double]("t") - t) <= 1e-9)
    // same distribution on both sides -> T tiny
    val same = (1 to 500).flatMap(i =>
      Seq((i.toLong % 37, true), (i.toLong % 37, false)))
    val t0 = Profiling.cramerVonMises(same.toDF("v", "isA"), "v",
      col("isA")).head().getAs[Double]("t")
    assert(t0 <= 1e-6, s"identical samples must score ~0: $t0")
  }

  test("energyDistance == brute force; zero on identical, positive on shift") {
    val rnd = new scala.util.Random(137)
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextBoolean()))
    val got = Profiling.energyDistance(
      rows.toDF("v", "isA"), "v", col("isA")).head()
    val a = rows.filter(_._2).map(_._1)
    val b = rows.filterNot(_._2).map(_._1)
    def meanAbs(x: Seq[Long], y: Seq[Long]) =
      x.map(u => y.map(w => math.abs(u - w)).sum).sum.toDouble /
        (x.size.toLong * y.size)
    val e2 = 2 * meanAbs(a, b) - meanAbs(a, a) - meanAbs(b, b)
    assert(math.abs(got.getAs[Double]("e2") - e2) <= 1e-9)
    // identical multisets -> exactly 0; a +100 shift -> clearly positive
    val same = (1 to 300).flatMap(i =>
      Seq((i.toLong % 23, true), (i.toLong % 23, false)))
    assert(Profiling.energyDistance(same.toDF("v", "isA"), "v",
      col("isA")).head().getAs[Double]("e2") == 0.0)
    val shifted = (1 to 300).flatMap(i =>
      Seq((i.toLong % 23 + 100, true), (i.toLong % 23, false)))
    assert(Profiling.energyDistance(shifted.toDF("v", "isA"), "v",
      col("isA")).head().getAs[Double]("e2") > 100.0)
  }

  // ==== q286 Cochran's Q =====================================================

  test("cochranQ: hand-computed 3-condition matrix; degenerate null") {
    // 6 subjects x 3 conditions:
    // s1 (1,1,1), s2 (1,0,0), s3 (1,0,0), s4 (1,1,0), s5 (0,0,0), s6 (1,0,1)
    val rows = Seq(
      ("s1", "a"), ("s1", "b"), ("s1", "c"),
      ("s2", "a"), ("s3", "a"),
      ("s4", "a"), ("s4", "b"),
      ("s5", "z"),
      ("s6", "a"), ("s6", "c"))
    val got = Profiling.cochranQ(rows.toDF("id", "k"), "id",
      Seq(col("k") === "a", col("k") === "b", col("k") === "c")).head()
    // C = (5, 2, 2), N = 9, R = (3,1,1,2,0,2), sum R^2 = 19
    // Q = 2*(3*(25+4+4) - 81) / (27 - 19) = 2*18/8 = 4.5
    assert(got.getAs[Long]("c0") == 5L && got.getAs[Long]("c1") == 2L &&
      got.getAs[Long]("c2") == 2L)
    assert(got.getAs[Double]("q") == 4.5)
    // every subject all-1: kN - sumR^2 = 0 -> null
    val allOne = (1 to 4).flatMap(i =>
      Seq((s"u$i", "a"), (s"u$i", "b"), (s"u$i", "c")))
    val g0 = Profiling.cochranQ(allOne.toDF("id", "k"), "id",
      Seq(col("k") === "a", col("k") === "b", col("k") === "c")).head()
    assert(g0.isNullAt(g0.fieldIndex("q")))
  }

  // ==== q289 cumulative gains ================================================

  test("cumulativeGains == brute force on the unique (score, id) order") {
    val rnd = new scala.util.Random(163)
    val rows = (1L to 500L).map(i =>
      (i, rnd.nextInt(100).toLong,
        if (rnd.nextInt(100) < rnd.nextInt(100)) 1L else 0L))
    val got = MlEval.cumulativeGains(rows.toDF("id", "s", "y"))
      .orderBy(col("decile"))
      .select("decile", "n_d", "pos_d", "cum_pos", "gain", "lift")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    val sorted = rows.sortBy(r => (-r._2, r._1))
    val n = rows.size; val pos = rows.map(_._3).sum
    val brute = sorted.zipWithIndex.groupBy { case (_, rk) =>
      rk.toLong * 10 / n }.toSeq.sortBy(_._1)
    var cum = 0L
    brute.zip(got).foreach { case ((d, members), g) =>
      cum += members.map(_._1._3).sum
      assert(g._1 == d && g._2 == members.size.toLong)
      assert(g._3 == members.map(_._1._3).sum && g._4 == cum)
    }
    // terminal laws: full population captures every positive at lift 1
    assert(got.last._5 == 1.0 && got.last._6 == 1.0)
    // perfectly separating score: decile 0 lift = n/pos (all positives first)
    val perfect = (1L to 100L).map(i => (i, 100L - i, if (i <= 10) 1L else 0L))
    val p0 = MlEval.cumulativeGains(perfect.toDF("id", "s", "y"))
      .orderBy(col("decile")).select("lift").as[Double].head()
    assert(p0 == 10.0, s"perfect score must hit max lift: $p0")
  }

  // ==== q287 Jonckheere–Terpstra =============================================

  test("jonckheereTerpstra == brute force; a planted monotone trend scores high") {
    val rnd = new scala.util.Random(151)
    val groups = Seq("g1", "g2", "g3")
    val rows = groups.zipWithIndex.flatMap { case (g, gi) =>
      (1 to 200).map(_ => (g, rnd.nextInt(40).toLong + gi * 3))
    }
    val got = Profiling.jonckheereTerpstra(
      rows.toDF("g", "v"), "g", "v", groups).head()
    // brute-force 2*JT: for each ordered pair i<j, 2*#{x_i<x_j} + #{=}
    val byG = groups.map(g => rows.filter(_._1 == g).map(_._2))
    val jt2 = (for { i <- 0 until 3; j <- (i + 1) until 3 } yield
      byG(i).map(x => 2L * byG(j).count(_ > x) + byG(j).count(_ == x))
        .sum).sum
    assert(got.getAs[Long]("n") == 600L)
    assert(got.getAs[java.math.BigDecimal]("jt2").longValue == jt2)
    val mu4 = 600L * 600L - 3L * 200L * 200L
    assert(got.getAs[java.math.BigDecimal]("mu4").longValue == mu4)
    // planted trend: JT well above its mean -> strongly positive z
    assert(got.getAs[Double]("z") > 3.0, s"trend must score high: $got")
    // group order REVERSED: same data must score the mirror-negative z
    val rev = Profiling.jonckheereTerpstra(
      rows.toDF("g", "v"), "g", "v", groups.reverse).head()
    assert(rev.getAs[Double]("z") < -3.0)
  }

  // ==== q283 forecast eval ===================================================

  test("forecastEval: perfect daily seasonality gives MASE 0, sMAPE 0") {
    val t0 = 1700000000000L
    // counts repeat every 24h exactly -> lag-24 forecast is perfect;
    // lag-1 naive errors are nonzero (the series moves hour to hour)
    val rows = (0 until 96).flatMap { h =>
      val k = 10 + (h % 24)
      Seq.fill(k)(("cyc", new java.sql.Timestamp(t0 + h * 3600000L)))
    }
    val got = EventsOps.forecastEval(rows.toDF("event_type", "ts")).head()
    assert(got.getAs[String]("mae") == "0.0000")
    assert(got.getAs[String]("smape") == "0.0000")
    assert(got.getAs[String]("mase") == "0.0000")
  }

  test("forecastEval matches the hand recomputation on an irregular series") {
    val t0 = 1700000000000L
    val counts = Vector(5, 9, 14, 3, 25, 30, 8, 7, 12, 40, 2, 6,
      11, 13, 21, 17, 4, 9, 28, 33, 10, 5, 19, 22, // first day
      7, 11, 12, 5, 24, 28, 10, 9, 14, 38, 4, 8,
      13, 11, 23, 15, 6, 7, 30, 31, 12, 7, 17, 24) // second day
    val rows = counts.zipWithIndex.flatMap { case (k, h) =>
      Seq.fill(k)(("s", new java.sql.Timestamp(t0 + h * 3600000L))) }
    val got = EventsOps.forecastEval(rows.toDF("event_type", "ts")).head()
    val fcErr = (24 until 48).map(h => math.abs(counts(h) - counts(h - 24)))
    val smape = (24 until 48).map(h => math.floor(
      2e6 * math.abs(counts(h) - counts(h - 24)) /
        (counts(h) + counts(h - 24))).toLong).sum / (24.0 * 1e6)
    val nvErr = (1 until 48).map(h => math.abs(counts(h) - counts(h - 1)))
    def d4(x: Double) = new java.math.BigDecimal(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).toPlainString
    assert(got.getAs[Long]("n_eval") == 24L)
    assert(got.getAs[String]("mae") == d4(fcErr.sum / 24.0))
    assert(got.getAs[String]("smape") == d4(smape))
    assert(got.getAs[String]("mase") ==
      d4(fcErr.sum.toDouble * 47 / (nvErr.sum.toDouble * 24)))
  }

  // ==== q279 Mann–Kendall ====================================================

  test("mannKendall: monotone series maxes S; brute force on random data") {
    val up = (0L until 20L).map(i => ("up", i, 100L + i * 7))
    val rnd = new scala.util.Random(17)
    val noisy = (0L until 25L).map(i => ("r", i, rnd.nextInt(10).toLong))
    val flat = (0L until 8L).map(i => ("flat", i, 5L))
    val got = Profiling.mannKendall(
      (up ++ noisy ++ flat).toDF("g", "di", "y"), "g")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    // strictly increasing: S = C(20,2), no ties
    assert(got("up").getAs[Long]("s_stat") == 190L)
    assert(got("up").getAs[Long]("var18_num") == 20L * 19L * 45L)
    // brute force S and tie term on the noisy series
    val ys = noisy.map(_._3)
    val s = (for { i <- ys.indices; j <- ys.indices if i < j }
      yield math.signum(ys(j) - ys(i)).toLong).sum
    assert(got("r").getAs[Long]("s_stat") == s)
    val ties = ys.groupBy(identity).values.map(_.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    assert(got("r").getAs[Long]("var18_num") == 25L * 24L * 55L - ties)
    // constant series: all tied -> zero variance -> null z
    assert(got("flat").getAs[Long]("var18_num") == 0L)
    assert(got("flat").isNullAt(got("flat").fieldIndex("z")))
  }
}
