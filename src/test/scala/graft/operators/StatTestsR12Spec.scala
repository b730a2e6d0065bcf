package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 operators: Fleiss' kappa, Kendall's W, Coleman–Liau, MSTTR,
  * two-proportion z, Jensen–Shannon drift, Markov removal-effect
  * attribution, RMST, regression discontinuity, inter-arrival fit,
  * count-min sketch, Hosmer–Lemeshow. Each test recomputes the statistic
  * naively or plants data where the answer is forced. */
class StatTestsR12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Long, m: Long = 0): Timestamp =
    new Timestamp(1700000000000L + h * 3600000L + m * 60000L)

  // ==== q299 Fleiss' kappa ===================================================

  test("fleissKappa: perfect agreement is 1; naive recompute on disagreement") {
    val perfect = Seq((0, 0, 0), (1, 1, 1), (2, 2, 2), (1, 1, 1))
      .toDF("r0", "r1", "r2")
    val k1 = Profiling.fleissKappa(perfect,
      Seq(col("r0"), col("r1"), col("r2")), nCats = 3)
      .select("kappa").head().getDouble(0)
    assert(math.abs(k1 - 1.0) < 1e-12)

    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val base = rnd.nextInt(3)
      def jitter = if (rnd.nextInt(4) == 0) rnd.nextInt(3) else base
      (base, jitter, jitter)
    }
    val got = Profiling.fleissKappa(rows.toDF("r0", "r1", "r2"),
      Seq(col("r0"), col("r1"), col("r2")), nCats = 3)
      .select("p_bar", "p_e", "kappa").head()
    // naive: n_ij matrix, P_i per subject, marginal p_j
    val n = rows.size; val k = 3
    val nij = rows.map { case (a, b, c) =>
      (0 until 3).map(j => Seq(a, b, c).count(_ == j)) }
    val pBar = nij.map(r => (r.map(x => x * x).sum - k).toDouble /
      (k * (k - 1))).sum / n
    val pE = (0 until 3).map { j =>
      val cj = nij.map(_(j)).sum.toDouble / (n * k); cj * cj }.sum
    val kappa = (pBar - pE) / (1 - pE)
    assert(math.abs(got.getDouble(0) - pBar) < 1e-9)
    assert(math.abs(got.getDouble(1) - pE) < 1e-9)
    assert(math.abs(got.getDouble(2) - kappa) < 1e-9)
  }

  // ==== q300 Kendall's W =====================================================

  test("kendallW: identical rankings give 1; midrank recompute with ties") {
    val unanimous = for (j <- 0 until 3; o <- 0 until 5)
      yield (j, s"obj$o", (o + 1).toLong * 10)
    val w1 = Profiling.kendallW(unanimous.toDF("judge", "obj", "score"))
      .select("w").head().getDouble(0)
    assert(math.abs(w1 - 1.0) < 1e-12)

    // planted ties: two objects share a score within a judge
    val cells = Seq(
      (0, "a", 1L), (0, "b", 2L), (0, "c", 2L), (0, "d", 5L),
      (1, "a", 3L), (1, "b", 1L), (1, "c", 4L), (1, "d", 4L),
      (2, "a", 2L), (2, "b", 2L), (2, "c", 2L), (2, "d", 9L))
    val got = Profiling.kendallW(cells.toDF("judge", "obj", "score"))
      .select("w").head().getDouble(0)
    // naive midranks per judge
    val m = 3; val n = 4
    def midranks(js: Seq[(String, Long)]): Map[String, Double] = {
      val sorted = js.sortBy(_._2)
      sorted.zipWithIndex.groupBy(_._1._2).values.flatMap { g =>
        val avg = g.map(_._2 + 1).sum.toDouble / g.size
        g.map(x => x._1._1 -> avg)
      }.toMap
    }
    val byJudge = cells.groupBy(_._1).view.mapValues(v =>
      midranks(v.map(x => (x._2, x._3)))).toMap
    val rTot = Seq("a", "b", "c", "d").map(o =>
      byJudge.values.map(_(o)).sum)
    val sumR2 = rTot.map(r => r * r).sum
    val tt = cells.groupBy(_._1).values.map(js =>
      js.groupBy(_._3).values.map(g =>
        math.pow(g.size, 3) - g.size).sum).sum
    val expW = (12 * sumR2 - 3 * m * m * n * (n + 1) * (n + 1)) /
      (m.toDouble * m * n * (n * n - 1) - m * tt)
    assert(math.abs(got - expW) < 1e-9)
  }

  // ==== q301 Coleman–Liau ====================================================

  test("colemanLiau: exact rational on a hand-counted string") {
    val text = "The cat sat. On a mat!" // letters=15, words=6, sents=2
    val row = TextAnalysis.colemanLiau(Seq((1L, text)).toDF("doc_id", "text"))
      .select("n_words", "n_letters", "n_sentences", "cli").head()
    assert(row.getLong(0) == 6L && row.getLong(1) == 15L &&
      row.getLong(2) == 2L)
    val exp = (588.0 * 15 - 2960.0 * 2 - 1580.0 * 6) / (100.0 * 6)
    assert(math.abs(row.getDouble(3) - exp) < 1e-12)
  }

  // ==== q302 MSTTR ===========================================================

  test("msttr: complete segments only, per-segment distincts averaged") {
    // 120 tokens: segment 1 = 50 copies of 10 types, segment 2 = 50
    // distinct tokens, 20-token tail ignored
    val toks = (0 until 50).map(i => s"w${i % 10}") ++
      (0 until 50).map(i => s"u$i") ++ (0 until 20).map(_ => "tail")
    val row = TextAnalysis.msttr(
      Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"))
      .select("n_segments", "msttr").head()
    assert(row.getLong(0) == 2L)
    assert(math.abs(row.getDouble(1) - (10 + 50).toDouble / 100) < 1e-12)
    // a short doc has no complete segment and reports null
    val short = TextAnalysis.msttr(Seq((2L, "a b c")).toDF("doc_id", "text"))
      .select("n_segments", "msttr").head()
    assert(short.getLong(0) == 0L && short.isNullAt(1))
  }

  // ==== q303 two-proportion z ================================================

  test("twoProportionZ: closed form; equal rates give z 0") {
    // pairs (2k, 2k+1) share a conversion flag -> identical arm rates
    val arms = (1 to 80).map(i => (i % 2, (i / 2) % 4 == 0))
    val z0 = EventsOps.twoProportionZ(arms.toDF("arm", "converted"))
      .select("z").head().getDouble(0)
    assert(math.abs(z0) < 1e-12)
    val arms2 = (1 to 50).map(i => (1, i <= 30)) ++
      (1 to 40).map(i => (0, i <= 12))
    val got = EventsOps.twoProportionZ(arms2.toDF("arm", "converted"))
      .select("n1", "x1", "n0", "x0", "z", "z_cc").head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) == ((50L, 30L, 40L, 12L)))
    val (p1, p0, pp) = (0.6, 0.3, 42.0 / 90)
    val se = math.sqrt(pp * (1 - pp) * (1.0 / 50 + 1.0 / 40))
    assert(math.abs(got.getDouble(4) - (p1 - p0) / se) < 1e-12)
    val cc = 0.5 * (1.0 / 50 + 1.0 / 40)
    assert(math.abs(got.getDouble(5) -
      (math.abs(p1 - p0) - cc) / se) < 1e-12)
  }

  // ==== q304 Jensen–Shannon ==================================================

  test("jsDivergence: identical slices 0, disjoint slices ln 2") {
    // bin = i%16, side = i%32 div 16: each bin splits exactly 10/10, so
    // p = q bin-for-bin and every ln argument is exactly 1
    val same = (1 to 320).map(i => ((i % 16) * 100L, i % 32 < 16))
    val js0 = Profiling.jsDivergence(same.toDF("cents", "a0"),
      "cents", col("a0"), binW = 100L).select("js2_nano").head().getLong(0)
    assert(js0 == 0L, s"identical slices: $js0")
    val disjoint = (1 to 100).map(i => (0L, true)) ++
      (1 to 100).map(i => (1500L, false))
    val js1 = Profiling.jsDivergence(disjoint.toDF("cents", "a0"),
      "cents", col("a0"), binW = 100L).select("js2_nano").head().getLong(0)
    assert(math.abs(js1 / 2e9 - math.log(2.0)) < 1e-6)
  }

  // ==== q305 Markov removal-effect ===========================================

  test("markovRemovalAttribution: forced chain credits the load-bearing channel") {
    // 10 users: view -> click -> purchase; 5 users: signup -> end.
    // Removing click (or view) kills ALL conversion; removing signup none.
    val events = (1 to 10).flatMap(u => Seq(
      (u.toLong, ts(0), u * 10L, "view"),
      (u.toLong, ts(1), u * 10L + 1, "click"),
      (u.toLong, ts(2), u * 10L + 2, "purchase"))) ++
      (11 to 15).flatMap(u => Seq((u.toLong, ts(0), u * 10L, "signup")))
    val df = events.toDF("user_id", "ts", "event_id", "event_type")
    val got = EventsOps.markovRemovalAttribution(df)
      .select("channel", "removal_effect", "share")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(got("view")._1 - 1.0) < 1e-9)
    assert(math.abs(got("click")._1 - 1.0) < 1e-9)
    assert(math.abs(got("signup")._1) < 1e-9)
    assert(math.abs(got("view")._2 - 0.5) < 1e-9) // two equal full drops
    // full-chain conversion: 2/3 of START mass converts (10 of 15 users)
    val full = EventsOps.markovRemovalAttribution(df)
      .select("conv_full_e12").head().getLong(0)
    assert(math.abs(full - 2e12 / 3) <= 2, s"full=$full")
  }

  // ==== q306 RMST ============================================================

  test("rmst: hand-computed area under a two-step KM curve") {
    // 4 users from hour 0: events at h1 (u1), h3 (u2); u3, u4 censored at
    // h4. Deaths at t=1 (n=4): S=3/4; t=3 (n=3): S=1/2; tau=4.
    // RMST = 1*1 + (3-1)*3/4 + (4-3)*1/2 = 3.0 hours
    val events =
      Seq((1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "purchase"),
        (2L, ts(0), 3L, "view"), (2L, ts(3), 4L, "purchase"),
        (3L, ts(0), 5L, "view"), (3L, ts(4), 6L, "view"),
        (4L, ts(0), 7L, "view"), (4L, ts(4), 8L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val row = EventsOps.rmst(events, "purchase")
      .select("tau_hr", "n_death_times", "rmst_micro_hr").head()
    assert(row.getLong(0) == 4L && row.getLong(1) == 2L)
    // floored exp(log) terms may sit a few micro-units under the exact area
    assert(math.abs(row.getLong(2) - 3000000L) <= 5, row.toString)
  }

  // ==== q307 regression discontinuity ========================================

  test("regressionDiscontinuity: recovers a planted jump on exact lines") {
    val pts = ((300L until 500L).map(x => (x, 2 * x + 5)) ++
      (500L until 700L).map(x => (x, 2 * x + 5 + 7))).toDF("x", "y")
    val row = EventsOps.regressionDiscontinuity(pts, cut = 500L, bw = 200L)
      .select("n_left", "n_right", "effect").head()
    assert(row.getLong(0) == 200L && row.getLong(1) == 200L)
    assert(math.abs(row.getDouble(2) - 7.0) < 1e-6)
  }

  // ==== q308 inter-arrival fit ===============================================

  test("interArrivalFit: naive KS recompute; constant gaps score high") {
    // constant 1h gaps: F_exp(g) at the single gap value = 1 - e^-1,
    // F_emp jumps 0 -> 1 there, so D = max(1 - (1-e^-1), 1-e^-1) = 1-e^-1
    val const = (0 until 25).map(i =>
      (i.toLong, ts(i), i.toLong, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = EventsOps.interArrivalFit(const)
      .select("n_gaps", "ks").head()
    assert(r.getLong(0) == 24L)
    assert(math.abs(r.getDouble(1) - (1 - math.exp(-1.0))) < 1e-9)
    // mixed gaps: recompute D naively
    val hours = Seq(0L, 1L, 2L, 4L, 8L, 9L, 15L, 16L, 17L, 30L)
    val ev = hours.zipWithIndex.map { case (h, i) =>
      (1L, ts(h), i.toLong, "view") }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventsOps.interArrivalFit(ev).select("ks").head().getDouble(0)
    val gaps = hours.zip(hours.tail).map { case (a, b) => (b - a) * 3.6e9 }
    val lam = gaps.size / gaps.sum
    val sorted = gaps.sorted
    val d = sorted.zipWithIndex.flatMap { case (g, i) =>
      val fe = 1 - math.exp(-lam * g)
      val le = sorted.count(_ <= g).toDouble / gaps.size
      val lt = sorted.count(_ < g).toDouble / gaps.size
      Seq(le - fe, fe - lt)
    }.max
    assert(math.abs(got - d) < 1e-9)
  }

  // ==== q309 count-min sketch ================================================

  test("cms: merge law holds and estimates are exact without collisions") {
    val items = (1 to 300).map(i => i.toLong % 7).toDF("it")
    val d = 4; val w = 64 // domain 7 ≪ w: collisions possible but counted
    val whole = SketchOps.cmsSketch(items, "it", d, w)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // merge law: counters of the halves SUM to the whole's counters
    val a = SketchOps.cmsSketch(items.filter(col("it") < 3), "it", d, w)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = SketchOps.cmsSketch(items.filter(col("it") >= 3), "it", d, w)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole)
    // one-sided law + exactness: est >= true always; with min over d
    // rows and 7 items in 64 buckets the estimate is exact here
    val truth = items.groupBy(col("it")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = SketchOps.cmsEstimate(SketchOps.cmsSketch(items, "it", d, w),
      items.select(col("it")).distinct(), "it", d, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) => assert(est(k) >= t) }
    assert(est == truth, "no-collision regime must be exact")
  }

  // ==== q311 AMS F2 ==========================================================

  test("amsF2: sign layer merges by addition; single-item stream is exact") {
    val items = (1 to 500).map(i => i.toLong % 9).toDF("it")
    val k = 32
    val whole = SketchOps.amsF2Signs(items, "it", k)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val a = SketchOps.amsF2Signs(items.filter(col("it") < 4), "it", k)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = SketchOps.amsF2Signs(items.filter(col("it") >= 4), "it", k)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until k).foreach(r =>
      assert(whole(r) == a.getOrElse(r, 0L) + b.getOrElse(r, 0L)))
    // one repeated item: Z = ±n for EVERY estimator, so every group sum
    // is 8n² and the estimate is exactly F2 = n²
    val mono = (1 to 70).map(_ => 42L).toDF("it")
    val z8 = SketchOps.amsF2Sketch(mono, "it", k)
      .collect().map(_.getLong(1))
    assert(z8.forall(_ == 8L * 70 * 70))
  }

  // ==== q312 clustering coefficient ==========================================

  test("clusteringCoefficient: cliques score exactly 1; hand wedge graph") {
    // K4: every node deg 3, 3 triangles -> cc = 1
    val k4 = (for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val got4 = Graph.clusteringCoefficient(k4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got4.length == 4 && got4.forall(t =>
      t._2 == 3L && t._3 == 3L && t._4 == 1000000L))
    // triangle 1-2-3 plus pendant 4 on node 1: cc(1) = 2*1/(3*2) = 1/3;
    // cc(2) = cc(3) = 1; node 4 (no triangle) absent
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val got = Graph.clusteringCoefficient(g)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 333333L, 2L -> 1000000L, 3L -> 1000000L))
  }

  // ==== q313 Herfindahl ======================================================

  test("herfindahl: equal shares give 1/n, a monopoly gives 1") {
    val eq = (1 to 40).map(i => ("en", s"s${i % 4}", 25L))
      .toDF("lang", "source", "n_chars")
    val r1 = CorpusStats.herfindahl(eq, "lang", "source", "n_chars")
      .select("n_shares", "hhi_e6", "eff_sources_e6").head()
    assert(r1.getLong(0) == 4L && r1.getLong(1) == 250000L &&
      r1.getLong(2) == 4000000L)
    val mono = Seq(("de", "only", 999L)).toDF("lang", "source", "n_chars")
    val r2 = CorpusStats.herfindahl(mono, "lang", "source", "n_chars")
      .select("hhi_e6", "eff_sources_e6").head()
    assert(r2.getLong(0) == 1000000L && r2.getLong(1) == 1000000L)
  }

  // ==== q314 Monroe log-odds keyness =========================================

  test("monroeKeyness: planted slice-exclusive word tops z; naive recompute") {
    val docs = ((1 to 60).map(i => (s"alpha shared w${i % 5}", true)) ++
      (1 to 60).map(i => (s"beta shared w${i % 5}", false)))
      .toDF("text", "en")
    val got = CorpusStats.monroeKeyness(docs, col("en"), alpha0 = 100L,
      minCount = 5L).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("alpha") == got.values.max)
    assert(got("beta") == got.values.min)
    // "shared" appears identically -> z near 0 (only the slice-size
    // asymmetry is zero here, so exactly symmetric priors)
    assert(math.abs(got("shared")) < 1e-9)
    // naive recompute for "alpha": y1=60, y2=0, yw=60; n1=n2=180, n=360
    val a0 = 100.0
    def lo(y: Double, nSlice: Double) = {
      val aw = a0 * 60 / 360
      math.log((y + aw) / (nSlice + a0 - y - aw))
    }
    val delta = lo(60, 180) - lo(0, 180)
    val v = 1 / (60 + a0 * 60 / 360) + 1 / (0 + a0 * 60 / 360)
    assert(math.abs(got("alpha") - delta / math.sqrt(v)) < 1e-9)
  }

  // ==== q315 turning points ==================================================

  test("turningPoints: monotone series has none, alternating has all") {
    def ev(tsH: Seq[(Long, Int)], tp: String) = tsH.flatMap { case (h, c) =>
      (1 to c).map(j => (h * 100 + j, ts(h), h * 100 + j, tp)) }
    // monotone: counts 1..12 -> 0 turns; alternating 5,1,5,1.. -> n-2
    val mono = ev((0L until 12L).map(h => h -> (h.toInt + 1)), "up")
    val alt = ev((0L until 12L).map(h =>
      h -> (if (h % 2 == 0) 5 else 1)), "zig")
    val df = (mono ++ alt).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventsOps.turningPoints(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got("up") == ((12L, 0L, got("up")._3)))
    assert(got("zig")._2 == 10L)
    val n = 12.0
    val zUp = (0 - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
    assert(math.abs(got("up")._3 - zUp) < 1e-12)
  }

  // ==== q316 Gwet's AC1 ======================================================

  test("gwetAC1: perfect agreement is 1; stays high where kappa collapses") {
    val rs = Seq(col("r0"), col("r1"), col("r2"))
    val perfect = Seq((0, 0, 0), (1, 1, 1), (2, 2, 2)).toDF("r0", "r1", "r2")
    assert(math.abs(Profiling.gwetAC1(perfect, rs, 3)
      .select("ac1").head().getDouble(0) - 1.0) < 1e-12)
    // kappa paradox fixture: 98 unanimous category-0 subjects + 2 split
    // ones — prevalence is extreme, kappa craters, AC1 stays near 1
    val skewed = ((1 to 98).map(_ => (0, 0, 0)) ++
      Seq((1, 1, 2), (2, 1, 1))).toDF("r0", "r1", "r2")
    val ac1 = Profiling.gwetAC1(skewed, rs, 3)
      .select("ac1").head().getDouble(0)
    val kap = Profiling.fleissKappa(skewed, rs, 3)
      .select("kappa").head().getDouble(0)
    assert(ac1 > 0.9 && kap < 0.7 && ac1 > kap + 0.3,
      s"paradox not exhibited: ac1=$ac1 kappa=$kap")
  }

  // ==== q317 Page–Hinkley ====================================================

  test("pageHinkley: level shift alarms, flat and slow-drift-free series do not") {
    def ev(tp: String, counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, h) => (1 to c).map(j =>
        (h * 1000L + j, ts(h.toLong), h * 1000L + j, tp)) }
    val df = (ev("shift", Seq.fill(20)(10) ++ Seq.fill(20)(60)) ++
      ev("flat", Seq.fill(40)(10)))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventsOps.pageHinkley(df, lambda = 50L).collect()
      .map(r => r.getString(0) -> (r.getLong(2), Option(r.get(3)))).toMap
    assert(got("flat")._1 <= 2000000L && got("flat")._2.isEmpty)
    assert(got("shift")._2.nonEmpty, "shift must alarm")
  }

  // ==== q318 Krippendorff's alpha ============================================

  test("krippendorffAlpha: perfect agreement is 1; naive recompute") {
    val rs = Seq(col("r0"), col("r1"), col("r2"))
    val perfect = Seq((0, 0, 0), (1, 1, 1), (2, 2, 2)).toDF("r0", "r1", "r2")
    assert(math.abs(Profiling.krippendorffAlpha(perfect, rs, 3)
      .select("alpha").head().getDouble(0) - 1.0) < 1e-12)
    val rnd = new scala.util.Random(23)
    val rows = (1 to 150).map { _ =>
      val base = rnd.nextInt(3)
      def jitter = if (rnd.nextInt(5) == 0) rnd.nextInt(3) else base
      (base, jitter, jitter)
    }
    val got = Profiling.krippendorffAlpha(rows.toDF("r0", "r1", "r2"), rs, 3)
      .select("alpha").head().getDouble(0)
    // naive: D_o from per-subject disagreeing pairs, D_e from pooled
    val n = rows.size; val k = 3; val bigN = n * k
    val nij = rows.map { case (a, b, c) =>
      (0 until 3).map(j => Seq(a, b, c).count(_ == j)) }
    val dO = nij.map(r => r.map(x => x * (k - x)).sum).sum.toDouble /
      (n * k * (k - 1))
    val cj = (0 until 3).map(j => nij.map(_(j)).sum)
    val dE = (bigN.toDouble * bigN - cj.map(c => c.toDouble * c).sum) /
      (bigN.toDouble * (bigN - 1))
    assert(math.abs(got - (1 - dO / dE)) < 1e-9)
  }

  // ==== q319 Welch's ANOVA ===================================================

  test("welchAnova: textbook recompute; equal group means give F* near 0") {
    val rnd = new scala.util.Random(31)
    val data = (1 to 600).map { _ =>
      val g = "g" + rnd.nextInt(3)
      val spread = g match { case "g0" => 3; case "g1" => 10; case _ => 25 }
      val shift = if (g == "g2") 40 else 0
      (g, (100 + shift + rnd.nextInt(2 * spread) - spread).toLong)
    }
    val got = Profiling.welchAnova(data.toDF("grp", "v"), "grp", "v")
      .select("k", "f_star", "df2").head()
    // naive Welch 1951 recompute
    val byG = data.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2))
    val (ns, ms, vs) = (byG.map(_.size.toDouble),
      byG.map(x => x.sum.toDouble / x.size),
      byG.map { x =>
        val m = x.sum.toDouble / x.size
        x.map(v => (v - m) * (v - m)).sum / (x.size - 1) })
    val w = ns.zip(vs).map { case (n, v) => n / v }
    val k = w.size
    val mbar = w.zip(ms).map { case (a, b) => a * b }.sum / w.sum
    val q = w.zip(ms).map { case (a, m) => a * (m - mbar) * (m - mbar) }.sum
    val r = w.zip(ns).map { case (a, n) =>
      (1 - a / w.sum) * (1 - a / w.sum) / (n - 1) }.sum
    val f = (q / (k - 1)) / (1 + 2.0 * (k - 2) / (k * k - 1) * r)
    assert(got.getLong(0) == 3L)
    assert(math.abs(got.getDouble(1) - f) < 1e-6 * math.max(1.0, f))
    assert(math.abs(got.getDouble(2) - (k * k - 1) / (3.0 * r)) < 1e-6)
    // identical groups: F* collapses toward 0
    val flat = (1 to 300).map(i => ("g" + i % 3, (i % 7).toLong))
    val f0 = Profiling.welchAnova(flat.toDF("grp", "v"), "grp", "v")
      .select("f_star").head().getDouble(0)
    assert(f0 < 0.01)
  }

  // ==== q320 Shannon diversity ===============================================

  test("shannonDiversity: uniform shares hit ln k (evenness 1), monopoly 0") {
    val eq = (1 to 40).map(i => ("en", s"s${i % 4}", 25L))
      .toDF("lang", "source", "n_chars")
    val r1 = CorpusStats.shannonDiversity(eq, "lang", "source", "n_chars")
      .select("n_shares", "shannon_e9", "evenness_e6").head()
    assert(r1.getLong(0) == 4L)
    assert(math.abs(r1.getLong(1) - math.floor(1e9 * math.log(4.0))) <= 4,
      s"uniform H != ln 4: ${r1.getLong(1)}") // 4 floored quarter-terms
    assert(r1.getLong(2) >= 999999L && r1.getLong(2) <= 1000000L)
    val mono = Seq(("de", "only", 999L)).toDF("lang", "source", "n_chars")
    val r2 = CorpusStats.shannonDiversity(mono, "lang", "source", "n_chars")
      .select("shannon_e9").head()
    assert(r2.getLong(0) == 0L)
  }

  // ==== q321 empirical-Bayes shrinkage =======================================

  test("ebShrunkRates: a 2/2 item ranks below a 90/100 one after shrinkage") {
    // population: 50 solid items at ~30% with n=100, one tiny 2/2 item,
    // one strong 90/100 item
    val items = (1 to 50).map(i => (i.toLong, 100L, (25 + i % 11).toLong)) ++
      Seq((900L, 2L, 2L), (901L, 100L, 90L))
    val got = EventsOps.ebShrunkRates(
      items.toDF("user_id", "n", "x"), minN = 20L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(900L)._1 == 1000000L) // raw 2/2 = 100%
    assert(got(900L)._2 < got(901L)._2,
      s"shrunk 2/2 ${got(900L)._2} must rank below 90/100 ${got(901L)._2}")
    // exact MoM recompute
    val elig = items.filter(_._2 >= 20)
    val r6 = elig.map { case (_, n, x) => math.floor(1e6 * x.toDouble / n) }
    val m = r6.size
    val mu = r6.sum / (m * 1e6)
    val v = (m * r6.map(r => r * r).sum - r6.sum * r6.sum) /
      (m.toDouble * (m - 1) * 1e12)
    val c0 = mu * (1 - mu) / v - 1
    val exp900 = math.floor(1e6 * (2 + mu * c0) /
      (2 + mu * c0 + (1 - mu) * c0)).toLong
    assert(got(900L)._2 == exp900)
  }

  // ==== q322 Cox proportional hazards ========================================

  test("coxBinary: recovers a planted hazard ratio; null case near 0") {
    // treated (odd ids) mostly purchase at hour 1, control mostly at
    // hour 4 — positive beta with OVERLAPPING risk sets (no separation,
    // so the partial-likelihood root is finite)
    def ev(uid: Long, buyH: Option[Long]) =
      Seq((uid, ts(0), uid * 10, "view")) ++
        buyH.map(h => (uid, ts(h), uid * 10 + 1, "purchase")) ++
        Seq((uid, ts(6), uid * 10 + 2, "view"))
    val fast = (1 to 80).flatMap { u =>
      val treated = u % 2 == 1
      val early = u % 8 < 6 // 3/4 of each arm follow their arm's timing
      val h = if (treated == early) 1L else 4L
      ev(u.toLong, Some(h))
    }.toDF("user_id", "ts", "event_id", "event_type")
    val b1 = EventsOps.coxBinary(fast, "purchase")
      .select("beta_e6", "hazard_ratio_e6").head()
    assert(b1.getLong(0) > 500000L, s"planted hazard: ${b1.getLong(0)}")
    assert(b1.getLong(1) > 1650000L) // e^beta > 1.65
    // score root check: U(beta_hat) ~ 0 on the hand-built risk table
    // t=1: d=40 (d1=30), n1=40, n0=40; t=4: d=40 (d1=10), n1=10, n0=30
    val beta = b1.getLong(0) / 1e6 + 5e-7 // undo the e6 floor, mid-cell
    def u(b: Double) = {
      val r = math.exp(b)
      (30 - 40 * (40 * r) / (40 * r + 40)) +
        (10 - 40 * (10 * r) / (10 * r + 30))
    }
    assert(math.abs(u(beta)) < 1e-2, s"score at beta_hat: ${u(beta)}")
    val nullCase = (1 to 40).flatMap(u => ev(u.toLong, Some(2L)))
      .toDF("user_id", "ts", "event_id", "event_type")
    val b0 = EventsOps.coxBinary(nullCase, "purchase")
      .select("beta_e6").head().getLong(0)
    assert(math.abs(b0) <= 1L, s"null beta: $b0")
  }

  // ==== q323 Aalen–Johansen ==================================================

  test("aalenJohansen: hand CIFs; causes sum below 1 where 1-KM over-counts") {
    // 8 users from hour 0: 2 purchase@1, 2 error@1, 2 purchase@3,
    // 2 censored@4.
    // t=1: n=8, d_p=2, d_e=2 -> S(1-)=1, inc_p = inc_e = 2/8 = .25
    // t=3: n=4, d_p=2 -> S(3-)=1*(1-4/8)=.5, inc_p = .5*2/4 = .25
    // CIF_p = .5, CIF_e = .25 (1-KM per cause would give more)
    def ev(uid: Long, h: Long, tp: String, id: Long) = (uid, ts(h), id, tp)
    val rows = (1 to 8).map(u => ev(u.toLong, 0L, "view", u * 10L)) ++
      Seq(ev(1, 1, "purchase", 11), ev(2, 1, "purchase", 21),
        ev(3, 1, "error", 31), ev(4, 1, "error", 41),
        ev(5, 3, "purchase", 51), ev(6, 3, "purchase", 61),
        ev(7, 4, "view", 71), ev(8, 4, "view", 81))
    val got = EventsOps.aalenJohansen(
      rows.toDF("user_id", "ts", "event_id", "event_type"),
      "purchase", "error")
      .select("n_users", "n_times", "cif_a_e6", "cif_b_e6").head()
    assert(got.getLong(0) == 8L && got.getLong(1) == 2L)
    // floored ln/exp terms land within a few micro of the exact values
    assert(math.abs(got.getLong(2) - 500000L) <= 5, got.toString)
    assert(math.abs(got.getLong(3) - 250000L) <= 5, got.toString)
    assert(got.getLong(2) + got.getLong(3) <= 1000000L)
  }

  // ==== q324 odds ratio ======================================================

  test("oddsRatio: textbook 2x2 with Haldane correction; CI brackets OR") {
    val cells = (1 to 30).map(_ => (1, true)) ++
      (1 to 70).map(_ => (1, false)) ++
      (1 to 10).map(_ => (0, true)) ++ (1 to 90).map(_ => (0, false))
    val r = EventsOps.oddsRatio(cells.toDF("arm", "converted"))
      .select("a", "b", "c", "d", "log_or_e6", "or_e6", "ci_lo_e6",
        "ci_hi_e6").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((30L, 70L, 10L, 90L)))
    val or = (61.0 * 181) / (141 * 21) // (2a+1)(2d+1)/((2b+1)(2c+1))
    assert(r.getLong(5) == math.floor(1e6 * or).toLong)
    assert(r.getLong(6) < r.getLong(5) && r.getLong(5) < r.getLong(7))
    val se = math.sqrt(2.0 / 61 + 2.0 / 141 + 2.0 / 21 + 2.0 / 181)
    assert(r.getLong(6) ==
      math.floor(1e6 * math.exp(math.log(or) - 1.959964 * se)).toLong)
    // empty-cell robustness: the correction keeps everything finite
    val empty = Seq((1, true), (1, true), (0, false), (0, false))
    val r2 = EventsOps.oddsRatio(empty.toDF("arm", "converted"))
      .select("or_e6").head()
    assert(r2.getLong(0) > 0L)
  }

  // ==== q310 Hosmer–Lemeshow =================================================

  test("hosmerLemeshow: perfectly calibrated bins score 0") {
    // every doc: 2 of 4 tokens are stopwords -> s = 500 exactly; half
    // the docs labeled positive -> O_b = E_b in the single occupied bin
    val docs = (1 to 40).map(i =>
      (i.toLong, "the a cat dog", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val row = MlEval.hosmerLemeshow(docs, "lang = 'en'")
      .select("n", "n_bins_used", "n_bins_degenerate", "hl_micro").head()
    assert(row.getLong(0) == 40L)
    assert(row.getLong(1) == 1L && row.getLong(2) == 0L)
    assert(row.getLong(3) == 0L)
  }
}
