package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 statistical operators: Kendall tau-b. The histogram-domain
  * implementation is checked against a naive O(n²) pair scan on the same
  * data — the definitional form the scale shape must reproduce exactly.
  */
class StatTestsR10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveTauB(xs: Seq[(Long, Long)]): (BigInt, BigInt, Double) = {
    var conc = BigInt(0); var disc = BigInt(0)
    for (i <- xs.indices; j <- xs.indices if i < j) {
      val s = (xs(i)._1 - xs(j)._1).sign * (xs(i)._2 - xs(j)._2).sign
      if (s > 0) conc += 1 else if (s < 0) disc += 1
    }
    val n = BigInt(xs.size)
    def tie(vs: Seq[Long]): BigInt =
      vs.groupBy(identity).values.map(g => BigInt(g.size) * (g.size - 1))
        .sum // already the DOUBLED tie term Σ c(c−1)
    val u = n * n - n - tie(xs.map(_._1))
    val v = n * n - n - tie(xs.map(_._2))
    val tau = 2.0 * (conc - disc).toDouble /
      math.sqrt(u.toDouble * v.toDouble)
    (conc, disc, tau)
  }

  test("kendallTau matches the naive pair scan, ties in both dimensions") {
    val rnd = new scala.util.Random(10)
    val data = (1 to 400).map { _ =>
      val x = rnd.nextInt(12).toLong
      // correlated-with-noise y, heavy ties
      (x, x / 2 + rnd.nextInt(5).toLong)
    }
    val (conc, disc, tau) = naiveTauB(data)
    val got = Profiling.kendallTau(data.toDF("x", "y"), "x", "y").head()
    assert(got.getAs[String]("concordant") == conc.toString)
    assert(got.getAs[String]("discordant") == disc.toString)
    assert(got.getAs[String]("tau_b") ==
      new java.math.BigDecimal(tau).setScale(4,
        java.math.RoundingMode.HALF_UP).toPlainString)
    assert(got.getAs[Long]("n") == 400L)
  }

  test("kendallTau: perfect monotone association gives tau_b = 1") {
    val data = (1L to 50L).map(i => (i, i * 3))
    val got = Profiling.kendallTau(data.toDF("x", "y"), "x", "y").head()
    assert(got.getAs[String]("tau_b") == "1.0000")
    assert(got.getAs[String]("discordant") == "0")
  }

  test("kendallTau: an unbounded joint value domain raises, not explodes") {
    // near-continuous pair: every row its own cell — the O(cells²) BNL
    // would be corpus-quadratic, so the guard must refuse BEFORE running
    val data = (1L to 3000L).map(i => (i, i * 7 % 2999))
    val e = intercept[IllegalArgumentException] {
      Profiling.kendallTau(data.toDF("x", "y"), "x", "y",
        maxCells = 1000L)
    }
    assert(e.getMessage.contains("maxCells"))
    // the same data passes once binned to the contract's domain size
    val binned = data.map { case (x, y) => (x / 100, y / 100) }
    val got = Profiling.kendallTau(binned.toDF("x", "y"), "x", "y",
      maxCells = 1000L).head()
    assert(got.getAs[Long]("n") == 3000L)
  }

  // synthetic corpus: text with a controlled stopword fraction; label
  // correlates with that fraction but imperfectly (the calibration-metric
  // operators must see a non-degenerate confusion matrix)
  private def calCorpus(n: Int, seed: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val m = 2 + rnd.nextInt(8)
      val k = rnd.nextInt(m + 1)
      val toks = Seq.fill(k)("the") ++ Seq.fill(m - k)("zzz")
      val frac = k.toDouble / m
      val lang = if (rnd.nextDouble() < 0.2 + 0.6 * frac) "en" else "de"
      (i.toLong, toks.mkString(" "), lang)
    }
  }

  test("calibrationMetrics matches direct Brier/ECE/MCC recomputation") {
    val rows = calCorpus(600, 44)
    val df = rows.toDF("doc_id", "text", "lang")
    val got = MlEval.calibrationMetrics(df, "lang = 'en'").head()
    // naive recomputation on the same milli-unit grid
    val sy = rows.map { case (_, text, lang) =>
      val t = text.split(" ").filter(_.nonEmpty)
      val s = if (t.isEmpty) 0L
        else math.floor(1000.0 * t.count(Set("the", "a", "and", "of", "to")) /
          t.length).toLong
      (s, if (lang == "en") 1L else 0L)
    }
    val n = sy.size
    val brier = sy.map { case (s, y) =>
      val d = s - 1000 * y; d * d }.sum.toDouble / (n * 1e6)
    val ece = sy.groupBy { case (s, _) => math.min(s / 100, 9) }.values
      .map(b => math.abs(b.map(_._1).sum - 1000 * b.map(_._2).sum))
      .sum.toDouble / (n * 1000.0)
    val tp = sy.count(p => p._1 >= 500 && p._2 == 1).toDouble
    val fp = sy.count(p => p._1 >= 500 && p._2 == 0).toDouble
    val tn = sy.count(p => p._1 < 500 && p._2 == 0).toDouble
    val fn = sy.count(p => p._1 < 500 && p._2 == 1).toDouble
    val mcc = (tp * tn - fp * fn) /
      math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    def d4(x: Double) = new java.math.BigDecimal(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).toPlainString
    assert(got.getAs[Long]("n") == n.toLong)
    assert(got.getAs[String]("brier") == d4(brier))
    assert(got.getAs[String]("ece") == d4(ece))
    assert(got.getAs[String]("mcc") == d4(mcc))
    assert(got.getAs[Long]("tp") == tp.toLong &&
      got.getAs[Long]("fn") == fn.toLong)
  }

  test("isotonicCalibration equals stack-based PAV and is monotone") {
    val rows = calCorpus(800, 45)
    val df = rows.toDF("doc_id", "text", "lang")
    val got = MlEval.isotonicCalibration(df, "lang = 'en'")
      .select("bin", "n", "pos", "iso_rate")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // classic PAV over the same bins: pool adjacent violating blocks
    val binned = rows.map { case (_, text, lang) =>
      val t = text.split(" ").filter(_.nonEmpty)
      val s = if (t.isEmpty) 0L
        else math.floor(1000.0 * t.count(Set("the", "a", "and", "of", "to")) /
          t.length).toLong
      (math.min(s / 100, 9), if (lang == "en") 1L else 0L)
    }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, g) => (b, g.size.toLong, g.map(_._2).sum) }
    case class Block(n: Long, pos: Long) { def r: Double = pos.toDouble / n }
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Block, Int)]
    for ((_, n, pos) <- binned) {
      var blk = Block(n, pos); var cnt = 1
      while (stack.nonEmpty && stack.last._1.r >= blk.r) {
        val (top, c) = stack.remove(stack.size - 1)
        blk = Block(top.n + blk.n, top.pos + blk.pos); cnt += c
      }
      stack += ((blk, cnt))
    }
    val pav = stack.flatMap { case (b, c) => Seq.fill(c)(b.r) }
    def d4(x: Double) = new java.math.BigDecimal(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).toPlainString
    assert(got.map(_._4).toSeq == pav.map(d4).toSeq)
    // fitted rates never decrease
    val rates = got.map(_._4.toDouble)
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b })
  }

  private def sprtEvents(xs: Seq[Int]): org.apache.spark.sql.DataFrame =
    xs.zipWithIndex.map { case (x, i) =>
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        1700000000L + i)), i.toLong,
        if (x == 1) "purchase" else "view")
    }.toDF("ts", "event_id", "event_type")

  private def naiveSprt(xs: Seq[Int]): (String, Int, Long, Long) = {
    var k = 0L; var llr = 0L
    for ((x, i) <- xs.zipWithIndex) {
      k += x; llr = k * 100083L + (i + 1 - k) * -25002L
      if (llr >= 2944438L) return ("accept_h1", i + 1, k, llr)
      if (llr <= -2944439L) return ("accept_h0", i + 1, k, llr)
    }
    ("continue", xs.size, k, llr)
  }

  test("sprt matches the sequential replay on both decision directions") {
    val rnd = new scala.util.Random(46)
    // high-rate stream → accept_h1; low-rate stream → accept_h0
    for (p <- Seq(0.35, 0.05)) {
      val xs = Seq.fill(3000)(if (rnd.nextDouble() < p) 1 else 0)
      val want = naiveSprt(xs)
      assert(want._1 != "continue") // the streams are long enough to decide
      val got = EventsOps.sprt(sprtEvents(xs), "purchase").head()
      assert((got.getAs[String]("decision"), got.getAs[Long]("n_decide"),
        got.getAs[Long]("k_decide"), got.getAs[Long]("llr_micro")) ==
        ((want._1, want._2.toLong, want._3, want._4)))
    }
  }

  test("readability matches the per-doc Flesch recomputation") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran away quickly!", "en", "s1"),
      (2L, "Incomprehensible bureaucratic administration", "en", "s1"),
      (3L, "Go. Stop. Run. Hide.", "en", "s2"),
      (4L, "xyz qqq zzz", "de", "s2")) // no vowels: 1 syllable per token
      .toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.readability(docs)
      .select("source", "n_docs", "avg_flesch")
      .as[(String, Long, String)].collect().sortBy(_._1)
    def syl(tok: String): Long =
      math.max(1, "[aeiouy]+".r.findAllIn(tok.toLowerCase).size).toLong
    def score(text: String): Long = {
      val w = text.split(" ").count(_.nonEmpty).toLong
      val s = math.max(1, "[.!?]+".r.findAllIn(text).size).toLong
      val sy = text.split(" ").filter(_.nonEmpty).map(syl).sum
      math.floor(1e6 * (206.835 - 1.015 * w.toDouble / s -
        84.6 * sy.toDouble / w)).toLong
    }
    val want = Seq(
      (1L, "The cat sat. The dog ran away quickly!", "s1"),
      (2L, "Incomprehensible bureaucratic administration", "s1"),
      (3L, "Go. Stop. Run. Hide.", "s2"),
      (4L, "xyz qqq zzz", "s2"))
      .groupBy(_._3).toSeq.sortBy(_._1)
      .map { case (src, g) =>
        (src, g.size.toLong, g.map(d => score(d._2)).sum.toDouble /
          (g.size * 1e6)) }
    for ((g, w) <- got.zip(want)) {
      assert(g._1 == w._1 && g._2 == w._2)
      assert(g._3 == new java.math.BigDecimal(w._3)
        .setScale(4, java.math.RoundingMode.HALF_UP).toPlainString)
    }
  }

  test("shapleyAttribution matches naive subset enumeration + efficiency") {
    // users with controlled touch sets and fast/slow conversions
    val h = 3600000000L // one hour in micros
    def ev(u: Long, t: Long, typ: String) =
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0)
        .plusNanos(t * 1000)), u, typ)
    val events = Seq(
      // u1: {click} then fast purchase
      ev(1, 0, "click"), ev(1, h, "purchase"),
      // u2: {click,view} then slow purchase (> 24 h)
      ev(2, 0, "click"), ev(2, h, "view"), ev(2, 30 * h, "purchase"),
      // u3: {} fast purchase (purchase only)
      ev(3, 0, "purchase"),
      // u4: {error,signup} fast purchase
      ev(4, 0, "error"), ev(4, h, "signup"), ev(4, 2 * h, "purchase"),
      // u5: {view} never converts
      ev(5, 0, "view"), ev(5, h, "view"),
      // u6: {click} slow purchase
      ev(6, 0, "click"), ev(6, 48 * h, "purchase"))
      .toDF("ts", "user_id", "event_type")
    val got = EventsOps.shapleyAttribution(events)
      .select("channel", "phi24_milli")
      .as[(String, Long)].collect().toMap
    // naive: v over exact masks, missing = 0; full 16-subset enumeration
    val users = Map( // mask -> (users, fastConvs)
      1L -> (2L, 1L), 9L -> (1L, 0L), 0L -> (1L, 1L),
      6L -> (1L, 1L), 8L -> (1L, 0L))
    def v(mask: Long): Long =
      users.get(mask).map { case (n, c) => 1000L * c / n }.getOrElse(0L)
    val f = Array(1L, 1L, 2L, 6L, 24L)
    val want = Seq(("click", 1), ("error", 2), ("signup", 4), ("view", 8))
      .map { case (name, b) =>
        name -> (1 to 15).filter(s => (s & b) != 0).map { s =>
          val c = f(Integer.bitCount(s) - 1) * f(4 - Integer.bitCount(s))
          c * (v(s) - v(s ^ b))
        }.sum
      }.toMap
    assert(got == want)
    // efficiency: Σφ·24 = 24·(v(full) − v(∅))
    assert(got.values.sum == 24L * (v(15) - v(0)))
  }

  test("diffInDiff recovers a planted treatment effect exactly") {
    // control: 10.0 pre and post (no trend); treated: 10.0 pre, 13.5 post
    // → DiD = +3.5. Midpoint of [0, 100] s is at 50 s.
    def ev(u: Long, sec: Long, v: Double) =
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)),
        u, "view", v)
    val rows = Seq(
      ev(1, 0, 10.0), ev(1, 100, 13.5),  // treated (odd)
      ev(3, 10, 10.0), ev(3, 90, 13.5),  // treated
      ev(2, 0, 10.0), ev(2, 100, 10.0),  // control
      ev(4, 20, 10.0), ev(4, 80, 10.0))  // control
    val got = EventsOps.diffInDiff(
      rows.toDF("ts", "user_id", "event_type", "value")).head()
    assert(got.getAs[Long]("n_t_pre") == 2L &&
      got.getAs[Long]("n_t_post") == 2L)
    assert(got.getAs[String]("mean_t_post") == "13.5000")
    assert(got.getAs[String]("mean_c_post") == "10.0000")
    assert(got.getAs[String]("did") == "3.5000")
  }

  test("fellegiSunter scores match the per-field weight recomputation") {
    val cust = Seq(
      // composite block (nation 1, prefix "Customer#0000000"): near-
      // identical names, close balances, same segment
      (1L, "Customer#000000001", 1L, 100.00, "AUTO"),
      (2L, "Customer#000000002", 1L, 150.00, "AUTO"),
      // nation 1 but a DIFFERENT name prefix: out of the candidate set
      // by the declared-recall contract, despite sharing the nationkey
      (3L, "Zed#999", 1L, 9000.00, "HOUSE"),
      // same prefix as 1/2 but nation 2: blocked out by the nation key
      (4L, "Customer#000000004", 2L, 100.00, "AUTO"),
      // composite block (nation 1, prefix "Zed#9990"): high-JW names,
      // balance and segment both DISAGREE
      (5L, "Zed#9990xx", 1L, 9000.00, "HOUSE"),
      (6L, "Zed#9990xy", 1L, 100.00, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    val got = StringSim.fellegiSunter(cust)
      .select("a", "b", "jw_agree", "bal_agree", "seg_agree", "score_micro")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // pairs only within composite blocks: (1,2) and (5,6)
    assert(got.map(r => (r._1, r._2)).toSet == Set((1L, 2L), (5L, 6L)))
    def score(jw: Long, bal: Long, seg: Long) =
      (if (jw == 1) 2197224L else -2197225L) +
        (if (bal == 1) 3555348L else -1183771L) +
        (if (seg == 1) 1504077L else -2079442L)
    val byPair = got.map(r => (r._1, r._2) -> r).toMap
    // (1,2): all three fields agree
    assert(byPair((1L, 2L))._6 == score(1, 1, 1))
    assert(byPair((1L, 2L))._3 == 1L)
    // (5,6): names agree (one trailing edit), balance + segment disagree
    assert(byPair((5L, 6L))._6 == score(1, 0, 0))
    assert(byPair((5L, 6L))._4 == 0L && byPair((5L, 6L))._5 == 0L)
    // ordering: the all-agree pair ranks first
    assert(got.head._1 == 1L && got.head._2 == 2L)
  }

  test("linkagePairs composite blocking bounds per-block pair counts") {
    // nationkey alone is 25 constant blocks — pairs grow quadratically
    // with customers. The composite (nation, prefix-minus-2) key must
    // keep the max block size CONSTANT as the table grows, so pairs
    // grow linearly. Digit-tailed names: suffix domain is 100.
    def gen(n: Int) = (0 until n).map(i =>
      (i.toLong, f"Customer#$i%09d", (i % 25).toLong, i * 1.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    def pairCount(n: Int): Long = StringSim.linkagePairs(gen(n)).count()
    val p1 = pairCount(500)
    val p10 = pairCount(5000)
    // linear growth: 10x the customers must give ~10x the pairs, far
    // below the ~100x a fixed-block quadratic scheme would produce
    assert(p10 <= 12 * p1 + 100, s"pairs grew superlinearly: $p1 -> $p10")
    // structural bound: no block exceeds the suffix domain (100), so
    // per-block pair count is <= C(100,2) regardless of table size
    val maxBlock = gen(5000)
      .groupBy(col("c_nationkey"),
        col("c_name").substr(lit(1),
          greatest(length(col("c_name")) - 2, lit(1))))
      .count().agg(max("count")).head().getLong(0)
    assert(maxBlock <= 100L, s"block size $maxBlock exceeds suffix domain")
  }

  test("jaroWinklerSelfJoin == brute force under the declared block contract") {
    // random corpus over a 3-letter alphabet (dense prefix collisions,
    // lengths straddling every bucket boundary): the (prefix ×
    // length-bucket) home/probe candidate generation must find EVERY
    // pair satisfying the declared predicate, exactly once
    val rnd = new scala.util.Random(91)
    val corpus = (0 until 400).map(_ =>
      (4 + rnd.nextInt(9), "") match { case (n, _) =>
        (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString }
    ).distinct
    val got = StringSim.jaroWinklerSelfJoin(
        corpus.toDF("key"), minSim = 0.8)
      .as[(String, String, String)].collect().sorted.toSeq
    def jwScalar(a: String, b: String): Double =
      Seq((a, b)).toDF("x", "y")
        .select(graft.functions.JaroWinkler.of(col("x"), col("y")))
        .as[Double].head()
    val jwAll = (for {
      a <- corpus; b <- corpus
      if a < b && a.take(2) == b.take(2) &&
        math.abs(a.length - b.length) <= 2
    } yield (a, b)).toDF("key_a", "key_b")
      .withColumn("s", graft.functions.JaroWinkler.of(col("key_a"), col("key_b")))
      .filter(col("s") >= 0.8)
      .select(col("key_a"), col("key_b"),
        QueryDef.dec4(col("s")).as("sim"))
      .as[(String, String, String)].collect().sorted.toSeq
    assert(got == jwAll, "self-join must equal brute force exactly")
    // exactly-once: no duplicate pairs from the ≤3-bucket probe explode
    assert(got.map(r => (r._1, r._2)).distinct.size == got.size)
    assert(got.nonEmpty, "degenerate test: no qualifying pairs generated")
  }

  test("jaroWinklerSelfJoin raises on a planted hot block") {
    // the (prefix, length-bucket) domain is a constant of the alphabet:
    // a corpus concentrating in one block grows within-block pairs
    // quadratically, so the enforced contract must REFUSE it loudly
    // (round-11 verdict weak item 3) instead of hanging a task at scale
    // prefix-2 block "aa" holds all 50 keys (len 6, one bucket); prefix-4
    // blocks "aa00".."aa49" hold one key each
    val hot = (0 until 50).map(i => f"aa$i%02d99")
    val ex = intercept[IllegalArgumentException] {
      StringSim.jaroWinklerSelfJoin(hot.toDF("key"), minSim = 0.8,
        maxBlock = 20L).count()
    }
    assert(ex.getMessage.contains("maxBlock"))
    // and the same corpus under a data-multiplying prefix (4 bytes —
    // the q268 shape) subdivides below the cap and runs fine
    val ok = StringSim.jaroWinklerSelfJoin(hot.toDF("key"), minSim = 0.8,
      prefix = 4, maxBlock = 20L)
    assert(ok.count() >= 0L)
  }

  test("kruskalWallis matches the naive midrank recomputation") {
    val rnd = new scala.util.Random(48)
    val data = (1 to 500).map { _ =>
      val g = "g" + rnd.nextInt(3)
      // group g2 shifted upward; heavy ties from the small value domain
      (g, (rnd.nextInt(20) + (if (g == "g2") 6 else 0)).toLong)
    }
    val got = Profiling.kruskalWallis(data.toDF("grp", "v"), "grp", "v")
      .head()
    // naive: pooled midranks, H, tie correction
    val n = data.size
    val sorted = data.map(_._2).sorted
    val rankOf = data.map(_._2).distinct.map { v =>
      val below = sorted.count(_ < v); val c = sorted.count(_ == v)
      v -> (below + (c + 1) / 2.0)
    }.toMap
    val hStat = {
      val byG = data.groupBy(_._1).values
      // mirror the engine's per-group ⌊R2²/(4n_g)⌋ floor (R2 = doubled
      // midrank sum), then the single trailing double formula
      val s = byG.map { g =>
        val r2 = g.map(x => 2.0 * rankOf(x._2)).sum
        math.floor(r2 * r2 / (4.0 * g.size))
      }.sum
      12.0 / (n * (n + 1.0)) * s - 3 * (n + 1.0)
    }
    val tt = data.groupBy(_._2).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val corr = 1.0 - tt / (math.pow(n, 3) - n)
    def d4(x: Double) = new java.math.BigDecimal(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).toPlainString
    assert(got.getAs[Long]("n") == n.toLong)
    assert(got.getAs[Long]("k") == 3L)
    // the floored per-group term loses < 1 on each of 3 groups; at this n
    // the dec4 strings still agree with the unfloored naive value
    assert(got.getAs[String]("h") == d4(hStat))
    assert(got.getAs[String]("h_tie_corrected") == d4(hStat / corr))
  }

  test("cuped: paired covariates give theta = 1 and recover the planted lift") {
    // users come in (control, treated) pairs with IDENTICAL pre-period
    // values, so cov(X, treatment) = 0 exactly: theta = cov(X,Y)/var(X)
    // = 1 and the adjusted diff equals the planted +5.0 exactly
    def ev(u: Long, sec: Long, v: Double) =
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)),
        u, "view", v)
    val rows = (0 until 20).flatMap { i =>
      val base = 3.0 + i // pre-period value, shared by the pair
      val even = 2L * i; val odd = 2L * i + 1 // control / treated
      Seq(ev(even, 0, base), ev(even, 100, base),
        ev(odd, 0, base), ev(odd, 100, base + 5.0))
    }
    val got = EventsOps.cuped(
      rows.toDF("ts", "user_id", "event_type", "value")).head()
    assert(got.getAs[Long]("n_t") == 20L && got.getAs[Long]("n_c") == 20L)
    assert(got.getAs[String]("theta") == "1.0000")
    assert(got.getAs[String]("raw_diff") == "5.0000")
    assert(got.getAs[String]("cuped_diff") == "5.0000")
  }

  test("bradleyTerry: MM converges to the 2-item closed form") {
    // w(A,B)=3, w(B,A)=1 → P(A beats B)=3/4 → θA/θB = 3; with Σθ = 2·10⁶
    // the fixpoint is θA = 1.5e6, θB = 0.5e6 (integer state → ±1 micro)
    val th = Preference.mmFit(Map(("A", "B") -> 3L, ("B", "A") -> 1L))
    assert(math.abs(th("A") - 1500000L) <= 1L, th.toString)
    assert(math.abs(th("B") - 500000L) <= 1L, th.toString)
  }

  test("bradleyTerry end-to-end: duel counts and rank order") {
    // doc duels: (0,1), (2,3), (4,5) — en always beats de by length;
    // es beats en once
    val docs = Seq(
      (0L, "en", 100L), (1L, "de", 50L),   // en beats de
      (2L, "de", 30L), (3L, "en", 80L),    // en beats de
      (4L, "es", 90L), (5L, "en", 40L))    // es beats en
      .toDF("doc_id", "lang", "n_chars")
      .withColumn("text", org.apache.spark.sql.functions.lit("x"))
    val got = Preference.bradleyTerry(docs)
      .select("lang", "wins", "games")
      .as[(String, Long, Long)].collect()
    val m = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("en") == ((2L, 3L)) && m("de") == ((0L, 2L)) &&
      m("es") == ((1L, 1L)))
    // undefeated es ranks above en; winless de ranks last
    assert(got.head._1 == "es" && got.last._1 == "de")
  }

  test("wassersteinDrift equals the naive sorted-sample recomputation") {
    val rnd = new scala.util.Random(50)
    // unequal slice sizes, shifted B distribution, cent-integer values
    val rows = (1 to 700).map { i =>
      val side = i % 3 == 0 // a third on side A
      val v = (if (side) rnd.nextInt(300) else 50 + rnd.nextInt(300)).toLong
      (v, i.toLong)
    }
    val got = Profiling.wassersteinDrift(
      rows.toDF("vc", "event_id"), "vc",
      org.apache.spark.sql.functions.col("event_id") % 3 === 0).head()
    val a = rows.filter(_._2 % 3 == 0).map(_._1).sorted
    val b = rows.filter(_._2 % 3 != 0).map(_._1).sorted
    // ∫|Fa−Fb| over the integer grid, exactly
    val lo = (a ++ b).min; val hi = (a ++ b).max
    var num = BigInt(0)
    for (x <- lo until hi) {
      val fa = BigInt(a.count(_ <= x)) * b.size
      val fb = BigInt(b.count(_ <= x)) * a.size
      num += (fa - fb).abs
    }
    val want = num.toDouble / (a.size.toDouble * b.size * 100.0)
    assert(got.getAs[Long]("n_a") == a.size.toLong)
    assert(got.getAs[Long]("n_b") == b.size.toLong)
    assert(got.getAs[String]("w1") == new java.math.BigDecimal(want)
      .setScale(4, java.math.RoundingMode.HALF_UP).toPlainString)
  }

  test("sourceInfluence: dropping the long-doc source lowers the mean") {
    val docs = Seq(
      (1L, "en", "big", 1000L), (2L, "en", "big", 1200L),
      (3L, "de", "small", 100L), (4L, "en", "small", 120L),
      (5L, "de", "small", 80L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val got = CorpusStats.sourceInfluence(docs)
      .select("source", "n_docs", "mean_chars_without", "chars_influence",
        "en_frac_without")
      .as[(String, Long, String, String, String)].collect()
      .map(r => r._1 -> r).toMap
    // overall mean = 2500/5 = 500; without big = 300/3 = 100
    assert(got("big")._3 == "100.0000")
    assert(got("big")._4 == "-400.0000")
    // without small = 2200/2 = 1100 → influence +600
    assert(got("small")._4 == "600.0000")
    // en fraction without big: 1/3 of the remaining docs are en
    assert(got("big")._5 == "0.3333")
  }

  test("matryoshkaEval: identical prefixes give perfect recall") {
    // vectors whose LAST 48 dims are zero: the 16-dim prefix carries all
    // the signal, so truncated top-k must equal full top-k exactly
    val rnd = new scala.util.Random(51)
    val emb = (0L until 60L).map { i =>
      (i, (Seq.fill(16)(rnd.nextInt(100) / 100.0f) ++
        Seq.fill(48)(0.0f)), 0)
    }.toDF("vec_id", "embedding", "label")
    val got = Similarity.matryoshkaEval(emb, dims = 16, k = 10)
      .select("qid", "overlap").as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(got.values.forall(_ == 10L), got.toString)
  }

  test("collocationsG2 matches the naive 2x2 log-likelihood recomputation") {
    val rnd = new scala.util.Random(52)
    // 'new york' planted as a strong collocation inside noise
    val vocab = Vector("alpha", "beta", "gamma", "delta")
    val docs = (1 to 120).map { i =>
      val noise = Seq.fill(8)(vocab(rnd.nextInt(vocab.size)))
      val toks =
        if (i % 2 == 0) noise.take(4) ++ Seq("new", "york") ++ noise.drop(4)
        else noise
      (i.toLong, toks.mkString(" "))
    }
    val got = CorpusStats.collocationsG2(
      docs.toDF("doc_id", "text"), minCount = 5L, k = 5)
      .select("a", "b", "n_ab", "g2_micro")
      .as[(String, String, Long, Long)].collect()
    // naive bigram contingency + G²
    val bigrams = docs.flatMap(d =>
      d._2.split(" ").filter(_.nonEmpty).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq)
    val cnt = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val raM = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cbM = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = bigrams.size.toLong
    def g2(a: String, b: String): Long = {
      val c = cnt((a, b)); val ra = raM(a); val cb = cbM(b)
      def t(o: Long, r: Long, cc: Long) =
        if (o > 0) o.toDouble * math.log(o.toDouble * n / (r.toDouble * cc))
        else 0.0
      math.floor(1e6 * (2.0 * (t(c, ra, cb) + t(ra - c, ra, n - cb) +
        t(cb - c, n - ra, cb) + t(n - ra - cb + c, n - ra, n - cb))))
        .toLong
    }
    // the planted pair tops the list with the exact naive statistic
    assert(got.head._1 == "new" && got.head._2 == "york")
    assert(got.head._3 == cnt(("new", "york")))
    assert(got.head._4 == g2("new", "york"))
    got.foreach(r => assert(r._4 == g2(r._1, r._2), r.toString))
  }

  test("kTruss equals the naive peel; cliques survive, trees die") {
    // a 5-clique (every edge in 3 triangles), a triangle (support 1 each
    // at k=4 → dies), a path (no triangles → dies), plus random noise
    val clique = for (i <- 100L to 104L; j <- (i + 1) to 104L) yield (i, j)
    val tri = Seq((110L, 111L), (111L, 112L), (110L, 112L))
    val path = Seq((120L, 121L), (121L, 122L), (122L, 123L))
    val rnd = new scala.util.Random(53)
    val noise = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val edges = (clique ++ tri ++ path ++ noise)
    val got = Graph.kTruss(edges.toDF("a", "b"), k = 4, rounds = 6)
      .select("a", "b", "support").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // naive peel to fixpoint on the same canonical edge set
    var es = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter(p => p._1 != p._2).distinct.toSet
    def supports(s: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val nodes = s.flatMap(e => Seq(e._1, e._2)).toSeq
      val pairs = for {
        e <- s.toSeq; n <- nodes
        if n != e._1 && n != e._2
        if s(( math.min(n, e._1), math.max(n, e._1))) &&
          s((math.min(n, e._2), math.max(n, e._2)))
      } yield e
      pairs.groupBy(identity).view.mapValues(_.size).toMap
    }
    var changed = true
    while (changed) {
      val sup = supports(es)
      val keep = es.filter(e => sup.getOrElse(e, 0) >= 2)
      changed = keep.size != es.size; es = keep
    }
    val naiveSup = supports(es)
    assert(got.keySet == es, s"edge sets differ: ${got.keySet} vs $es")
    got.foreach { case (e, s) =>
      assert(s == naiveSup.getOrElse(e, 0).toLong, s"support at $e") }
    // every clique edge survived; triangle and path edges are gone
    clique.foreach(e => assert(got.contains(e)))
    (tri ++ path).foreach(e => assert(!got.contains(e)))
  }

  test("matchingAtt removes a planted covariate confound the naive diff keeps") {
    // covariate = pre-period event count; outcome = x + 5·treated.
    // treated users skew to high x, so the naive diff overstates the +5
    // effect; exact-x matching must recover 5.0000.
    def evs(u: Long, x: Int, y: Double) = {
      val pre = (0 until x).map(i =>
        (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i)),
          u, "view", 0.0))
      val post = Seq((java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(1000000)), u, "view", y))
      pre ++ post
    }
    val rows =
      // treated (odd ids): x ∈ {3, 4}; controls (even): x ∈ {1, 2, 3, 4}
      evs(1, 3, 3 + 5.0) ++ evs(3, 4, 4 + 5.0) ++ evs(5, 4, 4 + 5.0) ++
        evs(2, 1, 1.0) ++ evs(4, 2, 2.0) ++ evs(6, 3, 3.0) ++ evs(8, 4, 4.0)
    val got = EventsOps.matchingAtt(
      rows.toDF("ts", "user_id", "event_type", "value")).head()
    assert(got.getAs[Long]("n_treated") == 3L)
    assert(got.getAs[String]("att") == "5.0000")
    // the confounded naive diff: mean_t = (8+9+9)/3, mean_c = (1+2+3+4)/4
    assert(got.getAs[String]("raw_diff") == "6.1667")
  }

  test("sampleSizePlan matches the closed-form power computation") {
    val rnd = new scala.util.Random(54)
    val vals = Seq.fill(400)(1.0 + rnd.nextInt(2000) / 100.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i)),
        i.toLong, "view", v)
    }.toDF("ts", "user_id", "event_type", "value")
    val got = EventsOps.sampleSizePlan(df)
      .select("mde_pct", "n_per_arm").as[(Int, Long)].collect().toMap
    val cents = vals.map(v => math.round(v * 100))
    val n = cents.size.toDouble
    val mean = cents.sum / n
    val varc = cents.map(c => c.toDouble * c).sum / n - mean * mean
    for (mde <- Seq(1, 2, 5, 10)) {
      val delta = mean * mde / 100.0
      val want = math.ceil(2.0 * varc * (7848879.0 / 1e6) /
        (delta * delta)).toLong
      assert(got(mde) == want, s"mde $mde")
    }
  }

  test("quantileTreatmentEffects recovers a planted constant shift") {
    // control deciles of 0..999; treated = the same values + 500 cents
    val rows = (0 until 1000).flatMap { i =>
      Seq((java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i)),
        2L * i, "view", i / 100.0), // control (even users)
        (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i)),
          2L * i + 1, "view", i / 100.0 + 5.0)) // treated
    }
    val got = EventsOps.quantileTreatmentEffects(
      rows.toDF("ts", "user_id", "event_type", "value"))
      .select("p_pct", "qte").as[(Int, String)].collect()
    assert(got.length == 9)
    got.foreach { case (p, qte) => assert(qte == "500.0000", s"p=$p") }
  }

  test("emFit recovers the generating mixture from a pattern histogram") {
    // true mixture: λ=0.2, m=(0.9, 0.8, 0.7), u=(0.1, 0.2, 0.3);
    // exact expected pattern counts over 1e6 pairs
    val lam = 0.2; val m = Seq(0.9, 0.8, 0.7); val u = Seq(0.1, 0.2, 0.3)
    val hist = (0 to 7).map { p =>
      val g = Seq(p & 1, (p >> 1) & 1, (p >> 2) & 1)
      def lk(ps: Seq[Double]) = g.zip(ps)
        .map { case (gi, pi) => if (gi == 1) pi else 1 - pi }.product
      p -> math.round(1e6 * (lam * lk(m) + (1 - lam) * lk(u)))
    }.toMap
    val (lmGot, mGot, uGot) = StringSim.emFit(hist)
    // 10 EM iterations from a distant init land within a few points of
    // the truth (full convergence would need more rounds — the iteration
    // count is part of the oracle contract, so tolerance, not rounds)
    assert(math.abs(lmGot - 200000L) < 60000L, s"lambda $lmGot")
    for (i <- 0 to 2) {
      assert(math.abs(mGot(i) - (m(i) * 1e6).toLong) < 100000L,
        s"m$i ${mGot(i)}")
      assert(math.abs(uGot(i) - (u(i) * 1e6).toLong) < 100000L,
        s"u$i ${uGot(i)}")
    }
  }

  test("fellegiSunterEm: the all-agree pattern outranks the all-disagree") {
    val cust = (1 to 120).map { i =>
      // half the rows come in near-duplicate pairs (same segment, close
      // balance, similar name); the rest are singletons
      val base = i / 2
      (i.toLong, f"Customer#${base}%09d", 1L,
        100.0 * base + (if (i % 2 == 0) 0.0 else 1.0),
        if (i % 2 == 0 || i % 4 == 1) "AUTO" else "SEG" + (i % 7))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
    val got = StringSim.fellegiSunterEm(cust)
      .select("pattern", "match_w").as[(Int, String)].collect().toMap
    assert(got.size == 8)
    assert(got(7).toDouble > got(0).toDouble,
      s"w(all-agree)=${got(7)} !> w(all-disagree)=${got(0)}")
  }

  test("timedFunnel: deadlines and strict anchoring enforced exactly") {
    val h = 3600L
    def ev(u: Long, sec: Long, t: String) =
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)),
        u, t, 0.0)
    val rows = Seq(
      // u1: full funnel inside both windows
      ev(1, 0, "view"), ev(1, 2 * h, "click"), ev(1, 50 * h, "purchase"),
      // u2: click too late (> 24 h after first view)
      ev(2, 0, "view"), ev(2, 30 * h, "click"), ev(2, 31 * h, "purchase"),
      // u3: click on time, purchase too late (> 7 d after the click)
      ev(3, 0, "view"), ev(3, h, "click"), ev(3, 200 * h, "purchase"),
      // u4: purchase BEFORE the click must not count (strict anchor)
      ev(4, 0, "view"), ev(4, 2 * h, "purchase"), ev(4, 3 * h, "click"),
      // u5: anchored on the FIRST view — the click is within 24 h of the
      // second view but not the first, so it must not qualify
      ev(5, 0, "view"), ev(5, 30 * h, "view"), ev(5, 40 * h, "click"),
      // u6: no view at all
      ev(6, 0, "click"), ev(6, h, "purchase"))
    val got = EventsOps.timedFunnel(
      rows.toDF("ts", "user_id", "event_type", "value")).head()
    assert(got.getAs[Long]("n_users") == 6L)
    assert(got.getAs[Long]("n_view") == 5L)
    // qualifying clicks: u1 (2 h), u3 (1 h), u4 (3 h)
    assert(got.getAs[Long]("n_click_24h") == 3L)
    // qualifying purchases: u1 only (u3 late, u4's was pre-click)
    assert(got.getAs[Long]("n_purchase_7d") == 1L)
    assert(got.getAs[String]("p_click") == "0.6000")
  }

  test("wilsonRates matches the closed-form interval on planted adoption") {
    val h = 3600L
    def ev(u: Long, sec: Long, t: String) =
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)),
        u, t, 0.0)
    // 10 users; 'click' adopted first-day by 7 (u8 clicks only on day 3)
    val rows = (1L to 10L).flatMap { u =>
      val base = Seq(ev(u, 0, "view"))
      if (u <= 7) base :+ ev(u, 2 * h, "click")
      else if (u == 8) base :+ ev(u, 72 * h, "click")
      else base
    }
    val got = EventsOps.wilsonRates(
      rows.toDF("ts", "user_id", "event_type", "value"))
      .select("event_type", "n_users", "k", "rate", "lo", "hi")
      .as[(String, Long, Long, String, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("click")._2 == 10L && got("click")._3 == 7L)
    assert(got("view")._3 == 10L)
    def wilson(k: Long, n: Long): (Double, Double) = {
      val z = 1959963.0 / 1e6; val z2 = 3841458.0 / 1e6
      val p = k.toDouble / n
      val denom = 1.0 + z2 / n
      val center = (p + z2 / (2.0 * n)) / denom
      val half = z * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n)) / denom
      (center - half, center + half)
    }
    def d4(x: Double) = new java.math.BigDecimal(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).toPlainString
    val (lo, hi) = wilson(7, 10)
    assert(got("click")._5 == d4(lo) && got("click")._6 == d4(hi))
    // the k = n interval still tops out below/at 1 and above 0
    assert(got("view")._5.toDouble > 0.6 && got("view")._6 == "1.0000")
  }

  test("sprt reports continue with totals when the stream ends undecided") {
    // alternating 1-in-5 exactly tracks p = 0.20, between the hypotheses
    val xs = (0 until 200).map(i => if (i % 5 == 0) 1 else 0)
    val want = naiveSprt(xs)
    assert(want._1 == "continue")
    val got = EventsOps.sprt(sprtEvents(xs), "purchase").head()
    assert(got.getAs[String]("decision") == "continue")
    assert(got.getAs[Long]("n_decide") == 200L)
    assert(got.getAs[Long]("k_decide") == 40L)
    assert(got.getAs[Long]("llr_micro") == want._4)
  }
}
