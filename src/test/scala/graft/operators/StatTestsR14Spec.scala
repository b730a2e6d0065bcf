package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 operator laws: Wilcoxon signed-rank, Hellinger drift,
  * Holt–Winters seasonal smoothing, periodogram, DeLong AUC comparison,
  * partial correlation, Tukey HSD, overdispersion. */
class StatTestsR14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- wilcoxonSignedRank ---------------------------------------------------

  test("wilcoxon: hand-computed tie-free and tied fixtures") {
    // d = (1, -2, 3, 4): ranks of |d| are 1..4, W+ = 1+3+4 = 8 → w2 = 16
    val a = Profiling.wilcoxonSignedRank(Seq(1L, -2L, 3L, 4L).toDF("d"))
      .head()
    assert(a.getAs[Long]("n") == 4L)
    assert(a.getAs[Long]("w2") == 16L)
    // tie-free: var48 = 2·4·5·9 − Σ(t³−t) = 360 − 0 ... t=1 groups: 0
    assert(a.getAs[Long]("var48") == 360L)
    // z = (16 − 10)·sqrt(12/360) = 6·0.18257 = 1.0954
    assert(a.getAs[String]("z") == "1.0954")

    // d = (1, -1, 2, 2): midranks 1.5/1.5 and 3.5/3.5,
    // W+ = 1.5 + 3.5 + 3.5 = 8.5 → w2 = 17; ties Σ(t³−t) = 12
    val b = Profiling.wilcoxonSignedRank(Seq(1L, -1L, 2L, 2L).toDF("d"))
      .head()
    assert(b.getAs[Long]("w2") == 17L)
    assert(b.getAs[Long]("var48") == 360L - 12L)
  }

  test("wilcoxon: symmetric differences sit near zero, shifted go positive") {
    val sym = (1L to 200L).flatMap(i => Seq(i, -i))
    val zSym = Profiling.wilcoxonSignedRank(sym.toDF("d"))
      .head().getAs[String]("z").toDouble
    assert(math.abs(zSym) < 0.01, s"symmetric z $zSym")
    val pos = (1L to 400L).map(i => i)
    val zPos = Profiling.wilcoxonSignedRank(pos.toDF("d"))
      .head().getAs[String]("z").toDouble
    assert(zPos > 10.0, s"all-positive z $zPos")
  }

  // ---- hellingerDrift -------------------------------------------------------

  test("hellinger: identical halves ≈ 0, disjoint halves = 1") {
    val same = (0L until 4000L).map(i => (i % 16 * 10L, i / 16))
      .toDF("cents", "k")
    val r = Profiling.hellingerDrift(same, "cents",
      col("k") % 2 === 0, binW = 10L).head()
    assert(r.getAs[String]("hellinger").toDouble < 0.001, r.toString)
    // side A in bins 0-7, side B in bins 8-15: BC = 0, H = 1, bhat null
    val disj = (0L until 4000L).map { i =>
      val side = i % 2; (side * 80L + (i % 8) * 10L, i)
    }.toDF("cents", "k")
    val d = Profiling.hellingerDrift(disj, "cents",
      col("k") % 2 === 0, binW = 10L).head()
    assert(d.getAs[Long]("bc_nano") == 0L)
    assert(d.getAs[String]("hellinger") == "1.0000")
    assert(d.isNullAt(d.fieldIndex("bhat_micro")))
  }

  // ---- holtWintersHourly ----------------------------------------------------

  private def hourlyEvents(counts: Seq[(Long, Int)], typ: String = "t") =
    counts.flatMap { case (hr, c) =>
      (0 until c).map(j =>
        (hr * 100 + j, new Timestamp(hr * 3600000L), j.toLong, typ,
          1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("holt-winters: a pure daily cycle forecasts itself exactly") {
    val pattern = Seq(3, 7, 2, 9, 5, 8, 1, 6, 4, 10, 2, 7,
      3, 9, 5, 1, 8, 6, 2, 4, 7, 10, 3, 5)
    val counts = (0L until 96L).map(hr => (hr, pattern((hr % 24).toInt)))
    val out = EventsOps.holtWintersHourly(hourlyEvents(counts))
      .orderBy("hr").collect()
    assert(out.length == 96 - 24)
    // mean of first cycle floors to l0; x − s⁻ = l0 every step keeps
    // level frozen, trend 0, and the one-step forecast EXACT
    val l0 = pattern.sum / 24
    out.foreach { r =>
      assert(r.getAs[Long]("level") == l0, r.toString)
      assert(r.getAs[Long]("trend") == 0L, r.toString)
    }
    val byHr = counts.toMap
    out.filter(_.getAs[Long]("hr") < 95L).foreach { r =>
      val next = byHr(r.getAs[Long]("hr") + 1L)
      assert(r.getAs[Long]("forecast") == next.toLong, r.toString)
    }
  }

  test("holt-winters: series shorter than 25 points emits nothing") {
    val counts = (0L until 24L).map(hr => (hr, 5))
    assert(EventsOps.holtWintersHourly(hourlyEvents(counts)).count() == 0L)
  }

  // ---- periodogramHourly ----------------------------------------------------

  test("periodogram: a planted 24h sinusoid dominates at p = 24") {
    val counts = (0L until 240L).map { hr =>
      (hr, 10 + math.round(5.0 * math.cos(2 * math.Pi * hr / 24)).toInt)
    }
    val rows = EventsOps.periodogramHourly(hourlyEvents(counts))
      .collect().map(r => r.getAs[Int]("p") ->
        r.getAs[String]("pw_rel").toDouble).toMap
    assert(rows(24) > 0.45 && rows(24) <= 0.55, rows.toString)
    Seq(6, 8, 12).foreach(p =>
      assert(rows(p) < 0.02, s"p=$p ${rows(p)}"))
  }

  // ---- delongCompare --------------------------------------------------------

  test("delong: AUCs agree with groupedAuc; degenerate variance gives null z") {
    // deterministic noisy predictor vs a weaker one on the same items
    val items = (0L until 600L).map { i =>
      val y = if (i % 3 == 0) 1L else 0L
      val s1 = y * 50 + (i * 7) % 40    // informative
      val s2 = y * 10 + (i * 11) % 60   // weakly informative
      (y, s1, s2)
    }.toDF("y", "s1", "s2")
    val r = MlEval.delongCompare(items).head()
    val viaQ140 = MlEval.groupedAuc(
      items.withColumn("g", lit("all")), "g", "s1", "y = 1")
      .head().getAs[Double]("auc")
    assert(math.abs(r.getAs[String]("auc1").toDouble - viaQ140) < 5e-5,
      s"${r.getAs[String]("auc1")} vs $viaQ140")
    assert(r.getAs[String]("auc1").toDouble >
      r.getAs[String]("auc2").toDouble)
    assert(r.getAs[String]("z").toDouble > 2.0, r.toString)

    // perfect predictor vs constant: both structural variances vanish →
    // varD = 0 → z must be NULL, not a division blowup
    val deg = (0L until 100L).map { i =>
      val y = if (i % 2 == 0) 1L else 0L; (y, y, 7L)
    }.toDF("y", "s1", "s2")
    val d = MlEval.delongCompare(deg).head()
    assert(d.getAs[String]("auc1") == "1.0000")
    assert(d.getAs[String]("auc2") == "0.5000")
    assert(d.isNullAt(d.fieldIndex("z")), d.toString)
  }

  // ---- partialCorrelation ---------------------------------------------------

  test("partial correlation: confounder-routed association collapses") {
    // x and y both track z; their direct association is spurious
    val rows = (0L until 3000L).map { i =>
      val z = (i % 100) * 10
      (z + (i * 7) % 13, z + (i * 11) % 17, z)
    }.toDF("x", "y", "z")
    val out = Profiling.partialCorrelation(rows, "x", "y", "z")
      .collect().map(r => (r.getAs[String]("m_x"), r.getAs[String]("m_y"),
        r.getAs[String]("m_z")) -> (r.getAs[String]("r_xy").toDouble,
        r.getAs[String]("r_xy_z").toDouble)).toMap
    val (rxy, rxyz) = out(("x", "y", "z"))
    assert(rxy > 0.95, s"raw r $rxy")
    assert(math.abs(rxyz) < 0.15, s"partial r $rxyz")
    // and controlling an irrelevant side keeps the (x, z) link strong
    val (rxz, rxzy) = out(("x", "z", "y"))
    assert(rxz > 0.95 && rxzy > 0.5, s"$rxz $rxzy")
  }

  // ---- tukeyHsd -------------------------------------------------------------

  test("tukey HSD: separated group stands out, equal groups do not") {
    val rows = (0L until 900L).map { i =>
      val g = (i % 3).toInt
      val base = if (g == 2) 1000L else 0L
      (Seq("a", "b", "c")(g), base + (i * 13) % 50)
    }.toDF("grp", "x")
    val out = Profiling.tukeyHsd(rows, "grp", "x")
      .collect().map(r => (r.getAs[String]("g_a"), r.getAs[String]("g_b"))
        -> r.getAs[String]("q_stat").toDouble).toMap
    assert(out(("a", "b")) < 2.0, out.toString)
    assert(out(("a", "c")) > 30.0 && out(("b", "c")) > 30.0, out.toString)
  }

  // ---- overdispersion -------------------------------------------------------

  test("overdispersion: constant counts score negative, bursty positive") {
    val flat = (0L until 50L).map(hr => (hr, 10))
    val zFlat = EventsOps.overdispersion(hourlyEvents(flat))
      .head().getAs[String]("z").toDouble
    assert(zFlat < -4.0, s"flat z $zFlat")
    val bursty = (0L until 50L).map(hr =>
      (hr, if (hr % 2 == 0) 1 else 40))
    val zBurst = EventsOps.overdispersion(hourlyEvents(bursty))
      .head().getAs[String]("z").toDouble
    assert(zBurst > 10.0, s"bursty z $zBurst")
  }
}
