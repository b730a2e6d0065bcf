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
