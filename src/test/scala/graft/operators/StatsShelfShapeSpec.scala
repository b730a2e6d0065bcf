package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 plan-shape pin over the whole statistical shelf (q280–q357,
  * the r11–r15 batches): every executed plan's Window nodes must be
  * PARTITIONED unless the query is on the audited allowlist below — each
  * allowlisted window runs on a frame that is domain-bounded BY
  * CONSTRUCTION (distinct event times, deciles, a score grid), never
  * corpus-sized, so a single-partition sort there is O(domain), not O(N).
  * A new stats operator that sneaks a corpus-sized unpartitioned window
  * into this range fails here instead of surfacing as a 100 TB incident
  * (the q191 lesson, VERDICT r14 item 6). */
class StatsShelfShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** query → why its unpartitioned window is domain-bounded. */
  private val allowlisted: Map[String, String] = Map(
    "q288_nelson_aalen" -> "cumsum over DISTINCT event times (duration domain)",
    "q289_cumulative_gains" -> "cumsum over 10 deciles",
    "q306_rmst" -> "trapezoid over distinct survival hours",
    "q323_aalen_johansen" -> "cumsum over distinct event times",
    "q326_kll_error_laws" -> "rank laws over the sketch-size domain",
    "q331_qini_curve" -> "cumulative uplift over the score grid (scoreCap+1 rows)")

  private val SpecRe = """windowspecdefinition\(([^)]*)""".r

  private def unpartitionedSpecs(plan: String): Seq[String] =
    SpecRe.findAllMatchIn(plan).map(_.group(1)).filter { args =>
      // partition columns precede the sort spec; a spec whose FIRST
      // argument already carries a sort direction has no partitioning
      val first = args.split(",").head
      first.contains(" ASC") || first.contains(" DESC")
    }.toSeq.distinct

  test("q280-q357: every Window is partitioned or on the audited allowlist") {
    val dir = "/root/testdata/sf0.001"
    val shelf = graft.SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (n, _) =>
        """q(\d+)_""".r.findFirstMatchIn(n)
          .exists(m => { val i = m.group(1).toInt; i >= 280 && i <= 357 })
    }
    assert(shelf.size >= 70, s"stats shelf unexpectedly small: ${shelf.size}")
    val offenders = shelf.flatMap { case (name, fn) =>
      val df = fn(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      graft.BlockRelease.releaseAll(spark)
      val unpart = unpartitionedSpecs(plan)
      if (unpart.nonEmpty && !allowlisted.contains(name))
        Some(s"$name: ${unpart.mkString(" | ")}")
      else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned corpus-risk windows outside the allowlist:\n" +
        offenders.mkString("\n"))
    // the allowlist must not go stale: every entry still exists and still
    // has its declared unpartitioned window (else tighten the list)
    val byName = shelf.toMap
    allowlisted.keys.foreach { n =>
      assert(byName.contains(n), s"allowlisted $n no longer registered")
    }
  }
}
