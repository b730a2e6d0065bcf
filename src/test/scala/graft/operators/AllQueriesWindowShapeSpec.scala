package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 plan-shape pin over EVERY declared query (VERDICT r15 item 6,
  * widening the round-15 stats-shelf pin): each executed plan's Window
  * nodes must be PARTITIONED unless the (query, window) is on the audited
  * allowlist below — each allowlisted window runs on a frame that is
  * domain-bounded BY CONSTRUCTION (distinct hours, deciles, buckets, a
  * score grid), never corpus-sized, so its single-partition sort is
  * O(domain), not O(N). A query that sneaks a corpus-sized unpartitioned
  * window in ANY operator family now fails CI instead of surfacing as a
  * 100 TB incident (the q191 lesson, VERDICT r14 item 6; extended to the
  * whole surface per VERDICT r15 item 6). */
class AllQueriesWindowShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** query → why its unpartitioned window(s) are domain-bounded. */
  private val allowlisted: Map[String, String] = Map(
    // the audited round-15 stats-shelf entries, carried forward
    "q288_nelson_aalen" -> "cumsum over DISTINCT event times (duration domain)",
    "q289_cumulative_gains" -> "cumsum over 10 deciles",
    "q306_rmst" -> "trapezoid over distinct survival hours",
    "q323_aalen_johansen" -> "cumsum over distinct event times",
    "q326_kll_error_laws" -> "rank laws over the sketch-size domain",
    "q331_qini_curve" -> "cumulative uplift over the score grid (scoreCap+1 rows)",
    // round-16 audit of the rest of the surface (VERDICT r15 item 6):
    "q141_retrieval_eval" -> "rank over bm25TopK(…, 20) — a 20-row list per eval query",
    "q151_stl_decompose" -> "±12 h window over the HOURLY series (observation-span hours, not events)",
    "q170_rrf_fusion" -> "rank over bm25TopK(…, kPer) — a kPer-row list",
    "q217_skyline" -> "prefix max over ≤ `buckets` bucket rows (Skyline.scala comment)",
    "q229_kaplan_meier" -> "risk-table prefix over DISTINCT duration hours",
    "q236_bootstrap_ci" -> "rank over b bootstrap resample sums (b rows)",
    "q241_logrank_test" -> "risk-table prefix over DISTINCT duration hours")

  private val SpecRe = """windowspecdefinition\(([^)]*)""".r

  private def unpartitionedSpecs(plan: String): Seq[String] =
    SpecRe.findAllMatchIn(plan).map(_.group(1)).filter { args =>
      // partition columns precede the sort spec; a spec whose FIRST
      // argument already carries a sort direction has no partitioning
      val first = args.split(",").head
      first.contains(" ASC") || first.contains(" DESC")
    }.toSeq.distinct

  test("all declared queries: every Window is partitioned or allowlisted") {
    val dir = "/root/testdata/sf0.001"
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    assert(qs.size >= 370, s"query surface unexpectedly small: ${qs.size}")
    val offenders = qs.flatMap { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.queryExecution.toRdd.count()
        val plan = df.queryExecution.executedPlan.toString
        val unpart = unpartitionedSpecs(plan)
        if (unpart.nonEmpty && !allowlisted.contains(name))
          Some(s"$name: ${unpart.mkString(" | ")}")
        else None
      } finally {
        graft.BlockRelease.releaseAll(spark)
      }
    }
    assert(offenders.isEmpty,
      s"unpartitioned corpus-risk windows outside the allowlist:\n" +
        offenders.mkString("\n"))
    // the allowlist must not go stale: every entry still exists
    val names = qs.map(_._1).toSet
    allowlisted.keys.foreach { n =>
      assert(names.contains(n), s"allowlisted $n no longer registered")
    }
  }
}
