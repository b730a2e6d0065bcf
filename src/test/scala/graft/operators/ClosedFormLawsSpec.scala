package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Algebra behind the windowed reformulations, pinned against the
  * textbook sequential recurrences they replace:
  *
  *  - q188's CUSUM: S_t = max(0, S_{t-1} + d_t) == P_t − min_{j≤t} P_j
  *    over prefix sums P (the identity that turns the fold into two
  *    stacked windows);
  *  - q185's h-index: the histogram form max_e min(e, #{x ≥ e}) over
  *    DISTINCT values e equals the sort-based definition max_r
  *    min(r, x_(r)) over ranks.
  */
object ClosedFormLawsSpec extends Properties("ClosedFormLaws") {

  private val seriesGen: Gen[List[Long]] =
    Gen.listOfN(60, Gen.chooseNum(-1000L, 1000L))

  property("CUSUM prefix/running-min == the textbook max(0, ...) fold") =
    forAll(seriesGen) { ds =>
      val folded = ds.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
      val prefixes = ds.scanLeft(0L)(_ + _) // P_0 = 0 included
      val closed = (1 to ds.length).map { t =>
        prefixes(t) - prefixes.take(t + 1).min
      }
      folded == closed.toList
    }

  private val multisetGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 40L))

  property("h-index: histogram form over distinct values == sort-based rank form") =
    forAll(multisetGen) { xs =>
      val sorted = xs.sorted(Ordering[Long].reverse)
      val byRank =
        if (xs.isEmpty) 0L
        else sorted.zipWithIndex.map { case (x, i) => math.min(i + 1L, x) }.max
      val byHist =
        if (xs.isEmpty) 0L
        else xs.distinct.map(e => math.min(e, xs.count(_ >= e).toLong)).max
      // rank form can return 0 via min(1, 0) on all-zero multisets; the
      // histogram of e=0 gives min(0, n) = 0 — same
      byRank == byHist
    }
}
