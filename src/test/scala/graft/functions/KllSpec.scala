package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL rank sketch laws (B262): weight conservation under arbitrary
  * merge shapes, exact-regime equality with the true order statistics,
  * rank-error ceiling in the sketch regime across distributions, and the
  * O(k) state bound. Driver-side State checks exercise the same code the
  * TypedImperativeAggregate and the streaming ValueState twin run.
  */
class KllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshState(k: Int, vs: Seq[Long]): KllExprs.State = {
    val st = new KllExprs.State(k)
    vs.foreach(st.update)
    st
  }

  test("weight conservation: any split + merge keeps total weight == n") {
    val rnd = new scala.util.Random(131)
    val vs = Seq.fill(20000)(rnd.nextLong() % 1000000)
    Seq(1, 3, 7, 64).foreach { parts =>
      val sketches = vs.grouped(math.max(1, vs.size / parts))
        .map(g => freshState(64, g)).toSeq
      val merged = sketches.reduce { (a, b) => a.mergeFrom(b); a }
      assert(merged.totalWeight == vs.size.toLong, s"parts=$parts")
      // serialization round-trips the exact state
      val rt = KllExprs.fromBytes(KllExprs.toBytes(merged))
      assert(rt.flattened.toSeq == merged.flattened.toSeq)
      assert(rt.parity.toSeq == merged.parity.toSeq)
    }
  }

  test("exact regime: n <= k means the sketch IS the multiset") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(500)(rnd.nextInt(200).toLong) // heavy duplicates
    val st = freshState(4096, vs)
    assert(st.flattened.map(_._1).toSeq == vs.sorted)
    assert(st.flattened.forall(_._2 == 1L))
    // readout == the naive smallest-v-with-100cum>=pW order statistic
    val sorted = vs.sorted
    Seq(10, 25, 50, 75, 90, 99).foreach { p =>
      val naive = sorted(sorted.indices
        .find(i => (i + 1) * 100L >= p.toLong * vs.size).get)
      assert(st.quantile(p) == naive, s"p$p")
    }
  }

  test("rank-error ceiling across distributions at k=256") {
    val n = 100000
    val dists: Seq[(String, Seq[Long])] = {
      val rnd = new scala.util.Random(41)
      Seq(
        "uniform" -> Seq.fill(n)(rnd.nextInt(1000000).toLong),
        "zipf" -> Seq.fill(n)((1000000 /
          (1 + rnd.nextInt(1000))).toLong),
        "sorted" -> (0 until n).map(_.toLong),
        "reverse" -> (0 until n).map(i => (n - i).toLong))
    }
    dists.foreach { case (name, vs) =>
      val st = freshState(256, vs)
      val sorted = vs.sorted.toIndexedSeq
      Seq(10, 50, 90).foreach { p =>
        val est = st.quantile(p)
        // true rank bracket of the estimate must be within 2% of target
        val le = sorted.count(_ <= est).toLong
        val lt = sorted.count(_ < est).toLong
        val target = p.toLong * n / 100
        assert(le >= target - n / 50 && lt <= target + n / 50,
          s"$name p$p: est=$est le=$le lt=$lt target=$target")
      }
      assert(st.totalItems <= 4 * 256, s"$name state ${st.totalItems}")
      assert(st.totalWeight == n.toLong, name)
    }
  }

  test("aggregate + readout on a DataFrame matches the driver-side state") {
    val rnd = new scala.util.Random(977)
    val vs = Seq.fill(30000)(rnd.nextInt(500000).toLong)
    val df = vs.map(v => ("g", v)).toDF("g", "v")
    val got = graft.operators.Incremental.kllQuantiles(
      graft.operators.Incremental.kllState(df, "v", Seq("g"), 256),
      Seq("g"), Seq(50)).select("n", "p50").head()
    assert(got.getLong(0) == vs.size.toLong)
    // distributed merge order differs from the driver replay, so assert
    // the rank contract rather than bit equality
    val sorted = vs.sorted
    val le = sorted.count(_ <= got.getLong(1)).toLong
    val lt = sorted.count(_ < got.getLong(1)).toLong
    assert(le >= vs.size * 48L / 100 && lt <= vs.size * 52L / 100,
      s"p50=${got.getLong(1)} le=$le lt=$lt")
  }

  test("exact regime through a real distributed aggregation") {
    val vs = (0 until 3000).map(i => ((i * 37) % 3000).toLong)
    val df = vs.map(v => ("g", v)).toDF("g", "v").repartition(16)
    val got = graft.operators.Incremental.kllQuantiles(
      graft.operators.Incremental.kllState(df, "v", Seq("g"), 4096),
      Seq("g"), Seq(25, 50, 75)).select("p25", "p50", "p75").head()
    // values are a permutation of 0..2999: exact quantiles are forced
    assert(got.getLong(0) == 749L && got.getLong(1) == 1499L &&
      got.getLong(2) == 2249L, got.toString)
  }
}
