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

  // ==== round 14: double face (order-preserving bits) + weighted face ======

  test("DoubleBits is an order-preserving bijection incl. negatives") {
    val rnd = new scala.util.Random(97)
    val ds = Seq(Double.NegativeInfinity, -1e300, -2.0, -1.0, -1e-300,
      0.0, 1e-300, 1.0, 2.0, 1e300, Double.PositiveInfinity) ++
      Seq.fill(5000)(rnd.nextGaussian() * math.pow(10.0, rnd.nextInt(12) - 6))
    ds.foreach { d =>
      assert(DoubleBits.fromSortable(DoubleBits.toSortable(d)) == d, s"$d")
    }
    ds.sorted.sliding(2).foreach {
      case Seq(a, b) =>
        if (a < b)
          assert(DoubleBits.toSortable(a) < DoubleBits.toSortable(b), s"$a<$b")
      case _ => ()
    }
    // −0.0 normalizes onto +0.0: one quantile value, not two
    assert(DoubleBits.toSortable(-0.0) == DoubleBits.toSortable(0.0))
  }

  test("kll_agg_double exact regime through a distributed aggregation") {
    val rnd = new scala.util.Random(23)
    val ds = Seq.fill(800)(rnd.nextGaussian() * 10.0 - 2.0) // negatives too
    val df = ds.toDF("v").repartition(8)
    val got = df.agg(KllExprs.kllAggDouble(col("v"), 4096).as("kll"))
      .select(explode(col("kll")).as("e"))
      .select(KllExprs.sortableToDouble(col("e.v")).as("d"), col("e.w"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    // flattened sorts by bits asc == double asc; weights all 1 (exact)
    assert(got.map(_._1).toSeq == ds.sorted)
    assert(got.forall(_._2 == 1L))
  }

  test("weighted update: exact conservation + raw-replay readout parity") {
    val rnd = new scala.util.Random(5)
    val pairs = Seq.fill(300)((rnd.nextInt(500).toLong, 1L + rnd.nextInt(7)))
    val st = new KllExprs.State(4096)
    pairs.foreach { case (v, w) => st.updateWeighted(v, w) }
    assert(st.totalWeight == pairs.map(_._2).sum)
    // both stay exact at this size, so readouts must agree exactly
    val raw = freshState(4096,
      pairs.flatMap { case (v, w) => Seq.fill(w.toInt)(v) })
    Seq(10, 25, 50, 75, 90, 99).foreach { p =>
      assert(st.quantile(p) == raw.quantile(p), s"p$p")
    }
  }

  test("weighted update conserves weight under compaction + big weights") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(20000)(
      (rnd.nextLong() % 100000, 1L + rnd.nextInt(1 << 20)))
    val st = new KllExprs.State(64)
    pairs.foreach { case (v, w) => st.updateWeighted(v, w) }
    assert(st.totalWeight == pairs.map(_._2).sum)
    // ≤ Σ capacities + per-level leftovers, independent of n and weights
    assert(st.totalItems <= 3 * 64 + 2 * st.levels.length + 64,
      s"items=${st.totalItems} levels=${st.levels.length}")
    // serialization round-trips the weighted state byte-exactly
    val rt = KllExprs.fromBytes(KllExprs.toBytes(st))
    assert(rt.flattened.toSeq == st.flattened.toSeq)
  }

  test("kll_agg_weighted distributed == exact weighted order statistics") {
    val pre = (0 until 400).map(i => (i.toLong, 1L + (i % 5)))
    val df = pre.toDF("v", "w").repartition(8)
    val got = df.agg(KllExprs.kllAggWeighted(col("v"), col("w"), 4096)
        .as("kll"))
      .select(explode(col("kll")).as("e"))
      .groupBy(col("e.v").as("v")).agg(sum(col("e.w")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact regime: per-value weight == the planted count
    pre.foreach { case (v, w) => assert(got(v) == w, s"v=$v") }
  }

  test("kll_agg over a non-long column fails at analysis, not execution") {
    val df = Seq(1.5, 2.5).toDF("v") // double child, long-only aggregate
    val ex = intercept[Exception] {
      df.agg(KllExprs.kllAgg(col("v"), 64)).collect()
    }
    assert(ex.getMessage.toUpperCase.contains("DATATYPE_MISMATCH") ||
      ex.getMessage.toLowerCase.contains("type"), ex.getMessage)
  }
}
