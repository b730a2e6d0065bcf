package graft.operators

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profileOrders: one row per column, exact counts, single-scan plan") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val prof = Profiling.profileOrders(orders)
    val rows = prof.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("o_custkey", "o_orderdate",
      "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))
    val n = orders.count()
    assert(rows.forall(_.getLong(1) == n))
    val keyRow = rows.find(_.getString(0) == "o_orderkey").get
    assert(keyRow.getLong(2) == 0L)      // no null keys
    assert(keyRow.getLong(3) == n)       // keys unique
    // plan shape: the six exact distinct counts must NOT plan as a
    // multi-distinct Aggregate — that Expands the full table 6× (6×
    // shuffle IO at 100 TB). Two pruned scans (non-distinct aggs +
    // unpivoted single-distinct agg) and zero Expand nodes.
    // (the AQE string repeats the tree under "== Initial Plan ==" — cut it)
    val finalPlan = prof.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!finalPlan.contains("Expand"),
      "profile plan must not Expand the base scan")
    val scans = finalPlan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans <= 2, s"expected <=2 scans, got $scans")
  }

  test("orc round-trip preserves values and prunes lang partitions") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
    val out = Files.createTempDirectory("graft_orc_spec").toString
    val back = Profiling.orcRoundTrip(docs, out)
    // values survive the ORC round trip exactly
    val a = docs.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val b = back.orderBy("doc_id").collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"), r.getAs[String]("lang")))
    assert(a.sameElements(b))
    // a lang filter reaches the scan as a partition filter
    val pruned = back.filter(col("lang") === "en")
    pruned.collect()
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(l => l.contains("PartitionFilters") && l.contains("lang"))
      .getOrElse("")
    assert(scanLine.matches(".*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang not pushed as partition filter:\n$scanLine")
  }

  test("exactQuantiles == Spark's percentile aggregate, duplicates included") {
    import spark.implicits._
    val data = ((1 to 500).map(_.toDouble) ++ Seq.fill(100)(250.0) ++
      (1 to 50).map(_ => 7.5)).toDF("x")
    val ps = Seq(0.1, 0.25, 0.5, 0.733, 0.9)
    val dist = Profiling.exactQuantiles(data, "x", ps)
    val agg = data.agg(expr(
        s"percentile(x, array(${ps.mkString(",")}))").as("q"))
      .as[Seq[Double]].head()
    ps.indices.foreach(i => assert(math.abs(dist(i) - agg(i)) < 1e-9,
      s"fraction ${ps(i)}: distributed ${dist(i)} vs aggregate ${agg(i)}"))
  }

  test("equiDepthHistogram: near-equal buckets, ordered disjoint ranges") {
    import spark.implicits._
    val df = (1 to 8000).map(i => i.toDouble).toDF("v")
    val rows = Profiling.equiDepthHistogram(df, "v", 8)
      .select(col("bucket"), col("n"), col("lo"), col("hi"))
      .as[(Int, Long, String, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 until 8))
    // uniform data → every bucket within 1 row of exactly n/8
    rows.foreach { case (b, n, _, _) =>
      assert(math.abs(n - 1000L) <= 1, s"bucket $b holds $n rows")
    }
    // ranges ordered and non-overlapping
    val his = rows.map(_._4.toDouble); val los = rows.map(_._3.toDouble)
    (0 until 7).foreach(i => assert(his(i) <= los(i + 1)))
    // no window over a global total order: boundaries broadcast, bucket
    // assignment map-side ("percentile" the aggregate is fine — it's the
    // single-row bounds computation, not a per-row sort)
    val plan = Profiling.equiDepthHistogram(df, "v", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("qualityReport: each injected defect is counted by exactly its check") {
    import spark.implicits._
    val orders = Seq(
      (1L, 10L, "O"), (1L, 10L, "O"),   // duplicate orderkey
      (2L, 10L, "X"),                   // bad status
      (3L, 99L, "F")                    // custkey 99 has no customer row
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val customer = Seq((10L, "alice"), (11L, null.asInstanceOf[String]))
      .toDF("c_custkey", "c_name")
    val lineitem = Seq((1.0, 0.05), (46.0, 0.5), (50.0, 0.0))
      .toDF("l_quantity", "l_discount")
    val documents = Seq(("ab", 2L), ("abc", 5L)).toDF("text", "n_chars")
    val got = Profiling.qualityReport(orders, customer, lineitem, documents)
      .select(col("check_name"), col("violations"), col("passed"))
      .as[(String, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("orders.o_orderkey is unique") == ((1L, 0)))
    assert(got("orders.o_orderstatus in (O,F,P)") == ((1L, 0)))
    assert(got("orders.o_custkey references customer") == ((1L, 0)))
    assert(got("customer.c_name is complete") == ((1L, 0)))
    assert(got("lineitem.l_discount in [0, 0.1]") == ((1L, 0)))
    assert(got("lineitem.l_quantity <= 45") == ((2L, 0)))
    assert(got("documents.n_chars = length(text)") == ((1L, 0)))
  }

  test("qualityReport: a clean dataset passes every check") {
    import spark.implicits._
    val orders = Seq((1L, 10L, "O"), (2L, 10L, "F"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val customer = Seq((10L, "alice")).toDF("c_custkey", "c_name")
    val lineitem = Seq((1.0, 0.05)).toDF("l_quantity", "l_discount")
    val documents = Seq(("ab", 2L)).toDF("text", "n_chars")
    val got = Profiling.qualityReport(orders, customer, lineitem, documents)
      .select(col("violations"), col("passed")).as[(Long, Int)].collect()
    assert(got.forall(_ == ((0L, 1))), got.mkString(","))
  }

  test("madOutliers: hand-computed median, MAD, and outlier count") {
    import spark.implicits._
    // values 1..9 plus 100: median 5.5; |v−5.5| sorted has median 2.5;
    // threshold 3·1.4826·2.5 = 11.1195 → only 100 is outside
    val events = ((1 to 9).map(_.toDouble) :+ 100.0)
      .map(v => ("a", v)).toDF("event_type", "value")
    val got = Profiling.madOutliers(events)
      .select(col("med"), col("mad"), col("n_outliers"), col("n_total"))
      .as[(Double, Double, Long, Long)].head()
    assert(got == ((5.5, 2.5, 1L, 10L)))
  }

  test("rankNormalize: ties share their first-occurrence rank; matches percent_rank") {
    import spark.implicits._
    val df = Seq(10.0, 20.0, 20.0, 30.0).map(Tuple1(_)).toDF("v")
    val got = Profiling.rankNormalize(df, "v")
      .select(col("v"), col("pct_rank")).as[(Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((10.0, 0.0), (20.0, 1.0 / 3), (20.0, 1.0 / 3), (30.0, 1.0)))
    // larger mixed-duplicate input: must equal Spark's own percent_rank
    val big = (1 to 500).map(i => ((i * 7919) % 97).toDouble).toDF("v")
    val viaWindow = big.withColumn("pr", percent_rank().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
      .select("v", "pr").as[(Double, Double)].collect().sorted.toSeq
    val viaOp = Profiling.rankNormalize(big, "v")
      .select(col("v"), col("pct_rank")).as[(Double, Double)]
      .collect().sorted.toSeq
    assert(viaOp == viaWindow)
    // and the plan must NOT contain a global-sort window
    val plan = Profiling.rankNormalize(big, "v").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("winsorize: clamp counts and sum match hand computation on 1..100") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    // p05 at position 4.95 → 5.95; p95 at 94.05 → 95.05
    val got = Profiling.winsorize(df, "v")
      .select(col("n"), col("n_clamped_lo"), col("n_clamped_hi"),
        col("sum_winsorized").cast("double"), col("lo"), col("hi"))
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(got._1 == 100L && got._2 == 5L && got._3 == 5L)
    assert(got._5 == 5.95 && got._6 == 95.05)
    val expectedSum = 5 * 5.95 + (6 to 95).sum + 5 * 95.05
    assert(math.abs(got._4 - expectedSum) < 1e-9)
  }

  test("ksDrift: identical slices give 0, disjoint slices give 1, shifted slices in between") {
    import spark.implicits._
    def ks(rows: Seq[(Double, Long)]) =
      Profiling.ksDrift(rows.toDF("value", "event_id"), "value",
        col("event_id") % 2 === 0)
        .select(col("ks")).as[Double].head()
    val same = (1 to 20).flatMap(i => Seq((i.toDouble, 0L), (i.toDouble, 1L)))
    assert(ks(same) == 0.0)
    val disjoint = (1 to 10).map(i => (i.toDouble, 0L)) ++
      (11 to 20).map(i => (i.toDouble, 1L))
    assert(ks(disjoint) == 1.0)
    // A = {1,2,3,4}, B = {3,4,5,6}: max gap at v=2 → |2/4 − 0/4| = 0.5
    val shifted = Seq(1.0, 2.0, 3.0, 4.0).map((_, 0L)) ++
      Seq(3.0, 4.0, 5.0, 6.0).map((_, 1L))
    assert(ks(shifted) == 0.5)
  }

  test("madOutliers: groups are independent; constant group has MAD 0") {
    import spark.implicits._
    val events = (Seq.fill(5)(("flat", 7.0)) ++
        Seq(("spread", 0.0), ("spread", 10.0), ("spread", 5.0)))
      .toDF("event_type", "value")
    val got = Profiling.madOutliers(events)
      .select(col("event_type"), col("mad"), col("n_outliers"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("flat") == ((0.0, 0L))) // every deviation 0 → no outliers
    assert(got("spread")._2 == 0L)     // med 5, mad 5 → nothing beyond 22.2
  }

  test("weightedMedian: weight shifts the middle; lower-median tie rule") {
    // values 1..4 weight 1 -> total 4, 2*cum>=4 first at v=2 (lower median)
    val flat = (1L to 4L).map(v => ("f", v, 1L)).toDF("g", "v", "w")
    import org.apache.spark.sql.functions.col
    val m1 = Profiling.weightedMedian(flat, "g", "v", "w")
      .select(col("w_median")).as[Long].head()
    assert(m1 == 2L)
    // a heavy weight at v=4 drags the weighted middle up to 4
    val heavy = (flat.as[(String, Long, Long)].collect().toSeq :+ (("f", 4L, 10L)))
      .toDF("g", "v", "w")
    val m2 = Profiling.weightedMedian(heavy, "g", "v", "w")
      .select(col("w_median")).as[Long].head()
    assert(m2 == 4L, s"got $m2")
  }

  test("benford: probabilities pinned; perfect Benford sample scores chi2 ~ 0") {
    import org.apache.spark.sql.functions.col
    assert(math.abs(Profiling.BenfordP.sum - 1.0) < 1e-12)
    assert(math.abs(Profiling.BenfordP.head - math.log10(2.0)) < 1e-15)
    // a sample with counts exactly proportional to Benford's law
    val n = 10000
    val rows = (1 to 9).flatMap { d =>
      val c = math.round(Profiling.BenfordP(d - 1) * n).toInt
      Seq.fill(c)(d.toLong * 1000L)
    }.toDF("x")
    val got = Profiling.benford(rows, "x")
      .select(col("digit"), col("chi2")).as[(String, String)].collect()
    assert(got.length == 9)
    assert(got.head._2.toDouble < 0.01, s"chi2 should be ~0: ${got.head}")
  }

  test("totalVariation: identical slices 0, disjoint slices 1") {
    import org.apache.spark.sql.functions.col
    val same = (2L to 101L).map(i => (i, i / 2)).toDF("id", "v")
    val tv0 = Profiling.totalVariation(same, "v", col("id") % 2 === 0)
      .select(col("tv")).as[String].head()
    assert(tv0 == "0.0000", s"got $tv0")
    val disjoint = ((1L to 50L).map(i => (2 * i, i)) ++
      (1L to 50L).map(i => (2 * i + 1, 1000L + i))).toDF("id", "v")
    val tv1 = Profiling.totalVariation(disjoint, "v", col("id") % 2 === 0)
      .select(col("tv")).as[String].head()
    assert(tv1 == "1.0000", s"got $tv1")
  }

  test("higherMoments: symmetric data skew 0; uniform kurtosis -1.2; constant nulls") {
    import org.apache.spark.sql.functions.col
    // symmetric triple -> skew exactly 0
    val sym = Seq(("s", 1L), ("s", 2L), ("s", 3L)).toDF("g", "x")
    val r1 = Profiling.higherMoments(sym, "g", "x")
      .select(col("skewness")).as[Double].head()
    assert(r1 == 0.0, s"got $r1")
    // large discrete uniform -> excess kurtosis -> -1.2 (analytic -6/5 * (n^2+1)/(n^2-1))
    val uni = (1L to 1000L).map(v => ("u", v)).toDF("g", "x")
    val r2 = Profiling.higherMoments(uni, "g", "x")
      .select(col("kurtosis_ex")).as[Double].head()
    assert(math.abs(r2 - (-1.2)) < 0.01, s"got $r2")
    // zero variance -> nulls, not NaN/crash
    val const = Seq(("c", 7L), ("c", 7L)).toDF("g", "x")
    val r3 = Profiling.higherMoments(const, "g", "x")
      .select(col("skewness").isNull && col("kurtosis_ex").isNull)
      .as[Boolean].head()
    assert(r3)
  }

  test("mannWhitneyU: equals the brute-force pairwise definition with ties") {
    import spark.implicits._
    val arm0 = Seq(3L, 5L, 5L, 8L, 12L, 12L, 20L)
    val arm1 = Seq(5L, 9L, 12L, 15L, 15L, 31L)
    val rows = (arm0.map(v => ("g", v, 0L)) ++ arm1.map(v => ("g", v, 1L)))
      .zipWithIndex.map { case ((g, v, a), i) => (g, v, a, i.toLong) }
      .toDF("g", "v", "arm", "id")
    val got = Profiling.mannWhitneyU(rows, "g", "v", "arm = 1")
      .select("n0", "n1", "u1").as[(Long, Long, String)].head()
    // brute force: U1 = #{b > a} + 0.5 #{b = a}
    val wins = (for (a <- arm0; b <- arm1) yield
      if (b > a) 1.0 else if (b == a) 0.5 else 0.0).sum
    assert(got._1 == 7L && got._2 == 6L)
    assert(math.abs(BigDecimal(got._3).toDouble - wins) < 1e-9,
      s"U1 ${got._3} != brute $wins")
  }

  test("chiSquareTest: textbook 2x2 value, zero under exact independence") {
    import spark.implicits._
    // classic 2x2: rows (t1, t2) x cols (a, b) with counts 20/30/30/20 —
    // chi2 = N(ad-bc)^2 / (r1 r2 c1 c2) = 100*(400-900)^2/50^4 = 4.0
    val dep = (Seq.fill(20)(("t1", "a")) ++ Seq.fill(30)(("t1", "b")) ++
      Seq.fill(30)(("t2", "a")) ++ Seq.fill(20)(("t2", "b")))
      .toDF("x", "y")
    val got = Profiling.chiSquareTest(dep, "x", "y")
      .select("n", "dof", "chi2", "cramers_v")
      .as[(Long, Long, String, String)].head()
    assert(got._1 == 100L && got._2 == 1L)
    assert(math.abs(BigDecimal(got._3).toDouble - 4.0) < 1e-3, got)
    // V for 2x2 = sqrt(chi2/N) = 0.2
    assert(math.abs(BigDecimal(got._4).toDouble - 0.2) < 1e-3, got)
    // exact independence: counts proportional to margin products
    val ind = (Seq.fill(10)(("t1", "a")) ++ Seq.fill(20)(("t1", "b")) ++
      Seq.fill(20)(("t2", "a")) ++ Seq.fill(40)(("t2", "b")))
      .toDF("x", "y")
    val chi0 = Profiling.chiSquareTest(ind, "x", "y")
      .select("chi2").as[String].head()
    assert(math.abs(BigDecimal(chi0).toDouble) < 1e-3, chi0)
  }
}
