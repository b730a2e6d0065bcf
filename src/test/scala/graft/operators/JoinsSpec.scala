package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofBackward picks the latest right row at-or-before each left time") {
    val trades = Seq((1L, "A", 100L), (2L, "A", 205L), (3L, "B", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 90L, 10.0), ("A", 100L, 11.0), ("A", 200L, 12.0),
      ("B", 60L, 5.0)).toDF("sym", "qt", "px")
    val out = Joins.asofBackward(trades, quotes, Seq("sym"), "t", "qt", "qt")
      .select("trade_id", "qt", "px").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some(100L), Some(11.0))) // <= picks the equal-time quote
    assert(out(2L) == (Some(200L), Some(12.0)))
    assert(out(3L) == (None, None)) // B has no quote at/before 50
  }

  test("asofBackward strict mode excludes equal timestamps") {
    val trades = Seq((1L, "A", 100L)).toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 90L, 10.0), ("A", 100L, 11.0)).toDF("sym", "qt", "px")
    val out = Joins.asofBackward(trades, quotes, Seq("sym"), "t", "qt", "qt",
      strict = true).select("px").collect()(0)
    assert(out.getDouble(0) == 10.0)
  }

  test("asofForward picks the earliest later right row, bounded by tolerance") {
    val views = Seq((1L, "A", "2024-01-01 10:00:00"), (2L, "A", "2024-01-01 12:00:00"),
      (3L, "B", "2024-01-01 10:00:00"))
      .toDF("id", "sym", "ts").withColumn("ts", to_timestamp(col("ts")))
    val clicks = Seq(("A", 10L, "2024-01-01 10:10:00"), ("A", 11L, "2024-01-01 10:20:00"),
      ("A", 12L, "2024-01-01 13:30:00"))
      .toDF("sym", "cid", "cts").withColumn("cts", to_timestamp(col("cts")))
    val out = Joins.asofForward(views, clicks, Seq("sym"), "ts", "cts", "cid",
      strict = true, toleranceSec = Some(1800L))
      .select("id", "cid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(10L)) // earliest within 30 min, not the later 10:20
    assert(out(2L) == None) // 13:30 is beyond the 12:30 tolerance bound
    assert(out(3L) == None) // B has no clicks at all
  }

  test("asofBackward on a hot key matches the naive pair-space formulation") {
    // one power-law user owning 2000 interleaved events: the bucketed plan
    // must produce exactly what the quadratic naive join would, across
    // bucket widths (including one so narrow every row is its own bucket)
    val rnd = new scala.util.Random(11)
    val times = (0 until 2000).map(_ => rnd.nextInt(100000).toLong).distinct
    val (lt, rt) = times.partition(_ => rnd.nextBoolean())
    val lefts = lt.zipWithIndex.map { case (t, i) => (i.toLong, "hot", t) }
      .toDF("lid", "k", "t")
    val rights = rt.zipWithIndex.map { case (t, i) => (i.toLong, "hot", t) }
      .toDF("rid", "k", "rt")
      .select(col("k"), col("rid"), col("rt"))
    val naive = {
      val j = lefts.join(rights.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("rt") <= col("t"), "left")
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lid"))
        .orderBy(col("rt").desc_nulls_last, col("rid").desc_nulls_last)
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("lid", "rid", "rt").collect().map(_.toString).sorted
    }
    for (bucket <- Seq(1.0, 512.0, 1000000.0)) {
      val got = Joins.asofBackward(lefts, rights, Seq("k"), "t", "rt", "rid",
        bucketSize = bucket)
        .select("lid", "rid", "rt").collect().map(_.toString).sorted
      assert(got.sameElements(naive), s"bucketSize=$bucket diverges")
    }
  }

  test("asofForward on a hot key matches the naive pair-space formulation") {
    // forward mirror of the backward hot-key law, with and without a
    // tolerance (tolerance needs timestamps; seconds-as-epoch keeps it easy)
    val rnd = new scala.util.Random(13)
    val times = (0 until 2000).map(_ => rnd.nextInt(100000).toLong).distinct
    val (lt, rt) = times.partition(_ => rnd.nextBoolean())
    val lefts = lt.zipWithIndex.map { case (t, i) => (i.toLong, "hot", t) }
      .toDF("lid", "k", "t0").withColumn("t", timestamp_seconds(col("t0"))).drop("t0")
    val rights = rt.zipWithIndex.map { case (t, i) => (i.toLong, "hot", t) }
      .toDF("rid", "k", "rt0")
      .select(col("k"), col("rid"), timestamp_seconds(col("rt0")).as("rt"))
    for (tol <- Seq(None, Some(5000L))) {
      val naive = {
        val bound = tol match {
          case Some(s) => col("rt") >= col("t") &&
            col("rt") <= col("t") + expr(s"INTERVAL $s SECOND")
          case None => col("rt") >= col("t")
        }
        val j = lefts.join(rights.withColumnRenamed("k", "k2"),
          col("k") === col("k2") && bound, "left")
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lid"))
          .orderBy(col("rt").asc_nulls_last, col("rid").asc_nulls_last)
        j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select("lid", "rid", "rt").collect().map(_.toString).sorted
      }
      for (bucket <- Seq(1.0, 512.0, 1000000.0)) {
        val got = Joins.asofForward(lefts, rights, Seq("k"), "t", "rt", "rid",
          toleranceSec = tol, bucketSize = bucket)
          .select("lid", "rid", "rt").collect().map(_.toString).sorted
        assert(got.sameElements(naive), s"tol=$tol bucketSize=$bucket diverges")
      }
    }
  }

  test("asofBackward is correct when the left side contains a wide transform") {
    // the internal __asof_id fans out into three plan branches; a left input
    // whose partition order is shuffle-dependent (aggregate + repartition)
    // must still get one consistent id per row across branches — regression
    // test for the localCheckpoint pinning in asofImpl
    val rnd = new scala.util.Random(17)
    val events = (0 until 3000).map { i =>
      (s"u${i % 40}", rnd.nextInt(100000).toLong, rnd.nextInt(10).toLong)
    }.toDF("k", "t", "v")
    // wide left: per-(k,t) aggregate, then an order-scrambling repartition
    val lefts = events.groupBy("k", "t").agg(sum("v").as("sv")).repartition(7)
    val rights = (0 until 500).map { i =>
      (s"u${i % 40}", rnd.nextInt(100000).toLong + 100000L * (i % 3), i.toLong)
    }.toDF("k", "rt", "rid").distinct()
      .groupBy("k", "rt").agg(max("rid").as("rid"))
    val naive = {
      val j = lefts.join(rights.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("rt") <= col("t"), "left")
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("k"), col("t"))
        .orderBy(col("rt").desc_nulls_last, col("rid").desc_nulls_last)
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("k", "t", "sv", "rid", "rt").collect().map(_.toString).sorted
    }
    val got = Joins.asofBackward(lefts, rights, Seq("k"), "t", "rt", "rid",
      bucketSize = 512.0)
      .select("k", "t", "sv", "rid", "rt").collect().map(_.toString).sorted
    assert(got.sameElements(naive))
  }

  test("saltedJoin equals the plain join on skewed keys") {
    // 90% of rows share one key — the pathological shuffle shape
    val large = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("key", "v")
    val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "w")
    val plain = large.join(small, Seq("key"))
      .select("key", "v", "w").collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(large, small, "key", buckets = 8)
      .select("key", "v", "w").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
    assert(plain.length == 1000)
  }

  test("IVF ANN: deterministic, exact scores, probes find real neighbors") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val centroids = AnnIvf.trainCentroids(emb, k = 8, iterations = 2)
    assert(centroids.length == 8 && centroids.forall(_.size == 64))
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val run1 = AnnIvf.topK(emb, qs, 5, centroids)
      .select("qid", "rank", "neighbor").collect().map(_.toString).sorted
    val run2 = AnnIvf.topK(emb, qs, 5, centroids)
      .select("qid", "rank", "neighbor").collect().map(_.toString).sorted
    assert(run1.sameElements(run2), "IVF search must be deterministic")
    // scores are exact cosines
    val exact = Similarity.bruteForceTopK(emb, qs, 500)
      .select(col("qid"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    AnnIvf.topK(emb, qs, 5, centroids)
      .select("qid", "neighbor", "cos").as[(Long, Long, Double)].collect()
      .foreach { case (q, n, c) =>
        assert(math.abs(c - exact((q, n))) < 1e-12)
      }
  }

  test("intervalOverlapJoin == brute force, at several bin widths") {
    // adversarial set: touching endpoints (NOT overlap, half-open),
    // nested, identical, long-spanning-many-bins, empty, inverted
    val rnd = new scala.util.Random(29)
    val lefts = (0L until 120L).map { i =>
      val s = rnd.nextInt(2000).toLong
      (i, s, s + 1 + rnd.nextInt(300))
    } ++ Seq((900L, 100L, 100L), (901L, 200L, 150L)) // empty + inverted
    val rights = (0L until 150L).map { i =>
      val s = rnd.nextInt(2000).toLong
      (i, s, s + 1 + rnd.nextInt(80))
    } ++ Seq((800L, 500L, 600L)) // exact touch partner below
    val extraL = Seq((902L, 400L, 500L), (903L, 600L, 700L)) // touch 800 at both ends
    val l = (lefts ++ extraL).toDF("l_id", "l_start", "l_end")
    val r = rights.toDF("r_id", "r_start", "r_end")
    val brute = l.crossJoin(r)
      .filter(col("l_end") > col("l_start") && col("r_end") > col("r_start"))
      .filter(col("l_start") < col("r_end") && col("r_start") < col("l_end"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    // touching endpoints excluded by half-open semantics
    assert(!brute.contains((902L, 800L)) && !brute.contains((903L, 800L)))
    for (w <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      val got = Joins.intervalOverlapJoin(l, r, binWidth = w)
        .select("l_id", "r_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"binWidth=$w emitted a pair more than once")
      assert(got.toSet == brute, s"binWidth=$w diverged from brute force")
    }
  }

  test("intervalOverlapJoin plans an equi shuffle join, not a nested loop") {
    val l = (0L until 50L).map(i => (i, i * 10, i * 10 + 25))
      .toDF("l_id", "l_start", "l_end")
    val r = (0L until 50L).map(i => (i, i * 9, i * 9 + 12))
      .toDF("r_id", "r_start", "r_end")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Joins.intervalOverlapJoin(l, r, binWidth = 20L)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"keyless overlap join degenerated:\n${plan.take(1500)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected an equi shuffle join on the bin key:\n${plan.take(1500)}")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
