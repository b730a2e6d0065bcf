package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FuzzyJoin's claim is EXACTNESS — the PassJoin segment filter must be a
  * superset of the true edit-distance-<=d pair set (pigeonhole), and the
  * levenshtein verify makes the final answer equal to the brute-force
  * cross join. So the core law here is literal result equality against
  * brute force, on corpora whose mutations exercise every edit type and
  * alignment shift the +-d position bound has to absorb.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteForce(corpus: DataFrame, queries: DataFrame,
      d: Int): Set[(Long, Long, Int)] =
    queries.crossJoin(corpus)
      .withColumn("dist", levenshtein(col("qkey"), col("key")))
      .filter(col("dist") <= d && length(col("qkey")) >= 3 &&
        length(col("key")) >= 3)
      .select(col("query_id"), col("id"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet

  private def run(corpus: DataFrame, queries: DataFrame,
      d: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistanceJoin(corpus, queries, d)
      .as[(Long, Long, Int)].collect().toSet

  /** Random word-soup keys (same alphabet as the testdata corpus). */
  private def randKey(rnd: scala.util.Random, len: Int): String = {
    val chars = "abcdefghijklmnopqrstuvwxyz0123456789 "
    (0 until len).map(_ => chars(rnd.nextInt(chars.length))).mkString
  }

  /** Apply exactly k random single-char edits (sub/ins/del mixed). */
  private def mutate(rnd: scala.util.Random, s: String, k: Int): String = {
    var cur = s
    (0 until k).foreach { _ =>
      val p = rnd.nextInt(math.max(cur.length, 1))
      rnd.nextInt(3) match {
        case 0 if cur.nonEmpty => // substitute
          cur = cur.updated(p, ('a' + rnd.nextInt(26)).toChar)
        case 1 => // insert
          cur = cur.substring(0, p) + ('a' + rnd.nextInt(26)).toChar +
            cur.substring(p)
        case _ if cur.length > 3 => // delete (keep >= 3 chars)
          cur = cur.substring(0, p) + cur.substring(math.min(p + 1, cur.length))
        case _ =>
          cur = cur.updated(p, ('a' + rnd.nextInt(26)).toChar)
      }
    }
    cur
  }

  test("editDistanceJoin equals brute force on random mutated corpora (d=1,2)") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 80L).map(i => (i, randKey(rnd, 8 + rnd.nextInt(25))))
    // queries: 0..19 mutated with 0..3 edits (3-edit ones must NOT match
    // their seed unless another key happens closer), plus a few unrelated
    val queries = base.take(20).map { case (id, k) =>
      (id, mutate(rnd, k, (id % 4).toInt))
    } ++ Seq((900L, randKey(rnd, 15)), (901L, randKey(rnd, 30)))
    val corpusDf = base.toDF("id", "key")
    val queryDf = queries.toDF("query_id", "qkey")
    for (d <- Seq(1, 2)) {
      assert(run(corpusDf, queryDf, d) === bruteForce(corpusDf, queryDf, d),
        s"mismatch vs brute force at d=$d")
    }
  }

  test("d=3 stays exact (4 segments, min key length 4)") {
    val rnd = new scala.util.Random(13)
    val base = (0L until 50L).map(i => (i, randKey(rnd, 6 + rnd.nextInt(20))))
    val queries = base.take(15).map { case (id, k) =>
      (id, mutate(rnd, k, (id % 5).toInt)) // up to 4 edits: 4-edit ones exceed d
    }
    val corpusDf = base.toDF("id", "key")
    val queryDf = queries.toDF("query_id", "qkey")
    val brute = queryDf.crossJoin(corpusDf)
      .withColumn("dist", levenshtein(col("qkey"), col("key")))
      .filter(col("dist") <= 3 && length(col("qkey")) >= 4 &&
        length(col("key")) >= 4)
      .select(col("query_id"), col("id"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    assert(run(corpusDf, queryDf, 3) === brute)
  }

  test("alignment shifts: leading/trailing insertions and deletions are found") {
    // edits at the EXTREMES shift every later segment by the full d — the
    // +-d probe-position window is exactly what absorbs this
    val k = "the quick brown fox jumps over it"
    val corpusDf = Seq((1L, k)).toDF("id", "key")
    val queryDf = Seq(
      (10L, "xy" + k),            // 2 leading inserts: every segment shifts +2
      (11L, k.substring(2)),      // 2 leading deletes: shifts -2
      (12L, k + "xy"),            // trailing inserts
      (13L, k.substring(0, k.length - 2)), // trailing deletes
      (14L, "x" + k.substring(1, k.length - 1) + "y") // sub both ends
    ).toDF("query_id", "qkey")
    val got = run(corpusDf, queryDf, 2)
    assert(got === Set((10L, 1L, 2), (11L, 1L, 2), (12L, 1L, 2),
      (13L, 1L, 2), (14L, 1L, 2)))
  }

  test("keys shorter than 3 chars are dropped from both sides") {
    val corpusDf = Seq((1L, "ab"), (2L, "abcd")).toDF("id", "key")
    val queryDf = Seq((10L, "ab"), (11L, "abce")).toDF("query_id", "qkey")
    val got = run(corpusDf, queryDf, 2)
    // (10,"ab") dropped as a query; corpus "ab" dropped as a target
    assert(got === Set((11L, 2L, 1)))
  }

  test("identical keys match at dist 0; beyond-d pairs are absent") {
    val corpusDf = Seq((1L, "hello world"), (2L, "completely different"))
      .toDF("id", "key")
    val queryDf = Seq((10L, "hello world")).toDF("query_id", "qkey")
    assert(run(corpusDf, queryDf, 2) === Set((10L, 1L, 0)))
  }

  test("probe side broadcasts (lookup workloads never shuffle the corpus)") {
    val corpusDf = Seq((1L, "abcdefgh")).toDF("id", "key")
    val queryDf = Seq((10L, "abcdefgi")).toDF("query_id", "qkey")
    val plan = FuzzyJoin.editDistanceJoin(corpusDf, queryDf, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("shuffle-join path (broadcastProbes=false) matches the broadcast path") {
    val rnd = new scala.util.Random(23)
    val base = (0L until 60L).map(i => (i, randKey(rnd, 10 + rnd.nextInt(15))))
    val queries = base.take(12).map { case (id, k) =>
      (id, mutate(rnd, k, (id % 3).toInt))
    }
    val corpusDf = base.toDF("id", "key")
    val queryDf = queries.toDF("query_id", "qkey")
    val viaShuffle = FuzzyJoin.editDistanceJoin(corpusDf, queryDf, 2,
      broadcastProbes = false)
    assert(viaShuffle.as[(Long, Long, Int)].collect().toSet ===
      run(corpusDf, queryDf, 2))
    // broadcastProbes=false removes the FORCED hint; Catalyst may still
    // auto-broadcast a side that fits under autoBroadcastJoinThreshold
    // (this tiny one does) — so assert the semantics, and that the plan
    // goes shuffle when the threshold rules broadcast out, as it would
    // for a genuinely large probe side
    val spark2 = spark
    spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val forced = FuzzyJoin.editDistanceJoin(corpusDf, queryDf, 2,
        broadcastProbes = false)
      val plan = forced.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"with broadcast disabled and no hint the join must shuffle:\n$plan")
      assert(forced.as[(Long, Long, Int)].collect().toSet ===
        run(corpusDf, queryDf, 2))
    } finally {
      spark2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("recall is total: any key mutated with at most d edits finds its seed") {
    // property-style sweep: many independent (seed, edit-count) draws, every
    // mutation with k <= d edits MUST surface its seed (pigeonhole has no
    // failure probability, unlike LSH recall)
    val rnd = new scala.util.Random(31)
    val base = (0L until 40L).map(i => (i, randKey(rnd, 6 + rnd.nextInt(28))))
    val corpusDf = base.toDF("id", "key")
    for (trial <- 0 until 4) {
      val queries = base.map { case (id, k) =>
        (id, mutate(rnd, k, rnd.nextInt(3))) // 0..2 edits at d=2
      }
      val got = run(corpusDf, queries.toDF("query_id", "qkey"), 2)
      val missing = queries.filter { case (id, q) =>
        q.length >= 3 && !got.exists { case (qq, cid, _) => qq == id && cid == id }
      }
      assert(missing.isEmpty,
        s"trial $trial: mutated keys missed their seeds: ${missing.take(3)}")
    }
  }

  test("skew stress: a 30%-hot shared segment stays exact, and the cap bounds it") {
    // 30% of the corpus shares segment 0 verbatim — the stop-word-like
    // bucket the frequency cap exists for. All keys length 12, d=2 → three
    // 4-char segments; 300 of 1000 keys open with "zzzz".
    val rnd = new scala.util.Random(41)
    def uniq(n: Int) = (0 until n).map(_ => randKey(rnd, 8)).distinct
    val hot = uniq(400).take(300).map(s => "zzzz" + s)
    val cold = uniq(900).take(700).map(s => randKey(rnd, 4) + s)
    val base = (hot ++ cold).zipWithIndex.map { case (k, i) => (i.toLong, k) }
    val corpusDf = base.toDF("id", "key").cache()
    // queries: 20 hot-seeded and 10 cold-seeded keys, 0..2 edits applied
    // AFTER the shared prefix (so hot queries keep probing the hot bucket)
    val queries = (base.take(20) ++ base.slice(300, 310)).map { case (id, k) =>
      (id, k.substring(0, 4) + mutate(rnd, k.substring(4), (id % 3).toInt))
    }
    val queryDf = queries.toDF("query_id", "qkey").cache()
    try {
      // 1) UNCAPPED: exact under skew — brute-force equality
      assert(run(corpusDf, queryDf, 2) === bruteForce(corpusDf, queryDf, 2),
        "hot-segment corpus broke exactness")
      // 2) CAPPED: every index bucket is bounded by the cap…
      val cap = 50
      val capped = FuzzyJoin.editDistanceJoin(corpusDf, queryDf, 2,
        maxBucket = Some(cap)).as[(Long, Long, Int)].collect().toSet
      val bucketSizes = FuzzyJoin.cappedIndexForTest(corpusDf, 2, cap)
        .groupBy(col("gi"), col("seg"), col("klen")).count()
        .agg(max(col("count"))).collect()(0).getLong(0)
      assert(bucketSizes <= cap,
        s"capped index still has a bucket of $bucketSizes > $cap")
      // …the capped answer is a SUBSET of the exact one (no false pairs)…
      assert(capped.subsetOf(bruteForce(corpusDf, queryDf, 2)))
      // …and pairs reachable through any under-cap bucket survive: every
      // cold-seeded query still finds its seed (their buckets are unique)
      val coldIds = (300L until 310L).toSet
      assert(coldIds.forall(q =>
        capped.exists { case (qq, id, _) => qq == q && id == q }),
        "the cap must not disturb under-cap buckets")
    } finally { corpusDf.unpersist(); queryDf.unpersist() }
  }

  test("q92 oracled query agrees with brute force at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntryAccess.q92(spark, dir)
      .as[(Long, Long, Int)].collect().toSet
    val keyed = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), FuzzyJoin.normKey(col("text")).as("key"))
      .filter(length(col("key")) >= 6)
    val queries = keyed.filter(col("doc_id") < 25)
      .select(col("doc_id").as("query_id"),
        concat(lit("zz"), col("key").substr(lit(3), length(col("key"))))
          .as("qkey"))
    val brute = bruteForce(keyed.select(col("doc_id").as("id"), col("key")),
      queries, 2)
    assert(got === brute)
    assert(got.nonEmpty, "sf0.001 fuzzy lookup found no pairs — gate is vacuous")
    // every query's mutated key must at minimum find its own seed doc
    val qids = queries.select(col("query_id")).as[Long].collect().toSet
    assert(qids.forall(q => got.exists { case (qq, id, _) => qq == q && id == q }),
      "a mutated key failed to find its own seed document")
  }
}

/** Test-only access to the q92 QueryDef without going through SparkEntry. */
private object SparkEntryAccess {
  def q92 = FuzzyJoin.defs.head.fn
}
