package graft.functions

import graft.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dot_product generates real code: fallback disabled, value exact, stage codegen'd") {
    // spark.sql.codegen.fallback=false makes a Janino failure FATAL instead
    // of a silent interpreted fallback — this pins that DotProduct's
    // doGenCode actually compiles
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // repartition defeats ConvertToLocalRelation, which would otherwise
      // evaluate the projection at optimize time (interpreted) and leave
      // nothing to codegen
      val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
        .repartition(1)
        .select(graft.functions.VectorExprs
          .dotProduct(org.apache.spark.sql.functions.col("a"),
            org.apache.spark.sql.functions.col("b")).as("d"))
      assert(df.collect()(0).getDouble(0) == 32.0)
      // "*(n)" is the whole-stage-codegen marker in the AQE plan string
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(") && plan.contains("dot_product"), plan)
      // null propagation through the generated null-safe wrapper
      val withNull = Seq((Seq(1.0), null.asInstanceOf[Seq[Double]]))
        .toDF("a", "b")
        .select(graft.functions.VectorExprs
          .dotProduct(org.apache.spark.sql.functions.col("a"),
            org.apache.spark.sql.functions.col("b")).as("d"))
      assert(withNull.collect()(0).isNullAt(0))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("rolling fingerprints: identical text → identical set; shared runs → shared fps") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val copy = base
    val shifted = "PREFIX PAD " + base // same long run, different offset
    val unrelated = "completely different content with nothing in common at all here"
    val df = Seq((1L, base), (2L, copy), (3L, shifted), (4L, unrelated))
      .toDF("doc_id", "text")
      .select(col("doc_id"), RollingFingerprints(col("text"), 20, 8).as("fps"))
    val fps = df.as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L) == fps(2L), "identical docs must share the full set")
    assert(fps(1L).toSet.intersect(fps(3L).toSet).nonEmpty,
      "shifted copy must share fingerprints (position independence)")
    assert(fps(1L).toSet.intersect(fps(4L).toSet).isEmpty,
      "unrelated docs should share nothing at these parameters")
    // sorted + distinct output
    assert(fps(1L) == fps(1L).distinct.sorted)
  }

  test("rollingFpPairs surfaces planted copies through the inverted index") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (3L, "one two three four five six seven eight nine ten eleven twelve here"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.rollingFpPairs(docs, minShared = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("GraftExtensions registers every native function for plain SQL") {
    // TestSpark builds its session withExtensions(new GraftExtensions) —
    // exactly how a production session would install the engine
    val row = spark.sql(
        """SELECT
          |  canonical_json(named_struct('b', 2, 'a', 1)) AS cj,
          |  simhash64(array('x', 'y')) AS sh,
          |  size(minhash_signature(array('x', 'y'), 16)) AS mh,
          |  ngram_shingles(array('a', 'b', 'c'), 2) AS ng,
          |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
          |  size(rolling_fingerprints('abcdefghijklmnopqrstuvwxyz', 5, 3)) AS rf
          |""".stripMargin).collect()(0)
    assert(row.getString(0) == """{"a":1,"b":2}""")
    assert(row.getLong(1) != 0L)
    assert(row.getInt(2) == 16)
    assert(row.getSeq[String](3) == Seq("a b", "b c"))
    assert(row.getDouble(4) == 11.0)
    assert(row.getInt(5) > 0)
  }

  test("sketch aggregates and probes work from plain SQL") {
    spark.range(100).createOrReplaceTempView("sk_in")
    val row = spark.sql(
        """WITH b AS (
          |  SELECT bloom_filter_agg(xxhash64(id), 1024, 4) AS bloom,
          |         count_min_sketch_agg(xxhash64(id), 3, 256) AS cms
          |  FROM sk_in)
          |SELECT
          |  bloom_might_contain(bloom, xxhash64(7L), 4) AS hit,
          |  cms_estimate(cms, xxhash64(7L), 256) AS est
          |FROM b""".stripMargin).collect()(0)
    assert(row.getBoolean(0), "inserted value must probe true")
    assert(row.getLong(1) >= 1L, "CMS must count the inserted value")
  }

  test("top_k works from plain SQL") {
    spark.range(50).createOrReplaceTempView("tk_in")
    val top = spark.sql(
        "SELECT top_k(struct(id, CAST(id AS STRING)), 3) AS t FROM tk_in")
      .selectExpr("transform(t, x -> x.id) AS ids")
      .collect()(0).getSeq[Long](0)
    assert(top == Seq(49L, 48L, 47L))
  }

  test("bitmap and kmv aggregates work from plain SQL") {
    spark.range(200).createOrReplaceTempView("bm_in")
    val row = spark.sql(
        """WITH b AS (
          |  SELECT id % 2 AS par,
          |    bitmap_or_agg(id, 1024) AS bits,
          |    kmv_agg(xxhash64(id), 64) AS kmv
          |  FROM bm_in GROUP BY id % 2),
          |m AS (
          |  SELECT bitmap_merge_agg(bits) AS merged,
          |    min(bitmap_bit_count(bits)) AS per_side
          |  FROM b)
          |SELECT per_side, bitmap_bit_count(merged) AS total,
          |  (SELECT bitmap_and_count(x.bits, y.bits)
          |   FROM b x JOIN b y ON x.par < y.par) AS inter,
          |  (SELECT size(kmv) FROM b WHERE par = 0) AS kmv_sz
          |FROM m""".stripMargin).collect()(0)
    assert(row.getLong(0) == 100L) // each parity holds 100 distinct ids
    assert(row.getLong(1) == 200L) // OR-merge unions them
    assert(row.getLong(2) == 0L)   // parities are disjoint
    assert(row.getInt(3) == 64)    // KMV capped at k
  }
}
