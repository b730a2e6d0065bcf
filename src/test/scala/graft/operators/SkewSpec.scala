package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural evidence that `Skew.saltedJoin` actually fixes the shuffle
  * shape, not just that it returns the same rows (JoinsSpec covers that).
  *
  * With a power-law key, an unsalted shuffle join lands every hot-key row
  * in ONE reducer partition — the straggler that kills the stage at 100 TB.
  * Salting must spread those rows across ~`buckets` partitions. We assert
  * the post-join partition histogram directly: max-partition-rows drops by
  * at least buckets/2 while totals stay identical.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salting spreads the hot key across shuffle partitions") {
    // AQE's own skew splitting would rescue the unsalted plan here and is
    // exactly what this test must not depend on (it only fires for sizes
    // past spark.sql.adaptive.skewJoin thresholds — far above any test
    // fixture; salting is the explicit remedy that works at ANY size)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try testBody() finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  private def testBody(): Unit = {
    val hot = 40000
    // 80% of rows share one key; remainder uniform over 1000 cold keys
    val large = spark.range(hot + 10000).select(
      when(col("id") < hot, lit("hot"))
        .otherwise(concat(lit("k"), col("id") % 1000)).as("key"),
      col("id").as("v"))
    val small = spark.range(1001).select(
      when(col("id") === 1000, lit("hot"))
        .otherwise(concat(lit("k"), col("id"))).as("key"),
      (col("id") * 2).as("w"))

    // force a shuffle join: broadcast would hide the reducer skew entirely
    val noBroadcast = small.hint("shuffle_hash")
    def histogram(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.groupBy(spark_partition_id().as("p")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    // buckets >> reducer count (tests run 4 shuffle partitions): the hot
    // key can only ever reach min(buckets, reducers) reducers, and with few
    // reducers it takes many buckets for murmur3(key, salt) to fill them
    // evenly — see the sizing note on Skew.saltedJoin
    val plainHist = histogram(large.join(noBroadcast, Seq("key")))
    val saltedHist = histogram(Skew.saltedJoin(large, noBroadcast, "key", buckets = 64))

    assert(plainHist.values.sum == saltedHist.values.sum,
      "salting changed the row count")
    // unsalted: one partition holds >= all hot rows
    assert(plainHist.values.max >= hot,
      s"fixture not skewed enough: max=${plainHist.values.max}")
    // salted: hot rows spread over all 4 reducers, +50% slack for bucket
    // imbalance, +10000 for the cold keys sharing the partition
    val ideal = hot / 4
    assert(saltedHist.values.max <= ideal * 3L / 2 + 10000,
      s"salted max partition still ${saltedHist.values.max} rows (ideal hot share $ideal)")
    assert(saltedHist.values.max * 2 <= plainHist.values.max,
      s"salting gained <2x: ${plainHist.values.max} -> ${saltedHist.values.max}")
  }

  test("saltedJoin with buckets=1 degenerates to the plain join") {
    val large = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("key", "v")
    val small = Seq(("a", 10), ("b", 20)).toDF("key", "w")
    val got = Skew.saltedJoin(large, small, "key", buckets = 1)
      .select("key", "v", "w").collect().map(_.toString).sorted
    val want = large.join(small, Seq("key"))
      .select("key", "v", "w").collect().map(_.toString).sorted
    assert(got.sameElements(want))
  }
}
