package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-prefiltered semi-join laws: output equals the plain semi-join
  * (no false negatives, FPs cleaned exactly), and the prefilter really
  * reduces the probe side by about the build side's selectivity. */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val probe = (0L until 20000L)
    .map(i => (i, s"val$i")).toDF("k", "payload")
  // 2% of the key domain, plus keys absent from the probe entirely
  private lazy val build = ((0L until 20000L by 50L) ++
    (100000L until 100050L)).toDF("k")

  test("output == plain left-semi join, row for row") {
    val got = SketchOps.bloomSemiJoin(probe, build, "k")
      .orderBy("k").collect().toSeq
    val want = probe.join(build.distinct(), Seq("k"), "left_semi")
      .orderBy("k").collect().toSeq
    assert(got == want)
    assert(got.size == 400)
  }

  test("the prefilter drops ~all non-matching probe rows before the join") {
    val bloom = build.agg(graft.functions.BloomFilterAgg.of(
      xxhash64(col("k")), 1 << 21, 5).as("bloom"))
    val survivors = probe.crossJoin(broadcast(bloom))
      .filter(graft.functions.BloomMightContain.of(
        col("bloom"), xxhash64(col("k")), 5))
      .count()
    // 400 true matches; fp budget: well under 1% of the 19600 non-matches
    assert(survivors >= 400, s"false negatives: $survivors < 400")
    assert(survivors <= 400 + 196, s"prefilter too weak: $survivors")
  }
}
