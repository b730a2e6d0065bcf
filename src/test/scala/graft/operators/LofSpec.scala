package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LOF laws (round 9, B173). */
class LofSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("a margin point beside a tight cluster outranks every cluster member") {
    val rnd = new scala.util.Random(6)
    // tight 2-D cluster at origin (spread 0.01) + one point at moderate
    // distance — LOCALLY anomalous even though a global distance cut that
    // keeps the far-away second cluster would miss it
    val cluster = (1L to 40L).map(i =>
      (i, Array(rnd.nextFloat() * 0.01f, rnd.nextFloat() * 0.01f)))
    val margin = Seq((100L, Array(0.2f, 0.2f)))
    val far = (200L to 240L).map(i =>
      (i, Array(5f + rnd.nextFloat() * 0.01f, 5f + rnd.nextFloat() * 0.01f)))
    val got = Similarity.lofOutliers(emb(cluster ++ margin ++ far),
      k = 5, topN = 3).as[(Long, Long, Long)].collect()
    assert(got.head._1 == 100L, s"top=${got.toSeq}")
    // its score is far above the ~1.0 (1e9 nano) of in-cluster points
    assert(got.head._3 > 3L * 1000000000L)
  }

  test("uniform data scores near 1.0 (1e9 nanos)") {
    val rnd = new scala.util.Random(12)
    val rows = (1L to 120L).map(i =>
      (i, Array(rnd.nextFloat(), rnd.nextFloat(), rnd.nextFloat())))
    val scores = Similarity.lofOutliers(emb(rows), k = 8, topN = 120)
      .as[(Long, Long, Long)].collect().map(_._3)
    assert(scores.max < 2L * 1000000000L, s"max=${scores.max}")
    assert(scores.min > 500000000L, s"min=${scores.min}")
  }
}
