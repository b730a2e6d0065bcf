package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Embedding distribution-drift laws (B83, q132). */
class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("embeddingDrift: per-dimension means and drift match hand computation") {
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f)), (2L, Seq(3.0f, 0.0f)), // side A (even ids)
      (1L, Seq(2.0f, 2.0f)), (3L, Seq(2.0f, 4.0f))  // side B
    ).toDF("vec_id", "embedding")
    val got = Similarity.embeddingDrift(rows, col("vec_id") % 2 === 0)
      .select(col("dim"), col("mean_a"), col("mean_b"), col("drift"))
      .as[(Int, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0) == ((2.0, 2.0, 0.0)))
    assert(got(1) == ((0.0, 3.0, 3.0)))
  }

  test("embeddingDrift: a planted shift on one dimension is isolated to it") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 400L).map { i =>
      val base = Array.fill(8)(rnd.nextFloat() * 2 - 1)
      if (i % 2 == 0) base(5) += 10.0f // side A shifted on dim 5 only
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
    val drifts = Similarity.embeddingDrift(rows, col("vec_id") % 2 === 0)
      .select(col("dim"), col("drift")).as[(Int, Double)].collect().toMap
    assert(drifts(5) > 9.0, s"planted shift missing: $drifts")
    drifts.filter(_._1 != 5).values.foreach(d =>
      assert(d < 1.0, s"unshifted dims must stay near 0: $drifts"))
  }
}
