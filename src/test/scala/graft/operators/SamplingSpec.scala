package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Weighted A-ES sampling laws: determinism, exact-k, and weight dominance. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weightedSample: exact k, deterministic, dominated by heavy weights") {
    val rows = (0L until 500L).map(i => (i, if (i < 5) 1000000L else 1L))
    val df = rows.toDF("doc_id", "w")
    val s1 = SketchOps.weightedSample(df, 50, col("w"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    val s2 = SketchOps.weightedSample(df, 50, col("w"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(s1.size == 50)
    assert(s1 == s2, "the hash-derived draw must be reproducible")
    // a weight 10^6 doc among weight-1 docs has inclusion odds ~1−10⁻⁶ per
    // draw; all five landing outside the top-50 would need five
    // simultaneous ~2^-20 hash flukes — their absence means a weight bug
    assert((0L until 5L).forall(s1.contains), s"heavy rows missing: $s1")
    // and the k-row sample is a subset of the input
    assert(s1.subsetOf(rows.map(_._1).toSet))
  }

  test("weightedSample: repartitioning never changes the sample") {
    val df = (0L until 300L).map(i => (i, 1L + i % 7)).toDF("doc_id", "w")
    val a = SketchOps.weightedSample(df, 40, col("w"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    val b = SketchOps.weightedSample(df.repartition(13), 40, col("w"),
      col("doc_id")).select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }
}
