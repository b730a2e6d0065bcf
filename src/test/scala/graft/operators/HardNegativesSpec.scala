package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hard-negative mining laws: same-label rows are never returned, ranking
  * follows cosine, and the anchor side broadcasts. */
class HardNegativesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2-d geometry with hand-known cosines to the x-axis anchor (1, 0):
  //   id 1 (label 0): (1, 0)      cos 1.0   — same label, must be excluded
  //   id 2 (label 1): (0.9, 0.1)  cos ~0.994 — the hardest negative
  //   id 3 (label 1): (0, 1)      cos 0.0
  //   id 4 (label 2): (0.5, 0.5)  cos ~0.707
  //   id 5 (label 0): (0.99, 0.01) — near-identical but same label: excluded
  private def corpus = Seq(
    (1L, Seq(1.0, 0.0), 0), (2L, Seq(0.9, 0.1), 1), (3L, Seq(0.0, 1.0), 1),
    (4L, Seq(0.5, 0.5), 2), (5L, Seq(0.99, 0.01), 0)
  ).toDF("vec_id", "v", "label")

  private def anchor = Seq((0L, Seq(1.0, 0.0), 0))
    .toDF("qid", "qv", "qlabel")

  test("hardNegatives: excludes same-label rows, ranks by cosine desc") {
    val got = Similarity.hardNegatives(corpus, anchor, 3)
      .select(col("rank"), col("vec_id")).as[(Int, Long)]
      .collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(2L, 4L, 3L),
      s"want hardest-first cross-label order, got ${got.toSeq}")
    // the same-label near-duplicates (ids 1, 5) must never appear
    assert(!got.map(_._2).toSet.exists(Set(1L, 5L)))
  }

  test("hardNegatives: k caps the output per anchor") {
    val got = Similarity.hardNegatives(corpus, anchor, 1).collect()
    assert(got.length == 1 && got.head.getAs[Long]("vec_id") == 2L)
  }

  test("hardNegatives plan: anchors broadcast against one corpus scan") {
    val plan = Similarity.hardNegatives(corpus, anchor, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
