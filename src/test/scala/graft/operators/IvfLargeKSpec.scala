package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Large-k centroid assignment (the 100 TB cliff named in round 5): above
  * [[AnnIvf.BroadcastKThreshold]] the assignment plan must be a broadcast
  * centroid-table join, not a literal centroid array serialized into every
  * task — and both plans must produce IDENTICAL assignments.
  */
class IvfLargeKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
    .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    .cache()

  test("join path and literal path assign identical cells") {
    // same centroids through both code paths: k=64 stays under the
    // threshold (literal), then the SAME 64 centroids forced through the
    // join path via a threshold-spanning copy of the corpus assignment
    val small = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val cents = AnnIvf.trainCentroids(small, k = 64, iterations = 1)
    val literal = AnnIvf.assignCells(small, cents)
      .select(col("vec_id"), col("cell")).orderBy("vec_id")
      .collect().map(_.toString).toSeq
    // pad the centroid array with far-away sentinels to push it over the
    // threshold WITHOUT changing any argmin (padding cells never win)
    val far = Seq.fill(64)(1e9)
    val padded = cents ++ Array.fill(AnnIvf.BroadcastKThreshold + 1 - 64)(far: Seq[Double])
    val joined = AnnIvf.assignCells(small, padded)
      .select(col("vec_id"), col("cell")).orderBy("vec_id")
      .collect().map(_.toString).toSeq
    assert(joined == literal,
      "broadcast-join assignment must equal literal-expression assignment")
  }

  test("k=4096 on sf0.1: training and search stay green through the join plan") {
    // the corpus (2000 vectors) clamps the trained cell count, but the
    // requested k drives the code path: > threshold → broadcast join
    val cents = AnnIvf.trainCentroids(emb, k = 4096, iterations = 1)
    assert(cents.length > AnnIvf.BroadcastKThreshold)
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val res = AnnIvf.topK(emb, qs, 5, cents, nprobe = 8)
    assert(res.count() == 25)
    // with ~1 vector per cell, the query's own planted... no plants here:
    // just assert the exact-self exclusion and deterministic shape
    assert(res.filter(col("neighbor") === col("qid")).count() == 0)
  }

  test("the large-k plan is a broadcast join, not a kilobyte literal") {
    val cents = AnnIvf.trainCentroids(emb, k = 4096, iterations = 1)
    val assigned = AnnIvf.assignCells(emb, cents)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"large-k assignment must broadcast a centroid table:\n${plan.take(2000)}")
    assert(!plan.contains("nearest_cells"),
      "large-k assignment must not embed the centroid array as a literal")
    // and the argmin reduces map-side: partial aggregation before the shuffle
    assert(plan.contains("partial_min_by") || plan.contains("min_by"),
      s"argmin must be an aggregate, got:\n${plan.take(2000)}")
  }
}
