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

  test("distributed update == driver update: same centroids either side of the threshold") {
    // the SAME corpus and seed trained at k=16 (driver-held loop) must agree
    // with the cluster-side DataFrame loop. The distributed loop only engages
    // above BroadcastKThreshold, so drive it directly by lowering k through
    // a padded parallel formulation: instead, train k=16 twice — once via the
    // public path and once by forcing the join loop on a corpus where the
    // seeded init picks identical starting centroids. The invariant that
    // makes this checkable: both loops are Lloyd iterations from the same
    // init, so per-cell means must match to float tolerance.
    val small = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .cache()
    try {
      val driverSide = AnnIvf.trainCentroids(small, k = 16, iterations = 3)
      val clusterSide = AnnIvf.trainCentroidsDistributed(small,
        AnnIvf.initCentroids(small, k = 16, seed = 42L), iterations = 3)
      assert(driverSide.length == clusterSide.length)
      driverSide.zip(clusterSide).zipWithIndex.foreach { case ((a, b), i) =>
        val maxDiff = a.zip(b).map { case (x, y) => math.abs(x - y) }.max
        assert(maxDiff < 1e-9, s"cell $i diverged by $maxDiff")
      }
    } finally small.unpersist()
  }

  test("dim=256 training runs through VectorSumAgg without per-dim expression fan-out") {
    // a wide synthetic corpus: 600 vectors of dim 256, k above the threshold
    // so the whole loop (assignment join + vector_sum update + centroid
    // re-join) runs cluster-side. The old array(sum(element_at…)) update
    // built 256 aggregate expressions here; vector_sum keeps ONE.
    import spark.implicits._
    val dim = 256
    val wide = spark.range(600).select(col("id").as("vec_id"))
      .withColumn("v", transform(sequence(lit(1), lit(dim)),
        i => sin(col("vec_id") * i.cast("double"))))
      .cache()
    try {
      val cents = AnnIvf.trainCentroids(wide, k = 300, iterations = 2)
      assert(cents.length > AnnIvf.BroadcastKThreshold)
      assert(cents.forall(_.size == dim))
      // the mean of unit-bounded sines stays unit-bounded — a unit mix-up
      // (sum vs mean, nanos-style scaling) would blow past this
      assert(cents.forall(_.forall(x => x >= -1.0 && x <= 1.0)))
      // and the trained centroids still drive a working search
      val qs = wide.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      assert(AnnIvf.topK(wide, qs, 5, cents, nprobe = 8).count() == 15)
    } finally wide.unpersist()
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
