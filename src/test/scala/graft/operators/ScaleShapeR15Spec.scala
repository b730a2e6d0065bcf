package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 scale-shape pins for the clustering shelf: centroid assignment
  * must be pure per-row expression work (no shuffle, no join, no window),
  * the Lloyd update and census must reduce through ONE map-side-combined
  * hash aggregate, and SemDedup's pair join must be cell-keyed (the
  * IVF-bounded candidate contract), never a cross join. */
class ScaleShapeR15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = (0L until 200L).map { i =>
    (i, Seq.tabulate(16)(d => ((i % 5 + d) * 1e-3).toFloat))
  }.toDF("vec_id", "embedding")

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private lazy val cents =
    Clustering.lloyd(Clustering.intVecs(fixture), k = 4, iters = 2)

  test("assignment plan: per-row only — no exchange, no join, no window") {
    val plan = executedPlan(
      Clustering.withCellDist(Clustering.intVecs(fixture), cents))
    assert(!plan.contains("Exchange"), s"shuffle in assignment plan:\n$plan")
    assert(!plan.contains("Join"), s"join in assignment plan:\n$plan")
    assert(!plan.contains("Window"), s"window in assignment plan:\n$plan")
  }

  test("census plan: one partial+final hash aggregate, no window") {
    val census = Clustering.kmeansCensus(fixture, k = 4, iters = 2)
    val plan = executedPlan(census)
    assert(!plan.contains("Window"), s"window in census plan:\n$plan")
    assert(plan.contains("partial"),
      s"census aggregate not map-side combined:\n$plan")
  }

  test("medoid plan: struct-min aggregate, no window") {
    val plan = executedPlan(Clustering.clusterMedoids(fixture, k = 4, iters = 2))
    assert(!plan.contains("Window"), s"window in medoid plan:\n$plan")
    assert(plan.contains("partial"),
      s"medoid struct-min not map-side combined:\n$plan")
  }

  test("semdedup pair join is cell-keyed, never a cross join") {
    val plan = executedPlan(Clustering.semDedupDropped(fixture, k = 4, iters = 2))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"unkeyed pair join in semdedup plan:\n$plan")
    assert(plan.contains("cell"), s"pair join not on cell:\n$plan")
  }
}
