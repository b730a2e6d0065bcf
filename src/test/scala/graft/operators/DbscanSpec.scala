package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DBSCAN laws on planted geometry: two tight directional blobs and
  * scattered noise, plus the role semantics (core/border/noise) and
  * determinism. */
class DbscanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Unit-ish vectors: two blobs around orthogonal axes + lone outliers.
    * Blob members are small deterministic perturbations of the axis, so
    * within-blob cosine ≈ 1 and cross-blob cosine ≈ 0. */
  private lazy val fixture: Seq[(Long, Seq[Double])] = {
    val dim = 8
    def axis(k: Int) = Array.tabulate(dim)(i => if (i == k) 1.0 else 0.0)
    def jitter(base: Array[Double], seed: Int): Seq[Double] = {
      val rnd = new scala.util.Random(seed)
      base.map(x => x + (rnd.nextDouble() - 0.5) * 0.1).toSeq
    }
    val blobA = (0 until 6).map(i => (100L + i, jitter(axis(0), i)))
    val blobB = (0 until 5).map(i => (200L + i, jitter(axis(1), 50 + i)))
    // outliers: distinct mixed directions, far from both blobs and from
    // each other
    val noise = Seq(
      (300L, Seq(0.7, 0.7, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (301L, Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (302L, Seq(0.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 0.0)))
    blobA ++ blobB ++ noise
  }

  test("planted blobs: exact clusters, border semantics, outliers -> noise") {
    val df = fixture.toDF("id", "v")
    val got = Similarity.dbscan(df, eps = 0.9, minPts = 4)
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // blob A (6 members, all within eps of each other): all core, one
    // cluster labeled by the min id
    (100L to 105L).foreach { id =>
      assert(got(id) == (("core", Some(100L))), s"$id -> ${got(id)}")
    }
    // blob B (5 members): all core (deg 4 >= minPts-1), min label 200
    (200L to 204L).foreach { id =>
      assert(got(id) == (("core", Some(200L))), s"$id -> ${got(id)}")
    }
    // outliers: no eps-neighbors at all -> noise, null cluster
    Seq(300L, 301L, 302L).foreach { id =>
      assert(got(id) == (("noise", None)), s"$id -> ${got(id)}")
    }
  }

  test("border role: a point within eps of a cluster but below core degree") {
    // 4-point blob (each deg 3 = minPts-1 -> core at minPts 4) plus one
    // point near ONLY one blob member
    val dim = 4
    val blob = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)), (2L, Seq(0.99, 0.05, 0.0, 0.0)),
      (3L, Seq(0.99, -0.05, 0.0, 0.0)), (4L, Seq(0.98, 0.0, 0.05, 0.0)))
    // hanger at 12.4° from the x-axis: 9.5° from member 2 (inside the
    // 9.94° eps ball) but > 9.94° from members 1/3/4 — degree 1 -> border
    val hanger = Seq((9L, Seq(0.9767, 0.2147, 0.0, 0.0)))
    val df = (blob ++ hanger).toDF("id", "v")
    val got = Similarity.dbscan(df, eps = 0.985, minPts = 4)
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    (1L to 4L).foreach(id => assert(got(id)._1 == "core", s"$id -> ${got(id)}"))
    assert(got(9L)._1 == "border" && got(9L)._2 == Some(1L), s"9 -> ${got(9L)}")
  }

  test("determinism: two runs agree row for row") {
    val df = fixture.toDF("id", "v")
    val a = Similarity.dbscan(df, eps = 0.9, minPts = 3)
      .orderBy("vec_id").collect().toSeq
    val b = Similarity.dbscan(df, eps = 0.9, minPts = 3)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }
}
