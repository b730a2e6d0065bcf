package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the embedding-clustering shelf (q359–q361): integerized Lloyd
  * recovers planted geometry, floored-mean and empty-cell-carry semantics,
  * SemDedup's dominated-by-lower-id rule, planted-duplicate recall on the
  * real corpus, silhouette bounds, and partition invariance. */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.001"

  /** Two tight blobs far apart (pre-integerization space, like the real
    * embedding column): blob A around +0.2·e0, blob B around +0.2·e1. */
  private lazy val blobs: Seq[(Long, Seq[Float])] = {
    val dim = 8
    def pt(axis: Int, off: Double): Seq[Float] =
      Seq.tabulate(dim)(i => (if (i == axis) 0.2 + off else off / 2).toFloat)
    val a = (0 until 6).map(i => (100L + i, pt(0, i * 1e-3)))
    val b = (0 until 5).map(i => (200L + i, pt(1, i * 1e-3)))
    a ++ b
  }

  private def embDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("lloyd separates planted blobs and centroids land on floored means") {
    val vecs = Clustering.intVecs(embDf(blobs))
    val cents = Clustering.lloyd(vecs, k = 2, iters = 3)
    val assigned = Clustering.withCellDist(vecs, cents)
      .select(col("id"), col("cell")).as[(Long, Int)].collect().toMap
    val cellA = assigned(100L)
    val cellB = assigned(200L)
    assert(cellA != cellB)
    assert((100L to 105L).forall(assigned(_) == cellA))
    assert((200L to 204L).forall(assigned(_) == cellB))
    // converged centroid = floored mean of its blob's integerized members
    val intRows = vecs.select(col("id"), col("x"))
      .as[(Long, Seq[Double])].collect().toMap
    def flooredMean(ids: Seq[Long]): Seq[Double] = {
      val vs = ids.map(intRows)
      vs.head.indices.map(i => math.floor(vs.map(_(i)).sum / vs.size))
    }
    assert(cents(cellA).toSeq == flooredMean(100L to 105L))
    assert(cents(cellB).toSeq == flooredMean(200L to 204L))
  }

  test("floored mean rounds toward -inf on negative components") {
    // integerized values -3 and -4: mean -3.5 floors to -4 (not trunc -3)
    val df = embDf(Seq((1L, Seq(-3e-6f)), (2L, Seq(-4e-6f))))
    val cents = Clustering.lloyd(Clustering.intVecs(df), k = 1, iters = 1)
    assert(cents(0).toSeq == Seq(-4.0))
  }

  test("empty cells carry their previous centroid") {
    // k = n with a duplicated point: the higher-cell duplicate seed never
    // wins a tie (lower cell first), so its cell stays empty and must keep
    // its seed centroid verbatim
    val df = embDf(Seq(
      (1L, Seq(0.0f)), (2L, Seq(0.0f)), (3L, Seq(5e-6f))))
    val cents = Clustering.lloyd(Clustering.intVecs(df), k = 3, iters = 2)
      .map(_.toSeq).sortBy(_.head)
    val third = math.floor((5e-6f).toDouble * 1e6) // float repr -> 4, not 5
    assert(cents.toSeq == Seq(Seq(0.0), Seq(0.0), Seq(third)))
  }

  test("semdedup drops the higher id of an exact duplicate, keeps the lower") {
    // mutually ORTHOGONAL axis vectors (pairwise cosine 0) + one exact
    // duplicate; ids chosen non-multiples of 7 so the in-query plant
    // stays disjoint from the fixture
    def axis(k: Int): Seq[Float] =
      Seq.tabulate(8)(i => if (i == k) 0.2f else 0.0f)
    val ids = Seq(11L, 12L, 13L, 15L, 16L, 17L) // none divisible by 7
    val rows = ids.zipWithIndex.map { case (id, i) => (id, axis(i)) } :+
      (18L -> axis(5))
    val dropped = Clustering.semDedupDropped(embDf(rows), k = 2, iters = 2)
      .select(col("vec_id"), col("dup_of")).as[(Long, Long)].collect().toMap
    assert(dropped == Map(18L -> 17L)) // only the exact dup, by its lower id
  }

  test("planted near-dup recall on the real corpus is total") {
    val emb = graft.Tables.embeddings(spark, SfDir)
    val planted = emb.where(pmod(col("vec_id"), lit(7)) === 0).count()
    val dropped = Clustering.semDedupDropped(emb)
      .select(col("vec_id"), col("dup_of")).as[(Long, Long)].collect()
    // every planted copy (id + 1e9) is dropped, each against its source:
    // the clusters bound the candidate pairs, but a near-identical copy
    // lands in its source's cell, so recall stays 1.0 here
    assert(dropped.length == planted)
    assert(dropped.forall { case (v, d) => v == d + 1000000000L })
  }

  test("silhouette on well-separated blobs is near 1, and bounded") {
    val out = Clustering.silhouetteByCluster(embDf(blobs), k = 2, iters = 3)
      .select(col("cell"), col("n_vecs"), col("mean_sil").cast("double"))
      .as[(Int, Long, Double)].collect()
    assert(out.map(_._2).sum == blobs.size)
    out.foreach { case (_, _, s) =>
      assert(s > 0.9 && s <= 1.0, s"mean_sil $s not in (0.9, 1]")
    }
  }

  test("census counts are complete and wss matches a direct recompute") {
    val emb = graft.Tables.embeddings(spark, SfDir)
    val census = Clustering.kmeansCensus(emb)
      .select(col("cell"), col("n_vecs"), col("wss").cast("double"))
      .as[(Int, Long, Double)].collect()
    assert(census.map(_._2).sum == emb.count())
    val vecs = Clustering.intVecs(emb)
    val cents = Clustering.lloyd(vecs)
    val direct = Clustering.withCellDist(vecs, cents)
      .groupBy(col("cell")).agg(sum(col("d")).as("w"))
      .select(col("cell"), col("w")).as[(Int, Double)].collect().toMap
    census.foreach { case (cell, _, wss) =>
      assert(wss == direct(cell), s"cell $cell wss $wss != ${direct(cell)}")
    }
  }

  test("medoids come one per cluster, from inside their own blob") {
    val out = Clustering.clusterMedoids(embDf(blobs), k = 2, iters = 3)
      .select(col("cell"), col("medoid_id")).as[(Int, Long)].collect()
    assert(out.length == 2)
    assert(out.map(_._1).toSet.size == 2)
    val ids = out.map(_._2).toSet
    assert(ids.exists(id => id >= 100L && id <= 105L), ids.toString)
    assert(ids.exists(id => id >= 200L && id <= 204L), ids.toString)
  }

  test("elbow census flags the planted k on a two-blob corpus") {
    val out = Clustering.elbowCensus(embDf(blobs), ks = Seq(1, 2, 4, 8), iters = 2)
      .select(col("k"), col("wss").cast("double"), col("is_knee"))
      .as[(Int, Double, Boolean)].collect().sortBy(_._1)
    // wss shrinks as k grows, and the knee sits at the planted k = 2
    assert(out.sliding(2).forall(p => p(0)._2 >= p(1)._2))
    assert(out.filter(_._3).map(_._1).toSeq == Seq(2))
    // endpoints carry no curvature, so they can never be knees
    assert(!out.head._3 && !out.last._3)
  }

  test("lloyd and assignment are partition-invariant") {
    val emb = graft.Tables.embeddings(spark, SfDir)
    val v1 = Clustering.intVecs(emb)
    val v2 = Clustering.intVecs(emb.repartition(13))
    val c1 = Clustering.lloyd(v1)
    val c2 = Clustering.lloyd(v2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    val a1 = Clustering.withCellDist(v1, c1)
      .select(col("id"), col("cell")).as[(Long, Int)].collect().sortBy(_._1)
    val a2 = Clustering.withCellDist(v2, c2)
      .select(col("id"), col("cell")).as[(Long, Int)].collect().sortBy(_._1)
    assert(a1.toSeq == a2.toSeq)
  }
}
