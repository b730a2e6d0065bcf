package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 contract-guard sweep (the q268 `maxBlock` precedent): the
  * operators whose declared slices bound quadratic-or-worse work must
  * ENFORCE the bound, not document it — each guard raises on a planted
  * hot block / oversized slice with the corpus-scale fix named in the
  * error, and stays silent on compliant input.
  */
class ContractGuardR13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resolveEntities raises on a hot PassJoin segment block") {
    // 64 ids share ONE normalized key: every segment bucket of that key
    // holds all 64 — quadratic candidates inside one block
    val hot = (0L until 64L).map(i => (i, "aaaaaaaabbbbbbbbcc"))
      .toDF("id", "key")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.resolveEntities(hot, maxDist = 2, maxBlock = 16L).collect()
    }
    assert(e.getMessage.contains("maxBlock") &&
      e.getMessage.contains("maxBucket"), e.getMessage)
    // compliant input resolves: two planted 2-edit aliases cluster
    val ok = Seq((1L, "alpha centauri one"), (2L, "alpha centauri onX"),
      (3L, "betelgeuse number two"), (4L, "wholly unrelated key"))
      .toDF("id", "key")
    val census = FuzzyJoin.resolveEntities(ok, maxDist = 2, maxBlock = 16L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(census(2L) == 1L && census(1L) == 2L, census.toString)
  }

  test("dbscan raises on an oversized brute slice") {
    val vecs = (0L until 40L).map(i => (i, Array(1.0, i.toDouble)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Similarity.dbscan(vecs, eps = 0.9, minPts = 3, maxSlice = 16L)
    }
    assert(e.getMessage.contains("maxSlice") &&
      e.getMessage.contains("candidate pairs"), e.getMessage)
    // compliant slice still clusters
    assert(Similarity.dbscan(vecs, eps = 0.9, minPts = 3, maxSlice = 64L)
      .count() == 40L)
  }

  test("lofOutliers raises on an oversized exact-kNN slice") {
    val emb = (0L until 40L).map(i =>
      (i, Array(0.01f * i, 0.001f * i * i, 0.3f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.lofOutliers(emb, k = 3, topN = 5, maxSlice = 16L)
    }
    assert(e.getMessage.contains("maxSlice") &&
      e.getMessage.contains("k nearest"), e.getMessage)
    assert(Similarity.lofOutliers(emb, k = 3, topN = 5, maxSlice = 64L)
      .count() == 5L)
  }

  test("frequentTriples raises on a fat basket") {
    val fat = (0L until 30L).map(i => (1L, i)) // one 30-item basket
      .toDF("bid", "item")
    val e = intercept[IllegalArgumentException] {
      EventsOps.frequentTriples(fat, k = 5, maxBasket = 10L)
    }
    assert(e.getMessage.contains("maxBasket") &&
      e.getMessage.contains("a-priori"), e.getMessage)
    // compliant baskets still enumerate: 2 baskets sharing {1,2,3}
    val ok = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (2L, 3L), (2L, 4L)).toDF("bid", "item")
    val top = EventsOps.frequentTriples(ok, k = 1, maxBasket = 10L)
      .select("p1", "p2", "p3", "n_orders").head()
    assert((top.getLong(0), top.getLong(1), top.getLong(2),
      top.getLong(3)) == ((1L, 2L, 3L, 2L)))
  }
}
