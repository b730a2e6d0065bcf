package graft.operators

import graft.TestSpark
import graft.functions.KmvExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV distinct-sketch laws (round 9, B156). */
class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketch(ids: Seq[Long], k: Int): Array[Long] =
    ids.map(i => ("g", i)).toDF("seg", "id")
      .groupBy(col("seg"))
      .agg(KmvExprs.kmvAgg(xxhash64(col("id")), k).as("kmv"))
      .select(col("kmv")).as[Array[Long]].head()

  test("exact regime: the sketch IS the distinct hash set, sorted") {
    val ids = (1L to 500L) ++ (1L to 500L) // duplicates collapse
    val sk = sketch(ids, k = 1024)
    assert(sk.length == 500)
    assert(sk.sorted.sameElements(sk)) // signed ascending == unsigned order
  }

  test("estimator regime: relative error within 5/sqrt(k)") {
    val n = 20000L
    for (k <- Seq(128, 512)) {
      val sk = sketch(1L to n, k)
      assert(sk.length == k)
      val frac = (sk.last.toDouble + 9.223372036854776e18 + 1) / 1.8446744073709552e19
      val est = (k - 1).toDouble / frac
      assert(math.abs(est / n - 1.0) < 5.0 / math.sqrt(k),
        s"k=$k est=$est")
    }
  }

  test("sketch is partitioning- and order-invariant (bit-equal)") {
    val ids = scala.util.Random.shuffle((1L to 5000L).toList)
    val a = ids.map(i => ("g", i)).toDF("seg", "id").repartition(13)
      .groupBy(col("seg"))
      .agg(KmvExprs.kmvAgg(xxhash64(col("id")), 256).as("kmv"))
      .select(col("kmv")).as[Array[Long]].head()
    val b = sketch(1L to 5000L, 256)
    assert(a.sameElements(b))
  }

  test("merge law: k smallest of combined sketches == sketch of the union") {
    val whole = sketch(1L to 3000L, 128)
    val parts = Seq(1L to 1500L, 1501L to 3000L).map(r => sketch(r, 128))
    val merged = parts.flatten.distinct.sorted.take(128).toArray
    assert(merged.sameElements(whole))
  }

  test("kmvOverlap exact regime matches exact set arithmetic") {
    val rows =
      (1L to 300L).map(i => ("a", i)) ++ (201L to 500L).map(i => ("b", i))
    val got = SketchOps.kmvOverlap(rows.toDF("t", "u"), "t", "u", k = 4096)
      .select(col("n_a"), col("n_b"), col("n_union"), col("n_inter"),
        col("n_a_only"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((300L, 300L, 500L, 100L, 200L)))
  }

  test("kmvOverlap estimator regime: planted 50% overlap recovered") {
    val rows =
      (1L to 8000L).map(i => ("a", i)) ++ (4001L to 12000L).map(i => ("b", i))
    val got = SketchOps.kmvOverlap(rows.toDF("t", "u"), "t", "u", k = 512)
      .select(col("n_union"), col("n_inter"))
      .as[(Long, Long)].head()
    assert(math.abs(got._1 / 12000.0 - 1.0) < 0.25, s"union=${got._1}")
    assert(math.abs(got._2 / 4000.0 - 1.0) < 0.35, s"inter=${got._2}")
  }
}
