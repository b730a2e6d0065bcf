package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR greedy-selection laws (round 7, B88). */
class DiversitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2-D geometry: a ≈ query (but not equal — if the first pick IS the
  // query direction, sim(d, a) == rel(d) and every MMR score collapses
  // to 0), b ≈ a (redundant), c = well-separated (diverse)
  private val corpus = Seq(
    (1L, Seq(0.98, 0.199)), // a: rel ≈ 0.98
    (2L, Seq(0.97, 0.24)),  // b: rel ≈ 0.97 but sim(a,b) ≈ 0.999
    (3L, Seq(0.6, -0.8))    // c: rel 0.6, sim(a,c) ≈ 0.43
  ).toDF("vec_id", "v")

  test("pure relevance picks the redundant pair; MMR diversifies") {
    val q = Seq(1.0, 0.0)
    // λ=1 degenerates to relevance ranking: a then b
    val rel = Diversity.mmrSelect(corpus, q, k = 2, lam = 1.0)
      .select(col("vec_id")).as[Long].collect().toSeq
    assert(rel == Seq(1L, 2L), s"got $rel")
    // λ=0.5 penalizes b's similarity to a: a then c
    val mmr = Diversity.mmrSelect(corpus, q, k = 2, lam = 0.5)
      .select(col("vec_id")).as[Long].collect().toSeq
    assert(mmr == Seq(1L, 3L), s"got $mmr")
  }

  test("k equals pool size returns every item exactly once, steps 1..k") {
    val got = Diversity.mmrSelect(corpus, Seq(0.6, 0.8), k = 3, lam = 0.7)
      .select(col("step"), col("vec_id")).as[(Int, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
    assert(got.map(_._2).toSet == Set(1L, 2L, 3L))
  }

  test("first pick maximizes relevance with vec_id tie-break") {
    // two identical vectors: the lower id must win step 1
    val dup = Seq((7L, Seq(1.0, 0.0)), (4L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    val got = Diversity.mmrSelect(dup, Seq(1.0, 0.0), k = 1, lam = 0.7)
      .select(col("vec_id")).as[Long].head()
    assert(got == 4L)
  }
}
