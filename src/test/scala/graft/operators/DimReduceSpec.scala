package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JL random-projection laws (round 7, B84). */
class DimReduceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("sign matrix is deterministic, balanced, and engine-independent") {
    val signs = for (i <- 1 to 64; j <- 1 to 16) yield DimReduce.sign(i, j)
    assert(signs.forall(s => s == 1 || s == -1))
    // md5 nibbles are uniform: a grossly unbalanced matrix means the
    // derivation broke (exact value pinned so any change is loud)
    val plus = signs.count(_ == 1)
    assert(plus > 400 && plus < 624, s"suspicious sign balance: $plus/1024")
    assert(DimReduce.sign(1, 1) == DimReduce.sign(1, 1))
  }

  test("projection preserves norms in expectation (E||Rx/sqrt(d')||^2 = ||x||^2)") {
    import graft.functions.VectorExprs.dotProduct
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val proj = DimReduce.randomProject(emb)
    val pv = array((1 to 16).map(j => col(f"p$j%02d")): _*)
    val ratios = proj
      .join(emb, "vec_id")
      .select((dotProduct(pv, pv) /
        dotProduct(Similarity.toDouble(col("embedding")),
          Similarity.toDouble(col("embedding")))).as("r"))
      .as[Double].collect()
    val mean = ratios.sum / ratios.length
    // per-vector variance is 2/d' ≈ 0.35 stdev, but the MEAN over the corpus
    // concentrates tightly
    assert(mean > 0.85 && mean < 1.15, s"norm ratio mean off: $mean")
    assert(ratios.forall(_ > 0.05), "a vector collapsed to near-zero")
  }

  test("projection is linear and partition-invariant") {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).limit(50)
    val once = DimReduce.randomProject(emb).orderBy("vec_id").collect()
    val repart = DimReduce.randomProject(emb.repartition(7))
      .orderBy("vec_id").collect()
    assert(once.sameElements(repart), "repartitioning changed the projection")
    // doubling the input doubles the output exactly (±1 matrix, exact scale)
    val doubled = DimReduce.randomProject(
      emb.select(col("vec_id"),
        transform(col("embedding"), x => x * 2.0f).as("embedding")))
      .orderBy("vec_id").select(col("p01")).as[Double].collect()
    val base = DimReduce.randomProject(emb)
      .orderBy("vec_id").select(col("p01")).as[Double].collect()
    assert(doubled.zip(base).forall { case (d, b) => d == 2.0 * b })
  }
}
