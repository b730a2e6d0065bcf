package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 statistical operators: Kendall tau-b. The histogram-domain
  * implementation is checked against a naive O(n²) pair scan on the same
  * data — the definitional form the scale shape must reproduce exactly.
  */
class StatTestsR10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveTauB(xs: Seq[(Long, Long)]): (BigInt, BigInt, Double) = {
    var conc = BigInt(0); var disc = BigInt(0)
    for (i <- xs.indices; j <- xs.indices if i < j) {
      val s = (xs(i)._1 - xs(j)._1).sign * (xs(i)._2 - xs(j)._2).sign
      if (s > 0) conc += 1 else if (s < 0) disc += 1
    }
    val n = BigInt(xs.size)
    def tie(vs: Seq[Long]): BigInt =
      vs.groupBy(identity).values.map(g => BigInt(g.size) * (g.size - 1))
        .sum // already the DOUBLED tie term Σ c(c−1)
    val u = n * n - n - tie(xs.map(_._1))
    val v = n * n - n - tie(xs.map(_._2))
    val tau = 2.0 * (conc - disc).toDouble /
      math.sqrt(u.toDouble * v.toDouble)
    (conc, disc, tau)
  }

  test("kendallTau matches the naive pair scan, ties in both dimensions") {
    val rnd = new scala.util.Random(10)
    val data = (1 to 400).map { _ =>
      val x = rnd.nextInt(12).toLong
      // correlated-with-noise y, heavy ties
      (x, x / 2 + rnd.nextInt(5).toLong)
    }
    val (conc, disc, tau) = naiveTauB(data)
    val got = Profiling.kendallTau(data.toDF("x", "y"), "x", "y").head()
    assert(got.getAs[String]("concordant") == conc.toString)
    assert(got.getAs[String]("discordant") == disc.toString)
    assert(got.getAs[String]("tau_b") ==
      new java.math.BigDecimal(tau).setScale(4,
        java.math.RoundingMode.HALF_UP).toPlainString)
    assert(got.getAs[Long]("n") == 400L)
  }

  test("kendallTau: perfect monotone association gives tau_b = 1") {
    val data = (1L to 50L).map(i => (i, i * 3))
    val got = Profiling.kendallTau(data.toDF("x", "y"), "x", "y").head()
    assert(got.getAs[String]("tau_b") == "1.0000")
    assert(got.getAs[String]("discordant") == "0")
  }
}
