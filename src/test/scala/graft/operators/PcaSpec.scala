package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** PCA power-iteration laws (round 9, B168). */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embFrame(rows: Seq[Array[Float]]) =
    rows.map(Tuple1(_)).toDF("embedding")

  test("a planted dominant direction is recovered") {
    val rnd = new scala.util.Random(9)
    val dim = 8
    // strong variance along (1,1,0,...)/√2, small isotropic noise elsewhere
    val rows = (1 to 500).map { _ =>
      val a = rnd.nextGaussian() * 10.0
      Array.tabulate(dim)(i =>
        ((if (i < 2) a / math.sqrt(2.0) else 0.0) +
          rnd.nextGaussian() * 0.3).toFloat)
    }
    val v = DimReduce.topEigenvector(embFrame(rows), dim, iterations = 500)
    val target = Array.tabulate(dim)(i => if (i < 2) 1.0 / math.sqrt(2) else 0.0)
    val cos = math.abs((0 until dim).map(i => v(i) * target(i)).sum)
    assert(cos > 0.99, s"cos=$cos v=${v.mkString(",")}")
  }

  test("eigen-gates hold on the declared query frame shape") {
    val rnd = new scala.util.Random(4)
    val rows = (1 to 300).map(_ =>
      Array.fill(16)((rnd.nextGaussian() * 0.2).toFloat))
    val got = DimReduce.pcaTopComponent(embFrame(rows), dim = 16)
      .collect()(0)
    assert(got.getAs[Boolean]("lambda_ge_maxvar"))
    assert(got.getAs[Boolean]("lambda_le_trace"))
    assert(got.getAs[Boolean]("residual_ok"))
    assert(BigInt(got.getAs[String]("trace")) > 0)
  }
}
