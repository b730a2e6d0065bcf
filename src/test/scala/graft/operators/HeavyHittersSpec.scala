package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries laws: exactness when capacity dominates distinct counts,
  * the n/(k+1) error bound and guaranteed-presence law at small capacity,
  * and the mergeable-summaries bound across arbitrary splits. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Skewed stream: item i appears ~1000/(i+1) times, shuffled seed-7. */
  private lazy val stream: Seq[String] = {
    val rnd = new scala.util.Random(7)
    rnd.shuffle((0 until 50).flatMap(i =>
      Seq.fill(1000 / (i + 1))(s"tok$i")).toVector)
  }
  private lazy val exact: Map[String, Long] =
    stream.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }

  test("exact regime: capacity >= distinct per partition => summary == exact counts") {
    val df = stream.toDF("t").repartition(4)
    val got = HeavyHitters.summarize(df, "t", k = 64)
    assert(got == exact)
  }

  test("error law at small capacity: underestimates only, by at most n/(k+1); big items present") {
    val k = 12
    val n = stream.length.toLong
    val got = HeavyHitters.mgOfPartition(stream.iterator, k)
    val bound = n / (k + 1)
    got.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overestimated: $est > ${exact(t)}")
      assert(est >= exact(t) - bound, s"$t under bound: $est vs ${exact(t)} - $bound")
    }
    exact.filter(_._2 > bound).keys.foreach(t =>
      assert(got.contains(t), s"guaranteed heavy item $t missing"))
  }

  test("mergeable: bound holds for any split, and the distributed pass obeys it") {
    val k = 12
    val n = stream.length.toLong
    val bound = n / (k + 1)
    Seq(100, 500, 2000).foreach { cut =>
      val merged = HeavyHitters.mergeMg(
        HeavyHitters.mgOfPartition(stream.take(cut).iterator, k),
        HeavyHitters.mgOfPartition(stream.drop(cut).iterator, k), k)
      assert(merged.size <= k)
      merged.foreach { case (t, est) =>
        assert(est <= exact(t) && est >= exact(t) - bound,
          s"split $cut: $t est $est vs true ${exact(t)} (bound $bound)")
      }
    }
    val dist = HeavyHitters.summarize(stream.toDF("t").repartition(8), "t", k)
    dist.foreach { case (t, est) =>
      assert(est <= exact(t) && est >= exact(t) - bound)
    }
  }
}
