package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B302 Huber IRLS laws: on clean linear data the M-estimator IS OLS
  * (nothing gets down-weighted), a planted outlier that drags OLS barely
  * moves Huber, and degenerate groups report nulls. */
class RobustTrendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    Profiling.huberTrend(rows.toDF("g", "x", "y"), "g", "x", "y")
      .select(col("g"), col("n"), col("slope_h").cast("double"),
        col("intercept_h").cast("double"), col("wsum"))
      .as[(String, Long, Option[Double], Option[Double], Option[Long])]
      .collect().map(r => r._1 -> r).toMap

  test("clean linear data: huber equals OLS exactly, full weight") {
    val rows = (1L to 30L).map(i => ("a", i, 2 * i + 5))
    val got = run(rows)("a")
    assert(got._3.contains(2.0) && got._4.contains(5.0), got.toString)
    assert(got._5.contains(30L * 1000000L), s"down-weighted clean data: $got")
  }

  test("planted outlier drags OLS but not huber") {
    val clean = (1L to 30L).map(i => ("a", i, 2 * i))
    val rows = clean :+ (("a", 31L, 1000L))
    val ols = Profiling.groupedOls(rows.toDF("g", "x", "y"), "g", "x", "y")
      .select(col("slope")).head().getDouble(0)
    val hub = run(rows)("a")._3.get
    assert(math.abs(ols - 2.0) > 1.0, s"outlier failed to drag OLS: $ols")
    assert(math.abs(hub - 2.0) < 0.5, s"huber still dragged: $hub")
    assert(math.abs(hub - 2.0) < math.abs(ols - 2.0))
    // the outlier's weight collapsed
    assert(run(rows)("a")._5.get < 31L * 1000000L)
  }

  test("zero x-variance reports nulls") {
    val got = run((1L to 10L).map(i => ("a", 7L, i)))("a")
    assert(got._3.isEmpty && got._4.isEmpty && got._5.isEmpty, got.toString)
  }
}
