package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct stays within the declared ±5% of exact (B11)") {
    // the bounded-error predicate is embedded in the query itself (and
    // driver-gated through the hash oracle); here we assert it holds
    val rows = SparkEntry.queries("hll_count_distinct")(spark, dir)
      .select("ok_orders", "ok_parts").as[(Boolean, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._1 && r._2),
      s"HLL estimate outside ±5%: ${rows.mkString(",")}")
  }

  test("approx_percentile tracks the exact percentile within tolerance (B11 family)") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, dir)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("exact"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"))
      .select("exact", "approx").as[(Double, Double)].collect()
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact) / exact <= 0.02,
        s"approx median $approx vs exact $exact")
    }
  }

  test("every declared query runs and respects its declared column set") {
    // smoke over the full registry: no query may throw at plan or execute
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.limit(1).collect() // forces analysis + one task
    }
  }

  test("oracle keys are a subset of query keys and non-empty") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o -- q}")
    assert(o.size >= 38)
  }
}
