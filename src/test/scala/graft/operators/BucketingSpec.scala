package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located join strategy claimed in the scale design
  * (SURVEY.md "bucketing for co-located joins"): two tables bucketed and
  * sorted on the join key join WITHOUT any Exchange in the plan — at 100 TB
  * that's the difference between a full reshuffle of both sides and a
  * zip of pre-aligned files. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("joining two tables bucketed on the key runs with zero shuffles") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    graft.Tables.orders(spark, dir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bkt")
    graft.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_bkt")

    // force a non-broadcast join so the bucket layout is what matters
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (joined, plan) = try {
      val j = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      j.collect()
      (j, j.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // the join itself must not reshuffle either side (only the final
    // aggregation exchanges its tiny partials)
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join reshuffled:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)

    // and it returns the same result as the plain join
    val plain = graft.Tables.orders(spark, dir)
      .join(graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(_.toString).sorted
    assert(joined.collect().map(_.toString).sorted.sameElements(plain))
  }
}
