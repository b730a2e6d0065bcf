package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 scale-shape pins: the new rank/AUC machinery must run on the
  * distributed prefix-sum scan (zero global single-partition windows),
  * langid's gram hashing must be domain-bounded behind a broadcast, and
  * the recsys top-k window must be item-partitioned. */
class ScaleShapeR14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("wilcoxon plan: no Window nodes — prefix counts are distributed") {
    val plan = executedPlan(
      Profiling.wilcoxonSignedRank((1L to 100L).map(i =>
        if (i % 3 == 0) -i else i).toDF("d")))
    assert(!plan.contains("Window"), s"Window in wilcoxon plan:\n$plan")
  }

  test("delong plan: no Window nodes — histogram cums are distributed") {
    val items = (0L until 200L).map { i =>
      (if (i % 3 == 0) 1L else 0L, i % 17, i % 23)
    }.toDF("y", "s1", "s2")
    val plan = executedPlan(MlEval.delongCompare(items))
    assert(!plan.contains("Window"), s"Window in delong plan:\n$plan")
  }

  test("langid features: gram domain broadcasts; scan is repartitioned") {
    val docs = (0L until 50L).map(i => (i, "abcdefg" * 10))
      .toDF("doc_id", "text")
    val plan = executedPlan(LangId.charGramFeatures(docs))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastHashJoin"),
      s"gram-domain table not broadcast:\n$plan")
    // round 15: the pre-explode spread key is a salted doc hash and the
    // (doc_id, g) aggregation exchange must sit ABOVE the explode so
    // every consumer shares one explode (see gramCounts scaladoc)
    val kernel = executedPlan(LangId.gramCounts(docs))
    assert(kernel.contains("Exchange hashpartitioning(pmod(xxhash64(doc_id"),
      s"no pre-explode spread repartition:\n$kernel")
    assert(kernel.contains("Exchange hashpartitioning(doc_id"),
      s"no post-explode (doc_id, g) exchange:\n$kernel")
  }

  test("item-cooccurrence plan: the only window is item-partitioned") {
    val li = (0L until 300L).map(i => (i % 60, i % 7))
      .toDF("l_orderkey", "l_partkey")
    val plan = executedPlan(Retrieval.itemCooccurrence(li, 3))
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, s"expected a top-k window:\n$plan")
    windows.foreach(l => assert(l.contains("item"),
      s"window not item-partitioned: $l"))
  }

  test("holt-winters plan: every window is series-partitioned") {
    val ev = (0L until 600L).map { i =>
      (i, new java.sql.Timestamp(1700000000000L + (i / 4) * 3600000L),
        i, if (i % 2 == 0) "a" else "b")
    }.toDF("user_id", "ts", "event_id", "event_type")
    val df = EventsOps.holtWintersHourly(ev)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    windows.foreach(l => assert(l.contains("event_type"),
      s"window not series-partitioned: $l"))
  }
}
