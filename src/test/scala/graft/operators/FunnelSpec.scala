package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel ordering laws: a stage counts only strictly after the previous
  * stage's first completion. */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private def run(events: Seq[(Long, Long, Timestamp, String)]) =
    EventsOps.funnel(
        events.toDF("user_id", "event_id", "ts", "event_type"),
        Seq("view", "click", "purchase"))
      .select(col("user_id"), col("reached_view"), col("reached_click"),
        col("reached_purchase"))
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> (r._2, r._3, r._4))
      .toMap

  test("full funnel in order counts every stage") {
    val got = run(Seq((1L, 1L, ts(0), "view"), (1L, 2L, ts(1), "click"),
      (1L, 3L, ts(2), "purchase")))
    assert(got(1L) == ((1, 1, 1)))
  }

  test("a click BEFORE the first view does not count; a later one does") {
    val early = run(Seq((1L, 1L, ts(0), "click"), (1L, 2L, ts(1), "view")))
    assert(early(1L) == ((1, 0, 0)), "click preceded every view")
    val late = run(Seq((1L, 1L, ts(0), "click"), (1L, 2L, ts(1), "view"),
      (1L, 3L, ts(2), "click")))
    assert(late(1L) == ((1, 1, 0)))
  }

  test("purchase without a qualifying click never counts") {
    val got = run(Seq((1L, 1L, ts(0), "view"), (1L, 2L, ts(1), "purchase")))
    assert(got(1L) == ((1, 0, 0)))
    // and a purchase before the qualifying click doesn't either
    val got2 = run(Seq((1L, 1L, ts(0), "view"), (1L, 2L, ts(1), "purchase"),
      (1L, 3L, ts(2), "click"), (1L, 4L, ts(3), "purchase")))
    assert(got2(1L) == ((1, 1, 1)))
  }

  test("plan: one shuffle by user_id — the rollup reuses the window partitioning") {
    val events = (0L until 200L).map(i =>
      (i % 20, i, ts(i.toInt), Seq("view", "click", "purchase")(i.toInt % 3)))
      .toDF("user_id", "event_id", "ts", "event_type")
    val plan = EventsOps.funnel(events, Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one hash exchange:\n$plan")
  }

  test("users are independent; unrelated event types are ignored") {
    val got = run(Seq(
      (1L, 1L, ts(0), "view"), (1L, 2L, ts(1), "error"),
      (2L, 3L, ts(0), "click"), (2L, 4L, ts(1), "purchase")))
    assert(got(1L) == ((1, 0, 0)))
    assert(got(2L) == ((0, 0, 0)))
  }

  test("cohortRetention: offsets from first-seen day, distinct within day") {
    // midnight-aligned UTC base (2024-01-01T00:00Z) so +hours stays in-day
    def day(d: Int, h: Int = 0) =
      new Timestamp(1704067200000L + d * 86400000L + h * 3600000L)
    val events = Seq(
      (1L, 1L, day(0), "view"), (1L, 2L, day(0, 5), "click"), // same day twice
      (1L, 3L, day(2), "view"),                               // back at offset 2
      (2L, 4L, day(2), "view"), (2L, 5L, day(3), "view"))     // cohort day 2
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventsOps.cohortRetention(events)
      .select(col("cohort_day").cast("string"), col("day_offset"), col("n_users"))
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val d0 = "2024-01-01"
    val d2 = "2024-01-03"
    assert(got == Map(
      (d0, 0) -> 1L,  // user 1's two same-day events count once
      (d0, 2) -> 1L,  // user 1 returns
      (d2, 0) -> 1L,  // user 2's cohort starts on its own first day
      (d2, 1) -> 1L))
  }
}
