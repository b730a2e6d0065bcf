package graft.plans

import graft.TestSpark
import graft.operators.Bitmaps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bitmap count-distinct rewrite: registered distinct-count rollups
  * are answered from the maintained block-bitmap parquet (plan-asserted),
  * exact at fine AND coarser groupings, and anything outside the
  * contract is untouched. */
class BitmapRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshBase(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("bm_base").toString
    val state = java.nio.file.Files.createTempDirectory("bm_state").toString + "/s"
    val rnd = new scala.util.Random(7)
    // ids straddle blocks; (seg, day) fine grain with shared ids across groups
    (0 until 5000).map { _ =>
      (s"s${rnd.nextInt(3)}", s"d${rnd.nextInt(4)}",
        rnd.nextInt(150000).toLong)
    }.toDF("seg", "day", "uid").write.mode("overwrite").parquet(base)
    Bitmaps.blockBitmaps(spark.read.parquet(base), Seq("seg", "day"), col("uid"))
      .write.mode("overwrite").parquet(state)
    (base, state)
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("registered count-distinct reads bitmap state at fine and coarse grain") {
    val (base, state) = freshBase()
    try {
      val fine = () => spark.read.parquet(base)
        .groupBy(col("seg"), col("day"))
        .agg(countDistinct(col("uid")).as("n"))
        .orderBy(col("seg"), col("day"))
      val coarse = () => spark.read.parquet(base).groupBy(col("seg"))
        .agg(countDistinct(col("uid")).as("n")).orderBy(col("seg"))
      val total = () => spark.read.parquet(base)
        .agg(countDistinct(col("uid")).as("n"))
      val truths = Seq(fine, coarse, total).map(q => q().collect().map(_.toSeq).toSeq)
      BitmapStateRegistry.register(base, state, Seq("seg", "day"), "uid")
      Seq(fine, coarse, total).zip(truths).foreach { case (q, truth) =>
        val plan = planOf(q())
        assert(plan.contains(state) && !plan.contains(base),
          s"must scan only bitmap state:\n$plan")
        assert(q().collect().map(_.toSeq).toSeq == truth)
      }
    } finally BitmapStateRegistry.clear()
  }

  test("out-of-contract queries are never rewritten") {
    val (base, state) = freshBase()
    try {
      BitmapStateRegistry.register(base, state, Seq("seg", "day"), "uid")
      val outOfContract = Seq(
        // distinct over a non-registered column
        spark.read.parquet(base).groupBy(col("seg"))
          .agg(countDistinct(col("day"))),
        // plain count — belongs to the B112 rule, not this one
        spark.read.parquet(base).groupBy(col("seg")).agg(count(lit(1))),
        // non-key grouping
        spark.read.parquet(base).groupBy(col("uid"))
          .agg(countDistinct(col("uid"))),
        // a filter between scan and aggregate blocks the rewrite
        spark.read.parquet(base).where(col("day") === "d1")
          .groupBy(col("seg")).agg(countDistinct(col("uid"))))
      outOfContract.foreach { q =>
        assert(planOf(q).contains(base), s"must keep the base scan:\n${planOf(q)}")
      }
      // mixed distinct + plain sum: also untouched (partial coverage would
      // double-scan)
      val mixed = spark.read.parquet(base).groupBy(col("seg"))
        .agg(countDistinct(col("uid")), count(lit(1)))
      assert(planOf(mixed).contains(base))
    } finally BitmapStateRegistry.clear()
  }

  test("q267 registered dashboard: rewrite fires and matches the direct plan") {
    // the bench-visible query (q267_bitmap_dashboard) must provably serve
    // from the maintained bitmap state — scan the state parquet, not the
    // base — and agree with the un-rewritten computation over raw events
    val dir = "/root/testdata/sf0.001"
    val q = Bitmaps.registeredDashboard(spark, dir)
    try {
      val plan = planOf(q)
      assert(plan.contains("graft_bmreg_") && plan.contains("/state"),
        s"must scan the bitmap state:\n$plan")
      assert(!plan.contains("/base"), s"must not scan the base table:\n$plan")
      val truth = graft.Tables.events(spark, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type")).collect().map(_.toSeq).toSeq
      assert(q.orderBy(col("event_type")).collect().map(_.toSeq).toSeq
        == truth)
    } finally BitmapStateRegistry.clear()
  }

  test("global count-distinct over an EMPTY registered table is 0, not NULL") {
    val base = java.nio.file.Files.createTempDirectory("bm_base").toString
    val state = java.nio.file.Files.createTempDirectory("bm_state").toString + "/s"
    Seq.empty[(String, String, Long)].toDF("seg", "day", "uid")
      .write.mode("overwrite").parquet(base)
    Bitmaps.blockBitmaps(spark.read.parquet(base), Seq("seg", "day"), col("uid"))
      .write.mode("overwrite").parquet(state)
    try {
      BitmapStateRegistry.register(base, state, Seq("seg", "day"), "uid")
      val q = spark.read.parquet(base).agg(countDistinct(col("uid")).as("n"))
      assert(planOf(q).contains(state), "rewrite must still fire on empty state")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(0L),
        "must match vanilla count(DISTINCT) = 0 on an empty table")
    } finally BitmapStateRegistry.clear()
  }
}
