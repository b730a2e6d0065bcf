package graft.plans

import graft.TestSpark
import graft.operators.Incremental
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized-aggregate rewrite: registered base-table rollups are
  * answered from the maintained state parquet (plan-asserted), results
  * are identical to the direct scan, and anything outside the contract —
  * unregistered paths, unsupported aggregates, non-key groupings — is
  * left untouched. */
class MaterializedRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshBase(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("mv_base").toString
    val state = java.nio.file.Files.createTempDirectory("mv_state").toString + "/s"
    (0L until 300L).map(i => (i, s"l${i % 3}", s"s${i % 4}", 10L + (i * 13) % 77))
      .toDF("doc_id", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(base)
    Incremental.aggState(spark.read.parquet(base))
      .write.mode("overwrite").parquet(state)
    (base, state)
  }

  private def scannedPaths(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("registered rollup reads the state table, not the corpus, with identical results") {
    val (base, state) = freshBase()
    try {
      val q = () => spark.read.parquet(base)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang"), col("source"))
      val direct = q().collect().map(_.toSeq).toSeq // registry empty: direct scan
      assert(scannedPaths(q()).contains(base))
      MaterializedAggRegistry.register(base, state, Seq("lang", "source"), "n_chars")
      val plan = scannedPaths(q())
      assert(plan.contains(state) && !plan.contains(base),
        s"rewritten plan must scan only the state table:\n$plan")
      assert(q().collect().map(_.toSeq).toSeq == direct)
      // coarser grouping re-aggregates the partials
      val coarse = () => spark.read.parquet(base).groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("s"), max(col("n_chars")).as("m"))
        .orderBy(col("lang"))
      val gotCoarse = coarse().collect().map(_.toSeq).toSeq
      MaterializedAggRegistry.clear()
      assert(coarse().collect().map(_.toSeq).toSeq == gotCoarse)
    } finally MaterializedAggRegistry.clear()
  }

  test("out-of-contract queries are never rewritten") {
    val (base, state) = freshBase()
    try {
      MaterializedAggRegistry.register(base, state, Seq("lang", "source"), "n_chars")
      // avg is not a mapped aggregate; doc_id is not a key; a filter blocks
      Seq(
        spark.read.parquet(base).groupBy(col("lang"))
          .agg(avg(col("n_chars")).as("a")),
        spark.read.parquet(base).groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n")),
        spark.read.parquet(base).filter(col("n_chars") > 40)
          .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      ).foreach { df =>
        val plan = scannedPaths(df)
        assert(plan.contains(base) && !plan.contains(state),
          s"must NOT rewrite:\n$plan")
      }
      // and the supported shape still computes correctly THROUGH the state
      val viaState = spark.read.parquet(base).groupBy(col("lang"))
        .agg(count(lit(1)).as("n")).orderBy(col("lang"))
        .as[(String, Long)].collect().toSeq
      MaterializedAggRegistry.clear()
      val direct = spark.read.parquet(base).groupBy(col("lang"))
        .agg(count(lit(1)).as("n")).orderBy(col("lang"))
        .as[(String, Long)].collect().toSeq
      assert(viaState == direct)
    } finally MaterializedAggRegistry.clear()
  }
}
