package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-quality evaluation statistics (round 7, B89): exact ROC-AUC of a
  * score column against a binary label, per group — the standard check that
  * a quality-classifier score actually separates the classes before it
  * gates a 100 TB corpus.
  */
object MlEval {

  // ==== q140: exact grouped ROC-AUC via the rank-sum (Mann–Whitney) form ====
  //
  // AUC = (Σ_{positives} avgrank − n₊(n₊+1)/2) / (n₊·n₋), with average
  // ranks for ties — the exact probabilistic AUC, not a trapezoid
  // approximation. Scale shape: one map-side-combined groupBy to the
  // (group, score) histogram, then ALL ranking runs on that histogram —
  // |distinct scores| rows per group, a DOMAIN size — never on raw rows;
  // no global sort, no full-table window (the q122/q131 discipline; the
  // per-group window here orders the tiny histogram only). Exactness: with
  // cnt/pos integers, avgrank = cum + (cnt+1)/2 makes 2·U an INTEGER:
  // 2U = Σ pos·(2·cum + cnt + 1) − n₊(n₊+1), so AUC = 2U / (2·n₊·n₋)
  // divides two integers — bit-identical across engines.

  /** Per-`group` exact AUC of `score` predicting `label` (a boolean SQL
    * expression). Groups missing a class report null AUC, not dropped. */
  def groupedAuc(df: DataFrame, group: String, score: String,
      label: String): DataFrame = {
    val hist = df.groupBy(col(group), col(score).as("s"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(expr(label), 1L).otherwise(0L)).as("pos"))
    val w = Window.partitionBy(col(group)).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist.withColumn("cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
    ranked.groupBy(col(group))
      .agg(sum(col("pos")).as("npos"),
        sum(col("cnt") - col("pos")).as("nneg"),
        sum(col("pos") * (lit(2) * col("cum") + col("cnt") + lit(1)))
          .as("possum2"))
      .select(col(group), col("npos"), col("nneg"),
        when(col("npos") > 0 && col("nneg") > 0,
          (col("possum2") - col("npos") * (col("npos") + 1)).cast("double") /
            (lit(2.0) * (col("npos") * col("nneg")).cast("double")))
          .as("auc"))
  }

  // label: doc is English; score: n_chars (a weak but deterministic
  // predictor — ties abound, which is exactly what exercises the
  // average-rank path)
  private def q140(s: SparkSession, dir: String): DataFrame =
    groupedAuc(Tables.documents(s, dir), "source", "n_chars", "lang = 'en'")
      .select(col("source"), col("npos"), col("nneg"),
        QueryDef.dec4(col("auc")).as("auc"))
      .orderBy(col("source"))

  private val q140Sql =
    """WITH hist AS (
      |  SELECT source, n_chars AS s, count(*) AS cnt,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
      |  FROM documents GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY s
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM hist),
      |agg AS (
      |  SELECT source, CAST(sum(pos) AS BIGINT) AS npos,
      |    CAST(sum(cnt - pos) AS BIGINT) AS nneg,
      |    CAST(sum(pos * (2 * cum + cnt + 1)) AS BIGINT) AS possum2
      |  FROM ranked GROUP BY 1)
      |SELECT source, npos, nneg,
      |  CAST(CAST(CASE WHEN npos > 0 AND nneg > 0 THEN
      |    CAST(possum2 - npos * (npos + 1) AS DOUBLE) /
      |      (CAST(2 AS DOUBLE) * CAST(npos * nneg AS DOUBLE))
      |    ELSE NULL END AS DECIMAL(38,4)) AS VARCHAR) AS auc
      |FROM agg ORDER BY source""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q140_grouped_auc", q140, Some(q140Sql)))
}
