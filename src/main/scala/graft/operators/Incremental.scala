package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keeping corpus statistics current
  * under a stream of arriving batches WITHOUT rescanning the corpus (the
  * materialized-view delta-refresh pattern; pairs with [[Cdc]] for row
  * deltas and with the ingestion pipeline's chunked arrival).
  *
  * The state is a keyed table of MERGEABLE partials (count / sum / min /
  * max — every derived metric, e.g. avg, is computed at read time from
  * them). Refresh cost is then: partial-aggregate the NEW batch (tiny) +
  * one combine shuffle keyed by group over state ∪ delta-partials — the
  * 100 TB corpus itself is never touched again. The algebra is the same
  * map-side-combine Spark applies inside one aggregation, lifted across
  * batches; `merge(agg(A), agg(B)) == agg(A ∪ B)` is the spec'd law.
  */
object Incremental {

  private val Keys = Seq("lang", "source")

  /** Mergeable per-(lang, source) statistics state for a document batch. */
  def aggState(docs: DataFrame): DataFrame =
    docs.groupBy(Keys.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Combine two states (prior state ∪ a new batch's partials). */
  def mergeState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(Keys.map(col): _*)
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_chars")).as("sum_chars"),
        min(col("min_chars")).as("min_chars"),
        max(col("max_chars")).as("max_chars"))

  // ==== q108: two-batch incremental refresh == full recompute ===============
  //
  // The corpus arrives as two halves (doc_id parity — both halves hit every
  // group); the maintained state after merging the second half's partials
  // must equal — and the oracle recomputes — the from-scratch aggregate.
  // avg is derived from the partials at read time, never stored.

  private def q108(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val state0 = aggState(docs.filter(col("doc_id") % 2 === 0))
    val merged = mergeState(state0, aggState(docs.filter(col("doc_id") % 2 === 1)))
    merged.select(col("lang"), col("source"), col("n_docs"),
        col("sum_chars"), col("min_chars"), col("max_chars"),
        QueryDef.dec4(col("sum_chars").cast("double") / col("n_docs"))
          .as("avg_chars"))
      .orderBy(col("lang"), col("source"))
  }

  private val q108Sql =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, min(n_chars) AS min_chars,
      |  max(n_chars) AS max_chars,
      |  CAST(CAST(CAST(sum(n_chars) AS DOUBLE) / count(*) AS DECIMAL(38,4)) AS VARCHAR)
      |    AS avg_chars
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q108_incremental_agg", q108, Some(q108Sql)))
}
