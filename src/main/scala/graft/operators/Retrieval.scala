package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword retrieval over the documents corpus — the search primitive a
  * curation pipeline uses for targeted audits ("show me the docs about X"),
  * keyword-based decontamination, and seed selection for classifier
  * training (reference scope: the engine's query surface over ingested
  * records, extended per SURVEY.md §2 Tier B to training-data operators).
  *
  * Scale design (100 TB): the query is TINY (a handful of terms) and the
  * corpus is huge, so nothing may shuffle the corpus. Per-term document
  * frequencies, corpus size and average document length reduce to ONE
  * single-row aggregate (map-side partials, a scalar result); that row is
  * broadcast back via crossJoin, and each document computes its own score
  * in a single projection over one corpus scan. The only movement of
  * corpus-sized data is the final TakeOrderedAndProject top-k, which ships
  * k rows per partition to the driver — no explode, no (doc, term) shuffle
  * (contrast q54's generic TF-IDF, which must shuffle because its term set
  * is the whole vocabulary).
  *
  * Determinism discipline: ranking happens on the 4-dp-rounded score (so
  * cross-engine 1-ulp `ln` differences cannot reorder) with doc_id as the
  * tie-break, same as q37's cosine ranking.
  */
object Retrieval {

  private def toks = Tok.ws(col("text"))

  /** Okapi BM25 with Lucene's +1 idf smoothing (always positive):
    *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   s(t, D) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    * k1 = 1.2, b = 0.75 (the standard defaults).
    */
  val K1 = 1.2
  val B = 0.75

  /** Per-document BM25 scores for a fixed term set, as one projection over
    * a corpus scan. `docs` needs (doc_id, text). Returns
    * (doc_id, dl, tf_<term>..., score) unranked — callers rank/limit.
    */
  def bm25Scores(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val withTf = docs.select(
      col("doc_id") +: size(toks).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).as(s"tf$i")
        }: _*)
    // ONE scalar row: corpus size, average doc length, df per term.
    // avgdl as integer-sum / integer-count (NOT avg()) so both engines
    // divide the same exact integers — no accumulator-order dependence.
    val statCols = count(lit(1)).as("n_docs") +:
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      idf * tf * lit(K1 + 1.0) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats)).withColumn("score", score)
  }

  /** Top-k retrieval: rank on the rounded score, doc_id tie-break. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame =
    bm25Scores(docs, terms)
      .orderBy(round(col("score"), 4).desc, col("doc_id"))
      .limit(k)

  // ==== q103: BM25 top-20 for a fixed 3-term query ==========================

  private val QTerms = Seq("hash", "vector", "stream")

  private def q103(s: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.documents(s, dir).select(col("doc_id"), col("text")),
        QTerms, 20)
      .select(col("doc_id"), col("dl"),
        col("tf0"), col("tf1"), col("tf2"),
        QueryDef.dec4(col("score")).as("score"))

  // DuckDB twin: identical math, identical rank discipline. avgdl is exact
  // on both sides (integer sum / integer count), so the ln argument is the
  // same rational number in both engines.
  private val q103Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl,
      |    len(list_filter(string_split(text, ' '), x -> x = 'hash')) AS tf0,
      |    len(list_filter(string_split(text, ' '), x -> x = 'vector')) AS tf1,
      |    len(list_filter(string_split(text, ' '), x -> x = 'stream')) AS tf2
      |  FROM documents),
      |stats AS (
      |  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
      |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
      |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
      |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
      |  FROM d),
      |scored AS (
      |  SELECT doc_id, dl, tf0, tf1, tf2,
      |    ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2
      |      / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |    + ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2
      |      / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |    + ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2
      |      / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS score
      |  FROM d CROSS JOIN stats)
      |SELECT doc_id, dl, tf0, tf1, tf2,
      |  CAST(CAST(score AS DECIMAL(38,4)) AS VARCHAR) AS score
      |FROM scored
      |ORDER BY round(score, 4) DESC, doc_id
      |LIMIT 20""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q103_bm25_topk", q103, Some(q103Sql)))
}
