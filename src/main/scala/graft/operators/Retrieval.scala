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

  // ==== q170: hybrid retrieval — reciprocal-rank fusion (RRF) ===============
  //
  // The production hybrid-search combiner (keyword BM25 + embedding
  // cosine): RRF(d) = Σ_lists 1/(K + rank_d), K = 60 — rank-based, so the
  // two engines' incomparable score scales never mix. Both input rankings
  // are the engine's own oracled primitives (q103's scan-and-broadcast
  // BM25, q37's broadcast brute cosine); the fusion itself is a join of
  // two k-row lists — driver-trivial, kept distributed. Exactness: each
  // reciprocal is integerized as 1000000 div (K + rank) BEFORE summing —
  // the sum of integer micro-credits is engine-exact, where a float
  // 1/(60+r) sum would be summation-order-dependent.

  /** Top-`kOut` docs by RRF over the BM25-top-`kPer` for `terms` and the
    * cosine-top-`kPer` around query embedding `qid`. Ranks are NULL for a
    * doc present in only one list (it scores only that list's credit). */
  def rrfFusion(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      qid: Long, kPer: Int, kOut: Int, rrfK: Int = 60): DataFrame = {
    val kw = bm25TopK(docs, terms, kPer)
      .select(col("doc_id"), row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(round(col("score"), 4).desc, col("doc_id")))
        .cast("long").as("rank_kw"))
    val vecs = emb.select(col("vec_id"),
      Similarity.toDouble(col("embedding")).as("v"))
    val q = vecs.filter(col("vec_id") === qid)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val sem = Similarity.bruteForceTopK(vecs, q, kPer, excludeSelf = false)
      .select(col("vec_id").as("doc_id"), col("rank").cast("long").as("rank_sem"))
    kw.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_kw"), col("rank_sem"),
        (coalesce(expr(s"1000000 div ($rrfK + rank_kw)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($rrfK + rank_sem)"), lit(0L)))
          .as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(kOut)
  }

  private def q170(s: SparkSession, dir: String): DataFrame =
    rrfFusion(Tables.documents(s, dir).select(col("doc_id"), col("text")),
      Tables.embeddings(s, dir), QTerms, qid = 7L, kPer = 50, kOut = 20)

  private val q170Sql =
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
      |  SELECT doc_id,
      |    ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2
      |      / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |    + ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2
      |      / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |    + ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2
      |      / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS score
      |  FROM d CROSS JOIN stats),
      |kw AS (
      |  SELECT doc_id, CAST(rn AS BIGINT) AS rank_kw FROM (
      |    SELECT doc_id, row_number() OVER (
      |      ORDER BY round(score, 4) DESC, doc_id) AS rn FROM scored)
      |  WHERE rn <= 50),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sem AS (
      |  SELECT doc_id, CAST(rn AS BIGINT) AS rank_sem FROM (
      |    SELECT e.vec_id AS doc_id, row_number() OVER (ORDER BY
      |      round(list_inner_product(q.v, e.v)
      |        / (sqrt(list_inner_product(q.v, q.v))
      |           * sqrt(list_inner_product(e.v, e.v))), 4) DESC,
      |      e.vec_id) AS rn
      |    FROM e CROSS JOIN (SELECT v FROM e WHERE vec_id = 7) q)
      |  WHERE rn <= 50)
      |SELECT coalesce(kw.doc_id, sem.doc_id) AS doc_id, rank_kw, rank_sem,
      |  CAST(coalesce(1000000 // (60 + rank_kw), 0)
      |    + coalesce(1000000 // (60 + rank_sem), 0) AS BIGINT) AS rrf_micro
      |FROM kw FULL OUTER JOIN sem ON kw.doc_id = sem.doc_id
      |ORDER BY rrf_micro DESC, doc_id LIMIT 20""".stripMargin

  // ==== q233: positional phrase search ======================================
  //
  // Exact phrase match — the retrieval mode BM25's bag-of-words cannot
  // express ("window table" ≠ "table window"). The classic positional-
  // inverted-index evaluation: tokens explode once to (doc, pos, tok);
  // each phrase term selects its posting rows; terms ALIGN through an
  // equi-join on (doc, pos − offset) — occurrences (overlapping included)
  // fall out as join matches, never a per-doc scan of the full text.
  // Scale: postings are term-selective BEFORE the join (the most frequent
  // phrase term bounds the join input), the join keys on (doc, pos) so
  // no position ever fans out, and the phrase plan is |phrase|−1 chained
  // equi-joins — at 100 TB this is the standard positional-index shape
  // (Lucene's PhraseQuery evaluated set-at-a-time).

  /** Per-doc occurrence counts of the exact token `phrase`, top-`k` by
    * (count desc, doc_id). */
  def phraseSearch(docs: DataFrame, phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.size >= 2)
    val toks = docs.select(col("doc_id"),
      posexplode(Tok.ws(col("text"))).as(Seq("pos", "tok")))
    val anchors = toks.where(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val aligned = phrase.zipWithIndex.tail.foldLeft(anchors) {
      case (acc, (w, off)) =>
        acc.join(
          toks.where(col("tok") === w)
            .select(col("doc_id"), (col("pos") - off).as("pos")),
          Seq("doc_id", "pos"))
    }
    aligned.groupBy(col("doc_id")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("doc_id")).limit(k)
  }

  private def q233(s: SparkSession, dir: String): DataFrame =
    phraseSearch(Tables.documents(s, dir), Seq("table", "table"), 20)

  // the oracle counts occurrences per doc with an indexed list scan — a
  // DIFFERENT evaluation strategy (per-doc positional scan vs the
  // engine's postings join), so the differential proves the join
  // decomposition, overlapping occurrences included
  private val q233Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |hits AS (
      |  SELECT doc_id,
      |    len(list_filter(ws, (x, i) -> x = 'table'
      |      AND i < len(ws) AND ws[i + 1] = 'table')) AS n_occurrences
      |  FROM t)
      |SELECT doc_id, CAST(n_occurrences AS BIGINT) AS n_occurrences
      |FROM hits WHERE n_occurrences > 0
      |ORDER BY n_occurrences DESC, doc_id LIMIT 20""".stripMargin

  // ==== q350: item-item co-occurrence cosine — recsys neighbors =============
  //
  // The collaborative-filtering primitive the basket shelf stops short
  // of: q121's association rules run over the 5-value event-TYPE domain;
  // real "customers also bought" runs over the PART catalog (thousands
  // to millions of items) and wants, per item, its top-k most-similar
  // neighbors by co-occurrence cosine sim(a,b) = c_ab/√(c_a·c_b) — the
  // classic item-item kNN (Sarwar et al. 2001; Amazon's item-to-item).
  // Scale shape: pair generation is a SAME-ORDER self-join (fan-out
  // basket_size² per order, bounded by basket size, never corpus²);
  // item totals broadcast; the top-k rank windows over each item's
  // NEIGHBOR list (co-purchase-degree-bounded), never globally.
  // Exactness: cosine is ONE cr division of an integer by one cr sqrt
  // of an integer product — bit-identical doubles, so ordering by
  // (cosine DESC, neighbor ASC) ranks identically in both engines.

  /** Top-`k` co-purchase neighbors per part: (item, neighbor, n_pair,
    * cosine, rnk). Pairs are emitted in both directions. */
  def itemCooccurrence(lineitem: DataFrame, k: Int): DataFrame = {
    val items = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct()
    val totals = items.groupBy(col("item")).agg(count(lit(1)).as("c"))
    val pairs = items.as("a")
      .join(items.as("b"), col("a.ok") === col("b.ok") &&
        col("a.item") =!= col("b.item"))
      .groupBy(col("a.item").as("item"), col("b.item").as("neighbor"))
      .agg(count(lit(1)).as("n_pair"))
    def dd(c: Column) = c.cast("double")
    val scored = pairs
      .join(totals.withColumnRenamed("item", "item")
        .withColumnRenamed("c", "c_i"), Seq("item"))
      .join(totals.withColumnRenamed("item", "neighbor")
        .withColumnRenamed("c", "c_j"), Seq("neighbor"))
      .select(col("item"), col("neighbor"), col("n_pair"),
        (dd(col("n_pair")) /
          sqrt(dd(col("c_i").cast("decimal(38,0)") * col("c_j"))))
          .as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"))
      .orderBy(col("cos").desc, col("neighbor").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("item"), col("neighbor"), col("n_pair"),
        QueryDef.dec4(col("cos")).as("cosine"), col("rnk"))
  }

  // part domain at sf0.01 is ~2k items; keep the q-face output bounded
  // by restricting to the first 200 parts AFTER scoring (the neighbor
  // pool still spans the whole catalog)
  private def q350(s: SparkSession, dir: String): DataFrame =
    itemCooccurrence(Tables.lineitem(s, dir), k = 3)
      .filter(col("item") < 200)
      .orderBy(col("item"), col("rnk"))

  private val q350Sql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
      |  FROM lineitem),
      |totals AS (
      |  SELECT item, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.item AS item, b.item AS neighbor,
      |    CAST(count(*) AS BIGINT) AS n_pair
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.item <> b.item
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT p.item, p.neighbor, p.n_pair,
      |    CAST(p.n_pair AS DOUBLE) /
      |      sqrt(CAST(CAST(ti.c AS DECIMAL(38,0)) * tj.c AS DOUBLE))
      |      AS cos
      |  FROM pairs p
      |  JOIN totals ti ON ti.item = p.item
      |  JOIN totals tj ON tj.item = p.neighbor),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY item
      |    ORDER BY cos DESC, neighbor) AS rnk
      |  FROM scored)
      |SELECT item, neighbor, n_pair,
      |  CAST(CAST(cos AS DECIMAL(38,4)) AS VARCHAR) AS cosine, rnk
      |FROM ranked WHERE rnk <= 3 AND item < 200
      |ORDER BY item, rnk""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q350_item_cooccurrence", q350, Some(q350Sql)),
    QueryDef("q103_bm25_topk", q103, Some(q103Sql)),
    QueryDef("q170_rrf_fusion", q170, Some(q170Sql)),
    QueryDef("q233_phrase_search", q233, Some(q233Sql)))
}
