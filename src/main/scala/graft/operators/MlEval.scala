package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ==== q141: retrieval evaluation — recall@10, MRR@20, nDCG@10 =============
  //
  // The eval harness for the engine's own retrieval tier: score the BM25
  // ranking (q103 machinery) against an exact binary relevance oracle
  // (docs containing ALL query terms). Scale shape: each query is one
  // corpus scan + top-k (bm25TopK's shape); every metric then computes on
  // the ≤k system rows + one scalar relevant-count — per-query cost is
  // independent of corpus size beyond the scans. Exactness: recall and MRR
  // divide integers; nDCG uses INTEGER rank weights w_r = ⌊10⁶/log₂(r+1)⌋
  // precomputed in Scala and embedded as the same literals in the oracle —
  // no cross-engine transcendental ever happens.

  private[operators] val EvalQueries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("hash", "vector", "stream"),
    2 -> Seq("join", "filter"),
    3 -> Seq("window", "sort", "merge"))

  /** w_r = ⌊10⁶ / log₂(r+1)⌋ for r = 1..10 (binary-gain DCG weights). */
  private[operators] val DcgW: Seq[Long] =
    (1 to 10).map(r => (1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)
  private[operators] val DcgPrefix: Seq[Long] = DcgW.scanLeft(0L)(_ + _).tail

  /** Metrics for one ranked system list against the all-terms truth set. */
  private[operators] def metricsFor(docs: DataFrame, qid: Int, terms: Seq[String]): DataFrame = {
    val sys = Retrieval.bm25TopK(docs, terms, 20)
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(round(col("score"), 4).desc, col("doc_id"))).as("rank"))
    val isRel = terms.map(t => array_contains(Tok.ws(col("text")), t))
      .reduce(_ && _)
    val truth = docs.filter(isRel).select(col("doc_id"), lit(1).as("rel"))
    val nRel = truth.count() // scalar; the truth set is a query-sized list
    val wCol = element_at(typedLit(DcgW), col("rank").cast("int"))
    // Empty truth set: recall and nDCG are undefined (÷0 / DcgPrefix(-1)) —
    // emit NULL for both, matching what the SQL twin's NULLIF would yield,
    // instead of crashing the whole eval run on one degenerate term set.
    val idcg = if (nRel == 0) 1L else DcgPrefix(math.min(nRel, 10L).toInt - 1)
    def orNull(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (nRel == 0) lit(null).cast("string") else QueryDef.dec4(c)
    sys.join(truth, Seq("doc_id"), "left")
      .agg(
        sum(when(col("rel") === 1 && col("rank") <= 10, 1L).otherwise(0L))
          .as("hits10"),
        coalesce(max(when(col("rel") === 1,
          lit(1.0) / col("rank").cast("double"))), lit(0.0)).as("mrr"),
        sum(when(col("rel") === 1 && col("rank") <= 10, wCol).otherwise(0L))
          .as("dcg"))
      .select(lit(qid).as("qid"), lit(nRel).as("n_rel"), col("hits10"),
        orNull(col("hits10").cast("double") / lit(nRel).cast("double"))
          .as("recall10"),
        QueryDef.dec4(col("mrr")).as("mrr20"),
        orNull(col("dcg").cast("double") / lit(idcg).cast("double"))
          .as("ndcg10"))
  }

  private def q141(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    EvalQueries.map { case (qid, terms) => metricsFor(docs, qid, terms) }
      .reduce(_ unionByName _)
      .orderBy(col("qid"))
  }

  // per-query CTEs generated from the SAME term lists and DCG literals
  private val q141Sql = {
    def one(qid: Int, terms: Seq[String]): String = {
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(t, x -> x = '$t')) AS tf$i" }.mkString(", ")
      val dfCols = terms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
      val scoreTerms = terms.indices.map(i =>
        s"ln(1.0 + (n_docs - df$i + 0.5) / (df$i + 0.5)) * tf$i * 2.2" +
          s" / (tf$i + 1.2 * (0.25 + 0.75 * dl / avgdl))").mkString("\n      + ")
      val relCond = terms.indices.map(i => s"tf$i > 0").mkString(" AND ")
      val wCase = (1 to 10).map(r => s"WHEN rank = $r THEN ${DcgW(r - 1)}")
        .mkString(" ")
      val idcgCase = (1 to 10).map(r =>
        s"WHEN least(n_rel, 10) = $r THEN ${DcgPrefix(r - 1)}").mkString(" ")
      s"""d$qid AS (
         |  SELECT doc_id, len(t) AS dl, $tfCols, ($relCond) AS rel
         |  FROM (SELECT doc_id,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS t
         |    FROM documents)),
         |st$qid AS (
         |  SELECT count(*) AS n_docs,
         |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, $dfCols,
         |    CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
         |  FROM d$qid),
         |sys$qid AS (
         |  SELECT doc_id, rel, n_rel,
         |    row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rank
         |  FROM (
         |    SELECT doc_id, rel, n_rel, $scoreTerms AS score
         |    FROM d$qid CROSS JOIN st$qid)
         |  ORDER BY round(score, 4) DESC, doc_id LIMIT 20),
         |m$qid AS (
         |  SELECT $qid AS qid, max(n_rel) AS n_rel,
         |    CAST(sum(CASE WHEN rel AND rank <= 10 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS hits10,
         |    coalesce(max(CASE WHEN rel THEN CAST(1 AS DOUBLE) / rank END),
         |      CAST(0 AS DOUBLE)) AS mrr,
         |    CAST(sum(CASE WHEN rel AND rank <= 10 THEN
         |      CASE $wCase END ELSE 0 END) AS BIGINT) AS dcg,
         |    max(CASE $idcgCase END) AS idcg
         |  FROM sys$qid)""".stripMargin
    }
    val ctes = EvalQueries.map { case (q, t) => one(q, t) }.mkString(",\n")
    val unions = EvalQueries.map { case (q, _) =>
      s"""SELECT qid, n_rel, hits10,
         |  CAST(CAST(CAST(hits10 AS DOUBLE) / CAST(n_rel AS DOUBLE)
         |    AS DECIMAL(38,4)) AS VARCHAR) AS recall10,
         |  CAST(CAST(mrr AS DECIMAL(38,4)) AS VARCHAR) AS mrr20,
         |  CAST(CAST(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)
         |    AS DECIMAL(38,4)) AS VARCHAR) AS ndcg10
         |FROM m$q""".stripMargin }.mkString("\nUNION ALL\n")
    s"WITH $ctes\n$unions\nORDER BY qid"
  }

  // ==== q143: score calibration / reliability bins ==========================
  //
  // The companion to AUC: AUC says a score RANKS the classes, calibration
  // says what the score VALUES mean — bucket the corpus into equal-depth
  // score deciles and report the positive rate per bin (a reliability
  // diagram as a table). Reuses the q113 discipline: exact interpolated
  // decile boundaries via the distributed order-statistics path, rounded
  // to the dec4 grid and broadcast; bin assignment and the label rollup
  // are then one map-side pass + one domain-sized groupBy. pos_rate
  // divides integers — bit-identical across engines.

  /** Equal-depth `buckets` of `score` with per-bin positive rates. */
  def calibrationBins(df: DataFrame, score: String, label: String,
      buckets: Int): DataFrame = {
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val spark = df.sparkSession
    import spark.implicits._
    // Half-even (math.rint) boundary snapping — the ONE rounding rule for
    // all broadcast quantile boundaries in this repo (q159 note: rint
    // matches DuckDB's round on exact half-grid ties; Spark's round() is
    // HALF_UP and disagrees there), shared with CorpusStats.psi.
    val rounded = Seq(Tuple1(Profiling.exactQuantiles(df, score, ps)
      .map(b => math.rint(b * 10000) / 10000))).toDF("bs")
    df.select(col(score).cast("double").as("v"),
        when(expr(label), 1L).otherwise(0L).as("pos"))
      .crossJoin(broadcast(rounded))
      .select(aggregate(col("bs"), lit(0),
        (acc, b) => acc + when(round(col("v"), 4) > b, 1).otherwise(0))
        .as("bin"), col("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("npos"))
      .select(col("bin"), col("n"), col("npos"),
        QueryDef.dec4(col("npos").cast("double") / col("n").cast("double"))
          .as("pos_rate"))
  }

  private def q143(s: SparkSession, dir: String): DataFrame =
    calibrationBins(Tables.documents(s, dir), "n_chars", "lang = 'en'", 10)
      .orderBy(col("bin"))

  private val q143Sql = {
    val fracs = (1 to 9).map(i => s"0.${i}").mkString(", ")
    s"""WITH b AS (
       |  SELECT list_transform(quantile_cont(n_chars, [$fracs]),
       |    x -> round(x, 4)) AS bs
       |  FROM documents),
       |assigned AS (
       |  SELECT len(list_filter(bs, x -> round(CAST(n_chars AS DOUBLE), 4) > x))
       |      AS bin,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
       |  FROM documents CROSS JOIN b)
       |SELECT bin, count(*) AS n, CAST(sum(pos) AS BIGINT) AS npos,
       |  CAST(CAST(CAST(sum(pos) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS pos_rate
       |FROM assigned GROUP BY bin ORDER BY bin""".stripMargin
  }

  // ==== q145: embedding class-separation report =============================
  //
  // Mean pairwise dot product within and between label classes — the
  // label-coherence check before trusting labels for hard-negative mining
  // or purity-based filtering. The pair space is NEVER materialized: with
  // S_c = Σ_{v∈c} v and Q_c = Σ ‖v‖², the within-class mean pairwise dot
  // is (‖S_c‖² − Q_c) / (n_c(n_c−1)) and the between-class mean is
  // S_a·S_b / (n_a·n_b) — all from per-class SUMS, one aggregation pass,
  // O(labels²·dim) post-work for any corpus size. Exactness: vectors are
  // first snapped to a fixed integer grid (⌊1000·x⌉ — the q88 int8 idea
  // with a GLOBAL scale so dots are comparable), making every moment an
  // exact BIGINT; the final division rescales by 10⁻⁶ — both engines
  // divide identical integers by identical powers of ten.

  /** (label_a ≤ label_b) → n_pairs + mean pairwise dot (grid units /1e6).
    * `emb`: (label, v: array<double>). */
  def classSeparation(emb: DataFrame): DataFrame = {
    val q = emb.select(col("label"),
      transform(col("v"), x => floor(x * 1000.0 + 0.5).cast("long")).as("qv"))
    val perClass = q.groupBy(col("label")).agg(
      count(lit(1)).as("n"),
      sum(aggregate(col("qv"), lit(0L), (a, x) => a + x * x)).as("qsum"))
    val dims = q.select(col("label"), posexplode(col("qv")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim")).agg(sum(col("x")).as("s"))
    val within = dims.groupBy(col("label")).agg(sum(col("s") * col("s")).as("ss2"))
      .join(perClass, Seq("label"))
      .filter(col("n") > 1)
      .select(col("label").as("label_a"), col("label").as("label_b"),
        (col("n") * (col("n") - 1)).as("n_pairs"),
        ((col("ss2") - col("qsum")).cast("double") /
          ((col("n") * (col("n") - 1)).cast("double") * lit(1e6))).as("mean_dot"))
    val a = dims.select(col("label").as("la"), col("dim"), col("s").as("sa"))
    val b = dims.select(col("label").as("lb"), col("dim"), col("s").as("sb"))
    val cross = a.join(b, Seq("dim")).filter(col("la") < col("lb"))
      .groupBy(col("la"), col("lb")).agg(sum(col("sa") * col("sb")).as("dot"))
      .join(broadcast(perClass.select(col("label").as("la"), col("n").as("na"))), Seq("la"))
      .join(broadcast(perClass.select(col("label").as("lb"), col("n").as("nb"))), Seq("lb"))
      .select(col("la").as("label_a"), col("lb").as("label_b"),
        (col("na") * col("nb")).as("n_pairs"),
        (col("dot").cast("double") /
          ((col("na") * col("nb")).cast("double") * lit(1e6))).as("mean_dot"))
    within.unionByName(cross)
  }

  private def q145(s: SparkSession, dir: String): DataFrame =
    classSeparation(Tables.embeddings(s, dir)
      .select(col("label"), Similarity.toDouble(col("embedding")).as("v")))
      .select(col("label_a"), col("label_b"), col("n_pairs"),
        QueryDef.dec4(col("mean_dot")).as("mean_dot"))
      .orderBy(col("label_a"), col("label_b"))

  private val q145Sql =
    """WITH q AS (
      |  SELECT label, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings),
      |pc AS (
      |  SELECT label, count(*) AS n,
      |    CAST(sum(list_aggregate(list_transform(qv, x -> x * x), 'sum'))
      |      AS BIGINT) AS qsum
      |  FROM q GROUP BY 1),
      |dims AS (
      |  SELECT label, i AS dim, CAST(sum(qv[i]) AS BIGINT) AS s
      |  FROM q, unnest(range(1, 65)) AS u(i) GROUP BY 1, 2),
      |within AS (
      |  SELECT d.label AS label_a, d.label AS label_b,
      |    pc.n * (pc.n - 1) AS n_pairs,
      |    CAST(CAST(sum(d.s * d.s) AS BIGINT) - max(pc.qsum) AS DOUBLE) /
      |      (CAST(pc.n * (pc.n - 1) AS DOUBLE) * 1e6) AS mean_dot
      |  FROM dims d JOIN pc ON d.label = pc.label
      |  WHERE pc.n > 1 GROUP BY d.label, pc.n),
      |cross_c AS (
      |  SELECT a.label AS label_a, b.label AS label_b,
      |    pa.n * pb.n AS n_pairs,
      |    CAST(CAST(sum(a.s * b.s) AS BIGINT) AS DOUBLE) /
      |      (CAST(pa.n * pb.n AS DOUBLE) * 1e6) AS mean_dot
      |  FROM dims a JOIN dims b ON a.dim = b.dim AND a.label < b.label
      |  JOIN pc pa ON pa.label = a.label JOIN pc pb ON pb.label = b.label
      |  GROUP BY a.label, b.label, pa.n, pb.n)
      |SELECT label_a, label_b, n_pairs,
      |  CAST(CAST(mean_dot AS DECIMAL(38,4)) AS VARCHAR) AS mean_dot
      |FROM (SELECT * FROM within UNION ALL SELECT * FROM cross_c)
      |ORDER BY label_a, label_b""".stripMargin

  // ==== q148/q149: classifier agreement — report + Cohen's kappa ============
  //
  // Per-class precision/recall/F1 plus chance-corrected agreement for a
  // categorical predictor (here: the q33 marker-word lang-id against the
  // labeled lang). Everything reduces over the |classes|² confusion
  // matrix: one map-side-combined groupBy on (actual, predicted), then
  // domain-sized arithmetic — the corpus is scanned once regardless of
  // size. Exactness: kappa = (N·Σdiag − Σ rowᵢ·colᵢ) / (N² − Σ rowᵢ·colᵢ)
  // — the integer form (multiply through by N²), so both engines divide
  // identical BIGINTs; P/R/F1 divide small integers.

  /** Confusion counts → per-class n_true/n_pred/tp + P/R/F1. `df` needs
    * `actual` and `predicted` string columns. */
  def classifierReport(df: DataFrame): DataFrame = {
    val conf = df.groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    val byTrue = conf.groupBy(col("actual").as("cls"))
      .agg(sum(col("n")).as("n_true"),
        sum(when(col("predicted") === col("actual"), col("n")).otherwise(0L))
          .as("tp"))
    val byPred = conf.groupBy(col("predicted").as("cls"))
      .agg(sum(col("n")).as("n_pred"))
    byTrue.join(byPred, Seq("cls"), "full")
      .select(col("cls"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision", when(col("n_pred") > 0,
        col("tp").cast("double") / col("n_pred").cast("double")))
      .withColumn("recall", when(col("n_true") > 0,
        col("tp").cast("double") / col("n_true").cast("double")))
      .withColumn("f1", when(col("n_pred") + col("n_true") > 0,
        (lit(2.0) * col("tp").cast("double")) /
          (col("n_pred") + col("n_true")).cast("double")))
  }

  /** Cohen's kappa in the all-integer form: one row
    * (n, sum_diag, sum_chance, kappa). */
  def cohensKappa(df: DataFrame): DataFrame = {
    val conf = df.groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    val byTrue = conf.groupBy(col("actual").as("cls")).agg(sum(col("n")).as("rt"))
    val byPred = conf.groupBy(col("predicted").as("cls")).agg(sum(col("n")).as("cp"))
    val chance = byTrue.join(byPred, Seq("cls"), "full")
      .agg(sum(coalesce(col("rt"), lit(0L)) * coalesce(col("cp"), lit(0L)))
        .as("sum_chance"))
    val agree = conf.agg(sum(col("n")).as("n"),
      sum(when(col("actual") === col("predicted"), col("n")).otherwise(0L))
        .as("sum_diag"))
    agree.crossJoin(chance)
      .select(col("n"), col("sum_diag"), col("sum_chance"),
        ((col("n") * col("sum_diag") - col("sum_chance")).cast("double") /
          (col("n") * col("n") - col("sum_chance")).cast("double")).as("kappa"))
  }

  // the q33 predictor as (actual, predicted); 'zh' has no marker list, so
  // the confusion matrix genuinely exercises the unseen-class paths
  private def langPred(s: SparkSession, dir: String): DataFrame = {
    val t = Tok.ws(col("text"))
    def sc(m: Seq[String]) = size(filter(t, x => x.isin(m: _*)))
    Tables.documents(s, dir)
      .select(col("lang").as("actual"),
        sc(Seq("the", "a", "of", "is")).as("en"),
        sc(Seq("der", "die", "das", "und")).as("de"),
        sc(Seq("el", "los", "y", "es")).as("es"),
        sc(Seq("le", "les", "et", "est")).as("fr"))
      .withColumn("predicted",
        when(col("en") >= col("de") && col("en") >= col("es") &&
          col("en") >= col("fr"), "en")
          .when(col("de") >= col("es") && col("de") >= col("fr"), "de")
          .when(col("es") >= col("fr"), "es")
          .otherwise("fr"))
  }

  private val langPredSql =
    """SELECT lang AS actual,
      |  CASE WHEN en >= de AND en >= es AND en >= fr THEN 'en'
      |    WHEN de >= es AND de >= fr THEN 'de'
      |    WHEN es >= fr THEN 'es' ELSE 'fr' END AS predicted
      |FROM (SELECT lang,
      |    len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','is'))) AS en,
      |    len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und'))) AS de,
      |    len(list_filter(string_split(text,' '), x -> x IN ('el','los','y','es'))) AS es,
      |    len(list_filter(string_split(text,' '), x -> x IN ('le','les','et','est'))) AS fr
      |  FROM documents)""".stripMargin

  private def q148(s: SparkSession, dir: String): DataFrame =
    classifierReport(langPred(s, dir))
      .select(col("cls"), col("n_true"), col("n_pred"), col("tp"),
        QueryDef.dec4(col("precision")).as("precision"),
        QueryDef.dec4(col("recall")).as("recall"),
        QueryDef.dec4(col("f1")).as("f1"))
      .orderBy(col("cls"))

  private val q148Sql =
    s"""WITH pred AS ($langPredSql),
       |conf AS (SELECT actual, predicted, count(*) AS n FROM pred GROUP BY 1, 2),
       |bt AS (
       |  SELECT actual AS cls, CAST(sum(n) AS BIGINT) AS n_true,
       |    CAST(sum(CASE WHEN predicted = actual THEN n ELSE 0 END) AS BIGINT) AS tp
       |  FROM conf GROUP BY 1),
       |bp AS (SELECT predicted AS cls, CAST(sum(n) AS BIGINT) AS n_pred
       |  FROM conf GROUP BY 1),
       |j AS (
       |  SELECT coalesce(bt.cls, bp.cls) AS cls,
       |    coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred,
       |    coalesce(tp, 0) AS tp
       |  FROM bt FULL JOIN bp ON bt.cls = bp.cls)
       |SELECT cls, n_true, n_pred, tp,
       |  CAST(CAST(CASE WHEN n_pred > 0 THEN
       |    CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END
       |    AS DECIMAL(38,4)) AS VARCHAR) AS precision,
       |  CAST(CAST(CASE WHEN n_true > 0 THEN
       |    CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE) END
       |    AS DECIMAL(38,4)) AS VARCHAR) AS recall,
       |  CAST(CAST(CASE WHEN n_pred + n_true > 0 THEN
       |    (CAST(2 AS DOUBLE) * CAST(tp AS DOUBLE)) /
       |      CAST(n_pred + n_true AS DOUBLE) END
       |    AS DECIMAL(38,4)) AS VARCHAR) AS f1
       |FROM j ORDER BY cls""".stripMargin

  private def q149(s: SparkSession, dir: String): DataFrame =
    cohensKappa(langPred(s, dir))
      .select(col("n"), col("sum_diag"), col("sum_chance"),
        QueryDef.dec4(col("kappa")).as("kappa"))

  private val q149Sql =
    s"""WITH pred AS ($langPredSql),
       |conf AS (SELECT actual, predicted, count(*) AS n FROM pred GROUP BY 1, 2),
       |bt AS (SELECT actual AS cls, CAST(sum(n) AS BIGINT) AS rt FROM conf GROUP BY 1),
       |bp AS (SELECT predicted AS cls, CAST(sum(n) AS BIGINT) AS cp FROM conf GROUP BY 1),
       |ch AS (
       |  SELECT CAST(sum(coalesce(rt, 0) * coalesce(cp, 0)) AS BIGINT) AS sum_chance
       |  FROM bt FULL JOIN bp ON bt.cls = bp.cls),
       |ag AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN actual = predicted THEN n ELSE 0 END) AS BIGINT)
       |      AS sum_diag
       |  FROM conf)
       |SELECT n, sum_diag, sum_chance,
       |  CAST(CAST(CAST(n * sum_diag - sum_chance AS DOUBLE) /
       |    CAST(n * n - sum_chance AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR)
       |    AS kappa
       |FROM ag CROSS JOIN ch""".stripMargin

  // ==== q186: grouped average precision (the PR-AUC twin of q140) ===========
  //
  // AP = (1/n₊)·Σ_{ranks k of positives} precision@k — the ranking metric
  // that, unlike ROC-AUC, collapses under class imbalance exactly when a
  // retrieval/quality ranker does, which is why curation pipelines report
  // both. Ties broken by doc_id (the q141 precedent) — deterministic and
  // engine-portable where "average over tie permutations" is not. Float
  // discipline: each term precision@k = cum₊/k integerizes once
  // (⌊10⁹·cum₊/k⌋ — both engines divide the same exact integers and floor)
  // and the group sums INTEGERS — order-free, hash-stable. Scale shape:
  // one per-group window over member rows (group-sized, like q141's
  // per-query ranking); corpus-scale groups would move to the q140
  // histogram form at the cost of a tie convention.

  /** Per-`group` average precision of ranking by (`score` desc, `id`) for
    * `label`. Groups with no positives report null AP. */
  def groupedAveragePrecision(df: DataFrame, group: String, score: String,
      id: String, label: String): DataFrame = {
    val w = Window.partitionBy(col(group))
      .orderBy(col(score).desc, col(id))
    val ranked = df
      .select(col(group), col(score), col(id),
        when(expr(label), 1L).otherwise(0L).as("y"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cumpos", sum(col("y")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked.groupBy(col(group))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"),
        sum(when(col("y") === 1L,
          floor(lit(1e9) * col("cumpos").cast("double") /
            col("rn").cast("double")).cast("long"))
          .otherwise(0L)).as("s9"))
      .select(col(group), col("n"), col("npos"),
        when(col("npos") > 0,
          col("s9").cast("double") / (lit(1e9) * col("npos").cast("double")))
          .as("ap"))
  }

  private def q186(s: SparkSession, dir: String): DataFrame =
    groupedAveragePrecision(Tables.documents(s, dir),
      "source", "n_chars", "doc_id", "lang = 'en'")
      .select(col("source"), col("n"), col("npos"),
        QueryDef.dec4(col("ap")).as("ap"))
      .orderBy(col("source"))

  private val q186Sql =
    """WITH ranked AS (
      |  SELECT source,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rn,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY source ORDER BY n_chars DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumpos
      |  FROM documents),
      |agg AS (
      |  SELECT source, count(*) AS n, CAST(sum(y) AS BIGINT) AS npos,
      |    CAST(sum(CASE WHEN y = 1 THEN CAST(floor(1000000000.0 *
      |      CAST(cumpos AS DOUBLE) / CAST(rn AS DOUBLE)) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS s9
      |  FROM ranked GROUP BY 1)
      |SELECT source, n, npos,
      |  CAST(CAST(CASE WHEN npos > 0 THEN CAST(s9 AS DOUBLE) /
      |      (1000000000.0 * CAST(npos AS DOUBLE)) ELSE NULL END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS ap
      |FROM agg ORDER BY source""".stripMargin

  // ==== q191: split-conformal prediction intervals ==========================
  //
  // Distribution-free uncertainty for ANY point predictor (Vovk et al.;
  // the Angelopoulos–Bates recipe): fit on the train split, take the
  // ⌈(n_cal+1)(1−α)⌉-th smallest absolute residual on a held-out
  // calibration split (the finite-sample correction — NOT an interpolated
  // quantile), and ŷ ± q̂ then covers new points with probability ≥ 1−α,
  // no matter how wrong the model is. The engine closes the loop:
  // fit (q144's exact-integer-moment OLS) → calibrate → audit empirical
  // coverage on a test split.
  //
  // Determinism: moments are exact BIGINTs; slope/intercept/residuals are
  // exactly-rounded doubles (identical bits both engines); q̂ is an ORDER
  // STATISTIC of those doubles (rank selection, no interpolation); the
  // coverage test compares bit-identical doubles. Scale shape: one moment
  // aggregation, one map-side residual pass, one DISTRIBUTED rank
  // selection on the calibration split (the q113 range-partitioned
  // prefix-count walk — no single-partition sort), one counting pass.

  /** One row: OLS of `y` on `x` fit on train (key%4 ∈ {1,2}), conformal
    * q̂ at miscoverage `alpha` from calibration (key%4 = 3), empirical
    * coverage on test (key%4 = 0). */
  def conformalInterval(df: DataFrame, key: String, x: String, y: String,
      alpha: Double): DataFrame = {
    val tagged = df.select(col(key).cast("long").as("k"),
      col(x).cast("long").as("x"), col(y).cast("long").as("y"))
      .withColumn("split", pmod(col("k"), lit(4L)))
    val m = tagged.filter(col("split").isin(1L, 2L)).agg(
      count(lit(1)).as("n_train"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val fit = m.select(col("n_train"),
      ((col("n_train") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n_train") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("slope"),
      col("sx").cast("double").as("dsx"), col("sy").cast("double").as("dsy"))
      .select(col("n_train"), col("slope"),
        ((col("dsy") - col("slope") * col("dsx")) /
          col("n_train").cast("double")).as("intercept"))
    val resid = tagged.crossJoin(broadcast(fit))
      .withColumn("r", abs(col("y").cast("double") -
        (col("slope") * col("x").cast("double") + col("intercept"))))
    val cal = resid.filter(col("split") === 3L)
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    // q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest calibration residual. Rank
    // selection is the q113 distributed order-statistic walk
    // (range-partitioned prefix count — ChunkAssigner.withPrefixSum),
    // NOT a single-partition global-sort window: the value at rank m
    // under (r, k) ordering is the m-th smallest r either way.
    val ranked = graft.chunk.ChunkAssigner.withPrefixSum(
        cal.select(col("r"), col("k")), Seq(col("r"), col("k")),
        lit(1L), outName = "rn0")
      .crossJoin(broadcast(nCal))
      .filter(col("rn0") + lit(1L) ===
        ceil((col("n_cal") + 1) * lit(1.0 - alpha)).cast("long"))
      .select(col("r").as("q_hat"), col("n_cal"))
    val test = resid.filter(col("split") === 0L).crossJoin(broadcast(ranked))
      .agg(first(col("n_cal")).as("n_cal"),
        first(col("q_hat")).as("q_hat"),
        count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("q_hat"), 1L).otherwise(0L)).as("n_covered"))
    test.crossJoin(broadcast(fit))
      .select(col("n_train"), col("n_cal"), col("n_test"),
        col("slope"), col("intercept"), col("q_hat"),
        col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
  }

  private def q191(s: SparkSession, dir: String): DataFrame =
    conformalInterval(
      Tables.documents(s, dir)
        .select(col("doc_id"), size(Tok.ws(col("text"))).as("nt"),
          col("n_chars")),
      "doc_id", "nt", "n_chars", alpha = 0.1)
      .select(col("n_train"), col("n_cal"), col("n_test"),
        QueryDef.dec4(col("slope")).as("slope"),
        QueryDef.dec4(col("intercept")).as("intercept"),
        QueryDef.dec4(col("q_hat")).as("q_hat"),
        col("n_covered"), QueryDef.dec4(col("coverage")).as("coverage"))

  private val q191Sql =
    """WITH d AS (
      |  SELECT doc_id AS k,
      |    CAST(len(list_filter(string_split(text, ' '), e -> e <> ''))
      |      AS BIGINT) AS x,
      |    n_chars AS y, doc_id % 4 AS split
      |  FROM documents),
      |m AS (
      |  SELECT count(*) AS n_train,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM d WHERE split IN (1, 2)),
      |fit AS (
      |  SELECT n_train,
      |    CAST(n_train * sxy - sx * sy AS DOUBLE) /
      |      CAST(n_train * sxx - sx * sx AS DOUBLE) AS slope, sx, sy
      |  FROM m),
      |fit2 AS (
      |  SELECT n_train, slope,
      |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
      |      CAST(n_train AS DOUBLE) AS intercept
      |  FROM fit),
      |resid AS (
      |  SELECT d.k, d.split,
      |    abs(CAST(d.y AS DOUBLE) -
      |      (f.slope * CAST(d.x AS DOUBLE) + f.intercept)) AS r
      |  FROM d CROSS JOIN fit2 f),
      |nc AS (SELECT count(*) AS n_cal FROM resid WHERE split = 3),
      |qh AS (
      |  SELECT r AS q_hat, nc.n_cal FROM (
      |    SELECT r, row_number() OVER (ORDER BY r, k) AS rn
      |    FROM resid WHERE split = 3) x CROSS JOIN nc
      |  WHERE x.rn = CAST(ceil((nc.n_cal + 1) * 0.9) AS BIGINT)),
      |tst AS (
      |  SELECT max(qh.n_cal) AS n_cal, max(qh.q_hat) AS q_hat,
      |    count(*) AS n_test,
      |    CAST(sum(CASE WHEN resid.r <= qh.q_hat THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_covered
      |  FROM resid CROSS JOIN qh WHERE resid.split = 0)
      |SELECT f.n_train, t.n_cal, t.n_test,
      |  CAST(CAST(f.slope AS DECIMAL(38,4)) AS VARCHAR) AS slope,
      |  CAST(CAST(f.intercept AS DECIMAL(38,4)) AS VARCHAR) AS intercept,
      |  CAST(CAST(t.q_hat AS DECIMAL(38,4)) AS VARCHAR) AS q_hat,
      |  t.n_covered,
      |  CAST(CAST(CAST(t.n_covered AS DOUBLE) / CAST(t.n_test AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS coverage
      |FROM tst t CROSS JOIN fit2 f""".stripMargin

  // ==== q244: probabilistic-classifier metrics — Brier, ECE, MCC ============
  //
  // q143 draws the reliability diagram; this scores it. The evaluated
  // predictor is a REAL confidence with signal: s = stopword-token
  // fraction (TextAnalysis.stopwords — the shared quality-band list)
  // read as P(lang = 'en'), evaluated against the actual lang label.
  // Brier = mean (s−y)², ECE = Σ_b (n_b/N)·|mean-conf_b − pos-rate_b|
  // over 10 equal-WIDTH confidence bins (the standard ECE binning;
  // q143's equal-DEPTH bins answer a different question), MCC from the
  // confusion matrix at s ≥ 0.5.
  //
  // Exact-integer discipline: s is floored to milli-units per doc, so
  //   • Brier numerator Σ(s_milli − 1000y)² sums exact integers;
  //   • the bin term n_b·|mean-conf_b − pos-rate_b| collapses to
  //     |Σ s_milli − 1000·pos_b| — integer inside the abs, so ECE's
  //     numerator is an exact integer sum too;
  //   • the 0.5 threshold is a bin boundary (s_milli ≥ 500), so the
  //     confusion counts come from the SAME bin pass.
  // Scale shape: one corpus projection → one 10-bin groupBy → one
  // 10-row rollup; three double divisions + one sqrt at render.

  /** (s, y): per-doc milli-unit stopword-fraction confidence + 0/1 label —
    * the shared front end of q244 (metrics) and q245 (isotonic fit). */
  private def confidenceBase(docs: DataFrame, label: String): DataFrame = {
    val t = Tok.ws(col("text"))
    docs
      .select(size(t).cast("long").as("m"),
        size(filter(t, x => x.isin(TextAnalysis.stopwords: _*)))
          .cast("long").as("k"),
        when(expr(label), 1L).otherwise(0L).as("y"))
      .select(when(col("m") > 0,
        floor(lit(1000.0) * col("k") / col("m")).cast("long"))
        .otherwise(0L).as("s"), col("y"))
  }

  /** DuckDB twin of [[confidenceBase]], as a `base(s, y)` CTE body. */
  private def confidenceBaseSql: String = {
    val stop = TextAnalysis.stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT CASE WHEN m > 0
       |      THEN CAST(floor(1000.0 * k / m) AS BIGINT) ELSE 0 END AS s,
       |    y
       |  FROM (
       |    SELECT CAST(len(toks) AS BIGINT) AS m,
       |      CAST(len(list_filter(toks, x -> x IN ($stop))) AS BIGINT) AS k,
       |      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |    FROM (SELECT list_filter(string_split(text, ' '),
       |        x -> x <> '') AS toks, lang FROM documents))""".stripMargin
  }

  /** One row: (n, pos, tp, fp, tn, fn, brier, ece, mcc) for the
    * stopword-fraction confidence against boolean `label`. */
  def calibrationMetrics(docs: DataFrame, label: String): DataFrame = {
    val base = confidenceBase(docs, label)
    val dev = col("s") - lit(1000L) * col("y")
    val bins = base
      .groupBy(least(expr("s DIV 100"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n_b"), sum(col("y")).as("pos_b"),
        sum(col("s")).as("ssum_b"), sum(dev * dev).as("br_b"),
        sum(when(col("s") >= 500 && col("y") === 1, 1L).otherwise(0L))
          .as("tp_b"),
        sum(when(col("s") >= 500 && col("y") === 0, 1L).otherwise(0L))
          .as("fp_b"),
        sum(when(col("s") < 500 && col("y") === 0, 1L).otherwise(0L))
          .as("tn_b"),
        sum(when(col("s") < 500 && col("y") === 1, 1L).otherwise(0L))
          .as("fn_b"))
    val m = bins.agg(sum(col("n_b")).as("n"), sum(col("pos_b")).as("pos"),
      sum(col("br_b")).as("brier_num"),
      sum(abs(col("ssum_b") - lit(1000L) * col("pos_b"))).as("ece_num"),
      sum(col("tp_b")).as("tp"), sum(col("fp_b")).as("fp"),
      sum(col("tn_b")).as("tn"), sum(col("fn_b")).as("fn"))
    def dd(c: String) = col(c).cast("double")
    m.select(col("n"), col("pos"), col("tp"), col("fp"), col("tn"),
      col("fn"),
      QueryDef.dec4(dd("brier_num") / (dd("n") * lit(1e6))).as("brier"),
      QueryDef.dec4(dd("ece_num") / (dd("n") * lit(1000.0))).as("ece"),
      QueryDef.dec4(when(
        col("tp") + col("fp") > 0 && col("tp") + col("fn") > 0 &&
          col("tn") + col("fp") > 0 && col("tn") + col("fn") > 0,
        (dd("tp") * dd("tn") - dd("fp") * dd("fn")) /
          sqrt((dd("tp") + dd("fp")) * (dd("tp") + dd("fn")) *
            (dd("tn") + dd("fp")) * (dd("tn") + dd("fn"))))).as("mcc"))
  }

  private def q244(s: SparkSession, dir: String): DataFrame =
    calibrationMetrics(Tables.documents(s, dir), "lang = 'en'")

  private val q244Sql = {
    s"""WITH base AS (
       |  $confidenceBaseSql),
       |bins AS (
       |  SELECT least(s // 100, 9) AS bin, count(*) AS n_b,
       |    CAST(sum(y) AS BIGINT) AS pos_b,
       |    CAST(sum(s) AS BIGINT) AS ssum_b,
       |    CAST(sum((s - 1000 * y) * (s - 1000 * y)) AS BIGINT) AS br_b,
       |    CAST(sum(CASE WHEN s >= 500 AND y = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tp_b,
       |    CAST(sum(CASE WHEN s >= 500 AND y = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fp_b,
       |    CAST(sum(CASE WHEN s < 500 AND y = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tn_b,
       |    CAST(sum(CASE WHEN s < 500 AND y = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fn_b
       |  FROM base GROUP BY 1),
       |m AS (
       |  SELECT CAST(sum(n_b) AS BIGINT) AS n,
       |    CAST(sum(pos_b) AS BIGINT) AS pos,
       |    CAST(sum(br_b) AS BIGINT) AS brier_num,
       |    CAST(sum(abs(ssum_b - 1000 * pos_b)) AS BIGINT) AS ece_num,
       |    CAST(sum(tp_b) AS BIGINT) AS tp, CAST(sum(fp_b) AS BIGINT) AS fp,
       |    CAST(sum(tn_b) AS BIGINT) AS tn, CAST(sum(fn_b) AS BIGINT) AS fn
       |  FROM bins)
       |SELECT n, pos, tp, fp, tn, fn,
       |  CAST(CAST(CAST(brier_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS brier,
       |  CAST(CAST(CAST(ece_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS ece,
       |  CAST(CAST(CASE WHEN tp + fp > 0 AND tp + fn > 0
       |      AND tn + fp > 0 AND tn + fn > 0
       |    THEN (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
       |        - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
       |      / sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
       |        * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
       |        * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
       |        * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE)))
       |    END AS DECIMAL(38,4)) AS VARCHAR) AS mcc
       |FROM m""".stripMargin
  }

  // ==== q335: log-loss (cross-entropy) =========================================
  //
  // The PROPER scoring rule q244's Brier complements (Brier is bounded
  // and quadratic; log-loss is what classifier training minimizes, and
  // it punishes confident mistakes unboundedly): −mean[y·ln p +
  // (1−y)·ln(1−p)] over the q244 stopword-fraction confidence. p is
  // milli-unit with ≤1001 distinct values, clipped to [1, 999]‰ (the
  // standard ε-clip — ln 0 is the alternative), so the corpus collapses
  // to a (s, y) histogram of ≤2002 rows; each row's ln is ONE double
  // expression ⌊10⁶·⌋-floored and count-multiplied, the total an exact
  // integer, one division at render.

  /** One row: (n, n_pos, logloss) for the stopword-fraction confidence
    * against boolean `label`. */
  def logLoss(docs: DataFrame, label: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val hist = confidenceBase(docs, label)
      .select(greatest(lit(1L), least(lit(999L), col("s"))).as("p"),
        col("y"))
      .groupBy(col("p"), col("y")).agg(count(lit(1)).as("cnt"))
    hist
      .select(col("cnt"), col("y"),
        (col("cnt") * floor(lit(1e6) *
          log(when(col("y") === 1L, dd(col("p")) / lit(1000.0))
            .otherwise(lit(1.0) - dd(col("p")) / lit(1000.0))))
          .cast("long")).as("t6"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("cnt") * col("y")).as("n_pos"),
        sum(col("t6")).as("num"))
      .select(col("n"), col("n_pos"),
        QueryDef.dec4(lit(-1.0) * col("num").cast("double") /
          (col("n").cast("double") * lit(1e6))).as("logloss"))
  }

  private def q335(s: SparkSession, dir: String): DataFrame =
    logLoss(Tables.documents(s, dir), "lang = 'en'")

  private val q335Sql =
    s"""WITH base AS (
       |  $confidenceBaseSql),
       |hist AS (
       |  SELECT greatest(1, least(999, s)) AS p, y, count(*) AS cnt
       |  FROM base GROUP BY 1, 2),
       |t AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
       |    CAST(sum(cnt * y) AS BIGINT) AS n_pos,
       |    CAST(sum(cnt * CAST(floor(1e6 * ln(CASE WHEN y = 1
       |        THEN CAST(p AS DOUBLE) / 1000.0
       |        ELSE 1.0 - CAST(p AS DOUBLE) / 1000.0 END)) AS BIGINT))
       |      AS BIGINT) AS num
       |  FROM hist)
       |SELECT n, n_pos,
       |  CAST(CAST(-1.0 * CAST(num AS DOUBLE)
       |    / (CAST(n AS DOUBLE) * 1e6) AS DECIMAL(38,4)) AS VARCHAR)
       |    AS logloss
       |FROM t""".stripMargin

  // ==== q337: Platt scaling ====================================================
  //
  // The PARAMETRIC member completing the calibration trio (q143/q244 bin
  // the reliability diagram, q245 fits the isotonic step function; Platt
  // fits the two-parameter sigmoid σ(A·s + B) — the right tool when the
  // miscalibration is a smooth squash/shift): minimize cross-entropy
  // against Platt's smoothed targets t₊ = (N₊+1)/(N₊+2), t₋ = 1/(N₋+2)
  // (his exact prior-correction — deterministic, no held-out split) by
  // K=25 Newton steps from A=0, B=ln((N₋+1)/(N₊+1)). The confidence has
  // ≤1001 distinct milli-values, so every gradient/Hessian moment is a
  // fold over the ≤2002-row (s, y) histogram — collected driver-side
  // (the q322/q327 bounded contract) and folded in ascending (s, y)
  // order; the oracle replays the identical fold via K unrolled
  // MATERIALIZED CTEs with five list_reduce moments per step and the
  // same closed 2×2 adjugate solve, singular guard included.

  private val PlattIters = 25

  /** One row: (n, n_pos, a_e6, b_e6, logloss_cal) — Platt parameters for
    * the stopword-fraction confidence against boolean `label`, plus the
    * calibrated cross-entropy against the RAW 0/1 labels. */
  def plattScaling(docs: DataFrame, label: String): DataFrame = {
    val s = docs.sparkSession
    val hist = confidenceBase(docs, label)
      .groupBy(col("s"), col("y")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("s"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nPos = hist.filter(_._2 == 1L).map(_._3).sum
    val nNeg = hist.filter(_._2 == 0L).map(_._3).sum
    val tPos = (nPos.toDouble + 1.0) / (nPos.toDouble + 2.0)
    val tNeg = 1.0 / (nNeg.toDouble + 2.0)
    var a = 0.0
    var b = math.log((nNeg.toDouble + 1.0) / (nPos.toDouble + 1.0))
    for (_ <- 1 to PlattIters) {
      var g1 = 0.0; var g2 = 0.0
      var h11 = 0.0; var h12 = 0.0; var h22 = 0.0
      hist.foreach { case (sv, y, cnt) =>
        val x = sv.toDouble / 1000.0
        val p = 1.0 / (1.0 + math.exp(-1.0 * (a * x + b)))
        val t = if (y == 1L) tPos else tNeg
        g1 += cnt.toDouble * (p - t) * x
        g2 += cnt.toDouble * (p - t)
        h11 += cnt.toDouble * p * (1.0 - p) * x * x
        h12 += cnt.toDouble * p * (1.0 - p) * x
        h22 += cnt.toDouble * p * (1.0 - p)
      }
      val det = h11 * h22 - h12 * h12
      if (det > 0) {
        val na = a - (h22 * g1 - h12 * g2) / det
        val nb = b - (h11 * g2 - h12 * g1) / det
        a = na; b = nb
      }
    }
    // calibrated log-loss vs raw labels: one more ordered fold, each
    // term ⌊10⁶·⌋-floored (the q335 discipline)
    var num = 0L
    hist.foreach { case (sv, y, cnt) =>
      val x = sv.toDouble / 1000.0
      val p = 1.0 / (1.0 + math.exp(-1.0 * (a * x + b)))
      val term = if (y == 1L) math.log(p) else math.log(1.0 - p)
      num += cnt * math.floor(1e6 * term).toLong
    }
    import s.implicits._
    Seq((nPos + nNeg, nPos,
      math.floor(1e6 * a).toLong, math.floor(1e6 * b).toLong,
      -1.0 * num.toDouble / ((nPos + nNeg).toDouble * 1e6)))
      .toDF("n", "n_pos", "a_e6", "b_e6", "ll")
      .select(col("n"), col("n_pos"), col("a_e6"), col("b_e6"),
        QueryDef.dec4(col("ll")).as("logloss_cal"))
  }

  private def q337(s: SparkSession, dir: String): DataFrame =
    plattScaling(Tables.documents(s, dir), "lang = 'en'")

  private val q337Sql = {
    val step = (i: Int) => {
      val a = s"w${i - 1}.a"; val b = s"w${i - 1}.b"
      def fold(term: String, as: String) =
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |        list($term ORDER BY s, y)), (acc, x) -> acc + x)
           |        AS $as""".stripMargin
      s"""p$i AS (
         |  SELECT s, y, cnt, $a AS a, $b AS b, tpos, tneg,
         |    CAST(s AS DOUBLE) / 1000.0 AS x,
         |    1.0 / (1.0 + exp(-1.0 * ($a * (CAST(s AS DOUBLE) / 1000.0)
         |      + $b))) AS p
         |  FROM hist CROSS JOIN w${i - 1} CROSS JOIN t),
         |w$i AS MATERIALIZED (
         |  SELECT CASE WHEN det > 0
         |      THEN a - (h22 * g1 - h12 * g2) / det ELSE a END AS a,
         |    CASE WHEN det > 0
         |      THEN b - (h11 * g2 - h12 * g1) / det ELSE b END AS b
         |  FROM (
         |    SELECT a, b, g1, g2, h11, h12, h22,
         |      h11 * h22 - h12 * h12 AS det
         |    FROM (
         |      SELECT a, b,
         |      ${fold("CAST(cnt AS DOUBLE) * (p - CASE WHEN y = 1" +
                " THEN tpos ELSE tneg END) * x", "g1")},
         |      ${fold("CAST(cnt AS DOUBLE) * (p - CASE WHEN y = 1" +
                " THEN tpos ELSE tneg END)", "g2")},
         |      ${fold("CAST(cnt AS DOUBLE) * p * (1.0 - p) * x * x",
                "h11")},
         |      ${fold("CAST(cnt AS DOUBLE) * p * (1.0 - p) * x", "h12")},
         |      ${fold("CAST(cnt AS DOUBLE) * p * (1.0 - p)", "h22")}
         |      FROM p$i GROUP BY a, b)))""".stripMargin
    }
    s"""WITH base AS (
       |  $confidenceBaseSql),
       |hist AS MATERIALIZED (
       |  SELECT s, y, count(*) AS cnt FROM base GROUP BY 1, 2),
       |np AS (
       |  SELECT CAST(sum(CASE WHEN y = 1 THEN cnt ELSE 0 END) AS BIGINT)
       |      AS npos,
       |    CAST(sum(CASE WHEN y = 0 THEN cnt ELSE 0 END) AS BIGINT)
       |      AS nneg
       |  FROM hist),
       |t AS MATERIALIZED (
       |  SELECT npos, nneg,
       |    (CAST(npos AS DOUBLE) + 1.0) / (CAST(npos AS DOUBLE) + 2.0)
       |      AS tpos,
       |    1.0 / (CAST(nneg AS DOUBLE) + 2.0) AS tneg
       |  FROM np),
       |w0 AS (
       |  SELECT CAST(0.0 AS DOUBLE) AS a,
       |    ln((CAST(nneg AS DOUBLE) + 1.0) / (CAST(npos AS DOUBLE) + 1.0))
       |      AS b
       |  FROM t),
       |${(1 to PlattIters).map(step).mkString(",\n")},
       |ll AS (
       |  SELECT list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list(CAST(cnt AS HUGEINT) * CAST(floor(1e6 *
       |        CASE WHEN y = 1
       |          THEN ln(1.0 / (1.0 + exp(-1.0
       |            * (w.a * (CAST(s AS DOUBLE) / 1000.0) + w.b))))
       |          ELSE ln(1.0 - 1.0 / (1.0 + exp(-1.0
       |            * (w.a * (CAST(s AS DOUBLE) / 1000.0) + w.b)))) END)
       |        AS BIGINT) ORDER BY s, y)),
       |      (acc, x) -> acc + x) AS num,
       |    max(w.a) AS a, max(w.b) AS b
       |  FROM hist CROSS JOIN w$PlattIters w)
       |SELECT npos + nneg AS n, npos AS n_pos,
       |  CAST(floor(1e6 * ll.a) AS BIGINT) AS a_e6,
       |  CAST(floor(1e6 * ll.b) AS BIGINT) AS b_e6,
       |  CAST(CAST(-1.0 * CAST(ll.num AS DOUBLE)
       |    / (CAST(npos + nneg AS DOUBLE) * 1e6) AS DECIMAL(38,4))
       |    AS VARCHAR) AS logloss_cal
       |FROM ll CROSS JOIN t""".stripMargin
  }

  // ==== q245: isotonic (PAV) calibration over confidence bins ===============
  //
  // The FIX for what q244's ECE measures: fit the best monotone
  // non-decreasing calibration map raw-confidence-bin → P(y=1). Pool
  // Adjacent Violators is inherently sequential, but its solution has a
  // closed minimax form — ŷ_i = max_{j≤i} min_{k≥i} avg(pos, n over bins
  // j..k) (Robertson–Wright–Dykstra; PAV's pooled blocks are exactly the
  // argmin/argmax intervals) — which IS expressible as joins when the fit
  // runs on the BIN domain: with B = 10 bins there are 55 intervals and
  // ≤ 10·55 (i, interval) pairs, all broadcast-sized. Scale shape: ONE
  // corpus pass (the shared q244 projection + 10-bin groupBy); the
  // minimax runs on domain-sized frames. Interval averages divide exact
  // ≤2⁵³ integers — correctly-rounded identical doubles in both engines,
  // so min/max pick identical values.

  /** Per confidence bin: (bin, n, pos, raw_rate, iso_rate) with iso_rate
    * the PAV-fitted monotone positive rate. */
  def isotonicCalibration(docs: DataFrame, label: String): DataFrame = {
    val bins = confidenceBase(docs, label)
      .groupBy(least(expr("s DIV 100"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n_b"), sum(col("y")).as("pos_b"))
    val iv = broadcast(bins.select(col("bin").as("j")))
      .join(broadcast(bins.select(col("bin").as("k"))), col("j") <= col("k"))
    val ivAgg = iv
      .join(broadcast(bins), col("bin").between(col("j"), col("k")))
      .groupBy(col("j"), col("k"))
      .agg((sum(col("pos_b")).cast("double") /
        sum(col("n_b")).cast("double")).as("avg_r"))
    val minK = ivAgg
      .join(broadcast(bins.select(col("bin").as("i"))),
        col("j") <= col("i") && col("i") <= col("k"))
      .groupBy(col("i"), col("j")).agg(min(col("avg_r")).as("mn"))
    val iso = minK.groupBy(col("i")).agg(max(col("mn")).as("iso"))
    bins.join(broadcast(iso), col("bin") === col("i"))
      .select(col("bin"), col("n_b").as("n"), col("pos_b").as("pos"),
        QueryDef.dec4(col("pos_b").cast("double") /
          col("n_b").cast("double")).as("raw_rate"),
        QueryDef.dec4(col("iso")).as("iso_rate"))
      .orderBy(col("bin"))
  }

  private def q245(s: SparkSession, dir: String): DataFrame =
    isotonicCalibration(Tables.documents(s, dir), "lang = 'en'")

  private val q245Sql =
    s"""WITH base AS (
       |  $confidenceBaseSql),
       |bins AS (
       |  SELECT least(s // 100, 9) AS bin, count(*) AS n_b,
       |    CAST(sum(y) AS BIGINT) AS pos_b
       |  FROM base GROUP BY 1),
       |iv AS (
       |  SELECT a.bin AS j, b.bin AS k
       |  FROM bins a JOIN bins b ON a.bin <= b.bin),
       |ivagg AS (
       |  SELECT j, k, CAST(sum(pos_b) AS DOUBLE)
       |      / CAST(sum(n_b) AS DOUBLE) AS avg_r
       |  FROM iv JOIN bins ON bins.bin BETWEEN iv.j AND iv.k
       |  GROUP BY j, k),
       |mink AS (
       |  SELECT d.bin AS i, j, min(avg_r) AS mn
       |  FROM ivagg JOIN bins d ON ivagg.j <= d.bin AND d.bin <= ivagg.k
       |  GROUP BY d.bin, j),
       |iso AS (SELECT i, max(mn) AS iso FROM mink GROUP BY i)
       |SELECT bin, n_b AS n, pos_b AS pos,
       |  CAST(CAST(CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS raw_rate,
       |  CAST(CAST(iso AS DECIMAL(38,4)) AS VARCHAR) AS iso_rate
       |FROM bins JOIN iso ON bins.bin = iso.i
       |ORDER BY bin""".stripMargin

  // ==== q269: grouped nDCG@k — graded-relevance ranking quality =============
  //
  // The ranking metric q186's binary AP can't express: graded relevance
  // discounted by position, nDCG@k = DCG@k / IDCG@k with
  // DCG = Σ_{i≤k} rel_i · 1/log2(i+1). The discounts are the ONLY
  // transcendental — and there are exactly k of them — so they are
  // compile-time ⌊10⁹/log2(i+1)⌋ integer literals (the q246/q262 no-CDF
  // rule), embedded in BOTH engines from the same Scala array (the q133
  // generated-twin discipline). DCG and IDCG are then exact integer
  // sums; nDCG is one division of identical BIGINTs.
  //
  // Determinism: ranking ties break on the id column (q141/q186 rule);
  // the IDEAL ranking orders by rel desc — tie order within equal rel is
  // irrelevant because equal rel × equal weight sums commute exactly.
  // Scale shape: two per-group windows over member rows (group-sized,
  // the q186 contract), one groupBy; nothing corpus-wide.

  /** ⌊10⁹/log2(i+1)⌋ for rank i = 1..k — exact integer DCG weights. */
  private[operators] def dcgWeights(k: Int): Seq[Long] =
    (1 to k).map(i => math.floor(1e9 / (math.log(i + 1) / math.log(2))).toLong)

  /** Per group: (n, dcg_micro, idcg_micro, ndcg) at cutoff `k`, ranking
    * by `score` desc (ties on `id`), graded relevance column `rel`. */
  def groupedNdcg(df: DataFrame, group: String, score: String, id: String,
      rel: Column, k: Int = 10): DataFrame = {
    val ws = dcgWeights(k)
    val wArr = array(ws.map(lit): _*)
    val ranked = Window.partitionBy(col(group))
      .orderBy(col(score).desc, col(id))
    val ideal = Window.partitionBy(col(group))
      .orderBy(col("r").desc, col(id))
    val base = df.select(col(group), col(score), col(id),
        rel.cast("long").as("r"))
      .withColumn("rn", row_number().over(ranked))
      .withColumn("irn", row_number().over(ideal))
    base.groupBy(col(group))
      .agg(count(lit(1)).as("n"),
        sum(when(col("rn") <= k,
          col("r") * element_at(wArr, col("rn"))).otherwise(0L))
          .as("dcg_micro"),
        sum(when(col("irn") <= k,
          col("r") * element_at(wArr, col("irn"))).otherwise(0L))
          .as("idcg_micro"))
      .select(col(group), col("n"), col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") > 0,
          col("dcg_micro").cast("double") / col("idcg_micro").cast("double"))
          .as("ndcg"))
  }

  private def relGrade = expr(
    "CASE WHEN lang = 'en' THEN 3 WHEN lang IN ('fr','de') THEN 2 " +
      "WHEN lang = 'es' THEN 1 ELSE 0 END")

  private def q269(s: SparkSession, dir: String): DataFrame =
    groupedNdcg(Tables.documents(s, dir), "source", "n_chars", "doc_id",
      relGrade, k = 10)
      .select(col("source"), col("n"), col("dcg_micro"), col("idcg_micro"),
        QueryDef.dec4(col("ndcg")).as("ndcg"))
      .orderBy(col("source"))

  private val q269Sql = {
    val cases = dcgWeights(10).zipWithIndex
      .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }.mkString(" ")
    s"""WITH base AS (
       |  SELECT source,
       |    CASE WHEN lang = 'en' THEN 3 WHEN lang IN ('fr','de') THEN 2
       |      WHEN lang = 'es' THEN 1 ELSE 0 END AS r,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id) AS rn,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY (CASE WHEN lang = 'en' THEN 3
       |        WHEN lang IN ('fr','de') THEN 2
       |        WHEN lang = 'es' THEN 1 ELSE 0 END) DESC, doc_id) AS irn
       |  FROM documents)
       |SELECT source, count(*) AS n,
       |  CAST(sum(CASE WHEN rn <= 10
       |    THEN CAST(r AS BIGINT) * (CASE rn $cases END) ELSE 0 END)
       |    AS BIGINT) AS dcg_micro,
       |  CAST(sum(CASE WHEN irn <= 10
       |    THEN CAST(r AS BIGINT) * (CASE irn $cases END) ELSE 0 END)
       |    AS BIGINT) AS idcg_micro,
       |  CAST(CAST(CASE WHEN sum(CASE WHEN irn <= 10
       |      THEN CAST(r AS BIGINT) * (CASE irn $cases END) ELSE 0 END) > 0
       |    THEN CAST(sum(CASE WHEN rn <= 10
       |        THEN CAST(r AS BIGINT) * (CASE rn $cases END) ELSE 0 END)
       |        AS DOUBLE)
       |      / CAST(sum(CASE WHEN irn <= 10
       |        THEN CAST(r AS BIGINT) * (CASE irn $cases END) ELSE 0 END)
       |        AS DOUBLE)
       |    END AS DECIMAL(38,4)) AS VARCHAR) AS ndcg
       |FROM base GROUP BY source ORDER BY source""".stripMargin
  }

  // ==== q270: conformal outlier detection with BH FDR control ===============
  //
  // Closes the q191 conformal story into MULTIPLE testing: each test doc
  // gets a conformal p-value against a calibration split — p(x) =
  // (1 + #{cal ≥ x}) / (n_cal + 1), the rank-based, distribution-free,
  // CDF-free p — and Benjamini–Hochberg selects the rejection set with
  // guaranteed FDR ≤ α (for conformal p-values BH's FDR control is exact;
  // Bates et al. 2023). The one-sided score here is the value itself
  // ("unusually large n_chars").
  //
  // All-integer BH: p-values and ranks live on the DISTINCT-VALUE domain
  // (p is monotone in x, so a tie group's max BH rank is just the count
  // of test docs ≥ x) — #cal ≥ x and #test ≥ x come from the q131
  // exclusive prefix scan over the range-partitioned value histogram; the
  // BH inequality p_(i) ≤ i·α/m cross-multiplies to
  // 10·p_num·m ≤ T·(n_cal+1) at α = 1/10 — exact DECIMAL products (the
  // q242/q256 overflow rule), no doubles anywhere. Rejection is by
  // threshold VALUE (all test docs ≥ v*), so ties can never straddle the
  // cut differently across engines.

  /** One row: (n_cal, m, n_rejected, thr_value) — BH at level
    * `alphaNum`/`alphaDen` over one-sided conformal p-values of `valueCol`,
    * calibration = rows where `calSide`, test = rows where `testSide`. */
  def conformalBhOutliers(df: DataFrame, valueCol: String, calSide: Column,
      testSide: Column, alphaNum: Long = 1L, alphaDen: Long = 10L)
      : DataFrame = {
    val counts = df
      .select(col(valueCol).as("v"),
        when(calSide, 1L).otherwise(0L).as("c"),
        when(testSide, 1L).otherwise(0L).as("t"))
      .filter(col("c") === 1L || col("t") === 1L)
      .groupBy(col("v"))
      .agg(sum(col("c")).as("cc"), sum(col("t")).as("tc"))
    val scanned = graft.chunk.ChunkAssigner.withPrefixSum(
      graft.chunk.ChunkAssigner.withPrefixSum(
        counts, Seq(col("v")), col("cc"), outName = "pc"),
      Seq(col("v")), col("tc"), outName = "pt")
    val totals = broadcast(counts.agg(sum(col("cc")).as("ncal"),
      sum(col("tc")).as("m")))
    // p_num(v) = 1 + #cal ≥ v; T(v) = #test ≥ v = the max BH rank of v's
    // tie group (p is monotone decreasing in v)
    val rows = scanned.crossJoin(totals)
      .select(col("v"), col("ncal"), col("m"),
        (lit(1L) + col("ncal") - col("pc")).as("p_num"),
        (col("m") - col("pt")).as("t_rank"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val rejected = rows.filter(col("t_rank") > 0 &&
      dec(col("p_num")) * lit(alphaDen) * dec(col("m")) <=
        dec(col("t_rank")) * lit(alphaNum) * dec(col("ncal") + lit(1L)))
    rejected
      .groupBy(col("ncal"), col("m"))
      .agg(max(col("t_rank")).as("n_rejected"), min(col("v")).as("thr_value"))
      .unionByName(
        // no rejections: still report the split sizes (the empty-BH row)
        totals.select(col("ncal"), col("m"), lit(0L).as("n_rejected"),
          lit(null).cast(counts.schema("v").dataType).as("thr_value")))
      .orderBy(col("n_rejected").desc)
      .limit(1)
      .select(col("ncal").as("n_cal"), col("m"), col("n_rejected"),
        col("thr_value"))
  }

  private def q270(s: SparkSession, dir: String): DataFrame =
    conformalBhOutliers(Tables.documents(s, dir), "n_chars",
      pmod(col("doc_id"), lit(4)) === 3, pmod(col("doc_id"), lit(4)) === 0)

  private val q270Sql =
    """WITH counts AS (
      |  SELECT n_chars AS v,
      |    CAST(sum(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cc,
      |    CAST(sum(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS tc
      |  FROM documents WHERE doc_id % 4 IN (0, 3) GROUP BY 1),
      |cdf AS (
      |  SELECT v, cc, tc,
      |    COALESCE(sum(cc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND 1 PRECEDING), 0) AS pc,
      |    COALESCE(sum(tc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND 1 PRECEDING), 0) AS pt
      |  FROM counts),
      |t AS (SELECT CAST(sum(cc) AS BIGINT) AS ncal,
      |  CAST(sum(tc) AS BIGINT) AS m FROM counts),
      |r AS (
      |  SELECT v, ncal, m, 1 + ncal - pc AS p_num, m - pt AS t_rank
      |  FROM cdf CROSS JOIN t),
      |rej AS (
      |  SELECT ncal, m, max(t_rank) AS n_rejected, min(v) AS thr_value
      |  FROM r
      |  WHERE t_rank > 0 AND CAST(p_num AS HUGEINT) * 10 * m
      |    <= CAST(t_rank AS HUGEINT) * 1 * (ncal + 1)
      |  GROUP BY 1, 2),
      |fallback AS (
      |  SELECT ncal, m, CAST(0 AS BIGINT) AS n_rejected,
      |    CAST(NULL AS BIGINT) AS thr_value FROM t)
      |SELECT CAST(ncal AS BIGINT) AS n_cal, CAST(m AS BIGINT) AS m,
      |  CAST(n_rejected AS BIGINT) AS n_rejected,
      |  CAST(thr_value AS BIGINT) AS thr_value FROM (
      |  SELECT * FROM rej UNION ALL SELECT * FROM fallback)
      |ORDER BY n_rejected DESC LIMIT 1""".stripMargin

  // ==== q289: cumulative gains / lift at deciles =============================
  //
  // The campaign-targeting readout (gains chart): sort by model score
  // descending, cut into population deciles, report each decile's
  // cumulative share of all positives and its lift over random. Rank is
  // over the UNIQUE total order (score desc, id asc) — ties never
  // straddle a boundary differently across engines — assigned by the
  // q100/q122 distributed prefix scan (no single-partition global-sort
  // window); decile = rank·10 div n and every downstream number is
  // decile-domain integer arithmetic (lift cross-multiplies exact
  // integers, one double division per decile row).

  /** Per decile (0..9): (decile, n_d, pos_d, cum_pos, gain, lift) for
    * score `s` (higher = more likely positive) against 0/1 `y`. */
  def cumulativeGains(scored: DataFrame): DataFrame = {
    val ranked = graft.chunk.ChunkAssigner.withPrefixSum(
      scored.select((-col("s")).as("negs"), col("id"), col("y")),
      Seq(col("negs"), col("id")), lit(1L), outName = "rk")
    val totals = broadcast(scored.agg(count(lit(1)).as("n"),
      sum(col("y")).as("pos")))
    val dec = ranked.crossJoin(totals)
      .select(expr("rk * 10 div n").as("decile"), col("y"), col("n"),
        col("pos"))
      .groupBy(col("decile"), col("n"), col("pos"))
      .agg(count(lit(1)).as("n_d"), sum(col("y")).as("pos_d"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec
      .withColumn("cum_pos", sum(col("pos_d")).over(w))
      .withColumn("cum_n", sum(col("n_d")).over(w))
      .select(col("decile"), col("n_d"), col("pos_d"), col("cum_pos"),
        when(col("pos") > 0, col("cum_pos").cast("double") /
          col("pos").cast("double")).as("gain"),
        when(col("pos") > 0 && col("cum_n") > 0,
          (col("cum_pos").cast("decimal(38,0)") * col("n")).cast("double") /
            (col("cum_n").cast("decimal(38,0)") * col("pos")).cast("double"))
          .as("lift"))
  }

  private def q289(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // score = the q244 stopword-fraction confidence, per doc
    val t = Tok.ws(col("text"))
    val base = docs.select(col("doc_id").as("id"),
      when(size(t) > 0,
        floor(lit(1000.0) *
          size(filter(t, x => x.isin(TextAnalysis.stopwords: _*))) /
          size(t)).cast("long")).otherwise(0L).as("s"),
      when(expr("lang = 'en'"), 1L).otherwise(0L).as("y"))
    cumulativeGains(base)
      .select(col("decile"), col("n_d"), col("pos_d"), col("cum_pos"),
        QueryDef.dec4(col("gain")).as("gain"),
        QueryDef.dec4(col("lift")).as("lift"))
      .orderBy(col("decile"))
  }

  private val q289Sql =
    """WITH base AS (
      |  SELECT doc_id AS id,
      |    CASE WHEN len(toks) > 0 THEN CAST(floor(1000.0 *
      |      len(list_filter(toks, x -> x IN ('the','a','and','of','to')))
      |      / len(toks)) AS BIGINT)
      |      ELSE 0 END AS s,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM (SELECT doc_id, lang, list_filter(string_split(text, ' '),
      |      x -> x <> '') AS toks FROM documents)),
      |rk AS (
      |  SELECT y, row_number() OVER (ORDER BY -s, id) - 1 AS rk
      |  FROM base),
      |t AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS pos FROM base),
      |d AS (
      |  SELECT (rk * 10) // n AS decile, count(*) AS n_d,
      |    CAST(sum(y) AS BIGINT) AS pos_d, max(n) AS n, max(pos) AS pos
      |  FROM rk CROSS JOIN t GROUP BY 1),
      |c AS (
      |  SELECT decile, n_d, pos_d, n, pos,
      |    sum(pos_d) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS cum_pos,
      |    sum(n_d) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS cum_n
      |  FROM d)
      |SELECT decile, n_d, CAST(pos_d AS BIGINT) AS pos_d,
      |  CAST(cum_pos AS BIGINT) AS cum_pos,
      |  CAST(CAST(CASE WHEN pos > 0 THEN CAST(cum_pos AS DOUBLE)
      |    / CAST(pos AS DOUBLE) END AS DECIMAL(38,4)) AS VARCHAR) AS gain,
      |  CAST(CAST(CASE WHEN pos > 0 AND cum_n > 0
      |    THEN CAST(CAST(cum_pos AS HUGEINT) * n AS DOUBLE)
      |      / CAST(CAST(cum_n AS HUGEINT) * pos AS DOUBLE) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS lift
      |FROM c ORDER BY decile""".stripMargin

  // ==== q290: conformal outliers under Holm step-down (FWER) ================
  //
  // The FWER companion to q270's BH-FDR: Holm rejects p_(1..i) while
  // p_(i) ≤ α/(m−i+1) and STOPS at the first failure — controlling the
  // probability of even one false outlier (the regime for "page an
  // on-call human per rejection"). On the distinct-value domain p is
  // monotone in v, so a tie group rejects iff its condition holds at its
  // max rank T(v) AND every smaller-p group qualifies; the step-down
  // prefix conjunction collapses to ONE aggregate — v_fail = max v over
  // failing groups (everything above it qualifies by monotonicity of
  // both sides), rejected = test docs with v > v_fail. Same all-integer
  // cross-multiplied inequality as q270.

  /** One row: (n_cal, m, n_rejected, thr_value) — Holm step-down at
    * level `alphaNum`/`alphaDen` over the same one-sided conformal
    * p-values as [[conformalBhOutliers]]. */
  def conformalHolmOutliers(df: DataFrame, valueCol: String,
      calSide: Column, testSide: Column, alphaNum: Long = 1L,
      alphaDen: Long = 10L): DataFrame = {
    val fixed = df
      .select(col(valueCol).as("v"),
        when(calSide, 1L).otherwise(0L).as("c"),
        when(testSide, 1L).otherwise(0L).as("t"))
      .filter(col("c") === 1L || col("t") === 1L)
      .groupBy(col("v"))
      .agg(sum(col("c")).as("cc"), sum(col("t")).as("tc"))
    val scanned = graft.chunk.ChunkAssigner.withPrefixSum(
      graft.chunk.ChunkAssigner.withPrefixSum(
        fixed, Seq(col("v")), col("cc"), outName = "pc"),
      Seq(col("v")), col("tc"), outName = "pt")
    val totals = broadcast(fixed.agg(sum(col("cc")).as("ncal"),
      sum(col("tc")).as("m")))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val rows = scanned.crossJoin(totals)
      .filter(col("tc") > 0) // only tie groups holding test docs rank
      .select(col("v"), col("ncal"), col("m"),
        (lit(1L) + col("ncal") - col("pc")).as("p_num"),
        (col("m") - col("pt")).as("t_rank"))
    // Holm condition at the group's max rank i = T(v):
    //   p_num/(ncal+1) ≤ αnum/(αden·(m − T + 1))
    val fails = rows.filter(
      dec(col("p_num")) * lit(alphaDen) *
        dec(col("m") - col("t_rank") + lit(1L)) >
        lit(alphaNum) * dec(col("ncal") + lit(1L)))
    val vFail = fails.groupBy(col("ncal"), col("m"))
      .agg(max(col("v")).as("v_fail"))
    rows.join(vFail, Seq("ncal", "m"), "left")
      .filter(col("v_fail").isNull || col("v") > col("v_fail"))
      .groupBy(col("ncal"), col("m"))
      .agg(max(col("t_rank")).as("n_rejected"), min(col("v")).as("thr_value"))
      .unionByName(
        totals.select(col("ncal"), col("m"), lit(0L).as("n_rejected"),
          lit(null).cast(fixed.schema("v").dataType).as("thr_value")))
      .orderBy(col("n_rejected").desc)
      .limit(1)
      .select(col("ncal").as("n_cal"), col("m"), col("n_rejected"),
        col("thr_value"))
  }

  private def q290(s: SparkSession, dir: String): DataFrame =
    conformalHolmOutliers(Tables.documents(s, dir), "n_chars",
      pmod(col("doc_id"), lit(4)) === 3, pmod(col("doc_id"), lit(4)) === 0)

  private val q290Sql =
    """WITH counts AS (
      |  SELECT n_chars AS v,
      |    CAST(sum(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cc,
      |    CAST(sum(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS tc
      |  FROM documents WHERE doc_id % 4 IN (0, 3) GROUP BY 1),
      |cdf AS (
      |  SELECT v, cc, tc,
      |    COALESCE(sum(cc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND 1 PRECEDING), 0) AS pc,
      |    COALESCE(sum(tc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND 1 PRECEDING), 0) AS pt
      |  FROM counts),
      |t AS (SELECT CAST(sum(cc) AS BIGINT) AS ncal,
      |  CAST(sum(tc) AS BIGINT) AS m FROM counts),
      |r AS (
      |  SELECT v, ncal, m, 1 + ncal - pc AS p_num, m - pt AS t_rank
      |  FROM cdf CROSS JOIN t WHERE tc > 0),
      |vf AS (
      |  SELECT ncal, m, max(v) AS v_fail FROM r
      |  WHERE CAST(p_num AS HUGEINT) * 10 * (m - t_rank + 1)
      |    > 1 * CAST(ncal + 1 AS HUGEINT)
      |  GROUP BY 1, 2),
      |rej AS (
      |  SELECT r.ncal, r.m, max(t_rank) AS n_rejected, min(v) AS thr_value
      |  FROM r LEFT JOIN vf ON vf.ncal = r.ncal AND vf.m = r.m
      |  WHERE vf.v_fail IS NULL OR r.v > vf.v_fail
      |  GROUP BY 1, 2),
      |fallback AS (
      |  SELECT ncal, m, CAST(0 AS BIGINT) AS n_rejected,
      |    CAST(NULL AS BIGINT) AS thr_value FROM t)
      |SELECT CAST(ncal AS BIGINT) AS n_cal, CAST(m AS BIGINT) AS m,
      |  CAST(n_rejected AS BIGINT) AS n_rejected,
      |  CAST(thr_value AS BIGINT) AS thr_value FROM (
      |  SELECT * FROM rej UNION ALL SELECT * FROM fallback)
      |ORDER BY n_rejected DESC LIMIT 1""".stripMargin

  // ==== q310: Hosmer–Lemeshow goodness-of-fit =================================
  //
  // The TEST q244's ECE only summarizes: per score bin, compare observed
  // positives O_b to expected E_b = Σs/1000 and aggregate HL =
  // Σ (O_b−E_b)² / (n_b·p̄_b(1−p̄_b)) — the classical calibration
  // chi-square (df = bins−2). Exactness: with milli-unit scores the
  // per-bin term collapses to the INTEGER ratio (1000·O−ssum)²·n /
  // (ssum·(1000n−ssum)); each term is ⌊10⁶·term⌋-floored ONCE so the
  // bin sum is exact (10 bins — but floored sums are order-free at any
  // width). Degenerate all-0/all-1 bins are excluded and counted, the
  // standard HL practice. Shares q244's projection and bin pass.

  /** One row: (n, n_bins_used, n_bins_degenerate, hl_micro) over the
    * stopword-confidence score vs `label`. */
  def hosmerLemeshow(docs: DataFrame, label: String): DataFrame = {
    val base = confidenceBase(docs, label)
    def d0(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val bins = base
      .groupBy(least(expr("s DIV 100"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n_b"), sum(col("y")).as("o_b"),
        sum(col("s")).as("ssum_b"))
    val terms = bins
      .withColumn("a", d0(lit(1000L) * col("o_b") - col("ssum_b")))
      .withColumn("den", d0(col("ssum_b")) *
        (d0(lit(1000L) * col("n_b")) - col("ssum_b")))
      .withColumn("hl_b", when(col("den") > 0,
        floor(lit(1e6) * (col("a") * col("a") * d0(col("n_b")))
          .cast("double") / col("den").cast("double")).cast("long")))
    terms.agg(sum(col("n_b")).as("n"),
      sum(when(col("hl_b").isNotNull, 1L).otherwise(0L)).as("n_bins_used"),
      sum(when(col("hl_b").isNull, 1L).otherwise(0L))
        .as("n_bins_degenerate"),
      sum(col("hl_b")).as("hl_micro"))
  }

  private def q310(s: SparkSession, dir: String): DataFrame =
    hosmerLemeshow(Tables.documents(s, dir), "lang = 'en'")

  private val q310Sql =
    s"""WITH base AS (
       |  ${confidenceBaseSql.replace("\n", "\n  ")}),
       |bins AS (
       |  SELECT least(s // 100, 9) AS bin, count(*) AS n_b,
       |    CAST(sum(y) AS BIGINT) AS o_b, CAST(sum(s) AS BIGINT) AS ssum_b
       |  FROM base GROUP BY 1),
       |terms AS (
       |  SELECT n_b,
       |    CASE WHEN CAST(ssum_b AS HUGEINT)
       |        * (1000 * CAST(n_b AS HUGEINT) - ssum_b) > 0
       |      THEN CAST(floor(1e6 * CAST((1000 * CAST(o_b AS HUGEINT)
       |          - ssum_b) * (1000 * CAST(o_b AS HUGEINT) - ssum_b)
       |          * n_b AS DOUBLE)
       |        / CAST(CAST(ssum_b AS HUGEINT)
       |          * (1000 * CAST(n_b AS HUGEINT) - ssum_b) AS DOUBLE))
       |        AS BIGINT) END AS hl_b
       |  FROM bins)
       |SELECT CAST(sum(n_b) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN hl_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bins_used,
       |  CAST(sum(CASE WHEN hl_b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bins_degenerate,
       |  CAST(sum(hl_b) AS BIGINT) AS hl_micro
       |FROM terms""".stripMargin

  // ==== q346: DeLong test — comparing two correlated AUCs ===================
  //
  // The question q140 cannot answer: model A scores AUC 0.71, model B
  // 0.73 ON THE SAME ITEMS — is that real? Two AUCs on one test set are
  // CORRELATED, so naive per-AUC variances overstate the difference's
  // significance. DeLong (1988): per-item structural components
  // V10(i) = P(neg < s_i) (midrank form) for positives, V01(j) for
  // negatives; AUC = mean(V10); var(AUC₁−AUC₂) = [S10₁₁+S10₂₂−2·S10₁₂]/n
  // + [S01₁₁+S01₂₂−2·S01₁₂]/m with S·_kl the empirical covariances.
  // Exactness: the component is kept ×2m as the INTEGER
  // u = 2·(#neg < s) + (#neg = s) (and v likewise ×2n) — every moment is
  // an exact DECIMAL(38,0) sum; the covariance/variance/z algebra is one
  // spelled double chain at render. Scale shape: two value-domain
  // histograms with prefix windows (the q140 discipline), one
  // co-partitioned item join, one map-side-combined moment pass — no
  // quadratic pair comparison anywhere.

  /** One row: (n_pos, n_neg, su1, su2, auc1, auc2, z) comparing the
    * AUCs of integer scores `s1`/`s2` for 0/1 label `y` on `items`. */
  def delongCompare(items: DataFrame): DataFrame = {
    def d0(c: Column) = c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    val tot = broadcast(items.agg(sum(col("y")).as("npos")))
    // prefix counts over the score histogram run through the
    // DISTRIBUTED prefix-sum scan — score domains (lengths, token
    // counts) grow with the corpus, so no global single-partition
    // window (the q122/q191 rule)
    def uv(k: String) = {
      val h = items.groupBy(col(k).as("s"))
        .agg(count(lit(1)).as("c"), sum(col("y")).as("pos"))
      val h2 = graft.chunk.ChunkAssigner.withPrefixSum(
        graft.chunk.ChunkAssigner.withPrefixSum(
          h, Seq(col("s")), col("c"), "cumc"),
        Seq(col("s")), col("pos"), "cumpos")
      h2.crossJoin(tot)
        .select(col("s").as(k),
          (lit(2L) * (col("cumc") - col("cumpos")) +
            (col("c") - col("pos"))).as(s"u_$k"),
          (lit(2L) * (col("npos") - col("cumpos") - col("pos")) +
            col("pos")).as(s"v_$k"))
    }
    val joined = items.join(uv("s1"), Seq("s1")).join(uv("s2"), Seq("s2"))
    val pos = (c: Column) => when(col("y") === 1L, c)
    val neg = (c: Column) => when(col("y") === 0L, c)
    val m = joined.agg(
      sum(col("y")).as("n"), sum(lit(1L) - col("y")).as("m"),
      sum(pos(col("u_s1"))).as("su1"), sum(pos(col("u_s2"))).as("su2"),
      sum(pos(d0(col("u_s1")) * col("u_s1"))).as("puu11"),
      sum(pos(d0(col("u_s2")) * col("u_s2"))).as("puu22"),
      sum(pos(d0(col("u_s1")) * col("u_s2"))).as("puu12"),
      sum(neg(col("v_s1"))).as("sv1"), sum(neg(col("v_s2"))).as("sv2"),
      sum(neg(d0(col("v_s1")) * col("v_s1"))).as("pvv11"),
      sum(neg(d0(col("v_s2")) * col("v_s2"))).as("pvv22"),
      sum(neg(d0(col("v_s1")) * col("v_s2"))).as("pvv12"))
    def cov(p: String, sa: String, sb: String, nn: String) =
      (dd(col(p)) - dd(col(sa)) * dd(col(sb)) / dd(col(nn))) /
        (dd(col(nn)) - lit(1.0))
    val s10 = (kl: (String, String)) =>
      cov(s"puu${kl._1}${kl._2}", s"su${kl._1}", s"su${kl._2}", "n") /
        (lit(4.0) * dd(col("m")) * dd(col("m")))
    val s01 = (kl: (String, String)) =>
      cov(s"pvv${kl._1}${kl._2}", s"sv${kl._1}", s"sv${kl._2}", "m") /
        (lit(4.0) * dd(col("n")) * dd(col("n")))
    val varD =
      (s10(("1", "1")) + s10(("2", "2")) - lit(2.0) * s10(("1", "2"))) /
        dd(col("n")) +
      (s01(("1", "1")) + s01(("2", "2")) - lit(2.0) * s01(("1", "2"))) /
        dd(col("m"))
    def auc(k: String) =
      dd(col(s"su$k")) / (lit(2.0) * dd(col("n")) * dd(col("m")))
    m.select(col("n").as("n_pos"), col("m").as("n_neg"),
      col("su1"), col("su2"),
      QueryDef.dec4(auc("1")).as("auc1"),
      QueryDef.dec4(auc("2")).as("auc2"),
      QueryDef.dec4(when(varD > 0,
        (auc("1") - auc("2")) / sqrt(varD))).as("z"))
  }

  // predictor 1: n_chars; predictor 2: whitespace token count — two
  // correlated length proxies for "is this English", exactly the
  // correlated-predictor regime DeLong exists for
  private def q346(s: SparkSession, dir: String): DataFrame =
    delongCompare(Tables.documents(s, dir).select(
      when(col("lang") === "en", 1L).otherwise(0L).as("y"),
      col("n_chars").cast("long").as("s1"),
      size(split(col("text"), " ")).cast("long").as("s2")))

  private val q346Sql = {
    def uvSql(k: String) =
      s"""h_$k AS (
         |  SELECT $k AS s, CAST(count(*) AS BIGINT) AS c,
         |    CAST(sum(y) AS BIGINT) AS pos
         |  FROM items GROUP BY 1),
         |uv_$k AS (
         |  SELECT s AS $k,
         |    2 * (cumc - cumpos) + (c - pos) AS u_$k,
         |    2 * ((SELECT npos FROM tot) - cumpos - pos) + pos AS v_$k
         |  FROM (
         |    SELECT *,
         |      CAST(coalesce(sum(c) OVER (ORDER BY s
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |        AS BIGINT) AS cumc,
         |      CAST(coalesce(sum(pos) OVER (ORDER BY s
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |        AS BIGINT) AS cumpos
         |    FROM h_$k))""".stripMargin
    def cov(p: String, sa: String, sb: String, nn: String) =
      s"""((CAST($p AS DOUBLE) - CAST($sa AS DOUBLE)
         | * CAST($sb AS DOUBLE) / CAST($nn AS DOUBLE))
         | / (CAST($nn AS DOUBLE) - 1.0))""".stripMargin
        .replace("\n", " ")
    def s10(a: String, b: String) =
      s"(${cov(s"puu$a$b", s"su$a", s"su$b", "n")}" +
        " / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))"
    def s01(a: String, b: String) =
      s"(${cov(s"pvv$a$b", s"sv$a", s"sv$b", "m")}" +
        " / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
    val varD =
      s"((${s10("1", "1")} + ${s10("2", "2")} - 2.0 * ${s10("1", "2")})" +
        s" / CAST(n AS DOUBLE)" +
        s" + (${s01("1", "1")} + ${s01("2", "2")}" +
        s" - 2.0 * ${s01("1", "2")}) / CAST(m AS DOUBLE))"
    def auc(k: String) =
      s"(CAST(su$k AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)" +
        s" * CAST(m AS DOUBLE)))"
    s"""WITH items AS (
       |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |    CAST(n_chars AS BIGINT) AS s1,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS s2
       |  FROM documents),
       |tot AS (SELECT CAST(sum(y) AS BIGINT) AS npos FROM items),
       |${uvSql("s1")},
       |${uvSql("s2")},
       |j AS (
       |  SELECT items.y, u_s1, v_s1, u_s2, v_s2
       |  FROM items
       |  JOIN uv_s1 USING (s1)
       |  JOIN uv_s2 USING (s2)),
       |mm AS (
       |  SELECT CAST(sum(y) AS BIGINT) AS n,
       |    CAST(sum(1 - y) AS BIGINT) AS m,
       |    CAST(sum(CASE WHEN y = 1 THEN u_s1 END) AS BIGINT) AS su1,
       |    CAST(sum(CASE WHEN y = 1 THEN u_s2 END) AS BIGINT) AS su2,
       |    CAST(sum(CASE WHEN y = 1 THEN CAST(u_s1 AS DECIMAL(38,0))
       |      * u_s1 END) AS DECIMAL(38,0)) AS puu11,
       |    CAST(sum(CASE WHEN y = 1 THEN CAST(u_s2 AS DECIMAL(38,0))
       |      * u_s2 END) AS DECIMAL(38,0)) AS puu22,
       |    CAST(sum(CASE WHEN y = 1 THEN CAST(u_s1 AS DECIMAL(38,0))
       |      * u_s2 END) AS DECIMAL(38,0)) AS puu12,
       |    CAST(sum(CASE WHEN y = 0 THEN v_s1 END) AS BIGINT) AS sv1,
       |    CAST(sum(CASE WHEN y = 0 THEN v_s2 END) AS BIGINT) AS sv2,
       |    CAST(sum(CASE WHEN y = 0 THEN CAST(v_s1 AS DECIMAL(38,0))
       |      * v_s1 END) AS DECIMAL(38,0)) AS pvv11,
       |    CAST(sum(CASE WHEN y = 0 THEN CAST(v_s2 AS DECIMAL(38,0))
       |      * v_s2 END) AS DECIMAL(38,0)) AS pvv22,
       |    CAST(sum(CASE WHEN y = 0 THEN CAST(v_s1 AS DECIMAL(38,0))
       |      * v_s2 END) AS DECIMAL(38,0)) AS pvv12
       |  FROM j)
       |SELECT n AS n_pos, m AS n_neg, su1, su2,
       |  CAST(CAST(${auc("1")} AS DECIMAL(38,4)) AS VARCHAR) AS auc1,
       |  CAST(CAST(${auc("2")} AS DECIMAL(38,4)) AS VARCHAR) AS auc2,
       |  CAST(CAST(CASE WHEN $varD > 0 THEN
       |    (${auc("1")} - ${auc("2")}) / sqrt($varD) END
       |    AS DECIMAL(38,4)) AS VARCHAR) AS z
       |FROM mm""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q346_delong_auc", q346, Some(q346Sql)),
    QueryDef("q310_hosmer_lemeshow", q310, Some(q310Sql)),
    QueryDef("q290_conformal_holm", q290, Some(q290Sql)),
    QueryDef("q289_cumulative_gains", q289, Some(q289Sql)),
    QueryDef("q270_conformal_bh", q270, Some(q270Sql)),
    QueryDef("q269_grouped_ndcg", q269, Some(q269Sql)),
    QueryDef("q245_isotonic_calibration", q245, Some(q245Sql)),
    QueryDef("q244_calibration_metrics", q244, Some(q244Sql)),
    QueryDef("q335_log_loss", q335, Some(q335Sql)),
    QueryDef("q337_platt_scaling", q337, Some(q337Sql)),
    QueryDef("q191_conformal", q191, Some(q191Sql)),
    QueryDef("q186_average_precision", q186, Some(q186Sql)),
    QueryDef("q140_grouped_auc", q140, Some(q140Sql)),
    QueryDef("q141_retrieval_eval", q141, Some(q141Sql)),
    QueryDef("q143_calibration_bins", q143, Some(q143Sql)),
    QueryDef("q145_class_separation", q145, Some(q145Sql)),
    QueryDef("q148_classifier_report", q148, Some(q148Sql)),
    QueryDef("q149_cohens_kappa", q149, Some(q149Sql)))
}
