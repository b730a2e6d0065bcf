package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyphrase extraction (Rose, Engel, Cramer, Cowley, "Automatic
  * Keyword Extraction from Individual Documents", 2010) — the unsupervised
  * corpus-labeling step that turns raw documents into topic phrases for
  * curation dashboards and mixture audits. Candidate phrases are maximal
  * runs of non-stopword tokens; each word scores deg/freq (deg = total
  * length of phrases it appears in, freq = its occurrence count — words
  * that live in long phrases beat words that stand alone); a phrase scores
  * the sum of its member-word scores.
  *
  * Determinism: deg and freq are exact integers; the per-word ratio
  * integerizes ONCE (⌊10⁶·deg/freq⌋, the LM-scorer discipline), so phrase
  * scores are integer sums — order-free and hash-stable.
  *
  * Scale shape: the phrase segmentation is a per-doc window (doc-length-
  * sized, like every per-doc text op here); word stats aggregate to the
  * VOCABULARY domain and broadcast back onto members, so the only
  * corpus-sized shuffles are the (doc, phrase) groupings — hash-balanced —
  * and the final phrase rollup; top-k is a TakeOrdered, no global sort.
  */
object Keyphrase {

  /** Top-`k` corpus keyphrases: (phrase, n_occurrences, score). Phrases
    * are maximal stopword-free token runs; score = Σ ⌊10⁶·deg/freq⌋ over
    * member words. Ties: highest score, then lexicographic phrase. */
  def rakeKeyphrases(docs: DataFrame, stopwords: Seq[String], k: Int): DataFrame = {
    val stopLit = typedLit(stopwords)
    val pos = docs
      .select(col("doc_id"), posexplode(Tok.ws(col("text"))).as(Seq("i", "tok")))
      .withColumn("is_stop", array_contains(stopLit, col("tok")))
    // phrase id = running stopword count (stop rows then drop out, leaving
    // each maximal non-stop run with one id)
    val seg = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val members = pos
      .withColumn("p",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(seg))
      .filter(!col("is_stop"))
      .select(col("doc_id"), col("p"), col("i"), col("tok"))
    val phrases = members.groupBy(col("doc_id"), col("p"))
      .agg(count(lit(1)).as("len"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("i"), col("tok")))),
          x => x.getField("tok"))).as("phrase"))
    val wordScores = members
      .join(phrases.select(col("doc_id"), col("p"), col("len")),
        Seq("doc_id", "p"))
      .groupBy(col("tok"))
      .agg(floor(lit(1e6) * sum(col("len")).cast("double") /
        count(lit(1)).cast("double")).cast("long").as("wscore"))
    val scored = members.join(broadcast(wordScores), Seq("tok"))
      .groupBy(col("doc_id"), col("p"))
      .agg(sum(col("wscore")).as("score"))
    phrases.join(scored, Seq("doc_id", "p"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"), min(col("score")).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(k)
  }

  // corpus stopwords: its two function words. Top 20 keyphrases — enough
  // to rank multi-word phrases above the singletons they contain.
  private def q187(s: SparkSession, dir: String): DataFrame =
    rakeKeyphrases(Tables.documents(s, dir), Seq("a", "the"), 20)

  private val q187Sql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, i, t[i] AS tok,
      |    t[i] IN ('a', 'the') AS is_stop
      |  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)),
      |seg AS (
      |  SELECT doc_id, i, tok, is_stop,
      |    sum(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY doc_id ORDER BY i) AS p
      |  FROM pos),
      |mem AS (SELECT doc_id, p, i, tok FROM seg WHERE NOT is_stop),
      |plen AS (
      |  SELECT doc_id, p, CAST(count(*) AS BIGINT) AS len,
      |    string_agg(tok, ' ' ORDER BY i) AS phrase
      |  FROM mem GROUP BY 1, 2),
      |ws AS (
      |  SELECT tok, CAST(floor(1000000.0 * CAST(sum(len) AS DOUBLE) /
      |    CAST(count(*) AS DOUBLE)) AS BIGINT) AS wscore
      |  FROM mem JOIN plen USING (doc_id, p) GROUP BY 1),
      |psc AS (
      |  SELECT m.doc_id, m.p, CAST(sum(ws.wscore) AS BIGINT) AS score
      |  FROM mem m JOIN ws USING (tok) GROUP BY 1, 2)
      |SELECT pl.phrase, count(*) AS n_occurrences, min(psc.score) AS score
      |FROM plen pl JOIN psc ON pl.doc_id = psc.doc_id AND pl.p = psc.p
      |GROUP BY 1 ORDER BY min(psc.score) DESC, pl.phrase LIMIT 20""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q187_rake_keyphrases", q187, Some(q187Sql)))
}
