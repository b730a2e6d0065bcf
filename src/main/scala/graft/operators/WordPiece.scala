package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer apply (round 9, B164) — the third tokenizer family
  * (BERT-style greedy longest-match-first), completing the trio with BPE
  * merge replay (B44) and unigram-LM Viterbi (B102). All three share the
  * same shape: a frozen vocabulary rides the plan inside a native
  * expression ([[graft.functions.WordPieceEncode]]), apply is map-side
  * only, and the oracle replays the identical recurrence generated from
  * the SAME Scala constants — here a recursive CTE stepping word
  * positions by the longest matching piece (greedy has no ties, so even
  * token boundaries are bit-determined, stronger than unigram's
  * count-only contract).
  *
  * Oracle economy: the CTE recursion runs over DISTINCT normalized words
  * (vocabulary-sized), then joins back to per-doc word occurrences — the
  * same distinct-word trick as tokenizer TRAINING (B47).
  */
object WordPiece {

  /** Normalized text both engines tokenize identically (bpeNorm twin). */
  private def norm(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", "")

  /** Demo vocab in the [[UnigramLm.DemoPieces]] pattern: word-INITIAL
    * pieces = all single chars + the multi-char stems; CONTINUATION
    * pieces ("##x" in BERT notation, stored unmarked) = single letters
    * EXCEPT q/x/z plus suffix chunks — so words carrying q/x/z past
    * position 0 exercise the whole-word-[UNK] rule. */
  val DemoStarts: Seq[String] =
    ("abcdefghijklmnopqrstuvwxyz0123456789").map(_.toString) ++ Seq(
      "table", "value", "scan", "window", "stream", "quer",
      "ta", "str", "val", "win", "sc", "ro", "jo", "ba", "fa")
  val DemoConts: Seq[String] =
    ("abcdefghijklmnoprstuvwy0123456789").map(_.toString) ++ Seq(
      "ble", "ow", "ue", "eam", "dow", "er", "in", "an", "or", "ch", "st")

  /** Per-doc WordPiece accounting under the frozen vocab:
    * (doc_id, n_words, n_pieces, n_unk). Map-side only. */
  def wordpieceCounts(docs: DataFrame,
      starts: Seq[String] = DemoStarts,
      conts: Seq[String] = DemoConts): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.WordPieceExprs
          .wordpieceEncode(norm(col("text")), starts, conts).as("e"))
      .select(col("doc_id"), col("e.n_words").as("n_words"),
        col("e.n_pieces").as("n_pieces"), col("e.n_unk").as("n_unk"))

  private def q228(s: SparkSession, dir: String): DataFrame =
    wordpieceCounts(Tables.documents(s, dir)).orderBy(col("doc_id"))

  private val q228Sql = {
    val vals = (DemoStarts.map(p => s"('$p', FALSE)") ++
      DemoConts.map(p => s"('$p', TRUE)")).mkString(", ")
    s"""WITH RECURSIVE pieces(piece, cont) AS (VALUES $vals),
       |dw AS (
       |  SELECT doc_id, unnest(list_filter(string_split(
       |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' '),
       |    x -> x <> '')) AS w
       |  FROM documents),
       |words AS (SELECT DISTINCT w FROM dw),
       |steps AS (
       |  SELECT w, 0 AS pos, 0 AS np, FALSE AS unk FROM words
       |  UNION ALL
       |  SELECT s.w,
       |    CASE WHEN m.len IS NULL THEN length(s.w) ELSE s.pos + m.len END,
       |    CASE WHEN m.len IS NULL THEN 1 ELSE s.np + 1 END,
       |    s.unk OR m.len IS NULL
       |  FROM steps s
       |  LEFT JOIN LATERAL (
       |    SELECT max(length(p.piece)) AS len FROM pieces p
       |    WHERE ((s.pos = 0 AND NOT p.cont) OR (s.pos > 0 AND p.cont))
       |      AND p.piece = substr(s.w, s.pos + 1, length(p.piece))
       |  ) m ON TRUE
       |  WHERE s.pos < length(s.w)),
       |enc AS (SELECT w, np, unk FROM steps WHERE pos = length(w))
       |SELECT d.doc_id, count(e.w) AS n_words,
       |  CAST(COALESCE(sum(enc.np), 0) AS BIGINT) AS n_pieces,
       |  CAST(COALESCE(sum(CASE WHEN enc.unk THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) AS n_unk
       |FROM documents d
       |LEFT JOIN dw e ON d.doc_id = e.doc_id
       |LEFT JOIN enc ON enc.w = e.w
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q228_wordpiece_encode", q228, Some(q228Sql)))
}
