package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer — the second tokenizer
  * family beside BPE (B44/B47): modern pipelines (T5, Llama-family
  * SentencePiece configs) segment with a unigram language model, picking
  * per word the piece sequence of maximal probability rather than
  * replaying merge history. Training is Viterbi-EM over the DISTINCT-word
  * frequency table (the same classic trick as `trainBpeMerges`: corpus
  * mass rides in `freq`, the corpus is scanned once, and every EM
  * iteration is a vocabulary-sized job); apply is the native
  * [[graft.functions.UnigramEncode]] expression, so train and apply share
  * one DP implementation and can never disagree on segmentation.
  *
  * Cross-engine exactness: piece scores are integer micro-nats and the DP
  * maximizes one combined integer (`score·2²⁰ − n_pieces`) — the oracle
  * replays the identical recurrence as a recursive-CTE dynamic program
  * over word positions, generated from the SAME Scala piece constants, so
  * the two sides cannot drift. The oracled output is (piece count,
  * micro log-prob) per document: boundary ties with equal count AND equal
  * score can differ in token text between implementations, but never in
  * these totals (see UnigramEncode's determinism contract).
  *
  * Scale shape: encoding is map-side only (the piece table rides in the
  * plan like BpeEncode's merges); training touches the corpus once for
  * the word-frequency table, then runs O(emIters) vocabulary-sized jobs;
  * the collected model is bounded by `vocabSize` — the same "model fits
  * on every executor" premise as `trainLmModel`.
  */
object UnigramLm {

  /** Normalized text both engines tokenize identically (bpeNorm twin). */
  private def norm(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", "")

  /** ln(1e-6)·10⁶ — the OOV single-char penalty, same on both engines. */
  val DemoOov: Long = -13815511L

  /** A fixed demo piece table (the [[TextAnalysis.BpeMerges]] pattern):
    * full single-char coverage at a uniform ln(1/100) score plus
    * multi-char pieces that exercise the interesting DP shapes — whole
    * words beating their own sub-pieces ("table" vs "ta"+"ble"), competing
    * overlaps ("r"+"ow" vs "ro"+"w"), and chains through shared suffixes
    * ("or"/"er"/"in"). Scores are micro-nats, strictly negative. */
  val DemoPieces: Seq[(String, Long)] = {
    val singles = ("abcdefghijklmnopqrstuvwxyz0123456789").map(c =>
      c.toString -> -4605170L)
    val multis = Seq(
      "table" -> -2000000L, "value" -> -2050000L, "scan" -> -2100000L,
      "window" -> -2120000L, "stream" -> -2150000L,
      "in" -> -2820000L, "er" -> -2850000L, "an" -> -2900000L,
      "or" -> -2870000L, "ta" -> -3000000L, "str" -> -3010000L,
      "val" -> -3020000L, "win" -> -3030000L, "sc" -> -3050000L,
      "dow" -> -3060000L, "ue" -> -3080000L, "eam" -> -3090000L,
      "ble" -> -3100000L, "ow" -> -3150000L, "ro" -> -3200000L)
    singles ++ multis
  }

  /** Per-doc unigram-token accounting under a frozen piece table:
    * (doc_id, n_ws_tokens, n_pieces, micro_logp). Map-side only. */
  def unigramTokenCounts(docs: DataFrame,
      pieces: Seq[(String, Long)] = DemoPieces,
      oovMicro: Long = DemoOov): DataFrame =
    docs.select(col("doc_id"),
        size(graft.operators.Tok.ws(norm(col("text")))).cast("long")
          .as("n_ws_tokens"),
        graft.functions.UnigramExprs
          .unigramEncode(norm(col("text")), pieces, oovMicro).as("e"))
      .select(col("doc_id"), col("n_ws_tokens"),
        col("e.n_pieces").as("n_pieces"),
        col("e.micro_logp").as("micro_logp"))

  /** Tokens themselves (array<string>) — for packing/shard operators that
    * want the pieces, not just counts. */
  def unigramTokens(text: Column,
      pieces: Seq[(String, Long)] = DemoPieces,
      oovMicro: Long = DemoOov): Column =
    graft.functions.UnigramExprs.unigramEncode(norm(text), pieces, oovMicro)
      .getField("toks")

  // -- training: Viterbi-EM over the distinct-word frequency table ----------

  /** Learn a unigram piece table of at most `vocabSize` multi-char pieces
    * (single characters are ALWAYS retained for total coverage — encode
    * can never fail on seen charsets). Returns (piece, micro-nat score),
    * sorted by piece.
    *
    * Algorithm (Viterbi-EM, the standard SentencePiece simplification):
    *  1. SEED: every substring of length ≤ `maxPieceLen` of every distinct
    *     word, frequency-weighted; multi-char candidates keep the top
    *     `seedSize` by (weighted count desc, piece asc).
    *  2. E-step: Viterbi-segment each DISTINCT word under the current
    *     scores (the same native expression as apply), attributing the
    *     word's corpus frequency to each piece on its best path.
    *  3. M-step: score(piece) = ⌊10⁶·ln((c+1)/(total+|V|))⌋ — add-1
    *     smoothing keeps retained-but-unused pieces finite and strictly
    *     negative.
    *  4. PRUNE to `vocabSize` multi-char pieces by (count desc, piece asc)
    *     and repeat from 2 for `emIters` rounds.
    *
    * Every step is deterministic: integer counts, total orders on ties,
    * floor on the single ln. Training twice yields byte-identical models
    * (UnigramLmSpec pins this). */
  def trainUnigram(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 6,
      emIters: Int = 3, seedSize: Int = 4000): Seq[(String, Long)] = {
    require(vocabSize >= 1 && maxPieceLen >= 2 && emIters >= 1)
    val wordFreq = docs
      .select(explode(graft.operators.Tok.ws(norm(col("text")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    try {
      // seed candidates: all substrings ≤ maxPieceLen, frequency-weighted
      val subs = wordFreq
        .select(col("w"), col("freq"),
          explode(sequence(lit(1), length(col("w")))).as("p"))
        .select(col("w"), col("freq"), col("p"),
          explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
        .filter(col("p") + col("l") - 1 <= length(col("w")))
        .select(expr("substring(w, p, l)").as("piece"), col("freq"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      val singles = subs.filter(length(col("piece")) === 1)
      val seedMulti = subs.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(seedSize)
      def toScores(counts: DataFrame): Seq[(String, Long)] = {
        // bounded collect: ≤ seedSize + charset rows (the trainLmModel
        // premise — the model must fit on every executor anyway)
        val rows = counts.select(col("piece"), col("cnt")).collect()
          .map(r => (r.getString(0), r.getLong(1)))
        val total = rows.map(_._2).sum.toDouble + rows.length
        rows.map { case (p, c) =>
          p -> math.floor(1e6 * math.log((c + 1.0) / total)).toLong
        }.sortBy(_._1).toSeq
      }
      var model = toScores(singles.unionByName(seedMulti))
      for (_ <- 1 to emIters) {
        val toks = graft.functions.UnigramExprs
          .unigramEncode(col("w"), model, DemoOov).getField("toks")
        val counts = wordFreq
          .select(col("freq"), explode(toks).as("piece"))
          .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        val kept = counts.filter(length(col("piece")) === 1)
          .unionByName(counts.filter(length(col("piece")) > 1)
            .orderBy(col("cnt").desc, col("piece")).limit(vocabSize))
        // singles that fell off every Viterbi path must survive with a
        // floor count of 0 — coverage is non-negotiable
        val allSingles = singles.select(col("piece")).exceptAll(
          kept.filter(length(col("piece")) === 1).select(col("piece")))
          .withColumn("cnt", lit(0L))
        model = toScores(kept.unionByName(allSingles))
      }
      model
    } finally
      org.apache.spark.sql.GraftSql.releaseCheckpointBlocks(wordFreq)
  }

  // ==== q164: unigram-LM encode under the frozen demo table =================

  private def q164(s: SparkSession, dir: String): DataFrame =
    unigramTokenCounts(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** The oracle replays the EXACT combined-integer Viterbi recurrence as a
    * recursive-CTE DP over word positions: state = (word, position, dp
    * list), dp[i+1] = max over admissible split points j of dp[j] +
    * score·2²⁰ − 1, with the same map-or-OOV scoring — generated from the
    * same [[DemoPieces]]/[[DemoOov]] constants as the engine plan. The DP
    * runs over DISTINCT words only; per-occurrence totals come from one
    * join back. */
  private lazy val q164Sql: String = {
    val m = DemoPieces.map { case (p, v) => s"'$p': CAST($v AS BIGINT)" }
      .mkString("MAP {", ", ", "}")
    val maxLen = DemoPieces.map(_._1.length).max
    val score = s"map_extract($m, substr(w, j + 1, i + 1 - j))[1]"
    s"""WITH RECURSIVE norm AS (
       |  SELECT doc_id, list_filter(string_split(
       |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' '),
       |    x -> x <> '') AS words
       |  FROM documents),
       |occ AS (SELECT doc_id, u.w AS w FROM norm, unnest(words) AS u(w)),
       |dw AS (SELECT DISTINCT w FROM occ),
       |rec(w, i, dp) AS (
       |  SELECT w, 0, [CAST(0 AS BIGINT)] FROM dw
       |  UNION ALL
       |  SELECT w, i + 1,
       |    list_append(dp, list_max(list_filter(list_transform(
       |      range(greatest(0, i + 1 - $maxLen), i + 1), j ->
       |        CASE
       |          WHEN $score IS NOT NULL
       |            THEN dp[j + 1] + $score * 1048576 - 1
       |          WHEN i + 1 - j = 1
       |            THEN dp[j + 1] + CAST($DemoOov AS BIGINT) * 1048576 - 1
       |          ELSE NULL END),
       |      x -> x IS NOT NULL)))
       |  FROM rec WHERE i < len(w)),
       |fin AS (SELECT w, dp[len(w) + 1] AS c FROM rec WHERE i = len(w)),
       |pw AS (SELECT w, (-c) % 1048576 AS ntok,
       |  (c + (-c) % 1048576) // 1048576 AS s FROM fin),
       |agg AS (
       |  SELECT o.doc_id, count(*) AS nw,
       |    CAST(sum(p.ntok) AS BIGINT) AS np, CAST(sum(p.s) AS BIGINT) AS lp
       |  FROM occ o JOIN pw p USING (w) GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(a.nw, 0) AS BIGINT) AS n_ws_tokens,
       |  CAST(coalesce(a.np, 0) AS BIGINT) AS n_pieces,
       |  CAST(coalesce(a.lp, 0) AS BIGINT) AS micro_logp
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ==== q165: context-window packing budgeted in unigram tokens ============
  //
  // Closes the second tokenizer family's loop the way q98 closes BPE's:
  // train → encode → pack, with the native Viterbi count as the size
  // column of the SAME distributed greedy fold (ChunkAssigner's prefix
  // scan — no single-task window). The oracle reuses q164's DP to get
  // per-doc counts, then replays the fold row-by-row (the q98 recursive-
  // CTE pattern; the slice is id-bounded so the oracle's O(N²) replay
  // stays fixed-size at every scale factor).

  private def q165(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packByTokens(
      Tables.documents(s, dir).filter(col("doc_id") < 2000),
      budgetTokens = 512L,
      tokenCount = graft.functions.UnigramExprs
        .unigramEncode(norm(col("text")), DemoPieces, DemoOov)
        .getField("n_pieces"))
      .orderBy(col("doc_id"))

  private lazy val q165Sql: String = {
    val m = DemoPieces.map { case (p, v) => s"'$p': CAST($v AS BIGINT)" }
      .mkString("MAP {", ", ", "}")
    val maxLen = DemoPieces.map(_._1.length).max
    val score = s"map_extract($m, substr(w, j + 1, i + 1 - j))[1]"
    s"""WITH RECURSIVE norm AS (
       |  SELECT doc_id, list_filter(string_split(
       |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' '),
       |    x -> x <> '') AS words
       |  FROM documents WHERE doc_id < 2000),
       |occ AS (SELECT doc_id, u.w AS w FROM norm, unnest(words) AS u(w)),
       |dw AS (SELECT DISTINCT w FROM occ),
       |rec(w, i, dp) AS (
       |  SELECT w, 0, [CAST(0 AS BIGINT)] FROM dw
       |  UNION ALL
       |  SELECT w, i + 1,
       |    list_append(dp, list_max(list_filter(list_transform(
       |      range(greatest(0, i + 1 - $maxLen), i + 1), j ->
       |        CASE
       |          WHEN $score IS NOT NULL
       |            THEN dp[j + 1] + $score * 1048576 - 1
       |          WHEN i + 1 - j = 1
       |            THEN dp[j + 1] + CAST($DemoOov AS BIGINT) * 1048576 - 1
       |          ELSE NULL END),
       |      x -> x IS NOT NULL)))
       |  FROM rec WHERE i < len(w)),
       |fin AS (SELECT w, dp[len(w) + 1] AS c FROM rec WHERE i = len(w)),
       |pw AS (SELECT w, (-c) % 1048576 AS ntok FROM fin),
       |sums AS (
       |  SELECT o.doc_id, sum(p.ntok) AS nt
       |  FROM occ o JOIN pw p USING (w) GROUP BY 1),
       |d AS (
       |  SELECT n.doc_id, CAST(coalesce(s.nt, 0) AS BIGINT) AS nt,
       |    row_number() OVER (ORDER BY n.doc_id) AS rn
       |  FROM norm n LEFT JOIN sums s USING (doc_id)),
       |fold(rn, doc_id, nt, pack_id, acc) AS (
       |  SELECT rn, doc_id, nt, CAST(0 AS BIGINT), nt FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.rn, d.doc_id, d.nt,
       |    CASE WHEN f.acc + d.nt > 512 THEN f.pack_id + 1 ELSE f.pack_id END,
       |    CASE WHEN f.acc + d.nt > 512 THEN d.nt ELSE f.acc + d.nt END
       |  FROM fold f JOIN d ON d.rn = f.rn + 1)
       |SELECT doc_id, nt AS n_tokens, pack_id FROM fold ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q164_unigram_encode", q164, Some(q164Sql)),
    QueryDef("q165_unigram_packing", q165, Some(q165Sql)))
}
