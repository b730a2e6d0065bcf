package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline needs
  * beyond whole-document dedup (SURVEY.md §2 training-data extensions):
  * segment-level dedup with document reassembly (the C4/RefinedWeb
  * line-dedup shape), corpus-frequency quality signals, scale-safe
  * deterministic per-group sampling, and PII redaction.
  *
  * Determinism discipline is the same as TextAnalysis: integer outputs or
  * md5-rendered strings only, every query totally ordered, so the DuckDB
  * differential is byte-exact.
  */
object CorpusOps {

  private def toks = Tok.ws(col("text"))

  // ==== q64: segment-level dedup with reassembly (C4-style line dedup) ====
  //
  // Documents are split into fixed-size token segments; a segment survives
  // only at its first corpus-wide occurrence (ordered by doc_id, position);
  // each document is reassembled from its surviving segments in original
  // order. At 100 TB this is two hash shuffles — one by segment content for
  // the keep-first window, one by doc_id for reassembly — with no
  // all-pairs structure anywhere.

  private val SegLen = 8

  /** Fixed-size token segments of `text`, rendered back to strings. */
  private def segmentsOf(t: Column, segLen: Int): Column = {
    val n = size(t)
    when(n > lit(0),
      transform(
        sequence(lit(0), floor((n + lit(segLen - 1)) / lit(segLen)).cast("int") - 1),
        i => array_join(slice(t, i * segLen + 1, lit(segLen)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Segment-level keep-first dedup: per document, how many segments
    * survive and the md5 of the reassembled text. */
  def segmentDedup(docs: DataFrame, segLen: Int = SegLen): DataFrame = {
    val segs = docs.select(col("doc_id"),
      posexplode(segmentsOf(toks, segLen)).as(Seq("seg_idx", "seg")))
    val firstSeen = Window.partitionBy(col("seg"))
      .orderBy(col("doc_id"), col("seg_idx"))
    segs
      .withColumn("is_first", row_number().over(firstSeen) === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("is_first"), 1L).otherwise(0L)).as("n_kept"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(when(col("is_first"),
            struct(col("seg_idx"), col("seg"))))),
          s => s.getField("seg")))).as("dedup_text_md5"))
      .orderBy(col("doc_id"))
  }

  private def q64(s: SparkSession, dir: String): DataFrame =
    segmentDedup(Tables.documents(s, dir).select(col("doc_id"), col("text")))

  private val q64Sql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents),
      |segs AS (
      |  SELECT doc_id, CAST(i AS INT) AS seg_idx,
      |    array_to_string(t[i*8+1 : i*8+8], ' ') AS seg
      |  FROM toks, unnest(range(0, (len(t) + 7) // 8)) AS u(i)),
      |fl AS (
      |  SELECT doc_id, seg_idx, seg,
      |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1
      |      AS is_first
      |  FROM segs)
      |SELECT doc_id, count(*) AS n_segs,
      |  CAST(sum(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  md5(coalesce(
      |    string_agg(CASE WHEN is_first THEN seg END, ' ' ORDER BY seg_idx),
      |    '')) AS dedup_text_md5
      |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ==== q90: variable-length repeated-substring detection =================
  //
  // The suffix-array dedup family (find every repeated token substring of
  // length >= L across the corpus) re-shaped for Spark: q64's fixed
  // segment grid misses repeats that straddle segment boundaries or exceed
  // a segment; this detects them at ANY alignment. Instead of a global
  // suffix array (a corpus-wide sort of every suffix — the classic
  // single-node construction), emit every L-token window fingerprint,
  // count corpus-wide multiplicity (fixed-size aggregation state,
  // map-side combined — no doc lists, no caps), keep windows seen >= 2
  // times, and merge consecutive duplicated windows per doc into maximal
  // runs (gaps-and-islands). A repeated substring of length m >= L
  // produces m − L + 1 consecutive duplicated windows, so the merged run
  // recovers its exact span: same detection set as a suffix array for
  // repeats >= L, in two hash shuffles (8-byte fp, then doc_id) and one
  // per-doc sort — every stage linear in corpus tokens.

  /** Every L-token window of every document as (doc_id, pos, fp): the
    * shared front end of the substring-dedup pair (q90 detect / q91
    * rewrite). 64-bit fingerprints, so the shuffles carry 8 bytes per
    * window instead of L tokens of text. */
  private def windowFps(docs: DataFrame, minLen: Int): DataFrame =
    docs.select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= minLen)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("t")) - minLen),
          i => xxhash64(array_join(slice(col("t"), i + lit(1), lit(minLen)), " "))))
        .as(Seq("pos", "fp")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("fp"))

  /** Maximal repeated token spans (length >= minLen) per document:
    * (doc_id, start, length) with `start` a 0-based token position. A
    * span is reported when its every L-window occurs >= 2 times anywhere
    * in the corpus (cross-doc or intra-doc). Window keys are 64-bit
    * fingerprints — at 100 TB the shuffle carries 8 bytes per window, not
    * L tokens of text (collision odds ~n²/2⁶⁴; a byte-exact rewrite stage
    * would re-verify spans against text). */
  def repeatedSubstrings(docs: DataFrame, minLen: Int): DataFrame = {
    // checkpointed HERE but deliberately NOT in removeRepeatedSubstrings:
    // this operator's downstream (marked positions ≈ all windows on a
    // dup-heavy corpus, then a per-doc window sort over them) re-reads the
    // frame expensively, and the 10×-replicated stress corpus measured 32%
    // faster with the explode materialized once (10.1 s vs 14.9 s at sf1).
    // The rewrite's downstream is argmin + a small surviving join where
    // the same materialization measured 13× SLOWER (7.1 s vs 0.5 s) —
    // lazy re-evaluation plus exchange reuse wins when consumers are cheap.
    val wins = windowFps(docs, minLen).localCheckpoint()
    val dup = wins.groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("fp"))
    val marked = wins.join(dup, Seq("fp")).select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("start"),
        (max(col("pos")) - min(col("pos")) + minLen).as("length"))
      .select(col("doc_id"), col("start"), col("length"))
  }

  /** The REWRITE half of the suffix-array dedup family (q90 detects —
    * this removes): every duplicated L-window keeps only its corpus-FIRST
    * occurrence (min (doc_id, pos) — an argmin aggregate, map-side
    * combinable, no per-fp sort even on a mass-duplicated fingerprint);
    * each document then keeps exactly the tokens covered by at least one
    * surviving window, reconstructed in order via interval union
    * (running-max gaps-and-islands).
    *
    * Coverage semantics, stated precisely: a window is `surviving` when it
    * is unique corpus-wide OR the first occurrence of its fingerprint; a
    * token survives iff some surviving window covers it. A window that
    * straddles a repeat's edge contains surrounding unique context and is
    * therefore unique itself, so each non-first repeat occurrence keeps up
    * to L−1 boundary tokens on each side and loses its INTERIOR — local
    * fluency at the seams is preserved, and repeats shorter than 2(L−1)+1
    * embedded in unique context are left alone (their every window
    * touches context). A context-free repeat occurrence (a whole-document
    * copy, e.g. the planted excerpts in q91) has no unique windows at all
    * and rewrites to empty. Documents shorter than minLen pass through
    * whole. Emits per-doc audit rows (token counts + md5 of the rewritten
    * text) rather than shipping corpus text through the compare. */
  def removeRepeatedSubstrings(docs: DataFrame, minLen: Int): DataFrame = {
    val base = docs.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("n"))
    // NOT checkpointed — measured 13× faster lazy at sf1 (see the note in
    // repeatedSubstrings): both consumers shuffle by fp, so the exchange
    // is planned once, and re-deriving the explode beats materializing it
    val wins = windowFps(docs, minLen)
    val firsts = wins.groupBy(col("fp")).agg(
      count(lit(1)).as("cnt"),
      min(struct(col("doc_id"), col("pos"))).as("first"))
    val surviving = wins.join(firsts, Seq("fp"))
      .filter(col("cnt") === 1 ||
        (col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos")))
      .select(col("doc_id"), col("pos"))
    // interval union of surviving windows per doc: a new island starts
    // when this window begins past every previous window's end + 1
    val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevEnd = max(col("pos") + lit(minLen - 1))
      .over(wdoc.rowsBetween(Window.unboundedPreceding, -1))
    val intervals = surviving
      .withColumn("brk",
        when(col("pos") > coalesce(prevEnd, lit(-1L)) + 1, 1L).otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(wdoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(minLen - 1)).as("e"))
    val rebuilt = intervals.join(base, Seq("doc_id"))
      .select(col("doc_id"), col("s"), (col("e") - col("s") + 1).as("len"),
        array_join(slice(col("t"), (col("s") + 1).cast("int"),
          (col("e") - col("s") + 1).cast("int")), " ").as("piece"))
      .groupBy(col("doc_id"))
      .agg(sum(col("len")).as("kept_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("s"), col("piece")))),
          p => p.getField("piece"))).as("text_after"))
    base.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").as("n_before"),
        when(col("n") < minLen, col("n"))
          .otherwise(coalesce(col("kept_tokens"), lit(0L))).as("n_after"),
        md5(when(col("n") < minLen, array_join(col("t"), " "))
          .otherwise(coalesce(col("text_after"), lit("")))).as("text_md5"))
  }

  private def q91(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val plants = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 43)
      .select((col("doc_id") + Dedup.PlantOffset).as("doc_id"),
        array_join(slice(col("t"), 4, 40), " ").as("text"))
    removeRepeatedSubstrings(docs.unionByName(plants), RepeatL)
      .orderBy(col("doc_id"))
  }

  private val q91Sql =
    """WITH toks0 AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents WHERE doc_id < 10),
      |plant AS (
      |  SELECT doc_id + 1000000000 AS doc_id, array_to_string(t[4:43], ' ') AS text
      |  FROM toks0 WHERE len(t) >= 43),
      |aug AS (SELECT doc_id, text FROM documents UNION ALL SELECT * FROM plant),
      |base AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM aug),
      |wins AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
      |    array_to_string(t[i:i+19], ' ') AS w
      |  FROM base, unnest(range(1, len(t) - 18)) AS u(i)
      |  WHERE len(t) >= 20),
      |ranked AS (
      |  SELECT doc_id, pos,
      |    count(*) OVER (PARTITION BY w) AS cnt,
      |    row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn
      |  FROM wins),
      |surviving AS (
      |  SELECT doc_id, pos FROM ranked WHERE cnt = 1 OR rn = 1),
      |brks AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(max(pos + 19) OVER (PARTITION BY doc_id
      |      ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      -1) + 1 THEN 1 ELSE 0 END AS brk
      |  FROM surviving),
      |grps AS (
      |  SELECT doc_id, pos,
      |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM brks),
      |iv AS (
      |  SELECT doc_id, grp, min(pos) AS s, max(pos) + 19 AS e
      |  FROM grps GROUP BY doc_id, grp),
      |rebuilt AS (
      |  SELECT iv.doc_id, CAST(sum(e - s + 1) AS BIGINT) AS kept_tokens,
      |    string_agg(array_to_string(t[s+1:e+1], ' '), ' ' ORDER BY s)
      |      AS text_after
      |  FROM iv JOIN base ON base.doc_id = iv.doc_id
      |  GROUP BY iv.doc_id)
      |SELECT b.doc_id, CAST(len(b.t) AS BIGINT) AS n_before,
      |  CASE WHEN len(b.t) < 20 THEN CAST(len(b.t) AS BIGINT)
      |    ELSE coalesce(r.kept_tokens, 0) END AS n_after,
      |  md5(CASE WHEN len(b.t) < 20 THEN array_to_string(b.t, ' ')
      |    ELSE coalesce(r.text_after, '') END) AS text_md5
      |FROM base b LEFT JOIN rebuilt r ON r.doc_id = b.doc_id
      |ORDER BY b.doc_id""".stripMargin

  private val RepeatL = 20

  /** Planted long repeats: a 40-token excerpt of each seed doc becomes a
    * new document — a variable-length repeat no segment grid aligns with.
    * Both engines compute the identical corpus, so every organic repeat
    * matches too. */
  private def q90(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val plants = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 43)
      .select((col("doc_id") + Dedup.PlantOffset).as("doc_id"),
        array_join(slice(col("t"), 4, 40), " ").as("text"))
    repeatedSubstrings(docs.unionByName(plants), RepeatL)
      .orderBy(col("doc_id"), col("start"))
  }

  private val q90Sql =
    """WITH toks0 AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents WHERE doc_id < 10),
      |plant AS (
      |  SELECT doc_id + 1000000000 AS doc_id, array_to_string(t[4:43], ' ') AS text
      |  FROM toks0 WHERE len(t) >= 43),
      |aug AS (SELECT doc_id, text FROM documents UNION ALL SELECT * FROM plant),
      |toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM aug),
      |wins AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
      |    array_to_string(t[i:i+19], ' ') AS w
      |  FROM toks, unnest(range(1, len(t) - 18)) AS u(i)
      |  WHERE len(t) >= 20),
      |dup AS (SELECT w FROM wins GROUP BY w HAVING count(*) >= 2),
      |marked AS (SELECT doc_id, pos FROM wins JOIN dup USING (w)),
      |isl AS (
      |  SELECT doc_id, pos,
      |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM marked)
      |SELECT doc_id, min(pos) AS start,
      |  max(pos) - min(pos) + 20 AS length
      |FROM isl GROUP BY doc_id, grp ORDER BY doc_id, start""".stripMargin

  // ==== q65: corpus-frequency quality signals =============================
  //
  // A rare-token detector that needs no external model: build the corpus
  // vocabulary (token -> count), join it back, and aggregate per document.
  // All outputs are exact integers — no cross-engine float hazards. The
  // vocabulary join shuffles by token (AQE broadcasts it when small); both
  // aggregations are map-side combinable.

  def corpusFrequencyQuality(docs: DataFrame): DataFrame = {
    // pre-aggregate to distinct (doc, token) pairs with term frequency, so
    // the vocabulary join shuffles one row per distinct pair, not one per
    // token instance — on a repetitious corpus that is the difference
    // between shuffling the corpus and shuffling its vocabulary profile
    val tf = docs.select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
    tf.join(vocab, "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("cnt")).as("sum_freq"),
        min(col("cnt")).as("min_freq"),
        max(col("cnt")).as("max_freq"))
      .withColumn("mean_freq", expr("sum_freq div n_tokens"))
      .orderBy(col("doc_id"))
  }

  private def q65(s: SparkSession, dir: String): DataFrame =
    corpusFrequencyQuality(Tables.documents(s, dir).select(col("doc_id"), col("text")))

  private val q65Sql =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      |  FROM documents),
      |v AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
      |SELECT doc_id, count(*) AS n_tokens,
      |  CAST(sum(cnt) AS BIGINT) AS sum_freq,
      |  CAST(min(cnt) AS BIGINT) AS min_freq,
      |  CAST(max(cnt) AS BIGINT) AS max_freq,
      |  CAST(sum(cnt) AS BIGINT) // count(*) AS mean_freq
      |FROM tok JOIN v USING (token)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ==== q66: deterministic per-group sample (corpus rebalancing) ==========
  //
  // Keep k documents per (lang, source), chosen by md5(doc_id) order —
  // deterministic, seed-free, and stable under re-partitioning. Group
  // cardinality is tiny relative to corpus size, so a naive window would
  // funnel each group through one reducer; instead a local top-k keyed by
  // (group, input-partition) spreads the full-data shuffle across
  // partition ids — balanced by construction — and bounds the per-group
  // window's input to k rows per (group, partition). Exact in both stages.

  def groupSample(docs: DataFrame, k: Int): DataFrame = {
    val ord: Seq[Column] = Seq(md5(col("doc_id").cast("string")), col("doc_id"))
    val local = Window.partitionBy(col("lang"), col("source"), col("pid"))
      .orderBy(ord: _*)
    val global = Window.partitionBy(col("lang"), col("source")).orderBy(ord: _*)
    docs.select(col("doc_id"), col("lang"), col("source"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lrk", row_number().over(local))
      .filter(col("lrk") <= k)
      .withColumn("rk", row_number().over(global).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("source"), col("rk"))
      .orderBy(col("lang"), col("source"), col("rk"))
  }

  private def q66(s: SparkSession, dir: String): DataFrame =
    groupSample(Tables.documents(s, dir), 10)

  private val q66Sql =
    """SELECT doc_id, lang, source, rk FROM (
      |  SELECT doc_id, lang, source,
      |    row_number() OVER (PARTITION BY lang, source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 10 ORDER BY lang, source, rk""".stripMargin

  // ==== q67: PII redaction ================================================
  //
  // The corpus is synthetic token text with no real PII, so — like the
  // audio round-trip — the query synthesizes a payload with known PII
  // (an email, an IPv4, a phone number derived from doc_id, a second email
  // on even ids), redacts it, and emits match counts plus the md5 of the
  // redacted string. DuckDB reproduces the synthesis AND the redaction, so
  // the differential proves regex semantics agree across engines. Pure
  // column program: codegen'd, embarrassingly parallel.

  private val EmailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  private val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val TelRe = "555-[0-9]{4}"

  /** Redact emails, IPv4s, and 555-line phone numbers in `text`; emits
    * per-row match counts and the redacted text. */
  def redactPii(rows: DataFrame): DataFrame =
    rows
      .withColumn("n_emails", size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_ips", size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))).cast("long"))
      .withColumn("n_tels", size(regexp_extract_all(col("text"), lit(TelRe), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), TelRe, "<TEL>"))

  private def q67(s: SparkSession, dir: String): DataFrame = {
    val payload = concat(
      lit("contact user"), col("doc_id"), lit("@example.com"),
      when(col("doc_id") % 2 === 0, lit(" alt0@example.com")).otherwise(lit("")),
      lit(" via 10."), col("doc_id") % 256, lit(".0.1 tel 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" :: "), substring(col("text"), 1, 64))
    redactPii(Tables.documents(s, dir)
        .select(col("doc_id"), payload.as("text")))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_tels"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  private val q67Sql =
    """WITH p AS (
      |  SELECT doc_id,
      |    'contact user' || doc_id || '@example.com' ||
      |    CASE WHEN doc_id % 2 = 0 THEN ' alt0@example.com' ELSE '' END ||
      |    ' via 10.' || (doc_id % 256) || '.0.1 tel 555-' ||
      |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |    ' :: ' || substr(text, 1, 64) AS payload
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(payload, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(payload, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
      |  CAST(len(regexp_extract_all(payload, '555-[0-9]{4}')) AS BIGINT) AS n_tels,
      |  md5(regexp_replace(regexp_replace(regexp_replace(payload,
      |    '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
      |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
      |    '555-[0-9]{4}', '<TEL>', 'g')) AS redacted_md5
      |FROM p ORDER BY doc_id""".stripMargin

  // ==== q70: incremental corpus dedup (batch-vs-existing) =================
  //
  // The standing-pipeline shape: a new batch arrives and must drop (a)
  // documents whose content already exists in the corpus and (b)
  // within-batch duplicates past the first occurrence. Both checks run on
  // the content hash: one left join against the existing corpus's distinct
  // hashes, one keep-first window inside the batch — all hash-partitioned,
  // nothing quadratic. The even/odd doc_id split is just the test's way of
  // labeling "existing" vs "incoming".

  def incrementalDedup(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val ex = existing.select(md5(col("text")).as("h")).distinct()
      .withColumn("in_existing", lit(true))
    val firstInBatch = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    incoming.select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("first_in_batch", row_number().over(firstInBatch) === 1)
      .join(ex, Seq("h"), "left")
      .select(col("doc_id"),
        when(col("in_existing").isNotNull, "dup_existing")
          .when(!col("first_in_batch"), "dup_batch")
          .otherwise("kept").as("status"))
  }

  private def q70(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    incrementalDedup(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
      .orderBy(col("doc_id"))
  }

  private val q70Sql =
    """WITH ex AS (
      |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
      |inc AS (
      |  SELECT doc_id, md5(text) AS h,
      |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
      |      AS first_in_batch
      |  FROM documents WHERE doc_id % 2 = 1)
      |SELECT inc.doc_id,
      |  CASE WHEN ex.h IS NOT NULL THEN 'dup_existing'
      |    WHEN NOT first_in_batch THEN 'dup_batch'
      |    ELSE 'kept' END AS status
      |FROM inc LEFT JOIN ex ON inc.h = ex.h
      |ORDER BY inc.doc_id""".stripMargin

  // ==== q85: corpus snapshot diff =========================================
  //
  // Data versioning between two corpus snapshots: every doc_id is classified
  // added / removed / modified / unchanged by comparing content hashes
  // through one full outer join on the (unique) doc key — at 100 TB that is
  // a single co-partitioned hash shuffle per side with no skew by
  // construction, and the texts themselves never move (md5 reduces each side
  // to a 32-byte column before the join).

  /** Per-doc diff between snapshots. prev/cur: (doc_id, text). Presence is
    * tracked with explicit marker columns, not hash nullity — a NULL text
    * hashes to NULL but the row still EXISTS in its snapshot, and must
    * compare as a value (null-safe equality), not as absence. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame): DataFrame = {
    val p = prev.select(col("doc_id"), md5(col("text")).as("prev_h"),
      lit(true).as("in_prev"))
    val c = cur.select(col("doc_id"), md5(col("text")).as("cur_h"),
      lit(true).as("in_cur"))
    p.join(c, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("in_prev").isNull, "added")
          .when(col("in_cur").isNull, "removed")
          .when(!(col("prev_h") <=> col("cur_h")), "modified")
          .otherwise("unchanged").as("status"))
  }

  // The previous snapshot is derived deterministically from the current
  // corpus so both engines construct the identical pair: docs at
  // doc_id % 11 = 0 are missing from prev (-> added), docs at % 7 = 0
  // (and % 11 != 0) carried a ' legacy' suffix in prev (-> modified), and
  // prev had 25 extra docs at doc_id + 10^9 that are gone now (-> removed).
  // The +10^9 ids follow the suite-wide PlantOffset contract: the test-data
  // generator and scale_up.py keep organic ids strictly below 10^9, so
  // synthetic rows can never collide with real ones at any tested scale.
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val prev = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" legacy")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") < 25)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
    snapshotDiff(prev, docs).orderBy(col("doc_id"))
  }

  private val q85Sql =
    """WITH prev AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN text || ' legacy' ELSE text END AS text
      |  FROM documents WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id < 25),
      |p AS (SELECT doc_id, md5(text) AS prev_h, true AS in_prev FROM prev),
      |c AS (SELECT doc_id, md5(text) AS cur_h, true AS in_cur FROM documents)
      |SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
      |  CASE WHEN in_prev IS NULL THEN 'added'
      |    WHEN in_cur IS NULL THEN 'removed'
      |    WHEN p.prev_h IS DISTINCT FROM c.cur_h THEN 'modified'
      |    ELSE 'unchanged' END AS status
      |FROM p FULL OUTER JOIN c ON p.doc_id = c.doc_id
      |ORDER BY doc_id""".stripMargin

  // ==== q86: shard manifest ===============================================
  //
  // The "write the dataset card" step before a training run: assign every
  // document to a deterministic shard (md5 of the doc key — engine- and
  // layout-independent, unlike hash partitioning) and emit one manifest row
  // per shard with counts, token totals, id range, and an ORDER-FREE content
  // checksum (a sum of per-doc integer digests commutes, so the manifest is
  // identical however the corpus is partitioned or ordered). One map-side
  // pass + one tiny nShards-row aggregate at any corpus size.

  /** First 4 hex digits of md5 of `c`, as an integer in [0, 65536). */
  private def md5Int16(c: Column): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("long")

  /** One row per shard: (shard, n_docs, n_tokens, min/max doc_id,
    * content_checksum). */
  def shardManifest(docs: DataFrame, nShards: Int): DataFrame =
    docs.select(col("doc_id"),
      size(toks).cast("long").as("n_toks"),
      (md5Int16(col("doc_id").cast("string")) % nShards).as("shard"),
      md5Int16(col("text")).as("th"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        sum(col("th")).as("content_checksum"))
      .orderBy(col("shard"))

  private def q86(s: SparkSession, dir: String): DataFrame =
    shardManifest(Tables.documents(s, dir), nShards = 16)

  // hex→int in DuckDB via digit arithmetic (no conv()); both engines
  // compute the identical 16-bit integers from the identical md5 hex
  private val q86Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks,
      |    md5(CAST(doc_id AS VARCHAR)) AS hid, md5(text) AS ht
      |  FROM documents),
      |ints AS (
      |  SELECT doc_id, n_toks,
      |    ((strpos('0123456789abcdef', substr(hid, 1, 1)) - 1) * 4096
      |     + (strpos('0123456789abcdef', substr(hid, 2, 1)) - 1) * 256
      |     + (strpos('0123456789abcdef', substr(hid, 3, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(hid, 4, 1)) - 1)) % 16 AS shard,
      |    ((strpos('0123456789abcdef', substr(ht, 1, 1)) - 1) * 4096
      |     + (strpos('0123456789abcdef', substr(ht, 2, 1)) - 1) * 256
      |     + (strpos('0123456789abcdef', substr(ht, 3, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(ht, 4, 1)) - 1)) AS th
      |  FROM d)
      |SELECT shard, count(*) AS n_docs,
      |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
      |  CAST(sum(th) AS BIGINT) AS content_checksum
      |FROM ints GROUP BY shard ORDER BY shard""".stripMargin

  // ==== q71: composed curation decision ===================================
  //
  // One pass that composes the standard corpus filters into a keep/drop
  // decision with a priority-ordered reason code: exact-dup (keep-first on
  // content hash), too-short, repetitious (distinct-token ratio below 0.3,
  // expressed as the integer cross-multiplication 10·distinct < 3·total so
  // no float crosses the engine boundary), else kept. Emits per
  // (lang, reason) counts — the corpus-curation report.

  def curationReport(docs: DataFrame): DataFrame = {
    val t = toks
    val firstSeen = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs
      .withColumn("n_tokens", size(t))
      .withColumn("n_distinct", size(array_distinct(t)))
      .withColumn("is_first", row_number().over(firstSeen) === 1)
      .withColumn("reason",
        when(!col("is_first"), "dup")
          .when(col("n_tokens") < 30, "too_short")
          .when(col("n_distinct") * 10 < col("n_tokens") * 3, "repetitious")
          .otherwise("kept"))
      .groupBy(col("lang"), col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("sum_tokens"))
      .orderBy(col("lang"), col("reason"))
  }

  private def q71(s: SparkSession, dir: String): DataFrame =
    curationReport(Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text")))

  private val q71Sql =
    """WITH base AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
      |    len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))
      |      AS n_distinct,
      |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
      |      AS is_first
      |  FROM documents)
      |SELECT lang,
      |  CASE WHEN NOT is_first THEN 'dup'
      |    WHEN n_tokens < 30 THEN 'too_short'
      |    WHEN n_distinct * 10 < n_tokens * 3 THEN 'repetitious'
      |    ELSE 'kept' END AS reason,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      |FROM base GROUP BY lang, reason ORDER BY lang, reason""".stripMargin

  // ==== q93: leakage-safe train/val/test split ============================
  //
  // Split assignment whose unit is the dedup CLUSTER, not the document: a
  // doc-level random split sends ~2·p·(1−p) of every duplicate pair across
  // the train/eval boundary — the classic eval-contamination bug (the
  // decontamination operator q59 then has to repair it after the fact; this
  // prevents it structurally). Hashing the cluster representative id with
  // the engine-neutral md5Int16 sends all members of a cluster to the same
  // split BY CONSTRUCTION, for any cluster notion the caller supplies:
  // exact-text collapse (oracled below), `dedupNear` decisions (law-tested
  // in DedupSpec), or semantic clusters. Cost: one hash + two comparisons
  // per row, no shuffle beyond what the cluster column already required —
  // the 100 TB shape is whatever the clustering cost, plus zero.

  /** Adds a deterministic `split` column ('train'|'val'|'test') that is a
    * pure function of `clusterId`, so no two docs sharing a cluster can
    * land in different splits. Percentages are approximate (hash-bucket
    * shares), exact in expectation. */
  def leakageSafeSplit(docs: DataFrame, clusterId: Column,
      valPct: Int = 10, testPct: Int = 10): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"leakageSafeSplit: valPct=$valPct testPct=$testPct must be >= 0 " +
        "and sum to <= 100")
    val bucket = md5Int16(clusterId.cast("string")) % 100
    docs.withColumn("split",
      when(bucket < 100 - valPct - testPct, lit("train"))
        .when(bucket < 100 - testPct, lit("val"))
        .otherwise(lit("test")))
  }

  private def q93(s: SparkSession, dir: String): DataFrame = {
    val clustered = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .withColumn("cluster_id",
        min(col("doc_id")).over(Window.partitionBy(col("text"))))
    leakageSafeSplit(clustered, col("cluster_id"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .orderBy(col("split"))
  }

  private val q93Sql =
    """WITH cl AS (
      |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cluster_id
      |  FROM documents),
      |b AS (
      |  SELECT cluster_id,
      |    ((strpos('0123456789abcdef', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1) * 4096
      |     + (strpos('0123456789abcdef', substr(md5(CAST(cluster_id AS VARCHAR)), 2, 1)) - 1) * 256
      |     + (strpos('0123456789abcdef', substr(md5(CAST(cluster_id AS VARCHAR)), 3, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(md5(CAST(cluster_id AS VARCHAR)), 4, 1)) - 1)) % 100
      |      AS bucket
      |  FROM cl)
      |SELECT CASE WHEN bucket < 80 THEN 'train'
      |            WHEN bucket < 90 THEN 'val'
      |            ELSE 'test' END AS split,
      |  count(*) AS n_docs, count(DISTINCT cluster_id) AS n_clusters
      |FROM b GROUP BY 1 ORDER BY split""".stripMargin

  // ==== q96: token-budget training-mixture builder ========================
  //
  // "Give me a 20k-token training mix at 40% en / 20% fr / ..." — the data-
  // mixing step that turns a curated corpus into a training set. Selection
  // must be DETERMINISTIC (reproducible runs, resumable jobs) and must not
  // funnel each language through one reducer (a naive per-stratum greedy
  // scan is a 5-reducer job on a 5-language corpus, whatever the cluster
  // size). So: docs hash into `buckets` sub-strata per language, each
  // (lang, bucket) gets an equal integer share of the language's token
  // target, and within a bucket docs are taken in md5(doc_id) order until
  // the share fills (a doc is kept iff the running token sum BEFORE it is
  // under the share — so the budget can overshoot by at most one doc per
  // bucket, and undershoot only when a bucket runs out of docs; both
  // deviations are bounded and documented, not floating-point-dependent).
  // Everything is integer arithmetic + md5 ordering — engine-neutral, no
  // float rate ever computed. The per-(lang,bucket) window sort is the
  // scale unit: parallelism = languages × buckets, independent of corpus
  // size; raise `buckets` to match the cluster.

  /** Adds `kept` to docs: a deterministic token-budget mixture at the given
    * integer percent weights (must sum to <= 100; unlisted langs get 0).
    * docs: (doc_id, lang, text). */
  def buildMixture(docs: DataFrame, weights: Map[String, Int],
      budgetTokens: Long, buckets: Int = 64): DataFrame = {
    require(weights.values.forall(_ >= 0) && weights.values.sum <= 100,
      s"weights must be non-negative percents summing to <= 100: $weights")
    require(budgetTokens > 0 && buckets > 0, "budget and buckets must be positive")
    // per-(lang,bucket) integer share, precomputed driver-side so neither
    // engine ever divides (division semantics are a cross-engine hazard)
    val share: Column = weights.foldLeft(lit(0L)) { case (acc, (l, w)) =>
      when(col("lang") === l, lit(w * budgetTokens / (100L * buckets)))
        .otherwise(acc)
    }
    val w = Window.partitionBy(col("lang"), col("bucket")).orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("bucket", md5Int16(col("doc_id").cast("string")) % buckets)
      .withColumn("__h", md5(col("doc_id").cast("string")))
      .withColumn("run_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("kept", col("run_before") < share)
      .drop("__h")
  }

  private val MixWeights = Map("en" -> 40, "fr" -> 20, "de" -> 20,
    "es" -> 10, "zh" -> 10)
  private val MixBudget = 20000L
  private val MixBuckets = 64

  private def q96(s: SparkSession, dir: String): DataFrame =
    buildMixture(Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        col("text")), MixWeights, MixBudget, MixBuckets)
      .groupBy(col("lang"))
      .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("kept_tokens"),
        count(lit(1)).as("n_total"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang"))

  // the CASE embeds the SAME precomputed per-bucket integer shares the
  // Spark side derives (weight*budget/(100*buckets), floor): 40% -> 125,
  // 20% -> 62, 10% -> 31 at budget 20000 over 64 buckets
  private val q96Sql =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
      |      AS n_tokens,
      |    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
      |     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
      |     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 64
      |      AS bucket,
      |    md5(CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |r AS (
      |  SELECT *,
      |    CASE lang WHEN 'en' THEN 125 WHEN 'fr' THEN 62 WHEN 'de' THEN 62
      |              WHEN 'es' THEN 31 WHEN 'zh' THEN 31 ELSE 0 END AS share,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY lang, bucket ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run_before
      |  FROM d)
      |SELECT lang,
      |  CAST(count(*) FILTER (run_before < share) AS BIGINT) AS n_kept,
      |  CAST(coalesce(sum(n_tokens) FILTER (run_before < share), 0) AS BIGINT)
      |    AS kept_tokens,
      |  count(*) AS n_total,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM r GROUP BY lang ORDER BY lang""".stripMargin

  /** Deterministic epoch shuffle — the reproducible global permutation a
    * training run needs per epoch (decorrelates batches; same seed → same
    * order on any cluster layout, so a preempted job resumes mid-epoch).
    * Order key = md5(seed:doc_id): uniform, engine-independent, and
    * collision-free in practice. The permutation POSITION is assigned by
    * the same range-partition + per-partition-index scheme as chunk
    * numbering (`ChunkAssigner.withRowNumber`) — a global sort without a
    * single-task funnel, so the shuffle is shuffle-bounded at any corpus
    * size. Returns (epoch_pos, all original columns). */
  def epochShuffle(docs: DataFrame, seed: Long): DataFrame =
    graft.chunk.ChunkAssigner.withRowNumber(
      docs.withColumn("__ek", md5(concat_ws(":", lit(seed), col("doc_id")))),
      Seq(col("__ek")), rnName = "epoch_pos")
      .drop("__ek")

  private def q74(s: SparkSession, dir: String): DataFrame =
    epochShuffle(Tables.documents(s, dir).select(col("doc_id")), seed = 7L)
      .select(col("epoch_pos"), col("doc_id"))
      .orderBy(col("epoch_pos"))

  private val q74Sql =
    """SELECT row_number() OVER (ORDER BY md5('7:' || doc_id)) - 1 AS epoch_pos,
      |  doc_id
      |FROM documents ORDER BY epoch_pos""".stripMargin

  // -- trainer-shard assembly: fixed-length token-id sequences ---------------
  // The LAST step of a training-data pipeline — the thing the trainer
  // actually reads: every document BPE-encoded to ids under a
  // deterministic vocab, the whole corpus laid out as one virtual token
  // stream in doc_id order, and the stream cut into fixed seqLen sequences
  // that cross document boundaries (GPT-style packing; only the final
  // tail is short). The global layout needs an exclusive prefix sum of
  // per-doc token counts — `ChunkAssigner.withPrefixSum`, the distributed
  // scan, NOT a single-task unpartitioned window.

  /** (seq_id, n_tok, id_sum, first_id, last_id, ids_md5) for the corpus
    * packed into `seqLen`-token sequences. Vocab = the corpus's distinct
    * BPE tokens ranked in sort order (ids 0..V−1, deterministic). */
  def packTokenIds(docs: DataFrame, seqLen: Int,
      merges: Seq[(String, String)] = TextAnalysis.BpeMerges): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val enc = docs.select(col("doc_id"),
      TextAnalysis.bpeTokens(col("text"), merges).as("toks"))
      .filter(size(col("toks")) > 0)
    // vocabulary-sized ranking via the same distributed numbering the
    // chunk operators use (0-based, token sort order)
    val vocab = graft.chunk.ChunkAssigner.withRowNumber(
      enc.select(explode(col("toks")).as("token")).distinct(),
      Seq(col("token")), rnName = "tok_id")
    val withOff = graft.chunk.ChunkAssigner.withPrefixSum(
      enc, Seq(col("doc_id")), size(col("toks")), outName = "tok_off")
    val positioned = withOff
      .select(col("tok_off"), posexplode(col("toks")).as(Seq("j", "token")))
      .withColumn("pos", col("tok_off") + col("j"))
    // Round 16 (guide §3.1): the vocab side is TOKEN-TYPE domain — it
    // grows sublinearly with the corpus (Heaps' law; a BPE-style vocab is
    // effectively bounded), while `positioned` is the full exploded token
    // stream. The planner saw two ExistingRDDs of unknown size and picked
    // a sort-merge join, shuffling + sorting every (token, pos) row by
    // token string (plans/r15/q100_token_shards_before.txt: SortMergeJoin
    // with an Exchange on each side). Broadcasting the vocab removes the
    // stream-side exchange and sort outright; the only remaining full-
    // stream shuffle is the unavoidable groupBy(seq_id).
    positioned.join(broadcast(vocab), Seq("token"))
      .select((col("pos") / seqLen).cast("long").as("seq_id"),
        (col("pos") % seqLen).as("k"), col("tok_id"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("tok_id")).as("id_sum"),
        min_by(col("tok_id"), col("k")).as("first_id"),
        max_by(col("tok_id"), col("k")).as("last_id"),
        md5(concat_ws(",",
          transform(array_sort(collect_list(struct(col("k"), col("tok_id")))),
            s => s.getField("tok_id")))).as("ids_md5"))
      .select(col("seq_id"), col("n_tok"), col("id_sum"),
        col("first_id"), col("last_id"), col("ids_md5"))
  }

  private def q100(s: SparkSession, dir: String): DataFrame =
    packTokenIds(Tables.documents(s, dir), seqLen = 2048)
      .orderBy(col("seq_id"))

  private lazy val q100Sql: String = {
    val base = "'|' || array_to_string(string_split(w, ''), '||') || '|'"
    val chain = TextAnalysis.BpeMerges.foldLeft(base) { case (acc, (l, r)) =>
      s"replace($acc, '|$l||$r|', '|$l$r|')"
    }
    s"""WITH norm AS (
       |  SELECT doc_id, list_filter(string_split(
       |      regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' '),
       |      x -> x <> '') AS words
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id, flatten(list_transform(words, w ->
       |    string_split(trim($chain, '|'), '||'))) AS toks
       |  FROM norm),
       |ne AS (SELECT doc_id, toks FROM enc WHERE len(toks) > 0),
       |vocab AS (
       |  SELECT token, row_number() OVER (ORDER BY token) - 1 AS tok_id
       |  FROM (SELECT DISTINCT unnest(toks) AS token FROM ne)),
       |off AS (
       |  SELECT doc_id, toks, CAST(coalesce(sum(len(toks)) OVER (
       |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |    0) AS BIGINT) AS tok_off
       |  FROM ne),
       |ex AS (
       |  SELECT tok_off + j AS pos, toks[j+1] AS token
       |  FROM off, unnest(range(len(toks))) AS u(j)),
       |ids AS (
       |  SELECT pos // 2048 AS seq_id, pos % 2048 AS k, tok_id
       |  FROM ex JOIN vocab USING (token))
       |SELECT seq_id, count(*) AS n_tok, CAST(sum(tok_id) AS BIGINT) AS id_sum,
       |  arg_min(tok_id, k) AS first_id, arg_max(tok_id, k) AS last_id,
       |  md5(array_to_string(list(tok_id ORDER BY k), ',')) AS ids_md5
       |FROM ids GROUP BY seq_id ORDER BY seq_id""".stripMargin
  }

  // ==== q105: deterministic source interleave (curriculum ordering) =========
  //
  // A training stream read in storage order sees long single-source runs
  // (all of source A, then all of B, ...), which skews early training.
  // Round-robin interleave fixes the ORDER, not the mixture: position p
  // holds the p-th element of the (rn, source) lexicographic order, where
  // rn is the row's rank WITHIN its source — within one "round" (fixed rn)
  // every source that still has rows appears exactly once, in source order,
  // so a run of one source can only happen after every other source is
  // exhausted. Fully deterministic: no RNG, stable under repartitioning.
  //
  // Scale: the per-source rn is a hash-shuffle window; the global position
  // comes from ChunkAssigner.withPrefixSum (range shuffle + per-partition
  // base offsets — the q100 distributed exclusive scan), never a
  // single-task global window. Two shuffles total, both on the full
  // corpus but both key-balanced.

  /** Round-robin interleave of `df` across `group`, ordered within each
    * group by `order` (must be unique per group). Adds `rn` (1-based rank
    * within group) and `pos` (0-based global round-robin position). */
  def interleave(df: DataFrame, group: Column, order: Column): DataFrame = {
    val w = Window.partitionBy(group).orderBy(order)
    val ranked = df.withColumn("rn", row_number().over(w))
    graft.chunk.ChunkAssigner.withPrefixSum(
      ranked, Seq(col("rn"), group), lit(1L), outName = "pos")
  }

  private def q105(s: SparkSession, dir: String): DataFrame =
    interleave(Tables.documents(s, dir).select(col("doc_id"), col("source")),
        col("source"), col("doc_id"))
      .select(col("pos"), col("rn"), col("source"), col("doc_id"))
      .orderBy(col("pos"))

  private val q105Sql =
    """WITH r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM documents)
      |SELECT row_number() OVER (ORDER BY rn, source) - 1 AS pos,
      |  rn, source, doc_id
      |FROM r ORDER BY pos""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q105_source_interleave", q105, Some(q105Sql)),
    QueryDef("q100_token_shards", q100, Some(q100Sql)),
    QueryDef("q74_epoch_shuffle", q74, Some(q74Sql)),
    QueryDef("q64_segment_dedup", q64, Some(q64Sql)),
    QueryDef("q90_substring_repeats", q90, Some(q90Sql)),
    QueryDef("q91_substring_rewrite", q91, Some(q91Sql)),
    QueryDef("q65_corpus_freq_quality", q65, Some(q65Sql)),
    QueryDef("q66_group_sample", q66, Some(q66Sql)),
    QueryDef("q67_pii_redact", q67, Some(q67Sql)),
    QueryDef("q70_incremental_dedup", q70, Some(q70Sql)),
    QueryDef("q71_curation_report", q71, Some(q71Sql)),
    QueryDef("q85_corpus_diff", q85, Some(q85Sql)),
    QueryDef("q86_shard_manifest", q86, Some(q86Sql)),
    QueryDef("q93_leakage_safe_split", q93, Some(q93Sql)),
    QueryDef("q96_train_mixture", q96, Some(q96Sql)))
}
