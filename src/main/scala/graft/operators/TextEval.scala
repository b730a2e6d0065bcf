package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generation-quality metrics over candidate/reference text pairs: corpus
  * BLEU (q247) and ROUGE-N (q248) — the standard evaluation loop for any
  * pipeline that produces text (translation, summarization, distillation
  * filtering). The deterministic pair: candidate = the document's full
  * token stream, reference = the same stream with every 7th token dropped
  * (an "MT output vs shorter human reference" stand-in with real clipped
  * n-gram overlap, candidate length > reference length by construction).
  *
  * Scale shape: the tokenized (candidate, reference) frame is
  * localCheckpoint'ed once (eight consumers: 4 gram sizes × 2 sides — the
  * q184 multiple-consumer precedent), each side explodes all four gram
  * sizes in ONE union before a single (doc, n, gram) count, and the
  * clip join is co-partitioned on the same key. Floats: every numerator/
  * denominator is an exact integer; precisions divide once at render, and
  * BLEU's geometric mean is sqrt(sqrt(p1·p2·p3·p4)) — two IEEE-exact
  * sqrts, bit-identical across engines (the q194 sqrt rule; no pow, no
  * exp on the exercised path).
  */
object TextEval {

  /** Every n-gram of `t` for n in [1, maxN], as side-tagged (n, g, ic,
    * ir) rows per doc — one exploded union covering BOTH sides, grams
    * joined with ' ' (tokens are whitespace-split, so the join is
    * injective per n). Tagging the side instead of counting each side
    * separately lets the clip core run as ONE (doc, n, gram) aggregate
    * with conditional sums — no (doc, n, gram)-keyed full-outer join of
    * two gram tables (measured ~2× on q278's char-gram variant). */
  private def taggedGrams(toks: DataFrame, maxN: Int): DataFrame =
    (1 to maxN).flatMap { n =>
      Seq(("c", 1L, 0L), ("r", 0L, 1L)).map { case (side, ic, ir) =>
        toks.select(col("doc_id"), lit(n).as("n"),
          explode(when(size(col(side)) >= n,
            transform(sequence(lit(0), size(col(side)) - n),
              i => array_join(slice(col(side), i + lit(1), lit(n)), " ")))
            .otherwise(array().cast("array<string>"))).as("g"),
          lit(ic).as("ic"), lit(ir).as("ir"))
      }
    }.reduce(_ unionByName _)

  /** (doc_id, c, r): candidate tokens + drop-every-7th reference tokens. */
  private def pairs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Tok.ws(col("text")).as("c"))
      .select(col("doc_id"), col("c"),
        filter(col("c"), (_, i) => pmod(i, lit(7)) =!= 6).as("r"))

  /** Clipped-match totals per gram size: (n, den_c, den_r, clip) —
    * den_c/den_r the candidate/reference gram counts, clip the
    * min(cand, ref) matched mass. The shared core of BLEU and ROUGE.
    * `toks` must already be materialized (localCheckpoint) — it is
    * consumed 2·maxN times. */
  private def clippedTotals(toks: DataFrame, maxN: Int): DataFrame =
    taggedGrams(toks, maxN)
      .groupBy(col("doc_id"), col("n"), col("g"))
      .agg(sum(col("ic")).as("cnt_c"), sum(col("ir")).as("cnt_r"))
      .groupBy(col("n"))
      .agg(sum(col("cnt_c")).as("den_c"), sum(col("cnt_r")).as("den_r"),
        sum(least(col("cnt_c"), col("cnt_r"))).as("clip"))

  // ==== q247: corpus BLEU-4 ==================================================

  /** One row: (c_len, r_len, bp, p1..p4, bleu4). bp = min(1, e^(1−r/c))
    * is 1 by construction here (candidate ⊇ reference); the exp branch
    * exists for generality but never fires on the oracle path. */
  def bleuCorpus(docs: DataFrame): DataFrame = {
    val toks = pairs(docs).localCheckpoint()
    val lens = toks.agg(
      sum(size(col("c")).cast("long")).as("c_len"),
      sum(size(col("r")).cast("long")).as("r_len"))
    val pn = clippedTotals(toks, 4)
    val cols = (1 to 4).flatMap(n => Seq(
      max(when(col("n") === n, col("clip"))).as(s"num$n"),
      max(when(col("n") === n, col("den_c"))).as(s"den$n")))
    val wide = pn.agg(cols.head, cols.tail: _*)
    def p(n: Int) = col(s"num$n").cast("double") / col(s"den$n").cast("double")
    lens.crossJoin(broadcast(wide)).select(
      col("c_len"), col("r_len"),
      QueryDef.dec4(when(col("c_len") > col("r_len"), lit(1.0))
        .otherwise(exp(lit(1.0) - col("r_len").cast("double") /
          col("c_len").cast("double")))).as("bp"),
      QueryDef.dec4(p(1)).as("p1"), QueryDef.dec4(p(2)).as("p2"),
      QueryDef.dec4(p(3)).as("p3"), QueryDef.dec4(p(4)).as("p4"),
      QueryDef.dec4(when(col("c_len") > col("r_len"), lit(1.0))
        .otherwise(exp(lit(1.0) - col("r_len").cast("double") /
          col("c_len").cast("double"))) *
        sqrt(sqrt(p(1) * p(2) * p(3) * p(4)))).as("bleu4"))
  }

  private def q247(s: SparkSession, dir: String): DataFrame =
    bleuCorpus(Tables.documents(s, dir))

  // the shared candidate/reference CTE + per-(doc,n,gram) counts, DuckDB
  private val pairSql =
    """d AS (
      |  SELECT doc_id, toks AS c,
      |    list_filter(toks, (x, i) -> (i - 1) % 7 <> 6) AS r
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '),
      |      x -> x <> '') AS toks FROM documents)),
      |ns AS (SELECT * FROM (VALUES (1), (2), (3), (4)) AS t(n)),
      |cg AS (
      |  SELECT doc_id, ns.n AS n, g, count(*) AS cnt_c
      |  FROM d CROSS JOIN ns,
      |    UNNEST(CASE WHEN len(c) >= ns.n THEN
      |      list_transform(range(1, len(c) - ns.n + 2),
      |        i -> array_to_string(c[i:i + ns.n - 1], ' '))
      |      ELSE [] END) AS u(g)
      |  GROUP BY 1, 2, 3),
      |rg AS (
      |  SELECT doc_id, ns.n AS n, g, count(*) AS cnt_r
      |  FROM d CROSS JOIN ns,
      |    UNNEST(CASE WHEN len(r) >= ns.n THEN
      |      list_transform(range(1, len(r) - ns.n + 2),
      |        i -> array_to_string(r[i:i + ns.n - 1], ' '))
      |      ELSE [] END) AS u(g)
      |  GROUP BY 1, 2, 3),
      |tot AS (
      |  SELECT n,
      |    CAST(sum(COALESCE(cnt_c, 0)) AS BIGINT) AS den_c,
      |    CAST(sum(COALESCE(cnt_r, 0)) AS BIGINT) AS den_r,
      |    CAST(sum(least(COALESCE(cnt_c, 0), COALESCE(cnt_r, 0)))
      |      AS BIGINT) AS clip
      |  FROM cg FULL OUTER JOIN rg USING (doc_id, n, g)
      |  GROUP BY n)""".stripMargin

  private val q247Sql =
    s"""WITH $pairSql,
       |lens AS (
       |  SELECT CAST(sum(len(c)) AS BIGINT) AS c_len,
       |    CAST(sum(len(r)) AS BIGINT) AS r_len FROM d),
       |wide AS (
       |  SELECT
       |    max(CASE WHEN n = 1 THEN clip END) AS num1,
       |    max(CASE WHEN n = 1 THEN den_c END) AS den1,
       |    max(CASE WHEN n = 2 THEN clip END) AS num2,
       |    max(CASE WHEN n = 2 THEN den_c END) AS den2,
       |    max(CASE WHEN n = 3 THEN clip END) AS num3,
       |    max(CASE WHEN n = 3 THEN den_c END) AS den3,
       |    max(CASE WHEN n = 4 THEN clip END) AS num4,
       |    max(CASE WHEN n = 4 THEN den_c END) AS den4
       |  FROM tot)
       |SELECT c_len, r_len,
       |  CAST(CAST(CASE WHEN c_len > r_len THEN 1.0
       |    ELSE exp(1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE))
       |    END AS DECIMAL(38,4)) AS VARCHAR) AS bp,
       |  CAST(CAST(CAST(num1 AS DOUBLE) / CAST(den1 AS DOUBLE)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS p1,
       |  CAST(CAST(CAST(num2 AS DOUBLE) / CAST(den2 AS DOUBLE)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS p2,
       |  CAST(CAST(CAST(num3 AS DOUBLE) / CAST(den3 AS DOUBLE)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS p3,
       |  CAST(CAST(CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS p4,
       |  CAST(CAST((CASE WHEN c_len > r_len THEN 1.0
       |      ELSE exp(1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE))
       |      END)
       |    * sqrt(sqrt((CAST(num1 AS DOUBLE) / CAST(den1 AS DOUBLE))
       |      * (CAST(num2 AS DOUBLE) / CAST(den2 AS DOUBLE))
       |      * (CAST(num3 AS DOUBLE) / CAST(den3 AS DOUBLE))
       |      * (CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE))))
       |    AS DECIMAL(38,4)) AS VARCHAR) AS bleu4
       |FROM lens CROSS JOIN wide""".stripMargin

  // ==== q248: ROUGE-1 / ROUGE-2 ==============================================

  /** One row per gram size n ∈ {1, 2}: (n, ref_grams, cand_grams,
    * matches, recall, precision, f1) — clipped-match recall against the
    * reference (ROUGE's orientation), with the precision/F1 companions. */
  def rougeN(docs: DataFrame): DataFrame =
    clippedTotals(pairs(docs).localCheckpoint(), 2).select(
      col("n"), col("den_r").as("ref_grams"), col("den_c").as("cand_grams"),
      col("clip").as("matches"),
      QueryDef.dec4(col("clip").cast("double") /
        col("den_r").cast("double")).as("recall"),
      QueryDef.dec4(col("clip").cast("double") /
        col("den_c").cast("double")).as("precision"),
      QueryDef.dec4(lit(2.0) * col("clip").cast("double") /
        (col("den_r") + col("den_c")).cast("double")).as("f1"))
      .orderBy(col("n"))

  private def q248(s: SparkSession, dir: String): DataFrame =
    rougeN(Tables.documents(s, dir))

  private val q248Sql =
    s"""WITH ${pairSql.replace("(1), (2), (3), (4)", "(1), (2)")}
       |SELECT n, den_r AS ref_grams, den_c AS cand_grams, clip AS matches,
       |  CAST(CAST(CAST(clip AS DOUBLE) / CAST(den_r AS DOUBLE)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS recall,
       |  CAST(CAST(CAST(clip AS DOUBLE) / CAST(den_c AS DOUBLE)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS precision,
       |  CAST(CAST(2.0 * CAST(clip AS DOUBLE)
       |      / CAST(den_r + den_c AS DOUBLE)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS f1
       |FROM tot ORDER BY n""".stripMargin

  // ==== q278: chrF character n-gram F-score ==================================
  //
  // The tokenizer-free metric completing the BLEU/ROUGE pair (Popović
  // 2015): word n-grams punish morphology-rich languages, so chrF scores
  // CHARACTER n-grams (n = 1..6, whitespace removed) with the
  // recall-weighted F: chrF_n = (1+β²)·P·R / (β²·P + R) at β = 2. Same
  // candidate/reference derivation as q247, same clipped-totals core —
  // one exploded union of all 6 gram sizes per side, one (doc, n, gram)
  // count, one co-partitioned clip join. Per-n rows only (no cross-n
  // average row — a 6-term double sum would hang determinism on
  // aggregation order); P/R/F divide exact integers at render.

  /** Per char-gram size n = 1..`maxN`: (n, den_c, den_r, clip, prec,
    * rec, chrf) with β = 2. */
  def chrF(docs: DataFrame, maxN: Int = 6): DataFrame = {
    val strs = pairs(docs)
      .select(col("doc_id"), array_join(col("c"), "").as("cs"),
        array_join(col("r"), "").as("rs"))
      .localCheckpoint()
    // Round 16 note (examined, left as 12 thin branches DELIBERATELY): a
    // single-Generate rewrite that builds all (n, g, side) tags per row
    // via flatten(transform(sequence(1, 6), …)) of 4-field structs was
    // measured 5.7× SLOWER at sf0.1 (27.9 s vs 4.9 s rdd min, no codegen
    // fallback) — materializing ~6·len tagged structs per row before the
    // explode costs far more in allocation/copy than the 11 extra scans
    // of the checkpointed pair strings save (block-cached, ~MB-sized).
    // The per-branch arrays below stay PLAIN strings with constant-
    // foldable tag literals, which is the cheap shape for Generate.
    val tagged = (1 to maxN).flatMap { n =>
      Seq(("cs", 1L, 0L), ("rs", 0L, 1L)).map { case (side, ic, ir) =>
        strs.select(col("doc_id"), lit(n).as("n"),
          explode(when(length(col(side)) >= n,
            transform(sequence(lit(1), length(col(side)) - n + 1),
              i => col(side).substr(i, lit(n))))
            .otherwise(array().cast("array<string>"))).as("g"),
          lit(ic).as("ic"), lit(ir).as("ir"))
      }
    }.reduce(_ unionByName _)
    val tot = tagged
      .groupBy(col("doc_id"), col("n"), col("g"))
      .agg(sum(col("ic")).as("cnt_c"), sum(col("ir")).as("cnt_r"))
      .groupBy(col("n"))
      .agg(sum(col("cnt_c")).as("den_c"), sum(col("cnt_r")).as("den_r"),
        sum(least(col("cnt_c"), col("cnt_r"))).as("clip"))
    def dd(c: String) = col(c).cast("double")
    val p = dd("clip") / dd("den_c")
    val r = dd("clip") / dd("den_r")
    tot.select(col("n"), col("den_c"), col("den_r"), col("clip"),
      when(col("den_c") > 0, p).as("prec"),
      when(col("den_r") > 0, r).as("rec"),
      when(col("den_c") > 0 && col("den_r") > 0 && col("clip") > 0,
        lit(5.0) * p * r / (lit(4.0) * p + r)).as("chrf"))
  }

  private def q278(s: SparkSession, dir: String): DataFrame =
    chrF(Tables.documents(s, dir))
      .select(col("n"), col("den_c"), col("den_r"), col("clip"),
        QueryDef.dec4(col("prec")).as("prec"),
        QueryDef.dec4(col("rec")).as("rec"),
        QueryDef.dec4(col("chrf")).as("chrf"))
      .orderBy(col("n"))

  private val q278Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS c
      |  FROM documents),
      |strs AS (
      |  SELECT doc_id, list_aggregate(c, 'string_agg', '') AS cs,
      |    list_aggregate(
      |      list_filter(c, (x, i) -> (i - 1) % 7 <> 6), 'string_agg', '')
      |      AS rs
      |  FROM toks),
      |ns AS (SELECT unnest(range(1, 7)) AS n),
      |cg AS (
      |  SELECT doc_id, n, g, count(*) AS cnt_c FROM (
      |    SELECT doc_id, n, unnest(CASE WHEN length(cs) >= n
      |      THEN list_transform(range(1, length(cs) - n + 2),
      |        i -> substr(cs, i, n)) ELSE [] END) AS g
      |    FROM strs CROSS JOIN ns)
      |  GROUP BY 1, 2, 3),
      |rg AS (
      |  SELECT doc_id, n, g, count(*) AS cnt_r FROM (
      |    SELECT doc_id, n, unnest(CASE WHEN length(rs) >= n
      |      THEN list_transform(range(1, length(rs) - n + 2),
      |        i -> substr(rs, i, n)) ELSE [] END) AS g
      |    FROM strs CROSS JOIN ns)
      |  GROUP BY 1, 2, 3),
      |tot AS (
      |  SELECT n,
      |    CAST(sum(COALESCE(cnt_c, 0)) AS BIGINT) AS den_c,
      |    CAST(sum(COALESCE(cnt_r, 0)) AS BIGINT) AS den_r,
      |    CAST(sum(least(COALESCE(cnt_c, 0), COALESCE(cnt_r, 0)))
      |      AS BIGINT) AS clip
      |  FROM cg FULL OUTER JOIN rg USING (doc_id, n, g)
      |  GROUP BY n)
      |SELECT n, den_c, den_r, clip,
      |  CAST(CAST(CASE WHEN den_c > 0 THEN CAST(clip AS DOUBLE)
      |    / CAST(den_c AS DOUBLE) END AS DECIMAL(38,4)) AS VARCHAR) AS prec,
      |  CAST(CAST(CASE WHEN den_r > 0 THEN CAST(clip AS DOUBLE)
      |    / CAST(den_r AS DOUBLE) END AS DECIMAL(38,4)) AS VARCHAR) AS rec,
      |  CAST(CAST(CASE WHEN den_c > 0 AND den_r > 0 AND clip > 0
      |    THEN 5.0 * (CAST(clip AS DOUBLE) / CAST(den_c AS DOUBLE))
      |      * (CAST(clip AS DOUBLE) / CAST(den_r AS DOUBLE))
      |      / (4.0 * (CAST(clip AS DOUBLE) / CAST(den_c AS DOUBLE))
      |        + (CAST(clip AS DOUBLE) / CAST(den_r AS DOUBLE)))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS chrf
      |FROM tot ORDER BY n""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q278_chrf", q278, Some(q278Sql)),
    QueryDef("q247_bleu", q247, Some(q247Sql)),
    QueryDef("q248_rouge_n", q248, Some(q248Sql)))
}
