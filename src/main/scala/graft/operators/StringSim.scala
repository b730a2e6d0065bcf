package graft.operators

import graft.Tables
import graft.functions.JaroWinkler
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Jaro–Winkler similarity join — the non-metric companion to the
  * edit-distance family (B39/q92): JW is the record-linkage standard for
  * short person/entity names (census linkage, MDM), but it satisfies no
  * triangle inequality, so PassJoin-style segment indexing does not
  * apply. The scalable plan is canopy blocking: candidates must share a
  * cheap deterministic block key (here: first byte + a length band), the
  * codegen'd [[JaroWinkler]] scalar scores only within blocks, and the
  * threshold prunes before anything shuffles again.
  *
  * Blocking is a declared recall contract, not a heuristic the engine
  * hides: a pair that disagrees in its first byte or by more than
  * `lenBand` in length is OUT of scope by definition (for jw >= 0.9 on
  * realistic name keys, first-byte agreement is near-implied — the
  * Winkler boost itself rewards shared prefixes). The oracle mirrors the
  * same block predicate, so both engines score the identical candidate
  * set with the identical double — the expression reproduces DuckDB's
  * jaro_winkler_similarity bit-for-bit (same match window, boost
  * threshold 0.7, prefix cap 4, evaluation order).
  *
  * Scale shape: block keys are map-side; the join shuffles on
  * (first byte) with the length predicate applied at the join; scoring
  * is one static call per candidate inside WholeStageCodegen. Skew
  * guard: a hot first letter is bounded by the length band; for corpora
  * where that is not enough, block on the first TWO bytes (the `prefix`
  * knob) — same contract, finer buckets.
  */
object StringSim {

  /** Candidate pairs of (`queries`.qkey) x (`corpus`.key) with shared
    * `prefix`-byte block, length within `lenBand`, and jw >= `minSim`.
    * Output: qkey, key, sim (DECIMAL(38,4) string). */
  def jaroWinklerJoin(queries: DataFrame, corpus: DataFrame,
      minSim: Double, prefix: Int = 1, lenBand: Int = 2): DataFrame = {
    val q = queries.select(col("qkey"),
      substring(col("qkey"), 1, prefix).as("__blk"),
      length(col("qkey")).as("__ql"))
    val c = corpus.select(col("key"),
      substring(col("key"), 1, prefix).as("__blk"),
      length(col("key")).as("__cl"))
    q.join(c, Seq("__blk"))
      .filter(abs(col("__ql") - col("__cl")) <= lenBand)
      .withColumn("__sim", JaroWinkler.of(col("qkey"), col("key")))
      .filter(col("__sim") >= minSim)
      .select(col("qkey"), col("key"), QueryDef.dec4(col("__sim")).as("sim"))
  }

  // ==== q205: typo-variant linkage over the corpus vocabulary ==============
  //
  // The vocabulary is the distinct token set; queries are three
  // deterministic corruptions of each token of length >= 4 — adjacent
  // transposition (chars 2,3), deletion (char 2), and a pluralizing
  // suffix — the classic typo classes JW is built for. Released: every
  // (variant, token) pair at jw >= 0.85 under the 1-byte/±2 block, with
  // the similarity itself — hash-matching the sim column IS the
  // bit-parity certificate for the native expression.

  private def vocab(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(Tok.ws(col("text"))).as("t"))
      .distinct()

  private def q205(s: SparkSession, dir: String): DataFrame = {
    val v = vocab(s, dir)
    val base = v.filter(length(col("t")) >= 4)
    val variants = base.select(concat(substring(col("t"), 1, 1),
        substring(col("t"), 3, 1), substring(col("t"), 2, 1),
        substring(col("t"), 4, 1000000)).as("qkey"))
      .unionByName(base.select(concat(substring(col("t"), 1, 1),
        substring(col("t"), 3, 1000000)).as("qkey")))
      .unionByName(base.select(concat(col("t"), lit("s")).as("qkey")))
      .distinct()
    jaroWinklerJoin(variants, v.select(col("t").as("key")), minSim = 0.85)
      .orderBy(col("qkey"), col("key"))
  }

  private val q205Sql =
    """WITH toks AS (
      |  SELECT DISTINCT unnest(list_filter(string_split(text, ' '),
      |    x -> x <> '')) AS t
      |  FROM documents),
      |base AS (SELECT t FROM toks WHERE length(t) >= 4),
      |variants AS (
      |  SELECT DISTINCT qkey FROM (
      |    SELECT substr(t, 1, 1) || substr(t, 3, 1) || substr(t, 2, 1)
      |      || substr(t, 4) AS qkey FROM base
      |    UNION ALL
      |    SELECT substr(t, 1, 1) || substr(t, 3) FROM base
      |    UNION ALL
      |    SELECT t || 's' FROM base))
      |SELECT qkey, t AS key,
      |  CAST(CAST(jaro_winkler_similarity(qkey, t) AS DECIMAL(38,4))
      |    AS VARCHAR) AS sim
      |FROM variants JOIN toks
      |  ON substr(qkey, 1, 1) = substr(t, 1, 1)
      |  AND abs(length(qkey) - length(t)) <= 2
      |  AND jaro_winkler_similarity(qkey, t) >= 0.85
      |ORDER BY qkey, key""".stripMargin

  // ==== q252: Fellegi–Sunter probabilistic record linkage ====================
  //
  // The decision layer ABOVE raw string similarity (q205/q92): each field
  // comparison contributes a log-likelihood-ratio weight — ln(m/u) on
  // agreement, ln((1−m)/(1−u)) on disagreement, with m = P(agree | same
  // entity), u = P(agree | different entities) — and the pair's match
  // score is the sum. Fields over the customer table: name JW ≥ 0.95
  // (m=.9, u=.1), account balance within $100 (m=.7, u=.02), market
  // segment equality (m=.9, u=.2 — five segments). The weights are
  // compile-time constants, hard-coded as ⌊10⁶·ln⌋ micro-nat integer
  // literals in both engines, so scores are exact integer sums.
  //
  // Scale shape: candidate pairs come from blocking on c_nationkey (the
  // B8 bounded-block contract: pair enumeration is quadratic per block —
  // production blocking adds finer keys or sorted-neighborhood windows,
  // same plan shape); JW runs once per candidate inside codegen, and the
  // native expression reproduces DuckDB's jaro_winkler_similarity
  // bit-for-bit (q205), so both engines score the identical set. Top-20
  // render is a TakeOrdered, not a global sort.

  /** Top-20 linkage candidates: (a, b, jw_agree, bal_agree, seg_agree,
    * score_micro, score), ordered by score desc then (a, b). */
  def fellegiSunter(customer: DataFrame): DataFrame = {
    val l = customer.select(col("c_custkey").as("a"),
      col("c_name").as("name_a"), col("c_nationkey").as("blk"),
      round(col("c_acctbal") * 100).cast("long").as("bal_a"),
      col("c_mktsegment").as("seg_a"))
    val r = customer.select(col("c_custkey").as("b"),
      col("c_name").as("name_b"), col("c_nationkey").as("blk"),
      round(col("c_acctbal") * 100).cast("long").as("bal_b"),
      col("c_mktsegment").as("seg_b"))
    l.join(r, Seq("blk")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        when(JaroWinkler.of(col("name_a"), col("name_b")) >= 0.95, 1L)
          .otherwise(0L).as("jw_agree"),
        when(abs(col("bal_a") - col("bal_b")) <= 10000L, 1L)
          .otherwise(0L).as("bal_agree"),
        when(col("seg_a") === col("seg_b"), 1L).otherwise(0L)
          .as("seg_agree"))
      .select(col("a"), col("b"), col("jw_agree"), col("bal_agree"),
        col("seg_agree"),
        (when(col("jw_agree") === 1, 2197224L).otherwise(-2197225L) +
          // ⌊10⁶·ln(.9/.1)⌋ / ⌊10⁶·ln(.1/.9)⌋
          when(col("bal_agree") === 1, 3555348L).otherwise(-1183771L) +
          // ⌊10⁶·ln(.7/.02)⌋ / ⌊10⁶·ln(.3/.98)⌋
          when(col("seg_agree") === 1, 1504077L).otherwise(-2079442L))
          // ⌊10⁶·ln(.9/.2)⌋ / ⌊10⁶·ln(.1/.8)⌋
          .as("score_micro"))
      .withColumn("score",
        QueryDef.dec4(col("score_micro").cast("double") / lit(1e6)))
      .orderBy(col("score_micro").desc, col("a"), col("b"))
      .limit(20)
  }

  private def q252(s: SparkSession, dir: String): DataFrame =
    fellegiSunter(graft.Tables.customer(s, dir))

  private val q252Sql =
    """WITH c AS (
      |  SELECT c_custkey AS k, c_name AS name, c_nationkey AS blk,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
      |    c_mktsegment AS seg
      |  FROM customer),
      |pairs AS (
      |  SELECT l.k AS a, r.k AS b,
      |    CASE WHEN jaro_winkler_similarity(l.name, r.name) >= 0.95
      |      THEN 1 ELSE 0 END AS jw_agree,
      |    CASE WHEN abs(l.bal - r.bal) <= 10000 THEN 1 ELSE 0 END
      |      AS bal_agree,
      |    CASE WHEN l.seg = r.seg THEN 1 ELSE 0 END AS seg_agree
      |  FROM c l JOIN c r ON l.blk = r.blk AND l.k < r.k)
      |SELECT a, b, CAST(jw_agree AS BIGINT) AS jw_agree,
      |  CAST(bal_agree AS BIGINT) AS bal_agree,
      |  CAST(seg_agree AS BIGINT) AS seg_agree,
      |  CAST(CASE WHEN jw_agree = 1 THEN 2197224 ELSE -2197225 END
      |    + CASE WHEN bal_agree = 1 THEN 3555348 ELSE -1183771 END
      |    + CASE WHEN seg_agree = 1 THEN 1504077 ELSE -2079442 END
      |    AS BIGINT) AS score_micro,
      |  CAST(CAST(CAST(CASE WHEN jw_agree = 1 THEN 2197224 ELSE -2197225 END
      |    + CASE WHEN bal_agree = 1 THEN 3555348 ELSE -1183771 END
      |    + CASE WHEN seg_agree = 1 THEN 1504077 ELSE -2079442 END
      |    AS DOUBLE) / 1000000.0 AS DECIMAL(38,4)) AS VARCHAR) AS score
      |FROM pairs
      |ORDER BY score_micro DESC, a, b LIMIT 20""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q252_fellegi_sunter", q252, Some(q252Sql)),
    QueryDef("q205_jw_join", q205, Some(q205Sql)))
}
