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

  /** All within-corpus pairs (`key_a` < `key_b`) with shared `prefix`-byte
    * block, length within `lenBand`, and jw >= `minSim` — the
    * both-sides-huge SELF-join shape (q174's analog for JW instead of
    * edit distance). Same declared-recall contract as
    * [[jaroWinklerJoin]]: a pair disagreeing in its first `prefix` bytes
    * or by more than `lenBand` in length is out of scope by declaration.
    *
    * Physical shape: the probe-vs-corpus plan broadcast its small side;
    * a self-join has no small side, so the equi-key must bound blocks by
    * BOTH contract dimensions. Rows join on (prefix, length-bucket) of
    * width lenBand+1: the home side registers once at bucket l div w,
    * the probe side explodes to its ≤3 adjacent buckets, so a pair
    * within the band shares exactly one (home, probe) bucket meeting —
    * every qualifying pair is generated EXACTLY once (no distinct pass)
    * and a hot prefix is subdivided by length. Scoring is one codegen'd
    * static call per candidate; the threshold prunes before anything
    * shuffles again.
    *
    * The (prefix, length-bucket) domain is a CONSTANT of the alphabet,
    * not of the data, so block population grows linearly with the corpus
    * and within-block candidate pairs grow QUADRATICALLY — the contract
    * is therefore ENFORCED, not just declared (the kendallTau
    * precedent): block sizes are counted on the one materialized keyed
    * projection and a block over `maxBlock` raises before the quadratic
    * join can run, with the fix named in the error (a longer `prefix`,
    * which multiplies blocks with the data — q268 uses 4 hex bytes). */
  def jaroWinklerSelfJoin(corpus: DataFrame, minSim: Double,
      prefix: Int = 2, lenBand: Int = 2, maxBlock: Long = 10000L)
      : DataFrame = {
    val w = (lenBand + 1).toLong
    val keyed = corpus.select(col("key"),
      substring(col("key"), 1, prefix).as("__blk"),
      length(col("key")).cast("long").as("__l"))
      .withColumn("__bkt", expr(s"__l div ${w}L"))
      .localCheckpoint()
    val hottest = keyed.groupBy(col("__blk"), col("__bkt"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).collect()(0)
    val maxN = if (hottest.isNullAt(0)) 0L else hottest.getLong(0)
    require(maxN <= maxBlock,
      s"jaroWinklerSelfJoin: hottest ($prefix-byte prefix, length-bucket)" +
        s" block holds $maxN keys > maxBlock=$maxBlock — within-block " +
        "pairs are quadratic in block population; raise `prefix` so " +
        "blocks multiply with the data (q268 blocks on 4 bytes)")
    val home = keyed.select(col("key").as("key_a"), col("__blk"),
      col("__l").as("__la"), col("__bkt"))
    val probe = keyed.select(col("key").as("key_b"), col("__blk"),
      col("__l").as("__lb"),
      explode(sequence(col("__bkt") - 1, col("__bkt") + 1)).as("__bkt"))
    home.join(probe, Seq("__blk", "__bkt"))
      .filter(col("key_a") < col("key_b") &&
        abs(col("__la") - col("__lb")) <= lenBand)
      .withColumn("__sim", JaroWinkler.of(col("key_a"), col("key_b")))
      .filter(col("__sim") >= minSim)
      .select(col("key_a"), col("key_b"),
        QueryDef.dec4(col("__sim")).as("sim"))
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
  // Scale shape: candidate pairs come from COMPOSITE blocking on
  // (c_nationkey, name-prefix-minus-2) — nationkey alone is 25 constant
  // blocks, so within-block pairs would grow QUADRATICALLY with customer
  // count (1.8B pairs/block at 100× sf0.1); the prefix key multiplies
  // blocks with the data instead, so block size is bounded by the
  // suffix domain (≤100 for digit-tailed names) plus exact duplicates
  // and total pairs grow linearly. DECLARED-RECALL contract (the q205
  // canopy precedent — JW has no triangle inequality to index by): only
  // pairs agreeing on all but the last 2 name chars are candidates;
  // high-JW pairs differing earlier are out of contract by declaration.
  // JW runs once per candidate inside codegen, and the native expression
  // reproduces DuckDB's jaro_winkler_similarity bit-for-bit (q205), so
  // both engines score the identical set. Top-20 render is a
  // TakeOrdered, not a global sort.

  /** Blocked candidate pairs with per-field agreement bits:
    * (a, b, jw_agree, bal_agree, seg_agree) — the shared front end of
    * q252 (fixed-weight scoring) and q264 (EM weight estimation). */
  private[operators] def linkagePairs(customer: DataFrame): DataFrame = {
    val pfx = col("c_name")
      .substr(lit(1), greatest(length(col("c_name")) - 2, lit(1)))
    val l = customer.select(col("c_custkey").as("a"),
      col("c_name").as("name_a"), col("c_nationkey").as("blk"),
      pfx.as("pfx"),
      round(col("c_acctbal") * 100).cast("long").as("bal_a"),
      col("c_mktsegment").as("seg_a"))
    val r = customer.select(col("c_custkey").as("b"),
      col("c_name").as("name_b"), col("c_nationkey").as("blk"),
      pfx.as("pfx"),
      round(col("c_acctbal") * 100).cast("long").as("bal_b"),
      col("c_mktsegment").as("seg_b"))
    l.join(r, Seq("blk", "pfx")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        when(JaroWinkler.of(col("name_a"), col("name_b")) >= 0.95, 1L)
          .otherwise(0L).as("jw_agree"),
        when(abs(col("bal_a") - col("bal_b")) <= 10000L, 1L)
          .otherwise(0L).as("bal_agree"),
        when(col("seg_a") === col("seg_b"), 1L).otherwise(0L)
          .as("seg_agree"))
  }

  /** Top-20 linkage candidates: (a, b, jw_agree, bal_agree, seg_agree,
    * score_micro, score), ordered by score desc then (a, b). */
  def fellegiSunter(customer: DataFrame): DataFrame = {
    linkagePairs(customer)
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

  private val linkagePairsSql =
    """c AS (
      |  SELECT c_custkey AS k, c_name AS name, c_nationkey AS blk,
      |    substr(c_name, 1, greatest(length(c_name) - 2, 1)) AS pfx,
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
      |  FROM c l JOIN c r
      |    ON l.blk = r.blk AND l.pfx = r.pfx AND l.k < r.k)""".stripMargin

  private val q252Sql =
    s"""WITH $linkagePairsSql
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

  // ==== q264: Fellegi–Sunter EM parameter estimation ==========================
  //
  // q252 scores with textbook m/u constants; production linkage (Splink,
  // the Census Bureau lineage) LEARNS them unsupervised: EM over the
  // agreement-PATTERN histogram. With 3 binary fields there are only 8
  // patterns, so after one corpus-sized pass (the shared q252 pair
  // front end → pattern counts) the EM fixpoint runs on an 8-row domain
  // (the q255/q184 collected-domain discipline). Integer micro state: the
  // per-pattern E-step weight w = a/(a+b) is a double computed from the
  // PREVIOUS round's integer micro params (identical operands both
  // engines); the expected counts floor to ⌊10⁶·c·w⌋ BEFORE summing, and
  // every M-step update is an integer division — so params are exact
  // integers every round and the oracle replays all 10 iterations as
  // MATERIALIZED CTEs.

  private val EmIters = 10

  /** EM over pattern -> count (pattern bits: 1 = jw, 2 = bal, 4 = seg).
    * Returns (λ_micro, m_micro(3), u_micro(3)). */
  private[operators] def emFit(hist: Map[Int, Long])
      : (Long, Array[Long], Array[Long]) = {
    val n = hist.values.sum
    var lm = 100000L
    var m = Array(800000L, 800000L, 800000L)
    var u = Array(200000L, 200000L, 200000L)
    def f(g: Int, p: Long): Double =
      if (g == 1) p / 1000000.0 else 1.0 - p / 1000000.0
    for (_ <- 1 to EmIters) {
      val rows = (0 to 7).map { p =>
        val c = hist.getOrElse(p, 0L)
        val g = Array(p & 1, (p >> 1) & 1, (p >> 2) & 1)
        val a = lm / 1000000.0 * f(g(0), m(0)) * f(g(1), m(1)) *
          f(g(2), m(2))
        val b = (1.0 - lm / 1000000.0) * f(g(0), u(0)) * f(g(1), u(1)) *
          f(g(2), u(2))
        val w = if (a + b > 0) a / (a + b) else 0.0
        (g, math.floor(1000000.0 * c * w).toLong,
          math.floor(1000000.0 * c * (1.0 - w)).toLong)
      }
      val sSum = rows.map(_._2).sum
      val sbSum = rows.map(_._3).sum
      lm = if (n > 0) sSum / n else 0L
      m = Array.tabulate(3)(fi => if (sSum > 0)
        (BigInt(1000000L) * rows.filter(_._1(fi) == 1).map(_._2).sum /
          sSum).toLong else 0L)
      u = Array.tabulate(3)(fi => if (sbSum > 0)
        (BigInt(1000000L) * rows.filter(_._1(fi) == 1).map(_._3).sum /
          sbSum).toLong else 0L)
    }
    (lm, m, u)
  }

  /** 8 rows: per agreement pattern (pattern, jw_g, bal_g, seg_g, n_pairs,
    * match_w) plus the learned params as constant columns. */
  def fellegiSunterEm(customer: DataFrame): DataFrame = {
    val spark = customer.sparkSession
    import spark.implicits._
    val hist = linkagePairs(customer)
      .select((col("jw_agree") + col("bal_agree") * 2L +
        col("seg_agree") * 4L).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val (lm, m, u) = emFit(hist)
    def f(g: Int, p: Long): Double =
      if (g == 1) p / 1000000.0 else 1.0 - p / 1000000.0
    val rows = (0 to 7).map { p =>
      val g = Array(p & 1, (p >> 1) & 1, (p >> 2) & 1)
      val a = lm / 1000000.0 * f(g(0), m(0)) * f(g(1), m(1)) * f(g(2), m(2))
      val b = (1.0 - lm / 1000000.0) * f(g(0), u(0)) * f(g(1), u(1)) *
        f(g(2), u(2))
      (p, g(0), g(1), g(2), hist.getOrElse(p, 0L),
        if (a + b > 0) a / (a + b) else 0.0)
    }
    rows.toDF("pattern", "jw_g", "bal_g", "seg_g", "n_pairs", "w")
      .select(col("pattern"), col("jw_g"), col("bal_g"), col("seg_g"),
        col("n_pairs"), QueryDef.dec4(col("w")).as("match_w"),
        QueryDef.dec4(lit(lm / 1000000.0)).as("lambda"),
        QueryDef.dec4(lit(m(0) / 1000000.0)).as("m_jw"),
        QueryDef.dec4(lit(m(1) / 1000000.0)).as("m_bal"),
        QueryDef.dec4(lit(m(2) / 1000000.0)).as("m_seg"),
        QueryDef.dec4(lit(u(0) / 1000000.0)).as("u_jw"),
        QueryDef.dec4(lit(u(1) / 1000000.0)).as("u_bal"),
        QueryDef.dec4(lit(u(2) / 1000000.0)).as("u_seg"))
      .orderBy(col("pattern"))
  }

  private def q264(s: SparkSession, dir: String): DataFrame =
    fellegiSunterEm(Tables.customer(s, dir))

  private val q264Sql = {
    def fm(g: String, p: String) =
      s"(CASE WHEN $g = 1 THEN $p / 1000000.0 ELSE 1.0 - $p / 1000000.0 END)"
    def step(k: Int): String = {
      val pv = s"p${k - 1}"
      s"""w$k AS MATERIALIZED (
         |  SELECT p, c, g1, g2, g3,
         |    CASE WHEN a + b > 0 THEN a / (a + b) ELSE 0.0 END AS w FROM (
         |    SELECT h.p, h.c, h.g1, h.g2, h.g3,
         |      $pv.l / 1000000.0 * ${fm("h.g1", s"$pv.m1")}
         |        * ${fm("h.g2", s"$pv.m2")} * ${fm("h.g3", s"$pv.m3")} AS a,
         |      (1.0 - $pv.l / 1000000.0) * ${fm("h.g1", s"$pv.u1")}
         |        * ${fm("h.g2", s"$pv.u2")} * ${fm("h.g3", s"$pv.u3")} AS b
         |    FROM hist h CROSS JOIN $pv)),
         |s$k AS MATERIALIZED (
         |  SELECT g1, g2, g3,
         |    CAST(floor(1000000.0 * c * w) AS HUGEINT) AS s,
         |    CAST(floor(1000000.0 * c * (1.0 - w)) AS HUGEINT) AS sb
         |  FROM w$k),
         |p$k AS MATERIALIZED (
         |  SELECT
         |    CAST(sum(s) AS HUGEINT) // (SELECT CAST(sum(c) AS HUGEINT)
         |      FROM hist) AS l,
         |    (1000000 * sum(CASE WHEN g1 = 1 THEN s ELSE 0 END))
         |      // sum(s) AS m1,
         |    (1000000 * sum(CASE WHEN g2 = 1 THEN s ELSE 0 END))
         |      // sum(s) AS m2,
         |    (1000000 * sum(CASE WHEN g3 = 1 THEN s ELSE 0 END))
         |      // sum(s) AS m3,
         |    (1000000 * sum(CASE WHEN g1 = 1 THEN sb ELSE 0 END))
         |      // sum(sb) AS u1,
         |    (1000000 * sum(CASE WHEN g2 = 1 THEN sb ELSE 0 END))
         |      // sum(sb) AS u2,
         |    (1000000 * sum(CASE WHEN g3 = 1 THEN sb ELSE 0 END))
         |      // sum(sb) AS u3
         |  FROM s$k),""".stripMargin
    }
    val steps = (1 to EmIters).map(step).mkString("\n")
    s"""WITH $linkagePairsSql,
       |base AS MATERIALIZED (
       |  SELECT p FROM (
       |    SELECT jw_agree + 2 * bal_agree + 4 * seg_agree AS p
       |    FROM pairs)),
       |hist AS MATERIALIZED (
       |  SELECT g.p, COALESCE(c.c, 0) AS c,
       |    g.p % 2 AS g1, (g.p // 2) % 2 AS g2, (g.p // 4) % 2 AS g3
       |  FROM (SELECT CAST(range AS BIGINT) AS p FROM range(0, 8)) g
       |    LEFT JOIN (SELECT p, count(*) AS c FROM base GROUP BY p) c
       |    ON c.p = g.p),
       |p0 AS MATERIALIZED (
       |  SELECT CAST(100000 AS HUGEINT) AS l,
       |    CAST(800000 AS HUGEINT) AS m1, CAST(800000 AS HUGEINT) AS m2,
       |    CAST(800000 AS HUGEINT) AS m3,
       |    CAST(200000 AS HUGEINT) AS u1, CAST(200000 AS HUGEINT) AS u2,
       |    CAST(200000 AS HUGEINT) AS u3),
       |$steps
       |fin AS (
       |  SELECT h.p AS pattern, h.g1 AS jw_g, h.g2 AS bal_g,
       |    h.g3 AS seg_g, h.c AS n_pairs,
       |    CASE WHEN pp.l / 1000000.0 * ${fm("h.g1", "pp.m1")}
       |      * ${fm("h.g2", "pp.m2")} * ${fm("h.g3", "pp.m3")}
       |      + (1.0 - pp.l / 1000000.0) * ${fm("h.g1", "pp.u1")}
       |      * ${fm("h.g2", "pp.u2")} * ${fm("h.g3", "pp.u3")} > 0
       |    THEN (pp.l / 1000000.0 * ${fm("h.g1", "pp.m1")}
       |      * ${fm("h.g2", "pp.m2")} * ${fm("h.g3", "pp.m3")})
       |    / (pp.l / 1000000.0 * ${fm("h.g1", "pp.m1")}
       |      * ${fm("h.g2", "pp.m2")} * ${fm("h.g3", "pp.m3")}
       |      + (1.0 - pp.l / 1000000.0) * ${fm("h.g1", "pp.u1")}
       |      * ${fm("h.g2", "pp.u2")} * ${fm("h.g3", "pp.u3")})
       |    ELSE 0.0 END AS w,
       |    pp.l, pp.m1, pp.m2, pp.m3, pp.u1, pp.u2, pp.u3
       |  FROM hist h CROSS JOIN p$EmIters pp)
       |SELECT CAST(pattern AS INTEGER) AS pattern,
       |  CAST(jw_g AS INTEGER) AS jw_g, CAST(bal_g AS INTEGER) AS bal_g,
       |  CAST(seg_g AS INTEGER) AS seg_g,
       |  CAST(n_pairs AS BIGINT) AS n_pairs,
       |  CAST(CAST(w AS DECIMAL(38,4)) AS VARCHAR) AS match_w,
       |  CAST(CAST(CAST(l AS DOUBLE) / 1000000.0 AS DECIMAL(38,4))
       |    AS VARCHAR) AS lambda,
       |  CAST(CAST(CAST(m1 AS DOUBLE) / 1000000.0 AS DECIMAL(38,4))
       |    AS VARCHAR) AS m_jw,
       |  CAST(CAST(CAST(m2 AS DOUBLE) / 1000000.0 AS DECIMAL(38,4))
       |    AS VARCHAR) AS m_bal,
       |  CAST(CAST(CAST(m3 AS DOUBLE) / 1000000.0 AS DECIMAL(38,4))
       |    AS VARCHAR) AS m_seg,
       |  CAST(CAST(CAST(u1 AS DOUBLE) / 1000000.0 AS DECIMAL(38,4))
       |    AS VARCHAR) AS u_jw,
       |  CAST(CAST(CAST(u2 AS DOUBLE) / 1000000.0 AS DECIMAL(38,4))
       |    AS VARCHAR) AS u_bal,
       |  CAST(CAST(CAST(u3 AS DOUBLE) / 1000000.0 AS DECIMAL(38,4))
       |    AS VARCHAR) AS u_seg
       |FROM fin ORDER BY pattern""".stripMargin
  }

  // ==== q268: JW self-join over planted typo families =======================
  //
  // The both-sides-huge linkage shape: the corpus is its own probe set —
  // no broadcastable side exists, so candidates come from the
  // (prefix × length-bucket) equi-key of [[jaroWinklerSelfJoin]].
  // Families are planted deterministically: each customer key seeds an
  // 8-hex-char "name" (md5 — the q124 engine-shared string hash, so
  // both engines derive the identical corpus; prefixes are uniform,
  // unlike c_name's constant "Customer#" head) plus 3 trailing-edit
  // variants — appended char, doubled last char, trailing transposition
  // — all agreeing on the first 6 chars and within the ±2 length band:
  // in contract by construction. prefix=4 is the self-join scale knob:
  // 65536 uniform blocks, so block size GROWS SUBLINEARLY with the
  // table (customers/65k) instead of quadratically per constant block.
  // Cross-family hits satisfying the declared predicate are in the
  // output too (the predicate IS the semantics; both engines score the
  // identical candidate set — hash-matching `sim` re-certifies the
  // native expression's bit-parity with DuckDB on every pair).

  private def q268(s: SparkSession, dir: String): DataFrame = {
    val seeds = Tables.customer(s, dir)
      .select(expr("substring(md5(cast(c_custkey as string)), 1, 8)").as("t"))
    val members = seeds.select(col("t").as("key"))
      .unionByName(seeds.select(concat(col("t"), lit("x")).as("key")))
      .unionByName(seeds.select(
        concat(col("t"), substring(col("t"), -1, 1)).as("key")))
      .unionByName(seeds.select(concat(
        substring(col("t"), 1, 6),
        substring(col("t"), 8, 1),
        substring(col("t"), 7, 1)).as("key")))
      .distinct()
    jaroWinklerSelfJoin(members, minSim = 0.9, prefix = 4)
      .orderBy(col("key_a"), col("key_b"))
  }

  private val q268Sql =
    """WITH seeds AS (
      |  SELECT substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS t
      |  FROM customer),
      |members AS (
      |  SELECT DISTINCT key FROM (
      |    SELECT t AS key FROM seeds
      |    UNION ALL SELECT t || 'x' FROM seeds
      |    UNION ALL SELECT t || substr(t, -1, 1) FROM seeds
      |    UNION ALL SELECT substr(t, 1, 6) || substr(t, 8, 1)
      |      || substr(t, 7, 1) FROM seeds))
      |SELECT a.key AS key_a, b.key AS key_b,
      |  CAST(CAST(jaro_winkler_similarity(a.key, b.key) AS DECIMAL(38,4))
      |    AS VARCHAR) AS sim
      |FROM members a JOIN members b
      |  ON substr(a.key, 1, 4) = substr(b.key, 1, 4)
      |  AND abs(length(a.key) - length(b.key)) <= 2
      |  AND a.key < b.key
      |  AND jaro_winkler_similarity(a.key, b.key) >= 0.9
      |ORDER BY key_a, key_b""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q268_jw_selfjoin", q268, Some(q268Sql)),
    QueryDef("q264_fs_em", q264, Some(q264Sql)),
    QueryDef("q252_fellegi_sunter", q252, Some(q252Sql)),
    QueryDef("q205_jw_join", q205, Some(q205Sql)))
}
