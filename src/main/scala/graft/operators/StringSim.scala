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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q205_jw_join", q205, Some(q205Sql)))
}
