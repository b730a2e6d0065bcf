package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact fuzzy (edit-distance) join — the entity-matching / fuzzy-lookup
  * operator: find every (query, corpus) key pair within Levenshtein
  * distance d, WITHOUT the all-pairs cross join.
  *
  * Candidate generation is the PassJoin segment scheme (Li, Deng, Feng —
  * PVLDB 5(3), "PassJoin: a partition-based method for similarity joins"):
  * each corpus key of length n is split into d+1 contiguous segments; by
  * pigeonhole, any string within edit distance d of it must contain at
  * least one segment VERBATIM, starting within ±d of the segment's home
  * position. So the corpus is indexed by (segment#, segment text, n) —
  * d+1 short keys per row, linear in the corpus — and each query
  * enumerates its substrings at the allowed (length, segment, position)
  * combinations: at most (2d+1) lengths × (d+1) segments × (2d+1)
  * positions ≈ 75 probe keys at d=2. Candidates are the bucket matches;
  * the exact `levenshtein` built-in (codegen'd) verifies. No false
  * negatives (pigeonhole is a theorem, not a heuristic) and no UDFs.
  *
  * Scale shape: the index is a projection+explode of the corpus (never
  * shuffled when the probe side broadcasts); probes are |queries|×~75
  * short rows — broadcast for lookup-style workloads (the common case:
  * match a dirty batch against a reference corpus), shuffle-join on the
  * segment key when both sides are large. Verification touches only
  * candidate pairs, each a ≤`maxKeyLen`-char comparison.
  *
  * Contract: both inputs expose (id, key) with keys ≥ max(3, d+1) chars
  * (shorter keys are dropped from both sides — with fewer than d+1
  * characters the segment scheme degenerates; pre-filter or pad if they
  * matter).
  * Reference scope: the reference app has no fuzzy matching — this is a
  * Tier-B capability extension in the dedup/similarity family
  * (SURVEY.md §2 B30/B31 neighborhood).
  */
object FuzzyJoin {

  /** Max edit distance supported by the 3-segment index below. */
  val DefaultDist = 2

  /** Normalized 32-char match key for free text: lowercase, strip
    * everything outside [a-z0-9 ], take the first 32 chars. DuckDB twin:
    * substring(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, 32). */
  def normKey(text: Column): Column =
    substring(regexp_replace(lower(text), "[^a-z0-9 ]", ""), 1, 32)

  // Even (d+1)-way partition of a length-n key, 1-based starts: segment i
  // gets floor(n/(d+1)) chars plus one of the n mod (d+1) remainder chars.
  // The SAME arithmetic must drive the index and the probes — any drift
  // breaks the pigeonhole guarantee silently, so both sides call these.
  private def segLen(n: Column, i: Column, d: Int): Column =
    floor(n / (d + 1)).cast("int") +
      when(i < n % (d + 1), lit(1)).otherwise(lit(0))

  private def segStart(n: Column, i: Column, d: Int): Column =
    lit(1) + i * floor(n / (d + 1)).cast("int") + least(i, n % (d + 1))

  // Minimum indexable key length for distance d: with fewer than d+1 chars
  // the (d+1)-way partition would contain empty segments, and filtering
  // those on the probe side only would silently break the pigeonhole
  // completeness guarantee — so both sides drop sub-(d+1) keys together.
  private def minKeyLenFor(d: Int): Int = math.max(3, d + 1)

  /** (id, key) → one index row per segment: (gi, seg, klen, id, key). */
  private def segmentIndex(corpus: DataFrame, d: Int): DataFrame = {
    val n = length(col("key"))
    corpus.filter(length(col("key")) >= minKeyLenFor(d))
      .select(col("id"), col("key"),
        explode(array((0 to d).map(lit(_)): _*)).as("gi"))
      .select(col("id"), col("key"), col("gi"),
        col("key").substr(segStart(n, col("gi"), d), segLen(n, col("gi"), d))
          .as("seg"),
        n.as("klen"))
  }

  /** (query_id, qkey) → every (gi, seg, klen) probe key the pigeonhole
    * bound allows: corpus lengths within ±d, each segment's text taken
    * from the query at positions shifted by at most d. */
  private def probeKeys(queries: DataFrame, d: Int): DataFrame = {
    val minLen = minKeyLenFor(d)
    val q = queries.filter(length(col("qkey")) >= minLen)
      .withColumn("m", length(col("qkey")))
      .withColumn("klen",
        explode(sequence(greatest(col("m") - d, lit(minLen)), col("m") + d)))
      .withColumn("gi", explode(array((0 to d).map(lit(_)): _*)))
      .withColumn("slen", segLen(col("klen"), col("gi"), d))
      .withColumn("plo",
        greatest(segStart(col("klen"), col("gi"), d) - d, lit(1)))
      .withColumn("phi",
        least(segStart(col("klen"), col("gi"), d) + d,
          col("m") - col("slen") + lit(1)))
      .filter(col("slen") >= 1 && col("plo") <= col("phi"))
      .withColumn("pos", explode(sequence(col("plo"), col("phi"))))
      // PassJoin's multi-match-aware shift bound (exact, §4.2 of the paper):
      // aligning corpus segment [s0, s0+slen) to query position pos forces
      // at least |Δ| edits in the prefix and |(m−klen)−Δ| in the suffix
      // (each edit changes a side's length by at most 1), so any pos with
      // |Δ| + |(m−klen)−Δ| > d cannot participate in a ≤d match. Tighter
      // than the plain ±d window whenever the lengths differ — at d=2,
      // |m−klen|=2 this keeps 1 position instead of 5.
      .withColumn("__shift",
        col("pos") - segStart(col("klen"), col("gi"), d))
      .filter(abs(col("__shift")) +
        abs(col("m") - col("klen") - col("__shift")) <= d)
    q.select(col("query_id"), col("qkey"), col("gi"),
      col("qkey").substr(col("pos"), col("slen")).as("seg"), col("klen"))
      .distinct()
  }

  /** The capped segment index: each (gi, seg, klen) bucket keeps its `cap`
    * lowest ids. `top_k` of (−id) descending = the cap smallest ids with
    * k-capped map-side state — no shuffle ever carries an uncapped bucket.
    * Package-private so the skew spec can assert the bucket bound. */
  private[operators] def cappedIndexForTest(corpus: DataFrame, d: Int,
      cap: Int): DataFrame =
    segmentIndex(corpus, d)
      .groupBy(col("gi"), col("seg"), col("klen"))
      .agg(graft.functions.TopKAgg.of(
        struct((-col("id")).as("nid"), col("key")), cap).as("__kept"))
      .select(col("gi"), col("seg"), col("klen"),
        explode(col("__kept")).as("__e"))
      .select(col("gi"), col("seg"), col("klen"),
        (-col("__e.nid")).as("id"), col("__e.key").as("key"))

  /** Every (query_id, id, dist) with levenshtein(qkey, key) <= maxDist.
    * `corpus`: (id, key); `queries`: (query_id, qkey). Keys shorter than
    * max(3, maxDist+1) chars are dropped from both sides (see
    * `minKeyLenFor`). Set `broadcastProbes=false` when the
    * query side is too large to broadcast — the candidate join then
    * shuffles both sides on the segment key.
    *
    * `maxBucket`: skew guard for dirty corpora. A stop-word-like segment
    * (all spaces, a boilerplate prefix) shared by millions of keys makes
    * the candidate join quadratic in that one bucket. With `maxBucket =
    * Some(cap)`, each (gi, seg, klen) index bucket keeps only the `cap`
    * LOWEST ids — candidate work per bucket is then ≤ cap × |matching
    * probes|, and the cap is enforced map-side (a k-capped `TopKAgg`
    * buffer, so not even the shuffle carries an uncapped bucket — capping
    * through a row_number window would funnel the hot bucket through one
    * reducer, the exact skew this guards against). DOCUMENTED TRADEOFF:
    * a true ≤d match whose every shared segment sits in an over-cap bucket
    * beyond the kept ids is missed — exactness holds only with the default
    * `None`. Deterministic either way (lowest-id survivors). */
  def editDistanceJoin(corpus: DataFrame, queries: DataFrame,
      maxDist: Int = DefaultDist, broadcastProbes: Boolean = true,
      maxBucket: Option[Int] = None,
      maxBlock: Option[Long] = None): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(maxBucket.forall(_ >= 1), s"maxBucket must be >= 1: $maxBucket")
    val idx0 = maxBucket.fold(segmentIndex(corpus, maxDist))(
      cappedIndexForTest(corpus, maxDist, _))
    // ENFORCED block contract (the q268 jaroWinklerSelfJoin precedent):
    // candidate work per (gi, seg, klen) bucket is |index bucket| ×
    // |matching probes|, quadratic in a self-join — with `maxBlock` the
    // population census runs on the ONE materialized index and an
    // over-populated segment bucket raises before the join can, with the
    // fix named (the map-side `maxBucket` cap, or a longer key prefix).
    val idx = maxBlock.fold(idx0) { bound =>
      val ck = idx0.localCheckpoint()
      val hottest = ck.groupBy(col("gi"), col("seg"), col("klen"))
        .agg(count(lit(1)).as("n")).agg(max(col("n"))).collect()(0)
      val maxN = if (hottest.isNullAt(0)) 0L else hottest.getLong(0)
      require(maxN <= bound,
        s"editDistanceJoin: hottest (gi, seg, klen) segment bucket holds " +
          s"$maxN keys > maxBlock=$bound — a stop-word-like segment makes " +
          "the candidate join quadratic in that bucket; cap it map-side " +
          "with `maxBucket` (k-capped TopKAgg, documented recall tradeoff)" +
          " or lengthen the normalized key so segments discriminate")
      ck
    }
    val probes0 = probeKeys(queries, maxDist)
    val probes = if (broadcastProbes) broadcast(probes0) else probes0
    idx.join(probes, Seq("gi", "seg", "klen"))
      .select(col("query_id"), col("id"), col("qkey"), col("key"))
      .distinct()
      .withColumn("dist", levenshtein(col("qkey"), col("key")))
      .filter(col("dist") <= maxDist)
      .select(col("query_id"), col("id"), col("dist"))
  }

  // -- oracled query ---------------------------------------------------------
  //
  // Lookup-style fuzzy match, FULLY oracle-hash-matched (the candidate
  // scheme is exact, so unlike the LSH gates the complete pair list is
  // deterministic): corpus = normalized 32-char document keys (>= 6 chars),
  // queries = docs 0..24's keys with the first two chars rewritten to "zz"
  // (a deterministic <= 2-edit mutation both engines can express). DuckDB
  // verifies with its own levenshtein over the length-filtered cross
  // product — the oracle pays O(|q|×|corpus|), the engine never does.

  private val MinKeyLen = 6
  private val NQueries = 25

  private def fuzzyOracled(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(s, dir)
      .select(col("doc_id"), normKey(col("text")).as("key"))
      .filter(length(col("key")) >= MinKeyLen)
    val corpus = keyed.select(col("doc_id").as("id"), col("key"))
    val queries = keyed.filter(col("doc_id") < NQueries)
      .select(col("doc_id").as("query_id"),
        concat(lit("zz"), col("key").substr(lit(3), length(col("key"))))
          .as("qkey"))
    editDistanceJoin(corpus, queries, maxDist = 2)
      .select(col("query_id"), col("id").as("doc_id"), col("dist"))
      .orderBy(col("query_id"), col("doc_id"))
  }

  private val fuzzySql =
    """WITH k AS (
      |  SELECT doc_id,
      |         substring(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |                   1, 32) AS key
      |  FROM documents),
      |corpus AS (SELECT doc_id, key FROM k WHERE length(key) >= 6),
      |q AS (
      |  SELECT doc_id AS query_id, 'zz' || substr(key, 3) AS qkey
      |  FROM corpus WHERE doc_id < 25)
      |SELECT query_id, corpus.doc_id AS doc_id,
      |       levenshtein(qkey, key) AS dist
      |FROM q CROSS JOIN corpus
      |WHERE abs(length(qkey) - length(key)) <= 2
      |  AND levenshtein(qkey, key) <= 2
      |ORDER BY query_id, doc_id""".stripMargin

  // ==== q174: entity resolution — block, score, cluster =====================
  //
  // The full ER pipeline as one composition of the engine's own oracled
  // parts: PassJoin-blocked edit-distance SELF-join (candidates from
  // segment buckets, never all-pairs; probes shuffled, not broadcast —
  // the both-sides-huge regime) → match edges at ≤ 2 edits → connected
  // components (pointer jumping) → cluster-size census. The oracle pays
  // the O(n²) cross product + recursive closure it exists to avoid, so
  // the entity slice is id-bounded (doc_id < 500 — fixed test surface at
  // every SF, the q98 discipline); the engine-side shapes are the
  // unbounded-scale ones throughout.

  /** (cluster_size, n_clusters) census after resolving `entities`
    * (id, key) at ≤ `maxDist` edits. The self-join has no broadcastable
    * side, so the PassJoin block contract is ENFORCED, not declared:
    * `maxBlock` bounds the hottest segment bucket's population (within-
    * bucket candidates are quadratic there) and raises with the fix
    * named before the join runs. */
  def resolveEntities(entities: DataFrame, maxDist: Int,
      maxBlock: Long = 10000L): DataFrame = {
    val edges = editDistanceJoin(
        entities.select(col("id"), col("key")),
        entities.select(col("id").as("query_id"), col("key").as("qkey")),
        maxDist, broadcastProbes = false, maxBlock = Some(maxBlock))
      .filter(col("query_id") < col("id"))
      .select(col("query_id").as("src"), col("id").as("dst"))
    Dedup.connectedComponents(edges, entities.select(col("id")))
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
  }

  private def q174(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(s, dir).filter(col("doc_id") < 500)
      .select(col("doc_id"), normKey(col("text")).as("key"))
      .filter(length(col("key")) >= MinKeyLen)
    // planted duplicate identities: every doc < 40 returns with its first
    // two chars rewritten — a deterministic ≤ 2-edit alias
    val clones = keyed.filter(col("doc_id") < 40)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("zz"), col("key").substr(lit(3), length(col("key"))))
          .as("key"))
    resolveEntities(
      keyed.unionByName(clones).select(col("doc_id").as("id"), col("key")),
      maxDist = 2)
      .orderBy(col("cluster_size"))
  }

  private val q174Sql =
    """WITH RECURSIVE k AS (
      |  SELECT doc_id,
      |    substring(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |      1, 32) AS key
      |  FROM documents WHERE doc_id < 500),
      |keyed AS (SELECT doc_id, key FROM k WHERE length(key) >= 6),
      |aug AS (
      |  SELECT doc_id, key FROM keyed
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'zz' || substr(key, 3) FROM keyed
      |  WHERE doc_id < 40),
      |p AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db
      |  FROM aug a JOIN aug b ON a.doc_id < b.doc_id
      |    AND abs(length(a.key) - length(b.key)) <= 2
      |    AND levenshtein(a.key, b.key) <= 2),
      |edges AS (SELECT da AS u, db AS v FROM p UNION SELECT db, da FROM p),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u),
      |lab AS (
      |  SELECT a.doc_id, least(a.doc_id, coalesce(min(r.v), a.doc_id))
      |    AS cluster_id
      |  FROM aug a LEFT JOIN reach r ON r.u = a.doc_id GROUP BY a.doc_id),
      |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
      |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
      |  count(*) AS n_clusters
      |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q92_fuzzy_join", fuzzyOracled, Some(fuzzySql)),
    QueryDef("q174_entity_resolution", q174, Some(q174Sql)))
}
