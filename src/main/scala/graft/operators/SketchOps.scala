package graft.operators

import graft.Tables
import graft.functions.{BloomFilterAgg, BloomProbeLit, CmsEstimate, CountMinSketchAgg}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-backed corpus operators plus deterministic batch-prep transforms —
  * the pieces that replace corpus-sized shuffles with fixed-size state at
  * 100 TB (SURVEY.md §2 training-data extensions; reference capability tier:
  * the reference's dedup/counting services work per-ingestion batch,
  * `app/services/data_integrity_manager.py:25` — these are the corpus-scale
  * generalizations).
  *
  *  - q75: Bloom-filter incremental dedup — the scale path for q70's exact
  *    incremental dedup. The "seen corpus" is a 256 KiB bitset, not a join
  *    side: building it shuffles numBits/8 bytes per partition (bitwise-OR
  *    partials), probing a new batch is a broadcast + one scan, no join.
  *  - q76: count-min heavy-hitter counts — frequency estimates without
  *    shuffling the vocabulary: the depth×width grid merges map-side, so
  *    executors exchange 40960 longs instead of one row per distinct token.
  *  - q77: domain-mixture sampling — deterministic hash-threshold
  *    downsampling to a per-source target rate (the data-mixing step before
  *    training); no shuffle at all until the audit aggregation.
  *  - q78: sequence-length bucketing — power-of-two length buckets with
  *    exact padding-waste accounting (what a batching layer pads/truncates).
  *
  * Gate discipline (same as Dedup's recall gates): the sketch queries also
  * compute the exact answer on the small probe/plant set and emit boolean
  * gates the DuckDB oracle re-asserts — one-sided-error guarantees
  * (no Bloom false negatives, CMS never underestimates) become hard
  * driver-checked facts rather than claims.
  */
object SketchOps {

  // ==== q199: Bloom-prefiltered semi-join (runtime-filter reduction) ========
  //
  // The join-side counterpart of q75: when a huge probe side semi-joins a
  // selective build side, the probe's non-matching rows still pay the
  // shuffle in a plain SortMergeJoin/ShuffledHashJoin. Building a Bloom
  // filter over the build keys (one scan, fixed 256 KiB state), broadcasting
  // the finished bitset, and filtering the probe MAP-SIDE drops ~all
  // non-matching rows before they ever shuffle — the manual form of the
  // runtime row-filter AQE injects when statistics let it, made explicit
  // and composable. No false negatives ⇒ the exact semi-join that follows
  // sees a superset of the true matches and removes the ≤fp-rate
  // survivors, so the OUTPUT is bit-identical to the plain semi-join (the
  // oracle states the plain semi-join; BloomJoinSpec pins the reduction
  // itself and output equality).

  /** `probe` left-semi `build` on `key`, with a broadcast Bloom prefilter
    * dropping non-matching probe rows before the shuffle. Output ==
    * plain left-semi join (zero false negatives; FPs cleaned exactly). */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, key: String): DataFrame = {
    // round-15 perf: aggregate the fixed-size bitset to the driver (the
    // same numBits/8 bytes the broadcast carried) and probe it as a plan
    // literal — the old crossJoin(broadcast) + filter idiom re-COPIED the
    // 256 KiB binary out of the joined row for every probe row and its
    // CodegenFallback broke the scan stage's codegen. Same bits, same
    // membership answers, so the output is unchanged.
    val bloomBytes = build.agg(
      BloomFilterAgg.of(xxhash64(col(key)), BloomBits, BloomK).as("bloom"))
      .head().getAs[Array[Byte]](0)
    probe.filter(BloomProbeLit.of(bloomBytes, xxhash64(col(key))))
      .join(build.select(col(key)).distinct(), Seq(key), "left_semi")
  }

  // probe = lineitem (the big side), build = one brand's parts (1/25 of
  // the domain) — the selective-dimension shape where the prefilter pays
  // for itself
  private def q199(s: SparkSession, dir: String): DataFrame = {
    val build = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey").as("l_partkey"))
    bloomSemiJoin(Tables.lineitem(s, dir), build, "l_partkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val q199Sql =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |WHERE l_partkey IN (
      |  SELECT p_partkey FROM part WHERE p_brand = 'Brand#13')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ==== q75: Bloom-filter incremental dedup ================================

  private val BloomBits = 1 << 21 // 256 KiB — capacity ~150k items at 1% fp
  private val BloomK = 5
  private val PlantN = 50L // copies of old docs planted into the new batch

  /** Flag rows of `newBatch` whose `text` was (maybe) seen in `seen`.
    * The filter build and the probe are both single-scan; the finished
    * bitset broadcasts. No false negatives by construction. */
  def bloomSeenFlags(seen: DataFrame, newBatch: DataFrame): DataFrame = {
    // driver-held bitset + literal probe, not crossJoin(broadcast): see
    // bloomSemiJoin — identical flags, minus a 256 KiB copy per row
    val bloomBytes = seen.agg(
      BloomFilterAgg.of(xxhash64(col("text")), BloomBits, BloomK).as("bloom"))
      .head().getAs[Array[Byte]](0)
    newBatch.withColumn("maybe_seen",
      BloomProbeLit.of(bloomBytes, xxhash64(col("text"))))
  }

  private def q75(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val old = docs.filter(col("doc_id") % 2 === 0)
    // new batch = the odd half plus planted exact copies of 25 old docs,
    // so the no-false-negative gate is exercised by construction
    val planted = old.filter(col("doc_id") < PlantN)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    val newBatch = docs.filter(col("doc_id") % 2 === 1).unionByName(planted)

    val flagged = bloomSeenFlags(old, newBatch)
      .join(old.select(col("text")).distinct().withColumn("is_dup", lit(true)),
        Seq("text"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))

    flagged.agg(
      count(lit(1)).as("n_new"),
      sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_exact_dup"),
      // Bloom guarantee: every exact dup is flagged — zero false negatives
      coalesce(bool_and(!col("is_dup") || col("maybe_seen")), lit(true))
        .as("zero_false_neg"),
      // fp budget: the 2^21-bit filter holds the corpus at << 1% fp; gate
      // at 10% of the batch so the bound is robust across scale factors
      (sum(when(col("maybe_seen") && !col("is_dup"), 1L).otherwise(0L))
        <= count(lit(1)) / 10).as("fp_ok"))
  }

  private val q75Sql =
    """WITH old AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
      |newd AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT doc_id + 1000000000, text FROM documents
      |  WHERE doc_id % 2 = 0 AND doc_id < 50),
      |flags AS (
      |  SELECT doc_id, text IN (SELECT text FROM old) AS is_dup FROM newd)
      |SELECT count(*) AS n_new,
      |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
      |  TRUE AS zero_false_neg, TRUE AS fp_ok
      |FROM flags""".stripMargin

  // ==== q76: count-min-sketch heavy hitters ================================

  private val CmsDepth = 5
  private val CmsWidth = 8192
  private val TopK = 20

  /** CMS frequency grid over a token column plus the exact top-k for the
    * gate; returns one row of audit gates. */
  private def q76(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(Tok.ws(col("text"))).as("token"))
    val cms = toks.agg(
      CountMinSketchAgg.of(xxhash64(col("token")), CmsDepth, CmsWidth).as("cms"),
      count(lit(1)).as("n_total"))
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(TopK)
    top.crossJoin(broadcast(cms)) // single-row scalar join idiom
      .withColumn("est", CmsEstimate.of(col("cms"), xxhash64(col("token")), CmsWidth))
      .agg(
        count(lit(1)).as("n_probes"),
        sum(col("cnt")).as("sum_exact"),
        // CMS guarantee: estimates never undercount
        bool_and(col("est") >= col("cnt")).as("all_ge"),
        // overestimate bounded by collisions: eps = 1% of the stream is
        // ~27x the expected per-cell excess at width 8192, min over 5 rows
        bool_and(col("est") <= col("cnt") + col("n_total") / 100).as("all_within"))
  }

  private val q76Sql =
    """WITH tok AS (
      |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
      |    AS token
      |  FROM documents),
      |top AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token
      |        ORDER BY cnt DESC, token LIMIT 20)
      |SELECT count(*) AS n_probes, CAST(sum(cnt) AS BIGINT) AS sum_exact,
      |  TRUE AS all_ge, TRUE AS all_within
      |FROM top""".stripMargin

  // ==== q77: domain-mixture sampling =======================================

  /** Deterministic per-source downsampling to a target mixture: keep a doc
    * iff the first 4 md5 hex chars of "source:doc_id" fall under the
    * source's rate threshold. Pure map-side — the 100 TB corpus is sampled
    * in the scan; only the per-source audit rows shuffle. Rates here cycle
    * 25/50/80/100% by source index (a stand-in for a real mixture spec). */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val srcIdx = substring(col("source"), 4, 10).cast("int")
    val thr = when(srcIdx % 4 === 0, "4000")
      .when(srcIdx % 4 === 1, "8000")
      .when(srcIdx % 4 === 2, "cccc")
      .otherwise("ffff")
    Tables.documents(s, dir)
      .withColumn("keep",
        substring(md5(concat_ws(":", col("source"), col("doc_id").cast("string"))), 1, 4) < thr)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("sampled_chars"))
      .orderBy(col("source"))
  }

  private val q77Sql =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT)
      |    AS sampled_chars
      |FROM (
      |  SELECT source, n_chars,
      |    substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 4) <
      |      CASE CAST(substr(source, 4) AS INT) % 4
      |        WHEN 0 THEN '4000' WHEN 1 THEN '8000'
      |        WHEN 2 THEN 'cccc' ELSE 'ffff' END AS keep
      |  FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  // ==== q78: sequence-length bucketing =====================================

  private val MinBucket = 16
  private val MaxBucket = 4096

  /** Power-of-two length buckets with exact padding/truncation accounting:
    * bucket = clamp(next_pow2(n_tokens), 16, 4096); padding is what a
    * fixed-length batcher would pad, truncated counts docs over the cap.
    * Map-side arithmetic on the scan, tiny group-by at the end. */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val n = size(Tok.ws(col("text")))
    val bucket = when(n <= MinBucket, MinBucket)
      .otherwise(least(lit(MaxBucket),
        call_function("shiftleft", lit(1), length(bin((n - 1).cast("long"))))))
    Tables.documents(s, dir)
      .select(n.as("n_tokens"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("n_tokens"), lit(MaxBucket)).cast("long")).as("sum_tokens"),
        (col("bucket").cast("long") * count(lit(1))
          - sum(least(col("n_tokens"), lit(MaxBucket)).cast("long"))).as("padding"),
        sum(when(col("n_tokens") > MaxBucket, 1L).otherwise(0L)).as("n_truncated"))
      .orderBy(col("bucket"))
  }

  private val q78Sql =
    """WITH lens AS (
      |  SELECT len(list_filter(string_split(text, ' '), x -> x <> ''))
      |    AS n_tokens
      |  FROM documents),
      |b AS (
      |  SELECT n_tokens,
      |    CASE WHEN n_tokens <= 16 THEN 16
      |         ELSE least(4096, 1 << length(bin(n_tokens - 1))) END AS bucket
      |  FROM lens)
      |SELECT bucket, count(*) AS n_docs,
      |  CAST(sum(least(n_tokens, 4096)) AS BIGINT) AS sum_tokens,
      |  CAST(bucket * count(*) - sum(least(n_tokens, 4096)) AS BIGINT)
      |    AS padding,
      |  CAST(sum(CASE WHEN n_tokens > 4096 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_truncated
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  // -- deterministic weighted sampling (Efraimidis–Spirakis A-ES) ------------
  // Weighted sampling WITHOUT replacement is the data-mixing primitive the
  // hash-threshold samplers (q61/q66) can't express: inclusion probability
  // proportional to a per-row weight, one global sample of exactly k rows.
  // A-ES: draw u ∈ (0,1) per row, rank by u^(1/w), take the top k — a
  // theorem, not a heuristic. The draw comes from a salted md5 of the
  // stable key (the suite's no-RNG discipline): re-running, repartitioning
  // or growing the corpus never changes a row's draw, and both engines
  // compute the identical double from the identical 6 hex digits.

  /** Top-`k` weighted sample of `df`: P(inclusion) ∝ `weightCol` (> 0).
    * Runs as TakeOrdered over a map-side key — no full sort, no shuffle
    * beyond the k-row collect-to-one-partition every global top-k pays. */
  def weightedSample(df: DataFrame, k: Int, weightCol: Column,
      keyCol: Column): DataFrame = {
    val u = (conv(substring(md5(concat(lit("ws:"), keyCol.cast("string"))),
      1, 6), 16, 10).cast("double") + 1.0) / lit(16777218.0) // (0,1) open
    df.withColumn("__aes", pow(u, lit(1.0) / weightCol.cast("double")))
      .orderBy(col("__aes").desc, keyCol)
      .limit(k)
      .drop("__aes")
  }

  // Sample 100 docs with inclusion ∝ n_chars; emit only integer columns
  // (membership IS the assertion — the float key never leaves the engine,
  // and the cut row's key margin is ~1/n, far beyond any cross-engine ulp)
  private def q102(s: SparkSession, dir: String): DataFrame =
    weightedSample(
      Tables.documents(s, dir).filter(col("n_chars") > 0),
      k = 100, weightCol = col("n_chars"), keyCol = col("doc_id"))
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))

  private val q102Sql =
    """SELECT doc_id, n_chars FROM (
      |  SELECT doc_id, n_chars,
      |    pow((CAST(concat('0x', substr(md5(concat('ws:', CAST(doc_id AS VARCHAR))), 1, 6))
      |           AS BIGINT) + 1.0) / 16777218.0,
      |        1.0 / n_chars) AS aes
      |  FROM documents WHERE n_chars > 0
      |  ORDER BY aes DESC, doc_id LIMIT 100)
      |ORDER BY doc_id""".stripMargin

  // ==== q142: sketch-based join-cardinality estimation ======================
  //
  // Estimate |keys(A) ∩ keys(B)| — the join-planning statistic — WITHOUT
  // executing the join: one HLL sketch per side (each one scan with
  // map-side merge, fixed-size state) and inclusion–exclusion on the
  // merged union sketch: est∩ = est(A) + est(B) − est(A∪B). At 100 TB this
  // is how a planner decides broadcast-vs-shuffle and pre-sizes skew
  // handling: two sketch scans replace the join itself, and the per-side
  // sketches are reusable table statistics (the q108 incremental-state
  // pattern applies — refresh per arriving batch, merge, never rescan).
  // Driver-gated like hll_count_distinct: exact distinct counts + exact
  // intersection are hash-matched; ok_est proves the estimate landed
  // within ±10% (inclusion–exclusion compounds the per-sketch error, so
  // the gate is wider than the single-sketch ±5%).

  def joinCardinalityEstimate(a: DataFrame, aKey: String,
      b: DataFrame, bKey: String): DataFrame = {
    val sa = a.agg(expr(s"hll_sketch_agg($aKey)").as("ska"),
      countDistinct(col(aKey)).as("na"))
    val sb = b.agg(expr(s"hll_sketch_agg($bKey)").as("skb"),
      countDistinct(col(bKey)).as("nb"))
    val inter = a.select(col(aKey).as("k")).distinct()
      .join(b.select(col(bKey).as("k")).distinct(), Seq("k"))
      .agg(count(lit(1)).as("n_inter"))
    sa.crossJoin(sb).crossJoin(inter)
      .withColumn("est_inter",
        expr("hll_sketch_estimate(ska) + hll_sketch_estimate(skb) " +
          "- hll_sketch_estimate(hll_union(ska, skb))"))
      .select(col("na"), col("nb"), col("n_inter"),
        (abs(col("est_inter") - col("n_inter")) <=
          col("n_inter") * 0.10).as("ok_est"))
  }

  private def q142(s: SparkSession, dir: String): DataFrame = {
    val oc = joinCardinalityEstimate(
      Tables.orders(s, dir), "o_custkey", Tables.customer(s, dir), "c_custkey")
      .select(lit("orders_customer").as("pair"), col("na"), col("nb"),
        col("n_inter"), col("ok_est"))
    val lp = joinCardinalityEstimate(
      Tables.lineitem(s, dir), "l_partkey", Tables.part(s, dir), "p_partkey")
      .select(lit("lineitem_part").as("pair"), col("na"), col("nb"),
        col("n_inter"), col("ok_est"))
    oc.unionByName(lp).orderBy(col("pair"))
  }

  private val q142Sql =
    """SELECT 'lineitem_part' AS pair,
      |  (SELECT count(DISTINCT l_partkey) FROM lineitem) AS na,
      |  (SELECT count(DISTINCT p_partkey) FROM part) AS nb,
      |  (SELECT count(*) FROM
      |    (SELECT DISTINCT l_partkey FROM lineitem) a
      |    JOIN (SELECT DISTINCT p_partkey FROM part) b
      |      ON a.l_partkey = b.p_partkey) AS n_inter,
      |  true AS ok_est
      |UNION ALL
      |SELECT 'orders_customer',
      |  (SELECT count(DISTINCT o_custkey) FROM orders),
      |  (SELECT count(DISTINCT c_custkey) FROM customer),
      |  (SELECT count(*) FROM
      |    (SELECT DISTINCT o_custkey FROM orders) a
      |    JOIN (SELECT DISTINCT c_custkey FROM customer) b
      |      ON a.o_custkey = b.c_custkey),
      |  true
      |ORDER BY pair""".stripMargin

  // ==== q222: KMV distinct sketches with set operations ====================
  //
  // Audience arithmetic at sketch cost: per-segment KMV sketches
  // (functions/KmvExprs.scala) compose under UNION, INTERSECTION and (by
  // complement) DIFFERENCE — the operations HLL registers cannot express.
  // One map-side-combined aggregation compresses the id stream to one
  // ≤ k-long array per segment; every pairwise question then runs on the
  // segment domain with built-in array expressions (the sketches are
  // sign-flipped so signed array order == unsigned hash order):
  //   K        = k smallest of A ∪ B   (array_sort ∘ array_union ∘ slice)
  //   est(A∪B) = (k−1)/frac(K[k])       when full, |K| exactly otherwise
  //   est(A∩B) = |K ∩ A ∩ B|/|K| · est(A∪B)   (Beyer et al. 2007)
  //
  // The declared query runs in the EXACT regime (k above every test
  // scale's per-segment cardinality, the q171/q75 sketch-oracle
  // discipline): sketches are then complete distinct-hash sets, every
  // estimate collapses to an exact integer, and the oracle hash-matches
  // plain COUNT(DISTINCT) arithmetic — proving the whole sketch algebra
  // end-to-end. The ESTIMATOR regime (k ≪ n, rel. error ~1/√k) is
  // law-tested in KmvSpec; at 100 TB k=2¹⁷ gives ~0.3% error in 1 MiB
  // per segment.

  /** Per-segment KMV sketch of xxhash64(`idCol`). */
  def kmvSketches(df: DataFrame, segCol: String, idCol: String, k: Int): DataFrame =
    df.groupBy(col(segCol).as("seg"))
      .agg(graft.functions.KmvExprs.kmvAgg(xxhash64(col(idCol)), k).as("kmv"))

  /** Fraction of the unsigned hash space at or below flipped value `f`. */
  private def hashFrac(f: Column): Column =
    (f.cast("double") + lit(9.223372036854776e18) + lit(1.0)) /
      lit(1.8446744073709552e19)

  /** Pairwise segment set arithmetic from KMV sketches: estimated
    * |A|, |B|, |A∪B|, |A∩B|, |A∖B| and Jaccard. Estimates are exact
    * integers whenever the union sketch is not full. */
  def kmvOverlap(df: DataFrame, segCol: String, idCol: String, k: Int): DataFrame = {
    val sk = kmvSketches(df, segCol, idCol, k)
    def estOf(arr: Column): Column =
      when(size(arr) < k, size(arr).cast("double"))
        .otherwise(lit(k - 1.0) / hashFrac(element_at(arr, k)))
    sk.toDF("seg_a", "kmv_a").join(sk.toDF("seg_b", "kmv_b"),
        col("seg_a") < col("seg_b"))
      .withColumn("ku", slice(array_sort(array_union(col("kmv_a"), col("kmv_b"))),
        1, k))
      .withColumn("est_union", estOf(col("ku")))
      .withColumn("m_inter", size(array_intersect(
        array_intersect(col("ku"), col("kmv_a")), col("kmv_b"))))
      // exact regime (union sketch not full): m_inter IS |A∩B| — emit the
      // integer rather than m/|K|·est, whose double round-trip can land an
      // ulp below the integer
      .withColumn("est_inter",
        when(size(col("ku")) < k, col("m_inter").cast("double"))
          .otherwise(col("m_inter").cast("double") /
            size(col("ku")).cast("double") * col("est_union")))
      .select(col("seg_a"), col("seg_b"),
        estOf(col("kmv_a")).cast("long").as("n_a"),
        estOf(col("kmv_b")).cast("long").as("n_b"),
        col("est_union").cast("long").as("n_union"),
        col("est_inter").cast("long").as("n_inter"),
        (estOf(col("kmv_a")) - col("est_inter")).cast("long").as("n_a_only"),
        QueryDef.dec4(col("est_inter") / col("est_union")).as("jaccard"))
  }

  private def q222(s: SparkSession, dir: String): DataFrame =
    kmvOverlap(Tables.events(s, dir), "event_type", "user_id", k = 1 << 17)
      .orderBy(col("seg_a"), col("seg_b"))

  // exact-regime oracle: plain distinct-set arithmetic — hash-matching it
  // proves sketch build, merge, union/intersection composition and the
  // exact-regime estimates all at once
  private val q222Sql =
    """WITH s AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
      |sz AS (SELECT t, count(*) AS n FROM s GROUP BY t),
      |b AS (
      |  SELECT a.t AS seg_a, b.t AS seg_b, count(*) AS n_inter
      |  FROM s a JOIN s b ON a.u = b.u AND a.t < b.t
      |  GROUP BY 1, 2)
      |SELECT x.t AS seg_a, y.t AS seg_b, x.n AS n_a, y.n AS n_b,
      |  x.n + y.n - COALESCE(b.n_inter, 0) AS n_union,
      |  COALESCE(b.n_inter, 0) AS n_inter,
      |  x.n - COALESCE(b.n_inter, 0) AS n_a_only,
      |  CAST(CAST(CAST(COALESCE(b.n_inter, 0) AS DOUBLE) /
      |    CAST(x.n + y.n - COALESCE(b.n_inter, 0) AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS jaccard
      |FROM sz x JOIN sz y ON x.t < y.t
      |LEFT JOIN b ON b.seg_a = x.t AND b.seg_b = y.t
      |ORDER BY seg_a, seg_b""".stripMargin

  // ==== q309: count-min sketch point queries ==================================
  //
  // The mergeable FREQUENCY sketch completing the sketch shelf (B105's
  // Misra-Gries keeps top-k identities, B156's KMV counts distincts —
  // CMS answers "how often did THIS item occur" for every item in d·w
  // counters): d=4 rows × w=8192 buckets, row r hashing xxhash64(r, item),
  // estimate = min over rows. Counters are plain additive counts, so the
  // sketch merges by + (spec law) and builds as ONE map-side-combined
  // groupBy over the d-exploded stream — never a corpus collect. The
  // oracle face is the sketch-gate pattern (q222's exact-regime twin):
  // DuckDB emits exact counts + literal law flags; the engine's flags
  // assert the one-sided guarantee (est ≥ true, always) and the 4N/w
  // error ceiling (P(fail) ≤ 4⁻⁴ per item — hash-fixed, so deterministic
  // for a given dataset and re-checked at every verify scale).

  /** (r, bucket, c) counters over `itemCol` — d·w rows, mergeable by
    * summing c on (r, bucket). */
  def cmsSketch(items: DataFrame, itemCol: String, d: Int, w: Int)
      : DataFrame =
    items
      .select(explode(sequence(lit(0), lit(d - 1))).as("r"),
        col(itemCol).as("it"))
      .groupBy(col("r"),
        pmod(xxhash64(col("r"), col("it")), lit(w.toLong)).as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for `queries`.`itemCol`: min over the d counter
    * rows (the sketch broadcasts — it is d·w, never corpus-sized). */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
      d: Int, w: Int): DataFrame =
    queries
      .select(col(itemCol), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("bucket",
        pmod(xxhash64(col("r"), col(itemCol)), lit(w.toLong)))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))

  private def q309(s: SparkSession, dir: String): DataFrame = {
    val d = 4; val w = 8192
    val ev = Tables.events(s, dir).select(col("user_id"))
    val sk = cmsSketch(ev, "user_id", d, w)
    val truth = ev.groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
    val top = truth.orderBy(col("true_cnt").desc, col("user_id")).limit(20)
    val n = broadcast(truth.agg(sum(col("true_cnt")).as("n_total")))
    cmsEstimate(sk, top, "user_id", d, w)
      .join(top, Seq("user_id")).crossJoin(n)
      .select(col("user_id"), col("true_cnt"),
        (col("est") >= col("true_cnt")).as("est_ge_true"),
        (col("est") - col("true_cnt") <=
          lit(4L) * col("n_total") / w).as("err_le_bound"))
      .orderBy(col("true_cnt").desc, col("user_id"))
  }

  private val q309Sql =
    """SELECT user_id, count(*) AS true_cnt,
      |  true AS est_ge_true, true AS err_le_bound
      |FROM events GROUP BY user_id
      |ORDER BY true_cnt DESC, user_id LIMIT 20""".stripMargin

  // ==== q311: AMS F2 (self-join size) sketch ==================================
  //
  // The second-moment sketch completing the shelf (B97 estimates join
  // cardinality from per-key histograms; AMS does it in K counters):
  // F2 = Σ c_v² is the self-join size / skew measure, and the AMS
  // estimator is Z_k = Σ_rows sign_k(item) with est = median of
  // group-means of Z². Every Z is an exact integer SUM (mergeable across
  // partitions and batches by addition), group means stay integer-scaled
  // (×groupSize), and the lower-median of 4 group sums is picked by
  // array_sort — deterministic end to end for a fixed dataset. Gate
  // face: exact F2 (distributively computed, oracle-matched) + the
  // sketch-within-4× law flag.

  /** (r, z) — the MERGEABLE layer: per estimator, the signed row sum.
    * Sketches of disjoint slices merge by adding z per r. */
  def amsF2Signs(items: DataFrame, itemCol: String, k: Int): DataFrame =
    items
      .select(explode(sequence(lit(0), lit(k - 1))).as("r"),
        col(itemCol).as("it"))
      .groupBy(col("r"))
      .agg(sum(when(pmod(xxhash64(col("r"), col("it")), lit(2L)) === 0L,
        lit(1L)).otherwise(lit(-1L))).as("z"))

  /** (grp, z8) — per 8-estimator group, Σ over the group of Z_k²;
    * est(F2) = lower-median(z8)/8. */
  def amsF2Sketch(items: DataFrame, itemCol: String, k: Int = 32)
      : DataFrame = {
    require(k % 8 == 0, "amsF2Sketch groups estimators in eights")
    amsF2Signs(items, itemCol, k)
      .groupBy(expr("r div 8").as("grp"))
      .agg(sum(col("z") * col("z")).as("z8"))
  }

  private def q311(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("f2"))
    val est8 = amsF2Sketch(ev, "user_id", 32)
      .agg(element_at(array_sort(collect_list(col("z8"))), 2).as("med8"))
    exact.crossJoin(est8)
      .select(col("n_items"), col("f2").cast("long").as("f2_exact"),
        (col("med8").cast("decimal(38,0)") <= col("f2") * 32 &&
          col("med8").cast("decimal(38,0)") >= col("f2") * 2)
          .as("sketch_within_4x"))
  }

  private val q311Sql =
    """WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
      |SELECT count(*) AS n_items,
      |  CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS f2_exact,
      |  true AS sketch_within_4x
      |FROM c""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q311_ams_f2", q311, Some(q311Sql)),
    QueryDef("q309_cms_topk", q309, Some(q309Sql)),
    QueryDef("q222_kmv_overlap", q222, Some(q222Sql)),
    QueryDef("q142_join_cardinality", q142, Some(q142Sql)),
    QueryDef("q102_weighted_sample", q102, Some(q102Sql)),
    QueryDef("q199_bloom_semijoin", q199, Some(q199Sql)),
    QueryDef("q75_bloom_dedup", q75, Some(q75Sql)),
    QueryDef("q76_heavy_hitters", q76, Some(q76Sql)),
    QueryDef("q77_domain_mixture", q77, Some(q77Sql)),
    QueryDef("q78_length_buckets", q78, Some(q78Sql)))
}
