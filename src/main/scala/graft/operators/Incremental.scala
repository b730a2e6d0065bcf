package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keeping corpus statistics current
  * under a stream of arriving batches WITHOUT rescanning the corpus (the
  * materialized-view delta-refresh pattern; pairs with [[Cdc]] for row
  * deltas and with the ingestion pipeline's chunked arrival).
  *
  * The state is a keyed table of MERGEABLE partials (count / sum / min /
  * max — every derived metric, e.g. avg, is computed at read time from
  * them). Refresh cost is then: partial-aggregate the NEW batch (tiny) +
  * one combine shuffle keyed by group over state ∪ delta-partials — the
  * 100 TB corpus itself is never touched again. The algebra is the same
  * map-side-combine Spark applies inside one aggregation, lifted across
  * batches; `merge(agg(A), agg(B)) == agg(A ∪ B)` is the spec'd law.
  */
object Incremental {

  private val Keys = Seq("lang", "source")

  /** Mergeable per-(lang, source) statistics state for a document batch. */
  def aggState(docs: DataFrame): DataFrame =
    docs.groupBy(Keys.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Combine two states (prior state ∪ a new batch's partials). */
  def mergeState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(Keys.map(col): _*)
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_chars")).as("sum_chars"),
        min(col("min_chars")).as("min_chars"),
        max(col("max_chars")).as("max_chars"))

  // -- mergeable DISTINCT counts ---------------------------------------------
  // count(DISTINCT) is the one common statistic with no finite exact
  // mergeable state — maintaining it incrementally needs a sketch. The
  // DataSketches HLL aggregate (hll_sketch_agg / hll_union_agg) IS that
  // state: fixed-size, exactly mergeable (union of partials == sketch of
  // the whole, deterministically), estimate read out at query time. Same
  // refresh algebra as [[mergeState]], so the corpus is never rescanned.

  /** Per-lang state carrying a distinct-text sketch next to the exact
    * mergeable partials. */
  def aggStateDistinct(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        hll_sketch_agg(col("text")).as("distinct_sketch"))

  /** Combine two distinct-count states. */
  def mergeStateDistinct(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        hll_union_agg(col("distinct_sketch")).as("distinct_sketch"))

  /** Rename-aside swap + crash recovery for the maintained state tables —
    * the same discipline as Cdc's partition swaps: the live state is
    * never deleted before its replacement is in place, and a crash at any
    * point leaves the data in `root` or `root__old`. */
  private[graft] def recoverStateAside(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    val aside = new org.apache.hadoop.fs.Path(root.toString + "__old")
    if (!fs.exists(root) && fs.exists(aside))
      require(fs.rename(aside, root), s"state recovery failed: $aside")
  }

  /** The applied-batch id RIDES INSIDE the state directory (an
    * underscore-prefixed file, invisible to the parquet reader), so the
    * rename in [[swapStateAside]] publishes state and id atomically — a
    * crash can never leave merged-but-unstamped state that a replay
    * would double-count. A legacy sibling `<root>__applied_batch` file
    * (the pre-round-12 layout, where a crash between swap and id write
    * DID double-count) is still read for migration, max-wins. */
  private[graft] def readAppliedBatch(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Long = {
    def readLong(p: org.apache.hadoop.fs.Path): Long =
      if (fs.exists(p)) {
        val in = fs.open(p)
        try new String(in.readAllBytes()).trim.toLong finally in.close()
      } else -1L
    math.max(
      readLong(new org.apache.hadoop.fs.Path(root, "_applied_batch")),
      readLong(new org.apache.hadoop.fs.Path(
        root.toString + "__applied_batch")))
  }

  private[graft] def writeAppliedBatch(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, batchId: Long): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dir, "_applied_batch"), true)
    try out.write(batchId.toString.getBytes) finally out.close()
  }

  private[graft] def swapStateAside(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      staging: org.apache.hadoop.fs.Path): Unit = {
    val aside = new org.apache.hadoop.fs.Path(root.toString + "__old")
    fs.delete(aside, true)
    if (fs.exists(root))
      require(fs.rename(root, aside), s"state aside failed for $root")
    require(fs.rename(staging, root), s"state swap failed for $root")
    fs.delete(aside, true)
  }

  /** One exactly-once refresh of the maintained state table: merge a new
    * batch's partials into the parquet state at `statePath`, guarded by a
    * monotonic batch id. Unlike the CDC upsert, the merge algebra is NOT
    * idempotent (replaying a batch would double its counts), so the applied
    * batch id is persisted with the state and a replay is a no-op —
    * at-least-once delivery + the guard = exactly-once state. */
  def refreshState(spark: SparkSession, statePath: String, batch: DataFrame,
      batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverStateAside(fs, root)
    if (batchId <= readAppliedBatch(fs, root)) return // replay — folded in
    val delta = aggState(batch)
    val next = if (fs.exists(root))
      mergeState(spark.read.parquet(statePath), delta) else delta
    val staging = new Path(statePath + "__refreshing")
    next.write.mode("overwrite").parquet(staging.toString)
    // stamp the id INTO staging before the swap: state + id become
    // visible in one rename — no crash window can double-count a replay
    writeAppliedBatch(fs, staging, batchId)
    swapStateAside(fs, root, staging)
    fs.delete(new Path(statePath + "__applied_batch"), false) // legacy
  }

  /** Live stats maintenance: every micro-batch of arriving documents folds
    * its partials into the state table — the corpus is never rescanned. */
  def startStateRefresh(docs: DataFrame, statePath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) refreshState(batch.sparkSession, statePath, batch.toDF(), id)
      }
      .start()

  // ==== q108: two-batch incremental refresh == full recompute ===============
  //
  // The corpus arrives as two halves (doc_id parity — both halves hit every
  // group); the maintained state after merging the second half's partials
  // must equal — and the oracle recomputes — the from-scratch aggregate.
  // avg is derived from the partials at read time, never stored.

  private def q108(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val state0 = aggState(docs.filter(col("doc_id") % 2 === 0))
    val merged = mergeState(state0, aggState(docs.filter(col("doc_id") % 2 === 1)))
    merged.select(col("lang"), col("source"), col("n_docs"),
        col("sum_chars"), col("min_chars"), col("max_chars"),
        QueryDef.dec4(col("sum_chars").cast("double") / col("n_docs"))
          .as("avg_chars"))
      .orderBy(col("lang"), col("source"))
  }

  private val q108Sql =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, min(n_chars) AS min_chars,
      |  max(n_chars) AS max_chars,
      |  CAST(CAST(CAST(sum(n_chars) AS DOUBLE) / count(*) AS DECIMAL(38,4)) AS VARCHAR)
      |    AS avg_chars
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ==== q111: incremental distinct maintenance gate =========================
  //
  // Two laws per lang group: (1) the estimate maintained through the
  // two-batch merge tracks the single-pass estimate within 2% — union is
  // order-insensitive, but the merged sketch's internal representation can
  // differ from the direct one (HLL_4 coupon promotion), so the readouts
  // agree to estimator resolution, NOT bitwise; and (2) the merged
  // estimate lands within 5% of the exact distinct count (driver-gated
  // like hll_count_distinct; the oracle emits the exact side + `true`).

  private def q111(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val merged = mergeStateDistinct(
        aggStateDistinct(docs.filter(col("doc_id") % 2 === 0)),
        aggStateDistinct(docs.filter(col("doc_id") % 2 === 1)))
      .select(col("lang"),
        hll_sketch_estimate(col("distinct_sketch")).as("merged_est"))
    val direct = aggStateDistinct(docs)
      .select(col("lang"),
        hll_sketch_estimate(col("distinct_sketch")).as("direct_est"))
    val exact = docs.groupBy(col("lang"))
      .agg(countDistinct(col("text")).as("n_exact"))
    exact.join(merged, Seq("lang")).join(direct, Seq("lang"))
      .select(col("lang"), col("n_exact"),
        (abs(col("merged_est") - col("direct_est")) <=
          greatest(col("direct_est") * 0.02, lit(1.0))).as("merge_consistent"),
        (abs(col("merged_est") - col("n_exact")) <= col("n_exact") * 0.05)
          .as("ok_estimate"))
      .orderBy(col("lang"))
  }

  private val q111Sql =
    """SELECT lang, count(DISTINCT text) AS n_exact,
      |  true AS merge_consistent, true AS ok_estimate
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // -- mergeable QUANTILE state (fixed-grid histogram sketch) ----------------
  // Percentile monitoring is the other statistic with no finite exact
  // mergeable state. The fixed-grid histogram is its sketch: an
  // array<long> of bucket counts per group — fixed-size, EXACTLY
  // mergeable (element-wise sum, so merge(h(A), h(B)) == h(A ∪ B)
  // bitwise, a stronger law than HLL's estimator-resolution agreement),
  // readout entirely in integers. Quantile resolves to its bucket's upper
  // bound — rank error bounded by one bucket's width, the documented
  // approximation contract (KLL/t-digest trade that bound differently but
  // cannot be exactly oracled; the grid can).

  /** Per-group histogram state over integer `valueCol`: bucket
    * b = clamp((x − lo) div width, 0, nBuckets−1), state = counts array.
    * One map-side-combined aggregation; state size = nBuckets longs. */
  def histState(df: DataFrame, valueCol: String, keys: Seq[String],
      lo: Long, width: Long, nBuckets: Int): DataFrame = {
    // integer floor-div (`div`), mirroring the oracle's `//` — never a
    // double division that would truncate differently at extreme values
    val b = least(greatest(
      expr(s"(cast($valueCol as bigint) - $lo) div $width"),
      lit(0L)), lit(nBuckets - 1L))
    df.select(keys.map(col) :+ b.as("__b"): _*)
      .groupBy((keys :+ "__b").map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(keys.map(col): _*)
      .agg(collect_list(struct(col("__b"), col("__c"))).as("__bc"))
      .select(keys.map(col) :+
        transform(sequence(lit(0L), lit(nBuckets - 1L)), i =>
          coalesce(try_element_at(
            filter(col("__bc"), e => e.getField("__b") === i), lit(1))
            .getField("__c"), lit(0L))).as("hist"): _*)
  }

  /** Combine two histogram states: element-wise sum (groups absent from
    * one side pass through unchanged). */
  def mergeHistState(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .select(keys.map(col) :+ posexplode(col("hist")).as(Seq("__b", "__c")): _*)
      .groupBy((keys :+ "__b").map(col): _*)
      .agg(sum(col("__c")).as("__c"))
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(col("__b"), col("__c")))).as("__bc"))
      .select(keys.map(col) :+
        transform(col("__bc"), e => e.getField("__c")).as("hist"): _*)

  /** Percentile readout from a state table: for each p (in percent), the
    * upper bound `lo + (b+1)·width` of the smallest bucket whose
    * cumulative count reaches rank ⌈p·n/100⌉. Integer arithmetic only —
    * bit-identical on any engine. The scan is over the state table
    * (groups × nBuckets rows), never the data. */
  def histQuantiles(state: DataFrame, keys: Seq[String], lo: Long,
      width: Long, ps: Seq[Int]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("__b"))
    val cum = state
      .select(keys.map(col) :+ posexplode(col("hist")).as(Seq("__b", "__c")): _*)
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)))
    val aggs = count(lit(1)).as("__nb") +:
      ps.map(p => min(when(col("__cum") * 100 >= col("__n") * p,
        lit(lo) + (col("__b") + 1) * width)).as(s"p$p"))
    cum.groupBy(keys.map(col) :+ col("__n").as("n"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .drop("__nb")
  }

  /** Exactly-once refresh of a maintained histogram-state table — the
    * [[refreshState]] discipline (monotonic batch-id guard; the merge
    * algebra is not idempotent) applied to the quantile sketch: arriving
    * batches fold in via [[mergeHistState]], percentile dashboards read
    * [[histQuantiles]] off the state, and the corpus is never rescanned. */
  def refreshHistState(spark: SparkSession, statePath: String,
      batch: DataFrame, batchId: Long, valueCol: String, keys: Seq[String],
      lo: Long, width: Long, nBuckets: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverStateAside(fs, root)
    if (batchId <= readAppliedBatch(fs, root)) return
    val delta = histState(batch, valueCol, keys, lo, width, nBuckets)
    val next = if (fs.exists(root))
      mergeHistState(spark.read.parquet(statePath), delta, keys) else delta
    val staging = new Path(statePath + "__refreshing")
    next.write.mode("overwrite").parquet(staging.toString)
    writeAppliedBatch(fs, staging, batchId) // id swaps in WITH the state
    swapStateAside(fs, root, staging)
    fs.delete(new Path(statePath + "__applied_batch"), false) // legacy
  }

  /** Streaming percentile maintenance: each micro-batch folds its
    * histogram partials into the state table. */
  def startHistRefresh(docs: DataFrame, statePath: String, checkpoint: String,
      valueCol: String, keys: Seq[String], lo: Long, width: Long,
      nBuckets: Int): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          refreshHistState(batch.sparkSession, statePath, batch.toDF(), id,
            valueCol, keys, lo, width, nBuckets)
      }
      .start()

  // -- incremental JOIN maintenance (IVM beyond aggregates) -------------------
  // The textbook delta rule for insert-only view maintenance of A ⋈ B:
  //   Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB
  // — three joins, each with a DELTA side, so refresh cost scales with the
  // arriving batches and the accumulated other side, never A_full ⋈ B_full.
  // With the accumulated sides bucketed by the join key (the BucketingSpec
  // discipline) the two big-side joins shuffle only their delta.

  /** The view delta for one insert batch (da, db) against the accumulated
    * sides (aOld, bOld). Append it to the maintained view. */
  def joinDelta(aOld: DataFrame, da: DataFrame, bOld: DataFrame,
      db: DataFrame, key: String): DataFrame =
    da.join(bOld, Seq(key))
      .unionByName(aOld.join(db, Seq(key)))
      .unionByName(da.join(db, Seq(key)))

  // ==== q182: incrementally maintained join == direct join ==================
  //
  // Both sides arrive in two parity batches; the view is built ONLY
  // through initial ⋈ + the delta rule and must equal — the oracle
  // computes — the direct full join, rolled up per order priority.

  private def q182(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val b = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val (a0, a1) = (a.filter(col("o_orderkey") % 2 === 0),
      a.filter(col("o_orderkey") % 2 === 1))
    val (b0, b1) = (b.filter(col("l_quantity").cast("long") % 2 === 0),
      b.filter(col("l_quantity").cast("long") % 2 === 1))
    val view = a0.join(b0, Seq("o_orderkey"))
      .unionByName(joinDelta(a0, a1, b0, b1, "o_orderkey"))
    view.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("string")
          .as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  private val q182Sql =
    """SELECT o_orderpriority, count(*) AS n_rows,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2))
      |    AS VARCHAR) AS sum_qty
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ==== q166: merged histogram state == from-scratch quantile readout ======
  //
  // Two-batch arrival (doc_id parity), merge, then p50/p90/p99 readout per
  // source. The oracle recomputes the SAME grid walk from the raw table —
  // equality certifies both the merge law and the integer readout. Rank
  // test uses cum·100 ≥ n·p (integer cross-multiplication), never a
  // float ceil.

  private val HistLo = 0L
  private val HistWidth = 20L
  private val HistBuckets = 32

  private def q166(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val keys = Seq("source")
    val merged = mergeHistState(
      histState(docs.filter(col("doc_id") % 2 === 0), "n_chars", keys,
        HistLo, HistWidth, HistBuckets),
      histState(docs.filter(col("doc_id") % 2 === 1), "n_chars", keys,
        HistLo, HistWidth, HistBuckets), keys)
    histQuantiles(merged, keys, HistLo, HistWidth, Seq(50, 90, 99))
      .orderBy(col("source"))
  }

  private val q166Sql =
    s"""WITH b AS (
       |  SELECT source,
       |    least(greatest((n_chars - $HistLo) // $HistWidth, 0),
       |      ${HistBuckets - 1}) AS b
       |  FROM documents),
       |c AS (SELECT source, b, count(*) AS cnt FROM b GROUP BY 1, 2),
       |cum AS (
       |  SELECT source, b, cnt,
       |    sum(cnt) OVER (PARTITION BY source ORDER BY b) AS cum,
       |    sum(cnt) OVER (PARTITION BY source) AS total
       |  FROM c)
       |SELECT source, CAST(max(total) AS BIGINT) AS n,
       |  CAST(min(CASE WHEN cum * 100 >= total * 50
       |    THEN $HistLo + (b + 1) * $HistWidth END) AS BIGINT) AS p50,
       |  CAST(min(CASE WHEN cum * 100 >= total * 90
       |    THEN $HistLo + (b + 1) * $HistWidth END) AS BIGINT) AS p90,
       |  CAST(min(CASE WHEN cum * 100 >= total * 99
       |    THEN $HistLo + (b + 1) * $HistWidth END) AS BIGINT) AS p99
       |FROM cum GROUP BY source ORDER BY source""".stripMargin

  // -- mergeable rank state for UNBOUNDED domains (KLL, B262) ----------------
  //
  // B103's fixed-grid state needs a DECLARED (lo, width, nBuckets) value
  // range up front; a column whose range is unknown (latencies, payload
  // sizes, model scores × 10⁶) gets the KLL rank sketch instead
  // (functions/KllExprs — Karnin/Lang/Liberty FOCS 2016): O(k) state per
  // group, fully mergeable map-side, rank error O(W/k). Oracle discipline
  // is the q171/q222 sketch-gate pair: q325 hash-matches the EXACT regime
  // (capacity above the slice cardinality ⇒ the sketch IS the multiset);
  // q326 law-checks the sketch regime in-query (weight conservation
  // through real map-side merges, bounded state, rank-error ceiling) with
  // DuckDB emitting the exact count + literal law flags.

  /** Per-group KLL sketch over a long-valued column: one map-side-
    * combined aggregation, state ≤ ~3k items per group. */
  def kllState(df: DataFrame, valueCol: String, keys: Seq[String],
      k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.KllExprs.kllAgg(
        col(valueCol).cast("long"), k).as("kll"))

  /** Quantile readout off a KLL state table: for each p (percent), the
    * smallest v whose cumulative weight cum satisfies 100·cum ≥ p·W.
    * The scan is over the state table (groups × ≤3k rows), never data. */
  def kllQuantiles(state: DataFrame, keys: Seq[String],
      ps: Seq[Int]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__e.v"), col("__e.w"))
    val cum = state
      .select(keys.map(col) :+ explode(col("kll")).as("__e"): _*)
      .withColumn("__cum", sum(col("__e.w")).over(w))
      .withColumn("__w", sum(col("__e.w")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)))
    val aggs = max(col("__w")).as("n") +:
      ps.map(p => min(when(col("__cum") * 100 >= col("__w") * p,
        col("__e.v"))).as(s"p$p"))
    cum.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  // exact-regime gate: slice cardinality (doc_id < 2000, fixed at every
  // SF — the q174 bounded-oracle discipline) sits under k = 4096, so no
  // compaction ever fires and each readout is the exact order statistic
  private def q325(s: SparkSession, dir: String): DataFrame =
    kllQuantiles(
      kllState(Tables.documents(s, dir).filter(col("doc_id") < 2000)
        .select(col("lang"), col("n_chars")), "n_chars", Seq("lang"),
        k = 4096),
      Seq("lang"), Seq(25, 50, 75, 90))
      .orderBy(col("lang"))

  private val q325Sql =
    """WITH d AS (
      |  SELECT lang, n_chars AS v FROM documents WHERE doc_id < 2000),
      |w AS (
      |  SELECT lang, v,
      |    row_number() OVER (PARTITION BY lang ORDER BY v) AS cum,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM d)
      |SELECT lang, max(n) AS n,
      |  min(CASE WHEN cum * 100 >= n * 25 THEN v END) AS p25,
      |  min(CASE WHEN cum * 100 >= n * 50 THEN v END) AS p50,
      |  min(CASE WHEN cum * 100 >= n * 75 THEN v END) AS p75,
      |  min(CASE WHEN cum * 100 >= n * 90 THEN v END) AS p90
      |FROM w GROUP BY lang ORDER BY lang""".stripMargin

  // sketch-regime law gate (the q111/q309 boolean-flag pattern): full
  // corpus width at k = 256 — compaction certain; the engine asserts its
  // own contracts and DuckDB supplies exact n + literal true flags.
  // ok_pNN: the true-rank bracket [cnt_lt+1, cnt_le] of the estimate must
  // intersect [(p−5)%·n, (p+5)%·n] — generous against the ~1.7/k bound.
  private def q326(s: SparkSession, dir: String): DataFrame = {
    val k = 256
    val docs = Tables.documents(s, dir)
      .select(col("n_chars").cast("long").as("v"))
    val st = kllState(docs, "v", Seq.empty, k)
    val est = kllQuantiles(st, Seq.empty, Seq(10, 50, 90))
    val state = st.select(size(col("kll")).as("state_items"))
    val ranks = docs.crossJoin(broadcast(est)).agg(
      count(lit(1)).as("n_total"), max(col("n")).as("w_total"),
      sum(when(col("v") <= col("p10"), 1L).otherwise(0L)).as("le10"),
      sum(when(col("v") < col("p10"), 1L).otherwise(0L)).as("lt10"),
      sum(when(col("v") <= col("p50"), 1L).otherwise(0L)).as("le50"),
      sum(when(col("v") < col("p50"), 1L).otherwise(0L)).as("lt50"),
      sum(when(col("v") <= col("p90"), 1L).otherwise(0L)).as("le90"),
      sum(when(col("v") < col("p90"), 1L).otherwise(0L)).as("lt90"))
    def ok(p: Int) =
      (col(s"le$p") * 100 >= col("n_total") * (p - 5)) &&
        (col(s"lt$p") * 100 <= col("n_total") * (p + 5))
    ranks.crossJoin(broadcast(state)).select(
      col("n_total"),
      (col("w_total") === col("n_total")).as("weight_ok"),
      (col("state_items") <= k * 4).as("bounded_state"),
      ok(10).as("ok_p10"), ok(50).as("ok_p50"), ok(90).as("ok_p90"))
  }

  private val q326Sql =
    """SELECT count(*) AS n_total, true AS weight_ok,
      |  true AS bounded_state, true AS ok_p10, true AS ok_p50,
      |  true AS ok_p90
      |FROM documents""".stripMargin

  // -- round 14 (B276): KLL double + pre-aggregated weighted faces ----------
  //
  // The round-13 verdict's gap: score/loss columns are doubles, and
  // upstream groupBys often hand the sketch (value, count) pairs, not raw
  // rows. Both faces reuse the long-domain sketch UNCHANGED — doubles
  // pass through the order-preserving IEEE-754 bits bijection
  // (functions/KllExprs DoubleBits), weights land by binary decomposition
  // (one item per set bit — exact weight conservation). Oracle discipline
  // stays the q325 exact-regime gate: a fixed sub-k slice where the
  // sketch IS the multiset, so every readout is the exact (weighted)
  // order statistic; the sketch regime is law-covered by KllSpec.

  /** Per-group KLL sketch over a DOUBLE column (order-preserving bits
    * domain); read out via [[kllQuantiles]] + sortableToDouble. */
  def kllStateDouble(df: DataFrame, valueCol: String, keys: Seq[String],
      k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.KllExprs.kllAggDouble(
        col(valueCol).cast("double"), k).as("kll"))

  /** Per-group KLL sketch over pre-aggregated (value, weight) rows. */
  def kllStateWeighted(df: DataFrame, valueCol: String, weightCol: String,
      keys: Seq[String], k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.KllExprs.kllAggWeighted(
        col(valueCol).cast("long"), col(weightCol).cast("long"), k).as("kll"))

  // exact-regime gate for the double face: score = n_chars/7.0 (exactly
  // rounded in both engines), slice under k ⇒ readout is the exact order
  // statistic of the doubles (the bits map is an order bijection)
  private def q340(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KllExprs.sortableToDouble
    val d = Tables.documents(s, dir).filter(col("doc_id") < 2000)
      .select(col("lang"),
        (col("n_chars").cast("double") / lit(7.0)).as("score"))
    val q = kllQuantiles(
      kllStateDouble(d, "score", Seq("lang"), k = 4096),
      Seq("lang"), Seq(25, 50, 75, 90))
    q.select(col("lang") +: col("n") +: Seq(25, 50, 75, 90).map(p =>
        QueryDef.dec4(sortableToDouble(col(s"p$p"))).as(s"p$p")): _*)
      .orderBy(col("lang"))
  }

  private val q340Sql =
    """WITH d AS (
      |  SELECT lang, n_chars / 7.0 AS v FROM documents WHERE doc_id < 2000),
      |w AS (
      |  SELECT lang, v,
      |    row_number() OVER (PARTITION BY lang ORDER BY v) AS cum,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM d)
      |SELECT lang, max(n) AS n,
      |  CAST(CAST(min(CASE WHEN cum * 100 >= n * 25 THEN v END)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS p25,
      |  CAST(CAST(min(CASE WHEN cum * 100 >= n * 50 THEN v END)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS p50,
      |  CAST(CAST(min(CASE WHEN cum * 100 >= n * 75 THEN v END)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS p75,
      |  CAST(CAST(min(CASE WHEN cum * 100 >= n * 90 THEN v END)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS p90
      |FROM w GROUP BY lang ORDER BY lang""".stripMargin

  // exact-regime gate for the weighted face: the (n_chars, count)
  // pre-agg of the same q325 slice must read out the IDENTICAL weighted
  // order statistics (counts stay small ⇒ low levels stay within
  // capacity ⇒ no compaction)
  private def q341(s: SparkSession, dir: String): DataFrame = {
    val pre = Tables.documents(s, dir).filter(col("doc_id") < 2000)
      .groupBy(col("lang"), col("n_chars").cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    kllQuantiles(
      kllStateWeighted(pre, "v", "cnt", Seq("lang"), k = 4096),
      Seq("lang"), Seq(25, 50, 75, 90))
      .orderBy(col("lang"))
  }

  private val q341Sql =
    """WITH pre AS (
      |  SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
      |  FROM documents WHERE doc_id < 2000 GROUP BY 1, 2),
      |w AS (
      |  SELECT lang, v,
      |    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY v)
      |      AS BIGINT) AS cum,
      |    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
      |  FROM pre)
      |SELECT lang, max(n) AS n,
      |  min(CASE WHEN cum * 100 >= n * 25 THEN v END) AS p25,
      |  min(CASE WHEN cum * 100 >= n * 50 THEN v END) AS p50,
      |  min(CASE WHEN cum * 100 >= n * 75 THEN v END) AS p75,
      |  min(CASE WHEN cum * 100 >= n * 90 THEN v END) AS p90
      |FROM w GROUP BY lang ORDER BY lang""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q108_incremental_agg", q108, Some(q108Sql)),
    QueryDef("q111_incremental_distinct", q111, Some(q111Sql)),
    QueryDef("q166_hist_quantile_state", q166, Some(q166Sql)),
    QueryDef("q182_incremental_join", q182, Some(q182Sql)),
    QueryDef("q325_kll_quantiles", q325, Some(q325Sql)),
    QueryDef("q326_kll_error_laws", q326, Some(q326Sql)),
    QueryDef("q340_kll_double", q340, Some(q340Sql)),
    QueryDef("q341_kll_weighted", q341, Some(q341Sql)))
}
