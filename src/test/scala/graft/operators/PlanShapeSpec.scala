package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards (the 100 TB contract, SURVEY.md §4.2): filters
  * and projections must reach the parquet scan, small dimensions must
  * broadcast, and the relational hot paths must stay inside whole-stage
  * codegen. A green result here is what makes the sf0.01 numbers meaningful
  * at 1000x the data.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Executed (post-AQE) plan: run the query first so adaptive stages are
    * final and WholeStageCodegen nodes are visible. */
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q03: every filter predicate is pushed to the parquet scan") {
    val p = plan("q03_filter")
    assert(p.contains("PushedFilters:"), "no pushdown section in scan")
    // range + IN + inequality predicates all reach the reader
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("In(l_returnflag"), p)
    assert(p.contains("LessThan(l_quantity"), p)
  }

  test("q01: column pruning reaches the scan (ReadSchema is the projection)") {
    val p = plan("q02_projection")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // only the referenced columns (projection + sort keys) are read, not all 11
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_returnflag") &&
      !readSchema.contains("l_quantity"),
      s"scan reads pruned columns: $readSchema")
  }

  test("q04: dimension joins are broadcast, not shuffled") {
    val p = plan("q04_join_inner")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"dim join degraded to SMJ:\n$p")
  }

  test("q10: aggregation is partial (map-side) before the shuffle") {
    val p = plan("q10_agg_groupby")
    // two HashAggregate nodes around one exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Exchange hashpartitioning"), p)
  }

  test("relational hot paths run inside whole-stage codegen") {
    // '*(n)' prefixes are WholeStageCodegen stage markers in plan strings
    Seq("q02_projection", "q03_filter", "q10_agg_groupby").foreach { q =>
      assert(plan(q).contains("*("), s"$q fell out of codegen")
    }
  }

  test("q08: band join pairs compressed distributions, not raw rows") {
    val p = plan("q08_join_theta")
    // the only join is a broadcast of the aggregated (size, brand) side —
    // no shuffle join on the ~50-value p_size key carrying raw rows
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"band join degraded to a shuffle join on the low-cardinality key:\n$p")
    // both sides are pre-aggregated before the join (partial + final pairs)
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("q37: the query set is broadcast against the corpus scan") {
    val p = plan("q37_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("entry flagship produces rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("corpus-prep queries never degenerate to cartesian or nested-loop joins") {
    // the round-3 corpus operators are all hash-shuffle / window shaped;
    // a CartesianProduct or BroadcastNestedLoopJoin appearing in any of
    // them means a join key was lost and the plan would be quadratic at
    // 100 TB (except intentional scalar broadcasts, which are fine and do
    // not show as these operators)
    for (q <- Seq("q64_segment_dedup", "q65_corpus_freq_quality",
        "q66_group_sample", "q67_pii_redact", "q70_incremental_dedup",
        "q71_curation_report", "q90_substring_repeats",
        "q92_fuzzy_join", "q93_leakage_safe_split", "q96_train_mixture")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q has a nested-loop join:\n$p")
    }
  }

  test("sketch builds merge partials map-side; only fixed-size state shuffles") {
    // BloomFilterAgg / CountMinSketchAgg are TypedImperativeAggregates: the
    // plan must show a partial + final aggregate pair, so what crosses the
    // exchange is one serialized bitset/grid per task, never the input rows
    for (q <- Seq("q76_heavy_hitters")) {
      val p = plan(q)
      val sketchAggs = "(ObjectHashAggregate|SortAggregate)".r.findAllIn(p).size
      assert(sketchAggs >= 2, s"$q sketch build is not partial+final:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product:\n$p")
    }
    // round 15: the Bloom build runs as its own partial+final aggregate
    // job and the finished bitset probes as a driver-held LITERAL — the
    // declared q75 plan must show the codegen bloom_probe filter and no
    // scalar crossJoin (the old idiom copied the bitset per probe row and
    // broke whole-stage codegen on the scan stage)
    val p75 = plan("q75_bloom_dedup")
    assert(p75.contains("bloom_probe"), s"q75 lost the literal probe:\n$p75")
    assert(!p75.contains("CartesianProduct"), s"q75 has a cartesian product:\n$p75")
  }

  test("q65: term-frequency aggregation is partial (map-side) before the shuffle") {
    val p = plan("q65_corpus_freq_quality")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"no partial aggregation in q65 plan:\n$p")
  }

  test("q82: context-window chunking is shuffle-free up to the output sort") {
    // tokenize → explode starts → slice is one map-side pipeline; the only
    // exchange permitted is the final presentation ORDER BY (a range
    // partitioning, which the un-ordered operator API doesn't even have)
    val p = plan("q82_context_windows")
    assert(!p.contains("Exchange hashpartitioning"),
      s"q82 hash-shuffles a pure map-side program:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q83: BPE pair explode runs over the distinct-word table, with partial aggs") {
    val p = plan("q83_bpe_pair_counts")
    // both the word count and the pair count must combine map-side
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"no partial aggregation in q83 plan:\n$p")
    // top-k is TakeOrdered, not a global sort of the pair table
    assert(p.contains("TakeOrderedAndProject"), s"q83 sorts globally:\n$p")
  }

  test("q81: semantic dedup joins on the cell key, never cartesian") {
    val p = plan("q81_semantic_dedup")
    assert(!p.contains("CartesianProduct"), s"q81 has a cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q81 has a nested-loop join:\n$p")
  }

  test("round-7 additions keep their declared plan shapes") {
    // q133/q135: pure map-side projections - the only exchange allowed is
    // the deterministic output sort's range partitioning, never a hash
    // shuffle of the data
    Seq("q133_random_projection", "q135_char_entropy").foreach { q =>
      val pl = plan(q)
      assert(!pl.contains("Exchange hashpartitioning"),
        s"$q grew a hash shuffle:\n$pl")
    }
    // q136: per-source sizes broadcast back, never shuffled as a join side
    val ov = plan("q136_source_overlap")
    assert(ov.contains("BroadcastHashJoin"), ov)
    // q134: both triangle joins are hash joins - a plan regression to
    // BroadcastNestedLoop/cartesian would be quadratic at scale
    val tri = plan("q134_triangles")
    assert(!tri.contains("BroadcastNestedLoopJoin") && !tri.contains("CartesianProduct"),
      s"triangle join degraded:\n$tri")
    // q140/q144: one map-side-combined aggregation feeds the stats
    Seq("q140_grouped_auc", "q144_grouped_ols").foreach { q =>
      val pl = plan(q)
      assert("HashAggregate".r.findAllIn(pl).size >= 2, s"$q lost partial agg:\n$pl")
    }
  }

  test("round-8 additions keep their declared plan shapes") {
    // q167: candidate generation is a (user, bucket) equi hash join — a
    // degradation to nested-loop/cartesian would be per-user quadratic
    val mt = plan("q167_multitouch_attribution")
    assert(!mt.contains("CartesianProduct") && !mt.contains("BroadcastNestedLoopJoin"),
      s"multi-touch candidate join degraded:\n$mt")
    // q157: the vocabulary attaches by BROADCAST hash joins — the round-7
    // finding was a vocab-sized plan literal; neither a literal-scan nor a
    // shuffled vocab join may come back
    val pmi = plan("q157_pmi_pairs")
    assert(pmi.contains("BroadcastHashJoin"), s"pmi vocab join not broadcast:\n$pmi")
    // q129: the band join's inputs are DISTINCT hashes (aggregated before
    // the self-join), and intra-hash pairs come from an equi join — no
    // nested loops anywhere
    val ph = plan("q129_phash_dedup")
    assert(!ph.contains("CartesianProduct") && !ph.contains("BroadcastNestedLoopJoin"),
      s"phash pair join degraded:\n$ph")
    // q164/q169: map-side encode / hour-level fold — no hash shuffle beyond
    // the aggregates' own exchanges; never a join
    Seq("q164_unigram_encode", "q173_seq_match").foreach { q =>
      val pl = plan(q)
      assert(!pl.contains("Join"), s"$q grew a join:\n$pl")
    }
    // q166: the histogram state build is one map-side-combined aggregation
    // chain; quantile readout scans the state, never the data twice
    val hq = plan("q166_hist_quantile_state")
    assert("HashAggregate".r.findAllIn(hq).size >= 2, s"q166 lost partial agg:\n$hq")
  }

  test("round-9 shapes: bitmap family aggregates partially, no raw-pair blowups") {
    // q221/q223/q224: the bitmap build is an ObjectHashAggregate with
    // map-side partials (bitmap_or_agg is a TypedImperativeAggregate);
    // set ops meet on equi/broadcast joins — never a cartesian of events
    Seq("q221_bitmap_overlap", "q223_rolling_distinct",
      "q224_distinct_cube").foreach { q =>
      val p = plan(q)
      assert(p.contains("ObjectHashAggregate"), s"$q lost the object agg:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
    }
    // q222: sketches built by kmv_agg partials; the pair frame is
    // segment-domain (the one BNLJ is over per-segment sketch rows)
    val kv = plan("q222_kmv_overlap")
    assert(kv.contains("kmv_agg"), s"q222 lost the kmv aggregate:\n$kv")
    // q220: the min/max rewrite keeps the self-join on the (user, type)
    // DOMAIN — the raw event table is aggregated before any join
    val sp = plan("q220_seq_pair_support")
    assert("HashAggregate".r.findAllIn(sp).size >= 2, s"q220 lost partial agg:\n$sp")
    assert(!sp.contains("CartesianProduct"), s"q220 grew a cartesian:\n$sp")
    // q217: the skyline windows are bucket-partitioned; the only
    // single-partition window runs on the bucket DOMAIN (≤ 256 rows)
    val sk = plan("q217_skyline")
    assert(sk.contains("Window"), s"q217 lost its windows:\n$sk")
    // q233: phrase terms align through equi joins (postings), never a
    // nested-loop of token lists
    val ps = plan("q233_phrase_search")
    assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"),
      s"q233 degraded:\n$ps")
  }

  test("round-10 shapes: stat tests stay on domain-sized pair frames") {
    // q243: the ONLY corpus pass is the joint-histogram aggregate; the
    // O(cells²) pair join runs as a broadcast nested loop over the tiny
    // cell domain (that BNLJ is the DESIGN, not a degradation), and the
    // corpus never meets a cartesian
    val kt = plan("q243_kendall_tau")
    assert("HashAggregate".r.findAllIn(kt).size >= 2,
      s"q243 lost the partial histogram agg:\n$kt")
    assert(kt.contains("BroadcastNestedLoopJoin"),
      s"q243 cell pairing is not broadcast:\n$kt")
    assert(!kt.contains("CartesianProduct"), s"q243 grew a cartesian:\n$kt")
    // q244/q245: one corpus scan into a 10-bin aggregate; the isotonic
    // minimax joins are all broadcast over bin-domain frames
    Seq("q244_calibration_metrics", "q245_isotonic_calibration").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q lost partial aggregation:\n$p")
    }
    // q247/q248: since round 11 the clip core is ONE side-tagged
    // (doc, n, gram) aggregate with conditional sums — there is no clip
    // join at all (the former full-outer equi-join was measured ~1.5×
    // slower); the only join left is the scalar broadcast of the 1-row
    // wide frame
    Seq("q247_bleu", "q248_rouge_n").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$q re-grew a gram-table join — the fused aggregate was lost:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q lost partial aggregation:\n$p")
    }
    // q250: two user-domain shuffles + a 64-row coefficient join; q252:
    // blocked self-join stays an equi-join on the block key
    Seq("q250_shapley_attribution", "q252_fellegi_sunter").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q degraded to BNLJ:\n$p")
    }
    // q253: ranking touches the distinct-value histogram (two partial
    // aggs) and joins back by value — no corpus-sized window anywhere
    val kw = plan("q253_kruskal_wallis")
    assert(!kw.contains("Window"), s"q253 grew a corpus window:\n$kw")
    assert("HashAggregate".r.findAllIn(kw).size >= 2,
      s"q253 lost partial aggregation:\n$kw")
    // q256: both CDFs and the gap join ride prefix scans + an idx
    // equi-join — W1 has no window over anything
    val w1 = plan("q256_wasserstein_drift")
    assert(!w1.contains("Window"), s"q256 grew a window:\n$w1")
    assert(!w1.contains("CartesianProduct"), s"q256 grew a cartesian:\n$w1")
    // q259/q260: bigram/triangle machinery stays on equi-joins with
    // partial aggregation; no cartesian anywhere
    Seq("q259_collocations_g2", "q260_ktruss").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q lost partial aggregation:\n$p")
    }
    // q261/q262: the only non-equi pairing is the broadcast
    // domain×domain match (BNLJ over tiny aggregates — the design);
    // the corpus never meets a cartesian
    Seq("q261_matching_att", "q262_sample_size").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
    }
  }

  test("round-11 shapes: prefix-scan stats are window-free, joins stay equi") {
    // q270/q273: the conformal-BH and Cliff's-delta machinery rides the
    // distinct-value prefix scan — no corpus-sized Window, no cartesian,
    // partial aggregation on the histogram build
    Seq("q270_conformal_bh", "q273_cliffs_delta").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window"), s"$q grew a corpus window:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q lost partial aggregation:\n$p")
    }
    // q268/q274: self-join candidates come from equi-keys (prefix ×
    // length-bucket; PairCombos lists) — never a nested-loop or cartesian
    // over corpus rows
    Seq("q268_jw_selfjoin", "q274_jaccard_links").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q degraded to BNLJ:\n$p")
    }
    // q271/q276: one user-domain aggregation then bin/cell-domain rollups —
    // map-side partials present, no cartesian touching the event stream
    Seq("q271_mcnemar", "q276_ipw_ate").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q lost partial aggregation:\n$p")
    }
    // q279: the pair space is the DAY-domain self-join (an equi-join on
    // the type key over the tiny daily table); the event stream is only
    // touched by the daily aggregate
    val mk = plan("q279_mann_kendall")
    assert(!mk.contains("CartesianProduct"), s"q279 grew a cartesian:\n$mk")
    assert("HashAggregate".r.findAllIn(mk).size >= 2,
      s"q279 lost partial aggregation:\n$mk")
  }
}
