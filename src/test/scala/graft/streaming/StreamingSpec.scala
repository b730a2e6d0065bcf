package graft.streaming

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics (SURVEY.md §5.2 #4: "streaming parity runs for
  * B34–B37"): each streaming operator is checked against its own batch run
  * over identical data, plus watermark late-data and stateful-dedup behavior
  * driven through MemoryStream micro-batches.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("B34 parity: streaming tumbling agg == batch tumbling agg") {
    val stream = EventsStreaming.loadStream(spark, dir)
    val q = EventsStreaming.tumblingAgg(stream).writeStream
      .format("memory").queryName("tumbling_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumbling_out")
      .select("hour_start", "event_type", "n", "total_value")
      .collect().map(_.toString).sorted
    val batch = EventsStreaming.tumblingAgg(graft.Tables.events(spark, dir))
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("B126b parity: streaming OHLC bars == the same windowed plan on batch") {
    val stream = EventsStreaming.loadStream(spark, dir)
    val q = EventsStreaming.barsStream(stream).writeStream
      .format("memory").queryName("bars_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bars_out")
      .collect().map(_.toString).sorted
    val batch = EventsStreaming.barsStream(graft.Tables.events(spark, dir))
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
    // and the bar fields agree with the q198 batch operator row-for-row
    val viaOperator = graft.operators.EventsOps
      .hourlyBars(graft.Tables.events(spark, dir))
      .select(col("event_type"), col("hr"), col("n"), col("open_c"),
        col("high_c"), col("low_c"), col("close_c"), col("vwap_micro"))
      .collect().map(_.toString).sorted
    val viaStreamShape = spark.table("bars_out")
      .select(col("event_type"),
        expr("unix_micros(hour_start) div 3600000000").as("hr"),
        col("n"), col("open_c"), col("high_c"), col("low_c"),
        col("close_c"), col("vwap_micro"))
      .collect().map(_.toString).sorted
    assert(viaStreamShape.sameElements(viaOperator))
  }

  test("B34 parity: streaming sliding agg == batch sliding agg") {
    val stream = EventsStreaming.loadStream(spark, dir)
    val q = EventsStreaming.slidingAgg(stream).writeStream
      .format("memory").queryName("sliding_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sliding_out")
      .select("win_start", "n", "total_value")
      .collect().map(_.toString).sorted
    val batch = EventsStreaming.slidingAgg(graft.Tables.events(spark, dir))
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
    // every event lands in exactly 4 overlapping windows
    val total = spark.table("sliding_out").agg(sum("n")).collect()(0).getLong(0)
    assert(total == graft.Tables.events(spark, dir).count() * 4)
  }

  test("loadStream survives both ts encodings: nanos parquet == micros parquet") {
    // Two checked-in fixtures hold the SAME 40 logical events, one written
    // as TIMESTAMP(NANOS) (read as nanos-long under the legacy flag) and one
    // as TIMESTAMP(MICROS) (read as a native timestamp). A reader that
    // hard-codes either unit silently corrupts the other — the regression
    // this test pins is every 2024 event collapsing into 1970-01-20 when a
    // micros file hits a nanos-assuming div-1000. Both the streaming and the
    // batch loader must agree on both encodings, and both encodings must
    // yield identical windowed aggregates.
    def fixture(name: String): String =
      java.nio.file.Paths.get(getClass.getResource(s"/fixtures/$name").toURI)
        .toString
    def streamedAgg(dir: String): Seq[String] = {
      val qn = s"fixture_out_${dir.hashCode.abs}"
      val q = EventsStreaming.tumblingAgg(EventsStreaming.loadStream(spark, dir))
        .writeStream.format("memory").queryName(qn).outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(qn).select("hour_start", "event_type", "n", "total_value")
        .collect().map(_.toString).sorted.toSeq
    }
    def batchAgg(dir: String): Seq[String] =
      EventsStreaming.tumblingAgg(graft.Tables.events(spark, dir))
        .collect().map(_.toString).sorted.toSeq
    val (nanosDir, microsDir) = (fixture("events_nanos"), fixture("events_micros"))
    val streamedNanos = streamedAgg(nanosDir)
    val streamedMicros = streamedAgg(microsDir)
    assert(streamedNanos.nonEmpty && streamedNanos == streamedMicros,
      "the two physical ts encodings must decode to the same event times")
    assert(streamedNanos == batchAgg(nanosDir) &&
      streamedMicros == batchAgg(microsDir),
      "streaming and batch loaders must agree on each encoding")
    // guard against the specific failure mode: nothing may land pre-2000
    val minYear = EventsStreaming.loadStream(spark, microsDir)
      .writeStream.format("memory").queryName("fixture_raw_out")
      .outputMode("append").start()
    try minYear.processAllAvailable() finally minYear.stop()
    val y = spark.table("fixture_raw_out")
      .agg(min(year(col("ts")))).collect()(0).getInt(0)
    assert(y == 2024, s"ts unit mis-scaled: min year $y")
  }

  test("B35 parity: native session_window == lag-gap sessionization (batch)") {
    val events = graft.Tables.events(spark, dir)
    val native = EventsStreaming.sessionAgg(events)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(_.toString).sorted
    // lag-gap formulation (the q35 shape): same sessions, keyed by start ts
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val lagGap = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new", when(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(_.toString).sorted
    assert(native.nonEmpty && native.sameElements(lagGap))
  }

  test("stream-stream join parity: views x clicks within horizon == batch join") {
    val raw = EventsStreaming.loadStream(spark, dir)
    val q = EventsStreaming.viewClickJoin(
      raw.filter(col("event_type") === "view"),
      raw.filter(col("event_type") === "click")).writeStream
      .format("memory").queryName("ss_join_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ss_join_out").collect().map(_.toString).sorted
    val batchEvents = graft.Tables.events(spark, dir)
    val batch = EventsStreaming.viewClickJoin(
      batchEvents.filter(col("event_type") === "view"),
      batchEvents.filter(col("event_type") === "click"))
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("B36: watermark drops late rows in append mode") {
    val input = MemoryStream[(Timestamp, Long)](spark)
    val events = input.toDF().toDF("ts", "event_id")
    val q = EventsStreaming.watermarkedCounts(events, "1 hour").writeStream
      .format("memory").queryName("wm_out").outputMode("append").start()
    try {
      // batch 1: establish event time at 12:00 → watermark = 11:00
      input.addData((ts("2024-01-01 10:15:00"), 1L), (ts("2024-01-01 12:00:00"), 2L))
      q.processAllAvailable()
      // batch 2: a LATE row for the already-closed 10:00 window (ts < watermark)
      // and an on-time row
      input.addData((ts("2024-01-01 10:20:00"), 3L), (ts("2024-01-01 12:10:00"), 4L))
      q.processAllAvailable()
      // batch 3: advance watermark far enough to close every window
      input.addData((ts("2024-01-01 20:00:00"), 5L))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("wm_out")
      .select(date_format(col("win_start"), "HH:mm").as("w"), col("n"))
      .as[(String, Long)].collect().toMap
    // the late 10:20 row was dropped: the 10:00 window still counts 1
    assert(out("10:00") == 1L, s"late row leaked into closed window: $out")
    assert(out("12:00") == 2L)
  }

  test("B37: dropDuplicatesWithinWatermark emits each event_id once across batches") {
    val input = MemoryStream[(Timestamp, Long, String)](spark)
    val events = input.toDF().toDF("ts", "event_id", "payload")
    val q = EventsStreaming.dedupWithinWatermark(events, "1 hour").writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1L, "a"),
        (ts("2024-01-01 10:00:01"), 1L, "a_dup_same_batch"),
        (ts("2024-01-01 10:00:02"), 2L, "b"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:05:00"), 1L, "a_dup_next_batch"),
        (ts("2024-01-01 10:06:00"), 3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("B37: mapGroupsWithState maintains per-user running counts across batches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val input = MemoryStream[(Long, Double)](spark)
    val counted = input.toDS().toDF("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
    val q = counted.toDF("user_id", "running_n").writeStream
      .format("memory").queryName("state_out").outputMode("update").start()
    try {
      input.addData((1L, 1.0), (1L, 2.0), (2L, 3.0))
      q.processAllAvailable()
      input.addData((1L, 4.0))
      q.processAllAvailable()
    } finally q.stop()
    // last update per user wins: user 1 → 3 events total, user 2 → 1
    val latest = spark.table("state_out").groupBy("user_id")
      .agg(max("running_n").as("n")).as[(Long, Long)].collect().toMap
    assert(latest == Map(1L -> 3L, 2L -> 1L))
  }

  test("bloom stream dedup: first occurrence passes, repeats drop, state stays bounded") {
    val input = MemoryStream[(Long, String)](spark)
    // small filter on purpose: 2^10 bits x 4 buckets is still far larger
    // than the 6 distinct texts, so no false positives are possible here
    val out = CorpusStreaming.bloomDedupStream(
      input.toDS(), numBits = 1 << 10, numHashes = 4, buckets = 4)
    val q = out.toDF("doc_id", "text").writeStream
      .format("memory").queryName("bloom_dedup_out").outputMode("append").start()
    try {
      input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      // next micro-batch: re-sends of seen texts must NOT re-emit — the
      // bitset survived in the state store across batches
      input.addData((4L, "alpha"), (5L, "beta"), (6L, "gamma"), (7L, "gamma"))
      q.processAllAvailable()
      input.addData((8L, "delta"), (9L, "alpha"))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("bloom_dedup_out")
      .select("text").as[String].collect().sorted.toSeq
    assert(emitted == Seq("alpha", "beta", "delta", "gamma"),
      s"each distinct text must be emitted exactly once: $emitted")
    // the duplicate in the FIRST batch of its text never double-emits either
    val ids = spark.table("bloom_dedup_out").select("doc_id").as[Long].collect().toSet
    assert(ids.intersect(Set(3L, 4L, 5L, 7L, 9L)).isEmpty,
      s"a repeat id leaked through: $ids")
  }

  test("bloom stream dedup parity: streamed output == batch exact dedup (planted dups)") {
    // documents with planted duplicates, streamed in two halves
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val planted = docs.take(10).map { case (id, t) => (id + 1000000L, t) }
    val input = MemoryStream[(Long, String)](spark)
    val out = CorpusStreaming.bloomDedupDocs(
      input.toDS().toDF("doc_id", "text"), numBits = 1 << 18)
    val q = out.writeStream
      .format("memory").queryName("bloom_parity_out").outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      input.addData(planted: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamedTexts = spark.table("bloom_parity_out")
      .select("text").as[String].collect().sorted.toSeq
    val exactDistinct = docs.map(_._2).distinct.sorted
    assert(streamedTexts == exactDistinct,
      "streamed first-occurrence set must equal the exact distinct set " +
        "(filter sized so fp = 0 at this cardinality)")
  }

  test("map-side corpus ops run UNCHANGED on streaming frames (batch parity)") {
    // contextWindows and classifierScore are stateless column programs, so
    // the same operator code must accept a streaming DataFrame as-is — the
    // design property that lets one curation library serve both the backfill
    // and the live ingest path. Streamed-in-two-batches output must equal
    // the batch run row-for-row.
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val (h1, h2) = docs.splitAt(docs.length / 2)
    // one MemoryStream PER query: two queries sharing a source race on its
    // single commit offset (the faster query's commit trims batches the
    // slower one hasn't planned yet)
    val inScore = MemoryStream[(Long, String)](spark)
    val inWin = MemoryStream[(Long, String)](spark)
    val inBpe = MemoryStream[(Long, String)](spark)
    val qScore = graft.operators.TextAnalysis
      .classifierScore(inScore.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("score_parity_out")
      .outputMode("append").start()
    val qWin = graft.operators.TextAnalysis
      .contextWindows(inWin.toDS().toDF("doc_id", "text"), 64, 48)
      .writeStream.format("memory").queryName("windows_parity_out")
      .outputMode("append").start()
    val qBpe = graft.operators.TextAnalysis
      .bpeTokenCounts(inBpe.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("bpe_parity_out")
      .outputMode("append").start()
    try {
      inScore.addData(h1: _*); inWin.addData(h1: _*); inBpe.addData(h1: _*)
      qScore.processAllAvailable(); qWin.processAllAvailable()
      qBpe.processAllAvailable()
      inScore.addData(h2: _*); inWin.addData(h2: _*); inBpe.addData(h2: _*)
      qScore.processAllAvailable(); qWin.processAllAvailable()
      qBpe.processAllAvailable()
    } finally { qScore.stop(); qWin.stop(); qBpe.stop() }
    val batchDf = spark.createDataFrame(docs).toDF("doc_id", "text")
    val streamedScores = spark.table("score_parity_out")
      .select("doc_id", "n_tokens", "score", "decision")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val batchScores = graft.operators.TextAnalysis.classifierScore(batchDf)
      .select("doc_id", "n_tokens", "score", "decision")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(streamedScores == batchScores)
    val streamedWins = spark.table("windows_parity_out")
      .select("doc_id", "window_idx", "start_tok", "n_tok", "window_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val batchWins = graft.operators.TextAnalysis.contextWindows(batchDf, 64, 48)
      .select("doc_id", "window_idx", "start_tok", "n_tok", "window_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(streamedWins == batchWins)
    // the BPE tokenizer (merge table in the plan) is equally stateless:
    // live ingest counts model tokens with the same expression as backfill
    val streamedBpe = spark.table("bpe_parity_out")
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens", "n_merged_tokens")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val batchBpe = graft.operators.TextAnalysis.bpeTokenCounts(batchDf)
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens", "n_merged_tokens")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamedBpe == batchBpe)
  }

  test("streaming near-dup admission: cross-batch gating, append visibility, replay idempotence") {
    import graft.operators.Dedup
    val corpus = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_admit")
    val idxPath = s"$tmp/idx"
    val accPath = s"$tmp/accepted"
    Dedup.writeLshIndex(corpus, idxPath)
    def mut(t: String) = {
      val toks = t.split(" ").filter(_.nonEmpty)
      (toks.take(1) ++ Array("zzmut") ++ toks.drop(2)).mkString(" ")
    }
    val seed = corpus.filter(col("doc_id") === 3)
      .select(col("text")).as[String].head()
    val fresh1 = "completely novel accepted doc about broadcast joins one"
    val fresh2 = "unrelated second admission candidate covering shuffle partitions instead"
    val batch1 = Seq(
      (5000001L, mut(seed)),  // near-dup of an INDEXED doc → reject
      (5000002L, fresh1))     // novel → admit
    val batch2 = Seq(
      (6000001L, fresh1 + " x"), // near-dup of batch1's ADMITTED doc → reject
      (6000002L, fresh2))        // novel → admit
    val input = MemoryStream[(Long, String)](spark)
    val q = CorpusStreaming.startNearDupAdmission(
      input.toDS().toDF("doc_id", "text"), idxPath, accPath,
      s"$tmp/ckpt", tau = 0.6)
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.read.parquet(accPath)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(accepted == Set(5000002L, 6000002L),
      s"admission gate wrong: $accepted")
    // replay batch1 directly (at-least-once): its survivor now matches its
    // own indexed copy at Jaccard 1.0 → nothing admitted twice
    CorpusStreaming.admitBatch(idxPath, accPath, tau = 0.6)(
      batch1.toDF("doc_id", "text"), 99L)
    val afterReplay = spark.read.parquet(accPath)
      .select(col("doc_id")).as[Long].collect().toSeq.sorted
    assert(afterReplay == Seq(5000002L, 6000002L),
      s"replay double-admitted: $afterReplay")
  }

  test("incremental IVF index build: streamed appends == batch-built index") {
    import graft.operators.{AnnIvf, Similarity}
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .cache()
    val centroids = AnnIvf.trainCentroids(emb, k = 8)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_stream")
    val batchPath = s"$tmp/batch"
    val streamPath = s"$tmp/stream"
    AnnIvf.writeIndexQuantized(emb, centroids, batchPath)

    // the same corpus arrives as three micro-batches
    val rows = emb.as[(Long, Seq[Double])].collect().toSeq
    val parts = rows.grouped((rows.size + 2) / 3).toSeq
    val input = MemoryStream[(Long, Seq[Double])](spark)
    val q = EmbeddingStreaming.startIndexStream(
      input.toDS().toDF("vec_id", "v"), centroids,
      streamPath, s"$tmp/ckpt")
    try {
      parts.foreach { p => input.addData(p: _*); q.processAllAvailable() }
    } finally q.stop()

    // the incrementally-built index holds identical rows (more files is
    // fine — one per touched cell per batch; content is what parity means)
    def rowsOf(p: String) = spark.read.parquet(p)
      .select(col("vec_id"), col("qv8"), col("scale"), col("qnorm"), col("cell"))
      .collect().map(_.toString).sorted.toSeq
    assert(rowsOf(streamPath) == rowsOf(batchPath))

    // and answers the same probes identically through the search path
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    def answers(p: String) = AnnIvf
      .topKQuantized(spark, p, qs, emb, 5, centroids, nprobe = 3)
      .select(col("qid"), col("rank"), col("neighbor"), round(col("cos"), 4))
      .orderBy("qid", "rank").collect().map(_.toString).toSeq
    assert(answers(streamPath) == answers(batchPath))

    // at-least-once crash replay: re-appending a whole batch duplicates its
    // rows in the index, but a replayed vector must not occupy two of the
    // k final ranks — answers stay IDENTICAL to the batch index
    EmbeddingStreaming.appendBatch(streamPath, centroids)(
      spark.createDataFrame(parts.head).toDF("vec_id", "v"), 99L)
    assert(spark.read.parquet(streamPath).count() > rows.size,
      "the replay must actually have duplicated rows")
    assert(answers(streamPath) == answers(batchPath),
      "replayed duplicates leaked into the top-k ranks")

    // compaction: the replayed duplicates and the per-(batch, cell) file
    // fragments both disappear; rows and search answers are unchanged
    EmbeddingStreaming.compactIndex(spark, streamPath)
    assert(spark.read.parquet(streamPath).count() == rows.size,
      "compaction must drop exactly the replayed duplicate rows")
    assert(rowsOf(streamPath) == rowsOf(batchPath),
      "compaction changed index content")
    assert(answers(streamPath) == answers(batchPath),
      "compaction changed search answers")
    val cellDirs = new java.io.File(streamPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    cellDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"${d.getName} holds ${files.length} files after compaction")
    }
    emb.unpersist()
  }

  test("streaming funnel: a late first-stage event re-qualifies an earlier-rejected click") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val events = input.toDF().toDF("user_id", "ts", "event_type")
    val q = EventsStreaming.funnelStream(events, Seq("view", "click", "purchase"))
      .toDF("user_id", "flags").writeStream
      .format("memory").queryName("funnel_late_out").outputMode("update").start()
    try {
      // batch 1: the click arrives FIRST — no view yet, so it cannot count
      input.addData((1L, ts("2024-01-01 10:05:00"), "click"))
      q.processAllAvailable()
      val mid = spark.table("funnel_late_out").as[(Long, Seq[Int])]
        .collect().toMap
      assert(mid(1L) == Seq(0, 0, 0), s"click before any view counted: $mid")
      // batch 2: a LATE view with an EARLIER event time — the buffered
      // click (10:05 > 10:00) must now qualify
      input.addData((1L, ts("2024-01-01 10:00:00"), "view"))
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val flags = spark.table("funnel_late_out").as[(Long, Seq[Int])]
      .collect().groupBy(_._1).map { case (u, rows) =>
        u -> rows.map(_._2).maxBy(_.sum) }
    assert(flags(1L) == Seq(1, 1, 0), s"late view did not re-qualify: $flags")
  }

  test("streaming funnel parity: shuffled out-of-order micro-batches == batch funnel") {
    // deterministic pseudo-random corpus: 40 users × 30 events, delivered
    // in DESCENDING event-time order across 4 micro-batches — maximal
    // out-of-orderness for the candidate-buffer fixpoint
    val types = Vector("view", "click", "purchase", "error", "signup")
    val rnd = new scala.util.Random(42)
    val all = (0 until 1200).map { i =>
      (rnd.nextInt(40).toLong, i.toLong,
        new Timestamp(1704067200000L + rnd.nextInt(86400) * 1000L),
        types(rnd.nextInt(types.size)))
    }
    val delivery = all.sortBy(-_._3.getTime).grouped(300).toSeq
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val events = input.toDF().toDF("user_id", "ts", "event_type")
    val q = EventsStreaming.funnelStream(events, Seq("view", "click", "purchase"))
      .toDF("user_id", "flags").writeStream
      .format("memory").queryName("funnel_parity_out").outputMode("update").start()
    try {
      delivery.foreach { b =>
        input.addData(b.map(r => (r._1, r._3, r._4)))
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    // flags are monotone over updates → final state = per-user max
    val streamed = spark.table("funnel_parity_out").as[(Long, Seq[Int])]
      .collect().groupBy(_._1).map { case (u, rows) =>
        u -> rows.map(_._2).maxBy(_.sum) }
    val batch = graft.operators.EventsOps.funnel(
        all.toDF("user_id", "event_id", "ts", "event_type"),
        Seq("view", "click", "purchase"))
      .select(col("user_id"), col("reached_view"), col("reached_click"),
        col("reached_purchase"))
      .as[(Long, Int, Int, Int)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    // a user with no stage-typed events never emits a streaming row — its
    // implicit flags are all-zero
    batch.foreach { case (u, f) =>
      assert(streamed.getOrElse(u, Seq(0, 0, 0)) == f,
        s"user $u: streamed ${streamed.get(u)} vs batch $f")
    }
  }

  test("B90: transformWithState hourly quota — per-batch arrival order, state across batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Timestamp, Long, Long)](spark)
      val events = input.toDF().toDF("ts", "user_id", "event_id")
      val q = EventsStreaming.quotaStream(events, maxPerHour = 2).writeStream
        .format("memory").queryName("quota_out").outputMode("update").start()
      try {
        // batch 1: user 1 sends 3 events in hour 10 -> 2 admitted (lowest
        // (ts, event_id) first), 1 rejected; user 2 sends 1 -> admitted
        input.addData(
          (ts("2024-01-01 10:05:00"), 1L, 103L),
          (ts("2024-01-01 10:01:00"), 1L, 101L),
          (ts("2024-01-01 10:03:00"), 1L, 102L),
          (ts("2024-01-01 10:30:00"), 2L, 201L))
        q.processAllAvailable()
        // batch 2: quota for (u1, hour 10) is FULL from batch 1 -> reject,
        // even though this event's ts precedes the batch-1 ones (a throttle
        // admits by processing order); hour 11 opens fresh
        input.addData(
          (ts("2024-01-01 10:00:30"), 1L, 104L),
          (ts("2024-01-01 11:00:00"), 1L, 105L))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("quota_out")
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._2 -> r._4).toMap
      assert(got == Map(101L -> true, 102L -> true, 103L -> false,
        201L -> true, 104L -> false, 105L -> true), s"got $got")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("B92: event-time timers close sessions — gap closes inline, watermark closes tails") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Timestamp, Long, Long, Double)](spark)
      val events = input.toDF().toDF("ts", "user_id", "event_id", "value")
      val q = EventsStreaming.sessionTimerStream(events,
        gap = "30 minutes", delay = "10 minutes").writeStream
        .format("memory").queryName("sess_timer_out").outputMode("append").start()
      try {
        // batch 1: u1 two events in one session; u2 one event
        input.addData(
          (ts("2024-01-01 10:00:00"), 1L, 1L, 1.0),
          (ts("2024-01-01 10:10:00"), 1L, 2L, 2.0),
          (ts("2024-01-01 10:05:00"), 2L, 3L, 5.0))
        q.processAllAvailable()
        // batch 2: u1's 11:00 event reveals a >30min gap -> inline close;
        // watermark advances to 10:50, past u2's 10:35 timeout -> timer close
        input.addData((ts("2024-01-01 11:00:00"), 1L, 4L, 3.0))
        q.processAllAvailable()
        // batches 3-4: same-session filler for u9 pushes the watermark past
        // u1's open-session timeout (11:30) without closing u9's own session
        input.addData((ts("2024-01-01 13:00:00"), 9L, 5L, 0.0))
        q.processAllAvailable()
        input.addData((ts("2024-01-01 13:20:00"), 9L, 6L, 0.0))
        q.processAllAvailable()
        input.addData((ts("2024-01-01 13:40:00"), 9L, 7L, 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("sess_timer_out")
        .as[(Long, Long, Long, Long, Double, String)].collect()
        .map(r => (r._1, r._2 / 1000000L % 86400, r._3 / 1000000L % 86400,
          r._4, r._5, r._6)).toSet
      def sec(h: Int, m: Int) = (h * 3600 + m * 60).toLong
      val expected = Set(
        (1L, sec(10, 0), sec(10, 10), 2L, 3.0, "gap"),
        (2L, sec(10, 5), sec(10, 5), 1L, 5.0, "timer"),
        (1L, sec(11, 0), sec(11, 0), 1L, 3.0, "timer"))
      assert(got == expected, s"got $got")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("B101: drift monitor - in-distribution batch quiet, shifted batch alarms") {
    val tmp = java.nio.file.Files.createTempDirectory("drift").toString
    val reference = (1L to 1000L).toDF("v").cache()
    reference.count()
    val input = MemoryStream[Long](spark)
    val q = DriftStreaming.startDriftMonitor(
      input.toDF().toDF("v"), reference, threshold = 0.2,
      outPath = s"$tmp/out", checkpoint = s"$tmp/ckpt")
    try {
      // batch 0: a uniform subsample of the reference range - small KS
      input.addData((1L to 1000L by 10): _*)
      q.processAllAvailable()
      // batch 1: shifted wholly above the reference - KS -> 1
      input.addData((2001L to 2100L): _*)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(s"$tmp/out")
      .select(col("batch_id"), col("n_batch"), col("ks"), col("alarm"))
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out.length == 2, out.toSeq)
    val (quiet, shifted) = (out(0), out(1))
    assert(quiet._2 == 100L && quiet._3 < 0.2 && !quiet._4, s"quiet: $quiet")
    // disjoint-above distribution: exact KS is 1.0
    assert(shifted._3 == 1.0 && shifted._4, s"shifted: $shifted")
  }

  test("B190s/B220s: W1 + CvM monitors — row-for-row parity with the " +
      "batch operators across micro-batches, shifted batch alarms") {
    val tmp = java.nio.file.Files.createTempDirectory("drift2").toString
    val reference = (1L to 1000L).toDF("v").cache()
    reference.count()
    val batches = Seq(
      (1L to 1000L by 10).toSeq, // in-distribution subsample
      (2001L to 2100L).toSeq,    // disjoint above: big W1, CvM near max
      (51L to 1050L).toSeq)      // small uniform +50 shift: W1 ≈ 50
    val inW = MemoryStream[Long](spark)
    // W1 is reported in value units (the batch operator's cent contract,
    // v/100): the disjoint batch reads ~15.5, the +50 shift ~0.5
    val qW = DriftStreaming.startW1Monitor(inW.toDF().toDF("v"), reference,
      threshold = 5.0, outPath = s"$tmp/w1", checkpoint = s"$tmp/ckw")
    val inC = MemoryStream[Long](spark)
    val qC = DriftStreaming.startCvmMonitor(inC.toDF().toDF("v"), reference,
      threshold = 0.5, outPath = s"$tmp/cvm", checkpoint = s"$tmp/ckc")
    try {
      batches.foreach { b =>
        inW.addData(b: _*); qW.processAllAvailable()
        inC.addData(b: _*); qC.processAllAvailable()
      }
    } finally { qW.stop(); qC.stop() }

    // row-for-row parity: each audit row equals the batch operator run
    // on (reference ∪ that micro-batch) — the B233 discipline
    def pooled(b: Seq[Long]) =
      reference.select(col("v"), lit(true).as("is_ref"))
        .unionByName(b.toDF("v").select(col("v"), lit(false).as("is_ref")))
    val w1Rows = spark.read.parquet(s"$tmp/w1")
      .select("batch_id", "n_batch", "w1", "alarm")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(w1Rows.length == 3)
    batches.zipWithIndex.foreach { case (b, i) =>
      val direct = graft.operators.Profiling
        .wassersteinDrift(pooled(b), "v", col("is_ref"))
        .select(col("w1").cast("double")).head().getDouble(0)
      assert(w1Rows(i)._2 == b.size.toLong && w1Rows(i)._3 == direct,
        s"w1 batch $i: ${w1Rows(i)} vs $direct")
    }
    // W1 is in value units (cents/100): +50 uniform shift reads ~0.5
    assert(!w1Rows(0)._4 && w1Rows(1)._4, w1Rows.toSeq.toString)
    assert(math.abs(w1Rows(2)._3 - 0.5) < 0.05 && !w1Rows(2)._4,
      w1Rows(2).toString)

    val cvmRows = spark.read.parquet(s"$tmp/cvm")
      .select("batch_id", "n_batch", "t", "alarm")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(cvmRows.length == 3)
    batches.zipWithIndex.foreach { case (b, i) =>
      val direct = graft.operators.Profiling
        .cramerVonMises(pooled(b), "v", col("is_ref"))
        .select(col("t")).head().getDouble(0)
      assert(cvmRows(i)._2 == b.size.toLong && cvmRows(i)._3 == direct,
        s"cvm batch $i: ${cvmRows(i)} vs $direct")
    }
    // disjoint distributions push CvM toward nm/N² · N = its ceiling
    assert(!cvmRows(0)._4 && cvmRows(1)._4, cvmRows.toSeq.toString)
  }

  test("B265s: AD monitor — batch parity per micro-batch, tail shift alarms") {
    val tmp = java.nio.file.Files.createTempDirectory("drift3").toString
    val reference = (1L to 1000L).toDF("v").cache()
    reference.count()
    val batches = Seq(
      (1L to 1000L by 10).toSeq,                       // in-distribution
      ((1L to 900L by 10) ++ (5000L to 5090L)).toSeq)  // contaminated tail
    val in = MemoryStream[Long](spark)
    val q = DriftStreaming.startAdMonitor(in.toDF().toDF("v"), reference,
      threshold = 2.0, outPath = s"$tmp/ad", checkpoint = s"$tmp/ck")
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.read.parquet(s"$tmp/ad")
      .select("batch_id", "n_batch", "a2", "alarm")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(rows.length == 2)
    batches.zipWithIndex.foreach { case (b, i) =>
      val direct = graft.operators.Profiling.andersonDarling(
        reference.select(col("v"), lit(true).as("is_ref")).unionByName(
          b.toDF("v").select(col("v"), lit(false).as("is_ref"))),
        "v", col("is_ref")).select(col("a2")).head().getDouble(0)
      assert(rows(i)._3 == direct, s"ad batch $i: ${rows(i)._3} vs $direct")
    }
    assert(!rows(0)._4 && rows(1)._4, rows.toSeq.toString)
  }

  test("B121: stream-stream interval join matches the batch pair set across batches") {
    val input = MemoryStream[(Timestamp, Long, Long, String, Double)](spark)
    val events = input.toDF()
      .toDF("ts", "user_id", "event_id", "event_type", "value")
    val purchases = events.filter(col("event_type") === "purchase")
    val touches = events.filter(col("event_type").isin("view", "click"))
    val q = EventsStreaming.streamStreamTouchJoin(purchases, touches,
      horizonSec = 1800).writeStream
      .format("memory").queryName("ssjoin_out").outputMode("append").start()
    val all = Seq(
      // u1: two touches inside the 30-min horizon, one outside, one after
      (ts("2024-01-01 09:20:00"), 1L, 10L, "view", 0.0),     // outside (>30m)
      (ts("2024-01-01 09:40:00"), 1L, 11L, "view", 0.0),     // inside
      (ts("2024-01-01 09:55:00"), 1L, 12L, "click", 0.0),    // inside
      (ts("2024-01-01 10:00:00"), 1L, 13L, "purchase", 9.99),
      (ts("2024-01-01 10:05:00"), 1L, 14L, "view", 0.0),     // after → no
      // u2: purchase arrives in a LATER batch than its touch
      (ts("2024-01-01 10:10:00"), 2L, 20L, "click", 0.0),
      (ts("2024-01-01 10:30:00"), 2L, 21L, "purchase", 5.00))
    try {
      input.addData(all.take(5): _*)
      q.processAllAvailable()
      input.addData(all.drop(5): _*)
      q.processAllAvailable()
      // watermark-advancing filler so buffered pairs flush to append output
      input.addData((ts("2024-01-01 12:00:00"), 9L, 99L, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssjoin_out")
      .select(col("p_id"), col("t_id")).as[(Long, Long)].collect().toSet
    assert(got == Set((13L, 11L), (13L, 12L), (21L, 20L)), s"got $got")
  }

  test("B105s: streaming Misra-Gries — exact at k >= distinct, bounded and law-abiding below") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // skewed per-type item stream split over two micro-batches
      val all = (0 until 300).map { i =>
        (if (i % 2 == 0) "view" else "click", s"u${i % (10 + i % 3)}")
      }
      def run(k: Int, name: String, batches: Int): Map[(String, String), Long] = {
        val input = MemoryStream[(String, String)](spark)
        val events = input.toDF().toDF("event_type", "item")
        val q = EventsStreaming.heavyHitterStream(events, "event_type", "item", k)
          .writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          all.grouped(math.max(1, all.length / batches)).foreach { slice =>
            input.addData(slice: _*)
            q.processAllAvailable()
          }
        } finally q.stop()
        // Update mode re-emits the summary per batch. In the EXACT regime
        // counters only grow, so max-per-pair == final state; the
        // approximate run uses ONE batch, making the table the final
        // summary verbatim (decrements inside a slice never re-emit).
        spark.table(name).as[(String, String, Long)].collect()
          .groupBy(r => (r._1, r._2)).map { case (p, rs) => p -> rs.map(_._3).max }
      }
      val exact = all.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
      // exact regime: k dominates per-type distinct items; state crosses
      // micro-batches (3 slices)
      assert(run(64, "hh_exact", batches = 3) == exact)
      // approximate regime: ≤ k entries per key survive and never overestimate
      val approx = run(4, "hh_small", batches = 1)
      approx.groupBy(_._1._1).foreach { case (t, m) =>
        assert(m.size <= 4, s"$t carries ${m.size} > k entries")
      }
      approx.foreach { case (p, est) =>
        assert(est <= exact(p), s"$p overestimated: $est > ${exact(p)}")
      }
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("B120s: streaming CUSUM == batch CUSUM on the same series, state across batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // two series over 48 hours; 'click' level-shifts +14/hour at hour 30
      // — the accumulating drift a per-point detector misses
      val base = 1704067200000000L
      val events = (0 until 48).flatMap { h =>
        val clicks = if (h >= 30) 18 else 4
        (0 until 5).map(i => ("view", base + h * 3600000000L + i * 1000L)) ++
          (0 until clicks).map(i =>
            ("click", base + h * 3600000000L + 500000L + i * 1000L))
      }.zipWithIndex.map { case ((t, us), id) =>
        (id.toLong, id.toLong, new Timestamp(us / 1000L), t)
      }
      val eventsDf = events.toDF("user_id", "event_id", "ts", "event_type")
      val batch = graft.operators.EventsOps.cusumChangepoints(eventsDf)
        .as[(String, Long, Long, Long, Boolean)].collect().toSet
      assert(batch.exists(_._5), "fixture must trip the alarm")
      assert(batch.filter(_._1 == "view").forall(!_._5), "view must stay quiet")
      // stream the hourly aggregates in hour order over 4 micro-batches,
      // baseline frozen from the same batch totals
      val hourly = eventsDf
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hr"))
        .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
        .as[(String, Long, Long)].collect().sortBy(r => (r._2, r._1))
      val baseline = hourly.groupBy(_._1).map { case (t, rs) =>
        t -> ((rs.map(_._3).sum, rs.length.toLong))
      }
      val input = MemoryStream[(String, Long, Long)](spark)
      val q = EventsStreaming.cusumStream(
        input.toDF().toDF("event_type", "hr", "cnt"), baseline)
        .writeStream.format("memory").queryName("cusum_out")
        .outputMode("update").start()
      try {
        hourly.grouped(hourly.length / 4 + 1).foreach { slice =>
          input.addData(slice: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.table("cusum_out")
        .as[(String, Long, Long, Long, Boolean)].collect().toSet
      assert(streamed == batch,
        s"stream/batch diverged: ${streamed.diff(batch)} vs ${batch.diff(streamed)}")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("B147s: streaming Holt == batch Holt bit-for-bit, state across batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // rise-then-crash series: the downswing forces negative trends,
      // where floor-vs-truncate halving would diverge
      val base = 1704067200000000L
      val counts = Seq(5, 20, 40, 65, 90, 60, 25, 10, 3, 1)
      val events = counts.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map(i => ("load", base + h * 3600000000L + i * 1000L)) ++
          (0 until (h + 1)).map(i => ("ramp", base + h * 3600000000L + i * 1000L))
      }.zipWithIndex.map { case ((t, us), id) =>
        (id.toLong, new Timestamp(us / 1000L), t)
      }
      val eventsDf = events.toDF("user_id", "ts", "event_type")
      val batch = graft.operators.EventsOps.holtHourly(eventsDf)
        .select(col("event_type"), col("hr"), col("cnt"), col("level"),
          col("trend"), col("forecast"))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(batch.exists(_._5 < 0), "fixture must exercise a negative trend")
      val hourly = eventsDf
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hr"))
        .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
        .as[(String, Long, Long)].collect().sortBy(r => (r._2, r._1))
      val input = MemoryStream[(String, Long, Long)](spark)
      val q = EventsStreaming.holtStream(
        input.toDF().toDF("event_type", "hr", "cnt"))
        .writeStream.format("memory").queryName("holt_out")
        .outputMode("update").start()
      try {
        hourly.grouped(hourly.length / 4 + 1).foreach { slice =>
          input.addData(slice: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.table("holt_out")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"stream/batch diverged: ${streamed.diff(batch)} vs ${batch.diff(streamed)}")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("B233: streaming forecast errors == the batch lag-24 join term-for-term") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // 3 days of two series with different daily shapes; gaps included
      // (hour 30 missing: the ring slot must NOT serve a stale day)
      val rnd = new scala.util.Random(201)
      val hourly = (0 until 72).flatMap { h =>
        val rows = Seq(
          ("cyc", h.toLong, 10L + (h % 24)),
          ("rnd", h.toLong, 5L + rnd.nextInt(30).toLong))
        if (h == 30) rows.filterNot(_._1 == "rnd") else rows
      }
      // batch truth: lag-24 join with the q283 smape term
      val truth = (for {
        (t, h, c) <- hourly
        f <- hourly.collectFirst { case (`t`, ph, pc) if ph == h - 24 => pc }
        if c + f > 0
      } yield (t, h, c, f, math.abs(c - f),
        math.floor(2e6 * math.abs(c - f).toDouble / (c + f)).toLong)).toSet
      // the hour-30 gap: cyc@54 has its sibling, but the slot for rnd@54
      // holds rnd@30's absence -> rnd@54 must NOT pair against day-1 data
      assert(!truth.exists(r => r._1 == "rnd" && r._2 == 54))
      val input = MemoryStream[(String, Long, Long)](spark)
      val q = EventsStreaming.forecastErrorStream(
        input.toDF().toDF("event_type", "hr", "cnt"))
        .writeStream.format("memory").queryName("fc_out")
        .outputMode("update").start()
      try {
        hourly.sortBy(_._2).grouped(20).foreach { slice =>
          input.addData(slice: _*); q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.table("fc_out")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == truth,
        s"stream/batch diverged: ${streamed.diff(truth)} vs ${truth.diff(streamed)}")
      assert(truth.nonEmpty)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("B90b: initial-state quota — batch ledger seeds the throttle across a restart") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // hour bucket of 2024-01-01 10:xx
      val hour10 = ts("2024-01-01 10:00:00").getTime * 1000L / 3600000000L
      // ledger: user 1 already admitted 2 events in hour 10 (quota FULL);
      // user 2 admitted 1 (one slot left)
      val history = Seq((1L, hour10, 2L), (2L, hour10, 1L))
        .toDF("user_id", "hour_bucket", "admitted")
      val input = MemoryStream[(Timestamp, Long, Long)](spark)
      val events = input.toDF().toDF("ts", "user_id", "event_id")
      val q = EventsStreaming.quotaStreamSeeded(events, maxPerHour = 2, history)
        .writeStream.format("memory").queryName("seeded_quota_out")
        .outputMode("update").start()
      try {
        input.addData(
          (ts("2024-01-01 10:30:00"), 1L, 11L),  // u1 full -> reject
          (ts("2024-01-01 10:31:00"), 2L, 21L),  // u2 last slot -> admit
          (ts("2024-01-01 10:32:00"), 2L, 22L),  // u2 now full -> reject
          (ts("2024-01-01 11:05:00"), 1L, 12L))  // fresh hour -> admit
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("seeded_quota_out")
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._2 -> r._4).toMap
      assert(got == Map(11L -> false, 21L -> true, 22L -> false, 12L -> true),
        s"got $got")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("B155s: streaming bitmap distinct — running counts == batch prefix truth") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(33)
      // ids straddle block boundaries (BlockBits = 65536) and repeat across
      // batches — replays of an id must NOT increment the count again
      val all = (1 to 900).map { _ =>
        (s"s${rnd.nextInt(3)}", rnd.nextInt(200000).toLong)
      }
      val slices = all.grouped(300).toSeq
      val input = MemoryStream[(String, Long)](spark)
      val events = input.toDF().toDF("seg", "id")
      val q = EventsStreaming.bitmapDistinctStream(events, "seg", "id")
        .writeStream.format("memory").queryName("bm_distinct_out")
        .outputMode("update").start()
      val perBatch = scala.collection.mutable.ArrayBuffer.empty[Map[String, Long]]
      try {
        slices.foreach { s =>
          input.addData(s: _*)
          q.processAllAvailable()
          perBatch += spark.table("bm_distinct_out").as[(String, Long)]
            .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
        }
      } finally q.stop()
      // after each slice the running count equals the exact distinct of the
      // PREFIX consumed so far (update mode re-emits; counts only grow, so
      // max == latest)
      slices.inits.toSeq.reverse.drop(1).zip(perBatch).foreach {
        case (prefix, got) =>
          val truth = prefix.flatten.groupBy(_._1)
            .map { case (s, v) => s -> v.map(_._2).distinct.size.toLong }
          assert(got == truth, s"prefix of ${prefix.size} batches")
      }
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("B110s: streaming sequence matcher == batch regexp across batch cuts") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(77)
      val types = Seq("view", "click", "purchase", "search")
      // random per-user streams; batch cuts land mid-pattern on purpose
      val all = (1 to 1200).map { i =>
        (rnd.nextInt(25).toLong,
          new Timestamp(1700000000000L + i * 1000L),
          i.toLong, types(rnd.nextInt(types.size)))
      }
      val input = MemoryStream[(Long, Timestamp, Long, String)](spark)
      val events = input.toDF().toDF("user_id", "ts", "event_id", "event_type")
      val q = EventsStreaming.sequenceMatchStream(events, "vc*p")
        .writeStream.format("memory").queryName("seq_match_out")
        .outputMode("update").start()
      try {
        all.grouped(137).foreach { s => input.addData(s: _*); q.processAllAvailable() }
      } finally q.stop()
      // update mode re-emits per batch; len only grows, so max == final
      val got = spark.table("seq_match_out").as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (u, v) =>
          u -> (v.map(_._2).max, v.map(_._3).max) }
      val batch = graft.operators.EventsOps.sequenceMatches(
        all.toDF("user_id", "ts", "event_id", "event_type"), "vc*p")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == batch)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("B262s: streaming KLL — exact quantiles under k, rank law over it") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // exact regime: 900 values < k=4096, cut into 4 micro-batches — the
      // final emitted quantiles equal the naive order statistics
      val rnd = new scala.util.Random(262)
      val vs = Seq.fill(900)(rnd.nextInt(5000).toLong)
      val input = MemoryStream[(String, Long)](spark)
      val q = EventsStreaming.kllQuantileStream(
          input.toDF().toDF("seg", "v"), "seg", "v", k = 4096)
        .writeStream.format("memory").queryName("kll_stream_out")
        .outputMode("update").start()
      try {
        vs.map(("s", _)).grouped(250).foreach { b =>
          input.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val last = spark.table("kll_stream_out")
        .as[(String, Long, Long, Long)].collect().maxBy(_._2)
      val sorted = vs.sorted
      def naive(p: Int) = sorted(sorted.indices
        .find(i => (i + 1) * 100L >= p.toLong * vs.size).get)
      assert(last._2 == vs.size.toLong)
      assert(last._3 == naive(50) && last._4 == naive(90), last.toString)

      // sketch regime: k=64 over 30k values across batches — weight
      // exact, rank error within the ceiling, state stays O(k)
      val vs2 = Seq.fill(30000)(rnd.nextInt(1000000).toLong)
      val input2 = MemoryStream[(String, Long)](spark)
      val q2 = EventsStreaming.kllQuantileStream(
          input2.toDF().toDF("seg", "v"), "seg", "v", k = 64)
        .writeStream.format("memory").queryName("kll_stream_sketch")
        .outputMode("update").start()
      try {
        vs2.map(("s", _)).grouped(10000).foreach { b =>
          input2.addData(b: _*); q2.processAllAvailable() }
      } finally q2.stop()
      val fin = spark.table("kll_stream_sketch")
        .as[(String, Long, Long, Long)].collect().maxBy(_._2)
      assert(fin._2 == vs2.size.toLong)
      val s2 = vs2.sorted
      Seq(50 -> fin._3, 90 -> fin._4).foreach { case (p, est) =>
        val le = s2.count(_ <= est).toLong
        val lt = s2.count(_ < est).toLong
        val target = p.toLong * vs2.size / 100
        assert(le >= target - vs2.size / 12 && lt <= target + vs2.size / 12,
          s"p$p est=$est le=$le lt=$lt")
      }
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("B156s: streaming KMV — exact while not full, sketch == batch prefix") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(57)
      val all = (1 to 600).map(_ => ("s", rnd.nextInt(120).toLong)) // dups
      val input = MemoryStream[(String, Long)](spark)
      val events = input.toDF().toDF("seg", "id")
      val q = EventsStreaming.kmvDistinctStream(events, "seg", "id", k = 256)
        .writeStream.format("memory").queryName("kmv_stream_out")
        .outputMode("update").start()
      try {
        all.grouped(200).foreach { s => input.addData(s: _*); q.processAllAvailable() }
      } finally q.stop()
      // exact regime (120 < k): the FINAL estimate equals exact distinct
      val rows = spark.table("kmv_stream_out").as[(String, Int, Long)].collect()
      val exact = all.map(_._2).distinct.size.toLong
      assert(rows.map(_._3).max == exact)
      // estimator regime: k=16 state never exceeds k, estimate in range
      val input2 = MemoryStream[(String, Long)](spark)
      val q2 = EventsStreaming.kmvDistinctStream(
          input2.toDF().toDF("seg", "id"), "seg", "id", k = 16)
        .writeStream.format("memory").queryName("kmv_stream_small")
        .outputMode("update").start()
      try {
        (1 to 3).foreach { b =>
          input2.addData((1 to 2000).map(i => ("s", (b * 2000 + i).toLong)): _*)
          q2.processAllAvailable()
        }
      } finally q2.stop()
      val last = spark.table("kmv_stream_small").as[(String, Int, Long)]
        .collect().maxBy(_._3)
      assert(last._2 == 16)
      assert(last._3 > 2000 && last._3 < 18000, s"est=${last._3} for 6000")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming SPRT parity: ordered micro-batches == batch sprt, decision sticky") {
    // a high-rate stream decides accept_h1 partway in; later batches must
    // not move the frozen decision stats
    val rnd = new scala.util.Random(49)
    val all = (0 until 3000).map { i =>
      (new Timestamp(1704067200000L + i * 1000L), i.toLong,
        if (rnd.nextDouble() < 0.35) "purchase" else "view")
    }
    val batchRow = graft.operators.EventsOps.sprt(
      all.toDF("ts", "event_id", "event_type"), "purchase").head()
    assert(batchRow.getAs[String]("decision") == "accept_h1")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Timestamp, Long, String)](spark)
    val events = input.toDF().toDF("ts", "event_id", "event_type")
    val q = EventsStreaming.sprtStream(events, "purchase")
      .toDF("decision", "n_decide", "k_decide", "llr_micro").writeStream
      .format("memory").queryName("sprt_out").outputMode("update").start()
    try {
      all.grouped(600).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val emitted = spark.table("sprt_out")
      .as[(String, Long, Long, Long)].collect()
    val fin = emitted.last
    assert(fin == ((batchRow.getAs[String]("decision"),
      batchRow.getAs[Long]("n_decide"), batchRow.getAs[Long]("k_decide"),
      batchRow.getAs[Long]("llr_micro"))), s"stream $fin != batch")
    // stickiness: every post-decision emission reports the SAME frozen row
    val decidedRows = emitted.filter(_._1 != "continue")
    assert(decidedRows.nonEmpty && decidedRows.toSet.size == 1,
      s"decision moved: ${decidedRows.toSet}")
  }

  test("streaming PSI drift: batch parity + the planted-drift hour tops the chart") {
    val rnd = new scala.util.Random(55)
    // 3 hours of stable traffic + 1 hour where values jump 10×
    val all = (0 until 4).flatMap { h =>
      (0 until 500).map { i =>
        val base = 1.0 + rnd.nextInt(3000) / 100.0
        val v = if (h == 2) base * 10 else base
        (new Timestamp(1704067200000L + h * 3600000L + (i % 3600) * 1000L),
          i.toLong, "view", v)
      }
    }
    // reference = hour 0's own empirical bin distribution, so the stable
    // hours score ~0 and only the shifted hour stands out
    val h0bins = all.filter(_._1.getTime < 1704067200000L + 3600000L)
      .map(r => math.min(math.round(r._4 * 100) / 3000, 15L))
    val ref = (0 to 15).map(b =>
      h0bins.count(_ == b).toDouble / h0bins.size)
    val batch = EventsStreaming.psiDriftStream(
      all.toDF("ts", "event_id", "event_type", "value"), ref)
      .as[(Timestamp, Long, Long)].collect().toSeq.sortBy(_._1.getTime)
    // the shifted hour has by far the highest PSI
    assert(batch.size == 4)
    assert(batch.maxBy(_._3)._1.getTime ==
      1704067200000L + 2 * 3600000L)
    // streaming replay: 2 ordered micro-batches, append after watermark
    val input = MemoryStream[(Timestamp, Long, String, Double)](spark)
    val events = input.toDF().toDF("ts", "event_id", "event_type", "value")
    val q = EventsStreaming.psiDriftStream(events, ref)
      .writeStream.format("memory").queryName("psi_out")
      .outputMode("append").start()
    try {
      all.grouped(1000).foreach { b => input.addData(b); q.processAllAvailable() }
      // closing batch far in the future flushes every window past the
      // watermark
      input.addData(Seq((new Timestamp(1704067200000L + 100L * 3600000L),
        0L, "view", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("psi_out").as[(Timestamp, Long, Long)]
      .collect().toSeq.filter(_._1.getTime < 1704067200000L + 10 * 3600000L)
      .sortBy(_._1.getTime)
    assert(streamed == batch,
      s"stream/batch divergence:\n$streamed\nvs\n$batch")
  }

  test("B215: conformal outlier rate — threshold law, drift alarm, parity") {
    // calibration: hour-0 values; threshold at alpha = 1/10 must equal
    // the sorted-array rank selection exactly
    val t0 = 1704067200000L
    val rnd = new scala.util.Random(53)
    val calVals = (1 to 400).map(_ => 1.0 + rnd.nextInt(2000) / 100.0)
    val cal = calVals.zipWithIndex.map { case (v, i) =>
      (new Timestamp(t0 + i * 1000L), i.toLong, "view", v) }
    val thr = EventsStreaming.conformalThresholdCents(
      cal.toDF("ts", "event_id", "event_type", "value"), 1L, 10L)
    val sortedCents = calVals.map(v => math.round(v * 100)).sorted
    val r = (400 + 1 - 1 * (400 + 1) / 10).toInt
    assert(thr == sortedCents(r - 1), "threshold must be the exact rank")
    // live stream: hours 1..2 in-distribution, hour 3 shifted up 10x
    val live = (0 until 3).flatMap { h =>
      (1 to 300).map { i =>
        val v = if (h == 2) 10.0 + rnd.nextInt(4000) / 100.0
          else 1.0 + rnd.nextInt(2000) / 100.0
        (new Timestamp(t0 + (h + 1) * 3600000L + i * 1000L),
          (h * 1000 + i).toLong, "view", v)
      }
    }
    val batch = EventsStreaming.conformalRateStream(
      live.toDF("ts", "event_id", "event_type", "value"), thr)
      .as[(Timestamp, Long, Long)].collect().sortBy(_._1.getTime).toSeq
    assert(batch.size == 3)
    // the shifted hour's outlier rate dwarfs the calibrated ~alpha rate
    assert(batch.last._3 * 2 > batch.last._2,
      s"shifted hour must alarm: $batch")
    assert(batch.head._3 * 4 < batch.head._2,
      s"stable hour must stay near alpha: $batch")
    // streaming replay == batch row-for-row (append after watermark)
    val input = MemoryStream[(Timestamp, Long, String, Double)](spark)
    val q = EventsStreaming.conformalRateStream(
      input.toDF().toDF("ts", "event_id", "event_type", "value"), thr)
      .writeStream.format("memory").queryName("conf_out")
      .outputMode("append").start()
    try {
      live.grouped(400).foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(Seq((new Timestamp(t0 + 100L * 3600000L),
        0L, "view", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("conf_out").as[(Timestamp, Long, Long)]
      .collect().toSeq.filter(_._1.getTime < t0 + 10 * 3600000L)
      .sortBy(_._1.getTime)
    assert(streamed == batch,
      s"stream/batch divergence:\n$streamed\nvs\n$batch")
  }

  test("B203 parity: streaming Bradley-Terry == batch fixpoint; replay no-op") {
    // duel events fed in 3 micro-batches: after the last, the maintained
    // duel-matrix state must equal the batch pairOutcomes and the
    // re-solved ranking must equal bradleyTerry row-for-row (same MM
    // fixpoint, same integer state, same order)
    val docs = graft.Tables.documents(spark, dir)
    val duels = graft.operators.Preference.duelEvents(docs)
      .as[(String, String)].collect().toSeq
    val statePath = java.nio.file.Files.createTempDirectory("bt_state")
      .resolve("state").toString
    val rankPath = java.nio.file.Files.createTempDirectory("bt_rank")
      .resolve("rank").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bt_ckpt").toString
    val input = MemoryStream[(String, String)](spark)
    val q = PreferenceStreaming.startBradleyTerry(
      input.toDS().toDF("w", "l"), statePath, rankPath, ckpt)
    try {
      duels.grouped(math.max(1, duels.size / 3 + 1)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    assert(canon(spark.read.parquet(statePath).orderBy("w", "l")) ==
      canon(graft.operators.Preference.pairOutcomes(docs).orderBy("w", "l")))
    val want = canon(graft.operators.Preference.bradleyTerry(docs)).sorted
    assert(canon(spark.read.parquet(rankPath)).sorted == want)
    assert(want.nonEmpty)
    // non-idempotent sums + the batch-id guard: replaying batch 0 must
    // leave both the state and the re-solved ranking unchanged
    PreferenceStreaming.refreshDuelState(spark, statePath,
      duels.take(10).toDF("w", "l"), batchId = 0L)
    assert(canon(spark.read.parquet(statePath).orderBy("w", "l")) ==
      canon(graft.operators.Preference.pairOutcomes(docs).orderBy("w", "l")))
  }

  test("B254: streaming Page-Hinkley gaps == batch frame; alarm after the shift") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // level shift at hour 20 (10 -> 60): the adaptive mean must flag
      // it with no calibrated baseline; a flat series never alarms
      val hourly = (0 until 40).flatMap(h => Seq(
        ("shift", h.toLong, if (h < 20) 10L else 60L),
        ("flat", h.toLong, 10L)))
      val batch = graft.operators.EventsOps.pageHinkleyFrame(
        hourly.toDF("event_type", "h", "y"), deltaMicro = 0L)
        .select(col("event_type"), col("h"), col("gap"))
        .as[(String, Long, Long)].collect().toSet
      val input = MemoryStream[(String, Long, Long)](spark)
      val q = EventsStreaming.pageHinkleyStream(
        input.toDF().toDF("event_type", "hr", "cnt"))
        .writeStream.format("memory").queryName("ph_out")
        .outputMode("update").start()
      try {
        hourly.sortBy(_._2).grouped(hourly.length / 3 + 1).foreach { s =>
          input.addData(s: _*); q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.table("ph_out")
        .as[(String, Long, Long, Boolean)].collect()
      assert(streamed.map(r => (r._1, r._2, r._3)).toSet == batch,
        "streaming gaps must equal the batch window frame bit-for-bit")
      val alarms = streamed.filter(_._4)
      assert(alarms.nonEmpty && alarms.forall(_._1 == "shift"))
      assert(alarms.map(_._2).min >= 20L, "no alarm before the shift")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("B262s crash-replay: RocksDB restore reproduces the KLL sketch " +
      "byte-identically") {
    // Kill the query mid-stream and restart a NEW query from the same
    // checkpoint: the restored compactor state must continue to the
    // EXACT bytes the uninterrupted run produces — the derandomized
    // survivor parity exists precisely so replays of the same update
    // sequence are bit-identical, and this drives it through the real
    // RocksDB snapshot/restore path, in the sketch regime (k = 16 on
    // 600 values per segment ⇒ compaction certain). The probe processor
    // sorts each batch slice (the B110s/B147 in-slice arrival
    // discipline) so the update sequence is well-defined, and emits
    // sha256(state bytes) after every batch.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(262)
      val data = (1 to 1200).map(i =>
        (s"s${i % 2}", rnd.nextInt(100000).toLong))
      val batches = data.grouped(300).toSeq // 4 batches
      def runTo(name: String, crashAfter: Option[Int]): Map[String, String] = {
        val cp = java.nio.file.Files
          .createTempDirectory(s"kll_cp_$name").toString
        val input = MemoryStream[(String, Long)](spark)
        // memory sink cannot recover from a checkpoint; foreachBatch can
        val out = new java.util.concurrent.ConcurrentLinkedQueue[
          (String, Long, String)]
        def start() = EventsStreaming.kllBytesProbe(
            input.toDF().toDF("seg", "v"), "seg", "v", k = 16)
          .writeStream
          .foreachBatch((df: org.apache.spark.sql.Dataset[(String, Long, String)],
              _: Long) => df.collect().foreach(out.add))
          .option("checkpointLocation", cp).outputMode("update").start()
        var q = start()
        try {
          batches.zipWithIndex.foreach { case (b, i) =>
            input.addData(b: _*)
            q.processAllAvailable()
            if (crashAfter.contains(i)) { // the planted crash + restore
              q.stop()
              q = start()
            }
          }
        } finally q.stop()
        // update mode re-emits per batch; the LAST row per segment is the
        // final state — keyed by max n (weight only grows)
        import scala.jdk.CollectionConverters._
        out.asScala.toSeq.groupBy(_._1)
          .map { case (s, rs) => s -> rs.maxBy(_._2)._3 }
      }
      val uninterrupted = runTo("base", None)
      val crashed = runTo("crash", Some(1)) // die after batch 2 of 4
      assert(uninterrupted.keySet == Set("s0", "s1"))
      assert(crashed == uninterrupted,
        s"restored-run sketch bytes diverged: $crashed vs $uninterrupted")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
