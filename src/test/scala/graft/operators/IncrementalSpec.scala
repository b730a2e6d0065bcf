package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks._

/** The mergeable-state law: merge(agg(A), agg(B)) == agg(A ∪ B), for any
  * split — including splits that leave groups one-sided or empty. */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = (0L until 400L).map { i =>
    (i, s"l${i % 3}", s"s${i % 5}", 10L + (i * 7) % 90)
  }.toDF("doc_id", "lang", "source", "n_chars")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("lang", "source").collect().map(_.toSeq).toSeq

  test("merge(agg(A), agg(B)) == agg(A ∪ B) for assorted splits") {
    val splits = Table("pred",
      col("doc_id") % 2 === 0,      // interleaved
      col("doc_id") < 40L,          // skewed small A
      col("doc_id") < 0L,           // empty A — merge must be identity
      col("doc_id") >= 0L)          // empty B
    forAll(splits) { pred =>
      val merged = Incremental.mergeState(
        Incremental.aggState(corpus.filter(pred)),
        Incremental.aggState(corpus.filter(!pred)))
      assert(canon(merged) == canon(Incremental.aggState(corpus)))
    }
  }

  test("merge is associative across many batches") {
    val batches = (0 until 5).map(b =>
      Incremental.aggState(corpus.filter(col("doc_id") % 5 === b)))
    val leftFold = batches.reduce(Incremental.mergeState)
    val treeFold = Incremental.mergeState(
      Incremental.mergeState(batches(0), batches(1)),
      batches.drop(2).reduce(Incremental.mergeState))
    assert(canon(leftFold) == canon(treeFold))
    assert(canon(leftFold) == canon(Incremental.aggState(corpus)))
  }

  test("streamed refresh over 3 batches == batch recompute; replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val statePath = java.nio.file.Files.createTempDirectory("inc_state")
      .resolve("state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("inc_ckpt").toString
    val rows = corpus.select("doc_id", "lang", "source", "n_chars")
      .as[(Long, String, String, Long)].collect().toSeq
    val input = MemoryStream[(Long, String, String, Long)](spark)
    val q = Incremental.startStateRefresh(
      input.toDS().toDF("doc_id", "lang", "source", "n_chars"),
      statePath, ckpt)
    try {
      rows.grouped(150).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    assert(canon(spark.read.parquet(statePath)) ==
      canon(Incremental.aggState(corpus)))
    // non-idempotent algebra + the batch-id guard: replaying an already-
    // applied batch must not double its counts
    Incremental.refreshState(spark, statePath,
      corpus.filter(col("doc_id") < 150L), batchId = 0L)
    assert(canon(spark.read.parquet(statePath)) ==
      canon(Incremental.aggState(corpus)))
    // exactly-once under crashes: the applied-batch id must live INSIDE
    // the state directory (published by the same rename as the state),
    // never as a separately-written sibling — a crash between swap and a
    // separate id write would replay merged counts and double them
    val fs = new org.apache.hadoop.fs.Path(statePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(statePath,
      "_applied_batch")), "applied-batch id must ride the state dir")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      statePath + "__applied_batch")), "no sibling id file may remain")
    // crash window: a refresh that staged state+id but died BEFORE the
    // swap leaves the live state untouched and the batch re-applies
    val staged = new org.apache.hadoop.fs.Path(statePath + "__refreshing")
    fs.mkdirs(staged)
    Incremental.writeAppliedBatch(fs, staged, 99L)
    assert(Incremental.readAppliedBatch(fs,
      new org.apache.hadoop.fs.Path(statePath)) < 99L,
      "an unswapped staging id must not be visible as applied")
  }

  test("streamed histogram refresh over batches == from-scratch state; replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val statePath = java.nio.file.Files.createTempDirectory("hist_state")
      .resolve("state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hist_ckpt").toString
    val rows = corpus.select("doc_id", "lang", "source", "n_chars")
      .as[(Long, String, String, Long)].collect().toSeq
    val input = MemoryStream[(Long, String, String, Long)](spark)
    val q = Incremental.startHistRefresh(
      input.toDS().toDF("doc_id", "lang", "source", "n_chars"),
      statePath, ckpt, "n_chars", Seq("lang"), lo = 0L, width = 10L,
      nBuckets = 12)
    try {
      rows.grouped(130).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    def arrs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lang"), col("hist")).as[(String, Seq[Long])]
        .collect().toMap
    val direct = Incremental.histState(corpus, "n_chars", Seq("lang"),
      0L, 10L, 12)
    assert(arrs(spark.read.parquet(statePath)) == arrs(direct))
    // the batch-id guard: a replayed batch must not double its buckets
    Incremental.refreshHistState(spark, statePath,
      corpus.filter(col("doc_id") < 130L), batchId = 0L, "n_chars",
      Seq("lang"), 0L, 10L, 12)
    assert(arrs(spark.read.parquet(statePath)) == arrs(direct))
  }

  test("distinct-count state: union of partials == sketch of the whole") {
    val texts = (0L until 1000L).map(i => (i, s"l${i % 3}", s"text ${i % 257}"))
      .toDF("doc_id", "lang", "text")
    def estimates(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lang"),
          hll_sketch_estimate(col("distinct_sketch")).as("est"))
        .as[(String, Long)].collect().toMap
    val whole = estimates(Incremental.aggStateDistinct(texts))
    val merged = estimates(Incremental.mergeStateDistinct(
      Incremental.aggStateDistinct(texts.filter(col("doc_id") < 300L)),
      Incremental.aggStateDistinct(texts.filter(col("doc_id") >= 300L))))
    // union is order-insensitive but the merged representation can differ
    // from the direct sketch (coupon promotion), so readouts agree to
    // estimator resolution, not bitwise
    whole.foreach { case (lang, est) =>
      assert(math.abs(merged(lang) - est) <= math.max(est * 0.02, 1.0),
        s"$lang: merged ${merged(lang)} vs direct $est")
    }
    // and the estimate is sane: 257 distinct texts spread over 3 langs
    val exact = texts.groupBy("lang").agg(countDistinct("text").as("n"))
      .as[(String, Long)].collect().toMap
    merged.foreach { case (lang, est) =>
      assert(math.abs(est - exact(lang)) <= exact(lang) * 0.05,
        s"$lang: est $est vs exact ${exact(lang)}")
    }
  }

  test("histogram state: merge law is BITWISE, readout bounds rank error by one bucket") {
    val keys = Seq("lang")
    def st(pred: org.apache.spark.sql.Column) = Incremental.histState(
      corpus.filter(pred), "n_chars", keys, lo = 0L, width = 10L, nBuckets = 12)
    val merged = Incremental.mergeHistState(
      st(col("doc_id") % 2 === 0), st(col("doc_id") % 2 === 1), keys)
    val direct = st(lit(true))
    def arrs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lang"), col("hist")).as[(String, Seq[Long])]
        .collect().toMap
    // stronger than the HLL law: the merged state is byte-identical to the
    // from-scratch state, not merely estimator-close
    assert(arrs(merged) == arrs(direct))
    // readout: p50 upper bound must sit within one bucket width of the
    // exact median, and at least half the group's mass must be ≤ it
    val q = Incremental.histQuantiles(merged, keys, 0L, 10L, Seq(50))
      .as[(String, Long, Long)].collect()
      .map { case (l, n, p) => l -> ((n, p)) }.toMap
    val rows = corpus.select(col("lang"), col("n_chars"))
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { case (lang, vs) =>
      val sorted = vs.map(_._2).sorted
      val exact = sorted((sorted.length - 1) / 2)
      val (n, p50) = q(lang)
      assert(n == sorted.length)
      assert(sorted.count(_ <= p50) * 2 >= sorted.length,
        s"$lang: p50 bound $p50 covers under half the mass")
      assert(p50 >= exact && p50 <= exact + 10L + 10L,
        s"$lang: p50 $p50 vs exact median $exact (width 10)")
    }
  }

  test("refresh plan touches only state + delta, never the old corpus") {
    // the maintained state is a tiny keyed table; merging a new batch's
    // partials must not rescan anything else — assert the merged plan's
    // only scans are the two inputs we handed it
    val state = Incremental.aggState(corpus.filter(col("doc_id") < 300L))
      .cache()
    state.count() // materialize: the merge below must reuse, not recompute
    val delta = Incremental.aggState(corpus.filter(col("doc_id") >= 300L))
    val plan = Incremental.mergeState(state, delta)
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"prior state must come from the cached table, not recompute:\n$plan")
    state.unpersist()
  }
}
