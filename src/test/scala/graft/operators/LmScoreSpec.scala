package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** n-gram LM fluency scoring: the exact (q99-oracled) path vs the
  * broadcast-floored 100 TB path, plus the banding semantics.
  */
class LmScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.001").cache()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("doc_id", "n_pairs", "micro_logp", "band")
      .orderBy("doc_id").collect().map(_.toString).toSeq

  test("broadcast path with an uncut floor == exact path, row for row") {
    val nBigrams = TextAnalysis.ngramLmScore(docs) // warm path for counts
    val exact = rows(nBigrams)
    val viaBroadcast = rows(
      TextAnalysis.ngramLmScoreBroadcast(docs, maxBigrams = 1000000))
    assert(viaBroadcast == exact,
      "with every bigram kept, the floored model must reproduce the exact scores")
  }

  test("scoring join broadcasts; the corpus never shuffles before its partial agg") {
    val df = TextAnalysis.ngramLmScoreBroadcast(docs, maxBigrams = 500)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the LM side must broadcast:\n${plan.take(1500)}")
  }

  test("a small floor still scores every pair (backoff is total) and bands sanely") {
    val floored = TextAnalysis.ngramLmScoreBroadcast(docs, maxBigrams = 50)
    val n = docs.count()
    assert(floored.count() == n, "every document must come back scored")
    // backoff totality: no null-derived zero scores on docs that have pairs
    assert(floored.filter(col("n_pairs") > 0 && col("micro_logp") === 0)
      .count() == 0)
    val bands = floored.groupBy("band").count()
      .as[(String, Long)].collect().toMap
    assert(bands.keySet.subsetOf(Set("short", "fluent", "odd")))
  }

  test("frozen-model expression == broadcast-join formulation, bit for bit") {
    // integer weights + the same fold order make the two formulations
    // EXACTLY equal on the training corpus, not merely close
    val model = TextAnalysis.trainLmModel(docs, maxBigrams = 300)
    val viaJoin = rows(TextAnalysis.ngramLmScoreBroadcast(docs, maxBigrams = 300))
    val viaExpr = rows(TextAnalysis.lmScoreFrozen(docs, model))
    assert(viaExpr == viaJoin)
    // and the frozen path totals OOV words on NEW text instead of failing
    import spark.implicits._
    val unseen = Seq((777L, "zzznotaword qqqneither zzznotaword"))
      .toDF("doc_id", "text")
    val scored = TextAnalysis.lmScoreFrozen(unseen, model).collect()(0)
    assert(scored.getAs[Long]("n_pairs") == 2L)
    assert(scored.getAs[Long]("micro_logp") == 2 * model.oovMicro)
  }

  test("frozen-model scoring runs UNCHANGED on a streaming frame (batch parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val model = TextAnalysis.trainLmModel(docs, maxBigrams = 300)
    val rowsIn = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (h1, h2) = rowsIn.splitAt(rowsIn.length / 2)
    val input = MemoryStream[(Long, String)](spark)
    val q = TextAnalysis.lmScoreFrozen(input.toDS().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("lm_parity_out")
      .outputMode("append").start()
    try {
      input.addData(h1: _*); q.processAllAvailable()
      input.addData(h2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("lm_parity_out")
      .select("doc_id", "n_pairs", "micro_logp", "band")
      .collect().map(_.toString).sorted.toSeq
    val batch = TextAnalysis.lmScoreFrozen(
      spark.createDataFrame(rowsIn).toDF("doc_id", "text"), model)
      .select("doc_id", "n_pairs", "micro_logp", "band")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("synthetic fluency gap: repeated common phrase outscores shuffled rare words") {
    // the LM trains on the mini-corpus itself: doc 1's phrase repeats so its
    // bigrams are high-probability; doc 2 is the same words in a scrambled
    // order whose bigrams appear once each — mean log-prob must rank 1 > 2
    val mini = Seq(
      (1L, Seq.fill(20)("the quick brown fox").mkString(" ")),
      (2L, "quick the fox brown the brown quick fox the fox quick brown")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmScore(mini)
      .select(col("doc_id"), (col("micro_logp") / col("n_pairs")).as("mean"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L),
      s"repeated phrase must be more fluent: $out")
  }
}
