package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** RAKE + TextRank behavioral laws (B125/B148). */
class KeyphraseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rakeKeyphrases: multi-word phrases outscore their member singletons") {
    val docs = Seq(
      (1L, "deep learning models the deep learning pipeline the deep learning"),
      (2L, "race alone")).toDF("doc_id", "text")
    val got = Keyphrase.rakeKeyphrases(docs, Seq("the"), 10)
      .select("phrase", "score").as[(String, Long)].collect().toMap
    // deep/learning live in longer phrases too (deg > freq·len), so the
    // standalone "deep learning" run outscores the isolated "race alone"
    assert(got("deep learning") > got("race alone"),
      s"phrase co-occurrence must dominate: $got")
  }

  test("textRankKeywords: a connectivity hub outranks a frequent isolated word") {
    // "core" bridges many distinct neighbors; "noise" repeats but only
    // ever touches one neighbor — frequency alone must not win
    val docs = Seq(
      (1L, "core alpha core beta core gamma core delta"),
      (2L, "noise blip noise blip noise blip noise blip noise blip"))
      .toDF("doc_id", "text")
    val ranks = Keyphrase.textRankKeywords(docs, 20)
      .as[(String, String)].collect()
      .map { case (w, r) => w -> BigDecimal(r) }.toMap
    assert(ranks("core") > ranks("noise"),
      s"hub must outrank frequent isolate: $ranks")
    // deterministic re-run
    val again = Keyphrase.textRankKeywords(docs, 20)
      .as[(String, String)].collect()
      .map { case (w, r) => w -> BigDecimal(r) }.toMap
    assert(again == ranks)
  }
}
