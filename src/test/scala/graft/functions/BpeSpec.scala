package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BpeEncode semantics: rank-order merge application with leftmost-non-
  * overlapping passes — the exact law the DuckDB replace-chain oracle
  * replays, plus the classic-BPE equivalence cases from its scaladoc.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(text).toDF("t")
      .select(BpeExprs.bpeEncode(col("t"), merges).as("e"))
      .as[Seq[String]].head()

  test("chained merges assemble whole words in rank order") {
    val merges = Seq(("t", "a"), ("l", "e"), ("ta", "b"), ("tab", "le"))
    assert(enc("table", merges) == Seq("table"))
    assert(enc("tale", merges) == Seq("ta", "le"))   // no (ta,le) merge
    assert(enc("stable", merges) == Seq("s", "table"))
  }

  test("a pass is leftmost non-overlapping (the string-replace law)") {
    val m = Seq(("a", "a"))
    assert(enc("aaa", m) == Seq("aa", "a"))
    assert(enc("aaaa", m) == Seq("aa", "aa"))
    assert(enc("aaaaa", m) == Seq("aa", "aa", "a"))
  }

  test("merges never cross word boundaries; multi-space text is tolerated") {
    val m = Seq(("a", "b"))
    assert(enc("a b", m) == Seq("a", "b"))
    assert(enc("ab  ab", m) == Seq("ab", "ab"))
    assert(enc("", m) == Seq.empty)
    assert(enc("   ", m) == Seq.empty)
  }

  test("a merged token is not reconsidered within the same pass") {
    // (a,b) then (ab,b): "abb" → pass 1 merges ab leaving b; pass 2 joins
    val m = Seq(("a", "b"), ("ab", "b"))
    assert(enc("abb", m) == Seq("abb"))
    // but "abab" in pass 1 yields ab ab — no (ab,ab) merge exists
    assert(enc("abab", m) == Seq("ab", "ab"))
  }

  test("single chars and unmergeable text pass through as characters") {
    assert(enc("xyz", Seq(("a", "b"))) == Seq("x", "y", "z"))
    assert(enc("q", Seq(("a", "b"))) == Seq("q"))
  }

  test("training learns the hand-computable table on a toy corpus") {
    // "aa" x2, "ab" x1: pair (a,a) weighs 2, (a,b) weighs 1 → first merge
    // (a,a); afterwards only (a,b) remains with weight 1 < 2 → stop.
    val mini = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val learned = graft.operators.TextAnalysis.trainBpeMerges(mini, k = 5)
    assert(learned == Seq(("a", "a")))
  }

  test("training's first merge equals q83's top weighted pair") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val first = graft.operators.TextAnalysis.trainBpeMerges(docs, k = 1).head
    val top = graft.operators.TextAnalysis
      .bpePairCounts(docs, k = 1)
      .select("left_sym", "right_sym").as[(String, String)].head()
    assert(first == top,
      "iteration 1 of training IS the q83 aggregation — they must agree")
  }

  test("each learned merge strictly shrinks the corpus token count") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(100).cache()
    try {
      val learned = graft.operators.TextAnalysis.trainBpeMerges(docs, k = 6)
      assert(learned.nonEmpty)
      val counts = (0 to learned.length).map { n =>
        docs.select(sum(size(graft.operators.TextAnalysis
          .bpeTokens(col("text"), learned.take(n)))))
          .head().getLong(0)
      }
      counts.sliding(2).foreach { case Seq(a, b) =>
        assert(b < a, s"merge must reduce tokens: $counts")
      }
      // determinism: a second training run learns the identical table
      assert(graft.operators.TextAnalysis.trainBpeMerges(docs, k = 6) == learned)
    } finally docs.unpersist()
  }

  test("true token counts diverge from whitespace counts on the corpus") {
    val counts = graft.operators.TextAnalysis
      .bpeTokenCounts(graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    val r = counts.agg(
      sum(col("n_ws_tokens")), sum(col("n_bpe_tokens")),
      sum(col("n_merged_tokens"))).head()
    val (ws, bpe, merged) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(ws > 0 && bpe > ws, "BPE tokens must outnumber words (sub-word)")
    assert(merged > 0, "the fixed merge table must actually fire")
  }
}
