package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece greedy longest-match laws (round 9, B164). */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def enc(text: String, starts: Seq[String], conts: Seq[String]) =
    Seq(Tuple1(text)).toDF("t")
      .select(WordPieceExprs.wordpieceEncode(col("t"), starts, conts).as("e"))
      .select(col("e.n_words"), col("e.n_pieces"), col("e.n_unk"))
      .as[(Long, Long, Long)].head()

  private val starts = Seq("un", "affable", "able", "u", "n", "a") // no 'f'/'b'/'l'/'e' starts
  private val conts = Seq("able", "ff", "a", "b", "l", "e", "n")

  test("greedy takes the longest match at every position") {
    // "unable": start "un" (longest over "u"), then cont "able" (over "a")
    assert(enc("unable", starts, conts) == ((1L, 2L, 0L)))
    // whole-word start beats any split
    assert(enc("affable", starts, conts) == ((1L, 1L, 0L)))
  }

  test("a word stuck mid-scan becomes ONE [UNK] token, not a partial split") {
    // "unablez": un + able + no 'z' continuation -> whole word [UNK]
    assert(enc("unablez", starts, conts) == ((1L, 1L, 1L)))
    // no start piece at position 0 at all
    assert(enc("zzz", starts, conts) == ((1L, 1L, 1L)))
  }

  test("multi-word accounting sums words, pieces and unks") {
    assert(enc("unable affable zzz  unable", starts, conts) ==
      ((4L, 6L, 1L)))
  }

  test("greedy can LOSE to a completable split — the known WordPiece quirk") {
    // "nun": greedy start "n", cont "u"... then cont "n" completes here, so
    // pick a sharper case: start "nu" would consume too much if "n" can't
    // continue. starts = {nu, n}, conts = {un} only:
    val s2 = Seq("nu", "n"); val c2 = Seq("un")
    // greedy: "nun" -> "nu" (longest) -> stuck at "n" (no cont "n") -> UNK,
    // even though n + un completes. The rule is greedy, not optimal.
    assert(enc("nun", s2, c2) == ((1L, 1L, 1L)))
  }

  test("empty text and separator runs") {
    assert(enc("", starts, conts) == ((0L, 0L, 0L)))
    assert(enc("   ", starts, conts) == ((0L, 0L, 0L)))
  }
}
