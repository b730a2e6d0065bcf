package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Entropy / overlap / OOV laws (round 7, B85–B87). */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def entropyOf(s: String): Double = {
    val df = Seq((1L, s)).toDF("doc_id", "text")
    val (_, h) = CorpusStats.charEntropy(col("text"))
    df.select(h.as("h")).as[Double].head()
  }

  test("charEntropy: hand-computed values") {
    assert(entropyOf("aaaa") == 0.0)
    // two equiprobable symbols → ln 2
    assert(math.abs(entropyOf("abab") - math.log(2)) < 1e-12)
    // 4 distinct symbols once each → ln 4; 'z','q' in-bin, '!','7' → other
    // (two "other" chars form ONE bin of count 2 → H = 3/4 ln 4 + ... )
    val h = entropyOf("zq!7")
    val expected = 2 * (0.25 * math.log(4)) + 0.5 * math.log(2)
    assert(math.abs(h - expected) < 1e-12, s"got $h want $expected")
  }

  test("groupOverlap: identical groups score 1, disjoint groups are absent") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // identical to group 1
      (3L, "zeta eta theta iota")     // shares no 3-gram with anyone
    ).toDF("gid", "text")
    val got = CorpusStats.groupOverlap(docs, 3)
      .select(col("ga"), col("gb"), col("jaccard"))
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 2L, "1.0000")), s"got $got")
  }

  test("groupOverlap: partial overlap matches hand-set arithmetic") {
    // group 1 grams: {a b c, b c d}; group 2 grams: {b c d, c d e}
    // inter = 1, union = 3 → 1/3
    val docs = Seq((1L, "a b c d"), (2L, "b c d e")).toDF("gid", "text")
    val got = CorpusStats.groupOverlap(docs, 3)
      .select(col("inter"), col("uni"), col("jaccard"))
      .as[(Long, Long, String)].head()
    assert(got == ((1L, 3L, "0.3333")), s"got $got")
  }

  test("oovRate: occurrences outside the head vocab, ties broken by token") {
    // counts: x=4, y=3, z=2, w=1 → vocab(2) = {x, y}
    val docs = Seq(
      (1L, "x x y z"), (2L, "x x y y z w")).toDF("doc_id", "text")
    val got = CorpusStats.oovRate(docs, 2)
      .select(col("doc_id"), col("n_tokens"), col("n_oov"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((4, 1)) && got(2L) == ((6, 2)), s"got $got")
  }

  test("ngramNovelty: shared grams score 0, unique-only docs score 1") {
    val docs = Seq(
      (1L, "a b c d"),  // grams {a b c, b c d} - both also in doc 2
      (2L, "a b c d"),
      (3L, "x y z w")   // grams {x y z, y z w} - unique
    ).toDF("doc_id", "text")
    val got = CorpusStats.ngramNovelty(docs, 3)
      .select(col("doc_id"), col("n_grams"), col("n_unique"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((2L, 0L)), 2L -> ((2L, 0L)), 3L -> ((2L, 2L))),
      s"got $got")
  }

  test("tokenBurstiness: even spread scores ~0 excess, bursty token scores high") {
    // 'e' once in each of 4 docs (VMR = (4*4-16)/(4*4) = 0); 'b' 4x in one doc
    // VMR(b) = (4*16 - 16)/(4*4) = 3
    val docs = Seq(
      (1L, "e b b b b"), (2L, "e"), (3L, "e"), (4L, "e")
    ).toDF("doc_id", "text")
    val got = CorpusStats.tokenBurstiness(docs, minDf = 1)
      .select(col("t"), col("vmr")).as[(String, String)].collect().toMap
    assert(got("e") == "0.0000", s"got $got")
    assert(got("b") == "3.0000", s"got $got")
  }

  test("psi: identical slices score 0; a shifted slice scores big") {
    // two interleaved identical uniform slices -> every decile 50/50
    val same = (1L to 2000L).map(i => (i, i / 2)).toDF("doc_id", "n_chars")
    val p0 = CorpusStats.psi(same, "n_chars", col("doc_id") % 2 === 0, 10)
      .as[String].head()
    assert(p0 == "0.0000", s"got $p0")
    // slice B wholly in A's top decile -> large PSI
    val shifted = ((1L to 1000L).map(i => (2 * i, i)) ++
      (1L to 1000L).map(i => (2 * i + 1, 950L + (i % 50)))).toDF("doc_id", "n_chars")
    val p1 = CorpusStats.psi(shifted, "n_chars", col("doc_id") % 2 === 0, 10)
      .as[String].head().toDouble
    assert(p1 > 1.0, s"got $p1")
  }

  test("gini: equal masses score 0, one-holder concentration approaches 1") {
    val equal = (1 to 10).map(i => ("eq", s"k$i", 5L))
    val conc = Seq(("cc", "whale", 1000L)) ++ (1 to 9).map(i => ("cc", s"m$i", 1L))
    val got = CorpusStats.gini((equal ++ conc).toDF("dim", "k", "x"))
      .select(col("dim"), col("gini")).as[(String, String)].collect().toMap
    assert(got("eq") == "0.0000", s"got $got")
    assert(got("cc").toDouble > 0.85, s"got $got")
  }

  test("pmiPairs: always-together tokens outrank independent ones") {
    // p,q co-occur in every doc containing either; x,y independent-ish
    val docs = Seq(
      (1L, "p q x"), (2L, "p q y"), (3L, "p q x y"), (4L, "p q"),
      (5L, "x a a a a"), (6L, "y a a a a"), (7L, "a x"), (8L, "a y")
    ).toDF("doc_id", "text")
    val got = CorpusStats.pmiPairs(docs, minDf = 2, k = 30)
      .select(col("w1"), col("w2"), col("pmi"))
      .as[(String, String, Double)].collect()
    val asMap = got.map(r => (r._1, r._2) -> r._3).toMap
    // PMI(p,q) = ln(8*4/(4*4)) = ln 2 — the maximum present
    assert(math.abs(asMap(("p", "q")) - math.log(2)) < 1e-12, s"got $asMap")
    assert(got.head._1 == "p" && got.head._2 == "q", s"top pair: ${got.head}")
  }
}
