package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("segmentDedup keeps first corpus-wide occurrence and reassembles in order") {
    val docs = Seq(
      (0L, "x y z w"),   // segments (len 2): "x y", "z w"
      (1L, "x y q r"),   // "x y" already seen in doc 0 -> drops
      (2L, "z w x y q r") // all three segments seen -> nothing survives
    ).toDF("doc_id", "text")
    val out = CorpusOps.segmentDedup(docs, segLen = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 2L, 2L), (1L, 2L, 1L), (2L, 3L, 0L)))
    // doc 1 reassembles to exactly its surviving segment
    val md5qr = java.security.MessageDigest.getInstance("MD5")
    assert(out(1).getString(3) ==
      md5qr.digest("q r".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    // doc 2: empty reassembly hashes the empty string
    assert(out(2).getString(3) ==
      md5qr.digest(Array.empty[Byte]).map("%02x".format(_)).mkString)
  }

  test("corpusFrequencyQuality emits exact integer corpus-frequency stats") {
    val docs = Seq(
      (0L, "a a b"),  // corpus counts: a=3, b=2, c=1
      (1L, "a b c")
    ).toDF("doc_id", "text")
    val rows = CorpusOps.corpusFrequencyQuality(docs).collect()
    // doc0: n=3, sum=3+3+2=8, min=2, max=3, mean=8/3=2
    assert(rows(0).getLong(1) == 3L && rows(0).getLong(2) == 8L)
    assert(rows(0).getLong(3) == 2L && rows(0).getLong(4) == 3L)
    assert(rows(0).getLong(5) == 2L)
    // doc1: n=3, sum=3+2+1=6, min=1, max=3, mean=2
    assert(rows(1).getLong(2) == 6L && rows(1).getLong(3) == 1L)
  }

  test("groupSample is exact top-k per group and partition-count invariant") {
    val docs = (0L until 500L).map(i =>
      (i, if (i % 5 == 0) "en" else "de", if (i % 3 == 0) "web" else "book"))
      .toDF("doc_id", "lang", "source")
    val k = 7
    val a = CorpusOps.groupSample(docs.repartition(1), k).collect()
    val b = CorpusOps.groupSample(docs.repartition(16), k).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    val perGroup = a.groupBy(r => (r.getString(1), r.getString(2)))
    assert(perGroup.values.forall(_.length == k))
    assert(perGroup.values.forall(_.map(_.getLong(3)).sorted.sameElements(1L to k)))
  }

  test("incrementalDedup labels dup_existing, dup_batch, kept correctly") {
    val existing = Seq((0L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "alpha"),  // content already in corpus -> dup_existing
      (3L, "gamma"),  // fresh -> kept
      (5L, "gamma"),  // dup of 3 within the batch -> dup_batch
      (7L, "beta")    // dup_existing even though also repeated nowhere else
    ).toDF("doc_id", "text")
    val out = CorpusOps.incrementalDedup(existing, incoming)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "dup_existing"), (3L, "kept"),
      (5L, "dup_batch"), (7L, "dup_existing")))
  }

  test("curationReport applies reason priority dup > too_short > repetitious") {
    val docs = Seq(
      (0L, "en", Seq.fill(40)("w").mkString(" ")),          // repetitious (1 distinct / 40)
      (1L, "en", Seq.fill(40)("w").mkString(" ")),          // dup of 0 (beats repetitious)
      (2L, "en", "just a few words"),                       // too_short
      (3L, "en", (0 until 40).map("t" + _).mkString(" "))   // kept
    ).toDF("doc_id", "lang", "text")
    val out = CorpusOps.curationReport(docs).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out == Map("dup" -> 1L, "repetitious" -> 1L,
      "too_short" -> 1L, "kept" -> 1L))
  }

  test("epochShuffle is a partition-layout-invariant permutation, distinct per seed") {
    val docs = (0L until 300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def order(df: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      CorpusOps.epochShuffle(df, seed)
        .select("epoch_pos", "doc_id").collect()
        .sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    val base = order(docs, seed = 3L)
    // a permutation of the corpus: every doc exactly once
    assert(base.sorted == (0L until 300L))
    // same seed, different physical layout -> identical permutation
    assert(order(docs.repartition(17), 3L) == base)
    assert(order(docs.coalesce(1), 3L) == base)
    // different seed -> different permutation (overwhelmingly)
    assert(order(docs, seed = 4L) != base)
    // positions are dense from 0
    val pos = CorpusOps.epochShuffle(docs, 3L).select("epoch_pos")
      .as[Long].collect().sorted
    assert(pos.toSeq == (0L until 300L))
  }

  test("redactPii counts and replaces emails, IPv4s, and phone numbers") {
    val df = Seq(
      (0L, "mail me at bob7@web.org or root@host.net from 192.168.0.1 tel 555-0199"),
      (1L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val rows = CorpusOps.redactPii(df).orderBy("doc_id").collect()
    assert(rows(0).getAs[Long]("n_emails") == 2L)
    assert(rows(0).getAs[Long]("n_ips") == 1L)
    assert(rows(0).getAs[Long]("n_tels") == 1L)
    assert(rows(0).getAs[String]("redacted") ==
      "mail me at <EMAIL> or <EMAIL> from <IP> tel <TEL>")
    assert(rows(1).getAs[Long]("n_emails") == 0L)
    assert(rows(1).getAs[String]("redacted") == "nothing sensitive here")
  }

  test("contextWindows: stride/tail/short-doc semantics") {
    val docs = Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (1L, "a b c"),                                  // shorter than maxLen
      (2L, "  "),                                     // no tokens -> no windows
      (3L, "solo")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.contextWindows(docs, maxLen = 4, stride = 3)
      .orderBy("doc_id", "window_idx")
      .select("doc_id", "window_idx", "start_tok", "n_tok", "window_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(rows === Seq(
      (0L, 0L, 0L, 4L, "t1 t2 t3 t4"),
      (0L, 1L, 3L, 4L, "t4 t5 t6 t7"),
      (0L, 2L, 6L, 4L, "t7 t8 t9 t10"),
      (0L, 3L, 9L, 1L, "t10"),          // tail window, shorter than maxLen
      (1L, 0L, 0L, 3L, "a b c"),
      (3L, 0L, 0L, 1L, "solo")))
  }

  test("bpePairCounts: frequency-weighted adjacent pairs over distinct words") {
    // "ab" x3 and "abc" x1 -> pair (a,b) counts 4, (b,c) counts 1;
    // single-char words contribute nothing
    val docs = Seq((0L, "ab ab abc x"), (1L, "ab x y")).toDF("doc_id", "text")
    val rows = TextAnalysis.bpePairCounts(docs, k = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(rows === Seq(("a", "b", 4L), ("b", "c", 1L)))
  }

  test("snapshotDiff classifies added, removed, modified, unchanged") {
    val n = null.asInstanceOf[String]
    // 5-7 pin the NULL-text semantics: a null text is a present row whose
    // value compares null-safely — never a missing row
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c"),
      (5L, n), (6L, n), (7L, n)).toDF("doc_id", "text")
    val cur = Seq((2L, "b"), (3L, "c-edited"), (4L, "d"),
      (5L, n), (6L, "now-set")).toDF("doc_id", "text")
    val m = CorpusOps.snapshotDiff(prev, cur)
      .as[(Long, String)].collect().toMap
    assert(m === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "modified", 4L -> "added",
      5L -> "unchanged", 6L -> "modified", 7L -> "removed"))
  }

  test("shardManifest is layout-invariant with an order-free checksum") {
    val docs = (0L until 200L).map(i => (i, s"tok$i alpha beta"))
      .toDF("doc_id", "text")
    val run = (df: org.apache.spark.sql.DataFrame) =>
      CorpusOps.shardManifest(df, 8)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val base = run(docs.repartition(1))
    // different partitioning AND different within-partition order must
    // produce the byte-identical manifest (the checksum is a commutative
    // integer sum, the shard key is content-derived)
    assert(base === run(docs.repartition(13).sortWithinPartitions(
      col("doc_id").desc)))
    assert(base.map(_._2).sum === 200L) // every doc in exactly one shard
    assert(base.map(_._1) === base.map(_._1).sorted)
  }

  test("repeatedSubstrings recovers planted repeats at exact span, any alignment") {
    // vocabulary of unique words so no organic window ever repeats
    def words(prefix: String, n: Int) = (0 until n).map(i => s"$prefix$i")
    val shared = words("dup", 9)                    // the 9-token repeat
    val a = words("a", 5) ++ shared ++ words("b", 7) // repeat at tokens 5..13
    val b = words("c", 3) ++ shared ++ words("d", 2) // repeat at tokens 3..11
    val short = words("s", 4)                        // 4-token repeat < L
    val c = words("e", 6) ++ short ++ words("f", 6)
    val d = words("g", 2) ++ short ++ words("h", 8)
    val docs = Seq(
      (0L, a.mkString(" ")), (1L, b.mkString(" ")),
      (2L, c.mkString(" ")), (3L, d.mkString(" "))).toDF("doc_id", "text")
    val got = CorpusOps.repeatedSubstrings(docs, minLen = 5)
      .orderBy("doc_id", "start")
      .as[(Long, Long, Long)].collect().toSeq
    // exact span in BOTH docs — q64's length-5 segment grid would only
    // match grid-aligned slices, which these offsets (5 vs 3) never are
    assert(got == Seq((0L, 5L, 9L), (1L, 3L, 9L)),
      s"expected the 9-token repeat at its exact offsets, got $got")
    // the 4-token repeat stays invisible at minLen 5 (asserted by absence
    // of docs 2 and 3 above); an intra-doc repeat IS visible:
    val rep = (words("x", 6) ++ words("r", 7) ++ words("y", 4) ++
      words("r", 7)).mkString(" ")
    val intra = CorpusOps.repeatedSubstrings(
      Seq((9L, rep)).toDF("doc_id", "text"), minLen = 5)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(intra == Seq((9L, 6L, 7L), (9L, 17L, 7L)), s"intra-doc: $intra")
  }

  test("removeRepeatedSubstrings: first occurrence survives, interiors cut, short docs pass") {
    def words(prefix: String, n: Int) = (0 until n).map(i => s"$prefix$i")
    val span = words("dup", 15) // long repeat: interior exceeds boundary context
    val a = words("a", 4) ++ span ++ words("b", 3)   // first occurrence of span
    val b = words("c", 5) ++ span ++ words("d", 4)   // later occurrence
    val pure = span                                   // doc = span only -> empty
    val tiny = words("t", 3)                          // < minLen -> untouched
    val docs = Seq(
      (0L, a.mkString(" ")), (1L, b.mkString(" ")),
      (2L, pure.mkString(" ")), (3L, tiny.mkString(" "))).toDF("doc_id", "text")
    val got = CorpusOps.removeRepeatedSubstrings(docs, minLen = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_before", "n_after", "text_md5")
      .as[(Long, Long, Long, String)].collect().toSeq
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 0 holds the corpus-first occurrence of every duplicated window
    // (doc_id 0 < 1, 2) so it survives whole
    assert(got(0) == (0L, 22L, 22L, m(a.mkString(" "))), s"doc0: ${got(0)}")
    // doc 1: the span sits at tokens 5..19; windows straddling its edges
    // carry unique context and survive, protecting L-1 = 4 boundary tokens
    // each side; the 7-token interior (tokens 9..15) is cut
    val doc1Kept = (words("c", 5) ++ span.take(4) ++ span.takeRight(4) ++
      words("d", 4)).mkString(" ")
    assert(got(1) == (1L, 24L, 17L, m(doc1Kept)),
      s"doc1 must lose the repeat interior, keep L-1 context: ${got(1)}")
    // doc 2 IS the span — zero unique context -> rewrites empty
    assert(got(2) == (2L, 15L, 0L, m("")), s"doc2 must rewrite to empty: ${got(2)}")
    assert(got(3) == (3L, 3L, 3L, m(tiny.mkString(" "))), s"doc3: ${got(3)}")
    // a short repeat fully inside unique context is protected end-to-end
    val shortSpan = words("s", 6)
    val d2 = Seq((7L, (words("x", 4) ++ shortSpan ++ words("y", 4)).mkString(" ")),
      (8L, (words("z", 4) ++ shortSpan ++ words("w", 4)).mkString(" ")))
      .toDF("doc_id", "text")
    val kept = CorpusOps.removeRepeatedSubstrings(d2, minLen = 5)
      .select("n_before", "n_after").as[(Long, Long)].collect().toSeq
    assert(kept == Seq((14L, 14L), (14L, 14L)),
      s"6-token repeat < 2(L-1)+1 must be fully protected: $kept")
  }

  test("classifierScore: additive integer scores, bounded weights") {
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "alpha beta"),
      (3L, "alpha alpha"), (4L, "")).toDF("doc_id", "text")
    val m = TextAnalysis.classifierScore(docs)
      .select("doc_id", "n_tokens", "score", "decision")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // per-token weights live in [-128, 127]
    assert(m(0L)._3 >= -128 && m(0L)._3 <= 127)
    // a doc's score is the sum of its tokens' scores (exact integer fold)
    assert(m(2L)._3 === m(0L)._3 + m(1L)._3)
    assert(m(3L)._3 === 2 * m(0L)._3)
    // empty doc: zero tokens, zero score, kept
    assert(m(4L) === ((4L, 0L, 0L, "keep")))
    assert(m.values.forall(r => (r._4 == "keep") == (r._3 >= 0)))
  }

  test("buildMixture: budget bounds, determinism, zero-weight exclusion") {
    val rnd = new scala.util.Random(41)
    val docs = (0L until 400L).map { i =>
      val lang = Seq("en", "fr", "zz")(rnd.nextInt(3))
      (i, lang, Seq.fill(5 + rnd.nextInt(20))("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val weights = Map("en" -> 60, "fr" -> 40)
    val buckets = 8
    val budget = 1000L
    val out = CorpusOps.buildMixture(docs, weights, budget, buckets)
    val kept = out.filter(col("kept"))
      .groupBy("lang").agg(sum("n_tokens").as("toks"),
        countDistinct("bucket").as("nb"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // zero-weight languages are never selected
    assert(!kept.contains("zz"))
    // per-language tokens stay within share*buckets + one-doc-per-bucket
    // overshoot (each doc here is <= 24 tokens)
    for ((l, w) <- weights) {
      val perBucket = w * budget / (100L * buckets)
      val cap = perBucket * buckets + 24L * buckets
      assert(kept(l)._2 <= cap, s"$l kept ${kept(l)._2} tokens > cap $cap")
      assert(kept(l)._2 > 0, s"$l kept nothing")
    }
    // deterministic: a second run selects the identical doc set
    val ids1 = out.filter(col("kept")).select("doc_id").as[Long].collect().toSet
    val ids2 = CorpusOps.buildMixture(docs, weights, budget, buckets)
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    assert(ids1 === ids2)
    // partition-layout invariance (the determinism that matters on a cluster)
    val ids3 = CorpusOps.buildMixture(docs.repartition(7), weights, budget,
      buckets).filter(col("kept")).select("doc_id").as[Long].collect().toSet
    assert(ids1 === ids3)
  }

  test("filterByScoreQuantile keeps exactly the rows at/above the interpolated quantile") {
    // scores 10,20,...,100: percentile(. , 0.75) = 77.5 → kept = {80,90,100}
    val scored = (1L to 10L).map(i => (i, i * 10L)).toDF("doc_id", "score")
    val kept = TextAnalysis.filterByScoreQuantile(scored, 0.75)
    assert(kept.select("score").as[Long].collect().toSet === Set(80L, 90L, 100L))
    // threshold column rides along for downstream reporting
    assert(kept.select("threshold").distinct().as[Double].collect().toSeq === Seq(77.5))
    // degenerate: all-equal scores keep everything at any quantile
    val flat = (1L to 5L).map(i => (i, 7L)).toDF("doc_id", "score")
    assert(TextAnalysis.filterByScoreQuantile(flat, 0.9).count() === 5)
    // contract guard
    intercept[IllegalArgumentException] {
      TextAnalysis.filterByScoreQuantile(scored, 1.5)
    }
  }

  test("interleave: round-robin across sources until each is exhausted") {
    // a: 4 rows, b: 2 rows, c: 1 row → expected source sequence
    //   round 1: a b c, round 2: a b, rounds 3-4: a a
    val df = Seq(
      (0L, "a"), (1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"), (6L, "c")
    ).toDF("doc_id", "source")
    val got = CorpusOps.interleave(df, col("source"), col("doc_id"))
      .orderBy(col("pos"))
      .select(col("pos"), col("source"), col("doc_id"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got.map(_._1) == (0L until 7L), s"positions must be dense: $got")
    assert(got.map(_._2) == Seq("a", "b", "c", "a", "b", "a", "a"), got)
    // within each source, original order is preserved
    assert(got.filter(_._2 == "a").map(_._3) == Seq(0L, 1L, 2L, 3L))
  }

  test("interleave: repartitioning never changes any position") {
    val df = (0L until 200L).map(i => (i, s"s${i % 7}"))
      .toDF("doc_id", "source")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusOps.interleave(d, col("source"), col("doc_id"))
        .select(col("doc_id"), col("pos")).as[(Long, Long)].collect().toMap
    assert(run(df) == run(df.repartition(13)))
  }
}
