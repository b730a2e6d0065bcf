package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer laws (B102): Viterbi optimality of the native
  * encode against brute-force segmentation enumeration, OOV totality, and
  * the training contract — determinism, single-char coverage, vocab
  * bound, roundtrip identity, frequent-piece survival.
  */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 1L << 20

  /** Brute-force best (combined key) over ALL segmentations of `w`. */
  private def bruteBest(w: String, pieces: Map[String, Long],
      oov: Long): Long = {
    if (w.isEmpty) return 0L
    (1 to w.length).flatMap { l =>
      val p = w.substring(0, l)
      val s = pieces.get(p).orElse(if (l == 1) Some(oov) else None)
      s.map(sc => sc * M - 1 + bruteBest(w.substring(l), pieces, oov))
    }.maxOption.getOrElse(Long.MinValue)
  }

  private def encodeOne(w: String, pieces: Seq[(String, Long)], oov: Long)
      : (Seq[String], Long, Long) = {
    val row = Seq(Tuple1(w)).toDF("t")
      .select(graft.functions.UnigramExprs.unigramEncode(col("t"), pieces, oov)
        .as("e"))
      .select(col("e.toks"), col("e.n_pieces"), col("e.micro_logp"))
      .collect()(0)
    (row.getSeq[String](0), row.getLong(1), row.getLong(2))
  }

  test("Viterbi equals brute-force enumeration on every corpus-shaped word") {
    val pieces = UnigramLm.DemoPieces
    val pm = pieces.toMap
    val words = Seq("table", "row", "order", "customer", "window", "stream",
      "scan", "value", "a", "the", "query", "vector", "agg", "spark")
    words.foreach { w =>
      val (toks, nt, lp) = encodeOne(w, pieces, UnigramLm.DemoOov)
      assert(toks.mkString("") == w, s"$w: tokens must respell the word")
      val combined = lp * M - nt
      assert(combined == bruteBest(w, pm, UnigramLm.DemoOov),
        s"$w: ($nt, $lp) is not the optimum")
    }
    // the designed showcases: whole word beats sub-pieces; overlap resolves
    // to the higher-probability split
    assert(encodeOne("table", pieces, UnigramLm.DemoOov)._1 == Seq("table"))
    assert(encodeOne("row", pieces, UnigramLm.DemoOov)._1 == Seq("r", "ow"))
  }

  test("OOV totality: chars outside the table segment at the penalty score") {
    val tiny = Seq("ab" -> -1000000L)
    val (toks, nt, lp) = encodeOne("abzab", tiny, -5000000L)
    assert(toks == Seq("ab", "z", "ab"))
    assert(nt == 3L && lp == -7000000L)
  }

  test("multi-word input sums counts and log-probs across words") {
    val (toks, nt, lp) =
      encodeOne("table row", UnigramLm.DemoPieces, UnigramLm.DemoOov)
    assert(toks == Seq("table", "r", "ow"))
    val (_, nt1, lp1) = encodeOne("table", UnigramLm.DemoPieces, UnigramLm.DemoOov)
    val (_, nt2, lp2) = encodeOne("row", UnigramLm.DemoPieces, UnigramLm.DemoOov)
    assert(nt == nt1 + nt2 && lp == lp1 + lp2)
  }

  private lazy val corpus = {
    // skewed synthetic corpus: "hello" dominates, with supporting cast
    val docs = Seq.tabulate(60) { i =>
      val extra = Seq("world", "help", "low", "hollow")(i % 4)
      (i.toLong, s"hello $extra hello hell$i")
    }
    docs.toDF("doc_id", "text")
  }

  test("training: deterministic, covers every char, bounds multi vocab, all scores negative") {
    val m1 = UnigramLm.trainUnigram(corpus, vocabSize = 8, emIters = 2)
    val m2 = UnigramLm.trainUnigram(corpus, vocabSize = 8, emIters = 2)
    assert(m1 == m2, "training must be deterministic")
    assert(m1.forall(_._2 < 0), "all scores strictly negative micro-nats")
    val singles = m1.map(_._1).filter(_.length == 1).toSet
    val corpusChars = corpus.select(col("text")).as[String].collect()
      .flatMap(_.toLowerCase.replaceAll("[^a-z0-9 ]", "").replace(" ", ""))
      .toSet.map((c: Char) => c.toString)
    assert(corpusChars.subsetOf(singles),
      s"missing single-char coverage: ${corpusChars -- singles}")
    assert(m1.count(_._1.length > 1) <= 8, "multi-piece vocab bound")
  }

  test("training: roundtrip identity and frequent-piece survival") {
    val model = UnigramLm.trainUnigram(corpus, vocabSize = 8, emIters = 2)
    // the dominant word (length ≤ maxPieceLen) must survive pruning
    assert(model.exists(_._1 == "hello"),
      s"dominant word missing from ${model.filter(_._1.length > 1)}")
    // every distinct corpus word re-spells exactly under the trained model
    val words = corpus
      .select(explode(Tok.ws(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", ""))).as("w"))
      .distinct().as[String].collect()
    val enc = words.toSeq.toDF("t")
      .select(col("t"), graft.functions.UnigramExprs
        .unigramEncode(col("t"), model, UnigramLm.DemoOov).getField("toks")
        .as("toks"))
      .as[(String, Seq[String])].collect()
    enc.foreach { case (w, toks) =>
      assert(toks.mkString("") == w, s"$w re-spelled as $toks")
    }
  }
}
