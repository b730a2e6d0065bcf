package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** BLEU / ROUGE against a direct per-doc clipped-n-gram recomputation. */
class TextEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toks(text: String): Vector[String] =
    text.split(" ").filter(_.nonEmpty).toVector
  private def ref(c: Vector[String]): Vector[String] =
    c.zipWithIndex.collect { case (t, i) if i % 7 != 6 => t }
  private def grams(t: Vector[String], n: Int): Map[Vector[String], Long] =
    t.sliding(n).filter(_.size == n).toSeq.groupBy(identity)
      .map { case (g, v) => g -> v.size.toLong }

  private val corpus = {
    val rnd = new scala.util.Random(47)
    val vocab = Vector("the", "cat", "sat", "on", "mat", "dog", "ran", "far")
    (1 to 60).map(i => (i.toLong,
      Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "), "en"))
  }

  private def clipped(n: Int): (Long, Long, Long) = {
    // (cand grams, ref grams, clipped matches) summed over docs
    corpus.map { case (_, text, _) =>
      val c = toks(text); val r = ref(c)
      val gc = grams(c, n); val gr = grams(r, n)
      (gc.values.sum, gr.values.sum,
        gc.map { case (g, k) => math.min(k, gr.getOrElse(g, 0L)) }.sum)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
  }

  private def d4(x: Double) = new java.math.BigDecimal(x)
    .setScale(4, java.math.RoundingMode.HALF_UP).toPlainString

  test("bleuCorpus matches the per-doc clipped recomputation") {
    val df = corpus.toDF("doc_id", "text", "lang")
    val got = TextEval.bleuCorpus(df).head()
    val ps = (1 to 4).map { n =>
      val (den, _, clip) = clipped(n); clip.toDouble / den }
    val cLen = corpus.map(c => toks(c._2).size.toLong).sum
    val rLen = corpus.map(c => ref(toks(c._2)).size.toLong).sum
    assert(got.getAs[Long]("c_len") == cLen)
    assert(got.getAs[Long]("r_len") == rLen)
    assert(got.getAs[String]("bp") == "1.0000") // candidate ⊃ reference
    (1 to 4).foreach(n =>
      assert(got.getAs[String](s"p$n") == d4(ps(n - 1)), s"p$n"))
    assert(got.getAs[String]("bleu4") ==
      d4(math.sqrt(math.sqrt(ps.product))))
  }

  test("rougeN matches recall/precision/F1 recomputation") {
    val df = corpus.toDF("doc_id", "text", "lang")
    val got = TextEval.rougeN(df).collect().sortBy(_.getAs[Int]("n"))
    for ((row, n) <- got.zip(Seq(1, 2))) {
      val (denC, denR, clip) = clipped(n)
      assert(row.getAs[Long]("cand_grams") == denC)
      assert(row.getAs[Long]("ref_grams") == denR)
      assert(row.getAs[Long]("matches") == clip)
      assert(row.getAs[String]("recall") == d4(clip.toDouble / denR))
      assert(row.getAs[String]("precision") == d4(clip.toDouble / denC))
      assert(row.getAs[String]("f1") == d4(2.0 * clip / (denR + denC)))
    }
  }

  test("chrF matches the char-gram recomputation; identity scores 1") {
    def charGrams(s: String, n: Int): Map[String, Long] =
      s.sliding(n).filter(_.length == n).toSeq.groupBy(identity)
        .map { case (g, v) => g -> v.size.toLong }
    val df = corpus.toDF("doc_id", "text", "lang")
    val got = TextEval.chrF(df).collect().sortBy(_.getAs[Int]("n"))
    assert(got.map(_.getAs[Int]("n")).toSeq == (1 to 6))
    for (row <- got) {
      val n = row.getAs[Int]("n")
      val (denC, denR, clip) = corpus.map { case (_, text, _) =>
        val cs = toks(text).mkString("")
        val rs = ref(toks(text)).mkString("")
        val gc = charGrams(cs, n); val gr = charGrams(rs, n)
        (gc.values.sum, gr.values.sum,
          gc.map { case (g, k) => math.min(k, gr.getOrElse(g, 0L)) }.sum)
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      assert(row.getAs[Long]("den_c") == denC, s"den_c at n=$n")
      assert(row.getAs[Long]("den_r") == denR, s"den_r at n=$n")
      assert(row.getAs[Long]("clip") == clip, s"clip at n=$n")
      val p = clip.toDouble / denC; val r = clip.toDouble / denR
      assert(row.getAs[Double]("chrf") == 5.0 * p * r / (4.0 * p + r))
    }
    // identical candidate/reference (short docs never drop a token):
    // P = R = chrF = 1 at every n the strings can support
    val same = Seq((1L, "abc def", "en")).toDF("doc_id", "text", "lang")
    TextEval.chrF(same).collect().foreach { row =>
      if (row.getAs[Long]("den_c") > 0)
        assert(row.getAs[Double]("chrf") == 1.0)
    }
  }
}
