package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the round-5 corpus-prep kernels, each checked against
  * a brute-force Scala reference on random inputs: context windows must tile
  * the token stream exactly as the (maxLen, stride) spec says, classifier
  * scores must be additive under document concatenation (the property that
  * makes a linear model linear), and BPE pair counts must equal naive
  * per-occurrence counting.
  */
object CorpusProperties extends Properties("CorpusKernels") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  // small alphabet so token/char collisions actually happen
  private val genToken: Gen[String] = Gen.choose(1, 3)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val genDoc: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, genToken).map(_.mkString(" ")))
  private val genCorpus: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, genDoc))

  property("contextWindows equals the brute-force (maxLen, stride) tiling") =
    forAll(genCorpus, Gen.choose(1, 6), Gen.choose(1, 6)) { (docs, a, b) =>
      import spark.implicits._
      val (stride, maxLen) = (math.min(a, b), math.max(a, b))
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.contextWindows(df, maxLen, stride)
        .select("doc_id", "window_idx", "start_tok", "n_tok", "window_text")
        .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
        .toSeq
      val expected = docs.zipWithIndex.flatMap { case (text, i) =>
        val t = text.split(" ").filter(_.nonEmpty)
        (0 until t.length by stride).zipWithIndex.map { case (start, idx) =>
          (i.toLong, idx.toLong, start.toLong,
            math.min(maxLen, t.length - start).toLong,
            t.slice(start, start + maxLen).mkString(" "))
        }
      }
      got == expected
    }

  property("classifierScore is additive under doc concatenation") =
    forAll(genDoc, genDoc) { (d1, d2) =>
      import spark.implicits._
      val df = Seq((0L, d1), (1L, d2), (2L, d1 + " " + d2))
        .toDF("doc_id", "text")
      val m = TextAnalysis.classifierScore(df)
        .select("doc_id", "n_tokens", "score")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      m(2L)._1 == m(0L)._1 + m(1L)._1 && m(2L)._2 == m(0L)._2 + m(1L)._2
    }

  property("bpePairCounts equals naive per-occurrence pair counting") =
    forAll(genCorpus) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // k larger than any possible pair-type count on the 3-char alphabet
      val got = TextAnalysis.bpePairCounts(df, k = 100)
        .as[(String, String, Long)].collect().toSeq
      val counts = docs.flatMap(_.split(" ").filter(_.nonEmpty))
        .flatMap(w => w.sliding(2).filter(_.length == 2))
        .groupBy(identity).map { case (p, occ) =>
          (p.substring(0, 1), p.substring(1, 2)) -> occ.size.toLong
        }
      val expected = counts.toSeq
        .map { case ((l, r), c) => (l, r, c) }
        .sortBy { case (l, r, c) => (-c, l, r) }
      got == expected
    }
}
