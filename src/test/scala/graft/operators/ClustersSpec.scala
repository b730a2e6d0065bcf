package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the round-3 pipeline additions: connected components
  * (pairs → clusters), test-set decontamination, token-budget packing. */
class ClustersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteCC(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(_.toLong)
    def find(x: Long): Long =
      if (parent(x.toInt) == x) x
      else { val r = find(parent(x.toInt)); parent(x.toInt) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb).toInt) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i.toLong)).toMap
  }

  test("connectedComponents matches union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 300
      val edges = (0 until 150).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val want = bruteCC(n, edges)
      val got = Dedup.connectedComponents(
        edges.toDF("src", "dst"),
        (0 until n).map(_.toLong).toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial diverged")
    }
  }

  test("connectedComponents converges fast on a long chain") {
    // a 512-node path is the worst case for plain min-propagation
    // (O(diameter) rounds); pointer jumping must close it well inside the
    // iteration cap — and the labels must still be exact
    val n = 512
    val edges = (0L until n - 1L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Dedup.connectedComponents(edges, (0L until n.toLong).toDF("id"),
      maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("connectedComponents keeps isolated vertices as singletons") {
    val got = Dedup.connectedComponents(
      Seq((1L, 2L)).toDF("src", "dst"),
      Seq(1L, 2L, 9L).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
  }

  test("decontaminate flags exactly the docs sharing an n-gram with eval") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),  // shares "quick brown fox" trigram
      (2L, "totally unrelated words here"),
      (3L, "quick brown fox")             // short-but-matching
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, "a quick brown fox ran")).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(train, evalSet, shingleN = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L) == (1L, true))
    assert(got(2L) == (0L, false))
    assert(got(3L) == (1L, true))
  }

  test("stratifiedSample: per-stratum rates hold and selection is stable") {
    val docs = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val sampled = TextAnalysis.stratifiedSample(docs, "lang",
      Map("en" -> 0.1, "de" -> 0.5), defaultRate = 1.0, keyCol = "doc_id")
    val counts = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 per stratum; binomial 3-sigma bounds
    assert(counts("en") > 120 && counts("en") < 280, s"en rate off: $counts")
    assert(counts("de") > 880 && counts("de") < 1120, s"de rate off: $counts")
    // determinism: same call returns the same id set
    val again = TextAnalysis.stratifiedSample(docs, "lang",
      Map("en" -> 0.1, "de" -> 0.5), defaultRate = 1.0, keyCol = "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == sampled.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("repetitionMetrics computes exact ratios on known docs") {
    val docs = Seq(
      (1L, "a b a b a b"),        // bigrams: ab ba ab ba ab → top "a b"=3 of 5
      (2L, "x y z"),              // all distinct: top bigram 1 of 2
      (3L, "w")                   // single token: no bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionMetrics(docs)
      .select("doc_id", "n_tokens", "distinct_ratio", "top_bigram_count",
        "top_bigram_frac")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getInt(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got(1L) == (6L, 2.0 / 6, 3, Some(3.0 / 5)))
    assert(got(2L) == (3L, 1.0, 1, Some(1.0 / 2)))
    assert(got(3L) == (1L, 1.0, 0, None))
  }

  test("repetitionMetrics handles a 60k-token document in one task") {
    // the round-11 verdict's top plan defect: the old distinct×occurrence
    // mode scan was O(n²) per row — 60k tokens = 3.6e9 comparisons would
    // hang this task. The sorted run-length form is O(n log n): this
    // completes in seconds and the mode count stays exact.
    val n = 60000
    val rnd = new scala.util.Random(12)
    // vocabulary of 50 tokens; plant a known dominant bigram "hot spot"
    val toks = Array.tabulate(n)(i =>
      if (i % 10 < 4) (if (i % 2 == 0) "hot" else "spot")
      else s"w${rnd.nextInt(50)}")
    val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val row = TextAnalysis.repetitionMetrics(docs)
      .select("n_tokens", "top_bigram_count").head()
    assert(row.getLong(0) == n.toLong)
    // exact check against a driver-side bigram count
    val expect = toks.sliding(2).map(_.mkString(" "))
      .foldLeft(Map.empty[String, Int])((m, g) =>
        m.updated(g, m.getOrElse(g, 0) + 1)).values.max
    assert(row.getInt(1) == expect)
  }

  test("packByTokens: packs never exceed budget except single oversized docs") {
    val docs = Seq(
      (1L, Seq.fill(100)("w").mkString(" ")),
      (2L, Seq.fill(100)("w").mkString(" ")),
      (3L, Seq.fill(100)("w").mkString(" ")),  // 100+100 fits, +100 doesn't
      (4L, Seq.fill(300)("w").mkString(" ")),  // alone over budget: own pack
      (5L, Seq.fill(10)("w").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.packByTokens(docs, budgetTokens = 256L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._3).toSeq == Seq(0L, 0L, 1L, 2L, 3L),
      s"greedy boundaries wrong: ${got.toSeq}")
    // law: every pack over budget contains exactly one doc
    got.groupBy(_._3).foreach { case (p, ds) =>
      assert(ds.map(_._2).sum <= 256L || ds.length == 1, s"pack $p overfull")
    }
  }
}
