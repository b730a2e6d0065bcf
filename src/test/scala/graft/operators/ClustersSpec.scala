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
