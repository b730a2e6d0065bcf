package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 retrieval laws: hand-computed scores on a toy corpus, monotonicity
  * in tf, length normalization, and the shuffle-free plan shape. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toy = Seq(
    (0L, "cat dog cat"),        // tf(cat)=2, dl=3
    (1L, "cat fish"),           // tf(cat)=1, dl=2
    (2L, "dog dog dog dog"),    // tf(cat)=0, dl=4
    (3L, "cat cat cat cat cat cat cat cat") // tf=8, dl=8
  ).toDF("doc_id", "text")

  test("bm25: matches the closed-form Okapi formula on a toy corpus") {
    val got = Retrieval.bm25Scores(toy, Seq("cat"))
      .select(col("doc_id"), col("score")).as[(Long, Double)]
      .collect().toMap
    val n = 4.0; val df = 3.0
    val avgdl = (3 + 2 + 4 + 8) / 4.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def s(tf: Double, dl: Double): Double =
      idf * tf * (Retrieval.K1 + 1.0) /
        (tf + Retrieval.K1 * (1.0 - Retrieval.B + Retrieval.B * dl / avgdl))
    for ((id, tf, dl) <- Seq((0L, 2.0, 3.0), (1L, 1.0, 2.0),
        (2L, 0.0, 4.0), (3L, 8.0, 8.0)))
      assert(math.abs(got(id) - s(tf, dl)) < 1e-12,
        s"doc $id: got ${got(id)}, want ${s(tf, dl)}")
  }

  test("bm25: tf saturation — score grows with tf but sublinearly") {
    val docs = Seq((0L, "x"), (1L, "x x"), (2L, "x x x x x x x x"))
      .toDF("doc_id", "text")
    // equal dl via padding with a never-queried token keeps normalization flat
    val padded = docs.withColumn("text",
      concat(col("text"), lit(" pad" * 8)))
    val sc = Retrieval.bm25Scores(padded, Seq("x"))
      .select(col("doc_id"), col("score")).as[(Long, Double)]
      .collect().toMap
    assert(sc(0L) < sc(1L) && sc(1L) < sc(2L))
    // saturation: doubling tf 1→2 gains more than 2→8 gains per added hit
    assert((sc(1L) - sc(0L)) > (sc(2L) - sc(1L)) / 6)
  }

  test("bm25: longer docs with equal tf score lower (length normalization)") {
    val docs = Seq((0L, "q one two"), (1L, "q " + ("f " * 40).trim))
      .toDF("doc_id", "text")
    val sc = Retrieval.bm25Scores(docs, Seq("q"))
      .select(col("doc_id"), col("score")).as[(Long, Double)]
      .collect().toMap
    assert(sc(0L) > sc(1L))
  }

  test("bm25 plan: no wide shuffle of the corpus — only the scalar agg and top-k") {
    val docs = toy
    val plan = Retrieval.bm25TopK(docs, Seq("cat", "dog"), 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the stats row must arrive via broadcast, not a corpus-wide join shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats row should broadcast:\n$plan")
    // top-k compiles to TakeOrderedAndProject, not a global Sort+Limit
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
