package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("top_k returns the k largest structs, largest first, exact vs sort") {
    // groups of different sizes; value = (score, label)
    val rows = for (g <- 0 until 6; i <- 0 to g * 7) yield
      (g, (i * 31 % 19).toLong, s"item_$i")
    val df = rows.toDF("g", "score", "label").repartition(8)
    val got = df.groupBy("g")
      .agg(TopKAgg.of(struct(col("score"), col("label")), 3).as("top"))
      .select(col("g"), col("top"))
      .as[(Int, Seq[(Long, String)])].collect().toMap
    val exact = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(v => (v._2, v._3)).sorted.reverse.take(3)
    }
    for ((g, expect) <- exact)
      assert(got(g) == expect, s"group $g: ${got(g)} != $expect")
  }

  test("duplicate structs survive up to k — rank()<=k multiset semantics") {
    // value 9 appears 4 times; top-3 must be three 9s, not one 9 + lower
    // values (the TreeSet formulation silently collapsed equal structs)
    val rows = Seq(9L, 9L, 9L, 9L, 7L, 5L).map(v => (1, v, "same"))
    val got = rows.toDF("g", "score", "label").repartition(4)
      .groupBy("g")
      .agg(TopKAgg.of(struct(col("score"), col("label")), 3).as("top"))
      .select(explode(col("top")).as("t")).select(col("t.score"))
      .as[Long].collect().toSeq
    assert(got == Seq(9L, 9L, 9L), s"duplicates must count toward k: $got")
    // and a group smaller than its duplicate multiplicity still returns k
    val few = Seq((1, 2L, "a"), (1, 2L, "a"))
    val n = few.toDF("g", "score", "label")
      .groupBy("g").agg(TopKAgg.of(struct(col("score"), col("label")), 5).as("top"))
      .select(size(col("top"))).as[Int].head()
    assert(n == 2, s"both duplicate rows must be returned, got $n")
  }

  test("partial buffers cap at k: a hot group never materializes its row set") {
    // one group with 200k rows; k=5 — completes with bounded buffers and
    // returns exactly the 5 largest
    val df = spark.range(200000)
      .select(lit(1).as("g"), col("id"), concat(lit("x"), col("id")).as("s"))
    val got = df.groupBy("g")
      .agg(TopKAgg.of(struct(col("id"), col("s")), 5).as("top"))
      .select(explode(col("top")).as("t")).select(col("t.id"))
      .as[Long].collect().toSeq
    assert(got == Seq(199999L, 199998L, 199997L, 199996L, 199995L))
  }

  test("result is invariant to input partitioning") {
    val rows = (0 until 1000).map(i => (i % 7, (i * 131) % 97, s"v$i"))
    def run(parts: Int) = rows.toDF("g", "score", "label").repartition(parts)
      .groupBy("g").agg(TopKAgg.of(struct(col("score"), col("label")), 4).as("top"))
      .select(col("g"), col("top")).as[(Int, Seq[(Int, String)])]
      .collect().toMap
    assert(run(1) == run(13))
  }
}
