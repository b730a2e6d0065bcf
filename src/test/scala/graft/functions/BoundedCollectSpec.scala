package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BoundedCollectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("groups under the limit collect exactly, above it cap at the limit") {
    // keys 0..9 with k+1 members each; limit 5
    val df = (0 until 10).flatMap(k => (0 to k).map(i => (k, i.toLong)))
      .toDF("k", "v")
      // many partitions so partial buffers really merge across tasks
      .repartition(8)
    val got = df.groupBy("k")
      .agg(BoundedCollect.of(col("v"), 5).as("vs"))
      .as[(Int, Seq[Long])].collect().toMap
    for (k <- 0 until 10) {
      if (k + 1 <= 5) assert(got(k).sorted == (0L to k.toLong),
        s"group $k must collect exactly")
      else assert(got(k).size == 5, s"group $k must cap at the limit")
    }
  }

  test("capped groups never materialize the hot key's full row set") {
    // one hot key with 100k rows: with limit 3 the result is 3 elements and
    // the job completes without any reducer building a 100k-element list
    val df = spark.range(100000).select(lit("hot").as("k"), col("id"))
      .unionByName(spark.range(4).select(lit("cold").as("k"), col("id")))
    val got = df.groupBy("k")
      .agg(BoundedCollect.of(col("id"), 3).as("vs"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("hot").size == 3)
    assert(got("cold").size == 3)
  }

  test("struct elements survive the partial-buffer shuffle serialization") {
    val df = (0 until 50).map(i => (i % 5, i.toLong, s"doc_$i"))
      .toDF("k", "id", "name").repartition(7)
    val got = df.groupBy("k")
      .agg(BoundedCollect.of(struct(col("id"), col("name")), 100).as("vs"))
      .select(col("k"), size(col("vs")).as("n"),
        // every element must round-trip intact: id and name stay paired
        forall(col("vs"), e => e.getField("name") === concat(lit("doc_"), e.getField("id")))
          .as("paired"))
      .as[(Int, Int, Boolean)].collect()
    assert(got.length == 5)
    got.foreach { case (k, n, paired) =>
      assert(n == 10, s"group $k collected $n of 10")
      assert(paired, s"group $k corrupted an element")
    }
  }

  test("null inputs are skipped, empty result is an empty array not null") {
    val df = Seq((1, Some(10L)), (1, None), (2, None))
      .toDF("k", "v")
    val got = df.groupBy("k")
      .agg(BoundedCollect.of(col("v"), 5).as("vs"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1) == Seq(10L))
    assert(got(2) == Seq.empty)
  }
}
