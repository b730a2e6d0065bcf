package graft.chunk

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chunking laws (SURVEY.md §5.2 #2): for random streams and chunk params —
  * concatenation of chunks preserves input order; every chunk respects its
  * bound; byte budgets are never exceeded; numbering is dense from
  * lastChunk+1; no empty chunks.
  */
class ChunkingLawsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("count chunking: order preserved, bounds respected, dense numbering") {
    for (_ <- 1 to 5) {
      val n = 1 + rnd.nextInt(4000)
      val rows = 1 + rnd.nextInt(2000)
      val df = (0 until rows).map(i => (i.toLong, s"payload_$i")).toDF("id", "payload")
      val chunked = ChunkAssigner.assignByCount(df, Seq(col("id")), n)
        .select("id", "rn", "chunk_number")
        .collect().sortBy(_.getLong(1))

      // concatenation preserves input (id) order
      assert(chunked.map(_.getLong(0)).toSeq == (0L until rows.toLong))
      // chunk sizes: all == n except possibly the last
      val sizes = chunked.groupBy(_.getLong(2)).view.mapValues(_.length).toMap
      val maxChunk = sizes.keys.max
      sizes.foreach { case (c, sz) =>
        if (c < maxChunk) assert(sz == n, s"chunk $c has $sz != $n")
        else assert(sz >= 1 && sz <= n)
      }
      // dense numbering from 0
      assert(sizes.keys.toSeq.sorted == (0L to maxChunk))
    }
  }

  test("count chunking resumes numbering from lastChunk+1") {
    val df = (0 until 25).map(i => Tuple1(i.toLong)).toDF("id")
    val chunked = ChunkAssigner.assignByCount(df, Seq(col("id")), 10, lastChunk = 4)
      .select("chunk_number").distinct().as[Long].collect().sorted
    assert(chunked.toSeq == Seq(5L, 6L, 7L))
  }

  test("count chunking rejects out-of-bounds sizes") {
    val df = Seq(Tuple1(1L)).toDF("id")
    intercept[IllegalArgumentException] {
      ChunkAssigner.assignByCount(df, Seq(col("id")), 0)
    }
    intercept[IllegalArgumentException] {
      ChunkAssigner.assignByCount(df, Seq(col("id")), 4001)
    }
  }

  test("byte chunking: budget never exceeded, order preserved, greedy packing") {
    for (_ <- 1 to 3) {
      val rows = 1 + rnd.nextInt(500)
      val data = (0 until rows).map(i => (i.toLong, 1L + rnd.nextInt(100)))
      val df = data.toDF("id", "sz")
      val budget = 150L
      val out = ChunkAssigner.assignByBytes(df, Seq(col("id")), budget, col("sz"))
        .select("id", "sz", "chunk_number").collect().sortBy(_.getLong(0))

      // order preserved
      assert(out.map(_.getLong(0)).toSeq == (0L until rows.toLong))
      // per-chunk sums never exceed the budget (unless a single record does)
      out.groupBy(_.getLong(2)).foreach { case (c, rs) =>
        val total = rs.map(_.getLong(1)).sum
        assert(total <= budget || rs.length == 1, s"chunk $c overflows: $total")
      }
      // greedy reference fold reproduces the exact assignment
      var chunk = 0L; var bytes = 0L; var started = false
      val expected = data.map { case (_, sz) =>
        if (started && bytes + sz > budget) { chunk += 1; bytes = 0 }
        started = true; bytes += sz; chunk
      }
      assert(out.map(_.getLong(2)).toSeq == expected)
    }
  }

  test("byte chunking: payloads never cross a single-partition exchange") {
    // the greedy fold may only see (rn, size) pairs; the returned frame —
    // the one carrying record payloads — must stay distributed end to end
    val df = (0 until 500).map(i => (i.toLong, "payload_" * 8 + i)).toDF("id", "payload")
    val out = ChunkAssigner.assignByBytes(df, Seq(col("id")), 400L,
      octet_length(col("payload")).cast("long"))
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), s"payload single-partition funnel:\n$p")
    assert(out.rdd.getNumPartitions > 1, "payloads collapsed to one partition")
    assert(out.columns.toSeq == Seq("id", "payload", "chunk_number"))
  }

  test("no empty chunks under either strategy") {
    val df = (0 until 101).map(i => Tuple1(i.toLong)).toDF("id")
    val counts = ChunkAssigner.assignByCount(df, Seq(col("id")), 25)
      .groupBy("chunk_number").count().as[(Long, Long)].collect()
    assert(counts.forall(_._2 > 0))
  }

  test("withPrefixSum == the window cumsum, with no single-partition stage") {
    // sizes chosen adversarially: zeros, ones, large values, shuffled input
    val rnd = new scala.util.Random(17)
    val rows = rnd.shuffle((0 until 2000).map(i =>
      (i.toLong, rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => 1L
        case _ => rnd.nextInt(1000).toLong
      })).toList)
    val df = rows.toDF("id", "n")
    val got = ChunkAssigner.withPrefixSum(df, Seq(col("id")), col("n"))
      .select("id", "tok_off").as[(Long, Long)].collect().toMap
    // oracle: the (correct but single-task) unpartitioned window
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expect = df.withColumn("off", coalesce(sum(col("n")).over(w), lit(0L)))
      .select("id", "off").as[(Long, Long)].collect().toMap
    assert(got == expect)
    // and the distributed scan never funnels the payload to one partition
    val out = ChunkAssigner.withPrefixSum(df, Seq(col("id")), col("n"))
    out.collect()
    assert(out.rdd.getNumPartitions > 1,
      "prefix sum collapsed the frame to one partition")
  }
}
