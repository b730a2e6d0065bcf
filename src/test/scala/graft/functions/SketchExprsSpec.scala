package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom filter has zero false negatives across a multi-partition build") {
    // 5k inserted values, built across 8 partitions so partial bitsets
    // really merge through the shuffle (bitwise OR of serialized buffers)
    val inserted = spark.range(5000).select(xxhash64(col("id")).as("h"))
      .repartition(8)
    val bloom = inserted.agg(BloomFilterAgg.of(col("h"), 1 << 18, 5).as("bloom"))
    val probed = spark.range(5000)
      .select(xxhash64(col("id")).as("h"))
      .crossJoin(broadcast(bloom))
      .select(BloomMightContain.of(col("bloom"), col("h"), 5).as("hit"))
      .as[Boolean].collect()
    assert(probed.forall(identity), "every inserted value must probe true")
  }

  test("bloom filter false-positive rate is small for a sized filter") {
    // 5k inserted, 2^18 bits, k=5 -> theoretical fp ~3e-6; probe 20k
    // disjoint values and allow a generous 0.5% observed bound
    val inserted = spark.range(5000).select(xxhash64(col("id")).as("h"))
    val bloom = inserted.agg(BloomFilterAgg.of(col("h"), 1 << 18, 5).as("bloom"))
    val fp = spark.range(1000000, 1020000)
      .select(xxhash64(col("id")).as("h"))
      .crossJoin(broadcast(bloom))
      .filter(BloomMightContain.of(col("bloom"), col("h"), 5))
      .count()
    assert(fp <= 100, s"fp count $fp out of 20000 probes is too high")
  }

  test("bloom result is invariant to input partitioning") {
    val data = spark.range(2000).select(xxhash64(col("id")).as("h"))
    def build(parts: Int) = data.repartition(parts)
      .agg(BloomFilterAgg.of(col("h"), 1 << 16, 4).as("b"))
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(build(1), build(7)),
      "bitset must not depend on how the input was partitioned")
  }

  test("count-min sketch never underestimates and bounds overestimates") {
    // zipf-ish stream: value v appears 1000/(v+1) times, v in 0..99
    val rows = (0 until 100).flatMap(v => Seq.fill(1000 / (v + 1))(v.toLong))
    val df = rows.toDF("v").repartition(8).select(xxhash64(col("v")).as("h"), col("v"))
    val cms = df.agg(CountMinSketchAgg.of(col("h"), 5, 4096).as("cms"))
    val exact = rows.groupBy(identity).map { case (v, vs) => (v, vs.size.toLong) }
    val est = df.select(col("v")).distinct()
      .crossJoin(broadcast(cms))
      .select(col("v"), CmsEstimate.of(col("cms"), xxhash64(col("v")), 4096).as("est"))
      .as[(Long, Long)].collect().toMap
    val total = rows.size
    for ((v, cnt) <- exact) {
      assert(est(v) >= cnt, s"CMS underestimated $v: ${est(v)} < $cnt")
      assert(est(v) <= cnt + total / 50,
        s"CMS overestimate for $v out of bound: ${est(v)} vs $cnt")
    }
  }

  test("count-min grids merge by element-wise add across partitionings") {
    val data = spark.range(3000).select(xxhash64(col("id") % 37).as("h"))
    def build(parts: Int) = data.repartition(parts)
      .agg(CountMinSketchAgg.of(col("h"), 3, 512).as("c"))
      .as[Seq[Long]].head()
    val a = build(1); val b = build(9)
    assert(a == b, "grid must not depend on input partitioning")
    // counters start after the 3-element (magic, depth, width) header
    assert(a.drop(SketchHash.CmsHeaderLen).sum == 3000L * 3,
      "each row of the grid accounts every input once")
    assert(a.take(3) == Seq(SketchHash.CmsMagic, 3L, 512L), "header describes the build")
  }

  test("null hashes are ignored, empty input yields an empty sketch") {
    val df = Seq[Option[Long]](None, None).toDF("h")
      .select(col("h").cast("long").as("h"))
    val bloomBytes = df.agg(BloomFilterAgg.of(col("h"), 1 << 10, 3).as("b"))
      .as[Array[Byte]].head()
    assert(bloomBytes.drop(8).forall(_ == 0), "no bits set for all-null input")
    assert(SketchHash.bloomNumHashes(bloomBytes) == 3, "header carries k")
    val grid = df.agg(CountMinSketchAgg.of(col("h"), 2, 64).as("c"))
      .as[Seq[Long]].head()
    assert(grid.drop(SketchHash.CmsHeaderLen).forall(_ == 0L))
  }

  test("probe parameters that disagree with the sketch header error clearly") {
    val bloom = spark.range(10).select(xxhash64(col("id")).as("h"))
      .agg(BloomFilterAgg.of(col("h"), 1 << 10, 3).as("b"))
    val eb = intercept[Exception] {
      bloom.select(BloomMightContain.of(col("b"), lit(42L), 5)).collect()
    }
    assert(eb.getMessage.contains("does not match"), s"got: ${eb.getMessage}")
    val cms = spark.range(10).select(xxhash64(col("id")).as("h"))
      .agg(CountMinSketchAgg.of(col("h"), 3, 256).as("c"))
    val ec = intercept[Exception] {
      cms.select(CmsEstimate.of(col("c"), lit(42L), 512)).collect()
    }
    assert(ec.getMessage.contains("does not match"), s"got: ${ec.getMessage}")
    // a non-sketch binary is rejected by the magic check, not misread
    val junk = spark.range(1).select(lit(Array.fill[Byte](16)(1)).as("b"))
    val ej = intercept[Exception] {
      junk.select(BloomMightContain.of(col("b"), lit(42L), 3)).collect()
    }
    assert(ej.getMessage.contains("not a graft Bloom"), s"got: ${ej.getMessage}")
  }
}
