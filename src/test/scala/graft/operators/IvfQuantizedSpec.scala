package graft.operators

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The int8 quantized IVF tier: the index stores NO full-precision vectors
  * (that is the point — it must be ~8× smaller than the double corpus it
  * serves), search scores int8 candidates, and a full-precision re-rank
  * against the primary corpus restores exact final ordering. Recall parity
  * with the float index is asserted on the planted-copy contract: an exact
  * duplicate must come back rank 1 at cosine 1.0000 through BOTH paths.
  */
class IvfQuantizedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    .cache()

  private def planted() = {
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val aug = emb.unionByName(qs.select(
      (col("qid") + Dedup.PlantOffset).as("vec_id"), col("qv").as("v")))
    (aug, qs)
  }

  test("quantized index stores int8 + scale only — no full-precision column") {
    val centroids = AnnIvf.trainCentroids(emb, k = 8)
    val dir = Files.createTempDirectory("graft_ivfq").toString
    AnnIvf.writeIndexQuantized(emb, centroids, dir)
    val idx = spark.read.parquet(dir)
    assert(idx.columns.sorted.toSeq == Seq("cell", "qnorm", "qv8", "scale", "vec_id"))
    assert(idx.schema("qv8").dataType.asInstanceOf[
      org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.ByteType,
      "quantized vectors must be tinyint — that is the 8x size claim")
    // quantizer invariants: |q| <= 127, max component hits exactly ±127,
    // qnorm is the dequantized norm
    val bad = idx.select(explode(col("qv8")).as("q"))
      .filter(abs(col("q")) > 127).count()
    assert(bad == 0)
    val normErr = idx
      .withColumn("recomputed",
        sqrt(aggregate(transform(col("qv8"), x => x.cast("double") * x),
          lit(0.0), (a, x) => a + x)) * col("scale"))
      .select(max(abs(col("recomputed") - col("qnorm")))).head().getDouble(0)
    assert(normErr < 1e-9, s"stored qnorm drifts from the vectors: $normErr")
  }

  test("recall parity with the float index: planted copy rank-1 at 1.0000") {
    val (aug, qs) = planted()
    val centroids = AnnIvf.trainCentroids(aug, k = 16)
    val fdir = Files.createTempDirectory("graft_ivqf").toString
    val qdir = Files.createTempDirectory("graft_ivqq").toString
    AnnIvf.writeIndex(aug, centroids, fdir)
    AnnIvf.writeIndexQuantized(aug, centroids, qdir)
    val float = AnnIvf.topKIndexed(spark, fdir, qs, 5, centroids, nprobe = 3)
      .filter(col("rank") === 1)
      .select(col("qid"), round(col("cos"), 4).as("cos"))
      .orderBy("qid").collect().toSeq
    val quant = AnnIvf.topKQuantized(spark, qdir, qs, aug, 5, centroids, nprobe = 3)
      .filter(col("rank") === 1)
      .select(col("qid"), round(col("cos"), 4).as("cos"))
      .orderBy("qid").collect().toSeq
    assert(float.size == 5 && quant.size == 5)
    float.zip(quant).foreach { case (f, q) =>
      assert(f.getDouble(1) == 1.0 && q.getDouble(1) == 1.0,
        s"rank-1 must be the planted copy at cosine 1.0000: float=$f quant=$q")
    }
  }

  test("full top-k agrees between float and quantized paths on this corpus") {
    // stronger than the gate: at 64 dims / this corpus the int8 cut with
    // rerank headroom preserves the entire exact top-5, not just rank 1
    val (aug, qs) = planted()
    val centroids = AnnIvf.trainCentroids(aug, k = 16)
    val fdir = Files.createTempDirectory("graft_ivqf2").toString
    val qdir = Files.createTempDirectory("graft_ivqq2").toString
    AnnIvf.writeIndex(aug, centroids, fdir)
    AnnIvf.writeIndexQuantized(aug, centroids, qdir)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("qid"), col("rank"), col("neighbor"), round(col("cos"), 4))
      .orderBy("qid", "rank").collect().map(_.toString).toSeq
    val float = rows(AnnIvf.topKIndexed(spark, fdir, qs, 5, centroids, nprobe = 3))
    val quant = rows(AnnIvf.topKQuantized(spark, qdir, qs, aug, 5, centroids, nprobe = 3))
    assert(quant == float)
  }

  test("quantized search prunes the index scan to the probed cells") {
    val (aug, qs) = planted()
    val centroids = AnnIvf.trainCentroids(aug, k = 16)
    val dir = Files.createTempDirectory("graft_ivqp").toString
    AnnIvf.writeIndexQuantized(aug, centroids, dir)
    val res = AnnIvf.topKQuantized(spark, dir, qs, aug, 5, centroids, nprobe = 3)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell#"))
      .getOrElse("")
    assert(scanLine.matches(".*PartitionFilters: \\[[^\\]]*cell#.*"),
      s"probe cells not pushed as partition filter:\n$scanLine")
  }

  test("indexed decontamination == broadcast decontamination on planted copies (sf0.01)") {
    // the big-eval scale path must agree with the broadcast path where the
    // probe contract guarantees reachability: exact copies assign to the
    // eval vector's own nearest cell. sf0.01 corpus, 25 planted copies at
    // tau=0.98 (organic pairs top out near 0.49 — the q94 gate geometry).
    val e01 = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val evalSet = e01.filter(col("vec_id") < 25)
      .select(col("vec_id").as("eid"), col("v").as("ev"))
    val corpus = e01.filter(col("vec_id") >= 25)
      .unionByName(evalSet.select(
        (col("eid") + Dedup.PlantOffset).as("vec_id"), col("ev").as("v")))
      .cache()
    try {
      val centroids = AnnIvf.trainCentroids(corpus, k = 16)
      val dir = Files.createTempDirectory("graft_decontam_idx").toString
      AnnIvf.writeIndexQuantized(corpus, centroids, dir)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select(col("vec_id"), col("n_eval_hits"), round(col("max_cos"), 4))
        .orderBy("vec_id").collect().map(_.toString).toSeq
      val viaBroadcast = rows(
        Similarity.semanticDecontaminate(corpus, evalSet, tau = 0.98))
      val viaIndexDf = Similarity.semanticDecontaminateIndexed(
        spark, dir, corpus, evalSet, tau = 0.98, centroids)
      val viaIndex = rows(viaIndexDf)
      assert(viaBroadcast.size == 25,
        s"gate geometry broken: expected exactly the 25 plants, got ${viaBroadcast.size}")
      assert(viaIndex == viaBroadcast)
      // and the index scan is partition-pruned to the probed cells — the
      // property that makes this the big-eval path (same assertion shape
      // as the quantized-search pruning test)
      val plan = viaIndexDf.queryExecution.executedPlan.toString
      val scanLine = plan.linesIterator
        .find(l => l.contains("PartitionFilters") && l.contains("cell#"))
        .getOrElse("")
      assert(scanLine.matches(".*PartitionFilters: \\[[^\\]]*cell#.*"),
        s"probe cells not pushed as partition filter:\n$scanLine")
    } finally corpus.unpersist()
  }

  test("zero vectors quantize to zeros at scale 0 and never poison ranks") {
    val zero = spark.range(1).select(
      lit(9999).as("vec_id"),
      typedLit(Seq.fill(64)(0.0)).as("v"))
    val aug = emb.unionByName(zero)
    val centroids = AnnIvf.trainCentroids(emb, k = 4)
    val dir = Files.createTempDirectory("graft_ivqz").toString
    AnnIvf.writeIndexQuantized(aug, centroids, dir)
    val z = spark.read.parquet(dir).filter(col("vec_id") === 9999).head()
    assert(z.getAs[Seq[Byte]]("qv8").forall(_ == 0))
    assert(z.getAs[Double]("scale") == 0.0 && z.getAs[Double]("qnorm") == 0.0)
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val res = AnnIvf.topKQuantized(spark, dir, qs, aug, 5, centroids)
    // the zero vector must never appear as a neighbor (it has no direction)
    assert(res.filter(col("neighbor") === 9999).count() == 0)
    assert(res.count() == 15)
  }
}
