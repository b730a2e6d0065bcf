package graft.operators

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ tier: the index stores m code BYTES + a norm per vector (the
  * ~64× compression claim, structurally), encoding is deterministic and
  * identical for identical vectors, and the search path keeps the planted
  * exact-copy contract through the asymmetric-distance cut + exact
  * re-rank. */
class AnnPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    .cache()

  test("local k-means: k centroids, deterministic, partition-independent sample") {
    val pts = Array.tabulate(100)(i => Array(i.toDouble % 7, (i * 3).toDouble % 11))
    val a = AnnPq.kmeansLocal(pts, 4, 10, seed = 1L)
    val b = AnnPq.kmeansLocal(pts, 4, 10, seed = 1L)
    assert(a.length == 4 && a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // codebook training over the frame is repartition-invariant (seeded
    // hash-order sample, not partition order)
    val cb1 = AnnPq.trainCodebooks(emb.repartition(1), m = 8, ksub = 8)
    val cb13 = AnnPq.trainCodebooks(emb.repartition(13), m = 8, ksub = 8)
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq == cb13.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("PQ index stores m code bytes + norm only; identical vectors encode identically") {
    val centroids = AnnIvf.trainCentroids(emb, k = 8)
    val codebooks = AnnPq.trainCodebooks(emb, m = 8, ksub = 16)
    val aug = emb.unionByName(emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + Dedup.PlantOffset).as("vec_id"), col("v")))
    val dir = Files.createTempDirectory("graft_pq").toString
    AnnPq.writeIndex(aug, centroids, codebooks, dir)
    val idx = spark.read.parquet(dir)
    assert(idx.columns.sorted.toSeq == Seq("cell", "codes", "vec_id", "vnorm"))
    assert(idx.schema("codes").dataType.asInstanceOf[
      org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.ByteType)
    assert(idx.select(size(col("codes"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(8),
      "every vector carries exactly m = 8 code bytes")
    // a planted exact copy has byte-identical codes and the same cell
    val byId = idx.select(col("vec_id"), col("codes"), col("cell"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Byte](1), r.getInt(2)))).toMap
    for (i <- 0L until 5L)
      assert(byId(i) == byId(i + Dedup.PlantOffset),
        s"plant of $i drifted: ${byId(i)} vs ${byId(i + Dedup.PlantOffset)}")
  }

  test("asymmetric search: planted copies rank 1 at cosine 1.0000, scan pruned") {
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val aug = emb.unionByName(
      qs.select((col("qid") + Dedup.PlantOffset).as("vec_id"), col("qv").as("v")))
    val centroids = AnnIvf.trainCentroids(aug, k = 16)
    val codebooks = AnnPq.trainCodebooks(aug, m = 8, ksub = 16)
    val dir = Files.createTempDirectory("graft_pq2").toString
    AnnPq.writeIndex(aug, centroids, codebooks, dir)
    val res = AnnPq.topK(spark, dir, qs, aug, 5, centroids, codebooks, nprobe = 3)
    res.collect()
    val top1 = res.filter(col("rank") === 1)
      .select(col("qid"), round(col("cos"), 4).as("cos"))
      .orderBy("qid").collect().toSeq
    assert(top1.size == 5 && top1.forall(_.getDouble(1) == 1.0),
      s"planted copy must survive the PQ cut and re-rank to 1.0000: $top1")
    assert(res.groupBy(col("qid")).count().filter(col("count") =!= 5).count() == 0)
    val plan = res.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell#"))
      .getOrElse("")
    assert(scanLine.matches(".*PartitionFilters: \\[[^\\]]*cell#.*"),
      s"probe cells not pushed as partition filter:\n$scanLine")
  }

  test("PQ guards: dimension mismatch errors; zero vectors never poison ranks") {
    val codebooks = AnnPq.trainCodebooks(emb, m = 8, ksub = 8)
    val bad = intercept[Exception] {
      spark.range(1).select(graft.functions.VectorExprs.pqEncode(
        org.apache.spark.sql.functions.typedLit(Seq.fill(32)(1.0)), codebooks)).collect()
    }
    assert(bad.getMessage.contains("pq_encode"), s"got: ${bad.getMessage}")
    // zero vector: codes point at whatever centroids are nearest 0, but the
    // search guard keeps it out of real rankings via rnorm/qn checks
    val zero = spark.range(1).select(lit(8888L).as("vec_id"),
      typedLit(Seq.fill(64)(0.0)).as("v"))
    val centroids = AnnIvf.trainCentroids(emb, k = 4)
    val aug = emb.unionByName(zero)
    val dir = Files.createTempDirectory("graft_pqz").toString
    AnnPq.writeIndex(aug, centroids, codebooks, dir)
    val z = spark.read.parquet(dir).filter(col("vec_id") === 8888).head()
    assert(z.getAs[Double]("vnorm") == 0.0,
      "the stored norm must be the ORIGINAL vector's (0 for a zero vector)")
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val res = AnnPq.topK(spark, dir, qs, aug, 5, centroids, codebooks)
    assert(res.filter(col("cos").isNaN).count() == 0, "NaN cosine leaked")
    assert(res.filter(col("neighbor") === 8888).count() == 0,
      "a zero vector has no direction and must rank below every real candidate")
    assert(res.count() == 15)
  }
}
