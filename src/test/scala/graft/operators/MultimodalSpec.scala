package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("binary payload preserves the exact source bytes") {
    val row = Multimodal.withBinaryPayload(docs)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("doc_id") === 0).collect()(0)
    val payload = row.getAs[Array[Byte]]("payload")
    assert(new String(payload, "UTF-8") == row.getAs[String]("text"))
  }

  test("feature extraction: declared schema, one feature row per doc, deterministic") {
    val features = Multimodal.extractFeatures(Multimodal.withBinaryPayload(docs))
    assert(features.schema == Multimodal.featureSchema)
    assert(features.count() == docs.count())
    val a = features.orderBy("doc_id").collect().map(_.toString)
    val b = Multimodal.extractFeatures(Multimodal.withBinaryPayload(docs))
      .orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
    // features consumed the real payload bytes: 8 dims, all finite, non-zero
    val f = features.filter(col("doc_id") === 0)
      .select("features").as[Seq[Double]].collect()(0)
    assert(f.length == 8 && f.forall(x => !x.isNaN && x > 0))
  }

  test("partition batching: extraction preserves partitioning without a shuffle") {
    val withPayload = Multimodal.withBinaryPayload(docs).repartition(7)
    val features = Multimodal.extractFeatures(withPayload)
    assert(features.rdd.getNumPartitions == 7)
  }
}
