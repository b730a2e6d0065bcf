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

  /** Encode a BufferedImage as real PNG bytes. */
  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG payloads decode through ImageIO: true dims + pixel statistics") {
    val red = png(10, 6)((_, _) => 0xFF0000) // solid red
    val halves = png(4, 4)((x, _) => if (x < 2) 0x000000 else 0xFFFFFF) // black|white
    val rows = Seq((1L, red), (2L, halves), (3L, "not an image".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("fake/utf8").as("format"),
        octet_length(col("payload")).as("n_bytes"),
        lit(0).as("width"), lit(0).as("height")))
    val out = Multimodal.extractFeatures(df).orderBy("doc_id").collect()

    val r1 = out(0)
    assert(r1.getString(1) == "image/png")
    assert(r1.getInt(3) == 10 && r1.getInt(4) == 6) // dims from the image
    val f1 = r1.getSeq[Double](5)
    assert(math.abs(f1(0) - 1.0) < 1e-9 && f1(1) == 0.0 && f1(2) == 0.0) // mean RGB
    assert(math.abs(f1(3) - 0.299) < 1e-9) // mean luma of pure red
    assert(f1(5) == 1.0) // all pixels in luma bin [0.25, 0.5)

    val f2 = out(1).getSeq[Double](5)
    assert(math.abs(f2(0) - 0.5) < 1e-9 && math.abs(f2(3) - 0.5) < 1e-9)
    assert(f2(4) == 0.5 && f2(7) == 0.5) // half black (bin 0), half white (bin 3)

    val r3 = out(2) // non-image: fallback + metadata passthrough
    assert(r3.getString(1) == "fake/utf8")
    assert(r3.getInt(3) == 0 && r3.getInt(4) == 0)
    assert(r3.getSeq[Double](5).sum > 0)
  }

  test("decodeImage is total: garbage bytes and truncated PNGs fall back") {
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)).isEmpty)
    val truncated = png(8, 8)((_, _) => 0x123456).take(20)
    assert(Multimodal.decodeImage(truncated).isEmpty)
  }
}
