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

  test("resize caps the longest side, preserves aspect, passes non-images through") {
    val wide = png(200, 50)((_, _) => 0x00FF00)
    val rows = Seq((1L, wide), (2L, "plain text".getBytes("UTF-8")))
    val out = Multimodal.resizeImages(rows.toDF("doc_id", "payload"), maxDim = 100)
      .orderBy("doc_id").collect()
    assert(out(0).getInt(2) == 100 && out(0).getInt(3) == 25) // 200x50 -> 100x25
    // resized bytes are a real PNG with the same content statistics
    val stats = Multimodal.decodeImage(out(0).getAs[Array[Byte]](1)).get
    assert(stats._1 == "image/png" && math.abs(stats._4(1) - 1.0) < 1e-6)
    // the text payload is byte-identical, dims 0 (not decodable)
    assert(out(1).getAs[Array[Byte]](1).sameElements("plain text".getBytes("UTF-8")))
    assert(out(1).getInt(2) == 0)
    // already-small images are not re-encoded, and dims come from the decode
    val small = png(10, 10)((_, _) => 0xFF0000)
    val (bytes, w, h) = Multimodal.resizePayload(small, 100)
    assert(bytes.sameElements(small) && w == 10 && h == 10)
  }

  /** Animated GIF with `frames` solid-color frames. */
  private def animatedGif(frames: Seq[Int], w: Int = 6, h: Int = 4): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { color =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  test("frame sampling decodes every k-th frame of an animated GIF") {
    val gif = animatedGif(Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF, 0x000000))
    val still = png(8, 8)((_, _) => 0xFF0000)
    val df = Seq((1L, gif), (2L, still), (3L, Array[Byte](9, 9, 9)))
      .toDF("doc_id", "payload")
    val out = Multimodal.sampleFrames(df, everyK = 2)
      .orderBy("doc_id", "frame_idx").collect()
    // gif: frames 0, 2, 4 sampled; still: frame 0; garbage: nothing
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (1L, 2), (1L, 4), (2L, 0)))
    assert(out.forall(r => r.getInt(2) > 0 && r.getInt(3) > 0))
    // frame 0 is red, frame 2 is blue (GIF palettes may quantize, so assert
    // the dominant channel rather than exact values)
    val f0 = out(0).getSeq[Double](4)
    val f2 = out(1).getSeq[Double](4)
    assert(f0(0) > 0.9 && f0(2) < 0.1, s"frame 0 not red: $f0")
    assert(f2(2) > 0.9 && f2(0) < 0.1, s"frame 2 not blue: $f2")
  }

  test("decodeImage is total: garbage bytes and truncated PNGs fall back") {
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)).isEmpty)
    val truncated = png(8, 8)((_, _) => 0x123456).take(20)
    assert(Multimodal.decodeImage(truncated).isEmpty)
  }

  test("WavCodec round-trips PCM16 and survives extra metadata chunks") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val wav = WavCodec.encode(samples, 44100)
    val Some((rate, back)) = WavCodec.decode(wav)
    assert(rate == 44100 && back.sameElements(samples))

    // real-world WAVs carry LIST/fact chunks before data — splice one in
    // (odd-sized, to exercise the even-padding rule)
    val buf = java.nio.ByteBuffer.allocate(wav.length + 8 + 5 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(wav, 0, 36)                       // RIFF header + fmt chunk
    buf.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put("INFOx".getBytes("US-ASCII")).put(0.toByte) // 5 bytes + pad
    buf.put(wav, 36, wav.length - 36)         // data chunk
    val Some((rate2, back2)) = WavCodec.decode(buf.array())
    assert(rate2 == 44100 && back2.sameElements(samples))

    // rejects: garbage, stereo-flag forgeries, truncated data, null
    assert(WavCodec.decode("not a wav at all".getBytes).isEmpty)
    val stereo = wav.clone(); stereo(22) = 2  // channels = 2
    assert(WavCodec.decode(stereo).isEmpty)
    assert(WavCodec.decode(wav.take(40)).isEmpty)
    assert(WavCodec.decode(null).isEmpty)

    // a trailing odd-size chunk with its pad byte omitted must yield None,
    // not an out-of-bounds position() throw
    val odd = java.nio.ByteBuffer.allocate(12 + 8 + 5)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    odd.put(wav, 0, 12)  // RIFF/WAVE header
    odd.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put("INFOx".getBytes("US-ASCII"))  // 5 bytes, no pad — EOF
    assert(WavCodec.decode(odd.array()).isEmpty)
  }

  test("audioFeatures computes exact stats from decoded samples") {
    import spark.implicits._
    val wav = WavCodec.encode(Array[Short](300, -400, 0, 500), 8000)
    val df = Seq((7L, wav), (8L, "junk".getBytes)).toDF("doc_id", "payload")
    val rows = Multimodal.audioFeatures(df).collect()
    assert(rows.length == 1) // non-WAV payloads drop
    val r = rows(0)
    assert(r.getLong(0) == 7L && r.getInt(1) == 8000 && r.getLong(2) == 4L)
    assert(r.getLong(3) == 500L && r.getLong(4) == 1200L)
    assert(math.abs(r.getDouble(5) - math.sqrt((300.0 * 300 + 400 * 400 + 0 + 500.0 * 500) / 4)) < 1e-9)
  }

  test("dHash63: identical texts collide, a different corpus does not; 63 bits only") {
    import spark.implicits._
    val base = "The quick brown fox jumps over the lazy dog repeatedly today."
    val other = "Entirely unrelated content with different letter distribution!!"
    val hashes = Multimodal.dHash63(Seq(
        (1L, base), (2L, base), (3L, other))
      .toDF("doc_id", "text"))
      .select(col("doc_id"), col("phash")).as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(2L))
    assert(hashes(1L) != hashes(3L))
    hashes.values.foreach(h => assert(h >= 0L, s"sign bit must stay clear: $h"))
  }

  test("phashNearDupPairs: exact and complete vs brute force at hamming <= 3") {
    import spark.implicits._
    // adversarial hash set: a base value, single/double/triple bit flips in
    // DIFFERENT bands, a 4-bit flip (must be excluded), plus pseudo-random
    // fillers
    val rnd = new scala.util.Random(7)
    val base = 0x1234_5678_9ABC_DEFL
    val crafted = Seq(
      base,                       // 0: identical pair target
      base,                       // 1
      base ^ (1L << 50),          // 2: hamming 1 from base (band 0)
      base ^ (1L << 40) ^ (1L << 20), // 3: hamming 2 (bands 1 and 2)
      base ^ (1L << 5) ^ (1L << 25) ^ (1L << 45), // 4: hamming 3, three bands
      base ^ 0xFL                 // 5: hamming 4 → excluded
    )
    val fillers = Seq.fill(40)(rnd.nextLong() & Long.MaxValue >> 1)
    val hashes = (crafted ++ fillers).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("doc_id", "phash")
    val got = Multimodal.phashNearDupPairs(hashes)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // brute-force reference
    val all = (crafted ++ fillers).zipWithIndex
    val expected = (for {
      (ha, ia) <- all; (hb, ib) <- all if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia.toLong, ib.toLong) -> d).toMap
    assert(got == expected,
      s"missing: ${expected.keySet -- got.keySet}; extra: ${got.keySet -- expected.keySet}")
    assert(got(((0L, 1L))) == 0 && got(((0L, 2L))) == 1 &&
      got(((0L, 3L))) == 2 && got(((0L, 4L))) == 3)
    assert(!got.contains((0L, 5L)), "hamming 4 must be excluded")
  }

  test("phashNearDupPairs: mass-duplicate skew — 30% identical, band join sees distinct hashes only") {
    import spark.implicits._
    // production image-dedup shape: a monoculture block (30% of the corpus
    // byte-identical => one phash) plus a near-neighbor and random fillers
    val rnd = new scala.util.Random(11)
    val hot = 0x7AB1_0203_0405_060L
    val dupes = Seq.fill(60)(hot)
    val near = Seq(hot ^ (1L << 33))
    val fillers = Seq.fill(139)(rnd.nextLong() & Long.MaxValue >> 1)
    val all = (dupes ++ near ++ fillers).zipWithIndex
    val hashes = all.map { case (h, i) => (i.toLong, h) }.toDF("doc_id", "phash")
    val got = Multimodal.phashNearDupPairs(hashes)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val expected = (for {
      (ha, ia) <- all; (hb, ib) <- all if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia.toLong, ib.toLong) -> d).toMap
    assert(got == expected,
      s"missing: ${(expected.keySet -- got.keySet).take(5)}; " +
        s"extra: ${(got.keySet -- expected.keySet).take(5)}")
    // the monoculture block contributes exactly C(60,2) hamming-0 pairs —
    // all via the equi self-join, never the band join
    assert(got.count(_._2 == 0) >= 60 * 59 / 2)
    // candidate bound: the band join's input is DISTINCT hashes, so the
    // hot bucket holds ≤ nDistinct rows, not 60 — quadratic in hash
    // diversity, not corpus size
    val nDistinct = hashes.select(col("phash")).distinct().count()
    assert(nDistinct <= 1 + 1 + 139)
    // the maxBandHashes cap drops dense buckets (recall tradeoff) but can
    // NEVER lose identical-hash pairs — those bypass the bands entirely
    val capped = Multimodal.phashNearDupPairs(hashes, maxBandHashes = 1)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(capped.keySet.subsetOf(got.keySet))
    assert(expected.filter(_._2 == 0).keySet.subsetOf(capped.keySet),
      "capped run must keep every identical-hash pair")
  }
}
