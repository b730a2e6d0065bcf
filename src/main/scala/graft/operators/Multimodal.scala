package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 B33): opaque binary payloads +
  * typed metadata, with decode/feature-extraction running as a batched
  * per-partition stage (the Scala analog of `mapInPandas`: one iterator of
  * rows per partition, arbitrary native code inside, schema declared up
  * front).
  *
  * IMAGE decode is REAL: javax.imageio (PNG/JPEG/GIF/BMP ship in the JDK)
  * decodes the payload and features are color statistics over the actual
  * pixels (MultimodalSpec decodes real PNG bytes). Payloads that are not a
  * decodable image — e.g. the documents table's UTF-8 stand-in blobs, or
  * audio/video needing codecs absent offline — fall back to a deterministic
  * byte-hash feature vector, so the operator is total over mixed corpora.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Attach a binary payload + metadata struct to the documents table. The
    * payload here is the UTF-8 text bytes standing in for real media blobs
    * (same column type, same size profile handling). */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("fake/utf8").as("format"),
        octet_length(col("text")).as("n_bytes"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height")).as("meta"))

  /** Real image decode via the JDK's ImageIO. Returns (mime, width, height,
    * 8-dim features): mean R, mean G, mean B, mean luma, and a 4-bin luma
    * histogram — deterministic color statistics over the decoded pixels.
    * None when the bytes are not a decodable image.
    *
    * Pixel pass is strided so a pathological 100-megapixel frame costs the
    * same as a thumbnail: at most ~2^18 sampled pixels per image, stride
    * chosen deterministically from the dimensions. */
  def decodeImage(payload: Array[Byte]): Option[(String, Int, Int, Array[Double])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else Some((detectMime(payload), img.getWidth, img.getHeight, pixelStats(img)))
  }

  /** The 8-dim color statistics over a decoded frame (strided pixel pass). */
  def pixelStats(img: java.awt.image.BufferedImage): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val stride = math.max(1L, math.round(math.sqrt(w.toLong * h / (1 << 18).toDouble))).toInt
    var sr, sg, sb, sl = 0.0
    val hist = new Array[Double](4)
    var n = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = ((rgb >> 16) & 0xFF) / 255.0
        val g = ((rgb >> 8) & 0xFF) / 255.0
        val b = (rgb & 0xFF) / 255.0
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += luma
        hist(math.min(3, (luma * 4).toInt)) += 1
        n += 1
        x += stride
      }
      y += stride
    }
    Array(sr / n, sg / n, sb / n, sl / n,
      hist(0) / n, hist(1) / n, hist(2) / n, hist(3) / n)
  }

  private def detectMime(b: Array[Byte]): String =
    if (b.length >= 4 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      "image/png"
    else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8)
      "image/jpeg"
    else if (b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      "image/gif"
    else "image/unknown"

  /** Deterministic fallback features for non-image payloads (text stand-ins,
    * codec-less media): an 8-dim byte-distribution sketch. */
  def byteFallbackFeatures(payload: Array[Byte]): Array[Double] = {
    val out = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xFF) / 255.0
      i += 1
    }
    out
  }

  /** Batched per-partition decode → features. Image payloads decode through
    * ImageIO (real pixels → real width/height/stats); everything else takes
    * the deterministic byte fallback with metadata passthrough. Heavyweight
    * init (codec caches, a model) amortizes once per PARTITION — the
    * property that matters at scale. */
  def extractFeatures(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("doc_id", "payload", "meta").rdd
      .mapPartitions { rows =>
        // per-partition init happens HERE (once), not per record —
        // disabling ImageIO's on-disk cache keeps decode in-memory per task
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val docId = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val meta = r.getStruct(2)
          decodeImage(payload) match {
            case Some((mime, w, h, feats)) =>
              Row(docId, mime, payload.length, w, h, feats.toSeq)
            case None =>
              Row(docId, meta.getString(0), payload.length,
                meta.getInt(2), meta.getInt(3), byteFallbackFeatures(payload).toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Resize an image payload so its longest side is ≤ maxDim (aspect
    * preserved), re-encoded as PNG. Returns (bytes, width, height) from the
    * single decode — (payload, 0, 0) for non-image bytes, the original
    * payload untouched when already small. Pure JDK: ImageIO decode +
    * Graphics2D bilinear scale. */
  def resizePayload(payload: Array[Byte], maxDim: Int): (Array[Byte], Int, Int) = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) (payload, 0, 0)
    else if (math.max(img.getWidth, img.getHeight) <= maxDim)
      (payload, img.getWidth, img.getHeight)
    else {
      val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
      val w = math.max(1, math.round(img.getWidth * scale).toInt)
      val h = math.max(1, math.round(img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bytes = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bytes)
      (bytes.toByteArray, w, h)
    }
  }

  /** Batched per-partition resize: payloads stay binary; dims come from the
    * resize's own (single) decode. */
  def resizeImages(withPayload: DataFrame, maxDim: Int): DataFrame = {
    val spark = withPayload.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val rdd = withPayload.select("doc_id", "payload").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (resized, w, h) = resizePayload(r.getAs[Array[Byte]](1), maxDim)
        Row(r.getLong(0), resized, w, h)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Frame sampling over multi-frame payloads (animated GIF is the JDK-real
    * case): every `everyK`-th frame decodes to the same color statistics the
    * still-image path produces. Single-frame images yield frame 0; payloads
    * no reader accepts yield no rows. One output row per sampled frame —
    * flatMap semantics, partition-amortized reader setup. */
  def sampleFrames(withPayload: DataFrame, everyK: Int): DataFrame = {
    require(everyK >= 1, "everyK must be >= 1")
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("doc_id", "payload").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val docId = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        decodeFrames(payload, everyK).map { case (idx, w, h, feats) =>
          Row(docId, idx, w, h, feats.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Every `everyK`-th frame's (index, width, height, features). */
  def decodeFrames(payload: Array[Byte],
      everyK: Int): Seq[(Int, Int, Int, Array[Double])] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return Seq.empty
      val reader = readers.next()
      try {
        reader.setInput(in, false, true)
        val n = try reader.getNumImages(true) catch { case _: Exception => 1 }
        (0 until n by everyK).flatMap { i =>
          try {
            val img = reader.read(i)
            Some((i, img.getWidth, img.getHeight, pixelStats(img)))
          } catch { case _: Exception => None }
        }
      } finally reader.dispose()
    } finally in.close() // may be file-cache-backed outside mapPartitions
  }

  // -- query entries ---------------------------------------------------------

  /** Schema/metadata plumbing — fully deterministic, so it IS oracled:
    * binary round-trip (text → bytes → md5) must match DuckDB's blob path. */
  private def q38(s: SparkSession, dir: String): DataFrame =
    withBinaryPayload(Tables.documents(s, dir))
      .select(col("doc_id"),
        md5(col("payload")).as("payload_md5"),
        octet_length(col("payload")).as("n_bytes"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"))
      .orderBy(col("doc_id"))

  private val q38Sql =
    """SELECT doc_id, md5(text) AS payload_md5,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  'fake/utf8' AS format,
      |  CAST(n_chars % 640 + 1 AS INTEGER) AS width,
      |  CAST(n_chars % 480 + 1 AS INTEGER) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The mapPartitions decode stage, fully oracled: the documents payloads
    * are UTF-8 stand-ins (not decodable images), so every row takes the
    * deterministic byte-distribution fallback — whose features, rescaled by
    * 255, are exact integer sums of byte values at positions ≡ k (mod 8).
    * DuckDB reproduces those sums from the text itself (all-ASCII corpus:
    * byte i == codepoint of char i), turning the feature math into a
    * hash-matched differential instead of a rows-only check. */
  private def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    extractFeatures(withBinaryPayload(Tables.documents(s, dir)))
      .select(col("doc_id"), col("format"), col("n_bytes"),
        col("width"), col("height"),
        round(element_at(col("features"), 1) * 255, 0).cast("long").as("f0_scaled"),
        round(element_at(col("features"), 8) * 255, 0).cast("long").as("f7_scaled"))
      .orderBy(col("doc_id"))

  private val multimodalFeaturesSql =
    """SELECT doc_id, 'fake/utf8' AS format,
      |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
      |  CAST(n_chars % 640 + 1 AS INTEGER) AS width,
      |  CAST(n_chars % 480 + 1 AS INTEGER) AS height,
      |  CAST(list_sum(list_transform(range(1, length(text) + 1),
      |    i -> CASE WHEN (i - 1) % 8 = 0 THEN ascii(text[i]) ELSE 0 END))
      |    AS BIGINT) AS f0_scaled,
      |  CAST(list_sum(list_transform(range(1, length(text) + 1),
      |    i -> CASE WHEN (i - 1) % 8 = 7 THEN ascii(text[i]) ELSE 0 END))
      |    AS BIGINT) AS f7_scaled
      |FROM documents ORDER BY doc_id""".stripMargin

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = true)))

  /** Audio feature extraction over a binary WAV column — REAL decode via
    * WavCodec's RIFF chunk walk (no codec libraries needed for PCM), same
    * batched per-partition shape as the image path. Non-WAV payloads are
    * dropped (callers keep them via the image/fallback path). */
  def audioFeatures(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("doc_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        // null payloads drop like any other non-WAV bytes
        Option(r.getAs[Array[Byte]](1)).flatMap(WavCodec.decode).map { case (rate, samples) =>
          var sumAbs = 0L
          var sumSq = 0.0
          var peak = 0L
          var i = 0
          while (i < samples.length) {
            val v = samples(i).toLong
            val a = math.abs(v)
            if (a > peak) peak = a
            sumAbs += a
            sumSq += (v * v).toDouble
            i += 1
          }
          val rms = if (samples.length > 0)
            java.lang.Double.valueOf(math.sqrt(sumSq / samples.length)) else null
          Row(r.getLong(0), rate, samples.length.toLong, peak, sumAbs, rms)
        }
      }
    }
    spark.createDataFrame(rdd, audioSchema)
  }

  /** Oracled audio round-trip: synthesize a REAL WAV per document (16-bit
    * PCM at 8 kHz; sample i = (byte i − 96)·256 over the all-ASCII text),
    * decode it back through the RIFF parser, and emit exact integer stats
    * plus the RMS. DuckDB reproduces every value from the text directly —
    * the differential covers the encoder, the chunk walk, and the sample
    * math end to end. */
  private def audioRoundTrip(s: SparkSession, dir: String): DataFrame = {
    // contract: non-empty printable-ASCII text only, enforced on BOTH sides
    // (byte==char there, so the synthesis agrees across engines; empty text
    // would emit a 0-sample row here but no rows from the oracle's unnest)
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .filter(col("text").rlike("^[ -~]+$"))
    val spark = docs.sparkSession
    val wavSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val wavs = spark.createDataFrame(
      docs.rdd.mapPartitions(_.map { r =>
        val samples = r.getString(1).getBytes("US-ASCII")
          .map(b => ((b - 96) * 256).toShort)
        Row(r.getLong(0), WavCodec.encode(samples, 8000))
      }), wavSchema)
    audioFeatures(wavs)
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("peak_abs"), col("sum_abs"), QueryDef.dec4(col("rms")).as("rms"))
      .orderBy(col("doc_id"))
  }

  private val audioRoundTripSql =
    """WITH s AS (
      |  SELECT doc_id, (ascii(text[i]) - 96) * 256 AS smp
      |  FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
      |  WHERE regexp_matches(text, '^[ -~]+$'))
      |SELECT doc_id, 8000 AS sample_rate, count(*) AS n_samples,
      |  CAST(max(abs(smp)) AS BIGINT) AS peak_abs,
      |  CAST(sum(abs(smp)) AS BIGINT) AS sum_abs,
      |  CAST(CAST(sqrt(avg(CAST(smp AS DOUBLE) * smp)) AS DECIMAL(38,4))
      |    AS VARCHAR) AS rms
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Deterministic solid-colour PNG at (w, h). */
  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Oracled image-resize round-trip: synthesize a REAL solid-colour PNG per
    * document (dims from n_chars, colour from doc_id), shrink the long side
    * to ≤16 via `resizeImages`, then DECODE THE RESIZED PAYLOAD BACK and
    * emit its dims + mean colour. DuckDB predicts the dims through the same
    * two-step double math (scale = 16/max, round half-up) and the colours
    * exactly — bilinear interpolation of a constant image is the constant,
    * and PNG is lossless, so the differential covers the decode, the scale,
    * and the re-encode end to end. */
  private def imageResizeOracled(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val pngs = s.createDataFrame(docs.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val docId = r.getLong(0)
        val nc = r.getLong(1)
        val rgb = (((docId % 256) << 16) | (((docId * 7) % 256) << 8) |
          ((docId * 13) % 256)).toInt
        Row(docId, solidPng((nc % 64 + 1).toInt, (nc % 48 + 1).toInt, rgb))
      }
    }, payloadSchema)
    val redecSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", IntegerType, nullable = false),
      StructField("mean_g", IntegerType, nullable = false),
      StructField("mean_b", IntegerType, nullable = false)))
    s.createDataFrame(
      resizeImages(pngs, maxDim = 16).select("doc_id", "payload")
        .rdd.mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.flatMap { r =>
            decodeImage(r.getAs[Array[Byte]](1)).map { case (_, w, h, feats) =>
              Row(r.getLong(0), w, h,
                math.round(feats(0) * 255).toInt,
                math.round(feats(1) * 255).toInt,
                math.round(feats(2) * 255).toInt)
            }
          }
        }, redecSchema)
      .orderBy(col("doc_id"))
  }

  private val imageResizeSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(n_chars % 64 + 1 AS INTEGER) AS w0,
      |    CAST(n_chars % 48 + 1 AS INTEGER) AS h0
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN greatest(w0, h0) <= 16 THEN w0
      |    ELSE greatest(1, CAST(round(w0 * (16.0 / greatest(w0, h0)))
      |      AS INTEGER)) END AS width,
      |  CASE WHEN greatest(w0, h0) <= 16 THEN h0
      |    ELSE greatest(1, CAST(round(h0 * (16.0 / greatest(w0, h0)))
      |      AS INTEGER)) END AS height,
      |  CAST(doc_id % 256 AS INTEGER) AS mean_r,
      |  CAST((doc_id * 7) % 256 AS INTEGER) AS mean_g,
      |  CAST((doc_id * 13) % 256 AS INTEGER) AS mean_b
      |FROM m ORDER BY doc_id""".stripMargin

  /** A 256-gray indexed frame: the GIF encoder stores the exact palette
    * entry, no quantization — gray levels round-trip bit-exact. */
  private def grayFrame(w: Int, h: Int, gray: Int): java.awt.image.BufferedImage = {
    val ramp = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(gray, gray, gray))
    g2.fillRect(0, 0, w, h)
    g2.dispose()
    img
  }

  /** Multi-frame GIF from per-frame images (the JDK-real animated case). */
  private def gifOf(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Oracled frame sampling: synthesize a REAL animated GIF per document
    * (doc_id%5+1 frames of 8×6 solid gray, level (doc_id·31 + idx·17)%256),
    * sample every 2nd frame through `sampleFrames`, and emit each sampled
    * frame's index, dims and gray level (luma of (g,g,g) is g). DuckDB
    * predicts the sampled index set and every value from doc_id alone. */
  private def frameSampleOracled(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val gifs = s.createDataFrame(docs.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val docId = r.getLong(0)
        val frames = (0 until (docId % 5 + 1).toInt).map(f =>
          grayFrame(8, 6, ((docId * 31 + f * 17) % 256).toInt))
        Row(docId, gifOf(frames))
      }
    }, payloadSchema)
    sampleFrames(gifs, everyK = 2)
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        round(element_at(col("features"), 4) * 255, 0).cast("int").as("luma"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val frameSampleSql =
    """SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
      |  8 AS width, 6 AS height,
      |  CAST((doc_id * 31 + f * 17) % 256 AS INTEGER) AS luma
      |FROM documents, unnest(range(0, doc_id % 5 + 1, 2)) AS u(f)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ==== q129: perceptual-hash (dHash) near-duplicate images =================
  //
  // The image-dedup primitive: a difference hash over a downsampled
  // luminance grid, then near-dup pairs by Hamming distance. The hash here
  // is 63 bits (7×10 grid, row-adjacent comparisons) — deliberately NOT 64:
  // bit 63 would force `1<<63` sign-bit semantics both engines would have
  // to agree on; 63 bits keep every term a positive BIGINT literal. Grid
  // luminance comes from the payload's evenly-spaced sample bytes — for
  // the all-ASCII stand-in corpus that is `ascii(text[i])`, which DuckDB
  // recomputes exactly (the multimodal_features contract).
  //
  // Pair generation is the LSH-band shape shared with minhash dedup: the
  // hash splits into 4 bands, candidates meet in a same-band equi shuffle
  // join (never all-pairs), and the pigeonhole principle makes candidates
  // COMPLETE for Hamming ≤ 3 (4 bands, ≤3 differing bits → some band is
  // bit-identical). Mass-duplicate skew (the monoculture corpus) never
  // reaches the band join: identical hashes collapse first and the bands
  // carry DISTINCT hash values only — see phashNearDupPairs.

  private val PhashGridRows = 7
  private val PhashGridCols = 10 // 9 comparisons per row → 63 bits

  /** SQL text (shared shape cross-engine) for the grid sample char code at
    * grid position p: evenly spaced over the document. */
  private def gridChar(p: Int, div: String, castInt: String => String) =
    s"ascii(substr(text, ${castInt(s"(($p * length(text)) $div 70)")} + 1, 1))"

  private def dhashSqlExpr(div: String, castInt: String => String): String = {
    val terms = for {
      r <- 0 until PhashGridRows
      c <- 0 until PhashGridCols - 1
    } yield {
      val bit = r * (PhashGridCols - 1) + c
      val weight = 1L << (62 - bit)
      s"(CASE WHEN ${gridChar(r * PhashGridCols + c, div, castInt)} > " +
        s"${gridChar(r * PhashGridCols + c + 1, div, castInt)} " +
        s"THEN CAST($weight AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }
    terms.mkString("(", " + ", ")")
  }

  /** Adds the 63-bit `phash` column from `text` (non-empty). */
  def dHash63(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) > 0)
      .withColumn("phash", expr(dhashSqlExpr("div", e => s"cast($e as int)")))

  /** Near-dup pairs (a < b) with Hamming ≤ `maxHamming` over (doc_id,
    * phash). Exact and complete for maxHamming ≤ 3 (pigeonhole over 4
    * bands).
    *
    * Skew discipline (the production image-dedup input is MASS-duplicate —
    * millions of byte-identical images land on the same four band values):
    *  - identical hashes never enter the band join at all; they pair via a
    *    plain equi self-join on `phash` (hamming 0 by construction), which
    *    shuffles by full hash, not band value;
    *  - the band join runs over DISTINCT hash values only, so a bucket's
    *    cost is quadratic in distinct hashes near each other, not in
    *    images — hash-level pairs then expand back through two member
    *    joins (output-sized work, which IS the answer);
    *  - the hamming filter runs BEFORE dedup of the ≤4-way band collisions,
    *    so the distinct shuffles surviving pairs only;
    *  - `maxBandHashes` (off by default, the `maxShingleFreq` discipline
    *    from [[Dedup.ngramJaccardPairs]]) drops band buckets holding more
    *    distinct hashes than the cap — a documented recall tradeoff for
    *    adversarially dense hash neighborhoods. */
  def phashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3,
      maxBandHashes: Int = Int.MaxValue): DataFrame = {
    require(maxHamming <= 3, "4 bands guarantee completeness only to 3")
    // (doc_id, phash) is read five times (intra ×2, distinct, expansion
    // ×2) — materialize it once (16 bytes/doc, distributed blocks) instead
    // of recomputing the 63-term hash expression per scan; the caller's
    // per-query BlockRelease reclaims it.
    val h = hashes.select(col("doc_id"), col("phash")).localCheckpoint()
    val intra = h.select(col("doc_id").as("a_id"), col("phash"))
      .join(h.select(col("doc_id").as("b_id"), col("phash")), Seq("phash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(cast(0 as bigint))").as("hamming"))
    val bandCols = Seq(
      shiftright(col("phash"), 47),
      shiftright(col("phash"), 31).bitwiseAND(lit(0xFFFFL)),
      shiftright(col("phash"), 15).bitwiseAND(lit(0xFFFFL)),
      col("phash").bitwiseAND(lit(0x7FFFL)))
    val bandedAll = h.select(col("phash")).distinct()
      .select(col("phash"),
        explode(array(bandCols.zipWithIndex.map { case (c, i) =>
          struct(lit(i).as("band_idx"), c.as("band_val")) }: _*)).as("band"))
      .select(col("phash"),
        col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
    val banded =
      if (maxBandHashes == Int.MaxValue) bandedAll
      else {
        val sizes = bandedAll.groupBy(col("band_idx"), col("band_val"))
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= maxBandHashes)
        bandedAll.join(sizes.drop("__bn"), Seq("band_idx", "band_val"))
      }
    val pa = banded.select(col("phash").as("a_hash"),
      col("band_idx"), col("band_val"))
    val pb = banded.select(col("phash").as("b_hash"),
      col("band_idx"), col("band_val"))
    val hashPairs = pa.join(pb, Seq("band_idx", "band_val"))
      .filter(col("a_hash") < col("b_hash"))
      .select(col("a_hash"), col("b_hash"),
        expr("bit_count(a_hash ^ b_hash)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    val cross = hashPairs
      .join(h.select(col("doc_id").as("ida"), col("phash").as("a_hash")),
        Seq("a_hash"))
      .join(h.select(col("doc_id").as("idb"), col("phash").as("b_hash")),
        Seq("b_hash"))
      .select(least(col("ida"), col("idb")).as("a_id"),
        greatest(col("ida"), col("idb")).as("b_id"), col("hamming"))
    intra.unionByName(cross)
  }

  // The corpus carries no duplicate texts, so the gate PLANTS them (the
  // established planted-recall pattern): every 50th doc gains an identical
  // copy (Hamming 0) and a first-char-substituted copy (Hamming ≤ 1 — only
  // the grid-(0,0) comparison samples char 1).
  private def q129(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val seeds = docs.filter(col("doc_id") % 50 === 0)
    val planted = docs
      .unionAll(seeds.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionAll(seeds.select((col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("Z"), expr("substring(text, 2)")).as("text")))
    phashNearDupPairs(dHash63(planted)).orderBy(col("a_id"), col("b_id"))
  }

  private val q129Sql = {
    val h = dhashSqlExpr("//", e => s"CAST($e AS INTEGER)")
    s"""WITH planted AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000, 'Z' || substr(text, 2)
       |  FROM documents WHERE doc_id % 50 = 0),
       |hashes AS (
       |  SELECT doc_id, $h AS phash
       |  FROM planted WHERE length(text) > 0),
       |banded AS (
       |  SELECT doc_id, phash, 0 AS band_idx, phash >> 47 AS band_val FROM hashes
       |  UNION ALL
       |  SELECT doc_id, phash, 1, (phash >> 31) & 65535 FROM hashes
       |  UNION ALL
       |  SELECT doc_id, phash, 2, (phash >> 15) & 65535 FROM hashes
       |  UNION ALL
       |  SELECT doc_id, phash, 3, phash & 32767 FROM hashes)
       |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       |  AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= 3
       |ORDER BY a_id, b_id""".stripMargin
  }

  // ==== q192: audio spectral features via the Walsh–Hadamard transform ======
  //
  // Frame-level "spectral" audio features with EXACT integer arithmetic —
  // the property an FFT/Goertzel bank cannot give cross-engine (trig
  // coefficients are libm calls and their recurrences compound last-ulp
  // drift over hundreds of steps). The WHT is the orthogonal transform
  // whose basis is ±1 (sequency analysis; used in audio fingerprinting):
  // W_k = Σ_i x_i·(−1)^popcount(i∧k) over each 64-sample frame — only
  // adds/subtracts, so frame coefficients and their squared energies are
  // exact BIGINTs, and the oracle states the SAME closed form with
  // bit_count(), no recursion. Low-k coefficients track slow envelope,
  // high-k track alternation — the band split a voice/noise/tone triage
  // needs. Plus the zero-crossing rate (sign-product test, integer).
  //
  // Scale shape: decode + transform ride the existing per-partition codec
  // pass (the documented imperative-RDD use); everything after is one
  // groupBy per doc. Bounds: |W_k| ≤ 64·32767 < 2²², W² < 2⁴⁴, summed
  // over frames — BIGINT-safe to ~2¹⁹ frames per doc.

  /** Per-frame WHT sequency bands to extract (k = 1 slow … 32 fastest). */
  private val WhtBands = Seq(1, 2, 32)
  private val FrameLen = 64

  val audioSpectralSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false),
    StructField("e_w1", LongType, nullable = false),
    StructField("e_w2", LongType, nullable = false),
    StructField("e_w32", LongType, nullable = false)))

  /** One WHT coefficient W_k = Σ_p x_p·(−1)^popcount(p∧k) over the
    * [[FrameLen]] samples at `off` — the exact-integer transform kernel
    * (WhtSpec pins Parseval/orthogonality and linearity laws on it). */
  private[operators] def whtCoeff(samples: Array[Short], off: Int, k: Int): Long = {
    var w = 0L
    var p = 0
    while (p < FrameLen) {
      val s = samples(off + p).toLong
      w += (if (Integer.bitCount(p & k) % 2 == 0) s else -s)
      p += 1
    }
    w
  }

  /** WHT band energies + zero-crossing count over a binary WAV column.
    * Frames are consecutive [[FrameLen]]-sample blocks; a trailing
    * partial frame is dropped (stated, both sides). */
  def audioSpectralFeatures(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("doc_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        Option(r.getAs[Array[Byte]](1)).flatMap(WavCodec.decode).map {
          case (_, samples) =>
            var zc = 0L
            var i = 1
            while (i < samples.length) {
              if (samples(i - 1).toInt * samples(i).toInt < 0) zc += 1
              i += 1
            }
            val nFrames = samples.length / FrameLen
            val energies = Array.fill(WhtBands.size)(0L)
            var f = 0
            while (f < nFrames) {
              var b = 0
              while (b < WhtBands.size) {
                val w = whtCoeff(samples, f * FrameLen, WhtBands(b))
                energies(b) += w * w
                b += 1
              }
              f += 1
            }
            Row(r.getLong(0), samples.length.toLong, nFrames.toLong, zc,
              energies(0), energies(1), energies(2))
        }
      }
    }
    spark.createDataFrame(rdd, audioSpectralSchema)
  }

  /** q192: the q63 synthesis (REAL WAV per doc from its text) pushed
    * through the spectral path; DuckDB restates the WHT closed form and
    * the sign-product crossing test from the text directly. */
  private def q192(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .filter(col("text").rlike("^[ -~]+$"))
    val spark = docs.sparkSession
    val wavSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val wavs = spark.createDataFrame(
      docs.rdd.mapPartitions(_.map { r =>
        val samples = r.getString(1).getBytes("US-ASCII")
          .map(b => ((b - 96) * 256).toShort)
        Row(r.getLong(0), WavCodec.encode(samples, 8000))
      }), wavSchema)
    audioSpectralFeatures(wavs)
      .orderBy(col("doc_id"))
  }

  private val q192Sql =
    """WITH s AS (
      |  SELECT doc_id, i - 1 AS i0,
      |    CAST((ascii(text[i]) - 96) * 256 AS BIGINT) AS smp
      |  FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
      |  WHERE regexp_matches(text, '^[ -~]+$')),
      |n AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples
      |  FROM s GROUP BY 1),
      |zc AS (
      |  SELECT a.doc_id, CAST(count(*) FILTER (a.smp * b.smp < 0)
      |    AS BIGINT) AS zero_crossings
      |  FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.i0 = a.i0 + 1
      |  GROUP BY 1),
      |w AS (
      |  SELECT doc_id, i0 // 64 AS f,
      |    CAST(sum(CASE WHEN bit_count(CAST((i0 % 64) & 1 AS BIGINT)) % 2 = 0
      |      THEN smp ELSE -smp END) AS BIGINT) AS w1,
      |    CAST(sum(CASE WHEN bit_count(CAST((i0 % 64) & 2 AS BIGINT)) % 2 = 0
      |      THEN smp ELSE -smp END) AS BIGINT) AS w2,
      |    CAST(sum(CASE WHEN bit_count(CAST((i0 % 64) & 32 AS BIGINT)) % 2 = 0
      |      THEN smp ELSE -smp END) AS BIGINT) AS w32
      |  FROM s GROUP BY 1, 2 HAVING count(*) = 64),
      |e AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
      |    CAST(sum(w1 * w1) AS BIGINT) AS e_w1,
      |    CAST(sum(w2 * w2) AS BIGINT) AS e_w2,
      |    CAST(sum(w32 * w32) AS BIGINT) AS e_w32
      |  FROM w GROUP BY 1)
      |SELECT n.doc_id, n.n_samples,
      |  coalesce(e.n_frames, 0) AS n_frames,
      |  coalesce(zc.zero_crossings, 0) AS zero_crossings,
      |  coalesce(e.e_w1, 0) AS e_w1, coalesce(e.e_w2, 0) AS e_w2,
      |  coalesce(e.e_w32, 0) AS e_w32
      |FROM n LEFT JOIN zc ON n.doc_id = zc.doc_id
      |LEFT JOIN e ON n.doc_id = e.doc_id
      |ORDER BY n.doc_id""".stripMargin

  // ==== q193: image sharpness via Sobel edge energy ==========================
  //
  // The image-quality gate of multimodal curation: blurry/empty frames
  // carry near-zero gradient energy, real content does not — filter on
  // Σ(Gx²+Gy²) over the luminance plane (Sobel 3×3, the standard
  // gradient stencil). All-integer: luminance = (r+g+b) div 3 ∈ [0,255],
  // kernel weights ±1/±2, so per-pixel responses and the energy sum are
  // exact BIGINTs (|G| ≤ 4·255, per-pixel energy ≤ 2·(1020)² < 2²¹ —
  // BIGINT-safe to ~2⁴² pixels per image). Decode + convolution ride the
  // per-partition codec pass like every image op here.
  //
  // The oracle plants a KNOWN gradient: a vertical step edge (left half
  // g1, right half g2) whose Sobel response has a closed form — the two
  // columns astride the step, interior rows only, |Gx| = 4Δ, Gy = 0 —
  // so DuckDB predicts energy = 32·Δ²·(h−2) and count = 2·(h−2) from
  // the metadata alone, certifying decode + stencil end to end (the
  // solid-PNG q72 pattern, extended to a non-constant image).

  /** (doc_id, width, height, edge_energy, n_edge_pixels): Sobel energy
    * over interior luminance pixels; n_edge_pixels counts nonzero
    * responses. Undecodable payloads drop. */
  def imageEdgeEnergy(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("edge_energy", LongType, nullable = false),
      StructField("n_edge_pixels", LongType, nullable = false)))
    val rdd = withPayload.select("doc_id", "payload").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          catch { case _: Exception => null }
        Option(img).map { im =>
          val w = im.getWidth; val h = im.getHeight
          // integer luminance plane
          val lum = Array.ofDim[Int](h, w)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = im.getRGB(x, y)
              lum(y)(x) = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          var energy = 0L
          var nEdge = 0L
          y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val gx = (lum(y - 1)(x + 1) + 2 * lum(y)(x + 1) + lum(y + 1)(x + 1)) -
                (lum(y - 1)(x - 1) + 2 * lum(y)(x - 1) + lum(y + 1)(x - 1))
              val gy = (lum(y + 1)(x - 1) + 2 * lum(y + 1)(x) + lum(y + 1)(x + 1)) -
                (lum(y - 1)(x - 1) + 2 * lum(y - 1)(x) + lum(y - 1)(x + 1))
              if (gx != 0 || gy != 0) {
                nEdge += 1
                energy += gx.toLong * gx + gy.toLong * gy
              }
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), w, h, energy, nEdge)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** A w×h PNG, left half gray g1, right half (x ≥ w/2) gray g2. */
  private def stepPng(w: Int, h: Int, g1: Int, g2: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(g1, g1, g1))
    g.fillRect(0, 0, w / 2, h)
    g.setColor(new java.awt.Color(g2, g2, g2))
    g.fillRect(w / 2, 0, w - w / 2, h)
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def q193(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val pngs = s.createDataFrame(docs.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val docId = r.getLong(0)
        val nc = r.getLong(1)
        stepPng((nc % 32 + 4).toInt, (nc % 24 + 3).toInt,
          (docId % 256).toInt, ((docId * 5 + 17) % 256).toInt) match {
          case png => Row(docId, png)
        }
      }
    }, payloadSchema)
    imageEdgeEnergy(pngs).orderBy(col("doc_id"))
  }

  private val q193Sql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(n_chars % 32 + 4 AS INTEGER) AS w,
      |    CAST(n_chars % 24 + 3 AS INTEGER) AS h,
      |    CAST(doc_id % 256 AS BIGINT) AS g1,
      |    CAST((doc_id * 5 + 17) % 256 AS BIGINT) AS g2
      |  FROM documents)
      |SELECT doc_id, w AS width, h AS height,
      |  CAST(32 * (g2 - g1) * (g2 - g1) * (h - 2) AS BIGINT) AS edge_energy,
      |  CAST(CASE WHEN g1 = g2 THEN 0 ELSE 2 * (h - 2) END AS BIGINT)
      |    AS n_edge_pixels
      |FROM m ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q193_image_edges", q193, Some(q193Sql)),
    QueryDef("q192_audio_wht", q192, Some(q192Sql)),
    QueryDef("q38_multimodal_meta", q38, Some(q38Sql)),
    QueryDef("multimodal_features", multimodalFeatures, Some(multimodalFeaturesSql)),
    QueryDef("q63_audio_roundtrip", audioRoundTrip, Some(audioRoundTripSql)),
    QueryDef("q72_image_resize", imageResizeOracled, Some(imageResizeSql)),
    QueryDef("q73_frame_sample", frameSampleOracled, Some(frameSampleSql)),
    QueryDef("q129_phash_dedup", q129, Some(q129Sql)))
}
