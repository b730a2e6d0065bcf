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
  * The actual media decoding is STUBBED — no image/audio codecs exist in
  * this environment — with a deterministic fake that consumes the real
  * bytes; everything Spark-side (schema, binary column handling, partition
  * batching, output contract) is real and tested in MultimodalSpec.
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

  /** STUB decoder: stands in for image decode + feature extraction.
    * Deterministic: derives an 8-dim "embedding" from the payload bytes.
    * Replace the body with a real codec (e.g. javax.imageio / ffmpeg JNI)
    * without touching the Spark plumbing around it. */
  private def decodeStub(payload: Array[Byte]): Array[Double] = {
    val out = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xFF) / 255.0
      i += 1
    }
    out
  }

  /** Batched per-partition decode → features. Runs the stub once per row but
    * amortizes any heavyweight init (model load, codec context) once per
    * PARTITION — the property that matters at scale. */
  def extractFeatures(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("doc_id", "payload", "meta").rdd
      .mapPartitions { rows =>
        // per-partition init happens HERE (once), not per record
        rows.map { r =>
          val docId = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val meta = r.getStruct(2)
          Row(docId, meta.getString(0), payload.length,
            meta.getInt(2), meta.getInt(3), decodeStub(payload).toSeq)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
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

  /** The mapPartitions decode stage (rows-only check — the stub's output is
    * engine-defined). */
  private def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    extractFeatures(withBinaryPayload(Tables.documents(s, dir)))
      .select(col("doc_id"), col("format"), col("n_bytes"),
        QueryDef.dec4(element_at(col("features"), 1)).as("f0"),
        QueryDef.dec4(element_at(col("features"), 8)).as("f7"))
      .orderBy(col("doc_id"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q38_multimodal_meta", q38, Some(q38Sql)),
    QueryDef("multimodal_features", multimodalFeatures, None))
}
