package graft.ingest

import graft.TestSpark
import graft.api.{IngestRequest, IngestionState}
import graft.receiver.MockPimCore
import graft.state.IngestionStateStore
import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-based continuous ingestion (the Spark-native A20): files
  * arriving in a directory stream out as a running chunk sequence; a restart
  * with the same checkpoint delivers ONLY new arrivals. */
class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("payload", StringType)))

  private def writeFile(dir: java.nio.file.Path, name: String,
      ids: Range): Unit = {
    val records = ids.map(i => s"""{"id": $i, "payload": "p$i"}""")
    Files.writeString(dir.resolve(name), records.mkString("\n")) // JSONL
  }

  test("streaming ingest: running chunk numbers, checkpoint resume on new files") {
    val (mock, server, url) = MockPimCore.serve()
    val inputDir = Files.createTempDirectory("graft_stream_in")
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val store = IngestionStateStore.inMemory()
    val request = IngestRequest(inputDir.toString, "jsonl", url,
      chunkSizeByRecords = Some(4))
    try {
      writeFile(inputDir, "a.json", 0 until 10)
      val before = mock.receivedChunks.size
      val (iid, q1) = StreamingIngest.start(spark, request, store, schema, ckpt)
      q1.awaitTermination(60000)
      // 10 records / 4 → chunks 0,1,2
      assert(mock.receivedChunks.slice(before, before + 3).toSeq == Seq(0L, 1L, 2L))
      assert(store.lastChunk(iid) == 2 && store.totalRecords(iid) == 10)

      // second wave: restart from the same checkpoint; only the new file flows
      writeFile(inputDir, "b.json", 10 until 17)
      val mid = mock.receivedChunks.size
      val (_, q2) = StreamingIngest.start(spark, request, store, schema, ckpt)
      q2.awaitTermination(60000)
      // 7 new records → chunks 3,4 — numbering CONTINUES, nothing re-sent
      assert(mock.receivedChunks.slice(mid, mid + 2).toSeq == Seq(3L, 4L))
      assert(mock.receivedChunks.size == mid + 2, "old batch was re-delivered")
      assert(store.lastChunk(iid) == 4 && store.totalRecords(iid) == 17)

      StreamingIngest.finish(request, store, iid)
      assert(store.get(iid).exists(_.status == IngestionState.Completed))
      assert(mock.completedCount == 1)
    } finally { server.stop(0) }
  }

  /** Minimal xlsx workbook with header (id, payload) + numeric/inline rows. */
  private def writeXlsx(dir: java.nio.file.Path, name: String, ids: Range): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val tmp = dir.resolve(name + ".tmp")
    val zip = new ZipOutputStream(Files.newOutputStream(tmp))
    def entry(n: String, c: String): Unit = {
      zip.putNextEntry(new ZipEntry(n)); zip.write(c.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>""")
    val rows =
      """<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c><c r="B1" t="inlineStr"><is><t>payload</t></is></c></row>""" +
        ids.zipWithIndex.map { case (id, i) =>
          s"""<row r="${i + 2}"><c r="A${i + 2}"><v>$id</v></c><c r="B${i + 2}" t="inlineStr"><is><t>p$id</t></is></c></row>"""
        }.mkString
    entry("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>$rows</sheetData></worksheet>""")
    zip.close()
    // atomic drop, the file-arrival contract streaming sources expect
    Files.move(tmp, dir.resolve(name))
  }

  test("streaming xlsx: micro-batches over arriving workbooks, checkpoint resume") {
    val (mock, server, url) = MockPimCore.serve()
    val inputDir = Files.createTempDirectory("graft_stream_xlsx")
    val ckpt = Files.createTempDirectory("graft_ckpt_xlsx").toString
    val store = IngestionStateStore.inMemory()
    val xlsxSchema = StructType(Seq(
      StructField("id", StringType), StructField("payload", StringType)))
    val request = IngestRequest(inputDir.toString, "excel", url,
      chunkSizeByRecords = Some(4))
    try {
      writeXlsx(inputDir, "a.xlsx", 0 until 10)
      val before = mock.receivedChunks.size
      val (iid, q1) = StreamingIngest.start(spark, request, store, xlsxSchema, ckpt)
      q1.awaitTermination(60000)
      assert(mock.receivedChunks.slice(before, before + 3).toSeq == Seq(0L, 1L, 2L))
      assert(store.lastChunk(iid) == 2 && store.totalRecords(iid) == 10)

      // a new workbook arrives; restart on the same checkpoint → only b.xlsx
      writeXlsx(inputDir, "b.xlsx", 10 until 17)
      val mid = mock.receivedChunks.size
      val (_, q2) = StreamingIngest.start(spark, request, store, xlsxSchema, ckpt)
      q2.awaitTermination(60000)
      assert(mock.receivedChunks.slice(mid, mid + 2).toSeq == Seq(3L, 4L))
      assert(mock.receivedChunks.size == mid + 2, "old workbook was re-delivered")
      assert(store.lastChunk(iid) == 4 && store.totalRecords(iid) == 17)
    } finally server.stop(0)
  }

  test("xlsx streaming offsets round-trip through their JSON form") {
    import graft.sources.XlsxOffset
    val o = XlsxOffset(Seq("/data/b with \"quote\".xlsx", "/data/a\\back.xlsx"))
    assert(XlsxOffset.fromJson(o.json()).files == o.files.sorted)
    assert(XlsxOffset.fromJson(XlsxOffset(Seq.empty).json()).files.isEmpty)
  }

  test("replayed micro-batch keeps its original chunk numbering (anchor)") {
    val (mock, server, url) = MockPimCore.serve()
    val store = IngestionStateStore.inMemory()
    val request = IngestRequest("/tmp/unused", "jsonl", url,
      chunkSizeByRecords = Some(3))
    val iid = "test_ingestion_anchor"
    try {
      import spark.implicits._
      val batch = (0 until 7).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      StreamingIngest.deliverBatch(batch, batchId = 0, iid, request, store)
      assert(store.lastChunk(iid) == 2) // chunks 0,1,2
      val sentOnce = mock.receivedChunks.size

      // simulate a replay of the SAME batch after a crash: anchor pins the
      // numbering to 0..2; the already-ACKed prefix is skipped entirely
      StreamingIngest.deliverBatch(batch, batchId = 0, iid, request, store)
      assert(mock.receivedChunks.size == sentOnce, "replay re-delivered chunks")
      assert(store.lastChunk(iid) == 2 && store.totalRecords(iid) == 7)

      // the NEXT batch continues from 3
      val batch2 = (7 until 10).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      StreamingIngest.deliverBatch(batch2, batchId = 1, iid, request, store)
      assert(store.lastChunk(iid) == 3 && store.totalRecords(iid) == 10)
    } finally server.stop(0)
  }
}
