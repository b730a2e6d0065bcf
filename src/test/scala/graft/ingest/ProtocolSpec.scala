package graft.ingest

import graft.TestSpark
import graft.api.{IngestRequest, IngestionState}
import graft.canon.Identity
import graft.receiver.MockPimCore
import graft.sink.OrderedAckHttpSink
import graft.state.IngestionStateStore
import java.nio.file.Files
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Protocol/invariant tests (SURVEY.md §5.2 #1 and #4): the full ingest
  * pipeline over REAL HTTP against the mock receiver — chunk-exactly-once,
  * ACK-gated persistence, NACK-retry, terminal failure, crash/resume,
  * duplicate idempotency, re-ingestion versioning, COMPLETED accounting.
  *
  * Each test writes its own input file: file_path feeds file_id feeds
  * ingestion_id, so per-test files isolate receiver-side ordering state.
  */
class ProtocolSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  private var mock: MockPimCore = _
  private var server: com.sun.net.httpserver.HttpServer = _
  private var url: String = _

  override def beforeAll(): Unit = {
    val (m, s, u) = MockPimCore.serve()
    mock = m; server = s; url = u
  }

  override def afterAll(): Unit = server.stop(0)

  /** Fresh 50-record JSON array file — the reference's sample input shape. */
  private def freshFile(): String = {
    val records = (0 until 50).map { i =>
      s"""{"product_id": ${1000 + i}, "sku": "SKU-${1000 + i}", "price": $i.99, "active": ${i % 2 == 0}}"""
    }
    val f = Files.createTempFile("graft_ingest", ".json")
    Files.writeString(f, records.mkString("[\n", ",\n", "\n]"))
    f.toString
  }

  private def request(file: String, chunkSize: Int = 10, reIngestion: Boolean = false) =
    IngestRequest(file, "json", url,
      chunkSizeByRecords = Some(chunkSize), reIngestion = reIngestion)

  private def resumeId(file: String): String =
    Identity.ingestionId(Identity.fileId(file, "json"), "resume")

  test("fresh ingest delivers every chunk in order and completes") {
    val file = freshFile()
    val store = IngestionStateStore.inMemory()
    val before = mock.receivedChunks.size
    val completions = mock.completedCount
    val result = IngestionPipeline.run(spark, request(file), store)
    assert(result.chunksSent == 5)
    assert(result.chunksSkipped == 0)
    assert(result.totalRecords == 50)
    assert(mock.receivedChunks.slice(before, before + 5).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(result.state.contains(
      IngestionState(result.ingestionId, 4, 50, IngestionState.Completed)))
    assert(mock.completedCount == completions + 1)
  }

  test("NACK triggers retry; a transient rejection is absorbed") {
    val file = freshFile()
    val store = IngestionStateStore.inMemory()
    mock.rejectChunk(2, times = 1)
    val result = IngestionPipeline.run(spark, request(file), store)
    assert(result.chunksSent == 5)
    assert(result.state.exists(_.status == IngestionState.Completed))
  }

  test("3 consecutive NACKs are terminal; progress stops at the last ACK (A18/A21)") {
    val file = freshFile()
    val store = IngestionStateStore.inMemory()
    mock.rejectChunk(3, times = 3)
    val ex = intercept[Exception] {
      IngestionPipeline.run(spark, request(file), store)
    }
    assert(ex.getMessage.contains("chunk 3"))
    // chunks 0..2 were ACKed and persisted; chunk 3 never reached the store
    assert(store.get(resumeId(file)).contains(
      IngestionState(resumeId(file), 2, 30, IngestionState.InProgress)))
  }

  test("crash mid-ingestion then resume: only unsent chunks go out (A20)") {
    val file = freshFile()
    val store = IngestionStateStore.inMemory()
    mock.rejectChunk(2, times = 3) // receiver outage at chunk 2
    intercept[Exception] { IngestionPipeline.run(spark, request(file), store) }
    assert(store.get(resumeId(file)).exists(s =>
      s.lastChunk == 1 && s.totalRecords == 20 && s.status == IngestionState.InProgress))

    val resumeStart = mock.receivedChunks.size
    val result = IngestionPipeline.run(spark, request(file), store)
    assert(result.chunksSkipped == 2) // 0,1 rebuilt but not re-sent
    assert(result.chunksSent == 3) // 2,3,4
    assert(mock.receivedChunks.slice(resumeStart, resumeStart + 3).toSeq ==
      Seq(2L, 3L, 4L))
    assert(result.totalRecords == 50) // monotone across resume (A12)
    assert(result.state.exists(_.status == IngestionState.Completed))
  }

  test("concurrent ingestions interleave freely but stay ordered per ingestion") {
    // 4 distinct files → 4 ingestion ids, run simultaneously against ONE
    // receiver. The receiver NACKs any out-of-order chunk within an
    // ingestion (A24), and 3 NACKs are terminal — so all four completing
    // with full counts PROVES per-ingestion ordering survived arbitrary
    // cross-ingestion interleaving (the IngestController concurrency model)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val files = (0 until 4).map(_ => freshFile())
    val recordsBefore = mock.totalRecordsEver
    val completionsBefore = mock.completedCount
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results =
      try Await.result(Future.sequence(files.map(f => Future {
        IngestionPipeline.run(spark, request(f), IngestionStateStore.inMemory())
      })), 120.seconds)
      finally pool.shutdown()
    results.foreach { r =>
      assert(r.chunksSent == 5 && r.totalRecords == 50)
      assert(r.state.exists(_.status == IngestionState.Completed))
    }
    assert(results.map(_.ingestionId).distinct.size == 4)
    assert(mock.totalRecordsEver == recordsBefore + 200)
    assert(mock.completedCount == completionsBefore + 4)
  }

  test("crash between the final chunk ACK and COMPLETED: resume re-sends " +
      "ONLY the handshake (A22)") {
    // the one protocol window the other resume tests never plant
    // (reference semantics: the handshake is a separate call AFTER the
    // last chunk ACK persists, so a crash can land exactly between them)
    val file = freshFile()
    val store = IngestionStateStore.inMemory()
    val req = request(file)
    val ingestionId = resumeId(file)
    // phase 1 — simulate the crash: deliver every chunk (each ACK
    // persists progress), then die BEFORE sendCompleted/markCompleted
    val chunks = IngestionPipeline.buildChunks(
      IngestionPipeline.scan(spark, req), req)
    val (sent, _, total) = IngestionPipeline.deliverChunksDistributed(
      chunks, ingestionId, store, url, lastAcked = -1L, startingTotal = 0L,
      maxChunk = 4L)
    assert(sent == 5 && total == 50)
    assert(store.get(ingestionId).contains(
      IngestionState(ingestionId, 4, 50, IngestionState.InProgress)))
    val completionsBefore = mock.completedCount
    val chunksBefore = mock.receivedChunks.size
    val recordsBefore = mock.totalRecordsEver
    // phase 2 — resume: every chunk is already ACKed, so the run must
    // send ZERO chunks and exactly ONE handshake
    val result = IngestionPipeline.run(spark, request(file), store)
    assert(result.chunksSent == 0)
    assert(result.chunksSkipped == 5)
    assert(result.totalRecords == 50) // running count survived (A12)
    assert(mock.receivedChunks.size == chunksBefore) // no chunk re-sends
    assert(mock.totalRecordsEver == recordsBefore) // accounting unchanged
    assert(mock.completedCount == completionsBefore + 1) // one handshake
    assert(result.state.contains(
      IngestionState(ingestionId, 4, 50, IngestionState.Completed)))
  }

  test("duplicate chunk delivery is idempotent at the receiver (A23)") {
    val file = freshFile()
    val store = IngestionStateStore.inMemory()
    val result = IngestionPipeline.run(spark, request(file), store)
    val total = mock.totalRecordsReceived
    // replay an already-processed chunk_id: must ACK without reprocessing
    val sink = new OrderedAckHttpSink(url)
    val rec = """{"k":1}"""
    sink.sendChunk(result.ingestionId, 0,
      Identity.chunkId(result.ingestionId, 0),
      Identity.sha256Hex(s"[$rec]"), Seq(rec), isLast = false)
    assert(mock.totalRecordsReceived == total) // not reprocessed
  }

  test("receiver rejects out-of-order, checksum-mismatched and empty chunks (A24-A26)") {
    val sink = new OrderedAckHttpSink(url, maxAttempts = 1)
    val iid = Identity.ingestionId("f" * 64, System.nanoTime().toString)
    val rec = """{"k":1}"""
    val good = Identity.sha256Hex(s"[$rec]")
    val ex1 = intercept[Exception] {
      sink.sendChunk(iid, 5, Identity.chunkId(iid, 5), good, Seq(rec), false)
    }
    assert(ex1.getMessage.contains(MockPimCore.OutOfOrder))
    val ex2 = intercept[Exception] {
      sink.sendChunk(iid, 0, Identity.chunkId(iid, 0), "0" * 64, Seq(rec), false)
    }
    assert(ex2.getMessage.contains(MockPimCore.ChecksumMismatch))
    val ex3 = intercept[Exception] {
      sink.sendChunk(iid, 0, Identity.chunkId(iid, 0), good, Seq.empty, false)
    }
    assert(ex3.getMessage.contains(MockPimCore.EmptyChunk))
  }

  test("re-ingestion mints a fresh ingestion id and restarts from chunk 0 (A31)") {
    val file = freshFile()
    val store = IngestionStateStore.inMemory()
    val r1 = IngestionPipeline.run(spark, request(file), store)
    val r2 = IngestionPipeline.run(spark, request(file, reIngestion = true), store,
      nowMillis = 1723400000000L)
    assert(r1.ingestionId != r2.ingestionId)
    assert(r2.chunksSent == 5 && r2.chunksSkipped == 0)
    assert(r2.ingestionId ==
      Identity.ingestionId(Identity.fileId(file, "json"), "1723400000000"))
  }

  test("byte-budget chunking drives the pipeline end-to-end (A10)") {
    val file = freshFile()
    val store = IngestionStateStore.inMemory()
    val req = IngestRequest(file, "json", url, chunkSizeByMemory = Some(200L))
    val result = IngestionPipeline.run(spark, req, store)
    assert(result.totalRecords == 50)
    assert(result.chunksSent > 5) // 200-byte budget packs ~2-3 records/chunk
    assert(result.state.exists(_.status == IngestionState.Completed))
  }

  test("file-backed state store survives process handoff (crash-safe resume)") {
    val dir = Files.createTempDirectory("graft_state")
    val storeA = IngestionStateStore.file(dir.toString)
    storeA.ackChunk("iid_x", 7, 800)
    // a brand-new store instance over the same directory sees the progress
    val storeB = IngestionStateStore.file(dir.toString)
    assert(storeB.get("iid_x").contains(
      IngestionState("iid_x", 7, 800, IngestionState.InProgress)))
    storeB.markCompleted("iid_x")
    assert(IngestionStateStore.file(dir.toString).get("iid_x")
      .exists(_.status == IngestionState.Completed))
    assert(storeB.lastChunk("unknown") == -1L) // reference default (-1)
    assert(storeB.totalRecords("unknown") == 0L)
  }

  test("nested free-form records survive the full protocol (A14 end-to-end)") {
    // nested objects/arrays/nulls/decimals — the receiver independently
    // re-parses and re-canonicalizes, so an ACKed run proves byte-level
    // canonical parity between the Catalyst expression and MiniJson
    val records = Seq(
      """{"id": 1, "attrs": {"tags": ["b", "a"], "color": "red"}, "price": 19.99, "note": "line\nbreak"}""",
      """{"id": 2, "attrs": {"tags": [], "color": null}, "price": null, "note": "quote\"inside"}""",
      """{"id": 3, "attrs": {"tags": ["x"], "color": "blue"}, "price": 5.0, "note": null}""")
    val f = Files.createTempFile("graft_nested", ".json")
    Files.writeString(f, records.mkString("[\n", ",\n", "\n]"))
    val store = IngestionStateStore.inMemory()
    val result = IngestionPipeline.run(spark,
      IngestRequest(f.toString, "json", url, chunkSizeByRecords = Some(2)), store)
    assert(result.totalRecords == 3)
    assert(result.chunksSent == 2)
    assert(result.state.exists(_.status == IngestionState.Completed))
  }

  test("request validation enforces the chunk-size XOR and bounds (A29)") {
    val file = freshFile()
    intercept[IllegalArgumentException] {
      IngestRequest(file, "json", url) // neither size given
    }
    intercept[IllegalArgumentException] {
      IngestRequest(file, "json", url,
        chunkSizeByRecords = Some(10), chunkSizeByMemory = Some(100L))
    }
    intercept[IllegalArgumentException] {
      IngestRequest(file, "json", url, chunkSizeByRecords = Some(4001))
    }
    intercept[IllegalArgumentException] {
      IngestRequest("", "json", url, chunkSizeByRecords = Some(10))
    }
  }

  test("file type dispatch is case-insensitive (A28: lower() on file_type)") {
    val file = freshFile()
    val store = IngestionStateStore.inMemory()
    val result = IngestionPipeline.run(spark,
      IngestRequest(file, "JSON", url, chunkSizeByRecords = Some(25)), store)
    assert(result.totalRecords == 50 && result.chunksSent == 2)
  }

  test("unknown file type is rejected (A28 dispatch)") {
    val ex = intercept[IllegalArgumentException] {
      IngestionPipeline.scan(spark, IngestRequest(freshFile(), "xml", url,
        chunkSizeByRecords = Some(10)))
    }
    assert(ex.getMessage.contains("Unsupported file type"))
  }

  test("empty-row filter drops all-blank CSV rows before counting (A7)") {
    val f = Files.createTempFile("graft_csv", ".csv")
    Files.writeString(f, "name,qty\nalpha,1\n,\nbeta,2\n,\n")
    val store = IngestionStateStore.inMemory()
    val req = IngestRequest(f.toString, "csv", url, chunkSizeByRecords = Some(10))
    val result = IngestionPipeline.run(spark, req, store)
    assert(result.totalRecords == 2) // blank rows do not count toward progress
  }

  test("a glob path with fileType excel reaches the CSV reader's glob support") {
    val dir = Files.createTempDirectory("graft_glob")
    Files.writeString(dir.resolve("a.csv"), "name,qty\nalpha,1\nbeta,2\n")
    Files.writeString(dir.resolve("b.csv"), "name,qty\ngamma,3\n")
    val store = IngestionStateStore.inMemory()
    // the xlsx probe must not getFileStatus the glob literal (it would throw
    // FileNotFoundException before dispatch); globs fall through to CSV
    val req = IngestRequest(s"$dir/*.csv", "excel", url, chunkSizeByRecords = Some(10))
    val result = IngestionPipeline.run(spark, req, store)
    assert(result.totalRecords == 3)
  }
}
