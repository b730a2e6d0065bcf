package graft.receiver

import graft.canon.Identity
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process mock of the downstream Pimcore callback (test harness —
  * SURVEY.md §2 A23–A27, mirroring
  * `tests/pim_core_mock_test/services/chunk_data_integrity_validator.py` and
  * `tests/pim_core_mock_test/pim_core_mock_test.py`).
  *
  * Validation order per ingestion (reference order):
  *   COMPLETED branch → empty-chunk NACK → duplicate-chunk idempotent ACK →
  *   strict ordering NACK → independent checksum recompute NACK → accept.
  *
  * Fault injection: `rejectChunk(n)` NACKs chunk n exactly once with an
  * injected error (the reference's FakePimCore.reject_chunk,
  * `tests/unit_tests/services/pim_core.py`).
  */
final class MockPimCore {
  import MockPimCore._

  private val processed = scala.collection.mutable.Set.empty[String]
  private val lastChunk = scala.collection.mutable.Map.empty[String, Long]
  @volatile var totalRecordsReceived: Long = 0L
  /** Cumulative across COMPLETED resets (A27 resets the per-run counter). */
  @volatile var totalRecordsEver: Long = 0L
  @volatile var completedCount: Int = 0
  val receivedChunks: scala.collection.mutable.ArrayBuffer[Long] =
    scala.collection.mutable.ArrayBuffer.empty
  private val toReject = scala.collection.mutable.Map.empty[Long, Int]
  /** NACKs issued (any reason) — the concurrency audit's ordering witness:
    * zero means no stream ever presented chunk n+1 before n's accept. */
  @volatile var nackCount: Long = 0L
  /** Highest accepted chunk per ingestion (dense from 0 by A24). */
  def lastChunkPerIngestion: Map[String, Long] = synchronized {
    lastChunk.toMap
  }

  /** NACK chunk n the next `times` times it arrives. */
  def rejectChunk(n: Long, times: Int = 1): Unit = synchronized {
    toReject(n) = toReject.getOrElse(n, 0) + times
  }

  def handle(body: String): Response = {
    // parse + checksum recompute run OUTSIDE the state lock: they are the
    // CPU cost of a request and independent ingestions must validate in
    // parallel (the reference receiver is a multi-worker uvicorn process).
    // The sender serializes per ingestion (no chunk n+1 before chunk n's
    // ACK), so per-ingestion validation order is untouched.
    val obj = MiniJson.parse(body).asInstanceOf[MiniJson.JObj]
    val ingestionId = str(obj, "ingestion_id")

    if (obj.get("status").contains(MiniJson.JStr("COMPLETED"))) {
      // A27: completion accounting — acknowledge and reset the counter
      synchronized {
        completedCount += 1
        totalRecordsReceived = 0L
      }
      return Response(ack = true, ingestionId, chunkNumber = -1, error = None)
    }

    val chunkNumber = num(obj, "chunk_number")
    val chunkId = str(obj, "chunk_id")
    val checksum = str(obj, "checksum")
    val records = obj.get("records") match {
      case Some(MiniJson.JArr(vs)) => vs
      case _ => Vector.empty
    }
    // A25: independent checksum recompute from the PARSED records
    val checksumOk = records.nonEmpty && {
      val canonical = MiniJson.canonicalAll(records, sizeHint = body.length)
      Identity.sha256Hex(canonical) == checksum
    }

    val resp = synchronized {
      if (toReject.getOrElse(chunkNumber, 0) > 0) {
        val left = toReject(chunkNumber) - 1
        if (left == 0) toReject.remove(chunkNumber) else toReject(chunkNumber) = left
        Response(ack = false, ingestionId, chunkNumber, Some("Injected rejection"))
      } else if (records.isEmpty) // pim_core_mock_test.py:68-77
        Response(ack = false, ingestionId, chunkNumber, Some(EmptyChunk))
      else if (processed.contains(chunkId)) // A23: duplicate → idempotent ACK
        Response(ack = true, ingestionId, chunkNumber, None)
      else if (chunkNumber != lastChunk.getOrElse(ingestionId, -1L) + 1)
        Response(ack = false, ingestionId, chunkNumber, Some(OutOfOrder)) // A24
      else if (!checksumOk)
        Response(ack = false, ingestionId, chunkNumber, Some(ChecksumMismatch))
      else {
        processed += chunkId
        lastChunk(ingestionId) = chunkNumber
        totalRecordsReceived += records.size
        totalRecordsEver += records.size
        receivedChunks += chunkNumber
        Response(ack = true, ingestionId, chunkNumber, None)
      }
    }
    if (!resp.ack) synchronized { nackCount += 1 }
    resp
  }

  private def str(o: MiniJson.JObj, k: String): String =
    o.get(k) match { case Some(MiniJson.JStr(s)) => s; case other => other.toString }
  private def num(o: MiniJson.JObj, k: String): Long =
    o.get(k) match { case Some(MiniJson.JNum(r)) => r.toLong; case _ => -1L }
}

object MockPimCore {
  // error strings from tests/pim_core_mock_test/utility/error_messages.py
  val OutOfOrder = "Out-of-order chunk"
  val ChecksumMismatch = "Checksum mismatch"
  val EmptyChunk = "Empty chunk"

  final case class Response(ack: Boolean, ingestionId: String,
      chunkNumber: Long, error: Option[String]) {
    def toJson: String = {
      // escape with the shared JSON rules — an exception message with a
      // quote/backslash/newline must not produce an unparseable body
      val err = error.map(e => MiniJson.canonical(MiniJson.JStr(e))).getOrElse("null")
      s"""{"ack":$ack,"ingestion_id":${MiniJson.canonical(MiniJson.JStr(ingestionId))},"chunk_number":$chunkNumber,"error":$err}"""
    }
  }

  /** Serve a MockPimCore over real HTTP (JDK built-in server) so protocol
    * tests cross an actual network boundary, like the reference's second
    * uvicorn process (`README.md:191-204`). Returns (receiver, server, url). */
  def serve(port: Int = 0): (MockPimCore, HttpServer, String) = {
    // com.sun.net.httpserver leaves Nagle ON unless told otherwise; its
    // header-write-then-body-write response pattern then collides with
    // delayed ACK for a flat ~40ms stall on EVERY response — which gated
    // every chunk ACK. Must be set before the first server is created.
    System.setProperty("sun.net.httpserver.nodelay", "true")
    val mock = new MockPimCore
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // without an executor every request runs on the single dispatch thread,
    // which would serialize validation across concurrent ingestions
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext("/callback", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val resp = try mock.handle(body).toJson catch {
          case e: Exception =>
            Response(ack = false, "", -1L,
              Some(s"receiver error: ${e.getMessage}")).toJson
        }
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/callback"
    (mock, server, url)
  }
}
