package graft.sink

import graft.receiver.MiniJson
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Ordered, ACK-gated, retrying chunk delivery (SURVEY.md §2 A17–A19, A22 —
  * `app/services/json_reader.py:138-196`).
  *
  * Protocol semantics reproduced exactly:
  *   - one POST per chunk, 60 s timeout (`json_reader.py:54`);
  *   - HTTP 200 is NOT success — the body must carry `ack: true` (A19);
  *   - up to 3 attempts per chunk, rethrow after the 3rd (A18) — failures
  *     are chunk-scoped, never file-scoped;
  *   - chunks are committed strictly in chunk_number order per ingestion —
  *     the receiver REJECTS gaps (A24), so the commit loop is serial by
  *     design; parallelism lives upstream in chunk production.
  */
final class OrderedAckHttpSink(
    callbackUrl: String,
    maxAttempts: Int = 3,
    timeout: Duration = Duration.ofSeconds(60)) {

  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  final case class AckError(message: String) extends RuntimeException(message)

  private def post(body: String): String = {
    val req = HttpRequest.newBuilder(URI.create(callbackUrl))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    client.send(req, HttpResponse.BodyHandlers.ofString()).body()
  }

  /** POST once and require `ack == true`; returns the receiver error on NACK. */
  private def postExpectAck(body: String): Either[String, Unit] = {
    val respBody = post(body)
    MiniJson.parse(respBody) match {
      case o: MiniJson.JObj if o.get("ack").contains(MiniJson.JBool(true)) => Right(())
      case o: MiniJson.JObj =>
        Left(o.get("error") match {
          case Some(MiniJson.JStr(e)) => e
          case _ => s"ack missing/false in: $respBody"
        })
      case _ => Left(s"unparseable receiver response: $respBody")
    }
  }

  /** Retry-with-terminal-raise (A18): attempts 1..maxAttempts, rethrow after
    * the final failure. Transport errors and NACKs count the same. */
  def sendWithRetry(body: String, what: String): Unit = {
    var attempt = 0
    var lastError: String = ""
    while (attempt < maxAttempts) {
      attempt += 1
      val result = try postExpectAck(body) catch {
        case e: Exception => Left(s"transport: ${e.getMessage}")
      }
      result match {
        case Right(()) => return
        case Left(err) =>
          lastError = err
          if (attempt == maxAttempts)
            throw AckError(s"$what failed after $maxAttempts attempts: $err")
      }
    }
    throw AckError(s"$what: $lastError") // unreachable
  }

  /** A17: chunk payload POST. Records arrive pre-serialized in canonical
    * JSON; the payload embeds them verbatim so the receiver's independent
    * recompute sees exactly the bytes the checksum covers. */
  def sendChunk(ingestionId: String, chunkNumber: Long, chunkId: String,
      checksum: String, canonicalRecords: Seq[String], isLast: Boolean): Unit = {
    val body = new java.lang.StringBuilder(256)
    body.append("{\"ingestion_id\":\"").append(ingestionId)
      .append("\",\"chunk_number\":").append(chunkNumber)
      .append(",\"chunk_id\":\"").append(chunkId)
      .append("\",\"checksum\":\"").append(checksum)
      .append("\",\"is_last\":").append(isLast)
      .append(",\"records\":").append(canonicalRecords.mkString("[", ",", "]"))
      .append('}')
    sendWithRetry(body.toString, s"chunk $chunkNumber")
  }

  /** A22: completion handshake. */
  def sendCompleted(ingestionId: String, lastChunkNumber: Long, totalRecords: Long): Unit =
    sendWithRetry(
      s"""{"ingestion_id":"$ingestionId","status":"COMPLETED","chunk_number":$lastChunkNumber,"total_records":$totalRecords}""",
      "COMPLETED handshake")
}
