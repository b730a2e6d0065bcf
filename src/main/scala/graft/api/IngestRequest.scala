package graft.api

/** Ingestion request (SURVEY.md §2 A29 — `app/schemas/request_model.py:18-66`).
  *
  * Validation semantics reproduced exactly: `file_path`, `callback_url`,
  * `file_type` required; EXACTLY ONE of `chunkSizeByRecords` (1..4000) or
  * `chunkSizeByMemory` (bytes) must be set; `reIngestion` defaults to false.
  */
final case class IngestRequest(
    filePath: String,
    fileType: String,
    callbackUrl: String,
    chunkSizeByRecords: Option[Int] = None,
    chunkSizeByMemory: Option[Long] = None,
    reIngestion: Boolean = false) {

  require(filePath.nonEmpty, "file_path is required")
  require(callbackUrl.nonEmpty, "callback_url is required")
  require(fileType.nonEmpty, "file_type is required")
  require(chunkSizeByRecords.isDefined ^ chunkSizeByMemory.isDefined,
    "exactly one of chunk_size_by_records and chunk_size_by_memory must be provided")
  chunkSizeByRecords.foreach(n =>
    require(n >= 1 && n <= 4000, s"chunk_size_by_records must be in [1, 4000], got $n"))
  chunkSizeByMemory.foreach(b =>
    require(b >= 1, s"chunk_size_by_memory must be positive, got $b"))
}

/** Persistent per-ingestion progress row — the four columns of the
  * reference's `ingestion_state` table (`ingestion_state_store.py:26-33`). */
final case class IngestionState(
    ingestionId: String,
    lastChunk: Long,
    totalRecords: Long,
    status: String)

object IngestionState {
  val InProgress = "IN_PROGRESS"
  val Completed = "COMPLETED"
}
