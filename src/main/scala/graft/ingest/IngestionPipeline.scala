package graft.ingest

import graft.api.{IngestRequest, IngestionState}
import graft.canon.{CanonicalJson, Identity}
import graft.chunk.ChunkAssigner
import graft.sink.OrderedAckHttpSink
import graft.state.IngestionStateStore
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** End-to-end ingestion (SURVEY.md §3.4): scan → canonical serialize → chunk
  * → per-chunk checksum agg → ordered ACK-gated delivery → crash-safe resume.
  *
  * Execution split, designed for the protocol's constraint (§7.4 #1):
  *   - EXECUTORS (parallel): parse, canonical-JSON render, chunk assignment,
  *     per-chunk ordered record collection + sha256 — all distributed — and
  *     the chunk POSTs themselves (`deliverChunksDistributed`);
  *   - DRIVER (serial, protocol-imposed): only the ordered commit token —
  *     one contiguous chunk range in flight at a time, progress persisted
  *     after ACK (A21); payload bytes never cross the driver.
  *
  * At scale the serial commit is the declared bottleneck — exactly as in the
  * reference, where ordering is dictated by the receiver
  * (`chunk_data_integrity_validator.py:44-46`).
  */
object IngestionPipeline {

  final case class ChunkRow(chunkNumber: Long, nRecords: Long, checksum: String,
      canonicalRecords: Seq[String])

  final case class Result(ingestionId: String, chunksSent: Long, chunksSkipped: Long,
      totalRecords: Long, state: Option[IngestionState])

  /** Scan dispatch (A1–A6, A28's file_type branch — case-insensitive; unknown
    * type rejected like `ingestion_controllers.py:60-66`). "excel" accepts the
    * reference's semantics over CSV-with-header input (A5–A8: header row =
    * schema, short rows null-padded); native xlsx needs no third-party jar in
    * this environment and is deferred (SURVEY.md §7.4 #4). */
  def scan(spark: SparkSession, request: IngestRequest): DataFrame =
    request.fileType.toLowerCase match {
      case "json" =>
        // top-level JSON array (A1) or JSONL; recursive dir glob (A2) and
        // s3a/gs/abfss/file URIs (A3) come free from the Hadoop FS layer
        spark.read
          .option("multiLine", "true")
          .option("recursiveFileLookup", "true")
          .option("pathGlobFilter", "*.json")
          .json(request.filePath)
      case "jsonl" =>
        spark.read.option("recursiveFileLookup", "true").json(request.filePath)
      case "parquet" => spark.read.parquet(request.filePath)
      case "excel" if looksLikeXlsx(request.filePath) =>
        // native SpreadsheetML DataSource V2 (A4–A7 semantics in the source);
        // covers both a single .xlsx file and a directory of .xlsx files —
        // the CSV fallback must never see zip bytes (it would deliver
        // garbage records with valid checksums)
        spark.read.format("xlsx").load(request.filePath)
      case "excel" | "csv" =>
        // pre-converted spreadsheet input with the same header semantics
        spark.read.option("header", "true").option("mode", "PERMISSIVE")
          .csv(request.filePath)
      case other =>
        throw new IllegalArgumentException(s"Unsupported file type: $other")
    }

  /** "excel" routes to the native xlsx source for a .xlsx file OR a
    * directory holding .xlsx files (XlsxSource.expand reads one partition
    * per file); anything else falls back to pre-converted CSV. Probe
    * failures PROPAGATE — a transient FS error must fail the request, not
    * silently demote zip bytes to the CSV parser. */
  private def looksLikeXlsx(path: String): Boolean =
    path.toLowerCase.endsWith(".xlsx") || {
      // glob paths (e.g. /data/*.csv with fileType "excel") fall through to
      // the CSV reader's glob support — getFileStatus on a glob literal
      // would throw FileNotFoundException before dispatch
      !path.exists("*?[{".contains(_)) && {
        val conf = graft.sources.XlsxSource.hadoopConf()
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = org.apache.hadoop.fs.FileSystem.get(p.toUri, conf)
        fs.getFileStatus(p).isDirectory &&
          graft.sources.XlsxSource.expand(path, conf).nonEmpty
      }
    }

  /** A7 (Excel semantics): drop rows where every cell is null/empty-string —
    * they do not count toward progress. */
  def dropEmptyRows(df: DataFrame): DataFrame = {
    val anyNonEmpty = df.columns
      .map(c => col(c).isNotNull && col(c).cast("string") =!= "")
      .reduce(_ || _)
    df.filter(anyNonEmpty)
  }

  /** Stable 0-based row number in input order (file order for file sources:
    * partitions enumerate (file, block) deterministically). Delegates to the
    * InternalRow + JoinedRow path — no per-row external-Row conversion, no
    * sort, no single-partition funnel. */
  def withInputOrderRn(df: DataFrame): DataFrame =
    ChunkAssigner.withInputOrderRowNumber(df)

  /** Distributed chunk construction: returns (chunkNumber, nRecords,
    * checksum, orderedCanonicalRecords) — one row per chunk, built with
    * map-side parallelism and a single groupBy shuffle. Numbering starts at
    * `lastChunk + 1` (streaming batches continue a running sequence). */
  def buildChunks(df: DataFrame, request: IngestRequest,
      lastChunk: Long = -1L): DataFrame = {
    val withRec = withInputOrderRn(df)
      .withColumn("rec", CanonicalJson(struct(df.columns.map(col): _*)))
    val chunked = request.chunkSizeByRecords match {
      case Some(n) =>
        withRec.withColumn("chunk_number", lit(lastChunk + 1) + expr(s"rn div $n"))
      case None =>
        // A10/A13: byte-budget greedy packing over serialized record sizes
        ChunkAssigner.assignByBytes(
          withRec, Seq(col("rn")), request.chunkSizeByMemory.get,
          octet_length(col("rec")).cast("long"), lastChunk = lastChunk)
    }
    chunked
      .groupBy(col("chunk_number"))
      .agg(count(lit(1)).as("n_records"),
        transform(array_sort(collect_list(struct(col("rn"), col("rec")))),
          x => x.getField("rec")).as("records"))
      .withColumn("checksum",
        sha2(concat(lit("["), array_join(col("records"), ","), lit("]")), 256))
      .orderBy(col("chunk_number"))
  }

  /** Run one ingestion to completion (or terminal failure). Resumable: a
    * rerun with reIngestion=false continues after the last ACKed chunk. */
  def run(spark: SparkSession, request: IngestRequest, store: IngestionStateStore,
      nowMillis: => Long = System.currentTimeMillis()): Result = {
    // identity uses the NORMALIZED file type — dispatch lowercases it, so
    // "JSON" and "json" runs over the same file must resume the same
    // ingestion rather than silently minting a fresh id and re-sending all
    val fileId = Identity.fileId(request.filePath, request.fileType.toLowerCase)
    val version = Identity.version(request.reIngestion, nowMillis)
    val ingestionId = Identity.ingestionId(fileId, version)

    val lastAcked = store.lastChunk(ingestionId) // -1 on fresh start
    var totalRecords = store.totalRecords(ingestionId)

    val source = request.fileType.toLowerCase match {
      case "excel" | "csv" => dropEmptyRows(scan(spark, request))
      case _ => scan(spark, request)
    }
    val chunks = buildChunks(source, request).cache()
    try {
      val maxChunk = chunks.agg(max(col("chunk_number"))).collect()(0) match {
        case r if r.isNullAt(0) => -1L
        case r => r.getLong(0)
      }
      val (sent, skipped, newTotal) = deliverChunksDistributed(chunks,
        ingestionId, store, request.callbackUrl, lastAcked, totalRecords, maxChunk)
      totalRecords = newTotal
      val sink = new OrderedAckHttpSink(request.callbackUrl)

      sink.sendCompleted(ingestionId, maxChunk, totalRecords) // A22
      store.markCompleted(ingestionId)
      Result(ingestionId, sent, skipped, totalRecords, store.get(ingestionId))
    } finally chunks.unpersist()
  }

  /** Executor-direct ordered delivery (the batch hot path): chunk payloads
    * POST from executor tasks, never crossing the driver — at scale the
    * driver NIC is no longer the funnel and no chunk batch can OOM it.
    *
    * Ordering (A24) is preserved by a driver-held commit token: pending
    * chunks are range-partitioned into contiguous chunk_number ranges, and
    * the driver runs ONE partition's task at a time, in range order; within
    * a task chunks POST in sorted order. The driver receives only
    * (chunk_number, n_records) ACK summaries and persists progress (A21)
    * between tasks. A failing chunk aborts the token advance; the ACKs its
    * task already won are persisted first, so terminal state still points at
    * the exact last ACKed chunk. A hard crash can lose at most one task's
    * ACK summaries — those chunks re-send on resume and the receiver's
    * chunk_id idempotency (A23) absorbs them: at-least-once per chunk,
    * exactly the reference's contract. */
  def deliverChunksDistributed(chunks: DataFrame, ingestionId: String,
      store: IngestionStateStore, callbackUrl: String, lastAcked: Long,
      startingTotal: Long, maxChunk: Long): (Long, Long, Long) = {
    val spark = chunks.sparkSession
    val skipped = chunks.filter(col("chunk_number") <= lastAcked).count() // A20
    // buildChunks ends with orderBy(chunk_number): the (cached) chunks are
    // already range-partitioned into contiguous ascending ranges, so the
    // pending filter preserves global order with NO re-shuffle of payloads
    val rdd = chunks.filter(col("chunk_number") > lastAcked).rdd
    val sc = spark.sparkContext

    val deliverPartition = (it: Iterator[Row]) => {
      val sink = new OrderedAckHttpSink(callbackUrl)
      val acks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var error: Option[String] = None
      // one-chunk lookahead: POSTs must stay strictly serial (A24), but body
      // CONSTRUCTION is not order-constrained — build chunk i+1's ~MB body on
      // a helper thread while chunk i is in flight awaiting its ACK
      val builder = java.util.concurrent.Executors.newSingleThreadExecutor(r => {
        val t = new Thread(r, "chunk-body-builder"); t.setDaemon(true); t
      })
      def buildNext(): Option[(Long, Long, java.util.concurrent.Future[String])] =
        if (!it.hasNext) None
        else {
          val row = it.next()
          val chunkNumber = row.getLong(row.fieldIndex("chunk_number"))
          val n = row.getLong(row.fieldIndex("n_records"))
          val records = row.getSeq[String](row.fieldIndex("records"))
          val checksum = row.getString(row.fieldIndex("checksum"))
          Some((chunkNumber, n, builder.submit(() =>
            sink.chunkBody(ingestionId, chunkNumber,
              Identity.chunkId(ingestionId, chunkNumber), checksum, records,
              isLast = chunkNumber == maxChunk))))
        }
      try {
        var pending = buildNext()
        while (pending.isDefined && error.isEmpty) {
          val (chunkNumber, n, bodyFut) = pending.get
          try {
            val body = bodyFut.get()
            pending = buildNext() // overlaps with this chunk's POST + ACK wait
            sink.sendWithRetry(body, s"chunk $chunkNumber")
            acks += ((chunkNumber, n))
          } catch {
            // task-kill / cancellation signals and fatal JVM errors keep
            // their scheduler semantics — only orderly delivery failures
            // become a driver-visible error string
            case e: org.apache.spark.TaskKilledException => throw e
            case e: InterruptedException => throw e
            // surface the terminal error to the driver WITH the task's won
            // ACKs — a thrown task would discard them and leave state stale.
            // Message-less exceptions (NPE etc.) still need a diagnosable
            // string; the class name rides along for those.
            case scala.util.control.NonFatal(e) =>
              val cause = e match {
                case ee: java.util.concurrent.ExecutionException
                  if ee.getCause != null => ee.getCause
                case _ => e
              }
              error = Some(
                if (cause.getMessage == null) cause.getClass.getName
                else s"${cause.getMessage} (${cause.getClass.getSimpleName})")
          }
        }
      } finally builder.shutdownNow()
      (acks.toSeq, error)
    }

    // async single-partition launch: the NEXT range's POSTs start while the
    // driver persists the previous range's ACKs
    def launch(part: Int): org.apache.spark.FutureAction[(Seq[(Long, Long)], Option[String])] = {
      val res = new java.util.concurrent.atomic.AtomicReference[(Seq[(Long, Long)], Option[String])]
      sc.submitJob(rdd, deliverPartition, Seq(part),
        (_: Int, r: (Seq[(Long, Long)], Option[String])) => res.set(r), res.get())
    }

    var sent = 0L
    var totalRecords = startingTotal
    var failure: Option[String] = None
    // A21, batched: one durable write per task instead of one per chunk.
    // The per-chunk writes ran back-to-back on the driver with no POST in
    // between, so no observer could ever see an intermediate value —
    // persisting the task's LAST won ACK is crash-equivalent and removes
    // N-1 atomic file writes per task from the commit-token critical path.
    def persist(acks: Seq[(Long, Long)]): Unit = acks.lastOption.foreach { last =>
      totalRecords += acks.iterator.map(_._2).sum
      store.ackChunk(ingestionId, last._1, totalRecords) // A21
      sent += acks.size
    }
    val nParts = rdd.partitions.length
    if (nParts > 0) {
      var inflight = launch(0)
      var p = 0
      try {
        while (p < nParts && failure.isEmpty) {
          val (acks, err) = scala.concurrent.Await.result(
            inflight, scala.concurrent.duration.Duration.Inf)
          p += 1
          // ordering (A24) requires serial POSTs, not a serial store: kick
          // off the next range's task before persisting this range's progress
          if (err.isEmpty && p < nParts) inflight = launch(p)
          persist(acks)
          failure = err
        }
      } catch {
        // a persist (store write) failure must not leave the overlapped
        // task POSTing in the background while the caller unwinds and
        // unpersists the chunks it iterates; receiver idempotency (A23)
        // absorbs any POST that raced the cancel
        case scala.util.control.NonFatal(e) =>
          if (!inflight.isCompleted) inflight.cancel()
          throw e
      }
    }
    failure.foreach(msg => throw new RuntimeException(msg))
    (sent, skipped, totalRecords)
  }

}
