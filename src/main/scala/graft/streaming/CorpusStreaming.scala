package graft.streaming

import graft.functions.SketchHash
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus-ingest operators (SURVEY.md §2 B37 extension): dedup
  * over an unbounded document stream with BOUNDED state.
  *
  * `dropDuplicates("text_hash")` on a stream keeps one state-store row per
  * distinct key forever — at 100 TB/day the state store IS the corpus and
  * the job dies. [[bloomDedupStream]] trades exactness for a fixed-size
  * per-bucket Bloom bitset held in `flatMapGroupsWithState` state: total
  * state is exactly `buckets * numBits / 8` bytes no matter how many
  * documents flow through. The error is one-sided — a true duplicate is
  * NEVER emitted twice; a novel document is dropped only on a Bloom false
  * positive (rate set by numBits per bucket, e.g. 2^20 bits / bucket holds
  * ~100k docs/bucket at <1% fp).
  *
  * Scale shape: hash-bucketing the stream spreads both the rows and the
  * bitsets across the cluster's state-store partitions; each micro-batch
  * shuffles once on the bucket key, the same partitioning every batch, and
  * each task touches one bitset (sequential memory, no per-key state-store
  * lookups).
  */
object CorpusStreaming {

  /** Deterministic 64-bit content hash (driver/executor-side lambda twin of
    * the engine's xxhash64 discipline — any stable 64-bit hash works, the
    * Bloom math only needs uniformity). */
  private[streaming] def textHash64(text: String): Long = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x5bd1e995)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** First-occurrence pass-through over a stream of (id, text): emits a row
    * iff its text was not (maybe) seen before, updating the bucket's Bloom
    * bitset. Works on any Dataset[(Long, String)] built from a streaming
    * source; output mode append. */
  def bloomDedupStream(
      docs: Dataset[(Long, String)],
      numBits: Int = 1 << 20,
      numHashes: Int = 5,
      buckets: Int = 64): Dataset[(Long, String)] = {
    require(numBits % 64 == 0, s"numBits must be a multiple of 64: $numBits")
    import docs.sparkSession.implicits._
    docs
      .groupByKey { case (_, text) =>
        java.lang.Math.floorMod(textHash64(text), buckets.toLong).toInt
      }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[(Long, String)], state: GroupState[Array[Long]]) =>
          val bits = state.getOption.getOrElse(new Array[Long](numBits / 64))
          val out = rows.filter { case (_, text) =>
            val h = textHash64(text)
            var allSet = true
            var i = 0
            while (i < numHashes) {
              val idx = SketchHash.index(h, i, numBits)
              if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) allSet = false
              i += 1
            }
            if (!allSet) { // novel: record it and emit
              i = 0
              while (i < numHashes) {
                val idx = SketchHash.index(h, i, numBits)
                bits(idx >>> 6) |= (1L << (idx & 63))
                i += 1
              }
            }
            !allSet
          }.toVector
          state.update(bits)
          out.iterator
      }
  }

  /** Convenience wrapper over a documents-schema DataFrame (doc_id, text). */
  def bloomDedupDocs(docs: DataFrame, numBits: Int = 1 << 20,
      numHashes: Int = 5, buckets: Int = 64): DataFrame = {
    import docs.sparkSession.implicits._
    bloomDedupStream(
      docs.selectExpr("CAST(doc_id AS LONG) AS _1", "text AS _2").as[(Long, String)],
      numBits, numHashes, buckets).toDF("doc_id", "text")
  }

  // -- streaming NEAR-dup admission against the materialized LSH index -------
  // bloomDedupStream gates EXACT duplicates with bounded in-stream state;
  // this gates NEAR duplicates with the state held in the LSH index on
  // disk (graft.operators.Dedup.writeLshIndex) — the live-ingest twin of
  // batch dedupNear, same frozen-artifact discipline as the incremental
  // IVF build.

  /** One micro-batch of near-dup admission: drop docs with a ≥tau match in
    * the index; within the batch keep a doc only if NO smaller-id
    * batch-mate is within tau (a deterministic, conservative keep-first —
    * a transitive chain may drop more than a strict sequential scan, never
    * fewer); append the admitted docs to the index AND to `acceptedPath`.
    *
    * Replay-idempotent admission: a crash-replayed batch re-probes and
    * finds its OWN previously-appended rows at Jaccard 1.0, so it admits
    * nothing the second time — at-least-once delivery cannot double-admit
    * a document (the index gains no duplicate rows; only the at-most-one
    * uncommitted `acceptedPath` write can need compaction). */
  def admitBatch(indexPath: String, acceptedPath: String, tau: Double)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val b = batch.select(col("doc_id"), col("text"))
      .localCheckpoint() // three consumers; don't recompute the source
    val vsIndex = graft.operators.Dedup
      .nearDupAgainstIndex(spark, indexPath, b, tau)
      .select(col("doc_id")).distinct()
    val clean = b.join(vsIndex, Seq("doc_id"), "left_anti")
    val intraDrops = graft.operators.Dedup
      .minhashCandidates(clean)
      .filter(col("jaccard") >= tau)
      .select(greatest(col("doc_a"), col("doc_b")).as("doc_id")).distinct()
    val admitted = clean.join(intraDrops, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    graft.operators.Dedup.writeLshIndex(admitted, indexPath, mode = "append")
    admitted.write.mode("append").parquet(acceptedPath)
    org.apache.spark.sql.GraftSql.releaseCheckpointBlocks(admitted)
    org.apache.spark.sql.GraftSql.releaseCheckpointBlocks(b)
  }

  /** Starts near-dup-gated admission over a streaming (doc_id, text) frame.
    * `indexPath` must hold an existing index (build it over the seed corpus
    * with `Dedup.writeLshIndex` first); admitted docs land at
    * `acceptedPath` and become probe-visible to every later batch. */
  def startNearDupAdmission(docs: DataFrame, indexPath: String,
      acceptedPath: String, checkpoint: String,
      tau: Double): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(admitBatch(indexPath, acceptedPath, tau) _)
      .start()
}
