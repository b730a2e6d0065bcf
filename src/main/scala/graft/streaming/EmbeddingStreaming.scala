package graft.streaming

import graft.operators.AnnIvf
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming embedding ingest (SURVEY.md §2 B31/B37 extension): the
  * incremental IVF index build a live pipeline needs.
  *
  * A production embedding store doesn't rebuild its ANN index per batch —
  * new vectors quantize to int8, assign to their (frozen) centroid cell,
  * and APPEND into the cell-partitioned parquet layout, all inside
  * `foreachBatch`. Search code is unchanged: the index directory simply
  * grows new files under the probed `cell=` directories, and
  * [[AnnIvf.topKQuantized]] answers over batch-built and incrementally-
  * built indexes identically (StreamingSpec parity test).
  *
  * Centroids are FROZEN at stream start — the standard IVF discipline:
  * cell geometry must not move under an existing index (a re-assignment
  * would orphan already-written rows), so drift is handled by an offline
  * re-train + rebuild, not in-stream.
  *
  * Delivery: the streaming checkpoint gives each micro-batch an id and
  * replays only uncommitted batches, so rows append at-least-once (a crash
  * between the parquet commit and the checkpoint commit can replay one
  * batch). The quantized rows are deterministic per vec_id, so replayed
  * duplicates are exact copies; `topKQuantized` drops duplicate
  * (qid, vec_id) survivors before the final ranking, so a replayed vector
  * cannot occupy two of the k result ranks (it does consume stage-1
  * rerank headroom). [[compactIndex]] reclaims the duplicate storage and
  * re-collapses to one file per cell when an index lives through many
  * crash-replays or many small appends.
  */
object EmbeddingStreaming {

  /** One micro-batch: quantize + assign (the SAME map-side frame the batch
    * index build writes) and append under the cell directories. The
    * repartition keeps one writer per cell so a batch adds one file per
    * touched cell, not `tasks × cells` fragments. */
  def appendBatch(indexPath: String, centroids: Array[Seq[Double]])(
      batch: DataFrame, batchId: Long): Unit =
    AnnIvf.quantizeAssign(batch, centroids)
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(indexPath)

  /** Starts the incremental index build over a streaming (vec_id, v) frame.
    * `checkpoint` carries the batch ledger — resuming the stream after a
    * crash continues from the last committed batch. */
  def startIndexStream(embeddings: DataFrame, centroids: Array[Seq[Double]],
      indexPath: String, checkpoint: String): StreamingQuery =
    embeddings.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(appendBatch(indexPath, centroids) _)
      .start()

  /** Compacts an incrementally-built index in place: keep-first dedupe on
    * `vec_id` (crash-replayed rows are exact copies — quantization and cell
    * assignment are deterministic per vector — so "first" is any survivor)
    * plus a one-file-per-cell rewrite that collapses the one-file-per-
    * (batch, cell) fragments a long-lived stream accumulates. Search
    * answers are unchanged; stage-1 rerank headroom and file-open counts
    * recover.
    *
    * Runs read-then-swap: the compacted copy materializes beside the live
    * index, then replaces it via filesystem rename. Call it from the
    * maintenance window between stream restarts — the swap is NOT atomic
    * against a concurrent `appendBatch` (a batch landing between delete and
    * rename would be lost), which is the same quiesce-first discipline as
    * the offline centroid re-train this scaladoc's header prescribes. */
  def compactIndex(spark: SparkSession, indexPath: String): Unit = {
    val tmp = new Path(indexPath + "__compacting")
    val dst = new Path(indexPath)
    spark.read.parquet(indexPath)
      .dropDuplicates("vec_id")
      // one writer per cell → exactly one file per cell directory (the
      // batch build's layout); a 100 TB compaction would salt giant cells
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(tmp.toString)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    require(fs.rename(tmp, dst),
      s"compaction swap failed: $tmp could not replace $dst")
  }
}
