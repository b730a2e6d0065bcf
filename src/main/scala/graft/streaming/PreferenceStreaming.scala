package graft.streaming

import graft.operators.{Incremental, Preference}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming Bradley–Terry (B203) — incremental preference aggregation,
  * the streaming twin of [[graft.operators.Preference]] (q255). Duel
  * events (w, l) arrive in micro-batches; the maintained state is the
  * (w, l, c) duel matrix — pure sums, the B58 mergeable-partial
  * discipline — so a refresh is: partial-count the batch (tiny) + one
  * |items|²-bounded combine. The MM fixpoint then re-solves from that
  * domain-sized state and rewrites the current ranking; the corpus of
  * past duels is never rescanned.
  *
  * Exactly-once: the merge algebra is NOT idempotent (replaying a batch
  * would double its duel counts), so the applied batch id persists with
  * the state and a replayed batch is a no-op — the
  * [[Incremental.refreshState]] guard, applied to preference state. The
  * ranking rewrite sits OUTSIDE the guard: it is a pure function of the
  * state, so re-running it after a replayed (skipped) merge is
  * idempotent by construction.
  *
  * 100 TB shape: per batch, the only data-sized work is one map-side-
  * combined groupBy of the batch itself; state size is bounded by the
  * item-pair domain (|langs|², |models|², …), never by duel volume, and
  * the MM re-solve collects only that domain (the q255 contract).
  */
object PreferenceStreaming {

  /** One exactly-once fold of a duel batch into the (w, l, c) state at
    * `statePath`, guarded by a monotonic batch id (replay = no-op). */
  def refreshDuelState(spark: SparkSession, statePath: String,
      duels: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Incremental.recoverStateAside(fs, root)
    if (batchId <= Incremental.readAppliedBatch(fs, root)) return // replay
    val delta = Preference.duelState(duels)
    val next = if (fs.exists(root))
      Preference.mergeDuelState(spark.read.parquet(statePath), delta)
    else delta
    val staging = new Path(statePath + "__refreshing")
    next.write.mode("overwrite").parquet(staging.toString)
    // the applied-batch id is stamped INTO the staging directory before
    // the swap (Incremental's discipline): the rename publishes duel
    // counts and id atomically, closing the crash window where merged
    // non-idempotent counts could replay unstamped and double-count
    Incremental.writeAppliedBatch(fs, staging, batchId)
    Incremental.swapStateAside(fs, root, staging)
    fs.delete(new Path(statePath + "__applied_batch"), false) // legacy
  }

  /** Live preference ranking: every micro-batch of duel rows (w, l)
    * folds into the duel-matrix state, then the MM fixpoint re-solves
    * and the current (lang, wins, games, theta) ranking is rewritten at
    * `rankPath` — identical to the batch [[Preference.bradleyTerry]]
    * over all duels seen so far. */
  def startBradleyTerry(duels: DataFrame, statePath: String,
      rankPath: String, checkpoint: String): StreamingQuery =
    duels.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          refreshDuelState(s, statePath, batch.toDF(), id)
          Preference.rankingFromState(s.read.parquet(statePath))
            .write.mode("overwrite").parquet(rankPath)
        }
      }
      .start()
}
