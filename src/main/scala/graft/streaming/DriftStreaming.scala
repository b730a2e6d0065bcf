package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor (round 7, B101): every micro-batch
  * of an incoming value stream is KS-tested against a fixed reference
  * sample, and the per-batch statistic + alarm lands in an append-only
  * audit table — the data-quality tripwire in front of a training-data
  * ingest (a upstream schema change or unit mixup shows up as a
  * distribution jump long before any model metric moves).
  *
  * Reuses the EXACT two-sample KS machinery (`Profiling.ksDrift`: dual-
  * count histogram + distributed prefix scan — no global sort), so the
  * alarm threshold is compared against the true statistic, not a sketch.
  * Scale notes: the reference should arrive pre-cached (it is re-read per
  * batch); its first fold inside ksDrift collapses it to its distinct-value
  * histogram, so a 100 TB deployment passes the persisted histogram, not
  * raw rows. Batch results append as one row each — the audit table grows
  * with batch count, not data volume.
  */
object DriftStreaming {

  /** Shared audit loop: per non-empty micro-batch, pool the batch with
    * the reference and append one `audit(pooled, id)` row to `outPath`.
    * All three drift monitors (KS, W1, CvM) ride this shape — they are
    * the same distinct-value-histogram machinery with different readouts,
    * so the batch operators ARE the per-batch statistic (row-for-row
    * parity with a direct batch run is the spec'd law). */
  private def startMonitor(values: DataFrame, reference: DataFrame,
      outPath: String, checkpoint: String)(
      audit: (DataFrame, Long) => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    values.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          val combined = reference.select(col("v"), lit(true).as("is_ref"))
            .unionByName(batch.toDF().select(col("v"), lit(false).as("is_ref")))
          audit(combined, id).coalesce(1)
            .write.mode("append").parquet(outPath)
        }
      }
      .start()

  /** Start monitoring `values` (streaming, column `v`) against `reference`
    * (batch, column `v`). Appends (batch_id, n_ref, n_batch, ks, alarm)
    * rows under `outPath`. */
  def startDriftMonitor(values: DataFrame, reference: DataFrame,
      threshold: Double, outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMonitor(values, reference, outPath, checkpoint) { (pooled, id) =>
      graft.operators.Profiling.ksDrift(pooled, "v", col("is_ref"))
        .select(lit(id).as("batch_id"), col("n_a").as("n_ref"),
          col("n_b").as("n_batch"), col("ks"),
          (col("ks") > threshold).as("alarm"))
    }

  /** Wasserstein-1 twin (B190s): per-batch earth-mover distance vs the
    * reference — the magnitude-sensitive complement to KS's max-gap
    * (a small uniform shift moves W1 linearly but barely moves KS).
    * Appends (batch_id, n_ref, n_batch, w1, alarm); `threshold` is in
    * value units. */
  def startW1Monitor(values: DataFrame, reference: DataFrame,
      threshold: Double, outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMonitor(values, reference, outPath, checkpoint) { (pooled, id) =>
      graft.operators.Profiling.wassersteinDrift(pooled, "v", col("is_ref"))
        .select(lit(id).as("batch_id"), col("n_a").as("n_ref"),
          col("n_b").as("n_batch"),
          col("w1").cast("double").as("w1"),
          (col("w1").cast("double") > threshold).as("alarm"))
    }

  /** Anderson–Darling twin (B265s): per-batch tail-weighted CDF-gap
    * statistic vs the reference — the alarm for contamination or
    * truncation that concentrates in the tails, where KS/CvM/W1 weight
    * least. Appends (batch_id, n_ref, n_batch, a2, alarm). */
  def startAdMonitor(values: DataFrame, reference: DataFrame,
      threshold: Double, outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMonitor(values, reference, outPath, checkpoint) { (pooled, id) =>
      graft.operators.Profiling.andersonDarling(pooled, "v", col("is_ref"))
        .select(lit(id).as("batch_id"), col("n_a").as("n_ref"),
          col("n_b").as("n_batch"), col("a2"),
          (col("a2") > threshold).as("alarm"))
    }

  /** Language-mix monitor (B286): every micro-batch of arriving documents
    * is language-identified against FIXED profiles (B275's closed-form NB,
    * trained once upstream) and the batch's language histogram is
    * PSI-compared to a reference mix — the crawl-composition tripwire: a
    * source flips language, a boilerplate explosion shifts the mix, and
    * the alarm fires batches before any per-language corpus statistic is
    * computed on the wrong denominator. The monitored quantity is a MODEL
    * OUTPUT, so this composes B275's scorer inside the audit loop rather
    * than reading a raw column. Appends (batch_id, n_ref, n_batch,
    * n_langs, psi_micro, alarm); threshold in micro-nats (the standard
    * "investigate" line 0.2 ≈ 200000). Scale notes: profiles are L×65
    * rows (broadcast); the per-batch histogram is language-domain; the
    * reference mix arrives as counts, not rows. */
  def startLangMixMonitor(docs: DataFrame, profiles: DataFrame,
      refMix: DataFrame, thresholdMicro: Long, outPath: String,
      checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          val langs = graft.operators.LangId.langId(batch.toDF(), profiles)
            .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
          graft.operators.LangId.langMixPsi(langs, refMix)
            .select(lit(id).as("batch_id"), col("n_ref"), col("n_batch"),
              col("n_langs"), col("psi_micro"),
              (col("psi_micro") > thresholdMicro).as("alarm"))
            .coalesce(1).write.mode("append").parquet(outPath)
        }
      }
      .start()

  /** Cluster-mix monitor (B300): every micro-batch of arriving embeddings
    * is assigned to FIXED k-means centroids (B296's integerized Lloyd,
    * trained once upstream) and the batch's cell histogram is PSI-compared
    * to a reference mix — the embedding-space composition tripwire: an
    * upstream encoder swap, a new content source, or a collapsing
    * embedding model shifts the cell mix batches before any cluster-keyed
    * statistic (SemDedup rates, per-cluster quality) reads the wrong
    * denominator. The monitored quantity is a MODEL OUTPUT (the B286
    * discipline): B296's assignment composes inside the audit loop, and
    * the PSI kernel is LangId.langMixPsi verbatim (one smoothing/flooring
    * definition, cell ids as categories). Appends (batch_id, n_ref,
    * n_batch, n_cells, psi_micro, alarm); threshold in micro-nats (the
    * 0.2 "investigate" line ≈ 200000). Scale notes: assignment is per-row
    * expression work against k literal centroids (zero shuffle); the
    * per-batch histogram is cell-domain; centroids are k·dim driver
    * state, corpus-size-free. */
  def startClusterMixMonitor(emb: DataFrame,
      centroids: Array[Array[Double]], refMix: DataFrame,
      thresholdMicro: Long, outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    emb.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          val cells = graft.operators.Clustering.withCellDist(
            graft.operators.Clustering.intVecs(batch.toDF()), centroids)
            .groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
            .select(col("cell").cast("string").as("lang"), col("cnt"))
          graft.operators.LangId.langMixPsi(cells,
            refMix.select(col("cell").cast("string").as("lang"), col("cnt")))
            .select(lit(id).as("batch_id"), col("n_ref"), col("n_batch"),
              col("n_langs").as("n_cells"), col("psi_micro"),
              (col("psi_micro") > thresholdMicro).as("alarm"))
            .coalesce(1).write.mode("append").parquet(outPath)
        }
      }
      .start()

  /** Cramér–von Mises twin (B220s): per-batch integrated squared CDF gap
    * vs the reference — catches distributed many-small-gap drift KS
    * underweights. Appends (batch_id, n_ref, n_batch, t, alarm). */
  def startCvmMonitor(values: DataFrame, reference: DataFrame,
      threshold: Double, outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMonitor(values, reference, outPath, checkpoint) { (pooled, id) =>
      graft.operators.Profiling.cramerVonMises(pooled, "v", col("is_ref"))
        .select(lit(id).as("batch_id"), col("n_a").as("n_ref"),
          col("n_b").as("n_batch"), col("t"),
          (col("t") > threshold).as("alarm"))
    }
}
