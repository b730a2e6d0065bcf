package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed MERGE / upsert over snapshot tables — the change-data-capture
  * primitive for a corpus that receives revisions: re-crawled documents
  * replace their previous version, takedowns delete, new crawls insert
  * (reference scope: versioned re-ingestion, A31, lifted from whole-corpus
  * replay to keyed deltas).
  *
  * MERGE is usually written as a full-outer join — which Spark can ONLY
  * execute as a sort-merge join, shuffling the full base table no matter
  * how small the delta is. This formulation never shuffles the base:
  *
  *   survivors = base ANTI JOIN change-keys     (broadcastable)
  *   merged    = survivors UNION non-delete changes
  *
  * which is semantically identical for keyed upserts (U replaces its match,
  * I adds, D removes, an unmatched U degrades to insert) and turns the
  * whole merge into one broadcast hash anti-join over a single base scan.
  *
  * Contract: at most one change row per key (resolve conflicting deltas
  * upstream, e.g. with [[Dedup.resolveKeepers]]); `changes` carries the
  * base schema plus an `op` column in {"I","U","D"}.
  */
object Cdc {

  /** Apply keyed I/U/D changes to a snapshot. Returns the next snapshot. */
  def mergeByKey(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    require(changes.columns.toSet == base.columns.toSet + "op",
      s"changes must carry the base schema + op; got ${changes.columns.toSeq}")
    val changedKeys = changes.select(col(key))
    val survivors = base.join(broadcast(changedKeys), Seq(key), "left_anti")
    survivors.unionByName(changes.filter(col("op") =!= "D").drop("op"))
  }

  /** Partition-pruned upsert of a parquet table partitioned by `partCol`:
    * only the partitions the delta touches are read, merged and rewritten —
    * rewrite cost scales with touched data, not table size. Dynamic
    * partition overwrite leaves every untouched partition's files in place.
    *
    * The merged output is staged beside the table and swapped in with one
    * filesystem rename per touched partition (the compactIndex quiesce-
    * first discipline — Spark itself refuses an in-place overwrite of a
    * path being read). A partition fully emptied by deletes is removed.
    * Restriction (the usual hive-layout one): `partCol` is immutable under
    * updates — a row cannot move partitions, since its old partition would
    * not be rewritten. */
  def partitionedUpsert(spark: SparkSession, basePath: String,
      changes: DataFrame, key: String, partCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val affected = changes.select(col(partCol)).distinct()
    val base = spark.read.parquet(basePath)
    val touched = base.join(broadcast(affected), Seq(partCol), "left_semi")
    val staging = new Path(basePath + "__upserting")
    mergeByKey(touched, changes, key)
      .write.mode("overwrite").partitionBy(partCol).parquet(staging.toString)
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one driver-side loop over TOUCHED partitions only (small by contract)
    affected.collect().map(_.get(0).toString).foreach { p =>
      val src = new Path(staging, s"$partCol=$p")
      val dst = new Path(basePath, s"$partCol=$p")
      fs.delete(dst, true)
      if (fs.exists(src))
        require(fs.rename(src, dst), s"upsert swap failed for $dst")
      // else: every row of the partition was deleted — dst stays removed
    }
    fs.delete(staging, true)
  }

  /** Live CDC apply: every micro-batch of I/U/D changes upserts the
    * partitioned base table through [[partitionedUpsert]]. Keyed upserts
    * are idempotent (a replayed batch re-lands the table in the same
    * state), so checkpoint replay after a crash is safe — the same
    * at-least-once-with-idempotent-apply discipline as the ingestion
    * sink's ACK rebuild. Batches arrive serially (one foreachBatch at a
    * time), so the stage-and-swap rename window never races itself. */
  def startStreamingUpsert(changes: DataFrame, basePath: String, key: String,
      partCol: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          partitionedUpsert(batch.sparkSession, basePath, batch.toDF(), key, partCol)
      }
      .start()

  // ==== q106: one merge generation over documents ===========================
  //
  // The delta is derived deterministically from the corpus itself so the
  // oracle can rebuild it: doc_id%10==0 re-crawled (text revision),
  // %10==1 taken down, %10==2 spawns a new doc under a shifted id.

  private def changesOf(docs: DataFrame): DataFrame = {
    val u = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("text", concat(col("text"), lit(" [rev2]")))
      .withColumn("n_chars", col("n_chars") + 7)
      .withColumn("op", lit("U"))
    val d = docs.filter(col("doc_id") % 10 === 1).withColumn("op", lit("D"))
    val i = docs.filter(col("doc_id") % 10 === 2)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("source", lit("patch"))
      .withColumn("op", lit("I"))
    u.unionByName(d).unionByName(i)
  }

  private def q106(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    mergeByKey(docs, changesOf(docs), "doc_id")
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  private val q106Sql =
    """WITH chg AS (
      |  SELECT doc_id, text || ' [rev2]' AS text, lang, source,
      |    n_chars + 7 AS n_chars, 'U' AS op FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id, text, lang, source, n_chars, 'D'
      |  FROM documents WHERE doc_id % 10 = 1
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, lang, 'patch', n_chars, 'I'
      |  FROM documents WHERE doc_id % 10 = 2),
      |merged AS (
      |  SELECT doc_id, text, source, n_chars FROM documents
      |  WHERE doc_id NOT IN (SELECT doc_id FROM chg)
      |  UNION ALL
      |  SELECT doc_id, text, source, n_chars FROM chg WHERE op <> 'D')
      |SELECT doc_id, source, n_chars, md5(text) AS text_md5
      |FROM merged ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q106_merge_upsert", q106, Some(q106Sql)))
}
