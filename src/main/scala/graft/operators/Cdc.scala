package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  /** Recover from a swap interrupted mid-rename: a dir named
    * `...=X__old` beside a live `...=X` means the swap completed (drop the
    * aside); an `__old` with NO live sibling means the crash hit between
    * the two renames (rename it back). Run before any read/list of the
    * table so partition discovery never sees a phantom `X__old` value. */
  private def recoverAsides(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit =
    if (fs.exists(root))
      fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.endsWith("__old")).foreach { aside =>
          val live = new org.apache.hadoop.fs.Path(root,
            aside.getName.stripSuffix("__old"))
          if (fs.exists(live)) fs.delete(aside, true)
          else require(fs.rename(aside, live), s"aside recovery failed: $aside")
        }

  def partitionedUpsert(spark: SparkSession, basePath: String,
      changes: DataFrame, key: String, partCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val affected = changes.select(col(partCol)).distinct()
    val fs = new Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAsides(fs, new Path(basePath))
    val base = spark.read.parquet(basePath)
    val touched = base.join(broadcast(affected), Seq(partCol), "left_semi")
    val staging = new Path(basePath + "__upserting")
    mergeByKey(touched, changes, key)
      .write.mode("overwrite").partitionBy(partCol).parquet(staging.toString)
    // one driver-side loop over TOUCHED partitions only (small by contract)
    affected.collect().map(_.get(0).toString).foreach { p =>
      val src = new Path(staging, s"$partCol=$p")
      val dst = new Path(basePath, s"$partCol=$p")
      // Rename-aside swap: the live dir is moved aside (one metadata op),
      // the staged dir renamed in, THEN the aside deleted. The live data
      // is never deleted before its replacement is in place — a crash at
      // any point leaves the partition in either `dst` or `dst__old`
      // (recoverable), and the reader-visible gap is two renames, not a
      // recursive delete.
      val aside = new Path(basePath, s"$partCol=${p}__old")
      fs.delete(aside, true) // stale leftover from a prior crashed swap
      if (fs.exists(dst))
        require(fs.rename(dst, aside), s"upsert aside failed for $dst")
      if (fs.exists(src))
        require(fs.rename(src, dst), s"upsert swap failed for $dst")
      // else: every row of the partition was deleted — dst stays removed
      fs.delete(aside, true)
    }
    fs.delete(staging, true)
  }

  /** Small-file compaction for a partitioned table — the maintenance job
    * every streaming/CDC sink eventually needs: repeated upserts and
    * micro-batch appends leave partitions with dozens of small parquet
    * files, and scan cost grows with file count (footer reads, task
    * scheduling) rather than data volume. Policy: any partition holding
    * more than `maxFiles` data files is rewritten to `targetFiles`
    * file(s); partitions at or under the threshold are NOT touched — their
    * files stay byte-identical, so concurrent readers of cold partitions
    * never see churn. Same staging + rename-ASIDE discipline as
    * [[partitionedUpsert]]: readers see whole-old or whole-new, never a
    * half-written dir; the only visibility gap is the two-rename metadata
    * window (no distributed delete sits between them), and a crash at any
    * point is repaired by [[recoverAsides]] on the next maintenance run. The
    * driver loop touches only the affected partition list — at 100 TB the
    * rewrite itself is a distributed job per the normal write path; only
    * the rename is driver-side. Returns (partition, files_before,
    * files_after) for the audit log. */
  def compactPartitions(spark: SparkSession, basePath: String,
      partCol: String, maxFiles: Int, targetFiles: Int = 1): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val root = new Path(basePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAsides(fs, root)
    val parts = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith(s"$partCol="))
    def dataFiles(p: Path): Int =
      fs.listStatus(p).count(f => f.isFile && !f.getPath.getName.startsWith("_")
        && !f.getPath.getName.startsWith("."))
    val crowded = parts.map(p => p -> dataFiles(p)).filter(_._2 > maxFiles)
    val report = crowded.map { case (p, before) =>
      val staging = new Path(basePath + "__compacting", p.getName)
      spark.read.parquet(p.toString)
        .repartition(targetFiles)
        .write.mode("overwrite").parquet(staging.toString)
      // drop Spark's bookkeeping files so the swapped dir holds data only
      fs.listStatus(staging).map(_.getPath)
        .filter(f => f.getName.startsWith("_") || f.getName.startsWith("."))
        .foreach(f => fs.delete(f, false))
      // rename-aside, as in partitionedUpsert: live dir is moved aside and
      // only deleted AFTER the compacted dir is in place — a crash mid-swap
      // leaves the data in `p` or `p__old`, never only in staging.
      val aside = new Path(p.getParent, p.getName + "__old")
      fs.delete(aside, true)
      require(fs.rename(p, aside), s"compaction aside failed for $p")
      require(fs.rename(staging, p), s"compaction swap failed for $p")
      fs.delete(aside, true)
      (p.getName, before, dataFiles(p))
    }
    fs.delete(new Path(basePath + "__compacting"), true)
    report.toSeq.toDF("partition", "files_before", "files_after")
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

  // ==== q126: SCD2 validity-interval build ==================================
  //
  // The slowly-changing-dimension (type 2) construction: a per-key change
  // log becomes half-open validity intervals [valid_from, valid_to), the
  // open current version carrying valid_to = NULL. One lead() window over
  // the per-key change order — a single key shuffle, no self-join. Ties at
  // the same microsecond order by change id, producing the same zero-length
  // superseded intervals a warehouse build would.

  /** (key..., attrs..., valid_from, valid_to) from a change log. */
  def scd2Build(changes: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }

  // profile-change log derived from events: 'signup' and 'error' rows set
  // the user's profile value; everything else is fact traffic
  private def profileChanges(s: SparkSession, dir: String): DataFrame =
    graft.Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "error"))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))

  private def q126(s: SparkSession, dir: String): DataFrame =
    scd2Build(profileChanges(s, dir), "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id"),
        QueryDef.dec4(col("value")).as("value"),
        QueryDef.tsMicro(col("valid_from")).as("valid_from"),
        coalesce(QueryDef.tsMicro(col("valid_to")), lit("open"))
          .as("valid_to"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))

  private val q126Sql =
    """SELECT user_id, event_id,
      |  CAST(CAST(value AS DECIMAL(38,4)) AS VARCHAR) AS value,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
      |  coalesce(strftime(lead(ts, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S.%f'), 'open')
      |    AS valid_to
      |FROM events WHERE event_type IN ('signup', 'error')
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  // ==== q127: point-in-time (time-travel) join ==============================
  //
  // Each purchase joins the profile version VALID AT its event time —
  // the leakage-free feature lookup for training-data builds (joining the
  // current version leaks the future). Because SCD2 intervals PARTITION
  // each key's timeline, interval containment matches at most one version
  // per fact: a same-key band join needs no winner-selection rank pass.
  // The containment predicate evaluates on equi-joined (user) pairs —
  // per-key fan-out = that user's version count, never a cross product.

  /** Facts × the dimension version whose [valid_from, valid_to) covers the
    * fact time (left join; facts before any version survive unmatched). */
  def pointInTimeJoin(facts: DataFrame, scd2: DataFrame, keyCol: String,
      factTs: String): DataFrame = {
    val dim = scd2.withColumnRenamed(keyCol, s"__pit_$keyCol")
    facts.join(dim,
      facts(keyCol) === dim(s"__pit_$keyCol") &&
        dim("valid_from") <= facts(factTs) &&
        (dim("valid_to").isNull || facts(factTs) < dim("valid_to")),
      "left")
      .drop(s"__pit_$keyCol")
  }

  private def q127(s: SparkSession, dir: String): DataFrame = {
    val facts = graft.Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("value").as("amount"))
    val dim = scd2Build(profileChanges(s, dir), "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id").as("version_id"),
        col("value").as("profile_value"), col("valid_from"), col("valid_to"))
    pointInTimeJoin(facts, dim, "user_id", "p_ts")
      .select(col("p_id"), col("user_id"),
        coalesce(col("version_id"), lit(-1L)).as("version_id"),
        coalesce(QueryDef.dec4(col("profile_value")), lit("none"))
          .as("profile_value"))
      .orderBy(col("p_id"))
  }

  private val q127Sql =
    """WITH dim AS (
      |  SELECT user_id, event_id AS version_id, value AS profile_value,
      |    ts AS valid_from,
      |    lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS valid_to
      |  FROM events WHERE event_type IN ('signup', 'error')),
      |facts AS (
      |  SELECT user_id, event_id AS p_id, ts AS p_ts, value AS amount
      |  FROM events WHERE event_type = 'purchase')
      |SELECT f.p_id, f.user_id,
      |  coalesce(d.version_id, -1) AS version_id,
      |  coalesce(CAST(CAST(d.profile_value AS DECIMAL(38,4)) AS VARCHAR),
      |    'none') AS profile_value
      |FROM facts f LEFT JOIN dim d
      |  ON f.user_id = d.user_id AND d.valid_from <= f.p_ts
      |  AND (d.valid_to IS NULL OR f.p_ts < d.valid_to)
      |ORDER BY f.p_id""".stripMargin

  // ==== q172: snapshot diff — change DETECTION (the inverse of mergeByKey) ==
  //
  // Given two keyed snapshots, emit the I/U/D delta that turns old into
  // new — what a crawler without CDC hooks needs before it can feed
  // [[mergeByKey]]/[[partitionedUpsert]]. One hash-partitioned full-outer
  // join on the key; change detection compares md5 digests of the tracked
  // columns so wide rows never ship twice (digests are computed map-side,
  // the join carries key + 16-byte hashes). At 100 TB both snapshots
  // shuffle once on the key — the unavoidable lower bound for keyed diff —
  // and bucketing both snapshots by key removes even that (the
  // BucketingSpec co-location discipline).

  /** (key, op) ∈ I/U/D for rows added, digest-changed, or removed.
    * `tracked`: columns whose change constitutes an update. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      tracked: Seq[String]): DataFrame = {
    def digested(df: DataFrame, side: String) = df.select(col(key),
      // canonical JSON of the tracked struct: a separator-joined string
      // concat silently SKIPS null columns (("a", NULL) == ("a")) —
      // canonical_json (the A14 primitive) keeps nulls and boundaries
      md5(graft.canon.CanonicalJson(struct(tracked.map(col): _*)))
        .as(s"__d_$side"))
    digested(oldSnap, "old")
      .join(digested(newSnap, "new"), Seq(key), "full_outer")
      .select(col(key),
        when(col("__d_old").isNull, lit("I"))
          .when(col("__d_new").isNull, lit("D"))
          .when(col("__d_old") =!= col("__d_new"), lit("U")))
      .toDF(key, "op")
      .filter(col("op").isNotNull)
  }

  private def q172(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // the same deterministic delta corpus as q106, applied — then diffed
    // back against the original: the detector must recover exactly the
    // I/U/D set that produced the new snapshot
    val next = mergeByKey(docs, changesOf(docs), "doc_id")
    snapshotDiff(docs, next, "doc_id", Seq("text", "n_chars", "source"))
      .groupBy(col("op")).agg(count(lit(1)).as("n"),
        sum(col("doc_id")).as("sum_keys"))
      .orderBy(col("op"))
  }

  private val q172Sql =
    """WITH changes AS (
      |  SELECT doc_id, text || ' [rev2]' AS text, n_chars + 7 AS n_chars,
      |    source, 'U' AS op FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id, text, n_chars, source, 'D' FROM documents
      |  WHERE doc_id % 10 = 1
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, n_chars, 'patch', 'I' FROM documents
      |  WHERE doc_id % 10 = 2)
      |SELECT op, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_keys
      |FROM changes GROUP BY op ORDER BY op""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q106_merge_upsert", q106, Some(q106Sql)),
    QueryDef("q126_scd2_build", q126, Some(q126Sql)),
    QueryDef("q127_pit_join", q127, Some(q127Sql)),
    QueryDef("q172_snapshot_diff", q172, Some(q172Sql)))
}
