package graft.operators

import graft.Tables
import graft.functions.BitmapExprs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact distinct-set algebra on block bitmaps (round 9, B154/B155) — the
  * audience-analytics kernel: "how many distinct users in segment A, in
  * A∩B, in the trailing 7 days" answered with word-wise bit operations on
  * fixed-size state instead of repeated COUNT(DISTINCT) shuffles of the
  * raw id stream (the Druid/ClickHouse `groupBitmap` design).
  *
  * Shape at 100 TB: ONE map-side-combined aggregation compresses the event
  * stream to (group, block) → 8 KiB bitmap rows — the only corpus-sized
  * pass. Every downstream question (cardinality, overlap matrix, rolling
  * union) then runs on the block DOMAIN (groups × occupied id blocks),
  * whose size is set by the id universe, not the event count: re-asking
  * with a different window or segment pairing never re-shuffles events.
  * Overlaps meet on a (block) equi-join of two already-compressed sides;
  * a rolling union is a map-side explode of ≤ window block rows + an
  * OR-merge — both embarrassingly partitionable by block.
  *
  * vs the sketch family: B11/B59's HLL answers the same questions
  * approximately in 2 KiB per group TOTAL; bitmaps pay numBits/8 bytes per
  * OCCUPIED block for exactness (dense id spaces — users, SKUs — occupy
  * few blocks). The engine carries both; the bitmap path is the one audit
  * and billing queries need.
  */
object Bitmaps {

  /** Bits per block bitmap (8 KiB state per occupied (group, block)). */
  val BlockBits = 65536

  /** (group..., block, bits): one bitmap per occupied id block per group.
    * `df` must already carry the `groupNames` columns; ids must be
    * non-negative (`div` truncation == floor only then, and the block
    * grid has no negative rooms). */
  def blockBitmaps(df: DataFrame, groupNames: Seq[String], id: Column): DataFrame = {
    // a negative id would silently land in the WRONG block (`div` truncates
    // toward zero while pmod wraps positive) — raise instead of corrupting
    val idl = when(id.cast("long") < 0,
      raise_error(concat(lit("bitmap ids must be non-negative: "),
        id.cast("string")))).otherwise(id.cast("long"))
    df.select(groupNames.map(col) :+ (idl.cast("long")).as("__id"): _*)
      .select(groupNames.map(col) :+
        expr(s"__id div ${BlockBits}L").as("block") :+
        pmod(col("__id"), lit(BlockBits.toLong)).as("off"): _*)
      .groupBy((groupNames :+ "block").map(col): _*)
      .agg(BitmapExprs.bitmapAgg(col("off"), BlockBits).as("bits"))
  }

  /** Pairwise segment overlap: (seg_a < seg_b, n_a, n_b, n_both, jaccard).
    * Zero-overlap pairs are reported too (the matrix is complete over the
    * segment domain — segments × segments rows, the output's own size). */
  def overlapMatrix(df: DataFrame, segCol: String, idCol: String): DataFrame = {
    val bm = blockBitmaps(df.select(col(segCol).as("seg"), col(idCol)),
      Seq("seg"), col(idCol))
    val sizes = bm.groupBy(col("seg"))
      .agg(sum(BitmapExprs.bitCount(col("bits"))).as("n"))
    val both = bm.toDF("seg_a", "block", "bits_a")
      .join(bm.toDF("seg_b", "block", "bits_b"), Seq("block"))
      .where(col("seg_a") < col("seg_b"))
      .groupBy(col("seg_a"), col("seg_b"))
      .agg(sum(BitmapExprs.andCount(col("bits_a"), col("bits_b"))).as("n_both"))
    sizes.toDF("seg_a", "n_a")
      .join(sizes.toDF("seg_b", "n_b"), col("seg_a") < col("seg_b"))
      .join(both, Seq("seg_a", "seg_b"), "left")
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        coalesce(col("n_both"), lit(0L)).as("n_both"))
      .withColumn("jaccard", QueryDef.dec4(col("n_both").cast("double") /
        (col("n_a") + col("n_b") - col("n_both")).cast("double")))
  }

  /** Per-day exact distinct ids: same-day (`users_1d`) and trailing
    * `windowDays` (`users_7d` at the default) — EXACT rolling distinct,
    * the bitmap answer to q139's rolling-HLL estimate. Each day's block
    * bitmaps explode to the ≤`windowDays` day-windows they belong to
    * (slim block rows, map-side) and OR-merge per (day, block); no day
    * ever re-reads another day's raw events. Days with no events anchor
    * no output row (same as the oracle's day domain). */
  def rollingDistinct(events: DataFrame, idCol: String,
      windowDays: Int = 7): DataFrame = {
    val daily = blockBitmaps(
      events.select(to_date(col("ts")).as("day"), col(idCol)),
      Seq("day"), col(idCol))
    val days = daily.select(col("day")).distinct()
    val contrib = daily
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("i"),
        col("day"), col("block"), col("bits"))
      .select(date_add(col("day"), col("i")).as("day"), col("block"), col("bits"))
      .join(days, Seq("day"), "left_semi") // clip windows past the last day
    val rolling = contrib.groupBy(col("day"), col("block"))
      .agg(BitmapExprs.bitmapMergeAgg(col("bits")).as("bits"))
      .groupBy(col("day"))
      .agg(sum(BitmapExprs.bitCount(col("bits"))).as("users_7d"))
    val oneDay = daily.groupBy(col("day"))
      .agg(sum(BitmapExprs.bitCount(col("bits"))).as("users_1d"))
    oneDay.join(rolling, Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("users_1d"), col("users_7d"))
  }

  // ==== q221: segment audience overlap matrix ===============================

  private def q221(s: SparkSession, dir: String): DataFrame =
    overlapMatrix(Tables.events(s, dir), "event_type", "user_id")
      .orderBy(col("seg_a"), col("seg_b"))

  // the oracle recomputes every overlap from the raw distinct pairs — the
  // differential proves the block-bitmap algebra, not a replay
  private val q221Sql =
    """WITH s AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
      |sz AS (SELECT t, count(*) AS n FROM s GROUP BY t),
      |b AS (
      |  SELECT a.t AS seg_a, b.t AS seg_b, count(*) AS n_both
      |  FROM s a JOIN s b ON a.u = b.u AND a.t < b.t
      |  GROUP BY 1, 2)
      |SELECT x.t AS seg_a, y.t AS seg_b, x.n AS n_a, y.n AS n_b,
      |  COALESCE(b.n_both, 0) AS n_both,
      |  CAST(CAST(CAST(COALESCE(b.n_both, 0) AS DOUBLE) /
      |    CAST(x.n + y.n - COALESCE(b.n_both, 0) AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS jaccard
      |FROM sz x JOIN sz y ON x.t < y.t
      |LEFT JOIN b ON b.seg_a = x.t AND b.seg_b = y.t
      |ORDER BY seg_a, seg_b""".stripMargin

  // ==== q223: rolling 7-day exact distinct users ============================

  private def q223(s: SparkSession, dir: String): DataFrame =
    rollingDistinct(Tables.events(s, dir), "user_id", windowDays = 7)
      .orderBy(col("day"))

  private val q223Sql =
    """WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
      |d AS (SELECT DISTINCT day FROM e)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day,
      |  count(DISTINCT CASE WHEN e.day = d.day THEN e.user_id END) AS users_1d,
      |  count(DISTINCT e.user_id) AS users_7d
      |FROM d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
      |GROUP BY d.day ORDER BY day""".stripMargin

  // ==== q224: distinct-count cube from ONE fine-grain bitmap pass ===========
  //
  // The payoff of mergeable distinct state: COUNT(DISTINCT) under GROUPING
  // SETS normally re-expands the raw data once per grouping (Spark's
  // distinct-over-cube plan does exactly that). Here the event stream is
  // compressed ONCE to (type, day, block) bitmaps; every coarser level —
  // per type, per day, grand total — is a word-wise OR re-aggregation of
  // those domain-sized rows. At 100 TB the raw scan happens once; adding
  // another rollup level costs only bitmap-domain work. (HLL state, B59,
  // composes the same way approximately; bitmaps make the cube EXACT.)

  /** Exact distinct `idCol` at four levels: (type, day), (type), (day),
    * and overall — from one fine-grain bitmap build. */
  def distinctCube(events: DataFrame, typeCol: String, idCol: String): DataFrame = {
    val bm = blockBitmaps(
      events.select(col(typeCol).as("t"), to_date(col("ts")).as("d"), col(idCol)),
      Seq("t", "d"), col(idCol))
    val day = date_format(col("d"), "yyyy-MM-dd")
    def cnt = sum(BitmapExprs.bitCount(col("bits"))).as("n_users")
    val fine = bm.groupBy(col("t"), col("d")).agg(cnt)
      .select(col("t"), day.as("day"), col("n_users"))
    val byType = bm.groupBy(col("t"), col("block"))
      .agg(BitmapExprs.bitmapMergeAgg(col("bits")).as("bits"))
      .groupBy(col("t")).agg(cnt)
      .select(col("t"), lit(null).cast("string").as("day"), col("n_users"))
    val byDay = bm.groupBy(col("d"), col("block"))
      .agg(BitmapExprs.bitmapMergeAgg(col("bits")).as("bits"))
      .groupBy(col("d")).agg(cnt)
      .select(lit(null).cast("string").as("t"), day.as("day"), col("n_users"))
    val total = bm.groupBy(col("block"))
      .agg(BitmapExprs.bitmapMergeAgg(col("bits")).as("bits"))
      .agg(cnt)
      .select(lit(null).cast("string").as("t"),
        lit(null).cast("string").as("day"), col("n_users"))
    fine.unionAll(byType).unionAll(byDay).unionAll(total)
      .withColumnRenamed("t", "event_type")
  }

  private def q224(s: SparkSession, dir: String): DataFrame =
    distinctCube(Tables.events(s, dir), "event_type", "user_id")
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("day"))

  private val q224Sql =
    """WITH e AS (
      |  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |    user_id
      |  FROM events)
      |SELECT event_type, day, count(DISTINCT user_id) AS n_users
      |FROM e
      |GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
      |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin

  // ==== q267: registered bitmap state serving COUNT(DISTINCT) ==============
  //
  // The bench-visible face of the B163 rewrite (plan-asserted in
  // BitmapRewriteSpec): the dashboard query is written as a plain
  // countDistinct over the base table, and the injected optimizer rule
  // answers it from the maintained block-bitmap parquet instead — the
  // state-serving path is therefore timed every round next to q224's
  // recompute-from-events path. State is built once per (sf dir, events
  // fingerprint) under /tmp and reused across iterations, so min-of-N
  // bench timings measure the SERVE cost, not the build.

  /** Root for the maintained state, keyed by the events file fingerprint
    * so a regenerated sf dir can never serve stale bitmaps. The
    * fingerprint hashes every file's (relative name, length, mtime)
    * TUPLE — summing lengths+mtimes collides when a regenerated dataset
    * lands identical sizes within mtime granularity. Superseded state
    * roots for the same sf dir are deleted on rollover so /tmp does not
    * accumulate one abandoned tree per fingerprint. */
  private def stateRoot(dir: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    walk(new java.io.File(s"$dir/events.parquet")).foreach(f =>
      md.update(s"${f.getName}|${f.length}|${f.lastModified}\n"
        .getBytes("UTF-8")))
    val sig = md.digest().take(8).map("%02x".format(_)).mkString
    val prefix = s"graft_bmreg_${Integer.toHexString(dir.hashCode)}_"
    val tmp = new java.io.File("/tmp")
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmTree)
      f.delete(): Unit
    }
    Option(tmp.listFiles((_, n) => n.startsWith(prefix) &&
      n != s"$prefix$sig")).foreach(_.foreach(rmTree))
    s"/tmp/$prefix$sig"
  }

  /** Build-or-reuse the (event_type, day) bitmap state over a projected
    * copy of events, register it, and return the per-type distinct-user
    * rollup — which the B163 rule rewrites to a bitmap OR-merge scan. */
  def registeredDashboard(s: SparkSession, dir: String): DataFrame = {
    val root = stateRoot(dir)
    val base = s"$root/base"
    val state = s"$root/state"
    val ok = new java.io.File(s"$root/_OK")
    if (!ok.exists) {
      Tables.events(s, dir)
        .select(col("event_type"), QueryDef.tsDay(col("ts")).as("day"),
          col("user_id"))
        .write.mode("overwrite").parquet(base)
      blockBitmaps(s.read.parquet(base), Seq("event_type", "day"),
        col("user_id"))
        .write.mode("overwrite").parquet(state)
      ok.createNewFile()
    }
    graft.plans.BitmapStateRegistry.register(
      base, state, Seq("event_type", "day"), "user_id")
    s.read.parquet(base).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  private def q267(s: SparkSession, dir: String): DataFrame =
    registeredDashboard(s, dir).orderBy(col("event_type"))

  // the oracle recomputes from raw events — the differential proves the
  // maintained state serves the SAME answer the direct plan would
  private val q267Sql =
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q221_bitmap_overlap", q221, Some(q221Sql)),
    QueryDef("q223_rolling_distinct", q223, Some(q223Sql)),
    QueryDef("q224_distinct_cube", q224, Some(q224Sql)),
    QueryDef("q267_bitmap_dashboard", q267, Some(q267Sql)))
}
