package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over `events` (SURVEY.md §2 B34/B35 batch
  * equivalents). The streaming twins (watermarks, session_window,
  * dropDuplicatesWithinWatermark) live in graft.streaming and are checked by
  * batch-parity tests, not oracle hashes.
  */
object EventsOps {

  // -- B35 batch shape: gap-based sessionization (30-min gap) ----------------
  // lag-gap → running sum of session starts → per-session rollup. Gap math in
  // integer microseconds (unix_micros / epoch_us) — bit-stable cross-engine.
  private def q35(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        QueryDef.tsMicro(min(col("ts"))).as("session_start"),
        QueryDef.tsMicro(max(col("ts"))).as("session_end"),
        QueryDef.dec4(sum(col("value"))).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private val q35Sql =
    """SELECT user_id, session_id, count(*) AS n_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      |  CAST(CAST(sum(value) AS DECIMAL(38,4)) AS VARCHAR) AS session_value
      |FROM (SELECT user_id, ts, value,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (SELECT *, CASE WHEN prev_us IS NULL
      |        OR epoch_us(ts) - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
      |    FROM (SELECT *, lag(epoch_us(ts), 1) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |      FROM events)))
      |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // -- B34 batch shape: tumbling 1-hour window aggregation -------------------
  private def q36(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), QueryDef.dec4(sum(col("value"))).as("total_value"))
      .select(QueryDef.tsSec(col("window.start")).as("hour_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("hour_start"), col("event_type"))

  private val q36Sql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |  event_type, count(*) AS n,
      |  CAST(CAST(sum(value) AS DECIMAL(38,4)) AS VARCHAR) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- B34 batch shape: SLIDING 1-hour window, 15-minute slide ---------------
  // Spark assigns each event to the 4 overlapping windows whose [start,
  // start+1h) half-open span covers it, starts aligned to the epoch in 15-min
  // steps. DuckDB reproduces the expansion with a cross join against
  // range(4): window k's start = 15-min-floor(ts) − k·15min (integer-µs
  // arithmetic on both sides — bit-stable).
  private def q57(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), QueryDef.dec4(sum(col("value"))).as("total_value"))
      .select(QueryDef.tsSec(col("window.start")).as("win_start"),
        col("n"), col("total_value"))
      .orderBy(col("win_start"))

  private val q57Sql =
    """SELECT strftime(make_timestamp(
      |    epoch_us(ts) // 900000000 * 900000000 - k * 900000000),
      |    '%Y-%m-%d %H:%M:%S') AS win_start,
      |  count(*) AS n,
      |  CAST(CAST(sum(value) AS DECIMAL(38,4)) AS VARCHAR) AS total_value
      |FROM events, range(4) t(k)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- keyless interval-overlap join (B51 batch shape) -----------------------
  // Attention-window attribution: every view opens a 30-minute interval,
  // every click a 5-minute one; count the concurrent clicks per view —
  // across ALL users, so there is NO equi key and the naive plan is a
  // cartesian product. The engine runs the binned equi-shuffle join
  // (Joins.intervalOverlapJoin, 15-minute bins, canonical-bin dedup);
  // DuckDB verifies with its native inequality join over the same integer
  // microsecond bounds.
  private def q101(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("l_id"),
        unix_micros(col("ts")).as("l_start"),
        (unix_micros(col("ts")) + 1800L * 1000000L).as("l_end"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("r_id"),
        unix_micros(col("ts")).as("r_start"),
        (unix_micros(col("ts")) + 300L * 1000000L).as("r_end"))
    val agg = Joins.intervalOverlapJoin(views, clicks,
      binWidth = 900L * 1000000L)
      .groupBy(col("l_id"))
      .agg(count(lit(1)).as("n_overlaps"), min(col("r_id")).as("first_overlap"))
    views.select(col("l_id")).join(agg, Seq("l_id"), "left")
      .select(col("l_id").as("view_id"),
        coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"),
        coalesce(col("first_overlap"), lit(-1L)).as("first_overlap"))
      .orderBy(col("view_id"))
  }

  private val q101Sql =
    """WITH v AS (
      |  SELECT event_id AS l_id, epoch_us(ts) AS vs,
      |    epoch_us(ts) + 1800 * 1000000 AS ve
      |  FROM events WHERE event_type = 'view'),
      |c AS (
      |  SELECT event_id AS r_id, epoch_us(ts) AS cs,
      |    epoch_us(ts) + 300 * 1000000 AS ce
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT l_id, count(*) AS n_overlaps, min(r_id) AS first_overlap
      |  FROM v JOIN c ON v.vs < c.ce AND c.cs < v.ve GROUP BY 1)
      |SELECT v.l_id AS view_id,
      |  CAST(coalesce(n_overlaps, 0) AS BIGINT) AS n_overlaps,
      |  CAST(coalesce(first_overlap, -1) AS BIGINT) AS first_overlap
      |FROM v LEFT JOIN p USING (l_id) ORDER BY view_id""".stripMargin

  // ==== q112: ordered funnel analysis (view → click → purchase) =============
  //
  // A stage counts only if it happens STRICTLY after the previous stage's
  // first completion — max(type='click') alone would count a click that
  // preceded every view. Running conditional minima over the per-user
  // event order carry "first view so far" / "first qualifying click so
  // far" past each row, so the whole funnel is two chained window minima +
  // one rollup: a single shuffle by user_id (the groupBy reuses the
  // window's partitioning), no per-user event-list materialization, holds
  // at any events scale. Time math in integer microseconds (bit-stable
  // cross-engine, the q35 discipline).

  /** Per-user funnel flags over an ordered stage list. events needs
    * (user_id, event_id, ts, event_type). */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events.withColumn("us", unix_micros(col("ts")))
    // qual(i) = row completes stage i; first(i) = earliest completion so far
    val withFirsts = stages.zipWithIndex.foldLeft(base) { case (df, (stage, i)) =>
      val qual = if (i == 0) col("event_type") === stage
        else col("event_type") === stage &&
          col(s"first${i - 1}").isNotNull && col("us") > col(s"first${i - 1}")
      df.withColumn(s"qual$i", qual)
        .withColumn(s"first$i", min(when(col(s"qual$i"), col("us"))).over(w))
    }
    val flags = stages.indices.map(i =>
      max(when(col(s"qual$i"), 1).otherwise(0)).as(s"reached_${stages(i)}"))
    withFirsts.groupBy(col("user_id")).agg(flags.head, flags.tail: _*)
  }

  private def q112(s: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(s, dir), Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))

  private val q112Sql =
    """WITH base AS (
      |  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us FROM events),
      |v AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first0
      |  FROM base),
      |c AS (SELECT *, min(CASE WHEN event_type = 'click'
      |      AND first0 IS NOT NULL AND us > first0 THEN us END) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first1
      |  FROM v)
      |SELECT user_id,
      |  max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS reached_view,
      |  max(CASE WHEN event_type = 'click' AND first0 IS NOT NULL
      |    AND us > first0 THEN 1 ELSE 0 END) AS reached_click,
      |  max(CASE WHEN event_type = 'purchase' AND first1 IS NOT NULL
      |    AND us > first1 THEN 1 ELSE 0 END) AS reached_purchase
      |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin

  // ==== q114: cohort retention ==============================================
  //
  // Users grouped by first-seen day (the cohort); for each later day
  // offset, how many of that cohort were active. Two aggregations, both
  // key-balanced: (user → first day) then ((cohort, offset) → distinct
  // users); the cohort table joins back on user_id — same-key shuffle,
  // no broadcast needed, no window over the whole event stream. Day math
  // on date_trunc only (no float), so the differential is byte-exact.

  /** (cohort_day, day_offset, n_users) retention matrix. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val day = to_date(col("ts"))
    val firstDay = events.select(col("user_id"), day.as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val active = events.select(col("user_id"), day.as("day")).distinct()
    active.join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  private def q114(s: SparkSession, dir: String): DataFrame =
    cohortRetention(Tables.events(s, dir))
      .select(QueryDef.tsDay(col("cohort_day")).as("cohort_day"),
        col("day_offset"), col("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))

  private val q114Sql =
    """WITH f AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      |  FROM events GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
      |  CAST(day - cohort_day AS BIGINT) AS day_offset,
      |  count(DISTINCT user_id) AS n_users
      |FROM a JOIN f USING (user_id)
      |GROUP BY f.cohort_day, day - cohort_day
      |ORDER BY 1, 2""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q114_cohort_retention", q114, Some(q114Sql)),
    QueryDef("q112_funnel", q112, Some(q112Sql)),
    QueryDef("q35_sessionization", q35, Some(q35Sql)),
    QueryDef("q36_tumbling_window", q36, Some(q36Sql)),
    QueryDef("q57_sliding_window", q57, Some(q57Sql)),
    QueryDef("q101_interval_join", q101, Some(q101Sql)))
}
