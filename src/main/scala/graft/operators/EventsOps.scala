package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ==== q115: time-series gap fill + linear interpolation ===================
  //
  // Resample each user's activity onto a regular hourly grid and linearly
  // interpolate the hours with no events — the standard prep step before
  // feeding event streams to forecasting / feature pipelines. Grid rows are
  // generated per-user with `sequence` (bounded by the corpus time span, not
  // the row count, so the explode is safe at any event volume); the grid
  // left-joins the hourly rollup on its own key (same-key shuffle), and the
  // interpolation context comes from two frame-bounded window passes (last
  // non-null before / first non-null after) — no per-user event-list
  // materialization.
  //
  // Determinism: a naive double interpolation lands EXACTLY on dec4's
  // half-rounding boundary whenever the gap length divides a power of two
  // (frac i/16 → values ending …xxx5), and there the engines' ulp-level
  // summation-order noise decides the rounding direction (observed: 409 of
  // 105 171 rows at sf0.01). So the hourly sum is quantized once to integer
  // 1e-4 units (2-decimal inputs sit nowhere near THAT boundary) and the
  // interpolation + half-up rounding run entirely in 64-bit integer
  // arithmetic — bit-identical on any engine. Gap offsets are integer HOURS
  // (≤ corpus span), so the worst numerator is ~1e8·span — no overflow.

  /** Per-user hourly series with gaps linearly interpolated (values carried
    * at 1e-4 resolution). Edge hours are always observed (the grid spans
    * each user's own [min, max] hour); values must be non-negative. */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(round(sum(col("value")) * 10000).cast("long").as("vq"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hour"))
    val before = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next observed" is the same running last-ignoreNulls over the
    // REVERSED order — NOT first() over (currentRow, unboundedFollowing):
    // Spark evaluates an unbounded-FOLLOWING frame by re-scanning the
    // remainder of the partition for every row (quadratic in the grid
    // span), and when AQE coalesces this modest shuffle into one
    // partition that put the whole sf1 grid on a single core for half an
    // hour. The descending running frame is incremental O(n) per pass.
    val after = Window.partitionBy(col("user_id")).orderBy(col("hour").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Round 16: the hour index and its observed-hour marker are projected
    // BEFORE the window pass. Computing the marker between the two
    // last() calls (as a withColumn per window function) interposed a
    // Project between Window nodes of the SAME spec, which blocked
    // CollapseWindow — the grid paid FOUR window passes
    // (plans/r15/q115_gap_fill_before.txt: Window(17)/(19) and
    // (22)/(24)). With plain-column inputs both last() pairs fuse into
    // one Window node per direction: two passes, same two sorts, same
    // values row-for-row.
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("hi", expr("unix_micros(hour) div 3600000000"))
      .withColumn("ht", when(col("vq").isNotNull, col("hi")))
      .select(col("user_id"), col("hour"), col("vq"), col("hi"), col("ht"),
        last(col("vq"), ignoreNulls = true).over(before).as("pv"),
        last(col("ht"), ignoreNulls = true).over(before).as("pt"))
      .select(col("user_id"), col("hour"), col("vq"), col("hi"), col("pv"),
        col("pt"),
        last(col("vq"), ignoreNulls = true).over(after).as("nv"),
        last(col("ht"), ignoreNulls = true).over(after).as("nt"))
      // half-up rational rounding: ⌊(2·(pv·(nt−h) + nv·(h−pt)) + n) / 2n⌋
      .withColumn("fq", when(col("vq").isNotNull, col("vq")).otherwise(expr(
        """(2 * (pv * (nt - hi) + nv * (hi - pt))
          | + (nt - pt)) div (2 * (nt - pt))""".stripMargin)))
      .select(col("user_id"), col("hour"),
        (col("fq") / lit(10000.0)).as("filled"),
        col("vq").isNull.cast("int").as("is_interpolated"))
  }

  // Round 16 (guide §2.3): order on the RAW (user_id, hour) keys first
  // and render the timestamp/decimal strings above the sort — the final
  // range exchange then carries a timestamp + a long instead of two
  // rendered strings, and the string order is identical (fixed-width
  // "yyyy-MM-dd HH:mm:ss" in UTC sorts exactly like the timestamp).
  private def q115(s: SparkSession, dir: String): DataFrame =
    gapFillHourly(Tables.events(s, dir))
      .orderBy(col("user_id"), col("hour"))
      .select(col("user_id"), QueryDef.tsSec(col("hour")).as("hour"),
        QueryDef.dec4(col("filled")).as("filled"), col("is_interpolated"))

  private val q115Sql =
    """WITH hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour,
      |    CAST(round(sum(value) * 10000) AS BIGINT) AS vq
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
      |  FROM (SELECT user_id, min(hour) AS mn, max(hour) AS mx
      |        FROM hourly GROUP BY 1)),
      |ctx AS (
      |  SELECT g.user_id, g.hour, h.vq,
      |    epoch_us(g.hour) // 3600000000 AS hi,
      |    last_value(h.vq IGNORE NULLS) OVER wb AS pv,
      |    last_value(CASE WHEN h.vq IS NOT NULL
      |      THEN epoch_us(g.hour) // 3600000000 END IGNORE NULLS) OVER wb AS pt,
      |    first_value(h.vq IGNORE NULLS) OVER wa AS nv,
      |    first_value(CASE WHEN h.vq IS NOT NULL
      |      THEN epoch_us(g.hour) // 3600000000 END IGNORE NULLS) OVER wa AS nt
      |  FROM grid g LEFT JOIN hourly h
      |    ON g.user_id = h.user_id AND g.hour = h.hour
      |  WINDOW wb AS (PARTITION BY g.user_id ORDER BY g.hour
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wa AS (PARTITION BY g.user_id ORDER BY g.hour
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
      |  CAST(CAST(CASE WHEN vq IS NOT NULL THEN vq
      |    ELSE (2 * (pv * (nt - hi) + nv * (hi - pt)) + (nt - pt))
      |      // (2 * (nt - pt)) END / 10000.0 AS DECIMAL(38,4)) AS VARCHAR)
      |    AS filled,
      |  CAST(vq IS NULL AS INT) AS is_interpolated
      |FROM ctx ORDER BY user_id, hour""".stripMargin

  // ==== q116: time-decayed engagement score =================================
  //
  // score(user) = Σ value · 2^(−age_days), age relative to the corpus max
  // timestamp — the freshness-weighted activity signal behind ranking /
  // sampling decisions. The reference time is one scalar broadcast; the
  // weight is computed map-side with INTEGER arithmetic only (integer-µs
  // age, `div` day bucketing, and 1 / (1L << k) — a power of two, exactly
  // representable in a double on both engines, unlike libm pow/exp whose
  // last-ulp can differ cross-engine). One shuffle: the user_id groupBy.

  /** Freshness-decayed per-user activity score (half-life = 1 day). */
  def decayedScore(events: DataFrame): DataFrame = {
    val ref = events.agg(max(unix_micros(col("ts"))).as("t_ref"))
    events.withColumn("us", unix_micros(col("ts")))
      .crossJoin(broadcast(ref)) // single-row scalar stat
      .withColumn("age_days", expr("(t_ref - us) div 86400000000"))
      .withColumn("wt",
        lit(1.0) / expr("cast(shiftleft(1L, cast(least(age_days, 62) as int)) as double)"))
      .groupBy(col("user_id"))
      .agg(sum(col("value") * col("wt")).as("decayed_score"),
        count(lit(1)).as("n_events"))
  }

  private def q116(s: SparkSession, dir: String): DataFrame =
    decayedScore(Tables.events(s, dir))
      .select(col("user_id"), QueryDef.dec4(col("decayed_score")).as("decayed_score"),
        col("n_events"))
      .orderBy(col("user_id"))

  private val q116Sql =
    """WITH ref AS (SELECT max(epoch_us(ts)) AS t_ref FROM events)
      |SELECT user_id,
      |  CAST(CAST(sum(value / CAST(CAST(1 AS BIGINT) <<
      |    LEAST((t_ref - epoch_us(ts)) // 86400000000, 62) AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS decayed_score,
      |  count(*) AS n_events
      |FROM events, ref GROUP BY user_id ORDER BY user_id""".stripMargin

  // ==== q119: behavioral Markov transition matrix ===========================
  //
  // P(next event_type | event_type) from each user's ordered event sequence:
  // one lead() window over the per-user order (single user_id shuffle), then
  // a tiny (|types|² rows) grouped count with the row-probability normalized
  // by a window over from_type — the second shuffle moves only the counts
  // table, constant-size at any event volume.

  /** (from_type, to_type, n, p) user-sequence transition matrix. */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p",
      col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))).cast("double"))
  }

  private def q119(s: SparkSession, dir: String): DataFrame =
    markovTransitions(Tables.events(s, dir))
      .select(col("from_type"), col("to_type"), col("n"),
        QueryDef.dec4(col("p")).as("p"))
      .orderBy(col("from_type"), col("to_type"))

  private val q119Sql =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM seq
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(CAST(CAST(n AS DOUBLE) / CAST(sum(n) OVER
      |    (PARTITION BY from_type) AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR) AS p
      |FROM c ORDER BY from_type, to_type""".stripMargin

  // ==== q120: trending-spike detection ======================================
  //
  // Flag hours where an event type's count jumps ≥3σ above its own trailing
  // 24-hour baseline — burst/incident detection over the activity stream.
  // The heavy phase is ONE map-side-combined groupBy down to (hour × type)
  // counts; every window after that runs on the tiny counts table (≤ span ×
  // |types| rows regardless of event volume). The baseline frame is RANGE
  // over the integer hour index, so calendar gaps (hours with zero events
  // of a type) shrink the observed baseline instead of silently stretching
  // it — a row-frame would reach back across gaps. Spikes need ≥12 observed
  // baseline hours and σ>0.

  /** (hour, event_type, n, zscore, is_spike) hourly burst flags. */
  def trendingSpikes(events: DataFrame, zThreshold: Double = 3.0): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hi", expr("unix_micros(hour) div 3600000000"))
    val base = Window.partitionBy(col("event_type")).orderBy(col("hi"))
      .rangeBetween(-24, -1)
    hourly
      .withColumn("base_n", count(col("n")).over(base))
      .withColumn("base_mean", avg(col("n")).over(base))
      .withColumn("base_std", stddev_samp(col("n")).over(base))
      .withColumn("zscore",
        when(col("base_n") >= 12 && col("base_std") > 0,
          (col("n") - col("base_mean")) / col("base_std")))
      .withColumn("is_spike",
        when(col("zscore") > zThreshold, 1).otherwise(0))
      .select(col("hour"), col("event_type"), col("n"), col("zscore"),
        col("is_spike"))
  }

  private def q120(s: SparkSession, dir: String): DataFrame =
    trendingSpikes(Tables.events(s, dir))
      .select(QueryDef.tsSec(col("hour")).as("hour"), col("event_type"),
        col("n"), QueryDef.dec4(col("zscore")).as("zscore"), col("is_spike"))
      .orderBy(col("event_type"), col("hour"))

  private val q120Sql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
      |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi
      |  FROM events GROUP BY 1, 2),
      |ctx AS (
      |  SELECT *, count(n) OVER b AS base_n, avg(n) OVER b AS base_mean,
      |    stddev_samp(n) OVER b AS base_std
      |  FROM hourly
      |  WINDOW b AS (PARTITION BY event_type ORDER BY hi
      |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT *, CASE WHEN base_n >= 12 AND base_std > 0
      |    THEN (n - base_mean) / base_std END AS zscore
      |  FROM ctx)
      |SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, event_type, n,
      |  CAST(CAST(zscore AS DECIMAL(38,4)) AS VARCHAR) AS zscore,
      |  CASE WHEN zscore > 3.0 THEN 1 ELSE 0 END AS is_spike
      |FROM z ORDER BY event_type, hour""".stripMargin

  // ==== q121: association rules (market-basket over daily activity) ========
  //
  // Baskets are (user, day) sets of event types; rules a→b carry support,
  // confidence, and lift. The pair space is generated by a SAME-KEY
  // self-join on the basket id — fan-out is |types|² per basket, bounded by
  // the type domain, never by event volume (no all-pairs anywhere). Basket
  // and item totals are tiny aggregates; the scalar basket count broadcasts.
  // Every metric divides the same integers in the same order on both
  // engines, so the doubles are bit-identical.

  /** (antecedent, consequent, n_pair, support, confidence, lift). */
  def associationRules(events: DataFrame): DataFrame = {
    val items = events
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .distinct()
    val total = items.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val singles = items.groupBy(col("event_type")).agg(count(lit(1)).as("n_item"))
    val pairs = items.as("a")
      .join(items.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.day") === col("b.day") &&
        col("a.event_type") =!= col("b.event_type"))
      .groupBy(col("a.event_type").as("antecedent"),
        col("b.event_type").as("consequent"))
      .agg(count(lit(1)).as("n_pair"))
    pairs
      .join(broadcast(singles.withColumnRenamed("event_type", "antecedent")
        .withColumnRenamed("n_item", "n_ant")), Seq("antecedent"))
      .join(broadcast(singles.withColumnRenamed("event_type", "consequent")
        .withColumnRenamed("n_item", "n_cons")), Seq("consequent"))
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        (col("n_pair").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("n_pair").cast("double") / col("n_ant").cast("double"))
          .as("confidence"),
        ((col("n_pair").cast("double") / col("n_ant").cast("double")) /
          (col("n_cons").cast("double") / col("n_baskets").cast("double")))
          .as("lift"))
  }

  private def q121(s: SparkSession, dir: String): DataFrame =
    associationRules(Tables.events(s, dir))
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        QueryDef.dec4(col("support")).as("support"),
        QueryDef.dec4(col("confidence")).as("confidence"),
        QueryDef.dec4(col("lift")).as("lift"))
      .orderBy(col("antecedent"), col("consequent"))

  private val q121Sql =
    """WITH items AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      |  FROM events),
      |total AS (
      |  SELECT count(*) AS n_baskets
      |  FROM (SELECT DISTINCT user_id, day FROM items)),
      |singles AS (
      |  SELECT event_type, count(*) AS n_item FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.event_type AS antecedent, b.event_type AS consequent,
      |    count(*) AS n_pair
      |  FROM items a JOIN items b
      |    ON a.user_id = b.user_id AND a.day = b.day
      |    AND a.event_type <> b.event_type
      |  GROUP BY 1, 2)
      |SELECT antecedent, consequent, n_pair,
      |  CAST(CAST(CAST(n_pair AS DOUBLE) / CAST(n_baskets AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS support,
      |  CAST(CAST(CAST(n_pair AS DOUBLE) / CAST(sa.n_item AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS confidence,
      |  CAST(CAST((CAST(n_pair AS DOUBLE) / CAST(sa.n_item AS DOUBLE)) /
      |    (CAST(sc.n_item AS DOUBLE) / CAST(n_baskets AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS lift
      |FROM pairs
      |JOIN singles sa ON sa.event_type = antecedent
      |JOIN singles sc ON sc.event_type = consequent
      |CROSS JOIN total
      |ORDER BY antecedent, consequent""".stripMargin

  // ==== q125: last-touch revenue attribution ================================
  //
  // Each purchase attributes its value to the user's most recent view/click
  // STRICTLY before it and within a 30-minute horizon; purchases with no
  // qualifying touch report as 'unattributed'. This composes the engine's
  // time-bucketed as-of join (B9 — candidate pairs bounded per bucket, no
  // per-key quadratic blowup on power-law users) with the tolerance pushed
  // INTO the join, so out-of-horizon touches never become candidates. Ties
  // at the same microsecond resolve to the highest event_id on both
  // engines.

  /** (touch_type, n_purchases, revenue) last-touch attribution rollup. */
  def lastTouchAttribution(events: DataFrame,
      horizonSec: Long = 1800): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("value"))
    val touches = events.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("ts").as("t_ts"), col("event_type").as("touch_type"))
    Joins.asofBackward(purchases, touches, byKeys = Seq("user_id"),
        leftTime = "p_ts", rightTime = "t_ts", tieBreak = "t_id",
        strict = true, toleranceSec = Some(horizonSec))
      .groupBy(coalesce(col("touch_type"), lit("unattributed")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("value")).as("revenue"))
  }

  private def q125(s: SparkSession, dir: String): DataFrame =
    lastTouchAttribution(Tables.events(s, dir))
      .select(col("touch_type"), col("n_purchases"),
        QueryDef.dec4(col("revenue")).as("revenue"))
      .orderBy(col("touch_type"))

  private val q125Sql =
    """WITH p AS (
      |  SELECT event_id AS p_id, user_id, ts AS p_ts, value
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS touch_type
      |  FROM events WHERE event_type IN ('view', 'click')),
      |cand AS (
      |  SELECT p.p_id, t.touch_type,
      |    row_number() OVER (PARTITION BY p.p_id
      |      ORDER BY t.t_ts DESC, t.t_id DESC) AS rn
      |  FROM p JOIN t ON p.user_id = t.user_id
      |    AND t.t_ts < p.p_ts
      |    AND t.t_ts >= p.p_ts - INTERVAL 1800 SECOND),
      |best AS (SELECT p_id, touch_type FROM cand WHERE rn = 1)
      |SELECT coalesce(b.touch_type, 'unattributed') AS touch_type,
      |  count(*) AS n_purchases,
      |  CAST(CAST(sum(p.value) AS DECIMAL(38,4)) AS VARCHAR) AS revenue
      |FROM p LEFT JOIN best b USING (p_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ==== q128: rolling active users (DAU / 7-day WAU / stickiness) ===========
  //
  // Exact rolling-window DISTINCT users — not windowable as a frame (count
  // distinct over sliding frames isn't decomposable), so each (user, day)
  // activity fact registers in the ≤7 windows it contributes to (bounded
  // ×7 fan-out, the sliding-window trick from q57) and one distinct +
  // groupBy per window does the rest. All day math is integer datediff;
  // stickiness divides the two counts once, identically on both engines.
  // Windows are reported only for days present in the data.

  /** (day, dau, wau7, stickiness) per observed activity day. */
  def rollingActiveUsers(events: DataFrame): DataFrame = {
    val daily = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val dau = daily.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = daily
      .select(col("user_id"), explode(sequence(col("day"),
        date_add(col("day"), 6))).as("win_day"))
      .distinct()
      .groupBy(col("win_day")).agg(count(lit(1)).as("wau7"))
    dau.join(wau, dau("day") === wau("win_day"))
      .select(col("day"), col("dau"), col("wau7"),
        (col("dau").cast("double") / col("wau7").cast("double"))
          .as("stickiness"))
  }

  private def q128(s: SparkSession, dir: String): DataFrame =
    rollingActiveUsers(Tables.events(s, dir))
      .select(QueryDef.tsDay(col("day")).as("day"), col("dau"), col("wau7"),
        QueryDef.dec4(col("stickiness")).as("stickiness"))
      .orderBy(col("day"))

  private val q128Sql =
    """WITH daily AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |dau AS (SELECT day, count(*) AS dau FROM daily GROUP BY 1),
      |wau AS (
      |  SELECT win_day, count(*) AS wau7 FROM (
      |    SELECT DISTINCT user_id, day + CAST(k AS INTEGER) AS win_day
      |    FROM daily CROSS JOIN (SELECT unnest(range(7)) AS k))
      |  GROUP BY 1)
      |SELECT strftime(day, '%Y-%m-%d') AS day, dau, wau7,
      |  CAST(CAST(CAST(dau AS DOUBLE) / CAST(wau7 AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS stickiness
      |FROM dau JOIN wau ON day = win_day ORDER BY day""".stripMargin

  // ==== q139: rolling distinct users via mergeable daily HLL sketches =======
  //
  // The 100 TB twin of q128: the exact rolling WAU registers every (user,
  // day) into its ≤7 trailing windows, so the shuffle carries 7× the
  // distinct-user volume. Here each DAY aggregates once into a fixed-size
  // HLL sketch (map-side partials) and only the ~days×7 SKETCHES — constant
  // size regardless of user count — are registered into windows and merged
  // with hll_union_agg. That is the standard precompute-daily-sketches DAU
  // architecture: adding a day never rescans history, and window width
  // changes are a re-merge of existing sketches. Driver-gated like
  // hll_count_distinct: output carries the EXACT rolling distinct (hash-
  // matched) plus an ok boolean proving the estimate landed within ±5%.

  def rollingDistinctSketched(events: DataFrame): DataFrame = {
    val daily = events.select(to_date(col("ts")).as("day"), col("user_id"))
    val daySketches = daily.groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val est = daySketches
      .select(explode(sequence(col("day"), date_add(col("day"), 6)))
        .as("win_day"), col("sk"))
      .groupBy(col("win_day"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("wau_est"))
    val exact = daily.distinct()
      .select(col("user_id"), explode(sequence(col("day"),
        date_add(col("day"), 6))).as("win_day"))
      .distinct()
      .groupBy(col("win_day")).agg(count(lit(1)).as("wau_exact"))
    // report only observed days (the estimate view also has run-out days)
    exact.join(est, Seq("win_day"))
      .join(daily.select(col("day")).distinct(),
        col("win_day") === col("day"))
      .select(col("win_day"), col("wau_exact"),
        (abs(col("wau_est") - col("wau_exact")) <=
          col("wau_exact") * 0.05).as("ok_est"))
  }

  private def q139(s: SparkSession, dir: String): DataFrame =
    rollingDistinctSketched(Tables.events(s, dir))
      .select(QueryDef.tsDay(col("win_day")).as("win_day"),
        col("wau_exact"), col("ok_est"))
      .orderBy(col("win_day"))

  private val q139Sql =
    """WITH daily AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |wau AS (
      |  SELECT win_day, count(*) AS wau_exact FROM (
      |    SELECT DISTINCT user_id, day + CAST(k AS INTEGER) AS win_day
      |    FROM daily CROSS JOIN (SELECT unnest(range(7)) AS k))
      |  GROUP BY 1)
      |SELECT strftime(win_day, '%Y-%m-%d') AS win_day, wau_exact,
      |  true AS ok_est
      |FROM wau WHERE win_day IN (SELECT day FROM daily)
      |ORDER BY win_day""".stripMargin

  // ==== q150: funnel conversion latency percentiles =========================
  //
  // Time from first view to first qualifying purchase (the q112 strict-
  // order chain), summarized as exact interpolated percentiles — the SLA
  // number behind every funnel. The chain reuses the running-window
  // semantics (first_i visible at row t iff it happened before t); the
  // percentile runs on the converters-only latency column via the
  // distributed order-statistics path (q113), not a global sort.

  def conversionLatency(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events.withColumn("us", unix_micros(col("ts")))
    val withFirsts = stages.zipWithIndex.foldLeft(base) { case (df, (stage, i)) =>
      val qual = if (i == 0) col("event_type") === stage
        else col("event_type") === stage &&
          col(s"first${i - 1}").isNotNull && col("us") > col(s"first${i - 1}")
      df.withColumn(s"qual$i", qual)
        .withColumn(s"first$i", min(when(col(s"qual$i"), col("us"))).over(w))
    }
    val last = stages.size - 1
    val lat = withFirsts.groupBy(col("user_id"))
      .agg(min(when(col("qual0"), col("us"))).as("f0"),
        min(when(col(s"qual$last"), col("us"))).as("fl"))
      .filter(col("f0").isNotNull && col("fl").isNotNull)
      // integer seconds: micros-scale quantiles interpolate at ~1e12 where a
      // double ulp is 1e-4 — exactly the dec4 digit; seconds keep the
      // interpolation 6 orders below the rounding grid
      .select(expr("(fl - f0) div 1000000").as("lat_s"))
    val Seq(p50, p90) = Profiling.exactQuantiles(lat, "lat_s", Seq(0.5, 0.9))
    val spark = events.sparkSession
    import spark.implicits._
    lat.agg(count(lit(1)).as("n_converted"))
      .crossJoin(broadcast(Seq((p50, p90)).toDF("p50_s", "p90_s")))
  }

  private def q150(s: SparkSession, dir: String): DataFrame =
    conversionLatency(Tables.events(s, dir), Seq("view", "click", "purchase"))
      .select(col("n_converted"), QueryDef.dec4(col("p50_s")).as("p50_s"),
        QueryDef.dec4(col("p90_s")).as("p90_s"))

  private val q150Sql =
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
      |  FROM v),
      |firsts AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN us END) AS f0,
      |    min(CASE WHEN event_type = 'purchase' AND first1 IS NOT NULL
      |      AND us > first1 THEN us END) AS fl
      |  FROM c GROUP BY user_id),
      |lat AS (
      |  SELECT (fl - f0) // 1000000 AS lat_s FROM firsts
      |  WHERE f0 IS NOT NULL AND fl IS NOT NULL)
      |SELECT count(*) AS n_converted,
      |  CAST(CAST(quantile_cont(lat_s, 0.5) AS DECIMAL(38,4)) AS VARCHAR) AS p50_s,
      |  CAST(CAST(quantile_cont(lat_s, 0.9) AS DECIMAL(38,4)) AS VARCHAR) AS p90_s
      |FROM lat""".stripMargin

  // ==== q151: additive time-series decomposition (trend/seasonal/residual) ==
  //
  // The classical-decomposition baseline for anomaly work: trend = centered
  // 25-hour moving average (only where the window is FULL — edges stay
  // null rather than biased), seasonal = hour-of-day mean of the detrended
  // series, residual = the rest. Scale shape: one map-side-combined
  // groupBy to the HOURLY table; every window after that orders ≤ hours
  // rows (8.8k/year) — the q120 discipline. Exactness: counts are
  // integers, so the three components are rationals with denominators
  // 25 / 25k / 25k; each is computed as an integer numerator divided once
  // — both engines divide identical BIGINTs.

  def decomposeHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hi", expr("unix_micros(hour) div 3600000000"))
    val w25 = Window.orderBy(col("hi")).rangeBetween(-12, 12)
    val t = hourly
      .withColumn("wsum", sum(col("n")).over(w25))
      .withColumn("wcnt", count(col("n")).over(w25))
      .withColumn("detr25", when(col("wcnt") === 25, lit(25) * col("n") - col("wsum")))
    val seasonal = t.filter(col("detr25").isNotNull)
      .groupBy((col("hi") % 24).as("hod"))
      .agg(sum(col("detr25")).as("ssum"), count(lit(1)).as("k"))
    t.join(broadcast(seasonal), col("hi") % 24 === col("hod"), "left")
      .select(col("hour"), col("n"),
        when(col("wcnt") === 25,
          col("wsum").cast("double") / lit(25.0)).as("trend"),
        (col("ssum").cast("double") /
          (lit(25.0) * col("k").cast("double"))).as("seasonal"),
        when(col("detr25").isNotNull,
          (col("k") * col("detr25") - col("ssum")).cast("double") /
            (lit(25.0) * col("k").cast("double"))).as("resid"))
  }

  private def q151(s: SparkSession, dir: String): DataFrame =
    decomposeHourly(Tables.events(s, dir))
      .select(QueryDef.tsSec(col("hour")).as("hour"), col("n"),
        QueryDef.dec4(col("trend")).as("trend"),
        QueryDef.dec4(col("seasonal")).as("seasonal"),
        QueryDef.dec4(col("resid")).as("resid"))
      .orderBy(col("hour"))

  private val q151Sql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
      |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi
      |  FROM events GROUP BY 1),
      |t AS (
      |  SELECT *,
      |    CAST(sum(n) OVER w AS BIGINT) AS wsum,
      |    count(n) OVER w AS wcnt
      |  FROM hourly
      |  WINDOW w AS (ORDER BY hi RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
      |t2 AS (
      |  SELECT *, CASE WHEN wcnt = 25 THEN 25 * n - wsum END AS detr25 FROM t),
      |seas AS (
      |  SELECT hi % 24 AS hod, CAST(sum(detr25) AS BIGINT) AS ssum,
      |    count(*) AS k
      |  FROM t2 WHERE detr25 IS NOT NULL GROUP BY 1)
      |SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, n,
      |  CAST(CAST(CASE WHEN wcnt = 25 THEN CAST(wsum AS DOUBLE) / 25.0 END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS trend,
      |  CAST(CAST(CAST(ssum AS DOUBLE) / (25.0 * CAST(k AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS seasonal,
      |  CAST(CAST(CASE WHEN detr25 IS NOT NULL THEN
      |    CAST(k * detr25 - ssum AS DOUBLE) / (25.0 * CAST(k AS DOUBLE)) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS resid
      |FROM t2 LEFT JOIN seas ON t2.hi % 24 = seas.hod
      |ORDER BY hour""".stripMargin

  // ==== q152: autocorrelation of the hourly series at fixed lags ============
  //
  // Pearson r between (x_t, x_{t−lag}) for lag 1 h and 24 h — the
  // seasonality detector that motivates q151's 24-hour cycle. Pairs come
  // from a calendar-correct self-join on the hour INDEX (a window lag()
  // would silently pair across gaps); moments are the q144 integer set,
  // divided once and rooted in double from identical inputs.

  def hourlyAutocorr(events: DataFrame, lags: Seq[Int]): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hi", expr("unix_micros(hour) div 3600000000"))
    val spark = events.sparkSession
    import spark.implicits._
    val lagDf = lags.toDF("lag")
    val a = hourly.select(col("hi"), col("n").as("x"))
    val b = hourly.select(col("hi").as("hib"), col("n").as("y"))
    a.crossJoin(broadcast(lagDf))
      .join(b, col("hib") === col("hi") - col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lag"), col("n_pairs"),
        ((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("r"))
  }

  private def q152(s: SparkSession, dir: String): DataFrame =
    hourlyAutocorr(Tables.events(s, dir), Seq(1, 24))
      .select(col("lag"), col("n_pairs"), QueryDef.dec4(col("r")).as("r"))
      .orderBy(col("lag"))

  private val q152Sql =
    """WITH hourly AS (
      |  SELECT count(*) AS n,
      |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi
      |  FROM events GROUP BY date_trunc('hour', ts)),
      |pairs AS (
      |  SELECT l.lag, a.n AS x, b.n AS y
      |  FROM hourly a CROSS JOIN (VALUES (1), (24)) AS l(lag)
      |  JOIN hourly b ON b.hi = a.hi - l.lag),
      |m AS (
      |  SELECT lag, count(*) AS np,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM pairs GROUP BY 1)
      |SELECT lag, np AS n_pairs,
      |  CAST(CAST(CAST(np * sxy - sx * sy AS DOUBLE) /
      |    sqrt(CAST(np * sxx - sx * sx AS DOUBLE) *
      |      CAST(np * syy - sy * sy AS DOUBLE)) AS DECIMAL(38,4)) AS VARCHAR)
      |    AS r
      |FROM m ORDER BY lag""".stripMargin

  // ==== q214: cross-correlation between two event-type series ===============
  //
  // q152's Pearson machinery pointed ACROSS series: r(lag) between
  // series A at hour t and series B at hour t−lag, for positive and
  // NEGATIVE lags — the lead/lag detector ("do clicks follow views, and
  // by how many hours?") behind campaign attribution and cascading-
  // failure forensics; the argmax lag estimates the delay. Same
  // calendar-correct hour-index join (window lag() would pair across
  // gaps), same exact integer moments divided once in double from
  // identical inputs. Hour-domain sizes throughout; the lag frame
  // broadcasts.

  /** (lag, n_pairs, r) of Pearson r between hourly counts of `typeA` at
    * t and `typeB` at t − lag, per lag in `lags` (negative = A leads). */
  def crossCorrHourly(events: DataFrame, typeA: String, typeB: String,
      lags: Seq[Int]): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hi", expr("unix_micros(hour) div 3600000000"))
    val spark = events.sparkSession
    import spark.implicits._
    val lagDf = lags.toDF("lag")
    val a = hourly.where(col("event_type") === typeA)
      .select(col("hi"), col("n").as("x"))
    val b = hourly.where(col("event_type") === typeB)
      .select(col("hi").as("hib"), col("n").as("y"))
    a.crossJoin(broadcast(lagDf))
      .join(b, col("hib") === col("hi") - col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lag"), col("n_pairs"),
        ((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("r"))
  }

  private def q214(s: SparkSession, dir: String): DataFrame =
    crossCorrHourly(Tables.events(s, dir), "click", "view",
      Seq(-24, -2, -1, 0, 1, 2, 24))
      .select(col("lag"), col("n_pairs"), QueryDef.dec4(col("r")).as("r"))
      .orderBy(col("lag"))

  private val q214Sql =
    """WITH hourly AS (
      |  SELECT event_type, count(*) AS n,
      |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi
      |  FROM events GROUP BY event_type, date_trunc('hour', ts)),
      |pairs AS (
      |  SELECT l.lag, a.n AS x, b.n AS y
      |  FROM hourly a
      |  CROSS JOIN (VALUES (-24), (-2), (-1), (0), (1), (2), (24)) AS l(lag)
      |  JOIN hourly b ON b.hi = a.hi - l.lag
      |  WHERE a.event_type = 'click' AND b.event_type = 'view'),
      |m AS (
      |  SELECT lag, count(*) AS np,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM pairs GROUP BY 1)
      |SELECT lag, np AS n_pairs,
      |  CAST(CAST(CAST(np * sxy - sx * sy AS DOUBLE) /
      |    sqrt(CAST(np * sxx - sx * sx AS DOUBLE) *
      |      CAST(np * syy - sy * sy AS DOUBLE)) AS DECIMAL(38,4)) AS VARCHAR)
      |    AS r
      |FROM m ORDER BY lag""".stripMargin

  // ==== q159: inter-arrival burstiness per user =============================
  //
  // Mean and squared coefficient of variation of each user's event
  // inter-arrival gaps — CV² ≈ 1 is Poisson (memoryless) behavior, ≫ 1 is
  // bursty sessions, ≪ 1 is scripted/bot regularity: the behavioral
  // fingerprint behind bot filtering and load modeling. One lag() window
  // in the single user_id shuffle, then integer moments (the q144 form)
  // over gaps in integer SECONDS — micros-squared would overflow BIGINT
  // at month-long gaps; seconds keep Σgap² comfortably inside. CV² =
  // (n·Σg² − (Σg)²) / (Σg)² divides exact integers.

  def interArrival(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap_s", expr("(us - lag(us, 1) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id)) div 1000000"))
      .filter(col("gap_s").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).as("sg"),
        sum(col("gap_s") * col("gap_s")).as("sgg"))
      .filter(col("sg") > 0)
      // floor-scaled integers, not dec4: integer/integer means land EXACTLY
      // on the half grid whenever n_gaps is a power of two (observed:
      // 39823.78125 s), and there Spark's HALF_UP and DuckDB's half-even
      // disagree; floor of the identically-rounded double is ulp-safe
      .select(col("user_id"), col("n_gaps"),
        floor((col("sg") * 10000L).cast("double") / col("n_gaps").cast("double"))
          .cast("long").as("mean_gap_e4"),
        floor((col("n_gaps") * col("sgg") - col("sg") * col("sg"))
          .cast("double") * 10000.0 / (col("sg") * col("sg")).cast("double"))
          .cast("long").as("cv2_e4"))
  }

  private def q159(s: SparkSession, dir: String): DataFrame =
    interArrival(Tables.events(s, dir)).orderBy(col("user_id"))

  private val q159Sql =
    """WITH g AS (
      |  SELECT user_id,
      |    (epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s
      |  FROM events),
      |m AS (
      |  SELECT user_id, count(*) AS n_gaps,
      |    CAST(sum(gap_s) AS BIGINT) AS sg,
      |    CAST(sum(gap_s * gap_s) AS BIGINT) AS sgg
      |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
      |SELECT user_id, n_gaps,
      |  CAST(floor(CAST(sg * 10000 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
      |    AS BIGINT) AS mean_gap_e4,
      |  CAST(floor(CAST(n_gaps * sgg - sg * sg AS DOUBLE) * 10000.0 /
      |    CAST(sg * sg AS DOUBLE)) AS BIGINT) AS cv2_e4
      |FROM m WHERE sg > 0 ORDER BY user_id""".stripMargin

  // ==== q162: daily bounce rate ============================================
  //
  // Fraction of sessions that contain exactly one event, per session-start
  // day — the engagement-quality headline. Reuses the q35 gap
  // sessionization (30-min inactivity) wholesale: one lag window + one
  // running sum in the single user_id shuffle, then a constant-size
  // (day) rollup; the rate divides integers.

  def bounceRate(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapMinutes * 60000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), to_date(min(col("ts"))).as("day"))
    sessions.groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .select(col("day"), col("n_sessions"), col("n_bounce"),
        QueryDef.dec4(col("n_bounce").cast("double") /
          col("n_sessions").cast("double")).as("bounce_rate"))
  }

  private def q162(s: SparkSession, dir: String): DataFrame =
    bounceRate(Tables.events(s, dir))
      .select(QueryDef.tsDay(col("day")).as("day"), col("n_sessions"),
        col("n_bounce"), col("bounce_rate"))
      .orderBy(col("day"))

  private val q162Sql =
    """WITH sess AS (
      |  SELECT user_id, session_id, count(*) AS n_events,
      |    CAST(min(ts) AS DATE) AS day
      |  FROM (SELECT user_id, ts,
      |      CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |        AS session_id
      |    FROM (SELECT *, CASE WHEN prev_us IS NULL
      |          OR epoch_us(ts) - prev_us > 30 * 60000000 THEN 1 ELSE 0 END
      |          AS is_new
      |      FROM (SELECT *, lag(epoch_us(ts), 1) OVER (
      |          PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |        FROM events)))
      |  GROUP BY 1, 2)
      |SELECT strftime(day, '%Y-%m-%d') AS day, count(*) AS n_sessions,
      |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bounce,
      |  CAST(CAST(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR)
      |    AS bounce_rate
      |FROM sess GROUP BY day ORDER BY day""".stripMargin

  // ==== q167: multi-touch (position-based) revenue attribution ==============
  //
  // The U-shaped counterpart of q125's last-touch: a purchase's value
  // splits across ALL its qualifying touches — 40% first, 40% last, the
  // remaining 20% over the middles. Candidate generation is the SAME
  // time-bucketed shape as the as-of join (purchase explodes to the two
  // horizon-width buckets its lookback spans, equi-join on (user, bucket),
  // window-filter) so per-purchase candidates stay bounded by horizon ×
  // touch rate — never a per-user quadratic blowup. The per-purchase rank
  // window partitions by PURCHASE (each partition = one purchase's
  // candidate list), not by user — skew-safe under power-law users.
  //
  // Exactness: weights are integer MILLIONTHS with the middle share
  // distributed by integer division, remainder to the earliest middles
  // (n=1 → 1000000; n=2 → 500000+500000; n≥3 → 400000 / base+1… / 400000);
  // credit = cents × weight, summed in BIGINT (≤ 9.2e18 micro-cents ≈
  // $92T of attributed revenue before overflow — not a 100 TB concern).

  /** (touch_type, n_touches, credit_micro_cents): position-based
    * attribution rollup; purchases with no qualifying touch report their
    * full value under 'unattributed'. */
  def multiTouchAttribution(events: DataFrame,
      horizonSec: Long = 1800): DataFrame = {
    val h = horizonSec * 1000000L
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_us"),
        round(col("value") * 100).cast("long").as("cents"))
    val t = events.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("t_id"),
        unix_micros(col("ts")).as("t_us"),
        col("event_type").as("touch_type"))
    val pb = p.withColumn("bkt",
      explode(array(expr(s"p_us div $h"), expr(s"p_us div $h") - 1)))
    val tb = t.withColumn("bkt", expr(s"t_us div $h"))
    val cand = pb.join(tb, Seq("user_id", "bkt"))
      .filter(col("t_us") < col("p_us") && col("t_us") >= col("p_us") - h)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_id")).orderBy(col("t_us"), col("t_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("p_id"))
    val ranked = cand
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
    val mid = col("rn") - 1 // middle index 1..n-2
    val weight = when(col("n") === 1, lit(1000000L))
      .when(col("n") === 2, lit(500000L))
      .when(col("rn") === 1 || col("rn") === col("n"), lit(400000L))
      .otherwise(expr("200000 div (n - 2)") +
        when(mid <= expr("200000 % (n - 2)"), 1L).otherwise(0L))
    val attributed = ranked
      .select(col("touch_type"), (col("cents") * weight).as("credit"))
    val unattributed = p
      .join(cand.select(col("p_id")).distinct(), Seq("p_id"), "left_anti")
      .select(lit("unattributed").as("touch_type"),
        (col("cents") * 1000000L).as("credit"))
    attributed.unionByName(unattributed)
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit")).as("credit_micro_cents"))
  }

  private def q167(s: SparkSession, dir: String): DataFrame =
    multiTouchAttribution(Tables.events(s, dir)).orderBy(col("touch_type"))

  private val q167Sql =
    """WITH p AS (
      |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT event_id AS t_id, user_id, epoch_us(ts) AS t_us,
      |    event_type AS touch_type
      |  FROM events WHERE event_type IN ('view', 'click')),
      |cand AS (
      |  SELECT p.p_id, p.cents, t.touch_type, t.t_us, t.t_id
      |  FROM p JOIN t ON p.user_id = t.user_id
      |    AND t.t_us < p.p_us AND t.t_us >= p.p_us - 1800000000),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY p_id
      |      ORDER BY t_us, t_id) AS rn,
      |    count(*) OVER (PARTITION BY p_id) AS n
      |  FROM cand),
      |credits AS (
      |  SELECT touch_type, cents * (CASE
      |    WHEN n = 1 THEN 1000000
      |    WHEN n = 2 THEN 500000
      |    WHEN rn = 1 OR rn = n THEN 400000
      |    ELSE 200000 // (n - 2) +
      |      CASE WHEN rn - 1 <= 200000 % (n - 2) THEN 1 ELSE 0 END
      |    END) AS credit
      |  FROM ranked
      |  UNION ALL
      |  SELECT 'unattributed', cents * 1000000
      |  FROM p WHERE p_id NOT IN (SELECT p_id FROM cand))
      |SELECT touch_type, count(*) AS n_touches,
      |  CAST(sum(credit) AS BIGINT) AS credit_micro_cents
      |FROM credits GROUP BY 1 ORDER BY 1""".stripMargin

  // ==== q169: integer EWMA smoothing of hourly series =======================
  //
  // Exponentially-weighted smoothing of the per-type hourly event rate —
  // the standard pre-step for alerting baselines. α is fixed at 1/2 and
  // the recurrence INTEGERIZED: s₁ = x₁, sₜ = (sₜ₋₁ + xₜ) div 2 — floor
  // halving on non-negative integers, so the whole series is exact BIGINT
  // arithmetic with zero cross-engine float risk (a float EWMA's 2⁻ᵗ
  // tails overflow the 53-bit mantissa and drift per engine). The fold is
  // inherently sequential but runs per SERIES over hour-level aggregates
  // (the q151/q152 discipline: series length = observed hours, bounded
  // domain — collect_list here is hours-sized, never event-sized); the
  // corpus-sized work is one map-side-combined groupBy.

  /** (event_type, hr, cnt, ewma): floor-halving EWMA over hourly counts. */
  def ewmaHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    hourly.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("hr"), col("cnt")))).as("xs"))
      .select(col("event_type"), explode(expr(
        """aggregate(xs,
          |  cast(array() as array<struct<hr: bigint, cnt: bigint, s: bigint>>),
          |  (acc, e) -> acc || array(cast(named_struct('hr', e.hr, 'cnt', e.cnt,
          |    's', case when size(acc) = 0 then e.cnt
          |         else (element_at(acc, -1).s + e.cnt) div 2 end)
          |    as struct<hr: bigint, cnt: bigint, s: bigint>)))""".stripMargin))
        .as("r"))
      .select(col("event_type"), col("r.hr").as("hr"), col("r.cnt").as("cnt"),
        col("r.s").as("ewma"))
  }

  private def q169(s: SparkSession, dir: String): DataFrame =
    ewmaHourly(Tables.events(s, dir)).orderBy(col("event_type"), col("hr"))

  // ==== q181: rate-anomaly flags over the EWMA baseline ======================
  //
  // Closes the q169 loop into detection: an hour is anomalous when its
  // count deviates from the PRE-fold EWMA baseline by more than k Poisson
  // standard deviations — tested as (cnt − baseline)² > k²·baseline, so
  // the whole decision is exact BIGINT arithmetic (no sqrt, no floats
  // anywhere). The first hour of a series has no baseline and is never
  // flagged. Same per-series hour-level fold shape as q169.

  /** (event_type, hr, cnt, baseline, anomaly) with k=3 Poisson sigmas. */
  def rateAnomalies(events: DataFrame, k: Long = 3L): DataFrame = {
    val hourly = events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    hourly.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("hr"), col("cnt")))).as("xs"))
      .select(col("event_type"), explode(expr(
        """aggregate(xs,
          |  cast(array() as array<struct<hr: bigint, cnt: bigint, s: bigint, prev: bigint>>),
          |  (acc, e) -> acc || array(cast(named_struct('hr', e.hr, 'cnt', e.cnt,
          |    's', case when size(acc) = 0 then e.cnt
          |         else (element_at(acc, -1).s + e.cnt) div 2 end,
          |    'prev', case when size(acc) = 0 then -1L
          |         else element_at(acc, -1).s end)
          |    as struct<hr: bigint, cnt: bigint, s: bigint, prev: bigint>)))""".stripMargin))
        .as("r"))
      .select(col("event_type"), col("r.hr").as("hr"), col("r.cnt").as("cnt"),
        when(col("r.prev") >= 0, col("r.prev")).as("baseline"),
        (col("r.prev") >= 0 &&
          (col("r.cnt") - col("r.prev")) * (col("r.cnt") - col("r.prev")) >
            lit(k * k) * col("r.prev")).as("anomaly"))
  }

  private def q181(s: SparkSession, dir: String): DataFrame =
    rateAnomalies(Tables.events(s, dir)).orderBy(col("event_type"), col("hr"))

  // ==== q210: Holt linear-trend smoothing (integer double smoothing) ========
  //
  // The level+trend extension of q169's EWMA — the classic Holt (1957)
  // forecaster behind capacity baselines ("where is this rate HEADING"),
  // with α = β = 1/2 integerized: l₁ = x₁, b₁ = 0, then
  //   lₜ = ⌊(lₜ₋₁ + bₜ₋₁ + xₜ) / 2⌋      (smooth toward the trend-advanced level)
  //   bₜ = ⌊(bₜ₋₁ + (lₜ − lₜ₋₁)) / 2⌋    (smooth the level delta)
  // and the one-step forecast is lₜ + bₜ. Unlike q169, the TREND is
  // signed, and the engines' integer divisions disagree on negatives
  // (Spark `div` truncates toward zero, DuckDB `//` floors) — so the
  // halving is spelled as the sign-free floor identity
  // (x − pmod(x, 2)) div 2, which both engines evaluate identically on
  // every integer. Same per-series hours-domain fold shape as q169.

  /** (event_type, hr, cnt, level, trend, forecast): Holt smoothing with
    * α = β = 1/2 over hourly counts; forecast = next-hour prediction. */
  def holtHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    hourly.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("hr"), col("cnt")))).as("xs"))
      .select(col("event_type"), explode(expr(
        """aggregate(xs,
          |  cast(array() as array<struct<hr: bigint, cnt: bigint, l: bigint, b: bigint>>),
          |  (acc, e) -> acc || array(cast(
          |    case when size(acc) = 0 then
          |      named_struct('hr', e.hr, 'cnt', e.cnt, 'l', e.cnt, 'b', 0L)
          |    else named_struct('hr', e.hr, 'cnt', e.cnt,
          |      'l', (element_at(acc, -1).l + element_at(acc, -1).b + e.cnt
          |            - pmod(element_at(acc, -1).l + element_at(acc, -1).b + e.cnt, 2)) div 2,
          |      'b', (element_at(acc, -1).b
          |            + ((element_at(acc, -1).l + element_at(acc, -1).b + e.cnt
          |                - pmod(element_at(acc, -1).l + element_at(acc, -1).b + e.cnt, 2)) div 2)
          |            - element_at(acc, -1).l
          |            - pmod(element_at(acc, -1).b
          |              + ((element_at(acc, -1).l + element_at(acc, -1).b + e.cnt
          |                  - pmod(element_at(acc, -1).l + element_at(acc, -1).b + e.cnt, 2)) div 2)
          |              - element_at(acc, -1).l, 2)) div 2)
          |    end
          |    as struct<hr: bigint, cnt: bigint, l: bigint, b: bigint>)))""".stripMargin))
        .as("r"))
      .select(col("event_type"), col("r.hr").as("hr"), col("r.cnt").as("cnt"),
        col("r.l").as("level"), col("r.b").as("trend"),
        (col("r.l") + col("r.b")).as("forecast"))
  }

  private def q210(s: SparkSession, dir: String): DataFrame =
    holtHourly(Tables.events(s, dir)).orderBy(col("event_type"), col("hr"))

  private val q210Sql =
    """WITH RECURSIVE h AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
      |  FROM h),
      |rec(event_type, rn, hr, cnt, l, b) AS (
      |  SELECT event_type, rn, hr, cnt, cnt, CAST(0 AS BIGINT) FROM r
      |  WHERE rn = 1
      |  UNION ALL
      |  SELECT r.event_type, r.rn, r.hr, r.cnt,
      |    (rec.l + rec.b + r.cnt - ((rec.l + rec.b + r.cnt) % 2 + 2) % 2) // 2,
      |    (rec.b
      |     + ((rec.l + rec.b + r.cnt - ((rec.l + rec.b + r.cnt) % 2 + 2) % 2) // 2)
      |     - rec.l
      |     - ((rec.b
      |         + ((rec.l + rec.b + r.cnt - ((rec.l + rec.b + r.cnt) % 2 + 2) % 2) // 2)
      |         - rec.l) % 2 + 2) % 2) // 2
      |  FROM rec JOIN r ON r.event_type = rec.event_type
      |    AND r.rn = rec.rn + 1)
      |SELECT event_type, hr, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(l AS BIGINT) AS level, CAST(b AS BIGINT) AS trend,
      |  CAST(l + b AS BIGINT) AS forecast
      |FROM rec ORDER BY event_type, hr""".stripMargin

  private val q181Sql =
    """WITH RECURSIVE h AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
      |  FROM h),
      |rec(event_type, rn, hr, cnt, s, prev) AS (
      |  SELECT event_type, rn, hr, cnt, cnt, CAST(NULL AS BIGINT) FROM r
      |  WHERE rn = 1
      |  UNION ALL
      |  SELECT r.event_type, r.rn, r.hr, r.cnt, (rec.s + r.cnt) // 2, rec.s
      |  FROM rec JOIN r ON r.event_type = rec.event_type
      |    AND r.rn = rec.rn + 1)
      |SELECT event_type, hr, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(prev AS BIGINT) AS baseline,
      |  (prev IS NOT NULL AND (cnt - prev) * (cnt - prev) > 9 * prev)
      |    AS anomaly
      |FROM rec ORDER BY event_type, hr""".stripMargin

  private val q169Sql =
    """WITH RECURSIVE h AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
      |  FROM h),
      |rec(event_type, rn, hr, cnt, s) AS (
      |  SELECT event_type, rn, hr, cnt, cnt FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.event_type, r.rn, r.hr, r.cnt, (rec.s + r.cnt) // 2
      |  FROM rec JOIN r ON r.event_type = rec.event_type
      |    AND r.rn = rec.rn + 1)
      |SELECT event_type, hr, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(s AS BIGINT) AS ewma
      |FROM rec ORDER BY event_type, hr""".stripMargin

  // ==== q173: sequence pattern matching (MATCH_RECOGNIZE-lite) ==============
  //
  // The row-pattern operator SQL engines bolt on as MATCH_RECOGNIZE and
  // Spark lacks: count non-overlapping occurrences of a regex over each
  // user's time-ordered event-type sequence. Encoding: one char per event
  // (first letter of the type — distinct across the domain), sequence
  // built from ONE shuffle (the q112 funnel shape: per-user collect of
  // (ts, id, char) structs, sorted inside the row), pattern applied with
  // the engine's regex. Leftmost non-overlapping greedy semantics are
  // identical in Java regex and RE2 for patterns without backrefs — the
  // portable subset this operator contracts to.

  /** (user_id, seq_len, n_matches) for regex `pattern` over the user's
    * chronological type-letter sequence. */
  def sequenceMatches(events: DataFrame, pattern: String): DataFrame =
    events
      .select(col("user_id"), struct(unix_micros(col("ts")).as("us"),
        col("event_id"), substring(col("event_type"), 1, 1).as("ch")).as("e"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(sort_array(collect_list(col("e"))),
        e => e.getField("ch")), "").as("s"))
      .select(col("user_id"), length(col("s")).cast("long").as("seq_len"),
        regexp_count(col("s"), lit(pattern)).cast("long").as("n_matches"))

  // view (clicks)* purchase — the canonical browse-to-buy motif
  private val SeqPattern = "vc*p"

  private def q173(s: SparkSession, dir: String): DataFrame =
    sequenceMatches(Tables.events(s, dir), SeqPattern)
      .groupBy(col("n_matches"))
      .agg(count(lit(1)).as("n_users"), sum(col("seq_len")).as("sum_len"))
      .orderBy(col("n_matches"))

  private val q173Sql =
    s"""WITH seq AS (
       |  SELECT user_id,
       |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
       |  FROM events GROUP BY user_id),
       |m AS (
       |  SELECT user_id, len(s) AS seq_len,
       |    len(regexp_extract_all(s, '$SeqPattern')) AS n_matches
       |  FROM seq)
       |SELECT CAST(n_matches AS BIGINT) AS n_matches,
       |  count(*) AS n_users, CAST(sum(seq_len) AS BIGINT) AS sum_len
       |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  // ==== q175: RFM segmentation ===============================================
  //
  // The classic customer-value segmentation: per user, Recency (days since
  // last purchase vs the corpus's last purchase day), Frequency (purchase
  // count) and Monetary (total cents), each bucketed 0..2 by its OWN
  // p25/p75 boundaries — self-calibrating, like the q95 quantile pruning.
  // Exactness discipline: R/F/M are integers (datediff / count / rounded
  // cents); boundaries come from the distributed exact-quantile machinery
  // at fractions 0.25/0.75 (exact binary fractions, so the interpolation
  // weights are identical doubles on both engines) and are rint-snapped to
  // the 4-dp grid (the repo's ONE boundary-rounding rule); bucketing is
  // the `v > b` count idiom shared with psi/calibration. Scale shape: two
  // aggregations (per-user rollup, then segment census) plus the quantile
  // order statistics — the events table shuffles once on user_id.

  /** (segment, n_users) where segment = "R<r>F<f>M<m>", each 0..2. */
  def rfmSegments(events: DataFrame): DataFrame = {
    val perUser = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(max(col("d")).as("last_d"), count(lit(1)).as("freq"),
        sum(col("cents")).as("monetary"))
    val maxD = broadcast(perUser.agg(max(col("last_d")).as("max_d")))
    val rfm = perUser.crossJoin(maxD)
      .select(col("user_id"),
        datediff(col("max_d"), col("last_d")).cast("long").as("recency"),
        col("freq"), col("monetary"))
      .localCheckpoint() // the quantile passes below re-read it
    def bounds(c: String): Seq[Double] =
      Profiling.exactQuantiles(rfm, c, Seq(0.25, 0.75))
        .map(b => math.rint(b * 10000) / 10000)
    def score(c: String, bs: Seq[Double]): org.apache.spark.sql.Column =
      bs.map(b => when(col(c).cast("double") > b, 1L).otherwise(0L))
        .reduce(_ + _)
    val (rb, fb, mb) = (bounds("recency"), bounds("freq"), bounds("monetary"))
    rfm.select(concat(lit("R"), score("recency", rb),
        lit("F"), score("freq", fb), lit("M"), score("monetary", mb))
        .as("segment"))
      .groupBy(col("segment")).agg(count(lit(1)).as("n_users"))
  }

  private def q175(s: SparkSession, dir: String): DataFrame =
    rfmSegments(Tables.events(s, dir)).orderBy(col("segment"))

  private val q175Sql =
    """WITH pu AS (
      |  SELECT user_id, max(CAST(ts AS DATE)) AS last_d,
      |    count(*) AS freq,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |rfm AS (
      |  SELECT user_id,
      |    CAST(datediff('day', last_d, (SELECT max(last_d) FROM pu))
      |      AS BIGINT) AS recency, freq, monetary
      |  FROM pu),
      |b AS (
      |  SELECT
      |    round(quantile_cont(recency, 0.25), 4) AS r1,
      |    round(quantile_cont(recency, 0.75), 4) AS r2,
      |    round(quantile_cont(freq, 0.25), 4) AS f1,
      |    round(quantile_cont(freq, 0.75), 4) AS f2,
      |    round(quantile_cont(monetary, 0.25), 4) AS m1,
      |    round(quantile_cont(monetary, 0.75), 4) AS m2
      |  FROM rfm),
      |seg AS (
      |  SELECT 'R' ||
      |    (CASE WHEN CAST(recency AS DOUBLE) > r1 THEN 1 ELSE 0 END +
      |     CASE WHEN CAST(recency AS DOUBLE) > r2 THEN 1 ELSE 0 END) ||
      |    'F' ||
      |    (CASE WHEN CAST(freq AS DOUBLE) > f1 THEN 1 ELSE 0 END +
      |     CASE WHEN CAST(freq AS DOUBLE) > f2 THEN 1 ELSE 0 END) ||
      |    'M' ||
      |    (CASE WHEN CAST(monetary AS DOUBLE) > m1 THEN 1 ELSE 0 END +
      |     CASE WHEN CAST(monetary AS DOUBLE) > m2 THEN 1 ELSE 0 END)
      |    AS segment
      |  FROM rfm CROSS JOIN b)
      |SELECT segment, count(*) AS n_users FROM seg
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ==== q176: seasonal-naive forecast evaluation =============================
  //
  // The alerting/capacity baseline every pipeline needs BEFORE any model:
  // forecast(hour h) = actual(h − 24), scored with MAE over all hours
  // where both sides exist. Hourly counts are integers, the error sum is
  // an exact BIGINT, and MAE divides two integers once — the only float is
  // the final rendered ratio. One groupBy + one self equi-join on
  // (type, hour−24), both on hour-level aggregates.

  /** (event_type, n_eval, total_abs_err, mae) of the h−24 naive forecast. */
  def seasonalNaiveEval(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    val actual = hourly.select(col("event_type"), col("hr"), col("cnt"))
    val lagged = hourly.select(col("event_type"), (col("hr") + 24).as("hr"),
      col("cnt").as("forecast"))
    actual.join(lagged, Seq("event_type", "hr"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("cnt") - col("forecast"))).as("total_abs_err"))
      .select(col("event_type"), col("n_eval"), col("total_abs_err"),
        QueryDef.dec4(col("total_abs_err").cast("double") /
          col("n_eval").cast("double")).as("mae"))
  }

  private def q176(s: SparkSession, dir: String): DataFrame =
    seasonalNaiveEval(Tables.events(s, dir)).orderBy(col("event_type"))

  private val q176Sql =
    """WITH h AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |j AS (
      |  SELECT a.event_type, abs(a.cnt - f.cnt) AS err
      |  FROM h a JOIN h f ON a.event_type = f.event_type
      |    AND a.hr = f.hr + 24)
      |SELECT event_type, count(*) AS n_eval,
      |  CAST(sum(err) AS BIGINT) AS total_abs_err,
      |  CAST(CAST(CAST(sum(err) AS DOUBLE) / count(*) AS DECIMAL(38,4))
      |    AS VARCHAR) AS mae
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  // ==== q179: hourly SLA percentiles (exact, bounded-domain) ================
  //
  // The operational p50/p95 dashboard: per hour, exact value percentiles.
  // Values are 2-dp money ⇒ integer cents with a bounded domain, so the
  // per-hour percentile is EXACT with zero percentile-accumulator state:
  // group to (hour, cents) counts, cumulative-rank walk, pick the
  // smallest cents whose cumulative count reaches ⌈p·n⌉ (integer
  // cross-multiplication — the q166 readout idiom). The rank window runs
  // on the (hour × distinct cents) table, never raw events; at 100 TB
  // that is hours × ≤ domain rows.

  /** (hr, n, p50_cents, p95_cents) exact per-hour percentiles. */
  def hourlyPercentiles(events: DataFrame): DataFrame = {
    val counts = events
      .select(expr("unix_micros(ts) div 3600000000").as("hr"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("hr"), col("cents")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hr")).orderBy(col("cents"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("hr"))
    counts
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("hr"), col("n").as("n"))
      .agg(min(when(col("cum") * 100 >= col("n") * 50, col("cents"))).as("p50_cents"),
        min(when(col("cum") * 100 >= col("n") * 95, col("cents"))).as("p95_cents"))
  }

  private def q179(s: SparkSession, dir: String): DataFrame =
    hourlyPercentiles(Tables.events(s, dir)).orderBy(col("hr"))

  private val q179Sql =
    """WITH c AS (
      |  SELECT epoch_us(ts) // 3600000000 AS hr,
      |    CAST(round(value * 100) AS BIGINT) AS cents, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT hr, cents, c,
      |    sum(c) OVER (PARTITION BY hr ORDER BY cents) AS cum,
      |    sum(c) OVER (PARTITION BY hr) AS n
      |  FROM c)
      |SELECT hr, CAST(max(n) AS BIGINT) AS n,
      |  min(CASE WHEN cum * 100 >= n * 50 THEN cents END) AS p50_cents,
      |  min(CASE WHEN cum * 100 >= n * 95 THEN cents END) AS p95_cents
      |FROM cum GROUP BY hr ORDER BY hr""".stripMargin

  // ==== q188: CUSUM changepoint detection via prefix-sum/running-min ========
  //
  // The Page (1954) cumulative-sum detector over per-type hourly rates —
  // the standard "did the level shift" monitor, complementing q181's
  // per-hour spike flags (CUSUM accumulates many small deviations a
  // per-point test never sees). The textbook recurrence S_t = max(0,
  // S_{t-1} + x_t − μ − κ) looks inherently sequential (q169/q181 pay a
  // per-series fold for that shape); CUSUM's max() dissolves instead into
  // the closed form S_t = P_t − min_{j≤t} P_j over the deviation prefix
  // sums P — so the WHOLE detector is two stacked windows (running sum,
  // running min) over hour-level aggregates. No fold, no recursion; at
  // 100 TB the event-scale work is one map-side-combined groupBy and the
  // windows run on the hours×types domain.
  //
  // Exactness: with μ = total/N and κ = μ/4, scaling everything by 4N
  // makes the deviation d'_t = 4N·x_t − 5·total an exact BIGINT; prefix
  // sums, running minima and the alarm test (S' > 8·total ⇔ S > 2μ) stay
  // integer end-to-end. |P| ≤ hours·4N·max(x) — BIGINT-safe until ~10¹⁸
  // scaled event-hours; renormalize κ's denominator first at that scale.

  /** (event_type, hr, cnt, cusum, alarm): one-sided upward CUSUM with
    * drift κ = μ/4 and threshold 2μ; `cusum` is rendered in count units
    * (S′ div 4N). */
  def cusumChangepoints(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    val tot = hourly.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("total"), count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly.join(broadcast(tot), Seq("event_type"))
      .withColumn("d",
        lit(4L) * col("n") * col("cnt") - lit(5L) * col("total"))
      .withColumn("p", sum(col("d")).over(w))
      .withColumn("s", col("p") - least(min(col("p")).over(w), lit(0L)))
      .select(col("event_type"), col("hr"), col("cnt"),
        expr("s div (4 * n)").as("cusum"),
        (col("s") > lit(8L) * col("total")).as("alarm"))
  }

  private def q188(s: SparkSession, dir: String): DataFrame =
    cusumChangepoints(Tables.events(s, dir))
      .orderBy(col("event_type"), col("hr"))

  private val q188Sql =
    """WITH h AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM h GROUP BY 1),
      |d AS (
      |  SELECT h.*, t.total, t.n, 4 * t.n * h.cnt - 5 * t.total AS dd
      |  FROM h JOIN t USING (event_type)),
      |p AS (
      |  SELECT *, sum(dd) OVER (PARTITION BY event_type ORDER BY hr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
      |  FROM d),
      |s AS (
      |  SELECT *, pp - least(min(pp) OVER (PARTITION BY event_type
      |    ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    0) AS sc
      |  FROM p)
      |SELECT event_type, hr, cnt, CAST(sc // (4 * n) AS BIGINT) AS cusum,
      |  sc > 8 * total AS alarm
      |FROM s ORDER BY event_type, hr""".stripMargin

  // ==== q189: top user journeys (daily path census) =========================
  //
  // The product-analytics "what do users actually do" census: each user's
  // chronological type-letter sequence per DAY (the q173 encoding — one
  // char per event, one shuffle, sort inside the row), rolled up to the
  // most frequent paths. q173 counts a GIVEN pattern; this discovers the
  // patterns worth asking about. Path strings are day-bounded, so row
  // width is capped by per-user daily volume; the rollup is a
  // map-side-combined count on the path-domain; top-k is a TakeOrdered.

  /** Top-`k` (path, n) daily event-type journeys. Ties: count desc, then
    * lexicographic path. */
  def topJourneys(events: DataFrame, k: Int): DataFrame =
    events
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ch")).as("e"))
      .groupBy(col("user_id"), col("day"))
      .agg(array_join(transform(sort_array(collect_list(col("e"))),
        e => e.getField("ch")), "").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)

  private def q189(s: SparkSession, dir: String): DataFrame =
    topJourneys(Tables.events(s, dir), 20)

  private val q189Sql =
    """WITH seq AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    string_agg(substr(event_type, 1, 1), ''
      |      ORDER BY epoch_us(ts), event_id) AS path
      |  FROM events GROUP BY 1, 2)
      |SELECT path, count(*) AS n FROM seq
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  // ==== q198: hourly OHLC + VWAP bars =======================================
  //
  // The bar-building aggregation of every metrics/market pipeline: per
  // (event_type, hour) the Opening/High/Low/Closing value plus the
  // count-weighted mean — downsampling a value stream to fixed-interval
  // bars. Open/close are exact argmin/argmax over the (ts, event_id)
  // total order via the min/max-of-struct idiom (one aggregation, no
  // windows, no self-joins — min(struct) keeps whole-stage codegen and
  // map-side partials). Values in cents (the round idiom), so H/L/VWAP
  // numerators are exact BIGINTs; the single VWAP division happens at
  // render. One map-side-combined groupBy — the ideal 100 TB shape.

  /** (event_type, hr, n, open_c, high_c, low_c, close_c, vwap_micro):
    * hourly bars over `value` (cents); vwap_micro = ⌊10⁶·Σc/n⌋ — an
    * EXACT integer division, because a dec4 render of Σc/n lands on
    * half-grid ties whenever n divides a power of two (n=320 at sf1 did:
    * Spark rounds the exact binary up, DuckDB rounds the shortest repr
    * even — the one documented cross-engine decimal gap). */
  def hourlyBars(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("us"), col("event_id"), col("cents")))
          .getField("cents").as("open_c"),
        max(col("cents")).as("high_c"),
        min(col("cents")).as("low_c"),
        max(struct(col("us"), col("event_id"), col("cents")))
          .getField("cents").as("close_c"),
        sum(col("cents")).as("sum_c"))
      .select(col("event_type"), col("hr"), col("n"), col("open_c"),
        col("high_c"), col("low_c"), col("close_c"),
        expr("(sum_c * 1000000) div n").as("vwap_micro"))

  private def q198(s: SparkSession, dir: String): DataFrame =
    hourlyBars(Tables.events(s, dir)).orderBy(col("event_type"), col("hr"))

  private val q198Sql =
    """WITH d AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |    epoch_us(ts) AS us, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type, hr
      |      ORDER BY us, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY event_type, hr
      |      ORDER BY us DESC, event_id DESC) AS rn_d
      |  FROM d)
      |SELECT event_type, hr, count(*) AS n,
      |  CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_c,
      |  CAST(max(cents) AS BIGINT) AS high_c,
      |  CAST(min(cents) AS BIGINT) AS low_c,
      |  CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_c,
      |  CAST(CAST(sum(cents) AS BIGINT) * 1000000 // count(*) AS BIGINT)
      |    AS vwap_micro
      |FROM r GROUP BY 1, 2 ORDER BY event_type, hr""".stripMargin

  // ==== q200: rolling-median robust z-score =================================
  //
  // Robust per-hour anomaly scoring: detrend each series by its trailing
  // 24-hour MEDIAN (level shifts and spikes cannot drag a median the way
  // they drag the mean/EWMA), then flag hours whose deviation exceeds
  // k× the series' global MAD (q118's scale estimate — a per-row rolling
  // MAD is not expressible as stacked windows because each frame would
  // need deviations from ITS OWN median; the global scale is the
  // standard hybrid). Exactness: counts are integers; the 24-value
  // median and the MAD interpolate identically in both engines (the
  // q44/q118 percentile parity), and k·MAD comparisons double against
  // double, bit-stable. Windows run on the hours×types domain only.

  /** (event_type, hr, cnt, roll_med, mad, outlier): trailing-`win`-hour
    * median detrend, |cnt − med| > k·MAD flag. Warm-up rows (fewer than
    * `win` trailing hours) still score against their shorter window. */
  def rollingRobustZ(events: DataFrame, win: Int = 24, k: Double = 5.0): DataFrame = {
    val hourly = events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    val rolled = hourly.withColumn("roll_med",
      expr(s"percentile(cnt, 0.5) over (partition by event_type order by hr " +
        s"rows between ${win - 1} preceding and current row)"))
    val mad = hourly
      .groupBy(col("event_type")).agg(expr("percentile(cnt, 0.5)").as("gmed"))
    val madv = hourly.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(expr("percentile(abs(cnt - gmed), 0.5)").as("mad"))
    rolled.join(broadcast(madv), Seq("event_type"))
      .select(col("event_type"), col("hr"), col("cnt"), col("roll_med"),
        col("mad"),
        (abs(col("cnt") - col("roll_med")) > lit(k) * col("mad")).as("outlier"))
  }

  private def q200(s: SparkSession, dir: String): DataFrame =
    rollingRobustZ(Tables.events(s, dir))
      .select(col("event_type"), col("hr"), col("cnt"),
        QueryDef.dec4(col("roll_med")).as("roll_med"),
        QueryDef.dec4(col("mad")).as("mad"), col("outlier"))
      .orderBy(col("event_type"), col("hr"))

  private val q200Sql =
    """WITH h AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |g AS (SELECT event_type, median(cnt) AS gmed FROM h GROUP BY 1),
      |m AS (
      |  SELECT h.event_type, median(abs(h.cnt - g.gmed)) AS mad
      |  FROM h JOIN g USING (event_type) GROUP BY 1),
      |r AS (
      |  SELECT event_type, hr, cnt,
      |    median(cnt) OVER (PARTITION BY event_type ORDER BY hr
      |      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS roll_med
      |  FROM h)
      |SELECT r.event_type, r.hr, r.cnt,
      |  CAST(CAST(r.roll_med AS DECIMAL(38,4)) AS VARCHAR) AS roll_med,
      |  CAST(CAST(m.mad AS DECIMAL(38,4)) AS VARCHAR) AS mad,
      |  abs(r.cnt - r.roll_med) > 5.0 * m.mad AS outlier
      |FROM r JOIN m USING (event_type)
      |ORDER BY r.event_type, r.hr""".stripMargin

  // ==== q201: segmented regression at the CUSUM changepoint =================
  //
  // Closes the q188 loop from detection into QUANTIFICATION: take the
  // hour where the CUSUM statistic peaks (deterministic: max S, earliest
  // hour on ties), fit separate OLS lines to the hours before and after,
  // and report per series the slope change and the level shift at the
  // break — "the rate jumped by X/hour and the trend changed by Y" that
  // an alert consumer actually wants. Moments per segment are exact
  // BIGINTs over hour indices re-based at the break (the q144
  // discipline); the break selection compares exact integers.

  /** (event_type, break_hr, n_pre, n_post, slope_pre, slope_post,
    * level_shift): OLS per side of the per-series CUSUM argmax. */
  def segmentedAtChangepoint(events: DataFrame): DataFrame = {
    val cusum = cusumChangepoints(events)
      .select(col("event_type"), col("hr"), col("cnt"), col("cusum"))
    val break_ = cusum
      .groupBy(col("event_type"))
      .agg(min(struct((-col("cusum")).as("nc"), col("hr").as("h")))
        .getField("h").as("break_hr"))
    val sided = cusum.join(broadcast(break_), Seq("event_type"))
      .select(col("event_type"), col("break_hr"),
        (col("hr") - col("break_hr")).as("x"), col("cnt").as("y"),
        when(col("hr") < col("break_hr"), lit(0)).otherwise(lit(1)).as("side"))
    val m = sided.groupBy(col("event_type"), col("break_hr"), col("side"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    def dd(c: String) = col(c).cast("double")
    val fitted = m.select(col("event_type"), col("break_hr"), col("side"),
      col("n"),
      ((dd("n") * dd("sxy") - dd("sx") * dd("sy")) /
        (dd("n") * dd("sxx") - dd("sx") * dd("sx"))).as("slope"),
      ((dd("sy") - ((dd("n") * dd("sxy") - dd("sx") * dd("sy")) /
        (dd("n") * dd("sxx") - dd("sx") * dd("sx"))) * dd("sx")) / dd("n"))
        .as("icpt"))
    val pre = fitted.filter(col("side") === 0)
      .select(col("event_type"), col("break_hr"), col("n").as("n_pre"),
        col("slope").as("slope_pre"), col("icpt").as("icpt_pre"))
    val post = fitted.filter(col("side") === 1)
      .select(col("event_type"), col("break_hr"), col("n").as("n_post"),
        col("slope").as("slope_post"), col("icpt").as("icpt_post"))
    pre.join(post, Seq("event_type", "break_hr"))
      .select(col("event_type"), col("break_hr"), col("n_pre"), col("n_post"),
        col("slope_pre"), col("slope_post"),
        (col("icpt_post") - col("icpt_pre")).as("level_shift"))
  }

  private def q201(s: SparkSession, dir: String): DataFrame =
    segmentedAtChangepoint(Tables.events(s, dir))
      .select(col("event_type"), col("break_hr"), col("n_pre"), col("n_post"),
        QueryDef.dec4(col("slope_pre")).as("slope_pre"),
        QueryDef.dec4(col("slope_post")).as("slope_post"),
        QueryDef.dec4(col("level_shift")).as("level_shift"))
      .orderBy(col("event_type"))

  private val q201Sql =
    """WITH h AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM h GROUP BY 1),
      |p AS (
      |  SELECT h.*, t.total, t.n,
      |    sum(4 * t.n * h.cnt - 5 * t.total) OVER (PARTITION BY h.event_type
      |      ORDER BY h.hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS pp
      |  FROM h JOIN t USING (event_type)),
      |s AS (
      |  SELECT *, CAST((pp - least(min(pp) OVER (PARTITION BY event_type
      |    ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    0)) // (4 * n) AS BIGINT) AS cusum
      |  FROM p),
      |brk AS (
      |  SELECT event_type, hr AS break_hr FROM (
      |    SELECT event_type, hr,
      |      row_number() OVER (PARTITION BY event_type
      |        ORDER BY cusum DESC, hr) AS rn
      |    FROM s) WHERE rn = 1),
      |sided AS (
      |  SELECT s.event_type, b.break_hr, s.hr - b.break_hr AS x,
      |    s.cnt AS y, CASE WHEN s.hr < b.break_hr THEN 0 ELSE 1 END AS side
      |  FROM s JOIN brk b ON s.event_type = b.event_type),
      |m AS (
      |  SELECT event_type, break_hr, side, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM sided GROUP BY 1, 2, 3),
      |f AS (
      |  SELECT event_type, break_hr, side, n,
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
      |    (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS icpt
      |  FROM m)
      |SELECT a.event_type, a.break_hr, a.n AS n_pre, b.n AS n_post,
      |  CAST(CAST(a.slope AS DECIMAL(38,4)) AS VARCHAR) AS slope_pre,
      |  CAST(CAST(b.slope AS DECIMAL(38,4)) AS VARCHAR) AS slope_post,
      |  CAST(CAST(b.icpt - a.icpt AS DECIMAL(38,4)) AS VARCHAR)
      |    AS level_shift
      |FROM f a JOIN f b ON a.event_type = b.event_type
      |  AND a.break_hr = b.break_hr AND a.side = 0 AND b.side = 1
      |ORDER BY a.event_type""".stripMargin

  // ==== q220: sequential-pattern pair support ================================
  //
  // The length-2 core of sequential pattern mining (GSP/PrefixSpan's
  // seed step, and the input to "users who do A tend to do B next"
  // analyses): for every ordered type pair (a, b), how many users have
  // SOME a-event strictly before SOME b-event. The naive count is a
  // per-user event self-join — quadratic in the hottest user's history.
  // The rewrite: ∃ tsₐ < ts_b ⟺ min(tsₐ) < max(ts_b), so one map-side-
  // combined groupBy to the (user, type) domain carrying (min_us, max_us)
  // suffices, and the self-join runs on ≤ |types| rows per user — fan-out
  // bounded by the TYPE domain, immune to per-user event skew (the q112
  // funnel discipline). Support fractions divide integers.

  /** Ordered pairs (first_type, then_type, n_users, frac) where n_users
    * counts users with some first_type event strictly before some
    * then_type event. */
  def sequencePairSupport(events: DataFrame): DataFrame = {
    val stats = events.groupBy(col("user_id"), col("event_type"))
      .agg(min(unix_micros(col("ts"))).as("tmin"),
        max(unix_micros(col("ts"))).as("tmax"))
    val total = stats.select(col("user_id")).distinct().count() // one scalar
    stats.toDF("user_id", "first_type", "tmin_a", "tmax_a")
      .join(stats.toDF("user_id", "then_type", "tmin_b", "tmax_b"),
        Seq("user_id"))
      .where(col("first_type") =!= col("then_type") &&
        col("tmin_a") < col("tmax_b"))
      .groupBy(col("first_type"), col("then_type"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("frac", QueryDef.dec4(
        col("n_users").cast("double") / lit(total.toDouble)))
  }

  private def q220(s: SparkSession, dir: String): DataFrame =
    sequencePairSupport(Tables.events(s, dir))
      .orderBy(col("first_type"), col("then_type"))

  // oracle: the same ∃ tsₐ < ts_b ⟺ min(tsₐ) < max(ts_b) identity spelled
  // in SQL over the (user, type) min/max table. The previous naive raw
  // self-join oracle was quadratic in the hottest user's history and
  // became infeasible on the 30%-hot-user skew set (round 14); the
  // identity is the documented mathematical equivalence, and count(*)
  // over one row per (user, type-pair) IS the old count(DISTINCT user).
  private val q220Sql =
    """WITH u AS (SELECT count(DISTINCT user_id) AS nu FROM events),
      |ut AS (
      |  SELECT user_id, event_type, min(ts) AS mn, max(ts) AS mx
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT a.event_type AS first_type, b.event_type AS then_type,
      |    CAST(count(*) AS BIGINT) AS n_users
      |  FROM ut a JOIN ut b ON a.user_id = b.user_id
      |    AND a.event_type <> b.event_type AND a.mn < b.mx
      |  GROUP BY 1, 2)
      |SELECT first_type, then_type, n_users,
      |  CAST(CAST(CAST(n_users AS DOUBLE) / CAST(nu AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS frac
      |FROM p CROSS JOIN u ORDER BY first_type, then_type""".stripMargin

  // ==== q229: Kaplan–Meier survival curve ====================================
  //
  // Time-to-event with right censoring — the retention/conversion curve
  // done correctly (a naive "fraction converted by day t" UNDERSTATES
  // survival because users observed for less than t aren't failures):
  // S(t) = Π_{u ≤ t} (1 − d_u/n_u) over distinct event times u, d = events
  // at u, n = at-risk (duration ≥ u, deaths-before-censoring convention).
  // Subject = user, event = first "purchase" after the user's first
  // observed event, censoring = the corpus observation end for users who
  // never purchase.
  //
  // Scale + determinism shape: one groupBy to the user domain (durations),
  // one to the duration domain (the curve's support, ≤ observation hours);
  // at-risk counts come from an exclusive prefix sum over that domain and
  // the survival PRODUCT telescopes into a cumulative SUM of per-time
  // ⌊10⁶·ln(1−d/n)⌋ integers (one ln per DISTINCT time — the q99/q183
  // rule), so the curve is exact integer arithmetic end to end; windows
  // run on the hours domain only (the q179 discipline).

  /** Per distinct event-time hour: (t_hr, n_risk, d_events,
    * log_surv_unats) — log-survival in micro-nats. A d = n time (S hits
    * exactly 0, possible only at the curve's end) contributes a NULL step,
    * which both engines' null-skipping window sums leave out — the row
    * then carries the last finite log-survival. */
  /** (t, d, n_risk) death/at-risk table over hour-granular durations —
    * the shared frame of Kaplan–Meier (q229) and Nelson–Aalen (q288).
    * Duration = first `eventType` (death) or last-seen (censor). */
  private def survivalRiskTable(events: DataFrame, eventType: String)
      : DataFrame = {
    val byUser = events.groupBy(col("user_id")).agg(
      min(unix_micros(col("ts"))).as("t0"),
      min(when(col("event_type") === eventType, unix_micros(col("ts"))))
        .as("tp"),
      max(unix_micros(col("ts"))).as("tmax_u"))
    val end = broadcast(byUser.agg(max(col("tmax_u")).as("tend")))
    val durs = byUser.crossJoin(end).select(
      when(col("tp").isNotNull,
        floor((col("tp") - col("t0")) / lit(3600000000L)))
        .otherwise(floor((col("tend") - col("t0")) / lit(3600000000L)))
        .cast("long").as("t"),
      when(col("tp").isNotNull, 1L).otherwise(0L).as("ev"))
    // duration-domain histogram: deaths + total leaving at each t
    val hist = durs.groupBy(col("t"))
      .agg(sum(col("ev")).as("d"), count(lit(1)).as("leave"))
    val total = broadcast(durs.agg(count(lit(1)).as("n_total")))
    // at-risk(t) = total − Σ_{u < t} leave(u): exclusive prefix over the
    // hours-domain (≤ observation-window hours — single tiny window)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    hist.crossJoin(total)
      .withColumn("n_risk", col("n_total") - coalesce(sum(col("leave")).over(w), lit(0L)))
      .where(col("d") > 0)
  }

  def kaplanMeier(events: DataFrame, eventType: String): DataFrame = {
    val wInc = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    survivalRiskTable(events, eventType)
      .withColumn("step",
        when(col("d") < col("n_risk"),
          floor(lit(1e6) * log(lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double"))).cast("long")))
      .withColumn("log_surv_unats", sum(col("step")).over(wInc))
      .select(col("t").as("t_hr"), col("n_risk"), col("d").as("d_events"),
        col("log_surv_unats"))
  }

  // ==== q288: Nelson–Aalen cumulative hazard ==================================
  //
  // The hazard-side twin of q229's Kaplan–Meier: H(t) = Σ_{u≤t} d_u/n_u
  // estimates CUMULATIVE RISK directly (and exp(−H) is the Breslow
  // survival, less bias than KM at small risk sets) — the estimator
  // behind "expected churn events by tenure t". Same duration-domain
  // risk table; per-time increments ⌊10⁶·d/n⌋-floored ONCE so the
  // running hazard is an exact integer column (the q229 ulog discipline,
  // without even a log — pure rational increments).

  /** (t_hr, n_risk, d_events, hazard_micro): Nelson–Aalen cumulative
    * hazard in micro-units at every death time. */
  def nelsonAalen(events: DataFrame, eventType: String): DataFrame = {
    val wInc = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    survivalRiskTable(events, eventType)
      .withColumn("step",
        floor(lit(1e6) * col("d").cast("double") /
          col("n_risk").cast("double")).cast("long"))
      .withColumn("hazard_micro", sum(col("step")).over(wInc))
      .select(col("t").as("t_hr"), col("n_risk"), col("d").as("d_events"),
        col("hazard_micro"))
  }

  private def q229(s: SparkSession, dir: String): DataFrame =
    kaplanMeier(Tables.events(s, dir), "purchase").orderBy(col("t_hr"))

  private val q229Sql =
    """WITH bu AS (
      |  SELECT user_id,
      |    min(epoch_us(ts)) AS t0,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp,
      |    max(epoch_us(ts)) AS tmax_u
      |  FROM events GROUP BY user_id),
      |e AS (SELECT max(tmax_u) AS tend FROM bu),
      |durs AS (
      |  SELECT CASE WHEN tp IS NOT NULL
      |      THEN CAST(floor(CAST(tp - t0 AS DOUBLE) / 3600000000.0) AS BIGINT)
      |      ELSE CAST(floor(CAST(tend - t0 AS DOUBLE) / 3600000000.0) AS BIGINT)
      |    END AS t,
      |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM bu CROSS JOIN e),
      |hist AS (
      |  SELECT t, CAST(sum(ev) AS BIGINT) AS d, count(*) AS leave
      |  FROM durs GROUP BY t),
      |tot AS (SELECT count(*) AS n_total FROM durs),
      |risk AS (
      |  SELECT t, d, leave,
      |    n_total - COALESCE(sum(leave) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM hist CROSS JOIN tot),
      |steps AS (
      |  SELECT t, n_risk, d,
      |    CASE WHEN d < n_risk THEN CAST(floor(1e6 * ln(1.0 -
      |      CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))) AS BIGINT) END AS step
      |  FROM risk WHERE d > 0)
      |SELECT t AS t_hr, CAST(n_risk AS BIGINT) AS n_risk, d AS d_events,
      |  CAST(sum(step) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW) AS BIGINT) AS log_surv_unats
      |FROM steps ORDER BY t_hr""".stripMargin

  // ==== q236: deterministic bootstrap confidence interval ====================
  //
  // Nonparametric uncertainty for an arbitrary statistic — the CI that
  // needs no normality assumption (Efron 1979). Statistic here: mean
  // hourly event count. B resamples of the HOUR-DOMAIN series (n ≈ 720
  // rows), each drawing n indices with replacement; the 2.5%/97.5%
  // order statistics of the resample means are the interval.
  //
  // Determinism discipline: draws come from salted md5 of (b, i) — the
  // q102/q124 trick — never a seeded RNG (whose stream depends on row
  // order); resample MEANS compare as exact integer SUMS (n is constant
  // across resamples), so the order statistics are integer-exact and the
  // single float division per bound happens at render. Scale shape: the
  // corpus-sized work is ONE hourly aggregation; the bootstrap operates
  // on B×n domain-sized rows (144k at B=200) — resampling never touches
  // raw events, which is exactly why bootstrap-over-aggregates is the
  // 100 TB-viable form.

  /** One row: (n_hours, b, mean, lo95, hi95) — percentile bootstrap CI
    * of the mean hourly count, B resamples, ranks ⌈0.025B⌉/⌈0.975B⌉. */
  def bootstrapMeanCi(events: DataFrame, b: Int = 200): DataFrame = {
    val spark = events.sparkSession
    val hourly = events
      .groupBy(floor(unix_micros(col("ts")) / lit(3600000000L)).as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val idx = graft.chunk.ChunkAssigner.withPrefixSum(
      hourly.withColumn("__one", lit(1L)), Seq(col("hr")), col("__one"),
      outName = "i").select(col("i"), col("cnt")) // dense 0-based index
    val n = broadcast(idx.agg(count(lit(1)).as("n"), sum(col("cnt")).as("tot")))
    val draws = idx.select(col("i").as("di"))
      .crossJoin(spark.range(b).toDF("b"))
      .crossJoin(n)
      .select(col("b"),
        pmod(conv(substring(md5(concat(lit("bs:"), col("b"), lit("_"),
          col("di"))), 1, 6), 16, 10).cast("long"), col("n")).as("i"))
    val drawn = idx.join(draws, Seq("i"))
    val sums = drawn.groupBy(col("b")).agg(sum(col("cnt")).as("s"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("s"), col("b"))))
    val loRk = math.ceil(0.025 * b).toInt
    val hiRk = math.ceil(0.975 * b).toInt
    sums.crossJoin(n)
      .agg(max(col("n")).as("n_hours"), lit(b.toLong).as("b"),
        QueryDef.dec4(max(col("tot")).cast("double") /
          max(col("n")).cast("double")).as("mean"),
        QueryDef.dec4(max(when(col("rk") === loRk, col("s"))).cast("double") /
          max(col("n")).cast("double")).as("lo95"),
        QueryDef.dec4(max(when(col("rk") === hiRk, col("s"))).cast("double") /
          max(col("n")).cast("double")).as("hi95"))
  }

  private def q236(s: SparkSession, dir: String): DataFrame =
    bootstrapMeanCi(Tables.events(s, dir), b = 200)

  private val q236Sql =
    """WITH hourly AS (
      |  SELECT epoch_us(ts) // 3600000000 AS hr, count(*) AS cnt
      |  FROM events GROUP BY 1),
      |idx AS (
      |  SELECT row_number() OVER (ORDER BY hr) - 1 AS i, cnt FROM hourly),
      |nn AS (SELECT count(*) AS n, CAST(sum(cnt) AS BIGINT) AS tot FROM idx),
      |draws AS (
      |  SELECT b.b, CAST(CAST(concat('0x', substr(md5(
      |      concat('bs:', CAST(b.b AS VARCHAR), '_', CAST(d.i AS VARCHAR))),
      |      1, 6)) AS BIGINT) % nn.n AS BIGINT) AS i
      |  FROM range(200) b(b) CROSS JOIN idx d CROSS JOIN nn),
      |sums AS (
      |  SELECT d.b, CAST(sum(idx.cnt) AS BIGINT) AS s
      |  FROM draws d JOIN idx ON idx.i = d.i GROUP BY d.b),
      |ranked AS (
      |  SELECT s, row_number() OVER (ORDER BY s, b) AS rk FROM sums)
      |SELECT nn.n AS n_hours, CAST(200 AS BIGINT) AS b,
      |  CAST(CAST(CAST(nn.tot AS DOUBLE) / CAST(nn.n AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS mean,
      |  CAST(CAST((SELECT CAST(s AS DOUBLE) FROM ranked WHERE rk = 5)
      |    / CAST(nn.n AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR) AS lo95,
      |  CAST(CAST((SELECT CAST(s AS DOUBLE) FROM ranked WHERE rk = 195)
      |    / CAST(nn.n AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR) AS hi95
      |FROM nn""".stripMargin

  // ==== q238: next-event prediction eval (Markov closed loop) ===============
  //
  // q119 fits the transition matrix; this measures whether it PREDICTS:
  // train argmax-next per current type on a time prefix, score top-1
  // accuracy on the suffix — detection → model → eval closed, the same
  // loop discipline as q95/q184 (train → score → prune). Time split (not
  // random) is the leakage-correct protocol for sequence models. Both
  // phases ride the q119 lead-window shape (one shuffle, per-user
  // windows); the model is type-domain and broadcasts back; accuracy is
  // an integer division at render. The split instant is the q93
  // deterministic convention: a fixed fraction of the observed time
  // span, computed from exact integer bounds.

  /** One row per from_type plus '(all)': (from_type, n_test, n_hit,
    * accuracy) of argmax-next-type prediction trained on the first
    * `trainFrac` of the time span. */
  def markovNextEval(events: DataFrame, trainFrac: Double = 0.7): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .withColumn("to_us", lead(unix_micros(col("ts")), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"),
        unix_micros(col("ts")).as("us"), col("to_us"))
    val span = broadcast(pairs.agg(min(col("us")).as("lo"), max(col("to_us")).as("hi")))
    // integer split instant: lo + ⌊frac · (hi − lo)⌋ — exact both engines
    val withCut = pairs.crossJoin(span)
      .withColumn("cut", col("lo") +
        floor(lit(trainFrac) * (col("hi") - col("lo")).cast("double")).cast("long"))
    // a TRAIN pair is fully inside the prefix (its successor too — no
    // peeking past the cut); TEST pairs start after the cut
    val model = withCut.where(col("to_us") <= col("cut"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("from_type"))
      .agg(min(struct((-col("n")).as("neg"), col("to_type").as("t")))
        .getField("t").as("pred")) // argmax, lexicographic tie-break
    val test = withCut.where(col("us") > col("cut"))
      .join(broadcast(model), Seq("from_type"), "left")
      .groupBy(col("from_type"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("to_type") === col("pred"), 1L).otherwise(0L)).as("n_hit"))
    val per = test.select(col("from_type"), col("n_test"), col("n_hit"),
      QueryDef.dec4(col("n_hit").cast("double") / col("n_test").cast("double"))
        .as("accuracy"))
    val overall = test.agg(sum(col("n_test")).as("n_test"),
        sum(col("n_hit")).as("n_hit"))
      .select(lit("(all)").as("from_type"), col("n_test"), col("n_hit"),
        QueryDef.dec4(col("n_hit").cast("double") / col("n_test").cast("double"))
          .as("accuracy"))
    per.unionAll(overall)
  }

  private def q238(s: SparkSession, dir: String): DataFrame =
    markovNextEval(Tables.events(s, dir)).orderBy(col("from_type"))

  private val q238Sql =
    """WITH pairs AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_type,
      |    epoch_us(ts) AS us,
      |    lead(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_us
      |  FROM events),
      |p AS (SELECT * FROM pairs WHERE to_type IS NOT NULL),
      |span AS (
      |  SELECT min(us) AS lo, max(to_us) AS hi,
      |    min(us) + CAST(floor(0.7 * CAST(max(to_us) - min(us) AS DOUBLE))
      |      AS BIGINT) AS cut
      |  FROM p),
      |model AS (
      |  SELECT from_type, to_type AS pred FROM (
      |    SELECT from_type, to_type, count(*) AS n,
      |      row_number() OVER (PARTITION BY from_type
      |        ORDER BY count(*) DESC, to_type) AS rn
      |    FROM p CROSS JOIN span WHERE to_us <= cut
      |    GROUP BY from_type, to_type)
      |  WHERE rn = 1),
      |test AS (
      |  SELECT p.from_type, count(*) AS n_test,
      |    CAST(sum(CASE WHEN p.to_type = m.pred THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_hit
      |  FROM p CROSS JOIN span LEFT JOIN model m ON m.from_type = p.from_type
      |  WHERE p.us > span.cut
      |  GROUP BY p.from_type)
      |SELECT from_type, n_test, n_hit,
      |  CAST(CAST(CAST(n_hit AS DOUBLE) / CAST(n_test AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS accuracy
      |FROM test
      |UNION ALL
      |SELECT '(all)', CAST(sum(n_test) AS BIGINT), CAST(sum(n_hit) AS BIGINT),
      |  CAST(CAST(CAST(sum(n_hit) AS DOUBLE) / CAST(sum(n_test) AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR)
      |FROM test
      |ORDER BY from_type""".stripMargin

  // ==== q239: frequent triples (beyond-pairs market basket) =================
  //
  // q121 stops at pairs; bundle design and "frequently bought TOGETHER"
  // recommendations need the 3-itemset tier. The enumeration is a chained
  // same-key self-join with a < b < c — per-basket fan-out is C(k, 3) in
  // the BASKET size k, never in corpus volume, and the declared slice
  // bounds k (the q174/q227 contract; at full width the standard
  // mitigation is the a-priori prune: join the third item only onto
  // pairs that already pass min-support — same join shape, one extra
  // filter). Supports divide the same integers on both engines.

  /** Top-`k` part triples co-purchased in one order, with basket support:
    * (p1 < p2 < p3, n_orders, support). Per-basket fan-out is C(size, 3),
    * so the basket-size contract is ENFORCED (the q268 precedent): a
    * basket over `maxBasket` items raises before the chained self-join
    * can cube it, with the a-priori fix named in the error. */
  def frequentTriples(baskets: DataFrame, k: Int,
      maxBasket: Long = 500L): DataFrame = {
    val items = baskets.select(col("bid"), col("item")).distinct()
      .localCheckpoint() // reused 4×: census + total + 3 join legs
    val fattest = items.groupBy(col("bid"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).collect()(0)
    val maxN = if (fattest.isNullAt(0)) 0L else fattest.getLong(0)
    require(maxN <= maxBasket,
      s"frequentTriples: fattest basket holds $maxN distinct items > " +
        s"maxBasket=$maxBasket — per-basket triples are C(n,3); apply " +
        "the a-priori prune first (join the third leg only onto pairs " +
        "already over min-support — same join shape, one extra filter)")
    val total = broadcast(items.select(col("bid")).distinct()
      .agg(count(lit(1)).as("n_baskets")))
    items.toDF("bid", "p1")
      .join(items.toDF("bid", "p2"), Seq("bid")).where(col("p1") < col("p2"))
      .join(items.toDF("bid", "p3"), Seq("bid")).where(col("p2") < col("p3"))
      .groupBy(col("p1"), col("p2"), col("p3"))
      .agg(count(lit(1)).as("n_orders"))
      .crossJoin(total)
      .select(col("p1"), col("p2"), col("p3"), col("n_orders"),
        QueryDef.dec4(col("n_orders").cast("double") /
          col("n_baskets").cast("double")).as("support"))
      .orderBy(col("n_orders").desc, col("p1"), col("p2"), col("p3"))
      .limit(k)
  }

  private def q239(s: SparkSession, dir: String): DataFrame =
    frequentTriples(
      Tables.lineitem(s, dir).where(pmod(col("l_partkey"), lit(5)) === 0)
        .select(col("l_orderkey").as("bid"), col("l_partkey").as("item")),
      k = 20)

  private val q239Sql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS bid, l_partkey AS item
      |  FROM lineitem WHERE l_partkey % 5 = 0),
      |tot AS (SELECT count(DISTINCT bid) AS n_baskets FROM items),
      |t AS (
      |  SELECT a.item AS p1, b.item AS p2, c.item AS p3,
      |    count(*) AS n_orders
      |  FROM items a
      |  JOIN items b ON a.bid = b.bid AND a.item < b.item
      |  JOIN items c ON b.bid = c.bid AND b.item < c.item
      |  GROUP BY 1, 2, 3)
      |SELECT p1, p2, p3, n_orders,
      |  CAST(CAST(CAST(n_orders AS DOUBLE) / CAST(n_baskets AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS support
      |FROM t CROSS JOIN tot
      |ORDER BY n_orders DESC, p1, p2, p3 LIMIT 20""".stripMargin

  // ==== q241: log-rank test — two-group survival comparison =================
  //
  // The inference companion to q229: does time-to-conversion DIFFER between
  // two randomized cohorts? Mantel–Haenszel log-rank over the duration
  // domain: at each distinct death time t with d(t) total deaths and
  // n1/n2 at risk, O1 accumulates d1(t), E1 accumulates d(t)·n1(t)/n(t),
  // V accumulates d·n1·n2·(n−d)/(n²·(n−1)) — the hypergeometric variance.
  // Statistic (O1, E1, V, χ²) not p-value: the χ² CDF is libm territory,
  // the q197/q213 rule. Group = user_id parity — the deterministic
  // stand-in for a randomized assignment column.
  //
  // Scale + determinism shape: the user-domain groupBy is the ONLY
  // corpus-sized pass (exactly q229's shape, one extra projected column);
  // the O/E/V sums run on the duration DOMAIN (≤ observation hours, a
  // single tiny window). E and V accumulate as per-time ⌊10⁶·x⌋ integers —
  // ONE double expression per DISTINCT death time, written
  // operand-for-operand identically in both engines (the micro-unit
  // rule), so the cross-engine totals are exact integer sums and the
  // single-row render does one division.

  /** One row: (n1_users, n2_users, o1, o2, e1_micro, v_micro, chi2) —
    * log-rank comparison of time-to-`eventType` between user_id-parity
    * cohorts (group 1 = even user_id). Censoring and duration semantics
    * are exactly [[kaplanMeier]]'s. */
  def logRankTest(events: DataFrame, eventType: String): DataFrame = {
    val byUser = events.groupBy(col("user_id")).agg(
      min(unix_micros(col("ts"))).as("t0"),
      min(when(col("event_type") === eventType, unix_micros(col("ts"))))
        .as("tp"),
      max(unix_micros(col("ts"))).as("tmax_u"))
    val end = broadcast(byUser.agg(max(col("tmax_u")).as("tend")))
    val durs = byUser.crossJoin(end).select(
      when(pmod(col("user_id"), lit(2)) === 0, 1L).otherwise(2L).as("g"),
      when(col("tp").isNotNull,
        floor((col("tp") - col("t0")) / lit(3600000000L)))
        .otherwise(floor((col("tend") - col("t0")) / lit(3600000000L)))
        .cast("long").as("t"),
      when(col("tp").isNotNull, 1L).otherwise(0L).as("ev"))
    // duration-domain two-group histogram: deaths + total leaving at t
    val hist = durs.groupBy(col("t")).agg(
      sum(when(col("g") === 1, col("ev")).otherwise(0L)).as("d1"),
      sum(when(col("g") === 2, col("ev")).otherwise(0L)).as("d2"),
      sum(when(col("g") === 1, 1L).otherwise(0L)).as("l1"),
      sum(when(col("g") === 2, 1L).otherwise(0L)).as("l2"))
    val tot = broadcast(durs.agg(
      sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1tot"),
      sum(when(col("g") === 2, 1L).otherwise(0L)).as("n2tot")))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = hist.crossJoin(tot)
      .withColumn("n1",
        col("n1tot") - coalesce(sum(col("l1")).over(w), lit(0L)))
      .withColumn("n2",
        col("n2tot") - coalesce(sum(col("l2")).over(w), lit(0L)))
      .withColumn("d", col("d1") + col("d2"))
      .withColumn("n", col("n1") + col("n2"))
      .where(col("d") > 0)
    val terms = risk
      .withColumn("e1_u", floor(lit(1e6) * col("d").cast("double") *
        col("n1").cast("double") / col("n").cast("double")).cast("long"))
      .withColumn("v_u", when(col("n") > 1,
        floor(lit(1e6) * col("d").cast("double") * col("n1").cast("double") *
          col("n2").cast("double") * (col("n") - col("d")).cast("double") /
          (col("n").cast("double") * col("n").cast("double") *
            (col("n") - lit(1)).cast("double"))).cast("long"))
        .otherwise(lit(0L)))
    terms.agg(
      max(col("n1tot")).as("n1_users"), max(col("n2tot")).as("n2_users"),
      sum(col("d1")).as("o1"), sum(col("d2")).as("o2"),
      sum(col("e1_u")).as("e1_micro"), sum(col("v_u")).as("v_micro"))
      .select(col("n1_users"), col("n2_users"), col("o1"), col("o2"),
        col("e1_micro"), col("v_micro"),
        // degenerate-variance guard (the q243/q253/q254 rule): with zero
        // or degenerate deaths v_micro = 0 and the division would yield
        // NaN/Inf — Spark's DECIMAL cast nulls it while DuckDB raises
        QueryDef.dec4(when(col("v_micro") > 0,
          (col("o1").cast("double") - col("e1_micro").cast("double") / lit(1e6)) *
            (col("o1").cast("double") - col("e1_micro").cast("double") / lit(1e6)) /
            (col("v_micro").cast("double") / lit(1e6)))).as("chi2"))
  }

  private def q241(s: SparkSession, dir: String): DataFrame =
    logRankTest(Tables.events(s, dir), "purchase")

  private val q241Sql =
    """WITH bu AS (
      |  SELECT user_id,
      |    min(epoch_us(ts)) AS t0,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp,
      |    max(epoch_us(ts)) AS tmax_u
      |  FROM events GROUP BY user_id),
      |e AS (SELECT max(tmax_u) AS tend FROM bu),
      |durs AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 2 END AS g,
      |    CASE WHEN tp IS NOT NULL
      |      THEN CAST(floor(CAST(tp - t0 AS DOUBLE) / 3600000000.0) AS BIGINT)
      |      ELSE CAST(floor(CAST(tend - t0 AS DOUBLE) / 3600000000.0) AS BIGINT)
      |    END AS t,
      |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM bu CROSS JOIN e),
      |hist AS (
      |  SELECT t,
      |    CAST(sum(CASE WHEN g = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
      |    CAST(sum(CASE WHEN g = 2 THEN ev ELSE 0 END) AS BIGINT) AS d2,
      |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS l1,
      |    CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS l2
      |  FROM durs GROUP BY t),
      |tot AS (
      |  SELECT CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1tot,
      |    CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2tot
      |  FROM durs),
      |risk AS (
      |  SELECT t, d1, d2, n1tot, n2tot,
      |    n1tot - COALESCE(sum(l1) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
      |    n2tot - COALESCE(sum(l2) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n2
      |  FROM hist CROSS JOIN tot),
      |terms AS (
      |  SELECT d1, d2, n1tot, n2tot,
      |    CAST(floor(1e6 * CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE)
      |      / CAST(n1 + n2 AS DOUBLE)) AS BIGINT) AS e1_u,
      |    CASE WHEN n1 + n2 > 1 THEN
      |      CAST(floor(1e6 * CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE)
      |        * CAST(n2 AS DOUBLE)
      |        * CAST((n1 + n2) - (d1 + d2) AS DOUBLE)
      |        / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
      |          * CAST((n1 + n2) - 1 AS DOUBLE))) AS BIGINT)
      |      ELSE 0 END AS v_u
      |  FROM risk WHERE d1 + d2 > 0),
      |s AS (
      |  SELECT max(n1tot) AS n1_users, max(n2tot) AS n2_users,
      |    CAST(sum(d1) AS BIGINT) AS o1, CAST(sum(d2) AS BIGINT) AS o2,
      |    CAST(sum(e1_u) AS BIGINT) AS e1_micro,
      |    CAST(sum(v_u) AS BIGINT) AS v_micro
      |  FROM terms)
      |SELECT n1_users, n2_users, o1, o2, e1_micro, v_micro,
      |  CAST(CAST(CASE WHEN v_micro > 0 THEN
      |    (CAST(o1 AS DOUBLE) - CAST(e1_micro AS DOUBLE) / 1e6)
      |    * (CAST(o1 AS DOUBLE) - CAST(e1_micro AS DOUBLE) / 1e6)
      |    / (CAST(v_micro AS DOUBLE) / 1e6)
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS chi2
      |FROM s""".stripMargin

  // ==== q242: deterministic permutation test ================================
  //
  // The exact-randomization companion to q236's bootstrap: is the observed
  // difference in per-user mean spend between the two assignment cohorts
  // (user_id parity — q241's A/B) explainable by chance? For each of B
  // label permutations, users are re-ranked by salted md5 and the first
  // n1 ranks form pseudo-group A (a deterministic uniform permutation —
  // the q102/q124 no-RNG rule); the tail count of permuted |diff| ≥
  // observed |diff| is the test.
  //
  // Determinism + scale shape: per-user spend integerizes to CENTS, and
  // because every permutation preserves the group sizes (n1, n2), the
  // mean comparison |s1/n1 − s2/n2| clears denominators to the exact
  // integer comparison |s1·n2 − s2·n1| — no float enters the decision,
  // only the two rendered means divide. Corpus-sized work = ONE user-domain
  // groupBy; the permutation machinery runs on B × |users| rows of
  // aggregates (the bootstrap-over-aggregates argument). The per-b md5
  // rank window is user-domain-sized; for 1e9-user corpora replace it
  // with the q122 bucketed prefix scan per b.

  /** One row: (n1, n2, b, mean1, mean2, n_ge, p_frac) — permutation test
    * of the per-user mean spend (cents of `value`) difference between
    * even- and odd-user_id cohorts; n_ge counts the B md5-drawn
    * permutations whose |diff| is at least the observed |diff|. */
  def permutationTest(events: DataFrame, b: Int = 200): DataFrame = {
    val spark = events.sparkSession
    val users = events.groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val obs = broadcast(users.agg(
      sum(when(pmod(col("user_id"), lit(2)) === 0, 1L).otherwise(0L)).as("n1"),
      sum(when(pmod(col("user_id"), lit(2)) === 0, col("cents"))
        .otherwise(0L)).as("s1"),
      sum(when(pmod(col("user_id"), lit(2)) === 1, 1L).otherwise(0L)).as("n2"),
      sum(when(pmod(col("user_id"), lit(2)) === 1, col("cents"))
        .otherwise(0L)).as("s2")))
    val perms = users.crossJoin(spark.range(b).toDF("b"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("b")).orderBy(
          md5(concat(lit("pt:"), col("b"), lit("_"), col("user_id"))),
          col("user_id"))))
    val sums = perms.crossJoin(obs).groupBy(col("b")).agg(
      sum(when(col("rk") <= col("n1"), col("cents")).otherwise(0L)).as("p1"),
      sum(when(col("rk") > col("n1"), col("cents")).otherwise(0L)).as("p2"))
    sums.crossJoin(obs)
      .agg(
        max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        lit(b.toLong).as("b"),
        QueryDef.dec4(max(col("s1")).cast("double") /
          max(col("n1")).cast("double") / lit(100.0)).as("mean1"),
        QueryDef.dec4(max(col("s2")).cast("double") /
          max(col("n2")).cast("double") / lit(100.0)).as("mean2"),
        // cent totals cast to DECIMAL before the cross-multiply: total·n
        // exceeds 2^63 at large SF — Spark would wrap silently where the
        // DuckDB twin (HUGEINT) raises, so both engines stay exact instead
        sum(when(
          abs(col("p1").cast("decimal(38,0)") * col("n2") -
            col("p2").cast("decimal(38,0)") * col("n1")) >=
            abs(col("s1").cast("decimal(38,0)") * col("n2") -
              col("s2").cast("decimal(38,0)") * col("n1")), 1L)
          .otherwise(0L)).as("n_ge"))
      .withColumn("p_frac",
        QueryDef.dec4(col("n_ge").cast("double") / lit(b.toDouble)))
  }

  private def q242(s: SparkSession, dir: String): DataFrame =
    permutationTest(Tables.events(s, dir), b = 200)

  private val q242Sql =
    """WITH users AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY user_id),
      |obs AS (
      |  SELECT
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n1,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN cents ELSE 0 END)
      |      AS BIGINT) AS s1,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n2,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN cents ELSE 0 END)
      |      AS BIGINT) AS s2
      |  FROM users),
      |perms AS (
      |  SELECT b.b, u.cents, row_number() OVER (PARTITION BY b.b ORDER BY
      |      md5(concat('pt:', CAST(b.b AS VARCHAR), '_',
      |        CAST(u.user_id AS VARCHAR))), u.user_id) AS rk
      |  FROM users u CROSS JOIN range(200) b(b)),
      |sums AS (
      |  SELECT p.b,
      |    CAST(sum(CASE WHEN p.rk <= obs.n1 THEN p.cents ELSE 0 END)
      |      AS BIGINT) AS p1,
      |    CAST(sum(CASE WHEN p.rk > obs.n1 THEN p.cents ELSE 0 END)
      |      AS BIGINT) AS p2
      |  FROM perms p CROSS JOIN obs GROUP BY p.b),
      |agg AS (
      |  SELECT max(obs.n1) AS n1, max(obs.n2) AS n2, CAST(200 AS BIGINT) AS b,
      |    CAST(CAST(max(obs.s1) AS DOUBLE) / CAST(max(obs.n1) AS DOUBLE)
      |      / 100.0 AS DECIMAL(38,4)) AS m1,
      |    CAST(CAST(max(obs.s2) AS DOUBLE) / CAST(max(obs.n2) AS DOUBLE)
      |      / 100.0 AS DECIMAL(38,4)) AS m2,
      |    CAST(sum(CASE WHEN
      |        abs(CAST(s.p1 AS HUGEINT) * obs.n2
      |          - CAST(s.p2 AS HUGEINT) * obs.n1)
      |        >= abs(CAST(obs.s1 AS HUGEINT) * obs.n2
      |          - CAST(obs.s2 AS HUGEINT) * obs.n1)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
      |  FROM sums s CROSS JOIN obs)
      |SELECT n1, n2, b, CAST(m1 AS VARCHAR) AS mean1,
      |  CAST(m2 AS VARCHAR) AS mean2, n_ge,
      |  CAST(CAST(CAST(n_ge AS DOUBLE) / 200.0 AS DECIMAL(38,4)) AS VARCHAR)
      |    AS p_frac
      |FROM agg""".stripMargin

  // ==== q251: difference-in-differences estimator ============================
  //
  // The panel-data causal workhorse completing the q230 (stratified ATT) /
  // q241 (log-rank) / q242 (permutation) family: with treatment = user_id
  // parity (the repo's deterministic randomization stand-in) and the
  // period split at the OBSERVED time-range midpoint, DiD = (ȳ_T,post −
  // ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) cancels both the group baseline and
  // the common time trend. Scale shape: ONE corpus pass into a 4-cell
  // aggregate (group × period), after a broadcast of the 1-row min/max
  // range; the estimate is arithmetic over the 4 cells. Value sums follow
  // the q36 double-sum precedent; the midpoint is exact integer micros.

  /** One row: per-cell counts/means plus the DiD estimate of `value`.
    * Treatment = odd user_id; post = ts at or after the range midpoint. */
  def diffInDiff(events: DataFrame): DataFrame = {
    val range = broadcast(events.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts"))))
        .cast("long").divide(lit(2L))).cast("long").as("cut")))
    val cells = events.crossJoin(range)
      .select(
        when(pmod(col("user_id"), lit(2)) === 1, 1L).otherwise(0L).as("t"),
        when(unix_micros(col("ts")) >= col("cut"), 1L).otherwise(0L)
          .as("post"),
        col("value"), col("cut"))
      .groupBy(col("t"), col("post"))
      .agg(max(col("cut")).as("cut"), count(lit(1)).as("n"),
        sum(col("value")).as("s"))
    def cell(t: Int, post: Int, c: String) =
      max(when(col("t") === t && col("post") === post, col(c)))
    val w = cells.agg(
      max(col("cut")).as("cut_us"),
      cell(1, 0, "n").as("n_t_pre"), cell(1, 1, "n").as("n_t_post"),
      cell(0, 0, "n").as("n_c_pre"), cell(0, 1, "n").as("n_c_post"),
      cell(1, 0, "s").as("s_t_pre"), cell(1, 1, "s").as("s_t_post"),
      cell(0, 0, "s").as("s_c_pre"), cell(0, 1, "s").as("s_c_post"))
    def m(s: String, n: String) = col(s) / col(n).cast("double")
    w.select(col("cut_us"),
      col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
      QueryDef.dec4(m("s_t_pre", "n_t_pre")).as("mean_t_pre"),
      QueryDef.dec4(m("s_t_post", "n_t_post")).as("mean_t_post"),
      QueryDef.dec4(m("s_c_pre", "n_c_pre")).as("mean_c_pre"),
      QueryDef.dec4(m("s_c_post", "n_c_post")).as("mean_c_post"),
      QueryDef.dec4((m("s_t_post", "n_t_post") - m("s_t_pre", "n_t_pre"))
        - (m("s_c_post", "n_c_post") - m("s_c_pre", "n_c_pre"))).as("did"))
  }

  private def q251(s: SparkSession, dir: String): DataFrame =
    diffInDiff(Tables.events(s, dir))

  private val q251Sql =
    """WITH rg AS (
      |  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2
      |    AS BIGINT) AS cut FROM events),
      |cells AS (
      |  SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS t,
      |    CASE WHEN epoch_us(ts) >= cut THEN 1 ELSE 0 END AS post,
      |    max(cut) AS cut, count(*) AS n, sum(value) AS s
      |  FROM events CROSS JOIN rg GROUP BY 1, 2),
      |w AS (
      |  SELECT max(cut) AS cut_us,
      |    max(CASE WHEN t = 1 AND post = 0 THEN n END) AS n_t_pre,
      |    max(CASE WHEN t = 1 AND post = 1 THEN n END) AS n_t_post,
      |    max(CASE WHEN t = 0 AND post = 0 THEN n END) AS n_c_pre,
      |    max(CASE WHEN t = 0 AND post = 1 THEN n END) AS n_c_post,
      |    max(CASE WHEN t = 1 AND post = 0 THEN s END) AS s_t_pre,
      |    max(CASE WHEN t = 1 AND post = 1 THEN s END) AS s_t_post,
      |    max(CASE WHEN t = 0 AND post = 0 THEN s END) AS s_c_pre,
      |    max(CASE WHEN t = 0 AND post = 1 THEN s END) AS s_c_post
      |  FROM cells)
      |SELECT cut_us, n_t_pre, n_t_post, n_c_pre, n_c_post,
      |  CAST(CAST(s_t_pre / CAST(n_t_pre AS DOUBLE) AS DECIMAL(38,4))
      |    AS VARCHAR) AS mean_t_pre,
      |  CAST(CAST(s_t_post / CAST(n_t_post AS DOUBLE) AS DECIMAL(38,4))
      |    AS VARCHAR) AS mean_t_post,
      |  CAST(CAST(s_c_pre / CAST(n_c_pre AS DOUBLE) AS DECIMAL(38,4))
      |    AS VARCHAR) AS mean_c_pre,
      |  CAST(CAST(s_c_post / CAST(n_c_post AS DOUBLE) AS DECIMAL(38,4))
      |    AS VARCHAR) AS mean_c_post,
      |  CAST(CAST((s_t_post / CAST(n_t_post AS DOUBLE)
      |      - s_t_pre / CAST(n_t_pre AS DOUBLE))
      |    - (s_c_post / CAST(n_c_post AS DOUBLE)
      |      - s_c_pre / CAST(n_c_pre AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS did
      |FROM w""".stripMargin

  // ==== q266: Wilson score intervals for conversion rates =====================
  //
  // Point conversion rates (q265) without intervals invite over-reading
  // small funnels; the Wilson score interval is the standard fix (it
  // never leaves [0,1] and behaves at tiny k where the normal interval
  // fails): center (p̂ + z²/2n)/(1+z²/n), half-width
  // z√(p̂(1−p̂)/n + z²/4n²)/(1+z²/n). z = 1.96 (95%) is the compile-time
  // constant 1959963 micro (z² = 3841458 micro) — the q246/q252 rule, no
  // CDF at runtime. Measured proportion: FIRST-DAY adoption — the share
  // of users who touch the type within 24 h of their first event (plain
  // "ever touches" saturates at 1.0 on this corpus and the intervals
  // degenerate). Two user-domain aggregations joined on user_id, then a
  // type-domain rollup; the interval arithmetic is one double formula
  // per TYPE row from exact integers.

  /** Per event type: (event_type, n_users, k, rate, lo, hi) — the 95%
    * Wilson interval for P(user adopts this type in their first day). */
  def wilsonRates(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), unix_micros(col("ts")).as("tu"),
      col("event_type"))
    val fe = e.groupBy(col("user_id")).agg(min(col("tu")).as("fe"))
    val n = broadcast(fe.agg(count(lit(1)).as("n")))
    val k = e.groupBy(col("user_id"), col("event_type"))
      .agg(min(col("tu")).as("ft"))
      .join(fe, Seq("user_id"))
      .filter(col("ft") < col("fe") + 86400000000L)
      .groupBy(col("event_type")).agg(count(lit(1)).as("k"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val z = lit(1959963.0) / lit(1e6)
    val z2 = lit(3841458.0) / lit(1e6)
    val p = dd(col("k")) / dd(col("n"))
    val denom = lit(1.0) + z2 / dd(col("n"))
    val center = (p + z2 / (lit(2.0) * dd(col("n")))) / denom
    val half = z * sqrt(p * (lit(1.0) - p) / dd(col("n")) +
      z2 / (lit(4.0) * dd(col("n")) * dd(col("n")))) / denom
    k.crossJoin(n)
      .select(col("event_type"), col("n").as("n_users"), col("k"),
        QueryDef.dec4(p).as("rate"),
        QueryDef.dec4(center - half).as("lo"),
        QueryDef.dec4(center + half).as("hi"))
      .orderBy(col("event_type"))
  }

  private def q266(s: SparkSession, dir: String): DataFrame =
    wilsonRates(Tables.events(s, dir))

  private val q266Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS tu, event_type FROM events),
      |fe AS (SELECT user_id, min(tu) AS fe FROM e GROUP BY user_id),
      |n AS (SELECT count(*) AS n FROM fe),
      |k AS (
      |  SELECT event_type, count(*) AS k FROM (
      |    SELECT e.user_id, e.event_type, min(tu) AS ft
      |    FROM e GROUP BY 1, 2) ut
      |  JOIN fe USING (user_id)
      |  WHERE ft < fe + 86400000000
      |  GROUP BY event_type)
      |SELECT event_type, n AS n_users, k,
      |  CAST(CAST(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS rate,
      |  CAST(CAST(
      |    (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
      |      + 3841458.0 / 1000000.0 / (2.0 * CAST(n AS DOUBLE)))
      |      / (1.0 + 3841458.0 / 1000000.0 / CAST(n AS DOUBLE))
      |    - 1959963.0 / 1000000.0
      |      * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
      |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
      |        / CAST(n AS DOUBLE)
      |        + 3841458.0 / 1000000.0
      |          / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |      / (1.0 + 3841458.0 / 1000000.0 / CAST(n AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS lo,
      |  CAST(CAST(
      |    (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
      |      + 3841458.0 / 1000000.0 / (2.0 * CAST(n AS DOUBLE)))
      |      / (1.0 + 3841458.0 / 1000000.0 / CAST(n AS DOUBLE))
      |    + 1959963.0 / 1000000.0
      |      * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
      |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
      |        / CAST(n AS DOUBLE)
      |        + 3841458.0 / 1000000.0
      |          / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |      / (1.0 + 3841458.0 / 1000000.0 / CAST(n AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS hi
      |FROM k CROSS JOIN n ORDER BY event_type""".stripMargin

  // ==== q265: time-constrained funnel =========================================
  //
  // q112's funnel says the stages happened IN ORDER; product analytics
  // almost always adds deadlines — "click within 24 h of the first view,
  // purchase within 7 d of that click" — because an order-only funnel
  // credits conversions that took a month. Semantics: first view, then
  // the FIRST click inside (fv, fv+24h], then the FIRST purchase inside
  // (fc, fc+7d] — each stage anchors on the previous stage's chosen
  // event (the standard strict-anchor definition). Scale shape: three
  // user-domain aggregations, each joining the previous stage's 1-row-
  // per-user frame back to events — all co-partitioned on user_id, ONE
  // logical shuffle reused; windows are exact integer micros.

  /** One row: (n_users, n_view, n_click_24h, n_purchase_7d, p_click,
    * p_purchase) — strict-anchor funnel with per-stage deadlines. */
  def timedFunnel(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), unix_micros(col("ts")).as("tu"),
      col("event_type"))
    val clickWinUs = 86400000000L; val purchWinUs = 7L * 86400000000L
    val s1 = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("tu"))).as("fv"))
    val s2 = e.join(s1, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(max(col("fv")).as("fv"),
        min(when(col("event_type") === "click" && col("tu") > col("fv") &&
          col("tu") <= col("fv") + clickWinUs, col("tu"))).as("fc"))
    val s3 = e.join(s2, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(max(col("fv")).as("fv"), max(col("fc")).as("fc"),
        min(when(col("event_type") === "purchase" && col("tu") > col("fc") &&
          col("tu") <= col("fc") + purchWinUs, col("tu"))).as("fp"))
    s3.agg(count(lit(1)).as("n_users"),
      sum(when(col("fv").isNotNull, 1L).otherwise(0L)).as("n_view"),
      sum(when(col("fc").isNotNull, 1L).otherwise(0L)).as("n_click_24h"),
      sum(when(col("fp").isNotNull, 1L).otherwise(0L))
        .as("n_purchase_7d"))
      .select(col("n_users"), col("n_view"), col("n_click_24h"),
        col("n_purchase_7d"),
        QueryDef.dec4(col("n_click_24h").cast("double") /
          col("n_view").cast("double")).as("p_click"),
        QueryDef.dec4(col("n_purchase_7d").cast("double") /
          col("n_click_24h").cast("double")).as("p_purchase"))
  }

  private def q265(s: SparkSession, dir: String): DataFrame =
    timedFunnel(Tables.events(s, dir))

  private val q265Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS tu, event_type FROM events),
      |s1 AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN tu END) AS fv
      |  FROM e GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, max(fv) AS fv,
      |    min(CASE WHEN event_type = 'click' AND tu > fv
      |      AND tu <= fv + 86400000000 THEN tu END) AS fc
      |  FROM e JOIN s1 USING (user_id) GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, max(fv) AS fv, max(fc) AS fc,
      |    min(CASE WHEN event_type = 'purchase' AND tu > fc
      |      AND tu <= fc + 604800000000 THEN tu END) AS fp
      |  FROM e JOIN s2 USING (user_id) GROUP BY 1)
      |SELECT count(*) AS n_users,
      |  CAST(sum(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_view,
      |  CAST(sum(CASE WHEN fc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_click_24h,
      |  CAST(sum(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_purchase_7d,
      |  CAST(CAST(CAST(sum(CASE WHEN fc IS NOT NULL THEN 1 ELSE 0 END)
      |      AS DOUBLE)
      |    / CAST(sum(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS p_click,
      |  CAST(CAST(CAST(sum(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END)
      |      AS DOUBLE)
      |    / CAST(sum(CASE WHEN fc IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS p_purchase
      |FROM s3""".stripMargin

  // ==== q263: quantile treatment effects (QTE) ===============================
  //
  // Mean effects (q251/q254/q261) can hide WHERE in the distribution a
  // treatment acts; QTE reports q_t(p) − q_c(p) at the deciles — the
  // distributional readout regulators and pricing teams actually ask
  // for. Both quantile vectors come from the q113 distributed
  // order-statistics path (exact interpolated order stats, never a
  // global sort of raw rows), snapped to the 4-dp grid with math.rint —
  // the ONE boundary-rounding rule for broadcast quantiles in this repo
  // (q143/q159 note: rint matches DuckDB's round on exact half-grid
  // ties). Effects subtract the SNAPPED values, so both engines subtract
  // identical doubles. Units: value cents.

  /** 9 rows: (p_pct, q_t, q_c, qte) — treated/control value-cent deciles
    * and their gaps; treatment = odd user_id. */
  def quantileTreatmentEffects(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ps = (1 to 9).map(_ / 10.0)
    val base = events.select(
      round(col("value") * 100).cast("long").as("vc"),
      pmod(col("user_id"), lit(2)).as("g"))
    def snap(x: Double): Double = math.rint(x * 10000) / 10000
    val qt = Profiling.exactQuantiles(base.filter(col("g") === 1), "vc", ps)
      .map(snap)
    val qc = Profiling.exactQuantiles(base.filter(col("g") === 0), "vc", ps)
      .map(snap)
    (1 to 9).map(i => (i * 10, qt(i - 1), qc(i - 1)))
      .toDF("p_pct", "qt", "qc")
      .select(col("p_pct"), QueryDef.dec4(col("qt")).as("q_t"),
        QueryDef.dec4(col("qc")).as("q_c"),
        QueryDef.dec4(col("qt") - col("qc")).as("qte"))
      .orderBy(col("p_pct"))
  }

  private def q263(s: SparkSession, dir: String): DataFrame =
    quantileTreatmentEffects(Tables.events(s, dir))

  private val q263Sql = {
    val fr = (1 to 9).map(i => s"0.$i").mkString(", ")
    s"""WITH d AS (
       |  SELECT CAST(round(value * 100) AS BIGINT) AS vc, user_id % 2 AS g
       |  FROM events),
       |t AS (SELECT list_transform(quantile_cont(vc, [$fr]),
       |  x -> round(x, 4)) AS qs FROM d WHERE g = 1),
       |c AS (SELECT list_transform(quantile_cont(vc, [$fr]),
       |  x -> round(x, 4)) AS qs FROM d WHERE g = 0)
       |SELECT CAST(10 * r.i AS INTEGER) AS p_pct,
       |  CAST(CAST(t.qs[CAST(r.i AS INTEGER)] AS DECIMAL(38,4)) AS VARCHAR)
       |    AS q_t,
       |  CAST(CAST(c.qs[CAST(r.i AS INTEGER)] AS DECIMAL(38,4)) AS VARCHAR)
       |    AS q_c,
       |  CAST(CAST(t.qs[CAST(r.i AS INTEGER)] - c.qs[CAST(r.i AS INTEGER)]
       |    AS DECIMAL(38,4)) AS VARCHAR) AS qte
       |FROM range(1, 10) r(i) CROSS JOIN t CROSS JOIN c
       |ORDER BY p_pct""".stripMargin
  }

  // ==== q262: A/B sample-size planner (power analysis) =======================
  //
  // The design-time member of the experimentation suite (q246 runs the
  // test, q251/q254/q261 analyze it — this sizes it): for a two-sample
  // mean test at α = .05 two-sided, power = .80, n per arm =
  // 2σ²(z_{.975}+z_{.80})²/Δ². The z constants are compile-time:
  // (1.9599639845…+0.8416212336…)² hard-coded as ⌊10⁶·K⌋ = 7848879
  // micro-units in both engines — the only "distribution table" the
  // formula needs, so there is no CDF anywhere. σ² comes from exact
  // DECIMAL cent moments in ONE corpus pass; Δ sweeps a relative-MDE
  // grid (1/2/5/10% of the mean), each row one double formula + ceil
  // from identical integers.

  /** One row per MDE: (mde_pct, n, mean, sd, n_per_arm). */
  def sampleSizePlan(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val m = events.select(round(col("value") * 100).cast("long").as("vc"))
      .agg(count(lit(1)).as("n"),
        sum(col("vc")).cast("decimal(38,0)").as("s"),
        sum(col("vc").cast("decimal(19,0)") * col("vc")).as("ss"))
    val grid = broadcast(Seq(1, 2, 5, 10).toDF("mde_pct"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val mean = dd(col("s")) / dd(col("n"))
    val variance = dd(col("ss")) / dd(col("n")) - mean * mean
    val delta = mean * dd(col("mde_pct")) / lit(100.0)
    m.crossJoin(grid)
      .select(col("mde_pct"), col("n"),
        QueryDef.dec4(mean / lit(100.0)).as("mean"),
        QueryDef.dec4(sqrt(variance) / lit(100.0)).as("sd"),
        ceil(lit(2.0) * variance * (lit(7848879.0) / lit(1e6)) /
          (delta * delta)).cast("long").as("n_per_arm"))
      .orderBy(col("mde_pct"))
  }

  private def q262(s: SparkSession, dir: String): DataFrame =
    sampleSizePlan(Tables.events(s, dir))

  private val q262Sql =
    """WITH m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(vc) AS HUGEINT) AS s,
      |    CAST(sum(CAST(vc AS HUGEINT) * vc) AS HUGEINT) AS ss
      |  FROM (SELECT CAST(round(value * 100) AS BIGINT) AS vc
      |    FROM events)),
      |grid AS (SELECT * FROM (VALUES (1), (2), (5), (10)) t(mde_pct))
      |SELECT mde_pct, n,
      |  CAST(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
      |    AS DECIMAL(38,4)) AS VARCHAR) AS mean,
      |  CAST(CAST(sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
      |      - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0
      |    AS DECIMAL(38,4)) AS VARCHAR) AS sd,
      |  CAST(ceil(2.0 * (CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
      |      - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
      |    * (7848879.0 / 1000000.0)
      |    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |        * CAST(mde_pct AS DOUBLE) / 100.0
      |      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |        * CAST(mde_pct AS DOUBLE) / 100.0))) AS BIGINT) AS n_per_arm
      |FROM m CROSS JOIN grid ORDER BY mde_pct""".stripMargin

  // ==== q261: nearest-neighbor covariate-matching ATT ========================
  //
  // The matching estimator completing the causal family (q230 stratifies,
  // q254 regresses, this MATCHES): every treated user is compared against
  // the controls whose pre-period activity is NEAREST theirs — the
  // propensity/covariate matching design, with ties pooled (all controls
  // at the matched covariate value average together — kernel-at-a-point,
  // deterministic where pick-one-by-id would be arbitrary). The covariate
  // (pre-period event count) has a BOUNDED domain, so matching runs as a
  // broadcast domain×domain pairing (the B8 contract), never a per-user
  // search: one corpus pass → user groupBy → two covariate-domain
  // aggregates; nearest = min(struct(dist, x_c)) per treated value
  // (backward preferred on distance ties — lexicographic struct order).
  // Float discipline: per-domain-row terms are micro-floored (q195) so
  // the ATT numerator sums exact integers.

  /** One row: (n_treated, n_control, att, raw_diff) — matched treatment
    * effect on post-period value, vs the unmatched naive diff. */
  def matchingAtt(events: DataFrame): DataFrame = {
    val range = broadcast(events.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts"))))
        .cast("long").divide(lit(2L))).cast("long").as("cut")))
    val perUser = events.crossJoin(range)
      .select(col("user_id"),
        when(pmod(col("user_id"), lit(2)) === 1, 1L).otherwise(0L).as("t"),
        when(unix_micros(col("ts")) < col("cut"), 1L).otherwise(0L)
          .as("pre"),
        when(unix_micros(col("ts")) >= col("cut"),
          round(col("value") * 100).cast("long")).otherwise(0L).as("yr"))
      .groupBy(col("user_id"))
      .agg(max(col("t")).as("t"), sum(col("pre")).as("x"),
        sum(col("yr")).as("y"))
    val tAgg = perUser.filter(col("t") === 1).groupBy(col("x"))
      .agg(count(lit(1)).as("n_t"), sum(col("y")).as("sy_t"))
    val cAgg = perUser.filter(col("t") === 0).groupBy(col("x"))
      .agg(count(lit(1)).as("n_c"), sum(col("y")).as("sy_c"))
    val tKeyed = tAgg.select(col("x").as("x_t"), col("n_t"), col("sy_t"))
    val cKeyed = cAgg.select(col("x").as("x_c"), col("n_c"), col("sy_c"))
    val nearest = tKeyed.select(col("x_t").as("xt"))
      .join(broadcast(cKeyed.select(col("x_c").as("xc"))), lit(true))
      .groupBy(col("xt"))
      .agg(min(struct(abs(col("xc") - col("xt")).as("d"),
        col("xc").as("xc"))).as("m"))
      .select(col("xt"), col("m.xc").as("xc"))
    val terms = tKeyed.join(nearest, col("x_t") === col("xt"))
      .join(broadcast(cKeyed), col("xc") === col("x_c"))
      .select(col("n_t"),
        floor(lit(1e6) * (col("sy_t").cast("double") -
          col("n_t").cast("double") * col("sy_c").cast("double") /
            col("n_c").cast("double"))).cast("decimal(38,0)").as("num"))
    val tot = broadcast(perUser.agg(
      sum(when(col("t") === 1, 1L).otherwise(0L)).as("nt"),
      sum(when(col("t") === 0, 1L).otherwise(0L)).as("nc"),
      sum(when(col("t") === 1, col("y"))).as("syt"),
      sum(when(col("t") === 0, col("y"))).as("syc")))
    terms.agg(sum(col("num")).as("num"), sum(col("n_t")).as("n_match"))
      .crossJoin(tot)
      .select(col("nt").as("n_treated"), col("nc").as("n_control"),
        QueryDef.dec4(col("num").cast("double") /
          (col("n_match").cast("double") * lit(1e8))).as("att"),
        QueryDef.dec4((col("syt").cast("double") / col("nt").cast("double")
          - col("syc").cast("double") / col("nc").cast("double")) /
          lit(100.0)).as("raw_diff"))
  }

  private def q261(s: SparkSession, dir: String): DataFrame =
    matchingAtt(Tables.events(s, dir))

  private val q261Sql =
    """WITH rg AS (
      |  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2
      |    AS BIGINT) AS cut FROM events),
      |pu AS (
      |  SELECT user_id,
      |    max(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS t,
      |    CAST(sum(CASE WHEN epoch_us(ts) < cut THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN epoch_us(ts) >= cut
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events CROSS JOIN rg GROUP BY user_id),
      |ta AS (SELECT x, count(*) AS n_t, CAST(sum(y) AS BIGINT) AS sy_t
      |  FROM pu WHERE t = 1 GROUP BY x),
      |ca AS (SELECT x, count(*) AS n_c, CAST(sum(y) AS BIGINT) AS sy_c
      |  FROM pu WHERE t = 0 GROUP BY x),
      |nearest AS (
      |  SELECT ta.x AS xt,
      |    (min(struct_pack(d := abs(ca.x - ta.x), xc := ca.x))).xc AS xc
      |  FROM ta CROSS JOIN ca GROUP BY ta.x),
      |terms AS (
      |  SELECT ta.n_t,
      |    CAST(floor(1000000.0 * (CAST(ta.sy_t AS DOUBLE)
      |      - CAST(ta.n_t AS DOUBLE) * CAST(ca.sy_c AS DOUBLE)
      |        / CAST(ca.n_c AS DOUBLE))) AS HUGEINT) AS num
      |  FROM ta JOIN nearest ON nearest.xt = ta.x
      |    JOIN ca ON ca.x = nearest.xc),
      |tot AS (
      |  SELECT CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS nt,
      |    CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
      |    CAST(sum(CASE WHEN t = 1 THEN y END) AS BIGINT) AS syt,
      |    CAST(sum(CASE WHEN t = 0 THEN y END) AS BIGINT) AS syc
      |  FROM pu)
      |SELECT nt AS n_treated, nc AS n_control,
      |  CAST(CAST(CAST(sum(num) AS DOUBLE)
      |    / (CAST(sum(n_t) AS DOUBLE) * 100000000.0)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS att,
      |  CAST(CAST((CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
      |    - CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE)) / 100.0
      |    AS DECIMAL(38,4)) AS VARCHAR) AS raw_diff
      |FROM terms CROSS JOIN tot
      |GROUP BY nt, nc, syt, syc""".stripMargin

  // ==== q254: CUPED variance-reduced experiment readout ======================
  //
  // The industry-standard experiment accelerator (Deng et al., WSDM'13):
  // regress the experiment-period metric on the PRE-period covariate and
  // report the adjusted lift — same expectation, variance shrunk by ρ².
  // Per user: X = pre-period value cents, Y = experiment-period value
  // cents (the q251 midpoint splits the periods; q241's parity assigns
  // treatment). θ = cov(X,Y)/var(X) pooled; by linearity the adjusted
  // diff needs only group moments — no per-user adjusted column ever
  // materializes: diff_cuped = (ȲT−ȲC) − θ(X̄T−X̄C), and the variance
  // reduction ratio is exactly ρ² = cov²/(varX·varY).
  //
  // Exactness: X and Y are integer cents (round(value·100) per row — the
  // q194 money rule), so every moment (Σx, Σxy, Σx², group sums) is an
  // exact DECIMAL integer and the double formulas at render see identical
  // operands in both engines. Scale shape: one corpus pass → user-domain
  // groupBy → single-row moment aggregate.

  /** One row: (n_t, n_c, theta, raw_diff, cuped_diff, var_reduction) —
    * CUPED readout of per-user value cents, treatment = odd user_id. */
  def cuped(events: DataFrame): DataFrame = {
    val range = broadcast(events.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts"))))
        .cast("long").divide(lit(2L))).cast("long").as("cut")))
    val perUser = events.crossJoin(range)
      .select(col("user_id"),
        when(pmod(col("user_id"), lit(2)) === 1, 1L).otherwise(0L).as("t"),
        when(unix_micros(col("ts")) < col("cut"),
          round(col("value") * 100).cast("long")).otherwise(0L).as("xr"),
        when(unix_micros(col("ts")) >= col("cut"),
          round(col("value") * 100).cast("long")).otherwise(0L).as("yr"))
      .groupBy(col("user_id"))
      .agg(max(col("t")).as("t"),
        sum(col("xr")).cast("decimal(18,0)").as("x"),
        sum(col("yr")).cast("decimal(18,0)").as("y"))
    val m = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(when(col("t") === 1, 1L).otherwise(0L)).as("n_t"),
      sum(when(col("t") === 0, 1L).otherwise(0L)).as("n_c"),
      sum(when(col("t") === 1, col("x"))).as("sx_t"),
      sum(when(col("t") === 0, col("x"))).as("sx_c"),
      sum(when(col("t") === 1, col("y"))).as("sy_t"),
      sum(when(col("t") === 0, col("y"))).as("sy_c"))
    def dd(c: String) = col(c).cast("double")
    val nD = dd("n")
    val cov = dd("sxy") / nD - dd("sx") / nD * (dd("sy") / nD)
    val varX = dd("sxx") / nD - dd("sx") / nD * (dd("sx") / nD)
    val varY = dd("syy") / nD - dd("sy") / nD * (dd("sy") / nD)
    val theta = cov / varX
    val rawDiff = dd("sy_t") / dd("n_t") - dd("sy_c") / dd("n_c")
    val xDiff = dd("sx_t") / dd("n_t") - dd("sx_c") / dd("n_c")
    m.select(col("n_t"), col("n_c"),
      QueryDef.dec4(theta).as("theta"),
      QueryDef.dec4(rawDiff / lit(100.0)).as("raw_diff"),
      QueryDef.dec4((rawDiff - theta * xDiff) / lit(100.0))
        .as("cuped_diff"),
      QueryDef.dec4(when(varX > 0 && varY > 0,
        cov * cov / (varX * varY))).as("var_reduction"))
  }

  private def q254(s: SparkSession, dir: String): DataFrame =
    cuped(Tables.events(s, dir))

  private val q254Sql =
    """WITH rg AS (
      |  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2
      |    AS BIGINT) AS cut FROM events),
      |pu AS (
      |  SELECT user_id,
      |    max(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS t,
      |    CAST(sum(CASE WHEN epoch_us(ts) < cut
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS HUGEINT) AS x,
      |    CAST(sum(CASE WHEN epoch_us(ts) >= cut
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS HUGEINT) AS y
      |  FROM events CROSS JOIN rg GROUP BY user_id),
      |m AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy,
      |    CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
      |    CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
      |    sum(CASE WHEN t = 1 THEN x END) AS sx_t,
      |    sum(CASE WHEN t = 0 THEN x END) AS sx_c,
      |    sum(CASE WHEN t = 1 THEN y END) AS sy_t,
      |    sum(CASE WHEN t = 0 THEN y END) AS sy_c
      |  FROM pu)
      |SELECT n_t, n_c,
      |  CAST(CAST((CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
      |      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
      |        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
      |    / (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      |      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
      |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS theta,
      |  CAST(CAST((CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
      |      - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE)) / 100.0
      |    AS DECIMAL(38,4)) AS VARCHAR) AS raw_diff,
      |  CAST(CAST(((CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
      |      - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE))
      |    - (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
      |        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
      |          * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
      |      / (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      |        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
      |          * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      |      * (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE)
      |        - CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE))) / 100.0
      |    AS DECIMAL(38,4)) AS VARCHAR) AS cuped_diff,
      |  CAST(CAST(CASE WHEN
      |      CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      |        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
      |          * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) > 0
      |      AND CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
      |        - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      |          * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) > 0
      |    THEN (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
      |        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
      |          * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
      |      * (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
      |        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
      |          * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
      |      / ((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      |        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
      |          * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      |      * (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
      |        - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      |          * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS var_reduction
      |FROM m""".stripMargin

  // ==== q250: exact Shapley-value channel attribution ========================
  //
  // The game-theoretic upgrade of q125 (last-touch) / q167 (multi-touch):
  // each channel's credit is its Shapley value under the coalition game
  // v(S) = FAST-conversion rate (first purchase within 24 h of the user's
  // first event — plain "ever converts" is 100% on this corpus and gives
  // the degenerate all-zero game) among users whose pre-conversion touch
  // set is EXACTLY S (the standard simplified-Shapley marketing
  // formulation; unobserved sets contribute v = 0). With k = 4 channels
  // the subset
  // lattice has 16 nodes, so the EXACT value is computable — no sampling:
  // φ_i = Σ_{S∋i} (|S|−1)!(k−|S|)!/k! · (v(S) − v(S∖i)).
  //
  // Scale shape: two user-domain shuffles (first-purchase timestamp, then
  // a bit_or mask fold — q241's cohort shape), one 16-row groupBy, and a
  // 64-row static coefficient join. Exactness: v is integerized as
  // ⌊1000·conv/users⌋ via INTEGER division (no doubles anywhere); the
  // factorial weights are scaled by k! = 24 so φ·24 accumulates as exact
  // integers, divided once at render. The spec pins the efficiency axiom
  // Σφ = v(full) − v(∅), which the telescoping sum guarantees for any v.

  private val shapChannels = Seq(
    ("click", 1), ("error", 2), ("signup", 4), ("view", 8))

  /** Per channel: (channel, phi24_milli, phi) — exact Shapley credit.
    * phi sums to v(full) − v(∅) across channels (efficiency). */
  def shapleyAttribution(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("ts"), col("event_type"))
    val fp = e.groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("fe"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
          .as("fp"))
    val bit = shapChannels.foldLeft(lit(0L)) { case (acc, (name, b)) =>
      when(col("event_type") === name, lit(b.toLong)).otherwise(acc) }
    val perUser = e.join(fp, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(bit_or(when(col("event_type") =!= "purchase" &&
          (col("fp").isNull || unix_micros(col("ts")) < col("fp")), bit)
        .otherwise(0L)).as("mask"),
        max(when(col("fp").isNotNull &&
          col("fp") - col("fe") <= 86400000000L, 1L).otherwise(0L))
          .as("conv"))
    val v = perUser.groupBy(col("mask"))
      .agg(expr("(1000 * sum(conv)) DIV count(*)").as("v_milli"))
    // (channel, subset, ±(|S|−1)!(4−|S|)!) — 64 static rows
    val f = Array(1L, 1L, 2L, 6L, 24L)
    val coefRows = for {
      (name, b) <- shapChannels
      s <- 1 to 15 if (s & b) != 0
      c = f(Integer.bitCount(s) - 1) * f(4 - Integer.bitCount(s))
      (m, sign) <- Seq((s, 1L), (s ^ b, -1L))
    } yield (name, m.toLong, sign * c)
    val spark = events.sparkSession
    import spark.implicits._
    val coefs = broadcast(coefRows.toDF("channel", "s", "c"))
    coefs.join(v, coefs("s") === v("mask"), "left")
      .groupBy(col("channel"))
      .agg(sum(col("c") * coalesce(col("v_milli"), lit(0L)))
        .as("phi24_milli"))
      .select(col("channel"), col("phi24_milli"),
        QueryDef.dec4(col("phi24_milli").cast("double") / lit(24000.0))
          .as("phi"))
      .orderBy(col("channel"))
  }

  private def q250(s: SparkSession, dir: String): DataFrame =
    shapleyAttribution(Tables.events(s, dir))

  private val q250Sql = {
    val f = Array(1L, 1L, 2L, 6L, 24L)
    val coefRows = (for {
      (name, b) <- shapChannels
      s <- 1 to 15 if (s & b) != 0
      c = f(Integer.bitCount(s) - 1) * f(4 - Integer.bitCount(s))
      (m, sign) <- Seq((s, 1L), (s ^ b, -1L))
    } yield s"('$name', $m, ${sign * c})").mkString(", ")
    val bitCase = shapChannels
      .map { case (n, b) => s"WHEN '$n' THEN $b" }.mkString(" ")
    s"""WITH fp AS (
       |  SELECT user_id, min(epoch_us(ts)) AS fe,
       |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
       |      AS fp
       |  FROM events GROUP BY 1),
       |pu AS (
       |  SELECT e.user_id,
       |    bit_or(CASE WHEN e.event_type <> 'purchase'
       |        AND (fp.fp IS NULL OR epoch_us(e.ts) < fp.fp)
       |      THEN CASE e.event_type $bitCase ELSE 0 END
       |      ELSE 0 END) AS mask,
       |    max(CASE WHEN fp.fp IS NOT NULL
       |      AND fp.fp - fp.fe <= 86400000000 THEN 1 ELSE 0 END) AS conv
       |  FROM events e JOIN fp USING (user_id) GROUP BY 1),
       |v AS (
       |  SELECT mask,
       |    (1000 * CAST(sum(conv) AS BIGINT)) // count(*) AS v_milli
       |  FROM pu GROUP BY 1),
       |coef(channel, s, c) AS (VALUES $coefRows)
       |SELECT channel,
       |  CAST(sum(c * COALESCE(v_milli, 0)) AS BIGINT) AS phi24_milli,
       |  CAST(CAST(CAST(sum(c * COALESCE(v_milli, 0)) AS DOUBLE) / 24000.0
       |    AS DECIMAL(38,4)) AS VARCHAR) AS phi
       |FROM coef LEFT JOIN v ON coef.s = v.mask
       |GROUP BY channel ORDER BY channel""".stripMargin
  }

  // ==== q246: sequential probability ratio test (SPRT) ======================
  //
  // Wald's always-valid A/B stopping rule — the sequential-native
  // hypothesis test (experimentation platforms ship exactly this so a
  // running experiment stops the moment evidence suffices). Bernoulli
  // x = (event_type = eventType) over the (ts, event_id) total order;
  // H0: p = 0.19 vs H1: p = 0.21, α = β = 0.05. After n events with k
  // successes, LLR_n = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)); accept H1
  // at LLR ≥ ln((1−β)/α), H0 at LLR ≤ ln(β/(1−α)). The synthetic
  // corpus's true purchase rate (≈0.198) sits BETWEEN the hypotheses, so
  // the walk drifts slowly — the decision lands deep in the stream or
  // not at all, and both outcomes are exercised across SFs.
  //
  // Float discipline: the four ln's are COMPILE-TIME constants, hard-coded
  // as ⌊10⁶·ln⌋ micro-nat integer literals in both engines (derivations on
  // each literal) — every runtime quantity is an exact integer; the query
  // contains no floating point at all. Scale shape: a sequential test
  // needs the total order — two distributed prefix scans (range-partition
  // + per-partition accumulate, the q122 machinery), never a
  // single-partition window; the decision row is a min-struct over
  // crossing rows (n is unique, so struct order = earliest), an ordinary
  // aggregation with no driver loop.

  /** One row: (decision, n_decide, k_decide, llr_micro) — 'accept_h1',
    * 'accept_h0', or 'continue' (with stream totals) if the data ends
    * before either boundary is crossed. */
  def sprt(events: DataFrame, eventType: String): DataFrame = {
    val succ = 100083L   // ⌊10⁶·ln(0.21/0.19)⌋
    val fail = -25002L   // ⌊10⁶·ln(0.79/0.81)⌋
    val aUp = 2944438L   // ⌊10⁶·ln(0.95/0.05)⌋
    val bLo = -2944439L  // ⌊10⁶·ln(0.05/0.95)⌋
    val e = events.select(col("ts"), col("event_id"),
      when(col("event_type") === eventType, 1L).otherwise(0L).as("x"))
    val order = Seq(col("ts"), col("event_id"))
    val scanned = graft.chunk.ChunkAssigner.withPrefixSum(
      graft.chunk.ChunkAssigner.withPrefixSum(e, order, lit(1L), "n0"),
      order, col("x"), "k0")
      .select((col("n0") + 1L).as("n"), (col("k0") + col("x")).as("k"))
      .withColumn("llr", col("k") * succ + (col("n") - col("k")) * fail)
    scanned.agg(
      min(when(col("llr") >= aUp || col("llr") <= bLo,
        struct(col("n"), col("k"), col("llr")))).as("fc"),
      count(lit(1)).as("n_tot"), max(col("k")).as("k_tot"))
      .select(
        when(col("fc").isNull, lit("continue"))
          .when(col("fc.llr") >= aUp, lit("accept_h1"))
          .otherwise(lit("accept_h0")).as("decision"),
        coalesce(col("fc.n"), col("n_tot")).as("n_decide"),
        coalesce(col("fc.k"), col("k_tot")).as("k_decide"),
        coalesce(col("fc.llr"),
          col("k_tot") * succ + (col("n_tot") - col("k_tot")) * fail)
          .as("llr_micro"))
  }

  private def q246(s: SparkSession, dir: String): DataFrame =
    sprt(Tables.events(s, dir), "purchase")

  private val q246Sql =
    """WITH e AS (
      |  SELECT ts, event_id,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
      |  FROM events),
      |c AS (
      |  SELECT row_number() OVER w AS n, CAST(sum(x) OVER w AS BIGINT) AS k
      |  FROM e
      |  WINDOW w AS (ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |l AS (SELECT n, k, k * 100083 + (n - k) * (-25002) AS llr FROM c),
      |fc AS (
      |  SELECT n, k, llr FROM l
      |  WHERE llr >= 2944438 OR llr <= -2944439
      |  ORDER BY n LIMIT 1),
      |tot AS (SELECT count(*) AS n_tot, CAST(sum(x) AS BIGINT) AS k_tot
      |  FROM e)
      |SELECT
      |  CASE WHEN fc.n IS NULL THEN 'continue'
      |    WHEN fc.llr >= 2944438 THEN 'accept_h1'
      |    ELSE 'accept_h0' END AS decision,
      |  COALESCE(fc.n, tot.n_tot) AS n_decide,
      |  COALESCE(fc.k, tot.k_tot) AS k_decide,
      |  COALESCE(fc.llr,
      |    tot.k_tot * 100083 + (tot.n_tot - tot.k_tot) * (-25002))
      |    AS llr_micro
      |FROM tot LEFT JOIN fc ON TRUE""".stripMargin

  // ==== q276: inverse-propensity-weighted ATE ================================
  //
  // The WEIGHTING estimator completing the causal quartet (q230
  // stratifies, q251 differences, q261 matches — IPW reweights): with
  // propensity p_b = n_t_b/n_b per covariate bin, the Hájek estimate
  // collapses algebraically — Σ_T y/p = Σ_b Yt_b·n_b/n_t_b and
  // Σ_T 1/p = Σ_b n_b — so there is never a per-user weight column, only
  // bin-domain arithmetic (the q261 bounded-covariate contract; bins are
  // the capped pre-period event count). Bins missing either arm have
  // undefined weights and are TRIMMED (the standard overlap condition),
  // reported, not silently kept. Float discipline: per-bin terms are
  // micro-floored from identical double expressions (the q261 rule), so
  // both engines sum identical integers; three divisions at render.

  /** One row: (n_treated, n_control, n_bins_used, n_bins_trimmed,
    * mu1, mu0, ate) — Hájek IPW over per-user (t, x-bin, y-cents). */
  def ipwAte(events: DataFrame, maxBin: Int = 20): DataFrame = {
    val range = broadcast(events.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts"))))
        .cast("long").divide(lit(2L))).cast("long").as("cut")))
    val perUser = events.crossJoin(range)
      .select(col("user_id"),
        when(pmod(col("user_id"), lit(2)) === 1, 1L).otherwise(0L).as("t"),
        when(unix_micros(col("ts")) < col("cut"), 1L).otherwise(0L)
          .as("pre"),
        when(unix_micros(col("ts")) >= col("cut"),
          round(col("value") * 100).cast("long")).otherwise(0L).as("yr"))
      .groupBy(col("user_id"))
      .agg(max(col("t")).as("t"),
        least(sum(col("pre")), lit(maxBin.toLong)).as("b"),
        sum(col("yr")).as("y"))
    val bins = perUser.groupBy(col("b"))
      .agg(sum(when(col("t") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("t") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("t") === 1, col("y")).otherwise(0L)).as("syt"),
        sum(when(col("t") === 0, col("y")).otherwise(0L)).as("syc"))
    def dd(c: String) = col(c).cast("double")
    val kept = bins.filter(col("nt") > 0 && col("nc") > 0)
      .select(col("nt"), col("nc"),
        (col("nt") + col("nc")).as("nb"),
        floor(lit(1e6) * dd("syt") *
          (dd("nt") + dd("nc")) / dd("nt")).cast("decimal(38,0)").as("t1"),
        floor(lit(1e6) * dd("syc") *
          (dd("nt") + dd("nc")) / dd("nc")).cast("decimal(38,0)").as("t0"))
    val trimmed = broadcast(bins.agg(
      sum(when(col("nt") === 0 || col("nc") === 0, 1L).otherwise(0L))
        .as("n_bins_trimmed")))
    val tot = broadcast(perUser.agg(
      sum(when(col("t") === 1, 1L).otherwise(0L)).as("n_treated"),
      sum(when(col("t") === 0, 1L).otherwise(0L)).as("n_control")))
    kept.agg(count(lit(1)).as("n_bins_used"), sum(col("nb")).as("nball"),
        sum(col("t1")).as("s1"), sum(col("t0")).as("s0"))
      .crossJoin(trimmed).crossJoin(tot)
      .select(col("n_treated"), col("n_control"), col("n_bins_used"),
        col("n_bins_trimmed"),
        QueryDef.dec4(col("s1").cast("double") /
          (col("nball").cast("double") * lit(1e8))).as("mu1"),
        QueryDef.dec4(col("s0").cast("double") /
          (col("nball").cast("double") * lit(1e8))).as("mu0"),
        QueryDef.dec4((col("s1") - col("s0")).cast("double") /
          (col("nball").cast("double") * lit(1e8))).as("ate"))
  }

  private def q276(s: SparkSession, dir: String): DataFrame =
    ipwAte(Tables.events(s, dir))

  private val q276Sql =
    """WITH cutoff AS (
      |  SELECT CAST((CAST(min(epoch_us(ts)) AS BIGINT)
      |    + CAST(max(epoch_us(ts)) AS BIGINT)) // 2 AS BIGINT) AS cut
      |  FROM events),
      |pu AS (
      |  SELECT user_id,
      |    max(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS t,
      |    least(CAST(sum(CASE WHEN epoch_us(ts) < cut THEN 1 ELSE 0 END)
      |      AS BIGINT), 20) AS b,
      |    CAST(sum(CASE WHEN epoch_us(ts) >= cut
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS y
      |  FROM events CROSS JOIN cutoff GROUP BY user_id),
      |bins AS (
      |  SELECT b,
      |    CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
      |    CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
      |    CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
      |    CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS syc
      |  FROM pu GROUP BY b),
      |kept AS (
      |  SELECT nt, nc, nt + nc AS nb,
      |    CAST(floor(1e6 * CAST(syt AS DOUBLE)
      |      * (CAST(nt AS DOUBLE) + CAST(nc AS DOUBLE))
      |      / CAST(nt AS DOUBLE)) AS HUGEINT) AS t1,
      |    CAST(floor(1e6 * CAST(syc AS DOUBLE)
      |      * (CAST(nt AS DOUBLE) + CAST(nc AS DOUBLE))
      |      / CAST(nc AS DOUBLE)) AS HUGEINT) AS t0
      |  FROM bins WHERE nt > 0 AND nc > 0),
      |trimmed AS (
      |  SELECT CAST(sum(CASE WHEN nt = 0 OR nc = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_bins_trimmed FROM bins),
      |tot AS (
      |  SELECT CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_treated,
      |    CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_control
      |  FROM pu),
      |agg AS (
      |  SELECT count(*) AS n_bins_used, CAST(sum(nb) AS BIGINT) AS nball,
      |    CAST(sum(t1) AS HUGEINT) AS s1, CAST(sum(t0) AS HUGEINT) AS s0
      |  FROM kept)
      |SELECT n_treated, n_control, n_bins_used, n_bins_trimmed,
      |  CAST(CAST(CAST(s1 AS DOUBLE) / (CAST(nball AS DOUBLE) * 1e8)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS mu1,
      |  CAST(CAST(CAST(s0 AS DOUBLE) / (CAST(nball AS DOUBLE) * 1e8)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS mu0,
      |  CAST(CAST(CAST(s1 - s0 AS DOUBLE) / (CAST(nball AS DOUBLE) * 1e8)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS ate
      |FROM agg CROSS JOIN trimmed CROSS JOIN tot""".stripMargin

  // ==== q282: Durbin–Watson residual-autocorrelation test ====================
  //
  // The diagnostic that closes the q144-OLS / q152-ACF loop: after
  // fitting count ~ hour per type, DW = Σ(e_t − e_{t−1})² / Σe_t² asks
  // whether the RESIDUALS still carry serial structure (DW ≈ 2 ⇒ none;
  // → 0 ⇒ positive autocorrelation, the "trend didn't explain it"
  // alarm). Determinism: moments are exact integers; slope/intercept/
  // residuals are exactly-rounded doubles (identical bits both engines,
  // the q191 rule); each squared term is ⌊10⁴·(…)²⌋-floored ONCE so the
  // hour-domain sums are exact integers — order-free where raw double
  // sums would hang on aggregation order. The lag runs in a per-type
  // window over the hour-domain table (q152's calendar contract: gaps
  // pair adjacent OBSERVED hours, the standard irregular-series DW).

  /** Per `group`: (n_hours, dw) — Durbin–Watson of the residuals of
    * hourly-count ~ hour-index OLS. Types with < 3 hours or zero
    * residual mass report null. */
  def durbinWatson(events: DataFrame): DataFrame = {
    // The hour index is REBASED per type (h − min h) before any moment:
    // absolute epoch-hours are ~4.7e5, so n·Σh² in raw 64-bit would pass
    // 2^63 once a type spans ~9 months of distinct hours (DuckDB raises,
    // Spark wraps silently). Rebasing bounds h by the SPAN, and the
    // cross-products additionally ride decimal(38,0)/HUGEINT (the
    // q272/q294 rule) so neither engine can overflow at any span.
    val raw = events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("y"))
    val hmin = raw.groupBy(col("event_type")).agg(min(col("h")).as("hmin"))
    val hourly = raw.join(broadcast(hmin), Seq("event_type"))
      .select(col("event_type"), (col("h") - col("hmin")).as("h"), col("y"))
    def d0(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val m = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("sh"),
        sum(col("y")).as("sy"), sum(d0(col("h")) * col("h")).as("shh"),
        sum(d0(col("h")) * col("y")).as("shy"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val withFit = hourly.join(broadcast(m), Seq("event_type"))
      .withColumn("slope",
        dd(d0(col("n")) * col("shy") - d0(col("sh")) * col("sy")) /
          dd(d0(col("n")) * col("shh") - d0(col("sh")) * col("sh")))
      .withColumn("icept",
        (dd(col("sy")) - col("slope") * dd(col("sh"))) / dd(col("n")))
      .withColumn("e", dd(col("y")) - col("slope") * dd(col("h")) -
        col("icept"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    withFit
      .withColumn("ep", lag(col("e"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(when(col("ep").isNotNull,
          floor(lit(1e4) * (col("e") - col("ep")) * (col("e") - col("ep")))
            .cast("long")).otherwise(0L)).as("d4"),
        sum(floor(lit(1e4) * col("e") * col("e")).cast("long")).as("s4"))
      .select(col("event_type"), col("n_hours"),
        when(col("n_hours") >= 3 && col("s4") > 0,
          col("d4").cast("double") / col("s4").cast("double")).as("dw"))
  }

  private def q282(s: SparkSession, dir: String): DataFrame =
    durbinWatson(Tables.events(s, dir))
      .select(col("event_type"), col("n_hours"),
        QueryDef.dec4(col("dw")).as("dw"))
      .orderBy(col("event_type"))

  private val q282Sql =
    """WITH raw AS (
      |  SELECT event_type,
      |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
      |    count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |hmin AS (SELECT event_type, min(h) AS hmin FROM raw GROUP BY 1),
      |hourly AS (
      |  SELECT raw.event_type, raw.h - hmin.hmin AS h, y
      |  FROM raw JOIN hmin USING (event_type)),
      |m AS (
      |  SELECT event_type, count(*) AS n, CAST(sum(h) AS BIGINT) AS sh,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(CAST(h AS HUGEINT) * h) AS HUGEINT) AS shh,
      |    CAST(sum(CAST(h AS HUGEINT) * y) AS HUGEINT) AS shy
      |  FROM hourly GROUP BY 1),
      |fit AS (
      |  SELECT hourly.event_type, h, y,
      |    CAST(CAST(n AS HUGEINT) * shy - CAST(sh AS HUGEINT) * sy AS DOUBLE)
      |      / CAST(CAST(n AS HUGEINT) * shh - CAST(sh AS HUGEINT) * sh
      |        AS DOUBLE) AS slope,
      |    n, sh, sy
      |  FROM hourly JOIN m USING (event_type)),
      |res AS (
      |  SELECT event_type, h,
      |    CAST(y AS DOUBLE) - slope * CAST(h AS DOUBLE)
      |      - (CAST(sy AS DOUBLE) - slope * CAST(sh AS DOUBLE))
      |        / CAST(n AS DOUBLE) AS e
      |  FROM fit),
      |lagged AS (
      |  SELECT event_type, e,
      |    lag(e, 1) OVER (PARTITION BY event_type ORDER BY h) AS ep
      |  FROM res),
      |agg AS (
      |  SELECT event_type, count(*) AS n_hours,
      |    CAST(sum(CASE WHEN ep IS NOT NULL
      |      THEN CAST(floor(1e4 * (e - ep) * (e - ep)) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS d4,
      |    CAST(sum(CAST(floor(1e4 * e * e) AS BIGINT)) AS BIGINT) AS s4
      |  FROM lagged GROUP BY 1)
      |SELECT event_type, n_hours,
      |  CAST(CAST(CASE WHEN n_hours >= 3 AND s4 > 0
      |    THEN CAST(d4 AS DOUBLE) / CAST(s4 AS DOUBLE) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS dw
      |FROM agg ORDER BY event_type""".stripMargin

  // ==== q283: forecast-accuracy suite (sMAPE + MASE) =========================
  //
  // q176 reports MAE; this adds the two scale-free metrics forecasting
  // teams actually compare models with: sMAPE = mean 2|f−a|/(f+a) (unit-
  // free, bounded [0,2]) and MASE = MAE(model)/MAE(in-sample one-step
  // naive) — the Hyndman–Koehler standard that calibrates "is lag-24
  // better than just repeating the last hour?" (< 1 ⇒ yes). Exactness:
  // per-row sMAPE terms ⌊10⁶·2|f−a|/(f+a)⌋-floored ONCE (counts are
  // positive integers) so the sum is exact; MASE cross-multiplies the
  // two rational MAEs in DECIMAL and divides once. Shape: two hour-
  // domain self-joins per type (lag-24 forecast, lag-1 denominator),
  // nothing corpus-sized past the hourly aggregate.

  /** Per type: (n_eval, mae, smape, mase) of the lag-24 seasonal-naive
    * forecast, MASE scaled by the in-sample lag-1 naive MAE. */
  def forecastEval(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    def joined(lagHours: Int) = hourly.join(
      hourly.select(col("event_type"), (col("hr") + lagHours).as("hr"),
        col("cnt").as("f")),
      Seq("event_type", "hr"))
    val fc = joined(24).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("cnt") - col("f"))).as("ae_f"),
        sum(when(col("cnt") + col("f") > 0,
          floor(lit(2e6) * abs(col("cnt") - col("f")).cast("double") /
            (col("cnt") + col("f")).cast("double")).cast("long"))
          .otherwise(0L)).as("smape_micro"))
    val nv = joined(1).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_1"),
        sum(abs(col("cnt") - col("f"))).as("ae_1"))
    fc.join(nv, Seq("event_type"))
      .select(col("event_type"), col("n_eval"),
        QueryDef.dec4(col("ae_f").cast("double") /
          col("n_eval").cast("double")).as("mae"),
        QueryDef.dec4(col("smape_micro").cast("double") /
          (col("n_eval").cast("double") * lit(1e6))).as("smape"),
        QueryDef.dec4(when(col("ae_1") > 0,
          (col("ae_f").cast("decimal(38,0)") * col("n_1")).cast("double") /
            (col("ae_1").cast("decimal(38,0)") * col("n_eval"))
              .cast("double"))).as("mase"))
  }

  private def q283(s: SparkSession, dir: String): DataFrame =
    forecastEval(Tables.events(s, dir)).orderBy(col("event_type"))

  private val q283Sql =
    """WITH h AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |fc AS (
      |  SELECT a.event_type, count(*) AS n_eval,
      |    CAST(sum(abs(a.cnt - f.cnt)) AS BIGINT) AS ae_f,
      |    CAST(sum(CASE WHEN a.cnt + f.cnt > 0
      |      THEN CAST(floor(2e6 * CAST(abs(a.cnt - f.cnt) AS DOUBLE)
      |        / CAST(a.cnt + f.cnt AS DOUBLE)) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS smape_micro
      |  FROM h a JOIN h f ON a.event_type = f.event_type
      |    AND a.hr = f.hr + 24
      |  GROUP BY 1),
      |nv AS (
      |  SELECT a.event_type, count(*) AS n_1,
      |    CAST(sum(abs(a.cnt - f.cnt)) AS BIGINT) AS ae_1
      |  FROM h a JOIN h f ON a.event_type = f.event_type
      |    AND a.hr = f.hr + 1
      |  GROUP BY 1)
      |SELECT event_type, n_eval,
      |  CAST(CAST(CAST(ae_f AS DOUBLE) / n_eval AS DECIMAL(38,4))
      |    AS VARCHAR) AS mae,
      |  CAST(CAST(CAST(smape_micro AS DOUBLE) / (n_eval * 1e6)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS smape,
      |  CAST(CAST(CASE WHEN ae_1 > 0
      |    THEN CAST(CAST(ae_f AS HUGEINT) * n_1 AS DOUBLE)
      |      / CAST(CAST(ae_1 AS HUGEINT) * n_eval AS DOUBLE) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS mase
      |FROM fc JOIN nv USING (event_type) ORDER BY event_type""".stripMargin

  private def q288(s: SparkSession, dir: String): DataFrame =
    nelsonAalen(Tables.events(s, dir), "purchase").orderBy(col("t_hr"))

  private val q288Sql =
    """WITH bu AS (
      |  SELECT user_id,
      |    min(epoch_us(ts)) AS t0,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp,
      |    max(epoch_us(ts)) AS tmax_u
      |  FROM events GROUP BY user_id),
      |e AS (SELECT max(tmax_u) AS tend FROM bu),
      |durs AS (
      |  SELECT CASE WHEN tp IS NOT NULL
      |      THEN CAST(floor(CAST(tp - t0 AS DOUBLE) / 3600000000.0) AS BIGINT)
      |      ELSE CAST(floor(CAST(tend - t0 AS DOUBLE) / 3600000000.0) AS BIGINT)
      |    END AS t,
      |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM bu CROSS JOIN e),
      |hist AS (
      |  SELECT t, CAST(sum(ev) AS BIGINT) AS d, count(*) AS leave
      |  FROM durs GROUP BY t),
      |tot AS (SELECT count(*) AS n_total FROM durs),
      |risk AS (
      |  SELECT t, d, leave,
      |    n_total - COALESCE(sum(leave) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM hist CROSS JOIN tot),
      |steps AS (
      |  SELECT t, n_risk, d,
      |    CAST(floor(1e6 * CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
      |      AS BIGINT) AS step
      |  FROM risk WHERE d > 0)
      |SELECT t AS t_hr, CAST(n_risk AS BIGINT) AS n_risk, d AS d_events,
      |  CAST(sum(step) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW) AS BIGINT) AS hazard_micro
      |FROM steps ORDER BY t_hr""".stripMargin

  // ==== q294: partial autocorrelation (Levinson–Durbin, lags 1..4) ==========
  //
  // q152's ACF can't separate direct from inherited correlation (an
  // AR(1) has nonzero ACF at EVERY lag); the PACF φ_kk is the AR-order
  // diagnostic (φ cuts off after the true order). Exactness: the biased
  // autocovariances are computed as C_k = Σ(n·y_t − S)(n·y_{t+k} − S) —
  // exact DECIMAL integers (mean-centering without a double mean) — so
  // r_k = C_k/C_0 divides identical integers; the Levinson–Durbin
  // recursion is then a FIXED chain of double ops over the 4-lag domain,
  // unrolled identically in both engines (the q133 identical-chain
  // rule). Hour-domain joins only (the q152 calendar contract).

  /** One row: (n_hours, r1..r4, pacf1..pacf4) over the global hourly
    * count series. */
  def pacf(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
        .as("h"))
      .agg(count(lit(1)).as("y"))
    val m = broadcast(hourly.agg(count(lit(1)).as("n"),
      sum(col("y")).as("sy")))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val centered = hourly.crossJoin(m)
      .select(col("h"), col("n"),
        (dec(col("n")) * col("y") - col("sy")).as("z"))
    val c0 = centered.agg(sum(col("z") * col("z")).as("c0"),
      max(col("n")).as("n"))
    val cks = (1 to 4).map { k =>
      centered.as("a").join(
        centered.select((col("h") + k).as("h"), col("z").as("zl")), Seq("h"))
        .agg(sum(col("z") * col("zl")).as(s"c$k"))
    }
    val joined = cks.foldLeft(c0)((acc, d) => acc.crossJoin(broadcast(d)))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val withR = joined.select(col("n").as("n_hours") +:
      (1 to 4).map(k => (dd(col(s"c$k")) / dd(col("c0"))).as(s"r$k")): _*)
    // Levinson–Durbin, unrolled: phi11 = r1; for m = 2..4,
    //   phi_mm = (r_m − Σ_{j<m} phi_{m−1,j}·r_{m−j}) /
    //            (1 − Σ_{j<m} phi_{m−1,j}·r_j)
    //   phi_mj = phi_{m−1,j} − phi_mm·phi_{m−1,m−j}
    val s1 = withR.withColumn("p11", col("r1"))
    val s2 = s1
      .withColumn("p22", (col("r2") - col("p11") * col("r1")) /
        (lit(1.0) - col("p11") * col("r1")))
      .withColumn("p21", col("p11") - col("p22") * col("p11"))
    val s3 = s2
      .withColumn("p33",
        (col("r3") - (col("p21") * col("r2") + col("p22") * col("r1"))) /
          (lit(1.0) - (col("p21") * col("r1") + col("p22") * col("r2"))))
      .withColumn("p31", col("p21") - col("p33") * col("p22"))
      .withColumn("p32", col("p22") - col("p33") * col("p21"))
    val s4 = s3
      .withColumn("p44",
        (col("r4") - (col("p31") * col("r3") + col("p32") * col("r2") +
          col("p33") * col("r1"))) /
          (lit(1.0) - (col("p31") * col("r1") + col("p32") * col("r2") +
            col("p33") * col("r3"))))
    s4.select(col("n_hours"),
      col("r1"), col("r2"), col("r3"), col("r4"),
      col("p11").as("pacf1"), col("p22").as("pacf2"),
      col("p33").as("pacf3"), col("p44").as("pacf4"))
  }

  private def q294(s: SparkSession, dir: String): DataFrame =
    pacf(Tables.events(s, dir))
      .select(col("n_hours"),
        QueryDef.dec4(col("r1")).as("r1"), QueryDef.dec4(col("r2")).as("r2"),
        QueryDef.dec4(col("r3")).as("r3"), QueryDef.dec4(col("r4")).as("r4"),
        QueryDef.dec4(col("pacf1")).as("pacf1"),
        QueryDef.dec4(col("pacf2")).as("pacf2"),
        QueryDef.dec4(col("pacf3")).as("pacf3"),
        QueryDef.dec4(col("pacf4")).as("pacf4"))

  private val q294Sql =
    """WITH hourly AS (
      |  SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
      |    count(*) AS y
      |  FROM events GROUP BY 1),
      |m AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS sy FROM hourly),
      |z AS (
      |  SELECT h, CAST(n AS HUGEINT) * y - sy AS z, n
      |  FROM hourly CROSS JOIN m),
      |c0 AS (SELECT CAST(sum(z * z) AS HUGEINT) AS c0, max(n) AS n FROM z),
      |c1 AS (SELECT CAST(sum(a.z * b.z) AS HUGEINT) AS c1
      |  FROM z a JOIN z b ON a.h = b.h + 1),
      |c2 AS (SELECT CAST(sum(a.z * b.z) AS HUGEINT) AS c2
      |  FROM z a JOIN z b ON a.h = b.h + 2),
      |c3 AS (SELECT CAST(sum(a.z * b.z) AS HUGEINT) AS c3
      |  FROM z a JOIN z b ON a.h = b.h + 3),
      |c4 AS (SELECT CAST(sum(a.z * b.z) AS HUGEINT) AS c4
      |  FROM z a JOIN z b ON a.h = b.h + 4),
      |r AS (
      |  SELECT n AS n_hours,
      |    CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r1,
      |    CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r2,
      |    CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r3,
      |    CAST(c4 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r4
      |  FROM c0 CROSS JOIN c1 CROSS JOIN c2 CROSS JOIN c3 CROSS JOIN c4),
      |s1 AS (SELECT *, r1 AS p11 FROM r),
      |s2 AS (
      |  SELECT *, (r2 - p11 * r1) / (1.0 - p11 * r1) AS p22 FROM s1),
      |s2b AS (SELECT *, p11 - p22 * p11 AS p21 FROM s2),
      |s3 AS (
      |  SELECT *, (r3 - (p21 * r2 + p22 * r1))
      |    / (1.0 - (p21 * r1 + p22 * r2)) AS p33 FROM s2b),
      |s3b AS (
      |  SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32 FROM s3),
      |s4 AS (
      |  SELECT *, (r4 - (p31 * r3 + p32 * r2 + p33 * r1))
      |    / (1.0 - (p31 * r1 + p32 * r2 + p33 * r3)) AS p44 FROM s3b)
      |SELECT n_hours,
      |  CAST(CAST(r1 AS DECIMAL(38,4)) AS VARCHAR) AS r1,
      |  CAST(CAST(r2 AS DECIMAL(38,4)) AS VARCHAR) AS r2,
      |  CAST(CAST(r3 AS DECIMAL(38,4)) AS VARCHAR) AS r3,
      |  CAST(CAST(r4 AS DECIMAL(38,4)) AS VARCHAR) AS r4,
      |  CAST(CAST(p11 AS DECIMAL(38,4)) AS VARCHAR) AS pacf1,
      |  CAST(CAST(p22 AS DECIMAL(38,4)) AS VARCHAR) AS pacf2,
      |  CAST(CAST(p33 AS DECIMAL(38,4)) AS VARCHAR) AS pacf3,
      |  CAST(CAST(p44 AS DECIMAL(38,4)) AS VARCHAR) AS pacf4
      |FROM s4""".stripMargin

  // ==== q295: Ljung–Box portmanteau test =====================================
  //
  // The WHITENESS test completing the serial-dependence family: q282's
  // DW sees only lag 1 and q294's PACF gives per-lag structure; Ljung–Box
  // aggregates the first K autocorrelations into one statistic,
  // Q = n(n+2)·Σ_{k≤K} r_k²/(n−k) — "is there ANY serial dependence
  // left?" Same exact-integer autocovariance core as q294 (r_k divides
  // identical DECIMALs); Q is a fixed 4-term double chain, identical
  // order in both engines.

  /** One row: (n_hours, r1..r4, q_lb) — Ljung–Box Q at K = 4 over the
    * global hourly count series. */
  def ljungBox(events: DataFrame): DataFrame = {
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val base = pacf(events) // carries n_hours and the exact-ratio r1..r4
    val n = dd(col("n_hours"))
    val q = lit(1.0) * n * (n + lit(2.0)) *
      ((col("r1") * col("r1") / (n - lit(1.0))) +
        (col("r2") * col("r2") / (n - lit(2.0))) +
        (col("r3") * col("r3") / (n - lit(3.0))) +
        (col("r4") * col("r4") / (n - lit(4.0))))
    base.select(col("n_hours"), col("r1"), col("r2"), col("r3"), col("r4"),
      when(col("n_hours") > 4, q).as("q_lb"))
  }

  private def q295(s: SparkSession, dir: String): DataFrame =
    ljungBox(Tables.events(s, dir))
      .select(col("n_hours"),
        QueryDef.dec4(col("r1")).as("r1"), QueryDef.dec4(col("r2")).as("r2"),
        QueryDef.dec4(col("r3")).as("r3"), QueryDef.dec4(col("r4")).as("r4"),
        QueryDef.dec4(col("q_lb")).as("q_lb"))

  private val q295Sql = {
    val core = q294Sql.substring(0, q294Sql.indexOf("s1 AS"))
    s"""${core}qq AS (
       |  SELECT n_hours, r1, r2, r3, r4,
       |    1.0 * CAST(n_hours AS DOUBLE) * (CAST(n_hours AS DOUBLE) + 2.0)
       |    * ((r1 * r1 / (CAST(n_hours AS DOUBLE) - 1.0))
       |      + (r2 * r2 / (CAST(n_hours AS DOUBLE) - 2.0))
       |      + (r3 * r3 / (CAST(n_hours AS DOUBLE) - 3.0))
       |      + (r4 * r4 / (CAST(n_hours AS DOUBLE) - 4.0))) AS q_lb
       |  FROM r)
       |SELECT n_hours,
       |  CAST(CAST(r1 AS DECIMAL(38,4)) AS VARCHAR) AS r1,
       |  CAST(CAST(r2 AS DECIMAL(38,4)) AS VARCHAR) AS r2,
       |  CAST(CAST(r3 AS DECIMAL(38,4)) AS VARCHAR) AS r3,
       |  CAST(CAST(r4 AS DECIMAL(38,4)) AS VARCHAR) AS r4,
       |  CAST(CAST(CASE WHEN n_hours > 4 THEN q_lb END AS DECIMAL(38,4))
       |    AS VARCHAR) AS q_lb
       |FROM qq""".stripMargin
  }

  // ==== q296: covariate balance report (standardized mean differences) ======
  //
  // The table every causal analysis prints BEFORE trusting q230/q261/
  // q276: per covariate, SMD = (m₁−m₀)/√((v₁+v₀)/2) between arms —
  // |SMD| < 0.1 is the conventional "balanced" bar; an imbalanced
  // covariate is exactly the one the matching/weighting must fix. Each
  // user's pre-period covariates (event count, distinct types, value
  // cents) unpivot via stack into (covariate, arm) exact-decimal moment
  // cells — ONE user-domain aggregation + one 6-cell rollup; the q272
  // double discipline at render.

  /** Per covariate: (covariate, n0, n1, smd, balanced) between the
    * user-parity arms on pre-period behavior. */
  def balanceReport(events: DataFrame): DataFrame = {
    val range = broadcast(events.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts"))))
        .cast("long").divide(lit(2L))).cast("long").as("cut")))
    val perUser = events.crossJoin(range)
      .filter(unix_micros(col("ts")) < col("cut"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("x1"),
        countDistinct(col("event_type")).as("x2"),
        sum(round(col("value") * 100).cast("long")).as("x3"))
      .withColumn("t", pmod(col("user_id"), lit(2)))
    val long = perUser.select(col("t"), expr(
      "stack(3, 'n_events', x1, 'n_types', x2, 'value_cents', x3) " +
        "AS (covariate, x)"))
    val m = long.groupBy(col("covariate"), col("t"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(18,0)")).as("s"),
        sum(col("x").cast("decimal(18,0)") * col("x").cast("decimal(18,0)"))
          .as("ss"))
    def side(a: Int) = m.filter(col("t") === a)
      .select(col("covariate"), col("n").as(s"n$a"), col("s").as(s"s$a"),
        col("ss").as(s"ss$a"))
    val j = side(0).join(side(1), Seq("covariate"))
    def dd(c: String) = col(c).cast("double")
    def v(a: Int) =
      (dd(s"n$a") * dd(s"ss$a") - dd(s"s$a") * dd(s"s$a")) /
        (dd(s"n$a") * (dd(s"n$a") - lit(1.0)))
    val smd = (dd("s1") / dd("n1") - dd("s0") / dd("n0")) /
      sqrt((v(0) + v(1)) / lit(2.0))
    j.select(col("covariate"), col("n0"), col("n1"),
      when(col("n0") > 1 && col("n1") > 1 && (v(0) + v(1)) > 0, smd)
        .as("smd"))
      .withColumn("balanced", when(col("smd").isNotNull,
        abs(col("smd")) < 0.1))
  }

  private def q296(s: SparkSession, dir: String): DataFrame =
    balanceReport(Tables.events(s, dir))
      .select(col("covariate"), col("n0"), col("n1"),
        QueryDef.dec4(col("smd")).as("smd"),
        // string render: a NULL BOOLEAN column reaches pandas as NaN on
        // one engine and None on the other — strings null identically
        col("balanced").cast("string").as("balanced"))
      .orderBy(col("covariate"))

  private val q296Sql =
    """WITH rg AS (
      |  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2
      |    AS BIGINT) AS cut FROM events),
      |pu AS (
      |  SELECT user_id, user_id % 2 AS t,
      |    count(*) AS x1,
      |    CAST(count(DISTINCT event_type) AS BIGINT) AS x2,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x3
      |  FROM events CROSS JOIN rg WHERE epoch_us(ts) < cut
      |  GROUP BY user_id),
      |lng AS (
      |  SELECT t, 'n_events' AS covariate, CAST(x1 AS DECIMAL(18,0)) AS x
      |    FROM pu
      |  UNION ALL
      |  SELECT t, 'n_types', CAST(x2 AS DECIMAL(18,0)) FROM pu
      |  UNION ALL
      |  SELECT t, 'value_cents', CAST(x3 AS DECIMAL(18,0)) FROM pu),
      |m AS (
      |  SELECT covariate, t, count(*) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS s,
      |    CAST(sum(x * x) AS DECIMAL(38,0)) AS ss
      |  FROM lng GROUP BY 1, 2),
      |j AS (
      |  SELECT a.covariate, a.n AS n0, a.s AS s0, a.ss AS ss0,
      |    b.n AS n1, b.s AS s1, b.ss AS ss1
      |  FROM m a JOIN m b ON a.covariate = b.covariate
      |    AND a.t = 0 AND b.t = 1),
      |c AS (
      |  SELECT covariate, n0, n1,
      |    (CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
      |      - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
      |      / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0)) AS v0,
      |    (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
      |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1,
      |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |      - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff
      |  FROM j),
      |f AS (
      |  SELECT covariate, n0, n1,
      |    CASE WHEN n0 > 1 AND n1 > 1 AND v0 + v1 > 0
      |      THEN diff / sqrt((v0 + v1) / 2.0) END AS smd
      |  FROM c)
      |SELECT covariate, n0, n1,
      |  CAST(CAST(smd AS DECIMAL(38,4)) AS VARCHAR) AS smd,
      |  CAST(CASE WHEN smd IS NOT NULL THEN abs(smd) < 0.1 END AS VARCHAR)
      |    AS balanced
      |FROM f ORDER BY covariate""".stripMargin

  // ==== q303: two-proportion z-test ===========================================
  //
  // The work-horse A/B readout q262's planner plans FOR and q266's Wilson
  // intervals bracket: z = (p₁−p₀)/√(p̂(1−p̂)(1/n₁+1/n₀)) with pooled p̂,
  // plus the Yates continuity-corrected variant (|Δ| reduced by the
  // half-cell ½(1/n₁+1/n₀)). Conversion = "user ever purchased", arms by
  // user-id parity (the q242 assignment idiom). Everything derives from
  // FOUR integers out of one user-domain pass; z is a fixed double chain.

  /** One row: (n1, x1, n0, x0, z, z_cc) — two-proportion z between arm 1
    * and arm 0 of `arms` rows (arm, converted). */
  def twoProportionZ(arms: DataFrame): DataFrame = {
    val m = arms.agg(
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 1 && col("converted"), 1L).otherwise(0L))
        .as("x1"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 0 && col("converted"), 1L).otherwise(0L))
        .as("x0"))
    def dd(c: Column) = c.cast("double")
    val p1 = dd(col("x1")) / dd(col("n1"))
    val p0 = dd(col("x0")) / dd(col("n0"))
    val pp = (dd(col("x1")) + dd(col("x0"))) / (dd(col("n1")) + dd(col("n0")))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / dd(col("n1")) + lit(1.0) / dd(col("n0"))))
    val cc = lit(0.5) * (lit(1.0) / dd(col("n1")) + lit(1.0) / dd(col("n0")))
    m.select(col("n1"), col("x1"), col("n0"), col("x0"),
      when(col("n1") > 0 && col("n0") > 0 && se > 0, (p1 - p0) / se).as("z"),
      when(col("n1") > 0 && col("n0") > 0 && se > 0,
        greatest(abs(p1 - p0) - cc, lit(0.0)) / se).as("z_cc"))
  }

  private def q303(s: SparkSession, dir: String): DataFrame = {
    val byUser = Tables.events(s, dir).groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(pmod(col("user_id"), lit(2)).cast("int").as("arm"),
        (col("conv") === 1L).as("converted"))
    twoProportionZ(byUser)
      .select(col("n1"), col("x1"), col("n0"), col("x0"),
        QueryDef.dec4(col("z")).as("z"), QueryDef.dec4(col("z_cc")).as("z_cc"))
  }

  private val q303Sql =
    """WITH u AS (
      |  SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |m AS (
      |  SELECT
      |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x1,
      |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x0
      |  FROM u),
      |c AS (
      |  SELECT n1, x1, n0, x0,
      |    CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |      - CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff,
      |    sqrt(((CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE))
      |        / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE)))
      |      * (1.0 - (CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE))
      |        / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE)))
      |      * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n0 AS DOUBLE))) AS se,
      |    0.5 * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n0 AS DOUBLE)) AS cc
      |  FROM m)
      |SELECT n1, x1, n0, x0,
      |  CAST(CAST(CASE WHEN n1 > 0 AND n0 > 0 AND se > 0 THEN diff / se END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS z,
      |  CAST(CAST(CASE WHEN n1 > 0 AND n0 > 0 AND se > 0
      |    THEN greatest(abs(diff) - cc, 0.0) / se END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS z_cc
      |FROM c""".stripMargin

  // ==== q305: Markov removal-effect channel attribution =======================
  //
  // The data-driven attribution model between last-touch (q125),
  // position-based (q167), and exact Shapley (q250): journeys are a
  // first-order Markov chain over channels; a channel's credit is its
  // REMOVAL EFFECT — how much absorption into CONV drops when every
  // transition into the channel is redirected to NULL. Determinism at
  // both ends: the chain's absorption is computed by K=64 fixed-point
  // steps in INTEGER arithmetic — mass carried in 10¹² units, each edge
  // term floored once as p·c div rowsum — so every iterate is an exact
  // integer (BigInt here, HUGEINT in the oracle's unrolled CTE chain,
  // the q123 precedent) and summation order cannot matter. The corpus
  // pass is one window lag per user truncated at first conversion; the
  // transition matrix the driver folds is (channels+1)² — domain-sized
  // (the Preference.duels collect contract). Share = (full − removed_c)
  // / Σ(full − removed), a ratio of exact integers.

  private val MkScale = BigInt(10).pow(12)
  private val MkIters = 64

  /** Transition counts (src, dst, c) with src ∈ START ∪ channels, dst ∈
    * channels ∪ {CONV, NULL}; journeys truncate at first `convType`. */
  private[operators] def journeyEdges(events: DataFrame, convType: String)
      : DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val walk = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("cb", coalesce(
        max(when(col("event_type") === convType, 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .filter(col("cb") === 0)
    val t = walk
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .withColumn("rn", row_number().over(w))
    def lbl(c: Column) = when(c === convType, lit("CONV")).otherwise(c)
    val starts = t.filter(col("rn") === 1)
      .select(lit("START").as("src"), lbl(col("event_type")).as("dst"))
    val mids = t.filter(col("nxt").isNotNull)
      .select(col("event_type").as("src"), lbl(col("nxt")).as("dst"))
    val ends = t.filter(col("nxt").isNull && col("event_type") =!= convType)
      .select(col("event_type").as("src"), lit("NULL").as("dst"))
    starts.union(mids).union(ends)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
  }

  /** Per channel: (channel, conv_full_e12, conv_removed_e12,
    * removal_effect, share). */
  def markovRemovalAttribution(events: DataFrame,
      convType: String = "purchase"): DataFrame = {
    val s = events.sparkSession
    val edges = journeyEdges(events, convType).collect()
      .map(r => (r.getString(0), r.getString(1)) -> BigInt(r.getLong(2)))
      .toMap
    val rowSum = edges.groupBy(_._1._1).map { case (f, es) =>
      f -> es.values.sum }
    val channels = edges.keysIterator.map(_._1).filter(_ != "START")
      .toSeq.distinct.sorted
    def absorb(removed: Option[String]): BigInt = {
      var p: Map[String, BigInt] =
        (channels.map(_ -> BigInt(0)) :+ ("START" -> MkScale)).toMap
      var conv = BigInt(0)
      for (_ <- 1 to MkIters) {
        val np = scala.collection.mutable.Map[String, BigInt](
          channels.map(_ -> BigInt(0)): _*)
        for (((f, t0), c) <- edges if !removed.contains(f)) {
          val pf = p.getOrElse(f, BigInt(0))
          if (pf > 0) {
            val t = if (removed.contains(t0)) "NULL" else t0
            val term = pf * c / rowSum(f)
            if (t == "CONV") conv += term
            else if (t != "NULL") np(t) += term
          }
        }
        p = np.toMap + ("START" -> BigInt(0))
      }
      conv
    }
    val full = absorb(None)
    val removedConv = channels.map(ch => ch -> absorb(Some(ch)))
    val totalDrop = removedConv.map { case (_, r) => full - r }.sum
    import s.implicits._
    removedConv.map { case (ch, r) =>
      val drop = full - r
      (ch, full.toLong, r.toLong,
        if (full > 0) drop.toDouble / full.toDouble else 0.0,
        if (totalDrop > 0) drop.toDouble / totalDrop.toDouble else 0.0)
    }.toDF("channel", "conv_full_e12", "conv_removed_e12",
      "removal_effect", "share")
  }

  private def q305(s: SparkSession, dir: String): DataFrame =
    markovRemovalAttribution(Tables.events(s, dir))
      .select(col("channel"), col("conv_full_e12"), col("conv_removed_e12"),
        QueryDef.dec4(col("removal_effect")).as("removal_effect"),
        QueryDef.dec4(col("share")).as("share"))
      .orderBy(col("channel"))

  private val q305Sql = {
    // one fixed-point step: push every state's mass through the (possibly
    // removal-modified) edge list; CONV absorbs via an explicit self-loop
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and a
    // 64-deep chain of inlined self-referencing joins explodes
    // exponentially at plan time
    val step = (i: Int) =>
      s"""w$i AS MATERIALIZED (
         |  SELECT x.rm, e.dst2 AS state,
         |    CAST(sum(x.p * e.c // e.r) AS HUGEINT) AS p
         |  FROM w${i - 1} x JOIN edges2 e
         |    ON e.rm = x.rm AND e.src = x.state
         |  GROUP BY 1, 2)""".stripMargin
    s"""WITH walk AS (
       |  SELECT user_id, ts, event_id, event_type
       |  FROM (
       |    SELECT user_id, ts, event_id, event_type,
       |      COALESCE(max(CASE WHEN event_type = 'purchase' THEN 1
       |        ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
       |    FROM events)
       |  WHERE cb = 0),
       |t AS (
       |  SELECT event_type,
       |    lead(event_type) OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
       |    row_number() OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM walk),
       |edges AS (
       |  SELECT src, dst, CAST(count(*) AS HUGEINT) AS c FROM (
       |    SELECT 'START' AS src, CASE WHEN event_type = 'purchase'
       |      THEN 'CONV' ELSE event_type END AS dst FROM t WHERE rn = 1
       |    UNION ALL
       |    SELECT event_type, CASE WHEN nxt = 'purchase' THEN 'CONV'
       |      ELSE nxt END FROM t WHERE nxt IS NOT NULL
       |    UNION ALL
       |    SELECT event_type, 'NULL' FROM t
       |    WHERE nxt IS NULL AND event_type <> 'purchase')
       |  GROUP BY 1, 2),
       |rsum AS (SELECT src, CAST(sum(c) AS HUGEINT) AS r
       |  FROM edges GROUP BY 1),
       |channels AS (SELECT DISTINCT src AS ch FROM edges
       |  WHERE src <> 'START'),
       |removals AS (SELECT 'NONE' AS rm UNION ALL SELECT ch FROM channels),
       |edges2 AS MATERIALIZED (
       |  SELECT r.rm, e.src,
       |    CASE WHEN e.dst = r.rm THEN 'NULL' ELSE e.dst END AS dst2,
       |    e.c, s.r
       |  FROM removals r JOIN edges e ON e.src <> r.rm
       |  JOIN rsum s ON s.src = e.src
       |  WHERE NOT (CASE WHEN e.dst = r.rm THEN 'NULL' ELSE e.dst END)
       |    = 'NULL'
       |  UNION ALL
       |  SELECT rm, 'CONV', 'CONV', CAST(1 AS HUGEINT), CAST(1 AS HUGEINT)
       |  FROM removals),
       |w0 AS (
       |  SELECT rm, 'START' AS state, CAST(1000000000000 AS HUGEINT) AS p
       |  FROM removals),
       |${(1 to MkIters).map(step).mkString(",\n")},
       |conv AS (
       |  SELECT rm, COALESCE(max(CASE WHEN state = 'CONV' THEN p END),
       |    CAST(0 AS HUGEINT)) AS pc
       |  FROM w$MkIters GROUP BY rm),
       |full_c AS (SELECT pc AS pfull FROM conv WHERE rm = 'NONE'),
       |drops AS (
       |  SELECT c.rm AS channel, f.pfull, c.pc,
       |    f.pfull - c.pc AS drop
       |  FROM conv c CROSS JOIN full_c f WHERE c.rm <> 'NONE'),
       |tot AS (SELECT CAST(sum(drop) AS HUGEINT) AS td FROM drops)
       |SELECT channel, CAST(pfull AS BIGINT) AS conv_full_e12,
       |  CAST(pc AS BIGINT) AS conv_removed_e12,
       |  CAST(CAST(CASE WHEN pfull > 0
       |    THEN CAST(drop AS DOUBLE) / CAST(pfull AS DOUBLE) ELSE 0.0 END
       |    AS DECIMAL(38,4)) AS VARCHAR) AS removal_effect,
       |  CAST(CAST(CASE WHEN td > 0
       |    THEN CAST(drop AS DOUBLE) / CAST(td AS DOUBLE) ELSE 0.0 END
       |    AS DECIMAL(38,4)) AS VARCHAR) AS share
       |FROM drops CROSS JOIN tot ORDER BY channel""".stripMargin
  }

  // ==== q306: restricted mean survival time ===================================
  //
  // The survival scalar clinicians and retention teams quote when median
  // survival is undefined (curve never crosses 0.5): RMST(τ) = ∫₀^τ S(t)dt
  // — expected hours survived within the observation horizon — computed
  // as the area under q229's step curve. Each step's area is floored
  // ONCE as ⌊10⁶·exp(lnS_unats/10⁶)·Δt⌋ so the total is an exact integer
  // sum over the duration domain (the q229 ln / q283 term discipline);
  // the [0, t₁) prefix at S=1 contributes exactly 10⁶·t₁.

  /** One row: (tau_hr, n_death_times, rmst_micro_hr) — RMST over the
    * lag-to-first-`eventType` curve, τ = longest observed duration. */
  def rmst(events: DataFrame, eventType: String): DataFrame = {
    val km = kaplanMeier(events, eventType)
    // horizon = longest duration, censored users included (the risk
    // table's own duration definition, recomputed as one aggregate)
    val byUser = events.groupBy(col("user_id")).agg(
      min(unix_micros(col("ts"))).as("t0"),
      min(when(col("event_type") === eventType, unix_micros(col("ts"))))
        .as("tp"),
      max(unix_micros(col("ts"))).as("tmax_u"))
    val end = broadcast(byUser.agg(max(col("tmax_u")).as("tend")))
    val tau = byUser.crossJoin(end)
      .agg(max(when(col("tp").isNotNull,
        floor((col("tp") - col("t0")) / lit(3600000000L)))
        .otherwise(floor((col("tend") - col("t0")) / lit(3600000000L))))
        .cast("long").as("tau"))
    val w = Window.orderBy(col("t_hr"))
    val areas = km.crossJoin(broadcast(tau))
      .withColumn("t_next", coalesce(lead(col("t_hr"), 1).over(w),
        col("tau")))
      .withColumn("seg", floor(lit(1e6) *
        exp(col("log_surv_unats").cast("double") / lit(1e6)) *
        greatest(col("t_next") - col("t_hr"), lit(0L)).cast("double"))
        .cast("long"))
    areas.groupBy(col("tau"))
      .agg(count(lit(1)).as("n_death_times"),
        (min(col("t_hr")) * lit(1000000L)).as("head_micro"),
        sum(col("seg")).as("tail_micro"))
      .select(col("tau").as("tau_hr"), col("n_death_times"),
        (col("head_micro") + col("tail_micro")).as("rmst_micro_hr"))
  }

  private def q306(s: SparkSession, dir: String): DataFrame =
    rmst(Tables.events(s, dir), "purchase")

  private val q306Sql =
    """WITH u AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t0,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
      |      AS tp,
      |    max(epoch_us(ts)) AS tmax_u
      |  FROM events GROUP BY user_id),
      |e AS (SELECT max(tmax_u) AS tend FROM u),
      |durs AS (
      |  SELECT CAST(CASE WHEN tp IS NOT NULL
      |      THEN floor((tp - t0) / 3600000000)
      |      ELSE floor((tend - t0) / 3600000000) END AS BIGINT) AS t,
      |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM u CROSS JOIN e),
      |tau AS (SELECT max(t) AS tau FROM durs),
      |hist AS (
      |  SELECT t, CAST(sum(ev) AS BIGINT) AS d, count(*) AS leave
      |  FROM durs GROUP BY t),
      |tot AS (SELECT count(*) AS n_total FROM durs),
      |risk AS (
      |  SELECT t, d, n_total - COALESCE(sum(leave) OVER
      |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
      |        AND 1 PRECEDING), 0) AS n_risk
      |  FROM hist CROSS JOIN tot WHERE d > 0),
      |km AS (
      |  SELECT t, sum(CASE WHEN d < n_risk THEN CAST(floor(1e6
      |      * ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)))
      |      AS BIGINT) END)
      |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
      |      ROW) AS unats
      |  FROM risk),
      |areas AS (
      |  SELECT t, CAST(floor(1e6 * exp(CAST(unats AS DOUBLE) / 1e6)
      |    * CAST(greatest(COALESCE(lead(t) OVER (ORDER BY t), tau) - t, 0)
      |      AS DOUBLE)) AS BIGINT) AS seg
      |  FROM km CROSS JOIN tau)
      |SELECT tau.tau AS tau_hr, count(*) AS n_death_times,
      |  CAST(min(areas.t) * 1000000 + sum(areas.seg) AS BIGINT)
      |    AS rmst_micro_hr
      |FROM areas CROSS JOIN tau GROUP BY 1""".stripMargin

  // ==== q307: sharp regression discontinuity ==================================
  //
  // The causal design the covariate-adjustment suite (q230/q261/q276)
  // lacks: when treatment flips deterministically at a threshold of a
  // running variable, the effect is the JUMP between the two local OLS
  // fits evaluated AT the cutoff. Estimator: within a symmetric
  // bandwidth, fit count ~ running on each side from exact decimal
  // moments (the q282 OLS chain) and report ŷ₊(c) − ŷ₋(c). The fixture
  // runs on user-id digits (deterministic, both engines identical); the
  // one corpus pass is the per-user outcome aggregate.

  /** One row: (n_left, n_right, y_left_at_cut, y_right_at_cut, effect)
    * for outcome ~ running OLS fits on [cut−bw, cut) and [cut, cut+bw). */
  def regressionDiscontinuity(pts: DataFrame, cut: Long, bw: Long)
      : DataFrame = {
    def d0(c: Column) = c.cast("decimal(38,0)")
    def side(name: String, cond: Column) =
      pts.filter(cond)
        .agg(count(lit(1)).as(s"n_$name"),
          sum(col("x")).as(s"sx_$name"), sum(col("y")).as(s"sy_$name"),
          sum(d0(col("x")) * col("x")).as(s"sxx_$name"),
          sum(d0(col("x")) * col("y")).as(s"sxy_$name"))
    val l = side("l", col("x") >= cut - bw && col("x") < cut)
    val r = side("r", col("x") >= cut && col("x") < cut + bw)
    def dd(c: Column) = c.cast("double")
    def fitAt(name: String, at: Long): Column = {
      val n = col(s"n_$name"); val sx = col(s"sx_$name")
      val sy = col(s"sy_$name")
      val slope = dd(d0(n) * col(s"sxy_$name") - d0(sx) * d0(sy)) /
        dd(d0(n) * col(s"sxx_$name") - d0(sx) * d0(sx))
      val icept = (dd(sy) - slope * dd(sx)) / dd(n)
      icept + slope * at
    }
    l.crossJoin(r).select(
      col("n_l").as("n_left"), col("n_r").as("n_right"),
      fitAt("l", cut).as("y_left_at_cut"),
      fitAt("r", cut).as("y_right_at_cut"),
      (fitAt("r", cut) - fitAt("l", cut)).as("effect"))
  }

  private def q307(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(s, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("y"))
      .select(pmod(col("user_id"), lit(1000L)).as("x"), col("y"))
    regressionDiscontinuity(pts, cut = 500L, bw = 200L)
      .select(col("n_left"), col("n_right"),
        QueryDef.dec4(col("y_left_at_cut")).as("y_left_at_cut"),
        QueryDef.dec4(col("y_right_at_cut")).as("y_right_at_cut"),
        QueryDef.dec4(col("effect")).as("effect"))
  }

  private val q307Sql = {
    def side(name: String, cond: String) =
      s"""$name AS (
         |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
         |  FROM pts WHERE $cond)""".stripMargin
    def fit(a: String, at: String) =
      s"""(CAST($a.sy AS DOUBLE)
         |  - (CAST($a.n * $a.sxy - CAST($a.sx AS HUGEINT) * $a.sy
         |      AS DOUBLE)
         |    / CAST($a.n * $a.sxx - CAST($a.sx AS HUGEINT) * $a.sx
         |      AS DOUBLE)) * CAST($a.sx AS DOUBLE)) / CAST($a.n AS DOUBLE)
         |+ (CAST($a.n * $a.sxy - CAST($a.sx AS HUGEINT) * $a.sy AS DOUBLE)
         |    / CAST($a.n * $a.sxx - CAST($a.sx AS HUGEINT) * $a.sx
         |      AS DOUBLE)) * $at""".stripMargin
    s"""WITH pts AS (
       |  SELECT user_id % 1000 AS x, count(*) AS y
       |  FROM events GROUP BY user_id),
       |${side("l", "x >= 300 AND x < 500")},
       |${side("r", "x >= 500 AND x < 700")}
       |SELECT l.n AS n_left, r.n AS n_right,
       |  CAST(CAST(${fit("l", "500")} AS DECIMAL(38,4)) AS VARCHAR)
       |    AS y_left_at_cut,
       |  CAST(CAST(${fit("r", "500")} AS DECIMAL(38,4)) AS VARCHAR)
       |    AS y_right_at_cut,
       |  CAST(CAST((${fit("r", "500")}) - (${fit("l", "500")})
       |    AS DECIMAL(38,4)) AS VARCHAR) AS effect
       |FROM l CROSS JOIN r""".stripMargin
  }

  // ==== q308: inter-arrival exponential fit ===================================
  //
  // The arrival-process diagnostic behind capacity planning: per type,
  // MLE-fit Exp(λ) to the inter-event gaps (λ = n/Σg) and score the fit
  // with the one-sample KS distance D = max(F_emp − F_exp, F_exp −
  // F_emp⁻) over the sorted gaps — a Poisson process scores near 0, a
  // bursty one pins D high. Order-safety without flooring: every
  // aggregate here is a MAX of per-row doubles (identical in both
  // engines — same gap integers, same λ ratio, same exp), never an
  // order-sensitive double sum; the only sums are integer (n, Σg).
  //
  // Scale shape (the lag window): events are NOT sorted inside
  // ≤|types| tasks. Gaps are computed within (type, day-bucket)
  // partitions — parallelism = types × days — and the one gap that
  // crosses each bucket boundary is stitched back by joining every
  // bucket's first timestamp against the previous non-empty bucket's
  // last (a bucket-domain lag window; the ChunkAssigner.withPrefixSum
  // boundary precedent). The gap multiset is identical to a global
  // per-type sort: ties in `us` are adjacent under any tie-break, so
  // the lag differences do not depend on `event_id` order.

  /** Microseconds per stitch bucket (one day). */
  private val GapBucketUs = 86400L * 1000000L

  /** Per type: (event_type, n_gaps, mean_gap_sec, ks). */
  def interArrivalFit(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("bkt", expr(s"us div $GapBucketUs"))
    // interior gaps: lag within (type, day) — types × days tasks
    val wIn = Window.partitionBy(col("event_type"), col("bkt"))
      .orderBy(col("us"), col("event_id"))
    val interior = ev
      .withColumn("g", col("us") - lag(col("us"), 1).over(wIn))
      .filter(col("g").isNotNull)
      .select(col("event_type"), col("g"))
    // boundary gaps: each bucket's first us minus the previous
    // non-empty bucket's last us, over the bounded (type, day) domain
    val perBkt = ev.groupBy(col("event_type"), col("bkt"))
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
    val wB = Window.partitionBy(col("event_type")).orderBy(col("bkt"))
    val boundary = perBkt
      .withColumn("prev_last", lag(col("last_us"), 1).over(wB))
      .filter(col("prev_last").isNotNull)
      .select(col("event_type"),
        (col("first_us") - col("prev_last")).as("g"))
    val gaps = interior.unionByName(boundary)
    val m = gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"))
    def dd(c: Column) = c.cast("double")
    // per distinct gap value: empirical CDF steps from the value-domain
    // histogram; F_exp at the same value from the fitted rate
    val byVal = gaps.groupBy(col("event_type"), col("g"))
      .agg(count(lit(1)).as("cnt"))
    val wv = Window.partitionBy(col("event_type")).orderBy(col("g"))
    val steps = byVal
      .withColumn("cum", sum(col("cnt")).over(
        wv.rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(m), Seq("event_type"))
      .withColumn("fexp", lit(1.0) -
        exp(lit(-1.0) * dd(col("g")) * dd(col("n")) / dd(col("sg"))))
      .withColumn("dplus", dd(col("cum")) / dd(col("n")) - col("fexp"))
      .withColumn("dminus", col("fexp") -
        (dd(col("cum")) - dd(col("cnt"))) / dd(col("n")))
    steps.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_gaps"),
        max(dd(col("sg")) / (dd(col("n")) * lit(1e6)))
          .as("mean_gap_sec"),
        max(greatest(col("dplus"), col("dminus"))).as("ks"))
  }

  private def q308(s: SparkSession, dir: String): DataFrame =
    interArrivalFit(Tables.events(s, dir))
      .select(col("event_type"), col("n_gaps"),
        QueryDef.dec4(col("mean_gap_sec")).as("mean_gap_sec"),
        QueryDef.dec4(col("ks")).as("ks"))
      .orderBy(col("event_type"))

  private val q308Sql =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER
      |      (PARTITION BY event_type ORDER BY ts, event_id) AS g
      |  FROM events),
      |gaps AS (SELECT event_type, g FROM g WHERE g IS NOT NULL),
      |m AS (
      |  SELECT event_type, count(*) AS n, CAST(sum(g) AS BIGINT) AS sg
      |  FROM gaps GROUP BY 1),
      |byval AS (
      |  SELECT event_type, g, count(*) AS cnt FROM gaps GROUP BY 1, 2),
      |steps AS (
      |  SELECT b.event_type, n, sg, cnt,
      |    sum(cnt) OVER (PARTITION BY b.event_type ORDER BY g
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    1.0 - exp(-1.0 * CAST(g AS DOUBLE) * CAST(n AS DOUBLE)
      |      / CAST(sg AS DOUBLE)) AS fexp
      |  FROM byval b JOIN m USING (event_type))
      |SELECT event_type, max(n) AS n_gaps,
      |  CAST(CAST(max(CAST(sg AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS mean_gap_sec,
      |  CAST(CAST(max(greatest(
      |    CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) - fexp,
      |    fexp - (CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE))
      |      / CAST(n AS DOUBLE))) AS DECIMAL(38,4)) AS VARCHAR) AS ks
      |FROM steps GROUP BY event_type ORDER BY event_type""".stripMargin

  // ==== q315: turning-point randomness test ===================================
  //
  // The local-extremum companion to B227's runs test (runs sees sign
  // changes vs a level; turning points see CURVATURE — an autocorrelated
  // series has too few, an alternating one too many): per type, count
  // strict interior maxima/minima of the hourly series; under
  // randomness E[T] = 2(n−2)/3 and Var[T] = (16n−29)/90, z = (T−E)/√Var.
  // T and n are exact integers from one hour-domain window pass; z is a
  // fixed double chain. Ties (equal neighbors) are not turning points —
  // strict comparisons, identical in both engines.

  /** Per type: (event_type, n_hours, n_turns, z). */
  def turningPoints(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val t = hourly
      .withColumn("yp", lag(col("y"), 1).over(w))
      .withColumn("yn", lead(col("y"), 1).over(w))
      .withColumn("turn", when(col("yp").isNotNull && col("yn").isNotNull &&
        ((col("y") > col("yp") && col("y") > col("yn")) ||
          (col("y") < col("yp") && col("y") < col("yn"))), 1L)
        .otherwise(0L))
    def dd(c: Column) = c.cast("double")
    t.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("turn")).as("n_turns"))
      .select(col("event_type"), col("n_hours"), col("n_turns"),
        when(col("n_hours") >= 3,
          (dd(col("n_turns")) - lit(2.0) * (dd(col("n_hours")) - 2) / 3) /
            sqrt((lit(16.0) * dd(col("n_hours")) - 29) / 90)).as("z"))
  }

  private def q315(s: SparkSession, dir: String): DataFrame =
    turningPoints(Tables.events(s, dir))
      .select(col("event_type"), col("n_hours"), col("n_turns"),
        QueryDef.dec4(col("z")).as("z"))
      .orderBy(col("event_type"))

  private val q315Sql =
    """WITH hourly AS (
      |  SELECT event_type,
      |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
      |    count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, y,
      |    lag(y) OVER (PARTITION BY event_type ORDER BY h) AS yp,
      |    lead(y) OVER (PARTITION BY event_type ORDER BY h) AS yn
      |  FROM hourly),
      |agg AS (
      |  SELECT event_type, count(*) AS n_hours,
      |    CAST(sum(CASE WHEN yp IS NOT NULL AND yn IS NOT NULL
      |      AND ((y > yp AND y > yn) OR (y < yp AND y < yn))
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_turns
      |  FROM t GROUP BY 1)
      |SELECT event_type, n_hours, n_turns,
      |  CAST(CAST(CASE WHEN n_hours >= 3 THEN
      |    (CAST(n_turns AS DOUBLE)
      |      - 2.0 * (CAST(n_hours AS DOUBLE) - 2) / 3)
      |    / sqrt((16.0 * CAST(n_hours AS DOUBLE) - 29) / 90) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS z
      |FROM agg ORDER BY event_type""".stripMargin

  // ==== q317: Page–Hinkley changepoint ========================================
  //
  // The ADAPTIVE-baseline changepoint completing the family (B126 CUSUM
  // needs a frozen baseline, B228 Pettitt is offline rank-based —
  // Page–Hinkley tracks the RUNNING mean, so a slow drift is caught
  // without any calibration): m_t = Σ_{i≤t}(x_i − x̄_i − δ), alarm when
  // m_t − min_{u≤t} m_u > λ. Exactness: each term multiplies through by
  // its own prefix length — term_i = ⌊10⁶(i·x_i − S_i − i·δ)/i⌋, one
  // floor of an exact integer ratio — so the cumulative sum, running
  // min, and gap are exact integers in both engines; one hour-domain
  // window pass. δ and λ in count units (δ=0, λ=50 here).

  /** Per type: (event_type, n_hours, max_gap_micro, alarm_hr) — the
    * first hour where the PH gap exceeds `lambda`, null if never. */
  /** Per hourly row: (event_type, h, y, gap) — the PH gap series; the
    * streaming twin's parity surface. */
  private[graft] def pageHinkleyFrame(hourly: DataFrame, deltaMicro: Long)
      : DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def d0(c: Column) = c.cast("decimal(38,0)")
    hourly
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("s", sum(col("y")).over(cum))
      .withColumn("term", floor(
        (lit(1000000L) * (d0(col("i")) * col("y") - d0(col("s"))) -
          d0(col("i")) * deltaMicro).cast("double") /
          col("i").cast("double")).cast("long"))
      .withColumn("m", sum(col("term")).over(cum))
      .withColumn("minm", min(col("m")).over(cum))
      .withColumn("gap", col("m") - col("minm"))
  }

  def pageHinkley(events: DataFrame, deltaMicro: Long = 0L,
      lambda: Long = 50L): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("y"))
    val t = pageHinkleyFrame(hourly, deltaMicro)
    t.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), max(col("gap")).as("max_gap_micro"),
        min(when(col("gap") > lambda * 1000000L, col("h")))
          .as("alarm_hr"))
  }

  private def q317(s: SparkSession, dir: String): DataFrame =
    pageHinkley(Tables.events(s, dir))
      .select(col("event_type"), col("n_hours"), col("max_gap_micro"),
        col("alarm_hr"))
      .orderBy(col("event_type"))

  private val q317Sql =
    """WITH hourly AS (
      |  SELECT event_type,
      |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
      |    count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, h, y,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS i,
      |    sum(y) OVER (PARTITION BY event_type ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      |  FROM hourly),
      |terms AS (
      |  SELECT event_type, h,
      |    CAST(floor(CAST(1000000 * (CAST(i AS HUGEINT) * y - s)
      |      AS DOUBLE) / CAST(i AS DOUBLE)) AS BIGINT) AS term
      |  FROM t),
      |m AS (
      |  SELECT event_type, h,
      |    sum(term) OVER (PARTITION BY event_type ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      |  FROM terms),
      |g AS (
      |  SELECT event_type, h, m - min(m) OVER (PARTITION BY event_type
      |    ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS gap
      |  FROM m)
      |SELECT event_type, count(*) AS n_hours,
      |  CAST(max(gap) AS BIGINT) AS max_gap_micro,
      |  min(CASE WHEN gap > 50000000 THEN h END) AS alarm_hr
      |FROM g GROUP BY 1 ORDER BY event_type""".stripMargin

  // ==== q321: empirical-Bayes rate shrinkage ==================================
  //
  // The ranking fix for small-sample rates (a 2/2 user must not outrank
  // a 95/100 one): beta-binomial shrinkage with the prior fit by method
  // of moments on the eligible population — α = μ(μ(1−μ)/σ² − 1),
  // β = (1−μ)(…) from the mean/variance of per-user conversion rates,
  // then every user's rate shrinks to (x+α)/(n+α+β). Exactness: rates
  // enter the moment fit as ⌊10⁶·x/n⌋ integers (one floor each), so μ
  // and σ² derive from exact integer sums; α/β are a fixed double chain;
  // outputs are ⌊10⁶·⌋-floored so ordering and rendering are integer.

  /** Per item: (user_id, n, x, raw_e6, shrunk_e6); prior fit on items
    * with n ≥ `minN`. */
  def ebShrunkRates(perItem: DataFrame, minN: Long): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val rated = perItem
      .withColumn("r6", floor(lit(1e6) * dd(col("x")) / dd(col("n")))
        .cast("long"))
    val prior = broadcast(rated.filter(col("n") >= minN)
      .agg(count(lit(1)).as("m"), sum(col("r6")).as("sr"),
        sum(col("r6").cast("decimal(38,0)") * col("r6")).as("srr")))
    val withPrior = rated.crossJoin(prior)
      .withColumn("mu", dd(col("sr")) / (dd(col("m")) * lit(1e6)))
      .withColumn("v",
        (dd(col("m")) * dd(col("srr")) - dd(col("sr")) * dd(col("sr"))) /
          (dd(col("m")) * (dd(col("m")) - 1) * lit(1e12)))
      .withColumn("c0", when(col("v") > 0,
        col("mu") * (lit(1.0) - col("mu")) / col("v") - 1))
      .withColumn("alpha", col("mu") * col("c0"))
      .withColumn("beta", (lit(1.0) - col("mu")) * col("c0"))
    withPrior
      .select(col("user_id"), col("n"), col("x"), col("r6").as("raw_e6"),
        when(col("c0") > 0, floor(lit(1e6) *
          (dd(col("x")) + col("alpha")) /
          (dd(col("n")) + col("alpha") + col("beta"))).cast("long"))
          .as("shrunk_e6"))
  }

  private def q321(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("x"))
    ebShrunkRates(perUser, minN = 20L)
      .orderBy(col("shrunk_e6").desc, col("user_id")).limit(25)
  }

  private val q321Sql =
    """WITH u AS (
      |  SELECT user_id, count(*) AS n,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x
      |  FROM events GROUP BY user_id),
      |rated AS (
      |  SELECT user_id, n, x,
      |    CAST(floor(1e6 * CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
      |      AS BIGINT) AS r6
      |  FROM u),
      |prior AS (
      |  SELECT count(*) AS m, CAST(sum(r6) AS BIGINT) AS sr,
      |    CAST(sum(CAST(r6 AS HUGEINT) * r6) AS HUGEINT) AS srr
      |  FROM rated WHERE n >= 20),
      |p AS (
      |  SELECT m, CAST(sr AS DOUBLE) / (CAST(m AS DOUBLE) * 1e6) AS mu,
      |    (CAST(m AS DOUBLE) * CAST(srr AS DOUBLE)
      |      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
      |      / (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) - 1) * 1e12) AS v
      |  FROM prior),
      |c AS (
      |  SELECT mu, v,
      |    CASE WHEN v > 0 THEN mu * (1.0 - mu) / v - 1 END AS c0
      |  FROM p)
      |SELECT user_id, n, x, r6 AS raw_e6,
      |  CAST(CASE WHEN c0 > 0 THEN floor(1e6 * (CAST(x AS DOUBLE)
      |      + mu * c0)
      |    / (CAST(n AS DOUBLE) + mu * c0 + (1.0 - mu) * c0)) END
      |    AS BIGINT) AS shrunk_e6
      |FROM rated CROSS JOIN c
      |ORDER BY shrunk_e6 DESC, user_id LIMIT 25""".stripMargin

  // ==== q322: Cox proportional hazards — binary treatment ====================
  //
  // The survival-adjusted effect estimate the KM/Nelson–Aalen/log-rank
  // family stops short of: the Cox partial-likelihood hazard ratio for
  // a binary covariate under Breslow ties. With x ∈ {0,1} the score
  // and information collapse to per-event-time closed forms over FOUR
  // integers (d_t, d1_t, n1_t, n0_t from the treatment-split risk
  // table): U(β) = Σ_t[d1 − d·n1e^β/(n1e^β+n0)], I(β) = Σ_t d·n1e^β·n0/
  // (n1e^β+n0)², solved by K=25 Newton steps from β=0. Determinism: the
  // event-time table is DURATION-DOMAIN (the q229 contract — collected
  // like kendallTau's histogram, never corpus rows); each Newton step
  // folds the per-time double terms in ASCENDING t order, and the
  // oracle replays the identical fold via K unrolled MATERIALIZED CTEs
  // with list_reduce over ORDER BY t lists — both engines execute the
  // same double chain term for term.

  private val CoxIters = 25

  /** One row: (n_times, d_total, beta_e6, hazard_ratio_e6) for
    * time-to-first-`eventType`, treatment = user_id parity. */
  def coxBinary(events: DataFrame, eventType: String): DataFrame = {
    val s = events.sparkSession
    val byUser = events.groupBy(col("user_id")).agg(
      min(unix_micros(col("ts"))).as("t0"),
      min(when(col("event_type") === eventType, unix_micros(col("ts"))))
        .as("tp"),
      max(unix_micros(col("ts"))).as("tmax_u"))
    val end = broadcast(byUser.agg(max(col("tmax_u")).as("tend")))
    val durs = byUser.crossJoin(end).select(
      pmod(col("user_id"), lit(2L)).as("x"),
      when(col("tp").isNotNull,
        floor((col("tp") - col("t0")) / lit(3600000000L)))
        .otherwise(floor((col("tend") - col("t0")) / lit(3600000000L)))
        .cast("long").as("t"),
      when(col("tp").isNotNull, 1L).otherwise(0L).as("ev"))
    // duration-domain risk table split by treatment arm
    val hist = durs.groupBy(col("t")).agg(
      sum(col("ev")).as("d"),
      sum(col("ev") * col("x")).as("d1"),
      sum(col("x")).as("leave1"),
      sum(lit(1L) - col("x")).as("leave0"))
    val tot = broadcast(durs.agg(sum(col("x")).as("m1"),
      sum(lit(1L) - col("x")).as("m0")))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = hist.crossJoin(tot)
      .withColumn("n1", col("m1") -
        coalesce(sum(col("leave1")).over(w), lit(0L)))
      .withColumn("n0", col("m0") -
        coalesce(sum(col("leave0")).over(w), lit(0L)))
      .where(col("d") > 0)
      .select(col("t"), col("d"), col("d1"), col("n1"), col("n0"))
    // duration-domain collect (the kendallTau/q229 bounded contract)
    val rows = risk.orderBy(col("t")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    var beta = 0.0
    for (_ <- 1 to CoxIters) {
      var u = 0.0; var inf = 0.0
      rows.foreach { case (d, d1, n1, n0) =>
        val a = n1.toDouble * math.exp(beta)
        val den = a + n0.toDouble
        u += d1.toDouble - d.toDouble * a / den
        inf += d.toDouble * a * n0.toDouble / (den * den)
      }
      beta = beta + (if (inf > 0) u / inf else 0.0)
    }
    import s.implicits._
    Seq((rows.length.toLong, rows.map(_._1).sum,
      math.floor(1e6 * beta).toLong,
      math.floor(1e6 * math.exp(beta)).toLong))
      .toDF("n_times", "d_total", "beta_e6", "hazard_ratio_e6")
  }

  private def q322(s: SparkSession, dir: String): DataFrame =
    coxBinary(Tables.events(s, dir), "purchase")

  private val q322Sql = {
    val step = (i: Int) =>
      s"""w$i AS MATERIALIZED (
         |  SELECT beta + CASE WHEN inf > 0 THEN u / inf ELSE 0.0 END
         |    AS beta
         |  FROM (
         |    SELECT w${i - 1}.beta,
         |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list(CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE)
         |          * (CAST(n1 AS DOUBLE) * exp(w${i - 1}.beta))
         |          / (CAST(n1 AS DOUBLE) * exp(w${i - 1}.beta)
         |            + CAST(n0 AS DOUBLE)) ORDER BY t)),
         |        (acc, x) -> acc + x) AS u,
         |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list(CAST(d AS DOUBLE)
         |          * (CAST(n1 AS DOUBLE) * exp(w${i - 1}.beta))
         |          * CAST(n0 AS DOUBLE)
         |          / ((CAST(n1 AS DOUBLE) * exp(w${i - 1}.beta)
         |              + CAST(n0 AS DOUBLE))
         |            * (CAST(n1 AS DOUBLE) * exp(w${i - 1}.beta)
         |              + CAST(n0 AS DOUBLE))) ORDER BY t)),
         |        (acc, x) -> acc + x) AS inf
         |    FROM risk CROSS JOIN w${i - 1}
         |    GROUP BY w${i - 1}.beta))""".stripMargin
    s"""WITH u AS (
       |  SELECT user_id, user_id % 2 AS x, min(epoch_us(ts)) AS t0,
       |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
       |      AS tp,
       |    max(epoch_us(ts)) AS tmax_u
       |  FROM events GROUP BY user_id),
       |e AS (SELECT max(tmax_u) AS tend FROM u),
       |durs AS (
       |  SELECT x, CAST(CASE WHEN tp IS NOT NULL
       |      THEN floor((tp - t0) / 3600000000)
       |      ELSE floor((tend - t0) / 3600000000) END AS BIGINT) AS t,
       |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
       |  FROM u CROSS JOIN e),
       |hist AS (
       |  SELECT t, CAST(sum(ev) AS BIGINT) AS d,
       |    CAST(sum(ev * x) AS BIGINT) AS d1,
       |    CAST(sum(x) AS BIGINT) AS leave1,
       |    CAST(sum(1 - x) AS BIGINT) AS leave0
       |  FROM durs GROUP BY t),
       |tot AS (
       |  SELECT CAST(sum(x) AS BIGINT) AS m1,
       |    CAST(sum(1 - x) AS BIGINT) AS m0 FROM durs),
       |risk AS MATERIALIZED (
       |  SELECT t, d, d1,
       |    m1 - COALESCE(sum(leave1) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
       |    m0 - COALESCE(sum(leave0) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0
       |  FROM hist CROSS JOIN tot WHERE d > 0),
       |w0 AS (SELECT CAST(0.0 AS DOUBLE) AS beta),
       |${(1 to CoxIters).map(step).mkString(",\n")}
       |SELECT (SELECT count(*) FROM risk) AS n_times,
       |  (SELECT CAST(sum(d) AS BIGINT) FROM risk) AS d_total,
       |  CAST(floor(1e6 * beta) AS BIGINT) AS beta_e6,
       |  CAST(floor(1e6 * exp(beta)) AS BIGINT) AS hazard_ratio_e6
       |FROM w$CoxIters""".stripMargin
  }

  // ==== q327: Cox proportional hazards — two covariates =======================
  //
  // B259's closed binary form extended along its own declared path: for
  // covariates with a SMALL DISCRETE pattern domain (here x1 ∈ {0,1} ×
  // x2 ∈ {0,1,2} = 6 patterns), the Breslow partial-likelihood moments
  // stay domain-sized — per event time the risk table carries one count
  // per pattern, so S0 = Σ_g n_g·e^{βᵀx_g}, the score vector and the
  // 2×2 information are all scalar expressions over SIX columns, and
  // Newton runs driver-side on the (duration × pattern) table exactly
  // like q322 (K=25 steps, per-time double terms folded in ascending-t
  // order; the 2×2 solve uses the closed adjugate with both deltas read
  // from the PRE-step β). The oracle replays the identical fold: a
  // pivoted MATERIALIZED risk CTE + K unrolled steps, each an inline
  // per-time moment projection and five list_reduce folds ORDER BY t —
  // operand-for-operand the engine's double chain. Zero-term pattern
  // slots differ between engines only by +0.0 terms, which IEEE
  // addition leaves bit-exact.

  /** One row: (n_times, d_total, beta1_e6, beta2_e6, hr1_e6, hr2_e6)
    * for time-to-first-`eventType`; x1/x2 are small-domain per-user
    * covariates evaluated over the by-user frame (x1 ∈ {0,1},
    * x2 ∈ {0,1,2}). */
  def coxTwoCovariates(events: DataFrame, eventType: String,
      x1Of: Column => Column, x2Of: Column => Column): DataFrame = {
    val s = events.sparkSession
    val byUser = events.groupBy(col("user_id")).agg(
      min(unix_micros(col("ts"))).as("t0"),
      min(when(col("event_type") === eventType, unix_micros(col("ts"))))
        .as("tp"),
      max(unix_micros(col("ts"))).as("tmax_u"))
    val end = broadcast(byUser.agg(max(col("tmax_u")).as("tend")))
    val durs = byUser.crossJoin(end).select(
      x1Of(col("user_id")).cast("long").as("x1"),
      x2Of(col("user_id")).cast("long").as("x2"),
      when(col("tp").isNotNull,
        floor((col("tp") - col("t0")) / lit(3600000000L)))
        .otherwise(floor((col("tend") - col("t0")) / lit(3600000000L)))
        .cast("long").as("t"),
      when(col("tp").isNotNull, 1L).otherwise(0L).as("ev"))
      .withColumn("g", col("x1") * 3 + col("x2"))
    // duration-domain risk table pivoted by the 6 covariate patterns
    val dAggs = (0 to 5).map(gi =>
      sum(when(col("g") === gi, col("ev")).otherwise(0L)).as(s"d$gi"))
    val lAggs = (0 to 5).map(gi =>
      sum(when(col("g") === gi, 1L).otherwise(0L)).as(s"l$gi"))
    val hist = durs.groupBy(col("t")).agg((dAggs ++ lAggs).head,
      (dAggs ++ lAggs).tail: _*)
    val tot = broadcast(durs.agg(
      (0 to 5).map(gi => sum(when(col("g") === gi, 1L).otherwise(0L))
        .as(s"m$gi")).head,
      (0 to 5).map(gi => sum(when(col("g") === gi, 1L).otherwise(0L))
        .as(s"m$gi")).tail: _*))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk0 = (0 to 5).foldLeft(hist.crossJoin(tot)) { (d, gi) =>
      d.withColumn(s"n$gi", col(s"m$gi") -
        coalesce(sum(col(s"l$gi")).over(w), lit(0L)))
    }
    val dTot = (0 to 5).map(gi => col(s"d$gi")).reduce(_ + _)
    val risk = risk0.where(dTot > 0)
      .select(col("t") +: (0 to 5).flatMap(gi =>
        Seq(col(s"d$gi"), col(s"n$gi"))): _*)
    // duration×pattern-domain collect (the q322/q229 bounded contract)
    val rows = risk.orderBy(col("t")).collect().map { r =>
      ((0 to 5).map(gi => r.getLong(1 + 2 * gi)).toArray,
        (0 to 5).map(gi => r.getLong(2 + 2 * gi)).toArray)
    }
    val x1g = Array(0.0, 0.0, 0.0, 1.0, 1.0, 1.0)
    val x2g = Array(0.0, 1.0, 2.0, 0.0, 1.0, 2.0)
    var b1 = 0.0; var b2 = 0.0
    for (_ <- 1 to CoxIters) {
      var u1 = 0.0; var u2 = 0.0
      var i11 = 0.0; var i12 = 0.0; var i22 = 0.0
      rows.foreach { case (ds, ns) =>
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
        var q11 = 0.0; var q12 = 0.0; var q22 = 0.0
        var d = 0L; var dx1 = 0L; var dx2 = 0L
        var gi = 0
        while (gi < 6) {
          val e = ns(gi).toDouble * math.exp(b1 * x1g(gi) + b2 * x2g(gi))
          s0 += e; s1 += x1g(gi) * e; s2 += x2g(gi) * e
          q11 += x1g(gi) * x1g(gi) * e
          q12 += x1g(gi) * x2g(gi) * e
          q22 += x2g(gi) * x2g(gi) * e
          d += ds(gi)
          dx1 += ds(gi) * (gi / 3).toLong
          dx2 += ds(gi) * (gi % 3).toLong
          gi += 1
        }
        u1 += dx1.toDouble - d.toDouble * s1 / s0
        u2 += dx2.toDouble - d.toDouble * s2 / s0
        i11 += d.toDouble * (q11 / s0 - (s1 / s0) * (s1 / s0))
        i12 += d.toDouble * (q12 / s0 - (s1 / s0) * (s2 / s0))
        i22 += d.toDouble * (q22 / s0 - (s2 / s0) * (s2 / s0))
      }
      val det = i11 * i22 - i12 * i12
      if (det > 0) {
        val nb1 = b1 + (i22 * u1 - i12 * u2) / det
        val nb2 = b2 + (i11 * u2 - i12 * u1) / det
        b1 = nb1; b2 = nb2
      }
    }
    import s.implicits._
    Seq((rows.length.toLong,
      rows.map(_._1.sum).sum,
      math.floor(1e6 * b1).toLong, math.floor(1e6 * b2).toLong,
      math.floor(1e6 * math.exp(b1)).toLong,
      math.floor(1e6 * math.exp(b2)).toLong))
      .toDF("n_times", "d_total", "beta1_e6", "beta2_e6",
        "hr1_e6", "hr2_e6")
  }

  private def q327(s: SparkSession, dir: String): DataFrame =
    coxTwoCovariates(Tables.events(s, dir), "purchase",
      u => pmod(u, lit(2L)), u => pmod(u, lit(3L)))

  private val q327Sql = {
    // per-pattern moment factors: pattern g = x1*3 + x2
    def eg(b1: String, b2: String, gi: Int) =
      s"exp($b1 * ${gi / 3}.0 + $b2 * ${gi % 3}.0)"
    def mom(b1: String, b2: String, f: Int => String) =
      (0 to 5).map(gi => s"CAST(n$gi AS DOUBLE) * ${f(gi)}")
        .mkString(" + ")
    val step = (i: Int) => {
      val b1 = s"w${i - 1}.b1"; val b2 = s"w${i - 1}.b2"
      def fold(term: String, as: String) =
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |        list($term ORDER BY t)), (acc, x) -> acc + x) AS $as"""
          .stripMargin
      s"""p$i AS (
         |  SELECT t, $b1 AS b1, $b2 AS b2,
         |    ${(0 to 5).map(gi => s"d$gi").mkString(" + ")} AS d,
         |    ${(0 to 5).map(gi => s"d$gi * ${gi / 3}").mkString(" + ")}
         |      AS dx1,
         |    ${(0 to 5).map(gi => s"d$gi * ${gi % 3}").mkString(" + ")}
         |      AS dx2,
         |    ${mom(b1, b2, gi => eg(b1, b2, gi))} AS s0,
         |    ${mom(b1, b2, gi => s"${gi / 3}.0 * ${eg(b1, b2, gi)}")}
         |      AS s1,
         |    ${mom(b1, b2, gi => s"${gi % 3}.0 * ${eg(b1, b2, gi)}")}
         |      AS s2,
         |    ${mom(b1, b2,
              gi => s"${gi / 3}.0 * ${gi / 3}.0 * ${eg(b1, b2, gi)}")}
         |      AS q11,
         |    ${mom(b1, b2,
              gi => s"${gi / 3}.0 * ${gi % 3}.0 * ${eg(b1, b2, gi)}")}
         |      AS q12,
         |    ${mom(b1, b2,
              gi => s"${gi % 3}.0 * ${gi % 3}.0 * ${eg(b1, b2, gi)}")}
         |      AS q22
         |  FROM risk CROSS JOIN w${i - 1}),
         |w$i AS MATERIALIZED (
         |  SELECT CASE WHEN det > 0
         |      THEN b1 + (i22 * u1 - i12 * u2) / det ELSE b1 END AS b1,
         |    CASE WHEN det > 0
         |      THEN b2 + (i11 * u2 - i12 * u1) / det ELSE b2 END AS b2
         |  FROM (
         |    SELECT b1, b2, u1, u2, i11, i12, i22,
         |      i11 * i22 - i12 * i12 AS det
         |    FROM (
         |      SELECT b1, b2,
         |      ${fold("CAST(dx1 AS DOUBLE) - CAST(d AS DOUBLE) * s1 / s0",
                "u1")},
         |      ${fold("CAST(dx2 AS DOUBLE) - CAST(d AS DOUBLE) * s2 / s0",
                "u2")},
         |      ${fold("CAST(d AS DOUBLE) * (q11 / s0 - (s1 / s0) * (s1 / s0))",
                "i11")},
         |      ${fold("CAST(d AS DOUBLE) * (q12 / s0 - (s1 / s0) * (s2 / s0))",
                "i12")},
         |      ${fold("CAST(d AS DOUBLE) * (q22 / s0 - (s2 / s0) * (s2 / s0))",
                "i22")}
         |      FROM p$i GROUP BY b1, b2)))""".stripMargin
    }
    val dCols = (0 to 5).map(gi =>
      s"""CAST(sum(CASE WHEN g = $gi THEN ev ELSE 0 END) AS BIGINT)
         |    AS d$gi""".stripMargin).mkString(",\n  ")
    val lCols = (0 to 5).map(gi =>
      s"""CAST(sum(CASE WHEN g = $gi THEN 1 ELSE 0 END) AS BIGINT)
         |    AS l$gi""".stripMargin).mkString(",\n  ")
    val mCols = (0 to 5).map(gi =>
      s"""CAST(sum(CASE WHEN g = $gi THEN 1 ELSE 0 END) AS BIGINT)
         |    AS m$gi""".stripMargin).mkString(",\n  ")
    val nCols = (0 to 5).map(gi =>
      s"""m$gi - COALESCE(sum(l$gi) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS n$gi""".stripMargin).mkString(",\n  ")
    s"""WITH u AS (
       |  SELECT user_id, min(epoch_us(ts)) AS t0,
       |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
       |      AS tp,
       |    max(epoch_us(ts)) AS tmax_u
       |  FROM events GROUP BY user_id),
       |e AS (SELECT max(tmax_u) AS tend FROM u),
       |durs AS (
       |  SELECT (user_id % 2) * 3 + (user_id % 3) AS g,
       |    CAST(CASE WHEN tp IS NOT NULL
       |      THEN floor((tp - t0) / 3600000000)
       |      ELSE floor((tend - t0) / 3600000000) END AS BIGINT) AS t,
       |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
       |  FROM u CROSS JOIN e),
       |hist AS (
       |  SELECT t,
       |  $dCols,
       |  $lCols
       |  FROM durs GROUP BY t),
       |tot AS (
       |  SELECT
       |  $mCols
       |  FROM durs),
       |risk AS MATERIALIZED (
       |  SELECT t, d0, d1, d2, d3, d4, d5,
       |  $nCols
       |  FROM hist CROSS JOIN tot
       |  WHERE d0 + d1 + d2 + d3 + d4 + d5 > 0),
       |w0 AS (SELECT CAST(0.0 AS DOUBLE) AS b1, CAST(0.0 AS DOUBLE) AS b2),
       |${(1 to CoxIters).map(step).mkString(",\n")}
       |SELECT (SELECT count(*) FROM risk) AS n_times,
       |  (SELECT CAST(sum(d0 + d1 + d2 + d3 + d4 + d5) AS BIGINT)
       |    FROM risk) AS d_total,
       |  CAST(floor(1e6 * b1) AS BIGINT) AS beta1_e6,
       |  CAST(floor(1e6 * b2) AS BIGINT) AS beta2_e6,
       |  CAST(floor(1e6 * exp(b1)) AS BIGINT) AS hr1_e6,
       |  CAST(floor(1e6 * exp(b2)) AS BIGINT) AS hr2_e6
       |FROM w$CoxIters""".stripMargin
  }

  // ==== q328: Harrell's concordance index ======================================
  //
  // The EVALUATION metric for everything the survival shelf fits (q229
  // KM, q322/q327 Cox, q288 hazards): does a risk score actually order
  // who converts sooner? C = P(higher score → earlier event) over
  // usable pairs — pair (i, j) is usable when t_i < t_j and i had the
  // EVENT (tied times excluded, the standard Harrell convention);
  // concordant when p_i > p_j, score ties count ½. On a SMALL-DOMAIN
  // predictor the whole computation collapses to a self-join of the
  // (duration, event, score) histogram — (hours × 2 × |scores|)² rows,
  // never corpus pairs — and every count is an exact integer product;
  // ONE division renders C.

  /** One row: (n_usable, n_concordant, n_score_ties, c_index) for
    * time-to-first-`eventType`; the risk score is the user's capped
    * total event count (activity predicts conversion). */
  def concordanceIndex(events: DataFrame, eventType: String,
      scoreCap: Int): DataFrame = {
    val byUser = events.groupBy(col("user_id")).agg(
      min(unix_micros(col("ts"))).as("t0"),
      min(when(col("event_type") === eventType, unix_micros(col("ts"))))
        .as("tp"),
      max(unix_micros(col("ts"))).as("tmax_u"),
      count(lit(1)).as("n_ev"))
    val end = broadcast(byUser.agg(max(col("tmax_u")).as("tend")))
    val durs = byUser.crossJoin(end).select(
      least(expr("n_ev div 25"), lit(scoreCap.toLong)).as("p"),
      when(col("tp").isNotNull,
        floor((col("tp") - col("t0")) / lit(3600000000L)))
        .otherwise(floor((col("tend") - col("t0")) / lit(3600000000L)))
        .cast("long").as("t"),
      when(col("tp").isNotNull, 1L).otherwise(0L).as("ev"))
    val hist = durs.groupBy(col("t"), col("ev"), col("p"))
      .agg(count(lit(1)).as("cnt")).localCheckpoint()
    val a = hist.toDF("ta", "eva", "pa", "ca").where(col("eva") === 1L)
    val b = hist.toDF("tb", "evb", "pb", "cb")
    val pairs = a.join(b, col("ta") < col("tb"))
      .agg(sum(col("ca") * col("cb")).as("n_usable"),
        sum(when(col("pa") > col("pb"), col("ca") * col("cb"))
          .otherwise(0L)).as("n_concordant"),
        sum(when(col("pa") === col("pb"), col("ca") * col("cb"))
          .otherwise(0L)).as("n_score_ties"))
    pairs.select(col("n_usable"), col("n_concordant"),
      col("n_score_ties"),
      QueryDef.dec4((lit(2L) * col("n_concordant") +
        col("n_score_ties")).cast("double") /
        (lit(2L) * col("n_usable")).cast("double")).as("c_index"))
  }

  private def q328(s: SparkSession, dir: String): DataFrame =
    concordanceIndex(Tables.events(s, dir), "purchase", scoreCap = 9)

  private val q328Sql =
    """WITH u AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t0,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
      |      AS tp,
      |    max(epoch_us(ts)) AS tmax_u, count(*) AS n_ev
      |  FROM events GROUP BY user_id),
      |e AS (SELECT max(tmax_u) AS tend FROM u),
      |durs AS (
      |  SELECT least(n_ev // 25, 9) AS p,
      |    CAST(CASE WHEN tp IS NOT NULL
      |      THEN floor((tp - t0) / 3600000000)
      |      ELSE floor((tend - t0) / 3600000000) END AS BIGINT) AS t,
      |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM u CROSS JOIN e),
      |hist AS (SELECT t, ev, p, count(*) AS cnt FROM durs GROUP BY 1, 2, 3),
      |pairs AS (
      |  SELECT CAST(sum(a.cnt * b.cnt) AS BIGINT) AS n_usable,
      |    CAST(sum(CASE WHEN a.p > b.p THEN a.cnt * b.cnt ELSE 0 END)
      |      AS BIGINT) AS n_concordant,
      |    CAST(sum(CASE WHEN a.p = b.p THEN a.cnt * b.cnt ELSE 0 END)
      |      AS BIGINT) AS n_score_ties
      |  FROM hist a JOIN hist b ON a.t < b.t AND a.ev = 1)
      |SELECT n_usable, n_concordant, n_score_ties,
      |  CAST(CAST(CAST(2 * n_concordant + n_score_ties AS DOUBLE)
      |    / CAST(2 * n_usable AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR)
      |    AS c_index
      |FROM pairs""".stripMargin

  // ==== q331: Qini uplift curve ================================================
  //
  // The causal-shelf EVALUATION metric (q254 CUPED, q276 IPW, q261 ATT
  // estimate effects; Qini ranks a TARGETING score by them): descending
  // down the score, the cumulative incremental conversions
  // qini(s) = conv_T(s) − conv_C(s)·n_T(s)/n_C(s) — a random score
  // hugs 0, a good one bows upward. Treatment = user parity (the q322
  // randomization stand-in), score = capped activity. The score domain
  // is small and declared, so the curve is a window over ≤|scores|
  // rows; per-score counts are one corpus groupBy. qini ⌊10⁶·⌋-floors
  // the ONE double expression per score row.

  /** Per score s (descending): cumulative (n_t, n_c, conv_t, conv_c,
    * qini_micro) for users with score ≥ s. */
  def qiniCurve(events: DataFrame, eventType: String, scoreCap: Int)
      : DataFrame = {
    val byUser = events.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_ev"),
      max(when(col("event_type") === eventType, 1L).otherwise(0L))
        .as("y"))
    val scored = byUser.select(
      least(expr("n_ev div 25"), lit(scoreCap.toLong)).as("s"),
      pmod(col("user_id"), lit(2L)).as("w"), col("y"))
    val perScore = scored.groupBy(col("s")).agg(
      sum(col("w")).as("t"), sum(lit(1L) - col("w")).as("c"),
      sum(col("w") * col("y")).as("ty"),
      sum((lit(1L) - col("w")) * col("y")).as("cy"))
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    def dd(c: Column) = c.cast("double")
    perScore
      .withColumn("n_t", sum(col("t")).over(w))
      .withColumn("n_c", sum(col("c")).over(w))
      .withColumn("conv_t", sum(col("ty")).over(w))
      .withColumn("conv_c", sum(col("cy")).over(w))
      .select(col("s"), col("n_t"), col("n_c"), col("conv_t"),
        col("conv_c"),
        when(col("n_c") > 0,
          floor(lit(1e6) * (dd(col("conv_t")) -
            dd(col("conv_c")) * dd(col("n_t")) / dd(col("n_c"))))
            .cast("long")).as("qini_micro"))
      .orderBy(col("s").desc)
  }

  private def q331(s: SparkSession, dir: String): DataFrame =
    qiniCurve(Tables.events(s, dir), "purchase", scoreCap = 9)

  private val q331Sql =
    """WITH u AS (
      |  SELECT user_id, count(*) AS n_ev,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |  FROM events GROUP BY user_id),
      |scored AS (
      |  SELECT least(n_ev // 25, 9) AS s, user_id % 2 AS w, y FROM u),
      |per AS (
      |  SELECT s, CAST(sum(w) AS BIGINT) AS t,
      |    CAST(sum(1 - w) AS BIGINT) AS c,
      |    CAST(sum(w * y) AS BIGINT) AS ty,
      |    CAST(sum((1 - w) * y) AS BIGINT) AS cy
      |  FROM scored GROUP BY s),
      |cum AS (
      |  SELECT s,
      |    CAST(sum(t) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS n_t,
      |    CAST(sum(c) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS n_c,
      |    CAST(sum(ty) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS conv_t,
      |    CAST(sum(cy) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS conv_c
      |  FROM per)
      |SELECT s, n_t, n_c, conv_t, conv_c,
      |  CASE WHEN n_c > 0 THEN CAST(floor(1e6 * (CAST(conv_t AS DOUBLE)
      |    - CAST(conv_c AS DOUBLE) * CAST(n_t AS DOUBLE)
      |      / CAST(n_c AS DOUBLE))) AS BIGINT) END AS qini_micro
      |FROM cum ORDER BY s DESC""".stripMargin

  // ==== q323: Aalen–Johansen competing-risks cumulative incidence ============
  //
  // What "1 − KM per cause" gets WRONG (it over-counts when another
  // event can preempt yours): with competing first events (purchase vs
  // error here), CIF_k(τ) = Σ_{t≤τ} S(t⁻)·d_k(t)/n(t), where S(t⁻) is
  // the all-cause KM just before t. Exactness: S(t⁻) reuses the q229
  // floored-log machinery via an EXCLUSIVE prefix sum; each CIF
  // increment is ⌊10⁶·S(t⁻)·d_k/n⌋-floored once, so both causes'
  // incidences are exact integer sums on the duration domain — and
  // their total can never exceed 10⁶ (the law 1 − KM breaks).

  /** One row: (n_users, n_times, cif_a_e6, cif_b_e6) at the horizon —
    * competing first events of `causeA` vs `causeB` (A wins ties). */
  def aalenJohansen(events: DataFrame, causeA: String, causeB: String)
      : DataFrame = {
    val byUser = events.groupBy(col("user_id")).agg(
      min(unix_micros(col("ts"))).as("t0"),
      min(when(col("event_type") === causeA, unix_micros(col("ts"))))
        .as("ta"),
      min(when(col("event_type") === causeB, unix_micros(col("ts"))))
        .as("tb"),
      max(unix_micros(col("ts"))).as("tmax_u"))
    val end = broadcast(byUser.agg(max(col("tmax_u")).as("tend")))
    val evTime = when(col("ta").isNotNull &&
        (col("tb").isNull || col("ta") <= col("tb")), col("ta"))
      .when(col("tb").isNotNull, col("tb"))
    val durs = byUser.crossJoin(end).select(
      when(evTime.isNotNull, floor((evTime - col("t0")) / lit(3600000000L)))
        .otherwise(floor((col("tend") - col("t0")) / lit(3600000000L)))
        .cast("long").as("t"),
      when(col("ta").isNotNull &&
        (col("tb").isNull || col("ta") <= col("tb")), lit(1L))
        .when(col("tb").isNotNull, lit(2L)).otherwise(lit(0L)).as("cause"))
    val hist = durs.groupBy(col("t")).agg(
      sum(when(col("cause") === 1L, 1L).otherwise(0L)).as("da"),
      sum(when(col("cause") === 2L, 1L).otherwise(0L)).as("db"),
      count(lit(1)).as("leave"))
    val total = broadcast(durs.agg(count(lit(1)).as("n_total")))
    val wx = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    def dd(c: Column) = c.cast("double")
    val risk = hist.crossJoin(total)
      .withColumn("n_risk", col("n_total") -
        coalesce(sum(col("leave")).over(wx), lit(0L)))
      .where(col("da") + col("db") > 0)
      .withColumn("step", when(col("da") + col("db") < col("n_risk"),
        floor(lit(1e6) * log(lit(1.0) -
          dd(col("da") + col("db")) / dd(col("n_risk")))).cast("long")))
      // S(t⁻): EXCLUSIVE prefix of the floored log steps
      .withColumn("lnS_pre", coalesce(sum(col("step")).over(wx), lit(0L)))
      .withColumn("s_pre", exp(dd(col("lnS_pre")) / lit(1e6)))
      .withColumn("inc_a", floor(lit(1e6) * col("s_pre") *
        dd(col("da")) / dd(col("n_risk"))).cast("long"))
      .withColumn("inc_b", floor(lit(1e6) * col("s_pre") *
        dd(col("db")) / dd(col("n_risk"))).cast("long"))
    risk.crossJoin(total.select(col("n_total").as("n_users")))
      .groupBy(col("n_users"))
      .agg(count(lit(1)).as("n_times"), sum(col("inc_a")).as("cif_a_e6"),
        sum(col("inc_b")).as("cif_b_e6"))
      .select(col("n_users"), col("n_times"), col("cif_a_e6"),
        col("cif_b_e6"))
  }

  private def q323(s: SparkSession, dir: String): DataFrame =
    aalenJohansen(Tables.events(s, dir), "purchase", "error")

  private val q323Sql =
    """WITH u AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t0,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
      |      AS ta,
      |    min(CASE WHEN event_type = 'error' THEN epoch_us(ts) END) AS tb,
      |    max(epoch_us(ts)) AS tmax_u
      |  FROM events GROUP BY user_id),
      |e AS (SELECT max(tmax_u) AS tend FROM u),
      |durs AS (
      |  SELECT
      |    CAST(CASE
      |      WHEN ta IS NOT NULL AND (tb IS NULL OR ta <= tb)
      |        THEN floor((ta - t0) / 3600000000)
      |      WHEN tb IS NOT NULL THEN floor((tb - t0) / 3600000000)
      |      ELSE floor((tend - t0) / 3600000000) END AS BIGINT) AS t,
      |    CASE WHEN ta IS NOT NULL AND (tb IS NULL OR ta <= tb) THEN 1
      |      WHEN tb IS NOT NULL THEN 2 ELSE 0 END AS cause
      |  FROM u CROSS JOIN e),
      |hist AS (
      |  SELECT t,
      |    CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS da,
      |    CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS db,
      |    count(*) AS leave
      |  FROM durs GROUP BY t),
      |tot AS (SELECT count(*) AS n_total FROM durs),
      |risk AS (
      |  SELECT t, da, db, n_total - COALESCE(sum(leave) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS n_risk
      |  FROM hist CROSS JOIN tot WHERE da + db > 0),
      |km AS (
      |  SELECT t, da, db, n_risk,
      |    COALESCE(sum(CASE WHEN da + db < n_risk
      |      THEN CAST(floor(1e6 * ln(1.0 - CAST(da + db AS DOUBLE)
      |        / CAST(n_risk AS DOUBLE))) AS BIGINT) END)
      |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
      |        AND 1 PRECEDING), 0) AS lns_pre
      |  FROM risk),
      |inc AS (
      |  SELECT
      |    CAST(floor(1e6 * exp(CAST(lns_pre AS DOUBLE) / 1e6)
      |      * CAST(da AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS BIGINT)
      |      AS inc_a,
      |    CAST(floor(1e6 * exp(CAST(lns_pre AS DOUBLE) / 1e6)
      |      * CAST(db AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS BIGINT)
      |      AS inc_b
      |  FROM km)
      |SELECT tot.n_total AS n_users, count(*) AS n_times,
      |  CAST(sum(inc_a) AS BIGINT) AS cif_a_e6,
      |  CAST(sum(inc_b) AS BIGINT) AS cif_b_e6
      |FROM inc CROSS JOIN tot GROUP BY 1""".stripMargin

  // ==== q338: Mantel–Haenszel pooled odds ratio ================================
  //
  // The STRATIFIED completion of q324's single 2×2: when a confounder
  // (here activity band) correlates with both exposure and outcome, the
  // crude OR is Simpson-vulnerable; MH pools the per-stratum tables as
  // OR_MH = Σᵢ aᵢdᵢ/nᵢ ÷ Σᵢ bᵢcᵢ/nᵢ — each stratum contributing at its
  // own size, the classic epidemiological adjustment. Determinism: all
  // eight per-stratum cells are exact integers from ONE user-domain
  // groupBy; each ratio term is ONE double expression ⌊10⁶·⌋-floored
  // (the log-rank micro rule) so both sums are exact integers, and the
  // crude OR is emitted beside it so the confounding gap is visible.

  /** One row: (n_strata, n_users, num_micro, den_micro, or_mh, or_crude)
    * for exposure = user parity, outcome = converted to `eventType`,
    * strata = capped activity band (n_ev div `band`, ≤ 3). */
  def mantelHaenszel(events: DataFrame, eventType: String,
      band: Long): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val byUser = events.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_ev"),
      max(when(col("event_type") === eventType, 1L).otherwise(0L))
        .as("y"))
    val cells = byUser.select(
      least(expr(s"n_ev div $band"), lit(3L)).as("stratum"),
      pmod(col("user_id"), lit(2L)).as("e"), col("y"))
      .groupBy(col("stratum")).agg(
        sum(when(col("e") === 1 && col("y") === 1, 1L).otherwise(0L))
          .as("a"),
        sum(when(col("e") === 1 && col("y") === 0, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("e") === 0 && col("y") === 1, 1L).otherwise(0L))
          .as("c"),
        sum(when(col("e") === 0 && col("y") === 0, 1L).otherwise(0L))
          .as("d"))
    cells
      .select(col("a"), col("b"), col("c"), col("d"),
        (col("a") + col("b") + col("c") + col("d")).as("n"),
        floor(lit(1e6) * dd(col("a") * col("d")) /
          dd(col("a") + col("b") + col("c") + col("d"))).cast("long")
          .as("t_num"),
        floor(lit(1e6) * dd(col("b") * col("c")) /
          dd(col("a") + col("b") + col("c") + col("d"))).cast("long")
          .as("t_den"))
      .agg(count(lit(1)).as("n_strata"), sum(col("n")).as("n_users"),
        sum(col("t_num")).as("num_micro"),
        sum(col("t_den")).as("den_micro"),
        sum(col("a")).as("ta"), sum(col("b")).as("tb"),
        sum(col("c")).as("tc"), sum(col("d")).as("td"))
      .select(col("n_strata"), col("n_users"), col("num_micro"),
        col("den_micro"),
        QueryDef.dec4(when(col("den_micro") > 0,
          col("num_micro").cast("double") /
            col("den_micro").cast("double"))).as("or_mh"),
        QueryDef.dec4(when(col("tb") * col("tc") > 0,
          dd(col("ta") * col("td")) /
            dd(col("tb") * col("tc")))).as("or_crude"))
  }

  private def q338(s: SparkSession, dir: String): DataFrame =
    mantelHaenszel(Tables.events(s, dir), "purchase", band = 50L)

  private val q338Sql =
    """WITH u AS (
      |  SELECT user_id, count(*) AS n_ev,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |  FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT least(n_ev // 50, 3) AS stratum,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 AND y = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 AND y = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 AND y = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 AND y = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS d
      |  FROM u GROUP BY 1),
      |t AS (
      |  SELECT count(*) AS n_strata,
      |    CAST(sum(a + b + c + d) AS BIGINT) AS n_users,
      |    CAST(sum(CAST(floor(1e6 * CAST(a * d AS DOUBLE)
      |      / CAST(a + b + c + d AS DOUBLE)) AS BIGINT)) AS BIGINT)
      |      AS num_micro,
      |    CAST(sum(CAST(floor(1e6 * CAST(b * c AS DOUBLE)
      |      / CAST(a + b + c + d AS DOUBLE)) AS BIGINT)) AS BIGINT)
      |      AS den_micro,
      |    CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
      |    CAST(sum(c) AS BIGINT) AS tc, CAST(sum(d) AS BIGINT) AS td
      |  FROM cells)
      |SELECT n_strata, n_users, num_micro, den_micro,
      |  CAST(CAST(CASE WHEN den_micro > 0
      |    THEN CAST(num_micro AS DOUBLE) / CAST(den_micro AS DOUBLE) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS or_mh,
      |  CAST(CAST(CASE WHEN tb * tc > 0
      |    THEN CAST(ta * td AS DOUBLE) / CAST(tb * tc AS DOUBLE) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS or_crude
      |FROM t""".stripMargin

  // ==== q324: odds ratio with Haldane–Anscombe correction + Woolf CI =========
  //
  // The 2×2 effect-size readout q303's z only tests: OR with the +½
  // cell correction (finite even with an empty cell) and the Woolf
  // log-normal interval. Exactness: the corrected OR is the exact
  // integer ratio (2a+1)(2d+1)/((2b+1)(2c+1)) — ln of identical doubles
  // in both engines (the q305/q314 ln-of-integer-ratio rule); the SE
  // chain uses doubled-cell reciprocals 2/(2a+1)+…, and the 1.96
  // constant is a shared literal. All outputs ⌊10⁶·⌋-floored.

  /** One row: (a, b, c, d, log_or_e6, or_e6, ci_lo_e6, ci_hi_e6) from
    * `cells` rows (arm, converted) — a/b = arm-1 conv/not, c/d = arm-0. */
  def oddsRatio(cells: DataFrame): DataFrame = {
    val m = cells.agg(
      sum(when(col("arm") === 1 && col("converted"), 1L).otherwise(0L))
        .as("a"),
      sum(when(col("arm") === 1 && !col("converted"), 1L).otherwise(0L))
        .as("b"),
      sum(when(col("arm") === 0 && col("converted"), 1L).otherwise(0L))
        .as("c"),
      sum(when(col("arm") === 0 && !col("converted"), 1L).otherwise(0L))
        .as("d"))
    def d0(c: Column) = c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    def h(c: Column) = lit(2L) * c + 1L // doubled Haldane cell 2x+1
    val lnOr = log(dd(d0(h(col("a"))) * h(col("d")))) -
      log(dd(d0(h(col("b"))) * h(col("c"))))
    val se = sqrt(lit(2.0) / dd(h(col("a"))) + lit(2.0) / dd(h(col("b"))) +
      lit(2.0) / dd(h(col("c"))) + lit(2.0) / dd(h(col("d"))))
    m.select(col("a"), col("b"), col("c"), col("d"),
      floor(lit(1e6) * lnOr).cast("long").as("log_or_e6"),
      floor(lit(1e6) * exp(lnOr)).cast("long").as("or_e6"),
      floor(lit(1e6) * exp(lnOr - lit(1.959964) * se)).cast("long")
        .as("ci_lo_e6"),
      floor(lit(1e6) * exp(lnOr + lit(1.959964) * se)).cast("long")
        .as("ci_hi_e6"))
  }

  private def q324(s: SparkSession, dir: String): DataFrame = {
    val byUser = Tables.events(s, dir).groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(pmod(col("user_id"), lit(2)).cast("int").as("arm"),
        (col("conv") === 1L).as("converted"))
    oddsRatio(byUser)
  }

  private val q324Sql =
    """WITH u AS (
      |  SELECT CAST(user_id % 2 AS INT) AS arm,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |m AS (
      |  SELECT
      |    CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS d
      |  FROM u),
      |t AS (
      |  SELECT a, b, c, d,
      |    ln(CAST((2 * CAST(a AS HUGEINT) + 1) * (2 * CAST(d AS HUGEINT)
      |      + 1) AS DOUBLE))
      |    - ln(CAST((2 * CAST(b AS HUGEINT) + 1) * (2 * CAST(c AS HUGEINT)
      |      + 1) AS DOUBLE)) AS lnor,
      |    sqrt(2.0 / CAST(2 * a + 1 AS DOUBLE)
      |      + 2.0 / CAST(2 * b + 1 AS DOUBLE)
      |      + 2.0 / CAST(2 * c + 1 AS DOUBLE)
      |      + 2.0 / CAST(2 * d + 1 AS DOUBLE)) AS se
      |  FROM m)
      |SELECT a, b, c, d,
      |  CAST(floor(1e6 * lnor) AS BIGINT) AS log_or_e6,
      |  CAST(floor(1e6 * exp(lnor)) AS BIGINT) AS or_e6,
      |  CAST(floor(1e6 * exp(lnor - 1.959964 * se)) AS BIGINT)
      |    AS ci_lo_e6,
      |  CAST(floor(1e6 * exp(lnor + 1.959964 * se)) AS BIGINT)
      |    AS ci_hi_e6
      |FROM t""".stripMargin

  // ==== q344: Holt–Winters additive seasonal smoothing ======================
  //
  // The SEASONAL completion of the smoothing shelf: q169's EWMA tracks a
  // level, q210's Holt adds a trend — hourly operational series also
  // carry a daily cycle, and a trend-only smoother reads every morning
  // ramp as a trend change. Holt–Winters (additive, period m = 24,
  // α = β = γ = 1/2 integerized) keeps 24 seasonal offsets beside level
  // and trend:
  //   lₜ = ⌊(lₜ₋₁ + bₜ₋₁ + (xₜ − s⁻))/2⌋   s⁻ = seasonal at phase hr%24
  //   bₜ = ⌊(bₜ₋₁ + (lₜ − lₜ₋₁))/2⌋
  //   sₜ = ⌊(s⁻ + (xₜ − lₜ))/2⌋             (updates its phase slot only)
  // and forecasts lₜ + bₜ + s(next phase). Seed (declared): l₀ =
  // ⌊mean of the first 24 points⌋, b₀ = 0, seasonal slot p = last
  // first-cycle observation at phase p minus l₀ (0 if unseen). All
  // integer: halving is the sign-free floor (x − pmod(x,2)) div 2 (the
  // q210 negative-division rule — trend and seasonals are signed).
  // Scale shape: the q169/q210 per-series hours-domain fold — ONE
  // groupBy to hourly counts, the recursion runs inside a row over the
  // bounded (hours × 1) array, seasonal state an in-row 24-array; the
  // oracle replays it as a recursive CTE carrying the same 24-list.

  /** (event_type, hr, cnt, level, trend, seasonal, forecast) for rows
    * after the 24-point seed cycle; series shorter than 25 points emit
    * nothing. */
  def holtWintersHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hr"))
    val r = hourly.withColumn("rn", row_number().over(w))
      .withColumn("ph", expr("hr % 24"))
    val head = r.filter(col("rn") <= 24)
    val seed = head.groupBy(col("event_type"))
      .agg(expr("(sum(cnt) - pmod(sum(cnt), 24)) div 24").as("l0"))
    val sfirst = head.groupBy(col("event_type"), col("ph"))
      .agg(max_by(col("cnt"), col("rn")).as("c0"))
    val svec = sfirst.groupBy(col("event_type"))
      .agg(map_from_entries(collect_list(struct(col("ph"), col("c0"))))
        .as("m"))
      .join(seed, Seq("event_type"))
      .select(col("event_type"), col("l0"),
        expr("transform(sequence(0L, 23L), " +
          "p -> coalesce(element_at(m, p), l0) - l0)").as("ss0"))
    val tail = r.filter(col("rn") > 24)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("hr"), col("cnt"))))
        .as("xs"))
    def fd2(x: String) = s"(($x) - pmod($x, 2)) div 2"
    val sHat = "element_at(acc.ss, cast(e.hr % 24 as int) + 1)"
    val lnew = fd2(s"acc.l + acc.b + (e.cnt - $sHat)")
    val bnew = fd2(s"acc.b + ($lnew) - acc.l")
    val snew = fd2(s"$sHat + (e.cnt - ($lnew))")
    val fcast = s"($lnew) + ($bnew) + " +
      "element_at(acc.ss, cast((e.hr + 1) % 24 as int) + 1)"
    val outT = "array<struct<hr: bigint, cnt: bigint, l: bigint, " +
      "b: bigint, s: bigint, f: bigint>>"
    val fold =
      s"""aggregate(xs,
         |  cast(named_struct('l', l0, 'b', 0L, 'ss', ss0,
         |    'out', cast(array() as $outT))
         |    as struct<l: bigint, b: bigint, ss: array<bigint>,
         |      out: $outT>),
         |  (acc, e) -> named_struct(
         |    'l', $lnew,
         |    'b', $bnew,
         |    'ss', transform(acc.ss,
         |      (v, i) -> if(i = cast(e.hr % 24 as int), $snew, v)),
         |    'out', acc.out || array(named_struct('hr', e.hr,
         |      'cnt', e.cnt, 'l', $lnew, 'b', $bnew, 's', $snew,
         |      'f', $fcast))),
         |  acc -> acc.out)""".stripMargin
    svec.join(tail, Seq("event_type"))
      .select(col("event_type"), explode(expr(fold)).as("o"))
      .select(col("event_type"), col("o.hr").as("hr"),
        col("o.cnt").as("cnt"), col("o.l").as("level"),
        col("o.b").as("trend"), col("o.s").as("seasonal"),
        col("o.f").as("forecast"))
  }

  private def q344(s: SparkSession, dir: String): DataFrame =
    holtWintersHourly(Tables.events(s, dir))
      .orderBy(col("event_type"), col("hr"))

  private val q344Sql = {
    def fd2(x: String) = s"($x - ((($x) % 2 + 2) % 2)) // 2"
    val sHat = "rec.ss[r.ph + 1]"
    val lnew = fd2(s"rec.l + rec.b + (r.cnt - $sHat)")
    val bnew = fd2(s"rec.b + ($lnew) - rec.l")
    val snew = fd2(s"$sHat + (r.cnt - ($lnew))")
    s"""WITH RECURSIVE h AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
       |    count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY event_type
       |      ORDER BY hr) AS rn,
       |    CAST(hr % 24 AS BIGINT) AS ph
       |  FROM h),
       |seed AS (
       |  SELECT event_type,
       |    (sum(cnt) - ((sum(cnt) % 24 + 24) % 24)) // 24 AS l0
       |  FROM r WHERE rn <= 24 GROUP BY 1),
       |sfirst AS (
       |  SELECT event_type, ph, arg_max(cnt, rn) AS c0
       |  FROM r WHERE rn <= 24 GROUP BY 1, 2),
       |svec AS (
       |  SELECT s.event_type, s.l0,
       |    list(coalesce(sf.c0 - s.l0, 0) ORDER BY p.p) AS ss0
       |  FROM seed s
       |  CROSS JOIN (SELECT unnest(range(0, 24)) AS p) p
       |  LEFT JOIN sfirst sf ON sf.event_type = s.event_type
       |    AND sf.ph = p.p
       |  GROUP BY 1, 2),
       |rec(event_type, rn, hr, cnt, l, b, ph, ss) AS (
       |  SELECT v.event_type, CAST(24 AS BIGINT), CAST(NULL AS BIGINT),
       |    CAST(NULL AS BIGINT), v.l0, CAST(0 AS BIGINT),
       |    CAST(NULL AS BIGINT), v.ss0
       |  FROM svec v
       |  UNION ALL
       |  SELECT r.event_type, r.rn, r.hr, r.cnt,
       |    $lnew, $bnew, r.ph,
       |    list_transform(range(0, 24), p -> CASE WHEN p = r.ph
       |      THEN $snew ELSE rec.ss[p + 1] END)
       |  FROM rec JOIN r ON r.event_type = rec.event_type
       |    AND r.rn = rec.rn + 1)
       |SELECT event_type, hr, CAST(cnt AS BIGINT) AS cnt,
       |  CAST(l AS BIGINT) AS level, CAST(b AS BIGINT) AS trend,
       |  CAST(ss[ph + 1] AS BIGINT) AS seasonal,
       |  CAST(l + b + ss[((hr + 1) % 24) + 1] AS BIGINT) AS forecast
       |FROM rec WHERE rn > 24 ORDER BY event_type, hr""".stripMargin
  }

  // ==== q345: periodogram — DFT power at candidate daily/weekly periods =====
  //
  // IS there a cycle, and at what period? — the question q344 assumes
  // answered (it hard-codes m = 24). Discrete-Fourier power of the
  // hourly count series at candidate periods p ∈ {6, 8, 12, 24}:
  //   S_c(p) = Σₜ yₜ·cos(2πt/p),  S_s(p) likewise,  yₜ = N·xₜ − T
  // (scaled-centered so the DC mean cancels exactly in integers).
  // Exactness: cos/sin are evaluated ONCE at plan-build time on the
  // driver — ⌊10⁶·cos(2πr/p)⌋ per residue r — and embedded as literal
  // weight tables in BOTH engines' plans, so no trig function ever runs
  // in either engine; every sum is an exact integer/decimal (cnt and
  // hour-count aggregated per residue first — a ≤24-row domain per
  // period). pw_rel = (S_c² + S_s²)/(N²·D·10¹²) with D = N·Σx² − T²
  // renders the variance share at that period (pure sinusoid → 0.5,
  // white noise → ~1/n) through one spelled double chain off DECIMAL
  // moments. Scale shape: one hourly groupBy, residue-domain cross
  // join with the 50-row weight table, scalar render per (series, p).

  /** Candidate periods for q345 — small divisors of the daily cycle. */
  private val PeriodogramPeriods = Seq(6, 8, 12, 24)

  /** ⌊10⁶·cos/sin(2πr/p)⌋ literal weight rows (p, r, wc, ws) — computed
    * on the driver, embedded in both plans. */
  private val PeriodogramWeights: Seq[(Int, Int, Long, Long)] =
    for (p <- PeriodogramPeriods; r <- 0 until p) yield {
      val a = 2.0 * math.Pi * r / p
      (p, r, math.floor(1e6 * math.cos(a)).toLong,
        math.floor(1e6 * math.sin(a)).toLong)
    }

  /** (event_type, p, n_hours, sc, ss_, pw_rel): integer DFT sums and the
    * relative power at each candidate period. */
  def periodogramHourly(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val hourly = events
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    val wtab = spark.range(1)
      .select(explode(typedLit(PeriodogramWeights)).as("w"))
      .select(col("w._1").as("p"), col("w._2").as("r"),
        col("w._3").as("wc"), col("w._4").as("ws"))
    def d0(c: Column) = c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    // per (series, p, residue): histogram over the ≤24-residue domain
    val res = hourly
      .crossJoin(broadcast(wtab.select(col("p")).distinct()))
      .groupBy(col("event_type"), col("p"),
        pmod(col("hr"), col("p").cast("long")).as("r"))
      .agg(sum(col("cnt")).as("cr"), count(lit(1)).as("nr"))
    val moments = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("t"),
        sum(d0(col("cnt")) * col("cnt")).as("sxx"))
    res.join(broadcast(wtab), Seq("p", "r"))
      .groupBy(col("event_type"), col("p"))
      .agg(sum(col("cr") * col("wc")).as("ac"),
        sum(col("nr") * col("wc")).as("bc"),
        sum(col("cr") * col("ws")).as("as_"),
        sum(col("nr") * col("ws")).as("bs"))
      .join(broadcast(moments), Seq("event_type"))
      .select(col("event_type"), col("p"), col("n").as("n_hours"),
        (col("n") * col("ac") - col("t") * col("bc")).as("sc"),
        (col("n") * col("as_") - col("t") * col("bs")).as("ss_"),
        (d0(col("sxx")) * col("n") - d0(col("t")) * col("t")).as("d"))
      .select(col("event_type"), col("p"), col("n_hours"), col("sc"),
        col("ss_"),
        QueryDef.dec4(
          dd(d0(col("sc")) * col("sc") + d0(col("ss_")) * col("ss_")) /
            (dd(col("d") * col("n_hours") * col("n_hours")) * lit(1e12)))
          .as("pw_rel"))
  }

  private def q345(s: SparkSession, dir: String): DataFrame =
    periodogramHourly(Tables.events(s, dir))
      .orderBy(col("event_type"), col("p"))

  private val q345Sql = {
    val vals = PeriodogramWeights
      .map { case (p, r, wc, ws) => s"($p, $r, $wc, $ws)" }
      .mkString(", ")
    s"""WITH h AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2),
       |wt(p, r, wc, ws) AS (VALUES $vals),
       |res AS (
       |  SELECT event_type, p, ((hr % p) + p) % p AS r,
       |    CAST(sum(cnt) AS BIGINT) AS cr,
       |    CAST(count(*) AS BIGINT) AS nr
       |  FROM h CROSS JOIN (SELECT DISTINCT p FROM wt) pp
       |  GROUP BY 1, 2, 3),
       |mom AS (
       |  SELECT event_type, count(*) AS n, CAST(sum(cnt) AS BIGINT) AS t,
       |    CAST(sum(CAST(cnt AS DECIMAL(38,0)) * cnt) AS DECIMAL(38,0))
       |      AS sxx
       |  FROM h GROUP BY 1),
       |agg AS (
       |  SELECT res.event_type, res.p,
       |    CAST(sum(cr * wc) AS BIGINT) AS ac,
       |    CAST(sum(nr * wc) AS BIGINT) AS bc,
       |    CAST(sum(cr * ws) AS BIGINT) AS as_,
       |    CAST(sum(nr * ws) AS BIGINT) AS bs
       |  FROM res JOIN wt ON res.p = wt.p AND res.r = wt.r
       |  GROUP BY 1, 2),
       |fin AS (
       |  SELECT agg.event_type, agg.p, mom.n AS n_hours,
       |    CAST(mom.n * ac - mom.t * bc AS BIGINT) AS sc,
       |    CAST(mom.n * as_ - mom.t * bs AS BIGINT) AS ss_,
       |    CAST(sxx * mom.n - CAST(mom.t AS DECIMAL(38,0)) * mom.t
       |      AS DECIMAL(38,0)) AS d
       |  FROM agg JOIN mom ON agg.event_type = mom.event_type)
       |SELECT event_type, p, n_hours, sc, ss_,
       |  CAST(CAST(
       |    CAST(CAST(sc AS DECIMAL(38,0)) * sc
       |      + CAST(ss_ AS DECIMAL(38,0)) * ss_ AS DOUBLE) /
       |    (CAST(d * n_hours * n_hours AS DOUBLE) * 1e12)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS pw_rel
       |FROM fin ORDER BY event_type, p""".stripMargin
  }

  // ==== q349: Poisson overdispersion (index-of-dispersion) test =============
  //
  // The modeling gate for count series: every Poisson-assuming model
  // downstream (rate CIs, the q321 EB shrinkage priors, exponential
  // inter-arrivals q308) is wrong when hourly counts are overdispersed
  // (var ≫ mean — bursty traffic, mixed populations). The classic
  // dispersion test: χ² = (n−1)·s²/x̄ = (n·Σx² − S²)/S against df n−1,
  // normal-approximated z = (χ² − (n−1))/√(2(n−1)). Exactness: moments
  // are exact DECIMALs, χ² and z are each ONE spelled double chain.
  // Scale shape: one map-side-combined groupBy to per-series moments.

  /** Per event_type over hourly counts: (event_type, n, s, chi2, z). */
  def overdispersion(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    def d0(c: Column) = c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(d0(col("cnt")) * col("cnt")).as("ss"))
      .select(col("event_type"), col("n"), col("s"),
        QueryDef.dec4(dd(d0(col("ss")) * col("n") - d0(col("s")) * col("s"))
          / dd(col("s"))).as("chi2"),
        // degenerate guard (round 15): a single hourly bucket gives
        // (0-0)/sqrt(0) = NaN; Spark's dec4 renders NULL but DuckDB
        // raises on CAST(NaN AS DECIMAL) — guard BOTH sides so the
        // oracle compares instead of erroring
        when(col("n") > 1L, QueryDef.dec4(
          (dd(d0(col("ss")) * col("n") - d0(col("s")) * col("s"))
            / dd(col("s")) - dd(col("n") - 1L)) /
            sqrt(lit(2.0) * dd(col("n") - 1L)))).as("z"))
  }

  private def q349(s: SparkSession, dir: String): DataFrame =
    overdispersion(Tables.events(s, dir)).orderBy(col("event_type"))

  private val q349Sql =
    """WITH h AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, count(*) AS n, CAST(sum(cnt) AS BIGINT) AS s,
      |    CAST(sum(CAST(cnt AS DECIMAL(38,0)) * cnt) AS DECIMAL(38,0))
      |      AS ss
      |  FROM h GROUP BY 1)
      |SELECT event_type, n, s,
      |  CAST(CAST(
      |    CAST(ss * n - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)
      |      / CAST(s AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS chi2,
      |  CASE WHEN n > 1 THEN CAST(CAST(
      |    (CAST(ss * n - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)
      |       / CAST(s AS DOUBLE) - CAST(n - 1 AS DOUBLE)) /
      |      sqrt(2.0 * CAST(n - 1 AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) END AS z
      |FROM m ORDER BY event_type""".stripMargin

  // ==== q351: sample-ratio-mismatch (SRM) check ==============================
  //
  // The experimentation shelf's FIRST gate, run before any effect
  // estimate (CUPED q254, IPW q276, planner q262): if the 50/50 hashed
  // assignment didn't land 50/50, every downstream readout is suspect
  // (broken bucketing, bot filtering one arm, redirect loss). Units are
  // USERS; bucket = second hex digit of md5(user_id) (16 uniform
  // buckets, arm = bucket < 8), χ²_arm = (n_a−n_b)²/n and the 16-bucket
  // uniformity χ² = (16·Σc² − n²)/n — both EXACT integer numerators
  // with one division at render (no per-cell float sums at all).
  // Scale shape: one distinct-users pass, one 16-row aggregate.

  /** One row: (n_users, n_a, n_b, chi2_arm, chi2_buckets, dof_buckets). */
  def srmCheck(events: DataFrame): DataFrame = {
    val users = events.select(col("user_id")).distinct()
      .select(conv(substring(md5(col("user_id").cast("string")), 2, 1),
        16, 10).cast("long").as("bucket"))
    def dd(c: Column) = c.cast("double")
    users.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n"),
        sum(when(col("bucket") < 8, col("c")).otherwise(0L)).as("n_a"),
        sum(when(col("bucket") >= 8, col("c")).otherwise(0L)).as("n_b"),
        sum(col("c") * col("c")).as("ss"),
        count(lit(1)).as("k"))
      .select(col("n").as("n_users"), col("n_a"), col("n_b"),
        QueryDef.dec4(dd((col("n_a") - col("n_b")) *
          (col("n_a") - col("n_b"))) / dd(col("n"))).as("chi2_arm"),
        QueryDef.dec4(dd(lit(16L) * col("ss") - col("n") * col("n")) /
          dd(col("n"))).as("chi2_buckets"),
        lit(15L).as("dof_buckets"))
  }

  private def q351(s: SparkSession, dir: String): DataFrame =
    srmCheck(Tables.events(s, dir))

  private val q351Sql =
    """WITH u AS (
      |  SELECT DISTINCT user_id FROM events),
      |b AS (
      |  SELECT strpos('0123456789abcdef',
      |    substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1 AS bucket
      |  FROM u),
      |c AS (
      |  SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
      |m AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN bucket < 8 THEN c ELSE 0 END) AS BIGINT)
      |      AS n_a,
      |    CAST(sum(CASE WHEN bucket >= 8 THEN c ELSE 0 END) AS BIGINT)
      |      AS n_b,
      |    CAST(sum(c * c) AS BIGINT) AS ss
      |  FROM c)
      |SELECT n AS n_users, n_a, n_b,
      |  CAST(CAST(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
      |    / CAST(n AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR) AS chi2_arm,
      |  CAST(CAST(CAST(16 * ss - n * n AS DOUBLE) / CAST(n AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS chi2_buckets,
      |  CAST(15 AS BIGINT) AS dof_buckets
      |FROM m""".stripMargin

  // ==== q352: delta-method CI for a ratio metric =============================
  //
  // Most business metrics are RATIOS of per-user sums (revenue/view,
  // conversions/session), and the naive per-user-mean CI is simply wrong
  // for them — the denominator is random too. The delta method:
  // R = ΣX/ΣY, var(R) ≈ (s_xx − 2R·s_xy + R²·s_yy)/(n·Ȳ²) from per-user
  // (x, y) moments — the standard experimentation readout (Deng et al.
  // 2017). Per arm (the q351 hash buckets), exact DECIMAL moments, one
  // spelled double chain for R/se/CI; z = 1.959964 (the q324 constant).
  // Scale shape: one user-domain groupBy, one 2-row moment aggregate.

  /** Per arm: (arm, n_users, sum_x, sum_y, ratio, se, ci_lo, ci_hi) for
    * x = purchase cents, y = view count per user. */
  def ratioMetricCi(events: DataFrame): DataFrame = {
    val perUser = events
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(coalesce(sum(when(col("event_type") === "purchase",
          col("cents"))), lit(0L)).as("x"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("y"))
      .select(
        when(conv(substring(md5(col("user_id").cast("string")), 2, 1),
          16, 10).cast("long") < 8, "a").otherwise("b").as("arm"),
        col("x").cast("decimal(18,0)").as("x"),
        col("y").cast("decimal(18,0)").as("y"))
    def dd(c: Column) = c.cast("double")
    val m = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    val r = dd(col("sx")) / dd(col("sy"))
    def sv(p: String, a: String, b: String) =
      (dd(col("n")) * dd(col(p)) - dd(col(a)) * dd(col(b))) /
        (dd(col("n")) * (dd(col("n")) - lit(1.0)))
    val ybar = dd(col("sy")) / dd(col("n"))
    val se = sqrt((sv("sxx", "sx", "sx") - lit(2.0) * r * sv("sxy", "sx", "sy")
      + r * r * sv("syy", "sy", "sy")) / (dd(col("n")) * ybar * ybar))
    m.select(col("arm"), col("n").as("n_users"),
      col("sx").cast("long").as("sum_x"), col("sy").cast("long").as("sum_y"),
      QueryDef.dec4(r).as("ratio"), QueryDef.dec4(se).as("se"),
      QueryDef.dec4(r - lit(1.959964) * se).as("ci_lo"),
      QueryDef.dec4(r + lit(1.959964) * se).as("ci_hi"))
  }

  private def q352(s: SparkSession, dir: String): DataFrame =
    ratioMetricCi(Tables.events(s, dir)).orderBy(col("arm"))

  private val q352Sql = {
    def sv(p: String, a: String, b: String) =
      s"""((CAST(n AS DOUBLE) * CAST($p AS DOUBLE)
         | - CAST($a AS DOUBLE) * CAST($b AS DOUBLE))
         | / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"""
        .stripMargin.replace("\n", " ")
    val r = "(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))"
    val ybar = "(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
    val se = s"""sqrt((${sv("sxx", "sx", "sx")} - 2.0 * $r *
      ${sv("sxy", "sx", "sy")} + $r * $r * ${sv("syy", "sy", "sy")})
      / (CAST(n AS DOUBLE) * $ybar * $ybar))""".replace("\n", " ")
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(round(value * 100) AS BIGINT) END), 0)
       |      AS DECIMAL(18,0)) AS x,
       |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |      AS DECIMAL(18,0)) AS y
       |  FROM events GROUP BY 1),
       |armed AS (
       |  SELECT CASE WHEN strpos('0123456789abcdef',
       |      substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1 < 8
       |    THEN 'a' ELSE 'b' END AS arm, x, y
       |  FROM pu),
       |m AS (
       |  SELECT arm, count(*) AS n,
       |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
       |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
       |    CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
       |    CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
       |    CAST(sum(y * y) AS DECIMAL(38,0)) AS syy
       |  FROM armed GROUP BY 1)
       |SELECT arm, n AS n_users, CAST(sx AS BIGINT) AS sum_x,
       |  CAST(sy AS BIGINT) AS sum_y,
       |  CAST(CAST($r AS DECIMAL(38,4)) AS VARCHAR) AS ratio,
       |  CAST(CAST($se AS DECIMAL(38,4)) AS VARCHAR) AS se,
       |  CAST(CAST($r - 1.959964 * $se AS DECIMAL(38,4)) AS VARCHAR)
       |    AS ci_lo,
       |  CAST(CAST($r + 1.959964 * $se AS DECIMAL(38,4)) AS VARCHAR)
       |    AS ci_hi
       |FROM m ORDER BY arm""".stripMargin
  }

  // ==== q353: Markov entropy rate — behavioral predictability ===============
  //
  // q119 fits P(next | current); the entropy rate says how PREDICTABLE
  // the behavior is at all: H = −Σᵢ π̂ᵢ Σⱼ p̂ᵢⱼ ln p̂ᵢⱼ with the empirical
  // stationary weights π̂ᵢ = cᵢ/C — 0 bits means deterministic journeys
  // (no model needed), ln|types| means uniform chaos (no model helps);
  // the number that decides whether the q238 next-event predictor is
  // worth running. Exactness: one ln per DISTINCT transition cell over
  // exact integers, ⌊10⁶·⌋-floored then WEIGHTED by the exact cell count
  // (the q195 rule) — per-state sums are exact BIGINTs, one division per
  // rendered row. Scale shape: the q119 lead window (single user_id
  // shuffle) down to a |types|² counts table; everything after is
  // type-domain arithmetic.

  /** Per from-state rows (state, c_i, n_out, h) + one `__all` row whose
    * h is the entropy RATE (π̂-weighted mean of the per-state rows). */
  def markovEntropyRate(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("state"), col("to_type"))
      .agg(count(lit(1)).as("c"))
    val ci = counts.groupBy(col("state")).agg(sum(col("c")).as("c_i"))
    def dd(c: Column) = c.cast("double")
    val terms = counts.join(broadcast(ci), Seq("state"))
      .select(col("state"), col("c_i"),
        (floor(lit(1e6) * log(dd(col("c")) / dd(col("c_i"))))
          .cast("long") * col("c")).as("t"))
    val perState = terms.groupBy(col("state"), col("c_i"))
      .agg(count(lit(1)).as("n_out"), sum(col("t")).as("ts_"))
    val all = perState.agg(sum(col("c_i")).as("c_i"),
        sum(col("n_out")).as("n_out"), sum(col("ts_")).as("ts_"))
      .select(lit("__all").as("state"), col("c_i"), col("n_out"),
        col("ts_"))
    perState.select(col("state"), col("c_i"), col("n_out"), col("ts_"))
      .unionByName(all)
      .select(col("state"), col("c_i"), col("n_out"),
        QueryDef.dec4(-dd(col("ts_")) / (lit(1e6) * dd(col("c_i"))))
          .as("h"))
  }

  private def q353(s: SparkSession, dir: String): DataFrame =
    markovEntropyRate(Tables.events(s, dir)).orderBy(col("state"))

  private val q353Sql =
    """WITH seq AS (
      |  SELECT event_type AS state,
      |    lead(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c AS (
      |  SELECT state, to_type, CAST(count(*) AS BIGINT) AS c FROM seq
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |ci AS (SELECT state, CAST(sum(c) AS BIGINT) AS c_i FROM c
      |  GROUP BY 1),
      |t AS (
      |  SELECT c.state, ci.c_i,
      |    CAST(floor(1e6 * ln(CAST(c.c AS DOUBLE)
      |      / CAST(ci.c_i AS DOUBLE))) AS BIGINT) * c.c AS t
      |  FROM c JOIN ci USING (state)),
      |ps AS (
      |  SELECT state, c_i, count(*) AS n_out,
      |    CAST(sum(t) AS BIGINT) AS ts_
      |  FROM t GROUP BY 1, 2),
      |uni AS (
      |  SELECT state, c_i, n_out, ts_ FROM ps
      |  UNION ALL
      |  SELECT '__all', CAST(sum(c_i) AS BIGINT),
      |    CAST(sum(n_out) AS BIGINT), CAST(sum(ts_) AS BIGINT) FROM ps)
      |SELECT state, c_i, n_out,
      |  CAST(CAST(-CAST(ts_ AS DOUBLE) / (1e6 * CAST(c_i AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS h
      |FROM uni ORDER BY state""".stripMargin

  // ==== q354: negative-binomial fit — the overdispersed count model =========
  //
  // q349 DETECTS overdispersion; this fits what to use instead of
  // Poisson when it fires: NB by method of moments, r = m²/(v−m),
  // p = m/v, over per-user per-type event counts (user heterogeneity is
  // the textbook NB mechanism — Poisson rates mixed over a Gamma
  // population). Degenerate guard: v ≤ m (at-or-under-dispersed) yields
  // NULL r/p — Poisson suffices, and the NULL is the signal. Exactness:
  // exact DECIMAL moments, m/v/r/p each ONE spelled double chain.

  /** Per event_type over per-user counts: (event_type, n_users, mean,
    * var, r, p) — r/p NULL when not overdispersed. */
  def negbinFit(events: DataFrame): DataFrame = {
    val perUser = events.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
    def d0(c: Column) = c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    val m = perUser.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(d0(col("x")) * col("x")).as("ss"))
    val mean = dd(col("s")) / dd(col("n"))
    val vr = (dd(col("n")) * dd(col("ss")) - dd(col("s")) * dd(col("s"))) /
      (dd(col("n")) * (dd(col("n")) - lit(1.0)))
    m.select(col("event_type"), col("n").as("n_users"),
      QueryDef.dec4(mean).as("mean"), QueryDef.dec4(vr).as("var"),
      QueryDef.dec4(when(vr > mean, mean * mean / (vr - mean))).as("r"),
      QueryDef.dec4(when(vr > mean, mean / vr)).as("p"))
  }

  private def q354(s: SparkSession, dir: String): DataFrame =
    negbinFit(Tables.events(s, dir)).orderBy(col("event_type"))

  private val q354Sql = {
    val mean = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    val vr = """((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"""
      .replace("\n", " ")
    s"""WITH pu AS (
       |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |m AS (
       |  SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
       |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS ss
       |  FROM pu GROUP BY 1)
       |SELECT event_type, n AS n_users,
       |  CAST(CAST($mean AS DECIMAL(38,4)) AS VARCHAR) AS mean,
       |  CAST(CAST($vr AS DECIMAL(38,4)) AS VARCHAR) AS var,
       |  CAST(CAST(CASE WHEN $vr > $mean
       |    THEN $mean * $mean / ($vr - $mean) END
       |    AS DECIMAL(38,4)) AS VARCHAR) AS r,
       |  CAST(CAST(CASE WHEN $vr > $mean THEN $mean / $vr END
       |    AS DECIMAL(38,4)) AS VARCHAR) AS p
       |FROM m ORDER BY event_type""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q344_holt_winters", q344, Some(q344Sql)),
    QueryDef("q351_srm_check", q351, Some(q351Sql)),
    QueryDef("q352_ratio_delta_ci", q352, Some(q352Sql)),
    QueryDef("q353_markov_entropy_rate", q353, Some(q353Sql)),
    QueryDef("q354_negbin_fit", q354, Some(q354Sql)),
    QueryDef("q345_periodogram", q345, Some(q345Sql)),
    QueryDef("q349_overdispersion", q349, Some(q349Sql)),
    QueryDef("q324_odds_ratio", q324, Some(q324Sql)),
    QueryDef("q323_aalen_johansen", q323, Some(q323Sql)),
    QueryDef("q322_cox_binary", q322, Some(q322Sql)),
    QueryDef("q327_cox_two_covariates", q327, Some(q327Sql)),
    QueryDef("q328_concordance_index", q328, Some(q328Sql)),
    QueryDef("q331_qini_curve", q331, Some(q331Sql)),
    QueryDef("q338_mantel_haenszel", q338, Some(q338Sql)),
    QueryDef("q321_eb_shrinkage", q321, Some(q321Sql)),
    QueryDef("q317_page_hinkley", q317, Some(q317Sql)),
    QueryDef("q315_turning_points", q315, Some(q315Sql)),
    QueryDef("q303_two_proportion_z", q303, Some(q303Sql)),
    QueryDef("q305_markov_attribution", q305, Some(q305Sql)),
    QueryDef("q306_rmst", q306, Some(q306Sql)),
    QueryDef("q307_reg_discontinuity", q307, Some(q307Sql)),
    QueryDef("q308_interarrival_fit", q308, Some(q308Sql)),
    QueryDef("q296_balance_report", q296, Some(q296Sql)),
    QueryDef("q295_ljung_box", q295, Some(q295Sql)),
    QueryDef("q294_pacf", q294, Some(q294Sql)),
    QueryDef("q288_nelson_aalen", q288, Some(q288Sql)),
    QueryDef("q283_forecast_eval", q283, Some(q283Sql)),
    QueryDef("q282_durbin_watson", q282, Some(q282Sql)),
    QueryDef("q276_ipw_ate", q276, Some(q276Sql)),
    QueryDef("q242_permutation_test", q242, Some(q242Sql)),
    QueryDef("q241_logrank_test", q241, Some(q241Sql)),
    QueryDef("q239_itemset_triples", q239, Some(q239Sql)),
    QueryDef("q238_markov_eval", q238, Some(q238Sql)),
    QueryDef("q236_bootstrap_ci", q236, Some(q236Sql)),
    QueryDef("q229_kaplan_meier", q229, Some(q229Sql)),
    QueryDef("q220_seq_pair_support", q220, Some(q220Sql)),
    QueryDef("q200_rolling_robust_z", q200, Some(q200Sql)),
    QueryDef("q201_segmented_fit", q201, Some(q201Sql)),
    QueryDef("q198_hourly_bars", q198, Some(q198Sql)),
    QueryDef("q188_cusum", q188, Some(q188Sql)),
    QueryDef("q266_wilson_rates", q266, Some(q266Sql)),
    QueryDef("q265_timed_funnel", q265, Some(q265Sql)),
    QueryDef("q263_qte", q263, Some(q263Sql)),
    QueryDef("q262_sample_size", q262, Some(q262Sql)),
    QueryDef("q261_matching_att", q261, Some(q261Sql)),
    QueryDef("q254_cuped", q254, Some(q254Sql)),
    QueryDef("q251_diff_in_diff", q251, Some(q251Sql)),
    QueryDef("q250_shapley_attribution", q250, Some(q250Sql)),
    QueryDef("q246_sprt", q246, Some(q246Sql)),
    QueryDef("q189_top_journeys", q189, Some(q189Sql)),
    QueryDef("q181_rate_anomaly", q181, Some(q181Sql)),
    QueryDef("q210_holt_trend", q210, Some(q210Sql)),
    QueryDef("q214_cross_corr", q214, Some(q214Sql)),
    QueryDef("q179_hourly_percentiles", q179, Some(q179Sql)),
    QueryDef("q175_rfm_segments", q175, Some(q175Sql)),
    QueryDef("q176_seasonal_naive", q176, Some(q176Sql)),
    QueryDef("q173_seq_match", q173, Some(q173Sql)),
    QueryDef("q169_ewma_hourly", q169, Some(q169Sql)),
    QueryDef("q167_multitouch_attribution", q167, Some(q167Sql)),
    QueryDef("q162_bounce_rate", q162, Some(q162Sql)),
    QueryDef("q159_inter_arrival", q159, Some(q159Sql)),
    QueryDef("q150_conversion_latency", q150, Some(q150Sql)),
    QueryDef("q151_stl_decompose", q151, Some(q151Sql)),
    QueryDef("q152_hourly_autocorr", q152, Some(q152Sql)),
    QueryDef("q139_rolling_hll", q139, Some(q139Sql)),
    QueryDef("q114_cohort_retention", q114, Some(q114Sql)),
    QueryDef("q120_trending_spikes", q120, Some(q120Sql)),
    QueryDef("q121_association_rules", q121, Some(q121Sql)),
    QueryDef("q125_attribution", q125, Some(q125Sql)),
    QueryDef("q128_rolling_active", q128, Some(q128Sql)),
    QueryDef("q112_funnel", q112, Some(q112Sql)),
    QueryDef("q115_gap_fill", q115, Some(q115Sql)),
    QueryDef("q116_decayed_score", q116, Some(q116Sql)),
    QueryDef("q119_markov_transitions", q119, Some(q119Sql)),
    QueryDef("q35_sessionization", q35, Some(q35Sql)),
    QueryDef("q36_tumbling_window", q36, Some(q36Sql)),
    QueryDef("q57_sliding_window", q57, Some(q57Sql)),
    QueryDef("q101_interval_join", q101, Some(q101Sql)))
}
