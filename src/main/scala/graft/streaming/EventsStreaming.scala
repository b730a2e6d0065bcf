package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface over the events stream (SURVEY.md §2
  * B34–B37). Every transform here is source-agnostic: it accepts either a
  * batch or a streaming DataFrame with the events schema, which is what the
  * batch-parity tests exploit (same code path, two execution modes).
  */
object EventsStreaming {

  /** File-based streaming source over a testdata dir (B34's readStream).
    *
    * `readStream` requires an explicit schema, but hard-coding one is how
    * silent event-time corruption happens: events.parquet has shipped both
    * as TIMESTAMP(NANOS) (read as nanos-long under the legacy flag) and as
    * TIMESTAMP(MICROS) (read as a native timestamp). A schema pinned to
    * `ts: LongType` over a micros file makes Spark reinterpret microsecond
    * counts as nanoseconds — every 2024 event lands in 1970 and windowed
    * aggregates are garbage, with no error anywhere. So: probe the actual
    * on-disk schema with a one-shot batch read (driver-side metadata only,
    * no data scan) and let [[graft.Tables.nanosToMicros]] dispatch on the
    * real `ts` type — the same adaptive path the batch loader uses.
    */
  def loadStream(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.enableNanosAsLong(spark)
    val onDisk = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema
    graft.Tables.nanosToMicros(
      spark.readStream
        .schema(onDisk)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** B34: tumbling 1-hour aggregation (same shape as batch q36). */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** B34: sliding 1-hour window, 15-minute slide (same shape as batch q57 —
    * every event lands in exactly 4 overlapping windows). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("n"), col("total_value"))

  /** B34 with event-time bounds: watermarked sliding window. */
  def slidingAggWithWatermark(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** B126b/q198 twin: streaming hourly OHLC + VWAP bars. Open/close ride
    * min_by/max_by over the (us, event_id) total order — declarative
    * aggregates, so the SAME plan shape runs batch or streaming; cents
    * keep the numerators exact and vwap_micro is the q198 integer
    * division. Complete/update mode; add a watermark upstream for
    * append. */
  def barsStream(events: DataFrame): DataFrame =
    events
      .select(col("ts"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        min_by(col("cents"), struct(col("us"), col("event_id"))).as("open_c"),
        max(col("cents")).as("high_c"),
        min(col("cents")).as("low_c"),
        max_by(col("cents"), struct(col("us"), col("event_id"))).as("close_c"),
        sum(col("cents")).as("sum_c"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("open_c"), col("high_c"), col("low_c"), col("close_c"),
        expr("(sum_c * 1000000) div n").as("vwap_micro"))

  /** B35: native session windows (30-minute gap). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("session_value"))

  /** B36: watermarked tumbling aggregation — append mode only emits a window
    * once the watermark passes its end; rows later than the watermark are
    * dropped. */
  def watermarkedCounts(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** B37: stateful streaming dedup by event_id within the watermark. */
  def dedupWithinWatermark(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join: each view joined to the same user's clicks
    * within the next `horizon` (the streaming twin of the forward as-of
    * candidate stage). Both sides carry watermarks and the join condition
    * carries an explicit event-time bound — that pair is what lets Spark
    * GC join state instead of buffering both streams forever; without the
    * time bound the state store grows unboundedly at 100 TB/day rates. */
  def viewClickJoin(views: DataFrame, clicks: DataFrame,
      delay: String = "1 hour", horizon: String = "30 minutes"): DataFrame = {
    val v = views.select(col("event_id").as("view_id"), col("user_id"),
      col("ts").as("view_ts")).withWatermark("view_ts", delay)
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    v.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") > col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
      "inner")
      .select(col("view_id"), col("user_id"), col("view_ts"),
        col("click_id"), col("click_ts"))
  }

  // ==== streaming funnel (B62's streaming twin) ==============================
  //
  // The batch funnel (EventsOps.funnel / q112) is a fixpoint over each
  // user's full event-time order: first_i = min ts of stage-i events
  // STRICTLY after first_{i-1}. That fixpoint is arrival-order-independent,
  // so a streaming version can be EXACT under out-of-order delivery — the
  // subtlety is state: first_{i-1} can still DECREASE when a late stage-
  // (i−1) event arrives, which can qualify stage-i events that were
  // rejected earlier. So each stage keeps a candidate buffer of the ts
  // that could still become its minimum: t ∈ (watermark, first_i). Both
  // bounds shrink the buffer monotonically — the watermark rises and
  // first_i only falls — so with a watermark the state is bounded by the
  // late-data volume per user; without one, exactness costs an unpruned
  // buffer (the parity test runs that mode to prove the fixpoint).

  /** Per-stage resolved minima + pending candidate ts. `Long.MaxValue` in
    * `firsts(i)` means stage i has no qualifying event yet. */
  case class FunnelState(firsts: Seq[Long], bufs: Seq[Seq[Long]])

  // ==== per-user hourly admission quota (transformWithState, B90) ==========
  //
  // The ingest-protection throttle: admit at most `maxPerHour` events per
  // (user, event-time hour); everything beyond the quota is flagged, not
  // dropped, so downstream can route rejects to a spill topic. Built on
  // Spark 4's transformWithState — the successor of mapGroupsWithState —
  // because the quota state is naturally a MAP keyed by hour bucket:
  // MapState gives per-hour point lookups/updates where a GroupState blob
  // would rewrite the whole map every event. Old hour buckets are retired
  // by EVENT time, not wall-clock TTL: after each slice the handler drops
  // map keys more than QuotaKeepHours behind the newest bucket seen — so
  // the state store carries |active users| × ≤QuotaKeepHours counters,
  // bounded at any event volume, and replays stay deterministic (a
  // wall-clock TTLConfig would admit differently depending on when the
  // replay runs). An event arriving > QuotaKeepHours late re-opens a fresh
  // bucket — the standard throttle tradeoff. Admission is by PROCESSING
  // order (what a real throttle does): micro-batch sequence, event-time
  // order inside a batch (the handler sorts its slice).

  /** Hour buckets kept per user; older buckets are dropped after each
    * slice so long-running streams hold bounded state per key. */
  val QuotaKeepHours = 24

  /** Drop hour buckets more than [[QuotaKeepHours]] behind the newest
    * one in the map — the deterministic (event-time) stand-in for a
    * wall-clock TTL. Called once per processed slice, so the sweep cost
    * is O(kept buckets), not O(events). */
  private def retireOldHours(admits: MapState[Long, Long]): Unit = {
    val ks = admits.keys().toArray
    if (ks.nonEmpty) {
      val cut = ks.max - QuotaKeepHours
      ks.filter(_ < cut).foreach(admits.removeKey)
    }
  }

  /** Input (user_id, event_id, us); output adds the admitted flag. */
  class HourlyQuotaProcessor(maxPerHour: Int)
      extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long, Boolean)] {
    @transient private var admits: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admits = getHandle.getMapState[Long, Long]("hour_admits",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Long)],
        tv: TimerValues): Iterator[(Long, Long, Long, Boolean)] = {
      val out = rows.toSeq.sortBy(r => (r._3, r._2)).map { case (u, eid, us) =>
        val hour = Math.floorDiv(us, 3600000000L)
        val sofar = if (admits.containsKey(hour)) admits.getValue(hour) else 0L
        val admit = sofar < maxPerHour
        if (admit) admits.updateValue(hour, sofar + 1)
        (u, eid, us, admit)
      }
      retireOldHours(admits)
      out.iterator
    }
  }

  /** The quota processor bootstrapped from batch history — the restart/
    * migration path: when the throttle comes up mid-hour (deploy, region
    * failover), already-admitted counts from the batch ledger seed the
    * state BEFORE the first micro-batch, so the quota is not silently
    * doubled across the restart. `handleInitialState` runs once per key
    * with the grouped initial rows (hour, admitted). */
  class SeededQuotaProcessor(maxPerHour: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, (Long, Long, Long), (Long, Long, Long, Boolean), (Long, Long, Long)] {
    @transient private var admits: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admits = getHandle.getMapState[Long, Long]("hour_admits",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInitialState(user: Long, row: (Long, Long, Long),
        tv: TimerValues): Unit =
      admits.updateValue(row._2, row._3)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Long)],
        tv: TimerValues): Iterator[(Long, Long, Long, Boolean)] = {
      val out = rows.toSeq.sortBy(r => (r._3, r._2)).map { case (u, eid, us) =>
        val hour = Math.floorDiv(us, 3600000000L)
        val sofar = if (admits.containsKey(hour)) admits.getValue(hour) else 0L
        val admit = sofar < maxPerHour
        if (admit) admits.updateValue(hour, sofar + 1)
        (u, eid, us, admit)
      }
      retireOldHours(admits)
      out.iterator
    }
  }

  /** [[quotaStream]] seeded from a batch ledger of (user_id, hour_bucket,
    * admitted) rows. */
  def quotaStreamSeeded(events: DataFrame, maxPerHour: Int,
      history: DataFrame): Dataset[(Long, Long, Long, Boolean)] = {
    import events.sparkSession.implicits._
    val init = history
      .select(col("user_id").cast("long"), col("hour_bucket").cast("long"),
        col("admitted").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SeededQuotaProcessor(maxPerHour),
        TimeMode.None(), OutputMode.Update(), init)
  }

  /** Per-user hourly quota over a (streaming) events frame. Caller must run
    * with the RocksDB state store provider (transformWithState requires it). */
  def quotaStream(events: DataFrame, maxPerHour: Int)
      : Dataset[(Long, Long, Long, Boolean)] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new HourlyQuotaProcessor(maxPerHour),
        TimeMode.None(), OutputMode.Update())
  }

  // ==== session summaries via event-time timers (transformWithState, B92) ===
  //
  // The timer-based twin of session_window: a session closes either when a
  // LATER event reveals a gap (emitted inline) or when the WATERMARK passes
  // last_event + gap with no successor — which only a timer can observe
  // (session_window holds the same state internally; here the state machine
  // is explicit, so the summary can carry arbitrary per-session fields and
  // side-effects). One ValueState tuple per user + one registered event-time
  // timer — state is O(active users), timers GC'd on every re-registration.

  /** (user, start_us, end_us, n_events, total_value, closed_by). */
  type SessionOut = (Long, Long, Long, Long, Double, String)

  class SessionTimerProcessor(gapUs: Long)
      extends StatefulProcessor[Long, (Long, Long, Long, Double), SessionOut] {
    // (start_us, last_us, n, sum_value, registered_timer_ms)
    @transient private var cur: org.apache.spark.sql.streaming.ValueState[(Long, Long, Long, Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState("session",
        Encoders.product[(Long, Long, Long, Double, Long)], TTLConfig.NONE)

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Long, Double)],
        tv: TimerValues): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, _, us, v) =>
        if (!cur.exists()) {
          cur.update((us, us, 1L, v, -1L))
        } else {
          val (s0, last, n, sv, t0) = cur.get()
          if (us - last <= gapUs)
            cur.update((s0, math.max(last, us), n + 1, sv + v, t0))
          else { // gap revealed in-stream
            out += ((user, s0, last, n, sv, "gap"))
            if (t0 > 0) getHandle.deleteTimer(t0)
            cur.update((us, us, 1L, v, -1L))
          }
        }
      }
      // (re)arm the timeout for the open session at last + gap (event time)
      if (cur.exists()) {
        val (s0, last, n, sv, t0) = cur.get()
        val want = (last + gapUs) / 1000L + 1
        if (t0 != want) {
          if (t0 > 0) getHandle.deleteTimer(t0)
          getHandle.registerTimer(want)
          cur.update((s0, last, n, sv, want))
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] =
      if (cur.exists()) {
        val (s0, last, n, sv, _) = cur.get()
        cur.clear()
        Iterator((user, s0, last, n, sv, "timer"))
      } else Iterator.empty
  }

  /** Explicit session summaries: closes on an observed gap or on the
    * watermark passing `gap` after the last event (event-time timer).
    * Exact vs the batch gap-sessionization when arrival is event-time
    * ordered per user. Requires the RocksDB state store. */
  def sessionTimerStream(events: DataFrame, gap: String = "30 minutes",
      delay: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val us = gapUs.days * 86400000000L + gapUs.microseconds
    events
      .withWatermark("ts", delay)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(us),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The funnel fixpoint on transformWithState (same state-backend story
    * as the quota/session/heavy-hitter processors: RocksDB + the Spark 4
    * API). State = per-stage resolved minima + candidate buffers in one
    * ValueState; the candidate-buffer fixpoint is identical to the old
    * mapGroupsWithState formulation, so the descending-order replay
    * parity is unchanged. The watermark (when the query carries one)
    * prunes candidates at or below it — store-bounded without a TTL. */
  class FunnelProcessor(stages: Seq[String])
      extends StatefulProcessor[Long, (Long, Long, String), (Long, Seq[Int])] {
    private val k = stages.size
    private val stageIdx = stages.zipWithIndex.toMap
    @transient private var st: org.apache.spark.sql.streaming.ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, String)],
        tv: TimerValues): Iterator[(Long, Seq[Int])] = {
      // −1 when the query carries no watermark (the exact/unbounded
      // mode); treat that as watermark −∞
      val wmMs = tv.getCurrentWatermarkInMs()
      val wm = if (wmMs > 0) wmMs * 1000L else Long.MinValue
      val cur = if (st.exists()) st.get()
        else FunnelState(Seq.fill(k)(Long.MaxValue), Seq.fill(k)(Nil))
      val firsts = cur.firsts.toArray
      val bufs = cur.bufs.map(_.toBuffer).toArray
      rows.foreach { case (_, us, et) => bufs(stageIdx(et)) += us }
      // resolve the chain in stage order: stage 0's threshold is "always
      // qualified"; each later stage consumes its buffer against the
      // (already updated) previous first
      var i = 0
      while (i < k) {
        val threshold = if (i == 0) Long.MinValue else firsts(i - 1)
        if (threshold < Long.MaxValue) {
          val qualified = bufs(i).filter(_ > threshold)
          if (qualified.nonEmpty)
            firsts(i) = math.min(firsts(i), qualified.min)
        }
        // keep only candidates that could still lower first_i
        val keep = bufs(i).filter(t => t < firsts(i) && t > wm)
        bufs(i).clear(); bufs(i) ++= keep
        i += 1
      }
      st.update(FunnelState(firsts.toSeq, bufs.map(_.toSeq).toSeq))
      Iterator((user, firsts.map(f => if (f < Long.MaxValue) 1 else 0).toSeq))
    }
  }

  /** Streaming funnel over (user_id, ts, event_type): emits the user's
    * current reached-flags each micro-batch (update mode). Exact under any
    * arrival order; bound state by calling withWatermark upstream (the
    * watermark prunes dead candidates). Requires the RocksDB state store
    * provider (transformWithState). */
  def funnelStream(events: DataFrame, stages: Seq[String])
      : Dataset[(Long, Seq[Int])] = {
    require(stages.nonEmpty)
    val stageSet = stages.toSet
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_type"))
      .as[(Long, Long, String)]
      .filter(r => stageSet.contains(r._3))
      .groupByKey(_._1)
      .transformWithState(new FunnelProcessor(stages),
        TimeMode.None(), OutputMode.Update())
  }

  // ==== streaming SPRT monitor (q246's always-on twin) =======================
  //
  // Wald's SPRT is sequential by nature — this is the operator the batch
  // q246 exists to backfill. One ValueState row carries (n, k, decided?,
  // decision stats); each micro-batch folds its rows in (ts, event_id)
  // order and the FIRST boundary crossing freezes the decision (a stopped
  // sequential test stays stopped — that is the test's validity
  // guarantee, so later data cannot re-open it). Parity contract: fed
  // (ts, event_id)-ordered micro-batches, the final emitted row equals
  // the batch [[graft.operators.EventsOps.sprt]] exactly (spec-pinned).
  // Constants are q246's micro-nat integer literals — integer state only.
  // The single logical key is the experiment itself; a global sequential
  // test has no parallelism to lose.

  case class SprtState(n: Long, k: Long, decided: Boolean,
      decN: Long, decK: Long, decLlr: Long)

  class SprtProcessor
      extends StatefulProcessor[Long, (Long, Long, Long, Long),
        (String, Long, Long, Long)] {
    private val Succ = 100083L; private val Fail = -25002L
    private val AUp = 2944438L; private val BLo = -2944439L
    @transient private var st: ValueState[SprtState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("sprt",
        Encoders.product[SprtState], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long, Long)],
        tv: TimerValues): Iterator[(String, Long, Long, Long)] = {
      var s = if (st.exists()) st.get()
        else SprtState(0L, 0L, decided = false, 0L, 0L, 0L)
      // fold in event order within the batch; ordered delivery across
      // batches is the caller's contract (see parity note above)
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, x) =>
        val n = s.n + 1; val k = s.k + x
        val llr = k * Succ + (n - k) * Fail
        val crossed = !s.decided && (llr >= AUp || llr <= BLo)
        s = SprtState(n, k, s.decided || crossed,
          if (crossed) n else s.decN, if (crossed) k else s.decK,
          if (crossed) llr else s.decLlr)
      }
      st.update(s)
      val out =
        if (s.decided)
          (if (s.decLlr >= AUp) "accept_h1" else "accept_h0",
            s.decN, s.decK, s.decLlr)
        else ("continue", s.n, s.k, s.k * Succ + (s.n - s.k) * Fail)
      Iterator(out)
    }
  }

  /** Streaming SPRT over the events stream: emits the monitor's current
    * (decision, n_decide, k_decide, llr_micro) each micro-batch. Requires
    * the RocksDB state store provider (transformWithState). */
  def sprtStream(events: DataFrame, eventType: String)
      : Dataset[(String, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.select(lit(0L).as("exp"), unix_micros(col("ts")).as("tsu"),
      col("event_id").cast("long"),
      when(col("event_type") === eventType, 1L).otherwise(0L).as("x"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SprtProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  // ==== streaming PSI drift monitor ==========================================
  //
  // Online model-input monitoring: every tumbling hour, the value
  // distribution is binned (16 fixed-width cent bins) and scored against
  // a FIXED reference with PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) — the
  // at-a-glance "has the feature moved" number (B-q159's batch PSI,
  // always-on). One windowed groupBy with 16 conditional counts (a
  // SINGLE streaming aggregate — no stream-stream join of aggregates,
  // which Structured Streaming forbids); PSI is a plain expression over
  // the 17 columns, so the query runs append-mode with a watermark and
  // bounded state. Source-agnostic (the B34 pattern): the same function
  // on a batch frame IS the parity oracle.

  /** Per tumbling hour: (window_start, n, psi_micro) against `ref`
    * (16 reference fractions, must sum to 1; zero-count bins use the
    * 0·ln0 = 0 convention, zero-reference bins are guarded by `eps`). */
  def psiDriftStream(events: DataFrame, ref: Seq[Double],
      binWidthCents: Long = 3000L, delay: String = "1 hour"): DataFrame = {
    require(ref.size == 16, "expect 16 reference fractions")
    val eps = 1e-9
    val vc = round(col("value") * 100).cast("long")
    // clamp BOTH sides: a negative value would otherwise yield bin < 0,
    // matching none of c0..c15 — the event silently vanishing from every
    // bin and from n instead of landing in the low edge bin
    val bin = greatest(lit(0L),
      least(floor(vc.cast("double") / lit(binWidthCents.toDouble))
        .cast("long"), lit(15L)))
    val counts = (0 to 15).map(b =>
      sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"c$b"))
    val agg = events
      .withWatermark("ts", delay)
      .select(col("ts"), bin.as("bin"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(counts.head, counts.tail: _*)
    val n = (0 to 15).map(b => col(s"c$b")).reduce(_ + _)
    val psi = (0 to 15).map { b =>
      val p = col(s"c$b").cast("double") / n.cast("double")
      val q = lit(math.max(ref(b), eps))
      when(col(s"c$b") > 0, (p - q) * log(p / q)).otherwise(lit(0.0))
    }.reduce(_ + _)
    agg.select(col("window.start").as("window_start"),
      n.as("n"), floor(lit(1e6) * psi).cast("long").as("psi_micro"))
  }

  // ==== streaming conformal outlier-rate monitor (B215) ======================
  //
  // The streaming face of B205's conformal machinery: a FIXED calibration
  // threshold — the ⌈(n_cal+1)(1−α)⌉-th smallest calibration value, the
  // split-conformal quantile, computed batch-side by exact integer rank
  // selection on the value histogram (no interpolation, the q191 rule) —
  // classifies each arriving event as a conformal outlier (value > thr ⇒
  // p-value ≤ α). Per tumbling hour the monitor reports (n, n_out):
  // under no drift the outlier rate concentrates near α by exchangeability,
  // so rate ≫ α IS the drift alarm — a distribution-free complement to
  // the parametric PSI monitor above. One windowed streaming aggregate,
  // append mode + watermark ⇒ bounded state; source-agnostic (the B34
  // pattern), so the batch run is the parity oracle.

  /** The ⌈(n+1)(1−αNum/αDen)⌉-th smallest cent value of `values` —
    * exact integer rank selection over the distinct-value histogram
    * (never a global sort of raw rows). */
  def conformalThresholdCents(values: DataFrame, alphaNum: Long,
      alphaDen: Long): Long = {
    val counts = values
      .select(round(col("value") * 100).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val scanned = graft.chunk.ChunkAssigner.withPrefixSum(
      counts, Seq(col("v")), col("c"), outName = "p")
    val n = counts.agg(sum(col("c"))).head().getLong(0)
    // rank r = n+1 − ⌊α(n+1)⌋; the r-th smallest is the first distinct
    // value whose inclusive cumulative count reaches r
    val r = n + 1 - alphaNum * (n + 1) / alphaDen
    scanned.filter(col("p") + col("c") >= r)
      .orderBy(col("v")).limit(1)
      .select(col("v")).head().getLong(0)
  }

  /** Per tumbling hour: (window_start, n, n_out) — events whose cent
    * value exceeds `thrCents` are conformal outliers at the calibrated
    * level. */
  def conformalRateStream(events: DataFrame, thrCents: Long,
      delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .select(col("ts"),
        when(round(col("value") * 100).cast("long") > thrCents, 1L)
          .otherwise(0L).as("out"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("out")).as("n_out"))
      .select(col("window.start").as("window_start"), col("n"),
        col("n_out"))

  // ==== stream-stream interval join (B121) ===================================
  //
  // The two-unbounded-sides join Spark executes with symmetric state: each
  // side buffers rows until the OTHER side's watermark proves no future
  // match can arrive, so state stays bounded by (watermark delay + join
  // horizon) × arrival rate — the attribution join (purchase ⋈ its
  // preceding touches) run continuously instead of as a batch job. The
  // event-time range condition is what lets Spark derive the state
  // eviction bound; an unconstrained stream-stream join would buffer
  // forever and is rejected in append mode.

  /** Continuous touch attribution: purchases joined to same-user touches
    * in [p_ts − horizon, p_ts). Inner join — unmatched purchases surface
    * when the batch twin reports them as 'unattributed'. */
  def streamStreamTouchJoin(purchases: DataFrame, touches: DataFrame,
      horizonSec: Long, delay: String = "10 minutes"): DataFrame = {
    val p = purchases
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", delay)
    val t = touches
      .select(col("user_id").as("t_user"), col("event_id").as("t_id"),
        col("ts").as("t_ts"), col("event_type").as("touch_type"))
      .withWatermark("t_ts", delay)
    p.join(t,
      col("user_id") === col("t_user") &&
        col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr(s"INTERVAL $horizonSec SECONDS"))
      .select(col("p_id"), col("t_id"), col("touch_type"), col("value"))
  }

  // ==== streaming heavy hitters (B105's stream side) =========================
  //
  // Misra–Gries as per-key transformWithState: the MG counters ARE the
  // MapState (≤ k entries per key forever — the state store never grows
  // with stream volume, the property a groupBy-count stream lacks on an
  // unbounded item domain). Same estimate laws as the batch operator:
  // underestimates only, error ≤ n_key/(k+1), every item with frequency
  // > n_key/(k+1) is present; with k ≥ distinct items per key the counters
  // are exact (the spec's parity regime). After each slice the processor
  // emits the key's full current summary (Update mode — latest wins).

  class HeavyHitterProcessor(k: Int)
      extends StatefulProcessor[String, (String, String), (String, String, Long)] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("mg_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, String)],
        tv: TimerValues): Iterator[(String, String, Long)] = {
      // fold the whole slice in a LOCAL map (≤ k+1 entries), then write
      // the state back once: O(k) store ops per key-slice instead of the
      // per-row store walk that made a 1M-row replay grind through ~20M
      // RocksDB point ops (the round-12 state-scale soak caught this —
      // same counters, same MG algebra, just batched IO)
      val local = new scala.collection.mutable.HashMap[String, Long]()
      counts.iterator().foreach(p => local.put(p._1, p._2))
      val before = local.keySet.toSet
      rows.foreach { case (_, item) =>
        local.get(item) match {
          case Some(v) => local.put(item, v + 1)
          case None if local.size < k => local.put(item, 1L)
          case None => local.keysIterator.toArray.foreach { other =>
            val v = local(other) - 1
            if (v == 0) local.remove(other) else local.put(other, v)
          }
        }
      }
      before.diff(local.keySet).foreach(counts.removeKey)
      local.foreach { case (item, v) => counts.updateValue(item, v) }
      local.keysIterator.toArray.sorted.iterator
        .map(item => (key, item, local(item)))
    }
  }

  /** Per-`keyCol` streaming MG top items over `itemCol`. Caller must run
    * with the RocksDB state store provider. */
  def heavyHitterStream(events: DataFrame, keyCol: String, itemCol: String,
      k: Int): Dataset[(String, String, Long)] = {
    import events.sparkSession.implicits._
    events
      .select(col(keyCol).cast("string"), col(itemCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new HeavyHitterProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  // ==== streaming CUSUM changepoint monitor (q188's stream twin) ============
  //
  // The batch operator dissolves CUSUM's max() into prefix-sum − running-
  // min; the SAME closed form makes the streaming state O(1) per series:
  // just (P, minP), two BIGINTs forever — where the textbook recurrence
  // would also be O(1) but this form keeps the arithmetic IDENTICAL to
  // the batch plan, so batch and stream agree bit-for-bit. The baseline
  // (per-series total, n) is FROZEN from batch history at stream start —
  // the lmScoreFrozen/IVF-centroid discipline: a monitor tests against a
  // reference level, it does not re-estimate the level from the data it
  // is judging. Contract: rows are per-series hourly aggregates arriving
  // in hour order across batches (each slice is sorted; CUSUM is order-
  // sensitive by definition).

  class CusumProcessor(baseline: Map[String, (Long, Long)])
      extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long, Boolean)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("cusum",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Long, Long)],
        tv: TimerValues): Iterator[(String, Long, Long, Long, Boolean)] = {
      val (total, n) = baseline.getOrElse(key, (0L, 0L))
      if (n == 0) Iterator.empty // unknown series: no baseline, no verdict
      else {
        var (p, minp) = if (st.exists()) st.get() else (0L, 0L)
        val out = rows.toSeq.sortBy(_._2).map { case (_, hr, cnt) =>
          p += 4L * n * cnt - 5L * total
          minp = math.min(minp, p)
          val s = p - math.min(minp, 0L)
          (key, hr, cnt, s / (4L * n), s > 8L * total)
        }
        st.update((p, minp))
        out.iterator
      }
    }
  }

  // ==== streaming Page–Hinkley changepoint (q317's stream twin) =============
  //
  // Unlike CUSUM (frozen baseline), Page–Hinkley tracks the RUNNING
  // mean — its state is still O(1) per series because the adaptive term
  // only needs (i, S): term_i = ⌊(10⁶(i·x_i − S_i) − i·δµ)/i⌋, one floor
  // of an exact integer ratio, identical to the batch q317 window form,
  // so the cumulative m, running min, and alarm gap are exact integers
  // no matter how the stream is sliced into micro-batches.

  /** Input (series, hr, cnt); output (series, hr, gap_micro, alarm).
    * State: (i, S, m, minm) — four BIGINTs per series forever. */
  class PageHinkleyProcessor(deltaMicro: Long, lambdaMicro: Long)
      extends StatefulProcessor[String, (String, Long, Long),
        (String, Long, Long, Boolean)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[
      (Long, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("page_hinkley",
        Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Long)],
        tv: TimerValues): Iterator[(String, Long, Long, Boolean)] = {
      var (i, s, m, minm) =
        if (st.exists()) st.get() else (0L, 0L, 0L, Long.MaxValue)
      val out = rows.toSeq.sortBy(_._2).map { case (_, hr, cnt) =>
        i += 1; s += cnt
        // the SAME arithmetic as the batch window form: numerator as an
        // exact integer, ONE double division, floor — bit-equal slices
        val num = BigInt(1000000L) * (BigInt(i) * cnt - s) -
          BigInt(i) * deltaMicro
        m += math.floor(num.toDouble / i.toDouble).toLong
        minm = math.min(minm, m)
        val gap = m - minm
        (key, hr, gap, gap > lambdaMicro)
      }
      st.update((i, s, m, minm))
      out.iterator
    }
  }

  /** Streaming Page–Hinkley over pre-aggregated (series, hr, cnt) rows —
    * adaptive-mean changepoint, gap bit-equal to the batch
    * [[graft.operators.EventsOps.pageHinkley]]. RocksDB required. */
  def pageHinkleyStream(hourly: DataFrame, deltaMicro: Long = 0L,
      lambdaMicro: Long = 50000000L)
      : Dataset[(String, Long, Long, Boolean)] = {
    import hourly.sparkSession.implicits._
    hourly
      .select(col("event_type").cast("string"), col("hr").cast("long"),
        col("cnt").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new PageHinkleyProcessor(deltaMicro, lambdaMicro),
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming CUSUM over pre-aggregated (series, hr, cnt) rows with a
    * frozen per-series baseline (total, n). RocksDB required. */
  def cusumStream(hourly: DataFrame, baseline: Map[String, (Long, Long)])
      : Dataset[(String, Long, Long, Long, Boolean)] = {
    import hourly.sparkSession.implicits._
    hourly
      .select(col("event_type").cast("string"), col("hr").cast("long"),
        col("cnt").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new CusumProcessor(baseline),
        TimeMode.None(), OutputMode.Update())
  }

  // ==== streaming Holt forecaster (q210's stream twin) ======================
  //
  // The batch operator's integer recurrence IS already an O(1)-state
  // machine — (level, trend), two BIGINTs per series forever — so the
  // stream twin just runs it under transformWithState: no window, no
  // buffered history, bit-equal to the batch fold by construction
  // (Math.floorDiv == the batch plan's (x − pmod(x,2)) div 2 on every
  // integer). Unlike CUSUM there is no frozen baseline: Holt is
  // self-initializing (l₁ = x₁, b₁ = 0), which also makes it the
  // "forecast at the edge" shape — each arriving hourly aggregate
  // updates two integers and emits the next-hour prediction. Same
  // ordering contract as CUSUM: per-series hour order across batches.

  class HoltProcessor
      extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long, Long, Long)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Long, Boolean)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("holt",
        Encoders.product[(Long, Long, Boolean)], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Long, Long)],
        tv: TimerValues): Iterator[(String, Long, Long, Long, Long, Long)] = {
      var (l, b, started) =
        if (st.exists()) st.get() else (0L, 0L, false)
      val out = rows.toSeq.sortBy(_._2).map { case (_, hr, cnt) =>
        if (!started) { l = cnt; b = 0L; started = true }
        else {
          val l1 = Math.floorDiv(l + b + cnt, 2L)
          b = Math.floorDiv(b + (l1 - l), 2L)
          l = l1
        }
        (key, hr, cnt, l, b, l + b)
      }
      st.update((l, b, started))
      out.iterator
    }
  }

  /** Streaming Holt smoothing over pre-aggregated (series, hr, cnt) rows:
    * (series, hr, cnt, level, trend, forecast), bit-equal to the batch
    * [[graft.operators.EventsOps.holtHourly]]. RocksDB required. */
  def holtStream(hourly: DataFrame)
      : Dataset[(String, Long, Long, Long, Long, Long)] = {
    import hourly.sparkSession.implicits._
    hourly
      .select(col("event_type").cast("string"), col("hr").cast("long"),
        col("cnt").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new HoltProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  // ==== streaming forecast-error monitor (B233) ==============================
  //
  // The streaming twin of q283's seasonal-naive accuracy: per type, a
  // FIXED 24-slot ring (MapState keyed by hr % 24 holding (hr, cnt))
  // remembers exactly the one day of history the lag-24 forecast needs —
  // state is 24 entries per type at ANY stream length, and a slot is
  // overwritten the moment its hour is superseded. Each arriving hourly
  // count that finds its 24h-ago sibling emits (hr, actual, forecast,
  // abs_err, smape_micro-term) with the same ⌊2·10⁶·|f−a|/(f+a)⌋
  // flooring as the batch operator, so windowed sMAPE rollups downstream
  // sum the identical integers. Hours are processed in event-time order
  // within each micro-batch (the Holt/CUSUM processor contract).

  class ForecastErrorProcessor
      extends StatefulProcessor[String, (String, Long, Long),
        (String, Long, Long, Long, Long, Long)] {
    @transient private var ring: MapState[Long, (Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getMapState[Long, (Long, Long)]("fc_ring",
        Encoders.scalaLong, Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Long)], tv: TimerValues)
        : Iterator[(String, Long, Long, Long, Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long, Long, Long)]
      rows.toSeq.sortBy(_._2).foreach { case (_, hr, cnt) =>
        val slot = Math.floorMod(hr, 24L)
        val prev = if (ring.containsKey(slot)) Option(ring.getValue(slot))
          else None
        prev.foreach { case (ph, f) =>
          if (ph == hr - 24 && cnt + f > 0) {
            val smape = math.floor(
              2e6 * math.abs(cnt - f).toDouble / (cnt + f)).toLong
            out += ((key, hr, cnt, f, math.abs(cnt - f), smape))
          }
        }
        ring.updateValue(slot, (hr, cnt))
      }
      out.iterator
    }
  }

  /** Streaming lag-24 forecast errors over pre-aggregated
    * (event_type, hr, cnt) rows: (type, hr, actual, forecast, abs_err,
    * smape_micro) — term-for-term equal to the batch q283 join.
    * RocksDB required. */
  def forecastErrorStream(hourly: DataFrame)
      : Dataset[(String, Long, Long, Long, Long, Long)] = {
    import hourly.sparkSession.implicits._
    hourly
      .select(col("event_type").cast("string"), col("hr").cast("long"),
        col("cnt").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new ForecastErrorProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  // ==== streaming exact distinct via block bitmaps (B155s) ==================
  //
  // The streaming twin of graft.operators.Bitmaps: per segment, MapState
  // keyed by id-block holding that block's bitmap (RocksDB point
  // lookups/updates — a GroupState blob would rewrite every block on
  // every event), plus a running total maintained INCREMENTALLY (+1 only
  // when a bit flips 0→1, so the count never rescans the map). State is
  // bounded by occupied blocks × numBits/8 bytes per segment — a pure
  // function of the distinct-id SET, so checkpoint replays are
  // deterministic, and the final count is bit-equal to the batch
  // popcount at any micro-batch slicing.

  /** Input (segment, id); output the segment's running exact distinct
    * count after each slice. */
  class BitmapDistinctProcessor(numBits: Int)
      extends StatefulProcessor[String, (String, Long), (String, Long)] {
    @transient private var blocks: MapState[Long, Array[Byte]] = _
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      blocks = getHandle.getMapState[Long, Array[Byte]]("bitmap_blocks",
        Encoders.scalaLong, Encoders.BINARY, TTLConfig.NONE)
      total = getHandle.getValueState[Long]("distinct_total",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(seg: String, rows: Iterator[(String, Long)],
        tv: TimerValues): Iterator[(String, Long)] = {
      var n = if (total.exists()) total.get() else 0L
      var curBlock = Long.MinValue
      var cur: Array[Byte] = null
      def flush(): Unit = if (cur != null) blocks.updateValue(curBlock, cur)
      rows.foreach { case (_, id) =>
        require(id >= 0, s"bitmap ids must be non-negative: $id")
        val block = id / numBits
        if (block != curBlock) {
          flush()
          curBlock = block
          cur = if (blocks.containsKey(block)) blocks.getValue(block)
            else new Array[Byte](numBits / 8)
        }
        val off = (id % numBits).toInt
        val mask = (1 << (off & 7)).toByte
        if ((cur(off >>> 3) & mask) == 0) {
          cur(off >>> 3) = (cur(off >>> 3) | mask).toByte
          n += 1
        }
      }
      flush()
      total.update(n)
      Iterator.single((seg, n))
    }
  }

  /** Running exact distinct `idCol` per `segCol` over a streaming frame.
    * RocksDB required. */
  def bitmapDistinctStream(events: DataFrame, segCol: String, idCol: String)
      : Dataset[(String, Long)] = {
    import events.sparkSession.implicits._
    events.select(col(segCol).cast("string"), col(idCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new BitmapDistinctProcessor(graft.operators.Bitmaps.BlockBits),
        TimeMode.None(), OutputMode.Update())
  }

  // ==== streaming KMV distinct estimate (B156s) ==============================
  //
  // The approximate twin of B155s for id spaces too sparse for bitmaps
  // (URLs, content hashes): per segment ONE ValueState holding the k
  // unsigned-smallest sign-flipped hashes — k·8 bytes per key FOREVER,
  // regardless of stream volume. State is a pure function of the distinct
  // hash SET, so replays and re-orderings are bit-deterministic, and the
  // final sketch equals the batch MinKHashAgg over the same prefix.
  // Emits the running estimate: exact |set| while the sketch is not full
  // (the q222 exact-regime contract), (k−1)/frac(kth) once it is.

  /** Input (segment, hash). Output (segment, n_sketch, est_distinct). */
  class KmvDistinctProcessor(k: Int)
      extends StatefulProcessor[String, (String, Long), (String, Int, Long)] {
    @transient private var st: ValueState[Array[Long]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Long]]("kmv",
        Encoders.kryo[Array[Long]], TTLConfig.NONE)

    override def handleInputRows(seg: String, rows: Iterator[(String, Long)],
        tv: TimerValues): Iterator[(String, Int, Long)] = {
      val set = new java.util.TreeSet[java.lang.Long]()
      if (st.exists()) st.get().foreach(set.add(_))
      rows.foreach { case (_, h) =>
        val f = h ^ Long.MinValue
        if (set.size < k) { set.add(f); () }
        else if (f < set.last()) {
          set.add(f)
          if (set.size > k) { set.pollLast(); () }
        }
      }
      val arr = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      st.update(arr)
      val est =
        if (arr.length < k) arr.length.toLong
        else {
          val frac = (arr.last.toDouble + 9.223372036854776e18 + 1.0) /
            1.8446744073709552e19
          ((k - 1).toDouble / frac).toLong
        }
      Iterator.single((seg, arr.length, est))
    }
  }

  /** Running distinct estimate per segment from a streaming frame; hashes
    * computed map-side with xxhash64. RocksDB required. */
  def kmvDistinctStream(events: DataFrame, segCol: String, idCol: String,
      k: Int): Dataset[(String, Int, Long)] = {
    import events.sparkSession.implicits._
    events.select(col(segCol).cast("string"), xxhash64(col(idCol)))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new KmvDistinctProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  // ==== streaming KLL quantile sketch (B262s) =================================
  //
  // The streaming twin of the batch KLL rank state (B262,
  // functions/KllExprs + Incremental.kllState): per segment ONE
  // ValueState holding the serialized compactor levels — O(k) bytes per
  // key FOREVER on unbounded value domains (B103's grid twin needs the
  // declared range; this one doesn't). Same wire format and same
  // update/compaction path as the batch aggregate, so in the EXACT
  // regime (< k values seen — no compaction) the emitted quantiles are
  // bit-equal to the batch readout over the same prefix, and in the
  // sketch regime the rank-error contract carries over unchanged.
  // Emits the running (n, p50, p90) per segment.

  /** Input (segment, value). Output (segment, n, p50, p90). */
  class KllQuantileProcessor(k: Int)
      extends StatefulProcessor[String, (String, Long), (String, Long, Long, Long)] {
    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("kll",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(seg: String, rows: Iterator[(String, Long)],
        tv: TimerValues): Iterator[(String, Long, Long, Long)] = {
      val state = if (st.exists()) graft.functions.KllExprs.fromBytes(st.get())
        else new graft.functions.KllExprs.State(k)
      rows.foreach { case (_, v) => state.update(v) }
      st.update(graft.functions.KllExprs.toBytes(state))
      Iterator.single((seg, state.totalWeight,
        state.quantile(50), state.quantile(90)))
    }
  }

  /** Running p50/p90 per segment from a streaming frame. RocksDB
    * required. */
  def kllQuantileStream(events: DataFrame, segCol: String, valueCol: String,
      k: Int): Dataset[(String, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.select(col(segCol).cast("string"), col(valueCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new KllQuantileProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** Crash-replay audit twin of [[KllQuantileProcessor]] (round 14): the
    * same state, wire format and update path, but each batch slice is
    * sorted first (the B110s/B147 in-slice arrival discipline — a
    * well-defined update sequence is what "replay" means) and the output
    * carries sha256 of the serialized state, so a RocksDB checkpoint
    * restore can be PROVEN byte-identical to an uninterrupted run — the
    * property the derandomized survivor parity was built for. */
  class KllBytesProcessor(k: Int)
      extends StatefulProcessor[String, (String, Long), (String, Long, String)] {
    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("kll",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(seg: String, rows: Iterator[(String, Long)],
        tv: TimerValues): Iterator[(String, Long, String)] = {
      val state = if (st.exists()) graft.functions.KllExprs.fromBytes(st.get())
        else new graft.functions.KllExprs.State(k)
      rows.map(_._2).toArray.sorted.foreach(state.update)
      val bytes = graft.functions.KllExprs.toBytes(state)
      st.update(bytes)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(bytes).map("%02x".format(_)).mkString
      Iterator.single((seg, state.totalWeight, sha))
    }
  }

  /** (segment, n, sha256(state)) per batch — the crash-replay probe. */
  def kllBytesProbe(events: DataFrame, segCol: String, valueCol: String,
      k: Int): Dataset[(String, Long, String)] = {
    import events.sparkSession.implicits._
    events.select(col(segCol).cast("string"), col(valueCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new KllBytesProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  // ==== streaming sequence-pattern matcher (B110s, CEP-lite) ================
  //
  // The ONLINE twin of the batch MATCH_RECOGNIZE-lite (q173): counts
  // leftmost non-overlapping matches of a linear pattern (literal steps,
  // optional c* stars — the q173 class) per user as events arrive, with
  // O(1) state per user FOREVER: (pattern position, match count, length)
  // — never the event history, never even a tail buffer, because for
  // patterns whose step letters are pairwise distinct (asserted at
  // construction) the leftmost-first scan is a backtrack-free state
  // machine: a failing letter either restarts an attempt (it equals the
  // first step) or returns to idle, exactly reproducing Java-regex
  // find() semantics. Arrival contract: event-time order across batches
  // (the Holt/B147 contract); inside a slice the handler sorts.

  /** Linear pattern: steps of (letter, isStar). "vc*p" ⇒
    * [(v,false),(c,true),(p,false)]. Letters must be pairwise distinct. */
  private[streaming] def compileLinear(pattern: String): Array[(Char, Boolean)] = {
    val steps = scala.collection.mutable.ArrayBuffer.empty[(Char, Boolean)]
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      require(c.isLetter, s"unsupported pattern char: $c")
      val star = i + 1 < pattern.length && pattern.charAt(i + 1) == '*'
      steps += ((c, star))
      i += (if (star) 2 else 1)
    }
    require(steps.map(_._1).distinct.size == steps.size,
      "streaming matcher requires pairwise-distinct step letters")
    steps.toArray
  }

  /** Input (user, us, event_id, ch); output running (user, seq_len,
    * n_matches) after each slice. */
  class SeqMatchProcessor(pattern: String)
      extends StatefulProcessor[Long, (Long, Long, Long, String), (Long, Long, Long)] {
    private val steps = compileLinear(pattern)
    require(!steps.head._2 && !steps.last._2,
      "pattern must start and end with a literal step")
    @transient private var st: ValueState[(Int, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Int, Long, Long)]("seq_match",
        Encoders.product[(Int, Long, Long)], TTLConfig.NONE)

    /** One char through the machine at `pos`; returns (newPos, matched). */
    private def step(pos: Int, c: Char): (Int, Boolean) = {
      // skip star steps whose letter is not c (they match empty here)
      var i = pos
      while (i < steps.length && steps(i)._2 && steps(i)._1 != c) i += 1
      if (i < steps.length && steps(i)._1 == c) {
        if (steps(i)._2) (i, false) // star absorbs c, stays hungry
        else if (i + 1 == steps.length) (0, true) // final literal: match
        else (i + 1, false)
      } else {
        // attempt failed: with pairwise-distinct letters the only viable
        // restart is at step 0 (a literal, asserted)
        if (c == steps(0)._1) {
          if (steps.length == 1) (0, true) else (1, false)
        } else (0, false)
      }
    }

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Long, String)],
        tv: TimerValues): Iterator[(Long, Long, Long)] = {
      var (pos, matches, len) =
        if (st.exists()) st.get() else (0, 0L, 0L)
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, s) =>
        len += 1
        val (p2, hit) = step(pos, s.charAt(0))
        pos = p2
        if (hit) matches += 1
      }
      st.update((pos, matches, len))
      Iterator.single((user, len, matches))
    }
  }

  /** Running leftmost non-overlapping `pattern` matches per user over a
    * streaming events frame (type's first letter, the q173 encoding).
    * RocksDB required. */
  def sequenceMatchStream(events: DataFrame, pattern: String)
      : Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), substring(col("event_type"), 1, 1))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new SeqMatchProcessor(pattern),
        TimeMode.None(), OutputMode.Update())
  }
}
