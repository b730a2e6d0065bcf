package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
