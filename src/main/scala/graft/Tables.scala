package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All tables are read straight from parquet so Catalyst keeps full
  * pushdown/pruning ability (`PushedFilters`, `ReadSchema` reach the scan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Read nanos as long and truncate to micros — the same
    * coercion DuckDB applies (TIMESTAMP_NS → TIMESTAMP). One shared helper
    * (also used by the streaming reader) so the session-wide legacy flag is
    * flipped in exactly one documented place. */
  def enableNanosAsLong(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) files: read as TIMESTAMP_LTZ
    // directly instead of TIMESTAMP_NTZ. The session TZ is pinned UTC, so
    // values are bit-identical — and it removes a per-row NTZ→LTZ Cast
    // projection from every event-time plan (~30% off a windowed-agg scan,
    // measured at sf0.1; the scan stays vectorized either way).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  /** nanos-long `ts` → microsecond timestamp. A `ts` that is already a
    * timestamp (e.g. tooling-rewritten parquet with TIMESTAMP(MICROS))
    * passes through unchanged. */
  def nanosToMicros(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // session TZ is pinned UTC, so NTZ→LTZ is value-preserving; the
        // event-time functions (unix_micros, windows) require TIMESTAMP
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame = {
    enableNanosAsLong(spark)
    nanosToMicros(table(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
