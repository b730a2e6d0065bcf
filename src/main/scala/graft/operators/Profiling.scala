package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-management operators: single-pass column profiling and an ORC
  * round-trip through a lang-partitioned layout (SURVEY.md §2 B1/B2
  * source-surface extensions — the engine reads parquet, CSV, JSONL, xlsx,
  * and ORC).
  */
object Profiling {

  // ==== q69: column profiling =============================================
  //
  // Per-column row/null/distinct counts and min/max, computed in ONE scan:
  // all 24 aggregates run in a single agg (Spark plans the multi-distinct
  // via Expand), then the one result row unpivots to a row per column.
  // The alternative — a scan per column — reads the table C times at
  // 100 TB. Renders: doubles as decimal(38,4) strings, timestamps as UTC
  // seconds, everything else via plain string cast.

  def profileOrders(orders: DataFrame): DataFrame = {
    def metrics(c: String, repr: Column => Column) = Seq(
      count(col(c)).as(s"${c}_nn"),
      countDistinct(col(c)).as(s"${c}_nd"),
      repr(min(col(c))).as(s"${c}_min"),
      repr(max(col(c))).as(s"${c}_max"))
    val str = (c: Column) => c.cast("string")
    val agg = orders.agg(
      count(lit(1)).as("n_rows"),
      metrics("o_orderkey", str) ++ metrics("o_custkey", str) ++
        metrics("o_orderstatus", str) ++
        metrics("o_totalprice", QueryDef.dec4) ++
        metrics("o_orderdate", QueryDef.tsSec) ++
        metrics("o_orderpriority", str): _*)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    agg.select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("n_rows"),
        (col("n_rows") - col(s"${c}_nn")).as("n_null"),
        col(s"${c}_nd").as("n_distinct"),
        col(s"${c}_min").as("min_repr"),
        col(s"${c}_max").as("max_repr"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column_name"))
  }

  private def q69(s: SparkSession, dir: String): DataFrame =
    profileOrders(Tables.orders(s, dir))

  private val q69Sql = {
    def block(c: String, repr: String => String) =
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  ${repr(s"min($c)")} AS min_repr, ${repr(s"max($c)")} AS max_repr
         |FROM orders""".stripMargin
    val str = (e: String) => s"CAST($e AS VARCHAR)"
    val dec = (e: String) => s"CAST(CAST($e AS DECIMAL(38,4)) AS VARCHAR)"
    val ts = (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S')"
    Seq(block("o_orderkey", str), block("o_custkey", str),
      block("o_orderstatus", str), block("o_totalprice", dec),
      block("o_orderdate", ts), block("o_orderpriority", str))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  // ==== q68: ORC round-trip through a partitioned layout ==================
  //
  // Write documents as ORC partitioned by lang, read the layout back with a
  // partition filter, and aggregate — proves the ORC source/sink preserves
  // values and that the partitioned layout prunes (OrcSpec asserts
  // PartitionFilters on the read plan). At 100 TB this is the standard
  // hive-style layout; the pruned read touches only the selected lang
  // directories.

  /** Write `docs` lang-partitioned as ORC under `out`, read it back. */
  def orcRoundTrip(docs: DataFrame, out: String): DataFrame = {
    docs.write.mode("overwrite").partitionBy("lang").orc(out)
    docs.sparkSession.read.orc(out)
  }

  private def q68(s: SparkSession, dir: String): DataFrame = {
    // fixed, overwritten path: repeated Verify/Bench runs rewrite the same
    // directory instead of accumulating full-corpus ORC copies under /tmp
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_orc_roundtrip").toString
    orcRoundTrip(
      Tables.documents(s, dir).select(col("doc_id"), col("source"),
        col("n_chars"), col("lang")), out)
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("doc_id")).as("n_ids"))
      .orderBy(col("source"))
  }

  private val q68Sql =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  count(DISTINCT doc_id) AS n_ids
      |FROM documents WHERE lang = 'en'
      |GROUP BY source ORDER BY source""".stripMargin

  // ==== q113: equi-depth histogram (optimizer-stats-style profiling) ========
  //
  // Boundaries from the exact interpolated percentile aggregate (q44
  // established percentile/quantile_cont cross-engine parity), broadcast
  // back as one scalar row; bucket assignment and counting are then one
  // map-side scan — no global sort, no ntile window (ntile needs a
  // single-partition total order, the profiling anti-pattern at scale).
  // Bucket membership compares on dec4-rounded boundaries so a 1-ulp
  // interpolation difference cannot flip a row at a bucket edge.

  private val HistBuckets = 8

  /** Exact interpolated quantiles (quantile_cont semantics: position
    * f·(n−1), linear interpolation) computed DISTRIBUTED: range-sort the
    * column, number rows with the exclusive prefix scan, select only the
    * floor/ceil order statistics each fraction needs, interpolate from
    * those ≤2·|fractions| rows. Spark's `percentile` aggregate funnels a
    * value-count map of the whole column through one combiner — fine at
    * test scale, a driver-sized bottleneck at 100 TB; this path keeps the
    * heavy phase (the sort) fully parallel. Ties make rank assignment
    * among equal values ambiguous and equally correct: only the VALUE at
    * a rank is consumed. */
  def exactQuantiles(df: DataFrame, colName: String,
      fractions: Seq[Double]): Seq[Double] = {
    val v = df.select(col(colName).cast("double").as("v")).filter(col("v").isNotNull)
    val n = v.count()
    require(n > 0, s"exactQuantiles($colName): empty input")
    val positions = fractions.map(_ * (n - 1))
    val needed = positions.flatMap(p =>
      Seq(math.floor(p).toLong, math.ceil(p).toLong)).distinct
    val ranked = graft.chunk.ChunkAssigner.withPrefixSum(
      v, Seq(col("v")), lit(1L), outName = "rank")
    val at = ranked.filter(col("rank").isin(needed: _*))
      .select(col("rank"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    positions.map { p =>
      val lo = math.floor(p).toLong; val hi = math.ceil(p).toLong
      if (lo == hi) at(lo) else at(lo) + (at(hi) - at(lo)) * (p - lo)
    }
  }

  def equiDepthHistogram(df: DataFrame, colName: String, buckets: Int): DataFrame = {
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val spark = df.sparkSession
    import spark.implicits._
    val bounds = Seq(Tuple1(exactQuantiles(df, colName, ps))).toDF("bs")
    val rounded = bounds.select(transform(col("bs"),
      b => round(b, 4)).as("bs"))
    df.select(col(colName).as("v")).crossJoin(broadcast(rounded))
      // bucket = #boundaries strictly below the (rounded) value
      .select((aggregate(col("bs"), lit(0),
        (acc, b) => acc + when(round(col("v"), 4) > b, 1).otherwise(0)))
        .as("bucket"), col("v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        QueryDef.dec4(min(col("v"))).as("lo"),
        QueryDef.dec4(max(col("v"))).as("hi"))
      .orderBy(col("bucket"))
  }

  private def q113(s: SparkSession, dir: String): DataFrame =
    equiDepthHistogram(Tables.lineitem(s, dir), "l_extendedprice",
      HistBuckets)

  private val q113Sql =
    """WITH b AS (
      |  SELECT list_transform(quantile_cont(l_extendedprice,
      |    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]),
      |    x -> round(x, 4)) AS bs
      |  FROM lineitem),
      |assigned AS (
      |  SELECT len(list_filter(bs, x -> round(l_extendedprice, 4) > x))
      |    AS bucket, l_extendedprice AS v
      |  FROM lineitem CROSS JOIN b)
      |SELECT bucket, count(*) AS n,
      |  CAST(CAST(min(v) AS DECIMAL(38,4)) AS VARCHAR) AS lo,
      |  CAST(CAST(max(v) AS DECIMAL(38,4)) AS VARCHAR) AS hi
      |FROM assigned GROUP BY bucket ORDER BY bucket""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q68_orc_roundtrip", q68, Some(q68Sql)),
    QueryDef("q69_profile", q69, Some(q69Sql)),
    QueryDef("q113_equidepth_histogram", q113, Some(q113Sql)))
}
