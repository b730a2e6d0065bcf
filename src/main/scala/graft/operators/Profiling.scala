package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-management operators: single-pass column profiling and an ORC
  * round-trip through a lang-partitioned layout (SURVEY.md §2 B1/B2
  * source-surface extensions — the engine reads parquet, CSV, JSONL, xlsx,
  * and ORC).
  */
object Profiling {

  // ==== q69: column profiling =============================================
  //
  // Per-column row/null/distinct counts and min/max. Two passes over ONE
  // scan shape, never an Expand: (1) every NON-distinct aggregate (count/
  // min/max per column) runs in a single agg — Spark plans that as one
  // hash aggregate, and (2) the six exact distinct counts come from an
  // explicit unpivot (Generate of narrow (column_name, value) structs)
  // into a single-distinct groupBy, which Spark plans as a two-level
  // partial-distinct aggregate with NO Expand. Mixing six countDistinct
  // into one agg instead makes Catalyst Expand the full table 6× carrying
  // all 24 buffers — the Distinct-Expand pathology (6× shuffle IO at
  // 100 TB). Cast-to-string for distinct counting is injective per
  // column type here (int/decimal/date/string), so the counts are exact.
  // Renders: doubles as decimal(38,4) strings, timestamps as UTC seconds,
  // everything else via plain string cast.

  def profileOrders(orders: DataFrame): DataFrame = {
    val str = (c: Column) => c.cast("string")
    val reprOf: Map[String, Column => Column] = Map(
      "o_totalprice" -> (QueryDef.dec4(_)),
      "o_orderdate" -> (QueryDef.tsSec(_))).withDefaultValue(str)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val agg = orders.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}_nn"),
        reprOf(c)(min(col(c))).as(s"${c}_min"),
        reprOf(c)(max(col(c))).as(s"${c}_max"))): _*)
    val base = agg.select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("n_rows"),
        (col("n_rows") - col(s"${c}_nn")).as("n_null"),
        col(s"${c}_min").as("min_repr"),
        col(s"${c}_max").as("max_repr"))): _*)).as("p"))
      .select(col("p.*"))
    val nd = orders.select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"), col(c).cast("string").as("v"))): _*))
        .as("p"))
      .select(col("p.*"))
      .groupBy(col("column_name"))
      .agg(countDistinct(col("v")).as("n_distinct"))
    base.join(nd, Seq("column_name"))
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_repr"), col("max_repr"))
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

  // ==== q117: data-quality constraint report ================================
  //
  // Deequ-style constraint suite: uniqueness, accepted-values, range,
  // completeness, cross-column consistency, and referential integrity, each
  // reported as (check_name, violations, passed). Checks sharing a table are
  // FUSED into one aggregate pass and unpivoted with stack() — the naive
  // scan-per-check reads each table C times at 100 TB. The referential check
  // is the one extra job: a left-anti join shuffling on the key (no
  // broadcast assumption — both sides can be huge).

  /** One row per constraint check: (check_name, violations, passed). */
  def qualityReport(orders: DataFrame, customer: DataFrame,
      lineitem: DataFrame, documents: DataFrame): DataFrame = {
    val ordersChecks = orders.agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("uniq_viol"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0))
          .as("status_viol"))
      .select(expr(
        """stack(2,
          |  'orders.o_orderkey is unique', uniq_viol,
          |  'orders.o_orderstatus in (O,F,P)', status_viol)
          |  AS (check_name, violations)""".stripMargin))
    val lineitemChecks = lineitem.agg(
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1)
          .otherwise(0)).as("disc_viol"),
        sum(when(col("l_quantity") > 45, 1).otherwise(0)).as("qty_viol"))
      .select(expr(
        """stack(2,
          |  'lineitem.l_discount in [0, 0.1]', disc_viol,
          |  'lineitem.l_quantity <= 45', qty_viol)
          |  AS (check_name, violations)""".stripMargin))
    val customerChecks = customer
      .agg((count(lit(1)) - count(col("c_name"))).as("v"))
      .select(lit("customer.c_name is complete").as("check_name"),
        col("v").as("violations"))
    val docChecks = documents
      .agg(sum(when(col("n_chars") =!= length(col("text")), 1).otherwise(0))
        .as("v"))
      .select(lit("documents.n_chars = length(text)").as("check_name"),
        col("v").as("violations"))
    val refChecks = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .select(lit("orders.o_custkey references customer").as("check_name"),
        col("v").as("violations"))
    ordersChecks.union(lineitemChecks).union(customerChecks)
      .union(docChecks).union(refChecks)
      .withColumn("passed", (col("violations") === 0).cast("int"))
  }

  private def q117(s: SparkSession, dir: String): DataFrame =
    qualityReport(Tables.orders(s, dir), Tables.customer(s, dir),
      Tables.lineitem(s, dir), Tables.documents(s, dir))
      .orderBy(col("check_name"))

  private val q117Sql =
    """SELECT check_name, violations, CAST(violations = 0 AS INT) AS passed
      |FROM (
      |  SELECT 'orders.o_orderkey is unique' AS check_name,
      |    count(*) - count(DISTINCT o_orderkey) AS violations FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_orderstatus in (O,F,P)',
      |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
      |      THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem.l_discount in [0, 0.1]',
      |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
      |      THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem.l_quantity <= 45',
      |    CAST(sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'customer.c_name is complete',
      |    count(*) - count(c_name) FROM customer
      |  UNION ALL
      |  SELECT 'documents.n_chars = length(text)',
      |    CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
      |      AS BIGINT)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'orders.o_custkey references customer',
      |    count(*) FROM orders o WHERE NOT EXISTS (
      |      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |ORDER BY check_name""".stripMargin

  // ==== q118: robust outlier detection (median/MAD) =========================
  //
  // Per-group robust center and spread — median and MAD (median absolute
  // deviation), the outlier-resistant alternative to mean/stddev — then
  // count the values outside center ± 3·1.4826·MAD (1.4826 scales MAD to
  // σ-equivalence under normality). Two grouped percentile passes with the
  // tiny per-group stats broadcast back between them; the group count is
  // bounded (event types), so per-group percentile state stays parallel
  // across groups — a single hot group at 100 TB would swap in
  // exactQuantiles (q113) per group, same semantics.

  /** (group, median, mad, n_outliers, n_total) per event_type. */
  def madOutliers(events: DataFrame, k: Double = 3.0): DataFrame = {
    val med = events.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withMed = events.join(broadcast(med), Seq("event_type"))
    val mad = withMed.groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(abs(col("value") - col("med")) >
          lit(k) * lit(1.4826) * col("mad"), 1).otherwise(0)).as("n_outliers"),
        count(lit(1)).as("n_total"))
  }

  private def q118(s: SparkSession, dir: String): DataFrame =
    madOutliers(Tables.events(s, dir))
      .select(col("event_type"), QueryDef.dec4(col("med")).as("med"),
        QueryDef.dec4(col("mad")).as("mad"),
        col("n_outliers"), col("n_total"))
      .orderBy(col("event_type"))

  private val q118Sql =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1),
      |wm AS (SELECT e.event_type, e.value, m.med
      |  FROM events e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
      |  FROM wm GROUP BY 1)
      |SELECT event_type,
      |  CAST(CAST(max(med) AS DECIMAL(38,4)) AS VARCHAR) AS med,
      |  CAST(CAST(max(mad) AS DECIMAL(38,4)) AS VARCHAR) AS mad,
      |  CAST(sum(CASE WHEN abs(value - med) > 3.0 * 1.4826 * mad
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  count(*) AS n_total
      |FROM wm JOIN mad USING (event_type)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ==== q122: global rank-transform normalization ===========================
  //
  // percent_rank over the WHOLE table — the rank/quantile feature transform
  // — without the single-partition `Window.orderBy(col)` that serializes
  // 100 TB through one task. Pipeline: per-value counts (map-side combine),
  // the exclusive prefix scan over the range-partitioned DISTINCT-value
  // histogram (so the sort touches |distinct| rows, not |rows|), then one
  // hash join assigns #smaller back to the data. pr = smaller/(n−1) divides
  // the same integers on both engines — bit-identical doubles.

  /** Adds `pct_rank` (= percent_rank of `valueCol`, ties share the rank of
    * their first occurrence) to `df` without a global-sort window. */
  def rankNormalize(df: DataFrame, valueCol: String): DataFrame = {
    val counts = df.groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
    val ranked = graft.chunk.ChunkAssigner.withPrefixSum(
      counts, Seq(col(valueCol)), col("__c"), outName = "__smaller")
    val total = ranked.agg(sum(col("__c")).as("__n"))
    df.join(ranked, Seq(valueCol))
      .crossJoin(broadcast(total))
      .withColumn("pct_rank",
        col("__smaller").cast("double") / (col("__n") - 1).cast("double"))
      .drop("__c", "__smaller", "__n")
  }

  // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so the
  // output order includes pct_rank — rows tying on all three are identical,
  // making the differential order-stable.
  private def q122(s: SparkSession, dir: String): DataFrame =
    rankNormalize(Tables.lineitem(s, dir), "l_extendedprice")
      .select(col("l_orderkey"), col("l_linenumber"),
        QueryDef.dec4(col("pct_rank")).as("pct_rank"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("pct_rank"))

  private val q122Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(percent_rank() OVER (ORDER BY l_extendedprice)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS pct_rank
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, pct_rank""".stripMargin

  // ==== q130: percentile winsorization ======================================
  //
  // Clamp a column to its [p05, p95] — the standard heavy-tail taming
  // before feature scaling. Boundaries come from the DISTRIBUTED exact
  // quantile path (q113's machinery: range-sort + prefix scan, no
  // single-combiner percentile state) and broadcast as scalars; the clamp
  // is one map-side pass. Boundaries are dec4-rounded before comparing —
  // interpolated quantiles land on the 0.0005 grid (2-decimal data ×
  // 0.05-step fractions), which round(·,4) maps to itself, so a 1-ulp
  // cross-engine quantile difference cannot flip a clamp decision.

  /** (n, n_clamped_lo, n_clamped_hi, sum_winsorized, lo, hi) after
    * clamping `colName` to its [pLo, pHi] quantiles. */
  def winsorize(df: DataFrame, colName: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val Seq(lo, hi) = exactQuantiles(df, colName, Seq(pLo, pHi))
    val spark = df.sparkSession
    import spark.implicits._
    val bounds = broadcast(Seq((math.rint(lo * 10000) / 10000,
      math.rint(hi * 10000) / 10000)).toDF("lo", "hi"))
    df.select(col(colName).as("v")).crossJoin(bounds)
      .select(col("v"), col("lo"), col("hi"),
        // the corpus-wide sum runs in EXACT decimal: a double sum of 10⁶⁺
        // money values carries summation-order noise above dec4 resolution
        // (observed 0.007 on a 3·10¹¹ sum at sf1)
        greatest(least(col("v"), col("hi")), col("lo"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 4)).as("w"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("lo"), 1).otherwise(0)).as("n_clamped_lo"),
        sum(when(col("v") > col("hi"), 1).otherwise(0)).as("n_clamped_hi"),
        sum(col("w")).as("sum_winsorized"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"))
  }

  private def q130(s: SparkSession, dir: String): DataFrame =
    winsorize(Tables.lineitem(s, dir), "l_extendedprice")
      .select(col("n"), col("n_clamped_lo"), col("n_clamped_hi"),
        QueryDef.dec4(col("sum_winsorized")).as("sum_winsorized"),
        QueryDef.dec4(col("lo")).as("lo"), QueryDef.dec4(col("hi")).as("hi"))

  private val q130Sql =
    """WITH b AS (
      |  SELECT round(quantile_cont(l_extendedprice, 0.05), 4) AS lo,
      |    round(quantile_cont(l_extendedprice, 0.95), 4) AS hi
      |  FROM lineitem)
      |SELECT count(*) AS n,
      |  CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_clamped_lo,
      |  CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_clamped_hi,
      |  CAST(CAST(sum(CAST(greatest(least(l_extendedprice, hi), lo)
      |    AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_winsorized,
      |  CAST(CAST(max(lo) AS DECIMAL(38,4)) AS VARCHAR) AS lo,
      |  CAST(CAST(max(hi) AS DECIMAL(38,4)) AS VARCHAR) AS hi
      |FROM lineitem CROSS JOIN b""".stripMargin

  // ==== q131: two-sample Kolmogorov–Smirnov drift statistic =================
  //
  // KS = max |CDF_a − CDF_b| between two slices of a metric — the
  // distribution-shift monitor between data batches. Exact and
  // distributed: per-value counts for both sides in ONE groupBy (map-side
  // combined), then the exclusive prefix scan over the range-partitioned
  // DISTINCT-value histogram (q122's machinery) gives both running CDFs;
  // no global sort of raw rows, no window over the full table. The CDF
  // divisions are integer/integer on both engines — bit-identical, so the
  // max picks the same value everywhere.

  /** One row: (ks, n_a, n_b) for `colName` split by boolean `sideCol`. */
  def ksDrift(df: DataFrame, colName: String, sideA: Column): DataFrame = {
    val counts = df
      .select(col(colName).as("v"), when(sideA, 1L).otherwise(0L).as("a"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val withA = graft.chunk.ChunkAssigner.withPrefixSum(
      counts, Seq(col("v")), col("ca"), outName = "pa")
    val withB = graft.chunk.ChunkAssigner.withPrefixSum(
      withA, Seq(col("v")), col("cb"), outName = "pb")
    val totals = broadcast(counts.agg(sum(col("ca")).as("na"),
      sum(col("cb")).as("nb")))
    withB.crossJoin(totals)
      .select(abs((col("pa") + col("ca")).cast("double") / col("na").cast("double") -
        (col("pb") + col("cb")).cast("double") / col("nb").cast("double"))
        .as("d"), col("na"), col("nb"))
      .groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(max(col("d")).as("ks"))
      .select(col("ks"), col("n_a"), col("n_b"))
  }

  private def q131(s: SparkSession, dir: String): DataFrame =
    ksDrift(Tables.events(s, dir), "value", col("event_id") % 2 === 0)
      .select(QueryDef.dec4(col("ks")).as("ks"), col("n_a"), col("n_b"))

  private val q131Sql =
    """WITH counts AS (
      |  SELECT value AS v,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |      AS cb
      |  FROM events GROUP BY 1),
      |cdf AS (
      |  SELECT v, ca, cb,
      |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cuma,
      |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cumb
      |  FROM counts),
      |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM counts)
      |SELECT CAST(CAST(max(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE) -
      |    CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))) AS DECIMAL(38,4))
      |    AS VARCHAR) AS ks,
      |  CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b
      |FROM cdf CROSS JOIN t""".stripMargin

  // ==== q144: grouped ordinary least squares (exact integer moments) ========
  //
  // Per-group linear fit y ~ a·x + b with slope/intercept/R² — the
  // drift-vs-covariate profiling primitive (e.g. does doc length predict
  // vocabulary richness differently per source?). Scale shape: ONE
  // map-side-combined groupBy accumulates the five integer moments
  // (Σx, Σy, Σxy, Σx², Σy²) — constant state per group, no second pass,
  // no windows. Exactness: x and y are INTEGERS, so every moment is an
  // exact BIGINT; the closed-form numerators/denominators are computed in
  // BIGINT and only the final divisions happen in double — both engines
  // divide identical integers (R² squares the long-valued numerator in
  // double: same input bits, same IEEE result).

  /** Per-`group` OLS of integer columns `y` on `x`: slope, intercept, R².
    * Degenerate groups (zero x-variance) report nulls. */
  def groupedOls(df: DataFrame, group: String, x: String, y: String): DataFrame = {
    val m = df.groupBy(col(group)).agg(
      count(lit(1)).as("n"),
      sum(col(x).cast("long")).as("sx"),
      sum(col(y).cast("long")).as("sy"),
      sum(col(x).cast("long") * col(y).cast("long")).as("sxy"),
      sum(col(x).cast("long") * col(x).cast("long")).as("sxx"),
      sum(col(y).cast("long") * col(y).cast("long")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denX = col("n") * col("sxx") - col("sx") * col("sx")
    val denY = col("n") * col("syy") - col("sy") * col("sy")
    m.select(col(group), col("n"),
      when(denX =!= 0, num.cast("double") / denX.cast("double")).as("slope"),
      when(denX =!= 0,
        (col("sy").cast("double") - (num.cast("double") / denX.cast("double"))
          * col("sx").cast("double")) / col("n").cast("double")).as("intercept"),
      when(denX =!= 0 && denY =!= 0,
        (num.cast("double") * num.cast("double")) /
          (denX.cast("double") * denY.cast("double"))).as("r2"))
  }

  // x = token occurrences, y = distinct tokens per doc — integer by
  // construction, and the relationship genuinely differs by source
  private def q144(s: SparkSession, dir: String): DataFrame =
    groupedOls(
      Tables.documents(s, dir).select(col("source"),
        size(Tok.ws(col("text"))).as("x"),
        size(array_distinct(Tok.ws(col("text")))).as("y")),
      "source", "x", "y")
      .select(col("source"), col("n"), QueryDef.dec4(col("slope")).as("slope"),
        QueryDef.dec4(col("intercept")).as("intercept"),
        QueryDef.dec4(col("r2")).as("r2"))
      .orderBy(col("source"))

  private val q144Sql =
    """WITH d AS (
      |  SELECT source,
      |    len(list_filter(string_split(text, ' '), e -> e <> '')) AS x,
      |    len(list_distinct(list_filter(string_split(text, ' '), e -> e <> '')))
      |      AS y
      |  FROM documents),
      |m AS (
      |  SELECT source, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM d GROUP BY 1),
      |c AS (
      |  SELECT source, n,
      |    n * sxy - sx * sy AS num, n * sxx - sx * sx AS denx,
      |    n * syy - sy * sy AS deny, sx, sy
      |  FROM m)
      |SELECT source, n,
      |  CAST(CAST(CASE WHEN denx <> 0 THEN
      |    CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS slope,
      |  CAST(CAST(CASE WHEN denx <> 0 THEN
      |    (CAST(sy AS DOUBLE) - (CAST(num AS DOUBLE) / CAST(denx AS DOUBLE))
      |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS intercept,
      |  CAST(CAST(CASE WHEN denx <> 0 AND deny <> 0 THEN
      |    (CAST(num AS DOUBLE) * CAST(num AS DOUBLE)) /
      |      (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS r2
      |FROM c ORDER BY source""".stripMargin

  // ==== q158: group-wise exact weighted median ==============================
  //
  // The engine's quantile tier (q44/q113/q130) is unweighted; mixture and
  // budget decisions need the WEIGHTED middle ("the doc length at which
  // half the corpus TOKENS sit below"). Lower weighted median with an
  // integer rule: the smallest value whose doubled cumulative weight
  // reaches the group total — no halves, no interpolation, deterministic
  // on both engines. One map-side-combined (group, value) weight
  // histogram; the cumulative window orders only that histogram (the
  // q140 discipline), then one argmin per group.

  /** Per-`group` lower weighted median of `value` under integer `weight`. */
  def weightedMedian(df: DataFrame, group: String, value: String,
      weight: String): DataFrame = {
    val hist = df.groupBy(col(group), col(value).as("v"))
      .agg(sum(col(weight).cast("long")).as("w"))
    val win = Window.partitionBy(col(group)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum(col("w")).over(win))
      .withColumn("tot", sum(col("w")).over(Window.partitionBy(col(group))))
      .filter(lit(2) * col("cum") >= col("tot"))
      .groupBy(col(group))
      .agg(min(col("v")).as("w_median"), max(col("tot")).as("total_weight"))
  }

  // weighted by token count: "the doc length at which half the corpus
  // tokens sit below", per language
  private def q158(s: SparkSession, dir: String): DataFrame =
    weightedMedian(
      Tables.documents(s, dir).select(col("lang"), col("n_chars"),
        size(Tok.ws(col("text"))).as("w")),
      "lang", "n_chars", "w")
      .orderBy(col("lang"))

  private val q158Sql =
    """WITH d AS (
      |  SELECT lang, n_chars AS v,
      |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |  FROM documents),
      |hist AS (
      |  SELECT lang, v, CAST(sum(w) AS BIGINT) AS w FROM d GROUP BY 1, 2),
      |c AS (
      |  SELECT lang, v, w,
      |    CAST(sum(w) OVER (PARTITION BY lang ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(w) OVER (PARTITION BY lang) AS BIGINT) AS tot
      |  FROM hist)
      |SELECT lang, min(v) AS w_median, max(tot) AS total_weight
      |FROM c WHERE 2 * cum >= tot GROUP BY lang ORDER BY lang""".stripMargin

  // ==== q160: Benford first-digit conformance ===============================
  //
  // The classic fabricated-data tripwire: organically-grown monetary
  // amounts follow Benford's law (P(d) = log10(1 + 1/d)); synthetic or
  // tampered columns don't. One map-side digit extraction + a 9-row
  // groupBy, then chi-square against the Benford expectation. Cross-
  // engine exactness: the nine Benford probabilities are PRECOMPUTED in
  // Scala and embedded as identical literals in the oracle (the DCG-
  // weight trick) — no cross-engine log10 ever runs; the chi-square sums
  // nine identically-computed doubles in fixed digit order.

  private[operators] val BenfordP: Seq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Per-digit observed/expected counts + the chi-square statistic of
    * `colName`'s first significant digits (zeros/nulls excluded). */
  def benford(df: DataFrame, colName: String): DataFrame = {
    val digits = df
      .select(substring(regexp_replace(abs(col(colName)).cast("string"),
        "[^1-9]", ""), 1, 1).as("d"))
      .filter(col("d") =!= "")
      .groupBy(col("d")).agg(count(lit(1)).as("obs"))
    val tot = broadcast(digits.agg(sum(col("obs")).as("n")))
    val expCase = BenfordP.zipWithIndex.tail.foldLeft(
      when(col("d") === "1", lit(BenfordP.head))) {
      case (acc, (pv, i)) => acc.when(col("d") === (i + 1).toString, lit(pv))
    }
    val withExp = digits.crossJoin(tot)
      .withColumn("expected", expCase * col("n").cast("double"))
      .withColumn("chi_term",
        (col("obs").cast("double") - col("expected")) *
          (col("obs").cast("double") - col("expected")) / col("expected"))
    withExp.select(
      sort_array(collect_list(struct(col("d"), col("obs"),
        col("expected"), col("chi_term")))).as("rows"))
      .select(explode(col("rows")).as("r"),
        aggregate(col("rows"), lit(0.0), (a, x) => a + x.getField("chi_term"))
          .as("chi2"))
      .select(col("r.d").as("digit"), col("r.obs").as("obs"),
        QueryDef.dec4(col("r.expected")).as("expected"),
        QueryDef.dec4(col("chi2")).as("chi2"))
  }

  private def q160(s: SparkSession, dir: String): DataFrame =
    benford(Tables.orders(s, dir), "o_totalprice")
      .orderBy(col("digit"))

  private val q160Sql = {
    val pCase = BenfordP.zipWithIndex
      .map { case (pv, i) => s"WHEN d = '${i + 1}' THEN $pv" }.mkString(" ")
    s"""WITH digits AS (
       |  SELECT d, count(*) AS obs FROM (
       |    SELECT substr(regexp_replace(CAST(abs(o_totalprice) AS VARCHAR),
       |      '[^1-9]', '', 'g'), 1, 1) AS d
       |    FROM orders)
       |  WHERE d <> '' GROUP BY 1),
       |tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM digits),
       |terms AS (
       |  SELECT d, obs,
       |    (CASE $pCase END) * CAST(n AS DOUBLE) AS expected,
       |    (CAST(obs AS DOUBLE) - (CASE $pCase END) * CAST(n AS DOUBLE)) *
       |    (CAST(obs AS DOUBLE) - (CASE $pCase END) * CAST(n AS DOUBLE)) /
       |      ((CASE $pCase END) * CAST(n AS DOUBLE)) AS chi_term
       |  FROM digits CROSS JOIN tot),
       |chi AS (
       |  SELECT list_aggregate(list(chi_term ORDER BY d), 'sum') AS chi2
       |  FROM terms)
       |SELECT d AS digit, obs,
       |  CAST(CAST(expected AS DECIMAL(38,4)) AS VARCHAR) AS expected,
       |  CAST(CAST(chi2 AS DECIMAL(38,4)) AS VARCHAR) AS chi2
       |FROM terms CROSS JOIN chi ORDER BY digit""".stripMargin
  }

  // ==== q161: exact total-variation distance between slices =================
  //
  // TV = ½·Σ_v |p_a(v) − p_b(v)| — the L1 member of the drift family
  // (q131 KS = sup-norm, q155 PSI = log-weighted). EXACT in integers:
  // over the common denominator n_a·n_b, TV = Σ|c_b·n_a − c_a·n_b| /
  // (2·n_a·n_b) — one BIGINT absolute-difference sum over the distinct-
  // value histogram, divided once. One dual-count groupBy; no windows,
  // no sort.

  /** One-row exact TV distance of `colName` between sideA and the rest. */
  def totalVariation(df: DataFrame, colName: String, sideA: Column): DataFrame = {
    val counts = df
      .select(col(colName).as("v"), when(sideA, 1L).otherwise(0L).as("a"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val tot = broadcast(counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb")))
    counts.crossJoin(tot)
      .agg(sum(abs(col("cb") * col("na") - col("ca") * col("nb"))).as("num"),
        max(col("na")).as("na"), max(col("nb")).as("nb"))
      .select(col("na"), col("nb"),
        QueryDef.dec4(col("num").cast("double") /
          (lit(2.0) * col("na").cast("double") * col("nb").cast("double")))
          .as("tv"))
  }

  private def q161(s: SparkSession, dir: String): DataFrame =
    totalVariation(Tables.events(s, dir), "value", col("event_id") % 2 === 0)

  private val q161Sql =
    """WITH counts AS (
      |  SELECT value AS v,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM events GROUP BY 1),
      |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |  CAST(sum(cb) AS BIGINT) AS nb FROM counts)
      |SELECT na, nb,
      |  CAST(CAST(CAST(sum(abs(cb * na - ca * nb)) AS DOUBLE) /
      |    (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS tv
      |FROM counts CROSS JOIN tot GROUP BY na, nb""".stripMargin

  // ==== q163: grouped higher moments (skewness, excess kurtosis) ============
  //
  // Completes the per-group moment family (q144 fits lines from the first
  // two moments; this reports the shape of the distribution itself).
  // Population skewness g1 = m3/m2^1.5 and excess kurtosis g2 = m4/m2²−3,
  // with the central moments expanded in RAW integer power sums:
  //   n²·m2 = n·S2 − S1²
  //   n³·m3 = n²·S3 − 3n·S1·S2 + 2·S1³
  //   n⁴·m4 = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3·S1⁴
  // One map-side-combined groupBy accumulates S1..S4 exactly; S2..S4 ride
  // DECIMAL (x as DECIMAL(9,0); x⁴ ≤ 1e36, sums to DECIMAL(38,0)) so a
  // 100 TB group CANNOT silently wrap a BIGINT fourth-power sum — Spark's
  // non-ANSI long sum wraps where DuckDB's HUGEINT doesn't, which would
  // diverge silently; decimal overflow instead surfaces as NULL/error on
  // both. Requires |x| < 1e9 (true for any char/token count). The
  // scale-free ratios then divide identically-computed doubles:
  //   g1 = n^... — computed as (n⁴m4-form)/(n²m2-form) powers so every
  // operand derives from the same exact integers on both engines.

  /** Per-`group` skewness and excess kurtosis of integer column `x`
    * (|x| < 1e9). Groups with zero variance report nulls. */
  def higherMoments(df: DataFrame, group: String, x: String): DataFrame = {
    val xl = col(x).cast("long")
    val xd = col(x).cast("decimal(9,0)")
    val m = df.groupBy(col(group)).agg(
      count(lit(1)).as("n"),
      sum(xl).as("s1"), sum(xd * xd).as("s2"),
      sum(xd * xd * xd).as("s3"), sum(xd * xd * xd * xd).as("s4"))
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double"); val s2 = col("s2").cast("double")
    val s3 = col("s3").cast("double"); val s4 = col("s4").cast("double")
    val m2n2 = n * s2 - s1 * s1                       // n²·m2
    val m3n3 = n * n * s3 - lit(3.0) * n * s1 * s2 + lit(2.0) * s1 * s1 * s1
    val m4n4 = n * n * n * s4 - lit(4.0) * n * n * s1 * s3 +
      lit(6.0) * n * s1 * s1 * s2 - lit(3.0) * s1 * s1 * s1 * s1
    // the n-powers cancel exactly: m3/m2^1.5 = m3n3/(m2n2)^1.5 and
    // m4/m2² = m4n4/(m2n2)²
    m.select(col(group), col("n"),
      when(m2n2 > 0, m3n3 / sqrt(m2n2 * m2n2 * m2n2)).as("skewness"),
      when(m2n2 > 0, m4n4 / (m2n2 * m2n2) - lit(3.0)).as("kurtosis_ex"))
  }

  private def q163(s: SparkSession, dir: String): DataFrame =
    higherMoments(Tables.documents(s, dir), "source", "n_chars")
      .select(col("source"), col("n"),
        QueryDef.dec4(col("skewness")).as("skewness"),
        QueryDef.dec4(col("kurtosis_ex")).as("kurtosis_ex"))
      .orderBy(col("source"))

  private val q163Sql =
    """WITH m AS (
      |  SELECT source, count(*) AS n,
      |    CAST(sum(n_chars) AS BIGINT) AS s1,
      |    sum(x * x) AS s2,
      |    sum(x * x * x) AS s3,
      |    sum(x * x * x * x) AS s4
      |  FROM (SELECT source, CAST(n_chars AS DECIMAL(9,0)) AS x, n_chars
      |        FROM documents) GROUP BY 1),
      |d AS (
      |  SELECT source, n,
      |    CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1,
      |    CAST(s2 AS DOUBLE) AS s2, CAST(s3 AS DOUBLE) AS s3,
      |    CAST(s4 AS DOUBLE) AS s4
      |  FROM m),
      |c AS (
      |  SELECT source, n,
      |    nd * s2 - s1 * s1 AS m2n2,
      |    nd * nd * s3 - 3.0 * nd * s1 * s2 + 2.0 * s1 * s1 * s1 AS m3n3,
      |    nd * nd * nd * s4 - 4.0 * nd * nd * s1 * s3 +
      |      6.0 * nd * s1 * s1 * s2 - 3.0 * s1 * s1 * s1 * s1 AS m4n4,
      |    nd
      |  FROM d)
      |SELECT source, n,
      |  CAST(CAST(CASE WHEN m2n2 > 0 THEN
      |    m3n3 / sqrt(m2n2 * m2n2 * m2n2) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS skewness,
      |  CAST(CAST(CASE WHEN m2n2 > 0 THEN
      |    m4n4 / (m2n2 * m2n2) - 3.0 END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS kurtosis_ex
      |FROM c ORDER BY source""".stripMargin

  // ==== q168: label indexing (categorical → dense id) =======================
  //
  // The StringIndexer step of every feature pipeline: map each categorical
  // label to a dense integer id, most-frequent-first (ids 0..k−1 in
  // (count desc, label asc) order — the ML convention, and a total order
  // so re-fitting on the same corpus is byte-stable). The rank comes from
  // the SAME distributed exclusive prefix scan as q122/q157 — counts are
  // label-domain-sized, no single-task window even at 10⁸ labels; the
  // transform side is then one broadcast hash join of the mapping onto
  // the data (see [[encodeLabels]]).

  /** Fit: (dim, label, cnt, id) for each categorical column in `dims`. */
  def labelIndex(df: DataFrame, dims: Seq[String]): DataFrame =
    dims.map { d =>
      val counts = df.groupBy(col(d).as("label"))
        .agg(count(lit(1)).as("cnt"))
      graft.chunk.ChunkAssigner.withPrefixSum(
          counts.withColumn("__one", lit(1L)),
          Seq(col("cnt").desc, col("label")), col("__one"), outName = "id")
        .select(lit(d).as("dim"), col("label"), col("cnt"), col("id"))
    }.reduce(_ unionByName _)

  /** Transform: adds `<dim>_idx` for each fitted dim (broadcast join —
    * the mapping is label-domain-sized). Unseen labels index NULL. */
  def encodeLabels(df: DataFrame, mapping: DataFrame): DataFrame = {
    val dims = mapping.select(col("dim")).distinct()
      .collect().map(_.getString(0)).sorted
    dims.foldLeft(df) { (acc, d) =>
      acc.join(broadcast(mapping.filter(col("dim") === d)
          .select(col("label").as(d), col("id").as(s"${d}_idx"))),
        Seq(d), "left")
    }
  }

  private def q168(s: SparkSession, dir: String): DataFrame =
    labelIndex(Tables.documents(s, dir), Seq("source", "lang"))
      .orderBy(col("dim"), col("id"))

  private val q168Sql =
    """SELECT dim, label, cnt, id FROM (
      |  SELECT 'source' AS dim, source AS label,
      |    CAST(count(*) AS BIGINT) AS cnt,
      |    row_number() OVER (ORDER BY count(*) DESC, source) - 1 AS id
      |  FROM documents GROUP BY source
      |  UNION ALL
      |  SELECT 'lang', lang, CAST(count(*) AS BIGINT),
      |    row_number() OVER (ORDER BY count(*) DESC, lang) - 1
      |  FROM documents GROUP BY lang)
      |ORDER BY dim, id""".stripMargin

  // ==== q177: join-key skew report ===========================================
  //
  // The diagnostic run BEFORE choosing a join strategy at scale: per key
  // column, how concentrated is the key distribution — max key count vs
  // the mean (the "skew ratio" that decides between plain hash join,
  // AQE skew splitting, and explicit salting). One map-side-combined
  // count per dim; the report is computed on the key-count table
  // (key-cardinality-sized). All counts are integers; the two ratios
  // divide integers once at render.

  /** One row per (dim): n_keys, n_rows, max_cnt, mean and skew ratio. */
  def skewReport(dims: Seq[(String, DataFrame, String)]): DataFrame =
    dims.map { case (name, df, key) =>
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_cnt"))
        .select(lit(name).as("dim"), col("n_keys"), col("n_rows"),
          col("max_cnt"),
          QueryDef.dec4(col("n_rows").cast("double") /
            col("n_keys").cast("double")).as("mean_cnt"),
          QueryDef.dec4(col("max_cnt").cast("double") * col("n_keys")
            .cast("double") / col("n_rows").cast("double")).as("skew_ratio"))
    }.reduce(_ unionByName _)

  private def q177(s: SparkSession, dir: String): DataFrame =
    skewReport(Seq(
      ("lineitem.l_partkey", Tables.lineitem(s, dir), "l_partkey"),
      ("lineitem.l_orderkey", Tables.lineitem(s, dir), "l_orderkey"),
      ("orders.o_custkey", Tables.orders(s, dir), "o_custkey")))
      .orderBy(col("dim"))

  private val q177Sql = {
    def one(dim: String, table: String, key: String) =
      s"""SELECT '$dim' AS dim, count(*) AS n_keys,
         |  CAST(sum(c) AS BIGINT) AS n_rows, CAST(max(c) AS BIGINT) AS max_cnt,
         |  CAST(CAST(CAST(sum(c) AS DOUBLE) / count(*) AS DECIMAL(38,4))
         |    AS VARCHAR) AS mean_cnt,
         |  CAST(CAST(CAST(max(c) AS DOUBLE) * count(*) / CAST(sum(c) AS DOUBLE)
         |    AS DECIMAL(38,4)) AS VARCHAR) AS skew_ratio
         |FROM (SELECT $key, count(*) AS c FROM $table GROUP BY 1)""".stripMargin
    Seq(one("lineitem.l_partkey", "lineitem", "l_partkey"),
      one("lineitem.l_orderkey", "lineitem", "l_orderkey"),
      one("orders.o_custkey", "orders", "o_custkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY dim")
  }

  // ==== q180: foreign-key integrity audit ====================================
  //
  // Referential health across the warehouse: per declared FK relation,
  // how many child rows point at nothing (orphans) and how many distinct
  // parents are unreferenced. Orphans = LEFT ANTI against the parent key
  // set (broadcastable for dimension parents); unreferenced = parent
  // ANTI child keys. Both sides are key-projected before the join, so
  // the scan reads one column. Complements q117's column-level quality
  // report at the cross-table level.

  /** One row per (relation): child rows, orphan rows, unreferenced
    * parent keys. */
  def fkAudit(relations: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame =
    relations.map { case (name, child, ck, parent, pk) =>
      val childKeys = child.select(col(ck).as("k"))
      val parentKeys = parent.select(col(pk).as("k")).distinct()
      val orphans = childKeys.join(parentKeys, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val unreferenced = parentKeys
        .join(childKeys.distinct(), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_unreferenced"))
      childKeys.agg(count(lit(1)).as("n_child_rows"))
        .crossJoin(orphans).crossJoin(unreferenced)
        .select(lit(name).as("relation"), col("n_child_rows"),
          col("n_orphans"), col("n_unreferenced"))
    }.reduce(_ unionByName _)

  private def q180(s: SparkSession, dir: String): DataFrame =
    fkAudit(Seq(
      ("lineitem->orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey"),
      ("orders->customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"),
      ("customer->nation", Tables.customer(s, dir), "c_nationkey",
        Tables.nation(s, dir), "n_nationkey")))
      .orderBy(col("relation"))

  private val q180Sql = {
    def one(name: String, child: String, ck: String, parent: String,
        pk: String) =
      s"""SELECT '$name' AS relation,
         |  (SELECT count(*) FROM $child) AS n_child_rows,
         |  (SELECT count(*) FROM $child c
         |   WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$ck))
         |    AS n_orphans,
         |  (SELECT count(*) FROM (SELECT DISTINCT $pk FROM $parent) p
         |   WHERE NOT EXISTS (SELECT 1 FROM $child c WHERE c.$ck = p.$pk))
         |    AS n_unreferenced""".stripMargin
    Seq(one("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      one("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
      one("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relation")
  }

  // ==== q190: Theil–Sen robust trend (grouped) ==============================
  //
  // The median-of-pairwise-slopes estimator — the robust twin of q144's
  // OLS: a level shift or a handful of spike hours moves OLS arbitrarily
  // but moves the slope MEDIAN not at all (29% breakdown point). Declared
  // over DOMAIN-sized series (per-type hourly rates: pairs = hours², never
  // events²) — the same bounded-blowup contract as the q8 theta join.
  // Exactness: every pairwise slope divides two exact BIGINTs once
  // (exactly-rounded double, bit-identical both engines); the median is
  // the q44-established percentile/quantile_cont parity — averaging the
  // two mid doubles is itself exactly rounded.

  /** Per-`group` Theil–Sen slope of integer `y` on integer `x`: pairs
    * with distinct x, slope = median of (Δy/Δx). Groups with < 2 distinct
    * x values vanish (no pairs). */
  def theilSenSlope(df: DataFrame, group: String, x: String, y: String): DataFrame = {
    val a = df.select(col(group), col(x).cast("long").as("xa"),
      col(y).cast("long").as("ya"))
    val b = df.select(col(group), col(x).cast("long").as("xb"),
      col(y).cast("long").as("yb"))
    a.join(b, Seq(group)).where(col("xa") < col("xb"))
      .withColumn("slope", (col("yb") - col("ya")).cast("double") /
        (col("xb") - col("xa")).cast("double"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(slope, 0.5)").as("slope"))
  }

  private def q190(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    theilSenSlope(hourly, "event_type", "hr", "cnt")
      .select(col("event_type"), col("n_pairs"),
        QueryDef.dec4(col("slope")).as("slope"))
      .orderBy(col("event_type"))
  }

  private val q190Sql =
    """WITH h AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.event_type,
      |    CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.hr - a.hr AS DOUBLE)
      |      AS slope
      |  FROM h a JOIN h b
      |    ON a.event_type = b.event_type AND a.hr < b.hr)
      |SELECT event_type, count(*) AS n_pairs,
      |  CAST(CAST(quantile_cont(slope, 0.5) AS DECIMAL(38,4)) AS VARCHAR)
      |    AS slope
      |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin

  // ==== q364: Huber IRLS robust trend (grouped) =============================
  //
  // The M-estimator completing the regression family: q144's OLS is
  // efficient but a single outlier moves it arbitrarily; q190's Theil–Sen
  // is 29%-breakdown robust but discards efficiency (and is pair-
  // quadratic in the series). Huber's compromise — full weight inside a
  // band, 1/|r| decay outside — via iteratively reweighted least squares,
  // TWO reweight rounds unrolled, each with its own ROBUST scale: the
  // band is c = 2·median|r| (the MAD-scale Huber band — a MEAN-based
  // scale is itself dragged by the very outlier it should discount, and
  // a frozen seed-scale band measured 2.67 on the planted-outlier spec
  // where the median-scale rounds recover ~2.0), recomputed per round
  // from the current fit's residuals; median parity across engines is
  // the q44 percentile/quantile_cont law. Scale shape: each round is ONE
  // map-side-combined groupBy over the rows plus a group-domain
  // broadcast join of the fitted line back — no windows, no pairs, 3 row
  // passes total. Exactness: x, y are integers; fitted lines are one
  // spelled double chain off exact BIGINT moments (the q144 rule);
  // per-row residuals floor to milli-units ONCE, the scale
  // s = ⌊median |r|ₘ⌋ and band c = max(2s, 1) are exact BIGINTs, and the
  // weights
  // wᵤ = min(10⁶, ⌊10⁶·c/|r|ₘ⌋) are pure integer arithmetic — so the
  // weighted moments are exact BIGINTs and only the final closed form
  // (DECIMAL(38,0) cross products — sw·swxy overflows BIGINT) divides in
  // double.

  /** Per-`group` Huber-IRLS fit of integer `y` on integer `x`:
    * (group, n, slope_h, intercept_h, wsum). Degenerate groups (zero
    * x-variance at any stage) report nulls; `wsum` is the final total
    * micro-weight (an integrity check: n·10⁶ when nothing is
    * down-weighted). */
  def huberTrend(df: DataFrame, group: String, x: String, y: String): DataFrame = {
    val rows = df.select(col(group).as("g"), col(x).cast("long").as("x"),
      col(y).cast("long").as("y"))
    // pass 0: OLS seed — the exact q144 chain
    val f0 = groupedOls(rows.toDF("g", "x", "y"), "g", "x", "y")
      .select(col("g"), col("n"), col("slope").as("b"), col("intercept").as("a"))

    def residMilli(a: Column, b: Column): Column =
      floor(lit(1000.0) * abs(col("y").cast("double") -
        (a + b * col("x").cast("double")))).cast("long")

    // robust per-round scale: s = floor-median |r| milli, band c = 2s
    def bandOf(resid: DataFrame): DataFrame =
      resid.groupBy(col("g"))
        .agg(floor(expr("percentile(rmilli, 0.5)")).cast("long").as("smilli"))
        .select(col("g"), greatest(lit(2L) * col("smilli"), lit(1L)).as("cmilli"))

    def weight(rm: Column): Column =
      when(rm <= col("cmilli"), lit(1000000L))
        .otherwise(expr("(1000000 * cmilli) div rmilli"))

    def weightedFit(w: DataFrame): DataFrame = {
      val m = w.groupBy(col("g")).agg(
        sum(col("wmicro")).as("sw"),
        sum(col("wmicro") * col("x")).as("swx"),
        sum(col("wmicro") * col("y")).as("swy"),
        sum(col("wmicro") * col("x") * col("x")).as("swxx"),
        sum(col("wmicro") * col("x") * col("y")).as("swxy"))
      def d(c: String) = col(c).cast(DecimalType(38, 0))
      val num = d("sw") * d("swxy") - d("swx") * d("swy")
      val den = d("sw") * d("swxx") - d("swx") * d("swx")
      m.select(col("g"), col("sw"),
        when(den =!= 0, num.cast("double") / den.cast("double")).as("b"),
        when(den =!= 0,
          (d("swy").cast("double") - num.cast("double") / den.cast("double")
            * d("swx").cast("double")) / d("sw").cast("double")).as("a"))
    }

    // one IRLS round: residuals vs the current fit, a fresh robust band,
    // Huber weights, weighted refit
    def round(fit: DataFrame): DataFrame = {
      val r = rows
        .join(broadcast(fit.where(col("b").isNotNull)
          .select(col("g"), col("a"), col("b"))), Seq("g"))
        .withColumn("rmilli", residMilli(col("a"), col("b")))
      val w = r.join(broadcast(bandOf(r)), Seq("g"))
        .withColumn("wmicro", weight(col("rmilli")))
      weightedFit(w)
    }
    val f2 = round(round(f0))

    f0.select(col("g"), col("n"))
      .join(f2.select(col("g"), col("sw"), col("b"), col("a")), Seq("g"), "left")
      .select(col("g"), col("n"), QueryDef.dec4(col("b")).as("slope_h"),
        QueryDef.dec4(col("a")).as("intercept_h"), col("sw").as("wsum"))
  }

  // same covariate pair as q144 so the regression family reads on one
  // surface: x = token occurrences, y = distinct tokens, per source
  private def q364(s: SparkSession, dir: String): DataFrame =
    huberTrend(
      Tables.documents(s, dir).select(col("source"),
        size(Tok.ws(col("text"))).as("x"),
        size(array_distinct(Tok.ws(col("text")))).as("y")),
      "source", "x", "y")
      .withColumnRenamed("g", "source")
      .orderBy(col("source"))

  private val q364Sql = {
    val fitFrom = (m: String) =>
      s"""SELECT g, sw,
         |    CASE WHEN den <> 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
         |      END AS b,
         |    CASE WHEN den <> 0 THEN
         |      (CAST(swy AS DOUBLE) - CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
         |        * CAST(swx AS DOUBLE)) / CAST(sw AS DOUBLE) END AS a
         |  FROM (
         |    SELECT g, sw, swx, swy,
         |      CAST(sw AS DECIMAL(38,0)) * CAST(swxy AS DECIMAL(38,0))
         |        - CAST(swx AS DECIMAL(38,0)) * CAST(swy AS DECIMAL(38,0)) AS num,
         |      CAST(sw AS DECIMAL(38,0)) * CAST(swxx AS DECIMAL(38,0))
         |        - CAST(swx AS DECIMAL(38,0)) * CAST(swx AS DECIMAL(38,0)) AS den
         |    FROM $m)""".stripMargin
    val wmoments = (w: String) =>
      s"""SELECT g, CAST(sum(wmicro) AS BIGINT) AS sw,
         |    CAST(sum(wmicro * x) AS BIGINT) AS swx,
         |    CAST(sum(wmicro * y) AS BIGINT) AS swy,
         |    CAST(sum(wmicro * x * x) AS BIGINT) AS swxx,
         |    CAST(sum(wmicro * x * y) AS BIGINT) AS swxy
         |  FROM $w GROUP BY g""".stripMargin
    s"""|WITH d AS (
        |  SELECT source AS g,
        |    len(list_filter(string_split(text, ' '), e -> e <> '')) AS x,
        |    len(list_distinct(list_filter(string_split(text, ' '), e -> e <> '')))
        |      AS y
        |  FROM documents),
        |m0 AS (
        |  SELECT g, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM d GROUP BY 1),
        |f0 AS (
        |  SELECT g, n,
        |    CASE WHEN denx <> 0 THEN CAST(num AS DOUBLE) / CAST(denx AS DOUBLE)
        |      END AS b,
        |    CASE WHEN denx <> 0 THEN
        |      (CAST(sy AS DOUBLE) - CAST(num AS DOUBLE) / CAST(denx AS DOUBLE)
        |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END AS a
        |  FROM (
        |    SELECT g, n, sx, sy, n * sxy - sx * sy AS num,
        |      n * sxx - sx * sx AS denx
        |    FROM m0)),
        |r1 AS (
        |  SELECT d.g, d.x, d.y,
        |    CAST(floor(1000 * abs(CAST(d.y AS DOUBLE)
        |      - (f.a + f.b * CAST(d.x AS DOUBLE)))) AS BIGINT) AS rmilli
        |  FROM d JOIN f0 f ON f.g = d.g AND f.b IS NOT NULL),
        |sc1 AS (
        |  SELECT g, greatest(
        |    2 * CAST(floor(quantile_cont(rmilli, 0.5)) AS BIGINT), 1) AS cmilli
        |  FROM r1 GROUP BY 1),
        |w1 AS (
        |  SELECT r.g, r.x, r.y,
        |    CASE WHEN r.rmilli <= s.cmilli THEN 1000000
        |      ELSE (1000000 * s.cmilli) // r.rmilli END AS wmicro
        |  FROM r1 r JOIN sc1 s ON s.g = r.g),
        |m1 AS (
        |  ${wmoments("w1")}),
        |f1 AS (
        |  ${fitFrom("m1")}),
        |r2 AS (
        |  SELECT d.g, d.x, d.y,
        |    CAST(floor(1000 * abs(CAST(d.y AS DOUBLE)
        |      - (f.a + f.b * CAST(d.x AS DOUBLE)))) AS BIGINT) AS rmilli
        |  FROM d JOIN f1 f ON f.g = d.g AND f.b IS NOT NULL),
        |sc2 AS (
        |  SELECT g, greatest(
        |    2 * CAST(floor(quantile_cont(rmilli, 0.5)) AS BIGINT), 1) AS cmilli
        |  FROM r2 GROUP BY 1),
        |w2 AS (
        |  SELECT r.g, r.x, r.y,
        |    CASE WHEN r.rmilli <= s.cmilli THEN 1000000
        |      ELSE (1000000 * s.cmilli) // r.rmilli END AS wmicro
        |  FROM r2 r JOIN sc2 s ON s.g = r.g),
        |m2 AS (
        |  ${wmoments("w2")}),
        |f2 AS (
        |  ${fitFrom("m2")})
        |SELECT f0.g AS source, f0.n,
        |  CAST(CAST(f2.b AS DECIMAL(38,4)) AS VARCHAR) AS slope_h,
        |  CAST(CAST(f2.a AS DECIMAL(38,4)) AS VARCHAR) AS intercept_h,
        |  f2.sw AS wsum
        |FROM f0 LEFT JOIN f2 ON f2.g = f0.g
        |ORDER BY source""".stripMargin
  }

  // ==== q194: correlation matrix in one pass ================================
  //
  // All pairwise Pearson correlations of k integer measures from ONE
  // map-side-combined aggregation — the k(k+1)/2 cross moments accumulate
  // together, the matrix assembles from closed forms; no per-pair passes,
  // no windows (the q144/q163 integer-moment discipline: DECIMAL(38,0)
  // sums so no measure product can silently wrap, one double division per
  // cell at render). The redundancy screen run before feature selection
  // or mixture design.

  /** Upper-triangle correlation rows (m_a, m_b, n, r) for the named
    * integer measure columns; degenerate pairs (zero variance) give null
    * r. */
  def correlationMatrix(df: DataFrame, measures: Seq[String]): DataFrame = {
    require(measures.size >= 2)
    val dec = measures.map(m => col(m).cast("decimal(18,0)").as(m))
    val d = df.select(dec: _*)
    val aggs = measures.map(m => sum(col(m)).as(s"s_$m")) ++
      (for (a <- measures; b <- measures if a <= b)
        yield sum(col(a) * col(b)).as(s"p_${a}_$b"))
    val m = d.agg(count(lit(1)).as("n"), aggs: _*)
    val pairs = for (a <- measures; b <- measures if a < b) yield (a, b)
    val rows = pairs.map { case (a, b) =>
      def dd(c: String) = col(c).cast("double")
      val num = dd("n") * dd(s"p_${a}_$b") - dd(s"s_$a") * dd(s"s_$b")
      val denA = dd("n") * dd(s"p_${a}_$a") - dd(s"s_$a") * dd(s"s_$a")
      val denB = dd("n") * dd(s"p_${b}_$b") - dd(s"s_$b") * dd(s"s_$b")
      m.select(lit(a).as("m_a"), lit(b).as("m_b"), col("n"),
        when(denA > 0 && denB > 0, num / sqrt(denA * denB)).as("r"))
    }
    rows.reduce(_.unionByName(_))
  }

  private def q194(s: SparkSession, dir: String): DataFrame =
    correlationMatrix(
      Tables.lineitem(s, dir).select(
        col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"),
        round(col("l_discount") * 100).cast("long").as("disc_c"),
        col("l_partkey").cast("long").as("part")),
      Seq("disc_c", "part", "price_c", "qty"))
      .select(col("m_a"), col("m_b"), col("n"), QueryDef.dec4(col("r")).as("r"))
      .orderBy(col("m_a"), col("m_b"))

  private val q194Sql = {
    val ms = Seq("disc_c", "part", "price_c", "qty")
    val pairs = for (a <- ms; b <- ms if a < b) yield (a, b)
    val sel = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS m_a, '$b' AS m_b, n,
         |  CAST(CAST(CASE WHEN
         |      CAST(n AS DOUBLE) * CAST(p_${a}_$a AS DOUBLE)
         |        - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE) > 0
         |      AND CAST(n AS DOUBLE) * CAST(p_${b}_$b AS DOUBLE)
         |        - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE) > 0
         |    THEN (CAST(n AS DOUBLE) * CAST(p_${a}_$b AS DOUBLE)
         |        - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
         |      / sqrt((CAST(n AS DOUBLE) * CAST(p_${a}_$a AS DOUBLE)
         |          - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
         |        * (CAST(n AS DOUBLE) * CAST(p_${b}_$b AS DOUBLE)
         |          - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))
         |    END AS DECIMAL(38,4)) AS VARCHAR) AS r
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    val moments = ms.map(m => s"sum($m) AS s_$m").mkString(", ") + ", " +
      (for (a <- ms; b <- ms if a <= b)
        yield s"sum($a * $b) AS p_${a}_$b").mkString(", ")
    s"""WITH d AS (
       |  SELECT CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,0)) AS qty,
       |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
       |      AS DECIMAL(18,0)) AS price_c,
       |    CAST(CAST(round(l_discount * 100) AS BIGINT)
       |      AS DECIMAL(18,0)) AS disc_c,
       |    CAST(l_partkey AS DECIMAL(18,0)) AS part
       |  FROM lineitem),
       |m AS (SELECT count(*) AS n, $moments FROM d)
       |SELECT * FROM ($sel)
       |ORDER BY m_a, m_b""".stripMargin
  }

  // ==== q195: mutual information between categorical columns ================
  //
  // MI(X;Y) = Σ_cells (c_ij/N)·ln(N·c_ij/(n_i·n_j)) — the dependence
  // screen that catches what Pearson cannot (categorical, non-monotone).
  // Scale shape: three map-side-combined counts (joint, two marginals)
  // on CATEGORY domains, one broadcast-joined render. Float discipline:
  // one ln per DISTINCT cell over exact integers, floored to micro-nats
  // WEIGHTED by the exact cell count (the q99/q183 rule); the per-cell
  // integer terms sum order-free, one division by N at the end.

  /** One row per (x, y) pair: n, n_cells, mi_micro (Σ c·⌊10⁶·ln term⌋
    * still divided by N at render as dec4 nats). */
  def mutualInformation(df: DataFrame, x: String, y: String): DataFrame = {
    val joint = df.groupBy(col(x).as("xv"), col(y).as("yv"))
      .agg(count(lit(1)).as("c"))
    val mx = joint.groupBy(col("xv")).agg(sum(col("c")).as("cx"))
    val my = joint.groupBy(col("yv")).agg(sum(col("c")).as("cy"))
    val n = joint.agg(sum(col("c")).as("n"))
    joint.join(broadcast(mx), Seq("xv")).join(broadcast(my), Seq("yv"))
      .crossJoin(broadcast(n))
      .select(col("c"), col("n"),
        (col("c") * floor(lit(1e6) * log(
          (col("n") * col("c")).cast("double") /
            (col("cx") * col("cy")).cast("double"))).cast("long")).as("t"))
      .agg(first(col("n")).as("n"), count(lit(1)).as("n_cells"),
        sum(col("t")).as("t"))
      .select(col("n"), col("n_cells"),
        QueryDef.dec4(col("t").cast("double") /
          (lit(1e6) * col("n").cast("double"))).as("mi_nats"))
  }

  private def q195(s: SparkSession, dir: String): DataFrame =
    mutualInformation(
      Tables.lineitem(s, dir), "l_returnflag", "l_linestatus")

  private val q195Sql =
    """WITH joint AS (
      |  SELECT l_returnflag AS xv, l_linestatus AS yv,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |mx AS (SELECT xv, CAST(sum(c) AS BIGINT) AS cx FROM joint GROUP BY 1),
      |my AS (SELECT yv, CAST(sum(c) AS BIGINT) AS cy FROM joint GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM joint),
      |terms AS (
      |  SELECT j.c, n.n,
      |    j.c * CAST(floor(1000000.0 * ln(
      |      CAST(n.n * j.c AS DOUBLE) / CAST(mx.cx * my.cy AS DOUBLE)))
      |      AS BIGINT) AS t
      |  FROM joint j JOIN mx USING (xv) JOIN my USING (yv) CROSS JOIN n)
      |SELECT max(n) AS n, count(*) AS n_cells,
      |  CAST(CAST(CAST(sum(t) AS DOUBLE) / (1000000.0 * CAST(max(n) AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS mi_nats
      |FROM terms""".stripMargin

  // ==== q216: grouped Mann–Whitney U test ===================================
  //
  // The rank-based (distribution-free) two-sample test — q197's Welch for
  // data where means mislead (heavy tails, ordinal outcomes): U compares
  // every A observation against every B observation, computed WITHOUT the
  // quadratic comparison via the rank-sum identity U₁ = R₁ − n₁(n₁+1)/2.
  // Ranks are MIDRANKS over the DISTINCT-VALUE histogram: for value v
  // with c_v occurrences and S_v smaller rows, 2·midrank = 2S_v + c_v + 1
  // — kept ×2 so every quantity is an exact BIGINT until the final z
  // division (the engine-wide integer-moments rule). The z statistic
  // carries the textbook tie correction Σ(c³−c); statistic-not-p-value
  // (normal CDF is libm — the q197 rule). Scale shape: one corpus-sized
  // groupBy to the (group, value) histogram; the rank window runs on
  // DISTINCT VALUES per group (the q200 domain-window discipline), never
  // on rows.

  /** One row per `group`: (g, n0, n1, u1, z) — U for arm 1 (midranks) and
    * the tie-corrected normal approximation z. `armExpr` selects arm 1. */
  def mannWhitneyU(df: DataFrame, group: String, x: String,
      armExpr: String): DataFrame = {
    val hist = df
      .select(col(group).as("g"), col(x).as("v"),
        when(expr(armExpr), 1L).otherwise(0L).as("a"))
      .groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("c"), sum(col("a")).as("c1"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    def dd(c: Column) = c.cast("double")
    hist
      .withColumn("s", coalesce(sum(col("c")).over(w), lit(0L)))
      .groupBy(col("g"))
      .agg(sum(col("c") - col("c1")).as("n0"), sum(col("c1")).as("n1"),
        sum(col("c1") * (lit(2L) * col("s") + col("c") + 1L)).as("r2"),
        sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
      .select(col("g"), col("n0"), col("n1"),
        ((col("r2") - col("n1") * (col("n1") + 1L)).cast("double") / 2.0)
          .as("u1"),
        col("r2"), col("ties"))
      .withColumn("nn", col("n0") + col("n1"))
      .withColumn("z",
        (col("u1") - dd(col("n0")) * dd(col("n1")) / 2.0) /
          sqrt(dd(col("n0")) * dd(col("n1")) / 12.0 *
            (dd(col("nn")) + 1.0 -
              dd(col("ties")) / (dd(col("nn")) * (dd(col("nn")) - 1.0)))))
      .select(col("g"), col("n0"), col("n1"),
        QueryDef.dec4(col("u1")).as("u1"), QueryDef.dec4(col("z")).as("z"))
  }

  // same experiment frame as q197: arm = even order key, outcome = cents
  private def q216(s: SparkSession, dir: String): DataFrame =
    mannWhitneyU(
      Tables.orders(s, dir).select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey")),
      "o_orderpriority", "cents", "o_orderkey % 2 = 0")
      .orderBy(col("g"))

  private val q216Sql =
    """WITH d AS (
      |  SELECT o_orderpriority AS g,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS a,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders),
      |hist AS (
      |  SELECT g, v, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(a) AS BIGINT) AS c1
      |  FROM d GROUP BY 1, 2),
      |ranked AS (
      |  SELECT g, v, c, c1,
      |    CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS s
      |  FROM hist),
      |m AS (
      |  SELECT g, CAST(sum(c - c1) AS BIGINT) AS n0,
      |    CAST(sum(c1) AS BIGINT) AS n1,
      |    CAST(sum(c1 * (2 * s + c + 1)) AS BIGINT) AS r2,
      |    CAST(sum(c * c * c - c) AS BIGINT) AS ties
      |  FROM ranked GROUP BY 1)
      |SELECT g, n0, n1,
      |  CAST(CAST(CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
      |    AS DECIMAL(38,4)) AS VARCHAR) AS u1,
      |  CAST(CAST(
      |    (CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
      |      - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0) /
      |    sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0 *
      |      (CAST(n0 + n1 AS DOUBLE) + 1.0 - CAST(ties AS DOUBLE) /
      |        (CAST(n0 + n1 AS DOUBLE) * (CAST(n0 + n1 AS DOUBLE) - 1.0))))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS z
      |FROM m ORDER BY g""".stripMargin

  // ==== q213: chi-square independence test + Cramér's V =====================
  //
  // Pearson's χ² over a categorical contingency table — the classic
  // "are these two labels independent" screen (q195's MI in hypothesis-
  // test clothing), reported as the STATISTIC + dof + Cramér's V, not a
  // p-value (the χ² CDF is a libm special function — the q197 rule).
  // Algebra: Σ(O−E)²/E with E = cₓc_y/N telescopes to N·Σ O²/(cₓc_y) − N,
  // so the only float op is ONE division per DISTINCT cell, floored to
  // nano units (the q195 discipline) — cell terms sum order-free, and
  // χ² = Σt/10⁹ − N recovers exactly the same double in both engines.
  // Cramér's V = √(χ²/(N·min(r−1,c−1))) rides on that double: sqrt is
  // correctly rounded by IEEE in both engines, so no new drift source.
  // Scale shape: identical to q195 — category-domain counts, broadcast
  // margins, scalar render.

  /** One row: (n, n_rows, n_cols, dof, chi2, cramers_v) for the x × y
    * contingency table of `df`. */
  def chiSquareTest(df: DataFrame, x: String, y: String): DataFrame = {
    val joint = df.groupBy(col(x).as("xv"), col(y).as("yv"))
      .agg(count(lit(1)).as("c"))
    val mx = joint.groupBy(col("xv")).agg(sum(col("c")).as("cx"))
    val my = joint.groupBy(col("yv")).agg(sum(col("c")).as("cy"))
    val n = joint.agg(sum(col("c")).as("n"))
    val nr = broadcast(mx.agg(count(lit(1)).as("r")))
    val nc = broadcast(my.agg(count(lit(1)).as("cc")))
    joint.join(broadcast(mx), Seq("xv")).join(broadcast(my), Seq("yv"))
      .crossJoin(broadcast(n))
      .select(col("n"),
        floor(lit(1e9) * (col("n") * col("c") * col("c")).cast("double") /
          (col("cx") * col("cy")).cast("double")).cast("long").as("t"))
      .agg(first(col("n")).as("n"), sum(col("t")).as("t"))
      .crossJoin(nr).crossJoin(nc)
      .select(col("n"), col("r").as("n_rows"), col("cc").as("n_cols"),
        ((col("r") - 1) * (col("cc") - 1)).as("dof"),
        (col("t").cast("double") / lit(1e9) - col("n").cast("double"))
          .as("chi2"),
        sqrt((col("t").cast("double") / lit(1e9) - col("n").cast("double")) /
          (col("n").cast("double") *
            least(col("r") - 1, col("cc") - 1).cast("double"))).as("v"))
      .select(col("n"), col("n_rows"), col("n_cols"), col("dof"),
        QueryDef.dec4(col("chi2")).as("chi2"),
        QueryDef.dec4(col("v")).as("cramers_v"))
  }

  private def q213(s: SparkSession, dir: String): DataFrame =
    chiSquareTest(Tables.documents(s, dir), "lang", "source")

  private val q213Sql =
    """WITH joint AS (
      |  SELECT lang AS xv, source AS yv, CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |mx AS (SELECT xv, CAST(sum(c) AS BIGINT) AS cx FROM joint GROUP BY 1),
      |my AS (SELECT yv, CAST(sum(c) AS BIGINT) AS cy FROM joint GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM joint),
      |nr AS (SELECT count(*) AS r FROM mx),
      |nc AS (SELECT count(*) AS cc FROM my),
      |terms AS (
      |  SELECT n.n,
      |    CAST(floor(1000000000.0 *
      |      CAST(n.n * j.c * j.c AS DOUBLE) / CAST(mx.cx * my.cy AS DOUBLE))
      |      AS BIGINT) AS t
      |  FROM joint j JOIN mx USING (xv) JOIN my USING (yv) CROSS JOIN n),
      |agg AS (SELECT max(n) AS n, CAST(sum(t) AS BIGINT) AS t FROM terms)
      |SELECT n, nr.r AS n_rows, nc.cc AS n_cols,
      |  (nr.r - 1) * (nc.cc - 1) AS dof,
      |  CAST(CAST(CAST(t AS DOUBLE) / 1000000000.0 - CAST(n AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS chi2,
      |  CAST(CAST(sqrt((CAST(t AS DOUBLE) / 1000000000.0 - CAST(n AS DOUBLE)) /
      |    (CAST(n AS DOUBLE) * CAST(least(nr.r - 1, nc.cc - 1) AS DOUBLE)))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS cramers_v
      |FROM agg CROSS JOIN nr CROSS JOIN nc""".stripMargin

  // ==== q197: grouped Welch t-test ==========================================
  //
  // The A/B primitive: per segment, does the treatment cohort's mean
  // differ from control's, WITHOUT assuming equal variances (Welch).
  // t = (m₁−m₂)/√(s₁²/n₁+s₂²/n₂), df by Welch–Satterthwaite — reported
  // as statistics, not p-values (a p-value needs the t CDF, a libm
  // special function with engine-specific last-ulp behavior; the
  // statistic is closed-form over exact moments and hash-stable).
  // Complements q131 (KS, distribution-free omnibus) with the standard
  // mean-shift test. One map-side-combined groupBy accumulating
  // per-(segment, arm) integer moments; everything after is arithmetic
  // on the segment domain.

  /** Per-`group` Welch t of integer `x` between arm = 0/1 (`armExpr`
    * boolean ⇒ arm 1). Segments missing an arm or with n < 2 report
    * nulls. */
  def welchTTest(df: DataFrame, group: String, x: String, armExpr: String): DataFrame = {
    val m = df.groupBy(col(group),
      when(expr(armExpr), 1L).otherwise(0L).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col(x).cast("decimal(18,0)")).as("s"),
        sum(col(x).cast("decimal(18,0)") * col(x).cast("decimal(18,0)"))
          .as("ss"))
    def side(a: Int) = m.filter(col("arm") === a)
      .select(col(group), col("n").as(s"n$a"), col("s").as(s"s$a"),
        col("ss").as(s"ss$a"))
    val j = side(0).join(side(1), Seq(group))
    def dd(c: String) = col(c).cast("double")
    // unbiased variance: (n·ss − s²) / (n·(n−1))
    def v(a: Int) =
      (dd(s"n$a") * dd(s"ss$a") - dd(s"s$a") * dd(s"s$a")) /
        (dd(s"n$a") * (dd(s"n$a") - lit(1.0)))
    val se0 = v(0) / dd("n0")
    val se1 = v(1) / dd("n1")
    j.select(col(group), col("n0"), col("n1"),
      when(col("n0") > 1 && col("n1") > 1,
        (dd("s1") / dd("n1") - dd("s0") / dd("n0")) / sqrt(se0 + se1))
        .as("t"),
      when(col("n0") > 1 && col("n1") > 1,
        (se0 + se1) * (se0 + se1) /
          (se0 * se0 / (dd("n0") - lit(1.0)) +
            se1 * se1 / (dd("n1") - lit(1.0)))).as("df"))
  }

  // arm = even order key (a deterministic stand-in for assignment);
  // outcome = order total in cents; segment = order priority
  private def q197(s: SparkSession, dir: String): DataFrame =
    welchTTest(
      Tables.orders(s, dir).select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey")),
      "o_orderpriority", "cents", "o_orderkey % 2 = 0")
      .select(col("o_orderpriority"), col("n0"), col("n1"),
        QueryDef.dec4(col("t")).as("t"), QueryDef.dec4(col("df")).as("df"))
      .orderBy(col("o_orderpriority"))

  private val q197Sql =
    """WITH d AS (
      |  SELECT o_orderpriority AS g,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS arm,
      |    CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(18,0))
      |      AS x
      |  FROM orders),
      |m AS (
      |  SELECT g, arm, count(*) AS n, CAST(sum(x) AS DECIMAL(38,0)) AS s,
      |    CAST(sum(x * x) AS DECIMAL(38,0)) AS ss
      |  FROM d GROUP BY 1, 2),
      |j AS (
      |  SELECT a.g, a.n AS n0, a.s AS s0, a.ss AS ss0,
      |    b.n AS n1, b.s AS s1, b.ss AS ss1
      |  FROM m a JOIN m b ON a.g = b.g AND a.arm = 0 AND b.arm = 1),
      |c AS (
      |  SELECT g, n0, n1,
      |    (CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
      |      - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
      |      / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0))
      |      / CAST(n0 AS DOUBLE) AS se0,
      |    (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
      |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
      |      / CAST(n1 AS DOUBLE) AS se1,
      |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |      - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff
      |  FROM j)
      |SELECT g AS o_orderpriority, n0, n1,
      |  CAST(CAST(CASE WHEN n0 > 1 AND n1 > 1
      |    THEN diff / sqrt(se0 + se1) END AS DECIMAL(38,4)) AS VARCHAR) AS t,
      |  CAST(CAST(CASE WHEN n0 > 1 AND n1 > 1
      |    THEN (se0 + se1) * (se0 + se1) /
      |      (se0 * se0 / (CAST(n0 AS DOUBLE) - 1.0)
      |        + se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS df
      |FROM c ORDER BY o_orderpriority""".stripMargin

  // ==== q202: k-anonymity / l-diversity privacy audit =======================
  //
  // The data-governance gate before a dataset ships: group rows by their
  // quasi-identifier combination (the columns an adversary can link
  // externally); an equivalence class of size < k re-identifies its
  // members, and a class whose SENSITIVE attribute takes < l distinct
  // values leaks it even at size ≥ k (Sweeney's k-anonymity; Machanavajjhala's
  // l-diversity). One map-side-combined groupBy to the QI domain plus a
  // scalar rollup — the audit never touches row payloads twice. Report:
  // class count, minimum class size, rows in classes < k (the
  // suppression set), and rows l-diverse-safe.

  /** One row: (n_rows, n_classes, min_class_size, rows_below_k,
    * rows_not_ldiverse) for quasi-identifiers `qi` and sensitive column
    * `sensitive` at the given k and l. */
  def privacyAudit(df: DataFrame, qi: Seq[String], sensitive: String,
      k: Int, l: Int): DataFrame = {
    val classes = df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        countDistinct(col(sensitive)).as("nsens"))
    classes.agg(
      sum(col("sz")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("sz")).as("min_class_size"),
      sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("rows_below_k"),
      sum(when(col("nsens") < l, col("sz")).otherwise(0L))
        .as("rows_not_ldiverse"))
  }

  // QI = (nation, market segment) over customers; sensitive = account
  // balance in cents
  private def q202(s: SparkSession, dir: String): DataFrame =
    privacyAudit(
      Tables.customer(s, dir).select(col("c_nationkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("bal_c")),
      Seq("c_nationkey", "c_mktsegment"), "bal_c", k = 10, l = 5)

  private val q202Sql =
    """WITH cls AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS sz,
      |    count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT)) AS nsens
      |  FROM customer GROUP BY 1, 2)
      |SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
      |  count(*) AS n_classes,
      |  CAST(min(sz) AS BIGINT) AS min_class_size,
      |  CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
      |    AS rows_below_k,
      |  CAST(sum(CASE WHEN nsens < 5 THEN sz ELSE 0 END) AS BIGINT)
      |    AS rows_not_ldiverse
      |FROM cls""".stripMargin

  // ==== q218: functional-dependency / candidate-key audit ===================
  //
  // Schema profiling's core discovery question (Papenbrock et al.'s FD
  // discovery, the metadata layer of every data catalog): does column A
  // functionally determine column B — equivalently, is A a key for the
  // (A, B) projection? Exact per declared pair: one map-side-combined
  // groupBy to the DETERMINANT domain counting distinct dependents, then a
  // domain-sized rollup. Each pair is an independent two-column shuffle —
  // at 100 TB, pairs run in one job over shared scans (Spark reuses the
  // cached/columnar scan across the unioned branches, and each branch
  // projects just its two columns, so the parquet reader never widens).
  // A violating determinant value is one whose group maps to > 1 distinct
  // dependent; fd_holds ⟺ zero violations; n_det == n_rows flags A as a
  // candidate KEY of the relation (the FD A → everything).

  /** Per (determinant, dependent) pair over `df`: determinant-domain size,
    * violating-determinant count, max dependents under one determinant,
    * and whether the FD holds exactly. */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    pairs.map { case (det, dep) =>
      df.groupBy(col(det)).agg(countDistinct(col(dep)).as("ndep"))
        .agg(count(lit(1)).as("n_det"),
          sum(when(col("ndep") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("ndep")).as("max_deps"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_det"), col("n_violating"), col("max_deps"),
          (col("n_violating") === 0L).as("fd_holds"))
    }.reduce(_ union _)

  private def q218(s: SparkSession, dir: String): DataFrame =
    fdAudit(Tables.lineitem(s, dir), Seq(
      "l_orderkey" -> "l_returnflag",
      "l_orderkey" -> "l_suppkey",
      "l_partkey" -> "l_shipdate",
      "l_suppkey" -> "l_linestatus"))
      .union(fdAudit(Tables.orders(s, dir), Seq(
        "o_orderkey" -> "o_custkey",
        "o_custkey" -> "o_orderpriority")))
      .orderBy(col("determinant"), col("dependent"))

  private val q218Sql = {
    def one(table: String, det: String, dep: String) =
      s"""SELECT '$det' AS determinant, '$dep' AS dependent,
         |  count(*) AS n_det,
         |  CAST(sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violating,
         |  CAST(max(ndep) AS BIGINT) AS max_deps,
         |  sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
         |FROM (SELECT $det, count(DISTINCT $dep) AS ndep
         |      FROM $table GROUP BY $det)""".stripMargin
    Seq(one("lineitem", "l_orderkey", "l_returnflag"),
      one("lineitem", "l_orderkey", "l_suppkey"),
      one("lineitem", "l_partkey", "l_shipdate"),
      one("lineitem", "l_suppkey", "l_linestatus"),
      one("orders", "o_orderkey", "o_custkey"),
      one("orders", "o_custkey", "o_orderpriority"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY determinant, dependent")
  }

  // ==== q219: HBOS anomaly scoring ===========================================
  //
  // Histogram-Based Outlier Score (Goldstein & Dengel 2012) — the
  // linear-time unsupervised outlier detector: per feature, an equal-width
  // histogram; a row's score is Σ_f ln(N / freq_f(bin_f(row))) — rare bins
  // on many features ⇒ high score. Complements q118's distance-style
  // MAD detector with a density-style one. All binning is exact BIGINT
  // arithmetic ((v − min)·B div (max − min + 1) — no float boundary), the
  // histograms are feature-domain tables (B rows each) joined back
  // broadcast, and each ln is computed ONCE per distinct bin and floored
  // to micro-nats (the q99/q183/q195 rule) so per-row scores are integer
  // sums — order-free and cross-engine exact.

  /** Top-`k` outliers of `df` by HBOS over integral feature columns
    * `features` (each with `buckets` equal-width bins): (id, score_unats). */
  def hbosOutliers(df: DataFrame, idCol: String, features: Seq[String],
      buckets: Int, k: Int): DataFrame = {
    // ONE stats pass for n + every feature's range (2·|features|+1 scalars)
    val statsRow = df.agg(count(lit(1)),
      features.flatMap(f =>
        Seq(min(col(f).cast("long")), max(col(f).cast("long")))): _*).head()
    val n = statsRow.getLong(0)
    if (n == 0) // empty in, empty out — not an NPE on the null min/max
      return df.select(col(idCol), lit(0L).as("score_unats")).limit(0)
    val scored = features.zipWithIndex.map { case (f, i) =>
      val (lo, hi) = (statsRow.getLong(1 + 2 * i), statsRow.getLong(2 + 2 * i))
      val binned = df.select(col(idCol),
        expr(s"((CAST($f AS BIGINT) - ${lo}L) * ${buckets}L)" +
          s" div ${hi - lo + 1}L").as("bin"))
      val hist = binned.groupBy(col("bin")).agg(count(lit(1)).as("c"))
        .withColumn(s"s$i",
          floor(log(lit(n.toDouble) / col("c").cast("double")) * 1e6)
            .cast("long"))
        .select(col("bin"), col(s"s$i"))
      binned.join(broadcast(hist), Seq("bin")).select(col(idCol), col(s"s$i"))
    }.reduce(_.join(_, idCol))
    scored.select(col(idCol),
      features.indices.map(i => col(s"s$i")).reduce(_ + _).as("score_unats"))
      .orderBy(col("score_unats").desc, col(idCol)).limit(k)
  }

  private def q219(s: SparkSession, dir: String): DataFrame =
    hbosOutliers(
      Tables.documents(s, dir).select(col("doc_id"), col("n_chars"),
        size(Tok.ws(col("text"))).cast("long").as("n_tokens")),
      "doc_id", Seq("n_chars", "n_tokens"), buckets = 16, k = 20)

  private val q219Sql =
    """WITH d AS (
      |  SELECT doc_id, n_chars,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |r AS (SELECT min(n_chars) AS lo1, max(n_chars) AS hi1,
      |             min(n_tokens) AS lo2, max(n_tokens) AS hi2,
      |             count(*) AS n FROM d),
      |b AS (
      |  SELECT doc_id,
      |    ((n_chars - lo1) * 16) // (hi1 - lo1 + 1) AS bin1,
      |    ((n_tokens - lo2) * 16) // (hi2 - lo2 + 1) AS bin2
      |  FROM d CROSS JOIN r),
      |h1 AS (SELECT bin1, CAST(floor(ln(CAST((SELECT n FROM r) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT) AS s1
      |  FROM b GROUP BY bin1),
      |h2 AS (SELECT bin2, CAST(floor(ln(CAST((SELECT n FROM r) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT) AS s2
      |  FROM b GROUP BY bin2)
      |SELECT doc_id, s1 + s2 AS score_unats
      |FROM b JOIN h1 USING (bin1) JOIN h2 USING (bin2)
      |ORDER BY score_unats DESC, doc_id LIMIT 20""".stripMargin

  // ==== q230: stratified ATT (covariate-adjusted treatment effect) ==========
  //
  // The causal-adjustment step q197/q216 lack: a raw treated-vs-control
  // mean difference is confounded when treatment correlates with a
  // covariate; stratifying on the covariate and re-weighting per-stratum
  // differences by the TREATED counts estimates the ATT (average effect
  // on the treated) under ignorability-within-strata — the workhorse
  // adjustment (Cochran 1968) behind every experiment-analysis readout.
  // Strata = covariate deciles from the distributed exact-quantile path
  // (rint-snapped broadcast boundaries, the psi/calibration/rfm 'v > b'
  // idiom); all moments are exact BIGINT cents; each per-stratum mean
  // difference and the treated-weighted combine divide those integers
  // once at render — bit-stable cross-engine.

  /** Per covariate-decile stratum (n_t, n_c, att = ȳ_T − ȳ_C) plus an
    * '(all)' row with the treated-weighted ATT. `df` carries integer
    * outcome `y`, boolean `t`, double covariate `x`. */
  def stratifiedAtt(df: DataFrame, buckets: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = Seq(Tuple1(exactQuantiles(df, "x", ps)
      .map(b => math.rint(b * 10000) / 10000))).toDF("bs")
    val strata = df.crossJoin(broadcast(bounds))
      .select(aggregate(col("bs"), lit(0),
        (acc, b) => acc + when(round(col("x"), 4) > b, 1).otherwise(0))
        .as("stratum"), col("t"), col("y"))
      .groupBy(col("stratum"))
      .agg(sum(when(col("t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(col("t"), col("y")).otherwise(0L)).as("sy_t"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("n_c"),
        sum(when(!col("t"), col("y")).otherwise(0L)).as("sy_c"))
    val per = strata.select(col("stratum").cast("string").as("stratum"),
      col("n_t"), col("n_c"),
      QueryDef.dec4(col("sy_t").cast("double") / col("n_t").cast("double") -
        col("sy_c").cast("double") / col("n_c").cast("double")).as("att"))
    // treated-weighted combine: Σ n_t·(ȳT − ȳC) / Σ n_t, from the same
    // exact integers
    val overall = strata.agg(
      sum(col("n_t")).as("n_t"), sum(col("n_c")).as("n_c"),
      sum(col("n_t").cast("double") *
        (col("sy_t").cast("double") / col("n_t").cast("double") -
          col("sy_c").cast("double") / col("n_c").cast("double"))).as("wsum"))
      .select(lit("(all)").as("stratum"), col("n_t"), col("n_c"),
        QueryDef.dec4(col("wsum") / col("n_t").cast("double")).as("att"))
    per.union(overall)
  }

  // treatment = even order key (the q197/q216 arm convention), outcome =
  // order value in cents, covariate = the customer's account balance
  private def q230(s: SparkSession, dir: String): DataFrame =
    stratifiedAtt(
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .select(round(col("o_totalprice") * 100).cast("long").as("y"),
          (col("o_orderkey") % 2 === 0).as("t"),
          col("c_acctbal").cast("double").as("x")))
      .orderBy(col("stratum"))

  private val q230Sql =
    """WITH d AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS y,
      |    o_orderkey % 2 = 0 AS t, CAST(c_acctbal AS DOUBLE) AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |b AS (
      |  SELECT list_transform(
      |    quantile_cont(x, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
      |    v -> round(v, 4)) AS bs
      |  FROM d),
      |s AS (
      |  SELECT len(list_filter(bs, v -> round(x, 4) > v)) AS stratum, t, y
      |  FROM d CROSS JOIN b),
      |m AS (
      |  SELECT stratum,
      |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
      |    CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS sy_t,
      |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
      |    CAST(sum(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT) AS sy_c
      |  FROM s GROUP BY stratum)
      |SELECT CAST(stratum AS VARCHAR) AS stratum, n_t, n_c,
      |  CAST(CAST(CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
      |    - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS att
      |FROM m
      |UNION ALL
      |SELECT '(all)', CAST(sum(n_t) AS BIGINT), CAST(sum(n_c) AS BIGINT),
      |  CAST(CAST(sum(CAST(n_t AS DOUBLE) *
      |      (CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
      |        - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE)))
      |    / CAST(sum(n_t) AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR)
      |FROM m
      |ORDER BY stratum""".stripMargin

  // ==== q234: Spearman rank correlation =====================================
  //
  // q194's Pearson on RANKS — the monotone-association measure that heavy
  // tails and outliers cannot distort. Ties take MIDRANKS (the q216
  // convention), kept ×2 so every rank is an exact integer: 2·midrank =
  // 2·S_v + c_v + 1 from the distinct-value histogram's EXCLUSIVE prefix
  // sum — computed with the q122 distributed prefix-scan machinery, so
  // ranking touches |distinct values| rows, never a single-partition
  // window over the corpus. Both rank columns join back by value, and ρ
  // is Pearson over exact DECIMAL integer moments — one double division
  // at render.

  /** One row: (n, rho) — Spearman correlation of `xCol`, `yCol`. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def rank2(d: DataFrame, c: String): DataFrame = {
      val h = d.groupBy(col(c)).agg(count(lit(1)).as("__c"))
      graft.chunk.ChunkAssigner.withPrefixSum(
        h, Seq(col(c)), col("__c"), outName = "__s")
        .select(col(c),
          (lit(2L) * col("__s") + col("__c") + 1L).as(s"__r_$c"))
    }
    val d = df.select(col(xCol), col(yCol))
    val ranked = d
      .join(rank2(d, xCol), Seq(xCol))
      .join(rank2(d, yCol), Seq(yCol))
      .select(col(s"__r_$xCol").cast("decimal(18,0)").as("rx"),
        col(s"__r_$yCol").cast("decimal(18,0)").as("ry"))
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(col("rx") * col("ry")).as("sxy"),
      sum(col("rx") * col("rx")).as("sxx"),
      sum(col("ry") * col("ry")).as("syy"))
    def dd(c: String) = col(c).cast("double")
    val num = dd("n") * dd("sxy") - dd("sx") * dd("sy")
    val denX = dd("n") * dd("sxx") - dd("sx") * dd("sx")
    val denY = dd("n") * dd("syy") - dd("sy") * dd("sy")
    m.select(col("n"),
      QueryDef.dec4(when(denX > 0 && denY > 0,
        num / sqrt(denX * denY))).as("rho"))
  }

  private def q234(s: SparkSession, dir: String): DataFrame =
    spearman(
      Tables.lineitem(s, dir).select(col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c")),
      "qty", "price_c")

  private val q234Sql =
    """WITH d AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
      |  FROM lineitem),
      |hx AS (SELECT qty, count(*) AS c FROM d GROUP BY qty),
      |rx AS (
      |  SELECT qty, 2 * COALESCE(sum(c) OVER (ORDER BY qty
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + c + 1 AS r FROM hx),
      |hy AS (SELECT price_c, count(*) AS c FROM d GROUP BY price_c),
      |ry AS (
      |  SELECT price_c, 2 * COALESCE(sum(c) OVER (ORDER BY price_c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + c + 1 AS r FROM hy),
      |rk AS (
      |  SELECT CAST(rx.r AS HUGEINT) AS rxv, CAST(ry.r AS HUGEINT) AS ryv
      |  FROM d JOIN rx USING (qty) JOIN ry USING (price_c)),
      |m AS (
      |  SELECT count(*) AS n, sum(rxv) AS sx, sum(ryv) AS sy,
      |    sum(rxv * ryv) AS sxy, sum(rxv * rxv) AS sxx,
      |    sum(ryv * ryv) AS syy
      |  FROM rk)
      |SELECT n,
      |  CAST(CAST(CASE WHEN
      |      CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS rho
      |FROM m""".stripMargin

  // ==== q256: Wasserstein-1 (earth mover) drift ==============================
  //
  // The magnitude-aware companion to q131's KS and q161's TV: W1 =
  // ∫|F_a − F_b|dx feels HOW FAR the mass moved, not just the worst
  // vertical gap. Discrete identity over the distinct-value histogram:
  // W1 = Σ_v |F_a(v) − F_b(v)|·(next(v) − v). Same machinery as q131
  // (per-value two-side counts in one groupBy, exclusive prefix scans for
  // both CDFs) plus a THIRD prefix scan of 1s that dense-indexes the
  // distinct values — next(v) then comes from a co-partitioned self-join
  // on idx = idx+1, NOT a global window (the q122 no-corpus-window rule;
  // the final interval contributes 0 because both CDFs are 1 there, so
  // the inner join dropping it is exact). Everything is integer: the
  // per-interval term |cum_a·n_b − cum_b·n_a|·gap sums as DECIMAL and ONE
  // division renders W1.

  /** One row: (w1, n_a, n_b) — earth-mover distance between the two
    * `sideA` slices of integer-cent `colName`, in value units. */
  def wassersteinDrift(df: DataFrame, colName: String, sideA: Column)
      : DataFrame = {
    val counts = df
      .select(col(colName).as("v"), when(sideA, 1L).otherwise(0L).as("a"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val scanned = graft.chunk.ChunkAssigner.withPrefixSum(
      graft.chunk.ChunkAssigner.withPrefixSum(
        graft.chunk.ChunkAssigner.withPrefixSum(
          counts, Seq(col("v")), col("ca"), outName = "pa"),
        Seq(col("v")), col("cb"), outName = "pb"),
      Seq(col("v")), lit(1L), outName = "idx")
    val nxt = scanned.select((col("idx") - 1L).as("idx"),
      col("v").as("v_next"))
    val totals = broadcast(counts.agg(sum(col("ca")).as("na"),
      sum(col("cb")).as("nb")))
    scanned.join(nxt, Seq("idx")).crossJoin(totals)
      .select(
        // cumulative counts cast to DECIMAL BEFORE the cross-multiply:
        // cum·n exceeds 2^63 once both slices pass ~3e9 rows, and a Long
        // product would wrap silently while the HUGEINT oracle stays exact
        (abs((col("pa") + col("ca")).cast("decimal(38,0)") * col("nb") -
          (col("pb") + col("cb")).cast("decimal(38,0)") * col("na")) *
          (col("v_next") - col("v"))).as("term"),
        col("na"), col("nb"))
      .groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(sum(col("term")).as("num"))
      .select(
        QueryDef.dec4(col("num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double") *
            lit(100.0))).as("w1"),
        col("n_a"), col("n_b"))
  }

  private def q256(s: SparkSession, dir: String): DataFrame =
    wassersteinDrift(
      Tables.events(s, dir)
        .select(round(col("value") * 100).cast("long").as("vc"),
          col("event_id")),
      "vc", col("event_id") % 2 === 0)

  private val q256Sql =
    """WITH counts AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |      AS cb
      |  FROM events GROUP BY 1),
      |cdf AS (
      |  SELECT v, lead(v) OVER (ORDER BY v) AS v_next,
      |    sum(ca) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
      |    sum(cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
      |  FROM counts),
      |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |  CAST(sum(cb) AS BIGINT) AS nb FROM counts)
      |SELECT
      |  CAST(CAST(CAST(sum(CAST(abs(cum_a * nb - cum_b * na) AS HUGEINT)
      |      * (v_next - v)) AS DOUBLE)
      |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 100.0)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS w1,
      |  na AS n_a, nb AS n_b
      |FROM cdf CROSS JOIN tot
      |WHERE v_next IS NOT NULL
      |GROUP BY na, nb""".stripMargin

  // ==== q253: Kruskal–Wallis k-group rank test ===============================
  //
  // The k-group generalization of q216's Mann–Whitney: do the per-group
  // value distributions differ in location? H = 12/(N(N+1)) · Σ_g R_g²/n_g
  // − 3(N+1) over pooled midranks, with the tie correction H/C,
  // C = 1 − Σ_t(t³−t)/(N³−N). Rank machinery is q234's: DOUBLED midranks
  // (2·midrank = 2·prefix + c + 1) from the distinct-value histogram's
  // exclusive prefix scan, so ranking touches |distinct values| rows and
  // every per-group rank sum R2_g = 2R_g is an exact DECIMAL integer.
  //
  // Float discipline: Σ_g R_g²/n_g is NOT an integer, so the per-group
  // term is floored — ⌊R2_g²/(4n_g)⌋, ONE double expression per GROUP row
  // computed from exact integers (same doubles both engines, the q195
  // per-domain-row rule) — and the floored terms sum exactly; H does its
  // remaining arithmetic on that one summed integer. Scale shape: one
  // corpus groupBy (value histogram), one prefix scan on the distinct
  // domain, one corpus join back + group rollup — no corpus-sized window.

  /** One row: (n, k, h, h_tie_corrected) — Kruskal–Wallis H across the
    * groups of `group` on integerized `valueCol`. */
  def kruskalWallis(df: DataFrame, group: String, valueCol: String)
      : DataFrame = {
    val d = df.select(col(group).as("g"), col(valueCol).as("v"))
    val h = d.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val ranked = graft.chunk.ChunkAssigner.withPrefixSum(
      h, Seq(col("v")), col("c"), "s")
      .select(col("v"), (lit(2L) * col("s") + col("c") + 1L).as("r2"))
    val grp = d.join(ranked, Seq("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"),
        sum(col("r2").cast("decimal(38,0)")).as("rr2"))
    val terms = grp.agg(
      sum(floor((col("rr2").cast("double") * col("rr2").cast("double")) /
        (lit(4.0) * col("n_g").cast("double"))).cast("decimal(38,0)"))
        .as("tsum"),
      sum(col("n_g")).as("n"), count(lit(1)).as("k"))
    val ties = h.agg(sum(col("c").cast("decimal(38,0)") * col("c") * col("c")
      - col("c")).as("tt"))
    def dd(c: Column) = c.cast("double")
    val nD = dd(col("n"))
    val hStat = lit(12.0) / (nD * (nD + lit(1.0))) * dd(col("tsum")) -
      lit(3.0) * (nD + lit(1.0))
    val corr = lit(1.0) - dd(col("tt")) / (nD * nD * nD - nD)
    terms.crossJoin(broadcast(ties)).select(
      col("n"), col("k"),
      QueryDef.dec4(hStat).as("h"),
      QueryDef.dec4(when(corr > 0, hStat / corr)).as("h_tie_corrected"))
  }

  private def q253(s: SparkSession, dir: String): DataFrame =
    kruskalWallis(
      Tables.events(s, dir).select(col("event_type"),
        round(col("value") * 100).cast("long").as("vq")),
      "event_type", "vq")

  private val q253Sql =
    """WITH d AS (
      |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events),
      |h AS (SELECT v, count(*) AS c FROM d GROUP BY v),
      |rk AS (
      |  SELECT v, 2 * COALESCE(sum(c) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + c + 1 AS r2 FROM h),
      |grp AS (
      |  SELECT g, count(*) AS n_g, CAST(sum(r2) AS HUGEINT) AS rr2
      |  FROM d JOIN rk USING (v) GROUP BY g),
      |terms AS (
      |  SELECT CAST(sum(CAST(floor(CAST(rr2 AS DOUBLE) * CAST(rr2 AS DOUBLE)
      |      / (4.0 * CAST(n_g AS DOUBLE))) AS HUGEINT)) AS HUGEINT) AS tsum,
      |    CAST(sum(n_g) AS BIGINT) AS n, count(*) AS k
      |  FROM grp),
      |ties AS (
      |  SELECT CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS tt
      |  FROM h)
      |SELECT n, k,
      |  CAST(CAST(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
      |    * CAST(tsum AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS h,
      |  CAST(CAST(CASE WHEN
      |      1.0 - CAST(tt AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |        * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) > 0
      |    THEN (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
      |        * CAST(tsum AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0))
      |      / (1.0 - CAST(tt AS DOUBLE) / (CAST(n AS DOUBLE)
      |        * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS h_tie_corrected
      |FROM terms CROSS JOIN ties""".stripMargin

  // ==== q243: Kendall tau-b rank correlation ================================
  //
  // The pair-concordance companion to q234's Spearman: tau-b counts
  // concordant vs discordant pairs and corrects BOTH tie dimensions,
  // τ_b = (C−D)/√((T0−Tx)(T0−Ty)). A naive pair scan is O(n²) — dead at
  // 100 TB. Scale shape: collapse the corpus to the JOINT-VALUE histogram
  // (x, y, c) in one map-side-combined groupBy (the q213 contingency /
  // B8 bounded-domain contract: integerized measures with modest value
  // domains, here |qty|·|disc| ≤ 550 cells), then count pairs on the CELL
  // domain — C = Σ_{ax<bx, ay<by} ca·cb over an O(cells²) broadcast
  // nested-loop join that never touches corpus rows. Tie terms come from
  // the cell marginals. All counts accumulate as DECIMAL(38,0) (n²-scaled
  // quantities overflow BIGINT past ~4.3e9 rows); doubling the tie terms
  // (U = 2(T0−Tx)) keeps every intermediate an exact integer — no /2 —
  // and τ_b = 2(C−D)/√(U·V) does ONE double division at render.

  /** One row: (n, n_cells, concordant, discordant, tau_b) — Kendall tau-b
    * between integerized `xCol` and `yCol`. Contract: bounded joint value
    * domain (cells² pairs are enumerated), ENFORCED — the histogram is
    * materialized once (also collapsing the five downstream reuses into
    * one corpus scan) and a joint domain over `maxCells` raises before
    * the O(cells²) BNL can run; pre-bin continuous inputs (the q166
    * fixed-grid histogram) to fit the contract. */
  def kendallTau(df: DataFrame, xCol: String, yCol: String,
      maxCells: Long = 10000L): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("c"))
      .localCheckpoint()
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"kendallTau: joint value domain has $nCells cells > maxCells=" +
        s"$maxCells — the O(cells^2) pair enumeration would be " +
        "corpus-quadratic; bin the inputs first (q166 fixed-grid histogram)")
    val a = cells.select(col("x").as("ax"), col("y").as("ay"),
      col("c").as("ca"))
    val b = cells.select(col("x").as("bx"), col("y").as("by"),
      col("c").as("cb"))
    val zero = lit(0).cast("decimal(38,0)")
    val cd = a.join(broadcast(b), col("ax") < col("bx"))
      .agg(
        coalesce(sum(when(col("ay") < col("by"), col("ca") * col("cb"))),
          zero).as("conc"),
        coalesce(sum(when(col("ay") > col("by"), col("ca") * col("cb"))),
          zero).as("disc"))
    val m = cells.agg(count(lit(1)).as("n_cells"), sum(col("c")).as("n"))
    // 2·(T0 − Ttie) = (n² − n) − Σ_g (c_g² − c_g), per tie dimension
    val tx = cells.groupBy(col("x")).agg(sum(col("c")).as("cx"))
      .agg(coalesce(sum(col("cx") * col("cx") - col("cx")), zero).as("sx"))
    val ty = cells.groupBy(col("y")).agg(sum(col("c")).as("cy"))
      .agg(coalesce(sum(col("cy") * col("cy") - col("cy")), zero).as("sy"))
    def dd(c: Column) = c.cast("double")
    m.crossJoin(broadcast(cd)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .select(col("n").cast("long").as("n"), col("n_cells"),
        col("conc").cast(org.apache.spark.sql.types.StringType)
          .as("concordant"),
        col("disc").cast(org.apache.spark.sql.types.StringType)
          .as("discordant"),
        QueryDef.dec4 {
          val u = dd(col("n")) * dd(col("n")) - dd(col("n")) - dd(col("sx"))
          val v = dd(col("n")) * dd(col("n")) - dd(col("n")) - dd(col("sy"))
          when(u > 0 && v > 0,
            lit(2.0) * (dd(col("conc")) - dd(col("disc"))) / sqrt(u * v))
        }.as("tau_b"))
  }

  private def q243(s: SparkSession, dir: String): DataFrame =
    kendallTau(
      Tables.lineitem(s, dir).select(
        col("l_quantity").cast("long").as("qty"),
        round(col("l_discount") * 100).cast("long").as("disc_c")),
      "qty", "disc_c")

  private val q243Sql =
    """WITH d AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_discount * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |cells AS (
      |  SELECT x, y, CAST(count(*) AS HUGEINT) AS c FROM d GROUP BY x, y),
      |cd AS (
      |  SELECT
      |    COALESCE(sum(CASE WHEN a.y < b.y THEN a.c * b.c END),
      |      CAST(0 AS HUGEINT)) AS conc,
      |    COALESCE(sum(CASE WHEN a.y > b.y THEN a.c * b.c END),
      |      CAST(0 AS HUGEINT)) AS disc
      |  FROM cells a JOIN cells b ON a.x < b.x),
      |m AS (SELECT count(*) AS n_cells, sum(c) AS n FROM cells),
      |tx AS (
      |  SELECT COALESCE(sum(cx * cx - cx), CAST(0 AS HUGEINT)) AS sx
      |  FROM (SELECT sum(c) AS cx FROM cells GROUP BY x)),
      |ty AS (
      |  SELECT COALESCE(sum(cy * cy - cy), CAST(0 AS HUGEINT)) AS sy
      |  FROM (SELECT sum(c) AS cy FROM cells GROUP BY y))
      |SELECT CAST(m.n AS BIGINT) AS n, m.n_cells,
      |  CAST(cd.conc AS VARCHAR) AS concordant,
      |  CAST(cd.disc AS VARCHAR) AS discordant,
      |  CAST(CAST(CASE WHEN
      |      CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE) - CAST(m.n AS DOUBLE)
      |        - CAST(tx.sx AS DOUBLE) > 0
      |      AND CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE) - CAST(m.n AS DOUBLE)
      |        - CAST(ty.sy AS DOUBLE) > 0
      |    THEN 2.0 * (CAST(cd.conc AS DOUBLE) - CAST(cd.disc AS DOUBLE))
      |      / sqrt((CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
      |          - CAST(m.n AS DOUBLE) - CAST(tx.sx AS DOUBLE))
      |        * (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
      |          - CAST(m.n AS DOUBLE) - CAST(ty.sy AS DOUBLE)))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS tau_b
      |FROM m CROSS JOIN cd CROSS JOIN tx CROSS JOIN ty""".stripMargin

  // ==== q271: McNemar's paired test ==========================================
  //
  // The PAIRED twin of the two-sample tests (q197/q216): each subject is
  // its own control, so only the DISCORDANT pairs carry information —
  // b = #(yes,no), c = #(no,yes), χ² = (|b−c|−1)²/(b+c) with the
  // continuity correction. Here each user is paired across conditions:
  // did they purchase on even-indexed days vs odd-indexed days (a
  // deterministic within-subject split, no scalar broadcast needed).
  // Scale shape: ONE user-domain aggregation (two conditional max flags)
  // → one 4-cell rollup; exact integers until the single final division.

  /** One row: (n_pairs, n_both, n_neither, b, c, chi2) — McNemar over
    * per-`idCol` paired booleans `cond1` and `cond2`. */
  def mcnemar(df: DataFrame, idCol: String, cond1: Column,
      cond2: Column): DataFrame = {
    val flags = df.groupBy(col(idCol))
      .agg(max(when(cond1, 1L).otherwise(0L)).as("y1"),
        max(when(cond2, 1L).otherwise(0L)).as("y2"))
    flags.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("y1") === 1 && col("y2") === 1, 1L).otherwise(0L))
        .as("n_both"),
      sum(when(col("y1") === 0 && col("y2") === 0, 1L).otherwise(0L))
        .as("n_neither"),
      sum(when(col("y1") === 1 && col("y2") === 0, 1L).otherwise(0L))
        .as("b"),
      sum(when(col("y1") === 0 && col("y2") === 1, 1L).otherwise(0L))
        .as("c"))
      .select(col("n_pairs"), col("n_both"), col("n_neither"), col("b"),
        col("c"),
        when(col("b") + col("c") > 0,
          (abs(col("b") - col("c")) - lit(1L)).cast("double") *
            (abs(col("b") - col("c")) - lit(1L)).cast("double") /
            (col("b") + col("c")).cast("double")).as("chi2"))
  }

  private def q271(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("di"))
    mcnemar(e, "user_id",
      col("event_type") === "purchase" && col("di") % 2 === 0,
      col("event_type") === "purchase" && col("di") % 2 === 1)
      .select(col("n_pairs"), col("n_both"), col("n_neither"), col("b"),
        col("c"), QueryDef.dec4(col("chi2")).as("chi2"))
  }

  private val q271Sql =
    """WITH f AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase'
      |      AND datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 2 = 0
      |      THEN 1 ELSE 0 END) AS y1,
      |    max(CASE WHEN event_type = 'purchase'
      |      AND datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 2 = 1
      |      THEN 1 ELSE 0 END) AS y2
      |  FROM events GROUP BY user_id),
      |m AS (
      |  SELECT count(*) AS n_pairs,
      |    CAST(sum(CASE WHEN y1 = 1 AND y2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_both,
      |    CAST(sum(CASE WHEN y1 = 0 AND y2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_neither,
      |    CAST(sum(CASE WHEN y1 = 1 AND y2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS b,
      |    CAST(sum(CASE WHEN y1 = 0 AND y2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c
      |  FROM f)
      |SELECT n_pairs, n_both, n_neither, b, c,
      |  CAST(CAST(CASE WHEN b + c > 0
      |    THEN CAST(abs(b - c) - 1 AS DOUBLE) * CAST(abs(b - c) - 1 AS DOUBLE)
      |      / CAST(b + c AS DOUBLE) END AS DECIMAL(38,4)) AS VARCHAR) AS chi2
      |FROM m""".stripMargin

  // ==== q272: Cohen's d / Hedges' g effect sizes =============================
  //
  // The magnitude readout the q197 t-statistic deliberately omits (t
  // grows with n; d does not): standardized mean difference against the
  // POOLED sd, d = (m1−m0)/s_p with s_p² = ((n0−1)v0 + (n1−1)v1)/(n0+n1−2),
  // and the small-sample-unbiased Hedges' g = d·(1 − 3/(4(n0+n1)−9)).
  // Same exact-decimal cent moments as q197 (one map-side-combined pass);
  // every double op downstream consumes identical BIGINT/DECIMAL inputs in
  // identical order, so both engines render identical bits.

  /** Per `group`: (n0, n1, d, g) — Cohen's d and Hedges' g of integer
    * column `x` between arms of `armExpr` (1 minus 0). Degenerate groups
    * (either arm < 2, or zero pooled variance) report nulls. */
  def cohensD(df: DataFrame, group: String, x: String,
      armExpr: String): DataFrame = {
    val m = df.groupBy(col(group),
      when(expr(armExpr), 1L).otherwise(0L).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col(x).cast("decimal(18,0)")).as("s"),
        sum(col(x).cast("decimal(18,0)") * col(x).cast("decimal(18,0)"))
          .as("ss"))
    def side(a: Int) = m.filter(col("arm") === a)
      .select(col(group), col("n").as(s"n$a"), col("s").as(s"s$a"),
        col("ss").as(s"ss$a"))
    val j = side(0).join(side(1), Seq(group))
    def dd(c: String) = col(c).cast("double")
    def v(a: Int) =
      (dd(s"n$a") * dd(s"ss$a") - dd(s"s$a") * dd(s"s$a")) /
        (dd(s"n$a") * (dd(s"n$a") - lit(1.0)))
    val sp2 = ((dd("n0") - lit(1.0)) * v(0) + (dd("n1") - lit(1.0)) * v(1)) /
      (dd("n0") + dd("n1") - lit(2.0))
    val d = (dd("s1") / dd("n1") - dd("s0") / dd("n0")) / sqrt(sp2)
    val ok = col("n0") > 1 && col("n1") > 1 && sp2 > 0
    j.select(col(group), col("n0"), col("n1"),
      when(ok, d).as("d"),
      when(ok, d * (lit(1.0) - lit(3.0) /
        (lit(4.0) * (dd("n0") + dd("n1")) - lit(9.0)))).as("g"))
  }

  private def q272(s: SparkSession, dir: String): DataFrame =
    cohensD(
      Tables.orders(s, dir).select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey")),
      "o_orderpriority", "cents", "o_orderkey % 2 = 0")
      .select(col("o_orderpriority"), col("n0"), col("n1"),
        QueryDef.dec4(col("d")).as("d"), QueryDef.dec4(col("g")).as("g"))
      .orderBy(col("o_orderpriority"))

  private val q272Sql =
    """WITH d AS (
      |  SELECT o_orderpriority AS grp,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS arm,
      |    CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(18,0))
      |      AS x
      |  FROM orders),
      |m AS (
      |  SELECT grp, arm, count(*) AS n, CAST(sum(x) AS DECIMAL(38,0)) AS s,
      |    CAST(sum(x * x) AS DECIMAL(38,0)) AS ss
      |  FROM d GROUP BY 1, 2),
      |j AS (
      |  SELECT a.grp, a.n AS n0, a.s AS s0, a.ss AS ss0,
      |    b.n AS n1, b.s AS s1, b.ss AS ss1
      |  FROM m a JOIN m b ON a.grp = b.grp AND a.arm = 0 AND b.arm = 1),
      |c AS (
      |  SELECT grp, n0, n1,
      |    ((CAST(n0 AS DOUBLE) - 1.0) *
      |      ((CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
      |        - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
      |       / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0)))
      |     + (CAST(n1 AS DOUBLE) - 1.0) *
      |      ((CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |       / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))))
      |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 2.0) AS sp2,
      |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |      - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff
      |  FROM j)
      |SELECT grp AS o_orderpriority, n0, n1,
      |  CAST(CAST(CASE WHEN n0 > 1 AND n1 > 1 AND sp2 > 0
      |    THEN diff / sqrt(sp2) END AS DECIMAL(38,4)) AS VARCHAR) AS d,
      |  CAST(CAST(CASE WHEN n0 > 1 AND n1 > 1 AND sp2 > 0
      |    THEN diff / sqrt(sp2) * (1.0 - 3.0 /
      |      (4.0 * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) - 9.0))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS g
      |FROM c ORDER BY o_orderpriority""".stripMargin

  // ==== q273: Cliff's delta (ordinal dominance) ==============================
  //
  // The nonparametric effect size completing q216's Mann–Whitney U:
  // δ = [#(x>y) − #(x<y)] / (n_a·n_b) over all cross-group pairs —
  // computed WITHOUT enumerating pairs: per distinct value v, A-count
  // ca(v) meets the exclusive B-prefix pb(v) (= #B < v), so
  // #(x>y) = Σ ca(v)·pb(v) and #(x<y) = Σ ca(v)·(nb − pb(v) − cb(v)).
  // The same range-partitioned distinct-value prefix scan as q131/q122 —
  // sort touches |distinct| rows, never the corpus. Products go through
  // DECIMAL(38,0) (counts multiply to ~n², past 2^63 at scale — the
  // q242/q256 overflow rule); δ is one division of exact decimals.

  /** One row: (n_a, n_b, gt_pairs, lt_pairs, delta) — Cliff's δ of
    * `colName` between `sideA` rows (A) and the rest (B). */
  def cliffsDelta(df: DataFrame, colName: String, sideA: Column): DataFrame = {
    val counts = df
      .select(col(colName).as("v"), when(sideA, 1L).otherwise(0L).as("a"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val scanned = graft.chunk.ChunkAssigner.withPrefixSum(
      counts, Seq(col("v")), col("cb"), outName = "pb")
    val totals = broadcast(counts.agg(
      sum(col("ca")).cast("decimal(38,0)").as("na"),
      sum(col("cb")).cast("decimal(38,0)").as("nb")))
    scanned.crossJoin(totals)
      .select(col("na"), col("nb"),
        (col("ca").cast("decimal(38,0)") * col("pb").cast("decimal(38,0)"))
          .as("gt"),
        (col("ca").cast("decimal(38,0)") *
          (col("nb") - col("pb") - col("cb"))).as("lt"))
      .groupBy(col("na"), col("nb"))
      .agg(sum(col("gt")).as("gt_pairs"), sum(col("lt")).as("lt_pairs"))
      .select(col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        col("gt_pairs").cast("long").as("gt_pairs"),
        col("lt_pairs").cast("long").as("lt_pairs"),
        when(col("na") > 0 && col("nb") > 0,
          (col("gt_pairs") - col("lt_pairs")).cast("double") /
            (col("na") * col("nb")).cast("double")).as("delta"))
  }

  private def q273(s: SparkSession, dir: String): DataFrame =
    cliffsDelta(Tables.events(s, dir)
        .select(round(col("value") * 100).cast("long").as("cents"),
          col("event_type")),
      "cents", col("event_type") === "purchase")
      .select(col("n_a"), col("n_b"), col("gt_pairs"), col("lt_pairs"),
        QueryDef.dec4(col("delta")).as("delta"))

  private val q273Sql =
    """WITH counts AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
      |      AS BIGINT) AS cb
      |  FROM events GROUP BY 1),
      |cdf AS (
      |  SELECT v, ca, cb,
      |    COALESCE(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND 1 PRECEDING), 0) AS pb
      |  FROM counts),
      |t AS (SELECT CAST(sum(ca) AS HUGEINT) AS na,
      |  CAST(sum(cb) AS HUGEINT) AS nb FROM counts),
      |s AS (
      |  SELECT max(na) AS na, max(nb) AS nb,
      |    CAST(sum(CAST(ca AS HUGEINT) * pb) AS HUGEINT) AS gt_pairs,
      |    CAST(sum(CAST(ca AS HUGEINT) * (nb - pb - cb)) AS HUGEINT)
      |      AS lt_pairs
      |  FROM cdf CROSS JOIN t)
      |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  CAST(gt_pairs AS BIGINT) AS gt_pairs,
      |  CAST(lt_pairs AS BIGINT) AS lt_pairs,
      |  CAST(CAST(CASE WHEN na > 0 AND nb > 0
      |    THEN CAST(gt_pairs - lt_pairs AS DOUBLE)
      |      / CAST(na * nb AS DOUBLE) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS delta
      |FROM s""".stripMargin

  // ==== q275: t-closeness privacy audit ======================================
  //
  // The third rung of the q202 ladder (k-anonymity → l-diversity →
  // t-CLOSENESS, Li et al. 2007): an equivalence class can be k-large and
  // l-diverse yet still leak — if its sensitive-attribute DISTRIBUTION
  // differs sharply from the table's, membership itself is informative.
  // For an ORDERED sensitive attribute the distance is the 1-D earth
  // mover's: EMD = Σ_j |CumP_j − CumQ_j| / (m−1) over the m ordered
  // buckets. Exactness: the per-bucket term is |CumP_j·N − CumQ_j·n_c| —
  // an exact DECIMAL integer (cross-multiplied, the q256 rule) — summed
  // exactly; ONE double division per class at render. Scale shape: one
  // groupBy to the (class × bucket) domain, window prefix sums over ≤m
  // rows per class, a broadcast global distribution — nothing touches
  // rows twice.

  /** Per class (`qi` columns): (class_size, t_emd) — ordered-EMD
    * t-closeness of integer bucket column `bucket` (values 0..m−1)
    * against the whole table's distribution. */
  def tCloseness(df: DataFrame, qi: Seq[String], bucket: String,
      m: Int): DataFrame = {
    val cls = df.groupBy((qi.map(col) :+ col(bucket).as("b")): _*)
      .agg(count(lit(1)).as("cnt"))
    val glob = broadcast(df.groupBy(col(bucket).as("b"))
      .agg(count(lit(1)).as("gcnt")))
    // dense bucket grid per class (missing buckets still advance the CDF)
    val classes = cls.groupBy(qi.map(col): _*)
      .agg(sum(col("cnt")).as("n_c"))
    val grid = classes.select((qi.map(col) :+ col("n_c") :+
      explode(sequence(lit(0), lit(m - 1))).as("b")): _*)
    val joined = grid
      .join(cls, qi :+ "b", "left")
      .join(glob, Seq("b"), "left")
      .na.fill(0L, Seq("cnt", "gcnt"))
    val w = Window.partitionBy(qi.map(col): _*).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = broadcast(df.agg(count(lit(1)).as("n_tot")))
    joined
      .withColumn("cum_c", sum(col("cnt")).over(w))
      .withColumn("cum_g", sum(col("gcnt")).over(w))
      .crossJoin(totals)
      .filter(col("b") < m - 1) // the last cum term is always 0
      .select((qi.map(col) :+ col("n_c") :+ col("n_tot") :+
        abs(col("cum_c").cast("decimal(38,0)") * col("n_tot") -
          col("cum_g").cast("decimal(38,0)") * col("n_c")).as("term")): _*)
      .groupBy((qi.map(col) :+ col("n_c") :+ col("n_tot")): _*)
      .agg(sum(col("term")).as("emd_num"))
      .select((qi.map(col) :+ col("n_c").as("class_size") :+
        (col("emd_num").cast("double") /
          (col("n_c").cast("double") * col("n_tot").cast("double") *
            lit((m - 1).toDouble))).as("t_emd")): _*)
  }

  private def q275(s: SparkSession, dir: String): DataFrame =
    tCloseness(
      Tables.customer(s, dir).select(col("c_mktsegment"),
        col("c_nationkey"),
        least(greatest(floor((col("c_acctbal") + 1000.0) / 1100.0), lit(0.0)),
          lit(9.0)).cast("long").as("db")),
      Seq("c_mktsegment", "c_nationkey"), "db", m = 10)
      .select(col("c_mktsegment"), col("c_nationkey"), col("class_size"),
        QueryDef.dec4(col("t_emd")).as("t_emd"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  private val q275Sql =
    """WITH d AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    CAST(least(greatest(floor((c_acctbal + 1000.0) / 1100.0), 0.0),
      |      9.0) AS BIGINT) AS b
      |  FROM customer),
      |cls AS (
      |  SELECT c_mktsegment, c_nationkey, b, count(*) AS cnt
      |  FROM d GROUP BY 1, 2, 3),
      |classes AS (
      |  SELECT c_mktsegment, c_nationkey, CAST(sum(cnt) AS BIGINT) AS n_c
      |  FROM cls GROUP BY 1, 2),
      |gdist AS (SELECT b, count(*) AS gcnt FROM d GROUP BY 1),
      |tot AS (SELECT count(*) AS n_tot FROM d),
      |grid AS (
      |  SELECT c.c_mktsegment, c.c_nationkey, c.n_c, g.b
      |  FROM classes c CROSS JOIN (SELECT unnest(range(0, 10)) AS b) g),
      |cum AS (
      |  SELECT grid.c_mktsegment, grid.c_nationkey, grid.n_c, grid.b,
      |    sum(COALESCE(cls.cnt, 0)) OVER (
      |      PARTITION BY grid.c_mktsegment, grid.c_nationkey
      |      ORDER BY grid.b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
      |      ROW) AS cum_c,
      |    sum(COALESCE(gdist.gcnt, 0)) OVER (
      |      PARTITION BY grid.c_mktsegment, grid.c_nationkey
      |      ORDER BY grid.b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
      |      ROW) AS cum_g
      |  FROM grid
      |    LEFT JOIN cls ON cls.c_mktsegment = grid.c_mktsegment
      |      AND cls.c_nationkey = grid.c_nationkey AND cls.b = grid.b
      |    LEFT JOIN gdist ON gdist.b = grid.b)
      |SELECT c_mktsegment, c_nationkey,
      |  max(n_c) AS class_size,
      |  CAST(CAST(CAST(sum(abs(CAST(cum_c AS HUGEINT) * n_tot
      |      - CAST(cum_g AS HUGEINT) * n_c)) AS DOUBLE)
      |    / (CAST(max(n_c) AS DOUBLE) * CAST(max(n_tot) AS DOUBLE) * 9.0)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS t_emd
      |FROM cum CROSS JOIN tot
      |WHERE b < 9
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ==== q279: Mann–Kendall trend test =========================================
  //
  // The significance twin of q190's Theil–Sen slope (the standard pairing
  // in environmental/KPI monitoring): S = Σ_{i<j} sign(y_j − y_i) over the
  // day-indexed series, Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 with
  // the tie correction, z = (S∓1)/√Var(S) continuity-corrected. The pair
  // space is the DAY-domain self-join per type (days² — a calendar
  // constant, never event volume; the q243 bounded-domain rule), ties come
  // from the (type, count)-domain; S and the variance numerator are exact
  // integers, z is one double expression over them.

  /** Per `group`: (n_days, s_stat, var18_num, z) — Mann–Kendall over the
    * daily `y` series (one row per (group, day index `di`)). */
  def mannKendall(daily: DataFrame, group: String): DataFrame = {
    val a = daily.select(col(group), col("di").as("i"), col("y").as("yi"))
    val b = daily.select(col(group), col("di").as("j"), col("y").as("yj"))
    val s = a.join(b, Seq(group)).filter(col("i") < col("j"))
      .groupBy(col(group))
      .agg(sum(signum(col("yj") - col("yi")).cast("long")).as("s_stat"))
    val n = daily.groupBy(col(group)).agg(count(lit(1)).as("n"))
    val ties = daily.groupBy(col(group), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col(group))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
        .as("tie_sum"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    n.join(ties, Seq(group)).join(s, Seq(group))
      .select(col(group), col("n").as("n_days"), col("s_stat"),
        (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) -
          col("tie_sum")).as("var18_num"))
      .withColumn("z", when(col("var18_num") > 0,
        when(col("s_stat") > 0,
          dd(col("s_stat") - 1) / sqrt(dd(col("var18_num")) / lit(18.0)))
          .when(col("s_stat") < 0,
            dd(col("s_stat") + 1) / sqrt(dd(col("var18_num")) / lit(18.0)))
          .otherwise(lit(0.0))))
  }

  private def q279(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("di"))
      .agg(count(lit(1)).as("y"))
    mannKendall(daily, "event_type")
      .select(col("event_type"), col("n_days"), col("s_stat"),
        col("var18_num"), QueryDef.dec4(col("z")).as("z"))
      .orderBy(col("event_type"))
  }

  private val q279Sql =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS di,
      |    count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT a.event_type,
      |    CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
      |      ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.di < b.di
      |  GROUP BY 1),
      |n AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1),
      |ties AS (
      |  SELECT event_type,
      |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
      |  FROM (SELECT event_type, y, count(*) AS t FROM daily GROUP BY 1, 2)
      |  GROUP BY 1),
      |j AS (
      |  SELECT n.event_type, n.n AS n_days, s.s_stat,
      |    n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_sum AS var18_num
      |  FROM n JOIN ties USING (event_type) JOIN s USING (event_type))
      |SELECT event_type, n_days, s_stat, CAST(var18_num AS BIGINT)
      |    AS var18_num,
      |  CAST(CAST(CASE WHEN var18_num > 0 THEN
      |      CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
      |          / sqrt(CAST(var18_num AS DOUBLE) / 18.0)
      |        WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
      |          / sqrt(CAST(var18_num AS DOUBLE) / 18.0)
      |        ELSE 0.0 END
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS z
      |FROM j ORDER BY event_type""".stripMargin

  // ==== q280/q281: one-way ANOVA F + Levene (Brown–Forsythe) =================
  //
  // q281 is the parametric k-group mean test (Kruskal–Wallis q253's moment
  // twin); q280 is the VARIANCE-homogeneity gate run before it — the
  // Brown–Forsythe variant (deviations from the group MEDIAN, the robust
  // standard), which is just ANOVA F on z = |x − med|. One shared kernel.
  //
  // Float discipline: group moments are exact decimals; the per-group
  // between-term ⌊10⁶·S_g²/n_g⌋ is floored ONCE from an identical double
  // expression (the q261 rule) so the k-term sum is an exact integer —
  // order-free where a raw double Σ S_g²/n_g would hang on aggregation
  // order. Deviations use 2·median (integer x ⇒ the interpolated median
  // is a half-integer ⇒ 2·med is an exact integer), so z is an exact
  // integer and Levene reuses the kernel unchanged. Scale shape: one
  // map-side-combined moment pass (+ one broadcast median join for
  // Levene); everything downstream is k-row arithmetic.

  /** One row: (k, n, f) — one-way ANOVA F of integer column `x` across
    * `group`. Degenerate inputs (k < 2, n ≤ k, zero within-variance)
    * report null f. */
  def anovaF(df: DataFrame, group: String, x: String): DataFrame = {
    val xd = col(x).cast("decimal(18,0)")
    val g = df.groupBy(col(group))
      .agg(count(lit(1)).as("n_g"), sum(xd).as("s_g"),
        sum(xd * xd).as("ss_g"))
    def dd(c: String) = col(c).cast("double")
    // the k-term cross-group sum A = Σ s_g²/n_g is the only
    // order-sensitive double sum; magnitudes (s² ~ corpus²) rule out
    // integer flooring, so it runs as a LEFT-TO-RIGHT fold over the
    // group-ORDERED term array (the q133 identical-double-chain rule) —
    // both engines add the same doubles in the same order. b and c are
    // SINGLE values (no cross-row sum): plain double / exact decimal.
    val terms = g.select(col("n_g"), col("s_g"), col("ss_g"),
      struct(col(group).as("g"),
        (dd("s_g") * dd("s_g") / dd("n_g")).as("t")).as("gt"))
    terms.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"), sum(col("ss_g")).as("ss"),
        sort_array(collect_list(col("gt"))).as("arr"))
      .select(col("k"), col("n"),
        aggregate(col("arr"), lit(0.0),
          (acc, x) => acc + x.getField("t")).as("a"),
        (dd("s") * dd("s") / dd("n")).as("b"),
        col("ss").cast("decimal(38,0)").as("c"))
      .select(col("k"), col("n"),
        when(col("k") > 1 && col("n") > col("k") &&
          col("c").cast("double") > col("a"),
          ((col("a") - col("b")) *
            (col("n") - col("k")).cast("double")) /
            ((col("c").cast("double") - col("a")) *
              (col("k") - lit(1L)).cast("double"))).as("f"))
  }

  /** One row: (k, n, w) — Brown–Forsythe Levene statistic of integer
    * column `x` across `group` (ANOVA F on |2x − 2·median_g|). */
  def levene(df: DataFrame, group: String, x: String): DataFrame = {
    val med2 = df.groupBy(col(group))
      .agg((expr(s"percentile($x, 0.5)") * 2).cast("long").as("med2"))
    val z = df.join(broadcast(med2), Seq(group))
      .select(col(group), abs(lit(2L) * col(x) - col("med2")).as("z"))
    anovaF(z, group, "z").withColumnRenamed("f", "w")
  }

  private def ordersCents(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(col("o_orderpriority"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))

  private def q281(s: SparkSession, dir: String): DataFrame =
    anovaF(ordersCents(s, dir), "o_orderpriority", "cents")
      .select(col("k"), col("n"), QueryDef.dec4(col("f")).as("f"))

  private def q280(s: SparkSession, dir: String): DataFrame =
    levene(ordersCents(s, dir), "o_orderpriority", "cents")
      .select(col("k"), col("n"), QueryDef.dec4(col("w")).as("w"))

  private val anovaCoreSql =
    """g AS (
      |  SELECT grp, count(*) AS n_g,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS s_g,
      |    CAST(sum(x * x) AS DECIMAL(38,0)) AS ss_g
      |  FROM d GROUP BY grp),
      |t AS (
      |  SELECT n_g, s_g, ss_g, grp,
      |    CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
      |      / CAST(n_g AS DOUBLE) AS a_t
      |  FROM g),
      |m AS (
      |  SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
      |    CAST(sum(s_g) AS DECIMAL(38,0)) AS s,
      |    CAST(sum(ss_g) AS DECIMAL(38,0)) AS ss,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(a_t ORDER BY grp)), (acc, x) -> acc + x) AS a
      |  FROM t),
      |fin AS (
      |  SELECT k, n, a,
      |    CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS b,
      |    ss AS c
      |  FROM m)""".stripMargin

  private val q281Sql =
    s"""WITH d AS (
       |  SELECT o_orderpriority AS grp,
       |    CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(18,0))
       |      AS x
       |  FROM orders),
       |$anovaCoreSql
       |SELECT k, n,
       |  CAST(CAST(CASE WHEN k > 1 AND n > k
       |      AND CAST(c AS DOUBLE) > a
       |    THEN (a - b) * CAST(n - k AS DOUBLE)
       |      / ((CAST(c AS DOUBLE) - a) * CAST(k - 1 AS DOUBLE))
       |    END AS DECIMAL(38,4)) AS VARCHAR) AS f
       |FROM fin""".stripMargin

  private val q280Sql =
    s"""WITH raw AS (
       |  SELECT o_orderpriority AS grp,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders),
       |med AS (
       |  SELECT grp, CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2
       |  FROM raw GROUP BY grp),
       |d AS (
       |  SELECT raw.grp, CAST(abs(2 * cents - med2) AS DECIMAL(18,0)) AS x
       |  FROM raw JOIN med USING (grp)),
       |$anovaCoreSql
       |SELECT k, n,
       |  CAST(CAST(CASE WHEN k > 1 AND n > k
       |      AND CAST(c AS DOUBLE) > a
       |    THEN (a - b) * CAST(n - k AS DOUBLE)
       |      / ((CAST(c AS DOUBLE) - a) * CAST(k - 1 AS DOUBLE))
       |    END AS DECIMAL(38,4)) AS VARCHAR) AS w
       |FROM fin""".stripMargin

  // ==== q284: Cramér–von Mises two-sample statistic ==========================
  //
  // The integral companion to q131's KS (which sees only the max CDF
  // gap — CvM integrates the SQUARED gap over the whole pooled sample,
  // catching distributed many-small-gap drift KS underweights):
  // T = Σ_pooled (F_a − F_b)² · nm/N². On the distinct-value histogram
  // the pooled sum collapses to Σ_v (ca+cb)·(CA·m − CB·n)² with
  // INCLUSIVE cumulative counts — exact DECIMAL integers (cross-
  // multiplied, the q256 rule), then T = Σ / (N²·n·m) in one double
  // division. Same q131/q122 prefix-scan shape: sort touches |distinct|
  // rows, never the corpus.

  /** One row: (n_a, n_b, t) — two-sample Cramér–von Mises T of
    * `colName` between `sideA` rows and the rest. */
  def cramerVonMises(df: DataFrame, colName: String, sideA: Column)
      : DataFrame = {
    val counts = df
      .select(col(colName).as("v"), when(sideA, 1L).otherwise(0L).as("a"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val scanned = graft.chunk.ChunkAssigner.withPrefixSum(
      graft.chunk.ChunkAssigner.withPrefixSum(
        counts, Seq(col("v")), col("ca"), outName = "pa"),
      Seq(col("v")), col("cb"), outName = "pb")
    val totals = broadcast(counts.agg(sum(col("ca")).as("na"),
      sum(col("cb")).as("nb")))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    scanned.crossJoin(totals)
      .select(col("na"), col("nb"),
        (dec(col("ca") + col("cb")) *
          (dec(col("pa") + col("ca")) * col("nb") -
            dec(col("pb") + col("cb")) * col("na")) *
          (dec(col("pa") + col("ca")) * col("nb") -
            dec(col("pb") + col("cb")) * col("na"))).as("term"))
      .groupBy(col("na"), col("nb"))
      .agg(sum(col("term")).as("num"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        when(col("na") > 0 && col("nb") > 0,
          col("num").cast("double") /
            ((col("na") + col("nb")).cast("double") *
              (col("na") + col("nb")).cast("double") *
              col("na").cast("double") * col("nb").cast("double")))
          .as("t"))
  }

  private def q284(s: SparkSession, dir: String): DataFrame =
    cramerVonMises(Tables.events(s, dir)
        .select(round(col("value") * 100).cast("long").as("cents"),
          col("event_id")),
      "cents", col("event_id") % 2 === 0)
      .select(col("n_a"), col("n_b"), QueryDef.dec4(col("t")).as("t"))

  private val q284Sql =
    """WITH counts AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |      AS cb
      |  FROM events GROUP BY 1),
      |cdf AS (
      |  SELECT v, ca, cb,
      |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cuma,
      |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cumb
      |  FROM counts),
      |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |  CAST(sum(cb) AS BIGINT) AS nb FROM counts),
      |s AS (
      |  SELECT max(na) AS na, max(nb) AS nb,
      |    sum(CAST(ca + cb AS HUGEINT)
      |      * (CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
      |      * (CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na))
      |      AS num
      |  FROM cdf CROSS JOIN t)
      |SELECT na AS n_a, nb AS n_b,
      |  CAST(CAST(CASE WHEN na > 0 AND nb > 0
      |    THEN CAST(num AS DOUBLE) /
      |      (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
      |        * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS t
      |FROM s""".stripMargin

  // ==== q329: Anderson–Darling two-sample ======================================
  //
  // The TAIL-weighted member completing the CDF-gap family (KS = max
  // gap, CvM = integrated square, W1 = integrated absolute, energy =
  // pairwise): AD divides each squared gap by H(1−H), so discrepancies
  // in the distribution's tails — exactly where a contamination or
  // truncation bug hides — count hardest. Pettitt's two-sample form on
  // the distinct-value histogram (ties collapsed per distinct value at
  // its group-end pooled rank, cnt-weighted; exact = the positional
  // formula whenever values are distinct): A² = (1/(n·m)) Σ_{v, k<N}
  // cnt·(CA·N − k·n)² / (k·(N−k)). The cross-multiplied numerator and
  // the k(N−k) denominator are exact DECIMAL integers; each row's term
  // is ONE double expression ⌊10⁶·⌋-floored (the log-rank micro-unit
  // rule — identical operand order both engines), so the sum is an
  // exact integer and ONE division renders A².

  /** One row: (n_a, n_b, a2) — two-sample Anderson–Darling A² of
    * `colName` between `sideA` rows and the rest. */
  def andersonDarling(df: DataFrame, colName: String, sideA: Column)
      : DataFrame = {
    val counts = df
      .select(col(colName).as("v"), when(sideA, 1L).otherwise(0L).as("a"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val scanned = graft.chunk.ChunkAssigner.withPrefixSum(
      graft.chunk.ChunkAssigner.withPrefixSum(
        counts, Seq(col("v")), col("ca"), outName = "pa"),
      Seq(col("v")), col("cb"), outName = "pb")
    val totals = broadcast(counts.agg(sum(col("ca")).as("na"),
      sum(col("cb")).as("nb")))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    val terms = scanned.crossJoin(totals)
      .withColumn("k", col("pa") + col("ca") + col("pb") + col("cb"))
      .withColumn("nn", col("na") + col("nb"))
      .where(col("k") < col("nn"))
      .withColumn("diff",
        dec(col("pa") + col("ca")) * col("nn") - dec(col("k")) * col("na"))
      .withColumn("den", dec(col("k")) * (col("nn") - col("k")))
      .select(col("na"), col("nb"),
        floor(lit(1e6) * dd(col("ca") + col("cb")) * dd(col("diff")) *
          dd(col("diff")) / dd(col("den"))).cast("long").as("t6"))
    terms.groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(sum(col("t6")).as("num"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("num").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double") *
              lit(1e6))).as("a2"))
  }

  private def q329(s: SparkSession, dir: String): DataFrame =
    andersonDarling(Tables.events(s, dir)
        .select(round(col("value") * 100).cast("long").as("cents"),
          col("event_id")),
      "cents", col("event_id") % 2 === 0)
      .select(col("n_a"), col("n_b"), QueryDef.dec4(col("a2")).as("a2"))

  private val q329Sql =
    """WITH counts AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |      AS cb
      |  FROM events GROUP BY 1),
      |cdf AS (
      |  SELECT v, ca, cb,
      |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cuma,
      |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cumb
      |  FROM counts),
      |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |  CAST(sum(cb) AS BIGINT) AS nb FROM counts),
      |terms AS (
      |  SELECT na, nb,
      |    CAST(floor(1e6 * CAST(ca + cb AS DOUBLE)
      |      * CAST(CAST(cuma AS HUGEINT) * (na + nb)
      |          - CAST(cuma + cumb AS HUGEINT) * na AS DOUBLE)
      |      * CAST(CAST(cuma AS HUGEINT) * (na + nb)
      |          - CAST(cuma + cumb AS HUGEINT) * na AS DOUBLE)
      |      / CAST(CAST(cuma + cumb AS HUGEINT)
      |          * (na + nb - cuma - cumb) AS DOUBLE)) AS BIGINT) AS t6
      |  FROM cdf CROSS JOIN t
      |  WHERE cuma + cumb < na + nb)
      |SELECT na AS n_a, nb AS n_b,
      |  CAST(CAST(CASE WHEN na > 0 AND nb > 0
      |    THEN CAST(sum(t6) AS DOUBLE)
      |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 1e6) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS a2
      |FROM terms GROUP BY na, nb""".stripMargin

  // ==== q336: Ansari–Bradley scale test ========================================
  //
  // The SCALE (dispersion) two-sample test the location family misses:
  // Mann–Whitney/KS see a median shift immediately, but two same-median
  // distributions with different spread slip by; AB scores pooled rank
  // i as a_i = min(i, N+1−i) — middle ranks score high, tails low — so
  // a CONCENTRATED sample's score sum rises above its null expectation.
  // On the distinct-value histogram a tied value spanning pooled
  // positions [l+1, l+c] contributes the exact closed-form range sum
  // S = Σ min(i, N+1−i) (split at m = (N+1) div 2 — all integers), and
  // side A takes its share ca·S/c — ONE double expression per distinct
  // value ⌊10⁶·⌋-floored (the log-rank micro rule). Emitted per-item:
  // w_bar = W/n_a in micro units, beside the no-ties null per-item
  // expectation ((N+2)/4 for even N, (N+1)²/(4N) odd) for reference.

  /** One row: (n_a, n_b, w_bar_micro, e_bar_micro) — Ansari–Bradley
    * mean score of the `sideA` rows vs the no-ties null expectation. */
  def ansariBradley(df: DataFrame, colName: String, sideA: Column)
      : DataFrame = {
    val counts = df
      .select(col(colName).as("v"), when(sideA, 1L).otherwise(0L).as("a"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val scanned = graft.chunk.ChunkAssigner.withPrefixSum(
      graft.chunk.ChunkAssigner.withPrefixSum(
        counts, Seq(col("v")), col("ca"), outName = "pa"),
      Seq(col("v")), col("cb"), outName = "pb")
    val totals = broadcast(counts.agg(sum(col("ca")).as("na"),
      sum(col("cb")).as("nb")))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    // ascending-run sum over [x, y]: (x+y)(y−x+1)/2, 0 when empty
    def sumTo(x: Column, y: Column): Column =
      when(y >= x, dec(x + y) * (y - x + 1) / 2).otherwise(lit(0L))
    val terms = scanned.crossJoin(totals)
      .withColumn("nn", col("na") + col("nb"))
      .withColumn("m", expr("(na + nb + 1) div 2"))
      .withColumn("lo", col("pa") + col("pb") + 1L)
      .withColumn("hi", col("pa") + col("pb") + col("ca") + col("cb"))
      // S = Σ_{i=lo}^{hi} min(i, N+1−i), split at m
      .withColumn("s_lo", sumTo(col("lo"), least(col("hi"), col("m"))))
      .withColumn("s_hi",
        when(col("hi") > col("m"),
          dec(col("nn") + 1) *
            (col("hi") - greatest(col("lo"), col("m") + 1) + 1) -
            sumTo(greatest(col("lo"), col("m") + 1), col("hi")))
          .otherwise(lit(0L)))
      .select(col("na"), col("nb"),
        floor(lit(1e6) * dd(dec(col("ca")) * (col("s_lo") + col("s_hi"))) /
          dd(col("ca") + col("cb"))).cast("long").as("t6"))
    terms.groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(sum(col("t6")).as("w6"))
      .select(col("n_a"), col("n_b"),
        expr("w6 div n_a").as("w_bar_micro"),
        when(pmod(col("n_a") + col("n_b"), lit(2L)) === 0L,
          floor(lit(1e6) * dd(col("n_a") + col("n_b") + 2) / lit(4.0)))
          .otherwise(floor(lit(1e6) *
            dd(col("n_a") + col("n_b") + 1) *
            dd(col("n_a") + col("n_b") + 1) /
            (lit(4.0) * dd(col("n_a") + col("n_b")))))
          .cast("long").as("e_bar_micro"))
  }

  private def q336(s: SparkSession, dir: String): DataFrame =
    ansariBradley(Tables.events(s, dir)
        .select(round(col("value") * 100).cast("long").as("cents"),
          col("event_id")),
      "cents", col("event_id") % 2 === 0)

  private val q336Sql =
    """WITH counts AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |      AS cb
      |  FROM events GROUP BY 1),
      |cdf AS (
      |  SELECT v, ca, cb,
      |    COALESCE(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND 1 PRECEDING), 0) AS pa,
      |    COALESCE(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND 1 PRECEDING), 0) AS pb
      |  FROM counts),
      |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |  CAST(sum(cb) AS BIGINT) AS nb FROM counts),
      |terms AS (
      |  SELECT na, nb,
      |    CAST(floor(1e6 * CAST(CAST(ca AS HUGEINT) * (
      |      (CASE WHEN least(pa + pb + ca + cb, (na + nb + 1) // 2)
      |          >= pa + pb + 1
      |        THEN CAST(pa + pb + 1
      |            + least(pa + pb + ca + cb, (na + nb + 1) // 2) AS HUGEINT)
      |          * (least(pa + pb + ca + cb, (na + nb + 1) // 2)
      |            - (pa + pb + 1) + 1) // 2
      |        ELSE 0 END)
      |      + (CASE WHEN pa + pb + ca + cb > (na + nb + 1) // 2
      |        THEN CAST(na + nb + 1 AS HUGEINT)
      |          * (pa + pb + ca + cb
      |            - greatest(pa + pb + 1, (na + nb + 1) // 2 + 1) + 1)
      |          - (CASE WHEN pa + pb + ca + cb
      |              >= greatest(pa + pb + 1, (na + nb + 1) // 2 + 1)
      |            THEN CAST(greatest(pa + pb + 1, (na + nb + 1) // 2 + 1)
      |                + pa + pb + ca + cb AS HUGEINT)
      |              * (pa + pb + ca + cb
      |                - greatest(pa + pb + 1, (na + nb + 1) // 2 + 1) + 1)
      |              // 2
      |            ELSE 0 END)
      |        ELSE 0 END)) AS DOUBLE)
      |      / CAST(ca + cb AS DOUBLE)) AS BIGINT) AS t6
      |  FROM cdf CROSS JOIN t)
      |SELECT na AS n_a, nb AS n_b,
      |  CAST(sum(t6) AS BIGINT) // na AS w_bar_micro,
      |  CAST(CASE WHEN (na + nb) % 2 = 0
      |    THEN floor(1e6 * CAST(na + nb + 2 AS DOUBLE) / 4.0)
      |    ELSE floor(1e6 * CAST(na + nb + 1 AS DOUBLE)
      |      * CAST(na + nb + 1 AS DOUBLE)
      |      / (4.0 * CAST(na + nb AS DOUBLE))) END AS BIGINT)
      |    AS e_bar_micro
      |FROM terms GROUP BY na, nb""".stripMargin

  // ==== q330: Jarque–Bera normality statistic ==================================
  //
  // The normality TEST the descriptive-moments query (q163) stops short
  // of: JB = n/6·(g1² + (g2−3)²/4) from the skewness g1 = m3/(m2·√m2)
  // and kurtosis g2 = m4/m2² — near 0 for Gaussian data, large under
  // skew or heavy tails (statistic, not p-value — the q197/q213 rule).
  // Raw power sums are exact DECIMAL integers per group; the central-
  // moment chain is ONE double expression per GROUP row written
  // operand-for-operand in both engines, with m2^1.5 spelled m2·√m2
  // (sqrt is correctly-rounded IEEE in both engines; pow is not).

  /** Per group: (grp, n, skew_g1, kurt_g2, jb). */
  def jarqueBera(df: DataFrame, colName: String, grpCol: String)
      : DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    val m = df.select(col(grpCol).as("grp"), col(colName).as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(dec(col("v"))).as("s1"),
        sum(dec(col("v")) * col("v")).as("s2"),
        sum(dec(col("v")) * col("v") * col("v")).as("s3"),
        sum(dec(col("v")) * col("v") * col("v") * col("v")).as("s4"))
    val mean = dd(col("s1")) / dd(col("n"))
    val m2 = dd(col("s2")) / dd(col("n")) - mean * mean
    val m3 = dd(col("s3")) / dd(col("n")) -
      lit(3.0) * mean * (dd(col("s2")) / dd(col("n"))) +
      lit(2.0) * mean * mean * mean
    val m4 = dd(col("s4")) / dd(col("n")) -
      lit(4.0) * mean * (dd(col("s3")) / dd(col("n"))) +
      lit(6.0) * mean * mean * (dd(col("s2")) / dd(col("n"))) -
      lit(3.0) * mean * mean * mean * mean
    val g1 = m3 / (m2 * sqrt(m2))
    val g2 = m4 / (m2 * m2)
    m.select(col("grp"), col("n"), g1.as("skew_g1"), g2.as("kurt_g2"),
      (dd(col("n")) / lit(6.0) *
        (g1 * g1 + (g2 - lit(3.0)) * (g2 - lit(3.0)) / lit(4.0))).as("jb"))
  }

  private def q330(s: SparkSession, dir: String): DataFrame =
    jarqueBera(Tables.events(s, dir)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents")),
      "cents", "event_type")
      .select(col("grp").as("event_type"), col("n"),
        QueryDef.dec4(col("skew_g1")).as("skew_g1"),
        QueryDef.dec4(col("kurt_g2")).as("kurt_g2"),
        QueryDef.dec4(col("jb")).as("jb"))
      .orderBy(col("event_type"))

  private val q330Sql =
    """WITH m AS (
      |  SELECT event_type AS grp, count(*) AS n,
      |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS s1,
      |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
      |      * CAST(round(value * 100) AS BIGINT)) AS s2,
      |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
      |      * CAST(round(value * 100) AS BIGINT)
      |      * CAST(round(value * 100) AS BIGINT)) AS s3,
      |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
      |      * CAST(round(value * 100) AS BIGINT)
      |      * CAST(round(value * 100) AS BIGINT)
      |      * CAST(round(value * 100) AS BIGINT)) AS s4
      |  FROM events GROUP BY 1),
      |c AS (
      |  SELECT grp, n,
      |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
      |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
      |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      |  FROM m),
      |g AS (
      |  SELECT grp, n,
      |    (r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean)
      |      / ((r2 - mean * mean) * sqrt(r2 - mean * mean)) AS g1,
      |    (r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
      |        - 3.0 * mean * mean * mean * mean)
      |      / ((r2 - mean * mean) * (r2 - mean * mean)) AS g2
      |  FROM c)
      |SELECT grp AS event_type, n,
      |  CAST(CAST(g1 AS DECIMAL(38,4)) AS VARCHAR) AS skew_g1,
      |  CAST(CAST(g2 AS DECIMAL(38,4)) AS VARCHAR) AS kurt_g2,
      |  CAST(CAST(CAST(n AS DOUBLE) / 6.0
      |    * (g1 * g1 + (g2 - 3.0) * (g2 - 3.0) / 4.0)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS jb
      |FROM g ORDER BY event_type""".stripMargin

  // ==== q332: fixed-grid Gaussian KDE ==========================================
  //
  // The smoothed-density face of the distribution shelf (q44/q113 give
  // quantile buckets; the KDE gives the SHAPE dashboards plot): density
  // at 64 declared grid points, Gaussian kernel, bandwidth h. Exactness
  // by integerized kernel mass (the engine's floor discipline): per
  // (grid point, distinct value) the kernel weight ⌊10⁹·e^(−z²/2)⌋ is
  // ONE double expression floored to a long, multiplied by the exact
  // value count and summed as integers — the output column is an exact
  // BIGINT both engines hash identically, no double sums anywhere.
  // Scale shape: grid(64) × distinct-value histogram — a broadcast
  // cross of a constant against a value-domain table, never corpus².

  /** Per grid point i: (i, g, mass9) with mass9 = Σ_v cnt_v·⌊10⁹·
    * K((g−v)/h)⌋. */
  def gridKde(df: DataFrame, colName: String, lo: Long, step: Long,
      points: Int, h: Double): DataFrame = {
    val counts = df.groupBy(col(colName).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val grid = df.sparkSession.range(points)
      .select(col("id").as("i"), (lit(lo) + col("id") * step).as("g"))
    def dd(c: Column) = c.cast("double")
    val z = (dd(col("g")) - dd(col("v"))) / lit(h)
    counts.crossJoin(broadcast(grid))
      .select(col("i"), col("g"),
        (col("cnt") * floor(lit(1e9) * exp(lit(-1.0) * z * z / lit(2.0)))
          .cast("long")).as("k9"))
      .groupBy(col("i"), col("g"))
      .agg(sum(col("k9")).as("mass9"))
      .orderBy(col("i"))
  }

  private def q332(s: SparkSession, dir: String): DataFrame =
    gridKde(Tables.events(s, dir)
        .select(round(col("value") * 100).cast("long").as("cents")),
      "cents", lo = 0L, step = 160L, points = 64, h = 500.0)

  private val q332Sql =
    """WITH counts AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v, count(*) AS cnt
      |  FROM events GROUP BY 1),
      |grid AS (
      |  SELECT CAST(i AS BIGINT) AS i, CAST(0 + i * 160 AS BIGINT) AS g
      |  FROM range(64) t(i))
      |SELECT i, g,
      |  CAST(sum(cnt * CAST(floor(1e9 * exp(-1.0
      |    * ((CAST(g AS DOUBLE) - CAST(v AS DOUBLE)) / 500.0)
      |    * ((CAST(g AS DOUBLE) - CAST(v AS DOUBLE)) / 500.0)
      |    / 2.0)) AS BIGINT)) AS BIGINT) AS mass9
      |FROM counts CROSS JOIN grid
      |GROUP BY i, g ORDER BY i""".stripMargin

  // ==== q333: Grubbs max-studentized-deviate ===================================
  //
  // The single-outlier TEST statistic completing the outlier shelf
  // (q118 MAD flags by robust distance, q200 by rolling window, q219 by
  // density — Grubbs G = max|x−x̄|/s is the classical judgement of "is
  // the single most extreme point surprising under normality"): per
  // group, G in micro units plus the value attaining it. Per-row
  // deviate is ONE double expression ⌊10⁶·⌋-floored off exact integer
  // (n, Σx, Σx²); the argmax is the integer pair max (g_micro, v) —
  // ties resolve to the larger value, identically in both engines.

  /** Per group: (grp, n, g_micro, v_at). */
  def grubbsStatistic(df: DataFrame, colName: String, grpCol: String)
      : DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    val vals = df.select(col(grpCol).as("grp"), col(colName).as("v"))
    val m = vals.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(dec(col("v"))).as("s1"),
        sum(dec(col("v")) * col("v")).as("s2"))
    val mean = dd(col("s1")) / dd(col("n"))
    val sd = sqrt((dd(col("n")) * dd(col("s2")) -
      dd(col("s1")) * dd(col("s1"))) /
      (dd(col("n")) * (dd(col("n")) - lit(1.0))))
    vals.join(broadcast(m), Seq("grp"))
      .select(col("grp"), col("n"),
        floor(lit(1e6) * abs(dd(col("v")) - mean) / sd).cast("long")
          .as("g6"), col("v"))
      .groupBy(col("grp").as("grp"), col("n"))
      .agg(max(struct(col("g6"), col("v"))).as("top"))
      .select(col("grp"), col("n"), col("top.g6").as("g_micro"),
        col("top.v").as("v_at"))
  }

  private def q333(s: SparkSession, dir: String): DataFrame =
    grubbsStatistic(Tables.events(s, dir)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents")),
      "cents", "event_type")
      .select(col("grp").as("event_type"), col("n"), col("g_micro"),
        col("v_at"))
      .orderBy(col("event_type"))

  private val q333Sql =
    """WITH v AS (
      |  SELECT event_type AS grp,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events),
      |m AS (
      |  SELECT grp, count(*) AS n,
      |    CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s1,
      |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
      |  FROM v GROUP BY 1),
      |d AS (
      |  SELECT v.grp, m.n,
      |    CAST(floor(1e6 * abs(CAST(v.v AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |      / sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
      |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
      |      AS BIGINT) AS g6, v.v
      |  FROM v JOIN m ON v.grp = m.grp)
      |SELECT grp AS event_type, n, max(g6) AS g_micro,
      |  max(CASE WHEN g6 = mg THEN v END) AS v_at
      |FROM (SELECT *, max(g6) OVER (PARTITION BY grp) AS mg FROM d)
      |GROUP BY grp, n ORDER BY event_type""".stripMargin

  // ==== q285: energy distance =================================================
  //
  // The metric that sees LOCATION drift CvM normalizes away less of:
  // D² = 2E|X−Y| − E|X−X'| − E|Y−Y'| (Székely–Rizzo; zero iff the
  // distributions are equal). Every pairwise-|difference| mass comes
  // from ONE prefix scan carrying both the cumulative COUNT and the
  // cumulative VALUE-SUM: Σ_{y<v}(v−y)·n(y) = v·P(v) − Q(v) — so all
  // three O(n²)-pair sums are |distinct|-domain arithmetic with exact
  // DECIMAL integers; three double divisions at the end.

  /** One row: (n_a, n_b, e2) — squared energy distance of `colName`
    * between `sideA` rows and the rest. */
  def energyDistance(df: DataFrame, colName: String, sideA: Column)
      : DataFrame = {
    val counts = df
      .select(col(colName).as("v"), when(sideA, 1L).otherwise(0L).as("a"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
      .withColumn("va", col("v").cast("decimal(38,0)") * col("ca"))
      .withColumn("vb", col("v").cast("decimal(38,0)") * col("cb"))
    val scanned = Seq(("ca", "pa"), ("cb", "pb"), ("va", "qa"), ("vb", "qb"))
      .foldLeft(counts) { case (d, (in, out)) =>
        graft.chunk.ChunkAssigner.withPrefixSum(
          d, Seq(col("v")), col(in), outName = out)
      }
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // Σ_{x∈X, y∈Y, y<x} (x−y)·w: at each distinct v, X-mass at v meets
    // the exclusive Y-prefix (count p, value-sum q): v·p − q
    def lower(cx: String, p: String, q: String) =
      (dec(col("v")) * dec(col(cx)) * col(p) - dec(col(cx)) * col(q))
    val sums = scanned
      .select(
        // cross |A−B|: pairs with b<a at v∈A, plus pairs with a<b at v∈B
        (lower("ca", "pb", "qb") + lower("cb", "pa", "qa")).as("t_ab"),
        lower("ca", "pa", "qa").as("t_aa"),
        lower("cb", "pb", "qb").as("t_bb"))
      .agg(sum(col("t_ab")).as("sab"), sum(col("t_aa")).as("saa"),
        sum(col("t_bb")).as("sbb"))
    val totals = broadcast(counts.agg(sum(col("ca")).as("na"),
      sum(col("cb")).as("nb")))
    def dd(c: Column) = c.cast("double")
    sums.crossJoin(totals)
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        when(col("na") > 0 && col("nb") > 0,
          lit(2.0) * dd(col("sab")) / (dd(col("na")) * dd(col("nb"))) -
            lit(2.0) * dd(col("saa")) / (dd(col("na")) * dd(col("na"))) -
            lit(2.0) * dd(col("sbb")) / (dd(col("nb")) * dd(col("nb"))))
          .as("e2"))
  }

  private def q285(s: SparkSession, dir: String): DataFrame =
    energyDistance(Tables.events(s, dir)
        .select(round(col("value") * 100).cast("long").as("cents"),
          col("event_id")),
      "cents", col("event_id") % 2 === 0)
      .select(col("n_a"), col("n_b"), QueryDef.dec4(col("e2")).as("e2"))

  private val q285Sql =
    """WITH counts AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |      AS cb
      |  FROM events GROUP BY 1),
      |cdf AS (
      |  SELECT v, ca, cb,
      |    COALESCE(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND 1 PRECEDING), 0) AS pa,
      |    COALESCE(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND 1 PRECEDING), 0) AS pb,
      |    COALESCE(sum(CAST(v AS HUGEINT) * ca) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS qa,
      |    COALESCE(sum(CAST(v AS HUGEINT) * cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS qb
      |  FROM counts),
      |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |  CAST(sum(cb) AS BIGINT) AS nb FROM counts),
      |s AS (
      |  SELECT
      |    sum(CAST(v AS HUGEINT) * ca * pb - CAST(ca AS HUGEINT) * qb
      |      + CAST(v AS HUGEINT) * cb * pa - CAST(cb AS HUGEINT) * qa)
      |      AS sab,
      |    sum(CAST(v AS HUGEINT) * ca * pa - CAST(ca AS HUGEINT) * qa)
      |      AS saa,
      |    sum(CAST(v AS HUGEINT) * cb * pb - CAST(cb AS HUGEINT) * qb)
      |      AS sbb
      |  FROM cdf)
      |SELECT na AS n_a, nb AS n_b,
      |  CAST(CAST(CASE WHEN na > 0 AND nb > 0 THEN
      |    2.0 * CAST(sab AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
      |    - 2.0 * CAST(saa AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))
      |    - 2.0 * CAST(sbb AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS e2
      |FROM s CROSS JOIN t""".stripMargin

  // ==== q286: Cochran's Q =====================================================
  //
  // McNemar generalized to k ≥ 3 matched binary conditions (q271 is the
  // k = 2 special case): did each user purchase in each 8-hour
  // day-part? Q = (k−1)·[k·ΣC_j² − N²] / (k·N − ΣR_i²) over the
  // user×condition 0/1 matrix — column totals C_j, row totals R_i,
  // N = ΣR_i, ALL exact integers from one user-domain aggregation; the
  // single division happens at render. Subjects with all-0 or all-k
  // rows self-cancel in the denominator (kR − R² = 0), so no exclusion
  // pass is needed.

  /** One row: (n_subjects, c1..ck, q) — Cochran's Q over per-`idCol`
    * binary `conds`. */
  def cochranQ(df: DataFrame, idCol: String, conds: Seq[Column])
      : DataFrame = {
    val k = conds.size
    val flags = df.groupBy(col(idCol))
      .agg(conds.zipWithIndex.map { case (c, i) =>
        max(when(c, 1L).otherwise(0L)).as(s"y$i") }.head,
        conds.zipWithIndex.tail.map { case (c, i) =>
          max(when(c, 1L).otherwise(0L)).as(s"y$i") }: _*)
    val r = (0 until k).map(i => col(s"y$i")).reduce(_ + _)
    val aggs = (0 until k).map(i => sum(col(s"y$i")).as(s"c$i")) ++ Seq(
      count(lit(1)).as("n_subjects"), sum(r).as("nn"),
      sum(r * r).as("rr"))
    val m = flags.agg(aggs.head, aggs.tail: _*)
    val sumC2 = (0 until k).map(i =>
      col(s"c$i").cast("decimal(38,0)") * col(s"c$i")).reduce(_ + _)
    m.select((0 until k).map(i => col(s"c$i")) :+ col("n_subjects") :+
        col("nn") :+ col("rr") :+ sumC2.as("sum_c2"): _*)
      .select(col("n_subjects") +: (0 until k).map(i => col(s"c$i")) :+
        when(lit(k) * col("nn") - col("rr") > 0,
          (lit((k - 1).toLong) *
            (lit(k.toLong) * col("sum_c2") -
              col("nn").cast("decimal(38,0)") * col("nn"))).cast("double") /
            (lit(k.toLong) * col("nn") - col("rr")).cast("double"))
          .as("q"): _*)
  }

  private def q286(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"),
      col("event_type"), hour(col("ts")).as("hod"))
    def part(lo: Int, hi: Int) =
      col("event_type") === "purchase" && col("hod") >= lo && col("hod") < hi
    cochranQ(e, "user_id", Seq(part(0, 8), part(8, 16), part(16, 24)))
      .select(col("n_subjects"), col("c0"), col("c1"), col("c2"),
        QueryDef.dec4(col("q")).as("q"))
  }

  private val q286Sql =
    """WITH f AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' AND hour(ts) < 8
      |      THEN 1 ELSE 0 END) AS y0,
      |    max(CASE WHEN event_type = 'purchase' AND hour(ts) >= 8
      |      AND hour(ts) < 16 THEN 1 ELSE 0 END) AS y1,
      |    max(CASE WHEN event_type = 'purchase' AND hour(ts) >= 16
      |      THEN 1 ELSE 0 END) AS y2
      |  FROM events GROUP BY user_id),
      |m AS (
      |  SELECT count(*) AS n_subjects,
      |    CAST(sum(y0) AS BIGINT) AS c0, CAST(sum(y1) AS BIGINT) AS c1,
      |    CAST(sum(y2) AS BIGINT) AS c2,
      |    CAST(sum(y0 + y1 + y2) AS BIGINT) AS nn,
      |    CAST(sum((y0 + y1 + y2) * (y0 + y1 + y2)) AS BIGINT) AS rr
      |  FROM f)
      |SELECT n_subjects, c0, c1, c2,
      |  CAST(CAST(CASE WHEN 3 * nn - rr > 0
      |    THEN CAST(2 * (3 * (CAST(c0 AS HUGEINT) * c0
      |        + CAST(c1 AS HUGEINT) * c1 + CAST(c2 AS HUGEINT) * c2)
      |      - CAST(nn AS HUGEINT) * nn) AS DOUBLE)
      |      / CAST(3 * nn - rr AS DOUBLE) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS q
      |FROM m""".stripMargin

  // ==== q287: Jonckheere–Terpstra ordered-alternative test ===================
  //
  // The k-group test with an ORDER hypothesis (dose-response, priority
  // tiers): JT = Σ_{i<j} U_ij rewards values that INCREASE along the
  // declared group order — q253's Kruskal–Wallis treats groups as
  // exchangeable and cannot see this. On the distinct-value histogram
  // with per-group cumulative counts P_i(v), 2·JT = Σ_v Σ_{i<j}
  // c_j(v)·(2·P_i(v) + c_i(v)) — halves from ties stay integers at the
  // ×2 scale, every product exact DECIMAL. The z render uses the
  // standard no-tie variance [N²(2N+3) − Σn_i²(2n_i+3)]/72 (declared
  // approximation — the tie term is negligible at cent granularity),
  // computed as one double expression over exact integers. k prefix
  // scans over the |distinct| domain; the corpus is read once.

  /** One row: (n, jt2, mu4, z) — 2·JT, 4·E[JT], and the standardized
    * statistic of `x` across the DECLARED `ordered` group sequence. */
  def jonckheereTerpstra(df: DataFrame, group: String, x: String,
      ordered: Seq[String]): DataFrame = {
    val k = ordered.size
    val cAggs = ordered.zipWithIndex.map { case (g, i) =>
      sum(when(col(group) === g, 1L).otherwise(0L)).as(s"c$i") }
    val counts = df.groupBy(col(x).as("v")).agg(cAggs.head, cAggs.tail: _*)
    val scanned = (0 until k).foldLeft(counts) { (d, i) =>
      graft.chunk.ChunkAssigner.withPrefixSum(
        d, Seq(col("v")), col(s"c$i"), outName = s"p$i")
    }
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val term = (for { i <- 0 until k; j <- (i + 1) until k } yield
      dec(col(s"c$j")) * (lit(2L) * col(s"p$i") + col(s"c$i")))
      .reduce(_ + _)
    val sums = scanned.select(term.as("t"))
      .agg(sum(col("t")).as("jt2"))
    val nAggs = (0 until k).map(i => sum(col(s"c$i")).as(s"n$i"))
    val totals = broadcast(counts.agg(nAggs.head, nAggs.tail: _*))
    def dd(c: Column) = c.cast("double")
    val bigN = (0 until k).map(i => col(s"n$i")).reduce(_ + _)
    val sumN2 = (0 until k).map(i => dec(col(s"n$i")) * col(s"n$i"))
      .reduce(_ + _)
    val sumN23 = (0 until k).map(i =>
      dec(col(s"n$i")) * col(s"n$i") * (lit(2L) * col(s"n$i") + 3))
      .reduce(_ + _)
    sums.crossJoin(totals)
      .select(col("jt2"), bigN.as("n"), sumN2.as("sn2"), sumN23.as("sn23"))
      .select(col("n"), col("jt2").cast("decimal(38,0)").as("jt2"),
        (dec(col("n")) * col("n") - col("sn2")).as("mu4"),
        col("sn23"))
      .select(col("n"), col("jt2"), col("mu4"),
        when(col("n") > 1,
          (dd(col("jt2")) / lit(2.0) - dd(col("mu4")) / lit(4.0)) /
            sqrt((dd(col("n")) * dd(col("n")) *
              (lit(2.0) * dd(col("n")) + lit(3.0)) - dd(col("sn23"))) /
              lit(72.0))).as("z"))
  }

  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")

  private def q287(s: SparkSession, dir: String): DataFrame =
    jonckheereTerpstra(
      Tables.orders(s, dir).select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents")),
      "o_orderpriority", "cents", priorities)
      .select(col("n"), col("jt2").cast("long").as("jt2"),
        col("mu4").cast("long").as("mu4"), QueryDef.dec4(col("z")).as("z"))

  private val q287Sql = {
    val cCols = priorities.zipWithIndex.map { case (g, i) =>
      s"CAST(sum(CASE WHEN grp = '$g' THEN 1 ELSE 0 END) AS BIGINT) AS c$i"
    }.mkString(",\n      |    ")
    val pCols = (0 until 5).map(i =>
      s"""COALESCE(sum(c$i) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND 1 PRECEDING), 0) AS p$i""".stripMargin)
      .mkString(",\n      |    ")
    val term = (for { i <- 0 until 5; j <- (i + 1) until 5 } yield
      s"CAST(c$j AS HUGEINT) * (2 * p$i + c$i)").mkString(" + ")
    val nCols = (0 until 5).map(i =>
      s"CAST(sum(c$i) AS BIGINT) AS n$i").mkString(", ")
    val bigN = (0 until 5).map(i => s"n$i").mkString(" + ")
    val sn2 = (0 until 5).map(i => s"CAST(n$i AS HUGEINT) * n$i")
      .mkString(" + ")
    val sn23 = (0 until 5).map(i =>
      s"CAST(n$i AS HUGEINT) * n$i * (2 * n$i + 3)").mkString(" + ")
    s"""WITH d AS (
       |  SELECT o_orderpriority AS grp,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
       |  FROM orders),
       |counts AS (
       |  SELECT v,
       |    $cCols
       |  FROM d GROUP BY v),
       |cdf AS (
       |  SELECT *,
       |    $pCols
       |  FROM counts),
       |s AS (SELECT CAST(sum($term) AS HUGEINT) AS jt2 FROM cdf),
       |t AS (SELECT $nCols FROM counts),
       |f AS (
       |  SELECT jt2, $bigN AS n, $sn2 AS sn2, $sn23 AS sn23
       |  FROM s CROSS JOIN t)
       |SELECT n, CAST(jt2 AS BIGINT) AS jt2,
       |  CAST(CAST(n AS HUGEINT) * n - sn2 AS BIGINT) AS mu4,
       |  CAST(CAST(CASE WHEN n > 1 THEN
       |    (CAST(jt2 AS DOUBLE) / 2.0
       |      - CAST(CAST(n AS HUGEINT) * n - sn2 AS DOUBLE) / 4.0)
       |    / sqrt((CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       |        * (2.0 * CAST(n AS DOUBLE) + 3.0)
       |      - CAST(sn23 AS DOUBLE)) / 72.0) END
       |    AS DECIMAL(38,4)) AS VARCHAR) AS z
       |FROM f""".stripMargin
  }

  // ==== q291: Wald–Wolfowitz runs test ========================================
  //
  // The randomness diagnostic the trend family (q190/q279/q282) doesn't
  // cover: is the hourly series' excursion PATTERN around its median
  // random, or does it cluster (few long runs) / oscillate (too many)?
  // Signs come from 2y vs 2·median — integer-exact classification (the
  // q280 half-integer-median rule), ties EXCLUDED (the standard); R = 1 +
  // sign changes between consecutive non-tied hours, via one lag over
  // the per-type hour-domain window (calendar-sized, the q152 contract).
  // n1/n0/R exact integers; μ and σ of R are one double expression.

  /** Per `group`: (n_above, n_below, runs, z) — runs test of the hourly
    * count series around its per-group median. */
  def runsTest(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("y"))
    val med2 = hourly.groupBy(col("event_type"))
      .agg((expr("percentile(y, 0.5)") * 2).cast("long").as("med2"))
    val signed = hourly.join(broadcast(med2), Seq("event_type"))
      .withColumn("sgn",
        when(lit(2L) * col("y") > col("med2"), 1)
          .when(lit(2L) * col("y") < col("med2"), -1))
      .filter(col("sgn").isNotNull)
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    def dd(c: Column) = c.cast("double")
    signed
      .withColumn("prev", lag(col("sgn"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_above"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_below"),
        (lit(1L) + sum(when(col("prev").isNotNull &&
          col("sgn") =!= col("prev"), 1L).otherwise(0L))).as("runs"))
      .withColumn("z", {
        val n1 = dd(col("n_above")); val n0 = dd(col("n_below"))
        val nn = n1 + n0
        val mu = lit(2.0) * n1 * n0 / nn + lit(1.0)
        val v = lit(2.0) * n1 * n0 * (lit(2.0) * n1 * n0 - nn) /
          (nn * nn * (nn - lit(1.0)))
        when(col("n_above") > 0 && col("n_below") > 0 &&
          col("n_above") + col("n_below") > 1 && v > 0,
          (dd(col("runs")) - mu) / sqrt(v))
      })
  }

  private def q291(s: SparkSession, dir: String): DataFrame =
    runsTest(Tables.events(s, dir))
      .select(col("event_type"), col("n_above"), col("n_below"),
        col("runs"), QueryDef.dec4(col("z")).as("z"))
      .orderBy(col("event_type"))

  private val q291Sql =
    """WITH hourly AS (
      |  SELECT event_type,
      |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
      |    count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, CAST(quantile_cont(y, 0.5) * 2 AS BIGINT)
      |    AS med2
      |  FROM hourly GROUP BY 1),
      |signed AS (
      |  SELECT hourly.event_type, h,
      |    CASE WHEN 2 * y > med2 THEN 1 WHEN 2 * y < med2 THEN -1 END
      |      AS sgn
      |  FROM hourly JOIN med USING (event_type)
      |  WHERE 2 * y <> med2),
      |lagged AS (
      |  SELECT event_type, sgn,
      |    lag(sgn, 1) OVER (PARTITION BY event_type ORDER BY h) AS prev
      |  FROM signed),
      |agg AS (
      |  SELECT event_type,
      |    CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_above,
      |    CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_below,
      |    CAST(1 + sum(CASE WHEN prev IS NOT NULL AND sgn <> prev
      |      THEN 1 ELSE 0 END) AS BIGINT) AS runs
      |  FROM lagged GROUP BY 1)
      |SELECT event_type, n_above, n_below, runs,
      |  CAST(CAST(CASE WHEN n_above > 0 AND n_below > 0
      |      AND n_above + n_below > 1
      |      AND 2.0 * n_above * n_below
      |        * (2.0 * n_above * n_below - (n_above + n_below)) > 0
      |    THEN (CAST(runs AS DOUBLE)
      |      - (2.0 * n_above * n_below
      |        / CAST(n_above + n_below AS DOUBLE) + 1.0))
      |      / sqrt(2.0 * n_above * n_below
      |        * (2.0 * n_above * n_below
      |          - CAST(n_above + n_below AS DOUBLE))
      |        / (CAST(n_above + n_below AS DOUBLE)
      |          * CAST(n_above + n_below AS DOUBLE)
      |          * (CAST(n_above + n_below AS DOUBLE) - 1.0)))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS z
      |FROM agg ORDER BY event_type""".stripMargin

  // ==== q292: Pettitt changepoint test ========================================
  //
  // The rank-based changepoint detector completing the family (B126's
  // CUSUM needs a known baseline, B139's segmented regression a known
  // changepoint — Pettitt finds WHERE a distribution shifted with no
  // parametric assumption): U_t = 2W_t − t(n+1) with W_t the rank sum of
  // the first t hours; K = max|U_t|, the argmax hour is the changepoint
  // estimate. Doubled midranks (the q253 trick) keep everything integer:
  // U_t = Σ_{i≤t} r2_i − t(n+1) exactly. Per-type hour-domain windows
  // only (the q152 calendar contract); ties in K resolve to the earliest
  // hour — a total, engine-stable order.

  /** Per type: (n_hours, k_stat, cp_hour) — Pettitt K and the estimated
    * changepoint hour of the hourly count series. */
  def pettitt(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(count(lit(1)).as("y"))
    // doubled midranks within type: r2(v) = 2·#less + #equal + 1
    val vals = hourly.groupBy(col("event_type"), col("y"))
      .agg(count(lit(1)).as("c"))
    val wv = Window.partitionBy(col("event_type")).orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vals
      .withColumn("less", coalesce(sum(col("c")).over(wv), lit(0L)))
      .select(col("event_type"), col("y"),
        (lit(2L) * col("less") + col("c") + 1L).as("r2"))
    val wt = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val n = hourly.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val u = hourly.join(ranked, Seq("event_type", "y"))
      .withColumn("w2", sum(col("r2")).over(wt))
      .withColumn("t", sum(lit(1L)).over(wt))
      .join(broadcast(n), Seq("event_type"))
      .filter(col("t") < col("n")) // U_n = 0 by construction; cp < n
      .select(col("event_type"), col("h"), col("n"),
        (col("w2") - col("t") * (col("n") + 1L)).as("u"))
    val k = u.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_hours"), max(abs(col("u"))).as("k_stat"))
    u.join(broadcast(k), Seq("event_type"))
      .filter(abs(col("u")) === col("k_stat"))
      .groupBy(col("event_type"), col("n_hours"), col("k_stat"))
      .agg(min(col("h")).as("cp_hour"))
      .select(col("event_type"), col("n_hours"), col("k_stat"),
        col("cp_hour"))
  }

  private def q292(s: SparkSession, dir: String): DataFrame =
    pettitt(Tables.events(s, dir))
      .select(col("event_type"), col("n_hours"), col("k_stat"),
        col("cp_hour"))
      .orderBy(col("event_type"))

  private val q292Sql =
    """WITH hourly AS (
      |  SELECT event_type,
      |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
      |    count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |vals AS (
      |  SELECT event_type, y, count(*) AS c FROM hourly GROUP BY 1, 2),
      |ranked AS (
      |  SELECT event_type, y,
      |    2 * COALESCE(sum(c) OVER (PARTITION BY event_type ORDER BY y
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + c + 1 AS r2
      |  FROM vals),
      |n AS (SELECT event_type, count(*) AS n FROM hourly GROUP BY 1),
      |u AS (
      |  SELECT hourly.event_type, h, n.n,
      |    sum(r2) OVER (PARTITION BY hourly.event_type ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    - (row_number() OVER (PARTITION BY hourly.event_type ORDER BY h))
      |      * (n.n + 1) AS uu,
      |    row_number() OVER (PARTITION BY hourly.event_type ORDER BY h)
      |      AS t
      |  FROM hourly
      |    JOIN ranked ON ranked.event_type = hourly.event_type
      |      AND ranked.y = hourly.y
      |    JOIN n ON n.event_type = hourly.event_type),
      |f AS (SELECT event_type, h, n, uu FROM u WHERE t < n)
      |SELECT event_type, max(n) AS n_hours,
      |  CAST(max(abs(uu)) AS BIGINT) AS k_stat,
      |  CAST(min(CASE WHEN abs(uu) = (SELECT max(abs(uu)) FROM f f2
      |    WHERE f2.event_type = f.event_type) THEN h END) AS BIGINT)
      |    AS cp_hour
      |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin

  // ==== q293: Friedman test ===================================================
  //
  // The ordinal companion to q286's Cochran (which only sees binaries):
  // k matched treatments per subject, ranked WITHIN each subject —
  // here each user's purchase counts across the three 8-hour day-parts.
  // Doubled midranks within a k=3 triple are closed-form expressions
  // (r2_j = 2·#less + #eq + 1 — no window, k is a compile-time
  // constant), so column rank sums are exact integers; χ² =
  // 3·ΣR2_j²/(n·k(k+1)) − 3n(k+1) divides exact decimals once, and the
  // tie correction enumerates the 3 possible within-subject tie
  // patterns (pair = 6, triple = 24 in t³−t units) as integer counts.
  // ONE user-domain aggregation; everything downstream is k-row math.

  /** One row: (n_subjects, r2_1..r2_k, chi2, chi2_tie_corrected) —
    * Friedman over per-`idCol` treatment values `xs` (k = xs.size). */
  def friedman(df: DataFrame, idCol: String, xs: Seq[Column]): DataFrame = {
    val k = xs.size
    val perUser = df.groupBy(col(idCol))
      .agg(xs.zipWithIndex.map { case (x, i) =>
        sum(x).as(s"x$i") }.head,
        xs.zipWithIndex.tail.map { case (x, i) => sum(x).as(s"x$i") }: _*)
    def r2(j: Int) = {
      val less = (0 until k).map(l =>
        when(col(s"x$l") < col(s"x$j"), 1L).otherwise(0L)).reduce(_ + _)
      val eq = (0 until k).map(l =>
        when(col(s"x$l") === col(s"x$j"), 1L).otherwise(0L)).reduce(_ + _)
      lit(2L) * less + eq + 1L
    }
    // within-subject tie mass in t³−t units (k = 3 patterns enumerated;
    // general k would group-count equal values)
    require(k == 3, "friedman: the closed-form tie enumeration is k = 3")
    val tieMass =
      when(col("x0") === col("x1") && col("x1") === col("x2"), 24L)
        .when(col("x0") === col("x1") || col("x1") === col("x2") ||
          col("x0") === col("x2"), 6L)
        .otherwise(0L)
    val m = perUser
      .select((0 until k).map(j => r2(j).as(s"r2_$j")) :+
        tieMass.as("tm"): _*)
      .agg(count(lit(1)).as("n"),
        (0 until k).map(j => sum(col(s"r2_$j")).as(s"rr$j")) ++
          Seq(sum(col("tm")).as("tmass")): _*)
    def dd(c: Column) = c.cast("double")
    val sumR2sq = (0 until k).map(j =>
      col(s"rr$j").cast("decimal(38,0)") * col(s"rr$j")).reduce(_ + _)
    val chi2 = lit(3.0) * dd(sumR2sq) /
      (dd(col("n")) * lit((k * (k + 1)).toDouble)) -
      lit(3.0) * dd(col("n")) * lit((k + 1).toDouble)
    val corr = lit(1.0) - dd(col("tmass")) /
      (dd(col("n")) * lit((k * (k * k - 1)).toDouble))
    m.select(col("n").as("n_subjects") +:
      (0 until k).map(j => col(s"rr$j").as(s"r2_$j")) :+
      when(col("n") > 0, chi2).as("chi2") :+
      when(col("n") > 0 && corr > 0, chi2 / corr)
        .as("chi2_tie_corrected"): _*)
  }

  private def q293(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"),
      col("event_type"), hour(col("ts")).as("hod"))
    def part(lo: Int, hi: Int) =
      when(col("event_type") === "purchase" &&
        col("hod") >= lo && col("hod") < hi, 1L).otherwise(0L)
    friedman(e, "user_id",
      Seq(part(0, 8), part(8, 16), part(16, 24)))
      .select(col("n_subjects"), col("r2_0"), col("r2_1"), col("r2_2"),
        QueryDef.dec4(col("chi2")).as("chi2"),
        QueryDef.dec4(col("chi2_tie_corrected")).as("chi2_tie_corrected"))
  }

  private val q293Sql =
    """WITH f AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND hour(ts) < 8
      |      THEN 1 ELSE 0 END) AS BIGINT) AS x0,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND hour(ts) >= 8
      |      AND hour(ts) < 16 THEN 1 ELSE 0 END) AS BIGINT) AS x1,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND hour(ts) >= 16
      |      THEN 1 ELSE 0 END) AS BIGINT) AS x2
      |  FROM events GROUP BY user_id),
      |r AS (
      |  SELECT
      |    2 * ((CASE WHEN x0 < x0 THEN 1 ELSE 0 END)
      |       + (CASE WHEN x1 < x0 THEN 1 ELSE 0 END)
      |       + (CASE WHEN x2 < x0 THEN 1 ELSE 0 END))
      |      + (CASE WHEN x0 = x0 THEN 1 ELSE 0 END)
      |      + (CASE WHEN x1 = x0 THEN 1 ELSE 0 END)
      |      + (CASE WHEN x2 = x0 THEN 1 ELSE 0 END) + 1 AS r0,
      |    2 * ((CASE WHEN x0 < x1 THEN 1 ELSE 0 END)
      |       + (CASE WHEN x1 < x1 THEN 1 ELSE 0 END)
      |       + (CASE WHEN x2 < x1 THEN 1 ELSE 0 END))
      |      + (CASE WHEN x0 = x1 THEN 1 ELSE 0 END)
      |      + (CASE WHEN x1 = x1 THEN 1 ELSE 0 END)
      |      + (CASE WHEN x2 = x1 THEN 1 ELSE 0 END) + 1 AS r1,
      |    2 * ((CASE WHEN x0 < x2 THEN 1 ELSE 0 END)
      |       + (CASE WHEN x1 < x2 THEN 1 ELSE 0 END)
      |       + (CASE WHEN x2 < x2 THEN 1 ELSE 0 END))
      |      + (CASE WHEN x0 = x2 THEN 1 ELSE 0 END)
      |      + (CASE WHEN x1 = x2 THEN 1 ELSE 0 END)
      |      + (CASE WHEN x2 = x2 THEN 1 ELSE 0 END) + 1 AS r2,
      |    CASE WHEN x0 = x1 AND x1 = x2 THEN 24
      |      WHEN x0 = x1 OR x1 = x2 OR x0 = x2 THEN 6 ELSE 0 END AS tm
      |  FROM f),
      |m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(r0) AS BIGINT) AS rr0, CAST(sum(r1) AS BIGINT) AS rr1,
      |    CAST(sum(r2) AS BIGINT) AS rr2,
      |    CAST(sum(tm) AS BIGINT) AS tmass
      |  FROM r),
      |c AS (
      |  SELECT n, rr0, rr1, rr2,
      |    3.0 * CAST(CAST(rr0 AS HUGEINT) * rr0 + CAST(rr1 AS HUGEINT) * rr1
      |      + CAST(rr2 AS HUGEINT) * rr2 AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * 12.0) - 3.0 * CAST(n AS DOUBLE) * 4.0
      |      AS chi2,
      |    1.0 - CAST(tmass AS DOUBLE) / (CAST(n AS DOUBLE) * 24.0) AS corr
      |  FROM m)
      |SELECT n AS n_subjects, rr0 AS r2_0, rr1 AS r2_1, rr2 AS r2_2,
      |  CAST(CAST(CASE WHEN n > 0 THEN chi2 END AS DECIMAL(38,4))
      |    AS VARCHAR) AS chi2,
      |  CAST(CAST(CASE WHEN n > 0 AND corr > 0 THEN chi2 / corr END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS chi2_tie_corrected
      |FROM c""".stripMargin

  // ==== q297: Cronbach's alpha ================================================
  //
  // The internal-consistency readout for any composite metric (k items
  // per subject — here the three day-part purchase counts as a "daily
  // engagement scale"): α = k/(k−1)·(1 − Σv_item / v_total), where
  // v_total is the variance of the per-subject item SUM. All moments are
  // exact decimals from ONE user-domain aggregation (per-item sums,
  // squares, and the total's square); the variance ratio is a fixed
  // k+1-term double expression over identical decimals — item variances
  // sum in declared item order (k is compile-time, no aggregation-order
  // hazard). Degenerate zero-total-variance inputs report null.

  /** One row: (n_subjects, alpha) — Cronbach's α over per-`idCol`
    * integer item values `xs` (k = xs.size ≥ 2). */
  def cronbachAlpha(df: DataFrame, idCol: String, xs: Seq[Column])
      : DataFrame = {
    val k = xs.size
    require(k >= 2, "cronbachAlpha needs at least 2 items")
    val perUser = df.groupBy(col(idCol))
      .agg(xs.zipWithIndex.map { case (x, i) => sum(x).as(s"x$i") }.head,
        xs.zipWithIndex.tail.map { case (x, i) => sum(x).as(s"x$i") }: _*)
    val tot = (0 until k).map(i => col(s"x$i")).reduce(_ + _)
    def d18(c: Column) = c.cast("decimal(18,0)")
    val aggs = (0 until k).flatMap(i => Seq(
      sum(d18(col(s"x$i"))).as(s"s$i"),
      sum(d18(col(s"x$i")) * d18(col(s"x$i"))).as(s"ss$i"))) ++ Seq(
      sum(d18(tot)).as("st"), sum(d18(tot) * d18(tot)).as("sst"),
      count(lit(1)).as("n"))
    val m = perUser.agg(aggs.head, aggs.tail: _*)
    def dd(c: Column) = c.cast("double")
    def v(sCol: String, ssCol: String) =
      (dd(col("n")) * dd(col(ssCol)) - dd(col(sCol)) * dd(col(sCol))) /
        (dd(col("n")) * (dd(col("n")) - lit(1.0)))
    val sumVi = (0 until k).map(i => v(s"s$i", s"ss$i")).reduce(_ + _)
    val vTot = v("st", "sst")
    m.select(col("n").as("n_subjects"),
      when(col("n") > 1 && vTot > 0,
        lit(k.toDouble / (k - 1)) * (lit(1.0) - sumVi / vTot)).as("alpha"))
  }

  private def q297(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"),
      col("event_type"), hour(col("ts")).as("hod"))
    def part(lo: Int, hi: Int) =
      when(col("event_type") === "purchase" &&
        col("hod") >= lo && col("hod") < hi, 1L).otherwise(0L)
    cronbachAlpha(e, "user_id",
      Seq(part(0, 8), part(8, 16), part(16, 24)))
      .select(col("n_subjects"), QueryDef.dec4(col("alpha")).as("alpha"))
  }

  private val q297Sql =
    """WITH f AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND hour(ts) < 8
      |      THEN 1 ELSE 0 END) AS DECIMAL(18,0)) AS x0,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND hour(ts) >= 8
      |      AND hour(ts) < 16 THEN 1 ELSE 0 END) AS DECIMAL(18,0)) AS x1,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND hour(ts) >= 16
      |      THEN 1 ELSE 0 END) AS DECIMAL(18,0)) AS x2
      |  FROM events GROUP BY user_id),
      |m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(x0) AS DECIMAL(38,0)) AS s0,
      |    CAST(sum(x0 * x0) AS DECIMAL(38,0)) AS ss0,
      |    CAST(sum(x1) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(x1 * x1) AS DECIMAL(38,0)) AS ss1,
      |    CAST(sum(x2) AS DECIMAL(38,0)) AS s2,
      |    CAST(sum(x2 * x2) AS DECIMAL(38,0)) AS ss2,
      |    CAST(sum(x0 + x1 + x2) AS DECIMAL(38,0)) AS st,
      |    CAST(sum((x0 + x1 + x2) * (x0 + x1 + x2)) AS DECIMAL(38,0))
      |      AS sst
      |  FROM f),
      |c AS (
      |  SELECT n,
      |    (CAST(n AS DOUBLE) * CAST(ss0 AS DOUBLE)
      |      - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
      |    + (CAST(n AS DOUBLE) * CAST(ss1 AS DOUBLE)
      |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
      |    + (CAST(n AS DOUBLE) * CAST(ss2 AS DOUBLE)
      |      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS sum_vi,
      |    (CAST(n AS DOUBLE) * CAST(sst AS DOUBLE)
      |      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS v_tot
      |  FROM m)
      |SELECT n AS n_subjects,
      |  CAST(CAST(CASE WHEN n > 1 AND v_tot > 0
      |    THEN 1.5 * (1.0 - sum_vi / v_tot) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS alpha
      |FROM c""".stripMargin

  // ==== q298: intraclass correlation ICC(1) ==================================
  //
  // The agreement coefficient q297's α is often mistaken for: ICC(1) =
  // (MSB − MSW)/(MSB + (k−1)·MSW) from the one-way subjects-as-groups
  // ANOVA — "how much of the measurement variance is the subject, not
  // the occasion" (rater agreement, repeated-measures reliability).
  // Exactness: SSW·n and SSB·n collapse to pure integer forms —
  // SSW_n = n·(k·ΣΣx² − Σ_u T_u²)/k and SSB_n = (k·Σ_u T_u² /k... both
  // derived from TWO exact decimal sums (ΣΣx², Σ_u T_u², (ΣT)²) — so
  // the mean squares divide identical decimals; one user-domain pass.

  /** One row: (n_subjects, icc1) — one-way intraclass correlation over
    * per-`idCol` item values `xs` (k = xs.size ≥ 2). */
  def icc1(df: DataFrame, idCol: String, xs: Seq[Column]): DataFrame = {
    val k = xs.size
    require(k >= 2, "icc1 needs at least 2 measurements per subject")
    val perUser = df.groupBy(col(idCol))
      .agg(xs.zipWithIndex.map { case (x, i) => sum(x).as(s"x$i") }.head,
        xs.zipWithIndex.tail.map { case (x, i) => sum(x).as(s"x$i") }: _*)
    def d18(c: Column) = c.cast("decimal(18,0)")
    val ssx = (0 until k).map(i => d18(col(s"x$i")) * d18(col(s"x$i")))
      .reduce(_ + _)
    val t = (0 until k).map(i => d18(col(s"x$i"))).reduce(_ + _)
    val m = perUser.agg(count(lit(1)).as("n"),
      sum(ssx).as("sxx"),     // ΣΣ x²
      sum(t * t).as("stt"),   // Σ_u T_u²
      sum(t).as("st"))        // ΣT (grand total)
    def dd(c: Column) = c.cast("double")
    // SSW = Σx² − ΣT²/k ; SSB = ΣT²/k − (ΣT)²/(nk)
    val ssw = dd(col("sxx")) - dd(col("stt")) / lit(k.toDouble)
    val ssb = dd(col("stt")) / lit(k.toDouble) -
      dd(col("st")) * dd(col("st")) / (dd(col("n")) * lit(k.toDouble))
    val msw = ssw / (dd(col("n")) * lit((k - 1).toDouble))
    val msb = ssb / (dd(col("n")) - lit(1.0))
    m.select(col("n").as("n_subjects"),
      when(col("n") > 1 && (msb + lit((k - 1).toDouble) * msw) > 0,
        (msb - msw) / (msb + lit((k - 1).toDouble) * msw)).as("icc1"))
  }

  private def q298(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"),
      col("event_type"), hour(col("ts")).as("hod"))
    def part(lo: Int, hi: Int) =
      when(col("event_type") === "purchase" &&
        col("hod") >= lo && col("hod") < hi, 1L).otherwise(0L)
    icc1(e, "user_id", Seq(part(0, 8), part(8, 16), part(16, 24)))
      .select(col("n_subjects"), QueryDef.dec4(col("icc1")).as("icc1"))
  }

  private val q298Sql =
    """WITH f AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND hour(ts) < 8
      |      THEN 1 ELSE 0 END) AS DECIMAL(18,0)) AS x0,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND hour(ts) >= 8
      |      AND hour(ts) < 16 THEN 1 ELSE 0 END) AS DECIMAL(18,0)) AS x1,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND hour(ts) >= 16
      |      THEN 1 ELSE 0 END) AS DECIMAL(18,0)) AS x2
      |  FROM events GROUP BY user_id),
      |m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(x0 * x0 + x1 * x1 + x2 * x2) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum((x0 + x1 + x2) * (x0 + x1 + x2)) AS DECIMAL(38,0))
      |      AS stt,
      |    CAST(sum(x0 + x1 + x2) AS DECIMAL(38,0)) AS st
      |  FROM f),
      |c AS (
      |  SELECT n,
      |    (CAST(sxx AS DOUBLE) - CAST(stt AS DOUBLE) / 3.0)
      |      / (CAST(n AS DOUBLE) * 2.0) AS msw,
      |    (CAST(stt AS DOUBLE) / 3.0
      |      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
      |        / (CAST(n AS DOUBLE) * 3.0))
      |      / (CAST(n AS DOUBLE) - 1.0) AS msb
      |  FROM m)
      |SELECT n AS n_subjects,
      |  CAST(CAST(CASE WHEN n > 1 AND msb + 2.0 * msw > 0
      |    THEN (msb - msw) / (msb + 2.0 * msw) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS icc1
      |FROM c""".stripMargin

  // ==== q299: Fleiss' kappa ==================================================
  //
  // Multi-rater categorical agreement — the k-rater generalization the
  // pairwise Cohen's kappa (B96) cannot give and the continuous-scale
  // ICC (q298) does not apply to: k raters assign each of n subjects to
  // one of c categories; κ = (P̄ − P_e)/(1 − P_e) with P̄ the mean
  // pairwise within-subject agreement and P_e the marginal chance rate.
  // Exactness: with n_ij = raters placing subject i in category j,
  // P̄ = (A − nk)/(nk(k−1)) and P_e = Σ_j C_j²/(nk)² where A = ΣΣ n_ij²
  // and C_j = Σ_i n_ij are exact integer sums from ONE subject-domain
  // pass; κ is a fixed double chain over those integers. Raters here are
  // three deterministic length-bucket classifiers with offset thresholds
  // (the planted-disagreement fixture both engines reproduce verbatim).

  /** One row: (n_subjects, p_bar, p_e, kappa) — Fleiss' κ over `ratings`,
    * one column per rater, each valued in 0..(c−1). */
  def fleissKappa(df: DataFrame, ratings: Seq[Column], nCats: Int)
      : DataFrame = {
    val k = ratings.size
    require(k >= 2 && nCats >= 2, "fleissKappa needs >=2 raters, >=2 cats")
    val rated = df.select(ratings.zipWithIndex.map {
      case (r, i) => r.cast("int").as(s"r$i") }: _*)
    val nij = (0 until nCats).map(j =>
      (0 until k).map(i => when(col(s"r$i") === j, 1).otherwise(0))
        .reduce(_ + _).as(s"n$j"))
    val perSubj = rated.select(nij: _*)
    val aggs = Seq(count(lit(1)).as("n"),
      sum((0 until nCats).map(j => col(s"n$j") * col(s"n$j"))
        .reduce(_ + _).cast("long")).as("a")) ++
      (0 until nCats).map(j => sum(col(s"n$j").cast("long")).as(s"c$j"))
    val m = perSubj.agg(aggs.head, aggs.tail: _*)
    def dd(c: Column) = c.cast("double")
    val nk = dd(col("n")) * k
    val pBar = (dd(col("a")) - nk) / (nk * (k - 1))
    val pE = (0 until nCats)
      .map(j => dd(col(s"c$j")) * dd(col(s"c$j"))).reduce(_ + _) / (nk * nk)
    m.select(col("n").as("n_subjects"),
      pBar.as("p_bar"), pE.as("p_e"),
      when(col("n") > 0 && pE < 1.0, (pBar - pE) / (lit(1.0) - pE))
        .as("kappa"))
  }

  private def q299(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def rater(lo: Int, hi: Int) =
      when(col("n_chars") < lo, 0).when(col("n_chars") < hi, 1).otherwise(2)
    fleissKappa(docs,
      Seq(rater(200, 380), rater(180, 360), rater(220, 400)), nCats = 3)
      .select(col("n_subjects"), QueryDef.dec4(col("p_bar")).as("p_bar"),
        QueryDef.dec4(col("p_e")).as("p_e"),
        QueryDef.dec4(col("kappa")).as("kappa"))
  }

  private val q299Sql =
    """WITH r AS (
      |  SELECT
      |    CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 380 THEN 1
      |      ELSE 2 END AS r0,
      |    CASE WHEN n_chars < 180 THEN 0 WHEN n_chars < 360 THEN 1
      |      ELSE 2 END AS r1,
      |    CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 400 THEN 1
      |      ELSE 2 END AS r2
      |  FROM documents),
      |s AS (
      |  SELECT
      |    (CASE WHEN r0 = 0 THEN 1 ELSE 0 END + CASE WHEN r1 = 0 THEN 1
      |      ELSE 0 END + CASE WHEN r2 = 0 THEN 1 ELSE 0 END) AS n0,
      |    (CASE WHEN r0 = 1 THEN 1 ELSE 0 END + CASE WHEN r1 = 1 THEN 1
      |      ELSE 0 END + CASE WHEN r2 = 1 THEN 1 ELSE 0 END) AS n1,
      |    (CASE WHEN r0 = 2 THEN 1 ELSE 0 END + CASE WHEN r1 = 2 THEN 1
      |      ELSE 0 END + CASE WHEN r2 = 2 THEN 1 ELSE 0 END) AS n2
      |  FROM r),
      |m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(n0 * n0 + n1 * n1 + n2 * n2) AS BIGINT) AS a,
      |    CAST(sum(n0) AS BIGINT) AS c0, CAST(sum(n1) AS BIGINT) AS c1,
      |    CAST(sum(n2) AS BIGINT) AS c2
      |  FROM s),
      |c AS (
      |  SELECT n,
      |    (CAST(a AS DOUBLE) - CAST(n AS DOUBLE) * 3)
      |      / (CAST(n AS DOUBLE) * 3 * 2) AS p_bar,
      |    (CAST(c0 AS DOUBLE) * CAST(c0 AS DOUBLE)
      |      + CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE)
      |      + CAST(c2 AS DOUBLE) * CAST(c2 AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * 3 * (CAST(n AS DOUBLE) * 3)) AS p_e
      |  FROM m)
      |SELECT n AS n_subjects,
      |  CAST(CAST(p_bar AS DECIMAL(38,4)) AS VARCHAR) AS p_bar,
      |  CAST(CAST(p_e AS DECIMAL(38,4)) AS VARCHAR) AS p_e,
      |  CAST(CAST(CASE WHEN n > 0 AND p_e < 1.0
      |    THEN (p_bar - p_e) / (1.0 - p_e) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS kappa
      |FROM c""".stripMargin

  // ==== q300: Kendall's W — coefficient of concordance ========================
  //
  // The effect size for q293's Friedman test: m judges rank n objects;
  // W ∈ [0,1] measures how far the m rankings agree (W = χ²_F/(m(n−1))).
  // Tie-corrected: W = (3·ΣR2² − 3m²n(n+1)²) / (m²n(n²−1) − m·ΣT)
  // with DOUBLED midranks R2 (the B177 idiom — 2·avg(rank..rank+t−1) =
  // 2·rank + t − 1 keeps every tie-averaged rank an exact integer),
  // ΣR2² summing squared per-object doubled rank totals (the 4× absorbs
  // into the algebra above), and T = Σ(t³−t) per judge over tie groups.
  // Judges here are the three day-parts, objects the event types, the
  // ranking each judge's activity ordering — everything past the one
  // corpus-sized groupBy lives on the (judges × types) domain.

  /** One row: (n_objects, m_judges, w) — Kendall's W over `df` rows
    * (judge, obj, score), ranking objects per judge by (score, obj). */
  def kendallW(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byJudge = Window.partitionBy(col("judge")).orderBy(col("score"))
    val tieW = Window.partitionBy(col("judge"), col("score"))
    val ranked = cells
      .withColumn("rk", rank().over(byJudge))
      .withColumn("t", count(lit(1)).over(tieW))
      .withColumn("r2", lit(2) * col("rk") + col("t") - lit(1))
    val perObj = ranked.groupBy(col("obj"))
      .agg(sum(col("r2").cast("long")).as("r2sum"),
        count(lit(1)).as("m"))
    val ties = ranked.select(col("judge"), col("score"), col("t"))
      .distinct()
      .agg(coalesce(sum((col("t") * col("t") * col("t") - col("t"))
        .cast("long")), lit(0L)).as("tt"))
    val m = perObj.agg(count(lit(1)).as("n"), max(col("m")).as("mj"),
        min(col("m")).as("mj_min"),
        sum(col("r2sum") * col("r2sum")).as("sr2")) // long: domain-sized
      .crossJoin(ties)
    def dd(c: Column) = c.cast("double")
    val num = lit(3.0) * dd(col("sr2")) -
      lit(3.0) * dd(col("mj")) * dd(col("mj")) * dd(col("n")) *
        (dd(col("n")) + 1) * (dd(col("n")) + 1)
    val den = dd(col("mj")) * dd(col("mj")) * dd(col("n")) *
      (dd(col("n")) * dd(col("n")) - 1) - dd(col("mj")) * dd(col("tt"))
    m.select(col("n").as("n_objects"), col("mj").as("m_judges"),
      when(col("n") > 1 && col("mj") === col("mj_min") && den > 0,
        num / den).as("w"))
  }

  private def q300(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .select(floor(hour(col("ts")) / 8).cast("int").as("judge"),
        col("event_type").as("obj"))
      .groupBy(col("judge"), col("obj"))
      .agg(count(lit(1)).as("score"))
    kendallW(cells)
      .select(col("n_objects"), col("m_judges"),
        QueryDef.dec4(col("w")).as("w"))
  }

  private val q300Sql =
    """WITH cells AS (
      |  SELECT CAST(hour(ts) // 8 AS INT) AS judge, event_type AS obj,
      |    count(*) AS score
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT judge, obj,
      |    2 * rank() OVER (PARTITION BY judge ORDER BY score)
      |      + count(*) OVER (PARTITION BY judge, score) - 1 AS r2,
      |    count(*) OVER (PARTITION BY judge, score) AS t, score
      |  FROM cells),
      |per_obj AS (
      |  SELECT obj, CAST(sum(r2) AS BIGINT) AS r2sum, count(*) AS m
      |  FROM ranked GROUP BY obj),
      |ties AS (
      |  SELECT COALESCE(CAST(sum(t * t * t - t) AS BIGINT), 0) AS tt
      |  FROM (SELECT DISTINCT judge, score, t FROM ranked)),
      |m AS (
      |  SELECT count(*) AS n, max(m) AS mj, min(m) AS mj_min,
      |    CAST(sum(r2sum * r2sum) AS BIGINT) AS sr2
      |  FROM per_obj)
      |SELECT n AS n_objects, mj AS m_judges,
      |  CAST(CAST(CASE WHEN n > 1 AND mj = mj_min
      |    AND CAST(mj AS DOUBLE) * mj * n * (CAST(n AS DOUBLE) * n - 1)
      |      - CAST(mj AS DOUBLE) * tt > 0
      |    THEN (3.0 * CAST(sr2 AS DOUBLE)
      |        - 3.0 * CAST(mj AS DOUBLE) * mj * n
      |          * (CAST(n AS DOUBLE) + 1) * (CAST(n AS DOUBLE) + 1))
      |      / (CAST(mj AS DOUBLE) * mj * n * (CAST(n AS DOUBLE) * n - 1)
      |        - CAST(mj AS DOUBLE) * tt) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS w
      |FROM m CROSS JOIN ties""".stripMargin

  // ==== q304: Jensen–Shannon divergence drift =================================
  //
  // The BOUNDED, symmetric member of the drift shelf (KS q131 is a max
  // statistic, PSI explodes on empty bins, Wasserstein q256 is scale-
  // dependent — JS ∈ [0, ln 2] always, no smoothing needed): over 16
  // fixed-width value bins, JS = ½Σp·ln(2p/(p+q)) + ½Σq·ln(2q/(p+q)).
  // Exactness: each ln argument collapses to the integer ratio
  // 2·ca·nb/(ca·nb + cb·na) (decimal/HUGEINT products), the two per-bin
  // terms add in written order, and the bin total is ⌊10⁹·(tp+tq)⌋-
  // floored ONCE so the 16-bin sum is an exact integer.

  /** One row: (n_a, n_b, n_bins, js_nano) — JS divergence between the
    * `sideA` and complement distributions of `cents` over 16 fixed bins
    * of width `binW`. js_nano = ⌊10⁹·2·JS⌋-style exact integer sum of
    * the (p+q)-term pairs; divide by 2·10⁹ for JS in nats. */
  def jsDivergence(df: DataFrame, centsCol: String, sideA: Column,
      binW: Long): DataFrame = {
    val bins = df
      .select(least(expr(s"$centsCol div ${binW}L"), lit(15L))
        .cast("long").as("b"),
        when(sideA, 1L).otherwise(0L).as("a"))
      .groupBy(col("b"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val totals = broadcast(bins.agg(sum(col("ca")).as("na"),
      sum(col("cb")).as("nb")))
    def d0(c: Column) = c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    val t = bins.crossJoin(totals)
      .withColumn("xab", d0(col("ca")) * col("nb"))
      .withColumn("xba", d0(col("cb")) * col("na"))
      .withColumn("tp", when(col("ca") > 0,
        (dd(col("ca")) / dd(col("na"))) *
          log(dd(lit(2) * col("xab")) / dd(col("xab") + col("xba"))))
        .otherwise(lit(0.0)))
      .withColumn("tq", when(col("cb") > 0,
        (dd(col("cb")) / dd(col("nb"))) *
          log(dd(lit(2) * col("xba")) / dd(col("xab") + col("xba"))))
        .otherwise(lit(0.0)))
      .withColumn("js_b",
        floor(lit(1e9) * (col("tp") + col("tq"))).cast("long"))
    t.groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(count(lit(1)).as("n_bins"), sum(col("js_b")).as("js2_nano"))
      .select(col("n_a"), col("n_b"), col("n_bins"), col("js2_nano"))
  }

  private def q304(s: SparkSession, dir: String): DataFrame =
    jsDivergence(
      Tables.orders(s, dir).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey")),
      "cents", col("o_orderkey") % 2 === 0, binW = 4000000L)

  private val q304Sql =
    """WITH v AS (
      |  SELECT least(CAST(round(o_totalprice * 100) AS BIGINT) // 4000000,
      |      15) AS b,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS a
      |  FROM orders),
      |bins AS (
      |  SELECT b, CAST(sum(a) AS BIGINT) AS ca,
      |    CAST(sum(1 - a) AS BIGINT) AS cb
      |  FROM v GROUP BY b),
      |tot AS (
      |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT)
      |    AS nb FROM bins),
      |t AS (
      |  SELECT na, nb,
      |    CAST(floor(1e9 * (
      |      (CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
      |        * ln(CAST(2 * (CAST(ca AS HUGEINT) * nb) AS DOUBLE)
      |          / CAST(CAST(ca AS HUGEINT) * nb
      |            + CAST(cb AS HUGEINT) * na AS DOUBLE)) ELSE 0.0 END)
      |      + (CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
      |        * ln(CAST(2 * (CAST(cb AS HUGEINT) * na) AS DOUBLE)
      |          / CAST(CAST(ca AS HUGEINT) * nb
      |            + CAST(cb AS HUGEINT) * na AS DOUBLE)) ELSE 0.0 END)))
      |      AS BIGINT) AS js_b
      |  FROM bins CROSS JOIN tot)
      |SELECT na AS n_a, nb AS n_b, count(*) AS n_bins,
      |  CAST(sum(js_b) AS BIGINT) AS js2_nano
      |FROM t GROUP BY 1, 2""".stripMargin

  // ==== q316: Gwet's AC1 ======================================================
  //
  // The prevalence-robust twin of q299's Fleiss κ (the "kappa paradox":
  // on skewed category distributions κ collapses toward 0 even at near-
  // perfect agreement; AC1's chance term uses the complement weighting
  // P_e = Σ_j π_j(1−π_j)/(c−1) and stays stable): same P̄ and marginals
  // — the identical one-pass integers A and C_j — different chance
  // correction. Same three-rater length-bucket fixture, so q299 vs q316
  // exhibit the paradox on real data.

  /** One row: (n_subjects, p_bar, p_e_gamma, ac1) for k rater columns
    * over `nCats` categories. */
  def gwetAC1(df: DataFrame, ratings: Seq[Column], nCats: Int): DataFrame = {
    val k = ratings.size
    require(k >= 2 && nCats >= 2, "gwetAC1 needs >=2 raters, >=2 cats")
    val rated = df.select(ratings.zipWithIndex.map {
      case (r, i) => r.cast("int").as(s"r$i") }: _*)
    val nij = (0 until nCats).map(j =>
      (0 until k).map(i => when(col(s"r$i") === j, 1).otherwise(0))
        .reduce(_ + _).as(s"n$j"))
    val perSubj = rated.select(nij: _*)
    val aggs = Seq(count(lit(1)).as("n"),
      sum((0 until nCats).map(j => col(s"n$j") * col(s"n$j"))
        .reduce(_ + _).cast("long")).as("a")) ++
      (0 until nCats).map(j => sum(col(s"n$j").cast("long")).as(s"c$j"))
    val m = perSubj.agg(aggs.head, aggs.tail: _*)
    def dd(c: Column) = c.cast("double")
    val nk = dd(col("n")) * k
    val pBar = (dd(col("a")) - nk) / (nk * (k - 1))
    val peG = (0 until nCats).map { j =>
      val pij = dd(col(s"c$j")) / nk
      pij * (lit(1.0) - pij)
    }.reduce(_ + _) / (nCats - 1)
    m.select(col("n").as("n_subjects"), pBar.as("p_bar"),
      peG.as("p_e_gamma"),
      when(col("n") > 0 && peG < 1.0, (pBar - peG) / (lit(1.0) - peG))
        .as("ac1"))
  }

  private def q316(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def rater(lo: Int, hi: Int) =
      when(col("n_chars") < lo, 0).when(col("n_chars") < hi, 1).otherwise(2)
    gwetAC1(docs,
      Seq(rater(200, 380), rater(180, 360), rater(220, 400)), nCats = 3)
      .select(col("n_subjects"), QueryDef.dec4(col("p_bar")).as("p_bar"),
        QueryDef.dec4(col("p_e_gamma")).as("p_e_gamma"),
        QueryDef.dec4(col("ac1")).as("ac1"))
  }

  private val q316Sql =
    """WITH r AS (
      |  SELECT
      |    CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 380 THEN 1
      |      ELSE 2 END AS r0,
      |    CASE WHEN n_chars < 180 THEN 0 WHEN n_chars < 360 THEN 1
      |      ELSE 2 END AS r1,
      |    CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 400 THEN 1
      |      ELSE 2 END AS r2
      |  FROM documents),
      |s AS (
      |  SELECT
      |    (CASE WHEN r0 = 0 THEN 1 ELSE 0 END + CASE WHEN r1 = 0 THEN 1
      |      ELSE 0 END + CASE WHEN r2 = 0 THEN 1 ELSE 0 END) AS n0,
      |    (CASE WHEN r0 = 1 THEN 1 ELSE 0 END + CASE WHEN r1 = 1 THEN 1
      |      ELSE 0 END + CASE WHEN r2 = 1 THEN 1 ELSE 0 END) AS n1,
      |    (CASE WHEN r0 = 2 THEN 1 ELSE 0 END + CASE WHEN r1 = 2 THEN 1
      |      ELSE 0 END + CASE WHEN r2 = 2 THEN 1 ELSE 0 END) AS n2
      |  FROM r),
      |m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(n0 * n0 + n1 * n1 + n2 * n2) AS BIGINT) AS a,
      |    CAST(sum(n0) AS BIGINT) AS c0, CAST(sum(n1) AS BIGINT) AS c1,
      |    CAST(sum(n2) AS BIGINT) AS c2
      |  FROM s),
      |c AS (
      |  SELECT n,
      |    (CAST(a AS DOUBLE) - CAST(n AS DOUBLE) * 3)
      |      / (CAST(n AS DOUBLE) * 3 * 2) AS p_bar,
      |    ((CAST(c0 AS DOUBLE) / (CAST(n AS DOUBLE) * 3))
      |        * (1.0 - CAST(c0 AS DOUBLE) / (CAST(n AS DOUBLE) * 3))
      |      + (CAST(c1 AS DOUBLE) / (CAST(n AS DOUBLE) * 3))
      |        * (1.0 - CAST(c1 AS DOUBLE) / (CAST(n AS DOUBLE) * 3))
      |      + (CAST(c2 AS DOUBLE) / (CAST(n AS DOUBLE) * 3))
      |        * (1.0 - CAST(c2 AS DOUBLE) / (CAST(n AS DOUBLE) * 3)))
      |      / 2 AS p_e_gamma
      |  FROM m)
      |SELECT n AS n_subjects,
      |  CAST(CAST(p_bar AS DECIMAL(38,4)) AS VARCHAR) AS p_bar,
      |  CAST(CAST(p_e_gamma AS DECIMAL(38,4)) AS VARCHAR) AS p_e_gamma,
      |  CAST(CAST(CASE WHEN n > 0 AND p_e_gamma < 1.0
      |    THEN (p_bar - p_e_gamma) / (1.0 - p_e_gamma) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS ac1
      |FROM c""".stripMargin

  // ==== q318: Krippendorff's alpha (nominal) ==================================
  //
  // The agreement coefficient content-analysis standards actually
  // require reported (Krippendorff 2004) — chance-corrected like q299's
  // κ but against the PAIRABLE-VALUES distribution with the (N−1)
  // small-sample correction: α = 1 − D_o/D_e where, for complete
  // nominal data, D_o = (nk² − A)/(nk(k−1)) and D_e = (N² − ΣC_j²)/
  // (N(N−1)) with N = nk — the SAME one-pass integers A = ΣΣn_ij² and
  // marginals C_j as q299/q316, third chance model. The agreement shelf
  // (κ_F, AC1, α, ICC, Cronbach, W) now spans every standard
  // correction.

  /** One row: (n_subjects, d_o, d_e, alpha). */
  def krippendorffAlpha(df: DataFrame, ratings: Seq[Column], nCats: Int)
      : DataFrame = {
    val k = ratings.size
    require(k >= 2 && nCats >= 2, "krippendorffAlpha needs >=2 raters/cats")
    val rated = df.select(ratings.zipWithIndex.map {
      case (r, i) => r.cast("int").as(s"r$i") }: _*)
    val nij = (0 until nCats).map(j =>
      (0 until k).map(i => when(col(s"r$i") === j, 1).otherwise(0))
        .reduce(_ + _).as(s"n$j"))
    val perSubj = rated.select(nij: _*)
    val aggs = Seq(count(lit(1)).as("n"),
      sum((0 until nCats).map(j => col(s"n$j") * col(s"n$j"))
        .reduce(_ + _).cast("long")).as("a")) ++
      (0 until nCats).map(j => sum(col(s"n$j").cast("long")).as(s"c$j"))
    val m = perSubj.agg(aggs.head, aggs.tail: _*)
    def dd(c: Column) = c.cast("double")
    val bigN = dd(col("n")) * k
    val dO = (dd(col("n")) * (k * k) - dd(col("a"))) /
      (dd(col("n")) * (k * (k - 1)))
    val sc2 = (0 until nCats)
      .map(j => dd(col(s"c$j")) * dd(col(s"c$j"))).reduce(_ + _)
    val dE = (bigN * bigN - sc2) / (bigN * (bigN - 1))
    m.select(col("n").as("n_subjects"), dO.as("d_o"), dE.as("d_e"),
      when(col("n") > 0 && dE > 0, lit(1.0) - dO / dE).as("alpha"))
  }

  private def q318(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def rater(lo: Int, hi: Int) =
      when(col("n_chars") < lo, 0).when(col("n_chars") < hi, 1).otherwise(2)
    krippendorffAlpha(docs,
      Seq(rater(200, 380), rater(180, 360), rater(220, 400)), nCats = 3)
      .select(col("n_subjects"), QueryDef.dec4(col("d_o")).as("d_o"),
        QueryDef.dec4(col("d_e")).as("d_e"),
        QueryDef.dec4(col("alpha")).as("alpha"))
  }

  private val q318Sql =
    """WITH r AS (
      |  SELECT
      |    CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 380 THEN 1
      |      ELSE 2 END AS r0,
      |    CASE WHEN n_chars < 180 THEN 0 WHEN n_chars < 360 THEN 1
      |      ELSE 2 END AS r1,
      |    CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 400 THEN 1
      |      ELSE 2 END AS r2
      |  FROM documents),
      |s AS (
      |  SELECT
      |    (CASE WHEN r0 = 0 THEN 1 ELSE 0 END + CASE WHEN r1 = 0 THEN 1
      |      ELSE 0 END + CASE WHEN r2 = 0 THEN 1 ELSE 0 END) AS n0,
      |    (CASE WHEN r0 = 1 THEN 1 ELSE 0 END + CASE WHEN r1 = 1 THEN 1
      |      ELSE 0 END + CASE WHEN r2 = 1 THEN 1 ELSE 0 END) AS n1,
      |    (CASE WHEN r0 = 2 THEN 1 ELSE 0 END + CASE WHEN r1 = 2 THEN 1
      |      ELSE 0 END + CASE WHEN r2 = 2 THEN 1 ELSE 0 END) AS n2
      |  FROM r),
      |m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(n0 * n0 + n1 * n1 + n2 * n2) AS BIGINT) AS a,
      |    CAST(sum(n0) AS BIGINT) AS c0, CAST(sum(n1) AS BIGINT) AS c1,
      |    CAST(sum(n2) AS BIGINT) AS c2
      |  FROM s),
      |c AS (
      |  SELECT n,
      |    (CAST(n AS DOUBLE) * 9 - CAST(a AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * 6) AS d_o,
      |    ((CAST(n AS DOUBLE) * 3) * (CAST(n AS DOUBLE) * 3)
      |      - (CAST(c0 AS DOUBLE) * CAST(c0 AS DOUBLE)
      |        + CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE)
      |        + CAST(c2 AS DOUBLE) * CAST(c2 AS DOUBLE)))
      |      / ((CAST(n AS DOUBLE) * 3) * (CAST(n AS DOUBLE) * 3 - 1))
      |      AS d_e
      |  FROM m)
      |SELECT n AS n_subjects,
      |  CAST(CAST(d_o AS DECIMAL(38,4)) AS VARCHAR) AS d_o,
      |  CAST(CAST(d_e AS DECIMAL(38,4)) AS VARCHAR) AS d_e,
      |  CAST(CAST(CASE WHEN n > 0 AND d_e > 0 THEN 1.0 - d_o / d_e END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS alpha
      |FROM c""".stripMargin

  // ==== q319: Welch's ANOVA ===================================================
  //
  // The k-group mean test that does NOT assume equal variances — the one
  // to run when q280's Levene REJECTS homogeneity (classic ANOVA F is
  // anti-conservative there): groups weighted by w_g = n_g/v_g,
  // F* = [Σw(m−m̄_w)²/(k−1)] / [1 + 2(k−2)/(k²−1)·r] with r =
  // Σ(1−w/Σw)²/(n_g−1) and Welch–Satterthwaite df₂ = (k²−1)/(3r).
  // Determinism: every cross-group sum expands to a LEFT-TO-RIGHT fold
  // over group-ORDERED term arrays (the q281 idiom — both engines add
  // identical doubles in identical order); the quadratic Σw(m−m̄)²
  // expands to Σwm² − 2m̄Σwm + m̄²Σw so no second pass over the array
  // is needed; per-group moments are exact decimals.

  /** One row: (k, n, f_star, df2) — Welch's heteroscedastic ANOVA of
    * integer column `x` across `group`. */
  def welchAnova(df: DataFrame, group: String, x: String): DataFrame = {
    val xd = col(x).cast("decimal(18,0)")
    val g = df.groupBy(col(group))
      .agg(count(lit(1)).as("n_g"), sum(xd).as("s_g"),
        sum(xd * xd).as("ss_g"))
      .filter(col("n_g") > 1)
    def dd(c: String) = col(c).cast("double")
    val mG = dd("s_g") / dd("n_g")
    val vG = (dd("n_g") * dd("ss_g") - dd("s_g") * dd("s_g")) /
      (dd("n_g") * (dd("n_g") - lit(1.0)))
    val wG = dd("n_g") / vG
    val terms = g.filter(vG > 0).select(col("n_g"),
      struct(col(group).as("g"), wG.as("w"), (wG * mG).as("wm"),
        (wG * mG * mG).as("wm2"),
        (lit(1.0) / (dd("n_g") - 1)).as("i1"),
        (wG / (dd("n_g") - 1)).as("iw"),
        (wG * wG / (dd("n_g") - 1)).as("iw2")).as("gt"))
    def fold(field: String) =
      aggregate(col("arr"), lit(0.0),
        (acc, e) => acc + e.getField(field))
    val m = terms.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sort_array(collect_list(col("gt"))).as("arr"))
      .select(col("k"), col("n"), fold("w").as("sw"),
        fold("wm").as("swm"), fold("wm2").as("swm2"),
        fold("i1").as("r1"), fold("iw").as("r2"), fold("iw2").as("r3"))
    val mbar = col("swm") / col("sw")
    val q = col("swm2") - lit(2.0) * mbar * col("swm") +
      mbar * mbar * col("sw")
    val r = col("r1") - lit(2.0) * col("r2") / col("sw") +
      col("r3") / (col("sw") * col("sw"))
    def kd = col("k").cast("double")
    m.select(col("k"), col("n"),
      when(col("k") > 1 && col("sw") > 0 && r > 0,
        (q / (kd - 1)) /
          (lit(1.0) + lit(2.0) * (kd - 2) / (kd * kd - 1) * r))
        .as("f_star"),
      when(col("k") > 1 && r > 0,
        (kd * kd - 1) / (lit(3.0) * r)).as("df2"))
  }

  private def q319(s: SparkSession, dir: String): DataFrame =
    welchAnova(Tables.orders(s, dir)
      .select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("cents")),
      "grp", "cents")
      .select(col("k"), col("n"), QueryDef.dec4(col("f_star")).as("f_star"),
        QueryDef.dec4(col("df2")).as("df2"))

  private val q319Sql =
    """WITH d AS (
      |  SELECT o_orderpriority AS grp,
      |    CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(18,0))
      |      AS x
      |  FROM orders),
      |g AS (
      |  SELECT grp, count(*) AS n_g,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS s_g,
      |    CAST(sum(x * x) AS DECIMAL(38,0)) AS ss_g
      |  FROM d GROUP BY grp HAVING count(*) > 1),
      |t AS (
      |  SELECT grp, n_g,
      |    CAST(n_g AS DOUBLE)
      |      / ((CAST(n_g AS DOUBLE) * CAST(ss_g AS DOUBLE)
      |          - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE))
      |        / (CAST(n_g AS DOUBLE) * (CAST(n_g AS DOUBLE) - 1.0))) AS w,
      |    CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS m
      |  FROM g
      |  WHERE (CAST(n_g AS DOUBLE) * CAST(ss_g AS DOUBLE)
      |      - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE))
      |    / (CAST(n_g AS DOUBLE) * (CAST(n_g AS DOUBLE) - 1.0)) > 0),
      |m AS (
      |  SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(w ORDER BY grp)), (acc, x) -> acc + x) AS sw,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(w * m ORDER BY grp)), (acc, x) -> acc + x) AS swm,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(w * m * m ORDER BY grp)), (acc, x) -> acc + x) AS swm2,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(1.0 / (CAST(n_g AS DOUBLE) - 1) ORDER BY grp)),
      |      (acc, x) -> acc + x) AS r1,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(w / (CAST(n_g AS DOUBLE) - 1) ORDER BY grp)),
      |      (acc, x) -> acc + x) AS r2,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(w * w / (CAST(n_g AS DOUBLE) - 1) ORDER BY grp)),
      |      (acc, x) -> acc + x) AS r3
      |  FROM t),
      |c AS (
      |  SELECT k, n, sw, swm, swm2,
      |    swm2 - 2.0 * (swm / sw) * swm + (swm / sw) * (swm / sw) * sw
      |      AS q,
      |    r1 - 2.0 * r2 / sw + r3 / (sw * sw) AS r
      |  FROM m)
      |SELECT k, n,
      |  CAST(CAST(CASE WHEN k > 1 AND sw > 0 AND r > 0
      |    THEN (q / (CAST(k AS DOUBLE) - 1))
      |      / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2)
      |        / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1) * r) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS f_star,
      |  CAST(CAST(CASE WHEN k > 1 AND r > 0
      |    THEN (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1) / (3.0 * r) END
      |    AS DECIMAL(38,4)) AS VARCHAR) AS df2
      |FROM c""".stripMargin

  // ==== q342: Wilcoxon signed-rank test (paired two-sample) =================
  //
  // The PAIRED member the rank shelf was missing: Mann–Whitney (q216)
  // compares two independent samples, McNemar (q271) paired BINARY
  // outcomes — Wilcoxon signed-rank is the paired CONTINUOUS test
  // (before/after, A-vs-B within the same user), distribution-free where
  // the paired t-test assumes normal differences. Per user the pair is
  // (purchase cents total, view cents total); d = p − v, zeros dropped
  // per the classic procedure. Ranks are MIDRANKS over the DISTINCT-|d|
  // histogram (the q216 domain-window discipline — never a row-level
  // sort), kept ×2 so W⁺ stays an exact BIGINT: 2·W⁺ = Σ_{d>0}(2S+c+1).
  // The tie-corrected normal z carries 48·Var = 2n(n+1)(2n+1) − Σ(t³−t)
  // as an exact integer; the only float ops are the final division and
  // one sqrt (both correctly rounded — the engine-wide rule).

  /** One row: (n, w2, var48, z) — signed-rank over column `d` of
    * `diffs` (zeros dropped). w2 = 2·W⁺; var48 = 48·Var(W⁺). The
    * midrank prefix count runs through the DISTRIBUTED prefix-sum scan
    * ([[graft.chunk.ChunkAssigner.withPrefixSum]]) — the |d| histogram
    * is user-domain (one row per distinct paired difference), which at
    * corpus scale is NOT a bounded domain, so no global single-partition
    * window (the q122/q191 rule). */
  def wilcoxonSignedRank(diffs: DataFrame): DataFrame = {
    val hist = diffs.filter(col("d") =!= 0L)
      .select(abs(col("d")).as("ad"),
        when(col("d") > 0, 1L).otherwise(0L).as("p"))
      .groupBy(col("ad"))
      .agg(count(lit(1)).as("c"), sum(col("p")).as("cp"))
    def dd(c: Column) = c.cast("double")
    graft.chunk.ChunkAssigner
      .withPrefixSum(hist, Seq(col("ad")), col("c"), "s")
      .agg(sum(col("c")).as("n"),
        sum(col("cp") * (lit(2L) * col("s") + col("c") + 1L)).as("w2"),
        sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
      .select(col("n"), col("w2"),
        (lit(2L) * col("n") * (col("n") + 1L) * (lit(2L) * col("n") + 1L)
          - col("ties")).as("var48"),
        expr("(n * (n + 1)) div 2").as("mean1"))
      .select(col("n"), col("w2"), col("var48"),
        QueryDef.dec4(
          dd(col("w2") - col("mean1")) *
            sqrt(lit(12.0) / dd(col("var48")))).as("z"))
  }

  private def q342(s: SparkSession, dir: String): DataFrame = {
    val byUser = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", col("cents")))
          .as("p"),
        sum(when(col("event_type") === "view", col("cents"))).as("v"))
      .filter(col("p").isNotNull && col("v").isNotNull)
      .select((col("p") - col("v")).as("d"))
    wilcoxonSignedRank(byUser)
  }

  private val q342Sql =
    """WITH u AS (
      |  SELECT user_id,
      |    sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 100) AS BIGINT) END) AS p,
      |    sum(CASE WHEN event_type = 'view'
      |      THEN CAST(round(value * 100) AS BIGINT) END) AS v
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT CAST(p - v AS BIGINT) AS d FROM u
      |  WHERE p IS NOT NULL AND v IS NOT NULL AND p - v <> 0),
      |hist AS (
      |  SELECT abs(d) AS ad, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp
      |  FROM d GROUP BY 1),
      |ranked AS (
      |  SELECT ad, c, cp,
      |    CAST(coalesce(sum(c) OVER (ORDER BY ad
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS s
      |  FROM hist),
      |m AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(cp * (2 * s + c + 1)) AS BIGINT) AS w2,
      |    CAST(sum(c * c * c - c) AS BIGINT) AS ties
      |  FROM ranked)
      |SELECT n, w2,
      |  2 * n * (n + 1) * (2 * n + 1) - ties AS var48,
      |  CAST(CAST(
      |    CAST(w2 - (n * (n + 1)) // 2 AS DOUBLE) *
      |      sqrt(12.0 / CAST(2 * n * (n + 1) * (2 * n + 1) - ties
      |        AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS z
      |FROM m""".stripMargin

  // ==== q343: Hellinger distance + Bhattacharyya coefficient drift ==========
  //
  // The METRIC member of the drift shelf: PSI and JS (q304) are
  // divergences, KS/CvM/AD are test statistics — Hellinger is a true
  // metric on distributions (triangle inequality holds), bounded in
  // [0, 1], the right drift number to THRESHOLD and compare across
  // features. H² = 1 − BC with BC = Σ√(p·q); same 16 fixed-width bins
  // and parity split as q304. Exactness: per bin √(ca·cb/(na·nb)) is ONE
  // correctly-rounded division + ONE correctly-rounded sqrt off exact
  // integer products, ⌊10⁹·⌋-floored — the bin sum is an exact BIGINT;
  // Hellinger itself rides on one more sqrt (exact by flooring BC ≤ 1),
  // and the Bhattacharyya distance −ln(BC) is ⌊10⁶·⌋-floored off the
  // same exact rational (the q99 ln discipline).

  /** One row: (n_a, n_b, n_bins, bc_nano, hellinger, bhat_micro) between
    * the `sideA` and complement distributions of `centsCol` over 16
    * fixed bins of width `binW`. */
  def hellingerDrift(df: DataFrame, centsCol: String, sideA: Column,
      binW: Long): DataFrame = {
    val bins = df
      .select(least(expr(s"$centsCol div ${binW}L"), lit(15L))
        .cast("long").as("b"),
        when(sideA, 1L).otherwise(0L).as("a"))
      .groupBy(col("b"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val totals = broadcast(bins.agg(sum(col("ca")).as("na"),
      sum(col("cb")).as("nb")))
    def d0(c: Column) = c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    bins.crossJoin(totals)
      .select(col("na"), col("nb"),
        // empty-side guard (round 15): na·nb = 0 makes the ratio 0/0 =
        // NaN; BC over an empty side is 0 by convention (H = 1), and
        // DuckDB would raise on CAST(NaN AS DECIMAL) downstream
        when(col("na") > 0 && col("nb") > 0,
          floor(lit(1e9) * sqrt(dd(d0(col("ca")) * col("cb")) /
            dd(d0(col("na")) * col("nb")))).cast("long"))
          .otherwise(0L).as("t"))
      .groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(count(lit(1)).as("n_bins"), sum(col("t")).as("bc_nano"))
      .select(col("n_a"), col("n_b"), col("n_bins"), col("bc_nano"),
        QueryDef.dec4(sqrt(lit(1.0) - col("bc_nano").cast("double") / 1e9))
          .as("hellinger"),
        when(col("bc_nano") > 0,
          floor(lit(1e6) * -log(col("bc_nano").cast("double") / 1e9))
            .cast("long")).as("bhat_micro"))
  }

  private def q343(s: SparkSession, dir: String): DataFrame =
    hellingerDrift(
      Tables.orders(s, dir).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey")),
      "cents", col("o_orderkey") % 2 === 0, binW = 4000000L)

  private val q343Sql =
    """WITH v AS (
      |  SELECT least(CAST(round(o_totalprice * 100) AS BIGINT) // 4000000,
      |      15) AS b,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS a
      |  FROM orders),
      |bins AS (
      |  SELECT b, CAST(sum(a) AS BIGINT) AS ca,
      |    CAST(sum(1 - a) AS BIGINT) AS cb
      |  FROM v GROUP BY b),
      |tot AS (
      |  SELECT CAST(sum(ca) AS BIGINT) AS na,
      |    CAST(sum(cb) AS BIGINT) AS nb
      |  FROM bins),
      |t AS (
      |  SELECT na, nb,
      |    CASE WHEN na > 0 AND nb > 0 THEN
      |      CAST(floor(1e9 * sqrt(
      |        CAST(CAST(ca AS DECIMAL(38,0)) * cb AS DOUBLE) /
      |        CAST(CAST(na AS DECIMAL(38,0)) * nb AS DOUBLE)))
      |        AS BIGINT) ELSE 0 END AS t
      |  FROM bins, tot),
      |m AS (
      |  SELECT na AS n_a, nb AS n_b, count(*) AS n_bins,
      |    CAST(sum(t) AS BIGINT) AS bc_nano
      |  FROM t GROUP BY 1, 2)
      |SELECT n_a, n_b, n_bins, bc_nano,
      |  CAST(CAST(sqrt(1.0 - CAST(bc_nano AS DOUBLE) / 1e9)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS hellinger,
      |  CASE WHEN bc_nano > 0 THEN
      |    CAST(floor(1e6 * -ln(CAST(bc_nano AS DOUBLE) / 1e9)) AS BIGINT)
      |  END AS bhat_micro
      |FROM m""".stripMargin

  // ==== q347: partial correlation (controlling a confounder) ================
  //
  // The CONDITIONAL member of the association shelf: q194 reports raw
  // pairwise Pearson r — but "quantity correlates with price" may be
  // entirely routed through discount. Partial r_xy·z removes the linear
  // effect of the control z from both sides:
  //   r_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²)).
  // Scale shape: the SAME one-pass k(k+1)/2 integer cross moments as
  // q194 (DECIMAL(38,0) sums, map-side combined) — the partial-r algebra
  // is pure scalar render. Exactness: each raw r is the q194 double
  // chain off exact moments; the partial formula adds only correctly-
  // rounded ops (×, −, ÷, √) in one spelled order, replicated verbatim
  // in the oracle.

  /** Three rows (m_x, m_y, m_z, n, r_xy, r_xy_z): each unordered pair of
    * the three measures, partialed on the remaining one. */
  def partialCorrelation(df: DataFrame, m1: String, m2: String,
      m3: String): DataFrame = {
    val ms = Seq(m1, m2, m3).sorted
    val dec = ms.map(m => col(m).cast("decimal(18,0)").as(m))
    val d = df.select(dec: _*)
    val aggs = ms.map(m => sum(col(m)).as(s"s_$m")) ++
      (for (a <- ms; b <- ms if a <= b)
        yield sum(col(a) * col(b)).as(s"p_${a}_$b"))
    val m = d.agg(count(lit(1)).as("n"), aggs: _*)
    def dd(c: String) = col(c).cast("double")
    // n·Σa² − (Σa)² — the variance numerator; zero for a constant column,
    // which would put NaN into every r (round-15 guard: render NULL then,
    // since DuckDB raises on CAST(NaN AS DECIMAL) and the row would error
    // out of the oracle compare instead of comparing)
    def v(a: String): Column =
      dd("n") * dd(s"p_${a}_$a") - dd(s"s_$a") * dd(s"s_$a")
    def r(a: String, b: String): Column = {
      val (x, y) = if (a <= b) (a, b) else (b, a)
      (dd("n") * dd(s"p_${x}_$y") - dd(s"s_$x") * dd(s"s_$y")) /
        sqrt(v(x) * v(y))
    }
    val triples = Seq((ms(0), ms(1), ms(2)), (ms(0), ms(2), ms(1)),
      (ms(1), ms(2), ms(0)))
    triples.map { case (x, y, z) =>
      m.select(lit(x).as("m_x"), lit(y).as("m_y"), lit(z).as("m_z"),
        col("n"),
        when(v(x) > 0 && v(y) > 0,
          QueryDef.dec4(r(x, y))).as("r_xy"),
        when(v(x) > 0 && v(y) > 0 && v(z) > 0 &&
            (lit(1.0) - r(x, z) * r(x, z)) *
            (lit(1.0) - r(y, z) * r(y, z)) > 0,
          QueryDef.dec4((r(x, y) - r(x, z) * r(y, z)) /
            sqrt((lit(1.0) - r(x, z) * r(x, z)) *
              (lit(1.0) - r(y, z) * r(y, z))))).as("r_xy_z"))
    }.reduce(_.unionByName(_))
  }

  private def q347(s: SparkSession, dir: String): DataFrame =
    partialCorrelation(
      Tables.lineitem(s, dir).select(
        col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"),
        round(col("l_discount") * 100).cast("long").as("disc_c")),
      "qty", "price_c", "disc_c")
      .orderBy(col("m_x"), col("m_y"))

  private val q347Sql = {
    val ms = Seq("disc_c", "price_c", "qty")
    def v(a: String): String =
      s"""(CAST(n AS DOUBLE) * CAST(p_${a}_$a AS DOUBLE)
         |      - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))""".stripMargin
    def r(a: String, b: String): String = {
      val (x, y) = if (a <= b) (a, b) else (b, a)
      s"""((CAST(n AS DOUBLE) * CAST(p_${x}_$y AS DOUBLE)
         |      - CAST(s_$x AS DOUBLE) * CAST(s_$y AS DOUBLE)) /
         |    sqrt(${v(x)}
         |      * ${v(y)}))""".stripMargin
    }
    val triples = Seq((ms(0), ms(1), ms(2)), (ms(0), ms(2), ms(1)),
      (ms(1), ms(2), ms(0)))
    val sel = triples.map { case (x, y, z) =>
      s"""SELECT '$x' AS m_x, '$y' AS m_y, '$z' AS m_z, n,
         |  CASE WHEN ${v(x)} > 0 AND ${v(y)} > 0 THEN
         |    CAST(CAST(${r(x, y)} AS DECIMAL(38,4)) AS VARCHAR)
         |  END AS r_xy,
         |  CASE WHEN ${v(x)} > 0 AND ${v(y)} > 0 AND ${v(z)} > 0
         |    AND (1.0 - ${r(x, z)} * ${r(x, z)})
         |      * (1.0 - ${r(y, z)} * ${r(y, z)}) > 0 THEN
         |    CAST(CAST((${r(x, y)} - ${r(x, z)} * ${r(y, z)}) /
         |      sqrt((1.0 - ${r(x, z)} * ${r(x, z)})
         |        * (1.0 - ${r(y, z)} * ${r(y, z)}))
         |      AS DECIMAL(38,4)) AS VARCHAR)
         |  END AS r_xy_z
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    val moments = ms.map(m => s"sum($m) AS s_$m").mkString(", ") + ", " +
      (for (a <- ms; b <- ms if a <= b)
        yield s"sum($a * $b) AS p_${a}_$b").mkString(", ")
    s"""WITH d AS (
       |  SELECT CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,0)) AS qty,
       |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
       |      AS DECIMAL(18,0)) AS price_c,
       |    CAST(CAST(round(l_discount * 100) AS BIGINT)
       |      AS DECIMAL(18,0)) AS disc_c
       |  FROM lineitem),
       |m AS (SELECT count(*) AS n, $moments FROM d)
       |SELECT * FROM ($sel)
       |ORDER BY m_x, m_y""".stripMargin
  }

  // ==== q348: Tukey HSD pairwise post-hoc (Tukey–Kramer q statistics) =======
  //
  // What a significant ANOVA F (q281) does NOT tell you: WHICH groups
  // differ. Tukey's studentized-range post-hoc reports, per group pair,
  //   q_ab = |x̄_a − x̄_b| / √(MSW/2 · (1/n_a + 1/n_b))
  // (Tukey–Kramer form for unequal n) against one SHARED pooled error —
  // not k(k−1)/2 separate t-tests with inflated family error. Statistic,
  // not p-value (the studentized-range CDF is a special function — the
  // q197 rule). Exactness: group moments are exact decimals; MSW reuses
  // the q281 left-to-right group-ordered fold for the one order-sensitive
  // sum Σs_g²/n_g; each pair row is then ONE spelled double chain.
  // Scale shape: one map-side-combined groupBy to k group moments, a
  // k²-row broadcast self-join — group-domain arithmetic only.

  /** k(k−1)/2 rows: (g_a, g_b, n_a, n_b, mean_diff, q_stat). */
  def tukeyHsd(df: DataFrame, group: String, x: String): DataFrame = {
    val xd = col(x).cast("decimal(18,0)")
    val g = df.groupBy(col(group).as("g"))
      .agg(count(lit(1)).as("n_g"), sum(xd).as("s_g"),
        sum(xd * xd).as("ss_g"))
    def dd(c: String) = col(c).cast("double")
    val m = g
      .select(col("n_g"), col("ss_g"),
        struct(col("g"), (dd("s_g") * dd("s_g") / dd("n_g")).as("t"))
          .as("gt"))
      .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("ss_g")).cast("decimal(38,0)").as("c"),
        aggregate(sort_array(collect_list(col("gt"))), lit(0.0),
          (acc, t) => acc + t.getField("t")).as("a"))
    val ga = g.select(col("g").as("g_a"), col("n_g").as("n_a"),
      col("s_g").as("s_a"))
    val gb = g.select(col("g").as("g_b"), col("n_g").as("n_b"),
      col("s_g").as("s_b"))
    val msw = (col("c").cast("double") - col("a")) /
      (col("n") - col("k")).cast("double")
    ga.join(gb, col("g_a") < col("g_b")).crossJoin(broadcast(m))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        QueryDef.dec4(dd("s_a") / dd("n_a") - dd("s_b") / dd("n_b"))
          .as("mean_diff"),
        QueryDef.dec4(
          abs(dd("s_a") / dd("n_a") - dd("s_b") / dd("n_b")) /
            sqrt(msw / lit(2.0) *
              (lit(1.0) / dd("n_a") + lit(1.0) / dd("n_b"))))
          .as("q_stat"))
  }

  private def q348(s: SparkSession, dir: String): DataFrame =
    tukeyHsd(Tables.events(s, dir)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents")),
      "event_type", "cents")
      .orderBy(col("g_a"), col("g_b"))

  private val q348Sql =
    """WITH d AS (
      |  SELECT event_type AS grp,
      |    CAST(CAST(round(value * 100) AS BIGINT) AS DECIMAL(18,0)) AS x
      |  FROM events),
      |g AS (
      |  SELECT grp, count(*) AS n_g,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS s_g,
      |    CAST(sum(x * x) AS DECIMAL(38,0)) AS ss_g
      |  FROM d GROUP BY grp),
      |t AS (
      |  SELECT n_g, ss_g, grp,
      |    CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
      |      / CAST(n_g AS DOUBLE) AS a_t
      |  FROM g),
      |m AS (
      |  SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
      |    CAST(sum(ss_g) AS DECIMAL(38,0)) AS c,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(a_t ORDER BY grp)), (acc, x) -> acc + x) AS a
      |  FROM t)
      |SELECT ga.grp AS g_a, gb.grp AS g_b, ga.n_g AS n_a, gb.n_g AS n_b,
      |  CAST(CAST(CAST(ga.s_g AS DOUBLE) / CAST(ga.n_g AS DOUBLE)
      |    - CAST(gb.s_g AS DOUBLE) / CAST(gb.n_g AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS mean_diff,
      |  CAST(CAST(
      |    abs(CAST(ga.s_g AS DOUBLE) / CAST(ga.n_g AS DOUBLE)
      |      - CAST(gb.s_g AS DOUBLE) / CAST(gb.n_g AS DOUBLE)) /
      |    sqrt((CAST(c AS DOUBLE) - a) / CAST(n - k AS DOUBLE) / 2.0 *
      |      (1.0 / CAST(ga.n_g AS DOUBLE) + 1.0 / CAST(gb.n_g AS DOUBLE)))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS q_stat
      |FROM g ga JOIN g gb ON ga.grp < gb.grp CROSS JOIN m
      |ORDER BY g_a, g_b""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q342_wilcoxon_signed_rank", q342, Some(q342Sql)),
    QueryDef("q343_hellinger_drift", q343, Some(q343Sql)),
    QueryDef("q347_partial_correlation", q347, Some(q347Sql)),
    QueryDef("q348_tukey_hsd", q348, Some(q348Sql)),
    QueryDef("q319_welch_anova", q319, Some(q319Sql)),
    QueryDef("q318_krippendorff_alpha", q318, Some(q318Sql)),
    QueryDef("q316_gwet_ac1", q316, Some(q316Sql)),
    QueryDef("q304_js_divergence", q304, Some(q304Sql)),
    QueryDef("q300_kendall_w", q300, Some(q300Sql)),
    QueryDef("q299_fleiss_kappa", q299, Some(q299Sql)),
    QueryDef("q298_icc1", q298, Some(q298Sql)),
    QueryDef("q297_cronbach_alpha", q297, Some(q297Sql)),
    QueryDef("q293_friedman", q293, Some(q293Sql)),
    QueryDef("q292_pettitt", q292, Some(q292Sql)),
    QueryDef("q291_runs_test", q291, Some(q291Sql)),
    QueryDef("q287_jonckheere", q287, Some(q287Sql)),
    QueryDef("q286_cochran_q", q286, Some(q286Sql)),
    QueryDef("q285_energy_distance", q285, Some(q285Sql)),
    QueryDef("q284_cramer_von_mises", q284, Some(q284Sql)),
    QueryDef("q329_anderson_darling", q329, Some(q329Sql)),
    QueryDef("q336_ansari_bradley", q336, Some(q336Sql)),
    QueryDef("q330_jarque_bera", q330, Some(q330Sql)),
    QueryDef("q332_grid_kde", q332, Some(q332Sql)),
    QueryDef("q333_grubbs", q333, Some(q333Sql)),
    QueryDef("q281_anova_f", q281, Some(q281Sql)),
    QueryDef("q280_levene", q280, Some(q280Sql)),
    QueryDef("q279_mann_kendall", q279, Some(q279Sql)),
    QueryDef("q275_t_closeness", q275, Some(q275Sql)),
    QueryDef("q273_cliffs_delta", q273, Some(q273Sql)),
    QueryDef("q272_cohens_d", q272, Some(q272Sql)),
    QueryDef("q271_mcnemar", q271, Some(q271Sql)),
    QueryDef("q256_wasserstein_drift", q256, Some(q256Sql)),
    QueryDef("q253_kruskal_wallis", q253, Some(q253Sql)),
    QueryDef("q243_kendall_tau", q243, Some(q243Sql)),
    QueryDef("q234_spearman", q234, Some(q234Sql)),
    QueryDef("q230_stratified_att", q230, Some(q230Sql)),
    QueryDef("q218_fd_audit", q218, Some(q218Sql)),
    QueryDef("q219_hbos_outliers", q219, Some(q219Sql)),
    QueryDef("q202_privacy_audit", q202, Some(q202Sql)),
    QueryDef("q213_chi_square", q213, Some(q213Sql)),
    QueryDef("q216_mann_whitney", q216, Some(q216Sql)),
    QueryDef("q197_welch_ttest", q197, Some(q197Sql)),
    QueryDef("q194_correlation_matrix", q194, Some(q194Sql)),
    QueryDef("q195_mutual_information", q195, Some(q195Sql)),
    QueryDef("q190_theil_sen", q190, Some(q190Sql)),
    QueryDef("q364_huber_trend", q364, Some(q364Sql)),
    QueryDef("q180_fk_audit", q180, Some(q180Sql)),
    QueryDef("q177_skew_report", q177, Some(q177Sql)),
    QueryDef("q168_label_index", q168, Some(q168Sql)),
    QueryDef("q163_higher_moments", q163, Some(q163Sql)),
    QueryDef("q160_benford", q160, Some(q160Sql)),
    QueryDef("q161_total_variation", q161, Some(q161Sql)),
    QueryDef("q158_weighted_median", q158, Some(q158Sql)),
    QueryDef("q144_grouped_ols", q144, Some(q144Sql)),
    QueryDef("q68_orc_roundtrip", q68, Some(q68Sql)),
    QueryDef("q69_profile", q69, Some(q69Sql)),
    QueryDef("q113_equidepth_histogram", q113, Some(q113Sql)),
    QueryDef("q117_quality_report", q117, Some(q117Sql)),
    QueryDef("q118_outliers_mad", q118, Some(q118Sql)),
    QueryDef("q122_rank_normalize", q122, Some(q122Sql)),
    QueryDef("q130_winsorize", q130, Some(q130Sql)),
    QueryDef("q131_ks_drift", q131, Some(q131Sql)))
}
