package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDef._

/** Tier B relational operator library (SURVEY.md §2 B1–B28).
  *
  * Each entry is a Spark-first DataFrame program — scans stay prunable,
  * filters push down to parquet, small dimension tables are broadcast —
  * paired with a DuckDB oracle in the engine's determinism discipline.
  */
object Relational {

  // -- B1: parquet scan ------------------------------------------------------
  private def q01(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), dec4(col("l_quantity")).as("quantity"),
        dec4(col("l_extendedprice")).as("extendedprice"),
        dec4(col("l_discount")).as("discount"), dec4(col("l_tax")).as("tax"),
        col("l_returnflag"), col("l_linestatus"),
        tsDay(col("l_shipdate")).as("shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .limit(100)

  private val q01Sql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  CAST(CAST(l_quantity AS DECIMAL(38,4)) AS VARCHAR) AS quantity,
      |  CAST(CAST(l_extendedprice AS DECIMAL(38,4)) AS VARCHAR) AS extendedprice,
      |  CAST(CAST(l_discount AS DECIMAL(38,4)) AS VARCHAR) AS discount,
      |  CAST(CAST(l_tax AS DECIMAL(38,4)) AS VARCHAR) AS tax,
      |  l_returnflag, l_linestatus,
      |  strftime(l_shipdate, '%Y-%m-%d') AS shipdate
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 100""".stripMargin

  // -- B3: projection / arithmetic ------------------------------------------
  // Doubles differ by 1 ulp across engines on 3-factor products (FMA), and
  // Spark (HALF_UP) vs DuckDB (truncate) disagree on decimal re-scaling — so
  // the money arithmetic is done in EXACT decimal: inputs are 2-dp values,
  // every intermediate scale is wide enough that no rounding ever happens.
  private def q02(s: SparkSession, dir: String): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(15,4)")
    val disc = col("l_discount").cast("decimal(15,4)")
    val tax = col("l_tax").cast("decimal(15,4)")
    val net = (price * (lit(1) - disc)).cast("decimal(18,6)") // exact: <=4 dp
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        net.cast("string").as("net_price"),
        (net * (lit(1) + tax)).cast("decimal(38,6)").cast("string").as("charge"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
  }

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, CAST(net AS VARCHAR) AS net_price,
      |  CAST(CAST(net * (1 + CAST(l_tax AS DECIMAL(15,4))) AS DECIMAL(38,6)) AS VARCHAR) AS charge
      |FROM (SELECT *, CAST(CAST(l_extendedprice AS DECIMAL(15,4))
      |    * (1 - CAST(l_discount AS DECIMAL(15,4))) AS DECIMAL(18,6)) AS net
      |  FROM lineitem)
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  // -- B4: multi-predicate filter (pushed to the parquet scan) ---------------
  private def q03(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 30 &&
        col("l_returnflag").isin("R", "A") &&
        col("l_linestatus") =!= "X" &&
        col("l_partkey").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"),
        dec4(col("l_quantity")).as("quantity"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))

  private val q03Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_quantity AS DECIMAL(38,4)) AS VARCHAR) AS quantity, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 30
      |  AND l_returnflag IN ('R','A') AND l_linestatus <> 'X' AND l_partkey IS NOT NULL
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  // -- B5: inner equi-join, broadcast dims -----------------------------------
  // customer and nation are orders-of-magnitude smaller than orders: broadcast
  // both so the join is shuffle-free at any scale where dims fit in memory.
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(o("o_orderkey"), c("c_name"), n("n_name"),
        dec4(o("o_totalprice")).as("totalprice"))
      .orderBy(col("o_orderkey"))
      .limit(500)
  }

  private val q04Sql =
    """SELECT o_orderkey, c_name, n_name,
      |  CAST(CAST(o_totalprice AS DECIMAL(38,4)) AS VARCHAR) AS totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY o_orderkey LIMIT 500""".stripMargin

  // -- B6: left outer join + aggregation over the null side ------------------
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("order_cnt"),
        dec4(coalesce(sum(o("o_totalprice")), lit(0))).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  private val q05Sql =
    """SELECT c_custkey, count(o_orderkey) AS order_cnt,
      |  CAST(CAST(coalesce(sum(o_totalprice), 0) AS DECIMAL(38,4)) AS VARCHAR) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  // -- B7: semi join ---------------------------------------------------------
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val q06Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // -- B7: anti join ---------------------------------------------------------
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val q07Sql =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // -- B8: theta / band join (equi on size + range on price) -----------------
  // NOT executed as a row×row self-join: p_size has ~50 distinct values, so
  // the naive plan shuffles the full quadratic pair space through ≤50 tasks —
  // a scale-killer at 100 TB. Instead each side collapses to its bounded
  // domain first (size, brand, price) → cnt (map-side combinable, linear),
  // then to one sorted (price, cnt) distribution per (size, brand) — at most
  // |sizes|·|brands| rows regardless of input scale. The tiny compressed
  // sides meet in a broadcast join and a two-pointer merge kernel
  // (CrossPairCount) counts price_a < price_b pairs exactly.
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val dist = Tables.part(s, dir)
      .groupBy(col("p_size"), col("p_brand"), col("p_retailprice"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("p_size"), col("p_brand"))
      .agg(array_sort(collect_list(struct(
        col("p_retailprice").as("price"), col("cnt")))).as("pc"))
    val a = dist.select(col("p_size"), col("p_brand").as("brand_a"), col("pc").as("pc_a"))
    val b = dist.select(col("p_size").as("size_b"), col("p_brand").as("brand_b"),
      col("pc").as("pc_b"))
    a.join(broadcast(b), col("p_size") === col("size_b"))
      .select(col("brand_a"), col("brand_b"),
        graft.functions.PairCountExpr.crossPairCount(col("pc_a"), col("pc_b")).as("pairs"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(sum(col("pairs")).as("pair_cnt"))
      .filter(col("pair_cnt") > 0)
      .orderBy(col("brand_a"), col("brand_b"))
  }

  private val q08Sql =
    """SELECT p1.p_brand AS brand_a, p2.p_brand AS brand_b, count(*) AS pair_cnt
      |FROM part p1 JOIN part p2
      |  ON p1.p_size = p2.p_size AND p1.p_retailprice < p2.p_retailprice
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- B9: as-of join — for each click, the latest prior view of that user ---
  // Composition pattern: range join + row_number dedup. At scale, the range
  // condition joins on user_id first (equi) so only per-user pairs shuffle.
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    Joins.asofBackward(clicks, views, byKeys = Seq("user_id"),
      leftTime = "ts", rightTime = "v_ts", tieBreak = "view_id", strict = true)
      .select(col("event_id"), col("user_id"), tsMicro(col("ts")).as("click_ts"),
        col("view_id"), tsMicro(col("v_ts")).as("view_ts"))
      .orderBy(col("event_id"))
  }

  // oracle: merge-window formulation — clicks and views interleave in one
  // per-user (ts, kind, event_id) order and the carried last-view IS the
  // as-of match. The original inequality self-join is quadratic in the
  // hottest user's history (the 30%-hot-user skew set made it infeasible
  // in DuckDB, round 14); this is the same relation computed O(n log n).
  // Order key semantics: views at ts equal to the click sort AFTER it
  // (strict v.ts < c.ts), ties among equal-ts views resolve to the
  // largest event_id (the old rn = 1 tie-break).
  private val q09Sql =
    """WITH ce AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS k
      |  FROM events WHERE event_type IN ('click', 'view')),
      |w AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'view' THEN event_id END
      |      IGNORE NULLS) OVER (PARTITION BY user_id
      |        ORDER BY ts, k, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS view_id,
      |    last_value(CASE WHEN event_type = 'view' THEN ts END
      |      IGNORE NULLS) OVER (PARTITION BY user_id
      |        ORDER BY ts, k, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS v_ts
      |  FROM ce)
      |SELECT event_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts, view_id,
      |  strftime(v_ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts
      |FROM w WHERE event_type = 'click' ORDER BY event_id""".stripMargin

  // -- B9 forward: next click after each view, within a 30-minute tolerance --
  private def q56(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    Joins.asofForward(views, clicks, byKeys = Seq("user_id"),
      leftTime = "ts", rightTime = "c_ts", tieBreak = "click_id",
      strict = true, toleranceSec = Some(1800L))
      .select(col("event_id"), col("user_id"), tsMicro(col("ts")).as("view_ts"),
        col("click_id"), tsMicro(col("c_ts")).as("click_ts"))
      .orderBy(col("event_id"))
  }

  // oracle: the q09 merge-window formulation run in REVERSE time order —
  // the carried last-click is the nearest strictly-later click, and the
  // 30-minute horizon applies afterward (the nearest click beyond the
  // horizon means no click within it). Same O(n log n) skew rationale as
  // q09; clicks at ts equal to the view sort after it (strict >), ties
  // among equal-ts clicks resolve to the smallest event_id.
  private val q56Sql =
    """WITH ce AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS k
      |  FROM events WHERE event_type IN ('click', 'view')),
      |w AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END
      |      IGNORE NULLS) OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, k, event_id DESC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS click_id0,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END
      |      IGNORE NULLS) OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, k, event_id DESC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS c_ts0
      |  FROM ce)
      |SELECT event_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
      |  CASE WHEN c_ts0 <= ts + INTERVAL 1800 SECOND THEN click_id0 END
      |    AS click_id,
      |  CASE WHEN c_ts0 <= ts + INTERVAL 1800 SECOND
      |    THEN strftime(c_ts0, '%Y-%m-%d %H:%M:%S.%f') END AS click_ts
      |FROM w WHERE event_type = 'view' ORDER BY event_id""".stripMargin

  // -- B10: grouped hash aggregation (TPC-H Q1 shape) ------------------------
  // Partial (map-side) aggregation is automatic for sum/count/avg; only the
  // tiny per-group partials shuffle — this is the 100 TB-safe agg shape.
  private def q10(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dec4(sum(col("l_quantity"))).as("sum_qty"),
        // money sums in EXACT decimal: double accumulation order differs
        // between engines and its noise crosses the 4-decimal render once
        // groups reach ~1M rows (seen at the sf1 stress run). The 2-dp
        // money columns are exact in decimal(18,2), so the sums stay
        // bit-identical at any scale.
        dec4(sum(col("l_extendedprice").cast("decimal(18,2)"))).as("sum_base_price"),
        dec4(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)")))).as("sum_disc_price"),
        dec4(avg(col("l_quantity"))).as("avg_qty"),
        dec4(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q10Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(sum(l_quantity) AS DECIMAL(38,4)) AS VARCHAR) AS sum_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_base_price,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
      |  CAST(CAST(avg(l_quantity) AS DECIMAL(38,4)) AS VARCHAR) AS avg_qty,
      |  CAST(CAST(avg(l_discount) AS DECIMAL(38,4)) AS VARCHAR) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -- B11: exact distinct / count distinct ----------------------------------
  private def q11(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey"), col("l_partkey")).as("n_supp_part"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  private val q11Sql =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -- B12: rollup + grouping_id ---------------------------------------------
  // Group keys are coalesced to 'ALL' so null-ordering differences between
  // engines can't bite; gid disambiguates real nulls from rollup nulls.
  private def q12(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), dec4(sum(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("gid"), col("sum_qty"), col("n"))
      .orderBy(col("gid"), col("returnflag"), col("linestatus"))

  private val q12Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  GROUPING(l_returnflag, l_linestatus) AS gid,
      |  CAST(CAST(sum(l_quantity) AS DECIMAL(38,4)) AS VARCHAR) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, returnflag, linestatus""".stripMargin

  // -- B12: cube (the full grouping-sets lattice) ----------------------------
  private def q42(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        // decimal money sum — see q10; the ALL cube cell sums every order
        dec4(sum(col("o_totalprice").cast("decimal(18,2)"))).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"), col("total"))
      .orderBy(col("gid"), col("status"), col("priority"))

  private val q42Sql =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid, count(*) AS n,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS VARCHAR) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, status, priority""".stripMargin

  // -- B13: window ranking — top-3 orders per customer -----------------------
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        dec4(col("o_totalprice")).as("totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q13Sql =
    """SELECT o_custkey, rn, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(38,4)) AS VARCHAR) AS totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // -- B14: window analytic — running revenue + lag/lead ---------------------
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), tsDay(col("o_orderdate")).as("orderdate"),
        dec4(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .as("running_total"),
        dec4(lag(col("o_totalprice"), 1).over(w)).as("prev_price"),
        dec4(lead(col("o_totalprice"), 1).over(w)).as("next_price"),
        dec4(first(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .as("first_price"))
      .orderBy(col("o_custkey"), col("orderdate"), col("o_orderkey"))
  }

  private val q14Sql =
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  CAST(CAST(sum(o_totalprice) OVER w_run AS DECIMAL(38,4)) AS VARCHAR) AS running_total,
      |  CAST(CAST(lag(o_totalprice, 1) OVER w AS DECIMAL(38,4)) AS VARCHAR) AS prev_price,
      |  CAST(CAST(lead(o_totalprice, 1) OVER w AS DECIMAL(38,4)) AS VARCHAR) AS next_price,
      |  CAST(CAST(first_value(o_totalprice) OVER w_run AS DECIMAL(38,4)) AS VARCHAR) AS first_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, orderdate, o_orderkey""".stripMargin

  // -- B15: window frames — 3-row moving average over events -----------------
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        dec4(avg(col("value")).over(w.rowsBetween(-2, 0))).as("moving_avg"),
        dec4(sum(col("value")).over(w.rowsBetween(-2, 0))).as("moving_sum"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val q15Sql =
    """SELECT user_id, event_id,
      |  CAST(CAST(avg(value) OVER w AS DECIMAL(38,4)) AS VARCHAR) AS moving_avg,
      |  CAST(CAST(sum(value) OVER w AS DECIMAL(38,4)) AS VARCHAR) AS moving_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // -- B16: multi-key sort with explicit null ordering -----------------------
  private def q16(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"), nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
        dec4(col("c_acctbal")).as("acctbal"))
      .orderBy(col("seg").asc_nulls_first, col("acctbal").desc, col("c_custkey"))

  private val q16Sql =
    """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg,
      |  CAST(CAST(c_acctbal AS DECIMAL(38,4)) AS VARCHAR) AS acctbal
      |FROM customer
      |ORDER BY seg ASC NULLS FIRST, acctbal DESC, c_custkey""".stripMargin

  // -- B17: top-k ------------------------------------------------------------
  private def q17(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
      .select(col("o_orderkey"), dec4(col("o_totalprice")).as("totalprice"))

  private val q17Sql =
    """SELECT o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(38,4)) AS VARCHAR) AS totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  // -- B18: set operations ---------------------------------------------------
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val custNations = Tables.customer(s, dir).select(col("c_nationkey").as("k")).distinct()
    val suppNations = Tables.supplier(s, dir).select(col("s_nationkey").as("k")).distinct()
    val both = custNations.intersect(suppNations).withColumn("tag", lit("both"))
    val custOnly = custNations.except(suppNations).withColumn("tag", lit("cust_only"))
    both.unionByName(custOnly)
      .select(col("tag"), col("k"))
      .orderBy(col("tag"), col("k"))
  }

  private val q18Sql =
    """SELECT 'both' AS tag, k FROM (
      |  SELECT DISTINCT c_nationkey AS k FROM customer
      |  INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'cust_only' AS tag, k FROM (
      |  SELECT DISTINCT c_nationkey AS k FROM customer
      |  EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
      |ORDER BY tag, k""".stripMargin

  // -- B19: string functions -------------------------------------------------
  private def q19(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 12)).as("up12"),
        lower(col("p_brand")).as("lo_brand"),
        length(col("p_name")).as("name_len"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("first_word"),
        trim(col("p_name")).as("trimmed"),
        instr(col("p_type"), "a").as("a_pos"),
        size(split(col("p_type"), " ")).as("type_words"))
      .orderBy(col("p_partkey"))

  private val q19Sql =
    """SELECT p_partkey, upper(substr(p_name, 1, 12)) AS up12,
      |  lower(p_brand) AS lo_brand, length(p_name) AS name_len,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  regexp_extract(p_type, '^(\w+)', 1) AS first_word,
      |  trim(p_name) AS trimmed,
      |  CAST(instr(p_type, 'a') AS INTEGER) AS a_pos,
      |  CAST(len(string_split(p_type, ' ')) AS INTEGER) AS type_words
      |FROM part ORDER BY p_partkey""".stripMargin

  // -- B20: date/time functions ----------------------------------------------
  private def q20(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        tsDay(date_trunc("month", col("o_orderdate"))).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
        tsDay(add_months(col("o_orderdate"), 3)).as("plus3mo"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  private val q20Sql =
    """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |  day(o_orderdate) AS dom,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
      |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // -- B21: math functions ---------------------------------------------------
  // Round 16 (guide §2.3 "shuffle fewer bytes"): the decimal-string
  // renders used to be computed BELOW the final range exchange, so the
  // sort shuffled seven ~10-byte strings per row instead of the three
  // raw doubles they derive from (plans/r15/q21_math_before.txt: the
  // 12-column Project sits under the Exchange). Sorting the narrow raw
  // columns and rendering after the sort moves the same per-row work
  // past the shuffle and roughly halves the exchanged bytes; output rows
  // and order are unchanged.
  private def q21(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        dec4(round(col("l_extendedprice"), 2)).as("rounded"),
        floor(col("l_quantity")).as("floored"),
        ceil(col("l_discount") * 100).as("disc_pct_ceil"),
        dec4(abs(col("l_quantity") - 25)).as("abs_dev"),
        dec4(pow(col("l_quantity"), 2)).as("qty_sq"),
        dec4(log(col("l_extendedprice") + 1)).as("ln_price"),
        dec4(sqrt(col("l_quantity"))).as("sqrt_qty"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"))

  private val q21Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(round(l_extendedprice, 2) AS DECIMAL(38,4)) AS VARCHAR) AS rounded,
      |  CAST(floor(l_quantity) AS BIGINT) AS floored,
      |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
      |  CAST(CAST(abs(l_quantity - 25) AS DECIMAL(38,4)) AS VARCHAR) AS abs_dev,
      |  CAST(CAST(pow(l_quantity, 2) AS DECIMAL(38,4)) AS VARCHAR) AS qty_sq,
      |  CAST(CAST(ln(l_extendedprice + 1) AS DECIMAL(38,4)) AS VARCHAR) AS ln_price,
      |  CAST(CAST(sqrt(l_quantity) AS DECIMAL(38,4)) AS VARCHAR) AS sqrt_qty,
      |  ((l_orderkey % 7) + 7) % 7 AS key_mod7
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  // -- B22: array / higher-order functions over embeddings -------------------
  private def q22(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        dec4(element_at(col("embedding"), 1).cast("double")).as("first_val"),
        dec4(aggregate(transform(col("embedding"), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("vec_sum"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"),
        dec4(aggregate(transform(slice(col("embedding"), 1, 8), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x * x)).as("head8_sq"),
        dec4(element_at(sort_array(transform(slice(col("embedding"), 1, 8),
          x => x.cast("double"))), 1)).as("head8_min"))
      .orderBy(col("vec_id"))

  private val q22Sql =
    """SELECT vec_id, len(embedding) AS dim,
      |  CAST(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR) AS first_val,
      |  CAST(CAST(list_sum(CAST(embedding AS DOUBLE[])) AS DECIMAL(38,4)) AS VARCHAR) AS vec_sum,
      |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
      |  CAST(CAST(list_sum(list_transform(CAST(embedding[1:8] AS DOUBLE[]), x -> x * x)) AS DECIMAL(38,4)) AS VARCHAR) AS head8_sq,
      |  CAST(CAST(list_sort(CAST(embedding[1:8] AS DOUBLE[]))[1] AS DECIMAL(38,4)) AS VARCHAR) AS head8_min
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // -- B23: map functions ----------------------------------------------------
  private def q23(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        map_from_arrays(
          array(lit("seg"), lit("nation")),
          array(col("c_mktsegment"), col("c_nationkey").cast("string"))).as("m"))
      .select(col("c_custkey"),
        element_at(col("m"), "seg").as("seg"),
        element_at(col("m"), "nation").as("nation"),
        size(col("m")).as("m_size"),
        array_join(map_keys(col("m")), ",").as("keys_joined"),
        array_join(map_values(col("m")), ",").as("vals_joined"),
        map_contains_key(col("m"), "seg").as("has_seg"),
        map_contains_key(col("m"), "zip").as("has_zip"))
      .orderBy(col("c_custkey"))

  private val q23Sql =
    """SELECT c_custkey, m['seg'][1] AS seg, m['nation'][1] AS nation,
      |  cardinality(m) AS m_size,
      |  array_to_string(map_keys(m), ',') AS keys_joined,
      |  array_to_string(map_values(m), ',') AS vals_joined,
      |  list_contains(map_keys(m), 'seg') AS has_seg,
      |  list_contains(map_keys(m), 'zip') AS has_zip
      |FROM (SELECT c_custkey,
      |    map(['seg','nation'], [c_mktsegment, CAST(c_nationkey AS VARCHAR)]) AS m
      |  FROM customer) ORDER BY c_custkey""".stripMargin

  // -- B24: JSON functions over events.props ---------------------------------
  private def q24(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_typed"),
        to_json(struct(col("event_id").as("id"), col("event_type").as("t"))).as("packed"),
        json_tuple(col("props"), "k", "missing").as(Seq("jt_k", "jt_missing")),
        // schema inference pinned as a constant: the oracle asserts the
        // engine-rendered schema string for this literal document
        schema_of_json(lit("""{"k": 1, "tags": ["a"]}""")).as("inferred_schema"))
      .orderBy(col("event_id"))

  private val q24Sql =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
      |  '{"id":' || CAST(event_id AS VARCHAR) || ',"t":"' || event_type || '"}' AS packed,
      |  json_extract_string(props, '$.k') AS jt_k,
      |  json_extract_string(props, '$.missing') AS jt_missing,
      |  'STRUCT<k: BIGINT, tags: ARRAY<STRING>>' AS inferred_schema
      |FROM events ORDER BY event_id""".stripMargin

  // -- B25: conditional / null handling --------------------------------------
  private def q25(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_class"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("seg_or_other"),
        dec4(least(col("c_acctbal"), lit(1000.0))).as("capped"),
        dec4(greatest(col("c_acctbal"), lit(0.0))).as("floored_bal"))
      .orderBy(col("c_custkey"))

  private val q25Sql =
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid'
      |    ELSE 'high' END AS bal_class,
      |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
      |  CAST(CAST(least(c_acctbal, 1000.0) AS DECIMAL(38,4)) AS VARCHAR) AS capped,
      |  CAST(CAST(greatest(c_acctbal, 0.0) AS DECIMAL(38,4)) AS VARCHAR) AS floored_bal
      |FROM customer ORDER BY c_custkey""".stripMargin

  // -- B26: hash / identity functions (A16 identity derivation in SQL) -------
  private def q26(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        sha2(concat_ws("|", col("c_name"), lit("json")), 256).as("file_id"),
        md5(col("c_name")).as("name_md5"))
      .withColumn("ingestion_id", sha2(concat_ws("|", col("file_id"), lit("resume")), 256))
      .withColumn("chunk_id", concat_ws(":", col("ingestion_id"), lit(0)))
      .orderBy(col("c_custkey"))

  private val q26Sql =
    """SELECT c_custkey, sha256(c_name || '|' || 'json') AS file_id,
      |  md5(c_name) AS name_md5,
      |  sha256(sha256(c_name || '|' || 'json') || '|' || 'resume') AS ingestion_id,
      |  sha256(sha256(c_name || '|' || 'json') || '|' || 'resume') || ':' || '0' AS chunk_id
      |FROM customer ORDER BY c_custkey""".stripMargin

  // -- B11 approx: HLL count distinct. The sketch value itself is
  // engine-specific, so the DRIVER-gated check embeds the bounded-error
  // assertion in the result: exact distinct counts (hash-compared against
  // DuckDB) plus ok_* booleans proving the HLL estimate landed within the
  // declared ±5% — the oracle expects `true` unconditionally ---------------
  // exact and approx run as SEPARATE aggregates joined on the 5-row key
  // domain: mixing countDistinct with approx_count_distinct in one agg
  // makes the ~3k-register HLL buffers ride the distinct-rewrite Expand —
  // per-(key, orderkey, partkey, gid) HLL state, ~68 s at sf0.1 under the
  // honest rdd action (measured round 11) vs ~2 s split. Split, the HLL
  // partials combine map-side with fixed-size state — the 100 TB shape.
  private def hllDistinct(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"))
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("a_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("a_parts"))
    exact.join(approx, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_orders"), col("n_parts"),
        (abs(col("a_orders") - col("n_orders")) <= col("n_orders") * 0.05).as("ok_orders"),
        (abs(col("a_parts") - col("n_parts")) <= col("n_parts") * 0.05).as("ok_parts"))
      .orderBy(col("l_returnflag"))
  }

  private val hllDistinctSql =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  true AS ok_orders, true AS ok_parts
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // -- approx quantile sketch, driver-gated like the HLL entry ---------------
  // percentile_approx is Spark's mergeable KLL-style sketch (map-side
  // partials — the 100 TB path for quantiles, where exact percentile needs
  // a full sort). Gate: the sketch guarantees RANK error ≤ 1/accuracy, so
  // the approx p-quantile must land between the exact (p−0.05) and
  // (p+0.05) quantiles — a 10× margin over the configured 0.5% rank error.
  // exact bounds come from the (flag × distinct cents) histogram + rank
  // selection (the q179 idiom) instead of `percentile`, whose
  // ObjectHashAggregate collects every raw value per group — measured
  // 6.1 s → ~1 s at sf0.1 under the rdd action. The gate bands are exact
  // order statistics at ±0.05 rank — a 10× cushion over the sketch's
  // configured 0.5% rank error, same contract as before.
  private def approxQuantilesGate(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"),
      col("l_extendedprice"))
    val approx = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        expr("percentile_approx(l_extendedprice, 0.5, 200)").as("a50"),
        expr("percentile_approx(l_extendedprice, 0.9, 200)").as("a90"))
    val hist = li.groupBy(col("l_returnflag"), col("cents"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("cents"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
      .join(hist.groupBy(col("l_returnflag")).agg(sum(col("c")).as("n")),
        Seq("l_returnflag"))
    def bound(p100: Int, name: String) =
      min(when(col("cum") >= expr(s"(${p100}L * n + 99) div 100"),
        col("cents"))).as(name)
    val bounds = cum.groupBy(col("l_returnflag"))
      .agg(bound(45, "lo50"), bound(55, "hi50"),
        bound(85, "lo90"), bound(95, "hi90"))
    approx.join(bounds, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_rows"),
        (round(col("a50") * 100).cast("long") >= col("lo50") &&
          round(col("a50") * 100).cast("long") <= col("hi50")).as("ok_p50"),
        (round(col("a90") * 100).cast("long") >= col("lo90") &&
          round(col("a90") * 100).cast("long") <= col("hi90")).as("ok_p90"))
      .orderBy(col("l_returnflag"))
  }

  private val approxQuantilesSql =
    """SELECT l_returnflag, count(*) AS n_rows, true AS ok_p50, true AS ok_p90
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // -- pivot: orderstatus × orderpriority counts -----------------------------
  private def q43(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("1-URGENT" -> "p1", "2-HIGH" -> "p2",
        "3-MEDIUM" -> "p3", "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))
      .orderBy(col("o_orderstatus"))

  private val q43Sql =
    """SELECT o_orderstatus,
      |  count(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
      |  count(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
      |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
      |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
      |  count(*) FILTER (o_orderpriority = '5-LOW') AS p5
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -- exact percentiles (order-insensitive → cross-engine deterministic) ----
  private def q44(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(dec4(expr("percentile(l_quantity, 0.5)")).as("median_qty"),
        dec4(expr("percentile(l_quantity, 0.9)")).as("p90_qty"),
        dec4(min(col("l_quantity"))).as("min_qty"),
        dec4(max(col("l_quantity"))).as("max_qty"))
      .orderBy(col("l_returnflag"))

  private val q44Sql =
    """SELECT l_returnflag,
      |  CAST(CAST(quantile_cont(l_quantity, 0.5) AS DECIMAL(38,4)) AS VARCHAR) AS median_qty,
      |  CAST(CAST(quantile_cont(l_quantity, 0.9) AS DECIMAL(38,4)) AS VARCHAR) AS p90_qty,
      |  CAST(CAST(min(l_quantity) AS DECIMAL(38,4)) AS VARCHAR) AS min_qty,
      |  CAST(CAST(max(l_quantity) AS DECIMAL(38,4)) AS VARCHAR) AS max_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -- moment statistics ------------------------------------------------------
  private def q45(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(dec4(stddev_samp(col("l_quantity"))).as("sd_qty"),
        dec4(var_samp(col("l_quantity"))).as("var_qty"),
        dec4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
        dec4(covar_samp(col("l_quantity"), col("l_discount"))).as("cov_qty_disc"))
      .orderBy(col("l_returnflag"))

  private val q45Sql =
    """SELECT l_returnflag,
      |  CAST(CAST(stddev_samp(l_quantity) AS DECIMAL(38,4)) AS VARCHAR) AS sd_qty,
      |  CAST(CAST(var_samp(l_quantity) AS DECIMAL(38,4)) AS VARCHAR) AS var_qty,
      |  CAST(CAST(corr(l_quantity, l_extendedprice) AS DECIMAL(38,4)) AS VARCHAR) AS corr_qty_price,
      |  CAST(CAST(covar_samp(l_quantity, l_discount) AS DECIMAL(38,4)) AS VARCHAR) AS cov_qty_disc
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -- ordered string aggregation --------------------------------------------
  private def q46(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .groupBy(col("n_regionkey"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), "|").as("nations"),
        count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))

  private val q46Sql =
    """SELECT n_regionkey, string_agg(n_name, '|' ORDER BY n_name) AS nations,
      |  count(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  // -- B38 generators: posexplode over array slices --------------------------
  private def q47(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)))
      .select(col("vec_id"), col("pos"),
        dec4(col("col").cast("double")).as("val"))
      .orderBy(col("vec_id"), col("pos"))

  private val q47Sql =
    """SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
      |  CAST(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR) AS val
      |FROM embeddings CROSS JOIN generate_series(1, 4) AS t(i)
      |WHERE i <= len(embedding)
      |ORDER BY vec_id, pos""".stripMargin

  // -- B13/B14 distribution window functions ---------------------------------
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("quartile"),
        dec4(percent_rank().over(w)).as("pct_rank"),
        dec4(cume_dist().over(w)).as("cume"))
      .orderBy(col("c_custkey"))
  }

  private val q48Sql =
    """SELECT c_custkey, c_mktsegment,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  CAST(CAST(percent_rank() OVER w AS DECIMAL(38,4)) AS VARCHAR) AS pct_rank,
      |  CAST(CAST(cume_dist() OVER w AS DECIMAL(38,4)) AS VARCHAR) AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // -- correlated scalar subquery (SQL surface; Catalyst decorrelates to an
  // aggregate + outer join — no per-row re-execution) ------------------------
  private def q49(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer_q49")
    Tables.orders(s, dir).createOrReplaceTempView("orders_q49")
    s.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders_q49 WHERE o_custkey = c_custkey) AS n_orders,
        |  (SELECT CAST(CAST(max(o_totalprice) AS DECIMAL(38,4)) AS STRING)
        |     FROM orders_q49 WHERE o_custkey = c_custkey) AS max_price
        |FROM customer_q49 ORDER BY c_custkey""".stripMargin)
  }

  private val q49Sql =
    """SELECT c_custkey,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
      |  (SELECT CAST(CAST(max(o_totalprice) AS DECIMAL(38,4)) AS VARCHAR)
      |     FROM orders WHERE o_custkey = c_custkey) AS max_price
      |FROM customer ORDER BY c_custkey""".stripMargin

  // -- B19 family: regular expressions ---------------------------------------
  private def q50(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "(\\w+) (\\w+)", 2).as("second_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_name").rlike("red|blue").as("has_color"),
        regexp_count(col("p_name"), lit("[aeiou]")).as("n_vowels"))
      .orderBy(col("p_partkey"))

  private val q50Sql =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '(\w+) (\w+)', 2) AS second_word,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  regexp_matches(p_name, 'red|blue') AS has_color,
      |  len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels
      |FROM part ORDER BY p_partkey""".stripMargin

  // -- B12 family: explicit GROUPING SETS ------------------------------------
  private def q51(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q51")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  GROUPING_ID(l_returnflag, l_linestatus) AS gid,
        |  count(*) AS n,
        |  CAST(CAST(sum(l_quantity) AS DECIMAL(38,4)) AS STRING) AS sum_qty
        |FROM lineitem_q51
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, rf, ls""".stripMargin)
  }

  private val q51Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  GROUPING(l_returnflag, l_linestatus) AS gid,
      |  count(*) AS n,
      |  CAST(CAST(sum(l_quantity) AS DECIMAL(38,4)) AS VARCHAR) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY gid, rf, ls""".stripMargin

  // -- B20 family: calendar truncation/extraction ----------------------------
  private def q52(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        date_format(date_trunc("WEEK", col("o_orderdate")), "yyyy-MM-dd").as("week_start"),
        quarter(col("o_orderdate")).as("qtr"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("iso_week"))
      .orderBy(col("o_orderkey"))

  private val q52Sql =
    """SELECT o_orderkey,
      |  strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
      |  quarter(o_orderdate) AS qtr,
      |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
      |  dayofweek(o_orderdate) + 1 AS dow,
      |  weekofyear(o_orderdate) AS iso_week
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // -- B12 family: unpivot (wide → long) -------------------------------------
  private def q53(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        col("p_retailprice").cast("double").as("price"),
        col("p_size").cast("double").as("size"))
      .unpivot(Array(col("p_partkey")), Array(col("price"), col("size")),
        "metric", "value")
      .select(col("p_partkey"), col("metric"), dec4(col("value")).as("value"))
      .orderBy(col("p_partkey"), col("metric"))

  private val q53Sql =
    """SELECT p_partkey, metric, CAST(CAST(value AS DECIMAL(38,4)) AS VARCHAR) AS value
      |FROM (
      |  SELECT p_partkey, 'price' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part)
      |ORDER BY p_partkey, metric""".stripMargin

  // ==== q235: grouped top-k via the bounded-state aggregate =================
  //
  // The declared-query face of functions/TopKAgg: q13 ranks with
  // `row_number() OVER (PARTITION BY ...)` — which shuffles EVERY row to
  // its group's reducer and sorts the whole group; this answers the same
  // question with k-bounded state everywhere (map-side partials carry ≤ k
  // structs per group, reducers merge k-lists), the shape that survives a
  // hot group at 100 TB. The differential against the window-formulated
  // oracle proves the multiset top-k semantics equal rank() <= k row for
  // row, ties included.

  /** Top-`k` rows per group by (ordCol desc, tieCol asc):
    * (group, rank, tie, ord). */
  def groupedTopK(df: DataFrame, groupCol: String, ordCol: String,
      tieCol: String, k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.TopKAgg.of(
        struct(col(ordCol).as("o"), (-col(tieCol)).as("nt")), k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("r0", "t")))
      .select(col(groupCol), (col("r0") + 1).as("rank"),
        (-col("t.nt")).as(tieCol), col("t.o").as(ordCol))

  private def q235(s: SparkSession, dir: String): DataFrame =
    groupedTopK(
      Tables.orders(s, dir).select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"),
        col("o_orderkey")),
      "o_orderpriority", "price_c", "o_orderkey", k = 3)
      .orderBy(col("o_orderpriority"), col("rank"))

  private val q235Sql =
    """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rank,
      |  o_orderkey, price_c
      |FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
      |        o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_orderpriority, rank""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q235_grouped_topk", q235, Some(q235Sql)),
    QueryDef("q49_correlated_subquery", q49, Some(q49Sql)),
    QueryDef("q56_join_asof_forward", q56, Some(q56Sql)),
    QueryDef("q50_regexp", q50, Some(q50Sql)),
    QueryDef("q51_grouping_sets", q51, Some(q51Sql)),
    QueryDef("q52_calendar", q52, Some(q52Sql)),
    QueryDef("q53_unpivot", q53, Some(q53Sql)),
    QueryDef("q47_generators", q47, Some(q47Sql)),
    QueryDef("q48_window_dist", q48, Some(q48Sql)),
    QueryDef("q43_pivot", q43, Some(q43Sql)),
    QueryDef("q44_percentiles", q44, Some(q44Sql)),
    QueryDef("q45_stats", q45, Some(q45Sql)),
    QueryDef("q46_string_agg", q46, Some(q46Sql)),
    QueryDef("q01_parquet_scan", q01, Some(q01Sql)),
    QueryDef("hll_count_distinct", hllDistinct, Some(hllDistinctSql)),
    QueryDef("approx_quantiles", approxQuantilesGate, Some(approxQuantilesSql)),
    QueryDef("q02_projection", q02, Some(q02Sql)),
    QueryDef("q03_filter", q03, Some(q03Sql)),
    QueryDef("q04_join_inner", q04, Some(q04Sql)),
    QueryDef("q05_join_left", q05, Some(q05Sql)),
    QueryDef("q06_join_semi", q06, Some(q06Sql)),
    QueryDef("q07_join_anti", q07, Some(q07Sql)),
    QueryDef("q08_join_theta", q08, Some(q08Sql)),
    QueryDef("q09_join_asof", q09, Some(q09Sql)),
    QueryDef("q10_agg_groupby", q10, Some(q10Sql)),
    QueryDef("q11_count_distinct", q11, Some(q11Sql)),
    QueryDef("q12_rollup", q12, Some(q12Sql)),
    QueryDef("q42_cube", q42, Some(q42Sql)),
    QueryDef("q13_window_rank", q13, Some(q13Sql)),
    QueryDef("q14_window_analytic", q14, Some(q14Sql)),
    QueryDef("q15_window_frame", q15, Some(q15Sql)),
    QueryDef("q16_sort_nulls", q16, Some(q16Sql)),
    QueryDef("q17_topk", q17, Some(q17Sql)),
    QueryDef("q18_setops", q18, Some(q18Sql)),
    QueryDef("q19_strings", q19, Some(q19Sql)),
    QueryDef("q20_dates", q20, Some(q20Sql)),
    QueryDef("q21_math", q21, Some(q21Sql)),
    QueryDef("q22_arrays", q22, Some(q22Sql)),
    QueryDef("q23_maps", q23, Some(q23Sql)),
    QueryDef("q24_json", q24, Some(q24Sql)),
    QueryDef("q25_conditional", q25, Some(q25Sql)),
    QueryDef("q26_hash_identity", q26, Some(q26Sql)))
}
