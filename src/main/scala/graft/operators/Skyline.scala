package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline / Pareto frontier (round 9, B153) — "every point no other
  * point beats on both axes" (minimize x, maximize y): the multi-criteria
  * shortlist query (cheapest-but-largest parts, fastest-but-freshest
  * replicas) that a naive engine answers with an O(n²) NOT EXISTS
  * dominance anti-join.
  *
  * The 2-D case has a sort-based linear form — after sorting by x, a point
  * is on the skyline iff its y beats every y at strictly smaller x — but
  * the textbook implementation is a global `Window.orderBy(x)`, which
  * serializes 100 TB through one task. This operator keeps the closed form
  * and distributes the sort with the same two-level decomposition as the
  * q122 rank transform:
  *
  *   1. collapse to the DISTINCT (x, y) grid with multiplicities — one
  *      map-side-combined groupBy, so all later phases touch |distinct
  *      cells|, never |rows|;
  *   2. fixed-width x-buckets (integer arithmetic on the x domain — no
  *      sampled range partitioner, so the bucket of a cell is a pure
  *      function of its value and the replay is deterministic);
  *   3. per-bucket max-y rolled into an EXCLUSIVE prefix max across the
  *      bucket domain (≤ `buckets` rows — driver-scale, one tiny window)
  *      and broadcast back: `prev_max(b)` = best y anywhere left of
  *      bucket b, i.e. at strictly smaller x (bucket width ≥ 1 makes
  *      bucket(b') < bucket(b) ⇒ x' < x);
  *   4. inside each bucket, a `rangeBetween(unboundedPreceding, -1)`
  *      window ordered by x supplies the strictly-smaller-x max WITHIN the
  *      bucket — partitioned by bucket, so the per-task sort is
  *      |distinct|/buckets, the scale knob.
  *
  * A cell (x, y) is then on the skyline iff
  *   greatest(in-bucket max over x' < x, prev_max(bucket)) < y   and
  *   y = max y over its own x column (ties on x: only the best y
  *   survives; duplicate (x, y) cells are ONE skyline point with cnt > 1
  *   — dominance requires a strict improvement somewhere).
  *
  * Everything is exact integer comparison — no float epsilon at the
  * frontier — and the output is the frontier itself (inherently ≤
  * |distinct x| points), so no phase ever materializes a candidate set
  * larger than the distinct grid.
  */
object Skyline {

  /** Distinct skyline cells (x, y, cnt) of `points` minimizing `xCol` and
    * maximizing `yCol` (both integral). `buckets` bounds the per-task sort
    * at |distinct cells| / buckets. */
  def skyline2d(points: DataFrame, xCol: String, yCol: String,
      buckets: Int = 256): DataFrame = {
    val grid = points
      .groupBy(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .agg(count(lit(1)).as("cnt"))
    val r = grid.agg(min(col("x")), max(col("x"))).head // two scalars
    if (r.isNullAt(0)) return grid.select(col("x"), col("y"), col("cnt")) // empty in, empty out
    val (xmin, xmax) = (r.getLong(0), r.getLong(1))
    val w = (xmax - xmin) / buckets + 1 // ≥ 1 ⇒ bucket order respects x order
    // integer floor-div (x - xmin ≥ 0): Column./ is double division, whose
    // quotient rounding is unsafe for 2^53+ domains
    val cells = grid.withColumn("bucket", expr(s"(x - ${xmin}L) div ${w}L"))
    // bucket-domain prefix max (≤ `buckets` rows; the single-partition
    // window is domain-sized by construction, the q179/q122 discipline)
    val prev = cells.groupBy(col("bucket")).agg(max(col("y")).as("bmax"))
      .withColumn("prev_max", max(col("bmax")).over(
        Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"), col("prev_max"))
    val wLt = Window.partitionBy(col("bucket")).orderBy(col("x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(col("bucket"), col("x"))
    cells.join(broadcast(prev), Seq("bucket"))
      .withColumn("max_y_lt", greatest(
        coalesce(max(col("y")).over(wLt), lit(Long.MinValue)),
        coalesce(col("prev_max"), lit(Long.MinValue))))
      .withColumn("max_y_eq", max(col("y")).over(wEq))
      .where(col("max_y_lt") < col("y") && col("y") === col("max_y_eq"))
      .select(col("x"), col("y"), col("cnt"))
  }

  // cheapest-yet-largest parts: price in exact deci-cents (the data is a
  // 0.1 grid; floor(v*10 + 0.5) lands exactly on it in both engines —
  // a bare CAST would truncate 900.1*10 = 9000.999…)
  private def q217(s: SparkSession, dir: String): DataFrame =
    skyline2d(
      Tables.part(s, dir).select(
        floor(col("p_retailprice") * 10 + 0.5).cast("long").as("price_dc"),
        col("p_size")),
      "price_dc", "p_size")
      .select(col("x").as("price_dc"), col("y").as("p_size"), col("cnt"))
      .orderBy(col("price_dc"))

  // the oracle is the NAIVE quadratic dominance anti-join — the
  // differential proves the bucketed prefix-max decomposition, not a replay
  private val q217Sql =
    """WITH pts AS (
      |  SELECT CAST(floor(p_retailprice * 10 + 0.5) AS BIGINT) AS price_dc,
      |    CAST(p_size AS BIGINT) AS p_size, count(*) AS cnt
      |  FROM part GROUP BY 1, 2)
      |SELECT price_dc, p_size, cnt FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.price_dc <= p.price_dc AND q.p_size >= p.p_size
      |    AND (q.price_dc < p.price_dc OR q.p_size > p.p_size))
      |ORDER BY price_dc""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q217_skyline", q217, Some(q217Sql)))
}
