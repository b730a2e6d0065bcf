package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial radius join (round 8, B145) — "all point pairs
  * within distance r" without a cross join: the cell-partitioning scheme
  * every distributed spatial engine (SpatialSpark, Sedona, GeoMesa) builds
  * on. Each point lands in one ⌊coord/cell⌋² grid cell; a pair within r
  * can only span cells ≤ 1 apart when cell ≥ r, so the probe side
  * replicates to its 3×3 cell neighborhood (a map-side explode of nine
  * slim (id, cell) rows — no data duplication) and candidates meet in ONE
  * equi shuffle join on the cell key. The exact integer test
  * (Δx² + Δy² ≤ r²) then keeps true neighbors.
  *
  * Pair uniqueness is structural, not a post-distinct: for a fixed
  * candidate (a, b), a's nine offsets hit b's cell exactly once, and the
  * a < b guard kills the mirrored candidate — so no candidate is ever
  * produced twice and nothing shuffles a dedup.
  *
  * Scale shape: the join shuffles by cell key, so balance follows the
  * point density per cell; a dense cell's work is quadratic in ITS
  * population only — the local truth of a radius join (those pairs are
  * the output) — never in the corpus. The cell size is the knob: r (the
  * default) minimizes candidates per cell at 9× slim replication; larger
  * cells trade fewer joins keys for more in-cell filtering. Integer
  * coordinates make the distance test exact — no float epsilon at the
  * radius boundary — and the declared query derives them from embedding
  * dims with floor (truncation both engines compute identically on the
  * same double product; round's half-grid is a cross-engine gap, floor
  * has none).
  */
object Spatial {

  /** All pairs (a < b, dist2 = Δx²+Δy²) of `points` (id, x, y — BIGINT
    * coords) with dist2 ≤ radius². `cell` defaults to radius; must be
    * ≥ radius for the 3×3 neighborhood to be complete. */
  def gridRadiusJoin(points: DataFrame, radius: Long,
      cell: Long = 0L): DataFrame = {
    val c = if (cell <= 0) radius else cell
    require(c >= radius, "cell size below radius breaks 3x3 completeness")
    // shift to non-negative so double-division truncation == floor. The
    // double quotient is safe to truncate: numerator ≤ 2^41 keeps the
    // quotient's ulp ≪ 1/c, so rounding can never cross an integer
    // boundary (non-divisible quotients sit ≥ 1/c below the next one).
    val off = lit(1L << 40)
    val p = points.select(col("id"), col("x"), col("y"),
      ((col("x") + off) / c).cast("long").as("cx"),
      ((col("y") + off) / c).cast("long").as("cy"))
    val probeOffsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val probe = p.select(col("id").as("a"), col("x").as("ax"),
        col("y").as("ay"), col("cx"), col("cy"),
        explode(probeOffsets).as("o"))
      .select(col("a"), col("ax"), col("ay"),
        (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
    val build = p.select(col("id").as("b"), col("x").as("bx"),
      col("y").as("by"), col("cx"), col("cy"))
    probe.join(build, Seq("cx", "cy"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        ((col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by"))).as("dist2"))
      .where(col("dist2") <= lit(radius * radius))
  }

  // embedding dims 1–2 scaled ×1000 and floored make exact BIGINT coords
  // (range ≈ ±400); r = 30 ⇒ ~1.9 k pairs at sf0.01, ~29 k at sf0.1
  private def points(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id").as("id"),
      floor(element_at(col("embedding"), 1).cast("double") * 1000)
        .cast("long").as("x"),
      floor(element_at(col("embedding"), 2).cast("double") * 1000)
        .cast("long").as("y"))

  private def q208(s: SparkSession, dir: String): DataFrame =
    gridRadiusJoin(points(s, dir), radius = 30)
      .orderBy(col("dist2"), col("a"), col("b")).limit(100)

  // the oracle is the NAIVE form (band predicate + exact filter) — the
  // differential proves the grid decomposition exact, not just replayed
  private val q208Sql =
    """WITH pts AS (
      |  SELECT vec_id AS id,
      |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS x,
      |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000) AS BIGINT) AS y
      |  FROM embeddings)
      |SELECT a.id AS a, b.id AS b,
      |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
      |FROM pts a JOIN pts b
      |  ON a.id < b.id
      |  AND b.x BETWEEN a.x - 30 AND a.x + 30
      |  AND b.y BETWEEN a.y - 30 AND a.y + 30
      |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 900
      |ORDER BY dist2, a, b LIMIT 100""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q208_spatial_join", q208, Some(q208Sql)))
}
