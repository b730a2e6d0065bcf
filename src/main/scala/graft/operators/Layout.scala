package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, so files
  * carry tight min/max ranges on EVERY clustered column and a selective
  * scan can skip most of a 100 TB table on either predicate.
  *
  * Range-partitioning by one column gives perfect pruning on that column
  * and none on any other; interleaving the bits of two columns gives a
  * curve where any aligned 2^k x 2^k square of the value space is one
  * contiguous z-value range. Laid out by z-value, each file's footer
  * min/max brackets a small rectangle of BOTH dimensions — parquet
  * row-group pruning and partition pruning then skip on either predicate
  * without reading data. This is plain Spark surface: compute z, then
  * `repartitionByRange(z).sortWithinPartitions(z)` and write; the pruning
  * itself is the engine's existing footer-stats machinery.
  *
  * The bit math is pure integer expressions (shift/and/or), fully inside
  * whole-stage codegen, and identical in DuckDB — so the oracle reproduces
  * every z-value bit-for-bit.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of k non-negative integer
    * columns: bit i of column j lands at position i*k + j. k*bits must fit
    * a long (≤ 63). */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.length
    require(k >= 2 && k * bits <= 63, s"$k cols x $bits bits won't fit a long")
    (for (i <- 0 until bits; j <- 0 until k) yield
      shiftleft(shiftright(cols(j), i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_ bitwiseOR _)
  }

  /** Two-column Morton code: bit i of x at position 2i, of y at 2i+1. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    zValueN(Seq(x, y), bits)

  /** The same interleave as DuckDB SQL text (generated from one loop so the
    * two engines cannot drift). */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Cluster `df` on the Z-curve of (x, y): z-value range partitioning +
    * in-partition z sort. Writing the result produces files whose footer
    * stats bracket small rectangles of both dimensions. */
  def zorder(df: DataFrame, x: Column, y: Column, bits: Int,
      numPartitions: Int): DataFrame = {
    val zv = zValue(x, y, bits)
    df.withColumn("__zv", zv)
      .repartitionByRange(numPartitions, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
  }

  // ==== q107: z-block locality over lineitem ================================
  //
  // 8-bit buckets of (l_partkey, l_suppkey); dropping the low 8 interleaved
  // bits of z leaves the top 4 bits of each dimension — so every z-block is
  // by construction one aligned 16x16 square of the bucket space. The
  // per-block min/max columns ARE the file-skipping evidence: each block's
  // footer-stats rectangle bounds both dimensions at once. One map-side
  // partial-agg shuffle over 256 groups; the z math itself never shuffles.

  private def q107(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select((col("l_partkey") % 256).as("px"),
        (col("l_suppkey") % 256).as("sx"))
    li.withColumn("zb", shiftright(zValue(col("px"), col("sx"), 8), 8))
      .groupBy(col("zb"))
      .agg(count(lit(1)).as("n"),
        min(col("px")).as("min_px"), max(col("px")).as("max_px"),
        min(col("sx")).as("min_sx"), max(col("sx")).as("max_sx"))
      .orderBy(col("zb"))
  }

  private val q107Sql = {
    val z = zValueSql("px", "sx", 8)
    s"""WITH b AS (
       |  SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sx FROM lineitem),
       |z AS (SELECT px, sx, ($z) >> 8 AS zb FROM b)
       |SELECT zb, count(*) AS n,
       |  min(px) AS min_px, max(px) AS max_px,
       |  min(sx) AS min_sx, max(sx) AS max_sx
       |FROM z GROUP BY zb ORDER BY zb""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q107_zorder_blocks", q107, Some(q107Sql)))
}
