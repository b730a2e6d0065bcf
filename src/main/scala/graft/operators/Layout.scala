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

  // ==== Hilbert curve: the locality-stronger sibling of Z-order ===========
  //
  // The Z-curve jumps: consecutive z-values can sit a whole half-plane
  // apart (z=0b0111 -> 0b1000 crosses the diagonal), so a file of
  // consecutive z rows occasionally spans a wide rectangle. The Hilbert
  // curve's defining property is unit-step adjacency — consecutive d are
  // ALWAYS grid neighbors — so equal-size d-ranges have asymptotically
  // tighter bounding boxes (Moon et al., "Analysis of the clustering
  // properties of the Hilbert space-filling curve", TKDE 2001). Same
  // plain-Spark layout mechanics as zorder: compute d, range-partition,
  // sort within partitions, write; footer stats do the pruning.
  //
  // The index is the canonical xy2d state machine (flip+swap per level),
  // unrolled over `bits` levels as pure when/bit expressions — static
  // expression tree, fully codegen'd, no loop at runtime. The DuckDB twin
  // unrolls the identical recurrence as a CTE chain generated from the
  // same per-level formulas, so the engines cannot drift.

  /** Hilbert d-index of (x, y) on the 2^bits x 2^bits grid — a native
    * codegen'd expression (graft.functions.HilbertIndex). Unrolling the
    * flip+swap recurrence as Columns is O(3^bits) plan size; the loop
    * lives in one generated function instead. */
  def hilbertD(x0: Column, y0: Column, bits: Int): Column =
    graft.functions.HilbertIndex.of(x0, y0, bits)

  /** DuckDB twin of [[hilbertD]] as a generated CTE chain: `srcCte` must
    * expose columns `x0`, `y0` (and anything else to carry through via
    * `carry`); the final CTE `hfin` exposes carry columns + `hd`. Each
    * step writes freshly-named x{k}/y{k}/d{k} columns so DuckDB's lateral
    * alias resolution can never shadow the previous level's values. */
  def hilbertSqlCtes(srcCte: String, bits: Int, carry: Seq[String]): String = {
    val n = 1L << bits
    val carrySel = carry.map(c => s"$c, ").mkString
    val steps = ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, k) =>
      val s = 1L << i
      val prev = if (k == 0) srcCte else s"h$k"
      val (x, y) = (s"x$k", s"y$k")
      val d0 = if (k == 0) s"CAST(0 AS BIGINT)" else s"d$k"
      s"""h${k + 1} AS (
         |  SELECT $carrySel
         |    CASE WHEN (($y & $s) > 0) THEN $x
         |         WHEN (($x & $s) > 0) THEN ${n - 1} - $y ELSE $y END
         |      AS x${k + 1},
         |    CASE WHEN (($y & $s) > 0) THEN $y
         |         WHEN (($x & $s) > 0) THEN ${n - 1} - $x ELSE $x END
         |      AS y${k + 1},
         |    $d0 + ${s * s} * xor(3 * (CASE WHEN ($x & $s) > 0 THEN 1 ELSE 0 END),
         |      CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END) AS d${k + 1}
         |  FROM $prev)""".stripMargin
    }
    steps.mkString(",\n") +
      s",\nhfin AS (SELECT $carrySel d$bits AS hd FROM h$bits)"
  }

  /** Cluster `df` on the Hilbert curve of (x, y) — same mechanics as
    * [[zorder]], tighter per-file bounding boxes. */
  def hilbert(df: DataFrame, x: Column, y: Column, bits: Int,
      numPartitions: Int): DataFrame = {
    df.withColumn("__hd", hilbertD(x, y, bits))
      .repartitionByRange(numPartitions, col("__hd"))
      .sortWithinPartitions(col("__hd"))
      .drop("__hd")
  }

  // ==== q206: Hilbert-block locality over lineitem ==========================
  //
  // The q107 twin on the Hilbert index: 8-bit buckets of
  // (l_partkey, l_suppkey), blocks of 256 consecutive d values (d >> 8),
  // per-block counts and bounding boxes. Because consecutive d are grid
  // neighbors, each 256-cell block is a connected region — the emitted
  // min/max rectangles are the file-skipping evidence, directly
  // comparable against q107's z-blocks.

  private def q206(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select((col("l_partkey") % 256).as("px"),
        (col("l_suppkey") % 256).as("sx"))
    li.withColumn("hb", shiftright(hilbertD(col("px"), col("sx"), 8), 8))
      .groupBy(col("hb"))
      .agg(count(lit(1)).as("n"),
        min(col("px")).as("min_px"), max(col("px")).as("max_px"),
        min(col("sx")).as("min_sx"), max(col("sx")).as("max_sx"))
      .orderBy(col("hb"))
  }

  private val q206Sql = {
    val ctes = hilbertSqlCtes("b", 8, Seq("px", "sx"))
    s"""WITH b AS (
       |  SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sx,
       |    l_partkey % 256 AS x0, l_suppkey % 256 AS y0
       |  FROM lineitem),
       |$ctes
       |SELECT hd >> 8 AS hb, count(*) AS n,
       |  min(px) AS min_px, max(px) AS max_px,
       |  min(sx) AS min_sx, max(sx) AS max_sx
       |FROM hfin GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q107_zorder_blocks", q107, Some(q107Sql)),
    QueryDef("q206_hilbert_blocks", q206, Some(q206Sql)))
}
