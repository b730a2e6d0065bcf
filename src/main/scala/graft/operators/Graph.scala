package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over derived relational graphs (round 7). The engine
  * already runs connected components (Dedup, pointer jumping); this module
  * adds fixed-iteration PageRank — the importance/centrality signal used to
  * weight training-data sources (e.g. CommonCrawl page importance).
  */
object Graph {

  // ==== q123: PageRank by power iteration ===================================
  //
  // r' = (1−d)/N + d·Σ_{u→v} r_u/outdeg_u, a fixed number of iterations.
  // Each iteration is one edge-side hash join (rank lookup by src, the big
  // shuffle, key-balanced) plus one groupBy(dst) with map-side partial sums;
  // degree and node tables are computed once. No driver-side state — ranks
  // stay a DataFrame across iterations (the k-means lesson from AnnIvf:
  // collect only final results). Symmetric edge lists have no dangling
  // nodes, so no leaked-mass correction term is needed; the caller owns
  // that invariant. At 100 TB the one improvement is persisting the edges
  // at a fixed partitioning so every iteration reuses the same exchange —
  // Spark already reuses the shuffle files across the loop here.

  /** Fixed-iteration PageRank over directed (src, dst) edges. Supply both
    * directions for an undirected graph (also guarantees outdeg ≥ 1). */
  def pageRank(edges: DataFrame, iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
    var ranks = nodes.crossJoin(nRow)
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("in_sum"))
      ranks = nodes.crossJoin(nRow)
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          ((lit(1.0) - lit(damping)) / col("n") +
            lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("rank"))
    }
    ranks.crossJoin(nRow)
      .select(col("node"), (col("rank") * col("n")).as("rank_scaled"))
  }

  /** The q123 graph: customers ↔ parts they ordered (bipartite, symmetric).
    * Prefixed node ids keep the two key domains disjoint. */
  private def custPartEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("p"), col("l_partkey")).as("p"))
    pairs.select(col("c").as("src"), col("p").as("dst"))
      .union(pairs.select(col("p").as("src"), col("c").as("dst")))
  }

  private def q123(s: SparkSession, dir: String): DataFrame =
    pageRank(custPartEdges(s, dir), iterations = 5)
      .select(col("node"), QueryDef.dec4(col("rank_scaled")).as("rank_scaled"))
      .orderBy(col("node"))

  // The oracle unrolls the 5 power iterations as chained CTEs. All float
  // literals are forced to DOUBLE so both engines run the identical
  // binary-double recurrence (DuckDB would otherwise fold 1 − 0.85 in
  // DECIMAL and diverge in the last ulp).
  private val q123Sql = {
    val iter = (i: Int) =>
      s"""r$i AS (
         |  SELECT nodes.node,
         |    (1 - CAST(0.85 AS DOUBLE)) / n.n + CAST(0.85 AS DOUBLE) *
         |      coalesce(c.in_sum, CAST(0 AS DOUBLE)) AS rank
         |  FROM nodes CROSS JOIN n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank / o.outdeg) AS in_sum
         |    FROM e JOIN r${i - 1} r ON e.src = r.node
         |    JOIN outd o ON e.src = o.src
         |    GROUP BY e.dst) c ON nodes.node = c.node)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS c,
       |    'p' || CAST(l_partkey AS VARCHAR) AS p
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT c AS src, p AS dst FROM pairs
       |    UNION ALL SELECT p AS src, c AS dst FROM pairs)),
       |outd AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
       |n AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (
       |  SELECT node, CAST(1 AS DOUBLE) / n.n AS rank FROM nodes CROSS JOIN n),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT node,
       |  CAST(CAST(rank * n.n AS DECIMAL(38,4)) AS VARCHAR) AS rank_scaled
       |FROM r5 CROSS JOIN n ORDER BY node""".stripMargin
  }

  // ==== q124: deterministic k-fold split assignment =========================
  //
  // Cross-validation folds from a content-independent hash of the key —
  // stable across runs, engines, and partitionings. The fold function uses
  // two md5 hex digits (bias ≤ 1/256 for k=5), computed with string
  // primitives both engines share bit-for-bit; no engine-specific hash
  // (Spark's xxhash64 and DuckDB's hash() disagree). One map-side pass +
  // a k-row aggregate.

  /** Adds `fold` ∈ [0,k) from md5 of `keyCol` (deterministic, unbiased to
    * ≤1/256). */
  def kFoldAssign(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.withColumn("fold", expr(
      s"""pmod((locate(substring(md5(cast($keyCol as string)), 31, 1),
         |        '0123456789abcdef') - 1) * 16 +
         |     (locate(substring(md5(cast($keyCol as string)), 32, 1),
         |        '0123456789abcdef') - 1), $k)""".stripMargin))

  private def q124(s: SparkSession, dir: String): DataFrame =
    kFoldAssign(Tables.documents(s, dir), "doc_id", 5)
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        QueryDef.dec4(avg(col("n_chars"))).as("avg_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("fold"))

  private val q124Sql =
    """SELECT fold, count(*) AS n_docs,
      |  CAST(CAST(avg(n_chars) AS DECIMAL(38,4)) AS VARCHAR) AS avg_chars,
      |  count(DISTINCT lang) AS n_langs
      |FROM (
      |  SELECT *,
      |    ((strpos('0123456789abcdef',
      |        substr(md5(CAST(doc_id AS VARCHAR)), 31, 1)) - 1) * 16 +
      |     (strpos('0123456789abcdef',
      |        substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1)) % 5 AS fold
      |  FROM documents)
      |GROUP BY fold ORDER BY fold""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q123_pagerank", q123, Some(q123Sql)),
    QueryDef("q124_kfold", q124, Some(q124Sql)))
}
