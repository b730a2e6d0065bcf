package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Embedding-curation clustering shelf (round 15): deterministic integerized
  * Lloyd k-means, the SemDedup cluster-bounded semantic dedup it enables, and
  * the simplified-silhouette cluster-quality diagnostic.
  *
  * The reference's ingestion corpus has no clustering stage; this shelf is
  * the training-data-pipeline capability on top (SemDedup — Abbas et al.
  * 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication"): cluster the embedding space once, then bound every
  * pairwise-cosine candidate set BY CLUSTER — never corpus² — exactly the
  * IVF cell contract (`AnnIvf`), reused here for curation instead of search.
  *
  * Determinism discipline (why this is NOT `AnnIvf.trainCentroids`, which
  * keeps double-precision means): every quantity both engines compare is an
  * exact integer —
  *  - vectors are ⌊10⁶·e⌋ integerized ONCE (the q237 LOF rule); every dot
  *    product / squared-L2 is then an integral double ≤ ~10¹⁵ < 2⁵³, exact
  *    regardless of partitioning or add order;
  *  - centroid updates are FLOOR-DIVIDED means ⌊Σx/n⌋, so centroids stay
  *    integral across iterations and the DuckDB oracle replays the whole
  *    recursion bit-for-bit (floored Lloyd still monotonically decreases
  *    the quantization error it optimizes — the ±1 floor slack is absorbed
  *    by the argmin, and determinism is what the differential gate needs);
  *  - seeding is declared: the k smallest rows by (md5(id), id) — no RNG;
  *  - assignment ties break (distance, cell) lexicographic, the
  *    `NearestCells` convention.
  *
  * Scale shape (the 100 TB story): assignment is per-row expression work
  * against k literal centroids (no shuffle, whole-stage codegen around the
  * native `DotProduct` expression); each Lloyd update is ONE map-side-
  * combined groupBy producing k rows (`VectorSumAgg`), collected to the
  * driver (k·dim doubles — size independent of corpus); SemDedup pairs are
  * generated per cell (cell-bounded fan-out, the `Similarity.dbscan`
  * corpus-scale contract); silhouette is pure per-row arithmetic.
  */
object Clustering {

  /** Cluster count / Lloyd iterations declared by the q359–q361 queries.
    * Small k keeps the oracle's unrolled-CTE replay tractable; the engine
    * path takes any k (a 100 TB corpus would use k in the thousands via
    * the same literal/broadcast split AnnIvf documents). */
  val K = 8
  val Iters = 3
  private val Dim = 64

  /** Integerized embedding slice: (id, x) with x = ⌊10⁶·e⌋ as integral
    * doubles (exact under any add order while sums stay < 2⁵³). */
  def intVecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").as("id"),
      transform(col("embedding"),
        e => floor(e.cast("double") * 1e6).cast("double")).as("x"))

  /** Squared L2 to one literal centroid via v·v − 2 v·c + c·c; `n2` is the
    * per-row v·v column so the row norm is computed once, not k times. */
  private def distTo(n2: Column, x: Column, c: Array[Double]): Column = {
    val cc = c.map(v => v * v).sum // exact: integral terms, sum < 2^53
    n2 + lit(cc) - lit(2.0) * graft.functions.VectorExprs.dotProduct(
      x, typedLit(c.toSeq))
  }

  /** (distance, cell) structs for all k centroids, sorted ascending — the
    * lexicographic sort IS the tie rule (lower cell wins on equal d). */
  private def scoredCells(n2: Column, x: Column,
      cents: Array[Array[Double]]): Column =
    array_sort(array(cents.zipWithIndex.map { case (c, i) =>
      struct(distTo(n2, x, c).as("d"), lit(i).as("cell"))
    }: _*))

  /** vecs(id, x) + columns (cell, d) = argmin cell and its squared L2. */
  def withCellDist(vecs: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val sc = scoredCells(
      graft.functions.VectorExprs.dotProduct(col("x"), col("x")),
      col("x"), cents)
    vecs.withColumn("sc1", element_at(sc, 1))
      .withColumn("cell", col("sc1.cell"))
      .withColumn("d", col("sc1.d"))
      .drop("sc1")
  }

  /** Integerized Lloyd: seed = k smallest (md5(id), id) rows, `iters`
    * rounds of assign → floored per-cell mean, empty cells keep their
    * previous centroid. Driver holds only k·dim doubles between rounds
    * (each round is one scan + one k-row groupBy — corpus-size-free). */
  def lloyd(vecs: DataFrame, k: Int = K, iters: Int = Iters): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = vecs
      .orderBy(md5(col("id").cast("string")), col("id")).limit(k)
      .select(col("x")).collect().map(_.getSeq[Double](0).toArray)
    require(cents.length == k, s"lloyd: corpus has fewer than k=$k vectors")
    for (_ <- 1 to iters) {
      val stats = withCellDist(vecs, cents)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          graft.functions.VectorSumAgg.of(col("x")).as("s"))
        .collect()
      val next = cents.map(identity) // empty cells carry over
      stats.foreach { r =>
        val cell = r.getInt(0)
        val n = r.getLong(1).toDouble
        next(cell) = r.getSeq[Double](2).map(v => math.floor(v / n)).toArray
      }
      cents = next
    }
    cents
  }

  // ==== q359: k-means cluster census =========================================

  /** Per-cluster census of the final Lloyd state: size, within-cluster sum
    * of squares (exact — per-row integral distances summed as
    * DECIMAL(19,0)), and the centroid component sum as an integrity
    * checksum of the replayed recursion. */
  def kmeansCensus(emb: DataFrame, k: Int = K, iters: Int = Iters): DataFrame = {
    val vecs = intVecs(emb)
    val cents = lloyd(vecs, k, iters)
    val spark = emb.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex
      .map { case (c, i) => (i, c.sum.toLong) } // integral-double sum: exact
      .toSeq.toDF("cell", "csum")
    withCellDist(vecs, cents)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("d").cast(DecimalType(19, 0))).cast("string").as("wss"))
      .join(cdf, Seq("cell"))
      .select(col("cell"), col("n_vecs"), col("wss"), col("csum"))
      .orderBy(col("cell"))
  }

  private def q359(s: SparkSession, dir: String): DataFrame =
    kmeansCensus(Tables.embeddings(s, dir))

  // ==== q360: SemDedup — cluster-bounded semantic dedup ======================

  /** Deterministic near-duplicate plant (the q129/q104 stress-corpus
    * pattern, applied in integer space so the oracle replays it): every
    * id ≡ 0 (mod 7) vector re-enters as id + 10⁹ with its first component
    * bumped by 5·10⁴ — cosine ≈ 0.999 to its source, far above anything
    * the synthetic corpus produces naturally (max ≈ 0.51). */
  private def plantNearDups(vecs: DataFrame): DataFrame =
    vecs.unionAll(vecs.where(pmod(col("id"), lit(7)) === 0)
      .select((col("id") + lit(1000000000L)).as("id"),
        concat(array(element_at(col("x"), 1) + lit(50000.0)),
          slice(col("x"), 2, Dim - 1)).as("x")))

  /** SemDedup: cluster, then within each cluster drop every row that has a
    * LOWER-id row at cosine ≥ τ (declared dominated-by-lower-id rule — no
    * transitive closure; the kept row per near-dup set is the smallest id).
    * The cosine test is exact: (10·dot)² ≥ (100·τ²)·‖a‖²·‖b‖² compared in
    * DECIMAL(38,0) (dot and norms are integral doubles ≤ ~6·10¹⁴, so the
    * ×10/×81 rescales stay exact before the decimal cast). τ = 0.9.
    * Emits the DROPPED rows: (vec_id, cell, dup_of = smallest dominator).
    */
  def semDedupDropped(emb: DataFrame, k: Int = K, iters: Int = Iters): DataFrame = {
    val corpus = plantNearDups(intVecs(emb))
    val cents = lloyd(corpus, k, iters)
    // Round 16 (VERDICT r15 item 7): materialize the assigned frame ONCE.
    // `v` feeds BOTH sides of the cell join lazily, and the optimizer
    // additionally pushes an inferred isnotnull(cell) below the projection
    // on each side — the 8-centroid argmin expression (8 64-dim dot
    // products + array_sort) was evaluated in FOUR scan branches plus the
    // pushed filters (plans/r16/q360_semdedup_before.txt: the assignment
    // expression appears verbatim in Filter(2)/(6)/(12)/(16) AND
    // Project(4)/(9)/(14)/(19)). The checkpoint computes the assignment
    // once per row; both join sides read node-sized blocks. Corpus-scale
    // cost: one extra materialization of (id, cell, x, n2) — input-sized,
    // released at the query boundary — against ~8× the assignment
    // compute in the scan stage.
    val v = withCellDist(corpus, cents)
      .withColumn("n2",
        graft.functions.VectorExprs.dotProduct(col("x"), col("x")))
      .select(col("id"), col("cell"), col("x"), col("n2"))
      .localCheckpoint()
    val a = v.toDF("ida", "cell", "xa", "na")
    val b = v.toDF("idb", "cell", "xb", "nb")
    val dot = graft.functions.VectorExprs.dotProduct(col("xa"), col("xb"))
    a.join(b, Seq("cell")).where(col("ida") < col("idb"))
      .withColumn("dt", dot)
      .where(col("dt") > 0 &&
        (lit(10.0) * col("dt")).cast(DecimalType(19, 0)) *
          (lit(10.0) * col("dt")).cast(DecimalType(19, 0)) >=
        (lit(81.0) * col("na")).cast(DecimalType(19, 0)) *
          col("nb").cast(DecimalType(19, 0)))
      .groupBy(col("idb").as("vec_id"), col("cell"))
      .agg(min(col("ida")).as("dup_of"))
      .select(col("vec_id"), col("cell"), col("dup_of"))
      .orderBy(col("vec_id"))
  }

  private def q360(s: SparkSession, dir: String): DataFrame =
    semDedupDropped(Tables.embeddings(s, dir))

  // ==== q361: simplified silhouette ==========================================

  /** Per-cluster simplified silhouette (Hruschka et al.): s = (b − a) /
    * max(a, b) with a = squared-L2 to the own centroid, b = to the nearest
    * OTHER centroid — the cluster-quality read on the q359 state without
    * the full silhouette's pairwise pass. Each s is ⌊10⁶·⌋-floored then
    * integer-summed (the q195 add-order rule); one double chain at render.
    */
  def silhouetteByCluster(emb: DataFrame, k: Int = K, iters: Int = Iters): DataFrame = {
    val vecs = intVecs(emb)
    val cents = lloyd(vecs, k, iters)
    val sc = scoredCells(
      graft.functions.VectorExprs.dotProduct(col("x"), col("x")),
      col("x"), cents)
    vecs.withColumn("s1", element_at(sc, 1))
      .withColumn("s2", element_at(sc, 2))
      .select(col("s1.cell").as("cell"),
        when(greatest(col("s1.d"), col("s2.d")) > 0,
          floor(lit(1e6) * (col("s2.d") - col("s1.d")) /
            greatest(col("s1.d"), col("s2.d"))).cast("long"))
          .otherwise(lit(0L)).as("sm"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        QueryDef.dec4(sum(col("sm")).cast("double") /
          (count(lit(1)).cast("double") * lit(1e6))).as("mean_sil"))
      .orderBy(col("cell"))
  }

  private def q361(s: SparkSession, dir: String): DataFrame =
    silhouetteByCluster(Tables.embeddings(s, dir))

  // ==== oracle: the Lloyd recursion unrolled as CTEs =========================

  /** The shared WITH-prefix replaying the integerized Lloyd recursion in
    * DuckDB: e (integerize [+ plant]), n (norms), seed/c0, then per
    * iteration d_i (distances) → a_i (argmin assign) → m_i (floored means,
    * long form) → c_i (re-listed, empty cells carried). Ends with rF =
    * final distances ranked per id ((d, cell) — rn 1 is the assignment,
    * rn 2 the nearest other cell). `pfx` namespaces the chain so several
    * replays (q362 runs four k values) can share one WITH clause. */
  private def lloydCtes(plant: Boolean, k: Int = K, iters: Int = Iters): String =
    baseCtes(plant) + ",\n" + lloydChain("", k, iters)

  /** e0 (integerize) / e (optional near-dup plant) / n (norms). */
  private def baseCtes(plant: Boolean): String = {
    val plantCte =
      if (plant)
        """|e AS (
           |  SELECT id, x FROM e0
           |  UNION ALL
           |  SELECT id + 1000000000 AS id, [x[1] + 50000] || x[2:] AS x
           |  FROM e0 WHERE id % 7 = 0),""".stripMargin
      else "e AS (SELECT id, x FROM e0),"
    s"""|e0 AS (
        |  SELECT vec_id AS id,
        |    list_transform(embedding, v -> floor(CAST(v AS DOUBLE) * 1e6)) AS x
        |  FROM embeddings),
        |$plantCte
        |n AS (SELECT id, x, list_inner_product(x, x) AS n2 FROM e)""".stripMargin
  }

  /** One Lloyd replay over the shared `n` CTE: `${pfx}c0 … ${pfx}rF`. */
  private def lloydChain(pfx: String, k: Int, iters: Int): String = {
    val iter = (1 to iters).map { i =>
      val prev = s"${pfx}c${i - 1}"
      s"""|${pfx}d$i AS (
          |  SELECT n.id, c.cell,
          |    n.n2 + list_inner_product(c.c, c.c)
          |      - 2 * list_inner_product(n.x, c.c) AS d
          |  FROM n CROSS JOIN $prev c),
          |${pfx}a$i AS (
          |  SELECT id, cell FROM (
          |    SELECT id, cell,
          |      row_number() OVER (PARTITION BY id ORDER BY d, cell) AS rn
          |    FROM ${pfx}d$i) WHERE rn = 1),
          |${pfx}m$i AS (
          |  SELECT a.cell, u.j,
          |    floor(CAST(sum(n.x[u.j]) AS DOUBLE) / count(*)) AS cx
          |  FROM ${pfx}a$i a JOIN n ON n.id = a.id, unnest(range(1, ${Dim + 1})) AS u(j)
          |  GROUP BY a.cell, u.j),
          |${pfx}l$i AS (SELECT cell, list(cx ORDER BY j) AS c FROM ${pfx}m$i GROUP BY cell),
          |${pfx}c$i AS (
          |  SELECT p.cell, COALESCE(l.c, p.c) AS c
          |  FROM $prev p LEFT JOIN ${pfx}l$i l USING (cell)),""".stripMargin
    }.mkString("\n")
    s"""|${pfx}c0 AS (
        |  SELECT rn - 1 AS cell, x AS c FROM (
        |    SELECT x, row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
        |    FROM e) WHERE rn <= $k),
        |$iter
        |${pfx}dF AS (
        |  SELECT n.id, c.cell,
        |    n.n2 + list_inner_product(c.c, c.c)
        |      - 2 * list_inner_product(n.x, c.c) AS d
        |  FROM n CROSS JOIN ${pfx}c$iters c),
        |${pfx}rF AS (
        |  SELECT id, cell, d,
        |    row_number() OVER (PARTITION BY id ORDER BY d, cell) AS rn
        |  FROM ${pfx}dF)""".stripMargin
  }

  // ==== q363: cluster medoids ================================================

  /** Per-cluster medoid: the member closest to its centroid under the
    * (distance, id) tie rule — the inspectable PROTOTYPE of each cluster
    * (SemDedup keeps the lowest id; what a curator actually reads to name
    * a cluster is its most central member). One groupBy with a
    * lexicographic struct-min — map-side combined, k rows out, no window.
    */
  def clusterMedoids(emb: DataFrame, k: Int = K, iters: Int = Iters): DataFrame = {
    val vecs = intVecs(emb)
    val cents = lloyd(vecs, k, iters)
    withCellDist(vecs, cents)
      .groupBy(col("cell"))
      .agg(min(struct(col("d"), col("id"))).as("m"))
      .select(col("cell"), col("m.id").as("medoid_id"),
        col("m.d").cast("long").as("medoid_d"))
      .orderBy(col("cell"))
  }

  private def q363(s: SparkSession, dir: String): DataFrame =
    clusterMedoids(Tables.embeddings(s, dir))

  private val q363Sql =
    s"""|WITH
        |${lloydCtes(plant = false)}
        |SELECT CAST(cell AS INTEGER) AS cell, id AS medoid_id,
        |  CAST(d AS BIGINT) AS medoid_d
        |FROM (
        |  SELECT cell, id, d,
        |    row_number() OVER (PARTITION BY cell ORDER BY d, id) AS mrn
        |  FROM rF WHERE rn = 1)
        |WHERE mrn = 1 ORDER BY cell""".stripMargin

  // ==== q362: elbow census — choosing k ======================================

  /** WSS-vs-k elbow census — the "is k even sane" question q361 reads
    * per-cluster, answered across an ORDERED k grid: the SAME integerized
    * Lloyd at each k, total WSS per k (exact DECIMAL), the discrete second
    * difference over the grid, and the knee = max second difference
    * (endpoints carry NULL — no curvature is defined there). Each k's WSS
    * is one distributed aggregate; the grid itself is |ks| scalars, so the
    * curvature fold runs on the driver over |ks| numbers (corpus-size-free,
    * like the k·dim centroid collect). */
  def elbowCensus(emb: DataFrame, ks: Seq[Int] = Seq(2, 4, 8, 16),
      iters: Int = Iters): DataFrame = {
    import java.math.BigDecimal
    val vecs = intVecs(emb)
    val wss: Seq[(Int, BigDecimal)] = ks.sorted.map { k =>
      val cents = lloyd(vecs, k, iters)
      val w = withCellDist(vecs, cents)
        .agg(sum(col("d").cast(DecimalType(19, 0))).as("w"))
        .head.getDecimal(0)
      (k, w)
    }
    val d2: Seq[Option[BigDecimal]] = wss.indices.map { i =>
      if (i == 0 || i == wss.size - 1) None
      else Some(wss(i - 1)._2.add(wss(i + 1)._2)
        .subtract(wss(i)._2).subtract(wss(i)._2))
    }
    val maxD2 = d2.flatten
      .reduceOption((a, b) => if (a.compareTo(b) >= 0) a else b)
    val rows = wss.zip(d2).map { case ((k, w), dd) =>
      (k, w.toPlainString, dd.map(_.toPlainString),
        dd.exists(v => maxD2.exists(_.compareTo(v) == 0)))
    }
    val spark = emb.sparkSession
    import spark.implicits._
    rows.toDF("k", "wss", "d2", "is_knee").orderBy(col("k"))
  }

  private def q362(s: SparkSession, dir: String): DataFrame =
    elbowCensus(Tables.embeddings(s, dir))

  private val q362Sql = {
    val ks = Seq(2, 4, 8, 16)
    val chains = ks.map(k => lloydChain(s"k${k}_", k, Iters)).mkString(",\n")
    val wUnion = ks.map(k =>
      s"""SELECT $k AS k, sum(CAST(d AS DECIMAL(19,0))) AS wss
         |  FROM k${k}_rF WHERE rn = 1""".stripMargin).mkString("\n  UNION ALL\n  ")
    s"""|WITH
        |${baseCtes(plant = false)},
        |$chains,
        |w AS (
        |  $wUnion),
        |g AS (
        |  SELECT k, wss,
        |    lag(wss) OVER (ORDER BY k) AS wp,
        |    lead(wss) OVER (ORDER BY k) AS wn
        |  FROM w),
        |o AS (
        |  SELECT k, wss,
        |    CASE WHEN wp IS NULL OR wn IS NULL THEN NULL
        |      ELSE wp + wn - wss - wss END AS d2v
        |  FROM g)
        |SELECT CAST(k AS INTEGER) AS k, CAST(wss AS VARCHAR) AS wss,
        |  CAST(d2v AS VARCHAR) AS d2,
        |  COALESCE(d2v = (SELECT max(d2v) FROM o), false) AS is_knee
        |FROM o ORDER BY k""".stripMargin
  }

  private val q359Sql =
    s"""|WITH
        |${lloydCtes(plant = false)},
        |cs AS (
        |  SELECT cell, CAST(sum(c[u.j]) AS BIGINT) AS csum
        |  FROM c$Iters, unnest(range(1, ${Dim + 1})) AS u(j) GROUP BY cell)
        |SELECT CAST(f.cell AS INTEGER) AS cell, count(*) AS n_vecs,
        |  CAST(sum(CAST(f.d AS DECIMAL(19,0))) AS VARCHAR) AS wss,
        |  any_value(cs.csum) AS csum
        |FROM rF f JOIN cs ON cs.cell = f.cell
        |WHERE f.rn = 1
        |GROUP BY f.cell ORDER BY cell""".stripMargin

  private val q360Sql =
    s"""|WITH
        |${lloydCtes(plant = true)},
        |v AS (
        |  SELECT f.id, f.cell, n.x, n.n2
        |  FROM rF f JOIN n USING (id) WHERE f.rn = 1),
        |hit AS (
        |  SELECT b.id AS idb, CAST(b.cell AS INTEGER) AS cell, a.id AS ida
        |  FROM v a JOIN v b ON a.cell = b.cell AND a.id < b.id
        |  WHERE list_inner_product(a.x, b.x) > 0
        |    AND CAST(10 * list_inner_product(a.x, b.x) AS DECIMAL(19,0))
        |      * CAST(10 * list_inner_product(a.x, b.x) AS DECIMAL(19,0))
        |      >= CAST(81 * a.n2 AS DECIMAL(19,0)) * CAST(b.n2 AS DECIMAL(19,0)))
        |SELECT idb AS vec_id, cell, min(ida) AS dup_of
        |FROM hit GROUP BY 1, 2 ORDER BY vec_id""".stripMargin

  private val q361Sql =
    s"""|WITH
        |${lloydCtes(plant = false)},
        |ab AS (
        |  SELECT f1.id, f1.cell, f1.d AS a, f2.d AS b
        |  FROM rF f1 JOIN rF f2 USING (id)
        |  WHERE f1.rn = 1 AND f2.rn = 2),
        |sm AS (
        |  SELECT cell,
        |    CASE WHEN greatest(a, b) > 0
        |      THEN CAST(floor(1e6 * (b - a) / greatest(a, b)) AS BIGINT)
        |      ELSE 0 END AS s
        |  FROM ab)
        |SELECT CAST(cell AS INTEGER) AS cell, count(*) AS n_vecs,
        |  CAST(CAST(CAST(sum(s) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e6)
        |    AS DECIMAL(38,4)) AS VARCHAR) AS mean_sil
        |FROM sm GROUP BY cell ORDER BY cell""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q359_kmeans_census", q359, Some(q359Sql)),
    QueryDef("q360_semdedup", q360, Some(q360Sql)),
    QueryDef("q361_silhouette", q361, Some(q361Sql)),
    QueryDef("q362_kmeans_elbow", q362, Some(q362Sql)),
    QueryDef("q363_cluster_medoids", q363, Some(q363Sql)))
}
