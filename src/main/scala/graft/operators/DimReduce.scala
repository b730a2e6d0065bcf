package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — deterministic embedding
  * dimensionality reduction (round 7, B84).
  *
  * The pre-ANN compression step for 100 TB embedding corpora: project
  * dim-64 vectors to dim-16 with a Rademacher (±1) matrix so downstream
  * index builds (IVF/PQ) and brute-force re-ranks touch 4× less data while
  * pairwise distances are preserved in expectation (E‖Rx/√d'‖² = ‖x‖²).
  *
  * Scale shape: the projection matrix rides in the PLAN as literal
  * coefficients (in_dim × out_dim = 1024 doubles — trivially broadcast with
  * the task binary), so the whole operator is one map-side projection over
  * one corpus scan: no shuffle, no driver state, no RNG. Determinism:
  * signs derive from md5("rp_i_j") — reproducible across runs, engines,
  * partitionings, and languages (the q124 trick), never from a seeded RNG
  * whose stream depends on row order.
  *
  * Cross-engine exactness: both engines evaluate the IDENTICAL left-to-right
  * add chain over the same float→double values with ±1.0 multiplies (exact)
  * and a 0.25 = 2⁻² final scale (exact), so the doubles match bit-for-bit
  * before the dec4 render — the oracle SQL is GENERATED from the same Scala
  * sign function.
  */
object DimReduce {

  /** ±1 sign for matrix cell (i, j), i = 1-based input dim, j = 1-based
    * output dim: first md5 nibble of "rp_i_j" < 8 → +1 else −1. */
  def sign(i: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp_${i}_$j".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) < 8) 1 else -1
  }

  /** Output column j (1-based) of the projection of double-array `v`:
    * 0.25 · Σᵢ v[i]·sign(i,j), summed in ascending-i order (left-assoc). */
  private def projCol(v: Column, inDim: Int, j: Int): Column = {
    val terms = (1 to inDim).map(i =>
      element_at(v, i) * lit(sign(i, j).toDouble))
    lit(0.25) * terms.reduceLeft(_ + _)
  }

  /** Project `embedding` (float array, `inDim` wide) to `outDim` doubles
    * `p01..pNN`. Pure map-side; keeps every other column. outDim must be a
    * power of four ≤ inDim so the 1/√outDim JL scale stays an exact binary
    * fraction (outDim=16 → 0.25). */
  def randomProject(emb: DataFrame, inDim: Int = 64, outDim: Int = 16): DataFrame = {
    require(outDim == 16, "scale constant is specialized to outDim=16 (1/√16 = 0.25)")
    val v = Similarity.toDouble(col("embedding"))
    emb.select(
      (emb.columns.filter(_ != "embedding").map(col) ++
        (1 to outDim).map(j => projCol(v, inDim, j).as(f"p$j%02d"))): _*)
  }

  private def q133(s: SparkSession, dir: String): DataFrame = {
    val proj = randomProject(
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))
    proj.select(col("vec_id") +:
      (1 to 16).map(j => QueryDef.dec4(col(f"p$j%02d")).as(f"p$j%02d")): _*)
      .orderBy(col("vec_id"))
  }

  // Oracle generated from the same sign() — both engines run the identical
  // literal ±1 chain. DOUBLE casts force DuckDB out of DECIMAL folding.
  private val q133Sql = {
    val colSql = (j: Int) => {
      val chain = (1 to 64)
        .map(i => s"v[$i] * CAST(${sign(i, j)} AS DOUBLE)")
        .mkString(" + ")
      f"CAST(CAST(CAST(0.25 AS DOUBLE) * ($chain) AS DECIMAL(38,4)) AS VARCHAR) AS p$j%02d"
    }
    s"""SELECT vec_id,
       |${(1 to 16).map(colSql).mkString(",\n")}
       |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |ORDER BY vec_id""".stripMargin
  }

  // ==== q232: PCA top component via power iteration ==========================
  //
  // Data-driven dimensionality reduction next to B84's data-oblivious JL:
  // the top principal component of the embedding cloud — the direction
  // feature-drift monitors watch and whitening/compression starts from.
  //
  // Scale + determinism shape: embeddings integerize to ⌊10⁶·e⌋ (float→
  // double is exact, the grid kills float noise), and the SCALED moment
  // matrix M = n·Σxxᵀ − (Σx)(Σx)ᵀ (= n²·cov, same eigenvectors) comes
  // from EXACT integer sums — computed distributed via a (i ≤ j, xᵢ·xⱼ)
  // explode to the pair domain (64·65/2 rows per map-side combine; one
  // shuffle of pair-domain partials, never a dim²-wide aggregate that
  // would blow codegen). The dim²-sized M collects to the driver (the
  // centroid/model-table discipline) where power iteration runs in plain
  // doubles — driver-deterministic, no cross-engine float chain.
  //
  // The oracle therefore checks EXACT INVARIANTS, not the float vector
  // (the q75/q171 gate pattern): n, trace(M) and max M_ii re-derived by
  // DuckDB from the same integers must hash-match, and the engine's
  // eigen-gates — λ ≥ max M_ii (top component explains at least the best
  // single axis), λ ≤ trace (bounded by total variance), ‖Mu − λu‖ small
  // (it IS an eigenpair) — must read TRUE. DimReduceSpec pins recovery of
  // a planted dominant direction.

  /** One row: (n, dim, trace, max_dim_var, lambda_ge_maxvar, lambda_le_trace,
    * residual_ok, explained_ok) for the top eigenpair of the integerized
    * moment matrix of `emb.embedding` (`dim` wide). */
  def pcaTopComponent(emb: DataFrame, dim: Int, iterations: Int = 20000): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // coalesce: a NULL embedding must still reach the count marker below
    // (explode(null) would silently drop the row; the oracle's count(*)
    // and the old emb.count() both include such rows)
    val ints = emb.select(coalesce(transform(col("embedding"),
      e => floor(e.cast("double") * 1e6).cast("long")),
      array().cast("array<bigint>")).as("x"))
    // Round 16 (guide §1.2 "don't make extra passes"): the pair moments,
    // the first moments AND the row count come out of ONE explode + one
    // map-side-combined groupBy — the first-moment entries ride along as
    // (i, -1) marker keys and the count as (-1, -1), so the corpus is
    // scanned once instead of three times (pairs job + firsts job +
    // emb.count() before). Every sum is the same exact DECIMAL(18,0)
    // integer arithmetic as before; the driver just dispatches on the
    // marker when filling s/diag/m, so the matrix is bit-identical.
    val moments = ints.select(explode(expr(
      """concat(
        |  flatten(transform(x, (xi, i) ->
        |    transform(slice(x, i + 1, size(x) - i), (xj, k) ->
        |      struct(i AS i, i + k AS j,
        |        CAST(xi AS DECIMAL(18,0)) * CAST(xj AS DECIMAL(18,0)) AS p)))),
        |  transform(x, (xi, i) ->
        |    struct(i AS i, -1 AS j, CAST(xi AS DECIMAL(18,0)) AS p)),
        |  array(struct(-1 AS i, -1 AS j, CAST(1 AS DECIMAL(18,0)) AS p)))
        |""".stripMargin)).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.p")).as("sp"))
      .collect()
    var n = 0L
    val s = new Array[Long](dim)
    for (r <- moments; if r.getInt(1) == -1) {
      val v = r.getDecimal(2).toBigInteger.longValueExact()
      if (r.getInt(0) == -1) n = v else s(r.getInt(0)) = v
    }
    val diag = new Array[BigInt](dim) // exact Σxᵢ² per dim
    val m = Array.ofDim[Double](dim, dim) // model-sized: dim² doubles
    for (r <- moments; if r.getInt(1) >= 0) {
      val (i, j) = (r.getInt(0), r.getInt(1))
      val sp = BigInt(r.getDecimal(2).toBigInteger)
      if (i == j) diag(i) = sp
      val v = n.toDouble * sp.toDouble - s(i).toDouble * s(j).toDouble
      m(i)(j) = v; m(j)(i) = v
    }
    // EXACT integer invariants the oracle re-derives: M_ii = n·Σxᵢ² − (Σxᵢ)²
    val dimVars = (0 until dim).map(i => BigInt(n) * diag(i) - BigInt(s(i)) * BigInt(s(i)))
    val trace = dimVars.sum
    val maxVar = dimVars.max
    // driver-side power iteration (deterministic double math on one host;
    // per-step normalization keeps the ~1e19 entries from overflowing).
    // The embedding cloud is near-isotropic (contraction ≈0.987/step
    // measured at sf0.01, slower at sf1), so the walk is LONG — checked
    // every 50 steps against the residual gate and cut on convergence;
    // the cap costs ≤ 20000·64² driver flops (~80 ms), nothing at scale.
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      val nv = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(0.0)((acc, j) => acc + m(i)(j) * v(j)))
      val norm = math.sqrt(nv.map(x => x * x).sum)
      v = nv.map(_ / norm)
      it += 1
      if (it % 50 == 0) {
        val mvp = Array.tabulate(dim)(i =>
          (0 until dim).foldLeft(0.0)((acc, j) => acc + m(i)(j) * v(j)))
        val lam = (0 until dim).map(i => v(i) * mvp(i)).sum
        val res = math.sqrt((0 until dim)
          .map(i => (mvp(i) - lam * v(i)) * (mvp(i) - lam * v(i))).sum)
        converged = res <= 0.5e-4 * lam
      }
    }
    val mv = Array.tabulate(dim)(i =>
      (0 until dim).foldLeft(0.0)((acc, j) => acc + m(i)(j) * v(j)))
    val lambda = (0 until dim).map(i => v(i) * mv(i)).sum // ‖v‖ = 1
    val residual = math.sqrt((0 until dim)
      .map(i => (mv(i) - lambda * v(i)) * (mv(i) - lambda * v(i))).sum)
    Seq((n, dim, trace.toString, maxVar.toString,
      lambda >= maxVar.toDouble * (1 - 1e-9),
      lambda <= trace.toDouble * (1 + 1e-9),
      residual <= 1e-4 * lambda))
      .toDF("n", "dim", "trace", "max_dim_var",
        "lambda_ge_maxvar", "lambda_le_trace", "residual_ok")
  }

  /** The converged top eigenvector itself (for specs / downstream use). */
  private[operators] def topEigenvector(emb: DataFrame, dim: Int,
      iterations: Int = 30): Array[Double] = {
    val spark = emb.sparkSession
    val ints = emb.select(transform(col("embedding"),
      e => floor(e.cast("double") * 1e6).cast("long")).as("x"))
    val rows = ints.collect().map(_.getSeq[Long](0).toArray) // spec-sized only
    val n = rows.length
    val dimN = dim
    val s = Array.tabulate(dimN)(i => rows.map(_(i)).sum)
    val m = Array.tabulate(dimN, dimN)((i, j) =>
      n.toDouble * rows.map(r => r(i).toDouble * r(j).toDouble).sum -
        s(i).toDouble * s(j).toDouble)
    var v = Array.fill(dimN)(1.0 / math.sqrt(dimN.toDouble))
    for (_ <- 1 to iterations) {
      val nv = Array.tabulate(dimN)(i =>
        (0 until dimN).foldLeft(0.0)((acc, j) => acc + m(i)(j) * v(j)))
      val norm = math.sqrt(nv.map(x => x * x).sum)
      v = nv.map(_ / norm)
    }
    v
  }

  private def q232(s: SparkSession, dir: String): DataFrame =
    pcaTopComponent(Tables.embeddings(s, dir), dim = 64)

  // the oracle re-derives the EXACT integer invariants (n, trace, max
  // single-dim variance) and accepts the engine's eigen-gates as TRUE —
  // the q75/q171 sketch-gate pattern for driver-side float iteration
  private val q232Sql =
    """WITH x AS (
      |  SELECT list_transform(embedding,
      |    e -> CAST(floor(CAST(e AS DOUBLE) * 1e6) AS BIGINT)) AS x
      |  FROM embeddings),
      |ux AS (
      |  SELECT u.i, u.xi FROM x,
      |    LATERAL (SELECT generate_subscripts(x.x, 1) AS i,
      |             unnest(x.x) AS xi) u),
      |mom AS (
      |  SELECT i, sum(CAST(xi AS HUGEINT)) AS s,
      |    sum(CAST(xi AS HUGEINT) * CAST(xi AS HUGEINT)) AS ss
      |  FROM ux GROUP BY i),
      |nn AS (SELECT count(*) AS n FROM x),
      |vars AS (
      |  SELECT i, CAST(n AS HUGEINT) * ss - s * s AS dv
      |  FROM mom CROSS JOIN nn)
      |SELECT (SELECT n FROM nn) AS n, 64 AS dim,
      |  CAST(sum(dv) AS VARCHAR) AS trace,
      |  CAST(max(dv) AS VARCHAR) AS max_dim_var,
      |  TRUE AS lambda_ge_maxvar, TRUE AS lambda_le_trace,
      |  TRUE AS residual_ok
      |FROM vars""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q133_random_projection", q133, Some(q133Sql)),
    QueryDef("q232_pca_power", q232, Some(q232Sql)))
}
