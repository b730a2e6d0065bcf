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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q133_random_projection", q133, Some(q133Sql)))
}
