package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance (MMR) diverse top-k selection (round 7, B88).
  *
  * The diversity-aware pick used to build eval/demo sets and dedupe-adjacent
  * sampling: greedily select the item maximizing
  * `λ·rel(q, d) − (1−λ)·max_{s∈selected} sim(s, d)` — relevance traded
  * against redundancy with what's already chosen.
  *
  * Scale shape: the greedy step is inherently sequential in k, but each step
  * is ONE corpus scan + TakeOrdered(1): the ≤k selected vectors ride in the
  * plan as literals (k·dim doubles — bounded, the probe-cell-list class),
  * so no shuffle and no growing driver state beyond the answer itself. At
  * 100 TB the pool is first cut to the top-N relevance candidates through
  * the IVF index ([[Similarity]] `topKIndexed`) and MMR runs over that
  * N-row pool — the greedy loop's cost is then independent of corpus size.
  *
  * Cross-engine exactness: every cosine is rounded to 4 dp BEFORE entering
  * the score (the q37 ranking discipline), λ and 1−λ are evaluated as the
  * same IEEE expressions on both engines (`1.0 − 0.7` at runtime, not a
  * pre-folded Scala constant), and ties break on vec_id — so the oracle's
  * unrolled k-step CTE chain picks the identical items.
  */
object Diversity {

  private def cos4(a: Column, b: Column): Column =
    round(Similarity.cosine(a, b), 4)

  /** Greedy MMR over `corpus` (vec_id, v: array<double>) against a literal
    * query vector. Returns (step, vec_id, score) for the k picks. */
  def mmrSelect(corpus: DataFrame, queryVec: Seq[Double], k: Int,
      lam: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val lamC = lit(lam)
    val oneMinusLam = lit(1.0) - lit(lam) // runtime IEEE subtract == oracle's
    val withRel = corpus.withColumn("rel", cos4(typedLit(queryVec), col("v")))
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Seq[Double])]
    var step = 1
    while (step <= k) {
      val maxSim =
        if (picks.isEmpty) lit(0.0)
        else picks.map(p => cos4(typedLit(p._4), col("v")))
          .reduceLeft((a, b) => greatest(a, b))
      val chosenIds = picks.map(_._2).toSeq
      val row = withRel
        .filter(!col("vec_id").isInCollection(chosenIds ++ Seq(-1L)))
        .withColumn("score", lamC * col("rel") - oneMinusLam * maxSim)
        .orderBy(col("score").desc, col("vec_id"))
        .select(col("vec_id"), col("score"), col("v"))
        .limit(1).collect().head
      picks += ((step, row.getLong(0), row.getDouble(1), row.getSeq[Double](2)))
      step += 1
    }
    picks.map(p => (p._1, p._2, p._3)).toSeq.toDF("step", "vec_id", "score")
  }

  private def q138(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    // query = vec 0's embedding; vec 0 itself leaves the pool
    val qv = e.filter(col("vec_id") === 0).select(col("v"))
      .collect().head.getSeq[Double](0)
    mmrSelect(e.filter(col("vec_id") =!= 0), qv, k = 5, lam = 0.7)
      .select(col("step"), col("vec_id"), QueryDef.dec4(col("score")).as("score"))
      .orderBy(col("step"))
  }

  // the oracle unrolls the 5 greedy steps; sel_t = union of picks 1..t
  private val q138Sql = {
    val cos = (a: String, b: String) =>
      s"round(list_inner_product($a, $b) / " +
        s"(sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b))), 4)"
    def step(t: Int): String = {
      val maxSim =
        if (t == 1) "CAST(0 AS DOUBLE)"
        else s"(SELECT max(${cos("s.v", "r.v")}) FROM sel${t - 1} s)"
      val notIn =
        if (t == 1) ""
        else s"WHERE r.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})"
      s"""p$t AS (
         |  SELECT $t AS step, r.vec_id, r.v,
         |    CAST(0.7 AS DOUBLE) * r.rel -
         |      (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * $maxSim AS score
         |  FROM rel r $notIn
         |  ORDER BY score DESC, r.vec_id LIMIT 1),
         |sel$t AS (${(1 to t).map(i => s"SELECT * FROM p$i").mkString(" UNION ALL ")})"""
        .stripMargin
    }
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |rel AS (
       |  SELECT vec_id, v, ${cos("qv", "v")} AS rel
       |  FROM e, q WHERE vec_id <> 0),
       |${(1 to 5).map(step).mkString(",\n")}
       |SELECT step, vec_id,
       |  CAST(CAST(score AS DECIMAL(38,4)) AS VARCHAR) AS score
       |FROM sel5 ORDER BY step""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q138_mmr_select", q138, Some(q138Sql)))
}
