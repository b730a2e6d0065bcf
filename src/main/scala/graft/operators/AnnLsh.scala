package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbors via random-hyperplane LSH — the scale path
  * for embedding similarity (SURVEY.md §2 B31 "IVF or LSH-bucketed variant").
  *
  * Sign-random-projection: bucket(v) = bits of sign(v·r_i) for `bits` fixed
  * hyperplanes (deterministic seed). Neighbor candidates = corpus vectors in
  * the query's bucket or any 1-bit-flipped probe bucket (multi-probe), then
  * exact cosine re-rank. The corpus is scanned once to bucket it; lookups
  * join on the short bucket key — no O(corpus × queries) pair space.
  */
object AnnLsh {

  /** Deterministic unit-free hyperplanes: bits × dim gaussians, seed fixed —
    * every run and every engine instance derives identical buckets. */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotProduct(a, b)

  /** LSH bucket id of a double-array column. */
  def bucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-probe keys: the bucket itself plus every 1-bit flip. */
  def probeKeys(bucketCol: Column, bits: Int): Column =
    array(bucketCol +: (0 until bits).map(i =>
      bucketCol.bitwiseXOR(lit(1L << i))): _*)

  /** ANN top-k: bucket the corpus, explode query probes, equi-join on bucket,
    * exact cosine re-rank within candidates.
    *
    * corpus: (vec_id, v: array<double>); queries: (qid, qv: array<double>).
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(bits, dim)
    val bucketed = corpus.withColumn("bucket", bucket(col("v"), planes))
    val probed = queries
      .withColumn("bucket", explode(probeKeys(bucket(col("qv"), planes), bits)))
    val candidates = probed.join(bucketed, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qv"), col("vec_id"), col("v")).distinct()
      // guarded: bucket candidates are whatever the probed buckets hold —
      // a zero vector must score -2, not trip ANSI DIVIDE_BY_ZERO
      .withColumn("cos", Similarity.cosineGuarded(col("qv"), col("v")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("cos"), 4).desc, col("vec_id"))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor"), col("cos"))
  }

  // -- query entry (driver-gated oracle) -------------------------------------
  //
  // ANN results are hyperplane-seed-dependent, so the raw neighbor list can't
  // be DuckDB-reproduced. The oracle instead gets a hard recall gate: each
  // query vector's EXACT copy is planted into the corpus at vec_id+PlantOffset —
  // identical vectors share every hyperplane sign, so the planted copy (and
  // any organic exact duplicate, which hashes to the very same bucket) is in
  // the query's probed buckets with certainty, and the rank-1 neighbor MUST
  // score cosine 1.0000. The top neighbor's identity is deliberately not
  // asserted: a replicated corpus (the 10× stress set) has organic exact
  // copies that tie at 1.0 and win the id tie-break over the plant.
  // recall_ok additionally demands overlap with the exact brute-force top-5
  // on the same corpus (identical rounded-score ordering on both sides).
  /** The gate's shared inputs: (augmented corpus, query vectors) — the
    * corpus with each query vector re-planted under `PlantOffset` so the
    * recall check has a known exact hit. Factored out (round 15) so the
    * bench's lifecycle/probe split times the SAME corpus the declared
    * queries run on. */
  private[graft] def gateInputs(s: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val emb = graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val aug = emb.unionByName(
      qs.select((col("qid") + Dedup.PlantOffset).as("vec_id"), col("qv").as("v")))
    (aug, qs)
  }

  private[operators] def annRecallGate(
      topKOf: (DataFrame, DataFrame) => DataFrame,
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val (aug, qs) = gateInputs(s, dir)
    val ann = topKOf(aug, qs)
    val brute = Similarity.bruteForceTopK(aug, qs, 5)
      .select(col("qid"), col("vec_id").as("neighbor"))
    // ONE pass over the ann result: referencing its plan from several
    // aggregations re-executes the whole candidate subtree per reference
    // (3x the ANN cost before this was collapsed). rank is unique per qid,
    // so min_by picks the rank-1 row exactly.
    ann.join(brute.withColumn("__hit", lit(1)), Seq("qid", "neighbor"), "left")
      .groupBy(col("qid")).agg(
        QueryDef.dec4(min_by(col("cos"), col("rank"))).as("top_score"),
        (count(lit(1)) === 5).as("n_results_ok"),
        (sum(coalesce(col("__hit"), lit(0))) >= 1).as("recall_ok"))
      .orderBy(col("qid"))
  }

  private[operators] val annGateSql =
    """SELECT vec_id AS qid,
      |  '1.0000' AS top_score, true AS n_results_ok, true AS recall_ok
      |FROM embeddings WHERE vec_id < 5 ORDER BY qid""".stripMargin

  private def annTop(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    annRecallGate((corpus, qs) => topK(corpus, qs, 5), s, dir)

  val defs: Seq[QueryDef] = Seq(QueryDef("ann_lsh_topk", annTop, Some(annGateSql)))
}
