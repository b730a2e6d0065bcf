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
      .withColumn("cos", Similarity.cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("cos"), 4).desc, col("vec_id"))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor"), col("cos"))
  }

  // -- query entry (approximate → rows-only driver check) --------------------
  private def annTop(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    topK(emb, qs, 5)
      .select(col("qid"), col("rank"), col("neighbor"),
        QueryDef.dec4(col("cos")).as("score"))
      .orderBy(col("qid"), col("rank"))
  }

  val defs: Seq[QueryDef] = Seq(QueryDef("ann_lsh_topk", annTop, None))
}
