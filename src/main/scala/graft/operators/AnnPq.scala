package graft.operators

import graft.functions.VectorExprs.{dotProduct, pqDot, pqEncode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the third ANN storage tier (float 1× → int8 ~8× → PQ ~64×).
  *
  * Product quantization splits each d-dim vector into `m` contiguous
  * subvectors and stores only the index of each subvector's nearest
  * codebook centroid — m BYTES per vector. A 100 TB float corpus becomes a
  * ~1.5 TB index that still answers top-k: search scores candidates with
  * asymmetric distance (full-precision query against the code-by-code
  * reconstruction, never materialized), keeps a small multiple of k, and
  * re-ranks those exactly against the primary corpus — the same
  * probe-pruned cell layout and re-rank contract as the int8 tier
  * ([[AnnIvf.topKQuantized]]).
  *
  * Training is two-level, each level placed where it belongs at scale:
  * codebooks fit in kilobytes and train on a BOUNDED sample with plain
  * driver-side Lloyd iterations (O(sample·ksub·iters) on ≤ `sampleN`
  * rows — deliberately not a distributed job; the sample collect is the
  * only corpus touch), while ENCODING — the corpus-sized pass — is one
  * distributed map over the scan via the native [[graft.functions.PqEncode]]
  * kernel. Cell geometry reuses [[AnnIvf]] centroids, so the quantizers
  * compose with every existing index path.
  */
object AnnPq {

  /** Deterministic seeded local k-means (Lloyd): init = first k points in
    * seeded-hash order, empty clusters keep their previous centroid, ties
    * to the lower index. Runs on a bounded sample only. */
  private[operators] def kmeansLocal(pts: Array[Array[Double]], k: Int,
      iters: Int, seed: Long): Array[Array[Double]] = {
    require(pts.nonEmpty, "PQ codebook training requires a non-empty sample")
    val dim = pts(0).length
    // distinct BY VALUE (Array equality is reference equality): the
    // replicated stress corpus puts ~10 value-identical copies of each
    // vector in the sample, and duplicate init centroids would leave
    // permanently-empty clusters (ties break to the lower index)
    val init = pts.zipWithIndex
      .sortBy { case (_, i) => graft.functions.SketchHash.fmix64(seed ^ i.toLong) }
      .map(_._1).distinctBy(_.toSeq).take(k)
    var cents = init ++ Array.fill(math.max(0, k - init.length))(init.head)
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      pts.foreach { p =>
        var best = 0
        var bd = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = p(i) - cents(c)(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  /** Per-subvector codebooks: codebooks(j)(c) = centroid c of subvector j.
    * m must divide the dimension; ksub ≤ 256 (codes are one byte). */
  def trainCodebooks(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
      sampleN: Int = 2048, iters: Int = 10,
      seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(ksub > 0 && ksub <= 256, s"ksub must fit one byte: $ksub")
    val sample = corpus.select(col("vec_id"), col("v"))
      .orderBy(xxhash64(lit(seed), col("vec_id"))).limit(sampleN)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PQ training requires a non-empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dimension $dim does not divide into $m subvectors")
    val sub = dim / m
    Array.tabulate(m) { j =>
      kmeansLocal(
        sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub)),
        ksub, iters, seed + j)
    }
  }

  /** The PQ index rows for a (vec_id, v) frame: (vec_id, codes, vnorm,
    * cell) — m code bytes + the ORIGINAL vector's norm. The true norm
    * (not the reconstruction's) is stored deliberately: it is the right
    * denominator for the approximate cosine, it is exactly 0 for a zero
    * vector so the search guard actually fires (a reconstruction norm
    * never is — the nearest centroids of a zero vector are nonzero), and
    * it falls out of the v column already in hand at encode time. Pure
    * map-side; shared by batch build and any incremental append. */
  def encodeAssign(corpus: DataFrame, centroids: Array[Seq[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    AnnIvf.assignCells(corpus, centroids)
      .withColumn("codes", pqEncode(col("v"), codebooks))
      .select(col("vec_id"), col("codes"),
        sqrt(dotProduct(col("v"), col("v"))).as("vnorm"), col("cell"))

  /** Materialize the PQ index cell-partitioned, same layout discipline as
    * [[AnnIvf.writeIndex]]. */
  def writeIndex(corpus: DataFrame, centroids: Array[Seq[Double]],
      codebooks: Array[Array[Array[Double]]], path: String): Unit =
    encodeAssign(corpus, centroids, codebooks)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** ANN top-k over the PQ index: probe cells pushed as static partition
    * filters, asymmetric-distance approximate cosine, rerank·k survivors,
    * exact full-precision re-rank against the primary corpus. Replay
    * duplicates and zero norms handled exactly as the int8 tier. */
  def topK(spark: SparkSession, indexPath: String, queries: DataFrame,
      corpus: DataFrame, k: Int, centroids: Array[Seq[Double]],
      codebooks: Array[Array[Array[Double]]], nprobe: Int = 3,
      rerank: Int = 8): DataFrame = {
    val queryCells = AnnIvf.assignProbes(queries, centroids, nprobe)
      .withColumn("qn", sqrt(dotProduct(col("qv"), col("qv"))))
    val probed = queryCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0))
    val cells = spark.read.parquet(indexPath)
      .filter(col("cell").isin(probed.map(Int.box): _*))
    val approx = queryCells.join(cells, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("ascore",
        when(col("vnorm") === 0.0 || col("qn") === 0.0, lit(-2.0)).otherwise(
          pqDot(col("qv"), col("codes"), codebooks) /
            (col("qn") * col("vnorm"))))
    AnnIvf.rerankExact(approx, corpus, k, rerank)
  }

  // -- query entry (driver-gated oracle, see AnnLsh.annRecallGate) -----------
  //
  // The planted exact copy assigns to its seed's cell, its PQ codes equal
  // the seed's codes (same values through the same encoder), its
  // asymmetric score is within quantization error of the query's
  // self-similarity — comfortably inside the rerank·k cut — and the exact
  // re-rank must then place it at rank 1, cosine 1.0000.
  private def pqTop(s: SparkSession, dir: String): DataFrame =
    AnnLsh.annRecallGate({ (corpus, qs) =>
      val c = corpus.cache()
      try {
        val centroids = AnnIvf.trainCentroids(c, k = 16)
        val codebooks = trainCodebooks(c, m = 8, ksub = 16)
        val indexPath = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_pq_index").toString
        writeIndex(c, centroids, codebooks, indexPath)
        topK(s, indexPath, qs, c, 5, centroids, codebooks, nprobe = 3)
          .localCheckpoint()
      } finally c.unpersist()
    }, s, dir)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ann_pq_topk", pqTop, Some(AnnLsh.annGateSql)))
}
