package graft.streaming

import graft.TestSpark
import graft.operators.{Clustering, LangId}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B300: streaming cluster-mix PSI monitor — B296's centroid assignment
  * composed inside the drift-audit loop. Laws: per-batch rows are
  * row-for-row equal to a direct batch computation (the B190s/B220s/B286
  * parity discipline), an in-mix batch stays under the alarm line, and a
  * single-cluster flood trips it. */
class ClusterMixStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private def pt(axis: Int, off: Double): Seq[Float] =
    Seq.tabulate(dim)(i => (if (i == axis) 0.2 + off else off / 2).toFloat)

  /** Training corpus: two tight blobs on orthogonal axes. */
  private lazy val train: Seq[(Long, Seq[Float])] =
    (0 until 6).map(i => (100L + i, pt(0, i * 1e-3))) ++
      (0 until 6).map(i => (200L + i, pt(1, i * 1e-3)))

  test("B300: cluster-mix monitor — batch parity, stable mix quiet, flood alarms") {
    val tmp = java.nio.file.Files.createTempDirectory("clustermix").toString
    val cents = Clustering.lloyd(
      Clustering.intVecs(train.toDF("vec_id", "embedding")), k = 2, iters = 2)
    // which cell is blob A's? label the reference mix with real cell ids
    val cellOf = Clustering.withCellDist(
      Clustering.intVecs(train.toDF("vec_id", "embedding")), cents)
      .select(col("id"), col("cell")).as[(Long, Int)].collect().toMap
    val (cellA, cellB) = (cellOf(100L), cellOf(200L))
    val refMix = Seq((cellA, 50L), (cellB, 50L)).toDF("cell", "cnt")
      .localCheckpoint()
    // batch 0: balanced (2 from each blob); batch 1: all-blob-A flood
    val batches = Seq(
      Seq((300L, pt(0, 7e-3)), (301L, pt(0, 8e-3)),
        (310L, pt(1, 7e-3)), (311L, pt(1, 8e-3))),
      (0 until 4).map(i => (320L + i, pt(0, (9 + i) * 1e-3))))
    val in = MemoryStream[(Long, Seq[Float])](spark)
    val q = DriftStreaming.startClusterMixMonitor(
      in.toDF().toDF("vec_id", "embedding"), cents, refMix,
      thresholdMicro = 200000L, outPath = s"$tmp/mix",
      checkpoint = s"$tmp/ck")
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.read.parquet(s"$tmp/mix")
      .select("batch_id", "n_batch", "n_cells", "psi_micro", "alarm")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rows.length == 2, rows.toSeq.toString)
    // row-for-row parity with the direct batch computation
    batches.zipWithIndex.foreach { case (b, i) =>
      val cells = Clustering.withCellDist(
        Clustering.intVecs(b.toDF("vec_id", "embedding")), cents)
        .groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
        .select(col("cell").cast("string").as("lang"), col("cnt"))
      val direct = LangId.langMixPsi(cells,
        refMix.select(col("cell").cast("string").as("lang"), col("cnt")))
        .select(col("psi_micro")).head().getLong(0)
      assert(rows(i)._4 == direct, s"batch $i: ${rows(i)._4} vs $direct")
    }
    assert(rows(0)._2 == 4L && rows(1)._2 == 4L)
    assert(!rows(0)._5, s"stable mix alarmed: ${rows(0)}")
    assert(rows(1)._5, s"flood did not alarm: ${rows(1)}")
  }
}
