package graft.operators

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized IVF layout (SURVEY.md §2 B31 scale path): the corpus
  * written PARTITIONED BY (cell) must (a) return exactly the same top-k as
  * the in-memory probe path, and (b) prove in the physical plan that a
  * search reads only the probed partition directories.
  */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    .cache()

  test("materialized cell partitioning: same results, pruned scan") {
    val centroids = AnnIvf.trainCentroids(emb, k = 8)
    val dir = Files.createTempDirectory("graft_ivf").toString
    AnnIvf.writeIndex(emb, centroids, dir)

    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val live = AnnIvf.topK(emb, qs, 5, centroids, nprobe = 2)
      .orderBy("qid", "rank").collect()
    val indexed = AnnIvf.topKIndexed(spark, dir, qs, 5, centroids, nprobe = 2)
    val got = indexed.orderBy("qid", "rank").collect()
    assert(got.map(_.toString).toSeq == live.map(_.toString).toSeq)

    // the probe predicate reaches the scan as a partition filter: only the
    // probed cell directories are touched, not the whole index
    indexed.collect()
    val plan = indexed.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell#"))
      .getOrElse("")
    assert(scanLine.nonEmpty, s"no partition filter on cell in any scan:\n$plan")
    assert(scanLine.matches(".*PartitionFilters: \\[[^\\]]*cell#.*"),
      s"probe cells not pushed as partition filter:\n$scanLine")
  }

  test("pruned read touches only the probed directories on disk") {
    val centroids = AnnIvf.trainCentroids(emb, k = 8)
    val dir = Files.createTempDirectory("graft_ivf2").toString
    AnnIvf.writeIndex(emb, centroids, dir)
    // reading one cell's worth must scan fewer files than the full index
    val all = spark.read.parquet(dir)
    val one = all.filter(col("cell") === 0)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().map(_.metrics
        .get("numFiles").map(_.value).getOrElse(0L)).sum
    }
    val fOne = filesRead(one)
    val fAll = filesRead(all)
    assert(fOne > 0 && fOne < fAll, s"one-cell read scanned $fOne of $fAll files")
  }
}
