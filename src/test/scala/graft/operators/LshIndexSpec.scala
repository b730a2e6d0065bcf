package graft.operators

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized LSH index: incremental near-dup of arriving batches
  * against an indexed corpus must equal the from-scratch run over the
  * union (same signature pipeline ⇒ same band collisions), and appended
  * batches must become findable.
  */
class LshIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val tau = 0.6

  /** A ~1-token mutation of a doc's text (keeps Jaccard high). */
  private def mutate(text: String): String = {
    val toks = text.split(" ").filter(_.nonEmpty)
    (toks.take(1) ++ Array("zzmutated") ++ toks.drop(2)).mkString(" ")
  }

  test("incremental probe == from-scratch candidates over the union, at tau") {
    val corpus = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).cache()
    val path = Files.createTempDirectory("graft_lsh_idx").toString
    Dedup.writeLshIndex(corpus, path)
    // batch: 10 near-copies of indexed docs + 3 fresh unrelated docs
    val seeds = corpus.filter(col("doc_id") < 10)
      .as[(Long, String)].collect().toSeq
    val batch = (seeds.map { case (id, t) => (id + 5000000L, mutate(t)) } ++
      Seq((9000001L, "entirely fresh nothing shared alpha beta gamma delta"),
        (9000002L, "another novel document with its own words entirely"),
        (9000003L, "qq ww ee rr tt yy uu ii oo pp aa ss dd ff")))
      .toDF("doc_id", "text").cache()
    try {
      val viaIndex = Dedup.nearDupAgainstIndex(spark, path, batch, tau)
        .select(col("doc_id"), col("dup_of"), round(col("jaccard"), 6))
        .collect().map(_.toString).sorted.toSeq
      // from-scratch over the union, restricted to (batch, corpus) pairs
      val union = corpus.unionByName(batch)
      val scratch = Dedup.minhashCandidates(union)
        .filter(col("jaccard") >= tau)
        .filter((col("doc_a") >= 5000000L) =!= (col("doc_b") >= 5000000L))
        .select(
          greatest(col("doc_a"), col("doc_b")).as("doc_id"),
          least(col("doc_a"), col("doc_b")).as("dup_of"),
          round(col("jaccard"), 6))
        .collect().map(_.toString).sorted.toSeq
      assert(viaIndex == scratch,
        "probing the index must equal the from-scratch union run")
      // every planted near-copy found its seed; fresh docs matched nothing
      val hits = Dedup.nearDupAgainstIndex(spark, path, batch, tau)
        .select(col("doc_id"), col("dup_of")).as[(Long, Long)].collect().toSet
      seeds.foreach { case (id, _) =>
        assert(hits.contains((id + 5000000L, id)),
          s"mutated copy of doc $id missed its seed")
      }
      assert(!hits.exists(_._1 >= 9000000L), "a fresh doc false-matched")
    } finally { corpus.unpersist(); batch.unpersist() }
  }

  test("append admits a batch: its docs are findable by the NEXT batch") {
    val corpus = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 50).cache()
    val path = Files.createTempDirectory("graft_lsh_idx2").toString
    Dedup.writeLshIndex(corpus, path)
    val batch1 = Seq((6000001L,
      "a wholly new accepted document about spark shuffles and joins"))
      .toDF("doc_id", "text")
    // batch1 is clean against the index → accept it (append)
    assert(Dedup.nearDupAgainstIndex(spark, path, batch1, tau).count() == 0)
    Dedup.writeLshIndex(batch1, path, mode = "append")
    // batch2 near-duplicates batch1's doc — ONLY findable if append worked
    val batch2 = Seq((7000001L,
      "a wholly new accepted document about spark shuffles and filters"))
      .toDF("doc_id", "text")
    val hit = Dedup.nearDupAgainstIndex(spark, path, batch2, tau)
      .select(col("dup_of")).as[Long].collect().toSeq
    assert(hit == Seq(6000001L),
      s"appended doc must be probe-visible to later batches: $hit")
    corpus.unpersist()
  }

  test("the probe join broadcasts the batch; the index side never shuffles") {
    val corpus = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val path = Files.createTempDirectory("graft_lsh_idx3").toString
    Dedup.writeLshIndex(corpus, path)
    val batch = Seq((8000001L, "some probe text alpha beta"))
      .toDF("doc_id", "text")
    val df = Dedup.nearDupAgainstIndex(spark, path, batch, tau)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"batch probes must broadcast:\n${plan.take(1500)}")
  }
}
