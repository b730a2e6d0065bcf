package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** END-TO-END curation pipeline: the whole training-data flow chained
  * through the real operators on real testdata — near-dedup →
  * decontamination → quality pruning → language mixture → trainer-shard
  * packing — with a conservation law checked at every stage boundary.
  * This is the composition a user of the engine actually runs; each
  * operator is oracled individually elsewhere, so what THIS spec pins is
  * that the stages compose (schemas line up, filters only ever shrink,
  * nothing double-counts or resurrects).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curate sf0.001 end to end: dedup → decontaminate → prune → mix → shard") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text")).cache()
    val n0 = docs.count()

    // 1. near-duplicate dedup (kept ∪ dropped == input, survivors unique)
    val dd = operators.Dedup.dedupNear(docs, method = "ngram", tau = 0.5)
    val kept1 = dd.kept.select("doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .localCheckpoint()
    val n1 = kept1.count()
    assert(n1 > 0 && n1 <= n0)
    assert(dd.decisions.count() == n0,
      "every input doc needs a keep/drop decision")

    // 2. n-gram decontamination against the q59-style eval slice
    val evalSet = docs.filter(col("doc_id") % 100 === 7)
    val train1 = kept1.filter(col("doc_id") % 100 =!= 7)
    val decon = operators.TextAnalysis.decontaminate(
      train1, evalSet, shingleN = 3)
    val kept2 = train1.join(
      decon.filter(!col("contaminated")).select("doc_id"), Seq("doc_id"))
      .localCheckpoint()
    val n2 = kept2.count()
    assert(decon.count() == train1.count(),
      "decontamination must verdict every training doc")
    assert(n2 > 0 && n2 <= n1)

    // 3. quality pruning: keep the top 75% by classifier score
    val scored = operators.TextAnalysis.classifierScore(kept2)
      .join(kept2.select("doc_id", "lang", "text"), Seq("doc_id"))
    val kept3 = operators.TextAnalysis
      .filterByScoreQuantile(scored.localCheckpoint(), q = 0.25)
      .select(col("doc_id"), col("lang"), col("text"))
      .localCheckpoint()
    val n3 = kept3.count()
    assert(n3 > 0 && n3 <= n2)
    assert(n3 >= (n2 * 0.70).toLong,
      s"a 0.25-quantile prune must keep ~75%: $n3 of $n2")

    // 4. token-budget language mixture
    val mixed = operators.CorpusOps.buildMixture(kept3,
      Map("en" -> 40, "fr" -> 20, "de" -> 20, "es" -> 10, "zh" -> 10),
      budgetTokens = 10000L)
    val kept4 = mixed.filter(col("kept"))
      .select(col("doc_id"), col("text")).localCheckpoint()
    val n4 = kept4.count()
    assert(mixed.count() == n3, "mixture must verdict every pruned doc")
    assert(n4 > 0 && n4 <= n3)

    // 5. trainer shards over the final corpus
    val shards = operators.CorpusOps.packTokenIds(kept4, seqLen = 512)
      .localCheckpoint()
    val totalShardTokens = shards.agg(sum(col("n_tok"))).head().getLong(0)
    val totalDocTokens = kept4
      .select(size(operators.TextAnalysis.bpeTokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0).agg(sum(col("n"))).head().getLong(0)
    assert(totalShardTokens == totalDocTokens,
      "packing must conserve every token of every surviving doc")
    // every sequence is full except possibly the last
    val seqs = shards.select(col("seq_id"), col("n_tok"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(seqs.dropRight(1).forall(_._2 == 512L),
      "only the tail sequence may be short")
    assert(seqs.map(_._2).sum == totalShardTokens)

    info(s"pipeline: $n0 docs → dedup $n1 → decontam $n2 → prune $n3 " +
      s"→ mix $n4 → ${seqs.length} shards of 512 tokens")
    docs.unpersist()
  }
}
