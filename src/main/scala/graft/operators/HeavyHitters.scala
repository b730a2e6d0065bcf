package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters — the bounded-memory top-token summary for
  * streams and single-pass scans where even the map-side-combined exact
  * groupBy is unwanted (per-executor vocabulary too large, or a strict
  * memory ceiling). One MG summary of capacity k guarantees, after seeing
  * n items: trueCount − n/(k+1) ≤ estimate ≤ trueCount, and every item
  * with frequency > n/(k+1) is present. Summaries are MERGEABLE (Agarwal
  * et al., "Mergeable Summaries", PODS 2012): sum matching counters, then
  * subtract the (k+1)-th largest counter and drop non-positives — the
  * merged summary keeps the same error bound with n = n₁ + n₂.
  *
  * Scale shape: one pass per partition building a k-entry map (imperative
  * per-partition logic — the documented legitimate RDD use), then a tree
  * reduce over P summaries of ≤ k entries each. Nothing shuffles; the
  * result is model-sized by construction.
  *
  * Exactness contract: when k ≥ the number of distinct items in EVERY
  * partition, no decrement ever fires and the summary equals the exact
  * counts — that regime is oracled (q171); the error law at small k and
  * merge associativity are spec-pinned (HeavyHittersSpec).
  */
object HeavyHitters {

  type Summary = Map[String, Long]

  /** One partition's MG pass at capacity `k`. */
  private[operators] def mgOfPartition(items: Iterator[String], k: Int): Summary = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    items.foreach { x =>
      if (m.contains(x)) m(x) += 1
      else if (m.size < k) m(x) = 1
      else {
        // decrement ALL k counters (implicitly pairing this item with one
        // occurrence of each); drop zeros
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        m.keysIterator.foreach { key =>
          val v = m(key) - 1
          if (v == 0) dead += key else m(key) = v
        }
        dead.foreach(m.remove)
      }
    }
    m.toMap
  }

  /** Mergeable-summaries combine: counter sum, then reduce back to ≤ k
    * entries by subtracting the (k+1)-th largest counter. Deterministic:
    * survivors are strictly above the pivot; equal-to-pivot entries go to
    * zero and drop, so no tie needs breaking. */
  private[operators] def mergeMg(a: Summary, b: Summary, k: Int): Summary = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L))).toMap
    if (summed.size <= k) summed
    else {
      val pivot = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.iterator.map { case (key, v) => key -> (v - pivot) }
        .filter(_._2 > 0).toMap
    }
  }

  /** MG summary of a string column: ≤ k (item, estimate) pairs. The
    * per-partition pass is the only corpus-sized work; the reduce combines
    * P ≤k-entry maps. */
  def summarize(items: DataFrame, colName: String, k: Int): Summary = {
    val ds = {
      val s = items.sparkSession
      import s.implicits._
      items.select(col(colName).cast("string")).as[String]
    }
    ds.rdd
      .mapPartitions(it => Iterator(mgOfPartition(it, k)))
      .treeReduce((a, b) => mergeMg(a, b, k))
  }

  // ==== q171: heavy tokens in the exact (k ≥ distinct) regime ===============
  //
  // k = 512 dominates any partition's distinct-token count in the test
  // corpora, so the summary IS the exact count table and the oracle is a
  // plain GROUP BY — certifying the pass + merge plumbing end-to-end. The
  // approximate regime (the 100 TB mode) is the spec'd error law, not an
  // oracle row, because the estimate depends on partitioning.

  private def q171(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(explode(Tok.ws(col("text"))).as("t"))
    val top = summarize(toks, "t", k = 512).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(20)
    top.toDF("token", "est_count")
  }

  private val q171Sql =
    """SELECT t AS token, CAST(count(*) AS BIGINT) AS est_count
      |FROM (SELECT unnest(list_filter(string_split(text, ' '),
      |  x -> x <> '')) AS t FROM documents)
      |GROUP BY 1 ORDER BY count(*) DESC, t LIMIT 20""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q171_heavy_hitters", q171, Some(q171Sql)))
}
