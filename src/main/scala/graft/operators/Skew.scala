package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md "salting for skew").
  *
  * AQE's skew-join handling covers sort-merge joins it can observe; salting
  * is the explicit fallback when one join key dominates (the classic
  * power-law key in training corpora — one `source`, one `lang`, one hot
  * document cluster). The hot side's rows scatter across `buckets`
  * sub-keys; the other side replicates `buckets`-fold. Correctness is
  * unchanged — only the shuffle layout widens.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, with the large side salted. The
    * salt comes from a per-row id, NOT a row-content hash: hot keys in
    * training corpora are usually exact duplicate rows, and a content hash
    * would put them all in one bucket — exactly the skew being mitigated.
    * The salt value never affects the join RESULT (any bucket matches the
    * replicated small side), so the id's nondeterminism across retries is
    * harmless.
    *
    * Sizing `buckets`: a hot key reaches at most min(buckets, reducers)
    * reducers, and the (key, salt) combos land on reducers by hash — so
    * when reducers is small, use buckets >> reducers to fill them evenly
    * (SkewSpec demonstrates 64 buckets over 4 reducers); when reducers is
    * large (a real cluster's 2000), a modest 8–16 buckets already puts
    * each salt on its own reducer with high probability, at the cost of
    * replicating `small` that many times. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
