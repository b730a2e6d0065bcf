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
    * salt is a deterministic hash of the large side's whole row, so replays
    * and retries land identically. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
