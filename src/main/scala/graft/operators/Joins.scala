package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable join operators beyond Spark's built-in set (SURVEY.md §2 B8/B9).
  *
  * Both compose existing operators (preference order (a) of the build
  * rules): the equi part of the condition carries the shuffle, so neither
  * ever degrades to a broadcast-nested-loop over the full inputs.
  */
object Joins {

  /** As-of join: for each left row, the single most recent right row with
    * `rightTime <= leftTime` (backward direction), matched within `byKeys`.
    * Implementation: equi-join on the by-keys with the time bound as a join
    * predicate, then a window picks the latest match per left row —
    * only per-key candidate pairs ever exist.
    *
    * Right columns keep their names; unmatched left rows survive with nulls
    * (left join semantics, like the reference-free as-of of q09).
    *
    * `tieBreak` orders equal-time matches deterministically. */
  def asofBackward(left: DataFrame, right: DataFrame, byKeys: Seq[String],
      leftTime: String, rightTime: String, tieBreak: String,
      strict: Boolean = false): DataFrame = {
    // unique left-row handle for the dedup window; used only internally
    val l = left.withColumn("__asof_id", monotonically_increasing_id())
    // rename the right by-keys: left and right often share lineage (self
    // as-of), where identical attribute ids make post-join drops ambiguous
    val r = byKeys.foldLeft(right)((df, k) => df.withColumnRenamed(k, s"__asof_$k"))
    val bound = if (strict) r(rightTime) < l(leftTime)
      else r(rightTime) <= l(leftTime)
    val cond = byKeys.map(k => l(k) === r(s"__asof_$k")).reduce(_ && _) && bound
    val joined = l.join(r, cond, "left")
    val w = Window.partitionBy(col("__asof_id"))
      .orderBy(r(rightTime).desc_nulls_last, r(tieBreak).desc_nulls_last)
    joined.withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_id" +: "__asof_rn" +: byKeys.map(k => s"__asof_$k"): _*)
  }

  /** As-of join, FORWARD direction with an optional tolerance: for each
    * left row, the single earliest right row with `rightTime >= leftTime`
    * (or `>` when strict) and, when `toleranceSec` is set,
    * `rightTime <= leftTime + tolerance` (tolerance requires TIMESTAMP time
    * columns). Same candidate-bounded plan as the backward variant: the
    * equi by-keys carry the shuffle, a window picks the earliest match per
    * left row. */
  def asofForward(left: DataFrame, right: DataFrame, byKeys: Seq[String],
      leftTime: String, rightTime: String, tieBreak: String,
      strict: Boolean = false, toleranceSec: Option[Long] = None): DataFrame = {
    val l = left.withColumn("__asof_id", monotonically_increasing_id())
    val r = byKeys.foldLeft(right)((df, k) => df.withColumnRenamed(k, s"__asof_$k"))
    val lower = if (strict) r(rightTime) > l(leftTime)
      else r(rightTime) >= l(leftTime)
    val bound = toleranceSec match {
      case Some(s) =>
        lower && r(rightTime) <= l(leftTime) + expr(s"INTERVAL $s SECOND")
      case None => lower
    }
    val cond = byKeys.map(k => l(k) === r(s"__asof_$k")).reduce(_ && _) && bound
    val joined = l.join(r, cond, "left")
    val w = Window.partitionBy(col("__asof_id"))
      .orderBy(r(rightTime).asc_nulls_last, r(tieBreak).asc_nulls_last)
    joined.withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_id" +: "__asof_rn" +: byKeys.map(k => s"__asof_$k"): _*)
  }

  /** Range (band) join: equi on `eqKeys`, plus `lowerCol <= upperCol` range
    * predicates evaluated on the equi-joined pairs. */
  def bandJoin(left: DataFrame, right: DataFrame, eqKeys: Seq[String],
      rangePred: Column): DataFrame = {
    val cond = eqKeys.map(k => left(k) === right(k)).reduce(_ && _) && rangePred
    left.join(right, cond)
  }
}
