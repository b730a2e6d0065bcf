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
    *
    * Right columns keep their names (non-key names must not collide with
    * left's); unmatched left rows survive with nulls (left join semantics,
    * like the reference-free as-of of q09). `tieBreak` orders equal-time
    * matches deterministically.
    *
    * Scale shape — TIME-BUCKETED candidate generation, not a raw per-key
    * range join. A naive `keys ∧ rightTime <= leftTime` join materializes
    * every (left × earlier-right) pair per key: a power-law user with 10⁵
    * events makes 10¹⁰ pairs on one key. Instead:
    *   1. pair left rows only with right rows in the SAME time bucket
    *      (bucket = floor(time / bucketSize));
    *   2. reduce each (key, bucket) to its single best (latest) right row;
    *      later buckets strictly dominate earlier ones, so each left row's
    *      only other viable candidate is the latest best at-or-before its
    *      bucket — picked up by one ordered pass per key (a window over
    *      left rows ∪ bucket bests, O(n log n), never O(n²));
    *   3. union both candidate sets, keep rank 1 per left row.
    * `bucketSize` is in the time column's units after a double cast (seconds
    * for timestamps): size it near the typical inter-event spacing — small
    * buckets are cheap (the carry pass does the work), oversized buckets
    * degrade toward the quadratic in-bucket join. */
  def asofBackward(left: DataFrame, right: DataFrame, byKeys: Seq[String],
      leftTime: String, rightTime: String, tieBreak: String,
      strict: Boolean = false, bucketSize: Double = 3600.0): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val collisions = right.columns.toSet
      .intersect(left.columns.toSet).diff(byKeys.toSet)
    require(collisions.isEmpty,
      s"non-key column names must be disjoint, both sides have: $collisions")
    // unique left-row handle for the dedup window; used only internally
    val l = left.withColumn("__asof_id", monotonically_increasing_id())
      .withColumn("__lb", floor(col(leftTime).cast("double") / bucketSize))
    // rename the right by-keys: left and right often share lineage (self
    // as-of), where identical attribute ids make post-join drops ambiguous
    val r0 = byKeys.foldLeft(right)((df, k) => df.withColumnRenamed(k, s"__asof_$k"))
    val rKeyCols = byKeys.map(k => s"__asof_$k")
    val r = r0.withColumn("__rb", floor(col(rightTime).cast("double") / bucketSize))

    // 1. same-bucket candidate pairs (the only place raw pairs exist)
    val boundIn = if (strict) r(rightTime) < l(leftTime)
      else r(rightTime) <= l(leftTime)
    val inBucket = l.join(r,
      byKeys.map(k => l(k) === r(s"__asof_$k")).reduce(_ && _) &&
        l("__lb") === r("__rb") && boundIn, "inner")
      .drop("__rb")

    // 2. best right row per (key, bucket), by the final selection order
    val wBest = Window.partitionBy((rKeyCols :+ "__rb").map(col): _*)
      .orderBy(col(rightTime).desc, col(tieBreak).desc)
    val rStruct = struct(r0.columns.map(col): _*)
    val bests = r.withColumn("__brn", row_number().over(wBest))
      .filter(col("__brn") === 1)
      .select(byKeys.map(k => col(s"__asof_$k").as(k)) ++ Seq(
        col("__rb").as("__bucket"), lit(0).as("__is_left"),
        rStruct.as("__rbest"), lit(null).cast("long").as("__asof_id")): _*)
    val rbestType = bests.schema("__rbest").dataType

    // 3. ordered pass per key: each left row picks up the latest best of a
    //    STRICTLY EARLIER bucket (left rows sort before bests within their
    //    own bucket — a same-bucket best may postdate the left time and must
    //    not shadow an earlier bucket's true match; same-bucket candidates
    //    all come from the in-bucket join). Strictly-earlier rows satisfy
    //    the time bound by construction.
    val lefts = l.select(byKeys.map(col) ++ Seq(
      col("__lb").as("__bucket"), lit(1).as("__is_left"),
      lit(null).cast(rbestType).as("__rbest"), col("__asof_id")): _*)
    val wCarry = Window.partitionBy(byKeys.map(col): _*)
      .orderBy(col("__bucket"), col("__is_left").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = bests.unionByName(lefts)
      .withColumn("__carry", last(col("__rbest"), ignoreNulls = true).over(wCarry))
      .filter(col("__is_left") === 1 && col("__carry").isNotNull)
      .select(col("__asof_id").as("__carry_id"), col("__carry"))
    val carryCand = l.join(carried, l("__asof_id") === col("__carry_id"))
      .select(col("*"), col("__carry.*"))
      .drop("__carry", "__carry_id")
    val boundCarry = if (strict) col(rightTime) < col(leftTime)
      else col(rightTime) <= col(leftTime)

    // 4. rank 1 per left row over both candidate sets; unmatched lefts
    //    survive through the final left join
    val candidates = inBucket.unionByName(carryCand.filter(boundCarry))
    val w = Window.partitionBy(col("__asof_id"))
      .orderBy(col(rightTime).desc, col(tieBreak).desc)
    val winners = candidates
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .select((col("__asof_id").as("__win_id") +:
        r0.columns.filterNot(rKeyCols.contains).map(col)): _*)
    l.join(winners, l("__asof_id") === col("__win_id"), "left")
      .drop("__asof_id", "__win_id", "__lb")
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
