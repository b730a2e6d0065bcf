package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 scale-shape guards for the two plan defects named in the
  * round-12 verdict: q308's inter-arrival lag window must not sort the
  * corpus inside ≤|event types| tasks, and q191's conformal calibration
  * rank must not ride a single-partition global-sort window. Both are
  * asserted on the physical plan AND re-checked for value correctness on
  * planted data (a single hot type spanning many stitch buckets).
  */
class ScaleShapeR13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Long, m: Long = 0): Timestamp =
    new Timestamp(1700000000000L + h * 3600000L + m * 60000L)

  test("q308 plan: the raw-event lag window is (type, bucket)-partitioned") {
    val ev = (0 until 100).map(i => (i.toLong, ts(i), i.toLong, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val df = EventsOps.interArrivalFit(ev)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val lagLines = plan.linesIterator.filter(_.contains("lag(us")).toSeq
    assert(lagLines.nonEmpty, s"no lag window found:\n$plan")
    lagLines.foreach { l =>
      assert(l.contains("bkt"),
        s"raw-event lag window is not bucket-partitioned: $l")
    }
  }

  test("q308: single-type multi-day stress equals the naive per-type sort") {
    // one hot type, 4000 events across ~12 days with irregular gaps and
    // timestamp ties — the shape that used to serialize into one task
    val rnd = new scala.util.Random(13)
    var cur = 0L
    val usList = (0 until 4000).map { _ =>
      cur += (if (rnd.nextInt(10) == 0) 0L else rnd.nextInt(500000).toLong + 1L) * 512L
      cur
    }
    val ev = usList.zipWithIndex.map { case (us, i) =>
      (i.toLong, new Timestamp(1700000000000L + us / 1000), i.toLong, "view")
    }.toDF("user_id", "ts", "event_id", "event_type")
    val row = EventsOps.interArrivalFit(ev)
      .select("n_gaps", "mean_gap_sec", "ks").head()
    // naive: sort all timestamps, adjacent diffs, exact KS over the steps
    val us = ev.select(expr("unix_micros(ts)")).as[Long].collect().sorted
    val gaps = us.zip(us.tail).map { case (a, b) => b - a }
    val n = gaps.length.toDouble
    val sg = gaps.map(BigInt(_)).sum.toDouble
    val byVal = gaps.groupBy(identity).view.mapValues(_.length).toSeq.sortBy(_._1)
    var cum = 0L
    val d = byVal.flatMap { case (g, cnt) =>
      val fe = 1 - math.exp(-g.toDouble * n / sg)
      val below = cum; cum += cnt
      Seq(cum / n - fe, fe - below / n)
    }.max
    assert(row.getLong(0) == gaps.length.toLong)
    assert(math.abs(row.getDouble(2) - d) < 5e-5,
      s"ks ${row.get(2)} vs naive $d")
    // span crosses many day buckets, so the stitch path was exercised
    assert(us.last / EventsOpsTestHooks.gapBucketUs >
      us.head / EventsOpsTestHooks.gapBucketUs + 5)
  }

  test("q191 plan: conformal rank selection uses no Window at all") {
    val df = (0L until 400L).map(i => (i, i % 37, 3 * (i % 37) + i % 11))
      .toDF("k", "x", "y")
    val out = MlEval.conformalInterval(df, "k", "x", "y", alpha = 0.1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(_.trim.startsWith("Window")),
      s"conformalInterval still plans a Window node:\n$plan")
  }

  test("q191: rank-selected q_hat equals the naive sorted-residual pick") {
    val df = (0L until 403L).map(i => (i, i % 41, 5 * (i % 41) + (i * i) % 13))
      .toDF("k", "x", "y")
    val row = MlEval.conformalInterval(df, "k", "x", "y", alpha = 0.2)
      .select("n_cal", "q_hat", "coverage").head()
    // recompute: OLS on splits {1,2}, residual rank on split 3
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tr = rows.filter(t => t._1 % 4 == 1 || t._1 % 4 == 2)
    val nT = tr.length.toDouble
    val sx = tr.map(_._2).sum.toDouble; val sy = tr.map(_._3).sum.toDouble
    val sxy = tr.map(t => t._2 * t._3).sum.toDouble
    val sxx = tr.map(t => t._2 * t._2).sum.toDouble
    val slope = (nT * sxy - sx * sy) / (nT * sxx - sx * sx)
    val icept = (sy - slope * sx) / nT
    def resid(t: (Long, Long, Long)) = math.abs(t._3 - (slope * t._2 + icept))
    val cal = rows.filter(_._1 % 4 == 3).map(t => (resid(t), t._1)).sorted
    val m = math.ceil((cal.length + 1) * 0.8).toInt
    assert(row.getLong(0) == cal.length.toLong)
    assert(math.abs(row.getDouble(1) - cal(m - 1)._1) < 1e-12)
  }
}

/** Exposes the stitch-bucket width to the spec without widening the
  * operator's public surface. */
object EventsOpsTestHooks {
  val gapBucketUs: Long = 86400L * 1000000L
}
