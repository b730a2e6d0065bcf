package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 profiling/events laws: FD audit, HBOS, sequential pair support. */
class ProfilingR9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fdAudit: keys hold, violated FDs counted exactly") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "b", 20L),
      (4L, "b", 30L), (4L, "b", 30L)) // id 4 repeats with SAME dep
      .toDF("id", "grp", "v")
    val got = Profiling.fdAudit(df, Seq("id" -> "v", "grp" -> "v", "v" -> "grp"))
      .as[(String, String, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // id → v: holds (repeated id maps to one v); 4 determinant values
    assert(got(("id", "v")) == ((4L, 0L, 1L, true)))
    // grp → v: 'b' maps to {20, 30} — one violating determinant of 2 deps
    assert(got(("grp", "v")) == ((2L, 1L, 2L, false)))
    // v → grp: holds (10→a, 20→b, 30→b)
    assert(got(("v", "grp")) == ((3L, 0L, 1L, true)))
  }

  test("hbosOutliers: the isolated point scores highest") {
    // 99 points in one tight cell + 1 far outlier on both features
    val rows = (1L to 99L).map(i => (i, 10L, 10L)) :+ ((100L, 1000L, 1000L))
    val got = Profiling.hbosOutliers(
      rows.toDF("id", "f1", "f2"), "id", Seq("f1", "f2"), buckets = 8, k = 3)
      .as[(Long, Long)].collect()
    assert(got.head._1 == 100L)
    // outlier bin freq 1 on both features: score = 2·⌊ln(100)·1e6⌋
    assert(got.head._2 == 2L * math.floor(math.log(100.0) * 1e6).toLong)
    // everyone else sits in the dense bin: ln(100/99) on both features
    assert(got(1)._2 == 2L * math.floor(math.log(100.0 / 99.0) * 1e6).toLong)
  }

  test("sequencePairSupport equals the naive exists-join") {
    val rnd = new scala.util.Random(23)
    val events = (1 to 1500).map { i =>
      (rnd.nextInt(40).toLong, s"t${rnd.nextInt(4)}",
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          1700000000L + rnd.nextInt(100000))))
    }
    val df = events.toDF("user_id", "event_type", "ts")
    val got = EventsOps.sequencePairSupport(df)
      .select(col("first_type"), col("then_type"), col("n_users"))
      .as[(String, String, Long)].collect().toSet
    val naive = (for {
      (u, rows) <- events.groupBy(_._1).toSeq
      a <- rows.map(_._2).distinct; b <- rows.map(_._2).distinct
      if a != b
      if rows.exists(x => x._2 == a && rows.exists(y =>
        y._2 == b && x._3.getTime < y._3.getTime))
    } yield (a, b, u)).groupBy(t => (t._1, t._2))
      .map { case ((a, b), v) => (a, b, v.size.toLong) }.toSet
    assert(got == naive)
  }

  test("sequencePairSupport tie semantics: equal timestamps never count") {
    // the min(ts_a) < max(ts_b) identity must keep STRICT ordering under
    // exact ties — the q220 oracle now spells the same identity, so this
    // fixture is the independent check that a tie-semantics change in
    // either side would fail (round-15, per ADVICE)
    def ts(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(us / 1000000L,
        (us % 1000000L) * 1000L))
    val df = Seq(
      // u1: a and b at the SAME microsecond only → no support either way
      (1L, "a", ts(1000L)), (1L, "b", ts(1000L)),
      // u2: a strictly before b → (a,b) supported, (b,a) not
      (2L, "a", ts(1000L)), (2L, "b", ts(1001L)),
      // u3: a@t, b@t AND b@t+1 → (a,b) supported via the later b;
      //     (b,a) not (no a after any b)
      (3L, "a", ts(2000L)), (3L, "b", ts(2000L)), (3L, "b", ts(2001L)),
      // u4: single-event user → contributes nothing
      (4L, "a", ts(3000L)))
      .toDF("user_id", "event_type", "ts")
    val got = EventsOps.sequencePairSupport(df)
      .select(col("first_type"), col("then_type"), col("n_users"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L)))
  }
}
