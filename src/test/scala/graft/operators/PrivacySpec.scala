package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Geometric-mechanism laws: the inverse-CDF table is a valid CDF, the
  * engine draw matches a scala-side brute-force inversion, noise is
  * bounded and deterministic, and the release's integer arithmetic is
  * exact (clamp, grid snap, budget ledger). */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("thresholds: monotone CDF ending exactly at 2^24") {
    for (eps <- Seq(0.1, 0.5, 1.0, 2.0)) {
      val b = Privacy.geometricBound(eps)
      val ts = Privacy.geometricThresholds(eps, b)
      assert(ts.length == 2 * b + 1)
      assert(ts == ts.sorted, s"eps=$eps not monotone")
      assert(ts.last == (1L << 24), s"eps=$eps CDF must end at 2^24")
      // symmetric mechanism: the pmf (threshold gaps) reads the same
      // forwards and backwards, up to the 1-unit rint quantization
      val pmf = ts.head +: ts.sliding(2).map(p => p(1) - p(0)).toSeq
      assert(pmf.zip(pmf.reverse).forall { case (a, c) => math.abs(a - c) <= 1 },
        s"eps=$eps pmf not symmetric")
      // mode at zero
      assert(pmf(b) == pmf.max)
    }
  }

  test("engine noise equals scala-side inverse-CDF inversion") {
    val eps = 0.5
    val b = Privacy.geometricBound(eps)
    val ts = Privacy.geometricThresholds(eps, b)
    def refNoise(key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t:$key".getBytes("UTF-8"))
      val hex = md.map(x => f"$x%02x").mkString.substring(0, 6)
      val u = java.lang.Long.parseLong(hex, 16)
      ts.count(_ <= u).toLong - b
    }
    val keys = (1 to 200).map(i => s"k$i")
    val got = keys.toDF("k")
      .select(col("k"), Privacy.geometricNoise(eps, "t", col("k")).as("z"))
      .as[(String, Long)].collect().toMap
    keys.foreach { k =>
      assert(got(k) == refNoise(k), s"key $k")
      assert(math.abs(got(k)) <= b)
    }
    // noise actually varies (not degenerate)
    assert(got.values.toSet.size > 3)
  }

  test("dpRelease: determinism, clamping, grid snap, bounded error") {
    val eps = 0.5
    val b = Privacy.geometricBound(eps)
    val clamp = 100L
    val rows = (1 to 500).map(i => (s"g${i % 5}", (i * 37 % 250).toLong))
    val df = rows.toDF("g", "v")
    val rel = Privacy.dpRelease(df, "g", col("v"), clamp, eps, eps, "s1")
      .collect()
    assert(rel.length == 5)
    val exact = rows.groupBy(_._1).map { case (g, rs) =>
      g -> (rs.size.toLong, rs.map(r => math.min(math.max(r._2, 0L), clamp)).sum)
    }
    rel.foreach { r =>
      val (n, sClamped) = exact(r.getString(0))
      val snapped = { val sh = sClamped + clamp / 2; sh - sh % clamp }
      assert(math.abs(r.getLong(1) - n) <= b)
      assert(math.abs(r.getLong(2) - snapped) <= b * clamp)
      assert(r.getLong(2) % clamp == 0, "released sum stays on the grid")
      assert(r.getString(3) == "1.0000")
    }
    // repartitioning never changes the release
    val rel2 = Privacy.dpRelease(df.repartition(13), "g", col("v"),
      clamp, eps, eps, "s1").collect()
    assert(rel.map(_.toSeq.toList).toList == rel2.map(_.toSeq.toList).toList)
    // a different salt draws different noise somewhere
    val rel3 = Privacy.dpRelease(df, "g", col("v"), clamp, eps, eps, "s2")
      .collect()
    assert(rel.map(_.toSeq.toList).toList != rel3.map(_.toSeq.toList).toList)
  }

  test("bound: truncated tail mass below draw resolution") {
    for (eps <- Seq(0.1, 0.5, 1.0)) {
      val b = Privacy.geometricBound(eps)
      val alpha = math.exp(-eps)
      assert(math.pow(alpha, b) / (1 - alpha) <= 1.0 / (1L << 24))
      assert(math.pow(alpha, b - 1) / (1 - alpha) > 1.0 / (1L << 24))
    }
  }
}
