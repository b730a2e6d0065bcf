package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 laws for the recsys/experimentation additions: item-item
  * co-occurrence cosine (B287), SRM check (B288), delta-method ratio CI
  * (B289). */
class RecsysExperimentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("item cooccurrence: hand-computed cosine graph with tie-break") {
    // orders: {1,2,3}, {1,2}, {1,3} → c1=3, c2=2, c3=2,
    // c12=2, c13=2, c23=1; cos(1,2)=cos(1,3)=2/√6≈0.8165, cos(2,3)=0.5
    val li = Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (30L, 1L), (30L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val out = Retrieval.itemCooccurrence(li, k = 2).collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Int]("rnk")) ->
        (r.getAs[Long]("neighbor"), r.getAs[Long]("n_pair"),
          r.getAs[String]("cosine"))).toMap
    // item 1: tie between neighbors 2 and 3 → smaller id ranks first
    assert(out((1L, 1)) == ((2L, 2L, "0.8165")), out.toString)
    assert(out((1L, 2)) == ((3L, 2L, "0.8165")), out.toString)
    // item 2: neighbor 1 (0.8165) beats 3 (0.5)
    assert(out((2L, 1))._1 == 1L && out((2L, 2))._1 == 3L)
    assert(out((2L, 2))._3 == "0.5000")
    // duplicate lines in one order must not double-count
    val dup = Retrieval.itemCooccurrence(
      li.unionByName(Seq((10L, 1L)).toDF("l_orderkey", "l_partkey")), 2)
      .filter(col("item") === 1L && col("rnk") === 1).head()
    assert(dup.getAs[Long]("n_pair") == 2L, dup.toString)
  }

  test("SRM check: counts are complete and chi2 matches its own cells") {
    val ev = (0L until 8000L).map(u => (u, "view")).toDF("user_id",
      "event_type")
    val r = EventsOps.srmCheck(ev).head()
    val n = r.getAs[Long]("n_users")
    val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
    assert(n == 8000L && na + nb == n)
    val chi2 = r.getAs[String]("chi2_arm").toDouble
    assert(math.abs(chi2 - (na - nb).toDouble * (na - nb) / n) < 1e-9)
    // md5 digits are uniform: a 16-bucket χ² at dof 15 should sit far
    // below a blown assignment (99.9th percentile ≈ 37.7)
    assert(r.getAs[String]("chi2_buckets").toDouble < 37.7, r.toString)
    assert(chi2 < 11.0, s"arm split $na/$nb chi2 $chi2")
  }

  test("ratio CI: an exact 2:1 metric collapses the interval to the point") {
    // every user has x = 2y exactly → R = 2 and var(x − Ry) = 0 → se = 0
    val ev = (0L until 400L).flatMap { u =>
      val views = 1 + (u % 5).toInt
      (0 until views).map(_ => (u, "view", 0.0)) :+
        ((u, "purchase", views * 2.0 / 100.0))
    }.toDF("user_id", "event_type", "value")
    EventsOps.ratioMetricCi(ev).collect().foreach { r =>
      assert(r.getAs[String]("ratio") == "2.0000", r.toString)
      assert(r.getAs[String]("se") == "0.0000", r.toString)
      assert(r.getAs[String]("ci_lo") == "2.0000" &&
        r.getAs[String]("ci_hi") == "2.0000", r.toString)
    }
  }

  test("ratio CI: noisy ratio gets a finite interval containing the truth") {
    val ev = (0L until 1000L).flatMap { u =>
      val views = 1 + (u % 7).toInt
      val cents = views * 200 + ((u * 37) % 101).toInt - 50
      (0 until views).map(_ => (u, "view", 0.0)) :+
        ((u, "purchase", cents / 100.0))
    }.toDF("user_id", "event_type", "value")
    EventsOps.ratioMetricCi(ev).collect().foreach { r =>
      val lo = r.getAs[String]("ci_lo").toDouble
      val hi = r.getAs[String]("ci_hi").toDouble
      // truth: 200 cents/view plus a ±50-cent per-user perturbation
      assert(lo < hi && lo > 195.0 && hi < 205.0 && lo < 200.4 &&
        hi > 199.6, r.toString)
    }
  }
}
