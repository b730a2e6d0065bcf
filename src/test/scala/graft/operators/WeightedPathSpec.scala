package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded min-plus shortest-path laws (round 9, B176). */
class WeightedPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String, Long)], seeds: Seq[String],
      rounds: Int): Map[String, Long] =
    Graph.weightedDistances(edges.toDF("src", "dst", "w"),
        seeds.map(Tuple1(_)).toDF("node"), rounds)
      .as[(String, Long)].collect().toMap

  test("a cheap two-hop path beats an expensive direct edge") {
    val edges = Seq(("s", "t", 100L), ("s", "m", 10L), ("m", "t", 10L))
    assert(run(edges, Seq("s"), rounds = 1) == Map("s" -> 0L, "t" -> 100L, "m" -> 10L))
    assert(run(edges, Seq("s"), rounds = 2)("t") == 20L) // relaxed via m
  }

  test("round budget is an upper-bound refinement: dists only decrease") {
    val rnd = new scala.util.Random(19)
    val nodes = (0 until 30).map(i => s"n$i")
    val edges = Seq.fill(120)((nodes(rnd.nextInt(30)), nodes(rnd.nextInt(30)),
      (1 + rnd.nextInt(50)).toLong)).filter(e => e._1 != e._2)
    val seeds = Seq("n0", "n7")
    val byRound = (1 to 5).map(r => run(edges, seeds, r))
    byRound.sliding(2).foreach { case Seq(prev, next) =>
      prev.foreach { case (n, d) => assert(next(n) <= d, s"$n grew") }
    }
    // fixpoint check: at rounds >= |nodes| the result equals brute Dijkstra
    val fix = run(edges, seeds, rounds = 30)
    val brute = {
      val dist = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (u, v, w) =>
          dist.get(u).foreach { du =>
            if (dist.get(v).forall(_ > du + w)) { dist(v) = du + w; changed = true }
          }
        }
      }
      dist.toMap
    }
    assert(fix == brute)
  }
}
