package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 laws: Markov entropy rate (B290), negative-binomial fit
  * (B291), vocabulary coverage (B292). */
class InfoStatsR14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seqEvents(users: Seq[(Long, Seq[String])]) =
    users.flatMap { case (u, types) =>
      types.zipWithIndex.map { case (t, i) =>
        (u, new Timestamp(1700000000000L + i * 60000L), u * 100 + i, t)
      }
    }.toDF("user_id", "ts", "event_id", "event_type")

  test("markov entropy rate: deterministic chain = 0, fair coin = ln 2") {
    // every user alternates a→b→a→b: both states fully predictable
    val det = seqEvents((0L until 50L).map(u =>
      u -> Seq("a", "b", "a", "b", "a")))
    EventsOps.markovEntropyRate(det).collect().foreach { r =>
      assert(r.getAs[String]("h").toDouble == 0.0, r.toString)
    }
    // from 'a', half the users go to 'b', half to 'c' → H(a) = ln 2;
    // b and c always return to a → H = 0 there
    val coin = seqEvents((0L until 100L).map(u =>
      u -> (if (u % 2 == 0) Seq("a", "b", "a") else Seq("a", "c", "a"))))
    val h = EventsOps.markovEntropyRate(coin).collect()
      .map(r => r.getAs[String]("state") ->
        r.getAs[String]("h").toDouble).toMap
    assert(math.abs(h("a") - math.log(2.0)) < 1e-3, h.toString)
    assert(h("b") == 0.0 && h("c") == 0.0, h.toString)
    // rate = π-weighted mean: a carries 2/4 of transitions → ln2 / 2
    assert(math.abs(h("__all") - math.log(2.0) / 2) < 1e-3, h.toString)
  }

  test("negbin fit: planted mixture is overdispersed, constant is not") {
    // half the users emit 1 event, half 9 → m = 5, v ≈ 16 (Gamma-mixed
    // Poisson territory); NB MoM: r = 25/(v−5), p = 5/v
    val mix = (0L until 200L).flatMap { u =>
      val k = if (u % 2 == 0) 1 else 9
      (0 until k).map(i => ("t", u))
    }.toDF("event_type", "user_id")
    val r = EventsOps.negbinFit(mix).head()
    assert(r.getAs[String]("mean") == "5.0000")
    val v = r.getAs[String]("var").toDouble
    assert(v > 15.9 && v < 16.2, r.toString)
    assert(math.abs(r.getAs[String]("r").toDouble - 25.0 / (v - 5)) < 1e-3)
    assert(math.abs(r.getAs[String]("p").toDouble - 5.0 / v) < 1e-3)
    // constant counts: v = 0 < m → Poisson suffices → NULL fit
    val const = (0L until 100L).flatMap(u =>
      (0 until 3).map(_ => ("t", u))).toDF("event_type", "user_id")
    val c = EventsOps.negbinFit(const).head()
    assert(c.isNullAt(c.fieldIndex("r")) && c.isNullAt(c.fieldIndex("p")),
      c.toString)
  }

  test("vocab coverage: hand-computed frequency-of-frequencies") {
    // "a a b c": V=3, N=4, n1=2 (b, c), n2=1 (a) →
    // missing = 2/4 = 0.5, chao1 = 3 + 2·1/(2·(1+1)) = 3.5
    val docs = Seq((1L, "a a b c", "s0")).toDF("doc_id", "text", "source")
    val r = CorpusStats.vocabCoverage(docs).head()
    assert(r.getAs[Long]("vocab") == 3L && r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 1L)
    assert(r.getAs[String]("missing_mass") == "0.5000")
    assert(r.getAs[String]("chao1") == "3.5000")
    // a fully-duplicated corpus has zero missing mass and chao1 = V
    val dup = Seq((1L, "x y x y", "s0")).toDF("doc_id", "text", "source")
    val d = CorpusStats.vocabCoverage(dup).head()
    assert(d.getAs[String]("missing_mass") == "0.0000")
    assert(d.getAs[String]("chao1").toDouble ==
      d.getAs[Long]("vocab").toDouble)
  }
}
