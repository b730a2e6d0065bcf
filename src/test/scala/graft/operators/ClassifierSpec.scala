package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained-classifier laws: bit-determinism (two runs, one answer),
  * bitwise parity with a local single-threaded reimplementation of the
  * exact training arithmetic, separation on a separable corpus, learning
  * beyond the majority class on a noisy linear-rule corpus, and the
  * bias-only scoring path for empty docs. */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex2(tok: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    ((d(0) & 0xff) >> 4) * 16 + (d(0) & 0x0f)
  }
  private def bucket(tok: String): Int = md5hex2(tok) % 64
  private def ruleW(tok: String): Int = md5hex2(tok) - 128

  /** Separable corpus: positive docs draw from g-tokens, negative from
    * b-tokens (disjoint bucket sets — asserted below). */
  private lazy val separable: Seq[(Long, String, Long)] = {
    val rnd = new scala.util.Random(11)
    val good = Seq("alpha", "bravo", "delta", "echo")
    val bad = Seq("kilo", "lima", "mike", "november")
    assert(good.map(bucket).toSet.intersect(bad.map(bucket).toSet).isEmpty,
      "fixture tokens must not collide in hash buckets")
    (0 until 120).map { i =>
      val pool = if (i % 2 == 0) good else bad
      val text = Seq.fill(5 + rnd.nextInt(10))(pool(rnd.nextInt(pool.size)))
        .mkString(" ")
      (i.toLong, text, (1 - i % 2).toLong)
    }
  }

  /** Noisy linear-rule corpus: mixed tokens, label = md5-rule sign (the
    * q184 target) — learnable but not trivially separable. */
  private lazy val noisy: Seq[(Long, String, Long)] = {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 40).map(i => s"tok$i")
    (0 until 200).map { i =>
      val target = (i % 2).toLong // alternate labels => balanced classes
      val toks = Iterator
        .continually(Seq.fill(8 + rnd.nextInt(20))(
          vocab(rnd.nextInt(vocab.size))))
        .find(ts => (if (ts.map(ruleW).sum >= 0) 1L else 0L) == target)
        .get
      (i.toLong, toks.mkString(" "), target)
    }
  }

  private def df(rows: Seq[(Long, String, Long)]) =
    rows.toDF("doc_id", "text", "y")

  /** The training arithmetic, reimplemented locally over plain Scala
    * collections — the bitwise ground truth for the distributed path. */
  private def trainLocal(rows: Seq[(Long, String, Long)]): Array[Long] = {
    val feats: Seq[(Long, Map[Int, Long])] = rows.map { case (id, text, _) =>
      val counts = text.split(" ").filter(_.nonEmpty)
        .groupBy(bucket).map { case (b, xs) => b -> xs.length.toLong }
      id -> (counts + (64 -> 1L))
    }
    val yOf = rows.map(r => r._1 -> r._3).toMap
    val n = rows.size
    // NB init
    val c1 = Array.fill(64)(0L); val c0 = Array.fill(64)(0L)
    feats.foreach { case (id, m) =>
      m.foreach { case (b, x) =>
        if (b < 64) { if (yOf(id) == 1L) c1(b) += x else c0(b) += x }
      }
    }
    val t1 = c1.sum; val t0 = c0.sum
    val n1 = rows.count(_._3 == 1L); val n0 = n - n1
    val w = Array.tabulate(65) { j =>
      if (j == 64) math.floor(1e6 * math.log((n1 + 1.0) / (n0 + 1.0))).toLong
      else math.floor(1e6 * (math.log((c1(j) + 1.0) / (t1 + 64.0))
        - math.log((c0(j) + 1.0) / (t0 + 64.0)))).toLong
    }
    for (_ <- 1 to Classifier.Iters) {
      val g = Array.fill(65)(0L)
      feats.foreach { case (id, m) =>
        val z = m.map { case (b, x) => w(b) * x }.sum
        val t = z.toDouble / 1e6
        val p = 0.5 * (1.0 + t / (1.0 + math.abs(t)))
        val r = math.floor(1e6 * (p - yOf(id))).toLong
        m.foreach { case (b, x) => g(b) += x * r }
      }
      for (b <- 0 until 65)
        w(b) -= math.floor(g(b) / (Classifier.LrDen * n)).toLong
    }
    w
  }

  private def accuracy(rows: Seq[(Long, String, Long)], w: Array[Long]): Double = {
    val scored = Classifier.score(df(rows).drop("y"), w)
      .select("doc_id", "z_micro").as[(Long, Long)].collect().toMap
    rows.count { case (id, _, y) =>
      (if (scored(id) >= 0) 1L else 0L) == y
    }.toDouble / rows.size
  }

  test("bit-determinism: two training runs produce identical weights") {
    val w1 = Classifier.train(df(noisy))
    val w2 = Classifier.train(df(noisy))
    assert(w1.toSeq == w2.toSeq)
  }

  test("bitwise parity with the local reference implementation") {
    val dist = Classifier.train(df(noisy))
    val local = trainLocal(noisy)
    assert(dist.toSeq == local.toSeq)
  }

  test("separable corpus: trained model classifies it perfectly") {
    val w = Classifier.train(df(separable))
    assert(accuracy(separable, w) == 1.0)
  }

  test("noisy linear-rule corpus: learns well past the majority class") {
    val w = Classifier.train(df(noisy))
    val majority = math.max(noisy.count(_._3 == 1L), noisy.count(_._3 == 0L))
      .toDouble / noisy.size
    val acc = accuracy(noisy, w)
    assert(acc > majority + 0.05, s"acc $acc vs majority $majority")
  }

  test("empty docs train without crashing and score through the bias alone") {
    val rows = noisy.take(30) :+ (999L, "", 0L)
    val w = Classifier.train(df(rows))
    val scored = Classifier.score(df(rows).drop("y"), w)
      .filter(col("doc_id") === 999L)
      .select("n_tokens", "z_micro").as[(Long, Long)].collect()
    assert(scored.toSeq == Seq((0L, w(64))))
  }
}
