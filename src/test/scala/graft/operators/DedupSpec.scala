package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth checks for the approximate dedup family (SURVEY.md §5.2:
  * B30 "asserted vs exact-Jaccard ground truth"): a corpus with PLANTED
  * near-duplicates — real documents plus lightly mutated copies — where the
  * true pair set is known by construction.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 60 base docs + a mutated copy of every 4th (drop one word in ~40) —
    * the (i, i+10000) pairs are the planted near-dups. */
  private lazy val corpus: DataFrame = {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("spark", "data", "query", "join", "scan", "filter", "agg",
      "sort", "merge", "hash", "batch", "stream", "window", "group", "table")
    val base = (0 until 60).map { i =>
      (i.toLong, Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val mutated = base.collect { case (id, text) if id % 4 == 0 =>
      val words = text.split(" ").toBuffer
      words.remove(rnd.nextInt(words.size))
      (id + 10000L, words.mkString(" "))
    }
    (base ++ mutated).toDF("doc_id", "text")
  }

  /** Exact Jaccard over 3-gram shingles for ALL pairs (small corpus). */
  private lazy val truePairs: Map[(Long, Long), Double] = {
    val sh = corpus
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val ids = sh.keys.toSeq.sorted
    (for {
      a <- ids; b <- ids if a < b
      sa = sh(a).toSet; sb = sh(b).toSet
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
    } yield (a, b) -> j).toMap
  }

  test("minhash-LSH finds every planted near-duplicate (recall on j>=0.5)") {
    val found = Dedup.minhashCandidates(corpus)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    val strong = truePairs.filter(_._2 >= 0.5).keySet
    assert(strong.nonEmpty, "corpus must contain planted near-dups")
    val missed = strong -- found.keySet
    assert(missed.isEmpty, s"minhash-LSH missed strong pairs: $missed")
    // reported jaccard is EXACT (verification step), so it must match truth
    found.foreach { case (pair, j) =>
      assert(math.abs(j - truePairs(pair)) < 1e-9, s"jaccard drift for $pair")
    }
  }

  test("ngram inverted-index join computes exact jaccard for all sharing pairs") {
    val found = Dedup.ngramJaccardPairs(corpus, maxShingleFreq = 1000)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // every true pair with any shared shingle appears, with the exact value
    val sharing = truePairs.filter(_._2 > 0)
    assert(found.keySet == sharing.keySet)
    found.foreach { case (pair, j) =>
      assert(math.abs(j - sharing(pair)) < 1e-9)
    }
  }

  test("simhash: planted near-dups land within small hamming distance") {
    val found = Dedup.simhashCandidates(corpus, maxHamming = 16)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect()
    val planted = truePairs.filter(_._2 >= 0.5).keySet
    val foundPairs = found.map(r => (r._1, r._2)).toSet
    val recall = (planted & foundPairs).size.toDouble / planted.size
    assert(recall >= 0.8, s"simhash recall $recall below 0.8 for planted pairs")
    // fingerprints are deterministic across runs
    val fp1 = corpus.withColumn("fp", Dedup.simhashFingerprint(col("text")))
      .select("doc_id", "fp").as[(Long, Long)].collect().toMap
    val fp2 = corpus.withColumn("fp", Dedup.simhashFingerprint(col("text")))
      .select("doc_id", "fp").as[(Long, Long)].collect().toMap
    assert(fp1 == fp2)
  }

  test("collapseExact: one representative per distinct text, linear on dup-heavy input") {
    // 3 exact copies of A, 2 of B, 1 of C (C = A with one word dropped, so
    // a genuine near-dup: 39 of 40 tokens shared)
    val words = Seq("spark", "data", "query", "join", "scan", "filter",
      "agg", "sort", "merge", "hash")
    val a = (0 until 40).map(i => words(i % words.size)).mkString(" ")
    val b = (0 until 40).map(i => words((i * 3 + 1) % words.size)).reverse.mkString(" ")
    val c = (0 until 40).map(i => words(i % words.size)).drop(1).mkString(" ")
    val docs = Seq((1L, a), (2L, a), (3L, a), (10L, b), (11L, b), (20L, c))
      .toDF("doc_id", "text")
    val collapsed = Dedup.collapseExact(docs)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(collapsed.map(r => (r._1, r._3)).toSeq == Seq((1L, 3L), (10L, 2L), (20L, 1L)))

    // near-dup over representatives: the only candidate pair is (1, 20) —
    // the 100-fold intra-cluster pair space never exists
    val pairs = Dedup.simhashCandidates(
      Dedup.collapseExact(docs), maxHamming = 16)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 20L)))
    assert(pairs.forall { case (x, y) => Set(1L, 10L, 20L)(x) && Set(1L, 10L, 20L)(y) })
  }

  test("embedding-cosine near-dup finds planted near-identical vectors") {
    val rnd = new scala.util.Random(5)
    val base = (0 until 100).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian())))
    // plant: ids 10000+i are tiny perturbations of every 10th vector
    val dups = base.collect { case (id, v) if id % 10 == 0 =>
      (id + 10000L, v.map(_ + rnd.nextGaussian() * 0.01))
    }
    val corpus = (base ++ dups).toDF("vec_id", "v")
    val found = Dedup.embeddingNearDupPairs(corpus, threshold = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = base.collect { case (id, _) if id % 10 == 0 =>
      (id, id + 10000L)
    }.toSet
    val recall = (planted & found).size.toDouble / planted.size
    assert(recall >= 0.9, s"missed planted near-dups: recall=$recall")
    // no false positives at 0.98 among independent gaussians (dim 64)
    assert(found.forall { case (a, b) => planted.contains((a, b)) },
      s"false positives: ${found -- planted}")
  }

  test("ann-lsh neighbors carry exact cosine scores and beat a recall floor") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val ann = AnnLsh.topK(emb, qs, 5)
      .select("qid", "neighbor", "cos").as[(Long, Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(emb, qs, 5)
      .select(col("qid"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect()
    // exactness: ANN's cosine for a (qid, neighbor) pair equals brute force's
    val bruteMap = brute.map(r => (r._1, r._2) -> r._3).toMap
    val exact = Similarity.bruteForceTopK(emb, qs, 500)
      .select(col("qid"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    ann.foreach { case (q, n, c) =>
      assert(math.abs(c - exact((q, n))) < 1e-12, s"cosine drift for ($q,$n)")
    }
    // recall floor: LSH top-5 intersects brute-force top-5 (gaussian vectors
    // at dim 64 make this probabilistic — demand at least SOME signal)
    val annSets = ann.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bruteSets = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = annSets.map { case (q, s) => (s & bruteSets.getOrElse(q, Set())).size }.sum
    assert(hits >= 2, s"ANN found no overlap with brute-force top-5 (hits=$hits)")
  }

  test("knnLabel: majority vote with deterministic tie-break") {
    def v(axis: Int, eps: Double): Seq[Double] =
      Seq.tabulate(4)(i => (if (i == axis) 1.0 else 0.0) + (if (i == 3) eps else 0.0))
    val labeled = Seq(
      (0L, v(0, 0.00), 7), (1L, v(0, 0.01), 7), (2L, v(0, 0.02), 9),
      (3L, v(1, 0.00), 5), (4L, v(1, 0.01), 5), (5L, v(1, 0.02), 5)
    ).toDF("vec_id", "v", "label")
    val queries = Seq((100L, v(0, 0.005)), (101L, v(1, 0.005)))
      .toDF("qid", "qv")
    val pred = Similarity.knnLabel(labeled, queries, k = 3)
      .as[(Long, Int)].collect().toMap
    // query 100's top-3 = labels (7, 7, 9) -> majority 7;
    // query 101's top-3 = (5, 5, 5) -> unanimous 5
    assert(pred === Map(100L -> 7, 101L -> 5))
    // exact 2-vs-2 tie: k=4 over two labeled pairs — counts are equal no
    // matter how cosine ranks them, so the SMALLER label must win
    val twoPair = Seq(
      (0L, v(0, 0.00), 9), (1L, v(0, 0.01), 9),
      (2L, v(1, 0.00), 3), (3L, v(1, 0.01), 3)).toDF("vec_id", "v", "label")
    val bisector = Seq((200L, Seq(1.0, 1.0, 0.0, 0.0))).toDF("qid", "qv")
    val tied = Similarity.knnLabel(twoPair, bisector, k = 4)
      .as[(Long, Int)].collect().toMap
    assert(tied === Map(200L -> 3))
    // id collision across the UNRELATED id spaces: labeled vec_id 100 is the
    // nearest neighbor of query qid 100 and must still vote (k=1 -> its
    // label), not be dropped as a "self" pair
    val collide = Seq((100L, v(0, 0.0), 9), (101L, v(1, 0.0), 3))
      .toDF("vec_id", "v", "label")
    val q100 = Seq((100L, v(0, 0.001))).toDF("qid", "qv")
    assert(Similarity.knnLabel(collide, q100, k = 1)
      .as[(Long, Int)].collect().toMap === Map(100L -> 9))
  }

  test("quantizeInt8: bounded reconstruction error, int8 range, zero vector") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 50L).map(i => (i, Seq.fill(16)(rnd.nextGaussian()))) :+
      (99L, Seq.fill(16)(0.0)) // zero vector must quantize to zeros, scale 0
    val df = rows.toDF("vec_id", "v")
    val out = Similarity.quantizeInt8(df)
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(99L) === ((99L, 0L, 0L, 0L, "0.0000")))
    // recompute quantization in Scala and check the error bound per component
    rows.dropRight(1).foreach { case (id, v) =>
      val maxabs = v.map(math.abs).max
      val q = v.map(x => math.floor(x * 127.0 / maxabs + 0.5).toLong)
      assert(out(id)._2 === q.sum, s"q_sum mismatch for vec $id")
      assert(q.forall(x => x >= -127L && x <= 127L))
      // dequantized component error <= maxabs/254 + float slack
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(qi * maxabs / 127.0 - x) <= maxabs / 254.0 + 1e-9)
      }
    }
  }

  test("semanticDedup: greedy lowest-id collapse within k-means cells") {
    // two tight clusters far apart + one outlier: ground truth by hand.
    // base directions are orthogonal so cross-cluster cosine ~ 0.
    def vec(base: Int, eps: Double): Seq[Double] =
      Seq.tabulate(8)(i => (if (i == base) 1.0 else 0.0) + (if (i == 7) eps else 0.0))
    val rows = Seq(
      (0L, vec(0, 0.0)), (1L, vec(0, 0.01)), (2L, vec(0, 0.02)), // cluster A
      (3L, vec(1, 0.0)), (4L, vec(1, 0.015)),                    // cluster B
      (5L, vec(2, 0.0)))                                         // singleton
    val corpus = rows.toDF("vec_id", "v")
    val centroids: Array[Seq[Double]] =
      Array(vec(0, 0.0), vec(1, 0.0), vec(2, 0.0))
    val res = Dedup.semanticDedup(corpus, centroids, tau = 0.99)
      .select("vec_id", "status", "keeper")
      .as[(Long, String, Option[Long])].collect().sortBy(_._1)
    assert(res.map(r => (r._1, r._2)).toSeq === Seq(
      0L -> "kept", 1L -> "dropped", 2L -> "dropped",
      3L -> "kept", 4L -> "dropped", 5L -> "kept"))
    // every dropped vector collapses into the LOWEST-id tau-close cell-mate
    assert(res.filter(_._2 == "dropped").map(_._3.get).toSeq === Seq(0L, 0L, 3L))
    // kept-set invariant: no two survivors in one cell are tau-close
    val kept = corpus.join(
      Dedup.semanticDedup(corpus, centroids, tau = 0.99)
        .filter(col("status") === "kept").select("vec_id"), Seq("vec_id"))
    val keptPairs = kept.as("x").join(kept.as("y"),
        col("x.vec_id") < col("y.vec_id"))
      .filter(Similarity.cosine(col("x.v"), col("y.v")) >= 0.99)
    assert(keptPairs.count() === 0)
  }

  test("semanticDedup: tau-chains resolve to surviving keepers; zero vectors collapse") {
    // angles 0, 2, 4 degrees with tau = cos(2.5 deg): adjacent pairs are
    // tau-close but the ends are not — v1 drops with keeper v0, v2 drops
    // with keeper v1 (itself dropped). resolveKeepers must land v2 on v0.
    def ang(d: Double): Seq[Double] =
      Seq(math.cos(math.toRadians(d)), math.sin(math.toRadians(d)))
    val tau = math.cos(math.toRadians(2.5))
    val corpus = Seq(
      (0L, ang(0)), (1L, ang(2)), (2L, ang(4)),
      (10L, Seq(0.0, 0.0)), (11L, Seq(0.0, 0.0)), // zero vectors: exact dups
      (12L, Seq(0.0, 1.0))                        // orthogonal, kept
    ).toDF("vec_id", "v")
    val centroids: Array[Seq[Double]] = Array(Seq(1.0, 0.0))
    val raw = Dedup.semanticDedup(corpus, centroids, tau)
      .select("vec_id", "status", "keeper")
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(raw === Seq(
      (0L, "kept", None), (1L, "dropped", Some(0L)), (2L, "dropped", Some(1L)),
      (10L, "kept", None), (11L, "dropped", Some(10L)), (12L, "kept", None)))
    val resolved = Dedup.resolveKeepers(
      Dedup.semanticDedup(corpus, centroids, tau))
      .select("vec_id", "status", "keeper")
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    // identical except v2's keeper now points at the surviving v0
    assert(resolved === raw.map(r => if (r._1 == 2L) (2L, "dropped", Some(0L)) else r))
  }

  test("semanticDedup is input-partitioning-invariant") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 80L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian())))
    // add exact copies of the first 10 at high ids — must all drop
    val aug = rows ++ (0L until 10L).map(i => (1000L + i, rows(i.toInt)._2))
    val mk = (parts: Int) => aug.toDF("vec_id", "v").repartition(parts)
    val centroids = AnnIvf.trainCentroids(mk(4), k = 4)
    val run = (parts: Int) =>
      Dedup.semanticDedup(mk(parts), centroids, tau = 0.999)
        .select("vec_id", "status", "keeper")
        .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    val r1 = run(1)
    assert(r1 === run(13))
    assert(r1.filter(_._1 >= 1000L).forall(_._2 == "dropped"),
      "an exact planted copy survived semantic dedup")
  }

  // ==== dedupNear end-to-end laws ===========================================

  /** The planted corpus plus exact copies of every 3rd doc — exercises the
    * exact-collapse front end AND the near-dup graph in one run. */
  private lazy val nearCorpus: DataFrame = {
    val extra = corpus.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 20000L).as("doc_id"), col("text"))
    corpus.unionByName(extra)
  }

  test("dedupNear law: kept ∪ dropped = input, exactly once each") {
    val r = Dedup.dedupNear(nearCorpus, method = "ngram", tau = 0.5,
      shingleN = 3, maxShingleFreq = 100)
    val n = nearCorpus.count()
    assert(r.decisions.count() == n, "every input doc gets a decision")
    assert(r.decisions.select("doc_id").distinct().count() == n,
      "no doc decided twice")
    val keptN = r.kept.count()
    val droppedN = r.decisions.filter(!col("kept")).count()
    assert(keptN + droppedN == n, s"kept $keptN + dropped $droppedN != $n")
    // manifest accounts for every member
    val m = r.manifest.agg(sum("n_members"), sum("n_dropped")).head()
    assert(m.getLong(0) == n && m.getLong(1) == droppedN)
    // survivors are their own cluster ids (min-id selection)
    assert(r.decisions.filter(col("kept") && col("doc_id") =!= col("cluster_id"))
      .count() == 0)
  }

  test("dedupNear law: no two kept docs within tau of each other") {
    val r = Dedup.dedupNear(nearCorpus, method = "ngram", tau = 0.5,
      shingleN = 3, maxShingleFreq = 100)
    val kept = r.kept.select("doc_id", "text")
    // re-run the SAME candidate generator over the kept corpus: any pair at
    // jaccard >= tau would mean two surviving near-duplicates
    val survivors = Dedup.ngramJaccardPairs(kept, 3, 100)
      .filter(col("jaccard") >= 0.5).count()
    assert(survivors == 0, s"$survivors near-dup pairs survived dedupNear")
    // and every planted near-dup/exact-dup pair is collapsed: the mutated
    // (i, i+10000) and exact (i, i+20000) copies never BOTH survive
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    for (i <- 0L until 60L) {
      if (keptIds(i) && i % 4 == 0 && truePairs.getOrElse((i, i + 10000L), 0.0) >= 0.5)
        assert(!keptIds(i + 10000L), s"near-dup pair ($i, ${i + 10000}) both kept")
      if (i % 3 == 0)
        assert(!(keptIds(i) && keptIds(i + 20000L)),
          s"exact pair ($i, ${i + 20000}) both kept")
    }
  }

  test("semanticDecontaminate: flags tau-close corpus vectors, broadcasts eval side") {
    // eval basis vectors; corpus: an exact copy, a near copy (cos ~0.995),
    // a same-direction rescale (cos 1.0), an orthogonal and a negated vector
    val ev = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("eid", "ev")
    val corpus = Seq(
      (100L, Seq(1.0, 0.0, 0.0, 0.0)),      // exact copy of eval 0
      (101L, Seq(1.0, 0.1, 0.0, 0.0)),      // near copy: cos ~0.995
      (102L, Seq(0.0, 5.0, 0.0, 0.0)),      // rescaled eval 1: cos = 1.0
      (103L, Seq(0.0, 0.0, 1.0, 0.0)),      // orthogonal
      (104L, Seq(-1.0, 0.0, 0.0, 0.0))      // negated: cos = -1
    ).toDF("vec_id", "v")
    val out = Similarity.semanticDecontaminate(corpus, ev, tau = 0.98)
    val got = out.select("vec_id", "n_eval_hits", "max_cos")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === Set(100L, 101L, 102L))
    assert(got(100L) === ((1L, 1.0)))
    assert(got(101L)._2 > 0.99 && got(101L)._2 < 1.0)
    assert(got(102L) === ((1L, 1.0)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"eval side should broadcast:\n$plan")
  }

  test("leakageSafeSplit over dedupNear clusters: no near-dup pair straddles splits") {
    val r = Dedup.dedupNear(nearCorpus, method = "ngram", tau = 0.5,
      shingleN = 3, maxShingleFreq = 100)
    val split = CorpusOps.leakageSafeSplit(r.decisions, col("cluster_id"))
    // split is a pure function of the cluster: one split per cluster_id
    val straddling = split.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddling == 0, s"$straddling clusters straddle splits")
    // THE leakage property: no candidate pair (the true near-dups by
    // construction) crosses a split boundary
    val edges = Dedup.ngramJaccardPairs(nearCorpus, 3, 100)
      .filter(col("jaccard") >= 0.5)
    val byDoc = split.select(col("doc_id"), col("split"))
    val crossing = edges
      .join(byDoc.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(byDoc.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(crossing == 0, s"$crossing near-dup pairs cross a split boundary")
    // not vacuous: every doc got a split, train is populated, and the
    // planted pairs exist
    assert(split.count() == nearCorpus.count())
    assert(split.filter(col("split") === "train").count() > 0)
    assert(edges.count() > 0)
  }

  test("dedupNear: minhash and simhash methods produce consistent survivor sets") {
    // approximate methods may differ from ngram on borderline pairs but the
    // laws hold and exact duplicates ALWAYS collapse (identical signatures)
    for ((m, tau) <- Seq("minhash" -> 0.5, "simhash" -> 0.8)) {
      val r = Dedup.dedupNear(nearCorpus, method = m, tau = tau,
        shingleN = 3, maxShingleFreq = 100)
      val n = nearCorpus.count()
      val keptN = r.kept.count()
      assert(r.decisions.count() == n, s"$m: decisions cover input")
      assert(keptN + r.decisions.filter(!col("kept")).count() == n)
      val keptIds = r.kept.select("doc_id").as[Long].collect().toSet
      for (i <- 0L until 60L if i % 3 == 0)
        assert(!(keptIds(i) && keptIds(i + 20000L)),
          s"$m: exact pair ($i, ${i + 20000}) both kept")
    }
    val bad = intercept[IllegalArgumentException] {
      Dedup.dedupNear(nearCorpus, method = "nope")
    }
    assert(bad.getMessage.contains("unknown method"))
    // a Hamming budget wide enough to match unrelated text is refused
    val wide = intercept[IllegalArgumentException] {
      Dedup.dedupNear(nearCorpus, method = "simhash", tau = 0.5)
    }
    assert(wide.getMessage.contains("Hamming"))
  }

  test("dedupNear law holds for null-text documents") {
    // two null-text docs are exact duplicates of each other (same group in
    // collapseExact) — they must BOTH get decisions, one kept
    val withNulls = nearCorpus.unionByName(
      Seq((90001L, null.asInstanceOf[String]), (90002L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val r = Dedup.dedupNear(withNulls, method = "ngram", tau = 0.5,
      shingleN = 3, maxShingleFreq = 100)
    assert(r.decisions.count() == withNulls.count(),
      "null-text docs must not vanish from the decision table")
    val nullDecisions = r.decisions
      .filter(col("doc_id") >= 90000L)
      .select("doc_id", "cluster_id", "kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(nullDecisions == Seq((90001L, 90001L, true), (90002L, 90001L, false)),
      s"null texts collapse as exact duplicates: $nullDecisions")
  }
}
