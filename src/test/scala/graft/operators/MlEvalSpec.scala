package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact grouped ROC-AUC laws (round 7, B89). */
class MlEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def auc(rows: Seq[(String, Long, Boolean)]): Map[String, Option[Double]] =
    MlEval.groupedAuc(rows.toDF("g", "s", "lbl"), "g", "s", "lbl")
      .select(col("g"), col("auc")).as[(String, Option[Double])]
      .collect().toMap

  test("perfect separation scores 1, reversed scores 0") {
    val m = auc(Seq(
      ("up", 1L, false), ("up", 2L, false), ("up", 3L, true), ("up", 4L, true),
      ("dn", 1L, true), ("dn", 2L, true), ("dn", 3L, false), ("dn", 4L, false)))
    assert(m("up").contains(1.0) && m("dn").contains(0.0), s"got $m")
  }

  test("all-tied scores give AUC 0.5; single class gives null") {
    val m = auc(Seq(
      ("t", 5L, true), ("t", 5L, false), ("t", 5L, true), ("t", 5L, false),
      ("one", 1L, true), ("one", 2L, true)))
    assert(m("t").contains(0.5), s"got $m")
    assert(m("one").isEmpty, s"got $m")
  }

  test("hand-computed mixed case with a tie straddling the classes") {
    // scores: neg {1, 3}, pos {3, 4}. avg ranks: 1→1, 3,3→2.5, 4→4
    // U = (2.5 + 4) − 2·3/2 = 3.5 → AUC = 3.5/4 = 0.875
    val m = auc(Seq(
      ("g", 1L, false), ("g", 3L, false), ("g", 3L, true), ("g", 4L, true)))
    assert(m("g").contains(0.875), s"got $m")
  }

  test("retrieval metrics: perfect retrieval scores 1.0 across the board") {
    // both relevant docs contain x AND y and outrank the noise docs
    val docs = Seq(
      (1L, "x y x y x"), (2L, "x y"), (3L, "x z z"), (4L, "z w")
    ).toDF("doc_id", "text")
    val m = MlEval.metricsFor(docs, 9, Seq("x", "y"))
      .select(col("n_rel"), col("hits10"), col("recall10"), col("mrr20"),
        col("ndcg10"))
      .as[(Long, Long, String, String, String)].head()
    assert(m == ((2L, 2L, "1.0000", "1.0000", "1.0000")), s"got $m")
  }

  test("retrieval metrics: DCG weights are the pinned integer table") {
    // w_r = floor(1e6 / log2(r+1)): spot-pin the endpoints
    assert(MlEval.DcgW.head == 1000000L)
    assert(MlEval.DcgW(9) == (1e6 / (math.log(11.0) / math.log(2.0))).toLong)
    assert(MlEval.DcgW == MlEval.DcgW.sorted.reverse, "weights must decay")
  }

  test("calibrationBins: bins are equal-depth and rates are exact") {
    // scores 1..100, label = score > 90 -> only the top bin is positive
    val df = (1L to 100L).map(i => (i, i > 90)).toDF("s", "lbl")
    val got = MlEval.calibrationBins(df, "s", "lbl", 10)
      .select(col("bin"), col("n"), col("npos")).as[(Int, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (0 to 9), s"missing bins: ${got.toSeq}")
    assert(got.map(_._2).sum == 100L)
    // positives live only in the last bin
    assert(got.dropRight(1).forall(_._3 == 0L), got.toSeq)
    assert(got.last._3 == 10L, got.toSeq)
  }

  test("groupedOls: recovers an exact linear relationship") {
    // y = 3x + 2 exactly -> slope 3, intercept 2, r2 = 1
    val df = (1L to 50L).map(x => ("g", x, 3 * x + 2)).toDF("grp", "x", "y")
    val got = Profiling.groupedOls(df, "grp", "x", "y")
      .select(col("slope"), col("intercept"), col("r2"))
      .as[(Double, Double, Double)].head()
    assert(got._1 == 3.0 && got._2 == 2.0 && got._3 == 1.0, s"got $got")
    // degenerate group (constant x) reports nulls, not a crash
    val deg = Seq(("d", 5L, 1L), ("d", 5L, 2L)).toDF("grp", "x", "y")
    val row = Profiling.groupedOls(deg, "grp", "x", "y")
      .select(col("slope").isNull, col("r2").isNull)
      .as[(Boolean, Boolean)].head()
    assert(row == ((true, true)))
  }

  test("classSeparation: hand-built geometry — tight class vs orthogonal class") {
    // class 0: two identical unit-x vectors -> within mean dot = 1e6/1e6 = 1
    // class 1: one unit-y vector -> cross dot 0
    val emb = Seq(
      (0, Seq(1.0, 0.0)), (0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))
    ).toDF("label", "v")
    val got = MlEval.classSeparation(emb)
      .select(col("label_a"), col("label_b"), col("n_pairs"), col("mean_dot"))
      .as[(Int, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got((0, 0)) == ((2L, 1.0)), s"got $got")   // 2 ordered pairs, dot 1
    assert(got((0, 1)) == ((2L, 0.0)), s"got $got")   // orthogonal
    assert(!got.contains((1, 1)), "singleton class has no pairs")
  }

  test("classifierReport and kappa: hand-computed 2x2 case") {
    // actual a,a,a,b ; predicted a,a,b,b -> tp(a)=2 tp(b)=1
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("actual", "predicted")
    val rep = MlEval.classifierReport(df)
      .select(col("cls"), col("n_true"), col("n_pred"), col("tp"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rep == Map("a" -> ((3L, 2L, 2L)), "b" -> ((1L, 2L, 1L))), rep)
    // kappa: po = 3/4, pe = (3*2 + 1*2)/16 = 1/2 -> kappa = (3/4-1/2)/(1/2) = 0.5
    val k = MlEval.cohensKappa(df).select(col("kappa")).as[Double].head()
    assert(k == 0.5, s"got $k")
    // perfect agreement -> kappa 1; a class in predicted only still counts
    val perfect = Seq(("x", "x"), ("y", "y")).toDF("actual", "predicted")
    assert(MlEval.cohensKappa(perfect).select(col("kappa")).as[Double].head() == 1.0)
  }
}
