package graft.streaming

import graft.TestSpark
import graft.operators.LangId
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B286: streaming language-mix PSI monitor — B275's langid scorer
  * composed inside the drift-audit loop. Laws: per-batch rows are
  * row-for-row equal to a direct batch computation (the B190s/B220s
  * parity discipline), an in-mix batch stays under the alarm line, and
  * a single-language flood trips it. */
class LangMixStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val train = Seq(
    (0L, "the cat sat on the mat and the dog slept by the fire while " +
      "the children were reading their books in the evening light", "en"),
    (1L, "she walked through the quiet streets of the old town and " +
      "thought about everything that happened during the long summer", "en"),
    (10L, "le chat dort sur le tapis et le chien reste pres du feu " +
      "pendant que les enfants lisent leurs livres dans la lumiere", "fr"),
    (11L, "elle marche dans les rues calmes de la vieille ville et " +
      "pense a tout ce qui est arrive pendant le long ete", "fr"))

  private val enDocs = Seq(
    "the old man opened the door and looked at the grey sky over the hills",
    "they watched the rain fall against the window all night long",
    "the morning light came slowly over the quiet fields and woods",
    "he wrote a long letter to his brother about the coming winter")
  private val frDocs = Seq(
    "le vieux monsieur ouvre la porte et regarde le ciel gris des collines",
    "ils regardent la pluie tomber contre la fenetre toute la nuit",
    "la lumiere du matin arrive doucement sur les champs tranquilles",
    "il ecrit une longue lettre a son frere sur le prochain hiver")

  test("B286: lang-mix monitor — batch parity, stable mix quiet, flood alarms") {
    val tmp = java.nio.file.Files.createTempDirectory("langmix").toString
    val profiles =
      LangId.trainProfiles(train.toDF("doc_id", "text", "lang"))
        .localCheckpoint()
    // reference mix: balanced en/fr
    val refMix = Seq(("en", 50L), ("fr", 50L)).toDF("lang", "cnt")
      .localCheckpoint()
    // batch 0: balanced (in-mix); batch 1: all-French flood
    val batches = Seq(
      enDocs.take(2).zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
        frDocs.take(2).zipWithIndex.map { case (t, i) => (10L + i, t) },
      frDocs.zipWithIndex.map { case (t, i) => (20L + i, t) })
    val in = MemoryStream[(Long, String)](spark)
    val q = DriftStreaming.startLangMixMonitor(
      in.toDF().toDF("doc_id", "text"), profiles, refMix,
      thresholdMicro = 200000L, outPath = s"$tmp/mix",
      checkpoint = s"$tmp/ck")
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.read.parquet(s"$tmp/mix")
      .select("batch_id", "n_batch", "psi_micro", "alarm")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rows.length == 2, rows.toSeq.toString)
    // row-for-row parity with the direct batch computation
    batches.zipWithIndex.foreach { case (b, i) =>
      val langs = LangId.langId(b.toDF("doc_id", "text"), profiles)
        .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      val direct = LangId.langMixPsi(langs, refMix)
        .select(col("psi_micro")).head().getLong(0)
      assert(rows(i)._3 == direct, s"batch $i: ${rows(i)._3} vs $direct")
    }
    assert(rows(0)._2 == 4L && rows(1)._2 == 4L)
    assert(!rows(0)._4, s"stable mix alarmed: ${rows(0)}")
    assert(rows(1)._4, s"flood did not alarm: ${rows(1)}")
  }

  test("B286: PSI smoothing keeps a missing category finite") {
    // batch has a language the reference has never seen — add-1 smoothing
    // must yield a finite positive PSI, not NULL/∞
    val batch = Seq(("zz", 10L)).toDF("lang", "cnt")
    val ref = Seq(("en", 100L)).toDF("lang", "cnt")
    val r = LangId.langMixPsi(batch, ref).head()
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(r.getAs[Long]("psi_micro") > 0L, r.toString)
  }
}
