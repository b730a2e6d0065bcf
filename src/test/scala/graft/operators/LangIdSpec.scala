package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Language identification (B275): the synthetic corpus's text is
  * language-independent by construction, so discrimination is proven
  * here on PLANTED multilingual fixtures — real English / French /
  * German / Spanish prose — while q339 gates the deterministic replay
  * against DuckDB. Also pins the operator's edge semantics: gram-less
  * docs fall back to the class prior with the lexicographic tie-break,
  * and a single-language profile yields confidence 0.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val train = Seq(
    (0L, "the cat sat on the mat and the dog slept by the fire while " +
      "the children were reading their books in the evening light", "en"),
    (1L, "she walked through the quiet streets of the old town and " +
      "thought about everything that had happened during the long summer", "en"),
    (2L, "they watched the rain fall against the window all night and " +
      "listened to the sound of the wind in the tall trees", "en"),
    (10L, "le chat dort sur le tapis et le chien reste pres du feu " +
      "pendant que les enfants lisent leurs livres dans la lumiere du soir", "fr"),
    (11L, "elle marche dans les rues calmes de la vieille ville et " +
      "pense a tout ce qui est arrive pendant le long ete", "fr"),
    (12L, "ils regardent la pluie tomber contre la fenetre toute la " +
      "nuit et ecoutent le bruit du vent dans les grands arbres", "fr"),
    (20L, "die katze sitzt auf der matte und der hund schlaeft am " +
      "feuer waehrend die kinder am abend ihre buecher lesen", "de"),
    (21L, "sie geht durch die stillen strassen der alten stadt und " +
      "denkt an alles was im langen sommer geschehen ist", "de"),
    (22L, "sie schauen dem regen zu der die ganze nacht gegen das " +
      "fenster faellt und hoeren den wind in den hohen baeumen", "de"),
    (30L, "el gato duerme sobre la alfombra y el perro esta junto al " +
      "fuego mientras los ninos leen sus libros en la luz de la tarde", "es"),
    (31L, "ella camina por las calles tranquilas de la ciudad vieja y " +
      "piensa en todo lo que paso durante el largo verano", "es"),
    (32L, "ellos miran la lluvia caer contra la ventana toda la noche " +
      "y escuchan el sonido del viento en los arboles altos", "es"))

  private val held = Seq(
    (100L, "the old man opened the door and looked at the grey sky " +
      "over the hills where the morning fog was slowly lifting", "en"),
    (101L, "le vieux monsieur ouvre la porte et regarde le ciel gris " +
      "au dessus des collines ou le brouillard du matin se leve", "fr"),
    (102L, "der alte mann oeffnet die tuer und schaut in den grauen " +
      "himmel ueber den huegeln wo der nebel des morgens steigt", "de"),
    (103L, "el viejo senor abre la puerta y mira el cielo gris sobre " +
      "las colinas donde la niebla de la manana sube despacio", "es"))

  private lazy val profiles =
    LangId.trainProfiles(train.toDF("doc_id", "text", "lang"))
      .localCheckpoint()

  test("planted multilingual fixtures classify correctly") {
    val out = LangId.langId(held.toDF("doc_id", "text", "lang"), profiles)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(3)))
      .toMap
    assert(out(100L)._1 == "en", out.toString)
    assert(out(101L)._1 == "fr", out.toString)
    assert(out(102L)._1 == "de", out.toString)
    assert(out(103L)._1 == "es", out.toString)
    // every decision carries a positive per-gram margin
    out.values.foreach { case (_, conf) =>
      assert(BigDecimal(conf) > 0, conf)
    }
  }

  test("gram-less doc falls back to the prior with lexicographic ties") {
    // one char → zero bigrams → bias-only score; equal class priors tie
    // → smallest lang wins deterministically
    val out = LangId.langId(Seq((7L, "x", "??")).toDF("doc_id", "text", "lang"),
      profiles).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "de")
    assert(BigDecimal(out(0).getString(3)) == 0)
  }

  test("single-language profile scores with confidence 0") {
    val p1 = LangId.trainProfiles(
      train.filter(_._3 == "en").toDF("doc_id", "text", "lang"))
    val out = LangId.langId(held.take(1).toDF("doc_id", "text", "lang"), p1)
      .collect()
    assert(out(0).getString(1) == "en")
    assert(BigDecimal(out(0).getString(3)) == 0)
  }

  test("profiles are model-sized: langs × 65 rows") {
    assert(profiles.count() == 4L * (LangId.NumBuckets + 1))
  }
}
