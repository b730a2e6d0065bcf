package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unicode normalization laws: composed/decomposed round-trips, NFKC
  * compatibility folding (no DuckDB twin — hand cases), accent stripping,
  * and null/ASCII identity. */
class TextNormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(s: String, form: String): String =
    Seq(s).toDF("t").select(TextNormalize.normalize(col("t"), form))
      .as[String].head()
  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextNormalize.stripAccents(col("t")))
      .as[String].head()

  test("NFC composes, NFD decomposes, and they round-trip") {
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    assert(norm(decomposed, "NFC") == composed)
    assert(norm(composed, "NFD") == decomposed)
    assert(norm(norm(composed, "NFD"), "NFC") == composed)
    // dedup payoff: the two renderings hash identically after NFC
    assert(norm(composed, "NFC") == norm(decomposed, "NFC"))
  }

  test("NFKC folds compatibility characters NFC must preserve") {
    assert(norm("ﬁle", "NFKC") == "file")   // ﬁ ligature
    assert(norm("ﬁle", "NFC") == "ﬁle")
    assert(norm("１２３", "NFKC") == "123") // fullwidth digits
    assert(norm("2³", "NFKC") == "23")      // superscript
  }

  test("stripAccents removes marks, keeps base letters, ASCII is identity") {
    assert(strip("caf\u00e9 na\u00efve \u00e0") == "cafe naive a")
    assert(strip("cafe\u0301") == "cafe")
    val ascii = "plain ascii text 123"
    assert(strip(ascii) == ascii && norm(ascii, "NFKC") == ascii)
  }

  test("SQL surface: unicode_normalize / strip_accents via extensions") {
    val dec = "cafe\u0301" // decomposed on purpose - NFC must recompose it
    val got = spark.sql(
      s"SELECT unicode_normalize('$dec', 'NFC') AS n, " +
        s"strip_accents('$dec') AS s").head()
    assert(got.getString(0) == "caf\u00e9" && got.getString(1) == "cafe")
    intercept[Exception] { spark.sql("SELECT unicode_normalize('x', 'NFX')").head() }
  }

  test("nulls propagate, invalid form rejected at construction") {
    val got = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(TextNormalize.normalize(col("t"), "NFC")).collect()
    assert(got.head.isNullAt(0))
    intercept[IllegalArgumentException] { norm("x", "NFX") }
  }
}
