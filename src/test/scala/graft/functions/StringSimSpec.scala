package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Jaro–Winkler kernel pinned to the textbook values (the same ones
  * DuckDB's jaro_winkler_similarity returns — verified against it when
  * q205's oracle hash-matches), plus edge cases and SQL registration. */
class StringSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(JaroWinkler.of(col("a"), col("b")).as("s")).as[Double].head()

  test("textbook reference values (bit-exact doubles)") {
    // jaro(martha, marhta) = (6/6 + 6/6 + 5/6)/3; prefix 3
    val jMartha = (1.0 + 1.0 + 5.0 / 6.0) / 3.0
    assert(jw("martha", "marhta") == jMartha + 3 * 0.1 * (1.0 - jMartha))
    // jaro(dwayne, duane): m=4, t=0 -> (4/6 + 4/5 + 4/4)/3; prefix 1
    val jDwayne = (4.0 / 6.0 + 4.0 / 5.0 + 1.0) / 3.0
    assert(jw("dwayne", "duane") == jDwayne + 0.1 * (1.0 - jDwayne))
    // jaro(dixon, dicksonx): m=4, t=0 -> (4/5 + 4/8 + 1)/3; prefix 2
    val jDixon = (4.0 / 5.0 + 4.0 / 8.0 + 1.0) / 3.0
    assert(jw("dixon", "dicksonx") == jDixon + 2 * 0.1 * (1.0 - jDixon))
    // crate/trace: jaro 0.7333 > 0.7 but zero shared prefix -> unchanged
    assert(jw("crate", "trace") == (3.0 / 5.0 + 3.0 / 5.0 + 1.0) / 3.0)
  }

  test("edge cases: window 0, empties, identity, boost gating") {
    assert(jw("ab", "ba") == 0.0) // window floor(2/2)-1 = 0: no matches
    assert(jw("", "abc") == 0.0)
    assert(jw("", "") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0)
    // below the 0.7 boost threshold the prefix must NOT be rewarded:
    // abcdef vs abm...: m=2 (a,b), jaro = (2/6 + 2/6 + 1)/3 = 0.5556
    val noBoost = jw("abcdef", "abmnop")
    assert(noBoost == (2.0 / 6.0 + 2.0 / 6.0 + 1.0) / 3.0 && noBoost < 0.7)
  }

  test("interpreted eval equals codegen eval") {
    val pairs = Seq(("martha", "marhta"), ("dwayne", "duane"),
      ("crate", "trace"), ("ab", "ba"), ("same", "same"), ("", "x"))
    val df = pairs.toDF("a", "b")
    val viaCodegen = df.select(JaroWinkler.of(col("a"), col("b")))
      .as[Double].collect().toSeq
    // force the interpreted path: filter on the expression inside a
    // non-codegen context by evaluating row-by-row
    val viaImpl = pairs.map { case (a, b) =>
      JaroWinklerImpl.similarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }
    assert(viaCodegen == viaImpl)
  }

  test("SQL-registered and null-propagating") {
    val got = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta'), jaro_winkler(NULL, 'x')")
      .collect().head
    assert(math.abs(got.getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(got.isNullAt(1))
  }
}
