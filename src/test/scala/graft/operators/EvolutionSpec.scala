package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Evolved-union laws: numeric widening, null-fill for late columns,
  * column order by first appearance, and loud failure on real conflicts. */
class EvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("widens int→long, null-fills missing columns, keeps every row") {
    val old = Seq((1, "a"), (2, "b")).toDF("id", "text")            // int id
    val neu = Seq((3L, "c", "en")).toDF("id", "text", "lang")       // long id
    val got = Evolution.unionEvolved(Seq(old, neu))
    assert(got.schema("id").dataType == LongType)
    assert(got.columns.toSeq == Seq("id", "text", "lang"))
    val rows = got.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq ==
      Seq((1L, "a", null), (2L, "b", null), (3L, "c", "en")))
  }

  test("int ⊔ float widens through double (float can't hold all ints)") {
    val a = Seq(Tuple1(16777217)).toDF("v")            // 2^24+1: breaks float
    val b = Seq(Tuple1(1.5f)).toDF("v")
    val got = Evolution.unionEvolved(Seq(a, b))
    assert(got.schema("v").dataType == DoubleType)
    assert(got.as[Double].collect().toSet == Set(16777217.0, 1.5))
  }

  test("array element types widen like atomics") {
    val a = Seq(Tuple1(Seq(1, 2))).toDF("v")
    val b = Seq(Tuple1(Seq(3L))).toDF("v")
    val got = Evolution.unionEvolved(Seq(a, b))
    assert(got.schema("v").dataType == ArrayType(LongType, containsNull = false))
  }

  test("a genuine type conflict fails loud, naming the column") {
    val a = Seq(Tuple1("x")).toDF("v")
    val b = Seq(Tuple1(1)).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Evolution.unionEvolved(Seq(a, b))
    }
    assert(e.getMessage.contains("'v'"))
  }
}
