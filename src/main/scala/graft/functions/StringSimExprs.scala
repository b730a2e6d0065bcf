package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity kernel, byte-based (DuckDB-compatible: its
  * string-similarity functions compare bytes, which coincides with
  * characters on ASCII keys — the match-key normalizer in FuzzyJoin
  * already folds input to [a-z0-9 ]).
  *
  * The algorithm is the textbook one (Winkler 1990), in the exact
  * floating-point evaluation order DuckDB/rapidfuzz uses, so the released
  * doubles are bit-identical across engines, not merely close:
  * jaro = (m/|a| + m/|b| + (m-t)/m) / 3 with the standard match window
  * floor(max/2)-1 (window 0 means "same position only": jw("ab","ba")=0),
  * then the Winkler prefix boost sim + l*0.1*(1-sim) for common prefix
  * l <= 4, applied only when jaro > 0.7. Empty inputs score 0.
  */
object JaroWinklerImpl {

  /** Pure-bytes Jaro–Winkler; the single implementation both eval paths
    * (interpreted + codegen) call. */
  def similarity(va: UTF8String, vb: UTF8String): Double = {
    val a = va.getBytes
    val b = vb.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(la, lb) / 2 - 1
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window, lb - 1)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** jaro_winkler(a, b) — native, codegen'd: one static call per row, no
  * UDF serialization, stays inside WholeStageCodegen. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def of(a: Column, b: Column): Column =
    GraftSql.column(JaroWinkler(GraftSql.expression(a), GraftSql.expression(b)))
}
