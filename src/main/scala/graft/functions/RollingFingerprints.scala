package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting via rolling hash + winnowing (the MOSS scheme,
  * Schleimer/Wilkerson/Aiken SIGMOD'03): Rabin–Karp k-gram hashes over the
  * character stream, then the minimum hash per sliding window of w — two
  * documents sharing any sufficiently long run share a fingerprint, which
  * makes the output directly joinable for copy/near-dup detection.
  *
  * Returns the distinct, sorted fingerprint set (sorted → deterministic and
  * cheaply intersectable with array_intersect).
  */
case class RollingFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && window >= 1, s"need k>=2, window>=1; got k=$k w=$window")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_fingerprints"

  private val Base = 1000003L

  override def nullSafeEval(value: Any): Any = {
    val s = value.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // Rabin–Karp rolling hash over chars
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    val grams = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    grams(0) = h
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * pow) * Base + s.charAt(i)
      grams(i - k + 1) = h
      i += 1
    }
    // winnowing: min per window (rightmost min on ties — the robust variant)
    val out = new java.util.TreeSet[java.lang.Long]()
    if (grams.length <= window) {
      var min = grams(0)
      i = 1
      while (i < grams.length) { if (grams(i) <= min) min = grams(i); i += 1 }
      out.add(min)
    } else {
      var start = 0
      while (start + window <= grams.length) {
        var min = grams(start)
        var j = start + 1
        while (j < start + window) { if (grams(j) <= min) min = grams(j); j += 1 }
        out.add(min)
        start += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprints =
    copy(child = newChild)
}

object RollingFingerprints {
  def apply(text: Column, k: Int, window: Int): Column =
    GraftSql.column(new RollingFingerprints(GraftSql.expression(text), k, window))
}
