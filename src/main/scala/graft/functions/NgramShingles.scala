package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, in first-occurrence order.
  *
  * Equivalent to array_distinct(transform(sequence(...), i →
  * array_join(slice(tokens, i+1, n), " "))) but one native pass — the Column
  * formulation rebuilds a slice array and an interpreted join per position
  * (~2M little allocations per 5k-doc corpus). */
case class NgramShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles"

  override def nullSafeEval(value: Any): Any = {
    val arr = value.asInstanceOf[ArrayData]
    val num = arr.numElements()
    val toks = new Array[UTF8String](num)
    var i = 0
    while (i < num) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    if (num >= n) {
      var start = 0
      while (start <= num - n) {
        seen.add(UTF8String.concatWs(space,
          java.util.Arrays.copyOfRange(toks, start, start + n): _*))
        start += 1
      }
    } else if (num > 0) {
      seen.add(UTF8String.concatWs(space, toks: _*))
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramShingles =
    copy(child = newChild)
}

object NgramShingles {
  def apply(tokens: Column, n: Int): Column =
    GraftSql.column(new NgramShingles(GraftSql.expression(tokens), n))
}
