package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Count of cross pairs (a, b) with a.price < b.price between two
  * count-compressed price distributions.
  *
  * Input: two arrays of struct(price: double, cnt: long), each sorted
  * ascending by price (prices unique within an array — they come from a
  * groupBy on price). Output: Σ_b cnt_b · (Σ_{price_a < price_b} cnt_a),
  * computed with a two-pointer merge in O(|a| + |b|).
  *
  * This is the kernel that turns a band self-join (row × row on a
  * ~50-value equi key — quadratic pair space on a skewed shuffle) into a
  * linear aggregation: each side first collapses to its bounded
  * (key, price) → cnt domain, and only the tiny compressed distributions
  * ever meet.
  */
case class CrossPairCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "cross_pair_count"

  override def nullSafeEval(leftVal: Any, rightVal: Any): Any = {
    val a = leftVal.asInstanceOf[ArrayData]
    val b = rightVal.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var total = 0L
    var cumA = 0L // running count of a-elements with price < current b price
    var i = 0
    var j = 0
    while (j < nb) {
      val rb = b.getStruct(j, 2)
      val pb = rb.getDouble(0)
      while (i < na && a.getStruct(i, 2).getDouble(0) < pb) {
        cumA += a.getStruct(i, 2).getLong(1)
        i += 1
      }
      total += cumA * rb.getLong(1)
      j += 1
    }
    java.lang.Long.valueOf(total)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CrossPairCount =
    copy(left = newLeft, right = newRight)
}

object PairCountExpr {
  def crossPairCount(a: Column, b: Column): Column =
    GraftSql.column(CrossPairCount(GraftSql.expression(a), GraftSql.expression(b)))
}
