package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index as a native expression.
  *
  * The canonical xy2d state machine is a per-level flip+swap recurrence;
  * unrolling it as pure when()/bit Columns triples the (x, y) subtrees at
  * every level — an O(3^bits) expression tree that at bits=8 serialized
  * to a ~112 MiB task binary. The loop belongs in ONE generated function,
  * not in the plan: this expression is O(1) plan size, evaluates the
  * 8-iteration machine in a tight static method, and stays inside
  * WholeStageCodegen. The DuckDB oracle twin keeps the unrolled CTE chain
  * (Layout.hilbertSqlCtes) — per-level CTE columns, linear not
  * exponential, because SQL has no loops.
  */
object HilbertImpl {
  /** Canonical xy2d on the 2^bits x 2^bits grid (flip+swap per level). */
  def index(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** hilbert_index(x, y) for a fixed `bits` — LongType, codegen'd. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && 2 * bits <= 62)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertImpl.index(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.HilbertImpl.index($x, $y, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  def of(x: Column, y: Column, bits: Int): Column =
    GraftSql.column(HilbertIndex(
      GraftSql.expression(x.cast("long")), GraftSql.expression(y.cast("long")),
      bits))
}
