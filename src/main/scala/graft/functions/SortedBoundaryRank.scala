package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Rank of a long value within a small sorted boundary array: the number of
  * boundaries `<= value`, found by binary search.
  *
  * This is the distributed half of byte-budget chunk assignment
  * (`ChunkAssigner.assignByBytes`): the sequential greedy fold runs over a
  * projected (rn, size) stream and emits only the chunk-start row numbers;
  * every partition then maps `rn -> chunk` locally through this expression
  * against the broadcast-sized boundary array — record payloads never leave
  * their partitions. Codegen'd so the assignment stays inside the
  * whole-stage-codegen span (O(log #chunks) per row).
  */
case class SortedBoundaryRank(child: Expression, boundaries: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_boundary_rank"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    val a = boundaries
    var lo = 0
    var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) <= v) lo = mid + 1 else hi = mid
    }
    java.lang.Long.valueOf(lo.toLong)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("boundaries", boundaries, "long[]")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    nullSafeCodeGen(ctx, ev, c => s"""
      |int $lo = 0;
      |int $hi = $arr.length;
      |while ($lo < $hi) {
      |  int $mid = ($lo + $hi) >>> 1;
      |  if ($arr[$mid] <= $c) $lo = $mid + 1; else $hi = $mid;
      |}
      |${ev.value} = (long) $lo;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SortedBoundaryRank =
    copy(child = newChild)
}

object SortedBoundaryRank {
  def of(value: Column, boundaries: Array[Long]): Column =
    GraftSql.column(SortedBoundaryRank(GraftSql.expression(value), boundaries))
}
