package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered pairs (i < j) from a bucket's member list — the
  * inverted-index pair kernel shared by the exact-Jaccard and simhash
  * candidate generators.
  *
  * Input: array<struct<doc_id: bigint, payload: T>> sorted ascending by
  * doc_id (the [[BoundedCollect]]-capped per-bucket lists); T is whatever
  * the caller carries per doc (shingle count, fingerprint, ...). Output:
  * array<struct<doc_a, doc_b, pa, pb>> with doc_a < doc_b, where pa/pb
  * carry the two payloads.
  *
  * Replaces the `flatten(transform(docs, (a, i) -> transform(slice(...))))`
  * formulation: higher-order functions run interpreted and `slice` copies
  * the tail array per element — O(k²) allocations through the expression
  * interpreter per bucket. This is one tight loop per row; the bucket cap
  * bounds it at C(cap, 2) pairs. At sf1 the lambda pipeline spent ~21 s of
  * q58's edge build in this explosion alone.
  */
case class PairCombos(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private lazy val payloadType: DataType =
    child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fields(1).dataType

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("pa", payloadType, nullable = false),
    StructField("pb", payloadType, nullable = false))), containsNull = false)

  override def prettyName: String = "pair_combos"

  override def nullSafeEval(value: Any): Any = {
    val arr = value.asInstanceOf[ArrayData]
    val k = arr.numElements()
    val out = new Array[Any](k * (k - 1) / 2)
    var idx = 0
    var i = 0
    while (i < k) {
      val a = arr.getStruct(i, 2)
      val ida = a.getLong(0)
      val pa = InternalRow.copyValue(a.get(1, payloadType))
      var j = i + 1
      while (j < k) {
        val b = arr.getStruct(j, 2)
        out(idx) = InternalRow(ida, b.getLong(0), pa,
          InternalRow.copyValue(b.get(1, payloadType)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombos =
    copy(child = newChild)
}

object PairCombos {
  def of(docs: Column): Column =
    GraftSql.column(PairCombos(GraftSql.expression(docs)))
}
