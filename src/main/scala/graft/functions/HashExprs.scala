package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions for the near-dup operators.
  *
  * The pure-Column formulations (64-way zip_with aggregates) evaluate a deep
  * interpreted expression tree per token — ~ms/doc. These expressions do the
  * same math in a tight loop over the token array — one eval call per row,
  * no per-token expression dispatch. Hashing is Spark's own XXH64.
  */

/** 64-bit SimHash over an array<string> of tokens: bit b of the output is
  * the sign of Σ_tokens (bit b of xxh64(token) ? +1 : -1). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(value: Any): Any = {
    val arr = value.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature over an array<string> of shingles: H permutation-free
  * hashes via the Carter–Wegman trick h_i = h1 + i·h2 (two real xxh64 passes
  * per shingle, H mults) — the standard MMDS construction. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(value: Any): Any = {
    val arr = value.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28cL)
        var k = 0
        var hk = h1
        while (k < numHashes) {
          if (hk < mins(k)) mins(k) = hk
          hk += h2 // h_i = h1 + i*h2, accumulated
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object HashExprs {
  def simhash64(tokens: Column): Column =
    GraftSql.column(SimHash64(GraftSql.expression(tokens)))

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    GraftSql.column(MinHashSignature(GraftSql.expression(shingles), numHashes))

  /** SQL registration: simhash64(arr), minhash_signature(arr, h). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", exprs => MinHashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "built-in")
  }
}
