package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math for the similarity operators — a dot product over
  * array<double> in one tight loop. The higher-order-function formulation
  * (aggregate ∘ zip_with) allocates an intermediate array and dispatches an
  * interpreted lambda per element; at 64 dims × millions of candidate pairs
  * that's the dominant ANN cost. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // real codegen (not CodegenFallback): the dot product is the innermost
  // op of every brute-force cosine scan — a fallback here drops the whole
  // projection out of whole-stage codegen and pays an interpreted eval
  // dispatch per pair. The generated loop is the same tight loop as eval.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** The `nprobe` nearest centroids of a vector, by L2, as an array of cell
  * indices (ascending distance; ties → lower index). One eval computes all
  * k dot products in tight loops — replacing a per-row expression tree of
  * k struct builds + array_sort + 2k dot_product dispatches, the dominant
  * IVF assignment cost. Distance is the same c·c − 2·v·c ranking the
  * Column formulation used (v·v is constant per row). */
case class NearestCells(child: Expression, centroids: Array[Array[Double]],
    nprobe: Int) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private lazy val cc: Array[Double] = centroids.map { c =>
    var s = 0.0; var j = 0
    while (j < c.length) { s += c(j) * c(j); j += 1 }
    s
  }

  override def nullSafeEval(value: Any): Any = {
    val v = value.asInstanceOf[ArrayData]
    val k = centroids.length
    val d = new Array[Double](k)
    var i = 0
    while (i < k) {
      val c = centroids(i)
      val n = math.min(v.numElements(), c.length)
      var vc = 0.0
      var j = 0
      while (j < n) { vc += v.getDouble(j) * c(j); j += 1 }
      d(i) = cc(i) - 2.0 * vc
      i += 1
    }
    val m = math.min(nprobe, k)
    val out = new Array[Int](m)
    val used = new Array[Boolean](k)
    var s = 0
    while (s < m) {
      var best = -1
      var bd = Double.PositiveInfinity
      var t = 0
      while (t < k) {
        // `best == -1` guard: a NaN distance (NaN vector component) never
        // wins a `<` comparison — without it every slot could stay -1
        if (!used(t) && (best == -1 || d(t) < bd)) { bd = d(t); best = t }
        t += 1
      }
      used(best) = true
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** Dot product of a full-precision query (array<double>) against an int8
  * quantized vector (array<tinyint>) — the scoring kernel of the quantized
  * IVF tier. Returns the RAW integer-weighted sum; the caller multiplies by
  * the stored per-vector scale. One tight loop, no dequantized array ever
  * materializes. */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // a silent min-length truncation would return plausible-but-wrong
    // partial scores when a query's dimension disagrees with the index
    // (e.g. an index built from an older embedding model) — that is a
    // caller error and must surface as one
    require(n == b.numElements(),
      s"int8_dot: dimension mismatch — query has $n components, " +
        s"quantized vector has ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getByte(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encoder: splits a d-dim vector into m contiguous
  * subvectors and replaces each with the index of its nearest codebook
  * centroid — m bytes per vector, the 100 TB ANN storage tier below int8.
  * codebooks(j)(c) is centroid c of subvector j. Same distance ranking as
  * [[NearestCells]] (c·c − 2·v·c per subvector; ties → lower code). */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val cc: Array[Array[Double]] =
    codebooks.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })

  override def nullSafeEval(value: Any): Any = {
    val v = value.asInstanceOf[ArrayData]
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    require(v.numElements() == m * sub,
      s"pq_encode: vector has ${v.numElements()} components, codebooks " +
        s"cover ${m * sub}")
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      var best = 0
      var bd = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var vc = 0.0
        var i = 0
        while (i < sub) { vc += v.getDouble(j * sub + i) * cent(i); i += 1 }
        val d = cc(j)(c) - 2.0 * vc
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric-distance scoring kernel: approximate dot(query, original) as
  * sum over subvectors of dot(q_sub_j, codebook_j(code_j)) — the query in
  * full precision, the corpus vector reconstructed code-by-code without
  * ever materializing the reconstruction. */
case class PqDot(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_dot"

  override def nullSafeEval(q: Any, codes: Any): Any = {
    val a = q.asInstanceOf[ArrayData]
    val b = codes.asInstanceOf[ArrayData]
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    require(b.numElements() == m && a.numElements() == m * sub,
      s"pq_dot: ${a.numElements()}-dim query vs ${b.numElements()} codes " +
        s"under ${m}x$sub codebooks")
    var acc = 0.0
    var j = 0
    while (j < m) {
      val cent = codebooks(j)(java.lang.Byte.toUnsignedInt(b.getByte(j)))
      var i = 0
      while (i < sub) { acc += a.getDouble(j * sub + i) * cent(i); i += 1 }
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqDot =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  def dotProduct(a: Column, b: Column): Column =
    GraftSql.column(DotProduct(GraftSql.expression(a), GraftSql.expression(b)))

  def int8Dot(a: Column, b: Column): Column =
    GraftSql.column(Int8Dot(GraftSql.expression(a), GraftSql.expression(b)))

  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSql.column(PqEncode(GraftSql.expression(v), codebooks))

  def pqDot(q: Column, codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSql.column(PqDot(GraftSql.expression(q), GraftSql.expression(codes), codebooks))

  def nearestCells(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    GraftSql.column(NearestCells(GraftSql.expression(v), centroids, nprobe))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
}
