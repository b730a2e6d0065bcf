package graft.canon

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical JSON serialization — the engine's equivalent of the reference's
  * deterministic wire/checksum form (orjson OPT_SORT_KEYS + Decimal→float,
  * `app/services/data_integrity_manager.py:25,29-36`,
  * `app/utils/json_decimal_encoder.py:6-9`).
  *
  * Engine-defined spec (SURVEY.md §7.4 #2 — cross-language byte parity with
  * Python is NOT required; sender, receiver and oracle all use this spec):
  *   - object keys sorted lexicographically (by UTF-16 code unit) at every
  *     nesting level — struct fields AND map keys;
  *   - strings JSON-escaped: `"` `\` as `\"` `\\`, control chars as
  *     `\b \f \n \r \t` or `\u00XX`;
  *   - integral types as plain integers; Decimal via toPlainString
  *     (exact, no exponent); Double/Float via Java shortest repr;
  *   - booleans `true`/`false`, missing/None as `null`;
  *   - no whitespace.
  *
  * Implemented as a native Catalyst [[Expression]] (not a Scala UDF) so it
  * stays null-aware, serializable into the plan, and SQL-registrable. Eval is
  * interpreted (CodegenFallback): it sits in checksum aggregations where the
  * sha2 dominates, not in scan-side hot loops.
  */
case class CanonicalJsonExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "canonical_json"

  override def eval(input: InternalRow): Any = {
    val sb = new java.lang.StringBuilder(64)
    CanonicalJson.write(sb, child.eval(input), child.dataType)
    UTF8String.fromString(sb.toString)
  }

  // eval is overridden directly (null child value renders as JSON null).
  override def nullSafeEval(value: Any): Any =
    throw new IllegalStateException("unreachable: eval is overridden")

  override protected def withNewChildInternal(newChild: Expression): CanonicalJsonExpr =
    copy(child = newChild)
}

object CanonicalJson {

  /** Render one Spark SQL value (Catalyst internal representation) as
    * canonical JSON into `sb`. */
  def write(sb: java.lang.StringBuilder, value: Any, dt: DataType): Unit = value match {
    case null => sb.append("null")
    case _ => dt match {
      case StringType => writeString(sb, value.asInstanceOf[UTF8String].toString)
      case BooleanType => sb.append(value.asInstanceOf[Boolean])
      case ByteType | ShortType | IntegerType | LongType => sb.append(value.toString)
      case FloatType => writeDouble(sb, value.asInstanceOf[Float].toDouble)
      case DoubleType => writeDouble(sb, value.asInstanceOf[Double])
      case _: DecimalType =>
        sb.append(value.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.toPlainString)
      case DateType => // days since epoch → ISO date string
        writeString(sb, java.time.LocalDate.ofEpochDay(value.asInstanceOf[Int].toLong).toString)
      case TimestampType => // micros since epoch → ISO instant string
        val micros = value.asInstanceOf[Long]
        val inst = java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
        writeString(sb, inst.toString)
      case TimestampNTZType => // wall-clock micros → ISO local datetime string
        val micros = value.asInstanceOf[Long]
        val ldt = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
        // LocalDateTime.toString drops ":00" seconds at whole minutes —
        // pin seconds so one column has one lexical format
        val s = ldt.toString
        writeString(sb, if (s.length == 16) s + ":00" else s)
      case BinaryType =>
        writeString(sb, java.util.Base64.getEncoder.encodeToString(value.asInstanceOf[Array[Byte]]))
      case st: StructType =>
        val row = value.asInstanceOf[InternalRow]
        sb.append('{')
        val order = st.fields.zipWithIndex.sortBy(_._1.name)
        var first = true
        order.foreach { case (f, i) =>
          if (!first) sb.append(',')
          first = false
          writeString(sb, f.name)
          sb.append(':')
          write(sb, if (row.isNullAt(i)) null else row.get(i, f.dataType), f.dataType)
        }
        sb.append('}')
      case at: ArrayType =>
        val arr = value.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(',')
          write(sb, if (arr.isNullAt(i)) null else arr.get(i, at.elementType), at.elementType)
          i += 1
        }
        sb.append(']')
      case mt: MapType =>
        val m = value.asInstanceOf[MapData]
        val keys = m.keyArray()
        val vals = m.valueArray()
        val n = m.numElements()
        // sort entries by the RAW key string (UTF-16 code units) — the same
        // order MiniJson and the struct-field sort use; escaping happens at
        // emission only, so "a\n" sorts before "a0" on both ends
        val entries = (0 until n).map { i =>
          val raw = mt.keyType match {
            case StringType if !keys.isNullAt(i) =>
              keys.getUTF8String(i).toString
            case other =>
              val kSb = new java.lang.StringBuilder(16)
              write(kSb, if (keys.isNullAt(i)) null else keys.get(i, other), other)
              val r = kSb.toString
              // key types whose rendering is itself quoted (date, timestamp,
              // binary) contribute the INNER lexeme — emission re-quotes
              if (r.length >= 2 && r.charAt(0) == '"' && r.charAt(r.length - 1) == '"')
                r.substring(1, r.length - 1)
              else r
          }
          (raw, i)
        }.sortBy(_._1)
        sb.append('{')
        entries.zipWithIndex.foreach { case ((k, i), j) =>
          if (j > 0) sb.append(',')
          writeString(sb, k)
          sb.append(':')
          write(sb, if (vals.isNullAt(i)) null else vals.get(i, mt.valueType), mt.valueType)
        }
        sb.append('}')
      case other =>
        throw new UnsupportedOperationException(s"canonical_json: unsupported type $other")
    }
  }

  private def writeDouble(sb: java.lang.StringBuilder, d: Double): Unit =
    if (d.isNaN || d.isInfinite) sb.append("null") // JSON has no NaN/Inf
    else if (d == Math.rint(d) && Math.abs(d) < 1e15) {
      sb.append(d.toLong) // integral doubles render without ".0" — stable
    } else sb.append(java.lang.Double.toString(d))

  private def writeString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Column API: `CanonicalJson(struct(...))` → string column. */
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      CanonicalJsonExpr(org.apache.spark.sql.GraftSql.expression(c)))

  /** Register `canonical_json` for SQL use (B38 / Q33). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canonical_json", exprs => CanonicalJsonExpr(exprs.head), "built-in")
}
