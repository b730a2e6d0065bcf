package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for dedup robustness: the same visible text can
  * arrive composed (é = U+00E9) or decomposed (e + U+0301) depending on the
  * crawler/OS that produced it, and hash-based dedup treats those as
  * different documents unless the corpus is normalized first. Spark has no
  * built-in normalizer, so these are native expressions over the JDK's
  * Normalizer (the ICU-standard forms); DuckDB's `nfc_normalize` /
  * `strip_accents` give the oracle the same canonical forms.
  *
  * NFC/NFD are the dedup-safe canonical forms (lossless round-trip);
  * NFKC/NFKD additionally fold compatibility characters (ligatures,
  * fullwidth digits) — lossy, but what text pipelines usually want before
  * tokenization (covered by spec, not oracled: DuckDB lacks NFKC). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unknown normalization form $form")
  private val jform = Normalizer.Form.valueOf(form)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(value: Any): Any = {
    val s = value.asInstanceOf[UTF8String].toString
    // fast path: Normalizer.isNormalized is a cheap scan and true for
    // virtually all real text (pure ASCII always) — skip the rebuild
    if (Normalizer.isNormalized(s, jform)) value
    else UTF8String.fromString(Normalizer.normalize(s, jform))
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** NFD-decompose then drop combining marks (Mn) — 'café' → 'cafe'.
  * DuckDB twin: strip_accents(). */
case class StripAccents(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(value: Any): Any = {
    val s = value.asInstanceOf[UTF8String].toString
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object TextNormalize {
  def normalize(c: Column, form: String): Column =
    GraftSql.column(UnicodeNormalize(GraftSql.expression(c), form))
  def stripAccents(c: Column): Column =
    GraftSql.column(StripAccents(GraftSql.expression(c)))
}
