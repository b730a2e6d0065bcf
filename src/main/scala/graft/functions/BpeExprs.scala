package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenization APPLY — the encode side that turns a trained merge
  * table into real token counts (the training inner loop, pair counting,
  * is `TextAnalysis.bpePairCounts` / q83).
  *
  * Semantics: per whitespace word, start from single characters and apply
  * each merge of the table IN RANK ORDER, one leftmost-non-overlapping
  * pass per merge. For a well-formed merge table (each merge's two parts
  * are characters or products of strictly earlier merges — the only kind
  * BPE training can emit, since a pair must exist before it can be
  * counted), this is provably identical to the classic
  * highest-rank-pair-first loop: when merge i runs, everything formable by
  * merges < i already exists, and no later merge can manufacture a new
  * occurrence of pair i (its parts would have to BE pair i's parts, which
  * are only produced earlier).
  *
  * The merge table rides inside the expression like `NearestCells`
  * centroids — serialized once per task with the plan, no join, no UDF
  * registry. A production 32k-merge table is ~0.5 MB of plan: still
  * broadcast-sized; per-word cost is |merges| linear passes, so hot tables
  * should stay in rank order and prune merges that never fire on the
  * domain.
  *
  * Contract: input should already be normalized (the oracled query feeds
  * `lower` + strip-to-[a-z0-9 ]); tokens are compared as exact strings, and
  * words are split on ASCII space only — matching the suite-wide `Tok.ws`
  * tokenizer.
  */
case class BpeEncode(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any = {
    val text = input.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var w0 = 0
    val n = text.length
    while (w0 <= n) {
      var w1 = text.indexOf(' ', w0)
      if (w1 < 0) w1 = n
      if (w1 > w0) encodeWord(text, w0, w1, out)
      w0 = w1 + 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Encode text[from, until) into `out` as UTF8String tokens. */
  private def encodeWord(text: String, from: Int, until: Int,
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    var toks = new Array[String](until - from)
    var i = 0
    while (i < toks.length) {
      toks(i) = String.valueOf(text.charAt(from + i))
      i += 1
    }
    var m = 0
    while (m < merges.length && toks.length >= 2) {
      val l = merges(m)._1
      val r = merges(m)._2
      // one leftmost-non-overlapping pass: a token created by this pass is
      // never reconsidered by the SAME pass (BPE's string-replace law)
      var found = false
      var j = 0
      while (!found && j < toks.length - 1) {
        found = toks(j) == l && toks(j + 1) == r
        j += 1
      }
      if (found) {
        val nt = scala.collection.mutable.ArrayBuffer.empty[String]
        var p = 0
        while (p < toks.length) {
          if (p + 1 < toks.length && toks(p) == l && toks(p + 1) == r) {
            nt += l + r
            p += 2
          } else {
            nt += toks(p)
            p += 1
          }
        }
        toks = nt.toArray
      }
      m += 1
    }
    i = 0
    while (i < toks.length) {
      out += UTF8String.fromString(toks(i))
      i += 1
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeExprs {
  /** bpe_encode(text): BPE tokens of normalized `text` under `merges`. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    GraftSql.column(BpeEncode(GraftSql.expression(text), merges.toArray))
}
