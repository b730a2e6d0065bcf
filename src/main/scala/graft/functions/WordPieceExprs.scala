package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** WordPiece tokenization APPLY — the third tokenizer family next to
  * [[BpeEncode]] (merge replay) and [[UnigramEncode]] (Viterbi): BERT's
  * greedy longest-match-first segmentation. Per whitespace word, scan from
  * the left; at each position take the LONGEST vocabulary piece that
  * matches (word-initial pieces at position 0, continuation pieces — the
  * "##x" entries, stored here without the marker — after); if no piece
  * matches at some position, the ENTIRE word becomes one [UNK] token
  * (the BERT rule: unknown words are not partially segmented).
  *
  * Determinism contract: greedy longest-match has NO ties (lengths are
  * distinct integers; the matched piece of a given length is unique), so
  * the piece count and UNK count are pure string functions — the oracle
  * replays the identical recurrence as a recursive CTE over word
  * positions generated from the SAME vocab constants.
  *
  * Both vocab sets ride in the expression like the sibling encoders'
  * tables — serialized once per task with the plan, no join, no UDF. A
  * production 30k-piece vocab is ~0.3 MB of plan; per-word cost is
  * O(len · maxPieceLen) hash probes.
  *
  * Output: struct<n_words, n_pieces, n_unk> over all ASCII-space words.
  */
case class WordPieceEncode(child: Expression, starts: Array[String],
    conts: Array[String]) extends UnaryExpression with CodegenFallback {

  require(starts.nonEmpty, "wordpiece needs a non-empty start vocabulary")

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false)))

  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val startSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](starts.length * 2)
    starts.foreach(s.add)
    s
  }
  @transient private lazy val contSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](conts.length * 2)
    conts.foreach(s.add)
    s
  }
  @transient private lazy val maxLen: Int =
    math.max(1, (starts.iterator ++ conts.iterator).map(_.length).max)

  override def nullSafeEval(input: Any): Any = {
    val text = input.toString
    var words = 0L
    var pieces = 0L
    var unks = 0L
    var w0 = 0
    val n = text.length
    while (w0 <= n) {
      var w1 = text.indexOf(' ', w0)
      if (w1 < 0) w1 = n
      if (w1 > w0) {
        words += 1
        val (np, unk) = encodeWord(text, w0, w1)
        pieces += np
        if (unk) unks += 1
      }
      w0 = w1 + 1
    }
    InternalRow(words, pieces, unks)
  }

  /** Greedy longest-match over text[from, until); (n_pieces, is_unk). */
  private def encodeWord(text: String, from: Int, until: Int): (Long, Boolean) = {
    var pos = from
    var np = 0L
    while (pos < until) {
      val vocab = if (pos == from) startSet else contSet
      var len = math.min(maxLen, until - pos)
      var matched = 0
      while (len > 0 && matched == 0) {
        if (vocab.contains(text.substring(pos, pos + len))) matched = len
        else len -= 1
      }
      if (matched == 0) return (1L, true) // whole word -> [UNK]
      np += 1
      pos += matched
    }
    (np, false)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

object WordPieceExprs {
  /** wordpiece_encode(text): struct(n_words, n_pieces, n_unk). */
  def wordpieceEncode(text: Column, starts: Seq[String],
      conts: Seq[String]): Column =
    GraftSql.column(WordPieceEncode(GraftSql.expression(text),
      starts.toArray, conts.toArray))
}
