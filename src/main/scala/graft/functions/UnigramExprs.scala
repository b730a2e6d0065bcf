package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenization APPLY — the SentencePiece-style counterpart of
  * [[BpeEncode]]: instead of replaying merges, each whitespace word is
  * segmented by Viterbi into the piece sequence with the highest total
  * log-probability under a frozen piece table.
  *
  * Determinism contract (the cross-engine law the oracle replays): every
  * piece score is an INTEGER micro-nat (floor of 10⁶·ln p — strictly
  * negative), and the DP maximizes the single combined integer
  * `score·2²⁰ − n_pieces` — i.e. highest probability first, fewest pieces
  * on a probability tie. Characters absent from the table score
  * `oovMicro` (single-char fallback), which makes segmentation total:
  * every word has at least its character spelling. Remaining boundary
  * ties (same score AND same piece count) resolve to the longest final
  * piece (smallest split point), scanned deterministically — only the
  * token strings can differ under such a tie, never the (count, logp)
  * pair, which is why the oracled query reports counts and log-prob
  * rather than token text.
  *
  * The piece table rides inside the expression like [[BpeEncode]]'s merge
  * table — serialized once per task with the plan, no join, no UDF. A
  * production 32k-piece table is ~0.5 MB of plan; per-word cost is
  * O(len · maxPieceLen) hash probes.
  *
  * Output: struct<toks array<string>, n_pieces bigint, micro_logp bigint>
  * over ALL words of the input (ASCII-space split, matching `Tok.ws`).
  */
case class UnigramEncode(child: Expression, pieces: Array[(String, Long)],
    oovMicro: Long) extends UnaryExpression with CodegenFallback {

  require(pieces.nonEmpty && pieces.forall(_._2 < 0) && oovMicro < 0,
    "unigram piece scores must be strictly negative micro-nats")

  override def dataType: DataType = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("micro_logp", LongType, nullable = false)))

  override def prettyName: String = "unigram_encode"

  /** Combined-key scale: supports words to 2²⁰ pieces, far beyond any
    * real token stream's word length. */
  private val M = 1L << 20

  @transient private lazy val scoreOf: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.foreach { case (p, s) => m.put(p, s) }
    m
  }
  @transient private lazy val maxLen: Int =
    math.max(1, pieces.iterator.map(_._1.length).max)

  override def nullSafeEval(input: Any): Any = {
    val text = input.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var totalToks = 0L
    var totalLogp = 0L
    var w0 = 0
    val n = text.length
    while (w0 <= n) {
      var w1 = text.indexOf(' ', w0)
      if (w1 < 0) w1 = n
      if (w1 > w0) {
        val (nt, lp) = encodeWord(text.substring(w0, w1), out)
        totalToks += nt
        totalLogp += lp
      }
      w0 = w1 + 1
    }
    InternalRow(new GenericArrayData(out.toArray), totalToks, totalLogp)
  }

  /** Viterbi over word positions; appends tokens, returns (count, logp). */
  private def encodeWord(w: String,
      out: scala.collection.mutable.ArrayBuffer[Any]): (Long, Long) = {
    val n = w.length
    val dp = new Array[Long](n + 1) // combined key: score·M − n_pieces
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MinValue
      var bestJ = -1
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val s = scoreOf.get(w.substring(j, i))
        val sc: Long =
          if (s != null) s.longValue()
          else if (i - j == 1) oovMicro
          else Long.MinValue
        if (sc != Long.MinValue) {
          val cand = dp(j) + sc * M - 1
          // strict '>' with ascending j keeps the SMALLEST j on a tie —
          // the longest-final-piece rule from the scaladoc
          if (cand > best) { best = cand; bestJ = j }
        }
        j += 1
      }
      dp(i) = best
      back(i) = bestJ
      i += 1
    }
    // backtrace boundaries right-to-left, emit tokens left-to-right
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = n
    while (p > 0) { bounds += p; p = back(p) }
    var start = 0
    var k = bounds.length - 1
    var ntok = 0L
    while (k >= 0) {
      out += UTF8String.fromString(w.substring(start, bounds(k)))
      start = bounds(k)
      ntok += 1
      k -= 1
    }
    // recover the score sum from the combined key: dp(n) = S·M − ntok
    // exactly, and the backtrace counted exactly ntok pieces
    (ntok, (dp(n) + ntok) / M)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramExprs {
  /** unigram_encode(text) under a frozen (piece → micro-nat) table. */
  def unigramEncode(text: Column, pieces: Seq[(String, Long)],
      oovMicro: Long): Column =
    GraftSql.column(UnigramEncode(GraftSql.expression(text), pieces.toArray,
      oovMicro))
}
