package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Frozen n-gram LM scoring as ONE stateless expression — the streaming /
  * shuffle-free twin of `TextAnalysis.ngramLmScoreBroadcast`.
  *
  * The trained, frequency-floored model (integer micro-nat weights for
  * kept bigrams, backoff weights per unigram, one OOV constant) rides
  * inside the plan like `BpeEncode`'s merge table and `NearestCells`'
  * centroids: scoring a document is a single fold over its own adjacent
  * token pairs — no explode, no join, no per-doc shuffle, and therefore
  * runs UNCHANGED on a streaming DataFrame (the frozen-model discipline:
  * the model is trained offline, like IVF centroids are frozen at stream
  * start). Weights are exact integers, so results are bit-identical to
  * the broadcast-join formulation that trained them.
  *
  * Tokenization replicates the suite-wide `Tok.ws`: split on ASCII space,
  * empty strings dropped.
  */
case class LmScoreExpr(
    child: Expression,
    bigram: Map[(String, String), Long],
    unigram: Map[String, Long],
    oovMicro: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_pairs", LongType, nullable = false),
    StructField("micro_logp", LongType, nullable = false)))
  override def prettyName: String = "lm_score"

  override def nullSafeEval(input: Any): Any = {
    val text = input.toString
    var nPairs = 0L
    var sum = 0L
    var prev: String = null
    var w0 = 0
    val n = text.length
    while (w0 <= n) {
      var w1 = text.indexOf(' ', w0)
      if (w1 < 0) w1 = n
      if (w1 > w0) {
        val tok = text.substring(w0, w1)
        if (prev != null) {
          nPairs += 1
          sum += bigram.getOrElse((prev, tok),
            unigram.getOrElse(tok, oovMicro))
        }
        prev = tok
      }
      w0 = w1 + 1
    }
    InternalRow(nPairs, sum)
  }

  override protected def withNewChildInternal(newChild: Expression): LmScoreExpr =
    copy(child = newChild)
}

object LmExprs {
  /** lm_score(text): (n_pairs, micro_logp) under a frozen integerized LM. */
  def lmScore(text: Column, bigram: Map[(String, String), Long],
      unigram: Map[String, Long], oovMicro: Long): Column =
    GraftSql.column(LmScoreExpr(GraftSql.expression(text), bigram, unigram,
      oovMicro))
}
