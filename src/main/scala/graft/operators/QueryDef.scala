package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

/** One declared engine query: a Spark DataFrame program plus (optionally) an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Determinism discipline (SURVEY.md §2 Tier B preamble): every oracled query
  * has a total ORDER BY on a unique key prefix; floating-point outputs are
  * rendered as DECIMAL(38,4) strings on BOTH sides (byte-stable across
  * engines, unlike raw doubles); timestamps are rendered as UTC strings.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Render a double deterministically: decimal(38,4) then string.
    * DuckDB twin: CAST(CAST(x AS DECIMAL(38,4)) AS VARCHAR). Both engines
    * round half-away-from-zero on the double→decimal cast. */
  def dec4(c: Column): Column = c.cast(DecimalType(38, 4)).cast(StringType)

  /** Render a timestamp as a second-resolution UTC string.
    * DuckDB twin: strftime(ts, '%Y-%m-%d %H:%M:%S'). */
  def tsSec(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Render a timestamp with microseconds (events.ts carries micros).
    * DuckDB twin: strftime(ts, '%Y-%m-%d %H:%M:%S.%f'). */
  def tsMicro(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Render a timestamp as a date string. DuckDB twin: strftime(ts, '%Y-%m-%d'). */
  def tsDay(c: Column): Column = date_format(c, "yyyy-MM-dd")
}

/** THE corpus tokenizer — single definition so token semantics cannot drift
  * between operator modules (they all oracle against the same DuckDB twin,
  * `list_filter(string_split(text, ' '), x -> x <> '')`). */
object Tok {
  /** Whitespace tokens of `text`, empty strings dropped. */
  def ws(text: Column): Column = filter(split(text, " "), x => x =!= "")
}
