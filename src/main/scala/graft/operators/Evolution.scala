package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution across shard generations. A corpus written over months
  * drifts: early shards carry narrower numeric types, later shards add
  * columns. Reading "the whole corpus" must not force a rewrite of old
  * shards — the union widens numerics (the lossless ladder only),
  * null-fills columns a generation predates, and keeps every row.
  *
  * Deliberately STRICT beyond that: a name whose types do not share a
  * lossless widening (string vs int, decimal drift) fails with a named
  * error instead of silently coercing — a type conflict in a 100 TB
  * corpus is a data bug to surface, not paper over. (Parquet's own
  * `mergeSchema` handles the same-type/new-column case at scan time; this
  * operator is for already-loaded frames and adds the numeric ladder.)
  */
object Evolution {

  /** Lossless widening of two atomic types, if one exists. */
  private def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case _ if a == b => Some(a)
    case (x: ArrayType, y: ArrayType) =>
      widen(x.elementType, y.elementType)
        .map(e => ArrayType(e, x.containsNull || y.containsNull))
    case _ =>
      val ints: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
      val floats: Seq[DataType] = Seq(FloatType, DoubleType)
      val ia = ints.indexOf(a); val ib = ints.indexOf(b)
      val fa = floats.indexOf(a); val fb = floats.indexOf(b)
      if (ia >= 0 && ib >= 0) Some(ints(math.max(ia, ib)))
      else if (fa >= 0 && fb >= 0) Some(floats(math.max(fa, fb)))
      // int ⊔ double = double; int ⊔ float widens THROUGH double (float
      // cannot hold all ints losslessly)
      else if (ia >= 0 && fb >= 0 || fa >= 0 && ib >= 0) Some(DoubleType)
      else None
  }

  /** Union shard generations under the widened common schema, in column
    * order of first appearance; rows from generations that predate a
    * column carry null there. */
  def unionEvolved(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionEvolved needs at least one frame")
    val merged = scala.collection.mutable.LinkedHashMap[String, DataType]()
    for (df <- dfs; f <- df.schema.fields) {
      merged.get(f.name) match {
        case None => merged(f.name) = f.dataType
        case Some(t) => merged(f.name) = widen(t, f.dataType).getOrElse(
          throw new IllegalArgumentException(
            s"column '${f.name}': no lossless widening of $t and ${f.dataType}"))
      }
    }
    dfs.map { df =>
      df.select(merged.toSeq.map { case (name, t) =>
        (if (df.columns.contains(name)) col(name).cast(t)
         else lit(null).cast(t)).as(name)
      }: _*)
    }.reduce(_ unionByName _)
  }

  // ==== q110: two shard generations, one evolved read =======================
  //
  // gen1 (doc_id%2=0): int-typed keys, no lang column, no quality column —
  // the "written last year" shard. gen2: long keys + lang + a new double
  // column. The evolved union widens keys to long, null-fills gen1's lang
  // and quality, and aggregates across both generations in one pass.

  private def q110(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val gen1 = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").cast("int").as("doc_id"),
        col("text"), col("n_chars").cast("int").as("n_chars"))
    val gen2 = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"), col("n_chars"), col("lang"),
        (col("n_chars").cast("double") / 100.0).as("quality"))
    unionEvolved(Seq(gen1, gen2))
      .groupBy(coalesce(col("lang"), lit("<pre-lang>")).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        count(col("quality")).as("n_quality"))
      .orderBy(col("lang"))
  }

  private val q110Sql =
    """WITH u AS (
      |  SELECT doc_id, text, n_chars, NULL AS lang, NULL AS quality
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, text, n_chars, lang, CAST(n_chars AS DOUBLE) / 100.0
      |  FROM documents WHERE doc_id % 2 = 1)
      |SELECT coalesce(lang, '<pre-lang>') AS lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  count(quality) AS n_quality
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q110_schema_evolution", q110, Some(q110Sql)))
}
