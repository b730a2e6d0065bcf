package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All declared engine queries, assembled from the operator modules. */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ ChunkOps.defs ++ TextAnalysis.defs ++
      CorpusOps.defs ++ Profiling.defs ++ EventsOps.defs ++ Similarity.defs ++ Dedup.defs ++
      AnnLsh.defs ++ AnnIvf.defs ++ AnnPq.defs ++ Multimodal.defs ++
      SketchOps.defs ++ FuzzyJoin.defs ++ Retrieval.defs ++ Cdc.defs ++
      Layout.defs ++ Incremental.defs ++ Evolution.defs ++ Graph.defs ++
      DimReduce.defs ++ CorpusStats.defs ++ Diversity.defs ++ MlEval.defs ++
      UnigramLm.defs ++ HeavyHitters.defs ++ Classifier.defs ++ Keyphrase.defs ++
      Privacy.defs ++ StringSim.defs ++ Spatial.defs ++ Skyline.defs ++
      Bitmaps.defs ++ WordPiece.defs ++ TextEval.defs ++ Preference.defs ++
      LangId.defs ++ UrlOps.defs ++ Clustering.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: full-scan grouped aggregation with map-side partials. */
  def entry(spark: SparkSession): DataFrame =
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
