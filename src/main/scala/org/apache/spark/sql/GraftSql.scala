package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 moved Column↔Expression conversion behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); extensions that define
  * native expressions conventionally reach it via a same-package shim.
  */
object GraftSql {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** DataFrame from an InternalRow RDD (no external Row conversion). */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** The analyzed plan's InternalRow RDD — materializes the physical plan
    * ONCE, so every job over the returned RDD shares the same shuffle output
    * (and, crucially, the same nondeterministic range-sampling outcome). */
  def toInternalRdd(df: DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.queryExecution.toRdd

  /** Releases the storage blocks behind a `localCheckpoint()`ed Dataset.
    *
    * `Dataset.unpersist` only uncaches through the CacheManager; checkpoint
    * blocks live as persisted RDDs inside the plan's [[execution.LogicalRDD]]
    * leaves, which the CacheManager never sees — so iterative operators that
    * checkpoint per round (connected components, keeper-chain resolution)
    * would pin every superseded round until the session ends. This walks the
    * analyzed plan and unpersists each LogicalRDD's RDD directly. Only call
    * once nothing will re-read the frame (i.e. after the successor round or
    * the final result has materialized). */
  def releaseCheckpointBlocks(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
