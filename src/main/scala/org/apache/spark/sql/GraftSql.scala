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

  /** A localCheckpoint that KEEPS its partitioning promise.
    *
    * `Dataset.localCheckpoint` under AQE republishes the blocks with
    * UnknownPartitioning, so an iterative operator that joins the pinned
    * frame on the same key every round pays a fresh exchange (or a reused
    * shuffle read) plus a sort per use. This pins the frame the honest
    * way: repartition by `keys` into an EXPLICIT partition count (AQE
    * never coalesces user-numbered repartitions, so the layout claim
    * stays true), sort within partitions by the same keys, persist the
    * InternalRow blocks eagerly, and republish them as a [[execution
    * .LogicalRDD]] that ADVERTISES HashPartitioning(keys) + ascending
    * order — every downstream equi-join on `keys` then plans with zero
    * exchange and zero sort on this side. Blocks release through the
    * same [[releaseCheckpointBlocks]] walk as ordinary checkpoints. */
  def pinHashPartitioned(df: DataFrame, keys: Seq[String],
      numParts: Int): DataFrame = {
    require(keys.nonEmpty && numParts > 0)
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val laidOut = df.repartition(numParts, keys.map(df(_)): _*)
      .sortWithinPartitions(keys.map(df(_)): _*)
    val qe = laidOut.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count() // eager, like localCheckpoint: blocks land exactly once
    val output = qe.analyzed.output
    val keyAttrs = keys.map { k =>
      // a duplicate-named output would silently bind the first match and
      // advertise HashPartitioning on the wrong attribute — fail instead
      val matches = output.filter(_.name == k)
      require(matches.size == 1,
        s"pinHashPartitioned: column $k matches ${matches.size} output " +
          s"attributes (need exactly 1); disambiguate before pinning")
      matches.head
    }
    val partitioning =
      catalyst.plans.physical.HashPartitioning(keyAttrs, numParts)
    val ordering = keyAttrs.map(a => catalyst.expressions.SortOrder(
      a, catalyst.expressions.Ascending))
    classic.Dataset.ofRows(spark,
      execution.LogicalRDD(output, rdd, partitioning, ordering,
        isStreaming = false, stream = None)(spark, None, None))
  }

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
  /** RDD ids that [[releaseCheckpointBlocks]] must never unpersist —
    * session-scoped pinned layouts (graft.EdgePin) that outlive query
    * lifecycles. Needed because a release target that is NOT itself
    * checkpointed (e.g. a loop's round-1 seed frame) has a full lineage
    * whose LEAVES can include a pinned layout's LogicalRDD — the walk
    * would otherwise kill the shared pin mid-session. */
  @volatile private var protectedIds: Set[Int] = Set.empty
  def protectBlocks(ids: Set[Int]): Unit = synchronized {
    protectedIds = protectedIds ++ ids
  }
  def unprotectBlocks(ids: Set[Int]): Unit = synchronized {
    protectedIds = protectedIds -- ids
  }

  def releaseCheckpointBlocks(ds: Dataset[_]): Unit = {
    val keep = protectedIds
    ds.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD if !keep(lr.rdd.id) =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }

  /** Ids of the persisted RDDs behind a checkpointed Dataset's LogicalRDD
    * leaves — lets a session-scoped pin registry (graft.EdgePin) both
    * verify its blocks are still resident and exempt them from the
    * per-query [[graft.BlockRelease]] sweep. */
  def checkpointRddIds(ds: Dataset[_]): Seq[Int] = {
    val b = Seq.newBuilder[Int]
    ds.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => b += lr.rdd.id
      case _ => ()
    }
    b.result()
  }
}
