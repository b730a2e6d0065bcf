package graft.chunk

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Chunk assignment (SURVEY.md §2 A9–A11): map an ordered record stream onto
  * dense, contiguous, bounded chunks `chunk_number = offset + floor(rn / n)`.
  *
  * Scale design: a naive `row_number() OVER (ORDER BY ...)` funnels the whole
  * dataset through ONE partition. Instead we range-partition by the order
  * keys, count rows per partition (tiny driver-side collect of P longs), and
  * add per-partition offsets — every partition numbers its own rows
  * independently, so the operator is shuffle-bounded at any scale.
  */
object ChunkAssigner {

  /** Add a dense 0-based `rn` column reflecting the total order of
    * `orderCols`, without a single-partition sort: range-partition by the
    * order keys, sort within partitions, then zipWithIndex over the
    * MATERIALIZED InternalRow RDD.
    *
    * Two subtleties that shape this implementation:
    *   - repartitionByRange's sampling seed includes the RDD id, so two
    *     separate jobs over the same DataFrame can get DIFFERENT partition
    *     boundaries — any offset scheme computed in a side job is silently
    *     wrong. Materializing one RDD instance pins the partitioning;
    *     zipWithIndex's internal count job and the main job then share the
    *     same shuffle files (stage reuse).
    *   - staying on InternalRow (queryExecution.toRdd + JoinedRow) avoids
    *     the per-row external-Row conversion that makes naive df.rdd
    *     zipWithIndex slow. */
  def withRowNumber(df: DataFrame, orderCols: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val indexed = org.apache.spark.sql.GraftSql.toInternalRdd(sorted)
      .zipWithIndex().mapPartitions { it =>
        val joiner = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val idxRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        it.map { case (row, idx) =>
          idxRow.update(0, idx)
          joiner(row, idxRow): org.apache.spark.sql.catalyst.InternalRow
        }
      }
    org.apache.spark.sql.GraftSql.internalCreateDataFrame(spark, indexed,
      StructType(sorted.schema.fields :+ StructField("rn", LongType, nullable = false)))
  }

  /** Add a dense 0-based `rn` column in the DataFrame's EXISTING order —
    * input/file order for file sources, whose partitions enumerate
    * (file, block) deterministically. Same InternalRow + JoinedRow scheme as
    * `withRowNumber`, minus the range repartition: no shuffle at all, one
    * lightweight count job from zipWithIndex. */
  def withInputOrderRowNumber(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val indexed = org.apache.spark.sql.GraftSql.toInternalRdd(df)
      .zipWithIndex().mapPartitions { it =>
        val joiner = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val idxRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        it.map { case (row, idx) =>
          idxRow.update(0, idx)
          joiner(row, idxRow): org.apache.spark.sql.catalyst.InternalRow
        }
      }
    org.apache.spark.sql.GraftSql.internalCreateDataFrame(spark, indexed,
      StructType(df.schema.fields :+ StructField("rn", LongType, nullable = false)))
  }

  /** A9/A11: count-based chunking — chunk_number = lastChunk + 1 + rn / n. */
  def assignByCount(df: DataFrame, orderCols: Seq[Column], chunkSize: Int,
      lastChunk: Long = -1L): DataFrame = {
    require(chunkSize >= 1 && chunkSize <= 4000,
      s"chunk_size_by_records must be in [1, 4000], got $chunkSize") // request_model.py:22
    // integer `div`, not double `/`: row numbers stay exact past 2^53
    withRowNumber(df, orderCols)
      .withColumn("chunk_number", lit(lastChunk + 1) + expr(s"rn div $chunkSize"))
  }

  /** A10: byte-budget chunking — greedy packing where adding a record may
    * never exceed `budgetBytes` (`json_reader.py:133`: flush BEFORE append
    * when chunk_bytes + next_bytes > budget). Greedy packing is inherently
    * sequential in record order, so it runs as one ordered pass per
    * ingestion; `sizeCol` is the record's serialized byte size (A13).
    *
    * Scale note: this operator is only used on the delivery path, where the
    * protocol already forces serial, ordered commits per ingestion
    * (`chunk_data_integrity_validator.py:44-46`) — a parallel version would
    * buy nothing downstream.
    */
  def assignByBytes(df: DataFrame, orderCols: Seq[Column], budgetBytes: Long,
      sizeCol: Column, lastChunk: Long = -1L): DataFrame = {
    val spark = df.sparkSession
    // repartition(1), NOT coalesce(1): coalesce collapses the upstream into
    // one task, serializing the (parallel) record serialization and size
    // computation; a shuffle barrier keeps production parallel and only the
    // greedy packing fold runs single-threaded (inherently sequential)
    val sorted = df.withColumn("__size", sizeCol)
      .repartition(1).sortWithinPartitions(orderCols: _*)
    val sizeIdx = sorted.schema.fieldIndex("__size")
    val schema = StructType(
      sorted.schema.fields.patch(sizeIdx, Nil, 1) :+
        StructField("chunk_number", LongType, nullable = false))
    val base = lastChunk + 1
    val assigned = sorted.rdd.mapPartitions { it =>
      var chunk = base
      var bytes = 0L
      var started = false
      it.map { row =>
        val sz = row.getLong(sizeIdx)
        if (started && bytes + sz > budgetBytes) { chunk += 1; bytes = 0L }
        started = true
        bytes += sz
        Row.fromSeq(row.toSeq.patch(sizeIdx, Nil, 1) :+ chunk)
      }
    }
    spark.createDataFrame(assigned, schema)
  }
}
