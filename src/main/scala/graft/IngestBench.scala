package graft

import graft.api.IngestRequest
import graft.ingest.IngestionPipeline
import graft.receiver.MockPimCore
import graft.state.IngestionStateStore
import org.apache.spark.sql.SparkSession

/** Protocol-throughput benchmark: push an entire lineitem table through the
  * full chunk→checksum→ordered-ACK pipeline against an in-process receiver
  * (which validates order + checksum per chunk). The reference publishes no
  * numbers (BASELINE.md); this main records ours.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IngestBench"
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val chunkSize = sys.env.getOrElse("SPARK_GRAFT_CHUNK", "4000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (mock, server, url) = MockPimCore.serve()
    try {
      val store = IngestionStateStore.inMemory()
      // SPARK_GRAFT_MODE=bytes exercises the byte-budget packing path
      val request = sys.env.get("SPARK_GRAFT_MODE") match {
        case Some("bytes") => IngestRequest(s"$sfDir/lineitem.parquet", "parquet",
          url, chunkSizeByMemory = Some(chunkSize.toLong * 256))
        case _ => IngestRequest(s"$sfDir/lineitem.parquet", "parquet", url,
          chunkSizeByRecords = Some(chunkSize))
      }
      val t0 = System.nanoTime()
      val result = IngestionPipeline.run(spark, request, store)
      val sec = (System.nanoTime() - t0) / 1e9
      val rps = result.totalRecords / sec
      println(f"""{"metric":"ingest_throughput","records":${result.totalRecords},"chunks":${result.chunksSent},"chunk_size":$chunkSize,"sec":$sec%.2f,"records_per_sec":$rps%.0f,"receiver_records":${mock.totalRecordsEver}}""")
      require(mock.totalRecordsEver == result.totalRecords,
        s"receiver saw ${mock.totalRecordsEver} records, sender counted ${result.totalRecords}")
      require(result.totalRecords > 0 && result.chunksSent > 0,
        "chunk accounting broken")
      // phase breakdown (separate warm run, AFTER the accounting checks —
      // it re-sends the table and would double the receiver's counters)
      if (sys.env.contains("SPARK_GRAFT_PHASES")) {
        import org.apache.spark.sql.functions.{col, max}
        val req2 = request.copy(reIngestion = true)
        val tb0 = System.nanoTime()
        val chunks = IngestionPipeline
          .buildChunks(IngestionPipeline.scan(spark, req2), req2).cache()
        val maxChunk = chunks.agg(max(col("chunk_number"))).collect()(0).getLong(0)
        val tBuild = (System.nanoTime() - tb0) / 1e9
        val td0 = System.nanoTime()
        IngestionPipeline.deliverChunksDistributed(chunks, "bench-phases",
          IngestionStateStore.inMemory(), url, -1L, 0L, maxChunk)
        val tDeliver = (System.nanoTime() - td0) / 1e9
        chunks.unpersist()
        println(f"""{"metric":"ingest_phases","build_sec":$tBuild%.2f,"deliver_sec":$tDeliver%.2f}""")
      }
    } finally server.stop(0)
    spark.stop()
  }
}
