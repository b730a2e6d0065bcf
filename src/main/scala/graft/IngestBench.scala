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
    } finally server.stop(0)
    spark.stop()
  }
}
