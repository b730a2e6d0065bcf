package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Keyed-merge laws and the partition-pruned upsert write path. */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "one", "en"), (2L, "two", "en"), (3L, "drei", "de"), (4L, "vier", "de")
  ).toDF("id", "text", "lang")

  private def changes = Seq(
    (2L, "TWO", "en", "U"),   // update
    (3L, "drei", "de", "D"),  // delete
    (5L, "fuenf", "de", "I")  // insert
  ).toDF("id", "text", "lang", "op")

  test("mergeByKey: U replaces, D removes, I adds, others untouched") {
    val got = Cdc.mergeByKey(base, changes, "id")
      .select(col("id"), col("text")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "one", 2L -> "TWO", 4L -> "vier", 5L -> "fuenf"))
  }

  test("mergeByKey: an unmatched U degrades to insert (upsert)") {
    val got = Cdc.mergeByKey(base,
        Seq((9L, "nine", "en", "U")).toDF("id", "text", "lang", "op"), "id")
      .filter(col("id") === 9).count()
    assert(got == 1L)
  }

  test("mergeByKey plan: base never shuffles — broadcast anti-join only") {
    val plan = Cdc.mergeByKey(base, changes, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan)
    assert(!plan.contains("SortMergeJoin"), s"base must not shuffle:\n$plan")
  }

  test("partitionedUpsert rewrites ONLY the touched partitions") {
    val dir = Files.createTempDirectory("cdc_upsert").toString
    base.write.mode("overwrite").partitionBy("lang").parquet(dir)

    def filesUnder(p: String): Set[Path] =
      Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .filter(f => f.toString.endsWith(".parquet")).toSet
    val enBefore = filesUnder(s"$dir/lang=en")
    val deBefore = filesUnder(s"$dir/lang=de")

    // the delta touches ONLY lang=de
    val delta = Seq((3L, "DREI", "de", "U"), (6L, "sechs", "de", "I"))
      .toDF("id", "text", "lang", "op")
    Cdc.partitionedUpsert(spark, dir, delta, "id", "lang")

    assert(filesUnder(s"$dir/lang=en") == enBefore,
      "untouched partition files must remain byte-identical in place")
    assert(filesUnder(s"$dir/lang=de") != deBefore)
    // read-back equals the logical merge of the full table
    val got = spark.read.parquet(dir)
      .select(col("id"), col("text")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "one", 2L -> "two", 3L -> "DREI",
      4L -> "vier", 6L -> "sechs"))
  }

  test("partitionedUpsert: re-applying the same delta is a no-op (replay safety)") {
    val dir = Files.createTempDirectory("cdc_replay").toString
    base.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val delta = Seq((2L, "TWO", "en", "U"), (3L, "", "de", "D"),
      (5L, "fuenf", "de", "I")).toDF("id", "text", "lang", "op")
    Cdc.partitionedUpsert(spark, dir, delta, "id", "lang")
    val once = spark.read.parquet(dir)
      .select(col("id"), col("text")).as[(Long, String)].collect().toMap
    Cdc.partitionedUpsert(spark, dir, delta, "id", "lang")
    val twice = spark.read.parquet(dir)
      .select(col("id"), col("text")).as[(Long, String)].collect().toMap
    assert(once == twice)
  }

  test("startStreamingUpsert applies each micro-batch of changes in order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("cdc_stream").toString
    base.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val input = MemoryStream[(Long, String, String, String)](spark)
    val ckpt = Files.createTempDirectory("cdc_ckpt").toString
    val q = Cdc.startStreamingUpsert(
      input.toDS().toDF("id", "text", "lang", "op"), dir, "id", "lang", ckpt)
    try {
      input.addData((2L, "TWO", "en", "U"), (5L, "fuenf", "de", "I"))
      q.processAllAvailable()
      assert(spark.read.parquet(dir).filter(col("id") === 2L)
        .select("text").as[String].head() == "TWO")
      input.addData((5L, "", "de", "D"), (1L, "ONE", "en", "U"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(dir)
      .select(col("id"), col("text")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "ONE", 2L -> "TWO", 3L -> "drei", 4L -> "vier"))
  }

  test("partitionedUpsert: deletes that empty a partition remove it") {
    val dir = Files.createTempDirectory("cdc_empty").toString
    base.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val delta = Seq((3L, "", "de", "D"), (4L, "", "de", "D"))
      .toDF("id", "text", "lang", "op")
    Cdc.partitionedUpsert(spark, dir, delta, "id", "lang")
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/lang=de")))
    val got = spark.read.parquet(dir).select(col("id")).as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  private def ts(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)

  test("scd2Build: intervals chain per key; the last version stays open") {
    val changes = Seq(
      (1L, 10L, ts(0), 1.0), (1L, 11L, ts(60), 2.0), (1L, 12L, ts(120), 3.0),
      (2L, 20L, ts(30), 9.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = Cdc.scd2Build(changes, "user_id", "ts", "event_id")
      .select(col("event_id"), col("valid_from"), col("valid_to"))
      .collect().map(r => r.getLong(0) ->
        ((r.getTimestamp(1), Option(r.getTimestamp(2))))).toMap
    assert(got(10L) == ((ts(0), Some(ts(60)))))
    assert(got(11L) == ((ts(60), Some(ts(120)))))
    assert(got(12L) == ((ts(120), None)), "current version must stay open")
    assert(got(20L) == ((ts(30), None)), "keys are independent")
  }

  test("pointInTimeJoin: each fact sees exactly the version valid at its time") {
    val dim = Cdc.scd2Build(Seq(
        (1L, 10L, ts(0), 1.0), (1L, 11L, ts(100), 2.0))
      .toDF("user_id", "event_id", "ts", "value"), "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id").as("version_id"),
        col("valid_from"), col("valid_to"))
    val facts = Seq(
      (1L, 100L, ts(50)),   // inside v10
      (1L, 101L, ts(100)),  // exactly at the boundary → v11 (half-open)
      (1L, 102L, ts(999)),  // open tail → v11
      (2L, 103L, ts(50))    // no versions for user 2 → unmatched
    ).toDF("user_id", "fact_id", "fts")
    val got = Cdc.pointInTimeJoin(facts, dim, "user_id", "fts")
      .select(col("fact_id"), col("version_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(100L -> 10L, 101L -> 11L, 102L -> 11L, 103L -> -1L))
  }

  test("compactPartitions: crowded partitions collapse, cold partitions untouched") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    // partition en: 6 tiny files (appends); de: 1 file (cold)
    (1 to 6).foreach { i =>
      Seq((i.toLong, s"doc$i", "en")).toDF("id", "text", "lang")
        .coalesce(1).write.mode("append").partitionBy("lang").parquet(dir)
    }
    Seq((100L, "kalt", "de")).toDF("id", "text", "lang")
      .coalesce(1).write.mode("append").partitionBy("lang").parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(part: String) = fs.listStatus(new Path(dir, part))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith(".")).map(_.getPath.getName).sorted
    val deBefore = files("lang=de")
    val before = spark.read.parquet(dir).orderBy("id")
      .collect().map(_.toString).toSeq

    val report = Cdc.compactPartitions(spark, dir, "lang", maxFiles = 2)
      .as[(String, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(report.keySet == Set("lang=en"), s"report $report")
    assert(files("lang=en").length == 1, "en not compacted to one file")
    // cold partition: exact same file names, nothing rewritten
    assert(files("lang=de").sameElements(deBefore), "cold partition churned")
    // content identical after compaction
    val after = spark.read.parquet(dir).orderBy("id")
      .collect().map(_.toString).toSeq
    assert(after == before, "compaction changed table content")
    // idempotent: a second run reports nothing to do
    assert(Cdc.compactPartitions(spark, dir, "lang", maxFiles = 2).isEmpty)
  }
}
