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
}
