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
