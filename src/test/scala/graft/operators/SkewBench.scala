package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stress evidence for `Skew.saltedJoin`: a power-law join key (80% of rows
  * on one key) at a few million rows, salted vs unsalted shuffle join.
  *
  *   sbt "Test/runMain graft.operators.SkewBench [rows]"
  *
  * Prints per-variant wall time and the post-join reducer histogram spread
  * (max partition rows). AQE is disabled so the comparison isolates the
  * salting itself, not AQE's size-threshold skew splitting.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val n = if (args.nonEmpty) args(0).toLong else 4000000L
    val hotShare = 0.8
    val hotN = (n * hotShare).toLong

    val large = spark.range(n).select(
      when(col("id") < hotN, lit("hot"))
        .otherwise(concat(lit("k"), col("id") % 100000)).as("key"),
      col("id").as("v"))
    val small = spark.range(100001).select(
      when(col("id") === 100000, lit("hot"))
        .otherwise(concat(lit("k"), col("id"))).as("key"),
      (col("id") * 2).as("w")).hint("shuffle_hash")

    def run(what: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val hist = df.groupBy(spark_partition_id().as("p")).count()
        .collect().map(r => r.getLong(1))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"skew_join","variant":"$what","rows":${hist.sum},"sec":$sec%.2f,"max_partition_rows":${hist.max},"partitions":${hist.length}}""")
    }
    run("unsalted", large.join(small, Seq("key")))
    run("salted64", Skew.saltedJoin(large, small, "key", buckets = 64))

    // salt-value diagnostic: how evenly do hot rows spread across buckets?
    val saltHist = large.filter(col("key") === "hot")
      .withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(16)).cast("int"))
      .groupBy("__salt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    println(s"salt histogram (hot rows): ${saltHist.toSeq.sortBy(_._1)}")
    spark.stop()
  }
}
