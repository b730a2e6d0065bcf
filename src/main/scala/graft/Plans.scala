package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` output for declared queries — the
  * optimization-round evidence artifact (plans/r15/<query>_{before,after}
  * .txt). Usage:
  *
  *   runMain graft.Plans <sfDir> <outDir> <suffix> [query ...]
  *
  * Writes <outDir>/<query>_<suffix>.txt for each named query (all queries
  * when none are named). The plan is the ANALYZED+OPTIMIZED physical plan
  * as `Dataset.explain("formatted")` prints it (AQE initial plan — the
  * shape evidence: Exchange count, join strategy, PushedFilters,
  * ReadSchema, codegen spans). */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Plans <sfDir> <outDir> <suffix> [query ...]")
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val wanted = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => wanted.isEmpty || wanted(q._1))
    for ((name, fn) <- qs) {
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
        System.err.println(s"[plans] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      } finally {
        BlockRelease.releaseAll(spark)
      }
    }
    BlockRelease.releaseEverything(spark)
    spark.stop()
  }
}
