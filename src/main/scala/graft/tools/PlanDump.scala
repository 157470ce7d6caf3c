package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (round 17): dump `.explain("formatted")` for a set of queries
  * into files, one JVM for the whole batch (BenchOne pays a full Spark
  * startup per query — unusable for the 20+-query plan evidence the
  * optimization round keeps under plans/r17/).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <prefix>[,<prefix>...] [sfDir]
  * Writes <outDir>/<query>_<suffix>.txt for every registered query whose
  * name starts with one of the prefixes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val prefixes = args(2).split(",").toSeq
    val sfDir = args.drop(3).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", graft.core.Scratch.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.queries.Registry.all
      .filter(q => prefixes.exists(q.name.startsWith))
      .foreach { q =>
        try {
          val plan = q.run(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${q.name}_$suffix.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote ${q.name}_$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] ${q.name} failed: ${e.getMessage}")
        }
        graft.core.Caches.release()
      }
    spark.stop()
  }
}
