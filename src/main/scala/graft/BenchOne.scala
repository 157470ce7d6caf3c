package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a single query by name (3 runs) and print its plan.
  * Usage: runMain graft.BenchOne <query> [sfDir] [explain]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val rest = args.drop(1)
    val explain = rest.contains("explain")
    val sfDir = rest.filterNot(_ == "explain").headOption
      .getOrElse("/root/testdata/sf0.1")
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
    val fn = SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    else (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
