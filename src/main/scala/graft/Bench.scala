package graft

import org.apache.spark.sql.SparkSession

/** Bench main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Each query runs twice and
  * reports the faster run (BASELINE.md protocol: warm timings — the first
  * iteration pays JIT/codegen warm-up that a long-lived cluster never sees);
  * `value` is the sum of per-query warm times.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      val a = once()
      val b = if (a < 0) a else math.min(a, once())
      // queries persist() intermediates; drop them so cached blocks don't
      // accumulate across the suite and GC-degrade later queries
      spark.catalog.clearCache()
      name -> b
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    // "failed" makes crashes explicit: a query that starts erroring must not
    // read as a faster run (its -1 is excluded from the total).
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
