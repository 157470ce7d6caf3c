package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev micro-bench (round 17): cost of a tiny 32-partition exchange. */
object ShuffleMicro {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_LOCAL_DIR_OVERRIDE").foreach(d => b.config("spark.local.dir", d))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 7000).toDF("x").repartition(32).cache()
    df.count()
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      df.groupBy(($"x" % 997).as("k")).count().count()
      println(f"tiny-exchange round $i: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    }
    spark.stop()
  }
}
