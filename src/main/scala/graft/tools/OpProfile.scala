package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Dev tool (round 17): run a query and print the EXECUTED plan tree with
  * per-operator SQL metrics (the UI's SQL tab without the UI) — name,
  * rows, and the dominant time metrics per node.
  */
object OpProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
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

    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, m) =>
        (k.contains("Time") || k == "numOutputRows" || k == "dataSize" ||
          k.contains("build") || k.contains("collect")) && m.value > 0
      }
      val ms = interesting.map { case (k, m) =>
        val v = if (m.metricType == "timing" || m.metricType == "nsTiming")
          s"${if (m.metricType == "nsTiming") m.value / 1000000 else m.value}ms"
        else m.value.toString
        s"$k=$v"
      }.mkString(" ")
      println(("  " * depth) + p.nodeName + "  " + ms)
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      kids.foreach(walk(_, depth + 1))
      p.subqueries.foreach { sq => println(("  " * (depth + 1)) + "[subquery]"); walk(sq, depth + 2) }
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      graft.core.Caches.release()
      // count() plans a separate aggregate query; execute THAT frame so the
      // executed plan we walk is the one that ran and carries live metrics
      val cnt = fn(spark, sfDir).groupBy().count()
      val t0 = System.nanoTime()
      val n = cnt.collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== $name: $sec%.2f s ($n rows)")
      walk(cnt.queryExecution.executedPlan, 1)
      graft.core.Caches.release()
    }
    spark.stop()
  }
}
