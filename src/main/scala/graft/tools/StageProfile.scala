package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Dev tool (round 17): per-stage time breakdown for named queries.
  * Runs each query twice (first run pays codegen/JIT) and prints the
  * second run's stages: duration, task count, max task time, input and
  * shuffle bytes — the empirical loop of guide §1 without the UI.
  *
  * Usage: runMain graft.tools.StageProfile <name>[,<name>...] [sfDir]
  */
object StageProfile {
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

    final case class St(id: Int, name: String, tasks: Int, ms: Long,
      maxTaskMs: Long, inBytes: Long, shRead: Long, shWrite: Long)
    val stages = ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = for (a <- i.submissionTime; b <- i.completionTime) yield b - a
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n'), i.numTasks,
            ms.getOrElse(-1), -1, m.inputMetrics.bytesRead,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm: codegen + JIT
      graft.core.Caches.release()
      Thread.sleep(1500) // let the warm run's stage events fully drain
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.release()
      Thread.sleep(300) // let late stage-completed events drain
      println(f"== $name: $sec%.2f s ($n rows), ${stages.size} stages")
      stages.synchronized {
        stages.sortBy(-_.ms).foreach { s =>
          println(f"  stage ${s.id}%4d ${s.ms}%6d ms  tasks=${s.tasks}%3d  " +
            f"in=${s.inBytes / 1024}%7d KiB  shR=${s.shRead / 1024}%6d KiB  " +
            f"shW=${s.shWrite / 1024}%6d KiB  ${s.name.take(60)}")
        }
        val total = stages.map(_.ms).sum
        println(f"  stage-ms total: $total (wall ${sec * 1000}%.0f ms; gap = scheduling/driver)")
      }
    }
    spark.stop()
  }
}
