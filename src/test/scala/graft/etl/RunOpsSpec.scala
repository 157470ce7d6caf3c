package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** §2.6 declared-but-unwired config surface, wired for real: retry with
  * delay around source reads (config.yaml:4-5), run log (config.yaml:37-39),
  * monitoring summary (config.yaml:40-42). The reference declares these
  * keys but never reads them — semantics here are the declared intent.
  */
class RunOpsSpec extends SparkSpec {
  import RunOps._

  test("withRetry retries with delay and succeeds on a later attempt") {
    val cfg = RunConfig(retryCount = 3, retryDelaySec = 0.01)
    var calls = 0
    val t0 = System.nanoTime()
    val out = withRetry(cfg) {
      calls += 1
      if (calls < 3) sys.error(s"transient $calls") else "ok"
    }
    assert(out == "ok" && calls == 3)
    // two sleeps of 10ms must have elapsed
    assert((System.nanoTime() - t0) / 1000000 >= 20)
  }

  test("withRetry gives up after retry_count attempts and rethrows the last error") {
    val cfg = RunConfig(retryCount = 3, retryDelaySec = 0.0)
    var calls = 0
    val e = intercept[RuntimeException] {
      withRetry(cfg) { calls += 1; sys.error(s"boom $calls") }
    }
    assert(calls == 3 && e.getMessage == "boom 3")
  }

  test("readDocumentsRetrying retries a missing path, then reads when it appears") {
    val dir = Files.createTempDirectory("graft-retry")
    val target = dir.resolve("late")
    val cfg = RunConfig(retryCount = 5, retryDelaySec = 0.05,
      logFile = Some(dir.resolve("etl.log")))
    val log = new RunLog(cfg)
    // pre-warm Hadoop FS init so attempt 1 runs before the path appears
    val fs = new org.apache.hadoop.fs.Path(dir.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(target.toString)))
    // the path materializes while the retry loop is sleeping — the later
    // attempt must pick it up
    val writer = new Thread(() => {
      Thread.sleep(80)
      Files.createDirectory(target)
      Files.writeString(target.resolve("d.txt"), "hello world")
    })
    writer.start()
    try {
      val df = readDocumentsRetrying(spark, target.toString, cfg, log)
      assert(df.count() == 1)
    } finally writer.join()
    val logged = Files.readString(dir.resolve("etl.log"))
    assert(logged.contains("WARN source read attempt"))
    assert(logged.contains("INFO source resolved"))
  }

  test("runMonitored writes the summary file with real counts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mon")
    val cfg = RunConfig(monitoringEnabled = true,
      summaryFile = Some(dir.resolve("etl_run_summary.txt")))
    val docs = Seq((1L, """{"a": 1, "b": "x"}"""), (2L, """{"a": 2}"""))
      .toDF("doc_id", "text")
    val (result, summary) = runMonitored(spark, docs, cfg)
    assert(summary.status == "succeeded")
    assert(summary.documents == 2)
    assert(summary.rows == result.table.count())
    assert(summary.columns == result.columns.size)
    val text = Files.readString(dir.resolve("etl_run_summary.txt"))
    assert(text.contains("status: succeeded"))
    assert(text.contains("documents: 2"))
    assert(text.contains(s"columns: ${result.columns.size}"))
  }

  test("monitoring disabled writes nothing; failures still summarize") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mon2")
    val off = RunConfig(monitoringEnabled = false,
      summaryFile = Some(dir.resolve("off.txt")))
    runMonitored(spark, Seq((1L, "{}")).toDF("doc_id", "text"), off)
    assert(!Files.exists(dir.resolve("off.txt")))

    val on = RunConfig(monitoringEnabled = true,
      summaryFile = Some(dir.resolve("fail.txt")))
    // a docs frame with the wrong schema fails inside the pipeline
    intercept[Exception] {
      runMonitored(spark, Seq(("no", "schema")).toDF("x", "y"), on)
    }
    val text = Files.readString(dir.resolve("fail.txt"))
    assert(text.contains("status: failed"))
    assert(text.contains("error: "))
  }

  test("run log honors the configured level") {
    val dir = Files.createTempDirectory("graft-log")
    val cfg = RunConfig(logFile = Some(dir.resolve("etl.log")), logLevel = Warn)
    val log = new RunLog(cfg)
    log.log(Info, "hidden")
    log.log(Warn, "shown")
    val text = Files.readString(dir.resolve("etl.log"))
    assert(!text.contains("hidden") && text.contains("WARN shown"))
  }
}
