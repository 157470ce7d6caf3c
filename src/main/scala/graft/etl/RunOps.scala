package graft.etl

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.control.NonFatal

/** The declared-but-unwired run-control surface of the reference's
  * `config.yaml` (SURVEY §2.6): `extract.retry_count` / `extract.retry_delay`
  * (config.yaml:4-5), `logging.logfile` / `logging.level` (config.yaml:37-39)
  * and `monitoring.enabled` / `monitoring.summary_file` (config.yaml:40-42).
  * The reference never reads these keys (`run_etl_pipeline`,
  * backend/etl_pipeline.py:295-319, touches only extract/load/source_id);
  * they document intended capability, which this engine wires for real.
  *
  * Config is a parameter object, not a YAML file, per SURVEY §1.3 — per-run
  * parameters arrive as values, the engine stays declarative.
  */
final case class RunConfig(
    retryCount: Int = 3, // attempts, config.yaml:4
    retryDelaySec: Double = 2.0, // sleep between attempts, config.yaml:5
    monitoringEnabled: Boolean = true, // config.yaml:41
    summaryFile: Option[Path] = None, // config.yaml:42 (etl_run_summary.txt)
    logFile: Option[Path] = None, // config.yaml:38 (etl.log)
    logLevel: RunOps.Level = RunOps.Info) // config.yaml:39

object RunOps {

  sealed abstract class Level(val rank: Int, val name: String)
  case object Debug extends Level(0, "DEBUG")
  case object Info extends Level(1, "INFO")
  case object Warn extends Level(2, "WARN")
  case object ErrorLevel extends Level(3, "ERROR")

  /** Append-mode run log honoring the configured level — the `logging:`
    * block. No-op when no logfile is configured.
    */
  final class RunLog(cfg: RunConfig) {
    def log(level: Level, msg: String): Unit =
      if (level.rank >= cfg.logLevel.rank) cfg.logFile.foreach { p =>
        val line = s"[${java.time.Instant.now()}] ${level.name} $msg\n"
        Files.writeString(p, line,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      }
  }

  /** `retry_count` / `retry_delay` around DRIVER-SIDE source resolution
    * (path listing / schema checks — the step that fails transiently on
    * object stores). Executor-side task retries at scale are Spark's own
    * `spark.task.maxFailures`; re-running a whole distributed action on a
    * driver loop would be the wrong layer.
    *
    * `retryCount` counts ATTEMPTS (the reference's yaml reads naturally as
    * "try 3 times"); the delay sleeps between attempts.
    */
  def withRetry[T](cfg: RunConfig, log: RunLog = noopLog)(f: => T): T = {
    val attempts = math.max(1, cfg.retryCount)
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      if (i > 0) Thread.sleep((cfg.retryDelaySec * 1000).toLong)
      try return f
      catch {
        case NonFatal(e) =>
          last = e
          i += 1
          if (i < attempts)
            log.log(Warn, s"source read attempt $i/$attempts failed: ${e.getMessage}; " +
              s"retrying in ${cfg.retryDelaySec}s")
      }
    }
    log.log(ErrorLevel, s"source read failed after $attempts attempts: ${last.getMessage}")
    throw last
  }

  private val noopLog = new RunLog(RunConfig(logFile = None))

  /** [[DocumentEtl.readDocuments]] under the retry policy. The `load()` +
    * eager existence probe runs inside the retry loop so transient listing
    * failures actually re-attempt (the returned frame itself stays lazy and
    * distributed).
    */
  def readDocumentsRetrying(
      spark: SparkSession,
      path: String,
      cfg: RunConfig,
      log: RunLog): DataFrame =
    withRetry(cfg, log) {
      // explicit existence probe: the binaryFile source defers listing to
      // execution, so a lazy frame alone would never exercise the retry
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(hp))
        throw new java.io.FileNotFoundException(s"source path not found: $path")
      val df = DocumentEtl.readDocuments(spark, path)
      log.log(Info, s"source resolved: $path")
      df
    }

  /** Basic run metrics — the `monitoring:` block's summary file. All counts
    * come from frames the pipeline already materialized (extraction/table
    * are persisted inside `DocumentEtl.run`), so the summary adds no extra
    * corpus scan beyond its own counts over cached data.
    */
  final case class RunSummary(
      sourceId: String,
      documents: Long,
      rows: Long,
      columns: Int,
      schemaFields: Int,
      durationMs: Long,
      status: String,
      error: Option[String]) {
    def render: String = {
      val base = Seq(
        s"source_id: $sourceId",
        s"status: $status",
        s"documents: $documents",
        s"rows: $rows",
        s"columns: $columns",
        s"schema_fields: $schemaFields",
        f"duration_sec: ${durationMs / 1000.0}%.3f")
      (base ++ error.map(e => s"error: $e")).mkString("", "\n", "\n")
    }
  }

  /** Run the document pipeline with monitoring + logging wired: times the
    * run, writes the summary file when enabled, logs stage events, and on
    * failure still records a `failed` summary before rethrowing.
    */
  def runMonitored(
      spark: SparkSession,
      docs: DataFrame,
      cfg: RunConfig = RunConfig(),
      sourceId: String = "default_source",
      registryDir: Option[String] = None): (DocumentEtl.Result, RunSummary) = {
    val log = new RunLog(cfg)
    val t0 = System.nanoTime()
    def emit(s: RunSummary): Unit = if (cfg.monitoringEnabled) {
      cfg.summaryFile.foreach(p => Files.writeString(p, s.render))
      log.log(Info, s"run ${s.status}: ${s.rows} rows x ${s.columns} cols " +
        s"from ${s.documents} documents in ${s.durationMs} ms")
    }
    try {
      log.log(Info, s"pipeline start: source_id=$sourceId")
      val nDocs = docs.count()
      val result = DocumentEtl.run(spark, docs, sourceId, registryDir)
      val summary = RunSummary(
        sourceId = sourceId,
        documents = nDocs,
        rows = result.table.count(),
        columns = result.columns.size,
        schemaFields = result.schema.fields.size,
        durationMs = (System.nanoTime() - t0) / 1000000,
        status = "succeeded",
        error = None)
      emit(summary)
      (result, summary)
    } catch {
      case NonFatal(e) =>
        val summary = RunSummary(sourceId, -1, -1, 0, 0,
          (System.nanoTime() - t0) / 1000000, "failed", Some(e.getMessage))
        emit(summary)
        log.log(ErrorLevel, s"pipeline failed: ${e.getMessage}")
        throw e
    }
  }
}
