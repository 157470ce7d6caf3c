package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Stateful-stream RESTART: a query stopped and relaunched from its
  * checkpoint must resume with its GroupState intact — the property every
  * long-lived production pipeline depends on (deploys, crashes, rescales).
  * Uses the file source (replayable offsets) + mapGroupsWithState running
  * counts; a user with events in both halves must show the combined count
  * after the restart.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import EventStreams._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("mapGroupsWithState running counts survive a checkpointed restart") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_ckpt_src").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_state").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString

    val part1 = Seq(
      UserEvent(1, ts(0), 7, "click", 1.0),
      UserEvent(2, ts(1), 7, "view", 2.0),
      UserEvent(3, ts(2), 8, "click", 3.0))
    val part2 = Seq(
      UserEvent(4, ts(3), 7, "purchase", 4.0),
      UserEvent(5, ts(4), 9, "view", 5.0))

    part1.toDS().write.mode("append").parquet(src)
    val schema = implicitly[org.apache.spark.sql.Encoder[UserEvent]].schema
    // memory sink cannot recover from a checkpoint; foreachBatch (the
    // production sink shape) can — append each batch's updates to parquet
    def launch() = userRunningCounts(
        spark.readStream.schema(schema).parquet(src).as[UserEvent])
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[UserSession], _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .outputMode("update").option("checkpointLocation", ckpt).start()

    def counts() = spark.read.parquet(out)
      .groupBy(col("user_id")).agg(max(col("n_events")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val q1 = launch()
    try q1.processAllAvailable() finally q1.stop()
    val afterPart1 = counts()
    assert(afterPart1 == Map(7L -> 2L, 8L -> 1L), afterPart1)

    // restart from the same checkpoint, then ship the second half
    part2.toDS().write.mode("append").parquet(src)
    val q2 = launch()
    try q2.processAllAvailable() finally q2.stop()
    val afterRestart = counts()
    // user 7: 2 events before the restart + 1 after = 3 (state carried over)
    assert(afterRestart(7L) == 3L, afterRestart)
    assert(afterRestart(9L) == 1L, afterRestart)
  }
}
