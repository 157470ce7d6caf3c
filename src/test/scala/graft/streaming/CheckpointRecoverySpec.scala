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

  test("funnel restarted from checkpoint reaches exactly the batch ev14 stage counts") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val src = Files.createTempDirectory("graft_ckpt_fsrc").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_fstate").toString
    val out = Files.createTempDirectory("graft_ckpt_fout").toString

    // the REAL events table, event-time ordered, split at the midpoint:
    // funnels whose signup lands in part 1 and click/purchase in part 2
    // only reach their final stage if the restart carries the state over
    val events = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[UserEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (part1, part2) = events.splitAt(events.length / 2)
    val crossers = part1.map(_.user_id).toSet intersect part2.map(_.user_id).toSet
    assert(crossers.nonEmpty, "split must leave funnels open across the restart")

    val schema = implicitly[org.apache.spark.sql.Encoder[UserEvent]].schema
    def launch() = funnelStages(
        spark.readStream.schema(schema).parquet(src).as[UserEvent])
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[FunnelStage], _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .outputMode("update").option("checkpointLocation", ckpt).start()

    part1.toSeq.toDS().write.mode("append").parquet(src)
    val q1 = launch()
    try q1.processAllAvailable() finally q1.stop() // kill after part 1
    val rowsBefore = spark.read.parquet(out).count()

    part2.toSeq.toDS().write.mode("append").parquet(src)
    val q2 = launch() // restore from the same checkpoint
    try q2.processAllAvailable() finally q2.stop()

    // exactly-once input consumption: the restarted run only processed the
    // NEW files, so every appended row belongs to a part-2 user
    val appended = spark.read.parquet(out)
    assert(appended.count() > rowsBefore)
    val p2users = part2.map(_.user_id).toSet
    val newUsers = appended.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .filter(_.getLong(1) > 1).map(_.getLong(0)) // >1 row ⇒ re-emitted after restart
    assert(newUsers.forall(p2users.contains),
      s"restart re-emitted users absent from part 2: ${newUsers.toSeq.take(5)}")

    // converged stage per user (stages only advance) vs the batch oracle
    val stages = appended
      .groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
      .groupBy(col("stage")).count()
      .collect().map(r => r.getAs[Int]("stage") -> r.getAs[Long]("count")).toMap
    def atLeast(k: Int) = stages.filter(_._1 >= k).values.sum
    val batch = graft.SparkEntry.queries("ev14_funnel")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(atLeast(1) == batch("signup"), (stages, batch))
    assert(atLeast(2) == batch("click"), (stages, batch))
    assert(atLeast(3) == batch("purchase"), (stages, batch))
  }
}
