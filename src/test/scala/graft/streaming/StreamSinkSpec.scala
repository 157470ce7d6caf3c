package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-static joins and the foreachBatch sink — the two remaining
  * Structured Streaming surfaces a production pipeline needs: dimension
  * enrichment of a stream (static side broadcast per micro-batch, no
  * stream-side state), and batch-id-addressed sink writes (foreachBatch is
  * how streams reach arbitrary writers with exactly-once via idempotent
  * per-batch paths).
  */
class StreamSinkSpec extends SparkSpec {
  import EventStreams.UserEvent

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("stream-static join enriches events against a broadcast dimension") {
    import spark.implicits._
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[UserEvent](spark)
    val joined = in.toDF().join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), coalesce(col("tier"), lit("unknown")).as("tier"))
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData(
        UserEvent(1, ts(0), 7, "click", 0),
        UserEvent(2, ts(1), 8, "view", 0),
        UserEvent(3, ts(2), 9, "click", 0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("tier"))).toSet
      assert(rows == Set((1L, "gold"), (2L, "basic"), (3L, "unknown")))
    } finally q.stop()
  }

  test("foreachBatch writes idempotent per-batch parquet (exactly-once shape)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val in = MemoryStream[UserEvent](spark)
    val q = in.toDF().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch-id-addressed path: a retried batch overwrites its own
        // directory instead of duplicating rows
        batch.write.mode("overwrite").parquet(s"$out/batch_id=$batchId")
        ()
      }
      .start()
    try {
      in.addData(UserEvent(1, ts(0), 7, "click", 0), UserEvent(2, ts(1), 8, "view", 0))
      q.processAllAvailable()
      in.addData(UserEvent(3, ts(2), 9, "error", 0))
      q.processAllAvailable()
      val back = spark.read.parquet(out)
      assert(back.count() == 3)
      // partition column batch_id recovered from the path = batch addressing
      assert(back.select(countDistinct(col("batch_id"))).head.getLong(0) >= 2)
    } finally q.stop()
  }
}
