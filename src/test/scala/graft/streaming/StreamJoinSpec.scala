package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream inner join with watermarks and an event-time range
  * condition — bounded state on both sides (the production shape for
  * correlating two event streams at scale).
  */
class StreamJoinSpec extends SparkSpec {
  import EventStreams.UserEvent

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("clicks join errors within a 10-minute window per user") {
    import spark.implicits._
    val clicks = MemoryStream[UserEvent](spark)
    val errors = MemoryStream[UserEvent](spark)
    val c = clicks.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val e = errors.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"), col("event_id").as("e_id"))
    val joined = c.join(e,
      col("c_user") === col("e_user") &&
        col("e_ts") >= col("c_ts") &&
        col("e_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      clicks.addData(UserEvent(1, ts(0), 7, "click", 0), UserEvent(2, ts(0), 8, "click", 0))
      errors.addData(
        UserEvent(10, ts(5), 7, "error", 0),   // in window for user 7
        UserEvent(11, ts(20), 7, "error", 0),  // outside window
        UserEvent(12, ts(3), 9, "error", 0))   // no matching click
      q.processAllAvailable()
      val rows = spark.table("ssjoin").collect()
        .map(r => (r.getAs[Long]("c_id"), r.getAs[Long]("e_id"))).toSet
      assert(rows == Set((1L, 10L)))
    } finally q.stop()
  }

  test("ev10 parity: streaming interval join equals the batch range join") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("ev10_interval_join")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"),
        r.getAs[Long]("gap_us"))).toSet

    val events = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[EventStreams.UserEvent].collect()
    val clicks = MemoryStream[EventStreams.UserEvent](spark)
    val purchases = MemoryStream[EventStreams.UserEvent](spark)
    val c = clicks.toDF().filter(col("event_type") === "click")
      .withWatermark("ts", "4 hours")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.toDF().filter(col("event_type") === "purchase")
      .withWatermark("ts", "4 hours")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val joined = c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 4 HOURS"))
      .select(col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
    val q = joined.writeStream.format("memory").queryName("ev10stream")
      .outputMode("append").start()
    try {
      clicks.addData(events.toIndexedSeq)
      purchases.addData(events.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("ev10stream").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"),
          r.getAs[Long]("gap_us"))).toSet
      assert(streamed == batch,
        s"stream=${streamed.size} batch=${batch.size} " +
          s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }
}
