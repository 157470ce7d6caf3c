package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming retention parity: replaying the REAL events table through the
  * stateful retention operator (two ordered micro-batches) and counting
  * distinct users per (cohort_week, week_offset) must equal the batch ev15
  * query exactly.
  */
class RetentionStreamSpec extends SparkSpec {
  import EventStreams._

  private val sf = "/root/testdata/sf0.001"

  test("streaming retention hits aggregate to the batch ev15 counts") {
    import spark.implicits._
    val events = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[UserEvent]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    val mem = MemoryStream[UserEvent](spark)
    val q = retentionHits(mem.toDS()).writeStream
      .format("memory").queryName("retention_hits").outputMode("update").start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("retention_hits")
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val batch = graft.SparkEntry.queries("ev15_retention")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    assert(streamed == batch, (streamed, batch))
  }
}
