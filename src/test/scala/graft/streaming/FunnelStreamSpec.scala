package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming funnel parity: feeding the REAL events table through the
  * stateful funnel processor in event-time order (two micro-batches) must
  * produce exactly the batch ev14 stage counts on the same rows.
  */
class FunnelStreamSpec extends SparkSpec {
  import EventStreams._

  private val sf = "/root/testdata/sf0.001"

  test("streaming funnel stage counts equal the batch ev14 query") {
    import spark.implicits._
    val events = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[UserEvent]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    val mem = MemoryStream[UserEvent](spark)
    val q = funnelStages(mem.toDS()).writeStream
      .format("memory").queryName("funnel_stages").outputMode("update").start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    // latest update per user = converged stage
    val stages = spark.table("funnel_stages")
      .groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
      .groupBy(col("stage")).count()
      .collect().map(r => r.getAs[Int]("stage") -> r.getAs[Long]("count")).toMap
    // cumulative: stage>=k users
    def atLeast(k: Int) = stages.filter(_._1 >= k).values.sum

    val batch = graft.SparkEntry.queries("ev14_funnel")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(atLeast(1) == batch("signup"), (stages, batch))
    assert(atLeast(2) == batch("click"), (stages, batch))
    assert(atLeast(3) == batch("purchase"), (stages, batch))
  }

  test("evicting funnel matches batch counts and drains its state store") {
    import spark.implicits._
    // eviction semantics re-open a funnel on a post-window signup; batch
    // ev14 anchors on the first signup — so parity is exact on a stream
    // with ONE signup per user. Keep each user's first signup only.
    val raw = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[UserEvent]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val seenSignup = scala.collection.mutable.Set[Long]()
    val events = raw.filter { e =>
      if (e.event_type != "signup") true
      else seenSignup.add(e.user_id) // false (drop) when already present
    }

    val mem = MemoryStream[UserEvent](spark)
    val q = funnelStagesEvicting(mem.toDS()).writeStream
      .format("memory").queryName("funnel_evict").outputMode("update").start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      // advance the watermark far past every open deadline, then run one
      // more batch so the timeouts fire and evict the remaining state
      val far = new java.sql.Timestamp(events.last.ts.getTime + 200L * 24 * 3600 * 1000)
      mem.addData(UserEvent(9000001L, far, -1L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(UserEvent(9000002L, far, -2L, "view", 0.0))
      q.processAllAvailable()

      val stages = spark.table("funnel_evict")
        .filter(col("user_id") >= 0)
        .groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
        .groupBy(col("stage")).count()
        .collect().map(r => r.getAs[Int]("stage") -> r.getAs[Long]("count")).toMap
      def atLeast(k: Int) = stages.filter(_._1 >= k).values.sum
      val batch = graft.SparkEntry.queries("ev14_funnel")(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(atLeast(1) == batch("signup"), (stages, batch))
      assert(atLeast(2) == batch("click"), (stages, batch))
      assert(atLeast(3) == batch("purchase"), (stages, batch))

      // every user's state evicted once their window could no longer change
      val stateRows = q.lastProgress.stateOperators.asScala
        .map(_.numRowsTotal).sum
      assert(stateRows == 0, s"state rows remaining: $stateRows")
    } finally q.stop()
  }

  private implicit class RichArr[A](a: Array[A]) {
    def asScala: Seq[A] = a.toSeq
  }
}
