package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import EventStreams._

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("hourlyStats over a stream with watermark matches batch semantics") {
    import spark.implicits._
    val mem = MemoryStream[UserEvent](spark)
    val out = hourlyStats(
      mem.toDF().withColumn("ts", col("ts").cast("timestamp")),
      watermark = Some("10 minutes"))
    val q = out.writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      mem.addData(
        UserEvent(1, ts(0), 1, "click", 1.5),
        UserEvent(2, ts(5), 1, "click", 2.5),
        UserEvent(3, ts(20), 2, "error", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value"))).toSet
      assert(rows == Set(("click", 2L, 4.0), ("error", 1L, 1.0)))
    } finally q.stop()
  }

  test("late events beyond the watermark are dropped (append mode)") {
    import spark.implicits._
    val mem = MemoryStream[UserEvent](spark)
    val out = hourlyStats(
      mem.toDF().withColumn("ts", col("ts").cast("timestamp")),
      watermark = Some("10 minutes"))
    val q = out.writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    try {
      mem.addData(
        UserEvent(1, ts(0), 1, "click", 1.0),
        UserEvent(2, ts(5), 1, "click", 1.0))
      q.processAllAvailable()
      // advance event time to 12:30 → watermark 12:20 → 10:00 window closes
      mem.addData(UserEvent(3, Timestamp.valueOf("2024-01-01 12:30:00"), 2, "click", 1.0))
      q.processAllAvailable()
      // LATE: 10:30 is far behind the 12:20 watermark → must be dropped
      mem.addData(UserEvent(4, ts(30), 1, "click", 99.0))
      q.processAllAvailable()
      mem.addData(UserEvent(5, Timestamp.valueOf("2024-01-01 14:00:00"), 2, "click", 1.0))
      q.processAllAvailable()
      val hour10 = spark.table("late_drop").collect()
        .filter(_.getAs[Timestamp]("hour") == Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(hour10.length == 1)
      // the late event (value 99) is NOT included: 2 on-time events only
      assert(hour10.head.getAs[Long]("n_events") == 2L)
      assert(hour10.head.getAs[Double]("total_value") == 2.0)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark emits each (user, type) once across batches") {
    import spark.implicits._
    val mem = MemoryStream[UserEvent](spark)
    val out = dedupByKey(
      mem.toDF().withColumn("ts", col("ts").cast("timestamp")),
      Seq("user_id", "event_type"), watermark = Some("30 minutes"))
      .select(col("user_id"), col("event_type"))
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        UserEvent(1, ts(0), 1, "click", 1.0),
        UserEvent(2, ts(1), 1, "click", 2.0), // dup within batch
        UserEvent(3, ts(2), 2, "view", 1.0))
      q.processAllAvailable()
      mem.addData(
        UserEvent(4, ts(3), 1, "click", 3.0), // dup across batches
        UserEvent(5, ts(4), 3, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.length == rows.distinct.length, rows.mkString(","))
      assert(rows.toSet == Set((1L, "click"), (2L, "view"), (3L, "click")), rows.mkString(","))
    } finally q.stop()
  }

  test("stateful running counts via mapGroupsWithState accumulate across batches") {
    import spark.implicits._
    val mem = MemoryStream[UserEvent](spark)
    val out = userRunningCounts(mem.toDS())
    val q = out.writeStream.format("memory").queryName("runcounts")
      .outputMode("update").start()
    try {
      mem.addData(UserEvent(1, ts(0), 7, "a", 0), UserEvent(2, ts(1), 7, "b", 0))
      q.processAllAvailable()
      mem.addData(UserEvent(3, ts(2), 7, "c", 0), UserEvent(4, ts(2), 8, "x", 0))
      q.processAllAvailable()
      val m = spark.table("runcounts").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[String]("last_type")))
      // last update per user wins
      val latest = m.groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
      assert(latest(7L) == ((7L, 3L, "c")))
      assert(latest(8L) == ((8L, 1L, "x")))
    } finally q.stop()
  }

  test("streaming column profiler accumulates state across micro-batches") {
    import spark.implicits._
    val mem = MemoryStream[CellObs](spark)
    val out = streamingProfile(mem.toDS())
    val q = out.writeStream.format("memory").queryName("sprofile")
      .outputMode("update").start()
    try {
      mem.addData(CellObs("age", "34", 0), CellObs("age", "51", 1), CellObs("name", "bo", 0))
      q.processAllAvailable()
      mem.addData(CellObs("age", "null", 2), CellObs("age", "34", 3))
      q.processAllAvailable()
      val latest = spark.table("sprofile").collect()
        .map(r => (r.getAs[String]("col_name"), r.getAs[Long]("n_rows"),
          r.getAs[String]("voted_type"), r.getAs[Boolean]("nullable"),
          r.getAs[Long]("n_distinct"), r.getAs[Double]("confidence")))
        .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
      // after both batches: age saw 34,51,null,34 → integer, nullable,
      // 2 distinct, confidence 2/3
      assert(latest("age") == (("age", 4L, "integer", true, 2L, 2.0 / 3)))
      assert(latest("name") == (("name", 1L, "string", false, 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming profiler with JSON wire cells votes like the batch pipeline") {
    import spark.implicits._
    val mem = MemoryStream[CellObs](spark)
    // pipeline wire cells are JSON-encoded: '"2024-01-05"' is a date STRING
    // cell, '1e5' a float, '"1e5"' a plain string
    val out = streamingProfile(mem.toDS(), jsonCells = true)
    val q = out.writeStream.format("memory").queryName("sprofile_json")
      .outputMode("update").start()
    try {
      mem.addData(
        CellObs("d", "\"2024-01-05\"", 0), CellObs("d", "\"2024-02-06\"", 1),
        CellObs("f", "1e5", 0), CellObs("s", "\"1e5\"", 0))
      q.processAllAvailable()
      val latest = spark.table("sprofile_json").collect()
        .map(r => r.getAs[String]("col_name") -> r.getAs[String]("voted_type")).toMap
      assert(latest == Map("d" -> "date", "f" -> "float", "s" -> "string"))
    } finally q.stop()
  }

  test("stream-static enrichment (ev12) matches batch on the same data") {
    import spark.implicits._
    val customer = Seq((1L, "AUTO"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val events = Seq(
      UserEvent(1, ts(0), 1, "click", 1.25),
      UserEvent(2, ts(1), 1, "view", 9.0), // not a click — excluded
      UserEvent(3, ts(2), 2, "click", 2.5),
      UserEvent(4, ts(3), 1, "click", 0.25))
    val mem = MemoryStream[UserEvent](spark)
    val out = enrichClicks(mem.toDF(), customer)
    val q = out.writeStream.format("memory").queryName("enrich")
      .outputMode("complete").start()
    try {
      mem.addData(events.take(2): _*)
      q.processAllAvailable()
      mem.addData(events.drop(2): _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = (r.getAs[String]("c_mktsegment"),
        r.getAs[Long]("n_clicks"), r.getAs[Double]("total_value"))
      val stream = spark.table("enrich").collect().map(key).toSet
      val batch = enrichClicks(events.toDF(), customer).collect().map(key).toSet
      assert(stream == batch && batch.nonEmpty, s"stream=$stream batch=$batch")
    } finally q.stop()
  }

  test("batch and stream hourlyStats agree on the events table") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = hourlyStats(ev).orderBy("hour", "event_type").collect()
    assert(batch.nonEmpty)
  }
}
