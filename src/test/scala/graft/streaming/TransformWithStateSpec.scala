package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Spark 4 transformWithState parity: the StatefulProcessor's running
  * per-user totals, accumulated across micro-batches in RocksDB-backed
  * ValueState, must converge to the batch ev13 aggregate on the same rows.
  */
class TransformWithStateSpec extends SparkSpec {
  import EventStreams._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("transformWithState running totals equal the batch aggregate") {
    import spark.implicits._
    val events = Seq(
      UserEvent(1, ts(0), 7, "click", 1.25),
      UserEvent(2, ts(1), 7, "view", 2.50),
      UserEvent(3, ts(2), 8, "click", 10.00),
      UserEvent(4, ts(3), 7, "click", 0.25),
      UserEvent(5, ts(4), 8, "view", 3.10))
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[UserEvent](spark)
      val q = userRunningTotals(mem.toDS()).writeStream
        .format("memory").queryName("tws_totals").outputMode("update").start()
      try {
        mem.addData(events.take(3): _*)
        q.processAllAvailable()
        mem.addData(events.drop(3): _*)
        q.processAllAvailable()
        // latest update per user = the converged running total
        val streamed = spark.table("tws_totals").collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
            r.getAs[Long]("total_cents")))
          .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
        val batch = events.toDF()
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("c"))
          .collect()
          .map(r => r.getAs[Long]("user_id") ->
            ((r.getAs[Long]("user_id"), r.getAs[Long]("n"), r.getAs[Long]("c")))).toMap
        assert(streamed == batch, s"streamed=$streamed batch=$batch")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
