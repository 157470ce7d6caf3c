package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** One (column, cell) observation flowing through a stream. */
  final case class CellObs(col_name: String, cell: String, row_idx: Long)

  final case class ColProfile(col_name: String, voted_type: String,
      nullable: Boolean, n_distinct: Long, confidence: Double, n_rows: Long)

  /** Streaming column profiler — the schema-inference stage of the document
    * pipeline as a STATEFUL streaming operator: per column, a
    * [[graft.etl.ProfileBuffer]] lives in `GroupState` (stored as its
    * compact byte encoding) and every micro-batch merges new observations
    * and emits the refreshed profile. The same buffer/merge/summarize code
    * backs the batch TypedImperativeAggregate, so batch and stream agree by
    * construction.
    */
  /** @param jsonCells true when the stream carries the document pipeline's
    *   JSON-encoded wire cells (votes then JSON-decode, matching
    *   Profile.generateSchema); false (default) for raw string cells
    *   (votes with the same regex battery as the batch column profiler).
    */
  def streamingProfile(cells: Dataset[CellObs],
      jsonCells: Boolean = false): Dataset[ColProfile] = {
    val spark = cells.sparkSession
    import spark.implicits._
    cells.groupByKey(_.col_name)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (colName: String, it: Iterator[CellObs], state: GroupState[Array[Byte]]) =>
          val buf = state.getOption
            .map(graft.etl.ProfileBuffer.decode)
            .getOrElse(new graft.etl.ProfileBuffer)
          it.foreach { o =>
            if (o.cell == null || o.cell == "null" || o.cell == "NaN") buf.nulls += 1
            else buf.add(o.cell, o.row_idx)
          }
          state.update(buf.encode())
          val s = buf.summarize(jsonCells)
          Iterator.single(ColProfile(colName, s.votedType, s.nullable,
            s.nDistinct, s.confidence,
            buf.nulls + buf.values.valuesIterator.map(_._1).sum))
      }
  }

  /** streaming exact dedup on a key subset: batch mode is a plain
    * `dropDuplicates`; streaming mode uses `dropDuplicatesWithinWatermark`
    * so per-key state is EVICTED once the watermark passes — the bounded-
    * state form of exact dedup (an unbounded streaming dedup would OOM on
    * an infinite stream; within-watermark is the scale-safe contract).
    */
  def dedupByKey(events: DataFrame, keys: Seq[String],
      watermark: Option[String] = None, tsCol: String = "ts"): DataFrame = {
    require(keys.nonEmpty, "dedupByKey needs at least one key column")
    watermark match {
      case Some(w) => events.withWatermark(tsCol, w)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
      case None => events.dropDuplicates(keys)
    }
  }

  final case class UserEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserSession(user_id: Long, n_events: Long, last_type: String)

  final case class DistinctEstimate(key: String, n_seen: Long, n_hashes: Long,
      est_distinct: Long)

  final case class KmvState(seen: Long, hashes: Array[Long])

  /** Streaming KMV distinct-count: per group, GroupState holds only the
    * bottom-k distinct 60-bit hashes (k longs — bounded state regardless of
    * stream cardinality), and every micro-batch emits the refreshed
    * estimate. Same hash ([[graft.ops.Sketches.hash60jvm]] ≡ the SQL-side
    * md5 prefix) and same estimator as the batch sketch01 query, so stream
    * and batch agree EXACTLY on identical input (StreamingSketchSpec).
    * Below k distinct values the bottom-k set is the complete distinct set
    * and the "estimate" is exact.
    */
  def streamingDistinct(values: Dataset[(String, String)], k: Int = 256): Dataset[DistinctEstimate] = {
    val spark = values.sparkSession
    import spark.implicits._
    values.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, String)], state: GroupState[KmvState]) =>
          val prev = state.getOption.getOrElse(KmvState(0L, Array.empty[Long]))
          val incoming = it.map(v => graft.ops.Sketches.hash60jvm(v._2)).toArray
          val merged = java.util.Arrays.stream((prev.hashes ++ incoming).distinct)
            .sorted.limit(k).toArray
          val next = KmvState(prev.seen + incoming.length, merged)
          state.update(next)
          val est =
            if (merged.length < k) merged.length.toLong
            else math.round((k - 1).toDouble * graft.ops.Sketches.HashSpace / merged.last.toDouble)
          Iterator.single(DistinctEstimate(key, next.seen, merged.length.toLong, est))
      }
  }

  /** Stream-static dimension enrichment: click events joined to the (small,
    * broadcast) customer dim, rolled up per market segment. Works unchanged
    * on a streaming `events` frame — stream-static equi-joins are supported
    * directly and the static side is refreshed per micro-batch; the only
    * state is the per-segment running aggregate (a handful of rows
    * regardless of stream length).
    */
  def enrichClicks(events: DataFrame, customer: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_clicks"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))

  final case class UserTotal(user_id: Long, n_events: Long, total_cents: Long)

  /** Per-user running totals on Spark 4's transformWithState — the
    * StatefulProcessor successor to mapGroupsWithState: named typed state
    * slots from the handle (TTL- and timer-capable), value sums accumulated
    * as EXACT integer cents so the running total is deterministic. State is
    * one small record per user; streaming requires the RocksDB state store
    * provider (TransformWithStateSpec sets it). The final per-user update
    * equals the batch aggregate ev13 runs against its DuckDB oracle.
    */
  class RunningTotalProcessor extends StatefulProcessor[Long, UserEvent, UserTotal] {
    @transient private var state: ValueState[UserTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserTotal](
        "totals", Encoders.product[UserTotal], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserTotal] = {
      val prev = if (state.exists()) state.get() else UserTotal(key, 0L, 0L)
      var n = prev.n_events
      var cents = prev.total_cents
      // SQL round() is half-AWAY-FROM-ZERO; math.round is half-up (toward
      // +inf), which differs on negative half-cents — mirror the batch
      // aggregate exactly so refund streams keep the ev13 parity contract
      rows.foreach { e =>
        n += 1
        val x = e.value * 100
        cents += (if (x >= 0) math.round(x) else -math.round(-x))
      }
      val next = UserTotal(key, n, cents)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** running per-user totals via the new arbitrary-state API (works on a
    * streaming OR batch Dataset; each micro-batch emits refreshed totals).
    */
  def userRunningTotals(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Per-user funnel progress: 0 = nothing, 1 = signed up, 2 = first click
    * within the window after signup, 3 = first purchase within the window
    * after that click.
    */
  final case class FunnelStage(user_id: Long, stage: Int)
  final case class FunnelState(s_us: Long, c_us: Long, p_us: Long)

  /** Streaming conversion funnel — the stateful-stream half of batch query
    * ev14: per user, first signup, then first click within `windowHours`,
    * then first purchase within `windowHours` of that click. State is THREE
    * timestamps per user (bounded at any scale; a TTL would evict users
    * whose window has definitively lapsed). Events are processed in
    * event-time order within each micro-batch; across batches the match
    * with the batch query is exact when each user's events arrive in
    * event-time order (the watermarked-replay contract —
    * FunnelStreamSpec feeds the real events table and checks stage counts
    * equal ev14's).
    */
  /** event-time in microseconds — the ordering precision shared by every
    * stateful operator here (the events table is µs-precision; ms-level
    * ordering would tie-break same-millisecond events wrongly).
    */
  private[streaming] def eventMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def funnelStageOf(st: FunnelState): Int =
    if (st.p_us >= 0) 3 else if (st.c_us >= 0) 2
    else if (st.s_us >= 0) 1 else 0

  /** fold one micro-batch of a user's events (event-time order) into the
    * funnel state — the ONE state machine both funnel variants share.
    */
  private def advanceFunnel(st0: FunnelState, evs: Iterator[UserEvent],
      winUs: Long): FunnelState = {
    var st = st0
    evs.toSeq.sortBy(e => (eventMicros(e.ts), e.event_id)).foreach { e =>
      val m = eventMicros(e.ts)
      e.event_type match {
        case "signup" if st.s_us < 0 => st = st.copy(s_us = m)
        case "click" if st.s_us >= 0 && st.c_us < 0 &&
            m >= st.s_us && m <= st.s_us + winUs => st = st.copy(c_us = m)
        case "purchase" if st.c_us >= 0 && st.p_us < 0 &&
            m >= st.c_us && m <= st.c_us + winUs => st = st.copy(p_us = m)
        case _ => ()
      }
    }
    st
  }

  def funnelStages(events: Dataset[UserEvent],
      windowHours: Int = 24): Dataset[FunnelStage] = {
    val spark = events.sparkSession
    import spark.implicits._
    val winUs = windowHours.toLong * 3600L * 1000000L
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[FunnelState]) =>
          val st = advanceFunnel(
            state.getOption.getOrElse(FunnelState(-1L, -1L, -1L)), it, winUs)
          state.update(st)
          FunnelStage(uid, funnelStageOf(st))
      }
  }

  /** The BOUNDED-STATE form of [[funnelStages]]: same per-user state
    * machine, plus event-time-timeout eviction — a user's window can no
    * longer change once the watermark passes their live deadline
    * (signup+window while awaiting the click, click+window while awaiting
    * the purchase), so the state is finalized, emitted once more, and
    * REMOVED. Completed funnels (purchase reached) and users with no
    * signup drop their state immediately. At 100 TB/day event rates this
    * is the difference between state proportional to *users inside an open
    * window* and state proportional to *all users ever seen*.
    * `watermarkDelay` is the out-of-order tolerance.
    *
    * Semantics note: because eviction forgets the user, a signup arriving
    * AFTER the previous funnel's window lapsed starts a NEW funnel
    * (re-registration — the production attribution behavior). Batch ev14
    * anchors on the all-time first signup, so exact parity holds on
    * streams with one signup per user (FunnelStreamSpec tests that); on
    * raw streams the two differ exactly by re-registrations.
    */
  def funnelStagesEvicting(events: Dataset[UserEvent],
      windowHours: Int = 24,
      watermarkDelay: String = "10 seconds"): Dataset[FunnelStage] = {
    val spark = events.sparkSession
    import spark.implicits._
    val winUs = windowHours.toLong * 3600L * 1000000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // watermark passed the live deadline: the stage is final
            val st = state.get
            state.remove()
            Iterator.single(FunnelStage(uid, funnelStageOf(st)))
          } else {
            val st0 = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            val st = advanceFunnel(st0, it, winUs)
            if (st.p_us >= 0 || st.s_us < 0) {
              // funnel complete, or nothing to wait for: no state to keep
              state.remove()
            } else {
              state.update(st)
              // ceil µs → ms: flooring could fire the timeout up to 1 ms
              // BEFORE the µs-precise window edge, evicting state that an
              // event in that final sub-millisecond still needs
              val deadlineUs = (if (st.c_us >= 0) st.c_us else st.s_us) + winUs
              val deadlineMs = (deadlineUs + 999L) / 1000L
              // timeouts must be set beyond the current watermark
              state.setTimeoutTimestamp(
                math.max(deadlineMs, state.getCurrentWatermarkMs() + 1000L))
            }
            // emit ONLY on a stage transition: an Update-mode key-value
            // consumer keeps the latest row per user, so re-emitting stage
            // 0 after eviction (a routine post-window event) would
            // regress a finalized stage
            if (funnelStageOf(st) != funnelStageOf(st0))
              Iterator.single(FunnelStage(uid, funnelStageOf(st)))
            else Iterator.empty
          }
      }
  }

  /** One novel (user, cohort_week, week_offset) activity observation. */
  final case class RetentionHit(user_id: Long, cohort_week: Long, week_offset: Long)
  final case class RetentionState(cohort_day: Long, seen_offsets: Seq[Long])

  /** Streaming cohort retention — the stateful twin of batch ev15: per
    * user, the first-seen day fixes the cohort; each NEW week-offset of
    * later activity emits one [[RetentionHit]], so `count(distinct
    * user_id)` per (cohort_week, week_offset) downstream equals the batch
    * query. State per user is the cohort day plus the offsets already
    * seen — bounded by the analysis horizon in weeks, not by event volume.
    * Like the funnel, exact batch parity assumes each user's events arrive
    * in event-time order across batches (the ordered-replay contract).
    */
  def retentionHits(events: Dataset[UserEvent]): Dataset[RetentionHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    def epochDay(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 86400000L)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[RetentionState]) =>
          val days = it.map(e => epochDay(e.ts)).toSeq.sorted
          if (days.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(RetentionState(days.head, Seq.empty))
            val novel = Seq.newBuilder[RetentionHit]
            days.foreach { d =>
              val off = (d - st.cohort_day) / 7
              if (!st.seen_offsets.contains(off)) {
                st = st.copy(seen_offsets = st.seen_offsets :+ off)
                novel += RetentionHit(uid, st.cohort_day / 7, off)
              }
            }
            state.update(st)
            novel.result().iterator
          }
      }
  }

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
          val last = if (evs.nonEmpty) evs.maxBy(e => (eventMicros(e.ts), e.event_id)).event_type
                     else prev.last_type
          val next = UserSession(uid, prev.n_events + evs.size, last)
          state.update(next)
          next
      }
  }
}
