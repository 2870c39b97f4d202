package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming over the events stream (SURVEY §2.E).
  *
  * The batch queries in TextQueries (`events_windowed_agg`,
  * `events_sessionize`) and these streaming versions share the same
  * logical shape — Spark's incrementalizer turns the windowed groupBy
  * into stateful partial aggregation; the watermark bounds state.
  * At 100 TB/day the same code runs against a Kafka/file source with
  * state in RocksDB; nothing here is local-mode-specific.
  */
object EventsStream {

  /** Schema of the events lake table, parameterized on how the file
    * encodes ts: older testdata carries a ns timestamp (read as long —
    * see [[graft.sources.Tables.events]]), newer carries a plain µs
    * timestamp.
    */
  def eventSchema(tsType: org.apache.spark.sql.types.DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream of events with proper µs timestamps. The ts
    * encoding is sniffed from the parquet footer with a one-off batch
    * read (driver-side metadata only), so both testdata generations
    * stream identically.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    // FileStreamSource wants a directory; pick the events file by glob
    val raw = spark.readStream.schema(eventSchema(tsType))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (tsType == LongType) raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    // µs parquet ts surfaces as TIMESTAMP_NTZ; watermarks need LTZ —
    // the session-UTC cast matches the ns-era loader bit-for-bit
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** E1: tumbling 1-hour windowed aggregation with a 2-hour watermark.
    * Late events beyond the watermark are dropped; state for closed
    * windows is evicted — bounded memory regardless of stream length.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** E7: sliding (hopping) windowed aggregation — each event lands in
    * duration/slide overlapping windows, so trend dashboards refresh
    * every `slide` without waiting out a full tumbling window. Same
    * incremental state mechanics as [[windowedAgg]]; state size scales
    * by the overlap factor (duration/slide open windows per key). The
    * batch twin is [[graft.queries.WarehouseQueries.eventsSlidingAgg]];
    * StreamingSpec pins stream == batch.
    */
  def slidingAgg(events: DataFrame, duration: String = "1 hour",
                 slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), duration, slide), col("event_type"))
      // decimal-exact sum (order-independent), like the batch twin —
      // stream == batch holds for the sum too, not just the counts
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Num.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** E8: stream-static enrichment join + windowed agg. The static dim
    * side is planned per micro-batch (so slowly-changing dims refresh
    * without restarting the query) and broadcast — the stream side
    * never shuffles for the join, and the only state is the windowed
    * aggregation's. The batch twin is
    * [[graft.queries.WarehouseQueries.eventsEnrichedAgg]];
    * StreamingSpec pins stream == batch on the shared grouping.
    */
  def enrichedAgg(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("c_mktsegment"),
        col("event_type"), col("n_events"))

  /** C8b streaming face: gap sessionization via the native
    * `session_window` aggregate — per-event windows merge while they
    * overlap, session state closes (and emits, in append mode) once
    * the watermark passes the session's end. The batch twin is
    * [[graft.queries.TextQueries.eventsSessionWindow]]; StreamingSpec
    * pins stream == batch.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "4 hours",
                       watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** E6: streaming dedup — the streaming face of D1 exact dedup:
    * keeps the first arrival per key within the watermark horizon and
    * EVICTS the key's state once the watermark passes it, so state is
    * bounded by the dedup window, not the stream's history. (True
    * forever-dedup needs an external key store; within-watermark is
    * the standard engine-level contract — duplicates separated by
    * more than the delay are assumed not to occur in the source.)
    */
  def streamingDedup(events: DataFrame, keys: Seq[String],
                     watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** E5: stream-stream interval join — every click joined to the same
    * user's purchases within the 30 minutes after the click (the
    * attribution shape). Works on streaming AND batch inputs from the
    * same plan: the watermarks bound the join state when streaming
    * (clicks can be dropped once no future purchase can match; the
    * analyzer's EliminateEventTimeWatermark removes them in batch).
    * The range condition is what lets the streaming engine evict —
    * without it, both sides' state would grow forever.
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame =
    attributionJoin(events, "inner")

  /** E5b: LEFT-OUTER stream-stream attribution — the unmatched clicks
    * ARE the signal (abandonment analysis). Same state bounds as E5;
    * the outer row for a click emits only once BOTH watermarks pass
    * its 30-minute window (no purchase can still arrive), which is
    * why the spec drives late events on each side. The identical plan
    * runs batch as a plain LEFT JOIN — the DuckDB-oracled face.
    */
  def clickPurchaseJoinOuter(events: DataFrame): DataFrame =
    attributionJoin(events, "leftOuter")

  private def attributionJoin(events: DataFrame, joinType: String): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "2 hours")
    clicks.join(purchases,
        col("user_id") === col("p_user")
          && col("purchase_ts") >= col("click_ts")
          && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
        joinType)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, t_start: java.sql.Timestamp,
                     t_end: java.sql.Timestamp, n_events: Long)

  private def toSession(userId: Long, s: SessionState): Session =
    Session(userId, new java.sql.Timestamp(s.start / 1000),
      new java.sql.Timestamp(s.last / 1000), s.n)

  /** Fold one batch of events (sorted by ts within the batch) into the
    * running per-user session. Out-of-order-safe across batches: an
    * event within `gap` of the current session's SPAN extends it with
    * min/max bounds (a late event never drags `last` backward); an
    * event beyond the gap after the span closes the session; an event
    * beyond the gap BEFORE the span belongs to an already-closed
    * session and is emitted as its own singleton (exact recovery of
    * arbitrarily-late stragglers would need buffering — this keeps
    * state O(1) per user and never corrupts the live session).
    */
  private def foldBatch(userId: Long, sorted: Seq[Event],
                        init: Option[SessionState], gapMicros: Long)
      : (Option[SessionState], Seq[Session]) = {
    var cur = init
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime * 1000L
      cur match {
        case Some(s) if t >= s.start - gapMicros && t <= s.last + gapMicros =>
          cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
        case Some(s) if t > s.last + gapMicros =>
          closed += toSession(userId, s)
          cur = Some(SessionState(t, t, 1))
        case Some(_) => // straggler before the span's gap horizon
          closed += Session(userId, new java.sql.Timestamp(t / 1000),
            new java.sql.Timestamp(t / 1000), 1)
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    (cur, closed.result())
  }

  /** E2: stateful gap sessionizer via flatMapGroupsWithState — emits a
    * session once the per-user gap exceeds `gapSeconds`. State is one
    * (start,last,n) triple per live user — the minimal footprint.
    *
    * Sessions idle at end-of-stream stay in state; the event-time-
    * timeout variant below ([[sessionizeEventTime]]) closes them when
    * the watermark passes, which is the production behavior.
    */
  /** E2b: sessionizer with EVENT-TIME TIMEOUT — idle sessions close
    * when the watermark passes `last + gap`, without needing another
    * event for that user. This is the complete production shape: state
    * is bounded (every idle key times out and is removed), and session
    * emission lags only by the watermark delay. The in-batch merge
    * logic is identical to [[sessionize]].
    */
  def sessionizeEventTime(events: Dataset[Event], gapSeconds: Long,
                          watermarkDelay: String = "1 minute"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapSeconds * 1000000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(toSession(userId, s))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val (cur, closed) = foldBatch(userId, sorted, state.getOption, gapMicros)
            cur.foreach { s =>
              state.update(s)
              // close when the event-time watermark passes last + gap;
              // a timeout in the past is illegal, so clamp to just
              // above the current watermark (fires on the next batch)
              state.setTimeoutTimestamp(math.max(
                s.last / 1000L + gapSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            closed.iterator
          }
      }
  }

  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapSeconds * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val (cur, closed) = foldBatch(userId, sorted, state.getOption, gapMicros)
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** E2c: the gap sessionizer on `transformWithState` — Spark 4's
    * successor to flatMapGroupsWithState (typed `ValueState` +
    * explicit event-time timers instead of the single timeout slot).
    * Semantics identical to [[sessionizeEventTime]]; the operator
    * mandates the RocksDB state store provider, which SURVEY §4
    * prescribes for big keyed state anyway. Timer discipline: every
    * batch (re-)registers a timer at the session's current deadline;
    * stale timers from extended sessions fire and are ignored because
    * their expiry predates the live deadline.
    */
  class GapSessionProcessor(gapSeconds: Long)
      extends StatefulProcessor[Long, Event, Session] {
    @transient private var session: ValueState[SessionState] = _
    // the single armed timer instant — unlike v1's timeout slot,
    // registerTimer ADDS a timer, so the superseded one must be
    // deleted explicitly or stale timers pile up one per batch
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      session = getHandle.getValueState("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
      armed = getHandle.getValueState("armed",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    private def deadlineMs(s: SessionState): Long =
      s.last / 1000L + gapSeconds * 1000L

    private def rearm(at: Long): Unit = {
      if (armed.exists() && armed.get() != at) getHandle.deleteTimer(armed.get())
      if (!armed.exists() || armed.get() != at) {
        getHandle.registerTimer(at)
        armed.update(at)
      }
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val prev = if (session.exists()) Some(session.get()) else None
      val (cur, closed) = foldBatch(userId, sorted, prev, gapSeconds * 1000000L)
      cur.foreach { s =>
        session.update(s)
        // event-time timers fire when the watermark passes them; keep
        // the registered instant strictly ahead of the watermark so it
        // fires on a later batch, exactly like the v1 clamp
        rearm(math.max(deadlineMs(s), timers.getCurrentWatermarkInMs() + 1L))
      }
      closed.iterator
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Session] = {
      if (!session.exists()) Iterator.empty
      else {
        val s = session.get()
        if (expired.getExpiryTimeInMs() >= deadlineMs(s)) {
          session.clear()
          armed.clear()
          Iterator(toSession(userId, s))
        } else Iterator.empty // stale timer; a newer one guards the session
      }
    }
  }

  def sessionizeTws(events: Dataset[Event], gapSeconds: Long,
                    watermarkDelay: String = "1 minute"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new GapSessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** E2d: the NO-TIMEOUT sessionizer ([[sessionize]]) on
    * `transformWithState` — completes the v2 port: every fMGWS path
    * now has a tws twin. TimeMode.None means no timers at all; idle
    * sessions stay in state until the next event for that user closes
    * them, exactly like the v1 NoTimeout variant. Same in-batch
    * [[foldBatch]] merge, so StreamingSpec pins the two emissions
    * equal row-for-row.
    */
  class GapSessionNoTimerProcessor(gapSeconds: Long)
      extends StatefulProcessor[Long, Event, Session] {
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      session = getHandle.getValueState("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val prev = if (session.exists()) Some(session.get()) else None
      val (cur, closed) = foldBatch(userId, sorted, prev, gapSeconds * 1000000L)
      cur.foreach(session.update)
      closed.iterator
    }
  }

  def sessionizeTwsNoTimeout(events: Dataset[Event],
                             gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new GapSessionNoTimerProcessor(gapSeconds),
        TimeMode.None(), OutputMode.Append())
  }
}
