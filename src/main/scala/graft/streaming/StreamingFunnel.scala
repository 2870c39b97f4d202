package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.EventsStream.Event

/** Streaming face of the ordered funnel (SURVEY §2 E18 ∘ C21):
  * continuous first-touch funnel tracking per user — each stage
  * completion is emitted the moment it happens, instead of re-scanning
  * history per dashboard refresh.
  *
  * Semantics match [[graft.operators.Funnel]] exactly on in-order
  * input: first-touch (stage i+1 must follow the EARLIEST completion
  * of the prefix, later re-entries don't reopen it), strictly-after
  * ordering with the (ts, event_id) tiebreak, optional `maxGap`
  * between a prefix completion and the next stage. State per user is
  * ONE fixed-size record — the (ts, tiebreak) pair of each completed
  * stage — so the store carries |live users| × |stages| longs, no
  * event history.
  *
  * Ordering contract (same as the E2 sessionizer family): events are
  * folded in (ts, event_id) order WITHIN each micro-batch; a
  * cross-batch straggler that lands before an already-consumed
  * completion is qualified against frozen state, not re-sorted
  * history (the strictly-after check makes it a no-op rather than a
  * wrong emission — it can only MISS, never invent). The
  * buffer-until-watermark upgrade is the same dial the sessionizer
  * documents.
  *
  * State lifecycle: an event-time timeout EVICTS users idle past
  * `expireSeconds` (watermark-driven, so the store is bounded by the
  * active-user set). An evicted user who returns starts a fresh
  * funnel — re-emission of step 1 after a long silence is the
  * documented trade for bounded state.
  */
object StreamingFunnel {

  case class FunnelHit(user_id: Long, step: Int, stage: String,
                       ts: java.sql.Timestamp)
  /** qTs/qTb: per-stage first-touch (micros, tiebreak); -1 = unset. */
  case class FunnelState(qTs: Array[Long], qTb: Array[Long], lastSeen: Long)

  private[streaming] def foldEvents(
      userId: Long, sorted: Seq[Event], st0: Option[FunnelState],
      stages: Seq[String], gapMicros: Option[Long])
      : (FunnelState, Seq[FunnelHit]) = {
    val st = st0.getOrElse(FunnelState(
      Array.fill(stages.length)(-1L), Array.fill(stages.length)(-1L), -1L))
    val qTs = st.qTs.clone(); val qTb = st.qTb.clone()
    var last = st.lastSeen
    val hits = Seq.newBuilder[FunnelHit]
    sorted.foreach { e =>
      val t = e.ts.getTime * 1000L
      last = math.max(last, t)
      val i = stages.indexOf(e.event_type)
      if (i >= 0 && qTs(i) < 0) {
        val ok =
          if (i == 0) true
          else qTs(i - 1) >= 0 &&
            (t > qTs(i - 1) || (t == qTs(i - 1) && e.event_id > qTb(i - 1))) &&
            gapMicros.forall(g => t <= qTs(i - 1) + g)
        if (ok) {
          qTs(i) = t; qTb(i) = e.event_id
          hits += FunnelHit(userId, i + 1, stages(i), e.ts)
        }
      }
    }
    (FunnelState(qTs, qTb, last), hits.result())
  }

  /** The continuous funnel. `expireSeconds` bounds state via an
    * event-time timeout; pass a horizon past your funnel's total span.
    */
  def funnel(events: Dataset[Event], stages: Seq[String],
             gapSeconds: Option[Long] = None,
             expireSeconds: Long = 7 * 86400L,
             watermarkDelay: String = "1 minute"): Dataset[FunnelHit] = {
    require(stages.nonEmpty && stages.distinct.length == stages.length,
      "stages must be non-empty and distinct")
    import events.sparkSession.implicits._
    val gapMicros = gapSeconds.map(_ * 1000000L)
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val (st, hits) = foldEvents(userId, sorted, state.getOption,
              stages, gapMicros)
            state.update(st)
            state.setTimeoutTimestamp(math.max(
              st.lastSeen / 1000L + expireSeconds * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            hits.iterator
          }
      }
  }

  /** Batch twin on a static frame — identical fold, used by the spec
    * to pin stream ≡ batch ≡ [[graft.operators.Funnel]] first-touch.
    */
  def funnelBatch(events: Seq[Event], stages: Seq[String],
                  gapSeconds: Option[Long] = None): Seq[FunnelHit] =
    events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      foldEvents(u, es.sortBy(e => (e.ts.getTime, e.event_id)), None,
        stages, gapSeconds.map(_ * 1000000L))._2
    }.sortBy(h => (h.user_id, h.step))
}
