package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analog of W2 gap-bridging sessionization (SURVEY.md
  * §2.9) over an event stream shaped like the driver `events` table.
  *
  * Two forms:
  *   - `timeSessions`: the built-in `session_window` — time-gap-only
  *     semantics, watermark-driven eviction. This is the idiomatic
  *     Spark path and scales via the streaming state store.
  *   - `dualPredicateSessions`: the reference's DUAL predicate
  *     (sequence gap AND time gap, claude_research_optimal.py:
  *     298–301) via `flatMapGroupsWithState` — per-key ordered state,
  *     emitting a session row when a boundary closes it. State is one
  *     small struct per user, timeout-evicted, so memory is O(keys).
  */
object StreamingSessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, value: Double)

  final case class SessionState(
      sessionStart: Long, lastEventId: Long, lastTsMicros: Long,
      nEvents: Long, sumValue: Double, firstEvent: Long)

  final case class SessionOut(user_id: Long, first_event: Long,
      last_event: Long, n_events: Long, sum_value: Double)

  /** Built-in time-gap sessionization with watermarking. */
  def timeSessions(events: DataFrame, gap: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        sum(col("value")).as("sum_value"))

  /** Dual-predicate sessionization: close the session when
    * event_id gap > maxGapEvents OR time gap > maxGapMicros.
    * Events must arrive in per-key order (guaranteed within a batch
    * by sorting; across batches by the source in tests).
    */
  def dualPredicateSessions(events: Dataset[Event], maxGapEvents: Long,
      maxGapMicros: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[Event],
            state: GroupState[SessionState]) => {
          val out = Seq.newBuilder[SessionOut]
          var st = state.getOption.orNull
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val m = micros(e.ts)
            if (st == null) {
              st = SessionState(m, e.event_id, m, 1L, e.value, e.event_id)
            } else {
              val boundary = (e.event_id - st.lastEventId) > maxGapEvents ||
                (m - st.lastTsMicros) > maxGapMicros
              if (boundary) {
                out += SessionOut(userId, st.firstEvent, st.lastEventId,
                  st.nEvents, st.sumValue)
                st = SessionState(m, e.event_id, m, 1L, e.value, e.event_id)
              } else {
                st = st.copy(lastEventId = e.event_id, lastTsMicros = m,
                  nEvents = st.nEvents + 1, sumValue = st.sumValue + e.value)
              }
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
        })
  }

  /** [[dualPredicateSessions]] plus idle-session flushing: a session
    * with no closing successor still emits once the event-time
    * watermark passes its last event by `maxGapMicros` — without
    * this, the last session of every key sits in the state store
    * forever, which at 100 TB/billions of keys means unbounded state
    * AND results that never arrive. Requires a watermark on `ts`
    * upstream (asserted); state per key is one small struct, evicted
    * on timeout, so store size is O(open sessions), not O(events).
    */
  def dualPredicateSessionsFlushed(events: Dataset[Event],
      maxGapEvents: Long, maxGapMicros: Long,
      watermarkDelay: String): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

    events.withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[Event],
            state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(userId, st.firstEvent,
              st.lastEventId, st.nEvents, st.sumValue))
          } else {
            val out = Seq.newBuilder[SessionOut]
            var st = state.getOption.orNull
            it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val m = micros(e.ts)
              if (st == null) {
                st = SessionState(m, e.event_id, m, 1L, e.value, e.event_id)
              } else {
                val boundary = (e.event_id - st.lastEventId) > maxGapEvents ||
                  (m - st.lastTsMicros) > maxGapMicros
                if (boundary) {
                  out += SessionOut(userId, st.firstEvent, st.lastEventId,
                    st.nEvents, st.sumValue)
                  st = SessionState(m, e.event_id, m, 1L, e.value, e.event_id)
                } else {
                  st = st.copy(lastEventId = e.event_id, lastTsMicros = m,
                    nEvents = st.nEvents + 1, sumValue = st.sumValue + e.value)
                }
              }
            }
            if (st != null) {
              state.update(st)
              // close the open session when the watermark passes its
              // last event by the session gap. Millis round UP: per-
              // term truncation could fire the timeout up to ~2 ms
              // early, emitting a session an exactly-on-boundary
              // event should still join (late flush is always safe,
              // early flush breaks batch parity)
              state.setTimeoutTimestamp(
                (st.lastTsMicros + maxGapMicros) / 1000L + 1L)
            }
            out.result().iterator
          }
        })
  }
}
