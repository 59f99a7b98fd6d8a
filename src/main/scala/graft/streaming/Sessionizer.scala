package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with explicit keyed state — the
  * `flatMapGroupsWithState` form of [[graft.operators.Curation.sessionize]]
  * (same gap-split semantics, incremental over an unbounded stream).
  *
  * State per user is one open session (5 numbers — constant, not
  * per-event), keyed state lives in the state store and is dropped via
  * event-time timeout: when the watermark passes `last event + gap`, the
  * open session provably cannot be extended (any extending event would be
  * later than the watermark) and is emitted + removed. That bounds state
  * to active users only — the property that keeps this runnable forever
  * at cluster scale.
  *
  * A session closes two ways:
  *  - in-line: a new event arrives with `ts - last > gap` → emit the old
  *    session, open a new one;
  *  - timeout: no event arrives and the watermark passes the gap horizon
  *    → emit and clear.
  *
  * Within a micro-batch events sort by (ts, event_id); across batches
  * ordering is the watermark's job (late events beyond it are dropped by
  * Spark before reaching the state function).
  *
  * `session_id` = the session's start time in epoch millis — the same id
  * contract as the batch operator. A per-user ordinal would restart at 1
  * after an event-time timeout removes the user's state and mint duplicate
  * (user_id, session_id) keys; start-derived ids stay unique with no extra
  * state because session starts strictly increase per user.
  */
object Sessionizer {

  case class Event(user_id: Long, ts: Timestamp, event_id: Long, value: Double)

  case class OpenSession(
      startMs: Long,
      lastMs: Long,
      nEvents: Long,
      total: Double)

  case class ClosedSession(
      user_id: Long,
      session_id: Long,
      n_events: Long,
      total_value: Double,
      duration_ms: Long)

  /** Closed sessions stream. `delay` is the watermark (lateness bound);
    * `gapMillis` the inactivity gap. */
  def sessions(events: Dataset[Event], gapMillis: Long, delay: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapMillis))
  }

  private def close(userId: Long, s: OpenSession): ClosedSession =
    ClosedSession(userId, s.startMs, s.nEvents, s.total, s.lastMs - s.startMs)

  private def update(gapMillis: Long)(
      userId: Long,
      rows: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val out = Iterator.single(close(userId, state.get))
      state.remove()
      out
    } else {
      val emitted = Seq.newBuilder[ClosedSession]
      var cur = state.getOption
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val ms = e.ts.getTime
        cur = cur match {
          case Some(s) if ms - s.lastMs <= gapMillis =>
            Some(s.copy(lastMs = math.max(s.lastMs, ms),
              nEvents = s.nEvents + 1, total = s.total + e.value))
          case Some(s) =>
            emitted += close(userId, s)
            Some(OpenSession(ms, ms, 1L, e.value))
          case None =>
            Some(OpenSession(ms, ms, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMillis + 1)
      }
      emitted.result().iterator
    }
  }
}
