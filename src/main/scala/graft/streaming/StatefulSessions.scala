package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event (matches the `events` table columns used). */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** Open-session accumulator kept in state store between micro-batches. */
final case class SessionAcc(startMs: Long, endMs: Long, events: Long, value: Double)

/** A closed session. */
final case class ClosedSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    session_events: Long,
    session_value: Double)

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY §2.9 /
  * builder prompt): gap-based sessionization that emits a session only when
  * it closes — either a later event arrives beyond the gap, or the
  * event-time watermark passes the session end (timeout). State per key is
  * one small accumulator; the watermark bounds it — the
  * `KeyValueGroupedDataset` state pattern that stays O(active keys) at any
  * stream volume.
  */
object StatefulSessions {

  /** Sessionize a stream of [[SessionEvent]]s with the given inactivity gap.
    * Input must carry a watermark on `ts` for the event-time timeout. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long): Dataset[ClosedSession] = {
    implicit val accEnc = Encoders.product[SessionAcc]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionAcc]) => {
          def close(acc: SessionAcc) = ClosedSession(
            user, new Timestamp(acc.startMs), new Timestamp(acc.endMs),
            acc.events, acc.value)

          if (state.hasTimedOut) {
            val out = state.getOption.map(close).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                // Within gap of the open session on EITHER side — a late
                // event may precede the session start (gap math must be
                // two-sided, not signed), extending the window both ways.
                case Some(acc) if t >= acc.startMs - gapMs && t <= acc.endMs + gapMs =>
                  open = Some(acc.copy(
                    startMs = math.min(acc.startMs, t),
                    endMs = math.max(acc.endMs, t),
                    events = acc.events + 1, value = acc.value + e.value))
                // Too late even for the gap before the open session: emit it
                // as its own already-closed earlier session.
                case Some(acc) if t < acc.startMs - gapMs =>
                  closed += close(SessionAcc(t, t, 1L, e.value))
                // Beyond the gap after: close the open session, start anew.
                case Some(acc) =>
                  closed += close(acc)
                  open = Some(SessionAcc(t, t, 1L, e.value))
                case None =>
                  open = Some(SessionAcc(t, t, 1L, e.value))
              }
            }
            open.foreach { acc =>
              state.update(acc)
              // Fires once the event-time watermark passes session end + gap.
              state.setTimeoutTimestamp(acc.endMs + gapMs)
            }
            closed.result().iterator
          }
        })
  }
}
