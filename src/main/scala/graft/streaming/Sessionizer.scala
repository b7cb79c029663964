package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** One input event for stateful sessionization (event time carried both
  * as the watermark column `ts` and as integral seconds for exact gap
  * arithmetic).
  */
final case class SessionEvent(userId: Long, ts: Timestamp, tsSec: Long,
    eventId: Long)

/** Per-user open-session state. */
final case class SessionState(sessionSeq: Long, startTs: Long, lastTs: Long,
    nEvents: Long)

/** One CLOSED session — emitted when the gap rule splits, or when the
  * event-time timeout fires (watermark passed lastTs + gap).
  */
final case class ClosedSession(userId: Long, sessionSeq: Long,
    nEvents: Long, durationS: Long)

/** Stateful streaming sessionization via `flatMapGroupsWithState` —
  * the custom-state counterpart of the relational
  * [[graft.operators.Events.sessionize]] (which needs the whole history
  * per user; this one holds ONE open session per user and emits each
  * session exactly once).
  *
  * Scale shape: state is O(users), not O(events); the only shuffle is
  * the groupByKey hash partitioning on userId. Event-time timeout +
  * watermark bound state lifetime — an idle user's final session is
  * flushed and the key removed as soon as the watermark passes
  * `lastTs + gap`.
  */
object Sessionizer {

  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long)
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(gapSeconds))
  }

  /** Visible for batch-mode unit testing (flatMapGroupsWithState also
    * runs on batch Datasets, where timeouts never fire and only
    * gap-closed sessions emit).
    */
  def update(gapSeconds: Long)(userId: Long, rows: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    def closed(s: SessionState) =
      ClosedSession(userId, s.sessionSeq, s.nEvents, s.lastTs - s.startTs)
    if (state.hasTimedOut) {
      // Watermark passed lastTs+gap: the open session can never grow.
      val out = state.getOption.map(closed).iterator
      state.remove()
      return out
    }
    // Micro-batch grouping gives events unordered — restore event order.
    val sorted = rows.toSeq.sortBy(e => (e.tsSec, e.eventId))
    val out = ArrayBuffer.empty[ClosedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.tsSec - s.lastTs <= gapSeconds =>
          cur = Some(s.copy(lastTs = e.tsSec, nEvents = s.nEvents + 1))
        case Some(s) =>
          out += closed(s)
          cur = Some(SessionState(s.sessionSeq + 1, e.tsSec, e.tsSec, 1))
        case None =>
          cur = Some(SessionState(1, e.tsSec, e.tsSec, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      if (state.getOption.isDefined)
        // Event-time timeout: fires once the watermark passes this.
        try state.setTimeoutTimestamp((s.lastTs + gapSeconds) * 1000L)
        catch { case _: UnsupportedOperationException => () } // batch mode
    }
    out.iterator
  }
}
