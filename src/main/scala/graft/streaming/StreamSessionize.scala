package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state (the
  * `flatMapGroupsWithState` flavor of M8): batch `events_sessionize`
  * groups by 30-minute inactivity gaps after the fact; this closes the
  * same sessions ON the live stream, emitting each one exactly when the
  * event-time watermark passes its gap.
  *
  * State per key is one open session (bounded); the event-time timeout
  * fires when the watermark crosses `lastTs + gap`, so state for idle
  * users is reclaimed by the engine, not by a manual sweep. Out-of-order
  * events within a batch are sorted before folding; events later than
  * the watermark were already dropped upstream by `withWatermark`.
  */
object StreamSessionize {

  final case class Event(userId: Long, ts: Timestamp, value: Double)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Int, sum: Double)
  final case class Session(userId: Long, startTs: Timestamp, endTs: Timestamp, nEvents: Int, sumValue: Double)

  /** `events` must already carry a watermark on `ts` (the caller picks
    * the lateness bound; the gap is the session semantics). */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed lastTs + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator(close(userId, s))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open = open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  Some(OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1, s.sum + e.value))
                case Some(s) => // gap exceeded inside the batch
                  closed += close(userId, s)
                  Some(OpenSession(t, t, 1, e.value))
                case None => Some(OpenSession(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  private def close(userId: Long, s: OpenSession): Session =
    Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sum)
}
