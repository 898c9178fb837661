package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.Analytics

/** The session-scoped transition matrix maintained CONTINUOUSLY — the
  * streaming face of `events_transitions`. The batch query derives
  * (prev → next) pairs with a lag window after the fact; here each
  * user's LAST event rides in `flatMapGroupsWithState` state (one tiny
  * row per user, the smallest possible keyed state), so a transition
  * that straddles a micro-batch boundary is emitted exactly like an
  * intra-batch one — a naive per-batch lag would silently drop every
  * boundary transition.
  *
  * Precondition (same as the change-stream appliers): per-user delivery
  * is ts-ordered ACROSS batches; within a batch, rows are sorted before
  * folding. The 30-minute gap rule is applied per emission, identical
  * to the batch filter. Counting/probability arithmetic is shared with
  * the batch query via [[Analytics.transitionMatrix]], so the two can
  * never disagree downstream of pair generation.
  */
object StreamTransitions {

  final case class Ev(userId: Long, eventType: String, tsNs: Long, eventId: Long)
  final case class LastEvent(tsNs: Long, eventId: Long, eventType: String)
  final case class Transition(fromType: String, toType: String)

  /** Default session boundary: 30 min in ns (the sessionize gap). */
  val GapNs: Long = 1800L * 1000000000L

  /** The raw transition stream: one row per (prev → next) pair within
    * the gap. Works on a streaming OR batch Dataset. */
  def transitions(events: Dataset[Ev], gapNs: Long = GapNs): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Ev], state: GroupState[LastEvent]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsNs, e.eventId))
          val out = Seq.newBuilder[Transition]
          var last = state.getOption
          sorted.foreach { e =>
            last.foreach { l =>
              if (e.tsNs - l.tsNs <= gapNs) out += Transition(l.eventType, e.eventType)
            }
            last = Some(LastEvent(e.tsNs, e.eventId, e.eventType))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Collected transition pairs → the batch query's exact matrix shape
    * (`from_type, to_type, n, p_e6`) through the SHARED arithmetic. */
  def matrix(pairs: DataFrame): DataFrame =
    Analytics.transitionMatrix(
      pairs.withColumnRenamed("fromType", "from_type")
        .withColumnRenamed("toType", "to_type"))
}
