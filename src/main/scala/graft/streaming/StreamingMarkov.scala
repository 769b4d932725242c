package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Markov transition mining (q153) — the online twin of
  * the q139 matrix: each user's LAST event lives in
  * `flatMapGroupsWithState` state, and every arriving event emits
  * its (previous type → this type) transition occurrence — including
  * the pair that SPANS a micro-batch boundary, which a per-batch
  * window recomputation would silently drop (the cross-batch case
  * StreamingMarkovSpec pins). Aggregating the emitted pair stream
  * through [[graft.operators.EventsQueries.markovMatrixFromPairs]]
  * reproduces the batch matrix exactly, whatever the batch
  * boundaries.
  *
  * Scale design: state is one (ts, id, type) triple per active user,
  * keyed/partitioned by user; per batch each user folds only its own
  * new events (sorted in-memory, batch×user-bounded); emission is
  * data-driven — no watermark, no timers. */
object StreamingMarkov {

  final case class LastEvent(tsMs: Long, eventId: Long, tpe: String)

  final case class Transition(event_type: String, next_type: String)

  /** events: a streaming frame with user_id, ts_ms, event_id,
    * event_type, time-ordered per user across batches. */
  def transitions(events: DataFrame): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .select("user_id", "ts_ms", "event_id", "event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[LastEvent]) =>
          val evs = rows.toIndexedSeq.sortBy(e => (e._2, e._3))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[Transition]
          var prev = state.getOption
          evs.foreach { e =>
            prev.foreach(p => out += Transition(p.tpe, e._4))
            prev = Some(LastEvent(e._2, e._3, e._4))
          }
          prev.foreach(state.update)
          out.iterator
      }
  }
}
