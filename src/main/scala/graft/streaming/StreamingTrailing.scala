package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Per-event trailing-window aggregates run INCREMENTALLY — the
  * streaming twin of [[graft.operators.EventsQueries.trailingHourStats]]
  * (q71): for every event, how many events and how much value the
  * same user produced in the window ending at it, correct under
  * out-of-order arrival.
  *
  * A RANGE frame needs every row in [ts − W, ts], so an event can
  * only be FINALIZED once the watermark passes its timestamp (any
  * still-missing frame member would arrive below the watermark and
  * be dropped by the engine — the frame is provably complete).
  * State per user: `pending` events (arrived, not yet finalizable)
  * and `frame` events (finalized, but still inside a future event's
  * window). Both are evicted once the watermark passes ts + W.
  *
  * Scale design: one shuffle on user_id (the batch plan's window
  * key); state is bounded by each user's event rate × the window —
  * eviction is by event-time, not growth. Emission order across
  * batches is arrival-driven, but the emitted ROWS are exactly the
  * batch operator's (spec-pinned on out-of-order delivery).
  *
  * Engine boundary worth knowing: Structured Streaming drops input
  * rows with event_time ≤ current watermark for this operator, and
  * the INITIAL watermark is 0 — so finalizing at `ts ≤ wm` is safe
  * (an equal-ts row can never arrive afterwards), and an event at
  * epoch 0 exactly is unreachable by construction.
  */
object StreamingTrailing {

  final case class TEvent(user_id: Long, event_id: Long, ts_ms: Long,
      value: Double, event_time: java.sql.Timestamp)
  final case class Stored(ts_ms: Long, event_id: Long, value: Double)
  final case class TState(pending: List[Stored], frame: List[Stored])
  final case class TrailingStat(user_id: Long, event_id: Long,
      ts_ms: Long, n_1h: Long, sum_1h: Double)

  /** `events` needs (user_id, event_id, ts_ms, value). */
  def trailingHourStats(events: DataFrame,
      windowMs: Long = 3600000L,
      delay: String = "10 minutes"): Dataset[TrailingStat] = {
    import events.sparkSession.implicits._
    val keyed = events
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("value"),
        timestamp_millis(col("ts_ms")).as("event_time"))
      .withWatermark("event_time", delay)
      .as[TEvent]
      .groupByKey(_.user_id)

    keyed.flatMapGroupsWithState[TState, TrailingStat](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (user, evs, state) =>
        val st = state.getOption.getOrElse(TState(Nil, Nil))
        val wm = state.getCurrentWatermarkMs()
        val arrived = evs.map(e => Stored(e.ts_ms, e.event_id, e.value)).toList

        var pending = arrived reverse_::: st.pending
        var frame = st.frame
        val out = scala.collection.mutable.ArrayBuffer.empty[TrailingStat]

        // finalize: frame-complete events, in event-time order (the
        // batch window's processing order, making tie sums add in the
        // same sequence)
        val (ready, notReady) = pending.partition(_.ts_ms <= wm)
        ready.sortBy(s => (s.ts_ms, s.event_id)).foreach { e =>
          val members = (frame ++ ready).filter(s =>
            s.ts_ms >= e.ts_ms - windowMs && s.ts_ms <= e.ts_ms)
          val ordered = members.sortBy(s => (s.ts_ms, s.event_id))
          out += TrailingStat(user, e.event_id, e.ts_ms,
            ordered.length.toLong, ordered.map(_.value).sum)
        }
        frame = ready reverse_::: frame
        pending = notReady

        // evict: an event can no longer be in any unfinalized frame
        // once the watermark passes ts + W (future finalizations all
        // have ts > wm)
        frame = frame.filter(_.ts_ms + windowMs >= wm)

        if (pending.isEmpty && frame.isEmpty) state.remove()
        else {
          state.update(TState(pending, frame))
          // wake when the next pending event becomes finalizable, or
          // (drained) when the last frame member expires
          val next =
            if (pending.nonEmpty) pending.map(_.ts_ms).min + 1
            else frame.map(_.ts_ms + windowMs).max + 1
          state.setTimeoutTimestamp(math.max(wm + 1, next))
        }
        out.iterator
    }
  }
}
