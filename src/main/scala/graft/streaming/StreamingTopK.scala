package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-window top-k over an unbounded event stream — the streaming
  * twin of the [[org.apache.spark.sql.graft.TopKPerGroup]] batch
  * operator (q50), windowed: for every (tumbling event-time window,
  * event_type) the k highest-value events, finalized and emitted once
  * the watermark passes the window end (the trending-terms /
  * leaderboard shape every ingest dashboard needs).
  *
  * Ranking inside arbitrary window frames is inexpressible in
  * Structured Streaming's declarative surface (no window functions
  * over streams), so this is the `flatMapGroupsWithState` rung: key =
  * (window start, event_type); state = a BOUNDED k-element heap of
  * (value, event_id) — the same replace-the-worst contract as the
  * batch operator's per-partition heaps, held across micro-batches
  * instead of across partitions. An EventTimeTimeout set to the
  * window end fires exactly once per group when the event-time clock
  * passes it, emitting the ranked rows append-mode-correctly and
  * REMOVING the state — live state is k rows per open (window, type),
  * never the stream (StreamingStateBoundsSpec asserts the eviction).
  *
  * Parity: StreamingTopKSpec replays the events fixture out of order
  * across micro-batches and asserts row equality with the batch
  * operator `TopK.perGroup(events ⋈ window, (window, type),
  * value desc / event_id asc, k)`.
  */
object StreamingTopK {

  final case class WinType(window_start: Long, event_type: String)
  /** Bounded heap entry; ordering = value desc, event_id asc. */
  final case class Entry(value: Double, event_id: Long)
  final case class RankedEvent(
      window_start: Long, event_type: String,
      event_id: Long, value: Double, rank: Long)

  val DefaultWindowMs: Long = 3600000L
  val DefaultK = 3

  /** Top-k per (tumbling window, event_type) over a streaming
    * DataFrame with columns (ts: timestamp, event_type, event_id,
    * value). The caller sets the watermark on `ts` (the twins'
    * convention — delay is a pipeline policy, not an operator one);
    * results for a window emit when the watermark passes its end. */
  def topKPerWindow(events: DataFrame, windowMs: Long = DefaultWindowMs,
      k: Int = DefaultK): Dataset[RankedEvent] = {
    import events.sparkSession.implicits._
    require(k > 0, "top-k needs k > 0")
    val keyed = events
      .withColumn("window_start",
        (unix_millis(col("ts")) / windowMs).cast("long") * windowMs)
      // the watermarked ts column must flow INTO the stateful
      // operator or the analyzer rejects EventTimeTimeout
      .select(col("window_start"), col("event_type"), col("event_id"),
        col("value"), col("ts"))
      .as[(Long, String, Long, Double, java.sql.Timestamp)]
      .groupByKey { case (ws, t, _, _, _) => WinType(ws, t) }

    keyed.flatMapGroupsWithState[List[Entry], RankedEvent](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: WinType,
          rows: Iterator[(Long, String, Long, Double, java.sql.Timestamp)],
          state: GroupState[List[Entry]]) =>
        // total order: value desc, event_id asc — worst entry last
        def better(a: Entry, b: Entry): Boolean =
          a.value > b.value || (a.value == b.value && a.event_id < b.event_id)
        if (state.hasTimedOut) {
          // watermark passed the window end: finalize, emit, evict
          val ranked = state.get.sortWith(better).zipWithIndex.map {
            case (e, i) => RankedEvent(key.window_start, key.event_type,
              e.event_id, e.value, i + 1L)
          }
          state.remove()
          ranked.iterator
        } else {
          // merge the batch into the bounded heap: keep the k best
          val merged = (state.getOption.getOrElse(Nil) ++
            rows.map(r => Entry(r._4, r._3)))
            .sortWith(better).take(k)
          state.update(merged)
          // fire when the event-time clock passes the window end; a
          // group first seen after its end (late rows inside the
          // allowed lateness) must still get a FUTURE timestamp —
          // the API rejects timeouts at or before the watermark
          state.setTimeoutTimestamp(math.max(
            key.window_start + windowMs,
            state.getCurrentWatermarkMs() + 1))
          Iterator.empty
        }
    }
  }
}
