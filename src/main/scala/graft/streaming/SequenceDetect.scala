package graft.streaming

import graft.operators.EventsQueries
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP-style sequence detection run INCREMENTALLY — the streaming
  * twin of [[EventsQueries.clickToPurchase]] (q64) and the Spark
  * expression of the pattern a Flink user would hand to the CEP
  * library: per user, emit (click, purchase) when a purchase follows
  * a click within the window, under out-of-order arrival.
  *
  * State per user: pending clicks (awaiting a purchase) and recent
  * purchases (serving late-arriving clicks — an event-time-earlier
  * click may arrive in a later batch than its purchase). Both lists
  * evict once the watermark passes ts + window: by then any row that
  * could still pair with them would be below the watermark and
  * dropped by the engine. A click converts AT MOST once (removed on
  * first match, earliest eligible purchase chosen), matching the
  * batch operator's EXISTS semantics count-for-count.
  *
  * Scale design: state is bounded by each user's event rate × the
  * window (eviction is by event-time timeout, not growth); the
  * operator shuffles once on user_id, the same key the batch plan
  * windows on.
  */
object SequenceDetect {

  final case class SeqEvent(user_id: Long, event_type: String,
      ts_ms: Long, event_time: java.sql.Timestamp)
  final case class SeqState(pendingClicks: List[Long],
      recentPurchases: List[Long])
  final case class Conversion(user_id: Long, click_ts: Long,
      purchase_ts: Long)

  /** `events` needs (user_id, event_type, ts_ms); watermark applied
    * here over timestamp_millis(ts_ms). */
  def clickToPurchase(events: DataFrame,
      windowMs: Long = EventsQueries.SequenceWindowMs,
      delay: String = "10 minutes"): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    val keyed = events
      .select(col("user_id"), col("event_type"), col("ts_ms"),
        timestamp_millis(col("ts_ms")).as("event_time"))
      .withWatermark("event_time", delay)
      .as[SeqEvent]
      .groupByKey(_.user_id)

    keyed.flatMapGroupsWithState[SeqState, Conversion](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (user: Long, evs: Iterator[SeqEvent], state: GroupState[SeqState]) =>
        val st = state.getOption.getOrElse(SeqState(Nil, Nil))
        val wm = state.getCurrentWatermarkMs()

        // a click stays matchable until wm passes its window end; a
        // purchase only serves LATE clicks c <= p, and late rows below
        // the watermark are dropped by the engine, so p < wm is
        // unreachable — the tighter bound halves purchase state
        def clickLive(ts: Long): Boolean = ts + windowMs >= wm
        def purchaseLive(ts: Long): Boolean = ts >= wm
        def expiries(clicks: List[Long], purchases: List[Long]) =
          clicks.map(_ + windowMs) ++ purchases

        if (state.hasTimedOut) {
          val kept = SeqState(st.pendingClicks.filter(clickLive),
            st.recentPurchases.filter(purchaseLive))
          if (kept.pendingClicks.isEmpty && kept.recentPurchases.isEmpty)
            state.remove()
          else {
            state.update(kept)
            state.setTimeoutTimestamp(math.max(wm + 1,
              expiries(kept.pendingClicks, kept.recentPurchases).min + 1))
          }
          Iterator.empty
        } else {
          var pending = st.pendingClicks
          var purchases = st.recentPurchases
          val out = scala.collection.mutable.ArrayBuffer.empty[Conversion]
          // in-batch order by event time so in-order data behaves
          // exactly like the batch fold
          evs.toSeq.sortBy(_.ts_ms).foreach { e =>
            e.event_type match {
              case "click" =>
                val eligible = purchases
                  .filter(p => p >= e.ts_ms && p - e.ts_ms <= windowMs)
                if (eligible.nonEmpty)
                  out += Conversion(user, e.ts_ms, eligible.min)
                else pending = e.ts_ms :: pending
              case "purchase" =>
                purchases = e.ts_ms :: purchases
                val (hit, miss) = pending.partition(c =>
                  e.ts_ms >= c && e.ts_ms - c <= windowMs)
                out ++= hit.sorted.map(c => Conversion(user, c, e.ts_ms))
                pending = miss
              case _ => ()
            }
          }
          pending = pending.filter(clickLive)
          purchases = purchases.filter(purchaseLive)
          if (pending.isEmpty && purchases.isEmpty) state.remove()
          else {
            state.update(SeqState(pending, purchases))
            state.setTimeoutTimestamp(
              math.max(wm + 1, expiries(pending, purchases).min + 1))
          }
          out.iterator
        }
    }
  }
}
