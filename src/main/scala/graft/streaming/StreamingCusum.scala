package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM monitor (q156) — the serve-online half of the
  * q150 changepoint screen (the q118/q143 train-offline/serve-online
  * split applied to monitoring): per-type (μ, σ) are trained
  * batch-side ([[graft.operators.EventsQueries.cusumStats]], an
  * event-type-bounded collect) and ride into the stream as broadcast
  * constants; state per type is the OPEN hour's partial count plus
  * the CUSUM prefix pair (P, min P). An hour CLOSES — emitting its
  * (hour, count, cusum, alarm) row — the moment a later hour's event
  * arrives, so emission is data-driven (no watermark, no timers) and
  * an hour that spans micro-batches accumulates correctly from
  * state.
  *
  * Emission contract (spec- and oracle-pinned): exactly the batch
  * operator's rows MINUS each type's final observed hour (still open
  * in state when the stream pauses — the q143 closed-rows
  * contract). The incremental P += dev fold adds deviations in hour
  * order — the same sequence as the batch window's running sum, so
  * every double matches bit-for-bit. */
object StreamingCusum {

  final case class CusumState(hourId: Long, inHour: Long,
      p: Double, minP: Double)

  final case class HourRow(event_type: String, hour_id: Long,
      n_events: Long, cusum: Double, alarm: Boolean)

  /** events: streaming frame with ts_ms + event_type, hour-ordered
    * per type across batches; stats: the batch-trained per-type
    * (μ, σ). */
  def monitor(events: DataFrame,
      stats: Map[String, (Double, Double)]): Dataset[HourRow] = {
    import events.sparkSession.implicits._
    import graft.operators.EventsQueries.{CusumH, CusumK}
    events
      .selectExpr("event_type", "ts_ms DIV 3600000 AS hour_id")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, HourRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[(String, Long)],
            state: GroupState[CusumState]) =>
          val (mu, sigma) = stats.getOrElse(tpe, (0.0, 0.0))
          val drift = mu + CusumK * sigma
          val out = scala.collection.mutable.ArrayBuffer
            .empty[HourRow]
          var st = state.getOption
          def close(s: CusumState): CusumState = {
            // identical operand order to the batch columns:
            // dev = n - drift; P += dev; cusum = P - min(minP, 0)
            val p = s.p + (s.inHour - drift)
            val minP = math.min(s.minP, p)
            val cusum = p - math.min(minP, 0.0)
            out += HourRow(tpe, s.hourId, s.inHour, cusum,
              cusum > CusumH * sigma)
            CusumState(s.hourId, 0L, p, minP)
          }
          rows.toIndexedSeq.sortBy(_._2).foreach { case (_, h) =>
            st match {
              case Some(s) if s.hourId == h =>
                st = Some(s.copy(inHour = s.inHour + 1))
              case Some(s) =>
                val closed = close(s)
                st = Some(CusumState(h, 1L, closed.p, closed.minP))
              case None =>
                st = Some(CusumState(h, 1L, 0.0,
                  Double.PositiveInfinity))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
