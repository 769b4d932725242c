package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Page–Hinkley monitor (q260) — the serve-online half of
  * the q259 drift screen, built exactly like [[StreamingCusum]]
  * (q156): σ is trained batch-side (the q150 exact-moment trainer —
  * an event-type-bounded collect) and rides in as a broadcast
  * constant; state per type is the OPEN hour's partial count plus
  * the PH accumulator triple (hours seen i, running count sum,
  * running m and its prefix min). An hour CLOSES — emitting its
  * (hour, count, ph, alarm) row — when a later hour's first event
  * arrives, so emission is data-driven and an hour spanning
  * micro-batches accumulates correctly from state.
  *
  * Emission contract (spec- and oracle-pinned): exactly the batch
  * q259 rows MINUS each type's final observed hour (still open in
  * state when the stream pauses — the q156/q143 closed-rows
  * contract). The incremental fold adds deviations in hour order
  * with the batch columns' operand order (n − rsum/i − δσ), so
  * every double matches bit-for-bit. */
object StreamingPageHinkley {

  final case class PhState(hourId: Long, inHour: Long, i: Long,
      rsum: Long, m: Double, minM: Double)

  final case class PhRow(event_type: String, hour_id: Long,
      n_events: Long, ph: Double, alarm: Boolean)

  /** events: streaming frame with ts_ms + event_type, hour-ordered
    * per type across batches; stats: the batch-trained per-type
    * (μ, σ) — only σ is consumed (PH is self-referenced on the
    * level, the q259 point). */
  def monitor(events: DataFrame,
      stats: Map[String, (Double, Double)]): Dataset[PhRow] = {
    import events.sparkSession.implicits._
    import graft.operators.EventsQueries.{PhDelta, PhLambda}
    events
      .selectExpr("event_type", "ts_ms DIV 3600000 AS hour_id")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PhState, PhRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[(String, Long)],
            state: GroupState[PhState]) =>
          val sigma = stats.getOrElse(tpe, (0.0, 0.0))._2
          val out = scala.collection.mutable.ArrayBuffer.empty[PhRow]
          var st = state.getOption
          def close(s: PhState): PhState = {
            // identical operand order to the batch columns:
            // dev = n − rsum/i − δσ; m += dev; ph = m − min(minM, m)
            val i = s.i + 1
            val rsum = s.rsum + s.inHour
            val dev = s.inHour.toDouble - rsum.toDouble / i -
              PhDelta * sigma
            val m = s.m + dev
            val minM = math.min(s.minM, m)
            val ph = m - minM
            out += PhRow(tpe, s.hourId, s.inHour, ph,
              ph > PhLambda * sigma)
            PhState(s.hourId, 0L, i, rsum, m, minM)
          }
          rows.toIndexedSeq.sortBy(_._2).foreach { case (_, h) =>
            st match {
              case Some(s) if s.hourId == h =>
                st = Some(s.copy(inHour = s.inHour + 1))
              case Some(s) =>
                val closed = close(s)
                st = Some(PhState(h, 1L, closed.i, closed.rsum,
                  closed.m, closed.minM))
              case None =>
                st = Some(PhState(h, 1L, 0L, 0L, 0.0,
                  Double.PositiveInfinity))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
