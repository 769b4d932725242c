package graft.streaming

import graft.operators.EventsQueries
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Incremental Mann–Kendall trend monitoring (q214) — the
  * drift-watch LOOP an on-call metric review actually runs: every
  * ingest wave updates the per-(type, day) exact-cents aggregates
  * incrementally and the trend battery (q199's S statistic,
  * tie-corrected variance, Theil–Sen slope, verdict) is recomputed
  * from the maintained daily table, never from the event stream.
  *
  * Economics (the q184 pattern): the corpus-sized work — the daily
  * cents collapse ([[EventsQueries.dailyCents]], map-side combined)
  * — runs as a streaming UPDATE-mode aggregation touching each
  * arriving event once, ever; the per-wave recompute
  * ([[EventsQueries.mannKendallFromDaily]]) costs |types|×|days|
  * arithmetic rows (days-bounded by the analysis window), zero
  * corpus reads. Recomputing the q199 batch statistic per wave would
  * re-scan every event each time.
  *
  * Exactness: daily cents are exact LONGs, so after any wave the
  * maintained table EQUALS the batch collapse over everything
  * ingested so far, and the recomputed battery equals the batch q199
  * output over that prefix — per-wave parity, not just final parity
  * (StreamingTrendSpec pins every wave). */
object StreamingTrend {

  /** Driver-side maintainer: merge each update-mode aggregate batch
    * into the (type, day)→cents state and recompute the trend
    * battery. The per-batch collect is bounded by |types|×|days|
    * (the analysis window), never the event count — the same
    * bounded-collect contract as the q184 plan maintainer. */
  final class TrendMaintainer(spark: SparkSession) extends Serializable {
    private val state =
      scala.collection.mutable.Map.empty[(String, Long), Long]
    /** One collected battery per non-empty wave — the per-wave
      * parity surface the spec grades. */
    val waveTrends: scala.collection.mutable.ArrayBuffer[Array[Row]] =
      scala.collection.mutable.ArrayBuffer.empty

    /** foreachBatch sink over the update-mode daily-cents stream:
      * rows are (event_type, d, cents) with the full new aggregate
      * for every (type, day) the wave touched — merge is
      * overwrite. */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      val rows = batch.collect() // |types|x|days|-bounded
      if (rows.nonEmpty) {
        rows.foreach(r =>
          state((r.getString(0), r.getLong(1))) = r.getLong(2))
        waveTrends += currentTrend().collect()
      }
    }

    /** The battery over the maintained daily table —
      * |types|×|days|-row arithmetic, zero event reads. */
    def currentTrend(): DataFrame = synchronized {
      import spark.implicits._
      val daily = state.toSeq.sortBy(_._1)
        .map { case ((t, d), c) => (t, d, c) }
        .toDF("event_type", "d", "cents")
      EventsQueries.mannKendallFromDaily(daily)
    }
  }
}
