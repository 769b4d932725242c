package graft.streaming

import graft.operators.Sampling
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Incremental epoch-schedule maintenance (q184) — the mixture-
  * planning LOOP a production curriculum actually runs: every ingest
  * wave updates the per-source token aggregates incrementally and the
  * repetition plan is recomputed from the maintained aggregates,
  * never from the corpus.
  *
  * Economics (the q92 wave argument): the corpus-sized work — token
  * counting and the per-source LONG aggregation
  * ([[Sampling.sourceTokenCounts]], map-side combined) — runs as a
  * streaming UPDATE-mode aggregation, touching each arriving document
  * once, ever. The plan recompute is [[Sampling.epochScheduleFromCounts]]
  * over the |S|-row maintained state — per-wave cost is |sources|
  * arithmetic rows, zero corpus reads. Recomputing the q180 batch
  * plan per wave would re-scan the whole corpus each time; the twin's
  * per-wave cost is O(|S|).
  *
  * Exactness: counts are exact longs, so after any wave the
  * maintained state EQUALS the batch aggregation over everything
  * ingested so far, and the recomputed plan equals the batch q180
  * plan over that prefix corpus — per-wave parity, not just final
  * parity (StreamingScheduleSpec pins every wave). */
object StreamingSchedule {

  /** Driver-side maintainer: merge each update-mode aggregate batch
    * into the |S|-bounded source→(n_docs, src_tokens) state and
    * recompute the plan. The per-batch collect is bounded by the
    * SOURCE vocabulary (tens of rows), never the corpus — the same
    * bounded-collect contract as the codebook operators. */
  final class EpochPlanMaintainer(spark: SparkSession,
      alpha: Double = Sampling.MixTemperature,
      budgetFrac: Double = Sampling.EpochBudgetFrac,
      epochCap: Double = Sampling.EpochCap) extends Serializable {
    private val state =
      scala.collection.mutable.Map.empty[String, (Long, Long)]
    /** One collected plan per non-empty wave — the recompute LOOP's
      * evidence, and the per-wave parity surface the spec grades. */
    val wavePlans: scala.collection.mutable.ArrayBuffer[Array[Row]] =
      scala.collection.mutable.ArrayBuffer.empty

    /** foreachBatch sink over the update-mode counts stream: rows are
      * (source, n_docs, src_tokens) with full new aggregate values
      * for every source the wave touched — merge is overwrite. */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      val rows = batch.collect() // |S|-bounded by construction
      if (rows.nonEmpty) {
        rows.foreach(r =>
          state(r.getString(0)) = (r.getLong(1), r.getLong(2)))
        wavePlans += currentPlan().collect()
      }
    }

    /** The plan over the maintained aggregates — |S|-row arithmetic,
      * zero corpus reads. */
    def currentPlan(): DataFrame = synchronized {
      import spark.implicits._
      val counts = state.toSeq.sortBy(_._1)
        .map { case (s, (n, t)) => (s, n, t) }
        .toDF("source", "n_docs", "src_tokens")
      Sampling.epochScheduleFromCounts(counts, alpha, budgetFrac,
        epochCap)
    }
  }
}
