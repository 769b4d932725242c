package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM interval join — the two-unbounded-inputs
  * join Structured Streaming exists for (reference architecture's
  * enrichment joins are stream-to-static; this is the genuinely
  * streaming case): every click joined to the same user's purchases
  * within the attribution horizon, emitted as both sides arrive.
  *
  * This closes the SURVEY §2.4 "stream-stream joins with watermarks
  * if ever needed" deferral with the canonical use case — ad/touch
  * attribution pair formation (the raw-pair input of the q140
  * credit assignment, formed continuously instead of in a daily
  * batch).
  *
  * Mechanics: both sides carry an event-time watermark and the join
  * condition is equality on `user_id` plus a two-sided range on the
  * watermarked timestamp columns — exactly what Spark's
  * StreamingSymmetricHashJoinExec needs to bound BOTH state stores:
  * a buffered click is dropped once the watermark passes
  * `click_time + horizon` (no future purchase can reach back to it),
  * a buffered purchase once the watermark passes its own time (no
  * future click can precede it). State per key is therefore
  * horizon-bounded however long the stream runs — the property that
  * lets this run forever at ingest scale, with both sides
  * hash-partitioned on `user_id` into the same exchange (RocksDB
  * state store at production scale, q92 economics).
  *
  * Batch parity: inner stream-stream joins emit a pair in the first
  * micro-batch where both sides are present — never waiting on the
  * watermark — so over a finite replay in ascending event-time waves
  * the emitted set equals the batch range join EXACTLY: a click
  * evicted at watermark `W` has `click_time + horizon < W − delay`,
  * and every later wave's purchases have `purchase_time > W` —
  * outside the horizon anyway (the spec pins this, including pairs
  * whose sides span waves; the q187 gate grades the full fixture
  * against the DuckDB range join).
  *
  * Times compare at ms precision on BOTH engines
  * ([[graft.operators.EventsQueries.withTsMs]] / `epoch_ns(ts) //
  * 1000000` — the established events discipline), so the horizon
  * boundary is bit-identical.
  *
  * LATE DATA is the one divergence from batch, and it is QUANTIFIED
  * (StreamingIntervalJoinSpec, the two "QUANTIFIED late-data
  * divergence" tests): a row whose event time trails the join's
  * global watermark (min across both inputs, each = max seen −
  * `watermarkDelay`) is dropped at ingestion, and the divergence is
  * EXACTLY that row's own pairs — inner loses the pair, left-outer
  * degrades it to the click's null row — while rows late by LESS
  * than the delay pair identically to batch. So the delay knob is a
  * precise contract: divergence ⊆ pairs touching rows later than
  * `watermarkDelay`, nothing else ever differs.
  */
object StreamingIntervalJoin {

  /** Attribution horizon: a purchase credits clicks up to this many
    * hours before it (inclusive on both ends at ms precision). */
  val HorizonHours = 24

  val HorizonMs: Long = HorizonHours * 3600000L

  /** (click_id, purchase_id, user_id, gap_ms, value) pairs over a
    * frame shaped like [[graft.operators.EventsQueries.events]]
    * (needs `event_time` ms-precision timestamp + `ts_ms` long).
    * Works unchanged on a batch frame (`withWatermark` is a no-op
    * there) — the batch run IS the oracle the streaming run is
    * graded against. */
  def clickPurchasePairs(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    joined(events, watermarkDelay, "inner")

  /** LEFT OUTER variant (q196): every click row appears — matched
    * pairs emit as both sides arrive (the q187 path), and a click
    * with NO purchase in its horizon emits one null-padded row when
    * the watermark passes `click_time + horizon + delay` (state
    * expiry IS the emission trigger — the mechanism the inner join
    * never exercises). Batch parity therefore needs the watermark
    * driven past every real click's expiry: the q196 harness appends
    * a sentinel flush wave (one far-future click + purchase for a
    * user that can never pair — purchase BEFORE click) whose own
    * rows stay unexpired and unemitted, so the streamed set equals
    * the batch LEFT range join over the real events exactly. */
  def clickPurchasePairsOuter(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    joined(events, watermarkDelay, "leftOuter")

  private def joined(events: DataFrame, watermarkDelay: String,
      joinType: String): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("event_time").as("click_time"), col("ts_ms").as("click_ms"))
      .withWatermark("click_time", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("purchase_user"),
        col("event_time").as("purchase_time"),
        col("ts_ms").as("purchase_ms"), col("value"))
      .withWatermark("purchase_time", watermarkDelay)
    clicks.join(purchases,
      col("user_id") === col("purchase_user") &&
        col("purchase_time") >= col("click_time") &&
        col("purchase_time") <=
          col("click_time") + expr(s"INTERVAL $HorizonHours HOURS"),
      joinType)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (col("purchase_ms") - col("click_ms")).as("gap_ms"), col("value"))
  }
}
