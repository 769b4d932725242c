package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Engine-side progress telemetry (the reference's R9 statistics,
  * StreamPopulator.java:200-210, on the consumer side): a
  * StreamingQueryListener accumulating rows processed, last input
  * rate, max micro-batch duration and last watermark — the numbers
  * behind the consumer-lag SLO (BASELINE.md B3).
  * Attach with `spark.streams.addListener(new ProgressTelemetry)`. */
class ProgressTelemetry extends StreamingQueryListener {
  val totalRows = new AtomicLong(0)
  val batches = new AtomicLong(0)
  val maxBatchMs = new AtomicLong(0)
  val lastWatermark = new AtomicReference[String]("")

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    totalRows.addAndGet(p.numInputRows)
    batches.incrementAndGet()
    val d = p.durationMs.getOrDefault("triggerExecution", 0L)
    maxBatchMs.getAndUpdate(m => math.max(m, d))
    Option(p.eventTime.get("watermark")).foreach(lastWatermark.set)
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def summary: String =
    s"rows=${totalRows.get} batches=${batches.get} " +
      s"maxBatchMs=${maxBatchMs.get} watermark=${lastWatermark.get}"
}
