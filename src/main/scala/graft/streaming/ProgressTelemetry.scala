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
  /** Admission-lag SLO numbers from sources that report them (the
    * wire connector's Kinesis-shaped `iteratorAgeMs`/`pendingFiles`,
    * see WireTaxiMicroBatchStream.metrics): worst age seen and the
    * latest pending count — the pair a lag alarm monitors. */
  val maxIteratorAgeMs = new AtomicLong(0)
  val lastPendingFiles = new AtomicLong(0)

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
    p.sources.foreach { s =>
      val m = s.metrics
      if (m != null) {
        Option(m.get("iteratorAgeMs")).flatMap(_.toLongOption)
          .foreach(a => maxIteratorAgeMs.getAndUpdate(x => math.max(x, a)))
        Option(m.get("pendingFiles")).flatMap(_.toLongOption)
          .foreach(lastPendingFiles.set)
      }
    }
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def summary: String =
    s"rows=${totalRows.get} batches=${batches.get} " +
      s"maxBatchMs=${maxBatchMs.get} watermark=${lastWatermark.get} " +
      s"maxIteratorAgeMs=${maxIteratorAgeMs.get} " +
      s"pendingFiles=${lastPendingFiles.get}"
}
