package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming session windows: the same `session_window` operator the
  * batch surface grades (q15) running incrementally under a
  * watermark — sessions are emitted (append mode) only once the
  * watermark passes their close, so results are final and
  * restart-safe. Parity target: the batch session reconstruction
  * over the same rows. */
class StreamingSessionSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("streaming session windows finalize like the batch operator") {
    val h = 3600000L
    val t0 = 1704067200000L // 2024-01-01T00:00Z
    // user 1: two events 30 min apart (one session), then one 3.5 h
    // later (second session). user 2: one event.
    val live = Seq(
      (1L, t0), (1L, t0 + h / 2), (1L, t0 + 4 * h), (2L, t0))

    val ms = MemoryStream[(Long, Long)]
    val sessions = ms.toDF().toDF("user_id", "ts_ms")
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(col("user_id"), session_window(col("event_time"), "2 hours"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"),
        col("n_events"))

    val q = sessions.writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("sess-cp").toString)
      .outputMode("append")
      .format("memory").queryName("stream_sessions").start()
    try {
      ms.addData(live: _*)
      q.processAllAvailable()
      // flush: a far-future event advances the watermark past every
      // live session's close (its own session stays pending — append
      // mode only emits finalized sessions)
      ms.addData((99L, t0 + 48 * h))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("stream_sessions")
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (1L, t0, t0 + h / 2 + 2 * h, 2L),   // end = last event + gap
      (1L, t0 + 4 * h, t0 + 6 * h, 1L),
      (2L, t0, t0 + 2 * h, 1L))
    assert(streamed == expected)

    // batch parity: the same rows through the batch session_window
    val batch = live.toDF("user_id", "ts_ms")
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .groupBy(col("user_id"), session_window(col("event_time"), "2 hours"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch == expected)
  }
}
