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

  test("QUANTIFIED late-data divergence (q187): rows later than the " +
      "watermark delay lose exactly their own pairs; rows late but " +
      "within the delay diverge not at all") {
    StreamingTaxi.configureStateStore(spark)
    val Min = 60000L
    val delayMs = 10 * Min // the operator default "10 minutes"
    // wave 1 establishes the watermark frontier: sentinel user 9's
    // purchase(9 h)/click(10 h) push the two input watermarks to
    // 8 h 50 m / 9 h 50 m; the join's global watermark is their MIN,
    // 8 h 50 m (multipleWatermarkPolicy=min, the default)
    val wave1: Seq[(Long, Long, String, Long, Double)] = Seq(
      (1L, 1L, "click", 1 * Hr, 0.0),
      (2L, 1L, "purchase", 2 * Hr, 10.0), // in-order pair, gap 1 h
      (3L, 2L, "click", 1 * Hr, 0.0), // its purchase comes LATE
      (4L, 9L, "purchase", 9 * Hr, 0.0), // sentinel: precedes its
      (5L, 9L, "click", 10 * Hr, 0.0)) //  click, can never pair
    val frontierMs = 9 * Hr - delayMs // 8 h 50 m
    // wave 2 arrives after the frontier is set:
    //  - purchase 6 trails the frontier by 7 h 20 m  (≫ delay): DROPPED
    //  - click 9 / purchase 10 trail the last-seen event times by
    //    minutes but sit ABOVE the frontier (lateness < delay): KEPT
    //  - click 7 / purchase 8 are fresh: KEPT
    val wave2: Seq[(Long, Long, String, Long, Double)] = Seq(
      (6L, 2L, "purchase", 90 * Min, 5.0),
      (7L, 3L, "click", 9 * Hr, 0.0),
      (8L, 3L, "purchase", 9 * Hr + 5 * Min, 7.0),
      (9L, 4L, "click", frontierMs + 2 * Min, 0.0),
      (10L, 4L, "purchase", frontierMs + 5 * Min, 3.0))
    assert(frontierMs - 90 * Min > delayMs,
      "fixture must make purchase 6 later than the delay bound")

    val ms = MemoryStream[(Long, Long, String, Long, Double)]
    val out = StreamingIntervalJoin.clickPurchasePairs(frame(ms.toDF()))
    val query = out.writeStream
      .format("memory").queryName("ssj_late")
      .option("checkpointLocation",
        Files.createTempDirectory("ssjl-cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    ms.addData(wave1: _*)
    query.processAllAvailable()
    ms.addData(wave2: _*)
    query.processAllAvailable()
    query.stop()
    val streamed = pairs(spark.table("ssj_late"))
    val batch = pairs(StreamingIntervalJoin.clickPurchasePairs(
      frame((wave1 ++ wave2).toDF())))

    // the EXACT divergence: only purchase 6's pair is missing
    val divergent = batch.diff(streamed)
    assert(divergent == Set((3L, 6L, 2L, 30 * Min, 5.0)),
      s"divergence must be exactly the beyond-delay row's pair: " +
        s"$divergent")
    assert(streamed.subsetOf(batch), "stream must never invent pairs")
    // and it is BOUNDED by the watermark delay: every divergent pair
    // involves a row trailing the frontier (lateness > delay); the
    // within-delay stragglers (9, 10) paired exactly as batch did
    assert(divergent.forall { case (_, pid, _, _, _) =>
      val ev = wave2.find(_._1 == pid).get._4
      frontierMs - ev > 0 // behind the global watermark
    })
    assert(streamed.contains((9L, 10L, 4L, 3 * Min, 3.0)),
      "within-delay late rows must not diverge")
    assert(streamed.contains((7L, 8L, 3L, 5 * Min, 7.0)))
    assert(streamed.contains((1L, 2L, 1L, Hr, 10.0)))
  }

  test("QUANTIFIED late-data divergence (q196, LEFT OUTER): the " +
      "beyond-delay purchase's pair degrades to the click's null " +
      "row — divergence is the pair/null swap, nothing else") {
    StreamingTaxi.configureStateStore(spark)
    val Min = 60000L
    val delayMs = 10 * Min
    val frontierMs = 9 * Hr - delayMs
    val wave1: Seq[(Long, Long, String, Long, Double)] = Seq(
      (1L, 1L, "click", 1 * Hr, 0.0),
      (2L, 1L, "purchase", 2 * Hr, 10.0),
      (3L, 2L, "click", 1 * Hr, 0.0),
      (4L, 9L, "purchase", 9 * Hr, 0.0),
      (5L, 9L, "click", 10 * Hr, 0.0))
    val wave2: Seq[(Long, Long, String, Long, Double)] = Seq(
      (6L, 2L, "purchase", 90 * Min, 5.0), // beyond-delay: dropped
      (7L, 3L, "click", 9 * Hr, 0.0),
      (8L, 3L, "purchase", 9 * Hr + 5 * Min, 7.0))
    val ms = MemoryStream[(Long, Long, String, Long, Double)]
    val out = StreamingIntervalJoin.clickPurchasePairsOuter(
      frame(ms.toDF()))
    val query = out.writeStream
      .format("memory").queryName("ssj_late_outer")
      .option("checkpointLocation",
        Files.createTempDirectory("ssjlo-cp").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    ms.addData(wave1: _*)
    query.processAllAvailable()
    ms.addData(wave2: _*)
    query.processAllAvailable()
    // flush: drive the watermark past every real click's horizon so
    // unmatched clicks surface their null rows (sentinel never pairs)
    ms.addData((90L, -1L, "purchase", 80 * Hr, 0.0),
      (91L, -1L, "click", 80 * Hr + 1, 0.0))
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("ssj_late_outer").collect()
      .map(r => (r.getAs[Long]("click_id"),
        Option(r.getAs[Any]("purchase_id")))).toSet
    val batch = StreamingIntervalJoin.clickPurchasePairsOuter(
        frame((wave1 ++ wave2).toDF())).collect()
      .map(r => (r.getAs[Long]("click_id"),
        Option(r.getAs[Any]("purchase_id")))).toSet
    // batch: click 3 pairs with the late purchase; stream: that pair
    // degrades to the null row. EVERYTHING else is identical.
    assert(batch.contains((3L, Some(6L))), s"batch $batch")
    assert(streamed.contains((3L, None)), s"stream $streamed")
    assert(batch - ((3L, Some(6L))) == streamed - ((3L, None)),
      s"divergence beyond the pair/null swap: batch=$batch " +
        s"stream=$streamed")
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
