package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC-emission parity of the streaming SCD2 maintainer: close
  * records must match the batch dimension's closed rows exactly,
  * including runs that SPAN micro-batch boundaries (the state
  * hand-off case), and the open rows must stay in state. */
class StreamingScd2Spec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def runWaves(
      waves: Seq[Seq[(Long, Long, Long, String)]],
      name: String): Array[(Long, Long, Long, Long, Long)] = {
    val ms = MemoryStream[(Long, Long, Long, String)]
    val q = StreamingScd2.dimension(
        ms.toDF().toDF("user_id", "ts_ms", "event_id", "props"))
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"scd2-cp-$name").toString)
      .format("memory").queryName(name).start()
    waves.foreach { w => ms.addData(w: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
  }

  test("a run spanning the batch boundary closes ONCE with the " +
      "combined count; the open run stays in state") {
    // user 7: tier 0 events in batch 1 AND batch 2, then a tier 1
    // event -> exactly one close row with n_events = 3
    val out = runWaves(Seq(
      Seq((7L, 1000L, 1L, """{"k": 0}"""),
        (7L, 2000L, 2L, """{"k": 4}""")),
      Seq((7L, 3000L, 3L, """{"k": 0}"""),
        (7L, 4000L, 4L, """{"k": 1}"""))), "scd2_span")
    assert(out.toSeq == Seq((7L, 0L, 1000L, 4000L, 3L)))
  }

  test("within-batch out-of-order events are folded in (ts, id) " +
      "order") {
    val out = runWaves(Seq(
      Seq((1L, 3000L, 3L, """{"k": 1}"""),
        (1L, 1000L, 1L, """{"k": 0}"""),
        (1L, 2000L, 2L, """{"k": 0}"""))), "scd2_order")
    assert(out.toSeq == Seq((1L, 0L, 1000L, 3000L, 2L)))
  }

  test("serveFetch: each event sees the PRE-event state — the " +
      "previous event's tier, -1 for the first, across batches") {
    val ms = MemoryStream[(Long, Long, Long, String)]
    val q = StreamingScd2.serveFetch(
        ms.toDF().toDF("user_id", "ts_ms", "event_id", "props"))
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("scd2-serve-cp").toString)
      .format("memory").queryName("serve_hand").start()
    ms.addData((5L, 1000L, 1L, """{"k": 0}"""),
      (5L, 2000L, 2L, """{"k": 1}"""))
    q.processAllAvailable()
    ms.addData((5L, 3000L, 3L, """{"k": 1}"""))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("serve_hand").collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out == Map(1L -> -1L, 2L -> 0L, 3L -> 1L))
  }

  test("serveFetch fixture closure: prev_tier equals lag(direct " +
      "tier) for every event, whatever the wave boundaries") {
    val ev = graft.operators.EventsQueries
      .events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        col("props"))
    val rows = ev.as[(Long, Long, Long, String)].collect()
      .sortBy(e => (e._2, e._3))
    val third = math.max(1, rows.length / 3)
    val ms = MemoryStream[(Long, Long, Long, String)]
    val q = StreamingScd2.serveFetch(
        ms.toDF().toDF("user_id", "ts_ms", "event_id", "props"))
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("scd2-serve-fx").toString)
      .format("memory").queryName("serve_fx").start()
    rows.grouped(third).foreach { w =>
      ms.addData(w.toSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("serve_fx").collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    import org.apache.spark.sql.expressions.Window
    val expect = ev
      .withColumn("tier",
        get_json_object(col("props"), "$.k").cast("long") % 4)
      .withColumn("prev", coalesce(lag(col("tier"), 1).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms"), col("event_id"))), lit(-1L)))
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("prev")).toMap
    assert(got == expect)
  }

  test("streamed closes equal the batch dimension's closed rows on " +
      "the fixture, whatever the wave boundaries") {
    val ev = graft.operators.EventsQueries
      .events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        col("props"))
    val rows = ev.as[(Long, Long, Long, String)].collect()
      .sortBy(e => (e._2, e._3))
    val third = math.max(1, rows.length / 3)
    val out = runWaves(rows.grouped(third).map(_.toSeq).toSeq,
      "scd2_fixture")
    val batch = graft.operators.EventsQueries.scd2Dimension(ev)
      .filter(col("valid_to_ms").isNotNull)
      .select("user_id", "tier", "valid_from_ms", "valid_to_ms",
        "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.sorted.toSeq == batch.sorted.toSeq)
  }
}
