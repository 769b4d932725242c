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
