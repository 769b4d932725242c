package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online/batch parity of the streaming CUSUM monitor under the
  * batch-trained statistics: closed-hour rows must equal the batch
  * operator's bit-for-bit, including hours that span micro-batch
  * boundaries. */
class StreamingCusumSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def runWaves(waves: Seq[Seq[(Long, String)]],
      stats: Map[String, (Double, Double)], name: String)
      : Array[(String, Long, Long, Double, Boolean)] = {
    val ms = MemoryStream[(Long, String)]
    val q = StreamingCusum.monitor(
        ms.toDF().toDF("ts_ms", "event_type"), stats)
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"cusum-cp-$name").toString)
      .format("memory").queryName(name).start()
    waves.foreach { w => ms.addData(w: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
  }

  test("an hour spanning the batch boundary closes once with the " +
      "combined count; the final hour stays open") {
    val hr = 3600000L
    // hour 0: 3 events split across two batches; hour 1: 2 events;
    // hour 2 opens and never closes
    val stats = Map("X" -> ((2.0, 1.0)))
    val out = runWaves(Seq(
      Seq((1L, "X"), (2L, "X")),
      Seq((3L, "X"), (hr + 1, "X"), (hr + 2, "X"), (2 * hr + 1, "X"))),
      stats, "cs_span")
    val drift = 2.0 + 0.5 * 1.0
    val p0 = 3 - drift // 0.5
    val c0 = p0 - math.min(math.min(Double.PositiveInfinity, p0), 0.0)
    val p1 = p0 + (2 - drift)
    val c1 = p1 - math.min(math.min(p0, p1), 0.0)
    assert(out.toSeq == Seq(("X", 0L, 3L, c0, false),
      ("X", 1L, 2L, c1, false)))
  }

  test("streamed closed hours equal the batch q150 rows minus each " +
      "type's final hour, bit for bit") {
    val events = graft.operators.EventsQueries
      .events(spark, "/root/testdata/sf0.001")
    val stats = graft.operators.EventsQueries.cusumStats(events)
    val rows = events.select(col("ts_ms"), col("event_type"))
      .as[(Long, String)].collect().sortBy(_._1)
    val third = math.max(1, rows.length / 3)
    val streamed = runWaves(rows.grouped(third).map(_.toSeq).toSeq,
      stats, "cs_fixture").sorted
    val batch = graft.operators.EventsQueries.cusumAnomalies(events)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    val lastHour = batch.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(_._2).max }
    val closed = batch.filter(r => r._2 < lastHour(r._1)).sorted
    assert(streamed.toSeq == closed.toSeq,
      "closed-hour parity must be exact (same fold order)")
  }
}
