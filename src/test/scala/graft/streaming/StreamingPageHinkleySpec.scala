package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online/batch parity of the streaming Page–Hinkley monitor:
  * closed-hour rows must equal the batch q259 operator's bit for
  * bit, including hours spanning micro-batch boundaries. */
class StreamingPageHinkleySpec extends AnyFunSuite
    with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def runWaves(waves: Seq[Seq[(Long, String)]],
      stats: Map[String, (Double, Double)], name: String)
      : Array[(String, Long, Long, Double, Boolean)] = {
    val ms = MemoryStream[(Long, String)]
    val q = StreamingPageHinkley.monitor(
        ms.toDF().toDF("ts_ms", "event_type"), stats)
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"ph-cp-$name").toString)
      .format("memory").queryName(name).start()
    waves.foreach { w => ms.addData(w: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
  }

  test("an hour spanning the batch boundary closes once with the " +
      "combined count; PH self-references the running mean") {
    val hr = 3600000L
    val sigma = 1.0
    val stats = Map("X" -> ((0.0, sigma)))
    // hour 0: 3 events split across batches; hour 1: 5; hour 2 opens
    val out = runWaves(Seq(
      Seq((1L, "X"), (2L, "X")),
      Seq((3L, "X"), (hr + 1, "X"), (hr + 2, "X"), (hr + 3, "X"),
        (hr + 4, "X"), (hr + 5, "X"), (2 * hr + 1, "X"))),
      stats, "ph_span")
    import graft.operators.EventsQueries.PhDelta
    val d0 = 3.0 - 3.0 / 1 - PhDelta * sigma
    val m0 = d0
    val ph0 = m0 - math.min(Double.PositiveInfinity.min(m0), m0)
    val d1 = 5.0 - 8.0 / 2 - PhDelta * sigma
    val m1 = m0 + d1
    val ph1 = m1 - math.min(m0, m1)
    assert(out.toSeq == Seq(("X", 0L, 3L, ph0, false),
      ("X", 1L, 5L, ph1, false)))
  }

  test("streamed closed hours equal the batch q259 rows minus each " +
      "type's final hour, bit for bit") {
    val events = graft.operators.EventsQueries
      .events(spark, "/root/testdata/sf0.001")
    val stats = graft.operators.EventsQueries.cusumStats(events)
    val rows = events.select(col("ts_ms"), col("event_type"))
      .as[(Long, String)].collect().sortBy(_._1)
    val third = math.max(1, rows.length / 3)
    val streamed = runWaves(rows.grouped(third).map(_.toSeq).toSeq,
      stats, "ph_fixture").sorted
    val batch = graft.operators.EventsQueries.pageHinkley(events)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    val lastHour = batch.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(_._2).max }
    val closed = batch.filter(r => r._2 < lastHour(r._1)).sorted
    assert(streamed.toSeq == closed.toSeq,
      "closed-hour parity must be exact (same fold order)")
  }
}
