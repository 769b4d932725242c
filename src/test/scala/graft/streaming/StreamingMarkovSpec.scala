package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online/batch parity of the streaming Markov miner: the emitted
  * pair stream must include boundary-spanning transitions and,
  * aggregated, must equal the batch q139 matrix exactly. */
class StreamingMarkovSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def runWaves(waves: Seq[Seq[(Long, Long, Long, String)]],
      name: String): Array[(String, String)] = {
    val ms = MemoryStream[(Long, Long, Long, String)]
    val q = StreamingMarkov.transitions(
        ms.toDF().toDF("user_id", "ts_ms", "event_id", "event_type"))
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"markov-cp-$name").toString)
      .format("memory").queryName(name).start()
    waves.foreach { w => ms.addData(w: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getString(1)))
  }

  test("the pair spanning the batch boundary is emitted (a per-batch " +
      "window recomputation would drop it)") {
    val out = runWaves(Seq(
      Seq((1L, 1000L, 1L, "A")),
      Seq((1L, 2000L, 2L, "B"), (1L, 3000L, 3L, "A"))), "mk_span")
    assert(out.sorted.toSeq == Seq(("A", "B"), ("B", "A")))
  }

  test("streamed pairs aggregated equal the batch matrix on the " +
      "fixture, whatever the wave boundaries") {
    val ev = graft.operators.EventsQueries
      .events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        col("event_type"))
    val rows = ev.as[(Long, Long, Long, String)].collect()
      .sortBy(e => (e._2, e._3))
    val third = math.max(1, rows.length / 3)
    val name = "mk_fixture"
    val pairs = runWaves(rows.grouped(third).map(_.toSeq).toSeq, name)
    val streamed = graft.operators.EventsQueries
      .markovMatrixFromPairs(spark.table(name))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).sorted
    val batch = graft.operators.EventsQueries.markovTransitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).sorted
    assert(streamed.toSeq == batch.toSeq)
    assert(pairs.length == batch.map(_._3).sum)
  }
}
