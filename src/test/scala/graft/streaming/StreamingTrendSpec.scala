package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingTrendSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("incremental Mann-Kendall: after EVERY wave the maintained " +
      "battery equals the batch statistic over the ingested prefix, " +
      "and a verdict can flip as evidence accumulates") {
    def ev(id: Long, t: String, day: Long, v: Double) =
      (1L, day * 86400000L + 1000L, id, t, v)
    // type A rises across all 10 days; wave 1 carries only its first
    // 4 days (too few pairs to clear z >= 1.96), wave 2+3 complete it
    val all =
      (0 until 10).map(d => ev(d.toLong, "A", d.toLong, 1.0 + d)) ++
      (0 until 10).map(d => ev(100L + d, "B", d.toLong, 2.0))
    val waves = Seq(
      all.filter(r => r._3 < 4 || (r._3 >= 100 && r._3 < 104)),
      all.filter(r => (r._3 >= 4 && r._3 < 7) ||
        (r._3 >= 104 && r._3 < 107)),
      all.filter(r => (r._3 >= 7 && r._3 < 100) || r._3 >= 107))

    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val src = ms.toDF()
      .toDF("user_id", "ts_ms", "event_id", "event_type", "value")
    val m = new StreamingTrend.TrendMaintainer(spark)
    val q = graft.operators.EventsQueries.dailyCents(src)
      .writeStream.outputMode("update")
      .foreachBatch(m.update _)
      .option("checkpointLocation",
        Files.createTempDirectory("trend-cp").toString)
      .start()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("event_type"), r.getAs[Long]("n_days"),
        r.getAs[Long]("s_stat"), r.getAs[Double]("var_s"),
        r.getAs[Double]("z"), r.getAs[Double]("theil_sen"),
        r.getAs[String]("trend"))
    var ingested = Seq.empty[(Long, Long, Long, String, Double)]
    waves.foreach { w =>
      ms.addData(w: _*)
      q.processAllAvailable()
      ingested = ingested ++ w
      val batch = graft.operators.EventsQueries.mannKendallTrend(
        ingested.toDF("user_id", "ts_ms", "event_id", "event_type",
          "value")).collect().map(key).toSet
      val maintained = m.currentTrend().collect().map(key).toSet
      assert(maintained == batch,
        s"wave parity broke: $maintained vs $batch")
    }
    q.stop()
    // verdict evolution: wave 1's 4-day prefix is NOT yet significant
    // (z = 3/sqrt(8.67) ≈ 1.02), the full series is
    val w1 = m.waveTrends(0)
      .find(_.getAs[String]("event_type") == "A").get
    assert(w1.getAs[String]("trend") == "none",
      s"4 days should not clear 1.96: ${w1.getAs[Double]("z")}")
    val w3 = m.waveTrends(2)
      .find(_.getAs[String]("event_type") == "A").get
    assert(w3.getAs[String]("trend") == "increasing")
    // the constant series never drifts into a verdict
    m.waveTrends.foreach { rows =>
      rows.find(_.getAs[String]("event_type") == "B").foreach(b =>
        assert(b.getAs[String]("trend") == "none"))
    }
  }
}
