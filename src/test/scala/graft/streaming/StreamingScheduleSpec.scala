package graft.streaming

import java.nio.file.Files
import graft.SparkSessionSpec
import graft.operators.Sampling
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Incremental epoch-schedule maintenance (q184): the plan recomputed
  * from maintained aggregates must equal the batch q180 plan over the
  * prefix corpus AFTER EVERY WAVE — per-wave parity, not just final
  * convergence. */
class StreamingScheduleSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def planMap(rows: Array[Row]): Map[String, Seq[Any]] =
    rows.map(r => r.getString(0) -> r.toSeq.drop(1)).toMap

  test("per-wave plan == batch plan over the prefix corpus; final " +
      "plan == batch q180 plan; counts maintained incrementally") {
    // sources with very different token masses so the cap and the
    // waterfill both engage; wave 2 shifts the mixture (a new source
    // appears and an old one grows)
    val wave1 = Seq(
      (1L, "web", "a b c d e f g h i j k l m n o p q r"),
      (2L, "web", "i j k l"),
      (3L, "books", "m n"),
      (4L, "code", "p q r s t u"))
    val wave2 = Seq(
      (5L, "web", "v w"),
      (6L, "wiki", "x y z a b"),
      (7L, "books", "c d e f"),
      (8L, "tiny", "z")) // α-tempered up far past cap·T_s/budget
    def df(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "source", "text")

    val ms = MemoryStream[(Long, String, String)]
    val m = new StreamingSchedule.EpochPlanMaintainer(spark)
    val q = Sampling.sourceTokenCounts(
        ms.toDF().toDF("doc_id", "source", "text"))
      .writeStream.outputMode("update")
      .foreachBatch(m.update _)
      .option("checkpointLocation",
        Files.createTempDirectory("epoch-cp").toString)
      .start()
    ms.addData(wave1: _*)
    q.processAllAvailable()
    ms.addData(wave2: _*)
    q.processAllAvailable()
    q.stop()

    assert(m.wavePlans.size == 2, "one recomputed plan per wave")
    val afterW1 = planMap(Sampling.epochSchedule(df(wave1)).collect())
    val afterW2 = planMap(
      Sampling.epochSchedule(df(wave1 ++ wave2)).collect())
    assert(planMap(m.wavePlans(0).toArray) == afterW1,
      "wave-1 plan differs from the batch plan over wave 1")
    assert(planMap(m.wavePlans(1).toArray) == afterW2,
      "wave-2 plan differs from the batch plan over waves 1+2")
    assert(planMap(m.currentPlan().collect()) == afterW2)
    // the recompute engaged the interesting regimes: at least one
    // capped source and a real waterfill lift somewhere
    val rows = m.wavePlans(1)
    assert(rows.exists(r =>
      r.getDouble(5) == Sampling.EpochCap), "no source hit the cap")
    assert(rows.exists(r => r.getDouble(5) > r.getDouble(4)),
      "waterfill lifted no uncapped source")
  }
}
