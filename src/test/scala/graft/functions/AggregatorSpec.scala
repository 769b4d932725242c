package graft.functions

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatorSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  test("typed AvgDuration aggregator equals built-in avg per group") {
    val df = Seq(
      ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L), ("b", 11L)).toDF("k", "duration_min")
    val out = df.groupBy($"k")
      .agg(
        udaf(AvgDurationAggregator).apply($"duration_min").as("typed_avg"),
        avg($"duration_min").as("builtin_avg"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Double]("typed_avg") == r.getAs[Double]("builtin_avg"))
    }
    assert(out.length == 2)
  }

  test("aggregator is SQL-registrable and callable") {
    spark.udf.register("avg_duration", udaf(AvgDurationAggregator))
    Seq(1L, 2L, 4L).toDF("d").createOrReplaceTempView("durations_tmp")
    val r = spark.sql("SELECT avg_duration(d) FROM durations_tmp").collect()
    assert(r(0).getDouble(0) == 7.0 / 3)
  }

  test("typed Dataset path: Q2-style avg over floored minutes") {
    val trips = Seq(121L, 59L).map(s => s / 60).toDS() // 2, 0 floored min
    val typed = trips.select(AvgDurationAggregator.toColumn).collect()(0)
    assert(typed == 1.0)
  }
}
