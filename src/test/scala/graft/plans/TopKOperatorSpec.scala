package graft.plans

import graft.SparkSessionSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TopK, TopKPerGroupExec}
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k-per-group physical operator vs the window
  * formulation it replaces: identical rows, partial→exchange→final
  * plan shape, and the scale property — only ≤ k rows per
  * (partition, group) cross the exchange. */
class TopKOperatorSpec extends AnyFunSuite with SparkSessionSpec {

  private def events = {
    graft.operators.EventsQueries.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
  }

  test("operator rows == window-formulation rows (rank included)") {
    val viaOperator = TopK.perGroup(events, Seq("user_id"),
      Seq("ts_ms" -> true, "event_id" -> true), 5)
      .collect().map(_.toSeq).toSet
    val viaWindow = events
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms").asc, col("event_id").asc)).cast("long"))
      .filter(col("rank") <= 5)
      .collect().map(_.toSeq).toSet
    assert(viaOperator.nonEmpty)
    assert(viaOperator == viaWindow)
  }

  test("descending order and ties broken by the tiebreak column") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 20.0),
      ("b", 5L, 1.0)).toDF("g", "id", "v")
    val out = TopK.perGroup(df, Seq("g"),
      Seq("v" -> false, "id" -> true), 2)
      .select("g", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("a", 2L, 1L), ("a", 3L, 2L), ("b", 5L, 1L)))
  }

  test("randomized equivalence with the window plan (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    // duplicate order-values force tiebreak paths; k > some group
    // sizes forces the under-full heap path
    val rows = Seq.fill(3000)((rnd.nextInt(40).toLong,
      rnd.nextInt(25).toDouble, rnd.nextLong())).distinct
    val df = rows.toDF("g", "v", "id").repartition(7)
    val viaOperator = TopK.perGroup(df, Seq("g"),
      Seq("v" -> true, "id" -> false), 4)
      .collect().map(_.toSeq).toSet
    val viaWindow = df.withColumn("rank", row_number().over(
        Window.partitionBy(col("g"))
          .orderBy(col("v").asc, col("id").desc)).cast("long"))
      .filter(col("rank") <= 4)
      .collect().map(_.toSeq).toSet
    assert(viaOperator == viaWindow)
  }

  test("plans partial heap -> exchange -> final heap, like aggregation") {
    val df = TopK.perGroup(events, Seq("user_id"), Seq("ts_ms" -> true,
      "event_id" -> true), 5)
    // sparkPlan: pre-AQE, both custom nodes reachable by collect;
    // the exchange (inserted by EnsureRequirements) is asserted on
    // the executed-plan string per the AQE-wrapping convention
    val execs = df.queryExecution.sparkPlan.collect {
      case t: TopKPerGroupExec => t
    }
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"expected partial+final TopKPerGroupExec, got $execs")
    assert(df.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"),
      "no hash exchange between partial and final")
  }

  test("only <= k rows per (partition, group) cross the exchange") {
    // AQE off so the concrete ShuffleExchangeExec (and its metrics)
    // is reachable in the executed plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // one hot group spread over many input partitions: the partial
      // heaps must cut the exchange input from 10_000 rows to
      // <= k * partitions * groups
      val n = 10000
      val parts = 8
      val df = spark.range(n).repartition(parts)
        .select(lit("hot").as("g"), col("id"),
          (col("id") % 997).as("v"))
      val out = TopK.perGroup(df, Seq("g"), Seq("v" -> true, "id" -> true), 3)
      val rows = out.collect()
      assert(rows.length == 3)
      // shuffle-write side: the exchange between partial and final
      // carried only the partial survivors
      val exchanged = out.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.child.isInstanceOf[TopKPerGroupExec] =>
          e.metrics("shuffleRecordsWritten").value
      }
      assert(exchanged.nonEmpty, "no exchange above the partial heap")
      assert(exchanged.head <= 3L * parts,
        s"exchange carried ${exchanged.head} rows; partial top-k not applied")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
