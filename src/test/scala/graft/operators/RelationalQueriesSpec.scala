package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalQueriesSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  /** (event_id, event_type, ts_ms) rows with hand-placed times. */
  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("event_id", "event_type", "ts_ms")

  test("rangeJoinNearby counts refs in [t-w, t) across bucket edges") {
    val w = 300000L
    val events = ev(
      (1L, "purchase", 1000000L),
      // in-window clicks for purchase 1: one in the same bucket, one
      // in the previous bucket (1000000-w = 700000)
      (2L, "click", 999999L),
      (3L, "click", 700000L), // exactly t-w: INCLUDED (>=)
      (4L, "click", 1000000L), // exactly t: EXCLUDED (<)
      (5L, "click", 699999L), // just before t-w: excluded
      (6L, "purchase", 5000000L), // no clicks near
      (7L, "view", 999998L)) // wrong type
    val out = RelationalQueries.rangeJoinNearby(events, windowMs = w)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 6L -> 0L))
  }

  test("rangeJoinNearby plans a hash join on the bucket, not a cartesian") {
    val events = ev((1L, "purchase", 1000000L), (2L, "click", 999999L))
    val plan = RelationalQueries.rangeJoinNearby(events)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("propsStats extracts $.k and aggregates per type") {
    val events = Seq(
      ("click", """{"k": 5}"""),
      ("click", """{"k": 7}"""),
      ("click", """{"k": 5}"""),
      ("view", """{"nope": 1}"""))
      .toDF("event_type", "props")
    val out = RelationalQueries.propsStats(events).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), r.getLong(5)))
      .toMap
    assert(out("click") == ((3L, Some(17L), Some(5L), Some(7L), 2L)))
    assert(out("view") == ((0L, None, None, None, 0L)))
  }
}
