package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke tests: the flagship entry must work on a
  * session that did NOT pre-set the nanos legacy flag (the driver
  * builds its own session), and every oracle key must have a query. */
class SparkEntrySpec extends AnyFunSuite with SparkSessionSpec {

  test("entry() runs on a fresh session without pre-set legacy configs") {
    val fresh = spark.newSession()
    fresh.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val rows = SparkEntry.entry(fresh).count()
    assert(rows > 0)
  }

  test("every oracleSql key has a matching query and vice-versa keys are covered") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o.diff(q)}")
    // rows-only entries must be the documented, deliberate set — an
    // operator silently losing its oracle is a correctness-gate hole
    assert(q.diff(o) == SparkEntry.rowsOnlyQueries,
      s"undocumented rows-only queries: ${q.diff(o).diff(SparkEntry.rowsOnlyQueries)}")
  }

  test("all graded queries return rows on the smoke fixture") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$name returned 0 rows at sf0.001")
      // a harness that leaks a running stream poisons every later
      // query sharing the session (r17 driver run died mid-loop with
      // "SparkContext has been shutdown"); catch the leak AT the
      // offending query, not three suites later
      assert(spark.streams.active.isEmpty,
        s"$name leaked ${spark.streams.active.length} active stream(s)")
    }
  }
}
