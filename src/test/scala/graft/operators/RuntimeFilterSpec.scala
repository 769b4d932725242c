package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RuntimeFilterSpec extends AnyFunSuite with SparkSessionSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")
  private lazy val urgent = orders
    .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")

  test("pre-filter keeps every matching row and drops most others") {
    val bloom = RuntimeFilter.bloomOf(urgent, "o_orderkey", 1 << 12, 0.03)
    val passed = RuntimeFilter.bloomPreFilter(lineitem, "l_orderkey", bloom)

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("l_orderkey"), r.getAs[Number]("l_linenumber").longValue)
    val exact = lineitem
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .collect().map(key).toSet
    val afterBloom = passed.collect().map(key).toSet

    assert(exact.subsetOf(afterBloom)) // zero false negatives
    val total = lineitem.count()
    assert(afterBloom.size < total) // the filter actually cuts rows
    // false-positive rate stays within ~3x of the configured 3%
    val fps = afterBloom.size - exact.size
    assert(fps.toDouble / total < 0.09,
      s"fp rate ${fps.toDouble / total} too high")
  }

  test("bloom join result is row-identical to the plain join") {
    val got = RuntimeFilter.bloomJoin(lineitem, orders)
      .orderBy("l_returnflag").collect()
    val exp = lineitem
      .join(orders.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag").collect()
    assert(got.length == exp.length && got.nonEmpty)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0))
      assert(g.getLong(1) == e.getLong(1))
      assert(math.abs(g.getDouble(2) - e.getDouble(2)) < 1e-6)
      assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-4)
    }
  }

  test("probe is codegen'd and sits below the join") {
    val df = RuntimeFilter.bloomJoin(lineitem, orders)
    // execute THIS df's QueryExecution (a writer would plan its own)
    // so AQE finalizes and codegen collapse runs
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    // the probe must run inside a WholeStageCodegen span (the `*(n)`
    // star marker on its Filter line) — no UDF, no interpreted
    // fallback
    val probeLine = planStr.linesIterator
      .find(_.contains("bloom_might_contain"))
    assert(probeLine.exists(_.matches(""".*\*\(\d+\) Filter .*""")),
      s"probe not in a codegen span:\n$planStr")
    // and it must sit below the join (tree prints parents first)
    val probeIdx = planStr.indexOf("bloom_might_contain")
    val joinIdx = planStr.indexOf("Join")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "probe should be below (printed after) the join operator")
  }
}
