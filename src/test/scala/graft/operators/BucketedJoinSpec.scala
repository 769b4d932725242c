package graft.operators

import java.nio.file.Files

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale pattern: bucketing co-locates both join sides so the join
  * compiles to zero Exchange operators — the pre-partitioned join
  * strategy for repeated large-fact joins at 100 TB (SURVEY.md §4 /
  * the "Partitioning & shuffle" design rule). */
class BucketedJoinSpec extends AnyFunSuite with SparkSessionSpec {

  test("bucketed tables join without a shuffle (no Exchange in plan)") {
    // warehouse.dir is static per session; explicit per-table paths
    // in a temp dir keep the test hermetic instead
    val wh = Files.createTempDirectory("wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").saveAsTable("customer_b")

      val joined = spark.table("orders_b").join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join still shuffles:\n$physical")

      // co-located join result equals the plain shuffled join
      val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() == plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
