package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GlobalIndexSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("global index equals the single-reducer window formulation") {
    val got = GlobalIndex.docGlobalIndex(docs)
      .select("doc_id", "global_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = docs
      .withColumn("global_idx",
        row_number().over(
          Window.orderBy(col("n_chars"), col("doc_id"))).cast("long") - 1)
      .select("doc_id", "global_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp && got.nonEmpty)
    spark.catalog.clearCache()
  }

  test("indices are dense, start at zero, and spread over partitions") {
    val df = GlobalIndex.globalRowIndex(
      (1 to 1000).map(i => (i.toLong, (i * 37) % 101)).toDF("id", "key"),
      Seq(col("key"), col("id")), partitions = 6)
    val idx = df.select("global_idx").as[Long].collect().sorted
    assert(idx.toSeq == (0L until 1000L))
    // the work is genuinely distributed: >1 non-empty partition
    val perPart = df.groupBy(spark_partition_id()).count().collect()
    assert(perPart.count(_.getLong(1) > 0) > 1)
    spark.catalog.clearCache()
  }

  test("indices survive a coalesce(1) sink (fused-task regression)") {
    // a single-partition sink fuses the index assignment into ONE
    // task — partition ids must come from the data, not TaskContext
    // (this exact shape silently mis-indexed before the fix)
    val got = GlobalIndex.docGlobalIndex(docs).coalesce(1)
      .select("doc_id", "global_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = docs
      .withColumn("global_idx",
        row_number().over(
          Window.orderBy(col("n_chars"), col("doc_id"))).cast("long") - 1)
      .select("doc_id", "global_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
    spark.catalog.clearCache()
  }

  test("deterministic across repeated invocations") {
    def run() = GlobalIndex.docGlobalIndex(docs)
      .select("doc_id", "global_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val a = run(); spark.catalog.clearCache()
    val b = run(); spark.catalog.clearCache()
    assert(a == b)
  }
}
