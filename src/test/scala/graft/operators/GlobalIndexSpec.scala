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

  test("globalPrefixSum: multi-partition inclusive prefix equals " +
      "the sequential scan exactly") {
    import spark.implicits._
    // deterministic pseudo-random values, ids deliberately out of
    // order on input
    val rows = (1L to 1000L).map(i => (i, (i * 2654435761L) % 97))
    val df = new scala.util.Random(42).shuffle(rows).toDF("id", "v")
    val (out, handle) = GlobalIndex.globalPrefixSumWithHandle(
      df, Seq(col("id").asc), "v", 8)
    val got = out.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("prefix_sum")).toMap
    handle.release()
    var acc = 0L
    rows.foreach { case (id, v) =>
      acc += v
      assert(got(id) == acc, s"id $id")
    }
  }

  test("budgetPack: equals the sequential greedy replay; budget " +
      "respected and binding") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val kept = GlobalIndex.budgetPack(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("cum_tokens")).toMap
    // sequential replay of the greedy from the same scored frame
    val scored2 = docs.select(col("doc_id"),
        expr("CAST(CEIL(length(text) / 4.0) AS LONG)").as("t"),
        graft.operators.TextAnalysis.qualityScoreCol(col("text"))
          .as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2) / r.getLong(1)))
      .sortBy { case (id, _, d) => (-d, id) }
    var acc = 0L
    val expect = scala.collection.mutable.Map.empty[Long, Long]
    scored2.foreach { case (id, t, _) =>
      acc += t
      if (acc <= GlobalIndex.PackBudgetTokens) expect(id) = acc
    }
    assert(kept == expect.toMap)
    assert(kept.values.max <= GlobalIndex.PackBudgetTokens)
    assert(acc > GlobalIndex.PackBudgetTokens,
      "fixture corpus must exceed the budget (the cut is binding)")
  }
}
