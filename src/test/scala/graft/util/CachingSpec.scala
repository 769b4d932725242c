package graft.util

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifecycle contract: operators either release their own
  * persisted intermediates (heavyHitters) or hand the caller a
  * [[CacheHandle]] that releases exactly their frames — a library
  * caller composing operators in one session must not need
  * `spark.catalog.clearCache()` (which would evict unrelated caches)
  * to stay leak-free. */
class CachingSpec extends AnyFunSuite with SparkSessionSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def persistedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("heavyHitters releases its token cache itself") {
    val before = persistedCount
    val out = graft.operators.TextAnalysis.heavyHitters(docs)
    assert(out.count() > 0)
    // unpersist(blocking=false) is async at the block level but the
    // persistentRdds registry entry is removed synchronously
    assert(persistedCount == before,
      "heavyHitters left a persisted RDD behind")
  }

  test("duplicatedSpansWithHandle releases only its own frame") {
    val unrelated = docs.select("doc_id").persist()
    assert(unrelated.count() > 0)
    val before = persistedCount
    val (out, handle) = graft.operators.Dedup.duplicatedSpansWithHandle(docs)
    assert(out.count() > 0)
    assert(persistedCount == before + 1, "expected one tracked persist")
    handle.release()
    assert(persistedCount == before, "handle did not release the persist")
    // the blunt alternative this replaces would have evicted this too
    assert(unrelated.storageLevel.useMemory,
      "release() touched an unrelated cache")
    unrelated.unpersist()
  }

  test("globalRowIndexWithHandle result is consistent after release") {
    val (out, handle) = graft.operators.GlobalIndex.globalRowIndexWithHandle(
      docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars")),
      Seq(org.apache.spark.sql.functions.col("n_chars"),
        org.apache.spark.sql.functions.col("doc_id")),
      graft.operators.GlobalIndex.Q57Partitions)
    val idx = out.collect().map(_.getAs[Long]("global_idx")).sorted
    handle.release()
    assert(idx.toSeq == (0L until idx.length).toSeq,
      "global index is not a dense 0..n-1 sequence")
  }
}
