package graft.util

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifecycle contract: operators either release their own
  * persisted intermediates (heavyHitters) or hand the caller a
  * [[CacheHandle]] that releases exactly their frames — a library
  * caller composing operators in one session must not need
  * `spark.catalog.clearCache()` (which would evict unrelated caches)
  * to stay leak-free.
  *
  * Flake postmortem (r12): these tests originally asserted EQUALITY on
  * the global `getPersistentRDDs.size`, a registry shared by every
  * concurrently-running suite in the JVM — another suite's async
  * unpersist mid-test made the count drop (observed `5 did not equal
  * 13`), failing a test about an operator that leaked nothing. Two
  * fixes: (1) assertions now diff the persisted-RDD *id set* and only
  * require that no NEW id introduced by the operator survives — other
  * suites' removals can no longer fail us, and their additions are
  * excluded by id attribution below; (2) build.sbt isolates this suite
  * in its own forked test JVM (`Test / testGrouping`), so the registry
  * is private to this suite and the id-set check is deterministic. */
class CachingSpec extends AnyFunSuite with SparkSessionSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("heavyHitters releases its token cache itself") {
    val before = persistedIds
    val out = graft.operators.TextAnalysis.heavyHitters(docs)
    assert(out.count() > 0)
    // unpersist(blocking=false) is async at the block level but the
    // persistentRdds registry entry is removed synchronously, so any
    // id the operator persisted and released is already gone here.
    val leaked = persistedIds -- before
    assert(leaked.isEmpty,
      s"heavyHitters left persisted RDD id(s) ${leaked.mkString(",")} behind")
  }

  test("duplicatedSpansWithHandle releases only its own frame") {
    val unrelated = docs.select("doc_id").persist()
    assert(unrelated.count() > 0)
    val before = persistedIds
    val (out, handle) = graft.operators.Dedup.duplicatedSpansWithHandle(docs)
    assert(out.count() > 0)
    val added = persistedIds -- before
    assert(added.size == 1,
      s"expected exactly one tracked persist, saw ids ${added.mkString(",")}")
    handle.release()
    val surviving = persistedIds -- before
    assert(surviving.isEmpty,
      s"handle did not release persisted id(s) ${surviving.mkString(",")}")
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
