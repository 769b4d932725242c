package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import graft.operators.Similarity
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming maintenance of the persisted LSH index: ingest the
  * corpus across micro-batches, prove a probe of the maintained table
  * equals a probe of a fresh full-corpus index, and pin the
  * operational properties — stateless job, bounded files per batch,
  * idempotent re-delivery, duplicate-absorbing probes, compaction
  * back to one file per bucket with the bucket-aligned plan intact. */
class StreamingLshIndexSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private lazy val emb =
    Similarity.embeddings(spark, "/root/testdata/sf0.001")

  private def canon(df: DataFrame): Set[(Long, Long, Long, Double)] = df
    .select("query_id", "neighbor_id", "rank", "cosine").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet

  private def dataFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
  }

  test("probe after N streamed batches == fresh full-index probe; " +
      "stateless, bounded, idempotent, compactable") {
    val wh = Files.createTempDirectory("slsh").toString
    val idxPath = s"$wh/idx"
    val buckets = 8
    // force the bucket-join path so the post-compaction plan pin is
    // about the bucketed layout, not a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // three arrival waves over vec_id ranges (0..499)
      val cuts = Seq((0L, 170L), (170L, 340L), (340L, 500L))
      val ms = MemoryStream[Long]
      val stream = ms.toDF().toDF("vec_id").join(emb, "vec_id")
      val q = StreamingLshIndex.maintain(stream, "lsh_stream_idx",
        idxPath, buckets, checkpoint = s"$wh/cp")
      try {
        cuts.foreach { case (lo, hi) =>
          ms.addData(lo until hi: _*)
          q.processAllAvailable()
        }
        // stateless: the table is the state, the engine holds none
        assert(q.lastProgress.stateOperators.isEmpty,
          "maintenance job should run without a state store")
      } finally q.stop()

      // parity: maintained index == fresh full-corpus index
      Similarity.writeLshIndex(emb, "lsh_fresh_idx", s"$wh/fresh",
        buckets)
      val expected = canon(Similarity.probeLshIndex(emb, "lsh_fresh_idx"))
      assert(expected.nonEmpty)
      assert(canon(Similarity.probeLshIndex(emb, "lsh_stream_idx"))
        == expected)

      // bounded: each batch repartitions onto the bucket hash, so at
      // most `buckets` files per batch land in the table
      val afterStream = dataFiles(idxPath).size
      assert(afterStream <= cuts.size * buckets,
        s"$afterStream files for ${cuts.size} batches x $buckets buckets")

      // idempotent re-delivery: batch 0 retried under its ledger id
      // is a no-op
      val batch0 = emb.filter(col("vec_id") < 170)
      val rowsBefore = spark.table("lsh_stream_idx").count()
      StreamingLshIndex.appendBatch("lsh_stream_idx", idxPath, buckets)(
        batch0, 0L)
      assert(spark.table("lsh_stream_idx").count() == rowsBefore)

      // at-least-once window: the same data under a NEW batch id DOES
      // append (duplicate rows) — and the probe's candidate distinct
      // absorbs them, so results never change
      StreamingLshIndex.appendBatch("lsh_stream_idx", idxPath, buckets)(
        batch0, 99L)
      assert(spark.table("lsh_stream_idx").count() > rowsBefore)
      assert(canon(Similarity.probeLshIndex(emb, "lsh_stream_idx"))
        == expected)

      // compaction: back to <= buckets files, duplicates dropped,
      // probe parity and the bucket-aligned scan both intact
      StreamingLshIndex.compact(spark, "lsh_stream_idx", s"$wh/idx-g1",
        buckets)
      assert(dataFiles(s"$wh/idx-g1").size <= buckets)
      assert(!new java.io.File(idxPath).exists(),
        "old generation should be deleted")
      assert(spark.table("lsh_stream_idx").count() == rowsBefore)
      val probe = Similarity.probeLshIndex(emb, "lsh_stream_idx")
      assert(canon(probe) == expected)
      assert(probe.queryExecution.executedPlan.toString
        .contains("SelectedBucketsCount"),
        "compacted index scan is not bucket-aligned")
    } finally {
      spark.sql("DROP TABLE IF EXISTS lsh_stream_idx")
      spark.sql("DROP TABLE IF EXISTS lsh_stream_idx_compacting")
      spark.sql("DROP TABLE IF EXISTS lsh_fresh_idx")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
