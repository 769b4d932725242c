package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import graft.operators.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end parity of the incremental preprocessing funnel: the
  * same corpus replayed as a stream (two micro-batches, doc_id order)
  * through the streaming gates + pair detection, finalized at a
  * checkpoint, must report the exact survivor counts of the batch
  * funnel — stage by stage. */
class StreamingFunnelSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("streamed funnel counts == batch funnel counts on the same corpus") {
    val docsBatch = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val expected = Pipeline.preprocessingFunnel(docsBatch).collect()(0)

    val docs = docsBatch.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val (first, second) = docs.splitAt(docs.length / 2)

    // two independent streaming queries over the same replay: the
    // per-doc gates and the near-dup pair stream
    val msFlags = MemoryStream[(Long, String)]
    val qFlags = StreamingFunnel.docFlags(
        msFlags.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sf-flags-cp").toString)
      .format("memory").queryName("funnel_flags").start()

    val msPairs = MemoryStream[(Long, String)]
    val qPairs = StreamingDedup.nearDupPairs(
        msPairs.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sf-pairs-cp").toString)
      .format("memory").queryName("funnel_pairs").start()

    for (half <- Seq(first, second)) {
      msFlags.addData(half.toSeq: _*)
      msPairs.addData(half.toSeq: _*)
      qFlags.processAllAvailable()
      qPairs.processAllAvailable()
    }
    qFlags.stop(); qPairs.stop()

    val got = StreamingFunnel.finalizeCounts(
      spark.table("funnel_flags"),
      spark.table("funnel_pairs")).collect()(0)

    val cols = Seq("n_raw", "n_after_dedup", "n_after_neardup",
      "n_after_quality", "n_after_lang", "n_train", "n_validation",
      "n_test")
    cols.foreach { c =>
      assert(got.getAs[Long](c) == expected.getAs[Long](c),
        s"$c: streamed ${got.getAs[Long](c)} != batch ${expected.getAs[Long](c)}")
    }

    // per-doc dedup decisions also match the batch canonical under
    // ordered replay (first arrival = min doc_id)
    val batchKeep = graft.operators.Dedup.exactDedup(docsBatch)
      .filter(!org.apache.spark.sql.functions.col("is_duplicate"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val streamKeep = spark.table("funnel_flags")
      .filter(org.apache.spark.sql.functions.col("keep_dedup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamKeep == batchKeep)
  }

  test("streamed DECONTAMINATED funnel (q246) counts == the batch " +
      "q223 row, stage by stage — static benchmark sides, stateless " +
      "per-batch screens") {
    import org.apache.spark.sql.functions.col
    val docsBatch = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = graft.operators.Similarity
      .embeddings(spark, "/root/testdata/sf0.001")
    val expected = Pipeline.decontaminatedFunnel(docsBatch, emb)
      .collect()(0)

    val docs = docsBatch.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val (first, second) = docs.splitAt(docs.length / 2)
    // the STATIC benchmark sides, built once before any wave
    val benchFps = graft.operators.Dedup.benchFingerprintSet(docsBatch)
      .cache()
    benchFps.count()

    val msFlags = MemoryStream[(Long, String)]
    val qFlags = StreamingFunnel.docFlags(
        msFlags.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sf-dflags-cp").toString)
      .format("memory").queryName("dfunnel_flags").start()
    val msPairs = MemoryStream[(Long, String)]
    val qPairs = StreamingDedup.nearDupPairs(
        msPairs.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sf-dpairs-cp").toString)
      .format("memory").queryName("dfunnel_pairs").start()
    // the stateless screens: per arriving micro-batch in foreachBatch
    val hitsDir = Files.createTempDirectory("sf-dhits").toString
    val msHits = MemoryStream[(Long, String)]
    val qHits = msHits.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          StreamingFunnel.decontamScreen(batch, benchFps, emb)
            .write.mode("overwrite").parquet(f"$hitsDir/b$batchId%05d")
      }
      .option("checkpointLocation",
        Files.createTempDirectory("sf-dhits-cp").toString)
      .start()

    for (half <- Seq(first, second)) {
      msFlags.addData(half.toSeq: _*)
      msPairs.addData(half.toSeq: _*)
      msHits.addData(half.toSeq: _*)
      qFlags.processAllAvailable()
      qPairs.processAllAvailable()
      qHits.processAllAvailable()
    }
    qFlags.stop(); qPairs.stop(); qHits.stop()
    benchFps.unpersist()

    val hitDirs = new java.io.File(hitsDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
      .map(_.getPath).sorted
    val hits = spark.read.parquet(hitDirs.toIndexedSeq: _*)
    val got = StreamingFunnel.finalizeDecontam(
      spark.table("dfunnel_flags"),
      spark.table("dfunnel_pairs"), hits).collect()(0)

    val cols = Seq("n_raw", "n_after_dedup", "n_after_neardup",
      "n_after_quality", "n_after_lang", "n_after_decontam",
      "n_train", "n_validation", "n_test")
    cols.foreach { c =>
      assert(got.getAs[Long](c) == expected.getAs[Long](c),
        s"$c: streamed ${got.getAs[Long](c)} != batch " +
          s"${expected.getAs[Long](c)}")
    }
  }
}
