package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import graft.operators.Warc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online/batch parity of the streaming CDX indexer: offsets carried
  * in per-file state must equal the batch window prefix-sums, even
  * when a .warc file spans micro-batch boundaries. */
class StreamingCdxSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def mkRecs(ids: Seq[Long]) = {
    Warc.warcRecords(ids.map(id => (id, s"text of $id"))
      .toDF("doc_id", "text"))
      .as[(Long, String)].collect().toSeq
  }

  test("a .warc file spanning micro-batches continues its offsets " +
      "from state; a new file restarts at zero; rows equal batch") {
    val ids = Seq(0L, 1L, 2L, 3L, 100L, 101L)
    val recs = mkRecs(ids)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingCdx.index(ms.toDF().toDF("doc_id", "warc"))
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("cdx-cp").toString)
      .format("memory").queryName("cdx_span").start()
    // batch 1: first half of file 0; batch 2: rest + file 1
    ms.addData(recs.take(2): _*); q.processAllAvailable()
    ms.addData(recs.drop(2): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cdx_span").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("offset"),
        r.getAs[String]("warc_file"))).sorted
    val batch = Warc.cdxIndex(ids.map(id => (id, s"text of $id"))
        .toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("offset"),
        r.getAs[String]("warc_file"))).sorted
    assert(streamed.toSeq == batch.toSeq,
      "streamed offsets must equal the batch prefix-sums exactly")
    // the file boundary genuinely restarts
    val f1 = streamed.filter(_._3 == "crawl-00001.warc")
    assert(f1.nonEmpty && f1.head._2 == 0L)
    // and the cross-batch continuation is non-trivial
    val f0 = streamed.filter(_._3 == "crawl-00000.warc")
    assert(f0.count(_._2 > 0L) == 3)
  }
}

/** Online/batch parity of the streaming revisit detector. */
class StreamingRevisitSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx2: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("captures classify on arrival from per-URI digest state and " +
      "equal the batch q252 rows exactly across batch boundaries") {
    val docs = Seq((7L, "alpha beta"), (9L, "gamma delta"))
    val snaps = docs.flatMap { case (id, t) =>
      Seq((id, 0, t),
        (id, 1, if (id % 3 == 0) t + " updated v2" else t))
    }
    val ms = MemoryStream[(Long, Int, String)]
    val q = StreamingRevisit.detect(
        ms.toDF().toDF("doc_id", "run", "snap_text"))
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("rev-cp").toString)
      .format("memory").queryName("rev_span").start()
    // run 0 in batch 1, run 1 in batch 2 (the recrawl order)
    ms.addData(snaps.filter(_._2 == 0): _*); q.processAllAvailable()
    ms.addData(snaps.filter(_._2 == 1): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("rev_span").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("run"),
        r.getAs[String]("record_type"), r.getAs[Long]("saved_chars"),
        r.getAs[String]("digest"))).sorted
    val batch = graft.operators.Warc.warcRevisits(
        docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("run"),
        r.getAs[String]("record_type"), r.getAs[Long]("saved_chars"),
        r.getAs[String]("digest"))).sorted
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.exists(_._3 == "revisit"))
    assert(streamed.exists(r => r._2 == 1L && r._3 == "response"))
  }
}
