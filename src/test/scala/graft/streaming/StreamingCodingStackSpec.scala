package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import graft.operators.Warc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Wave parity of the streaming coding-stack twin (q330): the same
  * corpus replayed as three arrival waves through the IDENTICAL
  * q316 decode code must yield row-for-row the batch result — the
  * stack peel is row-local, so a capture's decoded row is final the
  * moment it lands, and no wave boundary may change any digest. */
class StreamingCodingStackSpec extends AnyFunSuite
    with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("streamed coding-stack rows == batch q316 rows, across three " +
      "waves and a wave boundary INSIDE every coding variant") {
    val docsBatch = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val expected = Warc.httpCodingStack(docsBatch).collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])

    val docs = docsBatch.as[(Long, String)].collect().sortBy(_._1)
    // three waves whose boundaries fall mid-variant: doc_id % 4
    // cycles every 4 ids, and thirds of the corpus are not multiples
    // of 4 — each wave carries all four codings
    val waves = docs.grouped((docs.length + 2) / 3).toSeq
    assert(waves.size == 3)

    val ms = MemoryStream[(Long, String)]
    val q = Warc.streamCodingStack(ms.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("scs-cp").toString)
      .format("memory").queryName("scs_out").start()
    val seen = Seq.newBuilder[Int]
    for (w <- waves) {
      ms.addData(w.toSeq: _*)
      q.processAllAvailable()
      seen += spark.table("scs_out").collect().length
    }
    q.stop()
    // rows are FINAL on arrival: counts grow by exactly each wave
    assert(seen.result() == waves.scanLeft(0)(_ + _.size).tail)
    val got = spark.table("scs_out").collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(got.toSeq == expected.toSeq)
    // the mix really exercised all four stack shapes
    val codings = spark.table("scs_out").select("coding")
      .as[String].collect().toSet
    assert(codings ==
      Set("identity", "gzip", "chunked", "chunked+gzip"))
  }
}
