package graft.io

import java.nio.file.Files

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

/** Records every bulk call; optionally fails chosen doc ids N times. */
class RecordingTransport(failIds: Map[String, Int] = Map.empty)
    extends BulkTransport {
  val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
  private val remainingFails =
    scala.collection.mutable.Map.from(failIds)
  override def bulkIndex(docs: Seq[IndexDoc]): Seq[Boolean] = {
    calls += docs.map(_.id)
    docs.map { d =>
      remainingFails.get(d.id) match {
        case Some(n) if n > 0 =>
          remainingFails(d.id) = n - 1; false
        case _ => true
      }
    }
  }
}

class BulkIndexSinkSpec extends AnyFunSuite with SparkSessionSpec {

  private def doc(i: Int) = IndexDoc(s"doc$i", s"""{"i": $i}""")

  test("flushes at the doc-count threshold (500) and drains at close") {
    val t = new RecordingTransport
    val idx = new BulkIndexer(t, maxDocs = 500, maxAgeMs = Long.MaxValue)
    (1 to 1201).foreach(i => idx.add(doc(i)))
    idx.flush()
    assert(t.calls.map(_.size).toSeq == Seq(500, 500, 201))
    assert(idx.totalFlushed == 1201)
  }

  test("flushes when the buffer exceeds the age threshold (5 s)") {
    var clock = 0L
    val t = new RecordingTransport
    val idx = new BulkIndexer(t, maxDocs = 1000, maxAgeMs = 5000,
      now = () => clock)
    idx.add(doc(1))
    clock = 4999; idx.add(doc(2))
    assert(t.calls.isEmpty)
    clock = 5000; idx.add(doc(3)) // age hit -> flush all three
    assert(t.calls.map(_.size).toSeq == Seq(3))
  }

  test("single-action failures inside a bulk are retried (reference FIXME fix)") {
    val t = new RecordingTransport(failIds = Map("doc2" -> 1))
    val idx = new BulkIndexer(t, maxDocs = 10, maxAgeMs = Long.MaxValue)
    (1 to 3).foreach(i => idx.add(doc(i)))
    idx.flush()
    assert(t.calls.toSeq == Seq(Seq("doc1", "doc2", "doc3"), Seq("doc2")))
    assert(idx.totalFlushed == 3)
  }

  test("persistently failing action fails the task after maxRetries") {
    val t = new RecordingTransport(failIds = Map("doc1" -> 100))
    val idx = new BulkIndexer(t, maxDocs = 10, maxAgeMs = Long.MaxValue,
      maxRetries = 2)
    idx.add(doc(1))
    val e = intercept[java.io.IOException](idx.flush())
    assert(e.getMessage.contains("after 2 retries"))
  }

  test("local-dir index is idempotent under re-delivery") {
    val dir = Files.createTempDirectory("bulk-idx").toString
    val t = new LocalDirTransport(dir)
    val docs = (1 to 5).map(doc)
    assert(t.bulkIndex(docs).forall(identity))
    assert(t.bulkIndex(docs).forall(identity)) // redeliver same batch
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".json"))
    assert(files.length == 5)
    val content = Files.readString(
      java.nio.file.Paths.get(dir, "doc3.json")).trim
    assert(content == """{"i": 3}""")
  }

  test("doc ids never collide across distinct key tuples (nulls, delimiters)") {
    import spark.implicits._
    // adversarial tuples for a naive delimiter-concat id: null-shift
    // pairs and delimiter-straddling pairs must all get DISTINCT ids
    val rows = Seq(
      (Option.empty[String], Option("x")),
      (Option("x"), Option.empty[String]),
      (Option("a|b"), Option("c")),
      (Option("a"), Option("b|c")),
      (Option("a"), Option("b")),
      (Option.empty[String], Option.empty[String]))
      .toDF("k1", "k2")
    val ids = BulkIndexSink.withDocId(rows, Seq("k1", "k2"))
      .select("_id").collect().map(_.getString(0))
    assert(ids.distinct.length == ids.length,
      s"id collision across distinct key tuples: ${ids.mkString(",")}")
  }

  test("end-to-end: Q1 results land in the index with deterministic ids") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("bulk-e2e").toString
    val events = EventCodec.parseEvents(
      spark.read.text("src/test/resources/trips_tiny.jsonl").toDF("value"))
    val q1 = graft.operators.TaxiQueries.q1PickupHotspots(
      graft.operators.TaxiQueries.validNycTrips(events))
    BulkIndexSink.write(q1, Seq("location", "timestamp"),
      new LocalDirTransport(dir))
    val n1 = new java.io.File(dir).listFiles().count(_.getName.endsWith(".json"))
    assert(n1 == q1.count())
    // re-delivery (e.g. a retried micro-batch) adds no new documents
    BulkIndexSink.write(q1, Seq("location", "timestamp"),
      new LocalDirTransport(dir))
    val n2 = new java.io.File(dir).listFiles().count(_.getName.endsWith(".json"))
    assert(n2 == n1)
  }
}
