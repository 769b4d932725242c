package graft.replay

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.SparkSessionSpec
import graft.io.EventCodec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReplaySpec extends AnyFunSuite with SparkSessionSpec {

  private val fixture = "src/test/resources/trips_tiny.jsonl"
  private lazy val fixtureLines =
    scala.io.Source.fromFile(fixture, "UTF-8").getLines().toSeq

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("reader scans plain + gzip files, skips the malformed line (R1)") {
    val dir = tmp("replay-in")
    Files.writeString(Paths.get(dir, "a.jsonl"),
      fixtureLines.mkString("", "\n", "\n"))
    val gz = new GZIPOutputStream(
      Files.newOutputStream(Paths.get(dir, "b.jsonl.gz")))
    gz.write(fixtureLines.mkString("", "\n", "\n").getBytes("UTF-8"))
    gz.close()
    val r = new TaxiEventReader(dir)
    val all = r.toSeq
    assert(all.size == 30) // (12 trips + 3 watermarks) × 2 files
    assert(r.skippedLines == 2) // the malformed line in each file
  }

  test("seek skips events below the target timestamp (R2)") {
    val dir = tmp("replay-seek")
    Files.writeString(Paths.get(dir, "a.jsonl"),
      fixtureLines.mkString("", "\n", "\n"))
    val r = new TaxiEventReader(dir)
    val t = 1451607000000L // 2016-01-01T00:10:00Z
    r.seek(t)
    val rest = r.toSeq
    assert(rest.nonEmpty)
    assert(rest.forall(_._2 >= t))
  }

  test("invocation time adaptation shifts timestamps, preserves duration (R4)") {
    val line = fixtureLines.head
    val ts = ReplayJson.timestampOf(line).get
    val delta = 86400000L
    val shifted = AdaptTime.adapt(line, ts,
      AdaptTime.Invocation(datasetEpochMs = 0L, nowMs = delta))
    val n0 = ReplayJson.mapper.readTree(line)
    val n1 = ReplayJson.mapper.readTree(shifted)
    def t(n: com.fasterxml.jackson.databind.JsonNode, f: String) =
      ReplayJson.parseIso(n.get(f).asText())
    assert(t(n1, "dropoff_datetime") - t(n0, "dropoff_datetime") == delta)
    assert(t(n1, "dropoff_datetime") - t(n1, "pickup_datetime") ==
      t(n0, "dropoff_datetime") - t(n0, "pickup_datetime"))
  }

  test("ingestion adaptation moves dropoff to now, preserves duration (R4)") {
    val line = fixtureLines.head
    val ts = ReplayJson.timestampOf(line).get
    val fakeNow = 1700000000000L
    val shifted = AdaptTime.adapt(line, ts, AdaptTime.Ingestion(() => fakeNow))
    val n1 = ReplayJson.mapper.readTree(shifted)
    assert(ReplayJson.parseIso(n1.get("dropoff_datetime").asText()) == fakeNow)
  }

  test("populate partitions events, broadcasts watermarks to every partition (R3/R6)") {
    val in = tmp("replay-pop-in")
    val out = tmp("replay-pop-out")
    Files.writeString(Paths.get(in, "a.jsonl"),
      fixtureLines.mkString("", "\n", "\n"))
    val pop = new StreamPopulator(in, out, partitions = 3,
      speedup = 1e12, sleep = _ => (), statsEveryMs = Long.MaxValue)
    val (events, skipped) = pop.populate()
    assert(events == 15 && skipped == 1)
    val parts = (0 until 3).map(i =>
      Files.readAllLines(Paths.get(out, f"part-$i%05d-00000.jsonl")))
    // every partition ends with the final broadcast watermark
    parts.foreach { p =>
      assert(p.size() > 0)
      assert(p.get(p.size() - 1).contains("\"watermark\""))
    }
    // every input trip line lands in exactly one partition
    val allOut = parts.flatMap(_.toArray.map(_.toString))
    assert(allOut.count(_.contains("\"trip\"")) == 12)
  }

  test("segment rotation publishes complete immutable files (tailing contract)") {
    // Spark's file streaming source reads each path exactly ONCE, so
    // a continuous replay must never append to a visible file: data
    // is authored under .tmp names and published whole, per segment
    val in = tmp("replay-rot-in")
    val out = tmp("replay-rot-out")
    Files.writeString(Paths.get(in, "a.jsonl"),
      fixtureLines.mkString("", "\n", "\n"))
    new StreamPopulator(in, out, partitions = 2, speedup = 1e12,
      sleep = _ => (), statsEveryMs = Long.MaxValue,
      rotateEveryEvents = 5).populate()
    val files = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(files.nonEmpty && files.forall(_.endsWith(".jsonl")),
      s"unpublished tmp files left behind: ${files.mkString(",")}")
    // 15 events with a segment every 5 -> several segments/partition
    assert(files.count(_.startsWith("part-00000-")) >= 3)
    val all = files.flatMap(f =>
      Files.readAllLines(Paths.get(out, f)).toArray.map(_.toString))
    assert(all.count(_.contains("\"trip\"")) == 12) // nothing lost
  }

  test("replayed partitions feed the engine end-to-end (R1→S2→Q1)") {
    val in = tmp("replay-e2e-in")
    val out = tmp("replay-e2e-out")
    Files.writeString(Paths.get(in, "a.jsonl"),
      fixtureLines.mkString("", "\n", "\n"))
    new StreamPopulator(in, out, partitions = 2, speedup = 1e12,
      sleep = _ => (), statsEveryMs = Long.MaxValue).populate()
    val events = EventCodec.parseEvents(
      spark.read.text(s"$out/*.jsonl").toDF("value"))
    assert(events.filter(col("type") === "trip").count() == 12)
    val q1 = graft.operators.TaxiQueries.q1PickupHotspots(
      graft.operators.TaxiQueries.validNycTrips(events)).collect()
    assert(q1.length == 3) // same goldens as WireFixtureSpec
  }
}
