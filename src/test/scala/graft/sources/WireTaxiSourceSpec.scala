package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSessionSpec
import graft.io.EventCodec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WireTaxiSourceSpec extends AnyFunSuite with SparkSessionSpec {

  private val fixture = "/root/repo/src/test/resources/trips_tiny.jsonl"

  private def viaCodec = EventCodec.parseEvents(
    spark.read.text(fixture).toDF("value"), strict = false)

  private def viaSource = spark.read.format("wire-taxi").load(fixture)

  test("connector rows equal the codec path on the wire fixture") {
    val a = viaSource.orderBy("trip_id", "watermark")
      .collect().map(_.toSeq).toSeq
    val b = viaCodec.orderBy("trip_id", "watermark")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.size == 15) // 16 lines - 1 malformed
  }

  test("short name resolves through DataSourceRegister") {
    // format("wire-taxi") (not the FQCN) is what resolved above; the
    // schema must be the full union wire schema
    assert(viaSource.schema == graft.model.Events.wireSchema)
  }

  test("type filter and column pruning reach the source scan") {
    val q = viaSource.filter(col("type") === "trip" &&
        col("total_amount") >= 5.0)
      .select("trip_id", "total_amount")
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }
    assert(scans.size == 1)
    val desc = scans.head.scan.description()
    assert(desc.contains("EqualTo(type,trip)"))
    assert(desc.contains("GreaterThanOrEqual(total_amount,5.0)"))
    // pruned read schema: only the referenced columns
    val read = scans.head.scan.readSchema().fieldNames.toSet
    assert(read == Set("trip_id", "total_amount", "type"))
    // trips 8/9/11/12 pass the amount cut... recompute: amounts >= 5
    val ids = q.collect().map(_.getLong(0)).sorted.toSeq
    val expected = viaCodec.filter(col("type") === "trip" &&
        col("total_amount") >= 5.0)
      .collect().map(_.getAs[Long]("trip_id")).sorted.toSeq
    assert(ids == expected && ids.nonEmpty)
  }

  test("gzipped files read transparently, one partition per file") {
    val dir = Files.createTempDirectory("wiretaxi")
    val gz = dir.resolve("part-0.jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(gz))
    out.write(Files.readAllBytes(Paths.get(fixture)))
    out.close()
    Files.copy(Paths.get(fixture), dir.resolve("part-1.jsonl"))

    val df = spark.read.format("wire-taxi").load(dir.toString)
    assert(df.count() == 30) // both files, malformed line skipped in each
    assert(df.rdd.getNumPartitions == 2)
  }

  test("timestamps parse identically to the from_json codec path") {
    val a = viaSource.filter(col("type") === "trip")
      .select(unix_millis(col("dropoff_datetime"))).as[Long](
        org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    val b = viaCodec.filter(col("type") === "trip")
      .select(unix_millis(col("dropoff_datetime"))).as[Long](
        org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    assert(a == b)
  }
}
