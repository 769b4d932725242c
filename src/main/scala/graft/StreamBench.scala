package graft

import java.nio.file.Files

import graft.io.EventCodec
import graft.replay.StreamPopulator
import graft.sources.SyntheticTrips
import graft.streaming.StreamingTaxi
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** B3 streaming bench (BASELINE.md): derive the wire-format event
  * stream at the given SF, replay it through the producer into
  * partition files, then run streaming Q1 over the replayed
  * partitions and report sustained events/s plus max micro-batch
  * duration (the consumer-lag SLO analogue). One JSON line on stdout.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StreamingTaxi.configureStateStore(spark)

    val wireDir = Files.createTempDirectory("wire").toString
    val replayDir = Files.createTempDirectory("replay").toString
    val cpDir = Files.createTempDirectory("cp").toString

    // wire-format JSONL of the SF's synthetic trip stream
    EventCodec.toJsonLines(SyntheticTrips.fromEvents(spark, sfDir))
      .coalesce(4).write.mode("overwrite").text(wireDir)

    // replay (R1/R3/R6) at max speed into 8 partition files
    val t0 = System.nanoTime()
    val (events, _) = new StreamPopulator(wireDir, replayDir,
      partitions = 8, speedup = 1e12, sleep = _ => (),
      statsEveryMs = Long.MaxValue).populate()
    val replaySec = (System.nanoTime() - t0) / 1e9

    // streaming Q1 over the replayed partitions, 2 files per batch
    val stream = EventCodec.parseEvents(
      spark.readStream.option("maxFilesPerTrigger", "2")
        .text(s"$replayDir/*.jsonl").toDF("value"))
    val q1 = StreamingTaxi.q1(StreamingTaxi.tripStream(stream))
    val t1 = System.nanoTime()
    val query = StreamingTaxi.writer(q1, cpDir, Trigger.AvailableNow())
      .format("memory").queryName("bench_q1").start()
    query.awaitTermination()
    val streamWallSec = (System.nanoTime() - t1) / 1e9

    val progress = query.recentProgress.toSeq
    val inputRows = progress.map(_.numInputRows).sum
    val maxBatchMs = progress.map(_.durationMs.getOrDefault("triggerExecution",
      0L).toLong).maxOption.getOrElse(0L)
    val evPerSec = inputRows / streamWallSec
    println(s"""{"metric":"stream_events_per_sec","value":$evPerSec,""" +
      s""""unit":"events/sec","replay_events":$events,""" +
      s""""replay_sec":$replaySec,"stream_wall_sec":$streamWallSec,""" +
      s""""input_rows":$inputRows,"n_batches":${progress.size},""" +
      s""""max_batch_ms":$maxBatchMs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
