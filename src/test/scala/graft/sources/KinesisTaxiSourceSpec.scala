package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSessionSpec
import graft.io.{EventCodec, KinesisClientException, KinesisHttpClient}
import graft.streaming.StreamingTaxi
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Protocol-level coverage of the Kinesis-shaped source: wire parity
  * with the file paths, pushdown/pruning, exactly-once restart with
  * sequence-number offsets in the checkpoint, throttled admission
  * surfacing real GetRecords lag, SigV4 enforcement, and client
  * retry — all over real HTTP against [[StubKinesisServer]]. */
class KinesisTaxiSourceSpec extends AnyFunSuite with SparkSessionSpec {

  private val fixture = "/root/repo/src/test/resources/trips_tiny.jsonl"
  private lazy val fixtureLines: Vector[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(Paths.get(fixture)).asScala.toVector
  }

  private def withStub[A](srv: StubKinesisServer)(f: StubKinesisServer => A): A =
    try f(srv) finally srv.stop()

  /** Fixture lines round-robined over the stub's shards. */
  private def loadFixture(srv: StubKinesisServer,
      arrivalMs: Option[Long] = None): Unit =
    fixtureLines.zipWithIndex.foreach { case (line, i) =>
      srv.putRecord(line, partitionKey = s"pk$i",
        shard = Some(i % srv.shardIds.size), arrivalMs = arrivalMs)
    }

  private def read(srv: StubKinesisServer, extra: (String, String)*) = {
    val base = spark.read.format("kinesis-taxi")
      .option("endpoint", srv.endpoint)
      .option("stream", srv.streamName)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  private def readStream(srv: StubKinesisServer, extra: (String, String)*) = {
    val base = spark.readStream.format("kinesis-taxi")
      .option("endpoint", srv.endpoint)
      .option("stream", srv.streamName)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  private def viaCodec = EventCodec.parseEvents(
    spark.read.text(fixture).toDF("value"), strict = false)

  test("batch read over the protocol equals the codec path") {
    withStub(new StubKinesisServer()) { srv =>
      loadFixture(srv)
      val a = read(srv).orderBy("trip_id", "watermark")
        .collect().map(_.toSeq).toSeq
      val b = viaCodec.orderBy("trip_id", "watermark")
        .collect().map(_.toSeq).toSeq
      assert(a == b)
      assert(a.size == 15) // 16 lines - 1 malformed (R1 skip parity)
      assert(read(srv).schema == graft.model.Events.wireSchema)
    }
  }

  test("one input partition per shard") {
    withStub(new StubKinesisServer(shardCount = 3)) { srv =>
      loadFixture(srv)
      assert(read(srv).rdd.getNumPartitions == 3)
    }
  }

  test("type filter and column pruning reach the protocol scan") {
    withStub(new StubKinesisServer()) { srv =>
      loadFixture(srv)
      val q = read(srv).filter(col("type") === "trip" &&
          col("total_amount") >= 5.0)
        .select("trip_id", "total_amount")
      val scans = q.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b }
      assert(scans.size == 1)
      val desc = scans.head.scan.description()
      assert(desc.contains("EqualTo(type,trip)"))
      assert(desc.contains("GreaterThanOrEqual(total_amount,5.0)"))
      assert(scans.head.scan.readSchema().fieldNames.toSet ==
        Set("trip_id", "total_amount", "type"))
      val expected = viaCodec.filter(col("type") === "trip" &&
          col("total_amount") >= 5.0)
        .collect().map(_.getAs[Long]("trip_id")).sorted.toSeq
      assert(q.collect().map(_.getLong(0)).sorted.toSeq == expected)
    }
  }

  test("streaming Q1 through the kinesis source is row-identical to the file path") {
    withStub(new StubKinesisServer()) { srv =>
      loadFixture(srv)
      val cpA = Files.createTempDirectory("kcpA").toString
      val cpB = Files.createTempDirectory("kcpB").toString
      val fileDir = Files.createTempDirectory("kq1files")
      Files.copy(Paths.get(fixture), fileDir.resolve("trips.jsonl"))
      val viaKinesis = EventCodec.strictTyped(readStream(srv))
      val viaFile = StreamingTaxi.fromJsonFiles(spark, fileDir.toString)
      val qa = StreamingTaxi.runToMemory(
        StreamingTaxi.q1(StreamingTaxi.tripStream(viaKinesis)),
        "kinesis_q1", cpA)
      val qb = StreamingTaxi.runToMemory(
        StreamingTaxi.q1(StreamingTaxi.tripStream(viaFile)),
        "file_q1", cpB)
      qa.awaitTermination(); qb.awaitTermination()
      val a = spark.table("kinesis_q1").collect().map(_.toSeq).toSet
      val b = spark.table("file_q1").collect().map(_.toSeq).toSet
      assert(a == b)
    }
  }

  test("restart resumes from sequence-number offsets: no loss, no duplicates") {
    withStub(new StubKinesisServer()) { srv =>
      val base = System.currentTimeMillis() - 60000
      (1 to 6).foreach(i => srv.putRecord(
        s"""{"type": "trip", "trip_id": $i, "total_amount": 1.0}""",
        shard = Some(i % 2), arrivalMs = Some(base + i)))
      val cp = Files.createTempDirectory("kcp-restart").toString
      val sink = Files.createTempDirectory("ksink-restart").toString

      // memory sinks cannot recover a checkpoint; the exactly-once
      // restart contract is proven through the file sink
      val q1 = StreamingTaxi.writer(
          readStream(srv).select(col("trip_id")), cp, Trigger.AvailableNow())
        .format("parquet").option("path", sink).start()
      q1.awaitTermination()
      val got1 = spark.read.parquet(sink).collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got1 == (1L to 6L))

      // the committed offset carries per-shard SEQUENCE NUMBERS
      val offsetFiles = Files.list(Paths.get(cp, "offsets"))
      val latest = try {
        import scala.jdk.CollectionConverters._
        offsetFiles.iterator().asScala.toSeq
          .filter(_.getFileName.toString.forall(_.isDigit)).maxBy(_.getFileName.toString.toInt)
      } finally offsetFiles.close()
      val offsetJson = new String(Files.readAllBytes(latest), "UTF-8")
      assert(offsetJson.contains("shardSeqs"),
        s"offset log must carry sequence numbers: $offsetJson")

      // new records arrive while the query is down — service-assigned
      // arrival (now), necessarily after run 1's closing timestamp
      // (the invariant the real service guarantees)
      (7 to 9).foreach(i => srv.putRecord(
        s"""{"type": "trip", "trip_id": $i, "total_amount": 1.0}""",
        shard = Some(i % 2)))

      val q2 = StreamingTaxi.writer(
          readStream(srv).select(col("trip_id")), cp, Trigger.AvailableNow())
        .format("parquet").option("path", sink).start()
      q2.awaitTermination()
      // the resumed run appends exactly the new records, each once —
      // the sequence-number resume point held (no loss, no re-read)
      val got2 = spark.read.parquet(sink).collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got2 == (1L to 9L), s"after resume read $got2")
    }
  }

  test("throttled admission: multiple batches, real GetRecords lag in metrics") {
    val base = System.currentTimeMillis() - 20000
    withStub(new StubKinesisServer(shardCount = 1)) { srv =>
      (1 to 10).foreach(i => srv.putRecord(
        s"""{"type": "trip", "trip_id": $i, "total_amount": 1.0}""",
        shard = Some(0), arrivalMs = Some(base + i * 1000)))
      val cp = Files.createTempDirectory("kcp-throttle").toString
      val q = StreamingTaxi.writer(
          readStream(srv,
            "startTsMs" -> base.toString,
            "maxAdvanceMsPerTrigger" -> "3000",
            // paginate GetRecords so MillisBehindLatest is the real
            // mid-drain iterator lag, not one drain-all call
            "getRecordsLimit" -> "2").select(col("trip_id")),
          cp, Trigger.AvailableNow())
        .format("memory").queryName("kthrottle").start()
      q.awaitTermination()
      assert(spark.table("kthrottle").collect()
        .map(_.getLong(0)).sorted.toSeq == (1L to 10L))
      val progresses = q.recentProgress.toSeq
      assert(progresses.count(_.numInputRows > 0) > 1,
        "admission cap must split ingestion across batches")
      val sourceMetrics = progresses.flatMap(_.sources.toSeq)
        .map(_.metrics).filter(_ != null)
      val behind = sourceMetrics.flatMap(m =>
        Option(m.get("millisBehindLatest")).map(_.toLong))
      // mid-drain the shard iterator truly trails the tip: the lag is
      // reported by GetRecords itself, not synthesized driver-side
      assert(behind.exists(_ > 0), s"expected positive lag, got $behind")
      val lags = sourceMetrics.flatMap(m =>
        Option(m.get("closedLagMs")).map(_.toLong))
      assert(lags.exists(_ > 0))
    }
  }

  test("SigV4 is enforced: unsigned rejected, signed passes with kinesis scope") {
    withStub(new StubKinesisServer(requireSigV4 = true)) { srv =>
      loadFixture(srv)
      val e = intercept[Exception] { read(srv).count() }
      def rootCause(t: Throwable): Throwable =
        if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
      assert(e.isInstanceOf[KinesisClientException] ||
        rootCause(e).isInstanceOf[KinesisClientException] ||
        e.getMessage.contains("AccessDenied"),
        s"unsigned request must be rejected, got $e")

      val signed = read(srv,
        "accessKey" -> "AKIDEXAMPLE",
        "secretKey" -> "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        "region" -> "us-east-1")
      assert(signed.count() == 15)
      val auth = srv.lastHeaders("authorization")
      assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/"))
      assert(auth.contains("/us-east-1/kinesis/aws4_request"))
      assert(auth.contains("x-amz-target"), "the operation header is signed")
    }
  }

  test("client retries transient GetRecords failures") {
    withStub(new StubKinesisServer(shardCount = 1)) { srv =>
      loadFixture(srv)
      srv.failNextGetRecords = 2
      assert(read(srv).count() == 15)
    }
  }

  test("client surfaces 4xx without retry") {
    withStub(new StubKinesisServer()) { srv =>
      val client = new KinesisHttpClient(srv.endpoint)
      val calls0 = srv.getRecordsCalls.get()
      intercept[KinesisClientException] {
        client.getShardIterator(srv.streamName, "no-such-shard", "TRIM_HORIZON")
      }
      assert(srv.getRecordsCalls.get() == calls0) // no retry storm
    }
  }

  test("empty-poll patience exhaustion fails the task, records no progress") {
    // A wedged endpoint: the iterator "advances" but every GetRecords
    // page is empty while MillisBehindLatest stays > 0 — the shape a
    // real stream shows while traversing a sparse region. Treating it
    // as a clean drain would record progress past unread in-window
    // records (permanent loss via the next batch's arrival > fromTs
    // filter); the reader must instead throw, leaving no progress
    // file, so a task retry re-reads from the last offset.
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import java.nio.charset.StandardCharsets.UTF_8
    val srv = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val op = Option(ex.getRequestHeaders.getFirst("X-Amz-Target"))
          .getOrElse("")
        ex.getRequestBody.readAllBytes()
        val json =
          if (op.endsWith("GetShardIterator")) """{"ShardIterator":"it-0"}"""
          else
            """{"Records":[],"NextShardIterator":"it-n","MillisBehindLatest":5000}"""
        val bytes = json.getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.1")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    })
    srv.start()
    try {
      val progressDir = Files.createTempDirectory("kinesis-patience")
      val config = KinesisSourceConfig(
        endpoint = s"http://127.0.0.1:${srv.getAddress.getPort}/",
        stream = "s", region = "us-east-1",
        accessKey = None, secretKey = None, sessionToken = None,
        startTsMs = 0L, closeDelayMs = 0L, maxAdvanceMsPerTrigger = None,
        getRecordsLimit = 100)
      val part = KinesisShardPartition(
        "shardId-000000000000", None, 0L, Long.MaxValue)
      val reader = new KinesisShardReader(config, part,
        new org.apache.spark.sql.types.StructType(), Array.empty,
        Some(progressDir.toString))
      val e = intercept[java.io.IOException] {
        while (reader.next()) reader.get()
      }
      assert(e.getMessage.contains("empty"), s"got: ${e.getMessage}")
      reader.close()
      assert(KinesisProgressFiles.readAll(progressDir).isEmpty,
        "a patience failure must not record progress")
    } finally srv.stop(0)
  }

  // ---------------------------------------------------------------
  // resharding lineage (round 15): split/merge mid-stream,
  // parent-before-children consumption, exactly-once restarts
  // across the boundary, and the batch read's invariance
  // ---------------------------------------------------------------

  private def trip(i: Int): String =
    s"""{"type": "trip", "trip_id": $i, "total_amount": 1.0}"""

  private def runOnce(srv: StubKinesisServer, cp: String,
      sink: String): Seq[Long] = {
    val q = StreamingTaxi.writer(
        readStream(srv).select(col("trip_id")), cp,
        Trigger.AvailableNow())
      .format("parquet").option("path", sink).start()
    q.awaitTermination()
    spark.read.parquet(sink).collect().map(_.getLong(0)).sorted.toSeq
  }

  private def latestOffsetJson(cp: String): String = {
    val files = Files.list(Paths.get(cp, "offsets"))
    val latest = try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.toSeq
        .filter(_.getFileName.toString.forall(_.isDigit))
        .maxBy(_.getFileName.toString.toInt)
    } finally files.close()
    new String(Files.readAllBytes(latest), "UTF-8")
  }

  test("reshard SPLIT: children wait for the parent's SHARD_END, " +
      "restarts across the boundary lose nothing and duplicate " +
      "nothing, and the offset WAL carries the lineage") {
    withStub(new StubKinesisServer(shardCount = 2)) { srv =>
      val base = System.currentTimeMillis() - 60000
      (1 to 6).foreach(i => srv.putRecord(trip(i),
        shard = Some(i % 2), arrivalMs = Some(base + i)))
      val cp = Files.createTempDirectory("kcp-split").toString
      val sink = Files.createTempDirectory("ksink-split").toString
      assert(runOnce(srv, cp, sink) == (1L to 6L))

      // mid-stream reshard: split shard 0; its successors take the
      // new records while the query is down
      val parent = srv.shardIds(0)
      val (c1, c2) = srv.splitShard(parent)
      val t2 = System.currentTimeMillis() - 30000
      (7 to 9).foreach(i => srv.putRecordToShard(c1,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(t2 + i)))
      (10 to 12).foreach(i => srv.putRecordToShard(c2,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(t2 + i)))

      // restart 1: drains the parent to SHARD_END (the children may
      // stay deferred this run — lineage gating, not loss)
      val got2 = runOnce(srv, cp, sink)
      assert(got2.toSet.subsetOf((1L to 12L).toSet))
      assert((1L to 6L).forall(got2.contains))
      assert(got2.distinct == got2, s"duplicates after restart: $got2")

      // restart 2: parent is in the WAL's ended set -> children
      // admitted, their full backlog read exactly once
      val got3 = runOnce(srv, cp, sink)
      assert(got3 == (1L to 12L), s"after reshard read $got3")
      val off = latestOffsetJson(cp)
      assert(off.contains("\"ended\"") && off.contains(parent),
        s"offset WAL must carry the reshard lineage: $off")

      // restart 3: replay determinism — nothing new, nothing twice
      assert(runOnce(srv, cp, sink) == (1L to 12L))
    }
  }

  test("reshard MERGE: the child waits for BOTH parents, then " +
      "reads its backlog exactly once") {
    withStub(new StubKinesisServer(shardCount = 2)) { srv =>
      val base = System.currentTimeMillis() - 60000
      (1 to 4).foreach(i => srv.putRecord(trip(i),
        shard = Some(i % 2), arrivalMs = Some(base + i)))
      val cp = Files.createTempDirectory("kcp-merge").toString
      val sink = Files.createTempDirectory("ksink-merge").toString
      assert(runOnce(srv, cp, sink) == (1L to 4L))

      val child = srv.mergeShards(srv.shardIds(0), srv.shardIds(1))
      val t2 = System.currentTimeMillis() - 30000
      (5 to 8).foreach(i => srv.putRecordToShard(child,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(t2 + i)))

      runOnce(srv, cp, sink) // drains both parents to SHARD_END
      val got = runOnce(srv, cp, sink)
      assert(got == (1L to 8L), s"after merge read $got")
      val off = latestOffsetJson(cp)
      assert(off.contains(srv.shardIds(0)) &&
        off.contains(srv.shardIds(1)),
        s"both merge parents must be in the ended lineage: $off")
      assert(runOnce(srv, cp, sink) == (1L to 8L))
    }
  }

  test("a BATCH read over a resharded stream still returns every " +
      "record exactly once (closed parents are read too — the q82 " +
      "oracle is reshard-invariant)") {
    withStub(new StubKinesisServer(shardCount = 2)) { srv =>
      val base = System.currentTimeMillis() - 60000
      (1 to 6).foreach(i => srv.putRecord(trip(i),
        shard = Some(i % 2), arrivalMs = Some(base + i)))
      val (c1, _) = srv.splitShard(srv.shardIds(0))
      (7 to 9).foreach(i => srv.putRecordToShard(c1,
        trip(i).getBytes("UTF-8")))
      val got = read(srv).select("trip_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == (1L to 9L), s"batch read over reshard: $got")
      // one partition per LISTED shard: 2 roots + 2 children
      assert(read(srv).rdd.getNumPartitions == 4)
    }
  }

  test("a SINGLE AvailableNow run delivers EVERYTHING across a " +
      "reshard: newly-ended parents unlock their children within " +
      "the same run (r16 fix — the fixed-target closedTs guard was " +
      "silently dropping all child-shard data, found by the reshard " +
      "bench row)") {
    withStub(new StubKinesisServer(shardCount = 2)) { srv =>
      val base = System.currentTimeMillis() - 60000
      (1 to 6).foreach(i => srv.putRecord(trip(i),
        shard = Some(i % 2), arrivalMs = Some(base + i)))
      // reshard BEFORE the query ever starts: one fresh AvailableNow
      // run must read parents to SHARD_END and then, with the
      // prepared target's closedTs unchanged, still plan the
      // children and drain their backlog
      val (c1, c2) = srv.splitShard(srv.shardIds(0))
      val t2 = System.currentTimeMillis() - 30000
      (7 to 9).foreach(i => srv.putRecordToShard(c1,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(t2 + i)))
      (10 to 12).foreach(i => srv.putRecordToShard(c2,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(t2 + i)))
      val cp = Files.createTempDirectory("kcp-one").toString
      val sink = Files.createTempDirectory("ksink-one").toString
      val got = runOnce(srv, cp, sink)
      assert(got == (1L to 12L),
        s"one AvailableNow run across a reshard must be complete: $got")
      // and stay exactly-once on replay
      assert(runOnce(srv, cp, sink) == (1L to 12L))
    }
  }

  test("DEEP reshard lineage (r17): a 3-generation chain " +
      "(split -> merge -> split) built BEFORE the query starts is " +
      "drained COMPLETELY by one AvailableNow run — the " +
      "children-unlock batch must cascade transitively, one " +
      "generation per planned batch, not stop at depth 1") {
    withStub(new StubKinesisServer(shardCount = 2)) { srv =>
      val base = System.currentTimeMillis() - 90000
      (1 to 4).foreach(i => srv.putRecord(trip(i),
        shard = Some(i % 2), arrivalMs = Some(base + i)))
      // gen 1: split root 0 into (a, b), records 5..8
      val (a, b) = srv.splitShard(srv.shardIds(0))
      (5 to 6).foreach(i => srv.putRecordToShard(a,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(base + 1000 + i)))
      (7 to 8).foreach(i => srv.putRecordToShard(b,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(base + 1000 + i)))
      // gen 2: merge the split's own children into c, records 9..10
      val c = srv.mergeShards(a, b)
      (9 to 10).foreach(i => srv.putRecordToShard(c,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(base + 2000 + i)))
      // gen 3: split the merge child into (d, e), records 11..14
      val (d, e) = srv.splitShard(c)
      (11 to 12).foreach(i => srv.putRecordToShard(d,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(base + 3000 + i)))
      (13 to 14).foreach(i => srv.putRecordToShard(e,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(base + 3000 + i)))
      val cp = Files.createTempDirectory("kcp-deep1").toString
      val sink = Files.createTempDirectory("ksink-deep1").toString
      val got = runOnce(srv, cp, sink)
      assert(got == (1L to 14L),
        s"one AvailableNow run across 3 generations: $got")
      // replay determinism across the whole chain
      assert(runOnce(srv, cp, sink) == (1L to 14L))
      // the WAL's ended set carries every closed ancestor
      val off = latestOffsetJson(cp)
      Seq(srv.shardIds(0), a, b, c).foreach(id =>
        assert(off.contains(id),
          s"ended lineage must carry $id: $off"))
    }
  }

  test("DEEP reshard lineage (r17): restarts placed BETWEEN " +
      "generations — each AvailableNow run ends the newly-closed " +
      "ancestors AND drains their descendants in the same run, " +
      "exactly-once row accounting pinned at every boundary") {
    withStub(new StubKinesisServer(shardCount = 2)) { srv =>
      val base = System.currentTimeMillis() - 90000
      (1 to 4).foreach(i => srv.putRecord(trip(i),
        shard = Some(i % 2), arrivalMs = Some(base + i)))
      val cp = Files.createTempDirectory("kcp-deep2").toString
      val sink = Files.createTempDirectory("ksink-deep2").toString
      assert(runOnce(srv, cp, sink) == (1L to 4L))
      // generation 1 happens while the query is DOWN; the next run
      // must end the root and drain (a, b) in one go
      val (a, b) = srv.splitShard(srv.shardIds(0))
      (5 to 6).foreach(i => srv.putRecordToShard(a,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(base + 1000 + i)))
      (7 to 8).foreach(i => srv.putRecordToShard(b,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(base + 1000 + i)))
      assert(runOnce(srv, cp, sink) == (1L to 8L),
        "gen-1 restart must deliver the split children's backlog")
      // generation 2: merge both gen-1 children (the child waits for
      // BOTH parents, whose SHARD_END is itself discovered this run)
      val c = srv.mergeShards(a, b)
      (9 to 10).foreach(i => srv.putRecordToShard(c,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(base + 2000 + i)))
      assert(runOnce(srv, cp, sink) == (1L to 10L),
        "gen-2 restart must deliver the merge child's backlog")
      // generation 3: split the merge child again
      val (d, e) = srv.splitShard(c)
      (11 to 12).foreach(i => srv.putRecordToShard(d,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(base + 3000 + i)))
      (13 to 14).foreach(i => srv.putRecordToShard(e,
        trip(i).getBytes("UTF-8"), arrivalMs = Some(base + 3000 + i)))
      assert(runOnce(srv, cp, sink) == (1L to 14L),
        "gen-3 restart must deliver the deepest generation")
      // the degenerate same-offset replay (the case the r16 bug's
      // spec gap left unpinned): nothing new, nothing twice
      assert(runOnce(srv, cp, sink) == (1L to 14L))
    }
  }

  test("progress files key by the raw shard id, not the sanitized filename") {
    val dir = Files.createTempDirectory("kinesis-progress")
    // a shard name with characters outside [A-Za-z0-9._-]: the
    // filename is sanitized but lookups use the raw id
    val rawId = "custom:shard/7"
    KinesisProgressFiles.write(dir.toString, rawId,
      ShardProgress("seq-41", 1234L, 0L))
    val m = KinesisProgressFiles.readAll(dir)
    assert(m.keySet == Set(rawId))
    assert(m(rawId) == ShardProgress("seq-41", 1234L, 0L))
  }
}
