package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import graft.io.{KinesisHttpClient, SigV4Signer}
import graft.model.Events
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 connector reading the taxi wire format over the
  * KINESIS PROTOCOL — the ListShards / GetShardIterator / GetRecords
  * HTTP subset via [[graft.io.KinesisHttpClient]], SigV4-signed when
  * credentials are given. This closes the reference's consumer
  * registration (ProcessTaxiStream.java:73-84) at the protocol level:
  * where the file-backed [[WireTaxiSource]] models shards as files,
  * this source speaks to a Kinesis-shaped endpoint record for record.
  *
  *   spark.read.format("kinesis-taxi")
  *     .option("endpoint", "http://…").option("stream", "taxi").load()
  *
  * Options: `endpoint` (required), `stream` (required), `region`
  * (default us-east-1), `accessKey`/`secretKey`/`sessionToken`
  * (SigV4 signing when access+secret present), `startTsMs` (streaming
  * start position, default 0 = TRIM_HORIZON), `closeDelayMs` (clock
  * safety margin subtracted from each batch's closing timestamp; a
  * 1 ms floor is always enforced so `closedTs` is strictly in the
  * past at planning time — against a real service whose arrival
  * stamps become visible asynchronously, set it ≥ the service's
  * ingestion-visibility bound), `maxAdvanceMsPerTrigger` (admission
  * control: max
  * stream-time a micro-batch may cover), `getRecordsLimit` (records
  * per GetRecords call, default 10000).
  *
  * === Offset model (exactly-once under the replay contract) ===
  *
  * Kinesis's public API has no "tip sequence number" query, so a
  * micro-batch end offset cannot name the sequence numbers it will
  * reach without reading the data on the driver. The known workaround
  * of letting tasks read "up to a limit past the start" and recording
  * what they reached violates Structured Streaming's contract that an
  * offset pair deterministically names its records (a replayed batch
  * could see a bigger tip). This source closes batches by ARRIVAL
  * TIME instead:
  *
  *  - [[KinesisSourceOffset]] = `closedTsMs` + per-shard
  *    `shardSeqs`. Batch (o1, o2] contains, per shard, the records
  *    with `approximateArrivalTimestamp` in (o1.closedTs,
  *    o2.closedTs]. Arrival timestamps are service-assigned at
  *    ingestion, immutable, and monotone per shard, and `closedTs` is
  *    always in the past at planning time — so the record set named
  *    by an offset pair can never grow or shrink on replay, which is
  *    the whole contract.
  *  - `shardSeqs` carries the checkpoint's SEQUENCE-NUMBER positions:
  *    end.shardSeqs[shard] is the last sequence number ingested at or
  *    before start.closedTs (one-batch lag by construction), written
  *    into the offset WAL at planning time. Readers resume with an
  *    `AFTER_SEQUENCE_NUMBER` iterator — exact, no timestamp
  *    ambiguity; a shard absent from the map (first batch, or lost
  *    progress file) falls back to `AT_TIMESTAMP`(start.closedTs+1),
  *    which names the same position because every record at or before
  *    start.closedTs was readable when that earlier batch ran.
  *  - Tasks report their reached position (seq, arrival ts, last
  *    GetRecords `MillisBehindLatest`) through per-shard progress
  *    files under `<checkpoint>/kinesis-progress`, written atomically
  *    ONLY on a successful drain — a failed attempt leaves no partial
  *    position, and the files are only consulted when planning the
  *    batch after the current one committed. (The same
  *    checkpoint-side side-log pattern as [[WireTaxiMicroBatchStream]]'s
  *    discovery log.)
  *  - Admission control is expressed IN the offset: `closedTs`
  *    advances at most `maxAdvanceMsPerTrigger` stream-ms per
  *    trigger, so a throttled batch still ingests every record its
  *    offsets name — a record-count cap could not (records past the
  *    cap but before the closed timestamp would fall outside every
  *    batch).
  *
  * === Scale design ===
  *
  *  - one InputPartition per shard — the Kinesis parallelism unit,
  *    exactly the reference's (a production stream is many shards);
  *  - the driver never touches record payloads: planning is
  *    ListShards + arithmetic on timestamps; all GetRecords traffic
  *    is executor-side;
  *  - column pruning reaches the payload parser and pushed filters
  *    drop records before projection, both shared with the file-wire
  *    source ([[WireTaxiFilters]]);
  *  - RESHARDING (parent/child shard lineage, round 15): the shard
  *    set is re-listed per trigger WITH lineage
  *    (ParentShardId/AdjacentParentShardId + EndingSequenceNumber —
  *    [[graft.io.ShardInfo]]); a child shard is planned only once
  *    every parent is in the offset's `ended` set (read through
  *    SHARD_END — the null-NextShardIterator signal — with no
  *    in-window skip), so parent records always commit before the
  *    first child batch. A child's first partition reads
  *    TRIM_HORIZON over (0, closedTs] — it was never read while
  *    deferred, so the full-window read is exactly-once by
  *    construction, and the `ended`/`shardSeqs` pair is WAL-pinned
  *    so a replayed batch plans byte-identical partitions across
  *    the reshard boundary. Batch scans read ALL listed shards
  *    (closed parents included — their records live nowhere else),
  *    so the q82 oracle is unchanged by a reshard.
  */
class KinesisTaxiSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "kinesis-taxi"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Events.wireSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KinesisTaxiTable(KinesisSourceConfig(
      new CaseInsensitiveStringMap(properties)), schema)
}

final case class KinesisSourceConfig(
    endpoint: String,
    stream: String,
    region: String,
    accessKey: Option[String],
    secretKey: Option[String],
    sessionToken: Option[String],
    startTsMs: Long,
    closeDelayMs: Long,
    maxAdvanceMsPerTrigger: Option[Long],
    getRecordsLimit: Int) {

  def signer: Option[SigV4Signer] = for {
    ak <- accessKey
    sk <- secretKey
  } yield SigV4Signer(ak, sk, region, "kinesis", sessionToken)

  def client(): KinesisHttpClient = new KinesisHttpClient(endpoint, signer)
}

object KinesisSourceConfig {
  def apply(options: CaseInsensitiveStringMap): KinesisSourceConfig = {
    def req(k: String): String = Option(options.get(k)).getOrElse(
      throw new IllegalArgumentException(s"kinesis-taxi requires option '$k'"))
    KinesisSourceConfig(
      endpoint = req("endpoint"),
      stream = req("stream"),
      region = Option(options.get("region")).getOrElse("us-east-1"),
      accessKey = Option(options.get("accessKey")),
      secretKey = Option(options.get("secretKey")),
      sessionToken = Option(options.get("sessionToken")),
      startTsMs = Option(options.get("startTsMs")).map(_.toLong).getOrElse(0L),
      closeDelayMs =
        Option(options.get("closeDelayMs")).map(_.toLong).getOrElse(0L),
      maxAdvanceMsPerTrigger =
        Option(options.get("maxAdvanceMsPerTrigger")).map(_.toLong),
      getRecordsLimit =
        Option(options.get("getRecordsLimit")).map(_.toInt).getOrElse(10000))
  }
}

class KinesisTaxiTable(config: KinesisSourceConfig, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"kinesis-taxi:${config.stream}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KinesisTaxiScanBuilder(config, schema)
}

class KinesisTaxiScanBuilder(config: KinesisSourceConfig, tableSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(WireTaxiFilters.supported)
    filters // all residual: Spark re-evaluates (safe double-check)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new KinesisTaxiScan(config, required, pushed)
}

class KinesisTaxiScan(config: KinesisSourceConfig, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"KinesisTaxiScan stream=${config.stream}, " +
      s"ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def toBatch: Batch = this

  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new KinesisMicroBatchStream(config, required, pushed, checkpointLocation)

  /** Batch scan: one partition per shard, drained TRIM_HORIZON → tip. */
  override def planInputPartitions(): Array[InputPartition] =
    config.client().listShards(config.stream).map(shard =>
      KinesisShardPartition(shard, fromSeq = None, fromTsMs = 0L,
        toTsMs = Long.MaxValue): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new KinesisReaderFactory(config, required, pushed, progressDir = None)
}

/** Stream offset: closing arrival-timestamp, per-shard
  * sequence-number positions, and the RESHARD LINEAGE — `ended` is
  * the set of shards read through their SHARD_END (closed by a
  * split/merge and fully consumed); a child shard only becomes
  * readable once every parent is in it, so parent records always
  * commit before the first child batch (the ordering contract a
  * reshard is supposed to preserve). See the source scaladoc. */
final case class KinesisSourceOffset(
    closedTsMs: Long, shardSeqs: Map[String, String],
    ended: Set[String] = Set.empty) extends Offset {
  override def json(): String = {
    val node = JsonNodeFactory.instance.objectNode()
    node.put("closedTsMs", closedTsMs)
    val seqs = node.putObject("shardSeqs")
    shardSeqs.toSeq.sortBy(_._1).foreach { case (k, v) => seqs.put(k, v) }
    if (ended.nonEmpty) {
      val arr = node.putArray("ended")
      ended.toSeq.sorted.foreach(arr.add)
    }
    node.toString
  }
}

object KinesisSourceOffset {
  private val mapper = new ObjectMapper()
  def fromJson(json: String): KinesisSourceOffset = {
    val n = mapper.readTree(json)
    val seqs = Map.newBuilder[String, String]
    val obj = n.get("shardSeqs")
    if (obj != null) obj.properties().asScala.foreach(e =>
      seqs += e.getKey -> e.getValue.asText())
    val ended = Set.newBuilder[String]
    val arr = n.get("ended") // absent in pre-reshard checkpoints
    if (arr != null && arr.isArray) arr.forEach(e => ended += e.asText())
    KinesisSourceOffset(n.get("closedTsMs").asLong(), seqs.result(),
      ended.result())
  }

  /** Numeric order for decimal-digit sequence-number strings of any
    * length (longer wins; same length lexicographic). */
  def seqGreater(a: String, b: String): Boolean =
    a.length > b.length || (a.length == b.length && a > b)
}

class KinesisMicroBatchStream(config: KinesisSourceConfig,
    required: StructType, pushed: Array[Filter], checkpointLocation: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow
    with org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics {

  private val progressDir: java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(
      checkpointLocation.stripPrefix("file:")).resolve("kinesis-progress")
    java.nio.file.Files.createDirectories(dir)
    dir
  }

  @transient private lazy val client = config.client()

  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(closeTarget())

  private def now(): Long = System.currentTimeMillis()

  /** Closing timestamp for a batch planned now. The 1 ms floor keeps
    * `closedTs` STRICTLY in the past at planning time: a record that
    * lands in the planning millisecond gets an arrival stamp ==
    * now(), and with closedTs == now() it would be excluded by this
    * batch's readers-that-already-drained AND by the next batch's
    * `arrival > fromTs` filter — lost forever. With closedTs < now(),
    * every record the offset names was already stored (arrival
    * assignment and visibility are atomic at the service) before any
    * reader of this batch can issue its first GetRecords.
    *
    * CLOCK SKEW: the comparison is driver wall-clock vs
    * SERVICE-assigned arrival timestamps. The strictly-in-the-past
    * invariant therefore only holds end-to-end when the service's
    * clock does not run ahead of the driver's by more than
    * `closeDelayMs`. If it does, records stamped "in the future"
    * relative to the driver sit past every batch's closedTs until the
    * skew is covered — they are not lost (closedTs is monotone and
    * the next batches sweep them up) but they are delayed, and a
    * skew larger than the ingestion-visibility argument above assumes
    * would break the no-loss reasoning at the boundary. Against a
    * real (non-loopback) endpoint, set `closeDelayMs` to a few
    * hundred ms — comfortably above NTP-disciplined skew plus
    * ingestion-visibility lag. The 0 default (→ 1 ms floor) is tuned
    * for the in-process stub, where the "service" shares the driver's
    * clock and skew is structurally zero. */
  private def closeTarget(): Long = now() - math.max(1L, config.closeDelayMs)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): Offset =
    KinesisSourceOffset(config.startTsMs, Map.empty)

  override def latestOffset(): Offset =
    latestOffset(initialOffset(), ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[KinesisSourceOffset]
    val target = availableNowTarget.getOrElse(closeTarget())
    // admission control in the offset: advance at most
    // maxAdvanceMsPerTrigger of stream-time per trigger. The very
    // first hop from the 0 sentinel (TRIM_HORIZON start) is uncapped —
    // capping from the epoch would spin empty batches for decades.
    val closed = config.maxAdvanceMsPerTrigger match {
      case Some(cap) if s.closedTsMs > 0 =>
        math.min(target, s.closedTsMs + cap)
      case _ => target
    }
    val (seqs, ended) = mergeProgress(s.shardSeqs, s.ended)
    KinesisSourceOffset(math.max(closed, s.closedTsMs), seqs, ended)
  }

  override def reportLatestOffset(): Offset =
    KinesisSourceOffset(closeTarget(), Map.empty)

  override def deserializeOffset(json: String): Offset =
    KinesisSourceOffset.fromJson(json)

  /** Fold completed-batch task positions into the per-shard
    * sequence-number map (newest sequence wins; a missing or stale
    * progress file keeps the prior position — correct, because a
    * shard with no records in the prior batch kept its position)
    * and the ENDED set (a shard whose reader walked to SHARD_END
    * stays ended forever). */
  private def mergeProgress(prior: Map[String, String],
      priorEnded: Set[String]): (Map[String, String], Set[String]) = {
    val merged = collection.mutable.Map(prior.toSeq: _*)
    val ended = collection.mutable.Set(priorEnded.toSeq: _*)
    KinesisProgressFiles.readAll(progressDir).foreach { case (shard, p) =>
      if (p.lastSeq.nonEmpty &&
        merged.get(shard).forall(KinesisSourceOffset.seqGreater(p.lastSeq, _)))
        merged(shard) = p.lastSeq
      if (p.shardEnd) ended += shard
    }
    (merged.toMap, ended.toSet)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KinesisSourceOffset]
    val e = end.asInstanceOf[KinesisSourceOffset]
    // A batch does real work when stream-time advanced OR when a
    // parent newly ENDED (its children become readable). The second
    // disjunct is what makes Trigger.AvailableNow complete across a
    // reshard: the prepared target pins closedTs, so the
    // children-unlocking batch arrives with e.closedTs == s.closedTs
    // and the old `<=` guard silently dropped every child shard's
    // data (found by the r16 reshard bench row: 18k of 96k events
    // never delivered). Plan stays a pure function of (start, end) —
    // WAL replay is byte-identical.
    if (e.closedTsMs <= s.closedTsMs &&
      e.ended.subsetOf(s.ended)) return Array.empty
    // end.shardSeqs / end.ended name the positions reached at
    // start.closedTs (the one-batch lag in the offset model); both
    // are WAL-pinned, so replay plans byte-identical partitions.
    //
    // Reshard lineage gating: a CHILD shard is planned only once
    // every parent is ENDED (read through SHARD_END) or expired out
    // of the listing — consume the parent to its end sequence, THEN
    // the children. A deferred child was never read, so its first
    // partition reads TRIM_HORIZON with the full (0, toTs] window:
    // records that arrived while it waited are picked up, none twice.
    val infos = client.listShardInfos(config.stream)
    val listed = infos.map(_.id).toSet
    infos.flatMap { i =>
      if (e.ended.contains(i.id)) None // fully consumed, stay done
      else {
        val parentsDone = i.parents.forall(p =>
          e.ended.contains(p) || !listed.contains(p))
        if (!parentsDone) None
        else if (e.shardSeqs.contains(i.id) || i.parents.isEmpty)
          Some(KinesisShardPartition(i.id,
            fromSeq = e.shardSeqs.get(i.id),
            fromTsMs = s.closedTsMs,
            toTsMs = e.closedTsMs): InputPartition)
        else // first read of a child: everything it has, up to toTs
          Some(KinesisShardPartition(i.id, fromSeq = None,
            fromTsMs = 0L, toTsMs = e.closedTsMs): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KinesisReaderFactory(config, required, pushed,
      progressDir = Some(progressDir.toString))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Kinesis-native lag metrics, surfaced per batch in
    * `StreamingQueryProgress.sources[].metrics` (the engine analogue
    * of the reference's GetRecords.IteratorAgeMilliseconds SLO,
    * cfn-templates/flink-refarch-infrastructure.yml:355-369):
    *  - `millisBehindLatest`: max of the REAL GetRecords lag the shard
    *    readers last reported — how far the slowest shard's iterator
    *    trails the stream tip;
    *  - `closedLagMs`: now − the consumed offset's closing timestamp —
    *    how much admitted stream-time the query has not yet caught up
    *    to (grows while `maxAdvanceMsPerTrigger` throttles below the
    *    publish rate). */
  override def metrics(latestConsumedOffset: java.util.Optional[Offset])
      : java.util.Map[String, String] = {
    val progress = KinesisProgressFiles.readAll(progressDir)
    val behind =
      if (progress.isEmpty) 0L else progress.values.map(_.millisBehind).max
    val lag =
      if (latestConsumedOffset.isPresent)
        math.max(0L, now() - latestConsumedOffset.get
          .asInstanceOf[KinesisSourceOffset].closedTsMs)
      else 0L
    java.util.Map.of(
      "millisBehindLatest", behind.toString,
      "closedLagMs", lag.toString,
      "shards", progress.size.toString)
  }
}

final case class KinesisShardPartition(
    shard: String,
    fromSeq: Option[String],
    fromTsMs: Long,
    toTsMs: Long) extends InputPartition

final case class ShardProgress(lastSeq: String, lastTsMs: Long,
    millisBehind: Long, shardEnd: Boolean = false)

/** Atomic per-shard progress files under the checkpoint — task-side
  * writer, driver-side reader (the executor/driver share the
  * checkpoint filesystem, the same assumption every Structured
  * Streaming state backend makes). */
object KinesisProgressFiles {
  def write(dir: String, shard: String, p: ShardProgress): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val safe = shard.replaceAll("[^A-Za-z0-9._-]", "_")
    val tmp = d.resolve(s".$safe.tmp")
    // the RAW shard id travels inside the file (4th field): the
    // filename is sanitized for the filesystem, so keying the read
    // side by filename would never match a shard id containing a
    // character outside [A-Za-z0-9._-] — every batch would silently
    // degrade to the AT_TIMESTAMP fallback for that shard
    java.nio.file.Files.write(tmp,
      (s"${p.lastSeq}\t${p.lastTsMs}\t${p.millisBehind}\t$shard\t" +
        (if (p.shardEnd) "1" else "0"))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, d.resolve(safe),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def readAll(dir: java.nio.file.Path): Map[String, ShardProgress] =
    if (!java.nio.file.Files.isDirectory(dir)) Map.empty
    else {
      val listing = java.nio.file.Files.list(dir)
      try listing.iterator().asScala
        .filter(f => !f.getFileName.toString.startsWith("."))
        .flatMap { f =>
          try {
            val parts = new String(java.nio.file.Files.readAllBytes(f),
              java.nio.charset.StandardCharsets.UTF_8).split("\t", -1)
            // key by the raw shard id stored in the file (field 4);
            // field 5 is the SHARD_END flag (reshard lineage);
            // 3-/4-field files from older checkpoints stay readable
            if (parts.length == 5)
              Some(parts(3) -> ShardProgress(parts(0),
                parts(1).toLong, parts(2).toLong, parts(4) == "1"))
            else if (parts.length == 4)
              Some(parts(3) ->
                ShardProgress(parts(0), parts(1).toLong, parts(2).toLong))
            else if (parts.length == 3)
              Some(f.getFileName.toString ->
                ShardProgress(parts(0), parts(1).toLong, parts(2).toLong))
            else None
          } catch { case _: Exception => None } // racing writer
        }.toMap
      finally listing.close()
    }
}

class KinesisReaderFactory(config: KinesisSourceConfig, required: StructType,
    pushed: Array[Filter], progressDir: Option[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KinesisShardReader(config,
      partition.asInstanceOf[KinesisShardPartition], required, pushed,
      progressDir)
}

/** Reads one shard's slice of a batch over the Kinesis protocol:
  * position an iterator (AFTER_SEQUENCE_NUMBER when the offset names
  * the exact position, AT_TIMESTAMP/TRIM_HORIZON otherwise), loop
  * GetRecords, keep records with arrival ts inside (fromTs, toTs],
  * split each record's payload into wire-JSON lines and parse them
  * through the shared [[WireTaxiFilters]] path (pushed filters before
  * projection, pruned schema straight to InternalRow). */
class KinesisShardReader(config: KinesisSourceConfig,
    part: KinesisShardPartition, required: StructType, pushed: Array[Filter],
    progressDir: Option[String]) extends PartitionReader[InternalRow] {

  private val client = config.client()
  private val mapper = new ObjectMapper()

  private var iterator: Option[String] = Some(part.fromSeq match {
    case Some(seq) => client.getShardIterator(config.stream, part.shard,
      "AFTER_SEQUENCE_NUMBER", startingSequenceNumber = Some(seq))
    case None if part.fromTsMs > 0 => client.getShardIterator(config.stream,
      part.shard, "AT_TIMESTAMP", timestampMs = Some(part.fromTsMs + 1))
    case None =>
      client.getShardIterator(config.stream, part.shard, "TRIM_HORIZON")
  })

  private var buffered: Iterator[InternalRow] = Iterator.empty
  private var finished = false
  private var emptyPolls = 0
  private var lastSeq: String = ""
  private var lastTs: Long = 0L
  private var lastBehind: Long = 0L
  private var drained = false // set only on clean end-of-slice
  private var sawEnd = false  // reached SHARD_END with no in-window skip

  override def next(): Boolean = {
    while (!buffered.hasNext) {
      if (finished) { drained = true; return false }
      fetch()
    }
    true
  }

  override def get(): InternalRow = buffered.next()

  private def fetch(): Unit = iterator match {
    case None => finished = true
    case Some(it) =>
      val gr = client.getRecords(it, config.getRecordsLimit)
      lastBehind = gr.millisBehindLatest
      val keep = Vector.newBuilder[InternalRow]
      var pastEnd = false
      gr.records.foreach { r =>
        if (r.approximateArrivalMs > part.toTsMs) pastEnd = true
        else if (r.approximateArrivalMs > part.fromTsMs) {
          lastSeq = r.sequenceNumber
          lastTs = r.approximateArrivalMs
          keep ++= parseLines(r.data)
        }
        // records at or before fromTs can only appear on the
        // AT_TIMESTAMP fallback's same-ms boundary; they were
        // ingested by the prior batch and are skipped
      }
      buffered = keep.result().iterator
      iterator = gr.nextShardIterator
      // SHARD_END (null iterator) counts as "fully consumed" ONLY if
      // no record beyond this batch's window was skipped on the way
      // — otherwise a later batch still owes this shard a read, and
      // marking it ended would silently lose that tail
      if (gr.nextShardIterator.isEmpty && !pastEnd) sawEnd = true
      val atTip = gr.records.isEmpty && gr.millisBehindLatest <= 0
      emptyPolls = if (gr.records.isEmpty) emptyPolls + 1 else 0
      // clean drain ONLY on: past the batch's closing timestamp; shard
      // closed; or at the tip (monotone arrival ⇒ nothing ≤ toTs can
      // still appear). Empty-poll patience is a liveness guard, not a
      // drain condition: against a real endpoint, empty GetRecords
      // pages with millisBehindLatest > 0 are routine while an
      // iterator traverses a sparse region, and treating them as a
      // drain would record progress past unread in-window records —
      // silent loss the next batch's arrival > fromTs filter makes
      // permanent. So exhaustion THROWS: the task fails without
      // recording progress (close() sees drained=false), Spark
      // retries, and the position is re-read from the last offset.
      if (pastEnd || iterator.isEmpty || atTip)
        finished = true
      else if (emptyPolls >= KinesisShardReader.EmptyPollPatience)
        throw new java.io.IOException(
          s"kinesis shard ${part.shard}: ${emptyPolls} consecutive empty " +
          s"GetRecords pages with millisBehindLatest=${gr.millisBehindLatest}" +
          " — iterator made no progress toward the batch's closing " +
          "timestamp; failing the task (no progress recorded) rather " +
          "than risk dropping in-window records")
  }

  /** Wire payload → rows, KPL-aware: an aggregated record (magic
    * `F3 89 9A C2`) de-aggregates into its user records first — a
    * real KPL stream hands the source packs it must unpack or lose
    * data. A pack with a failing MD5 / malformed protobuf is skipped
    * WITH a warning (the published de-aggregation contract); plain
    * records pass through untouched. */
  private def parseLines(data: Array[Byte]): Seq[InternalRow] =
    if (graft.io.KplAggregation.isAggregated(data))
      graft.io.KplAggregation.deaggregate(data) match {
        case Right(users) => users.flatMap(u => parsePlainLines(u.data))
        case Left(reason) =>
          System.err.println(
            s"[kinesis] skipping corrupt KPL aggregated record " +
            s"(shard ${part.shard}): $reason")
          Seq.empty
      }
    else parsePlainLines(data)

  private def parsePlainLines(data: Array[Byte]): Seq[InternalRow] = {
    val text = new String(data, java.nio.charset.StandardCharsets.UTF_8)
    text.split("\n").toSeq.filter(_.nonEmpty).flatMap { line =>
      val node =
        try {
          val n = mapper.readTree(line)
          if (n != null && n.isObject) Some(n) else None
        } catch { case _: Exception => None } // malformed: skip (R1)
      node.filter(n => pushed.forall(WireTaxiFilters.eval(_, n))).map { n =>
        val values = new Array[Any](required.length)
        var i = 0
        while (i < required.length) {
          values(i) = WireTaxiFilters.extract(n, required(i))
          i += 1
        }
        new GenericInternalRow(values): InternalRow
      }
    }
  }

  override def close(): Unit =
    // progress is only recorded for a COMPLETE drain of the slice —
    // a failed/aborted attempt must not leak a partial position into
    // the next offset's shardSeqs (see the offset-model scaladoc).
    // A SHARD_END drain records even with no rows read this batch:
    // the ended flag is what admits the shard's children.
    if (drained && (lastSeq.nonEmpty || sawEnd))
      progressDir.foreach(d => KinesisProgressFiles.write(d, part.shard,
        ShardProgress(lastSeq, lastTs, lastBehind, sawEnd)))
}

object KinesisShardReader {
  /** Consecutive empty GetRecords pages tolerated before the reader
    * fails the task. High enough that sparse-but-progressing regions
    * (each page advances the iterator) never trip it in one batch at
    * stub/test scale; low enough to bound a wedged iterator. */
  val EmptyPollPatience = 20
}
