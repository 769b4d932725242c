package graft.io

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.util.Base64

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** One record of a Kinesis-protocol GetRecords response.
  *
  * @param approximateArrivalMs service-assigned ingestion timestamp in
  *        epoch millis (the wire carries epoch seconds with fraction);
  *        immutable once assigned and monotone per shard — the
  *        property [[graft.sources.KinesisTaxiSource]]'s offset
  *        determinism rests on.
  */
final case class KinesisRecord(
    sequenceNumber: String,
    partitionKey: String,
    data: Array[Byte],
    approximateArrivalMs: Long)

final case class GetRecordsResult(
    records: Vector[KinesisRecord],
    nextShardIterator: Option[String],
    millisBehindLatest: Long)

/** One shard's listing metadata: resharding lineage (`parents` =
  * ParentShardId + AdjacentParentShardId when present) and whether a
  * reshard CLOSED the shard (EndingSequenceNumber present). */
final case class ShardInfo(
    id: String,
    parents: Vector[String],
    closed: Boolean,
    startingHashKey: String)

/** One record of a PutRecords REQUEST. `explicitHashKey` (a decimal
  * 128-bit hash-space position) overrides the MD5(partitionKey)
  * shard routing — the mechanism the reference's watermark broadcast
  * uses to hit EVERY shard (StreamPopulator.java:189-198). */
final case class PutRecordEntry(
    partitionKey: String,
    data: Array[Byte],
    explicitHashKey: Option[String] = None)

/** Positional outcome per request record: Right((sequence, shard)) or
  * Left(errorCode) — the per-record partial-failure shape of the
  * public API (a 200 response can still fail individual records). */
final case class PutRecordsResult(
    failedCount: Int,
    outcomes: Vector[Either[String, (String, String)]])

/** Minimal Kinesis Data Streams HTTP client — the
  * ListShards / GetShardIterator / GetRecords subset of the public
  * wire protocol (POST to the regional endpoint, target selected by
  * the `X-Amz-Target: Kinesis_20131202.<Op>` header, bodies in
  * `application/x-amz-json-1.1`), optionally SigV4-signed per request
  * via [[SigV4Signer]] (service `kinesis`) — the protocol the
  * reference's consumer speaks through its SDK
  * (ProcessTaxiStream.java:73-84 registers the Kinesis consumer;
  * StreamPopulator.java:62-66 the producer client).
  *
  * JDK `HttpURLConnection` only (offline build, no SDK); stateless and
  * Serializable so executor tasks construct requests at read time,
  * exactly like [[HttpBulkTransport]] on the sink side.
  *
  * Failure taxonomy: transient failures (IOException, HTTP 5xx) are
  * retried `maxRetries` times with linear backoff, then surface as
  * IOException — a Spark task retry is the outer loop. 4xx (bad
  * iterator, access denied) fail immediately with the AWS `__type`
  * from the error body, because retrying a rejected signature or an
  * expired iterator verbatim cannot succeed.
  */
class KinesisHttpClient(
    endpoint: String,
    signer: Option[SigV4Signer] = None,
    connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 10000,
    maxRetries: Int = 2) extends Serializable {

  @transient private lazy val mapper = new ObjectMapper()

  /** Every shard id, open AND closed — a batch scan must read closed
    * parents too (their records live nowhere else within
    * retention). */
  def listShards(stream: String): Vector[String] =
    listShardInfos(stream).map(_.id)

  /** (shardId, startingHashKey) per OPEN shard — the starting hash
    * key is what an ExplicitHashKey must equal to target that shard
    * deterministically (the reference's watermark-broadcast trick);
    * a closed shard rejects writes, so the broadcast set is the open
    * topology. */
  def listShardRanges(stream: String): Vector[(String, String)] =
    listShardInfos(stream).filterNot(_.closed)
      .map(i => (i.id, i.startingHashKey))

  /** Full shard metadata incl. the RESHARDING LINEAGE: parent ids
    * (ParentShardId + AdjacentParentShardId — a split child carries
    * one, a merge child two) and closed-ness (the presence of
    * SequenceNumberRange.EndingSequenceNumber, the public API's
    * signal that a reshard sealed the shard). */
  def listShardInfos(stream: String): Vector[ShardInfo] = {
    val body = JsonNodeFactory.instance.objectNode()
    body.put("StreamName", stream)
    val resp = post("ListShards", body.toString)
    val shards = resp.get("Shards")
    if (shards == null || !shards.isArray) Vector.empty
    else {
      val out = Vector.newBuilder[ShardInfo]
      shards.forEach { s =>
        val start = Option(s.get("HashKeyRange"))
          .flatMap(r => Option(r.get("StartingHashKey")))
          .map(_.asText()).getOrElse("0")
        val parents =
          Option(s.get("ParentShardId")).filterNot(_.isNull)
            .map(_.asText()).toVector ++
          Option(s.get("AdjacentParentShardId")).filterNot(_.isNull)
            .map(_.asText()).toVector
        val closed = Option(s.get("SequenceNumberRange"))
          .flatMap(r => Option(r.get("EndingSequenceNumber")))
          .exists(!_.isNull)
        out += ShardInfo(s.get("ShardId").asText(), parents, closed,
          start)
      }
      out.result()
    }
  }

  def putRecords(stream: String,
      records: Seq[PutRecordEntry]): PutRecordsResult = {
    val body = JsonNodeFactory.instance.objectNode()
    body.put("StreamName", stream)
    val arr = body.putArray("Records")
    records.foreach { r =>
      val o = arr.addObject()
      o.put("PartitionKey", r.partitionKey)
      o.put("Data", Base64.getEncoder.encodeToString(r.data))
      r.explicitHashKey.foreach(o.put("ExplicitHashKey", _))
    }
    val resp = post("PutRecords", body.toString)
    val outcomes = Vector.newBuilder[Either[String, (String, String)]]
    val recs = resp.get("Records")
    if (recs != null && recs.isArray) recs.forEach { r =>
      val err = Option(r.get("ErrorCode")).filterNot(_.isNull)
      outcomes += err.map(e => Left(e.asText())).getOrElse(
        Right((r.get("SequenceNumber").asText(), r.get("ShardId").asText())))
    }
    PutRecordsResult(
      Option(resp.get("FailedRecordCount")).map(_.asInt()).getOrElse(0),
      outcomes.result())
  }

  /** @param timestampMs for AT_TIMESTAMP iterators; the wire encodes
    *        it as epoch seconds with fraction, per the public API. */
  def getShardIterator(
      stream: String,
      shardId: String,
      iteratorType: String,
      startingSequenceNumber: Option[String] = None,
      timestampMs: Option[Long] = None): String = {
    val body = JsonNodeFactory.instance.objectNode()
    body.put("StreamName", stream)
    body.put("ShardId", shardId)
    body.put("ShardIteratorType", iteratorType)
    startingSequenceNumber.foreach(body.put("StartingSequenceNumber", _))
    timestampMs.foreach(ms => body.put("Timestamp", ms / 1000.0))
    post("GetShardIterator", body.toString).get("ShardIterator").asText()
  }

  def getRecords(shardIterator: String, limit: Int): GetRecordsResult = {
    val body = JsonNodeFactory.instance.objectNode()
    body.put("ShardIterator", shardIterator)
    body.put("Limit", limit)
    val resp = post("GetRecords", body.toString)
    val recs = Vector.newBuilder[KinesisRecord]
    val arr = resp.get("Records")
    if (arr != null && arr.isArray) arr.forEach { r =>
      recs += KinesisRecord(
        r.get("SequenceNumber").asText(),
        Option(r.get("PartitionKey")).map(_.asText()).getOrElse(""),
        Base64.getDecoder.decode(r.get("Data").asText()),
        math.round(Option(r.get("ApproximateArrivalTimestamp"))
          .map(_.asDouble()).getOrElse(0.0) * 1000.0))
    }
    GetRecordsResult(
      recs.result(),
      Option(resp.get("NextShardIterator")).filterNot(_.isNull).map(_.asText()),
      Option(resp.get("MillisBehindLatest")).map(_.asLong()).getOrElse(0L))
  }

  private def post(op: String, json: String): JsonNode = {
    var attempt = 0
    while (true) {
      try return postOnce(op, json)
      catch {
        case e: KinesisClientException => throw e // 4xx: not retryable
        case e: IOException =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(100L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def postOnce(op: String, json: String): JsonNode = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    val uri = URI.create(endpoint)
    val conn = uri.toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/x-amz-json-1.1")
      conn.setRequestProperty("X-Amz-Target", s"Kinesis_20131202.$op")
      signer.foreach { s =>
        s.signedHeaders("POST", uri, bytes, java.time.Instant.now(),
          Map("content-type" -> "application/x-amz-json-1.1",
            "x-amz-target" -> s"Kinesis_20131202.$op"))
          .foreach { case (k, v) => conn.setRequestProperty(k, v) }
      }
      conn.setFixedLengthStreamingMode(bytes.length)
      conn.setDoOutput(true)
      val out = conn.getOutputStream
      try { out.write(bytes); out.flush() } finally out.close()
      val code = conn.getResponseCode
      if (code / 100 == 2) {
        val in = conn.getInputStream
        try mapper.readTree(in) finally in.close()
      } else {
        val err = Option(conn.getErrorStream).map { s =>
          try new String(s.readAllBytes(), StandardCharsets.UTF_8)
          finally s.close()
        }.getOrElse("")
        if (code / 100 == 4)
          throw new KinesisClientException(s"$op rejected ($code): $err")
        else throw new IOException(s"$op failed ($code): $err")
      }
    } finally conn.disconnect()
  }
}

/** Non-retryable (4xx) protocol rejection — carries the AWS error
  * body (`__type` etc.) for diagnosis. */
class KinesisClientException(msg: String) extends IOException(msg)
