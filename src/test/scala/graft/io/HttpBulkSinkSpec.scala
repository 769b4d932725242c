package graft.io

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

/** In-process bulk-endpoint stub (JDK HttpServer): stores indexed
  * docs, replies with the ES-style per-item status array, and injects
  * failures — per-action (configurable status on a doc's first
  * delivery, or always) and whole-request (plain 503) — so the HTTP
  * transport's partial-failure parsing and the indexer's per-doc
  * retry can be exercised over real HTTP. */
class StubBulkServer(
    failFirstDelivery: String => Boolean = _ => false,
    alwaysFailIds: String => Boolean = _ => false,
    var wholeRequestFailures: Int = 0,
    headAlways404: Boolean = false) {

  val store = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Index mappings PUT by bootstrap, keyed by request path
    * (e.g. "/pickup_count"). */
  val mappings = new java.util.concurrent.ConcurrentHashMap[String, String]()
  val deliveries = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  val requests = new AtomicInteger(0)
  val requestSizes = new java.util.concurrent.CopyOnWriteArrayList[Integer]()
  /** Request paths seen — lets app-level tests assert per-doc-type
    * endpoints (<base>/<type>/_bulk) were hit. */
  val paths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  /** Last request's headers (lowercased names) — lets the SigV4 tests
    * assert what a signed transport actually sent. */
  @volatile var lastHeaders: Map[String, String] = Map.empty

  private val ActionId = """"_id"\s*:\s*"([^"]+)"""".r

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  // root context: serves any */_bulk path (single-index transport
  // tests and the app's per-doc-type endpoints alike)
  server.createContext("/", (ex: HttpExchange) => {
    paths.add(ex.getRequestURI.getPath)
    lastHeaders = {
      import scala.jdk.CollectionConverters._
      ex.getRequestHeaders.asScala.map { case (k, v) =>
        k.toLowerCase -> v.asScala.mkString(",")
      }.toMap
    }
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    requests.incrementAndGet()
    val path = ex.getRequestURI.getPath
    if (ex.getRequestMethod == "HEAD") {
      // index-existence probe for IndexBootstrap; headAlways404
      // simulates the probe racing another bootstrap's create
      val found = !headAlways404 && mappings.containsKey(path)
      ex.sendResponseHeaders(if (found) 200 else 404, -1)
      ex.close()
    } else if (ex.getRequestMethod == "PUT") {
      // index creation; duplicate PUT answers the ES already-exists
      // error so bootstrap idempotence can be exercised
      if (mappings.putIfAbsent(path, body) != null) {
        val msg = """{"error":{"type":"resource_already_exists_exception"}}"""
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(400, msg.length)
        ex.getResponseBody.write(msg)
      } else {
        val msg = """{"acknowledged":true}""".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, msg.length)
        ex.getResponseBody.write(msg)
      }
      ex.close()
    } else if (wholeRequestFailures > 0) {
      wholeRequestFailures -= 1
      val msg = "service unavailable".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(503, msg.length)
      ex.getResponseBody.write(msg)
      ex.close()
    } else {
      // NDJSON: action line, source line, repeated
      val lines = body.split("\n").filter(_.nonEmpty)
      val pairs = lines.grouped(2).collect {
        case Array(action, source) =>
          val id = ActionId.findFirstMatchIn(action).get.group(1)
          (id, source)
      }.toSeq
      requestSizes.add(pairs.size)
      val items = pairs.map { case (id, source) =>
        val n: Int = deliveries.merge(id, Int.box(1),
          (a: Integer, b: Integer) => Int.box(a + b))
        val status =
          if (alwaysFailIds(id)) 500
          else if (failFirstDelivery(id) && n == 1) 429
          else { store.put(id, source); 200 }
        s"""{"index":{"_id":"$id","status":$status}}"""
      }
      val resp = s"""{"errors":${items.exists(!_.contains("200"))},""" +
        s""""items":[${items.mkString(",")}]}"""
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
  })
  server.start()

  def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def endpoint: String = s"$base/_bulk"
  def stop(): Unit = server.stop(0)
}

/** The round-2 BulkIndexSinkSpec proves the buffering/retry semantics
  * against an in-memory transport; this spec proves the same
  * semantics OVER REAL HTTP — wire format, response parsing, partial
  * bulk failure retried per-doc, idempotent re-delivery, batching
  * thresholds, and transport-level failure handling. */
class HttpBulkSinkSpec extends AnyFunSuite with SparkSessionSpec {

  private def doc(i: Int) = IndexDoc(s"doc$i", s"""{"i":$i}""")

  private def withServer[A](srv: StubBulkServer)(f: StubBulkServer => A): A =
    try f(srv) finally srv.stop()

  test("bulk round-trip: docs land in the index, statuses parsed in order") {
    withServer(new StubBulkServer()) { srv =>
      val t = new HttpBulkTransport(srv.endpoint)
      val ok = t.bulkIndex((1 to 7).map(doc))
      assert(ok == Seq.fill(7)(true))
      assert(srv.store.size() == 7)
      assert(srv.store.get("doc3") == """{"i":3}""")
    }
  }

  test("partial bulk failure is retried per-doc, not per-bulk") {
    val failing = Set("doc2", "doc5")
    withServer(new StubBulkServer(failFirstDelivery = failing)) { srv =>
      val idx = new BulkIndexer(new HttpBulkTransport(srv.endpoint),
        maxDocs = 100, maxAgeMs = Long.MaxValue)
      (1 to 6).foreach(i => idx.add(doc(i)))
      idx.flush()
      assert(srv.store.size() == 6, "every doc eventually indexed")
      // the retry bulk carried ONLY the two failed actions
      assert(srv.requestSizes.toArray.toSeq == Seq(6, 2),
        s"request sizes ${srv.requestSizes}")
      assert(srv.deliveries.get("doc2") == 2 && srv.deliveries.get("doc1") == 1)
      assert(idx.totalFlushed == 6)
    }
  }

  test("whole-request failure (503) fails every doc; indexer re-sends the bulk") {
    withServer(new StubBulkServer(wholeRequestFailures = 1)) { srv =>
      val idx = new BulkIndexer(new HttpBulkTransport(srv.endpoint),
        maxDocs = 100, maxAgeMs = Long.MaxValue)
      (1 to 4).foreach(i => idx.add(doc(i)))
      idx.flush()
      assert(srv.store.size() == 4)
      assert(srv.requests.get() == 2) // failed whole bulk + full re-send
      assert(srv.requestSizes.toArray.toSeq == Seq(4))
    }
  }

  test("persistently failing action fails the task after maxRetries") {
    withServer(new StubBulkServer(alwaysFailIds = Set("doc1"))) { srv =>
      val idx = new BulkIndexer(new HttpBulkTransport(srv.endpoint),
        maxDocs = 100, maxAgeMs = Long.MaxValue, maxRetries = 2)
      idx.add(doc(1)); idx.add(doc(2))
      val e = intercept[java.io.IOException](idx.flush())
      assert(e.getMessage.contains("after 2 retries"))
      assert(srv.store.size() == 1) // doc2 made it
    }
  }

  test("status parsing ignores error reasons that echo 'status' text") {
    // a real ES failure item nests an error object whose reason can
    // echo the document source — including the literal characters
    // "status": 200 — and the error object sits one level deeper than
    // the item status; only the 3 item statuses may be extracted
    val t = new HttpBulkTransport("http://unused/_bulk")
    val body =
      """{"errors":true,"items":[
        |{"index":{"_id":"a","status":200}},
        |{"index":{"_id":"b","status":400,
        |  "error":{"type":"mapper_parsing_exception",
        |    "reason":"failed to parse [{\"note\":\"\\\"status\": 200 inside\"}]",
        |    "caused_by":{"status":500}}}},
        |{"index":{"_id":"c","status":201}}]}""".stripMargin
    assert(t.itemStatuses(body) == Seq(200, 400, 201))
  }

  test("unreachable endpoint reports all docs failed (no exception leak)") {
    // port 1 refuses connections
    val t = new HttpBulkTransport("http://127.0.0.1:1/_bulk",
      connectTimeoutMs = 500, readTimeoutMs = 500)
    assert(t.bulkIndex(Seq(doc(1), doc(2))) == Seq(false, false))
  }

  test("batching thresholds hold over HTTP: bulks of maxDocs + final drain") {
    withServer(new StubBulkServer()) { srv =>
      val idx = new BulkIndexer(new HttpBulkTransport(srv.endpoint),
        maxDocs = 10, maxAgeMs = Long.MaxValue)
      (1 to 35).foreach(i => idx.add(doc(i)))
      idx.flush()
      assert(srv.requestSizes.toArray.toSeq == Seq(10, 10, 10, 5))
      assert(srv.store.size() == 35)
    }
  }

  test("index bootstrap creates both mappings once, idempotent on re-run") {
    withServer(new StubBulkServer()) { srv =>
      val created = IndexBootstrap.ensureAll(srv.base)
      assert(created == Seq("pickup_count", "trip_duration"))
      assert(srv.mappings.get("/pickup_count").contains("geo_point"))
      assert(srv.mappings.get("/trip_duration").contains("airport_code"))
      // second run: HEAD probes hit, nothing is re-PUT
      assert(IndexBootstrap.ensureAll(srv.base).isEmpty)
      assert(srv.mappings.size() == 2)
    }
  }

  test("bootstrap treats a lost create race as success") {
    // HEAD always misses (another bootstrap "won" between probe and
    // PUT): the first PUT creates, the second gets the ES
    // already-exists error, which must read as exists-now, not fail
    withServer(new StubBulkServer(headAlways404 = true)) { srv =>
      assert(IndexBootstrap.ensureIndex(srv.base, "pickup_count"))
      assert(!IndexBootstrap.ensureIndex(srv.base, "pickup_count"))
      assert(srv.mappings.size() == 1)
    }
  }

  test("signed transport sends a verifiable SigV4 Authorization header") {
    withServer(new StubBulkServer()) { srv =>
      val signer = SigV4Signer("AKIDEXAMPLE",
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", "us-east-1", "es",
        sessionToken = Some("SESTOKEN"))
      val t = new HttpBulkTransport(srv.endpoint, signer = Some(signer))
      assert(t.bulkIndex(Seq(doc(1))) == Seq(true))
      val h = srv.lastHeaders
      val auth = h("authorization")
      assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/"))
      assert(auth.contains("/us-east-1/es/aws4_request"))
      // signed-header set covers content-type, host, date, and token
      assert(auth.contains("SignedHeaders=content-type;host;" +
        "x-amz-date;x-amz-security-token"))
      assert(h.contains("x-amz-date") && h("x-amz-security-token") == "SESTOKEN")
      // recompute the signature for the body + sent date: it must
      // round-trip (the server side of SigV4 verification)
      val body = ("""{"index":{"_id":"doc1"}}""" + "\n" +
        """{"i":1}""" + "\n").getBytes(StandardCharsets.UTF_8)
      val at = java.time.Instant.from(java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
        .parse(h("x-amz-date")))
      val expect = signer.signedHeaders("POST",
        java.net.URI.create(srv.endpoint), body, at,
        Map("content-type" -> "application/x-ndjson"))("Authorization")
      assert(auth == expect, "server-side recomputation must match")
    }
  }

  test("end-to-end: DataFrame through the HTTP sink, idempotent re-delivery") {
    withServer(new StubBulkServer()) { srv =>
      import spark.implicits._
      val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      BulkIndexSink.write(df, Seq("k"), new HttpBulkTransport(srv.endpoint))
      assert(srv.store.size() == 50)
      val before = srv.store.values().toArray.toSet
      // re-delivery (retried micro-batch): same ids, same content
      BulkIndexSink.write(df, Seq("k"), new HttpBulkTransport(srv.endpoint))
      assert(srv.store.size() == 50)
      assert(srv.store.values().toArray.toSet == before)
    }
  }
}
