package graft.io

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** HTTP implementation of [[BulkTransport]] speaking the
  * newline-delimited bulk protocol of the reference's sink
  * (ElasticsearchJestSink.java:91-136, its SigV4-signed client —
  * pass a [[SigV4Signer]] for the same per-request signing, spec'd
  * against the published AWS vectors): POST one action-metadata line
  * plus one
  * source line per document to the bulk endpoint, parse the
  * per-action statuses out of the response, and report per-doc
  * success — which is exactly what the [[BulkIndexer]] needs to retry
  * only the failed actions (the per-action partial-failure handling
  * the reference FIXME'd away at ElasticsearchJestSink.java:98).
  *
  * Failure taxonomy:
  *  - transport-level failure (connection refused, timeout, non-2xx
  *    bulk response, response/request cardinality mismatch) → every
  *    doc reported failed; the indexer re-sends the whole bulk — the
  *    reference's swallow-and-retry-next-invoke shape, but bounded by
  *    the indexer's `maxRetries`;
  *  - per-action failure (item status outside 2xx) → only those docs
  *    reported failed and re-sent.
  *
  * JDK `HttpURLConnection` only (the offline build has no HTTP client
  * dependency); connections are opened per call, so the transport
  * carries no state and is trivially Serializable for executor use.
  *
  * Requires each doc's `source` to be single-line JSON —
  * [[BulkIndexSink.withDocId]]'s `to_json` output is, and the bulk
  * wire format depends on it (one line per action, one per source).
  */
class HttpBulkTransport(
    endpoint: String,
    connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 10000,
    signer: Option[SigV4Signer] = None) extends BulkTransport {

  // The response contract is the ES bulk shape
  // {"errors":b,"items":[{"index":{"_id":...,"status":s}},...]} with
  // items in request order; one status per item is all we consume.
  //
  // Statuses are extracted with a string- and depth-aware scan, NOT a
  // flat regex: a per-item "error" object's reason text can echo the
  // document source (which may contain the characters `"status": 200`)
  // and the error object itself nests one level deeper — a flat match
  // would over-count and flip the cardinality check. The item status
  // key sits at exactly depth 4 (response object → items array → item
  // object → action object) and never inside a string literal.
  private[io] def itemStatuses(body: String): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var i = 0
    var depth = 0
    var inStr = false
    var esc = false
    val key = "\"status\""
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case '"' =>
          if (depth == 4 && body.startsWith(key, i)) {
            var j = i + key.length
            while (j < body.length &&
              (body.charAt(j) == ' ' || body.charAt(j) == ':')) j += 1
            val start = j
            while (j < body.length && body.charAt(j).isDigit) j += 1
            if (j > start) out += body.substring(start, j).toInt
          }
          inStr = true
        case _ => ()
      }
      i += 1
    }
    out.result()
  }

  /** Minimal JSON string escaping for the action line's `_id` — the
    * sink's sha1 ids never need it, but the transport is public API
    * and must not emit malformed NDJSON for ids carrying quotes or
    * backslashes. */
  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  override def bulkIndex(docs: Seq[IndexDoc]): Seq[Boolean] = {
    if (docs.isEmpty) return Seq.empty
    try {
      val body = docs.iterator
        .map(d => s"""{"index":{"_id":"${jsonEscape(d.id)}"}}""" + "\n" +
          d.source)
        .mkString("", "\n", "\n")
        .getBytes(StandardCharsets.UTF_8)
      val conn = URI.create(endpoint).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      try {
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/x-ndjson")
        // SigV4 (reference parity: the sink's SDK-signed client) —
        // sign per request; the payload hash covers this exact body
        signer.foreach { s =>
          s.signedHeaders("POST", URI.create(endpoint), body,
            java.time.Instant.now(),
            Map("content-type" -> "application/x-ndjson"))
            .foreach { case (k, v) => conn.setRequestProperty(k, v) }
        }
        conn.setFixedLengthStreamingMode(body.length)
        conn.setDoOutput(true)
        val out = conn.getOutputStream
        try { out.write(body); out.flush() } finally out.close()
        val code = conn.getResponseCode
        if (code / 100 != 2) {
          // drain the error stream so the connection can be reused
          Option(conn.getErrorStream).foreach(s =>
            try s.readAllBytes() finally s.close())
          docs.map(_ => false)
        } else {
          val in = conn.getInputStream
          val resp =
            try new String(in.readAllBytes(), StandardCharsets.UTF_8)
            finally in.close()
          val statuses = itemStatuses(resp)
          if (statuses.size != docs.size) docs.map(_ => false)
          else statuses.map(_ / 100 == 2)
        }
      } finally conn.disconnect()
    } catch {
      case _: IOException => docs.map(_ => false)
    }
  }
}
