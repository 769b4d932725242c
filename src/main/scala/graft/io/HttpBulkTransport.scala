package graft.io

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** HTTP implementation of [[BulkTransport]] speaking the
  * newline-delimited bulk protocol of the reference's sink
  * (ElasticsearchJestSink.java:91-136, its SigV4-signed Jest client
  * minus the AWS signing): POST one action-metadata line plus one
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
    readTimeoutMs: Int = 10000) extends BulkTransport {

  // The response contract is the ES bulk shape
  // {"errors":b,"items":[{"index":{"_id":...,"status":s}},...]} with
  // items in request order; one status per item is all we consume.
  private val StatusRe = """"status"\s*:\s*(\d+)""".r

  override def bulkIndex(docs: Seq[IndexDoc]): Seq[Boolean] = {
    if (docs.isEmpty) return Seq.empty
    try {
      val body = docs.iterator
        .map(d => s"""{"index":{"_id":"${d.id}"}}""" + "\n" + d.source)
        .mkString("", "\n", "\n")
        .getBytes(StandardCharsets.UTF_8)
      val conn = URI.create(endpoint).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      try {
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/x-ndjson")
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
          val statuses =
            StatusRe.findAllMatchIn(resp).map(_.group(1).toInt).toSeq
          if (statuses.size != docs.size) docs.map(_ => false)
          else statuses.map(_ / 100 == 2)
        }
      } finally conn.disconnect()
    } catch {
      case _: IOException => docs.map(_ => false)
    }
  }
}
