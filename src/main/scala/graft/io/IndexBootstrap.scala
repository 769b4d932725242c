package graft.io

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** Index bootstrap: create the search indexes with the reference's
  * mappings before streaming into them — the step the reference
  * architecture performs from EC2 user-data at stack boot (curl -XPUT
  * of elasticsearch/es-index.json:2-32 onto the `taxi-dashboard`
  * domain, cfn-templates/flink-refarch-infrastructure.yml:349).
  *
  * The reference's single index carries one mapping per document type
  * (pickup_count, trip_duration); this engine's sink writes each doc
  * type to its own endpoint (`<base>/<type>/_bulk`), so the bootstrap
  * creates one index per type carrying that type's properties — the
  * same fields (geo_point location, date timestamp, keyword
  * airport_code + raw sub-field) re-expressed for per-type indexes.
  *
  * Idempotent: each index is HEAD-probed first and only PUT when
  * absent (404), so an app restart against a live cluster changes
  * nothing; a PUT racing another bootstrap treats the loser's
  * already-exists response as success.
  */
object IndexBootstrap {

  /** geo_point + date: the Q1 hotspot documents
    * (es-index.json:3-12). */
  val PickupMapping: String =
    """{"mappings":{"properties":{
      |"location":{"type":"geo_point"},
      |"timestamp":{"type":"date"}}}}""".stripMargin.replace("\n", "")

  /** keyword airport code, geo_point with a raw keyword sub-field,
    * date (es-index.json:14-31). */
  val DurationMapping: String =
    """{"mappings":{"properties":{
      |"airport_code":{"type":"keyword"},
      |"location":{"type":"geo_point",
      |"fields":{"raw":{"type":"keyword"}}},
      |"timestamp":{"type":"date"}}}}""".stripMargin.replace("\n", "")

  val Mappings: Map[String, String] = Map(
    "pickup_count" -> PickupMapping,
    "trip_duration" -> DurationMapping)

  /** Ensure `<base>/<docType>` exists with its mapping. Returns true
    * when this call created it, false when it already existed.
    * Throws on transport errors or non-2xx creation responses other
    * than already-exists — a sink pointed at a broken cluster should
    * fail loudly at bootstrap, not at first flush. */
  def ensureIndex(base: String, docType: String,
      signer: Option[SigV4Signer] = None,
      connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 10000): Boolean = {
    val mapping = Mappings.getOrElse(docType,
      throw new IllegalArgumentException(s"no mapping for $docType"))
    val uri = URI.create(s"$base/$docType")
    if (exists(uri, signer, connectTimeoutMs, readTimeoutMs)) return false
    val body = mapping.getBytes(StandardCharsets.UTF_8)
    val conn = uri.toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("PUT")
      conn.setRequestProperty("Content-Type", "application/json")
      signer.foreach(s =>
        s.signedHeaders("PUT", uri, body, java.time.Instant.now(),
          Map("content-type" -> "application/json"))
          .foreach { case (k, v) => conn.setRequestProperty(k, v) })
      conn.setFixedLengthStreamingMode(body.length)
      conn.setDoOutput(true)
      val out = conn.getOutputStream
      try { out.write(body); out.flush() } finally out.close()
      val code = conn.getResponseCode
      val respBody = {
        val s = if (code / 100 == 2) conn.getInputStream
        else conn.getErrorStream
        if (s == null) "" else
          try new String(s.readAllBytes(), StandardCharsets.UTF_8)
          finally s.close()
      }
      if (code / 100 == 2) true
      else if (respBody.contains("resource_already_exists_exception"))
        false // lost a create race — the index is there, that's the goal
      else throw new IOException(
        s"index bootstrap PUT $uri failed: HTTP $code $respBody")
    } finally conn.disconnect()
  }

  /** Create every known doc-type index; returns the doc types this
    * call created. */
  def ensureAll(base: String, signer: Option[SigV4Signer] = None): Seq[String] =
    Mappings.keys.toSeq.sorted.filter(t => ensureIndex(base, t, signer))

  private def exists(uri: URI, signer: Option[SigV4Signer],
      connectTimeoutMs: Int, readTimeoutMs: Int): Boolean = {
    val conn = uri.toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("HEAD")
      signer.foreach(s =>
        s.signedHeaders("HEAD", uri, Array.emptyByteArray,
          java.time.Instant.now())
          .foreach { case (k, v) => conn.setRequestProperty(k, v) })
      conn.getResponseCode / 100 == 2
    } finally conn.disconnect()
  }
}
