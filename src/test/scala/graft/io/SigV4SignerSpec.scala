package graft.io

import java.net.URI
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[SigV4Signer]] to the PUBLISHED AWS Signature V4 test-suite
  * vectors (credential AKIDEXAMPLE / wJalr…, region us-east-1,
  * service "service", instant 2015-08-30T12:36:00Z) plus the
  * canonicalization corner cases. The expected signatures were
  * additionally cross-derived with an independent implementation of
  * the spec before being pinned here. */
class SigV4SignerSpec extends AnyFunSuite {

  private val signer = SigV4Signer("AKIDEXAMPLE",
    "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", "us-east-1", "service")
  private val at = Instant.parse("2015-08-30T12:36:00Z")
  private val host = "example.amazonaws.com"

  private def signature(headers: Map[String, String]): String =
    headers("Authorization").split("Signature=").last

  test("get-vanilla vector") {
    val h = signer.signedHeaders("GET", URI.create(s"https://$host/"),
      Array.emptyByteArray, at)
    assert(h("X-Amz-Date") == "20150830T123600Z")
    assert(h("Authorization").contains(
      "Credential=AKIDEXAMPLE/20150830/us-east-1/service/aws4_request"))
    assert(h("Authorization").contains("SignedHeaders=host;x-amz-date"))
    assert(signature(h) ==
      "5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d9b8aae1d763fbf31")
  }

  test("post-vanilla vector") {
    val h = signer.signedHeaders("POST", URI.create(s"https://$host/"),
      Array.emptyByteArray, at)
    assert(signature(h) ==
      "5da7c1a2acd57cee7505fc6676e4e544621c30862966e37dddb68e92efbe5d6b")
  }

  test("post with form body and signed content-type") {
    val h = signer.signedHeaders("POST", URI.create(s"https://$host/"),
      "Param1=value1".getBytes("UTF-8"), at,
      Map("Content-Type" -> "application/x-www-form-urlencoded"))
    assert(h("Authorization").contains(
      "SignedHeaders=content-type;host;x-amz-date"))
    assert(signature(h) ==
      "ff11897932ad3f4e8b18135d722051e5ac45fc38421b1da7b9d196a0fe09473a")
  }

  test("canonical query sorts by key then value and single-encodes") {
    assert(SigV4Signer.canonicalQuery(
      URI.create(s"https://$host/?b=2&a=1&a=0")) == "a=0&a=1&b=2")
    assert(SigV4Signer.canonicalQuery(
      URI.create(s"https://$host/?flag&x=a%2Bb")) == "flag=&x=a%2Bb")
    assert(SigV4Signer.canonicalQuery(
      URI.create(s"https://$host/")) == "")
  }

  test("uri encoding: unreserved pass, others uppercase-percent, slash rule") {
    assert(SigV4Signer.uriEncode("AZaz09-_.~", encodeSlash = true) ==
      "AZaz09-_.~")
    assert(SigV4Signer.uriEncode("a b/c", encodeSlash = true) == "a%20b%2Fc")
    assert(SigV4Signer.uriEncode("a b/c", encodeSlash = false) == "a%20b/c")
    // UTF-8 multibyte percent-encodes every byte
    assert(SigV4Signer.uriEncode("é", encodeSlash = true) == "%C3%A9")
  }

  test("canonical path encodes segments and defaults to /") {
    assert(SigV4Signer.canonicalPath(
      URI.create(s"https://$host"), "es") == "/")
    // non-S3 services DOUBLE-encode each segment per the spec: the
    // space arrives single-encoded (%20) and signs as %2520
    assert(SigV4Signer.canonicalPath(
      URI.create(s"https://$host/taxi index/_bulk".replace(" ", "%20")),
      "es") == "/taxi%2520index/_bulk")
    // S3 signs the single-encoded path
    assert(SigV4Signer.canonicalPath(
      URI.create(s"https://$host/taxi index/k".replace(" ", "%20")),
      "s3") == "/taxi%20index/k")
    // plain-ASCII paths are fixpoints of the second pass (why the
    // pinned AWS vectors hold under either rule)
    assert(SigV4Signer.canonicalPath(
      URI.create(s"https://$host/a/b_c-d.e~f"), "es") == "/a/b_c-d.e~f")
  }

  test("temporary credentials sign and send the session token") {
    val tokenSigner = signer.copy(sessionToken = Some("TOKEN"))
    val h = tokenSigner.signedHeaders("GET", URI.create(s"https://$host/"),
      Array.emptyByteArray, at)
    assert(h("X-Amz-Security-Token") == "TOKEN")
    assert(h("Authorization").contains(
      "SignedHeaders=host;x-amz-date;x-amz-security-token"))
    // token participates in the signature: different from get-vanilla
    assert(signature(h) !=
      "5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d9b8aae1d763fbf31")
  }

  test("s3 service signs and returns the content hash header") {
    val s3 = signer.copy(service = "s3")
    val h = s3.signedHeaders("PUT", URI.create(s"https://$host/k"),
      "body".getBytes("UTF-8"), at)
    assert(h.contains("X-Amz-Content-Sha256"))
    assert(h("Authorization").contains("x-amz-content-sha256"))
  }

  test("nonstandard port is part of the signed host header") {
    val h1 = signer.signedHeaders("GET",
      URI.create("http://127.0.0.1:9200/_bulk"), Array.emptyByteArray, at)
    val h2 = signer.signedHeaders("GET",
      URI.create("http://127.0.0.1:9201/_bulk"), Array.emptyByteArray, at)
    assert(signature(h1) != signature(h2))
  }

  test("scheme-default ports are dropped from the signed host") {
    // HttpURLConnection sends Host: example.com for :443/https and
    // :80/http — the signature must cover what the wire carries
    val bare = signer.signedHeaders("GET",
      URI.create(s"https://$host/"), Array.emptyByteArray, at)
    val with443 = signer.signedHeaders("GET",
      URI.create(s"https://$host:443/"), Array.emptyByteArray, at)
    assert(signature(bare) == signature(with443))
    val http80 = signer.signedHeaders("GET",
      URI.create("http://127.0.0.1:80/_bulk"), Array.emptyByteArray, at)
    val httpBare = signer.signedHeaders("GET",
      URI.create("http://127.0.0.1/_bulk"), Array.emptyByteArray, at)
    assert(signature(http80) == signature(httpBare))
  }
}
