package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IDN host normalization (q297) — the second rule family the q243
  * scaladoc deferred (after q293's percent-encoding): international
  * domain names reach a crawl in TWO spellings of one host — the
  * Unicode form (`münchen.example.com`) and the ACE form
  * (`xn--mnchen-3ya.example.com`) — and every host-keyed operator
  * (q104/q113/q244/q250/q273) under-collapses until both map to one
  * key. Reference N/A — an LLM-pipeline operator like q243.
  *
  * The codec is RFC 3492 PUNYCODE, transcribed from the published
  * algorithm (§6.1 parameters, §6.2 decode, §6.3 encode — the
  * bootstring generalized variable-length integers with the bias
  * adaptation function of §6.1). The STATED SUBSET vs a full IDNA
  * implementation: labels are assumed already case-folded and
  * NFC-normalized (the q243 pipeline lowercases the authority
  * first), and the UTS-46 mapping/bidi checks are out of scope —
  * this is the ENCODING layer, loud-rejecting malformed ACE labels
  * (bad basic code points, truncated digit runs) rather than
  * guessing.
  *
  * Correctness evidence beyond the paired round-trip: the spec pins
  * the widely-published anchor pairs (bücher↔bcher-kva,
  * münchen↔mnchen-3ya, mañana↔maana-pta, köln↔kln-sna), decode∘
  * encode identity over mixed-script labels, idempotence on ASCII,
  * and the oracle carries the expected ACE forms as independent
  * literals — a transcription slip in either direction breaks the
  * hash compare, not just the self-round-trip.
  *
  * Scale design (100 TB): strictly row-local (one typed map per
  * host, the q267 economics); hosts are dimension-sized in every
  * composition that consumes this. */
object Idn {

  // RFC 3492 §5 parameter values
  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  /** Bias adaptation (§6.1). */
  private def adapt(delta0: Int, numPoints: Int,
      firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (((Base - TMin + 1) * delta) / (delta + Skew))
  }

  private def encodeDigit(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + (d - 26)).toChar

  private def decodeDigit(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0' + 26
    else if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else sys.error(s"punycode: invalid digit '$c'")

  /** Encode one label's code points (§6.3). Input must contain at
    * least one non-basic code point for a meaningful ACE label; the
    * caller decides whether to prepend `xn--`. */
  def punycodeEncode(input: String): String = {
    val cps = input.codePoints().toArray
    val out = new StringBuilder
    val basicCount = cps.count(_ < InitialN)
    cps.filter(_ < InitialN).foreach(c => out.append(c.toChar))
    var h = basicCount
    val b = basicCount
    if (b > 0) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    while (h < cps.length) {
      val m = cps.filter(_ >= n).min
      delta += (m - n) * (h + 1)
      n = m
      for (c <- cps) {
        if (c < n) delta += 1
        if (c == n) {
          var q = delta
          var k = Base
          var coded = false
          while (!coded) {
            val t =
              if (k <= bias) TMin
              else if (k >= bias + TMax) TMax
              else k - bias
            if (q < t) { out.append(encodeDigit(q)); coded = true }
            else {
              out.append(encodeDigit(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  /** Decode one ACE label's digits (§6.2) — the part after `xn--`.
    * Loud-rejects malformed input (truncated digit runs, non-basic
    * basic part, invalid digits). */
  def punycodeDecode(input: String): String = {
    val d = input.lastIndexOf('-')
    val output = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (d > 0) input.substring(0, d).foreach { c =>
      require(c < InitialN, s"punycode: non-basic code point '$c'")
      output += c.toInt
    }
    var pos = if (d > 0) d + 1 else 0
    var n = InitialN
    var i = 0
    var bias = InitialBias
    while (pos < input.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        require(pos < input.length, "punycode: truncated digit run")
        val digit = decodeDigit(input.charAt(pos))
        pos += 1
        // RFC 3492 §6.4 overflow guards (r15 ADVICE): on an
        // adversarially long digit run, i += digit*w and w *= Base-t
        // can wrap Int and yield a WRONG decode silently — the
        // opposite of this file's loud-reject contract
        require(digit <= (Int.MaxValue - i) / math.max(w, 1) &&
          w > 0, "punycode: overflow in variable-length integer")
        i += digit * w
        val t =
          if (k <= bias) TMin
          else if (k >= bias + TMax) TMax
          else k - bias
        if (digit < t) done = true
        else {
          require(w <= Int.MaxValue / (Base - t),
            "punycode: overflow in weight")
          w *= Base - t
          k += Base
        }
      }
      bias = adapt(i - oldi, output.length + 1, oldi == 0)
      require(i / (output.length + 1) <= Int.MaxValue - n,
        "punycode: overflow in code point")
      n += i / (output.length + 1)
      i %= output.length + 1
      output.insert(i, n)
      i += 1
    }
    new String(output.toArray, 0, output.length)
  }

  /** Host → ACE (ASCII) form: each label with a non-ASCII code
    * point becomes `xn--` + its punycode; ASCII labels pass
    * through. */
  def toAsciiHost(host: String): String =
    host.split("\\.", -1).map { l =>
      if (l.codePoints().allMatch(_ < InitialN)) l
      else "xn--" + punycodeEncode(l)
    }.mkString(".")

  /** Host → Unicode form: each `xn--` label decodes; others pass
    * through. */
  def toUnicodeHost(host: String): String =
    host.split("\\.", -1).map { l =>
      if (l.startsWith("xn--")) punycodeDecode(l.substring(4)) else l
    }.mkString(".")

  /** Unicode host shapes of the q297 fixture (picked by
    * doc_id % 6) — shared with the oracle's CASE, which ALSO
    * carries the expected ACE forms as independent literals. */
  val IdnHosts: Seq[String] = Seq(
    "www.example.com",
    "münchen.example.com",
    "bücher.de",
    "shop.köln.de",
    "mañana.example.org",
    "api.example.io")

  /** q297: documents → fixture Unicode host → computed ACE form →
    * decoded back: (doc_id, host, ascii_host, unicode_host, is_idn,
    * roundtrip_ok). The ACE forms are COMPUTED by the RFC
    * algorithm; the oracle asserts them against independent literal
    * expectations. */
  def idnHosts(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val host = IdnHosts(((id % 6) + 6).toInt % 6)
        val ascii = toAsciiHost(host)
        val uni = toUnicodeHost(ascii)
        (id, host, ascii, uni, host != ascii, uni == host)
      }
      .toDF("doc_id", "host", "ascii_host", "unicode_host",
        "is_idn", "roundtrip_ok")
  }
}
