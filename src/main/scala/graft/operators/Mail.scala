package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RFC 5322 / MIME (RFC 2045–2047) mail-corpus acquisition — the
  * message format of the classic public text corpora (Enron mail,
  * mailing-list archives, Usenet): header parsing with UNFOLDING,
  * multipart boundary walking, per-part Content-Transfer-Encoding
  * decode (7bit / quoted-printable / base64), and RFC 2047
  * encoded-word subject decoding. The reference has no mail path
  * (its scope is the taxi stream); this is forward training-data
  * surface beside the WARC family (SURVEY.md §2.5).
  *
  * Fixture synthesis (the WARC-family pattern, q247 precedent): each
  * document becomes a deterministic multipart/mixed message — a
  * quoted-printable text/plain part carrying the document text, a
  * base64 text/html part carrying the q239 HTML wrap, and (odd ids)
  * a base64 application/octet-stream attachment of arithmetic bytes.
  * The PARSER sees only the message bytes: headers decide the
  * boundary, each part's headers decide its decoder — a
  * header/decoder disagreement flips `valid` or a digest, never
  * silently passes. Everything is row-local: 100 TB of mail shards
  * by message with zero shuffle.
  *
  * Constrained profile, stated loudly: ASCII payloads (the QP
  * encoder escapes '=', CR, LF and DEL-and-above bytes; the corpus
  * is ASCII), no nested multiparts, CRLF line endings throughout —
  * the structural machinery (unfolding, boundaries, CTE dispatch,
  * encoded words) is the operator's essence and is exact. */
object Mail {

  private val CRLF = "\r\n"

  // -------------------------------------------------------------
  // quoted-printable (RFC 2045 §6.7), constrained ASCII profile
  // -------------------------------------------------------------

  /** QP-encode an ASCII string: '=', CR, LF, DEL+ escape to =XX
    * (uppercase hex); soft line breaks ("=" CRLF) keep encoded
    * lines ≤ 72 chars. */
  def qpEncode(s: String): String = {
    val out = new StringBuilder
    var lineLen = 0
    def emit(tok: String): Unit = {
      if (lineLen + tok.length > 72) {
        out.append("=").append(CRLF)
        lineLen = 0
      }
      out.append(tok)
      lineLen += tok.length
    }
    s.foreach { c =>
      if (c == '=' || c < ' ' || c > '~')
        emit(f"=${c.toInt}%02X")
      else emit(c.toString)
    }
    out.toString
  }

  /** QP-decode: =XX hex escapes and soft line breaks; anything else
    * passes through. Malformed escapes fail loud. */
  def qpDecode(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=') {
        require(i + 1 < s.length, "truncated QP escape")
        if (s.startsWith("=" + CRLF, i)) i += 3 // soft break
        else {
          require(i + 2 < s.length + 1 && i + 3 <= s.length,
            "truncated QP escape")
          out.append(Integer.parseInt(s.substring(i + 1, i + 3), 16)
            .toChar)
          i += 3
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** RFC 2047 Q-encoded word decode: =?charset?Q?text?= with '_'
    * for space and =XX escapes; non-encoded subjects pass through. */
  def decodeWord(s: String): String = {
    val Re = """=\?[Uu][Ss]-[Aa][Ss][Cc][Ii][Ii]\?[Qq]\?(.*)\?=""".r
    s match {
      case Re(payload) => qpDecode(payload.replace("_", " "))
      case _ => s
    }
  }

  // -------------------------------------------------------------
  // synthesis
  // -------------------------------------------------------------

  def attachmentBytes(id: Long): Array[Byte] = {
    val n = (16 + id % 32).toInt
    Array.tabulate(n)(i => ((id * 31 + i * 7) % 256).toByte)
  }

  /** One deterministic EML message for (doc_id, text). */
  def mimeMessage(id: Long, text: String): String = {
    val boundary = s"----=_graft_$id"
    val subject =
      if (id % 3 == 0) s"=?US-ASCII?Q?Report=5F$id?=" // "Report_<id>"
      else s"Report $id"
    // folded To: header — one recipient per folded line (1 + id%3)
    val rcpts = (0 to (id % 3).toInt)
      .map(k => s"user$k@site${(id + k) % 7}.example.com")
    val to = "To: " + rcpts.mkString("," + CRLF + " ")
    val html = new String(java.util.Base64.getMimeEncoder(76,
      CRLF.getBytes("US-ASCII")).encode(
        (s"<!DOCTYPE html><html><head><title>Doc $id</title></head>" +
          s"<body><p>${text.take(64)}</p></body></html>")
          .getBytes("US-ASCII")), "US-ASCII")
    val att =
      if (id % 2 == 1) {
        val b64 = new String(java.util.Base64.getMimeEncoder(76,
          CRLF.getBytes("US-ASCII")).encode(attachmentBytes(id)),
          "US-ASCII")
        s"--$boundary$CRLF" +
          s"Content-Type: application/octet-stream$CRLF" +
          s"Content-Transfer-Encoding: base64$CRLF" +
          s"Content-Disposition: attachment; filename=d$id.bin$CRLF" +
          CRLF + b64 + CRLF
      } else ""
    s"From: crawler@corpus.example.com$CRLF" +
      to + CRLF +
      s"Subject: $subject$CRLF" +
      f"Date: Thu, 1 Jan 2026 00:00:${id % 60}%02d +0000$CRLF" +
      s"MIME-Version: 1.0$CRLF" +
      s"""Content-Type: multipart/mixed; boundary="$boundary"$CRLF""" +
      CRLF +
      s"This is a multi-part message in MIME format.$CRLF" +
      s"--$boundary$CRLF" +
      s"Content-Type: text/plain; charset=us-ascii$CRLF" +
      s"Content-Transfer-Encoding: quoted-printable$CRLF" +
      CRLF + qpEncode(text) + CRLF +
      s"--$boundary$CRLF" +
      s"Content-Type: text/html; charset=us-ascii$CRLF" +
      s"Content-Transfer-Encoding: base64$CRLF" +
      CRLF + html + CRLF +
      att +
      s"--$boundary--$CRLF"
  }

  // -------------------------------------------------------------
  // parsing
  // -------------------------------------------------------------

  final case class MimePart(headers: Map[String, String], body: String)

  /** Split a header block into unfolded (name → value) pairs:
    * continuation lines (leading SP/HT) join their parent with the
    * fold's whitespace collapsed to one space (RFC 5322 §2.2.3). */
  def parseHeaders(block: String): Map[String, String] = {
    val unfolded = Seq.newBuilder[String]
    var cur: StringBuilder = null
    block.split("\r\n", -1).foreach { line =>
      if (line.nonEmpty && (line.head == ' ' || line.head == '\t')) {
        require(cur != null, s"continuation line with no parent: $line")
        cur.append(" ").append(line.trim)
      } else if (line.nonEmpty) {
        if (cur != null) unfolded += cur.toString
        cur = new StringBuilder(line)
      }
    }
    if (cur != null) unfolded += cur.toString
    unfolded.result().map { h =>
      val i = h.indexOf(':')
      require(i > 0, s"malformed header line: $h")
      h.substring(0, i).trim.toLowerCase -> h.substring(i + 1).trim
    }.toMap
  }

  /** Parse one EML message: top headers, boundary from the
    * Content-Type header (never assumed), parts split on the
    * boundary lines, each part's body DECODED per its own
    * Content-Transfer-Encoding. */
  def parseMessage(raw: String): (Map[String, String], Seq[MimePart]) = {
    val sepIdx = raw.indexOf(CRLF + CRLF)
    require(sepIdx >= 0, "no header/body separator")
    val headers = parseHeaders(raw.substring(0, sepIdx))
    val ct = headers.getOrElse("content-type",
      sys.error("no Content-Type"))
    require(ct.startsWith("multipart/"),
      s"constrained profile: multipart only (got $ct)")
    val BoundaryRe = """.*boundary="([^"]+)".*""".r
    val boundary = ct match {
      case BoundaryRe(b) => b
      case _ => sys.error(s"no boundary parameter in: $ct")
    }
    val body = raw.substring(sepIdx + 4)
    val marker = s"--$boundary"
    val chunks = body.split(java.util.regex.Pattern.quote(marker), -1)
    // chunks: preamble, part1, ..., partN, "--CRLF" epilogue
    require(chunks.length >= 3, "no parts between boundaries")
    require(chunks.last.startsWith("--"),
      "missing closing boundary")
    val parts = chunks.slice(1, chunks.length - 1).map { chunk =>
      // each part chunk starts with CRLF after the boundary line
      require(chunk.startsWith(CRLF), "boundary not on its own line")
      val c = chunk.substring(2)
      val i = c.indexOf(CRLF + CRLF)
      require(i >= 0, "part without header/body separator")
      val ph = parseHeaders(c.substring(0, i))
      // part body ends with the CRLF that precedes the next boundary
      val encoded = c.substring(i + 4).stripSuffix(CRLF)
      val decoded = ph.getOrElse("content-transfer-encoding", "7bit")
        .toLowerCase match {
        case "quoted-printable" => qpDecode(encoded)
        case "base64" => new String(java.util.Base64.getMimeDecoder
          .decode(encoded), "ISO-8859-1")
        case "7bit" | "8bit" => encoded
        case e => sys.error(s"unknown transfer encoding: $e")
      }
      MimePart(ph, decoded)
    }.toSeq
    (headers, parts)
  }

  /** Graded MIME parse (q331): synthesize each document's message,
    * parse it back through the real walker, grade the structural
    * census and the decoded payloads' digests. Row-local. */
  def mimeParse(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val (hdrs, parts) = parseMessage(mimeMessage(id, text))
        val subject = decodeWord(hdrs.getOrElse("subject", ""))
        val rcpts = hdrs.getOrElse("to", "").split(",").map(_.trim)
          .count(_.nonEmpty)
        val plain = parts.find(
          _.headers.get("content-type").exists(_.startsWith("text/plain")))
        val htmlP = parts.find(
          _.headers.get("content-type").exists(_.startsWith("text/html")))
        val attP = parts.find(_.headers.get("content-type")
          .exists(_.startsWith("application/octet-stream")))
        val attBytes = attP.map(_.body.toCharArray.map(_.toInt & 0xFF))
        (id, parts.size.toLong, subject, rcpts.toLong,
          plain.map(_.body).getOrElse(""),
          htmlP.exists(_.body.startsWith("<!DOCTYPE html>")),
          attBytes.map(_.length.toLong).getOrElse(0L),
          attBytes.map(_.map(_.toLong).sum).getOrElse(0L),
          plain.nonEmpty && htmlP.nonEmpty)
      }
      .toDF("doc_id", "n_parts", "subject", "n_recipients", "t",
        "html_ok", "att_n_bytes", "att_byte_sum", "valid")
      .select(col("doc_id"), col("n_parts"), col("subject"),
        col("n_recipients"),
        md5(col("t")).as("text_md5"),
        col("html_ok"), col("att_n_bytes"), col("att_byte_sum"),
        col("valid"))
  }
}
