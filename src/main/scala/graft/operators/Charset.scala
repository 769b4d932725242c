package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Character-encoding detection (q267) — the step BEFORE q239's
  * HTML extraction on a real crawl: payload bytes arrive with no
  * reliable encoding label, and decoding with the wrong charset
  * corrupts every downstream stage silently. The detector applies
  * the HTML-standard sniffing order: (1) a byte-order mark wins
  * (UTF-8 / UTF-16LE / UTF-16BE); (2) otherwise an ASCII-compatible
  * scan for the `<meta charset="…">` declaration; (3) otherwise the
  * UTF-8 default. Reference N/A — an LLM-pipeline operator like
  * q239/q247.
  *
  * The graded fixture synthesizes per doc REAL bytes in one of four
  * shapes (d % 4): UTF-8 with BOM, UTF-16LE with BOM, UTF-16BE with
  * BOM, and BOM-less ASCII HTML declaring iso-8859-1 in a meta tag
  * — so every sniffing branch runs on every run. The graded digest
  * is the md5 of the DECODED text, so a wrong byte order or an
  * unstripped BOM shifts the answer.
  *
  * Scale design (100 TB): strictly row-local — sniff + decode in
  * one typed map per payload (the q54/q258 economics); a payload
  * never crosses an exchange. */
object Charset {

  /** Decoded body text of the BOM variants for a doc_id — shared by
    * the encoder and (via its literal arithmetic) the oracle. */
  def bodyOf(id: Long): String = s"charset doc $id"

  /** The BOM-less HTML (variant 3) for a doc_id. */
  def metaHtmlOf(id: Long): String =
    "<html><head><meta charset=\"iso-8859-1\"></head>" +
      s"<body>${bodyOf(id)}</body></html>"

  /** Synthesize the raw payload bytes for a doc_id. */
  def payloadOf(id: Long): Array[Byte] = (id % 4) match {
    case 0 => Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      bodyOf(id).getBytes("UTF-8")
    case 1 => Array[Byte](0xFF.toByte, 0xFE.toByte) ++
      bodyOf(id).getBytes("UTF-16LE")
    case 2 => Array[Byte](0xFE.toByte, 0xFF.toByte) ++
      bodyOf(id).getBytes("UTF-16BE")
    case _ => metaHtmlOf(id).getBytes("US-ASCII")
  }

  /** Sniffed (encoding, bomBytes, declared) of a payload: BOM
    * first, then the meta scan over an ISO-8859-1 view (ASCII-
    * compatible — the standard's trick), then the UTF-8 default.
    * `declared` is the meta value when one exists ('' otherwise). */
  def sniff(bytes: Array[Byte]): (String, Int, String) = {
    def at(i: Int): Int =
      if (i < bytes.length) bytes(i) & 0xFF else -1
    if (at(0) == 0xEF && at(1) == 0xBB && at(2) == 0xBF)
      ("utf-8", 3, "")
    else if (at(0) == 0xFF && at(1) == 0xFE) ("utf-16le", 2, "")
    else if (at(0) == 0xFE && at(1) == 0xFF) ("utf-16be", 2, "")
    else {
      val ascii = new String(bytes, "ISO-8859-1")
      val m = "<meta charset=\"([A-Za-z0-9-]+)\"".r
        .findFirstMatchIn(ascii)
      m match {
        case Some(g) => (g.group(1).toLowerCase, 0, g.group(1))
        case None => ("utf-8", 0, "")
      }
    }
  }

  /** Decode a payload per its sniffed encoding (BOM stripped).
    * A meta-declared charset outside the carried set does NOT
    * throw: one odd document must not kill the task (the Redirects
    * flagged-verdict discipline — a crash is the opposite failure
    * mode of a silent wrong answer). The row comes back FLAGGED
    * instead: encoding = "unknown", empty decoded text, with the
    * declaration preserved so the verdict is auditable per row. */
  def decode(bytes: Array[Byte]): (String, Int, String, String) = {
    val (enc, bom, declared) = sniff(bytes)
    val body = bytes.drop(bom)
    enc match {
      case "utf-8" => (enc, bom, declared, new String(body, "UTF-8"))
      case "utf-16le" =>
        (enc, bom, declared, new String(body, "UTF-16LE"))
      case "utf-16be" =>
        (enc, bom, declared, new String(body, "UTF-16BE"))
      case "iso-8859-1" =>
        (enc, bom, declared, new String(body, "ISO-8859-1"))
      case _ => ("unknown", bom, declared, "")
    }
  }

  // ---------------------------------------------------------------
  // mojibake repair (q308) — the data-cleaning twin of q267: a
  // double-encoded document (UTF-8 bytes once mis-decoded as
  // Latin-1 and re-saved) is textually valid but garbled
  // ("café" → "cafÃ©"), and the repair is EXACT: re-encode as
  // Latin-1, strictly re-decode as UTF-8
  // ---------------------------------------------------------------

  /** Attempt the classic repair. Some(fixed) iff the Latin-1 bytes
    * of `text` form STRICTLY valid UTF-8 that differs from the
    * input (ASCII round-trips identically — not mojibake; real
    * Latin-1 text fails the strict decode — not repairable).
    * Chars above U+00FF bail out FIRST: only Latin-1-representable
    * text can be the product of a Latin-1 mis-decode, and
    * getBytes("ISO-8859-1") would silently map a clean CJK/'€' char
    * to '?' — valid UTF-8 that differs from the input, i.e. a clean
    * document destructively "repaired" (the r15 ADVICE finding). */
  def repairMojibake(text: String): Option[String] = {
    if (text.exists(_ > 0xFF)) return None
    val bytes = text.getBytes("ISO-8859-1")
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(
        java.nio.charset.CodingErrorAction.REPORT)
    try {
      val fixed = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (fixed != text) Some(fixed) else None
    } catch { case _: java.nio.charset.CharacterCodingException =>
      None
    }
  }

  /** The clean body / its mojibake twin of the q308 fixture. */
  def cleanBodyOf(id: Long): String = s"«café n° $id»"
  def mojibakeBodyOf(id: Long): String =
    new String(cleanBodyOf(id).getBytes("UTF-8"), "ISO-8859-1")

  /** q308: documents → three text shapes (ASCII clean, real Unicode
    * clean, DOUBLE-ENCODED mojibake) → detect + repair: (doc_id,
    * verdict, n_chars_in, n_chars_out, text_md5). The repaired
    * mojibake row's digest equals the clean twin's — the oracle
    * asserts it from HAND-DERIVED corrupted literals (Â«/Ã©/Â°
    * straight from the UTF-8 table), never from this code. Strictly
    * row-local. */
  def mojibakeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val text = (id % 3) match {
          case 0 => s"plain doc $id"
          case 1 => cleanBodyOf(id)
          case _ => mojibakeBodyOf(id)
        }
        val repaired = repairMojibake(text)
        val out = repaired.getOrElse(text)
        (id, if (repaired.isDefined) "mojibake" else "clean",
          text.length.toLong, out.length.toLong, out)
      }
      .toDF("doc_id", "verdict", "n_chars_in", "n_chars_out", "t")
      .select(col("doc_id"), col("verdict"), col("n_chars_in"),
        col("n_chars_out"), md5(col("t")).as("text_md5"))
  }

  /** q267: documents → synthesized payload bytes → sniff + decode:
    * (doc_id, encoding, bom_bytes, declared, n_chars, digest). */
  def charsetStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val (enc, bom, declared, text) = decode(payloadOf(id))
        (id, enc, bom.toLong, declared, text.length.toLong, text)
      }
      .toDF("doc_id", "encoding", "bom_bytes", "declared",
        "n_chars", "t")
      .select(col("doc_id"), col("encoding"), col("bom_bytes"),
        col("declared"), col("n_chars"), md5(col("t")).as("digest"))
  }
}
