package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q267 sniffing order (BOM wins, meta fallback, utf-8
  * default), BOM stripping, and byte-order correctness. */
class CharsetSpec extends AnyFunSuite with SparkSessionSpec {

  test("every BOM variant decodes to the same body text and the " +
      "BOM never leaks into it") {
    for (id <- Seq(0L, 1L, 2L)) {
      val (enc, bom, declared, text) =
        Charset.decode(Charset.payloadOf(id))
      assert(text == Charset.bodyOf(id), s"variant $id decode")
      assert(bom == (if (id == 0L) 3 else 2))
      assert(declared == "")
      assert(enc == Seq("utf-8", "utf-16le", "utf-16be")(id.toInt))
    }
  }

  test("a BOM-less payload falls back to the meta declaration; no " +
      "declaration means utf-8") {
    val (enc, bom, declared, text) =
      Charset.decode(Charset.payloadOf(3L))
    assert(enc == "iso-8859-1" && declared == "iso-8859-1" && bom == 0)
    assert(text == Charset.metaHtmlOf(3L))
    val (enc2, _, dec2, t2) =
      Charset.decode("plain bytes".getBytes("US-ASCII"))
    assert(enc2 == "utf-8" && dec2 == "" && t2 == "plain bytes")
  }

  test("a BOM beats a contradicting meta declaration (the " +
      "standard's precedence)") {
    val bytes = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "<meta charset=\"utf-16le\"> x".getBytes("UTF-8")
    val (enc, bom, _, text) = Charset.decode(bytes)
    assert(enc == "utf-8" && bom == 3)
    assert(text.startsWith("<meta"))
  }

  test("an unsupported meta-declared charset yields a FLAGGED row " +
      "(encoding=unknown, empty text), never a task-killing throw") {
    val bytes = ("<html><head><meta charset=\"koi8-r\"></head>" +
      "<body>x</body></html>").getBytes("US-ASCII")
    val (enc, bom, declared, text) = Charset.decode(bytes)
    assert(enc == "unknown" && bom == 0)
    assert(declared == "koi8-r", "the declaration stays auditable")
    assert(text == "")
  }

  test("q308 mojibake: the double-encoded twin repairs EXACTLY to " +
      "the clean text; ASCII and genuine Latin-1-ish text stay " +
      "untouched; a twice-garbled text peels one layer per pass") {
    val clean = Charset.cleanBodyOf(7L)
    val bad = Charset.mojibakeBodyOf(7L)
    assert(bad != clean && bad.contains("Ã©"))
    assert(Charset.repairMojibake(bad).contains(clean))
    assert(Charset.repairMojibake("plain ascii").isEmpty)
    // genuine single é: its Latin-1 byte E9 is not valid UTF-8 here
    assert(Charset.repairMojibake("café x").isEmpty)
    // double corruption peels exactly one layer per repair
    val twice = new String(bad.getBytes("UTF-8"), "ISO-8859-1")
    assert(Charset.repairMojibake(twice).contains(bad))
    assert(Charset.repairMojibake(bad).contains(clean))
    // chars above U+00FF can never be the product of a Latin-1
    // mis-decode — a clean CJK/'€' doc must NOT be flagged (its
    // Latin-1 bytes would be '?' — valid UTF-8 differing from the
    // input, the r15 ADVICE silent-corruption path)
    assert(Charset.repairMojibake("€ 42 off").isEmpty)
    assert(Charset.repairMojibake("日本語のテキスト").isEmpty)
    assert(Charset.repairMojibake("mixed café 中").isEmpty)
  }

  test("byte order genuinely matters: swapping the UTF-16 BOM " +
      "produces different decoded text") {
    val le = Charset.decode(Charset.payloadOf(1L))._4
    // reinterpret the LE payload as BE by flipping the BOM
    val flipped = Charset.payloadOf(1L).clone()
    flipped(0) = 0xFE.toByte; flipped(1) = 0xFF.toByte
    val be = Charset.decode(flipped)._4
    assert(le != be, "LE/BE must not decode identically")
  }
}
