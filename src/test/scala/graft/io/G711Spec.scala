package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q306 G.711 codecs: the canonical all-codes round
  * trip, published anchor codes, sign/monotonicity structure, and
  * quantization-error bounds. */
class G711Spec extends AnyFunSuite {
  import G711._

  test("CANONICAL identity: encode(decode(c)) == c for all 256 " +
      "A-law codes and all mu-law codes EXCEPT the negative-zero " +
      "alias 0x7F (which decodes to 0 and re-encodes to the " +
      "canonical +0 code 0xFF — the spec's one many-to-one point)") {
    for (c <- 0 until 256) {
      if (c != 0x7F)
        assert(mulawEncode(mulawDecode(c)) == c, f"mu-law code $c%02x")
      assert(alawEncode(alawDecode(c)) == c, f"A-law code $c%02x")
    }
    assert(mulawDecode(0x7F) == 0)
    assert(mulawEncode(mulawDecode(0x7F)) == 0xFF)
  }

  test("published anchors: mu-law silence 0xFF / +max 0x80; " +
      "A-law silence 0xD5 / +max 0xAA") {
    assert(mulawEncode(0) == 0xFF)
    assert(mulawDecode(0xFF) == 0)
    assert(mulawEncode(32767) == 0x80)
    assert(alawEncode(0) == 0xD5)
    assert(alawDecode(0xD5) == 8, "A-law 0xD5 decodes to -8? sign?")
    assert(alawEncode(32767) == 0xAA)
  }

  test("decode is sign-correct and monotone within each sign") {
    assert(mulawDecode(mulawEncode(-5000)) < 0)
    assert(mulawDecode(mulawEncode(5000)) > 0)
    assert(alawDecode(alawEncode(-5000)) < 0)
    assert(alawDecode(alawEncode(5000)) > 0)
    // decoded magnitudes grow with input magnitude
    val mus = (0 to 32000 by 250).map(x => mulawDecode(mulawEncode(x)))
    assert(mus == mus.sorted, "mu-law decode not monotone")
    val als = (0 to 32000 by 250).map(x => alawDecode(alawEncode(x)))
    assert(als == als.sorted, "A-law decode not monotone")
  }

  test("quantization error is logarithmically bounded: " +
      "|decode(encode(x)) - x| <= max(|x|/16 + 132, 136) for mu-law " +
      "and <= max(|x|/16 + 16, 64) for A-law over the full range") {
    var x = -32768
    while (x <= 32767) {
      val mu = mulawDecode(mulawEncode(x))
      assert(math.abs(mu - x) <= math.max(math.abs(x) / 16 + 132, 136),
        s"mu-law err at $x: ${mu - x}")
      val al = alawDecode(alawEncode(x))
      assert(math.abs(al - x) <= math.max(math.abs(x) / 16 + 16, 64),
        s"A-law err at $x: ${al - x}")
      x += 7
    }
  }
}
