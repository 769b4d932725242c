package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q305 IMA-ADPCM codec: the published tables'
  * structural signature, stream arithmetic, convergence, and the
  * error behavior the graded booleans summarize. */
class AdpcmImaSpec extends AnyFunSuite {
  import AdpcmIma._

  test("the step table carries the spec's structural signature: " +
      "89 entries, endpoints 7/32767, strictly increasing, every " +
      "adjacent ratio inside the ~1.1 geometric band") {
    assert(StepTable.length == 89)
    assert(StepTable.head == 7 && StepTable.last == 32767)
    for (i <- 1 until StepTable.length) {
      assert(StepTable(i) > StepTable(i - 1), s"not increasing at $i")
      val r = StepTable(i).toDouble / StepTable(i - 1)
      assert(r >= 1.04 && r <= 1.15,
        s"growth ratio $r at $i outside the spec's band")
    }
    assert(IndexTable.toSeq == Seq(-1, -1, -1, -1, 2, 4, 6, 8))
  }

  test("stream arithmetic: ceil(n/2) bytes, low nibble first, odd " +
      "tails zero-padded") {
    val s3 = Array[Short](100, -100, 500)
    val enc = encode(s3)
    assert(enc.length == 2)
    // the pad nibble of the last byte is zero
    assert(((enc(1) >> 4) & 0x0F) == 0)
    assert(decode(enc, 3).length == 3)
    intercept[IllegalArgumentException](decode(enc, 5))
  }

  test("a constant signal converges: after the attack the decoder " +
      "tracks within the smallest steps") {
    val src = Array.fill[Short](200)(1234)
    val dec = decode(encode(src), 200)
    val tail = (100 until 200).map(i => math.abs(dec(i) - 1234))
    assert(tail.max <= 8, s"constant tail error ${tail.max}")
  }

  test("triangle waves round-trip within the graded bounds at " +
      "every fixture shape, and the post-attack error is small " +
      "relative to amplitude") {
    for (id <- 0L until 32L) {
      val src = graft.operators.Multimodal.adpcmSamplesOf(id)
      val a = (1000 + (id % 8) * 400).toInt
      val dec = decode(encode(src), src.length)
      val errs = (graft.operators.Multimodal.AdpcmAttack
        until src.length).map(i => math.abs(dec(i) - src(i)))
      assert(errs.max <= a / 4, s"id $id max ${errs.max} amp $a")
      assert(errs.sum.toDouble / errs.size <= a / 16.0,
        s"id $id mean ${errs.sum.toDouble / errs.size} amp $a")
    }
  }

  test("q307 multi-block IMA WAV: a 3-block clip round-trips " +
      "through the container — every block header carries its first " +
      "sample verbatim, the step index RUNS ON across blocks (no " +
      "re-attack), and the fact chunk bounds the zero-padded tail") {
    import graft.operators.Multimodal
    val n = 1200 // > 2 * 505: three blocks, final one partial
    val src = Array.tabulate[Short](n) { i =>
      val p = 24; val a = 2600
      val ph = i % p
      (if (ph < p / 2) -a + (4 * a * ph) / p
       else a - (4 * a * (ph - p / 2)) / p).toShort
    }
    val wav = Multimodal.encodeWavIma(8000, src)
    val (fmt, rate, dec) = Multimodal.decodeWavCoded(wav).get
    assert(fmt == 0x11 && rate == 8000)
    assert(dec.length == n, "fact chunk must bound the tail")
    val spb = Multimodal.ImaSamplesPerBlock
    for (b <- 0 until (n + spb - 1) / spb)
      assert(dec(b * spb) == src(b * spb), s"block $b header sample")
    // index continuity: post-attack error stays small ACROSS block
    // boundaries (a re-attacking index would spike right after each
    // header)
    val errs = (100 until n).map(i => math.abs(dec(i) - src(i)))
    assert(errs.max <= 2600 / 4, s"cross-block max err ${errs.max}")
    // mu-law container transparency at the same length
    val muWav = Multimodal.encodeWavMulaw(8000, src)
    val (f2, _, d2) = Multimodal.decodeWavCoded(muWav).get
    assert(f2 == 7 && d2.sameElements(
      G711.mulawDecodeAll(G711.mulawEncodeAll(src))))
  }

  test("corrupt coded-WAV containers verdict None, never throw " +
      "(r15 ADVICE: metadata is untrusted — step index > 88, fact " +
      "count past the data chunk, sub-header blockAlign)") {
    import graft.operators.Multimodal
    val src = Array.tabulate[Short](600)(i => (i * 11 % 997).toShort)
    def find(hay: Array[Byte], tag: String): Int = {
      val t = tag.getBytes("US-ASCII")
      hay.indices.find(i => i + 4 <= hay.length &&
        hay(i) == t(0) && hay(i + 1) == t(1) &&
        hay(i + 2) == t(2) && hay(i + 3) == t(3)).get
    }
    // IMA: poison the first block's step-index byte (offset data+8+2)
    val ima = Multimodal.encodeWavIma(8000, src)
    val dataOff = find(ima, "data")
    val poisoned = ima.clone()
    poisoned(dataOff + 8 + 2) = 200.toByte // StepTable has 89 entries
    assert(Multimodal.decodeWavCoded(poisoned).isEmpty)
    // IMA: blockAlign too small to hold the 4-byte state header
    val fmtOff = find(ima, "fmt ")
    val badAlign = ima.clone()
    badAlign(fmtOff + 8 + 12) = 2.toByte // nBlockAlign LE16 := 2
    badAlign(fmtOff + 8 + 13) = 0.toByte
    assert(Multimodal.decodeWavCoded(badAlign).isEmpty)
    // mu-law: fact count far past the data chunk
    val mu = Multimodal.encodeWavMulaw(8000, src)
    val factOff = find(mu, "fact")
    val badFact = mu.clone()
    badFact(factOff + 8) = 0xFF.toByte // fact := huge LE32
    badFact(factOff + 9) = 0xFF.toByte
    badFact(factOff + 10) = 0x7F.toByte
    assert(Multimodal.decodeWavCoded(badFact).isEmpty)
    // IMA: fact count past what the data chunk's blocks can carry
    val imaFactOff = find(ima, "fact")
    val badImaFact = ima.clone()
    badImaFact(imaFactOff + 8) = 0xFF.toByte
    badImaFact(imaFactOff + 9) = 0xFF.toByte
    assert(Multimodal.decodeWavCoded(badImaFact).isEmpty)
    // untouched containers still decode
    assert(Multimodal.decodeWavCoded(ima).nonEmpty)
    assert(Multimodal.decodeWavCoded(mu).nonEmpty)
  }

  test("clamping: full-scale swings neither overflow nor wedge the " +
      "index (the spec's clamp rules)") {
    val src = Array.tabulate[Short](64)(i =>
      if (i % 2 == 0) 32767 else -32768)
    val dec = decode(encode(src), 64)
    assert(dec.forall(v => v >= -32768 && v <= 32767))
    // after the swing, a quiet tail re-converges
    val quiet = Array.fill[Short](300)(0)
    val both = src ++ quiet
    val d2 = decode(encode(both), both.length)
    val tail = (250 until 364).map(i => math.abs(d2(i).toInt))
    assert(tail.max <= 32, s"re-convergence tail ${tail.max}")
  }
}
