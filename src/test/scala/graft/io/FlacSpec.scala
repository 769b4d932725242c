package graft.io

import org.scalatest.funsuite.AnyFunSuite

class FlacSpec extends AnyFunSuite {

  test("CRC golden pins from the published polynomials: CRC-8(0x07) " +
      "and CRC-16(0x8005) over known vectors") {
    // '123456789' check values: CRC-8/0x07 init 0 -> 0xF4;
    // CRC-16/BUYPASS (0x8005, init 0, no reflect) -> 0xFEE8
    val v = "123456789".getBytes("US-ASCII")
    assert(Flac.crc8(v, v.length) == 0xF4)
    assert(Flac.crc16(v, v.length) == 0xFEE8)
  }

  test("fixed predictors: residual+restore is exact for every order " +
      "0..4 over ramps, sines and noise") {
    val rnd = new scala.util.Random(11)
    val shapes = Seq(
      Array.tabulate(500)(i => i % 3000 - 1500),
      Array.tabulate(500)(i => (math.sin(i / 17.0) * 12000).toInt),
      Array.tabulate(500)(_ => rnd.nextInt(65536) - 32768))
    for (x <- shapes; o <- 0 to 4) {
      val res = Flac.residuals(x, o)
      assert(Flac.restore(x.take(o), res, o).sameElements(x), s"o=$o")
    }
  }

  test("full encode/decode roundtrip: constants, ramps, noise, " +
      "multi-frame streams and non-multiple-of-blocksize tails — " +
      "lossless, frame census right, STREAMINFO MD5 verified") {
    val rnd = new scala.util.Random(3)
    val streams = Seq(
      Array.fill(100)(1234),
      Array.tabulate(4096)(i => i % 5000 - 2500),
      Array.tabulate(10000)(i => (math.sin(i / 9.0) * 9000).toInt +
        (i % 7)),
      Array.tabulate(9000)(_ => rnd.nextInt(65536) - 32768),
      Array.tabulate(4097)(i => if (i < 2000) 7 else i % 101 - 50))
    streams.zipWithIndex.foreach { case (x, i) =>
      val enc = Flac.encode(x)
      val dec = Flac.decode(enc)
      assert(dec.samples.sameElements(x), s"stream $i lossless")
      assert(dec.nFrames == (x.length + Flac.BlockSize - 1) /
        Flac.BlockSize, s"stream $i frames")
      assert(dec.md5Ok, s"stream $i md5")
      assert(dec.sampleRate == 44100)
    }
  }

  test("every integrity layer trips on a single flipped bit: header " +
      "CRC-8, frame CRC-16, and the STREAMINFO MD5") {
    val x = Array.tabulate(600)(i => (i * 37) % 4001 - 2000)
    val enc = Flac.encode(x)
    // find the first frame: after fLaC + 4-byte block header + 34+16?
    // STREAMINFO is 34 bytes INCLUDING the md5 (18 + 16)
    val frameAt = 4 + 4 + 34
    assert((enc(frameAt) & 0xFF) == 0xFF, "frame sync position")
    // flip a bit in the frame header (blocksize field)
    val badHead = enc.clone
    badHead(frameAt + 4) = (badHead(frameAt + 4) ^ 0x01).toByte
    intercept[Exception](Flac.decode(badHead))
    // flip a bit deep in the subframe body
    val badBody = enc.clone
    badBody(frameAt + 12) = (badBody(frameAt + 12) ^ 0x10).toByte
    intercept[Exception](Flac.decode(badBody))
    // flip a bit in the stored MD5: structure decodes, md5Ok = false
    val badMd5 = enc.clone
    badMd5(4 + 4 + 18) = (badMd5(4 + 4 + 18) ^ 0x01).toByte
    assert(!Flac.decode(badMd5).md5Ok)
  }

  test("constrained-profile rejects are loud: LPC subframe type and " +
      "Rice escape parameter") {
    val x = Array.tabulate(64)(i => i * 11 - 300)
    val enc = Flac.encode(x)
    // corrupting the subframe type byte to LPC (1xxxxx) — locate the
    // subframe byte: frame header is 4 bytes fixed + 1 utf8 + 2
    // blocksize + 1 crc8 = 8 bytes
    val sub = 4 + 4 + 34 + 8
    val bad = enc.clone
    bad(sub) = 0x40.toByte // pad 0, type 100000 (LPC order 1)
    val e = intercept[Exception](Flac.decode(bad))
    assert(e.getMessage.contains("LPC") ||
      e.getMessage.contains("CRC"), e.getMessage)
  }

  test("subframe type choice is cost-driven: constant input yields " +
      "a tiny file, noise falls back toward verbatim cost, ramps " +
      "compress via the difference cascade") {
    val const = Flac.encode(Array.fill(4096)(99))
    val ramp = Flac.encode(Array.tabulate(4096)(i => i % 8000 - 4000))
    val rnd = new scala.util.Random(5)
    val noise = Flac.encode(
      Array.tabulate(4096)(_ => rnd.nextInt(65536) - 32768))
    assert(const.length < 100, s"constant file ${const.length}")
    assert(ramp.length < noise.length / 2,
      s"ramp ${ramp.length} vs noise ${noise.length}")
    // noise can't compress below raw 16-bit by more than overhead
    assert(noise.length > 4096 * 2 * 9 / 10, s"noise ${noise.length}")
  }
}
