package graft.io

import org.scalatest.funsuite.AnyFunSuite

class GifLzwSpec extends AnyFunSuite {

  test("PUBLISHED golden: the canonical 1x1 GIF89a decodes to one " +
      "pixel of palette index 0 (clear, 0, EOI at 3-bit LSB-first " +
      "packing — the classic tracking-pixel bytes)") {
    // The widely-published minimal GIF: 1x1, 2-entry GCT
    // (white, black), image data sub-block 02 44 01.
    val bytes: Array[Byte] = Array(
      'G', 'I', 'F', '8', '9', 'a',
      0x01, 0x00, 0x01, 0x00, // 1 x 1
      0x80, 0x00, 0x00,       // GCT, 1 bpp
      0xFF, 0xFF, 0xFF, 0x00, 0x00, 0x00, // palette
      0x2C, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0x02,             // LZW min code size
      0x02, 0x44, 0x01, // one sub-block: clear, 0, EOI
      0x00, 0x3B).map(_.toByte)
    val g = GifLzw.parseGif(bytes)
    assert(g.w == 1 && g.h == 1)
    assert(g.palette.toSeq == Seq(0xFFFFFF, 0x000000))
    assert(g.indices.toSeq == Seq(0))
  }

  test("LZW roundtrip across pattern shapes: constant, alternating, " +
      "ramps, pseudo-random — including rasters long enough to grow " +
      "the code width several times") {
    val rnd = new scala.util.Random(42)
    val shapes = Seq(
      Array.fill(1)(0),
      Array.fill(4096)(1),
      Array.tabulate(5000)(i => i % 4),
      Array.tabulate(3000)(i => (i * i + i / 7) % 4),
      Array.tabulate(8192)(_ => rnd.nextInt(4)))
    for ((px, k) <- shapes.zipWithIndex; minCode <- Seq(2, 4)) {
      val enc = GifLzw.lzwEncode(px, minCode)
      val dec = GifLzw.lzwDecode(enc, minCode, px.length)
      assert(dec.sameElements(px), s"shape $k minCode $minCode")
    }
  }

  test("LZW dictionary saturation: a raster with enough distinct " +
      "phrases to fill 4096 codes forces a mid-stream clear and " +
      "still roundtrips exactly") {
    val rnd = new scala.util.Random(7)
    val px = Array.tabulate(120000)(_ => rnd.nextInt(16))
    val enc = GifLzw.lzwEncode(px, 4)
    assert(GifLzw.lzwDecode(enc, 4, px.length).sameElements(px))
  }

  test("KwKwK: the cScSc pattern that makes the decoder read a code " +
      "it has not finished defining") {
    // 'aabbb...' shapes exercise code==nextCode; brute-force many
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val px = Array.tabulate(64) { i =>
        if (i < 3) 0 else rnd.nextInt(2)
      }
      val enc = GifLzw.lzwEncode(px, 2)
      assert(GifLzw.lzwDecode(enc, 2, px.length).sameElements(px),
        s"seed $seed")
    }
  }

  test("container roundtrip: build -> parse recovers dims, palette " +
      "and every pixel; GIF89a extensions are walked over") {
    val palette = Array(0x102030, 0x405060, 0x708090, 0xA0B0C0)
    val px = Array.tabulate(24 * 16)(i => (i * 7 + 3) % 4)
    val gif = GifLzw.buildGif(24, 16, palette, px)
    val g = GifLzw.parseGif(gif)
    assert(g.w == 24 && g.h == 16)
    assert(g.palette.toSeq == palette.toSeq)
    assert(g.indices.sameElements(px))
    // splice a GIF89a graphic-control extension before the image
    // descriptor: the walker must skip it by sub-block structure
    val imgAt = gif.indexWhere(_ == 0x2C.toByte, 13 + 12)
    val ext = Array(0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00)
      .map(_.toByte)
    val spliced = gif.take(imgAt) ++ ext ++ gif.drop(imgAt)
    assert(GifLzw.parseGif(spliced).indices.sameElements(px))
  }

  test("malformed inputs fail loud: bad signature, truncated LZW, " +
      "pixel overflow, trailer before image, unknown block") {
    val palette = Array(0x000000, 0xFFFFFF)
    val px = Array.tabulate(8)(_ % 2)
    val gif = GifLzw.buildGif(4, 2, palette, px)
    intercept[RuntimeException](
      GifLzw.parseGif("NOTGIF".getBytes("US-ASCII") ++ gif.drop(6)))
    intercept[RuntimeException](
      GifLzw.lzwDecode(Array[Byte](0x04), 2, 100))
    intercept[RuntimeException](GifLzw.parseGif(
      gif.take(13 + 6) ++ Array(0x3B.toByte)))
    // decoding with the wrong expected pixel count must not pass
    val data = GifLzw.lzwEncode(px, 2)
    intercept[IllegalArgumentException](
      GifLzw.lzwDecode(data, 2, px.length + 1))
  }
}
