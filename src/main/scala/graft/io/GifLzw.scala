package graft.io

/** GIF87a container + the GIF flavor of LZW (variable-width codes,
  * LSB-first bit packing, clear/EOI codes, 12-bit dictionary cap) —
  * the remaining classic still-image format beside PNG (q67) and
  * JPEG (q68), and the only mainstream LOSSLESS dictionary codec in
  * the multimodal family (PNG is filter+deflate, JPEG is transform
  * coding). Public format: CompuServe GIF87a specification.
  *
  * Scope, stated loudly: GIF87a single-image, global color table
  * only, no interlace, no extensions (GIF89a graphic-control blocks
  * are skipped by the walker but their data is not interpreted) —
  * the LZW machinery and the container walk are exact, and decoding
  * is pixel-lossless by construction (spec-pinned against a
  * published 1x1 golden file and by encoder/decoder roundtrip over
  * every fixture). Everything is row-local: a 100 TB image corpus
  * shards by file with zero shuffle. */
object GifLzw {

  /** LZW-compress palette indices, GIF flavor: initial code width
    * minCodeSize+1, clear = 2^minCodeSize, EOI = clear+1, dictionary
    * grows to 4096 then a clear code resets it. Emits the initial
    * clear, the data codes, and the trailing EOI. LSB-first bit
    * packing. */
  def lzwEncode(indices: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream
    var cur = 0L
    var nbits = 0
    var width = minCodeSize + 1
    def put(code: Int): Unit = {
      cur |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        out.write((cur & 0xFF).toInt)
        cur >>>= 8
        nbits -= 8
      }
    }
    var dict = scala.collection.mutable.Map.empty[List[Int], Int]
    var nextCode = eoi + 1
    def resetDict(): Unit = {
      dict = scala.collection.mutable.Map.empty
      nextCode = eoi + 1
      width = minCodeSize + 1
    }
    put(clear)
    resetDict()
    var prefix = List.empty[Int]
    var prefixCode = -1
    indices.foreach { sym =>
      require(sym >= 0 && sym < clear, s"index $sym out of palette")
      val cand = sym :: prefix // reversed storage, head = newest
      val candCode = if (prefix.isEmpty) sym else dict.getOrElse(cand, -1)
      if (candCode >= 0) { prefix = cand; prefixCode = candCode }
      else {
        put(prefixCode)
        if (nextCode < 4096) {
          dict(cand) = nextCode
          nextCode += 1
          // width grows one code EARLIER than the decoder's rule
          // (the decoder's table lags the encoder by exactly one
          // entry), 12-bit cap
          if (nextCode == (1 << width) + 1 && width < 12) width += 1
        } else {
          // dictionary full (codes 0..4095 assigned): clear and
          // rebuild — 4096 itself is never a legal code
          put(clear)
          resetDict()
        }
        prefix = List(sym)
        prefixCode = sym
      }
    }
    if (prefixCode >= 0) put(prefixCode)
    put(eoi)
    if (nbits > 0) out.write((cur & 0xFF).toInt)
    out.toByteArray
  }

  /** LZW-decompress to exactly `n` palette indices. Fails loud on a
    * malformed stream (bad first code, code beyond the table, missing
    * EOI, or pixel overflow). */
  def lzwDecode(data: Array[Byte], minCodeSize: Int,
      n: Int): Array[Int] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Int](n)
    var outPos = 0
    var cur = 0L
    var nbits = 0
    var pos = 0
    var width = minCodeSize + 1
    // table: code -> (suffix symbol, prefix code | -1); roots implicit
    var suffix = new Array[Int](4096)
    var prefixOf = new Array[Int](4096)
    var nextCode = eoi + 1
    def resetTable(): Unit = { nextCode = eoi + 1; width = minCodeSize + 1 }
    def expand(codeIn: Int): Array[Int] = {
      var code = codeIn
      val rev = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (code >= clear + 2) {
        rev += suffix(code)
        code = prefixOf(code)
      }
      rev += code
      rev.reverseIterator.toArray
    }
    def read(): Int = {
      while (nbits < width) {
        require(pos < data.length, "LZW stream truncated")
        cur |= (data(pos) & 0xFFL) << nbits
        pos += 1
        nbits += 8
      }
      val c = (cur & ((1L << width) - 1)).toInt
      cur >>>= width
      nbits -= width
      c
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == eoi) done = true
      else if (code == clear) { resetTable(); prev = -1 }
      else {
        require(code < nextCode || (code == nextCode && prev >= 0),
          s"LZW code $code beyond table ($nextCode)")
        val entry =
          if (code < clear) Array(code)
          else if (code < nextCode) expand(code)
          else { // KwKwK case: cScSc from the previous entry
            val p = expand(prev)
            p :+ p.head
          }
        require(outPos + entry.length <= n,
          s"LZW output overflow at $outPos + ${entry.length} > $n")
        entry.foreach { s => out(outPos) = s; outPos += 1 }
        if (prev >= 0 && nextCode < 4096) {
          suffix(nextCode) = entry.head
          prefixOf(nextCode) = prev
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outPos == n, s"LZW produced $outPos of $n pixels")
    out
  }

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  /** Build a GIF87a file: header, logical screen descriptor with a
    * global color table of 2^bpp entries, one image descriptor, the
    * LZW data in <=255-byte sub-blocks, trailer. */
  def buildGif(w: Int, h: Int, palette: Array[Int],
      indices: Array[Int]): Array[Byte] = {
    require(Set(2, 4, 8, 16).contains(palette.length) ||
      palette.length == 32 || palette.length == 64 ||
      palette.length == 128 || palette.length == 256,
      s"palette size ${palette.length} not a power of two >= 2")
    val bpp = 31 - Integer.numberOfLeadingZeros(palette.length)
    require(indices.length == w * h, "index raster size")
    val out = new java.io.ByteArrayOutputStream
    out.write("GIF87a".getBytes("US-ASCII"))
    out.write(u16le(w)); out.write(u16le(h))
    // GCT present, color resolution bpp, GCT size bpp
    out.write(0x80 | ((bpp - 1) << 4) | (bpp - 1))
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    palette.foreach { rgb =>
      out.write((rgb >> 16) & 0xFF)
      out.write((rgb >> 8) & 0xFF)
      out.write(rgb & 0xFF)
    }
    out.write(0x2C) // image separator
    out.write(u16le(0)); out.write(u16le(0))
    out.write(u16le(w)); out.write(u16le(h))
    out.write(0) // no LCT, no interlace
    val minCode = math.max(2, bpp)
    out.write(minCode)
    val lzw = lzwEncode(indices, minCode)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len)
      out.write(lzw, off, len)
      off += len
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  final case class Gif(w: Int, h: Int, palette: Array[Int],
      indices: Array[Int])

  /** Parse a GIF87a/89a file: header, screen descriptor, global
    * color table, extension blocks SKIPPED by sub-block walking
    * (structure honored, content uninterpreted), first image
    * descriptor decoded. Fails loud on anything else. */
  def parseGif(bytes: Array[Byte]): Gif = {
    var p = 0
    def u8(): Int = { val v = bytes(p) & 0xFF; p += 1; v }
    def u16(): Int = { val v = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8); p += 2; v }
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"bad signature $sig")
    p = 6
    val w = u16(); val h = u16()
    val flags = u8()
    u8(); u8() // background index, aspect
    require((flags & 0x80) != 0, "constrained profile: GCT required")
    val gctSize = 2 << (flags & 7)
    val palette = Array.fill(gctSize) {
      val r = u8(); val g = u8(); val b = u8()
      (r << 16) | (g << 8) | b
    }
    while (true) {
      u8() match {
        case 0x2C =>
          val ix = u16(); val iy = u16()
          val iw = u16(); val ih = u16()
          val iflags = u8()
          require(ix == 0 && iy == 0 && iw == w && ih == h,
            "constrained profile: one full-frame image")
          require((iflags & 0x80) == 0, "constrained profile: no LCT")
          require((iflags & 0x40) == 0, "constrained profile: no interlace")
          val minCode = u8()
          val data = new java.io.ByteArrayOutputStream
          var len = u8()
          while (len != 0) {
            data.write(bytes, p, len)
            p += len
            len = u8()
          }
          return Gif(w, h, palette,
            lzwDecode(data.toByteArray, minCode, w * h))
        case 0x21 => // extension: label + sub-blocks, skipped
          u8()
          var len = u8()
          while (len != 0) { p += len; len = u8() }
        case 0x3B => sys.error("trailer before any image")
        case b => sys.error(f"unknown GIF block 0x$b%02x")
      }
    }
    sys.error("unreachable")
  }
}
