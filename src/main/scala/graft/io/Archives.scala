package graft.io

/** ZIP and TAR (ustar) container walking — the archive formats a
  * training corpus actually arrives in (dataset dumps, code corpora,
  * doc bundles). Public formats: PKWARE APPNOTE (ZIP) and POSIX
  * ustar (TAR).
  *
  * The ZIP walker reads the CENTRAL DIRECTORY (the authoritative
  * index, like real unzippers — local headers are then
  * cross-checked against it), supports methods 0 (stored) and 8
  * (deflate, raw/nowrap via the JDK Inflater), and verifies each
  * entry's CRC-32 after extraction. The TAR walker validates each
  * 512-byte ustar header's checksum (the spec's space-filled
  * octal-sum rule), magic, and octal size fields, and honors the
  * 512-byte content padding and the two-zero-block terminator.
  * Anything outside the stated subset (zip64, encryption, other
  * methods, GNU long names) rejects loudly. Row-local: archives
  * shard by file. */
object Archives {

  final case class Entry(name: String, data: Array[Byte],
      method: Int)

  // ---- ZIP -------------------------------------------------------

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
      ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)

  private def crc32(data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32
    c.update(data)
    c.getValue
  }

  /** Build a ZIP: local headers + data, central directory, end
    * record. Entries alternate stored / deflate by position. */
  def buildZip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    val centrals = Seq.newBuilder[Array[Byte]]
    entries.zipWithIndex.foreach { case ((name, data), i) =>
      val method = if (i % 2 == 0) 0 else 8
      val comp =
        if (method == 0) data
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          val buf = new Array[Byte](data.length * 2 + 64)
          val n = d.deflate(buf)
          require(d.finished(), "deflate did not finish")
          d.end()
          buf.take(n)
        }
      val nameB = name.getBytes("US-ASCII")
      val offset = out.size()
      val crc = crc32(data)
      out.write(Array(0x50, 0x4B, 0x03, 0x04).map(_.toByte))
      w16(20); w16(0); w16(method); w16(0); w16(0x21)
      w32(crc); w32(comp.length); w32(data.length)
      w16(nameB.length); w16(0)
      out.write(nameB); out.write(comp)
      val cd = new java.io.ByteArrayOutputStream
      def c16(v: Int): Unit = { cd.write(v & 0xFF); cd.write((v >> 8) & 0xFF) }
      def c32(v: Long): Unit = {
        cd.write((v & 0xFF).toInt); cd.write(((v >> 8) & 0xFF).toInt)
        cd.write(((v >> 16) & 0xFF).toInt); cd.write(((v >> 24) & 0xFF).toInt)
      }
      cd.write(Array(0x50, 0x4B, 0x01, 0x02).map(_.toByte))
      c16(20); c16(20); c16(0); c16(method); c16(0); c16(0x21)
      c32(crc); c32(comp.length); c32(data.length)
      c16(nameB.length); c16(0); c16(0); c16(0); c16(0)
      c32(0); c32(offset)
      cd.write(nameB)
      centrals += cd.toByteArray
    }
    val cdStart = out.size()
    centrals.result().foreach(out.write)
    val cdSize = out.size() - cdStart
    out.write(Array(0x50, 0x4B, 0x05, 0x06).map(_.toByte))
    w16(0); w16(0); w16(entries.size); w16(entries.size)
    w32(cdSize); w32(cdStart)
    w16(0)
    out.toByteArray
  }

  /** Walk a ZIP via its central directory; extract and CRC-verify
    * every entry. */
  def walkZip(zip: Array[Byte]): Seq[Entry] = {
    // find end-of-central-directory (no comment in the carried
    // profile: it is the last 22 bytes)
    val eocd = zip.length - 22
    require(eocd >= 0 && u32(zip, eocd) == 0x06054B50L,
      "no end-of-central-directory record")
    require(u16(zip, eocd + 20) == 0, "carried profile: no comment")
    val n = u16(zip, eocd + 10)
    require(u16(zip, eocd + 8) == n, "multi-disk archives unsupported")
    val cdStart = u32(zip, eocd + 16).toInt
    var p = cdStart
    (0 until n).map { _ =>
      require(u32(zip, p) == 0x02014B50L, "bad central header")
      val method = u16(zip, p + 10)
      val crc = u32(zip, p + 16)
      val compSize = u32(zip, p + 20).toInt
      val rawSize = u32(zip, p + 24).toInt
      val nameLen = u16(zip, p + 28)
      val extraLen = u16(zip, p + 30)
      val cmtLen = u16(zip, p + 32)
      val lho = u32(zip, p + 42).toInt
      val name = new String(zip, p + 46, nameLen, "US-ASCII")
      p += 46 + nameLen + extraLen + cmtLen
      // cross-check the local header
      require(u32(zip, lho) == 0x04034B50L, s"bad local header: $name")
      require(u16(zip, lho + 8) == method, s"method mismatch: $name")
      val lNameLen = u16(zip, lho + 26)
      val lExtraLen = u16(zip, lho + 28)
      require(new String(zip, lho + 30, lNameLen, "US-ASCII") == name,
        s"local/central name mismatch at $lho")
      val dataAt = lho + 30 + lNameLen + lExtraLen
      val comp = zip.slice(dataAt, dataAt + compSize)
      val data = method match {
        case 0 =>
          require(compSize == rawSize, s"stored size mismatch: $name")
          comp
        case 8 =>
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(comp)
          val buf = new Array[Byte](rawSize)
          var got = 0
          while (got < rawSize && !inf.finished()) {
            val k = inf.inflate(buf, got, rawSize - got)
            require(k > 0 || inf.finished(), s"inflate stall: $name")
            got += k
          }
          inf.end()
          require(got == rawSize, s"inflated $got of $rawSize: $name")
          buf
        case m => sys.error(s"compression method $m unsupported: $name")
      }
      require(crc32(data) == crc, s"CRC-32 mismatch: $name")
      Entry(name, data, method)
    }
  }

  // ---- TAR (ustar) ----------------------------------------------

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s + "\u0000"
    require(pad.length == width, s"octal field overflow: $v")
    pad.getBytes("US-ASCII")
  }

  /** Build a POSIX ustar archive (regular files only). */
  def buildTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    entries.foreach { case (name, data) =>
      val hdr = new Array[Byte](512)
      val nameB = name.getBytes("US-ASCII")
      require(nameB.length <= 100, "name too long for ustar")
      Array.copy(nameB, 0, hdr, 0, nameB.length)
      Array.copy(octal(420, 8), 0, hdr, 100, 8) // mode 0644
      Array.copy(octal(0, 8), 0, hdr, 108, 8)
      Array.copy(octal(0, 8), 0, hdr, 116, 8)
      Array.copy(octal(data.length, 12), 0, hdr, 124, 12)
      Array.copy(octal(0, 12), 0, hdr, 136, 12) // mtime
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum spaces
      hdr(156) = '0' // typeflag: regular file
      Array.copy("ustar\u000000".getBytes("US-ASCII"), 0, hdr, 257, 8)
      val sum = hdr.map(_ & 0xFF).sum
      Array.copy(octal(sum, 7), 0, hdr, 148, 7)
      hdr(155) = ' '
      out.write(hdr)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // two zero blocks
    out.toByteArray
  }

  /** Walk a ustar archive, validating each header's checksum, magic
    * and size fields. */
  def walkTar(tar: Array[Byte]): Seq[Entry] = {
    val out = Seq.newBuilder[Entry]
    var p = 0
    var done = false
    while (!done) {
      require(p + 512 <= tar.length, "tar truncated at header")
      val hdr = tar.slice(p, p + 512)
      if (hdr.forall(_ == 0)) done = true
      else {
        val magic = new String(hdr, 257, 5, "US-ASCII")
        require(magic == "ustar", s"bad ustar magic '$magic'")
        // checksum: stored field treated as spaces
        val stored = Integer.parseInt(
          new String(hdr, 148, 8, "US-ASCII")
            .takeWhile(c => c >= '0' && c <= '7'), 8)
        val copy = hdr.clone
        java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
        require(copy.map(_ & 0xFF).sum == stored,
          s"tar header checksum mismatch at $p")
        val name = new String(hdr, 0, 100, "US-ASCII")
          .takeWhile(_ != '\u0000')
        require(hdr(156) == '0' || hdr(156) == 0,
          s"carried profile: regular files only (${hdr(156)})")
        val size = java.lang.Long.parseLong(
          new String(hdr, 124, 12, "US-ASCII")
            .takeWhile(c => c >= '0' && c <= '7'), 8).toInt
        val data = tar.slice(p + 512, p + 512 + size)
        require(data.length == size, "tar truncated at content")
        out += Entry(name, data, 0)
        p += 512 + size + (512 - size % 512) % 512
      }
    }
    out.result()
  }
}
