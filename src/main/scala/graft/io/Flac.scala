package graft.io

/** FLAC at a constrained profile — the LOSSLESS audio codec of the
  * multimodal family (WAV q54 is raw PCM, ADPCM q305 and G.711 q306
  * are lossy): the real bit format — "fLaC" marker, STREAMINFO with
  * the spec's decoded-audio MD5, frame headers with sync code,
  * UTF-8-coded frame numbers and CRC-8, subframes (CONSTANT,
  * VERBATIM, FIXED predictors order 0–4), Rice-coded residuals
  * (zigzag fold, unary quotient = zeros-then-one, 4-bit parameter),
  * and the frame-trailing CRC-16.
  *
  * Constrained profile, stated loudly: mono, 16-bit, 44.1 kHz,
  * explicit 16-bit blocksize in every frame header, one Rice
  * partition per subframe (partition order 0), no LPC subframes and
  * no Rice escape codes — both are loud decode rejects, never
  * misparses. Every carried layer is the published format: a
  * conforming decoder reads these streams at this profile, and the
  * THREE integrity layers (header CRC-8, frame CRC-16, STREAMINFO
  * MD5 over the decoded samples) mean a single flipped bit anywhere
  * fails loudly. Row-local: an audio corpus shards by file. */
object Flac {

  val BlockSize = 4096

  // ---- CRCs (FLAC polynomials) ----------------------------------
  // Table-driven (one 256-entry table per polynomial, the standard
  // byte-at-a-time construction): every frame's bytes are CRC'd on
  // encode AND re-checked on decode, so the former 8-steps-per-byte
  // inner loop was ~16 shift/xor ops per corpus byte on the q333
  // battery path. Same polynomials, same init, bit-identical CRCs.

  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var crc = n
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
              else (crc << 1) & 0xFF
        b += 1
      }
      t(n) = crc
      n += 1
    }
    t
  }

  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var crc = n << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        b += 1
      }
      t(n) = crc
      n += 1
    }
    t
  }

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0. */
  def crc8(bytes: Array[Byte], len: Int): Int = {
    var crc = 0
    var i = 0
    while (i < len) {
      crc = Crc8Table(crc ^ (bytes(i) & 0xFF))
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0. */
  def crc16(bytes: Array[Byte], len: Int): Int = {
    var crc = 0
    var i = 0
    while (i < len) {
      crc = (Crc16Table(((crc >> 8) ^ (bytes(i) & 0xFF)) & 0xFF) ^
        (crc << 8)) & 0xFFFF
      i += 1
    }
    crc
  }

  // ---- MSB-first bit I/O (FLAC's bit order) ---------------------

  final class MsbWriter {
    private val out = new java.io.ByteArrayOutputStream
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Long, n: Int): Unit = {
      // chunked: up to 8 bits per step (the bit-at-a-time loop was
      // the q333 battery's hot path — ~6 ops/bit over 40M samples)
      var rem = n
      while (rem > 0) {
        val take = math.min(8 - nbits, rem)
        cur = (cur << take) |
          ((v >>> (rem - take)) & ((1L << take) - 1)).toInt
        nbits += take
        rem -= take
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
      }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBits(0, 1); i += 1 }
      writeBits(1, 1)
    }
    /** Byte-align with zero bits (frame headers/footers are
      * byte-aligned in FLAC). */
    def align(): Unit = if (nbits != 0) writeBits(0, 8 - nbits)
    def toBytes: Array[Byte] = { require(nbits == 0, "unaligned"); out.toByteArray }
  }

  final class MsbReader(bytes: Array[Byte], var pos: Int) {
    private var bit = 0
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def readBits(n: Int): Long = {
      var v = 0L
      var rem = n
      while (rem > 0) {
        require(pos < bytes.length, "FLAC stream truncated")
        val avail = 8 - bit
        val take = math.min(avail, rem)
        val chunk = (bytes(pos) >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        bit += take
        rem -= take
        if (bit == 8) { bit = 0; pos += 1 }
      }
      v
    }
    def readUnary(): Int = {
      var q = 0
      while (readBits(1) == 0) {
        q += 1
        require(q < (1 << 20), "runaway unary")
      }
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  /** The decoded audio as little-endian 16-bit bytes — the exact
    * byte stream STREAMINFO's MD5 is defined over. One bulk array
    * per call: the former two single-byte MessageDigest.update calls
    * PER SAMPLE (4 per sample across encode+decode) were the q333
    * battery's top allocation-free hot path. */
  private def samplesLe(samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      out(i * 2) = (s & 0xFF).toByte
      out(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  // ---- fixed predictors -----------------------------------------

  private val FixCoef: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  def residuals(x: Array[Int], order: Int): Array[Int] = {
    val c = FixCoef(order)
    Array.tabulate(x.length - order) { j =>
      val i = j + order
      var pred = 0
      var k = 0
      while (k < order) { pred += c(k) * x(i - 1 - k); k += 1 }
      x(i) - pred
    }
  }

  def restore(warm: Array[Int], res: Array[Int], order: Int)
      : Array[Int] = {
    val c = FixCoef(order)
    val out = new Array[Int](warm.length + res.length)
    Array.copy(warm, 0, out, 0, warm.length)
    var j = 0
    while (j < res.length) {
      val i = j + order
      var pred = 0
      var k = 0
      while (k < order) { pred += c(k) * out(i - 1 - k); k += 1 }
      out(i) = pred + res(j)
      j += 1
    }
    out
  }

  // ---- encode ----------------------------------------------------

  private def zigzag(r: Int): Long = ((r.toLong << 1) ^ (r >> 31)).toLong & 0xFFFFFFFFL
  private def unzig(u: Long): Int = (((u >>> 1) ^ -(u & 1))).toInt

  /** Encode one subframe (chooses CONSTANT / best FIXED order /
    * VERBATIM by exact coded size).
    *
    * The order search exploits the fixed-predictor identity
    * res_{o+1}(j) = res_o(j+1) − res_o(j): all five candidate
    * residual sets come from successive in-place differences of ONE
    * Int scratch buffer instead of five fresh tabulate+map pairs
    * (order-4 alone was 4 multiplies/sample plus an Int and a Long
    * array per frame), and each order's exact Rice cost folds its
    * ≤3 candidate k's in the same pass that diffs to the next order.
    * Selection rule (smallest coded size, lowest order then lowest k
    * on ties) is unchanged — the emitted stream is bit-identical. */
  private def writeSubframe(w: MsbWriter, x: Array[Int]): Unit = {
    if (x.forall(_ == x(0))) {
      w.writeBits(0, 1); w.writeBits(0, 6); w.writeBits(0, 1)
      w.writeBits(x(0).toLong & 0xFFFF, 16)
      return
    }
    val n = x.length
    val r = java.util.Arrays.copyOf(x, n)
    var bestOrder = -1
    var bestK = 0
    var bestBits = 16L * n // verbatim cost
    var o = 0
    while (o <= 4 && o < n) {
      val len = n - o // r(0..len-1) holds the order-o residuals
      var sum = 0L
      var i = 0
      while (i < len) { sum += zigzag(r(i)); i += 1 }
      // standard Rice estimator: optimum k ≈ log2(mean(u)), so probe
      // k ∈ [est−1, est+1] clamped to [0, 14] instead of all 15
      val mean = sum / len
      var est = 0
      while ((1L << (est + 1)) <= mean + 1 && est < 13) est += 1
      val kLo = math.max(0, est - 1)
      val kHi = math.min(14, est + 1)
      var bits0 = 0L; var bits1 = 0L; var bits2 = 0L
      val diffLen = len - 1 // order-(o+1) residuals, written in place
      var j = 0
      while (j < len) {
        val u = zigzag(r(j))
        bits0 += (u >>> kLo) + 1 + kLo
        if (kLo + 1 <= kHi) bits1 += (u >>> (kLo + 1)) + 2 + kLo
        if (kLo + 2 <= kHi) bits2 += (u >>> (kLo + 2)) + 3 + kLo
        if (j < diffLen) r(j) = r(j + 1) - r(j)
        j += 1
      }
      var selK = kLo
      var selBits = bits0
      if (kLo + 1 <= kHi && bits1 < selBits) { selBits = bits1; selK = kLo + 1 }
      if (kLo + 2 <= kHi && bits2 < selBits) { selBits = bits2; selK = kLo + 2 }
      val bits = 16L * o + 2 + 4 + 4 + selBits
      if (bits < bestBits) {
        bestBits = bits; bestOrder = o; bestK = selK
      }
      o += 1
    }
    if (bestOrder < 0) { // verbatim wins
      w.writeBits(0, 1); w.writeBits(1, 6); w.writeBits(0, 1)
      x.foreach(s => w.writeBits(s.toLong & 0xFFFF, 16))
    } else {
      w.writeBits(0, 1)
      w.writeBits(8L | bestOrder, 6) // 001xxx = FIXED order xxx
      w.writeBits(0, 1)
      var i = 0
      while (i < bestOrder) {
        w.writeBits(x(i).toLong & 0xFFFF, 16); i += 1
      }
      w.writeBits(0, 2) // residual method: 4-bit Rice
      w.writeBits(0, 4) // partition order 0
      w.writeBits(bestK, 4)
      // winner's residuals: re-diff the scratch buffer (≤4 subtract
      // passes) — cheaper than keeping a copy per improved candidate
      System.arraycopy(x, 0, r, 0, n)
      var d = 0
      while (d < bestOrder) {
        val dl = n - d - 1
        var t = 0
        while (t < dl) { r(t) = r(t + 1) - r(t); t += 1 }
        d += 1
      }
      val len = n - bestOrder
      var j = 0
      while (j < len) {
        val u = zigzag(r(j))
        w.writeUnary((u >>> bestK).toInt)
        if (bestK > 0) w.writeBits(u & ((1L << bestK) - 1), bestK)
        j += 1
      }
    }
  }

  /** UTF-8-style coded frame number (FLAC frame header field). */
  private def writeUtf8Num(w: MsbWriter, n: Long): Unit = {
    if (n < 0x80) w.writeBits(n, 8)
    else if (n < 0x800) {
      w.writeBits(0xC0L | (n >> 6), 8)
      w.writeBits(0x80L | (n & 0x3F), 8)
    } else {
      require(n < 0x10000, "frame number beyond carried profile")
      w.writeBits(0xE0L | (n >> 12), 8)
      w.writeBits(0x80L | ((n >> 6) & 0x3F), 8)
      w.writeBits(0x80L | (n & 0x3F), 8)
    }
  }

  private def readUtf8Num(r: MsbReader): Long = {
    val b0 = r.readBits(8)
    if ((b0 & 0x80) == 0) b0
    else if ((b0 & 0xE0) == 0xC0)
      ((b0 & 0x1F) << 6) | (r.readBits(8) & 0x3F)
    else if ((b0 & 0xF0) == 0xE0) {
      val b1 = r.readBits(8) & 0x3F
      val b2 = r.readBits(8) & 0x3F
      ((b0 & 0x0F) << 12) | (b1 << 6) | b2
    } else sys.error(f"bad UTF-8 frame number lead byte 0x$b0%02x")
  }

  /** Encode a mono 16-bit stream as a complete FLAC file. */
  def encode(samples: Array[Int]): Array[Byte] = {
    require(samples.forall(s => s >= -32768 && s <= 32767),
      "16-bit samples only")
    val out = new java.io.ByteArrayOutputStream
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO: last-block flag + type 0, length 34
    val si = new MsbWriter
    si.writeBits(BlockSize, 16) // min block
    si.writeBits(BlockSize, 16) // max block
    si.writeBits(0, 24); si.writeBits(0, 24) // frame sizes unknown
    si.writeBits(44100, 20)
    si.writeBits(0, 3) // channels - 1
    si.writeBits(15, 5) // bps - 1
    si.writeBits(samples.length.toLong, 36)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    md5.update(samplesLe(samples))
    val siBytes = si.toBytes
    out.write(0x80) // last metadata block, type STREAMINFO
    out.write(0); out.write(0); out.write(34)
    out.write(siBytes)
    out.write(md5.digest())
    // frames
    var off = 0
    var frameNo = 0L
    while (off < samples.length) {
      val n = math.min(BlockSize, samples.length - off)
      val w = new MsbWriter
      w.writeBits(0xFFF8L >> 1, 15) // sync + mandatory 0
      w.writeBits(0, 1) // fixed-blocksize stream
      w.writeBits(7, 4) // blocksize: 16-bit value - 1 at header end
      w.writeBits(9, 4) // sample rate: 44.1 kHz
      w.writeBits(0, 4) // channels: mono
      w.writeBits(4, 3) // sample size: 16-bit
      w.writeBits(0, 1) // reserved
      writeUtf8Num(w, frameNo)
      w.writeBits(n - 1, 16)
      val headNoCrc = w.toBytes
      val hw = new MsbWriter
      headNoCrc.foreach(b => hw.writeBits(b & 0xFFL, 8))
      hw.writeBits(crc8(headNoCrc, headNoCrc.length), 8)
      writeSubframe(hw, samples.slice(off, off + n))
      hw.align()
      val frameNoCrc16 = hw.toBytes
      val fw = new java.io.ByteArrayOutputStream
      fw.write(frameNoCrc16)
      val c16 = crc16(frameNoCrc16, frameNoCrc16.length)
      fw.write((c16 >> 8) & 0xFF); fw.write(c16 & 0xFF)
      out.write(fw.toByteArray)
      off += n
      frameNo += 1
    }
    out.toByteArray
  }

  final case class FlacAudio(samples: Array[Int], nFrames: Int,
      md5Ok: Boolean, sampleRate: Int)

  /** Decode a constrained-profile FLAC file, verifying CRC-8 per
    * frame header, CRC-16 per frame, and the STREAMINFO MD5 over the
    * decoded audio. */
  def decode(bytes: Array[Byte]): FlacAudio = {
    require(new String(bytes, 0, 4, "US-ASCII") == "fLaC", "bad marker")
    var p = 4
    var streamInfo: Option[(Long, Array[Byte], Int)] = None
    var last = false
    while (!last) {
      val hdr = bytes(p) & 0xFF
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7F
      val len = ((bytes(p + 1) & 0xFF) << 16) |
        ((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF)
      if (btype == 0) {
        val r = new MsbReader(bytes, p + 4)
        r.readBits(16); r.readBits(16); r.readBits(24); r.readBits(24)
        val rate = r.readBits(20).toInt
        require(r.readBits(3) == 0, "constrained profile: mono")
        require(r.readBits(5) == 15, "constrained profile: 16-bit")
        val total = r.readBits(36)
        val md5 = bytes.slice(p + 4 + 18, p + 4 + 34)
        streamInfo = Some((total, md5, rate))
      }
      p += 4 + len
    }
    val (total, wantMd5, rate) = streamInfo.getOrElse(
      sys.error("no STREAMINFO"))
    val samples = new Array[Int](total.toInt)
    var got = 0
    var nFrames = 0
    while (got < total) {
      val frameStart = p
      val r = new MsbReader(bytes, p)
      require(r.readBits(15) == (0xFFF8L >> 1), "bad frame sync")
      require(r.readBits(1) == 0, "constrained: fixed-blocksize")
      require(r.readBits(4) == 7, "constrained: explicit 16-bit blocksize")
      require(r.readBits(4) == 9, "constrained: 44.1 kHz")
      require(r.readBits(4) == 0, "constrained: mono")
      require(r.readBits(3) == 4, "constrained: 16-bit samples")
      r.readBits(1)
      val fn = readUtf8Num(r)
      require(fn == nFrames, s"frame number $fn at frame $nFrames")
      val n = r.readBits(16).toInt + 1
      val headLen = r.bytePos - frameStart
      val wantCrc8 = r.readBits(8).toInt
      require(crc8(bytes.slice(frameStart, frameStart + headLen),
        headLen) == wantCrc8, s"frame $nFrames header CRC-8")
      // subframe
      require(r.readBits(1) == 0, "subframe pad bit")
      val ty = r.readBits(6).toInt
      require(r.readBits(1) == 0, "constrained: no wasted bits")
      def s16(v: Long): Int = ((v & 0xFFFF).toShort).toInt
      val x: Array[Int] =
        if (ty == 0) { // CONSTANT: ONE stored sample, replicated
          val v = s16(r.readBits(16))
          Array.fill(n)(v)
        }
        else if (ty == 1) Array.fill(n)(s16(r.readBits(16)))
        else if ((ty & 0x38) == 8 && (ty & 7) <= 4) {
          val order = ty & 7
          val warm = Array.fill(order)(s16(r.readBits(16)))
          require(r.readBits(2) == 0, "constrained: 4-bit Rice")
          require(r.readBits(4) == 0, "constrained: partition order 0")
          val k = r.readBits(4).toInt
          require(k < 15, "Rice escape outside carried profile")
          val res = Array.fill(n - order) {
            val q = r.readUnary().toLong
            val u = (q << k) | (if (k > 0) r.readBits(k) else 0L)
            unzig(u)
          }
          restore(warm, res, order)
        } else sys.error(
          f"subframe type 0x$ty%02x outside carried profile (LPC?)")
      r.align()
      val bodyLen = r.bytePos - frameStart
      val wantCrc16 = r.readBits(16).toInt
      require(crc16(bytes.slice(frameStart, frameStart + bodyLen),
        bodyLen) == wantCrc16, s"frame $nFrames CRC-16")
      p = r.bytePos
      Array.copy(x, 0, samples, got, n)
      got += n
      nFrames += 1
    }
    val md5 = java.security.MessageDigest.getInstance("MD5")
    md5.update(samplesLe(samples))
    FlacAudio(samples, nFrames,
      java.util.Arrays.equals(md5.digest(), wantMd5), rate)
  }
}
