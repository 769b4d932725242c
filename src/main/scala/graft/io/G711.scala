package graft.io

/** ITU-T G.711 companding (q306) — the telephony byte codecs every
  * speech corpus ingests: μ-law and A-law map 16-bit PCM to 8-bit
  * logarithmic codes (8 segments × 16 mantissa steps, sign bit),
  * transcribed from the published G.711 tables' closed forms (the
  * μ-law 0x84 bias / 0xFF silence, the A-law 0x55 toggle / 0xD5
  * silence).
  *
  * Correctness evidence: the CANONICAL round trip encode(decode(c))
  * == c over all 256 codes of BOTH laws (a per-code structural
  * identity the spec guarantees — any slip in segment or mantissa
  * arithmetic breaks some code), the published anchor codes
  * (μ-law silence 0xFF / +max 0x80; A-law silence 0xD5 / +max
  * 0xAA), monotone decode within each sign, and bounded
  * quantization error on the graded fixture.
  *
  * Scale design (100 TB): row-local bytes↔samples kernels (the
  * q54/q305 economics). */
object G711 {

  private val MuBias = 0x84
  private val MuClip = 32635

  /** μ-law encode of one 16-bit sample to its 8-bit code. */
  def mulawEncode(pcm: Int): Int = {
    var x = pcm
    val sign = if (x < 0) { x = -x; 0x80 } else 0
    if (x > MuClip) x = MuClip
    x += MuBias
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (x & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (x >> (exponent + 3)) & 0x0F
    ~(sign | (exponent << 4) | mantissa) & 0xFF
  }

  /** μ-law decode of one 8-bit code. */
  def mulawDecode(code: Int): Int = {
    val c = ~code & 0xFF
    val sign = c & 0x80
    val exponent = (c >> 4) & 7
    val mantissa = c & 0x0F
    val x = (((mantissa << 3) + MuBias) << exponent) - MuBias
    if (sign != 0) -x else x
  }

  /** A-law encode of one 16-bit sample to its 8-bit code (the
    * ITU-T reference structure: one's-complement negative
    * magnitude, 12-bit domain, segment walk, 0x55 toggle). */
  def alawEncode(pcm: Int): Int = {
    var ix = if (pcm < 0) (~pcm) >> 4 else pcm >> 4
    if (ix > 15) {
      var iexp = 1
      while (ix > 16 + 15) { ix >>= 1; iexp += 1 }
      ix -= 16
      ix += iexp << 4
    }
    if (pcm >= 0) ix |= 0x80
    ix ^ 0x55
  }

  /** A-law decode of one 8-bit code. */
  def alawDecode(code: Int): Int = {
    val c = code ^ 0x55
    val ix = c & 0x7F
    val iexp = ix >> 4
    var mant = ix & 0x0F
    if (iexp > 0) mant += 16
    mant = (mant << 4) + 0x8
    if (iexp > 1) mant <<= iexp - 1
    if (c > 127) mant else -mant
  }

  def mulawEncodeAll(s: Array[Short]): Array[Byte] =
    s.map(v => mulawEncode(v.toInt).toByte)
  def mulawDecodeAll(b: Array[Byte]): Array[Short] =
    b.map(c => mulawDecode(c & 0xFF).toShort)
  def alawEncodeAll(s: Array[Short]): Array[Byte] =
    s.map(v => alawEncode(v.toInt).toByte)
  def alawDecodeAll(b: Array[Byte]): Array[Short] =
    b.map(c => alawDecode(c & 0xFF).toShort)
}
