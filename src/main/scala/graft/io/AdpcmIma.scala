package graft.io

/** IMA/DVI ADPCM codec (q305) — the 4-bit adaptive-delta speech
  * codec of the published IMA "Recommended Practices for Enhancing
  * Digital Audio Compatibility" (the algorithm WAV format 0x11 and
  * countless telephony pipelines carry): 16-bit PCM compressed 4:1
  * by quantizing each sample's delta against an adaptive step from
  * the 89-entry step table, the step index walked by the published
  * index-adjustment table.
  *
  * STATED SUBSET: the RAW nibble stream with the spec's zero initial
  * state (predictor 0, index 0), mono — the WAV 0x11 per-block
  * headers are container framing (the q54 RIFF family's business),
  * not codec; a pipeline storing telephony audio needs exactly this
  * kernel per channel.
  *
  * Correctness evidence beyond the paired round-trip: the spec pins
  * the step table's STRUCTURAL signature (89 entries, endpoints
  * 7/32767, strictly increasing with the ~1.1 geometric growth the
  * spec derives — every adjacent ratio inside [1.04, 1.15]), the
  * index table verbatim, convergence/SNR bounds on deterministic
  * triangle fixtures, and exact nibble-stream arithmetic.
  *
  * Scale design (100 TB): strictly row-local bytes-in/samples-out
  * (the q54/q182 economics); a clip never crosses an exchange. */
object AdpcmIma {

  /** The published 89-entry step-size table. */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** The published index-adjustment table (3-bit magnitude). */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampIndex(i: Int): Int =
    if (i < 0) 0 else if (i > 88) 88 else i

  private def clampSample(s: Int): Int =
    if (s < -32768) -32768 else if (s > 32767) 32767 else s

  /** Dequantized delta for a nibble's 3-bit magnitude at `step` —
    * the (step>>3) + conditional step/2/4 sum BOTH sides run, so
    * encoder prediction is the decoder's reconstruction exactly. */
  private def diffq(delta: Int, step: Int): Int = {
    var d = step >> 3
    if ((delta & 4) != 0) d += step
    if ((delta & 2) != 0) d += step >> 1
    if ((delta & 1) != 0) d += step >> 2
    d
  }

  /** Encode 16-bit PCM to the packed nibble stream (low nibble
    * first; odd tails pad with a zero nibble). */
  def encode(samples: Array[Short]): Array[Byte] =
    encodeFrom(samples, 0, samples.length, 0, 0)._1

  /** [[encode]] with explicit initial state over a sample window —
    * the form the WAV 0x11 BLOCK framing needs (each block header
    * carries the state the nibbles continue from). Returns the
    * packed bytes plus the end (predictor, index). */
  def encodeFrom(samples: Array[Short], from: Int, count: Int,
      predictor0: Int, index0: Int): (Array[Byte], (Int, Int)) = {
    var predictor = predictor0
    var index = index0
    val nibbles = new Array[Int](count)
    var i = 0
    while (i < count) {
      val step = StepTable(index)
      var diff = samples(from + i) - predictor
      val sign = if (diff < 0) { diff = -diff; 8 } else 0
      var delta = 0
      if (diff >= step) { delta |= 4; diff -= step }
      if (diff >= (step >> 1)) { delta |= 2; diff -= step >> 1 }
      if (diff >= (step >> 2)) delta |= 1
      val d = diffq(delta, step)
      predictor = clampSample(
        if (sign != 0) predictor - d else predictor + d)
      index = clampIndex(index + IndexTable(delta))
      nibbles(i) = sign | delta
      i += 1
    }
    val out = new Array[Byte]((count + 1) / 2)
    i = 0
    while (i < count) {
      if (i % 2 == 0) out(i / 2) = nibbles(i).toByte
      else out(i / 2) = (out(i / 2) | (nibbles(i) << 4)).toByte
      i += 1
    }
    (out, (predictor, index))
  }

  /** Decode `n` samples from a packed nibble stream. */
  def decode(bytes: Array[Byte], n: Int): Array[Short] =
    decodeFrom(bytes, 0, n, 0, 0)._1

  /** [[decode]] with explicit initial state over a byte window —
    * the WAV 0x11 block form. Returns the samples plus the end
    * (predictor, index). */
  def decodeFrom(bytes: Array[Byte], off: Int, n: Int,
      predictor0: Int, index0: Int): (Array[Short], (Int, Int)) = {
    require(off + (n + 1) / 2 <= bytes.length,
      s"adpcm: $n samples need ${(n + 1) / 2} bytes at $off, " +
        s"got ${bytes.length}")
    var predictor = predictor0
    var index = index0
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val nibble =
        if (i % 2 == 0) bytes(off + i / 2) & 0x0F
        else (bytes(off + i / 2) >> 4) & 0x0F
      val step = StepTable(index)
      val d = diffq(nibble & 7, step)
      predictor = clampSample(
        if ((nibble & 8) != 0) predictor - d else predictor + d)
      index = clampIndex(index + IndexTable(nibble & 7))
      out(i) = predictor.toShort
      i += 1
    }
    (out, (predictor, index))
  }
}
