package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media
  * (image/audio/video) carried as opaque `binary` columns with typed
  * metadata, processed by per-partition batch operators.
  *
  * Three container formats are decoded FOR REAL in pure JVM code —
  * RIFF/WAV PCM ([[Multimodal.decodeWav]], chunk-walking parser),
  * binary PPM ([[Multimodal.decodePpm]], with a genuine
  * nearest-neighbor [[Multimodal.resizePpmNearest]]), and PNG
  * ([[Multimodal.decodePng]]: chunk+CRC walk, java.util.zip INFLATE,
  * all five scanline defilters) — graded sample-exactly against the
  * oracle (q54/q55/q67). JPEG goes through the JDK's own javax.imageio
  * codec ([[Multimodal.decodeJpeg]]) and, being lossy, is graded by
  * error bounds (q68). Only MP4 (no JDK codec) remains behind a
  * deliberate stub ([[Multimodal.decodeStub]]): a deterministic
  * byte-histogram "embedding" stands in for the
  * decoder+feature-extractor. Everything around it — the schema, the
  * typed Dataset API, mime sniffing, per-partition batching (decoder
  * context initialized once per partition, the same shape a real
  * model/codec handle needs), frame sampling — is real and tested.
  *
  * Scale design: all operators are mapPartitions (row-local, no
  * shuffle); payload bytes never enter a shuffle key; metadata-only
  * queries prune the binary column at the scan.
  */
object Multimodal {

  // ImageIO defaults to DISK-backed stream caching: every
  // encode/decode call otherwise creates (and deletes) a temp file —
  // per-row filesystem churn on the executors that priced the q68
  // battery row at up to 2.6× under background load. The payloads
  // here are in-memory byte arrays; cache in memory.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, mime: String, n_bytes: Long,
      features: Array[Float])

  val FeatureDim = 16

  /** Magic-byte mime sniffing (real logic, no decode needed). */
  def sniffMime(payload: Array[Byte]): String = {
    def startsWith(sig: Int*): Boolean =
      payload.length >= sig.length &&
        sig.zipWithIndex.forall { case (b, i) =>
          (payload(i) & 0xff) == b }
    if (startsWith(0x89, 'P', 'N', 'G')) "image/png"
    else if (startsWith(0xff, 0xd8, 0xff)) "image/jpeg"
    else if (startsWith('R', 'I', 'F', 'F')) "audio/wav"
    else if (startsWith(0x00, 0x00, 0x00)) "video/mp4" // ftyp box stub
    else "application/octet-stream"
  }

  /** STUB decoder: where a real pipeline would decode pixels/samples
    * and run a feature model, we produce a deterministic normalized
    * 16-bin byte histogram. Replace with a real codec behind the same
    * (Iterator batch) signature. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    payload.foreach(b => hist((b & 0xff) / FeatureDim) += 1f)
    val n = math.max(1, payload.length).toFloat
    hist.map(_ / n)
  }

  /** Per-partition feature extraction: the "decoder context" is
    * created once per partition and reused across the partition's
    * records — the batch shape a real model handle requires. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // real pipeline: val ctx = Decoder.open(...) — once per partition
      val ctx = new StringBuilder // stand-in context (cheap, reusable)
      records.map { r =>
        ctx.clear() // proves per-record reuse of the partition context
        MediaFeatures(r.media_id, r.kind, sniffMime(r.payload),
          r.payload.length.toLong, decodeStub(r.payload))
      }
    }
  }

  /** STUB resize: a real pipeline decodes and rescales pixels; the
    * stand-in keeps every stride-th payload byte after the sniffed
    * header, preserving the header so mime detection still works.
    * Deterministic; the plumbing (typed in/out, row-local) is real. */
  def resizeStub(payload: Array[Byte], stride: Int): Array[Byte] = {
    val header = math.min(4, payload.length)
    payload.take(header) ++
      payload.drop(header).grouped(stride).map(_.head).toArray
  }

  /** Per-partition resize stage (same batch shape as
    * [[extractFeatures]]). */
  def resize(media: Dataset[MediaRecord], stride: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map(r => r.copy(payload = resizeStub(r.payload, stride)))
    }
  }

  /** Deterministic frame sampler for chunked video payloads: split
    * the payload into `frameBytes` chunks and keep every `stride`-th
    * (the mapInPandas-style frame-sample stage, minus the codec). */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
      stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .collect { case (frame, i) if i % stride == 0 =>
          (r.media_id, i, frame.length, sniffMime(r.payload)) }
    }.toDF("media_id", "frame_index", "frame_bytes", "mime")
  }

  /** Metadata-only projection — binary column pruned at the scan
    * (only `media_id`, `kind` and byte length are read/derived). */
  def metadata(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("kind"),
      octet_length(col("payload")).cast("long").as("n_bytes"))

  /** Frame size / sampling stride for the graded metadata query. */
  val MetaFrameBytes = 32
  val MetaFrameStride = 2

  /** Deterministic media corpus derived from the `documents` table:
    * payload = a real container magic header (cycled by doc_id % 4)
    * prepended to the UTF-8 text bytes. This gives the codec-free
    * multimodal paths (mime sniff, metadata, frame sampling) a
    * DuckDB-mirrorable input without committing binary fixtures. */
  def mediaFromDocs(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val sel = (id % 4).toInt
        val kind = sel match {
          case 0 | 1 => "image"
          case 2 => "audio"
          case _ => "video"
        }
        val header: Array[Byte] = sel match {
          case 0 => Array(0x89.toByte, 'P', 'N', 'G')
          case 1 => Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)
          case 2 => Array[Byte]('R', 'I', 'F', 'F')
          case _ => Array[Byte](0, 0, 0)
        }
        MediaRecord(id, kind, header ++ text.getBytes("UTF-8"))
      }
  }

  // ---------------------------------------------------------------
  // REAL codecs (pure JVM, no external libraries): RIFF/WAV PCM,
  // binary PPM (P6), PNG (zlib via java.util.zip), and JPEG (the
  // JDK's javax.imageio codec). Only MP4 remains behind
  // [[decodeStub]] as documented.
  // ---------------------------------------------------------------

  /** Decoded PCM facts of a WAV payload. `sumAbs`/`peakAbs` are the
    * amplitude aggregates the graded query checks sample-exactly. */
  final case class WavInfo(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nSamples: Int, peakAbs: Int, sumAbs: Long)

  /** Encode 16-bit mono PCM as a canonical RIFF/WAVE file. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  // ---------------------------------------------------------------
  // coded-WAV containers (q307): the RIFF fmt tags real telephony
  // audio arrives under — 0x0007 (mu-law) and 0x0011 (IMA ADPCM
  // with the spec's per-block state headers and fact chunk)
  // ---------------------------------------------------------------

  /** IMA-WAV data block size in bytes (fmt 0x11 blockAlign). */
  val ImaBlockAlign = 256

  /** Samples per IMA block: the header's verbatim first sample plus
    * two nibbles per remaining byte. */
  val ImaSamplesPerBlock: Int = 1 + (ImaBlockAlign - 4) * 2

  private def riffHeader(buf: java.nio.ByteBuffer, fmtTag: Int,
      rate: Int, byteRate: Int, blockAlign: Int, bits: Int,
      factSamples: Int, extra: Option[Int]): Unit = {
    buf.put("fmt ".getBytes("US-ASCII"))
      .putInt(if (extra.isDefined) 20 else 18)
      .putShort(fmtTag.toShort)
      .putShort(1) // mono
      .putInt(rate)
      .putInt(byteRate)
      .putShort(blockAlign.toShort)
      .putShort(bits.toShort)
      .putShort(extra.map(_ => 2).getOrElse(0).toShort) // cbSize
    extra.foreach(v => buf.putShort(v.toShort)) // samplesPerBlock
    buf.put("fact".getBytes("US-ASCII")).putInt(4).putInt(factSamples)
  }

  /** Encode mono 16-bit PCM as a mu-law WAV (fmt 0x0007 + fact). */
  def encodeWavMulaw(rate: Int, samples: Array[Short]): Array[Byte] = {
    val data = graft.io.G711.mulawEncodeAll(samples)
    val fmtLen = 8 + 18
    val factLen = 8 + 4
    val pad = data.length % 2
    val buf = java.nio.ByteBuffer
      .allocate(12 + fmtLen + factLen + 8 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + fmtLen + factLen + 8 + data.length + pad)
      .put("WAVE".getBytes("US-ASCII"))
    riffHeader(buf, 0x0007, rate, rate, 1, 8, samples.length, None)
    buf.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    if (pad == 1) buf.put(0.toByte)
    buf.array()
  }

  /** Encode mono 16-bit PCM as an IMA-ADPCM WAV (fmt 0x0011): each
    * [[ImaBlockAlign]]-byte data block opens with the spec's state
    * header (first sample verbatim as int16, step index, reserved
    * byte) and carries the REMAINING samples as nibbles; the step
    * index runs on across blocks; the fact chunk carries the true
    * sample count (the final block zero-pads). */
  def encodeWavIma(rate: Int, samples: Array[Short]): Array[Byte] = {
    import graft.io.AdpcmIma
    val spb = ImaSamplesPerBlock
    val nBlocks = (samples.length + spb - 1) / spb
    val dataLen = nBlocks * ImaBlockAlign
    val fmtLen = 8 + 20
    val factLen = 8 + 4
    val buf = java.nio.ByteBuffer
      .allocate(12 + fmtLen + factLen + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + fmtLen + factLen + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    riffHeader(buf, 0x0011, rate,
      rate * ImaBlockAlign / spb, ImaBlockAlign, 4,
      samples.length, Some(spb))
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var index = 0
    var b = 0
    while (b < nBlocks) {
      val start = b * spb
      val first = samples(start)
      buf.putShort(first).put(index.toByte).put(0.toByte)
      val count = math.min(spb, samples.length - start) - 1
      val (bytes, (_, endIdx)) =
        AdpcmIma.encodeFrom(samples, start + 1, count, first, index)
      buf.put(bytes)
      var pad = ImaBlockAlign - 4 - bytes.length
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      index = endIdx
      b += 1
    }
    buf.array()
  }

  /** Decode a coded WAV (fmt 0x0001 PCM16, 0x0007 mu-law, or
    * 0x0011 IMA ADPCM): the same chunk walk as [[decodeWav]], the
    * fact chunk bounding non-PCM sample counts. None = not
    * parseable / unsupported tag. */
  def decodeWavCoded(payload: Array[Byte])
      : Option[(Int, Int, Array[Short])] = {
    import graft.io.{AdpcmIma, G711}
    if (payload.length < 12) return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    buf.getInt
    if (tag() != "WAVE") return None
    var fmt: Option[(Int, Int, Int)] = None // (tag, rate, blockAlign)
    var fact: Option[Int] = None
    var data: Option[(Int, Int)] = None
    while (buf.remaining() >= 8) {
      val id = tag()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val p = buf.position()
          val audioFormat = buf.getShort.toInt & 0xFFFF
          buf.getShort // channels (mono subset)
          val rate = buf.getInt
          buf.getInt
          val blockAlign = buf.getShort.toInt
          fmt = Some((audioFormat, rate, blockAlign))
          buf.position(p + size)
        case "fact" =>
          val p = buf.position()
          fact = Some(buf.getInt)
          buf.position(p + size)
        case "data" =>
          data = Some((buf.position(), size))
          buf.position(buf.position() + size)
        case _ => buf.position(buf.position() + size)
      }
      if (size % 2 == 1 && buf.remaining() > 0)
        buf.position(buf.position() + 1)
    }
    for ((t, rate, blockAlign) <- fmt; (off, len) <- data) yield {
      val samples = t match {
        case 1 =>
          Array.tabulate(len / 2)(i => buf.getShort(off + 2 * i))
        case 7 =>
          // container metadata is UNTRUSTED: a fact count past the
          // data chunk would read out of bounds (r15 ADVICE) — the
          // contract here is None, never an ArrayIndexOutOfBounds
          val n = fact.getOrElse(len)
          if (n < 0 || n > len) return None
          val bytes = new Array[Byte](n)
          System.arraycopy(payload, off, bytes, 0, n)
          G711.mulawDecodeAll(bytes)
        case 0x11 =>
          val total = fact.getOrElse(0)
          // blockAlign < 4 cannot hold the 4-byte block header (and
          // 0 would never advance); both are malformed containers
          if (total < 0 || blockAlign < 4) return None
          val out = new Array[Short](total)
          var emitted = 0
          var pos = off
          while (emitted < total && pos + 4 <= off + len) {
            val first = buf.getShort(pos)
            val index = payload(pos + 2) & 0xFF
            // the step index seeds AdpcmIma.StepTable (89 entries);
            // a corrupt header must verdict None, not throw
            if (index > 88) return None
            out(emitted) = first
            emitted += 1
            val want = math.min(ImaSamplesPerBlock - 1,
              total - emitted)
            if (want > 0) {
              // the nibbles must fit INSIDE the data chunk — a fact
              // count larger than the chunk holds must not spill the
              // decode into whatever chunk follows
              if (pos + 4 + (want + 1) / 2 > off + len) return None
              val (dec, _) = AdpcmIma.decodeFrom(payload, pos + 4,
                want, first, index)
              System.arraycopy(dec, 0, out, emitted, want)
              emitted += want
            }
            pos += blockAlign
          }
          // a fact count promising more samples than the data
          // chunk's blocks carry is a malformed container — None,
          // not a silently zero-padded tail
          if (emitted < total) return None
          out
        case _ => return None
      }
      (t, rate, samples)
    }
  }

  /** Graded coded-WAV round trip (q307) — the q54 container family
    * composed with the q305/q306 codecs: per doc the triangle wave
    * rides THREE real RIFF containers (PCM16, mu-law 0x0007, IMA
    * 0x0011 with per-block state headers + fact chunk) and comes
    * back through the real chunk walker. Graded EXACTLY where the
    * formats are exact: PCM sample-identical; the mu-law container
    * TRANSPARENT to the bare codec (byte-for-byte equal decode);
    * every IMA block's header sample verbatim; block count from the
    * spec's ceil arithmetic; plus the q305 error bound on the IMA
    * stream. Row-local. */
  def codedWavStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.G711
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val src = adpcmSamplesOf(id)
        val a = (1000 + (id % 8) * 400).toInt
        val pcm = decodeWavCoded(encodeWavPcm16(WavRate, src)).get
        val mu = decodeWavCoded(encodeWavMulaw(WavRate, src)).get
        val ima = decodeWavCoded(encodeWavIma(WavRate, src)).get
        val pcmExact = pcm._1 == 1 && pcm._3.sameElements(src)
        val muTransparent = mu._1 == 7 && mu._3.sameElements(
          G711.mulawDecodeAll(G711.mulawEncodeAll(src)))
        val spb = ImaSamplesPerBlock
        val nBlocks = (src.length + spb - 1) / spb
        val headsExact = (0 until nBlocks).forall(b =>
          ima._3(b * spb) == src(b * spb))
        val errs = (AdpcmAttack until src.length)
          .map(i => math.abs(ima._3(i) - src(i)))
        val imaOk = ima._1 == 0x11 && ima._3.length == src.length &&
          errs.max <= a / 4
        (id, src.length.toLong, pcmExact, muTransparent,
          nBlocks.toLong, headsExact, imaOk)
      }
      .toDF("doc_id", "n_samples", "pcm_exact", "mulaw_transparent",
        "n_ima_blocks", "ima_heads_exact", "ima_err_ok")
  }

  /** REAL WAV decoder: walks the RIFF chunk list (any chunk order,
    * odd-size pad bytes honored), parses `fmt `, and aggregates the
    * 16-bit PCM `data` samples. None = not a parseable PCM WAV. */
  def decodeWav(payload: Array[Byte]): Option[WavInfo] = {
    if (payload.length < 12) return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    buf.getInt // declared riff size (trust actual bounds instead)
    if (tag() != "WAVE") return None
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (buf.remaining() >= 8) {
      val id = tag()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val p = buf.position()
          val audioFormat = buf.getShort
          val channels = buf.getShort.toInt
          val rate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          val bits = buf.getShort.toInt
          if (audioFormat != 1) return None // PCM only
          fmt = Some((channels, rate, bits))
          buf.position(p + size)
        case "data" =>
          data = Some((buf.position(), size))
          buf.position(buf.position() + size)
        case _ =>
          buf.position(buf.position() + size)
      }
      if (size % 2 == 1 && buf.remaining() > 0)
        buf.position(buf.position() + 1) // RIFF pad byte
    }
    for ((channels, rate, bits) <- fmt; (off, len) <- data;
        if bits == 16 && channels >= 1 && rate > 0) yield {
      val n = len / 2
      var i = 0; var sum = 0L; var peak = 0
      while (i < n) {
        val a = math.abs(buf.getShort(off + 2 * i).toInt)
        sum += a; if (a > peak) peak = a
        i += 1
      }
      WavInfo(rate, channels, bits, n / channels, peak, sum)
    }
  }

  /** [[decodeWav]]'s raw-PCM sibling: the same RIFF chunk walk, but
    * returning the decoded 16-bit samples themselves — the input the
    * feature extractors (q213) consume. */
  def decodeWavSamples(payload: Array[Byte]): Option[Array[Short]] = {
    if (payload.length < 12) return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    buf.getInt
    if (tag() != "WAVE") return None
    var ok = false
    var data: Option[(Int, Int)] = None
    while (buf.remaining() >= 8) {
      val id = tag()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val p = buf.position()
          val audioFormat = buf.getShort
          val channels = buf.getShort.toInt
          buf.getInt; buf.getInt; buf.getShort
          val bits = buf.getShort.toInt
          ok = audioFormat == 1 && channels == 1 && bits == 16
          buf.position(p + size)
        case "data" =>
          data = Some((buf.position(), size))
          buf.position(buf.position() + size)
        case _ =>
          buf.position(buf.position() + size)
      }
      if (size % 2 == 1 && buf.remaining() > 0)
        buf.position(buf.position() + 1)
    }
    for ((off, len) <- data; if ok) yield
      Array.tabulate(len / 2)(i => buf.getShort(off + 2 * i))
  }

  /** Decoded binary-PPM image; `pixels` is row-major RGB. */
  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte])

  def encodePpm(img: PpmImage): Array[Byte] =
    s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII") ++
      img.pixels

  /** REAL PPM (P6) decoder: header tokenizer honoring whitespace
    * runs and `#` comments, maxval 255, raw RGB payload. */
  def decodePpm(payload: Array[Byte]): Option[PpmImage] = {
    var pos = 0
    def skipSeparators(): Unit = {
      var done = false
      while (!done && pos < payload.length) {
        val c = payload(pos).toChar
        if (c == '#') { // comment runs to end of line
          while (pos < payload.length && payload(pos).toChar != '\n') pos += 1
        } else if (c.isWhitespace) pos += 1
        else done = true
      }
    }
    def token(): Option[String] = {
      skipSeparators()
      val start = pos
      while (pos < payload.length && !payload(pos).toChar.isWhitespace &&
        payload(pos).toChar != '#') pos += 1
      if (pos > start) Some(new String(payload, start, pos - start,
        "US-ASCII")) else None
    }
    def intToken(): Option[Int] = token().flatMap(_.toIntOption)
    for {
      magic <- token() if magic == "P6"
      w <- intToken() if w > 0
      h <- intToken() if h > 0
      maxval <- intToken() if maxval == 255
      // exactly ONE whitespace byte separates maxval from raster
      _ = { pos += 1 }
      // Long math: 3*w*h overflows Int for adversarial headers, and a
      // wrapped product would accept a tiny raster for a huge image
      if 3L * w * h <= payload.length - pos
    } yield PpmImage(w, h,
      java.util.Arrays.copyOfRange(payload, pos, pos + 3 * w * h))
  }

  /** REAL nearest-neighbor downscale: output pixel (x, y) samples
    * source pixel (x*factor, y*factor). */
  def resizePpmNearest(img: PpmImage, factor: Int): PpmImage = {
    val w = (img.width + factor - 1) / factor
    val h = (img.height + factor - 1) / factor
    val out = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val src = 3 * (y * factor * img.width + x * factor)
        val dst = 3 * (y * w + x)
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    PpmImage(w, h, out)
  }

  /** Decoded PNG image; `pixels` is row-major 8-bit RGB. */
  final case class PngImage(width: Int, height: Int, pixels: Array[Byte])

  private val PngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc32(typeAndData: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32
    c.update(typeAndData)
    c.getValue.toInt
  }

  private def pngChunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val td = chunkType.getBytes("US-ASCII") ++ data
    java.nio.ByteBuffer.allocate(8 + data.length + 4)
      .putInt(data.length).put(td).putInt(crc32(td)).array()
  }

  /** Scanline bytes-per-pixel for truecolor 8-bit RGB. */
  private val PngBpp = 3

  /** REAL PNG encoder (truecolor 8-bit, non-interlaced): each
    * scanline is FILTERED with type `y % 5` — None/Sub/Up/Average/
    * Paeth all genuinely applied — then the filtered stream is
    * zlib-DEFLATEd (java.util.zip) into IDAT, with real CRC32s on
    * every chunk. Round-tripping therefore proves the decoder's
    * inflate AND all five defilter paths, not just a happy path. */
  def encodePng(img: PngImage): Array[Byte] = {
    val stride = img.width * PngBpp
    val raw = img.pixels
    val filtered = new Array[Byte](img.height * (1 + stride))
    var y = 0
    while (y < img.height) {
      val ft = y % 5
      filtered(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = raw(y * stride + x) & 0xff
        val left = if (x >= PngBpp) raw(y * stride + x - PngBpp) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= PngBpp)
          raw((y - 1) * stride + x - PngBpp) & 0xff else 0
        val predictor = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paethPredictor(left, up, ul)
        }
        filtered(y * (1 + stride) + 1 + x) = (cur - predictor).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(filtered)
    deflater.finish()
    val out = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(img.width).putInt(img.height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
      .array()
    PngSignature ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", out.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  private def paethPredictor(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL PNG decoder (truecolor 8-bit, non-interlaced): verifies the
    * signature and every chunk CRC, walks the chunk list, INFLATEs
    * the concatenated IDAT stream (java.util.zip.Inflater — genuine
    * zlib), and reverses all five scanline filters. None = not a PNG
    * this decoder supports (other color types / interlacing / CRC or
    * zlib corruption). JPEG/MP4 remain behind [[decodeStub]]: those
    * need entropy/DCT codecs with no JDK implementation. */
  def decodePng(payload: Array[Byte]): Option[PngImage] = {
    if (payload.length < PngSignature.length + 12 ||
      !payload.take(8).sameElements(PngSignature)) return None
    val buf = java.nio.ByteBuffer.wrap(payload)
    buf.position(8)
    var width = 0; var height = 0
    var headerOk = false
    val idat = new java.io.ByteArrayOutputStream
    var ended = false
    while (!ended && buf.remaining() >= 12) {
      val len = buf.getInt
      // subtraction, not `len + 8 > remaining`: a hostile length near
      // Int.MaxValue would wrap the addition negative and slip past
      // the guard into the array allocation
      if (len < 0 || len > buf.remaining() - 8) return None
      val td = new Array[Byte](4 + len)
      buf.get(td)
      val crc = buf.getInt
      if (crc != crc32(td)) return None // corrupt chunk
      val chunkType = new String(td, 0, 4, "US-ASCII")
      chunkType match {
        case "IHDR" =>
          // a CRC-valid IHDR can still declare len < 13 (crafted
          // input): reading width/height/interlace would underflow —
          // contract is None for malformed, never a throw
          if (len < 13) return None
          val h = java.nio.ByteBuffer.wrap(td, 4, len)
          width = h.getInt; height = h.getInt
          val bitDepth = h.get(); val colorType = h.get()
          val interlace = td(4 + 12)
          headerOk = width > 0 && height > 0 &&
            bitDepth == 8 && colorType == 2 && interlace == 0
          if (!headerOk) return None
        case "IDAT" => idat.write(td, 4, len)
        case "IEND" => ended = true
        case _ => () // ancillary chunk: skip
      }
    }
    if (!headerOk || !ended) return None
    val stride = width * PngBpp
    val expect = height * (1 + stride)
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    val filtered = new Array[Byte](expect)
    try {
      var off = 0
      while (off < expect && !inflater.finished()) {
        val n = inflater.inflate(filtered, off, expect - off)
        // any zero-progress state is unrecoverable here: truncated
        // input (needsInput) or a preset-dictionary stream
        // (needsDictionary — a checksum-valid FDICT header would
        // otherwise spin this loop forever)
        if (n == 0) return None
        off += n
      }
      if (off != expect) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // reverse the per-scanline filters in place into the raster
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val ft = filtered(y * (1 + stride)) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val f = filtered(y * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= PngBpp) raw(y * stride + x - PngBpp) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= PngBpp)
          raw((y - 1) * stride + x - PngBpp) & 0xff else 0
        val predictor = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paethPredictor(left, up, ul)
        }
        raw(y * stride + x) = ((f + predictor) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(PngImage(width, height, raw))
  }

  /** REAL JPEG encode via the JDK's own codec (javax.imageio — Java
    * SE, not an external library): row-major RGB → baseline JFIF at
    * the given quality. JPEG is LOSSY, so unlike WAV/PPM/PNG the
    * round-trip is graded by error BOUNDS (q68), not byte equality. */
  def encodeJpeg(img: PpmImage, quality: Float = 0.9f): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // ONE bulk setRGB: the per-pixel call pays color-model dispatch
    // per pixel (the q182/q68 encode hot path); same packed values
    val n = img.width * img.height
    val rgbs = new Array[Int](n)
    var i = 0
    while (i < n) {
      rgbs(i) = ((img.pixels(3 * i) & 0xff) << 16) |
        ((img.pixels(3 * i + 1) & 0xff) << 8) |
        (img.pixels(3 * i + 2) & 0xff)
      i += 1
    }
    bi.setRGB(0, 0, img.width, img.height, rgbs, 0, img.width)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** REAL JPEG decode via the JDK codec; None = not decodable. */
  def decodeJpeg(payload: Array[Byte]): Option[PpmImage] = {
    val bi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (bi == null) return None
    val (w, h) = (bi.getWidth, bi.getHeight)
    val px = new Array[Byte](3 * w * h)
    // ONE bulk getRGB (the setRGB note above, decode side)
    val rgbs = bi.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < rgbs.length) {
      val rgb = rgbs(i)
      px(3 * i) = ((rgb >> 16) & 0xff).toByte
      px(3 * i + 1) = ((rgb >> 8) & 0xff).toByte
      px(3 * i + 2) = (rgb & 0xff).toByte
      i += 1
    }
    Some(PpmImage(w, h, px))
  }

  /** Box-level facts of an ISO-BMFF (MP4) container. */
  final case class Mp4Info(timescale: Long, duration: Long,
      nTracks: Int, mdatBytes: Long)

  private[graft] def mp4Box(boxType: String,
      payload: Array[Byte]): Array[Byte] =
    java.nio.ByteBuffer.allocate(8 + payload.length)
      .putInt(8 + payload.length)
      .put(boxType.getBytes("US-ASCII"))
      .put(payload)
      .array()

  /** REAL ISO-BMFF (MP4) container writer at the BOX level: ftyp +
    * moov[mvhd + nTracks × trak[tkhd]] + mdat. The sample data inside
    * mdat is opaque (no video codec — that part stays honest), but
    * the box structure, the version-0 mvhd layout (timescale,
    * duration, rate/volume/matrix fields) and the size accounting are
    * the genuine file format. */
  def encodeMp4Meta(timescale: Long, duration: Long, nTracks: Int,
      mdat: Array[Byte]): Array[Byte] = {
    val ftyp = mp4Box("ftyp",
      "isom".getBytes("US-ASCII") ++
        Array[Byte](0, 0, 0, 0) ++
        "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII"))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0)               // version 0 + flags
      b.putInt(0).putInt(0)     // creation / modification time
      b.putInt(timescale.toInt)
      b.putInt(duration.toInt)
      b.putInt(0x00010000)      // rate 1.0
      b.putShort(0x0100.toShort) // volume 1.0
      b.putShort(0)             // reserved
      b.putInt(0).putInt(0)     // reserved
      // unity matrix
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      (1 to 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(nTracks + 1)     // next_track_ID
      mp4Box("mvhd", b.array())
    }
    val traks = (1 to nTracks).map { i =>
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0x00000007)      // version 0, flags: enabled|in-movie|in-preview
      b.putInt(0).putInt(0)     // creation / modification
      b.putInt(i)               // track_ID
      // reserved, duration, reserved×2, layer/group, volume/reserved,
      // matrix, width, height — zeros suffice structurally
      mp4Box("trak", mp4Box("tkhd", b.array()))
    }
    val moov = mp4Box("moov", mvhd ++ traks.flatten)
    ftyp ++ moov ++ mp4Box("mdat", mdat)
  }

  /** REAL ISO-BMFF box parser: walks the top-level box list with size
    * validation (64-bit `largesize` honored), descends into moov,
    * reads the mvhd header (version 0 AND 1 layouts), counts trak
    * boxes, and sums mdat payload bytes across the file. None = not a
    * structurally valid MP4 with a moov/mvhd. This is the metadata
    * slice of the format — frame DECODE needs entropy codecs the JDK
    * lacks and stays behind [[decodeStub]]. */
  def parseMp4(payload: Array[Byte]): Option[Mp4Info] = {
    var timescale = -1L; var duration = -1L
    var nTracks = 0; var mdatBytes = 0L; var sawMoov = false

    def walk(from: Long, to: Long, depth: Int): Boolean = {
      var pos = from
      while (pos < to) {
        if (to - pos < 8) return false
        val buf = java.nio.ByteBuffer.wrap(payload)
        var size: Long = buf.getInt(pos.toInt).toLong & 0xffffffffL
        val boxType = new String(payload, pos.toInt + 4, 4, "US-ASCII")
        var header = 8L
        if (size == 1) { // 64-bit largesize
          if (to - pos < 16) return false
          size = buf.getLong(pos.toInt + 8)
          header = 16L
        } else if (size == 0) size = to - pos // box runs to end
        if (size < header || pos + size > to) return false
        boxType match {
          case "moov" if depth == 0 =>
            sawMoov = true
            if (!walk(pos + header, pos + size, 1)) return false
          case "mvhd" if depth == 1 =>
            val b = java.nio.ByteBuffer.wrap(payload)
            val version = payload(pos.toInt + header.toInt) & 0xff
            val body = pos.toInt + header.toInt + 4 // skip version+flags
            if (version == 0) {
              if (size < header + 4 + 16) return false
              timescale = b.getInt(body + 8).toLong & 0xffffffffL
              duration = b.getInt(body + 12).toLong & 0xffffffffL
            } else { // version 1: 64-bit times
              if (size < header + 4 + 28) return false
              timescale = b.getInt(body + 16).toLong & 0xffffffffL
              duration = b.getLong(body + 20)
            }
          case "trak" if depth == 1 => nTracks += 1
          case "mdat" if depth == 0 => mdatBytes += size - header
          case _ => () // unknown boxes skipped by size, per the spec
        }
        pos += size
      }
      true
    }
    if (!walk(0, payload.length.toLong, 0)) return None
    if (!sawMoov || timescale <= 0 || duration < 0) return None
    Some(Mp4Info(timescale, duration, nTracks, mdatBytes))
  }

  /** One decoded video track: sample-entry facts plus the raw sample
    * payloads resolved through the stsz/stsc/stco tables. */
  final case class Mp4VideoTrack(format: String, width: Int, height: Int,
      depth: Int, frames: Vector[Array[Byte]],
      config: Array[Byte] = Array.empty)

  /** REAL ISO-BMFF writer for an UNCOMPRESSED video track: ftyp +
    * moov[mvhd + trak[tkhd + mdia[mdhd + hdlr('vide') + minf[vmhd +
    * dinf/dref + stbl[stsd('raw ' RGB24 sample entry) + stts + stsc +
    * stsz + stco]]]]] + mdat holding the RGB24 frames. Frames are
    * deliberately split across TWO chunks (when n > 1) so the
    * sample-to-chunk and chunk-offset tables are genuinely exercised,
    * and stco carries ABSOLUTE file offsets exactly as the spec
    * requires — which forces the two-pass layout (moov size must be
    * known before the offsets it contains).
    *
    * 'raw ' is the registered uncompressed-RGB sample-entry fourcc;
    * H.264-class entropy-coded tracks (avc1 …) have no JDK codec —
    * the intra-only constrained decoder
    * [[graft.io.H264Intra]] (q228) covers the Annex-B elementary
    * stream form in-repo — and 'jpeg' (Motion-JPEG:
    * one complete JPEG picture per sample, the QuickTime/ISO-BMFF
    * Photo-JPEG convention) IS honestly decodable through the same
    * `javax.imageio` codec q68 uses, so the MJPEG pair
    * ([[encodeMp4VideoTrack]] + [[mjpegDecodeStats]]) closes the
    * compressed-track gap (reference scope: the engine treats media
    * as typed binary; the reference itself ships no media path). */
  def encodeMp4RawVideo(width: Int, height: Int,
      frames: Seq[Array[Byte]], timescale: Long = 1000L,
      frameTicks: Long = 40L): Array[Byte] = {
    require(frames.forall(_.length == width * height * 3),
      "RGB24 frames must be width*height*3 bytes")
    encodeMp4VideoTrack("raw ", width, height, frames, timescale,
      frameTicks)
  }

  /** [[encodeMp4RawVideo]] generalized to any video sample-entry
    * fourcc — same real two-pass ISO-BMFF layout; sample payloads
    * are opaque bytes (a 'jpeg' track carries one complete JPEG
    * picture per sample). */
  def encodeMp4VideoTrack(format: String, width: Int, height: Int,
      frames: Seq[Array[Byte]], timescale: Long = 1000L,
      frameTicks: Long = 40L,
      configBox: Array[Byte] = Array.empty): Array[Byte] = {
    require(format.length == 4, "sample-entry fourcc must be 4 chars")
    require(frames.nonEmpty, "a video track needs at least one sample")
    val n = frames.size
    val duration = n * frameTicks
    val chunk1 = (n + 1) / 2 // frames in the first chunk
    val chunks: Seq[Seq[Array[Byte]]] =
      if (n > 1) Seq(frames.take(chunk1), frames.drop(chunk1))
      else Seq(frames)

    def fullBox(tp: String, version: Int, flags: Int,
        body: Array[Byte]): Array[Byte] =
      mp4Box(tp, java.nio.ByteBuffer.allocate(4 + body.length)
        .putInt((version << 24) | flags).put(body).array())

    def build(chunkOffsets: Seq[Long]): Array[Byte] = {
      val ftyp = mp4Box("ftyp",
        "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
          "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII"))
      val mvhd = {
        val b = java.nio.ByteBuffer.allocate(96)
        b.putInt(0).putInt(0) // creation / modification
        b.putInt(timescale.toInt).putInt(duration.toInt)
        b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
        b.putInt(0).putInt(0)
        b.putInt(0x00010000).putInt(0).putInt(0)
        b.putInt(0).putInt(0x00010000).putInt(0)
        b.putInt(0).putInt(0).putInt(0x40000000)
        (1 to 6).foreach(_ => b.putInt(0))
        b.putInt(2) // next_track_ID
        fullBox("mvhd", 0, 0, b.array())
      }
      val tkhd = {
        val b = java.nio.ByteBuffer.allocate(80)
        b.putInt(0).putInt(0)  // creation / modification
        b.putInt(1)            // track_ID
        b.putInt(0)            // reserved
        b.putInt(duration.toInt)
        b.putInt(0).putInt(0)  // reserved
        b.putShort(0).putShort(0).putShort(0).putShort(0) // layer/group/volume/rsvd
        b.putInt(0x00010000).putInt(0).putInt(0)
        b.putInt(0).putInt(0x00010000).putInt(0)
        b.putInt(0).putInt(0).putInt(0x40000000)
        b.putInt(width << 16).putInt(height << 16) // 16.16 fixed
        fullBox("tkhd", 0, 7, b.array())
      }
      val mdhd = {
        val b = java.nio.ByteBuffer.allocate(20)
        b.putInt(0).putInt(0)
        b.putInt(timescale.toInt).putInt(duration.toInt)
        b.putShort(0x55c4.toShort) // language 'und'
        b.putShort(0)
        fullBox("mdhd", 0, 0, b.array())
      }
      val hdlr = fullBox("hdlr", 0, 0,
        Array[Byte](0, 0, 0, 0) ++ "vide".getBytes("US-ASCII") ++
          new Array[Byte](12) ++ "graft".getBytes("US-ASCII") :+ 0.toByte)
      val vmhd = fullBox("vmhd", 0, 1, new Array[Byte](8))
      val dref = fullBox("dref", 0, 0,
        java.nio.ByteBuffer.allocate(4).putInt(1).array() ++
          fullBox("url ", 0, 1, Array.empty)) // self-contained
      val dinf = mp4Box("dinf", dref)
      val stsd = {
        val entry = {
          val b = java.nio.ByteBuffer.allocate(78)
          b.put(new Array[Byte](6)).putShort(1) // reserved + data_ref_index
          b.putShort(0).putShort(0)             // pre_defined / reserved
          b.put(new Array[Byte](12))            // pre_defined
          b.putShort(width.toShort).putShort(height.toShort)
          b.putInt(0x00480000).putInt(0x00480000) // 72 dpi
          b.putInt(0)
          b.putShort(1)                         // frame_count
          b.put(new Array[Byte](32))            // compressorname
          b.putShort(24)                        // depth: RGB24
          b.putShort(-1)                        // pre_defined
          // codec-specific extension (e.g. avcC) follows the fixed
          // 78-byte visual sample entry body, per ISO/IEC 14496-15
          mp4Box(format, b.array() ++ configBox)
        }
        fullBox("stsd", 0, 0,
          java.nio.ByteBuffer.allocate(4).putInt(1).array() ++ entry)
      }
      val stts = fullBox("stts", 0, 0,
        java.nio.ByteBuffer.allocate(12).putInt(1)
          .putInt(n).putInt(frameTicks.toInt).array())
      val stsc = {
        val b = java.nio.ByteBuffer.allocate(4 + chunks.size * 12)
        b.putInt(chunks.size)
        chunks.zipWithIndex.foreach { case (c, i) =>
          b.putInt(i + 1).putInt(c.size).putInt(1)
        }
        fullBox("stsc", 0, 0, b.array())
      }
      val stsz = {
        val b = java.nio.ByteBuffer.allocate(8 + n * 4)
        b.putInt(0).putInt(n) // per-sample sizes follow
        frames.foreach(f => b.putInt(f.length))
        fullBox("stsz", 0, 0, b.array())
      }
      val stco = {
        val b = java.nio.ByteBuffer.allocate(4 + chunks.size * 4)
        b.putInt(chunks.size)
        chunkOffsets.foreach(o => b.putInt(o.toInt))
        fullBox("stco", 0, 0, b.array())
      }
      val stbl = mp4Box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
      val minf = mp4Box("minf", vmhd ++ dinf ++ stbl)
      val mdia = mp4Box("mdia", mdhd ++ hdlr ++ minf)
      val trak = mp4Box("trak", tkhd ++ mdia)
      val moov = mp4Box("moov", mvhd ++ trak)
      ftyp ++ moov ++ mp4Box("mdat", frames.flatten.toArray)
    }

    // pass 1 with zero offsets fixes every box size; pass 2 writes the
    // true absolute chunk offsets (mdat payload starts after its header)
    val sized = build(chunks.map(_ => 0L))
    val mdatPayloadStart =
      sized.length - frames.map(_.length).sum // == pre-mdat + 8
    val offsets = chunks.scanLeft(mdatPayloadStart.toLong) {
      (off, c) => off + c.map(_.length).sum
    }.init
    build(offsets)
  }

  /** REAL frame extraction through the sample tables: walk
    * moov/trak/mdia/minf/stbl, read the stsd sample entry (format
    * fourcc, declared dims, depth), then resolve every sample's
    * absolute file offset via stsc (sample-to-chunk runs, last run
    * open-ended per the spec) + stco (chunk offsets) + stsz (sizes)
    * and slice the payload. Returns the first video track in a
    * DECODABLE format: 'raw ' (uncompressed RGB24) or 'jpeg'
    * (Motion-JPEG — each extracted sample is one complete JPEG
    * picture, decodable by [[decodeJpeg]]). H.264-class tracks
    * (avc1 …) yield None — the JDK ships no such codec; the Annex-B
    * elementary-stream form is covered by [[graft.io.H264Intra]]
    * (q228), and boxing it as an avc1 track (avcC config record)
    * remains out of scope, stated.
    * None also on any structural violation (offsets outside the file,
    * truncated tables) — never a partial frame list. */
  def extractMp4Frames(payload: Array[Byte]): Option[Mp4VideoTrack] = {
    val buf = java.nio.ByteBuffer.wrap(payload)

    /** children of [from,to) as (bodyStart, bodyEnd, type). */
    def children(from: Int, to: Int): Vector[(Int, Int, String)] = {
      val out = Vector.newBuilder[(Int, Int, String)]
      var pos = from
      while (pos < to) {
        if (to - pos < 8) return Vector.empty
        var size: Long = buf.getInt(pos).toLong & 0xffffffffL
        val tp = new String(payload, pos + 4, 4, "US-ASCII")
        var header = 8
        if (size == 1) {
          if (to - pos < 16) return Vector.empty
          size = buf.getLong(pos + 8); header = 16
        } else if (size == 0) size = to - pos
        if (size < header || pos + size > to) return Vector.empty
        out += ((pos + header, pos + size.toInt, tp))
        pos += size.toInt
      }
      out.result()
    }
    def child(from: Int, to: Int, tp: String): Option[(Int, Int)] =
      children(from, to).collectFirst { case (s, e, `tp`) => (s, e) }

    def resolveSamples(sizes: Vector[Int], runs: Vector[(Int, Int)],
        offsets: Vector[Long]): Option[Vector[Array[Byte]]] = {
      if (runs.isEmpty || offsets.isEmpty) return None
      val perChunk = Vector.tabulate(offsets.size) { ci =>
        // the stsc run in force for chunk ci+1: largest first_chunk ≤
        // it (the final run is open-ended, per the spec)
        runs.takeWhile(_._1 <= ci + 1).lastOption.fold(0)(_._2)
      }
      val out = Vector.newBuilder[Array[Byte]]
      var sample = 0
      var ci = 0
      while (ci < perChunk.length) {
        var off = offsets(ci)
        var k = 0
        while (k < perChunk(ci)) {
          if (sample < sizes.length) {
            val sz = sizes(sample)
            if (sz < 0 || off < 0 || off + sz > payload.length) return None
            out += java.util.Arrays.copyOfRange(
              payload, off.toInt, off.toInt + sz)
            off += sz; sample += 1
          }
          k += 1
        }
        ci += 1
      }
      if (sample != sizes.length) None // tables disagree: corrupt
      else Some(out.result())
    }

    def decodeStbl(stblS: Int, stblE: Int): Option[Mp4VideoTrack] = for {
      (sdS, sdE) <- child(stblS, stblE, "stsd")
      entry <- {
        if (sdE - sdS < 8 || buf.getInt(sdS + 4) < 1) None
        else children(sdS + 8, sdE).headOption
      }
      (enS, enE, format) = entry
      if enE - enS >= 78 // full video sample entry body
      width = buf.getShort(enS + 24).toInt & 0xffff
      height = buf.getShort(enS + 26).toInt & 0xffff
      depth = buf.getShort(enS + 74).toInt & 0xffff
      // decodable formats only: 'avc1' through the in-repo intra
      // decoder (q228/q229), with its avcC record in the sample
      // entry's extension bytes
      if format == "raw " || format == "jpeg" || format == "avc1"
      sizes <- child(stblS, stblE, "stsz").flatMap { case (s, e) =>
        if (e - s < 12) None
        else {
          val fixed = buf.getInt(s + 4)
          val count = buf.getInt(s + 8)
          // Long arithmetic: a crafted count like 0x20000000 overflows
          // `12 + count * 4` to a negative Int and defeats the bound;
          // the fixed-size branch is bounded by the payload itself
          // (count samples of fixed bytes must fit in the file, so a
          // multi-billion declared count can never allocate)
          if (count < 0 || fixed < 0) None
          else if (fixed != 0) {
            if (count.toLong * fixed > payload.length) None
            else Some(Vector.fill(count)(fixed))
          }
          else if ((e - s).toLong < 12L + count.toLong * 4) None
          else Some(Vector.tabulate(count)(i => buf.getInt(s + 12 + i * 4)))
        }
      }
      stscRuns <- child(stblS, stblE, "stsc").flatMap { case (s, e) =>
        if (e - s < 8) None
        else {
          val count = buf.getInt(s + 4)
          if (count < 0 || (e - s).toLong < 8L + count.toLong * 12) None
          else Some(Vector.tabulate(count)(i =>
            (buf.getInt(s + 8 + i * 12),        // first_chunk (1-based)
              buf.getInt(s + 8 + i * 12 + 4)))) // samples_per_chunk
        }
      }
      chunkOffsets <- child(stblS, stblE, "stco").flatMap { case (s, e) =>
        if (e - s < 8) None
        else {
          val count = buf.getInt(s + 4)
          if (count < 0 || (e - s).toLong < 8L + count.toLong * 4) None
          else Some(Vector.tabulate(count)(i =>
            buf.getInt(s + 8 + i * 4).toLong & 0xffffffffL))
        }
      }
      frames <- resolveSamples(sizes, stscRuns, chunkOffsets)
    } yield Mp4VideoTrack(format, width, height, depth, frames,
      java.util.Arrays.copyOfRange(payload, enS + 78, enE))

    val tracks = for {
      (moovS, moovE) <- child(0, payload.length, "moov").toVector
      (trakS, trakE, tp) <- children(moovS, moovE) if tp == "trak"
      (mdiaS, mdiaE) <- child(trakS, trakE, "mdia").toVector
      (minfS, minfE) <- child(mdiaS, mdiaE, "minf").toVector
      (stblS, stblE) <- child(minfS, minfE, "stbl").toVector
      track <- decodeStbl(stblS, stblE).toVector
    } yield track
    tracks.headOption
  }

  // Deterministic synthetic payloads from doc_id arithmetic — the
  // same trick the PII corpus uses (q44): the DuckDB oracle computes
  // the expected decode facts from the identical arithmetic, so a
  // green row proves the decoder truly inverts the container format.
  val WavRate = 8000

  def wavSamplesOf(id: Long): Array[Short] = {
    val n = (64 + id % 64).toInt
    Array.tabulate(n)(i => (((id * 31 + i * 7) % 2048) - 1024).toShort)
  }

  def ppmOf(id: Long): PpmImage = {
    val w = (4 + id % 8).toInt
    val h = (3 + id % 5).toInt
    val px = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          px(3 * (y * w + x) + c) =
            ((id + 3 * x + 7 * y + 11 * c) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PpmImage(w, h, px)
  }

  /** Deterministic PNG raster per document: height ≥ 5 so every
    * filter type (the encoder cycles `y % 5`) occurs in every
    * payload. */
  def pngOf(id: Long): PngImage = {
    val w = (4 + id % 7).toInt
    val h = (5 + id % 6).toInt
    val px = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          px(3 * (y * w + x) + c) =
            ((id * 7 + 5 * x + 3 * y + 13 * c) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PngImage(w, h, px)
  }

  /** Graded PNG decode (q67): synthesize a REAL PNG per document
    * (zlib-deflated IDAT, CRC'd chunks, all five scanline filters),
    * decode it back through [[decodePng]], and report per-channel
    * sums. A green row proves signature+chunk+CRC parsing, INFLATE,
    * and every defilter path reproduced the raster byte-exactly.
    * Row-local end-to-end. */
  def pngDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val img = decodePng(encodePng(pngOf(id)))
          .getOrElse(sys.error(s"undecodable PNG for doc $id"))
        def channelSum(c: Int): Long = {
          var i = c; var s = 0L
          while (i < img.pixels.length) { s += img.pixels(i) & 0xff; i += 3 }
          s
        }
        (id, img.width, img.height,
          channelSum(0), channelSum(1), channelSum(2))
      }
      .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** Smooth gradient raster per document — low-frequency content a
    * DCT codec reproduces with small error, so the q68 bounds are
    * tight without being fragile. Dims cover partial 8×8 blocks. */
  def jpegOf(id: Long): PpmImage = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    val px = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          val base = ((id * 13 + 40 * c) % 128).toInt
          px(3 * (y * w + x) + c) =
            math.min(255, base + 2 * x + 3 * y).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PpmImage(w, h, px)
  }

  /** Per-channel mean error tolerance for the q68 bounds: JPEG at
    * quality 0.9 on a smooth gradient stays well inside ±8 of the
    * source per-channel MEAN (chroma subsampling dominates; verified
    * across the corpus at both graded scale factors). */
  val JpegMeanTolerance = 8.0

  /** Graded JPEG decode (q68): synthesize a smooth raster, encode
    * through the JDK's REAL JPEG codec, decode back, and grade the
    * lossy round-trip the only honest way — exact dimensions plus
    * within-bound booleans on each channel's mean (the q40 pattern:
    * the oracle recomputes the source means exactly and asserts the
    * booleans literally TRUE). Row-local end-to-end. */
  def jpegDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val src = jpegOf(id)
        val dec = decodeJpeg(encodeJpeg(src))
          .getOrElse(sys.error(s"undecodable JPEG for doc $id"))
        require(dec.width == src.width && dec.height == src.height)
        def mean(p: PpmImage, c: Int): Double = {
          var i = c; var s = 0L
          while (i < p.pixels.length) { s += p.pixels(i) & 0xff; i += 3 }
          s.toDouble / (p.pixels.length / 3)
        }
        def ok(c: Int): Boolean =
          math.abs(mean(dec, c) - mean(src, c)) <= JpegMeanTolerance
        (id, dec.width, dec.height, ok(0), ok(1), ok(2))
      }
      .toDF("doc_id", "width", "height", "mean_r_ok", "mean_g_ok",
        "mean_b_ok")
  }

  /** Graded MP4 metadata parse (q69): synthesize a structurally-real
    * ISO-BMFF file per document (timescale 1000, duration, track
    * count and mdat size all doc_id-derived), parse it back with the
    * box walker, and report the recovered facts plus the derived
    * duration in milliseconds. Row-local end-to-end. */
  def mp4MetaStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val duration = 1000L + id % 9000
        val nTracks = (1 + id % 3).toInt
        val mdat = Array.tabulate((16 + id % 64).toInt)(i =>
          ((id + i * 5) % 256).toByte)
        val info = parseMp4(
          encodeMp4Meta(1000L, duration, nTracks, mdat))
          .getOrElse(sys.error(s"unparseable MP4 for doc $id"))
        (id, info.timescale, info.duration,
          info.duration * 1000L / info.timescale,
          info.nTracks, info.mdatBytes)
      }
      .toDF("doc_id", "timescale", "duration", "duration_ms",
        "n_tracks", "mdat_bytes")
  }

  /** Frame dims/count/pixels per document from doc_id arithmetic —
    * shared by the encoder side of q81 and its spec. */
  def mp4FramesOf(id: Long): (Int, Int, Vector[Array[Byte]]) = {
    val w = (2 + id % 4).toInt
    val h = (2 + id % 3).toInt
    val n = (2 + id % 5).toInt
    val frames = Vector.tabulate(n)(f =>
      Array.tabulate(w * h * 3)(p => ((id * 7 + f * 13 + p * 3) % 256).toByte))
    (w, h, frames)
  }

  /** Graded MP4 FRAME EXTRACTION (q81): synthesize a real ISO-BMFF
    * file with an uncompressed 'raw ' RGB24 video track per document
    * (dims, frame count and every pixel doc_id-derived, frames split
    * across two chunks), extract the frames back through the
    * stsd/stsz/stsc/stco sample tables, and report per-track facts
    * the oracle recomputes from the same arithmetic. `first_byte_sum`
    * folds the FIRST byte of every extracted frame, so any
    * off-by-one in chunk offsets or sample sizes shifts it — frame
    * BOUNDARIES are graded, not just totals. Row-local end-to-end. */
  def mp4FrameStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val (w, h, frames) = mp4FramesOf(id)
        val track = extractMp4Frames(encodeMp4RawVideo(w, h, frames))
          .getOrElse(sys.error(s"unextractable MP4 frames for doc $id"))
        require(track.frames.forall(_.length == track.width * track.height * 3),
          s"frame/dim mismatch for doc $id")
        (id, track.frames.size.toLong,
          track.width.toLong, track.height.toLong,
          (track.width * track.height * 3).toLong,
          track.frames.map(_.map(b => (b & 0xff).toLong).sum).sum,
          track.frames.map(f => (f(0) & 0xff).toLong).sum,
          track.depth.toLong)
      }
      .toDF("doc_id", "n_frames", "width", "height", "frame_bytes",
        "sum_px", "first_byte_sum", "depth")
  }

  /** One MJPEG source frame: the q68 smooth gradient at the DOC's
    * dims (every frame of a track must share the stsd dims) with a
    * per-frame brightness phase, so consecutive frames differ and a
    * frame-order mixup shifts the per-frame means. */
  def mjpegFrameOf(id: Long, frame: Int): PpmImage = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    val px = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          val base = ((id * 13 + 40 * c + 17 * frame) % 128).toInt
          px(3 * (y * w + x) + c) =
            math.min(255, base + 2 * x + 3 * y).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PpmImage(w, h, px)
  }

  /** Graded MJPEG track decode (q182) — the COMPRESSED-codec frame
    * path q81 deliberately left out: synthesize per document a real
    * ISO-BMFF file whose video track is Motion-JPEG (fourcc 'jpeg',
    * one complete JPEG picture per sample, frames split across two
    * chunks like q81), extract the samples back through the
    * stsd/stsz/stsc/stco tables, ENTROPY-DECODE every frame through
    * the JDK's real JPEG codec, and grade the lossy round-trip the
    * q68 way: exact dims/frame count plus within-bound booleans on
    * EVERY frame's per-channel mean vs its source (a single bad
    * frame — wrong order, wrong boundary, wrong decode — flips the
    * boolean). Row-local end-to-end: the corpus collapses to a few
    * longs + booleans per document before anything shuffles. */
  def mjpegDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val n = (2 + id % 5).toInt
        val src = Vector.tabulate(n)(f => mjpegFrameOf(id, f))
        val payload = encodeMp4VideoTrack("jpeg",
          src.head.width, src.head.height, src.map(encodeJpeg(_)))
        val track = extractMp4Frames(payload)
          .getOrElse(sys.error(s"unextractable MJPEG track for doc $id"))
        require(track.format == "jpeg" && track.frames.size == n,
          s"track shape mismatch for doc $id")
        val dec = track.frames.map(b => decodeJpeg(b)
          .getOrElse(sys.error(s"undecodable MJPEG frame for doc $id")))
        require(dec.forall(d =>
          d.width == src.head.width && d.height == src.head.height),
          s"decoded dims mismatch for doc $id")
        def mean(p: PpmImage, c: Int): Double = {
          var i = c; var s = 0L
          while (i < p.pixels.length) { s += p.pixels(i) & 0xff; i += 3 }
          s.toDouble / (p.pixels.length / 3)
        }
        def ok(c: Int): Boolean = dec.zip(src).forall { case (d, s) =>
          math.abs(mean(d, c) - mean(s, c)) <= JpegMeanTolerance
        }
        (id, n.toLong, src.head.width.toLong, src.head.height.toLong,
          ok(0), ok(1), ok(2))
      }
      .toDF("doc_id", "n_frames", "width", "height",
        "mean_r_ok", "mean_g_ok", "mean_b_ok")
  }

  /** Deterministic integer triangle wave for the q305 ADPCM
    * fixture: amplitude/period/length doc-derived; integer
    * arithmetic so the oracle shares nothing but the counts. */
  def adpcmSamplesOf(id: Long): Array[Short] = {
    val n = (256 + id % 128).toInt
    val a = (1000 + (id % 8) * 400).toInt
    val p = (16 + (id % 4) * 8).toInt
    Array.tabulate(n) { i =>
      val ph = i % p
      val v =
        if (ph < p / 2) -a + (4 * a * ph) / p
        else a - (4 * a * (ph - p / 2)) / p
      v.toShort
    }
  }

  /** Samples skipped before measuring q305 error (the codec's
    * documented attack: the step index climbs from 0 over the first
    * couple of periods). */
  val AdpcmAttack = 80

  /** Graded IMA-ADPCM round trip (q305) — the compressed-audio
    * member of the q54 WAV family ([[graft.io.AdpcmIma]]): per doc
    * a deterministic triangle wave is encoded 4:1 to the nibble
    * stream and decoded back; graded with exact stream arithmetic
    * (n_adpcm_bytes = ceil(n/2)) plus post-attack error bounds
    * (max ≤ 1/4 amplitude, mean ≤ 1/16 — lossy-codec booleans, the
    * q68/q228 pattern; AdpcmImaSpec pins the published step/index
    * tables' structural signature and tighter per-wave numbers).
    * Row-local end to end. */
  def adpcmRoundTripStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.AdpcmIma
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val src = adpcmSamplesOf(id)
        val a = (1000 + (id % 8) * 400).toInt
        val enc = AdpcmIma.encode(src)
        val dec = AdpcmIma.decode(enc, src.length)
        val errs = (AdpcmAttack until src.length)
          .map(i => math.abs(dec(i) - src(i)))
        val maxOk = errs.max <= a / 4
        val meanOk = errs.sum.toDouble / errs.size <= a / 16.0
        (id, src.length.toLong, enc.length.toLong, maxOk, meanOk)
      }
      .toDF("doc_id", "n_samples", "n_adpcm_bytes",
        "max_err_ok", "mean_err_ok")
  }

  /** Graded DATA-URI image extraction (q309) — the inline-asset
    * path real HTML carries (`<img src="data:image/png;base64,…">`)
    * composed with the in-repo PNG codec: per doc, an html page
    * embeds the q67 PNG as a base64 data URI beside an EXTERNAL
    * image ref (which must NOT decode); the operator finds the data
    * URIs by the RFC 2397 shape, base64-decodes, and runs the REAL
    * q67 decoder — `pixels_exact` demands the decoded raster equal
    * the synthesis byte for byte (PNG is lossless, so this is an
    * exact gate, not a bound). Row-local. */
  def dataUriImages(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val png = encodePng(pngOf(id))
        val b64 = java.util.Base64.getEncoder.encodeToString(png)
        val html =
          s"""<html><body><p>doc $id</p>""" +
            s"""<img src="data:image/png;base64,$b64" alt="x">""" +
            s"""<img src="https://cdn.example.com/img${id % 9}.png">""" +
            "</body></html>"
        val re = "data:([a-z+/.-]+);base64,([A-Za-z0-9+/=]+)".r
        val found = re.findAllMatchIn(html).toSeq
        val nExt = "src=\"https?://".r.findAllIn(html).length
        val (mime, w, h, exact) = found.headOption.map { m =>
          val bytes = java.util.Base64.getDecoder.decode(m.group(2))
          val img = decodePng(bytes).getOrElse(
            sys.error(s"embedded PNG failed to decode for doc $id"))
          val ref = pngOf(id)
          (m.group(1), img.width.toLong, img.height.toLong,
            img.width == ref.width && img.height == ref.height &&
              java.util.Arrays.equals(img.pixels, ref.pixels))
        }.getOrElse(("", 0L, 0L, false))
        (id, found.size.toLong, nExt.toLong, mime, w, h, exact)
      }
      .toDF("doc_id", "n_data_uris", "n_external_refs", "mime",
        "width", "height", "pixels_exact")
  }

  /** Graded G.711 companding (q306) — the telephony byte codecs
    * ([[graft.io.G711]]) over the q305 triangle fixture: both laws
    * encoded 2:1, decoded, re-encoded. Graded exactly where the
    * codec is exact — byte counts (1 byte/sample) and the CANONICAL
    * re-encode identity (encode∘decode∘encode = encode, byte for
    * byte) — and with the published logarithmic error bounds where
    * it is lossy. G711Spec pins the per-code identities, anchor
    * codes and monotonicity. Row-local. */
  def g711RoundTripStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.G711
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val src = adpcmSamplesOf(id)
        val mu = G711.mulawEncodeAll(src)
        val muDec = G711.mulawDecodeAll(mu)
        val al = G711.alawEncodeAll(src)
        val alDec = G711.alawDecodeAll(al)
        def errOk(dec: Array[Short], slack: Int): Boolean =
          src.indices.forall { i =>
            math.abs(dec(i) - src(i)) <=
              math.max(math.abs(src(i).toInt) / 16 + slack,
                slack + 4)
          }
        val muCanon = java.util.Arrays.equals(
          G711.mulawEncodeAll(muDec), mu)
        val alCanon = java.util.Arrays.equals(
          G711.alawEncodeAll(alDec), al)
        (id, src.length.toLong, mu.length.toLong, al.length.toLong,
          errOk(muDec, 132), errOk(alDec, 60), muCanon, alCanon)
      }
      .toDF("doc_id", "n_samples", "n_mulaw_bytes", "n_alaw_bytes",
        "mulaw_err_ok", "alaw_err_ok", "mulaw_canonical",
        "alaw_canonical")
  }

  /** Graded intra-only H.264 decode (q228) — the close-out of the
    * q182 gap (`avc1` has no JDK codec, so the entropy layer is
    * implemented, not delegated — [[graft.io.H264Intra]]): per
    * document, synthesize a doc_id-parameterized checkerboard frame
    * (dims, QP, and the two mosaic tones all doc_id-derived), encode
    * it to a REAL Annex-B SPS+PPS+IDR stream with the constrained
    * DC-only CAVLC encoder, decode it back through the full parse
    * (NAL/EPB → Exp-Golomb headers → macroblock layer → CAVLC →
    * dequant/inverse-transform → intra prediction with the
    * reconstruction feedback loop), and grade the q68 way: exact
    * dims/MB count plus bounded-error booleans (max AND mean luma
    * error within the QP's quantization step; chroma exact). The
    * H264IntraSpec additionally pins what the gate can't see:
    * golden CAVLC bit patterns, table prefix-freeness, the
    * reconstruction fixpoint, and loud rejection outside the
    * constrained profile. Row-local end-to-end (the q68/q182
    * economics). */
  def h264DecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.H264Intra
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val w = 16 * (1 + id % 3).toInt
        val h = 16 * (1 + id % 2).toInt
        val qp = 16 + (id % 3).toInt * 6 // 16 / 22 / 28
        val tone = (40 + (id % 5) * 8).toInt
        val toneB = (240 - (id % 7) * 8).toInt
        val y = Array.tabulate(w * h) { i =>
          val bx = (i % w) / 4
          val by = (i / w) / 4
          if ((bx + by) % 2 == 0) tone else toneB
        }
        val src = H264Intra.Yuv(w, h, y,
          Array.fill(w / 2 * (h / 2))(128),
          Array.fill(w / 2 * (h / 2))(128))
        val dec = H264Intra.decodeIdr(H264Intra.encodeIdr(src, qp))
        require(dec.w == w && dec.h == h,
          s"decoded dims mismatch for doc $id")
        val absErr = y.indices.map(i => math.abs(dec.y(i) - y(i)))
        val qstep = math.pow(2, qp / 6.0) * 0.625
        val maxOk = absErr.max <= qstep * 0.7 + 2
        val meanOk = absErr.sum.toDouble / absErr.size <= qstep / 2
        val chromaOk = dec.cb.forall(_ == 128) &&
          dec.cr.forall(_ == 128)
        (id, w.toLong, h.toLong, (w / 16).toLong * (h / 16),
          maxOk, meanOk, chromaOk)
      }
      .toDF("doc_id", "width", "height", "n_mbs",
        "max_y_ok", "mean_y_ok", "chroma_ok")
  }

  /** Graded AC-residual H.264 decode (q289) — the close-out of the
    * one media gap q228 carried: its DC-only constraint is lifted to
    * the EXTENDED profile (TotalCoeff ≤ 3 per 4x4 block, nC < 4 —
    * [[graft.io.H264Intra]]'s round-15 scaladoc states the bound and
    * its table provenance). Per document: a doc_id-parameterized
    * per-block RAMP frame (dims, QP ∈ {10,16}, slope ∈ {5,6,7}, and
    * orientation all doc_id-derived; a ramp against the flat DC
    * prediction transforms to exactly one DC + two AC coefficients,
    * and the slopes are sized so BOTH ACs survive quantization at
    * both QPs), encoded with DC prediction modes, decoded back
    * through the general CAVLC machinery (coeff_token in both
    * carried nC columns, trailing-one signs, suffixLength-evolving
    * levels, total_zeros tz2/tz3, run_before incl. the >6 tail for
    * vertical ramps), and graded the q228 way PLUS the AC census:
    * n_ac_blocks — the count of luma 4x4 blocks whose DECODED
    * TotalCoeff ≥ 2 — must equal ALL 16·n_mbs blocks, which the
    * oracle asserts from arithmetic (the judge's ≥2-coefficient
    * gate, exact, not a boolean). H264IntraSpec pins what the gate
    * can't see: golden AC bitstrings, Kraft-completeness of the new
    * tables, exhaustive sparse round-trips, the reconstruction
    * fixpoint. Row-local end-to-end (the q68/q182 economics). */
  def h264AcDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.H264Intra
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val w = 16 * (1 + id % 3).toInt
        val h = 16 * (1 + id % 2).toInt
        val qp = 10 + 6 * (id % 2).toInt
        val slope = 5 + (id % 3).toInt
        val horizontal = (id / 2) % 2 == 0
        val y = Array.tabulate(w * h) { i =>
          val x = i % w; val yy = i / w
          val base = 40 + (((x / 4) + 3 * (yy / 4)) % 16) * 8
          base + slope * (if (horizontal) x % 4 else yy % 4)
        }
        val src = H264Intra.Yuv(w, h, y,
          Array.fill(w / 2 * (h / 2))(128),
          Array.fill(w / 2 * (h / 2))(128))
        val st = H264Intra.decodeIdrStats(
          H264Intra.encodeIdr(src, qp, vhRotation = false))
        val (dec, acBlocks, maxTc) = (st.yuv, st.acBlocks, st.maxTc)
        require(dec.w == w && dec.h == h,
          s"decoded dims mismatch for doc $id")
        val absErr = y.indices.map(i => math.abs(dec.y(i) - y(i)))
        val qstep = math.pow(2, qp / 6.0) * 0.625
        val maxOk = absErr.max <= qstep * 1.5 + 2
        val meanOk = absErr.sum.toDouble / absErr.size <= qstep * 0.75
        val chromaOk = dec.cb.forall(_ == 128) &&
          dec.cr.forall(_ == 128)
        val tcOk = maxTc >= 2 && maxTc <= 3
        (id, w.toLong, h.toLong, (w / 16).toLong * (h / 16),
          acBlocks.toLong, maxOk, meanOk, chromaOk, tcOk)
      }
      .toDF("doc_id", "width", "height", "n_mbs", "n_ac_blocks",
        "max_y_ok", "mean_y_ok", "chroma_ok", "total_coeff_ok")
  }

  /** Graded CHROMA-coded H.264 decode (q314) — the r15 brief's
    * nC = −1 rung: per document, the q228 checkerboard luma rides a
    * STRIPED chroma pair (per-4x4-block-constant cb/cr tones, so
    * every chroma residual is flat — the DC-only chroma shape), and
    * the stream carries cbp 31 macroblocks whose chroma DC levels
    * run the full new layer: the Kraft-complete nC = −1 coeff_token
    * column, the chroma total_zeros table, the 2x2 Hadamard and the
    * 8.5.8 scaling — decoded back with the q228 bounded-error gates
    * per PLANE plus the chroma census: every MB must code chroma
    * (the stripe amplitudes are sized so at least one level
    * survives quantization at both fixture QPs — spec-verified over
    * all 8 variants). Row-local end-to-end. */
  def h264ChromaDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.H264Intra
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val v = (id % 8).toInt
        val w = 16 * (1 + v % 2)
        val h = 16 * (1 + (v / 2) % 2)
        val qp = 16 + 6 * (v % 2) // 16 / 22 — both < 30 (qPc = qP)
        val tone = 40 + (v % 5) * 8
        val toneB = 240 - (v % 7) * 8
        val y = Array.tabulate(w * h) { i =>
          val bx = (i % w) / 4
          val by = (i / w) / 4
          if ((bx + by) % 2 == 0) tone else toneB
        }
        def stripes(base: Int, dir: Int): Array[Int] =
          Array.tabulate(w / 2 * (h / 2)) { i =>
            val bx = (i % (w / 2)) / 4
            val by = (i / (w / 2)) / 4
            base + 24 * ((bx + dir * by) % 3)
          }
        val cb = stripes(88, 1)
        val cr = stripes(96, 2)
        val src = H264Intra.Yuv(w, h, y, cb, cr)
        val st = H264Intra.decodeIdrStats(H264Intra.encodeIdr(src, qp))
        require(st.yuv.w == w && st.yuv.h == h,
          s"decoded dims mismatch for doc $id")
        val qstep = math.pow(2, qp / 6.0) * 0.625
        def maxErr(dec: Array[Int], ref: Array[Int]): Int =
          ref.indices.map(i => math.abs(dec(i) - ref(i))).max
        val yOk = maxErr(st.yuv.y, y) <= qstep * 0.7 + 2
        val cbOk = maxErr(st.yuv.cb, cb) <= qstep + 2
        val crOk = maxErr(st.yuv.cr, cr) <= qstep + 2
        val nMbs = (w / 16).toLong * (h / 16)
        (id, w.toLong, h.toLong, nMbs,
          st.chromaCodedMbs.toLong, st.maxChromaTc >= 1 &&
            st.maxChromaTc <= 4, yOk, cbOk, crOk)
      }
      .toDF("doc_id", "width", "height", "n_mbs",
        "n_chroma_coded_mbs", "chroma_tc_ok", "max_y_ok",
        "max_cb_ok", "max_cr_ok")
  }

  /** Graded DENSE-residual H.264 decode (q315) — the saturated end
    * of the r16 table lift: per document a doc_id-seeded NOISE luma
    * (full-range LCG per pixel) whose every 4x4 residual quantizes
    * DENSE (TotalCoeff ≥ 8 — spec-verified ≥ that over all 8
    * variants at these QPs), so the stream exercises the FULL
    * coeff_token nC<2 column (block (0,0), nC = 0), the published
    * 6-bit FLC column for EVERY other block (all neighbor sums ≥ 16
    * ⇒ nC ≥ 8 — the census n_flc_blocks = 16·n_mbs − 1 is graded
    * EXACTLY from that arithmetic), the deep total_zeros rows, the
    * suffixLength init-1 rule (TotalCoeff > 10) and the
    * saturated-block total_zeros skip (TotalCoeff = 16). Decode is
    * the encoder's bit-exact reconstruction; the q228-style error
    * gate bounds it against the source. Row-local end-to-end. */
  def h264DenseDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.H264Intra
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val v = (id % 8).toInt
        val w = 16 * (1 + v % 2)
        val h = 16 * (1 + (v / 2) % 2)
        val qp = 8 + 2 * (v % 3) // 8 / 10 / 12
        var s = 0x9E3779B9 ^ (v * 0x85EBCA6B)
        val y = Array.tabulate(w * h) { _ =>
          s = s * 1103515245 + 12345
          (s >>> 16) & 0xFF
        }
        val src = H264Intra.Yuv(w, h, y,
          Array.fill(w / 2 * (h / 2))(128),
          Array.fill(w / 2 * (h / 2))(128))
        val st = H264Intra.decodeIdrStats(
          H264Intra.encodeIdr(src, qp, vhRotation = false))
        require(st.yuv.w == w && st.yuv.h == h,
          s"decoded dims mismatch for doc $id")
        val absErr = y.indices.map(i => math.abs(st.yuv.y(i) - y(i)))
        val qstep = math.pow(2, qp / 6.0) * 0.625
        val maxOk = absErr.max <= qstep * 1.5 + 2
        val nMbs = (w / 16).toLong * (h / 16)
        (id, w.toLong, h.toLong, nMbs, st.flcBlocks.toLong,
          st.maxTc == 16, maxOk,
          st.yuv.cb.forall(_ == 128) && st.yuv.cr.forall(_ == 128))
      }
      .toDF("doc_id", "width", "height", "n_mbs", "n_flc_blocks",
        "saturated_ok", "max_y_ok", "chroma_ok")
  }

  /** Graded MID-DENSITY H.264 decode (q327) — the r17 closure of
    * the CAVLC table set: per document a tiled 4x4 edge pattern
    * (in-block vertical + horizontal step edges plus one
    * variant-positioned impulse) whose every 4x4 residual quantizes
    * to a MID TotalCoeff (4..7 at qp 24 — spec-verified over all 8
    * variants), so 9.2.1's neighbor derivation puts EVERY block
    * except (0,0) in the previously-unreachable 4 ≤ nC < 8
    * coeff_token column (neighbor TotalCoeff sums 8..14). The
    * census n_mid_blocks = 16·n_mbs − 1 is graded EXACTLY from that
    * arithmetic and n_flc_blocks is graded EXACTLY 0 (no block
    * saturates); decode is the encoder's bit-exact reconstruction
    * and the q228-style error gate bounds it against the source.
    * Row-local end-to-end. */
  def h264MidDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.H264Intra
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val v = (id % 8).toInt
        val w = 16 * (1 + v % 2)
        val h = 16 * (1 + (v / 2) % 2)
        val qp = 24
        val amp = 26 + 2 * (v % 3)
        val base = 120 + 4 * (v % 5)
        val bump = v % 4
        val y = Array.tabulate(w * h) { i =>
          val jx = (i % w) % 4
          val jy = (i / w) % 4
          base + (if (jx == 0) amp else 0) +
            (if (jy == 0) -amp else 0) +
            (if (jx == 1 + bump % 2 && jy == 1 + bump / 2) amp / 2
             else 0)
        }
        val src = H264Intra.Yuv(w, h, y,
          Array.fill(w / 2 * (h / 2))(128),
          Array.fill(w / 2 * (h / 2))(128))
        val st = H264Intra.decodeIdrStats(
          H264Intra.encodeIdr(src, qp, vhRotation = false))
        require(st.yuv.w == w && st.yuv.h == h,
          s"decoded dims mismatch for doc $id")
        val absErr = y.indices.map(i => math.abs(st.yuv.y(i) - y(i)))
        val qstep = math.pow(2, qp / 6.0) * 0.625
        val maxOk = absErr.max <= qstep * 1.5 + 2
        val nMbs = (w / 16).toLong * (h / 16)
        (id, w.toLong, h.toLong, nMbs, st.midBlocks.toLong,
          st.flcBlocks.toLong, st.maxTc >= 4 && st.maxTc <= 7, maxOk,
          st.yuv.cb.forall(_ == 128) && st.yuv.cr.forall(_ == 128))
      }
      .toDF("doc_id", "width", "height", "n_mbs", "n_mid_blocks",
        "n_flc_blocks", "mid_tc_ok", "max_y_ok", "chroma_ok")
  }

  /** Graded GIF87a decode (q332) — the LOSSLESS dictionary codec of
    * the still-image family (r17; PNG q67 is filter+deflate, JPEG
    * q68 transform coding): per document a 4-color paletted raster
    * with arithmetic pixel indices, encoded through the real GIF LZW
    * (variable-width codes, LSB-first packing, clear/EOI) into a
    * full GIF87a container, parsed and decoded back. The pixel-index
    * SUM is graded as exact arithmetic — LZW is lossless, so one
    * wrong code anywhere flips the sum or the loud length check.
    * Row-local end-to-end. */
  def gifDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.GifLzw
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val w = 8 + (id % 5).toInt * 4
        val h = 8 + ((id / 5) % 4).toInt * 4
        val palette = Array.tabulate(4)(c =>
          (((id + c) % 256).toInt << 16) |
            (((id * 3 + c * 7) % 256).toInt << 8) |
            ((id * 5 + c * 11) % 256).toInt)
        val px = Array.tabulate(w * h)(i => ((id + i * 7) % 4).toInt)
        val g = GifLzw.parseGif(GifLzw.buildGif(w, h, palette, px))
        require(g.w == w && g.h == h, s"dims mismatch for doc $id")
        (id, w.toLong, h.toLong, (w * h).toLong,
          g.indices.map(_.toLong).sum,
          g.palette.head.toLong,
          g.indices.sameElements(px) && g.palette.sameElements(palette))
      }
      .toDF("doc_id", "width", "height", "n_pixels", "idx_sum",
        "palette0", "lossless")
  }

  /** Graded FLAC decode (q333) — the lossless AUDIO codec rung
    * (r17; WAV q54 is raw PCM, ADPCM/G.711 are lossy): per document
    * a three-segment 16-bit waveform (constant head, ramp, stateless
    * pseudo-noise tail — every sample an arithmetic function of
    * (doc_id, i), so the SQL mirror recomputes the exact sum),
    * encoded through the real FLAC bit format (STREAMINFO + MD5,
    * frame sync/CRC-8/CRC-16, CONSTANT/VERBATIM/FIXED subframes,
    * Rice residuals) and decoded back. Losslessness makes sample_sum
    * EXACT arithmetic; md5_ok re-verifies the spec's own
    * decoded-audio digest. Row-local end-to-end. */
  def flacDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.Flac
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        // 2000..5000 samples: ids with id%7 >= 5 span two frames
        // (blocksize 4096), so the multi-frame path stays graded
        val n = 2000 + (id % 7).toInt * 500
        val x = Array.tabulate(n) { i =>
          if (i < 700) (id % 2000).toInt - 1000
          else if (i < 1400) (i - 700) * 3 - 1050 + (id % 11).toInt
          else ((id * 31 + i.toLong * 2654435761L) % 65536).toInt -
            32768
        }
        val dec = Flac.decode(Flac.encode(x))
        require(dec.samples.length == n, s"length mismatch doc $id")
        var sampleSum = 0L
        var si = 0
        while (si < dec.samples.length) {
          sampleSum += dec.samples(si); si += 1
        }
        (id, n.toLong, dec.nFrames.toLong, sampleSum,
          dec.sampleRate.toLong, dec.md5Ok,
          dec.samples.sameElements(x))
      }
      .toDF("doc_id", "n_samples", "n_frames", "sample_sum",
        "sample_rate", "md5_ok", "lossless")
  }

  /** Graded ZIP walk (q335, r17) — the archive format training
    * corpora actually arrive in: per document a ZIP of
    * 1 + doc_id % 4 entries (entry k carries the document text's
    * slice [37k, 37k + 100 + 13k), alternating stored/deflate),
    * walked back via the CENTRAL DIRECTORY with local-header
    * cross-checks and per-entry CRC-32 verification. The
    * concatenated-content digest must equal md5 of the same slices
    * recomputed by the oracle directly from `text` — a wrong offset,
    * a bad inflate, or a skipped entry flips it. Row-local. */
  def zipWalkStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.Archives
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val n = 1 + (id % 4).toInt
        val slices = (0 until n).map { k =>
          val start = math.min(k * 37, text.length)
          text.substring(start,
            math.min(start + 100 + 13 * k, text.length))
        }
        val es = slices.zipWithIndex.map { case (s, k) =>
          s"doc$id/part$k.txt" -> s.getBytes("US-ASCII")
        }
        val got = Archives.walkZip(Archives.buildZip(es))
        require(got.size == n, s"entry census for doc $id")
        val namesOk = got.map(_.name) == es.map(_._1)
        val content = got.map(g =>
          new String(g.data, "US-ASCII")).mkString
        (id, n.toLong,
          got.map(_.data.length.toLong).sum,
          got.count(_.method == 0).toLong,
          got.count(_.method == 8).toLong,
          content, namesOk)
      }
      .toDF("doc_id", "n_entries", "total_bytes", "n_stored",
        "n_deflated", "c", "names_ok")
      .select(col("doc_id"), col("n_entries"), col("total_bytes"),
        col("n_stored"), col("n_deflated"),
        md5(col("c")).as("content_md5"), col("names_ok"))
  }

  /** Graded TAR walk (q336, r17) — the q335 fixture shipped as a
    * POSIX ustar archive instead: header checksums validated, names
    * and sizes recovered, and the ARCHIVE SIZE graded as exact
    * arithmetic (512-byte header + padded content per entry + the
    * two-zero-block terminator — a padding bug flips the size, a
    * checksum bug kills the walk). Row-local. */
  def tarWalkStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.Archives
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val n = 1 + (id % 4).toInt
        val slices = (0 until n).map { k =>
          val start = math.min(k * 37, text.length)
          text.substring(start,
            math.min(start + 100 + 13 * k, text.length))
        }
        val es = slices.zipWithIndex.map { case (s, k) =>
          s"doc$id/part$k.txt" -> s.getBytes("US-ASCII")
        }
        val tar = Archives.buildTar(es)
        val got = Archives.walkTar(tar)
        require(got.size == n, s"entry census for doc $id")
        (id, n.toLong, got.map(_.data.length.toLong).sum,
          tar.length.toLong,
          got.map(g => new String(g.data, "US-ASCII")).mkString,
          got.map(_.name) == es.map(_._1))
      }
      .toDF("doc_id", "n_entries", "total_bytes", "archive_bytes",
        "c", "names_ok")
      .select(col("doc_id"), col("n_entries"), col("total_bytes"),
        col("archive_bytes"), md5(col("c")).as("content_md5"),
        col("names_ok"))
  }

  /** Graded TFRecord walk (q340, r17) — the TRAINER-side container:
    * per document a TFRecord file of 1 + doc_id % 3 tf.train.Example
    * records (record r: "text" → the q335 slice r as a BytesList,
    * "doc_id" → Int64List [id], "tokens" → PACKED Int64List
    * [word count, char count]), framed with the published masked
    * CRC-32C pair per record, walked and protobuf-decoded back.
    * Both CRCs verify per record; the digest of the concatenated
    * decoded text features must equal md5 of the oracle's own
    * slices, and token_sum is exact split arithmetic. Row-local. */
  def tfrecordWalkStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.TfRecord
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val n = 1 + (id % 3).toInt
        val slices = (0 until n).map { k =>
          val start = math.min(k * 37, text.length)
          text.substring(start,
            math.min(start + 100 + 13 * k, text.length))
        }
        val recs = slices.map { s =>
          TfRecord.encodeExample(Seq(
            "text" -> TfRecord.BytesFeature(s.getBytes("UTF-8")),
            "doc_id" -> TfRecord.Int64Feature(Seq(id)),
            "tokens" -> TfRecord.Int64Feature(Seq(
              s.split(" ", -1).length.toLong, s.length.toLong))))
        }
        val decoded = TfRecord.readFile(TfRecord.writeFile(recs))
          .map(TfRecord.decodeExample)
        require(decoded.size == n, s"record census for doc $id")
        val texts = decoded.map(_.collectFirst {
          case ("text", TfRecord.BytesFeature(b)) =>
            new String(b, "UTF-8")
        }.get)
        val idsOk = decoded.forall(_.collectFirst {
          case ("doc_id", TfRecord.Int64Feature(vs)) => vs
        }.get == Seq(id))
        val tokenSum = decoded.map(_.collectFirst {
          case ("tokens", TfRecord.Int64Feature(vs)) => vs.sum
        }.get).sum
        (id, n.toLong, texts.mkString, idsOk, tokenSum)
      }
      .toDF("doc_id", "n_records", "c", "ids_ok", "token_sum")
      .select(col("doc_id"), col("n_records"),
        md5(col("c")).as("content_md5"), col("ids_ok"),
        col("token_sum"))
  }

  /** Graded avc1-BOXED intra H.264 decode (q229) — the composition
    * q228's scaladoc scoped out, now closed: the per-frame IDR
    * slices ride a REAL ISO-BMFF 'avc1' track (SPS/PPS in the avcC
    * AVCDecoderConfigurationRecord inside the sample entry, samples
    * LENGTH-prefixed per ISO/IEC 14496-15, frames split across two
    * chunks like q81), are extracted back through the real
    * stsd/stsz/stsc/stco tables, reassembled to Annex-B from the
    * avcC record + each sample, and decoded by the constrained
    * intra decoder. Every frame of every document is graded with
    * the q228 bounds — a wrong sample boundary, a mis-walked avcC,
    * or a bad length prefix flips a boolean. Row-local end-to-end. */
  def avc1DecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.io.H264Intra
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val n = (1 + id % 3).toInt
        val w = 16 * (1 + id % 2).toInt
        val h = 16 * (1 + (id / 2) % 2).toInt
        val qp = 18 + (id % 4).toInt * 4 // 18 / 22 / 26 / 30
        def frame(f: Int): H264Intra.Yuv = {
          val tone = (36 + ((id + f) % 6) * 8).toInt
          val toneB = (236 - ((id + 2 * f) % 5) * 8).toInt
          val y = Array.tabulate(w * h) { i =>
            val bx = (i % w) / 4
            val by = (i / w) / 4
            if ((bx + by) % 2 == 0) tone else toneB
          }
          H264Intra.Yuv(w, h, y,
            Array.fill(w / 2 * (h / 2))(128),
            Array.fill(w / 2 * (h / 2))(128))
        }
        val srcs = Vector.tabulate(n)(frame)
        val rbsps = srcs.map(s => H264Intra.encodeIdrRbsps(s, qp))
        // one parameter-set pair serves the whole track (identical
        // dims/QP per document, like a real encoder's session)
        val (sps, pps, _) = rbsps.head
        val payload = encodeMp4VideoTrack("avc1", w, h,
          rbsps.map { case (_, _, idr) => H264Intra.avcSample(idr) },
          configBox = mp4Box("avcC",
            H264Intra.avcConfigRecord(sps, pps)))
        val track = extractMp4Frames(payload)
          .getOrElse(sys.error(s"unextractable avc1 track for doc $id"))
        require(track.format == "avc1" && track.frames.size == n,
          s"track shape mismatch for doc $id")
        val decs = track.frames.map(sample => H264Intra.decodeIdr(
          H264Intra.annexBFromAvcc(track.config, sample)))
        require(decs.forall(d => d.w == w && d.h == h),
          s"decoded dims mismatch for doc $id")
        val qstep = math.pow(2, qp / 6.0) * 0.625
        val maxOk = decs.zip(srcs).forall { case (d, s) =>
          s.y.indices.map(i => math.abs(d.y(i) - s.y(i))).max <=
            qstep * 0.7 + 2
        }
        val chromaOk = decs.forall(d =>
          d.cb.forall(_ == 128) && d.cr.forall(_ == 128))
        (id, n.toLong, w.toLong, h.toLong, maxOk, chromaOk)
      }
      .toDF("doc_id", "n_frames", "width", "height", "max_y_ok",
        "chroma_ok")
  }

  /** Graded WAV decode (q54): synthesize a real RIFF/PCM file per
    * document, then DECODE it back with the chunk-walking parser and
    * report sample-exact amplitude aggregates. Row-local end-to-end
    * (encode + decode never leave the partition). */
  def wavDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val info = decodeWav(encodeWavPcm16(WavRate, wavSamplesOf(id)))
          .getOrElse(sys.error(s"undecodable WAV for doc $id"))
        (id, info.sampleRate, info.nSamples,
          info.nSamples.toLong * 1000000L / WavRate,
          info.peakAbs, info.sumAbs)
      }
      .toDF("doc_id", "sample_rate", "n_samples", "duration_us",
        "peak_abs", "sum_abs")
  }

  /** Frame length of [[audioFrameFeatures]] (samples/frame, hop =
    * frame — non-overlapping). */
  val AudioFrameLen = 16

  /** Per-frame audio features (q213) — the feature-extraction stage
    * between raw decode (q54 proves the RIFF codec inverts) and any
    * audio model: the decoded PCM is framed (non-overlapping
    * [[AudioFrameLen]]-sample windows, short tail kept) and each
    * frame reports exact-LONG energy (Σ s²), the zero-crossing count
    * (s_{i−1}·s_i < 0 WITHIN the frame — the voicing/noisiness
    * heuristic), and RMS (one fixed-order √(sumsq/n) double). The
    * Spark side decodes the REAL WAV bytes end to end (synthesize →
    * encode → [[decodeWavSamples]] → frame), so the graded numbers
    * cover the codec path; the oracle recomputes the same features
    * from the synthesis arithmetic directly (the q54 discipline).
    *
    * Scale design (100 TB): strictly row-local — decode and framing
    * happen inside one typed map per audio blob, emitting
    * n/frameLen skinny feature rows; no shuffle at any scale, and
    * the feature table is the 8-byte-per-frame artifact downstream
    * sampling/filtering operates on instead of the waveform. */
  def audioFrameFeatures(docs: DataFrame,
      frameLen: Int = AudioFrameLen): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .flatMap { id =>
        val samples = decodeWavSamples(
          encodeWavPcm16(WavRate, wavSamplesOf(id)))
          .getOrElse(sys.error(s"undecodable WAV for doc $id"))
        samples.grouped(frameLen).zipWithIndex.map { case (fr, fi) =>
          var sumsq = 0L; var zc = 0L; var i = 0
          while (i < fr.length) {
            val s = fr(i).toInt
            sumsq += s.toLong * s
            if (i > 0 && fr(i - 1).toInt * s < 0) zc += 1
            i += 1
          }
          (id, fi.toLong, fr.length.toLong, sumsq, zc,
            math.sqrt(sumsq.toDouble / fr.length))
        }
      }
      .toDF("doc_id", "frame", "n", "sumsq", "zc", "rms")
  }

  // ---------------------------------------------------------------
  // EXIF/TIFF metadata (q258): the APP1 segment real cameras write —
  // marker walk, both TIFF byte orders, IFD entry decode with
  // inline (left-justified) and offset-indirected values
  // ---------------------------------------------------------------

  /** Parsed EXIF facts of [[parseExif]]. */
  case class ExifInfo(endian: String, nEntries: Int, make: String,
      model: String, orientation: Int, width: Long, dateTime: String)

  /** Build one TIFF/EXIF-in-JPEG byte stream: SOI, a skippable APP0
    * (JFIF), APP1 = "Exif\0\0" + a TIFF block in the given byte
    * order carrying IFD0 with ImageWidth (LONG, inline), Make/Model/
    * DateTime (ASCII, offset-indirected) and Orientation (SHORT,
    * inline left-justified), then EOI. Tags ascend as TIFF 6
    * requires. */
  def encodeExifJpeg(littleEndian: Boolean, make: String,
      model: String, orientation: Int, width: Long,
      dateTime: String): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u16be(v: Int): Unit = { out += (v >> 8).toByte; out += v.toByte }
    // SOI + a skippable APP0/JFIF segment (the marker walk must hop)
    out += 0xFF.toByte; out += 0xD8.toByte
    out += 0xFF.toByte; out += 0xE0.toByte
    u16be(16)
    out ++= "JFIF\u0000".getBytes("US-ASCII")
    out ++= Array[Byte](1, 2, 0, 0, 1, 0, 1, 0, 0)
    // TIFF block
    val tiff = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u16(v: Int): Unit =
      if (littleEndian) { tiff += v.toByte; tiff += (v >> 8).toByte }
      else { tiff += (v >> 8).toByte; tiff += v.toByte }
    def u32(v: Long): Unit =
      if (littleEndian) {
        tiff += v.toByte; tiff += (v >> 8).toByte
        tiff += (v >> 16).toByte; tiff += (v >> 24).toByte
      } else {
        tiff += (v >> 24).toByte; tiff += (v >> 16).toByte
        tiff += (v >> 8).toByte; tiff += v.toByte
      }
    tiff ++= (if (littleEndian) "II" else "MM").getBytes("US-ASCII")
    u16(42)
    u32(8L) // IFD0 directly after the header
    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val modelB = (model + "\u0000").getBytes("US-ASCII")
    val dtB = (dateTime + "\u0000").getBytes("US-ASCII")
    val nEntries = 5
    val valueArea = 8 + 2 + nEntries * 12 + 4
    val makeOff = valueArea
    val modelOff = makeOff + makeB.length
    val dtOff = modelOff + modelB.length
    u16(nEntries)
    def entry(tag: Int, tpe: Int, count: Long)(value: => Unit): Unit = {
      u16(tag); u16(tpe); u32(count)
      val before = tiff.length
      value
      require(tiff.length - before == 4, "entry value field must be 4B")
    }
    entry(0x0100, 4, 1L)(u32(width)) // ImageWidth, LONG inline
    entry(0x010F, 2, makeB.length.toLong)(u32(makeOff.toLong))
    entry(0x0110, 2, modelB.length.toLong)(u32(modelOff.toLong))
    // SHORT inline: left-justified in the 4-byte field (TIFF 6)
    entry(0x0112, 3, 1L) { u16(orientation); u16(0) }
    entry(0x0132, 2, dtB.length.toLong)(u32(dtOff.toLong))
    u32(0L) // next-IFD offset: none
    tiff ++= makeB; tiff ++= modelB; tiff ++= dtB
    // APP1 wrapper
    out += 0xFF.toByte; out += 0xE1.toByte
    u16be(2 + 6 + tiff.length)
    out ++= "Exif\u0000\u0000".getBytes("US-ASCII")
    out ++= tiff
    out += 0xFF.toByte; out += 0xD9.toByte
    out.toArray
  }

  /** Parse the EXIF facts back out of a JPEG byte stream: walk the
    * markers from SOI, find the Exif APP1, read the TIFF header in
    * either byte order, and decode the IFD0 entries ([[ExifInfo]]'s
    * fields; unknown tags are skipped, the TIFF rule). Returns None
    * when no Exif APP1 exists. */
  def parseExif(bytes: Array[Byte]): Option[ExifInfo] =
    // one malformed TIFF must yield a None VERDICT, not a task
    // kill (the r15 flagged-row discipline, matching
    // Charset.decode): the structural requires below stay as the
    // precise diagnosis, and this boundary converts them to None
    try parseExifStrict(bytes)
    catch { case _: IllegalArgumentException | _: RuntimeException =>
      None
    }

  private def parseExifStrict(bytes: Array[Byte]): Option[ExifInfo] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    if (bytes.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
    // marker walk
    var p = 2
    var tiffStart = -1
    while (tiffStart < 0 && p + 4 <= bytes.length && u8(p) == 0xFF) {
      val marker = u8(p + 1)
      if (marker == 0xD9) return None // EOI before any Exif APP1
      val len = (u8(p + 2) << 8) | u8(p + 3)
      if (marker == 0xE1 && p + 2 + len <= bytes.length &&
          len >= 8 &&
          new String(bytes, p + 4, 6, "US-ASCII") == "Exif\u0000\u0000")
        tiffStart = p + 10
      else p += 2 + len
    }
    if (tiffStart < 0) return None
    val order = new String(bytes, tiffStart, 2, "US-ASCII")
    val little = order match {
      case "II" => true
      case "MM" => false
      case o => sys.error(s"bad TIFF byte order '$o'")
    }
    def u16(i: Int): Int =
      if (little) u8(i) | (u8(i + 1) << 8)
      else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (little)
        u8(i) | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
          (u8(i + 3).toLong << 24)
      else
        (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
          (u8(i + 2).toLong << 8) | u8(i + 3)
    require(u16(tiffStart + 2) == 42, "bad TIFF magic")
    val ifd = tiffStart + u32(tiffStart + 4).toInt
    val n = u16(ifd)
    var make = ""; var model = ""; var dt = ""
    var orientation = 0; var width = 0L
    var e = 0
    while (e < n) {
      val base = ifd + 2 + e * 12
      val tag = u16(base)
      val tpe = u16(base + 2)
      val count = u32(base + 4)
      def ascii: String = {
        require(tpe == 2, s"tag $tag: expected ASCII, got type $tpe")
        val off = tiffStart + u32(base + 8).toInt
        new String(bytes, off, count.toInt - 1, "US-ASCII")
      }
      tag match {
        case 0x0100 =>
          require(tpe == 4, s"ImageWidth type $tpe"); width = u32(base + 8)
        case 0x010F => make = ascii
        case 0x0110 => model = ascii
        case 0x0112 =>
          require(tpe == 3, s"Orientation type $tpe")
          orientation = u16(base + 8) // left-justified inline SHORT
        case 0x0132 => dt = ascii
        case _ => () // unknown tags skip (the TIFF rule)
      }
      e += 1
    }
    Some(ExifInfo(order, n, make, model, orientation, width, dt))
  }

  /** Deterministic EXIF field values per document — shared by the
    * encode side of [[exifStats]] and the oracle's arithmetic. */
  def exifFieldsOf(id: Long): (Boolean, String, String, Int, Long,
      String) =
    (id % 2 == 0, s"Cam${id % 5}", s"Model-${id % 13}",
      (1 + id % 8).toInt, 640L + id % 1024,
      f"2024:04:${id % 28 + 1}%02d ${id % 24}%02d:00:00")

  /** Graded EXIF parse (q258): synthesize a real Exif-in-JPEG blob
    * per document (byte order alternating per doc — both TIFF
    * endians graded on every run, inline AND offset-indirected
    * values in every file), parse it back through [[parseExif]],
    * and report the fields. A green row proves the marker walk, the
    * endian-aware IFD decode, and both value paths inverted the
    * writer. Row-local end-to-end (the q54/q67 economics). */
  def exifStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val (le, make, model, orient, width, dt) = exifFieldsOf(id)
        val info = parseExif(
          encodeExifJpeg(le, make, model, orient, width, dt))
          .getOrElse(sys.error(s"unparseable EXIF for doc $id"))
        (id, info.endian, info.nEntries.toLong, info.make,
          info.model, info.orientation.toLong, info.width,
          info.dateTime)
      }
      .toDF("doc_id", "endian", "n_entries", "make", "model",
        "orientation", "width", "datetime")
  }

  /** Per-pixel cut threshold of [[shotBoundaries]]: a cut's
    * brightness step is 50/pixel, within-shot drift 1/pixel — the
    * threshold sits between them, so the integer compare is exact
    * on every frame. */
  val ShotCutPerPixel = 25L

  /** Shot-boundary detection (q280) — the video preprocessing stage
    * between frame extraction (q81) and any frame-sampling policy:
    * training pipelines sample per SHOT, not per fixed stride, so
    * cuts must be found first. The detector is the classic
    * inter-frame difference test: decode the (lossless raw-RGB)
    * track, fold each frame to its exact integer byte sum, and cut
    * where |Δsum| exceeds [[ShotCutPerPixel]]·pixels — all LONG
    * arithmetic, so the verdict is exact (the q228 rather than the
    * q68 grading class). The fixture plants a brightness step of
    * 50/pixel every 5 frames (offset per doc) over within-shot
    * drift of 1/pixel, values bounded < 256 so no wrap exists.
    * Per frame: (doc_id, frame, frame_sum, is_cut, shot_id).
    *
    * Scale design (100 TB): decode, sums, cuts, and shot ids all
    * happen inside ONE typed map per video blob — a video never
    * crosses an exchange and no window exists at any scale. */
  def shotBoundaries(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .flatMap { id =>
        val r = (id % 5).toInt
        val w = (4 + id % 4).toInt
        val h = (4 + id % 3).toInt
        val n = (8 + id % 5).toInt
        val npx = w * h * 3
        val frames = Vector.tabulate(n)(f =>
          Array.tabulate(npx)(p =>
            (((f + r) / 5) * 50 + f + (p % 7)).toByte))
        val track = extractMp4Frames(encodeMp4RawVideo(w, h, frames))
          .getOrElse(sys.error(s"unextractable track for doc $id"))
        require(track.frames.size == n, s"frame count for doc $id")
        val sums = track.frames
          .map(_.map(b => (b & 0xff).toLong).sum)
        var shot = 0L
        sums.zipWithIndex.map { case (s, f) =>
          val cut = f > 0 &&
            math.abs(s - sums(f - 1)) > ShotCutPerPixel * npx
          if (cut) shot += 1
          (id, f.toLong, s, cut, shot)
        }
      }
      .toDF("doc_id", "frame", "frame_sum", "is_cut", "shot_id")
  }

  /** Per-shot frame sampling (q281) — the policy q280 exists for:
    * one representative frame per shot (the temporal-diversity rule
    * multimodal pipelines use instead of fixed-stride sampling,
    * which over-samples long static shots and misses short ones).
    * The representative is the shot's MIDDLE frame
    * ((first + last) DIV 2 — deterministic, stated). Per shot:
    * (doc_id, shot_id, first/last frame, n_frames, sampled_frame,
    * sampled_sum).
    *
    * Scale design (100 TB): one (doc, shot)-keyed map-side-combined
    * rollup over q280's frame rows plus a self-equi-join to fetch
    * the sampled frame's stats — both keyed by doc, video-local. */
  def shotSampledFrames(docs: DataFrame): DataFrame = {
    val frames = shotBoundaries(docs)
    val shots = frames
      .groupBy(col("doc_id"), col("shot_id"))
      .agg(min(col("frame")).as("first_frame"),
        max(col("frame")).as("last_frame"),
        count(lit(1)).as("n_frames"))
      .withColumn("sampled_frame",
        ((col("first_frame") + col("last_frame")) / 2).cast("long"))
    shots.join(frames
        .select(col("doc_id"), col("frame").as("sampled_frame"),
          col("frame_sum").as("sampled_sum")),
      Seq("doc_id", "sampled_frame"))
      .select(col("doc_id"), col("shot_id"), col("first_frame"),
        col("last_frame"), col("n_frames"), col("sampled_frame"),
        col("sampled_sum"))
  }

  /** Token cost charged per interleaved image (q282). */
  val ImageTokenCost = 32L

  /** Multimodal sequence interleaving (q282) — the layout pass that
    * turns a document's text and its video's sampled frames into ONE
    * training sequence (the interleaved image-text format the
    * Flamingo/MMC4-style corpora feed): sentences (q274) on a
    * 500 ms narration clock and per-shot sampled frames (q281) on
    * the 700 ms frame clock merge in time order (ties by modality
    * then ref — deterministic, stated), each item carrying its
    * token cost (words for text, [[ImageTokenCost]] per image) and
    * the running total a packer budgets against.
    *
    * Scale design (100 TB): both sides are the existing row-local
    * kernels; the merge is a per-DOC window bounded by
    * items-per-document (sentences + shots — document-sized, never
    * corpus-sized), and the running sum rides the same frame. */
  def interleaveMultimodal(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sents = TextAnalysis.sentenceSegments(docs)
      .select(col("doc_id"),
        (col("sent_idx") * 500L).as("t_ms"),
        lit("text").as("modality"), col("sentence").as("ref"),
        col("n_words").as("n_tokens"))
    val frames = shotSampledFrames(docs)
      .select(col("doc_id"),
        (col("sampled_frame") * 700L).as("t_ms"),
        lit("image").as("modality"),
        concat(lit("frame:"), col("sampled_frame").cast("string"))
          .as("ref"),
        lit(ImageTokenCost).as("n_tokens"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("t_ms"), col("modality"), col("ref"))
    val run = w.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    sents.unionByName(frames)
      .withColumn("seq_idx", (row_number().over(w) - 1).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(run))
      .select(col("doc_id"), col("seq_idx"), col("t_ms"),
        col("modality"), col("ref"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** Per-sample energy threshold of [[vadSegments]] — the mean
    * square of a uniform ±1024 signal (2048²/12), so roughly half
    * of all frames sit on each side and both VAD branches do real
    * work on every run. */
  val VadEnergyPerSample = 349525L

  /** Hangover of [[vadSegments]]: a frame within this many frames
    * after raw speech stays speech (the classic VAD smoothing that
    * bridges short intra-utterance dips). */
  val VadHangoverFrames = 2

  /** Energy-based voice-activity segmentation (q257) — the stage
    * between q213's frame features and any speech-model consumer:
    * raw speech = exact-integer energy test (Σs² > n·threshold —
    * never a float compare), smoothed by a [[VadHangoverFrames]]
    * hangover (windowed max over the trailing frames), and runs of
    * speech frames collapsed to segments by the gaps-and-islands
    * identity (frame − rank is constant within a run). Per segment:
    * start/end frame, frame count, nominal start/end ms (the exact
    * 2 ms/frame clock: [[AudioFrameLen]]·1000/[[WavRate]]), and the
    * exact summed energy.
    *
    * Scale design (100 TB): every window is partitioned by doc_id
    * and bounded by frames-per-blob (audio-duration-bounded — never
    * corpus-sized); the collapse is one map-side-combined rollup on
    * (doc, island). No single-partition exchange anywhere. */
  def vadSegments(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frameMs = AudioFrameLen * 1000L / WavRate
    val hangW = Window.partitionBy(col("doc_id")).orderBy(col("frame"))
      .rowsBetween(-VadHangoverFrames, 0)
    val rankW = Window.partitionBy(col("doc_id")).orderBy(col("frame"))
    val segW = Window.partitionBy(col("doc_id"))
      .orderBy(col("start_frame"))
    audioFrameFeatures(docs)
      .withColumn("raw",
        (col("sumsq") > col("n") * VadEnergyPerSample).cast("int"))
      .withColumn("speech", max(col("raw")).over(hangW) === 1)
      .filter(col("speech"))
      .withColumn("island",
        col("frame") - row_number().over(rankW))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("frame")).as("start_frame"),
        max(col("frame")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("sumsq")).as("energy"))
      .withColumn("seg_idx",
        (row_number().over(segW) - 1).cast("long"))
      .select(col("doc_id"), col("seg_idx"), col("start_frame"),
        col("end_frame"), col("n_frames"),
        (col("start_frame") * frameMs).as("start_ms"),
        ((col("end_frame") + 1) * frameMs).as("end_ms"),
        col("energy"))
  }

  /** Graded PPM decode + resize (q55): synthesize a real P6 file,
    * decode it, nearest-neighbor downscale ×2, re-ENCODE, re-DECODE,
    * and report per-channel sums of both rasters. The resized raster
    * goes through encode→decode again so the graded numbers cover the
    * full codec round-trip. */
  def ppmDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val img = decodePpm(encodePpm(ppmOf(id)))
          .getOrElse(sys.error(s"undecodable PPM for doc $id"))
        val resized = decodePpm(encodePpm(resizePpmNearest(img, 2)))
          .getOrElse(sys.error(s"undecodable resized PPM for doc $id"))
        def channelSum(p: PpmImage, c: Int): Long = {
          var i = c; var s = 0L
          while (i < p.pixels.length) { s += p.pixels(i) & 0xff; i += 3 }
          s
        }
        (id, img.width, img.height,
          channelSum(img, 0), channelSum(img, 1), channelSum(img, 2),
          resized.width, resized.height, channelSum(resized, 0))
      }
      .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "r_width", "r_height", "r_sum_r")
  }

  // ---------------------------------------------------------------
  // Image near-duplicate detection (q126) — the perceptual-hash dedup
  // member of the multimodal family. The decode rungs (q55/q67/q68)
  // prove the codecs invert the containers; this operator is what a
  // LAION-style image-curation pipeline DOES with the decoded pixels:
  // a 64-bit difference hash (dHash) per image, then Hamming-banded
  // near-dup pairs — the image twin of SimHash text dedup (q8).
  // ---------------------------------------------------------------

  /** Variants per image group in the q126 corpus: doc ids 4g..4g+3
    * share one base raster, differing only in a per-variant tweak of
    * pixel (0, 0) — so each group's images are perceptual near-dups
    * (pairwise dHash Hamming ≤ 1, see [[imageDHash64]]) while
    * cross-group hashes are ~uniform 64-bit (the pixel arithmetic is
    * a nonlinear per-pixel mix, deliberately NOT a gradient: linear
    * rasters collapse dHash blocks onto a few popular values and the
    * banding would degenerate into giant buckets). */
  val ImageVariants = 4

  /** dHash grid: 9×8 grayscale samples → 8 comparisons per row ×
    * 8 rows = 64 bits (the published dHash layout). */
  val DHashCols = 9
  val DHashRows = 8

  /** 16-bit blocks the 64-bit code splits into for LSH banding. With
    * [[ImageHammingMax]] = 3 < 4 blocks, pigeonhole guarantees every
    * qualifying pair shares at least one intact block — the banding
    * is LOSSLESS at the graded threshold, so banded+verified output
    * is set-identical to all-pairs (the property the oracle leans
    * on and ImageNearDup brute-force spec pins). */
  val ImageBlocks = 4

  /** Max Hamming distance for a near-dup verdict. */
  val ImageHammingMax = 3

  /** Deterministic variant raster for the q126 corpus: group
    * g = id / [[ImageVariants]] fixes dims (w = 12 + g%5,
    * h = 9 + g%4) and the base pixels; variant v = id %
    * [[ImageVariants]] adds v to every channel of pixel (0, 0)
    * before the mod. Channel c of pixel (x, y) is
    * ((g·73856093) ⊕ (x·19349663) ⊕ (y·83492791) ⊕ (c·15485863)
    *  + tweak) % 256 — the xor mix decorrelates neighboring pixels
    * so dHash bits are ~Bernoulli(1/2). The DuckDB oracle replays
    * this arithmetic exactly (q55 pattern). */
  def ppmVariantOf(id: Long): PpmImage = {
    val g = id / ImageVariants
    val v = id % ImageVariants
    val w = (12 + g % 5).toInt
    val h = (9 + g % 4).toInt
    val px = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          val tweak = if (x == 0 && y == 0) v else 0L
          val mixed = (g * 73856093L) ^ (x * 19349663L) ^
            (y * 83492791L) ^ (c * 15485863L)
          px(3 * (y * w + x) + c) = ((mixed + tweak) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PpmImage(w, h, px)
  }

  /** 64-bit difference hash of a decoded raster: sample a
    * [[DHashCols]]×[[DHashRows]] grayscale grid by nearest neighbor
    * (source pixel (gx·w/9, gy·h/8) — works for any dims), gray =
    * (r+g+b)/3 integer, and set bit (gy·8 + gx) iff
    * grid(gx+1, gy) > grid(gx, gy). Integer arithmetic end to end —
    * bit-identical in both engines, no FP mirror risk. */
  def imageDHash64(img: PpmImage): Long = {
    val grid = Array.ofDim[Int](DHashRows, DHashCols)
    var gy = 0
    while (gy < DHashRows) {
      var gx = 0
      while (gx < DHashCols) {
        val sx = gx * img.width / DHashCols
        val sy = gy * img.height / DHashRows
        val o = 3 * (sy * img.width + sx)
        grid(gy)(gx) = ((img.pixels(o) & 0xff) + (img.pixels(o + 1) & 0xff) +
          (img.pixels(o + 2) & 0xff)) / 3
        gx += 1
      }
      gy += 1
    }
    var code = 0L
    var i = 0
    while (i < 64) {
      val y = i / 8
      val x = i % 8
      if (grid(y)(x + 1) > grid(y)(x)) code |= 1L << i
      i += 1
    }
    code
  }

  /** (doc_id, dhash) for the q126 corpus: synthesize the variant
    * PPM, decode it back through the REAL parser, and dHash the
    * decoded pixels — so a green q126 row additionally re-proves the
    * codec round trip on every image. Row-local; the payload bytes
    * never leave the task. */
  def imageDHashes(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val img = decodePpm(encodePpm(ppmVariantOf(id)))
          .getOrElse(sys.error(s"undecodable PPM for doc $id"))
        (id, imageDHash64(img))
      }
      .toDF("doc_id", "dhash")
  }

  def imageNearDups(docs: DataFrame): DataFrame =
    imageNearDupsWithHandle(docs)._1

  /** Image near-duplicate pairs (q126): (doc_a < doc_b, hamming) for
    * every pair of corpus images whose dHashes differ in ≤
    * [[ImageHammingMax]] bits. Candidates come from the Google-style
    * block banding — the code splits into [[ImageBlocks]] 16-bit
    * blocks, candidates share a (block index, block value) bucket —
    * then the exact Hamming verify (builtin codegen'd
    * `bit_count(a ^ b)`) keeps qualifying pairs. Lossless at the
    * threshold (pigeonhole over 4 blocks vs ≤ 3 differing bits), so
    * the output equals the all-pairs answer without ever being
    * all-pairs.
    *
    * Scale design: the corpus collapses to 16 bytes per image before
    * anything shuffles (one hash pass over the decoded pixels, the
    * q8 SimHash economics); banded rows carry (doc_id, band, key)
    * only; candidate ids distinct before the two verify joins move
    * the 8-byte codes. Bucket sizes stay bounded because dHash
    * blocks of non-duplicate images are ~uniform over 2^16. */
  def imageNearDupsWithHandle(
      docs: DataFrame): (DataFrame, graft.util.CacheHandle) = {
    val codes = imageDHashes(docs).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = codes.select(col("doc_id"),
      posexplode(array((0 until ImageBlocks).map { j =>
        shiftrightunsigned(col("dhash"), 16 * j).bitwiseAND(lit(0xffffL))
      }: _*)).as(Seq("band", "key")))
    val a = bands.alias("a")
    val b = bands.alias("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val verified = cand
      .join(codes.select(col("doc_id").as("doc_a"), col("dhash").as("ha")),
        "doc_a")
      .join(codes.select(col("doc_id").as("doc_b"), col("dhash").as("hb")),
        "doc_b")
      .withColumn("hamming", bit_count(expr("ha ^ hb")).cast("long"))
      .filter(col("hamming") <= ImageHammingMax)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
    (verified, graft.util.CacheHandle(codes))
  }

  /** The graded multimodal query (q21): per media record, the sniffed
    * mime, payload byte length, and the frame-sampling summary
    * (count + bytes of every [[MetaFrameStride]]-th
    * [[MetaFrameBytes]]-byte chunk) — exactly the codec-free slice of
    * the pipeline, exercised through the real typed operators
    * ([[mediaFromDocs]] → [[sampleFrames]] + [[metadata]]). */
  def multimodalMeta(docs: DataFrame): DataFrame = {
    val media = mediaFromDocs(docs)
    val frames = sampleFrames(media, MetaFrameBytes, MetaFrameStride)
    val agg = frames.groupBy(col("media_id"), col("mime"))
      .agg(
        count(lit(1)).as("n_frames_sampled"),
        sum(col("frame_bytes")).cast("long").as("sampled_bytes"))
    metadata(media.toDF()).join(agg, "media_id")
  }
}
