package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  import Multimodal._

  private def png(n: Int): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G') ++
      Array.tabulate[Byte](n)(i => (i % 251).toByte)
  private def jpeg(n: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      Array.tabulate[Byte](n)(i => (i % 17).toByte)
  private def wav(n: Int): Array[Byte] =
    "RIFF".getBytes ++ Array.fill[Byte](n)(42)

  private lazy val media = Seq(
    MediaRecord(1L, "image", png(1000)),
    MediaRecord(2L, "image", jpeg(500)),
    MediaRecord(3L, "audio", wav(2000)),
    MediaRecord(4L, "video", Array.fill[Byte](4096)(7))
  ).toDS().repartition(2)

  test("q126: dHash bits follow the 9x8 grid comparisons") {
    // constant raster: no comparison fires, code 0
    val flat = PpmImage(12, 9, Array.fill[Byte](3 * 12 * 9)(50))
    assert(imageDHash64(flat) == 0L)
    // grayscale strictly increasing in x: every comparison fires
    val w = 18; val h = 8
    val px = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px(3 * (y * w + x) + c) = (10 * x).toByte // gray 0..170, monotone
    assert(imageDHash64(PpmImage(w, h, px)) == -1L) // all 64 bits
  }

  test("q126: variant groups are near-dups; banding equals all-pairs") {
    val docs = spark.range(0, 120).toDF("doc_id")
    val pairs = imageNearDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // every intra-group pair qualifies (pairwise dHash Hamming ≤ 1:
    // the variant tweak only reaches grid point (0,0), which only
    // bit 0's comparison reads)
    val intra = (for {
      g <- 0L until 30L; a <- 0 to 3; b <- 0 to 3 if a < b
    } yield (4 * g + a, 4 * g + b)).toSet
    assert(intra.forall(p => pairs.exists(q => (q._1, q._2) == p)))
    assert(pairs.forall(_._3 <= ImageHammingMax))
    // banded+verified output is SET-IDENTICAL to brute-force
    // all-pairs at the threshold (the pigeonhole losslessness the
    // oracle leans on)
    val codes = imageDHashes(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- codes.keys; b <- codes.keys if a < b
      hm = java.lang.Long.bitCount(codes(a) ^ codes(b))
      if hm <= ImageHammingMax
    } yield (a, b, hm.toLong)).toSet
    assert(pairs == brute)
    spark.catalog.clearCache()
  }

  test("q126: dHashes survive the real PPM codec round trip") {
    // imageDHashes decodes encodePpm(ppmVariantOf(id)) through the
    // REAL parser; hashing the raster directly must agree
    val ids = Seq(0L, 1L, 5L, 42L, 99L)
    val viaCodec = imageDHashes(ids.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(viaCodec(id) == imageDHash64(ppmVariantOf(id)))
    }
  }

  test("mime sniffing identifies media containers from magic bytes") {
    assert(sniffMime(png(10)) == "image/png")
    assert(sniffMime(jpeg(10)) == "image/jpeg")
    assert(sniffMime(wav(10)) == "audio/wav")
    assert(sniffMime(Array[Byte](1, 2)) == "application/octet-stream")
  }

  test("feature extraction: schema, dims, determinism, partition preservation") {
    val feats = extractFeatures(media)
    assert(feats.rdd.getNumPartitions == 2) // mapPartitions keeps layout
    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.length == 4)
    rows.foreach { f =>
      assert(f.features.length == FeatureDim)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3) // normalized histogram
    }
    assert(rows(0).mime == "image/png" && rows(0).n_bytes == 1004)
    // deterministic: same input -> identical features
    val again = extractFeatures(media).collect().sortBy(_.media_id)
    assert(rows.zip(again).forall { case (a, b) =>
      a.features.sameElements(b.features) })
  }

  test("frame sampling keeps every stride-th fixed-size chunk") {
    val vid = Seq(MediaRecord(9L, "video", Array.fill[Byte](1000)(1))).toDS()
    val frames = sampleFrames(vid, frameBytes = 100, stride = 3).collect()
    // chunks 0..9, keep 0,3,6,9
    assert(frames.map(_.getAs[Int]("frame_index")).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[Int]("frame_bytes") == 100))
  }

  test("resize stub shrinks payloads, preserves mime header, stays typed") {
    val resized = resize(media, stride = 4).collect().sortBy(_.media_id)
    val orig = media.collect().sortBy(_.media_id)
    resized.zip(orig).foreach { case (r, o) =>
      assert(sniffMime(r.payload) == sniffMime(o.payload)) // header kept
      assert(r.payload.length < o.payload.length)
      assert(r.payload.length == 4 + (o.payload.length - 4 + 3) / 4)
    }
  }

  test("multimodalMeta: hand-computed frame sampling over derived media") {
    val docs = Seq(
      (4L, "hello"),          // sel 0: png header (4B) -> 9 bytes, 1 frame
      (1L, "x" * 70)          // sel 1: jpeg header (3B) -> 73 bytes, 3 frames
    ).toDF("doc_id", "text")
    val rows = Multimodal.multimodalMeta(docs).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    val png = rows(4L)
    assert(png.getAs[String]("mime") == "image/png")
    assert(png.getAs[String]("kind") == "image")
    assert(png.getAs[Long]("n_bytes") == 9L)
    assert(png.getAs[Long]("n_frames_sampled") == 1L) // only chunk 0
    assert(png.getAs[Long]("sampled_bytes") == 9L)
    val jpg = rows(1L)
    assert(jpg.getAs[String]("mime") == "image/jpeg")
    assert(jpg.getAs[Long]("n_bytes") == 73L)
    // chunks of 32: [32, 32, 9]; stride 2 keeps 0 and 2 -> 32 + 9
    assert(jpg.getAs[Long]("n_frames_sampled") == 2L)
    assert(jpg.getAs[Long]("sampled_bytes") == 41L)
  }

  test("metadata projection reads lengths without decoding") {
    val meta = metadata(media.toDF()).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("n_bytes")).toMap
    assert(meta(3L) == 2004L && meta(4L) == 4096L)
  }

  test("WAV codec round-trips known PCM samples") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 7)
    val info = Multimodal.decodeWav(
      Multimodal.encodeWavPcm16(44100, samples)).get
    assert(info.sampleRate == 44100 && info.channels == 1)
    assert(info.bitsPerSample == 16 && info.nSamples == 6)
    assert(info.peakAbs == 32768)
    assert(info.sumAbs == 0L + 1000 + 1000 + 32767 + 32768 + 7)
  }

  test("WAV decoder walks unknown chunks and RIFF pad bytes") {
    // hand-build: RIFF / WAVE / LIST(3 bytes, odd -> pad) / fmt / data
    val samples = Array[Short](5, -5)
    val canonical = Multimodal.encodeWavPcm16(8000, samples)
    val fmtAndData = java.util.Arrays.copyOfRange(canonical, 12,
      canonical.length)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // 3B + pad
    val riffLen = 4 + list.length + fmtAndData.length
    val head = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII")).array()
    val info = Multimodal.decodeWav(head ++ list ++ fmtAndData).get
    assert(info.nSamples == 2 && info.sumAbs == 10L)
  }

  test("WAV decoder rejects non-PCM and truncated input") {
    val wav = Multimodal.encodeWavPcm16(8000, Array[Short](1, 2, 3))
    assert(Multimodal.decodeWav(wav.take(20)).isEmpty)
    val nonPcm = wav.clone()
    nonPcm(20) = 3 // audioFormat = IEEE float
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxxJUNK".getBytes).isEmpty)
  }

  test("adversarial containers return None, never crash") {
    // PPM header whose 3*w*h wraps Int: must not accept a tiny raster
    val overflow = ("P6\n1431655766 1\n255\n".getBytes("US-ASCII")) ++
      Array[Byte](1, 2)
    assert(Multimodal.decodePpm(overflow).isEmpty)
    val negWrap = ("P6\n715827883 1\n255\n".getBytes("US-ASCII")) ++
      Array[Byte](1, 2)
    assert(Multimodal.decodePpm(negWrap).isEmpty)
    // WAV declaring zero channels: None, not a division crash
    val wav = Multimodal.encodeWavPcm16(8000, Array[Short](1, 2))
    val zeroCh = wav.clone()
    zeroCh(22) = 0 // fmt channels (LE short at offset 22)
    assert(Multimodal.decodeWav(zeroCh).isEmpty)
  }

  test("PPM codec round-trips and honors header comments") {
    val img = Multimodal.PpmImage(2, 2,
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
    val decoded = Multimodal.decodePpm(Multimodal.encodePpm(img)).get
    assert(decoded.width == 2 && decoded.height == 2)
    assert(decoded.pixels.toSeq == img.pixels.toSeq)
    val withComment = ("P6\n# a comment line\n2 2\n255\n".getBytes(
      "US-ASCII")) ++ img.pixels
    val dc = Multimodal.decodePpm(withComment).get
    assert(dc.width == 2 && dc.pixels.toSeq == img.pixels.toSeq)
    // short raster / wrong maxval are rejected
    assert(Multimodal.decodePpm(
      Multimodal.encodePpm(img).dropRight(1)).isEmpty)
    assert(Multimodal.decodePpm(
      ("P6\n2 2\n65535\n".getBytes("US-ASCII")) ++ img.pixels ++
        img.pixels).isEmpty)
  }

  test("WAV round-trip holds over randomized PCM (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val n = rnd.nextInt(200)
      val rate = 1 + rnd.nextInt(48000)
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val info = Multimodal.decodeWav(
        Multimodal.encodeWavPcm16(rate, samples)).get
      assert(info.nSamples == n && info.sampleRate == rate)
      assert(info.sumAbs ==
        samples.map(s => math.abs(s.toInt).toLong).sum)
      assert(info.peakAbs ==
        (if (n == 0) 0 else samples.map(s => math.abs(s.toInt)).max))
    }
  }

  test("PPM round-trip and resize dims hold over randomized rasters") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val w = 1 + rnd.nextInt(24); val h = 1 + rnd.nextInt(24)
      val px = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val img = Multimodal.decodePpm(
        Multimodal.encodePpm(Multimodal.PpmImage(w, h, px))).get
      assert(img.width == w && img.height == h)
      assert(img.pixels.toSeq == px.toSeq)
      val f = 1 + rnd.nextInt(4)
      val r = Multimodal.resizePpmNearest(img, f)
      assert(r.width == (w + f - 1) / f && r.height == (h + f - 1) / f)
      assert(r.pixels(0) == px(0)) // (0,0) always samples source (0,0)
    }
  }

  test("PNG round-trip holds over randomized rasters (all five filters)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      // h >= 5 in most draws exercises every filter type (encoder
      // cycles y % 5); small h draws cover the short-image path
      val w = 1 + rnd.nextInt(24); val h = 1 + rnd.nextInt(24)
      val px = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val img = Multimodal.decodePng(
        Multimodal.encodePng(Multimodal.PngImage(w, h, px))).get
      assert(img.width == w && img.height == h)
      assert(img.pixels.toSeq == px.toSeq,
        s"raster mismatch at ${w}x$h")
    }
  }

  test("PNG decoder verifies structure: signature, CRC, zlib, filters") {
    val img = Multimodal.PngImage(4, 5,
      Array.tabulate(60)(i => (i * 37).toByte))
    val bytes = Multimodal.encodePng(img)
    assert(Multimodal.decodePng(bytes).get.pixels.toSeq ==
      img.pixels.toSeq)
    // signature damage
    val sig = bytes.clone(); sig(0) = 0
    assert(Multimodal.decodePng(sig).isEmpty)
    // CRC damage: flip one IDAT payload byte (CRC now mismatches)
    val idatAt = {
      // find "IDAT" tag
      val s = bytes.indexOfSlice("IDAT".getBytes("US-ASCII"))
      s + 6 // a couple of bytes into the zlib stream
    }
    val crcBad = bytes.clone(); crcBad(idatAt) = (crcBad(idatAt) ^ 0x40).toByte
    assert(Multimodal.decodePng(crcBad).isEmpty)
    // truncated file
    assert(Multimodal.decodePng(bytes.dropRight(13)).isEmpty)
    // wrong color type rejected (flip IHDR colorType greyscale);
    // note CRC must be invalid too, so None either way — this pins
    // that nothing crashes on a non-truecolor header
    val grey = bytes.clone(); grey(8 + 8 + 9) = 0
    assert(Multimodal.decodePng(grey).isEmpty)
    // CRC-valid IHDR with a declared length < 13 (crafted input):
    // must be None, not a buffer underflow
    def chunk(tp: String, data: Array[Byte]): Array[Byte] = {
      val td = tp.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32(); crc.update(td)
      java.nio.ByteBuffer.allocate(td.length + 8)
        .putInt(data.length).put(td).putInt(crc.getValue.toInt).array()
    }
    val shortIhdr = bytes.take(8) ++
      chunk("IHDR", Array[Byte](0, 0, 0, 4)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.decodePng(shortIhdr).isEmpty)
  }

  test("pngOf covers all five scanline filters sample-exactly") {
    // h = 5 + id%6 >= 5: the round-trip in pngDecodeStats exercises
    // None/Sub/Up/Average/Paeth for every single document
    for (id <- 0L to 12L) {
      val img = Multimodal.pngOf(id)
      assert(img.height >= 5)
      val rt = Multimodal.decodePng(Multimodal.encodePng(img)).get
      assert(rt.pixels.toSeq == img.pixels.toSeq)
    }
  }

  test("JPEG codec (JDK imageio) round-trips within the graded bounds") {
    for (id <- 0L to 20L) {
      val src = Multimodal.jpegOf(id)
      val bytes = Multimodal.encodeJpeg(src)
      assert(Multimodal.sniffMime(bytes) == "image/jpeg")
      val dec = Multimodal.decodeJpeg(bytes).get
      assert(dec.width == src.width && dec.height == src.height)
      def mean(p: Multimodal.PpmImage, c: Int): Double = {
        val vals = p.pixels.indices.collect {
          case i if i % 3 == c => p.pixels(i) & 0xff }
        vals.sum.toDouble / vals.length
      }
      for (c <- 0 to 2)
        assert(math.abs(mean(dec, c) - mean(src, c)) <=
          Multimodal.JpegMeanTolerance,
          s"channel $c mean drifted past tolerance for doc $id")
    }
    // garbage is rejected, not crashed on
    assert(Multimodal.decodeJpeg(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("MP4 box parser recovers mvhd/trak/mdat facts") {
    val mdat = Array.tabulate(40)(_.toByte)
    val bytes = Multimodal.encodeMp4Meta(1000L, 5500L, 2, mdat)
    val info = Multimodal.parseMp4(bytes).get
    assert(info == Multimodal.Mp4Info(1000L, 5500L, 2, 40L))
    // ftyp magic maps to the video mime bucket (0x00 0x00 0x00 size)
    assert(Multimodal.sniffMime(bytes) == "video/mp4")
    // a second mdat accumulates
    val two = bytes ++ bytes.slice(bytes.length - 48, bytes.length)
    assert(Multimodal.parseMp4(two).get.mdatBytes == 80L)
    // corruption: truncated box, bad size, missing moov
    assert(Multimodal.parseMp4(bytes.dropRight(5)).isEmpty)
    val badSize = bytes.clone(); badSize(0) = 0x7f
    assert(Multimodal.parseMp4(badSize).isEmpty)
    assert(Multimodal.parseMp4(
      Multimodal.encodeMp4Meta(1000L, 1L, 1, mdat).take(24)).isEmpty)
  }

  test("MP4 parser handles version-1 mvhd and 64-bit largesize") {
    // version-1 mvhd: 64-bit creation/modification/duration
    val b = java.nio.ByteBuffer.allocate(112)
    b.putInt(0x01000000)        // version 1 + flags
    b.putLong(0).putLong(0)     // creation / modification (64-bit)
    b.putInt(90000)             // timescale
    b.putLong(123456789L)       // duration (64-bit)
    b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
    val mvhd1 = {
      val payload = b.array()
      java.nio.ByteBuffer.allocate(8 + payload.length)
        .putInt(8 + payload.length).put("mvhd".getBytes("US-ASCII"))
        .put(payload).array()
    }
    val moov = java.nio.ByteBuffer.allocate(8 + mvhd1.length)
      .putInt(8 + mvhd1.length).put("moov".getBytes("US-ASCII"))
      .put(mvhd1).array()
    val info = Multimodal.parseMp4(moov).get
    assert(info.timescale == 90000L && info.duration == 123456789L)

    // 64-bit largesize mdat (size field = 1, real size follows)
    val payload = Array.tabulate(10)(_.toByte)
    val large = java.nio.ByteBuffer.allocate(16 + payload.length)
      .putInt(1).put("mdat".getBytes("US-ASCII"))
      .putLong(16L + payload.length).put(payload).array()
    val both = moov ++ large
    assert(Multimodal.parseMp4(both).get.mdatBytes == 10L)
  }

  test("MP4 raw-video frames round-trip through the sample tables") {
    // 3 frames of 4x2 RGB24, distinct bytes; 2 chunks (2 + 1 frames)
    val frames = Vector.tabulate(3)(f =>
      Array.tabulate(4 * 2 * 3)(p => (f * 50 + p).toByte))
    val bytes = Multimodal.encodeMp4RawVideo(4, 2, frames)
    // still a structurally-valid MP4 to the box-level parser
    val info = Multimodal.parseMp4(bytes).get
    assert(info.nTracks == 1 && info.mdatBytes == 3 * 24)
    val track = Multimodal.extractMp4Frames(bytes).get
    assert(track.format == "raw " && track.depth == 24)
    assert(track.width == 4 && track.height == 2)
    assert(track.frames.size == 3)
    // byte-exact per frame: chunk offsets, sample sizes and the
    // sample-to-chunk runs all resolved correctly
    track.frames.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("MP4 frame extraction refuses corrupt tables and compressed tracks") {
    val frames = Vector.tabulate(2)(f =>
      Array.tabulate(2 * 2 * 3)(p => (f + p).toByte))
    val bytes = Multimodal.encodeMp4RawVideo(2, 2, frames)

    // an stco offset pointing past EOF must fail whole, not partially
    val stcoAt = {
      // locate 'stco' fourcc
      val idx = bytes.indices.indexWhere(i => i + 4 <= bytes.length &&
        new String(bytes, i, 4, "US-ASCII") == "stco")
      idx
    }
    assert(stcoAt > 0)
    val corrupt = bytes.clone()
    // first chunk offset field: stco fourcc + ver/flags(4) + count(4)
    java.nio.ByteBuffer.wrap(corrupt).putInt(stcoAt + 12, bytes.length + 99)
    assert(Multimodal.extractMp4Frames(corrupt).isEmpty)

    // an avc1 track now EXTRACTS (q229: the in-repo intra decoder
    // replaced the old None) — but one with no avcC record in its
    // sample entry fails LOUD at Annex-B reassembly, never silently
    val avc1 = bytes.clone()
    val rawAt = avc1.indices.indexWhere(i => i + 4 <= avc1.length &&
      new String(avc1, i, 4, "US-ASCII") == "raw ")
    "avc1".getBytes("US-ASCII").copyToArray(avc1, rawAt)
    val avc1Track = Multimodal.extractMp4Frames(avc1).get
    assert(avc1Track.format == "avc1" && avc1Track.config.isEmpty)
    val noCfg = intercept[RuntimeException](
      graft.io.H264Intra.annexBFromAvcc(avc1Track.config,
        avc1Track.frames.head))
    assert(noCfg.getMessage.contains("avcC"))
    assert(Multimodal.parseMp4(avc1).nonEmpty) // box walk still fine

    // single frame: one chunk, still exact
    val one = Multimodal.encodeMp4RawVideo(2, 2, frames.take(1))
    assert(Multimodal.extractMp4Frames(one).get.frames.size == 1)

    // crafted table counts: an stsz count whose `count * 4` overflows
    // Int must return None, not walk off the buffer; a huge fixed-size
    // count must return None, not attempt a 2-billion-element fill
    def patchStsz(entryCount: Int, fixedSize: Int): Array[Byte] = {
      val c = bytes.clone()
      val at = c.indices.indexWhere(i => i + 4 <= c.length &&
        new String(c, i, 4, "US-ASCII") == "stsz")
      assert(at > 0)
      val bb = java.nio.ByteBuffer.wrap(c)
      bb.putInt(at + 8, fixedSize)  // sample_size
      bb.putInt(at + 12, entryCount) // sample_count
      c
    }
    assert(Multimodal.extractMp4Frames(patchStsz(0x20000000, 0)).isEmpty)
    assert(Multimodal.extractMp4Frames(patchStsz(Int.MaxValue, 12)).isEmpty)
    assert(Multimodal.extractMp4Frames(patchStsz(3, -5)).isEmpty)
  }

  test("mp4FrameStats facts match the synthesis arithmetic") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 7L, 12L).toDF("doc_id")
    val rows = Multimodal.mp4FrameStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L, 3L, 7L, 12L).foreach { id =>
      val (w, h, frames) = Multimodal.mp4FramesOf(id)
      val r = rows(id)
      assert(r.getLong(1) == frames.size)
      assert(r.getLong(2) == w && r.getLong(3) == h)
      assert(r.getLong(4) == w * h * 3)
      assert(r.getLong(5) ==
        frames.map(_.map(b => (b & 0xff).toLong).sum).sum)
      assert(r.getLong(6) == frames.map(f => (f(0) & 0xff).toLong).sum)
      assert(r.getLong(7) == 24L)
    }
  }

  test("MJPEG track: samples extract byte-exact, every frame entropy-" +
      "decodes, per-frame means stay inside the q68 bound") {
    val id = 5L
    val n = (2 + id % 5).toInt
    val src = Vector.tabulate(n)(f => Multimodal.mjpegFrameOf(id, f))
    val encoded = src.map(Multimodal.encodeJpeg(_))
    val bytes = Multimodal.encodeMp4VideoTrack("jpeg",
      src.head.width, src.head.height, encoded)
    // box-level structure still valid
    assert(Multimodal.parseMp4(bytes).get.nTracks == 1)
    val track = Multimodal.extractMp4Frames(bytes).get
    assert(track.format == "jpeg")
    assert(track.width == src.head.width && track.height == src.head.height)
    // sample slicing is byte-exact: each extracted sample IS its JPEG
    track.frames.zip(encoded).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "sample bytes differ")
    }
    // ... and each decodes through the real codec with bounded error
    def mean(p: Multimodal.PpmImage, c: Int): Double = {
      var i = c; var s = 0L
      while (i < p.pixels.length) { s += p.pixels(i) & 0xff; i += 3 }
      s.toDouble / (p.pixels.length / 3)
    }
    track.frames.zip(src).foreach { case (fb, s) =>
      val d = Multimodal.decodeJpeg(fb).get
      assert(d.width == s.width && d.height == s.height)
      (0 to 2).foreach(c => assert(
        math.abs(mean(d, c) - mean(s, c)) <= Multimodal.JpegMeanTolerance,
        s"channel $c mean drifted"))
    }
    // frames are genuinely distinct (the phase term) — a frame-order
    // mixup cannot pass silently
    assert(encoded.distinct.size == encoded.size)
  }

  test("avc1 track (q229): avcC record + length-prefixed samples " +
      "survive the real sample tables, reassemble to Annex-B, and " +
      "decode within the QP bound; sample slicing is byte-exact") {
    import graft.io.H264Intra
    val w = 32; val h = 16; val qp = 22
    def frame(f: Int): H264Intra.Yuv = {
      val y = Array.tabulate(w * h) { i =>
        val bx = (i % w) / 4
        val by = (i / w) / 4
        if ((bx + by) % 2 == 0) 52 + 8 * f else 212 - 8 * f
      }
      H264Intra.Yuv(w, h, y, Array.fill(w / 2 * (h / 2))(128),
        Array.fill(w / 2 * (h / 2))(128))
    }
    val srcs = Vector.tabulate(3)(frame)
    val rbsps = srcs.map(s => H264Intra.encodeIdrRbsps(s, qp))
    val samples = rbsps.map { case (_, _, idr) =>
      H264Intra.avcSample(idr)
    }
    val (sps, pps, _) = rbsps.head
    val bytes = Multimodal.encodeMp4VideoTrack("avc1", w, h, samples,
      configBox = Multimodal.mp4Box("avcC",
        H264Intra.avcConfigRecord(sps, pps)))
    assert(Multimodal.parseMp4(bytes).get.nTracks == 1)
    val track = Multimodal.extractMp4Frames(bytes).get
    assert(track.format == "avc1" && track.frames.size == 3)
    assert(track.width == w && track.height == h)
    // sample slicing byte-exact through the two-chunk tables
    track.frames.zip(samples).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "sample bytes differ")
    }
    // the avcC config survived inside the sample entry extension
    assert(new String(track.config, 4, 4, "US-ASCII") == "avcC")
    // reassembled Annex-B decodes per frame within the QP bound
    val qstep = math.pow(2, qp / 6.0) * 0.625
    track.frames.zip(srcs).foreach { case (sample, s) =>
      val dec = H264Intra.decodeIdr(
        H264Intra.annexBFromAvcc(track.config, sample))
      assert(dec.w == w && dec.h == h)
      val maxErr = s.y.indices.map(i => math.abs(dec.y(i) - s.y(i))).max
      assert(maxErr <= qstep * 0.7 + 2, s"max luma err $maxErr")
      assert(dec.cb.forall(_ == 128) && dec.cr.forall(_ == 128))
    }
    // frames genuinely distinct: an order mixup cannot pass
    assert(samples.map(_.toSeq).distinct.size == samples.size)
  }

  test("mjpegDecodeStats facts match the synthesis arithmetic with " +
      "all bounds TRUE") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 4L, 9L, 17L)
    val rows = Multimodal.mjpegDecodeStats(ids.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r).toMap
    ids.foreach { id =>
      val r = rows(id)
      assert(r.getLong(1) == 2 + id % 5)
      assert(r.getLong(2) == 8 + id % 9 && r.getLong(3) == 8 + id % 7)
      assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6))
    }
  }

  test("nearest-neighbor resize samples pixels (x*f, y*f)") {
    // 4x2 image whose red channel encodes the pixel's (x, y)
    val px = new Array[Byte](3 * 4 * 2)
    for (y <- 0 until 2; x <- 0 until 4) px(3 * (y * 4 + x)) =
      (10 * y + x).toByte
    val r = Multimodal.resizePpmNearest(Multimodal.PpmImage(4, 2, px), 2)
    assert(r.width == 2 && r.height == 1)
    assert(r.pixels(0) == 0 && r.pixels(3) == 2) // src (0,0), (2,0)
  }

  test("decodeWavSamples round-trips extreme PCM; audioFrameFeatures " +
      "matches a hand computation from the synthesis arithmetic, " +
      "tail frame short, crossings only within frames") {
    import spark.implicits._
    val extreme = Array[Short](0, 1000, -1000, 32767, -32768, 7)
    val back = Multimodal.decodeWavSamples(
      Multimodal.encodeWavPcm16(44100, extreme)).get
    assert(back.toSeq == extreme.toSeq)
    // operator vs a direct recomputation for doc 1 (n = 65 samples:
    // 4 full frames of 16 + a 1-sample tail)
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val out = Multimodal.audioFrameFeatures(docs).collect()
      .map(r => r.getAs[Long]("frame") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sumsq"),
          r.getAs[Long]("zc"), r.getAs[Double]("rms")))).toMap
    val samples = Multimodal.wavSamplesOf(1L)
    assert(samples.length == 65)
    val expected = samples.grouped(Multimodal.AudioFrameLen).zipWithIndex
      .map { case (fr, fi) =>
        val sq = fr.map(s => s.toLong * s).sum
        val zc = fr.toSeq.sliding(2).count {
          case Seq(a, b) => a.toInt * b.toInt < 0
          case _ => false
        }
        fi.toLong ->
          ((fr.length.toLong, sq, zc.toLong,
            math.sqrt(sq.toDouble / fr.length)))
      }.toMap
    assert(out == expected)
    assert(out(4L)._1 == 1L, "tail frame must be 1 sample")
    // a crossing at a frame BOUNDARY must not be counted: doc 1's
    // samples alternate sign often — recompute global crossings and
    // confirm the framed total only counts within-frame ones
    val globalZc = samples.toSeq.sliding(2).count {
      case Seq(a, b) => a.toInt * b.toInt < 0
      case _ => false
    }
    val framedZc = out.values.map(_._3).sum
    assert(framedZc <= globalZc)
  }

  test("q257 VAD: segments are the hangover-smoothed islands of the " +
      "exact integer energy test, with 2 ms/frame clock and exact " +
      "summed energy") {
    import spark.implicits._
    val ids = Seq(1L, 5L, 17L, 40L)
    val docs = ids.map((_, "x")).toDF("doc_id", "text")
    val out = Multimodal.vadSegments(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    for (id <- ids) {
      // reference recomputation straight from the synthesis
      val frames = Multimodal.wavSamplesOf(id)
        .grouped(Multimodal.AudioFrameLen).toVector
        .map(fr => (fr.length.toLong, fr.map(s => s.toLong * s).sum))
      val raw = frames.map { case (n, sq) =>
        sq > n * Multimodal.VadEnergyPerSample }
      val speech = raw.indices.map(i =>
        (math.max(0, i - Multimodal.VadHangoverFrames) to i)
          .exists(raw))
      // islands of consecutive speech frames
      val segs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      var i = 0
      while (i < speech.length) {
        if (speech(i)) {
          val start = i
          while (i + 1 < speech.length && speech(i + 1)) i += 1
          val e = (start to i).map(f => frames(f)._2).sum
          segs += ((start.toLong, i.toLong,
            (i - start + 1).toLong, e))
        }
        i += 1
      }
      val got = out.getOrElse(id, Array.empty)
        .sortBy(_.getAs[Long]("seg_idx"))
        .map(r => (r.getAs[Long]("start_frame"),
          r.getAs[Long]("end_frame"), r.getAs[Long]("n_frames"),
          r.getAs[Long]("energy"))).toSeq
      assert(got == segs.toSeq, s"doc $id segments mismatch")
      for (r <- out.getOrElse(id, Array.empty)) {
        assert(r.getAs[Long]("start_ms") ==
          r.getAs[Long]("start_frame") * 2L)
        assert(r.getAs[Long]("end_ms") ==
          (r.getAs[Long]("end_frame") + 1L) * 2L)
      }
    }
    // the fixture must exercise both branches somewhere
    val total = ids.map(id => Multimodal.wavSamplesOf(id)
      .grouped(Multimodal.AudioFrameLen).size).sum
    val inSeg = out.values.flatten.map(_.getAs[Long]("n_frames")).sum
    assert(inSeg > 0L && inSeg < total.toLong,
      s"VAD must keep some and drop some frames ($inSeg of $total)")
  }

  test("the q257 plan has no single-partition exchange — every " +
      "window is doc-partitioned") {
    import spark.implicits._
    val plan = Multimodal.vadSegments(Seq((1L, "t"))
        .toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"unpartitioned window in:\n$plan")
  }

  test("q258 EXIF: both byte orders round-trip; the marker walk " +
      "hops the JFIF APP0; inline SHORT/LONG and offset ASCII all " +
      "invert the writer") {
    for (le <- Seq(true, false)) {
      val bytes = Multimodal.encodeExifJpeg(le, "CamX", "Model-7",
        orientation = 6, width = 1234L, dateTime = "2024:04:05 09:00:00")
      val info = Multimodal.parseExif(bytes).get
      assert(info.endian == (if (le) "II" else "MM"))
      assert(info.nEntries == 5)
      assert(info.make == "CamX")
      assert(info.model == "Model-7")
      assert(info.orientation == 6)
      assert(info.width == 1234L)
      assert(info.dateTime == "2024:04:05 09:00:00")
    }
    // no Exif APP1 -> None, never a wrong answer
    assert(Multimodal.parseExif(
      Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte))
      .isEmpty)
    assert(Multimodal.parseExif(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("q258: unknown IFD tags are skipped, not errors (the TIFF " +
      "rule); a corrupted TIFF magic yields a None VERDICT — one " +
      "odd document must not kill the task (the r15 flagged-row " +
      "discipline)") {
    val good = Multimodal.encodeExifJpeg(true, "A", "B", 1, 1L,
      "2024:01:01 00:00:00")
    // corrupt the magic (tiff starts after SOI+APP0(18)+APP1 hdr(4)
    // + Exif id(6) = 30; magic at +2)
    val bad = good.clone()
    bad(32) = 0x13
    assert(Multimodal.parseExif(bad).isEmpty)
    // a bad byte-order mark is likewise a verdict, not a crash
    val bad2 = good.clone()
    bad2(30) = 'X'.toByte; bad2(31) = 'X'.toByte
    assert(Multimodal.parseExif(bad2).isEmpty)
  }

  test("q258 graded frame matches the per-doc field arithmetic") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 12L, 1023L)
    val out = Multimodal.exifStats(ids.map((_, "x"))
        .toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- ids) {
      val (le, make, model, orient, width, dt) =
        Multimodal.exifFieldsOf(id)
      val r = out(id)
      assert(r.getAs[String]("endian") == (if (le) "II" else "MM"))
      assert(r.getAs[String]("make") == make)
      assert(r.getAs[String]("model") == model)
      assert(r.getAs[Long]("orientation") == orient.toLong)
      assert(r.getAs[Long]("width") == width)
      assert(r.getAs[String]("datetime") == dt)
    }
  }

  test("q280 shots: cuts land exactly on the planted 5-frame steps " +
      "(offset per doc), shot ids are cumulative, and the verdict " +
      "is an exact integer compare on decoded bytes") {
    import spark.implicits._
    val ids = Seq(0L, 3L, 7L)
    val out = Multimodal.shotBoundaries(ids.map((_, "x"))
        .toDF("doc_id", "text")).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    for (id <- ids) {
      val r = (id % 5).toInt
      val rows = out(id).sortBy(_.getAs[Long]("frame"))
      assert(rows.length == (8 + id % 5).toInt)
      for (row <- rows) {
        val f = row.getAs[Long]("frame").toInt
        assert(row.getAs[Boolean]("is_cut") ==
          (f > 0 && (f + r) % 5 == 0), s"doc $id frame $f cut")
        assert(row.getAs[Long]("shot_id") == (f + r) / 5,
          s"doc $id frame $f shot")
      }
      assert(rows.exists(_.getAs[Boolean]("is_cut")),
        s"doc $id must contain at least one cut")
    }
  }

  test("q281: exactly one sampled frame per shot, the middle one, " +
      "with its exact frame sum") {
    import spark.implicits._
    val docs = Seq((3L, "x")).toDF("doc_id", "text")
    val frames = Multimodal.shotBoundaries(docs).collect()
      .map(r => r.getAs[Long]("frame") ->
        ((r.getAs[Long]("shot_id"), r.getAs[Long]("frame_sum"))))
      .toMap
    val shots = Multimodal.shotSampledFrames(docs).collect()
      .sortBy(_.getAs[Long]("shot_id"))
    val nShots = frames.values.map(_._1).toSet.size
    assert(shots.length == nShots, "one row per shot")
    for (r <- shots) {
      val first = r.getAs[Long]("first_frame")
      val last = r.getAs[Long]("last_frame")
      val mid = r.getAs[Long]("sampled_frame")
      assert(mid == (first + last) / 2)
      assert(frames(mid)._1 == r.getAs[Long]("shot_id"),
        "the sampled frame must belong to its shot")
      assert(frames(mid)._2 == r.getAs[Long]("sampled_sum"))
      assert(r.getAs[Long]("n_frames") == last - first + 1)
    }
  }

  test("q282 interleave: items merge in time order with the " +
      "image-before-text tie-break, token costs and the running " +
      "budget are exact") {
    import spark.implicits._
    val docs = Seq((3L, (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Multimodal.interleaveMultimodal(docs).collect()
      .sortBy(_.getAs[Long]("seq_idx"))
    assert(rows.nonEmpty)
    // seq order equals (t_ms, modality, ref) order
    val keys = rows.map(r => (r.getAs[Long]("t_ms"),
      r.getAs[String]("modality"), r.getAs[String]("ref"))).toSeq
    assert(keys == keys.sorted, "sequence must be time-ordered")
    assert(rows.map(_.getAs[Long]("seq_idx")).toSeq ==
      (0L until rows.length.toLong))
    // both modalities present; image cost constant; text cost words
    assert(rows.exists(_.getAs[String]("modality") == "image"))
    assert(rows.exists(_.getAs[String]("modality") == "text"))
    for (r <- rows if r.getAs[String]("modality") == "image")
      assert(r.getAs[Long]("n_tokens") == Multimodal.ImageTokenCost)
    // running budget is the exact prefix sum
    var cum = 0L
    for (r <- rows) {
      cum += r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("cum_tokens") == cum)
    }
  }
}
