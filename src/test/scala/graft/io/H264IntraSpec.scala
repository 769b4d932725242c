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

  test("constrained-profile violations fail loud, never wrong: " +
      "non-blocky source at encode; truncated stream at decode") {
    val bad = {
      val y = Array.tabulate(16 * 16)(i => (i * 7) % 256)
      Yuv(16, 16, y, Array.fill(64)(128), Array.fill(64)(128))
    }
    val e = intercept[IllegalArgumentException](encodeIdr(bad, 20))
    assert(e.getMessage.contains("AC coefficient"))
    val good = checker(16, 16, 60, 196)
    val stream = encodeIdr(good, 20)
    intercept[Exception](decodeIdr(stream.take(stream.length / 2)))
    // non-128 chroma is outside the constrained profile
    val badChroma = good.copy(cb = Array.fill(64)(130))
    val e2 = intercept[IllegalArgumentException](
      encodeIdr(badChroma, 20))
    assert(e2.getMessage.contains("chroma"))
  }
}
