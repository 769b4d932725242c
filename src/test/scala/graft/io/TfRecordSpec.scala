package graft.io

import org.scalatest.funsuite.AnyFunSuite

class TfRecordSpec extends AnyFunSuite {

  test("CRC-32C golden pin: the published check value for " +
      "'123456789' is 0xE3069283, and TensorFlow's mask formula " +
      "applies rotate-right-15 + kMaskDelta") {
    val v = "123456789".getBytes("US-ASCII")
    assert(TfRecord.crc32c(v) == 0xE3069283)
    val c = TfRecord.crc32c(v)
    assert(TfRecord.maskedCrc(v) ==
      ((c >>> 15) | (c << 17)) + 0xa282ead8)
  }

  test("protobuf varints round-trip across the boundary values " +
      "(0, 127, 128, 300, 2^31, 2^63-1)") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 16384L,
        Int.MaxValue.toLong, Int.MaxValue + 1L, Long.MaxValue)) {
      val w = new TfRecord.PbWriter
      w.varint(v)
      val bytes = w.toBytes
      val r = new TfRecord.PbReader(bytes, 0, bytes.length)
      assert(r.varint() == v, s"v=$v")
      assert(!r.hasMore)
    }
    // the classic published example: 300 encodes as AC 02
    val w300 = new TfRecord.PbWriter
    w300.varint(300)
    assert(w300.toBytes.toSeq == Seq(0xAC.toByte, 0x02.toByte))
  }

  test("Example encode/decode round-trips bytes and packed int64 " +
      "features in declaration order") {
    val feats = Seq(
      "text" -> TfRecord.BytesFeature("hello tfrecord".getBytes("UTF-8")),
      "doc_id" -> TfRecord.Int64Feature(Seq(42L)),
      "tokens" -> TfRecord.Int64Feature(Seq(1L, 128L, 300L, 0L)))
    val enc = TfRecord.encodeExample(feats)
    val dec = TfRecord.decodeExample(enc)
    assert(dec.map(_._1) == feats.map(_._1))
    assert(new String(dec.head._2
      .asInstanceOf[TfRecord.BytesFeature].v, "UTF-8") ==
      "hello tfrecord")
    assert(dec(1)._2.asInstanceOf[TfRecord.Int64Feature].v == Seq(42L))
    assert(dec(2)._2.asInstanceOf[TfRecord.Int64Feature].v ==
      Seq(1L, 128L, 300L, 0L))
  }

  test("TFRecord file framing round-trips multiple records and " +
      "verifies BOTH masked CRCs; any flipped bit rejects") {
    val recs = Seq(
      Array[Byte](1, 2, 3),
      "another record".getBytes("UTF-8"),
      Array.empty[Byte],
      Array.tabulate(5000)(i => (i * 7).toByte))
    val file = TfRecord.writeFile(recs)
    val back = TfRecord.readFile(file)
    assert(back.size == recs.size)
    back.zip(recs).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    // flip one payload bit -> data CRC trips
    val bad = file.clone
    bad(14) = (bad(14) ^ 1).toByte
    val e = intercept[Exception](TfRecord.readFile(bad))
    assert(e.getMessage.contains("CRC"))
    // flip a length byte -> length CRC trips before any read
    val bad2 = file.clone
    bad2(0) = (bad2(0) ^ 1).toByte
    intercept[Exception](TfRecord.readFile(bad2))
    intercept[Exception](TfRecord.readFile(file.take(10)))
  }

  test("malformed Examples reject loudly: wrong top field, unknown " +
      "feature kind, trailing bytes") {
    val w = new TfRecord.PbWriter
    w.lenDelim(2, Array[Byte](1)) // field 2 where Example wants 1
    intercept[Exception](TfRecord.decodeExample(w.toBytes))
    // FloatList (field 2) is outside the carried subset
    val fl = new TfRecord.PbWriter
    val entry = new TfRecord.PbWriter
    entry.lenDelim(1, "x".getBytes)
    val feat = new TfRecord.PbWriter
    feat.lenDelim(2, Array[Byte]())
    entry.lenDelim(2, feat.toBytes)
    fl.lenDelim(1, entry.toBytes)
    val ex = new TfRecord.PbWriter
    ex.lenDelim(1, fl.toBytes)
    intercept[Exception](TfRecord.decodeExample(ex.toBytes))
  }
}
