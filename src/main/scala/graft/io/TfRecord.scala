package graft.io

/** TFRecord + a tf.train.Example protobuf codec — THE ML
  * training-data container (TensorFlow's record format; the shape a
  * tokenized/packed corpus is actually shipped to trainers in).
  * Public formats: the TFRecord framing (8-byte LE length, 4-byte
  * MASKED CRC-32C of the length bytes, payload, 4-byte masked
  * CRC-32C of the payload; mask(c) = ((c >>> 15 | c << 17) +
  * 0xa282ead8) — the published kMaskDelta) and the protobuf wire
  * format (varint tags/lengths, little-endian field keys
  * (field << 3 | wireType), length-delimited nested messages).
  *
  * The Example subset carried, stated precisely: Example{ Features
  * features = 1 } / Features{ repeated map-entry feature = 1 } /
  * entry{ string key = 1; Feature value = 2 } / Feature oneof
  * { BytesList = 1, FloatList = 2, Int64List = 3 }, with Int64List
  * values PACKED (field 1, wire type 2) — the exact layout
  * TensorFlow writes. Unknown fields/wire types and CRC mismatches
  * reject loudly. Row-local: a record corpus shards by file. */
object TfRecord {

  // ---- CRC-32C (Castagnoli), reflected, poly 0x82F63B78 ---------

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0x82F63B78 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  def crc32c(data: Array[Byte]): Int = {
    var c = 0xFFFFFFFF
    var i = 0
    while (i < data.length) {
      c = CrcTable((c ^ data(i)) & 0xFF) ^ (c >>> 8)
      i += 1
    }
    ~c
  }

  /** TensorFlow's masked CRC: rotate right 15, add kMaskDelta. */
  def maskedCrc(data: Array[Byte]): Int = {
    val c = crc32c(data)
    ((c >>> 15) | (c << 17)) + 0xa282ead8
  }

  // ---- protobuf wire primitives ---------------------------------

  final class PbWriter {
    val out = new java.io.ByteArrayOutputStream
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) {
        out.write(((v & 0x7F) | 0x80).toInt)
        v >>>= 7
      }
      out.write((v & 0x7F).toInt)
    }
    def key(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def lenDelim(field: Int, bytes: Array[Byte]): Unit = {
      key(field, 2); varint(bytes.length); out.write(bytes)
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  final class PbReader(bytes: Array[Byte], from: Int, to: Int) {
    var pos: Int = from
    def hasMore: Boolean = pos < to
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        require(pos < to, "varint past end")
        b = bytes(pos) & 0xFF
        pos += 1
        v |= (b & 0x7FL) << shift
        shift += 7
        require(shift <= 70, "varint too long")
      } while ((b & 0x80) != 0)
      v
    }
    def readKey(): (Int, Int) = {
      val k = varint()
      ((k >>> 3).toInt, (k & 7).toInt)
    }
    def slice(len: Int): (Int, Int) = {
      require(pos + len <= to, "length-delimited field past end")
      val r = (pos, pos + len)
      pos += len
      r
    }
  }

  // ---- tf.train.Example (the carried subset) --------------------

  sealed trait FeatureValue
  final case class BytesFeature(v: Array[Byte]) extends FeatureValue
  final case class Int64Feature(v: Seq[Long]) extends FeatureValue

  /** Encode an Example with the given features (map order is the
    * emission order — deterministic). */
  def encodeExample(features: Seq[(String, FeatureValue)]): Array[Byte] = {
    val fw = new PbWriter // Features message
    features.foreach { case (name, value) =>
      val ew = new PbWriter // map entry
      ew.lenDelim(1, name.getBytes("UTF-8"))
      val vw = new PbWriter // Feature oneof
      value match {
        case BytesFeature(b) =>
          val lw = new PbWriter // BytesList
          lw.lenDelim(1, b)
          vw.lenDelim(1, lw.toBytes)
        case Int64Feature(vs) =>
          val lw = new PbWriter // Int64List, packed field 1
          val pw = new PbWriter
          vs.foreach(pw.varint)
          lw.lenDelim(1, pw.toBytes)
          vw.lenDelim(3, lw.toBytes)
      }
      ew.lenDelim(2, vw.toBytes)
      fw.lenDelim(1, ew.toBytes)
    }
    val xw = new PbWriter // Example
    xw.lenDelim(1, fw.toBytes)
    xw.toBytes
  }

  /** Decode the carried Example subset back to (name → value). */
  def decodeExample(bytes: Array[Byte]): Seq[(String, FeatureValue)] = {
    def message(r: PbReader, wantField: Int): (Int, Int) = {
      val (f, w) = r.readKey()
      require(f == wantField && w == 2,
        s"expected len-delim field $wantField, got ($f, $w)")
      r.slice(r.varint().toInt)
    }
    val top = new PbReader(bytes, 0, bytes.length)
    val (fFrom, fTo) = message(top, 1) // Example.features
    require(!top.hasMore, "trailing bytes after Example.features")
    val features = new PbReader(bytes, fFrom, fTo)
    val out = Seq.newBuilder[(String, FeatureValue)]
    while (features.hasMore) {
      val (eFrom, eTo) = message(features, 1) // repeated entry
      val entry = new PbReader(bytes, eFrom, eTo)
      val (kFrom, kTo) = message(entry, 1)
      val name = new String(bytes, kFrom, kTo - kFrom, "UTF-8")
      val (vFrom, vTo) = message(entry, 2) // Feature
      require(!entry.hasMore, s"trailing entry bytes for $name")
      val feat = new PbReader(bytes, vFrom, vTo)
      val (field, wire) = feat.readKey()
      require(wire == 2, s"feature wire type $wire for $name")
      val (lFrom, lTo) = feat.slice(feat.varint().toInt)
      val list = new PbReader(bytes, lFrom, lTo)
      val value: FeatureValue = field match {
        case 1 => // BytesList{ repeated bytes value = 1 }
          val (bFrom, bTo) = message(list, 1)
          BytesFeature(java.util.Arrays.copyOfRange(bytes, bFrom, bTo))
        case 3 => // Int64List{ repeated int64 value = 1 [packed] }
          val (pFrom, pTo) = message(list, 1)
          val pk = new PbReader(bytes, pFrom, pTo)
          val vs = Seq.newBuilder[Long]
          while (pk.hasMore) vs += pk.varint()
          Int64Feature(vs.result())
        case f => sys.error(s"feature field $f outside carried subset")
      }
      out += (name -> value)
    }
    out.result()
  }

  // ---- TFRecord framing -----------------------------------------

  private def le64(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
  private def le32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** Frame records as a TFRecord file. */
  def writeFile(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    records.foreach { r =>
      val len = le64(r.length.toLong)
      out.write(len)
      out.write(le32(maskedCrc(len)))
      out.write(r)
      out.write(le32(maskedCrc(r)))
    }
    out.toByteArray
  }

  /** Walk a TFRecord file, verifying BOTH masked CRCs per record. */
  def readFile(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    while (bb.remaining() > 0) {
      require(bb.remaining() >= 12, "truncated record header")
      val lenBytes = new Array[Byte](8)
      bb.get(lenBytes)
      val wantLenCrc = bb.getInt()
      require(maskedCrc(lenBytes) == wantLenCrc,
        "length CRC-32C mismatch")
      val len = java.nio.ByteBuffer.wrap(lenBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      require(len >= 0 && len <= bb.remaining() - 4,
        s"record length $len beyond file")
      val data = new Array[Byte](len.toInt)
      bb.get(data)
      val wantDataCrc = bb.getInt()
      require(maskedCrc(data) == wantDataCrc, "data CRC-32C mismatch")
      out += data
    }
    out.result()
  }
}
