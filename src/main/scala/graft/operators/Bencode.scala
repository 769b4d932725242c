package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bencode / .torrent metainfo parsing (q341, r17) — the acquisition
  * channel academic datasets actually move through (Academic
  * Torrents et al.): the BitTorrent metainfo dictionary in bencode,
  * BEP-3's tiny-but-strict serialization. Public format; strictness
  * carried faithfully: integers reject leading zeros and bare '-'
  * / '-0' (the spec's canonical-form rule), dictionary keys MUST be
  * sorted byte-wise (unsorted rejects — canonical bencode is what
  * makes infohashes well-defined), strings are length-prefixed raw
  * bytes.
  *
  * Fixture: per document a deterministic single-file metainfo —
  * announce URL, info { length = n_chars(text), name, piece length
  * 64, pieces = 20 arithmetic bytes per piece }. The PARSER sees
  * only the serialized bytes; the oracle recomputes every graded
  * field from the synthesis arithmetic (piece count = ceil(len/64),
  * pieces byte-sum as a closed form). Row-local. */
object Bencode {

  sealed trait BVal
  final case class BInt(v: Long) extends BVal
  final case class BStr(v: Array[Byte]) extends BVal {
    def text: String = new String(v, "ISO-8859-1")
  }
  final case class BList(v: Seq[BVal]) extends BVal
  final case class BDict(v: Seq[(String, BVal)]) extends BVal {
    def apply(k: String): BVal = v.find(_._1 == k).getOrElse(
      sys.error(s"missing key $k")) match { case (_, x) => x }
  }

  // ---- encode ----------------------------------------------------

  def encode(v: BVal): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def go(x: BVal): Unit = x match {
      case BInt(i) =>
        out.write(s"i${i}e".getBytes("US-ASCII"))
      case s: BStr =>
        out.write(s"${s.v.length}:".getBytes("US-ASCII"))
        out.write(s.v)
      case BList(xs) =>
        out.write('l'); xs.foreach(go); out.write('e')
      case BDict(kv) =>
        out.write('d')
        kv.foreach { case (k, x) =>
          go(BStr(k.getBytes("ISO-8859-1"))); go(x)
        }
        out.write('e')
    }
    go(v)
    out.toByteArray
  }

  // ---- decode (strict) ------------------------------------------

  def decode(bytes: Array[Byte]): BVal = {
    var p = 0
    def peek: Int = {
      require(p < bytes.length, "bencode truncated")
      bytes(p) & 0xFF
    }
    def int(term: Char): Long = {
      val start = p
      while (peek != term) p += 1
      val s = new String(bytes, start, p - start, "US-ASCII")
      p += 1 // consume terminator
      require(s.nonEmpty && s != "-", s"empty integer '$s'")
      // canonical form: no leading zeros (except "0"), no "-0"
      require(s == "0" || (s.head == '-' && s(1) != '0') ||
        (s.head != '-' && s.head != '0'),
        s"non-canonical integer '$s'")
      s.toLong
    }
    def value(): BVal = peek match {
      case 'i' => p += 1; BInt(int('e'))
      case 'l' =>
        p += 1
        val xs = Seq.newBuilder[BVal]
        while (peek != 'e') xs += value()
        p += 1
        BList(xs.result())
      case 'd' =>
        p += 1
        val kv = Seq.newBuilder[(String, BVal)]
        var prev: String = null
        while (peek != 'e') {
          val k = value() match {
            case s: BStr => s.text
            case x => sys.error(s"dict key must be a string, got $x")
          }
          require(prev == null || prev < k,
            s"dict keys not sorted: '$prev' >= '$k' (canonical " +
              "bencode requires byte-wise sorted keys)")
          prev = k
          kv += (k -> value())
        }
        p += 1
        BDict(kv.result())
      case c if c >= '0' && c <= '9' =>
        val len = int(':')
        require(len >= 0 && p + len <= bytes.length,
          s"string length $len past end")
        val s = BStr(java.util.Arrays.copyOfRange(
          bytes, p, p + len.toInt))
        p += len.toInt
        s
      case c => sys.error(f"bencode: unexpected byte 0x$c%02x at $p")
    }
    val v = value()
    require(p == bytes.length, s"trailing bytes after bencode value")
    v
  }

  // ---- fixture + graded frame -----------------------------------

  val PieceLength = 64L

  def pieceBytes(id: Long, piece: Int): Array[Byte] =
    Array.tabulate(20)(j => ((id * 7 + piece * 13 + j) % 256).toByte)

  def metainfo(id: Long, text: String): Array[Byte] = {
    val n = text.length.toLong
    val nPieces = ((n + PieceLength - 1) / PieceLength).toInt
    val pieces = (0 until nPieces).flatMap(pieceBytes(id, _)).toArray
    encode(BDict(Seq(
      "announce" -> BStr(
        s"http://tracker${id % 5}.example.com/announce"
          .getBytes("US-ASCII")),
      "info" -> BDict(Seq(
        "length" -> BInt(n),
        "name" -> BStr(s"doc$id.txt".getBytes("US-ASCII")),
        "piece length" -> BInt(PieceLength),
        "pieces" -> BStr(pieces))))))
  }

  /** Graded torrent-metainfo parse (q341): synthesize, parse back
    * through the strict decoder, grade the recovered fields. */
  def torrentMeta(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val d = decode(metainfo(id, text)).asInstanceOf[BDict]
        val info = d("info").asInstanceOf[BDict]
        val pieces = info("pieces").asInstanceOf[BStr].v
        require(pieces.length % 20 == 0, "pieces not 20-aligned")
        (id,
          d("announce").asInstanceOf[BStr].text,
          info("length").asInstanceOf[BInt].v,
          info("name").asInstanceOf[BStr].text,
          info("piece length").asInstanceOf[BInt].v,
          (pieces.length / 20).toLong,
          pieces.map(b => (b & 0xFF).toLong).sum)
      }
      .toDF("doc_id", "announce", "length", "name", "piece_length",
        "n_pieces", "pieces_byte_sum")
  }
}
