package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class BencodeSpec extends AnyFunSuite {
  import Bencode._

  test("published encoding forms round-trip: i42e, 4:spam, l...e, " +
      "d...e with sorted keys; binary strings survive byte-exact") {
    assert(new String(encode(BInt(42)), "US-ASCII") == "i42e")
    assert(new String(encode(BInt(-7)), "US-ASCII") == "i-7e")
    assert(new String(encode(BStr("spam".getBytes)), "US-ASCII") ==
      "4:spam")
    val d = BDict(Seq(
      "bar" -> BStr("spam".getBytes),
      "foo" -> BInt(42)))
    assert(new String(encode(d), "US-ASCII") ==
      "d3:bar4:spam3:fooi42ee")
    val bin = Array.tabulate(256)(_.toByte)
    val back = decode(encode(BStr(bin))).asInstanceOf[BStr]
    assert(back.v.sameElements(bin))
    val lst = BList(Seq(BInt(1), BStr("ab".getBytes),
      BList(Seq(BInt(0)))))
    assert(decode(encode(lst)) match {
      case BList(Seq(BInt(1), s: BStr, BList(Seq(BInt(0))))) =>
        s.text == "ab"
      case _ => false
    })
  }

  test("strictness: non-canonical integers (i03e, i-0e, ie), " +
      "UNSORTED dict keys, trailing bytes and truncation all " +
      "reject loudly") {
    def bad(s: String): Unit =
      intercept[Exception](decode(s.getBytes("US-ASCII")))
    bad("i03e")
    bad("i-0e")
    bad("ie")
    bad("d3:foo1:a3:bar1:be") // foo > bar: unsorted
    bad("i1ei2e") // trailing value
    bad("5:ab") // truncated string
    bad("l i1e") // junk byte
    // sorted keys pass
    assert(decode("d1:ai1e1:bi2ee".getBytes("US-ASCII"))
      .isInstanceOf[BDict])
  }

  test("metainfo synthesis parses back with the exact piece " +
      "arithmetic, and the fixture dict is canonical (its own " +
      "strict decode accepts it)") {
    for (id <- 0L to 6L) {
      val text = "word " * (40 + id.toInt * 17)
      val d = decode(metainfo(id, text.trim)).asInstanceOf[BDict]
      val info = d("info").asInstanceOf[BDict]
      assert(info("length").asInstanceOf[BInt].v == text.trim.length)
      val pieces = info("pieces").asInstanceOf[BStr].v
      val expectPieces = (text.trim.length + 63) / 64
      assert(pieces.length == 20 * expectPieces, s"id=$id")
      assert(pieces.take(20).sameElements(pieceBytes(id, 0)))
    }
  }
}
