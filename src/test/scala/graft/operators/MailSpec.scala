package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

class MailSpec extends AnyFunSuite with SparkSessionSpec {

  test("quoted-printable round-trips arbitrary ASCII including '=', " +
      "soft line breaks keep encoded lines <= 76, and decode handles " +
      "escapes at chunk boundaries") {
    val cases = Seq("", "a", "a=b", "= == =3D",
      "x" * 200, ("word " * 40).trim,
      (0 until 127).map(_.toChar).mkString)
    cases.foreach { s =>
      val enc = Mail.qpEncode(s)
      assert(Mail.qpDecode(enc) == s, s"roundtrip of ${s.take(20)}")
      enc.split("\r\n", -1).foreach(l =>
        assert(l.length <= 76, s"line too long: ${l.length}"))
      // encoded form never contains a bare '=' except as =XX or soft
      // break — the property that keeps QP bodies boundary-safe
      var i = 0
      while (i < enc.length) {
        if (enc.charAt(i) == '=') {
          assert(enc.startsWith("=\r\n", i) ||
            (i + 2 < enc.length + 1 && i + 3 <= enc.length &&
              enc.substring(i + 1, i + 3)
                .forall(c => c.isDigit || ('A' to 'F').contains(c))))
          i += 3
        } else i += 1
      }
    }
  }

  test("RFC 2047 Q-encoded words decode ('_' = space, =XX escapes); " +
      "plain subjects pass through") {
    assert(Mail.decodeWord("=?US-ASCII?Q?Report=5F42?=") == "Report_42")
    assert(Mail.decodeWord("=?us-ascii?q?a_b=3Dc?=") == "a b=c")
    assert(Mail.decodeWord("Report 42") == "Report 42")
  }

  test("header unfolding: continuation lines rejoin their parent " +
      "with one space; a leading continuation fails loud") {
    val h = Mail.parseHeaders(
      "To: a@x.com,\r\n b@y.com,\r\n\tc@z.com\r\nSubject: s")
    assert(h("to") == "a@x.com, b@y.com, c@z.com")
    assert(h("subject") == "s")
    intercept[IllegalArgumentException](
      Mail.parseHeaders(" orphan continuation"))
  }

  test("the full message parses back: part census, decoded payloads, " +
      "attachment bytes exact — and the QP text part can NEVER " +
      "contain the boundary (its '=' is escaped)") {
    for (id <- 0L to 7L) {
      val text = s"the quick = brown fox $id jumps " * 10
      val raw = Mail.mimeMessage(id, text.trim)
      val (hdrs, parts) = Mail.parseMessage(raw)
      assert(parts.size == 2 + (id % 2).toInt, s"id=$id")
      val plain = parts.find(_.headers("content-type")
        .startsWith("text/plain")).get
      assert(plain.body == text.trim, s"id=$id text")
      assert(Mail.decodeWord(hdrs("subject")) ==
        (if (id % 3 == 0) s"Report_$id" else s"Report $id"))
      if (id % 2 == 1) {
        val att = parts.find(_.headers("content-type")
          .startsWith("application/octet-stream")).get
        assert(att.body.toCharArray.map(_.toInt & 0xFF).toSeq ==
          Mail.attachmentBytes(id).map(_ & 0xFF).toSeq, s"id=$id att")
      }
      // boundary-safety: the encoded text part cannot collide with
      // the boundary marker because QP escapes '='
      val boundary = s"----=_graft_$id"
      assert(!Mail.qpEncode(s"evil $boundary evil").contains(boundary))
    }
  }

  test("malformed messages fail loud, never wrong: missing closing " +
      "boundary, unknown transfer encoding, boundary not on its own " +
      "line") {
    val good = Mail.mimeMessage(4L, "hello world")
    intercept[RuntimeException](
      Mail.parseMessage(good.replace("----=_graft_4--", "nope")))
    intercept[RuntimeException](Mail.parseMessage(
      good.replace("quoted-printable", "uuencode")))
    intercept[RuntimeException](
      Mail.parseMessage("Subject: x\r\n\r\nno content type"))
  }

  test("graded frame matches the synthesis arithmetic on the fixture " +
      "corpus (the oracle's census, computed Spark-side)") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Mail.mimeParse(docs).collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_parts") == 2 + id % 2)
      assert(r.getAs[Long]("n_recipients") == 1 + id % 3)
      assert(r.getAs[Boolean]("html_ok") && r.getAs[Boolean]("valid"))
      assert(r.getAs[Long]("att_n_bytes") ==
        (if (id % 2 == 1) 16 + id % 32 else 0L))
    }
  }
}
