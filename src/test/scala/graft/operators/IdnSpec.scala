package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q297 RFC 3492 punycode codec: the widely-published
  * anchor pairs, decode∘encode identity across scripts, ASCII
  * idempotence, and loud rejection of malformed ACE labels. */
class IdnSpec extends AnyFunSuite with SparkSessionSpec {

  test("published anchor pairs hold in BOTH directions") {
    val anchors = Seq(
      "bücher" -> "bcher-kva",
      "münchen" -> "mnchen-3ya",
      "mañana" -> "maana-pta",
      "köln" -> "kln-sna")
    for ((uni, ace) <- anchors) {
      assert(Idn.punycodeEncode(uni) == ace, s"encode $uni")
      assert(Idn.punycodeDecode(ace) == uni, s"decode $ace")
    }
  }

  test("decode∘encode is the identity across scripts, label " +
      "positions, and basic/non-basic mixes") {
    val labels = Seq(
      "ünicode", "αβγδε", "москва", "例え", "中文测试",
      "mixedΩend", "Ωstart", "a-b-ü", "üüü", "x7ü9z",
      "ñandú", "tūdaliņ")
    for (l <- labels) {
      val ace = Idn.punycodeEncode(l)
      assert(ace.codePoints().allMatch(_ < 128), s"$l -> $ace ascii")
      assert(Idn.punycodeDecode(ace) == l, s"round-trip $l via $ace")
    }
  }

  test("host-level mapping: ASCII labels pass through untouched " +
      "(idempotent), IDN labels gain xn--, and the two spellings " +
      "of one host collapse to one ACE key") {
    assert(Idn.toAsciiHost("www.example.com") == "www.example.com")
    assert(Idn.toAsciiHost("shop.köln.de") == "shop.xn--kln-sna.de")
    assert(Idn.toUnicodeHost("shop.xn--kln-sna.de") == "shop.köln.de")
    // collapse: unicode spelling and ACE spelling -> same key
    assert(Idn.toAsciiHost("münchen.example.com") ==
      Idn.toAsciiHost(Idn.toUnicodeHost("xn--mnchen-3ya.example.com")))
    // double application is stable
    val a = Idn.toAsciiHost("bücher.de")
    assert(Idn.toAsciiHost(a) == a)
  }

  test("malformed ACE labels fail LOUD: invalid digit, truncated " +
      "run, non-basic basic part") {
    intercept[RuntimeException](Idn.punycodeDecode("abc-д"))
    intercept[RuntimeException](Idn.punycodeDecode("kln-sn~"))
    // a lone final digit that promises more (t <= digit) truncates
    intercept[RuntimeException](Idn.punycodeDecode("kln-z"))
  }

  test("RFC 3492 §6.4 overflow guards fire LOUD on adversarially " +
      "long digit runs (r15 ADVICE: i += digit*w / w *= Base-t must " +
      "never wrap Int into a silent wrong decode)") {
    // a run of max digits ('9' = 35 >= every threshold t) keeps the
    // inner loop multiplying w by ~(36-t) — Int wraps within ~8
    // digits unguarded; the guard must reject, not decode
    val e1 = intercept[IllegalArgumentException](
      Idn.punycodeDecode("a-" + "9" * 24))
    assert(e1.getMessage.contains("overflow"))
    val e2 = intercept[IllegalArgumentException](
      Idn.punycodeDecode("z9" * 40)) // delimiter-free: all extended
    assert(e2.getMessage.contains("overflow") ||
      e2.getMessage.contains("punycode"))
    // well-formed labels still decode after the guards
    assert(Idn.punycodeDecode("mnchen-3ya") == "münchen")
  }

  test("q297 frame: computed ACE forms equal the oracle's literal " +
      "expectations and every round-trip closes") {
    import spark.implicits._
    val out = Idn.idnHosts((0L until 12L).toDF("doc_id")).collect()
    assert(out.length == 12)
    for (r <- out) {
      assert(r.getAs[Boolean]("roundtrip_ok"),
        s"round-trip failed for ${r.getAs[String]("host")}")
      val idn = r.getAs[Boolean]("is_idn")
      assert(idn == (r.getAs[String]("host") !=
        r.getAs[String]("ascii_host")))
    }
    val byHost = out.map(r => r.getAs[String]("host") ->
      r.getAs[String]("ascii_host")).toMap
    assert(byHost("münchen.example.com") ==
      "xn--mnchen-3ya.example.com")
    assert(byHost("mañana.example.org") ==
      "xn--maana-pta.example.org")
  }
}
