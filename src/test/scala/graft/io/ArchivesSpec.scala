package graft.io

import org.scalatest.funsuite.AnyFunSuite

class ArchivesSpec extends AnyFunSuite {

  private def entries(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map { k =>
      s"dir/part$k.txt" ->
        (s"content $k " * (k * 13 + 1)).getBytes("US-ASCII")
    }

  test("ZIP build/walk roundtrip: central-directory-driven, stored " +
      "and deflated entries, CRC-32 verified, empty files included") {
    for (n <- Seq(1, 2, 5)) {
      val es = entries(n) :+ ("empty.txt" -> Array.empty[Byte])
      val zip = Archives.buildZip(es)
      val got = Archives.walkZip(zip)
      assert(got.map(_.name) == es.map(_._1))
      got.zip(es).foreach { case (g, (_, d)) =>
        assert(g.data.sameElements(d))
      }
      // methods alternate stored/deflate
      assert(got.map(_.method) ==
        es.indices.map(i => if (i % 2 == 0) 0 else 8))
    }
  }

  test("ZIP signatures are the published PK magics and the walker " +
      "rejects corruption: flipped content byte (CRC), flipped " +
      "method, truncated archive") {
    val zip = Archives.buildZip(entries(3))
    assert(zip(0) == 'P' && zip(1) == 'K' && zip(2) == 3 && zip(3) == 4)
    val eocd = zip.length - 22
    assert(zip(eocd) == 'P' && zip(eocd + 1) == 'K' &&
      zip(eocd + 2) == 5 && zip(eocd + 3) == 6)
    // flip a stored content byte -> CRC mismatch
    val bad = zip.clone
    val dataAt = 30 + "dir/part0.txt".length
    bad(dataAt) = (bad(dataAt) ^ 1).toByte
    val e = intercept[Exception](Archives.walkZip(bad))
    assert(e.getMessage.contains("CRC"))
    intercept[Exception](Archives.walkZip(zip.take(zip.length - 4)))
    // central/local method disagreement
    val bad2 = zip.clone
    bad2(8) = (bad2(8) ^ 8).toByte // local header method field
    intercept[Exception](Archives.walkZip(bad2))
  }

  test("TAR build/walk roundtrip: ustar magic, checksum validation, " +
      "512-byte padding, zero-block terminator") {
    for (n <- Seq(1, 4)) {
      val es = entries(n)
      val tar = Archives.buildTar(es)
      assert(tar.length % 512 == 0)
      // exact size arithmetic: sum of header+padded content + 1024
      val want = es.map { case (_, d) =>
        512 + ((d.length + 511) / 512) * 512
      }.sum + 1024
      assert(tar.length == want)
      val got = Archives.walkTar(tar)
      assert(got.map(_.name) == es.map(_._1))
      got.zip(es).foreach { case (g, (_, d)) =>
        assert(g.data.sameElements(d))
      }
      assert(new String(tar, 257, 5, "US-ASCII") == "ustar")
    }
  }

  test("TAR rejects corruption loudly: bad checksum, bad magic, " +
      "truncated content") {
    val tar = Archives.buildTar(entries(2))
    val badSum = tar.clone
    badSum(0) = (badSum(0) ^ 1).toByte
    val e = intercept[Exception](Archives.walkTar(badSum))
    assert(e.getMessage.contains("checksum"))
    val badMagic = tar.clone
    badMagic(257) = 'X'.toByte
    intercept[Exception](Archives.walkTar(badMagic))
    intercept[Exception](Archives.walkTar(tar.take(600)))
  }
}
