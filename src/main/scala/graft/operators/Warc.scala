package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WARC response-record parsing (q247) + the full web-corpus funnel
  * (q248) — the stage one EARLIER than q239's HTML extraction: real
  * web corpora (CommonCrawl-shaped) arrive as WARC captures, and
  * everything downstream (HTML extract → boilerplate → quality)
  * assumes someone already unwrapped the record framing and the HTTP
  * envelope. Reference N/A (no web fetches in the taxi stream) — an
  * LLM-pipeline operator like q239/q243.
  *
  * The PARSED SUBSET, stated precisely (ISO 28500 WARC/1.0 response
  * records over ASCII content, one record per row — multi-record
  * framing by repeated Content-Length hops is pinned in the spec,
  * not graded):
  *   1. version line `WARC/1.0` terminated by CRLF — anything else
  *      marks the row invalid (never a silent wrong answer);
  *   2. WARC headers (`Name: value` CRLF lines, names matched
  *      case-insensitively per the spec) up to the first blank line;
  *      WARC-Target-URI, WARC-Date and Content-Length are read;
  *   3. the record BLOCK is exactly Content-Length octets after the
  *      blank line, followed by the record separator CRLF CRLF —
  *      the total-length equation is CHECKED and mismatches mark
  *      the row invalid (content is ASCII by contract, so octet
  *      length == char length — stated, and true of the fixture);
  *   4. a response block is an HTTP/1.x message: status code from
  *      the status line, Content-Type from the HTTP headers
  *      (case-insensitive), payload = everything after the HTTP
  *      blank line.
  *
  * The graded input is SYNTHESIZED per doc_id (the q239/q243
  * discipline): a deterministic capture URL + date, an HTTP 200
  * text/html response wrapping [[HtmlExtract.htmlWrapCol]]'s markup
  * for most rows, and an HTTP 404 text/plain response for the
  * doc_id % 13 == 0 rows — so the funnel's status/type gates do real
  * work on every run. The q248 funnel composes the whole web chain
  * end to end: WARC parse → keep valid 200 text/html → q239's
  * extraction kernel → flatten → q6 quality score.
  *
  * Scale design (100 TB): both operators are ONE row-local
  * projection each (substring arithmetic + the q239 regexp chain —
  * codegen'd functions, no UDF, no shuffle, no state); a capture
  * never crosses an exchange, and the funnel output carries stats
  * and digests, never the payload. */
object Warc {

  private val CRLF = "\r\n"
  private val Sep = "\r\n\r\n"

  /** Deterministic capture URL of the fixture. */
  private def urlCol(d: Column): Column =
    concat(lit("https://site"), (d % 7).cast("string"),
      lit(".example.com/doc"), d.cast("string"))

  /** Deterministic WARC-Date of the fixture (zero-padded). */
  private def dateCol(d: Column): Column =
    concat(lit("2024-01-"), lpad((d % 28 + 1).cast("string"), 2, "0"),
      lit("T"), lpad((d % 24).cast("string"), 2, "0"), lit(":00:00Z"))

  /** The HTTP response block: 200 text/html wrapping the q239
    * markup, or 404 text/plain on the doc_id % 13 == 0 rows. */
  private def httpBlockCol(d: Column, text: Column): Column = {
    val ok = concat(
      lit("HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF),
      lit("X-Served-By: w"), (d % 3).cast("string"), lit(CRLF + CRLF),
      HtmlExtract.htmlWrapCol(d, text))
    val notFound = concat(
      lit("HTTP/1.1 404 Not Found" + CRLF +
        "Content-Type: text/plain" + CRLF + CRLF + "not found "),
      d.cast("string"))
    when(d % 13 === 0, notFound).otherwise(ok)
  }

  /** One synthesized WARC/1.0 response record for a (doc_id, text)
    * row — Content-Length covers the whole HTTP block (the spec's
    * rule), and the record ends with the CRLF CRLF separator. */
  def warcFixtureCol(d: Column, text: Column): Column = {
    val block = httpBlockCol(d, text)
    concat(
      lit("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
        "WARC-Target-URI: "), urlCol(d),
      lit(CRLF + "WARC-Date: "), dateCol(d),
      lit(CRLF + "Content-Length: "),
      length(block).cast("string"),
      lit(Sep), block, lit(Sep))
  }

  /** documents → (doc_id, warc). */
  def warcRecords(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      warcFixtureCol(col("doc_id"), col("text")).as("warc"))

  /** The parse kernel over a (doc_id, warc) frame — q247's graded
    * shape plus the payload column the funnel consumes:
    * (doc_id, target_uri, warc_date, status, content_type,
    * n_payload_chars, payload_md5, valid, payload). */
  def parseWarc(records: DataFrame): DataFrame =
    parseWarcKeeping(records, Nil)

  /** [[parseWarc]] with extra pass-through columns preserved (the
    * gz path carries its blob bookkeeping through the parse without
    * a re-join — the parse stays ONE row-local projection). */
  private[graft] def parseWarcKeeping(records: DataFrame,
      keep: Seq[String]): DataFrame = {
    val kept = keep.map(col)
    val warc = col("warc")
    val version = warc.substr(lit(1), instr(warc, CRLF) - 1)
    // h = 1-based index of the header-terminating blank line
    val h = instr(warc, Sep)
    val clen = regexp_extract(warc,
      "(?i)\\r\\nContent-Length: ([0-9]+)\\r\\n", 1).cast("long")
    val block = warc.substr(h + lit(4), clen)
    val valid = version === "WARC/1.0" && h > 0 &&
      clen.isNotNull &&
      length(warc) === h + lit(7) + clen &&
      warc.substr(length(warc) - 3, lit(4)) === Sep
    val hp = instr(col("block"), Sep)
    records
      .select(kept ++ Seq(col("doc_id"), warc,
        // record_len feeds the CDX byte offsets (q251/q271), and the
        // CDX format is BYTE-addressed — octet_length, not the
        // UTF-16 char count, so the locator stays byte-accurate
        // beyond the ASCII fixture (where the two coincide)
        octet_length(warc).cast("long").as("record_len"),
        regexp_extract(warc,
          "(?i)\\r\\nWARC-Target-URI: ([^\\r]*)\\r\\n", 1)
          .as("target_uri"),
        regexp_extract(warc,
          "(?i)\\r\\nWARC-Date: ([^\\r]*)\\r\\n", 1).as("warc_date"),
        block.as("block"), valid.as("valid")): _*)
      .select(kept ++ Seq(col("doc_id"), col("target_uri"),
        col("warc_date"),
        regexp_extract(col("block"), "^HTTP/1\\.[01] ([0-9]{3}) ", 1)
          .cast("long").as("status"),
        regexp_extract(col("block"),
          "(?i)\\r\\nContent-Type: ([^\\r]*)\\r\\n", 1)
          .as("content_type"),
        col("block").substr(hp + lit(4),
          greatest(length(col("block")) - hp - lit(3), lit(0)))
          .as("payload"),
        col("valid"), col("record_len")): _*)
      .select(kept ++ Seq(col("doc_id"), col("target_uri"),
        col("warc_date"),
        col("status"), col("content_type"),
        length(col("payload")).cast("long").as("n_payload_chars"),
        md5(col("payload")).as("payload_md5"),
        col("valid"), col("payload"), col("record_len")): _*)
  }

  /** q247: documents → synthesized WARC record → parsed fields
    * (payload carried as a digest, never as output text). */
  def warcParsed(docs: DataFrame): DataFrame =
    parseWarc(warcRecords(docs)).drop("payload", "record_len")

  /** Records per synthesized WARC file — the file grouping the CDX
    * offsets are relative to (real crawls cap records per .warc.gz
    * the same way, so offset arithmetic never needs a global
    * ordering). */
  val CdxRecordsPerFile = 100L

  /** q251: the CDX(J)-style capture index — the standard web-archive
    * lookup artifact (urlkey + timestamp + locator) every wayback-
    * style reader resolves captures through. Per capture: the SURT
    * urlkey (host labels reversed and comma-joined, path appended
    * after `)`), the 14-digit timestamp from WARC-Date, original
    * URI, mime, status, payload digest, and the LOCATOR — which
    * synthesized .warc file the record lives in (doc_id-banded,
    * [[CdxRecordsPerFile]] records each) and its byte offset inside
    * that file (the running sum of the preceding records' lengths;
    * ASCII fixture, so char length == octet length — the q247
    * contract).
    *
    * Scale design (100 TB): one row-local projection plus ONE
    * window prefix-sum partitioned by warc_file — partitions are
    * bounded at [[CdxRecordsPerFile]] rows by construction (exactly
    * as real per-file offsets are file-local), so no global sort and
    * no single-reducer rank anywhere. */
  def cdxIndex(docs: DataFrame): DataFrame = {
    val fileW = Window.partitionBy(col("warc_file"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cdxProjected(warcRecords(docs))
      .withColumn("offset",
        coalesce(sum(col("record_len")).over(fileW), lit(0L)))
  }

  /** The row-local half of [[cdxIndex]] — everything except the
    * offset assignment (shared with the streaming twin, which folds
    * offsets from per-file state instead of a window). */
  private[graft] def cdxProjected(records: DataFrame): DataFrame = {
    val host = regexp_extract(col("target_uri"), "^https://([^/]+)/", 1)
    val path = regexp_extract(col("target_uri"), "^https://[^/]+(/.*)$", 1)
    parseWarc(records)
      .withColumn("urlkey",
        concat(array_join(reverse(split(host, "\\.")), ","),
          lit(")"), path))
      .withColumn("ts14",
        regexp_replace(col("warc_date"), "[-T:Z]", ""))
      .withColumn("warc_file",
        concat(lit("crawl-"),
          lpad(floor(col("doc_id") / CdxRecordsPerFile)
            .cast("string"), 5, "0"),
          lit(".warc")))
      .select(col("doc_id"), col("urlkey"), col("ts14"),
        col("target_uri").as("original"),
        col("content_type").as("mime"), col("status"),
        col("payload_md5").as("digest"), col("record_len"),
        col("warc_file"))
  }

  /** q301: the CDX index USED — a wayback-style RANGE FETCH: build
    * each synthesized .warc file (its records back to back in
    * doc_id order, exactly the layout the q251 offsets address),
    * then for every CDX row slice the file at
    * [offset, offset + record_len) and parse THE SLICE with the
    * q247 kernel. `fetched_ok` demands the sliced record's payload
    * digest equal the CDX row's own digest AND the parse be valid —
    * one byte of locator error (the exact defect the r15
    * octet_length fix removed) flips it. Scale design: file
    * assembly is a bounded rollup ([[CdxRecordsPerFile]] records
    * per group); the fetch join is keyed by warc_file. */
  def cdxRangeFetch(docs: DataFrame): DataFrame = {
    val idx = cdxIndex(docs)
    val files = warcRecords(docs)
      .withColumn("warc_file",
        concat(lit("crawl-"),
          lpad(floor(col("doc_id") / CdxRecordsPerFile)
            .cast("string"), 5, "0"),
          lit(".warc")))
      .groupBy(col("warc_file"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id"), col("warc")))),
        r => r.getField("warc")), "").as("blob"))
    val sliced = idx
      .join(files, Seq("warc_file"))
      .select(col("doc_id"),
        col("warc_file"), col("offset"),
        col("record_len").as("cdx_record_len"),
        col("digest").as("cdx_digest"),
        col("blob").substr(col("offset") + 1, col("record_len"))
          .as("warc"))
    // the parse recomputes record_len from the SLICE; fetched_ok
    // additionally demands it equal the index's own length
    parseWarcKeeping(sliced,
      Seq("warc_file", "offset", "cdx_record_len", "cdx_digest"))
      .select(col("doc_id"), col("warc_file"), col("offset"),
        col("record_len"), col("status"), col("payload_md5"),
        (col("valid") && col("payload_md5") === col("cdx_digest") &&
          col("record_len") === col("cdx_record_len"))
          .as("fetched_ok"))
  }

  /** Snapshots per URL in the q252 recrawl fixture. */
  val RevisitRuns = 2

  /** q252: WARC revisit records — the crawl-side content dedup the
    * WARC spec defines (a recapture whose payload digest matches a
    * prior capture of the same URI is stored as a `revisit` record
    * referring to the original, saving the payload bytes). The
    * fixture is a two-run recrawl of every page: run 1 recaptures
    * run 0's text unchanged except on the doc_id % 3 == 0 pages
    * (edited between crawls), so both outcomes occur on every run.
    * Per capture: (doc_id, run, target_uri, capture_ts, digest,
    * record_type response|revisit, saved_chars).
    *
    * Scale design (100 TB): the only non-row-local step is the
    * per-URI first-capture digest — a window partitioned by doc_id
    * whose partitions are bounded at [[RevisitRuns]] rows (the
    * recrawl depth, an operator constant), never corpus-sized. */
  def warcRevisits(docs: DataFrame): DataFrame = {
    val runW = Window.partitionBy(col("doc_id")).orderBy(col("run"))
    docs
      .select(col("doc_id"),
        explode(array((0 until RevisitRuns).map(lit): _*)).as("run"),
        col("text"))
      .withColumn("snap_text",
        when(col("run") > 0 && col("doc_id") % 3 === 0,
          concat(col("text"), lit(" updated v2")))
          .otherwise(col("text")))
      .withColumn("digest", md5(col("snap_text")))
      .withColumn("first_digest", first(col("digest")).over(runW))
      .select(col("doc_id"), col("run").cast("long").as("run"),
        urlCol(col("doc_id")).as("target_uri"),
        concat(lit("2024-02-0"), (col("run") + 1).cast("string"),
          lit("T00:00:00Z")).as("capture_ts"),
        col("digest"),
        when(col("run") > 0 && col("digest") === col("first_digest"),
          lit("revisit")).otherwise(lit("response"))
          .as("record_type"),
        when(col("run") > 0 && col("digest") === col("first_digest"),
          length(col("snap_text")).cast("long")).otherwise(lit(0L))
          .as("saved_chars"))
  }

  /** q278: wayback-style closest-capture lookup — THE web-archive
    * read path: given (URI, wanted time), serve the capture whose
    * timestamp is temporally closest (ties to the earlier capture —
    * the struct-min tie-break, stated). Captures are the q252
    * two-run recrawl on a relative clock (run r at r·86400 s);
    * each URI is queried at (doc_id % 3)·43200 s, so all three
    * regimes occur on every run: clearly-run-0, the exact midpoint
    * tie (earlier wins), and clearly-run-1.
    *
    * Scale design (100 TB): one equi-join on the URI key and a
    * per-URI struct-min rollup bounded at the capture count — the
    * lookup shards with the archive, no sort, no window. */
  def waybackLookup(docs: DataFrame): DataFrame = {
    val caps = docs
      .select(col("doc_id"),
        explode(array((0 until RevisitRuns).map(lit): _*)).as("run"),
        col("text"))
      .withColumn("snap_text",
        when(col("run") > 0 && col("doc_id") % 3 === 0,
          concat(col("text"), lit(" updated v2")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("run").cast("long").as("run"),
        (col("run") * 86400L).as("cap_ts"),
        md5(col("snap_text")).as("digest"))
    val queries = docs.select(col("doc_id"),
      ((col("doc_id") % 3) * 43200L).as("q_ts"))
    queries.join(caps, Seq("doc_id"))
      .withColumn("dt_s", abs(col("cap_ts") - col("q_ts")))
      .groupBy(col("doc_id"), col("q_ts"))
      .agg(min(struct(col("dt_s").as("dt"), col("run").as("run"),
        col("cap_ts").as("ts"), col("digest").as("dg"))).as("m"))
      .select(col("doc_id"), urlCol(col("doc_id")).as("target_uri"),
        col("q_ts"), col("m.run").as("best_run"),
        col("m.ts").as("best_ts"), col("m.dt").as("dt_s"),
        col("m.dg").as("digest"))
  }

  /** Snapshots per URL in the q276 adaptive-recrawl fixture. */
  val RecrawlRuns = 4

  /** Snapshots per URL in the q324 novelty fixture. */
  val NoveltyRuns = 4

  /** q324: CROSS-SNAPSHOT novelty rate — the curation metric behind
    * "how much NEW content did this crawl actually bring": per
    * (url, snapshot), the fraction of paragraph hashes never seen
    * in any EARLIER snapshot of the same url. The fixture gives
    * every doc 3 base paragraphs (real text thirds, index-prefixed
    * so short docs cannot alias), each snapshot ADDS one paragraph,
    * and snapshot 2 REWRITES paragraph 0 for doc_id ≡ 0 (mod 4)
    * docs — so the metric must distinguish additions from edits.
    * first-seen is a (doc, hash)-keyed min(run) rollup joined back
    * — bounded at runs × paragraphs per doc, no window, no
    * corpus-sized state. (doc_id, run, n_paras, n_novel, novelty).
    * The oracle re-derives the counts from the fixture structure
    * (hashes of DISTINCT texts are distinct). */
  def snapshotNovelty(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val n = size(w)
    val third = floor(n / lit(3.0)).cast("int")
    def basePara(j: Int): Column = {
      val from = lit(j) * third + 1
      val len = if (j == 2) n - lit(2) * third else third
      concat(lit(s"p$j:"), array_join(slice(w, from, len), " "))
    }
    val paras = docs.select(col("doc_id"), col("text"))
      .select(col("doc_id"),
        explode(array((0 until NoveltyRuns).map(lit): _*)).as("run"),
        col("text"))
      .select(col("doc_id"), col("run"),
        posexplode(array(
          (0 until 3).map(basePara) ++
            (3 until 3 + NoveltyRuns).map(j =>
              concat(lit(s"added $j to "),
                col("doc_id").cast("string"))): _*))
          .as(Seq("para_idx", "ptext")))
      // snapshot r carries base paragraphs + the first r additions
      .filter(col("para_idx") < col("run") + 3)
      // the snapshot-2 rewrite of paragraph 0
      .withColumn("ptext",
        when(col("para_idx") === 0 && col("run") >= 2 &&
          col("doc_id") % 4 === 0,
          concat(col("ptext"), lit(" (rev2)")))
          .otherwise(col("ptext")))
      .withColumn("phash", md5(col("ptext")))
    val firstSeen = paras.groupBy(col("doc_id"), col("phash"))
      .agg(min(col("run")).as("first_run"))
    paras.join(firstSeen, Seq("doc_id", "phash"))
      .groupBy(col("doc_id"), col("run"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("first_run") === col("run"), 1L)
          .otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("run").cast("long").as("run"),
        col("n_paras"), col("n_novel"),
        (col("n_novel").cast("double") /
          col("n_paras").cast("double")).as("novelty"))
  }

  /** q276: adaptive recrawl scheduling — the freshness policy of
    * the crawl literature (Cho & Garcia-Molina): pages that change
    * often get short revisit intervals, static pages long ones. The
    * fixture is a [[RecrawlRuns]]-run recrawl whose edits ACCUMULATE
    * (snapshot r carries every edit made at runs ≤ r, edits planted
    * by (doc·7 + run·3) % 5 < 2 so per-URL change counts span
    * 0..3); the operator derives changes from payload DIGESTS (the
    * signal a real store has — lag-compare per URL), estimates the
    * change rate, and assigns the next interval
    * floor(24 / (2·rate + 0.5)) hours — 48 h for static pages down
    * to 9.6 h for always-changing ones.
    *
    * Scale design (100 TB): the digest lag window is per-URL and
    * bounded at [[RecrawlRuns]] rows; the rollup is one
    * map-side-combined URL-keyed aggregation. */
  def recrawlSchedule(docs: DataFrame): DataFrame = {
    val runW = Window.partitionBy(col("doc_id")).orderBy(col("run"))
    docs
      .select(col("doc_id"),
        explode(array((0 until RecrawlRuns).map(lit): _*)).as("run"),
        col("text"))
      .withColumn("snap_text", concat(col("text"),
        // sequence(1, 0) DESCENDS in Spark, so the run-0 range is
        // built 0-based and the k >= 1 bound lives in the filter
        array_join(transform(
          filter(sequence(lit(0), col("run")), k =>
            k >= 1 && (col("doc_id") * 7 + k * 3) % 5 < 2),
          k => concat(lit(" edit "), k.cast("string"))), "")))
      .withColumn("digest", md5(col("snap_text")))
      .withColumn("changed",
        (col("run") > 0 &&
          col("digest") =!= lag(col("digest"), 1).over(runW))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_captures"),
        sum(col("changed")).as("n_changes"))
      .select(col("doc_id"), urlCol(col("doc_id")).as("target_uri"),
        col("n_captures"), col("n_changes"),
        (col("n_changes").cast("double") /
          (RecrawlRuns - 1).toDouble).as("change_rate"),
        floor(lit(24.0) /
          (lit(2.0) * (col("n_changes").cast("double") /
            (RecrawlRuns - 1).toDouble) + lit(0.5)))
          .cast("long").as("next_interval_h"))
  }

  /** q250: the per-host crawl-health report — the rollup a crawl
    * operator reads per ingest batch, composed from q247's parse and
    * q248's funnel: captures, ok-rate (valid 200 text/html), payload
    * volume, extracted line totals, and the MEAN quality of the ok
    * pages. The mean rides the q231 exact-sum discipline: per-doc
    * quality (a bit-identical fixed-order double in both engines)
    * quantizes to 2^0-scaled MICROS longs (floor(q·10⁶ + 0.5)), the
    * sum is an exact order-free integer, and the mean is one
    * fixed-order division — never a shuffle-ordered double sum.
    *
    * Scale design (100 TB): two row-local passes over the captures
    * (parse; parse+extract — scan-cost, stated) and ONE host-keyed
    * map-side-combined rollup; hosts are dimension-sized. */
  def webHostReport(docs: DataFrame): DataFrame = {
    val parsed = parseWarc(warcRecords(docs))
      .withColumn("host",
        regexp_extract(col("target_uri"), "^https://([^/]+)/", 1))
    val ok = col("valid") && col("status") === 200 &&
      col("content_type") === "text/html"
    val f = webFunnel(docs)
      .select(col("doc_id"), col("n_lines"),
        floor(col("quality_score") * 1000000.0 + 0.5).cast("long")
          .as("qmicros"))
    parsed
      .join(f, Seq("doc_id"), "left")
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_captures"),
        sum(ok.cast("long")).as("n_ok"),
        sum(when(ok, col("n_payload_chars")).otherwise(0L))
          .as("sum_payload_chars"),
        sum(coalesce(col("n_lines"), lit(0L))).as("n_lines_total"),
        sum(coalesce(col("qmicros"), lit(0L))).as("qsum"))
      .select(col("host"), col("n_captures"), col("n_ok"),
        col("sum_payload_chars"), col("n_lines_total"),
        when(col("n_ok") > 0,
          col("qsum").cast("double") / 1000000.0 / col("n_ok"))
          .otherwise(lit(null).cast("double")).as("mean_quality"))
  }

  // ---------------------------------------------------------------
  // multi-record gzip framing (q290/q291) — the subset the q247
  // scaladoc pinned but did not grade: real CommonCrawl .warc.gz
  // files are CONCATENATED GZIP MEMBERS (one record per member),
  // and a reader that can only handle one record per blob hits
  // this on its first real crawl file
  // ---------------------------------------------------------------

  /** Response records packed per synthesized .warc.gz blob (plus
    * one warcinfo record every blob carries and a reader must
    * skip). */
  val GzRecordsPerBlob = 3L

  /** One gzip member (a complete gzip stream) for a record's
    * bytes. */
  private def gzMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Decompress a whole concatenated-member gzip stream (JDK
    * GZIPInputStream reads across member boundaries natively). */
  private def gunzipAll(gz: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** The warcinfo record of a blob — the non-response record a
    * reader must hop over without emitting. */
  private def warcinfoRecord(blobId: Long): String = {
    val body = s"software: graft\r\nblob: $blobId\r\n"
    "WARC/1.0" + CRLF + "WARC-Type: warcinfo" + CRLF +
      s"WARC-Date: 2024-01-01T00:00:00Z" + CRLF +
      s"Content-Length: ${body.length}" + Sep + body + Sep
  }

  /** documents → (blob_id, gz): [[GzRecordsPerBlob]] consecutive
    * docs' response records (built by the SAME column arithmetic as
    * q247, so no fixture drift) plus the leading warcinfo record,
    * each record its own gzip member, members concatenated — the
    * CommonCrawl file shape. Blob assembly is one bounded
    * collect_list per blob (≤ [[GzRecordsPerBlob]] rows by
    * construction). */
  def warcGzBlobs(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    warcRecords(docs)
      .groupBy(floor(col("doc_id") / GzRecordsPerBlob).as("blob_id"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("warc")))).as("rs"))
      .as[(Long, Seq[(Long, String)])]
      .map { case (blobId, rs) =>
        val members = warcinfoRecord(blobId) +: rs.map(_._2)
        (blobId,
          members.map(r => gzMember(r.getBytes("ISO-8859-1")))
            .reduce(_ ++ _))
      }
      .toDF("blob_id", "gz")
  }

  /** The REAL reader: gunzip the whole blob, then hop records by
    * repeated Content-Length jumps (the ISO 28500 total-length
    * equation), skipping non-response records. Emits one row per
    * RESPONSE record: (blob_id, rec_idx 1-based in read order,
    * n_records incl. skipped, n_skipped, warc). Framing is done on
    * an ISO-8859-1 view (1 byte = 1 char, so the char arithmetic IS
    * octet arithmetic for arbitrary payload bytes). Malformed
    * framing fails LOUD (a wrong hop would silently shear every
    * later record in the file). */
  def warcGzRecords(blobs: DataFrame): DataFrame = {
    import blobs.sparkSession.implicits._
    val clenRe = "(?i)\\r\\nContent-Length: ([0-9]+)".r
    val typeRe = "(?i)\\r\\nWARC-Type: ([^\\r]*)".r
    blobs.select(col("blob_id"), col("gz"))
      .as[(Long, Array[Byte])]
      .flatMap { case (blobId, gz) =>
        val text = new String(gunzipAll(gz), "ISO-8859-1")
        val recs = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 0
        var n = 0L
        var skipped = 0L
        while (pos < text.length) {
          val hEnd = text.indexOf(Sep, pos)
          require(hEnd >= 0, s"blob $blobId: unterminated header")
          val header = text.substring(pos, hEnd)
          val clen = clenRe.findFirstMatchIn(header)
            .getOrElse(sys.error(
              s"blob $blobId: record without Content-Length"))
            .group(1).toInt
          val recEnd = hEnd + 4 + clen + 4
          require(recEnd <= text.length &&
            text.substring(recEnd - 4, recEnd) == Sep,
            s"blob $blobId: record separator missing at $recEnd")
          n += 1
          val wtype = typeRe.findFirstMatchIn(header)
            .map(_.group(1)).getOrElse("")
          if (wtype == "response") recs += text.substring(pos, recEnd)
          else skipped += 1
          pos = recEnd
        }
        recs.zipWithIndex.map { case (rec, i) =>
          (blobId, i + 1L, n, skipped, rec)
        }
      }
      .toDF("blob_id", "rec_idx", "n_records", "n_skipped", "warc")
  }

  /** q290: documents → .warc.gz blobs → member-wise gunzip +
    * Content-Length hops → the q247 parse kernel, identity
    * recovered FROM THE RECORD (the capture URL), never threaded
    * through: (doc_id, blob_id, rec_idx, n_records, n_skipped,
    * parsed fields). Scale design (100 TB): blob assembly is the
    * fixture; the READ path is one row-local flatMap per blob +
    * the row-local parse — a real crawl file never crosses an
    * exchange. */
  def warcGzParsed(docs: DataFrame): DataFrame = {
    val recs = warcGzRecords(warcGzBlobs(docs))
      .withColumn("doc_id",
        regexp_extract(col("warc"),
          "WARC-Target-URI: https://site[0-9]+\\.example\\.com/doc([0-9]+)\\r",
          1).cast("long"))
    parseWarcKeeping(recs,
      Seq("blob_id", "rec_idx", "n_records", "n_skipped"))
      .select(col("doc_id"), col("blob_id"), col("rec_idx"),
        col("n_records"), col("n_skipped"), col("target_uri"),
        col("warc_date"), col("status"), col("content_type"),
        col("n_payload_chars"), col("payload_md5"), col("valid"))
  }

  /** q291: the q248 funnel fed from the GZIP path — proof the
    * multi-record framing composes: gunzip + hop + parse, then the
    * identical keep/extract/score stages; the output must EQUAL
    * q248's row for row (same oracle). */
  def webFunnelFromGz(docs: DataFrame): DataFrame = {
    val recs = warcGzRecords(warcGzBlobs(docs))
      .withColumn("doc_id",
        regexp_extract(col("warc"),
          "WARC-Target-URI: https://site[0-9]+\\.example\\.com/doc([0-9]+)\\r",
          1).cast("long"))
    webFunnelStages(parseWarc(recs))
  }

  /** q248: the FULL web funnel — WARC parse → keep valid HTTP 200
    * text/html captures → the q239 extraction kernel → flatten →
    * q6 quality score: (doc_id, n_lines, n_chars, quality_score). */
  def webFunnel(docs: DataFrame): DataFrame =
    webFunnelStages(parseWarc(warcRecords(docs)))

  /** q295: the STREAMING web funnel — q248's incremental twin.
    * Every stage is a row-local projection/filter, so the twin is
    * the identical [[webFunnelStages]] code applied to a streaming
    * (doc_id, warc) frame with NO state, no watermark, no holdback:
    * a capture's funnel row is final the moment it lands (exact
    * wave parity with the batch oracle). Scale design: stateless
    * append — shards with the source, nothing accumulates. */
  def streamWebFunnel(records: DataFrame): DataFrame =
    webFunnelStages(parseWarc(records))

  /** The keep → extract → score stages of [[webFunnel]] over an
    * already-parsed capture frame (shared with the gzip-path twin
    * q291 and the streaming twin q295). */
  private[graft] def webFunnelStages(parsed: DataFrame): DataFrame = {
    val kept = parsed
      .filter(col("valid") && col("status") === 200 &&
        col("content_type") === "text/html")
    val extracted = kept.select(col("doc_id"),
      HtmlExtract.htmlTextCol(col("payload")).as("text"))
    extracted.select(col("doc_id"),
      when(length(col("text")) === 0, lit(0L))
        .otherwise((length(col("text")) -
          length(regexp_replace(col("text"), "\\n", "")) + 1L)
          .cast("long")).as("n_lines"),
      length(col("text")).cast("long").as("n_chars"),
      TextAnalysis.qualityScoreCol(
        regexp_replace(col("text"), "\\n", " ")).as("quality_score"))
  }

  // ---------------------------------------------------------------
  // charset-aware payloads (q292) — the q247 ASCII contract lifted:
  // real captures carry non-ASCII bodies where octet length ≠ char
  // length, so the framing must run on OCTETS and the payload must
  // go through the q267 sniffing before any text stage sees it
  // ---------------------------------------------------------------

  /** The non-ASCII body of the q292 fixture — every character in
    * Latin-1's repertoire so ONE logical text round-trips through
    * all three encodings («, é, ° are 2-byte in UTF-8, 1-byte in
    * ISO-8859-1, 2-byte in UTF-16). */
  def intlBodyOf(id: Long): String = s"«café n° $id»"

  /** The full HTML the capture carries (meta-declared charset). */
  def intlHtmlOf(id: Long, cs: String): String =
    "<html><head><meta charset=\"" + cs + "\"></head><body>" +
      intlBodyOf(id) + "</body></html>"

  /** One complete WARC response record as BYTES for the q292
    * fixture: ASCII WARC + HTTP envelope, body encoded per
    * doc_id % 3 (UTF-8 via meta, ISO-8859-1 via meta, UTF-16LE via
    * BOM — every q267 sniffing branch), Content-Length in OCTETS
    * per the spec. */
  def warcIntlRecord(id: Long): Array[Byte] = {
    val bodyBytes = (id % 3) match {
      case 0 => intlHtmlOf(id, "utf-8").getBytes("UTF-8")
      case 1 => intlHtmlOf(id, "iso-8859-1").getBytes("ISO-8859-1")
      case _ => Array[Byte](0xFF.toByte, 0xFE.toByte) ++
        intlHtmlOf(id, "utf-16le").getBytes("UTF-16LE")
    }
    val http = ("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html" + Sep).getBytes("US-ASCII")
    val clen = http.length + bodyBytes.length
    val header = ("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      s"WARC-Target-URI: https://site${id % 7}.example.com/doc$id" +
      CRLF + s"Content-Length: $clen" + Sep).getBytes("US-ASCII")
    header ++ http ++ bodyBytes ++ Sep.getBytes("US-ASCII")
  }

  // ---------------------------------------------------------------
  // HTTP body codings (q298/q299) — the two transfer shapes a real
  // capture carries that the plain q247 parse cannot see through:
  // Content-Encoding: gzip bodies and Transfer-Encoding: chunked
  // framing. Both decoders are row-local; the PROOF is digest
  // equality with q247's plain payload for the same document.
  // ---------------------------------------------------------------

  /** One WARC record whose HTTP body is GZIPPED (Content-Encoding:
    * gzip), as bytes — octet-accurate Content-Length per the
    * spec. */
  private def warcGzipBodyRecord(id: Long,
      html: String): Array[Byte] = {
    val body = gzMember(html.getBytes("US-ASCII"))
    val http = ("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html" + CRLF +
      "Content-Encoding: gzip" + Sep).getBytes("US-ASCII")
    val clen = http.length + body.length
    val header = ("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      s"WARC-Target-URI: https://site${id % 7}.example.com/doc$id" +
      CRLF + s"Content-Length: $clen" + Sep).getBytes("US-ASCII")
    header ++ http ++ body ++ Sep.getBytes("US-ASCII")
  }

  /** zlib-wrapped DEFLATE (the HTTP `deflate` coding per RFC 9110 —
    * a zlib stream, not raw deflate). */
  private def zlibDeflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def zlibInflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished(),
        "deflate: truncated or malformed zlib stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** One WARC record whose HTTP body is a zlib DEFLATE stream
    * (Content-Encoding: deflate). */
  private def warcDeflateBodyRecord(id: Long,
      html: String): Array[Byte] = {
    val body = zlibDeflate(html.getBytes("US-ASCII"))
    val http = ("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html" + CRLF +
      "Content-Encoding: deflate" + Sep).getBytes("US-ASCII")
    val clen = http.length + body.length
    val header = ("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      s"WARC-Target-URI: https://site${id % 7}.example.com/doc$id" +
      CRLF + s"Content-Length: $clen" + Sep).getBytes("US-ASCII")
    header ++ http ++ body ++ Sep.getBytes("US-ASCII")
  }

  /** One WARC record whose HTTP body is CHUNKED (Transfer-Encoding:
    * chunked): hex-size lines, [[ChunkSize]]-byte chunks, the
    * 0-chunk terminator. */
  val ChunkSize = 100

  /** Apply the chunked transfer coding to arbitrary octets:
    * hex-size lines, [[ChunkSize]]-byte chunks, the 0-chunk
    * terminator. */
  private def chunkify(bytes: Array[Byte]): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < bytes.length) {
      val n = math.min(ChunkSize, bytes.length - pos)
      sb.write(s"${n.toHexString}\r\n".getBytes("US-ASCII"))
      sb.write(bytes, pos, n)
      sb.write(CRLF.getBytes("US-ASCII"))
      pos += n
    }
    sb.write("0\r\n\r\n".getBytes("US-ASCII"))
    sb.toByteArray
  }

  private def warcChunkedRecord(id: Long,
      html: String): Array[Byte] = {
    val body = chunkify(html.getBytes("US-ASCII"))
    val http = ("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html" + CRLF +
      "Transfer-Encoding: chunked" + Sep).getBytes("US-ASCII")
    val clen = http.length + body.length
    val header = ("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      s"WARC-Target-URI: https://site${id % 7}.example.com/doc$id" +
      CRLF + s"Content-Length: $clen" + Sep).getBytes("US-ASCII")
    header ++ http ++ body ++ Sep.getBytes("US-ASCII")
  }

  /** One WARC record whose HTTP body carries an IDENTITY payload —
    * the uncoded control shape of the q316 mix. */
  private def warcIdentityRecord(id: Long,
      html: String): Array[Byte] = {
    val body = html.getBytes("US-ASCII")
    val http = ("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html" + Sep).getBytes("US-ASCII")
    val clen = http.length + body.length
    val header = ("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      s"WARC-Target-URI: https://site${id % 7}.example.com/doc$id" +
      CRLF + s"Content-Length: $clen" + Sep).getBytes("US-ASCII")
    header ++ http ++ body ++ Sep.getBytes("US-ASCII")
  }

  /** One WARC record stacking BOTH codings the way the real web
    * wires them (RFC 9112 §6 over RFC 9110 §8.4): Content-Encoding
    * gzip is a property of the REPRESENTATION (applied first);
    * Transfer-Encoding chunked frames the TRANSFER (applied last) —
    * on the wire the chunks carry gzip octets, and a decoder must
    * peel transfer-then-content or it shears. */
  private def warcChunkedGzipRecord(id: Long,
      html: String): Array[Byte] = {
    val body = chunkify(gzMember(html.getBytes("US-ASCII")))
    val http = ("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html" + CRLF +
      "Content-Encoding: gzip" + CRLF +
      "Transfer-Encoding: chunked" + Sep).getBytes("US-ASCII")
    val clen = http.length + body.length
    val header = ("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      s"WARC-Target-URI: https://site${id % 7}.example.com/doc$id" +
      CRLF + s"Content-Length: $clen" + Sep).getBytes("US-ASCII")
    header ++ http ++ body ++ Sep.getBytes("US-ASCII")
  }

  /** Byte-level record parse shared by q298/q299: returns (valid,
    * headers-view, payload bytes). */
  private def parseRecordBytes(bytes: Array[Byte])
      : (Boolean, String, Array[Byte]) = {
    val view = new String(bytes, "ISO-8859-1")
    val h = view.indexOf(Sep)
    val clen = "(?i)\\r\\nContent-Length: ([0-9]+)".r
      .findFirstMatchIn(view.substring(0, h + 2)).get.group(1).toInt
    val valid = view.startsWith("WARC/1.0\r\n") && h > 0 &&
      bytes.length == h + 8 + clen && view.endsWith(Sep)
    val block = bytes.slice(h + 4, h + 4 + clen)
    val blockView = new String(block, "ISO-8859-1")
    val hp = blockView.indexOf(Sep)
    (valid, blockView.substring(0, hp + 2),
      block.slice(hp + 4, block.length))
  }

  /** Dechunk a Transfer-Encoding: chunked body: hex size line, that
    * many octets, CRLF, repeat; the 0-chunk ends it. Malformed
    * framing fails LOUD (a mis-read size shears the rest). */
  def dechunk(body: Array[Byte]): Array[Byte] = {
    val view = new String(body, "ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    var done = false
    while (!done) {
      val nl = view.indexOf(CRLF, pos)
      require(nl >= 0, "chunked: missing size line terminator")
      val size = Integer.parseInt(view.substring(pos, nl).trim, 16)
      pos = nl + 2
      if (size == 0) done = true
      else {
        require(pos + size + 2 <= body.length,
          "chunked: chunk runs past the body")
        out.write(body, pos, size)
        require(view.substring(pos + size, pos + size + 2) == CRLF,
          "chunked: missing chunk terminator")
        pos += size + 2
      }
    }
    out.toByteArray
  }

  /** q298/q299 core: documents → html (the SAME q239 wrap column
    * q247's payload carries) → a record with the coded body →
    * byte-level parse → decode per the declared coding →
    * (doc_id, coding, n_coded_octets, n_payload_chars, payload_md5,
    * valid). payload_md5 must equal q247's digest for the same doc
    * — the oracle asserts exactly that, so the decoder is graded
    * against an INDEPENDENT plain-text reconstruction. */
  private def codedPayloadFrame(docs: DataFrame, coding: String,
      mk: (Long, String) => Array[Byte]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
      HtmlExtract.htmlWrapCol(col("doc_id"), col("text")).as("html"))
      .as[(Long, String)]
      .map { case (id, html) =>
        val bytes = mk(id, html)
        val (valid, httpHeaders, payload) = parseRecordBytes(bytes)
        val declared =
          if (httpHeaders.toLowerCase.contains("content-encoding: gzip"))
            "gzip"
          else if (httpHeaders.toLowerCase
            .contains("content-encoding: deflate")) "deflate"
          else if (httpHeaders.toLowerCase
            .contains("transfer-encoding: chunked")) "chunked"
          else "identity"
        val decoded = declared match {
          case "gzip" => gunzipAll(payload)
          case "deflate" => zlibInflate(payload)
          case "chunked" => dechunk(payload)
          case _ => payload
        }
        (id, declared, payload.length.toLong,
          new String(decoded, "US-ASCII"), valid)
      }
      .toDF("doc_id", "coding", "n_coded_octets", "t", "valid")
      .select(col("doc_id"), col("coding"), col("n_coded_octets"),
        length(col("t")).cast("long").as("n_payload_chars"),
        md5(col("t")).as("payload_md5"), col("valid"))
  }

  /** q298: gzip Content-Encoding bodies decoded back to the q247
    * payload (digest-graded against an independent plain-text
    * reconstruction; the compressed octet count is not
    * SQL-mirrorable, so it stays out of the graded frame). */
  def warcGzipBodies(docs: DataFrame): DataFrame =
    codedPayloadFrame(docs, "gzip", warcGzipBodyRecord)
      .drop("n_coded_octets")

  /** q299: chunked Transfer-Encoding bodies dechunked back to the
    * q247 payload; the CODED octet count (size lines + chunk CRLFs
    * + terminator) is exact fixture arithmetic, mirrored. */
  def warcChunkedBodies(docs: DataFrame): DataFrame =
    codedPayloadFrame(docs, "chunked", warcChunkedRecord)

  /** q302: deflate (zlib) Content-Encoding bodies inflated back to
    * the q247 payload — the OTHER standard HTTP compression coding
    * (RFC 9110 names it a zlib stream; servers that send raw
    * deflate are the web's famous interop bug, loud-rejected here
    * by the zlib header check inside Inflater). */
  def warcDeflateBodies(docs: DataFrame): DataFrame =
    codedPayloadFrame(docs, "deflate", warcDeflateBodyRecord)
      .drop("n_coded_octets")

  /** q316: the COMPOSED HTTP coding stack over a MIXED fixture —
    * per doc_id % 4 the body ships identity / gzip / chunked /
    * chunked-WRAPPING-gzip (the common real-web stack q298/q299
    * graded only separately), and the decoder peels the layers in
    * WIRE order: the transfer coding (chunked) first, then the
    * content coding (gzip) — recovering the q247 payload digest in
    * all four shapes. Headers decide the path (never the fixture
    * arithmetic), so a header/decoder disagreement flips `valid` or
    * the digest. Row-local. */
  def httpCodingStack(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
      HtmlExtract.htmlWrapCol(col("doc_id"), col("text")).as("html"))
      .as[(Long, String)]
      .map { case (id, html) =>
        val bytes = (id % 4) match {
          case 0 => warcIdentityRecord(id, html)
          case 1 => warcGzipBodyRecord(id, html)
          case 2 => warcChunkedRecord(id, html)
          case _ => warcChunkedGzipRecord(id, html)
        }
        val (valid, httpHeaders, payload) = parseRecordBytes(bytes)
        val hl = httpHeaders.toLowerCase
        val chunked = hl.contains("transfer-encoding: chunked")
        val ce =
          if (hl.contains("content-encoding: gzip")) "gzip"
          else if (hl.contains("content-encoding: deflate")) "deflate"
          else "identity"
        val afterTransfer = if (chunked) dechunk(payload) else payload
        val decoded = ce match {
          case "gzip" => gunzipAll(afterTransfer)
          case "deflate" => zlibInflate(afterTransfer)
          case _ => afterTransfer
        }
        val coding =
          if (chunked && ce != "identity") s"chunked+$ce"
          else if (chunked) "chunked"
          else ce
        (id, coding, new String(decoded, "US-ASCII"), valid)
      }
      .toDF("doc_id", "coding", "t", "valid")
      .select(col("doc_id"), col("coding"),
        length(col("t")).cast("long").as("n_payload_chars"),
        md5(col("t")).as("payload_md5"), col("valid"))
  }

  /** q330: the STREAMING twin of the composed coding stack — real
    * ingest is a stream, and every q316 stage (record synthesis,
    * parse, transfer-then-content peel, digest) is a row-local
    * projection/map, so the twin IS [[httpCodingStack]] applied to a
    * streaming (doc_id, text) frame: no state, no watermark, no
    * holdback — a capture's decoded row is final the moment it lands
    * (exact wave parity with the batch q316 oracle, pinned by
    * StreamingCodingStackSpec). Scale design: stateless append —
    * shards with the source, nothing accumulates. */
  def streamCodingStack(docs: DataFrame): DataFrame =
    httpCodingStack(docs)

  // ---------------------------------------------------------------
  // request/response pairing (q317) — the record type q290's walker
  // skips: real CommonCrawl files carry a request record per
  // capture, joined to its response by WARC-Concurrent-To
  // ---------------------------------------------------------------

  private def requestRecordId(id: Long): String =
    s"<urn:uuid:req-$id>"

  /** The REQUEST record of a capture: the HTTP request line +
    * headers as the block, WARC-Record-ID carrying the urn the
    * response's WARC-Concurrent-To cites. */
  private def warcRequestRecord(id: Long): String = {
    val body = s"GET /doc$id HTTP/1.1" + CRLF +
      s"Host: site${id % 7}.example.com" + CRLF +
      s"User-Agent: graftbot/1.0 (+crawl${id % 3})" + CRLF +
      "Accept: text/html" + Sep
    "WARC/1.0" + CRLF + "WARC-Type: request" + CRLF +
      s"WARC-Record-ID: ${requestRecordId(id)}" + CRLF +
      s"WARC-Target-URI: https://site${id % 7}.example.com/doc$id" +
      CRLF + s"Content-Length: ${body.length}" + Sep + body + Sep
  }

  /** documents → paired .warc.gz blobs: warcinfo, then per doc its
    * REQUEST record immediately followed by its RESPONSE record
    * (the q247/q290 response bytes with one added header:
    * WARC-Concurrent-To citing the request's record id) — each
    * record its own gzip member, the CC file shape. */
  def warcGzBlobsPaired(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    warcRecords(docs)
      .groupBy(floor(col("doc_id") / GzRecordsPerBlob).as("blob_id"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("warc")))).as("rs"))
      .as[(Long, Seq[(Long, String)])]
      .map { case (blobId, rs) =>
        val members = warcinfoRecord(blobId) +: rs.flatMap {
          case (id, resp) =>
            val withCt = resp.replaceFirst("\r\n",
              CRLF + "WARC-Concurrent-To: " + requestRecordId(id) +
                "\r\n")
            Seq(warcRequestRecord(id), withCt)
        }
        (blobId,
          members.map(r => gzMember(r.getBytes("ISO-8859-1")))
            .reduce(_ ++ _))
      }
      .toDF("blob_id", "gz")
  }

  /** q317: the q290 walker WIDENED to request records — gunzip +
    * Content-Length hops over the paired blob, REQUESTS parsed
    * (method, path, User-Agent from the HTTP request block) and
    * indexed by WARC-Record-ID, responses joined to their request
    * by WARC-Concurrent-To, IN-BLOB (a capture and its request
    * travel in the same file in real crawls — the join is
    * row-local, nothing crosses an exchange). One row per response:
    * the q247 parse fields plus the request metadata and the
    * `paired` proof bit. warcinfo is still skipped. */
  def warcGzPaired(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val clenRe = "(?i)\\r\\nContent-Length: ([0-9]+)".r
    val typeRe = "(?i)\\r\\nWARC-Type: ([^\\r]*)".r
    val ridRe = "(?i)\\r\\nWARC-Record-ID: ([^\\r]*)".r
    val ctRe = "(?i)\\r\\nWARC-Concurrent-To: ([^\\r]*)".r
    val reqLineRe = "\\A([A-Z]+) ([^ ]+) HTTP/1\\.1\\r\\n".r
    val uaRe = "(?i)\\r\\nUser-Agent: ([^\\r]*)".r
    val recs = warcGzBlobsPaired(docs)
      .select(col("blob_id"), col("gz"))
      .as[(Long, Array[Byte])]
      .flatMap { case (blobId, gz) =>
        val text = new String(gunzipAll(gz), "ISO-8859-1")
        val reqs = scala.collection.mutable.Map
          .empty[String, (String, String, String)]
        val resps = scala.collection.mutable.ArrayBuffer
          .empty[(String, String)] // (concurrent-to, record)
        var pos = 0
        var n = 0L
        while (pos < text.length) {
          val hEnd = text.indexOf(Sep, pos)
          require(hEnd >= 0, s"blob $blobId: unterminated header")
          val header = text.substring(pos, hEnd)
          val clen = clenRe.findFirstMatchIn(header)
            .getOrElse(sys.error(
              s"blob $blobId: record without Content-Length"))
            .group(1).toInt
          val recEnd = hEnd + 4 + clen + 4
          require(recEnd <= text.length &&
            text.substring(recEnd - 4, recEnd) == Sep,
            s"blob $blobId: record separator missing at $recEnd")
          n += 1
          val wtype = typeRe.findFirstMatchIn(header)
            .map(_.group(1)).getOrElse("")
          if (wtype == "request") {
            val rid = ridRe.findFirstMatchIn(header)
              .getOrElse(sys.error(
                s"blob $blobId: request without WARC-Record-ID"))
              .group(1)
            val block = text.substring(hEnd + 4, hEnd + 4 + clen)
            val m = reqLineRe.findFirstMatchIn(block).getOrElse(
              sys.error(s"blob $blobId: malformed request line"))
            val ua = uaRe.findFirstMatchIn(block)
              .map(_.group(1)).getOrElse("")
            reqs(rid) = (m.group(1), m.group(2), ua)
          } else if (wtype == "response") {
            val ct = ctRe.findFirstMatchIn(header)
              .map(_.group(1)).getOrElse("")
            resps += ((ct, text.substring(pos, recEnd)))
          }
          pos = recEnd
        }
        resps.map { case (ct, rec) =>
          val req = reqs.get(ct)
          (blobId, n, rec, req.isDefined,
            req.map(_._1).getOrElse(""), req.map(_._2).getOrElse(""),
            req.map(_._3).getOrElse(""))
        }
      }
      .toDF("blob_id", "n_records", "warc", "paired",
        "req_method", "req_path", "req_user_agent")
      .withColumn("doc_id",
        regexp_extract(col("warc"),
          "WARC-Target-URI: https://site[0-9]+\\.example\\.com/doc([0-9]+)\\r",
          1).cast("long"))
    parseWarcKeeping(recs,
      Seq("blob_id", "n_records", "paired", "req_method",
        "req_path", "req_user_agent"))
      .select(col("doc_id"), col("blob_id"), col("n_records"),
        col("paired"), col("req_method"), col("req_path"),
        col("req_user_agent"), col("status"),
        col("n_payload_chars"), col("payload_md5"), col("valid"))
  }

  // ---------------------------------------------------------------
  // HTTP cache/freshness planning (q322) — the RFC 9111 decision a
  // recrawler makes per URL before spending a fetch: serve cached,
  // revalidate conditionally, or refetch. Composes with q276's
  // change-rate scheduling; this is the HEADER-driven half.
  // ---------------------------------------------------------------

  /** q322: per doc a stored response's caching headers (three real
    * shapes: explicit `Cache-Control: max-age`, `Last-Modified`
    * only — the RFC 9111 §4.2.2 heuristic, lifetime = 10% of the
    * Date−Last-Modified distance — and `ETag` with no freshness
    * info at all), parsed by REGEX from the header block (headers
    * decide, never the arithmetic), the freshness lifetime and the
    * stored response's current age compared, and the plan emitted:
    * serve-cached while fresh; stale-with-validator → revalidate
    * with the right conditional header (If-None-Match beats
    * If-Modified-Since when both exist — §13.1.2); stale without
    * any validator → refetch. Row-local; the oracle re-derives the
    * arithmetic and the plan CASE. */
  def httpCachePlan(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    // synthesized stored-response header block per doc; every shape
    // carries a real Date header, the heuristic shape a real
    // Last-Modified whose distance from Date is a day-of-month
    // difference inside one month (so the parse does real RFC 822
    // field work without a calendar library)
    val maxAge = (d % 10 + 1) * 60
    val lmDay = lit(28) - (d % 27 + 1)
    val datePart = lit("Date: Fri, 28 Jun 2024 10:00:00 GMT\r\n")
    val headers = when(d % 3 === 0,
      concat(lit("HTTP/1.1 200 OK\r\n"), datePart,
        lit("Cache-Control: max-age="), maxAge.cast("string"),
        lit(", public\r\nContent-Type: text/html\r\n\r\n")))
      .when(d % 3 === 1,
        concat(lit("HTTP/1.1 200 OK\r\n"), datePart,
          lit("Last-Modified: Mon, "),
          lpad(lmDay.cast("string"), 2, "0"),
          lit(" Jun 2024 10:00:00 GMT\r\n" +
            "Content-Type: text/html\r\n\r\n")))
      .otherwise(
        concat(lit("HTTP/1.1 200 OK\r\n"), datePart,
          lit("ETag: \"v"), (d % 9).cast("string"),
          lit("\"\r\nContent-Type: text/html\r\n\r\n")))
    // stored-response current age (what a cache would compute from
    // its own clock; carried as data so the plan is deterministic)
    val ageS = when(d % 3 === 0, (d % 7) * 90L)
      .otherwise((d % 5) * 3600L)
    // ANSI-safe numeric pull: a header that is absent extracts ''
    // and must become NULL, not a cast error
    def num(pattern: String): Column = {
      val raw = regexp_extract(col("headers"), pattern, 1)
      when(raw === "", lit(null)).otherwise(raw).cast("long")
    }
    docs.select(d, headers.as("headers"), ageS.as("age_s"))
      .withColumn("max_age", num("(?i)Cache-Control: max-age=([0-9]+)"))
      .withColumn("date_day",
        num("(?i)\\r\\nDate: [A-Za-z]+, ([0-9]+) "))
      .withColumn("lm_day",
        num("(?i)Last-Modified: [A-Za-z]+, ([0-9]+) "))
      .withColumn("lm_age_s",
        when(col("lm_day").isNotNull,
          (col("date_day") - col("lm_day")) * 86400L))
      .withColumn("etag",
        regexp_extract(col("headers"), "(?i)ETag: (\"[^\"]*\")", 1))
      .withColumn("freshness_s",
        when(col("max_age").isNotNull && col("max_age") > 0,
          col("max_age"))
          .when(col("lm_age_s").isNotNull && col("lm_age_s") > 0,
            col("lm_age_s") / 10)
          .otherwise(lit(0L)))
      .withColumn("policy",
        when(col("max_age").isNotNull && col("max_age") > 0,
          lit("max-age"))
          .when(col("lm_age_s").isNotNull && col("lm_age_s") > 0,
            lit("heuristic"))
          .otherwise(lit("none")))
      .withColumn("plan",
        when(col("age_s") < col("freshness_s"), lit("serve-cached"))
          .when(length(col("etag")) > 0, lit("revalidate"))
          .when(col("policy") === "heuristic", lit("revalidate"))
          .otherwise(lit("refetch")))
      .withColumn("conditional_header",
        when(col("plan") =!= "revalidate", lit(""))
          .when(length(col("etag")) > 0,
            concat(lit("If-None-Match: "), col("etag")))
          .otherwise(concat(lit("If-Modified-Since: "),
            regexp_extract(col("headers"),
              "(?i)Last-Modified: ([^\\r]+)", 1))))
      .select(col("doc_id"), col("policy"),
        col("freshness_s").cast("long").as("freshness_s"),
        col("age_s"), col("plan"), col("conditional_header"))
  }

  /** q292: byte-level WARC parse + q267 charset sniffing composed —
    * framing on octets (an ISO-8859-1 view, 1 byte = 1 char), the
    * total-length equation checked in OCTETS, then the payload
    * BYTES sniffed and decoded by [[Charset.decode]]: (doc_id,
    * encoding, n_payload_octets, n_payload_chars, multibyte,
    * text_md5, valid). `multibyte` is the proof row: TRUE exactly
    * where octet length ≠ char length (the rows the old ASCII
    * contract would have sheared). Strictly row-local. */
  def warcIntlParsed(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val bytes = warcIntlRecord(id)
        val view = new String(bytes, "ISO-8859-1")
        val h = view.indexOf(Sep)
        val clen = "(?i)\\r\\nContent-Length: ([0-9]+)".r
          .findFirstMatchIn(view.substring(0, h + 2))
          .get.group(1).toInt
        val valid = view.startsWith("WARC/1.0\r\n") && h > 0 &&
          bytes.length == h + 8 + clen &&
          view.endsWith(Sep)
        val block = bytes.slice(h + 4, h + 4 + clen)
        val blockView = new String(block, "ISO-8859-1")
        val hp = blockView.indexOf(Sep)
        val payload = block.slice(hp + 4, block.length)
        val (enc, _, _, text) = Charset.decode(payload)
        (id, enc, payload.length.toLong, text.length.toLong,
          payload.length != text.length, text, valid)
      }
      .toDF("doc_id", "encoding", "n_payload_octets",
        "n_payload_chars", "multibyte", "t", "valid")
      .select(col("doc_id"), col("encoding"),
        col("n_payload_octets"), col("n_payload_chars"),
        col("multibyte"), md5(col("t")).as("text_md5"), col("valid"))
  }
}
