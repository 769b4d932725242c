package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sitemap parsing (q253) + the robots-gated crawl frontier (q254)
  * — the discovery side of the web-corpus chain: q247 parses what a
  * crawler FETCHED, q249 decides what it MAY fetch, and these two
  * decide what it fetches NEXT. Reference N/A (no web fetches in the
  * taxi stream) — LLM-pipeline operators like q239/q243/q249.
  *
  * The PARSED SUBSET of the sitemap protocol (sitemaps.org 0.9),
  * stated precisely: one `<urlset>` document per row, `<url>` blocks
  * in document order, each carrying `<loc>` (required) and the
  * optional `<lastmod>`/`<changefreq>`/`<priority>` hints; entities
  * and CDATA are out of the stated subset (the fixture's URLs need
  * neither). Parsing is regexp over the block list — the non-greedy
  * constructs used are in the stated RE2/Java intersection (the
  * q239 discipline).
  *
  * The graded fixture is SYNTHESIZED per doc_id: each row is a
  * 3-entry sitemap on the doc's host (www.site{d%7}.example.com —
  * the q249 rule hosts): the doc's own page `/Cat{d%5}/page{d%11}`,
  * its category page `/Cat{d%5}`, and the host's `/about`, with
  * per-entry lastmod/changefreq/priority derived from d+i so every
  * hint value occurs on every run.
  *
  * The FRONTIER (q254) composes the chain end to end: parse →
  * robots gate ([[Robots]]'s broadcast rules, longest-prefix /
  * Allow-wins) → URL-level collapse (a page listed by many sitemaps
  * keeps its best hints: max priority, freshest lastmod, a ref
  * count) → POLITENESS SCHEDULING: per host, the next
  * [[FrontierSlots]] fetches picked by (priority desc, loc) through
  * the TopKPerGroup heap, each slot [[CrawlDelayMs]] apart — the
  * per-host serialization a real crawler enforces, emitted as the
  * frontier HEAD (the next batch), never a rank over the whole
  * future.
  *
  * Scale design (100 TB): q253 is row-local (one regexp block split
  * + posexplode — a sitemap never crosses an exchange). q254's
  * rule join is broadcast (host-cardinality metadata); the URL
  * collapse is one map-side-combined rollup keyed on (host, loc);
  * the schedule is TopKPerGroup — per-partition bounded heaps
  * forwarding ≤ k rows per host, never a corpus-sized per-host
  * window sort (the window remains only as the bare-session
  * fixture fallback, the [[TextAnalysis.globalTopK]] pattern). */
object Sitemap {

  /** Entries per synthesized sitemap. */
  val EntriesPerMap = 3

  /** Frontier head size per host (q254). */
  val FrontierSlots = 20

  /** Politeness delay between same-host fetches (q254), ms. */
  val CrawlDelayMs = 500L

  // fixture pieces (shared verbatim with the oracle)
  val X0 = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
    "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
  val X1 = "</urlset>"

  private def hostCol(d: Column): Column =
    concat(lit("https://www.site"), (d % 7).cast("string"),
      lit(".example.com"))

  /** Path of entry i for doc d (i in 0 until [[EntriesPerMap]]). */
  private def pathCol(d: Column, i: Int): Column = i match {
    case 0 => concat(lit("/Cat"), (d % 5).cast("string"),
      lit("/page"), (d % 11).cast("string"))
    case 1 => concat(lit("/Cat"), (d % 5).cast("string"))
    case _ => lit("/about")
  }

  /** One `<url>` block for doc d, entry i. */
  private def entryCol(d: Column, i: Int): Column = {
    val k = d + lit(i)
    val lastmod = concat(lit("2024-03-"),
      lpad((k % 28 + 1).cast("string"), 2, "0"))
    val cf = when(k % 3 === 0, lit("daily"))
      .when(k % 3 === 1, lit("weekly")).otherwise(lit("monthly"))
    val pr = concat(lit("0."), (k % 10).cast("string"))
    concat(lit("<url><loc>"), hostCol(d), pathCol(d, i),
      lit("</loc><lastmod>"), lastmod,
      lit("</lastmod><changefreq>"), cf,
      lit("</changefreq><priority>"), pr,
      lit("</priority></url>\n"))
  }

  /** The complete synthesized sitemap document for a doc_id. */
  def sitemapFixtureCol(d: Column): Column =
    concat(lit(X0) +: (0 until EntriesPerMap).map(entryCol(d, _)) :+
      lit(X1): _*)

  /** q253: documents → synthesized sitemap → one row per `<url>`
    * entry: (doc_id, entry_idx, loc, lastmod, changefreq,
    * priority). */
  def sitemapEntries(docs: DataFrame): DataFrame =
    parseUrlset(docs.select(col("doc_id"),
      sitemapFixtureCol(col("doc_id")).as("xml")), Seq("doc_id"))

  /** The q253 `<url>`-entry parse kernel over any (keys..., xml)
    * frame — shared with the q319 discovery path so the two stages
    * cannot drift. */
  private[graft] def parseUrlset(withXml: DataFrame,
      keys: Seq[String]): DataFrame =
    withXml
      .select(keys.map(col) :+
        posexplode(regexp_extract_all(col("xml"),
          lit("(?s)<url>(.*?)</url>"), lit(1)))
          .as(Seq("entry_idx", "block")): _*)
      .select(keys.map(col) ++ Seq(
        col("entry_idx").cast("long").as("entry_idx"),
        regexp_extract(col("block"), "<loc>(.*?)</loc>", 1).as("loc"),
        regexp_extract(col("block"), "<lastmod>(.*?)</lastmod>", 1)
          .as("lastmod"),
        regexp_extract(col("block"),
          "<changefreq>(.*?)</changefreq>", 1).as("changefreq"),
        regexp_extract(col("block"), "<priority>(.*?)</priority>", 1)
          .cast("double").as("priority")): _*)

  /** Sitemap DISCOVERY (q319) — the crawl bootstrap step BETWEEN
    * q269 and q253 that neither grades alone: the robots.txt
    * parse's GLOBAL `Sitemap:` directive (attributed to agent ''
    * per RFC 9309 §2.3 — the q269 kernel, unchanged) yields each
    * host's sitemap URL; the discovered URL is then FETCHED (the
    * host id recovered FROM the URL — the q290 identity
    * discipline, never threaded through) and parsed by the
    * UNCHANGED q253 entry kernel. One row per discovered entry.
    *
    * Scale design (100 TB): hosts are dimension-sized (the q269
    * economics — the only exchange is the distinct-host rollup
    * inside the robots synthesis); discovery is a parsed-directive
    * filter and the fetch + parse are row-local per host. */
  def sitemapDiscovery(docs: DataFrame): DataFrame = {
    val discovered = Robots.robotsParse(docs)
      .filter(col("directive") === "sitemap")
      .select(col("host"), col("value").as("sitemap_url"))
    val fetched = discovered.withColumn("xml",
      sitemapFixtureCol(regexp_extract(col("sitemap_url"),
        "www\\.site([0-9]+)\\.", 1).cast("long")))
    parseUrlset(fetched, Seq("host", "sitemap_url"))
  }

  // ---------------------------------------------------------------
  // sitemap INDEX files (q300) — the protocol's own sharding: a
  // urlset caps at 50k URLs / 50 MB, so any real site of size
  // publishes a <sitemapindex> of child sitemap locs, and discovery
  // must resolve TWO levels before it has a single page URL
  // ---------------------------------------------------------------

  /** Child sitemaps per synthesized index / url entries per child. */
  val IndexChildren = 2
  val EntriesPerChild = 2

  val XI0 = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
    "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
  val XI1 = "</sitemapindex>"

  private def childLocCol(d: Column, j: Int): Column =
    concat(hostCol(d), lit("/sitemap-"), d.cast("string"),
      lit(s"-$j.xml"))

  /** The synthesized `<sitemapindex>` document for a doc_id:
    * [[IndexChildren]] `<sitemap>` refs with lastmod hints. */
  def sitemapIndexFixtureCol(d: Column): Column = {
    val refs = (0 until IndexChildren).map { j =>
      val k = d + lit(7 * j)
      concat(lit("<sitemap><loc>"), childLocCol(d, j),
        lit("</loc><lastmod>2024-04-"),
        lpad((k % 28 + 1).cast("string"), 2, "0"),
        lit("</lastmod></sitemap>\n"))
    }
    concat(lit(XI0) +: refs :+ lit(XI1): _*)
  }

  /** The child urlset a ref RESOLVES to — synthesized from the
    * (doc, child) identity parsed OUT OF THE REF URL (the fixture's
    * stand-in for the fetch; the q239 deterministic-corpus
    * discipline). */
  private def childXmlCol(d: Column, j: Column): Column = {
    val entries = (0 until EntriesPerChild).map { i =>
      val k = d + j * 3 + lit(i)
      val cf = when(k % 3 === 0, lit("daily"))
        .when(k % 3 === 1, lit("weekly")).otherwise(lit("monthly"))
      concat(lit("<url><loc>"), hostCol(d),
        lit("/Cat"), (d % 5).cast("string"),
        lit("/s"), j.cast("string"),
        lit("/p"), (k % 11).cast("string"),
        lit("</loc><lastmod>2024-05-"),
        lpad((k % 28 + 1).cast("string"), 2, "0"),
        lit("</lastmod><changefreq>"), cf,
        lit("</changefreq><priority>0."), (k % 10).cast("string"),
        lit("</priority></url>\n"))
    }
    concat(lit(X0) +: entries :+ lit(X1): _*)
  }

  /** q300: the TWO-LEVEL resolution — parse the `<sitemapindex>`,
    * resolve each ref to its child urlset, parse the children with
    * the UNCHANGED q253 entry regex: (doc_id, sitemap_idx,
    * sitemap_loc, sitemap_lastmod, entry_idx, loc, lastmod,
    * changefreq, priority). Both levels are row-local regexp
    * splits; a sitemap never crosses an exchange. */
  def sitemapIndexResolved(docs: DataFrame): DataFrame = {
    val refs = docs
      .select(col("doc_id"),
        sitemapIndexFixtureCol(col("doc_id")).as("xml"))
      .select(col("doc_id"),
        posexplode(regexp_extract_all(col("xml"),
          lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1)))
          .as(Seq("sitemap_idx", "ref")))
      .select(col("doc_id"),
        col("sitemap_idx").cast("long").as("sitemap_idx"),
        regexp_extract(col("ref"), "<loc>(.*?)</loc>", 1)
          .as("sitemap_loc"),
        regexp_extract(col("ref"), "<lastmod>(.*?)</lastmod>", 1)
          .as("sitemap_lastmod"))
    refs
      .withColumn("child_xml", childXmlCol(col("doc_id"),
        regexp_extract(col("sitemap_loc"), "-([0-9]+)\\.xml$", 1)
          .cast("long")))
      .select(col("doc_id"), col("sitemap_idx"), col("sitemap_loc"),
        col("sitemap_lastmod"),
        posexplode(regexp_extract_all(col("child_xml"),
          lit("(?s)<url>(.*?)</url>"), lit(1)))
          .as(Seq("entry_idx", "block")))
      .select(col("doc_id"), col("sitemap_idx"), col("sitemap_loc"),
        col("sitemap_lastmod"),
        col("entry_idx").cast("long").as("entry_idx"),
        regexp_extract(col("block"), "<loc>(.*?)</loc>", 1).as("loc"),
        regexp_extract(col("block"), "<lastmod>(.*?)</lastmod>", 1)
          .as("lastmod"),
        regexp_extract(col("block"),
          "<changefreq>(.*?)</changefreq>", 1).as("changefreq"),
        regexp_extract(col("block"), "<priority>(.*?)</priority>", 1)
          .cast("double").as("priority"))
  }

  // ---------------------------------------------------------------
  // RSS 2.0 / Atom feeds (q321) — the OTHER discovery channel next
  // to sitemaps: news/blog acquisition reads feeds, and the two
  // wire formats differ in structure AND date convention (RFC 822
  // vs RFC 3339), so normalization is real work
  // ---------------------------------------------------------------

  /** RFC 822 month names in wire order — the mapping the RSS date
    * normalizer must actually perform. */
  val Rfc822Months: Seq[String] = Seq("Jan", "Feb", "Mar", "Apr",
    "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  private val Rfc822Days: Seq[String] =
    Seq("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")

  /** Entries per feed for doc d. */
  private def feedEntriesCol(d: Column): Column = d % 3 + 1

  /** One synthesized feed per doc: RSS 2.0 for even doc_ids (items
    * with RFC 822 pubDate + guid), Atom for odd (entries with
    * RFC 3339 updated + id, link as an ATTRIBUTE — the structural
    * difference a reader must handle). */
  def feedFixtureCol(d: Column): Column = {
    val host = concat(lit("https://www.site"), (d % 7).cast("string"),
      lit(".example.com"))
    def entry(k: Int): Column = {
      val kk = d + lit(k)
      val title = concat(lit("Post "), d.cast("string"), lit("-"),
        lit(k).cast("string"))
      val link = concat(host, lit("/p/"), d.cast("string"), lit("-"),
        lit(k).cast("string"))
      val guid = concat(lit("urn:p:"), d.cast("string"), lit("-"),
        lit(k).cast("string"))
      val dd = lpad((kk % 28 + 1).cast("string"), 2, "0")
      val mon = element_at(array(Rfc822Months.map(lit): _*),
        (kk % 12 + 1).cast("int"))
      val mm = lpad((kk % 12 + 1).cast("string"), 2, "0")
      val mins = lpad((kk % 60).cast("string"), 2, "0")
      val wd = element_at(array(Rfc822Days.map(lit): _*),
        (kk % 7 + 1).cast("int"))
      when(d % 2 === 0,
        concat(lit("<item><title>"), title, lit("</title><link>"),
          link, lit("</link><pubDate>"), wd, lit(", "), dd, lit(" "),
          mon, lit(" 2024 10:"), mins, lit(":00 GMT</pubDate>"),
          lit("<guid>"), guid, lit("</guid></item>\n")))
        .otherwise(
          concat(lit("<entry><title>"), title,
            lit("</title><link href=\""), link, lit("\"/>"),
            lit("<updated>2024-"), mm, lit("-"), dd, lit("T10:"),
            mins, lit(":00Z</updated><id>"), guid,
            lit("</id></entry>\n")))
    }
    val n = feedEntriesCol(d)
    val body = concat((0 until 3).map(k =>
      when(lit(k) < n, entry(k)).otherwise(lit(""))): _*)
    when(d % 2 === 0,
      concat(lit("<?xml version=\"1.0\"?>\n<rss version=\"2.0\">" +
        "<channel><title>Chan "), d.cast("string"),
        lit("</title><link>"), host, lit("/</link>\n"), body,
        lit("</channel></rss>")))
      .otherwise(
        concat(lit("<?xml version=\"1.0\"?>\n" +
          "<feed xmlns=\"http://www.w3.org/2005/Atom\"><title>Feed "),
          d.cast("string"), lit("</title>\n"), body, lit("</feed>")))
  }

  /** q321: documents → synthesized feed → format DETECTED from the
    * root element (never the fixture arithmetic), entries extracted
    * per format (RSS `<item>` children as elements; Atom `<entry>`
    * with the link in an href attribute), and publish times
    * NORMALIZED to one ISO form — RSS's RFC 822 `03 Jun 2024`
    * through the real month-name mapping, Atom's RFC 3339 passed
    * through. One row per entry: (doc_id, format, entry_idx, title,
    * link, guid, published_iso). Row-local regexp work; the oracle
    * re-derives every field including the month mapping. */
  def feedEntries(docs: DataFrame): DataFrame = {
    val withXml = docs.select(col("doc_id"),
      feedFixtureCol(col("doc_id")).as("xml"))
    val fmt = when(col("xml").contains("<rss "), lit("rss"))
      .when(col("xml").contains("<feed "), lit("atom"))
      .otherwise(lit("unknown"))
    val monthNum = Rfc822Months.zipWithIndex
      .foldLeft(lit("00")) { case (acc, (m, i)) =>
        when(col("mon") === m,
          lit(f"${i + 1}%02d")).otherwise(acc)
      }
    withXml
      .withColumn("format", fmt)
      .select(col("doc_id"), col("format"),
        posexplode(expr(
          """CASE WHEN format = 'rss'
            |THEN regexp_extract_all(xml, '(?s)<item>(.*?)</item>', 1)
            |ELSE regexp_extract_all(xml, '(?s)<entry>(.*?)</entry>', 1)
            |END""".stripMargin.replace("\n", " ")))
          .as(Seq("entry_idx", "block")))
      .select(col("doc_id"), col("format"),
        col("entry_idx").cast("long").as("entry_idx"),
        regexp_extract(col("block"), "<title>(.*?)</title>", 1)
          .as("title"),
        when(col("format") === "rss",
          regexp_extract(col("block"), "<link>(.*?)</link>", 1))
          .otherwise(regexp_extract(col("block"),
            "<link href=\"(.*?)\"/>", 1)).as("link"),
        when(col("format") === "rss",
          regexp_extract(col("block"), "<guid>(.*?)</guid>", 1))
          .otherwise(regexp_extract(col("block"), "<id>(.*?)</id>", 1))
          .as("guid"),
        when(col("format") === "rss",
          regexp_extract(col("block"),
            "<pubDate>[A-Za-z]+, ([0-9]+ [A-Za-z]+ [0-9]+ " +
              "[0-9:]+) GMT</pubDate>", 1))
          .otherwise(lit(null)).as("rssdt"),
        when(col("format") === "atom",
          regexp_extract(col("block"), "<updated>(.*?)</updated>", 1))
          .otherwise(lit(null)).as("atomdt"))
      .withColumn("mon",
        regexp_extract(col("rssdt"), " ([A-Za-z]+) ", 1))
      .select(col("doc_id"), col("format"), col("entry_idx"),
        col("title"), col("link"), col("guid"),
        when(col("format") === "atom", col("atomdt"))
          .otherwise(concat(
            regexp_extract(col("rssdt"), " ([0-9]{4}) ", 1),
            lit("-"), monthNum, lit("-"),
            regexp_extract(col("rssdt"), "^([0-9]+) ", 1),
            lit("T"),
            regexp_extract(col("rssdt"), " ([0-9:]+)$", 1),
            lit("Z"))).as("published_iso"))
  }

  /** q254: the crawl frontier head — q253's entries, robots-gated,
    * URL-collapsed, and politeness-scheduled: per host the top
    * [[FrontierSlots]] allowed pages by (priority desc, loc), each
    * assigned a fetch slot [[CrawlDelayMs]] apart:
    * (host, slot, loc, path, priority, lastmod, n_refs,
    * fetch_at_ms). */
  def crawlFrontier(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val entries = sitemapEntries(docs)
      .withColumn("host",
        regexp_extract(col("loc"), "^https://([^/]+)/", 1))
      .withColumn("path",
        regexp_extract(col("loc"), "^https://[^/]+(/.*)$", 1))
    val hostRules = Robots.rulesFor(spark)
      .groupBy(col("host"))
      .agg(collect_list(struct(col("is_allow"), col("prefix")))
        .as("rules"))
    val gated = entries
      .join(broadcast(hostRules), Seq("host"), "left")
      .withColumn("matches", filter(col("rules"), r =>
        col("path").startsWith(r.getField("prefix"))))
      // tie-break pinned to q249's: largest prefix on a full
      // (len, is_allow) tie, mirrored as `prefix DESC` in the oracle
      .withColumn("win", array_max(transform(col("matches"), r =>
        struct(length(r.getField("prefix")).as("l"),
          r.getField("is_allow").as("a"),
          r.getField("prefix").as("p")))))
      .filter(coalesce(col("win.a") === 1, lit(true)))
    val collapsed = gated
      .groupBy(col("host"), col("loc"), col("path"))
      .agg(max(col("priority")).as("priority"),
        max(col("lastmod")).as("lastmod"),
        count(lit(1)).as("n_refs"))
    val ranked = topKPerHost(collapsed,
      Seq("priority" -> false, "loc" -> true), FrontierSlots)
    ranked
      .select(col("host"), (col("rank") - 1).as("slot"), col("loc"),
        col("path"), col("priority"), col("lastmod"), col("n_refs"),
        ((col("rank") - 1) * CrawlDelayMs).as("fetch_at_ms"))
  }

  /** q270: the frontier re-timed by each host's PARSED crawl-delay
    * (q269's `Crawl-delay` directive, cast and broadcast) instead
    * of the constant [[CrawlDelayMs]] — the composition a real
    * scheduler runs: parse robots → schedule within the host's own
    * politeness budget. Hosts with no directive fall back to 1 s
    * (the conservative default). Adds the delay column so the
    * budget is auditable per row. */
  def crawlFrontierDelayed(docs: DataFrame): DataFrame = {
    val delays = Robots.robotsParse(docs)
      .filter(col("directive") === "crawl-delay")
      .select(col("host"), col("value").cast("long").as("delay_s"))
    crawlFrontier(docs)
      .drop("fetch_at_ms")
      .join(broadcast(delays), Seq("host"), "left")
      .withColumn("delay_s", coalesce(col("delay_s"), lit(1L)))
      .select(col("host"), col("slot"), col("loc"), col("path"),
        col("priority"), col("lastmod"), col("n_refs"),
        col("delay_s"),
        (col("slot") * col("delay_s") * 1000L).as("fetch_at_ms"))
  }

  /** Per-host top-k through the TopKPerGroup heap when the session
    * carries [[graft.plans.GraftExtensions]]; host-partitioned
    * window fallback for bare fixture sessions (the
    * [[TextAnalysis.globalTopK]] pattern). */
  private def topKPerHost(df: DataFrame,
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val extensionsActive = df.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    if (extensionsActive)
      org.apache.spark.sql.graft.TopK.perGroup(
        df, Seq("host"), orderCols, k)
    else {
      val sorted = orderCols.map { case (c, asc) =>
        if (asc) col(c).asc else col(c).desc }
      df.withColumn("rank",
          row_number().over(Window.partitionBy(col("host"))
            .orderBy(sorted: _*)).cast("long"))
        .filter(col("rank") <= k)
    }
  }
}
