package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + host-level quota (q243/q244) — the
  * web-corpus companion the domain blocklist (q113) and host-quality
  * weighting (q104) ASSUME already ran: crawl URLs arrive in many
  * spellings of the same resource (scheme/host case, default ports,
  * trailing slashes, tracking params, fragments, query-param order),
  * and every host-keyed operator is wrong until they collapse.
  * Reference N/A (no URLs in the taxi stream) — an LLM-pipeline
  * operator like q239.
  *
  * The canonicalization RULES, stated precisely (each a row-local
  * string expression; the fixture exercises all of them on every
  * row):
  *   1. scheme and host lowercase; PATH CASE IS KEPT (paths are
  *      case-sensitive per RFC 3986 — only the authority is not);
  *   2. the scheme's default port drops (http:80 / https:443);
  *      any other explicit port is kept;
  *   3. the fragment (`#…`) drops — it never reaches the server;
  *   4. query params whose NAME is in [[StripParams]] (tracking
  *      params) drop;
  *   5. surviving params sort by their full `k=v` segment
  *      (deterministic total order, duplicate keys preserved);
  *   6. trailing slashes on the path drop (`/a/` ≡ `/a`, root `/`
  *      ≡ empty) and an emptied query drops its `?`.
  * The stated subset: URLs are `scheme://host[:port][path][?q][#f]`
  * with no userinfo and no percent-encoding differences (encoding
  * normalization is a separate rule family).
  *
  * Graded input is SYNTHESIZED per doc_id (the q239/q44 trick) from
  * shared string pieces, covering: upper/mixed scheme+host case,
  * matching AND non-default explicit ports, trailing slash or not,
  * two param orders with two different tracking params, fragments
  * on a quarter of rows.
  *
  * Scale design (100 TB): canonicalization is ONE row-local
  * projection (regexp_extract/filter/sort over ≤ a handful of query
  * params — codegen'd functions, no UDF, no shuffle); the host
  * quota (q244) is the UNCHANGED q34 operator keyed on the
  * canonical host — one partitioned exchange on host, per-host rank
  * by the house hash (the window is host-PARTITIONED, never a
  * single-partition funnel), exactly the plan q34 already audits. */
object UrlCanonical {

  /** Tracking-param names stripped by rule 4. */
  val StripParams: Seq[String] =
    Seq("utm_source", "utm_medium", "utm_campaign", "ref", "fbclid")

  /** Per-host keep quota of [[hostQuota]] (q244). */
  val HostQuota = 50

  // fixture pieces (shared verbatim with the oracle)
  val U0 = "://WWW.Site"
  val U1 = ".Example.COM"
  val U2 = "/Cat"
  val U3 = "/page"

  /** Deterministic messy-URL fixture for a doc_id. */
  def urlFixtureCol(d: Column): Column = {
    val scheme = when(d % 2 === 0, lit("HTTP")).otherwise(lit("https"))
    val port = when(d % 3 === 0,
        when(d % 2 === 0, lit(":80")).otherwise(lit(":443")))
      .when(d % 3 === 1, lit(":8080"))
      .otherwise(lit(""))
    val path = concat(lit(U2), (d % 5).cast("string"), lit(U3),
      (d % 11).cast("string"),
      when(d % 2 === 0, lit("/")).otherwise(lit("")))
    val query = when(d % 2 === 0,
        concat(lit("?b=2&utm_source=news&a="), (d % 4).cast("string")))
      .otherwise(
        concat(lit("?a="), (d % 4).cast("string"), lit("&fbclid=xyz&b=2")))
    val frag = when(d % 4 === 0,
      concat(lit("#sec"), (d % 3).cast("string"))).otherwise(lit(""))
    concat(scheme, lit(U0), (d % 7).cast("string"), lit(U1),
      port, path, query, frag)
  }

  /** The canonicalization kernel: url → (canonical_url, host) as
    * two row-local Columns. */
  def canonicalCols(url: Column): (Column, Column) = {
    val nofrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(nofrag, "^([A-Za-z]+)://", 1))
    val hostport = regexp_extract(nofrag, "^[A-Za-z]+://([^/?]+)", 1)
    val host = lower(regexp_replace(hostport, ":[0-9]+$", ""))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_extract(nofrag, "^[A-Za-z]+://[^/?]*([^?]*)", 1)
    val pathN = regexp_replace(path, "/+$", "")
    val query = regexp_extract(nofrag, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "&"), p =>
      length(p) > 0 && !array_contains(
        typedLit(StripParams), element_at(split(p, "="), 1))))
    val canonical = concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      pathN,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
    (canonical, host)
  }

  /** q243: documents → synthesized messy URL → canonical form:
    * (doc_id, url, canonical_url, host). */
  def urlCanonical(docs: DataFrame): DataFrame = {
    val withUrl = docs.select(col("doc_id"),
      urlFixtureCol(col("doc_id")).as("url"))
    val (canonical, host) = canonicalCols(col("url"))
    withUrl.select(col("doc_id"), col("url"),
      canonical.as("canonical_url"), host.as("host"))
  }

  /** The stated-subset public-suffix list of [[registrableDomain]]
    * (q273) — a literal constant shared with the oracle, covering
    * the rule shapes the real PSL has: single-label TLDs,
    * multi-label public suffixes (co.uk, ac.uk, co.jp), and a
    * private-section entry (blogspot.com) that sits UNDER a public
    * TLD. */
  val PslSuffixes: Seq[String] = Seq(
    "com", "net", "org", "io", "uk", "co.uk", "ac.uk", "jp",
    "co.jp", "blogspot.com")

  /** Host shapes of the q273 fixture (picked by doc_id % 8) —
    * shared with the oracle's CASE. */
  val PslHosts: Seq[String] = Seq(
    "www.news.example.com", "blog.shop.co.uk", "example.com",
    "foo.blogspot.com", "static.cdn.example.org",
    "university.ac.uk", "api.service.co.jp", "data.example.io")

  /** q273: registrable-domain (eTLD+1) extraction — the correction
    * every "host-level" operator (q104 host quality, q113
    * blocklist, q244 quotas, q250 crawl health) actually needs:
    * `a.example.co.uk` and `b.example.co.uk` are the SAME
    * registrant, while `foo.blogspot.com` and `bar.blogspot.com`
    * are DIFFERENT ones — facts only a public-suffix list encodes.
    * The rule is the published PSL algorithm on the stated-subset
    * list: the winning suffix is the LONGEST match (by label count,
    * then length), and the registrable domain is the winner plus
    * one preceding label; a host that IS a bare suffix has no
    * registrable domain (NULL).
    *
    * Scale design (100 TB): the list is an operator constant
    * (typedLit array — no join at all); matching is a row-local
    * filter + struct-max fold over ≤ |list| candidates. */
  def registrableDomain(docs: DataFrame): DataFrame = {
    val host = element_at(typedLit(PslHosts),
      (col("doc_id") % 8).cast("int") + 1)
    val cands = filter(typedLit(PslSuffixes), s =>
      host === s || host.endsWith(concat(lit("."), s)))
    val win = array_max(transform(cands, s =>
      struct(size(split(s, "\\.")).as("nl"),
        length(s).as("len"), s.as("sfx"))))
    docs
      .select(col("doc_id"), host.as("host"), win.as("w"),
        split(host, "\\.").as("labels"))
      .select(col("doc_id"), col("host"),
        col("w.sfx").as("public_suffix"),
        when(col("host") === col("w.sfx"),
          lit(null).cast("string"))
          .otherwise(array_join(
            slice(col("labels"),
              size(col("labels")) - col("w.nl"),
              col("w.nl") + 1), "."))
          .as("registrable_domain"))
  }

  /** Total fetch slots of [[crawlBudgetAllocation]] (q283). */
  val CrawlBudget = 1000L

  /** q283: crawl-budget allocation across registrable domains — the
    * planning step between q273's domain extraction and the q254
    * frontier: a global fetch budget splits across domains
    * proportionally to √pages (the sublinear crawl-budget rule —
    * big sites get more, but not linearly more), made to sum
    * EXACTLY to the budget by largest-remainder rounding. The
    * weight total is an ordered fold over the domain list (the
    * q169/q275 FP discipline) and the remainder ranks run through
    * the [[TextAnalysis.globalTopK]] heap with k = the budget —
    * registrable domains are corpus-scale on a real web corpus
    * (tens of millions), exactly the single-reducer hazard class,
    * and only ranks ≤ budget are ever consumed.
    *
    * Scale design (100 TB): one domain rollup, a 1-row ordered-fold
    * total and a 1-row remainder (both broadcast), the bounded heap
    * for the +1 ranks, and one broadcast join back — nothing sorts
    * globally. */
  def crawlBudgetAllocation(docs: DataFrame): DataFrame = {
    val domains = registrableDomain(docs)
      .filter(col("registrable_domain").isNotNull)
      .groupBy(col("registrable_domain"))
      .agg(count(lit(1)).as("n_pages"))
      .withColumn("weight", sqrt(col("n_pages").cast("double")))
    val tot = domains
      .agg(collect_list(struct(
        col("registrable_domain").as("d"),
        col("weight").as("w"))).as("ws"))
      .select(aggregate(
        transform(array_sort(col("ws")), x => x.getField("w")),
        lit(0.0), (a, b) => a + b).as("w_total"))
    val alloc = domains.crossJoin(broadcast(tot))
      .withColumn("share", col("weight") / col("w_total"))
      .withColumn("ideal",
        col("weight") / col("w_total") * CrawlBudget.toDouble)
      .withColumn("base", floor(col("ideal")))
      .withColumn("frac", col("ideal") - floor(col("ideal")))
    val rem = alloc.agg((lit(CrawlBudget) - sum(col("base")))
      .as("rem"))
    val ranked = TextAnalysis.globalTopK(
      alloc.select(col("registrable_domain"), col("frac")),
      Seq("frac" -> false, "registrable_domain" -> true),
      CrawlBudget.toInt)
      .select(col("registrable_domain"), col("rank"))
    alloc.crossJoin(broadcast(rem))
      .join(broadcast(ranked), Seq("registrable_domain"), "left")
      .withColumn("extra",
        when(col("rank").isNotNull && col("rank") <= col("rem"), 1L)
          .otherwise(0L))
      .select(col("registrable_domain").as("domain"),
        col("n_pages"), col("weight"), col("share"), col("base"),
        col("extra"), (col("base") + col("extra")).as("budget_slots"))
  }

  /** q244: host-level quota — the q34 quota operator, UNCHANGED,
    * keyed on the canonical host: at most [[HostQuota]] documents
    * per host, chosen by the house hash order. */
  def hostQuota(docs: DataFrame,
      quota: Int = HostQuota): DataFrame =
    Sampling.quotaSample(
      urlCanonical(docs).select(col("doc_id"), col("host")),
      "host", quota)

  // ---------------------------------------------------------------
  // percent-encoding normalization (q293/q294) — the rule family
  // the q243 scaladoc deferred, closed: without it `%7Euser` and
  // `~user` stay distinct spellings of one resource and every
  // host-keyed collapse under-counts
  // ---------------------------------------------------------------

  /** RFC 3986 §6.2.2.2 percent-encoding normalization as ONE
    * row-local expression: decode any %XX whose octet is an
    * UNRESERVED character (ALPHA / DIGIT / `-` `.` `_` `~`),
    * uppercase the hex of every remaining escape (§6.2.2.1 applied
    * to escapes). Reserved escapes stay escaped — %2F is NOT a
    * path slash. Stated subset: every `%` begins a well-formed
    * two-hex-digit escape (the fixture's contract; a real crawl
    * pre-screens with a validity regex). Implementation: split at
    * `%`, per piece decide decode-vs-uppercase from the decoded
    * char class (chr(conv(hex,16,10)) — codegen'd functions, no
    * UDF, no shuffle). */
  def pctNormalizeCol(url: Column): Column = {
    val parts = split(url, "%")
    val head = element_at(parts, 1)
    val tail = slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))
    val fixed = transform(tail, p => {
      val hex = upper(p.substr(lit(1), lit(2)))
      val rest = p.substr(lit(3), greatest(length(p) - 2, lit(0)))
      val ch = chr(conv(hex, 16, 10).cast("long"))
      when(ch.rlike("^[A-Za-z0-9._~-]$"), concat(ch, rest))
        .otherwise(concat(lit("%"), hex, rest))
    })
    concat(head, array_join(fixed, ""))
  }

  /** Deterministic pct-fixture: consecutive doc pairs (2k, 2k+1)
    * spell ONE resource two ways — literal `~` + lowercase reserved
    * escapes + `%41` vs `%7e`-escaped tilde + uppercase escapes +
    * literal `A` — on a shared host, so the collapse is measurable:
    * exactly two raw spellings per canonical URL. */
  def urlPctFixtureCol(d: Column): Column = {
    val k = floor(d / 2)
    concat(lit("https://www.pct"), (k % 7).cast("string"),
      lit(".example.com"),
      when(d % 2 === 0, lit("/~user")).otherwise(lit("/%7euser")),
      (k % 5).cast("string"), lit("/f"),
      when(d % 2 === 0, lit("%2fx?q=%41&x=%2f"))
        .otherwise(lit("%2Fx?q=A&x=%2F")))
  }

  /** q293: documents → pct-messy URL → percent-normalized form →
    * the UNCHANGED q243 canonical kernel on the normalized string:
    * (doc_id, url, pct_url, canonical_url, host). The composition
    * order is RFC 6.2.2's: case/percent normalization first, then
    * the scheme-based rules. Row-local end to end. */
  def urlPctCanonical(docs: DataFrame): DataFrame = {
    val withUrl = docs.select(col("doc_id"),
      urlPctFixtureCol(col("doc_id")).as("url"))
      .withColumn("pct_url", pctNormalizeCol(col("url")))
    val (canonical, host) = canonicalCols(col("pct_url"))
    withUrl.select(col("doc_id"), col("url"), col("pct_url"),
      canonical.as("canonical_url"), host.as("host"))
  }

  /** q294: the host-quota composition row — per canonical host, how
    * much ADDITIONAL collapse the pct rules buy (n_canonical is
    * half of n_raw on the fixture: every resource had two
    * spellings) and the q244-style quota the host would then keep:
    * (host, n_urls, n_raw, n_canonical, n_quota_kept). One
    * host-partitioned rollup; distinct counts are per-host
    * bounded. */
  def urlPctCollapse(docs: DataFrame): DataFrame =
    urlPctCanonical(docs)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("url")).as("n_raw"),
        countDistinct(col("canonical_url")).as("n_canonical"))
      .select(col("host"), col("n_urls"), col("n_raw"),
        col("n_canonical"),
        least(col("n_canonical"), lit(HostQuota.toLong))
          .as("n_quota_kept"))
}
