package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt directive evaluation (q249) — the crawl-politeness
  * gate between q247's captures and everything downstream: a page
  * fetched against its host's robots rules must be droppable before
  * any text stage sees it. Rules follow the published REP semantics
  * (RFC 9309 / the Google rule): among the host's rules whose path
  * PREFIX matches the page's path, the MOST SPECIFIC (longest
  * prefix) wins; on a length tie the Allow wins; no matching rule
  * means allowed.
  *
  * The graded rule set is SYNTHESIZED per host (the q243 fixture's
  * seven hosts; [[rulesFor]]): each host h disallows its own
  * category `/Cat<h>`, re-ALLOWS the single page `/Cat<h>/page<h>`
  * (the longest-match override doing real work), and carries a
  * never-matching `/private` disallow — so every doc's verdict
  * exercises prefix match, specificity, and the default-allow path.
  *
  * Scale design (100 TB): the rule table is HOST-cardinality
  * metadata — collapsed to one (host, rules[]) row per host and
  * BROADCAST into a single join; the winner is then a ROW-LOCAL
  * fold over ≤ |rules/host| candidates (filter + array_max over
  * (len, is_allow, prefix) structs — specificity then Allow-wins,
  * exactly the published tie-break), so the corpus never shuffles
  * and no per-doc aggregation exchange exists (plan-pinned: the
  * single hash exchange is the rule table's own host-keyed rollup,
  * 21 rows, feeding the broadcast). */
object Robots {

  /** The synthesized rule tuples (host, is_allow, prefix) — ONE
    * definition shared by the engine frame and the oracle's VALUES
    * list so the rule set cannot drift between mirrors. */
  val RuleTuples: Seq[(String, Int, String)] =
    (0 until 7).flatMap { h =>
      Seq(
        (s"www.site$h.example.com", 0, s"/Cat$h"),
        (s"www.site$h.example.com", 1, s"/Cat$h/page$h"),
        (s"www.site$h.example.com", 0, "/private"))
    }

  /** [[RuleTuples]] as a DataFrame. */
  def rulesFor(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    RuleTuples.toDF("host", "is_allow", "prefix")
  }

  /** q269: the robots.txt TEXT parser — q249 evaluates pre-parsed
    * rule tuples; this is the stage that produces them from the
    * file a crawler actually fetches. The PARSED SUBSET (RFC 9309
    * syntax): `Name: value` directive lines grouped under the most
    * recent `User-agent:` line, names matched case-insensitively,
    * `#` comment lines and blank lines skipped, unknown directives
    * ignored (the spec's rule), and `Sitemap:` attributed to no
    * group (it is global per the spec — agent ''). Values keep
    * their case; the first `:` splits, so sitemap URLs with their
    * own colons survive intact.
    *
    * The fixture synthesizes one robots.txt per q243 host carrying
    * the EXACT q249 rule set plus a crawl-delay, a global Sitemap
    * line, a comment, and a second (badbot) group — so group
    * attribution, the comment/blank skips, and the global-sitemap
    * rule all do real work (and a spec pins that the parsed `*`
    * rules equal [[RuleTuples]] verbatim — the two stages cannot
    * drift).
    *
    * Scale design (100 TB): hosts are dimension-sized and the parse
    * is row-local array work over ≤ tens of lines per file; the
    * only exchange is the distinct-host rollup feeding the
    * synthesis. */
  def robotsParse(docs: DataFrame): DataFrame = {
    val hosts = docs
      .select(((col("doc_id") % 7) + 0L).as("h")).distinct()
      .select(col("h"),
        concat(lit("www.site"), col("h").cast("string"),
          lit(".example.com")).as("host"))
    val txt = concat(
      lit("# robots for "), col("host"), lit("\n"),
      lit("User-agent: *\n"),
      lit("Disallow: /Cat"), col("h").cast("string"), lit("\n"),
      lit("Allow: /Cat"), col("h").cast("string"), lit("/page"),
      col("h").cast("string"), lit("\n"),
      lit("Crawl-delay: "), (col("h") % 5 + 1).cast("string"),
      lit("\n"),
      lit("Disallow: /private\n"),
      lit("Sitemap: https://"), col("host"), lit("/sitemap.xml\n"),
      lit("\n"),
      lit("User-agent: badbot\n"),
      lit("Disallow: /"))
    val withTxt = hosts.select(col("host"), txt.as("txt"))
    parseRobotsTxt(withTxt)
  }

  /** The q269 parse KERNEL over any (host, txt) frame — shared with
    * the q310 wildcard-composition path. */
  private[graft] def parseRobotsTxt(withTxt: DataFrame): DataFrame = {
    val NamePat = "^([A-Za-z-]+):\\s*(.*)$"
    withTxt
      .withColumn("l", split(col("txt"), "\n"))
      .select(col("host"),
        posexplode(expr(
          """transform(sequence(1, size(l)), i -> struct(
            |  CAST(i - 1 AS BIGINT) AS line_no,
            |  element_at(l, i) AS line,
            |  element_at(l, array_max(filter(sequence(1, i), j ->
            |    startswith(lower(element_at(l, j)), 'user-agent:'))))
            |    AS ua_line))""".stripMargin))
          .as(Seq("pos", "r")))
      .select(col("host"), col("r.line_no").as("line_no"),
        col("r.line").as("line"),
        when(col("r.ua_line").isNotNull,
          trim(regexp_extract(col("r.ua_line"), NamePat, 2)))
          .otherwise(lit("")).as("group_agent"))
      .withColumn("name",
        lower(regexp_extract(col("line"), NamePat, 1)))
      .withColumn("value",
        trim(regexp_extract(col("line"), NamePat, 2)))
      .filter(col("name").isin("disallow", "allow", "crawl-delay",
        "sitemap"))
      .select(col("host"),
        when(col("name") === "sitemap", lit(""))
          .otherwise(col("group_agent")).as("agent"),
        col("name").as("directive"), col("value"), col("line_no"))
  }

  /** q249: each document's canonical URL (q243) evaluated against
    * its host's rules: (doc_id, host, path, rule, allowed) — `rule`
    * is the winning prefix ('' when no rule matched). */
  def robotsGate(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val pages = UrlCanonical.urlCanonical(docs)
      .select(col("doc_id"), col("host"),
        regexp_extract(col("canonical_url"),
          "^[a-z]+://[^/?]+([^?]*)", 1).as("path"))
    val hostRules = rulesFor(spark)
      .groupBy(col("host"))
      .agg(collect_list(struct(col("is_allow"), col("prefix")))
        .as("rules"))
    pages
      .join(broadcast(hostRules), Seq("host"), "left")
      .withColumn("matches", filter(col("rules"), r =>
        col("path").startsWith(r.getField("prefix"))))
      // winner = longest prefix, Allow beats Disallow on equal
      // length, and on a FULL (len, is_allow) tie the
      // lexicographically LARGEST prefix — array_max's struct order;
      // the oracle mirrors order `prefix DESC` to pin the identical
      // tie-break (an arbitrary choice the robots longest-match rule
      // leaves open; aligned because q249 emits the winning prefix)
      .withColumn("win", array_max(transform(col("matches"), r =>
        struct(length(r.getField("prefix")).as("l"),
          r.getField("is_allow").as("a"),
          r.getField("prefix").as("p")))))
      .select(col("doc_id"), col("host"), col("path"),
        coalesce(col("win.p"), lit("")).as("rule"),
        coalesce(col("win.a") === 1, lit(true)).as("allowed"))
  }

  // ---------------------------------------------------------------
  // RFC 9309 WILDCARD rules (q296) — q249 evaluates the prefix-only
  // subset; real robots files use `*` (any run of octets) and `$`
  // (end-of-path anchor), and the precedence unit is the PATTERN's
  // octet length, not a prefix length
  // ---------------------------------------------------------------

  /** The wildcard rule set, identical per q243 host — each rule
    * shape does real work on the `/Cat{c}/page{p}` path fixture:
    * leading-`*` with `$` anchor (R2/R4: `page1` allowed exactly,
    * `page10` NOT swallowed by it and re-disallowed by the longer
    * pattern), a mid-tail wildcard allow (R3), the base category
    * disallow (R1), and an exact-length Allow/Disallow TIE (R5/R6 —
    * the published Allow-wins rule). (host, is_allow, pattern). */
  val WildcardRuleTuples: Seq[(String, Int, String)] =
    (0 until 7).flatMap { h =>
      val host = s"www.site$h.example.com"
      Seq(
        (host, 0, "/Cat*"),      // len 5: disallow every category
        (host, 1, "*/page1$"),   // len 8: exact page1 re-allowed
        (host, 1, "/Cat2/*"),    // len 7: category 2 re-allowed
        (host, 0, "*/page10$"),  // len 9: exact page10 re-disallowed
        (host, 0, "*/page7$"),   // len 8 vs len 8 tie with the next:
        (host, 1, "*/page7$"))   //   Allow wins an equal-length tie
    }

  /** RFC 9309 pattern → anchored regex, shared verbatim by both
    * engines: `*` → `.*`, a FINAL `$` → the end anchor, implicit
    * start anchor, and WITHOUT a final `$` the match is a PREFIX
    * match (regex left unanchored at the end). Every literal
    * character is metachar-escaped (r15 ADVICE: a real-web pattern
    * carrying '.', '+', '(' must keep its literal meaning, not
    * silently become a regex operator) — escaping is per-character
    * backslash, not \\Q…\\E, so the SAME string stays valid under
    * both java.util.regex and DuckDB's RE2. On `[A-Za-z0-9/]`
    * fixtures the escape is the identity, so q296/q310 rows are
    * unchanged. */
  def wildcardToRegex(pattern: String): String = {
    val (body, anchor) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), "$")
      else (pattern, "")
    val sb = new StringBuilder("^")
    body.foreach { c =>
      if (c == '*') sb.append(".*")
      else {
        if (!c.isLetterOrDigit && c != '/' && c != '_') sb.append('\\')
        sb.append(c)
      }
    }
    sb.append(anchor).toString
  }

  /** q296: the q249 gate under the FULL RFC 9309 matching rules:
    * (doc_id, host, path, rule, allowed) where `rule` is the
    * winning PATTERN ('' when none matched) and precedence is
    * (pattern octet length DESC, Allow over Disallow, pattern DESC
    * — the q249 tie-break discipline, oracle-aligned).
    *
    * Scale design (100 TB): rules are host-cardinality metadata
    * (broadcast, ≤ a handful per host); the match is a row-local
    * regexp_like fold over those candidates — the corpus never
    * shuffles. The regex alternative to a bespoke glob kernel is
    * deliberate: patterns are dimension-small, and the conversion
    * is the standard published translation. */
  def robotsWildcardGate(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    wildcardGateFrom(docs, WildcardRuleTuples
      .map { case (h, a, p) => (h, a, p, wildcardToRegex(p)) }
      .toDF("host", "is_allow", "pattern", "rx"))
  }

  /** q310: the q296 gate fed by PARSED rules — the wildcard tuples
    * serialized as real robots.txt files per host, parsed by the
    * UNCHANGED q269 kernel, translated, and gated: the output must
    * EQUAL q296 row for row (same oracle — the q291 composition
    * discipline). */
  def robotsWildcardParsedGate(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hostTxt = WildcardRuleTuples.groupBy(_._1).toSeq
      .map { case (host, rules) =>
        val lines = rules.map { case (_, a, p) =>
          (if (a == 1) "Allow: " else "Disallow: ") + p
        }
        (host, "# wildcard rules\nUser-agent: *\n" +
          lines.mkString("\n"))
      }
      .toDF("host", "txt")
    val parsed = parseRobotsTxt(hostTxt)
      .filter(col("agent") === "*" &&
        col("directive").isin("allow", "disallow"))
      .select(col("host"),
        when(col("directive") === "allow", 1).otherwise(0)
          .as("is_allow"),
        col("value").as("pattern"))
    val withRx = parsed.as[(String, Int, String)]
      .map { case (h, a, p) => (h, a, p, wildcardToRegex(p)) }
      .toDF("host", "is_allow", "pattern", "rx")
    wildcardGateFrom(docs, withRx)
  }

  /** The q296/q310 shared gate core over a (host, is_allow,
    * pattern, rx) rule frame. */
  private def wildcardGateFrom(docs: DataFrame,
      ruleRows: DataFrame): DataFrame = {
    val pages = UrlCanonical.urlCanonical(docs)
      .select(col("doc_id"), col("host"),
        regexp_extract(col("canonical_url"),
          "^[a-z]+://[^/?]+([^?]*)", 1).as("path"))
    val hostRules = ruleRows
      .groupBy(col("host"))
      .agg(collect_list(struct(col("is_allow"), col("pattern"),
        col("rx"))).as("rules"))
    pages
      .join(broadcast(hostRules), Seq("host"), "left")
      .withColumn("matches", filter(col("rules"), r =>
        regexp_like(col("path"), r.getField("rx"))))
      .withColumn("win", array_max(transform(col("matches"), r =>
        struct(length(r.getField("pattern")).as("l"),
          r.getField("is_allow").as("a"),
          r.getField("pattern").as("p")))))
      .select(col("doc_id"), col("host"), col("path"),
        coalesce(col("win.p"), lit("")).as("rule"),
        coalesce(col("win.a") === 1, lit(true)).as("allowed"))
  }

  /** Graded robots-META / X-Robots-Tag indexability gate (q342,
    * r17) — the PAGE-level robots layer robots.txt cannot express
    * (RFC 9309 governs FETCHING; the meta tag and the X-Robots-Tag
    * response header govern INDEXING). Per capture both channels
    * are parsed — the HTTP header from the synthesized response
    * head, the `<meta name="robots" content="...">` from the HTML —
    * and combined under the documented MOST-RESTRICTIVE rule (a
    * directive from either channel applies; Google's published
    * combination semantics). The fixture varies which channel
    * carries which directive so every combination row is exercised;
    * headers/markup decide, never the arithmetic (a parser bug
    * flips a boolean against the oracle's closed-form CASE).
    * Row-local. */
  def robotsMetaGate(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // synthesis: meta channel by id%4, header channel by id%3
        val metaContent = (id % 4) match {
          case 0 => None
          case 1 => Some("noindex")
          case 2 => Some("nofollow")
          case _ => Some("noindex, nofollow")
        }
        val headerTag = (id % 3) match {
          case 0 => None
          case 1 => Some("noarchive")
          case _ => Some("noindex")
        }
        val metaTag = metaContent.map(c =>
          s"""<meta name="robots" content="$c">""").getOrElse("")
        val html = s"<!DOCTYPE html><html><head><title>d$id</title>" +
          s"$metaTag</head><body><p>${text.take(80)}</p></body></html>"
        val head = "HTTP/1.1 200 OK\r\n" +
          "Content-Type: text/html\r\n" +
          headerTag.map(t => s"X-Robots-Tag: $t\r\n").getOrElse("") +
          "Content-Length: " + html.length + "\r\n\r\n"
        val response = head + html
        // THE OPERATOR: parse both channels from the response bytes
        val (headPart, body) = response.indexOf("\r\n\r\n") match {
          case i if i >= 0 => (response.substring(0, i),
            response.substring(i + 4))
          case _ => sys.error("no header/body separator")
        }
        val headerDirs = headPart.split("\r\n")
          .filter(_.toLowerCase.startsWith("x-robots-tag:"))
          .flatMap(_.split(":", 2)(1).split(",").map(_.trim.toLowerCase))
          .toSet
        val MetaRe =
          """(?i)<meta\s+name="robots"\s+content="([^"]*)"\s*/?>""".r
        val metaDirs = MetaRe.findFirstMatchIn(body)
          .map(_.group(1).split(",").map(_.trim.toLowerCase).toSet)
          .getOrElse(Set.empty)
        val dirs = headerDirs ++ metaDirs // most-restrictive union
        (id, dirs.size.toLong,
          !dirs.contains("noindex"),
          !dirs.contains("nofollow"),
          !dirs.contains("noarchive"))
      }
      .toDF("doc_id", "n_directives", "indexable", "followable",
        "archivable")
  }
}
