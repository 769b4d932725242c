package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup → text extraction (q239) + the extraction-headed
  * cleaning funnel (q240) — the stage every real web corpus
  * (CommonCrawl-shaped) runs BEFORE any of the graded text
  * operators: the boilerplate stripper (q200), the quality gates
  * (q36/q41/q129), the dedup families — all assume extracted text
  * already exists. The reference consumes pre-structured JSON
  * (TaxiEventReader.java:84-118), so this is an LLM-pipeline
  * operator, not a parity row.
  *
  * The kernel implements a PRECISELY SPEC'D HTML subset (the q81/
  * q182/q228 scoping discipline — narrow, stated, enforced by the
  * fixture rather than silently approximated on arbitrary markup):
  *   1. `<script ...>...</script>` and `<style ...>...</style>`
  *      containers are dropped WITH their content (non-greedy to
  *      the first matching close tag; content may contain `<`/`&`);
  *   2. `<!-- ... -->` comments are dropped;
  *   3. block-level tags ([[BlockTags]], open or close, any
  *      attributes, self-closing `<hr/>` included) become a
  *      NEWLINE — the block-boundary rule that keeps "headingpara"
  *      from fusing;
  *   4. every remaining tag (`<b>`, `<a href=..>`, `<em>`, …) is
  *      INLINE: removed with no separator, so markup inside a word
  *      never splits it;
  *   5. the five named entities + `&#39;` decode AFTER tag
  *      stripping (so `&lt;tag&gt;` yields literal text, never a
  *      tag), `&amp;` strictly LAST (so `&amp;lt;` → `&lt;`);
  *   6. whitespace normalization: runs of spaces/tabs collapse to
  *      one space, spaces around newlines drop, newline runs
  *      collapse to one, leading/trailing whitespace trims.
  * Attribute values inside tags must not contain `>` — the one
  * stated subset constraint (true of the fixture by construction).
  *
  * Every pattern/literal below is SHARED VERBATIM with the DuckDB
  * oracle and restricted to the regex intersection both engines
  * parse identically (no `\s`/`\b` classes — Java and RE2 disagree
  * on `\s` at `\x0B`; explicit `[ \t\n/]` classes instead; `(?s)`
  * inline dotall; non-greedy `.*?`; `(?:…)` groups).
  *
  * The graded input is SYNTHESIZED markup (the q44/q54 trick): each
  * documents row is wrapped in a deterministic HTML skeleton
  * ([[htmlWrapCol]] — title/style/script/comment/h1/p/div with
  * inline tags, entities, and a list), built from the SAME string
  * pieces in both engines, so extraction is graded against a fixture
  * that exercises every rule above on every row.
  *
  * Scale design (100 TB): wrap and extract are both ROW-LOCAL
  * codegen'd string expressions (RegExpReplace chains — functions,
  * not UDFs) — one projection, no shuffle, no state; the operator
  * composes at scan cost anywhere in a funnel, exactly like q234/
  * q238. The funnel (q240) flattens extracted newlines and hands
  * off to the UNCHANGED q200 boilerplate plan (one digest exchange)
  * and the row-local q6 quality score. */
object HtmlExtract {

  /** Elements whose open/close tags are block boundaries (→ '\n'). */
  val BlockTags: Seq[String] = Seq(
    "html", "head", "body", "title", "h1", "h2", "h3", "p", "div",
    "ul", "ol", "li", "table", "tr", "td", "br", "hr")

  /** Containers dropped with their content. Non-greedy: stops at
    * the FIRST close tag, content may contain `<`, `&`, newlines. */
  val ScriptPat = "(?s)<script[^>]*>.*?</script>"
  val StylePat = "(?s)<style[^>]*>.*?</style>"
  val CommentPat = "(?s)<!--.*?-->"

  /** One block-level tag, open or close, with optional attributes
    * or self-closing slash. The `(?:[ \t\n/][^>]*)?` boundary keeps
    * `<p…>` from matching `<pre…>` while accepting `<p>`, `<p a=b>`,
    * `</p>` and `<hr/>`. */
  val BlockPat: String =
    "</?(?:" + BlockTags.mkString("|") + ")(?:[ \\t\\n/][^>]*)?>"

  /** Any remaining (inline) tag — removed with NO separator. */
  val InlinePat = "<[^>]*>"

  /** Entity decode table, IN ORDER — `&amp;` last so producing `&`
    * can never re-trigger an earlier entity. Plain string replace
    * in both engines (the literals are regex-inert, so the Spark
    * side may ride regexp_replace codegen). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Whitespace normalization patterns (applied in this order). */
  val SpaceRunPat = "[\\t ]+"
  val AroundNlPat = " *\\n *"
  val NlRunPat = "\\n+"
  val TrimPat = "^[\\n ]+|[\\n ]+$"

  // ---- the synthesized-markup fixture skeleton (shared verbatim
  // with the oracle; no single quotes anywhere so the SQL literals
  // embed unescaped) ----
  val F0 = "<html lang=\"en\"><head><title>Doc "
  val F1 = "</title><style type=\"text/css\">p { margin: 0; } " +
    ".c > a { color: #fff; }</style>" +
    "<script type=\"text/javascript\">" +
    "if (a<b && c>d) { alert(\"x<y>\"); }</script></head>" +
    "<body><!-- doc "
  val F2 = " --><h1 class=\"t\">Heading &amp; no. "
  val F3 = "</h1><p id=\"x\">"
  val F4 = "</p><div class=\"c\">"
  val F5 = " <b>bold&nbsp;t</b> <a href=\"/x?a=1&amp;b=2\">link "
  val F6 = "</a> &lt;raw&gt; &quot;q&quot; &#39;s&#39;</div>" +
    "<ul><li>item A</li><li>item "
  val F7 = "</li></ul><hr/></body></html>"

  /** Deterministic HTML wrap of a (doc_id, text) row: the document's
    * first half of words lands in the `<p>`, the second half in the
    * `<div>` beside inline markup and entities. */
  def htmlWrapCol(docId: Column, text: Column): Column = {
    val w = split(text, " ")
    val n = size(w)
    // n DIV 2, exact for any non-negative int (mirrors len(w) // 2)
    val n1 = floor(n / lit(2.0)).cast("int")
    val t1 = array_join(slice(w, lit(1), n1), " ")
    val t2 = array_join(slice(w, n1 + lit(1), n - n1), " ")
    val d = docId.cast("string")
    concat(lit(F0), d, lit(F1), d, lit(F2), (docId % 7).cast("string"),
      lit(F3), t1, lit(F4), t2, lit(F5), (docId % 3).cast("string"),
      lit(F6), (docId % 5).cast("string"), lit(F7))
  }

  /** documents → (doc_id, html) via [[htmlWrapCol]]. */
  def htmlWrap(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      htmlWrapCol(col("doc_id"), col("text")).as("html"))

  /** The extraction kernel as one row-local Column chain (rules
    * 1–6 of the object scaladoc, in order). */
  def htmlTextCol(html: Column): Column = {
    val noScript = regexp_replace(html, ScriptPat, "")
    val noStyle = regexp_replace(noScript, StylePat, "")
    val noComment = regexp_replace(noStyle, CommentPat, "")
    val blocks = regexp_replace(noComment, BlockPat, "\n")
    val noTags = regexp_replace(blocks, InlinePat, "")
    val decoded = Entities.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    val spaced = regexp_replace(decoded, SpaceRunPat, " ")
    val nl = regexp_replace(
      regexp_replace(spaced, AroundNlPat, "\n"), NlRunPat, "\n")
    regexp_replace(nl, TrimPat, "")
  }

  /** (doc_id, html) → (doc_id, text, n_lines, n_chars) — q239's
    * graded shape. */
  def htmlTextExtract(html: DataFrame): DataFrame =
    html
      .select(col("doc_id"), htmlTextCol(col("html")).as("text"))
      .withColumn("n_lines",
        when(length(col("text")) === 0, lit(0L))
          .otherwise((length(col("text")) -
            length(regexp_replace(col("text"), "\\n", "")) + 1L)
            .cast("long")))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** q239: documents → wrap → extract. */
  def htmlExtracted(docs: DataFrame): DataFrame =
    htmlTextExtract(htmlWrap(docs))

  // ---------------------------------------------------------------
  // JSON-LD structured data (q320) — the schema.org machine-readable
  // layer real pages embed in <script type="application/ld+json">
  // blocks; the metadata every serious web-curation pipeline mines
  // (titles, canonical urls, dates, ratings) WITHOUT text heuristics
  // ---------------------------------------------------------------

  /** The declared schema.org types of the q320 fixture. */
  val LdTypes: Seq[String] = Seq("Article", "Product", "NewsArticle")

  /** One synthesized page carrying TWO ld+json blocks (the graded
    * Article/Product object with a NESTED aggregateRating, and a
    * BreadcrumbList decoy a reader must not conflate) plus a plain
    * javascript block (must not parse as data). Escaping matters:
    * the name carries a QUOTED `"deal"` — a reader that splits on
    * naive quotes shears here. */
  def jsonLdWrapCol(docId: Column): Column = {
    val d = docId.cast("string")
    val typ = element_at(array(LdTypes.map(lit): _*),
      (docId % 3 + 1).cast("int"))
    val rating = concat((docId % 4 + 1).cast("string"), lit("."),
      (docId % 10).cast("string"))
    concat(
      lit("<html><head><title>ld "), d, lit("</title>"),
      lit("<script type=\"application/ld+json\">" +
        "{\"@context\":\"https://schema.org\",\"@type\":\""),
      typ,
      lit("\",\"name\":\"Item \\\"deal\\\" "), d,
      lit("\",\"url\":\"https://www.site"), (docId % 7).cast("string"),
      lit(".example.com/doc"), d,
      lit("\",\"datePublished\":\"2024-06-"),
      lpad((docId % 28 + 1).cast("string"), 2, "0"),
      lit("\",\"aggregateRating\":{\"@type\":\"AggregateRating\"," +
        "\"ratingValue\":"), rating,
      lit(",\"reviewCount\":"), (docId % 50 + 1).cast("string"),
      lit("}}</script>"),
      lit("<script type=\"application/ld+json\">" +
        "{\"@context\":\"https://schema.org\"," +
        "\"@type\":\"BreadcrumbList\",\"numberOfItems\":"),
      (docId % 5 + 1).cast("string"),
      lit("}</script>"),
      lit("<script type=\"text/javascript\">var x = " +
        "{\"@type\": \"NotData\"};</script>"),
      lit("</head><body><p>body "), d, lit("</p></body></html>"))
  }

  /** q320: documents → ld+json pages → REAL extraction: every
    * `application/ld+json` block regex-located (the type attribute
    * decides — the decoy javascript block carries JSON-shaped text
    * and must not be read), then parsed by the engine's JSON parser
    * (get_json_object — codegen'd, not a UDF): the graded frame is
    * the FIRST block whose @type is a [[LdTypes]] member, its name
    * (escaped-quote correct), url, datePublished, and the NESTED
    * aggregateRating fields; n_ld_blocks counts all data blocks.
    * The oracle reconstructs the same page and parses it with
    * DuckDB's OWN json machinery — two independent JSON parsers
    * must agree. Row-local. */
  def jsonLdExtract(docs: DataFrame): DataFrame = {
    val html = docs.select(col("doc_id"),
      jsonLdWrapCol(col("doc_id")).as("html"))
    val blocks = expr(
      """regexp_extract_all(html,
        |'(?s)<script type="application/ld\\+json">(.*?)</script>',
        |1)""".stripMargin.replace("\n", " "))
    val withBlocks = html.withColumn("blocks", blocks)
      .withColumn("main", filter(col("blocks"), b =>
        get_json_object(b, "$['@type']")
          .isin(LdTypes.map(x => x: Any): _*))(0))
    withBlocks.select(
      col("doc_id"),
      size(col("blocks")).cast("long").as("n_ld_blocks"),
      get_json_object(col("main"), "$['@type']").as("ld_type"),
      get_json_object(col("main"), "$['name']").as("name"),
      get_json_object(col("main"), "$['url']").as("url"),
      get_json_object(col("main"), "$['datePublished']")
        .as("date_published"),
      get_json_object(col("main"),
        "$['aggregateRating']['ratingValue']").cast("double")
        .as("rating_value"),
      get_json_object(col("main"),
        "$['aggregateRating']['reviewCount']").cast("long")
        .as("review_count"))
  }

  // ---------------------------------------------------------------
  // heading outline (q323) — the document STRUCTURE the flat q239
  // extraction discards: section-aware chunkers (RAG, long-context
  // packing) key on the h1>h2>h3 path of each content block, not on
  // blind token windows
  // ---------------------------------------------------------------

  /** One synthesized sectioned page per doc: an h1 title, 1..3 h2
    * sections each with a paragraph, and an h3 subsection under
    * every ODD h2 — so the path builder must track BOTH ancestor
    * levels, not just the last heading. */
  def outlineWrapCol(docId: Column): Column = {
    val d = docId.cast("string")
    def sec(s: Int): Column = {
      val words = concat(lit("body "), d, lit(" s"),
        lit(s).cast("string"),
        when((docId + lit(s)) % 3 === 0, lit(" extra words here"))
          .otherwise(lit(" w")))
      val h3 = if (s % 2 == 1)
        concat(lit(s"<h3>Sub $s of doc "), d, lit("</h3><p>deep "),
          d, lit(s"-$s</p>"))
      else lit("")
      concat(lit(s"<h2>Sec $s doc "), d, lit("</h2><p>"), words,
        lit("</p>"), h3)
    }
    val nSecs = docId % 3 + 1
    concat(
      lit("<html><body><h1>Title "), d, lit("</h1>"),
      concat((0 until 3).map(s =>
        when(lit(s) < nSecs, sec(s)).otherwise(lit(""))): _*),
      lit("</body></html>"))
  }

  /** q323: documents → sectioned pages → the OUTLINE: every heading
    * extracted in document order with its level, the heading PATH
    * built from the running h1/h2 ancestors (a last_value window
    * per doc — per-doc bounded), and each heading's own paragraph
    * word count. One row per heading: (doc_id, sec_idx, level,
    * heading, path, n_words). The oracle mirrors the window with
    * DuckDB's last_value IGNORE NULLS over the same extraction. */
  def headingOutline(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val html = docs.select(col("doc_id"),
      outlineWrapCol(col("doc_id")).as("html"))
    val chunks = html.select(col("doc_id"),
      posexplode(expr(
        "regexp_extract_all(html, '<h([123])>.*?</h[123]>(?:<p>.*?</p>)?', 0)"))
        .as(Seq("sec_idx", "chunk")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("sec_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("level",
        regexp_extract(col("chunk"), "^<h([123])>", 1).cast("int"))
      .withColumn("heading",
        regexp_extract(col("chunk"), "^<h[123]>(.*?)</h[123]>", 1))
      .withColumn("para",
        regexp_extract(col("chunk"), "<p>(.*?)</p>", 1))
      .withColumn("h1",
        last(when(col("level") === 1, col("heading")), true).over(w))
      .withColumn("h2",
        last(when(col("level") === 2, col("heading")), true).over(w))
      .select(col("doc_id"), col("sec_idx").cast("long").as("sec_idx"),
        col("level").cast("long").as("level"), col("heading"),
        when(col("level") === 1, col("heading"))
          .when(col("level") === 2,
            concat_ws(" > ", col("h1"), col("heading")))
          .otherwise(concat_ws(" > ", col("h1"), col("h2"),
            col("heading"))).as("path"),
        when(col("para") === "", lit(0L))
          .otherwise(size(split(col("para"), " ")).cast("long"))
          .as("n_words"))
  }

  /** Word budget of one packed training chunk (q325). */
  val SectionChunkBudget = 5L

  /** q325: SECTION-AWARE chunk packing — q323's outline composed
    * with the packing family: content sections (outline rows that
    * own a paragraph) pack into training chunks under a DECLARED
    * cumulative-bucketing rule — chunk_id = floor(words-before /
    * budget) over the doc's section order — so every chunk boundary
    * is derivable and the heading PATH rides along as the chunk's
    * provenance metadata (what a RAG index stores next to the
    * text). Oversized sections keep their own overflow flag (the
    * split queue). Per-doc bounded window; the oracle mirrors the
    * same running sum. */
  def sectionChunks(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val secs = headingOutline(docs).filter(col("n_words") > 0)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("sec_idx"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    secs
      .withColumn("words_before",
        coalesce(sum(col("n_words")).over(w), lit(0L)))
      .select(col("doc_id"), col("sec_idx"), col("path"),
        col("n_words"),
        floor(col("words_before") / SectionChunkBudget).cast("long")
          .as("chunk_id"),
        (col("n_words") > SectionChunkBudget).as("overflow"))
  }

  /** q326: the METADATA RESOLUTION ladder — the canonical-title
    * fallback every indexer runs: prefer JSON-LD (q320's machinery),
    * else Open Graph `og:title` meta, else the `<title>` element.
    * The fixture varies which sources EXIST per doc (all three /
    * og+title / title-only / ld+title), so every ladder rung wins
    * somewhere and the chosen SOURCE is part of the graded row.
    * Extraction is real per source (JSON parse, attribute regex,
    * element regex); row-local. */
  def metaResolution(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val ds = d.cast("string")
    val ld = concat(
      lit("<script type=\"application/ld+json\">" +
        "{\"@type\":\"Article\",\"headline\":\"LD title "), ds,
      lit("\"}</script>"))
    val og = concat(
      lit("<meta property=\"og:title\" content=\"OG title "), ds,
      lit("\"/>"))
    val titleEl = concat(lit("<title>Page "), ds, lit("</title>"))
    val html = concat(
      lit("<html><head>"),
      when(d % 4 === 0, concat(titleEl, og, ld))
        .when(d % 4 === 1, concat(titleEl, og))
        .when(d % 4 === 2, titleEl)
        .otherwise(concat(titleEl, ld)),
      lit("</head><body>b</body></html>"))
    docs.select(d, html.as("html"))
      .withColumn("ld_block",
        regexp_extract(col("html"),
          "<script type=\"application/ld\\+json\">(.*?)</script>", 1))
      .withColumn("ld_title",
        when(col("ld_block") =!= "",
          get_json_object(col("ld_block"), "$['headline']")))
      .withColumn("og_title",
        regexp_extract(col("html"),
          "<meta property=\"og:title\" content=\"(.*?)\"/>", 1))
      .withColumn("el_title",
        regexp_extract(col("html"), "<title>(.*?)</title>", 1))
      .select(col("doc_id"),
        when(col("ld_title").isNotNull, lit("jsonld"))
          .when(col("og_title") =!= "", lit("og"))
          .otherwise(lit("title")).as("source"),
        coalesce(col("ld_title"),
          when(col("og_title") =!= "", col("og_title")),
          col("el_title")).as("resolved_title"),
        (col("ld_title").isNotNull).as("has_jsonld"),
        (col("og_title") =!= "").as("has_og"))
  }

  /** q240: the extraction-headed cleaning funnel — extract (q239
    * kernel), flatten line breaks to the corpus word stream, strip
    * corpus-frequent boilerplate paragraphs (the UNCHANGED q200
    * plan), then the q6 quality score over the cleaned text. The
    * first stage of a real web pipeline, composed end to end. */
  def htmlFunnel(docs: DataFrame): DataFrame = {
    val flat = htmlExtracted(docs)
      .select(col("doc_id"),
        regexp_replace(col("text"), "\\n", " ").as("text"))
    Dedup.boilerplateStrip(flat)
      .select(col("doc_id"), col("n_paras"), col("n_kept"),
        TextAnalysis.qualityScoreCol(col("clean_text"))
          .as("quality_score"))
  }
}
