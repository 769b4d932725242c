package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q239 HTML→text kernel's rules (each rule of the
  * HtmlExtract scaladoc gets an explicit fixture) and the q240
  * funnel composition. */
class HtmlExtractSpec extends AnyFunSuite with SparkSessionSpec {

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(HtmlExtract.htmlTextCol(col("h")).as("t"))
      .head().getString(0)
  }

  test("script and style containers drop WITH content — including " +
      "the <, >, && and quote characters inside them") {
    assert(extract(
      "<p>a</p><script>if (x<y && y>z) { f(\"</b>\"); }</script>" +
        "<style>p > em { color: #fff; }</style><p>b</p>") == "a\nb")
  }

  test("comments drop, including multi-line and markup inside") {
    assert(extract("<p>a</p><!-- <p>hidden</p>\nstill hidden --><p>b</p>")
      == "a\nb")
  }

  test("block tags become line breaks; inline tags are removed " +
      "without splitting the surrounding word") {
    assert(extract("<h1>Title</h1><p>one <b>two</b> thr<em>ee</em></p>")
      == "Title\none two three")
  }

  test("a block-tag prefix does not match a longer unknown tag " +
      "(<pre> is not <p>) — unknown tags are inline") {
    assert(extract("<p>a<pre>b</pre>c</p>") == "abc")
  }

  test("self-closing and attributed block tags break lines " +
      "(<hr/>, <p class=..>)") {
    assert(extract("<p class=\"x\">a</p><hr/><p>b</p>") == "a\nb")
  }

  test("entities decode AFTER tag stripping — &lt;b&gt; is literal " +
      "text, never a tag; &amp; decodes last so &amp;lt; yields &lt;") {
    assert(extract("<p>x &lt;b&gt;not-bold&lt;/b&gt; y</p>")
      == "x <b>not-bold</b> y")
    assert(extract("<p>&amp;lt;</p>") == "&lt;")
    assert(extract("<p>a&nbsp;b &quot;q&quot; &#39;s&#39;</p>")
      == "a b \"q\" 's'")
  }

  test("whitespace normalizes: space/tab runs collapse, spaces " +
      "around breaks drop, break runs collapse, ends trim") {
    assert(extract("<div>  a \t b  </div>\n\n<div> c </div>")
      == "a b\nc")
    assert(extract("<p></p><p></p>") == "")
  }

  test("the synthesized fixture round-trips every rule on a real " +
      "row: title/h1/p/div/li lines, inline markup fused, entities " +
      "decoded") {
    import spark.implicits._
    val out = HtmlExtract.htmlExtracted(
      Seq((3L, "alpha beta gamma delta")).toDF("doc_id", "text"))
      .head()
    assert(out.getAs[String]("text") ==
      "Doc 3\nHeading & no. 3\nalpha beta\ngamma delta bold t link 0" +
        " <raw> \"q\" 's'\nitem A\nitem 3")
    assert(out.getAs[Long]("n_lines") == 6L)
  }

  test("an empty document still yields the skeleton lines (title, " +
      "heading, entities, items) — the p/div halves are empty") {
    import spark.implicits._
    val out = HtmlExtract.htmlExtracted(
      Seq((0L, "")).toDF("doc_id", "text")).head()
    assert(out.getAs[String]("text") ==
      "Doc 0\nHeading & no. 0\nbold t link 0 <raw> \"q\" 's'\n" +
        "item A\nitem 0")
  }

  test("q240 funnel composes: one row per document, n_kept <= " +
      "n_paras, quality in [0,1]") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta eps zeta eta theta"),
      (2L, "alpha beta gamma delta eps zeta eta theta"),
      (3L, "iota kappa lambda mu nu xi omicron pi"))
      .toDF("doc_id", "text")
    val out = HtmlExtract.htmlFunnel(docs).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_paras"))
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("the extraction plan is shuffle-free — one row-local " +
      "projection (the q234/q238 contract)") {
    import spark.implicits._
    val df = HtmlExtract.htmlExtracted(
      Seq((1L, "a b")).toDF("doc_id", "text"))
    val shuffles = "Exchange".r.findAllIn(
      df.queryExecution.executedPlan.toString).size
    assert(shuffles == 0, "extraction must not shuffle")
  }

  test("q320 JSON-LD: the typed block wins, the BreadcrumbList and " +
      "the JSON-shaped javascript decoy do not; escaped quotes in " +
      "the name survive the parse; the nested rating extracts") {
    import spark.implicits._
    val docs = (0L until 12L).map((_, "x")).toDF("doc_id", "text")
    val out = HtmlExtract.jsonLdExtract(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 12)
    for ((id, r) <- out) {
      // exactly TWO data blocks (main + breadcrumb); the js decoy
      // carries ld-shaped text but the type attribute excludes it
      assert(r.getAs[Long]("n_ld_blocks") == 2L, s"doc $id")
      assert(r.getAs[String]("ld_type") ==
        HtmlExtract.LdTypes((id % 3).toInt))
      assert(r.getAs[String]("name") == s"""Item "deal" $id""",
        s"doc $id escaped-quote name")
      assert(r.getAs[String]("url") ==
        s"https://www.site${id % 7}.example.com/doc$id")
      assert(r.getAs[Double]("rating_value") ==
        (id % 4 + 1) + (id % 10) / 10.0)
      assert(r.getAs[Long]("review_count") == id % 50 + 1)
    }
  }

  test("q325 section chunks: bucketing follows the declared " +
      "words-before rule, paths ride along, oversized sections " +
      "flag for split") {
    import spark.implicits._
    val docs = Seq((0L, "x"), (5L, "x")).toDF("doc_id", "text")
    val rows = HtmlExtract.sectionChunks(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    // doc 0: one section, 5 words ("body 0 s0 extra words here" is
    // 6 -> overflow)  — wait: words = "body 0 s0 extra words here"
    for ((id, rs) <- rows; r <- rs) {
      val before = rs.filter(_.getAs[Long]("sec_idx") <
        r.getAs[Long]("sec_idx")).map(_.getAs[Long]("n_words")).sum
      assert(r.getAs[Long]("chunk_id") ==
        before / HtmlExtract.SectionChunkBudget, s"doc $id")
      assert(r.getAs[Boolean]("overflow") ==
        (r.getAs[Long]("n_words") > HtmlExtract.SectionChunkBudget))
      assert(r.getAs[String]("path").startsWith(s"Title $id"))
    }
    // doc 5 has 4 content sections (3 h2 + 1 h3) spanning 2+ chunks
    assert(rows(5L).length == 4)
    assert(rows(5L).map(_.getAs[Long]("chunk_id")).distinct.length >= 2)
  }

  test("q326 resolution ladder: every rung wins where higher rungs " +
      "are absent, and the winning title came from a REAL parse of " +
      "that source") {
    import spark.implicits._
    val docs = (0L until 8L).map((_, "x")).toDF("doc_id", "text")
    val out = HtmlExtract.metaResolution(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((id, r) <- out) {
      val (src, title) = (id % 4) match {
        case 0 | 3 => ("jsonld", s"LD title $id")
        case 1 => ("og", s"OG title $id")
        case _ => ("title", s"Page $id")
      }
      assert(r.getAs[String]("source") == src, s"doc $id")
      assert(r.getAs[String]("resolved_title") == title, s"doc $id")
    }
  }

  test("q323 outline: every h3 path carries BOTH ancestors, h2 " +
      "paths carry the h1, and word counts come from the section's " +
      "own paragraph") {
    import spark.implicits._
    val docs = Seq((5L, "x")).toDF("doc_id", "text") // 3 sections
    val rows = HtmlExtract.headingOutline(docs).collect()
      .sortBy(_.getAs[Long]("sec_idx"))
    // h1, (h2 s0), (h2 s1), (h3 under s1), (h2 s2)
    assert(rows.map(_.getAs[Long]("level")).toSeq ==
      Seq(1L, 2L, 2L, 3L, 2L))
    assert(rows(0).getAs[String]("path") == "Title 5")
    assert(rows(1).getAs[String]("path") == "Title 5 > Sec 0 doc 5")
    assert(rows(3).getAs[String]("path") ==
      "Title 5 > Sec 1 doc 5 > Sub 1 of doc 5")
    // s2's h2 path must NOT inherit the h3
    assert(rows(4).getAs[String]("path") == "Title 5 > Sec 2 doc 5")
    // title has no paragraph
    assert(rows(0).getAs[Long]("n_words") == 0L)
    assert(rows(3).getAs[Long]("n_words") == 2L) // "deep 5-1"
  }
}
