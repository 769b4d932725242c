package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hyperlink extraction (q264) + the anchor-text index (q265) — the
  * graph side of the web-corpus chain: q239 extracts what a page
  * SAYS, these extract what it POINTS AT, feeding host graphs (the
  * q99/q104 PageRank family) and the classic anchor-text retrieval
  * signal (anchors describe the TARGET — the original web-search
  * relevance trick). Reference N/A — LLM-pipeline operators like
  * q239/q243.
  *
  * The PARSED SUBSET, stated precisely: `<a href="…">anchor</a>`
  * with a double-quoted href and tag-free anchor text (nested tags
  * inside anchors are out of the stated subset; the q239 chain
  * strips them before this stage in a full pipeline). Resolution
  * covers absolute `https://` links and root-relative paths
  * (resolved against the page's host); scheme-relative and
  * dot-segment forms are out of the stated subset.
  *
  * The graded fixture synthesizes per doc a page on the q243 host
  * space (www.site{d%7}.example.com) carrying three links — two
  * absolute cross-host links and one root-relative internal link —
  * with doc-derived anchors, so resolution, host extraction, and
  * the external/internal split all do real work on every row.
  *
  * Scale design (100 TB): q264 is row-local (regexp_extract_all ×2
  * + arrays_zip + posexplode — a page never crosses an exchange).
  * q265 is one map-side-combined (target_host, term) rollup
  * followed by the TopKPerGroup heap (per-partition bounded heaps
  * forward ≤ k rows per host — the anchor vocabulary is
  * corpus-sized, exactly the q220/q236 hazard, routed the same
  * way; the window fallback only serves bare fixture sessions). */
object WebGraph {

  /** Top anchor terms kept per target host (q265). */
  val AnchorTopK = 10

  private def hostOf(d: Column): Column =
    concat(lit("www.site"), (d % 7).cast("string"),
      lit(".example.com"))

  /** One `<a>` element. */
  private def aTag(href: Column, anchor: Column): Column =
    concat(lit("<a href=\""), href, lit("\">"), anchor, lit("</a>"))

  /** The synthesized page markup for a doc_id: three links — two
    * absolute external, one root-relative internal. */
  def linkFixtureCol(d: Column): Column = {
    val l0 = aTag(
      concat(lit("https://"), hostOf(d + 2), lit("/Cat"),
        ((d + 1) % 5).cast("string")),
      concat(lit("read site "), ((d + 2) % 7).cast("string"),
        lit(" category "), ((d + 1) % 5).cast("string")))
    val l1 = aTag(
      concat(lit("/Cat"), (d % 5).cast("string"), lit("/page"),
        ((d + 7) % 11).cast("string")),
      concat(lit("more page "), ((d + 7) % 11).cast("string")))
    val l2 = aTag(
      concat(lit("https://"), hostOf(d + 4), lit("/about")),
      concat(lit("about site "), ((d + 4) % 7).cast("string")))
    concat(lit("<html><body><p>intro "), d.cast("string"),
      lit("</p> "), l0, lit(" "), l1, lit(" "), l2,
      lit("</body></html>"))
  }

  private val HrefPat = "<a href=\"([^\"]*)\">(.*?)</a>"

  /** q264: documents → synthesized page → one row per link:
    * (doc_id, link_idx, page_host, href, url, target_host, anchor,
    * is_external). */
  def linkExtract(docs: DataFrame): DataFrame = {
    val withHtml = docs.select(col("doc_id"),
      hostOf(col("doc_id")).as("page_host"),
      linkFixtureCol(col("doc_id")).as("html"))
    withHtml
      .select(col("doc_id"), col("page_host"),
        posexplode(arrays_zip(
          regexp_extract_all(col("html"), lit(HrefPat), lit(1)),
          regexp_extract_all(col("html"), lit(HrefPat), lit(2))))
          .as(Seq("link_idx", "z")))
      .select(col("doc_id"), col("link_idx").cast("long")
          .as("link_idx"),
        col("page_host"), col("z").getField("0").as("href"),
        col("z").getField("1").as("anchor"))
      .withColumn("url",
        when(col("href").startsWith("https://"), col("href"))
          .otherwise(concat(lit("https://"), col("page_host"),
            col("href"))))
      .withColumn("target_host",
        regexp_extract(col("url"), "^https://([^/]+)/", 1))
      .withColumn("is_external",
        col("target_host") =!= col("page_host"))
  }

  /** q265: the anchor-text index — per TARGET host, the top
    * [[AnchorTopK]] anchor terms by count (count desc, term asc),
    * through the TopKPerGroup heap. The retrieval signal: anchors
    * are how OTHER pages describe a host. */
  def anchorIndex(docs: DataFrame): DataFrame = {
    val terms = linkExtract(docs)
      .select(col("target_host"),
        explode(split(col("anchor"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("target_host"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    topKPerGroup(terms, "target_host",
      Seq("cnt" -> false, "term" -> true), AnchorTopK)
      .select(col("target_host"), col("term"), col("cnt"),
        col("rank"))
  }

  /** q266: the host-level link graph — q264's resolved links rolled
    * up to (source host, target host) edges with link and page
    * counts, plus each edge's share of its source's outlinks (the
    * transition probability a host-graph PageRank — the q99/q104
    * kernel — consumes directly).
    *
    * Scale design (100 TB): one map-side-combined edge rollup
    * (host² bounded, dimension-sized), then a broadcast join of the
    * per-source totals — the corpus-sized link table shuffles
    * once, the host-sized frames never matter. */
  def hostGraph(docs: DataFrame): DataFrame = {
    val links = linkExtract(docs)
      .select(col("page_host").as("src_host"), col("target_host"),
        col("doc_id"))
    val edges = links
      .groupBy(col("src_host"), col("target_host"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"))
    val totals = edges.groupBy(col("src_host"))
      .agg(sum(col("n_links")).as("out_total"))
    edges.join(broadcast(totals), Seq("src_host"))
      .select(col("src_host"), col("target_host"), col("n_links"),
        col("n_docs"),
        (col("n_links").cast("double") /
          col("out_total").cast("double")).as("out_share"))
  }

  /** Per-group top-k through the TopKPerGroup heap when the session
    * carries [[graft.plans.GraftExtensions]]; group-partitioned
    * window fallback for bare fixture sessions (the
    * [[TextAnalysis.globalTopK]] pattern). */
  private def topKPerGroup(df: DataFrame, group: String,
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val extensionsActive = df.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    if (extensionsActive)
      org.apache.spark.sql.graft.TopK.perGroup(
        df, Seq(group), orderCols, k)
    else {
      val sorted = orderCols.map { case (c, asc) =>
        if (asc) col(c).asc else col(c).desc }
      df.withColumn("rank",
          row_number().over(Window.partitionBy(col(group))
            .orderBy(sorted: _*)).cast("long"))
        .filter(col("rank") <= k)
    }
  }
}
