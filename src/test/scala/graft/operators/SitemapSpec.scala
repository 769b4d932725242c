package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q253 sitemap parse rules and the q254 frontier
  * composition: robots gating, best-hint URL collapse, and the
  * politeness schedule's slot arithmetic. */
class SitemapSpec extends AnyFunSuite with SparkSessionSpec {

  test("q253: every <url> block parses in document order with its " +
      "loc/lastmod/changefreq/priority fields") {
    import spark.implicits._
    val docs = Seq((6L, "x")).toDF("doc_id", "text")
    val rows = Sitemap.sitemapEntries(docs).collect()
      .sortBy(_.getAs[Long]("entry_idx"))
    assert(rows.length == Sitemap.EntriesPerMap)
    // entry 0: the doc's own page on its host
    assert(rows(0).getAs[String]("loc") ==
      "https://www.site6.example.com/Cat1/page6")
    assert(rows(0).getAs[String]("lastmod") == "2024-03-07")
    assert(rows(0).getAs[String]("changefreq") == "daily") // 6%3=0
    assert(rows(0).getAs[Double]("priority") == 0.6)
    // entry 1: the category page; entry 2: /about
    assert(rows(1).getAs[String]("loc") ==
      "https://www.site6.example.com/Cat1")
    assert(rows(1).getAs[String]("changefreq") == "weekly") // 7%3=1
    assert(rows(2).getAs[String]("loc") ==
      "https://www.site6.example.com/about")
    assert(rows(2).getAs[Double]("priority") == 0.8)
  }

  test("q254: a disallowed category page never reaches the " +
      "frontier; the longest-match re-allow does") {
    import spark.implicits._
    // doc 35: host www.site0 (35%7=0), cat 0 (35%5=0) -> /Cat0 is
    // DISALLOWED on site0; page 35%11=2 != 0 so no re-allow
    val docs = Seq((35L, "x")).toDF("doc_id", "text")
    val locs = Sitemap.crawlFrontier(docs).collect()
      .map(_.getAs[String]("loc")).toSet
    assert(locs == Set("https://www.site0.example.com/about"),
      s"only /about may survive, got $locs")
    // doc 0: cat 0, page 0 -> /Cat0/page0 is the re-ALLOWED page
    val locs0 = Sitemap.crawlFrontier(
      Seq((0L, "x")).toDF("doc_id", "text")).collect()
      .map(_.getAs[String]("loc")).toSet
    assert(locs0.contains("https://www.site0.example.com/Cat0/page0"),
      "the longest-prefix Allow must win over the category Disallow")
    assert(!locs0.contains("https://www.site0.example.com/Cat0"))
  }

  test("q254: a page listed by many sitemaps collapses to one " +
      "frontier row keeping max priority, freshest lastmod, and " +
      "the ref count") {
    import spark.implicits._
    // docs 2 and 9: both host site2 (2%7=9%7=2), both list /about
    // with priorities 0.(2+2)=0.4 and 0.(9+2)=0.1
    val docs = Seq((2L, "x"), (9L, "y")).toDF("doc_id", "text")
    val about = Sitemap.crawlFrontier(docs).collect()
      .filter(_.getAs[String]("path") == "/about")
    assert(about.length == 1)
    assert(about.head.getAs[Long]("n_refs") == 2L)
    assert(about.head.getAs[Double]("priority") == 0.4)
    assert(about.head.getAs[String]("lastmod") == "2024-03-12")
  }

  test("q254: slots are 0-based per host in (priority desc, loc) " +
      "order and fetch times step by the politeness delay") {
    import spark.implicits._
    val docs = (0L until 40L).map((_, "x")).toDF("doc_id", "text")
    val rows = Sitemap.crawlFrontier(docs).collect()
    val byHost = rows.groupBy(_.getAs[String]("host"))
    for ((_, hs) <- byHost) {
      val sorted = hs.sortBy(_.getAs[Long]("slot"))
      assert(sorted.head.getAs[Long]("slot") == 0L)
      assert(sorted.map(_.getAs[Long]("slot")).toSeq ==
        (0L until sorted.length.toLong))
      for (r <- sorted)
        assert(r.getAs[Long]("fetch_at_ms") ==
          r.getAs[Long]("slot") * Sitemap.CrawlDelayMs)
      // priority non-increasing down the slots
      val ps = sorted.map(_.getAs[Double]("priority")).toSeq
      assert(ps == ps.sorted.reverse, s"priorities out of order: $ps")
      assert(sorted.length <= Sitemap.FrontierSlots)
    }
  }

  test("the q253 plan is row-local (no shuffle); q254's only " +
      "corpus-side exchanges are the broadcast rule join and the " +
      "collapse — never a single-partition window") {
    import spark.implicits._
    val docs = Seq((1L, "t")).toDF("doc_id", "text")
    val p253 = Sitemap.sitemapEntries(docs)
      .queryExecution.executedPlan.toString
    assert(!p253.contains("Exchange"), s"q253 must not shuffle:\n$p253")
    val p254 = Sitemap.crawlFrontier(docs)
      .queryExecution.executedPlan.toString
    assert(!p254.contains("Exchange SinglePartition"),
      s"q254 must have no single-partition exchange:\n$p254")
    assert(p254.contains("BroadcastExchange"),
      "the rule join must broadcast")
  }

  test("q300 sitemap index: two-level resolution — every index ref " +
      "resolves to a child whose entries parse through the q253 " +
      "kernel, identity recovered FROM the ref URL; plan row-local") {
    import spark.implicits._
    val out = Sitemap.sitemapIndexResolved(
        Seq(4L, 11L).toDF("doc_id")).collect()
    assert(out.length == 2 * Sitemap.IndexChildren *
      Sitemap.EntriesPerChild)
    for (r <- out) {
      val d = r.getAs[Long]("doc_id")
      val j = r.getAs[Long]("sitemap_idx")
      val i = r.getAs[Long]("entry_idx")
      val k = d + 3 * j + i
      assert(r.getAs[String]("sitemap_loc") ==
        s"https://www.site${d % 7}.example.com/sitemap-$d-$j.xml")
      assert(r.getAs[String]("loc") ==
        s"https://www.site${d % 7}.example.com/Cat${d % 5}/s$j/p${k % 11}")
      assert(r.getAs[Double]("priority") == (k % 10) / 10.0)
    }
    val plan = Sitemap.sitemapIndexResolved(Seq(1L).toDF("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in:\n$plan")
  }

  test("q321 feeds: RSS month-name dates normalize to the SAME iso " +
      "instant the Atom twin carries; link comes from an element in " +
      "RSS, an href attribute in Atom; entry counts follow the " +
      "fixture") {
    import spark.implicits._
    val docs = (0L until 12L).map((_, "x")).toDF("doc_id", "text")
    val rows = Sitemap.feedEntries(docs).collect()
    assert(rows.length == (0L until 12L).map(i => 1 + i % 3).sum)
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      val k = r.getAs[Long]("entry_idx")
      val kk = id + k
      assert(r.getAs[String]("format") ==
        (if (id % 2 == 0) "rss" else "atom"))
      assert(r.getAs[String]("title") == s"Post $id-$k")
      assert(r.getAs[String]("link") ==
        s"https://www.site${id % 7}.example.com/p/$id-$k")
      assert(r.getAs[String]("guid") == s"urn:p:$id-$k")
      // the ISO instant is format-INDEPENDENT: the RSS side must
      // have mapped 'Jun' -> 06 etc. to reach it
      assert(r.getAs[String]("published_iso") ==
        f"2024-${kk % 12 + 1}%02d-${kk % 28 + 1}%02dT10:${kk % 60}%02d:00Z",
        s"doc $id entry $k")
    }
  }

  test("q319 discovery: every q243 host's robots Sitemap line " +
      "resolves to its sitemap and parses to the q253 entry shapes " +
      "(kernel shared — the entries EQUAL sitemapEntries keyed by " +
      "the host id)") {
    import spark.implicits._
    val docs = (0L until 40L).map((_, "x")).toDF("doc_id", "text")
    val rows = Sitemap.sitemapDiscovery(docs).collect()
    assert(rows.length == 7 * Sitemap.EntriesPerMap)
    for (r <- rows) {
      val host = r.getAs[String]("host")
      assert(r.getAs[String]("sitemap_url") ==
        s"https://$host/sitemap.xml")
      assert(r.getAs[String]("loc").startsWith(s"https://$host/"))
    }
    // kernel parity: host h's entries == sitemapEntries for doc_id h
    val viaDoc = Sitemap.sitemapEntries(
      Seq((3L, "x")).toDF("doc_id", "text")).collect()
      .map(r => (r.getAs[Long]("entry_idx"), r.getAs[String]("loc"),
        r.getAs[String]("lastmod"))).toSet
    val viaDiscovery = rows
      .filter(_.getAs[String]("host") == "www.site3.example.com")
      .map(r => (r.getAs[Long]("entry_idx"), r.getAs[String]("loc"),
        r.getAs[String]("lastmod"))).toSet
    assert(viaDiscovery == viaDoc)
  }
}
