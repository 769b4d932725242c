package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rule-by-rule pins of the q243 URL canonicalization kernel and
  * the q244 host-quota composition. */
class UrlCanonicalSpec extends AnyFunSuite with SparkSessionSpec {

  private def canon(url: String): (String, String) = {
    import spark.implicits._
    val (c, h) = UrlCanonical.canonicalCols(col("url"))
    val r = Seq(url).toDF("url").select(c.as("c"), h.as("h")).head()
    (r.getString(0), r.getString(1))
  }

  test("scheme and host lowercase; PATH case is kept (RFC 3986: " +
      "only the authority is case-insensitive)") {
    assert(canon("HTTP://WWW.Ex.COM/CaseSensitive/Path")._1 ==
      "http://www.ex.com/CaseSensitive/Path")
  }

  test("default ports drop per scheme; non-default ports are kept") {
    assert(canon("http://a.com:80/x")._1 == "http://a.com/x")
    assert(canon("https://a.com:443/x")._1 == "https://a.com/x")
    assert(canon("http://a.com:8080/x")._1 == "http://a.com:8080/x")
    // the OTHER scheme's default is not this scheme's default
    assert(canon("http://a.com:443/x")._1 == "http://a.com:443/x")
  }

  test("fragments drop; trailing slashes drop (root path included)") {
    assert(canon("https://a.com/x#frag")._1 == "https://a.com/x")
    assert(canon("https://a.com/x/")._1 == "https://a.com/x")
    assert(canon("https://a.com/")._1 == "https://a.com")
  }

  test("tracking params strip by NAME, survivors sort by full k=v " +
      "segment, an emptied query drops its '?'") {
    assert(canon("https://a.com/x?b=2&utm_source=n&a=1")._1 ==
      "https://a.com/x?a=1&b=2")
    assert(canon("https://a.com/x?fbclid=z&ref=t")._1 ==
      "https://a.com/x")
    // a value that LOOKS like a tracking name does not strip
    assert(canon("https://a.com/x?q=utm_source")._1 ==
      "https://a.com/x?q=utm_source")
  }

  test("host output strips the port and lowercases whatever the " +
      "canonical URL keeps") {
    assert(canon("HTTP://A.Com:8080/x")._2 == "a.com")
  }

  test("q244 host quota: exactly min(quota, host size) rows per " +
      "canonical host, q34's operator unchanged") {
    import spark.implicits._
    val docs = spark.range(0, 500).select(col("id").as("doc_id"),
      lit("t").as("text"))
    val out = UrlCanonical.hostQuota(docs.toDF())
      .groupBy(col("host")).agg(count(lit(1)).as("n"))
      .collect()
    assert(out.length == 7) // doc_id % 7 hosts
    // every host holds 71-72 docs (500 over 7), all above the quota,
    // so each is cut to exactly HostQuota
    out.foreach(r =>
      assert(r.getAs[Long]("n") == UrlCanonical.HostQuota.toLong))
  }

  test("the q243 plan is one row-local projection — no shuffle") {
    import spark.implicits._
    val df = UrlCanonical.urlCanonical(
      Seq((1L, "t")).toDF("doc_id", "text"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "canonicalization must not shuffle")
  }

  private def pct(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("url")
      .select(UrlCanonical.pctNormalizeCol(col("url")).as("p"))
      .head().getString(0)
  }

  test("q293 pct rules: unreserved %XX decodes (alpha, digit, " +
      "tilde, dash, dot, underscore), reserved escapes stay but " +
      "uppercase, and a %-free URL passes through unchanged") {
    assert(pct("https://h/%7Euser") == "https://h/~user")
    assert(pct("https://h/%7euser") == "https://h/~user") // lc hex
    assert(pct("https://h/a%41%62%39%2D%2e%5F") ==
      "https://h/aAb9-._")
    // reserved: / ? # & = space stay escaped, hex uppercased
    assert(pct("https://h/a%2fb%3Fc%23%26%3d%20x") ==
      "https://h/a%2Fb%3Fc%23%26%3D%20x")
    assert(pct("https://h/plain?a=1") == "https://h/plain?a=1")
    // adjacent escapes, escape at end of string
    assert(pct("https://h/%41%42") == "https://h/AB")
    assert(pct("https://h/x%7E") == "https://h/x~")
  }

  test("q293 composition: %7Euser and ~user spellings of one " +
      "resource share ONE canonical URL, and q294 reports the " +
      "halving per host") {
    import spark.implicits._
    val docs = (0L until 20L).toDF("doc_id")
    val out = UrlCanonical.urlPctCanonical(docs).collect()
    val byCanon = out.groupBy(_.getAs[String]("canonical_url"))
    assert(byCanon.forall(_._2.length == 2),
      "every canonical URL must be reached by exactly two spellings")
    assert(out.map(_.getAs[String]("url")).distinct.length == 20)
    val stats = UrlCanonical.urlPctCollapse(docs).collect()
    for (r <- stats) {
      assert(r.getAs[Long]("n_canonical") * 2 == r.getAs[Long]("n_raw"),
        s"host ${r.getAs[String]("host")}")
      assert(r.getAs[Long]("n_quota_kept") ==
        math.min(r.getAs[Long]("n_canonical"), UrlCanonical.HostQuota))
    }
  }

  test("the q293 plan is one row-local projection — no shuffle") {
    import spark.implicits._
    val plan = UrlCanonical.urlPctCanonical(
        Seq(1L).toDF("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in:\n$plan")
  }

  test("q273: the PSL longest-match rule — multi-label suffixes " +
      "beat their parent TLD, the private blogspot entry splits " +
      "sibling subdomains, and a bare suffix has no registrable " +
      "domain") {
    import spark.implicits._
    val docs = (0L until 8L).map((_, "x")).toDF("doc_id", "text")
    val out = UrlCanonical.registrableDomain(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def check(d: Long, sfx: String, reg: String): Unit = {
      assert(out(d).getAs[String]("public_suffix") == sfx,
        s"doc $d suffix")
      assert(out(d).getAs[String]("registrable_domain") == reg,
        s"doc $d registrable")
    }
    check(0L, "com", "example.com")        // www.news.example.com
    check(1L, "co.uk", "shop.co.uk")       // co.uk beats uk
    check(2L, "com", "example.com")        // already eTLD+1
    check(3L, "blogspot.com", "foo.blogspot.com") // private entry
    check(4L, "org", "example.org")
    check(5L, "ac.uk", "university.ac.uk")
    check(6L, "co.jp", "service.co.jp")
    check(7L, "io", "example.io")
    // blogspot siblings are DIFFERENT registrants under the private
    // entry, same registrant under a naive com+1 rule
    assert(out(3L).getAs[String]("registrable_domain") !=
      "blogspot.com")
  }

  test("the q273 plan is row-local — a constant list, no join, no " +
      "shuffle") {
    import spark.implicits._
    val plan = UrlCanonical.registrableDomain(
        Seq((1L, "t")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"PSL matching must be row-local:\n$plan")
  }

  test("q283: slots sum EXACTLY to the budget, big domains get " +
      "sublinearly more, and the remainder goes to the largest " +
      "fractional parts") {
    import spark.implicits._
    val docs = (0L until 80L).map((_, "x")).toDF("doc_id", "text")
    val out = UrlCanonical.crawlBudgetAllocation(docs).collect()
    assert(out.map(_.getAs[Long]("budget_slots")).sum ==
      UrlCanonical.CrawlBudget,
      "largest-remainder must make the slots sum exact")
    for (r <- out) {
      assert(r.getAs[Long]("budget_slots") ==
        r.getAs[Long]("base") + r.getAs[Long]("extra"))
      assert(Set(0L, 1L)(r.getAs[Long]("extra")))
      assert(r.getAs[Double]("weight") ==
        math.sqrt(r.getAs[Long]("n_pages").toDouble))
    }
    // sublinearity: a domain with 4x the pages gets < 4x the slots
    val byPages = out.sortBy(_.getAs[Long]("n_pages"))
    if (byPages.length >= 2) {
      val small = byPages.head; val big = byPages.last
      if (big.getAs[Long]("n_pages") >= 4 * small.getAs[Long]("n_pages"))
        assert(big.getAs[Long]("budget_slots").toDouble /
          small.getAs[Long]("budget_slots") <
          big.getAs[Long]("n_pages").toDouble /
            small.getAs[Long]("n_pages"))
    }
    val shares = out.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-9)
  }

  test("q282-adjacent plan shape: the q283 plan has no " +
      "single-partition exchange when the extensions are active " +
      "(bare sessions fall back, the globalTopK contract)") {
    import spark.implicits._
    val plan = UrlCanonical.crawlBudgetAllocation(
        Seq((1L, "t")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    // bare fixture session: the fallback window is allowed; the
    // pin here is no cartesian and broadcast joins for the 1-row
    // frames
    assert(!plan.toLowerCase.contains("cartesianproduct") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"1-row frames must broadcast:\n$plan")
  }
}
