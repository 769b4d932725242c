package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q249 REP semantics: longest-prefix specificity, the
  * Allow-wins tie-break, default allow, and the broadcast-only plan
  * shape. */
class RobotsSpec extends AnyFunSuite with SparkSessionSpec {

  private def gate(ids: Seq[Long]) = {
    import spark.implicits._
    Robots.robotsGate(ids.map(i => (i, "t")).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("the longest matching prefix wins: /Cat<h>/page<h> re-ALLOWS " +
      "a page inside the disallowed /Cat<h>") {
    // doc 0: host 0, path /Cat0/page0 — both rules match, Allow longer
    // doc 35: host 0 (35%7=0), Cat 0 (35%5=0), page 2 (35%11=2) —
    //         only the Disallow matches
    val r = gate(Seq(0L, 35L))
    assert(r(0L).getAs[String]("path") == "/Cat0/page0")
    assert(r(0L).getAs[Boolean]("allowed"))
    assert(r(0L).getAs[String]("rule") == "/Cat0/page0")
    assert(r(35L).getAs[String]("path") == "/Cat0/page2")
    assert(!r(35L).getAs[Boolean]("allowed"))
    assert(r(35L).getAs[String]("rule") == "/Cat0")
  }

  test("no matching rule means allowed with an empty rule") {
    // doc 1: host 1 (1%7), Cat 1 (1%5)... both host and cat 1 match;
    // doc 2: host 2, Cat 2 — matches its host's /Cat2 disallow; pick
    // doc 8: host 1 (8%7=1), Cat 3 (8%5=3) — no rule matches /Cat3
    val r = gate(Seq(8L))
    assert(r(8L).getAs[String]("rule") == "")
    assert(r(8L).getAs[Boolean]("allowed"))
  }

  test("on a LENGTH TIE the Allow wins (the published tie-break)") {
    import spark.implicits._
    // synthetic rule pair of equal length on one host
    val pages = Seq((1L, "www.x.com", "/a/b")).toDF("doc_id", "host", "path")
    val rules = Seq(("www.x.com", 0, "/a/b"), ("www.x.com", 1, "/a/b"),
      ("www.x.com", 0, "/a"))
      .toDF("host", "is_allow", "prefix")
      .groupBy(col("host"))
      .agg(collect_list(struct(col("is_allow"), col("prefix")))
        .as("rules"))
    val out = pages.join(broadcast(rules), Seq("host"), "left")
      .withColumn("matches", filter(col("rules"), r =>
        col("path").startsWith(r.getField("prefix"))))
      .withColumn("win", array_max(transform(col("matches"), r =>
        struct(length(r.getField("prefix")).as("l"),
          r.getField("is_allow").as("a"),
          r.getField("prefix").as("p")))))
      .select(coalesce(col("win.a") === 1, lit(true)).as("allowed"))
      .head()
    assert(out.getAs[Boolean]("allowed"),
      "equal-length Allow must beat the Disallow")
  }

  test("plan shape: the corpus never shuffles — the only hash " +
      "exchange is the host-cardinality rule-table rollup feeding " +
      "the broadcast") {
    import spark.implicits._
    val df = Robots.robotsGate(
      Seq((1L, "t")).toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      "exactly one exchange: the rule-table collect_list rollup")
    assert(plan.contains("BroadcastHashJoin"),
      "the rule table must broadcast into the corpus join")
    // the rule exchange keys on host (21 rows), never on doc_id
    assert(!plan.contains("Exchange hashpartitioning(doc_id"),
      "no corpus-keyed exchange may exist")
  }

  test("q269: the parsed '*' rules equal the q249 rule tuples " +
      "verbatim — the two stages cannot drift") {
    import spark.implicits._
    val docs = (0L until 7L).map((_, "x")).toDF("doc_id", "text")
    val parsed = Robots.robotsParse(docs).collect()
    val starRules = parsed
      .filter(r => r.getAs[String]("agent") == "*" &&
        Set("allow", "disallow")(r.getAs[String]("directive")))
      .map(r => (r.getAs[String]("host"),
        if (r.getAs[String]("directive") == "allow") 1 else 0,
        r.getAs[String]("value")))
      .toSet
    assert(starRules == Robots.RuleTuples.toSet,
      "parse output must reproduce the evaluation rule set")
  }

  test("q269: comments and blanks skip, unknown directives drop, " +
      "Sitemap is global, badbot group attributes correctly, and " +
      "values keep sitemap-URL colons intact") {
    import spark.implicits._
    val docs = Seq((3L, "x")).toDF("doc_id", "text")
    val rows = Robots.robotsParse(docs).collect()
    assert(rows.length == 6) // 4 star rules + sitemap + badbot
    val sm = rows.filter(_.getAs[String]("directive") == "sitemap")
    assert(sm.length == 1)
    assert(sm.head.getAs[String]("agent") == "",
      "Sitemap must be group-independent")
    assert(sm.head.getAs[String]("value") ==
      "https://www.site3.example.com/sitemap.xml")
    val bad = rows.filter(_.getAs[String]("agent") == "badbot")
    assert(bad.length == 1 &&
      bad.head.getAs[String]("value") == "/")
    val cd = rows.filter(_.getAs[String]("directive") == "crawl-delay")
    assert(cd.head.getAs[String]("value") == "4") // 3 % 5 + 1
    assert(!rows.exists(_.getAs[String]("directive") == "user-agent"))
  }

  test("q296 wildcard rules: `*` runs, `$` anchors (page1 allowed " +
      "but page10 NOT swallowed), pattern-length precedence, and " +
      "the Allow-wins equal-length tie") {
    import spark.implicits._
    // doc ids chosen for (host=id%7, cat=id%5, page=id%11):
    //   id 12 -> host 5, cat 2, page 1  : "*/page1$" (len 8) allows
    //   id 21 -> host 0, cat 1, page 10 : "*/page10$" (len 9) disallows
    //   id  7 -> host 0, cat 2, page 7  : len-8 tie -> Allow wins
    //   id 17 -> host 3, cat 2, page 6  : "/Cat2/*" (len 7) allows
    //   id  3 -> host 3, cat 3, page 3  : only "/Cat*" -> disallow
    val out = Robots.robotsWildcardGate(
        Seq(12L, 21L, 7L, 17L, 3L).map(i => (i, "t"))
          .toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def check(id: Long, allowed: Boolean, rule: String): Unit = {
      assert(out(id).getAs[Boolean]("allowed") == allowed, s"doc $id")
      assert(out(id).getAs[String]("rule") == rule, s"doc $id rule")
    }
    check(12L, allowed = true, "*/page1$")
    check(21L, allowed = false, "*/page10$")
    check(7L, allowed = true, "*/page7$")
    check(17L, allowed = true, "/Cat2/*")
    check(3L, allowed = false, "/Cat*")
  }

  test("q296 pattern translation: prefix match without `$`, full " +
      "anchor with it") {
    assert(Robots.wildcardToRegex("/Cat*") == "^/Cat.*")
    assert(Robots.wildcardToRegex("*/page1$") == "^.*/page1$")
    // prefix semantics: /CatX matches /CatX/deeper (regex unanchored
    // at the end), but the $ form does not
    assert("/Cat0/page10".matches("^.*/page1$") == false)
    assert(java.util.regex.Pattern.compile("^/Cat.*")
      .matcher("/Cat3/page9").find())
    // regex metachars in the PATTERN are literals (RFC 9309 knows
    // only '*' and a final '$') — r15 ADVICE: '.', '+', '(' must not
    // change match semantics
    assert(Robots.wildcardToRegex("/a.php$") == "^/a\\.php$")
    assert("/a.php".matches(Robots.wildcardToRegex("/a.php$")))
    assert(!"/aXphp".matches(Robots.wildcardToRegex("/a.php$")))
    val plus = Robots.wildcardToRegex("/c++/docs*")
    assert(java.util.regex.Pattern.compile(plus)
      .matcher("/c++/docs/intro").find())
    // a mid-pattern '$' is a literal dollar, only the FINAL one
    // anchors
    assert(java.util.regex.Pattern.compile(
      Robots.wildcardToRegex("/p$q*")).matcher("/p$q/r").find())
  }

  test("q270: fetch times step by the host's OWN parsed " +
      "crawl-delay, not the constant default") {
    import spark.implicits._
    val docs = (0L until 40L).map((_, "x")).toDF("doc_id", "text")
    val rows = Sitemap.crawlFrontierDelayed(docs).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val h = r.getAs[String]("host")
        .stripPrefix("www.site").takeWhile(_.isDigit).toLong
      assert(r.getAs[Long]("delay_s") == h % 5 + 1,
        s"delay for $h")
      assert(r.getAs[Long]("fetch_at_ms") ==
        r.getAs[Long]("slot") * r.getAs[Long]("delay_s") * 1000L)
    }
    // at least two different delays must occur across hosts
    assert(rows.map(_.getAs[Long]("delay_s")).distinct.length >= 2)
  }
}
