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
      .withColumn("win", array_max(transform(col("matches"), r =>
        struct(length(r.getField("prefix")).as("l"),
          r.getField("is_allow").as("a"),
          r.getField("prefix").as("p")))))
      .select(col("doc_id"), col("host"), col("path"),
        coalesce(col("win.p"), lit("")).as("rule"),
        coalesce(col("win.a") === 1, lit(true)).as("allowed"))
  }
}
