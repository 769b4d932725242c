package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTTP redirect-chain resolution (q279) — the crawl stage between
  * fetching and EVERY url-keyed operator: a crawl's 301/302 edges
  * form chains (and occasionally cycles), and quotas, dedup, and
  * link graphs are all wrong until each URL is resolved to its
  * final landing URL. Resolution follows chains up to [[MaxHops]]
  * hops; a URL still redirecting after that is flagged
  * non-terminal (the cycle/too-long verdict a crawler stores
  * explicitly — never a silent wrong answer).
  *
  * The graded fixture synthesizes a redirect table whose chain
  * lengths span 0..3 (doc d redirects to d−1 unless d % 4 == 0,
  * which is terminal) plus a planted 2-CYCLE on every
  * d % 100 ∈ {98, 99} pair — so every hop count and the loop
  * verdict occur on every run.
  *
  * Scale design (100 TB): [[MaxHops]] equi self-joins on the URL
  * key (the stated max chain; pointer-doubling — resolving
  * redirect→redirect edges once and jumping 2^k hops per round —
  * is the log-round variant this operator would switch to if real
  * chains were long, the q57 prefix-doubling discipline); each join
  * is key-partitioned, nothing global. */
object Redirects {

  /** Hop budget of [[resolveRedirects]]. */
  val MaxHops = 4

  private def urlOf(d: Column): Column =
    concat(lit("https://www.site"), (d % 7).cast("string"),
      lit(".example.com/r/"), d.cast("string"))

  /** The synthesized redirect table: (url, target). */
  def redirectTable(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    docs.select(urlOf(d).as("url"),
      when(d % 100 === 98, urlOf(d + 1))
        .when(d % 100 === 99, urlOf(d - 1))
        .when(d % 4 =!= 0, urlOf(d - 1))
        .otherwise(lit(null).cast("string")).as("target"))
      .filter(col("target").isNotNull)
  }

  /** q279: every URL resolved to its landing URL:
    * (doc_id, src_url, final_url, hops, terminal). */
  def resolveRedirects(docs: DataFrame): DataFrame = {
    val redirects = redirectTable(docs)
    var cur = docs.select(col("doc_id"),
      urlOf(col("doc_id")).as("src_url"))
      .withColumn("cur", col("src_url"))
      .withColumn("hops", lit(0L))
    for (_ <- 1 to MaxHops) {
      cur = cur
        .join(redirects.select(col("url").as("cur"),
          col("target").as("nxt")), Seq("cur"), "left")
        .select(col("doc_id"), col("src_url"),
          coalesce(col("nxt"), col("cur")).as("cur"),
          (col("hops") +
            when(col("nxt").isNotNull, 1L).otherwise(0L)).as("hops"))
    }
    cur
      .join(redirects.select(col("url").as("cur"),
        lit(true).as("is_src")), Seq("cur"), "left")
      .select(col("doc_id"), col("src_url"),
        col("cur").as("final_url"), col("hops"),
        coalesce(!col("is_src"), lit(true)).as("terminal"))
  }
}
