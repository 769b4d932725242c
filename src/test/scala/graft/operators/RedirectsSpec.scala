package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q279 resolution semantics (hop counts, landing URLs,
  * the cycle verdict) and the q278 closest-capture rule. */
class RedirectsSpec extends AnyFunSuite with SparkSessionSpec {

  test("q279: chains of 0..3 hops land on the terminal URL with " +
      "exact hop counts; the planted 2-cycle is flagged " +
      "non-terminal") {
    import spark.implicits._
    val docs = ((0L until 8L) ++ Seq(98L, 99L)).map((_, "x"))
      .toDF("doc_id", "text")
    val out = Redirects.resolveRedirects(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def check(d: Long, hops: Long, terminal: Boolean,
        landing: Long): Unit = {
      val r = out(d)
      assert(r.getAs[Long]("hops") == hops, s"doc $d hops")
      assert(r.getAs[Boolean]("terminal") == terminal, s"doc $d term")
      if (terminal)
        assert(r.getAs[String]("final_url")
          .endsWith(s"/r/$landing"), s"doc $d landing")
    }
    check(0L, 0L, terminal = true, 0L)
    check(1L, 1L, terminal = true, 0L)
    check(2L, 2L, terminal = true, 0L)
    check(3L, 3L, terminal = true, 0L)
    check(4L, 0L, terminal = true, 4L)
    check(7L, 3L, terminal = true, 4L)
    // the 98<->99 cycle: MaxHops hops consumed, never terminal
    for (d <- Seq(98L, 99L)) {
      assert(out(d).getAs[Long]("hops") == Redirects.MaxHops.toLong)
      assert(!out(d).getAs[Boolean]("terminal"), s"doc $d must loop")
    }
  }

  test("q278: the closest capture wins, the exact midpoint ties to " +
      "the EARLIER capture, and the served digest is the chosen " +
      "run's") {
    import spark.implicits._
    // doc 0 (%3==0): q_ts 0 -> run 0 (dt 0); doc 1: q_ts 43200 ->
    // exact midpoint, tie -> run 0; doc 2: q_ts 86400 -> run 1
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"))
      .toDF("doc_id", "text")
    val out = Warc.waybackLookup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("best_run") == 0L)
    assert(out(0L).getAs[Long]("dt_s") == 0L)
    assert(out(1L).getAs[Long]("best_run") == 0L,
      "the midpoint tie must serve the earlier capture")
    assert(out(1L).getAs[Long]("dt_s") == 43200L)
    assert(out(2L).getAs[Long]("best_run") == 1L)
    assert(out(2L).getAs[Long]("dt_s") == 0L)
    // doc 0 was edited at run 1; the run-0 digest must be the
    // ORIGINAL text's
    import org.apache.spark.sql.functions.md5
    val orig = Seq("alpha").toDF("t")
      .select(md5(org.apache.spark.sql.functions.col("t")))
      .head().getString(0)
    assert(out(0L).getAs[String]("digest") == orig)
  }
}
