package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite with SparkSessionSpec {

  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("pagerank is a probability vector over every co-purchase node") {
    val (pr, handle) = Graph.pageRankWithHandle(lineitem, orders)
    val rows = pr.collect()
    try {
      val nNodes = Graph.coPurchaseEdges(lineitem, orders)
        .select("src").distinct().count()
      assert(rows.length == nNodes)
      val total = rows.map(_.getAs[Double]("rank")).sum
      assert(math.abs(total - 1.0) < 1e-9, s"ranks sum to $total")
      rows.foreach(r => assert(r.getAs[Double]("rank") > 0))
    } finally handle.release()
  }

  test("a high-degree hub outranks every leaf pointing at it") {
    import spark.implicits._
    // star: customer 1 buys from suppliers 1..10 -> supplier nodes are
    // leaves, the customer is the hub
    val li = (1 to 10).map(s => (1L, s.toLong)).toDF("l_orderkey", "l_suppkey")
    val os = Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
    val pr = Graph.pageRank(li, os).collect()
      .map(r => (r.getAs[String]("node_type"), r.getAs[Long]("key")) ->
        r.getAs[Double]("rank")).toMap
    val hub = pr(("c", 1L))
    val leaves = pr.collect { case (("s", _), v) => v }
    assert(leaves.size == 10)
    assert(leaves.forall(_ < hub))
    // symmetric leaves are exchangeable -> identical ranks
    assert(leaves.toSet.size == 1)
  }

  test("uniform ranks are the fixed point of a regular graph") {
    import spark.implicits._
    // 2 customers x 2 suppliers complete bipartite: every node degree 2
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
      .toDF("l_orderkey", "l_suppkey")
    val os = Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
    val ranks = Graph.pageRank(li, os).collect().map(_.getAs[Double]("rank"))
    assert(ranks.length == 4)
    ranks.foreach(r => assert(math.abs(r - 0.25) < 1e-12))
  }
}
