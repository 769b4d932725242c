package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph-centrality operators over the relational fixture tables —
  * the quality-weighting member of the training-data pipeline
  * surface: a web-crawl corpus weights documents by the link-graph
  * centrality of their host (Common-Crawl-style harmonic/PageRank
  * weighting), and the same iterate-until-k fixed-point shape powers
  * label propagation and hub detection. The fixture stand-in graph is
  * the customer↔supplier co-purchase graph (an edge per distinct
  * customer–supplier pair observed in lineitem×orders), symmetric so
  * every node has both in- and out-degree — no dangling-mass term.
  *
  * Scale design (100 TB): the edge list is built once (one
  * distinct-shuffle), partitioned on `src` and PERSISTED — every
  * iteration's rank⋈edge join then reuses that exchange, shuffling
  * only the (node, rank) frame, which is |V| rows against the edge
  * list's |E| (|V| ≪ |E| on any real graph). Contribution sums are
  * partial-aggregated map-side before the `dst` exchange. The
  * iteration count is a fixed constant, so the lineage stays a
  * k-deep join tree — no driver-side loop over collected data, no
  * checkpoint needed at k = 3 (a production run at k ≳ 10 would
  * checkpoint every few iterations to cut lineage, same plan
  * otherwise).
  */
object Graph {

  /** PageRank damping factor (the classic 0.85) and its complement —
    * the complement is computed HERE once so the Spark plan and the
    * DuckDB oracle interpolate the bit-identical double. */
  val Damping = 0.85
  val OneMinusDamping: Double = 1 - Damping

  /** Fixed iteration count of the graded query (q99). */
  val PageRankIters = 3

  /** Node encoding: customers at custkey·2, suppliers at suppkey·2+1
    * — one LONG key space, no string concat in the shuffle key. */
  private def cNode(custkey: Column): Column = custkey * 2
  private def sNode(suppkey: Column): Column = suppkey * 2 + 1

  /** Symmetric co-purchase edge list: one edge pair per DISTINCT
    * (customer, supplier) relationship in lineitem×orders. Both
    * directions come out of ONE explode over the co-purchase frame —
    * a union of two selects would evaluate the join+distinct twice. */
  def coPurchaseEdges(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val co = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    co.select(explode(array(
        struct(cNode(col("c")).as("src"), sNode(col("s")).as("dst")),
        struct(sNode(col("s")).as("src"), cNode(col("c")).as("dst"))))
        .as("e"))
      .select(col("e.src"), col("e.dst"))
  }

  /** PageRank over the co-purchase graph, [[PageRankIters]] synchronous
    * iterations from the uniform vector:
    *
    *   r₀(v)    = 1 / N
    *   rₖ₊₁(v) = (1 − d)/N + d · Σ_{u→v} rₖ(u) / deg(u)
    *
    * Output: (node_type 'c'|'s', key, rank) — one row per node, ranks
    * summing to 1 (symmetric graph, no dangling mass). */
  def pageRank(lineitem: DataFrame, orders: DataFrame): DataFrame =
    pageRankWithHandle(lineitem, orders)._1

  /** [[pageRank]] plus the [[graft.util.CacheHandle]] releasing the
    * persisted (src, dst, deg) edge frame and the degree frame the
    * iterations share. */
  def pageRankWithHandle(lineitem: DataFrame,
      orders: DataFrame): (DataFrame, graft.util.CacheHandle) = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // edge frame persisted at its src partitioning: deg and ew both
    // read the cache, so the lineitem⋈orders build runs exactly once
    val edges = coPurchaseEdges(lineitem, orders)
      .repartition(col("src")).persist(level)
    // deg (|V| rows) is referenced by every iteration's node frame
    // and the N scalar — persisted, or each reference would re-run
    // the whole edge build
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("deg")).persist(level)
    // (src, dst, deg): the per-iteration join input, shuffled once
    val ew = edges.join(deg, "src").persist(level)
    val nodes = deg.select(col("src").as("node"))
    // broadcast-scalar N: every row needs it; never a driver collect
    val nRow = broadcast(deg.agg(count(lit(1)).cast("long").as("n")))

    var ranks = nodes.crossJoin(nRow)
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    for (_ <- 1 to PageRankIters) {
      val contrib = ew
        .join(ranks, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("mass"))
      ranks = nodes.crossJoin(nRow)
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(OneMinusDamping) / col("n") +
            lit(Damping) * coalesce(col("mass"), lit(0.0))).as("rank"))
    }
    (ranks.select(
      when(col("node") % 2 === 0, "c").otherwise("s").as("node_type"),
      expr("node DIV 2").as("key"),
      col("rank")),
      graft.util.CacheHandle(ew, deg, edges))
  }
}
