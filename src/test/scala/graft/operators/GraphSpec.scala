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

  test("directed kernel: dangling-mass redistribution conserves " +
      "probability mass; equals a hand-rolled reference") {
    import spark.implicits._
    // chain + sink: 1→2, 1→3, 2→3 (node 3 is dangling)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val (pr, handle) = Graph.pageRankDirectedWithHandle(edges, iters = 4)
    val got = pr.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    try {
      // without the dangling term this graph LEAKS node 3's mass every
      // iteration; with it, ranks must stay a probability vector
      assert(math.abs(got.values.sum - 1.0) < 1e-12,
        s"mass sum ${got.values.sum}")
      // hand-rolled synchronous reference
      val d = Graph.Damping
      var r = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
      for (_ <- 1 to 4) {
        val dm = r(3L)
        r = Map(
          1L -> ((1 - d) / 3 + d * (0.0 + dm / 3)),
          2L -> ((1 - d) / 3 + d * (r(1L) / 2 + dm / 3)),
          3L -> ((1 - d) / 3 + d * (r(1L) / 2 + r(2L) / 1 + dm / 3)))
      }
      got.foreach { case (n, v) =>
        assert(math.abs(v - r(n)) < 1e-12, s"node $n: $v vs ${r(n)}")
      }
      // the sink absorbs the chain: strictly the largest rank
      assert(got(3L) > got(2L) && got(2L) > got(1L))
    } finally handle.release()
  }

  test("directed kernel: delta early stop halts at the tolerance and " +
      "matches the fixed-iteration run of the stopped-at count") {
    import spark.implicits._
    // small graph so convergence (delta ratio ≈ 0.25/iter here)
    // triggers in a handful of rounds; the sf0.001 co-purchase graph
    // contracts at ≈ 0.8/iter and needs ~30 rounds to cross 1e-4 —
    // measured, which is exactly why tol is a knob, not a default
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    var rounds = List.empty[(Int, Double)]
    val (pr, h1) = Graph.pageRankDirectedWithHandle(edges, iters = 20,
      tol = 1e-3, onRound = (i, d) => rounds ::= (i, d))
    val stopped = pr.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    h1.release()
    val deltas = rounds.reverse
    // the tolerance must genuinely trigger before the cap, with every
    // earlier round above it (the stop fires at the FIRST crossing)
    assert(deltas.size < 20, s"no early stop in ${deltas.size} rounds")
    assert(deltas.last._2 < 1e-3)
    assert(deltas.dropRight(1).forall(_._2 >= 1e-3))
    val (pr2, h2) = Graph.pageRankDirectedWithHandle(edges,
      iters = deltas.size, tol = 0.0)
    val fixed = pr2.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    h2.release()
    assert(stopped.keySet == fixed.keySet)
    stopped.foreach { case (n, v) =>
      assert(math.abs(v - fixed(n)) < 1e-12, s"node $n diverged")
    }
  }

  test("directed kernel: checkpoint cadence does not change results " +
      "(content invariance at every-iteration vs never-within-k)") {
    import spark.implicits._
    val edges = Graph.directedEdges(lineitem, orders)
    val (a, ha) = Graph.pageRankDirectedWithHandle(edges, iters = 6,
      checkpointEvery = 1)
    val (b, hb) = Graph.pageRankDirectedWithHandle(edges, iters = 6,
      checkpointEvery = 100)
    val ma = a.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mb = b.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ha.release(); hb.release()
    assert(ma.keySet == mb.keySet)
    // the float TREE is identical either way; what cadence changes is
    // partition boundaries (checkpoint vs cache), and with them the
    // merge order of the contribution sums — last-ulp noise (~1e-17
    // here), 5 decades below the RankRoundDigits=12 grain the graded
    // output rounds BOTH engines to. Assert at that contract, not at
    // bit-identity of an unordered double sum.
    ma.foreach { case (n, v) =>
      assert(math.abs(v - mb(n)) < 1e-14, s"node $n: $v vs ${mb(n)}") }
  }

  test("host quality weights: every document lands on an existing " +
      "host and carries that host's rank") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Graph.hostQualityWeights(docs, lineitem, orders).collect()
    assert(out.length == docs.count())
    val hostRanks = out.map(r =>
      r.getAs[Long]("host_key") -> r.getAs[Double]("host_rank")).toMap
    // hosts are the supplier nodes of the directed graph
    val suppliers = Graph.directedEdges(lineitem, orders)
      .select("dst").distinct().collect()
      .map(r => (r.getLong(0) - 1) / 2).toSet
    assert(hostRanks.keySet.subsetOf(suppliers))
    hostRanks.values.foreach(v => assert(v > 0))
  }

  test("triangles: mutual filter, counts, and lcc on a hand graph") {
    import spark.implicits._
    // mutual triangle {1,2,3}, mutual pendant 3-4, asymmetric 4->1
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L),
      (3L, 4L), (4L, 3L), (4L, 1L)).toDF("src", "neighbor_id")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getAs[Long]("node_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("triangles"),
          r.getAs[Double]("lcc")))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)),
      // lcc is rounded to RankRoundDigits=12 in the operator
      3L -> ((3L, 1L, 0.333333333333)), 4L -> ((1L, 0L, 0.0))))
  }

  test("triangles: a hub star counts each rim closure exactly once") {
    import spark.implicits._
    // hub 10 mutually linked to rims 1..5; rim edge 1-2 closes ONE
    // triangle {10,1,2} — the degree-orientation must not double- or
    // zero-count it through the hub
    val star = (1L to 5L).flatMap(r => Seq((10L, r), (r, 10L)))
    val edges = (star ++ Seq((1L, 2L), (2L, 1L))).toDF("src", "neighbor_id")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("triangles"))
      .toMap
    assert(got == Map(10L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 0L,
      4L -> 0L, 5L -> 0L))
  }

  test("degreeProfile: star graph — exact counts and the Hill " +
      "estimate; a degree-capped graph yields NULL alpha") {
    import spark.implicits._
    // mutual star: hub 1 — rims 2..6
    val star = (2L to 6L).flatMap(r => Seq((1L, r), (r, 1L)))
      .toDF("src", "neighbor_id")
    val r = Graph.degreeProfile(star).collect().head
    assert(r.getAs[Long]("n_nodes") == 6L)
    assert(r.getAs[Long]("n_edges") == 5L)
    assert(r.getAs[Long]("min_degree") == 1L)
    assert(r.getAs[Long]("max_degree") == 5L)
    assert(r.getAs[Long]("hill_k") == 6L)
    assert(r.getAs[Long]("dk") == 1L)
    assert(math.abs(r.getAs[Double]("hill_alpha") -
      (1.0 + 6.0 / math.log(5.0))) < 1e-12)
    // triangle: every degree 2 -> log-sum 0 -> alpha undefined
    val tri = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L),
      (2L, 3L), (3L, 2L)).toDF("src", "neighbor_id")
    val r2 = Graph.degreeProfile(tri).collect().head
    assert(r2.isNullAt(r2.fieldIndex("hill_alpha")))
  }

  test("degreeProfile fixture: edge-count identity and a shallow " +
      "capped tail") {
    val knn = Similarity.knnGraph(
      Similarity.embeddings(spark, "/root/testdata/sf0.001"))
      .persist()
    val r = Graph.degreeProfile(knn).collect().head
    val mutual = Graph.mutualEdges(knn).count()
    assert(r.getAs[Long]("n_edges") == mutual)
    assert(r.getAs[Long]("max_degree") <= Similarity.KnnGraphK)
    knn.unpersist()
  }

  test("hits: exact integer scores on a hand graph (two unrolled " +
      "iterations)") {
    import spark.implicits._
    // 1→3, 1→5, 2→3: a1=(3:2, 5:1); h1=(1:3, 2:2);
    // a2=(3:5, 5:3); h2=(1:8, 2:5)
    val edges = Seq((1L, 3L), (1L, 5L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.hits(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((8L, 0L)), 2L -> ((5L, 0L)),
      3L -> ((0L, 5L)), 5L -> ((0L, 3L))))
  }

  test("hits fixture: bipartite direction — customers pure hubs, " +
      "suppliers pure authorities, scores positive where expected") {
    val got = Graph.hits(Graph.directedEdges(lineitem, orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (node, hub, auth) =>
      if (node % 2 == 0) { // customer: out-edges only
        assert(auth == 0L, s"customer $node authority")
        assert(hub > 0L, s"customer $node hub")
      } else {
        assert(hub == 0L, s"supplier $node hub")
        assert(auth > 0L, s"supplier $node authority")
      }
    }
  }

  test("kCore: pendant and low-degree structures peel away, the " +
      "clique survives with exact within-core degrees") {
    import spark.implicits._
    // triangle {1,2,3} (degree 2 — below k=3), pendant 4-3, and a
    // K4 {5,6,7,8}; the 3-core is exactly the K4
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L))
    val edges = (und ++ und.map(e => (e._2, e._1)))
      .toDF("src", "neighbor_id")
    val got = Graph.kCore(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 3L, 6L -> 3L, 7L -> 3L, 8L -> 3L))
  }

  test("kCore: a hanging chain peels one node per round (the " +
      "cascade needs real iteration)") {
    import spark.implicits._
    // K4 {1..4} + node 10 at degree 3 via {4, 11, 12} where 11 and
    // 12 are a degree-2 pair: round 1 peels 11/12 (10 still has
    // degree 3), only round 2 can peel 10 — a genuine cascade
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 10L), (10L, 11L), (10L, 12L), (11L, 12L))
    val edges = (und ++ und.map(e => (e._2, e._1)))
      .toDF("src", "neighbor_id")
    val got = Graph.kCore(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // with too few rounds the chain has not finished peeling
    val early = Graph.kCore(edges, rounds = 1).collect()
      .map(_.getLong(0)).toSet
    assert(early.contains(10L) && !early.contains(12L),
      "round 1 must have peeled only the chain tip")
  }

  test("kCore fixture: KCoreRounds reaches the fixpoint (one more " +
      "peel changes nothing) and every core degree >= k") {
    val knn = Similarity.knnGraph(
      Similarity.embeddings(spark, "/root/testdata/sf0.001"))
      .persist()
    val got = Graph.kCore(knn).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "fixture graph has a 3-core")
    got.values.foreach(d => assert(d >= Graph.KCoreK))
    val more = Graph.kCore(knn, rounds = Graph.KCoreRounds + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == more, "KCoreRounds is past the fixpoint")
    knn.unpersist()
  }

  test("triangles: orientation algorithm matches the brute-force " +
      "definition on the fixture k-NN graph") {
    val knn = Similarity.knnGraph(
      Similarity.embeddings(spark, "/root/testdata/sf0.001"))
    val got = Graph.triangleCounts(knn).collect()
      .map(r => r.getAs[Long]("node_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("triangles")))).toMap
    // brute force from the definition: mutual undirected edges,
    // id-ordered 3-clique enumeration
    val directed = knn.select("src", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val und = directed.filter { case (u, v) =>
      u < v && directed.contains((v, u)) }
    val adj = (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
      .groupMap(_._1)(_._2).map { case (k, v) => k -> v.toSet }
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((u, v) <- und; w <- adj(u) if w > v && adj(v).contains(w)) {
      triCount(u) += 1; triCount(v) += 1; triCount(w) += 1
    }
    val expectDeg = adj.map { case (k, v) => k -> v.size.toLong }
    assert(got.keySet == expectDeg.keySet)
    got.foreach { case (n, (d, t)) =>
      assert(d == expectDeg(n), s"degree of $n")
      assert(t == triCount(n), s"triangles of $n")
    }
    assert(got.values.map(_._2).sum > 0, "fixture graph has triangles")
  }

  test("label propagation: two bridged triangles resolve to TWO " +
      "communities (CC would give one); isolated node keeps its own " +
      "label; sync rounds with min-label tie-break traced by hand") {
    import spark.implicits._
    // triangles {1,2,3} and {10,11,12} joined by the bridge 3-10 —
    // every edge mutual (both directions present)
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "neighbor_id")
    val nodes = (Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L))
      .toDF("node_id") // 99 is isolated
    val got = Graph.labelPropagation(edges, nodes).collect()
      .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("label"))
      .toMap
    // hand trace of 4 sync rounds (min-label tie-break):
    // r1: 1→2 2→1 3→1 10→3 11→10 12→10
    // r2: 1→1 2→1 3→1 10→10 11→3 12→3
    // r3: 1→1 2→1 3→1 10→3 11→3 12→3
    // r4: fixed point {1,2,3}→1, {10,11,12}→3
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L, 99L -> 99L), s"got $got")
    // the bridge did NOT merge the communities — the property that
    // separates LPA from connected components
    assert(Set(got(1L), got(10L)).size == 2)
  }

  test("modularity (q194): exact hand values on the bridged-triangle " +
      "graph — two symmetric communities, isolated node contributes " +
      "zero, bridge mass lowers Q below the disconnected ideal") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "neighbor_id")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L).toDF("node_id")
    val got = Graph.modularity(edges, nodes).collect()
      .map(r => r.getAs[Long]("label") ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("intra_edges"),
          r.getAs[Long]("deg_sum"), r.getAs[Double]("q_c"))))
      .toMap
    // m = 7; each triangle community: 3 intra edges, degree mass 7
    // (2+2+3 — the bridge endpoint carries the extra degree)
    val qc = 3.0 / 7 - (7.0 / 14) * (7.0 / 14)
    assert(got.keySet == Set(1L, 3L, 99L), s"labels ${got.keySet}")
    assert(got(1L) == ((3L, 3L, 7L, qc)))
    assert(got(3L) == ((3L, 3L, 7L, qc)))
    assert(got(99L) == ((1L, 0L, 0L, 0.0)))
    val q = got.values.map(_._4).sum
    // two clean triangles with no bridge would score 2*(3/6 - 1/4)
    // = 0.5; the bridge's inter-community mass costs ~0.14
    assert(q > 0.3 && q < 0.5, s"Q $q")
  }

  test("personalized PageRank (q195): a seedless component scores " +
      "EXACTLY zero, dangling mass returns to the seeds, total mass " +
      "conserved at 1") {
    import spark.implicits._
    // component A: seed customer 0 <-> supplier 1, plus sink supplier
    // 71 (edge 0->71, no return — its mass must teleport home);
    // component B: customer 10 <-> supplier 3, NO seed (custkey 5)
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 71L), (10L, 3L),
      (3L, 10L)).toDF("src", "dst")
    val r = Graph.personalizedPageRank(edges).collect()
      .map(x => x.getAs[Long]("node") ->
        (x.getAs[Boolean]("is_seed"), x.getAs[Double]("rank"))).toMap
    assert(r.keySet == Set(0L, 1L, 71L, 3L, 10L))
    assert(r(0L)._1 && !r(1L)._1 && !r(10L)._1)
    // the crisp PPR property global PR cannot have: no teleport ever
    // lands in the seedless component
    assert(r(10L)._2 == 0.0 && r(3L)._2 == 0.0,
      s"seedless component leaked: ${r(10L)}, ${r(3L)}")
    assert(r(0L)._2 > r(1L)._2 && r(1L)._2 > 0.0 && r(71L)._2 > 0.0)
    val total = r.values.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-9, s"mass not conserved: $total")
  }

  test("adamicAdar: hand graph — exact 1/ln(deg) scores, hub " +
      "neighbors discounted vs rare ones, existing edges and " +
      "single-witness pairs excluded") {
    import spark.implicits._
    // component A: square 1-2-3-4 (edges via 2 and 4) -> pairs (1,3)
    // and (2,4) each share two deg-2 neighbors: AA = 2/ln2.
    // component B: star center 10 over 5,6,7,8 plus rare neighbor 9
    // of {5,6} -> (5,6) shares hub 10 (deg 4) and rare 9 (deg 2):
    // AA = 1/ln4 + 1/ln2 < 2/ln2 (the hub discount); (7,8) share
    // only the hub -> below min support, excluded; (9,10) share
    // {5,6} -> 2/ln2.
    val edges = Seq((1L, 2L), (3L, 2L), (1L, 4L), (3L, 4L),
      (10L, 5L), (10L, 6L), (10L, 7L), (10L, 8L), (5L, 9L), (6L, 9L))
      .toDF("src", "neighbor_id")
    val out = Graph.adamicAdar(edges).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("w")) ->
        ((r.getAs[Long]("cn_count"), r.getAs[Double]("aa_score"))))
      .toMap
    val twoLn2 = 1.0 / math.log(2.0) + 1.0 / math.log(2.0)
    val hubMix = 1.0 / math.log(2.0) + 1.0 / math.log(4.0)
    assert(out.keySet ==
      Set((1L, 3L), (2L, 4L), (5L, 6L), (9L, 10L)), s"pairs: $out")
    assert(out((1L, 3L)) == ((2L, twoLn2)))
    assert(out((2L, 4L)) == ((2L, twoLn2)))
    assert(out((5L, 6L))._1 == 2L)
    assert(out((5L, 6L))._2 < twoLn2,
      "hub witness must score below two rare witnesses")
    assert(math.abs(out((5L, 6L))._2 - hubMix) < 1e-12)
    assert(out((9L, 10L)) == ((2L, twoLn2)))
  }
}
