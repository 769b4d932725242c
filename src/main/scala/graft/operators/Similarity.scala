package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` fixture table
  * (vec_id, embedding: array<float>[64], label).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness
  *    baseline. The query side is tiny and broadcast, so the plan is
  *    scan × BroadcastNestedLoopJoin with no shuffle of the corpus;
  *    per-query cost is linear in corpus size.
  *  - [[lshTopK]]: random-hyperplane LSH — the scale path. Corpus
  *    vectors hash to [[SimilarityParams.NumBands]] bucket keys;
  *    candidates are bucket collisions only, so per-query cost tracks
  *    bucket occupancy, not corpus size. Recall measured in
  *    SimilaritySpec.
  *
  * All vector arithmetic is sequential-fold double expressions
  * (mirrored term-for-term by the DuckDB oracle — summation order
  * matters for bit-exact doubles).
  */
object SimilarityParams {
  val Dim = 64
  val TopK = 10
  val NumQueryVectors = 10

  /** Hyperplane count and banding for ANN top-k: 48 sign bits in
    * 6 bands × 8 bits — the same banding shape as the near-dup path
    * below. Random-pair band collision ≈ 6·0.5⁸ ≈ 2.3%, so per-query
    * candidates stay a small, corpus-size-independent fraction (the
    * scale property; the earlier 8×3-bit banding collided for ~100%
    * of RANDOM pairs, so each query's candidate set degenerated to
    * the whole corpus — brute force with extra shuffles, measured
    * 15× slower than [[Similarity.bruteForceTopK]] on the same data).
    *
    * The recall trade-off is measured in SimilaritySpec: this
    * fixture's true top-10 sit at cosine ≈ 0.3 (near-random; sign
    * agreement p = 1 − acos(0.3)/π ≈ 0.60 → expected recall@10
    * 1−(1−p⁸)⁶ ≈ 0.09 — the honest number for sign-LSH over a
    * structureless corpus). At the neighbor cosines real embedding
    * corpora show, the same banding gives ≈ 0.46 recall at cosine
    * 0.7, ≈ 0.87 at 0.9, ≈ 0.96 at 0.95. Recall widens by ADDING
    * bands (OR-amplification, linear extra cost) — never by
    * narrowing them below ~6 bits, which reopens the all-candidates
    * failure mode. */
  val NumPlanes = 48
  val NumBands = 6
  val BitsPerBand: Int = NumPlanes / NumBands

  /** Near-dup banding is WIDER than top-k banding: 6 bands × 8 bits.
    * Random-pair band collision ≈ 6·0.5⁸ ≈ 2.3% — candidates stay
    * ~linear in corpus size (3-bit bands collide for ~100% of random
    * pairs: quadratic, measured 422 s at a 20k-vector probe). True
    * embedding dups (cosine ≥ 0.9, sign-agreement ≈ 0.86) still
    * collide with ≈ 87% probability in at least one band; the
    * fixture's weak 0.4-cosine pairs are a worst case (recall
    * measured in SimilaritySpec). */
  val DedupNumBands = 6
  val DedupBitsPerBand = 8
  val DedupNumPlanes: Int = DedupNumBands * DedupBitsPerBand

  private def planeMatrix(seed: Long, n: Int): IndexedSeq[IndexedSeq[Int]] = {
    var x = seed
    def next(): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      x >>> 33
    }
    IndexedSeq.fill(n, Dim)(if ((next() & 1L) == 0L) 1 else -1)
  }

  /** Deterministic ±1 hyperplane matrices from fixed 64-bit LCGs —
    * shared with the DuckDB oracle generator. */
  val planes: IndexedSeq[IndexedSeq[Int]] =
    planeMatrix(0x2545F4914F6CDD1DL, NumPlanes)
  val dedupPlanes: IndexedSeq[IndexedSeq[Int]] =
    planeMatrix(0x9E3779B97F4A7C15L, DedupNumPlanes)

  /** Near-dup planes for a WIDER banding: same seeded stream, so the
    * graded [[DedupBitsPerBand]]-bit constants are a strict prefix
    * and the oracle mirror is unaffected. Banding width is the knob
    * that keeps LSH candidate volume linear as the corpus grows: a
    * fixed band key width w collides random pairs with constant
    * probability ≈ bands·2⁻ʷ, which is Θ(n²) candidate PAIRS — so w
    * must track log₂(n) to hold expected bucket size (and per-row
    * candidate count) constant. The graded q12 pins w=8 (right for
    * the ≤5k fixture); deployments size w ≈ log₂(n/targetBucket). */
  def dedupPlanesFor(bitsPerBand: Int): IndexedSeq[IndexedSeq[Int]] =
    planeMatrix(0x9E3779B97F4A7C15L, DedupNumBands * bitsPerBand)

  /** Hybrid retrieval constants (q84): reciprocal-rank-fusion of the
    * BM25 sparse ranking and a dense cosine ranking. RrfK = 60 is the
    * Cormack/Clarke/Buettcher constant; each retriever contributes a
    * pool of [[RrfPoolK]] candidates and the fused list keeps
    * [[RrfTopK]]. The dense query is the embedding of a fixed fixture
    * vector so both engines score the identical vector. */
  val RrfK = 60
  val RrfPoolK = 50
  val RrfTopK = 20
  val RrfQueryVecId = 0L
}

object Similarity {
  import SimilarityParams._
  import org.apache.spark.sql.graft.{Bridge, DotProduct, HyperplaneBands}

  /** Codegen'd sequential-fold dot product (order-identical to the
    * aggregate(zip_with(...)) formulation the oracle mirrors). */
  private def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** embeddings.parquet with the float vector cast to double and its
    * L2 norm attached (row-local; scan prunes to 2 columns). */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))

  private def queries(emb: DataFrame,
      numQueries: Int = NumQueryVectors): DataFrame =
    emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))

  private def cosine: Column =
    (dot(col("qv"), col("v")) /
      (col("qnorm") * col("norm"))).as("cosine")

  /** Exact cosine of two (vector, norm) column pairs — the same
    * sequential-fold arithmetic as [[cosine]], exposed for consumers
    * with their own column names (the streaming graph). */
  def cosineOf(qv: Column, qnorm: Column, v: Column, norm: Column): Column =
    dot(qv, v) / (qnorm * norm)

  /** Rank the scored candidates per query through the custom
    * [[org.apache.spark.sql.graft.TopKPerGroup]] operator (q50):
    * partial per-partition heaps send ≤ TopK rows per (partition,
    * query) through the exchange, where the window formulation
    * shuffles and sorts EVERY scored row — for brute force that is
    * |Q|·|corpus| rows through one exchange. Row-identical to
    * row_number over (cosine desc, vec_id asc): the order is total,
    * and the q50 spec pins operator≡window equality. Falls back to
    * the window plan when the session lacks GraftExtensions (the
    * strategy would not plan the node). */
  private def topK(scored: DataFrame, k: Int = TopK): DataFrame = {
    val slim = scored.select(col("query_id"), col("vec_id"), col("cosine"))
    val extensionsActive = scored.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val ranked =
      if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(slim, Seq("query_id"),
          Seq("cosine" -> false, "vec_id" -> true), k)
      else slim
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cosine").desc, col("vec_id").asc)).cast("long"))
        .filter(col("rank") <= k)
    ranked.select(col("query_id"), col("vec_id").as("neighbor_id"),
      col("rank"), col("cosine"))
  }

  /** Exact cosine top-k of every query vector against the corpus.
    * Per-query cost is one corpus scan: O(|Q|·|corpus|) dot products
    * plus the rank over |Q|·|corpus| scored rows — the crossover
    * against [[lshTopK]] is measured in graft.ScaleProbe. */
  def bruteForceTopK(emb: DataFrame,
      numQueries: Int = NumQueryVectors): DataFrame =
    topK(broadcast(queries(emb, numQueries)).crossJoin(emb)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine))

  /** Rocchio knobs (q210): feedback depth and the classic
    * original-vs-centroid mix (α = 1, β = 0.75). */
  val RocchioFbK = 10
  val RocchioAlpha = 1.0
  val RocchioBeta = 0.75

  /** Rocchio dense-vector relevance feedback (q210) — q209's DENSE
    * twin, completing the feedback pair: retrieve [[RocchioFbK]]
    * feedback vectors per query (exact cosine — but the arithmetic
    * is index-agnostic: a production loop feeds it from IVF/LSH
    * probes), move the query toward their centroid, q′ = α·q +
    * β·mean(F), and re-rank the corpus against q′ — the
    * embedding-space "more like these" refinement every dense
    * retrieval stack ships. The centroid folds element-wise over
    * feedback vectors SORTED by vec_id (ordered-fold FP discipline);
    * q′, its norm, and the re-scoring cosine are fixed-order
    * expression chains mirrored exactly.
    *
    * Scale design (100 TB): per-query feedback is k rows (broadcast
    * back as a |Q|·k frame); the centroid is one bounded aggregation
    * per query; the re-rank pass has exactly the q9 brute shape —
    * |Q| adjusted vectors broadcast against the corpus, top-k through
    * the TopKPerGroup heap operator — and swaps to any indexed
    * probe (q20/q88) unchanged when |Q| grows. */
  def rocchioDenseTopK(emb0: DataFrame, fbK: Int = RocchioFbK,
      alpha: Double = RocchioAlpha, beta: Double = RocchioBeta,
      numQueries: Int = NumQueryVectors): DataFrame = {
    val emb = emb0
    val dim = SimilarityParams.Dim
    val fb = topK(broadcast(queries(emb, numQueries)).crossJoin(emb)
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cosine", cosine), k = fbK)
      .select(col("query_id"), col("neighbor_id"))
    val fbVecs = fb.join(emb.select(col("vec_id").as("neighbor_id"),
      col("v").as("fv")), "neighbor_id")
    val centroids = fbVecs.groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("neighbor_id"),
        col("fv")))).as("fvs"))
      .select(col("query_id"),
        transform(
          aggregate(col("fvs"),
            array_repeat(lit(0.0), dim),
            (acc, x) => zip_with(acc, x.getField("fv"),
              (a, b) => a + b)),
          s => s / size(col("fvs"))).as("c"))
    val adjusted = queries(emb, numQueries)
      .join(centroids, "query_id")
      .select(col("query_id"),
        zip_with(col("qv"), col("c"),
          (a, b) => lit(alpha) * a + lit(beta) * b).as("qv"))
      .withColumn("qnorm", sqrt(dot(col("qv"), col("qv"))))
    topK(broadcast(adjusted).crossJoin(emb)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine))
  }

  /** All sign-bit LSH band keys of a vector in one codegen'd pass
    * over the baked hyperplane matrix — array of NumBands ints, band
    * j packing the sign bits of hyperplanes [j·BitsPerBand, ...). */
  def bandKeysArray(v: Column): Column =
    Bridge.column(HyperplaneBands(Bridge.expression(v),
      planes.flatten, NumBands, BitsPerBand))

  /** Band keys under the wider near-dup banding ([[DedupNumBands]] ×
    * `bitsPerBand`; default [[DedupBitsPerBand]] = the graded/oracle
    * constants — see [[SimilarityParams.dedupPlanesFor]] for why the
    * width must track log₂(corpus) at scale). */
  def dedupBandKeysArray(v: Column,
      bitsPerBand: Int = DedupBitsPerBand): Column =
    Bridge.column(HyperplaneBands(Bridge.expression(v),
      dedupPlanesFor(bitsPerBand).flatten, DedupNumBands, bitsPerBand))

  /** Embedding-cosine near-duplicate threshold (data-driven for the
    * fixture: max pairwise cosine ≈ 0.51, 59 pairs ≥ 0.4 at sf0.01). */
  val NearDupCosine = 0.4

  /** Embedding-cosine near-dup pairs: LSH-bucketed candidate
    * generation (any shared band) then exact cosine ≥
    * [[NearDupCosine]] — the embedding member of the dedup family.
    * One shuffle on the band key; never all-pairs. */
  def embeddingNearDups(emb0: DataFrame,
      bitsPerBand: Int = DedupBitsPerBand): DataFrame =
    embeddingNearDupsWithHandle(emb0, bitsPerBand)._1

  /** [[embeddingNearDups]] plus the [[graft.util.CacheHandle]]
    * releasing the persisted embedding corpus. */
  def embeddingNearDupsWithHandle(emb0: DataFrame,
      bitsPerBand: Int = DedupBitsPerBand): (DataFrame, graft.util.CacheHandle) = {
    // norm + band keys feed several consumers; persist like the
    // dedup hash corpus
    val emb = emb0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the self-join sides carry explicit aliases so the join condition
    // is unambiguous by construction (no reliance on dataset-id
    // disambiguation of same-lineage columns, which
    // spark.sql.analyzer.failAmbiguousSelfJoin exists to catch)
    val bands = emb.select(col("vec_id"),
      posexplode(dedupBandKeysArray(col("v"), bitsPerBand))
        .as(Seq("band", "key")))
    val a = bands.alias("a")
    val b = bands.alias("b")
    // distinct on the ID PAIR only (distinct over the vector arrays
    // shuffles ~100× more bytes — bench-visible), then re-join the
    // vectors for the exact cosine verify
    val candIds = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val va = emb.select(col("vec_id").as("vec_a"), col("v").as("qv"),
      col("norm").as("qnorm"))
    val vb = emb.select(col("vec_id").as("vec_b"), col("v"), col("norm"))
    val out = candIds.join(va, "vec_a").join(vb, "vec_b")
      .withColumn("cosine", cosine)
      .filter(col("cosine") >= NearDupCosine)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
    (out, graft.util.CacheHandle(emb))
  }

  /** Benchmark-set boundary of [[semanticContamination]]: vec_id <
    * this are the held-out evaluation embeddings. */
  val SemDecontamBenchBelow = 20L

  /** Decontamination cosine bar — deliberately LOOSER than the q12
    * near-dup threshold (0.4): a paraphrased eval example lands
    * lower than a near-copy, and a false removal costs one training
    * document while a missed leak corrupts the benchmark. */
  val SemDecontamCosine = 0.3

  /** Semantic test-set decontamination (q219) — the EMBEDDING-space
    * complement of q43's n-gram contamination screen: an eval
    * example paraphrased or lightly edited into the training corpus
    * shares no 8-gram but sits at high cosine, so modern
    * decontamination (phi-style) also screens by embedding
    * similarity. Candidates are CROSS-set LSH band collisions
    * (benchmark bands × corpus bands — never benchmark × corpus
    * all-pairs), exact cosine ≥ [[SemDecontamCosine]] (0.3 — looser
    * than the 0.4 dedup bar, see its scaladoc) verifies, output
    * is the removal list (corpus_vec, bench_vec, cosine).
    *
    * Scale design (100 TB): the benchmark side is eval-set-sized —
    * its banded rows BROADCAST, so the corpus-side band stream never
    * shuffles at all (one row-local banding pass + a broadcast hash
    * join + the verify fetch); the corpus never meets itself, making
    * this strictly cheaper than the q12 self-join at equal corpus
    * size. */
  def semanticContamination(emb0: DataFrame,
      benchBelow: Long = SemDecontamBenchBelow,
      threshold: Double = SemDecontamCosine,
      bitsPerBand: Int = DedupBitsPerBand): DataFrame =
    semanticContaminationAgainst(
      emb0.filter(col("vec_id") >= benchBelow),
      emb0.filter(col("vec_id") < benchBelow),
      threshold, bitsPerBand)

  /** The q219 semantic screen against an ALREADY-SPLIT benchmark
    * side — shared by [[semanticContamination]] (which splits one
    * frame by id) and the q246 streaming funnel (static benchmark
    * embeddings, arriving corpus vectors — the q237 broadcast
    * discipline). Both sides carry (vec_id, v, norm). */
  def semanticContaminationAgainst(corpusEmb: DataFrame,
      benchEmb: DataFrame,
      threshold: Double = SemDecontamCosine,
      bitsPerBand: Int = DedupBitsPerBand): DataFrame = {
    def bandsOf(e: DataFrame) = e.select(col("vec_id"),
      posexplode(dedupBandKeysArray(col("v"), bitsPerBand))
        .as(Seq("band", "key")))
    val bench = bandsOf(benchEmb).alias("a")
    val corpus = bandsOf(corpusEmb).alias("b")
    val candIds = corpus.join(broadcast(bench),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("b.vec_id").as("corpus_vec"),
        col("a.vec_id").as("bench_vec"))
      .distinct()
    val vq = benchEmb.select(col("vec_id").as("bench_vec"),
      col("v").as("qv"), col("norm").as("qnorm"))
    val vc = corpusEmb.select(col("vec_id").as("corpus_vec"), col("v"),
      col("norm"))
    candIds.join(broadcast(vq), "bench_vec").join(vc, "corpus_vec")
      .withColumn("cosine", cosine)
      .filter(col("cosine") >= threshold)
      .select(col("corpus_vec"), col("bench_vec"), col("cosine"))
  }

  /** Neighbors kept per node in the k-NN graph (q112). */
  val KnnGraphK = 5

  /** Distributed k-NN graph construction (q112): for EVERY corpus
    * vector, its [[KnnGraphK]] nearest LSH-reachable neighbors by
    * exact cosine — the all-nodes sibling of [[lshTopK]] (which ranks
    * a handful of query vectors) and the substrate of graph-based
    * curation: SemDedup-style cluster pruning, connected-component
    * dedup over embedding edges, and k-NN-graph ANN serving all
    * start here.
    *
    * Same scale shape as [[embeddingNearDups]]: candidates are band
    * collisions only (one shuffle on the band key, never all-pairs),
    * the candidate DISTINCT dedups id pairs before the vectors join
    * back, and the final top-k ranks through the
    * [[org.apache.spark.sql.graft.TopKPerGroup]] operator (per-
    * partition heaps bound the exchange at k rows per (partition,
    * src) — the window formulation shuffles every scored candidate).
    * Directed output: band recall is symmetric, but rank-k membership
    * is not (dst in src's top-k does not put src in dst's). Recall
    * vs the brute-force graph is pinned in SimilaritySpec. */
  def knnGraph(emb0: DataFrame, bitsPerBand: Int = DedupBitsPerBand,
      k: Int = KnnGraphK): DataFrame = {
    val emb = emb0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = emb.select(col("vec_id"),
      posexplode(dedupBandKeysArray(col("v"), bitsPerBand))
        .as(Seq("band", "key")))
    val a = bands.alias("a")
    val b = bands.alias("b")
    val candIds = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
      .distinct()
    val va = emb.select(col("vec_id").as("src"), col("v").as("qv"),
      col("norm").as("qnorm"))
    val vb = emb.select(col("vec_id").as("dst"), col("v"), col("norm"))
    val scored = candIds.join(va, "src").join(vb, "dst")
      .withColumn("cosine", cosine)
      .select(col("src"), col("dst"), col("cosine"))
    val extensionsActive = scored.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val ranked =
      if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(scored, Seq("src"),
          Seq("cosine" -> false, "dst" -> true), k)
      else scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("src"))
            .orderBy(col("cosine").desc, col("dst").asc)).cast("long"))
        .filter(col("rank") <= k)
    ranked.select(col("src"), col("dst").as("neighbor_id"),
      col("rank"), col("cosine"))
  }

  /** NN-descent knobs (q201): pseudo-random initial out-degree and
    * the rank mask keeping every hash argument far inside Long range
    * (the rendezvous-sharding overflow discipline). */
  val NnDescentInitK = 5
  val NnDescentRankMask = 1048576L

  /** Refinement rounds of [[nnDescentGraph]] — each round contracts
    * the graph a constant factor toward the true k-NN graph (the
    * spec measures the per-round recall ladder), and the oracle
    * unrolls exactly this many rounds (the q195 PageRank
    * discipline). */
  val NnDescentRounds = 2

  /** NN-descent k-NN-graph construction (q201, Dong et al. 2011) —
    * the LSH-free way to build [[knnGraph]]'s k-NN layer, and THE
    * distributed construction when no good hash family is known:
    * start from a deterministic pseudo-random graph
    * ([[NnDescentInitK]] spokes per node by rank-space Knuth-hash
    * arithmetic — the [[longRangeEdges]] machinery with a hashed
    * target instead of a stride), then [[NnDescentRounds]]
    * neighbors-of-neighbors rounds: candidates(u) = N(u) ∪ N⁻¹(u) ∪
    * {w : w ∈ N±(v), v ∈ N±(u)} over the CURRENT graph, scored by
    * exact cosine, top-[[KnnGraphK]] kept as the next round's graph.
    * The core NN-descent observation — a neighbor's neighbor is
    * likely a neighbor — contracts the random graph toward the true
    * k-NN graph a constant factor per round; the spec measures the
    * per-round recall ladder on the clustered fixture.
    *
    * Scale design (100 TB): every stage is a bounded self-join —
    * the undirected closure has ≤ 2·initK edges/node, so the 2-hop
    * frame is ≤ (2·initK)² rows/node, candidates dedup BEFORE
    * vectors join back (the q112 discipline: only (src,dst) id pairs
    * shuffle), and the final ranking runs through the TopKPerGroup
    * heap operator, never a global sort. The rank pass is the
    * range-partitioned [[GlobalIndex]] prefix sum, not a
    * single-reducer window; hash arguments are masked to
    * [[NnDescentRankMask]] so rank·stride stays < 2³⁰ at any corpus
    * size (nodes sharing a masked rank share spoke OFFSETS, which
    * the +r term de-aliases — distribution, not correctness). */
  def nnDescentGraph(emb0: DataFrame, initK: Int = NnDescentInitK,
      k: Int = KnnGraphK, rounds: Int = NnDescentRounds): DataFrame =
    nnDescentGraphWithHandle(emb0, initK, k, rounds)._1

  /** [[nnDescentGraph]] plus the [[graft.util.CacheHandle]] for the
    * rank materialization and the per-round edge caches (each round
    * reads its predecessor's top-k twice — closure and 2-hop — so
    * the edge frame is persisted per round, all released through the
    * handle). */
  def nnDescentGraphWithHandle(emb0: DataFrame,
      initK: Int = NnDescentInitK, k: Int = KnnGraphK,
      rounds: Int = NnDescentRounds)
      : (DataFrame, graft.util.CacheHandle) = {
    val emb = emb0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (ranked, handle) = GlobalIndex.globalRowIndexWithHandle(
      emb.select(col("vec_id")), Seq(col("vec_id")), LongRangePartitions)
    val n = ranked.count()
    val ids = ranked.select(col("global_idx").as("tr"),
      col("vec_id").as("dst"))
    val init = ranked
      .select(col("vec_id").as("src"), col("global_idx").as("r"))
      .withColumn("j", explode(sequence(lit(0), lit(initK - 1))))
      .withColumn("tr",
        (expr(s"(((r % $NnDescentRankMask) * 8 + j) * " +
          s"${Sampling.HashMult}L) DIV 1048576") + col("r")) % n)
      .join(ids, "tr")
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    val va = emb.select(col("vec_id").as("src"), col("v").as("qv"),
      col("norm").as("qnorm"))
    val vb = emb.select(col("vec_id").as("dst"), col("v"), col("norm"))
    val extensionsActive = emb.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    var edges = init
    var cached = List.empty[DataFrame]
    var out: DataFrame = init // replaced in round 1 (rounds >= 1)
    for (_ <- 1 to rounds) {
      val und = edges
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached ::= und
      val twoHop = und.alias("a").join(und.alias("b"),
          col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      val candIds = und.union(twoHop)
        .filter(col("src") =!= col("dst"))
        .distinct()
      val scored = candIds.join(va, "src").join(vb, "dst")
        .withColumn("cosine", cosine)
        .select(col("src"), col("dst"), col("cosine"))
      out =
        if (extensionsActive)
          org.apache.spark.sql.graft.TopK.perGroup(scored, Seq("src"),
            Seq("cosine" -> false, "dst" -> true), k)
        else scored
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("src"))
              .orderBy(col("cosine").desc, col("dst").asc)).cast("long"))
          .filter(col("rank") <= k)
      edges = out.select(col("src"), col("dst"))
    }
    (out.select(col("src"), col("dst").as("neighbor_id"),
      col("rank"), col("cosine")),
      graft.util.CacheHandle.combine(
        (handle :: cached.map(f => graft.util.CacheHandle(f))): _*))
  }

  /** IVF coarse quantizer size, probe width, and k-means training
    * knobs: centroids start as the first [[NumCentroids]] sample
    * vectors and are refined by [[KMeansIters]] Lloyd iterations
    * (cosine assignment, element-wise mean update) over the
    * deterministic sample vec_id < [[TrainSample]]. Training is
    * DISTRIBUTED ([[trainCentroidsDistributed]]): the sample never
    * collects to the driver — assignment is a row-local codegen'd
    * expression, per-cell member sums fold on the executors, and only
    * k×(dim+1) doubles cross to the driver per iteration. That makes
    * [[TrainSample]] a minibatch-size knob that can scale with the
    * corpus (the SemDedup regime grows cells AND sample with corpus
    * size) instead of a driver-memory bound. The trained codebook is
    * still baked into a row-local codegen'd assignment expression, so
    * the corpus never shuffles. */
  val NumCentroids = 16
  val NProbe = 4
  val KMeansIters = 3
  val TrainSample = 512

  /** Deterministic Lloyd trainer — the DRIVER-LOCAL reference twin
    * that [[trainCentroidsDistributed]] (the production path) is
    * spec-pinned bit-identical to. Every double operation is ordered
    * identically to the DuckDB mirror (OracleSql.annIvf): dot
    * products and norms are sequential left folds from 0.0; cell
    * means accumulate members in ascending vec_id order and divide
    * by the count; assignment ties break to the lowest centroid id;
    * an emptied cell keeps its previous centroid. */
  private[operators] def trainCentroids(
      sample: IndexedSeq[(IndexedSeq[Double], Double)],
      iters: Int, numCentroids: Int = NumCentroids): Array[Array[Double]] = {
    // a tiny corpus yields fewer than numCentroids centroids — degrade
    // gracefully like the sampled bootstrap did, don't index past k
    val k = math.min(numCentroids, sample.size)
    var cents = sample.take(k).map(_._1.toArray).toArray
    for (_ <- 0 until iters) {
      val cnorms = cents.map(c => math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))
      val sums = Array.fill(k)(new Array[Double](Dim))
      val counts = new Array[Long](k)
      sample.foreach { case (v, nrm) =>
        var best = -1
        var bestCos = Double.NegativeInfinity
        var j = 0
        while (j < k) {
          var d = 0.0
          var i = 0
          while (i < Dim) { d += v(i) * cents(j)(i); i += 1 }
          val cos = d / (nrm * cnorms(j))
          if (cos > bestCos) { bestCos = cos; best = j }
          j += 1
        }
        // best = -1 iff every cosine was NaN (zero-norm vector): skip
        // the vector rather than corrupting an accumulator
        if (best >= 0) {
          val s = sums(best)
          var i = 0
          while (i < Dim) { s(i) += v(i); i += 1 }
          counts(best) += 1
        }
      }
      cents = Array.tabulate(k) { j =>
        if (counts(j) == 0L) cents(j)
        else Array.tabulate(Dim)(i => sums(j)(i) / counts(j).toDouble)
      }
    }
    cents
  }

  /** One distributed Lloyd/minibatch k-means update over an assigned
    * sample frame (vec_id, v, cell): per-cell member sums fold in
    * ascending vec_id order ON THE EXECUTORS — sort_array over the
    * collected (vec_id, v) structs replays exactly the driver
    * trainer's member order, and the per-dimension zip_with left fold
    * from 0.0 is its accumulation loop — so only k rows of
    * (cell, count, sum-vector), k×(dim+1) doubles, ever cross to the
    * driver (the q57 prefix-sum discipline applied to k-means). The
    * driver's only arithmetic is the k divisions; an emptied cell
    * keeps its previous centroid; rows with cell < 0 (unassignable:
    * all-NaN distances) are skipped like the driver trainer skips
    * them. Per-cell executor state is the minibatch's members of that
    * cell — bounded by the [[TrainSample]] minibatch knob, never by
    * the corpus. */
  private def reduceCellSums(assigned: DataFrame,
      cents: Array[Array[Double]], dim: Int): Array[Array[Double]] = {
    val partials = assigned.filter(col("cell") >= 0)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"),
        array_sort(collect_list(struct(col("vec_id"), col("v")))).as("mv"))
      .select(col("cell"), col("cnt"),
        aggregate(col("mv"), typedLit(Seq.fill(dim)(0.0)),
          (acc, m) => zip_with(acc, m.getField("v"), (a, b) => a + b))
          .as("sums"))
      .collect()
    val next = cents.map(_.clone())
    partials.foreach { r =>
      val j = r.getInt(0)
      val cnt = r.getLong(1)
      val sums = r.getSeq[Double](2)
      next(j) = Array.tabulate(dim)(i => sums(i) / cnt.toDouble)
    }
    next
  }

  /** Distributed twin of [[trainCentroids]], bit-identical by
    * construction (SimilaritySpec pins the equality): assignment is
    * the same codegen'd cosine argmax
    * ([[org.apache.spark.sql.graft.NearestCentroids]], ties to the
    * lowest centroid id) run row-locally over the sample frame, and
    * [[reduceCellSums]] replays the driver trainer's ascending-vec_id
    * member fold on the executors. Zero-norm rows are filtered before
    * accumulation — the frame analogue of the driver's all-NaN skip.
    * Per iteration: one job whose single driver-bound row set is the
    * k×(dim+1) centroid sums. */
  private[operators] def trainCentroidsDistributed(sample0: DataFrame,
      iters: Int, numCentroids: Int = NumCentroids): Array[Array[Double]] = {
    // hash-spread the minibatch BEFORE persisting: the sample usually
    // arrives as a filter of a few input partitions (measured 1
    // partition at ladder scale — the per-iteration assignment, k·dim
    // multiply-adds per row, ran single-threaded at 2.2 s/iteration
    // for an 800-centroid codebook). Partitioning does not touch the
    // result: the per-cell fold re-sorts members by vec_id
    val sample = sample0.select(col("vec_id"), col("v"), col("norm"))
      .repartition(col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = sample.orderBy(col("vec_id")).limit(numCentroids)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    if (cents.isEmpty) { sample.unpersist(); return cents }
    for (_ <- 0 until iters) {
      val cnorms = cents.map(c =>
        math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))
      val assign = element_at(Bridge.column(
        org.apache.spark.sql.graft.NearestCentroids(
          Bridge.expression(col("v")), Bridge.expression(col("norm")),
          cents.flatten, cnorms, cents.indices.toArray, 1)), 1)
      cents = reduceCellSums(
        sample.filter(col("norm") > 0.0)
          .select(col("vec_id"), col("v"), assign.as("cell")),
        cents, Dim)
    }
    sample.unpersist()
    cents
  }

  /** Distributed L2 k-means trainer over a (vec_id, v) sub-vector
    * sample — the per-subspace codebook trainer of [[pqTopK]]. Same
    * shape as [[trainCentroidsDistributed]] with squared-L2
    * assignment ([[org.apache.spark.sql.graft.NearestCentroidL2]],
    * strict-less keeps the lowest centroid id on ties — PQ's standard
    * metric; cosine would normalize away per-subspace magnitude,
    * which is exactly what PQ must preserve). */
  private[operators] def trainCentroidsL2Distributed(sample0: DataFrame,
      iters: Int, numCentroids: Int, dim: Int): Array[Array[Double]] = {
    // same hash-spread as [[trainCentroidsDistributed]]
    val sample = sample0.select(col("vec_id"), col("v"))
      .repartition(col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = sample.orderBy(col("vec_id")).limit(numCentroids)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    if (cents.isEmpty) { sample.unpersist(); return cents }
    for (_ <- 0 until iters) {
      val assign = Bridge.column(
        org.apache.spark.sql.graft.NearestCentroidL2(
          Bridge.expression(col("v")), cents.flatten, dim))
      cents = reduceCellSums(
        sample.select(col("vec_id"), col("v"), assign.as("cell")),
        cents, dim)
    }
    sample.unpersist()
    cents
  }

  /** Graph-search constants (q124): beam width and hop count of the
    * greedy walk over the k-NN graph. */
  val GraphSearchBeam = 16
  val GraphSearchHops = 4

  /** Long-range spoke fan-out (q124): every node adds
    * [[LongRangeSpokes]]−1 directed edges to the nodes at dense ranks
    * (r + ⌊j·N/Spokes⌋) mod N. The r9 spec proved the bare k-NN graph
    * STRANDS the beam inside the entry's cluster on clustered corpora
    * (recall 0.25) — the reason production NSW/HNSW layers long-range
    * links. NSW draws them randomly; here they are deterministic
    * RANK-SPACE spokes: ingestion order (vec_id) is uncorrelated with
    * embedding geometry, which is exactly the independence NSW's
    * randomness buys, and determinism keeps the layer DuckDB-
    * mirrorable. Any node reaches any rank region within
    * ⌈log_Spokes N⌉ hops, so the beam can always escape a cluster.
    * At 100 TB the constant is a knob: Spokes−1 edges/node next to
    * the k-NN layer's k — production would size it ~log N; the graph
    * stays O(N) edges either way. */
  val LongRangeSpokes = 16

  /** Range partitions for the dense-rank pass of [[longRangeEdges]]
    * (multi-partition at fixture scale; a cluster sizes it up). */
  val LongRangePartitions = 8

  /** The deterministic long-range edge layer: dense-rank every node
    * by vec_id through [[GlobalIndex.globalRowIndex]] (range-
    * partitioned — never a single-reducer global window), then emit
    * the spoke targets by rank arithmetic and resolve ranks back to
    * ids with one join on the rank key. Integer arithmetic
    * throughout (⌊j·N/S⌋ via BIGINT DIV) so the oracle mirror is
    * exact. Cost: one rank pass + one join over N·(Spokes−1) tiny
    * rows — no vector ever moves. */
  def longRangeEdges(emb: DataFrame,
      spokes: Int = LongRangeSpokes): DataFrame =
    longRangeEdgesWithHandle(emb, spokes)._1

  /** [[longRangeEdges]] plus the [[graft.util.CacheHandle]] releasing
    * [[GlobalIndex]]'s range-materialized rank frame. */
  def longRangeEdgesWithHandle(emb: DataFrame,
      spokes: Int = LongRangeSpokes)
      : (DataFrame, graft.util.CacheHandle) = {
    val (ranked, handle) = GlobalIndex.globalRowIndexWithHandle(
      emb.select(col("vec_id")), Seq(col("vec_id")), LongRangePartitions)
    val n = ranked.count()
    val targets = ranked
      .select(col("vec_id").as("src"), col("global_idx").as("r"))
      .withColumn("j", explode(sequence(lit(1), lit(spokes - 1))))
      .withColumn("tr",
        (col("r") + expr(s"(j * CAST($n AS BIGINT)) DIV $spokes")) % n)
    (targets.join(
        ranked.select(col("global_idx").as("tr"), col("vec_id").as("nbr")),
        "tr")
      .filter(col("src") =!= col("nbr"))
      .select(col("src"), col("nbr")), handle)
  }

  /** Greedy beam search over the [[knnGraph]] edges (q124) — the
    * NSW/HNSW-family SERVING pattern and the last member of the ANN
    * family (flat probe q88, IVF q20, PQ q106, MRL q96, binary q121,
    * graph walk q124): start every query's beam at the corpus's
    * minimum vec_id, then [[GraphSearchHops]] rounds of expand-
    * neighbors → exact-cosine score → keep the top
    * [[GraphSearchBeam]]; emit the final beam's top-k (self
    * excluded).
    *
    * Per-query cost is hops·beam·k edge lookups + scores —
    * INDEPENDENT of corpus size once the graph exists (the
    * navigable-graph promise; the graph build is q112's banded
    * construction, paid once per ingest like the LSH index).
    * Recall depends on graph CONNECTIVITY: the k-NN layer alone has
    * no cross-cluster edges on tightly clustered data and strands
    * the walk in the entry's cluster (the r9 spec measured recall
    * 0.25 there), so the serving graph is the k-NN layer UNION the
    * deterministic [[longRangeEdges]] spoke layer — the NSW fix.
    * The spec pins recall ≥ 0.8 on the clustered fixture (the q121
    * bar) and the navigation floor on the well-mixed one. */
  def graphSearchTopK(emb: DataFrame,
      numQueries: Int = NumQueryVectors,
      hops: Int = GraphSearchHops,
      beamWidth: Int = GraphSearchBeam): DataFrame =
    graphSearchTopKWithHandle(emb, numQueries, hops, beamWidth)._1

  /** [[graphSearchTopK]] plus the [[graft.util.CacheHandle]]
    * releasing the persisted edge frame, the spoke layer's rank
    * materialization, and the final hop's scored cache. */
  def graphSearchTopKWithHandle(emb: DataFrame,
      numQueries: Int = NumQueryVectors,
      hops: Int = GraphSearchHops,
      beamWidth: Int = GraphSearchBeam)
      : (DataFrame, graft.util.CacheHandle) = {
    val (spokes, spokeHandle) = longRangeEdgesWithHandle(emb)
    val edges = knnGraph(emb)
      .select(col("src"), col("neighbor_id").as("nbr"))
      .union(spokes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (out, walkHandle) =
      graphSearchOverEdgesWithHandle(emb, edges, numQueries, hops, beamWidth)
    (out, graft.util.CacheHandle.combine(
      graft.util.CacheHandle(edges), spokeHandle, walkHandle))
  }

  /** [[graphSearchTopK]] over a PREBUILT edge frame (src, nbr) — the
    * serving call: the graph is built once per ingest (q112,
    * maintained by q123) and every query batch pays only the walk. */
  def graphSearchOverEdges(emb: DataFrame, edges: DataFrame,
      numQueries: Int = NumQueryVectors,
      hops: Int = GraphSearchHops,
      beamWidth: Int = GraphSearchBeam): DataFrame =
    graphSearchOverEdgesWithHandle(emb, edges, numQueries, hops,
      beamWidth)._1

  /** [[graphSearchOverEdges]] plus the [[graft.util.CacheHandle]]
    * releasing the final hop's scored cache (earlier hops release
    * their predecessor inline; the last one must outlive the lazy
    * result). */
  def graphSearchOverEdgesWithHandle(emb: DataFrame, edges: DataFrame,
      numQueries: Int = NumQueryVectors,
      hops: Int = GraphSearchHops,
      beamWidth: Int = GraphSearchBeam)
      : (DataFrame, graft.util.CacheHandle) = {
    val q = queries(emb, numQueries)
    val entry = emb.agg(min(col("vec_id"))).head().getLong(0)
    val beam0 = q.select(col("query_id")).withColumn("node", lit(entry))
    val (scored, beam, cache) = beamWalk(q, emb, edges, beam0, hops,
      beamWidth)
    (finishWalk(scored, beam), cache)
  }

  /** The final top-k of a walk: last hop's scored beam, self
    * excluded, (cos DESC, node ASC) ranked. */
  private def finishWalk(scored: DataFrame, beam: DataFrame): DataFrame =
    scored.join(beam, Seq("query_id", "node"))
      .filter(col("node") =!= col("query_id"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("node").asc)).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("node").as("neighbor_id"),
        col("rank"), col("cos").as("cosine"))

  /** `hops` rounds of expand-score-prune from `beam0` over `edges`:
    * returns (last hop's scored frame, last beam, the CacheHandle of
    * the last hop's persisted cut). Shared by the flat walk (q124)
    * and each LEVEL of the layered walk (q186). */
  private def beamWalk(q: DataFrame, emb: DataFrame, edges: DataFrame,
      beam0: DataFrame, hops: Int, beamWidth: Int)
      : (DataFrame, DataFrame, graft.util.CacheHandle) = {
    var beam = beam0
    var scored = beam // placeholder, reassigned in every hop
    // each hop references `beam` TWICE (carry + expand) and the final
    // select re-reads the last hop — without a per-hop materialized
    // cut the plan tree doubles per hop and re-runs every corpus join
    // 2^hops times (the deep-PageRank recompute cascade, measured
    // 68 s at the 100× ladder rung vs ~11 s cached)
    var prevCache: Option[DataFrame] = None
    // hop loop under the harness loop-partition scope (BatchScale):
    // each hop's frames are queries×beam rows — kilobytes — while
    // the graph BUILDS above this loop keep the session parallelism
    graft.util.BatchScale.withLoopPartitions(q.sparkSession) {
    for (_ <- 1 to hops) {
      val cand = beam
        .union(beam.join(edges, beam("node") === edges("src"))
          .select(col("query_id"), col("nbr").as("node")))
        .distinct()
      val sc = cand
        .join(q, "query_id")
        .join(emb.select(col("vec_id").as("node"), col("v"), col("norm")),
          "node")
        .withColumn("cos",
          cosineOf(col("qv"), col("qnorm"), col("v"), col("norm")))
        .select(col("query_id"), col("node"), col("cos"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sc.count() // materialize: downstream hops read the cache
      prevCache.foreach(_.unpersist(blocking = false))
      prevCache = Some(sc)
      scored = sc
      beam = sc
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("node").asc)))
        .filter(col("rn") <= beamWidth)
        .select(col("query_id"), col("node"))
    }
    } // withLoopPartitions
    (scored, beam,
      prevCache.map(graft.util.CacheHandle(_))
        .getOrElse(graft.util.CacheHandle.none))
  }

  /** Layered-graph constants (q186): rank stride of the sparse upper
    * layer and the per-level hop budgets. */
  val LayerStride = 16
  val LayerHopsUpper = 3
  val LayerHopsBase = 3

  def layeredGraphSearchTopK(emb: DataFrame,
      numQueries: Int = NumQueryVectors): DataFrame =
    layeredGraphSearchTopKWithHandle(emb, numQueries)._1

  /** HNSW-STYLE layered serving graph (q186) — the hierarchy the
    * flat-spoke walk (q124) approximates with a constant factor:
    * LEVEL 1 is the deterministic rank-stride subsample (every
    * [[LayerStride]]-th node by vec_id rank through the q57 global
    * index — no random level draws, so the oracle mirrors the layer
    * membership exactly), carrying its own banded k-NN edges plus
    * its own long-range spokes; LEVEL 0 is the full q124 serving
    * graph. A query enters at the sparse layer's minimum node, walks
    * [[LayerHopsUpper]] hops there (each hop scans a 16×-smaller
    * graph), then DESCENDS: the upper beam seeds the base walk,
    * which needs only [[LayerHopsBase]] hops from an entry already
    * inside the target neighborhood instead of
    * [[GraphSearchHops]]-from-global-entry. Extending the ladder:
    * rank-stride levels compose (stride², stride³ …) so walk length
    * grows O(log_stride n) while the flat walk's hop budget must
    * grow with corpus diameter. Per-hop mechanics, scoring, and the
    * final top-k rule are EXACTLY q124's (shared [[beamWalk]] /
    * [[finishWalk]]), so the q124 oracle pattern grades it with the
    * levels unrolled. */
  def layeredGraphSearchTopKWithHandle(emb0: DataFrame,
      numQueries: Int = NumQueryVectors,
      stride: Int = LayerStride,
      hopsUpper: Int = LayerHopsUpper,
      hopsBase: Int = LayerHopsBase,
      beamWidth: Int = GraphSearchBeam)
      : (DataFrame, graft.util.CacheHandle) = {
    val emb = emb0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = queries(emb, numQueries)
    // Each level's build output and the cross-level seed are
    // lineage-CUT with an eager localCheckpoint (the q141/Bpe
    // discipline): composing two walks puts one walk's full DAG
    // inside every hop of the next, and the plan TREE — not the
    // data — is what breaks (a 500-vector fixture spent minutes in
    // TreeNode.generateTreeString and OOM'd an 8 GiB driver before
    // the cuts; 36 s of actual compute). Eager cuts also let every
    // upstream cache release immediately instead of riding the
    // returned handle.
    // deterministic layer membership: every stride-th node by rank
    val (ranked, rkHandle) = GlobalIndex.globalRowIndexWithHandle(
      emb.select(col("vec_id")), Seq(col("vec_id")), LongRangePartitions)
    val upperEmb = emb.join(
        ranked.filter(col("global_idx") % stride === 0)
          .select(col("vec_id")), "vec_id")
      .localCheckpoint()
    rkHandle.release()
    val (uspokes, usHandle) = longRangeEdgesWithHandle(upperEmb)
    val uedges = knnGraph(upperEmb)
      .select(col("src"), col("neighbor_id").as("nbr"))
      .union(uspokes)
      .localCheckpoint()
    usHandle.release()
    val (bspokes, bsHandle) = longRangeEdgesWithHandle(emb)
    val bedges = knnGraph(emb)
      .select(col("src"), col("neighbor_id").as("nbr"))
      .union(bspokes)
      .localCheckpoint()
    bsHandle.release()
    val (out, walkHandle) = layeredSearchOverEdges(emb, upperEmb,
      uedges, bedges, numQueries, hopsUpper, hopsBase, beamWidth)
    (out, graft.util.CacheHandle.combine(
      graft.util.CacheHandle(emb), walkHandle))
  }

  /** The SERVING path of the layered walk over PREBUILT level frames
    * — graphs are built once per ingest (the q112/q123 economics);
    * every query batch pays only the two walks: [[LayerHopsUpper]]
    * hops on the stride-sparse upper graph, the descend seed, and
    * [[LayerHopsBase]] hops on the base graph. This is what the
    * scale ladder times (ScaleProbe `layered_search`): the walk must
    * stay ~flat in corpus size while the flat q124 walk's hop budget
    * would have to grow with graph diameter. */
  def layeredSearchOverEdges(emb: DataFrame, upperEmb: DataFrame,
      uedges: DataFrame, bedges: DataFrame,
      numQueries: Int = NumQueryVectors,
      hopsUpper: Int = LayerHopsUpper,
      hopsBase: Int = LayerHopsBase,
      beamWidth: Int = GraphSearchBeam)
      : (DataFrame, graft.util.CacheHandle) = {
    val q = queries(emb, numQueries)
    val uentry = upperEmb.agg(min(col("vec_id"))).head().getLong(0)
    val ubeam0 = q.select(col("query_id"))
      .withColumn("node", lit(uentry))
    val (_, ubeam, uCache) = beamWalk(q, emb, uedges, ubeam0,
      hopsUpper, beamWidth)
    // descend: the upper beam (lineage-cut) seeds the base-level walk
    val seed = ubeam.select(col("query_id"), col("node"))
      .localCheckpoint()
    uCache.release()
    val (scored, beam, bCache) = beamWalk(q, emb, bedges, seed,
      hopsBase, beamWidth)
    (finishWalk(scored, beam), bCache)
  }

  /** Rank stride of the THREE-level graded configuration (q225):
    * level 1 every [[Layer3Stride]]-th node by rank, level 2 every
    * stride²-th — small enough that the top layer is non-degenerate
    * at the gate's 500/2,000-vector corpora while the ladder runs
    * the production [[LayerStride]]. */
  val Layer3Stride = 8

  def layeredGraphSearchTopK3(emb: DataFrame,
      numQueries: Int = NumQueryVectors): DataFrame =
    layeredGraphSearchTopK3WithHandle(emb, numQueries)._1

  /** THREE-level layered serving graph (q225) — the next rung of
    * q186's hierarchy, proving the levels COMPOSE as the q186
    * scaladoc claims: LEVEL 2 is every stride²-th node by rank,
    * LEVEL 1 every stride-th, LEVEL 0 the full q124 serving graph,
    * each carrying its own banded k-NN edges plus its own rank-space
    * spokes. A query enters at level 2's minimum node, walks
    * [[LayerHopsUpper]] hops on a stride²-smaller graph, DESCENDS to
    * seed the level-1 walk ([[LayerHopsUpper]] hops), descends again
    * to seed the base walk ([[LayerHopsBase]] hops). Per-hop
    * mechanics, scoring, and the final top-k rule are EXACTLY
    * q124/q186's (shared [[beamWalk]]/[[finishWalk]]), so the q186
    * oracle pattern grades it with one more level unrolled.
    *
    * Scale design (100 TB): walk length grows O(log_stride n) — at
    * a 10⁹-vector corpus the three-level entry walk touches graphs
    * of n/256, n/16, n while the flat q124 walk's hop budget must
    * grow with corpus diameter; each hop is beam×degree bounded
    * rows, so the query batch never scans the corpus. The ladder
    * stage `layered3_search` times the serving path at the
    * production stride against the 2-level and flat walks. */
  def layeredGraphSearchTopK3WithHandle(emb0: DataFrame,
      numQueries: Int = NumQueryVectors,
      stride: Int = Layer3Stride,
      hopsUpper: Int = LayerHopsUpper,
      hopsBase: Int = LayerHopsBase,
      beamWidth: Int = GraphSearchBeam)
      : (DataFrame, graft.util.CacheHandle) = {
    val emb = emb0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // levels and edges lineage-CUT per the q186 discipline (the
    // composed-walk plan tree, not the data, is what breaks)
    val (ranked, rkHandle) = GlobalIndex.globalRowIndexWithHandle(
      emb.select(col("vec_id")), Seq(col("vec_id")), LongRangePartitions)
    def levelEmb(step: Long): DataFrame = emb.join(
        ranked.filter(col("global_idx") % step === 0)
          .select(col("vec_id")), "vec_id")
      .localCheckpoint()
    val topEmb = levelEmb(stride.toLong * stride)
    val upperEmb = levelEmb(stride.toLong)
    rkHandle.release()
    def levelEdges(lvl: DataFrame): DataFrame = {
      val (spokes, h) = longRangeEdgesWithHandle(lvl)
      val e = knnGraph(lvl)
        .select(col("src"), col("neighbor_id").as("nbr"))
        .union(spokes)
        .localCheckpoint()
      h.release()
      e
    }
    val tedges = levelEdges(topEmb)
    val uedges = levelEdges(upperEmb)
    val bedges = levelEdges(emb)
    val (out, walkHandle) = layered3SearchOverEdges(emb, topEmb,
      tedges, uedges, bedges, numQueries, hopsUpper, hopsBase,
      beamWidth)
    (out, graft.util.CacheHandle.combine(
      graft.util.CacheHandle(emb), walkHandle))
  }

  /** The SERVING path of the three-level walk over PREBUILT level
    * frames (q225) — what the scale ladder times (`layered3_search`):
    * [[LayerHopsUpper]] hops on the stride²-sparse top graph, descend,
    * [[LayerHopsUpper]] hops on the stride-sparse middle graph,
    * descend, [[LayerHopsBase]] hops on the base graph. */
  def layered3SearchOverEdges(emb: DataFrame, topEmb: DataFrame,
      tedges: DataFrame, uedges: DataFrame, bedges: DataFrame,
      numQueries: Int = NumQueryVectors,
      hopsUpper: Int = LayerHopsUpper,
      hopsBase: Int = LayerHopsBase,
      beamWidth: Int = GraphSearchBeam)
      : (DataFrame, graft.util.CacheHandle) = {
    val q = queries(emb, numQueries)
    val tentry = topEmb.agg(min(col("vec_id"))).head().getLong(0)
    val tbeam0 = q.select(col("query_id"))
      .withColumn("node", lit(tentry))
    val (_, tbeam, tCache) = beamWalk(q, emb, tedges, tbeam0,
      hopsUpper, beamWidth)
    val useed = tbeam.select(col("query_id"), col("node"))
      .localCheckpoint()
    tCache.release()
    val (_, ubeam, uCache) = beamWalk(q, emb, uedges, useed,
      hopsUpper, beamWidth)
    val bseed = ubeam.select(col("query_id"), col("node"))
      .localCheckpoint()
    uCache.release()
    val (scored, beam, bCache) = beamWalk(q, emb, bedges, bseed,
      hopsBase, beamWidth)
    (finishWalk(scored, beam), bCache)
  }

  /** Binary-embedding search constants (q121): the Hamming pool the
    * exact re-rank refines. */
  val HammingPoolK = 40

  /** Binary sign-embedding search (q121) — the last rung of the
    * compression ladder after int8 (q73, 4×), MRL (q96, 4× by
    * prefix), and IVF-PQ (q106, 64× with codebooks): pack every
    * vector's SIGN pattern into one long (32× smaller than float32,
    * no codebook to train), scan candidates by Hamming distance —
    * ONE xor+popcount per comparison, the cheapest distance that
    * exists — and exactly re-rank the top-[[HammingPoolK]] pool by
    * full-precision cosine. E[hamming] = Dim·acos(cos θ)/π links the
    * two metrics, so Hamming ranking preserves cosine neighborhoods
    * (recall vs brute force pinned in SimilaritySpec on the
    * clustered corpus).
    *
    * Scale design (100 TB): the scan moves 8 bytes per corpus vector
    * (the float corpus stays in cold storage until the pool
    * re-rank); distance is built-in codegen'd `bit_count(a ^ b)` —
    * integer arithmetic, bit-identical in both engines. */
  def binaryHammingTopK(emb: DataFrame,
      numQueries: Int = NumQueryVectors): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, SignPack}
    val coded = emb.withColumn("code",
      Bridge.column(SignPack(Bridge.expression(col("v")))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = coded.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("code").as("qcode"))
    val scanned = broadcast(q.select(col("query_id"), col("qcode")))
      .crossJoin(coded.select(col("vec_id"), col("code")))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("hamming",
        bit_count(expr("qcode ^ code")).cast("long"))
      .select(col("query_id"), col("vec_id"), col("hamming"))
    val extensionsActive = scanned.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val pool =
      (if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(scanned, Seq("query_id"),
          Seq("hamming" -> true, "vec_id" -> true), HammingPoolK)
      else scanned
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("hamming").asc, col("vec_id").asc)).cast("long"))
        .filter(col("rank") <= HammingPoolK))
        .select(col("query_id"), col("vec_id"))
    val rescored = pool
      .join(q.select(col("query_id"), col("qv"), col("qnorm")), "query_id")
      .join(coded.select(col("vec_id"), col("v"), col("norm")), "vec_id")
      .withColumn("cosine", cosine)
    topK(rescored)
  }

  /** Mining constants (q119): neighborhood size of the margin
    * denominator and the acceptance cut. k = 4 is the standard
    * margin-kNN size at fixture scale; the cut is data-driven like
    * [[NearDupCosine]] (fixture margin distribution measured in the
    * scaladoc of [[mineAlignedPairs]]). */
  val MineK = 4
  val MineMargin = 1.1

  /** [[embeddings]] plus the label column (row-local, no join) — the
    * two-corpus split key of the q119 mining query. */
  def embeddingsLabeled(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))

  /** JL output dimension (q205): 64 → 16, the 4× first-pass
    * compression. */
  val JlOutDim = 16

  /** The ±1 JL sign matrix [out dim][in dim] — Knuth-hash parity of
    * the flattened index, generated once in Scala and inlined as
    * literals on BOTH engines (the dedupPlanes discipline), so there
    * is no runtime randomness anywhere. */
  lazy val jlSigns: IndexedSeq[IndexedSeq[Double]] =
    (0 until JlOutDim).map(j => (0 until Dim).map { i =>
      if ((((i * JlOutDim + j) * Sampling.HashMult) / 1048576) % 2 == 0)
        1.0
      else -1.0
    })

  /** Johnson–Lindenstrauss random projection (q205, Achlioptas-style
    * ±1 signs) — the ZERO-TRAINING dimensionality reducer
    * complementing [[pcaWhiten]] (q115, which needs a moments pass)
    * and [[signBits]]-style 1-bit sketches (q8/q121, which keep only
    * angles): p_j = ⟨v, s_j⟩/√k with s_j the deterministic hash-sign
    * rows, preserving pairwise geometry in expectation (the JL
    * lemma) with no pass over the data, no codebook, and no state —
    * the first-stage compressor a 100 TB embedding pipeline runs
    * BEFORE anything trained, because it works on day one and never
    * drifts. Dot products ride the codegen'd sequential-fold
    * [[DotProduct]] against literal sign arrays; √k = 4 exactly, so
    * the one division is a power-of-two scale, bit-identical in the
    * mirror.
    *
    * Scale design (100 TB): strictly row-local — one projection per
    * row inside whole-stage codegen, zero shuffles, composes with
    * any downstream banding/IVF over the 4×-smaller vectors. */
  def jlProject(emb: DataFrame): DataFrame = {
    val scale = math.sqrt(JlOutDim.toDouble)
    emb.select(col("vec_id") +: (0 until JlOutDim).map { j =>
      (dot(col("v"), array(jlSigns(j).map(lit): _*)) / scale)
        .as(s"p${j + 1}")
    }: _*)
  }

  /** k-NN label-disagreement audit (q203) — confident-learning-style
    * mislabel detection, the label-quality member of the curation
    * family: a vector whose own label disagrees with the MODAL label
    * of its k nearest neighbors is a mislabel suspect (or sits on a
    * genuine class boundary — the audit table is what a human or a
    * downstream filter triages). Modal vote ties break
    * deterministically to the LOWEST label (max on (count, −label) —
    * the house struct-ordering idiom, bit-identical to the oracle's
    * ORDER BY cnt DESC, label ASC pick).
    *
    * Scale design (100 TB): rides [[knnGraph]]'s banded construction
    * (no new candidate machinery); the vote table is ≤ k rows per
    * node before the map-side-combined (src, label) rollup, labels
    * join on the already-shuffled src key, and nothing touches the
    * vectors after the graph exists. */
  def labelDisagreement(embL: DataFrame, k: Int = KnnGraphK): DataFrame = {
    val labels = embL.select(col("vec_id"),
      col("label").cast("long").as("label"))
    val g = knnGraph(embL.select(col("vec_id"), col("v"), col("norm")),
      k = k)
    val votes = g
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("nbr_label")), "neighbor_id")
      .groupBy(col("src"), col("nbr_label"))
      .agg(count(lit(1)).as("cnt"))
    val modal = votes.groupBy(col("src"))
      .agg(max(struct(col("cnt"), (-col("nbr_label")).as("neg"))).as("m"),
        sum(col("cnt")).as("n_nbrs"))
      .select(col("src").as("vec_id"),
        col("m.cnt").as("modal_count"),
        (-col("m.neg")).as("modal_label"),
        col("n_nbrs"))
    modal.join(labels, "vec_id")
      .select(col("vec_id"), col("label"), col("modal_label"),
        col("modal_count"), col("n_nbrs"),
        (col("label") =!= col("modal_label")).as("suspect"))
  }

  /** Cross-corpus alignment mining (q119) — the bitext-mining recipe
    * of CCMatrix/LASER (Artetxe & Schwenk margin scoring): for every
    * vector of corpus X, its best corpus-Y match by the RATIO margin
    *
    *   margin(x,y) = cos(x,y) / ((avgNNₖ(x) + avgNNₖ(y)) / 2)
    *
    * which normalizes away hubness (a y that is "close to everything"
    * has a high avgNNₖ(y) and stops winning every x). Pairs keep only
    * margin ≥ `threshold`.
    *
    * Scale shape: candidates are CROSS-side band collisions (the q112
    * banding — one shuffle on the band key, never |X|·|Y|), the
    * scored pair frame is computed once and persisted (it feeds both
    * directions' neighborhoods and the final margin), both
    * neighborhood averages rank through the TopKPerGroup heaps, and
    * the per-x argmax is one more heap pass. */
  def mineAlignedPairs(embX: DataFrame, embY: DataFrame,
      k: Int = MineK, threshold: Double = MineMargin,
      bitsPerBand: Int = DedupBitsPerBand): DataFrame = {
    val bx = embX.select(col("vec_id"),
      posexplode(dedupBandKeysArray(col("v"), bitsPerBand))
        .as(Seq("band", "key"))).alias("a")
    val by = embY.select(col("vec_id"),
      posexplode(dedupBandKeysArray(col("v"), bitsPerBand))
        .as(Seq("band", "key"))).alias("b")
    val candIds = bx.join(by,
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.vec_id").as("x_id"), col("b.vec_id").as("y_id"))
      .distinct()
    val vx = embX.select(col("vec_id").as("x_id"), col("v").as("qv"),
      col("norm").as("qnorm"))
    val vy = embY.select(col("vec_id").as("y_id"), col("v"), col("norm"))
    val scored = candIds.join(vx, "x_id").join(vy, "y_id")
      .withColumn("cosine", cosine)
      .select(col("x_id"), col("y_id"), col("cosine"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def nnAvg(group: String, other: String, out: String): DataFrame =
      org.apache.spark.sql.graft.TopK.perGroup(scored, Seq(group),
        Seq("cosine" -> false, other -> true), k)
        .groupBy(col(group))
        .agg(avg(col("cosine")).as(out))
    val ax = nnAvg("x_id", "y_id", "avg_x")
    val ay = nnAvg("y_id", "x_id", "avg_y")
    val margins = scored.join(ax, "x_id").join(ay, "y_id")
      .withColumn("margin",
        col("cosine") / ((col("avg_x") + col("avg_y")) / 2.0))
      .select(col("x_id"), col("y_id"), col("cosine"), col("margin"))
    org.apache.spark.sql.graft.TopK.perGroup(margins, Seq("x_id"),
        Seq("margin" -> false, "y_id" -> true), 1)
      .filter(col("margin") >= threshold)
      .select(col("x_id"), col("y_id"), col("cosine"), col("margin"))
  }

  /** PCA whitening constants (q115): components kept, power
    * iterations per component, and the ordered-fold bucket fan-in of
    * the moment sums. PcaBuckets is a determinism knob, not a
    * parallelism limit — each bucket folds its members in ascending
    * vec_id order and the driver folds buckets in ascending id, so
    * the Gramian is BIT-IDENTICAL under any partitioning (the q103
    * reduceCellSums discipline with an outer-product payload). */
  val PcaDim = 4
  val PcaIters = 12
  val PcaBuckets = 32

  /** Deterministic sample moments: n, Σv (Dim), Σvvᵀ (Dim², row
    * major) — per-bucket executor-side ordered folds, ascending-
    * bucket driver fold; only PcaBuckets×(Dim²+Dim+1) doubles cross
    * to the driver (the codebook bring-to-driver contract). */
  private def pcaMoments(sample: DataFrame)
      : (Long, Array[Double], Array[Double]) = {
    val zeros64 = typedLit(Seq.fill(Dim)(0.0))
    val zerosM = typedLit(Seq.fill(Dim * Dim)(0.0))
    val rows = sample
      .select((col("vec_id") % PcaBuckets).as("b"), col("vec_id"), col("v"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("cnt"),
        array_sort(collect_list(struct(col("vec_id"), col("v")))).as("mv"))
      .select(col("b"), col("cnt"),
        aggregate(expr("transform(mv, m -> m.v)"), zeros64,
          (acc, x) => zip_with(acc, x, (a, c) => a + c)).as("sv"),
        aggregate(
          expr("transform(mv, m -> " +
            "flatten(transform(m.v, x -> transform(m.v, y -> x * y))))"),
          zerosM,
          (acc, x) => zip_with(acc, x, (a, c) => a + c)).as("sm"))
      .orderBy(col("b"))
      .collect()
    var n = 0L
    val sv = new Array[Double](Dim)
    val sm = new Array[Double](Dim * Dim)
    rows.foreach { r =>
      n += r.getLong(1)
      val s1 = r.getSeq[Double](2)
      val s2 = r.getSeq[Double](3)
      var i = 0
      while (i < Dim) { sv(i) = sv(i) + s1(i); i += 1 }
      i = 0
      while (i < Dim * Dim) { sm(i) = sm(i) + s2(i); i += 1 }
    }
    (n, sv, sm)
  }

  /** Driver-side deterministic power iteration with deflation over
    * the Dim×Dim sample covariance (bounded work — the codebook
    * contract): [[PcaIters]] iterations per component from the e_k
    * start vector, Rayleigh eigenvalue, rank-1 deflation. Every fold
    * ascends (the DuckDB mirror replays each operation in order, so
    * the graded projection is bit-deterministic). */
  private[operators] def pcaTrain(n: Long, sv: Array[Double],
      sm: Array[Double]): (Array[Double], Array[Array[Double]], Array[Double]) = {
    val mu = Array.tabulate(Dim)(i => sv(i) / n)
    val m = new Array[Double](Dim * Dim)
    var r = 0
    while (r < Dim) {
      var c = 0
      while (c < Dim) {
        m(r * Dim + c) = sm(r * Dim + c) / n - mu(r) * mu(c)
        c += 1
      }
      r += 1
    }
    def matvec(mm: Array[Double], u: Array[Double]): Array[Double] =
      Array.tabulate(Dim) { rr =>
        var acc = 0.0
        var cc = 0
        while (cc < Dim) { acc = acc + mm(rr * Dim + cc) * u(cc); cc += 1 }
        acc
      }
    val comps = new Array[Array[Double]](PcaDim)
    val lams = new Array[Double](PcaDim)
    var k = 0
    while (k < PcaDim) {
      var u = Array.tabulate(Dim)(i => if (i == k) 1.0 else 0.0)
      var t = 0
      while (t < PcaIters) {
        val w = matvec(m, u)
        var acc = 0.0
        var i = 0
        while (i < Dim) { acc = acc + w(i) * w(i); i += 1 }
        val nrm = math.sqrt(acc)
        u = w.map(_ / nrm)
        t += 1
      }
      val w = matvec(m, u)
      var lam = 0.0
      var i = 0
      while (i < Dim) { lam = lam + u(i) * w(i); i += 1 }
      comps(k) = u
      lams(k) = lam
      r = 0
      while (r < Dim) {
        var c = 0
        while (c < Dim) {
          m(r * Dim + c) = m(r * Dim + c) - lam * u(r) * u(c)
          c += 1
        }
        r += 1
      }
      k += 1
    }
    (mu, comps, lams)
  }

  /** PCA whitening of the embedding corpus (q115) — the embedding
    * PREPROCESSING rung of the ANN/curation family (whitened
    * embeddings improve retrieval and SemDedup cell balance; also
    * the classic 4× dimensionality-reduction alternative to MRL's
    * learned prefixes and PQ's codebooks): project every vector onto
    * the top [[PcaDim]] principal axes of the vec_id < TrainSample
    * covariance and scale each coordinate by 1/√λ.
    *
    * Scale design (100 TB): training moments are executor-side
    * ordered folds over the bounded sample ([[pcaMoments]]); the
    * eigen-solve is Dim²-bounded driver work; the corpus projection
    * is row-local codegen'd dot products against the baked component
    * vectors — zero shuffle, same shape as the IVF assignment.
    * Coordinates round to 12 decimals in BOTH engines (the q104
    * compare-robustness precedent). */
  def pcaWhiten(emb: DataFrame,
      trainSample: Int = TrainSample): DataFrame = {
    val (n, sv, sm) = pcaMoments(
      emb.filter(col("vec_id") < trainSample).select(col("vec_id"), col("v")))
    val (mu, comps, lams) = pcaTrain(n, sv, sm)
    val cols = (0 until PcaDim).map { k =>
      val u = comps(k)
      var mdot = 0.0
      var i = 0
      while (i < Dim) { mdot = mdot + mu(i) * u(i); i += 1 }
      val invs = 1.0 / math.sqrt(lams(k))
      round((dot(col("v"), typedLit(u.toSeq)) - lit(mdot)) * lit(invs), 12)
        .as(s"p${k + 1}")
    }
    emb.select(col("vec_id") +: cols: _*)
  }

  /** The IVF codebook: centroids from the DISTRIBUTED trainer over
    * the vec_id < trainSample minibatch, baked into the assignment
    * expression as (flattened centroid matrix, norms, cell ids
    * 0..NumCentroids−1). */
  private def codebook(emb: DataFrame, iters: Int,
      numCentroids: Int = NumCentroids,
      trainSample: Int = TrainSample)
      : (Array[Double], Array[Double], Array[Int]) = {
    val cents = trainCentroidsDistributed(
      emb.filter(col("vec_id") < trainSample), iters, numCentroids)
    val cnorms = cents.map(c => math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))
    (cents.flatten, cnorms, cents.indices.toArray)
  }

  /** Corpus→cell assignment under the trained codebook — exposed so
    * the spec can measure inverted-list balance (max cell size bounds
    * the per-probe scan cost at scale). */
  def ivfCorpusCells(emb: DataFrame, iters: Int = KMeansIters): DataFrame = {
    val (cents, cnorms, ids) = codebook(emb, iters)
    emb.select(col("vec_id"),
      element_at(Bridge.column(org.apache.spark.sql.graft.NearestCentroids(
        Bridge.expression(col("v")), Bridge.expression(col("norm")),
        cents, cnorms, ids, 1)), 1).as("cell"))
  }

  /** Per-cell clustering-quality profile (q125) — the monitoring
    * table every clustered-corpus deployment watches (the embedding
    * twin of the q61/q79 relational profiles): for each k-means cell
    * of the q103 codebook, member count, INERTIA (Σ‖v−c‖², the
    * within-cluster sum of squares k is tuned against) and the mean
    * member norm. Cell skew here is what q108's quota caps; inertia
    * growth signals a stale codebook (retrain trigger).
    *
    * Scale design: assignment is the row-local codegen'd expression
    * (the q103 path), the k-row centroid table broadcast-joins, the
    * squared distance is a row-local sequential fold (mirrored
    * term-for-term by the oracle), and ONE k-group aggregation ends
    * the plan — map-side combined, k rows out. */
  def cellProfile(emb: DataFrame, iters: Int = KMeansIters): DataFrame = {
    import emb.sparkSession.implicits._
    val (cents, cnorms, ids) = codebook(emb, iters)
    val centDf = ids.map(i =>
      (i, cents.slice(i * Dim, (i + 1) * Dim).toSeq)).toSeq
      .toDF("cell", "cv")
    val assigned = emb.select(col("vec_id"), col("v"), col("norm"),
      element_at(Bridge.column(org.apache.spark.sql.graft.NearestCentroids(
        Bridge.expression(col("v")), Bridge.expression(col("norm")),
        cents, cnorms, ids, 1)), 1).as("cell"))
    assigned.join(broadcast(centDf), "cell")
      .withColumn("d2",
        aggregate(zip_with(col("v"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("d2")).as("inertia"),
        (sum(col("norm")) / count(lit(1))).as("mean_norm"))
  }

  /** Graded coarse-fine constants (q170): k large enough that the
    * two-stage cut matters — flat assignment is 64 dots/vector,
    * coarse-fine is 8 + ≤64/8·slack ≈ 16 (the measured 2.1×-under-
    * exact at the 100× ladder rung uses the same √k shape). g is
    * EXPLICIT (not auto-√k): the graded contract is the two-stage
    * argmin SEMANTICS, mirrored exactly by the oracle — stage-1
    * disagreement with flat assignment is a measured spec quantity,
    * not a correctness hope. */
  val CoarseFineK = 64
  val CoarseFineGroups = 8

  /** Corpus→cell assignment through a COARSE-FINE codebook hierarchy
    * — the cure for the f²-growth term the curation ladder names:
    * when cells scale with the corpus (SemDedup's regime, 8·factor
    * cells), flat assignment is n·k dot products and grows
    * quadratically; clustering the k fine centroids into g ≈ √k
    * coarse groups (a DRIVER-side Lloyd — the codebook is always
    * driver-sized) cuts it to n·(g + k/g), ~2√k. Stage 1 picks the
    * nearest coarse group, stage 2 is EXACT within that group, so
    * the approximation is only a vector whose true cell sits in a
    * different group than its nearest coarse centroid — agreement
    * measured in SimilaritySpec; `groups = 1` is EXACTLY
    * [[ivfCorpusCells]] (spec-pinned equality). Row-local codegen'd
    * expression, zero shuffle of the corpus, same as the flat path. */
  /** The baked two-level codebook of the coarse-fine family: stage-1
    * coarse centroids (flattened) + the group-sorted fine layout
    * (group g owns fine slots [offsets(g), offsets(g+1))). Always
    * driver-sized — it IS the codebook, never the corpus. */
  final case class CoarseFineBook(coarseFlat: Array[Double],
      coarseNorms: Array[Double], sortedCents: Array[Double],
      sortedNorms: Array[Double], sortedIds: Array[Int],
      offsets: Array[Int])

  def ivfCorpusCellsCoarse(emb: DataFrame, iters: Int = KMeansIters,
      numCentroids: Int = NumCentroids, trainSample: Int = TrainSample,
      groups: Int = 0): DataFrame = {
    val book = coarseFineBook(emb, iters, numCentroids, trainSample,
      groups)
    emb.select(col("vec_id"),
      Bridge.column(org.apache.spark.sql.graft.NearestCentroidCoarseFine(
        Bridge.expression(col("v")), Bridge.expression(col("norm")),
        book.coarseFlat, book.coarseNorms, book.sortedCents,
        book.sortedNorms, book.sortedIds, book.offsets)).as("cell"))
  }

  /** Build the [[CoarseFineBook]]: train the fine codebook, Lloyd the
    * fine centroids into g coarse groups on the driver, group-sort
    * the fine layout, drop empty coarse groups. */
  def coarseFineBook(emb: DataFrame, iters: Int = KMeansIters,
      numCentroids: Int = NumCentroids, trainSample: Int = TrainSample,
      groups: Int = 0): CoarseFineBook = {
    val (cents, cnorms, ids) = codebook(emb, iters, numCentroids,
      trainSample)
    val k = ids.length
    val dim = SimilarityParams.Dim
    val g = if (groups > 0) math.min(groups, math.max(1, k))
      else math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    // cluster the FINE CENTROIDS with the driver Lloyd twin (k·dim
    // doubles — always driver-sized), then assign each fine slot to
    // its nearest coarse centroid by the same first-wins argmax
    val fine: IndexedSeq[(IndexedSeq[Double], Double)] =
      (0 until k).map { j =>
        ((0 until dim).map(i => cents(j * dim + i)), cnorms(j))
      }
    val coarseArr = trainCentroids(fine, iters, g)
    val coarseNorms = coarseArr.map(c =>
      math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))
    def groupOf(j: Int): Int = {
      var best = 0
      var bestCos = Double.NegativeInfinity
      var cg = 0
      while (cg < coarseArr.length) {
        var d = 0.0
        var i = 0
        while (i < dim) { d += cents(j * dim + i) * coarseArr(cg)(i); i += 1 }
        val cos = d / (cnorms(j) * coarseNorms(cg))
        if (cos > bestCos) { bestCos = cos; best = cg }
        cg += 1
      }
      best
    }
    // group-sorted fine layout: group gg owns slots
    // [offsets(gg), offsets(gg+1)) so stage 2 scans one slice
    val order = (0 until k).sortBy(j => (groupOf(j), ids(j)))
    val sortedCents = new Array[Double](k * dim)
    val sortedNorms = new Array[Double](k)
    val sortedIds = new Array[Int](k)
    order.zipWithIndex.foreach { case (j, slot) =>
      System.arraycopy(cents, j * dim, sortedCents, slot * dim, dim)
      sortedNorms(slot) = cnorms(j)
      sortedIds(slot) = ids(j)
    }
    val offsets = new Array[Int](coarseArr.length + 1)
    order.zipWithIndex.foreach { case (j, slot) =>
      offsets(groupOf(j) + 1) = slot + 1
    }
    // empty groups inherit the previous boundary (zero-width slice)
    (1 until offsets.length).foreach { i =>
      if (offsets(i) < offsets(i - 1)) offsets(i) = offsets(i - 1)
    }
    // Drop EMPTY coarse groups from the baked stage-1 arrays: a coarse
    // centroid that owns no fine slot can still win the stage-1 argmax
    // (its Lloyd position drifted off its members), and the kernel
    // would then scan a zero-width slice and emit −1. Ranking only the
    // non-empty groups is both the sensible semantic (an empty group
    // has no cell to offer) and the exactly-mirrorable one — the
    // oracle's stage-1 CTE ranks the groups that own fine slots.
    val nonEmpty = (0 until coarseArr.length)
      .filter(gg => offsets(gg + 1) > offsets(gg))
    val keptCoarse = nonEmpty.map(coarseArr).toArray
    val keptNorms = nonEmpty.map(coarseNorms).toArray
    val keptOffsets = (nonEmpty.map(offsets) :+ offsets.last).toArray
    CoarseFineBook(keptCoarse.flatten, keptNorms, sortedCents,
      sortedNorms, sortedIds, keptOffsets)
  }

  /** IVF approximate top-k: corpus vectors live in their nearest
    * centroid's cell; a query probes its NProbe nearest cells and
    * ranks exact cosine over those cells only — per-query cost is
    * ~NProbe/NumCentroids of the corpus, the inverted-file scale
    * path. Cell assignment is a codegen'd row-local expression with
    * the codebook baked in (ZERO shuffle of the corpus — a
    * crossJoin+Window assignment would shuffle 16× the corpus). */
  def ivfTopK(emb0: DataFrame, iters: Int = KMeansIters,
      numQueries: Int = NumQueryVectors,
      numCentroids: Int = NumCentroids,
      trainSample: Int = TrainSample): DataFrame =
    ivfTopKWithHandle(emb0, iters, numQueries, numCentroids,
      trainSample)._1

  /** [[ivfTopK]] plus the [[graft.util.CacheHandle]] releasing the
    * persisted embedding corpus (feeds codebook training, cell
    * assignment, and the exact-cosine re-join). */
  def ivfTopKWithHandle(emb0: DataFrame, iters: Int = KMeansIters,
      numQueries: Int = NumQueryVectors,
      numCentroids: Int = NumCentroids,
      trainSample: Int = TrainSample): (DataFrame, graft.util.CacheHandle) = {
    val emb = emb0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val handle = graft.util.CacheHandle(emb)
    val (cents, cnorms, ids) = codebook(emb, iters, numCentroids,
      trainSample)
    // a tiny corpus yields fewer centroids than NProbe (or none at
    // all): probe what exists; an empty codebook has no cells and no
    // neighbors
    if (ids.isEmpty)
      return (topK(queries(emb, numQueries)
        .filter(lit(false))
        .select(col("query_id"), col("query_id").as("vec_id"))
        .withColumn("cosine", lit(0.0))), handle)
    def cells(v: Column, n: Column, k: Int): Column =
      Bridge.column(org.apache.spark.sql.graft.NearestCentroids(
        Bridge.expression(v), Bridge.expression(n), cents, cnorms, ids, k))

    val corpusCells = emb.select(col("vec_id"),
      element_at(cells(col("v"), col("norm"), 1), 1).as("cell"))
    val queryCells = queries(emb, numQueries).select(col("query_id"),
      explode(cells(col("qv"), col("qnorm"), math.min(NProbe, ids.size)))
        .as("cell"))
    val candIds = queryCells.join(corpusCells, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val cand = candIds
      .join(queries(emb, numQueries)
        .select(col("query_id"), col("qv"), col("qnorm")), "query_id")
      .join(emb, "vec_id")
    (topK(cand.withColumn("cosine", cosine)), handle)
  }

  /** Coarse groups a query's group-consistent probe covers in
    * [[ivfTopKCoarse]]: 2 groups ≈ 2·k/g ≈ 2√k fine cells. */
  val CoarseProbeGroups = 2

  def ivfTopKCoarse(emb0: DataFrame, iters: Int = KMeansIters,
      numQueries: Int = NumQueryVectors,
      numCentroids: Int = NumCentroids,
      trainSample: Int = TrainSample): DataFrame =
    ivfTopKCoarseWithHandle(emb0, iters, numQueries, numCentroids,
      trainSample)._1

  /** END-TO-END retrieval through the coarse-fine path — what a user
    * of the q170 assignment actually runs at the cells-scale-with-
    * corpus point. The f²-growth term is the CORPUS side (n·k dots
    * when cells scale with the corpus), so that is where the
    * two-stage cut goes: corpus vectors live in the cell the
    * coarse-fine argmin assigns (n·(g + k/g) ≈ 2√k dots per vector,
    * zero shuffle). The QUERY side is a query batch — orders of
    * magnitude smaller than the corpus — so it ranks its NProbe
    * nearest fine cells EXACTLY (nQ·k dots, negligible; a
    * corpus-sized query load would reuse the corpus expression and
    * accept the stage-1 disagreement). End-to-end recall therefore
    * tracks flat-IVF recall × stage-1 agreement (~0.98 measured by
    * the q170 spec) — pinned on the clustered fixture in
    * SimilaritySpec, measured against brute at the scaled rung
    * (ScaleProbe `search_coarse`). */
  def ivfTopKCoarseWithHandle(emb0: DataFrame, iters: Int = KMeansIters,
      numQueries: Int = NumQueryVectors,
      numCentroids: Int = NumCentroids,
      trainSample: Int = TrainSample)
      : (DataFrame, graft.util.CacheHandle) = {
    val emb = emb0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val handle = graft.util.CacheHandle(emb)
    val book = coarseFineBook(emb, iters, numCentroids, trainSample)
    if (book.sortedIds.isEmpty)
      return (topK(queries(emb, numQueries)
        .filter(lit(false))
        .select(col("query_id"), col("query_id").as("vec_id"))
        .withColumn("cosine", lit(0.0))), handle)
    // corpus side: the two-stage assignment expression, zero shuffle
    val corpusCells = emb.select(col("vec_id"),
      Bridge.column(org.apache.spark.sql.graft.NearestCentroidCoarseFine(
        Bridge.expression(col("v")), Bridge.expression(col("norm")),
        book.coarseFlat, book.coarseNorms, book.sortedCents,
        book.sortedNorms, book.sortedIds, book.offsets)).as("cell"))
    // query side (query batches are tiny next to the corpus — both
    // rankings below are driver-codebook expressions, nQ·k dots
    // total): probe the UNION of
    //   (a) the query's NProbe exact-nearest fine cells — catches
    //       corpus vectors whose two-stage cell agrees with their
    //       exact cell (the ~0.98 clustered-agreement mass), and
    //   (b) every fine cell of the query's CoarseProbeGroups nearest
    //       coarse groups — catches vectors stage 1 drifted into a
    //       sibling cell of their group (two-stage-CONSISTENT probing:
    //       the index and the probe approximate the same way).
    // (b) scans ~p·k/g ≈ 2√k cells' members — the same √k economics
    // as the assignment itself.
    val q0 = queries(emb, numQueries)
    val exactCells = q0.select(col("query_id"),
      explode(Bridge.column(org.apache.spark.sql.graft.NearestCentroids(
        Bridge.expression(col("qv")), Bridge.expression(col("qnorm")),
        book.sortedCents, book.sortedNorms, book.sortedIds,
        math.min(NProbe, book.sortedIds.length)))).as("cell"))
    val nGroups = book.offsets.length - 1
    val probeG = math.min(CoarseProbeGroups, nGroups)
    val queryGroups = q0.select(col("query_id"),
      explode(Bridge.column(org.apache.spark.sql.graft.NearestCentroids(
        Bridge.expression(col("qv")), Bridge.expression(col("qnorm")),
        book.coarseFlat, book.coarseNorms,
        Array.tabulate(nGroups)(identity), probeG))).as("grp"))
    import emb0.sparkSession.implicits._
    val groupCells = (0 until nGroups).flatMap(gg =>
      (book.offsets(gg) until book.offsets(gg + 1))
        .map(slot => (gg, book.sortedIds(slot))))
      .toDF("grp", "cell")
    val queryCells = exactCells.unionByName(
      queryGroups.join(broadcast(groupCells), "grp")
        .select(col("query_id"), col("cell"))).distinct()
    val candIds = queryCells.join(corpusCells, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val cand = candIds
      .join(queries(emb, numQueries)
        .select(col("query_id"), col("qv"), col("qnorm")), "query_id")
      .join(emb, "vec_id")
    (topK(cand.withColumn("cosine", cosine)), handle)
  }

  /** SemDedup-style semantic deduplication (q93, after Abbas et al.
    * 2023): cluster the embedding space with the SAME deterministic
    * IVF codebook ([[trainCentroids]]), then find near-duplicate
    * pairs WITHIN each cell only — cosine strictly above `threshold`
    * — and keep the lowest vec_id of every duplicate relation (a doc
    * is dropped iff a LOWER-id cell-mate sits above the threshold;
    * the paper's keep-farthest-from-centroid policy is one ORDER BY
    * away, the id policy is the deterministic graded form). Output is
    * one row per vector: its cell, the max cosine to any lower-id
    * cell-mate (−2 when it has none — below any real cosine), and the
    * keep verdict.
    *
    * Scale design (100 TB): this is the whole point of SemDedup —
    * pairwise cosine happens inside a cell, never across the corpus.
    * Cell count is the knob that bounds the quadratic term: it grows
    * with the corpus (the paper uses 50k clusters for LAION-scale) so
    * per-cell membership stays roughly constant, and the within-cell
    * join shuffles each vector once on its cell id. Assignment itself
    * is the codegen'd row-local [[org.apache.spark.sql.graft.NearestCentroids]]
    * expression — the corpus never moves to meet the codebook. */
  def semDedup(emb0: DataFrame, threshold: Double = NearDupCosine,
      iters: Int = KMeansIters, numCentroids: Int = NumCentroids,
      trainSample: Int = TrainSample): DataFrame = {
    val emb = emb0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (cents, cnorms, ids) = codebook(emb, iters, numCentroids,
      trainSample)
    if (ids.isEmpty)
      return emb.select(col("vec_id"), lit(0L).as("cell"),
        lit(-2.0).as("max_lower_cos"), lit(true).as("kept"))
    val wc = emb.select(col("vec_id"), col("v"), col("norm"),
      element_at(Bridge.column(org.apache.spark.sql.graft.NearestCentroids(
        Bridge.expression(col("v")), Bridge.expression(col("norm")),
        cents, cnorms, ids, 1)), 1).cast("long").as("cell"))
    val a = wc.select(col("cell"), col("vec_id").as("vec_a"),
      col("v").as("qv"), col("norm").as("qnorm"))
    val b = wc.select(col("cell"), col("vec_id").as("vec_b"),
      col("v"), col("norm"))
    val maxLower = a.join(b, "cell")
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosine)
      .groupBy(col("vec_b").as("vec_id"))
      .agg(max(col("cosine")).as("max_lower_cos"))
    wc.select(col("vec_id"), col("cell"))
      .join(maxLower, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("max_lower_cos"), lit(-2.0)).as("max_lower_cos"),
        (coalesce(col("max_lower_cos"), lit(-2.0)) <= threshold)
          .as("kept"))
  }

  /** Per-cell retention quota of [[cellBalancedSample]] (q108). At
    * the graded fixture (~31 vectors per cell) 16 visibly flattens
    * the cell-size distribution while every cell stays represented;
    * production sets quota ≈ target_corpus / cell_count. */
  val ClusterQuota = 16

  /** Cluster-balanced subsampling (q108): assign every vector to its
    * k-means cell (the SAME distributed-trained codebook as
    * q20/q93/q103 — one oracle mirror grades all four) and keep at
    * most `quota` members per cell, chosen by the library's Knuth-
    * hash order — the topic-balancing step curation pipelines run
    * after clustering (cap over-represented semantic clusters —
    * boilerplate, templates, dominant topics — instead of sampling
    * the raw distribution; the selection complement of [[semDedup]],
    * which removes near-twins within the same cells).
    * Deterministic: hash order is reproducible cross-engine and a
    * vector's keep/drop never changes when OTHER cells grow.
    *
    * Scale design (100 TB): assignment is the codegen'd row-local
    * [[org.apache.spark.sql.graft.NearestCentroids]] expression (the
    * corpus never moves to meet the codebook); the quota ranks
    * through the TopKPerGroup partial heaps — only ≤ quota rows per
    * (partition, cell) cross the one cell-keyed exchange, never the
    * corpus (the window-function fallback shuffles everything). */
  def cellBalancedSample(emb: DataFrame, quota: Int = ClusterQuota,
      iters: Int = KMeansIters): DataFrame = {
    val cells = ivfCorpusCells(emb, iters)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        (Sampling.mixed("vec_id") % 1048576).as("h"))
    val extensionsActive = emb.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val ranked =
      if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(cells, Seq("cell"),
          Seq("h" -> true, "vec_id" -> true), quota)
          .withColumnRenamed("rank", "rn")
      else cells.withColumn("rn",
        row_number().over(Window.partitionBy(col("cell"))
          .orderBy(col("h").asc, col("vec_id").asc)).cast("long"))
        .filter(col("rn") <= quota)
    ranked.select(col("vec_id"), col("cell"), col("rn"))
  }

  /** Matryoshka (MRL) two-stage retrieval knobs: coarse-rank on the
    * first [[TruncDim]] of the [[SimilarityParams.Dim]] dimensions,
    * then exact full-dim re-rank of the per-query top [[MrlPoolK]]
    * pool. */
  val TruncDim = 16
  val MrlPoolK = 40

  /** Matryoshka-style two-stage retrieval (q96, after Kusupati et
    * al. 2022): MRL-trained embeddings keep most of their signal in
    * a prefix of the dimensions, so serving ranks the corpus on the
    * TRUNCATED prefix first — [[TruncDim]]/[[SimilarityParams.Dim]]
    * of the multiply-adds and broadcast bytes — and pays full-dim
    * exact cosine only for the per-query top-[[MrlPoolK]] pool. The
    * final ranking re-orders by full-dim cosine, so stage 1 only
    * decides MEMBERSHIP of the pool, exactly like the LSH/IVF
    * candidate generators.
    *
    * Scale design (100 TB): the corpus-sized work (stage 1) touches
    * dims/Dim of each vector's bytes — column-pruned at the scan
    * when the store keeps a truncated copy — and stage 2 is
    * poolK·|Q| rows through the candidate re-join, the same bounded
    * shape as [[probeLshIndex]]. Both stages rank through the
    * TopKPerGroup partial heaps. */
  def mrlRerankTopK(emb0: DataFrame, dims: Int = TruncDim,
      poolK: Int = MrlPoolK,
      numQueries: Int = NumQueryVectors): DataFrame = {
    val full = emb0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val trunc = full.select(col("vec_id"),
        slice(col("v"), 1, dims).as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val scored = broadcast(queries(trunc, numQueries)).crossJoin(trunc)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine)
      .select(col("query_id"), col("vec_id"), col("cosine"))
    val extensionsActive = scored.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val pool =
      if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(scored, Seq("query_id"),
          Seq("cosine" -> false, "vec_id" -> true), poolK)
      else scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cosine").desc, col("vec_id").asc)).cast("long"))
        .filter(col("rank") <= poolK)
    topK(pool.select(col("query_id"), col("vec_id"))
      .join(queries(full, numQueries), "query_id")
      .join(full, "vec_id")
      .withColumn("cosine", cosine))
  }

  /** MMR constants (q131): the relevance/diversity trade-off λ of
    * Carbonell & Goldstein's formulation, the candidate pool per
    * query, and the diversified result size. */
  val MmrLambda = 0.7
  val MmrPoolK = 20
  val MmrTopK = 8

  /** Maximal-marginal-relevance diversified retrieval (q131;
    * Carbonell & Goldstein 1998) — the DIVERSIFICATION step a RAG
    * serving stack runs after any ANN pool: plain top-k hands back
    * near-duplicate passages (by construction — similar things rank
    * together), MMR greedily re-picks
    *
    *   argmax_d  λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s)
    *
    * so every next pick is relevant AND far from what's already
    * selected. Emits the selection ORDER (step 1..k) with each pick's
    * relevance and its MMR score at selection time.
    *
    * Scale design (100 TB): the corpus-sized work is pool FORMATION
    * (here the exact-cosine pool through the TopKPerGroup heaps; in
    * production any ANN rung — q88/q20/q106/q121/q124 — generates the
    * same ≤ poolK rows per query). Everything after is
    * pool-bounded: the pairwise-sim frame is |Q|·poolK² rows, each
    * greedy step joins frames of ≤ |Q|·poolK rows, and the k-step
    * loop materializes per round (the q99 bounded-lineage
    * discipline). The greedy is INHERENTLY sequential in k — k is a
    * serving constant (≤ tens), never a corpus axis. */
  def mmrRerankTopK(emb: DataFrame, lambda: Double = MmrLambda,
      poolK: Int = MmrPoolK, k: Int = MmrTopK,
      numQueries: Int = NumQueryVectors): DataFrame = {
    val lam = lit(lambda); val om = lit(1 - lambda)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val scored = broadcast(queries(emb, numQueries)).crossJoin(emb)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rel",
        cosineOf(col("qv"), col("qnorm"), col("v"), col("norm")))
      .select(col("query_id"), col("vec_id"), col("v"), col("norm"),
        col("rel"))
    val extensionsActive = emb.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val pool = (if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(scored, Seq("query_id"),
          Seq("rel" -> false, "vec_id" -> true), poolK)
      else scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("rel").desc, col("vec_id").asc)).cast("long"))
        .filter(col("rank") <= poolK))
      .persist(lvl)
    val pairs = pool
      .select(col("query_id"), col("vec_id").as("a"), col("v").as("va"),
        col("norm").as("na"))
      .join(pool.select(col("query_id"), col("vec_id").as("b"),
        col("v").as("vb"), col("norm").as("nb")), Seq("query_id"))
      .filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        cosineOf(col("va"), col("na"), col("vb"), col("nb")).as("sim"))
      .persist(lvl)
    // every greedy step references the running selection TWICE (the
    // not-yet-picked anti-join and the max-sim aggregate), so a plain
    // union chain DOUBLES the logical plan per step — localCheckpoint
    // truncates the lineage each round (the pageRank/graph-walk
    // discipline); the checkpointed frame is |Q|·step rows
    var selected = pool.filter(col("rank") === 1)
      .select(col("query_id"), col("vec_id"), lit(1L).as("step"),
        col("rel"), (lam * col("rel") - om * lit(0.0)).as("mmr"))
      .localCheckpoint()
    for (s <- 2 to k) {
      val selIds = selected
        .select(col("query_id").as("sq"), col("vec_id").as("sel_a"))
      val ms = pairs
        .join(selIds, pairs("query_id") === col("sq") &&
          pairs("a") === col("sel_a"))
        .groupBy(pairs("query_id").as("mq"), col("b"))
        .agg(max(col("sim")).as("ms"))
      val pick = pool
        .join(selected.select(col("query_id"), col("vec_id")),
          Seq("query_id", "vec_id"), "left_anti")
        .join(ms, col("query_id") === col("mq") &&
          col("vec_id") === col("b"))
        .withColumn("mmr", lam * col("rel") - om * col("ms"))
        .withColumn("rn2", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("mmr").desc, col("vec_id").asc)))
        .filter(col("rn2") === 1)
        .select(col("query_id"), col("vec_id"), lit(s.toLong).as("step"),
          col("rel"), col("mmr"))
      selected = selected.union(pick).localCheckpoint()
    }
    pairs.unpersist(blocking = false)
    pool.unpersist(blocking = false)
    selected
  }

  /** Symmetric int8 scalar quantization of the embedding corpus
    * (q73): per vector, scale = max|v|/127 and qᵢ = round(vᵢ/scale) ∈
    * [−127, 127] — the storage/bandwidth compression step every
    * embedding store applies before ANN serving (4× smaller than
    * float32; dot products on int8 with one per-pair rescale).
    * Emitted LONG-form (vec_id, i, q) so the oracle can recompute
    * each quantized value from the same float→double arithmetic.
    * Row-local end to end: per-vector max|v| is a fold inside the
    * row, the explode carries no shuffle, nothing aggregates. An
    * all-zero vector quantizes to zeros (scale guard). */
  def quantizeInt8(raw: DataFrame): DataFrame = {
    val maxabs = aggregate(
      transform(col("embedding"), x => abs(x.cast("double"))),
      lit(0.0), (a, x) => greatest(a, x))
    raw
      .select(col("vec_id"), col("embedding"),
        maxabs.as("maxabs"))
      .select(col("vec_id"), col("maxabs"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        when(col("maxabs") === 0.0, lit(0))
          .otherwise(round(col("x").cast("double") * 127 / col("maxabs"))
            .cast("int")).as("q"))
  }

  /** LSH candidate (query_id, vec_id) pairs: corpus vectors sharing
    * at least one band bucket with the query. Exposed so the spec and
    * graft.ScaleProbe can measure candidates-per-query directly —
    * the number that must stay ≪ |corpus| for the scale path to be
    * worth its name. Aliased self-sides (see [[embeddingNearDups]]).
    *
    * `multiProbe = n` additionally probes, per query band, every key
    * within Hamming distance ≤ n of the query's key (n = 1 ⇒
    * BitsPerBand extra buckets per band) — the standard recall knob
    * for sign-LSH that widens the search on the QUERY side only: the
    * corpus keeps exactly one key per band, so corpus-side cost and
    * the index layout are untouched. Probe-1 on this banding lifts
    * expected recall ≈ 5× at ≈ 9× the candidate volume (measured in
    * SimilaritySpec); the graded q10 runs probe-0. */
  def lshCandidates(emb: DataFrame,
      numQueries: Int = NumQueryVectors,
      multiProbe: Int = 0): DataFrame = {
    val baseKeys = queries(emb, numQueries)
      .select(col("query_id"),
        posexplode(bandKeysArray(col("qv"))).as(Seq("band", "key")))
    val probed =
      if (multiProbe <= 0) baseKeys
      else {
        // flip sets of ≤ multiProbe bits: for probe-1 that is the key
        // itself plus BitsPerBand single-bit flips
        val flips: Seq[Int] = (0 until (1 << BitsPerBand))
          .filter(m => Integer.bitCount(m) <= multiProbe)
        baseKeys.select(col("query_id"), col("band"),
          explode(array(flips.map(m =>
            col("key").bitwiseXOR(lit(m))): _*)).as("key"))
      }
    val qb = probed.alias("q")
    val cb = emb
      .select(col("vec_id"),
        posexplode(bandKeysArray(col("v"))).as(Seq("band", "key")))
      .alias("c")
    // candidate IDs only through the join+distinct, vectors re-joined
    // after (avoids shuffling the arrays through the distinct)
    qb.join(cb,
        col("q.band") === col("c.band") && col("q.key") === col("c.key") &&
          col("c.vec_id") =!= col("q.query_id"))
      .select(col("q.query_id"), col("c.vec_id"))
      .distinct()
  }

  /** Approximate cosine top-k: candidates = corpus vectors sharing at
    * least one LSH band bucket with the query; exact cosine + rank on
    * the candidate set only. Cost: NumPlanes row-local dots per
    * corpus vector (amortized over ALL queries) + one band-key
    * shuffle + |Q|·(2.3% of corpus) exact cosines — vs brute force's
    * |Q| dots per corpus vector and |Q|·|corpus|-row rank. Crossover
    * is at |Q| ≈ NumPlanes queries; measured in graft.ScaleProbe. */
  def lshTopK(emb0: DataFrame,
      numQueries: Int = NumQueryVectors,
      multiProbe: Int = 0): DataFrame =
    lshTopKWithHandle(emb0, numQueries, multiProbe)._1

  /** [[lshTopK]] plus the [[graft.util.CacheHandle]] releasing the
    * persisted embedding corpus. */
  def lshTopKWithHandle(emb0: DataFrame,
      numQueries: Int = NumQueryVectors,
      multiProbe: Int = 0): (DataFrame, graft.util.CacheHandle) = {
    val emb = emb0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshCandidates(emb, numQueries, multiProbe)
      .join(queries(emb, numQueries)
        .select(col("query_id"), col("qv"), col("qnorm")), "query_id")
      .join(emb, "vec_id")

    (topK(cand.withColumn("cosine", cosine)), graft.util.CacheHandle(emb))
  }

  /** Hybrid sparse+dense retrieval fused by reciprocal rank fusion
    * (q84) — the two-tower RAG retrieval shape: BM25 ranks the corpus
    * lexically ([[TextAnalysis.bm25TopDocs]], pool of `poolK`), a
    * dense ranking scores cosine against one fixed query embedding
    * (vec_id = `queryVecId`, joined to docs by the fixture's
    * doc_id = vec_id alignment), and RRF combines them:
    * score(d) = Σ_retriever 1/(rrfK + rank_retriever(d)), a doc
    * absent from a pool contributing 0 — rank-only fusion, so the
    * incomparable BM25 and cosine score scales never need
    * calibration. Missing-pool ranks surface as 0 in the output.
    *
    * Scale design: each retriever reduces the corpus to ≤ `poolK`
    * rows BEFORE fusion (BM25 through its row-local term filter +
    * TopKPerGroup heaps; the dense side through one broadcast-query
    * corpus scan and the same heaps), so the full-outer fusion join
    * touches ≤ 2·poolK rows no matter the corpus size. The dense pool
    * here is the exact brute scan — one dot per corpus row for the
    * single query; at corpus sizes where that scan dominates, swap
    * the candidate set for [[lshTopK]]'s banded probe (identical
    * downstream fusion). */
  def hybridRrf(docs: DataFrame, emb: DataFrame,
      queryVecId: Long = RrfQueryVecId, poolK: Int = RrfPoolK,
      rrfK: Int = RrfK, topK: Int = RrfTopK): DataFrame = {
    val qv = emb.filter(col("vec_id") === queryVecId)
      .select(col("v").as("qv"), col("norm").as("qnorm"))
    val denseScored = broadcast(qv).crossJoin(emb)
      .filter(col("vec_id") =!= queryVecId)
      .withColumn("cosine", cosine)
      .select(col("vec_id"), col("cosine"))
    fuseRrf(docs, denseScored, poolK, rrfK, topK)
  }

  /** [[hybridRrf]] with the dense pool sourced from a persisted
    * [[writeLshIndex]] table instead of the brute corpus scan — the
    * serving-scale form (q87): the query's band keys probe the
    * pre-bucketed index for candidates, exact cosine runs on the
    * candidate set only, and the SAME fusion consumes the pool. The
    * dense ranking is over LSH candidates (≈ 2.5% of the corpus), so
    * rank_dense is the rank WITHIN the probed pool — at 100 TB this
    * is the only affordable definition, and it is what every
    * ANN-backed retriever actually serves. Per-query cost: |bands|
    * probe rows against the bucket-aligned index + one exact cosine
    * per candidate; the corpus is never scanned, never re-banded. */
  def hybridRrfIndexed(docs: DataFrame, emb: DataFrame,
      indexTable: String,
      queryVecId: Long = RrfQueryVecId, poolK: Int = RrfPoolK,
      rrfK: Int = RrfK, topK: Int = RrfTopK): DataFrame = {
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
    val qb = q.select(col("query_id"),
      posexplode(bandKeysArray(col("qv"))).as(Seq("band", "key")))
    val idx = emb.sparkSession.table(indexTable)
    // candidate IDs only through the distinct (house rule); the
    // query vector re-joins after, and only candidate vectors are
    // re-read from the corpus
    val candIds = qb.join(idx, Seq("band", "key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val denseScored = candIds
      .join(q.select(col("query_id"), col("qv"), col("qnorm")),
        "query_id")
      .join(emb, "vec_id")
      .withColumn("cosine", cosine)
      .select(col("vec_id"), col("cosine"))
    fuseRrf(docs, denseScored, poolK, rrfK, topK)
  }

  /** Shared tail of the hybrid retrievers: rank the dense scored
    * frame to a ≤ poolK pool, fuse with the BM25 pool by RRF, rank
    * the fused frame to topK. Both pools are bounded BEFORE the
    * full-outer fusion join, so fusion cost is constant in corpus
    * size. */
  private def fuseRrf(docs: DataFrame, denseScored: DataFrame,
      poolK: Int, rrfK: Int, topK: Int): DataFrame = {
    val sparse = TextAnalysis.bm25TopDocs(docs, topK = poolK)
      .select(col("doc_id"), col("rank").as("rank_sparse"))
    val extensionsActive = docs.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val dense =
      (if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(
          denseScored.withColumn("g", lit(0)), Seq("g"),
          Seq("cosine" -> false, "vec_id" -> true), poolK).drop("g")
      else denseScored
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cosine").desc, col("vec_id").asc))
          .cast("long"))
        .filter(col("rank") <= poolK))
        .select(col("vec_id").as("doc_id"), col("rank").as("rank_dense"))
    // fuse on rank only; term order (sparse + dense) mirrors the
    // oracle so the double sum is bit-identical
    val fused = sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) /
          (lit(rrfK.toDouble) + col("rank_sparse").cast("double")),
          lit(0.0)) +
        coalesce(lit(1.0) /
          (lit(rrfK.toDouble) + col("rank_dense").cast("double")),
          lit(0.0)))
      .withColumn("rank_sparse", coalesce(col("rank_sparse"), lit(0L)))
      .withColumn("rank_dense", coalesce(col("rank_dense"), lit(0L)))
    val ranked =
      if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(
          fused.withColumn("g", lit(0)), Seq("g"),
          Seq("rrf_score" -> false, "doc_id" -> true), topK).drop("g")
      else fused
        .withColumn("rank", row_number().over(
          Window.orderBy(col("rrf_score").desc, col("doc_id").asc))
          .cast("long"))
        .filter(col("rank") <= topK)
    ranked.select(col("doc_id"), col("rank_sparse"), col("rank_dense"),
      col("rrf_score"), col("rank"))
  }

  /** Persisted LSH index — the serving-side complement of
    * [[lshTopK]], which re-bands the corpus on every query batch.
    * One corpus pass computes every (vec_id, band, key) row and
    * writes them as a BUCKETED, sorted table on (band, key): probe
    * joins then read the index with zero exchanges (the bucketed
    * layout already satisfies the join's required distribution), so
    * per-batch cost moves the |Q|·bands probe rows and NEVER the
    * corpus — and the NumPlanes·|corpus| banding dots are paid once
    * at build, not per batch. New corpus batches append their banded
    * rows; `buckets` sizes the parallelism of every future probe
    * (at 100 TB: thousands, matched to the cluster). */
  def writeLshIndex(emb: DataFrame, table: String, path: String,
      buckets: Int = 32): Unit =
    bandedRows(emb)
      .write.mode("overwrite")
      .bucketBy(buckets, "band", "key").sortBy("band", "key")
      .option("path", path).saveAsTable(table)

  /** The index row shape: one (vec_id, band, key) row per band per
    * vector — what [[writeLshIndex]] persists and what
    * [[graft.streaming.StreamingLshIndex]] appends per micro-batch. */
  def bandedRows(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      posexplode(bandKeysArray(col("v"))).as(Seq("band", "key")))

  /** Top-k by probing a [[writeLshIndex]] table: row-identical to
    * [[lshTopK]] on the same corpus (same planes, same banding —
    * LshIndexSpec pins the equality), but the corpus side of the
    * candidate join comes pre-bucketed from the index, so only the
    * banded QUERY rows move. Candidates stay id-only through the
    * distinct (the house rule — vectors re-join after), and the
    * exact-cosine verify re-reads just the candidate vectors. */
  def probeLshIndex(emb: DataFrame, table: String,
      numQueries: Int = NumQueryVectors): DataFrame = {
    val idx = emb.sparkSession.table(table)
    val q = queries(emb, numQueries)
    val qb = q.select(col("query_id"),
      posexplode(bandKeysArray(col("qv"))).as(Seq("band", "key")))
    val candIds = qb.join(idx, Seq("band", "key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val cand = candIds
      .join(q.select(col("query_id"), col("qv"), col("qnorm")),
        "query_id")
      .join(emb, "vec_id")
    topK(cand.withColumn("cosine", cosine))
  }

  /** Product-quantization knobs (q106): [[SimilarityParams.Dim]] = 64
    * dims split into [[PqSubspaces]] = 4 subspaces of [[PqSubDim]] =
    * 16 dims, each with a [[PqK]] = 16-centroid L2 codebook — a
    * corpus vector compresses to 4 small codes (4×4 useful bits vs
    * 256 float32 bytes, a 64× storage/bandwidth cut), the rung below
    * int8 (q73, 4×) and MRL truncation (q96, 4×) on the ANN
    * compression ladder. [[PqPoolK]] sizes the ADC candidate pool
    * that gets the exact full-vector re-rank. */
  val PqSubspaces = 4
  val PqSubDim: Int = Dim / PqSubspaces
  val PqK = 16
  val PqPoolK = 40

  /** IVF-PQ-style compressed search (q106, after Jégou et al. 2011):
    * per-subspace codebooks from the distributed L2 trainer
    * ([[trainCentroidsL2Distributed]], same deterministic minibatch),
    * the corpus encoded to [[PqSubspaces]] codes by the row-local
    * codegen'd assignment expression, queries scored against the
    * COMPRESSED corpus by asymmetric distance computation — each
    * query precomputes one [[PqK]]-entry dot table per subspace, a
    * corpus row's approximate cosine is then [[PqSubspaces]] table
    * lookups — and the per-query top-[[PqPoolK]] ADC pool re-ranked
    * by exact full-vector cosine (membership from ADC, final order
    * exact — the LSH/IVF candidate-generator contract).
    *
    * Scale design (100 TB): the corpus-sized frame through the scorer
    * carries 4 int codes + 1 precomputed norm per vector, not 64
    * doubles — the memory-bandwidth term that dominates brute-force
    * scanning drops 64×, and the per-row work is 4 array lookups
    * instead of 64 multiply-adds. Training, encoding, and scoring are
    * all row-local against broadcast-constant codebooks (zero corpus
    * shuffle); the exact re-rank touches poolK·|Q| rows. At
    * production scale the encoded frame is what you PERSIST — the
    * full vectors stay in cold storage and are read only by the
    * re-rank's bounded candidate join. */
  def pqTopK(emb0: DataFrame,
      numQueries: Int = NumQueryVectors): DataFrame = {
    val emb = emb0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def sub(c: Column, m: Int): Column =
      slice(c, m * PqSubDim + 1, PqSubDim)
    val books: IndexedSeq[Array[Array[Double]]] =
      (0 until PqSubspaces).map { m =>
        trainCentroidsL2Distributed(
          emb.filter(col("vec_id") < TrainSample)
            .select(col("vec_id"), sub(col("v"), m).as("v")),
          KMeansIters, PqK, PqSubDim)
      }
    if (books.exists(_.isEmpty))
      return topK(queries(emb, numQueries)
        .filter(lit(false))
        .select(col("query_id"), col("query_id").as("vec_id"))
        .withColumn("cosine", lit(0.0)))
    // squared centroid norms per subspace: the additive term of the
    // approximate corpus norm ‖v‖ ≈ sqrt(Σ_m ‖c_m[code_m]‖²)
    val cn2: IndexedSeq[Seq[Double]] =
      books.map(_.map(c => c.foldLeft(0.0)((a, x) => a + x * x)).toSeq)
    def code(m: Int): Column = Bridge.column(
      org.apache.spark.sql.graft.NearestCentroidL2(
        Bridge.expression(sub(col("v"), m)), books(m).flatten,
        PqSubDim))
    // the encoded corpus: 4 codes + the approximate norm — the frame
    // a deployment persists in place of the raw vectors
    val coded = emb.select(
      col("vec_id") +:
        (0 until PqSubspaces).map(m => code(m).as(s"code$m")): _*)
      .withColumn("anorm", sqrt((0 until PqSubspaces).map(m =>
        element_at(typedLit(cn2(m)), col(s"code$m") + 1)).reduce(_ + _)))
    // per-query ADC tables: dot of the query sub-vector against every
    // centroid of that subspace — PqK doubles per subspace, row-local
    // on the |Q|-row query frame
    val q = queries(emb, numQueries)
    val qt = q.select(
      Seq(col("query_id"), col("qnorm")) ++
        (0 until PqSubspaces).map { m =>
          transform(typedLit(books(m).map(_.toSeq).toSeq), c =>
            dot(sub(col("qv"), m), c)).as(s"t$m")
        }: _*)
    val scored = broadcast(qt).crossJoin(coded)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adot", (0 until PqSubspaces).map(m =>
        element_at(col(s"t$m"), col(s"code$m") + 1)).reduce(_ + _))
      .select(col("query_id"), col("vec_id"),
        (col("adot") / (col("qnorm") * col("anorm"))).as("acos"))
    val extensionsActive = scored.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val pool =
      if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(scored, Seq("query_id"),
          Seq("acos" -> false, "vec_id" -> true), PqPoolK)
      else scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("acos").desc, col("vec_id").asc)).cast("long"))
        .filter(col("rank") <= PqPoolK)
    topK(pool.select(col("query_id"), col("vec_id"))
      .join(q.select(col("query_id"), col("qv"), col("qnorm")), "query_id")
      .join(emb, "vec_id")
      .withColumn("cosine", cosine))
  }

  /** Offline retrieval-evaluation metrics (q85): recall and
    * reciprocal rank of a `run` ranking against an `ideal` ranking —
    * the eval loop every ANN index / retriever change goes through
    * before it ships. Inputs are (query_id, neighbor_id, rank)
    * rankings (the shape every retrieval operator here emits); output
    * is one row per ideal query: hits = |run ∩ ideal|, recall =
    * hits / |ideal|, rr = 1/rank of the FIRST run position whose
    * neighbor is ideal-relevant (0.0 when none is).
    *
    * Scale design: both inputs are already ≤ k rows per query (the
    * retrieval operators bound them before they ever land here), so
    * the intersection join and both aggregations touch O(|Q|·k) rows
    * total — evaluation cost is independent of corpus size. All
    * metrics are single divisions of exact integers (no float
    * accumulation), so results are order-independent and bit-stable.
    * Aggregate MRR/mean-recall are one tiny further aggregation the
    * caller can apply; the graded form keeps per-query rows (which is
    * also what error analysis wants). */
  /** nDCG of a run ranking against an ideal ranking (q86), binary
    * relevance: gain 1/log₂(rank+1) for each run position whose
    * neighbor the ideal set contains; idcg re-ranks the ideal set
    * itself. Complements [[retrievalMetrics]] (recall sees WHETHER a
    * relevant item surfaced, nDCG sees WHERE). Same bounded shape —
    * O(|Q|·k) rows end to end regardless of corpus size. The gain is
    * written as 1/(ln(r+1)/ln 2) in BOTH engines so the float
    * expression trees match; the per-query sums fold ≤ k terms. */
  def ndcgMetrics(run: DataFrame, ideal: DataFrame): DataFrame = {
    def gain(rankCol: Column): Column =
      lit(1.0) / (log(rankCol.cast("double") + lit(1.0)) / log(lit(2.0)))
    val r = run.select(col("query_id"), col("neighbor_id"),
      col("rank").as("run_rank"))
    val i = ideal.select(col("query_id"), col("neighbor_id"),
      col("rank").as("ideal_rank"))
    val dcg = r.join(i, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id"))
      .agg(sum(gain(col("run_rank"))).as("dcg"))
    i.groupBy(col("query_id"))
      .agg(sum(gain(col("ideal_rank"))).as("idcg"))
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg"), lit(0.0)).as("dcg"),
        col("idcg"),
        (coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
  }

  def retrievalMetrics(run: DataFrame, ideal: DataFrame): DataFrame = {
    val r = run.select(col("query_id"), col("neighbor_id"),
      col("rank").as("run_rank"))
    val i = ideal.select(col("query_id"), col("neighbor_id"),
      col("rank").as("ideal_rank"))
    val hits = r.join(i, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("run_rank")).as("first_hit"))
    i.groupBy(col("query_id")).agg(count(lit(1)).as("n_ideal"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_ideal").cast("double")).as("recall"),
        coalesce(lit(1.0) / col("first_hit").cast("double"), lit(0.0))
          .as("rr"))
  }
}
