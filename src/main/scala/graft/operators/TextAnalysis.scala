package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline over the
  * `documents` fixture table: per-doc statistics and quality scoring,
  * stopword-profile language identification, and SimHash
  * near-duplicate fingerprinting with banded Hamming candidate
  * generation.
  *
  * Scale design: stats, lang-id and the simhash fingerprint are pure
  * row-local array expressions (no shuffle, whole-stage codegen); the
  * simhash pair search shuffles once on the 8-bit band key —
  * pigeonhole over 4 bands guarantees capture of all pairs with
  * Hamming distance ≤ 3 and probabilistically captures up to
  * [[TextAnalysis.HammingMax]].
  */
object TextAnalysis {

  /** English-ish stopword profile used by the quality score. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "that", "it",
    "for", "on", "with", "as", "at", "by", "from", "or", "be", "this")

  /** Stopword profiles for language scoring (deterministic order). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that",
      "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit",
      "ein", "zu", "den"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "de", "en",
      "por", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "il",
      "au", "sur"))

  private def tokens: Column = split(col("text"), " ")

  private def arrLit(xs: Seq[String]): Column = array(xs.map(lit): _*)

  private def sumInts(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + x)

  /** Row-local quality score in [0, 1] as a single Column over the
    * raw text — the ONE definition shared by the graded [[textStats]]
    * and the preprocessing funnel ([[Pipeline.preprocessingFunnel]]),
    * so the funnel can evaluate the quality gate inside its own
    * projection (no re-scan, no join) without re-deriving the
    * formula. The arithmetic is the exact sequence the oracle
    * mirrors: least(n/50, 1) · distinct_ratio · (1 − 0.5·stop_ratio). */
  def qualityScoreCol(text: Column): Column = {
    val w = split(text, " ")
    val nTokens = size(w).cast("long")
    val distinctRatio =
      size(array_distinct(w)).cast("long").cast("double") / nTokens
    val stopRatio =
      size(filter(w, t => array_contains(arrLit(stopwords), t)))
        .cast("long").cast("double") / nTokens
    least(nTokens / 50.0, lit(1.0)) * distinctRatio *
      (lit(1.0) - lit(0.5) * stopRatio)
  }

  /** Per-document statistics, BPE-ish token estimate, rolling
    * fingerprint and a deterministic quality score in [0, 1]. */
  def textStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"), tokens.as("w"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct_tokens"),
        sumInts(transform(col("w"), t => length(t).cast("long")))
          .as("sum_token_chars"),
        size(filter(col("w"), t => array_contains(arrLit(stopwords), t)))
          .cast("long").as("n_stopwords"),
        length(col("text")).cast("long").as("n_chars"),
        ceil(length(col("text")) / 4.0).cast("long").as("est_bpe_tokens"),
        Dedup.digest60(col("text")).as("fingerprint"),
        qualityScoreCol(col("text")).as("quality_score"))
      .select(
        col("*"),
        (col("sum_token_chars").cast("double") / col("n_tokens"))
          .as("avg_token_len"),
        (col("n_stopwords").cast("double") / col("n_tokens"))
          .as("stopword_ratio"))

  /** q231 training constants: iterations, learning rate, and the
    * 2^20 fixed-point quantizer that makes the gradient sums exact
    * LONGs (order-free, engine-identical). */
  val LogRegIters = 8
  val LogRegLr = 4.0
  val LogRegQuant = 1048576.0

  /** MODEL-BASED quality filter TRAINED IN-ENGINE (q231) — logistic
    * regression by batch gradient descent, the GPT-3/CCNet-style
    * "distill the heuristic into a smooth classifier" stage (the
    * model family behind fastText quality filters): weak labels
    * come from an integer-exact prose rule (enough tokens AND a
    * natural stopword rate — both pure LONG comparisons), features
    * are the q6 stat ratios, and [[LogRegIters]] full-batch GD steps
    * fit w; the corpus is then scored by its margin and kept where
    * the model says prose.
    *
    * FP-determinism design (the house discipline, hardened for an
    * ITERATED corpus aggregate): each doc's per-feature gradient
    * contribution is QUANTIZED to a 2^20 fixed-point LONG
    * (floor(g·2^20 + 0.5)), so the per-iteration reduction is an
    * exact integer sum — reassociation-free under any partitioning,
    * and bit-identical in DuckDB (the only transcendental, exp, sits
    * BEFORE the quantizer where a 1-ulp engine difference flips a
    * floor with probability ~1e-10). The weight recurrence and the
    * final margin are single fixed-order double chains off those
    * exact longs, so the oracle (8 unrolled weight CTEs) reproduces
    * every weight and every margin bit-for-bit.
    *
    * Scale design (100 TB): one cached feature pass, then
    * [[LogRegIters]] map-side-combined 5-long aggregations (the
    * gradient is a bounded driver collect: FIVE longs per iteration,
    * documented); scoring is one row-local projection. No shuffle
    * ever carries more than the 5-long gradient. */
  def logRegQualityFilter(docs: DataFrame): DataFrame =
    logRegTrainedWithHandle(docs) match {
      case (_, out, h) =>
        // training already burned its 8 passes against the cache;
        // the final scoring pass recomputes row-locally after the
        // release (safe per CacheHandle: lineage intact)
        h.release()
        out
    }

  /** The q231/q232 feature frame: weak label + the four stat-ratio
    * features, plus `source` for q232's reference-set filter. Every
    * column is either an exact LONG or a single fixed-order double
    * chain off exact longs. */
  private def logRegFeatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"), tokens.as("w"))
      .select(col("doc_id"), col("source"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long")
          .as("n_distinct_tokens"),
        sumInts(transform(col("w"), t => length(t).cast("long")))
          .as("sum_token_chars"),
        size(filter(col("w"), t => array_contains(arrLit(stopwords), t)))
          .cast("long").as("n_stopwords"))
      .select(col("doc_id"), col("source"),
        // weak label: integer-exact prose rule
        when(col("n_tokens") >= 16 &&
          col("n_stopwords") * 8 >= col("n_tokens"), 1L)
          .otherwise(0L).as("y"),
        least(col("n_tokens").cast("double") / 256.0, lit(1.0))
          .as("f1"),
        (col("sum_token_chars").cast("double") / col("n_tokens") / 8.0)
          .as("f2"),
        (col("n_stopwords").cast("double") / col("n_tokens")).as("f3"),
        (col("n_distinct_tokens").cast("double") / col("n_tokens"))
          .as("f4"))

  private def logRegMargin(w: Array[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("f1") + lit(w(2)) * col("f2") +
      lit(w(3)) * col("f3") + lit(w(4)) * col("f4")

  /** p − y at the given weights — the per-doc residual whose
    * feature products are the gradient. */
  private def logRegResidual(w: Array[Double]): Column =
    lit(1.0) / (lit(1.0) + exp(-logRegMargin(w))) - col("y")

  /** floor(g·2^20 + 0.5) — the exact-long gradient quantizer. */
  private def quantGrad(d: Column, x: Column): Column =
    floor(d * x * lit(LogRegQuant) + lit(0.5)).cast("long")

  /** The [[LogRegIters]]-step GD loop over a (cached) feature frame
    * of `n` rows. Each iteration is ONE map-side-combined 5-long
    * aggregation (a documented bounded collect). */
  private def logRegTrain(f: DataFrame, n: Long): Array[Double] = {
    require(n > 0, "logRegTrain: empty corpus — the per-step " +
      "division by n would silently yield NaN weights")
    var w = Array.fill(5)(0.0)
    for (_ <- 1 to LogRegIters) {
      val d = logRegResidual(w)
      val g = f.agg(sum(quantGrad(d, lit(1.0))),
        sum(quantGrad(d, col("f1"))), sum(quantGrad(d, col("f2"))),
        sum(quantGrad(d, col("f3"))), sum(quantGrad(d, col("f4"))))
        .head()
      w = Array.tabulate(5)(j =>
        w(j) - LogRegLr * ((g.getLong(j).toDouble / LogRegQuant) / n))
    }
    w
  }

  /** [[logRegQualityFilter]] exposing the trained weights (bias,
    * then the four feature weights) and the
    * [[graft.util.CacheHandle]] of the feature cache. */
  def logRegTrainedWithHandle(docs: DataFrame)
      : (Array[Double], DataFrame, graft.util.CacheHandle) = {
    val f = logRegFeatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = logRegTrain(f, f.count())
    val m = logRegMargin(w)
    (w, f.select(col("doc_id"), col("y"), m.as("margin"),
      (m >= 0.0).as("keep")), graft.util.CacheHandle(f))
  }

  /** Reference source of [[gradientInfluenceTopK]]'s target set. */
  val InfluenceRefSource = "src0"

  /** Rows returned by [[gradientInfluenceTopK]]. */
  val InfluenceTopK = 100

  /** GRADIENT-INFLUENCE data selection (q232) — the LESS/DsDm-style
    * stage AFTER q231's model exists: rank every training document
    * by the alignment of ITS loss gradient with the mean gradient of
    * a curated REFERENCE set (here the [[InfluenceRefSource]] slice),
    * and keep the top-[[InfluenceTopK]] most-aligned. For logistic
    * loss the per-doc gradient is (p−y)·x, so the alignment score
    * factors as (p−y)·⟨ĝ, x⟩ — one margin-shaped chain against the
    * reference gradient ĝ, then one multiply: entirely row-local
    * after ĝ is known.
    *
    * Determinism: ĝ is computed with the SAME 2^20 exact-long
    * quantizer as training (order-free sums, engine-identical), so
    * scores are fixed double chains off exact inputs; the top-k is
    * the [[globalTopK]] heap (TopKPerGroup — no single-partition
    * sort) with (influence DESC, doc_id ASC) tie-break.
    *
    * Scale design (100 TB): training as q231; ĝ is ONE more 5-long
    * aggregation over the reference slice; scoring is row-local and
    * the k-row result bounds every exchange. */
  def gradientInfluenceTopK(docs: DataFrame,
      k: Int = InfluenceTopK): DataFrame = {
    val f = logRegFeatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = f.count()
    val w = logRegTrain(f, n)
    val d = logRegResidual(w)
    // reference gradient: exact-long mean over the curated slice
    // (bounded collect: six values)
    val g = f.filter(col("source") === InfluenceRefSource)
      .agg(count(lit(1)), sum(quantGrad(d, lit(1.0))),
        sum(quantGrad(d, col("f1"))), sum(quantGrad(d, col("f2"))),
        sum(quantGrad(d, col("f3"))), sum(quantGrad(d, col("f4"))))
      .head()
    val m = g.getLong(0)
    require(m > 0, s"reference source $InfluenceRefSource is empty")
    val h = Array.tabulate(5)(j =>
      (g.getLong(j + 1).toDouble / LogRegQuant) / m)
    val score = d * (lit(h(0)) + lit(h(1)) * col("f1") +
      lit(h(2)) * col("f2") + lit(h(3)) * col("f3") +
      lit(h(4)) * col("f4"))
    val out = globalTopK(
      f.select(col("doc_id"), score.as("influence")),
      Seq("influence" -> false, "doc_id" -> true), k)
      .select(col("doc_id"), col("influence"), col("rank"))
    f.unpersist()
    out
  }

  /** Row-local exact stopword hit count over the raw text — the
    * LONG numerator behind textStats' ratio, reused as the q208 UCB
    * reward (exact integers so per-source means are one fixed-order
    * division, never a shuffle-ordered double sum). */
  def stopwordHitsCol(text: Column): Column = {
    val w = split(text, " ")
    size(filter(w, t => array_contains(arrLit(stopwords), t)))
      .cast("long")
  }

  /** Row-local per-profile language score (stopword match ratio) —
    * shared by [[langId]] and [[langGuessCol]]. */
  def langScoreCol(text: Column, words: Seq[String]): Column = {
    val w = split(text, " ")
    size(filter(w, t => array_contains(arrLit(words), t)))
      .cast("double") / size(w)
  }

  /** Row-local language guess as a single Column over the raw text:
    * first profile (in [[langProfiles]] order) whose score ≥ every
    * later profile's — the same precedence CASE the graded [[langId]]
    * builds over its score columns. Shared with the funnel so the
    * language gate needs no separate scan/join. */
  def langGuessCol(text: Column): Column = {
    val codes = langProfiles.map(_._1)
    val scores: Map[String, Column] = langProfiles.map { case (c, ws) =>
      c -> langScoreCol(text, ws)
    }.toMap
    codes.init.zipWithIndex.foldRight(lit(codes.last): Column) {
      case ((code, i), elseCol) =>
        val later = codes.drop(i + 1)
        val isMax = later.map(c => scores(code) >= scores(c)).reduce(_ && _)
        when(isMax, code).otherwise(elseCol)
    }
  }

  /** Per-paragraph language identification + CODE-SWITCHING verdict
    * (q318) — the document-level q7 guess hides exactly the
    * failure mode multilingual curation cares about: a document
    * whose paragraphs alternate languages (forum threads, parallel
    * corpora leaks, boilerplate-translated pages) averages into one
    * confident wrong label. Per document the fixture synthesizes
    * 2..4 paragraphs; each paragraph carries one profile's stopword
    * run plus a non-profile token, docs with doc_id ≡ 0 (mod 5)
    * stay MONOLINGUAL (every paragraph the same language), all
    * others rotate languages per paragraph. The operator scores
    * every paragraph with the UNCHANGED q7 kernels
    * ([[langGuessCol]]) and rolls up per document: paragraph count,
    * distinct-language count, the MAJORITY language (count DESC,
    * profile order ASC on ties — the q7 precedence applied to the
    * rollup), and the is_mixed verdict. The oracle re-derives every
    * column from the fixture arithmetic (profiles are pairwise
    * token-disjoint, so paragraph j's guess is provably its planted
    * language — the q315 census discipline), while q7's own oracle
    * keeps grading the scoring kernel itself.
    *
    * Scale design (100 TB): paragraph explode is row-local; the
    * rollup is two map-side-combined aggregations keyed (doc, lang)
    * then doc — per-doc paragraph counts are bounded, nothing
    * corpus-wide shuffles beyond the doc key. */
  def codeSwitchStats(docs: DataFrame): DataFrame = {
    val profArr = array(langProfiles.map(p => lit(p._2.mkString(" "))): _*)
    val codesArr = array(langProfiles.map(p => lit(p._1)): _*)
    val nParas = (col("doc_id") % 3 + 2).cast("int")
    val mono = col("doc_id") % 5 === 0
    val paras = transform(sequence(lit(0), nParas - 1), j => {
      val langIdx =
        (col("doc_id") + when(mono, lit(0L))
          .otherwise(j.cast("long"))) % 4
      concat(element_at(profArr, (langIdx + 1).cast("int")),
        lit(" x"), col("doc_id").cast("string"))
    })
    val perPara = docs
      .select(col("doc_id"),
        posexplode(paras).as(Seq("para_idx", "ptext")))
      .select(col("doc_id"), col("para_idx"),
        langGuessCol(col("ptext")).as("para_lang"))
    perPara
      .groupBy(col("doc_id"), col("para_lang"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).cast("long").as("n_paras"),
        count(lit(1)).cast("long").as("n_langs"),
        // majority: count DESC, then profile ORDER asc — encoded as
        // max(struct(c, -profileIdx, lang))
        max(struct(col("c"),
          -array_position(codesArr, col("para_lang")),
          col("para_lang"))).getField("para_lang")
          .as("majority_lang"))
      .select(col("doc_id"), col("n_paras"), col("n_langs"),
        col("majority_lang"), (col("n_langs") > 1).as("is_mixed"))
  }

  /** Global (single-group) top-k by `orderCols`, emitting a 1-based
    * long `rank` column — routed through the
    * [[org.apache.spark.sql.graft.TopKPerGroup]] operator under a
    * constant group key, so per-partition bounded heaps forward ≤ k
    * rows each and the frame is NEVER sorted on a single reducer.
    * This matters wherever the ranked frame is corpus-sized (the
    * q220/q221 distinct-term vocabulary — exactly the ID-heavy blowup
    * q135 exists to measure): `row_number() OVER (ORDER BY …)` plans
    * as a single-partition Exchange + full sort. The unpartitioned
    * window remains ONLY as the fixture-scale fallback for bare
    * sessions without [[graft.plans.GraftExtensions]], mirroring
    * [[Sampling.weightedReservoir]]. */
  private[operators] def globalTopK(df: DataFrame,
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val extensionsActive = df.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    if (extensionsActive)
      org.apache.spark.sql.graft.TopK.perGroup(
        df.withColumn("g", lit(0)), Seq("g"), orderCols, k).drop("g")
    else {
      val sorted = orderCols.map { case (c, asc) =>
        if (asc) col(c).asc else col(c).desc }
      df.withColumn("rank",
          row_number().over(Window.orderBy(sorted: _*)).cast("long"))
        .filter(col("rank") <= k)
    }
  }

  /** Vocabulary width of [[sourceJsd]]'s distributions. */
  val JsdVocab = 64

  /** Rank depth of [[zipfFit]]'s regression. */
  val ZipfTopRanks = 64

  /** Zipf rank–frequency fit (q221) — the third corpus-health lens
    * beside Heaps growth (q135) and Good–Turing richness (q217):
    * natural text follows f(r) ∝ r^(−s) with s ≈ 1, and a corpus
    * whose fitted exponent drifts far from that (template spam
    * flattens it, boilerplate floods steepen it) fails the
    * naturalness smell test before any model sees it. The fit is
    * closed-form least squares of ln f on ln r over the top
    * [[ZipfTopRanks]] ranks: the five moment sums (Σx, Σy, Σxy,
    * Σx², Σy²) each fold over the RANK-ordered list (the ordered-
    * fold FP discipline), and slope/intercept/r² are fixed-order
    * double formulas — bit-identical in the mirror.
    *
    * Scale design (100 TB): one map-side-combined term rollup, a
    * top-V rank pick through [[globalTopK]] (bounded per-partition
    * heaps — the distinct-term vocabulary, which an ID-heavy corpus
    * makes corpus-sized, is never single-partition sorted), then
    * constant-size (V-row) regression arithmetic — the corpus is
    * touched once. */
  def zipfFit(docs: DataFrame, topRanks: Int = ZipfTopRanks): DataFrame = {
    val termCounts = docs
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val ranked = globalTopK(termCounts,
        Seq("c" -> false, "term" -> true), topRanks)
      .select(col("rank").as("rn"),
        log(col("rank").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    def fold(field: String): Column =
      aggregate(col("pts"), lit(0.0),
        (acc, p) => acc + p.getField(field))
    ranked
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(struct(col("rn"), col("x").as("x"),
          col("y").as("y"), (col("x") * col("x")).as("xx"),
          (col("x") * col("y")).as("xy"),
          (col("y") * col("y")).as("yy")))).as("pts"))
      .select(col("n"), fold("x").as("sx"), fold("y").as("sy"),
        fold("xy").as("sxy"), fold("xx").as("sxx"),
        fold("yy").as("syy"))
      .select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
          .as("slope"),
        (((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))))
          .as("r2"))
      .select(col("n").as("n_ranks"), col("slope"), col("r2"),
        (col("slope") <= -0.5 && col("slope") >= -2.0)
          .as("zipf_like"))
  }

  /** Pairwise source Jensen–Shannon divergence (q220) — the
    * information-theoretic "which sources are redundant?" map next
    * to q95's MinHash overlap (set view) and q168's mixture entropy
    * (share view): each source's unigram distribution over the
    * corpus-wide top-[[JsdVocab]] vocabulary (add-one smoothed, so
    * every cell is positive and the logs are total), then
    * JSD(p,q) = ½Σ p·ln(p/m) + ½Σ q·ln(q/m) with m = (p+q)/2 for
    * every source pair — symmetric, bounded by ln 2, zero iff the
    * distributions match. Distributions are DENSE vectors ordered by
    * term (a source×vocab grid with coalesced zeros before
    * smoothing), so the per-pair fold is a fixed-length sequential
    * chain identical in both engines.
    *
    * Scale design (100 TB): one (source, term) rollup filtered to
    * the broadcast top-V vocabulary (picked via [[globalTopK]]'s
    * bounded heaps, never a single-partition vocabulary sort), a
    * |S|·V dense grid, and a |S|²-bounded pair join over V-length
    * arrays — sources number dozens, so everything after the first
    * exchange is constant-size planning arithmetic. */
  def sourceJsd(docs: DataFrame, vocabSize: Int = JsdVocab): DataFrame = {
    val terms = docs.select(col("source"),
      explode(split(col("text"), " ")).as("term"))
    val vocab = globalTopK(
        terms.groupBy(col("term")).agg(count(lit(1)).as("c")),
        Seq("c" -> false, "term" -> true), vocabSize)
      .select(col("term"))
    val counts = terms.join(broadcast(vocab), "term")
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
    val sources = docs.select(col("source")).distinct()
    val grid = sources.crossJoin(broadcast(vocab))
      .join(counts, Seq("source", "term"), "left")
      .na.fill(0L, Seq("c"))
    val totals = grid.groupBy(col("source"))
      .agg(sum(col("c")).as("tot"))
    // smooth over the ACTUAL vocabulary size (a corpus with fewer
    // distinct terms than the nominal V must not be flattened
    // toward uniform by phantom cells)
    val vsize = vocab.agg(count(lit(1)).as("vn"))
    val vecs = grid.join(broadcast(totals), "source")
      .crossJoin(broadcast(vsize))
      .select(col("source"), col("term"),
        ((col("c") + 1L).cast("double") /
          (col("tot") + col("vn")).cast("double")).as("p"))
      .groupBy(col("source"))
      .agg(sort_array(collect_list(struct(col("term"), col("p"))))
        .as("ps"))
      .select(col("source"),
        transform(col("ps"), x => x.getField("p")).as("pv"))
    val a = vecs.select(col("source").as("source_a"),
      col("pv").as("pa"))
    val b = vecs.select(col("source").as("source_b"),
      col("pv").as("pb"))
    a.join(b, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        (aggregate(
          zip_with(col("pa"), col("pb"), (p, q) =>
            p * log(p / ((p + q) / 2.0)) +
              q * log(q / ((p + q) / 2.0))),
          lit(0.0), (acc, x) => acc + x) / 2.0).as("jsd"))
  }

  /** Good–Turing / Chao1 vocabulary richness (q217) — the
    * "how much vocabulary is still unseen?" estimate that tells a
    * data buyer whether more of a source adds diversity, companion
    * to Heaps growth (q135, which measures the observed curve):
    * per source, the Good–Turing unseen-probability mass
    * p₀ = n₁/N (the chance the NEXT token is a new type) and the
    * Chao1 richness floor V + n₁²/(2n₂) (how many types exist,
    * estimated from the singleton/doubleton counts). All inputs are
    * exact LONGs from two map-side-combined rollups ((source, term)
    * counts, then frequency-of-frequency counts); the two estimates
    * are single fixed-order double formulas, and a zero-doubleton
    * source degrades to the standard n₁(n₁−1)/2 bias-corrected form
    * via one CASE — mirrored exactly.
    *
    * Scale design (100 TB): the corpus collapses to (source, term)
    * type counts once (the q135 exchange), then to ≤ |S|·max_count
    * frequency rows — the estimates never touch the token stream
    * again. */
  def vocabRichness(docs: DataFrame): DataFrame = {
    val typeCounts = docs.select(col("source"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
    val stats = typeCounts.groupBy(col("source"))
      .agg(count(lit(1)).as("v_obs"), sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("n2"))
    stats.select(col("source"), col("n_tokens"), col("v_obs"),
      col("n1"), col("n2"),
      (col("n1").cast("double") / col("n_tokens").cast("double"))
        .as("p_unseen"),
      (col("v_obs").cast("double") +
        when(col("n2") > 0L,
          col("n1").cast("double") * col("n1").cast("double") /
            (lit(2.0) * col("n2").cast("double")))
          .otherwise(col("n1").cast("double") *
            (col("n1") - 1L).cast("double") / 2.0)).as("chao1"))
  }

  /** Code-switch / mixed-language audit (q207) — the
    * paragraph-grained refinement of [[langId]]'s document verdict:
    * real crawl documents interleave languages (quoted sources,
    * boilerplate in a site's language around content in another),
    * and a document-level language id silently mislabels them, so
    * multilingual curation pipelines segment FIRST and route
    * paragraphs separately. Every width-[[graft.operators.Dedup.ParaWords]]
    * paragraph gets the shared [[langGuessCol]] verdict; the
    * document reports its modal paragraph language (ties to the
    * lexicographically first code via min on (−count, lang)), the
    * dissenting-paragraph count, and the is_mixed flag a router
    * branches on.
    *
    * Scale design (100 TB): the paragraph explode and per-paragraph
    * guess are row-local (the CASE tree evaluates inside the same
    * projection — no per-language scans); the only exchange is the
    * map-side-combined (doc_id, lang) vote rollup, ≤ |langs| rows
    * per document, followed by the |docs|-row modal pick. */
  def codeSwitchAudit(docs: DataFrame): DataFrame = {
    val P = Dedup.ParaWords
    val base = Dedup.paragraphBase(docs)
    val paras = base.select(col("doc_id"),
      posexplode(expr(
        s"""transform(sequence(0, CAST(n_paras AS INT) - 1),
           |  i -> array_join(slice(w, $P * i + 1, $P), ' '))"""
          .stripMargin)).as(Seq("pos", "ptext")))
    val votes = paras
      .select(col("doc_id"), langGuessCol(col("ptext")).as("plang"))
      .groupBy(col("doc_id"), col("plang"))
      .agg(count(lit(1)).as("cnt"))
    votes.groupBy(col("doc_id"))
      .agg(min(struct((-col("cnt")).as("neg"), col("plang"))).as("m"),
        sum(col("cnt")).as("n_paras"))
      .select(col("doc_id"), col("n_paras"),
        col("m.plang").as("modal_lang"),
        (-col("m.neg")).as("n_modal"),
        (col("n_paras") + col("m.neg")).as("n_other"),
        (col("n_paras") + col("m.neg") > 0L).as("is_mixed"))
  }

  /** Stopword-profile language id: per-language match ratio, winner
    * by maximum score with profile-order precedence on ties — both
    * built from the shared [[langScoreCol]]/[[langGuessCol]]
    * Columns. */
  def langId(docs: DataFrame): DataFrame =
    docs.select(
      Seq(col("doc_id")) ++
        langProfiles.map { case (code, words) =>
          langScoreCol(col("text"), words).as(s"score_$code")
        } :+ langGuessCol(col("text")).as("lang_guess"): _*)

  /** Tokenizer pattern for the BPE-ish token count: greedy runs of
    * letters, runs of digits, or a single non-alphanumeric mark —
    * the pre-tokenization split every BPE-family tokenizer starts
    * from. ASCII classes only so the Java (Spark) and RE2 (DuckDB
    * oracle) regex dialects agree exactly. */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Row-local BPE-ish regex token count of a document — shared by
    * [[tokenCounts]] and [[graft.operators.Sampling.packSequences]]
    * (the packer budgets by this estimate). Operates on the implicit
    * `text` column. */
  def regexTokenCountCol: Column =
    size(expr(s"regexp_extract_all(lower(text), '$TokenPattern', 0)"))
      .cast("long")

  /** Per-doc token counting: whitespace tokens vs the BPE-ish regex
    * pre-tokenization over the lowercased text. Row-local. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens).cast("long").as("ws_tokens"),
      regexTokenCountCol.as("regex_tokens"))

  /** Tokenizer fertility per language (q263) — the
    * tokenizer-health lens multilingual corpus reports lead with
    * (the UniMax/NLLB-era observation that a tokenizer trained on
    * one distribution over-fragments the others): per [[langId]]
    * language, fertility = BPE-ish tokens per whitespace word and
    * compression = chars per token, from exact integer sums (one
    * fixed-order division each — the q231 discipline). A language
    * whose fertility runs far above the corpus norm is getting more
    * sequence positions per word — the signal that drives
    * vocabulary rebalancing before training.
    *
    * Scale design (100 TB): lang guess and both token counts are
    * row-local columns (the q7/q24 kernels unchanged); the only
    * exchange is one map-side-combined rollup to ≤ |languages|
    * rows. */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs
      .select(langGuessCol(col("text")).as("lang"), col("source"),
        size(tokens).cast("long").as("ws"),
        regexTokenCountCol.as("tok"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("n_words"),
        sum(col("tok")).as("n_tokens"),
        sum(col("chars")).as("n_chars"))
      .select(col("lang"), col("source"), col("n_docs"),
        col("n_words"), col("n_tokens"), col("n_chars"),
        (col("n_tokens").cast("double") /
          col("n_words").cast("double")).as("fertility"),
        (col("n_chars").cast("double") /
          col("n_tokens").cast("double")).as("chars_per_token"))

  /** Sentence lengths (words) cycled by the q274 fixture. */
  val SentenceLens: Seq[Int] = Seq(4, 7, 3, 9, 5)

  /** Sentence segmentation (q274) — the preprocessing stage between
    * raw text and sentence-level consumers (bitext mining q119,
    * MT-style filtering, sentence-window chunking): boundaries fall
    * after sentence-final punctuation ([.!?]) followed by a space
    * (the stated-subset rule; abbreviation/ellipsis handling is the
    * sequential refinement real segmenters add on top). The split
    * is expressed as replace-then-split (punct+space → punct+
    * newline, split on newline) because BOTH regex dialects lack a
    * common lookbehind — the rule is identical, the backreference
    * spelling per-dialect ($1 vs \\1, stated).
    *
    * The graded fixture re-punctuates each document's words into
    * sentences of cycling lengths ([[SentenceLens]]) with cycling
    * terminators (. ! ?), so every rule branch runs on every doc.
    * Output per sentence: (doc_id, sent_idx, sentence, n_words,
    * terminator).
    *
    * Scale design (100 TB): one row-local projection + posexplode —
    * a document never crosses an exchange. */
  def sentenceSegments(docs: DataFrame): DataFrame = {
    // fixture: re-punctuate the doc's words into sentences of
    // cycling lengths 4/7/3/9/5 (cycle width 28; sentence ends at
    // cycle offsets 4/11/14/23/28 and at the document end) with
    // cycling . ! ? terminators — all index arithmetic, no fold
    // `w` materialized once per row in its own projection (the q268/
    // simhashDocs CollapseProject discipline) — the previous spelling
    // re-split the text inside the transform lambda, O(words²) chars
    // per document
    val fixture = expr(
      """array_join(transform(sequence(1, size(w)),
        |  i -> concat(
        |    element_at(w, i),
        |    IF((i - 1) % 28 + 1 IN (4, 11, 14, 23, 28)
        |         OR i = size(w),
        |      element_at(array('.', '!', '?'),
        |        CAST(((i - 1) DIV 28) * 5 +
        |          CASE WHEN (i - 1) % 28 + 1 <= 4 THEN 0
        |               WHEN (i - 1) % 28 + 1 <= 11 THEN 1
        |               WHEN (i - 1) % 28 + 1 <= 14 THEN 2
        |               WHEN (i - 1) % 28 + 1 <= 23 THEN 3
        |               ELSE 4 END AS INT) % 3 + 1),
        |      ''))), ' ')""".stripMargin)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), fixture.as("punct"))
      .select(col("doc_id"),
        posexplode(split(
          regexp_replace(col("punct"), "([.!?]) ", "$1\n"), "\n"))
          .as(Seq("sent_idx", "sentence")))
      .filter(length(col("sentence")) > 0)
      .select(col("doc_id"), col("sent_idx").cast("long")
          .as("sent_idx"),
        col("sentence"),
        size(split(col("sentence"), " ")).cast("long").as("n_words"),
        col("sentence").substr(length(col("sentence")), lit(1))
          .as("terminator"))
  }

  /** Corpus datasheet (q275) — the one-row dataset card a curation
    * run publishes with a release (the "datasheets for datasets"
    * practice): volume (docs/words/chars), exact duplicate rate
    * (distinct text digests), mean quality (the q6 kernel through
    * the q231 exact-micros sum), language mix (count, modal
    * language and its share via the q207 struct-min modal pick),
    * and source concentration (HHI over doc shares, the q169
    * ordered-fold FP discipline — the Σp² fold runs in source
    * order, bit-identical in the mirror).
    *
    * Scale design (100 TB): three map-side-combined aggregations
    * (one full, one ≤ |langs| rows, one ≤ |sources| rows) crossed
    * as 1-row frames — the corpus is scanned once per aggregate and
    * nothing corpus-sized shuffles. */
  def corpusDatasheet(docs: DataFrame): DataFrame = {
    val base = docs.select(col("source"),
      langGuessCol(col("text")).as("lang"),
      md5(col("text")).as("digest"),
      size(tokens).cast("long").as("ws"),
      length(col("text")).cast("long").as("chars"),
      floor(qualityScoreCol(col("text")) * 1000000.0 + 0.5)
        .cast("long").as("qmicros"))
    val tot = base.agg(count(lit(1)).as("n_docs"),
      sum(col("ws")).as("n_words"), sum(col("chars")).as("n_chars"),
      countDistinct(col("digest")).as("n_unique_texts"),
      sum(col("qmicros")).as("qsum"))
    val langs = base.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_langs"),
        min(struct((-col("c")).as("neg"), col("lang").as("lang")))
          .as("m"))
    val srcs = base.groupBy(col("source")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_sources"),
        collect_list(struct(col("source").as("source"),
          col("c").as("c"))).as("cs"))
    tot.crossJoin(langs).crossJoin(srcs)
      .select(col("n_docs"), col("n_words"), col("n_chars"),
        col("n_unique_texts"),
        (lit(1.0) - col("n_unique_texts").cast("double") /
          col("n_docs").cast("double")).as("exact_dup_rate"),
        (col("qsum").cast("double") / 1000000.0 /
          col("n_docs").cast("double")).as("mean_quality"),
        col("n_langs"), col("m.lang").as("modal_lang"),
        ((-col("m.neg")).cast("double") /
          col("n_docs").cast("double")).as("modal_lang_share"),
        col("n_sources"),
        aggregate(
          transform(array_sort(col("cs")), x =>
            (x.getField("c").cast("double") /
              col("n_docs").cast("double")) *
              (x.getField("c").cast("double") /
                col("n_docs").cast("double"))),
          lit(0.0), (a, b) => a + b).as("source_hhi"))
  }

  /** Phrases carried by [[phraseSearch]]'s query set (q268). */
  val PhraseTopK = 5

  /** Exact-phrase search (q268) — the positional complement of the
    * bag-of-words BM25 family (q83/q89): a phrase matches only
    * where its words are ADJACENT, which document-frequency scoring
    * cannot express. The query set is the corpus's own top
    * [[PhraseTopK]] bigrams (count desc, phrase asc — through the
    * [[globalTopK]] heap, since the bigram vocabulary is
    * corpus-sized), and the result is the phrase posting list:
    * (doc_id, phrase, n_occ) for every document containing a query
    * phrase, with exact adjacency occurrence counts.
    *
    * Scale design (100 TB): one map-side-combined bigram rollup
    * feeds the bounded heap; the query set is then BROADCAST back
    * into the exploded bigram stream (a per-doc row-local explode),
    * so matching is one broadcast hash join + one (doc, phrase)
    * rollup — the corpus never self-joins. */
  def phraseSearch(docs: DataFrame): DataFrame = {
    // guard the bigram build for 1-word (or empty) documents:
    // sequence(1, 0) in Spark generates the DESCENDING [1, 0] (not
    // an empty list like DuckDB's range), so index 0 would throw
    // INVALID_ARRAY_INDEX — the same pitfall Warc.recrawlSchedule
    // pins; an explicit empty array keeps explode dropping the row,
    // matching the oracle's range(1, len) semantics
    // the word array is materialized ONCE per row in its own
    // projection (the simhashDocs CollapseProject discipline): the
    // previous spelling re-evaluated split(text) inside the transform
    // lambda — element_at(split(..), i) per element, O(words²) chars
    // re-scanned per document (guide §1.2 "per-task work")
    val bg = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(expr(
          """case when size(w) >= 2 then
            |  transform(sequence(1, size(w) - 1),
            |    i -> concat(element_at(w, i), ' ',
            |                element_at(w, i + 1)))
            |else array() end""".stripMargin)).as("phrase"))
    val top = globalTopK(
      bg.groupBy(col("phrase")).agg(count(lit(1)).as("cnt")),
      Seq("cnt" -> false, "phrase" -> true), PhraseTopK)
      .select(col("phrase"))
    bg.join(broadcast(top), Seq("phrase"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(count(lit(1)).as("n_occ"))
      .select(col("doc_id"), col("phrase"), col("n_occ"))
  }

  /** SimHash bit width (matches the 60-bit digest; top bits unused),
    * band split and the Hamming cut for the pair search. 4 bands of
    * 15 bits ⇒ guaranteed capture of every pair with Hamming ≤ 3. */
  val SimHashBits = 60
  val SimBands = 4
  val BandBits: Int = SimHashBits / SimBands
  val HammingMax = 3

  /** Frequency-weighted SimHash over a precomputed token-hash array:
    * bit b is set iff Σ_tokens (2·bit_b(hash) − 1) > 0. Row-local.
    * Takes the hash ARRAY (not the tokens) so the md5 digests are
    * computed once per row, not once per bit; evaluated by the
    * codegen'd [[org.apache.spark.sql.graft.SimHashExpr]] kernel
    * (one pass) rather than 60 interpreted per-bit folds. */
  def simhashFromHashes(hs: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, SimHashExpr}
    Bridge.column(SimHashExpr(Bridge.expression(hs), SimHashBits))
  }

  def simhashDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens.as("w"))
      // separate projection: CollapseProject keeps the expensive
      // multi-referenced digest array materialized once per row
      .select(col("doc_id"), Dedup.digest60Array(col("w")).as("hs"))
      .select(col("doc_id"), simhashFromHashes(col("hs")).as("simhash"))

  /** Near-dup pairs by SimHash: candidates share at least one of
    * [[SimBands]] 15-bit bands (pigeonhole: guaranteed capture for
    * Hamming ≤ 3), verified with an exact popcount cut at
    * [[HammingMax]]. One shuffle on the band key; never all-pairs. */
  def simhashDups(docs: DataFrame): DataFrame = {
    val sims = simhashDocs(docs)
    val bands = sims.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until SimBands).map { j =>
        shiftright(col("simhash"), BandBits * j) % (1 << BandBits)
      }: _*)).as(Seq("band", "key")))
    // aliased self-sides (see Dedup.nearDupsFromHashes): qualified
    // column references instead of same-lineage Column objects
    val a = bands.alias("a")
    val b = bands.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= HammingMax)
  }

  /** Longest equal-run length via the codegen'd
    * [[org.apache.spark.sql.graft.LongestRun]] kernel (with
    * `sortFirst` = maximum element multiplicity) — the interpreted
    * struct-state fold formulation is pinned as its equivalence twin
    * in KernelEquivalenceSpec. */
  private def longestRun(arr: Column, sortFirst: Boolean = false): Column = {
    import org.apache.spark.sql.graft.{Bridge, LongestRun}
    Bridge.column(LongestRun(Bridge.expression(arr), sortFirst))
  }

  /** Repetition signals (the Gopher/C4-style quality rules that gate
    * real pretraining corpora): longest consecutive equal-token run,
    * top-word mass fraction, and the duplicate-2-gram fraction. All
    * row-local codegen'd kernels — the oracle mirrors with
    * gaps-and-islands SQL, but at 100 TB the one-pass formulation is
    * the one that never shuffles. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, WordShingles}
    val grams2 = Bridge.column(WordShingles(Bridge.expression(col("w")), 2))
    docs
      .select(col("doc_id"), tokens.as("w"))
      .select(
        col("doc_id"),
        longestRun(col("w")).as("max_run"),
        (longestRun(col("w"), sortFirst = true).cast("double") /
          size(col("w"))).as("top_word_frac"),
        when(size(col("w")) >= 2,
          lit(1.0) - size(array_distinct(grams2)).cast("double") /
            size(grams2))
          .as("dup_2gram_frac"))
  }

  /** PII scrubbing patterns — ASCII-only classes so Java and RE2
    * agree (emails, dashed/spaced phone numbers). */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
  val PhonePattern = "[0-9][0-9][0-9][- ][0-9][0-9][0-9][- ][0-9][0-9][0-9][0-9]"

  /** Deterministic PII synthesis over the fixture corpus: docs with
    * doc_id ≡ 0 (mod 3) get an email appended, docs with doc_id ≡ 0
    * (mod 5) a dashed phone number — pure integer arithmetic on
    * doc_id, so the DuckDB oracle reconstructs the identical text and
    * the scrub operator (q44) is gradeable even though the fixture
    * corpus itself contains no PII by construction. */
  def withSyntheticPii(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact u"), col("doc_id").cast("string"),
            lit("@mail.example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call "),
            (col("doc_id") % 900 + 100).cast("string"), lit("-"),
            ((col("doc_id") * 7) % 900 + 100).cast("string"), lit("-"),
            (col("doc_id") % 9000 + 1000).cast("string")))
          .otherwise(lit(""))).as("text"))

  /** PII scrub: count and redact emails/phone numbers (row-local
    * regexp pipeline; the redaction placeholder keeps the text
    * alignment-stable for downstream token counting). Oracle-graded
    * as q44 over the [[withSyntheticPii]] corpus; edge cases (PII at
    * string boundaries, multiples per doc) are additionally
    * spec-proven on crafted rows. */
  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(expr(s"regexp_extract_all(text, '$EmailPattern', 0)"))
        .cast("long").as("n_emails"),
      size(expr(s"regexp_extract_all(text, '$PhonePattern', 0)"))
        .cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>").as("clean_text"))

  /** Synthetic 16-digit card-like numbers appended to every fourth
    * document (q211's fixture): digits derived from doc_id by the
    * shared Knuth mix, so ~10% of the planted runs are Luhn-valid by
    * arithmetic accident — exactly the mixed valid/invalid population
    * a checksum-validating scrubber exists to separate. The id is
    * masked below 2^31 BEFORE the multiply (the house Knuth-mix
    * discipline): unmasked, doc_id ≥ ~3.47e9 overflows the 64-bit
    * product — Spark wraps silently while DuckDB errors, so the two
    * engines would diverge exactly where the fixture can't see. */
  def withSyntheticCards(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(
        col("text"),
        when(col("doc_id") % 4 === 0,
          concat(lit(" card "),
            lpad((((col("doc_id") % 2147483648L) * Sampling.HashMult)
              % 100000000L)
              .cast("string"), 8, "0"),
            lpad(((col("doc_id") * 97L) % 100000000L).cast("string"),
              8, "0"))).otherwise(lit(""))).as("text"))

  /** The SQL fragment validating a 16-char digit run `r` by the Luhn
    * checksum — from the rightmost digit, double every second one,
    * subtract 9 when the double exceeds 9, valid iff the sum ≡ 0
    * (mod 10). Written once and shared with the oracle generator so
    * both engines evaluate the identical integer chain. */
  private def luhnCond(r: String): String =
    s"""aggregate(transform(sequence(1, 16), i ->
       |  CASE WHEN (17 - i) % 2 = 0 THEN
       |    CASE WHEN CAST(substring($r, i, 1) AS INT) * 2 > 9
       |      THEN CAST(substring($r, i, 1) AS INT) * 2 - 9
       |      ELSE CAST(substring($r, i, 1) AS INT) * 2 END
       |  ELSE CAST(substring($r, i, 1) AS INT) END),
       |  0, (a, x) -> a + x) % 10 = 0""".stripMargin

  /** Luhn-validated card-number scrub (q211) — the PRECISION upgrade
    * over q44's pattern-only redaction: a bare 16-digit regex
    * redacts order numbers, tracking codes and timestamps ruining
    * text for nothing, while a real card number always satisfies the
    * Luhn checksum — so candidates are digit runs of EXACTLY 16
    * (boundary-safe: runs extracted as maximal `[0-9]+` then length-
    * filtered, no lookbehind needed — the regex dialect both engines
    * share), validity is the checksum, and ONLY validated runs are
    * redacted (invalid runs stay — they are not cards, and cutting
    * them is the false positive this operator exists to prevent).
    * Clean text rebuilds by folding a BOUNDARY-ANCHORED
    * `regexp_replace` over the validated runs in extraction order:
    * the pattern `(^|[^0-9])run([^0-9]|$)` redacts only occurrences
    * that are themselves maximal digit runs, so a longer non-
    * candidate run elsewhere in the document that happens to embed
    * the same 16 digits is left intact (a literal substring
    * `replace` violated exactly that contract — r12 ADVICE). The
    * replace runs twice per fold step because a global regex pass
    * consumes the trailing boundary character of each match: in a
    * chain of same-valued runs separated by single characters the
    * even occurrences are skipped on pass one and — now flanked by
    * the '>'/'<' of neighbouring redactions — caught on pass two.
    * Lookbehind would express this in one pass but is Java-regex
    * only; the alternation form is the dialect both engines share.
    *
    * Scale design (100 TB): one row-local pass — extraction, the
    * 16-step integer checksum per candidate, and the rebuild all
    * evaluate inside the same projection; zero shuffles, composes
    * with q44's email/phone scrub in the same scan. */
  def luhnCardScrub(docs: DataFrame): DataFrame =
    docs
      .withColumn("cands", expr(
        "filter(regexp_extract_all(text, '[0-9]+', 0), " +
          "r -> length(r) = 16)"))
      .withColumn("valid", expr(
        s"filter(cands, r -> ${luhnCond("r")})"))
      .select(col("doc_id"),
        size(col("cands")).cast("long").as("n_candidates"),
        size(col("valid")).cast("long").as("n_valid"),
        expr("aggregate(valid, text, (acc, r) -> " +
          "regexp_replace(regexp_replace(acc, " +
          "concat('(^|[^0-9])', r, '([^0-9]|$)'), '$1<CARD>$2'), " +
          "concat('(^|[^0-9])', r, '([^0-9]|$)'), '$1<CARD>$2'))")
          .as("clean_text"))

  /** Context-window chunking parameters: window size and overlap in
    * characters (stride = size − overlap). */
  val ChunkChars = 200
  val ChunkOverlap = 40
  val ChunkStride: Int = ChunkChars - ChunkOverlap

  /** Fixed-window document chunking with overlap — the context-window
    * prep step (RAG indexing / long-doc training): chunk i covers
    * characters [i·stride, i·stride + size). Every document yields at
    * least one chunk; the last chunk may run short. Pure row-local
    * integer arithmetic + explode — no shuffle at any scale; the
    * ceil-div numerator is clamped non-negative BEFORE the division
    * so Spark's truncating DIV and DuckDB's flooring `//` agree. */
  def chunkDocs(docs: DataFrame, size: Int = ChunkChars,
      stride: Int = ChunkStride): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
      .withColumn("n_chunks",
        lit(1L) + expr(s"(greatest(0L, len - $size) + ${stride - 1}) DIV $stride"))
      .select(col("doc_id"), col("text"), col("len"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride + 1).as("chunk_start"),
        expr(s"substring(text, chunk_id * $stride + 1, $size)")
          .as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))

  /** Top terms kept per document by TF-IDF. */
  val TfidfTopK = 3

  /** Word pattern for TF-IDF terms: lowercase ASCII letter runs only
    * (shared Java/RE2 semantics, as [[TokenPattern]]). */
  val WordPattern = "[a-z]+"

  /** Per-document TF-IDF top-[[TfidfTopK]] terms: tf = term count in
    * the doc, df = number of docs containing the term, idf =
    * ln(N/df), ranked tfidf desc with a term-asc tie-break.
    *
    * Scale design: tokenize/explode is row-local; tf and df are two
    * hash aggregations (df aggregates the already-distinct (doc,term)
    * tf rows — never the raw token stream); the corpus size N joins
    * in as a broadcast single-row aggregate, NOT a driver-side
    * collect; the rank window is partitioned by doc_id. The ln(N/df)
    * arguments here stay in a range where JVM `Math.log` and the
    * oracle's libm `ln` agree within 1 ulp, which the driver's %.9g
    * canonicalization absorbs (probed exhaustively for N ≤ 50000). */
  /** Unigram-LM perplexity quality gate (the CCNet-style filter every
    * large pretraining corpus build runs): score each document by the
    * average negative log-likelihood of its tokens under the corpus's
    * OWN unigram distribution — high-perplexity documents are the
    * gibberish/boilerplate outliers, low are the repetitive ones.
    *
    * Scale design: identical shape to [[tfidfTopTerms]] — per-doc term
    * counts come from the row-local [[org.apache.spark.sql.graft.TokenCounts]]
    * kernel (the raw token stream never shuffles), corpus term counts
    * are one hash aggregation of the pre-aggregated tf rows, and the
    * corpus total joins in as a broadcast single-row aggregate. The
    * per-doc NLL sum is order-scrambled double addition, absorbed by
    * the compare's %.9g exactly like every other SUM. */
  def unigramNll(docs: DataFrame): DataFrame = {
    val tf = termFrequencies(docs)
    val ctf = tf.groupBy(col("term")).agg(sum(col("tf")).as("ctf"))
    val total = ctf.agg(sum(col("ctf")).as("total"))
    tf.join(ctf, "term")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tok"),
        sum(col("tf").cast("double") *
          -log(col("ctf").cast("double") / col("total"))).as("nll_sum"))
      .select(
        col("doc_id"), col("n_tok"),
        (col("nll_sum") / col("n_tok")).as("avg_nll"),
        exp(col("nll_sum") / col("n_tok")).as("perplexity"))
  }

  /** Pre-aggregated (doc_id, term, tf) rows via the row-local
    * [[org.apache.spark.sql.graft.TokenCounts]] kernel — each
    * document's token list never leaves its row, so the explode emits
    * (term, tf) pairs and the raw token stream is never shuffled (at
    * 100 TB that shuffle IS the query). Shared by [[tfidfTopTerms]]
    * and [[unigramNll]]. */
  private def termFrequencies(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, TokenCounts}
    docs
      .select(col("doc_id"),
        explode(Bridge.column(TokenCounts(Bridge.expression(
          expr(s"regexp_extract_all(lower(text), '$WordPattern', 0)")))))
          .as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"),
        col("tc.tf").as("tf"))
  }

  def tfidfTopTerms(docs: DataFrame, topK: Int = TfidfTopK): DataFrame = {
    val tf = termFrequencies(docs)
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(docFreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term").asc)).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** Heavy-hitter constants (q59): a token is heavy when it carries
    * ≥ [[HeavyFraction]] of all token occurrences; the sketch's
    * overestimate is bounded by eps·N ≈ 0.1% of N, far under the 2%
    * cut, so the candidate set stays tight. */
  val HeavyFraction = 0.02
  val CmsEps = 0.001
  val CmsConfidence = 0.99
  val CmsSeed = 42

  /** EXACT corpus heavy hitters via a Count-Min-Sketch pre-filter:
    * tokens carrying ≥ `fraction` of all occurrences, with exact
    * counts. One sketch pass (distributed aggregate, driver memory =
    * the sketch's fixed width×depth table), then the token stream is
    * filtered ROW-LOCALLY by the sketch estimate before the exact
    * count — the long tail (most of the distinct mass) never enters
    * the shuffle. CMS never undercounts, so the filter keeps a
    * superset of the true heavy hitters and the exact HAVING makes
    * the result identical to the oracle's full GROUP BY — the same
    * provably-exact pre-filter contract as the Bloom join (q56). */
  def heavyHitters(docs: DataFrame,
      fraction: Double = HeavyFraction): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, CmsEstimate}
    val tokens = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .persist()
    try {
      val total = tokens.count() // scalar action; reuses the persist
      val threshold = math.max(1L, (total * fraction).toLong)
      val cms = tokens.stat.countMinSketch(
        "token", CmsEps, CmsConfidence, CmsSeed)
      tokens
        .filter(Bridge.column(CmsEstimate(
          Bridge.expression(col("token")), cms)) >= threshold)
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") >= threshold)
    } finally {
      // Both eager consumers (count + sketch build) are done; the
      // returned frame's final pass re-derives the token stream
      // row-locally from docs instead of reading the cache. That is
      // the right trade at every scale — an exploded token stream is
      // LARGER than its corpus, exactly what you don't pin in
      // executor memory at 100 TB — and it leaves no cache entry for
      // the caller to leak.
      tokens.unpersist(blocking = false)
    }
  }

  /** BM25 retrieval constants (q83): Robertson/Sparck-Jones defaults
    * (k1, b) and a fixed graded query — mid-frequency terms of the
    * fixture vocabulary so tf and length normalization, not df,
    * decide the ranking. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25TopK = 20
  val Bm25Query: Seq[String] = Seq("spark", "vector", "stream", "merge")

  /** BM25 top-k document retrieval for a fixed bag-of-words query —
    * the scoring pass of every sparse-retrieval / RAG corpus build.
    * Per (doc, query-term): idf(t) · (tf·(k1+1)) / (tf + k1·(1−b +
    * b·dl/avgdl)) with the Lucene-shaped idf = ln(1 + (N−df+0.5)/
    * (df+0.5)) (always ≥ 0), summed per doc, global top-k by score
    * with a doc_id tie-break.
    *
    * Scale design: tokenization, per-doc term counts
    * ([[org.apache.spark.sql.graft.TokenCounts]]) and doc length all
    * come out of ONE row-local pass — dl rides alongside the exploded
    * (term, tf) pairs, so no doc_id join is ever needed and the raw
    * token stream never shuffles. The term filter to the query
    * vocabulary is applied row-locally BEFORE any exchange: only
    * (doc, query-term) rows — |query| ≈ 4 per doc at most — reach the
    * df aggregation and scoring. N and avgdl reduce the corpus to one
    * broadcast row; df reduces the filtered rows to |query| broadcast
    * rows. The final top-k is a GLOBAL top-k routed through the
    * [[org.apache.spark.sql.graft.TopKPerGroup]] operator under a
    * constant group (per-partition heaps forward ≤ k rows each — the
    * corpus is never sorted), with the same fixture-scale-only
    * unpartitioned-window fallback as
    * [[Sampling.weightedReservoir]] for bare sessions. */
  def bm25TopDocs(docs: DataFrame, query: Seq[String] = Bm25Query,
      k1: Double = Bm25K1, b: Double = Bm25B,
      topK: Int = Bm25TopK): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, TokenCounts}
    // one row-local pass: doc length + per-term tf, filtered to the
    // query vocabulary before anything shuffles
    val tf = docs
      .select(col("doc_id"),
        expr(s"regexp_extract_all(lower(text), '$WordPattern', 0)")
          .as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(Bridge.column(TokenCounts(Bridge.expression(
          col("toks"))))).as("tc"))
      .select(col("doc_id"), col("dl"),
        col("tc.term").as("term"), col("tc.tf").as("tf"))
      .filter(col("term").isin(query: _*))
    // corpus stats: one broadcast row (count + avgdl over ALL docs,
    // including those with no query term)
    val stats = docs
      .select(size(expr(
        s"regexp_extract_all(lower(text), '$WordPattern', 0)"))
        .cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("dl").cast("double")).as("avgdl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) +
          (col("n_docs").cast("double") - col("df").cast("double") +
            lit(0.5)) / (col("df").cast("double") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score"),
        count(lit(1)).as("n_terms_hit"))
    val ranked =
      globalTopK(scored, Seq("score" -> false, "doc_id" -> true), topK)
    ranked.select(col("doc_id"), col("n_terms_hit"), col("score"),
      col("rank"))
  }

  /** PRF knobs (q209): feedback depth and expansion width. */
  val PrfFbDocs = 10
  val PrfFbTerms = 3

  /** Pseudo-relevance-feedback query expansion (q209, Rocchio/RM
    * -lite) — the missing retrieval-family member between one-shot
    * BM25 (q83) and hybrid fusion (q84): retrieve [[PrfFbDocs]]
    * feedback documents with the original query, mine them for the
    * [[PrfFbTerms]] best expansion terms — weight(t) = idf(t) ·
    * Σ_{d∈F} tf(t,d)/dl(d), the relevance-model estimate with the
    * BM25-shaped idf damping the boilerplate terms a raw tf ratio
    * would pick — then re-run BM25 with the expanded
    * (original ∪ expansion) vocabulary and emit the final top-k.
    * The per-term feedback sum folds over the ≤ [[PrfFbDocs]]
    * feedback ratios SORTED by doc_id (the ordered-fold FP
    * discipline), and the expansion pick breaks ties (weight DESC,
    * term ASC) — every double on the path is fixed-order and
    * mirrored.
    *
    * Scale design (100 TB): both retrieval passes keep the q83
    * shape — the raw token stream never shuffles; pass 2's term
    * filter is a BROADCAST join with the tiny expanded-vocabulary
    * frame (terms stay distributed end to end — no driver collect
    * anywhere); the candidate-term table is bounded by the feedback
    * set's vocabulary (10 docs), so its df lookup broadcasts and its
    * ranking window runs on a bounded frame. */
  def prfExpandedTopDocs(docs: DataFrame,
      query: Seq[String] = Bm25Query, fbDocs: Int = PrfFbDocs,
      fbTerms: Int = PrfFbTerms, k1: Double = Bm25K1,
      b: Double = Bm25B, topK: Int = Bm25TopK): DataFrame =
    prfExpandedTopDocsWithHandle(docs, query, fbDocs, fbTerms, k1, b,
      topK)._1

  /** [[prfExpandedTopDocs]] plus the [[graft.util.CacheHandle]]
    * releasing the shared token-frequency frame — tokenized ONCE and
    * reused by the base pass, the feedback mine, the candidate df
    * lookup, and the final pass (unpersisted, the regex-tokenize
    * kernel re-runs per consumer and dominates the wall clock: the
    * measured solo time dropped from 8.4 s to the battery-row floor
    * once shared). */
  def prfExpandedTopDocsWithHandle(docs: DataFrame,
      query: Seq[String] = Bm25Query, fbDocs: Int = PrfFbDocs,
      fbTerms: Int = PrfFbTerms, k1: Double = Bm25K1,
      b: Double = Bm25B, topK: Int = Bm25TopK)
      : (DataFrame, graft.util.CacheHandle) = {
    import org.apache.spark.sql.graft.{Bridge, TokenCounts}
    val tfAll = docs
      .select(col("doc_id"),
        expr(s"regexp_extract_all(lower(text), '$WordPattern', 0)")
          .as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(Bridge.column(TokenCounts(Bridge.expression(
          col("toks"))))).as("tc"))
      .select(col("doc_id"), col("dl"),
        col("tc.term").as("term"), col("tc.tf").as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def tfStream: DataFrame = tfAll
    val stats = docs
      .select(size(expr(
        s"regexp_extract_all(lower(text), '$WordPattern', 0)"))
        .cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("dl").cast("double")).as("avgdl"))
      // one row, consumed by three scoring stages — cut the lineage
      // so the corpus-length scan runs once
      .localCheckpoint()
    // base retrieval re-scored from the SHARED tf frame — identical
    // expression tree to bm25TopDocs (spec-pinned row parity). The
    // feedback set is ≤ fbDocs ROWS but its lineage is the whole
    // base pass: localCheckpoint it (and qterms below) so the three
    // downstream broadcasts replay 10 rows, not three base passes.
    val fb = scoreAndRank(tfStream.filter(col("term").isin(query: _*)),
      stats, k1, b, fbDocs).select(col("doc_id"))
      .localCheckpoint()
    val fbTf = tfStream.join(broadcast(fb), "doc_id")
      .filter(!col("term").isin(query: _*))
    val wRaw = fbTf.groupBy(col("term"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("doc_id"),
          (col("tf").cast("double") / col("dl").cast("double"))
            .as("r")))),
        lit(0.0), (a, x) => a + x.getField("r")).as("fbw"))
      // bounded by the feedback set's vocabulary; consumed by the df
      // lookup's broadcast AND the expansion join — cut the lineage
      // so the fold chain runs once
      .localCheckpoint()
    val dfC = tfStream.join(broadcast(wRaw.select(col("term"))), "term")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val expansion = wRaw.join(dfC, "term")
      .crossJoin(broadcast(stats))
      .withColumn("w",
        log(lit(1.0) +
          (col("n_docs").cast("double") - col("df").cast("double") +
            lit(0.5)) / (col("df").cast("double") + lit(0.5))) *
          col("fbw"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("w").desc, col("term").asc)).cast("long"))
      .filter(col("rn") <= fbTerms)
      .select(col("term"))
    val orig = docs.sparkSession
      .createDataFrame(query.map(Tuple1(_))).toDF("term")
    val qterms = expansion.union(orig).distinct()
      .localCheckpoint()
    (scoreAndRank(tfStream.join(broadcast(qterms), "term"), stats,
      k1, b, topK), graft.util.CacheHandle(tfAll))
  }

  /** The BM25 scoring + global-top-k tail over a prepared
    * (doc_id, dl, term, tf) frame — the expression tree of
    * [[bm25TopDocs]] factored out so [[prfExpandedTopDocsWithHandle]]
    * runs BOTH its passes from one shared tokenize. */
  private def scoreAndRank(tf: DataFrame, stats: DataFrame,
      k1: Double, b: Double, topK: Int): DataFrame = {
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) +
          (col("n_docs").cast("double") - col("df").cast("double") +
            lit(0.5)) / (col("df").cast("double") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score"),
        count(lit(1)).as("n_terms_hit"))
    val extensionsActive = tf.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val ranked =
      if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(
          scored.withColumn("g", lit(0)), Seq("g"),
          Seq("score" -> false, "doc_id" -> true), topK).drop("g")
      else scored
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc))
          .cast("long"))
        .filter(col("rank") <= topK)
    ranked.select(col("doc_id"), col("n_terms_hit"), col("score"),
      col("rank"))
  }

  /** Graded multi-query fixture (q89): five bag-of-words queries over
    * mid-frequency fixture vocabulary, disjoint enough that each
    * query's ranking exercises different documents. */
  val Bm25QuerySet: Seq[(Long, Seq[String])] = Seq(
    0L -> Bm25Query,
    1L -> Seq("join", "hash", "filter"),
    2L -> Seq("window", "sort", "group", "key"),
    3L -> Seq("scan", "column", "table"),
    4L -> Seq("batch", "row", "data", "fast"))

  /** [[bm25TopDocs]] generalized to a query TABLE — the RAG-batch
    * shape: score every (query, doc) pair where the doc contains a
    * query term, top-k PER QUERY. Same scoring expression, same
    * single row-local tokenize pass.
    *
    * Scale design: the corpus side is filtered row-locally to the
    * UNION vocabulary of all queries BEFORE any exchange, then fanned
    * out to per-query rows by a BROADCAST join with the (query_id,
    * term) table — the (doc, term) stream never shuffles to meet the
    * queries, the tiny query table moves instead. df/N/avgdl stay
    * query-independent broadcast aggregates (df(t) is a property of
    * the corpus, shared across every query containing t). The
    * per-query top-k goes through [[org.apache.spark.sql.graft
    * .TopKPerGroup]] keyed on query_id: per-partition heaps forward
    * ≤ k rows per query, so the ranking cost is |Q|·k rows after the
    * partial pass no matter the corpus size. */
  def bm25TopDocsMulti(docs: DataFrame,
      querySet: Seq[(Long, Seq[String])] = Bm25QuerySet,
      k1: Double = Bm25K1, b: Double = Bm25B,
      topK: Int = Bm25TopK): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, TokenCounts}
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = querySet.flatMap(_._2).distinct
    val queryTerms = querySet
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val tf = docs
      .select(col("doc_id"),
        expr(s"regexp_extract_all(lower(text), '$WordPattern', 0)")
          .as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(Bridge.column(TokenCounts(Bridge.expression(
          col("toks"))))).as("tc"))
      .select(col("doc_id"), col("dl"),
        col("tc.term").as("term"), col("tc.tf").as("tf"))
      .filter(col("term").isin(vocab: _*))
    val stats = docs
      .select(size(expr(
        s"regexp_extract_all(lower(text), '$WordPattern', 0)"))
        .cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("dl").cast("double")).as("avgdl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "term")
      .join(broadcast(queryTerms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) +
          (col("n_docs").cast("double") - col("df").cast("double") +
            lit(0.5)) / (col("df").cast("double") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score"),
        count(lit(1)).as("n_terms_hit"))
    val extensionsActive = spark.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val ranked =
      if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(
          scored, Seq("query_id"),
          Seq("score" -> false, "doc_id" -> true), topK)
      else scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("score").desc, col("doc_id").asc))
          .cast("long"))
        .filter(col("rank") <= topK)
    ranked.select(col("query_id"), col("doc_id"), col("n_terms_hit"),
      col("score"), col("rank"))
  }

  /** Context token budget of [[ragContexts]] (q284). */
  val RagContextBudget = 400L

  /** RAG context assembly (q284) — the serving step AFTER retrieval
    * (q89's multi-query BM25): each query's ranked documents pack
    * into its context window in rank order until the budget is
    * exhausted — the PREFIX rule (stop at the first overflow,
    * stated; skip-and-continue is the sequential refinement), so
    * inclusion is one monotone prefix-sum compare. Per candidate:
    * (query_id, rank, doc_id, score, n_tok, cum_tokens, included).
    *
    * Scale design (100 TB): retrieval is the UNCHANGED q89 plan
    * (broadcast query join + per-query heaps); assembly adds one
    * doc-token join and a per-QUERY window bounded at the
    * retrieval depth (topK rows) — never corpus-sized. */
  def ragContexts(docs: DataFrame): DataFrame = {
    val ranked = bm25TopDocsMulti(docs)
    val toks = docs.select(col("doc_id"),
      regexTokenCountCol.as("n_tok"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.join(toks, Seq("doc_id"))
      .withColumn("cum_tokens", sum(col("n_tok")).over(w))
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score"), col("n_tok"), col("cum_tokens"),
        (col("cum_tokens") <= RagContextBudget).as("included"))
  }

  /** Near-dup-aware RAG context dedup (q285) — the context-quality
    * rule RAG serving adds on top of q284: retrieving two
    * near-duplicates wastes budget on redundant evidence, so any
    * candidate that is a q5 near-dup of a HIGHER-ranked candidate
    * of the same query is demoted before packing (the stated rule:
    * demotion keys on retrieval rank, not inclusion — the
    * sequential include-aware variant is the refinement). Survivors
    * re-rank densely and pack under the q284 prefix-budget rule.
    *
    * Scale design (100 TB): the near-dup pair set is the UNCHANGED
    * q5 operator (banded, bounded) and joins the per-query
    * candidate lists BROADCAST (pairs are dup-density-sized);
    * every window stays per-query and retrieval-depth-bounded. */
  def ragDedupContexts(docs: DataFrame): DataFrame = {
    val cands = bm25TopDocsMulti(docs)
      .select(col("query_id"), col("doc_id"), col("score"),
        col("rank").as("orig_rank"))
    val pairs = Dedup.minhashNearDups(docs)
      .select(col("doc_a"), col("doc_b"))
    val sym = pairs.unionByName(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    // a candidate is demoted iff some higher-ranked candidate of the
    // SAME query is its near-dup
    val demoted = cands.as("c")
      .join(broadcast(sym), col("c.doc_id") === col("doc_b"))
      .join(cands.as("h"),
        col("h.query_id") === col("c.query_id") &&
          col("h.doc_id") === col("doc_a") &&
          col("h.orig_rank") < col("c.orig_rank"))
      .select(col("c.query_id").as("query_id"),
        col("c.doc_id").as("doc_id"))
      .distinct()
      .withColumn("demote", lit(true))
    val survivors = cands
      .join(demoted, Seq("query_id", "doc_id"), "left")
      .filter(col("demote").isNull)
    val toks = docs.select(col("doc_id"),
      regexTokenCountCol.as("n_tok"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("orig_rank"))
    val run = w.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    survivors.join(toks, Seq("doc_id"))
      .withColumn("new_rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tok")).over(run))
      .select(col("query_id"), col("new_rank"), col("orig_rank"),
        col("doc_id"), col("score"), col("n_tok"), col("cum_tokens"),
        (col("cum_tokens") <= RagContextBudget).as("included"))
  }

  /** Quality-filter funnel thresholds (q94) — Gopher/C4-family rules
    * scaled to the fixture's short synthetic documents (production
    * corpora retune these; the RULES and their precedence are the
    * operator). */
  val MinTokens = 20
  val MaxTokens = 2000
  val MinAvgTokenLen = 3.0
  val MaxAvgTokenLen = 10.0
  val MaxSymbolRatio = 0.1
  val MinStopwordRatio = 0.02
  val MinDistinctRatio = 0.3

  /** Gopher/C4-style quality-filter funnel (q94): the rule battery
    * every pretraining corpus passes through before anything
    * expensive touches it — token-count bounds, mean-token-length
    * band, symbol-character ratio, minimum stopword density, and a
    * repetition screen on the distinct-token ratio. One verdict row
    * per document with the measured ratios, the keep flag, and the
    * FIRST failing rule in fixed precedence (`reject_reason` =
    * too_short → too_long → odd_token_len → symbolic → low_stopword
    * → repetitive → none) — the reason distribution is what corpus
    * curators actually monitor per snapshot.
    *
    * Scale design (100 TB): entirely row-local — one scan, every
    * measure a codegen'd fold over the row's own tokens, no shuffle,
    * no aggregation; composes into the funnel scan (q36) exactly like
    * the other row-local gates. */
  def qualityFilter(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), col("text"), tokens.as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        (sumInts(transform(col("w"), t => length(t).cast("long")))
          .cast("double") / size(col("w"))).as("avg_token_len"),
        (length(regexp_replace(lower(col("text")), "[a-z0-9 ]", ""))
          .cast("double") / length(col("text"))).as("symbol_ratio"),
        (size(filter(col("w"), t => array_contains(arrLit(stopwords), t)))
          .cast("double") / size(col("w"))).as("stopword_ratio"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w")))
          .as("distinct_ratio"))
    base
      .withColumn("reject_reason",
        when(col("n_tokens") < MinTokens, "too_short")
          .when(col("n_tokens") > MaxTokens, "too_long")
          .when(col("avg_token_len") < MinAvgTokenLen ||
            col("avg_token_len") > MaxAvgTokenLen, "odd_token_len")
          .when(col("symbol_ratio") > MaxSymbolRatio, "symbolic")
          .when(col("stopword_ratio") < MinStopwordRatio, "low_stopword")
          .when(col("distinct_ratio") < MinDistinctRatio, "repetitive")
          .otherwise("none"))
      .withColumn("kept", col("reject_reason") === "none")
  }

  /** Target-LM scoring knobs (q97): the bigram model trains on this
    * fixture source (in production: a curated high-quality corpus),
    * interpolating bigram MLE with a Laplace-smoothed unigram
    * fallback at weight [[LmLambda]]. */
  val TargetLmSource = "src18"
  val LmLambda = 0.7

  /** CCNet-style perplexity filtering (q97): score every document by
    * its cross-entropy under a bigram LM trained on a TARGET domain —
    * p(w2|w1) = λ·c2(w1,w2)/c1(w1) + (1−λ)·(c1(w2)+1)/(N+V+1), the
    * interpolated MLE-plus-smoothed-unigram model — and emit per-doc
    * (n_bigrams, cross_entropy, ppl). Low perplexity ⇒ looks like
    * the target; the continuous sibling of [[graft.operators.Sampling.importanceWeights]]'s
    * thresholded selection, and the classifier-free quality signal
    * most pretraining pipelines run at ingest.
    *
    * Scale design (100 TB): the LM tables are bounded by the TARGET
    * domain (vocab + its bigrams), broadcast to every executor — the
    * corpus-sized side tokenizes row-locally, reduces to per-doc
    * bigram counts (map-side combine, per-doc bounded keys), joins
    * the broadcast tables without moving, and aggregates once per
    * doc. No stage shuffles the raw token stream. */
  def targetLmScore(docs: DataFrame,
      targetSource: String = TargetLmSource,
      lambda: Double = LmLambda): DataFrame = {
    val base = docs
      .select(col("doc_id"), col("source"), tokens.as("w"))
      .filter(size(col("w")) >= 2)
    val bigrams = base.select(col("doc_id"), col("source"),
        explode(expr("transform(sequence(0, size(w) - 2), " +
          "i -> struct(w[i] AS w1, w[i + 1] AS w2))")).as("b"))
      .select(col("doc_id"), col("source"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c1 = base.filter(col("source") === targetSource)
      .select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c1"))
    val c2 = bigrams.filter(col("source") === targetSource)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val stats = c1.agg(sum(col("c1")).as("n_tok"),
      count(lit(1)).as("v"))
    val db = bigrams.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
    val joined = db
      .join(broadcast(c2), Seq("w1", "w2"), "left")
      .join(broadcast(c1.select(col("t").as("w1"), col("c1").as("c1w1"))),
        Seq("w1"), "left")
      .join(broadcast(c1.select(col("t").as("w2"), col("c1").as("c1w2"))),
        Seq("w2"), "left")
      .crossJoin(broadcast(stats))
    val pBg = when(col("c1w1").isNotNull && col("c2").isNotNull,
      col("c2").cast("double") / col("c1w1")).otherwise(lit(0.0))
    val pUni = (coalesce(col("c1w2"), lit(0L)) + lit(1L)).cast("double") /
      (col("n_tok") + col("v") + lit(1L))
    joined
      .select(col("doc_id"), col("n"),
        log(lit(lambda) * pBg + lit(1 - lambda) * pUni).as("logp"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"),
        (-sum(col("n") * col("logp")) / sum(col("n")))
          .as("cross_entropy"))
      .withColumn("ppl", exp(col("cross_entropy")))
  }

  /** Kneser-Ney absolute discount (q111): the standard 0.75 of the
    * Chen & Goodman study — fixed, not estimated, so both engines
    * evaluate the identical closed form. */
  val KnDiscount = 0.75

  /** Interpolated Kneser-Ney bigram LM self-scoring (q111): train the
    * KN-smoothed bigram model ON the corpus itself and score each
    * document's average bigram negative log-likelihood — the
    * smoothing KenLM (and therefore the CCNet/CC-Net-style filter
    * stack) actually ships, where [[targetLmScore]] (q97) is the
    * simpler MLE+unigram interpolation against a TARGET domain:
    *
    *   P(v|u) = max(c(u,v) − D, 0)/c(u) + (D·N₁₊(u,·)/c(u)) · P_cont(v)
    *   P_cont(v) = N₁₊(·,v) / |{distinct bigrams}|
    *
    * Continuation probability replaces raw unigram frequency — the
    * fix for the "San Francisco" pathology (frequent-but-one-context
    * words stop leaking probability into unseen contexts). Every
    * observed bigram has P > 0 (c(u,v) ≥ 1 and both terms are
    * nonnegative), and self-scoring only evaluates observed bigrams.
    *
    * Scale design (100 TB): the raw token stream never shuffles —
    * per-doc bigram counts come from the row-local
    * [[org.apache.spark.sql.graft.WordShingles]] +
    * [[org.apache.spark.sql.graft.TokenCounts]] kernels, so the ONE
    * corpus-sized exchange carries pre-aggregated (doc, bigram, tf)
    * rows. The bigram-TYPE table (vocabulary-compressed, the big LM
    * side) joins back by a co-partitioned shuffle on the bigram key;
    * the context/continuation tables and the scalar type count are
    * vocabulary-bounded and broadcast (same bounded-vocab caveat as
    * the q101 BPE apply — a web-scale tail pushes them to shuffle
    * joins). */
  def knBigramNll(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, TokenCounts, WordShingles}
    val toks = docs.select(col("doc_id"),
      expr(s"regexp_extract_all(lower(text), '$WordPattern', 0)").as("toks"))
    // the per-doc bigram frame feeds the type-table build AND the
    // scoring join — persist it so tokenize+shingle (the expensive
    // row-local kernels) run once, the q107 tf-frame discipline;
    // released by the bench/verify sessions via clearCache
    val bg = toks
      .select(col("doc_id"),
        explode(Bridge.column(TokenCounts(
          WordShingles(Bridge.expression(col("toks")), 2)))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("bigram"),
        col("tc.tf").as("bf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the type table feeds four consumers (context agg, continuation
    // agg, the scalar type count, and the scoring join) — persist it
    // like the dedup hash corpus
    val cb = bg.groupBy(col("bigram")).agg(sum(col("bf")).as("cb"))
      .withColumn("u", expr("split(bigram, ' ')[0]"))
      .withColumn("v", expr("split(bigram, ' ')[1]"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val leftCtx = cb.groupBy(col("u"))
      .agg(sum(col("cb")).as("cu"), count(lit(1)).as("n1u"))
    val rightCont = cb.groupBy(col("v")).agg(count(lit(1)).as("n1v"))
    val types = cb.agg(count(lit(1)).as("n_types"))
    val pKn =
      (greatest(col("cb").cast("double") - lit(KnDiscount), lit(0.0)) /
        col("cu")) +
      ((lit(KnDiscount) * col("n1u") / col("cu")) *
        (col("n1v").cast("double") / col("n_types")))
    // score the bigram-TYPE table first — the broadcast joins touch
    // |types| rows (vocabulary-compressed), not the corpus-sized
    // per-doc rows, and the type frame keeps cb's bigram partitioning
    // so the scoring join back adds no exchange on that side
    val typeScore = cb
      .join(broadcast(leftCtx), "u")
      .join(broadcast(rightCont), "v")
      .crossJoin(broadcast(types))
      .select(col("bigram"), pKn.as("p_kn"))
    bg.join(typeScore, "bigram")
      .groupBy(col("doc_id"))
      .agg(sum(col("bf")).as("n_bigrams"),
        sum(col("bf").cast("double") * -log(col("p_kn"))).as("nll_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("nll_sum") / col("n_bigrams")).as("avg_nll"),
        exp(col("nll_sum") / col("n_bigrams")).as("perplexity"))
  }

  /** Blocklist phrases of the q113 screen — fixture-vocabulary word
    * sequences (in production: the C4 "bad words" list, hundreds of
    * multi-word entries). Substring semantics over the raw text, case
    * sensitive (the fixture is lowercase). */
  val Blocklist: Seq[String] =
    Seq("slow scan", "big table", "merge batch", "vector")

  /** C4-style blocklist screen (q113): per-document occurrence counts
    * of every blocklist phrase and the keep verdict (zero hits).
    * Matching is one codegen'd Aho-Corasick pass per document
    * ([[org.apache.spark.sql.graft.PhraseCounts]]) — occurrence count
    * is independent of blocklist size, where the k×`contains`
    * formulation rescans the text per phrase. Overlapping matches
    * count once per match END position (the automaton's native
    * semantics, mirrored by the oracle's start-position count — equal
    * totals).
    *
    * Scale design (100 TB): zero shuffle — the automaton ships to
    * executors as a plan constant (like the PQ codebooks) and every
    * output column is row-local arithmetic on the counts array. */
  def blocklistScreen(docs: DataFrame,
      phrases: Seq[String] = Blocklist): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, PhraseCounts}
    docs
      .select(col("doc_id"),
        Bridge.column(PhraseCounts(Bridge.expression(col("text")), phrases))
          .as("pc"))
      .select(col("doc_id"),
        expr("aggregate(pc, CAST(0 AS BIGINT), (acc, x) -> acc + x)")
          .as("total_hits"),
        expr("size(filter(pc, x -> x > 0))").cast("long").as("n_phrases"))
      .withColumn("keep", col("total_hits") === lit(0L))
  }

  /** Gopher repetition thresholds (Rae et al. 2021, Table A1): a
    * document is rejected when the most-frequent n-gram's character
    * mass (n = 2,3,4) or the beyond-first-occurrence duplicate
    * n-gram character mass (n = 5..10) exceeds these fractions of
    * the document's characters. */
  val RepTopThresholds: Seq[(Int, Double)] =
    Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val RepDupThresholds: Seq[(Int, Double)] =
    Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** The FULL Gopher repetition battery (q117) — the nine n-gram
    * character-mass signals of the published pretraining filter,
    * complementing q41's run/top-word/distinct-2-gram rules:
    * top-{2,3,4}-gram char fraction (most frequent gram's tf·len
    * over total chars) and dup-{5..10}-gram char fraction
    * (Σ_{tf≥2}(tf−1)·len over total chars), with the keep verdict
    * under the Table-A1 thresholds.
    *
    * Scale design: zero shuffle — all nine masses come from one
    * codegen'd sort+RLE kernel pass per n over the row-local token
    * array ([[org.apache.spark.sql.graft.GramMass]]); fractions are
    * integer-mass / integer-chars double divisions (deterministic in
    * both engines, no FP mirror risk). */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, RepMasses}
    val base = docs
      .select(col("doc_id"),
        expr(s"regexp_extract_all(lower(text), '$WordPattern', 0)")
          .as("toks"))
      .withColumn("total_chars",
        length(array_join(col("toks"), " ")).cast("long"))
      // ALL nine masses from one fused kernel evaluation — the token
      // array feeds every n exactly once by construction
      .withColumn("masses", Bridge.column(RepMasses(
        Bridge.expression(col("toks")),
        RepTopThresholds.map(_._1), RepDupThresholds.map(_._1))))
    def frac(mass: Column): Column =
      when(col("total_chars") === 0L, lit(0.0))
        .otherwise(mass.cast("double") / col("total_chars"))
    val fracCols =
      RepTopThresholds.zipWithIndex.map { case ((n, _), i) =>
        frac(element_at(col("masses"), i + 1)).as(s"top${n}_frac")
      } ++
      RepDupThresholds.zipWithIndex.map { case ((n, _), i) =>
        frac(element_at(col("masses"), RepTopThresholds.size + i + 1))
          .as(s"dup${n}_frac")
      }
    val scored = base.select(
      col("doc_id") +: col("total_chars") +: fracCols: _*)
    val keep = (
      RepTopThresholds.map { case (n, t) => col(s"top${n}_frac") <= t } ++
      RepDupThresholds.map { case (n, t) => col(s"dup${n}_frac") <= t })
      .reduce(_ && _)
    scored.withColumn("kept", keep)
  }

  /** Labeled training sources of the model-based quality filter
    * (q107): the positive list stands in for a curated reference
    * corpus (WebText/Wikipedia in the GPT-3/LLaMA recipes), the
    * negative list for raw-crawl rejects. Disjoint, and together a
    * small fraction of the corpus — the regime the broadcast model
    * table assumes. */
  val NbPosSources = Seq("src0", "src1", "src2")
  val NbNegSources = Seq("src17", "src18", "src19")

  /** Model-based quality filtering (q107): train a multinomial Naive
    * Bayes classifier on labeled positive/negative document sets,
    * then score EVERY document — the fastText-style quality
    * classifier step of the GPT-3/CCNet/LLaMA pretraining recipes
    * (train on curated-vs-crawl labels, keep documents the model
    * scores as curated-like). Laplace-smoothed per-class term
    * likelihoods over the training vocabulary V:
    *
    *   margin(d) = ln(N⁺/N) − ln(N⁻/N)
    *             + Σ_t tf_d(t) · [ln p̂⁺(t) − ln p̂⁻(t)]
    *   p̂ᶜ(t)    = (countᶜ(t) + 1) / (totalᶜ + |V|)
    *
    * with terms unseen in training falling to the smoothed floor
    * 1/(totalᶜ + |V|) of each class. keep = margin > 0. Unlike the
    * hashed-bucket log-ratio of
    * [[graft.operators.Sampling.importanceWeights]] (a one-sided
    * importance proxy), this is the two-class calibrated classifier:
    * explicit vocabulary, class priors, and a decision threshold.
    *
    * Scale design (100 TB): the model is bounded by the TRAINING
    * corpus (vocab of the labeled sets — curated references are ≪
    * corpus), so the (term → log-likelihood-diff) table broadcasts;
    * the corpus side tokenizes row-locally, reduces to per-doc term
    * counts map-side, joins the broadcast model without moving, and
    * sums once per doc. The raw token stream crosses one exchange
    * (the per-doc tf combine), same as the TF-IDF scan. If a labeled
    * set ever pushes |V| past broadcast size, the model join falls
    * back to a shuffle hash join on `term` — the q101 vocab
    * contract — with no semantic change. */
  def nbQualityFilter(docs: DataFrame,
      posSources: Seq[String] = NbPosSources,
      negSources: Seq[String] = NbNegSources): DataFrame =
    nbQualityFilterWithHandle(docs, posSources, negSources)._1

  /** [[nbQualityFilter]] plus the [[graft.util.CacheHandle]] releasing
    * the persisted per-doc term-count frame. The persist is
    * PLAN-bearing: tf feeds the vocabulary stats, the model, the OOV
    * floor AND the scoring join, and without it each broadcast
    * subquery re-tokenizes and re-shuffles the whole corpus —
    * PlanAuditSpec pins the bounded exchange count this cache buys. */
  def nbQualityFilterWithHandle(docs: DataFrame,
      posSources: Seq[String] = NbPosSources,
      negSources: Seq[String] = NbNegSources)
      : (DataFrame, graft.util.CacheHandle) = {
    val label = when(col("source").isInCollection(posSources), lit(1))
      .when(col("source").isInCollection(negSources), lit(0))
      .otherwise(lit(null))
    val tf = docs
      .select(col("doc_id"), label.as("label"),
        explode(expr(
          s"regexp_extract_all(lower(text), '$WordPattern', 0)"))
          .as("term"))
      .groupBy(col("doc_id"), col("label"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vstat = tf.filter(col("label").isNotNull)
      .groupBy(col("term"))
      .agg(sum(when(col("label") === 1, col("tf")).otherwise(0L))
          .cast("long").as("n_pos"),
        sum(when(col("label") === 0, col("tf")).otherwise(0L))
          .cast("long").as("n_neg"))
    val tot = vstat.agg(sum(col("n_pos")).cast("long").as("tot_pos"),
      sum(col("n_neg")).cast("long").as("tot_neg"),
      count(lit(1)).cast("long").as("v"))
    val pri = docs.select(label.as("label")).filter(col("label").isNotNull)
      .agg((log(sum(when(col("label") === 1, 1).otherwise(0))
          .cast("double") / count(lit(1))) -
        log(sum(when(col("label") === 0, 1).otherwise(0))
          .cast("double") / count(lit(1)))).as("prior_diff"))
    // (term → Δ log-likelihood): |V| rows — the broadcast model
    val model = vstat.crossJoin(broadcast(tot))
      .select(col("term"),
        (log((col("n_pos") + lit(1)).cast("double") /
            (col("tot_pos") + col("v"))) -
          log((col("n_neg") + lit(1)).cast("double") /
            (col("tot_neg") + col("v")))).as("lpdiff"))
    // smoothed floor for out-of-vocabulary terms, one row
    val dflt = tot.select(
      (log(lit(1.0) / (col("tot_pos") + col("v"))) -
        log(lit(1.0) / (col("tot_neg") + col("v")))).as("lpdiff0"))
    val out = tf.join(broadcast(model), Seq("term"), "left")
      .crossJoin(broadcast(dflt))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_tok"),
        sum(col("tf").cast("double") *
          coalesce(col("lpdiff"), col("lpdiff0"))).as("ll_sum"))
      .crossJoin(broadcast(pri))
      .select(col("doc_id"), col("n_tok"),
        (col("prior_diff") + col("ll_sum")).as("margin"),
        (col("prior_diff") + col("ll_sum") > 0).as("keep"))
    (out, graft.util.CacheHandle(tf))
  }

  /** Calibration bins of [[nbCalibration]] (q151). */
  val CalibrationBins = 10

  /** Classifier calibration / reliability table (q151) — the ML-eval
    * step after ANY scored gate (q107/q97/q118): the labeled
    * documents ranked by classifier margin, cut into
    * [[CalibrationBins]] equal-count bins, each reporting its
    * positive fraction against its margin range — the reliability
    * diagram that tells you whether margin 2.0 actually MEANS
    * "mostly curated" before you pick a keep threshold (in-sample
    * here; production holds out a split via q32). A well-ordered
    * classifier shows frac_pos rising monotonically with the bin.
    *
    * Determinism: margins are the q107 hash-graded doubles
    * (bit-identical in both engines), so the ntile order (margin,
    * doc_id) matches exactly; everything after is exact counts and
    * one fixed-order division.
    *
    * Scale design (100 TB): scoring is q107's plan; the calibration
    * frame is the LABELED subset (training-corpus-bounded — ≪
    * corpus by the broadcast-model contract), so the single ntile
    * window is labeled-set-bounded, never corpus-sized; the output
    * is [[CalibrationBins]] rows. */
  def nbCalibration(docs: DataFrame,
      bins: Int = CalibrationBins): DataFrame = {
    val (scored, handle) = nbQualityFilterWithHandle(docs)
    val lbl = docs.select(col("doc_id"),
        when(col("source").isInCollection(NbPosSources), lit(1L))
          .when(col("source").isInCollection(NbNegSources), lit(0L))
          .as("label"))
      .filter(col("label").isNotNull)
    val out = scored.join(lbl, "doc_id")
      .withColumn("bin", ntile(bins).over(
        Window.orderBy(col("margin").asc, col("doc_id").asc))
        .cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("label")).as("n_pos"),
        min(col("margin")).as("min_margin"),
        max(col("margin")).as("max_margin"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_docs")).as("frac_pos"),
        col("min_margin"), col("max_margin"))
      .localCheckpoint()
    handle.release()
    out
  }

  /** The trained NB model exported for SERVING: the (term → Δlogp)
    * table as a driver map plus the OOV floor and prior scalars. A
    * quality-classifier model is TRAINING-corpus-bounded by
    * construction (the codebook contract), so collecting it is the
    * same bounded bring-to-driver as the IVF centroids — production
    * ships exactly this object to the scoring tier. */
  final case class NbModel(lpdiff: Map[String, Double],
      lpdiff0: Double, priorDiff: Double)

  /** Train on the labeled sources and export the [[NbModel]] —
    * the train-offline half of the train-offline/serve-online split
    * ([[graft.streaming.StreamingQuality.nbScore]] is the serve
    * half). Distributed training (one tf exchange, |V|-bounded
    * stats), bounded collect of the finished model only. */
  def trainNbModel(docs: DataFrame,
      posSources: Seq[String] = NbPosSources,
      negSources: Seq[String] = NbNegSources): NbModel = {
    val label = when(col("source").isInCollection(posSources), lit(1))
      .when(col("source").isInCollection(negSources), lit(0))
      .otherwise(lit(null))
    val tf = docs
      .select(col("doc_id"), label.as("label"),
        explode(expr(
          s"regexp_extract_all(lower(text), '$WordPattern', 0)"))
          .as("term"))
      .filter(col("label").isNotNull)
      .groupBy(col("doc_id"), col("label"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val vstat = tf.groupBy(col("term"))
        .agg(sum(when(col("label") === 1, col("tf")).otherwise(0L))
            .cast("long").as("n_pos"),
          sum(when(col("label") === 0, col("tf")).otherwise(0L))
            .cast("long").as("n_neg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val Array(totPos, totNeg, v) = vstat
        .agg(sum(col("n_pos")).cast("long"), sum(col("n_neg")).cast("long"),
          count(lit(1)).cast("long"))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      val lp = vstat.select(col("term"),
          (log((col("n_pos") + lit(1)).cast("double") / (lit(totPos) + lit(v))) -
            log((col("n_neg") + lit(1)).cast("double") / (lit(totNeg) + lit(v))))
            .as("lpdiff"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      vstat.unpersist()
      val Array(nPos, nTrain) = docs.select(label.as("label"))
        .filter(col("label").isNotNull)
        .agg(sum(when(col("label") === 1, 1).otherwise(0)).cast("long"),
          count(lit(1)).cast("long"))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      NbModel(lp,
        math.log(1.0 / (totPos + v)) - math.log(1.0 / (totNeg + v)),
        math.log(nPos.toDouble / nTrain) -
          math.log((nTrain - nPos).toDouble / nTrain))
    } finally tf.unpersist()
  }

  /** PMI collocation constants (q128): the count floor applied BEFORE
    * scoring (PMI is notoriously unstable at small counts — a
    * hapax pair maximizes it — so every published collocation recipe
    * floors the pair count first), and the global top-k kept. */
  val PmiMinCount = 8L
  val PmiTopK = 50

  /** PMI collocation mining (q128) — the corpus-level ASSOCIATION
    * table (Church & Hanks 1990): for every adjacent word pair with
    * count ≥ `minCount`,
    *
    *   pmi(u,v) = ln( p(u,v) / (p(u)·p(v)) )
    *            = ln( (c(u,v)·N·N) / (N₂·c(u)·c(v)) )
    *
    * with N = total token occurrences and N₂ = total bigram
    * occurrences; the global top-k by PMI is the collocation
    * lexicon. In a curation stack this is the phrase-vocabulary
    * builder (tokenizer pre-merges, boilerplate-phrase discovery,
    * blocklist candidate mining for q113) — the corpus-wide statistic
    * the per-doc repetition family (q41/q117) cannot see.
    *
    * Scale design (100 TB): the raw token stream never shuffles —
    * per-doc (bigram, tf) and (term, tf) pairs come from the
    * row-local [[org.apache.spark.sql.graft.WordShingles]] +
    * [[org.apache.spark.sql.graft.TokenCounts]] kernels, so the two
    * corpus-sized exchanges carry pre-aggregated counts
    * (vocabulary-compressed on arrival, map-side combined). The
    * count floor is applied to the bigram-TYPE table before any
    * join; the unigram table is vocabulary-bounded and broadcast
    * twice (the q101/q111 bounded-vocab caveat applies — a web-scale
    * tail pushes those to shuffle joins); N and N₂ ride
    * broadcast-scalar rows. The final top-k routes through the
    * [[org.apache.spark.sql.graft.TopKPerGroup]] heaps under a
    * constant group — ≤ k rows per partition cross the last
    * exchange, the scored type table is never sorted. Both engines
    * evaluate the identical ln operand chain, so the graded compare
    * hash-matches bit-for-bit (the q33 tf·ln precedent). */
  def pmiCollocations(docs: DataFrame, minCount: Long = PmiMinCount,
      topK: Int = PmiTopK): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, TokenCounts, WordShingles}
    val toks = docs.select(col("doc_id"),
      expr(s"regexp_extract_all(lower(text), '$WordPattern', 0)")
        .as("toks"))
    // both TYPE tables are vocabulary-bounded and feed two consumers
    // each (the scalar total + the scoring frame) — persist them so
    // the corpus tokenize pass runs exactly once per table (the q111
    // discipline; released by bench/verify via clearCache)
    val cb = toks
      .select(explode(Bridge.column(TokenCounts(
        WordShingles(Bridge.expression(col("toks")), 2)))).as("tc"))
      .groupBy(col("tc.term").as("bigram"))
      .agg(sum(col("tc.tf")).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cu = toks
      .select(explode(Bridge.column(TokenCounts(
        Bridge.expression(col("toks"))))).as("tc"))
      .groupBy(col("tc.term").as("term"))
      .agg(sum(col("tc.tf")).as("cu"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTok = cu.agg(sum(col("cu")).as("n_tok"))
    val nBg = cb.agg(sum(col("cb")).as("n_bg"))
    val scored = cb.filter(col("cb") >= minCount)
      .withColumn("w1", expr("split(bigram, ' ')[0]"))
      .withColumn("w2", expr("split(bigram, ' ')[1]"))
      .join(broadcast(cu.select(col("term").as("w1"),
        col("cu").as("cu1"))), Seq("w1"))
      .join(broadcast(cu.select(col("term").as("w2"),
        col("cu").as("cu2"))), Seq("w2"))
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nBg))
      .withColumn("pmi",
        log((col("cb").cast("double") * col("n_tok") * col("n_tok")) /
          (col("n_bg").cast("double") * col("cu1") * col("cu2"))))
    val extensionsActive = docs.sparkSession.sessionState.planner
      .extraPlanningStrategies
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.TopKStrategy.type])
    val ranked =
      if (extensionsActive)
        org.apache.spark.sql.graft.TopK.perGroup(
          scored.withColumn("g", lit(0)), Seq("g"),
          Seq("pmi" -> false, "w1" -> true, "w2" -> true), topK).drop("g")
      else scored
        .withColumn("rank", row_number().over(
          Window.orderBy(col("pmi").desc, col("w1").asc, col("w2").asc))
          .cast("long"))
        .filter(col("rank") <= topK)
    ranked.select(col("w1"), col("w2"), col("cb"), col("cu1"),
      col("cu2"), col("pmi"), col("rank"))
  }

  /** C4 line-cleaning constants (q129): synthetic line width (the
    * fixture corpus has no line structure — the q44/q126 derivation
    * precedent), the published C4 minimum words-per-line (5) and
    * minimum retained lines per page (3). */
  val C4LineWords = 7
  val C4MinLineWords = 5
  val C4MinKeptLines = 3

  /** C4-style LINE-level cleaning (q129; Raffel et al. 2020 §2.2) —
    * the rule set the C4 corpus was actually built with, operating a
    * level BELOW the q94 document gates: keep only lines that end in
    * terminal punctuation, have ≥ [[C4MinLineWords]] words and do not
    * mention javascript; drop the whole page when it contains
    * "lorem ipsum" or "{" or retains fewer than [[C4MinKeptLines]]
    * lines; REBUILD the page text from the surviving lines. Emits one
    * row per document: line counts, the page verdict, and the cleaned
    * text.
    *
    * Line structure is derived deterministically from the fixture's
    * token stream (width-[[C4LineWords]] windows; punctuation on
    * lines with (doc_id+i) % 3 ≠ 0; a javascript mention on
    * (doc_id+i) % 7 = 2; "lorem ipsum" on line 0 of doc_id % 17 = 0;
    * a "{" on line 1 of doc_id % 13 = 0) — the q44 synthetic-PII
    * pattern: the DERIVATION is fixture plumbing, the RULES and the
    * rebuild are the operator.
    *
    * Scale design (100 TB): entirely row-local — one pruned scan,
    * every rule a higher-order expression over the row's own line
    * array, zero shuffle, composes into the q36 funnel scan. */
  def c4LineClean(docs: DataFrame): DataFrame = {
    val w = C4LineWords
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n_lines", expr(s"CAST((size(w) + ${w - 1}) DIV $w AS BIGINT)"))
      .withColumn("lines", expr(
        s"""transform(sequence(0, CAST(n_lines AS INT) - 1), i ->
           |  concat(array_join(slice(w, $w * i + 1, $w), ' '),
           |    CASE WHEN doc_id % 17 = 0 AND i = 0 THEN ' lorem ipsum' ELSE '' END,
           |    CASE WHEN doc_id % 13 = 0 AND i = 1 THEN ' {' ELSE '' END,
           |    CASE WHEN (doc_id + i) % 7 = 2 THEN ' javascript' ELSE '' END,
           |    CASE WHEN (doc_id + i) % 3 != 0 THEN '.' ELSE '' END))""".stripMargin))
      .withColumn("kept_lines", expr(
        s"""filter(lines, x ->
           |  substring(x, length(x), 1) IN ('.', '!', '?', '"')
           |  AND size(split(x, ' ')) >= $C4MinLineWords
           |  AND NOT contains(x, 'javascript'))""".stripMargin))
      .withColumn("full_text", array_join(col("lines"), "\n"))
      .select(
        col("doc_id"), col("n_lines"),
        size(col("kept_lines")).cast("long").as("n_kept"),
        (!col("full_text").contains("lorem ipsum") &&
          !col("full_text").contains("{") &&
          size(col("kept_lines")) >= C4MinKeptLines).as("kept"),
        array_join(col("kept_lines"), "\n").as("clean_text"))
  }

  /** Source-concentration profile with HHI (q169) — the
    * mix-dominance diagnostic read before training on a multi-source
    * corpus (an HHI near 1 means one crawl IS the dataset, whatever
    * the source count; the antitrust statistic applied to data
    * mixing, and the scalar the q110/q49 mixers move): per source
    * its exact token estimate and share, plus HHI = Σ shareᵢ².
    * Token counts are exact integers; shares are fixed-order
    * ratios; the cross-source Σ share² folds SEQUENTIALLY in
    * ascending source order (the q103/q136 ordered-fold pattern —
    * a data-dependent aggregate over source rows would sum doubles
    * in partition order) — bit-identical, no rounding.
    *
    * Scale design: one map-side-combined source aggregation;
    * everything after runs on the source-count-bounded frame. */
  def sourceConcentration(docs: DataFrame): DataFrame = {
    val bySrc = docs.groupBy(col("source"))
      .agg(sum(ceil(length(col("text")) / 4.0).cast("long"))
        .as("tokens"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val withTot = bySrc
      .withColumn("total", sum(col("tokens")).over(all))
      .withColumn("share",
        col("tokens").cast("double") / col("total"))
    val hhiRow = withTot
      .agg(sort_array(collect_list(
        struct(col("source"), col("share")))).as("a"))
      .select(aggregate(col("a"), lit(0.0),
        (acc, s) => acc + s.getField("share") * s.getField("share"))
        .as("hhi"))
    withTot.crossJoin(broadcast(hhiRow))
      .select(col("source"), col("tokens"), col("share"), col("hhi"))
  }

  /** Vocabulary-growth buckets of [[vocabGrowth]] (q135). */
  val VocabGrowthBuckets = 10

  /** Heaps-law vocabulary growth profile (q135) — the corpus-scaling
    * statistic behind tokenizer sizing and dedup budgeting: for each
    * prefix of the corpus (doc_id order, [[VocabGrowthBuckets]]
    * equal-count buckets), the number of NEW word types first seen in
    * that bucket and the cumulative vocabulary size. Sub-linear
    * growth (Heaps' law V ≈ k·nᵝ, β < 1) is what makes the q100/q101
    * bounded-vocabulary assumption tenable; a near-linear curve is
    * the alarm that the corpus is ID-heavy (URLs, hashes) and the
    * vocab tables will not broadcast.
    *
    * Scale design (100 TB): a type's first occurrence is
    * min(doc_id) per token — ONE map-side-combined shuffle on the
    * token key (the raw token stream never shuffles positionally);
    * bucket assignment comes from the q57 prefix-sum
    * [[GlobalIndex]] (no single-reducer row_number over the corpus —
    * the oracle's row_number states the same total order); the
    * first-occurrence frame joins the doc→bucket map on doc_id
    * (vocab-sized vs corpus-sized, plain hash join); the final
    * running sums run over [[VocabGrowthBuckets]] rows — a
    * constant-size window, not a data-sized one. */
  def vocabGrowth(docs: DataFrame,
      buckets: Int = VocabGrowthBuckets): DataFrame = {
    val (idx, handle) = GlobalIndex.globalRowIndexWithHandle(
      docs.select(col("doc_id")), Seq(col("doc_id")),
      GlobalIndex.Q57Partitions)
    val nRow = broadcast(docs.agg(count(lit(1)).as("n")))
    val db = idx.crossJoin(nRow)
      .select(col("doc_id"),
        (expr(s"(global_idx * $buckets) DIV n") + 1).as("bucket"))
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    val ft = tok.groupBy(col("token"))
      .agg(min(col("doc_id")).as("first_doc"))
    val nt = ft.join(db.select(col("doc_id").as("first_doc"),
        col("bucket")), "first_doc")
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
    val nd = db.groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
    val cum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = nd.join(nt, Seq("bucket"), "left")
      .select(col("bucket"),
        sum(col("n_docs")).over(cum).as("cum_docs"),
        coalesce(col("new_types"), lit(0L)).as("new_types"),
        sum(coalesce(col("new_types"), lit(0L))).over(cum)
          .as("vocab_size"))
      .localCheckpoint()
    handle.release()
    out
  }

  /** Normalization-unlocked exact dedup (q175) — the canonicalization
    * step most pipelines run BEFORE content hashing: lowercase, strip
    * non-alphanumerics, collapse whitespace, then compare the exact-
    * dup structure under raw vs normalized digests. `unlocked` flags
    * the documents that only become duplicates after normalization —
    * the casing/punctuation near-exact class that raw hashing misses
    * (CCNet/C4 both normalize before their hash for this reason).
    *
    * Scale design: normalization is row-local (codegen'd string
    * expressions), and only the two 32-byte digests shuffle — each
    * min-id canonical is one hash-keyed window over (id, digest),
    * never the text; the same single-shuffle shape as q4's exact
    * dedup, run under two keys. */
  def normalizedDedup(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(regexp_replace(lower(col("text")),
      "[^a-z0-9 ]", ""), " +", " "))
    val wRaw = Window.partitionBy(col("raw_hash"))
    val wNorm = Window.partitionBy(col("norm_hash"))
    docs.select(col("doc_id"),
        md5(col("text")).as("raw_hash"), md5(norm).as("norm_hash"),
        (col("text") =!= norm).as("changed"))
      .withColumn("dup_raw", col("doc_id") =!= min(col("doc_id")).over(wRaw))
      .withColumn("dup_norm",
        col("doc_id") =!= min(col("doc_id")).over(wNorm))
      .withColumn("unlocked", col("dup_norm") && !col("dup_raw"))
      .select(col("doc_id"), col("changed"), col("dup_raw"),
        col("dup_norm"), col("unlocked"))
  }

  /** Coverage grid of [[vocabCoverage]] (q176). */
  val CoverageKs = Seq(10, 100, 1000)

  /** Vocabulary coverage / OOV-rate curve (q176) — the tokenizer-
    * budget diagnostic: for each candidate vocabulary size k, the
    * share of token OCCURRENCES covered by the k most frequent types
    * (1 − coverage is the OOV rate a closed vocabulary of that size
    * would suffer). The q135 Heaps curve says how fast types grow;
    * this says what a budget BUYS — the pair every tokenizer-size
    * decision reads.
    *
    * Scale design: one map-side-combined type-count exchange (the
    * corpus collapses to its vocabulary before anything else), then
    * the top-max(ks) pick through [[globalTopK]]'s bounded
    * per-partition heaps — the type vocabulary is CORPUS-sized under
    * Heaps growth (the hazard q135 measures), so it is never
    * single-partition ranked — one constant-size total over the
    * cached type table, and one k-keyed aggregation of
    * max(ks)·|ks| skinny rows. */
  def vocabCoverage(docs: DataFrame,
      ks: Seq[Int] = CoverageKs): DataFrame =
    vocabCoverageWithHandle(docs, ks)._1

  /** [[vocabCoverage]] plus the [[graft.util.CacheHandle]] releasing
    * the persisted type-frequency table (read twice: once for the
    * corpus-wide token total, once for the top-max(ks) heap pick —
    * without the persist each branch re-tokenizes the corpus). */
  def vocabCoverageWithHandle(docs: DataFrame,
      ks: Seq[Int] = CoverageKs)
      : (DataFrame, graft.util.CacheHandle) = {
    import docs.sparkSession.implicits._
    val types = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = types.agg(sum(col("cnt")).as("total_tokens"))
    // only ranks <= max(ks) are ever consumed: the heap pick bounds
    // the ranked frame at max(ks) rows, never the full vocabulary
    val top = globalTopK(types,
      Seq("cnt" -> false, "word" -> true), ks.max)
    val out = top.crossJoin(broadcast(ks.map(_.toLong).toDF("k")))
      .groupBy(col("k"))
      .agg(sum(when(col("rank") <= col("k"), 1L).otherwise(0L))
          .as("n_types_kept"),
        sum(when(col("rank") <= col("k"), col("cnt")).otherwise(0L))
          .as("covered_tokens"))
      .crossJoin(broadcast(totals))
      .withColumn("coverage", col("covered_tokens").cast("double") /
        col("total_tokens").cast("double"))
    (out, graft.util.CacheHandle(types))
  }

  /** Graded Unicode script-mix profile + confusable detection
    * (q334, r17) — the curation gates a multilingual crawl needs:
    * per-script character census (real codepoint-range
    * classification: Basic Latin letters, Cyrillic U+0400–04FF,
    * Greek U+0370–03FF, CJK U+4E00–9FFF), dominant script with
    * fixed tie precedence, and MIXED-SCRIPT word detection — a word
    * carrying both Latin and Cyrillic letters is the classic
    * homoglyph-spoof shape (the ICU "spoof checker" signal) and a
    * strong junk/adversarial-content flag.
    *
    * The corpus is ASCII, so the fixture TRANSLITERATES
    * deterministically (the codec-family synthesis pattern): word j
    * of doc d maps to script (d+j)%4, except every (d+j)%13==0 word
    * interleaves Cyrillic at even letter positions with Latin at odd
    * — a synthesized confusable. The CLASSIFIER sees only the
    * transliterated string; the oracle recomputes the census from
    * the synthesis arithmetic, so a wrong range boundary or a missed
    * mixed word flips a count. Row-local, zero shuffle. */
  def scriptMixProfile(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // synthesis: deterministic per-word transliteration
        val words = text.split(" ", -1)
        val sb = new StringBuilder
        words.zipWithIndex.foreach { case (w0, j) =>
          if (j > 0) sb.append(' ')
          val mixed = (id + j) % 13 == 0
          val script = ((id + j) % 4).toInt
          var li = 0
          w0.foreach { c =>
            if (c >= 'a' && c <= 'z') {
              val k = c - 'a'
              val out: Char =
                if (mixed) {
                  if (li % 2 == 0) (0x0430 + k).toChar else c
                } else script match {
                  case 0 => c
                  case 1 => (0x0430 + k).toChar
                  case 2 => (0x03B1 + k).toChar
                  case _ => (0x4E00 + k).toChar
                }
              sb.append(out); li += 1
            } else sb.append(c)
          }
        }
        val t = sb.toString
        // the operator: real codepoint-range classification
        def scriptOf(c: Char): Int =
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) 0
          else if (c >= 0x0400 && c <= 0x04FF) 1
          else if (c >= 0x0370 && c <= 0x03FF) 2
          else if (c >= 0x4E00 && c <= 0x9FFF) 3
          else 4
        var nLat = 0L; var nCyr = 0L; var nGrk = 0L; var nCjk = 0L
        var nCommon = 0L
        t.foreach { c =>
          scriptOf(c) match {
            case 0 => nLat += 1
            case 1 => nCyr += 1
            case 2 => nGrk += 1
            case 3 => nCjk += 1
            case _ => nCommon += 1
          }
        }
        val nMixed = t.split(" ", -1).count { w =>
          w.exists(scriptOf(_) == 0) && w.exists(scriptOf(_) == 1)
        }.toLong
        val dominant = Seq("latin" -> nLat, "cyrillic" -> nCyr,
          "greek" -> nGrk, "cjk" -> nCjk).maxBy(_._2)._1
        (id, nLat, nCyr, nGrk, nCjk, nCommon, dominant, nMixed,
          nMixed > 0)
      }
      .toDF("doc_id", "n_latin", "n_cyrillic", "n_greek", "n_cjk",
        "n_common", "dominant_script", "n_mixed_words",
        "spoof_suspect")
  }

  /** Graded Unicode NFC normalization census (q338, r17) — the
    * canonicalization step every dedup/quality pipeline needs before
    * hashing text (the same logical string can arrive composed
    * U+00E9 or decomposed e+U+0301; unnormalized corpora hash-split
    * identical documents). The ASCII corpus is salted with
    * DETERMINISTIC decomposed sequences (word j of doc d gains a
    * trailing e+COMBINING-ACUTE when (d+j)%5==0 and a leading
    * a+COMBINING-GRAVE when (d+j)%7==0); the operator runs the REAL
    * normalizer (java.text.Normalizer NFC) and the oracle runs
    * DuckDB's OWN nfc_normalize over the identically-synthesized
    * string — two independent UAX #15 implementations must agree on
    * the digest, the post-NFC length, and the composed-pair count.
    * Row-local, zero shuffle. */
  def nfcNormalizeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(" ", -1)
        val salted = words.zipWithIndex.map { case (w, j) =>
          val suffix = // DECOMPOSED e + U+0301 (combining acute)
            if ((id + j) % 5 == 0) "e\u0301" else ""
          val prefix = // DECOMPOSED a + U+0300 (combining grave)
            if ((id + j) % 7 == 0) "a\u0300" else ""
          prefix + w + suffix
        }.mkString(" ")
        val norm = java.text.Normalizer.normalize(
          salted, java.text.Normalizer.Form.NFC)
        (id, salted.length.toLong, norm.length.toLong,
          (salted.length - norm.length).toLong, norm)
      }
      .toDF("doc_id", "n_before", "n_after", "n_composed", "t")
      .select(col("doc_id"), col("n_before"), col("n_after"),
        col("n_composed"), md5(col("t")).as("norm_md5"))
  }
}
