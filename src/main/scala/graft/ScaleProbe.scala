package graft

import graft.operators.{Dedup, Similarity, SimilarityParams, Sitemap, TextAnalysis, Warc, WebGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev diagnostic for scale behavior: replicate the documents /
  * embeddings corpus N× in memory (ids re-keyed to stay unique) and
  * measure the LLM-pipeline operators' wall time — evidence that the
  * bucketed designs scale with corpus size, not pair count. Also
  * measures the ANN brute-force vs LSH crossover: brute force costs
  * |Q| dot products per corpus vector while LSH costs a fixed
  * NumPlanes per corpus vector plus a small candidate set per query,
  * so LSH wins once the query batch outgrows ~NumPlanes queries.
  * `runMain graft.ScaleProbe [factor] [sfDir]`.
  *
  * `runMain graft.ScaleProbe --heavy [sfDir] [factors...]` instead
  * runs ONLY the heaviest composites (pipeline funnel, BM25
  * retrieval, hybrid RRF, both CC variants, exact + HLL profile)
  * across a factor
  * LADDER (default 10 50 100), printing a per-operator scaling curve
  * — the evidence that their cost tracks the data ≈-linearly at 100×
  * rather than bending (BASELINE.md records the ladder).
  * `SPARK_GRAFT_HEAVY_STAGES=bm25,funnel` limits the ladder to the
  * named stages (the expensive near-dup pair build is skipped when
  * neither CC stage is selected). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--heavy")) {
      heavyLadder(args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.drop(2).map(_.toInt) match {
          case fs if fs.nonEmpty => fs.toSeq
          case _ => Seq(10, 50, 100)
        })
      return
    }
    if (args.headOption.contains("--skew")) {
      skewProbe(args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).map(_.toInt).getOrElse(50),
        args.lift(3).map(_.toDouble).getOrElse(0.5))
      return
    }
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // documents replicated with perturbed ids; text salted per copy so
    // replicas are NOT trivial duplicates of each other (that would
    // measure the dup-explosion regime, not the scaling regime)
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val n0 = docs0.count()
    val copies = spark.range(factor).select(col("id").as("copy"))
    val docs = docs0.crossJoin(copies)
      .select((col("doc_id") * factor + col("copy")).as("doc_id"),
        concat(col("text"), lit(" copysalt"), col("copy")).as("text"))
      .persist()
    println(s"[scale] documents: $n0 -> ${docs.count()} rows (${factor}x)")

    // embeddings replicated under a per-copy ROTATION of the vector —
    // rotations of random vectors are near-orthogonal, so replicas
    // are NOT near-duplicates of each other (a +epsilon perturbation
    // here made every copy a true near-dup of its siblings and the
    // probe measured the dup-explosion regime: 20 s at 10× where the
    // rotated corpus measures the scaling regime)
    val emb0 = Similarity.embeddings(spark, sfDir)
    val dim = SimilarityParams.Dim
    // rotation offset wraps at dim: factors > dim reuse rotations (those
    // copies become exact duplicates of their mod-dim twin — the probe
    // is meaningful for factor <= dim)
    val rot = col("copy") % dim
    val emb = emb0.crossJoin(copies)
      .select((col("vec_id") * factor + col("copy")).as("vec_id"),
        concat(
          slice(col("v"), rot + 1, lit(dim) - rot),
          slice(col("v"), lit(1), rot)).as("v"))
      .withColumn("norm", sqrt(aggregate(
        transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
      .persist()
    val nVec = emb.count()
    println(s"[scale] embeddings: -> $nVec rows")

    // dev-only stage filter (SPARK_GRAFT_STAGES=exact_substr,...):
    // a single rung can be measured without paying the whole ladder
    val stagesFilter = sys.env.get("SPARK_GRAFT_STAGES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def time(name: String)(df: => DataFrame): Double = {
      if (stagesFilter.exists(!_.contains(name))) return 0.0
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name%-22s $sec%8.2f s")
      // drop the measured operator's internal persists, then restore
      // the two input corpora this probe keeps hot across measurements
      spark.catalog.clearCache()
      docs.persist(); emb.persist()
      docs.count(); emb.count()
      sec
    }

    time("dedup_exact")(Dedup.exactDedup(docs))
    time("dedup_minhash")(Dedup.minhashNearDups(docs))
    time("dedup_winnow")(Dedup.winnowNearDups(docs))
    time("simhash_dups")(TextAnalysis.simhashDups(docs))
    time("text_stats")(TextAnalysis.textStats(docs))
    time("tfidf")(TextAnalysis.tfidfTopTerms(docs))
    time("repetition")(TextAnalysis.repetitionStats(docs))
    time("funnel")(graft.operators.Pipeline.preprocessingFunnel(docs))
    time("dedup_clusters")(Dedup.dedupClusters(
      Dedup.minhashNearDups(docs).select(col("doc_a"), col("doc_b"))))
    // benchmark set scales with the corpus (base ids < 20 across all
    // copies), keeping the broadcast side proportionally sized
    time("contamination")(Dedup.benchmarkContamination(docs,
      benchBelowId = 20L * factor))
    time("dup_spans")(Dedup.duplicatedSpans(docs))
    // log2(k) hash self-joins of the (id, pos, digest) stream — the
    // rung verifies the doubling chain stays linear in corpus size
    time("exact_substr")(
      graft.operators.ExactSubstr.exactSubstrSpans(docs))
    time("heavy_hitters")(TextAnalysis.heavyHitters(docs))
    // round-14 web/storage families: all row-local or
    // bounded-rollup by design — the rung checks the claim
    time("cdc_chunks")(Dedup.cdcChunks(docs))
    time("cdc_dedup")(Dedup.cdcDedupStats(docs))
    time("web_funnel")(Warc.webFunnel(docs))
    time("cdx_index")(Warc.cdxIndex(docs))
    time("crawl_frontier")(Sitemap.crawlFrontier(docs))
    // round-15 additions: gzip-member framing (real compression
    // work per blob), coded HTTP bodies, charset decode, pct/IDN
    // normalization, the two-level sitemap resolve — every kernel
    // row-local (blob assembly is the fixture's groupBy; the READ
    // path is the flatMap), so the rung checks linearity
    time("warcgz_framing")(Warc.warcGzParsed(docs))
    time("warc_gzip_body")(Warc.warcGzipBodies(docs))
    time("warc_chunked")(Warc.warcChunkedBodies(docs))
    time("warc_charset")(Warc.warcIntlParsed(docs))
    time("url_pct")(operators.UrlCanonical.urlPctCanonical(docs))
    time("idn_hosts")(operators.Idn.idnHosts(docs))
    time("sitemap_index")(Sitemap.sitemapIndexResolved(docs))
    time("robots_wildcard")(operators.Robots.robotsWildcardGate(docs))
    // round-16 additions: the composed coding stack and the paired
    // request/response walk (both row-local per record/blob — real
    // gzip+chunk work per row, so the rung checks linearity), the
    // per-paragraph language rollup (two bounded exchanges), the
    // dense/chroma H.264 codecs (row-local bytes->planes), sitemap
    // discovery (dimension-sized hosts — must stay ~flat)
    time("http_coding_stack")(Warc.httpCodingStack(docs))
    time("warc_req_resp")(Warc.warcGzPaired(docs))
    time("code_switching")(TextAnalysis.codeSwitchStats(docs))
    time("h264_dense")(operators.Multimodal.h264DenseDecodeStats(docs))
    time("h264_chroma")(operators.Multimodal.h264ChromaDecodeStats(docs))
    time("sitemap_discovery")(Sitemap.sitemapDiscovery(docs))
    time("link_extract")(WebGraph.linkExtract(docs))
    time("anchor_index")(WebGraph.anchorIndex(docs))
    // round-17 additions: the mid-density H.264 rung (the closed
    // 4<=nC<8 column — per-row codec work like h264_dense), the
    // MIME/GIF/FLAC/ZIP/TAR/TFRecord container+codec walks (all
    // row-local synthesize→encode→walk→decode kernels — the rung
    // checks per-row cost stays flat), script-mix and NFC (row-local
    // char kernels), WordPiece (vocabulary-sized training — must
    // stay ~FLAT in corpus size like BPE: the vocab barely grows
    // under replication), and the sketch aggregation (one exchange
    // of sketch BYTES — near-flat reduce cost)
    time("h264_mid")(operators.Multimodal.h264MidDecodeStats(docs))
    time("mime_parse")(operators.Mail.mimeParse(docs))
    time("gif_decode")(operators.Multimodal.gifDecodeStats(docs))
    time("flac_decode")(operators.Multimodal.flacDecodeStats(docs))
    time("zip_walk")(operators.Multimodal.zipWalkStats(docs))
    time("tar_walk")(operators.Multimodal.tarWalkStats(docs))
    time("tfrecord_walk")(operators.Multimodal.tfrecordWalkStats(docs))
    time("script_mix")(TextAnalysis.scriptMixProfile(docs))
    time("nfc_normalize")(TextAnalysis.nfcNormalizeStats(docs))
    time("wordpiece_train")(operators.WordPiece.mergeTable(spark, docs))
    time("global_index")(operators.GlobalIndex.docGlobalIndex(
      docs.withColumn("n_chars", length(col("text")).cast("long"))))
    // bloom join replicated with re-keyed orderkeys (join selectivity
    // preserved across copies)
    locally {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .crossJoin(copies)
        .select((col("l_orderkey") * factor + col("copy")).as("l_orderkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .crossJoin(copies)
        .select((col("o_orderkey") * factor + col("copy")).as("o_orderkey"),
          col("o_orderpriority"))
      time("bloom_join")(
        graft.operators.RuntimeFilter.bloomJoin(li, orders))
    }
    // exact profile over the replicated fact table (the Expand for
    // five COUNT(DISTINCT)s is the scaling question)
    locally {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .crossJoin(copies)
      time("profile")(graft.operators.Profiling.numericProfile(li))
    }
    // event operators with 10x the user series (user ids re-keyed;
    // per-user span unchanged, so state/grid scale with user count)
    locally {
      val ev = graft.operators.EventsQueries
        .withTsMs(spark.read.parquet(s"$sfDir/events.parquet"))
        .crossJoin(copies)
        .select((col("user_id") * factor + col("copy")).as("user_id"),
          col("event_type"), col("ts_ms"), col("value"))
        .persist()
      ev.count()
      // time()'s clearCache drops ev too — re-warm it before each
      // measurement so the three run against the same cached input
      time("gap_fill")(graft.operators.Profiling.gapFillHourly(ev))
      ev.persist(); ev.count()
      time("event_sequence")(
        graft.operators.EventsQueries.clickToPurchase(ev))
      ev.persist(); ev.count()
      time("cohort_retention")(
        graft.operators.EventsQueries.cohortRetention(ev))
      ev.persist(); ev.count()
      // r17: sketch agg alone (no rank-check join — that re-scans
      // the input by design and would measure the exact pass, not
      // the sketch); per-type sketch bytes are the only exchange
      time("quantile_sketch")(
        graft.operators.RelationalQueries.sketchQuantiles(
          ev.withColumn("event_id", col("user_id"))))
    }
    time("ann_ivf")(Similarity.ivfTopK(emb))
    // fixture banding (8-bit: constant ~2.3% random-pair collision →
    // Θ(n²) candidates) vs corpus-sized banding (w ≈ log₂(n/8): the
    // width a deployment would run at this n — see
    // SimilarityParams.dedupPlanesFor)
    val wideBits = math.max(SimilarityParams.DedupBitsPerBand,
      math.ceil(math.log(nVec / 8.0) / math.log(2.0)).toInt)
    time("dedup_embed(8-bit)")(Similarity.embeddingNearDups(emb))
    time(s"dedup_embed($wideBits-bit)")(
      Similarity.embeddingNearDups(emb, wideBits))

    // custom top-k operator vs the window plan it replaces, same
    // query: top-3 per hash-group by norm desc. The window plan
    // shuffles and sorts every row; the operator's partial heaps send
    // <= k per (partition, group) through the exchange.
    {
      val grouped = emb.select((col("vec_id") % 64).as("g"),
        col("vec_id"), col("norm"))
      val wTopk = time("topk_window") {
        grouped.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
            .orderBy(col("norm").desc, col("vec_id").asc)).cast("long"))
          .filter(col("rank") <= 3)
      }
      val oTopk = time("topk_operator")(
        org.apache.spark.sql.graft.TopK.perGroup(grouped, Seq("g"),
          Seq("norm" -> false, "vec_id" -> true), 3))
      println(f"[scale] topk window $wTopk%.2f s vs operator $oTopk%.2f s")
    }

    // candidates-per-query under the 6×8-bit banding: the number that
    // must stay ≪ |corpus| for the LSH path to be a scale path
    val candPerQuery = Similarity.lshCandidates(emb).count() /
      SimilarityParams.NumQueryVectors.toDouble
    println(f"[scale] lsh candidates/query: $candPerQuery%.0f of $nVec " +
      f"(${100.0 * candPerQuery / nVec}%.1f%%)")
    spark.catalog.clearCache(); docs.persist(); emb.persist()
    docs.count(); emb.count()

    // brute vs LSH crossover: same corpus, growing query batches
    for (q <- Seq(10, 64, 256)) {
      val b = time(s"ann_brute(q=$q)")(Similarity.bruteForceTopK(emb, q))
      val l = time(s"ann_lsh(q=$q)")(Similarity.lshTopK(emb, q))
      println(f"[scale] crossover q=$q: brute $b%.2f s vs lsh $l%.2f s")
    }
    spark.stop()
  }

  /** AQE skew-join vs explicit salting, measured head-to-head on the
    * q25 join shape (orders ⋈ customer on custkey) with a
    * deliberately skewed fact side: `hotFrac` of the replicated
    * orders rows are remapped onto ONE customer key, broadcast
    * disabled so the join must shuffle. Three plans over the same
    * cached inputs:
    *   - aqe_off:   static sort-merge join — the hot key lands on one
    *     reducer (the straggler baseline);
    *   - aqe_skew:  adaptive skew-join splits the oversized partition
    *     at runtime (thresholds lowered so fixture-scale partitions
    *     qualify, as a production config would size them);
    *   - salted:    [[graft.operators.Skew.saltedJoin]], the explicit
    *     (key, salt) construction.
    * Results land in BASELINE.md; the decision rule lives in Skew's
    * scaladoc. `runMain graft.ScaleProbe --skew [sfDir] [factor]
    * [hotFrac]`. */
  private def skewProbe(sfDir: String, factor: Int, hotFrac: Double): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // the dim must SHUFFLE for skew to matter (a broadcastable dim
      // is always the first answer to skew — that case needs neither
      // AQE nor salting)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val copies = spark.range(factor).select(col("id").as("copy"))
    val hotPct = (hotFrac * 100).toInt
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .crossJoin(copies)
      .select(
        // hotFrac of rows collapse onto custkey 1; the rest keep
        // their natural key (deterministic hash split, no RNG)
        when(pmod(hash(col("o_orderkey"), col("copy")), lit(100))
          .lt(hotPct), lit(1L))
          .otherwise(col("o_custkey")).as("custkey"),
        col("o_totalprice"))
      .persist()
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      .persist()
    val nFact = orders.count(); val nDim = customer.count()
    println(s"[skew] fact=$nFact rows (${hotPct}% on one key), dim=$nDim")

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice")).as("sum_price"))

    def measure(name: String, confs: Map[String, String])
        (df: => DataFrame): Double = {
      val prior = confs.keys.map(k =>
        k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[skew] $name%-10s $sec%8.2f s")
        sec
      } finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val plain = () => agg(orders.join(customer, "custkey"))
    val tOff = measure("aqe_off", Map(
      "spark.sql.adaptive.enabled" -> "false"))(plain())
    val tSkew = measure("aqe_skew", Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-scale partitions are MBs, not the 256 MB default
      // threshold — size the knobs to the data, as production would
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2m"))(plain())
    val tSalt = measure("salted", Map(
      "spark.sql.adaptive.enabled" -> "false"))(
      agg(graft.operators.Skew.saltedJoin(orders, customer, "custkey",
        salts = cpus.toInt)))
    println(f"[skew] RESULT factor=${factor}x hot=$hotPct%%: " +
      f"aqe_off $tOff%.2f s | aqe_skew $tSkew%.2f s | salted $tSalt%.2f s")
    spark.stop()
  }

  /** Factor ladder over the heaviest composite queries only:
    * q36 pipeline funnel, q42 frontier-propagation CC, q51
    * large-star/small-star CC, and q61's exact profile next to its
    * HLL-first fallback (same scan, no Expand). Each factor builds a
    * fresh salted corpus (see main), measures, and releases it, so
    * 100× fits in memory without the full battery's working set. */
  private def heavyLadder(sfDir: String, factors: Seq[Int]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb0 = Similarity.embeddings(spark, sfDir)
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(graft.operators.Profiling.ProfileCols.map(col): _*)
    println(f"[scale-heavy] base: docs=${docs0.count()} " +
      f"lineitem=${li0.count()} factors=${factors.mkString(",")}")
    val results = scala.collection.mutable.Map
      .empty[String, List[(Int, Double)]].withDefaultValue(Nil)
    // optional stage subset (comma-separated stage names); unset = all
    val stages = sys.env.get("SPARK_GRAFT_HEAVY_STAGES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(name: String): Boolean = stages.forall(_.contains(name))
    def timeAction(factor: Int, name: String)(body: => Unit): Unit =
      if (wanted(name)) {
        val t0 = System.nanoTime()
        body
        val sec = (System.nanoTime() - t0) / 1e9
        results(name) ::= (factor, sec)
        println(f"[scale-heavy] ${factor}%4dx $name%-18s $sec%8.2f s")
      }
    def time(factor: Int, name: String)(df: => DataFrame): Unit =
      timeAction(factor, name)(
        df.write.format("noop").mode("overwrite").save())
    // embeddings replicated under the per-copy rotation (see main
    // probe: rotations of random vectors are near-orthogonal, so
    // replicas are not near-dups of each other), re-keyed so the
    // doc_id = vec_id alignment survives replication
    def replicatedEmb(factor: Int, copies: DataFrame): DataFrame = {
      val dim = SimilarityParams.Dim
      val rot = col("copy") % dim
      emb0.crossJoin(copies)
        .select((col("vec_id") * factor + col("copy")).as("vec_id"),
          concat(
            slice(col("v"), rot + 1, lit(dim) - rot),
            slice(col("v"), lit(1), rot)).as("v"))
        .withColumn("norm", sqrt(aggregate(
          transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
        // the broadcast crossJoin preserves the parquet read's ONE
        // input partition, so every row-local stage downstream of the
        // replicated corpus was running single-threaded until its
        // first shuffle (measured: the 100× semdedup corpus→cell
        // assignment, n·k·dim multiply-adds, on one core). A 100 TB
        // corpus is never one partition — spread the harness input so
        // the ladder measures the operator, not the harness
        .repartition(col("vec_id"))
    }
    factors.foreach { factor =>
      val copies = spark.range(factor).select(col("id").as("copy"))
      val docs = docs0.crossJoin(copies)
        .select((col("doc_id") * factor + col("copy")).as("doc_id"),
          concat(col("text"), lit(" copysalt"), col("copy")).as("text"),
          col("source"))
        .persist()
      docs.count()
      // row-local rule battery: must be exactly one scan, no shuffle
      time(factor, "quality_filter")(
        graft.operators.TextAnalysis.qualityFilter(docs))
      // bounded-cardinality DSIR selection: two map-side-combined
      // aggregations (≤ B global rows, ≤ B rows per doc) + broadcast
      time(factor, "dsir")(
        graft.operators.Sampling.importanceWeights(docs))
      // per-source union-MinHash: the corpus collapses to S·H rows
      // before any join — the curve must be one linear scan
      time(factor, "source_overlap")(Dedup.sourceSimilarity(docs))
      // NB classifier: training vocab is replication-invariant (the
      // copysalt tokens are the only new terms), so the broadcast
      // model is ~constant and the curve must be the one tf exchange
      if (wanted("nb_quality"))
        time(factor, "nb_quality")(
          graft.operators.TextAnalysis.nbQualityFilter(docs))
      // KN bigram LM self-scoring: the bigram-TYPE table is
      // replication-invariant up to the copysalt tail, so the LM side
      // stays ~constant and the curve must be the two corpus-sized
      // exchanges (type agg + scoring join)
      if (wanted("kn_bigram")) {
        time(factor, "kn_bigram")(
          graft.operators.TextAnalysis.knBigramNll(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // Aho-Corasick blocklist screen: zero shuffle, one codegen'd
      // pass — the curve must be a flat per-row scan cost
      time(factor, "blocklist")(
        graft.operators.TextAnalysis.blocklistScreen(docs))
      // nine-kernel Gopher repetition battery: row-local, must stay
      // a flat per-row scan cost like the blocklist
      time(factor, "rep_signals")(
        graft.operators.TextAnalysis.repetitionSignals(docs))
      // classic 16-permutation vs one-permutation minhash pair build:
      // same banding, same exact verify — the delta is the signature
      // arithmetic (16 multiply-adds per shingle vs 1)
      if (wanted("minhash_pairs")) {
        time(factor, "minhash_pairs")(Dedup.minhashNearDups(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      if (wanted("oph_pairs")) {
        time(factor, "oph_pairs")(Dedup.ophNearDups(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // ICWS weighted minhash: same banded law over weighted samples
      if (wanted("wminhash_pairs")) {
        time(factor, "wminhash_pairs")(Dedup.weightedMinhashNearDups(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // cluster cap + funnel + component labels composed: the added
      // cost over cc_propagation must be one cluster-keyed window
      // exchange plus the row-local funnel scan
      if (wanted("quality_canonical"))
        time(factor, "quality_canonical")(Dedup.qualityCanonical(docs))
      // q109 on a LINEAR-pair fixture: the salted-copy corpus above
      // makes every copy of a doc a mutual near-dup of its siblings
      // (a by-construction QUADRATIC pair set — the r9 ladder's 208 s
      // 50× rung measured that fixture artifact, not the operator).
      // Suffixing every WORD with the copy id keeps each copy's
      // internal pair structure exactly isomorphic to the original
      // (identical jaccards) while cross-copy shingle overlap is
      // ZERO — pair count grows linearly, the real-corpus regime.
      if (wanted("quality_canonical_linear")) {
        val linDocs = docs0.crossJoin(copies)
          .select((col("doc_id") * factor + col("copy")).as("doc_id"),
            array_join(transform(split(col("text"), " "),
              w => concat(w, lit("c"), col("copy"))), " ").as("text"),
            col("source"))
          .persist()
        linDocs.count()
        time(factor, "quality_canonical_linear")(
          Dedup.qualityCanonical(linDocs))
        linDocs.unpersist()
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // unigram-LM trainer: the E-steps run over the DISTINCT-word
      // vocabulary (~replication-invariant up to copysalt tokens), so
      // the curve must be the corpus word-count aggregation (linear
      // scan) plus a ~constant train term
      if (wanted("unigram_lm")) {
        time(factor, "unigram_lm")(
          graft.operators.Unigram.modelTable(spark, docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // corpus-order novelty: one hash-keyed shuffle of the distinct
      // shingle stream + a doc-keyed agg off the reduced frame — the
      // curve must track the token stream linearly (the shingle
      // vocabulary is ~replication-invariant up to copysalt, so the
      // reduced frame stays ~constant)
      if (wanted("novelty")) {
        time(factor, "novelty")(Dedup.ngramNovelty(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // Heaps vocabulary curve: the first-occurrence min is the same
      // token exchange as novelty; the prefix-index side is the q57
      // range exchange — both linear, running sums constant
      if (wanted("vocab_growth")) {
        time(factor, "vocab_growth")(
          graft.operators.TextAnalysis.vocabGrowth(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // token-budget greedy over the distributed prefix sum: one
      // range exchange + a one-long-per-partition offset job — the
      // curve must be the range sort, linear with no reducer funnel
      if (wanted("budget_pack")) {
        time(factor, "budget_pack")(
          graft.operators.GlobalIndex.budgetPack(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      time(factor, "bm25")(
        graft.operators.TextAnalysis.bm25TopDocs(docs))
      // PRF query expansion (q209): inherently four sequential jobs
      // (base rank → feedback fold → expansion pick → expanded
      // re-run), each the bm25 term exchange over the same corpus —
      // the curve must track bm25's linearly with a small constant
      // (the feedback pool and expansion vocabulary are
      // query-bounded), never a pair quadrant
      if (wanted("prf_expansion")) {
        time(factor, "prf_expansion")(
          graft.operators.TextAnalysis.prfExpandedTopDocs(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // exact 13-gram decontamination (q233): row-local digest
      // kernel + broadcast membership join + one per-doc count
      // exchange — the curve must be one linear scan (the benchmark
      // side is fixed-size)
      if (wanted("exact_decontam")) {
        time(factor, "exact_decontam")(
          Dedup.exactNgramDecontam(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // gram-duplication histogram (q235): one map-side-combined df
      // aggregation over the digest stream, then a 5-row rollup —
      // linear, with the salted replicas keeping the distinct-gram
      // vocabulary growing linearly too (the adversarial regime for
      // the df exchange)
      if (wanted("dup_histogram")) {
        time(factor, "dup_histogram")(Dedup.gramDupHistogram(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // in-engine logistic training (q231): 8 five-long gradient
      // aggregations over the cached feature pass + the scoring scan
      // — the curve must be ~9 linear scans, the gradient exchange
      // constant (5 longs) at any factor
      if (wanted("logreg")) {
        time(factor, "logreg")(
          graft.operators.TextAnalysis.logRegQualityFilter(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // gradient-influence selection (q232): training + ONE more
      // bounded aggregate + a row-local score into the k-row heap —
      // the curve must track logreg with a ~constant increment
      if (wanted("influence")) {
        time(factor, "influence")(
          graft.operators.TextAnalysis.gradientInfluenceTopK(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // pairwise source JSD (q220): the corpus collapses to the
      // top-V per-source term table before any pair arithmetic, and
      // the top-V pick runs through TopKPerGroup (the r13 re-route
      // off the single-partition vocabulary sort) — the curve must
      // be the one distinct-term exchange, linear in the token
      // stream, with the |S|²×V pair frame ~constant
      if (wanted("source_jsd")) {
        time(factor, "source_jsd")(
          graft.operators.TextAnalysis.sourceJsd(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // hybrid = the bm25 pool + ONE dense corpus dot-scan + a
      // constant-size fusion join; its curve should track bm25's plus
      // a linear dense-scan term (embeddings replicated under the
      // same per-copy rotation as the main probe, re-keyed so the
      // doc_id = vec_id alignment survives replication)
      if (wanted("hybrid")) {
        time(factor, "hybrid")(
          Similarity.hybridRrf(docs, replicatedEmb(factor, copies)))
      }
      // the serving-scale fused query (q87): dense pool probed from a
      // PREBUILT persisted index instead of the brute corpus
      // dot-scan. The build is untimed setup — it is paid once per
      // ingest and amortized over every query batch (its own cost
      // curve is the eval_idx_build stage); what this stage measures
      // is the recurring per-batch cost, which must not pay a full
      // dense scan as the corpus grows.
      if (wanted("hybrid_indexed")) {
        val emb = replicatedEmb(factor, copies).persist()
        emb.count()
        val p = graft.util.TempDirs
          .create(s"ladder-hidx-${factor}x")
        Similarity.writeLshIndex(emb, "ladder_hrrf_idx", s"$p/idx")
        time(factor, "hybrid_indexed")(
          Similarity.hybridRrfIndexed(docs, emb, "ladder_hrrf_idx"))
        spark.sql("DROP TABLE IF EXISTS ladder_hrrf_idx")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(p))
        emb.unpersist()
      }
      time(factor, "funnel")(
        graft.operators.Pipeline.preprocessingFunnel(docs))
      // containment: same bounded-bucket candidate law as winnowing —
      // the curve must track the corpus, never the pair quadrant
      if (wanted("containment")) {
        time(factor, "containment")(Dedup.containmentPairs(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // Zipf-adversarial exact set-sim (q227 vs q192): 250f 2-copy
      // classes all sharing one 10-shingle hot block whose tokens
      // land in every prefix (4-word tails fill only 4 of the 6
      // prefix slots) — true output is the 250f within-class twins
      // (LINEAR), but the uncapped prefix join self-joins the
      // 500f-doc hot buckets (C(500f,2) candidates per hot token —
      // QUADRATIC, so setsim_zipf_plain is only feasible at small
      // factors). The capped join must stay linear: hot anchors
      // generate nothing, the df=2 tail anchors carry every pair.
      if (wanted("setsim_zipf") || wanted("setsim_zipf_plain")) {
        val hot = "one two three four five six seven eight nine " +
          "ten eleven twelve"
        val zdocs = spark.range(250L * factor)
          .select(explode(array(lit(0L), lit(1L))).as("copy"),
            col("id"))
          .select((col("id") * 2 + col("copy")).as("doc_id"),
            concat(lit(hot + " "), concat_ws(" ",
              col("id").cast("string"),
              (col("id") + 7777).cast("string"),
              (col("id") + 31337).cast("string"),
              (col("id") * 3 + 11).cast("string"))).as("text"))
          .persist()
        zdocs.count()
        if (wanted("setsim_zipf"))
          time(factor, "setsim_zipf")(Dedup.setSimJoinCapped(zdocs))
        if (wanted("setsim_zipf_plain"))
          time(factor, "setsim_zipf_plain")(Dedup.setSimJoin(zdocs))
        zdocs.unpersist()
        spark.catalog.clearCache()
      }
      // span removal at BOTH strides: stride=4 is the graded sampled
      // config (1/stride the span rows, phase-sensitive), stride=1
      // the exact Lee-et-al. configuration (every position sampled) —
      // the measured multiplier between the two curves is the price
      // of exactness, recorded in BASELINE.md next to the
      // phase-coverage bound
      if (wanted("span_removal")) {
        time(factor, "span_removal")(Dedup.removeDuplicatedSpans(docs))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      if (wanted("span_removal_s1")) {
        time(factor, "span_removal_s1")(
          Dedup.removeDuplicatedSpans(docs, stride = 1))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // BPE at a REALISTIC merge count: the batched trainer's step
      // count (256/batchSize pair-count jobs) is the axis that makes
      // a 30k-merge vocabulary affordable; the serial twin at the
      // same merge count is gated separately — it is 256 sequential
      // argmax jobs BY CONSTRUCTION and exists to measure the
      // batching speedup, not to scale
      if (wanted("bpe256_batched")) {
        timeAction(factor, "bpe256_batched") {
          val m = graft.operators.Bpe.trainMergesBatched(docs, 256, 32)
          println(s"[scale-heavy] ${factor}x bpe256_batched " +
            s"merges=${m.size}")
        }
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      if (wanted("bpe256_serial")) {
        timeAction(factor, "bpe256_serial") {
          graft.operators.Bpe.trainMerges(docs, 256)
        }
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      // BPE: the vocabulary is replication-invariant (copysalt<N> are
      // the only new words), so step cost must stay ~flat while only
      // the initial vocab shuffle and the apply join scale with the
      // token stream
      if (wanted("bpe_train") || wanted("bpe_segment")) {
        val t0 = System.nanoTime()
        val merges = graft.operators.Bpe.trainMerges(docs)
        val trainSec = (System.nanoTime() - t0) / 1e9
        if (wanted("bpe_train")) {
          results("bpe_train") ::= (factor, trainSec)
          println(f"[scale-heavy] ${factor}%4dx bpe_train          " +
            f"$trainSec%8.2f s")
        }
        time(factor, "bpe_segment")(
          graft.operators.Bpe.segmentCounts(docs, merges))
        spark.catalog.clearCache(); docs.persist(); docs.count()
      }
      if (wanted("cc_propagation") || wanted("cc_star")) {
        spark.catalog.clearCache(); docs.persist(); docs.count()
        // the CC variants consume the SAME pair set; build it once per
        // factor so the measured cost is the clustering, not the LSH.
        // Release the LSH operator's internal hash-corpus persist via
        // its handle — a blunt clearCache here would evict `pairs` too
        // and silently re-run the whole candidate+verify pipeline
        // (the most expensive stage at 100×) before cc_star
        val (pairsDf, lshHandle) = Dedup.minhashNearDupsWithHandle(docs)
        val pairs = pairsDf.select(col("doc_a"), col("doc_b")).persist()
        val nPairs = pairs.count()
        lshHandle.release()
        println(s"[scale-heavy] ${factor}x near-dup pairs: $nPairs")
        time(factor, "cc_propagation")(Dedup.dedupClusters(pairs))
        time(factor, "cc_star")(Dedup.dedupClustersStar(pairs))
        pairs.unpersist()
      }
      docs.unpersist()
      spark.catalog.clearCache() // residual operator internals
      // SemDedup with cells scaled to the corpus (the paper's regime
      // and the operator's documented 100 TB knob): per-cell
      // membership stays ~constant, so the within-cell pairwise term
      // stays linear in the corpus. The driver-side Lloyd train grows
      // with the sample (8·factor cells, 256·factor sample) — the
      // documented bounded-collect caveat, swapped for distributed
      // minibatch k-means in production.
      if (wanted("semdedup")) {
        val emb = replicatedEmb(factor, copies).persist()
        emb.count()
        time(factor, "semdedup")(Similarity.semDedup(emb,
          numCentroids = 8 * factor, trainSample = 256 * factor))
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // cluster-balanced sample with cells scaled like semdedup's
      // (quota sized so ~half the corpus survives): row-local
      // assignment + the heap-ranked quota — the curve must track the
      // one cell-keyed exchange of ≤ quota rows per (partition, cell)
      if (wanted("cluster_balance")) {
        val emb = replicatedEmb(factor, copies).persist()
        emb.count()
        timeAction(factor, "cluster_balance") {
          Similarity.cellBalancedSample(emb)
            .write.format("noop").mode("overwrite").save()
        }
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // coarse-fine vs flat corpus assignment at the semdedup-scaled
      // codebook (8·factor cells): flat is n·k dots (f²-growth when
      // cells scale with the corpus — the ladder's named residual);
      // coarse-fine is n·(g + k/g) ≈ 2√k. groups=1 runs the SAME
      // two-stage code at exact-flat work, isolating the algorithmic
      // saving from expression overhead
      if (wanted("assign_exact") || wanted("assign_coarse")) {
        val emb = replicatedEmb(factor, copies).persist()
        emb.count()
        if (wanted("assign_exact"))
          time(factor, "assign_exact")(Similarity.ivfCorpusCellsCoarse(
            emb, numCentroids = 8 * factor, trainSample = 256 * factor,
            groups = 1))
        if (wanted("assign_coarse"))
          time(factor, "assign_coarse")(Similarity.ivfCorpusCellsCoarse(
            emb, numCentroids = 8 * factor, trainSample = 256 * factor))
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // END-TO-END retrieval through the coarse-fine path at the
      // cells-scale-with-corpus point (8·factor cells — the f²-regime
      // q170 exists to cure): timed two-stage search PLUS measured
      // recall@10 against brute force at every rung — the 100× point
      // must hold recall, not just agree on cell labels
      if (wanted("search_coarse")) {
        val emb = replicatedEmb(factor, copies).persist()
        emb.count()
        val nQ = 100
        time(factor, "search_coarse")(Similarity.ivfTopKCoarse(
          emb, numQueries = nQ, numCentroids = 8 * factor,
          trainSample = 256 * factor))
        val pairs = (df: DataFrame) => df.collect().map(r =>
          (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
        val brute = pairs(Similarity.bruteForceTopK(emb, nQ))
        val got = pairs(Similarity.ivfTopKCoarse(emb, numQueries = nQ,
          numCentroids = 8 * factor, trainSample = 256 * factor))
        // flat-IVF at the SAME scaled codebook: the recall baseline
        // that separates the two-stage approximation from the
        // near-random fixture's intrinsic probe-width recall
        val flat = pairs(Similarity.ivfTopK(emb, numQueries = nQ,
          numCentroids = 8 * factor, trainSample = 256 * factor))
        val recall = got.intersect(brute).size.toDouble / brute.size
        val recallFlat = flat.intersect(brute).size.toDouble / brute.size
        println(f"[scale-heavy] ${factor}%4dx search_coarse recall@10 " +
          f"$recall%.3f vs flat-IVF $recallFlat%.3f (${8 * factor} cells)")
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // k-NN graph with the band width scaled to the corpus — the
      // documented LSH sizing law (SimilarityParams.dedupPlanesFor):
      // a FIXED width w collides random pairs at bands·2⁻ʷ, which is
      // Θ(n²) candidate pairs on this near-orthogonal rotated corpus
      // (measured: 39 s at 10× under the graded 8-bit fixture width),
      // so w grows as log₂(n/targetBucket) to hold per-node candidate
      // count ~constant — the semdedup cells-scale-with-corpus regime
      // applied to banding
      if (wanted("knn_graph")) {
        val emb = replicatedEmb(factor, copies).persist()
        val n = emb.count()
        val w = math.max(SimilarityParams.DedupBitsPerBand,
          (math.log(n / 16.0) / math.log(2)).ceil.toInt)
        time(factor, "knn_graph")(Similarity.knnGraph(emb, bitsPerBand = w))
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // graph-walk serving: the q112 graph is untimed setup (paid
      // once per ingest, its own curve is the knn_graph stage); the
      // timed walk is hops·beam·k edge lookups per query and must be
      // ~FLAT in corpus size — the navigable-graph promise
      if (wanted("graph_search")) {
        val emb = replicatedEmb(factor, copies).persist()
        val n = emb.count()
        val w = math.max(SimilarityParams.DedupBitsPerBand,
          (math.log(n / 16.0) / math.log(2)).ceil.toInt)
        // the SERVING graph since r10 = k-NN layer ∪ deterministic
        // long-range spokes (the q124 graph) — the walk stays
        // hops·beam·k lookups per query, the spoke layer adds
        // Spokes−1 edges/node to the untimed build
        val edges = Similarity.knnGraph(emb, bitsPerBand = w)
          .select(col("src"), col("neighbor_id").as("nbr"))
          .union(Similarity.longRangeEdges(emb))
          .persist()
        edges.count()
        time(factor, "graph_search")(
          Similarity.graphSearchOverEdges(emb, edges))
        edges.unpersist()
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // layered (HNSW-style) serving: BOTH level graphs are untimed
      // setup (the base build's curve is knn_graph; the upper build
      // runs on a 16x-smaller layer); the timed piece is the q186
      // serving path — 3 upper hops + descend + 3 base hops — which
      // must stay ~flat like graph_search while entering every rung
      // from a graph whose upper level shrank with the stride
      if (wanted("layered_search")) {
        val emb = replicatedEmb(factor, copies).persist()
        val n = emb.count()
        val w = math.max(SimilarityParams.DedupBitsPerBand,
          (math.log(n / 16.0) / math.log(2)).ceil.toInt)
        val (ranked, rk) = graft.operators.GlobalIndex
          .globalRowIndexWithHandle(emb.select(col("vec_id")),
            Seq(col("vec_id")), Similarity.LongRangePartitions)
        val upperEmb = emb.join(ranked
            .filter(col("global_idx") % Similarity.LayerStride === 0)
            .select(col("vec_id")), "vec_id")
          .localCheckpoint()
        rk.release()
        val nU = upperEmb.count()
        val wU = math.max(SimilarityParams.DedupBitsPerBand,
          (math.log(nU / 16.0) / math.log(2)).ceil.toInt)
        val uedges = Similarity.knnGraph(upperEmb, bitsPerBand = wU)
          .select(col("src"), col("neighbor_id").as("nbr"))
          .union(Similarity.longRangeEdges(upperEmb))
          .localCheckpoint()
        val bedges = Similarity.knnGraph(emb, bitsPerBand = w)
          .select(col("src"), col("neighbor_id").as("nbr"))
          .union(Similarity.longRangeEdges(emb))
          .localCheckpoint()
        time(factor, "layered_search")(
          Similarity.layeredSearchOverEdges(emb, upperEmb, uedges,
            bedges)._1)
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // THREE-level serving (q225): same untimed per-level builds at
      // the production stride (16, so level 2 is every 256th node);
      // the timed piece is the 3+3+3-hop double-descend serving path,
      // which must stay in the layered_search band while each entry
      // hop scans a 256x-smaller graph — the rung that, with
      // graph_search and layered_search, gives the flat vs 2-level
      // vs 3-level comparison at the same factor
      if (wanted("layered3_search")) {
        val emb = replicatedEmb(factor, copies).persist()
        val n = emb.count()
        val (ranked, rk) = graft.operators.GlobalIndex
          .globalRowIndexWithHandle(emb.select(col("vec_id")),
            Seq(col("vec_id")), Similarity.LongRangePartitions)
        val st = Similarity.LayerStride.toLong
        def level(step: Long) = emb.join(ranked
            .filter(col("global_idx") % step === 0)
            .select(col("vec_id")), "vec_id")
          .localCheckpoint()
        val topEmb = level(st * st)
        val upperEmb = level(st)
        rk.release()
        def edgesOf(lvl: DataFrame): DataFrame = {
          val nL = lvl.count()
          val w = math.max(SimilarityParams.DedupBitsPerBand,
            (math.log(nL / 16.0) / math.log(2)).ceil.toInt)
          Similarity.knnGraph(lvl, bitsPerBand = w)
            .select(col("src"), col("neighbor_id").as("nbr"))
            .union(Similarity.longRangeEdges(lvl))
            .localCheckpoint()
        }
        val tedges = edgesOf(topEmb)
        val uedges = edgesOf(upperEmb)
        val bedges = edgesOf(emb)
        time(factor, "layered3_search")(
          Similarity.layered3SearchOverEdges(emb, topEmb, tedges,
            uedges, bedges)._1)
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // mutual-graph analytics over the q112 substrate: the graph
      // build is untimed setup (its own curve is the knn_graph
      // stage); triangles must track Σ outdeg² under the degree
      // orientation (m^1.5 worst case, far below it on a kNN graph
      // whose out-degree is capped at k), k-core must track
      // rounds × (degree agg + two semi-joins) — both linear-ish in
      // the edge count, never pair-quadratic
      if (wanted("triangles") || wanted("kcore")) {
        val emb = replicatedEmb(factor, copies).persist()
        val n = emb.count()
        val w = math.max(SimilarityParams.DedupBitsPerBand,
          (math.log(n / 16.0) / math.log(2)).ceil.toInt)
        val knn = Similarity.knnGraph(emb, bitsPerBand = w)
          .select(col("src"), col("neighbor_id")).persist()
        knn.count()
        if (wanted("triangles"))
          time(factor, "triangles")(
            graft.operators.Graph.triangleCounts(knn))
        if (wanted("kcore"))
          time(factor, "kcore")(graft.operators.Graph.kCore(knn))
        knn.unpersist(); emb.unpersist()
        spark.catalog.clearCache()
      }
      // NN-descent construction: every stage is a bounded self-join
      // (init k spokes/node, (2k)² 2-hop fan-out/node), so the curve
      // must track n·k² linearly — no LSH width to scale, the whole
      // point of the operator
      if (wanted("nn_descent")) {
        val emb = replicatedEmb(factor, copies).persist()
        emb.count()
        time(factor, "nn_descent")(Similarity.nnDescentGraph(emb))
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // Adamic-Adar over the prebuilt kNN graph (build untimed, like
      // triangles): the 2-hop frame is (2k)²-bounded per node and
      // the pair agg map-side combines — linear in edge count
      if (wanted("adamic_adar")) {
        val emb = replicatedEmb(factor, copies).persist()
        val n = emb.count()
        val w = math.max(SimilarityParams.DedupBitsPerBand,
          (math.log(n / 16.0) / math.log(2)).ceil.toInt)
        val knn = Similarity.knnGraph(emb, bitsPerBand = w)
          .select(col("src"), col("neighbor_id")).persist()
        knn.count()
        time(factor, "adamic_adar")(
          graft.operators.Graph.adamicAdar(knn))
        knn.unpersist(); emb.unpersist()
        spark.catalog.clearCache()
      }
      // event-stream analytics: user count scales with the factor
      // (events per user constant) — every operator here is
      // user-partitioned windows + bounded aggs, so each curve must
      // be linear with no bend from any global stage
      if (Seq("scd2", "attribution", "markov", "session_paths",
          "cuped", "cusum", "kaplan_meier").exists(wanted)) {
        val ev0 = graft.operators.EventsQueries.events(spark, sfDir)
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            col("event_type"), col("value"), col("props"))
        val ev = ev0.crossJoin(copies).select(
          (col("user_id") * factor + col("copy")).as("user_id"),
          col("ts_ms"),
          (col("event_id") * factor + col("copy")).as("event_id"),
          col("event_type"), col("value"), col("props")).persist()
        ev.count()
        if (wanted("scd2"))
          time(factor, "scd2")(
            graft.operators.EventsQueries.scd2Dimension(ev))
        if (wanted("attribution"))
          time(factor, "attribution")(
            graft.operators.EventsQueries.attributionCredits(ev))
        if (wanted("markov"))
          time(factor, "markov")(
            graft.operators.EventsQueries.markovTransitions(ev))
        if (wanted("session_paths"))
          time(factor, "session_paths")(
            graft.operators.EventsQueries.sessionPaths(ev))
        if (wanted("cuped"))
          time(factor, "cuped")(
            graft.operators.EventsQueries.cupedLift(ev))
        // sequential statistics: one event pass + hour/day-frame
        // windows — both curves must be the single aggregation
        if (wanted("cusum"))
          time(factor, "cusum")(
            graft.operators.EventsQueries.cusumAnomalies(ev))
        if (wanted("kaplan_meier"))
          time(factor, "kaplan_meier")(
            graft.operators.EventsQueries.kaplanMeier(ev))
        ev.unpersist()
        spark.catalog.clearCache()
      }
      // binary Hamming scan: brute like q9 but the scan side moves 8
      // bytes per vector — the curve must be linear with a far
      // smaller constant than a float cosine scan
      if (wanted("bin_hamming")) {
        val emb = replicatedEmb(factor, copies).persist()
        emb.count()
        time(factor, "bin_hamming")(Similarity.binaryHammingTopK(emb))
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // PCA whitening: moments are sample-bounded (constant in the
      // corpus), projection is a row-local codegen'd scan — the curve
      // must be flat per × like the blocklist screen
      if (wanted("pca_whiten")) {
        val emb = replicatedEmb(factor, copies).persist()
        emb.count()
        time(factor, "pca_whiten")(Similarity.pcaWhiten(emb))
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // cross-corpus mining: banded cross-side candidates under the
      // log₂(n)-scaled width (the knn_graph law), both neighborhood
      // averages over the cached scored frame
      if (wanted("xmine")) {
        val emb = replicatedEmb(factor, copies).persist()
        val n = emb.count()
        val w = math.max(SimilarityParams.DedupBitsPerBand,
          (math.log(n / 16.0) / math.log(2)).ceil.toInt)
        time(factor, "xmine")(Similarity.mineAlignedPairs(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1), bitsPerBand = w))
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // MRL two-stage: stage 1 touches dims/Dim of each vector's
      // bytes, stage 2 is poolK·|Q| bounded re-rank — the curve must
      // stay linear with no bend from the re-rank join (at fixture
      // dims the scan is overhead-bound; the flop/byte saving is
      // structural, 16 of 64 dims)
      if (wanted("mrl")) {
        val emb = replicatedEmb(factor, copies).persist()
        emb.count()
        time(factor, "mrl")(Similarity.mrlRerankTopK(emb))
        emb.unpersist()
        spark.catalog.clearCache()
      }
      val li = li0.crossJoin(copies).select(
        graft.operators.Profiling.ProfileCols.map(col): _*)
      time(factor, "profile_exact")(
        graft.operators.Profiling.numericProfile(li))
      time(factor, "profile_hll")(
        graft.operators.Profiling.numericProfileApprox(li))
      spark.catalog.clearCache()
      // PageRank: `factor` disjoint copies of the co-purchase graph —
      // every iteration joins the once-shuffled persisted edge frame,
      // so the curve must be linear in |E| with no per-iteration bend
      if (wanted("pagerank") || wanted("pagerank_k10") ||
          wanted("hits")) {
        val liPr = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .crossJoin(copies)
          .select(
            (col("l_orderkey") * factor + col("copy")).as("l_orderkey"),
            (col("l_suppkey") * factor + col("copy")).as("l_suppkey"))
        val orPr = spark.read.parquet(s"$sfDir/orders.parquet")
          .crossJoin(copies)
          .select(
            (col("o_orderkey") * factor + col("copy")).as("o_orderkey"),
            (col("o_custkey") * factor + col("copy")).as("o_custkey"))
        if (wanted("pagerank"))
          time(factor, "pagerank")(
            graft.operators.Graph.pageRank(liPr, orPr))
        // integer HITS: two unrolled iterations over the same once-
        // shuffled edge frame — the curve must match pagerank's shape
        // with a smaller constant (no division, no dangling term)
        if (wanted("hits"))
          time(factor, "hits")(graft.operators.Graph.hits(
            graft.operators.Graph.directedEdges(liPr, orPr)))
        // the DIRECTED kernel at k=10 with its checkpoint cadence:
        // what this rung proves is bounded lineage at deep k — the
        // per-iteration cost must stay the rank-vector join (linear
        // in the factor, ~flat per iteration), with the every-5
        // checkpoint keeping each round's plan constant-size instead
        // of a 10-join-deep tree
        if (wanted("pagerank_k10")) {
          val t0 = System.nanoTime()
          var last = t0
          time(factor, "pagerank_k10")(
            graft.operators.Graph.pageRankDirectedWithHandle(
              graft.operators.Graph.directedEdges(liPr, orPr),
              onRound = (i, _) => {
                val now = System.nanoTime()
                println(f"[scale-heavy]   ${factor}%4dx   pr_k10 round $i%2d " +
                  f"${(now - last) / 1e9}%6.2f s (cum ${(now - t0) / 1e9}%6.2f)")
                last = now
              })._1)
        }
        spark.catalog.clearCache()
      }
      // retrieval-eval rung (q85/q86 at scale, over the persisted
      // index): index build and the exact-ideal brute scan grow with
      // the corpus (build once per ingest, amortized over every later
      // batch; brute ideal is the ground-truth labeling eval sets pay
      // once) — but the PROBE touches only banded query rows + its
      // candidate set, and the metric computations consume two
      // ALREADY-BOUNDED |Q|x k rankings, so eval cost must stay FLAT
      // as the corpus grows. The curve printed here is the proof.
      if (Seq("eval_idx_build", "eval_probe", "eval_ideal",
          "eval_recall_mrr", "eval_ndcg").exists(wanted)) {
        val emb = replicatedEmb(factor, copies).persist()
        emb.count()
        val idxPath = graft.util.TempDirs
          .create(s"ladder-idx-${factor}x")
        timeAction(factor, "eval_idx_build")(
          Similarity.writeLshIndex(emb, "ladder_eval_idx",
            s"$idxPath/idx"))
        val run = Similarity
          .probeLshIndex(emb, "ladder_eval_idx").persist()
        val ideal = Similarity.bruteForceTopK(emb).persist()
        time(factor, "eval_probe")(run)
        time(factor, "eval_ideal")(ideal)
        // both rankings are materialized above: what these two stages
        // measure is ONLY the metric computation over |Q|*k rows
        time(factor, "eval_recall_mrr")(
          Similarity.retrievalMetrics(run, ideal))
        time(factor, "eval_ndcg")(Similarity.ndcgMetrics(run, ideal))
        val mean = Similarity.retrievalMetrics(run, ideal)
          .agg(avg(col("recall")).as("recall"), avg(col("rr")).as("mrr"))
          .collect()(0)
        println(f"[scale-heavy] ${factor}%4dx eval quality: " +
          f"recall@k ${mean.getDouble(0)}%.3f mrr ${mean.getDouble(1)}%.3f")
        run.unpersist(); ideal.unpersist(); emb.unpersist()
        spark.sql("DROP TABLE IF EXISTS ladder_eval_idx")
        org.apache.hadoop.fs.FileUtil.fullyDelete(
          new java.io.File(idxPath))
        spark.catalog.clearCache()
      }
    }
    // per-operator curve: sec and sec-per-factor (flat = linear)
    results.toSeq.sortBy(_._1).foreach { case (name, rs) =>
      val curve = rs.reverse.map { case (f, s) =>
        f"$f%dx ${s}%.2f s (${s / f}%.3f s/x)"
      }.mkString(" | ")
      println(s"[scale-heavy] CURVE $name: $curve")
    }
    spark.stop()
  }
}
