package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  private val docs = (1L to 2000L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")

  test("quantileNormalize: a global raw cut would keep one source " +
      "wholesale; the normalized cut keeps the top half of EVERY source") {
    import spark.implicits._
    // source A scores 1..10, source B scores 1001..1010 — any global
    // RAW threshold keeps all of B before any of A; the per-source
    // CDF makes the cut scale-free
    val docs = ((1 to 10).map(i => (i.toLong, "A", i.toLong)) ++
      (1 to 10).map(i => (100L + i, "B", 1000L + i)))
      .toDF("doc_id", "source", "n_chars")
    val out = Sampling.quantileNormalize(docs).collect()
    val bySrc = out.groupBy(_.getString(1))
    bySrc.foreach { case (src, rows) =>
      val kept = rows.count(_.getBoolean(4))
      assert(kept == 5, s"source $src kept $kept of 10")
      // pct is the empirical CDF: uniform {0, 1/9, ..., 1}
      val pcts = rows.map(_.getDouble(3)).sorted
      assert(pcts.head == 0.0 && pcts.last == 1.0)
      pcts.zip(pcts.tail).foreach { case (a, b) =>
        assert(math.abs(b - a - 1.0 / 9) < 1e-12) }
    }
    // within a source, higher raw score => higher pct
    bySrc.values.foreach { rows =>
      rows.sortBy(_.getLong(2)).map(_.getDouble(3)).toSeq
        .sliding(2).foreach(w => assert(w(0) < w(1)))
    }
  }

  test("trainSplit lands near the 80/10/10 design proportions") {
    val counts = Sampling.trainSplit(docs.select(col("doc_id")))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000)
    assert(math.abs(counts("train") - 1600L) < 100, counts.toString)
    assert(math.abs(counts("validation") - 200L) < 60, counts.toString)
    assert(math.abs(counts("test") - 200L) < 60, counts.toString)
  }

  test("trainSplit assignment is independent of the rest of the corpus") {
    // contamination stability: the same doc_id maps to the same split
    // whether it is scored inside the full corpus or alone
    val full = Sampling.trainSplit(docs.select(col("doc_id")))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val subset = Sampling.trainSplit(
        docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    subset.foreach { case (id, s) => assert(full(id) == s) }
    assert(subset.nonEmpty)
  }

  test("quotaSample keeps at most the quota per group, deterministically") {
    val out = Sampling.quotaSample(docs, "lang", quota = 40).cache()
    val perGroup = out.groupBy("lang").count().as[(String, Long)].collect()
    assert(perGroup.length == 3)
    perGroup.foreach { case (_, n) => assert(n == 40) }
    // deterministic: same ids on a re-run
    val ids1 = out.select("doc_id").as[Long].collect().sorted
    val ids2 = Sampling.quotaSample(docs, "lang", quota = 40)
      .select("doc_id").as[Long].collect().sorted
    assert(ids1.sameElements(ids2))
    out.unpersist()
  }

  test("quotaSample returns whole groups smaller than the quota") {
    val small = docs.filter(col("doc_id") <= 10)
    assert(Sampling.quotaSample(small, "lang", quota = 40).count() == 10)
  }

  test("mixtureResample: kept corpus hits the target shares, argmin lang whole") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
    val natural = corpus.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.mixtureResample(corpus).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = kept.values.sum.toDouble
    // every language present; shares near the targets (hash sampling
    // is +-few % at this corpus size)
    Sampling.MixtureTargets.foreach { case (l, f) =>
      assert(kept.contains(l), s"$l dropped entirely")
      assert(math.abs(kept(l) / total - f) < 0.05,
        s"$l share ${kept(l) / total} vs target $f")
    }
    // downsample-only: no language grows, and the binding
    // (most-underrepresented) language is kept whole
    kept.foreach { case (l, n) => assert(n <= natural(l)) }
    val ratios = Sampling.MixtureTargets.map { case (l, f) =>
      l -> natural(l) / (f * natural.values.sum)
    }.toMap
    val binding = ratios.minBy(_._2)._1
    assert(kept(binding) == natural(binding),
      s"binding lang $binding was downsampled")
  }

  test("packSequences: packs are contiguous token ranges within each shard") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.packSequences(corpus).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("shard"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))
    assert(out.nonEmpty)
    // within every (split, shard), replaying docs in id order must
    // reproduce pack_id/pack_offset as a running token total — i.e.
    // packs are exactly the budget-sized cuts of the concatenation
    out.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._3).foreach { case (_, _, _, nTok, packId, off) =>
        assert(packId == cum / Sampling.PackBudget)
        assert(off == cum % Sampling.PackBudget)
        cum += nTok
      }
    }
    // NOTE deliberately NOT asserted: gap-free pack ids. A document
    // longer than 2× the budget legally starts past an entire pack
    // (pack_id jumps by ≥ 2) — the running-total contract above is
    // the complete specification.
  }

  test("upsampling repeats by weight: whole copies + hash fraction") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.upsampleMixture(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // sample ids are collision-free
    assert(out.map(_._5).distinct.length == out.length)
    val copiesPerDoc = out.groupBy(_._1)
      .map { case (id, rows) =>
        assert(rows.map(_._4).sorted.toSeq ==
          (0L until rows.length.toLong)) // dense copy indices
        id -> (rows.head._2, rows.length)
      }
    val byLang = copiesPerDoc.values.groupBy(_._1)
      .map { case (l, v) => l -> v.map(_._2).toSeq }
    // en weight 1.0: exactly one copy each; fr 3.0: exactly three
    assert(byLang("en").forall(_ == 1))
    assert(byLang("fr").forall(_ == 3))
    // de 2.5: every doc 2 or 3 copies, both actually occur
    assert(byLang("de").forall(n => n == 2 || n == 3))
    assert(byLang("de").toSet == Set(2, 3))
    // zh 0.5: surviving docs have exactly one copy, and roughly half
    // of the zh docs survive (hash-banded, not exact)
    val zhTotal = docs.filter(col("lang") === "zh").count()
    assert(byLang("zh").forall(_ == 1))
    assert(byLang("zh").size > zhTotal / 4 &&
      byLang("zh").size < 3 * zhTotal / 4)
  }

  test("weighted reservoir: k rows, deterministic, length-biased") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s1 = Sampling.weightedReservoir(docs).collect()
    assert(s1.length == Sampling.ReservoirK)
    // ranks are a dense 1..k and keys descend along them
    val byRank = s1.sortBy(_.getAs[Long]("rank"))
    assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
      (1L to Sampling.ReservoirK).toSeq)
    val keys = byRank.map(_.getAs[Double]("key"))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    // same input, same sample (hash uniforms, no RNG state)
    val s2 = Sampling.weightedReservoir(docs).collect()
    assert(s1.map(_.getLong(0)).toSet == s2.map(_.getLong(0)).toSet)
    // A-Res selects proportionally to weight: the sampled docs'
    // mean length must exceed the corpus mean by a clear margin
    val corpusMean = docs.agg(avg(col("n_chars"))).head.getDouble(0)
    val sampleMean = s1.map(_.getAs[Long]("n_chars")).sum.toDouble /
      s1.length
    assert(sampleMean > corpusMean * 1.1,
      s"sample mean $sampleMean vs corpus $corpusMean")
  }

  test("leakageSafeSplit: no near-dup cluster straddles a split " +
      "boundary; singletons keep their trainSplit assignment") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.leakageSafeSplit(docs).cache()
    assert(out.count() == docs.count())
    // THE leakage property: one split per canonical cluster
    val maxSplitsPerCluster = out.groupBy("canonical_id")
      .agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).head.getLong(0)
    assert(maxSplitsPerCluster == 1L)
    // and there is a real multi-member cluster exercising it
    assert(out.groupBy("canonical_id").count()
      .filter(col("count") > 1).count() > 0)
    // docs outside every cluster (canonical == self) are assigned
    // exactly as the plain per-doc split — adopting the safe split
    // only moves docs that were in leaky positions
    val plain = Sampling.trainSplit(docs.select(col("doc_id")))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    out.filter(col("canonical_id") === col("doc_id"))
      .select("doc_id", "split").as[(Long, String)].collect()
      .foreach { case (id, s) => assert(plain(id) == s) }
    out.unpersist()
  }

  test("importanceWeights selects the target domain: top-k " +
      "overrepresents the target source vs its corpus share") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.importanceWeights(docs).cache()
    assert(out.count() == Sampling.DsirTopK)
    // ranks dense 1..k, weights descending along them
    val byRank = out.collect().sortBy(_.getAs[Long]("rank"))
    assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
      (1L to Sampling.DsirTopK).toSeq)
    val ws = byRank.map(_.getAs[Double]("log_w"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    // selection quality: the target source's share of the selected
    // set must clearly exceed its share of the corpus
    val targetDocs = docs.filter(col("source") === Sampling.DsirTargetSource)
    val corpusShare = targetDocs.count().toDouble / docs.count()
    val selShare = out.join(targetDocs.select("doc_id"), "doc_id")
      .count().toDouble / Sampling.DsirTopK
    assert(selShare > 2 * corpusShare,
      s"selected share $selShare vs corpus share $corpusShare")
    out.unpersist()
  }

  test("temperatureMix: alpha<1 flattens (smaller source, higher " +
      "rate); alpha=1 is uniform budget; alpha=0 equalizes expected " +
      "counts; deterministic") {
    val sizes = Seq("big" -> 1000, "mid" -> 300, "small" -> 100,
      "tiny" -> 20)
    val skewed = sizes.flatMap { case (s, n) =>
      (1 to n).map(i => (s.hashCode.abs.toLong % 1000 * 100000 + i, s))
    }.toDF("doc_id", "source")
    val out = Sampling.temperatureMix(skewed)
    val rates = out.select("source", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // flattening: keep_rate monotone non-increasing in source size
    assert(rates("tiny") >= rates("small") &&
      rates("small") >= rates("mid") && rates("mid") >= rates("big"))
    assert(rates("big") < Sampling.MixBudgetFrac)
    // alpha = 1: natural distribution kept, every source keeps the
    // budget fraction (p^1 weights cancel against source size)
    val r1 = Sampling.temperatureMix(skewed, alpha = 1.0)
      .select("keep_rate").distinct().collect().map(_.getDouble(0))
    r1.foreach(r =>
      assert(math.abs(r - Sampling.MixBudgetFrac) < 1e-12, s"rate $r"))
    // alpha = 0: uniform weights, expected survivors equal per
    // source (rate*n constant) until the cap bites
    val r0 = Sampling.temperatureMix(skewed, alpha = 0.0)
      .select("source", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val budgets = sizes.collect { case (s, n) if r0(s) < 1.0 =>
      r0(s) * n }
    budgets.zip(budgets.tail).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"unequal expected counts $a $b") }
    assert(r0("tiny") == 1.0, "capped source should keep everything")
    // deterministic: same kept set on re-run
    val again = Sampling.temperatureMix(skewed)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(again.select("doc_id").collect().map(_.getLong(0)).sorted))
  }

  test("paretoFront: hand fixture — strict dominance, shorter-tie " +
      "wins, equal twins both kept") {
    import spark.implicits._
    // non-stopword tokens -> quality = (n/50)·distinct_ratio exactly:
    // docs 1,2: y=0.06 at x=5 (equal twins)   docs 3,4: y=0.10 at x=9
    // doc 5: y≈0.02 at x=13 (dominated by 3)  doc 6: y=0.10 at x=14
    // (equal quality to 3 at larger x -> dominated: strictness needs
    // only ONE axis)
    val docs = Seq(
      (1L, "zz yy xx", 5L), (2L, "zz yy xx", 5L),
      (3L, "zz yy xx ww vv", 9L), (4L, "vv ww xx yy zz", 9L),
      (5L, "zz zz zz zz zz zz zz", 13L),
      (6L, "zz yy xx ww vv", 14L)).toDF("doc_id", "text", "n_chars")
    val out = Sampling.paretoFront(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == out(2L) && out(3L) == out(4L))
    assert(out(3L) > out(1L), "frontier quality strictly increases")
  }

  test("neymanSample: variance-less stratum gets zero budget; " +
      "high-variance stratum takes it all, deterministically") {
    import spark.implicits._
    val docs = ((1 to 10).map(i => (i.toLong, "en", "s1",
        if (i % 2 == 0) 100L else 0L)) ++
      (1 to 10).map(i => (100L + i, "en", "s2", 50L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val out = Sampling.neymanSample(docs, budget = 6).collect()
    assert(out.length == 6)
    assert(out.forall(_.getString(2) == "s1"), "zero-variance s2 excluded")
    assert(out.forall(_.getLong(3) == 6L))
    val again = Sampling.neymanSample(docs, budget = 6).collect()
      .map(_.getLong(0)).sorted
    assert(out.map(_.getLong(0)).sorted.sameElements(again))
  }

  test("neymanSample fixture: per-stratum counts = min(alloc, N_h), " +
      "allocations within budget, nested under budget growth") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.neymanSample(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    val byStratum = out.groupBy(t => (t._2, t._3))
    val sizes = docs.groupBy(col("lang"), col("source")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    byStratum.foreach { case (k, rows) =>
      val alloc = rows.head._4
      assert(rows.forall(_._4 == alloc))
      assert(rows.length == math.min(alloc, sizes(k)),
        s"stratum $k took ${rows.length} of alloc $alloc, N=${sizes(k)}")
    }
    // Σ alloc ≤ budget (floor allocation never over-spends)
    assert(byStratum.values.map(_.head._4).sum <= Sampling.NeymanBudget)
    // nesting: selection at half budget is a subset of the full one
    val half = Sampling
      .neymanSample(docs, budget = Sampling.NeymanBudget / 2)
      .collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(out.map(_._1).toSet))
  }

  test("paretoFront: running-max algorithm equals the NOT-EXISTS " +
      "dominance definition on the fixture corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Sampling.paretoFront(docs).collect()
      .map(_.getLong(0)).toSet
    val all = docs.select(col("doc_id"),
        col("n_chars").cast("long"),
        TextAnalysis.qualityScoreCol(col("text"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = all.filter { case (_, x, y) =>
      !all.exists { case (_, ox, oy) =>
        ox <= x && oy >= y && (ox < x || oy > y) }
    }.map(_._1).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < all.length,
      s"frontier ${got.size} of ${all.length} should be a proper subset")
  }

  test("curriculumOrder: positions are a dense permutation, the first " +
      "stride holds every source's best doc, and within a source " +
      "quality never increases along the schedule") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.curriculumOrder(docs).collect()
    val n = out.length
    assert(out.map(_.getAs[Long]("position")).sorted.toSeq ==
      (0L until n.toLong))
    val sources = out.map(_.getAs[String]("source")).distinct
    // first |sources| positions = each source's rank-1 (best) doc
    val firstStride = out.filter(_.getAs[Long]("position") < sources.length)
    assert(firstStride.map(_.getAs[String]("source")).distinct.length ==
      sources.length)
    firstStride.foreach(r => assert(r.getAs[Long]("src_rank") == 1L))
    // within each source: positions ascend with rank, quality descends
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_.getAs[Long]("position"))
      assert(byPos.map(_.getAs[Long]("src_rank")).toSeq ==
        (1L to rs.length.toLong))
      val q = byPos.map(_.getAs[Double]("quality_score"))
      q.sliding(2).foreach(p => if (p.length == 2) assert(p(0) >= p(1)))
    }
  }

  test("doremiWeights: on-domain sources carry zero excess, " +
      "off-domain sources get upweighted, weights sum to 1 above " +
      "the uniform floor") {
    // src18 is the target LM source; srcA copies its text exactly
    // (loss == ref loss, excess clips to 0); srcB is gibberish the
    // target LM has never seen (every bigram falls to the smoothed
    // unigram floor -> large excess)
    val docs = Seq(
      (1L, "src18", "the cat sat on the mat"),
      (2L, "src18", "the dog sat on the rug"),
      (11L, "srcA", "the cat sat on the mat"),
      (12L, "srcA", "the dog sat on the rug"),
      (21L, "srcB", "zq xv qqj lkm pwo zzt"),
      (22L, "srcB", "vbn mmq ppl zzx qqw rrt"))
      .toDF("doc_id", "source", "text")
    val rows = Sampling.doremiWeights(docs).collect()
    assert(rows.length == 3)
    val bySrc = rows.map(r => r.getAs[String]("source") ->
      ((r.getAs[Double]("loss"), r.getAs[Double]("excess"),
        r.getAs[Double]("weight")))).toMap
    assert(bySrc("src18")._2 == 0.0)
    assert(bySrc("srcA")._2 <= 1e-12,
      s"identical text must carry ~zero excess, got ${bySrc("srcA")._2}")
    assert(bySrc("srcB")._2 > 0.5,
      s"off-domain excess should be large, got ${bySrc("srcB")._2}")
    assert(bySrc("srcB")._3 > bySrc("srcA")._3,
      "the off-domain source must be upweighted")
    val total = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(total - 1.0) < 1e-9, s"weights sum to $total")
    val floor = Sampling.DoremiSmoothing / 3
    rows.foreach(r =>
      assert(r.getAs[Double]("weight") > floor - 1e-12))
  }

  test("epochSchedule: small sources cap at the repetition ceiling, " +
      "capped budget flows to uncapped sources, total planned " +
      "tokens never exceed the budget") {
    // tiny source (5 tokens) vs bulk source (1000 tokens): α = 0.7
    // hands the tiny source far more than cap×5 tokens, so it caps
    // and its surplus must waterfill into the bulk source
    val docs = (Seq((1L, "tiny", "a b c d e")) ++
      (1 to 10).map(i => (10L + i, "bulk",
        (1 to 100).map(j => s"w${i}_$j").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val rows = Sampling.epochSchedule(docs).collect()
    val bySrc = rows.map(r => r.getAs[String]("source") -> r).toMap
    val tiny = bySrc("tiny"); val bulk = bySrc("bulk")
    assert(tiny.getAs[Long]("src_tokens") == 5L)
    assert(bulk.getAs[Long]("src_tokens") == 1000L)
    assert(tiny.getAs[Double]("epochs") == Sampling.EpochCap)
    // bulk got the tiny source's unabsorbed budget in pass 2
    assert(bulk.getAs[Double]("epochs") >
      bulk.getAs[Double]("epochs_pass1"))
    assert(rows.forall(_.getAs[Double]("epochs") <=
      Sampling.EpochCap + 1e-12))
    val budget = Sampling.EpochBudgetFrac * 1005
    val planned = rows.map(_.getAs[Double]("planned_tokens")).sum
    assert(planned <= budget + 1e-6,
      s"planned $planned must not exceed budget $budget")
    assert(planned > budget * 0.95,
      s"waterfill should get close to the budget, got $planned")
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-9)
  }

  test("uniMaxAllocation: exact water-filling — capped sources form " +
      "the ascending-capacity prefix, uncapped sources share one " +
      "level, the budget is spent exactly") {
    // three sources, tokens 5 / 100 / 1000, cap 4 epochs -> caps
    // 20 / 400 / 4000; budget = 1105 DIV 2 = 552.
    //   i=1 tiny:  20·3 =   60 <= 552        -> capped, alloc 20
    //   i=2 mid:  400·2 =  800 >  552-20=532 -> uncapped
    //   level = (552-20)/2 = 266 -> mid 266 (2.66 ep), bulk 266
    val docs = (Seq((1L, "tiny", "a b c d e"),
      (2L, "mid", (1 to 100).map(j => s"m$j").mkString(" "))) ++
      (1 to 10).map(i => (10L + i, "bulk",
        (1 to 100).map(j => s"w${i}_$j").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val rows = Sampling.uniMaxAllocation(docs).collect()
    val bySrc = rows.map(r => r.getAs[String]("source") -> r).toMap
    assert(bySrc("tiny").getAs[Boolean]("capped"))
    assert(!bySrc("mid").getAs[Boolean]("capped"))
    assert(!bySrc("bulk").getAs[Boolean]("capped"))
    assert(bySrc("tiny").getAs[Double]("alloc_tokens") == 20.0)
    assert(bySrc("tiny").getAs[Double]("epochs") == 4.0)
    assert(bySrc("mid").getAs[Double]("alloc_tokens") == 266.0)
    assert(bySrc("mid").getAs[Double]("epochs") == 2.66)
    assert(bySrc("bulk").getAs[Double]("alloc_tokens") == 266.0)
    assert(bySrc("bulk").getAs[Double]("epochs") == 0.266)
    // budget identity: allocations sum to the integer budget exactly
    assert(rows.map(_.getAs[Double]("alloc_tokens")).sum == 552.0)
    // no source ever exceeds its epoch ceiling
    rows.foreach(r => assert(r.getAs[Double]("epochs") <=
      Sampling.UniMaxEpochCap + 1e-12))
  }

  test("uniMaxAllocation: equal sources split the budget evenly " +
      "with nothing capped; the single-source degenerate case " +
      "takes exactly the budget (no zero-division)") {
    // two equal 16-token sources: capacities 64 each, budget
    // 32 DIV 2 = 16 -> k = 0, level = 16/2 = 8 tokens, 0.5 epochs
    val docs = Seq((1L, "a", "x x x x"), (2L, "b", "y y y y"),
      (3L, "a", "x x x x"), (4L, "b", "y y y y"),
      (5L, "a", "x x x x"), (6L, "b", "y y y y"),
      (7L, "a", "x x x x"), (8L, "b", "y y y y"))
      .toDF("doc_id", "source", "text")
    val rows = Sampling.uniMaxAllocation(docs).collect()
    assert(rows.forall(!_.getAs[Boolean]("capped")))
    rows.foreach { r =>
      assert(r.getAs[Double]("alloc_tokens") == 8.0)
      assert(r.getAs[Double]("epochs") == 0.5)
    }
    // single source: budget = tot DIV 2 all flows to it
    val one = Seq((1L, "solo", "x x x x x x x x"))
      .toDF("doc_id", "source", "text")
    val r1 = Sampling.uniMaxAllocation(one).collect()
    assert(r1.length == 1)
    assert(r1(0).getAs[Double]("alloc_tokens") == 4.0)
    assert(r1(0).getAs[Double]("epochs") == 0.5)
  }

  test("lengthBucketAudit: hand buckets — clamping at the top " +
      "bucket, exact padded masses, bucketing always beats the " +
      "pad-to-max baseline on mixed lengths") {
    // letter-only words so the BPE-ish regex counts one token per
    // word: 10, 20, 300 tokens; buckets 16, 32, 512; global max 300
    def words(n: Int) = Seq.fill(n)("word").mkString(" ")
    val docs = Seq((1L, words(10)), (2L, words(20)), (3L, words(300)))
      .toDF("doc_id", "text")
    val out = Sampling.lengthBucketAudit(docs).collect()
      .map(r => r.getAs[Long]("bucket_len") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
          r.getAs[Long]("padded_tokens"), r.getAs[Double]("waste_frac"),
          r.getAs[Double]("global_waste_frac")))).toMap
    assert(out.keySet == Set(16L, 32L, 512L))
    assert(out(16L) == ((1L, 10L, 16L, 1.0 - 10.0 / 16.0,
      1.0 - 330.0 / 900.0)))
    assert(out(32L)._3 == 32L)
    assert(out(512L)._3 == 512L)
    // bucketed total waste < global pad-to-max waste
    val bucketedPadded = out.values.map(_._3).sum
    val globalPadded = 3L * 300L
    assert(bucketedPadded < globalPadded,
      s"bucketing must reduce padded mass: $bucketedPadded vs $globalPadded")
    // clamping: an overlong doc lands in the TOP bucket, not beyond
    val big = Seq((9L, words(9000))).toDF("doc_id", "text")
    val clamped = Sampling.lengthBucketAudit(big).head()
    assert(clamped.getAs[Long]("bucket_len") ==
      Sampling.LengthBuckets.last)
  }

  test("ucbAllocation: exact rewards, exploration bonus shrinks " +
      "with plays, an under-sampled mediocre arm can beat a " +
      "well-sampled good one, exactly one arm chosen") {
    // hi: 8 docs, reward 0.5 (2 stopword hits of 4 tokens)
    // rare: 1 doc, reward 0.25 — but n=1 gives a huge bonus
    val docs = ((1 to 8).map(i =>
      (i.toLong, "hi", "the cat the dog")) :+
      (100L, "rare", "the cat sat still"))
      .toDF("doc_id", "source", "text")
    val rows = Sampling.ucbAllocation(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val hi = rows("hi"); val rare = rows("rare")
    assert(hi.getAs[Double]("mean_reward") == 0.5)
    assert(rare.getAs[Double]("mean_reward") == 0.25)
    // bonuses: sqrt(2 ln 9 / n)
    assert(hi.getAs[Double]("bonus") ==
      math.sqrt(2.0 * math.log(9.0) / 8.0))
    assert(rare.getAs[Double]("bonus") ==
      math.sqrt(2.0 * math.log(9.0) / 1.0))
    // the rare arm's exploration bonus wins the draw
    assert(rare.getAs[Double]("ucb") > hi.getAs[Double]("ucb"))
    assert(rare.getAs[Boolean]("chosen") &&
      !hi.getAs[Boolean]("chosen"))
    assert(rows.values.count(_.getAs[Boolean]("chosen")) == 1)
  }
}
