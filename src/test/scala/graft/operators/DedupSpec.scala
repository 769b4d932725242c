package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSessionSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("exact dedup maps every doc to a canonical id") {
    val out = Dedup.exactDedup(docs).collect()
    assert(out.length == 500)
    // canonical id is always <= doc_id, and non-duplicates map to self
    out.foreach { r =>
      val (id, canon) = (r.getAs[Long]("doc_id"), r.getAs[Long]("canonical_id"))
      assert(canon <= id)
      if (!r.getAs[Boolean]("is_duplicate")) assert(canon == id)
    }
  }

  test("minhash-LSH pairs are a subset of brute-force pairs (no false positives)") {
    val lsh = Dedup.minhashNearDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.bruteForceNearDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute),
      s"LSH invented pairs: ${lsh.diff(brute)}")
  }

  test("minhash-LSH recall vs brute force >= 0.9 on sf0.001") {
    val lsh = Dedup.minhashNearDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.bruteForceNearDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture has no near-dup pairs to test recall on")
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    info(s"brute=${brute.size} lsh=${lsh.size} recall=$recall")
    assert(recall >= 0.9)
  }

  test("OPH pairs: no false positives; recall vs brute force >= 0.9; " +
      "1/16 the signature arithmetic") {
    val oph = Dedup.ophNearDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.bruteForceNearDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    // exact-Jaccard verify ⇒ precision 1.0 by construction
    assert(oph.subsetOf(brute), s"OPH invented pairs: ${oph.diff(brute)}")
    val recall = oph.intersect(brute).size.toDouble / brute.size
    info(s"brute=${brute.size} oph=${oph.size} recall=$recall")
    assert(recall >= 0.9)
  }

  test("OPH densification: every empty bin borrows its nearest right " +
      "neighbor with the j*C offset; one-element input fills all bins") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.Bridge
    val one = Seq(Tuple1(Seq(12345L))).toDF("hashes")
      .select(Bridge.column(org.apache.spark.sql.graft.OphSignature(
        Bridge.expression(col("hashes")), Dedup.NumHashes,
        Dedup.perms.head._1, Dedup.perms.head._2, Dedup.P, Dedup.OphC))
        .as("sig"))
      .collect().head.getSeq[Long](0)
    val h = (Dedup.perms.head._1 * (12345L % Dedup.P) +
      Dedup.perms.head._2) % Dedup.P
    val bin = (h % Dedup.NumHashes).toInt
    val k = Dedup.NumHashes
    (0 until k).foreach { i =>
      val j = ((bin - i) % k + k) % k // steps RIGHT from i to bin
      assert(one(i) == h + j * Dedup.OphC,
        s"bin $i: got ${one(i)}, want $h + $j*C")
    }
  }

  test("weighted minhash: no false positives and full recall vs the " +
      "all-pairs weighted truth on sf0.001") {
    val icws = Dedup.weightedMinhashNearDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.bruteForceWeightedNearDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture has no weighted near-dups")
    assert(icws.subsetOf(brute), s"ICWS invented pairs: ${icws.diff(brute)}")
    val recall = icws.intersect(brute).size.toDouble / brute.size
    info(s"brute=${brute.size} icws=${icws.size} recall=$recall")
    assert(recall >= 0.9)
  }

  test("weighted minhash catches a boilerplate-dominated pair that " +
      "distinct-set minhash misses; ICWS collisions track weighted Jaccard") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two docs = the same 60-token boilerplate run + distinct tails:
    // token multisets overlap 60/(60+8) -> weighted Jaccard ~0.88,
    // but the DISTINCT 3-shingle sets are tiny and mostly tail-driven
    // (a repeated token run yields ONE distinct shingle), so plain
    // set-Jaccard collapses below threshold
    val boiler = Seq.fill(60)("spark").mkString(" ")
    val df = Seq(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler omega psi chi phi"))
      .toDF("doc_id", "text")
    val weighted = Dedup.weightedMinhashNearDups(df).collect()
    val plain = Dedup.minhashNearDups(df).collect()
    assert(weighted.length == 1,
      s"weighted minhash missed the boilerplate pair: ${weighted.length}")
    assert(weighted.head.getDouble(2) > 0.8)
    assert(plain.isEmpty,
      "distinct-set minhash unexpectedly caught the multiset pair")
    // ICWS estimator: the 16 samples collide at ~weighted-Jaccard
    // rate (0.88); with the fixed seed this is deterministic — pin a
    // loose floor that any correct ICWS draw chain clears
    val sigs = Dedup.termCountArrays(df)
      .select(col("doc_id"), Dedup.icwsSignature(col("tl")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1))
      .toMap
    val matches = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    info(s"ICWS sample collisions: $matches/16 (wj ~ 0.88)")
    assert(matches >= 10, s"only $matches/16 samples collide at wj~0.88")
  }

  test("containment flags a short doc embedded in a long one that Jaccard misses") {
    import spark.implicits._
    // doc 1 = 30 distinct-shingle words; doc 2 = doc 1 verbatim plus
    // ~10x more unique text -> Jaccard ~0.09, containment 1.0
    val short_ = (0 until 30).map(i => s"w$i").mkString(" ")
    val long_ = short_ + " " + (0 until 300).map(i => s"x$i").mkString(" ")
    val two = Seq((1L, short_), (2L, long_)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(two).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Double]("containment") == 1.0)
    // the pair is invisible to the Jaccard families at their cut
    val jac = r.getAs[Long]("n_shared").toDouble /
      (r.getAs[Long]("n_a") + r.getAs[Long]("n_b") - r.getAs[Long]("n_shared"))
    assert(jac < Dedup.JaccardThreshold)
  }

  test("containment pairs on the fixture are found and exactly scored") {
    val out = Dedup.containmentPairs(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("containment") >= Dedup.ContainmentThreshold)
      assert(r.getAs[Long]("n_shared") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    }
  }

  test("span removal keeps the canonical copy and cuts the echo") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    // both preambles are 40 chars: cross-doc sampled spans only match
    // when offsets are congruent mod stride (the documented phase
    // sensitivity; stride=1 removes it)
    val preA = "one " * 10
    val preB = "two " * 10
    val a = preA + shared
    val b = preB + shared
    val c = "this third document shares nothing with the others at all ok"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("cleaned_text"), r.getAs[Long]("n_chars_removed")))
      .toMap
    // doc 1 is the keeper: untouched
    assert(out(1L) == (a, 0L))
    // doc 2 loses the shared tail but keeps its unique opening
    assert(out(2L)._2 > 0)
    assert(out(2L)._1.startsWith(preB))
    assert(out(2L)._1.length < b.length)
    // doc 3 shares nothing: untouched
    assert(out(3L) == (c, 0L))
  }

  test("span removal coheres with the q58 statistics on the fixture") {
    val stats = Dedup.duplicatedSpans(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_grams"))
      .toMap
    val out = Dedup.removeDuplicatedSpans(docs).collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      val (id, removed) = (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_chars_removed"))
      assert(removed >= 0)
      // a doc with zero duplicated grams must be untouched
      if (stats.getOrElse(id, 0L) == 0L) assert(removed == 0L,
        s"doc $id has no dup grams but lost $removed chars")
    }
    assert(out.exists(_.getAs[Long]("n_chars_removed") > 0),
      "fixture has planted duplicates; removal must touch some docs")
  }

  test("signature arithmetic: minhash of identical docs is identical") {
    import spark.implicits._
    val two = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val sigs = Dedup.shingleHashes(two)
      .select(Dedup.signature(org.apache.spark.sql.functions.col("hashes")))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == Dedup.NumHashes)
  }

  test("fuzzy name pairs: deletion neighborhood is complete at d=1") {
    import spark.implicits._
    val names = Seq(
      "gear", "bear",        // substitution
      "gears",               // insertion vs gear
      "ear",                 // deletion vs gear/bear
      "gaer",                // transposition: d=2 from gear — excluded
      "widget", "widget")    // duplicates collapse in the vocabulary
      .toDF("p_name")
    val pairs = Dedup.fuzzyNamePairs(names, "p_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = Set(
      ("bear", "gear"), ("gear", "gears"), ("ear", "gear"),
      ("bear", "ear"))
    assert(pairs == expected, s"got $pairs")
    // the transposed 'gaer' shares deletion variants with 'gear'
    // ('ger'? no — 'gar','ger' overlap) but is distance 2: the exact
    // verify must have rejected every such candidate
    assert(!pairs.exists(p => p._1 == "gaer" || p._2 == "gaer"))
  }

  test("benchmarkContamination flags shared substrings, zero for disjoint") {
    import spark.implicits._
    val bench = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, bench),                                  // benchmark member
      (30L, s"intro text then $bench and an outro"),// contains it whole
      (31L, "completely unrelated words everywhere here"))
      .toDF("doc_id", "text")
    val out = Dedup.benchmarkContamination(docs, benchBelowId = 20L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out.keySet == Set(30L, 31L)) // benchmark docs not scored
    assert(out(30L)._1 > 0 && out(30L)._2 > 0.2,
      s"containing doc scored ${out(30L)}")
    assert(out(31L) == ((0L, 0.0)))
  }

  test("dedupClusters: transitive pairs collapse to min-id components") {
    import spark.implicits._
    // components: {1,2,3} via chain 1-2, 2-3 (1-3 never paired),
    // {7,9}, and 5 appears in no pair (not emitted)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L)),
      7L -> ((7L, 2L)), 9L -> ((7L, 2L))))
  }

  test("dedupClusters on an empty pair set returns an empty frame") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.dedupClusters(none).count() == 0)
  }

  test("dedupClusters converges on a long chain (diameter > 1 round)") {
    import spark.implicits._
    val n = 12L
    val chain = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupClusters(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == n)
    assert(out.forall { case (_, canon, size) => canon == 1L && size == n })
  }

  test("frontier propagation: active set shrinks as a deep component converges") {
    import spark.implicits._
    // a diameter-60 path PLUS 40 already-tight star components: the
    // stars converge in one round, after which per-round work must
    // track only the path's still-active frontier — the at-scale
    // property that converged components stop costing shuffle rows
    val path = (1L to 60L).map(i => (i, i + 1))
    val stars = (0 until 40).flatMap { s =>
      val base = 1000L + s * 10
      (1 to 4).map(k => (base, base + k))
    }
    val pairs = (path ++ stars).toDF("doc_a", "doc_b")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Dedup.dedupClusters(pairs, maxIters = 80,
      onRound = (_, f) => sizes += f)
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 61L).forall(labels(_) == 1L), "path not fully labeled")
    assert(labels(1004L) == 1000L)
    // round 1 carries every node; within 3 rounds the stars are done
    // and the frontier must drop to the path's active region
    assert(sizes.head > 200, s"round sizes: $sizes")
    assert(sizes.length > 20, "path converged suspiciously fast")
    assert(sizes.drop(3).forall(_ <= 61),
      s"frontier still carries converged components: $sizes")
    // monotone-ish tail: the last rounds are a handful of nodes
    assert(sizes.last <= 3, s"final frontier ${sizes.last}")
  }

  test("incremental dedup == full pair set restricted to the new batch") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = Dedup.IncrementalFrom
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val full = pairSet(Dedup.minhashNearDups(docs))
    val expected = full.filter { case ((_, b), _) => b >= k }
    val got = pairSet(Dedup.incrementalNearDups(docs, k))
    assert(got == expected)
    assert(expected.nonEmpty)
    // the old×old quadrant exists in the full set but never here
    assert(full.exists { case ((_, b), _) => b < k })
    assert(!got.keys.exists { case (_, b) => b < k })
  }

  test("star alternation == label propagation; depth-bounded rounds on a deep path") {
    import spark.implicits._
    // a 200-edge path (diameter 200) + assorted components: the star
    // alternation must converge in O(log n) alternations where
    // propagation needs ~diameter rounds
    val path = (1L to 200L).map(i => (i, i + 1))
    val extra = Seq((500L, 501L), (501L, 502L), (900L, 910L))
    val pairs = (path ++ extra).toDF("doc_a", "doc_b")
    val viaProp = Dedup.dedupClusters(pairs, maxIters = 250).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaStar = Dedup.dedupClustersStar(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaStar == viaProp)
    assert(viaStar.count(_._2 == 1L) == 201)
    // depth bound: well under the 50-iteration default cap that a
    // diameter-200 path would blow through under propagation
    val capped = Dedup.dedupClustersStar(pairs, maxIters = 15).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == viaProp, "star alternation needed > 15 rounds")
  }

  test("star alternation keeps self-pair-only nodes as singleton clusters") {
    import spark.implicits._
    // node 5 appears ONLY as a self-pair: both algorithms must emit
    // it as its own singleton cluster, not drop it
    val pairs = Seq((5L, 5L), (1L, 2L)).toDF("doc_a", "doc_b")
    def result(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = Set((1L, 1L, 2L), (2L, 1L, 2L), (5L, 5L, 1L))
    assert(result(Dedup.dedupClusters(pairs)) == expected)
    assert(result(Dedup.dedupClustersStar(pairs)) == expected)
  }

  test("duplicated spans: shared substrings counted, unique text zero") {
    import spark.implicits._
    val shared = "the exact same twenty-five chars run " * 2 // 74 chars
    val corpus = Seq(
      (1L, "left context AAA " + shared + " right tail one"),
      (2L, "other prefix BBB " + shared + " different tail"),
      (3L, "completely unrelated text with no repeats at all here"),
      (4L, "short")) // below k: filtered out entirely
      .toDF("doc_id", "text")
    val rows = Dedup.duplicatedSpans(corpus).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!rows.contains(4L)) // length < k
    assert(rows(3L)._2 == 0L && rows(3L)._3 == 0.0)
    // docs 1 and 2 share a 74-char run: sampled 16-grams inside it
    // collide, so both have duplicated spans but not all spans
    assert(rows(1L)._2 > 0L && rows(2L)._2 > 0L)
    assert(rows(1L)._2 < rows(1L)._1 && rows(2L)._2 < rows(2L)._1)
    spark.catalog.clearCache()
  }

  test("reliable-checkpoint mode: correct labels, superseded rounds released") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
      .toString
    val chain = (1L to 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupClusters(chain, maxIters = 60,
      checkpointDir = Some(dir)).collect()
    assert(out.length == 31)
    assert(out.forall(_.getLong(1) == 1L))
    // ~30 rounds each checkpoint a frame; superseded ones are deleted
    // eagerly, so only a bounded handful of rdd checkpoint dirs remain
    val live = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.getFileName.toString.startsWith("rdd-"))
      .count()
    assert(live <= 4,
      s"$live rdd-* checkpoint dirs survive — superseded rounds not released")
  }

  test("sourceSimilarity: identical sources agree on every " +
      "coordinate, disjoint-vocab sources on none") {
    import spark.implicits._
    val same = "alpha beta gamma delta epsilon zeta eta theta"
    val other = "uno dos tres cuatro cinco seis siete ocho nueve"
    val docs = Seq(
      (1L, same, "srcA"), (2L, same, "srcB"),   // identical content
      (3L, other, "srcC")                       // disjoint vocabulary
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceSimilarity(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("srcA", "srcB")) == (Dedup.NumHashes.toLong, 1.0))
    assert(got(("srcA", "srcC"))._1 == 0L)
    assert(got(("srcB", "srcC"))._2 == 0.0)
    // fixture sanity: all S*(S-1)/2 pairs present, estimates in [0,1]
    val fix = Dedup.sourceSimilarity(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .collect()
    val s = fix.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.length
    assert(fix.length == s * (s - 1) / 2)
    assert(fix.forall { r =>
      val j = r.getDouble(3); j >= 0.0 && j <= 1.0
    })
  }

  test("qualityCanonical retains the funnel-passing longest copy, " +
      "not the min id and not the rejected longest") {
    import spark.implicits._
    // 24 distinct tokens, stopword-rich, avg token length in band
    val base = "the quick brown fox jumps over a lazy dog near this " +
      "old stone wall and four small birds sing from that high tree"
    val fixture = Seq(
      (1L, base, "s"),                              // kept, 24 tokens
      (2L, base + " alpha beta gamma delta", "s"),  // kept, 28 tokens
      (3L, Seq.fill(4)(base).mkString(" "), "s"),   // repetitive: rejected
      (4L, "completely different standalone text about winter rain " +
        "storms flooding rivers valleys bridges towns roads farms " +
        "fields crops barns fences gates paths", "s")) // singleton
      .toDF("doc_id", "text", "source")
    val out = Dedup.qualityCanonical(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("n_tokens"),
          r.getAs[Boolean]("kept"), r.getAs[Boolean]("retained"))).toMap
    // 1, 2, 3 share nearly all shingles -> one cluster; 4 singleton
    assert(out(1L)._1 == out(2L)._1 && out(2L)._1 == out(3L)._1,
      s"expected 1,2,3 clustered: $out")
    assert(out(4L)._1 == 4L && out(4L)._4)
    // the repeated doc fails the funnel's repetition screen
    assert(!out(3L)._3 && out(1L)._3 && out(2L)._3)
    // retained = kept AND longest among kept (28 > 24) — NOT the
    // min id (1) and NOT the longest overall (3, 96 tokens, rejected)
    assert(out(2L)._4, s"doc 2 should be retained: $out")
    assert(!out(1L)._4 && !out(3L)._4)
    // exactly one retained per cluster
    assert(out.values.count(_._4) == 2)
  }

  test("paragraphDedup hand-checked: first occurrence stays, " +
      "cross-doc and within-doc repeats removed, text rebuilt") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val P = Dedup.ParaWords
    def para(c: Char): String = (1 to P).map(i => s"$c$i").mkString(" ")
    val (a, b, c2, d) = (para('a'), para('b'), para('c'), para('d'))
    val fixture = Seq(
      (1L, s"$a $b"),   // canonical home of a and b
      (2L, s"$a $c2"),  // a is a cross-doc repeat -> removed
      (3L, s"$d $d"))   // within-doc repeat -> second copy removed
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text"))).toMap
    assert(out(1L) == ((2L, 2L, s"$a $b")))
    assert(out(2L) == ((2L, 1L, c2)))
    assert(out(3L) == ((2L, 1L, d)))
    // idempotence: re-deduping the cleaned corpus removes nothing
    val again = Dedup.paragraphDedup(
      Seq((1L, out(1L)._3), (2L, out(2L)._3), (3L, out(3L)._3))
        .toDF("doc_id", "text"))
      .collect()
    assert(again.forall(r =>
      r.getAs[Long]("n_kept") == r.getAs[Long]("n_paras")))
    // a short final paragraph (not width-aligned) still round-trips
    val tail = Dedup.paragraphDedup(
      Seq((7L, s"$a one two three")).toDF("doc_id", "text")).head()
    assert(tail.getAs[Long]("n_paras") == 2 &&
      tail.getAs[String]("clean_text") == s"$a one two three")
    // the fixture corpus actually exercises removal
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val removed = Dedup.paragraphDedup(corpus)
      .select(col("n_paras"), col("n_kept"))
      .collect().map(r => r.getLong(0) - r.getLong(1)).sum
    assert(removed > 0, "no duplicate paragraphs found in the fixture")
  }

  test("boilerplateStrip: over-cap paragraphs lose EVERY copy " +
      "(including the first), rare repeats keep ALL copies — the " +
      "exact complement of paragraphDedup's keep rule") {
    import spark.implicits._
    val P = Dedup.ParaWords
    def para(c: Char): String = (1 to P).map(i => s"$c$i").mkString(" ")
    val (a, b, c2, d) = (para('a'), para('b'), para('c'), para('d'))
    // paragraph a occurs 3 times (> cap 2) -> boilerplate, all cut;
    // paragraph d occurs 2 times (== cap) -> rare, BOTH copies stay
    // (q130 would cut the second copy); b/c unique -> stay
    val fixture = Seq(
      (1L, s"$a $b"),
      (2L, s"$a $c2"),
      (3L, s"$a $d"),
      (4L, s"$d $b"))
      .toDF("doc_id", "text")
    val out = Dedup.boilerplateStrip(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((2L, 1L, b)))
    assert(out(2L) == ((2L, 1L, c2)))
    assert(out(3L) == ((2L, 1L, d)), "rare repeat's first copy stays")
    assert(out(4L) == ((2L, 2L, s"$d $b")),
      "rare repeat's second copy must ALSO stay")
    // idempotence: stripping the stripped corpus removes nothing
    val again = Dedup.boilerplateStrip(
      out.toSeq.map { case (id, (_, _, t)) => (id, t) }
        .toDF("doc_id", "text")).collect()
    assert(again.forall(r =>
      r.getAs[Long]("n_kept") == r.getAs[Long]("n_paras")))
  }

  test("dupRateAudit: sample is the deterministic hash subset of " +
      "the candidate pairs, the estimate brackets the true pair " +
      "count on the fixture, verification only touches the sample") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val r = Dedup.dupRateAudit(docs).head()
    val nCand = r.getAs[Long]("n_candidates")
    val nSamp = r.getAs[Long]("n_sampled")
    val nDup = r.getAs[Long]("n_dup_sampled")
    val est = r.getAs[Long]("est_dup_pairs")
    assert(nCand > 0 && nSamp > 0)
    assert(est == nDup * Dedup.AuditSampleDen)
    // sample fraction near 1/den (hash-uniform)
    val frac = r.getAs[Double]("sampled_frac")
    assert(math.abs(frac - 1.0 / Dedup.AuditSampleDen) < 0.15,
      s"sample fraction $frac far from 1/${Dedup.AuditSampleDen}")
    // the estimate brackets the TRUE pair count (full verification)
    val truePairs = Dedup.minhashNearDups(docs).count()
    assert(truePairs > 0)
    assert(est >= truePairs / 3 && est <= truePairs * 3,
      s"estimate $est vs true $truePairs out of the 3x envelope")
    // determinism: a second run is identical
    val r2 = Dedup.dupRateAudit(docs).head()
    assert(r2.getAs[Long]("n_dup_sampled") == nDup &&
      r2.getAs[Long]("n_sampled") == nSamp)
    spark.catalog.clearCache()
  }

  test("ngramNovelty: first doc fully novel, partial overlap rated, " +
      "exact copy rated zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // shingles {abc, bcd} — both novel
      (2L, "a b c e"),   // {abc, bce} — abc seen in doc 1
      (3L, "a b c d"),   // exact copy — nothing novel
      (4L, "x y"))       // < 3 tokens — dropped
      .toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
  }

  test("ngramNovelty fixture invariants: novel counts partition the " +
      "distinct shingle set, first doc fully novel, rates in [0,1]") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.ngramNovelty(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val totalDistinct = Dedup.shingleHashes(docs)
      .selectExpr("explode(hashes) AS hsh").distinct().count()
    assert(out.map(_._3).sum == totalDistinct)
    val firstDoc = out.minBy(_._1)
    assert(firstDoc._4 == 1.0, "the earliest doc is fully novel")
    out.foreach { case (id, n, nov, rate) =>
      assert(nov >= 0 && nov <= n, s"doc $id")
      assert(rate >= 0.0 && rate <= 1.0, s"doc $id")
    }
  }

  test("setSimJoin (q192): prefix filtering is COMPLETE — equals the " +
      "brute-force all-pairs join on the fixture corpus; boundary " +
      "pair at exactly tau kept, below-tau pruned") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("inter"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("jaccard"))))
      .toSet
    val filtered = key(Dedup.setSimJoin(docs))
    // brute force: every shingle-sharing pair scored exactly, same
    // cut — equality proves the prefix+length filters drop NOTHING
    val toks = Dedup.shingleHashes(docs)
      .select(col("doc_id"), explode(col("hashes")).as("tok"))
    val sz = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val brute = key(toks.select(col("doc_id").as("doc_a"), col("tok"))
      .join(toks.select(col("doc_id").as("doc_b"), col("tok")), "tok")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        "doc_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= Dedup.SetJoinTau)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard")))
    assert(filtered == brute)
    info(s"fixture pairs at tau=${Dedup.SetJoinTau}: ${filtered.size}")
    // boundary semantics on SHINGLE sets: 4-shingle docs sharing 3
    // -> J = 3/5 = tau exactly (kept: >=, not >); docs 3/4 share 2
    // of 6 -> 1/3 < tau (pruned); identical docs -> J = 1
    val hand = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e g"),
      (3L, "p q r s t u"), (4L, "p q r s x y"),
      (5L, "m n o u"), (6L, "m n o u")).toDF("doc_id", "text")
    val got = Dedup.setSimJoin(hand).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(got.keySet == Set((1L, 2L), (5L, 6L)), s"got $got")
    assert(got((1L, 2L)) == 0.6)
    assert(got((5L, 6L)) == 1.0)
  }

  test("setSimJoinCollapsed (q226): exact on the Zipf-adversarial " +
      "duplicate flood — pair-for-pair, bit-for-bit equal to " +
      "setSimJoin; the flood class is pure expansion and cross-class " +
      "members inherit the representative verdict") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Zipf-adversarial fixture: the real corpus PLUS a planted
    // 40-copy boilerplate class (one identical head-token set — the
    // regime where q192's prefix buckets grow with the copy count,
    // since every copy's "rarest" token is the same corpus-hot
    // shingle) and a 2-copy near-dup satellite class overlapping the
    // flood at J = 8/9 >= tau (cross-class expansion must fire)
    val docs0 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val boiler =
      "click here to accept cookies and continue to the site"
    val flood = spark.range(40)
      .select((col("id") + 1000000L).as("doc_id"),
        lit(boiler).as("text"))
    val sats = spark.range(2)
      .select((col("id") + 2000000L).as("doc_id"),
        lit(boiler + " today").as("text"))
    val docs = docs0.unionByName(flood).unionByName(sats)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("inter"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("jaccard"))))
      .toSet
    val collapsed = key(Dedup.setSimJoinCollapsed(docs))
    val plain = key(Dedup.setSimJoin(docs))
    assert(collapsed == plain,
      s"collapse changed the answer: +${(collapsed -- plain).take(5)} " +
        s"-${(plain -- collapsed).take(5)}")
    // the flood class emits exactly C(40,2) J=1 pairs (the OUTPUT is
    // quadratic in the class — the fallback's claim is that nothing
    // ELSE is), and each satellite pairs with every flood member
    val intraFlood = collapsed.filter { case (a, b, _, j) =>
      a >= 1000000L && b < 2000000L &&
        j == java.lang.Double.doubleToLongBits(1.0)
    }
    assert(intraFlood.size >= 40 * 39 / 2,
      s"flood expansion incomplete: ${intraFlood.size}")
    val crossSat = collapsed.count { case (a, b, _, _) =>
      a >= 1000000L && a < 2000000L && b >= 2000000L
    }
    assert(crossSat == 80,
      s"satellite x flood cross-class expansion: $crossSat != 80")
  }

  test("setSimJoinCapped (q227): inert on the natural corpus (equals " +
      "setSimJoin bit-for-bit); on the cross-class hot-block fixture " +
      "every sub-cap-anchored pair survives with exact numbers and " +
      "the only-hot-prefix pair is out of contract") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("inter"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("jaccard"))))
      .toSet
    // (a) natural corpus: no token reaches the cap (max natural df
    // 25 at sf0.1, cap 64), so the capped join IS q192
    val docs0 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    assert(key(Dedup.setSimJoinCapped(docs0)) ==
      key(Dedup.setSimJoin(docs0)), "cap fired on natural data")
    // (b) the regime collapse can't fix: many DISTINCT classes
    // sharing one hot boilerplate block. 100 pair-classes, each
    // "<hot block> <class tail>": the block's shingles have df=200
    // (over cap), each tail's have df=2 (under) — tails anchor
    // every true pair, the hot block anchors nothing
    val hot = "one two three four five six seven eight nine ten " +
      "eleven twelve"
    // 8-word class tails keep the boundary docs (hot block alone,
    // 10 shingles) BELOW tau against every class doc (J = 10/18,
    // and the length filter 10 < 0.6*18 prunes first) — the only
    // qualifying pairs are the 100 within-class twins and the
    // boundary twins themselves
    val classes = spark.range(100).select(col("id"))
      .select(explode(array(lit(0L), lit(1L))).as("copy"), col("id"))
      .select((col("id") * 2 + col("copy") + 1000000L).as("doc_id"),
        concat(lit(hot + " "),
          concat_ws(" ", col("id").cast("string"),
            (col("id") + 7777).cast("string"),
            (col("id") + 31337).cast("string"),
            (col("id") * 3 + 11).cast("string"),
            (col("id") + 424242).cast("string"),
            (col("id") * 5 + 3).cast("string"),
            (col("id") + 987654).cast("string"),
            (col("id") * 7 + 1).cast("string"))).as("text"))
    val capped = key(Dedup.setSimJoinCapped(classes))
    val plain = key(Dedup.setSimJoin(classes))
    // every class's two members share their full set (J = 1): found
    // by BOTH joins via the sub-cap tail anchors, exact numbers
    assert(capped == plain,
      "hot-block fixture: capped lost a sub-cap-anchored pair")
    assert(capped.size == 100 && capped.forall(_._4 ==
      java.lang.Double.doubleToLongBits(1.0)),
      s"expected the 100 within-class J=1 pairs, got ${capped.size}")
    // (c) the documented boundary: two docs whose ONLY shared prefix
    // tokens are the over-cap hot block (identical text = the whole
    // set is the hot block, all anchors over cap) are out of
    // contract for the capped join while q192 still finds them
    val boundary = classes.unionByName(Seq(
      (3000000L, hot), (3000001L, hot)).toDF("doc_id", "text"))
    val cappedB = key(Dedup.setSimJoinCapped(boundary))
    val plainB = key(Dedup.setSimJoin(boundary))
    assert(plainB.exists(p => p._1 == 3000000L && p._2 == 3000001L),
      "fixture broke: q192 must find the hot-only pair")
    assert(!cappedB.exists(p => p._1 == 3000000L && p._2 == 3000001L),
      "the only-hot-prefix pair must be out of the capped contract")
    assert(cappedB == plainB.filterNot(p =>
      p._1 == 3000000L && p._2 == 3000001L),
      "cap dropped more than the documented boundary pair")
  }

  test("exactNgramDecontam (q233): one shared 13-token gram flags " +
      "at any offset; a 12-token overlap does NOT (the exactness " +
      "boundary); short and clean docs carry zero counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val benchRun = (1 to 13).map(i => s"b$i").mkString(" ")
    val twelve = (1 to 12).map(i => s"b$i").mkString(" ")
    val filler = (1 to 20).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      // benchmark set (doc_id < 20): carries the 13-token run
      (5L, s"$filler $benchRun more words here"),
      // contaminated: embeds the EXACT run at a shifted offset
      (100L, s"x0 x1 x2 $benchRun y1 y2"),
      // NOT contaminated: only 12 of the 13 tokens, in order
      (101L, s"x0 x1 x2 $twelve y1 y2 y3 y4"),
      // clean long doc
      (102L, (1 to 40).map(i => s"c$i").mkString(" ")),
      // short doc: fewer than 13 tokens, zero grams
      (103L, "tiny doc under thirteen tokens total"))
      .toDF("doc_id", "text")
    val out = Dedup.exactNgramDecontam(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out.keySet == Set(100L, 101L, 102L, 103L),
      "benchmark docs must not appear in the screened corpus")
    val (g100, s100, c100) = out(100L)
    assert(c100 && s100 >= 1L, s"doc 100 must flag: $s100")
    assert(out(101L)._3 == false,
      "a 12-token overlap must NOT flag — the rule is exactly 13")
    assert(out(101L)._2 == 0L)
    assert(out(102L) == ((28L, 0L, false)), s"clean: ${out(102L)}")
    assert(out(103L) == ((0L, 0L, false)),
      s"short doc must carry zero grams: ${out(103L)}")
    // the flag counts DISTINCT shared grams: doc 100 embeds the run
    // once -> exactly the grams fully inside the benchmark run
    assert(s100 == 1L, s"one embedded 13-run = one shared gram: $s100")
    assert(g100 == (3 + 13 + 2) - 12, s"gram count: $g100")
  }

  test("gramDupHistogram / topDuplicatedGrams (q235/q236): a gram " +
      "planted in 20 documents lands in the 16+ bucket and ranks " +
      "first with df exactly 20; singleton grams fill the 1 bucket; " +
      "bucket gram-counts partition the distinct-gram vocabulary") {
    import spark.implicits._
    val run = (1 to 13).map(i => s"r$i").mkString(" ")
    // 20 docs embed the SAME 13-run at different offsets with unique
    // tails; 10 docs are entirely unique
    val carriers = (0 until 20).map { i =>
      (i.toLong, s"u${i}a u${i}b $run u${i}c u${i}d u${i}e")
    }
    val unique = (0 until 10).map { i =>
      (100L + i, (1 to 18).map(j => s"q$i-$j").mkString(" "))
    }
    val docs = (carriers ++ unique).toDF("doc_id", "text")
    val hist = Dedup.gramDupHistogram(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // the planted gram is the ONLY one in 16+ (20 occurrences);
    // every other gram carries a unique token, so df = 1
    assert(hist("16+") == ((1L, 20L)), s"16+: ${hist.get("16+")}")
    assert(hist.keySet == Set("1", "16+"), s"buckets: ${hist.keySet}")
    // carriers: 18 tokens -> 6 grams each, 1 shared + 5 unique;
    // unique docs: 6 grams each
    assert(hist("1") == ((20L * 5 + 10L * 6, 20L * 5 + 10L * 6)),
      s"singletons: ${hist("1")}")
    val top = Dedup.topDuplicatedGrams(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top.length == math.min(Dedup.MemAuditTopK,
      20 * 5 + 10 * 6 + 1))
    val first = top.minBy(_._3)
    assert(first._3 == 1L && first._2 == 20L,
      s"rank 1 must be the planted gram at df 20: $first")
    // ranks contiguous, df non-increasing
    assert(top.map(_._3).sorted.toSeq ==
      (1L to top.length.toLong).toSeq)
    val byRank = top.sortBy(_._3)
    byRank.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, "df must be non-increasing in rank")
    }
  }

  test("q261 CDC: chunks tile the document exactly and boundaries " +
      "re-synchronize after an insertion (the content-defined " +
      "property fixed blocking lacks)") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and " +
      "then runs far away into the deep dark woods tonight"
    val shifted = "Z" + base // one-char insertion at the front
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val out = Dedup.cdcChunks(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    // tiling: offsets contiguous from 0 to len, lengths positive
    for ((id, rows) <- out) {
      val sorted = rows.sortBy(_.getAs[Long]("chunk_idx"))
      val len = if (id == 1L) base.length else shifted.length
      var pos = 0L
      for (r <- sorted) {
        assert(r.getAs[Long]("start") == pos, s"gap in doc $id")
        assert(r.getAs[Long]("n_chars") > 0)
        pos += r.getAs[Long]("n_chars")
      }
      assert(pos == len.toLong, s"doc $id chunks must cover the text")
    }
    // re-synchronization: past the first boundary after the
    // insertion point, both docs produce identical chunk digests
    val d1 = out(1L).map(_.getAs[String]("digest")).toSet
    val d2 = out(2L).map(_.getAs[String]("digest")).toSet
    val shared = d1.intersect(d2)
    assert(shared.nonEmpty,
      "a one-char insertion must not change every chunk digest")
  }

  test("q262: duplicated chunks report occurrence counts, document " +
      "spread, and the content-addressed savings") {
    import spark.implicits._
    val t = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj " +
      "kkkk llll mmmm nnnn oooo pppp qqqq rrrr ssss tttt"
    val docs = Seq((1L, t), (2L, t), (3L, "zzzz " + t))
      .toDF("doc_id", "text")
    val stats = Dedup.cdcDedupStats(docs).collect()
    assert(stats.nonEmpty, "identical docs must share chunks")
    for (r <- stats) {
      assert(r.getAs[Long]("n_occ") >= 2L)
      assert(r.getAs[Long]("n_docs") >= 1L)
      assert(r.getAs[Long]("saved_chars") ==
        (r.getAs[Long]("n_occ") - 1L) * r.getAs[Long]("n_chars"))
    }
    // docs 1 and 2 are identical: every one of their chunks occurs
    // at least twice, so total occurrences cover both docs' chunks
    val chunks1 = Dedup.cdcChunks(docs.filter(org.apache.spark.sql.functions.col("doc_id") === 1L))
      .count()
    assert(stats.map(_.getAs[Long]("n_occ")).sum >= 2 * chunks1)
  }

  test("the q261 plan is one row-local projection — no shuffle") {
    import spark.implicits._
    val plan = Dedup.cdcChunks(Seq((1L, "abcdefghij"))
        .toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"CDC must not shuffle:\n$plan")
  }

  test("q277: CDC chunk sharing catches an insertion-shifted " +
      "near-dup (where fixed blocking would miss) and scores exact " +
      "chunk-set Jaccard") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and " +
      "then runs far away into the deep dark woods tonight while " +
      "owls watch from the tall trees above the silent river bend"
    val docs = Seq(
      (1L, base),
      (2L, "PREFIX INSERTED " + base), // shifted near-dup
      (3L, "totally unrelated content about spark query planning " +
        "and catalyst optimizer rules for distributed execution"))
      .toDF("doc_id", "text")
    val pairs = Dedup.cdcNearDups(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("cjaccard")))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"the shifted near-dup must be found, got ${pairs.toSeq}")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
    val j = pairs.find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(j >= Dedup.CdcJaccard && j < 1.0,
      s"shifted dup must score high but below 1.0, got $j")
  }

  test("q286: a repeated in-doc paragraph drops (first occurrence " +
      "stays, order kept); unique docs pass through untouched") {
    import spark.implicits._
    val p = Dedup.ParaWords
    val words = (1 to 2 * p).map(i => s"w$i")
    // doc 3 (%3==0): the fixture re-appends paragraph 0 -> dropped;
    // doc 4: untouched
    val docs = Seq((3L, words.mkString(" ")), (4L, words.mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.withinDocParagraphDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(3L).getAs[Long]("n_paras") == 3L)
    assert(out(3L).getAs[Long]("n_kept") == 2L)
    assert(out(3L).getAs[Long]("n_dropped") == 1L)
    assert(out(4L).getAs[Long]("n_dropped") == 0L)
    // the clean text of doc 3 equals doc 4's clean text (both are
    // the original two paragraphs, order kept)
    assert(out(3L).getAs[String]("clean_md5") ==
      out(4L).getAs[String]("clean_md5"))
    assert(out(3L).getAs[Long]("n_chars_clean") ==
      words.mkString(" ").length.toLong)
  }

  test("q287: per-source rates are exact-count divisions and sum " +
      "consistency holds against the q233 screen") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val screen = Dedup.exactNgramDecontam(docs).collect()
    val report = Dedup.sourceContamination(docs).collect()
    assert(report.map(_.getAs[Long]("n_docs")).sum == screen.length)
    assert(report.map(_.getAs[Long]("n_contaminated")).sum ==
      screen.count(_.getAs[Boolean]("contaminated")))
    for (r <- report)
      assert(r.getAs[Double]("contamination_rate") ==
        r.getAs[Long]("n_contaminated").toDouble /
          r.getAs[Long]("n_docs").toDouble)
  }

  test("q288 consensus: pair flags agree with each family's own " +
      "output and n_methods counts them exactly") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.dedupConsensus(docs).collect()
    assert(out.nonEmpty)
    val names = Seq("minhash", "ngram", "winnow", "simhash", "cdc")
    for (r <- out) {
      val flags = names.map(r.getAs[Boolean])
      assert(flags.exists(identity), "a keyless pair cannot exist")
      assert(r.getAs[Long]("n_methods") ==
        flags.count(identity).toLong)
    }
    // cross-check one family end to end: every minhash pair is
    // flagged minhash, and no non-pair is
    val mh = Dedup.minhashNearDups(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    val flagged = out.filter(_.getAs[Boolean]("minhash"))
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    assert(flagged == mh)
    // the corpus's true dups are multi-method: some pair reaches
    // full or near-full agreement
    assert(out.map(_.getAs[Long]("n_methods")).max >= 4L,
      "true dups should be found by most families")
  }

  test("q311 cross-source flows: a planted cross-source mirror " +
      "lands in ONE unordered cell, within-source dups on the " +
      "diagonal, pair totals conserved") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi rho sigma tau"
    val docs = Seq(
      (1L, text, "web"), (2L, text, "books"),   // cross-source pair
      (3L, text + " tail", "web"),              // near-dup of 1 (web)
      (4L, "totally different words entirely here now", "web"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.crossSourceDups(docs).collect()
      .map(r => (r.getAs[String]("source_a"),
        r.getAs[String]("source_b")) -> r.getAs[Long]("n_pairs"))
      .toMap
    assert(out.getOrElse(("books", "web"), 0L) >= 1L,
      s"cross-source cell missing: $out")
    assert(!out.contains(("web", "books")),
      "cells must be unordered (lo, hi)")
    val totalPairs = Dedup.minhashNearDups(docs).count()
    assert(out.values.sum == totalPairs, "pair totals conserved")
  }
}
