package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions.{col, explode, length, size, split}
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  test("repetitionStats hand-checked: runs, top-word mass, dup 2-grams") {
    val df = Seq(
      (1L, "a a a b a a"),   // max_run 3; 'a' 5/6; 2-grams: aa,aa,ab,ba,aa -> 3 distinct of 5
      (2L, "x y z w"),       // no repetition
      (3L, "solo"))          // single token: dup frac NULL
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), Option(r.get(3)))).toMap
    assert(out(1L)._1 == 3)
    assert(math.abs(out(1L)._2 - 5.0 / 6) < 1e-12)
    assert(math.abs(out(1L)._3.get.asInstanceOf[Double] - (1.0 - 3.0 / 5)) < 1e-12)
    assert(out(2L) == ((1L, 0.25, Some(0.0))))
    assert(out(3L)._1 == 1L && out(3L)._3.isEmpty)
  }

  test("nbQualityFilter hand-checked: Laplace likelihoods, OOV floor, " +
      "strict-positive keep threshold") {
    // train: pos {good good clean}, neg {spam spam junk}
    // V = {good, clean, spam, junk}, tot_pos = tot_neg = 3, priors equal
    val df = Seq(
      (1L, "good good clean", "p"),
      (2L, "spam spam junk", "n"),
      (3L, "good clean", "u"),
      (4L, "spam junk junk", "u"),
      (5L, "zzz qqq", "u")) // fully OOV: floor terms cancel exactly
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.nbQualityFilter(df, Seq("p"), Seq("n"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    // lpdiff(good) = ln((2+1)/7) − ln((0+1)/7) = ln 3; clean → ln 2;
    // spam → −ln 3; junk → −ln 2; prior_diff = 0
    assert(math.abs(out(3L)._2 - math.log(6)) < 1e-12)
    assert(out(3L)._3 && out(3L)._1 == 2L)
    assert(math.abs(out(4L)._2 + math.log(12)) < 1e-12)
    assert(!out(4L)._3)
    // symmetric training mass ⇒ the OOV floor is identical for both
    // classes: margin exactly 0, and keep is STRICTLY margin > 0
    assert(out(5L)._2 == 0.0 && !out(5L)._3)
    // training docs classify themselves correctly (fit sanity)
    assert(out(1L)._3 && !out(2L)._3)
  }

  test("knBigramNll hand-checked: KN closed form, continuation counts, " +
      "sub-2-token docs excluded") {
    // corpus: d1 "a b a b" → bigrams {a b:2, b a:1}; d2 "b a" → {b a:1};
    // d3 "c" → none. Types: {a b (cb=2), b a (cb=2)}; c(a)=c(b)=2,
    // N1+(a,·)=N1+(b,·)=1, N1+(·,a)=N1+(·,b)=1, |types|=2.
    // P(b|a) = max(2−.75,0)/2 + (.75·1/2)·(1/2) = 0.8125 = P(a|b)
    val df = Seq(
      (1L, "a b a b"),
      (2L, "b a"),
      (3L, "c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.knBigramNll(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expNll = -math.log(0.8125)
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - expNll) < 1e-12)
    assert(out(2L)._1 == 1L && math.abs(out(2L)._2 - expNll) < 1e-12)
    assert(!out.contains(3L), "a bigram-less doc must emit no row")
  }

  test("blocklistScreen counts overlapping hits (Aho-Corasick output " +
      "merging across suffix phrases) and flags clean docs") {
    val df = Seq(
      (1L, "ababa"),
      (2L, "xyz"))
      .toDF("doc_id", "text")
    val phrases = Seq("ab", "ba", "aba", "zz")
    val out = TextAnalysis.blocklistScreen(df, phrases).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // "ababa": ab@{1,3}=2, ba@{2,4}=2, aba@{1,3}=2 (overlapping), zz=0
    assert(out(1L) == ((6L, 3L, false)))
    assert(out(2L) == ((0L, 0L, true)))
  }

  test("repetitionSignals hand-checked: top-gram mass, overlapping " +
      "occurrences, beyond-first dup mass, Table-A1 verdicts") {
    val df = Seq(
      (1L, "a b a b a b c"),
      (2L, ('a' to 'y').mkString(" ")), // 25 distinct tokens: even a
      // singleton top-4-gram is 7/49 = 0.14 < the 0.16 threshold (on
      // SHORT docs the top-gram statistic rejects by construction —
      // Gopher pairs it with a min-length gate)
      (3L, "solo"),
      (4L, "a b c d e a b c d e f"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc1: total 13 chars; top-2 "a b"x3 -> 9/13; top-3 ties at
    // tf=2, lexicographically first "a b a" -> 10/13; top-4
    // "a b a b"x2 (overlapping!) -> 14/13 > 1 (the statistic counts
    // every occurrence's chars); no duplicated 5-grams
    assert(math.abs(out(1L).getAs[Double]("top2_frac") - 9.0 / 13) < 1e-12)
    assert(math.abs(out(1L).getAs[Double]("top3_frac") - 10.0 / 13) < 1e-12)
    assert(math.abs(out(1L).getAs[Double]("top4_frac") - 14.0 / 13) < 1e-12)
    assert(out(1L).getAs[Double]("dup5_frac") == 0.0)
    assert(!out(1L).getAs[Boolean]("kept"))
    // doc2: all tokens distinct -> every top frac is one gram's mass
    // (tf=1), all dup fracs 0, kept
    assert(out(2L).getAs[Double]("dup5_frac") == 0.0 &&
      out(2L).getAs[Boolean]("kept"))
    // doc3: single token, no grams at all -> all 0, kept
    assert(out(3L).getAs[Double]("top2_frac") == 0.0 &&
      out(3L).getAs[Boolean]("kept"))
    // doc4: "a b c d e" repeats -> dup5 = (2-1)*9 / 21
    assert(math.abs(out(4L).getAs[Double]("dup5_frac") - 9.0 / 21) < 1e-12)
    assert(!out(4L).getAs[Boolean]("kept"))
  }

  test("piiScrub counts and redacts emails and phone numbers") {
    val df = Seq(
      (1L, "mail bob@example.com or call 555-123-4567 now"),
      (2L, "clean text only"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1)
    assert(out(1L)._3 == "mail <EMAIL> or call <PHONE> now")
    assert(out(2L) == ((0L, 0L, "clean text only")))
  }

  test("tfidf ranks rare terms above ubiquitous ones") {
    val df = Seq(
      (1L, "alpha alpha alpha common common"),
      (2L, "beta common"),
      (3L, "gamma common"),
      (4L, "delta common")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, topK = 2)
      .select("doc_id", "term", "tf", "df", "rank")
      .as[(Long, String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5)).toMap
    // "common" appears in all 4 docs -> idf = ln(1) = 0: never beats
    // a doc-unique term
    assert(out(1L).head._2 == "alpha" && out(1L).head._4 == 1)
    assert(out(2L).head._2 == "beta")
    // "common" still surfaces as rank 2 (tfidf 0 beats nothing else)
    assert(out(2L)(1)._2 == "common" && out(2L)(1)._4 == 4)
    // tf counts repeats within the doc
    assert(out(1L).head._3 == 3)
  }

  test("bm25 scores, ranks and length-normalizes hand-checked docs") {
    val df = Seq(
      (1L, "spark spark stream"),
      (2L, "merge vector vector vector"),
      (3L, "noise words only here"),
      (4L, "spark")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopDocs(df)
      .select("doc_id", "n_terms_hit", "score", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    // doc 3 holds no query term and must not appear; the rare-term
    // tf-3 doc outranks the common-term docs, and the short doc is
    // length-penalized below the tf-2 doc
    assert(out.map(_._1).toSeq == Seq(2L, 1L, 4L))
    assert(out.map(_._2).toSeq == Seq(2L, 2L, 1L))
    assert(out.map(_._4).toSeq == Seq(1L, 2L, 3L))
    // doc 4 closed form: idf(spark) = ln 2 (df 2 of N 4), tf 1,
    // dl 1, avgdl (3+4+4+1)/4 = 3:
    // ln2 · (1·2.2) / (1 + 1.2·(0.25 + 0.75·1/3)) = ln2 · 2.2/1.6
    assert(math.abs(out(2)._3 - math.log(2.0) * (2.2 / 1.6)) < 1e-12)
  }

  test("multi-query bm25: query-0 slice equals the single-query ranking") {
    // df/N/avgdl are corpus properties shared across queries, so
    // restricting the multi-query result to query 0 (whose term set
    // IS Bm25Query) must reproduce bm25TopDocs exactly — scores,
    // term hits, and ranks
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val single = TextAnalysis.bm25TopDocs(docs)
      .select("doc_id", "n_terms_hit", "score", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val multi0 = TextAnalysis.bm25TopDocsMulti(docs)
      .filter(col("query_id") === 0L)
      .select("doc_id", "n_terms_hit", "score", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(multi0 == single)
    // and every query produces a full, correctly-ordered top-k
    val all = TextAnalysis.bm25TopDocsMulti(docs)
      .select("query_id", "rank").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(all.keySet == TextAnalysis.Bm25QuerySet.map(_._1).toSet)
    all.values.foreach(rs =>
      assert(rs == (1L to TextAnalysis.Bm25TopK.toLong)))
  }

  test("textStats computes hand-checked values") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(df).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_distinct_tokens") == 5) // "the" twice
    assert(r.getAs[Long]("n_stopwords") == 3)       // the, on, the
    assert(r.getAs[Long]("n_chars") == 22)
    assert(r.getAs[Long]("sum_token_chars") == 17)
    assert(r.getAs[Long]("est_bpe_tokens") == 6)    // ceil(22/4)
    assert(math.abs(r.getAs[Double]("avg_token_len") - 17.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.5) < 1e-12)
  }

  test("langId picks the profile with the most matches, en precedence on ties") {
    val df = Seq(
      (1L, "the cat and the dog"),     // en
      (2L, "der hund und die katze"),  // de
      (3L, "qq ww zz")                 // no matches anywhere -> en by precedence
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "en")
  }

  test("simhash: identical docs distance 0, near docs < far docs") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val sims = TextAnalysis.simhashDocs(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sims(a) ^ sims(b))
    assert(ham(1L, 2L) == 0)
    assert(ham(1L, 3L) < ham(1L, 4L))
  }

  test("simhashDups finds exact-duplicate pair via banded join") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.simhashDups(df)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("chunkDocs: overlapping windows cover the text exactly") {
    import spark.implicits._
    val text = ("a" * 529) // 529 chars: 1 + ceil((529-200)/160) = 4 chunks
    val df = Seq((1L, text), (2L, "short")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(df).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_len")))
      .sortBy(t => (t._1, t._2))
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.map(_._2) sameElements Array(0L, 1L, 2L, 3L))
    assert(doc1.map(_._3) sameElements Array(1L, 161L, 321L, 481L))
    // full windows except the last (529 - 480 = 49 chars)
    assert(doc1.map(_._4) sameElements Array(200L, 200L, 200L, 49L))
    // stride 160 < size 200 -> consecutive chunks overlap by 40
    // and every char position is covered
    assert(doc1.last._3 + doc1.last._4 - 1 == 529L)
    // a short doc still yields exactly one (short) chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 1L, 5L)))
  }

  test("unigramNll: rare-token docs score higher than common-token docs") {
    import spark.implicits._
    // corpus: "the" dominates; doc 3 is all rare tokens
    val df = Seq(
      (1L, "the the the the"),
      (2L, "the the cat"),
      (3L, "zyx qwv ptk")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramNll(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Double]("avg_nll"),
          r.getAs[Double]("perplexity"))).toMap
    assert(out(1L)._1 == 4)
    // doc 1 = pure majority token -> lowest NLL; doc 3 = singletons ->
    // highest; perplexity = exp(avg_nll) and p(the) = 6/10
    assert(out(1L)._2 < out(2L)._2 && out(2L)._2 < out(3L)._2)
    assert(math.abs(out(1L)._2 - (-math.log(6.0 / 10.0))) < 1e-12)
    assert(math.abs(out(1L)._3 - math.exp(out(1L)._2)) < 1e-12)
    assert(math.abs(out(3L)._2 - (-math.log(1.0 / 10.0))) < 1e-12)
  }

  test("heavy hitters: sketch pre-filter reproduces the exact GROUP BY") {
    import spark.implicits._
    // 100 tokens: 'hot' x 40, 'warm' x 3 (above the 2% cut = 2),
    // and 57 singletons (the tail the sketch filter drops early)
    val text = (Seq.fill(40)("hot") ++ Seq.fill(3)("warm") ++
      (1 to 57).map(i => s"tail$i")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.heavyHitters(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 40L, "warm" -> 3L))
    spark.catalog.clearCache()
  }

  test("heavy hitters match the plain aggregation on the fixture corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = TextAnalysis.heavyHitters(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tokens = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val total = tokens.count()
    val thr = math.max(1L, (total * TextAnalysis.HeavyFraction).toLong)
    val exp = tokens.groupBy("token").count()
      .filter(col("count") >= thr).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp && got.nonEmpty)
    spark.catalog.clearCache()
  }

  test("qualityFilter: each rule fires on a crafted doc, first " +
      "failing rule wins the precedence, clean text passes") {
    import TextAnalysis._
    val clean = (("the quick brown fox jumps over the lazy dog and " *
      3) + "runs far away home again today with this friend").trim
    val docs = Seq(
      1L -> clean,                                  // none
      2L -> "too short by far",                     // too_short
      3L -> Seq.fill(MaxTokens + 1)("the").mkString(" "), // too_long (precedence over repetitive)
      4L -> Seq.fill(MinTokens)("it").mkString(" "),// odd_token_len (< 3; beats repetitive)
      5L -> (clean + " " + "#!@%$^&*()#!@%$^&*()" * 3), // symbolic
      6L -> Seq.tabulate(MinTokens)(i => s"word$i xylophone".split(" ")(i % 2))
        .mkString(" "),                              // low_stopword
      7L -> (("the cat " * 20).trim)                 // repetitive (has stopwords, dup tokens)
    ).toDF("doc_id", "text")
    val got = qualityFilter(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("reject_reason"), r.getAs[Boolean]("kept")))
      .toMap
    assert(got(1L) == ("none", true), s"clean doc: ${got(1L)}")
    assert(got(2L)._1 == "too_short")
    assert(got(3L)._1 == "too_long")
    assert(got(4L)._1 == "odd_token_len")
    assert(got(5L)._1 == "symbolic")
    assert(got(6L)._1 == "low_stopword")
    assert(got(7L)._1 == "repetitive")
    assert(got.filter(_._2._1 != "none").forall(!_._2._2))
  }

  test("targetLmScore: target-domain docs score lower cross-entropy " +
      "than the rest; n_bigrams and ppl are consistent") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.targetLmScore(docs).cache()
    val rows = out.collect()
    assert(rows.length == docs.count())
    // structural pins: n_bigrams = tokens - 1; ppl = exp(ce)
    val nTok = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == nTok(r.getAs[Long]("doc_id")) - 1)
      assert(math.abs(r.getAs[Double]("ppl") -
        math.exp(r.getAs[Double]("cross_entropy"))) < 1e-9)
    }
    // the whole point: the target domain looks like itself — its
    // mean cross-entropy sits clearly below the other sources'
    val tgt = docs.filter(col("source") === TextAnalysis.TargetLmSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val (t, o) = rows.partition(r => tgt(r.getAs[Long]("doc_id")))
    assert(t.nonEmpty && o.nonEmpty)
    def mean(xs: Array[org.apache.spark.sql.Row]): Double =
      xs.map(_.getAs[Double]("cross_entropy")).sum / xs.length
    assert(mean(t) < mean(o) - 0.1,
      s"target ${mean(t)} vs others ${mean(o)}")
    out.unpersist()
  }

  test("pmiCollocations hand-checked: counts, PMI closed form, " +
      "count floor, rank order") {
    // corpus: 12 tokens, 10 bigrams
    //   c(new)=3 c(york)=3 c(red)=2 c(car)=2 c(blue)=1 c(dog)=1
    //   c(new york)=3, c(york new)=2, everything else 1
    val df = Seq(
      (1L, "new york new york new york"),
      (2L, "red car blue car red dog"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.pmiCollocations(df, minCount = 2L, topK = 10)
      .collect()
    // the floor removes every count-1 pair
    assert(rows.length == 2)
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ny = byPair(("new", "york"))
    assert(ny.getAs[Long]("cb") == 3 && ny.getAs[Long]("cu1") == 3 &&
      ny.getAs[Long]("cu2") == 3)
    // pmi = ln(c(uv)·N·N / (N₂·c(u)·c(v))) = ln(3·12·12/(10·3·3))
    assert(math.abs(ny.getAs[Double]("pmi") -
      math.log(3.0 * 12 * 12 / (10.0 * 3 * 3))) < 1e-12)
    val yn = byPair(("york", "new"))
    assert(math.abs(yn.getAs[Double]("pmi") -
      math.log(2.0 * 12 * 12 / (10.0 * 2 * 3 * 3 / 2))) < 1e-12) // ln(2·144/90)
    // ranking: the stronger association ranks first
    assert(ny.getAs[Long]("rank") == 1 && yn.getAs[Long]("rank") == 2)
  }

  test("c4LineClean hand-checked: every rule fires and the rebuilt " +
      "text is exactly the surviving lines") {
    // doc 100: 100%17!=0, 100%13!=0 → no page poison.
    //   14 tokens → 2 lines of 7.
    //   line 0: (100+0)%3=1 → '.', (100+0)%7=2 → ' javascript' ⇒ dropped
    //   line 1: (101)%3=2 → '.', (101)%7=3 → clean, 7 words ⇒ kept
    val doc100 = (1 to 14).map(i => s"w$i").mkString(" ")
    // doc 102: (102+0)%3=0 → line 0 unpunctuated ⇒ dropped;
    //   line 1 punctuated+clean ⇒ kept
    val doc102 = (1 to 14).map(i => s"x$i").mkString(" ")
    // doc 221 = 13*17 → both page poisons; every line punctuated or not
    //   is irrelevant: page dropped by lorem ipsum AND brace
    val doc221 = (1 to 21).map(i => s"y$i").mkString(" ")
    val out = TextAnalysis.c4LineClean(
      Seq((100L, doc100), (102L, doc102), (221L, doc221))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r100 = out(100L)
    assert(r100.getAs[Long]("n_lines") == 2)
    assert(r100.getAs[Long]("n_kept") == 1)
    assert(r100.getAs[String]("clean_text") ==
      (8 to 14).map(i => s"w$i").mkString(" ") + ".")
    assert(!r100.getAs[Boolean]("kept")) // 1 kept line < 3 minimum
    val r102 = out(102L)
    assert(r102.getAs[Long]("n_kept") == 1)
    assert(r102.getAs[String]("clean_text") ==
      (8 to 14).map(i => s"x$i").mkString(" ") + ".")
    val r221 = out(221L)
    assert(!r221.getAs[Boolean]("kept"))
    // the derivation really planted both page poisons
    assert(r221.getAs[Long]("n_lines") == 3)
  }

  test("c4LineClean: a long fully-clean page is kept and short or " +
      "poisoned pages are dropped") {
    // doc 1 (no poison mods): 35 tokens → 5 lines; lines with
    // (1+i)%3==0 (i=2) lose punctuation, i where (1+i)%7==2 (i=1)
    // gets javascript → kept lines are i=0,3,4 → exactly 3 ⇒ kept
    val doc1 = (1 to 35).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.c4LineClean(
      Seq((1L, doc1)).toDF("doc_id", "text")).head()
    assert(out.getAs[Long]("n_lines") == 5)
    assert(out.getAs[Long]("n_kept") == 3)
    assert(out.getAs[Boolean]("kept"))
    val lines = out.getAs[String]("clean_text").split("\n")
    assert(lines.length == 3 && lines.forall(_.endsWith(".")))
  }

  test("pmiCollocations: the fixture's top pair beats a random pair " +
      "and the floor binds") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.pmiCollocations(docs).collect()
    assert(out.nonEmpty && out.length <= TextAnalysis.PmiTopK)
    // every surviving pair respects the count floor
    out.foreach(r =>
      assert(r.getAs[Long]("cb") >= TextAnalysis.PmiMinCount))
    // ranks are 1..n and pmi is non-increasing along them
    val sorted = out.sortBy(_.getAs[Long]("rank"))
    assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
      (1L to out.length).toSeq)
    assert(sorted.sliding(2).forall {
      case Array(a, b) =>
        a.getAs[Double]("pmi") >= b.getAs[Double]("pmi")
      case _ => true
    })
  }

  test("sourceConcentration: equal sources give HHI = 1/k exactly; " +
      "a dominant source drives it toward 1; shares sum to 1") {
    import spark.implicits._
    // 4 sources, identical text -> equal token shares -> HHI = 0.25
    val eq = (1L to 8L).map(i => (i, "a b c d", s"s${i % 4}"))
      .toDF("doc_id", "text", "source")
    val o1 = TextAnalysis.sourceConcentration(eq).collect()
    assert(o1.length == 4)
    assert(o1.forall(_.getAs[Double]("hhi") == 0.25))
    assert(math.abs(o1.map(_.getAs[Double]("share")).sum - 1.0)
      < 1e-12)
    // one source 60x the text of the other
    val dom = Seq((1L, ("x " * 60).trim, "big"), (2L, "x", "small"))
      .toDF("doc_id", "text", "source")
    val o2 = TextAnalysis.sourceConcentration(dom).collect()
    assert(o2.head.getAs[Double]("hhi") > 0.9)
  }

  test("nbCalibration: bins partition the labeled set, margins " +
      "bracket, and the curve is well-ordered end to end") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.nbCalibration(docs).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(out.length == TextAnalysis.CalibrationBins)
    val labeled = docs.filter(col("source").isin(
      (TextAnalysis.NbPosSources ++ TextAnalysis.NbNegSources): _*))
      .count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == labeled)
    out.foreach { r =>
      assert(r.getAs[Long]("n_pos") >= 0 &&
        r.getAs[Long]("n_pos") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("min_margin") <=
        r.getAs[Double]("max_margin"))
    }
    // bins ordered by margin: ranges must not overlap
    out.zip(out.tail).foreach { case (a, b) =>
      assert(a.getAs[Double]("max_margin") <=
        b.getAs[Double]("min_margin"))
    }
    // a classifier trained ON these labels must separate its own
    // training data: the curve rises decisively from the bottom bin
    // to the top (the tiny sf0.001 labeled set leaves some mixing
    // in the extreme bins — ~15 docs per bin)
    val lo = out.head.getAs[Double]("frac_pos")
    val hi = out.last.getAs[Double]("frac_pos")
    assert(lo <= 1.0 / 3 && hi >= 2.0 / 3 && hi - lo >= 0.5,
      s"calibration curve too flat: bottom $lo top $hi")
  }

  test("vocabGrowth: hand corpus — one new type per decile, exact " +
      "cumulative curve") {
    import spark.implicits._
    // doc i introduces exactly one new type ti alongside t0
    val docs = (0L to 9L).map(i =>
      (i, (0L to i).map(j => s"t$j").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(out.length == 10)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("bucket") == i + 1)
      assert(r.getAs[Long]("cum_docs") == i + 1)
      assert(r.getAs[Long]("new_types") == 1L, s"bucket ${i + 1}")
      assert(r.getAs[Long]("vocab_size") == i + 1)
    }
  }

  test("vocabGrowth fixture: monotone cumulative curve, type " +
      "conservation, Heaps-sublinear tail") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.vocabGrowth(docs).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(out.length == TextAnalysis.VocabGrowthBuckets)
    assert(out.last.getAs[Long]("cum_docs") == docs.count())
    val totalTypes = docs.selectExpr("explode(split(text, ' ')) AS t")
      .select("t").distinct().count()
    assert(out.map(_.getAs[Long]("new_types")).sum == totalTypes)
    val vocab = out.map(_.getAs[Long]("vocab_size"))
    vocab.zip(vocab.tail).foreach { case (a, b) => assert(b >= a) }
    // Heaps: the late-corpus buckets mint fewer new types than the
    // first (sub-linear growth is the operative claim)
    val nt = out.map(_.getAs[Long]("new_types"))
    assert(nt.takeRight(3).sum < nt.head,
      s"late buckets ${nt.takeRight(3).sum} vs first ${nt.head}")
  }

  test("normalizedDedup: casing/punctuation twins unlock only under " +
      "the normalized digest; raw dups stay raw; clean docs unchanged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world"),        // canonical of the normalized group
      (2L, "Hello, World!"),      // unlocked: dup only after norm
      (3L, "hello   world"),      // unlocked: whitespace collapse
      (4L, "raw twin"), (5L, "raw twin"), // raw dup pair
      (6L, "unique doc")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.normalizedDedup(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getAs[Boolean]("changed"))
    assert(out(2L).getAs[Boolean]("changed"))
    Seq(2L, 3L).foreach { id =>
      assert(!out(id).getAs[Boolean]("dup_raw"))
      assert(out(id).getAs[Boolean]("dup_norm"))
      assert(out(id).getAs[Boolean]("unlocked"), s"doc $id not unlocked")
    }
    assert(!out(1L).getAs[Boolean]("dup_norm")) // min-id canonical
    assert(out(5L).getAs[Boolean]("dup_raw"))
    assert(out(5L).getAs[Boolean]("dup_norm"))
    assert(!out(5L).getAs[Boolean]("unlocked")) // already a raw dup
    assert(!out(6L).getAs[Boolean]("dup_norm"))
  }

  test("vocabCoverage: coverage is monotone in k, caps at 1.0 when k " +
      "exceeds the vocabulary, and counts occurrences not types") {
    import spark.implicits._
    // 'a' dominates occurrences: top-1 coverage far above 1/|V|
    val docs = Seq((1L, "a a a a a a a a b c"), (2L, "a a d e f g"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, Seq(1, 2, 100)).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(out(1L).getAs[Double]("coverage") == 10.0 / 16.0)
    assert(out(1L).getAs[Long]("n_types_kept") == 1L)
    assert(out(2L).getAs[Double]("coverage") >
      out(1L).getAs[Double]("coverage"))
    assert(out(100L).getAs[Double]("coverage") == 1.0)
    assert(out(100L).getAs[Long]("n_types_kept") == 7L)
    assert(out(100L).getAs[Long]("total_tokens") == 16L)
  }

  test("zipfFit: an exact power-law corpus recovers its exponent " +
      "with r2 ~ 1; a uniform corpus fits slope ~ 0 and is not " +
      "zipf-like") {
    import spark.implicits._
    // exact f(r) = 1024 / r for ranks 1..16: term t{r} repeated
    // floor(1024/r) times — integer counts, but the fit on the top
    // 16 ranks should land near s = -1 with high r2
    val zipfText = (1 to 16).flatMap(r =>
      Seq.fill(1024 / r)(s"t$r")).mkString(" ")
    val zipf = Seq((1L, zipfText)).toDF("doc_id", "text")
    val zf = TextAnalysis.zipfFit(zipf, topRanks = 16).head()
    assert(zf.getAs[Long]("n_ranks") == 16L)
    val s = zf.getAs[Double]("slope")
    assert(math.abs(s + 1.0) < 0.02, s"exponent $s far from -1")
    assert(zf.getAs[Double]("r2") > 0.999)
    assert(zf.getAs[Boolean]("zipf_like"))
    // uniform counts: slope ~ 0, NOT zipf-like
    val uniText = (1 to 16).flatMap(r =>
      Seq.fill(64)(s"u$r")).mkString(" ")
    val uni = TextAnalysis.zipfFit(
      Seq((1L, uniText)).toDF("doc_id", "text"), topRanks = 16).head()
    assert(math.abs(uni.getAs[Double]("slope")) < 1e-9)
    assert(!uni.getAs[Boolean]("zipf_like"))
  }

  test("sourceJsd: identical sources score EXACTLY zero, disjoint " +
      "sources approach ln 2, everything stays in [0, ln 2]") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "alpha beta gamma alpha"),
      (2L, "b", "alpha beta gamma alpha"),   // identical to a
      (3L, "c", "delta epsilon zeta delta")) // disjoint from a/b
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceJsd(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("jsd")).toMap
    assert(out(("a", "b")) == 0.0,
      s"identical distributions must score exactly 0: ${out(("a", "b"))}")
    val ln2 = math.log(2.0)
    // add-one smoothing over tiny 4-token sources dilutes the
    // divergence; disjoint must still sit clearly above identical
    assert(out(("a", "c")) > 0.05 && out(("a", "c")) < ln2)
    assert(out(("b", "c")) == out(("a", "c")),
      "identical sources must be equidistant from any third")
    out.values.foreach(j => assert(j >= 0.0 && j <= ln2))
  }

  test("vocabRichness: hand counts — singleton mass, Chao1 with and " +
      "without doubletons, saturated source scores near zero unseen") {
    import spark.implicits._
    // source a: tokens (x x y z) -> V=3, N=4, n1=2 (y,z), n2=1 (x)
    //   p_unseen = 2/4 = 0.5; chao1 = 3 + 4/2 = 5
    // source b: every type twice -> n1=0, n2=2: chao1 = V + 0 = 2,
    //   p_unseen = 0 (saturated)
    // source c: all singletons, NO doubletons -> bias-corrected form
    //   V=2, n1=2, n2=0: chao1 = 2 + 2*1/2 = 3
    val docs = Seq(
      (1L, "a", "x x y z"),
      (2L, "b", "p q p q"),
      (3L, "c", "m n"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.vocabRichness(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("v_obs"),
          r.getAs[Long]("n1"), r.getAs[Long]("n2"),
          r.getAs[Double]("p_unseen"), r.getAs[Double]("chao1"))))
      .toMap
    assert(out("a") == ((4L, 3L, 2L, 1L, 0.5, 5.0)), s"a: ${out("a")}")
    assert(out("b") == ((4L, 2L, 0L, 2L, 0.0, 2.0)), s"b: ${out("b")}")
    assert(out("c") == ((2L, 2L, 2L, 0L, 1.0, 3.0)), s"c: ${out("c")}")
  }

  test("luhnCardScrub: the canonical valid card is redacted, the " +
      "off-by-one invalid twin is kept, and 15/17-digit runs are " +
      "never candidates") {
    import spark.implicits._
    // 4111111111111111 is the canonical Luhn-valid test number;
    // ...12 fails the checksum by one
    val docs = Seq(
      (1L, "pay with 4111111111111111 now"),       // valid -> redact
      (2L, "ref 4111111111111112 attached"),       // invalid -> keep
      (3L, "order 411111111111111 split"),         // 15 digits
      (4L, "track 41111111111111111 here"),        // 17 digits
      (5L, "a 4111111111111111 b 4111111111111112 c")) // mixed
      .toDF("doc_id", "text")
    val out = TextAnalysis.luhnCardScrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_valid"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((1L, 1L, "pay with <CARD> now")))
    assert(out(2L) == ((1L, 0L, "ref 4111111111111112 attached")))
    assert(out(3L) == ((0L, 0L, "order 411111111111111 split")))
    assert(out(4L) == ((0L, 0L, "track 41111111111111111 here")))
    assert(out(5L) == ((2L, 1L, "a <CARD> b 4111111111111112 c")))
  }

  test("luhnCardScrub redaction is boundary-anchored: a longer " +
      "non-candidate run embedding the validated 16 digits stays " +
      "intact, and same-valued run chains redact fully") {
    import spark.implicits._
    val card = "4111111111111111" // Luhn-valid
    val docs = Seq(
      // a validated standalone run PLUS a 17-digit run embedding the
      // same 16 digits: the r12 defect partially redacted the long
      // run; the anchored pattern must leave it whole
      (1L, s"pay $card ref 9$card end"),
      // embedding on the other side (card + trailing digit)
      (2L, s"pay $card ref ${card}7 end"),
      // same valid run three times, single-space separated — the
      // double-pass rebuild must catch the middle occurrence whose
      // leading boundary the first global pass consumed
      (3L, s"$card $card $card"),
      // run at both string boundaries (the ^/$ alternation arms)
      (4L, card),
      (5L, s"$card mid $card"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.luhnCardScrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_valid"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((1L, 1L, s"pay <CARD> ref 9$card end")))
    assert(out(2L) == ((1L, 1L, s"pay <CARD> ref ${card}7 end")))
    assert(out(3L) == ((3L, 3L, "<CARD> <CARD> <CARD>")))
    assert(out(4L) == ((1L, 1L, "<CARD>")))
    assert(out(5L) == ((2L, 2L, "<CARD> mid <CARD>")))
  }

  test("prfExpandedTopDocs: the expansion retrieves a document the " +
      "original query cannot see; idf damping beats raw feedback " +
      "frequency; base ranking order is deterministic") {
    import spark.implicits._
    // feedback docs carry 'alpha' (the query) plus the true topic
    // term 'beta' and one unique filler each; doc 50 is beta-only —
    // invisible to the base query, reachable only via expansion
    val docs = ((1 to 10).map(i => (i.toLong, s"alpha beta f$i")) :+
      (50L, "beta beta beta beta")) ++
      (60 to 79).map(i => (i.toLong, "gamma delta"))
    val frame = docs.toDF("doc_id", "text")
    val base = TextAnalysis.bm25TopDocs(frame, Seq("alpha"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!base.contains(50L), "beta-only doc visible to base query")
    val prf = TextAnalysis.prfExpandedTopDocs(frame, Seq("alpha"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(prf.contains(50L),
      s"expansion must surface the beta-only doc: ${prf.keySet}")
    // the feedback docs themselves still rank (they match both terms)
    (1 to 10).foreach(i => assert(prf.contains(i.toLong)))
    // beta-only doc matches exactly one term of the expanded query
    assert(prf(50L).getAs[Long]("n_terms_hit") == 1L)
    // feedback docs hit alpha + beta (+ maybe their own filler if it
    // made the expansion cut)
    assert(prf(1L).getAs[Long]("n_terms_hit") >= 2L)
    // determinism: two runs bit-identical
    val again = TextAnalysis.prfExpandedTopDocs(frame, Seq("alpha"))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("rank"), r.getAs[Double]("score"))).toSet
    assert(again == prf.values.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("rank"), r.getAs[Double]("score"))).toSet)
  }

  test("codeSwitchAudit: a German paragraph inside an English doc " +
      "flags is_mixed with modal en; monolingual docs stay clean; " +
      "the minority language is counted exactly") {
    import spark.implicits._
    // width-8 paragraphs: stopword-dense so the guess is unambiguous
    val en = "the cat and the dog of the house"
    val en2 = "it is a fine day for the walk"
    val de = "der hund und die katze ist nicht da"
    val docs = Seq(
      (1L, s"$en $en2 $de"), // 3 paras: en en de -> mixed, modal en
      (2L, s"$en $en2"),     // monolingual en
      (3L, de))              // monolingual de
      .toDF("doc_id", "text")
    val out = TextAnalysis.codeSwitchAudit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_paras"), r.getAs[String]("modal_lang"),
          r.getAs[Long]("n_modal"), r.getAs[Long]("n_other"),
          r.getAs[Boolean]("is_mixed")))).toMap
    assert(out(1L) == ((3L, "en", 2L, 1L, true)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((2L, "en", 2L, 0L, false)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((1L, "de", 1L, 0L, false)), s"doc3: ${out(3L)}")
  }

  test("logRegQualityFilter (q231): GD genuinely learns the planted " +
      "prose rule (loss falls, high margin agreement), training is " +
      "bit-deterministic across runs, and the quantized gradient " +
      "never moves weights on a perfectly balanced gradient-free " +
      "fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // planted separable fixture: 40 "prose" docs (stopword-rich,
    // long) vs 40 "junk" docs (no stopwords, short) — the weak
    // label rule tags them 1/0 and GD must separate them
    val prose = (0 until 40).map { i =>
      val filler = Seq.fill(8)(s"w$i word${i % 7} item${i % 5}")
        .mkString(" ")
      (i.toLong,
        s"the cat is on the mat and it is a fine day for this $filler")
    }
    val junk = (0 until 40).map { i =>
      (100L + i, s"zzz$i qqq${i % 3} ppp kkk jjj www$i")
    }
    val docs = (prose ++ junk).toDF("doc_id", "text")
      .withColumn("source", lit("plant"))
    val (w, scored, h) = TextAnalysis.logRegTrainedWithHandle(docs)
    val rows = scored.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getBoolean(3)))
    h.release()
    assert(rows.forall { case (id, y, _, _) =>
      y == (if (id < 100) 1L else 0L)
    }, "the weak-label rule must tag the planted classes")
    // after 8 steps the model agrees with the label on >= 90%
    val agree = rows.count { case (_, y, _, keep) =>
      keep == (y == 1L)
    }
    assert(agree >= 72, s"GD failed to learn the rule: $agree/80")
    // logloss at the trained weights beats the zero-weight start
    // (ln 2 per doc) — the trajectory genuinely descended
    val loss = rows.map { case (_, y, m, _) =>
      math.log1p(math.exp(-m)) + (if (y == 1L) 0.0 else m)
    }.sum / rows.length
    assert(loss < math.log(2) * 0.8,
      s"trained logloss $loss not below the zero-weight start")
    // bit-determinism: a second training run returns IDENTICAL
    // weights (exact long gradients — no run-to-run reassociation)
    val (w2, _, h2) = TextAnalysis.logRegTrainedWithHandle(docs)
    h2.release()
    assert(w.toSeq == w2.toSeq, "training must be bit-deterministic")
    // the two planted classes separate in margin space: the mean
    // prose margin sits strictly above the mean junk margin
    val proseMean = rows.filter(_._2 == 1L).map(_._3).sum / 40
    val junkMean = rows.filter(_._2 == 0L).map(_._3).sum / 40
    assert(proseMean > junkMean + 0.1,
      f"margins did not separate: prose $proseMean%.3f vs " +
        f"junk $junkMean%.3f")
  }

  test("gradientInfluenceTopK (q232): with a prose reference set, " +
      "the top-aligned documents are the prose class; ranks are " +
      "contiguous and influence non-increasing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val prose = (0 until 40).map { i =>
      val filler = Seq.fill(8)(s"w$i word${i % 7} item${i % 5}")
        .mkString(" ")
      (i.toLong,
        s"the cat is on the mat and it is a fine day for this $filler",
        // half the prose docs ARE the curated reference slice —
        // the rest must still surface through gradient alignment
        if (i % 2 == 0) TextAnalysis.InfluenceRefSource else "web")
    }
    val junk = (0 until 40).map { i =>
      (100L + i, s"zzz$i qqq${i % 3} ppp kkk jjj www$i", "web")
    }
    val docs = (prose ++ junk).toDF("doc_id", "text", "source")
    val k = 20
    val out = TextAnalysis.gradientInfluenceTopK(docs, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._3).sorted.toSeq == (1L to k).toSeq,
      "ranks must be contiguous 1..k")
    val byRank = out.sortBy(_._3)
    byRank.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, s"influence not non-increasing at ${b._3}")
    }
    // every top-k doc is prose (gradient-aligned with the prose
    // reference), including NON-reference prose — alignment, not
    // membership, is what ranks
    assert(out.forall(_._1 < 100L),
      s"junk leaked into the top-$k: ${out.filter(_._1 >= 100L).toSeq}")
    assert(out.exists(o => o._1 % 2 == 1),
      "non-reference prose must surface through alignment alone")
  }

  test("q263 fertility: exact integer sums per (lang, source) and " +
      "fixed-order ratio divisions match a direct recomputation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog run 42 times!", "web"),
      (2L, "the the the and and of", "web"),
      (3L, "short one", "books"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.tokenizerFertility(docs).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"))
        -> r).toMap
    val counts = TextAnalysis.tokenCounts(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ws_tokens"), r.getAs[Long]("regex_tokens"))))
      .toMap
    val langs = TextAnalysis.langId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("lang_guess")).toMap
    val expected = Seq(1L -> "web", 2L -> "web", 3L -> "books")
      .groupBy { case (id, src) => (langs(id), src) }
    for (((lang, src), members) <- expected) {
      val r = out((lang, src))
      val ws = members.map { case (id, _) => counts(id)._1 }.sum
      val tok = members.map { case (id, _) => counts(id)._2 }.sum
      assert(r.getAs[Long]("n_docs") == members.size.toLong)
      assert(r.getAs[Long]("n_words") == ws)
      assert(r.getAs[Long]("n_tokens") == tok)
      assert(r.getAs[Double]("fertility") ==
        tok.toDouble / ws.toDouble)
      assert(r.getAs[Double]("chars_per_token") ==
        r.getAs[Long]("n_chars").toDouble / tok.toDouble)
    }
  }

  test("q268 phrase search: only adjacency matches count, the top " +
      "bigrams are the query set, and occurrence counts are exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "red fox red fox red"),    // "red fox" x2, "fox red" x2
      (2L, "fox red blue sky"),       // "fox red" x1
      (3L, "red and fox are words"))  // red..fox NOT adjacent
      .toDF("doc_id", "text")
    val out = TextAnalysis.phraseSearch(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("phrase"))
        -> r.getAs[Long]("n_occ")).toMap
    // top-5 bigrams of this corpus include "red fox" (2) and
    // "fox red" (3 total)
    assert(out((1L, "red fox")) == 2L)
    assert(out((1L, "fox red")) == 2L)
    assert(out((2L, "fox red")) == 1L)
    // doc 3 has neither phrase adjacent
    assert(!out.keySet.exists { case (d, p) =>
      d == 3L && (p == "red fox" || p == "fox red") })
  }

  test("q268 phrase search survives 1-word and empty documents " +
      "(sequence(1,0) is DESCENDING in Spark — the guarded branch " +
      "must yield no bigrams, not an INVALID_ARRAY_INDEX crash)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "red fox red fox"),
      (2L, "solo"),   // 1 word: unguarded transform indexes w[0]
      (3L, ""))       // split('') = [""], also size 1
      .toDF("doc_id", "text")
    val out = TextAnalysis.phraseSearch(docs).collect()
    assert(out.forall(_.getAs[Long]("doc_id") == 1L),
      "1-word docs must contribute no phrases")
    assert(out.nonEmpty)
  }

  test("the q268 plan broadcasts the query set — no corpus " +
      "self-join, no single-partition exchange") {
    import spark.implicits._
    val plan = TextAnalysis.phraseSearch(
        Seq((1L, "a b a b")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      "the phrase set must broadcast")
    assert(!plan.contains("Exchange SinglePartition"),
      s"unpartitioned sort in:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"))
  }

  test("q274 sentences: cycling 4/7/3/9/5 lengths with cycling " +
      "terminators, a short tail keeps its own terminator, and the " +
      "segments reassemble the original words exactly") {
    import spark.implicits._
    val words = (1 to 30).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val rows = TextAnalysis.sentenceSegments(docs).collect()
      .sortBy(_.getAs[Long]("sent_idx"))
    // 30 words -> sentences of 4,7,3,9,5 then a 2-word tail
    assert(rows.map(_.getAs[Long]("n_words")).toSeq ==
      Seq(4L, 7L, 3L, 9L, 5L, 2L))
    assert(rows.map(_.getAs[String]("terminator")).toSeq ==
      Seq(".", "!", "?", ".", "!", "?"))
    val reassembled = rows.map(_.getAs[String]("sentence"))
      .map(_.dropRight(1)).mkString(" ")
    assert(reassembled == words.mkString(" "),
      "segmentation must be lossless on the words")
  }

  test("the q274 plan is row-local — no shuffle") {
    import spark.implicits._
    val plan = TextAnalysis.sentenceSegments(
        Seq((1L, "a b c")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"segmentation must not shuffle:\n$plan")
  }

  test("q275 datasheet: exact counts, dup rate from distinct " +
      "digests, micros-exact mean quality, modal language, and the " +
      "ordered HHI fold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat", "web"), (2L, "the cat sat", "web"),
      (3L, "a different doc entirely", "books"),
      (4L, "short", "web"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.corpusDatasheet(docs).head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_unique_texts") == 3L)
    assert(r.getAs[Double]("exact_dup_rate") == 1.0 - 3.0 / 4.0)
    assert(r.getAs[Long]("n_sources") == 2L)
    // HHI over doc shares: web 3/4, books 1/4 -> 9/16 + 1/16
    assert(math.abs(r.getAs[Double]("source_hhi") - 10.0 / 16.0)
      < 1e-12)
    assert(r.getAs[Double]("modal_lang_share") >= 0.25)
    val qs = docs.select(
      org.apache.spark.sql.functions.floor(
        TextAnalysis.qualityScoreCol(
          org.apache.spark.sql.functions.col("text")) * 1000000.0
          + 0.5).cast("long")).as[Long].collect()
    assert(r.getAs[Double]("mean_quality") ==
      qs.sum.toDouble / 1000000.0 / 4.0)
  }

  test("q284 RAG contexts: inclusion is the monotone prefix-budget " +
      "rule in rank order — once over budget, never included again") {
    val d2 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = TextAnalysis.ragContexts(d2).collect()
      .groupBy(_.getAs[Long]("query_id"))
    assert(rows.nonEmpty)
    for ((_, qs) <- rows) {
      val sorted = qs.sortBy(_.getAs[Long]("rank"))
      var cum = 0L
      var over = false
      for (r <- sorted) {
        cum += r.getAs[Long]("n_tok")
        assert(r.getAs[Long]("cum_tokens") == cum)
        val included = r.getAs[Boolean]("included")
        assert(included == (cum <= TextAnalysis.RagContextBudget))
        if (over) assert(!included, "monotone: no re-inclusion")
        if (!included) over = true
      }
      assert(sorted.head.getAs[Boolean]("included") ||
        sorted.head.getAs[Long]("n_tok") >
          TextAnalysis.RagContextBudget,
        "the top document is included unless it alone overflows")
    }
  }

  test("q285: a candidate that near-dups a higher-ranked candidate " +
      "of the same query demotes; survivors re-rank densely and " +
      "pack under the budget") {
    val d2 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val base = TextAnalysis.ragContexts(d2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")))
      .toSet
    val rows = TextAnalysis.ragDedupContexts(d2).collect()
    assert(rows.length <= base.size)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    for ((_, qs) <- byQ) {
      val sorted = qs.sortBy(_.getAs[Long]("new_rank"))
      assert(sorted.map(_.getAs[Long]("new_rank")).toSeq ==
        (1L to sorted.length.toLong), "dense re-rank")
      val origs = sorted.map(_.getAs[Long]("orig_rank")).toSeq
      assert(origs == origs.sorted, "orig order preserved")
      var cum = 0L
      for (r <- sorted) {
        cum += r.getAs[Long]("n_tok")
        assert(r.getAs[Long]("cum_tokens") == cum)
        assert(r.getAs[Boolean]("included") ==
          (cum <= TextAnalysis.RagContextBudget))
      }
    }
    // the sf0.001 fixture genuinely demotes someone (97 of 100)
    assert(rows.length < base.size,
      "the near-dup demotion must do real work on this corpus")
  }

  test("q318 code-switching: monolingual docs (id % 5 == 0) roll up " +
      "to one language; rotating docs detect EVERY planted language " +
      "and pick the majority by count-then-profile-order") {
    import spark.implicits._
    val docs = (0L until 30L).map((_, "unused")).toDF("doc_id", "text")
    val out = TextAnalysis.codeSwitchStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 30)
    val codes = TextAnalysis.langProfiles.map(_._1)
    for ((id, r) <- out) {
      val nParas = (id % 3 + 2).toInt
      assert(r.getAs[Long]("n_paras") == nParas, s"doc $id")
      if (id % 5 == 0) {
        assert(r.getAs[Long]("n_langs") == 1L, s"doc $id mono")
        assert(!r.getAs[Boolean]("is_mixed"))
        assert(r.getAs[String]("majority_lang") ==
          codes((id % 4).toInt))
      } else {
        assert(r.getAs[Long]("n_langs") == nParas, s"doc $id mixed")
        assert(r.getAs[Boolean]("is_mixed"))
        // all counts tie at 1 -> majority = the EARLIEST profile
        // among the planted (id + j) % 4 indices
        val planted = (0 until nParas).map(j => ((id + j) % 4).toInt)
        assert(r.getAs[String]("majority_lang") ==
          codes(planted.min), s"doc $id planted=$planted")
      }
    }
    // the guess is computed by SCORING, not threaded: a paragraph of
    // German stopwords must guess 'de' through the q7 kernel
    val de = TextAnalysis.langProfiles.toMap.apply("de").mkString(" ")
    val guessed = Seq((0L, de)).toDF("doc_id", "text")
      .select(TextAnalysis.langGuessCol(col("text"))).head.getString(0)
    assert(guessed == "de")
  }
}
