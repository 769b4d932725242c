package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash-LSH near-dup detection vs the batch operator:
  * same pairs, same Jaccard values, with documents arriving across
  * multiple micro-batches (late arrivals must still pair with
  * documents accepted earlier — the state carries the buckets). */
class StreamingDedupSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("streaming pairs == batch pairs, across micro-batches") {
    val docsBatch = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val expected = Dedup.minhashNearDups(docsBatch).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(expected.nonEmpty)

    val docs = docsBatch.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val (first, second) = docs.splitAt(docs.length / 2)

    val ms = MemoryStream[(Long, String)]
    val stream = StreamingDedup.nearDupPairs(
      ms.toDF().toDF("doc_id", "text"))
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sd-cp").toString)
      .format("memory").queryName("stream_dups").start()

    ms.addData(first.toSeq: _*)
    q.processAllAvailable()
    ms.addData(second.toSeq: _*) // late docs must pair against batch-1 state
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stream_dups").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap // multi-band emits collapse
    assert(got.keySet == expected.keySet,
      s"missing=${expected.keySet.diff(got.keySet)} " +
        s"extra=${got.keySet.diff(expected.keySet)}")
    expected.foreach { case (pair, j) =>
      assert(math.abs(got(pair) - j) < 1e-12, s"jaccard mismatch at $pair")
    }
  }

  test("streaming containment == batch pairs, across micro-batches") {
    val docsBatch = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val expected = Dedup.containmentPairs(docsBatch).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("containment"))).toMap
    assert(expected.nonEmpty)

    val docs = docsBatch.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val (first, second) = docs.splitAt(docs.length / 2)

    val ms = MemoryStream[(Long, String)]
    val stream = StreamingDedup.containmentPairs(
      ms.toDF().toDF("doc_id", "text"))
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sc-cp").toString)
      .format("memory").queryName("stream_contain").start()

    ms.addData(first.toSeq: _*)
    q.processAllAvailable()
    ms.addData(second.toSeq: _*) // a subset doc arriving after its superset
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stream_contain").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("containment"))).toMap
    assert(got.keySet == expected.keySet,
      s"missing=${expected.keySet.diff(got.keySet)} " +
        s"extra=${got.keySet.diff(expected.keySet)}")
    expected.foreach { case (pair, (nShared, c)) =>
      assert(got(pair) == ((nShared, c)), s"value mismatch at $pair")
    }
  }

  test("deferred containment == batch final-df rule on a fixture " +
      "where the EAGER member provably over-emits (all-hot-shingle " +
      "pair); rare pairs carry exact batch values") {
    // template docs drive the template shingles' final df over the
    // cap; A ⊂ B share ONLY template shingles (containment 1.0) —
    // batch suppresses the pair (every shared shingle ends hot),
    // eager streaming emits it when fed first (bucket still cold),
    // deferred must side with batch. D1 ⊂ D2 share RARE shingles —
    // everyone must emit that pair with identical values.
    val template = "t1 t2 t3 t4"
    val hotDocs = (100L until 140L).map(i =>
      (i, s"$template u$i v$i w$i"))
    val a = (1L, template)
    val b = (2L, s"$template x1")
    val d1 = (11L, "r1 r2 r3 r4")
    val d2 = (12L, "r1 r2 r3 r4 r5")
    val all = Seq(a, b, d1, d2) ++ hotDocs

    val batchDf = all.toDF("doc_id", "text")
    val batch = Dedup.containmentPairs(batchDf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_shared"), r.getAs[Double]("containment")))
      .toMap
    assert(batch.contains((11L, 12L)), "rare pair missing from batch")
    assert(!batch.contains((1L, 2L)), "all-hot pair should not be in batch")

    // EAGER member, A/B fed first: emits the all-hot pair — the
    // documented superset behavior
    val msE = MemoryStream[(Long, String)]
    val qe = StreamingDedup.containmentPairs(
        msE.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sce-cp").toString)
      .format("memory").queryName("contain_eager").start()
    msE.addData(a, b, d1, d2)
    qe.processAllAvailable()
    msE.addData(hotDocs: _*)
    qe.processAllAvailable()
    qe.stop()
    val eager = spark.table("contain_eager").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(eager.contains((1L, 2L)),
      "fixture no longer demonstrates the eager over-emission")
    assert(batch.keySet.subsetOf(eager), "eager must be a superset")

    // DEFERRED member, same out-of-order arrival: A/B first, the hot
    // wave later, then two far-future punctuation rows close every
    // bucket (watermark advance + timeout batch)
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(plusMs: Long) = new java.sql.Timestamp(base.getTime + plusMs)
    val msD = MemoryStream[(Long, String, java.sql.Timestamp)]
    val qd = StreamingDedup.containmentPairsDeferred(
        msD.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("scd-cp").toString)
      .format("memory").queryName("contain_deferred").start()
    // punctuation rows must themselves pass the >=3-token filter:
    // Spark pushes the deterministic token filter BELOW the watermark
    // node, so shorter rows never reach it and cannot advance the
    // watermark (observed in this spec's first draft)
    msD.addData(Seq(a, b, d1, d2).map(d => (d._1, d._2, ts(0))): _*)
    qd.processAllAvailable()
    msD.addData(hotDocs.map(d => (d._1, d._2, ts(100))): _*)
    qd.processAllAvailable()
    msD.addData((-1L, "p1 p2 p3", ts(3600L * 1000)))
    qd.processAllAvailable()
    msD.addData((-2L, "p4 p5 p6", ts(7200L * 1000)))
    qd.processAllAvailable()
    qd.stop()
    val deferred = spark.table("contain_deferred").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_shared"), r.getAs[Double]("containment")))
      .toMap
    assert(deferred == batch,
      s"deferred != batch: missing=${batch.keySet.diff(deferred.keySet)} " +
        s"extra=${deferred.keySet.diff(batch.keySet)}")
  }

  test("deferred containment tombstone: an over-cap shingle cannot " +
      "reopen after a quiet horizon (late same-shingle pair stays " +
      "suppressed); fresh rare pairs still emit") {
    // hot wave closes the template-shingle buckets at the df cap;
    // then the stream goes quiet past maxTs + horizon so the closed
    // buckets TIME OUT (the r10 code dropped their state here and a
    // later A ⊂ B pair sharing only template shingles was emitted —
    // a pair the batch final-df rule suppresses). With the tombstone
    // the late pair must stay suppressed, while a genuinely rare
    // pair arriving in the same late wave still emits.
    val template = "t1 t2 t3 t4"
    val hotDocs = (100L until 140L).map(i => (i, s"$template u$i v$i w$i"))
    val a = (1L, template)
    val b = (2L, s"$template x1")
    val d1 = (11L, "r1 r2 r3 r4")
    val d2 = (12L, "r1 r2 r3 r4 r5")
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(plusMs: Long) = new java.sql.Timestamp(base.getTime + plusMs)
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingDedup.containmentPairsDeferred(
        ms.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("tomb-cp").toString)
      .format("memory").queryName("contain_tombstone").start()
    ms.addData(hotDocs.map(d => (d._1, d._2, ts(0))): _*)
    q.processAllAvailable()
    // a punctuation 10 s on advances the watermark past horizon (1 s):
    // the closed buckets' first timeout fires — tombstone or drop
    ms.addData((-1L, "p1 p2 p3", ts(10000L)))
    q.processAllAvailable()
    // the late wave: 12 s < TombstoneHorizons (64 s) after the hot
    // wave — well inside the tombstone TTL
    ms.addData(Seq(a, b, d1, d2).map(d => (d._1, d._2, ts(12000L))): _*)
    q.processAllAvailable()
    ms.addData((-2L, "p4 p5 p6", ts(3600L * 1000)))
    q.processAllAvailable()
    ms.addData((-3L, "p7 p8 p9", ts(7200L * 1000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("contain_tombstone").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(!got.contains((1L, 2L)),
      "over-cap shingle reopened after its first timeout — the late " +
        "all-hot pair must stay suppressed by the tombstone")
    assert(got.contains((11L, 12L)),
      "rare pair from the late wave must still emit")
  }

  test("streaming paragraph dedup == batch canonical selection across " +
      "batches (cross-doc, cross-batch and within-doc repeats); " +
      "rebuilt documents equal the batch rebuild row-for-row") {
    // width-8 paragraphs (Dedup.ParaWords); A repeats across docs,
    // batches AND within one doc; D's canonical is contested within
    // one wave (doc 3 pos 1 vs doc 4 pos 0 — min struct must win)
    def para(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")
    val (pa, pb, pc, pd) = (para("a"), para("b"), para("c"), para("d"))
    val wave1 = Seq((1L, s"$pa $pb"), (2L, s"$pb $pc"))
    val wave2 = Seq((3L, s"$pa $pd $pa"), (4L, pd))
    val all = wave1 ++ wave2

    val batch = graft.operators.Dedup
      .paragraphDedup(all.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(batch(1L)._2 == 2 && batch(2L)._2 == 1)
    assert(batch(3L)._2 == 1, "doc 3 should keep only paraD")
    assert(batch(4L)._2 == 0, "doc 4 should lose everything")

    val ms = MemoryStream[(Long, String)]
    val q = StreamingDedup.paragraphFirstOccurrences(
        ms.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("para-cp").toString)
      .format("memory").queryName("stream_para_kept").start()
    ms.addData(wave1: _*)
    q.processAllAvailable()
    ms.addData(wave2: _*)
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("stream_para_kept")
    // kept rows ARE the batch canonical table
    assert(kept.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      Set((1L, 0), (1L, 1), (2L, 1), (3L, 1)))
    // full rebuild parity, row for row
    val rebuilt = graft.operators.Dedup.paragraphRebuild(
        graft.operators.Dedup.paragraphBase(all.toDF("doc_id", "text")),
        kept).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(rebuilt == batch)
  }

  test("deferred paragraph canonical == batch min rule under REVERSED " +
      "ingest, where the eager first-arrival member provably picks " +
      "the wrong copy; rebuild parity row-for-row") {
    // same corpus shape as the eager-parity fixture, but waves arrive
    // in DESCENDING doc_id order: the high-id copies of paraA/paraD
    // reach the stream first, so first-arrival canonicals are wrong
    def para(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")
    val (pa, pb, pc, pd) = (para("a"), para("b"), para("c"), para("d"))
    val lowWave = Seq((1L, s"$pa $pb"), (2L, s"$pb $pc"))
    val highWave = Seq((3L, s"$pa $pd $pa"), (4L, pd))
    val all = lowWave ++ highWave
    val batchCanon = Dedup
      .paragraphHashes(Dedup.paragraphBase(all.toDF("doc_id", "text")))
      .groupBy("phash")
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.struct("doc_id", "pos")).as("m"))
      .select("m.doc_id", "m.pos").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(batchCanon == Set((1L, 0), (1L, 1), (2L, 1), (3L, 1)))

    // EAGER member under reversed ingest: paraA's canonical is its
    // first arrival (doc 3), not the batch min (doc 1)
    val msE = MemoryStream[(Long, String)]
    val qe = StreamingDedup.paragraphFirstOccurrences(
        msE.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("parae-cp").toString)
      .format("memory").queryName("para_eager_rev").start()
    msE.addData(highWave: _*)
    qe.processAllAvailable()
    msE.addData(lowWave: _*)
    qe.processAllAvailable()
    qe.stop()
    val eager = spark.table("para_eager_rev").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(eager != batchCanon && eager.contains((3L, 0)),
      s"fixture no longer demonstrates the eager order dependence: $eager")

    // DEFERRED member, same reversed arrival, punctuation rows close
    // the digests once the watermark proves them final
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(plusMs: Long) = new java.sql.Timestamp(base.getTime + plusMs)
    val msD = MemoryStream[(Long, String, java.sql.Timestamp)]
    val qd = StreamingDedup.paragraphCanonicalDeferred(
        msD.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("parad-cp").toString)
      .format("memory").queryName("para_deferred_rev").start()
    msD.addData(highWave.map(d => (d._1, d._2, ts(0))): _*)
    qd.processAllAvailable()
    msD.addData(lowWave.map(d => (d._1, d._2, ts(100))): _*)
    qd.processAllAvailable()
    msD.addData((-1L, para("zpunct1"), ts(3600L * 1000)))
    qd.processAllAvailable()
    msD.addData((-2L, para("zpunct2"), ts(7200L * 1000)))
    qd.processAllAvailable()
    qd.stop()
    val deferred = spark.table("para_deferred_rev").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
      .filter(_._1 >= 0) // punctuation rows' own paragraphs
    assert(deferred == batchCanon,
      s"deferred != batch: missing=${batchCanon.diff(deferred)} " +
        s"extra=${deferred.diff(batchCanon)}")
    // full rebuild parity against the batch operator, row for row
    val batch = Dedup.paragraphDedup(all.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val rebuilt = Dedup.paragraphRebuild(
        Dedup.paragraphBase(all.toDF("doc_id", "text")),
        spark.table("para_deferred_rev")
          .filter(org.apache.spark.sql.functions.col("doc_id") >= 0))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(rebuilt == batch)
  }

  test("deferred paragraph canonical: a later-than-horizon " +
      "re-occurrence stays suppressed by the permanent claim marker") {
    def para(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")
    val pa = para("a")
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(plusMs: Long) = new java.sql.Timestamp(base.getTime + plusMs)
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingDedup.paragraphCanonicalDeferred(
        ms.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("parac-cp").toString)
      .format("memory").queryName("para_claim").start()
    ms.addData((5L, pa, ts(0)))
    q.processAllAvailable()
    // punctuation closes the digest -> canonical (5, 0) emits
    ms.addData((-1L, para("zp1"), ts(10000L)))
    q.processAllAvailable()
    ms.addData((-2L, para("zp2"), ts(20000L)))
    q.processAllAvailable()
    // a fresh copy arrives long after the digest closed: batch would
    // call it a dup of the canonical — the claim must suppress it
    ms.addData((9L, pa, ts(30000L)))
    q.processAllAvailable()
    ms.addData((-3L, para("zp3"), ts(3600L * 1000)))
    q.processAllAvailable()
    ms.addData((-4L, para("zp4"), ts(7200L * 1000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("para_claim").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet.filter(_._1 >= 0)
    assert(got == Set((5L, 0)),
      s"late re-occurrence must not re-emit or re-claim: $got")
  }

  // NOTE on stateTtlMs: ProcessingTimeTimeout makes the engine
  // schedule continuous no-data micro-batches to fire timeouts, so
  // `processAllAvailable` never settles in that mode. The TTL
  // eviction path is covered in StreamingStateBoundsSpec with a real
  // ProcessingTime trigger and a polled numRowsTotal assertion; this
  // parity-oriented spec keeps the NoTimeout pairing logic.

  test("streaming embedding near-dups == batch pairs, bit-equal cosines") {
    val embBatch = graft.operators.Similarity
      .embeddings(spark, "/root/testdata/sf0.001")
    val expected = graft.operators.Similarity.embeddingNearDups(embBatch)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cosine")).toMap
    assert(expected.nonEmpty)

    val vecs = embBatch.select("vec_id", "v", "norm")
      .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
    val (first, second) = vecs.splitAt(vecs.length / 2)
    val ms = MemoryStream[(Long, Array[Double], Double)]
    val stream = StreamingDedup.embeddingNearDupPairs(
      ms.toDF().toDF("vec_id", "v", "norm"))
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sed-cp").toString)
      .format("memory").queryName("stream_vec_dups").start()
    ms.addData(first.toSeq: _*)
    q.processAllAvailable()
    ms.addData(second.toSeq: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stream_vec_dups").collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cosine")).toMap
    assert(got.keySet == expected.keySet,
      s"missing=${expected.keySet.diff(got.keySet)} " +
        s"extra=${got.keySet.diff(expected.keySet)}")
    expected.foreach { case (pair, c) =>
      assert(got(pair) == c, s"cosine not bit-equal at $pair")
    }
  }

  test("row-local text operators run unchanged on a stream (quality filter)") {
    // textStats/langId/tokenCounts are pure row-local expression
    // pipelines — the streaming ingest filter "drop low-quality docs
    // before they reach the corpus" is the same operator applied to a
    // readStream DataFrame; results must equal the batch run.
    val docsBatch = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val expected = graft.operators.TextAnalysis.textStats(docsBatch)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val ms = MemoryStream[(Long, String)]
    val stream = graft.operators.TextAnalysis.textStats(
      ms.toDF().toDF("doc_id", "text"))
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ts-cp").toString)
      .format("memory").queryName("stream_quality").start()
    ms.addData(docsBatch.select("doc_id", "text")
      .as[(Long, String)].collect().toSeq: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stream_quality")
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("streaming novelty claims (q191): within-batch contention to " +
      "min doc, cross-batch suppression, and rollup parity with the " +
      "batch q137 operator") {
    val b1 = Seq((1L, "a b c d"), (2L, "a b c x"))
    val b2 = Seq((5L, "b c d e"))
    val ms = MemoryStream[(Long, String)]
    val q = StreamingDedup.shingleFirstOccurrences(
        ms.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("nov-cp").toString)
      .format("memory").queryName("nov_claims").start()
    ms.addData(b1: _*)
    q.processAllAvailable()
    ms.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val claims = spark.table("nov_claims").collect()
      .map(r => r.getAs[Long]("hsh") -> r.getAs[Long]("first_doc"))
      .toMap
    // 4 distinct shingles: "a b c" contested within batch 1 (docs 1
    // and 2) -> min doc 1; "b c d" claimed by doc 1, doc 5's later
    // copy suppressed; "b c x" -> 2; "c d e" -> 5
    assert(claims.size == 4, s"claims $claims")
    assert(claims.values.count(_ == 1L) == 2) // "a b c" + "b c d"
    assert(claims.values.count(_ == 2L) == 1)
    assert(claims.values.count(_ == 5L) == 1)
    // rollup over the claim table == the batch q137 operator
    val all = (b1 ++ b2).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novelty_rate"))).toSet
    val streamed = rows(Dedup.noveltyRollup(Dedup.shingleHashes(all),
      spark.table("nov_claims").select($"hsh", $"first_doc")))
    val batch = rows(Dedup.ngramNovelty(all))
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed == Set((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5),
      (5L, 2L, 1L, 0.5)))
  }

  test("streaming boilerplate cuts == batch strip, ORDER-independent: " +
      "withheld occurrences flush when the df cap crosses, rare " +
      "paragraphs never emit, reversed ingest converges identically") {
    // paragraph a occurs 3x (> cap 2, spread over waves), d occurs
    // 2x (== cap, must NEVER emit), b/c unique
    def para(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")
    val (pa, pb, pc, pd) = (para("a"), para("b"), para("c"), para("d"))
    val docs = Seq((1L, s"$pa $pb"), (2L, s"$pa $pc"),
      (3L, s"$pa $pd"), (4L, s"$pd $pb"))
    val batchCuts = Set((1L, 0), (2L, 0), (3L, 0)) // a's three copies

    def run(waves: Seq[Seq[(Long, String)]], name: String)
        : Set[(Long, Int)] = {
      val ms = MemoryStream[(Long, String)]
      val q = StreamingDedup.paragraphBoilerplateCuts(
          ms.toDF().toDF("doc_id", "text"))
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("boiler-cp").toString)
        .format("memory").queryName(name).start()
      waves.foreach { w => ms.addData(w: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    }
    // ascending: copies 1+2 withheld in wave 1, flushed by wave 2's
    // third copy
    val asc = run(Seq(docs.take(2), docs.drop(2)), "boiler_asc")
    assert(asc == batchCuts, s"ascending: $asc")
    // reversed wave order: SAME final cut set — df is a multiset
    // property, the parity carries no first-arrival caveat
    val desc = run(Seq(docs.drop(2), docs.take(2)), "boiler_desc")
    assert(desc == batchCuts, s"reversed: $desc")
    // kept = everything minus cuts reproduces the batch strip
    val stripped = graft.operators.Dedup
      .boilerplateStrip(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    val base = graft.operators.Dedup
      .paragraphBase(docs.toDF("doc_id", "text"))
    val paras = graft.operators.Dedup.paragraphHashes(base)
    val kept = paras.collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .filterNot(asc.contains)
    import org.apache.spark.sql.functions.col
    val rebuilt = graft.operators.Dedup.paragraphRebuild(base,
        kept.toSeq.toDF("doc_id", "pos")).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(rebuilt == stripped)
  }
}
