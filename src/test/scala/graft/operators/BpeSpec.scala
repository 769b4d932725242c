package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkSessionSpec {

  /** Naive single-machine BPE trainer: the textbook formulation the
    * distributed loop must reproduce exactly (same weighting, same
    * (count DESC, left, right) tiebreak, same greedy left-to-right
    * merge pass). */
  private def naiveTrain(words: Seq[String],
      k: Int): Seq[(String, String, String, Long)] = {
    var corpus: Map[List[String], Long] = words
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toList -> ws.size.toLong
      }
    val out = Seq.newBuilder[(String, String, String, Long)]
    for (_ <- 0 until k) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      corpus.foreach { case (syms, cnt) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + cnt
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) =>
          (-c, l, r)
        }
        out += ((l, r, l + r, c))
        corpus = corpus.groupMapReduce { case (syms, _) =>
          syms.foldLeft(List.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ (l + r)
            else acc :+ x
          }
        }(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("distributed merges == naive textbook trainer on the fixture") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs.select("text").as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty).toSeq
    val expected = naiveTrain(words, Bpe.NumMerges)
    val got = Bpe.trainMerges(docs)
      .map(m => (m.left_sym, m.right_sym, m.merged, m.pair_count))
    assert(got == expected)
  }

  test("merge pass fuses greedily left-to-right, non-overlapping") {
    import spark.implicits._
    // 'aaa' under (a,a): exactly one fusion -> [aa, a]
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val m = Seq(Bpe.Merge(0, "a", "a", "aa", 2L))
    val toks = Bpe.segment(docs, m).collect().head.getSeq[String](2)
    assert(toks == Seq("aa", "a"))
  }

  test("learned merges compose: later steps fuse earlier merged symbols") {
    import spark.implicits._
    // 'abab abab ab' -> merge0 = (a,b)->ab, merge1 = (ab,ab)->abab
    val docs = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, 2)
    assert(merges.map(m => (m.left_sym, m.right_sym)) ==
      Seq(("a", "b"), ("ab", "ab")))
    val toks = Bpe.segment(docs, merges).collect()
      .map(r => (r.getString(1), r.getSeq[String](2))).toMap
    assert(toks("abab") == Seq("abab"))
    assert(toks("ab") == Seq("ab"))
  }

  test("vocab-folded segmentCounts == per-occurrence segment fold") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val merges = Bpe.trainMerges(docs, 4)
    val viaVocab = Bpe.segmentCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val perWord = Bpe.segment(docs, merges)
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_words"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.size($"tokens")).as("n_tokens"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaVocab == perWord)
  }

  test("training stops early when no adjacent pair remains") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, 5)
    assert(merges.isEmpty)
  }

  test("batched trainer at batchSize 1 == serial trainer exactly") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val serial = Bpe.trainMerges(docs, Bpe.NumMerges)
    val batched = Bpe.trainMergesBatched(docs, Bpe.NumMerges,
      batchSize = 1)
    assert(batched == serial)
  }

  test("batched trainer: every recorded pair_count is the TRUE corpus " +
      "count at its own substep (invariance rule holds)") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs.select("text").as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty).toSeq
    for (bs <- Seq(2, 4, 8)) {
      val merges = Bpe.trainMergesBatched(docs, Bpe.NumMerges, bs)
      assert(merges.size == Bpe.NumMerges)
      // replay the batched order through a naive simulator,
      // recounting BEFORE each apply — the serial-recount semantics;
      // the invariance rule promises batch-start counts equal these
      var corpus: Map[List[String], Long] = words
        .groupBy(identity).map { case (w, ws) =>
          w.map(_.toString).toList -> ws.size.toLong
        }
      merges.foreach { m =>
        val counts = scala.collection.mutable.Map
          .empty[(String, String), Long]
        corpus.foreach { case (syms, cnt) =>
          syms.zip(syms.tail).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) + cnt
          }
        }
        assert(counts.getOrElse((m.left_sym, m.right_sym), 0L) ==
          m.pair_count,
          s"bs=$bs step ${m.step} (${m.left_sym},${m.right_sym}): " +
            s"recorded ${m.pair_count} vs true " +
            s"${counts.getOrElse((m.left_sym, m.right_sym), 0L)}")
        corpus = corpus.groupMapReduce { case (syms, _) =>
          syms.foldLeft(List.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == m.left_sym &&
                x == m.right_sym) acc.init :+ m.merged
            else acc :+ x
          }
        }(_._2)(_ + _)
      }
    }
  }

  test("batched trainer shares the serial prefix until a mid-batch-" +
      "created pair outscores (the documented deviation)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val serial = Bpe.trainMerges(docs, Bpe.NumMerges)
    val batched = Bpe.trainMergesBatched(docs, Bpe.NumMerges,
      batchSize = 4)
    // the refined invariance rule accepts serial's whole first batch
    // (er, or, in, ow — right-symbol sharing is NOT a conflict), so
    // steps 0..6 agree; step 7 diverges exactly because serial's pick
    // (p, ar) is created by step 6's own (a, r) merge
    val key = (m: Bpe.Merge) => (m.left_sym, m.right_sym, m.pair_count)
    assert(batched.take(7).map(key) == serial.take(7).map(key))
    assert(serial(7).left_sym == "p" && serial(7).right_sym == "ar")
    assert(batched(7) != serial(7))
  }

  test("batched trainer: disjointness guard defers conflicting pairs " +
      "instead of merging them blind") {
    import spark.implicits._
    // 'a b' dominates; ('b','c') shares b with it and must NOT join
    // ('a','b') in the same batch even at batchSize 2 — serial would
    // recount ('b','c') AFTER 'ab' fusions removed most occurrences
    val docs = Seq((1L, ("ab " * 6) + ("abc " * 3))).toDF("doc_id", "text")
    val serial = Bpe.trainMerges(docs, 2)
    val batched = Bpe.trainMergesBatched(docs, 2, batchSize = 2)
    assert(batched == serial)
    // and the second merge is NOT (b,c): after (a,b)->ab, the corpus
    // has 'ab' and 'ab|c', so the true next pair is (ab, c)
    assert(serial(1).left_sym == "ab" && serial(1).right_sym == "c")
  }

  test("batched trainer stops early like the serial one") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // one learnable merge, then exhaustion
    val merges = Bpe.trainMergesBatched(docs, 5, batchSize = 4)
    assert(merges.map(m => (m.left_sym, m.right_sym)) == Seq(("a", "b")))
  }

  test("deep merge counts survive the analyzer knee: 64 merges train " +
      "and apply without lineage blowup") {
    // regression for the measured exponential analysis blowup: the
    // un-checkpointed loop was 0.38 s/step at depth 8, 25 s at depth
    // 16, heap-dead by ~20 — with LineageCheckpointEvery this must
    // run flat and finish
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.trainMergesBatched(docs, 64, batchSize = 16)
    assert(merges.size == 64)
    // apply-side: chunked folds over the vocab at the same depth
    val counts = Bpe.segmentCounts(docs, merges).collect()
    assert(counts.length == docs.count())
    // deeper tokenizer => fewer or equal tokens per doc than the
    // 4-merge tokenizer
    val shallow = Bpe.segmentCounts(docs, Bpe.trainMerges(docs, 4))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    counts.foreach { r =>
      assert(r.getLong(2) <= shallow(r.getLong(0)))
    }
  }

  test("q312 fixed-round twin == trainMergesBatched when every " +
      "round fills its batch, and shrinks (never extends) when the " +
      "corpus exhausts") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val rounds = Bpe.trainMergesBatchedRounds(docs,
      Bpe.BatchedRounds, Bpe.BatchedBatchSize)
    val quota = Bpe.trainMergesBatched(docs,
      Bpe.BatchedRounds * Bpe.BatchedBatchSize, Bpe.BatchedBatchSize)
    assert(rounds == quota, "full batches: the twins are identical")
    // exhaustion: one learnable merge, then nothing — the rounds
    // variant must not loop extra rounds into empty pair counts
    import spark.implicits._
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.trainMergesBatchedRounds(tiny, 3, 4)
    assert(m.map(x => (x.left_sym, x.right_sym)) == Seq(("a", "b")))
  }

  test("BASELINE ladder: the batched trainer's Spark-JOB count " +
      "scales with ROUNDS, the serial trainer's with MERGES — the " +
      "removed driver-round-trip axis, measured") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def jobsDuring(body: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart)
            : Unit = { counter.incrementAndGet(); () }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        // the listener bus is async: poll until the count is stable
        // (bounded), instead of the private waitUntilEmpty
        var last = -1
        var spins = 0
        while (counter.get() != last && spins < 20) {
          last = counter.get(); Thread.sleep(150); spins += 1
        }
      } finally spark.sparkContext.removeSparkListener(l)
      counter.get()
    }
    val serialJobs = jobsDuring {
      assert(Bpe.trainMerges(docs, 12).size == 12)
    }
    val batchedJobs = jobsDuring {
      assert(Bpe.trainMergesBatchedRounds(docs, 3, 4).size == 12)
    }
    // serial: >= one pair-count job per merge (12); batched: one per
    // round (3) plus bounded checkpoint jobs — strictly fewer, and
    // under half at this shape (measured figures live in BASELINE.md)
    info(s"12 merges: serial=$serialJobs jobs, " +
      s"batched(3x4)=$batchedJobs jobs")
    assert(serialJobs >= 12, s"serial ran $serialJobs jobs")
    assert(batchedJobs * 2 <= serialJobs,
      s"batched=$batchedJobs vs serial=$serialJobs")
  }

  test("segmentCounts shuffle-join fallback is row-identical to the " +
      "broadcast form") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val merges = Bpe.trainMerges(docs, 4)
    val bc = Bpe.segmentCounts(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sj = Bpe.segmentCounts(docs, merges, broadcastVocab = false)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bc == sj)
  }
}
