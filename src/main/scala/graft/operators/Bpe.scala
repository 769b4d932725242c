package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-training member
  * of the training-data pipeline surface: the iterative
  * most-frequent-adjacent-pair merge procedure (Sennrich et al.'s
  * subword BPE, the algorithm behind GPT/Llama-family tokenizers),
  * run distributed over the corpus.
  *
  * Scale design (100 TB): the classic vocabulary compression — the
  * corpus collapses to its DISTINCT words with occurrence counts in
  * ONE shuffle (a web-scale corpus has ~10⁷ distinct words against
  * ~10¹² tokens, a 10⁵× reduction), and every training step then
  * runs over the vocabulary table only: pair counting is a map-side
  * partial aggregation of ≤ |word| pairs per vocab row, the global
  * argmax moves exactly ONE row to the driver per step (the same
  * driver-sized contract as the IVF k-means loop), and the merge
  * application is a row-local fold. The vocab frame is re-persisted
  * each step (populated by the step's own argmax action, released
  * one step later) so lineage stays one cached level deep — step k
  * never recomputes steps 0..k−1.
  */
object Bpe {

  /** Number of merge steps of the graded query (q100). Real
    * tokenizers run 30k–100k steps of the SAME loop; each step's
    * cost is vocabulary-sized, not corpus-sized, so the step count
    * is a linear multiplier on a small quantity. */
  val NumMerges = 8

  /** Merge-count interval at which both trainers truncate LOGICAL
    * lineage with an eager `localCheckpoint`: persist caches the
    * data, but every applied merge still nests one more [[mergePass]]
    * HOF level in the vocabulary's logical plan, and re-ANALYSIS of
    * the ~100-deep aggregate chain (constraint propagation included)
    * blew an 8 GB driver heap near merge ~100 — measured, serial
    * trainer, 10× ladder corpus. The blowup is EXPONENTIAL in merge
    * depth, not linear — measured per-step wall: 0.38 s at depth 8,
    * 25 s at depth 16, heap-dead by ~20 (the analyzer's constraint
    * propagation through nested CaseWhen-bearing aggregates) — so
    * the interval must sit well below the knee. Checkpointing every
    * [[LineageCheckpointEvery]] merges caps plan depth at the
    * interval; cost is one materializing job per interval. (The q42
    * label-propagation lesson applied to the tokenizer trainer.) */
  val LineageCheckpointEvery = 8

  /** One learned merge: at `step`, the adjacent pair (left, right)
    * had the highest corpus frequency `pairCount` and was fused into
    * the new symbol `merged`. Ties break on (left, right) ascending —
    * the determinism contract shared with the oracle. */
  final case class Merge(step: Int, left_sym: String, right_sym: String,
      merged: String, pair_count: Long)

  /** The corpus as its distinct-word vocabulary: (word, cnt, syms)
    * with syms = the word's characters — BPE's initial symbol
    * sequence. One shuffle on the word. */
  def vocab(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .select(col("word"), col("cnt"),
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
          .as("syms"))

  /** Adjacent-pair frequencies over the current symbol sequences,
    * weighted by word occurrence count. Map-side combine before the
    * one (l, r) exchange. */
  def pairCounts(v: DataFrame): DataFrame =
    v.filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(syms[i-1] AS l, syms[i] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))

  /** Greedy left-to-right non-overlapping fusion of (l, r) → l‖r in
    * a symbol array — the standard BPE merge pass, as a row-local
    * fold (after fusing, the new symbol is the fold's tail, so
    * overlapping occurrences like (a,a) on "aaa" fuse exactly once). */
  def mergePass(syms: Column, l: String, r: String): Column =
    aggregate(syms, typedLit(Array.empty[String]), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Train [[NumMerges]] merges: per step, one vocabulary-sized pair
    * count, a ONE-ROW argmax to the driver, and a row-local merge
    * pass. Stops early if no adjacent pair remains. */
  def trainMerges(docs: DataFrame,
      numMerges: Int = NumMerges): Seq[Merge] = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var v = vocab(docs).persist(level)
    // the step's argmax action is what populates the fresh persist —
    // no separate count() job per step; the PREVIOUS vocab is
    // released only after that action, so each step computes from a
    // one-level-deep cached parent. Every LineageCheckpointEvery
    // merges the new vocab localCheckpoints instead (eager), cutting
    // the logical plan that analysis walks on every later action.
    var prev: DataFrame = null
    // BLOCKING unpersist: at one merge per ~second, async block
    // removal lags the loop and ~100 superseded vocab caches pile up
    // on the heap before the ContextCleaner catches up
    def release(df: DataFrame): Unit = {
      df.unpersist(blocking = true)
      org.apache.spark.sql.graft.Bridge.releaseCheckpoint(df)
    }
    def releasePrev(): Unit =
      if (prev != null) { release(prev); prev = null }
    val out = Seq.newBuilder[Merge]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val top = pairCounts(v)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      releasePrev()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top.head.getAs[String]("l"),
          top.head.getAs[String]("r"), top.head.getAs[Long]("c"))
        out += Merge(step, l, r, l + r, c)
        prev = v
        val next = v.select(col("word"), col("cnt"),
          mergePass(col("syms"), l, r).as("syms"))
        step += 1
        v = if (step % LineageCheckpointEvery == 0) next.localCheckpoint()
        else next.persist(level)
      }
    }
    release(v)
    releasePrev()
    out.result()
  }

  /** Batched variant of [[trainMerges]] — the distributed-BPE trick
    * for realistic merge counts: per STEP, accept up to `batchSize`
    * pairs in the serial argmax order that are count-invariant under
    * the batch's earlier acceptances, and apply the whole batch in
    * one vocabulary pass.
    *
    * The exact invariance condition (not blanket symbol
    * disjointness): merging (a,b)→m destroys only occurrences of
    * pairs (·,a) and (b,·) and creates only pairs containing m — so
    * candidate (l,r) is deferred iff for some earlier acceptance
    * r = a, or l = b, or l = m, or r = m. Sharing a RIGHT symbol
    * ((e,r) then (o,r)) or a LEFT symbol ((e,r) then (e,s)) is
    * harmless and accepted. Every recorded pair_count is therefore
    * the TRUE corpus count at that merge's own substep
    * (BpeSpec replays the batched order through a naive
    * recount-per-substep simulator and pins the equality), and
    * batchSize = 1 reproduces [[trainMerges]] exactly.
    *
    * What batching genuinely changes: the serial argmax also sees
    * pairs CREATED mid-batch, and a created pair can outscore the
    * batch's later acceptances. Measured on the fixture: serial's
    * step 6/7 are (a,r)=1873 then its own derivative (p,ar)=1873,
    * which no batch-start selection can contain — batched picks
    * (m,er)=1824 instead. That is the standard, accepted deviation
    * of every batched-BPE implementation; the trade is the step
    * count — the serial trainer's scale axis, one pair-count job +
    * one argmax per merge — dropping ≈ batchSize×: a 30k-merge
    * vocabulary at batchSize 256 is ~120 Spark jobs instead of 30k
    * (ladder row in BASELINE.md). The candidate prefix collected per
    * step is 4·batchSize rows (driver-bounded like the argmax); a
    * heavily-conflicting prefix just yields a smaller batch —
    * correct, merely less parallel. q100/q101 grade the serial
    * trainer; q312/q313 grade this batched path through the
    * fixed-round twin [[trainMergesBatchedRounds]]. */
  def trainMergesBatched(docs: DataFrame, numMerges: Int = NumMerges,
      batchSize: Int = 8): Seq[Merge] =
    trainMergesBatchedLoop(docs, batchSize,
      (step, _) => if (step < numMerges) Some(
        math.min(batchSize, numMerges - step)) else None)

  /** The GRADED twin of [[trainMergesBatched]] (q312): exactly
    * `rounds` batched rounds of up to `batchSize` acceptances each —
    * the same candidate prefix, the same invariance filter, the same
    * batch fold — but with a FIXED round count instead of a merge
    * quota. The fixed shape is what makes a closed-form oracle
    * possible: the DuckDB mirror unrolls `rounds` selection rounds
    * (each a 4-deep greedy accept chain over the rank-ordered
    * candidate prefix), and a round that accepts fewer than
    * `batchSize` (conflict-heavy prefix) shrinks identically on both
    * sides instead of triggering a data-dependent EXTRA round the
    * unrolled SQL could not express. Every line of the batched
    * trainer's selection and apply machinery is shared with
    * [[trainMergesBatched]] via [[trainMergesBatchedLoop]]. */
  def trainMergesBatchedRounds(docs: DataFrame, rounds: Int,
      batchSize: Int): Seq[Merge] =
    trainMergesBatchedLoop(docs, batchSize,
      (_, round) => if (round < rounds) Some(batchSize) else None)

  /** Shared round loop of the batched trainers: `wantOf(stepsSoFar,
    * roundsSoFar)` returns the next round's acceptance budget, or
    * None to stop. */
  private def trainMergesBatchedLoop(docs: DataFrame, batchSize: Int,
      wantOf: (Int, Int) => Option[Int]): Seq[Merge] = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var v = vocab(docs).persist(level)
    var prev: DataFrame = null
    def release(df: DataFrame): Unit = {
      df.unpersist(blocking = true)
      org.apache.spark.sql.graft.Bridge.releaseCheckpoint(df)
    }
    def releasePrev(): Unit =
      if (prev != null) { release(prev); prev = null }
    val out = Seq.newBuilder[Merge]
    var step = 0
    var round = 0
    var sinceChk = 0
    var exhausted = false
    while (!exhausted && wantOf(step, round).isDefined) {
      val want = wantOf(step, round).get
      round += 1
      val top = pairCounts(v)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(want * 4).collect()
      releasePrev()
      if (top.isEmpty) exhausted = true
      else {
        // invariance sets: lefts (a), rights (b), merged (m) of the
        // batch's acceptances — see the scaladoc's exact condition
        val lefts = scala.collection.mutable.Set.empty[String]
        val rights = scala.collection.mutable.Set.empty[String]
        val merged = scala.collection.mutable.Set.empty[String]
        val batch = Seq.newBuilder[Merge]
        var n = 0
        top.foreach { row =>
          val l = row.getAs[String]("l")
          val r = row.getAs[String]("r")
          if (n < want && !lefts(r) && !rights(l) &&
              !merged(l) && !merged(r)) {
            batch += Merge(step + n, l, r, l + r,
              row.getAs[Long]("c"))
            lefts += l; rights += r; merged += (l + r)
            n += 1
          }
        }
        val merges = batch.result()
        out ++= merges
        prev = v
        val folded = merges.foldLeft(col("syms")) { (c, m) =>
          mergePass(c, m.left_sym, m.right_sym)
        }
        val next = v.select(col("word"), col("cnt"), folded.as("syms"))
        step += merges.size
        sinceChk += merges.size
        v = if (sinceChk >= LineageCheckpointEvery) {
          sinceChk = 0; next.localCheckpoint()
        } else next.persist(level)
      }
    }
    release(v)
    releasePrev()
    out.result()
  }

  /** The graded merge table (q100): one row per learned merge. The
    * frame is driver-local by nature — the RESULT of the distributed
    * training loop is [[NumMerges]] rows, like a centroid table. */
  def mergeTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    trainMerges(docs).toDF()
  }

  /** Round/batch shape of the graded batched trainer (q312/q313):
    * [[BatchedRounds]] rounds × up to [[BatchedBatchSize]]
    * acceptances = up to 12 merges from 3 pair-count jobs + 3
    * driver-bounded prefix collects, where the serial trainer pays
    * 12 of each — the removed scale axis. At a real 30k-merge
    * vocabulary and batchSize 256 the same loop is ~120 Spark jobs
    * instead of 30k (BASELINE.md ladder rung). */
  val BatchedRounds = 3
  val BatchedBatchSize = 4

  /** The graded batched merge table (q312): one row per accepted
    * merge across the fixed rounds, in acceptance order. */
  def batchedMergeTable(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    trainMergesBatchedRounds(docs, BatchedRounds, BatchedBatchSize)
      .toDF()
  }

  /** [[segmentCounts]] under the batched trainer's merges — the
    * graded batched end-to-end shape (q313). */
  def batchedTrainAndCount(docs: DataFrame): DataFrame =
    segmentCounts(docs,
      trainMergesBatchedRounds(docs, BatchedRounds, BatchedBatchSize))

  /** Tokenize text with a learned merge list: the initial character
    * split followed by each merge pass in training order — the
    * apply-side of the tokenizer, row-local over the corpus. */
  def segment(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val syms0 = expr(
      "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    val folded = merges.foldLeft(syms0) { (c, m) =>
      mergePass(c, m.left_sym, m.right_sym)
    }
    words.select(col("doc_id"), col("word"), folded.as("tokens"))
  }

  /** Per-document token statistics under the trained tokenizer
    * (q101) — the budget every packing/chunking/pricing decision
    * keys on. The scale-correct apply: the merge folds run ONCE over
    * the distinct-word VOCABULARY (tiny), and the corpus then
    * broadcast-joins word → token count — the fold never executes
    * per word occurrence, so tokenizing 100 TB costs one broadcast
    * join over the already-exploded words plus a per-doc sum.
    *
    * Broadcast threshold: the word→count table is (word, long) ≈
    * word bytes + 8 per row — ~10⁷ distinct words (a curated corpus)
    * is ~150 MB, comfortably broadcastable; a raw WEB-scale tail
    * (URLs, typos, hashes) can push distinct words past 10⁸–10⁹
    * rows, where the broadcast build would dominate or OOM the
    * executors. `broadcastVocab = false` is the fallback: the same
    * join as a shuffle hash join (one extra exchange of the exploded
    * word stream — row-identical output, BpeSpec-pinned). At 100 TB,
    * pre-filtering the vocab to words the corpus partition actually
    * contains changes nothing here (it is already the corpus's own
    * vocab); the real lever is that rare-word token counts can also
    * be computed word-locally (len after folds), so a deployment can
    * split the vocab at a frequency cutoff and broadcast only the
    * head. */
  def segmentCounts(docs: DataFrame,
      merges: Seq[Merge], broadcastVocab: Boolean = true): DataFrame = {
    // the merge folds apply over the VOCAB frame in chunks of
    // [[LineageCheckpointEvery]]: a single projection nesting all k
    // mergePass folds crosses the analyzer's exponential-depth knee
    // near k ≈ 16 (see [[LineageCheckpointEvery]]); chunking with a
    // localCheckpoint between chunks keeps every analyzed plan below
    // it. One chunk (k ≤ 8, the graded q101 config) is expression-
    // identical to the unchunked form; the checkpointed frame is the
    // tiny vocabulary, never the corpus.
    var v = vocab(docs)
    var prevChk: DataFrame = null
    val chunks = merges.grouped(LineageCheckpointEvery).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val folded = chunk.foldLeft(col("syms")) { (c, m) =>
        mergePass(c, m.left_sym, m.right_sym)
      }
      v = v.select(col("word"), col("cnt"), folded.as("syms"))
      if (i < chunks.size - 1) {
        val chk = v.localCheckpoint()
        if (prevChk != null)
          org.apache.spark.sql.graft.Bridge.releaseCheckpoint(prevChk)
        prevChk = chk
        v = chk
      }
    }
    val wordToks = v
      .select(col("word"), size(col("syms")).cast("long").as("n_toks"))
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(if (broadcastVocab) broadcast(wordToks) else wordToks, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_toks")).as("n_tokens"))
  }

  /** [[segmentCounts]] under merges trained on the same corpus — the
    * graded end-to-end shape (train, then tokenize). */
  def trainAndCount(docs: DataFrame): DataFrame =
    segmentCounts(docs, trainMerges(docs))
}
