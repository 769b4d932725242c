package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece merge training — the LIKELIHOOD-scored member of the
  * tokenizer-training family (beside the frequency-scored BPE
  * trainers, q100/q312, and the unigram LM, q172): per merge step,
  * instead of the most FREQUENT adjacent pair, WordPiece picks the
  * pair maximizing score = count(l,r) / (count(l) · count(r)) — the
  * pair whose fusion most improves a unigram corpus likelihood
  * (Schuster & Nakajima's original criterion, the trainer behind the
  * BERT-family vocabularies; cf. the reference's pipeline scope in
  * SURVEY.md §2.5 — the reference itself has no tokenizer trainer,
  * this is forward surface).
  *
  * Scale design (100 TB) is inherited from [[Bpe]]: the corpus
  * collapses once to its distinct-word vocabulary (one shuffle);
  * each round then needs one vocabulary-sized pair count, one
  * SYMBOL-sized unit count (the scoring denominator — a few
  * thousand rows, broadcast to the pair side), and one
  * driver-bounded candidate-prefix collect — batched like q312, so
  * a 30k-merge vocabulary is ~rounds Spark jobs, never a
  * per-merge driver loop.
  *
  * Batch invariance: the score of candidate (l, r) depends on the
  * pair count c(l,r) AND the unit counts u(l), u(r). Merging
  * (a,b) → m changes pair counts only of pairs touching a/b/m and
  * unit counts only of a, b, m — so a candidate is score-invariant
  * under earlier acceptances iff BOTH its symbols are disjoint from
  * every earlier acceptance's {left, right, merged} (blanket symbol
  * disjointness — STRICTER than q312's pair-count condition, because
  * the denominator also moves when a shared symbol's unit count
  * drops). Every recorded (pair_count, score) is therefore the TRUE
  * corpus value at that merge's own substep, and the greedy scan in
  * score order equals the iterated argmax (WordPieceSpec pins both
  * against a naive recount-per-substep simulator). Like q312, what
  * batching changes is visibility of MID-BATCH-created pairs — the
  * standard batched-trainer deviation, documented not hidden.
  *
  * Simplification vs production WordPiece, stated loudly: symbols
  * are bare characters (no "##" continuation marker) and there is no
  * minimum-count floor — the marker is a display convention that
  * would thread through every fold without changing selection
  * order, and the floor is a pruning heuristic; the likelihood
  * SCORING — the algorithmic essence — is exact. */
object WordPiece {

  /** Fixed round/batch shape of the graded trainer (q328/q329) —
    * the same closed-form-oracle contract as [[Bpe.BatchedRounds]]:
    * a fixed round count is what a DuckDB mirror can unroll. */
  val Rounds = 3
  val BatchSize = 4

  /** One accepted WordPiece merge: at `step`, pair (left, right) had
    * the highest likelihood score (ties break on (left, right)
    * ascending — the determinism contract shared with the oracle).
    * `pair_count` and `score` are the TRUE corpus values at this
    * merge's own substep (see the invariance note above). */
  final case class WpMerge(step: Int, left_sym: String,
      right_sym: String, merged: String, pair_count: Long,
      score: Double)

  /** Per-symbol occurrence totals over the current vocabulary,
    * weighted by word count — the scoring denominator. Symbol-sized
    * (≤ alphabet + learned merges), broadcastable by construction. */
  def unitCounts(v: DataFrame): DataFrame =
    v.select(col("cnt"), explode(col("syms")).as("s"))
      .groupBy(col("s"))
      .agg(sum(col("cnt")).as("u"))

  /** Train `rounds` × up-to-`batchSize` merges, likelihood-scored.
    * Per round: one pair count, one unit count (broadcast), one
    * driver-bounded prefix collect (4×batchSize rows), the blanket
    * disjointness accept scan, and ONE vocabulary fold for the whole
    * batch. */
  def trainRounds(docs: DataFrame, rounds: Int = Rounds,
      batchSize: Int = BatchSize): Seq[WpMerge] = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var v = Bpe.vocab(docs).persist(level)
    var prev: DataFrame = null
    def release(df: DataFrame): Unit = {
      df.unpersist(blocking = true)
      org.apache.spark.sql.graft.Bridge.releaseCheckpoint(df)
    }
    def releasePrev(): Unit =
      if (prev != null) { release(prev); prev = null }
    val out = Seq.newBuilder[WpMerge]
    var step = 0
    var round = 0
    var sinceChk = 0
    var exhausted = false
    while (!exhausted && round < rounds) {
      round += 1
      val units = unitCounts(v)
      val cand = Bpe.pairCounts(v)
        .join(broadcast(units.select(col("s").as("l"),
          col("u").as("ul"))), "l")
        .join(broadcast(units.select(col("s").as("r"),
          col("u").as("ur"))), "r")
        .select(col("l"), col("r"), col("c"),
          (col("c").cast("double") /
            (col("ul").cast("double") * col("ur").cast("double")))
            .as("score"))
        .orderBy(col("score").desc, col("l").asc, col("r").asc)
        .limit(batchSize * 4).collect()
      releasePrev()
      if (cand.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val batch = Seq.newBuilder[WpMerge]
        var n = 0
        cand.foreach { row =>
          val l = row.getAs[String]("l")
          val r = row.getAs[String]("r")
          if (n < batchSize && !used(l) && !used(r)) {
            batch += WpMerge(step + n, l, r, l + r,
              row.getAs[Long]("c"), row.getAs[Double]("score"))
            used += l; used += r; used += (l + r)
            n += 1
          }
        }
        val merges = batch.result()
        out ++= merges
        prev = v
        val folded = merges.foldLeft(col("syms")) { (c, m) =>
          Bpe.mergePass(c, m.left_sym, m.right_sym)
        }
        val next = v.select(col("word"), col("cnt"), folded.as("syms"))
        step += merges.size
        sinceChk += merges.size
        v = if (sinceChk >= Bpe.LineageCheckpointEvery) {
          sinceChk = 0; next.localCheckpoint()
        } else next.persist(level)
      }
    }
    release(v)
    releasePrev()
    out.result()
  }

  /** The graded merge table (q328): one row per accepted merge in
    * acceptance order, with its true substep pair count and score. */
  def mergeTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    trainRounds(docs).toDF()
  }

  /** Per-document token counts under the WordPiece-trained merges
    * (q329) — [[Bpe.segmentCounts]]'s broadcast word→count apply,
    * the fold order being the acceptance order. */
  def trainAndCount(docs: DataFrame): DataFrame =
    Bpe.segmentCounts(docs,
      trainRounds(docs).map(m =>
        Bpe.Merge(m.step, m.left_sym, m.right_sym, m.merged,
          m.pair_count)))
}
