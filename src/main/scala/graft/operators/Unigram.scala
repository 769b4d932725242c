package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, UnigramOps, UnigramSegment}

/** Unigram-LM (SentencePiece-family) tokenizer — the second tokenizer
  * family next to BPE (q100/q101): seed the piece inventory with all
  * short substrings of the corpus vocabulary, fit piece probabilities
  * by EM, PRUNE to a vocabulary budget (single characters always
  * survive — the coverage guarantee), refit, and apply by Viterbi
  * segmentation.
  *
  * Deviation from SentencePiece, documented: the E-step here is
  * VITERBI-EM (each word's expected counts come from its single
  * best segmentation) rather than full forward-backward expectation.
  * Full EM sums path posteriors — floating sums over exponentially
  * many paths whose cross-engine bit-equality cannot be pinned;
  * Viterbi-EM keeps the algorithm's structure (seed → E → M → prune
  * → E → M) with integer expected counts and an exactly-mirrorable
  * argmax, the same determinism trade the k-means family makes.
  * Hard-EM is itself a standard approximation in the unigram-LM
  * literature.
  *
  * Determinism contract (shared with the DuckDB mirror, OracleSql
  * .unigramModel/.unigramSegment):
  *  - logp = round(ln(cnt/total), 9) — pre-ROUNDED so both engines
  *    walk the same score grid; path scores are left folds of these
  *    rounded values along the word, bit-identical across engines.
  *  - Viterbi ties prefer the SHORTEST last piece (strict > scanning
  *    lengths ascending ≡ score DESC, len ASC).
  *  - Prune ranks (cnt DESC, piece ASC in UTF-8 byte order); single
  *    chars absent from the rank re-enter with count 1.
  *
  * Scale design (100 TB): every pass runs over the DISTINCT-WORD
  * vocabulary (the ~10⁵× compression BPE q100 uses — the raw token
  * stream never shuffles); segmentation is a row-local codegen'd
  * kernel with the model baked in as a broadcast-sized constant
  * (like the IVF codebooks), so E-steps are one map-side-combined
  * piece-count aggregation each; the model (≤ seed inventory) is the
  * only driver-bound data. The seed inventory is corpus-vocabulary-
  * bounded (≤ Σ|word|·MaxPieceLen distinct substrings); production
  * adds a min-count/top-N seed cap — the [[Similarity.TrainSample]]
  * knob of this trainer. */
object Unigram {

  /** Longest piece considered (SentencePiece default regime is 2–8;
    * 4 keeps the oracle's DP unroll at 4 branches/position). */
  val MaxPieceLen = 4

  /** Words longer than this are excluded from TRAINING and fall back
    * to per-character segmentation at APPLY time — the length guard
    * production tokenizers pair with byte-fallback. Bounds the
    * oracle's DP unroll. */
  val MaxWordLen = 12

  /** Vocabulary budget of the prune step. */
  val VocabTarget = 256

  /** EM schedule: seed → E → M → prune → E → M (two Viterbi-EM
    * passes around one prune). */
  val EmPasses = 2

  /** Distinct-word vocabulary (word, cnt) over trainable words. */
  def words(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0 &&
        length(col("word")) <= MaxWordLen)
      .groupBy(col("word"))
      .agg(count(lit(1)).cast("long").as("cnt"))

  /** Seed piece counts: every substring of length 1..[[MaxPieceLen]]
    * of every vocabulary word, weighted by word count. One shuffle
    * of (piece, partial-count) pairs, map-side combined. */
  def seedCounts(w: DataFrame): DataFrame =
    w.select(col("cnt"), explode(expr(
        s"flatten(transform(sequence(1, length(word)), i -> " +
          s"transform(sequence(1, least($MaxPieceLen, length(word) - i + 1)), " +
          s"l -> substring(word, i, l))))")).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("cnt")).as("cnt"))

  /** UTF-8 byte-order comparison — the piece tie-break collation
    * shared by Spark's UTF8String and DuckDB's binary collation
    * (driver-side Scala String order is UTF-16 and would diverge on
    * supplementary-plane text). */
  private[operators] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private[operators] def logp(cnt: Long, total: Long): Double =
    BigDecimal(math.log(cnt.toDouble / total.toDouble))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private[operators] def model(counts: Array[(String, Long)]): UnigramOps.Model = {
    val total = counts.map(_._2).sum
    val sorted = counts.sortWith((a, b) => utf8Less(a._1, b._1))
    new UnigramOps.Model(sorted.map(_._1),
      sorted.map(c => logp(c._2, total)), MaxPieceLen)
  }

  /** One E-step: Viterbi-segment the vocabulary under `m`, count
    * pieces weighted by word count. Row-local kernel + one piece-
    * keyed aggregation; result is model-sized (driver-bounded). */
  private def viterbiCounts(w: DataFrame,
      m: UnigramOps.Model): Array[(String, Long)] =
    w.select(col("cnt"),
        explode(Bridge.column(UnigramSegment(
          Bridge.expression(col("word")), m))).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Prune to [[VocabTarget]] by (cnt DESC, piece ASC-utf8); single
    * chars of the training vocabulary always survive — absent ones
    * re-enter with count 1 (the coverage floor). */
  private[operators] def prune(counts: Array[(String, Long)],
      chars: Set[String]): Array[(String, Long)] = {
    val kept = counts
      .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && utf8Less(a._1, b._1)))
      .take(VocabTarget)
    val keptSet = kept.map(_._1).toSet
    val cmap = counts.toMap
    val extra = chars.toSeq.filterNot(keptSet)
      .sortWith(utf8Less)
      .map(c => (c, cmap.getOrElse(c, 1L)))
    kept ++ extra
  }

  /** Train the full schedule and return the final piece inventory
    * with counts and log-probabilities. */
  def trainModel(docs: DataFrame)
      : (Array[(String, Long)], UnigramOps.Model) = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val w = words(docs).persist(level)
    val seed = seedCounts(w).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val chars = seed.collect { case (p, _) if p.length == 1 ||
      (p.codePointCount(0, p.length) == 1) => p }.toSet
    val m0 = model(seed)
    val c1 = viterbiCounts(w, m0)
    val v1 = prune(c1, chars)
    val m1 = model(v1)
    val c2 = viterbiCounts(w, m1)
    val v2 = prune(c2, chars)
    w.unpersist()
    (v2, model(v2))
  }

  /** Graded model table (q172): (piece, cnt, logp) after the full
    * seed → EM → prune → EM → prune schedule. */
  def modelTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val (vocab, _) = trainModel(docs)
    val total = vocab.map(_._2).sum
    vocab.toSeq.map { case (p, c) => (p, c, logp(c, total)) }
      .toDF("piece", "cnt", "logp")
  }

  /** Graded apply (q173): per-document word and token counts under
    * the trained model — trainable words segment by Viterbi, longer
    * words fall back to per-character counts. The segmentation runs
    * once per DISTINCT word and joins back to the document word
    * stream (the q101 compression trick). */
  def segmentCounts(docs: DataFrame): DataFrame = {
    val (_, m) = trainModel(docs)
    applyCounts(docs, w => size(Bridge.column(UnigramSegment(
      Bridge.expression(w), m))).cast("long"))
  }

  /** Graded WordPiece-style GREEDY apply (q193): the SAME trained
    * piece inventory as q173, applied longest-match-first instead of
    * by Viterbi — the streaming rule WordPiece/BERT tokenizers run
    * at serve time (no DP, one forward scan; here over a
    * SentencePiece-style vocab, i.e. no `##` continuation marking).
    * Greedy can only over-count vs the Viterbi optimum (a stranded
    * tail decomposes into singles — spec-pinned on a hand model),
    * which is exactly the budget question q193 grades: per-document
    * token counts under the serving tokenizer, not the training one.
    * Same distinct-word compression and per-char long-word fallback
    * as q173. */
  def greedyCounts(docs: DataFrame): DataFrame = {
    val (_, m) = trainModel(docs)
    applyCounts(docs, w => size(Bridge.column(
      org.apache.spark.sql.graft.GreedySegment(
        Bridge.expression(w), m))).cast("long"))
  }

  /** Shared apply tail (q173/q193): segment once per DISTINCT word
    * under `tokCount`, join back to the document word stream, roll
    * up per-document word/token counts with the per-character
    * fallback for words beyond the training length guard. */
  private def applyCounts(docs: DataFrame,
      tokCount: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column): DataFrame = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val toks = words(docs)
      .select(col("word"), tokCount(col("word")).as("n_toks"))
      .persist(level)
    val stream = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    stream.join(toks, Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_toks"),
          length(col("word")).cast("long"))).as("n_tokens"))
  }
}
