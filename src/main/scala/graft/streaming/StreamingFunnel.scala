package graft.streaming

import graft.operators.Pipeline
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The preprocessing funnel run INCREMENTALLY over a document stream —
  * the ingest-time shape of [[graft.operators.Pipeline]]: every
  * arriving document is gated continuously instead of in a corpus-wide
  * batch pass.
  *
  * What streams and what cannot:
  *  - quality / language / split gates are [[Pipeline.rowLocalFlags]]
  *    VERBATIM — row-local expressions run unchanged on a streaming
  *    frame;
  *  - exact dedup becomes first-arrival-wins state keyed on the same
  *    content digest (under a doc_id-ordered replay, first arrival IS
  *    the batch canonical = min doc_id, so per-doc decisions match the
  *    batch operator exactly — and the per-group survivor COUNT is
  *    order-independent);
  *  - near-dup PAIRS stream with exact batch parity
  *    ([[StreamingDedup.nearDupPairs]]); the cluster CANONICALIZATION,
  *    however, is a connected-components fixpoint over the whole pair
  *    set — a doc's component can merge with an earlier one via a pair
  *    between two LATER docs, so no online rule can finalize it
  *    incrementally. The funnel therefore follows the standard
  *    lambda shape: stream the flags and the pairs continuously,
  *    and canonicalize + roll up at a checkpoint with
  *    [[finalizeCounts]] (a cheap batch step over the small streamed
  *    outputs, NOT over the corpus).
  *
  * StreamingFunnelSpec proves end-to-end parity: streamed survivor
  * counts equal the batch funnel's row on the same corpus.
  */
object StreamingFunnel {

  final case class DocFlags(doc_id: Long, keep_dedup: Boolean,
      keep_quality: Boolean, keep_lang: Boolean, split: String)

  /** Per-document funnel gates over a streaming (doc_id, text) frame:
    * the fused row-local projection plus the stateful first-arrival
    * exact-dedup decision (state per content digest is one boolean). */
  def docFlags(docs: DataFrame): Dataset[DocFlags] = {
    import docs.sparkSession.implicits._
    val flagged = Pipeline.rowLocalFlags(docs)
      .select(col("doc_id"), col("content_hash"), col("keep_quality"),
        col("keep_lang"), col("split"))
      .as[(Long, String, Boolean, Boolean, String)]
    flagged
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, DocFlags](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String, Boolean, Boolean, String)],
            state: GroupState[Boolean]) =>
          var taken = state.getOption.getOrElse(false)
          val out = List.newBuilder[DocFlags]
          // doc_id order within the micro-batch: the smallest id of a
          // same-batch content group is the keeper, matching the batch
          // operator's min-id canonical under ordered replay
          for ((id, _, q, l, s) <- rows.toSeq.sortBy(_._1)) {
            out += DocFlags(id, !taken, q, l, s)
            taken = true
          }
          state.update(taken)
          out.result().iterator
      }
  }

  /** Checkpoint finalize (the lambda step): connected-components
    * canonicalization over the streamed pair set + the shared one-row
    * rollup over the streamed flags. Both inputs are the SMALL
    * streamed outputs — the corpus is never re-scanned. */
  def finalizeCounts(flags: DataFrame, pairs: DataFrame): DataFrame =
    Pipeline.funnelRollup(flags, Pipeline.clusterKeepFlags(pairs))

  /** Per-micro-batch DECONTAMINATION screens (q246) — the q223
    * stages that stream for free because their benchmark sides are
    * STATIC (the q237 broadcast discipline): the q43 frac-shared
    * n-gram screen against a once-built broadcast fingerprint set,
    * and the q219 semantic screen of the batch's embeddings against
    * the broadcast benchmark vectors. Both are per-document
    * STATELESS decisions, so running them on each arriving batch in
    * foreachBatch is exact — no watermark, no state store, no order
    * sensitivity. Returns the batch's hit flags:
    * (doc_id, ng_hit, sem_hit). */
  def decontamScreen(batch: DataFrame, benchFps: DataFrame,
      emb: DataFrame): DataFrame = {
    import graft.operators.{Dedup, Pipeline, Similarity}
    val ids = batch.select(col("doc_id"))
    val ng = Dedup.contaminationAgainst(
        Dedup.winnowFingerprints(batch.filter(
          col("doc_id") >= Similarity.SemDecontamBenchBelow)),
        benchFps)
      .filter(col("frac_shared") >= Pipeline.ContamFracThreshold)
      .select(col("doc_id"), lit(true).as("ng_hit"))
    val sem = Similarity.semanticContaminationAgainst(
        emb.join(ids.withColumnRenamed("doc_id", "vec_id"), "vec_id")
          .filter(col("vec_id") >= Similarity.SemDecontamBenchBelow),
        emb.filter(col("vec_id") < Similarity.SemDecontamBenchBelow))
      .select(col("corpus_vec").as("doc_id")).distinct()
      .withColumn("sem_hit", lit(true))
    ids.join(ng, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ng_hit"), lit(false)).as("ng_hit"),
        coalesce(col("sem_hit"), lit(false)).as("sem_hit"))
      .filter(col("ng_hit") || col("sem_hit"))
  }

  /** Checkpoint finalize of the DECONTAMINATED funnel (q246): the
    * q223 rollup over the streamed flag/pair/hit outputs — grading
    * against q223's own oracle is the parity contract. */
  def finalizeDecontam(flags: DataFrame, pairs: DataFrame,
      hits: DataFrame): DataFrame =
    Pipeline.decontamRollup(flags,
      Pipeline.clusterKeepFlags(pairs),
      hits.filter(col("ng_hit")).select(col("doc_id"),
        lit(true).as("ng_hit")),
      hits.filter(col("sem_hit")).select(col("doc_id"),
        lit(true).as("sem_hit")))
}
