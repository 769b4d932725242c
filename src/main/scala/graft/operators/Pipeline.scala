package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data preprocessing funnel — the composition
  * query that chains the graded pipeline operators the way a corpus
  * build actually runs them: exact dedup → near-dup cluster
  * canonicalization → quality cut → language cut →
  * train/validation/test split, reporting the survivor count of
  * every stage in one row.
  *
  * The point of this operator is compositionality: each stage is THE
  * graded operator ([[Dedup.exactDedup]], [[TextAnalysis.textStats]],
  * [[TextAnalysis.langId]], [[Sampling.trainSplit]]), not a re-derived
  * copy — so the funnel's oracle mirror composes those operators'
  * oracle SQL verbatim and any drift in a component surfaces in two
  * graded queries at once.
  *
  * Scale design (100 TB): the row-local stages (quality, language,
  * split) are fused into ONE corpus scan as shared-builder columns;
  * exact dedup's canonical-min is a window on the content digest over
  * that same fused frame (one shuffle of skinny flags, no join); the
  * near-dup cluster stage is the single remaining join branch —
  * genuinely iterative, so it cannot fuse. The final rollup is a
  * global aggregate of boolean flags — partial-aggregated to a single
  * row per partition before the 1-row merge, so no driver-side row
  * funnel exists anywhere. */
object Pipeline {

  /** Quality cut: keep docs scoring at or above the corpus median
    * (measured 0.36 on the sf0.1 fixture). */
  val QualityThreshold = 0.35

  /** Language cut: keep docs the stopword profiler calls this. */
  val KeepLang = "en"

  /** The fused row-local gate projection — quality, language and
    * split evaluated as columns of ONE pass over (doc_id, text), each
    * built from the same shared Column builders as its graded
    * operator (q6/q7/q32), plus the content digest that keys exact
    * dedup. Works identically on a batch or STREAMING frame (every
    * gate is row-local), which is how
    * [[graft.streaming.StreamingFunnel]] reuses it verbatim. */
  def rowLocalFlags(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      Dedup.contentHashCol(col("text")).as("content_hash"),
      (TextAnalysis.qualityScoreCol(col("text")) >= QualityThreshold)
        .as("keep_quality"),
      (TextAnalysis.langGuessCol(col("text")) === KeepLang)
        .as("keep_lang"),
      Sampling.splitFromBucket(Sampling.splitBucketCol("doc_id"))
        .as("split"))

  /** Near-dup keep flags from a pair set: a doc survives iff it is
    * its own cluster canonical (docs in no pair are vacuously
    * canonical via the rollup's left join + coalesce). Shared by the
    * batch funnel and the streaming finalize. */
  def clusterKeepFlags(pairs: DataFrame): DataFrame =
    Dedup.dedupClusters(pairs.select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"),
        (col("doc_id") === col("canonical_id")).as("keep_nd"))

  /** Final one-row survivor rollup over per-doc flags
    * (doc_id, keep_dedup, keep_quality, keep_lang, split) left-joined
    * with near-dup keep flags (doc_id, keep_nd) — the single join the
    * funnel genuinely needs. */
  def funnelRollup(flags: DataFrame, neardup: DataFrame): DataFrame = {
    val keepNd = col("keep_dedup") && coalesce(col("keep_nd"), lit(true))
    val kept = keepNd && col("keep_quality") && col("keep_lang")
    flags
      .join(neardup, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_raw"),
        sum(col("keep_dedup").cast("long")).as("n_after_dedup"),
        sum(keepNd.cast("long")).as("n_after_neardup"),
        sum((keepNd && col("keep_quality")).cast("long"))
          .as("n_after_quality"),
        sum(kept.cast("long")).as("n_after_lang"),
        sum((kept && col("split") === "train").cast("long")).as("n_train"),
        sum((kept && col("split") === "validation").cast("long"))
          .as("n_validation"),
        sum((kept && col("split") === "test").cast("long")).as("n_test"))
  }

  /** Deterministic two-version derivation of the snapshot-diff
    * fixture (q120): v1 drops ids ≡ 7 (mod 10) (later "added"), v2
    * drops ids ≡ 5 ("removed") and rewrites the text of ids ≡ 3
    * ("changed"). Production diffs two real corpus snapshots; this
    * derivation exists so the oracle can rebuild both sides from the
    * one documents table. */
  val DiffAddedMod = 7
  val DiffRemovedMod = 5
  val DiffChangedMod = 3

  /** Corpus snapshot diff (q120) — the CDC/versioning operator every
    * managed-corpus pipeline runs between ingests: classify every
    * doc_id as added / removed / changed / unchanged by comparing
    * content digests across two snapshot frames.
    *
    * Scale design (100 TB): ONE id-keyed full-outer join (both sides
    * co-partitioned on the join key — with the corpus bucketed by
    * doc_id on disk this is a zero-shuffle sort-merge); the digest is
    * row-local md5, so the join carries (id, 32-byte hash), never the
    * text. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), md5(col("text")).as("old_hash"))
    val b = v2.select(col("doc_id"), md5(col("text")).as("new_hash"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed"))
      .select(col("doc_id"), col("status"), col("old_hash"),
        col("new_hash"))
  }

  /** [[snapshotDiff]] over the deterministic two-version derivation
    * of the documents table (the graded q120 configuration). */
  def snapshotDiffDerived(docs: DataFrame): DataFrame = {
    val v1 = docs.filter(col("doc_id") % 10 =!= DiffAddedMod)
      .select(col("doc_id"), col("text"))
    val v2 = docs.filter(col("doc_id") % 10 =!= DiffRemovedMod)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === DiffChangedMod,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))
          .as("text"))
    snapshotDiff(v1, v2)
  }

  def preprocessingFunnel(docs: DataFrame): DataFrame = {
    // ONE scan computes every row-local gate as a column; exact
    // dedup's canonical-min is a window over the content digest
    // evaluated on this same fused frame: one shuffle of the skinny
    // flag columns instead of a separate branch + join.
    val flags = rowLocalFlags(docs)
      .withColumn("keep_dedup", col("doc_id") === Dedup.canonicalIdCol)
      .drop("content_hash")
    // near-dup stage is the only genuine join branch: cluster labels
    // come from the iterative pair propagation, which cannot be a
    // row-local column.
    funnelRollup(flags,
      clusterKeepFlags(Dedup.minhashNearDups(docs)))
  }
}
