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
  * Scale design (100 TB): three of the four stages are row-local;
  * exact dedup is one hash shuffle on the content digest. The final
  * rollup is a global aggregate of boolean flags — partial-aggregated
  * to a single row per partition before the 1-row merge, so no
  * driver-side row funnel exists anywhere. */
object Pipeline {

  /** Quality cut: keep docs scoring at or above the corpus median
    * (measured 0.36 on the sf0.1 fixture). */
  val QualityThreshold = 0.35

  /** Language cut: keep docs the stopword profiler calls this. */
  val KeepLang = "en"

  def preprocessingFunnel(docs: DataFrame): DataFrame = {
    val dedup = Dedup.exactDedup(docs)
      .select(col("doc_id"), (!col("is_duplicate")).as("keep_dedup"))
    // near-dup stage: survivors are docs that are their own cluster
    // canonical (docs in no near-dup pair are vacuously canonical —
    // left join + coalesce(true))
    val neardup = Dedup.dedupClusters(
        Dedup.minhashNearDups(docs).select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"),
        (col("doc_id") === col("canonical_id")).as("keep_nd"))
    val quality = TextAnalysis.textStats(docs)
      .select(col("doc_id"),
        (col("quality_score") >= QualityThreshold).as("keep_quality"))
    val lang = TextAnalysis.langId(docs)
      .select(col("doc_id"), (col("lang_guess") === KeepLang).as("keep_lang"))
    val split = Sampling.trainSplit(docs)
      .select(col("doc_id"), col("split"))
    val keepNd = col("keep_dedup") && coalesce(col("keep_nd"), lit(true))
    val kept = keepNd && col("keep_quality") && col("keep_lang")
    docs.select(col("doc_id"))
      .join(dedup, "doc_id")
      .join(neardup, Seq("doc_id"), "left")
      .join(quality, "doc_id")
      .join(lang, "doc_id")
      .join(split, "doc_id")
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
}
