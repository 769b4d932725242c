package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The serve-online half of the model-based quality gate: score a
  * DOCUMENT STREAM under a batch-trained Naive Bayes model
  * ([[TextAnalysis.trainNbModel]]) — the split production quality
  * filters actually run (fastText-style model trained offline on
  * labeled data, applied at ingest to every arriving document).
  *
  * The model rides into the plan as literal constants (a map column
  * plus two scalars — the same broadcast-constant contract as the IVF
  * codebook expressions), so scoring is entirely ROW-LOCAL: tokenize,
  * sequential left fold of Δlogp over the document's own tokens, add
  * the prior. Zero state, zero shuffle, no watermark needed —
  * append-mode streaming with per-batch cost linear in arriving
  * bytes, and the identical column works on a BATCH frame (parity
  * spec-pinned against [[TextAnalysis.nbQualityFilter]], whose
  * grouped Σ tf·Δlogp sums the same terms in exchange order — the
  * two agree to float-fold reordering, ~1e-13).
  */
object StreamingQuality {

  def nbScore(docs: DataFrame,
      model: TextAnalysis.NbModel): DataFrame = {
    // r17: the model rides as a reference-object hash map
    // (O(1)/token lookups) instead of a typedLit map literal whose
    // element_at was a LINEAR |V| scan per token and whose literal
    // tree re-serialized with every task — the q118 gate creep. The
    // margin fold (0.0 + Δlogp per token in sequence order, prior
    // last) is bit-identical to the old column and to the DuckDB
    // mirror's list_reduce (NbServeParitySpec pins both).
    val terms = model.lpdiff.keys.toArray
    val serve = new org.apache.spark.sql.graft.NbServeModel(
      terms, terms.map(model.lpdiff), model.lpdiff0, model.priorDiff)
    docs
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '" +
          TextAnalysis.WordPattern + "', 0)").as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tok"),
        org.apache.spark.sql.graft.Bridge.column(
          org.apache.spark.sql.graft.NbMargin(
            org.apache.spark.sql.graft.Bridge.expression(col("w")),
            serve)).as("margin"))
      .withColumn("keep", col("margin") > 0)
  }
}
