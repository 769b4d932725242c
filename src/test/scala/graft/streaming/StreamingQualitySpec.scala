package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Train-offline / serve-online parity of the model-based quality
  * gate: the NB model trained in batch, applied to the same corpus
  * replayed as a three-micro-batch stream, must reproduce the batch
  * operator's margins (to float-fold reordering) and keep verdicts. */
class StreamingQualitySpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("streamed NB scores match the batch classifier doc for doc") {
    val docsBatch = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val model = TextAnalysis.trainNbModel(docsBatch)
    assert(model.lpdiff.nonEmpty)
    val (batchDf, handle) =
      TextAnalysis.nbQualityFilterWithHandle(docsBatch)
    val batch = batchDf.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Double]("margin"),
          r.getAs[Boolean]("keep"))).toMap
    handle.release()

    val docs = docsBatch.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingQuality.nbScore(
        ms.toDF().toDF("doc_id", "text"), model)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sq-nb-cp").toString)
      .format("memory").queryName("nb_stream").start()
    docs.grouped(math.max(1, docs.length / 3)).foreach { wave =>
      ms.addData(wave.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("nb_stream").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Double]("margin"),
          r.getAs[Boolean]("keep"))).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (id, (nTok, margin, keep)) =>
      val (bTok, bMargin, bKeep) = batch(id)
      assert(nTok == bTok, s"doc $id token count")
      // batch sums tf·Δlogp in exchange order, the stream folds the
      // token sequence left to right — identical terms, reordered
      // float addition
      assert(math.abs(margin - bMargin) <= 1e-9 * math.max(1.0,
        math.abs(bMargin)), s"doc $id margin $margin vs $bMargin")
      assert(keep == bKeep, s"doc $id keep flag")
    }
    // the stream query is stateless: scoring holds no aggregation
    // state, so its progress reports zero state rows
    assert(q.lastProgress == null ||
      q.lastProgress.stateOperators.isEmpty ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
  }

  test("r17 hash-map serve model is BIT-identical to the r14 " +
      "literal-map column it replaced (same left fold, same OOV " +
      "floor, same prior placement) — the q118 speedup changed " +
      "nothing observable") {
    import org.apache.spark.sql.functions._
    val docsBatch = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val model = TextAnalysis.trainNbModel(docsBatch)
    val docs = docsBatch.select(col("doc_id"), col("text"))
    // the r14 column, verbatim
    val m = typedLit(model.lpdiff)
    val legacy = docs
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '" +
          TextAnalysis.WordPattern + "', 0)").as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tok"),
        (lit(model.priorDiff) + aggregate(col("w"), lit(0.0),
          (acc, t) => acc + coalesce(element_at(m, t),
            lit(model.lpdiff0)))).as("margin"))
      .withColumn("keep", col("margin") > 0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    val got = StreamingQuality.nbScore(docs, model)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.keySet == legacy.keySet)
    got.foreach { case (id, (n, margin, keep)) =>
      val (ln, lm, lk) = legacy(id)
      assert(n == ln && keep == lk, s"doc $id")
      assert(java.lang.Double.doubleToLongBits(margin) ==
        java.lang.Double.doubleToLongBits(lm),
        s"doc $id margin must be BIT-identical: $margin vs $lm")
    }
  }
}
