package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkSessionSpec {

  test("funnel stages are monotone and splits partition the final set") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r = Pipeline.preprocessingFunnel(docs).collect()(0)
    val Seq(raw, dedup, neardup, quality, lang, train, valid, test) =
      (0 until 8).map(r.getLong)
    assert(raw >= dedup && dedup >= neardup &&
      neardup >= quality && quality >= lang)
    assert(train + valid + test == lang)
    assert(raw == docs.count())
    assert(lang > 0, "funnel filtered everything out — thresholds broken")
  }
}
