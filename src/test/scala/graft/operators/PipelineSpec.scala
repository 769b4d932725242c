package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkSessionSpec {

  test("snapshotDiff classifies added/removed/changed/unchanged " +
      "exactly; derived config flags the right residue classes") {
    import spark.implicits._
    val v1 = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("doc_id", "text")
    val out = Pipeline.snapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // derived two-version config over the fixture: status is purely
    // a function of doc_id % 10
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val derived = Pipeline.snapshotDiffDerived(docs).collect()
    assert(derived.length == 500)
    derived.foreach { r =>
      val expected = (r.getLong(0) % 10) match {
        case Pipeline.DiffAddedMod => "added"
        case Pipeline.DiffRemovedMod => "removed"
        case Pipeline.DiffChangedMod => "changed"
        case _ => "unchanged"
      }
      assert(r.getString(1) == expected,
        s"doc ${r.getLong(0)}: ${r.getString(1)} != $expected")
    }
  }

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
