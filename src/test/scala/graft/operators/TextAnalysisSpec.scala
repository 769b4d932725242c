package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  test("textStats computes hand-checked values") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(df).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_distinct_tokens") == 5) // "the" twice
    assert(r.getAs[Long]("n_stopwords") == 3)       // the, on, the
    assert(r.getAs[Long]("n_chars") == 22)
    assert(r.getAs[Long]("sum_token_chars") == 17)
    assert(r.getAs[Long]("est_bpe_tokens") == 6)    // ceil(22/4)
    assert(math.abs(r.getAs[Double]("avg_token_len") - 17.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.5) < 1e-12)
  }

  test("langId picks the profile with the most matches, en precedence on ties") {
    val df = Seq(
      (1L, "the cat and the dog"),     // en
      (2L, "der hund und die katze"),  // de
      (3L, "qq ww zz")                 // no matches anywhere -> en by precedence
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "en")
  }

  test("simhash: identical docs distance 0, near docs < far docs") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val sims = TextAnalysis.simhashDocs(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sims(a) ^ sims(b))
    assert(ham(1L, 2L) == 0)
    assert(ham(1L, 3L) < ham(1L, 4L))
  }

  test("simhashDups finds exact-duplicate pair via banded join") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.simhashDups(df)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }
}
