package graft.operators

import java.nio.file.Files

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted-LSH-index serving story: build once, probe without
  * moving the corpus. Parity pins probe ≡ per-batch [[Similarity.lshTopK]];
  * the plan audit pins WHY it scales — the index side of the candidate
  * join is read bucket-aligned (no corpus exchange) and corpus banding
  * is not recomputed at probe time. */
class LshIndexSpec extends AnyFunSuite with SparkSessionSpec {

  private lazy val emb =
    Similarity.embeddings(spark, "/root/testdata/sf0.001")

  test("index probe matches per-batch LSH top-k; corpus never shuffles") {
    val wh = Files.createTempDirectory("lsh-wh").toString
    // force the bucket-join path: with broadcast on, the tiny probe
    // side would broadcast (also exchange-free, but then the test
    // would not pin the bucketed layout the 100 TB probe relies on)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Similarity.writeLshIndex(emb, "lsh_idx", s"$wh/lsh_idx", buckets = 8)
      val probe = Similarity.probeLshIndex(emb, "lsh_idx")
      val expected = Similarity.lshTopK(emb)

      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "neighbor_id", "rank", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(canon(probe) == canon(expected))

      val plan = probe.queryExecution.executedPlan.toString
      // the index is read through its bucketed layout...
      assert(plan.contains("SelectedBucketsCount"),
        "index scan is not bucket-aligned")
      // ...and only the banded QUERY rows exchange onto (band, key);
      // a second (band, key) exchange would mean the corpus moved
      val bandExchanges = "Exchange hashpartitioning\\(band".r
        .findAllIn(plan).size
      assert(bandExchanges == 1,
        s"expected 1 probe-side (band,key) exchange, got $bandExchanges")
      // corpus banding happened at BUILD time: the probe plan bands
      // the queries only (one hyperplane_bands, on the query side)
      val bandings = "hyperplane_bands".r.findAllIn(plan).size
      assert(bandings == 1,
        s"corpus banding recomputed at probe time ($bandings sites)")
    } finally {
      spark.sql("DROP TABLE IF EXISTS lsh_idx")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
