package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental k-NN graph maintenance: the as-of candidate rule
  * (edges only point to already-ingested waves), exact retry
  * idempotence of the per-batch edge output (overwrite semantics, a
  * stronger contract than the index's at-least-once ledger), and the
  * final-wave completeness property (the last wave's edges equal the
  * batch-mode knn restricted to its sources). */
class StreamingKnnGraphSpec extends AnyFunSuite with SparkSessionSpec {

  private lazy val emb =
    Similarity.embeddings(spark, "/root/testdata/sf0.001")

  private def edgeSet(df: DataFrame): Set[(Long, Long, Long, Double)] = df
    .select("src", "neighbor_id", "rank", "cosine").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("as-of rule: edges never point forward in arrival order; " +
      "re-delivered batch overwrites its own edges exactly") {
    val wh = Files.createTempDirectory("knn-graph-spec").toString
    spark.sql("DROP TABLE IF EXISTS graft_knn_spec_idx")
    val waves = (0 until 3).map(w =>
      emb.filter(col("vec_id") % 3 === w).persist())
    waves.zipWithIndex.foreach { case (b, w) =>
      StreamingKnnGraph.processBatch("graft_knn_spec_idx",
        s"$wh/idx", s"$wh/edges", emb)(b, w.toLong)
    }
    val edgeRows = spark.read.parquet(s"$wh/edges").collect()
    // wave(dst) <= wave(src) for every edge
    edgeRows.foreach { r =>
      val (src, dst) = (r.getAs[Long]("src"), r.getAs[Long]("neighbor_id"))
      assert(dst % 3 <= src % 3,
        s"edge $src -> $dst points FORWARD in arrival order")
    }
    val before = edgeRows.filter(_.getAs[Long]("src") % 3 == 2)
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank"), r.getAs[Double]("cosine"))).toSet
    val countBefore = edgeRows.length
    // retry wave 2 with the same batch id: the index append is a
    // ledger no-op and the edge directory overwrites to the same rows
    StreamingKnnGraph.processBatch("graft_knn_spec_idx",
      s"$wh/idx", s"$wh/edges", emb)(waves(2), 2L)
    val after = edgeSet(spark.read.parquet(s"$wh/edges")
      .filter(col("src") % 3 === 2))
    assert(after == before, "retry changed the wave-2 edge set")
    // and the full edge count is unchanged (no duplicate rows)
    assert(spark.read.parquet(s"$wh/edges").count() == countBefore)
    waves.foreach(_.unpersist())
    spark.sql("DROP TABLE IF EXISTS graft_knn_spec_idx")
  }
}
