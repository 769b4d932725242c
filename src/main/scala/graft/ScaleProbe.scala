package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic for scale behavior: replicate the documents /
  * embeddings corpus N× in memory (ids re-keyed to stay unique) and
  * measure the LLM-pipeline operators' wall time — evidence that the
  * bucketed designs scale with corpus size, not pair count.
  * `runMain graft.ScaleProbe [factor] [sfDir]`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // documents replicated with perturbed ids; text salted per copy so
    // replicas are NOT trivial duplicates of each other (that would
    // measure the dup-explosion regime, not the scaling regime)
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val n0 = docs0.count()
    val copies = spark.range(factor).select(col("id").as("copy"))
    val docs = docs0.crossJoin(copies)
      .select((col("doc_id") * factor + col("copy")).as("doc_id"),
        concat(col("text"), lit(" copysalt"), col("copy")).as("text"))
      .persist()
    println(s"[scale] documents: $n0 -> ${docs.count()} rows (${factor}x)")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[scale] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    time("dedup_exact")(Dedup.exactDedup(docs))
    time("dedup_minhash")(Dedup.minhashNearDups(docs))
    time("simhash_dups")(TextAnalysis.simhashDups(docs))
    time("text_stats")(TextAnalysis.textStats(docs))

    val emb0 = Similarity.embeddings(spark, sfDir)
    val emb = emb0.crossJoin(copies)
      .select((col("vec_id") * factor + col("copy")).as("vec_id"),
        transform(col("v"), x => x + col("copy") * 0.001).as("v"))
      .withColumn("norm", sqrt(aggregate(
        transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
      .persist()
    println(s"[scale] embeddings: -> ${emb.count()} rows")
    time("ann_lsh")(Similarity.lshTopK(emb))
    time("ann_ivf")(Similarity.ivfTopK(emb))
    time("dedup_embed")(Similarity.embeddingNearDups(emb))
    spark.stop()
  }
}
