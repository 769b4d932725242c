package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.Similarity
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the persisted LSH index
  * ([[Similarity.writeLshIndex]]) — the daily-ingest shape of every
  * embedding-retrieval deployment: new document batches arrive as a
  * stream, each micro-batch's vectors are banded once and APPENDED to
  * the bucketed index table, and probes
  * ([[Similarity.probeLshIndex]], [[Similarity.hybridRrfIndexed]])
  * see the whole corpus without any rebuild. The alternative — re-run
  * [[Similarity.writeLshIndex]] over the full corpus per ingest — is
  * a full-corpus scan + NumPlanes·|corpus| banding dots each time; the
  * streaming path pays only the NEW batch's banding, which is the only
  * affordable form at 100 TB with daily arrivals.
  *
  * Correctness properties (StreamingLshIndexSpec pins each):
  *  - Parity: after N batches the table holds exactly the banded rows
  *    of the union of the batches, so a probe equals a probe of a
  *    fresh full-corpus index.
  *  - Idempotent re-delivery: a committed-batch ledger (one marker
  *    file per micro-batch id, written AFTER the data commit) makes
  *    foreachBatch retries no-ops. The window between data commit and
  *    marker write degrades to at-least-once — harmless here, because
  *    every probe collapses candidates through a (query_id, vec_id)
  *    distinct, so duplicate index rows never change a result (only
  *    waste bytes until [[compact]] drops them).
  *  - Boundedness: the job is stateless (no watermark, no state
  *    store — the table IS the state), and each batch writes at most
  *    `buckets` files (the batch is repartitioned onto the bucket
  *    hash before the bucketed write, so each task holds exactly one
  *    bucket). File count grows one file per bucket per batch;
  *    [[compact]] rewrites the table back to one file per bucket.
  *
  * Reference shape: the incremental-dedup operator (q52) for near-dup
  * text; this is its ANN-index sibling per SURVEY.md's retrieval
  * serving plan.
  */
object StreamingLshIndex {

  /** Idempotent per-batch append: skip if `batchId` is in the ledger,
    * else append the batch's banded rows to the bucketed `table`
    * (created on the first batch) and record the marker. Visible for
    * direct retry testing. */
  def appendBatch(table: String, path: String, buckets: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val ledger = new Path(path, "_graft_batches")
    val marker = new Path(ledger, batchId.toString)
    val fs = ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      Similarity.bandedRows(batch)
        // one partition per bucket: repartition's hash partitioning is
        // the same Murmur3 pmod the bucketed write assigns files by,
        // so each task holds exactly one bucket -> `buckets` files per
        // batch, not tasks x buckets
        .repartition(buckets, col("band"), col("key"))
        .write.mode("append")
        .bucketBy(buckets, "band", "key").sortBy("band", "key")
        .option("path", path).saveAsTable(table)
      val out = fs.create(marker, true)
      try out.write(batchId.toString.getBytes(UTF_8)) finally out.close()
    }
  }

  /** Run the maintenance job: `embStream` is a streaming DataFrame
    * with the corpus embedding shape (vec_id, v, norm). Stateless
    * foreachBatch — restart-safe via `checkpoint` plus the batch
    * ledger. */
  def maintain(embStream: DataFrame, table: String, path: String,
      buckets: Int = 32, checkpoint: String): StreamingQuery =
    embStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(appendBatch(table, path, buckets) _)
      .start()

  /** Rewrite the index back to one file per bucket (and drop any
    * at-least-once duplicate rows). Writes a fresh generation
    * directory, swaps the table name, and deletes the old files —
    * probes in flight against the old generation finish on their
    * already-listed files; new probes plan against the new table.
    * Run cadence is a policy knob (e.g. nightly, or when file count
    * exceeds batches x buckets x threshold). */
  def compact(spark: SparkSession, table: String, newPath: String,
      buckets: Int = 32): Unit = {
    val oldLocation = new Path(spark.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val tmp = s"${table}_compacting"
    spark.table(table).dropDuplicates()
      .repartition(buckets, col("band"), col("key"))
      .write.mode("overwrite")
      .bucketBy(buckets, "band", "key").sortBy("band", "key")
      .option("path", newPath).saveAsTable(tmp)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    val fs = oldLocation.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(oldLocation, true)
  }
}
