package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming WARC revisit detection (q272) — the incremental twin
  * of the batch q252 dedup: a live crawler must decide response-vs-
  * revisit the moment a recapture lands, against the digests it has
  * already stored for that URI. The digest itself is the SAME
  * row-local md5 column as batch; state per URI is the FIRST
  * capture's digest (the batch operator's reference point), and
  * every capture emits immediately — offsets of truth never wait.
  *
  * Parity contract (spec- and oracle-pinned): with per-URI arrival
  * in run order, the streamed rows equal the batch q252 output
  * exactly.
  *
  * Scale design (100 TB): state is one 32-char digest per URI seen
  * — the content-addressed index a real crawl store keeps anyway;
  * keyed by URI so it shards with the crawl. */
object StreamingRevisit {

  final case class Cap(doc_id: Long, run: Long, target_uri: String,
      capture_ts: String, digest: String, len: Long)

  final case class RevisitRow(doc_id: Long, run: Long,
      target_uri: String, capture_ts: String, digest: String,
      record_type: String, saved_chars: Long)

  final case class UriState(firstDigest: String)

  /** snapshots: streaming (doc_id, run, snap_text) frame, per-URI
    * run-order arrival across batches. */
  def detect(snapshots: DataFrame): Dataset[RevisitRow] = {
    import snapshots.sparkSession.implicits._
    snapshots
      .select(col("doc_id"), col("run").cast("long").as("run"),
        concat(lit("https://site"), (col("doc_id") % 7).cast("string"),
          lit(".example.com/doc"), col("doc_id").cast("string"))
          .as("target_uri"),
        concat(lit("2024-02-0"), (col("run") + 1).cast("string"),
          lit("T00:00:00Z")).as("capture_ts"),
        md5(col("snap_text")).as("digest"),
        length(col("snap_text")).cast("long").as("len"))
      .as[Cap]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[UriState, RevisitRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Cap],
            state: GroupState[UriState]) =>
          var first = state.getOption.map(_.firstDigest)
          val out = rows.toIndexedSeq.sortBy(_.run).map { c =>
            val isRevisit = c.run > 0 && first.contains(c.digest)
            if (first.isEmpty) first = Some(c.digest)
            RevisitRow(c.doc_id, c.run, c.target_uri, c.capture_ts,
              c.digest,
              if (isRevisit) "revisit" else "response",
              if (isRevisit) c.len else 0L)
          }
          first.foreach(d => state.update(UriState(d)))
          out.iterator
      }
  }
}
