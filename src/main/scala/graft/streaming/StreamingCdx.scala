package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDX indexer (q271) — the incremental twin of the batch
  * q251 index: a crawler appends records to its current .warc file
  * and the capture index must grow with it, each record's offset
  * being the bytes already written to THAT file. The row-local
  * parse/urlkey/timestamp half is the SAME code as batch
  * ([[graft.operators.Warc.cdxProjected]] — streaming-safe, no
  * window); only the offset assignment differs: per-file state
  * carries the byte count, and every record emits immediately (no
  * open-row holdback — an offset is final the moment the record
  * lands, unlike the q156/q260 hour aggregates).
  *
  * Parity contract (spec- and oracle-pinned): with per-file arrival
  * in record order (the physical truth of an appended .warc), the
  * streamed rows equal the batch q251 index EXACTLY — same rows,
  * same offsets — because the state fold and the batch window
  * prefix-sum add the same lengths in the same order.
  *
  * Scale design (100 TB): state is ONE long per open .warc file
  * (files-in-flight bounded by the crawl's writer count), keyed by
  * file so offset assignment shards with the files. */
object StreamingCdx {

  final case class CdxIn(doc_id: Long, urlkey: String, ts14: String,
      original: String, mime: String, status: Long, digest: String,
      record_len: Long, warc_file: String)

  final case class CdxRow(doc_id: Long, urlkey: String, ts14: String,
      original: String, mime: String, status: Long, digest: String,
      record_len: Long, warc_file: String, offset: Long)

  final case class FileState(bytes: Long)

  /** records: streaming (doc_id, warc) frame, per-file record-order
    * arrival across batches. */
  def index(records: DataFrame): Dataset[CdxRow] = {
    import records.sparkSession.implicits._
    graft.operators.Warc.cdxProjected(records)
      .as[CdxIn]
      .groupByKey(_.warc_file)
      .flatMapGroupsWithState[FileState, CdxRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[CdxIn],
            state: GroupState[FileState]) =>
          var bytes = state.getOption.map(_.bytes).getOrElse(0L)
          val out = rows.toIndexedSeq.sortBy(_.doc_id).map { r =>
            val row = CdxRow(r.doc_id, r.urlkey, r.ts14, r.original,
              r.mime, r.status, r.digest, r.record_len, r.warc_file,
              bytes)
            bytes += r.record_len
            row
          }
          state.update(FileState(bytes))
          out.iterator
      }
  }
}
