package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WebVTT cue parsing (q255) + video-frame ↔ cue alignment (q256) —
  * the multimodal-text pairing stage of a video training pipeline:
  * q81 extracts frames from the container, and a caption track is
  * what turns them into (image, text) training pairs. Reference N/A
  * (no media in the taxi stream) — LLM-pipeline operators like
  * q21/q81.
  *
  * The PARSED SUBSET of WebVTT, stated precisely: a `WEBVTT` header
  * block, then blank-line-separated cue blocks of the form
  * `identifier \n HH:MM:SS.mmm --> HH:MM:SS.mmm \n text-lines…`;
  * cue settings after the timing (`position:…`), NOTE/STYLE blocks,
  * and `<v>` voice tags are out of the stated subset (the fixture
  * carries none). Timestamps invert by real arithmetic (h·3 600 000
  * + m·60 000 + s·1 000 + ms), so a wrong field weight shifts every
  * graded start/end. Multi-line cue text joins with a single space
  * (stated).
  *
  * The graded fixture is SYNTHESIZED per doc_id: 2 + d%4 sequential
  * cues at a per-doc cadence ([[cueStartMs]]/[[cueDurMs]] — spacing
  * 1000–1400 ms, duration 600–1000 ms, so real silence GAPS exist
  * between cues), each cue two text lines.
  *
  * Alignment (q256): the doc's video frames (one every
  * [[FrameStepMs]] ms, frame count = the q81 arithmetic 2 + d%5)
  * LEFT-join the cues on containment (cue_start ≤ frame_ms <
  * cue_end): in-cue frames carry their caption, gap frames carry
  * NULL — the unaligned remainder a pairing pipeline must count,
  * not drop silently.
  *
  * Scale design (100 TB): q255 is row-local (split + posexplode —
  * a subtitle file never crosses an exchange). q256's join is an
  * EQUI-join on doc_id with the containment as a residual filter —
  * co-partitioned video-local work, never a cross-video
  * range join; both sides are the same corpus partitioned the same
  * way, and cues-per-video is bounded by the media duration. */
object Subtitles {

  /** Frame cadence of the q256 alignment, ms. */
  val FrameStepMs = 700L

  /** Cue start of cue i for doc d: sequential at a per-doc gap. */
  private def cueStartMs(d: Column, i: Column): Column =
    i * (lit(1000L) + (d % 5) * 100L)

  /** Cue duration of cue i for doc d (≤ the minimum gap, so cues
    * never overlap and gaps occur whenever dur < gap). */
  private def cueDurMs(d: Column, i: Column): Column =
    lit(600L) + ((d + i) % 5) * 100L

  /** HH:MM:SS.mmm from a millisecond Column (integer arithmetic). */
  private def vttTs(ms: Column): Column =
    concat(
      lpad((ms / 3600000L).cast("long").cast("string"), 2, "0"),
      lit(":"),
      lpad((ms % 3600000L / 60000L).cast("long").cast("string"), 2,
        "0"),
      lit(":"),
      lpad((ms % 60000L / 1000L).cast("long").cast("string"), 2, "0"),
      lit("."),
      lpad((ms % 1000L).cast("string"), 3, "0"))

  /** The complete synthesized WebVTT document for a doc_id. */
  def vttFixtureCol(d: Column): Column = {
    val blocks = transform(
      sequence(lit(0L), lit(1L) + d % 4),
      i => {
        val s = cueStartMs(d, i)
        val e = s + cueDurMs(d, i)
        concat(i.cast("string"), lit("\n"),
          vttTs(s), lit(" --> "), vttTs(e), lit("\n"),
          lit("cue "), i.cast("string"), lit(" line one\n"),
          lit("doc "), d.cast("string"), lit(" line two"))
      })
    concat(lit("WEBVTT"),
      array_join(transform(blocks, b => concat(lit("\n\n"), b)), ""))
  }

  /** Parse one timing-line timestamp (group-indexed) back to ms. */
  private def parseTs(line: Column, base: Int): Column = {
    val pat =
      "^([0-9]{2}):([0-9]{2}):([0-9]{2})\\.([0-9]{3}) --> " +
        "([0-9]{2}):([0-9]{2}):([0-9]{2})\\.([0-9]{3})$"
    regexp_extract(line, pat, base).cast("long") * 3600000L +
      regexp_extract(line, pat, base + 1).cast("long") * 60000L +
      regexp_extract(line, pat, base + 2).cast("long") * 1000L +
      regexp_extract(line, pat, base + 3).cast("long")
  }

  /** q255: documents → synthesized WebVTT → one row per cue:
    * (doc_id, cue_idx, t_start_ms, t_end_ms, text). */
  def vttCues(docs: DataFrame): DataFrame = {
    val withVtt = docs.select(col("doc_id"),
      vttFixtureCol(col("doc_id")).as("vtt"))
    withVtt
      .select(col("doc_id"),
        posexplode(slice(split(col("vtt"), "\n\n"), 2, 1000000))
          .as(Seq("cue_idx", "block")))
      .select(col("doc_id"), col("cue_idx").cast("long").as("cue_idx"),
        split(col("block"), "\n").as("lines"))
      .select(col("doc_id"), col("cue_idx"),
        parseTs(element_at(col("lines"), 2), 1).as("t_start_ms"),
        parseTs(element_at(col("lines"), 2), 5).as("t_end_ms"),
        array_join(slice(col("lines"), 3, 1000000), " ").as("text"))
  }

  /** q256: the doc's frame clock LEFT-joined to its cues on
    * containment: (doc_id, frame_idx, frame_ms, cue_idx, caption,
    * aligned). */
  def frameCueAlign(docs: DataFrame): DataFrame = {
    val frames = docs.select(col("doc_id"),
        posexplode(sequence(lit(0L), lit(1L) + col("doc_id") % 5))
          .as(Seq("frame_idx", "f")))
      .select(col("doc_id"), col("frame_idx").cast("long")
          .as("frame_idx"),
        (col("f") * FrameStepMs).as("frame_ms"))
    val cues = vttCues(docs)
    frames
      .join(cues,
        frames("doc_id") === cues("doc_id") &&
          col("frame_ms") >= col("t_start_ms") &&
          col("frame_ms") < col("t_end_ms"),
        "left")
      .select(frames("doc_id"), col("frame_idx"), col("frame_ms"),
        col("cue_idx"), col("text").as("caption"),
        col("cue_idx").isNotNull.as("aligned"))
  }
}
