package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q255 WebVTT parse (timestamp inversion, multi-line
  * text join, block order) and the q256 alignment semantics (in-cue
  * frames captioned, gap frames kept as NULL rows). */
class SubtitlesSpec extends AnyFunSuite with SparkSessionSpec {

  test("q255: cues parse in order, timestamps invert the writer's " +
      "arithmetic exactly, multi-line text joins with a space") {
    import spark.implicits._
    // doc 7: 2 + 7%4 = 5 cues, gap 1000 + (7%5)*100 = 1200 ms,
    // dur_i = 600 + ((7+i)%5)*100
    val rows = Subtitles.vttCues(Seq((7L, "x")).toDF("doc_id", "text"))
      .collect().sortBy(_.getAs[Long]("cue_idx"))
    assert(rows.length == 5)
    for ((r, i) <- rows.zipWithIndex) {
      assert(r.getAs[Long]("cue_idx") == i.toLong)
      assert(r.getAs[Long]("t_start_ms") == i * 1200L)
      assert(r.getAs[Long]("t_end_ms") ==
        i * 1200L + 600L + ((7 + i) % 5) * 100L)
      assert(r.getAs[String]("text") ==
        s"cue $i line one doc 7 line two")
    }
  }

  test("q255: the fixture is real WebVTT — header block, blank-line " +
      "separation, HH:MM:SS.mmm --> HH:MM:SS.mmm timing lines") {
    import spark.implicits._
    val vtt = Seq((3661L, "x")).toDF("doc_id", "text")
      .select(Subtitles.vttFixtureCol(col("doc_id"))).head().getString(0)
    assert(vtt.startsWith("WEBVTT\n\n"))
    // doc 3661: gap 1000 + (3661%5)*100 = 1100; cue 1 starts 1100 ms
    assert(vtt.contains("00:00:01.100 --> "))
    val blocks = vtt.split("\n\n")
    assert(blocks.head == "WEBVTT")
    assert(blocks.length == 1 + (2 + 3661 % 4).toInt)
    assert(blocks(1).split("\n")(1)
      .matches("\\d{2}:\\d{2}:\\d{2}\\.\\d{3} --> " +
        "\\d{2}:\\d{2}:\\d{2}\\.\\d{3}"))
  }

  test("q256: a frame inside a cue carries its caption; a frame in " +
      "a silence gap is a NULL-caption row, never dropped") {
    import spark.implicits._
    // doc 4: 2 + 4%5 = 6 frames at 0,700,…,3500; 2 + 4%4 = 2 cues
    // at gap 1400: cue0 [0,1000), cue1 [1400,2000) -> frames 0,700
    // in cue0; 1400 in cue1; 2100, 2800, 3500 in silence
    val rows = Subtitles.frameCueAlign(
        Seq((4L, "x")).toDF("doc_id", "text"))
      .collect().sortBy(_.getAs[Long]("frame_idx"))
    assert(rows.length == 6)
    def cue(i: Int): Any = rows(i).get(rows(i).fieldIndex("cue_idx"))
    assert(cue(0) == 0L) // 0 ms in cue0 [0,1000)
    assert(cue(1) == 0L) // 700 in cue0
    assert(cue(2) == 1L) // 1400 is cue1's inclusive start
    assert(cue(3) == null) // 2100 past cue1's exclusive end
    assert(cue(4) == null && cue(5) == null)
    assert(rows(2).getAs[Long]("frame_ms") == 1400L)
    assert(rows.count(_.getAs[Boolean]("aligned")) ==
      rows.count(r => r.get(r.fieldIndex("cue_idx")) != null))
    for (r <- rows if r.getAs[Boolean]("aligned"))
      assert(r.getAs[String]("caption")
        .startsWith(s"cue ${r.getAs[Long]("cue_idx")} "))
  }

  test("the q255 plan is row-local; q256's join is an equi-join on " +
      "doc_id (containment is a residual), no cartesian anywhere") {
    import spark.implicits._
    val docs = Seq((1L, "t")).toDF("doc_id", "text")
    val p255 = Subtitles.vttCues(docs)
      .queryExecution.executedPlan.toString
    assert(!p255.contains("Exchange"), s"q255 must not shuffle:\n$p255")
    val p256 = Subtitles.frameCueAlign(docs)
      .queryExecution.executedPlan.toString
    assert(!p256.toLowerCase.contains("cartesian"),
      s"q256 must not plan a cartesian product:\n$p256")
  }
}
