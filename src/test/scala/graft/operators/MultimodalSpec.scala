package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  import Multimodal._

  private def png(n: Int): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G') ++
      Array.tabulate[Byte](n)(i => (i % 251).toByte)
  private def jpeg(n: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      Array.tabulate[Byte](n)(i => (i % 17).toByte)
  private def wav(n: Int): Array[Byte] =
    "RIFF".getBytes ++ Array.fill[Byte](n)(42)

  private lazy val media = Seq(
    MediaRecord(1L, "image", png(1000)),
    MediaRecord(2L, "image", jpeg(500)),
    MediaRecord(3L, "audio", wav(2000)),
    MediaRecord(4L, "video", Array.fill[Byte](4096)(7))
  ).toDS().repartition(2)

  test("mime sniffing identifies media containers from magic bytes") {
    assert(sniffMime(png(10)) == "image/png")
    assert(sniffMime(jpeg(10)) == "image/jpeg")
    assert(sniffMime(wav(10)) == "audio/wav")
    assert(sniffMime(Array[Byte](1, 2)) == "application/octet-stream")
  }

  test("feature extraction: schema, dims, determinism, partition preservation") {
    val feats = extractFeatures(media)
    assert(feats.rdd.getNumPartitions == 2) // mapPartitions keeps layout
    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.length == 4)
    rows.foreach { f =>
      assert(f.features.length == FeatureDim)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3) // normalized histogram
    }
    assert(rows(0).mime == "image/png" && rows(0).n_bytes == 1004)
    // deterministic: same input -> identical features
    val again = extractFeatures(media).collect().sortBy(_.media_id)
    assert(rows.zip(again).forall { case (a, b) =>
      a.features.sameElements(b.features) })
  }

  test("frame sampling keeps every stride-th fixed-size chunk") {
    val vid = Seq(MediaRecord(9L, "video", Array.fill[Byte](1000)(1))).toDS()
    val frames = sampleFrames(vid, frameBytes = 100, stride = 3).collect()
    // chunks 0..9, keep 0,3,6,9
    assert(frames.map(_.getAs[Int]("frame_index")).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[Int]("frame_bytes") == 100))
  }

  test("resize stub shrinks payloads, preserves mime header, stays typed") {
    val resized = resize(media, stride = 4).collect().sortBy(_.media_id)
    val orig = media.collect().sortBy(_.media_id)
    resized.zip(orig).foreach { case (r, o) =>
      assert(sniffMime(r.payload) == sniffMime(o.payload)) // header kept
      assert(r.payload.length < o.payload.length)
      assert(r.payload.length == 4 + (o.payload.length - 4 + 3) / 4)
    }
  }

  test("multimodalMeta: hand-computed frame sampling over derived media") {
    val docs = Seq(
      (4L, "hello"),          // sel 0: png header (4B) -> 9 bytes, 1 frame
      (1L, "x" * 70)          // sel 1: jpeg header (3B) -> 73 bytes, 3 frames
    ).toDF("doc_id", "text")
    val rows = Multimodal.multimodalMeta(docs).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    val png = rows(4L)
    assert(png.getAs[String]("mime") == "image/png")
    assert(png.getAs[String]("kind") == "image")
    assert(png.getAs[Long]("n_bytes") == 9L)
    assert(png.getAs[Long]("n_frames_sampled") == 1L) // only chunk 0
    assert(png.getAs[Long]("sampled_bytes") == 9L)
    val jpg = rows(1L)
    assert(jpg.getAs[String]("mime") == "image/jpeg")
    assert(jpg.getAs[Long]("n_bytes") == 73L)
    // chunks of 32: [32, 32, 9]; stride 2 keeps 0 and 2 -> 32 + 9
    assert(jpg.getAs[Long]("n_frames_sampled") == 2L)
    assert(jpg.getAs[Long]("sampled_bytes") == 41L)
  }

  test("metadata projection reads lengths without decoding") {
    val meta = metadata(media.toDF()).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("n_bytes")).toMap
    assert(meta(3L) == 2004L && meta(4L) == 4096L)
  }
}
