package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import Multimodal._

  test("extractFeatures: typed mapPartitions pipeline produces deterministic features") {
    import spark.implicits._
    val media = Seq(
      MediaFile(1L, "image", "hello world".getBytes("UTF-8"), Map("k" -> "v")),
      MediaFile(2L, "video", ("frame" * 100).getBytes("UTF-8"), Map.empty))
      .toDS()
    val got = extractFeatures(media).collect().sortBy(_.media_id)
    assert(got.length === 2)
    assert(got(0).n_bytes === 11L)
    assert(got(0).sha ===
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9") // sha256("hello world")
    assert(got(0).width >= 1 && got(0).height >= 1)
    assert(got(0).n_frames === 1)          // non-video
    assert(got(1).n_frames === (500 % 300) + 1) // video: derived from length
    assert(got(0).feature.length === 8)
    // determinism: run again, same results
    val again = extractFeatures(media).collect().sortBy(_.media_id)
    assert(again.map(_.sha).toSeq === got.map(_.sha).toSeq)
  }

  // Minimal container fixtures built from the published header layouts.
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    sig ++ ihdr
  }
  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++
      Array((w & 0xff).toByte, (w >> 8).toByte, (h & 0xff).toByte, (h >> 8).toByte,
        0.toByte, 0.toByte)
  private def jpegBytes(w: Int, h: Int): Array[Byte] =
    Array(0xff, 0xd8,                         // SOI
      0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46,    // APP0, len 4
      0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte) ++ // SOF0, len 17, precision
      be16(h) ++ be16(w) ++ Array.fill(12)(0.toByte)
  private def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16(v: Int) = Array((v >> 8).toByte, v.toByte)

  test("imageDimensions parses real PNG/JPEG/GIF headers and rejects opaque bytes") {
    assert(MediaCodecs.imageDimensions(pngBytes(640, 480)) === Some((640, 480)))
    assert(MediaCodecs.imageDimensions(gifBytes(320, 200)) === Some((320, 200)))
    assert(MediaCodecs.imageDimensions(jpegBytes(1024, 768)) === Some((1024, 768)))
    assert(MediaCodecs.imageDimensions("not an image at all".getBytes("UTF-8")) === None)
    assert(MediaCodecs.imageDimensions(pngBytes(640, 480).take(20)) === None) // truncated
    assert(MediaCodecs.imageDimensions(Array[Byte](0xff.toByte, 0xd8.toByte)) === None)
  }

  test("extractFeatures surfaces header-parsed dimensions for container payloads") {
    import spark.implicits._
    val media = Seq(
      MediaFile(1L, "image", pngBytes(800, 600), Map.empty),
      MediaFile(2L, "image", jpegBytes(120, 90), Map.empty),
      MediaFile(3L, "image", "opaque payload".getBytes("UTF-8"), Map.empty))
      .toDS()
    val got = extractFeatures(media).collect().sortBy(_.media_id)
    assert((got(0).width, got(0).height) === (800, 600))
    assert((got(1).width, got(1).height) === (120, 90))
    // opaque payload: deterministic CRC-derived fallback, still in range
    assert(got(2).width >= 1 && got(2).width <= 1920)
    assert(got(2).height >= 1 && got(2).height <= 1080)
  }

  test("sampleFrames: every stride-th block, correct sizes and count") {
    import spark.implicits._
    val payload = ("x" * 100)
    val df = Seq((1L, payload)).toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("content"))
    val frames = sampleFrames(df, "content", "media_id", blockBytes = 32, stride = 2)
      .select(col("media_id"), col("frame_no"), length(col("frame_bytes")).as("len"))
      .orderBy("frame_no")
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    // 100 bytes => blocks 0..3 (4 blocks), stride 2 => blocks 0 and 2
    assert(frames.toSeq === Seq((0, 32), (1, 32)))
  }

  test("mediaFromDocuments maps the documents table into the typed schema") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = mediaFromDocuments(spark, docs).collect()
    assert(media.length === 500)
    assert(media.forall(m => Set("image", "audio", "video").contains(m.kind)))
    assert(media.forall(_.meta.contains("source")))
    val m0 = media.find(_.media_id == 0L).get
    assert(m0.kind === "image")
  }
}
