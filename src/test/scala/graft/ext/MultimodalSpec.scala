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
