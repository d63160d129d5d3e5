package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed partition-wise.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape — while the actual codec work is STUBBED behind
  * [[MediaCodecs.decodeStub]] (this environment has no image/audio
  * libraries). A production deployment swaps the stub for a real decoder
  * inside the same `mapPartitions` seam: one codec context per partition,
  * rows streamed through it, never a per-row library init and never a
  * driver-side collect.
  */
object Multimodal {

  /** One media object: opaque bytes + typed metadata. */
  case class MediaFile(
      media_id: Long,
      kind: String,              // image | audio | video
      content: Array[Byte],
      meta: Map[String, String])

  /** Extracted features (fake-decoded; real pipeline fills the same shape). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** STUB decoder: deterministic fake measurements derived from the bytes.
    * A real implementation decodes with an image/audio codec here; the
    * function signature, batch shape, and determinism contract stay. */
  object MediaCodecs {
    def decodeStub(f: MediaFile): MediaFeatures = {
      val n = f.content.length
      val crc = new java.util.zip.CRC32
      crc.update(f.content)
      val h = crc.getValue
      MediaFeatures(
        media_id = f.media_id,
        kind = f.kind,
        n_bytes = n.toLong,
        sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(f.content).map("%02x".format(_)).mkString,
        width = (h % 1920).toInt + 1,
        height = ((h / 1920) % 1080).toInt + 1,
        n_frames = if (f.kind == "video") (n % 300) + 1 else 1,
        feature = f.content.take(8).map(b => (b & 0xff) / 255.0f))
    }
  }

  /** Partition-wise feature extraction over a typed media Dataset. Codec
    * init happens once per partition (the `it =>` closure), not per row. */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec context would be created here
      it.map(MediaCodecs.decodeStub)
    }
  }

  /** Deterministic "frame sampling": every `stride`-th fixed-size block of
    * the payload, as (media_id, frame_no, frame_bytes) rows — the shape a
    * video pipeline fans out to per-frame feature extraction. Pure column
    * expressions; no UDF.
    *
    * Block indexing follows the column type: BINARY content slices
    * `blockBytes` BYTES (the real media path); STRING content slices
    * CHARACTERS — which is what the oracle-checked catalog queries use,
    * because DuckDB has no blob md5/substr, so only character blocks are
    * cross-engine comparable on non-ASCII text. */
  def sampleFrames(df: DataFrame, contentCol: String, idCol: String,
                   blockBytes: Int, stride: Int): DataFrame = {
    val nBlocks = ceil(length(col(contentCol)).cast("double") / blockBytes).cast("int")
    df.select(
        col(idCol),
        posexplode(transform(
          sequence(lit(0), greatest(nBlocks - 1, lit(0)), lit(stride)),
          i => col(contentCol).substr((i * blockBytes + 1).cast("int"), lit(blockBytes)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_bytes")
  }

  /** Build a typed media Dataset from the documents table (text bytes stand
    * in for the opaque payload — the plumbing under test is schema/batching,
    * not the codec). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))
      .as[MediaFile]
  }
}
