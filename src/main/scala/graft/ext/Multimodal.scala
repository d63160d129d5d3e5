package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed partition-wise.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape — and so is the CONTAINER-LEVEL decode: [[MediaCodecs.decode]]
  * parses real image dimensions from PNG / JPEG / GIF headers with a
  * pure-JVM magic-byte scan (the published container layouts; no codec
  * library needed). Only pixel-level work (resize, frame raster decode,
  * embedding extraction) is beyond this environment — a production
  * deployment adds its codec inside the same `mapPartitions` seam: one
  * codec context per partition, rows streamed through it, never a per-row
  * library init and never a driver-side collect.
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

  object MediaCodecs {

    /** Pure-JVM image-dimension parse from container headers — public
      * format layouts, no codec dependency:
      *
      *   - PNG: 8-byte signature, then the IHDR chunk (always first):
      *     big-endian u32 width at offset 16, height at 20.
      *   - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor:
      *     little-endian u16 width at offset 6, height at 8.
      *   - JPEG: SOI marker then a segment walk to the first frame header
      *     SOFn (0xC0–0xCF except the non-frame C4/C8/CC): big-endian u16
      *     height at segment offset 5, width at 7.
      *
      * Returns None for payloads that are not one of the three containers
      * (or are truncated before their header fields). */
    def imageDimensions(b: Array[Byte]): Option[(Int, Int)] = {
      def u8(i: Int): Int = b(i) & 0xff
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      val isPng = b.length >= 24 &&
        u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'
      val isGif = b.length >= 10 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a'
      if (isPng) Some((be32(16), be32(20)))
      else if (isGif) Some((le16(6), le16(8)))
      else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG segment walk: 0xFF <marker> [u16 length payload...], where
        // RSTn/TEM (standalone) carry no length field.
        var i = 2
        while (i + 3 < b.length && u8(i) == 0xff) {
          val marker = u8(i + 1)
          if (marker == 0xff) i += 1 // fill byte before a marker
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
          else {
            val len = be16(i + 2)
            if (len < 2) return None // corrupt length
            val isSof = marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc
            if (isSof)
              return if (i + 9 <= b.length && len >= 7)
                Some((be16(i + 7), be16(i + 5)))
              else None
            i += 2 + len
          }
        }
        None
      } else None
    }

    /** Container-aware decoder: real header-parsed dimensions for PNG /
      * JPEG / GIF payloads; for opaque payloads (no recognized container) a
      * DOCUMENTED deterministic fallback derived from the content CRC — the
      * seam where a production codec decodes pixels. The signature, batch
      * shape, and determinism contract are what the pipeline tests pin. */
    def decode(f: MediaFile): MediaFeatures = {
      val n = f.content.length
      val crc = new java.util.zip.CRC32
      crc.update(f.content)
      val h = crc.getValue
      val dims = imageDimensions(f.content)
      MediaFeatures(
        media_id = f.media_id,
        kind = f.kind,
        n_bytes = n.toLong,
        sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(f.content).map("%02x".format(_)).mkString,
        width = dims.map(_._1).getOrElse((h % 1920).toInt + 1),
        height = dims.map(_._2).getOrElse(((h / 1920) % 1080).toInt + 1),
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
      it.map(MediaCodecs.decode)
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
