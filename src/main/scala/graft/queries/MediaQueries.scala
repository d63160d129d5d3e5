package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Curation, Dedup, Export, Ivf, Multimodal, Pack, Retrieval, Similarity, TextAnalysis}

/** Multimodal catalog entries: image/audio/video codecs, perceptual hashes, frame sampling, container header info.
  *
  * Split from the original monolithic ExtQueries catalog — entries
  * verbatim; shared frames and helpers live in [[ExtShared]]. */
object MediaQueries {
  import ExtShared._

  val defs: Seq[QueryDef] = Seq(

    // x31 — media near-dup via frame-fingerprint Jaccard: two media match
    // when their sampled-block md5 sets overlap above the threshold — the
    // binary-content analog of shingle dedup (catches payloads sharing a
    // long common prefix, e.g. re-encodes with appended metadata).
    QueryDef("x31_media_near_dup",
      (s, d) => {
        val media = Tables.documents(s, d).select(
          col("doc_id").as("media_id"), col("text").as("content"))
        // set size rides inside the postings structs (the Dedup.scala
        // pattern): a sizes join-back or self-join would re-evaluate the
        // whole frame-hash subtree per branch
        val fr = Multimodal.sampleFrames(media, "content", "media_id",
            blockBytes = 32, stride = 2)
          .select(col("media_id"), md5(col("frame_bytes")).as("fh"))
          .distinct()
          .withColumn("n", count(lit(1))
            .over(Window.partitionBy(col("media_id"))))
        val pairs = fr
          .groupBy(col("fh"))
          .agg(sort_array(collect_set(struct(col("media_id"), col("n")))).as("ids"))
          .filter(size(col("ids")) > 1)
          .select(explode(graft.ext.ArrayPairs.orderedPairs(col("ids")) { (a, b) =>
            struct(a.getField("media_id").as("ia"), a.getField("n").as("na"),
              b.getField("media_id").as("ib"), b.getField("n").as("nb"))
          }).as("p"))
          .groupBy(col("p.ia").as("ia"), col("p.na").as("na"),
            col("p.ib").as("ib"), col("p.nb").as("nb"))
          .agg(count(lit(1)).as("inter"))
        pairs
          .withColumn("jacc",
            col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .filter(col("jacc") >= 0.2)
          .select(col("ia"), col("ib"), (floor(col("jacc") * 10000.0 + 0.5) / 10000.0).as("jacc"))
          .orderBy("ia", "ib")
      },
      Some("""WITH d AS (SELECT doc_id AS media_id, text,
                     greatest(CAST(ceil(length(text) / 32.0) AS BIGINT) - 1, 0) AS e
                   FROM documents),
                 l AS (SELECT media_id,
                     list_distinct(list_transform(range(0, e + 1, 2),
                       i -> md5(substr(text, CAST(i * 32 + 1 AS BIGINT), 32)))) AS fr
                   FROM d),
                 f AS (SELECT media_id, unnest(fr) AS fh FROM l),
                 z AS (SELECT media_id, len(fr) AS n FROM l),
                 p AS (SELECT a.media_id AS ia, b.media_id AS ib, count(*) AS inter
                       FROM f a JOIN f b ON a.fh = b.fh AND a.media_id < b.media_id
                       GROUP BY 1, 2)
              SELECT ia, ib, floor(CAST(inter AS DOUBLE) / (za.n + zb.n - inter) * 10000.0 + 0.5) / 10000.0 AS jacc
              FROM p JOIN z za ON za.media_id = p.ia JOIN z zb ON zb.media_id = p.ib
              WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.2
              ORDER BY ia, ib""")),

    // x14 — multimodal feature extraction through the typed mapPartitions
    // seam. Schema/bytes/sha are real and oracle-checked; width/height are
    // the header parse and NULL for non-container payloads (document text
    // is never a PNG/JPEG/GIF, so the oracle pins the all-null contract —
    // "unknown", never a synthetic fake); pixel decode runs for PNG inputs
    // (MultimodalSpec pins exact pixels).
    QueryDef("x14_multimodal_features",
      (s, d) => {
        val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, d))
        Multimodal.extractFeatures(media).toDF()
          .select(col("media_id"), col("kind"), col("n_bytes"), col("sha"),
            col("width"), col("height"), col("sample_rate"), col("duration_ms"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
                     CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                     CAST(strlen(text) AS BIGINT) AS n_bytes,
                     sha256(text) AS sha,
                     CAST(NULL AS INTEGER) AS width,
                     CAST(NULL AS INTEGER) AS height,
                     CAST(NULL AS INTEGER) AS sample_rate,
                     CAST(NULL AS BIGINT) AS duration_ms
              FROM documents ORDER BY media_id""")),

    // x183 — compressed-audio header info through the SAME features row:
    // each doc synthesized as a REAL audio container chosen by doc_id % 3
    // (PCM WAV / Layer III MP3 frame stream / FLAC STREAMINFO — all built
    // by the MediaCodecs writers, all parsed back header-exactly by
    // audioInfo with NO sample decode), surfacing (sample_rate,
    // duration_ms) in the x14 features row. The oracle recomputes both
    // from the synthesis arithmetic WITHOUT ever seeing a container, so
    // the MP3 frame walk and FLAC STREAMINFO unpack are exact-checked.
    QueryDef("x183_audio_info",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              // codepoint length — the pixelDHashShared rationale
              val len = text.codePointCount(0, text.length).toLong
              val content = (id % 3) match {
                case 0 =>
                  Multimodal.MediaCodecs.wavEncode(
                    new Array[Short]((1 + len % 1000).toInt),
                    8000 + (id % 8).toInt * 1000)
                case 1 =>
                  Multimodal.MediaCodecs.mp3Encode((1 + id % 5).toInt)
                case _ =>
                  Multimodal.MediaCodecs.flacEncode(48000, 1 + len * 37 % 100000)
              }
              Multimodal.MediaFile(id, "audio", content, Map.empty)
            }
          }
        Multimodal.extractFeatures(media).toDF()
          .select(col("media_id").as("doc_id"), col("sample_rate"),
            col("duration_ms"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, length(text) AS n
                         FROM documents WHERE length(text) > 0)
              SELECT doc_id,
                     CAST(CASE doc_id % 3
                          WHEN 0 THEN 8000 + (doc_id % 8) * 1000
                          WHEN 1 THEN 44100
                          ELSE 48000 END AS INTEGER) AS sample_rate,
                     CAST(CASE doc_id % 3
                          WHEN 0 THEN ((1 + n % 1000) * 1000)
                                      // (8000 + (doc_id % 8) * 1000)
                          WHEN 1 THEN ((1 + doc_id % 5) * 1152 * 1000) // 44100
                          ELSE ((1 + (n * 37) % 100000) * 1000) // 48000
                          END AS BIGINT) AS duration_ms
              FROM d ORDER BY doc_id""")),

    // x184 — video container info: the x183 discipline on the video axis.
    // Each doc synthesized as a REAL AVI with per-doc dimensions, frame
    // count, and frame rate; videoInfo reads all four fields from the
    // avih MainAVIHeader ALONE (no movi walk, no frame decode — so it is
    // header-exact even for compressed codecs aviFrames refuses), and the
    // features row surfaces them (width/height/n_frames/duration_ms). The
    // oracle recomputes everything from the synthesis arithmetic,
    // including the two chained integer floors in duration (µs-per-frame
    // = 1000000 div fps, then frames × that div 1000).
    QueryDef("x184_video_info",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val w = 3 + (id % 5).toInt
              val h = 2 + (id % 3).toInt
              val nf = 1 + (id % 4).toInt
              val fps = 5 + (id % 6).toInt
              Multimodal.MediaFile(id, "video",
                Multimodal.MediaCodecs.aviEncode(
                  Seq.fill(nf)(Multimodal.Raster(w, h, 1, new Array[Byte](w * h))),
                  fps),
                Map.empty)
            }
          }
        Multimodal.extractFeatures(media).toDF()
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("n_frames"), col("duration_ms"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     CAST(3 + doc_id % 5 AS INTEGER) AS width,
                     CAST(2 + doc_id % 3 AS INTEGER) AS height,
                     CAST(1 + doc_id % 4 AS INTEGER) AS n_frames,
                     CAST((1 + doc_id % 4) * (1000000 // (5 + doc_id % 6))
                          // 1000 AS BIGINT) AS duration_ms
              FROM documents ORDER BY doc_id""")),

    // x188 — MP4/ISO-BMFF header info: the x184 discipline on the
    // container modern crawls actually carry. Each doc synthesized as a
    // REAL header-only MP4 (ftyp + fully nested moov, built by
    // MediaCodecs.mp4Encode) with per-doc dimensions, sample count,
    // timescale, and duration — alternating mvhd version 0/1 by doc_id so
    // BOTH the 32-bit and 64-bit time-field layouts are exercised through
    // the catalog, not just the spec. videoInfo reads everything from the
    // moov box walk alone (tkhd 16.16 dims, stsz sample count, mvhd
    // timescale+duration — no sample decode), and the oracle recomputes
    // all four fields from the synthesis arithmetic, including the
    // floored duration division.
    QueryDef("x188_mp4_info",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              Multimodal.MediaFile(id, "video",
                Multimodal.MediaCodecs.mp4Encode(
                  w = 16 + (id % 9).toInt,
                  h = 9 + (id % 7).toInt,
                  nFrames = 1 + (id % 6).toInt,
                  timescale = 600 * (1 + id % 4).toInt,
                  durationUnits = 500 + (id * 37) % 10000,
                  version = (id % 2).toInt),
                Map.empty)
            }
          }
        Multimodal.extractFeatures(media).toDF()
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("n_frames"), col("duration_ms"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     CAST(16 + doc_id % 9 AS INTEGER) AS width,
                     CAST(9 + doc_id % 7 AS INTEGER) AS height,
                     CAST(1 + doc_id % 6 AS INTEGER) AS n_frames,
                     CAST((500 + (doc_id * 37) % 10000) * 1000
                          // (600 * (1 + doc_id % 4)) AS BIGINT) AS duration_ms
              FROM documents ORDER BY doc_id""")),

    // x15 — deterministic frame sampling: every 2nd 32-CHARACTER block of
    // the payload, fingerprinted. Pure column expressions (no UDF).
    // Character blocks, not bytes: DuckDB's substr is character-indexed and
    // it cannot md5 blobs, so byte blocks would silently diverge on the
    // first non-ASCII document. The byte path stays available on binary
    // columns (unit-tested), just not oracle-checkable.
    QueryDef("x15_frame_sample",
      (s, d) => {
        val media = Tables.documents(s, d).select(
          col("doc_id").as("media_id"), col("text").as("content"))
        Multimodal.sampleFrames(media, "content", "media_id", blockBytes = 32, stride = 2)
          .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
                  md5(col("frame_bytes")).as("frame_md5"))
          .orderBy("media_id", "frame_no")
      },
      Some("""WITH d AS (SELECT doc_id AS media_id, text,
                     greatest(CAST(ceil(length(text) / 32.0) AS BIGINT) - 1, 0) AS e
                   FROM documents),
                 l AS (SELECT media_id,
                     list_transform(range(0, e + 1, 2),
                       i -> md5(substr(text, CAST(i * 32 + 1 AS BIGINT), 32))) AS fr
                   FROM d)
              SELECT media_id, generate_subscripts(fr, 1) - 1 AS frame_no,
                     unnest(fr) AS frame_md5
              FROM l ORDER BY media_id, frame_no""")),

    // x166 — pixel-level perceptual fingerprints: every doc rendered as a
    // REAL 9×8 grayscale PNG and pushed through the full pixel pipeline
    // (pngEncode → pure-JVM pngPixels decode → luma → 64-bit dHash),
    // reported as the hash's 8 row-bytes so the DuckDB oracle — which
    // recomputes the same dHash from char codes WITHOUT ever seeing a
    // PNG — hash-matches: the oracle-checked proof that pixel decode is
    // exact, not a byte-stream proxy. One map-side pass per doc.
    QueryDef("x166_pixel_dhash",
      (s, d) => pixelDHashShared(s, d)
        .filter(col("phash").isNotNull)
        .select(col("media_id").as("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 7), g -> shiftright(phash, 8 * g) & 255L)"))
            .as(Seq("row_no", "bits")))
        .select(col("doc_id"), col("row_no").cast("long").as("row_no"),
          col("bits"))
        .orderBy("doc_id", "row_no"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   g AS (SELECT doc_id, gy.range AS gy, gx.range AS gx,
                           ord(substr(text,
                             CAST(((gy.range * 9 + gx.range) % n) + 1 AS BIGINT),
                             1)) % 256 AS v
                         FROM d, range(0, 8) gy, range(0, 9) gx),
                   p AS (SELECT a.doc_id, a.gy, a.gx,
                           CASE WHEN b.v > a.v THEN 1 << a.gx ELSE 0 END AS bit
                         FROM g a JOIN g b ON a.doc_id = b.doc_id
                           AND a.gy = b.gy AND b.gx = a.gx + 1
                         WHERE a.gx < 8)
              SELECT doc_id, CAST(gy AS BIGINT) AS row_no,
                     CAST(sum(bit) AS BIGINT) AS bits
              FROM p GROUP BY 1, 2 ORDER BY doc_id, row_no""")),

    // x166b — JPEG pixel-exact fingerprints: the x166 contract driven
    // through a REAL LOSSY CODEC — each doc's 9×8 char-code grid rendered
    // as a 72×64 BLOCK-FLAT RGB JPEG (every 8×8 JPEG block one flat
    // value, written by the JDK encoder at quality 1.0), decoded through
    // the PRODUCTION ImageIO bridge (the JDK's Huffman+IDCT, not our PNG
    // path), luma → dHash. Pixel-exactness is engineered, not hoped for:
    // DC-only blocks + all-ones quantization tables + flat chroma make
    // the JPEG round trip lossless for exactly this image class, and
    // dHash's 9×8 box average samples each flat block whole — so the
    // DuckDB oracle recomputes the same hash from char codes having seen
    // neither a JPEG nor the JDK, and a drift ANYWHERE in the bridge
    // (subsampling default, IDCT variant, color conversion) fails the
    // hash row, not a prose claim. Same map-side scale posture as x166.
    QueryDef("x166b_jpeg_dhash",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text"))
          // the fixture table is one parquet file = ONE scan partition,
          // and ~1 ms/doc of per-image JDK codec work on a single task
          // is the whole wall time — spread the encode/decode loop
          // across the executor threads (x166's pure-JVM PNG codec is
          // an order of magnitude cheaper per doc and never needed this)
          .repartition(col("doc_id"))
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              // codepoint indexing — the pixelDHashShared rationale
              val cps = text.codePoints().toArray
              val px = new Array[Byte](72 * 64)
              var gy = 0
              while (gy < 8) {
                var gx = 0
                while (gx < 9) {
                  val v = (cps((gy * 9 + gx) % cps.length) % 256).toByte
                  var y = gy * 8
                  while (y < gy * 8 + 8) {
                    var x = gx * 8
                    while (x < gx * 8 + 8) { px(y * 72 + x) = v; x += 1 }
                    y += 1
                  }
                  gx += 1
                }
                gy += 1
              }
              Multimodal.MediaFile(id, "image",
                Multimodal.MediaCodecs.jpegEncodeGray(72, 64, px), Map.empty)
            }
          }
        Multimodal.perceptualHashes(media)
          .filter(col("phash").isNotNull)
          .select(col("media_id").as("doc_id"),
            posexplode(expr(
              "transform(sequence(0, 7), g -> shiftright(phash, 8 * g) & 255L)"))
              .as(Seq("row_no", "bits")))
          .select(col("doc_id"), col("row_no").cast("long").as("row_no"),
            col("bits"))
          .orderBy("doc_id", "row_no")
      },
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   g AS (SELECT doc_id, gy.range AS gy, gx.range AS gx,
                           ord(substr(text,
                             CAST(((gy.range * 9 + gx.range) % n) + 1 AS BIGINT),
                             1)) % 256 AS v
                         FROM d, range(0, 8) gy, range(0, 9) gx),
                   p AS (SELECT a.doc_id, a.gy, a.gx,
                           CASE WHEN b.v > a.v THEN 1 << a.gx ELSE 0 END AS bit
                         FROM g a JOIN g b ON a.doc_id = b.doc_id
                           AND a.gy = b.gy AND b.gx = a.gx + 1
                         WHERE a.gx < 8)
              SELECT doc_id, CAST(gy AS BIGINT) AS row_no,
                     CAST(sum(bit) AS BIGINT) AS bits
              FROM p GROUP BY 1, 2 ORDER BY doc_id, row_no""")),

    // x167 — pixel near-dup pairs: banded Hamming pairing over the x166
    // dHashes through the SAME 4×16-bit machinery as text SimHash (x111)
    // — complete for hamming ≤ 3 by pigeonhole, bucket-capped, one
    // bit_count(xor) per candidate. The oracle brute-forces hamming from
    // its independently-computed row-bytes, so the banded pair set is
    // EXACT-checked, not gated: re-encoded payloads pair only via pixels,
    // which the x31 compressed-byte fingerprints cannot do.
    QueryDef("x167_phash_hamming_pairs",
      (s, d) => Dedup.hammingNearDupPairsOf(
          pixelDHashShared(s, d).filter(col("phash").isNotNull),
          "phash", hMax = 3, idCol = "media_id")
        .orderBy("ia", "ib"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   g AS (SELECT doc_id, gy.range AS gy, gx.range AS gx,
                           ord(substr(text,
                             CAST(((gy.range * 9 + gx.range) % n) + 1 AS BIGINT),
                             1)) % 256 AS v
                         FROM d, range(0, 8) gy, range(0, 9) gx),
                   byts AS (SELECT a.doc_id, a.gy AS row_no,
                              CAST(sum(CASE WHEN b.v > a.v THEN 1 << a.gx
                                       ELSE 0 END) AS BIGINT) AS bits
                            FROM g a JOIN g b ON a.doc_id = b.doc_id
                              AND a.gy = b.gy AND b.gx = a.gx + 1
                            WHERE a.gx < 8 GROUP BY 1, 2),
                   h AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                           CAST(sum(bit_count(xor(a.bits, b.bits))) AS BIGINT)
                             AS ham
                         FROM byts a JOIN byts b
                           ON a.row_no = b.row_no AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
              SELECT ia, ib, ham FROM h WHERE ham <= 3 ORDER BY ia, ib""")),

    // x181 — video frame fingerprints: every doc rendered as a REAL
    // 2-frame uncompressed AVI and pushed through the full video pipeline
    // (aviEncode mux → pure-JVM aviFrames demux → per-frame luma →
    // 64-bit dHash), reported as each frame hash's 8 row-bytes so the
    // DuckDB oracle — which recomputes the same per-frame dHash from char
    // codes WITHOUT ever seeing an AVI — hash-matches: the oracle-checked
    // proof that container demux + frame raster decode are pixel-exact.
    // One map-side pass per doc; frames enumerate inside the partition.
    QueryDef("x181_video_frame_dhash",
      (s, d) => videoDHashShared(s, d)
        .select(col("media_id").as("doc_id"), col("frame_no"),
          posexplode(expr(
            "transform(sequence(0, 7), g -> shiftright(phash, 8 * g) & 255L)"))
            .as(Seq("row_no", "bits")))
        .select(col("doc_id"), col("frame_no"),
          col("row_no").cast("long").as("row_no"), col("bits"))
        .orderBy("doc_id", "frame_no", "row_no"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   g AS (SELECT doc_id, f.range AS f, gy.range AS gy,
                           gx.range AS gx,
                           ord(substr(text,
                             CAST(((f.range * 72 + gy.range * 9 + gx.range)
                                   % n) + 1 AS BIGINT),
                             1)) % 256 AS v
                         FROM d, range(0, 2) f, range(0, 8) gy, range(0, 9) gx),
                   p AS (SELECT a.doc_id, a.f, a.gy, a.gx,
                           CASE WHEN b.v > a.v THEN 1 << a.gx ELSE 0 END AS bit
                         FROM g a JOIN g b ON a.doc_id = b.doc_id
                           AND a.f = b.f AND a.gy = b.gy AND b.gx = a.gx + 1
                         WHERE a.gx < 8)
              SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
                     CAST(gy AS BIGINT) AS row_no,
                     CAST(sum(bit) AS BIGINT) AS bits
              FROM p GROUP BY 1, 2, 3 ORDER BY doc_id, frame_no, row_no""")),

    // x182 — video near-dup pairs on PIXELS: videos pair when the TOTAL
    // Hamming distance over their aligned frame dHashes is ≤ 3 (the x167
    // contract summed across frames). Mining rides the same 4×16-bit band
    // machinery: total ≤ 3 implies frame-0 hamming ≤ 3, so banding
    // frame 0 at hMax=3 is COMPLETE by pigeonhole; candidates then verify
    // the exact total with one bit_count per remaining frame. The oracle
    // brute-forces the total from its independently-computed row-bytes,
    // so the banded pair set is EXACT-checked — re-muxed payloads pair
    // only via pixels, which x31's compressed-byte blocks cannot do.
    QueryDef("x182_video_near_dup",
      (s, d) => {
        val vh = videoDHashShared(s, d)
        val f0 = vh.filter(col("frame_no") === 0L)
          .select(col("media_id"), col("phash"))
        val f1 = vh.filter(col("frame_no") === 1L)
          .select(col("media_id"), col("phash").as("h1"))
        Dedup.hammingNearDupPairsOf(f0, "phash", hMax = 3, idCol = "media_id")
          .join(f1.select(col("media_id").as("ia"), col("h1").as("h1a")), "ia")
          .join(f1.select(col("media_id").as("ib"), col("h1").as("h1b")), "ib")
          .select(col("ia"), col("ib"),
            (col("ham") + expr("CAST(bit_count(h1a ^ h1b) AS BIGINT)"))
              .as("ham"))
          .filter(col("ham") <= 3)
          .orderBy("ia", "ib")
      },
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   g AS (SELECT doc_id, f.range AS f, gy.range AS gy,
                           gx.range AS gx,
                           ord(substr(text,
                             CAST(((f.range * 72 + gy.range * 9 + gx.range)
                                   % n) + 1 AS BIGINT),
                             1)) % 256 AS v
                         FROM d, range(0, 2) f, range(0, 8) gy, range(0, 9) gx),
                   byts AS (SELECT a.doc_id, a.f, a.gy,
                              CAST(sum(CASE WHEN b.v > a.v THEN 1 << a.gx
                                       ELSE 0 END) AS BIGINT) AS bits
                            FROM g a JOIN g b ON a.doc_id = b.doc_id
                              AND a.f = b.f AND a.gy = b.gy
                              AND b.gx = a.gx + 1
                            WHERE a.gx < 8 GROUP BY 1, 2, 3),
                   h AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                           CAST(sum(bit_count(xor(a.bits, b.bits))) AS BIGINT)
                             AS ham
                         FROM byts a JOIN byts b
                           ON a.f = b.f AND a.gy = b.gy
                             AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
              SELECT ia, ib, ham FROM h WHERE ham <= 3 ORDER BY ia, ib""")),

    // x172 — audio envelope fingerprints: the x166 discipline on the
    // audio axis — every doc rendered as a REAL PCM16 mono WAV (130
    // samples from char codes), parsed back through the container walk
    // and fingerprinted from the energy envelope (65 windows of exactly
    // 2 samples, sign-of-adjacent-diff bits). Reported as row-bytes; the
    // oracle recomputes from char codes without ever seeing a WAV, so a
    // hash-match proves the container parse is sample-exact.
    QueryDef("x172_audio_fingerprint",
      (s, d) => audioFpShared(s, d)
        .filter(col("afp").isNotNull)
        .select(col("media_id").as("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 7), g -> shiftright(afp, 8 * g) & 255L)"))
            .as(Seq("row_no", "bits")))
        .select(col("doc_id"), col("row_no").cast("long").as("row_no"),
          col("bits"))
        .orderBy("doc_id", "row_no"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   sm AS (SELECT doc_id, i.range AS i,
                            abs((ord(substr(text,
                              CAST((i.range % n) + 1 AS BIGINT), 1)) % 256
                              - 128) * 256) AS a
                          FROM d, range(0, 130) i),
                   env AS (SELECT doc_id, i // 2 AS w,
                             CAST(sum(a) AS BIGINT) AS e
                           FROM sm GROUP BY 1, 2),
                   p AS (SELECT a.doc_id, a.w,
                           CASE WHEN c.e > a.e THEN 1 << CAST(a.w % 8 AS INT)
                                ELSE 0 END AS bit
                         FROM env a JOIN env c
                           ON a.doc_id = c.doc_id AND c.w = a.w + 1
                         WHERE a.w < 64)
              SELECT doc_id, CAST(w // 8 AS BIGINT) AS row_no,
                     CAST(sum(bit) AS BIGINT) AS bits
              FROM p GROUP BY 1, 2 ORDER BY doc_id, row_no""")),

    // x173 — audio near-dup pairs: banded Hamming over the x172
    // fingerprints through the SAME generalized x111 machinery as text
    // SimHash and pixel dHash — one pair miner, three modalities. Exact
    // oracle (brute-force Hamming from the independent row-bytes).
    QueryDef("x173_audio_hamming_pairs",
      (s, d) => Dedup.hammingNearDupPairsOf(
          audioFpShared(s, d).filter(col("afp").isNotNull),
          "afp", hMax = 3, idCol = "media_id")
        .orderBy("ia", "ib"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   sm AS (SELECT doc_id, i.range AS i,
                            abs((ord(substr(text,
                              CAST((i.range % n) + 1 AS BIGINT), 1)) % 256
                              - 128) * 256) AS a
                          FROM d, range(0, 130) i),
                   env AS (SELECT doc_id, i // 2 AS w,
                             CAST(sum(a) AS BIGINT) AS e
                           FROM sm GROUP BY 1, 2),
                   byts AS (SELECT a.doc_id, CAST(a.w // 8 AS BIGINT) AS row_no,
                              CAST(sum(CASE WHEN c.e > a.e
                                THEN 1 << CAST(a.w % 8 AS INT)
                                ELSE 0 END) AS BIGINT) AS bits
                            FROM env a JOIN env c
                              ON a.doc_id = c.doc_id AND c.w = a.w + 1
                            WHERE a.w < 64 GROUP BY 1, 2),
                   h AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                           CAST(sum(bit_count(xor(a.bits, b.bits))) AS BIGINT)
                             AS ham
                         FROM byts a JOIN byts b
                           ON a.row_no = b.row_no AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
              SELECT ia, ib, ham FROM h WHERE ham <= 3 ORDER BY ia, ib""")),

    // x177 — pixel-dedup threshold yield curve: cumulative pair counts at
    // Hamming radius 0..3 over the x166 dHashes — the x83 threshold-tuning
    // read on the perceptual axis (how much more a looser radius removes),
    // derived from ONE banded mining pass, no re-mining per radius.
    QueryDef("x177_phash_threshold_curve",
      (s, d) => Dedup.hammingNearDupPairsOf(
          pixelDHashShared(s, d), "phash", hMax = 3, idCol = "media_id")
        .select(explode(expr("sequence(ham, 3)")).as("h_max"))
        .groupBy(col("h_max")).agg(count(lit(1)).as("n_pairs"))
        .select(col("h_max").cast("long").as("h_max"), col("n_pairs"))
        .orderBy("h_max"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   g AS (SELECT doc_id, gy.range AS gy, gx.range AS gx,
                           ord(substr(text,
                             CAST(((gy.range * 9 + gx.range) % n) + 1 AS BIGINT),
                             1)) % 256 AS v
                         FROM d, range(0, 8) gy, range(0, 9) gx),
                   byts AS (SELECT a.doc_id, a.gy AS row_no,
                              CAST(sum(CASE WHEN b.v > a.v THEN 1 << a.gx
                                       ELSE 0 END) AS BIGINT) AS bits
                            FROM g a JOIN g b ON a.doc_id = b.doc_id
                              AND a.gy = b.gy AND b.gx = a.gx + 1
                            WHERE a.gx < 8 GROUP BY 1, 2),
                   h AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                           CAST(sum(bit_count(xor(a.bits, b.bits))) AS BIGINT)
                             AS ham
                         FROM byts a JOIN byts b
                           ON a.row_no = b.row_no AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
              SELECT CAST(t.range AS BIGINT) AS h_max, count(*) AS n_pairs
              FROM h, range(0, 4) t WHERE h.ham <= t.range
              GROUP BY 1 ORDER BY h_max""")),
  )
}
