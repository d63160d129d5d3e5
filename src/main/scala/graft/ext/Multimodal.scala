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

  /** Extracted features. `width`/`height` are None when the payload is not
    * a recognized image (PNG/JPEG/GIF) or video (AVI `avih` / MP4 `moov`)
    * container; `sample_rate` is None outside recognized audio
    * (WAV/MP3/FLAC via [[MediaCodecs.audioInfo]]); `duration_ms` comes
    * from the audio parse or the video header (AVI frames ×
    * µs-per-frame; MP4 mvhd duration/timescale); `n_frames` is the REAL
    * header-declared frame count for a parseable AVI/MP4 and a
    * length-derived placeholder only for opaque video payloads — a real
    * pipeline wants
    * "unknown", not a plausible fake; `feature` is decoded-pixel
    * statistics for PNG payloads and a content-byte projection otherwise
    * (the codec seam). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha: String,
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      duration_ms: Option[Long],
      n_frames: Int,
      feature: Array[Float])

  /** A decoded 8-bit raster: `channels` ∈ {1 gray, 2 gray+alpha, 3 RGB,
    * 4 RGBA}, samples row-major, `width*height*channels` bytes. */
  case class Raster(width: Int, height: Int, channels: Int, pixels: Array[Byte])

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

    /** Full PNG pixel decode, pure JVM — the published format layout end to
      * end: chunk walk concatenating IDAT payloads, one zlib inflate
      * (`java.util.zip.Inflater`), then per-scanline unfiltering (filter
      * types 0–4: None/Sub/Up/Average/Paeth). Supported: 8-bit-depth,
      * non-interlaced, color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA) —
      * the overwhelmingly common shapes; palette (3), 16-bit, and Adam7
      * return None (as do truncated or corrupt streams — the decoder is
      * total, never throws). Chunk CRCs are not validated: the zlib stream
      * itself detects corruption where it matters for pixels. */
    def pngPixels(b: Array[Byte]): Option[Raster] = {
      def u8(i: Int): Int = b(i) & 0xff
      def be32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      val isPng = b.length >= 33 &&
        u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'
      if (!isPng) return None
      val width = be32(16)
      val height = be32(20)
      val bitDepth = u8(24)
      val colorType = u8(25)
      val interlace = u8(28)
      val channels = colorType match {
        case 0 => 1
        case 2 => 3
        case 4 => 2
        case 6 => 4
        case _ => return None // palette needs PLTE handling — out of scope
      }
      if (bitDepth != 8 || interlace != 0 || width <= 0 || height <= 0)
        return None
      // guard the allocation: refuse rasters over ~64 MP (a hostile header
      // must not OOM an executor before the inflate even starts)
      if (width.toLong * height * channels > (1L << 26) * 4) return None
      val idat = new java.io.ByteArrayOutputStream()
      var i = 8
      var done = false
      while (!done && i + 8 <= b.length) {
        val len = be32(i)
        if (len < 0 || i + 8 + len.toLong + 4 > b.length) return None
        val typ = new String(b, i + 4, 4, "US-ASCII")
        if (typ == "IDAT") idat.write(b, i + 8, len)
        if (typ == "IEND") done = true else i += 8 + len + 4
      }
      if (idat.size == 0) return None
      val stride = width * channels
      val raw = new Array[Byte]((stride + 1) * height)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      try {
        var off = 0
        while (off < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, off, raw.length - off)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
          off += n
        }
        if (off < raw.length) return None
        // Drain to the stream end so the zlib adler32 trailer is actually
        // verified (output can complete before the trailer is consumed).
        // A conforming stream inflates to EXACTLY raw.length bytes, so any
        // surplus inflated byte means corruption — or a decompression bomb
        // crafted to keep one executor core inflating indefinitely. Reject
        // on the first surplus byte, and bound the trailer-consuming calls
        // (full input is already attached, so a healthy trailer finishes in
        // one call) instead of looping through attacker-controlled output.
        val sink = new Array[Byte](1)
        var drains = 0
        while (!inf.finished()) {
          val n = inf.inflate(sink, 0, 1)
          if (n > 0) return None // surplus byte beyond the raster: corrupt/bomb
          if (inf.needsInput() || inf.needsDictionary()) return None
          drains += 1
          if (drains > 8) return None // no progress toward the trailer: corrupt
        }
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inf.end()
      val out = new Array[Byte](stride * height)
      var y = 0
      while (y < height) {
        val f = raw((stride + 1) * y) & 0xff
        if (f > 4) return None
        val rowIn = (stride + 1) * y + 1
        val rowOut = stride * y
        var x = 0
        while (x < stride) {
          val cur = raw(rowIn + x) & 0xff
          val a = if (x >= channels) out(rowOut + x - channels) & 0xff else 0
          val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
          val c = if (x >= channels && y > 0) out(rowOut - stride + x - channels) & 0xff else 0
          val v = f match {
            case 0 => cur
            case 1 => cur + a
            case 2 => cur + up
            case 3 => cur + ((a + up) >> 1)
            case 4 =>
              val p = a + up - c
              val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
              cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          }
          out(rowOut + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(Raster(width, height, channels, out))
    }

    /** Production-codec bridge: JDK ImageIO raster decode (java.desktop,
      * headless-safe) for the container formats the spec-pinned pure-JVM
      * PNG path doesn't cover — GIF/BMP exactly, JPEG per the JDK's IDCT.
      * Normalizes to the [[Raster]] contract (RGB, or RGBA when the color
      * model carries alpha). Total: unreadable payloads return None. This
      * is the seam a deployment swaps for its own codec; keep [[pngPixels]]
      * as the deterministic reference for PNG. */
    // in-memory streams only: the default ImageIO disk cache would create
    // and delete a temp FILE on the executor per decoded payload
    javax.imageio.ImageIO.setUseCache(false)

    /** Baseline JPEG encode of a GRAYSCALE plane through the JDK's
      * production writer (java.desktop, headless-safe) at explicit
      * `quality` — the [[imageIoPixels]] bridge's WRITE side, so a
      * JPEG round trip can be driven entirely from library code. The
      * plane rides all THREE RGB channels (R=G=B=v): the YCbCr
      * transform then carries Y=v with FLAT chroma (Cb=Cr=128, every
      * offset term zero), and at quality 1.0 the scaled quantization
      * tables are all-ones — making the round trip PIXEL-EXACT for
      * images constant within each 8×8 block (DC-only blocks —
      * MultimodalSpec and the x166b catalog row pin exactly this).
      * A single-channel TYPE_BYTE_GRAY image would NOT have that
      * property: the decoder's linear-gray → sRGB colorspace
      * conversion inside getRGB remaps every sample (measured: gamma
      * shift on the whole range). General images remain lossy per the
      * codec's nature. */
    // One cached JPEG ImageWriter per thread: writers are not
    // thread-safe, and the per-call registry scan + dispose cost
    // dominates a corpus-sized encode loop (one writer instance per
    // executor thread for the JVM's lifetime is the standard reuse).
    private val jpegWriterTL =
      ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
        javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next())

    def jpegEncodeGray(width: Int, height: Int, gray: Array[Byte],
                       quality: Float = 1.0f): Array[Byte] = {
      require(width > 0 && height > 0 && gray.length == width * height,
        s"jpegEncodeGray: ${gray.length} bytes for ${width}x$height")
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      // one bulk ARGB store, not width*height per-pixel setRGB calls
      // (each of which re-checks the color model) — the imageIoPixels
      // read side already does the mirror-image bulk getRGB
      val argb = new Array[Int](width * height)
      var i = 0
      while (i < argb.length) {
        val v = gray(i) & 0xff
        argb(i) = (v << 16) | (v << 8) | v
        i += 1
      }
      img.setRGB(0, 0, width, height, argb, 0, width)
      val bos = new java.io.ByteArrayOutputStream()
      val w = jpegWriterTL.get()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        w.setOutput(out)
        w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally {
        w.setOutput(null)
        out.close()
      }
      bos.toByteArray
    }

    def imageIoPixels(b: Array[Byte]): Option[Raster] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) None
          else {
            val channels = if (img.getColorModel.hasAlpha) 4 else 3
            // one bulk ARGB fetch per row block, not a per-pixel getRGB call
            val argb = img.getRGB(0, 0, w, h, null, 0, w)
            val out = new Array[Byte](w * h * channels)
            var p = 0
            var i = 0
            while (p < argb.length) {
              val v = argb(p)
              out(i) = ((v >> 16) & 0xff).toByte
              out(i + 1) = ((v >> 8) & 0xff).toByte
              out(i + 2) = (v & 0xff).toByte
              if (channels == 4) out(i + 3) = ((v >>> 24) & 0xff).toByte
              i += channels
              p += 1
            }
            Some(Raster(w, h, channels, out))
          }
        }
      } catch {
        // NonFatal only: an OutOfMemoryError or interrupt from a hostile
        // payload must propagate and fail the task, not be misreported as
        // "unreadable payload".
        case scala.util.control.NonFatal(_) => None
      }

    /** 8-float content feature from a decoded raster: per-channel means
      * (4 slots, 0 for absent channels), overall mean, min, max — all in
      * [0,1] — and channels/4. Deterministic, derived from PIXELS, not the
      * compressed byte stream. */
    private[ext] def rasterFeature(r: Raster): Array[Float] = {
      val sums = new Array[Long](r.channels)
      var mn = 255; var mx = 0
      var i = 0
      while (i < r.pixels.length) {
        val v = r.pixels(i) & 0xff
        sums(i % r.channels) += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      val perPix = r.width.toLong * r.height
      val means = (0 until 4).map { c =>
        if (c < r.channels && perPix > 0) (sums(c).toDouble / perPix / 255.0).toFloat
        else 0f
      }
      val overall =
        if (r.pixels.length > 0) (sums.sum.toDouble / r.pixels.length / 255.0).toFloat
        else 0f
      (means :+ overall :+ mn / 255.0f :+ mx / 255.0f :+ r.channels / 4.0f).toArray
    }

    /** Integer luma plane of a raster: the gray sample for 1/2-channel
      * rasters, the Rec.601 integer weighting (299R + 587G + 114B)/1000
      * for RGB(A) — exact integer arithmetic, so every engine and every
      * run agrees bit-for-bit. */
    def lumaPlane(r: Raster): Array[Int] = {
      val n = r.width * r.height
      val out = new Array[Int](n)
      var p = 0
      while (p < n) {
        val base = p * r.channels
        out(p) =
          if (r.channels <= 2) r.pixels(base) & 0xff
          else (299 * (r.pixels(base) & 0xff) + 587 * (r.pixels(base + 1) & 0xff) +
            114 * (r.pixels(base + 2) & 0xff)) / 1000
        p += 1
      }
      out
    }

    /** 64-bit difference hash (dHash — the standard perceptual image
      * fingerprint): area-average the luma plane onto a 9×8 grid (exact
      * integer box averaging with floor boundaries `g·dim/9`; cells clamp
      * to ≥1 pixel so the hash is total for any raster size — a 9×8 input
      * maps cell-per-pixel), then bit (gy·8 + gx) = 1 iff
      * cell(gy, gx+1) > cell(gy, gx). Robust to re-encoding, format
      * conversion, and resampling (the properties the compressed-byte
      * fingerprints of x31 cannot offer), Hamming-comparable via the x111
      * band machinery. */
    def dHash64(r: Raster): Long = {
      val luma = lumaPlane(r)
      val cells = Array.ofDim[Long](8, 9)
      var gy = 0
      while (gy < 8) {
        val y0 = gy * r.height / 8
        val y1 = { val e = (gy + 1) * r.height / 8; if (e <= y0) y0 + 1 else e }
        var gx = 0
        while (gx < 9) {
          val x0 = gx * r.width / 9
          val x1 = { val e = (gx + 1) * r.width / 9; if (e <= x0) x0 + 1 else e }
          var s = 0L
          var c = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += luma(y * r.width + x); c += 1; x += 1 }
            y += 1
          }
          cells(gy)(gx) = s / c
          gx += 1
        }
        gy += 1
      }
      var h = 0L
      gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          if (cells(gy)(gx + 1) > cells(gy)(gx)) h |= 1L << (gy * 8 + gx)
          gx += 1
        }
        gy += 1
      }
      h
    }

    /** Minimal PNG encoder — the [[pngPixels]] layout in reverse (8-bit,
      * non-interlaced, filter-0 scanlines, one deflated IDAT, CRC32
      * chunks), so an encode→decode round trip is pixel-exact
      * (MultimodalSpec pins it). Exists so fixtures and tests can
      * synthesize REAL decodable payloads without a codec library; a
      * production pipeline encodes with its own codec at the same seam. */
    def pngEncode(r: Raster): Array[Byte] = {
      require(r.width > 0 && r.height > 0 &&
        r.channels >= 1 && r.channels <= 4 &&
        r.pixels.length == r.width * r.height * r.channels,
        s"malformed raster ${r.width}x${r.height}x${r.channels}")
      val colorType = r.channels match {
        case 1 => 0; case 2 => 4; case 3 => 2; case _ => 6
      }
      val stride = r.width * r.channels
      val raw = new Array[Byte]((stride + 1) * r.height)
      var y = 0
      while (y < r.height) {
        System.arraycopy(r.pixels, y * stride, raw, (stride + 1) * y + 1, stride)
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw)
      deflater.finish()
      val idat = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) idat.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      def be32(v: Int): Array[Byte] = Array(
        ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      def chunk(typ: String, payload: Array[Byte]): Unit = {
        val tp = typ.getBytes("US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(tp)
        crc.update(payload)
        out.write(be32(payload.length))
        out.write(tp)
        out.write(payload)
        out.write(be32(crc.getValue.toInt))
      }
      val ihdr = new java.io.ByteArrayOutputStream()
      ihdr.write(be32(r.width))
      ihdr.write(be32(r.height))
      ihdr.write(Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte))
      chunk("IHDR", ihdr.toByteArray)
      chunk("IDAT", idat.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Minimal WAV (RIFF/PCM16LE mono) encoder — the audio analog of
      * [[pngEncode]]: a real, decodable container synthesized without any
      * codec library, so fixtures and tests exercise the full
      * encode → parse → fingerprint chain. */
    def wavEncode(samples: Array[Short], sampleRate: Int = 16000): Array[Byte] = {
      require(sampleRate > 0, s"sampleRate must be > 0, got $sampleRate")
      val dataLen = samples.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      out.putShort(1).putShort(1) // PCM, mono
      out.putInt(sampleRate).putInt(sampleRate * 2)
      out.putShort(2).putShort(16) // block align, bits/sample
      out.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(out.putShort)
      out.array()
    }

    /** Parse a [[wavEncode]]-shaped WAV: RIFF/WAVE signature, a chunk walk
      * to `fmt ` (must be PCM16 mono) and `data`. Total — anything else
      * (compressed codecs, multi-channel, truncated) returns None, the
      * "unknown, never a fake" rule. Returns (sampleRate, samples). */
    def wavSamples(b: Array[Byte]): Option[(Int, Array[Short])] = {
      if (b.length < 44 ||
        new String(b, 0, 4, "US-ASCII") != "RIFF" ||
        new String(b, 8, 4, "US-ASCII") != "WAVE") return None
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 12
      var rate = 0
      var okFmt = false
      var data: Option[Array[Short]] = None
      while (i + 8 <= b.length && (data.isEmpty || !okFmt)) {
        val typ = new String(b, i, 4, "US-ASCII")
        val len = buf.getInt(i + 4)
        if (len < 0 || i + 8 + len.toLong > b.length) return None
        if (typ == "fmt ") {
          if (len < 16) return None
          val fmt = buf.getShort(i + 8)
          val ch = buf.getShort(i + 10)
          val bits = buf.getShort(i + 22)
          if (fmt != 1 || ch != 1 || bits != 16) return None
          rate = buf.getInt(i + 12)
          okFmt = true
        } else if (typ == "data") {
          val n = len / 2
          val s = new Array[Short](n)
          var k = 0
          while (k < n) { s(k) = buf.getShort(i + 8 + 2 * k); k += 1 }
          data = Some(s)
        }
        i += 8 + len + (len & 1) // RIFF chunks pad to even
      }
      if (okFmt && rate > 0) data.map(d => (rate, d)) else None
    }

    /** 64-bit audio envelope fingerprint — dHash's shape on the time axis:
      * the absolute-amplitude ENERGY SUM over 65 equal-rule windows
      * (`w·n/65` floor boundaries, clamped to ≥1 sample — total for any
      * non-empty signal), bit b = 1 iff envelope(b+1) > envelope(b). Exact
      * integer arithmetic end to end; robust to uniform gain (strict sums
      * scale monotonically) and to integer-aligned resampling, the audio
      * near-dup signal compressed-byte fingerprints cannot give. Empty
      * signal → 0L. */
    def audioFingerprint64(samples: Array[Short]): Long = {
      if (samples.isEmpty) return 0L
      val n = samples.length
      val env = new Array[Long](65)
      var w = 0
      while (w < 65) {
        val a0 = w * n / 65
        val a1 = { val e = (w + 1) * n / 65; if (e <= a0) a0 + 1 else e }
        var s = 0L
        var k = a0
        while (k < a1) { s += math.abs(samples(math.min(k, n - 1)).toLong); k += 1 }
        env(w) = s
        w += 1
      }
      var h = 0L
      var b = 0
      while (b < 64) {
        if (env(b + 1) > env(b)) h |= 1L << b
        b += 1
      }
      h
    }

    /** Pure-JVM audio container info — [[imageDimensions]]'s shape on the
      * audio axis: (format, sample rate Hz, duration ms) parsed
      * header-exactly from the container, NO sample decode.
      *
      *   - WAV: RIFF chunk walk to `fmt ` (PCM only) + `data`; duration =
      *     data bytes / block align samples.
      *   - FLAC: "fLaC" magic, then the STREAMINFO metadata block (the
      *     spec mandates it first): sample rate (20 bits) and total
      *     samples (36 bits) from the packed field block.
      *   - MP3: optional ID3v2 skip (syncsafe size), then a Layer III
      *     frame-HEADER walk (sync + version/bitrate/rate fields give each
      *     frame's byte length — headers only, payloads skipped):
      *     duration = frames × samples-per-frame (1152 MPEG1 / 576
      *     MPEG2/2.5) at the stream's fixed sample rate. The walk must
      *     land exactly at EOF or a trailing ID3v1 `TAG` block — embedded
      *     garbage means "not an MP3", never a guessed duration.
      *
      * Durations floor to whole milliseconds (exact integer arithmetic —
      * every engine agrees). Returns None for anything else — the
      * "unknown, never a fake" rule. */
    def audioInfo(b: Array[Byte]): Option[(String, Int, Long)] =
      wavInfo(b).orElse(flacInfo(b)).orElse(mp3Info(b))

    private def wavInfo(b: Array[Byte]): Option[(String, Int, Long)] = {
      if (b.length < 44 ||
        new String(b, 0, 4, "US-ASCII") != "RIFF" ||
        new String(b, 8, 4, "US-ASCII") != "WAVE") return None
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 12
      var rate = 0
      var blockAlign = 0
      var dataLen = -1L
      while (i + 8 <= b.length) {
        val typ = new String(b, i, 4, "US-ASCII")
        val len = buf.getInt(i + 4)
        if (len < 0 || i + 8 + len.toLong > b.length) return None
        if (typ == "fmt ") {
          if (len < 16 || buf.getShort(i + 8) != 1) return None // PCM only
          rate = buf.getInt(i + 12)
          blockAlign = buf.getShort(i + 20)
        } else if (typ == "data") dataLen = len.toLong
        i += 8 + len + (len & 1)
      }
      if (rate > 0 && blockAlign > 0 && dataLen >= 0)
        Some(("wav", rate, dataLen / blockAlign * 1000L / rate))
      else None
    }

    private def flacInfo(b: Array[Byte]): Option[(String, Int, Long)] = {
      if (b.length < 42 ||
        new String(b, 0, 4, "US-ASCII") != "fLaC") return None
      def u8(i: Int): Int = b(i) & 0xff
      // first metadata block MUST be STREAMINFO (type 0), length 34
      if ((u8(4) & 0x7f) != 0) return None
      val len = (u8(5) << 16) | (u8(6) << 8) | u8(7)
      if (len < 34 || 8 + len > b.length) return None
      val s = 8 // STREAMINFO payload start
      val rate = (u8(s + 10) << 12) | (u8(s + 11) << 4) | (u8(s + 12) >> 4)
      val total = ((u8(s + 13) & 0x0f).toLong << 32) |
        (u8(s + 14).toLong << 24) | (u8(s + 15).toLong << 16) |
        (u8(s + 16).toLong << 8) | u8(s + 17).toLong
      if (rate <= 0) None
      else Some(("flac", rate, total * 1000L / rate))
    }

    private val Mp3RatesMpeg1 = Array(44100, 48000, 32000)
    private val Mp3BitratesMpeg1 = Array(0, 32, 40, 48, 56, 64, 80, 96,
      112, 128, 160, 192, 224, 256, 320)
    private val Mp3BitratesMpeg2 = Array(0, 8, 16, 24, 32, 40, 48, 56,
      64, 80, 96, 112, 128, 144, 160)

    private def mp3Info(b: Array[Byte]): Option[(String, Int, Long)] = {
      def u8(i: Int): Int = b(i) & 0xff
      var i = 0
      // ID3v2: "ID3" + 2 version + 1 flags + 4 SYNCSAFE size bytes
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        if ((u8(6) | u8(7) | u8(8) | u8(9)) >= 0x80) return None
        i = 10 + ((u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9))
      }
      var rate = 0
      var frames = 0L
      var samplesPerFrame = 0
      while (i + 4 <= b.length) {
        // trailing ID3v1 tag ends the stream cleanly
        if (i + 3 <= b.length && b(i) == 'T' && b(i + 1) == 'A' &&
          b(i + 2) == 'G' && b.length - i == 128)
          return if (frames > 0) Some(("mp3", rate, frames * samplesPerFrame * 1000L / rate)) else None
        if (u8(i) != 0xff || (u8(i + 1) & 0xe0) != 0xe0) return None
        val version = (u8(i + 1) >> 3) & 3 // 0=2.5, 2=MPEG2, 3=MPEG1
        val layer = (u8(i + 1) >> 1) & 3   // 1 = Layer III
        if (version == 1 || layer != 1) return None
        val brIdx = u8(i + 2) >> 4
        val rateIdx = (u8(i + 2) >> 2) & 3
        val padding = (u8(i + 2) >> 1) & 1
        if (brIdx == 0 || brIdx == 15 || rateIdx == 3) return None
        val mpeg1 = version == 3
        val thisRate = Mp3RatesMpeg1(rateIdx) /
          (if (mpeg1) 1 else if (version == 2) 2 else 4)
        if (rate == 0) rate = thisRate
        else if (rate != thisRate) return None // VBR bitrate ok, rate is fixed
        val kbps = (if (mpeg1) Mp3BitratesMpeg1 else Mp3BitratesMpeg2)(brIdx)
        samplesPerFrame = if (mpeg1) 1152 else 576
        val frameLen = samplesPerFrame / 8 * kbps * 1000 / thisRate + padding
        if (frameLen <= 4 || i + frameLen > b.length) return None
        frames += 1
        i += frameLen
      }
      if (frames > 0 && i == b.length)
        Some(("mp3", rate, frames * samplesPerFrame * 1000L / rate))
      else None
    }

    /** Synthesize a structurally-real Layer III MP3: `nFrames` valid frame
      * headers with zero audio payloads (the header walk never decodes
      * payloads, so fixtures need real HEADERS, not real audio) — the
      * [[pngEncode]]/[[wavEncode]] role for the compressed-audio parser.
      * MPEG1 rates {44100, 48000, 32000}; CBR at `bitrateKbps`. */
    def mp3Encode(nFrames: Int, sampleRate: Int = 44100,
                  bitrateKbps: Int = 128): Array[Byte] = {
      require(nFrames > 0, s"nFrames must be > 0, got $nFrames")
      val rateIdx = Mp3RatesMpeg1.indexOf(sampleRate)
      require(rateIdx >= 0, s"unsupported MPEG1 rate $sampleRate")
      val brIdx = Mp3BitratesMpeg1.indexOf(bitrateKbps)
      require(brIdx > 0, s"unsupported MPEG1 Layer III bitrate $bitrateKbps")
      val frameLen = 144 * bitrateKbps * 1000 / sampleRate // no padding
      val out = new Array[Byte](nFrames * frameLen)
      var f = 0
      while (f < nFrames) {
        val o = f * frameLen
        out(o) = 0xff.toByte
        out(o + 1) = 0xfb.toByte // MPEG1, Layer III, no CRC
        out(o + 2) = ((brIdx << 4) | (rateIdx << 2)).toByte // no padding
        out(o + 3) = 0xc4.toByte // mono, no emphasis
        f += 1
      }
      out
    }

    /** Synthesize a structurally-real FLAC header: "fLaC" + the mandatory
      * STREAMINFO metadata block (marked last) carrying `sampleRate` and
      * `totalSamples` — all [[audioInfo]] reads. */
    def flacEncode(sampleRate: Int, totalSamples: Long): Array[Byte] = {
      require(sampleRate > 0 && sampleRate < (1 << 20),
        s"sampleRate out of STREAMINFO range: $sampleRate")
      require(totalSamples >= 0 && totalSamples < (1L << 36),
        s"totalSamples out of STREAMINFO range: $totalSamples")
      val out = new Array[Byte](8 + 34)
      out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
      out(4) = 0x80.toByte // last-metadata-block, type 0 = STREAMINFO
      out(7) = 34          // block length
      val s = 8
      out(s) = 0x10; out(s + 1) = 0x00     // min block 4096
      out(s + 2) = 0x10; out(s + 3) = 0x00 // max block 4096
      // min/max frame size 0 (unknown): bytes s+4..s+9 stay 0
      out(s + 10) = (sampleRate >> 12).toByte
      out(s + 11) = ((sampleRate >> 4) & 0xff).toByte
      // rate low nibble | (channels-1 = 0) << 1 | (bps-1 = 15) >> 4
      out(s + 12) = (((sampleRate & 0xf) << 4) | (15 >> 4)).toByte
      out(s + 13) = (((15 & 0xf) << 4) | ((totalSamples >> 32) & 0xf).toInt).toByte
      out(s + 14) = ((totalSamples >> 24) & 0xff).toByte
      out(s + 15) = ((totalSamples >> 16) & 0xff).toByte
      out(s + 16) = ((totalSamples >> 8) & 0xff).toByte
      out(s + 17) = (totalSamples & 0xff).toByte
      // 16-byte MD5 of the (absent) audio stream stays zero
      out
    }

    /** Minimal uncompressed AVI (RIFF) encoder — the video analog of
      * [[pngEncode]]/[[wavEncode]]: a real, decodable container
      * synthesized without any codec library. Published RIFF/AVI layout:
      * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
      * LIST('movi' 00db...))` with each frame a bottom-up 24-bit BI_RGB
      * DIB (`00db` = stream 0, uncompressed DIB), rows padded to 4 bytes.
      * Rasters of any channel count encode: gray replicates to BGR
      * (lossless for luma — Rec.601 of (v,v,v) is exactly v), RGB(A) maps
      * to BGR dropping alpha, so an encode → [[aviFrames]] → [[dHash64]]
      * chain hashes the SOURCE luma exactly. All frames must share
      * dimensions (one video stream, fixed frame size). */
    def aviEncode(frames: Seq[Raster], fps: Int = 10): Array[Byte] = {
      require(frames.nonEmpty, "aviEncode needs at least one frame")
      require(fps > 0, s"fps must be > 0, got $fps")
      val w = frames.head.width
      val h = frames.head.height
      require(frames.forall(f => f.width == w && f.height == h),
        "all frames must share dimensions")
      val stride = (w * 3 + 3) & ~3
      val frameBytes = stride * h
      def dib(r: Raster): Array[Byte] = {
        val out = new Array[Byte](frameBytes)
        var y = 0
        while (y < h) {
          val src = (h - 1 - y) * w // bottom-up: DIB row y = raster row h-1-y
          var x = 0
          while (x < w) {
            val base = (src + x) * r.channels
            val (rr, gg, bb) =
              if (r.channels <= 2) {
                val v = r.pixels(base); (v, v, v)
              } else (r.pixels(base), r.pixels(base + 1), r.pixels(base + 2))
            out(y * stride + x * 3) = bb
            out(y * stride + x * 3 + 1) = gg
            out(y * stride + x * 3 + 2) = rr
            x += 1
          }
          y += 1
        }
        out
      }
      def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
      def le32(v: Int): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
        ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
      def le16(v: Int): Array[Byte] =
        Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
      def chunk(id: String, payload: Array[Byte]): Array[Byte] =
        fourcc(id) ++ le32(payload.length) ++ payload ++
          (if (payload.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
      def list(typ: String, payload: Array[Byte]): Array[Byte] =
        fourcc("LIST") ++ le32(payload.length + 4) ++ fourcc(typ) ++ payload
      // MainAVIHeader (56 bytes)
      val avih = le32(1000000 / fps) ++ le32(frameBytes * fps) ++ le32(0) ++
        le32(0) ++ le32(frames.length) ++ le32(0) ++ le32(1) ++
        le32(frameBytes) ++ le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(0)
      // AVIStreamHeader (56 bytes): vids / DIB, rate = fps, scale = 1
      val strh = fourcc("vids") ++ fourcc("DIB ") ++ le32(0) ++ le16(0) ++
        le16(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
        le32(frames.length) ++ le32(frameBytes) ++ le32(0) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
      // BITMAPINFOHEADER (40 bytes): 24-bit BI_RGB
      val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        le32(0) ++ le32(frameBytes) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val hdrl = list("hdrl",
        chunk("avih", avih) ++
          list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi",
        frames.iterator.map(f => chunk("00db", dib(f)))
          .foldLeft(Array.emptyByteArray)(_ ++ _))
      val body = fourcc("AVI ") ++ hdrl ++ movi
      fourcc("RIFF") ++ le32(body.length) ++ body
    }

    /** Minimal ISO-BMFF (MP4) encoder — the [[aviEncode]] discipline on
      * the container modern crawls actually carry: `ftyp` plus a fully
      * nested `moov` (`mvhd`, one video `trak` with
      * `tkhd`/`mdia`/`mdhd`/`hdlr('vide')`/`minf`/`stbl`) and no media
      * samples (`stsz` declares `nFrames` constant-size samples, `stco`
      * lists zero chunks), so the output is a valid header-only MP4. Box
      * layout per the published ISO/IEC 14496-12 structure: big-endian
      * 32-bit box size including the 8-byte header, fourcc type, FullBox
      * version+flags. `version` selects the 32-bit (0) or 64-bit (1) time
      * fields in mvhd/tkhd/mdhd — real muxers emit both, so the decoder
      * must be tested against both. */
    def mp4Encode(w: Int, h: Int, nFrames: Int, timescale: Int,
                  durationUnits: Long, version: Int = 0): Array[Byte] = {
      require(w > 0 && h > 0, s"dims must be positive, got ${w}x$h")
      require(nFrames >= 0, s"nFrames must be >= 0, got $nFrames")
      require(timescale > 0, s"timescale must be > 0, got $timescale")
      require(durationUnits >= 0,
        s"durationUnits must be >= 0, got $durationUnits")
      require(version == 0 || version == 1,
        s"mvhd version must be 0 or 1, got $version")
      def be16(v: Int): Array[Byte] =
        Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      def be32(v: Long): Array[Byte] = Array(
        ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
      def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
      def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
        val body = payload.foldLeft(Array.emptyByteArray)(_ ++ _)
        be32(body.length + 8L) ++ fourcc(typ) ++ body
      }
      // FullBox time fields: 32-bit in version 0, 64-bit in version 1
      def time(x: Long): Array[Byte] = if (version == 1) be64(x) else be32(x)
      val vf = Array(version.toByte, 0.toByte, 0.toByte, 0.toByte)
      val vf0 = Array[Byte](0, 0, 0, 0)
      // the identity transform matrix every muxer writes
      val matrix = be32(0x10000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x10000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000L)
      val mvhd = box("mvhd", vf, time(0), time(0), be32(timescale),
        time(durationUnits), be32(0x10000) /* rate 1.0 */,
        be16(0x0100) /* volume 1.0 */, be16(0), be32(0), be32(0),
        matrix, new Array[Byte](24) /* pre_defined */,
        be32(2) /* next_track_ID */)
      // tkhd flags 7 = enabled | in_movie | in_preview; dims 16.16 fixed
      val tkhd = box("tkhd", Array(version.toByte, 0, 0, 7), time(0),
        time(0), be32(1) /* track_ID */, be32(0), time(durationUnits),
        be32(0), be32(0), be16(0) /* layer */, be16(0) /* alt_group */,
        be16(0) /* volume */, be16(0), matrix,
        be32(w.toLong << 16), be32(h.toLong << 16))
      val mdhd = box("mdhd", vf, time(0), time(0), be32(timescale),
        time(durationUnits), be16(0x55c4) /* language 'und' */, be16(0))
      val hdlr = box("hdlr", vf0, be32(0), fourcc("vide"),
        new Array[Byte](12), Array[Byte](0) /* empty name */)
      val stbl = box("stbl",
        box("stsd", vf0, be32(0)),
        box("stts", vf0, be32(1), be32(nFrames), be32(1)),
        box("stsc", vf0, be32(0)),
        box("stsz", vf0, be32(1) /* constant sample_size */, be32(nFrames)),
        box("stco", vf0, be32(0)))
      val minf = box("minf",
        box("vmhd", Array[Byte](0, 0, 0, 1), be16(0), be16(0), be16(0),
          be16(0)),
        box("dinf", box("dref", vf0, be32(1),
          box("url ", Array[Byte](0, 0, 0, 1) /* self-contained */))),
        stbl)
      val ftyp = box("ftyp", fourcc("isom"), be32(0x200),
        fourcc("isom"), fourcc("mp42"))
      ftyp ++ box("moov", mvhd, box("trak", tkhd,
        box("mdia", mdhd, hdlr, minf)))
    }

    /** MP4/ISO-BMFF header info: (width, height, sample count,
      * duration ms) from the `moov` box walk ALONE — `mvhd` gives
      * timescale + duration (version 0 and 1 layouts), the first `trak`
      * whose `tkhd` carries nonzero 16.16-fixed dimensions gives the
      * video dims, and that trak's `stbl` gives the declared sample
      * count (`stsz` sample_count, falling back to the `stts` entry
      * sum, 0 when the trak declares no sample table). Handles 64-bit
      * `largesize` boxes and to-end-of-file size-0 boxes; any box whose
      * declared size overruns its container returns None — "unknown,
      * never a fake" — as does a version-0 duration of 0xFFFFFFFF /
      * version-1 -1 (the spec's "unknown duration" sentinel). No sample
      * data is touched, so this is header-exact for any codec. */
    private def mp4Info(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      def u8(i: Int): Int = b(i) & 0xff
      def be32(i: Int): Long =
        ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
          u8(i + 3)) & 0xffffffffL
      def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
      // the box at offset i inside [i, limit): (type, payloadStart, end);
      // None = malformed (short header, size overrun) — callers refuse
      def boxAt(i: Int, limit: Int): Option[(String, Int, Int)] = {
        if (i + 8 > limit) return None
        val sz32 = be32(i)
        val typ = new String(b, i + 4, 4, "US-ASCII")
        val (hdr, size): (Int, Long) =
          if (sz32 == 1L) {
            if (i + 16 > limit) return None
            (16, be64(i + 8))
          } else if (sz32 == 0L) (8, (limit - i).toLong)
          else (8, sz32)
        if (size < hdr || i + size > limit) None
        else Some((typ, i + hdr, (i + size).toInt))
      }
      def findBox(from: Int, limit: Int, typ: String): Option[(Int, Int)] = {
        var i = from
        while (i < limit) {
          boxAt(i, limit) match {
            case Some((t, ps, end)) =>
              if (t == typ) return Some((ps, end)); i = end
            case None => return None
          }
        }
        None
      }
      // declared sample count of a trak: stsz's fixed-offset count,
      // else the stts table sum, else 0 (no sample table declared)
      def sampleCount(trakStart: Int, trakEnd: Int): Int = {
        val stbl = for {
          (ms, me) <- findBox(trakStart, trakEnd, "mdia")
          (is, ie) <- findBox(ms, me, "minf")
          sb <- findBox(is, ie, "stbl")
        } yield sb
        stbl match {
          case None => 0
          case Some((ss, se)) =>
            findBox(ss, se, "stsz") match {
              case Some((zs, ze)) if ze - zs >= 12 =>
                math.min(be32(zs + 8), Int.MaxValue.toLong).toInt
              case _ =>
                findBox(ss, se, "stts") match {
                  case Some((ts, te)) if te - ts >= 8 =>
                    val entries = be32(ts + 4)
                    var sum = 0L
                    var k = 0
                    while (k < entries && ts + 8 + k * 8 + 8 <= te) {
                      sum += be32(ts + 8 + k * 8)
                      k += 1
                    }
                    math.min(sum, Int.MaxValue.toLong).toInt
                  case _ => 0
                }
            }
        }
      }
      if (b.length < 12 || new String(b, 4, 4, "US-ASCII") != "ftyp")
        return None
      val (moovS, moovE) = findBox(0, b.length, "moov").getOrElse(return None)
      val (mvS, mvE) = findBox(moovS, moovE, "mvhd").getOrElse(return None)
      val (timescale, duration) = u8(mvS) match {
        case 0 if mvE - mvS >= 20 => (be32(mvS + 12), be32(mvS + 16))
        case 1 if mvE - mvS >= 32 => (be32(mvS + 20), be64(mvS + 24))
        case _ => return None
      }
      if (timescale <= 0 || timescale > Int.MaxValue) return None
      if (duration == 0xffffffffL && u8(mvS) == 0) return None // unknown
      if (duration < 0) return None // v1 sentinel / overflow
      // first trak with nonzero video dims carries the answer
      var i = moovS
      while (i < moovE) {
        boxAt(i, moovE) match {
          case Some(("trak", ps, end)) =>
            findBox(ps, end, "tkhd").foreach { case (ts, te) =>
              val wOff = if (u8(ts) == 1) ts + 88 else ts + 76
              if ((u8(ts) == 0 || u8(ts) == 1) && te - wOff >= 8) {
                val tw = (be32(wOff) >> 16).toInt
                val th = (be32(wOff + 4) >> 16).toInt
                if (tw > 0 && th > 0) {
                  val durMs =
                    try Math.multiplyExact(duration, 1000L) / timescale
                    catch { case _: ArithmeticException => return None }
                  return Some((tw, th, sampleCount(ps, end), durMs))
                }
              }
            }
            i = end
          case Some((_, _, end)) => i = end
          case None => return None
        }
      }
      None
    }

    /** Pure-JVM video container info — the [[imageDimensions]]/[[audioInfo]]
      * shape completing the triptych: (width, height, frame count,
      * duration ms) from the container HEADER alone, NO sample walk and
      * NO frame decode — so it is header-exact for ANY stream including
      * compressed-codec ones [[aviFrames]] refuses to decode (info never
      * requires a codec; pixels do). Two container families: AVI reads
      * the `avih` MainAVIHeader (duration = total frames ×
      * µs-per-frame, floored to whole milliseconds); MP4/ISO-BMFF walks
      * `moov` ([[mp4Info]]: `mvhd` timescale+duration, `tkhd` 16.16
      * dims, `stbl` sample count). Returns None for anything else. */
    def videoInfo(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (b.length >= 12 && new String(b, 4, 4, "US-ASCII") == "ftyp")
        return mp4Info(b)
      if (b.length < 24 ||
        new String(b, 0, 4, "US-ASCII") != "RIFF" ||
        new String(b, 8, 4, "US-ASCII") != "AVI ") return None
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 12
      while (i + 8 <= b.length) {
        val typ = new String(b, i, 4, "US-ASCII")
        val len = buf.getInt(i + 4)
        if (len < 0 || i + 8 + len.toLong > b.length) return None
        if (typ == "LIST" && len >= 4 &&
          new String(b, i + 8, 4, "US-ASCII") == "hdrl") {
          var j = i + 12
          val until = i + 8 + len
          while (j + 8 <= until) {
            val t2 = new String(b, j, 4, "US-ASCII")
            val l2 = buf.getInt(j + 4)
            if (l2 < 0 || j + 8 + l2.toLong > until) return None
            if (t2 == "avih") {
              if (l2 < 40) return None
              val usPerFrame = buf.getInt(j + 8).toLong & 0xffffffffL
              val frames = buf.getInt(j + 24)
              val w = buf.getInt(j + 40)
              val h = buf.getInt(j + 44)
              // a corrupt avih with huge frames × µs-per-frame must not
              // overflow into a NEGATIVE duration — "unknown, never a fake"
              return if (w > 0 && h > 0 && frames >= 0)
                (try Some(Math.multiplyExact(frames.toLong, usPerFrame) / 1000L)
                 catch { case _: ArithmeticException => None })
                  .map(d => (w, h, frames, d))
              else None
            }
            j += 8 + l2 + (l2 & 1)
          }
          return None // hdrl without avih is not a well-formed AVI
        }
        i += 8 + len + (len & 1)
      }
      None
    }

    /** Parse an uncompressed-DIB AVI ([[aviEncode]]'s shape) into its
      * frame rasters — the [[wavSamples]] chunk-walk discipline on the
      * video container: RIFF/'AVI ' signature, walk the top-level LISTs
      * to `hdrl` (strf's BITMAPINFOHEADER must say 24-bit BI_RGB) and
      * `movi` (each `00db`/`00dc` frame chunk must be exactly one
      * bottom-up padded BGR frame). Total — compressed codecs,
      * palettized DIBs, size mismatches, and truncations all return None,
      * the "unknown, never a fake" rule. Frames decode to 3-channel RGB
      * rasters in stream order. */
    def aviFrames(b: Array[Byte]): Option[Seq[Raster]] = {
      if (b.length < 24 ||
        new String(b, 0, 4, "US-ASCII") != "RIFF" ||
        new String(b, 8, 4, "US-ASCII") != "AVI ") return None
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var w = 0
      var h = 0
      var okFmt = false
      var frames = List.newBuilder[Raster]
      var nFrames = 0
      // walk one LIST's children in [from, until)
      def walkStrl(from: Int, until: Int): Boolean = {
        var i = from
        while (i + 8 <= until) {
          val typ = new String(b, i, 4, "US-ASCII")
          val len = buf.getInt(i + 4)
          if (len < 0 || i + 8 + len.toLong > until) return false
          if (typ == "strf") {
            if (len < 40) return false
            val biW = buf.getInt(i + 12)
            val biH = buf.getInt(i + 16)
            val planes = buf.getShort(i + 20)
            val bits = buf.getShort(i + 22)
            val comp = buf.getInt(i + 24)
            if (bits != 24 || comp != 0 || planes != 1 ||
              biW <= 0 || biH <= 0) return false
            w = biW; h = biH; okFmt = true
          }
          i += 8 + len + (len & 1)
        }
        true
      }
      def walkHdrl(from: Int, until: Int): Boolean = {
        var i = from
        while (i + 8 <= until) {
          val typ = new String(b, i, 4, "US-ASCII")
          val len = buf.getInt(i + 4)
          if (len < 0 || i + 8 + len.toLong > until) return false
          if (typ == "LIST" && len >= 4 &&
            new String(b, i + 8, 4, "US-ASCII") == "strl") {
            if (!walkStrl(i + 12, i + 8 + len)) return false
          }
          i += 8 + len + (len & 1)
        }
        true
      }
      def decodeFrame(off: Int, len: Int): Boolean = {
        val stride = (w * 3 + 3) & ~3
        if (len != stride * h) return false
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          val srcRow = off + (h - 1 - y) * stride // un-flip bottom-up
          var x = 0
          while (x < w) {
            px((y * w + x) * 3) = b(srcRow + x * 3 + 2)     // R
            px((y * w + x) * 3 + 1) = b(srcRow + x * 3 + 1) // G
            px((y * w + x) * 3 + 2) = b(srcRow + x * 3)     // B
            x += 1
          }
          y += 1
        }
        frames += Raster(w, h, 3, px)
        nFrames += 1
        true
      }
      def walkMovi(from: Int, until: Int): Boolean = {
        var i = from
        while (i + 8 <= until) {
          val typ = new String(b, i, 4, "US-ASCII")
          val len = buf.getInt(i + 4)
          if (len < 0 || i + 8 + len.toLong > until) return false
          if (typ.endsWith("db") || typ.endsWith("dc")) {
            // a frame chunk we cannot decode (wrong size = compressed or
            // truncated) poisons the whole parse — no partial fakes
            if (!okFmt || !decodeFrame(i + 8, len)) return false
          }
          i += 8 + len + (len & 1)
        }
        true
      }
      var i = 12
      while (i + 8 <= b.length) {
        val typ = new String(b, i, 4, "US-ASCII")
        val len = buf.getInt(i + 4)
        if (len < 0 || i + 8 + len.toLong > b.length) return None
        if (typ == "LIST" && len >= 4) {
          val sub = new String(b, i + 8, 4, "US-ASCII")
          if (sub == "hdrl" && !walkHdrl(i + 12, i + 8 + len)) return None
          if (sub == "movi" && !walkMovi(i + 12, i + 8 + len)) return None
        }
        i += 8 + len + (len & 1)
      }
      if (okFmt && nFrames > 0) Some(frames.result()) else None
    }

    /** Container-aware decoder: header-parsed dimensions for PNG / JPEG /
      * GIF payloads (None otherwise — "unknown", never a fake), REAL pixel
      * statistics for decodable PNGs ([[pngPixels]]), and a content-byte
      * projection as the feature for everything else — the seam where a
      * production codec plugs in raster decode for the remaining formats.
      * The signature, batch shape, and determinism contract are what the
      * pipeline tests pin. */
    def decode(f: MediaFile): MediaFeatures = {
      val n = f.content.length
      val video = videoInfo(f.content)
      // image-container dims kept SEPARATE from the video-merged dims:
      // the raster-decode branch below must key on the image parse alone,
      // or every AVI payload would pay a speculative per-row ImageIO probe
      val imgDims = imageDimensions(f.content)
      val dims = imgDims.orElse(video.map(v => (v._1, v._2)))
      val audio = audioInfo(f.content)
      MediaFeatures(
        media_id = f.media_id,
        kind = f.kind,
        n_bytes = n.toLong,
        sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(f.content).map("%02x".format(_)).mkString,
        width = dims.map(_._1),
        height = dims.map(_._2),
        sample_rate = audio.map(_._2),
        duration_ms = audio.map(_._3).orElse(video.map(_._4)),
        // REAL frame count for a parseable AVI header; the length-derived
        // placeholder only where the container is opaque
        n_frames = video.map(_._3).getOrElse(
          if (f.kind == "video") (n % 300) + 1 else 1),
        // Raster decode ONLY for recognized image containers (the header
        // parse already ran — audio/video/opaque payloads must not pay a
        // speculative ImageIO format probe per row): PNG through the
        // spec-pinned decoder, other containers through the ImageIO
        // bridge, everything else through the content-byte projection.
        feature = (if (imgDims.isDefined)
            pngPixels(f.content).orElse(imageIoPixels(f.content))
          else None) match {
          case Some(r) => rasterFeature(r)
          case None => f.content.take(8).map(b => (b & 0xff) / 255.0f)
        })
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

  /** Partition-wise 64-bit perceptual hashing over a typed media Dataset:
    * decode the raster (PNG through the spec-pinned pure-JVM decoder,
    * other containers through the ImageIO bridge) and dHash its luma
    * plane. Output `(media_id, phash)`, phash NULL for payloads with no
    * decodable raster — "unknown", never a byte-stream fake. One map-side
    * pass; codec context per partition, per the [[extractFeatures]]
    * contract. */
  def perceptualHashes(media: Dataset[MediaFile]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { f =>
        val r = MediaCodecs.pngPixels(f.content)
          .orElse(MediaCodecs.imageIoPixels(f.content))
        (f.media_id, r.map(MediaCodecs.dHash64))
      }
    }.toDF("media_id", "phash")
  }

  /** Partition-wise audio fingerprinting over a typed media Dataset: parse
    * the WAV container ([[MediaCodecs.wavSamples]]) and fingerprint the
    * energy envelope. `(media_id, afp)`, NULL for payloads that are not
    * decodable PCM16 mono WAV. */
  def audioFingerprints(media: Dataset[MediaFile]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { f =>
        (f.media_id, MediaCodecs.wavSamples(f.content)
          .map { case (_, s) => MediaCodecs.audioFingerprint64(s) })
      }
    }.toDF("media_id", "afp")
  }

  /** Partition-wise per-frame perceptual hashing over a typed media
    * Dataset — the video pixel path: parse the AVI container
    * ([[MediaCodecs.aviFrames]]), dHash every frame's luma plane. Output
    * `(media_id, frame_no, phash)` in stream order; payloads with no
    * decodable uncompressed-AVI stream contribute ZERO rows (the
    * exploding analog of the NULL-hash rule — no partial fakes). This is
    * what graduates video near-dup from x31's compressed-byte blocks to
    * pixels: re-muxed/re-contained payloads hash identically per frame
    * (MultimodalSpec pins re-mux invariance) and feed the same 64-bit
    * Hamming band miner as image dHash and text SimHash. */
  def videoFrameHashes(media: Dataset[MediaFile]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { f =>
        MediaCodecs.aviFrames(f.content).toSeq.flatMap(_.zipWithIndex.map {
          case (r, i) => (f.media_id, i.toLong, MediaCodecs.dHash64(r))
        })
      }
    }.toDF("media_id", "frame_no", "phash")
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
