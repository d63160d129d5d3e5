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
    assert(got(0).width === None && got(0).height === None) // not a container
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
    assert((got(0).width, got(0).height) === (Some(800), Some(600)))
    assert((got(1).width, got(1).height) === (Some(120), Some(90)))
    // opaque payload: dimensions are UNKNOWN, not a plausible fake
    assert((got(2).width, got(2).height) === (None, None))
  }

  // A REAL, complete PNG: IHDR + one deflated IDAT + IEND, correct CRCs.
  private def fullPng(w: Int, h: Int, channels: Int,
                      scanlines: Array[Byte]): Array[Byte] = {
    val colorType = channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32
      val tb = typ.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      be32(data.length) ++ tb ++ data ++ be32(crc.getValue.toInt)
    }
    val d = new java.util.zip.Deflater()
    d.setInput(scanlines); d.finish()
    val buf = new Array[Byte](scanlines.length + 64)
    val m = d.deflate(buf); d.end()
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", be32(w) ++ be32(h) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0)) ++
      chunk("IDAT", buf.take(m)) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("pngPixels decodes exact pixels from a real deflated PNG") {
    // 2x2 RGB, filter 0 rows: red green / blue white
    val px = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
      .map(_.toByte)
    val scan = Array[Byte](0) ++ px.take(6) ++ Array[Byte](0) ++ px.drop(6)
    val png = fullPng(2, 2, 3, scan)
    val r = MediaCodecs.pngPixels(png).get
    assert((r.width, r.height, r.channels) === (2, 2, 3))
    assert(r.pixels.toSeq === px.toSeq)
    // the dimensions header parse agrees
    assert(MediaCodecs.imageDimensions(png) === Some((2, 2)))
    // decode() surfaces a pixel-derived feature: mean red = (255+0+0+255)/4/255
    import spark.implicits._
    val feats = extractFeatures(
      Seq(MediaFile(1L, "image", png, Map.empty)).toDS()).collect()
    assert(feats(0).feature(0) === (510.0 / 4 / 255).toFloat) // mean R = 0.5
    assert(feats(0).feature(6) === 1.0f)                      // max = 255
  }

  test("pngPixels rejects a stream inflating beyond the raster (decompression bomb)") {
    // zlib payload = the correct 2x2 gray scanlines PLUS surplus bytes: a
    // conforming stream inflates to exactly (stride+1)*height, so the first
    // surplus inflated byte must reject the payload — without looping
    // byte-by-byte through attacker-sized output
    val scan = Array[Byte](0, 10, 20, 0, 30, 40)
    assert(MediaCodecs.pngPixels(fullPng(2, 2, 1, scan)).isDefined)
    val bomb = fullPng(2, 2, 1, scan ++ Array.fill[Byte](100000)(0))
    assert(MediaCodecs.pngPixels(bomb) === None)
  }

  test("pngPixels unfilters Sub/Up/Average/Paeth scanlines") {
    // 2x2 gray: row0 Sub filter (deltas), row1 Up filter (deltas vs row0)
    val scan = Array[Byte](1, 10, 20, 2, 5, 5)
    val r = MediaCodecs.pngPixels(fullPng(2, 2, 1, scan)).get
    // Sub: 10, 10+20=30; Up: 10+5=15, 30+5=35
    assert(r.pixels.map(_ & 0xff).toSeq === Seq(10, 30, 15, 35))
    // Average (3) and Paeth (4) on a 1x3 RGB-free gray column
    val scan2 = Array[Byte](0, 100, 3, 10, 4, 200.toByte)
    val r2 = MediaCodecs.pngPixels(fullPng(1, 3, 1, scan2)).get
    // Average: 10 + (0+100)/2 = 60; Paeth(a=0,b=60,c=0)=60 → 200+60 mod 256 = 4
    assert(r2.pixels.map(_ & 0xff).toSeq === Seq(100, 60, 4))
  }

  test("pngPixels round-trips random rasters under every filter type") {
    // Property: for random pixel content, any per-row mix of the five PNG
    // filters encodes (filter forward, deflate) to a stream the decoder
    // inverts EXACTLY. Filtering forward here is an independent
    // reimplementation of the spec's equations, so a sign/order bug in the
    // decoder's unfilter cannot cancel out.
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 20) {
      val channels = Seq(1, 2, 3, 4)(rnd.nextInt(4))
      val w = 1 + rnd.nextInt(9)
      val h = 1 + rnd.nextInt(9)
      val stride = w * channels
      val px = Array.fill(stride * h)(rnd.nextInt(256).toByte)
      def p(y: Int, x: Int): Int =
        if (y < 0 || x < 0) 0 else px(y * stride + x) & 0xff
      val scan = new scala.collection.mutable.ArrayBuffer[Byte]
      for (y <- 0 until h) {
        val f = rnd.nextInt(5)
        scan += f.toByte
        for (x <- 0 until stride) {
          val a = p(y, x - channels); val b = p(y - 1, x); val c = p(y - 1, x - channels)
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) >> 1
            case 4 =>
              val q = a + b - c
              val pa = math.abs(q - a); val pb = math.abs(q - b); val pc = math.abs(q - c)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          }
          scan += ((p(y, x) - pred) & 0xff).toByte
        }
      }
      val r = MediaCodecs.pngPixels(fullPng(w, h, channels, scan.toArray))
      assert(r.isDefined, s"trial $trial ($w x $h x$channels) failed to decode")
      assert(r.get.pixels.toSeq === px.toSeq,
        s"trial $trial ($w x $h x$channels) pixels drifted")
    }
  }

  test("imageIoPixels decodes lossless formats exactly and agrees with pngPixels") {
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val colors = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000, 0x808080)
    for (y <- 0 until 2; x <- 0 until 3) img.setRGB(x, y, colors(y * 3 + x))
    // bmp/png round-trip exactly; gif goes through the JDK WRITER's palette
    // quantization, so only the decode contract (dims, total) is asserted
    for (fmt <- Seq("gif", "bmp", "png")) {
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, buf), s"no $fmt writer")
      val r = MediaCodecs.imageIoPixels(buf.toByteArray)
      assert(r.isDefined, s"$fmt failed to decode")
      assert((r.get.width, r.get.height) === (3, 2), fmt)
      if (fmt != "gif") {
        val got = r.get.pixels.grouped(r.get.channels)
          .map(c => ((c(0) & 0xff) << 16) | ((c(1) & 0xff) << 8) | (c(2) & 0xff)).toSeq
        assert(got === colors.toSeq, s"$fmt pixels drifted") // lossless formats
      }
    }
    // the two PNG decoders agree on a real deflated fixture
    val px = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val scan = Array[Byte](0) ++ px.take(6) ++ Array[Byte](0) ++ px.drop(6)
    val png = fullPng(2, 2, 3, scan)
    assert(MediaCodecs.imageIoPixels(png).map(_.pixels.toSeq) ===
      MediaCodecs.pngPixels(png).map(_.pixels.toSeq))
    assert(MediaCodecs.imageIoPixels("opaque".getBytes("UTF-8")) === None)
  }

  test("pngPixels is total on malformed input") {
    assert(MediaCodecs.pngPixels("nope".getBytes("UTF-8")) === None)
    assert(MediaCodecs.pngPixels(pngBytes(640, 480)) === None) // header only, no IDAT
    val good = fullPng(2, 2, 1, Array[Byte](0, 1, 2, 0, 3, 4))
    assert(MediaCodecs.pngPixels(good).isDefined)
    assert(MediaCodecs.pngPixels(good.dropRight(20)) === None) // truncated
    // corrupt the deflate stream: flip a byte inside IDAT
    val bad = good.clone
    bad(good.length - 20) = (bad(good.length - 20) ^ 0x5a).toByte
    assert(MediaCodecs.pngPixels(bad).isEmpty)
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

  test("pngEncode → pngPixels round-trips pixel-exactly for every channel count") {
    val rnd = new scala.util.Random(7)
    for (channels <- 1 to 4; (w, h) <- Seq((1, 1), (5, 3), (9, 8), (16, 16))) {
      val px = Array.fill(w * h * channels)(rnd.nextInt(256).toByte)
      val r = Raster(w, h, channels, px)
      val decoded = MediaCodecs.pngPixels(MediaCodecs.pngEncode(r))
      assert(decoded.isDefined, s"$w x $h x $channels did not decode")
      assert(decoded.get.width === w && decoded.get.height === h)
      assert(decoded.get.channels === channels)
      assert(decoded.get.pixels.toSeq === px.toSeq, s"$w x $h x $channels")
    }
  }

  test("dHash64 is invariant under re-encoding and format conversion") {
    val rnd = new scala.util.Random(11)
    val px = Array.fill(32 * 24 * 3)(rnd.nextInt(256).toByte)
    val r = Raster(32, 24, 3, px)
    val base = MediaCodecs.dHash64(r)
    // re-encode through our PNG writer: different byte stream (filter-0 +
    // fresh deflate), identical pixels, identical hash
    val png = MediaCodecs.pngEncode(r)
    assert(MediaCodecs.dHash64(MediaCodecs.pngPixels(png).get) === base)
    // format conversion through a REAL second codec (JDK BMP writer)
    val img = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) {
      val i = (y * 32 + x) * 3
      img.setRGB(x, y, ((px(i) & 0xff) << 16) | ((px(i + 1) & 0xff) << 8) | (px(i + 2) & 0xff))
    }
    val bmp = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bmp)
    val viaBmp = MediaCodecs.imageIoPixels(bmp.toByteArray).get
    assert(MediaCodecs.dHash64(viaBmp) === base, "BMP conversion changed the hash")
  }

  test("dHash64 is invariant under integer upscaling (2x nearest neighbor)") {
    val rnd = new scala.util.Random(13)
    val base = Array.fill(9 * 8)(rnd.nextInt(256).toByte)
    val up = new Array[Byte](18 * 16)
    for (y <- 0 until 16; x <- 0 until 18)
      up(y * 18 + x) = base((y / 2) * 9 + (x / 2))
    val h1 = MediaCodecs.dHash64(Raster(9, 8, 1, base))
    val h2 = MediaCodecs.dHash64(Raster(18, 16, 1, up))
    assert(h1 === h2, "2x-upscaled raster hashed differently")
  }

  test("wavEncode → wavSamples round-trips PCM16 samples exactly; parse is total") {
    val rnd = new scala.util.Random(19)
    for (n <- Seq(1, 2, 130, 1001)) {
      val s = Array.fill(n)(rnd.nextInt(65536).toShort)
      val parsed = MediaCodecs.wavSamples(MediaCodecs.wavEncode(s, 22050))
      assert(parsed.isDefined, s"n=$n did not parse")
      assert(parsed.get._1 === 22050)
      assert(parsed.get._2.toSeq === s.toSeq, s"n=$n samples differ")
    }
    // total on malformed / foreign payloads
    assert(MediaCodecs.wavSamples("RIFFxxxx".getBytes("US-ASCII")) === None)
    assert(MediaCodecs.wavSamples("not audio".getBytes("UTF-8")) === None)
    assert(MediaCodecs.wavSamples(
      MediaCodecs.wavEncode(Array[Short](1, 2, 3)).dropRight(2)) === None)
    // stereo / non-PCM rejected, not misparsed
    val stereo = MediaCodecs.wavEncode(Array[Short](1, 2, 3, 4))
    stereo(22) = 2 // channel count field
    assert(MediaCodecs.wavSamples(stereo) === None)
  }

  test("audioFingerprint64 is invariant under aligned resampling and uniform gain") {
    val rnd = new scala.util.Random(23)
    val base = Array.fill(130)((rnd.nextInt(2000) - 1000).toShort)
    val h = MediaCodecs.audioFingerprint64(base)
    // 2x sample-repeat (aligned: 260 = 65 windows x 4): envelope sums
    // double uniformly, strict comparisons unchanged
    val up = base.flatMap(s => Array(s, s))
    assert(MediaCodecs.audioFingerprint64(up) === h, "2x resample changed the fingerprint")
    // uniform gain: sums scale, signs of strict differences survive
    val louder = base.map(s => (s * 8).toShort)
    assert(MediaCodecs.audioFingerprint64(louder) === h, "gain changed the fingerprint")
    // an unrelated signal does not collide
    val other = Array.fill(130)((rnd.nextInt(2000) - 1000).toShort)
    assert(MediaCodecs.audioFingerprint64(other) !== h)
    assert(MediaCodecs.audioFingerprint64(Array.emptyShortArray) === 0L)
  }

  test("re-encoded audio pairs via the envelope where byte streams differ") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val base = Array.fill(130)((rnd.nextInt(2000) - 1000).toShort)
    // payload 2: 2x-resampled at a different sample rate — different
    // container bytes, same envelope fingerprint
    val p1 = MediaCodecs.wavEncode(base, 16000)
    val p2 = MediaCodecs.wavEncode(base.flatMap(s => Array(s, s)), 32000)
    val p3 = MediaCodecs.wavEncode(
      Array.fill(130)((rnd.nextInt(2000) - 1000).toShort), 16000)
    val media = Seq(MediaFile(1L, "audio", p1, Map.empty),
      MediaFile(2L, "audio", p2, Map.empty),
      MediaFile(3L, "audio", p3, Map.empty)).toDS()
    val pairs = Dedup.hammingNearDupPairsOf(
        audioFingerprints(media), "afp", hMax = 3, idCol = "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs === Seq((1L, 2L, 0L)))
  }

  test("hammingFlagger: frozen media index flags re-encodes; corpus-self == pair set; reload parity") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // corpus: 4 images, two of which (1, 2) are the same picture
    val pxA = Array.fill(9 * 8)(rnd.nextInt(256).toByte)
    val pxB = Array.fill(9 * 8)(rnd.nextInt(256).toByte)
    val corpus = Seq(
      MediaFile(1L, "image", MediaCodecs.pngEncode(Raster(9, 8, 1, pxA)), Map.empty),
      MediaFile(2L, "image", MediaCodecs.pngEncode(Raster(9, 8, 1, pxA)), Map.empty),
      MediaFile(3L, "image", MediaCodecs.pngEncode(Raster(9, 8, 1, pxB)), Map.empty),
      MediaFile(4L, "image", "not an image".getBytes("UTF-8"), Map.empty)).toDS()
    val sigs = perceptualHashes(corpus)
    val flag = Dedup.hammingFlagger(sigs, "phash", hMax = 3, idCol = "media_id")
    try {
      // corpus-self probe reproduces exactly the pair miner's membership
      val self = flag(sigs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val pairs = Dedup.hammingNearDupPairsOf(sigs, "phash", hMax = 3,
          idCol = "media_id")
        .collect().flatMap(r =>
          Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
      assert(self === pairs)
      assert(self.contains((1L, 2L)))
      // an arriving re-encode of pxA (2x upscale through the JDK writer)
      // flags against BOTH frozen copies; pxB's image does not flag it
      val img = new java.awt.image.BufferedImage(18, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 16; x <- 0 until 18)
        img.getRaster.setSample(x, y, 0, pxA((y / 2) * 9 + (x / 2)) & 0xff)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      val batch = perceptualHashes(
        Seq(MediaFile(10L, "image", buf.toByteArray, Map.empty)).toDS())
      val got = flag(batch).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((10L, 1L, 0L), (10L, 2L, 0L)))
      // save -> load -> identical probe results
      val dir = java.nio.file.Files.createTempDirectory("graft-phash-idx").toString
      try {
        Dedup.saveHammingIndex(sigs, "phash", dir, hMax = 3, idCol = "media_id")
        val re = Dedup.loadHammingFlagger(spark, dir, idCol = "media_id")
        try {
          val got2 = re(batch).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
          assert(got2 === got)
        } finally re.close()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    } finally flag.close()
  }

  test("re-encoded PNGs pair ONLY via pixels: dHash matches where byte fingerprints cannot") {
    import spark.implicits._
    implicit val ord = Ordering.Long
    val rnd = new scala.util.Random(17)
    // 18x16: an exact multiple of the 9x8 hash grid, so integer upscaling
    // preserves every cell average exactly
    val px = Array.fill(18 * 16)(rnd.nextInt(256).toByte)
    // payload 1: our filter-0 PNG at native size; payload 2: the SAME
    // image RESAMPLED to 2x and re-encoded through the JDK PNG writer — a
    // different resolution, different pixel array, and entirely different
    // compressed byte stream; payload 3: an unrelated raster
    val p1 = MediaCodecs.pngEncode(Raster(18, 16, 1, px))
    val img = new java.awt.image.BufferedImage(36, 32,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // raw raster samples, NOT setRGB: setRGB routes through an sRGB->gray
    // colorspace conversion that would alter the stored pixel values
    for (y <- 0 until 32; x <- 0 until 36)
      img.getRaster.setSample(x, y, 0, px((y / 2) * 18 + (x / 2)) & 0xff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val p2 = buf.toByteArray
    assert(!java.util.Arrays.equals(p1, p2), "re-encode produced identical bytes")
    val p3 = MediaCodecs.pngEncode(
      Raster(18, 16, 1, Array.fill(18 * 16)(rnd.nextInt(256).toByte)))
    // byte-level block fingerprints (the x31 shape) fall below its 0.2
    // Jaccard threshold: only the shared signature/IHDR header block can
    // collide — the pixel data streams are disjoint
    def blocks(b: Array[Byte]) = b.grouped(32).map(_.toSeq).toSet
    val (b1, b2) = (blocks(p1), blocks(p2))
    val jacc = (b1 intersect b2).size.toDouble / (b1 union b2).size
    assert(jacc < 0.2, s"re-encoded byte streams too similar: jacc $jacc")
    // pixel dHash pairs them at hamming 0, and only them
    val media = Seq(MediaFile(1L, "image", p1, Map.empty),
      MediaFile(2L, "image", p2, Map.empty),
      MediaFile(3L, "image", p3, Map.empty)).toDS()
    val sigs = perceptualHashes(media)
    val pairs = Dedup.hammingNearDupPairsOf(sigs, "phash", hMax = 3,
        idCol = "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs === Seq((1L, 2L, 0L)))
  }

  test("aviEncode → aviFrames round-trips RGB frames pixel-exactly") {
    val rnd = new scala.util.Random(17)
    for ((w, h, n) <- Seq((1, 1, 1), (5, 3, 2), (9, 8, 3), (16, 16, 4))) {
      val frames = (0 until n).map(_ =>
        Raster(w, h, 3, Array.fill(w * h * 3)(rnd.nextInt(256).toByte)))
      val got = MediaCodecs.aviFrames(MediaCodecs.aviEncode(frames))
      assert(got.isDefined, s"$w x $h x $n frames did not decode")
      assert(got.get.length === n)
      got.get.zip(frames).zipWithIndex.foreach { case ((d, o), i) =>
        assert(d.width === w && d.height === h && d.channels === 3)
        assert(d.pixels.toSeq === o.pixels.toSeq, s"$w x $h frame $i")
      }
      // gray frames survive as replicated-BGR with the SAME luma (Rec.601
      // of (v,v,v) is exactly v) — the dHash chain hashes the source luma
      val gray = Raster(9, 8, 1, Array.fill(72)(rnd.nextInt(256).toByte))
      val dec = MediaCodecs.aviFrames(MediaCodecs.aviEncode(Seq(gray))).get.head
      assert(MediaCodecs.lumaPlane(dec).toSeq ===
        MediaCodecs.lumaPlane(gray).toSeq)
      assert(MediaCodecs.dHash64(dec) === MediaCodecs.dHash64(gray))
    }
  }

  test("re-muxed AVIs: bytes differ, per-frame dHashes identical, miner pairs them") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val frames = (0 until 3).map(_ =>
      Raster(16, 12, 3, Array.fill(16 * 12 * 3)(rnd.nextInt(256).toByte)))
    val v1 = MediaCodecs.aviEncode(frames, fps = 10)
    // re-mux: decode and re-contain at a different frame rate — new
    // container bytes, identical frame pixels (what a lossless remux tool
    // does)
    val v2 = MediaCodecs.aviEncode(MediaCodecs.aviFrames(v1).get, fps = 25)
    assert(!java.util.Arrays.equals(v1, v2), "re-mux produced identical bytes")
    // an unrelated video shares no frame hash
    val v3 = MediaCodecs.aviEncode((0 until 3).map(_ =>
      Raster(16, 12, 3, Array.fill(16 * 12 * 3)(rnd.nextInt(256).toByte))))
    val media = Seq(MediaFile(1L, "video", v1, Map.empty),
      MediaFile(2L, "video", v2, Map.empty),
      MediaFile(3L, "video", v3, Map.empty),
      MediaFile(4L, "video", "not an avi".getBytes("UTF-8"), Map.empty)).toDS()
    val vh = videoFrameHashes(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // undecodable payload contributes zero rows, decodable ones a row per frame
    assert(vh.count(_._1 == 4L) === 0)
    assert(vh.count(_._1 == 1L) === 3)
    val byId = vh.groupBy(_._1).map { case (k, g) =>
      k -> g.sortBy(_._2).map(_._3).toSeq
    }
    assert(byId(1L) === byId(2L), "re-mux changed a frame hash")
    assert(byId(1L) !== byId(3L))
    // frame-0 signatures through the SAME 64-bit Hamming miner as
    // image dHash / text SimHash: the re-muxed twins pair at hamming 0
    val sigs = videoFrameHashes(media).filter(col("frame_no") === 0L)
      .select(col("media_id"), col("phash"))
    val pairs = Dedup.hammingNearDupPairsOf(sigs, "phash", hMax = 3,
        idCol = "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs === Seq((1L, 2L, 0L)))
  }

  test("audioInfo parses real WAV/MP3/FLAC headers exactly, no sample decode") {
    // WAV: duration from data bytes / block align at the fmt rate
    val wav = MediaCodecs.wavEncode(new Array[Short](16000), 16000)
    assert(MediaCodecs.audioInfo(wav) === Some(("wav", 16000, 1000L)))
    // MP3: Layer III frame-header walk — 38 frames of 1152 samples at
    // 44100 Hz = floor(38*1152*1000/44100) ms
    val mp3 = MediaCodecs.mp3Encode(38, sampleRate = 44100, bitrateKbps = 128)
    assert(MediaCodecs.audioInfo(mp3) ===
      Some(("mp3", 44100, 38L * 1152 * 1000 / 44100)))
    // an ID3v2 prefix (syncsafe size) and a trailing ID3v1 TAG block are
    // skipped, not misparsed
    val id3v2 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 10) ++
      new Array[Byte](10)
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ new Array[Byte](125)
    assert(MediaCodecs.audioInfo(id3v2 ++ mp3 ++ id3v1) ===
      Some(("mp3", 44100, 38L * 1152 * 1000 / 44100)))
    // FLAC: STREAMINFO sample rate (20 bits) + total samples (36 bits)
    val flac = MediaCodecs.flacEncode(48000, 96000L)
    assert(MediaCodecs.audioInfo(flac) === Some(("flac", 48000, 2000L)))
    // 36-bit total samples survive (> 2^32)
    assert(MediaCodecs.audioInfo(MediaCodecs.flacEncode(8000, 1L << 33)) ===
      Some(("flac", 8000, (1L << 33) * 1000 / 8000)))
  }

  test("audioInfo is total on malformed input") {
    val rnd = new scala.util.Random(29)
    assert(MediaCodecs.audioInfo("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(MediaCodecs.audioInfo(Array.fill(64)(rnd.nextInt(256).toByte)).isEmpty)
    // truncated containers refuse rather than guess
    val mp3 = MediaCodecs.mp3Encode(3)
    assert(MediaCodecs.audioInfo(mp3.take(mp3.length - 10)).isEmpty)
    assert(MediaCodecs.audioInfo(MediaCodecs.flacEncode(48000, 100).take(20)).isEmpty)
    // embedded garbage after valid MP3 frames means "not an MP3"
    assert(MediaCodecs.audioInfo(mp3 ++ "x".getBytes("UTF-8")).isEmpty)
    // a Layer I/II stream is not an MP3 duration source: flip layer bits
    val l2 = mp3.clone(); l2(1) = 0xfd.toByte
    assert(MediaCodecs.audioInfo(l2).isEmpty)
    // an AVI (also RIFF) is not audio
    assert(MediaCodecs.audioInfo(MediaCodecs.aviEncode(Seq(
      Raster(2, 2, 3, new Array[Byte](12))))).isEmpty)
  }

  test("extractFeatures surfaces header-parsed audio info, null for non-audio") {
    import spark.implicits._
    val media = Seq(
      MediaFile(1L, "audio", MediaCodecs.wavEncode(new Array[Short](8000), 8000), Map.empty),
      MediaFile(2L, "audio", MediaCodecs.mp3Encode(10), Map.empty),
      MediaFile(3L, "audio", MediaCodecs.flacEncode(44100, 44100L), Map.empty),
      MediaFile(4L, "image", "plain text payload".getBytes("UTF-8"), Map.empty))
      .toDS()
    val got = extractFeatures(media).collect().sortBy(_.media_id)
    assert(got(0).sample_rate === Some(8000) && got(0).duration_ms === Some(1000L))
    assert(got(1).sample_rate === Some(44100) &&
      got(1).duration_ms === Some(10L * 1152 * 1000 / 44100))
    assert(got(2).sample_rate === Some(44100) && got(2).duration_ms === Some(1000L))
    assert(got(3).sample_rate === None && got(3).duration_ms === None)
  }

  test("videoInfo reads the avih header exactly without touching frames") {
    val rnd = new scala.util.Random(31)
    val frames = (0 until 7).map(_ =>
      Raster(6, 4, 3, Array.fill(72)(rnd.nextInt(256).toByte)))
    val avi = MediaCodecs.aviEncode(frames, fps = 8)
    // duration = frames * floor(1e6/fps) / 1000 ms — two integer floors
    assert(MediaCodecs.videoInfo(avi) ===
      Some((6, 4, 7, 7L * (1000000 / 8) / 1000)))
    // header-only: truncating the payload AFTER hdrl still parses (a
    // compressed or partially-fetched stream keeps its info), while
    // aviFrames (which needs movi) refuses the same bytes
    val hdrlEnd = 12 + 8 + java.nio.ByteBuffer.wrap(avi)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(16)
    val headerOnly = avi.take(hdrlEnd)
    assert(MediaCodecs.videoInfo(headerOnly) === MediaCodecs.videoInfo(avi))
    assert(MediaCodecs.aviFrames(headerOnly).isEmpty)
    // totality: not-RIFF, RIFF-but-WAV, truncated-before-avih
    assert(MediaCodecs.videoInfo("zzzz".getBytes("UTF-8") ++ avi.drop(4)).isEmpty)
    assert(MediaCodecs.videoInfo(
      MediaCodecs.wavEncode(Array.fill(10)(3.toShort))).isEmpty)
    assert(MediaCodecs.videoInfo(avi.take(16)).isEmpty)
    // the features row surfaces the header fields for a decodable AVI
    import spark.implicits._
    val got = extractFeatures(Seq(
      MediaFile(1L, "video", avi, Map.empty)).toDS()).collect()(0)
    assert(got.width === Some(6) && got.height === Some(4))
    assert(got.n_frames === 7)
    assert(got.duration_ms === Some(7L * (1000000 / 8) / 1000))
    assert(got.sample_rate === None)
  }

  test("mp4 header info: both mvhd versions, largesize, totality") {
    def find(b: Array[Byte], fourcc: String): Int = {
      val pat = fourcc.getBytes("US-ASCII")
      b.indices.find(i => i + 4 <= b.length &&
        pat.indices.forall(k => b(i + k) == pat(k))).get
    }
    // version 0: all four fields recovered exactly, duration floored
    val v0 = MediaCodecs.mp4Encode(w = 320, h = 180, nFrames = 9,
      timescale = 600, durationUnits = 1234L, version = 0)
    assert(MediaCodecs.videoInfo(v0) ===
      Some((320, 180, 9, 1234L * 1000 / 600)))
    // version 1: the 64-bit time-field layout parses to the same answer
    val v1 = MediaCodecs.mp4Encode(w = 320, h = 180, nFrames = 9,
      timescale = 600, durationUnits = 1234L, version = 1)
    assert(MediaCodecs.videoInfo(v1) === MediaCodecs.videoInfo(v0))
    // 64-bit largesize header on moov: same answer (real muxers use
    // largesize for >4 GiB boxes; the parser must not assume size32)
    val moovAt = find(v0, "moov") - 4
    val be = java.nio.ByteBuffer.wrap(v0)
    val moovSize = be.getInt(moovAt)
    val large = v0.take(moovAt) ++
      Array[Byte](0, 0, 0, 1) ++ "moov".getBytes("US-ASCII") ++
      java.nio.ByteBuffer.allocate(8).putLong(moovSize + 8L).array() ++
      v0.slice(moovAt + 8, v0.length)
    assert(MediaCodecs.videoInfo(large) === MediaCodecs.videoInfo(v0))
    // stsz knocked out → sample count falls back to the stts entry sum
    val noStsz = v0.clone()
    val stszAt = find(noStsz, "stsz")
    "free".getBytes("US-ASCII").zipWithIndex
      .foreach { case (c, k) => noStsz(stszAt + k) = c }
    assert(MediaCodecs.videoInfo(noStsz) === MediaCodecs.videoInfo(v0))
    // totality: truncation inside moov, truncation to nothing, not-ftyp
    assert(MediaCodecs.videoInfo(v0.take(v0.length - 5)).isEmpty)
    assert(MediaCodecs.videoInfo(v0.take(10)).isEmpty)
    assert(MediaCodecs.videoInfo("zzzz".getBytes ++ v0.drop(4)).isEmpty)
    // the spec's unknown-duration sentinel (v0 all-ones) → None, never
    // a fake duration
    val unk = v0.clone()
    val mvhdAt = find(unk, "mvhd")
    for (k <- 0 until 4) unk(mvhdAt + 4 + 16 + k) = 0xff.toByte
    assert(MediaCodecs.videoInfo(unk).isEmpty)
    // the features row surfaces the MP4 header fields
    import spark.implicits._
    val got = extractFeatures(Seq(
      MediaFile(1L, "video", v1, Map.empty)).toDS()).collect()(0)
    assert(got.width === Some(320) && got.height === Some(180))
    assert(got.n_frames === 9)
    assert(got.duration_ms === Some(1234L * 1000 / 600))
    assert(got.sample_rate === None)
  }

  test("aviFrames is total on malformed input") {
    val rnd = new scala.util.Random(23)
    val good = MediaCodecs.aviEncode(Seq(
      Raster(5, 4, 3, Array.fill(60)(rnd.nextInt(256).toByte))))
    assert(MediaCodecs.aviFrames(good).isDefined)
    // truncation anywhere → None, never a partial decode
    for (cut <- Seq(4, 11, 30, good.length / 2, good.length - 3))
      assert(MediaCodecs.aviFrames(good.take(cut)).isEmpty, s"cut at $cut")
    // a RIFF that is not AVI (our own WAV) → None
    assert(MediaCodecs.aviFrames(
      MediaCodecs.wavEncode(Array.fill(100)(7.toShort))).isEmpty)
    // random bytes → None
    assert(MediaCodecs.aviFrames(Array.fill(200)(rnd.nextInt(256).toByte)).isEmpty)
    // a compressed frame chunk (size != stride*h) poisons the parse: flip
    // the movi frame chunk id to 00dc and shrink it — still None, and the
    // original stays decodable
    val bad = good.clone()
    // find the '00db' fourcc and corrupt its declared length
    val idx = bad.indices.find(i => i + 4 <= bad.length &&
      new String(bad, i, 4, "US-ASCII") == "00db").get
    bad(idx + 4) = (bad(idx + 4) ^ 0x01).toByte
    assert(MediaCodecs.aviFrames(bad).isEmpty)
  }

  test("jpegEncodeGray round-trips block-flat planes pixel-exactly through the ImageIO bridge") {
    val rnd = new scala.util.Random(23)
    // block-flat 72x64: each 8x8 JPEG block one value -> DC-only blocks,
    // all-ones quant tables at quality 1.0, flat chroma => lossless
    val block = Array.fill(8, 9)(rnd.nextInt(256))
    val px = new Array[Byte](72 * 64)
    for (y <- 0 until 64; x <- 0 until 72)
      px(y * 72 + x) = block(y / 8)(x / 8).toByte
    val jpeg = MediaCodecs.jpegEncodeGray(72, 64, px)
    // it IS a JPEG (SOI marker) and the header parse sees the dims
    assert((jpeg(0) & 0xff) === 0xff && (jpeg(1) & 0xff) === 0xd8)
    assert(MediaCodecs.imageDimensions(jpeg) === Some((72, 64)))
    val r = MediaCodecs.imageIoPixels(jpeg).get
    assert(r.width === 72 && r.height === 64 && r.channels === 3)
    for (y <- 0 until 64; x <- 0 until 72; c <- 0 until 3)
      assert((r.pixels((y * 72 + x) * 3 + c) & 0xff) === block(y / 8)(x / 8),
        s"pixel ($x,$y,$c)")
    // dHash through the codec equals dHash of the raw plane: the 9x8 box
    // average samples each flat block whole
    assert(MediaCodecs.dHash64(r) ===
      MediaCodecs.dHash64(Raster(72, 64, 1, px)))
    // general (non-flat) images are lossy, and the codec says so: decoded
    // bytes differ, no silent exactness claim outside the flat class
    val noisy = Array.fill(72 * 64)(rnd.nextInt(256).toByte)
    val back = MediaCodecs.imageIoPixels(
      MediaCodecs.jpegEncodeGray(72, 64, noisy)).get
    val exact = (0 until 72 * 64).forall(i =>
      (back.pixels(i * 3) & 0xff) === (noisy(i) & 0xff))
    assert(!exact, "random-noise JPEG round trip cannot be lossless")
  }
}
