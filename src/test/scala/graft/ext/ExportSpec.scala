package graft.ext

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** The export sink's loader contract: shard directories, a manifest whose
  * counts come from the written files, and partition-pruned shard reads. */
class ExportSpec extends SparkSpec {

  test("writeShards lays out shard directories with a complete manifest") {
    val curated = SparkEntry.queries("x73_curation_pipeline")(
      spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    try {
      val counts = Export.writeShards(curated, dir)
      // manifest counts equal the curated row count, shard by shard
      val want = curated.groupBy(col("shard")).agg(count(lit(1)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts === want)
      // directory layout is shard=N partitions
      val parts = new java.io.File(dir).listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard=")).sorted
      assert(parts.nonEmpty)
      assert(parts.toSet === want.keySet.map(s => s"shard=$s"))
      // the manifest file parses and totals correctly
      val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_graft_manifest.json")), "UTF-8")
      assert(manifest.contains(s""""total": ${want.values.sum}"""))
      // the manifest round-trips through the loader-side reader
      assert(Export.readManifest(spark, dir) === want)
      // a shard-selective read prunes to those partitions
      val two = want.keySet.toSeq.sorted.take(2)
      val probe = Export.readShards(spark, dir, two)
      val scan = probe.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString("\n")
      val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
      assert(partFilters.contains("shard"), s"no partition pruning:\n$scan")
      assert(probe.count() === two.map(want).sum)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("validateShards passes a healthy export and fails a truncated shard file") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"doc $i", i % 4)).toDF("doc_id", "text", "shard")
    val dir = java.nio.file.Files.createTempDirectory("graft-export-val").toString
    try {
      val counts = Export.writeShards(df, dir)
      // healthy export: validation returns the manifest counts
      assert(Export.validateShards(spark, dir) === counts)
      // truncate one shard's data file: row counts in the manifest still
      // "match" (they were recorded at write time), but the byte integrity
      // check must refuse the export up front
      val part = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
        .head.listFiles()
        .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
        .head
      val bytes = java.nio.file.Files.readAllBytes(part.toPath)
      java.nio.file.Files.write(part.toPath, bytes.dropRight(bytes.length / 2))
      // drop the local-FS checksum so the length change is what's observed
      val crc = new java.io.File(part.getParent, s".${part.getName}.crc")
      if (crc.exists()) crc.delete()
      val e = intercept[IllegalArgumentException](Export.validateShards(spark, dir))
      assert(e.getMessage.contains("bytes"))
      // a missing data file fails on the file count
      java.nio.file.Files.delete(part.toPath)
      val e2 = intercept[IllegalArgumentException](Export.validateShards(spark, dir))
      assert(e2.getMessage.contains("files") || e2.getMessage.contains("data files"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  /** Write `df` sharded under a temp dir with parquet compression OFF, so a
    * known row literal is findable verbatim in the file bytes (its FIRST
    * occurrence is the dictionary/data page copy; its LAST is the footer
    * statistics copy — data pages always precede column indexes and the
    * footer). Returns (dir, the one shard data file containing the literal,
    * its bytes, first index, last index). */
  private def writeForFlip(df: org.apache.spark.sql.DataFrame, literal: String)
      : (String, java.io.File, Array[Byte], Int, Int) = {
    val key = "spark.sql.parquet.compression.codec"
    val prior = spark.conf.get(key)
    val dir = java.nio.file.Files.createTempDirectory("graft-export-flip").toString
    spark.conf.set(key, "uncompressed")
    try Export.writeShards(df, dir)
    finally spark.conf.set(key, prior)
    val needle = literal.getBytes("UTF-8")
    def indexOf(hay: Array[Byte], from: Int): Int =
      (from to hay.length - needle.length).find(i =>
        needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).sortBy(_.getName)
      .head.listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .head
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    val first = indexOf(bytes, 0)
    assert(first >= 0, s"literal '$literal' not found in uncompressed parquet")
    var last = first
    var next = indexOf(bytes, last + 1)
    while (next >= 0) { last = next; next = indexOf(bytes, last + 1) }
    (dir, part, bytes, first, last)
  }

  private def flipAt(part: java.io.File, bytes: Array[Byte], at: Int): Unit = {
    val out = bytes.clone()
    out(at) = (out(at) ^ 0x5a).toByte
    java.nio.file.Files.write(part.toPath, out)
    val crc = new java.io.File(part.getParent, s".${part.getName}.crc")
    if (crc.exists()) crc.delete()
  }

  test("validateShardsContent catches a same-length data-page byte-flip validateShards cannot") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"document number $i padded", i % 4))
      .toDF("doc_id", "text", "shard")
    // flip a byte INSIDE a located row literal's first (data/dictionary
    // page) occurrence — deterministically decode-relevant, unlike a
    // length/2 guess that can land in stats/padding
    val (dir, part, bytes, first, _) = writeForFlip(df, "document number ")
    try {
      val counts = Export.readManifest(spark, dir)
      assert(Export.validateShards(spark, dir) === counts)
      assert(Export.validateShardsContent(spark, dir) === counts)
      flipAt(part, bytes, first + 3)
      // the listing-only gate is blind to it (same length, same file count)...
      assert(Export.validateShards(spark, dir) === counts)
      // ...the content-digest recount refuses: the flipped byte changes a
      // decoded string, so the shard's (xor, sum) digest moves
      val e = intercept[IllegalArgumentException](
        Export.validateShardsContent(spark, dir))
      assert(e.getMessage.contains("content digest"), e.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("validateShardsContent catches a statistics-region flip via the file checksum") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"document number $i padded", i % 4))
      .toDF("doc_id", "text", "shard")
    // the literal's LAST occurrence is the footer/column-index statistics
    // copy — bytes parquet decoding never touches, so the row-digest
    // recount passes and only the raw-byte xxhash64 can refuse
    val (dir, part, bytes, first, last) = writeForFlip(df, "document number ")
    try {
      assert(last > first, "no statistics copy of the literal found")
      val counts = Export.readManifest(spark, dir)
      flipAt(part, bytes, last + 3)
      assert(Export.validateShards(spark, dir) === counts)
      val e = intercept[IllegalArgumentException](
        Export.validateShardsContent(spark, dir))
      assert(e.getMessage.contains("checksum"), e.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("validateShardsContent degrades to digest-only on a pre-filehash manifest") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"document number $i padded", i % 4))
      .toDF("doc_id", "text", "shard")
    val (dir, part, bytes, first, _) = writeForFlip(df, "document number ")
    try {
      val counts = Export.readManifest(spark, dir)
      // simulate an export written before the filehash field existed
      val mf = java.nio.file.Paths.get(dir, "_graft_manifest.json")
      val json = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
      val stripped = json.replaceAll(""""filehash": \{[^}]*\}, """, "")
      assert(stripped != json, "manifest surgery failed to remove filehash")
      java.nio.file.Files.write(mf, stripped.getBytes("UTF-8"))
      val mfCrc = new java.io.File(dir, "._graft_manifest.json.crc")
      if (mfCrc.exists()) mfCrc.delete()
      // healthy old export still passes full content validation (digest
      // pass runs; checksum pass is skipped with a warning, not a refusal)
      assert(Export.validateShardsContent(spark, dir) === counts)
      // and the digest pass is still live: a data-page flip is caught
      flipAt(part, bytes, first + 3)
      val e = intercept[IllegalArgumentException](
        Export.validateShardsContent(spark, dir))
      assert(e.getMessage.contains("content digest"), e.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("jsonl export round-trips under validation and refuses a flipped gz byte") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, s"line doc $i\nsecond line", i % 4))
    val df = rows.toDF("doc_id", "text", "shard")
    val dir = java.nio.file.Files.createTempDirectory("graft-export-jsonl").toString
    try {
      val counts = Export.writeJsonlShards(df, dir)
      assert(counts.values.sum === 200L)
      // layout: shard=N dirs holding gzip line-JSON data files
      val parts = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      assert(parts.map(_.getName).sorted === Array("shard=0", "shard=1", "shard=2", "shard=3"))
      val dataFiles = parts.flatMap(_.listFiles().filter(f =>
        f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_")))
      assert(dataFiles.nonEmpty && dataFiles.forall(_.getName.endsWith(".json.gz")))
      // manifest records the jsonl format + schema, and BOTH loader gates
      // (listing-only and deep content) pass on the healthy export
      val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_graft_manifest.json")), "UTF-8")
      assert(manifest.contains(""""format": "jsonl""""))
      assert(manifest.contains(""""schema":"""))
      assert(Export.validateShards(spark, dir) === counts)
      assert(Export.validateShardsContent(spark, dir) === counts)
      // read-back under the recorded schema equals the input, values and
      // types (shard partition column reads back long; embedded newlines
      // survive the line-JSON escaping)
      val back = Export.readJsonlShards(spark, dir)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
          r.getAs[Long]("shard"))).toSet
      assert(back === rows.toSet)
      // shard-selective read prunes to the named directory
      assert(Export.readJsonlShards(spark, dir, Seq(1L)).count() === counts(1L))
      // flip one byte inside a gzip member: same file length, so the
      // listing-only gate stays blind — the content gate must refuse
      // (gzip/digest/checksum, whichever layer sees it first is loud)
      val victim = dataFiles.maxBy(_.length)
      val bytes = java.nio.file.Files.readAllBytes(victim.toPath)
      bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x10).toByte
      java.nio.file.Files.write(victim.toPath, bytes)
      assert(Export.validateShards(spark, dir) === counts)
      intercept[Exception](Export.validateShardsContent(spark, dir))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("tar export round-trips samples with binary members under validation") {
    import spark.implicits._
    val rows = Seq(
      (1L, "k001", "hello world", Array[Byte](1, 2, 3), 0L),
      (2L, "k002", "second doc", null.asInstanceOf[Array[Byte]], 0L),
      (3L, "k003", null.asInstanceOf[String], Array.emptyByteArray, 1L),
      (4L, "k004", "fourth", Array[Byte](-1, 0, 5), 1L))
    val df = rows.toDF("doc_id", "key", "text", "payload", "shard")
    val dir = java.nio.file.Files.createTempDirectory("graft-export-tar").toString
    try {
      val counts = Export.writeTarShards(df, dir)
      assert(counts === Map(0L -> 2L, 1L -> 2L))
      // layout: one archive per shard, key-sorted members
      val parts = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      assert(parts.map(_.getName).sorted === Array("shard=0", "shard=1"))
      parts.foreach { p =>
        assert(p.listFiles().filter(f => f.isFile &&
          !f.getName.startsWith(".") && !f.getName.startsWith("_"))
          .map(_.getName).toSeq === Seq("part-00000.tar"))
      }
      val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_graft_manifest.json")), "UTF-8")
      assert(manifest.contains(""""format": "tar""""))
      assert(manifest.contains(""""bincols": ["payload"]"""))
      assert(Export.validateShards(spark, dir) === counts)
      assert(Export.validateShardsContent(spark, dir) === counts)
      // read-back: null string (json member omits it), null binary (no
      // member), and EMPTY binary (zero-size member ≠ null) all survive
      val back = Export.readTarShards(spark, dir)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("key"),
          r.getAs[String]("text"),
          Option(r.getAs[Array[Byte]]("payload")).map(_.toSeq).orNull,
          r.getAs[Long]("shard"))).toSet
      assert(back === rows.map(t => (t._1, t._2, t._3,
        Option(t._4).map(_.toSeq).orNull, t._5)).toSet)
      val k3 = Export.readTarShards(spark, dir)
        .filter(col("key") === "k003").collect().head
      assert(k3.getAs[Array[Byte]]("payload").length === 0) // empty, not null
      // shard-selective read prunes at the archive list
      assert(Export.readTarShards(spark, dir, Seq(1L)).count() === 2L)
      // a flipped byte inside an archive is caught by the deep gate
      val victim = parts.head.listFiles().filter(_.getName.endsWith(".tar")).head
      val bytes = java.nio.file.Files.readAllBytes(victim.toPath)
      // flip inside a payload region (past the first 512-byte header)
      bytes(520) = (bytes(520) ^ 0x10).toByte
      java.nio.file.Files.write(victim.toPath, bytes)
      intercept[Exception](Export.validateShardsContent(spark, dir))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("tar export writes gzip archives and refuses bad keys and dup keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-export-targz").toString
    try {
      val ok = Seq((1L, "a1", 0L), (2L, "a2", 0L)).toDF("doc_id", "key", "shard")
      val counts = Export.writeTarShards(ok, dir, compression = "gzip")
      assert(counts === Map(0L -> 2L))
      val files = new java.io.File(dir, "shard=0").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("."))
      assert(files.map(_.getName).toSeq === Seq("part-00000.tar.gz"))
      assert(Export.validateShardsContent(spark, dir) === counts)
      assert(Export.readTarShards(spark, dir).count() === 2L)
      // a dotted key would split wrongly at read (WebDataset key = up to
      // the first dot) — refused at write, as is a duplicate key in-shard
      intercept[Exception](Export.writeTarShards(
        Seq((1L, "bad.key", 0L)).toDF("doc_id", "key", "shard"), dir + "-bad"))
      intercept[Exception](Export.writeTarShards(
        Seq((1L, "dup", 0L), (2L, "dup", 0L)).toDF("doc_id", "key", "shard"),
        dir + "-dup"))
      // a binary column named 'json' collides with the sample JSON member
      intercept[Exception](Export.writeTarShards(
        Seq((1L, "k", Array[Byte](1), 0L)).toDF("doc_id", "key", "json", "shard"),
        dir + "-col"))
    } finally {
      Seq("", "-bad", "-dup", "-col").foreach { sfx =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir + sfx))
      }
    }
  }

  test("tar export writes zstd archives that validate, read back, and " +
    "refuse a flipped byte") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-export-tarzst").toString
    try {
      import org.apache.spark.sql.Row
      val rows = Seq(
        (1L, "z1", "alpha", Array[Byte](9, 8, 7), 0L),
        (2L, "z2", "beta", null.asInstanceOf[Array[Byte]], 0L),
        (3L, "z3", "gamma", Array[Byte](0, 1), 1L))
      val df = rows.toDF("doc_id", "key", "text", "payload", "shard")
      val counts = Export.writeTarShards(df, dir, compression = "zstd")
      assert(counts === Map(0L -> 2L, 1L -> 1L))
      val files = new java.io.File(dir, "shard=0").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("."))
      assert(files.map(_.getName).toSeq === Seq("part-00000.tar.zst"))
      // the archive really is zstd (magic 0xFD2FB528 little-endian)
      val head = java.nio.file.Files.readAllBytes(files.head.toPath).take(4)
      assert(head.toSeq === Seq(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte))
      assert(Export.validateShardsContent(spark, dir) === counts)
      val back = Export.readTarShards(spark, dir)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
          Option(r.getAs[Array[Byte]]("payload")).map(_.toSeq).orNull)).toSet
      assert(back === rows.map(t => (t._1, t._3,
        Option(t._4).map(_.toSeq).orNull)).toSet)
      // a flipped byte inside the compressed stream fails the deep gate
      // (either the zstd frame checksum or the recounted digest/filehash)
      val victim = new java.io.File(dir, "shard=1").listFiles()
        .filter(_.getName.endsWith(".tar.zst")).head
      val bytes = java.nio.file.Files.readAllBytes(victim.toPath)
      bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x10).toByte
      java.nio.file.Files.write(victim.toPath, bytes)
      intercept[Exception](Export.validateShardsContent(spark, dir))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("tar reads prune at the member level: payloads skipped, json " +
    "unparsed when unrequested") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-export-tarpr").toString
    try {
      val rows = Seq(
        (1L, "p1", "alpha", Array[Byte](1, 2, 3), Array[Byte](9), 0L),
        (2L, "p2", "beta", null.asInstanceOf[Array[Byte]], Array[Byte](8), 0L))
      val df = rows.toDF("doc_id", "key", "text", "img", "aud", "shard")
      Export.writeTarShards(df, dir)
      // metadata-only scan: no binary member is ever allocated
      val meta = Export.readTarShards(spark, dir,
        columns = Seq("doc_id", "text"))
      assert(meta.columns.toSeq === Seq("key", "doc_id", "text", "shard"))
      assert(meta.collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet ===
        Set((1L, "alpha"), (2L, "beta")))
      // one payload requested: the OTHER payload is skipped, json unparsed
      val one = Export.readTarShards(spark, dir, columns = Seq("aud"))
      assert(one.columns.toSeq === Seq("key", "aud", "shard"))
      assert(one.collect().map(r =>
        r.getAs[Array[Byte]]("aud").toSeq).toSet ===
        Set(Seq[Byte](9), Seq[Byte](8)))
      // key/shard-only scan decodes nothing at all
      assert(Export.readTarShards(spark, dir, columns = Seq("key"))
        .collect().map(_.getString(0)).toSet === Set("p1", "p2"))
      // an unknown column refuses up front
      val e = intercept[IllegalArgumentException](
        Export.readTarShards(spark, dir, columns = Seq("nope")).collect())
      assert(e.getMessage.contains("unknown columns"))
      // pruning works through COMPRESSED streams too (skip() on gzip and
      // zstd discards decompressed bytes; short-skip fallback covered)
      for (comp <- Seq("gzip", "zstd")) {
        val cd = s"$dir-$comp"
        Export.writeTarShards(df, cd, compression = comp)
        val m = Export.readTarShards(spark, cd, columns = Seq("doc_id"))
          .collect().map(r => r.getAs[Long]("doc_id")).toSet
        assert(m === Set(1L, 2L), s"pruned $comp read lost rows")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cd))
      }
      // and the unpruned read still returns everything (null img survives)
      val full = Export.readTarShards(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_id"),
          Option(r.getAs[Array[Byte]]("img")).map(_.toSeq).orNull)).toMap
      assert(full(1L) === Seq[Byte](1, 2, 3) && full(2L) === null)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("maskedCrc32c matches the public TFRecord framing spec on the " +
    "canonical CRC32C vector") {
    // CRC32C("123456789") = 0xE3069283 is THE published Castagnoli check
    // value; the TFRecord mask of it is 0xC78AB0E5. Passing pins both that
    // the JDK CRC32C is the right polynomial and that the rotate-and-add
    // mask is implemented per the spec.
    val v = "123456789".getBytes("US-ASCII")
    val c = new java.util.zip.CRC32C(); c.update(v, 0, v.length)
    assert(c.getValue === 0xE3069283L)
    assert(Export.maskedCrc32c(v, 0, v.length) === 0xC78AB0E5.toInt)
  }

  test("tfrecord export round-trips every supported type under validation") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-export-tfr").toString
    try {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, txt STRING, payload BINARY, n INT, sm SMALLINT, " +
          "tb TINYINT, flag BOOLEAN, score FLOAT, emb ARRAY<FLOAT>, " +
          "ids ARRAY<BIGINT>, small_ids ARRAY<INT>")
      import org.apache.spark.sql.Row
      val rows = Seq(
        Row(1L, "hello", Array[Byte](1, 2), 7, 3.toShort, 2.toByte, true,
          1.5f, Seq(0.25f, -2.0f), Seq(10L, -11L), Seq(4, 5)),
        Row(-2L, null, null, null, null, null, false,
          null, Seq.empty[Float], null, Seq.empty[Int]),
        Row(3L, "", Array.emptyByteArray, -1, (-3).toShort, (-2).toByte,
          null, -0.0f, null, Seq(Long.MinValue, Long.MaxValue), Seq(0)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          Row.fromSeq(r.toSeq :+ (math.abs(r.getLong(0)) % 2)))),
        schema.add("shard", org.apache.spark.sql.types.LongType))
      val counts = Export.writeTfrecordShards(df, dir)
      assert(counts === Map(0L -> 1L, 1L -> 2L))
      assert(Export.validateShards(spark, dir) === counts)
      assert(Export.validateShardsContent(spark, dir) === counts)
      val back = Export.readTfrecordShards(spark, dir)
      assert(back.schema("score").dataType ===
        org.apache.spark.sql.types.FloatType)
      val by = back.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(by(1L).getAs[String]("txt") === "hello")
      assert(by(1L).getAs[Array[Byte]]("payload").toSeq === Seq[Byte](1, 2))
      assert(by(1L).getAs[Boolean]("flag") === true)
      assert(by(1L).getAs[Float]("score") === 1.5f)
      assert(by(1L).getAs[Seq[Float]]("emb") === Seq(0.25f, -2.0f))
      assert(by(1L).getAs[Seq[Long]]("ids") === Seq(10L, -11L))
      assert(by(1L).getAs[Seq[Int]]("small_ids") === Seq(4, 5))
      // null scalar/binary/array all read back null; EMPTY array ≠ null
      assert(by(-2L).getAs[String]("txt") === null)
      assert(by(-2L).getAs[Array[Byte]]("payload") === null)
      assert(by(-2L).isNullAt(by(-2L).fieldIndex("n")))
      assert(by(-2L).getAs[Seq[Float]]("emb") === Seq.empty[Float])
      assert(by(-2L).getAs[Seq[Long]]("ids") === null)
      assert(by(-2L).getAs[Seq[Int]]("small_ids") === Seq.empty[Int])
      // empty string and empty binary are present, not null
      assert(by(3L).getAs[String]("txt") === "")
      assert(by(3L).getAs[Array[Byte]]("payload").length === 0)
      // 10-byte-varint extremes survive
      assert(by(3L).getAs[Seq[Long]]("ids") ===
        Seq(Long.MinValue, Long.MaxValue))
      // shard-selective read prunes at the file list
      assert(Export.readTfrecordShards(spark, dir, Seq(1L)).count() === 2L)
      // a flipped payload byte is caught by the record CRC on the deep gate
      val victim = new java.io.File(dir, "shard=1").listFiles()
        .filter(_.getName.endsWith(".tfrecord")).head
      val bytes = java.nio.file.Files.readAllBytes(victim.toPath)
      bytes(14) = (bytes(14) ^ 0x04).toByte // inside the first payload
      java.nio.file.Files.write(victim.toPath, bytes)
      val e = intercept[Exception](Export.validateShardsContent(spark, dir))
      assert(e.getMessage != null)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("tfrecord export refuses doubles, writes gzip and zstd variants") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-export-tfrz").toString
    try {
      // DoubleType is refused (FloatList is float32 — no silent narrowing)
      val e = intercept[IllegalArgumentException] {
        Export.writeTfrecordShards(
          Seq((1L, 0.5, 0L)).toDF("doc_id", "score", "shard"), dir + "-dbl")
      }
      assert(e.getMessage.contains("float32"))
      for (comp <- Seq("gzip", "zstd")) {
        val d = s"$dir-$comp"
        val df = Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("doc_id", "txt", "shard")
        val counts = Export.writeTfrecordShards(df, d, compression = comp)
        val ext = if (comp == "gzip") ".tfrecord.gz" else ".tfrecord.zst"
        val files = new java.io.File(d, "shard=0").listFiles()
          .filter(f => f.isFile && !f.getName.startsWith("."))
        assert(files.map(_.getName).toSeq === Seq(s"part-00000$ext"))
        assert(Export.validateShardsContent(spark, d) === counts)
        assert(Export.readTfrecordShards(spark, d).count() === 2L)
      }
    } finally {
      Seq("-dbl", "-gzip", "-zstd", "").foreach { sfx =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir + sfx))
      }
    }
  }

  test("writeShards rejects a frame without the shard column") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Export.writeShards(df, "/tmp/never-written")
    }
    assert(e.getMessage.contains("shard"))
  }

  test("writeShards rejects non-integral and null shard columns") {
    import spark.implicits._
    val str = Seq((1L, "a", "s0")).toDF("doc_id", "text", "shard")
    val e1 = intercept[IllegalArgumentException] {
      Export.writeShards(str, "/tmp/never-written")
    }
    assert(e1.getMessage.contains("integral"))
    val withNull = Seq((1L, "a", Some(0L)), (2L, "b", None))
      .toDF("doc_id", "text", "shard")
    // the null check fires AFTER the write (from the partition listing —
    // no pre-write pass), so give it a real scratch dir
    val dir = java.nio.file.Files.createTempDirectory("graft-export-null").toString
    try {
      val e2 = intercept[IllegalArgumentException] {
        Export.writeShards(withNull, dir)
      }
      assert(e2.getMessage.contains("null"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("manifest IO goes through the Hadoop FileSystem for URI paths") {
    import spark.implicits._
    val df = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L))
      .toDF("doc_id", "text", "shard")
    val local = java.nio.file.Files.createTempDirectory("graft-export-fs")
    // an explicit file: URI exercises the same FileSystem resolution an
    // hdfs:// or s3a:// path takes — java.nio would choke on the scheme
    val dir = "file://" + local.toString + "/out"
    try {
      val counts = Export.writeShards(df, dir)
      assert(counts === Map(0L -> 2L, 1L -> 1L))
      assert(Export.readManifest(spark, dir) === counts)
      assert(Export.readShards(spark, dir, Seq(0L)).count() === 2L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(local.toFile)
    }
  }

  test("an empty export writes a zero-total manifest instead of throwing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "shard")
    val dir = java.nio.file.Files.createTempDirectory("graft-export-empty").toString
    try {
      val counts = Export.writeShards(empty, dir)
      assert(counts === Map.empty[Long, Long])
      // the loader contract holds: manifest first, total 0, no data read
      assert(Export.readManifest(spark, dir) === Map.empty[Long, Long])
      val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_graft_manifest.json")), "UTF-8")
      assert(manifest.contains(""""total": 0"""))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("x80 export round-trip equals the pre-export curation frame") {
    val dir = "/root/testdata/sf0.001"
    val before = SparkEntry.queries("x73_curation_pipeline")(spark, dir)
      .collect().toSeq
    val after = SparkEntry.queries("x80_export_roundtrip")(spark, dir)
      .collect().toSeq
    assert(after === before)
  }

  test("appendShards unions epochs under one manifest with all reader contracts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("appshard").toString
    try {
      val epoch1 = Seq((1L, 0L, "day one a"), (2L, 1L, "day one b"))
        .toDF("doc_id", "shard", "text")
      val epoch2 = Seq((3L, 1L, "day two c"), (4L, 2L, "day two d"))
        .toDF("doc_id", "shard", "text")
      val c1 = Export.writeShards(epoch1, dir)
      assert(c1 === Map(0L -> 1L, 1L -> 1L))
      val c2 = Export.appendShards(epoch2, dir)
      // manifest re-derives from the FULL written state: shard 1 unions
      assert(c2 === Map(0L -> 1L, 1L -> 2L, 2L -> 1L))
      assert(Export.readManifest(spark, dir) === c2)
      Export.validateShards(spark, dir)
      val got = Export.readShards(spark, dir, c2.keys.toSeq.sorted)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 2L, 3L, 4L))
      // digests merge: union digest == digest of the union frame
      val union = epoch1.select(col("doc_id"), lit("s").as("source"), col("text"))
        .unionAll(epoch2.select(col("doc_id"), lit("s").as("source"), col("text")))
      val wantDigest = Export.corpusDigest(union).collect()(0)
      val gotDigest = Export.corpusDigest(
        Export.readShards(spark, dir, c2.keys.toSeq.sorted)
          .select(col("doc_id"), lit("s").as("source"), col("text")))
        .collect()(0)
      assert(gotDigest.toSeq === wantDigest.toSeq)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("compactShards merges epochs, preserves digests by fold-carry, keeps the commit log") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compshard").toString
    try {
      def batch(ids: Seq[Long]) =
        ids.map(i => (i, i % 2, s"text-$i")).toDF("doc_id", "shard", "text")
      Export.writeShards(batch(Seq(1L, 2L)), dir)
      Export.appendShards(batch(Seq(3L, 4L)), dir, epoch = Some(7L))
      Export.appendShards(batch(Seq(5L, 6L)), dir, epoch = Some(8L))
      Export.appendShards(batch(Seq(7L, 8L)), dir, epoch = Some(9L))
      val before = Export.readManifest(spark, dir)
      val beforeRows = Export.readShards(spark, dir, before.keys.toSeq)
        .select("doc_id", "text").collect().map(_.toSeq).toSet
      val beforeTree = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(dir, "_graft_manifest.json"))
      assert(Export.committedEpochs(spark, dir) === Set(7L, 8L, 9L))
      // compact: counts unchanged, epochs collapsed to the watermark
      val counts = Export.compactShards(spark, dir)
      assert(counts === before)
      assert(Export.readManifest(spark, dir) === before)
      assert(Export.committedEpochs(spark, dir) === Set.empty)
      val tree = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(dir, "_graft_manifest.json"))
      assert(tree.get("compacted_through").asLong === 9L)
      assert(tree.get("compaction").asLong === 1L)
      // digest fold-carry: xor/sum are the pre-compaction values verbatim
      assert(tree.get("xor").toString === beforeTree.get("xor").toString)
      assert(tree.get("sum").toString === beforeTree.get("sum").toString)
      // rows byte-identical; one data file per shard; full validation
      // (recount + per-file checksums) passes on the compacted state
      val afterRows = Export.readShards(spark, dir, before.keys.toSeq)
        .select("doc_id", "text").collect().map(_.toSeq).toSet
      assert(afterRows === beforeRows)
      val shardFiles = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard="))
        .map(d => d.getName -> d.listFiles().count { f =>
          !f.getName.startsWith(".") && !f.getName.startsWith("_")
        }).toMap
      assert(shardFiles.values.toSet === Set(1))
      assert(Export.validateShardsContent(spark, dir) === before)
      // replayed PRE-COMPACTION epoch refuses (commit-log semantics
      // survive the collapse); a fresh epoch above the watermark lands
      val e = intercept[IllegalArgumentException](
        Export.appendShards(batch(Seq(9L)), dir, epoch = Some(8L)))
      assert(e.getMessage.contains("watermark"))
      val after = Export.appendShards(batch(Seq(9L, 10L)), dir,
        epoch = Some(10L))
      assert(after.values.sum === 10L)
      // auto-assigned epochs also resume above the watermark
      Export.appendShards(batch(Seq(11L)), dir)
      assert(Export.committedEpochs(spark, dir) === Set(10L, 11L))
      // a second compaction folds the new epochs under generation 2
      val c2 = Export.compactShards(spark, dir)
      assert(c2.values.sum === 11L)
      val tree2 = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(dir, "_graft_manifest.json"))
      assert(tree2.get("compacted_through").asLong === 11L)
      assert(tree2.get("compaction").asLong === 2L)
      assert(Export.validateShardsContent(spark, dir) === c2)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("compactShards death windows self-heal: stranded trash restores, uncommitted files retract") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("comphealshard").toString
    try {
      def batch(ids: Seq[Long]) =
        ids.map(i => (i, i % 2, s"text-$i")).toDF("doc_id", "shard", "text")
      Export.writeShards(batch(Seq(1L, 2L)), dir)
      Export.appendShards(batch(Seq(3L, 4L)), dir)
      val before = Export.readManifest(spark, dir)
      // simulate a compaction (generation 1, never committed) dying
      // mid-swap: every live file parked in trash, one uncommitted c1-
      // file present — the exact state between steps 2 and 4
      val shard0 = new java.io.File(dir, "shard=0")
      for (f <- shard0.listFiles() if f.getName.endsWith(".parquet")) {
        assert(f.renameTo(new java.io.File(shard0,
          s".compact-trash-1-${f.getName}")))
        val crc = new java.io.File(shard0, s".${f.getName}.crc")
        if (crc.exists()) crc.delete()
      }
      java.nio.file.Files.write(
        new java.io.File(shard0, "c1-bogus.parquet").toPath,
        "not parquet".getBytes("UTF-8"))
      // the next append heals: c1- retracts (gen 1 uncommitted), trash
      // restores, and the append lands on the restored state
      val after = Export.appendShards(batch(Seq(5L, 6L)), dir)
      assert(after.values.sum === 6L)
      assert(Export.readShards(spark, dir, after.keys.toSeq)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(1L, 2L, 3L, 4L, 5L, 6L))
      assert(!new java.io.File(shard0, "c1-bogus.parquet").exists())
      assert(!shard0.listFiles().exists(_.getName.startsWith(".compact-trash")))
      assert(before.keySet.subsetOf(after.keySet))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("appendShards rejects null shards and schema drift BEFORE writing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("appguard").toString
    try {
      Export.writeShards(
        Seq((1L, 0L, "base")).toDF("doc_id", "shard", "text"), dir)
      // null shard: refused up front — nothing lands, manifest unchanged
      val withNull = Seq((2L, Some(0L), "x"), (3L, None, "y"))
        .toDF("doc_id", "shard", "text")
      val e1 = intercept[IllegalArgumentException](
        Export.appendShards(withNull, dir))
      assert(e1.getMessage.contains("appendShards") &&
        e1.getMessage.contains("null"))
      // schema drift (missing the text column): refused up front
      val drifted = Seq((4L, 0L)).toDF("doc_id", "shard")
      val e2 = intercept[IllegalArgumentException](
        Export.appendShards(drifted, dir))
      assert(e2.getMessage.contains("schema"))
      // the export is NOT poisoned: manifest still reads, a clean append works
      assert(Export.readManifest(spark, dir) === Map(0L -> 1L))
      assert(Export.appendShards(
        Seq((5L, 0L, "ok")).toDF("doc_id", "shard", "text"), dir)
        === Map(0L -> 2L))
      Export.validateShards(spark, dir)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("a failed append self-heals: uncommitted epoch files retract on retry") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("appheal").toString
    try {
      Export.writeShards(
        Seq((1L, 0L, "base"), (2L, 1L, "base b")).toDF("doc_id", "shard", "text"), dir)
      val c1 = Export.appendShards(
        Seq((3L, 0L, "epoch one")).toDF("doc_id", "shard", "text"), dir)
      assert(c1 === Map(0L -> 2L, 1L -> 1L))
      // simulate an append that died mid-move: a data file with an epoch
      // prefix the manifest never committed, plus a stranded staging dir
      val shard0 = new java.io.File(dir, "shard=0")
      val committed = shard0.listFiles()
        .filter(f => f.isFile && f.getName.startsWith("e1-")).head
      val stray = new java.io.File(shard0, "e99-" + committed.getName.stripPrefix("e1-"))
      java.nio.file.Files.copy(committed.toPath, stray.toPath)
      val staging = new java.io.File(dir, "_staging-e99")
      staging.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(staging, "leftover").toPath, "x")
      // the loader-side gate refuses the directory while the stray lives
      val e = intercept[IllegalArgumentException](Export.validateShards(spark, dir))
      assert(e.getMessage.contains("files") || e.getMessage.contains("bytes"))
      // the retrying append retracts epoch-99's files and commits cleanly
      val c2 = Export.appendShards(
        Seq((4L, 1L, "epoch two")).toDF("doc_id", "shard", "text"), dir)
      assert(c2 === Map(0L -> 2L, 1L -> 2L))
      assert(!stray.exists() && !staging.exists())
      assert(Export.validateShards(spark, dir) === c2)
      assert(Export.committedEpochs(spark, dir) === Set(1L, 2L))
      val got = Export.readShards(spark, dir, Seq(0L, 1L))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 2L, 3L, 4L))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("explicit-epoch appendShards is idempotent: a replayed batch skips") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("appidem").toString
    try {
      Export.writeShards(
        Seq((1L, 0L, "base")).toDF("doc_id", "shard", "text"), dir)
      val batch = Seq((2L, 0L, "ep7 a"), (3L, 1L, "ep7 b"))
        .toDF("doc_id", "shard", "text")
      val c1 = Export.appendShards(batch, dir, epoch = Some(7L))
      assert(c1 === Map(0L -> 2L, 1L -> 1L))
      assert(Export.committedEpochs(spark, dir) === Set(7L))
      val filesBefore = new java.io.File(dir).listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles()).map(_.getName).sorted.toSeq
      // the at-least-once replay: same batchId again — skipped, byte-for-byte
      val c2 = Export.appendShards(batch, dir, epoch = Some(7L))
      assert(c2 === c1)
      val filesAfter = new java.io.File(dir).listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles()).map(_.getName).sorted.toSeq
      assert(filesAfter === filesBefore)
      assert(Export.validateShardsContent(spark, dir) === c1)
      assert(Export.readShards(spark, dir, Seq(0L, 1L)).count() === 3L)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("writerId scopes the epoch commit log: mismatch refuses, match skips") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("appwriter").toString
    try {
      val batch = Seq((1L, 0L, "w1 e0")).toDF("doc_id", "shard", "text")
      // first writer adopts the directory
      val c1 = Export.appendShards(batch, dir, epoch = Some(0L),
        writerId = Some("query-aaaa"))
      assert(c1 === Map(0L -> 1L))
      // same writer, same epoch: the legitimate checkpoint-resume replay —
      // skipped byte-for-byte as before
      val c2 = Export.appendShards(batch, dir, epoch = Some(0L),
        writerId = Some("query-aaaa"))
      assert(c2 === c1)
      // a FRESH-CHECKPOINT restart (new query.id, batchIds reset to 0)
      // must refuse loudly, not silently skip real data
      val fresh = Seq((2L, 0L, "w2 e0")).toDF("doc_id", "shard", "text")
      val e1 = intercept[IllegalArgumentException] {
        Export.appendShards(fresh, dir, epoch = Some(0L),
          writerId = Some("query-bbbb"))
      }
      assert(e1.getMessage.contains("query-aaaa") &&
        e1.getMessage.contains("query-bbbb"))
      assert(Export.readShards(spark, dir, Seq(0L)).count() === 1L)
      // writerId-less append on a writer-scoped directory carries the
      // recorded writer forward (legacy call sites keep working)
      val c3 = Export.appendShards(
        Seq((3L, 0L, "auto")).toDF("doc_id", "shard", "text"), dir)
      assert(c3 === Map(0L -> 2L))
      val e2 = intercept[IllegalArgumentException] {
        Export.appendShards(fresh, dir, epoch = Some(9L),
          writerId = Some("query-bbbb"))
      }
      assert(e2.getMessage.contains("query-aaaa"))
      // malformed writer ids refuse before touching the directory
      intercept[IllegalArgumentException] {
        Export.appendShards(fresh, dir, writerId = Some("bad\"id"))
      }
      assert(Export.validateShardsContent(spark, dir) === c3)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("a crash between epoch move and manifest publish replays to exactly-once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("appcrash").toString
    try {
      Export.writeShards(
        Seq((1L, 0L, "base")).toDF("doc_id", "shard", "text"), dir)
      val manifestPath = java.nio.file.Paths.get(dir, "_graft_manifest.json")
      val preCommit = java.nio.file.Files.readAllBytes(manifestPath)
      val batch = Seq((2L, 0L, "ep3 a"), (3L, 1L, "ep3 b"))
        .toDF("doc_id", "shard", "text")
      val want = Export.appendShards(batch, dir, epoch = Some(3L))
      // simulate the writer dying AFTER moving e3- files into the live
      // shard dirs but BEFORE the manifest publish: restore the
      // pre-append manifest over the post-append one, keeping the data
      // (and drop the local-FS checksum sidecar the hand-edit invalidates)
      java.nio.file.Files.write(manifestPath, preCommit)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, "._graft_manifest.json.crc"))
      assert(Export.committedEpochs(spark, dir) === Set.empty)
      // loader-side gate refuses the half-committed state loudly
      intercept[IllegalArgumentException](Export.validateShards(spark, dir))
      // the streaming engine replays batch 3: the retry retracts the
      // uncommitted e3- files and rewrites the epoch exactly once
      val got = Export.appendShards(batch, dir, epoch = Some(3L))
      assert(got === want)
      assert(Export.committedEpochs(spark, dir) === Set(3L))
      assert(Export.validateShardsContent(spark, dir) === want)
      assert(Export.readShards(spark, dir, Seq(0L, 1L))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(1L, 2L, 3L))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("corpusDigest is partitioning-invariant, content-sensitive, mergeable") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def digest(df: org.apache.spark.sql.DataFrame) =
      Export.corpusDigest(df).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    val base = digest(docs)
    assert(base.nonEmpty)
    // any partitioning / row order produces the same three numbers
    assert(digest(docs.repartition(17)) === base)
    assert(digest(docs.orderBy(desc("text"))) === base)
    // one flipped character in one doc moves that source's digest
    val tweaked = digest(docs.withColumn("text",
      when(col("doc_id") === 0L, concat(col("text"), lit("!")))
        .otherwise(col("text"))))
    val src0 = docs.filter(col("doc_id") === 0L)
      .select("source").first().getString(0)
    assert(tweaked(src0) !== base(src0))
    assert((tweaked - src0) === (base - src0))
    // shard digests MERGE to the corpus digest: xor ⊕, (sum+sum) mod 2^61
    val left = digest(docs.filter(col("doc_id") % 2 === 0))
    val right = digest(docs.filter(col("doc_id") % 2 === 1))
    val merged = (left.keySet ++ right.keySet).map { k =>
      val (ln, lx, ls) = left.getOrElse(k, (0L, 0L, 0L))
      val (rn, rx, rs) = right.getOrElse(k, (0L, 0L, 0L))
      k -> ((ln + rn, lx ^ rx, (ls + rs) % 2305843009213693952L))
    }.toMap
    assert(merged === base)
  }

  test("warc export round-trips response records under full validation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toString
    try {
      val df = Seq(
        ("k-001", "https://a.example.com/1", 200, "text/html",
          "<p>hello</p>".getBytes("UTF-8"), 0),
        ("k-002", "https://a.example.com/2", 404, "text/plain",
          Array.emptyByteArray, 0),
        ("k-003", "https://b.example.com/3", 200, "text/html",
          "body \u00e9\u00e8".getBytes("UTF-8"), 1))
        .toDF("key", "url", "status", "mime", "payload", "shard")
        .withColumn("shard", col("shard").cast("int"))
      val counts = Export.writeWarcShards(df, dir, compression = "none")
      assert(counts === Map(0L -> 2L, 1L -> 1L))
      assert(Export.validateShardsContent(spark, dir) === counts)
      val got = Export.readWarcShards(spark, dir)
        .orderBy("key").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2),
          r.getString(3), new String(r.getAs[Array[Byte]](4), "UTF-8"),
          r.getLong(5), r.getLong(6)))
      assert(got === Array(
        ("k-001", "https://a.example.com/1", 200, "text/html",
          "<p>hello</p>", 12L, 0L),
        ("k-002", "https://a.example.com/2", 404, "text/plain", "", 0L, 0L),
        ("k-003", "https://b.example.com/3", 200, "text/html",
          "body \u00e9\u00e8", 9L, 1L)))
      // shard-selective read opens only that shard's file
      assert(Export.readWarcShards(spark, dir, shards = Seq(1L)).count() === 1L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  test("warc reads prune payloads at the record level; gzip round-trips") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-warcgz").toString
    try {
      val df = (0 until 40).map(i =>
        (f"k-$i%04d", s"https://h$i.example.com/", 200, "text/html",
          ("x" * (100 + i)).getBytes("UTF-8"), i % 4))
        .toDF("key", "url", "status", "mime", "payload", "shard")
        .withColumn("shard", col("shard").cast("int"))
      Export.writeWarcShards(df, dir, compression = "gzip")
      assert(Export.validateShardsContent(spark, dir).values.sum === 40L)
      // metadata scan: no payload column in the schema at all
      val meta = Export.readWarcShards(spark, dir,
        columns = Seq("url", "status", "payload_len"))
      assert(meta.columns.toSeq ===
        Seq("key", "url", "status", "payload_len", "shard"))
      assert(meta.count() === 40L)
      assert(meta.agg(sum(col("payload_len"))).first().getLong(0) ===
        (0 until 40).map(100L + _).sum)
      // unknown column refuses with the legal set
      val e = intercept[IllegalArgumentException] {
        Export.readWarcShards(spark, dir, columns = Seq("nope"))
      }
      assert(e.getMessage.contains("unknown columns"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  test("warc CDX index: keyed record fetch seeks one gzip member, no shard scan") {
    import spark.implicits._
    for (comp <- Seq("gzip", "none")) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-cdx-$comp").toString
      try {
        val df = (0 until 30).map(i =>
          (f"k-$i%04d", s"https://h$i.example.com/p$i", 200, "text/html",
            (s"body-$i-" + "y" * (50 + i)).getBytes("UTF-8"), i % 3))
          .toDF("key", "url", "status", "mime", "payload", "shard")
          .withColumn("shard", col("shard").cast("int"))
        Export.writeWarcShards(df, dir, compression = comp)
        // the sidecars are invisible to the manifest's stats and gates
        assert(Export.validateShardsContent(spark, dir).values.sum === 30L)
        // index covers every response record, metadata only
        val idx = Export.readWarcRecordIndex(spark, dir)
        assert(idx.columns.toSeq ===
          Seq("key", "url", "shard", "offset", "length"))
        assert(idx.count() === 30L)
        assert(idx.select("key").collect().map(_.getString(0)).sorted.toSeq
          === (0 until 30).map(i => f"k-$i%04d"))
        // shard-selective index read
        assert(Export.readWarcRecordIndex(spark, dir, shards = Seq(1L))
          .count() === 10L)
        // keyed fetch: exactly the asked records, payload bytes intact,
        // schema identical to the sequential reader's
        val want = Seq("k-0007", "k-0013", "k-0029")
        val got = Export.readWarcRecords(spark, dir, want)
          .orderBy("key").collect()
          .map(r => (r.getString(0), r.getString(1), r.getInt(2),
            r.getString(3), new String(r.getAs[Array[Byte]](4), "UTF-8"),
            r.getLong(5), r.getLong(6)))
        val full = Export.readWarcShards(spark, dir)
          .filter(col("key").isin(want: _*))
          .orderBy("key").collect()
          .map(r => (r.getString(0), r.getString(1), r.getInt(2),
            r.getString(3), new String(r.getAs[Array[Byte]](4), "UTF-8"),
            r.getLong(5), r.getLong(6)))
        assert(got === full && got.length === 3)
        // unknown keys return no row, known ones still come back
        assert(Export.readWarcRecords(spark, dir, Seq("nope", "k-0001"))
          .count() === 1L)
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(dir))
    }
  }

  test("record-split WARC scan equals the sequential read and splits one file across tasks") {
    import spark.implicits._
    for (comp <- Seq("gzip", "none")) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-split-$comp").toString
      try {
        // ONE file (one shard): the unsharded-dump shape whose sequential
        // scan is a single task — the split must parallelize it anyway
        val df = (0 until 53).map(i =>
          (f"k-$i%04d", s"https://h$i/p", 200, "text/html",
            (s"payload-$i-" + "z" * (40 + i)).getBytes("UTF-8"), 0))
          .toDF("key", "url", "status", "mime", "payload", "shard")
          .withColumn("shard", col("shard").cast("int"))
        Export.writeWarcShards(df, dir, compression = comp)
        def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
          .map(r => (r.getString(0), r.getString(1), r.getInt(2),
            r.getString(3), new String(r.getAs[Array[Byte]](4), "UTF-8"),
            r.getLong(5), r.getLong(6))).toSet
        val seq_ = rows(Export.readWarcShards(spark, dir))
        val split = Export.readWarcShards(spark, dir, splitRecords = 7)
        assert(rows(split) === seq_ && seq_.size === 53)
        // the split plan carries ceil(53/7) = 8 independent slices — a
        // direct task-parallelism witness for the single container
        assert(split.rdd.getNumPartitions > 1)
        // record-level payload pruning holds on the split path too
        val meta = Export.readWarcShards(spark, dir,
          columns = Seq("url", "payload_len"), splitRecords = 7)
        assert(meta.columns.toSeq === Seq("key", "url", "payload_len", "shard"))
        assert(meta.agg(sum(col("payload_len"))).head.getLong(0) ===
          (0 until 53).map(i => s"payload-$i-".length + 40L + i).sum)
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(dir))
    }
  }

  test("readWarcStream's file source reads paths only (record-granular memory)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wpath").toString
    try {
      val df = (0 until 6).map(i =>
        (f"k-$i%04d", s"https://h$i/", 200, "text/html",
          s"b$i".getBytes("UTF-8"), i % 2))
        .toDF("key", "url", "status", "mime", "payload", "shard")
        .withColumn("shard", col("shard").cast("int"))
      Export.writeWarcShards(df, dir, compression = "gzip")
      val frame = Export.readWarcStream(spark, dir, streaming = false)
      // the binaryFile scan must be pruned to the path column — content
      // never materializes a file in memory; records stream off the FS
      val scan = frame.queryExecution.executedPlan.toString()
      assert(scan.contains("ReadSchema: struct<path:string>"),
        s"binaryFile scan not pruned to path:\n$scan")
      assert(frame.count() === 6L)
      assert(frame.select("key").collect().map(_.getString(0)).sorted.toSeq
        === (0 until 6).map(i => f"k-$i%04d"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  test("warc reader interop: independently-authored bytes parse; corrupt refuse") {
    // hand-written per the public WARC 1.0 spec, NOT via writeWarcShards:
    // a warcinfo record, a request record (both must be skipped), and a
    // response with a foreign urn:uuid record id and extra HTTP headers
    def rec(kind: String, id: String, extra: String, block: String): String = {
      s"WARC/1.0\r\nWARC-Type: $kind\r\n" +
        s"WARC-Record-ID: <$id>\r\nWARC-Date: 2020-01-01T00:00:00Z\r\n" +
        extra + s"Content-Length: ${block.getBytes("UTF-8").length}\r\n\r\n" +
        block + "\r\n\r\n"
    }
    val http = "HTTP/1.1 301 Moved Permanently\r\nServer: other\r\n" +
      "Content-Type: text/html; charset=utf-8\r\nContent-Length: 4\r\n\r\nwxyz"
    val warc =
      rec("warcinfo", "urn:uuid:aaa", "Content-Type: application/warc-fields\r\n",
        "software: elsewhere\r\n") +
      rec("request", "urn:uuid:bbb",
        "Content-Type: application/http;msgtype=request\r\n",
        "GET / HTTP/1.1\r\nHost: x\r\n\r\n") +
      rec("response", "urn:uuid:ccc",
        "WARC-Target-URI: https://x.example.com/\r\n" +
          "Content-Type: application/http; msgtype=response\r\n", http)
    val bytes = warc.getBytes("UTF-8")
    val got = Export.warcResponses(
      new java.io.ByteArrayInputStream(bytes), readPayload = true).toSeq
    assert(got === Seq(("urn:uuid:ccc", "https://x.example.com/", 301,
      "text/html; charset=utf-8", got.head._5, 4L)))
    assert(new String(got.head._5, "UTF-8") === "wxyz")
    // truncated mid-block: fail loudly, never resynchronize
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 20)
    val e1 = intercept[IllegalArgumentException] {
      Export.warcResponses(new java.io.ByteArrayInputStream(cut),
        readPayload = true).toSeq
    }
    assert(e1.getMessage.contains("corrupt warc"))
    // a non-WARC stream refuses on the version line
    val e2 = intercept[IllegalArgumentException] {
      Export.warcResponses(
        new java.io.ByteArrayInputStream("HTTP/1.1 200 OK\r\n".getBytes),
        readPayload = true).toSeq
    }
    assert(e2.getMessage.contains("version"))
    // a record missing Content-Length refuses
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\n"
    val e3 = intercept[IllegalArgumentException] {
      Export.warcResponses(
        new java.io.ByteArrayInputStream(noLen.getBytes("UTF-8")),
        readPayload = true).toSeq
    }
    assert(e3.getMessage.contains("Content-Length"))
    // a multi-space status line (legal per RFC whitespace tolerance in the
    // wild) PARSES; a non-numeric status REFUSES as corrupt warc, not a
    // bare NumberFormatException
    def statusRec(statusLine: String): Array[Byte] = {
      val http = statusLine + "\r\nContent-Length: 2\r\n\r\nok"
      rec("response", "urn:uuid:ddd",
        "WARC-Target-URI: https://y/\r\n" +
          "Content-Type: application/http; msgtype=response\r\n", http)
        .getBytes("UTF-8")
    }
    val multi = Export.warcResponses(
      new java.io.ByteArrayInputStream(statusRec("HTTP/1.1  200")),
      readPayload = true).toSeq
    assert(multi.head._3 === 200)
    val e4 = intercept[IllegalArgumentException] {
      Export.warcResponses(
        new java.io.ByteArrayInputStream(statusRec("HTTP/1.1 abc OK")),
        readPayload = true).toSeq
    }
    assert(e4.getMessage.contains("corrupt warc") &&
      e4.getMessage.contains("status"))
  }

  test("warc revisit interop: foreign-authored revisit records surface; responses unaffected") {
    // hand-written per the public WARC 1.0 spec: a Common Crawl-style
    // revisit record (urn:uuid ids, identical-payload-digest profile,
    // HTTP headers of the re-fetch as the block) between a warcinfo and
    // a response — warcRevisits must surface exactly the revisit row,
    // warcResponses exactly the response, each skipping the other.
    def rec(kind: String, id: String, extra: String, block: String): String =
      s"WARC/1.0\r\nWARC-Type: $kind\r\n" +
        s"WARC-Record-ID: <$id>\r\nWARC-Date: 2020-01-01T00:00:00Z\r\n" +
        extra + s"Content-Length: ${block.getBytes("UTF-8").length}\r\n\r\n" +
        block + "\r\n\r\n"
    val warc =
      rec("warcinfo", "urn:uuid:aaa",
        "Content-Type: application/warc-fields\r\n", "software: other\r\n") +
      rec("revisit", "urn:uuid:rrr",
        "WARC-Target-URI: https://x.example.com/page\r\n" +
          "WARC-Refers-To: <urn:uuid:ccc>\r\n" +
          "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n" +
          "Content-Type: application/http; msgtype=response\r\n",
        "HTTP/1.1 304 Not Modified\r\nServer: other\r\n\r\n") +
      rec("response", "urn:uuid:ccc",
        "WARC-Target-URI: https://x.example.com/page\r\n" +
          "Content-Type: application/http; msgtype=response\r\n",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
          "Content-Length: 2\r\n\r\nhi")
    val bytes = warc.getBytes("UTF-8")
    val revs = Export.warcRevisits(
      new java.io.ByteArrayInputStream(bytes)).toSeq
    assert(revs === Seq(("urn:uuid:rrr", "https://x.example.com/page",
      "urn:uuid:ccc",
      "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest")))
    val resp = Export.warcResponses(
      new java.io.ByteArrayInputStream(bytes), readPayload = true).toSeq
    assert(resp.map(r => (r._1, r._3)) === Seq(("urn:uuid:ccc", 200)))
  }

  test("warc revisit round trip: writer emits revisit records; readers split kinds; digest covers both") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-warcrev").toString
    try {
      val rows = (0 until 20).map { i =>
        (f"doc-$i%04d", s"https://h.example.com/$i", 200, "text/html",
          s"body-$i".getBytes("UTF-8"), i % 3, null.asInstanceOf[String])
      } ++ (0 until 20).filter(_ % 4 == 1).map { i =>
        (f"rev-$i%04d", s"https://h.example.com/$i", 0, "",
          null.asInstanceOf[Array[Byte]], i % 3, f"doc-${i - 1}%04d")
      }
      val df = rows.toDF("key", "url", "status", "mime", "payload",
        "shard", "revisit_of")
        .withColumn("shard", col("shard").cast("int"))
      val counts = Export.writeWarcShards(df, dir, compression = "gzip",
        revisitOfCol = Some("revisit_of"))
      // counts include revisit rows; the digest recount re-parses BOTH
      // kinds (validateShardsContent == written counts proves it)
      assert(counts.values.sum === 25L)
      assert(Export.validateShardsContent(spark, dir) === counts)
      val resp = Export.readWarcShards(spark, dir)
      assert(resp.count() === 20L)
      assert(resp.filter(col("key").startsWith("rev-")).count() === 0L)
      val revs = Export.readWarcRevisits(spark, dir).collect()
      assert(revs.length === 5)
      assert(revs.map(r => (r.getAs[String]("key"),
        r.getAs[String]("refers_to"))).sorted.toSeq ===
        (0 until 20).filter(_ % 4 == 1)
          .map(i => (f"rev-$i%04d", f"doc-${i - 1}%04d")).sorted)
      assert(revs.forall(_.getAs[String]("profile").contains(
        "identical-payload-digest")))
      // streaming twin returns the same revisit set
      val streamed = Export.readWarcRevisitStream(spark, dir,
        streaming = false)
        .select("key", "url", "refers_to", "profile")
        .collect().map(_.toSeq).toSet
      assert(streamed === revs.map(r => r.toSeq.take(4)).toSet)
      // a revisit row smuggling payload bytes refuses loudly
      val bad = Seq(("rev-bad", "https://h/", 0, "",
        "x".getBytes("UTF-8"), 0, "doc-0000"))
        .toDF("key", "url", "status", "mime", "payload", "shard", "revisit_of")
        .withColumn("shard", col("shard").cast("int"))
      val e = intercept[org.apache.spark.SparkException] {
        Export.writeWarcShards(bad, dir + "-b",
          revisitOfCol = Some("revisit_of"))
      }
      assert(e.getMessage.contains("no payload") ||
        Option(e.getCause).exists(_.getMessage.contains("no payload")))
    } finally Seq("", "-b").foreach(s =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir + s)))
  }

  test("warc writer refuses bad keys, dup keys, CR/LF header smuggling, null payloads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-warcbad").toString
    def row(key: String, url: String) = Seq(
      (key, url, 200, "text/html", "x".getBytes("UTF-8"), 0))
      .toDF("key", "url", "status", "mime", "payload", "shard")
      .withColumn("shard", col("shard").cast("int"))
    try {
      val eKey = intercept[org.apache.spark.SparkException] {
        Export.writeWarcShards(row("a<b", "https://x/"), dir)
      }
      assert(eKey.getMessage.contains("angle brackets") ||
        Option(eKey.getCause).exists(_.getMessage.contains("angle brackets")))
      val eUrl = intercept[org.apache.spark.SparkException] {
        Export.writeWarcShards(row("ok", "https://x/\r\nWARC-Type: smuggled"), dir)
      }
      assert(eUrl.getMessage.contains("CR/LF") ||
        Option(eUrl.getCause).exists(_.getMessage.contains("CR/LF")))
      val dup = row("same", "https://x/").union(row("same", "https://y/"))
      val eDup = intercept[org.apache.spark.SparkException] {
        Export.writeWarcShards(dup, dir)
      }
      assert(eDup.getMessage.contains("duplicate") ||
        Option(eDup.getCause).exists(_.getMessage.contains("duplicate")))
      val nul = Seq(("k", "https://x/", 200, "text/html",
        null.asInstanceOf[Array[Byte]], 0))
        .toDF("key", "url", "status", "mime", "payload", "shard")
        .withColumn("shard", col("shard").cast("int"))
      val eNul = intercept[org.apache.spark.SparkException] {
        Export.writeWarcShards(nul, dir)
      }
      assert(eNul.getMessage.contains("null payload") ||
        Option(eNul.getCause).exists(_.getMessage.contains("null payload")))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  test("wet export round-trips conversion records under full validation") {
    import spark.implicits._
    for (comp <- Seq("none", "gzip")) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-wet-$comp").toString
      try {
        // newline INSIDE text exercises Content-Length framing (CR/LF is
        // legal in a block); unicode exercises strict multi-byte decode;
        // empty text is an empty block, not null
        val df = Seq(
          ("k-001", "https://a.example.com/1", "line one\nline two", 0),
          ("k-002", "https://a.example.com/2", "", 0),
          ("k-003", "https://b.example.com/3", "café 中文", 1))
          .toDF("key", "url", "text", "shard")
          .withColumn("shard", col("shard").cast("int"))
        val counts = Export.writeWetShards(df, dir, compression = comp)
        assert(counts === Map(0L -> 2L, 1L -> 1L))
        assert(Export.validateShardsContent(spark, dir) === counts)
        val got = Export.readWetShards(spark, dir).orderBy("key").collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getLong(3), r.getLong(4)))
        assert(got === Array(
          ("k-001", "https://a.example.com/1", "line one\nline two", 17L, 0L),
          ("k-002", "https://a.example.com/2", "", 0L, 0L),
          ("k-003", "https://b.example.com/3", "café 中文",
            12L, 1L)))
        // format gates cut both ways
        val eWarc = intercept[IllegalArgumentException] {
          Export.readWarcShards(spark, dir)
        }
        assert(eWarc.getMessage.contains("not a writeWarcShards"))
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(dir))
    }
  }

  test("wet reads prune text at the record level; writer refuses bad input") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wetpr").toString
    try {
      val df = (0 until 30).map(i =>
        (f"k-$i%04d", s"https://h$i.example.com/", "t" * (50 + i), i % 3))
        .toDF("key", "url", "text", "shard")
        .withColumn("shard", col("shard").cast("int"))
      Export.writeWetShards(df, dir, compression = "gzip")
      val meta = Export.readWetShards(spark, dir,
        columns = Seq("url", "text_len"))
      assert(meta.columns.toSeq === Seq("key", "url", "text_len", "shard"))
      assert(meta.agg(sum(col("text_len"))).first().getLong(0) ===
        (0 until 30).map(50L + _).sum)
      val eCol = intercept[IllegalArgumentException] {
        Export.readWetShards(spark, dir, columns = Seq("payload"))
      }
      assert(eCol.getMessage.contains("unknown columns"))
      // writer refusals: null text, CR/LF url
      val eNul = intercept[org.apache.spark.SparkException] {
        Export.writeWetShards(Seq(("k", "https://x/",
          null.asInstanceOf[String], 0))
          .toDF("key", "url", "text", "shard")
          .withColumn("shard", col("shard").cast("int")), dir + "-b")
      }
      assert(eNul.getMessage.contains("null text") ||
        Option(eNul.getCause).exists(_.getMessage.contains("null text")))
      val eUrl = intercept[org.apache.spark.SparkException] {
        Export.writeWetShards(Seq(("k", "https://x/\r\nEvil: 1", "t", 0))
          .toDF("key", "url", "text", "shard")
          .withColumn("shard", col("shard").cast("int")), dir + "-c")
      }
      assert(eUrl.getMessage.contains("CR/LF") ||
        Option(eUrl.getCause).exists(_.getMessage.contains("CR/LF")))
      // unencodable text (unpaired surrogate) refuses loudly at WRITE
      // time — the write-side mirror of the strict reader, instead of
      // the JVM default's silent '?' substitution. Catalyst itself
      // normalizes surrogates at DataFrame creation (UTF8String stores
      // UTF-8 bytes), so the encoder is tested directly: it is the
      // guard for any future raw-String path into the writer.
      val eSur = intercept[IllegalArgumentException] {
        Export.strictUtf8Bytes("a\ud800b", "text", "writeWetShards")
      }
      assert(eSur.getMessage.contains("not encodable"))
      assert(Export.strictUtf8Bytes("héllo €", "text", "t").toSeq ===
        "héllo €".getBytes("UTF-8").toSeq)
    } finally Seq("", "-b", "-c").foreach(s =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir + s)))
  }

  test("wet reader interop: foreign conversion records parse; bad UTF-8 refuses") {
    // hand-written per the public WARC 1.0 / WET convention, NOT via
    // writeWetShards: a warcinfo record and a response record (both
    // skipped), then a conversion record with a foreign urn:uuid id and
    // a WARC-Refers-To header
    def rec(kind: String, id: String, extra: String,
            block: Array[Byte]): Array[Byte] = {
      val head = (s"WARC/1.0\r\nWARC-Type: $kind\r\n" +
        s"WARC-Record-ID: <$id>\r\nWARC-Date: 2020-01-01T00:00:00Z\r\n" +
        extra + s"Content-Length: ${block.length}\r\n\r\n").getBytes("UTF-8")
      head ++ block ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val wet =
      rec("warcinfo", "urn:uuid:aaa",
        "Content-Type: application/warc-fields\r\n",
        "software: elsewhere\r\n".getBytes("UTF-8")) ++
      rec("response", "urn:uuid:bbb",
        "Content-Type: application/http;msgtype=response\r\n",
        ("HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi").getBytes("UTF-8")) ++
      rec("conversion", "urn:uuid:ccc",
        "WARC-Target-URI: https://x.example.com/\r\n" +
          "WARC-Refers-To: <urn:uuid:bbb>\r\n" +
          "Content-Type: text/plain\r\n",
        "extracted text".getBytes("UTF-8"))
    val got = Export.warcConversions(
      new java.io.ByteArrayInputStream(wet), readPayload = true).toSeq
    assert(got.map(t => (t._1, t._2, new String(t._3, "UTF-8"), t._4)) ===
      Seq(("urn:uuid:ccc", "https://x.example.com/", "extracted text", 14L)))
    // payload skipped entirely under !readPayload
    val meta = Export.warcConversions(
      new java.io.ByteArrayInputStream(wet), readPayload = false).toSeq
    assert(meta.map(t => (t._1, t._3, t._4)) ===
      Seq(("urn:uuid:ccc", null, 14L)))
    // truncation refuses loudly (no resynchronization)
    val cut = java.util.Arrays.copyOf(wet, wet.length - 6)
    val e = intercept[IllegalArgumentException] {
      Export.warcConversions(new java.io.ByteArrayInputStream(cut),
        readPayload = true).toSeq
    }
    assert(e.getMessage.contains("corrupt warc"))
  }

  test("readWetStream: file-source streaming ingest equals the batch WET scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wetst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-wetst-ck").toString
    try {
      val df = (0 until 20).map(i =>
        (f"k-$i%04d", s"https://h$i.example.com/", s"text $i é", i % 4))
        .toDF("key", "url", "text", "shard")
        .withColumn("shard", col("shard").cast("int"))
      Export.writeWetShards(df, dir, compression = "gzip")
      // Common Crawl naming: the containers are part-00000.warc.wet.gz
      val names = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).map(_.getName).filter(!_.startsWith("."))
      assert(names.nonEmpty && names.forall(_ == "part-00000.warc.wet.gz"))
      val expected = Export.readWetShards(spark, dir)
        .select("key", "url", "text", "text_len").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
      val acc = scala.collection.mutable.Set
        .empty[(String, String, String, Long)]
      val q = Export.readWetStream(spark, dir,
          options = Map("maxFilesPerTrigger" -> "2"))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = b.select("key", "url", "text", "text_len").collect()
            .map(r => (r.getString(0), r.getString(1), r.getString(2),
              r.getLong(3)))
          acc.synchronized { acc ++= got }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      assert(acc.toSet === expected)
      // batch mode of the same code path agrees too
      assert(Export.readWetStream(spark, dir, streaming = false)
        .count() === 20L)
    } finally Seq(dir, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
  }

  test("wet CDX: keyed conversion fetch and record-split scan equal the sequential read") {
    import spark.implicits._
    for (comp <- Seq("gzip", "none")) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-wetcdx-$comp").toString
      try {
        val df = (0 until 24).map(i =>
          (f"k-$i%04d", s"https://h$i.example.com/", s"body $i é", i % 2))
          .toDF("key", "url", "text", "shard")
          .withColumn("shard", col("shard").cast("int"))
        Export.writeWetShards(df, dir, compression = comp)
        def rows(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(r => (r.getString(0), r.getString(1),
            r.getString(2), r.getLong(3), r.getLong(4))).toSet
        val seq = rows(Export.readWetShards(spark, dir))
        // keyed fetch byte-equals the sequential scan on a probe set
        val probe = Seq("k-0003", "k-0010", "k-0021")
        assert(rows(Export.readWetRecords(spark, dir, probe)) ===
          seq.filter(t => probe.contains(t._1)))
        // record-split full scan set-equals the sequential scan
        assert(rows(Export.readWetShards(spark, dir, splitRecords = 5)) ===
          seq)
        // the index covers every conversion record
        assert(Export.readWarcRecordIndex(spark, dir).count() === 24L)
        // format gate: the response fetch refuses a wet export loudly
        val e = intercept[IllegalArgumentException] {
          Export.readWarcRecords(spark, dir, probe)
        }
        assert(e.getMessage.contains("not a warc export"))
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(dir))
    }
  }

  test("wet write composes with WARC ingest: extract -> WET -> read-back") {
    import spark.implicits._
    val warcDir = java.nio.file.Files
      .createTempDirectory("graft-wetchain-a").toString
    val wetDir = java.nio.file.Files
      .createTempDirectory("graft-wetchain-b").toString
    try {
      val crawl = Seq(
        ("d-01", "https://a.example.com/1", 200, "text/html",
          "<html><body><p>alpha beta</p></body></html>".getBytes("UTF-8"), 0),
        ("d-02", "https://a.example.com/2", 200, "text/html",
          "<html><body><p>gamma</p></body></html>".getBytes("UTF-8"), 0))
        .toDF("key", "url", "status", "mime", "payload", "shard")
        .withColumn("shard", col("shard").cast("int"))
      Export.writeWarcShards(crawl, warcDir)
      // the WARC->WET derivation: read responses, extract visible text,
      // write conversion records keyed like their source records
      val extracted = TextAnalysis.htmlExtract(
        Export.readWarcShards(spark, warcDir)
          .select(col("key").as("doc_id"),
            decode(col("payload"), "UTF-8").as("html")),
        idCol = "doc_id")
        .join(Export.readWarcShards(spark, warcDir,
          columns = Seq("url")).withColumnRenamed("key", "doc_id"),
          "doc_id")
        .select(col("doc_id").as("key"), col("url"),
          col("main_text").as("text"), lit(0).cast("int").as("shard"))
      Export.writeWetShards(extracted, wetDir, compression = "gzip")
      val got = Export.readWetShards(spark, wetDir).orderBy("key")
        .select("key", "text").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(got === Array(("d-01", "alpha beta"), ("d-02", "gamma")))
    } finally Seq(warcDir, wetDir).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
  }

  test("expireEpochs drops old epochs by subtraction: retention rules, digests, replay refusal") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("expshard").toString
    try {
      def batch(ids: Seq[Long]) =
        ids.map(i => (i, i % 2, s"text-$i")).toDF("doc_id", "shard", "text")
      // append x4 (epochs 1..4), two shards each
      Export.appendShards(batch(Seq(1L, 2L)), dir, epoch = Some(1L))
      Export.appendShards(batch(Seq(3L, 4L)), dir, epoch = Some(2L))
      Export.appendShards(batch(Seq(5L, 6L)), dir, epoch = Some(3L))
      Export.appendShards(batch(Seq(7L, 8L)), dir, epoch = Some(4L))
      assert(Export.committedEpochs(spark, dir) === Set(1L, 2L, 3L, 4L))
      // a retention rule is required; a vacuous one is a no-op
      intercept[IllegalArgumentException](Export.expireEpochs(spark, dir))
      val noop = Export.expireEpochs(spark, dir, keepLast = Some(10))
      assert(Export.committedEpochs(spark, dir) === Set(1L, 2L, 3L, 4L))
      assert(noop === Export.readManifest(spark, dir))
      // keepLast = 2: epochs 1,2 expire; exactly epochs 3,4's rows survive
      val counts = Export.expireEpochs(spark, dir, keepLast = Some(2))
      assert(Export.committedEpochs(spark, dir) === Set(3L, 4L))
      assert(counts.values.sum === 4L)
      assert(Export.readShards(spark, dir, counts.keys.toSeq)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(5L, 6L, 7L, 8L))
      val tree = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(dir, "_graft_manifest.json"))
      assert(tree.get("expired_through").asLong === 2L)
      // subtracted digests re-verify against a full content recount,
      // and the per-file checksums carried forward for the survivors
      assert(Export.validateShardsContent(spark, dir) === counts)
      // replay of an expired epoch REFUSES (no silent resurrection),
      // pre-expiry epochs' files are gone from disk
      val e = intercept[IllegalArgumentException](
        Export.appendShards(batch(Seq(9L)), dir, epoch = Some(2L)))
      assert(e.getMessage.contains("expiry watermark"))
      val stray = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).flatMap(_.listFiles())
        .filter(f => f.getName.startsWith("e1-") || f.getName.startsWith("e2-"))
      assert(stray.isEmpty, s"expired files survive: ${stray.mkString(",")}")
      // auto-assigned epochs resume above the expiry watermark
      Export.appendShards(batch(Seq(9L, 10L)), dir)
      assert(Export.committedEpochs(spark, dir) === Set(3L, 4L, 5L))
      // olderThan alone: epochs strictly below the watermark expire
      val c2 = Export.expireEpochs(spark, dir, olderThan = Some(4L))
      assert(Export.committedEpochs(spark, dir) === Set(4L, 5L))
      assert(c2.values.sum === 4L)
      assert(Export.validateShardsContent(spark, dir) === c2)
      // combined rules: keepLast PROTECTS the newest even when olderThan
      // marks everything — both rules must agree to expire
      val c3 = Export.expireEpochs(spark, dir,
        keepLast = Some(1), olderThan = Some(100L))
      assert(Export.committedEpochs(spark, dir) === Set(5L))
      assert(c3.values.sum === 2L)
      assert(Export.readShards(spark, dir, c3.keys.toSeq)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(9L, 10L))
      assert(Export.validateShardsContent(spark, dir) === c3)
      // the expiry watermark survives a compaction
      Export.compactShards(spark, dir)
      val tree2 = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(dir, "_graft_manifest.json"))
      assert(tree2.get("expired_through").asLong === 4L)
      assert(Export.validateShardsContent(spark, dir) === c3)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("expireEpochs death windows self-heal: uncommitted trash restores, committed trash drops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("exphealshard").toString
    try {
      def batch(ids: Seq[Long]) =
        ids.map(i => (i, i % 2, s"text-$i")).toDF("doc_id", "shard", "text")
      Export.appendShards(batch(Seq(1L, 2L)), dir, epoch = Some(1L))
      Export.appendShards(batch(Seq(3L, 4L)), dir, epoch = Some(2L))
      // simulate an expiry of epoch 1 dying AFTER the park, BEFORE the
      // manifest republish: epoch 1 is still committed, its files hidden
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard="))
      for (sd <- shardDirs; f <- sd.listFiles() if f.getName.startsWith("e1-")) {
        assert(f.renameTo(new java.io.File(sd, s".expire-trash-1-${f.getName}")))
        val crc = new java.io.File(sd, s".${f.getName}.crc")
        if (crc.exists()) crc.delete()
      }
      // the next append heals by RESTORING the trash (expiry uncommitted)
      Export.appendShards(batch(Seq(5L, 6L)), dir, epoch = Some(3L))
      assert(Export.readShards(spark, dir,
          Export.readManifest(spark, dir).keys.toSeq)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(1L, 2L, 3L, 4L, 5L, 6L))
      assert(Export.validateShardsContent(spark, dir).values.sum === 6L)
      // now a COMMITTED expiry's stranded trash (epoch no longer in the
      // log) is retired garbage: the next append drops it, rows unchanged
      Export.expireEpochs(spark, dir, olderThan = Some(2L))
      for (sd <- shardDirs; f <- sd.listFiles() if f.getName.startsWith("e2-")) {
        val twin = new java.io.File(sd, s".expire-trash-1-stale-${f.getName}")
        java.nio.file.Files.copy(f.toPath, twin.toPath)
      }
      Export.appendShards(batch(Seq(7L, 8L)), dir, epoch = Some(4L))
      assert(!shardDirs.flatMap(_.listFiles())
        .exists(_.getName.startsWith(".expire-trash")))
      assert(Export.validateShardsContent(spark, dir).values.sum === 6L)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("manifest-pinned reads refuse loudly mid-swap instead of a silent short read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pinshard").toString
    try {
      val df = (0L until 40L).map(i => (i, s"doc $i", i % 4))
        .toDF("doc_id", "text", "shard")
      val counts = Export.writeShards(df, dir)
      // healthy export: the pinned read returns exactly the manifest rows
      assert(Export.readShards(spark, dir, counts.keys.toSeq).count() === 40L)
      // simulate a compaction mid-swap (between park and move-in): every
      // live data file renamed to hidden trash, directories transiently
      // empty while the manifest still records full counts
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard="))
      for (sd <- shardDirs; f <- sd.listFiles()
           if f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_")) {
        assert(f.renameTo(new java.io.File(sd, s".compact-trash-1-${f.getName}")))
        val crc = new java.io.File(sd, s".${f.getName}.crc")
        if (crc.exists()) crc.delete()
      }
      // a plain directory read would silently return 0 rows here; the
      // manifest-pinned read REFUSES, naming a missing pinned file
      val e = intercept[Throwable](
        Export.readShards(spark, dir, counts.keys.toSeq).count())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(t =>
        t.isInstanceOf[java.io.FileNotFoundException] ||
          Option(t.getMessage).exists(m =>
            m.contains("not exist") || m.contains("FileNotFound"))),
        s"expected a loud missing-file refusal, got: $e")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("keyed WARC fetch of a revisit key refuses by name, not as cdx corruption") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-warcrevfetch").toString
    try {
      val rows = Seq(
        ("doc-0001", "https://h.example.com/1", 200, "text/html",
          "body-1".getBytes("UTF-8"), 0, null.asInstanceOf[String]),
        ("rev-0001", "https://h.example.com/1", 0, "",
          null.asInstanceOf[Array[Byte]], 0, "doc-0001"))
        .toDF("key", "url", "status", "mime", "payload", "shard", "revisit_of")
        .withColumn("shard", col("shard").cast("int"))
      Export.writeWarcShards(rows, dir, compression = "gzip",
        revisitOfCol = Some("revisit_of"))
      // the CDX indexes BOTH kinds; response fetch works
      val idx = Export.readWarcRecordIndex(spark, dir)
        .select("key").collect().map(_.getString(0)).sorted
      assert(idx === Array("doc-0001", "rev-0001"))
      val got = Export.readWarcRecords(spark, dir, Seq("doc-0001"))
        .select("key").collect().map(_.getString(0))
      assert(got === Array("doc-0001"))
      // fetching the revisit key names the real cause and the right reader
      val e = intercept[org.apache.spark.SparkException](
        Export.readWarcRecords(spark, dir, Seq("rev-0001")).collect())
      val msg = chainMsg(e)
      assert(msg.contains("REVISIT") && msg.contains("readWarcRevisits"),
        s"wrong refusal: $msg")
      assert(msg.contains("doc-0001"), s"refers_to missing from refusal: $msg")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  private def chainMsg(t: Throwable): String = {
    val b = new StringBuilder
    var c: Throwable = t
    while (c != null) { b.append(Option(c.getMessage).getOrElse("")).append(" | "); c = c.getCause }
    b.toString
  }
}
