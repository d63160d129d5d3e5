package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Curation, Dedup, Export, Ivf, Multimodal, Pack, Retrieval, Similarity, TextAnalysis}

/** Packing/sampling/export catalog entries: sequence packing, mixtures, splits, curriculum/epoch schedules, shard exports.
  *
  * Split from the original monolithic ExtQueries catalog — entries
  * verbatim; shared frames and helpers live in [[ExtShared]]. */
object PackingQueries {
  import ExtShared._

  val defs: Seq[QueryDef] = Seq(

    // x44 — per-source token-budget mixture sampling: the data-mixing
    // primitive of a training run. Docs fill each source's token budget
    // greedily in deterministic content-hash order (md5 — reproducible,
    // engine-portable, no RNG state); a doc is taken while the EXCLUSIVE
    // running token total is under budget, so the first doc of a source is
    // always taken and the last may overflow (standard greedy fill). The
    // per-source window parallelizes across sources; a single mega-source
    // shards the window by a hash-bucket sub-key, same mitigation as x32.
    QueryDef("x44_token_budget_mix",
      (s, d) => {
        val w = Window.partitionBy(col("source")).orderBy(col("ok"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"),
            md5(col("text")).as("ok"))
          .withColumn("cum", sum(col("toks")).over(w) - col("toks"))
          .filter(col("cum") < 64)
          .select(col("doc_id"), col("source"), col("toks"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, source, md5(text) AS ok,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks
                   FROM documents),
                 c AS (SELECT doc_id, source, toks,
                     CAST(sum(toks) OVER (PARTITION BY source ORDER BY ok, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS BIGINT) AS cum
                   FROM t)
              SELECT doc_id, source, toks FROM c WHERE cum < 64 ORDER BY doc_id""")),

    // x52 — deterministic content-hash sharding: the reproducible global
    // shuffle of a training run. Shard = first md5 hex digit (16 shards;
    // scale takes more digits), position = rank within shard by (md5,
    // doc_id). Pure scan expressions + a per-shard window — the shard key
    // IS the x32 window mitigation, built in: no global sort anywhere, and
    // content addressing keeps the assignment stable under corpus
    // re-partitioning (doc_id renumbering changes nothing but tie-breaks).
    QueryDef("x52_content_shards",
      (s, d) => {
        val w = Window.partitionBy(col("shard")).orderBy(col("ok"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), md5(col("text")).as("ok"))
          .withColumn("shard",
            expr("CAST(instr('0123456789abcdef', substring(ok, 1, 1)) - 1 AS BIGINT)"))
          .withColumn("pos", row_number().over(w))
          .select(col("doc_id"), col("shard"), col("pos"))
          .orderBy("shard", "pos")
      },
      Some("""SELECT doc_id,
                     CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT) AS shard,
                     row_number() OVER (PARTITION BY substring(md5(text), 1, 1)
                       ORDER BY md5(text), doc_id) AS pos
              FROM documents ORDER BY shard, pos""")),

    // x58 — stratified content-hash split: train/val/test held out PER
    // SOURCE at exact ceil proportions (10% test, 10% val), assignment by
    // deterministic md5 order so the split survives doc_id renumbering and
    // corpus re-partitioning. The boundary test is INTEGER arithmetic —
    // (rn-1)*10 < n ⟺ rn ≤ ⌈n/10⌉ — because ceil(n * 0.1) differs between
    // decimal and binary float engines at n = 30 (3.0000000000000004 in
    // double rounds the ceiling up).
    QueryDef("x58_stratified_split",
      (s, d) => stratifiedSplit(s, d).orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, source, md5(text) AS ok FROM documents),
                   r AS (SELECT doc_id, source,
                           row_number() OVER (PARTITION BY source ORDER BY ok, doc_id) AS rn,
                           count(*) OVER (PARTITION BY source) AS n
                         FROM t)
              SELECT doc_id, source,
                     CASE WHEN (rn - 1) * 10 < n THEN 'test'
                          WHEN (rn - 1) * 5 < n THEN 'val'
                          ELSE 'train' END AS split
              FROM r ORDER BY doc_id""")),

    // x21 — deterministic stratified sampling: hash the CONTENT into 16
    // buckets (md5 first hex digit) and keep a per-language bucket quota —
    // the reproducible corpus-mixing primitive of a training-data pipeline
    // (rerunnable, no RNG state; at 100 TB it is a pure scan filter that
    // pushes nothing to the driver).
    QueryDef("x21_stratified_sample",
      (s, d) => {
        val bucket = (expr("instr('0123456789abcdef', substring(md5(text), 1, 1))") - 1).cast("long")
        val quota = when(col("lang") === "en", 8).when(col("lang") === "de", 4).otherwise(2)
        Tables.documents(s, d)
          .withColumn("bucket", bucket)
          .filter(col("bucket") < quota)
          .select(col("doc_id"), col("lang"), col("bucket"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
                     CAST(strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS BIGINT) AS bucket
              FROM documents
              WHERE strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 <
                    CASE WHEN lang = 'en' THEN 8 WHEN lang = 'de' THEN 4 ELSE 2 END
              ORDER BY doc_id""")),

    // x22 — overlapping token-window chunking (context-window preparation):
    // x22 — token-window chunking (shared tokenChunks helper).
    QueryDef("x22_chunking",
      (s, d) => tokenChunks(Tables.documents(s, d)).orderBy("doc_id", "chunk_no"),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                         FROM documents WHERE length(trim(text)) > 0),
                   c AS (SELECT doc_id, unnest(range(0, len(toks), 24)) AS o, toks FROM t)
              SELECT doc_id, o // 24 AS chunk_no,
                     array_to_string(toks[(o+1):(o+32)], ' ') AS chunk
              FROM c ORDER BY doc_id, chunk_no""")),

    // x26 — per-group quota sampling: keep N docs per language, picked by a
    // deterministic content-hash order (reproducible, no RNG; the per-source
    // quota primitive of corpus mixing). rank window per group — one shuffle.
    QueryDef("x26_group_quota_sample",
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("text")).asc, col("doc_id").asc)
        Tables.documents(s, d)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 20)
          .select(col("lang"), col("rnk").cast("long").as("rnk"), col("doc_id"))
          .orderBy("lang", "rnk")
      },
      Some("""SELECT lang, rnk, doc_id FROM (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rnk
                FROM documents) t
              WHERE rnk <= 20 ORDER BY lang, rnk""")),

    // x32 — sequence packing: assign docs (in doc_id order) to fixed-budget
    // training sequences by exclusive running token count div budget — the
    // deterministic contiguous-fill packing of a pretraining data loader.
    // One window cumsum + one aggregation; the window's global order is the
    // doc_id sort the pack order REQUIRES (at scale: pack per source shard
    // — partition the window by a shard key — exactly how loaders do it).
    QueryDef("x32_sequence_packing",
      (s, d) => {
        val w = Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("doc_id"),
            TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"))
          .withColumn("cum", sum(col("toks")).over(w) - col("toks"))
          .withColumn("seq_id", expr("cum div 512"))
          .groupBy(col("seq_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy("seq_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks
                   FROM documents),
                 c AS (SELECT doc_id, toks,
                     sum(toks) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS cum
                   FROM t)
              SELECT CAST(cum // 512 AS BIGINT) AS seq_id, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens,
                     min(doc_id) AS first_doc, max(doc_id) AS last_doc
              FROM c GROUP BY 1 ORDER BY 1""")),

    // x190 — JSONL training-shard export round-trip: the x80 discipline
    // on the format actual dataloaders consume. documents sharded by
    // doc_id % 8 → writeJsonlShards (gzip line-JSON + the shared
    // manifest: counts/bytes/files, content digests recounted from the
    // WRITTEN .json.gz files, per-file xxhash64 checksums, recorded DDL
    // schema) → validateShardsContent (the DEEP gate: listing + digest
    // recount + byte-checksum recount, format-dispatched off the
    // manifest) → readJsonlShards under the recorded schema → canonical
    // order. The oracle reads the PRE-export table, so a lost shard, an
    // encode/decode type drift, or a gzip-member corruption all fail the
    // row/hash compare.
    QueryDef("x190_jsonl_roundtrip",
      (s, d) => {
        val dir = exportScratchDir(d, "x190-jsonl")
        val counts = Export.writeJsonlShards(
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"), col("lang"), col("text"),
              (col("doc_id") % 8).cast("int").as("shard")),
          dir)
        val manifest = Export.validateShardsContent(s, dir)
        require(manifest == counts,
          s"jsonl manifest/written-counts mismatch: $manifest vs $counts")
        Export.readJsonlShards(s, dir)
          .select(col("doc_id"), col("source"), col("lang"), col("text"),
            col("shard"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, lang, text,
                     CAST(doc_id % 8 AS BIGINT) AS shard
              FROM documents ORDER BY doc_id""")),

    // x191 — the WebDataset-style TAR export round trip: the x190
    // discipline on the sequential-read format multimodal dataloaders
    // consume. Each document becomes one SAMPLE (a group of adjacent tar
    // members sharing the doc's key): `<key>.json` carries the non-binary
    // columns, `<key>.payload` carries a REAL binary member (the UTF-8
    // bytes of the text head — so the binary path is exercised with
    // content the oracle can reconstruct). writeTarShards (one
    // deterministic gzip ustar archive per shard, key-sorted, pinned
    // header fields) → validateShardsContent (listing + decoded-row digest
    // recount + per-file xxhash64 — the digest pass re-DECODES every
    // archive, so member framing, json parse, and binary payloads are all
    // on the hash path) → readTarShards under the manifest's recorded
    // schema → binary decoded back to string for the oracle compare. A
    // lost archive, a member-boundary bug, or a payload flip all fail the
    // row/hash compare. Scale: one archive per shard written by one task
    // (rows hash-partitioned by shard), read back one task per archive,
    // one member in memory at a time — the dataloader IO shape.
    QueryDef("x191_wds_roundtrip",
      (s, d) => {
        val dir = exportScratchDir(d, "x191-wds")
        val counts = Export.writeTarShards(
          Tables.documents(s, d)
            .select(
              concat(lit("doc-"),
                lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
              col("doc_id"), col("source"), col("lang"), col("text"),
              encode(substring(col("text"), 1, 48), "UTF-8").as("payload"),
              (col("doc_id") % 8).cast("int").as("shard")),
          dir, compression = "gzip")
        val manifest = Export.validateShardsContent(s, dir)
        require(manifest == counts,
          s"tar manifest/written-counts mismatch: $manifest vs $counts")
        Export.readTarShards(s, dir)
          .select(col("doc_id"), col("source"), col("lang"), col("text"),
            decode(col("payload"), "UTF-8").as("payload_str"), col("shard"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, lang, text,
                     substr(text, 1, 48) AS payload_str,
                     CAST(doc_id % 8 AS BIGINT) AS shard
              FROM documents ORDER BY doc_id""")),

    // x193 — the TFRecord export round trip, completing the dataloader
    // format quartet (parquet x80, JSONL x190, WebDataset tar x191,
    // TFRecord here): each document becomes one tf.train.Example —
    // string/binary columns as BytesList, integrals as Int64List, a
    // float32 FeatureList column, and an int64 ARRAY column riding a
    // packed Int64List — framed per the public TFRecord spec (length +
    // masked CRC32C + payload + masked CRC32C, both verified on every
    // read) and zstd-compressed, so the whole codec chain (proto encode,
    // framing, compression, manifest digests recounted via full decode)
    // is on the oracle path. Float exactness: qscore is quarters of
    // 0..6 — exact in float32 AND in DuckDB's double arithmetic — and
    // the array column compares as a joined string (the driver hash has
    // no list form). A flipped byte anywhere fails the record CRC; a
    // lost file fails the manifest.
    QueryDef("x193_tfrecord_roundtrip",
      (s, d) => {
        val dir = exportScratchDir(d, "x193-tfr")
        val counts = Export.writeTfrecordShards(
          Tables.documents(s, d).select(
            col("doc_id"), col("source"), col("lang"), col("text"),
            col("n_chars"),
            encode(substring(col("text"), 1, 32), "UTF-8").as("payload"),
            ((col("doc_id") % 7).cast("float") * lit(0.25f)).as("qscore"),
            array(col("doc_id"), col("n_chars")).as("ids"),
            (col("doc_id") % 8).cast("int").as("shard")),
          dir, compression = "zstd")
        val manifest = Export.validateShardsContent(s, dir)
        require(manifest == counts,
          s"tfrecord manifest/written-counts mismatch: $manifest vs $counts")
        Export.readTfrecordShards(s, dir)
          .select(col("doc_id"), col("source"), col("lang"), col("text"),
            col("n_chars"),
            decode(col("payload"), "UTF-8").as("payload_str"),
            col("qscore").cast("double").as("qscore"),
            concat_ws(",",
              expr("transform(ids, x -> CAST(x AS STRING))")).as("ids_str"),
            col("shard"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, lang, text, n_chars,
                     substr(text, 1, 32) AS payload_str,
                     CAST(doc_id % 7 AS DOUBLE) * 0.25 AS qscore,
                     doc_id || ',' || n_chars AS ids_str,
                     CAST(doc_id % 8 AS BIGINT) AS shard
              FROM documents ORDER BY doc_id""")),

    // x202 — the WARC crawl-container round trip: the x190/x191/x193
    // synthesized-container discipline on the format a crawl actually
    // arrives in (Common Crawl's WARC 1.0). Each document becomes one
    // `response` record — deterministic record id from the doc key,
    // WARC-Target-URI from an x200-style synthesized URL, HTTP status
    // varying by id, text head as the body — written one WARC file per
    // shard (plus the per-file warcinfo record readers must skip), then
    // validateShardsContent (listing + decoded-row digest recount +
    // per-file xxhash64 — the digest pass re-parses every record, so WARC
    // framing, HTTP split, and payload bytes are all on the hash path),
    // then readWarcShards and doc_id recovered from the key by synthesis
    // arithmetic. The oracle recomputes every extracted field from the
    // documents table: a framing bug, a header drift, or a payload flip
    // all fail the row/hash compare. Scale: one record in memory at a
    // time on both sides; a url/status metadata scan skips payloads
    // without allocation (record-level pruning, pinned in ExportSpec).
    QueryDef("x202_warc_roundtrip",
      (s, d) => {
        val dir = exportScratchDir(d, "x202-warc")
        val counts = Export.writeWarcShards(
          Tables.documents(s, d).select(
            concat(lit("doc-"),
              lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
            concat(lit("https://"), col("source"),
              lit(".example.com/docs/item"),
              col("doc_id").cast("string")).as("url"),
            when(col("doc_id") % 50 === 0, lit(404)).otherwise(lit(200))
              .cast("int").as("status"),
            lit("text/html").as("mime"),
            encode(substring(col("text"), 1, 64), "UTF-8").as("payload"),
            (col("doc_id") % 8).cast("int").as("shard")),
          dir, compression = "gzip")
        val manifest = Export.validateShardsContent(s, dir)
        require(manifest == counts,
          s"warc manifest/written-counts mismatch: $manifest vs $counts")
        Export.readWarcShards(s, dir)
          .select(
            expr("CAST(substring(key, 5, 12) AS BIGINT)").as("doc_id"),
            col("url"), col("status").cast("long").as("status"), col("mime"),
            decode(col("payload"), "UTF-8").as("payload_str"),
            col("payload_len"), col("shard"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     'https://' || source || '.example.com/docs/item' ||
                       CAST(doc_id AS VARCHAR) AS url,
                     CAST(CASE WHEN doc_id % 50 = 0 THEN 404 ELSE 200 END
                       AS BIGINT) AS status,
                     'text/html' AS mime,
                     substr(text, 1, 64) AS payload_str,
                     CAST(octet_length(encode(substr(text, 1, 64)))
                       AS BIGINT) AS payload_len,
                     CAST(doc_id % 8 AS BIGINT) AS shard
              FROM documents ORDER BY doc_id""")),

    // x202b — streaming WARC ingest parity gate: the x161b discipline on
    // the crawl reader. Re-read the x202 export through a REAL file-source
    // streaming query (readWarcStream: binaryFile source + the same
    // record parser, exactly-once file tracking from the checkpointed
    // file log) and assert the streamed record set equals the batch
    // readWarcShards read — so a drift between the streaming and batch
    // ingest paths fails the correctness gate, not only CI. Bounded: the
    // export is the x202 scratch (one micro-batch at gate scale).
    QueryDef("x202b_warc_stream_gate",
      (s, d) => {
        import s.implicits._
        val dir = exportScratchDir(d, "x202b-warc")
        Export.writeWarcShards(
          Tables.documents(s, d).select(
            concat(lit("doc-"),
              lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
            concat(lit("https://"), col("source"),
              lit(".example.com/docs/item"),
              col("doc_id").cast("string")).as("url"),
            lit(200).cast("int").as("status"),
            lit("text/html").as("mime"),
            encode(substring(col("text"), 1, 48), "UTF-8").as("payload"),
            (col("doc_id") % 4).cast("int").as("shard")),
          dir, compression = "gzip")
        def keyOf(r: org.apache.spark.sql.Row) =
          (r.getString(0), r.getString(1), r.getInt(2), r.getString(3),
            new String(r.getAs[Array[Byte]](4), "UTF-8"), r.getLong(5))
        val expected = Export.readWarcShards(s, dir)
          .select(col("key"), col("url"), col("status"), col("mime"),
            col("payload"), col("payload_len"))
          .collect().map(keyOf).toSet
        val acc = scala.collection.mutable.Set
          .empty[(String, String, Int, String, String, Long)]
        val q = Export.readWarcStream(s, dir).writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            val got = b.select(col("key"), col("url"), col("status"),
              col("mime"), col("payload"), col("payload_len"))
              .collect().map(keyOf)
            acc.synchronized { acc ++= got }
            ()
          }
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        Seq(acc.toSet == expected && expected.nonEmpty)
          .toDF("warc_stream_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS warc_stream_ok")),

    // x210b — streaming WET ingest parity gate: the x202b discipline on
    // the extracted-text container. Re-read a WET export through a REAL
    // file-source streaming query (readWetStream: path-only binaryFile
    // tracking + the conversion-record parser + strict UTF-8 decode) in
    // ≥2 micro-batches and assert the streamed record set equals the
    // batch readWetShards read — a drift between the streaming and batch
    // WET paths fails the correctness gate, not only CI. Bounded: a
    // 1-in-3 doc subset, 4 shard files under maxFilesPerTrigger=2.
    QueryDef("x210b_wet_stream_gate",
      (s, d) => {
        import s.implicits._
        val dir = exportScratchDir(d, "x210b-wet")
        Export.writeWetShards(
          Tables.documents(s, d).filter(col("doc_id") % 3 === 0).select(
            concat(lit("doc-"),
              lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
            concat(lit("https://"), col("source"),
              lit(".example.com/docs/item"),
              col("doc_id").cast("string")).as("url"),
            substring(col("text"), 1, 96).as("text"),
            (col("doc_id") % 4).cast("int").as("shard")),
          dir, compression = "gzip")
        def keyOf(r: org.apache.spark.sql.Row) =
          (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))
        val expected = Export.readWetShards(s, dir)
          .select(col("key"), col("url"), col("text"), col("text_len"))
          .collect().map(keyOf).toSet
        val acc = scala.collection.mutable.Set
          .empty[(String, String, String, Long)]
        val q = Export.readWetStream(s, dir,
            options = Map("maxFilesPerTrigger" -> "2")).writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            val got = b.select(col("key"), col("url"), col("text"),
              col("text_len")).collect().map(keyOf)
            acc.synchronized { acc ++= got }
            ()
          }
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        Seq(acc.toSet == expected && expected.nonEmpty)
          .toDF("wet_stream_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS wet_stream_ok")),

    // x202c — CDX keyed-fetch parity gate: the selective re-read path
    // (readWarcRecords: CDX sidecar → one seek + one gzip-member read
    // per key) must return byte-identical rows to the sequential
    // readWarcShards scan for the same keys, and the index must cover
    // every response record. A wrong offset, a member-boundary bug, a
    // sidecar/container drift, or a key mapped to the wrong record all
    // fail the gate. Bounded: 1-in-5 docs, ~1-in-7 keys probed.
    QueryDef("x202c_warc_cdx_gate",
      (s, d) => {
        import s.implicits._
        val dir = exportScratchDir(d, "x202c-cdx")
        val docs = Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        val total = docs.count()
        Export.writeWarcShards(
          docs.select(
            concat(lit("doc-"),
              lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
            concat(lit("https://"), col("source"),
              lit(".example.com/d"), col("doc_id").cast("string")).as("url"),
            lit(200).cast("int").as("status"),
            lit("text/html").as("mime"),
            encode(substring(col("text"), 1, 96), "UTF-8").as("payload"),
            (col("doc_id") % 4).cast("int").as("shard")),
          dir, compression = "gzip")
        val idx = Export.readWarcRecordIndex(s, dir)
        val nIdx = idx.count()
        val probe = idx.filter(pmod(xxhash64(col("key")), lit(7)) === 0)
          .select("key").collect().map(_.getString(0)).toSeq
        def keyOf(r: org.apache.spark.sql.Row) =
          (r.getString(0), r.getString(1), r.getInt(2), r.getString(3),
            java.util.Base64.getEncoder.encodeToString(
              r.getAs[Array[Byte]](4)), r.getLong(5), r.getLong(6))
        val seeked = Export.readWarcRecords(s, dir, probe)
          .collect().map(keyOf).toSet
        val scanned = Export.readWarcShards(s, dir)
          .filter(col("key").isin(probe: _*))
          .collect().map(keyOf).toSet
        // and the record-SPLIT full scan (CDX slices as task units — the
        // unsharded-dump parallelism path) must equal the sequential scan
        val full = Export.readWarcShards(s, dir)
          .collect().map(keyOf).toSet
        val splitScan = Export.readWarcShards(s, dir, splitRecords = 25)
          .collect().map(keyOf).toSet
        Seq(probe.nonEmpty && nIdx == total &&
            seeked == scanned && seeked.size == probe.size &&
            splitScan == full && full.size == total)
          .toDF("warc_cdx_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS warc_cdx_ok")),

    // x210 — WET extracted-text container roundtrip: the Common Crawl
    // WARC→WET derivation's OUTPUT format as a first-class export.
    // Documents become WARC `conversion` records (text/plain blocks,
    // WARC-Refers-To the sibling response record) through the SAME
    // writer lifecycle as x202 (deterministic bytes, per-record gzip
    // members, CDX sidecars, manifest digest gates — validated here via
    // validateShardsContent's full re-parse), read back record-by-record
    // with strict UTF-8 decode. The fixture text carries newlines and
    // non-ASCII, so CRLF-inside-block framing and multi-byte decode are
    // both on the oracle hash path (text_len is the BYTE length — it
    // differs from the char count exactly when multi-byte chars are
    // present). ExportSpec adds extraction-composition, pruning, interop
    // and refusal cases.
    QueryDef("x210_wet_roundtrip",
      (s, d) => {
        val dir = exportScratchDir(d, "x210-wet")
        val counts = Export.writeWetShards(
          Tables.documents(s, d).select(
            concat(lit("doc-"),
              lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
            concat(lit("https://"), col("source"),
              lit(".example.com/docs/item"),
              col("doc_id").cast("string")).as("url"),
            substring(col("text"), 1, 120).as("text"),
            (col("doc_id") % 6).cast("int").as("shard")),
          dir, compression = "gzip")
        val manifest = Export.validateShardsContent(s, dir)
        require(manifest == counts,
          s"wet manifest/written-counts mismatch: $manifest vs $counts")
        Export.readWetShards(s, dir)
          .select(
            expr("CAST(substring(key, 5, 12) AS BIGINT)").as("doc_id"),
            col("url"), col("text"), col("text_len"), col("shard"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     'https://' || source || '.example.com/docs/item' ||
                       CAST(doc_id AS VARCHAR) AS url,
                     substr(text, 1, 120) AS text,
                     CAST(octet_length(encode(substr(text, 1, 120)))
                       AS BIGINT) AS text_len,
                     CAST(doc_id % 6 AS BIGINT) AS shard
              FROM documents ORDER BY doc_id""")),

    // x205 — the crawl pipeline END TO END as one oracle-checked row:
    // synthesize pages (the x199 HTML wrapper) and URLs (the x200 rule
    // exerciser), pack them into REAL WARC response records, write one
    // container per shard, read back through readWarcShards, then run
    // the ingest chain on what came OUT of the container — htmlExtract
    // on the decoded payload, urlNormalize/urlHost on the record's
    // WARC-Target-URI. The oracle recomputes main_text and url_canon as
    // pure functions of the documents table (the x199 + x200 oracle
    // chains composed), so a WARC framing bug, an HTTP header drift, a
    // payload flip, or an extraction/canonicalization regression
    // ANYWHERE in the chain fails the hash. This is the integration
    // proof the per-stage entries can't give: container -> bytes ->
    // text -> canonical identity all on one hash path.
    QueryDef("x205_crawl_pipeline",
      (s, d) => {
        val dir = exportScratchDir(d, "x205-crawl")
        Export.writeWarcShards(crawlSynthFrame(s, d), dir,
          compression = "gzip")
        crawlExtractChain(Export.readWarcShards(s, dir))
          .orderBy("doc_id")
      },
      Some(s"""WITH $crawlOracleCtes
              SELECT x.doc_id,
                scheme || '://' || ff.host || path1 ||
                  (CASE WHEN length(q1) = 0 THEN '' ELSE '?' || q1 END)
                  AS url_canon,
                bare_host AS host,
                x.n_blocks, x.n_kept, x.main_text
              FROM x JOIN ff ON ff.doc_id = x.doc_id
              ORDER BY x.doc_id""")),

    // x205b — the STREAMING crawl-ingest pipeline end to end, with a
    // crash injected in the at-least-once window: readWarcStream pulls
    // the x205-synthesized WARC containers in ≥2 UNEVEN micro-batches
    // (8 files, maxFilesPerTrigger=3 → 3/3/2), each batch runs the full
    // ingest chain (utf8 validity gate → mojibake repair → htmlExtract →
    // urlNormalize) and lands via appendShards(epoch = batchId, writerId)
    // — and the FIRST attempt of batch 0 dies AFTER the sink committed
    // its epoch but BEFORE the engine wrote its commit marker, so the
    // restart from the same checkpoint REPLAYS batch 0 into the epoch
    // log's skip path. The gate: the read-back union of all streamed
    // epochs hash-equals the x205 batch frame computed over the same
    // containers. This is the README's flagship exactly-once claim as a
    // driver-visible oracle row — container → stream → extract →
    // canonical → idempotent export on ONE comparison. Bounded: gate
    // runs at fixture scale; every stage's scale posture is its batch
    // entry's (x202b, x199, x200, ExportSpec epochs).
    QueryDef("x205b_crawl_stream_gate",
      (s, d) => {
        import s.implicits._
        val root = exportScratchDir(d, "x205b-crawl")
        val src = s"$root/src"
        val out = s"$root/out"
        val ckpt = s"$root/ckpt"
        // out + checkpoint must be FRESH per run (a stale epoch log would
        // skip every batch and compare garbage); the src export overwrites
        Seq(out, ckpt).foreach(p =>
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
        Export.writeWarcShards(crawlSynthFrame(s, d, onlyEvery = 10), src,
          compression = "gzip")
        val expected = crawlExtractChain(Export.readWarcShards(s, src))
          .withColumn("shard", (col("doc_id") % 4).cast("int"))
          .collect().map(_.toSeq).toSet
        val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
        def runStream(): Unit = {
          val q = Export.readWarcStream(s, src,
              options = Map("maxFilesPerTrigger" -> "3"))
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              Export.appendShards(
                crawlExtractChain(b)
                  .withColumn("shard", (col("doc_id") % 4).cast("int")),
                out, epoch = Some(id), writerId = Some("x205b-ingest"))
              // first attempt of batch 0: die in the window between the
              // sink's epoch commit and the engine's commit marker — the
              // restart must replay batch 0 and the epoch log must skip it
              if (id == 0L && killed.compareAndSet(false, true))
                throw new RuntimeException("x205b injected crash")
              ()
            }
            .start()
          try q.processAllAvailable()
          catch { case _: Exception => () }
          finally q.stop()
        }
        runStream() // dies after batch 0's sink commit
        runStream() // resumes: replays batch 0 (skipped), runs the rest
        val got = Export.readShards(s, out, Seq(0L, 1L, 2L, 3L))
          .collect().map(_.toSeq).toSet
        val epochs = Export.committedEpochs(s, out)
        Seq(killed.get() && epochs.size >= 2 &&
            got == expected && expected.nonEmpty)
          .toDF("crawl_stream_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS crawl_stream_ok")),

    // x214 — the full WARC→WET derivation on ONE hash path: Common
    // Crawl's actual production step. Synthesized pages pack into real
    // WARC response records, read back through readWarcShards, run the
    // x205 ingest chain (utf8 gate → htmlExtract → urlNormalize), and
    // the EXTRACTED text goes back OUT as a real WET container
    // (conversion records keyed like their source responses, canonical
    // URL as the target URI) — then the WET read-back is what gets
    // hashed. The oracle recomputes main_text and url_canon as pure
    // functions of documents (the shared crawlOracleCtes chain), plus
    // the WET byte length — so a framing bug, extraction drift,
    // canonicalization drift, conversion-record corruption, or a strict-
    // decode regression ANYWHERE across BOTH containers fails one hash.
    QueryDef("x214_crawl_wet_pipeline",
      (s, d) => {
        val warcDir = exportScratchDir(d, "x214-warc")
        val wetDir = exportScratchDir(d, "x214-wet")
        Export.writeWarcShards(crawlSynthFrame(s, d), warcDir,
          compression = "gzip")
        val extracted = crawlExtractChain(Export.readWarcShards(s, warcDir))
        Export.writeWetShards(
          extracted.select(
            concat(lit("doc-"),
              lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
            col("url_canon").as("url"),
            col("main_text").as("text"),
            (col("doc_id") % 4).cast("int").as("shard")),
          wetDir, compression = "gzip")
        Export.readWetShards(s, wetDir)
          .select(
            expr("CAST(substring(key, 5, 12) AS BIGINT)").as("doc_id"),
            col("url").as("url_canon"), col("text").as("main_text"),
            col("text_len"), col("shard"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $crawlOracleCtes
              SELECT x.doc_id,
                scheme || '://' || ff.host || path1 ||
                  (CASE WHEN length(q1) = 0 THEN '' ELSE '?' || q1 END)
                  AS url_canon,
                x.main_text,
                CAST(octet_length(encode(x.main_text)) AS BIGINT) AS text_len,
                CAST(x.doc_id % 4 AS BIGINT) AS shard
              FROM x JOIN ff ON ff.doc_id = x.doc_id
              ORDER BY x.doc_id""")),

    // x196 — Z-order (Morton) layout key for two-dimensional scan
    // pruning: min-max normalize (l_partkey, l_suppkey) onto 16 bits each
    // in pure BIGINT arithmetic, interleave via the mask ladder — all
    // codegen'd shifts/masks/DIV, no UDFs — so a range-partitioned write
    // sorted by zval gives parquet row groups narrow on BOTH dimensions
    // (the locality proof is in ZorderSpec; this row pins the arithmetic
    // itself, which DuckDB reproduces bit-for-bit with `//` and the same
    // mask ladder). Scale: one bounds aggregate broadcast onto the scan;
    // the z computation is map-only.
    QueryDef("x196_zorder_cluster",
      (s, d) => graft.ops.Zorder.withZValue(
          Tables.lineitem(s, d).select(col("l_orderkey"),
            col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
          "l_partkey", "l_suppkey")
        .orderBy("zval", "l_orderkey", "l_linenumber", "l_partkey",
          "l_suppkey"),
      Some("""WITH b AS (SELECT min(l_partkey) AS alo, max(l_partkey) AS ahi,
                                min(l_suppkey) AS blo, max(l_suppkey) AS bhi
                         FROM lineitem),
                   n AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                           CASE WHEN ahi > alo
                             THEN ((l_partkey - alo) * 65535) // (ahi - alo)
                             ELSE 0 END AS na,
                           CASE WHEN bhi > blo
                             THEN ((l_suppkey - blo) * 65535) // (bhi - blo)
                             ELSE 0 END AS nb
                         FROM lineitem, b),
                  s1 AS (SELECT *, (na | (na << 8)) & 16711935 AS a1,
                                   (nb | (nb << 8)) & 16711935 AS b1 FROM n),
                  s2 AS (SELECT *, (a1 | (a1 << 4)) & 252645135 AS a2,
                                   (b1 | (b1 << 4)) & 252645135 AS b2 FROM s1),
                  s3 AS (SELECT *, (a2 | (a2 << 2)) & 858993459 AS a3,
                                   (b2 | (b2 << 2)) & 858993459 AS b3 FROM s2),
                  s4 AS (SELECT *, (a3 | (a3 << 1)) & 1431655765 AS a4,
                                   (b3 | (b3 << 1)) & 1431655765 AS b4 FROM s3)
              SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                     CAST(a4 | (b4 << 1) AS BIGINT) AS zval
              FROM s4
              ORDER BY zval, l_orderkey, l_linenumber, l_partkey, l_suppkey""")),

    // x73 — the END-TO-END curation pipeline as one artifact: exact dedup →
    // eval holdout → per-source relative quality filter (top half) →
    // decontamination against the held-out eval set → deterministic
    // content-hash sharding. Every stage is an operator proven above
    // (x01/x57/x29/x45/x52); this entry witnesses that they COMPOSE — the
    // "switch your pipeline to this library" query — and the whole chain is
    // one DuckDB-oracle row set. Scale: each stage keeps its own posture
    // (hash agg / per-source window / 8-byte-key bipartite join + anti-join
    // / scan-local shard key); nothing in the composition adds a shuffle
    // beyond the stages themselves.
    QueryDef("x73_curation_pipeline",
      (s, d) => curationShared(s, d),
      Some(curationOracle)),

    // x80 — the export sink's ROUND-TRIP on the board as an oracle row:
    QueryDef("x80_export_roundtrip",
      (s, d) => {
        // The full loop a training run actually exercises: curate (x73's
        // SHARED output frame — the export sink's cost is the round-trip,
        // not a second run of the whole pipeline) → writeShards
        // (partitioned parquet + Hadoop-FS manifest) → loader
        // validateShards (per-shard file count + byte integrity) →
        // readShards of EVERY manifest shard → canonical order. The oracle
        // is x73's SQL verbatim, so the round-trip is hash-checked against
        // the pre-export frame — a lost shard, a short manifest, or a
        // type-drifting partition column all fail the row/hash compare.
        // One STABLE scratch dir per sf-dir (Overwrite mode reuses it), so
        // repeated invocations in one JVM — warm-up, timed, AQE passes —
        // bound disk use and register exactly one cleanup hook.
        val dir = exportScratchDir(d)
        val counts = Export.writeShards(curationShared(s, d), dir)
        val manifest = Export.validateShards(s, dir)
        require(manifest == counts,
          s"manifest/written-counts mismatch: $manifest vs $counts")
        Export.readShards(s, dir, manifest.keySet.toSeq.sorted)
          .select(col("doc_id"), col("source"), col("score"),
            // partition-directory values read back type-inferred (int)
            col("shard").cast("long").as("shard"), col("pos"))
          .orderBy("shard", "pos")
      },
      Some(curationOracle)),

    // x221 — export COMPACTION on the board as an oracle row: the daily
    // append → nightly compact lifecycle end-to-end. Three epochs land
    // (writeShards + two explicit-epoch appends), compactShards merges
    // each shard's files to one, and the READ-BACK OF THE COMPACTED
    // STATE is what gets hashed against a pure function of documents —
    // so a lost row, a doubled row, a digest drift, or a broken swap all
    // fail the row/hash compare. The entry additionally requires, inline:
    // counts unchanged by compaction, full revalidation green on the
    // compacted state (recount + per-file checksums — proving the
    // fold-carried digests match what a recount derives), and a REPLAYED
    // pre-compaction epoch refusing at the watermark (the commit log's
    // exactly-once contract surviving the collapse, driver-visible).
    QueryDef("x221_compact_roundtrip",
      (s, d) => {
        val dir = exportScratchDir(d, "x221-compact")
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            (col("doc_id") % 5).cast("long").as("shard"))
        Export.writeShards(docs.filter(col("doc_id") % 3 === 0), dir)
        Export.appendShards(docs.filter(col("doc_id") % 3 === 1), dir,
          epoch = Some(1L))
        Export.appendShards(docs.filter(col("doc_id") % 3 === 2), dir,
          epoch = Some(2L))
        val before = Export.readManifest(s, dir)
        val counts = Export.compactShards(s, dir)
        require(counts == before,
          s"x221: compaction changed counts: $counts vs $before")
        require(Export.validateShardsContent(s, dir) == counts,
          "x221: post-compaction revalidation mismatch")
        require(Export.committedEpochs(s, dir).isEmpty,
          "x221: epochs did not collapse to the watermark")
        val refused =
          try {
            Export.appendShards(docs.filter(col("doc_id") % 3 === 1), dir,
              epoch = Some(1L))
            false
          } catch {
            case e: IllegalArgumentException =>
              e.getMessage.contains("watermark")
          }
        require(refused,
          "x221: replayed pre-compaction epoch did not refuse")
        Export.readShards(s, dir, counts.keySet.toSeq.sorted)
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("shard").cast("long").as("shard"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, n_chars,
                     CAST(doc_id % 5 AS BIGINT) AS shard
              FROM documents ORDER BY doc_id""")),

    // x224 — epoch RETENTION on the board as an oracle row: the daily
    // append → retention-expire → re-ingest lifecycle end-to-end,
    // completing x221's compaction story (every export lifecycle op now
    // has a driver-visible row). A base write plus two appended epochs
    // land (each lifecycle action is fixed driver overhead, not data
    // cost — the fixture carries the minimum that still exercises
    // every contract; ExportSpec covers the richer rule combinations);
    // expireEpochs(keepLast = 1) drops epoch 1's files by digest
    // SUBTRACTION (only the dropped files re-read — O(expired), never a
    // corpus rescan); full revalidation (recount + per-file checksums)
    // then proves the subtracted digests match what a recount derives.
    // The expired epoch's documents RE-INGEST without an explicit epoch
    // id and must land ABOVE the expiry watermark (auto-epoch resume —
    // a recycled id would be indistinguishable from a resurrecting
    // replay, which the inline require proves refuses). The READ-BACK OF
    // THE FINAL STATE is what gets hashed: base + surviving epochs +
    // re-ingested batch ≡ the whole documents table, so a row lost to
    // the swap, a digest drift, a watermark bug, or a broken park/heal
    // all fail the row/hash compare — while the intermediate state
    // really did have epoch 1's rows gone (the post-expiry revalidation
    // counts say so, inline).
    QueryDef("x224_expire_roundtrip",
      (s, d) => {
        val dir = exportScratchDir(d, "x224-expire")
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            (col("doc_id") % 5).cast("long").as("shard"))
        Export.writeShards(docs.filter(col("doc_id") % 3 === 0), dir)
        Export.appendShards(docs.filter(col("doc_id") % 3 === 1), dir,
          epoch = Some(1L))
        Export.appendShards(docs.filter(col("doc_id") % 3 === 2), dir,
          epoch = Some(2L))
        val epoch1 = docs.filter(col("doc_id") % 3 === 1)
        val before = Export.readManifest(s, dir)
        val counts = Export.expireEpochs(s, dir, keepLast = Some(1))
        require(Export.committedEpochs(s, dir) == Set(2L),
          "x224: keepLast = 1 must leave exactly epoch 2")
        val droppedRows = before.values.sum - counts.values.sum
        require(droppedRows > 0 && counts.values.sum > 0,
          s"x224: expiry must drop epoch 1's rows and keep the rest " +
            s"(dropped $droppedRows of ${before.values.sum})")
        require(Export.validateShardsContent(s, dir) == counts,
          "x224: post-expiry revalidation mismatch — digest subtraction " +
            "does not match a recount of the surviving files")
        val refused =
          try {
            Export.appendShards(epoch1, dir, epoch = Some(1L)); false
          } catch {
            case e: IllegalArgumentException =>
              e.getMessage.contains("expiry")
          }
        require(refused,
          "x224: replayed expired epoch did not refuse at the expiry " +
            "watermark")
        Export.appendShards(epoch1, dir)
        require(Export.committedEpochs(s, dir) == Set(2L, 3L),
          "x224: re-ingest must auto-assign the epoch above the expiry " +
            "watermark (expected 3)")
        // final-state content proof is the ORACLE HASH below (plus the
        // manifest counts here) — a second full revalidation would
        // recount+rehash the whole export again for rows the hash row
        // already adjudicates; the expensive recount proof belongs to
        // the subtraction step above
        require(Export.readManifest(s, dir) == before,
          "x224: final manifest counts do not match the pre-expiry state " +
            "after re-ingest")
        Export.readShards(s, dir, before.keySet.toSeq.sorted)
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("shard").cast("long").as("shard"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, n_chars,
                     CAST(doc_id % 5 AS BIGINT) AS shard
              FROM documents ORDER BY doc_id""")),

    // x75 — packing-efficiency curve: the x135 packPlan layout evaluated
    // at several sequence budgets at once — n_seqs, packed tokens, and the
    // utilization fraction per budget — the diagnostic that picks a
    // training sequence length (too-long budgets waste capacity on the
    // final partial fill of each sequence; the curve makes the trade
    // visible). The curve runs off the SHARED two-phase prefix-sum
    // coordinates (Pack.packPlan — cum_before is capacity-independent, so
    // the x135 frame serves every budget): no global unpartitioned window
    // anywhere, the bounded-window layout a 100 TB user runs as-is.
    // Budgets explode off the computed running total (a per-budget branch
    // would re-run the whole layout three times). x32 keeps the textbook
    // doc_id-ordered global-cumsum form for contrast; this entry is the
    // scale path.
    QueryDef("x75_packing_efficiency",
      (s, d) => packPlanShared(s, d)
        .select(col("doc_id"), col("n_tokens").as("toks"),
          col("cum_before").as("cum"))
        .withColumn("budget",
          explode(array(lit(128L), lit(512L), lit(2048L))))
        .withColumn("seq_id", expr("cum div budget"))
        .groupBy(col("budget"), col("seq_id"))
        .agg(sum(col("toks")).as("seq_toks"))
        .groupBy(col("budget"))
        .agg(count(lit(1)).as("n_seqs"), sum(col("seq_toks")).as("n_tokens"))
        .select(col("budget"), col("n_seqs"), col("n_tokens"),
          round(col("n_tokens").cast("double") /
            (col("n_seqs") * col("budget")).cast("double"), 6).as("utilization"))
        .orderBy("budget"),
      Some("""WITH t AS (SELECT doc_id,
                     CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                 c AS (SELECT doc_id, toks,
                     CAST(coalesce(sum(toks) OVER (ORDER BY okey, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cum
                   FROM t),
                 b AS (SELECT unnest([128, 512, 2048]) AS budget),
                 s AS (SELECT b.budget, CAST(c.cum // b.budget AS BIGINT) AS seq_id,
                              sum(c.toks) AS seq_toks
                       FROM c CROSS JOIN b GROUP BY 1, 2)
              SELECT CAST(budget AS BIGINT) AS budget,
                     count(*) AS n_seqs,
                     CAST(sum(seq_toks) AS BIGINT) AS n_tokens,
                     round(CAST(sum(seq_toks) AS DOUBLE)
                           / (count(*) * budget), 6) AS utilization
              FROM s GROUP BY budget ORDER BY budget""")),

    // x79 — quality-weighted epoch assignment: the data-recipe step that
    // UP-SAMPLES good sources (the x44 token-budget mix bounds, this one
    // repeats): sources ranked by mean quality (exact integer score sums;
    // the one double division is identical IEEE in both engines, ties
    // broken by source name), top quarter trains 3 epochs, top half 2,
    // rest 1; each doc emits one row per epoch via a sequence explode.
    // The rank runs over the ~|sources| aggregate rows, never the docs.
    QueryDef("x79_source_epochs",
      (s, d) => {
        val perSrc = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(sum(TextAnalysis.qualityScoreInt(col("text"))).as("qsum"),
            count(lit(1)).as("n"))
        val wr = Window.orderBy(
          (col("qsum").cast("double") / col("n").cast("double")).desc,
          col("source"))
        val wn = Window.partitionBy(lit(1))
        val epochs = perSrc
          .withColumn("rnk", row_number().over(wr))
          .withColumn("nsrc", count(lit(1)).over(wn))
          .select(col("source"),
            when(col("rnk") * 4 <= col("nsrc"), 3L)
              .when(col("rnk") * 2 <= col("nsrc"), 2L)
              .otherwise(1L).as("n_epochs"))
        Tables.documents(s, d).select(col("doc_id"), col("source"))
          .join(broadcast(epochs), "source")
          .select(col("doc_id"), col("source"),
            explode(expr("sequence(1L, n_epochs)")).as("epoch"))
          .orderBy("doc_id", "epoch")
      },
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH q AS (SELECT doc_id, source, CAST(floor((
                  least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                + (1.0 - least(CAST(p AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                ) * 10000.0 + 0.5) AS BIGINT) AS qi
              FROM (SELECT doc_id, source,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                      length(text) AS ch,
                      len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS p,
                      len(regexp_extract_all(text, '[A-Z]')) AS u,
                      len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                    FROM documents) t),
                ps AS (SELECT source, sum(qi) AS qsum, count(*) AS n FROM q GROUP BY 1),
                r AS (SELECT source,
                        row_number() OVER (ORDER BY CAST(qsum AS DOUBLE) / n DESC, source) AS rnk,
                        count(*) OVER () AS nsrc
                      FROM ps),
                e AS (SELECT source,
                        CASE WHEN rnk * 4 <= nsrc THEN 3
                             WHEN rnk * 2 <= nsrc THEN 2
                             ELSE 1 END AS n_epochs
                      FROM r)
            SELECT d.doc_id, d.source, CAST(unnest(range(1, e.n_epochs + 1)) AS BIGINT) AS epoch
            FROM documents d JOIN e USING (source)
            ORDER BY doc_id, epoch"""
      }),

    // x84 — shard balance audit: per x52 content-hash shard, doc and token
    // counts plus each shard's parts-per-million share of the corpus — the
    // operational companion of the export sink (an unbalanced shard is a
    // dataloader straggler; md5 sharding should sit near 62,500 ppm each
    // on 16 shards). Shares are integer ppm (exact cross-engine, no float
    // division); totals ride as a window over the 16 aggregate rows.
    QueryDef("x84_shard_balance",
      (s, d) => {
        val wAll = Window.partitionBy(lit(1))
        Tables.documents(s, d)
          .select(
            expr("CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT)").as("shard"),
            TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
          .withColumn("total_docs", sum(col("n_docs")).over(wAll))
          .withColumn("total_tokens", sum(col("n_tokens")).over(wAll))
          .withColumn("doc_ppm", expr("n_docs * 1000000 div total_docs"))
          .withColumn("token_ppm", expr("n_tokens * 1000000 div total_tokens"))
          .select(col("shard"), col("n_docs"), col("n_tokens"),
            col("doc_ppm").cast("long").as("doc_ppm"),
            col("token_ppm").cast("long").as("token_ppm"))
          .orderBy("shard")
      },
      Some("""WITH t AS (SELECT
                     CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT) AS shard,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks
                   FROM documents),
                  g AS (SELECT shard, count(*) AS n_docs, sum(toks) AS n_tokens
                        FROM t GROUP BY 1)
              SELECT shard, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
                     CAST(n_docs * 1000000 // sum(n_docs) OVER () AS BIGINT) AS doc_ppm,
                     CAST(n_tokens * 1000000 // sum(n_tokens) OVER () AS BIGINT) AS token_ppm
              FROM g ORDER BY shard""")),

    // x85 — SEMANTIC curation pipeline: the embedding-side twin of x73's
    // shingle pipeline, composing x01 + x11 + x46 + x35 machinery — exact
    // text dedup → embedding near-dup clusters over the SURVIVORS
    // (documents ⋈ embeddings on the aligned doc_id/vec_id) → one
    // highest-quality canonical per cluster (lowest-id tie-break) →
    // non-clustered survivors pass through. The exact quadratic pair
    // baseline keeps this oracle-checkable; at scale the candidate source
    // swaps to srpCosinePairs/ivfCosinePairs (same downstream — the x46
    // lesson), and every stage keeps its own documented posture.
    QueryDef("x85_semantic_curation",
      (s, d) => Curation.semanticCurate(
          Tables.documents(s, d), Tables.embeddings(s, d),
          vecs => Similarity.cosinePairs(vecs, threshold = 0.35))
        .orderBy("doc_id"),
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH RECURSIVE
              dd AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
              sv AS (SELECT e.vec_id, e.embedding FROM embeddings e
                     JOIN dd ON dd.doc_id = e.vec_id),
              p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
                    FROM sv a JOIN sv b ON a.vec_id < b.vec_id
                    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                       b.embedding::DOUBLE[]), 6) >= 0.35),
              e2 AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
              r AS (SELECT a AS id, a AS reach FROM e2
                    UNION
                    SELECT r.id, e2.b FROM r JOIN e2 ON e2.a = r.reach),
              cl AS (SELECT id AS doc_id, min(reach) AS rep FROM r GROUP BY id),
              q AS (SELECT doc_id, floor((
                      least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                    + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                    + (1.0 - least(CAST(pn AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                    + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                    ) * 10000.0 + 0.5) / 10000.0 AS score
                  FROM (SELECT doc_id,
                          CASE WHEN length(trim(text)) = 0 THEN 0
                               ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                          length(text) AS ch,
                          len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS pn,
                          len(regexp_extract_all(text, '[A-Z]')) AS u,
                          len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                        FROM documents) t),
              pick AS (SELECT doc_id FROM (
                         SELECT cl.doc_id,
                                row_number() OVER (PARTITION BY cl.rep
                                  ORDER BY q.score DESC, cl.doc_id) AS rn
                         FROM cl JOIN q USING (doc_id)) z
                       WHERE rn = 1),
              kept AS (SELECT doc_id FROM dd
                       WHERE doc_id NOT IN (SELECT doc_id FROM cl)
                       UNION SELECT doc_id FROM pick)
            SELECT k.doc_id, d.source, q.score
            FROM kept k JOIN documents d USING (doc_id) JOIN q USING (doc_id)
            ORDER BY doc_id"""
      }),

    // x94 — temperature-sampled mixture weights: per-source sampling
    // probability w_s ∝ n_s^α (α = 0.5 — the multilingual-corpus upweighting
    // of small sources), the knob that turns corpus token counts into a
    // training sampler's per-source weights. The sqrt quantizes to integer
    // micro-units per source BEFORE the normalizing sum, so the denominator
    // is an exact BIGINT sum and every weight an exact integer division —
    // no cross-engine float-accumulation drift. One vocab-free aggregate:
    // per-source token counts (16 rows) then arithmetic.
    QueryDef("x94_mixture_weights",
      (s, d) => {
        val perSource = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(sum(TextAnalysis.wsTokenCount(col("text"))).as("n_tok"))
          .withColumn("q", expr("CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT)"))
        val denom = perSource.agg(sum(col("q")).as("qsum"))
        perSource.crossJoin(broadcast(denom))
          .select(col("source"), col("n_tok"),
            // widen the ppm multiply: q*1e6 overflows BIGINT once a
            // source's q passes ~9.2e12 (≈ 8.5e13 corpus tokens — inside
            // the 100 TB envelope); DECIMAL(38,0) keeps it exact
            expr("CAST(CAST(q AS DECIMAL(38,0)) * 1000000 DIV qsum AS BIGINT)")
              .as("weight_ppm"))
          .orderBy("source")
      },
      // n_tok must CAST: DuckDB sum() yields HUGEINT, which pandas widens to
      // float64 — value-equal but hash-different vs Spark's BIGINT (r9/r10).
      Some("""WITH t AS (SELECT source,
                     CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tok
                   FROM documents GROUP BY source),
                  qq AS (SELECT source, n_tok,
                           CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT) AS q
                         FROM t),
                  dn AS (SELECT sum(q) AS qsum FROM qq)
              SELECT source, n_tok,
                     CAST(CAST(q AS HUGEINT) * 1000000 // qsum AS BIGINT) AS weight_ppm
              FROM qq CROSS JOIN dn ORDER BY source""")),

    // x98 — deterministic weighted sample (Efraimidis–Spirakis): top-50
    // docs without replacement with inclusion probability ∝ n_chars — the
    // quality-weighted subcorpus cut (x21/x26/x90 sample uniformly,
    // stratified, or diversity-first; none weight by a score). The A-ES
    // key ln(u)/w uses a uniform DERIVED FROM md5 OF THE CONTENT (x52's
    // determinism trick widened from one hex digit to 32 bits), so the
    // sample is reproducible across engines, runs, and partitionings —
    // no rand(), no seed plumbing. The key quantizes to integer nano units
    // before ranking (a 1-ulp cross-engine ln() difference only matters
    // within 1e-9 of a rounding boundary). Scale: scan-local key compute +
    // distributed top-k (TakeOrderedAndProject — map-side partial top-50
    // per partition, NO global sort, NO single-partition window); the rank
    // column is a window over the 50 survivors only.
    QueryDef("x98_weighted_sample",
      (s, d) => {
        val keyed = Tables.documents(s, d)
          .select(col("doc_id"), greatest(col("n_chars"), lit(1L)).as("wt"),
            expr("""CAST(CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT)
                    AS DOUBLE)""").as("v"))
          .select(col("doc_id"), col("wt"),
            expr("CAST(round(ln((v + 1) / 4294967297.0) / wt * 1e9) AS BIGINT)")
              .as("key_nano"))
          .orderBy(col("key_nano").desc, col("doc_id")).limit(50)
        val w = Window.orderBy(col("key_nano").desc, col("doc_id"))
        keyed.withColumn("rnk", row_number().over(w).cast("long"))
          .select(col("rnk"), col("doc_id"), col("wt"), col("key_nano"))
          .orderBy("rnk")
      },
      Some("""WITH w AS (SELECT doc_id, greatest(n_chars, 1) AS wt,
                     CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS DOUBLE) AS v
                   FROM documents),
                  k AS (SELECT doc_id, wt,
                          CAST(round(ln((v + 1) / 4294967297.0) / wt * 1e9) AS BIGINT)
                            AS key_nano
                        FROM w),
                  r AS (SELECT doc_id, wt, key_nano,
                          row_number() OVER (ORDER BY key_nano DESC, doc_id) AS rnk
                        FROM k)
              SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, wt, key_nano
              FROM r WHERE rnk <= 50 ORDER BY rnk""")),

    // x125 — leakage-safe (cluster-atomic) train/val/test split: under
    // x58's naive per-doc split roughly 1 in 5 near-dup pairs ends up
    // straddling the train/eval boundary (6 of 25 on the sf0.01 fixture)
    // — the eval set then scores memorization, not generalization. This split keys on the x25 dup
    // cluster instead, so all copies of a document travel together.
    // Oracle: the full x25 recursive closure + the same md5-uniform hash,
    // end-to-end hash-match.
    QueryDef("x125_cluster_split",
      (s, d) => clusterSplit(s, d).orderBy("doc_id"),
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                pairs AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                eadj AS (SELECT ia AS a, ib AS b FROM pairs
                         UNION SELECT ib, ia FROM pairs),
                r AS (SELECT a AS id, a AS reach FROM eadj
                      UNION
                      SELECT r.id, eadj.b FROM r JOIN eadj ON eadj.a = r.reach),
                cl AS (SELECT id AS doc_id, min(reach) AS cluster_rep FROM r GROUP BY id),
                a AS (SELECT d.doc_id,
                        coalesce(cl.cluster_rep, d.doc_id) AS cluster_rep
                      FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id)
              SELECT doc_id, cluster_rep,
                     CASE CAST('0x' || substr(md5(CAST(cluster_rep AS VARCHAR)), 1, 8) AS BIGINT) % 10
                       WHEN 0 THEN 'test' WHEN 1 THEN 'val' ELSE 'train' END AS split
              FROM a ORDER BY doc_id""")),

    // x125b — split-leakage audit, fully oracle-checked: the count of
    // near-dup pairs straddling splits under the naive x58 assignment
    // (non-zero on any corpus with near-dups — the hazard) vs under the
    // cluster-atomic x125 assignment (zero BY CONSTRUCTION — both engines
    // recount it from scratch rather than trusting the construction).
    // Scale: the pair frame is dup-sized, the two split joins are keyed,
    // and the naive side reuses x58's own documented window cost.
    QueryDef("x125b_split_leakage_gate",
      (s, d) => {
        val pairs = jaccardPairsShared(s, d).select(col("ia"), col("ib"))
        def crossCount(sp: DataFrame): DataFrame =
          pairs
            .join(sp.select(col("doc_id").as("ia"), col("split").as("sa")), "ia")
            .join(sp.select(col("doc_id").as("ib"), col("split").as("sb")), "ib")
            .filter(col("sa") =!= col("sb"))
            .agg(count(lit(1)).as("n"))
        crossCount(stratifiedSplit(s, d)).select(col("n").as("naive_cross_pairs"))
          .crossJoin(crossCount(clusterSplit(s, d))
            .select(col("n").as("cluster_cross_pairs")))
          .select(col("naive_cross_pairs"), col("cluster_cross_pairs"),
            (col("cluster_cross_pairs") === 0 && col("naive_cross_pairs") > 0)
              .as("split_ok"))
      },
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                pairs AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                eadj AS (SELECT ia AS a, ib AS b FROM pairs
                         UNION SELECT ib, ia FROM pairs),
                r AS (SELECT a AS id, a AS reach FROM eadj
                      UNION
                      SELECT r.id, eadj.b FROM r JOIN eadj ON eadj.a = r.reach),
                cl AS (SELECT id AS doc_id, min(reach) AS cluster_rep FROM r GROUP BY id),
                cs AS (SELECT d.doc_id,
                         CASE CAST('0x' || substr(md5(CAST(
                                coalesce(cl.cluster_rep, d.doc_id) AS VARCHAR)), 1, 8)
                              AS BIGINT) % 10
                           WHEN 0 THEN 'test' WHEN 1 THEN 'val' ELSE 'train' END AS split
                       FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
                ns0 AS (SELECT doc_id, source, md5(text) AS ok FROM documents),
                ns1 AS (SELECT doc_id,
                          row_number() OVER (PARTITION BY source ORDER BY ok, doc_id) AS rn,
                          count(*) OVER (PARTITION BY source) AS n
                        FROM ns0),
                ns AS (SELECT doc_id,
                         CASE WHEN (rn - 1) * 10 < n THEN 'test'
                              WHEN (rn - 1) * 5 < n THEN 'val'
                              ELSE 'train' END AS split
                       FROM ns1),
                ncross AS (SELECT count(*) AS n FROM pairs
                           JOIN ns a ON a.doc_id = pairs.ia
                           JOIN ns b ON b.doc_id = pairs.ib
                           WHERE a.split <> b.split),
                ccross AS (SELECT count(*) AS n FROM pairs
                           JOIN cs a ON a.doc_id = pairs.ia
                           JOIN cs b ON b.doc_id = pairs.ib
                           WHERE a.split <> b.split)
              SELECT ncross.n AS naive_cross_pairs, ccross.n AS cluster_cross_pairs,
                     (ccross.n = 0 AND ncross.n > 0) AS split_ok
              FROM ncross, ccross""")),

    // x133 — key-skew profile: the report that decides whether q31/q32's
    // salting is worth its cost BEFORE the shuffle is planned — hottest
    // keys, exact ppm shares, and a salt_recommended verdict (share >
    // 1/parallelism ⇒ one reduce task would carry more than its fair
    // slice). One 16-byte-per-key hash aggregate at any scale, then a
    // kTop-row TakeOrderedAndProject; integer-exact → full hash-match.
    QueryDef("x133_skew_profile",
      (s, d) => graft.ops.Skew.skewProfile(
          Tables.events(s, d), "event_type", kTop = 5, parallelism = 32)
        .orderBy(col("n").desc, col("event_type")),
      Some("""WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type),
                  t AS (SELECT sum(n) AS total FROM c)
              SELECT event_type, CAST(n AS BIGINT) AS n,
                     CAST(CAST(n AS HUGEINT) * 1000000 // total AS BIGINT) AS share_ppm,
                     (CAST(n AS HUGEINT) * 32 > total) AS salt_recommended
              FROM c CROSS JOIN t
              ORDER BY n DESC, event_type LIMIT 5""")),

    // x135 — sequence-pack plan: the GPT-style concat-and-chunk layout as
    // a deterministic function of (corpus, capacity, seed) — each doc's
    // shuffle position (md5 order key, engine-portable), exclusive prefix
    // token count, and the [start_seq, end_seq] interval it occupies at
    // capacity 128. The textbook global running-sum window is a single-
    // partition sort at 100 TB; Pack.packPlan computes the identical
    // prefix sum in two phases (256-bucket subtotal cumsum — the only
    // single-partition window, ≤256 rows — then within-bucket windows
    // hash-partitioned by the key prefix, so bucket order refines key
    // order). All-BIGINT output → full hash-match.
    QueryDef("x135_pack_plan",
      (s, d) => packPlanShared(s, d).orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
                     len(string_split_regex(trim(text), '\s+')) AS n,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT doc_id, n,
                          CAST(coalesce(sum(n) OVER (ORDER BY okey, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS cb
                        FROM t)
              SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                     CAST(cb AS BIGINT) AS cum_before,
                     CAST(cb // 128 AS BIGINT) AS start_seq,
                     CAST(cb % 128 AS BIGINT) AS start_off,
                     CAST((cb + n - 1) // 128 AS BIGINT) AS end_seq,
                     CAST((cb + n - 1) // 128 - cb // 128 + 1 AS BIGINT)
                       AS n_segs
              FROM c ORDER BY doc_id""")),

    // x136 — packed segments: the x135 plan exploded into the shard-
    // writer's input — one row per (sequence, document-slice), slices
    // tiling both the sequence's [0,128) and the document's [0,n_tokens)
    // token intervals. The explode is bounded per doc by n_tokens/capacity
    // (never corpus-scale fan-out) and adds no shuffle beyond the plan's.
    QueryDef("x136_pack_segments",
      (s, d) => Pack.packSegments(packPlanShared(s, d), capacity = 128L)
        .orderBy("seq_id", "seq_off", "doc_id"),
      Some("""WITH t AS (SELECT doc_id,
                     len(string_split_regex(trim(text), '\s+')) AS n,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT doc_id, n,
                          CAST(coalesce(sum(n) OVER (ORDER BY okey, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS cb
                        FROM t),
                  seg AS (SELECT doc_id, n, cb, cb // 128 AS ss,
                            cb % 128 AS so, u.s AS seq_id
                          FROM c, unnest(range(cb // 128,
                                               (cb + n - 1) // 128 + 1))
                            AS u(s))
              SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
                     CAST(CASE WHEN seq_id = ss THEN so ELSE 0 END AS BIGINT)
                       AS seq_off,
                     CAST(CASE WHEN seq_id = ss THEN 0
                               ELSE seq_id * 128 - cb END AS BIGINT)
                       AS doc_off,
                     CAST(least(cb + n, (seq_id + 1) * 128)
                          - greatest(cb, seq_id * 128) AS BIGINT) AS seg_len
              FROM seg ORDER BY seq_id, seq_off, doc_id""")),

    // x135b — packing capacity gate: every sequence except the last is
    // filled to EXACTLY capacity tokens and none exceeds it — the
    // invariant a fixed-shape training loader depends on. One
    // groupBy(seq_id) over the shared segments + a broadcast one-row max
    // frame; empty corpus is vacuous success.
    QueryDef("x135b_pack_capacity_gate",
      (s, d) => Pack.capacityGate(
        Pack.packSegments(packPlanShared(s, d), capacity = 128L),
        capacity = 128L),
      Some("""WITH t AS (SELECT doc_id,
                     len(string_split_regex(trim(text), '\s+')) AS n,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT doc_id, n,
                          CAST(coalesce(sum(n) OVER (ORDER BY okey, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS cb
                        FROM t),
                  seg AS (SELECT cb // 128 AS ss, u.s AS seq_id,
                            least(cb + n, (u.s + 1) * 128)
                              - greatest(cb, u.s * 128) AS seg_len
                          FROM c, unnest(range(cb // 128,
                                               (cb + n - 1) // 128 + 1))
                            AS u(s)),
                  per AS (SELECT seq_id, sum(seg_len) AS n_tok
                          FROM seg GROUP BY 1),
                  m AS (SELECT max(seq_id) AS mx, count(*) AS n_all FROM per)
              SELECT CAST(coalesce(max(n_all), 0) AS BIGINT) AS n_seqs,
                     coalesce(bool_and((n_tok = 128 OR seq_id = mx)
                                       AND n_tok <= 128), true)
                       AS capacity_ok
              FROM per CROSS JOIN m""")),

    // x135c — streaming packer parity gate: replay the x135 corpus
    // through a REAL MemoryStream query into
    // StreamingOps.streamingPacker in THREE UNEVEN chops (the x161b
    // discipline — boundary-straddling state must carry across
    // micro-batches) and require every doc's packing coordinates to
    // equal the batch packPlan layout (capacity 128, seed 42) —
    // PackSpec's one-doc-per-batch parity made driver-visible AND
    // strengthened: multi-doc chops exercise exactly the cross-chop
    // cumulative-count carry the one-doc replay cannot. Key-ordered
    // delivery: the packer's contract is arrival-order packing with
    // within-batch doc_id ordering, and the plan's md5-shuffled layout
    // order is NOT doc_id-monotonic — so the replay feeds docs under a
    // surrogate key (the doc's layout rank), making arrival order = plan
    // order hold for ANY chop boundaries, then maps coordinates back to
    // real doc_ids for the equality. Lane state: ONE Long. Replay runs
    // on a cloned session with pinned shuffle partitions (the
    // replayMonitor rationale).
    QueryDef("x135c_pack_stream_gate",
      (s, d) => {
        val plan = packPlanShared(s, d)
        // the layout-order sort comes AFTER the join — a join does not
        // preserve its input's order, and plan order IS the contract here
        val ordered = plan
          .join(Tables.documents(s, d).select(col("doc_id"), col("text")),
            "doc_id")
          .select(col("doc_id"), col("text"), col("n_tokens"),
            col("cum_before"), col("start_seq"), col("start_off"),
            col("end_seq"), col("n_segs"))
          .orderBy("cum_before")
          .collect()
        val expected = ordered.map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6), r.getLong(7)))).toMap
        val feed: Seq[(Long, String)] = ordered.zipWithIndex
          .map { case (r, rank) => (rank.toLong, r.getString(1)) }.toSeq
        val rankToDoc = ordered.zipWithIndex
          .map { case (r, rank) => rank.toLong -> r.getLong(0) }.toMap
        val ok = {
          val ss = s.newSession()
          ss.conf.set("spark.sql.shuffle.partitions", "2")
          ss.conf.set("spark.sql.adaptive.enabled", "false")
          implicit val sq = ss.sqlContext
          import ss.implicits._
          val mem = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(Long, String)]
          val acc = scala.collection.mutable.ArrayBuffer
            .empty[(Long, (Long, Long, Long, Long, Long, Long))]
          val query = graft.streaming.StreamingOps.streamingPacker(
              mem.toDF().toDF("doc_id", "text"),
              capacity = 128L, shards = 1)
            .writeStream
            .foreachBatch { (b: DataFrame, _: Long) =>
              val got = b.collect().map(r => (r.getLong(1),
                (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
                  r.getLong(6), r.getLong(7))))
              acc.synchronized { acc ++= got }
              ()
            }
            .outputMode("append").start()
          try Seq(feed.take(feed.length / 3),
              feed.slice(feed.length / 3, feed.length / 2),
              feed.drop(feed.length / 2))
            .foreach { c => mem.addData(c); query.processAllAvailable() }
          finally query.stop()
          val got = acc.map { case (rank, coords) =>
            rankToDoc(rank) -> coords }.toMap
          got == expected && expected.nonEmpty
        }
        import s.implicits._
        Seq(ok).toDF("pack_stream_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS pack_stream_ok")),

    // x142 — pack rehydration: the packing family closed end-to-end —
    // x136's layout coordinates joined back to the corpus, token arrays
    // sliced at (doc_off, seg_len), sequences reassembled in slice order.
    // Two keyed shuffles (doc_id slice join, seq_id regroup with state
    // bounded by capacity tokens); ordered reassembly via a sorted struct
    // array, no window. Hash-match includes the rebuilt sequence text.
    QueryDef("x142_pack_rehydrate",
      (s, d) => Pack.rehydrate(
          Pack.packSegments(packPlanShared(s, d), capacity = 128L),
          Tables.documents(s, d))
        .orderBy("seq_id"),
      Some("""WITH t AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks,
                     len(string_split_regex(trim(text), '\s+')) AS n,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT doc_id, n,
                          CAST(coalesce(sum(n) OVER (ORDER BY okey, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS cb
                        FROM t),
                  seg AS (SELECT doc_id, n, cb, cb // 128 AS ss,
                            cb % 128 AS so, u.s AS seq_id
                          FROM c, unnest(range(cb // 128,
                                               (cb + n - 1) // 128 + 1))
                            AS u(s)),
                  sl AS (SELECT seg.seq_id,
                           CASE WHEN seq_id = ss THEN so ELSE 0 END AS seq_off,
                           CASE WHEN seq_id = ss THEN 0
                                ELSE seq_id * 128 - cb END AS doc_off,
                           least(cb + seg.n, (seq_id + 1) * 128)
                             - greatest(cb, seq_id * 128) AS seg_len,
                           t.toks
                         FROM seg JOIN t USING (doc_id))
              SELECT CAST(seq_id AS BIGINT) AS seq_id,
                     CAST(count(*) AS BIGINT) AS n_slices,
                     string_agg(array_to_string(
                       toks[(doc_off + 1):(doc_off + seg_len)], ' '),
                       ' ' ORDER BY seq_off) AS seq_text
              FROM sl GROUP BY seq_id ORDER BY seq_id""")),

    // x138 — DSIR importance weights (Xie et al. 2023): per-doc hashed-
    // n-gram log-likelihood ratio of the target distribution (lang 'en')
    // against the raw corpus — the data-selection score behind importance
    // resampling. Features are md5-hashed unigram+bigram buckets (4096 —
    // fixed-size tables at any corpus scale, engine-portable ids);
    // per-bucket Laplace log-ratios quantize once to integer micro-nats,
    // per-doc sums are exact BIGINTs → full hash-match.
    QueryDef("x138_dsir_weights",
      (s, d) => dsirShared(s, d).orderBy("doc_id"),
      Some(s"""$dsirOracleBase
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
                     CAST(sum(q) AS BIGINT) AS w_sum,
                     CAST(sum(q) // count(*) AS BIGINT) AS w_mean
              FROM h JOIN lr USING (b) GROUP BY doc_id ORDER BY doc_id""")),

    // x139 — DSIR selection: the deterministic top-100 docs by per-feature
    // mean importance (ties broken by doc_id) — the "keep the most
    // target-like slice" step. TakeOrderedAndProject over the shared
    // weight frame: k rows cross any corpus size.
    QueryDef("x139_dsir_select",
      (s, d) => dsirShared(s, d)
        .orderBy(col("w_mean").desc, col("doc_id")).limit(100),
      Some(s"""$dsirOracleBase,
                  w AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
                          CAST(sum(q) AS BIGINT) AS w_sum,
                          CAST(sum(q) // count(*) AS BIGINT) AS w_mean
                        FROM h JOIN lr USING (b) GROUP BY doc_id)
              SELECT doc_id, n_feat, w_sum, w_mean FROM w
              ORDER BY w_mean DESC, doc_id LIMIT 100""")),

    // x140 — composite quality-filter verdict: the C4/Gopher rule battery
    // as one keep/drop + reason bitmask per doc (1 too_short, 2 too_long,
    // 4 word_length, 8 symbol_heavy, 16 no_stopword, 32 repetitive_bigram,
    // 64 repetitive_trigram). Every threshold an exact integer cross-
    // multiplication — no ppm rounding, no doubles → full hash-match. Same
    // map-only no-shuffle shape as x137.
    QueryDef("x140_filter_verdicts",
      (s, d) => TextAnalysis.filterVerdicts(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, text,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
                  base AS (SELECT doc_id, len(toks) AS n,
                     length(regexp_replace(trim(text), '\s+', '', 'g'))
                       AS tok_chars,
                     length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                       AS sym_chars,
                     length(text) AS n_chars,
                     len(list_intersect(toks,
                       ['the', 'a', 'of', 'to', 'and'])) > 0 AS has_stop
                   FROM d),
                  b AS (SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] AS g
                        FROM d, unnest(range(0, len(toks) - 1)) AS u(i)),
                  bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
                  bst AS (SELECT doc_id, sum(c) AS n_big, max(c) AS top_cnt
                          FROM bc GROUP BY 1),
                  tr AS (SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2]
                                        || ' ' || toks[i + 3] AS g
                         FROM d, unnest(range(0, len(toks) - 2)) AS u(i)),
                  tc AS (SELECT doc_id, g, count(*) AS c FROM tr GROUP BY 1, 2),
                  tst AS (SELECT doc_id, sum(c) AS n_tri, sum(c - 1) AS dup_tri
                          FROM tc GROUP BY 1),
                  v AS (SELECT base.doc_id, n,
                          (CASE WHEN n < 5 THEN 1 ELSE 0 END)
                        + (CASE WHEN n > 50000 THEN 2 ELSE 0 END)
                        + (CASE WHEN tok_chars < 2 * n
                                  OR tok_chars > 12 * n THEN 4 ELSE 0 END)
                        + (CASE WHEN sym_chars * 10 > n_chars
                                THEN 8 ELSE 0 END)
                        + (CASE WHEN NOT has_stop THEN 16 ELSE 0 END)
                        + (CASE WHEN coalesce(n_big, 0) >= 10
                                 AND coalesce(top_cnt, 0) * 5 > n_big
                                THEN 32 ELSE 0 END)
                        + (CASE WHEN coalesce(n_tri, 0) >= 10
                                 AND coalesce(dup_tri, 0) * 10 > n_tri * 3
                                THEN 64 ELSE 0 END) AS reasons
                        FROM base LEFT JOIN bst USING (doc_id)
                                  LEFT JOIN tst USING (doc_id))
              SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                     CAST(reasons AS BIGINT) AS reasons,
                     reasons = 0 AS keep
              FROM v ORDER BY doc_id""")),

    // x149 — curriculum stages: each source's docs quartiled by unigram-LM
    // difficulty (the x92 mean −ln p in integer micro-nats; stage 1 = the
    // easiest/most-typical quarter, 4 = the hardest tail), rolled up to the
    // per-(source, stage) mixing table difficulty-staged training reads.
    // Difficulty is an exact integral div of the x92 micro-nat sum; ntile
    // runs per-source over a total order (difficulty, doc_id), so stages
    // are bit-deterministic. Scale: one corpus token pass (the shared x92
    // frame), then a per-source sort — the distributed sort shape — over
    // doc-level rows only; output is sources×4.
    QueryDef("x149_curriculum_stages",
      (s, d) => {
        val toks = tokensShared(s, d)
        val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val total = uni.agg(sum(col("cnt")).as("total"))
        val per = toks.join(uni, "tok").crossJoin(broadcast(total))
          .select(col("doc_id"), col("source"),
            expr("CAST(round(-ln(cnt / total) * 1e6) AS BIGINT)").as("q"))
          .groupBy(col("doc_id"), col("source"))
          .agg(count(lit(1)).as("n_tok"),
            expr("CAST(sum(q) div count(1) AS BIGINT)").as("d_micro"))
        per
          .withColumn("stage", ntile(4).over(
            Window.partitionBy(col("source"))
              .orderBy(col("d_micro"), col("doc_id"))))
          .groupBy(col("source"), col("stage"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            min(col("d_micro")).as("min_d_micro"),
            max(col("d_micro")).as("max_d_micro"))
          .orderBy("source", "stage")
      },
      Some("""WITH t AS (SELECT doc_id, source,
                     unnest(string_split_regex(trim(text), '\s+')) AS tok
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
                  n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c),
                  q AS (SELECT doc_id, source,
                          CAST(round(-ln(CAST(cnt AS DOUBLE) / total) * 1e6) AS BIGINT) AS q
                        FROM t JOIN c USING (tok) CROSS JOIN n),
                  per AS (SELECT doc_id, source,
                            CAST(count(*) AS BIGINT) AS n_tok,
                            CAST(sum(q) // count(*) AS BIGINT) AS d_micro
                          FROM q GROUP BY doc_id, source),
                  st AS (SELECT source, n_tok, d_micro,
                           CAST(ntile(4) OVER (PARTITION BY source
                             ORDER BY d_micro, doc_id) AS INT) AS stage
                         FROM per)
              SELECT source, stage, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                     min(d_micro) AS min_d_micro, max(d_micro) AS max_d_micro
              FROM st GROUP BY source, stage ORDER BY source, stage""")),

    // x155 — epoch/repeat-factor schedule: x94's sqrt-smoothed mixture
    // weights turned into the per-source REPEAT TABLE a multi-epoch
    // training run consumes (the LLaMA-style data schedule): for a token
    // budget of 2× the corpus, each source's target token draw and its
    // repeat factor in exact centi-epochs (over-weighted small sources
    // repeat > 1×, big sources sample < 1×). Pure integer arithmetic over
    // the sources-sized x94 frame — DECIMAL(38,0) for the ppm multiply,
    // truncated div both engines.
    QueryDef("x155_epoch_schedule",
      (s, d) => {
        val perSource = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(sum(TextAnalysis.wsTokenCount(col("text"))).as("n_tok"))
          .withColumn("q", expr(
            "CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT)"))
        val denom = perSource.agg(sum(col("q")).as("qsum"),
          sum(col("n_tok")).as("total_tok"))
        perSource.crossJoin(broadcast(denom))
          .select(col("source"), col("n_tok"),
            expr("CAST(CAST(q AS DECIMAL(38,0)) * 1000000 DIV qsum AS BIGINT)")
              .as("weight_ppm"))
          .crossJoin(broadcast(denom.select(col("total_tok"))))
          .withColumn("target_tok", expr(
            "CAST(CAST(2 * total_tok AS DECIMAL(38,0)) * weight_ppm DIV 1000000 AS BIGINT)"))
          .withColumn("epochs_centi", expr(
            "target_tok * 100 div greatest(n_tok, 1L)"))
          .select(col("source"), col("n_tok"), col("weight_ppm"),
            col("target_tok"), col("epochs_centi"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source,
                     CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tok
                   FROM documents GROUP BY source),
                  qq AS (SELECT source, n_tok,
                           CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT) AS q
                         FROM t),
                  dn AS (SELECT sum(q) AS qsum,
                           CAST(sum(n_tok) AS BIGINT) AS total_tok FROM qq),
                  w AS (SELECT source, n_tok,
                          CAST(CAST(q AS HUGEINT) * 1000000 // qsum AS BIGINT) AS weight_ppm,
                          total_tok
                        FROM qq CROSS JOIN dn),
                  tg AS (SELECT source, n_tok, weight_ppm,
                           CAST(CAST(2 * total_tok AS HUGEINT) * weight_ppm // 1000000 AS BIGINT)
                             AS target_tok
                         FROM w)
              SELECT source, n_tok, weight_ppm, target_tok,
                     CAST(target_tok * 100 // greatest(n_tok, 1) AS BIGINT) AS epochs_centi
              FROM tg ORDER BY source""")),

    // x156 — epoch expansion: the x155 schedule MATERIALIZED into training
    // rows — every doc repeats floor(epochs/1) times plus one more for a
    // deterministic md5-selected fraction of its source (bucket(doc) <
    // epochs_centi % 100 of 100 buckets — the x21 quota idiom, so the
    // fractional epoch is a reproducible subset, not a random draw).
    // Output (doc_id, source, copy_no). Scale: per-source scalars
    // broadcast; the explode emits exactly the schedule's row count (≈
    // budget/avg-doc), no shuffle beyond the sources-sized join.
    QueryDef("x156_epoch_expand",
      (s, d) => {
        val sched = graft.SparkEntry.queries("x155_epoch_schedule")(s, d)
          .select(col("source"), col("epochs_centi"))
        Tables.documents(s, d).select(col("doc_id"), col("source"))
          .join(broadcast(sched), "source")
          .withColumn("bucket",
            pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 12),
              16, 10).cast("long"), lit(100L)))
          .withColumn("copies",
            expr("epochs_centi div 100 + IF(bucket < epochs_centi % 100, 1L, 0L)"))
          .filter(col("copies") > 0)
          .select(col("doc_id"), col("source"),
            explode(expr("sequence(1L, copies)")).as("copy_no"))
          .orderBy("doc_id", "copy_no")
      },
      Some("""WITH t AS (SELECT source,
                     CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tok
                   FROM documents GROUP BY source),
                  qq AS (SELECT source, n_tok,
                           CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT) AS q
                         FROM t),
                  dn AS (SELECT sum(q) AS qsum,
                           CAST(sum(n_tok) AS BIGINT) AS total_tok FROM qq),
                  w AS (SELECT source, n_tok,
                          CAST(CAST(q AS HUGEINT) * 1000000 // qsum AS BIGINT) AS weight_ppm,
                          total_tok
                        FROM qq CROSS JOIN dn),
                  tg AS (SELECT source,
                           CAST(CAST(2 * total_tok AS HUGEINT) * weight_ppm // 1000000 AS BIGINT)
                             AS target_tok, n_tok
                         FROM w),
                  sched AS (SELECT source,
                              CAST(target_tok * 100 // greatest(n_tok, 1) AS BIGINT)
                                AS epochs_centi
                            FROM tg),
                  docs AS (SELECT d.doc_id, d.source, sched.epochs_centi,
                             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12))::BIGINT % 100
                               AS bucket
                           FROM documents d JOIN sched USING (source)),
                  cp AS (SELECT doc_id, source,
                           epochs_centi // 100 +
                             (CASE WHEN bucket < epochs_centi % 100 THEN 1 ELSE 0 END)
                             AS copies
                         FROM docs)
              SELECT doc_id, source, CAST(u.c AS BIGINT) AS copy_no
              FROM cp, unnest(range(1, copies + 1)) AS u(c)
              WHERE copies > 0
              ORDER BY doc_id, copy_no""")),

    // x169 — length-bucketed batching report: docs assigned to
    // power-of-two token buckets (the dynamic-batching layout that
    // replaces one global pad-to-max), with the padding overhead each
    // bucket pays — the loader diagnostic that picks bucket boundaries.
    // Integer CASE ladder (no float log2 — engines disagree at exact
    // powers), one hash aggregate over ≤ 10 buckets.
    QueryDef("x169_length_buckets",
      (s, d) => {
        val n = TextAnalysis.wsTokenCount(col("text")).cast("long")
        Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"), n.as("n"))
          .withColumn("bucket",
            when(col("n") <= 16, 16L).when(col("n") <= 32, 32L)
              .when(col("n") <= 64, 64L).when(col("n") <= 128, 128L)
              .when(col("n") <= 256, 256L).when(col("n") <= 512, 512L)
              .when(col("n") <= 1024, 1024L).when(col("n") <= 2048, 2048L)
              .when(col("n") <= 4096, 4096L).otherwise(8192L))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
          .select(col("bucket"), col("n_docs"), col("n_tokens"),
            (col("bucket") * col("n_docs") - col("n_tokens")).as("n_padding"),
            expr("CAST(n_tokens * 1000000 div (bucket * n_docs) AS BIGINT)")
              .as("fill_ppm"))
          .orderBy("bucket")
      },
      Some("""WITH t AS (SELECT doc_id,
                     CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
                   FROM documents WHERE length(trim(text)) > 0),
                   b AS (SELECT doc_id, n,
                           CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
                                WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                                WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                                WHEN n <= 1024 THEN 1024 WHEN n <= 2048 THEN 2048
                                WHEN n <= 4096 THEN 4096 ELSE 8192 END AS bucket
                         FROM t)
              SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
                     CAST(sum(n) AS BIGINT) AS n_tokens,
                     CAST(bucket * count(*) - sum(n) AS BIGINT) AS n_padding,
                     CAST(sum(n) * 1000000 // (bucket * count(*)) AS BIGINT)
                       AS fill_ppm
              FROM b GROUP BY bucket ORDER BY bucket""")),

    // x170 — T5-style span-corruption plan: a DETERMINISTIC noise mask
    // (position p starts a 3-token masked span iff its seeded md5 bucket
    // hits — the DSIR md5-portable idiom, ~5% starts → ~15% masked), with
    // the per-doc corruption accounting a denoising-objective loader
    // needs: masked tokens, contiguous spans (= sentinels inserted), and
    // the resulting input length. Keyed lag windows per doc, never global.
    QueryDef("x170_span_corruption",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
        Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"),
            TextAnalysis.wsTokenCount(col("text")).cast("long").as("n"))
          .select(col("doc_id"), col("n"),
            posexplode(expr("sequence(1, n)")).as(Seq("i", "p")))
          .withColumn("st", (expr(
            """CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':',
               CAST(p AS STRING))), 1, 6), 16, 10) AS BIGINT)""") % 20 === 0)
            .cast("int"))
          .withColumn("mask", greatest(col("st"),
            coalesce(lag(col("st"), 1).over(w), lit(0)),
            coalesce(lag(col("st"), 2).over(w), lit(0))))
          .withColumn("span_start",
            (col("mask") === 1 &&
              coalesce(lag(col("mask"), 1).over(w), lit(0)) === 0).cast("int"))
          .groupBy(col("doc_id"))
          .agg(max(col("n")).as("n_tokens"),
            sum(col("mask")).cast("long").as("n_masked"),
            sum(col("span_start")).cast("long").as("n_spans"))
          .select(col("doc_id"), col("n_tokens"), col("n_masked"),
            col("n_spans"),
            (col("n_tokens") - col("n_masked") + col("n_spans"))
              .as("input_len"),
            expr("CAST(n_masked * 1000000 div n_tokens AS BIGINT)")
              .as("mask_ppm"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
                   FROM documents WHERE length(trim(text)) > 0),
                   pos AS (SELECT doc_id, n, unnest(range(0, n)) + 1 AS p
                           FROM t),
                   st AS (SELECT doc_id, n, p,
                            CASE WHEN ('0x' || substr(md5(doc_id || ':' || p), 1, 6))::BIGINT
                                 % 20 = 0 THEN 1 ELSE 0 END AS s
                          FROM pos),
                   mk AS (SELECT doc_id, n, p, s,
                            greatest(s,
                              coalesce(lag(s, 1) OVER dw, 0),
                              coalesce(lag(s, 2) OVER dw, 0)) AS mask
                          FROM st
                          WINDOW dw AS (PARTITION BY doc_id ORDER BY p)),
                   sp AS (SELECT doc_id, n, p, mask,
                            CASE WHEN mask = 1 AND
                              coalesce(lag(mask, 1) OVER dw, 0) = 0
                              THEN 1 ELSE 0 END AS span_start
                          FROM mk
                          WINDOW dw AS (PARTITION BY doc_id ORDER BY p))
              SELECT doc_id, max(n) AS n_tokens,
                     CAST(sum(mask) AS BIGINT) AS n_masked,
                     CAST(sum(span_start) AS BIGINT) AS n_spans,
                     CAST(max(n) - sum(mask) + sum(span_start) AS BIGINT)
                       AS input_len,
                     CAST(sum(mask) * 1000000 // max(n) AS BIGINT) AS mask_ppm
              FROM sp GROUP BY doc_id ORDER BY doc_id""")),

    // x171 — preference-pair construction (the DPO/RLHF data-prep shape
    // on this corpus): within each source, docs ranked by integer quality
    // score, best paired against worst (rank i vs rank n+1-i) with the
    // exact score margin — deterministic chosen/rejected pairs with no
    // random draw. Keyed rank windows per source + one keyed self-join.
    QueryDef("x171_preference_pairs",
      (s, d) => {
        val ws = Window.partitionBy(col("source"))
          .orderBy(col("q").desc, col("doc_id"))
        val wn = Window.partitionBy(col("source"))
        val ranked = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            TextAnalysis.qualityScoreInt(col("text")).as("q"))
          .withColumn("rnk", row_number().over(ws).cast("long"))
          .withColumn("n", count(lit(1)).over(wn))
        ranked.as("a")
          .join(ranked.as("b"),
            col("a.source") === col("b.source") &&
              col("b.rnk") === col("a.n") + 1 - col("a.rnk") &&
              col("a.rnk") < col("b.rnk"))
          .select(col("a.source").as("source"), col("a.rnk").as("pair_no"),
            col("a.doc_id").as("chosen_id"), col("b.doc_id").as("rejected_id"),
            (col("a.q") - col("b.q")).as("margin"))
          .orderBy("source", "pair_no")
      },
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH tq AS (SELECT source, doc_id, CAST(floor((
                  least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                + (1.0 - least(CAST(p AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                ) * 10000.0 + 0.5) AS BIGINT) AS q
              FROM (SELECT source, doc_id,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                      length(text) AS ch,
                      len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS p,
                      len(regexp_extract_all(text, '[A-Z]')) AS u,
                      len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                    FROM documents) t),
              rk AS (SELECT source, doc_id, q,
                       CAST(row_number() OVER (PARTITION BY source
                         ORDER BY q DESC, doc_id) AS BIGINT) AS rnk,
                       count(*) OVER (PARTITION BY source) AS n
                     FROM tq)
            SELECT a.source AS source, a.rnk AS pair_no, a.doc_id AS chosen_id,
                   b.doc_id AS rejected_id,
                   CAST(a.q - b.q AS BIGINT) AS margin
            FROM rk a JOIN rk b ON a.source = b.source
              AND b.rnk = a.n + 1 - a.rnk AND a.rnk < b.rnk
            ORDER BY a.source, pair_no"""
      }),

    // x178 — related-document packing (the in-context-pretraining layout):
    // docs of each multi-member near-dup cluster packed CLUSTER-
    // CONTIGUOUSLY into that cluster's own sequence space, so a training
    // context window sees related documents together — the ICLM idea
    // expressed with EVERY window partitioned by cluster_rep (state
    // bounded by the largest cluster, never corpus-wide; singletons keep
    // the standard x135 global layout and are out of scope here). One
    // keyed join to the shared cluster frame + one keyed cumsum.
    QueryDef("x178_related_packing",
      (s, d) => relatedPlanShared(s, d)
        .select(col("doc_id"), col("cluster_rep"), col("n_tokens"),
          col("cum_before"), col("start_seq").as("seq_no"), col("start_off"))
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                pairs AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                eadj AS (SELECT ia AS a, ib AS b FROM pairs
                         UNION SELECT ib, ia FROM pairs),
                r AS (SELECT a AS id, a AS reach FROM eadj
                      UNION
                      SELECT r.id, eadj.b FROM r JOIN eadj ON eadj.a = r.reach),
                cl AS (SELECT id AS doc_id, min(reach) AS cluster_rep FROM r GROUP BY id),
                m AS (SELECT cl.doc_id, cl.cluster_rep,
                        CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT)
                          AS n_tokens
                      FROM cl JOIN documents d ON d.doc_id = cl.doc_id
                      WHERE length(trim(d.text)) > 0),
                c AS (SELECT doc_id, cluster_rep, n_tokens,
                        CAST(coalesce(sum(n_tokens) OVER (
                          PARTITION BY cluster_rep ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS BIGINT) AS cb
                      FROM m)
              SELECT doc_id, cluster_rep, n_tokens, cb AS cum_before,
                     CAST(cb // 128 AS BIGINT) AS seq_no,
                     CAST(cb % 128 AS BIGINT) AS start_off
              FROM c ORDER BY doc_id""")),

    // x179 — related-packing segments: the x178 layout exploded into the
    // shard-writer's input (the x136 shape in per-cluster sequence
    // spaces): one row per (cluster, sequence, doc-slice), slices tiling
    // both each sequence's [0, 128) and each document's token interval.
    // Same bounded explode (n_segs ≤ n_tokens/128 + 1 per doc) and one
    // keyed join back for the cluster key — no new shuffle class.
    QueryDef("x179_related_segments",
      (s, d) => {
        val plan = relatedPlanShared(s, d)
        Pack.packSegments(plan, capacity = 128L)
          .join(plan.select(col("doc_id"), col("cluster_rep")), "doc_id")
          .select(col("cluster_rep"), col("seq_id").as("seq_no"),
            col("doc_id"), col("seq_off"), col("doc_off"), col("seg_len"))
          .orderBy("cluster_rep", "seq_no", "seq_off", "doc_id")
      },
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                pairs AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                eadj AS (SELECT ia AS a, ib AS b FROM pairs
                         UNION SELECT ib, ia FROM pairs),
                r AS (SELECT a AS id, a AS reach FROM eadj
                      UNION
                      SELECT r.id, eadj.b FROM r JOIN eadj ON eadj.a = r.reach),
                cl AS (SELECT id AS doc_id, min(reach) AS cluster_rep FROM r GROUP BY id),
                m AS (SELECT cl.doc_id, cl.cluster_rep,
                        CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT) AS n
                      FROM cl JOIN documents d ON d.doc_id = cl.doc_id
                      WHERE length(trim(d.text)) > 0),
                c AS (SELECT doc_id, cluster_rep, n,
                        CAST(coalesce(sum(n) OVER (
                          PARTITION BY cluster_rep ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS BIGINT) AS cb
                      FROM m),
                seg AS (SELECT doc_id, cluster_rep, n, cb, cb // 128 AS ss,
                          cb % 128 AS so, u.s AS seq_no
                        FROM c, unnest(range(cb // 128,
                                             (cb + n - 1) // 128 + 1)) AS u(s))
              SELECT cluster_rep, CAST(seq_no AS BIGINT) AS seq_no, doc_id,
                     CAST(CASE WHEN seq_no = ss THEN so ELSE 0 END AS BIGINT)
                       AS seq_off,
                     CAST(CASE WHEN seq_no = ss THEN 0
                               ELSE seq_no * 128 - cb END AS BIGINT) AS doc_off,
                     CAST(least(cb + n, (seq_no + 1) * 128)
                          - greatest(cb, seq_no * 128) AS BIGINT) AS seg_len
              FROM seg ORDER BY cluster_rep, seq_no, seq_off, doc_id""")),

    // x180 — related-packing rehydration: the x179 segments materialized
    // into training rows per (cluster, sequence) — the x142 shard-writer
    // step in per-cluster sequence spaces, completing the related family's
    // plan → segments → text chain. Slice join co-partitions on doc_id,
    // reassembly groups on the (cluster, seq) key with per-group state
    // bounded by the 128-token capacity; hash-match includes the rebuilt
    // text.
    QueryDef("x180_related_rehydrate",
      (s, d) => {
        val plan = relatedPlanShared(s, d)
        Pack.packSegments(plan, capacity = 128L)
          .join(plan.select(col("doc_id"), col("cluster_rep")), "doc_id")
          .join(Tables.documents(s, d).select(col("doc_id"),
            TextAnalysis.tokens(col("text")).as("toks")), Seq("doc_id"))
          .select(col("cluster_rep"), col("seq_id").as("seq_no"),
            col("seq_off"),
            expr("""array_join(slice(toks, CAST(doc_off + 1 AS INT),
                                     CAST(seg_len AS INT)), ' ')""").as("seg"))
          .groupBy(col("cluster_rep"), col("seq_no"))
          .agg(count(lit(1)).as("n_slices"),
            collect_list(struct(col("seq_off"), col("seg"))).as("parts"))
          .select(col("cluster_rep"), col("seq_no"), col("n_slices"),
            expr("array_join(transform(array_sort(parts), p -> p.seg), ' ')")
              .as("seq_text"))
          .orderBy("cluster_rep", "seq_no")
      },
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                pairs AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                eadj AS (SELECT ia AS a, ib AS b FROM pairs
                         UNION SELECT ib, ia FROM pairs),
                r AS (SELECT a AS id, a AS reach FROM eadj
                      UNION
                      SELECT r.id, eadj.b FROM r JOIN eadj ON eadj.a = r.reach),
                cl AS (SELECT id AS doc_id, min(reach) AS cluster_rep FROM r GROUP BY id),
                m AS (SELECT cl.doc_id, cl.cluster_rep,
                        CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT) AS n
                      FROM cl JOIN documents d ON d.doc_id = cl.doc_id
                      WHERE length(trim(d.text)) > 0),
                c AS (SELECT doc_id, cluster_rep, n,
                        CAST(coalesce(sum(n) OVER (
                          PARTITION BY cluster_rep ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS BIGINT) AS cb
                      FROM m),
                seg AS (SELECT doc_id, cluster_rep, n, cb, cb // 128 AS ss,
                          cb % 128 AS so, u.s AS seq_no
                        FROM c, unnest(range(cb // 128,
                                             (cb + n - 1) // 128 + 1)) AS u(s)),
                sl AS (SELECT seg.cluster_rep, seg.seq_no,
                         CASE WHEN seq_no = ss THEN so ELSE 0 END AS seq_off,
                         CASE WHEN seq_no = ss THEN 0
                              ELSE seq_no * 128 - cb END AS doc_off,
                         least(cb + seg.n, (seq_no + 1) * 128)
                           - greatest(cb, seq_no * 128) AS seg_len,
                         t.toks
                       FROM seg JOIN t USING (doc_id))
              SELECT cluster_rep, CAST(seq_no AS BIGINT) AS seq_no,
                     CAST(count(*) AS BIGINT) AS n_slices,
                     string_agg(array_to_string(
                       toks[(doc_off + 1):(doc_off + seg_len)], ' '),
                       ' ' ORDER BY seq_off) AS seq_text
              FROM sl GROUP BY 1, 2 ORDER BY cluster_rep, seq_no""")),

    // x174 — packing attention accounting: what fraction of causal
    // attention pairs inside the x135 packed sequences stay WITHIN one
    // document — the diagnostic behind the "attention-mask vs plain
    // concat" packing decision (a low within-doc fraction means plain
    // concatenation trains mostly on cross-document noise). Two keyed
    // aggregates over the shared segments frame; exact integer pair
    // arithmetic.
    QueryDef("x174_pack_attention",
      (s, d) => Pack.packSegments(packPlanShared(s, d), capacity = 128L)
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_slices"),
          sum(col("seg_len")).as("t"),
          sum(expr("seg_len * (seg_len + 1) div 2")).as("within"))
        .agg(count(lit(1)).as("n_seqs"),
          sum(col("n_slices")).as("n_slices"),
          sum(col("within")).as("within_pairs"),
          sum(expr("t * (t + 1) div 2")).as("total_pairs"))
        .select(col("n_seqs"), col("n_slices"),
          expr("CAST(n_slices * 1000000 div n_seqs AS BIGINT)")
            .as("slices_per_seq_ppm"),
          col("within_pairs"), col("total_pairs"),
          expr("CAST(within_pairs * 1000000 div total_pairs AS BIGINT)")
            .as("within_doc_ppm")),
      Some("""WITH t AS (SELECT doc_id,
                     len(string_split_regex(trim(text), '\s+')) AS n,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT doc_id, n,
                          CAST(coalesce(sum(n) OVER (ORDER BY okey, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS cb
                        FROM t),
                  seg AS (SELECT u.s AS seq_id,
                            least(cb + n, (u.s + 1) * 128)
                              - greatest(cb, u.s * 128) AS seg_len
                          FROM c, unnest(range(cb // 128,
                                               (cb + n - 1) // 128 + 1))
                            AS u(s)),
                  per AS (SELECT seq_id, count(*) AS n_slices,
                            sum(seg_len) AS t,
                            sum(seg_len * (seg_len + 1) // 2) AS within
                          FROM seg GROUP BY 1)
              SELECT CAST(count(*) AS BIGINT) AS n_seqs,
                     CAST(sum(n_slices) AS BIGINT) AS n_slices,
                     CAST(sum(n_slices) * 1000000 // count(*) AS BIGINT)
                       AS slices_per_seq_ppm,
                     CAST(sum(within) AS BIGINT) AS within_pairs,
                     CAST(sum(t * (t + 1) // 2) AS BIGINT) AS total_pairs,
                     CAST(sum(within) * 1000000 // sum(t * (t + 1) // 2)
                       AS BIGINT) AS within_doc_ppm
              FROM per""")),

    // x175 — quality × length joint histogram: the 2-D curation heatmap
    // (x169's length buckets × 5 integer quality bands) read before
    // setting joint thresholds — short-and-high-quality vs
    // long-and-low-quality populations are invisible to the two marginal
    // histograms. One hash aggregate over ≤ 50 cells.
    QueryDef("x175_quality_length_grid",
      (s, d) => {
        val n = TextAnalysis.wsTokenCount(col("text")).cast("long")
        Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .select(n.as("n"), TextAnalysis.qualityScoreInt(col("text")).as("q"))
          .withColumn("len_bucket",
            when(col("n") <= 16, 16L).when(col("n") <= 32, 32L)
              .when(col("n") <= 64, 64L).when(col("n") <= 128, 128L)
              .when(col("n") <= 256, 256L).when(col("n") <= 512, 512L)
              .otherwise(1024L))
          .withColumn("q_band", expr("q div 2000"))
          .groupBy(col("len_bucket"), col("q_band"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
          .orderBy("len_bucket", "q_band")
      },
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH tq AS (SELECT CAST(w AS BIGINT) AS n, CAST(floor((
                  least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                + (1.0 - least(CAST(p AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                ) * 10000.0 + 0.5) AS BIGINT) AS q
              FROM (SELECT len(string_split_regex(trim(text), '\\s+')) AS w,
                      length(text) AS ch,
                      len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS p,
                      len(regexp_extract_all(text, '[A-Z]')) AS u,
                      len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                    FROM documents WHERE length(trim(text)) > 0) t),
              b AS (SELECT CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
                           WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                           WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                           ELSE 1024 END AS len_bucket,
                         q // 2000 AS q_band, n
                    FROM tq)
            SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
                   CAST(q_band AS BIGINT) AS q_band,
                   count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
            FROM b GROUP BY 1, 2 ORDER BY len_bucket, q_band"""
      }),
  )

  /** x205/x205b's synthesized crawl: the documents table wrapped in the
    * x199 HTML shape with x200 rule-exercising URLs, as the (key, url,
    * status, mime, payload, shard) frame [[graft.ext.Export.writeWarcShards]]
    * packs into real WARC response records — ONE definition so the batch
    * pipeline entry and the streaming gate ingest byte-identical
    * containers and cannot drift. */
  /** The x199+x200 oracle chains composed - the DuckDB CTE body shared
    * by x205 (WARC crawl pipeline) and x214 (WET derivation): page
    * synthesis, head/comment/script/style strip, block split,
    * visible-text + link-density structs, kept-block fold, and the URL
    * canonicalization chain. Ends with CTEs `x` (doc_id, n_blocks,
    * n_kept, main_text) and `ff` (canonical url parts). Kept as a PLAIN
    * (non-interpolated) literal: it carries regex backslashes the
    * s-interpolator would reject; the final SELECTs that splice it in
    * are backslash-free. */
  // lazy: `defs` interpolates this during object init and is declared
  // ABOVE — a strict val here would still be null at that point
  private lazy val crawlOracleCtes: String =
    """h AS (
                SELECT doc_id,
                  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
                  '</title><style>body{margin:0}</style>' ||
                  '<script>if (a<b) { track("&x"); }</script></head><body>' ||
                  '<nav><a href="/">home</a> <a href="/all">all docs</a></nav>' ||
                  '<!-- rendered by graft -->' ||
                  '<div id="main"><p>' ||
                  replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
                  CASE WHEN doc_id % 3 = 0
                    THEN ' See <a href="/ref">the reference</a> for details.'
                    ELSE '' END ||
                  '</p><p>Tags: &lt;' || lang || '&gt; &amp; more</p></div>' ||
                  '<aside><a href="/a">one</a> <a href="/b">two</a></aside>' ||
                  '<footer>&copy; corpus <a href="/tos">terms</a> ' ||
                  '<a href="/priv">privacy</a></footer></body></html>' AS html
                FROM documents),
              c AS (
                SELECT doc_id, regexp_replace(html,
                  '(?is)<head\b[^>]*>.*?</head\s*>|<!--.*?-->|<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>',
                  ' ', 'g') AS ch FROM h),
              b AS (
                SELECT doc_id, string_split_regex(ch,
                  '(?i)<(?:/?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|blockquote|section|article|header|footer|nav|aside|main|figure|figcaption|pre|form|title|body|html)\b[^>]*|br\s*/?)>') AS blocks
                FROM c),
              t AS (
                SELECT doc_id, list_filter(list_transform(blocks, bl ->
                    struct_pack(
                      v := trim(regexp_replace(
                        replace(replace(replace(replace(replace(replace(replace(
                          regexp_replace(bl, '(?s)<[^>]*>', ' ', 'g'),
                          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                          '&#39;', ''''), '&apos;', ''''), '&nbsp;', ' '),
                          '&amp;', '&'),
                        '\s+', ' ', 'g')),
                      a := coalesce(length(trim(regexp_replace(
                        replace(replace(replace(replace(replace(replace(replace(
                          regexp_replace(array_to_string(
                            regexp_extract_all(bl, '(?is)<a\b[^>]*>(.*?)</a\s*>', 1),
                            ' '), '(?s)<[^>]*>', ' ', 'g'),
                          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                          '&#39;', ''''), '&apos;', ''''), '&nbsp;', ' '),
                          '&amp;', '&'),
                        '\s+', ' ', 'g'))), 0))),
                  tt -> length(tt.v) > 0) AS vb
                FROM b),
              x AS (
                SELECT doc_id,
                  CAST(len(vb) AS BIGINT) AS n_blocks,
                  CAST(len(list_filter(vb, tt -> tt.a * 100 <= 40 * length(tt.v))) AS BIGINT) AS n_kept,
                  array_to_string(list_transform(
                    list_filter(vb, tt -> tt.a * 100 <= 40 * length(tt.v)),
                    tt -> tt.v), ' ') AS main_text
                FROM t),
              r AS (
                SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) ||
                  '://' ||
                  (CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END) ||
                  '.Example.COM' ||
                  (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END) ||
                  '/docs/item' || CAST(doc_id % 100 AS VARCHAR) ||
                  (CASE WHEN doc_id % 3 = 0 THEN '//' ELSE '' END) ||
                  (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=home&utm_medium=rss'
                        WHEN doc_id % 4 = 1 THEN '?ref=home'
                        WHEN doc_id % 4 = 2 THEN '?UTM_Campaign=x'
                        ELSE '' END) ||
                  (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)
                  AS url_raw
                FROM documents),
              pp AS (
                SELECT doc_id, url_raw,
                  lower(regexp_extract(url_raw,
                    '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                  regexp_replace(lower(regexp_extract(url_raw,
                    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                    '^[^@]*@', '') AS hostport,
                  regexp_extract(url_raw,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest
                FROM r),
              nn AS (
                SELECT doc_id, scheme,
                  CASE WHEN scheme = 'http'
                         THEN regexp_replace(hostport, ':80$', '')
                       WHEN scheme = 'https'
                         THEN regexp_replace(hostport, ':443$', '')
                       ELSE hostport END AS host,
                  regexp_replace(hostport, ':\d+$', '') AS bare_host,
                  regexp_replace(regexp_replace(rest, '#.*$', ''),
                    '\?.*$', '') AS path0,
                  regexp_extract(regexp_replace(rest, '#.*$', ''),
                    '\?(.*)$', 1) AS q0
                FROM pp),
              ff AS (
                SELECT doc_id, scheme, host, bare_host,
                  regexp_replace(path0, '^(/.+?)/+$', '\1') AS path1,
                  regexp_replace(regexp_replace(q0,
                    '(^|&)(?i:utm_)[^&]*', '', 'g'), '^&+', '') AS q1
                FROM nn)"""

  private def crawlSynthFrame(s: SparkSession, d: String,
                              onlyEvery: Int = 1): DataFrame = {
    val docs0 = Tables.documents(s, d)
    // gate entries bound their fixtures: x205b streams a 1-in-onlyEvery
    // subset (the streaming engine's fixed per-batch costs dominate the
    // gate; parity strength does not grow with fixture rows)
    val docs = if (onlyEvery <= 1) docs0
      else docs0.filter(col("doc_id") % onlyEvery === 0)
    val escT = regexp_replace(regexp_replace(regexp_replace(col("text"),
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val inlineRef = when(col("doc_id") % 3 === 0,
      lit(" See <a href=\"/ref\">the reference</a> for details."))
      .otherwise(lit(""))
    val html = concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><style>body{margin:0}</style>" +
        "<script>if (a<b) { track(\"&x\"); }</script></head><body>" +
        "<nav><a href=\"/\">home</a> <a href=\"/all\">all docs</a></nav>" +
        "<!-- rendered by graft -->" +
        "<div id=\"main\"><p>"),
      escT, inlineRef,
      lit("</p><p>Tags: &lt;"), col("lang"),
      lit("&gt; &amp; more</p></div>" +
        "<aside><a href=\"/a\">one</a> <a href=\"/b\">two</a></aside>" +
        "<footer>&copy; corpus <a href=\"/tos\">terms</a> " +
        "<a href=\"/priv\">privacy</a></footer></body></html>"))
    val id = col("doc_id")
    val scheme = when(id % 2 === 0, lit("HTTP")).otherwise(lit("https"))
    val port = when(id % 2 === 0, lit(":80")).otherwise(lit(":443"))
    val host = concat(
      when(id % 5 === 0, upper(col("source"))).otherwise(col("source")),
      lit(".Example.COM"))
    val path = concat(lit("/docs/item"), (id % 100).cast("string"),
      when(id % 3 === 0, lit("//")).otherwise(lit("")))
    val query = when(id % 4 === 0,
        lit("?utm_source=feed&ref=home&utm_medium=rss"))
      .when(id % 4 === 1, lit("?ref=home"))
      .when(id % 4 === 2, lit("?UTM_Campaign=x"))
      .otherwise(lit(""))
    val frag = when(id % 7 === 0, lit("#section-2")).otherwise(lit(""))
    val rawUrl = concat(scheme, lit("://"), host, port, path, query, frag)
    docs.select(
      concat(lit("doc-"),
        lpad(id.cast("string"), 12, "0")).as("key"),
      rawUrl.as("url"),
      lit(200).cast("int").as("status"),
      lit("text/html").as("mime"),
      encode(html, "UTF-8").as("payload"),
      (id % 8).cast("int").as("shard"))
  }

  /** The crawl INGEST chain over WARC reader output (key, url, payload):
    * byte-level UTF-8 validity gate BEFORE string-land (Spark 4's decode
    * throws on malformed bytes), then main-content extraction and URL
    * canonicalization → (doc_id, url_canon, host, n_blocks, n_kept,
    * main_text). Shared verbatim by x205 (batch over readWarcShards) and
    * x205b (per micro-batch over readWarcStream in foreachBatch), so the
    * two entries compare the SAME computation across the two ingest
    * paths. Scan-local expression chains + one broadcast-sized join; no
    * UDFs, no extra shuffle. */
  private def crawlExtractChain(records: DataFrame): DataFrame = {
    val read = records
      .filter(TextAnalysis.utf8InvalidBytes(col("payload")) === 0)
      .select(
        expr("CAST(substring(key, 5, 12) AS BIGINT)").as("doc_id"),
        TextAnalysis.urlNormalize(col("url")).as("url_canon"),
        TextAnalysis.urlHost(col("url")).as("host"),
        decode(col("payload"), "UTF-8").as("html"))
    val extracted = TextAnalysis.htmlExtract(
      read.select(col("doc_id"), col("html")))
    read.select(col("doc_id"), col("url_canon"), col("host"))
      .join(extracted, "doc_id")
      .select(col("doc_id"), col("url_canon"), col("host"),
        col("n_blocks"), col("n_kept"), col("main_text"))
  }
}
