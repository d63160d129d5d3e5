package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted soak probes for costs the bench harness can't isolate —
  * committed so SOAK.md's numbers are reproducible.
  *
  * Modes (args: <mode> <sfDir>):
  *  - `grouped-editdist`: time `Dedup.editDistPairs` with groupCols =
  *    (source, replica) on a [[Soak]]-replicated directory. Replica =
  *    doc_id div [[Soak.KeyBase]] (0 everywhere on an un-replicated
  *    base dir, so base and soak runs use the SAME grouping). This is
  *    the production claim measured: when data growth arrives as NEW
  *    groups (new crawl snapshots/sources), per-group band occupancy is
  *    constant and grouped banding costs linear work — vs the
  *    corpus-occupancy quadratic of the ungrouped form.
  *  - `pagerank`: materialize an exact k=5/minCos=0.2 knn edge list
  *    once (persist + count, NOT in the timing), then time ONLY the 5
  *    pageRankMicro iterations + top-20 collect — the iterative-closure
  *    cost the bench attributes to the shared frame.
  *
  * Prints one line: `[probe] <mode> <sfDir> build=<s> timed=<s>`. */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SoakProbe <mode> <sfDir>")
    val (mode, sfDir) = (args(0), args(1))
    val spark = SparkSession.builder()
      .appName("graft-soak-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      mode match {
        case "grouped-editdist" =>
          val docs = Tables.documents(spark, sfDir)
            .withColumn("rep", expr(s"doc_id div ${Soak.KeyBase}"))
          // warm the input scan so the timing is the join, not the read
          val (_, build) = timed(docs.count())
          val (n, t) = timed(
            ext.Dedup.editDistPairs(docs, dMax = 8,
              groupCols = Seq("source", "rep")).count())
          println(f"[probe] grouped-editdist $sfDir pairs=$n build=$build%.2f timed=$t%.2f")
        case "pagerank" =>
          val emb = Tables.embeddings(spark, sfDir)
          val nodes = emb.select(col("vec_id")).persist()
          // exact knn edges (the x159 input shape), built OUTSIDE the timing
          val nrm = ext.Similarity.withNorms(emb)
          val a = nrm.select(col("vec_id").as("src"), col("embedding").as("ea"),
            col("nrm").as("na"))
          val b = nrm.select(col("vec_id").as("dst"), col("embedding").as("eb"),
            col("nrm").as("nb"))
          val scored = a.join(b, col("src") =!= col("dst"))
            .select(col("src"), col("dst"),
              (org.apache.spark.sql.graft.VectorFunctions.dotF(col("ea"), col("eb"))
                / (col("na") * col("nb"))).as("cos"))
            .filter(col("cos") >= 0.2)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
          val edges = scored
            .withColumn("rnk", row_number().over(w))
            .filter(col("rnk") <= 5)
            .select(col("src"), col("dst")).persist()
          val (ne, build) = timed(edges.count())
          val (_, t) = timed {
            val pr = ext.Graphs.pageRankMicro(edges, nodes, iters = 5)
            pr.orderBy(col("pr").desc, col("vec_id")).limit(20).collect()
          }
          println(f"[probe] pagerank $sfDir edges=$ne build=$build%.2f timed=$t%.2f")
        case "mining-audit" =>
          // VERDICT r17 "what's wrong" #2: the soak's scale adjudication
          // (noise vs growth) must be separable by DIFFING ARTIFACTS, not
          // by trusting prose — emit the candidate/bucket counters of the
          // flagged mining frames as one JSON line per sf dir. Candidate
          // counts are pure functions of the DATA (not of load, JVM
          // traffic, or AQE), so a soak ratio that moves while these stay
          // put is noise by construction.
          val docs = Tables.documents(spark, sfDir)
          val emb = Tables.embeddings(spark, sfDir)
          def rowJson(df: org.apache.spark.sql.DataFrame): String = {
            val r = df.collect().head
            df.columns.zipWithIndex
              .map { case (c, i) => s""""$c": ${r.get(i)}""" }
              .mkString("{", ", ", "}")
          }
          val lsh = rowJson(ext.Similarity.lshBucketStats(emb))
          val shingle = rowJson(ext.Dedup.postingsDfStats(
            docs, "text", "doc_id", n = 3))
          println(s"""[probe-json] {"probe": "mining-audit", """ +
            s""""sf": "$sfDir", "lsh_t035": $lsh, """ +
            s""""shingle_df_n3": $shingle}""")
        case "frontier-skew" =>
          // VERDICT r18 next-round #6: the x211 mega-host posture,
          // measured. Synthesize a frontier where ONE host holds ~30% of
          // all URLs (the en.wikipedia shape) at 20 URLs per document,
          // then time frontierWaves uncapped vs maxPerHost=1000. The cap
          // is a rank-filter over the host window, which Spark rewrites
          // to a WindowGroupLimit — rows beyond the cap prune BEFORE the
          // mega-host partition sorts, so the cap should bound the
          // straggler task, and this probe reports whether it does.
          val docs = Tables.documents(spark, sfDir)
          val urls = docs
            .select(col("doc_id"), col("source"), col("n_chars"),
              explode(sequence(lit(0), lit(19))).as("i"))
            .select(
              when(col("doc_id") % 10 < 3, lit("mega.example.com"))
                .otherwise(concat(col("source"),
                  (col("doc_id") % 97).cast("string"),
                  lit(".example.com"))).as("host"),
              concat(lit("https://p/"), col("doc_id").cast("string"),
                lit("/"), col("i").cast("string")).as("url"),
              (col("n_chars") + col("i")).cast("long").as("prio"))
            .persist()
          val n = urls.count() // materialize outside the timings
          val mega = urls.filter(col("host") === "mega.example.com").count()
          for (cap <- Seq(Int.MaxValue, 1000)) {
            val (rows, t) = timed(
              ext.Crawl.frontierWaves(urls, perHostPerWave = 8,
                maxPerHost = cap).count())
            val capTxt = if (cap == Int.MaxValue) "none" else cap.toString
            println(f"[probe] frontier-skew $sfDir urls=$n " +
              f"megaShare=${mega.toDouble / n}%.2f cap=$capTxt " +
              f"rows=$rows timed=$t%.2f")
          }
          urls.unpersist()
        case "warc-rate" =>
          // VERDICT r17 next-round #8: the streaming-ingest rate curve.
          // Synthesize one WARC container per shard from the documents
          // table, then stream the directory under maxFilesPerTrigger in
          // {1, 8}, reporting the ENGINE's own per-batch latency
          // (triggerExecution from the progress log) against the 5 s
          // per-pipeline budget.
          val docs = Tables.documents(spark, sfDir)
          val tmp = java.nio.file.Files
            .createTempDirectory("graft-warc-rate").toString
          val src = s"$tmp/src"
          val nShards = 32
          ext.Export.writeWarcShards(docs.select(
              concat(lit("doc-"),
                lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
              concat(lit("https://h.example.com/"),
                col("doc_id").cast("string")).as("url"),
              lit(200).cast("int").as("status"),
              lit("text/html").as("mime"),
              encode(col("text"), "UTF-8").as("payload"),
              (col("doc_id") % nShards).cast("int").as("shard")),
            src, compression = "gzip")
          for (mfpt <- Seq(1, 8)) {
            val ckpt = s"$tmp/ckpt-$mfpt"
            val rows = new java.util.concurrent.atomic.AtomicLong(0L)
            val q = ext.Export.readWarcStream(spark, src,
                options = Map("maxFilesPerTrigger" -> mfpt.toString))
              .writeStream.option("checkpointLocation", ckpt)
              .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
                rows.addAndGet(b.count()); ()
              }
              .start()
            val t0 = System.nanoTime()
            q.processAllAvailable()
            val total = (System.nanoTime() - t0) / 1e9
            val lat = q.recentProgress.filter(_.numInputRows > 0)
              .map(_.durationMs.get("triggerExecution").toDouble / 1000)
            q.stop()
            println(f"[probe] warc-rate $sfDir mfpt=$mfpt files=$nShards " +
              f"batches=${lat.length} rows=${rows.get()} total=$total%.2f " +
              f"maxBatch=${lat.max}%.2f meanBatch=${lat.sum / lat.length}%.2f")
          }
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
        case "wet-rate" =>
          // the warc-rate discipline on the extracted-text container:
          // one WET container per shard from documents, streamed via
          // readWetStream (strict UTF-8 decode on the hot path) under
          // maxFilesPerTrigger in {1, 8}, engine-reported batch latency.
          val docs = Tables.documents(spark, sfDir)
          val tmp = java.nio.file.Files
            .createTempDirectory("graft-wet-rate").toString
          val src = s"$tmp/src"
          val nShards = 32
          ext.Export.writeWetShards(docs.select(
              concat(lit("doc-"),
                lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
              concat(lit("https://h.example.com/"),
                col("doc_id").cast("string")).as("url"),
              col("text"),
              (col("doc_id") % nShards).cast("int").as("shard")),
            src, compression = "gzip")
          for (mfpt <- Seq(1, 8)) {
            val ckpt = s"$tmp/ckpt-$mfpt"
            val rows = new java.util.concurrent.atomic.AtomicLong(0L)
            val q = ext.Export.readWetStream(spark, src,
                options = Map("maxFilesPerTrigger" -> mfpt.toString))
              .writeStream.option("checkpointLocation", ckpt)
              .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
                rows.addAndGet(b.count()); ()
              }
              .start()
            val t0 = System.nanoTime()
            q.processAllAvailable()
            val total = (System.nanoTime() - t0) / 1e9
            val lat = q.recentProgress.filter(_.numInputRows > 0)
              .map(_.durationMs.get("triggerExecution").toDouble / 1000)
            q.stop()
            println(f"[probe] wet-rate $sfDir mfpt=$mfpt files=$nShards " +
              f"batches=${lat.length} rows=${rows.get()} total=$total%.2f " +
              f"maxBatch=${lat.max}%.2f meanBatch=${lat.sum / lat.length}%.2f")
          }
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
        case other => sys.error(s"unknown probe mode '$other'")
      }
    } finally spark.stop()
  }
}
