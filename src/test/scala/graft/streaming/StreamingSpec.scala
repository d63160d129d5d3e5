package graft.streaming

import graft.SparkSpec
import graft.model.ProgressEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("streaming tumbling window counts equal the batch plan on the same data") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = (0 until 100).map(i =>
      (java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(i * 60000L)),
        if (i % 2 == 0) "a" else "b"))

    // batch reference
    val batchDf = rows.toDF("ts", "k")
    val expected = StreamingOps.windowedCounts(batchDf, "ts", "k", "10 minutes")
      .orderBy("win_start", "k")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq

    // streaming: same rows through a MemoryStream in two chunks
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val sdf = mem.toDF().toDF("ts", "k").withWatermark("ts", "1 minute")
    val query = StreamingOps.windowedCounts(sdf, "ts", "k", "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      mem.addData(rows.take(50))
      query.processAllAvailable()
      mem.addData(rows.drop(50))
      query.processAllAvailable()
      val got = spark.table("win_counts")
        .orderBy("win_start", "k")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
      assert(got === expected)
    } finally query.stop()
  }

  test("session windows split on the gap in streaming mode") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val sdf = mem.toDF().toDF("ts", "k").withWatermark("ts", "1 minute")
    val query = StreamingOps.sessionCounts(sdf, "ts", "k", "5 minutes")
      .writeStream.format("memory").queryName("sess_counts")
      .outputMode("complete").start()
    try {
      def t(ms: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(ms))
      mem.addData(Seq((t(0L), "u"), (t(60000L), "u"), (t(10 * 60000L), "u")))
      query.processAllAvailable()
      val got = spark.table("sess_counts").orderBy("sess_start")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(3))).toSeq
      // two sessions: [0, 1min] (2 events) and [10min] (1 event)
      assert(got === Seq((0L, 2L), (10 * 60000L, 1L)))
    } finally query.stop()
  }

  test("streaming exact dedup keeps first arrival per content within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def t(ms: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(ms))
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val sdf = mem.toDF().toDF("ts", "doc_id", "text").withWatermark("ts", "10 minutes")
    val query = StreamingOps.streamingExactDedup(sdf, "text")
      .select("doc_id", "text")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      mem.addData(Seq((t(0L), 1L, "alpha"), (t(1000L), 2L, "alpha"), (t(2000L), 3L, "beta")))
      query.processAllAvailable()
      mem.addData(Seq((t(3000L), 4L, "alpha"), (t(4000L), 5L, "gamma")))
      query.processAllAvailable()
      val got = spark.table("stream_dedup")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // one survivor per distinct text; the duplicate-in-batch and the
      // duplicate-across-batches are both dropped
      assert(got.map(_._2) === Set("alpha", "beta", "gamma"))
      assert(got.size === 3)
      // batch degenerate form agrees on the survivor count
      val batch = StreamingOps.streamingExactDedup(
        Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta")).toDF("doc_id", "text"), "text")
      assert(batch.count() === 2L)
    } finally query.stop()
  }

  test("streaming Bloom decontamination via foreachBatch matches the batch pass") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // eval side is static: the Bloom builds ONCE; each train micro-batch is
    // flagged scan-locally by the same flagger (broadcast-state shape).
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val train = docs.filter(col("doc_id") % 7 =!= 0).select(col("doc_id"), col("text"))
    val flag = graft.ext.Dedup.bloomFlagger(
      docs.filter(col("doc_id") % 7 === 0), "text", "doc_id", n = 3, minShared = 3L)
    val expected = flag(train).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(expected.nonEmpty) // the fixture must actually exercise the filter

    val rows = train.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val flagged = flag(batch).collect().map(r => (r.getLong(0), r.getLong(1)))
        acc.synchronized { acc ++= flagged }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      // per-doc shingle counts are intra-row, so micro-batch boundaries
      // cannot split them: streaming union == batch output exactly
      assert(acc.sorted.toSeq === expected)
    } finally query.stop()
  }

  test("streaming near-dup flagging against a static reference matches the batch pair set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val stream = docs.filter(col("doc_id") % 2 =!= 0)
    val flag = graft.ext.Dedup.nearDupFlagger(ref, "text", "doc_id", n = 3, threshold = 0.6)
    // expected: the full-corpus exact pair set restricted to odd-even pairs,
    // oriented stream-side (odd) first
    val expected = graft.ext.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .collect { case (a, b, j) if a % 2 != b % 2 =>
        if (a % 2 == 1) (a, b, j) else (b, a, j) }.sorted.toSeq
    assert(expected.nonEmpty) // the fixture must actually exercise the flagger

    val rows = stream.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val flagged = flag(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        acc.synchronized { acc ++= flagged }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      assert(acc.sorted.toSeq === expected)
    } finally query.stop()
  }

  test("streaming containment flagging against a static reference matches the batch pair set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val stream = docs.filter(col("doc_id") % 2 =!= 0)
    val flag = graft.ext.Dedup.containmentFlagger(ref, "text", "doc_id",
      n = 3, threshold = 0.8)
    // expected: the full-corpus x186-style pair set restricted to
    // odd-even pairs, oriented stream-side (odd) first
    val expected = graft.ext.Dedup.containmentPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .collect { case (a, b, c) if a % 2 != b % 2 =>
        if (a % 2 == 1) (a, b, c) else (b, a, c) }.sorted.toSeq
    assert(expected.nonEmpty) // the fixture must actually exercise the flagger

    val rows = stream.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val flagged = flag(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        acc.synchronized { acc ++= flagged }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      assert(acc.sorted.toSeq === expected)
    } finally query.stop()
  }

  test("streaming media flagging via hammingFlagger matches the batch probe") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // signatures from the x166 pixel chain at sf0.001: corpus = even docs
    // frozen, odd docs arrive as a signature stream in two chops — each
    // batch's flags depend only on its own signatures + the frozen bands,
    // so streaming ≡ batch on the same rows
    val d = "/root/testdata/sf0.001"
    val sigs = graft.SparkEntry.queries("x166_pixel_dhash")(spark, d)
      .groupBy(col("doc_id"))
      // reassemble the 64-bit hash from its disjoint row-bytes (bit_or —
      // a sum could ANSI-overflow when byte 7 sets the sign bit)
      .agg(expr("bit_or(shiftleft(bits, 8 * CAST(row_no AS INT)))")
        .as("phash"))
    val ref = sigs.filter(col("doc_id") % 2 === 0)
    val probe = sigs.filter(col("doc_id") % 2 =!= 0)
    val flag = graft.ext.Dedup.hammingFlagger(ref, "phash", hMax = 3)
    try {
      val expected = flag(probe).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(expected.nonEmpty)
      val rows = probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val mem = MemoryStream[(Long, Long)]
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val query = mem.toDF().toDF("doc_id", "phash").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = flag(batch).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          acc.synchronized { acc ++= got }
          ()
        }
        .outputMode("append").start()
      try {
        mem.addData(rows.take(rows.length / 2))
        query.processAllAvailable()
        mem.addData(rows.drop(rows.length / 2))
        query.processAllAvailable()
        assert(acc.sorted.toSeq === expected)
      } finally query.stop()
    } finally flag.close()
  }

  test("streaming batch retrieval via srpRetriever matches batch srpCrossTopK") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // corpus-side state (bucket postings + norms) builds ONCE; each query
    // micro-batch pays only its own banding — the x54 plan tail per batch.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val expected = graft.ext.Similarity
      .srpCrossTopK(queries, corpus, kTop = 3, minCos = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sorted.toSeq
    assert(expected.nonEmpty) // the fixture must actually retrieve something

    val retrieve = graft.ext.Similarity.srpRetriever(corpus, kTop = 3, minCos = 0.2)
    val rows = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val mem = MemoryStream[(Long, Array[Float])]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val query = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = retrieve(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      // each query's top-k depends only on its own row + the static corpus
      // (rank window partitions by query_id), so batch boundaries are
      // invisible: streaming union == batch output exactly
      assert(acc.sorted.toSeq === expected)
    } finally query.stop()
  }

  test("streaming incremental dedup matches the batch x77 labels") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val newBatch = docs.filter(col("doc_id") % 5 === 0)
    val expected = graft.ext.Dedup
      .incrementalDedup(newBatch, corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(expected.exists(_._2 == "dup_corpus")) // fixture exercises labels

    // id-ordered delivery in two chunks — "earlier doc" == "lower id"
    val rows = newBatch.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val mem = MemoryStream[(Long, String)]
    val sdf = mem.toDF().toDF("doc_id", "text")
    val query = StreamingOps.streamingIncrementalDedup(sdf, corpus, "text", "doc_id")
      .writeStream.format("memory").queryName("inc_dedup")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      val got = spark.table("inc_dedup")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got === expected)
    } finally query.stop()
  }

  test("incremental dedup state times out: re-arrival past the horizon is kept") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val corpus = Seq((100L, "corpus only text")).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val sdf = mem.toDF().toDF("doc_id", "text")
    // ProcessingTimeTimeout keeps scheduling wake-up batches, so
    // processAllAvailable can spin — poll the sink for row counts instead.
    val query = StreamingOps.streamingIncrementalDedup(
        sdf, corpus, "text", "doc_id", stateTimeoutMs = 2000L)
      .writeStream.format("memory").queryName("inc_dedup_ttl")
      .outputMode("append").start()
    def rowsNow() = spark.table("inc_dedup_ttl")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    def awaitRows(n: Int): Seq[(Long, String)] = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var got = rowsNow()
      while (got.length < n && System.nanoTime() < deadline) {
        Thread.sleep(50); got = rowsNow()
      }
      assert(got.length >= n, s"sink never reached $n rows: $got")
      got
    }
    try {
      mem.addData((1L, "alpha text"))
      assert(awaitRows(1) === Seq((1L, "kept")))
      // within the horizon a re-arrival is still a batch-dup
      mem.addData((2L, "alpha text"))
      assert(awaitRows(2).last === ((2L, "dup_batch")))
      Thread.sleep(3000) // let the 2 s horizon lapse (wake-up batch evicts)
      // unrelated doc triggers a batch in case no wake-up batch ran
      mem.addData((3L, "beta text"))
      awaitRows(3)
      Thread.sleep(500)
      mem.addData((4L, "alpha text")) // past the horizon: fresh again
      val got = awaitRows(4)
      assert(got(3) === ((4L, "kept")))
      // corpus dups are stateless and unaffected by the horizon
      mem.addData((5L, "corpus only text"))
      assert(awaitRows(5).last === ((5L, "dup_corpus")))
    } finally query.stop()
  }

  test("streaming IVF retrieval via ivfRetriever matches batch ivfCrossTopK") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    // identical knobs → identical deterministic training → identical cells
    val expected = graft.ext.Ivf
      .ivfCrossTopK(queries, corpus, kTop = 3, minCos = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sorted.toSeq
    assert(expected.nonEmpty)

    val retrieve = graft.ext.Ivf.ivfRetriever(corpus, kTop = 3, minCos = 0.2)
    val rows = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val mem = MemoryStream[(Long, Array[Float])]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val query = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = retrieve(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      assert(acc.sorted.toSeq === expected)
    } finally query.stop()
  }

  test("streaming IVF-PQ retrieval via pqRetriever matches batch ivfPqCrossTopK") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    // identical knobs → identical deterministic training → identical
    // cells, codebooks, and ADC shortlists
    val expected = graft.ext.Pq
      .ivfPqCrossTopK(queries, corpus, kTop = 3, minCos = 0.2,
        m = 16, k = 16, refine = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sorted.toSeq
    assert(expected.nonEmpty)

    val retrieve = graft.ext.Pq.pqRetriever(corpus, kTop = 3, minCos = 0.2,
      m = 16, k = 16, refine = 16)
    val rows = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val mem = MemoryStream[(Long, Array[Float])]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val query = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = retrieve(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      retrieve.close()
    }
  }

  test("streaming unigram scoring via unigramScorer matches the batch x92 rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    // the corpus scored against its own frozen model IS x92
    val expected = graft.SparkEntry.queries("x92_unigram_logprob")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(expected.nonEmpty)
    val score = graft.ext.TextAnalysis.unigramScorer(docs)
    val batchSelf = score(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(batchSelf === expected)
    // an unseen token scores at the 1/total OOV floor, not a crash/null
    val oov = score(Seq((999999L, "zzzunseenzzz")).toDF("doc_id", "text")).collect()
    assert(oov.length === 1 && oov(0).getLong(1) === 1L && oov(0).getDouble(2) > 0.0)

    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = score(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      // each doc's score depends only on its own row + the frozen model:
      // streaming union == batch output exactly
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      score.close()
    }
  }

  test("streaming NB quality scoring via nbScorer matches the batch x96 rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    // the corpus scored against its own frozen classifier IS x96
    val expected = graft.SparkEntry.queries("x96_nb_quality_score")(spark, d)
      .select("doc_id", "llr_micro", "score_micro", "pred_ref")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sorted.toSeq
    assert(expected.nonEmpty)
    val score = graft.ext.TextAnalysis.nbScorer(
      docs.filter(col("source") === "src0"),
      docs.filter(col("source") =!= "src0"))
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Boolean)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = score(batch)
          .select("doc_id", "llr_micro", "score_micro", "pred_ref")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      // llr table and prior froze at build: streaming union == batch
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      score.close()
    }
  }

  test("streaming block scrubbing via blockScrubber matches the batch x97 rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    // the corpus scrubbed against its own frozen block set IS x97
    val expected = graft.SparkEntry.queries("x97_block_scrub")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    assert(expected.nonEmpty)
    val scrub = graft.ext.TextAnalysis.blockScrubber(docs)
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = scrub(batch)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      // each doc scrubs against the frozen set only: union == batch
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      scrub.close()
    }
  }

  test("streaming CMS monitor matches the batch x99 sketch estimates") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    // batch reference: x99's (tok, est_cnt, slack) at the same seed
    val batch = graft.SparkEntry.queries("x99_cms_heavy_hitters")(spark, d)
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    assert(batch.nonEmpty)
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mon = graft.ext.TextAnalysis.cmsMonitor()
    val mem = MemoryStream[(Long, String)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        mon.ingest(b); ()
      }
      .outputMode("append").start()
    try {
      // three uneven, non-overlapping-by-construction chunks: merge must
      // be chop-invariant
      val (c1, rest) = rows.splitAt(math.min(7, rows.length / 3))
      val (c2, c3) = rest.splitAt(rest.length / 2)
      for (c <- Seq(c1, c2, c3)) {
        mem.addData(c)
        query.processAllAvailable()
      }
      batch.foreach { case (tok, est, slack) =>
        assert(mon.estimate(tok) === est, s"token $tok estimate diverged")
        assert(mon.slack === slack)
      }
    } finally query.stop()
  }

  test("streaming simhash flagging via simHashFlagger matches the batch rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val flag = graft.ext.Dedup.simHashFlagger(docs)
    val expected = flag(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(expected.nonEmpty, "fixture must contain simhash near-dups")
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = flag(batch)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      // flags are against the frozen corpus only: batch union == batch run
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      flag.close()
    }
  }

  test("streaming substring flagging via substringFlagger matches the batch x100 rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    // corpus-self flagging IS x100 (occurrence counts are corpus-wide
    // either way), so the streaming union must reproduce the catalog rows
    val expected = graft.SparkEntry.queries("x100_substring_dedup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sorted.toSeq
    assert(expected.exists(_._5), "fixture must contain duplicated windows")
    val flag = graft.ext.Dedup.substringFlagger(docs)
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Boolean)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = flag(batch)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      // each doc flags against the frozen dup set only: union == batch
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      flag.close()
    }
  }

  test("streaming substring scrubbing via substringScrubber matches its one-shot batch run") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val scrub = graft.ext.Dedup.substringScrubber(docs)
    // one-shot reference over the whole corpus (every copy of a duplicated
    // span scrubs — the frozen-model contract, unlike x134's keep-one)
    val expected = scrub(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    assert(expected.exists(_._3 > 0L), "fixture must scrub something")
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = scrub(batch)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      scrub.close()
    }
  }

  test("streaming typo-dup flagging via editDistFlagger matches the batch rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val flag = graft.ext.Dedup.editDistFlagger(docs)
    val expected = flag(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
      .sorted.toSeq
    assert(expected.exists(_._4), "fixture must contain at least one typo dup")
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Boolean)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = flag(batch)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      // each doc flags against the frozen corpus only: union == batch
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      flag.close()
    }
  }

  test("streaming TF-IDF scoring via tfidfScorer matches the batch x93 rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    // the corpus scored against its own frozen df model IS x93
    val expected = graft.SparkEntry.queries("x93_tfidf_terms")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .sorted.toSeq
    assert(expected.nonEmpty)
    val score = graft.ext.TextAnalysis.tfidfScorer(docs)
    val batchSelf = score(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .sorted.toSeq
    assert(batchSelf === expected)
    // an unseen token takes the ln(N/1) ceiling — maximally salient
    val oov = score(Seq((999999L, "zzzunseenzzz")).toDF("doc_id", "text")).collect()
    assert(oov.length === 1 && oov(0).getString(1) === "zzzunseenzzz")
    assert(oov(0).getLong(2) > 0L)

    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Int)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = score(batch).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      // tf and the rank window are per-doc; df/N are frozen — streaming
      // union == batch output exactly
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      score.close()
    }
  }

  test("stream-stream interval join matches only rows inside the time bound") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def t(ms: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(ms))
    val memL = MemoryStream[(java.sql.Timestamp, String, Long)]
    val memR = MemoryStream[(java.sql.Timestamp, String, String)]
    val l = memL.toDF().toDF("lts", "k", "v").withWatermark("lts", "1 minute")
    val r = memR.toDF().toDF("rts", "k", "tag").withWatermark("rts", "1 minute")
    val joined = StreamingOps.intervalJoin(l, r, "k", "lts", "rts",
      boundBefore = "0 seconds", boundAfter = "30 seconds")
    val query = joined.select("k", "v", "tag")
      .writeStream.format("memory").queryName("ivl_join")
      .outputMode("append").start()
    try {
      memL.addData(Seq((t(10000L), "a", 1L), (t(10000L), "b", 2L)))
      memR.addData(Seq(
        (t(20000L), "a", "in_bound"),     // +10s: matches
        (t(50000L), "a", "out_of_bound"), // +40s: outside the 30s bound
        (t(20000L), "c", "wrong_key")))
      memL.addData(Seq((t(300000L), "z", 9L)))  // advance watermark
      memR.addData(Seq((t(300000L), "z", "zz")))
      query.processAllAvailable()
      val got = spark.table("ivl_join")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(got.contains(("a", 1L, "in_bound")))
      assert(!got.exists(_._3 == "out_of_bound"))
      assert(!got.exists(_._3 == "wrong_key"))
    } finally query.stop()
  }

  test("lifecycle tracker: started -> progress -> terminated removes state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[ProgressEvent]
    // timeoutMs=0 => NoTimeout: ProcessingTimeTimeout keeps scheduling
    // wake-up batches, which makes processAllAvailable spin in tests.
    val query = StreamingOps.trackLifecycle(mem.toDS(), timeoutMs = 0L)
      .writeStream.format("memory").queryName("lifecycle")
      .outputMode("append").start()
    try {
      def pe(kind: String, batch: Option[Long]) = ProgressEvent(
        kind, "q1", "r1", Some("myquery"), batch,
        Some("2024-01-01T00:00:00.000Z"), Some(10L), Some(5.0), Nil, None)
      mem.addData(pe("started", None))
      query.processAllAvailable()
      // progress AND terminated in the SAME micro-batch: the lifecycle
      // rank must order terminated last even though its batchId is None
      mem.addData(pe("progress", Some(0L)), pe("progress", Some(1L)),
        pe("terminated", None))
      query.processAllAvailable()
      val got = spark.table("lifecycle")
        .collect().map(r => (r.getAs[Long]("lastBatchId"), r.getAs[Boolean]("active")))
      // 2 emissions: after start (active), after the combined
      // progress+terminated batch (inactive, but batch 1 was applied first)
      assert(got.length === 2)
      assert(got.map(_._2).toSeq === Seq(true, false))
      assert(got(1)._1 === 1L)
    } finally query.stop()
  }

  test("streaming drift histogram state merges to the batch x76 AUC") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the x76 rank statistic needs only the (source, score-grid) count
    // table — bounded at n_sources × 10⁴ rows — so a stream maintains it
    // by merging per-batch histograms; ranks/AUC derive from the merged
    // state at read time. This pins that incremental shape against the
    // batch operator.
    val d = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("x76_source_quality_drift")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

    val rows = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val mem = MemoryStream[(Long, String, String)]
    val hist = scala.collection.mutable.Map.empty[(String, Long), Long].withDefaultValue(0L)
    val query = mem.toDF().toDF("doc_id", "source", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val part = batch.select(col("source"),
            graft.ext.TextAnalysis.qualityScoreInt(col("text")).as("q"))
          .groupBy("source", "q").count().collect()
        hist.synchronized {
          part.foreach(r =>
            hist((r.getString(0), r.getLong(1))) += r.getLong(2))
        }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
    } finally query.stop()

    // AUC from the merged histogram state (pure fold, mirrors the operator)
    val byQ = hist.groupBy(_._1._2).view.mapValues(_.values.sum).toSeq.sortBy(_._1)
    var cum = 0L
    val mr2 = byQ.map { case (q, cnt) =>
      val m = (q, 2 * cum + cnt + 1); cum += cnt; m
    }.toMap
    val n = cum
    val got = hist.groupBy(_._1._1).map { case (src, m) =>
      val n1 = m.values.sum
      val r2 = m.map { case ((_, q), c) => c * mr2(q) }.sum
      val auc = (r2 - n1 * (n1 + 1)).toDouble / (2.0 * n1 * (n - n1))
      (src, n1,
        BigDecimal(auc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    assert(got === expected)
  }

  test("streaming BM25 retrieval via bm25Retriever matches batch bm25CrossTopK") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val qRows = Seq(
      (0L, Seq("dup", "vector")), (1L, Seq("stream", "batch")),
      (2L, Seq("customer", "query")), (3L, Seq("merge", "sort", "window")),
      (4L, Seq("data")))
    val expected = graft.ext.Retrieval
      .bm25CrossTopK(docs, qRows.toDF("query_id", "terms"), kTop = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
      .sorted.toSeq
    assert(expected.nonEmpty)

    // corpus-side postings build ONCE; each query micro-batch pays only
    // its own term explode + posting join — the x130 plan tail per batch
    val retrieve = graft.ext.Retrieval.bm25Retriever(docs, kTop = 3)
    val mem = MemoryStream[(Long, Seq[String])]
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Int)]
    val query = mem.toDF().toDF("query_id", "terms").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = retrieve(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getInt(4)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(qRows.take(2))
      query.processAllAvailable()
      mem.addData(qRows.drop(2))
      query.processAllAvailable()
      // each query's ranking depends only on its own terms + the static
      // corpus postings, so batch chopping is invisible
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      retrieve.close()
    }
  }

  test("streaming funnel via funnelMonitor converges to the batch x161 rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("x161_event_funnel")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4))).sorted.toSeq
    assert(expected.nonEmpty)
    // deliver the whole event stream in timestamp order, chopped in two
    val rows = graft.Tables.events(spark, d)
      .select(col("user_id"), col("event_type"), col("ms"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._3, r._4)).toSeq
    val mem = MemoryStream[(Long, String, Long, Long)]
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Option[Long], Option[Long], Boolean)]
    val query = graft.streaming.StreamingOps.funnelMonitor(
        mem.toDF().toDF("user_id", "event_type", "ms", "event_id"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = batch.collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getBoolean(4)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      // the LAST emission per user is the converged funnel row
      val last = acc.zipWithIndex.groupBy(_._1._1)
        .map { case (_, g) => g.maxBy(_._2)._1 }.toSeq.sorted
      assert(last === expected)
    } finally query.stop()
  }

  test("streaming conversation monitor converges to batch x208 verdicts under SHUFFLED chops") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("x208_chat_validate")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7))).sorted.toSeq
    assert(expected.nonEmpty && expected.exists(!_._8) && expected.exists(_._8))
    val rows = graft.queries.ChatQueries.synthTurns(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3))).toSeq
    // verdicts recompute from accumulated state, so arrival order must
    // be IRRELEVANT: deliver the turns shuffled, split across two chops
    val shuffled = new scala.util.Random(7).shuffle(rows)
    val mem = MemoryStream[(Long, Int, String, String)]
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
    val query = graft.streaming.StreamingOps.conversationMonitor(
        mem.toDF().toDF("conv_id", "turn_idx", "role", "text"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = batch.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6), r.getBoolean(7)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(shuffled.take(shuffled.length / 3))
      query.processAllAvailable()
      mem.addData(shuffled.drop(shuffled.length / 3))
      query.processAllAvailable()
      val last = acc.zipWithIndex.groupBy(_._1._1)
        .map { case (_, g) => g.maxBy(_._2)._1 }.toSeq.sorted
      assert(last === expected)
    } finally query.stop()
  }

  test("streaming transitions via transitionMonitor aggregate to batch x163 counts") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("x163_event_transitions")(spark, d)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(expected.nonEmpty)
    val rows = graft.Tables.events(spark, d)
      .select(col("user_id"), col("event_type"), col("ms"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._3, r._4)).toSeq
    val mem = MemoryStream[(Long, String, Long, Long)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val query = graft.streaming.StreamingOps.transitionMonitor(
        mem.toDF().toDF("user_id", "event_type", "ms", "event_id"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = batch.collect().map(r => (r.getString(1), r.getString(2)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      // three uneven chops — boundary-straddling pairs must still emit
      mem.addData(rows.take(rows.length / 3))
      query.processAllAvailable()
      mem.addData(rows.slice(rows.length / 3, rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      val counts = acc.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      assert(counts === expected)
    } finally query.stop()
  }

  /** Shared harness for the BUFFERED monitors' out-of-order parity: the
    * sf event rows chopped into time-ordered thirds but SHUFFLED inside
    * each chop (seeded — deterministic), replayed through `monitor`, then
    * flushed by two far-future sentinel events (an unused user whose
    * single "sentinel" row emits nothing) that advance the watermark past
    * every real event so armed event-time timeouts drain the buffers. */
  private def replayShuffled[T: scala.reflect.ClassTag](
      monitor: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)(
      decode: org.apache.spark.sql.Row => T): Seq[T] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"), col("ms"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._3, r._4)).toSeq
    val rnd = new scala.util.Random(42)
    val chops = Seq(
      rows.take(rows.length / 3),
      rows.slice(rows.length / 3, 2 * rows.length / 3),
      rows.drop(2 * rows.length / 3)).map(rnd.shuffle(_))
    val maxMs = rows.map(_._3).max
    val sentinelUser = rows.map(_._1).max + 1
    val mem = MemoryStream[(Long, String, Long, Long)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[T]
    val query = monitor(mem.toDF().toDF("user_id", "event_type", "ms", "event_id"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = batch.collect().map(decode)
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      chops.foreach { c => mem.addData(c); query.processAllAvailable() }
      // two sentinel batches: the first advances the watermark past every
      // real event, the second forces one more micro-batch so the armed
      // timeouts actually fire and drain the buffers
      mem.addData(Seq((sentinelUser, "sentinel", maxMs + 10L * 86400000L, 0L)))
      query.processAllAvailable()
      mem.addData(Seq((sentinelUser, "sentinel", maxMs + 20L * 86400000L, 1L)))
      query.processAllAvailable()
      acc.toSeq
    } finally query.stop()
  }

  test("funnelMonitorBuffered evicts idle users past the event-time horizon") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val day = 86400000L
    val t0 = 1700000000000L
    val mem = MemoryStream[(Long, String, Long, Long)]
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Option[Long])]
    val query = graft.streaming.StreamingOps.funnelMonitorBuffered(
        mem.toDF().toDF("user_id", "event_type", "ms", "event_id"),
        lateness = "1 minute", evictAfterMs = 3600000L)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = batch.collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      def feed(rows: (Long, String, Long, Long)*): Unit = {
        mem.addData(rows); query.processAllAvailable()
      }
      // user 1's view commits once the watermark passes it
      feed((1L, "view", t0, 0L))
      feed((99L, "sentinel", t0 + 100L * day, 0L))
      feed((99L, "sentinel", t0 + 101L * day, 1L))
      assert(acc.toSeq === Seq((1L, t0, None)))
      // the idle horizon (1h << 100 days) has long passed: user 1's state
      // is evicted, so a NEW view starts a FRESH funnel (without eviction
      // the second view could never re-emit — t1 is already set)
      feed((1L, "view", t0 + 200L * day, 2L))
      feed((99L, "sentinel", t0 + 300L * day, 3L))
      feed((99L, "sentinel", t0 + 301L * day, 4L))
      assert(acc.toSeq === Seq((1L, t0, None), (1L, t0 + 200L * day, None)))
    } finally query.stop()
  }

  test("funnelMonitorBuffered: shuffled within-chop delivery converges to batch x161") {
    val d = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("x161_event_funnel")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4))).sorted.toSeq
    assert(expected.nonEmpty)
    val acc = replayShuffled(df =>
      graft.streaming.StreamingOps.funnelMonitorBuffered(df, lateness = "1 minute"))(
      r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4)))
    // the LAST emission per user is the converged funnel row — identical
    // to batch despite the shuffled delivery the unbuffered monitor
    // would mis-chain
    val last = acc.zipWithIndex.groupBy(_._1._1)
      .map { case (_, g) => g.maxBy(_._2)._1 }.toSeq.sorted
    assert(last === expected)
  }

  test("transitionMonitorBuffered: shuffled within-chop delivery aggregates to batch x163") {
    val d = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("x163_event_transitions")(spark, d)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(expected.nonEmpty)
    val acc = replayShuffled(df =>
      graft.streaming.StreamingOps.transitionMonitorBuffered(df, lateness = "1 minute"))(
      r => (r.getString(1), r.getString(2)))
    val counts = acc.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    assert(counts === expected)
  }

  test("streaming QL retrieval via qlRetriever matches batch qlCrossTopK") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val qRows = Seq(
      (0L, Seq("dup", "vector")), (1L, Seq("stream", "batch")),
      (2L, Seq("customer", "query")), (3L, Seq("merge", "sort", "window")),
      (4L, Seq("data")))
    val expected = graft.ext.Retrieval
      .qlCrossTopK(docs, qRows.toDF("query_id", "terms"), kTop = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
      .sorted.toSeq
    assert(expected.nonEmpty)
    val retrieve = graft.ext.Retrieval.qlRetriever(docs, kTop = 3)
    val mem = MemoryStream[(Long, Seq[String])]
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Int)]
    val query = mem.toDF().toDF("query_id", "terms").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = retrieve(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getInt(4)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(qRows.take(2))
      query.processAllAvailable()
      mem.addData(qRows.drop(2))
      query.processAllAvailable()
      // QL scores read only the query's own terms + frozen corpus postings
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      retrieve.close()
    }
  }

  test("streaming triplet mining via tripletMiner matches batch contrastiveTriplets") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val anchors = emb.filter(col("vec_id") < 8)
    val expected = graft.ext.Similarity.contrastiveTriplets(anchors, emb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
      .sorted.toSeq
    assert(expected.nonEmpty)

    // corpus side (vectors + norms + labels) freezes ONCE; each anchor
    // micro-batch mines its own triplets — the contrastive-training loop
    val mine = graft.ext.Similarity.tripletMiner(emb)
    val rows = anchors.select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)].collect().toSeq
    val mem = MemoryStream[(Long, Array[Float], Int)]
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Long, Double, Long)]
    val query = mem.toDF().toDF("vec_id", "embedding", "label").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = mine(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getLong(3), r.getDouble(4), r.getLong(5)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(4))
      query.processAllAvailable()
      mem.addData(rows.drop(4))
      query.processAllAvailable()
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      mine.close()
    }
  }

  test("streaming stitch flagging via stitchFlagger matches the batch rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val flag = graft.ext.Stitch.stitchFlagger(docs)
    val expected = flag(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(expected.nonEmpty, "fixture must contain stitch seams at k=3")
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val query = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = flag(batch)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData(rows.take(rows.length / 2))
      query.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2))
      query.processAllAvailable()
      // seams are against the frozen corpus only: batch union == batch run
      assert(acc.sorted.toSeq === expected)
    } finally {
      query.stop()
      flag.close()
    }
  }

  // ---- checkpoint kill-and-resume: the recovery contract ----
  // The property a production deployment leans on hardest: stop a
  // stateful query mid-stream, restart it from the SAME
  // checkpointLocation, and the resumed run must converge to exactly the
  // uninterrupted run's output. (Reference analog: the retry-then-restart
  // machinery in helper/StreamingLensRetriesHelper.scala:22-36.)

  test("funnelMonitorBuffered survives a kill-and-resume from its checkpoint") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("x161_event_funnel")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4))).sorted.toSeq
    assert(expected.nonEmpty)
    val rows = graft.Tables.events(spark, d)
      .select(col("user_id"), col("event_type"), col("ms"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._3, r._4)).toSeq
    val maxMs = rows.map(_._3).max
    val sentinelUser = rows.map(_._1).max + 1
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-funnel-ckpt").toString
    val mem = MemoryStream[(Long, String, Long, Long)]
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Option[Long], Option[Long], Boolean)]
    def startQuery() = graft.streaming.StreamingOps.funnelMonitorBuffered(
        mem.toDF().toDF("user_id", "event_type", "ms", "event_id"),
        lateness = "1 minute")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = batch.collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getBoolean(4)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    // first half, committed, then KILL: the state store now holds every
    // user's funnel triple plus the not-yet-ripe buffered events (the
    // trailing minute of the chop — nothing past the watermark)
    val q1 = startQuery()
    try {
      mem.addData(rows.take(rows.length / 2))
      q1.processAllAvailable()
    } finally q1.stop()
    // RESUME from the same checkpoint: buffered events and committed
    // triples must both come back, or the second half mis-chains
    val q2 = startQuery()
    try {
      mem.addData(rows.drop(rows.length / 2))
      q2.processAllAvailable()
      mem.addData(Seq((sentinelUser, "sentinel", maxMs + 10L * 86400000L, 0L)))
      q2.processAllAvailable()
      mem.addData(Seq((sentinelUser, "sentinel", maxMs + 20L * 86400000L, 1L)))
      q2.processAllAvailable()
    } finally q2.stop()
    // the LAST emission per user across both runs is the converged funnel
    val last = acc.zipWithIndex.groupBy(_._1._1)
      .map { case (_, g) => g.maxBy(_._2)._1 }.toSeq.sorted
    assert(last === expected,
      "resumed funnel diverged from the uninterrupted batch x161 rows")
  }

  test("cmsMonitor kill-and-resume: serialize + ingestOnce reproduce the batch sketch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val batch = graft.SparkEntry.queries("x99_cms_heavy_hitters")(spark, d)
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    assert(batch.nonEmpty)
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-cms-ckpt").toString
    val mem = MemoryStream[(Long, String)]
    // the "durable store" the driver persists the monitor to after each
    // batch — in production a file/object write, here a volatile cell
    @volatile var saved: Array[Byte] = null
    def startQuery(mon: graft.ext.TextAnalysis.CmsMonitor) =
      mem.toDF().toDF("doc_id", "text").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          mon.ingestOnce(b, id)
          saved = mon.serialize()
          ()
        }
        .outputMode("append").start()
    val mon1 = graft.ext.TextAnalysis.cmsMonitor()
    val q1 = startQuery(mon1)
    try {
      mem.addData(rows.take(rows.length / 3))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(saved != null)
    // CRASH: mon1 is gone; restore a fresh monitor from the persisted
    // bytes and resume the stream from the same checkpoint
    val mon2 = graft.ext.TextAnalysis.cmsMonitorFrom(saved)
    val q2 = startQuery(mon2)
    try {
      mem.addData(rows.slice(rows.length / 3, 2 * rows.length / 3))
      q2.processAllAvailable()
      mem.addData(rows.drop(2 * rows.length / 3))
      q2.processAllAvailable()
    } finally q2.stop()
    // counter addition is chop- AND restart-invariant: estimates match
    // the batch x99 sketch exactly
    batch.foreach { case (tok, est, slack) =>
      assert(mon2.estimate(tok) === est, s"token $tok estimate diverged")
      assert(mon2.slack === slack)
    }
    // the idempotency guard: re-delivering an already-merged batchId (the
    // at-least-once replay a restart can produce) must not double-count
    val before = mon2.estimate(batch.head._1)
    mon2.ingestOnce(rows.take(rows.length / 3).toDF("doc_id", "text"), 0L)
    assert(mon2.estimate(batch.head._1) === before,
      "replayed batchId was merged twice")
  }

  test("streamingIncrementalDedup state survives a kill-and-resume") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val corpus = Seq((100L, "frozen corpus text")).toDF("doc_id", "text")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dedup-ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def startQuery() = graft.streaming.StreamingOps
      .streamingIncrementalDedup(
        mem.toDF().toDF("doc_id", "text"), corpus, "text", "doc_id")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = batch.collect().map(r => (r.getLong(0), r.getString(1)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    val q1 = startQuery()
    try {
      mem.addData(Seq((1L, "alpha text"), (2L, "beta text")))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(acc.toSet === Set((1L, "kept"), (2L, "kept")))
    // RESUME: the seen-fingerprint state must come back from the state
    // store, or the re-arriving duplicate is wrongly re-admitted as kept
    val q2 = startQuery()
    try {
      mem.addData(Seq((3L, "alpha text"), (4L, "gamma text"),
        (5L, "frozen corpus text")))
      q2.processAllAvailable()
    } finally q2.stop()
    val after = acc.toMap
    assert(after(3L) === "dup_batch",
      "duplicate re-admitted after restart — state was lost")
    assert(after(4L) === "kept")
    assert(after(5L) === "dup_corpus")
  }

  test("near-dup flagger probe kill-and-resume emits each pair exactly once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val flag = graft.ext.Dedup.simHashFlagger(docs)
    val expected = flag(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(expected.nonEmpty, "fixture must contain simhash near-dups")
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-flag-ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    def startQuery() = mem.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = flag(batch)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try {
      val q1 = startQuery()
      try {
        mem.addData(rows.take(rows.length / 2))
        q1.processAllAvailable()
      } finally q1.stop()
      // resume: the checkpoint's committed offsets mean the first half is
      // NOT re-delivered — each probe row flags exactly once, so the
      // union across the restart equals the batch pair set with no dups
      val q2 = startQuery()
      try {
        mem.addData(rows.drop(rows.length / 2))
        q2.processAllAvailable()
      } finally q2.stop()
      assert(acc.sorted.toSeq === expected)
    } finally flag.close()
  }

  test("foreachBatch appendShards export: an engine-level batch replay lands exactly once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-exp-ckpt-d").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-exp-ckpt-c").toString
    val mem = MemoryStream[(Long, Long, String)]
    def startQuery() = mem.toDF().toDF("doc_id", "shard", "text")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        // the batchId IS the epoch: the manifest's epochs list becomes the
        // sink-side commit log, replays skip (Export.appendShards contract)
        graft.ext.Export.appendShards(b, dir, epoch = Some(id))
        ()
      }
      .outputMode("append").start()
    val first = (0 until 6).map(i => (i.toLong, (i % 2).toLong, s"doc $i"))
    val second = (6 until 10).map(i => (i.toLong, (i % 2).toLong, s"doc $i"))
    val q1 = startQuery()
    try {
      mem.addData(first)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(graft.ext.Export.committedEpochs(spark, dir) === Set(0L))
    // CRASH WINDOW: the sink committed (manifest has epoch 0) but the
    // ENGINE's commit marker for batch 0 is lost — delete commits/0, the
    // exact at-least-once state after a driver death between sink write
    // and checkpoint commit. On restart the engine MUST replay batch 0.
    val commit0 = new java.io.File(ckpt, "commits/0")
    assert(commit0.exists(), "engine commit marker missing before the test")
    assert(commit0.delete())
    // the local-FS checksum sidecar must go with it, or the engine reads
    // the hand-deleted slot as a concurrent-writer corruption
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits/.0.crc"))
    val q2 = startQuery()
    try {
      q2.processAllAvailable() // replays batch 0 -> appendShards skips
      mem.addData(second)
      q2.processAllAvailable() // batch 1 appends normally
    } finally q2.stop()
    assert(graft.ext.Export.committedEpochs(spark, dir) === Set(0L, 1L))
    // exactly-once: 10 rows, each doc_id once, deep validation green
    val counts = graft.ext.Export.validateShardsContent(spark, dir)
    assert(counts.values.sum === 10L)
    val ids = graft.ext.Export.readShards(spark, dir, Seq(0L, 1L))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === (0L until 10L).toSeq)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
  }

  test("composed WARC-ingest stream: crash between epoch move and manifest publish lands exactly once") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-wcrash-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-wcrash-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-wcrash-ck").toString
    val df = (0 until 12).map(i =>
      (f"k-$i%04d", s"https://h$i.example.com/", 200, "text/html",
        s"body $i".getBytes("UTF-8"), i % 4))
      .toDF("key", "url", "status", "mime", "payload", "shard")
      .withColumn("shard", col("shard").cast("int"))
    graft.ext.Export.writeWarcShards(df, src, compression = "gzip")
    // the x205b composition: stream the containers in 2 micro-batches
    // (4 files, maxFilesPerTrigger=2), project, land via epoch-keyed
    // appendShards. foreachBatch snapshots the post-epoch-0 manifest so
    // the test can rewind epoch 1 to its mid-commit state.
    val manifestAfter0 = new java.util.concurrent.atomic.AtomicReference[Array[Byte]]()
    def startQuery() = graft.ext.Export.readWarcStream(spark, src,
        options = Map("maxFilesPerTrigger" -> "2")).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.ext.Export.appendShards(
          b.select(col("key"), col("url"), col("payload_len"),
            expr("CAST(substring(key, 3, 4) AS INT) % 2").as("shard")),
          out, epoch = Some(id), writerId = Some("warc-ingest"))
        if (id == 0L) manifestAfter0.set(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(out, "_graft_manifest.json")))
        ()
      }
      .outputMode("append").start()
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(graft.ext.Export.committedEpochs(spark, out) === Set(0L, 1L))
    // CRASH WINDOW for epoch 1: its e1- data files moved into the live
    // shard dirs, but the writer died BEFORE the manifest publish — and
    // the engine's commit marker for batch 1 is gone too (driver death).
    // Restore the post-epoch-0 manifest over the live one and drop
    // commits/1 (+ local-FS .crc sidecars).
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "_graft_manifest.json"), manifestAfter0.get())
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(out, "._graft_manifest.json.crc"))
    val commit1 = new java.io.File(ckpt, "commits/1")
    assert(commit1.exists() && commit1.delete())
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits/.1.crc"))
    assert(graft.ext.Export.committedEpochs(spark, out) === Set(0L))
    // loader-side gate refuses the half-committed state loudly meanwhile
    intercept[IllegalArgumentException](
      graft.ext.Export.validateShards(spark, out))
    // RESUME: the engine replays batch 1; appendShards retracts the
    // stranded e1- files and rewrites the epoch exactly once
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    assert(graft.ext.Export.committedEpochs(spark, out) === Set(0L, 1L))
    val counts = graft.ext.Export.validateShardsContent(spark, out)
    assert(counts.values.sum === 12L)
    val keys = graft.ext.Export.readShards(spark, out, Seq(0L, 1L))
      .select("key").collect().map(_.getString(0)).sorted.toSeq
    assert(keys === (0 until 12).map(i => f"k-$i%04d"),
      "each WARC record must land exactly once across the crash-resume")
    Seq(src, out, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
  }

  test("readWarcStream picks up newly-landed WARC files exactly once") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-warc-src").toString
    val watch = java.nio.file.Files.createTempDirectory("graft-warc-watch").toString
    val df = (0 until 12).map(i =>
      (f"k-$i%04d", s"https://h$i.example.com/", 200, "text/html",
        s"body $i".getBytes("UTF-8"), i % 4))
      .toDF("key", "url", "status", "mime", "payload", "shard")
      .withColumn("shard", col("shard").cast("int"))
    graft.ext.Export.writeWarcShards(df, src, compression = "gzip")
    val shardFiles = new java.io.File(src).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .sortBy(_.getParentFile.getName)
    assert(shardFiles.length === 4)
    def land(fs: Array[java.io.File]): Unit = fs.foreach { f =>
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(watch,
        f.getParentFile.getName + "-" + f.getName))
    }
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = graft.ext.Export.readWarcStream(spark, watch).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val keys = b.select("key").collect().map(_.getString(0))
        acc.synchronized { acc ++= keys }
        ()
      }
      .outputMode("append").start()
    try {
      // two shard files land, then two more: the checkpointed file log
      // must deliver each file's records exactly once across triggers
      land(shardFiles.take(2))
      q.processAllAvailable()
      val afterFirst = acc.size
      assert(afterFirst > 0 && afterFirst < 12)
      land(shardFiles.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    assert(acc.sorted.toSeq === (0 until 12).map(i => f"k-$i%04d"),
      "streamed keys must be exactly the written records, no dups")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(watch))
  }
}
