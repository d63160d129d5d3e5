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
}
