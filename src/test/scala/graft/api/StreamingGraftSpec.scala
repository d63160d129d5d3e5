package graft.api

import graft.SparkSpec
import graft.config.GraftConfig
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Reflection-loaded by the reporter SPI in the aggregate-report test. */
object CapturingReporter {
  val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
class CapturingReporter extends graft.report.EventsReporter {
  override def init(options: Map[String, String], queryId: String): Unit = ()
  override def sendEvent(json: String): Unit = CapturingReporter.events.add(json)
}

/** End-to-end: a real Structured Streaming query on a real SparkSession with
  * the facade attached; the live listeners must capture telemetry and
  * analyzeNow() must classify the batches. */
class StreamingGraftSpec extends SparkSpec {

  test("config parses reference-keyed options case-insensitively and validates") {
    val c = GraftConfig(Map(
      "streamingLens.analysisIntervalMinutes" -> "2",
      "STREAMINGLENS.EXPECTEDMICROBATCHSLAMILLIS" -> "9000",
      "streamingLens.reporter.discountFactor" -> "0.9"))
    assert(c.analysisIntervalMinutes === 2)
    assert(c.expectedMicroBatchSLAMillis === 9000L)
    assert(c.discountFactor === 0.9)
    intercept[IllegalArgumentException] {
      GraftConfig(Map("streamingLens.criticalPathLowerThreshold" -> "1.5"))
    }
    intercept[IllegalArgumentException] {
      GraftConfig(Map("streamingLens.maxRetries" -> "notanumber"))
    }
  }

  test("live listeners capture a real streaming query; analyzeNow classifies it") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val graft = new StreamingGraft(spark, Map(
      "streamingLens.expectedMicroBatchSLAMillis" -> "600000",
      "streamingLens.shouldLogResults" -> "false"))
    try {
      val mem = MemoryStream[Int]
      val query = mem.toDS().map(_ * 2)
        .writeStream.format("memory").queryName("graft_e2e")
        .outputMode("append").start()
      try {
        mem.addData(1 to 1000: _*)
        query.processAllAvailable()
        mem.addData(1001 to 2000: _*)
        query.processAllAvailable()
      } finally query.stop()
      // listener bus is async; poll until the jobEnd events flush
      var results = graft.analyzeNow().collect()
      var tries = 0
      while (results.isEmpty && tries < 20) {
        Thread.sleep(500); tries += 1
        results = graft.analyzeNow().collect()
      }
      assert(results.nonEmpty, "no batches analyzed - listeners captured nothing")
      assert(results.forall(_.queryId.nonEmpty))
      assert(results.forall(r =>
        graft.config.expectedMicroBatchSLAMillis == r.expectedMicroBatchSLA))
      // tiny local batches => far under a 10-minute SLA
      assert(results.forall(r =>
        r.streamingQueryState == "OVERPROVISIONED" ||
          r.streamingQueryState == "NONEWBATCHES"))
    } finally graft.stop()
  }

  test("updateExpectedMicroBatchSLA rejects non-positive values") {
    val graft = StreamingGraft.getOrCreate(spark)
    try {
      intercept[IllegalArgumentException] {
        graft.updateExpectedMicroBatchSLA("q", 0L)
      }
      graft.updateExpectedMicroBatchSLA("q", 5000L) // accepted
    } finally StreamingGraft.reset(spark)
  }

  test("analyzeIfDue throttles by the configured interval") {
    val graft = new StreamingGraft(spark, Map(
      "streamingLens.shouldLogResults" -> "false",
      "streamingLens.analysisIntervalMinutes" -> "5"))
    try {
      val t0 = 10L * 60000L
      assert(graft.analyzeIfDue(t0).isDefined)        // first call runs
      assert(graft.analyzeIfDue(t0 + 60000L).isEmpty) // 1 min later: throttled
      assert(graft.analyzeIfDue(t0 + 5 * 60000L).isDefined) // interval elapsed
    } finally graft.stop()
  }

  test("periodic aggregate report: discounted state through the reporter SPI; bounded results buffer") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    CapturingReporter.events.clear()
    val g = new StreamingGraft(spark, Map(
      "streamingLens.shouldLogResults" -> "false",
      "streamingLens.expectedMicroBatchSLAMillis" -> "600000",
      "streamingLens.maxResultsRetention" -> "4",
      "streamingLens.reporter.intervalMinutes" -> "60",
      "streamingLens.reporter.className" -> classOf[CapturingReporter].getName))
    try {
      val mem = MemoryStream[Int]
      val query = mem.toDS().map(_ + 1)
        .writeStream.format("memory").queryName("graft_agg_report")
        .outputMode("append").start()
      try {
        mem.addData(1 to 500: _*)
        query.processAllAvailable()
        mem.addData(501 to 1000: _*)
        query.processAllAvailable()
      } finally query.stop()
      var results = g.analyzeNow().collect()
      var tries = 0
      while (results.isEmpty && tries < 20) {
        Thread.sleep(500); tries += 1
        results = g.analyzeNow().collect()
      }
      assert(results.nonEmpty, "no batches analyzed")
      // repeated analyses re-buffer the same batches: the ring must cap AND
      // hold at most one row per (queryId, batchId) so the discounted report
      // never double-weights a batch
      g.analyzeNow(); g.analyzeNow()
      assert(g.recentResults.size <= 4, s"buffer ${g.recentResults.size} > cap")
      val keys = g.recentResults.map(r => (r.queryId, r.batchId))
      assert(keys.distinct.size === keys.size, s"duplicate batches in buffer: $keys")
      // first report is due, runs, and carries a recommendation per query
      val t0 = 100L * 60000L
      val agg = g.reportIfDue(t0)
      assert(agg.isDefined)
      val rows = agg.get.collect()
      assert(rows.nonEmpty, "aggregate report empty despite analyzed batches")
      assert(rows.forall(_.recommendation.nonEmpty))
      assert(rows.forall(r => r.score > 0))
      // the reporter SPI received the aggregate events (per-batch events from
      // analyzeNow also flow through it; aggregates are tagged)
      val sent = CapturingReporter.events.toArray(Array.empty[String])
      assert(sent.exists(_.contains("-aggregate")), s"no aggregate event in ${sent.length} sent")
      // within the interval: throttled; batches already reported stay reported
      assert(g.reportIfDue(t0 + 60000L).isEmpty)
      val again = g.reportIfDue(t0 + 61L * 60000L)
      assert(again.isDefined)
      assert(again.get.collect().isEmpty, "re-reported batches already covered")
    } finally g.stop()
  }

  test("a timed-out analysis returns the ERROR row AND its Spark jobs are cancelled") {
    import org.apache.spark.sql.Dataset
    import graft.model.CriticalPathResult
    // a plan whose job runs ~100 s if left alone: 8 tasks x 15 s sleep —
    // if cancellation works, the executors free within a few seconds of
    // the 1 s timeout instead of holding 8 cores for the full duration
    val slowDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val g = new StreamingGraft(spark, Map(
      "streamingLens.maxAnalysisTimeSeconds" -> "1",
      "streamingLens.shouldLogResults" -> "false")) {
      override protected def runGuardedAnalysis(): Dataset[CriticalPathResult] = {
        import spark.implicits._
        spark.range(0, 8, 1, 8).mapPartitions { it =>
          Thread.sleep(15000); it
        }.count()
        slowDone.set(true)
        spark.createDataset(Seq.empty[CriticalPathResult])
      }
    }
    try {
      val t0 = System.nanoTime()
      val out = g.analyzeGuarded().collect()
      val guardedSecs = (System.nanoTime() - t0) / 1e9
      assert(out.length === 1 && out(0).streamingQueryState === "ERROR",
        s"expected the single ERROR row, got ${out.toSeq}")
      // generous bound: the guard returns ~1s after its timeout, but a
      // loaded machine can delay the Await wake-up — what matters is that
      // it returns in a small fraction of the 100s the plan would run
      assert(guardedSecs < 30, s"guard blocked ${guardedSecs}s past its 1s timeout")
      // the abandoned job must actually die: poll the status tracker until
      // no active jobs remain — well before the 15 s a surviving task
      // would need (interruptOnCancel breaks the sleep immediately)
      val tracker = spark.sparkContext.statusTracker
      var waitedMs = 0
      while (tracker.getActiveJobIds().nonEmpty && waitedMs < 12000) {
        Thread.sleep(200); waitedMs += 200
      }
      assert(tracker.getActiveJobIds().isEmpty,
        s"analysis jobs still running ${waitedMs}ms after cancellation")
      assert(!slowDone.get, "slow analysis ran to completion despite cancellation")
    } finally g.stop()
  }

  test("full loop: live query + analysis ticker accumulating classified results") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val g = new StreamingGraft(spark, Map(
      "streamingLens.shouldLogResults" -> "false",
      "streamingLens.expectedMicroBatchSLAMillis" -> "600000"))
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ticker = _root_.graft.streaming.StreamingOps.analysisTicker(spark, 1) { () =>
      g.analyzeGuarded().collect().foreach(r =>
        collected.add(s"${r.batchId}:${r.streamingQueryState}"))
    }
    try {
      val mem = MemoryStream[Int]
      val q = mem.toDS().map(_ * 2).writeStream.format("memory")
        .queryName("full_loop").outputMode("append").start()
      try {
        mem.addData(1 to 2000: _*)
        q.processAllAvailable()
        var waited = 0
        while (collected.isEmpty && waited < 30000) { Thread.sleep(500); waited += 500 }
      } finally q.stop()
      assert(!collected.isEmpty, "ticker never produced an analysis result")
      assert(collected.iterator().next().endsWith("OVERPROVISIONED"))
    } finally {
      ticker.stop()
      g.stop()
    }
  }
}
