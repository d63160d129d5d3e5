package graft.report

import graft.SparkSpec
import graft.model.CriticalPathResult
import org.apache.spark.sql.functions._

class ReportingSpec extends SparkSpec {

  private def res(b: Long, state: String, ord: Int): CriticalPathResult =
    CriticalPathResult("q", b, 1000, 500, 400, state, ord)

  test("discounted-history: closed form over known states") {
    import spark.implicits._
    // batches 1..3 with ordinals 1, 2, 4 (newest = batch 3, ordinal 4)
    val results = Seq(
      res(1, "OVERPROVISIONED", 1),
      res(2, "OPTIMUM", 2),
      res(3, "UNHEALTHY", 4)).toDS()
    val d = 0.95
    val expected = (4 * 1.0 + 2 * d + 1 * d * d) / (1.0 + d + d * d)
    val got = Reporting.discountedScore(results, d).head().getDouble(1)
    assert(math.abs(got - expected) < 1e-9)
  }

  test("NONEWBATCHES batches and already-reported batches are excluded") {
    import spark.implicits._
    val results = Seq(
      res(1, "UNHEALTHY", 4),        // excluded: batchId <= lastReported
      res(2, "NONEWBATCHES", 0),     // excluded: ordinal 0
      res(3, "OPTIMUM", 2)).toDS()
    val got = Reporting.discountedScore(results, 0.95, lastReportedBatch = 1L)
      .head()
    assert(got.getDouble(1) === 2.0)
    assert(got.getLong(2) === 1L)
  }

  test("aggregate state + source-specific recommendation") {
    import spark.implicits._
    val results = Seq(res(1, "UNDERPROVISIONED", 3), res(2, "UNDERPROVISIONED", 3)).toDS()
    val sources = Seq(("q", "KafkaV2[Subscribe[topic]]")).toDF("queryId", "sourcesDesc")
    val agg = Reporting.aggregate(results, sources).head()
    assert(agg.score === 3.0)
    assert(agg.state === "UNDERPROVISIONED")
    assert(agg.recommendation.contains("Kafka"))
  }

  test("pd renders the reference duration format") {
    import spark.implicits._
    val got = Seq(2094L, 13L, 61007L, 120000L).toDF("ms")
      .select(Reporting.pd(col("ms"))).collect().map(_.getString(0)).toSeq
    assert(got === Seq("02s 094ms", "00s 013ms", "61s 007ms", "120s 000ms"))
  }

  test("renderJson emits one compact event per result") {
    import spark.implicits._
    val js = Reporting.renderJson(Seq(res(7, "OPTIMUM", 2)).toDS(), "myquery",
      "run-1", lit(123L)).head().getString(0)
    assert(js.contains("\"eventId\":\"q-7\""))
    assert(js.contains("\"state\":\"OPTIMUM\""))
    assert(js.contains("\"eventTimeMillis\":123"))
    assert(js.contains("00s 500ms"))
  }

  test("logBlock formats the reference driver-log shape") {
    val block = Reporting.logBlock(res(7, "OPTIMUM", 2))
    assert(block.contains("batch 7"))
    assert(block.contains("00s 500ms"))
    assert(block.contains("OPTIMUM"))
  }
}
