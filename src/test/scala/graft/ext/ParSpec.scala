package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Focused pins for the r20 scan fan-out (Par.fanOutScan): it must fire
  * only on all-file-relation plans, size the fan to the input bytes
  * within [4, shuffle parallelism], and leave local/in-memory frames —
  * where the exchange is pure overhead — untouched. */
class ParSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("fans a small file scan out to the 4-task floor, round-robin") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fanned = Par.fanOutScan(docs)
    val plan = fanned.queryExecution.executedPlan.toString()
    assert(plan.contains("RoundRobinPartitioning"),
      s"expected a round-robin exchange on a single-split scan:\n$plan")
    assert(fanned.rdd.getNumPartitions == 4,
      s"tiny input must fan to the 4-task floor, got " +
        s"${fanned.rdd.getNumPartitions}")
  }

  test("no-op on local (non-file) frames") {
    import spark.implicits._
    val local = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Par.fanOutScan(local) eq local,
      "a LocalRelation-backed frame must pass through untouched")
  }

  test("results are unchanged by the fan-out (order-insensitive consumers)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val direct = docs.groupBy(col("lang")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val fanned = Par.fanOutScan(docs).groupBy(col("lang")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(direct == fanned)
  }

  test("fan width is clamped to the session's shuffle parallelism") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = Par.fanOutScan(docs).rdd.getNumPartitions
    val target = spark.sessionState.conf.numShufflePartitions
    assert(n >= 4 && n <= math.max(4, target),
      s"fan width $n outside [4, max(4, $target)]")
  }
}
