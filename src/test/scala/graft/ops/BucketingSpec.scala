package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-location contract: same-bucket-count tables equi-join with
  * ZERO exchanges — the write-once/join-forever shuffle elimination for
  * repeated fact-to-fact joins. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-to-fact join plans no Exchange and matches the plain join") {
    val d = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = graft.Tables.orders(spark, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    // model the large-to-large case bucketing exists for: at 100 TB
    // neither side broadcasts, so pin the SortMergeJoin path explicitly
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(li, "graft_bspec_li", "l_orderkey", buckets = 4)
      Bucketing.writeBucketed(ord, "graft_bspec_ord", "l_orderkey", buckets = 4)
      val joined = Bucketing.bucketedJoin(spark,
        "graft_bspec_li", "graft_bspec_ord", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // row-identical to the plain (shuffled) join of the same frames
      val want = li.join(ord, "l_orderkey")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted
      val got = joined
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted
      assert(got.length === want.length)
      assert(got === want)
      // the plain join of the unbucketed frames DOES shuffle — the cost
      // the bucketed layout eliminates
      val plain = li.join(ord, "l_orderkey")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_bspec_li")
      spark.sql("DROP TABLE IF EXISTS graft_bspec_ord")
    }
  }

  test("writeBucketed rejects a missing key and bad bucket counts") {
    val d = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, d).select(col("l_orderkey"))
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(li, "graft_bspec_bad", "nope", 4)
    }
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(li, "graft_bspec_bad", "l_orderkey", 0)
    }
  }
}
