package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation equals the direct aggregation on a skewed key") {
    import spark.implicits._
    // 10k rows on one hot key + a handful on others
    val rows = (1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 7).map(i => (s"cold$i", i.toLong))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum($"v").as("sum"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === direct)

    val directMm = df.groupBy("k").agg(min($"v").as("min"), max($"v").as("max"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val saltedMm = Skew.saltedMinMax(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(saltedMm === directMm)
  }

  test("salted join is row-identical to the plain equi-join, duplicates included") {
    import spark.implicits._
    val big = ((1 to 500).map(_ => ("hot", "payload")) ++
      Seq(("a", "p1"), ("a", "p1"), ("b", "p2"), ("orphan", "px"))).toDF("k", "v")
    val small = Seq(("hot", 1L), ("a", 2L), ("b", 3L), ("unmatched", 9L)).toDF("k", "w")
    val plain = big.join(small, Seq("k"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    assert(salted.length === plain.length) // multiplicity preserved (502 rows)
    assert(salted === plain)
  }

  test("salting spreads even byte-identical hot rows across buckets") {
    import spark.implicits._
    // identical rows are the classic hot-key shape; a content-hash salt
    // would put all of them in ONE bucket
    val df = (1 to 1000).map(_ => ("hot", 5L)).toDF("k", "v").repartition(4)
    val nSalts = df
      .withColumn("s", pmod(monotonically_increasing_id(), lit(8L)))
      .select("s").distinct().count()
    assert(nSalts > 1, "identical rows landed in one salt bucket")
    val result = Skew.saltedSumCount(df, "k", "v", buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(result.toSeq === Seq(("hot", 5000L, 1000L)))
    intercept[IllegalArgumentException] {
      Skew.saltedSumCount(df, "k", "v", buckets = 0).collect()
    }
  }

  test("autoSaltedJoin: plain plan on uniform keys, salted plan on the skewed fixture") {
    import spark.implicits._
    // uniform keys: the profile flags nothing → plain equi-join, no salt
    // column (and no ×buckets replication) anywhere in the plan
    val uniBig = (1 to 64).flatMap(i => Seq((s"k$i", "p1"), (s"k$i", "p2"))).toDF("k", "v")
    val uniSmall = (1 to 64).map(i => (s"k$i", i.toLong)).toDF("k", "w")
    val uni = Skew.autoSaltedJoin(uniBig, uniSmall, "k", buckets = 8, parallelism = 4)
    assert(!uni.queryExecution.analyzed.toString.contains("__graft_salt"),
      "uniform keys must take the plain-join plan")
    assert(uni.count() === 128L)
    // skewed fixture: the hot key is flagged → salted plan, row-identical
    // to the plain join (duplicates and the hot fan-out included)
    val big = ((1 to 500).map(_ => ("hot", "payload")) ++
      Seq(("a", "p1"), ("a", "p1"), ("b", "p2"), ("orphan", "px"))).toDF("k", "v")
    val small = Seq(("hot", 1L), ("a", 2L), ("b", 3L), ("unmatched", 9L)).toDF("k", "w")
    val auto = Skew.autoSaltedJoin(big, small, "k", buckets = 8, parallelism = 4)
    assert(auto.queryExecution.analyzed.toString.contains("__graft_salt"),
      "a flagged hot key must take the salted plan")
    val plain = big.join(small, Seq("k"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    val got = auto
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    assert(got.length === plain.length)
    assert(got === plain)
  }

  test("skewProfile flags keys over the fair slice and only those") {
    import spark.implicits._
    // 64 rows for "hot" (50% share), 32 for "warm" (25%), 1 each for 32
    // cold keys (~0.78%) — at parallelism 4 the fair slice is 25%, so hot
    // is flagged, warm sits exactly AT the threshold (not over -> false),
    // cold keys are far under
    val rows = Seq.fill(64)("hot") ++ Seq.fill(32)("warm") ++
      (0 until 32).map(i => s"cold$i")
    val profile = Skew.skewProfile(rows.toDF("k"), "k",
        kTop = 3, parallelism = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(profile.length === 3)
    assert(profile(0) === (("hot", 64L, 500000L, true)))
    assert(profile(1) === (("warm", 32L, 250000L, false)))
    assert(profile(2)._4 === false)
  }
}
