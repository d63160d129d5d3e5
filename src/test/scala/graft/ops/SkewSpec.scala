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

  test("salting actually spreads the hot key across buckets") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val partials = Skew.saltedSumCount(df, "k", "v", buckets = 8)
    // indirect check: partial stage produced >1 group for the hot key
    val nSalts = df
      .withColumn("_salt", pmod(xxhash64(col("k"), col("v")), lit(8L)))
      .select("_salt").distinct().count()
    assert(nSalts > 1)
    assert(partials.count() === 1) // but the final result is still one row
  }
}
