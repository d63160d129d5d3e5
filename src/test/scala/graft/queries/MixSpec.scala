package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._

class MixSpec extends SparkSpec {

  test("x44 token-budget mix equals the brute-force greedy fill per source") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("x44_token_budget_mix")(spark, d)
      .collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"),
        md5(col("text")).as("ok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).flatMap { r =>
        val keep = cum < 64L
        cum += r._3
        if (keep) Some(r._1) else None
      }
    }.toSet
    assert(got === expect)
    // greedy fill always takes the first doc of every source
    val sources = docs.map(_._2).distinct
    val firstPerSource = sources.map(s =>
      docs.filter(_._2 == s).minBy(r => (r._4, r._1))._1).toSet
    assert(firstPerSource.subsetOf(got))
  }
}
