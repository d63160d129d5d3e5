package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Dedup

/** Ad-hoc tuning sweep (Test scope, not shipped): MinHash Jaccard-estimate
  * error vs the exact pair set, for pinning the x72 gate thresholds.
  * Run: sbt 'Test/runMain graft.tools.MinhashCalib /root/testdata/sf0.01' */
object MinhashCalib {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.6, maxDf = Int.MaxValue)
    for (k <- Seq(32, 64, 128)) {
      val sigs = Dedup.hashedShingles(docs, "text", "doc_id", 3)
        .filter(col("n_sh") > 0)
        .select(col("doc_id"),
          org.apache.spark.sql.graft.VectorFunctions
            .minHashBandsF(col("shs"), k, k).as("sig"))
      val est = pairs
        .join(sigs.select(col("doc_id").as("ia"), col("sig").as("siga")), "ia")
        .join(sigs.select(col("doc_id").as("ib"), col("sig").as("sigb")), "ib")
        .select(col("jacc"),
          (expr("aggregate(zip_with(siga, sigb, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
            .cast("double") / k).as("est"))
        .select(abs(col("est") - col("jacc")).as("ae"))
      val r = est.agg(count(lit(1)), avg(col("ae")), max(col("ae"))).collect()(0)
      println(f"k=$k%4d n=${r.getLong(0)} mae=${r.getDouble(1)}%.4f max_ae=${r.getDouble(2)}%.4f")
    }
    spark.stop()
  }
}
