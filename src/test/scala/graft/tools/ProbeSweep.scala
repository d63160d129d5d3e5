package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Ivf, Similarity}

/** Ad-hoc tuning sweep (Test scope, not shipped): recall of the IVF
  * cross-retrieval path vs the exact baseline across nProbe values.
  * Run: sbt 'Test/runMain graft.tools.ProbeSweep /root/testdata/sf0.01' */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter(col("vec_id") % 10 === 0)
    val c = emb.filter(col("vec_id") % 10 =!= 0)
    val exact = Similarity.crossTopK(q, c, kTop = 3, minCos = 0.2)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = c.count()
    val k = Ivf.adaptiveClusters(n)
    println(s"corpus=$n k=$k exact=${exact.size}")
    for ((na, np) <- Seq((2, 4), (3, 3), (3, 4), (3, 5), (3, 6), (4, 4), (4, 5), (4, 6), (5, 5), (5, 6))) {
      if (np <= k && na <= k) {
        val appr = Ivf.ivfCrossTopK(q, c, kTop = 3, minCos = 0.2, nProbe = np, nAssign = na)
          .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = (exact & appr).size.toDouble / exact.size
        println(f"na=$na np=$np%3d probeFrac=${np.toDouble / k}%.2f recall=$rec%.3f")
      }
    }
    spark.stop()
  }
}
