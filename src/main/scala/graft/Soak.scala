package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-soak data generator: replicate an sf directory `factor`× into a
  * new directory so the heaviest catalog entries can be timed at ~10× the
  * largest fixture — the superlinearity alarm that converts the 100 TB
  * design arguments into a measured trend (`Bench` runs unchanged against
  * the output via SPARK_GRAFT_SF_DIR).
  *
  * Replication must multiply the DATA without multiplying the per-row
  * STRUCTURE, or quadratic outputs (every doc near-dup with its 9 copies)
  * masquerade as algorithmic superlinearity:
  *
  *  - every key column shifts by `replica × KeyBase`, preserving
  *    referential integrity inside each replica and making replicas
  *    disjoint key universes;
  *  - document tokens get a per-replica suffix (an injective token map),
  *    so each replica's shingle/vocab/dup structure mirrors the original
  *    exactly while replicas share NO shingles — pair counts scale
  *    linearly by construction;
  *  - embeddings apply a per-replica coordinate permutation + sign-flip
  *    pattern (norm-preserving, so intra-replica cosine structure is
  *    EXACTLY the original's), decorrelating cross-replica vectors that
  *    would otherwise all be mutual near-duplicates;
  *  - dimension tables (region, nation) copy once — their keys are
  *    referenced unshifted.
  *
  * Usage: runMain graft.Soak <srcSfDir> <dstDir> [factor=10]
  */
object Soak {

  /** Key offset between replicas — far above any sf0.1 key. */
  val KeyBase = 100000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Soak <srcSfDir> <dstDir> [factor]")
    val (src, dst) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1 && factor <= 1000, s"factor out of range: $factor")
    val spark = SparkSession.builder()
      .appName("graft-soak").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try replicate(spark, src, dst, factor)
    finally spark.stop()
  }

  def replicate(spark: SparkSession, src: String, dst: String,
                factor: Int): Unit = {
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[soak] wrote $t")
    }
    def shift(c: String, i: Int): Column = col(c) + lit(i * KeyBase)

    // dimension tables: copy once, keys referenced unshifted
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    def rep(t: String)(f: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = rd(t)
      (0 until factor).map(i => f(base, i)).reduce(_ unionAll _)
    }

    wr(rep("customer")((d, i) =>
      d.withColumn("c_custkey", shift("c_custkey", i))), "customer")
    wr(rep("supplier")((d, i) =>
      d.withColumn("s_suppkey", shift("s_suppkey", i))), "supplier")
    wr(rep("part")((d, i) =>
      d.withColumn("p_partkey", shift("p_partkey", i))), "part")
    wr(rep("orders")((d, i) => d
      .withColumn("o_orderkey", shift("o_orderkey", i))
      .withColumn("o_custkey", shift("o_custkey", i))), "orders")
    wr(rep("lineitem")((d, i) => d
      .withColumn("l_orderkey", shift("l_orderkey", i))
      .withColumn("l_partkey", shift("l_partkey", i))
      .withColumn("l_suppkey", shift("l_suppkey", i))), "lineitem")
    wr(rep("events")((d, i) => d
      .withColumn("event_id", shift("event_id", i))
      .withColumn("user_id", shift("user_id", i))), "events")

    // documents: replica 0 verbatim; others suffix every token with _<i>
    // (injective per-token map — intra-replica structure mirrors the
    // original exactly, replicas share no tokens/shingles)
    wr(rep("documents") { (d, i) =>
      val dd = d.withColumn("doc_id", shift("doc_id", i))
      if (i == 0) dd
      else dd.withColumn("text",
        when(length(trim(col("text"))) === 0, col("text"))
          .otherwise(array_join(
            transform(split(trim(col("text")), "\\s+"),
              t => concat(t, lit(s"_$i"))), " ")))
    }, "documents")

    // embeddings: per-replica rotation by coordinate permutation + sign
    // flips — norm-preserving (intra-replica cosines exact), and generic
    // cross-replica cosines land near zero instead of 1.0
    val dim = rd("embeddings").select(size(col("embedding"))).head().getInt(0)
    wr(rep("embeddings") { (d, i) =>
      val dd = d.withColumn("vec_id", shift("vec_id", i))
      if (i == 0) dd
      else {
        val rnd = new scala.util.Random(1000 + i)
        val perm = rnd.shuffle((0 until dim).toList)
        val sign = IndexedSeq.fill(dim)(if (rnd.nextBoolean()) 1f else -1f)
        val rotated = array(perm.zipWithIndex.map { case (p, j) =>
          col("embedding").getItem(p) * lit(sign(j))
        }: _*)
        dd.withColumn("embedding", rotated)
      }
    }, "embeddings")
  }
}
