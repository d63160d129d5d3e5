package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A hot grouping key routes all its rows to one reduce task; salting
  * splits each key into `buckets` sub-keys aggregated in parallel, then a
  * second (tiny — one row per (key, salt)) aggregation combines the
  * partials. Only algebraic aggregates decompose this way; the helpers
  * below cover the sums/counts/min/max the engine uses. AQE's skew-join
  * handling covers joins; this covers aggregations.
  */
object Skew {

  /** Deterministic row-spreading salt: a hash of the whole row modulo
    * `buckets` (any row-dependent value works — the point is only that one
    * key's rows spread across reducers). */
  private def salt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(buckets.toLong)).cast("int")

  /** sum(valueCol) + count per key, computed skew-safely. Identical result
    * to a direct groupBy — associativity makes the two-phase split exact. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     buckets: Int = 16): DataFrame =
    df
      .withColumn("_salt", salt(df, buckets))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pcnt")).as("n"))

  /** Skew-safe equi-join: the hot (big) side gets a row-spreading salt, the
    * small side is replicated across all `buckets` salt values, and the
    * join keys on (key, salt) — so a hot key's rows split across `buckets`
    * reduce tasks instead of landing on one straggler. Row-identical to the
    * plain equi-join (each big row matches exactly the replica carrying its
    * salt); the cost is a `buckets`× blowup of the SMALL side only. AQE's
    * runtime skew split covers moderate cases; this is the explicit form
    * for pipelines that pre-partition or run with AQE off. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    val salted = big.withColumn("_salt", salt(big, buckets))
    val replicated = small
      .withColumn("_salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** min/max per key, skew-safely. */
  def saltedMinMax(df: DataFrame, keyCol: String, valueCol: String,
                   buckets: Int = 16): DataFrame =
    df
      .withColumn("_salt", salt(df, buckets))
      .groupBy(col(keyCol), col("_salt"))
      .agg(min(col(valueCol)).as("_pmin"), max(col(valueCol)).as("_pmax"))
      .groupBy(col(keyCol))
      .agg(min(col("_pmin")).as("min"), max(col("_pmax")).as("max"))
}
