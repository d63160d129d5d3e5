package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §A).
  *
  * All reads go through parquet so Catalyst pushes filters/column pruning
  * into the scan. At 100 TB these would be partitioned/bucketed external
  * tables; the loader seam is where that substitution happens.
  */
object Tables {
  private def read(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame    = read(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = read(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = read(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = read(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = read(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; the session must set `spark.sql.legacy.parquet.nanosAsLong=true`
    * at construction (Verify/Bench/SparkSpec all do) so it arrives as Long
    * nanos. `ms` (epoch millis) matches DuckDB's `epoch_ms(ts)` on the same
    * file; `div` truncates toward zero, which equals floor for the post-epoch
    * timestamps this dataset guarantees (pre-1970 nanos would diverge).
    */
  def events(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "events").withColumn("ms", expr("ts div 1000000"))
}
