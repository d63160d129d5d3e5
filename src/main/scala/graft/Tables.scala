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

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (read as Long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which Verify/Bench/SparkSpec
    * still set for compatibility) and as TIMESTAMP(MICROS) (read as
    * TimestampNTZ or Timestamp depending on isAdjustedToUTC). The derived
    * `ms` column (epoch millis) is schema-driven so every downstream query is
    * insulated from the file's physical timestamp encoding, and matches
    * DuckDB's `epoch_ms(ts)` on the same file: sessions run with
    * `spark.sql.session.timeZone=UTC`, so casting an NTZ wall-clock to
    * timestamp yields the same UTC instant DuckDB assumes for naive
    * timestamps. `div` truncates toward zero, which equals floor for the
    * post-epoch timestamps this dataset guarantees.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = read(s, dir, "events")
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    val ms = df.schema("ts").dataType match {
      case LongType         => expr("ts div 1000000")                 // legacy nanos-as-long
      case TimestampType    => expr("unix_micros(ts) div 1000")
      case TimestampNTZType => expr("unix_micros(cast(ts as timestamp)) div 1000")
      case other => throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
    df.withColumn("ms", ms)
  }
}
