package graft

import org.apache.spark.sql.functions._

/** Loader robustness: the driver has regenerated `events.parquet` with
  * different physical timestamp encodings across rounds (TIMESTAMP(NANOS)
  * read as Long under the legacy flag, then TIMESTAMP(MICROS) read as
  * TimestampNTZ) — round 10 lost all 22 events queries to that drift.
  * Tables.events derives `ms` schema-adaptively; this spec pins every
  * encoding to the same epoch-millis answer so the next regeneration
  * cannot silently break the catalog. */
class TablesSpec extends SparkSpec {

  private val epochMs = 1700000000123L // 2023-11-14T22:13:20.123Z

  test("events.ms is correct for Long-nanos, Timestamp, and TimestampNTZ ts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-events-enc").toString
    try {
      // long nanos (what nanosAsLong=true yields for TIMESTAMP(NANOS))
      Seq((1L, epochMs * 1000000L))
        .toDF("event_id", "ts")
        .write.mode("overwrite").parquet(s"$dir/long/events.parquet")
      // timestamp (µs, UTC-adjusted)
      Seq((1L, new java.sql.Timestamp(epochMs)))
        .toDF("event_id", "ts")
        .write.mode("overwrite").parquet(s"$dir/tsz/events.parquet")
      // timestamp_ntz (µs wall-clock — what a pandas/pyarrow writer emits);
      // session tz is UTC, so the same wall-clock means the same instant
      Seq((1L, new java.sql.Timestamp(epochMs)))
        .toDF("event_id", "ts")
        .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"))
        .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
      for (enc <- Seq("long", "tsz", "ntz")) {
        val got = Tables.events(spark, s"$dir/$enc")
          .select("ms").collect().map(_.getLong(0)).toSeq
        assert(got === Seq(epochMs), s"encoding $enc: got $got")
      }
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
