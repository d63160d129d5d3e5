package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-data export sink: the END of the curation pipeline (x73's
  * output feeds this) written in the layout a dataloader consumes.
  *
  * Contract:
  *   - the frame is written `partitionBy(shardCol)` — each shard is its own
  *     directory, so a loader (or a backfill re-run) reads exactly the
  *     shards it owns and the scan prunes to them (PartitionFilters, the
  *     same IO shape the IVF index test pins);
  *   - one `_graft_manifest.json` at the root records per-shard row counts
  *     and the total — the loader's single small read to plan an epoch, and
  *     the writer's own completeness check (counts are recomputed from the
  *     WRITTEN files, not the input plan, so a lost task or partial write
  *     cannot produce a silently short manifest).
  *
  * At 100 TB: the write is one shuffle-free pass when the frame is already
  * hash-distributed by shard (x52's md5 sharding); the manifest scan reads
  * only the shard column's partition directories (column-pruned, file
  * footers only). */
object Export {

  /** Write `df` partitioned by `shardCol` under `dir` and return the
    * per-shard row counts that were also persisted to the manifest. */
  def writeShards(df: DataFrame, dir: String,
                  shardCol: String = "shard"): Map[Long, Long] = {
    require(df.columns.contains(shardCol),
      s"writeShards needs a '$shardCol' column; got ${df.columns.mkString(",")}")
    df.write.mode(SaveMode.Overwrite).partitionBy(shardCol).parquet(dir)
    // partition-directory values read back type-INFERRED (small ids become
    // ints) — normalize to long before collecting
    val counts = df.sparkSession.read.parquet(dir)
      .groupBy(col(shardCol).cast("long").as(shardCol))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val manifest = counts.toSeq.sorted
      .map { case (s, n) => s""""$s": $n""" }
      .mkString("{\"shards\": {", ", ", s"}, \"total\": ${counts.values.sum}}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_graft_manifest.json"),
      (manifest + "\n").getBytes("UTF-8"))
    counts
  }

  /** Parse a [[writeShards]] manifest back into per-shard counts — the
    * loader's one small read to plan an epoch (no file listing, no scan). */
  def readManifest(dir: String): Map[Long, Long] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_graft_manifest.json")), "UTF-8")
    "\"(\\d+)\": (\\d+)".r.findAllMatchIn(text)
      .map(m => m.group(1).toLong -> m.group(2).toLong).toMap
  }

  /** Read only the named shards — the filter is on the partition column,
    * so the scan prunes to those directories (a loader rank reads exactly
    * the shards it owns). */
  def readShards(spark: org.apache.spark.sql.SparkSession, dir: String,
                 shards: Seq[Long], shardCol: String = "shard"): DataFrame =
    spark.read.parquet(dir)
      .filter(col(shardCol).isin(shards: _*))
}
