package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, ByteType}

/** Training-data export sink: the END of the curation pipeline (x73's
  * output feeds this) written in the layout a dataloader consumes.
  *
  * Contract:
  *   - the frame is written `partitionBy(shardCol)` — each shard is its own
  *     directory, so a loader (or a backfill re-run) reads exactly the
  *     shards it owns and the scan prunes to them (PartitionFilters, the
  *     same IO shape the IVF index test pins);
  *   - one `_graft_manifest.json` at the root records per-shard row counts,
  *     byte sizes, and file counts, plus the total — the loader's single
  *     small read to plan an epoch, and the writer's own completeness check
  *     (counts are recomputed from the WRITTEN files, not the input plan, so
  *     a lost task or partial write cannot produce a silently short
  *     manifest). Bytes + file counts come from the same FS listing the
  *     writer already does, and let [[validateShards]] catch a truncated or
  *     corrupt shard FILE that row counts alone cannot see.
  *
  * All manifest IO goes through `org.apache.hadoop.fs.FileSystem`, resolved
  * from the directory URI — the sink works identically on local paths,
  * HDFS, and S3A, matching the parquet writer beside it.
  *
  * At 100 TB: the write is one shuffle-free pass when the frame is already
  * hash-distributed by shard (x52's md5 sharding); the manifest scan reads
  * only the shard column's partition directories (column-pruned, file
  * footers only). */
object Export {

  private val ManifestName = "_graft_manifest.json"

  /** The Hadoop FileSystem owning `dir` (local, hdfs://, s3a://, ...). */
  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val path = new Path(dir)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  /** Whether the written export contains any `shard=` partition directory
    * (one Hadoop FS listing of the root — no file scan). */
  private def hasPartitionDirs(spark: SparkSession, dir: String,
                               shardCol: String): Boolean = {
    val (hfs, root) = fs(spark, dir)
    hfs.listStatus(root).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(s"$shardCol="))
  }

  /** Write `df` partitioned by `shardCol` under `dir` and return the
    * per-shard row counts that were also persisted to the manifest. */
  def writeShards(df: DataFrame, dir: String,
                  shardCol: String = "shard"): Map[Long, Long] = {
    require(df.columns.contains(shardCol),
      s"writeShards needs a '$shardCol' column; got ${df.columns.mkString(",")}")
    val field = df.schema(shardCol)
    require(
      Seq(ByteType, ShortType, IntegerType, LongType).contains(field.dataType),
      s"writeShards needs an integral '$shardCol' column (manifest keys are " +
        s"shard ids); got ${field.dataType.simpleString}")
    df.write.mode(SaveMode.Overwrite).partitionBy(shardCol).parquet(dir)
    // Null shards land in the Hive default partition and would silently
    // fall out of the manifest — detect them from the WRITTEN directory
    // listing (one FS call), not a pre-write filter job (which would cost
    // a full second evaluation of the input plan at 100 TB).
    val (hfsChk, rootChk) = fs(df.sparkSession, dir)
    require(!hfsChk.listStatus(rootChk).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(s"$shardCol=") &&
        st.getPath.getName.endsWith("__HIVE_DEFAULT_PARTITION__")),
      s"writeShards: '$shardCol' contained nulls — rows landed in the Hive " +
        "default partition and cannot be keyed in the manifest")
    // partition-directory values read back type-INFERRED (small ids become
    // ints) — normalize to long before collecting. An EMPTY export writes
    // no partition directories, so the read-back would fail schema
    // inference — a 0-row export is legitimate (the loader reads the
    // manifest first and sees total 0), so short-circuit to empty counts.
    val wroteRows = hasPartitionDirs(df.sparkSession, dir, shardCol)
    val counts =
      if (!wroteRows) Map.empty[Long, Long]
      else df.sparkSession.read.parquet(dir)
        .groupBy(col(shardCol).cast("long").as(shardCol))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stats =
      if (!wroteRows) Map.empty[Long, (Long, Long)]
      else shardFileStats(df.sparkSession, dir, shardCol)
    require(stats.keySet == counts.keySet,
      s"writeShards: row-count shards ${counts.keySet.toSeq.sorted} and " +
        s"listed shard directories ${stats.keySet.toSeq.sorted} disagree")
    def obj(m: Map[Long, Long]): String = m.toSeq.sorted
      .map { case (s, v) => s""""$s": $v""" }.mkString("{", ", ", "}")
    val manifest =
      s"""{"shards": ${obj(counts)}, "bytes": ${obj(stats.map { case (k, v) => k -> v._1 })}, """ +
        s""""files": ${obj(stats.map { case (k, v) => k -> v._2 })}, "total": ${counts.values.sum}}"""
    val (hfs, root) = fs(df.sparkSession, dir)
    val out = hfs.create(new Path(root, ManifestName), true)
    try out.write((manifest + "\n").getBytes("UTF-8")) finally out.close()
    counts
  }

  /** Per-shard (bytes, data files) from the written partition directories —
    * one listing per shard directory, data files only (hidden `.`/`_` names
    * like local-FS checksums excluded, matching what parquet reads). */
  private def shardFileStats(spark: SparkSession, dir: String,
                             shardCol: String): Map[Long, (Long, Long)] = {
    val (hfs, root) = fs(spark, dir)
    hfs.listStatus(root).iterator
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$shardCol=") &&
        !st.getPath.getName.endsWith("__HIVE_DEFAULT_PARTITION__"))
      .map { st =>
        val shard = st.getPath.getName.stripPrefix(s"$shardCol=").toLong
        val files = hfs.listStatus(st.getPath).filter { f =>
          val n = f.getPath.getName
          f.isFile && !n.startsWith(".") && !n.startsWith("_")
        }
        shard -> ((files.map(_.getLen).sum, files.length.toLong))
      }.toMap
  }

  /** Parse a [[writeShards]] manifest back into per-shard counts — the
    * loader's one small read to plan an epoch (no file listing, no scan).
    * Parsed with Jackson (already on Spark's classpath) rather than a
    * regex, so added manifest fields stay backward-compatible. */
  def readManifest(spark: SparkSession, dir: String): Map[Long, Long] =
    manifestField(spark, dir, "shards", required = true).get

  /** One manifest field's {shard: long} object; `required = false` lets a
    * reader of a pre-integrity manifest (no bytes/files) degrade gracefully. */
  private def manifestField(spark: SparkSession, dir: String, field: String,
                            required: Boolean): Option[Map[Long, Long]] = {
    val (hfs, root) = fs(spark, dir)
    val in = hfs.open(new Path(root, ManifestName))
    val text =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toString("UTF-8")
      } finally in.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(text).get(field)
    if (node == null || !node.isObject) {
      require(!required,
        s"no '$field' object in manifest at $dir — not a writeShards manifest " +
          "(or a corrupt/truncated file)")
      return None
    }
    val it = node.properties().iterator()
    val b = Map.newBuilder[Long, Long]
    while (it.hasNext) {
      val e = it.next()
      b += e.getKey.toLong -> e.getValue.asLong()
    }
    Some(b.result())
  }

  /** Loader-side integrity gate: re-list the written shard directories and
    * require every shard's data-file count and byte total to match what the
    * writer recorded. Row counts can't see a truncated or corrupt shard
    * file (the damage surfaces as a mid-epoch read error, or not at all);
    * the byte compare catches it up front for the cost of one listing per
    * shard — no data scan. Returns [[readManifest]]'s per-shard row counts
    * on success; manifests written before the integrity fields refuse
    * loudly rather than vacuously passing. */
  def validateShards(spark: SparkSession, dir: String,
                     shardCol: String = "shard"): Map[Long, Long] = {
    val counts = readManifest(spark, dir)
    val bytes = manifestField(spark, dir, "bytes", required = true).get
    val files = manifestField(spark, dir, "files", required = true).get
    val live = shardFileStats(spark, dir, shardCol)
    require(live.keySet == counts.keySet,
      s"validateShards: manifest shards ${counts.keySet.toSeq.sorted} vs " +
        s"on-disk shard directories ${live.keySet.toSeq.sorted}")
    for ((shard, (liveBytes, liveFiles)) <- live) {
      require(liveFiles == files(shard),
        s"validateShards: shard $shard has $liveFiles data files, " +
          s"manifest recorded ${files(shard)}")
      require(liveBytes == bytes(shard),
        s"validateShards: shard $shard is $liveBytes bytes on disk, " +
          s"manifest recorded ${bytes(shard)} — truncated or corrupt shard file")
    }
    counts
  }

  /** Read only the named shards — the filter is on the partition column,
    * so the scan prunes to those directories (a loader rank reads exactly
    * the shards it owns). */
  def readShards(spark: SparkSession, dir: String,
                 shards: Seq[Long], shardCol: String = "shard"): DataFrame =
    spark.read.parquet(dir)
      .filter(col(shardCol).isin(shards: _*))
}
