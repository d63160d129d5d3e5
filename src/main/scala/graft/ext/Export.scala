package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, BooleanType, ByteType, FloatType, IntegerType, LongType, ShortType, StringType}

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

  /** Task count for a whole-file shard read (tar/TFRecord/WARC archives
    * are consumed one task per file): one task per archive, capped at
    * 2× the cluster's core count so a 100 k-file crawl neither creates
    * 100 k tiny tasks nor — the old hardcoded 64 — serializes a
    * 1000-executor cluster onto 64 readers. On local[32] this resolves
    * to the same 64 as before. */
  private def readTasks(spark: SparkSession, nFiles: Int): Int =
    math.max(1, math.min(nFiles,
      math.max(64, spark.sparkContext.defaultParallelism * 2)))

  /** The Hadoop FileSystem owning `dir` (local, hdfs://, s3a://, ...). */
  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val path = new Path(dir)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  /** Write `df` partitioned by `shardCol` under `dir` (replacing any prior
    * export) and return the per-shard row counts that were also persisted
    * to the manifest. */
  def writeShards(df: DataFrame, dir: String,
                  shardCol: String = "shard"): Map[Long, Long] =
    shardWrite(df, dir, shardCol, SaveMode.Overwrite)

  /** APPEND `df`'s rows to an existing export (or start one) and republish
    * the manifest from the full written state — the daily-ingest shape: a
    * new batch lands as extra files inside the same shard directories, the
    * manifest totals re-derive from the listing + a partition-column-only
    * scan (no data pages read), and every reader contract
    * ([[readManifest]], [[validateShards]], [[readShards]]) holds over the
    * union.
    *
    * IDEMPOTENT when the caller supplies `epoch`: pass the streaming
    * engine's batchId from `foreachBatch` and a replayed batch is
    * DETECTED AND SKIPPED — the manifest's `epochs` list is the commit
    * log, so an epoch already recorded there returns the current counts
    * without writing a byte, and an epoch whose previous attempt died
    * mid-write/mid-move is retracted (below) and rewritten exactly once.
    * That closes the at-least-once gap: foreachBatch replays after a
    * crash land on one of (a) epoch committed → skip, (b) epoch half-
    * written → retract + rewrite, never a duplicate. Without `epoch`
    * (ad-hoc daily appends) the next id is auto-assigned and a re-run of
    * the same batch double-counts — dedupe upstream (x77) there. One id
    * namespace: don't mix auto and explicit epochs on one directory
    * unless the explicit ids are known to stay clear of the auto
    * sequence (max+1).
    *
    * WRITER IDENTITY: the epoch commit log is meaningful only for ONE
    * logical writer. A stream restarted from a FRESH checkpoint resets
    * batchIds to 0, and a second query appending to the same directory
    * starts its own batchId sequence — either one would find its epochs
    * "already committed" and silently skip REAL data while returning
    * success-looking counts. Pass `writerId` (the streaming query's
    * stable `query.id` — it survives checkpoint restarts — or any
    * caller-chosen stable token) and the manifest records it: a later
    * append with a DIFFERENT writerId is REFUSED loudly instead of
    * silently skipping, forcing the operator to choose a new directory,
    * dedupe upstream, or explicitly adopt the old writer id. Without
    * `writerId` the bare-epoch behavior (and its fresh-checkpoint /
    * second-writer data-loss hazard) is unchanged. Writes cannot safely
    * PROCEED under a new writer with colliding epoch numbers — the
    * `e<n>-` file prefixes and the retraction protocol key on the bare
    * epoch id — hence refusal, not a scoped second log.
    *
    * Each batch commits as an EPOCH: the batch stages under a `_staging-e<n>`
    * prefix (invisible to readers — Spark ignores `_`-prefixed paths), its
    * data files then move into the live shard directories under an
    * `e<n>-` file prefix, and the republished manifest records `n` in its
    * `epochs` list. A batch that dies mid-write strands only staging files;
    * one that dies mid-move strands `e<n>-` files whose epoch is NOT in the
    * manifest — either way the next append RETRACTS the strays (prefix
    * delete, no data scan) before committing its own epoch, so append
    * failures self-heal on retry instead of poisoning the directory
    * forever. `validateShards` stays the loud loader-side gate in the
    * window between a failed move and the healing retry (stray bytes
    * mismatch the committed manifest). Single-writer by contract, like the
    * manifest republish itself. On object stores without atomic rename
    * (S3A) the per-file move is copy+delete — the commit window widens but
    * the retraction contract is unchanged. */
  def appendShards(df: DataFrame, dir: String,
                   shardCol: String = "shard",
                   epoch: Option[Long] = None,
                   writerId: Option[String] = None): Map[Long, Long] =
    shardWrite(df, dir, shardCol, SaveMode.Append, epoch, writerId)

  /** COMPACT an appended export: merge each shard's accumulated per-epoch
    * files into one file per shard, collapse the manifest's `epochs` list
    * to a compaction watermark, and carry the content digests forward by
    * the x109 fold (a compaction rewrites FILES, never rows — the
    * per-shard count/xor/sum are the old manifest's verbatim, no recount
    * scan). The daily-ingest companion to [[appendShards]]: without it an
    * append-heavy export accumulates one file set per epoch forever and
    * its manifest lists every epoch.
    *
    * Commit protocol (single-writer, like every manifest write; each
    * step leaves only self-healing state):
    *  1. the compacted data stages under `_staging-c<g>` (g = previous
    *     compaction generation + 1) — a death here strands only staging,
    *     retracted by the next append/compact;
    *  2. every live data file renames to a hidden
    *     `.compact-trash-<g>-<name>` — no byte copied; a death here
    *     RESTORES from trash on the next append/compact (g is
    *     uncommitted);
    *  3. staged files move into the live shard directories under the
    *     `c<g>-` prefix — a death still restores: uncommitted `c<g>-`
    *     files retract, trash restores;
    *  4. the manifest republishes: `epochs` → `[]`, `compacted_through` =
    *     max epoch folded in (the watermark), `compaction` = g, writer id
    *     carried, per-file checksums recomputed for the NEW files only;
    *  5. the trash deletes (g is now committed).
    *
    * EXACTLY-ONCE SURVIVES: a replayed epoch at or below the watermark is
    * REFUSED by [[appendShards]] (it cannot be told apart from a new
    * batch with a recycled id — skipping would silently drop real data),
    * and auto-assigned epochs resume above the watermark. Each shard
    * compacts to ONE file (the shard is the parallelism unit across a
    * compaction; pick shard granularity accordingly — the same lever
    * every reader of this export already sizes by).
    *
    * READERS DURING THE SWAP: the single-writer contract extends to
    * concurrent PLAIN DIRECTORY readers — between steps 2 and 3 every
    * shard directory is transiently empty, so a bare
    * `spark.read.parquet(dir)` issued in that window (e.g. a loaded PQ
    * index's lazily-read encoded table) silently sees missing rows while
    * the manifest still records full counts. Manifest-pinned readers
    * ([[readShards]], [[exportFrame]]-based gates like
    * [[validateShardsContent]]) are safe-by-failure instead: they load
    * exactly the pinned file list and REFUSE LOUDLY on a parked file.
    * Schedule compactions in a reader quiet window, or read through the
    * pinned/validated paths — never assume the swap is
    * reader-transparent. */
  def compactShards(spark: SparkSession, dir: String,
                    shardCol: String = "shard",
                    writerId: Option[String] = None): Map[Long, Long] = {
    val tree = manifestTree(spark, dir)
    val fmt = Option(tree.get("format")).map(_.asText).getOrElse("parquet")
    require(fmt == "parquet",
      s"compactShards compacts parquet shard exports; the manifest at " +
        s"$dir records format '$fmt'")
    val prior = Option(tree.get("writer")).map(_.asText)
    (writerId, prior) match {
      case (Some(w), Some(p)) => require(w == p,
        s"compactShards: this export's commit log belongs to writer '$p' " +
          s"but this compaction carries writerId '$w'")
      case _ => ()
    }
    val (hfs, root) = fs(spark, dir)
    val committed = epochsOf(tree)
    val priorGen = Option(tree.get("compaction")).map(_.asLong).getOrElse(0L)
    val priorWm = Option(tree.get("compacted_through"))
      .map(_.asLong).getOrElse(-1L)
    val priorExp = Option(tree.get("expired_through"))
      .map(_.asLong).getOrElse(-1L)
    retractUncommitted(hfs, root, shardCol, committed, priorGen)
    // a WELL-FORMED manifest that merely predates the content-digest
    // fields must refuse with the real cause, not fieldMap's generic
    // "not a writeShards manifest" corruption diagnostic
    require(Option(tree.get("xor")).exists(_.isObject) &&
        Option(tree.get("sum")).exists(_.isObject),
      s"compactShards: the manifest at $dir predates per-shard content " +
        "digests (no xor/sum fields) — the fold-carry needs them; " +
        "rewrite the export via writeShards (or append one epoch) to " +
        "upgrade the manifest, then compact")
    val counts = fieldMap(tree, "shards", dir)
    val xor = fieldMap(tree, "xor", dir)
    val sum = fieldMap(tree, "sum", dir)
    val g = priorGen + 1
    val wm = (committed + priorWm).max
    val writerExtra = prior.orElse(writerId)
      .map(w => "writer" -> s""""$w"""").toSeq
    val extra = writerExtra ++ Seq(
      "compacted_through" -> wm.toString, "compaction" -> g.toString) ++
      (if (priorExp >= 0) Seq("expired_through" -> priorExp.toString) else Nil)
    val digests = counts.map { case (k, n) => k -> ((n, xor(k), sum(k))) }
    if (counts.isEmpty) {
      // nothing to rewrite; still collapse the log so the watermark
      // semantics are uniform
      return publishManifest(spark, dir, shardCol, "compactShards",
        d => spark.read.parquet(d), epochs = Set.empty,
        priorHashes = Map.empty, extra = extra,
        precomputed = Some(digests))
    }
    // 1. stage the full compacted data (one partition per shard: the
    //    repartition hashes on the shard column, so each shard's rows
    //    land in one task → one file per shard directory)
    val staging = new Path(root, s"_staging-c$g")
    spark.read.parquet(dir).repartition(col(shardCol))
      .write.mode(SaveMode.Overwrite).partitionBy(shardCol)
      .parquet(staging.toString)
    val shardDirsOf = (p: Path) => hfs.listStatus(p).filter(st =>
      st.isDirectory && st.getPath.getName.startsWith(s"$shardCol="))
    // 2. park every live data file in hidden per-generation trash
    shardDirsOf(root).foreach { sd =>
      hfs.listStatus(sd.getPath).foreach { f =>
        val n = f.getPath.getName
        if (f.isFile && !n.startsWith(".") && !n.startsWith("_"))
          require(hfs.rename(f.getPath,
            new Path(sd.getPath, s".compact-trash-$g-$n")),
            s"compactShards: could not park $n in ${sd.getPath}")
      }
    }
    // 3. move the staged files into the live shard directories
    shardDirsOf(staging).foreach { sd =>
      val live = new Path(root, sd.getPath.getName)
      hfs.mkdirs(live)
      hfs.listStatus(sd.getPath).foreach { f =>
        val n = f.getPath.getName
        if (f.isFile && !n.startsWith(".") && !n.startsWith("_"))
          require(hfs.rename(f.getPath,
            new Path(live, compactPrefix(g) + n)),
            s"compactShards: could not move staged $n into $live")
      }
    }
    hfs.delete(staging, true)
    // 4. commit: collapsed epochs, watermark, fold-carried digests,
    //    fresh per-file checksums (priorHashes empty — every file is new)
    val out = publishManifest(spark, dir, shardCol, "compactShards",
      d => spark.read.parquet(d), epochs = Set.empty,
      priorHashes = Map.empty, extra = extra, precomputed = Some(digests))
    // 5. the generation is committed — drop the trash
    shardDirsOf(root).foreach { sd =>
      hfs.listStatus(sd.getPath).foreach { f =>
        CompactTrash.findFirstMatchIn(f.getPath.getName).foreach { m =>
          if (f.isFile && m.group(1).toLong <= g)
            hfs.delete(f.getPath, false)
        }
      }
    }
    out
  }

  /** EXPIRE committed append epochs by retention policy and drop their
    * files — [[compactShards]]'s machinery with digest SUBTRACTION
    * instead of merge. The retention companion to [[appendShards]]: a
    * daily-ingest export otherwise keeps every epoch's files forever.
    *
    * Retention: an epoch expires when BOTH supplied rules agree —
    * `keepLast = Some(n)` protects the n newest epoch ids;
    * `olderThan = Some(w)` marks epochs strictly below the watermark w
    * as old enough. At least one rule is required. Expired ids are
    * always a down-set (every expired id below every survivor), so ONE
    * scalar — `expired_through`, the max expired id — carries the
    * refusal contract forward exactly like the compaction watermark.
    *
    * DIGESTS SUBTRACT, NEVER RESCAN: the expired epochs' per-shard
    * (rows, xor, sum) are recounted from ONLY the files being dropped
    * (the small side — they were going to be read never again), then
    * folded OUT of the manifest's digests (xor is self-inverse; the
    * modular sum subtracts; counts subtract). The surviving corpus is
    * never re-read, so expiry costs O(expired), not O(export) — at
    * 100 TB that is the difference between a retention job and a
    * full-corpus pass.
    *
    * Commit protocol (single-writer; every step leaves self-healing
    * state, and the same reader caveat as [[compactShards]] applies):
    *  1. expired files park under hidden `.expire-trash-<epoch>-<name>`
    *     — a death here restores from trash on the next
    *     append/compact/expire (the epochs are still in the manifest);
    *  2. the manifest republishes: surviving `epochs`, subtracted
    *     digests, `expired_through` watermark, writer id carried;
    *  3. the trash deletes (the expiry is committed — the epochs left
    *     the commit log).
    *
    * EXACTLY-ONCE SURVIVES EXPIRY: a replayed epoch at or below
    * `expired_through` is REFUSED by [[appendShards]] — expired data
    * must not silently resurrect through an at-least-once replay, and a
    * recycled id cannot be told apart from a new batch. Auto-assigned
    * epochs resume above the watermark. Epochs already folded into a
    * compaction no longer exist as file sets (the compaction dissolved
    * their boundaries) — expiry applies to epochs still in the commit
    * log; expire BEFORE compacting when both are scheduled. */
  def expireEpochs(spark: SparkSession, dir: String,
                   keepLast: Option[Int] = None,
                   olderThan: Option[Long] = None,
                   shardCol: String = "shard",
                   writerId: Option[String] = None): Map[Long, Long] = {
    require(keepLast.nonEmpty || olderThan.nonEmpty,
      "expireEpochs needs a retention rule: keepLast and/or olderThan")
    keepLast.foreach(n => require(n >= 0,
      s"expireEpochs: keepLast must be >= 0, got $n"))
    val tree = manifestTree(spark, dir)
    val fmt = Option(tree.get("format")).map(_.asText).getOrElse("parquet")
    require(fmt == "parquet",
      s"expireEpochs expires parquet shard exports; the manifest at " +
        s"$dir records format '$fmt'")
    val prior = Option(tree.get("writer")).map(_.asText)
    (writerId, prior) match {
      case (Some(w), Some(p)) => require(w == p,
        s"expireEpochs: this export's commit log belongs to writer '$p' " +
          s"but this expiry carries writerId '$w'")
      case _ => ()
    }
    require(Option(tree.get("xor")).exists(_.isObject) &&
        Option(tree.get("sum")).exists(_.isObject),
      s"expireEpochs: the manifest at $dir predates per-shard content " +
        "digests (no xor/sum fields) — the digest subtraction needs " +
        "them; rewrite the export via writeShards (or append one epoch) " +
        "to upgrade the manifest, then expire")
    val (hfs, root) = fs(spark, dir)
    val committed = epochsOf(tree)
    val priorGen = Option(tree.get("compaction")).map(_.asLong).getOrElse(0L)
    val priorWm = Option(tree.get("compacted_through"))
      .map(_.asLong).getOrElse(-1L)
    val priorExp = Option(tree.get("expired_through"))
      .map(_.asLong).getOrElse(-1L)
    // self-heal first: a previous crashed expiry's trash restores (its
    // epochs are still committed), stranded staging/epoch files retract
    retractUncommitted(hfs, root, shardCol, committed, priorGen)
    val byAge = committed.toSeq.sorted
    val protectedIds = keepLast.map(n => byAge.takeRight(n).toSet)
      .getOrElse(Set.empty[Long])
    val oldEnough = olderThan.map(w => committed.filter(_ < w))
      .getOrElse(committed)
    val expired = (committed -- protectedIds) & oldEnough
    val survivors = committed -- expired
    // down-set invariant (see scaladoc): both rules only ever expire the
    // oldest ids, so the single expired_through watermark is sound
    require(expired.isEmpty || survivors.isEmpty ||
      expired.max < survivors.min,
      s"expireEpochs: internal invariant violated — expired ${expired.toSeq.sorted} " +
        s"interleaves survivors ${survivors.toSeq.sorted}")
    val counts = fieldMap(tree, "shards", dir)
    if (expired.isEmpty) return counts
    val xor = fieldMap(tree, "xor", dir)
    val sum = fieldMap(tree, "sum", dir)
    val qroot = hfs.makeQualified(root)
    val shardDirs = hfs.listStatus(root).filter(st =>
      st.isDirectory && st.getPath.getName.startsWith(s"$shardCol="))
    // (epoch, live path) of every file being dropped — the subtraction
    // scan's input AND the park list, from one listing pass
    val expiredFiles: Seq[(Long, Path)] = shardDirs.toSeq.flatMap { sd =>
      hfs.listStatus(sd.getPath).toSeq.flatMap { f =>
        val n = f.getPath.getName
        if (!f.isFile) None
        else EpochFile.findFirstMatchIn(n)
          .map(_.group(1).toLong).filter(expired.contains)
          .map(e => (e, f.getPath))
      }
    }
    val dropped: Map[Long, (Long, Long, Long)] =
      if (expiredFiles.isEmpty) Map.empty
      else shardDigests(
        spark.read.option("basePath", qroot.toString)
          .parquet(expiredFiles.map(_._2.toString): _*), shardCol)
    val Mod = 2305843009213693952L // 2^61, the digest fold's modulus
    val newDigests = counts.map { case (k, n) =>
      val (dn, dx, ds) = dropped.getOrElse(k, (0L, 0L, 0L))
      require(dn <= n,
        s"expireEpochs: shard $k drops $dn rows but the manifest records " +
          s"only $n — the export and its manifest have diverged")
      k -> ((n - dn, xor(k) ^ dx, (((sum(k) - ds) % Mod) + Mod) % Mod))
    }
    // 1. park the expired files (hidden names: out of every directory
    //    listing, every manifest stat, every pinned file list)
    expiredFiles.foreach { case (e, p) =>
      require(hfs.rename(p,
        new Path(p.getParent, s".expire-trash-$e-${p.getName}")),
        s"expireEpochs: could not park ${p.getName} in ${p.getParent}")
    }
    // 2. commit: surviving epochs, subtracted digests, expiry watermark;
    //    surviving files' checksums carry forward (nothing re-hashes)
    val expTh = math.max(priorExp, expired.max)
    val extra = prior.orElse(writerId)
      .map(w => "writer" -> s""""$w"""").toSeq ++
      (if (priorGen > 0)
        Seq("compacted_through" -> priorWm.toString,
          "compaction" -> priorGen.toString)
      else Nil) ++
      Seq("expired_through" -> expTh.toString)
    val out = publishManifest(spark, dir, shardCol, "expireEpochs",
      d => spark.read.parquet(d), epochs = survivors,
      priorHashes = stringLongMap(tree, "filehash"), extra = extra,
      precomputed = Some(newDigests))
    // 3. the expiry is committed — drop the trash
    expiredFiles.foreach { case (e, p) =>
      hfs.delete(new Path(p.getParent, s".expire-trash-$e-${p.getName}"), false)
    }
    out
  }

  /** File prefix of a committed append epoch's data files. */
  private def epochPrefix(epoch: Long): String = s"e$epoch-"
  private val EpochFile = "^e([0-9]+)-".r

  /** File prefix of a committed compaction generation's data files, and
    * the hidden trash name a compaction parks retired files under until
    * its manifest commits ([[compactShards]]). */
  private def compactPrefix(gen: Long): String = s"c$gen-"
  private val CompactFile = "^c([0-9]+)-".r
  private val CompactTrash = "^\\.compact-trash-([0-9]+)-(.+)$".r
  /** Hidden name an expiry parks a dropped epoch file under until its
    * manifest commits ([[expireEpochs]]); group 1 is the epoch id. */
  private val ExpireTrash = "^\\.expire-trash-([0-9]+)-(.+)$".r

  /** The append epochs the manifest records as committed (empty for a
    * fresh/overwrite export or a pre-epoch manifest — base files carry no
    * epoch prefix and are always committed). */
  def committedEpochs(spark: SparkSession, dir: String): Set[Long] =
    epochsOf(manifestTree(spark, dir))

  /** [[committedEpochs]] from an already-parsed manifest tree — the ONE
    * definition of the epochs-array layout (writer and readers share it,
    * so they cannot drift). */
  private def epochsOf(tree: com.fasterxml.jackson.databind.JsonNode): Set[Long] = {
    val node = tree.get("epochs")
    if (node == null || !node.isArray) Set.empty
    else {
      val it = node.elements(); val b = Set.newBuilder[Long]
      while (it.hasNext) b += it.next().asLong()
      b.result()
    }
  }

  /** One manifest field's {string: long} object (empty when absent) — the
    * ONE parse of the `filehash` layout, shared by the writer's epoch
    * carry-forward and [[validateShardsContent]]. */
  private def stringLongMap(tree: com.fasterxml.jackson.databind.JsonNode,
                            field: String): Map[String, Long] = {
    val node = tree.get(field)
    if (node == null || !node.isObject) Map.empty
    else {
      val it = node.properties().iterator()
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asLong() }
      b.result()
    }
  }

  /** Delete stranded files from append epochs and compactions that never
    * committed: any `_staging-*` directory, any `e<n>-` data file whose
    * epoch is not in `committed`, any `c<g>-` data file whose compaction
    * generation exceeds the manifest's (`committedGen`), and any
    * `.compact-trash-<g>-<orig>` file — deleted when generation `g`
    * committed (the compaction finished, the trash is its retired
    * pre-compaction file), RESTORED to `orig` when it did not (the
    * compaction died mid-swap; the trash IS the data). The same
    * contract heals `.expire-trash-<n>-<orig>` files by the epoch
    * commit log: epoch `n` still in `committed` means the expiry never
    * republished the manifest — the trash restores; `n` gone means the
    * expiry committed and the trash is its retired file — deleted.
    * Prefix matching and renames only — no data scan. Restores run
    * after `e`/`c` retractions in the same listing pass, so a
    * half-swapped shard heals to exactly its pre-compaction state. */
  private def retractUncommitted(hfs: FileSystem, root: Path,
                                 shardCol: String,
                                 committed: Set[Long],
                                 committedGen: Long = 0L): Unit = {
    if (!hfs.exists(root)) return
    hfs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("_staging-"))
        hfs.delete(st.getPath, true)
      else if (st.isDirectory && name.startsWith(s"$shardCol=")) {
        val files = hfs.listStatus(st.getPath)
        files.foreach { f =>
          val n = f.getPath.getName
          if (f.isFile) {
            EpochFile.findFirstMatchIn(n).foreach { m =>
              if (!committed.contains(m.group(1).toLong))
                hfs.delete(f.getPath, false)
            }
            CompactFile.findFirstMatchIn(n).foreach { m =>
              if (m.group(1).toLong > committedGen)
                hfs.delete(f.getPath, false)
            }
          }
        }
        files.foreach { f =>
          val n = f.getPath.getName
          if (f.isFile) {
            CompactTrash.findFirstMatchIn(n).foreach { m =>
              if (m.group(1).toLong <= committedGen)
                hfs.delete(f.getPath, false)
              else require(
                hfs.rename(f.getPath, new Path(st.getPath, m.group(2))),
                s"could not restore pre-compaction file ${m.group(2)} " +
                  s"from stranded trash $n in ${st.getPath}")
            }
            ExpireTrash.findFirstMatchIn(n).foreach { m =>
              if (!committed.contains(m.group(1).toLong))
                hfs.delete(f.getPath, false)
              else require(
                hfs.rename(f.getPath, new Path(st.getPath, m.group(2))),
                s"could not restore pre-expiry file ${m.group(2)} " +
                  s"from stranded trash $n in ${st.getPath}")
            }
          }
        }
      }
    }
  }

  private def shardWrite(df: DataFrame, dir: String, shardCol: String,
                         mode: SaveMode,
                         explicitEpoch: Option[Long] = None,
                         writerId: Option[String] = None): Map[Long, Long] = {
    val caller = if (mode == SaveMode.Append) "appendShards" else "writeShards"
    writerId.foreach(w => require(
      w.nonEmpty && w.forall(c => c.isLetterOrDigit || "._:-".contains(c)),
      s"$caller: writerId must be non-empty [A-Za-z0-9._:-]+, got '$w'"))
    require(df.columns.contains(shardCol),
      s"$caller needs a '$shardCol' column; got ${df.columns.mkString(",")}")
    val field = df.schema(shardCol)
    require(
      Seq(ByteType, ShortType, IntegerType, LongType).contains(field.dataType),
      s"$caller needs an integral '$shardCol' column (manifest keys are " +
        s"shard ids); got ${field.dataType.simpleString}")
    var epochs = Set.empty[Long]
    var priorHashes = Map.empty[String, Long]
    var writer = writerId
    var watermark = -1L
    var compactGen = 0L
    var expiredThrough = -1L
    if (mode == SaveMode.Append) {
      // Input contracts hold BEFORE any file lands (both checks are
      // batch-sized, not corpus-sized — an epoch batch is the small side):
      //   1. no null shards (they would land in the Hive default partition
      //      and fall out of the manifest);
      require(df.filter(col(shardCol).isNull).limit(1).count() == 0L,
        s"$caller: '$shardCol' contains nulls — appending would strand " +
          "rows in the Hive default partition with no way to key them")
      val (hfsPre, rootPre) = fs(df.sparkSession, dir)
      // Self-heal FIRST: retract any epoch that never committed (stranded
      // staging dirs from a mid-write death, stranded e<n>- files from a
      // mid-move death) so the schema check and the manifest recount see
      // only committed state — and so a failed append is repaired by its
      // own retry rather than poisoning the directory forever.
      val committed =
        if (hfsPre.exists(new Path(rootPre, ManifestName))) {
          val tree = manifestTree(df.sparkSession, dir)
          // carry the prior epochs' per-file checksums forward so an append
          // re-hashes only ITS OWN files — without this, every daily epoch
          // would re-read the full corpus's bytes just to republish hashes
          // it already recorded
          priorHashes = stringLongMap(tree, "filehash")
          watermark = Option(tree.get("compacted_through"))
            .map(_.asLong).getOrElse(-1L)
          compactGen = Option(tree.get("compaction"))
            .map(_.asLong).getOrElse(0L)
          expiredThrough = Option(tree.get("expired_through"))
            .map(_.asLong).getOrElse(-1L)
          // Writer-identity gate (see the appendShards scaladoc): the epoch
          // commit log belongs to one logical writer. A different writerId
          // arriving with its own epoch sequence would either silently skip
          // real data (epoch collision) or collide e<n>- file prefixes with
          // a committed epoch's — refuse loudly before any file lands.
          val prior = Option(tree.get("writer")).map(_.asText)
          (writerId, prior) match {
            case (Some(w), Some(p)) => require(w == p,
              s"$caller: this export's epoch commit log belongs to writer " +
                s"'$p' but this append carries writerId '$w' — a fresh-" +
                "checkpoint restart or a second query must not reuse this " +
                "directory's epoch namespace; use a new directory, or pass " +
                "the recorded writerId to resume ITS log deliberately")
            case (None, Some(p)) => writer = Some(p) // carry forward
            case _ => () // adopt the supplied id (or stay legacy/unscoped)
          }
          epochsOf(tree)
        } else Set.empty[Long]
      explicitEpoch.foreach(e => require(e >= 0,
        s"$caller: explicit epoch must be >= 0, got $e"))
      // Pre-compaction replay gate: epochs at or below the compaction
      // watermark were collapsed out of the commit log — a replayed one
      // cannot be distinguished from a new batch carrying a recycled id,
      // so it REFUSES (skipping would be right for a true replay but
      // silently drop a genuinely new batch; refusal forces the operator
      // to decide). Commit-log semantics survive compaction.
      explicitEpoch.foreach(e => require(e > watermark,
        s"$caller: epoch $e is at or below this export's compaction " +
          s"watermark $watermark — pre-compaction epochs were collapsed " +
          "by compactShards and a replay cannot be told apart from a new " +
          "batch; a true replay is already committed (safe to drop), a " +
          "new batch must carry an epoch above the watermark"))
      // Expiry replay gate: epochs at or below the expiry watermark had
      // their DATA DROPPED by expireEpochs — an at-least-once replay of
      // one must not silently resurrect expired rows, and a new batch
      // carrying a recycled id cannot be told apart from that replay.
      // Refuse, same posture as the compaction watermark above.
      explicitEpoch.foreach(e => require(e > expiredThrough,
        s"$caller: epoch $e is at or below this export's expiry " +
          s"watermark $expiredThrough — expireEpochs dropped those " +
          "epochs' data; a replay must not resurrect it, and a new batch " +
          "must carry an epoch above the watermark"))
      retractUncommitted(hfsPre, rootPre, shardCol, committed, compactGen)
      // Idempotent replay: an explicit epoch already in the manifest means
      // this exact batch COMMITTED on a previous attempt — an at-least-once
      // foreachBatch replay must SKIP, not double-write. (The retraction
      // above already healed any OTHER epoch's strays; a half-written
      // attempt of THIS epoch is by definition not in the manifest and
      // falls through to the rewrite path.)
      if (explicitEpoch.exists(committed.contains))
        return readManifest(df.sparkSession, dir)
      //   2. no schema drift vs the existing export (path-based parquet
      //      append enforces nothing; a missing column would read back as
      //      null and silently corrupt every downstream epoch).
      // an export with a manifest but zero shard dirs (prior empty write)
      // has no schema to enforce — read.parquet would fail inference there
      val hasShardDirs = hfsPre.exists(rootPre) &&
        hfsPre.listStatus(rootPre).exists(st =>
          st.isDirectory && st.getPath.getName.startsWith(s"$shardCol="))
      if (hasShardDirs && hfsPre.exists(new Path(rootPre, ManifestName))) {
        // compare DATA columns only: the shard partition column reads back
        // type-INFERRED from directory names (int for small ids), which
        // would false-fail a long-typed batch; shardCol is already
        // validated integral above
        val existing = df.sparkSession.read.parquet(dir).schema
        val want = existing.filter(_.name != shardCol)
          .map(f => f.name -> f.dataType).sortBy(_._1)
        val got = df.schema.filter(_.name != shardCol)
          .map(f => f.name -> f.dataType).sortBy(_._1)
        require(got == want,
          s"$caller: batch schema ${got.mkString(",")} does not match the " +
            s"existing export's ${want.mkString(",")} — path-based append " +
            "would silently union-corrupt the shards")
      }
      // Staged epoch commit: write the batch under a _staging- prefix
      // (invisible to any concurrent read.parquet(dir)), then move each
      // data file into its live shard directory under the epoch's file
      // prefix. A death anywhere in this window leaves only retractable
      // state (see the appendShards scaladoc).
      val next = explicitEpoch.getOrElse(
        math.max(math.max((committed + 0L).max, watermark),
          expiredThrough) + 1)
      val staging = new Path(rootPre, s"_staging-e$next")
      df.write.mode(SaveMode.Overwrite).partitionBy(shardCol)
        .parquet(staging.toString)
      hfsPre.listStatus(staging).foreach { st =>
        if (st.isDirectory && st.getPath.getName.startsWith(s"$shardCol=")) {
          val live = new Path(rootPre, st.getPath.getName)
          hfsPre.mkdirs(live)
          hfsPre.listStatus(st.getPath).foreach { f =>
            val n = f.getPath.getName
            if (f.isFile && !n.startsWith(".") && !n.startsWith("_"))
              require(hfsPre.rename(f.getPath,
                new Path(live, epochPrefix(next) + n)),
                s"$caller: could not move staged file $n into $live")
          }
        }
      }
      hfsPre.delete(staging, true)
      epochs = committed + next
    } else
      df.write.mode(mode).partitionBy(shardCol).parquet(dir)
    publishManifest(df.sparkSession, dir, shardCol, caller,
      d => df.sparkSession.read.parquet(d), epochs, priorHashes,
      extra = writer.map(w => "writer" -> s""""$w"""").toSeq ++
        (if (compactGen > 0)
          Seq("compacted_through" -> watermark.toString,
            "compaction" -> compactGen.toString)
        else Nil) ++
        (if (expiredThrough >= 0)
          Seq("expired_through" -> expiredThrough.toString)
        else Nil))
  }

  /** Recount the WRITTEN files and publish the manifest — the shared tail
    * of every shard writer ([[writeShards]]/[[appendShards]] over parquet,
    * [[writeJsonlShards]] over JSONL): one root listing answers the
    * null-shard check and seeds per-shard stats, `loader` re-reads the
    * written files for the row-count + content digest (so the digest
    * validates the actual encode→decode round trip, not the in-memory
    * frame), and `extra` carries format-specific manifest fields as raw
    * JSON values. */
  private def publishManifest(spark: SparkSession, dir: String,
                              shardCol: String, caller: String,
                              loader: String => DataFrame,
                              epochs: Set[Long],
                              priorHashes: Map[String, Long],
                              extra: Seq[(String, String)] = Nil,
                              precomputed: Option[Map[Long, (Long, Long, Long)]] = None)
      : Map[Long, Long] = {
    val (hfs, root) = fs(spark, dir)
    // ONE root listing answers the null-shard check, the any-rows check,
    // and seeds the per-shard stats — one LIST RPC on an object store, not
    // three. Null shards land in the Hive default partition and would
    // silently fall out of the manifest — detected from the WRITTEN
    // directories, not a pre-write filter job (which would cost a full
    // second evaluation of the input plan at 100 TB).
    val rootList = hfs.listStatus(root)
    require(!rootList.exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(s"$shardCol=") &&
        st.getPath.getName.endsWith("__HIVE_DEFAULT_PARTITION__")),
      s"$caller: '$shardCol' contained nulls — rows landed in the Hive " +
        "default partition and cannot be keyed in the manifest")
    val shardDirs = rootList.filter(st => st.isDirectory &&
      st.getPath.getName.startsWith(s"$shardCol=") &&
      !st.getPath.getName.endsWith("__HIVE_DEFAULT_PARTITION__"))
    // partition-directory values read back type-INFERRED (small ids become
    // ints) — normalize to long before collecting. An EMPTY export writes
    // no partition directories, so the read-back would fail schema
    // inference — a 0-row export is legitimate (the loader reads the
    // manifest first and sees total 0), so short-circuit to empty counts.
    // ONE aggregate over the written files answers row counts AND the
    // x109-fold content digest per shard (count + bit_xor + modular sum of
    // a 60-bit row hash — [[corpusDigest]]'s commutative/associative fold,
    // so the digest costs nothing beyond the recount scan the writer
    // already pays). The digest rides the manifest so
    // [[validateShardsContent]] can catch a same-length bit-flip that the
    // byte/file-count gate cannot see.
    // `precomputed` is the compaction fold-carry: a compaction rewrites
    // FILES, never rows, so its per-shard (count, xor, sum) are the old
    // manifest's verbatim — the x109 fold's commutativity is what makes
    // carrying them sound, and it saves the full recount scan.
    val digests = precomputed.getOrElse {
      if (shardDirs.isEmpty) Map.empty[Long, (Long, Long, Long)]
      else shardDigests(loader(dir), shardCol)
    }
    val counts = digests.map { case (k, v) => k -> v._1 }
    val listing = shardListing(hfs, shardDirs, shardCol)
    val stats = statsFor(listing)
    require(stats.keySet == counts.keySet,
      s"$caller: row-count shards ${counts.keySet.toSeq.sorted} and " +
        s"listed shard directories ${stats.keySet.toSeq.sorted} disagree")
    // Per-file xxhash64 of the RAW bytes, keyed by `shard=N/name`. The
    // content digest above is computed over DECODED rows, so it is
    // structurally blind to a flip in bytes parquet decoding never touches
    // (footer statistics, column indexes, padding); the byte checksum
    // closes that gap. Prior epochs' hashes carry forward — only files not
    // already in the manifest are read.
    val liveFiles = dataFileList(listing)
    val liveSet = liveFiles.map(_._1).toSet
    val fileHash =
      priorHashes.filter { case (rel, _) => liveSet.contains(rel) } ++
        fileHashes(spark,
          liveFiles.filterNot { case (rel, _) => priorHashes.contains(rel) })
    def obj(m: Map[Long, Long]): String = m.toSeq.sorted
      .map { case (s, v) => s""""$s": $v""" }.mkString("{", ", ", "}")
    def objStr(m: Map[String, Long]): String = m.toSeq.sorted
      .map { case (s, v) => s""""$s": $v""" }.mkString("{", ", ", "}")
    val extraJson = extra
      .map { case (k, v) => s""""$k": $v, """ }.mkString
    val manifest =
      s"""{"shards": ${obj(counts)}, "bytes": ${obj(stats.map { case (k, v) => k -> v._1 })}, """ +
        s""""files": ${obj(stats.map { case (k, v) => k -> v._2 })}, """ +
        s""""xor": ${obj(digests.map { case (k, v) => k -> v._2 })}, """ +
        s""""sum": ${obj(digests.map { case (k, v) => k -> v._3 })}, """ +
        s""""filehash": ${objStr(fileHash)}, """ +
        extraJson +
        s""""epochs": ${epochs.toSeq.sorted.mkString("[", ", ", "]")}, """ +
        s""""total": ${counts.values.sum}}"""
    val out = hfs.create(new Path(root, ManifestName), true)
    try out.write((manifest + "\n").getBytes("UTF-8")) finally out.close()
    counts
  }

  /** ONE listing per shard directory (a LIST RPC each on an object store),
    * data files only (hidden `.`/`_` names like local-FS checksums
    * excluded, matching what parquet reads) — every per-file view below
    * ([[statsFor]], [[dataFileList]]) derives from THIS, so a validation
    * or manifest write never lists the same directory twice. */
  private def shardListing(hfs: FileSystem,
                           shardDirs: Array[org.apache.hadoop.fs.FileStatus],
                           shardCol: String)
      : Seq[(Long, String, Array[org.apache.hadoop.fs.FileStatus])] =
    shardDirs.iterator.map { st =>
      val files = hfs.listStatus(st.getPath).filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith(".") && !n.startsWith("_")
      }
      (st.getPath.getName.stripPrefix(s"$shardCol=").toLong,
        st.getPath.getName, files)
    }.toSeq

  /** Per-shard (bytes, data files) from a [[shardListing]]. */
  private def statsFor(listing: Seq[(Long, String, Array[org.apache.hadoop.fs.FileStatus])])
      : Map[Long, (Long, Long)] =
    listing.map { case (shard, _, files) =>
      shard -> ((files.map(_.getLen).sum, files.length.toLong))
    }.toMap

  /** Every data file in a [[shardListing]] as (relative path
    * `shard=N/name`, absolute Path) — the manifest's checksum keys. */
  private def dataFileList(listing: Seq[(Long, String, Array[org.apache.hadoop.fs.FileStatus])])
      : Seq[(String, Path)] =
    listing.flatMap { case (_, dirName, files) =>
      files.map(f => (s"$dirName/${f.getPath.getName}", f.getPath))
    }

  /** Seed-chained xxhash64 of each listed file's raw bytes, computed
    * DISTRIBUTED (one executor task per file) and STREAMED: 1 MiB blocks
    * read off an FSDataInputStream, each block hashed with the previous
    * block's hash as the seed (initial seed 42, the SQL function's) — so
    * memory stays one block per task and there is NO 2 GiB single-cell
    * cap, unlike a binaryFile read whose `content` column materializes
    * the whole file and refuses parts ≥ Int.MaxValue bytes. Each block is
    * FILLED with a readFully-style inner loop before hashing (only the
    * final block may be short): `InputStream.read` may legally return
    * short reads at arbitrary boundaries (HDFS packet edges, S3 socket
    * buffers), and hashing whatever one read() returned would make the
    * chained value depend on the chunking, not the bytes — a manifest
    * written on one filesystem would then fail validation on another. The
    * chained definition is the manifest's own contract — writer and
    * validator both call THIS function, so the two sides cannot drift.
    * Keys are the
    * `shard=N/name` relative paths (part-file NAMES alone are not unique
    * across shard directories — one partitionBy task writes the same file
    * name into every shard it touches). */
  private def fileHashes(spark: SparkSession,
                         files: Seq[(String, Path)]): Map[String, Long] =
    if (files.isEmpty) Map.empty
    else {
      import spark.implicits._
      val confB = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(
          spark.sessionState.newHadoopConf()))
      val paths = files.map { case (rel, p) => (rel, p.toString) }
      spark.createDataset(paths)
        .repartition(math.min(paths.size, 64))
        .mapPartitions { it =>
          val conf = confB.value.value
          val buf = new Array[Byte](1 << 20)
          it.map { case (rel, uri) =>
            val p = new Path(uri)
            val in = p.getFileSystem(conf).open(p)
            try {
              var h = 42L
              var eof = false
              while (!eof) {
                var filled = 0
                while (!eof && filled < buf.length) {
                  val n = in.read(buf, filled, buf.length - filled)
                  if (n < 0) eof = true else filled += n
                }
                if (filled > 0)
                  h = org.apache.spark.sql.catalyst.expressions.XXH64
                    .hashUnsafeBytes(buf,
                      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                      filled, h)
              }
              (rel, h)
            } finally in.close()
          }
        }
        .collect().toMap
    }

  /** Per-shard (rows, xor_digest, sum_digest) over the WRITTEN files — the
    * shared definition behind the writer's manifest digest and
    * [[validateShardsContent]]'s recount, so the two sides cannot drift.
    * The row hash is the [[corpusDigest]] shape generalized to any schema:
    * a 60-bit md5 slice of the row's JSON rendering over the DATA columns
    * in sorted-name order (the shard column is excluded — its value is the
    * directory identity, and partition values read back type-inferred,
    * which would make the hash depend on the reader). Both folds are
    * commutative + associative — partitioning- and order-invariant. */
  private def shardDigests(frame: DataFrame,
                           shardCol: String): Map[Long, (Long, Long, Long)] = {
    val dataCols = frame.columns.filter(_ != shardCol).sorted
      .map(c => s"`$c`").mkString(",")
    frame
      .select(col(shardCol).cast("long").as("__shard"),
        expr(s"""CAST(conv(substr(md5(to_json(struct($dataCols))), 1, 15),
                           16, 10) AS BIGINT)""").as("h"))
      .groupBy(col("__shard"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"),
        expr("""CAST(sum(CAST(h AS DECIMAL(38,0)))
                     % 2305843009213693952 AS BIGINT)""").as("s"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  /** [[statsFor]] from a fresh root listing (the loader-side entry). */
  private def shardFileStats(spark: SparkSession, dir: String,
                             shardCol: String): Map[Long, (Long, Long)] = {
    val (hfs, root) = fs(spark, dir)
    statsFor(shardListing(hfs,
      hfs.listStatus(root).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$shardCol=") &&
        !st.getPath.getName.endsWith("__HIVE_DEFAULT_PARTITION__")), shardCol))
  }

  /** Parse a [[writeShards]] manifest back into per-shard counts — the
    * loader's one small read to plan an epoch (no file listing, no scan).
    * Parsed with Jackson (already on Spark's classpath) rather than a
    * regex, so added manifest fields stay backward-compatible. */
  def readManifest(spark: SparkSession, dir: String): Map[Long, Long] =
    fieldMap(manifestTree(spark, dir), "shards", dir)

  /** Order- and partitioning-invariant corpus digest, per group: doc
    * count, XOR-fold, and modular sum (mod 2⁶¹) of a 60-bit md5-derived
    * hash of each `id:text` pair. The corpus-equality check a 100 TB
    * export pipeline needs: writer and loader each digest their own side
    * and compare THREE numbers per group — no sort, no join, no second
    * copy of the data in one place. Both folds are commutative +
    * associative, so per-shard digests combine to the corpus digest
    * (xor := xor ⊕ xor, sum := (sum + sum) mod 2⁶¹, n := n + n) — digest
    * once at write time, merge cheaply forever after. 60 bits (15 hex
    * chars) keeps the hash inside a signed BIGINT in every engine; the
    * id is folded in so two corpora that swap texts between ids digest
    * differently. */
  def corpusDigest(df: DataFrame, groupCol: String = "source",
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    df.select(col(groupCol),
        expr(s"""CAST(conv(substr(md5(concat(CAST($idCol AS STRING), ':',
                                             coalesce($textCol, ''))), 1, 15),
                           16, 10) AS BIGINT)""").as("h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("xor_digest"),
        expr("""CAST(sum(CAST(h AS DECIMAL(38,0)))
                     % 2305843009213693952 AS BIGINT)""").as("sum_digest"))

  /** One FS read + Jackson parse of the manifest — shared by every reader,
    * so a validation pass costs one GET, not one per field. */
  private def manifestTree(spark: SparkSession,
                           dir: String): com.fasterxml.jackson.databind.JsonNode = {
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
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
  }

  /** One manifest field's {shard: long} object. */
  private def fieldMap(tree: com.fasterxml.jackson.databind.JsonNode,
                       field: String, dir: String): Map[Long, Long] = {
    val node = tree.get(field)
    require(node != null && node.isObject,
      s"no '$field' object in manifest at $dir — not a writeShards manifest " +
        "(or a corrupt/truncated file, or one written before this field existed)")
    val it = node.properties().iterator()
    val b = Map.newBuilder[Long, Long]
    while (it.hasNext) {
      val e = it.next()
      b += e.getKey.toLong -> e.getValue.asLong()
    }
    b.result()
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
    val tree = manifestTree(spark, dir)
    val counts = fieldMap(tree, "shards", dir)
    val bytes = fieldMap(tree, "bytes", dir)
    val files = fieldMap(tree, "files", dir)
    // a hand-edited/corrupt manifest whose bytes/files miss a shard must
    // fail with THIS diagnostic, not a bare key-lookup exception below
    require(bytes.keySet == counts.keySet && files.keySet == counts.keySet,
      s"validateShards: manifest at $dir records shards " +
        s"${counts.keySet.toSeq.sorted} but bytes for " +
        s"${bytes.keySet.toSeq.sorted} and files for ${files.keySet.toSeq.sorted}")
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

  /** Deep loader-side integrity gate: [[validateShards]]'s listing checks
    * PLUS a content-digest recount PLUS a per-file byte-checksum recount.
    * The digest pass re-derives every shard's (rows, xor, sum) digest from
    * the DECODED rows and requires equality with the manifest — the check
    * that catches a same-length bit-flip inside data pages (ExportSpec pins
    * exactly that case), and the one that survives a content-preserving
    * re-layout. The checksum pass re-hashes every data file's RAW bytes
    * (xxhash64, distributed) against the manifest's `filehash` — the check
    * that catches a flip in bytes decoding never touches (footer
    * statistics, column indexes), which the digest is structurally blind
    * to. Costs two scans of the export — the explicit price of content
    * validation; run it on ingest of an export that crossed an untrusted
    * boundary, and the free listing-only [[validateShards]] everywhere
    * else. Manifests written before the digest fields refuse loudly; a
    * manifest that predates only the `filehash` field (older exports that
    * previously passed full content validation) degrades gracefully — the
    * digest pass still runs and a warning is logged that the checksum
    * pass was skipped, so already-deployed exports keep validating
    * without a rewrite while new exports get both passes. */
  def validateShardsContent(spark: SparkSession, dir: String,
                            shardCol: String = "shard"): Map[Long, Long] = {
    val counts = validateShards(spark, dir, shardCol)
    val tree = manifestTree(spark, dir)
    val xor = fieldMap(tree, "xor", dir)
    val sum = fieldMap(tree, "sum", dir)
    require(xor.keySet == counts.keySet && sum.keySet == counts.keySet,
      s"validateShardsContent: manifest at $dir records shards " +
        s"${counts.keySet.toSeq.sorted} but digests for " +
        s"${xor.keySet.toSeq.sorted}/${sum.keySet.toSeq.sorted}")
    val live = shardDigests(exportFrame(spark, dir, tree, shardCol), shardCol)
    require(live.keySet == counts.keySet,
      s"validateShardsContent: manifest shards ${counts.keySet.toSeq.sorted} " +
        s"vs on-disk ${live.keySet.toSeq.sorted}")
    for ((shard, (n, x, s)) <- live) {
      require(n == counts(shard),
        s"validateShardsContent: shard $shard has $n rows, manifest " +
          s"recorded ${counts(shard)}")
      require(x == xor(shard) && s == sum(shard),
        s"validateShardsContent: shard $shard content digest " +
          s"($x, $s) != manifest (${xor(shard)}, ${sum(shard)}) — " +
          "same-length corruption in a shard file")
    }
    // byte-checksum pass: catches corruption OUTSIDE decoded content.
    // Pre-filehash manifests (older exports) get digest-only validation
    // with a loud warning rather than a refusal — the digest pass above
    // already ran, matching what those exports were validated with when
    // written; rewriting or appending an epoch upgrades them.
    if (tree.get("filehash") == null || !tree.get("filehash").isObject) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"validateShardsContent: manifest at $dir predates per-file " +
          "checksums — byte-checksum pass SKIPPED (digest pass ran); " +
          "rewrite the export or append an epoch to gain byte-level " +
          "validation")
      return counts
    }
    val want = stringLongMap(tree, "filehash")
    val (hfs, root) = fs(spark, dir)
    val liveFiles = dataFileList(shardListing(hfs,
      hfs.listStatus(root).filter(st =>
        st.isDirectory && st.getPath.getName.startsWith(s"$shardCol=") &&
          !st.getPath.getName.endsWith("__HIVE_DEFAULT_PARTITION__")), shardCol))
    require(liveFiles.map(_._1).toSet == want.keySet,
      s"validateShardsContent: manifest checksums cover ${want.keySet.toSeq.sorted} " +
        s"but the export contains ${liveFiles.map(_._1).sorted}")
    val got = fileHashes(spark, liveFiles)
    for ((rel, h) <- got)
      require(h == want(rel),
        s"validateShardsContent: file $rel xxhash64 checksum $h != manifest " +
          s"${want(rel)} — byte corruption outside decoded content " +
          "(footer/statistics region)")
    counts
  }

  /** The export's parquet data files pinned to the CURRENT manifest's
    * per-file checksum map — reader snapshot isolation. A directory
    * listing is a moving target: a concurrent [[compactShards]] or
    * [[expireEpochs]] mid-swap leaves every shard directory transiently
    * empty (files parked under hidden names), and a plain
    * `spark.read.parquet(dir)` there silently returns missing rows while
    * the manifest still records full counts. A reader pinned to the
    * manifest's file list instead fails LOUDLY (the scan names the
    * missing file) — no silent short read, ever. None when the export
    * has no manifest, predates the `filehash` field, or is not parquet
    * (container formats read through their own CDX-gated readers). */
  private def pinnedParquetFiles(spark: SparkSession, dir: String,
                                 tree: com.fasterxml.jackson.databind.JsonNode)
      : Option[Seq[String]] = {
    val fmt = Option(tree.get("format")).map(_.asText).getOrElse("parquet")
    val fh = tree.get("filehash")
    if (fmt != "parquet" || fh == null || !fh.isObject) None
    else {
      val (hfs, root) = fs(spark, dir)
      val qroot = hfs.makeQualified(root)
      val names = fh.fieldNames()
      val b = Seq.newBuilder[String]
      while (names.hasNext) b += new Path(qroot, names.next()).toString
      Some(b.result().sorted)
    }
  }

  /** [[pinnedParquetFiles]] as a frame (partition column recovered via
    * basePath), or the plain directory read when the export cannot be
    * pinned. Empty pinned list (a committed 0-row export) falls back to
    * the directory read, which fails schema inference exactly as it
    * always did — a 0-row export is read via [[readManifest]] first. */
  private def pinnedOrDirFrame(spark: SparkSession, dir: String,
                               tree: com.fasterxml.jackson.databind.JsonNode)
      : DataFrame =
    pinnedParquetFiles(spark, dir, tree) match {
      case Some(files) if files.nonEmpty =>
        val (hfs, root) = fs(spark, dir)
        spark.read.option("basePath", hfs.makeQualified(root).toString)
          .parquet(files: _*)
      case _ => spark.read.parquet(dir)
    }

  /** Read only the named shards — the filter is on the partition column,
    * so the scan prunes to those directories (a loader rank reads exactly
    * the shards it owns). MANIFEST-PINNED: when the manifest carries the
    * per-file checksum map, exactly those files are read (see
    * [[pinnedParquetFiles]] — a concurrent compaction/expiry can make the
    * read refuse loudly, never return silently short); directory reads
    * remain only for manifest-less or pre-`filehash` dirs. */
  def readShards(spark: SparkSession, dir: String,
                 shards: Seq[Long], shardCol: String = "shard"): DataFrame = {
    val (hfs, root) = fs(spark, dir)
    val frame =
      if (hfs.exists(new Path(root, ManifestName)))
        pinnedOrDirFrame(spark, dir, manifestTree(spark, dir))
      else spark.read.parquet(dir)
    frame.filter(col(shardCol).isin(shards: _*))
  }

  /** The export's frame per its manifest `format` field: JSONL exports
    * read back under the manifest's recorded schema (JSON carries no
    * schema of its own — inference would both cost a scan and drift
    * types), parquet exports (or pre-`format` manifests) through the
    * parquet reader. The ONE loader behind every format-agnostic
    * content check. */
  private def exportFrame(spark: SparkSession, dir: String,
                          tree: com.fasterxml.jackson.databind.JsonNode,
                          shardCol: String): DataFrame = {
    val fmt = Option(tree.get("format")).map(_.asText).getOrElse("parquet")
    if (fmt == "jsonl") {
      val schema = Option(tree.get("schema")).map(_.asText).getOrElse(
        throw new IllegalArgumentException(
          s"jsonl manifest at $dir has no 'schema' field — cannot read " +
            "back without type drift"))
      jsonlFrame(spark, dir, schema, shardCol)
    } else if (fmt == "tar") {
      val ddl = Option(tree.get("schema")).map(_.asText).getOrElse(
        throw new IllegalArgumentException(
          s"tar manifest at $dir has no 'schema' field"))
      val binNode = tree.get("bincols")
      require(binNode != null && binNode.isArray,
        s"tar manifest at $dir has no 'bincols' array")
      val binCols = (0 until binNode.size).map(binNode.get(_).asText)
      val key = Option(tree.get("key")).map(_.asText).getOrElse("key")
      tarShardFrame(spark, dir, ddl, binCols, key, shardCol, Set.empty)
    } else if (fmt == "tfrecord") {
      val ddl = Option(tree.get("schema")).map(_.asText).getOrElse(
        throw new IllegalArgumentException(
          s"tfrecord manifest at $dir has no 'schema' field"))
      tfrecordShardFrame(spark, dir, ddl, shardCol, Set.empty)
    } else if (fmt == "warc") {
      val key = Option(tree.get("key")).map(_.asText).getOrElse("key")
      warcDigestFrame(spark, dir, key, shardCol)
    } else if (fmt == "wet") {
      val key = Option(tree.get("key")).map(_.asText).getOrElse("key")
      wetShardFrame(spark, dir, key, shardCol)
    } else pinnedOrDirFrame(spark, dir, tree)
  }

  /** JSONL shard directory as a DataFrame: the data columns under the
    * recorded DDL schema, the shard partition column typed long — an
    * explicit read schema, so no inference scan and no type drift
    * between writer and any later reader. */
  private def jsonlFrame(spark: SparkSession, dir: String,
                         ddl: String, shardCol: String): DataFrame = {
    val data = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    require(!data.fieldNames.contains(shardCol),
      s"jsonl schema must not contain the shard column '$shardCol'")
    spark.read.schema(data.add(shardCol, LongType)).json(dir)
  }

  /** JSONL training-shard export — the [[writeShards]] contract on the
    * format actual dataloaders consume: `df` partitioned by `shardCol`
    * into `shard=N/part-*.json[.gz]` line-delimited JSON files, plus the
    * SAME manifest (per-shard row counts, byte/file stats, order-invariant
    * content digests recounted from the WRITTEN files, per-file streamed
    * xxhash64 checksums) extended with `format: "jsonl"`, the compression
    * codec, and the data-column DDL schema — so [[validateShards]] /
    * [[validateShardsContent]] / [[readJsonlShards]] all work over it
    * unchanged and schema round-trips without inference. Gzip is the
    * default (the dataloader-standard framing: each part file one gzip
    * member, concatenation-safe); pass `"none"` for plain `.json`.
    * Overwrite-only — epoch append is a parquet-path feature
    * ([[appendShards]]); a JSONL export is a terminal artifact, re-export
    * to change it. */
  def writeJsonlShards(df: DataFrame, dir: String,
                       shardCol: String = "shard",
                       compression: String = "gzip"): Map[Long, Long] = {
    require(df.columns.contains(shardCol),
      s"writeJsonlShards needs a '$shardCol' column; got ${df.columns.mkString(",")}")
    require(
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(shardCol).dataType),
      s"writeJsonlShards needs an integral '$shardCol' column; got " +
        df.schema(shardCol).dataType.simpleString)
    val ddl = org.apache.spark.sql.types.StructType(
      df.schema.filter(_.name != shardCol)).toDDL
    df.write.mode(SaveMode.Overwrite).partitionBy(shardCol)
      .option("compression", compression).json(dir)
    publishManifest(df.sparkSession, dir, shardCol, "writeJsonlShards",
      d => jsonlFrame(df.sparkSession, d, ddl, shardCol),
      epochs = Set.empty, priorHashes = Map.empty,
      extra = Seq(
        "format" -> "\"jsonl\"",
        "compression" ->
          com.fasterxml.jackson.databind.node.TextNode.valueOf(compression)
            .toString,
        "schema" ->
          com.fasterxml.jackson.databind.node.TextNode.valueOf(ddl).toString))
  }

  /** Read named shards of a JSONL export (all shards when `shards` is
    * empty) under the manifest's recorded schema — the [[readShards]]
    * contract for the JSONL format. The shard filter is on the partition
    * column, so the scan prunes to those directories. */
  def readJsonlShards(spark: SparkSession, dir: String,
                      shards: Seq[Long] = Nil,
                      shardCol: String = "shard"): DataFrame = {
    val frame = exportFrame(spark, dir, manifestTree(spark, dir), shardCol)
    if (shards.isEmpty) frame else frame.filter(col(shardCol).isin(shards: _*))
  }

  // ── WebDataset-style tar shards ────────────────────────────────────────

  /** One POSIX ustar header block (512 bytes) for a regular file member.
    * Every field a reader could vary on is pinned for determinism: mode
    * 0644, uid/gid 0, mtime 0, empty uname/gname, zero dev numbers — so
    * byte-identical input rows produce a byte-identical archive and the
    * manifest's file checksums are reproducible. Member names are capped
    * at the ustar 100-byte name field (no prefix-field splitting — a
    * sample key long enough to need it is refused at write). */
  private def tarHeader(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    require(nameB.length <= 100,
      s"tar member name '$name' exceeds the ustar 100-byte name field")
    require(size >= 0 && size <= 0x1FFFFFFFFFFL, // 11 octal digits
      s"tar member '$name' size $size outside the ustar 12-byte size field")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, h, off, b.length)
    }
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    put(100, "0000644\u0000") // mode
    put(108, "0000000\u0000") // uid
    put(116, "0000000\u0000") // gid
    put(124, f"$size%011o\u0000") // size
    put(136, "00000000000\u0000") // mtime
    put(148, "        ") // chksum placeholder: 8 spaces during the sum
    h(156) = '0' // typeflag: regular file
    put(257, "ustar\u0000") // magic
    put(263, "00") // version
    put(329, "0000000\u0000") // devmajor
    put(337, "0000000\u0000") // devminor
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    put(148, f"$sum%06o\u0000 ") // 6 octal digits, NUL, space (POSIX form)
    h
  }

  private def writeTarMember(out: java.io.OutputStream, name: String,
                             bytes: Array[Byte]): Unit = {
    out.write(tarHeader(name, bytes.length.toLong))
    out.write(bytes)
    val pad = (512 - (bytes.length % 512)) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** WebDataset-style tar training shards — the [[writeShards]] contract on
    * the sequential-read format multimodal dataloaders consume: each row is
    * one SAMPLE, written as a group of adjacent tar members sharing the
    * row's `keyCol` basename — `<key>.json` carrying every non-binary data
    * column as one JSON object, plus one raw `<key>.<column>` member per
    * binary column (the image/audio/video payload path; a null binary
    * writes no member and reads back null). One archive per shard at
    * `shard=N/part-00000.tar[.gz|.zst]` (compression `"none"` — the
    * WebDataset default, tar member framing already gives sequential IO —
    * `"gzip"`, or `"zstd"` via the zstd-jni codec Spark itself ships;
    * zstd is the usual pick for modern shard stores: ~gzip-class ratios
    * at several× the decode speed), members key-sorted within the shard and
    * every header field pinned ([[tarHeader]]) so the bytes are a pure
    * function of the rows. The SAME manifest follows (per-shard row counts,
    * byte/file stats, content digests recounted from the WRITTEN archives
    * via a full decode pass, per-file streamed xxhash64) extended with
    * `format: "tar"`, the compression codec, the recorded non-binary DDL
    * schema, the binary column list, and the key column name — so
    * [[validateShards]]/[[validateShardsContent]]/[[readTarShards]] work
    * over it unchanged and the round trip never infers anything. Keys must
    * be non-empty, dot/slash/NUL-free (WebDataset splits the sample key at
    * the first dot) and unique within their shard (checked against the
    * sorted stream — free); a violation fails the write, not the reader.
    * Overwrite-only, like [[writeJsonlShards]]: a tar export is a terminal
    * artifact. Each shard's archive is written by exactly ONE task (rows
    * hash-partitioned by shard, archives streamed member-by-member — no
    * per-shard materialization), landed via a hidden temp name + rename so
    * a task retry replaces rather than corrupts. */
  def writeTarShards(df: DataFrame, dir: String,
                     keyCol: String = "key",
                     shardCol: String = "shard",
                     compression: String = "none"): Map[Long, Long] = {
    val spark = df.sparkSession
    require(compression == "none" || compression == "gzip" ||
      compression == "zstd",
      s"writeTarShards compression must be none|gzip|zstd, got '$compression'")
    require(df.columns.contains(shardCol) && df.columns.contains(keyCol),
      s"writeTarShards needs '$shardCol' and '$keyCol' columns; got " +
        df.columns.mkString(","))
    require(
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(shardCol).dataType),
      s"writeTarShards needs an integral '$shardCol' column; got " +
        df.schema(shardCol).dataType.simpleString)
    require(df.schema(keyCol).dataType == StringType,
      s"writeTarShards needs a string '$keyCol' column; got " +
        df.schema(keyCol).dataType.simpleString)
    val binCols = df.schema.fields
      .filter(f => f.name != keyCol && f.name != shardCol &&
        f.dataType == BinaryType).map(_.name).toSeq
    require(!binCols.contains("json"),
      "writeTarShards: a binary column named 'json' collides with the " +
        "sample's JSON member extension — rename it")
    val dataCols = df.schema.fields
      .filter(f => f.name != keyCol && f.name != shardCol &&
        f.dataType != BinaryType).map(_.name).toSeq
    val ddl = org.apache.spark.sql.types.StructType(
      df.schema.filter(f => dataCols.contains(f.name))).toDDL
    val sels =
      Seq(col(shardCol).cast("long").as("__shard"), col(keyCol).as("__key")) ++
        (if (dataCols.nonEmpty)
          Seq(to_json(struct(dataCols.map(col): _*)).as("__json"))
        else Nil) ++ binCols.map(col)
    val hasJson = dataCols.nonEmpty
    val nBin = binCols.length
    val (hfs, root) = fs(spark, dir)
    if (hfs.exists(root)) hfs.delete(root, true)
    hfs.mkdirs(root)
    val rootUri = hfs.makeQualified(root).toString
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val fileName = compression match {
      case "gzip" => "part-00000.tar.gz"
      case "zstd" => "part-00000.tar.zst"
      case _      => "part-00000.tar"
    }
    val shardColName = shardCol
    df.select(sels: _*)
      .repartition(col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__key"))
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = confB.value.value
        val rootP = new Path(rootUri)
        val tfs = rootP.getFileSystem(conf)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var shard = Long.MinValue
        var lastKey: String = null
        var raw: org.apache.hadoop.fs.FSDataOutputStream = null
        var out: java.io.OutputStream = null
        var tmp: Path = null
        var fin: Path = null
        def closeCurrent(): Unit = if (out != null) {
          out.write(new Array[Byte](1024)) // end-of-archive marker
          out.close(); raw = null; out = null
          // First-committer-wins, never delete-then-rename: a duplicate
          // (speculative/zombie) attempt must not un-commit the attempt
          // that already renamed — archives are deterministic (same
          // sorted rows, fixed member metadata), so an existing
          // destination IS this archive and losing the race is success.
          if (!tfs.rename(tmp, fin)) {
            require(tfs.exists(fin),
              s"writeTarShards: could not move $tmp into place at $fin")
            tfs.delete(tmp, false)
          }
        }
        try {
          it.foreach { row =>
            val s = row.getLong(0)
            val key = row.getString(1)
            require(key != null && key.nonEmpty &&
              !key.exists(c => c == '.' || c == '/' || c == '\u0000'),
              s"writeTarShards: sample key '$key' in shard $s must be " +
                "non-empty and dot/slash/NUL-free (WebDataset splits the " +
                "key at the first dot)")
            if (s != shard) {
              closeCurrent()
              shard = s; lastKey = null
              val sdir = new Path(rootP, s"$shardColName=$s")
              tfs.mkdirs(sdir)
              fin = new Path(sdir, fileName)
              tmp = new Path(sdir, s".$fileName.inprogress-$attempt")
              raw = tfs.create(tmp, true)
              out = compression match {
                case "gzip" => new java.util.zip.GZIPOutputStream(raw)
                case "zstd" => new com.github.luben.zstd.ZstdOutputStream(raw)
                case _      => raw
              }
            }
            require(key != lastKey,
              s"writeTarShards: duplicate sample key '$key' in shard $s — " +
                "keys must be unique within their shard")
            lastKey = key
            if (hasJson)
              writeTarMember(out, s"$key.json",
                row.getString(2).getBytes("UTF-8"))
            var b = 0
            while (b < nBin) {
              val bytes = row.get((if (hasJson) 3 else 2) + b)
              if (bytes != null)
                writeTarMember(out, s"$key.${binCols(b)}",
                  bytes.asInstanceOf[Array[Byte]])
              b += 1
            }
          }
          closeCurrent()
        } finally if (out != null) { out.close(); tfs.delete(tmp, false) }
      }
    def q(s: String): String =
      com.fasterxml.jackson.databind.node.TextNode.valueOf(s).toString
    publishManifest(spark, dir, shardCol, "writeTarShards",
      d => tarShardFrame(spark, d, ddl, binCols, keyCol, shardCol),
      epochs = Set.empty, priorHashes = Map.empty,
      extra = Seq(
        "format" -> "\"tar\"",
        "compression" -> q(compression),
        "schema" -> q(if (hasJson) ddl else ""),
        "bincols" -> binCols.map(q).mkString("[", ", ", "]"),
        "key" -> q(keyCol)))
  }

  /** Consume and discard `n` stream bytes. `skip` on a decompressing
    * stream discards decompressed output without allocating it; on a raw
    * filesystem stream it seeks — either way a pruned member costs no
    * buffer. A short skip falls back to single-byte reads (skip(0) is a
    * legal return). */
  private def skipFully(in: java.io.InputStream, n: Long,
                        what: String): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else {
        val r = in.read()
        require(r >= 0, s"corrupt tar: EOF inside $what")
        left -= 1
      }
    }
  }

  /** Consecutive tar members grouped into samples by their basename key
    * (the segment before the first dot): each element is (key, ext →
    * bytes). Streams one member at a time — memory is one member, never
    * one archive — and members whose EXTENSION fails `keep` are skipped
    * without allocation ([[skipFully]]): the column-pruned read path for
    * multimodal shards, where the metadata scan must not decode the
    * payload members. A short header or a declared size overrunning the
    * stream throws (corrupt archive); clean EOF or a zero header block
    * ends the walk. */
  private def tarSamples(in: java.io.InputStream,
                         keep: String => Boolean = _ => true)
      : Iterator[(String, Map[String, Array[Byte]])] =
    new scala.collection.AbstractIterator[(String, Map[String, Array[Byte]])] {
      private val hdr = new Array[Byte](512)
      private var pendingName: String = null
      private var pendingExt: String = null
      private var pendingBytes: Array[Byte] = null // null when skipped
      private var done = false
      private def readFullyOpt(buf: Array[Byte], len: Int): Boolean = {
        var filled = 0
        while (filled < len) {
          val n = in.read(buf, filled, len - filled)
          if (n < 0) {
            require(filled == 0,
              s"corrupt tar: EOF inside a ${len}-byte block after $filled bytes")
            return false
          }
          filled += n
        }
        true
      }
      // loads the next member into pending*; false at end of archive
      private def nextMember(): Boolean = {
        if (done) return false
        if (!readFullyOpt(hdr, 512)) { done = true; return false }
        if (hdr.forall(_ == 0)) { done = true; return false }
        var e = 0
        while (e < 100 && hdr(e) != 0) e += 1
        val name = new String(hdr, 0, e, "UTF-8")
        val sizeStr = new String(hdr, 124, 12, "US-ASCII")
          .takeWhile(c => c >= '0' && c <= '7')
        require(name.nonEmpty && sizeStr.nonEmpty,
          "corrupt tar: empty member name or size field")
        val size = java.lang.Long.parseLong(sizeStr, 8)
        require(size <= Int.MaxValue.toLong,
          s"tar member '$name' of $size bytes exceeds the 2 GiB member cap")
        val dot = name.indexOf('.')
        require(dot > 0, s"tar member '$name' has no .ext — not a " +
          "writeTarShards archive")
        val ext = name.substring(dot + 1)
        val total = (size + 511) / 512 * 512 // payload + padding
        if (keep(ext)) {
          val bytes = new Array[Byte](size.toInt)
          require(readFullyOpt(bytes, size.toInt) || size == 0,
            s"corrupt tar: EOF inside member '$name'")
          val pad = (total - size).toInt
          if (pad > 0) {
            val scratch = new Array[Byte](pad)
            require(readFullyOpt(scratch, pad),
              s"corrupt tar: EOF inside padding after member '$name'")
          }
          pendingBytes = bytes
        } else {
          skipFully(in, total, s"member '$name'")
          pendingBytes = null
        }
        pendingName = name.substring(0, dot); pendingExt = ext
        true
      }
      private var started = false
      override def hasNext: Boolean = {
        if (!started) { started = true; nextMember() }
        pendingName != null
      }
      override def next(): (String, Map[String, Array[Byte]]) = {
        if (!hasNext) throw new NoSuchElementException("end of archive")
        val key = pendingName
        var members = Map.empty[String, Array[Byte]]
        if (pendingBytes != null) members += pendingExt -> pendingBytes
        pendingName = null; pendingExt = null; pendingBytes = null
        var more = nextMember()
        while (more) {
          if (pendingName != key) more = false
          else {
            if (pendingBytes != null) members += pendingExt -> pendingBytes
            pendingName = null; pendingExt = null; pendingBytes = null
            more = nextMember()
          }
        }
        (key, members)
      }
    }

  /** Tar shard directory as a DataFrame: one row per sample — the key
    * column, the non-binary data columns parsed from each sample's `.json`
    * member under the recorded DDL (no inference), the binary columns from
    * their raw members (absent member → null), the shard from the
    * directory identity. Archives are STREAMED via the filesystem API (one
    * executor task per archive, one member in memory at a time) — no
    * binaryFile 2 GiB ceiling. A non-empty `wanted` prunes at the MEMBER
    * level: unrequested binary payloads (and the `.json` member, when no
    * data column is requested) are skipped in the stream without
    * allocation — the metadata-scan path for multimodal shards. */
  private def tarShardFrame(spark: SparkSession, dir: String,
                            ddl: String, binCols: Seq[String],
                            keyCol: String, shardCol: String,
                            only: Set[Long] = Set.empty,
                            wanted: Set[String] = Set.empty): DataFrame = {
    import spark.implicits._
    val (hfs, root) = fs(spark, dir)
    val files = dataFileList(shardListing(hfs,
      hfs.listStatus(root).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$shardCol=") &&
        !st.getPath.getName.endsWith("__HIVE_DEFAULT_PARTITION__")),
      shardCol))
      .map { case (rel, p) =>
        (rel.stripPrefix(s"$shardCol=").takeWhile(_ != '/').toLong,
          hfs.makeQualified(p).toString)
      }
      .filter { case (shard, _) => only.isEmpty || only.contains(shard) }
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val dataNames =
      if (ddl.nonEmpty)
        org.apache.spark.sql.types.StructType.fromDDL(ddl).fieldNames.toSeq
      else Nil
    if (wanted.nonEmpty) {
      val legal = Set(keyCol, shardCol) ++ dataNames ++ binCols
      val unknown = wanted -- legal
      require(unknown.isEmpty,
        s"readTarShards: unknown columns ${unknown.mkString(",")}; " +
          s"export has ${legal.mkString(",")}")
    }
    val hasJson = ddl.nonEmpty &&
      (wanted.isEmpty || dataNames.exists(wanted))
    val bins =
      if (wanted.isEmpty) binCols else binCols.filter(wanted)
    val keepExt: String => Boolean =
      if (wanted.isEmpty) _ => true
      else { val b = bins.toSet; e => (e == "json" && hasJson) || b(e) }
    val rows = spark.createDataset(files)
      .repartition(readTasks(spark, files.size))
      .flatMap { case (shard, uri) =>
        val p = new Path(uri)
        val rawIn = p.getFileSystem(confB.value.value).open(p)
        val in: java.io.InputStream =
          if (uri.endsWith(".gz")) new java.util.zip.GZIPInputStream(rawIn)
          else if (uri.endsWith(".zst"))
            new com.github.luben.zstd.ZstdInputStream(rawIn)
          else rawIn
        // close on task completion, not only on iterator exhaustion: a
        // partially-consumed scan (limit/take/early abort) never drains
        // the iterator, and an unclosed zstd/gzip stream pins native
        // resources for the executor's lifetime
        new Iterator[(String, Option[String], Seq[Array[Byte]], Long)] {
          private val it = tarSamples(in, keepExt)
          private var closed = false
          private def closeOnce(): Unit =
            if (!closed) { closed = true; try in.close() finally () }
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) closeOnce()
            h
          }
          override def next(): (String, Option[String], Seq[Array[Byte]], Long) = {
            val (key, members) = it.next()
            (key,
              if (hasJson) Some(new String(
                members.getOrElse("json", Array.emptyByteArray), "UTF-8"))
              else None,
              bins.map(c => members.get(c).orNull),
              shard)
          }
        }
      }
      .toDF("__key", "__json", "__bins", "__shard")
    val dataSel: Seq[Column] =
      if (hasJson) {
        val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
        require(!schema.fieldNames.contains(keyCol) &&
          !schema.fieldNames.contains(shardCol),
          s"tar manifest schema must not contain '$keyCol'/'$shardCol'")
        schema.fieldNames.toSeq
          .filter(f => wanted.isEmpty || wanted(f))
          .map(f => from_json(col("__json"), schema).getField(f).as(f))
      } else Nil
    val binSel = bins.zipWithIndex.map { case (c, i) =>
      col("__bins").getItem(i).as(c)
    }
    rows.select(
      (col("__key").as(keyCol) +: dataSel) ++ binSel :+
        col("__shard").as(shardCol): _*)
  }

  /** Read named shards of a tar export (all shards when `shards` is empty)
    * under the manifest's recorded schema and column lists — the
    * [[readShards]] contract for the WebDataset-style format. Only the
    * named shards' archives are opened, and a non-empty `columns` prunes
    * at the tar-MEMBER level: unrequested binary payloads are skipped in
    * the stream without allocation (and the `.json` member isn't parsed
    * when no data column is requested) — so a metadata scan over a
    * multimodal shard store never decodes the image/audio/video bytes.
    * The key and shard columns are identity and always present. */
  def readTarShards(spark: SparkSession, dir: String,
                    shards: Seq[Long] = Nil,
                    shardCol: String = "shard",
                    columns: Seq[String] = Nil): DataFrame = {
    val tree = manifestTree(spark, dir)
    require(Option(tree.get("format")).map(_.asText).contains("tar"),
      s"manifest at $dir is not a writeTarShards export")
    val ddl = Option(tree.get("schema")).map(_.asText).getOrElse(
      throw new IllegalArgumentException(
        s"tar manifest at $dir has no 'schema' field"))
    val binNode = tree.get("bincols")
    require(binNode != null && binNode.isArray,
      s"tar manifest at $dir has no 'bincols' array")
    val binCols = (0 until binNode.size).map(binNode.get(_).asText)
    val key = Option(tree.get("key")).map(_.asText).getOrElse("key")
    // prune at the FILE LIST, not post-hoc: only the named shards'
    // archives are ever opened
    tarShardFrame(spark, dir, ddl, binCols, key, shardCol, shards.toSet,
      columns.toSet)
  }

  // ── TFRecord shards ────────────────────────────────────────────────────

  /** TFRecord's masked CRC32C (the public framing spec):
    * `((crc >> 15) | (crc << 17)) + 0xa282ead8` over the unsigned 32-bit
    * ring — computed with the JDK's CRC32C (Castagnoli), the same
    * polynomial TensorFlow uses. */
  private[ext] def maskedCrc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt // low 32 bits
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  /** Unsigned LEB128 varint — the protobuf integer wire form. */
  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def lenDelimited(out: java.io.ByteArrayOutputStream, tag: Int,
                           body: Array[Byte]): Unit = {
    out.write(tag); writeVarint(out, body.length.toLong); out.write(body)
  }

  /** The column ↔ tf.train.Feature mapping [[writeTfrecordShards]] accepts.
    * FloatList is float32 by the proto definition, so DoubleType is
    * REFUSED rather than silently narrowed; everything else integral rides
    * Int64List (bool as 0/1), strings/binary ride BytesList, and
    * float/long/int arrays ride the packed list forms. */
  private def tfSupported(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case StringType | BinaryType | LongType | IntegerType | ShortType |
           ByteType | BooleanType | FloatType => true
      case org.apache.spark.sql.types.ArrayType(LongType, _) |
           org.apache.spark.sql.types.ArrayType(IntegerType, _) |
           org.apache.spark.sql.types.ArrayType(FloatType, _) => true
      case _ => false
    }

  /** One tf.train.Feature message for a non-null value of `dt`. */
  private def tfFeature(dt: org.apache.spark.sql.types.DataType,
                        v: Any): Array[Byte] = {
    val list = new java.io.ByteArrayOutputStream()
    def packInt64(vs: Seq[Long]): Unit = {
      val packed = new java.io.ByteArrayOutputStream()
      vs.foreach(writeVarint(packed, _))
      lenDelimited(list, 0x0A, packed.toByteArray)
    }
    def packFloat(vs: Seq[Float]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putFloat)
      lenDelimited(list, 0x0A, bb.array())
    }
    val kindTag = dt match {
      case StringType =>
        lenDelimited(list, 0x0A, v.asInstanceOf[String].getBytes("UTF-8")); 0x0A
      case BinaryType =>
        lenDelimited(list, 0x0A, v.asInstanceOf[Array[Byte]]); 0x0A
      case LongType => packInt64(Seq(v.asInstanceOf[Long])); 0x1A
      case IntegerType => packInt64(Seq(v.asInstanceOf[Int].toLong)); 0x1A
      case ShortType => packInt64(Seq(v.asInstanceOf[Short].toLong)); 0x1A
      case ByteType => packInt64(Seq(v.asInstanceOf[Byte].toLong)); 0x1A
      case BooleanType =>
        packInt64(Seq(if (v.asInstanceOf[Boolean]) 1L else 0L)); 0x1A
      case FloatType => packFloat(Seq(v.asInstanceOf[Float])); 0x12
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        packInt64(v.asInstanceOf[scala.collection.Seq[Long]].toSeq); 0x1A
      case org.apache.spark.sql.types.ArrayType(IntegerType, _) =>
        packInt64(v.asInstanceOf[scala.collection.Seq[Int]].toSeq
          .map(_.toLong)); 0x1A
      case org.apache.spark.sql.types.ArrayType(FloatType, _) =>
        packFloat(v.asInstanceOf[scala.collection.Seq[Float]].toSeq); 0x12
      case other => throw new IllegalArgumentException(
        s"unsupported TFRecord column type ${other.simpleString}")
    }
    val feature = new java.io.ByteArrayOutputStream()
    lenDelimited(feature, kindTag, list.toByteArray)
    feature.toByteArray
  }

  /** One serialized tf.train.Example for a row: `features` (field 1)
    * holding one map entry per NON-NULL column, entries in sorted column
    * order so the bytes are a pure function of the row (protobuf map order
    * is unspecified — pinning it is what makes the file hashable). */
  private def tfExample(fields: Seq[(String, org.apache.spark.sql.types.DataType)],
                        row: Row, off: Int): Array[Byte] = {
    val features = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < fields.length) {
      val v = row.get(off + i)
      if (v != null) {
        val entry = new java.io.ByteArrayOutputStream()
        lenDelimited(entry, 0x0A, fields(i)._1.getBytes("UTF-8")) // key
        lenDelimited(entry, 0x12, tfFeature(fields(i)._2, v)) // value
        lenDelimited(features, 0x0A, entry.toByteArray)
      }
      i += 1
    }
    val example = new java.io.ByteArrayOutputStream()
    lenDelimited(example, 0x0A, features.toByteArray)
    example.toByteArray
  }

  /** TFRecord training shards — the [[writeShards]] contract on the
    * TensorFlow dataloader format: each row one `tf.train.Example` record
    * framed per the public TFRecord spec (little-endian uint64 length +
    * masked CRC32C of the length bytes + payload + masked CRC32C of the
    * payload — both checksums verified on every read), one file per shard
    * at `shard=N/part-00000.tfrecord[.gz|.zst]` written by exactly ONE
    * task, rows sorted within the shard and feature-map entries sorted by
    * column name so the bytes are a pure function of the rows, landed
    * temp+rename. Column mapping: string/binary → BytesList, integrals and
    * bool → Int64List, float and float/long/int arrays → packed
    * FloatList/Int64List; DoubleType is REFUSED (FloatList is float32 —
    * narrowing silently would corrupt values); a null writes no feature
    * and reads back null, an EMPTY array writes an empty list message
    * (present ≠ null). The SAME manifest follows (per-shard row counts,
    * byte/file stats, order-invariant content digests recounted from the
    * WRITTEN files via a full decode pass, per-file streamed xxhash64)
    * extended with `format: "tfrecord"`, the compression codec, and the
    * data-column DDL schema — so [[validateShards]] /
    * [[validateShardsContent]] / [[readTfrecordShards]] work over it
    * unchanged and reads never infer. Overwrite-only, like the other
    * terminal-artifact formats. */
  def writeTfrecordShards(df: DataFrame, dir: String,
                          shardCol: String = "shard",
                          compression: String = "none"): Map[Long, Long] = {
    val spark = df.sparkSession
    require(compression == "none" || compression == "gzip" ||
      compression == "zstd",
      s"writeTfrecordShards compression must be none|gzip|zstd, got " +
        s"'$compression'")
    require(df.columns.contains(shardCol),
      s"writeTfrecordShards needs a '$shardCol' column; got " +
        df.columns.mkString(","))
    require(
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(shardCol).dataType),
      s"writeTfrecordShards needs an integral '$shardCol' column; got " +
        df.schema(shardCol).dataType.simpleString)
    val dataFields = df.schema.fields.filter(_.name != shardCol)
      .sortBy(_.name).toSeq
    dataFields.foreach(f => require(tfSupported(f.dataType),
      s"writeTfrecordShards: column '${f.name}' has unsupported type " +
        s"${f.dataType.simpleString} (tf.train.Example carries bytes, " +
        "int64, and float32 lists; cast doubles explicitly if float32 " +
        "precision is acceptable)"))
    val ddl = org.apache.spark.sql.types.StructType(dataFields).toDDL
    val fields = dataFields.map(f => (f.name, f.dataType))
    val (hfs, root) = fs(spark, dir)
    if (hfs.exists(root)) hfs.delete(root, true)
    hfs.mkdirs(root)
    val rootUri = hfs.makeQualified(root).toString
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val fileName = compression match {
      case "gzip" => "part-00000.tfrecord.gz"
      case "zstd" => "part-00000.tfrecord.zst"
      case _      => "part-00000.tfrecord"
    }
    val shardColName = shardCol
    val sortCols = col("__shard") +: fields.map(f => col(f._1))
    df.select(col(shardCol).cast("long").as("__shard") +:
        fields.map(f => col(f._1)): _*)
      .repartition(col("__shard"))
      .sortWithinPartitions(sortCols: _*)
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = confB.value.value
        val rootP = new Path(rootUri)
        val tfs = rootP.getFileSystem(conf)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var shard = Long.MinValue
        var out: java.io.OutputStream = null
        var tmp: Path = null
        var fin: Path = null
        def closeCurrent(): Unit = if (out != null) {
          out.close(); out = null
          // First-committer-wins (see writeTarShards.closeCurrent): never
          // delete an existing destination; losing the rename race to a
          // duplicate attempt is success because shard files are
          // deterministic functions of the sorted partition.
          if (!tfs.rename(tmp, fin)) {
            require(tfs.exists(fin),
              s"writeTfrecordShards: could not move $tmp into place at $fin")
            tfs.delete(tmp, false)
          }
        }
        try {
          it.foreach { row =>
            val s = row.getLong(0)
            if (s != shard) {
              closeCurrent()
              shard = s
              val sdir = new Path(rootP, s"$shardColName=$s")
              tfs.mkdirs(sdir)
              fin = new Path(sdir, fileName)
              tmp = new Path(sdir, s".$fileName.inprogress-$attempt")
              val raw = tfs.create(tmp, true)
              out = compression match {
                case "gzip" => new java.util.zip.GZIPOutputStream(raw)
                case "zstd" => new com.github.luben.zstd.ZstdOutputStream(raw)
                case _      => raw
              }
            }
            val payload = tfExample(fields, row, 1)
            val lenB = java.nio.ByteBuffer.allocate(8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              .putLong(payload.length.toLong).array()
            val word = java.nio.ByteBuffer.allocate(4)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            out.write(lenB)
            out.write(word.putInt(maskedCrc32c(lenB, 0, 8)).array()); word.clear()
            out.write(payload)
            out.write(word.putInt(
              maskedCrc32c(payload, 0, payload.length)).array())
          }
          closeCurrent()
        } finally if (out != null) { out.close(); tfs.delete(tmp, false) }
      }
    def q(s: String): String =
      com.fasterxml.jackson.databind.node.TextNode.valueOf(s).toString
    publishManifest(spark, dir, shardCol, "writeTfrecordShards",
      d => tfrecordShardFrame(spark, d, ddl, shardCol),
      epochs = Set.empty, priorHashes = Map.empty,
      extra = Seq(
        "format" -> "\"tfrecord\"",
        "compression" -> q(compression),
        "schema" -> q(ddl)))
  }

  /** Framed records off a TFRecord stream, both masked CRC32Cs verified
    * per record — a flipped byte anywhere in length, payload, or either
    * checksum fails the read. Streams one record at a time. */
  private def tfrecordRecords(in: java.io.InputStream): Iterator[Array[Byte]] =
    new scala.collection.AbstractIterator[Array[Byte]] {
      private val head = new Array[Byte](12)
      private var pending: Array[Byte] = null
      private var done = false
      private def readFullyOpt(buf: Array[Byte], off: Int, len: Int): Boolean = {
        var filled = 0
        while (filled < len) {
          val n = in.read(buf, off + filled, len - filled)
          if (n < 0) {
            require(filled == 0,
              s"corrupt tfrecord: EOF inside a $len-byte read after $filled")
            return false
          }
          filled += n
        }
        true
      }
      private def advance(): Unit = {
        if (done) return
        if (!readFullyOpt(head, 0, 12)) { done = true; return }
        val bb = java.nio.ByteBuffer.wrap(head)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val len = bb.getLong
        require(maskedCrc32c(head, 0, 8) == bb.getInt,
          "corrupt tfrecord: length checksum mismatch")
        require(len >= 0 && len <= Int.MaxValue.toLong,
          s"tfrecord record of $len bytes exceeds the 2 GiB record cap")
        val payload = new Array[Byte](len.toInt + 4)
        require(readFullyOpt(payload, 0, len.toInt + 4),
          "corrupt tfrecord: EOF inside a record")
        val crc = java.nio.ByteBuffer.wrap(payload, len.toInt, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        require(maskedCrc32c(payload, 0, len.toInt) == crc,
          "corrupt tfrecord: payload checksum mismatch")
        pending = java.util.Arrays.copyOf(payload, len.toInt)
      }
      private var started = false
      override def hasNext: Boolean = {
        if (!started) { started = true; advance() }
        pending != null
      }
      override def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException("end of tfrecord file")
        val r = pending; pending = null; advance(); r
      }
    }

  /** Minimal strict protobuf walk of one tf.train.Example: column name →
    * (kind tag, list payload bytes). Only the shapes [[tfExample]] writes
    * are accepted — an unknown field number or wire type fails loudly
    * (these files are this writer's own; leniency would mask corruption
    * the checksums happened to miss). */
  private def tfParseExample(payload: Array[Byte])
      : Map[String, (Int, Array[Byte])] = {
    def varint(b: Array[Byte], p0: Int): (Long, Int) = {
      var p = p0; var shift = 0; var v = 0L
      while ({
        require(p < b.length, "corrupt proto: varint overruns buffer")
        val x = b(p); p += 1
        v |= (x & 0x7FL) << shift; shift += 7
        (x & 0x80) != 0
      }) ()
      (v, p)
    }
    def field(b: Array[Byte], p0: Int): (Int, Array[Byte], Int) = {
      val (tag, p1) = varint(b, p0)
      require((tag & 7L) == 2L, s"corrupt proto: unexpected wire type $tag")
      val (len, p2) = varint(b, p1)
      require(p2 + len <= b.length, "corrupt proto: field overruns buffer")
      (tag.toInt, java.util.Arrays.copyOfRange(b, p2, p2 + len.toInt),
        p2 + len.toInt)
    }
    val (exTag, features, exEnd) = field(payload, 0)
    require(exTag == 0x0A && exEnd == payload.length,
      "corrupt proto: not a single-features Example")
    var entries = Map.empty[String, (Int, Array[Byte])]
    var p = 0
    while (p < features.length) {
      val (eTag, entry, p2) = field(features, p)
      require(eTag == 0x0A, s"corrupt proto: unexpected Features field $eTag")
      p = p2
      val (kTag, keyB, kEnd) = field(entry, 0)
      require(kTag == 0x0A, "corrupt proto: map entry key missing")
      val (vTag, feature, vEnd) = field(entry, kEnd)
      require(vTag == 0x12 && vEnd == entry.length,
        "corrupt proto: map entry value missing")
      val (kindTag, list, fEnd) = field(feature, 0)
      require(fEnd == feature.length &&
        (kindTag == 0x0A || kindTag == 0x12 || kindTag == 0x1A),
        s"corrupt proto: unexpected Feature kind $kindTag")
      entries += new String(keyB, "UTF-8") -> ((kindTag, list))
    }
    entries
  }

  /** One column value off a parsed feature, coerced to `dt`; `None` kind
    * (absent key) is handled by the caller as null. */
  private def tfValue(dt: org.apache.spark.sql.types.DataType,
                      kindTag: Int, list: Array[Byte]): Any = {
    def varints(b: Array[Byte]): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var p = 0
      while (p < b.length) {
        var shift = 0; var v = 0L
        while ({
          val x = b(p); p += 1
          v |= (x & 0x7FL) << shift; shift += 7
          (x & 0x80) != 0
        }) ()
        out += v
      }
      out.toSeq
    }
    def packedOf(expectTag: Int): Array[Byte] = {
      require(kindTag == expectTag,
        s"tfrecord column kind $kindTag does not match schema type " +
          dt.simpleString)
      if (list.isEmpty) Array.emptyByteArray
      else {
        // list message: field 1, len-delimited packed payload (or repeated
        // bytes for BytesList — same framing)
        var p = 0
        require(list(p) == 0x0A, "corrupt proto: list payload tag")
        p += 1
        var shift = 0; var len = 0L
        while ({
          val x = list(p); p += 1
          len |= (x & 0x7FL) << shift; shift += 7
          (x & 0x80) != 0
        }) ()
        require(p + len == list.length,
          "corrupt proto: packed list length mismatch")
        java.util.Arrays.copyOfRange(list, p, list.length)
      }
    }
    def floats: Seq[Float] = {
      val b = packedOf(0x12)
      val bb = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Seq.fill(b.length / 4)(bb.getFloat)
    }
    def int64s: Seq[Long] = varints(packedOf(0x1A))
    def one[T](vs: Seq[T]): T = {
      require(vs.length == 1,
        s"tfrecord scalar column carries ${vs.length} values")
      vs.head
    }
    dt match {
      case StringType => new String(one(Seq(packedOf(0x0A))), "UTF-8")
      case BinaryType => one(Seq(packedOf(0x0A)))
      case LongType => one(int64s)
      case IntegerType => one(int64s).toInt
      case ShortType => one(int64s).toShort
      case ByteType => one(int64s).toByte
      case BooleanType => one(int64s) != 0L
      case FloatType => one(floats)
      case org.apache.spark.sql.types.ArrayType(LongType, _) => int64s
      case org.apache.spark.sql.types.ArrayType(IntegerType, _) =>
        int64s.map(_.toInt)
      case org.apache.spark.sql.types.ArrayType(FloatType, _) => floats
      case other => throw new IllegalArgumentException(
        s"unsupported TFRecord column type ${other.simpleString}")
    }
  }

  /** TFRecord shard directory as a DataFrame under the recorded DDL —
    * one executor task per file, one record in memory at a time, both
    * framing checksums verified per record. */
  private def tfrecordShardFrame(spark: SparkSession, dir: String,
                                 ddl: String, shardCol: String,
                                 only: Set[Long] = Set.empty): DataFrame = {
    import spark.implicits._
    val (hfs, root) = fs(spark, dir)
    val files = dataFileList(shardListing(hfs,
      hfs.listStatus(root).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$shardCol=") &&
        !st.getPath.getName.endsWith("__HIVE_DEFAULT_PARTITION__")),
      shardCol))
      .map { case (rel, p) =>
        (rel.stripPrefix(s"$shardCol=").takeWhile(_ != '/').toLong,
          hfs.makeQualified(p).toString)
      }
      .filter { case (shard, _) => only.isEmpty || only.contains(shard) }
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val data = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    require(!data.fieldNames.contains(shardCol),
      s"tfrecord manifest schema must not contain '$shardCol'")
    val fields = data.fields.map(f => (f.name, f.dataType)).toSeq
    val full = data.add(shardCol, LongType)
    val rows = spark.createDataset(files)
      .repartition(readTasks(spark, files.size))
      .rdd.flatMap { case (shard, uri) =>
        val p = new Path(uri)
        val rawIn = p.getFileSystem(confB.value.value).open(p)
        val in: java.io.InputStream =
          if (uri.endsWith(".gz")) new java.util.zip.GZIPInputStream(rawIn)
          else if (uri.endsWith(".zst"))
            new com.github.luben.zstd.ZstdInputStream(rawIn)
          else rawIn
        val it = tfrecordRecords(in)
        new Iterator[Row] {
          private var closed = false
          // close on task completion too (see tarShardFrame): a limit()
          // or early abort never exhausts the iterator
          private def closeOnce(): Unit =
            if (!closed) { closed = true; try in.close() finally () }
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) closeOnce()
            h
          }
          override def next(): Row = {
            val entries = tfParseExample(it.next())
            Row.fromSeq(fields.map { case (name, dt) =>
              entries.get(name) match {
                case Some((kindTag, list)) => tfValue(dt, kindTag, list)
                case None => null
              }
            } :+ shard)
          }
        }
      }
    spark.createDataFrame(rows, full)
  }

  /** Read named shards of a TFRecord export (all shards when `shards` is
    * empty) under the manifest's recorded schema — the [[readShards]]
    * contract for the TFRecord format. Only the named shards' files are
    * opened. */
  def readTfrecordShards(spark: SparkSession, dir: String,
                         shards: Seq[Long] = Nil,
                         shardCol: String = "shard"): DataFrame = {
    val tree = manifestTree(spark, dir)
    require(Option(tree.get("format")).map(_.asText).contains("tfrecord"),
      s"manifest at $dir is not a writeTfrecordShards export")
    val ddl = Option(tree.get("schema")).map(_.asText).getOrElse(
      throw new IllegalArgumentException(
        s"tfrecord manifest at $dir has no 'schema' field"))
    tfrecordShardFrame(spark, dir, ddl, shardCol, shards.toSet)
  }

  // ── WARC shards ────────────────────────────────────────────────────────
  //
  // The crawl-container format (the public WARC 1.0 spec, ISO 28500 —
  // Common Crawl's layout, and the one missing stage between a crawl dump
  // and the pipeline's HTML layer: readWarcShards → htmlExtract →
  // urlNormalize → dedup). A WARC file is a sequence of records: a
  // `WARC/1.0` version line, CRLF-terminated named headers, a blank line,
  // a content block of exactly Content-Length bytes, then CRLF CRLF. A
  // `response` record's block is an HTTP/1.1 response message (status
  // line + headers + blank line + body); `warcinfo`/`request`/`metadata`
  // records share the framing and are skipped by length without
  // allocation on read.

  private val WarcDate = "1970-01-01T00:00:00Z" // pinned, like tarHeader's mtime
  private val WarcIdPrefix = "urn:graft:"
  private val CrlfCrlf = Array[Byte]('\r', '\n', '\r', '\n')

  private def writeWarcRecord(out: java.io.OutputStream, kind: String,
                              id: String, extra: Seq[(String, String)],
                              block: Array[Byte]): Unit = {
    val sb = new StringBuilder(256)
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(kind).append("\r\n")
    sb.append("WARC-Record-ID: <").append(WarcIdPrefix).append(id)
      .append(">\r\n")
    sb.append("WARC-Date: ").append(WarcDate).append("\r\n")
    extra.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(block.length).append("\r\n\r\n")
    out.write(sb.toString.getBytes("UTF-8"))
    out.write(block)
    out.write(CrlfCrlf)
  }

  /** Crawl-shard WARC export — the [[writeShards]] contract on the
    * crawl-container format: each row becomes one WARC `response` record
    * (WARC headers: deterministic record id `<urn:graft:<key>>`, pinned
    * date, `WARC-Target-URI` = `url`; block: an HTTP/1.1 response with
    * `status`, `Content-Type` = `mime`, and the `payload` bytes as body),
    * preceded by one `warcinfo` record per file. One file per shard at
    * `shard=N/part-00000.warc[.gz]`, records key-sorted, every header
    * field pinned so the bytes are a pure function of the rows (the
    * writeTarShards determinism discipline, including first-committer-wins
    * rename). Required columns: `keyCol` string (unique per shard,
    * angle-bracket/control-free), `url`/`mime` strings (CR/LF-free),
    * `status` integral, `payload` binary (non-null; empty allowed),
    * `shardCol` integral. The SAME manifest follows (per-shard counts,
    * byte/file stats, content digests recounted from the WRITTEN files via
    * a full decode pass, per-file xxhash64) extended with `format:
    * "warc"`, so [[validateShards]]/[[validateShardsContent]]/
    * [[readWarcShards]] work over it unchanged. Compression `"none"` or
    * `"gzip"` — gzip writes one gzip MEMBER PER RECORD (the Common Crawl
    * layout; the JDK gunzip stream decompresses member concatenations
    * transparently, so sequential readers are unchanged), which makes
    * every record independently addressable by compressed byte offset.
    * The writer exploits that: each shard file gets a dot-hidden CDX
    * sidecar (`.part-00000.warc[.gz].cdx`, one JSON line per response
    * record: key, url, offset, length) so [[readWarcRecords]] can fetch
    * single records by key with one seek, no shard scan — and a huge
    * file's SELECTIVE reads parallelize across tasks even though the
    * sequential scan is one task. Sidecars are invisible to the
    * manifest's byte/file stats and to every sequential reader (the
    * dot prefix), and their bytes are a pure function of the rows like
    * the containers themselves.
    * Overwrite-only: a crawl export is a terminal artifact. */
  def writeWarcShards(df: DataFrame, dir: String,
                      keyCol: String = "key",
                      shardCol: String = "shard",
                      compression: String = "none",
                      revisitOfCol: Option[String] = None): Map[Long, Long] = {
    val spark = df.sparkSession
    require(compression == "none" || compression == "gzip",
      s"writeWarcShards compression must be none|gzip, got '$compression'")
    val needed = Seq(keyCol, "url", "status", "mime", "payload", shardCol)
    needed.foreach(c => require(df.columns.contains(c),
      s"writeWarcShards needs columns ${needed.mkString(",")}; missing '$c'"))
    require(df.schema(keyCol).dataType == StringType &&
      df.schema("url").dataType == StringType &&
      df.schema("mime").dataType == StringType,
      s"writeWarcShards: '$keyCol'/'url'/'mime' must be strings")
    require(df.schema("payload").dataType == BinaryType,
      "writeWarcShards: 'payload' must be binary")
    require(
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(shardCol).dataType) &&
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema("status").dataType),
      s"writeWarcShards: '$shardCol' and 'status' must be integral")
    revisitOfCol.foreach { c =>
      require(df.columns.contains(c),
        s"writeWarcShards: revisitOfCol '$c' not in ${df.columns.mkString(",")}")
      require(df.schema(c).dataType == StringType,
        s"writeWarcShards: revisitOfCol '$c' must be a string")
    }
    val revisitExpr = revisitOfCol.map(col)
      .getOrElse(lit(null).cast("string"))
    writeWarcContainers(
      df.select(col(shardCol).cast("long").as("__shard"),
        col(keyCol).as("__key"), col("url"),
        col("status").cast("int").as("status"), col("mime"), col("payload"),
        revisitExpr.as("__revisit_of")),
      dir, keyCol, shardCol, compression,
      caller = "writeWarcShards", format = "warc",
      loader = d => warcDigestFrame(spark, d, keyCol, shardCol),
      build = row => {
        val key = row.getString(1)
        val url = crlfFree(row.getString(2), "url", "writeWarcShards")
        if (!row.isNullAt(6)) {
          // revisit record: the crawler's duplicate signal. No payload —
          // the capture it refers to carries the bytes; a non-empty
          // payload here is a caller bug, refused loudly.
          val ref = row.getString(6)
          require(ref.nonEmpty &&
            !ref.exists(c => c == '<' || c == '>' || c.isControl),
            s"writeWarcShards: revisit_of for key '$key' must be " +
              "non-empty and free of angle brackets/control chars")
          val payload = row.get(5)
          require(payload == null ||
            payload.asInstanceOf[Array[Byte]].isEmpty,
            s"writeWarcShards: revisit record '$key' must carry no " +
              "payload (the referred-to capture owns the bytes)")
          ("revisit", url, Seq("WARC-Target-URI" -> url,
            "WARC-Refers-To" -> s"<$WarcIdPrefix$ref>",
            "WARC-Profile" ->
              "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"),
            Array.emptyByteArray)
        } else {
          val status = row.getInt(3)
          val mime = crlfFree(row.getString(4), "mime", "writeWarcShards")
          val payload = row.get(5)
          require(payload != null,
            s"writeWarcShards: null payload for key '$key' — an empty " +
              "body is an EMPTY byte array, not null")
          val body = payload.asInstanceOf[Array[Byte]]
          val httpHead =
            (s"HTTP/1.1 $status OK\r\nContent-Type: $mime\r\n" +
              s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
          val block = new Array[Byte](httpHead.length + body.length)
          System.arraycopy(httpHead, 0, block, 0, httpHead.length)
          System.arraycopy(body, 0, block, httpHead.length, body.length)
          ("response", url, Seq("WARC-Target-URI" -> url,
            "Content-Type" -> "application/http;msgtype=response"), block)
        }
      })
  }

  /** WET extracted-text export — the Common Crawl WARC→WET derivation as
    * a first-class container: each row becomes one WARC `conversion`
    * record (Content-Type `text/plain`, `WARC-Target-URI` = `url`,
    * `WARC-Refers-To` = `<urn:graft:key>` — the response record the text
    * was extracted FROM in the sibling WARC export) whose block is the
    * UTF-8 bytes of `text`. Everything else is the [[writeWarcShards]]
    * contract verbatim and literally the same code path: one key-sorted
    * file per shard, pinned headers, warcinfo lead record, per-record
    * gzip members, CDX sidecars, deterministic bytes, first-committer-
    * wins rename, and the SAME manifest gates (digest recount re-parses
    * every record via [[wetShardFrame]]) with `format: "wet"`. Required
    * columns: `keyCol`/`url`/`text` strings (key unique per shard,
    * bracket/control-free; url CR/LF-free; text non-null — CR/LF INSIDE
    * text is legal, Content-Length frames the block), `shardCol`
    * integral. Read back with [[readWetShards]]. */
  def writeWetShards(df: DataFrame, dir: String,
                     keyCol: String = "key",
                     shardCol: String = "shard",
                     compression: String = "none"): Map[Long, Long] = {
    val spark = df.sparkSession
    require(compression == "none" || compression == "gzip",
      s"writeWetShards compression must be none|gzip, got '$compression'")
    val needed = Seq(keyCol, "url", "text", shardCol)
    needed.foreach(c => require(df.columns.contains(c),
      s"writeWetShards needs columns ${needed.mkString(",")}; missing '$c'"))
    require(df.schema(keyCol).dataType == StringType &&
      df.schema("url").dataType == StringType &&
      df.schema("text").dataType == StringType,
      s"writeWetShards: '$keyCol'/'url'/'text' must be strings")
    require(
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(shardCol).dataType),
      s"writeWetShards: '$shardCol' must be integral")
    writeWarcContainers(
      df.select(col(shardCol).cast("long").as("__shard"),
        col(keyCol).as("__key"), col("url"), col("text")),
      dir, keyCol, shardCol, compression,
      caller = "writeWetShards", format = "wet",
      fileBase = "part-00000.warc.wet",
      loader = d => wetShardFrame(spark, d, keyCol, shardCol),
      build = row => {
        val key = row.getString(1)
        val url = crlfFree(row.getString(2), "url", "writeWetShards")
        val text = row.getString(3)
        require(text != null,
          s"writeWetShards: null text for key '$key' — an empty " +
            "conversion is an EMPTY string, not null")
        ("conversion", url, Seq("WARC-Target-URI" -> url,
          "WARC-Refers-To" -> s"<$WarcIdPrefix$key>",
          "Content-Type" -> "text/plain"),
          strictUtf8Bytes(text, s"text for key '$key'", "writeWetShards"))
      })
  }

  /** Non-null, CR/LF-free header value — the WARC-family writers' header
    * smuggling guard. */
  private def crlfFree(s: String, what: String, caller: String): String = {
    require(s != null && !s.exists(c => c == '\r' || c == '\n'),
      s"$caller: $what must be non-null and CR/LF-free, got '$s'")
    s
  }

  /** The shared WARC-family container writer behind [[writeWarcShards]]
    * and [[writeWetShards]]: shard-file lifecycle (temp + first-
    * committer-wins rename), warcinfo lead record, per-record gzip
    * members, CDX sidecars, key ordering/uniqueness checks, and the
    * manifest publish — everything except what a RECORD is. `sel` must
    * lead with (`__shard` long, `__key` string); `build` turns each row
    * into (record kind, cdx url, extra WARC headers, block bytes) and
    * owns the format-specific validation. */
  private def writeWarcContainers(sel: DataFrame, dir: String,
                                  keyCol: String, shardCol: String,
                                  compression: String, caller: String,
                                  format: String,
                                  loader: String => DataFrame,
                                  build: Row => (String, String, Seq[(String, String)], Array[Byte]),
                                  fileBase: String = "part-00000.warc")
      : Map[Long, Long] = {
    val spark = sel.sparkSession
    val (hfs, root) = fs(spark, dir)
    if (hfs.exists(root)) hfs.delete(root, true)
    hfs.mkdirs(root)
    val rootUri = hfs.makeQualified(root).toString
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val fileName =
      if (compression == "gzip") s"$fileBase.gz" else fileBase
    val shardColName = shardCol
    sel
      .repartition(col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__key"))
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = confB.value.value
        val rootP = new Path(rootUri)
        val tfs = rootP.getFileSystem(conf)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var shard = Long.MinValue
        var lastKey: String = null
        var out: CountingOutputStream = null
        var cdx: java.io.Writer = null
        var tmp: Path = null
        var fin: Path = null
        var cdxTmp: Path = null
        var cdxFin: Path = null
        val gzip = fileName.endsWith(".gz")
        // first-committer-wins (see writeTarShards): deterministic bytes
        // make losing the rename race equivalent to having committed
        def commit(t: Path, f: Path): Unit =
          if (!tfs.rename(t, f)) {
            require(tfs.exists(f),
              s"$caller: could not move $t into place at $f")
            tfs.delete(t, false)
          }
        def closeCurrent(): Unit = if (out != null) {
          out.close(); out = null
          cdx.close(); cdx = null
          commit(tmp, fin)
          commit(cdxTmp, cdxFin)
        }
        // gzip mode writes ONE MEMBER PER RECORD (finish() seals the
        // member without closing the file stream) so the returned
        // (offset, length) bound a self-contained gunzip unit — the CDX
        // contract readWarcRecords seeks on. Uncompressed mode returns
        // the raw record bounds, same contract. The member's Deflater is
        // end()ed EXPLICITLY: finish() alone leaves each member's native
        // zlib state to the GC's cleaner, and at one member per record
        // that is tens of thousands of leaked native buffers per shard —
        // the r18 soak measured the x210 writer 49× (not 10×) at 10×
        // data before this (close() is not an option: it would close the
        // shared file stream).
        def writeRec(kind: String, key: String,
                     headers: Seq[(String, String)],
                     block: Array[Byte]): (Long, Long) = {
          val start = out.count
          if (gzip) {
            val gz = new MemberGzipOutputStream(out)
            writeWarcRecord(gz, kind, key, headers, block)
            gz.finish()
            gz.endDeflater()
          } else writeWarcRecord(out, kind, key, headers, block)
          (start, out.count - start)
        }
        def jq(s: String): String =
          com.fasterxml.jackson.databind.node.TextNode.valueOf(s).toString
        try {
          it.foreach { row =>
            val s = row.getLong(0)
            val key = row.getString(1)
            require(key != null && key.nonEmpty &&
              !key.exists(c => c == '<' || c == '>' || c.isControl),
              s"$caller: record key '$key' in shard $s must be " +
                "non-empty and free of angle brackets/control chars")
            if (s != shard) {
              closeCurrent()
              shard = s; lastKey = null
              val sdir = new Path(rootP, s"$shardColName=$s")
              tfs.mkdirs(sdir)
              fin = new Path(sdir, fileName)
              tmp = new Path(sdir, s".$fileName.inprogress-$attempt")
              cdxFin = new Path(sdir, s".$fileName.cdx")
              cdxTmp = new Path(sdir, s".$fileName.cdx.inprogress-$attempt")
              out = new CountingOutputStream(tfs.create(tmp, true))
              cdx = new java.io.OutputStreamWriter(
                tfs.create(cdxTmp, true), "UTF-8")
              writeRec("warcinfo", s"warcinfo-$s",
                Seq("Content-Type" -> "application/warc-fields"),
                ("software: graft-export\r\n" +
                  "format: WARC File Format 1.0\r\n").getBytes("UTF-8"))
            }
            require(key != lastKey,
              s"$caller: duplicate record key '$key' in shard $s")
            lastKey = key
            val (kind, url, headers, block) = build(row)
            val (off, len) = writeRec(kind, key, headers, block)
            cdx.write(s"""{"key": ${jq(key)}, "url": ${jq(url)}, """ +
              s""""offset": $off, "length": $len}""" + "\n")
          }
          closeCurrent()
        } finally if (out != null) {
          out.close(); if (cdx != null) cdx.close()
          tfs.delete(tmp, false); tfs.delete(cdxTmp, false)
        }
      }
    def q(s: String): String =
      com.fasterxml.jackson.databind.node.TextNode.valueOf(s).toString
    publishManifest(spark, dir, shardCol, caller, loader,
      epochs = Set.empty, priorHashes = Map.empty,
      extra = Seq("format" -> q(format), "compression" -> q(compression),
        "key" -> q(keyCol), "cdx" -> "true"))
  }

  /** Per-record gzip member whose native zlib state can be released
    * without closing the shared underlying file stream (DeflaterOutput-
    * Stream exposes the deflater as a protected field; GZIPOutputStream
    * offers no end hook of its own). */
  private final class MemberGzipOutputStream(u: java.io.OutputStream)
      extends java.util.zip.GZIPOutputStream(u) {
    def endDeflater(): Unit = `def`.end()
  }

  /** Byte-counting pass-through: the compressed-offset source for the
    * CDX sidecar (gzip members deflate through it, so `count` after
    * `finish()` is the member's END offset in the file). */
  private final class CountingOutputStream(u: java.io.OutputStream)
      extends java.io.OutputStream {
    var count = 0L
    override def write(b: Int): Unit = { u.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      u.write(b, off, len); count += len
    }
    override def flush(): Unit = u.flush()
    override def close(): Unit = u.close()
  }

  /** One CRLF-terminated line as (text, bytes consumed incl. CRLF). */
  private def warcLine(in: java.io.InputStream, what: String): (String, Long) = {
    val buf = new java.io.ByteArrayOutputStream(96)
    var c = in.read()
    require(c >= 0, s"corrupt warc: EOF reading $what")
    var n = 1L
    while (c != '\n') {
      buf.write(c)
      c = in.read()
      require(c >= 0, s"corrupt warc: EOF inside $what")
      n += 1
    }
    val arr = buf.toByteArray
    require(arr.nonEmpty && arr(arr.length - 1) == '\r',
      s"corrupt warc: $what line not CRLF-terminated")
    (new String(arr, 0, arr.length - 1, "UTF-8"), n)
  }

  private def readFullyOrFail(in: java.io.InputStream, len: Int,
                              what: String): Array[Byte] = {
    val buf = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val r = in.read(buf, off, len - off)
      require(r >= 0, s"corrupt warc: EOF inside $what")
      off += r
    }
    buf
  }

  /** One record's WARC header block as (headers lowercased, block byte
    * length), or None at clean EOF — the framing prelude shared by the
    * response ([[warcResponses]]) and conversion ([[warcConversions]])
    * walkers; every violation refuses loudly. */
  private def warcRecordHead(in: java.io.PushbackInputStream)
      : Option[(Map[String, String], Long)] = {
    val first = in.read()
    if (first < 0) return None
    in.unread(first)
    val (ver, _) = warcLine(in, "warc version")
    require(ver.startsWith("WARC/"),
      s"corrupt warc: expected a WARC/ version line, got '$ver'")
    var headers = Map.empty[String, String]
    var line = warcLine(in, "warc header")._1
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      require(i > 0, s"corrupt warc: malformed header '$line'")
      headers += line.substring(0, i).trim.toLowerCase ->
        line.substring(i + 1).trim
      line = warcLine(in, "warc header")._1
    }
    val blockLen = headers.getOrElse("content-length",
      throw new IllegalArgumentException(
        "corrupt warc: record has no Content-Length")).toLong
    require(blockLen >= 0, s"corrupt warc: Content-Length $blockLen")
    Some((headers, blockLen))
  }

  /** Record id → reader key: this writer's `<urn:graft:key>` ids surface
    * as the bare key; foreign ids surface with only the brackets
    * stripped. */
  private def warcKeyOf(headers: Map[String, String]): String =
    stripWarcId(headers.getOrElse("warc-record-id", ""))

  /** `<urn:graft:key>` → `key`; foreign ids (`<urn:uuid:...>`) lose only
    * the angle brackets — shared by record-id and refers-to headers. */
  private def stripWarcId(rawId: String): String = {
    val noBrackets =
      if (rawId.startsWith("<") && rawId.endsWith(">"))
        rawId.substring(1, rawId.length - 1)
      else rawId
    if (noBrackets.startsWith(WarcIdPrefix))
      noBrackets.substring(WarcIdPrefix.length)
    else noBrackets
  }

  /** The `revisit` records of a WARC stream as (key, target url,
    * refers-to id, profile) — the crawler's OWN dedup signal (Common
    * Crawl writes one per re-fetched URL whose payload digest matched a
    * prior capture; a pipeline wants these as rows feeding the
    * incremental-dedup/corpus-diff operators, not silently dropped).
    * Every block — revisit blocks carry at most the re-fetch's HTTP
    * headers, never payload bytes this reader needs — and every
    * non-revisit record is SKIPPED by Content-Length without
    * allocation. Same loud framing refusals as [[warcResponses]];
    * `<urn:graft:...>` ids surface bare, foreign ids lose only the
    * brackets (both record-id and refers-to). */
  private[ext] def warcRevisits(in0: java.io.InputStream)
      : Iterator[(String, String, String, String)] = {
    val in = new java.io.PushbackInputStream(in0, 1)
    new Iterator[(String, String, String, String)] {
      private var nextRec: (String, String, String, String) = _
      private var done = false
      private def advance(): Unit = {
        while (nextRec == null && !done) {
          val head = warcRecordHead(in)
          if (head.isEmpty) { done = true; return }
          val (headers, blockLen) = head.get
          skipFully(in, blockLen, "warc block")
          val tail = readFullyOrFail(in, 4, "warc record tail")
          require(java.util.Arrays.equals(tail, CrlfCrlf),
            "corrupt warc: record block not followed by CRLF CRLF")
          if (headers.getOrElse("warc-type", "") == "revisit")
            nextRec = (warcKeyOf(headers),
              headers.getOrElse("warc-target-uri", ""),
              stripWarcId(headers.getOrElse("warc-refers-to", "")),
              headers.getOrElse("warc-profile", ""))
        }
      }
      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): (String, String, String, String) = {
        if (!hasNext) throw new NoSuchElementException("warc")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** The `conversion` records of a WET stream as (key, url,
    * text-bytes-or-null, byte length) — the [[warcResponses]] discipline
    * on the extracted-text container: record-by-record, one body in
    * memory at a time, non-conversion records AND bodies under
    * `!readPayload` skipped by Content-Length without allocation,
    * framing violations refusing loudly. A conversion block is the text
    * itself (no HTTP message to parse). */
  private[ext] def warcConversions(in0: java.io.InputStream,
                                   readPayload: Boolean)
      : Iterator[(String, String, Array[Byte], Long)] = {
    val in = new java.io.PushbackInputStream(in0, 1)
    new Iterator[(String, String, Array[Byte], Long)] {
      private var nextRec: (String, String, Array[Byte], Long) = _
      private var done = false

      private def recordTail(): Unit = {
        val tail = readFullyOrFail(in, 4, "warc record tail")
        require(java.util.Arrays.equals(tail, CrlfCrlf),
          "corrupt warc: record block not followed by CRLF CRLF")
      }

      private def advance(): Unit = {
        while (nextRec == null && !done) {
          val head = warcRecordHead(in)
          if (head.isEmpty) { done = true; return }
          val (headers, blockLen) = head.get
          if (headers.getOrElse("warc-type", "") == "conversion") {
            val body =
              if (readPayload) {
                require(blockLen <= Int.MaxValue,
                  s"wet text of $blockLen bytes exceeds one array")
                readFullyOrFail(in, blockLen.toInt, "wet text")
              } else { skipFully(in, blockLen, "wet text"); null }
            recordTail()
            nextRec = (warcKeyOf(headers),
              headers.getOrElse("warc-target-uri", ""), body, blockLen)
          } else {
            skipFully(in, blockLen, "warc block")
            recordTail()
          }
        }
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): (String, String, Array[Byte], Long) = {
        if (!hasNext) throw new NoSuchElementException("wet")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** STRICT UTF-8 decode of a conversion payload — malformed bytes
    * refuse loudly (the JVM default silently substitutes U+FFFD, which
    * would corrupt training text while reporting success). */
  private def strictUtf8(b: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch {
      case e: java.nio.charset.CharacterCodingException =>
        throw new IllegalArgumentException(
          "corrupt wet: conversion payload is not valid UTF-8", e)
    }
  }

  /** STRICT UTF-8 encode of a conversion payload — the write-side mirror
    * of [[strictUtf8]]: unencodable chars (unpaired surrogates) refuse
    * loudly instead of the JVM default's silent '?' substitution, which
    * would corrupt the very text the strict reader protects while the
    * round-trip reports success. */
  private[ext] def strictUtf8Bytes(s: String, what: String, caller: String): Array[Byte] = {
    val enc = java.nio.charset.StandardCharsets.UTF_8.newEncoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val bb = enc.encode(java.nio.CharBuffer.wrap(s))
      val out = new Array[Byte](bb.remaining()); bb.get(out); out
    } catch {
      case e: java.nio.charset.CharacterCodingException =>
        throw new IllegalArgumentException(
          s"$caller: $what is not encodable as UTF-8 (unpaired " +
            "surrogate?) — refusing rather than silently substituting", e)
    }
  }

  /** The `response` records of a WARC stream as (key, url, status, mime,
    * payload-or-null, payload byte length) — record-by-record, one record's
    * headers + (when `readPayload`) body in memory at a time. Non-response
    * records (warcinfo/request/metadata/...) and response bodies when
    * `!readPayload` are SKIPPED by Content-Length without allocation (the
    * readTarShards member-pruning discipline). Framing violations — a
    * missing `WARC/` version line, a header without a colon, a missing
    * Content-Length, a block overrunning EOF, a missing CRLF CRLF record
    * tail — refuse loudly rather than resynchronize: a crawl shard is a
    * terminal artifact, a corrupt one must fail ingest, not truncate it.
    * Record ids of this writer's form `<urn:graft:key>` surface as the
    * bare key; foreign ids (e.g. Common Crawl's `<urn:uuid:...>`) surface
    * with only the angle brackets stripped. */
  private[ext] def warcResponses(in0: java.io.InputStream,
                                 readPayload: Boolean)
      : Iterator[(String, String, Int, String, Array[Byte], Long)] = {
    val in = new java.io.PushbackInputStream(in0, 1)
    new Iterator[(String, String, Int, String, Array[Byte], Long)] {
      private var nextRec: (String, String, Int, String, Array[Byte], Long) = _
      private var done = false

      private def recordTail(): Unit = {
        val tail = readFullyOrFail(in, 4, "warc record tail")
        require(java.util.Arrays.equals(tail, CrlfCrlf),
          "corrupt warc: record block not followed by CRLF CRLF")
      }

      private def advance(): Unit = {
        while (nextRec == null && !done) {
          val head = warcRecordHead(in)
          if (head.isEmpty) { done = true; return }
          val (headers, blockLen) = head.get
          val kind = headers.getOrElse("warc-type", "")
          val ctype = headers.getOrElse("content-type", "")
          if (kind == "response" && ctype.startsWith("application/http")) {
            val (statusLine, n0) = warcLine(in, "http status line")
            require(statusLine.startsWith("HTTP/"),
              s"corrupt warc: response block not HTTP: '$statusLine'")
            // split on whitespace RUNS and demand a bounded all-digit
            // status: a foreign WARC with 'HTTP/1.1  200' (double space)
            // or a non-numeric status must get the same loud 'corrupt
            // warc' refusal as every other framing violation, not a bare
            // NumberFormatException out of toInt
            val parts = statusLine.split("\\s+")
            require(parts.length >= 2 && parts(1).nonEmpty &&
                parts(1).length <= 9 && parts(1).forall(_.isDigit),
              s"corrupt warc: malformed HTTP status line '$statusLine'")
            val status = parts(1).toInt
            var consumed = n0
            var mime = ""
            var t = warcLine(in, "http header")
            consumed += t._2
            while (t._1.nonEmpty) {
              val hl = t._1
              val i = hl.indexOf(':')
              if (i > 0 &&
                  hl.substring(0, i).trim.equalsIgnoreCase("content-type"))
                mime = hl.substring(i + 1).trim
              t = warcLine(in, "http header")
              consumed += t._2
            }
            val bodyLen = blockLen - consumed
            require(bodyLen >= 0,
              "corrupt warc: HTTP headers overrun the record Content-Length")
            val body =
              if (readPayload) {
                require(bodyLen <= Int.MaxValue,
                  s"warc payload of $bodyLen bytes exceeds one array")
                readFullyOrFail(in, bodyLen.toInt, "warc payload")
              } else { skipFully(in, bodyLen, "warc payload"); null }
            recordTail()
            nextRec = (warcKeyOf(headers),
              headers.getOrElse("warc-target-uri", ""),
              status, mime, body, bodyLen)
          } else {
            skipFully(in, blockLen, "warc block")
            recordTail()
          }
        }
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): (String, String, Int, String, Array[Byte], Long) = {
        if (!hasNext) throw new NoSuchElementException("warc")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Open one WARC file off its filesystem and stream its response
    * records — one record in memory at a time, NEVER the file (the
    * gzip/raw stream is pulled through [[warcResponses]] incrementally,
    * so a multi-GiB or unsharded foreign WARC costs one record's bytes
    * of task memory, not the file's). Multi-member gzip concatenations
    * (each record its own member, the Common Crawl layout) decompress
    * transparently (GZIPInputStream consumes member sequences). The
    * stream closes on exhaustion AND on task completion, whichever
    * comes first (a limit/take that abandons the iterator must not leak
    * the file handle). Shared by the batch shard reader and the
    * streaming file source — the ONE file→records seam. */
  private def warcFileRecords(conf: org.apache.hadoop.conf.Configuration,
                              uri: String, readPayload: Boolean)
      : Iterator[(String, String, Int, String, Array[Byte], Long)] =
    containerFileRecords(conf, uri, in => warcResponses(in, readPayload))

  /** [[warcFileRecords]] for the WET container: conversion records,
    * same one-record-at-a-time memory posture and close discipline. */
  private def wetFileRecords(conf: org.apache.hadoop.conf.Configuration,
                             uri: String, readPayload: Boolean)
      : Iterator[(String, String, Array[Byte], Long)] =
    containerFileRecords(conf, uri, in => warcConversions(in, readPayload))

  /** [[warcFileRecords]] for `revisit` records: same posture. */
  private def warcRevisitFileRecords(
      conf: org.apache.hadoop.conf.Configuration, uri: String)
      : Iterator[(String, String, String, String)] =
    containerFileRecords(conf, uri, warcRevisits)

  /** Open one WARC-family file and stream records through `parse` —
    * gzip (multi-member) or raw by extension; the stream closes on
    * exhaustion AND on task completion, whichever comes first. */
  private def containerFileRecords[T](
      conf: org.apache.hadoop.conf.Configuration, uri: String,
      parse: java.io.InputStream => Iterator[T]): Iterator[T] = {
    val p = new Path(uri)
    val rawIn = p.getFileSystem(conf).open(p)
    val in: java.io.InputStream =
      if (uri.endsWith(".gz")) new java.util.zip.GZIPInputStream(rawIn)
      else rawIn
    val it = parse(in)
    new Iterator[T] {
      private var closed = false
      private def closeOnce(): Unit =
        if (!closed) { closed = true; try in.close() finally () }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) closeOnce()
        h
      }
      override def next(): T = it.next()
    }
  }

  /** WARC shard directory as a DataFrame — one executor task per file,
    * one record in memory at a time; `wanted` prunes at the RECORD level
    * (a scan without `payload` skips every body by length). */
  private def warcShardFrame(spark: SparkSession, dir: String,
                             keyCol: String, shardCol: String,
                             only: Set[Long] = Set.empty,
                             wanted: Set[String] = Set.empty): DataFrame = {
    import spark.implicits._
    val files = shardFileUris(spark, dir, shardCol, only)
    val legal = Set(keyCol, shardCol, "url", "status", "mime", "payload",
      "payload_len")
    val unknown = wanted -- legal
    require(unknown.isEmpty,
      s"readWarcShards: unknown columns ${unknown.mkString(",")}; " +
        s"export has ${legal.mkString(",")}")
    val readPayload = wanted.isEmpty || wanted("payload")
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val rows = spark.createDataset(files)
      .repartition(readTasks(spark, files.size))
      .flatMap { case (shard, uri) =>
        warcFileRecords(confB.value.value, uri, readPayload)
          .map { case (key, url, status, mime, body, plen) =>
            (key, url, status, mime, body, plen, shard) }
      }
      .toDF("__key", "url", "status", "mime", "payload", "payload_len",
        "__shard")
    val all = Seq(
      keyCol -> col("__key").as(keyCol),
      "url" -> col("url"), "status" -> col("status"),
      "mime" -> col("mime"), "payload" -> col("payload"),
      "payload_len" -> col("payload_len"),
      shardCol -> col("__shard").as(shardCol))
    rows.select(all.collect {
      case (n, c) if wanted.isEmpty || wanted(n) || n == keyCol ||
        n == shardCol => c
    }: _*)
  }

  /** The `revisit` records of a WARC shard export as a DataFrame —
    * (keyCol, url, refers_to, profile, shardCol), one row per revisit
    * record: the crawler-side duplicate signal (refers_to names the
    * capture whose payload the re-fetch matched), exactly the
    * (incoming key → canonical key) pair shape the incremental-dedup
    * (x77) and corpus-diff (x89) operators consume. Same execution
    * shape as [[readWarcShards]]: one task per file, one record's
    * headers in memory at a time, every block skipped by length (a
    * revisit scan allocates zero payload bytes). */
  def readWarcRevisits(spark: SparkSession, dir: String,
                       keyCol: String = "key",
                       shardCol: String = "shard"): DataFrame =
    warcRevisitFrame(spark, dir, keyCol, shardCol)

  private def warcRevisitFrame(spark: SparkSession, dir: String,
                               keyCol: String, shardCol: String,
                               only: Set[Long] = Set.empty): DataFrame = {
    import spark.implicits._
    val files = shardFileUris(spark, dir, shardCol, only)
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    spark.createDataset(files)
      .repartition(readTasks(spark, files.size))
      .flatMap { case (shard, uri) =>
        warcRevisitFileRecords(confB.value.value, uri)
          .map { case (key, url, refersTo, profile) =>
            (key, url, refersTo, profile, shard) }
      }
      .toDF("__key", "url", "refers_to", "profile", "__shard")
      .select(col("__key").as(keyCol), col("url"), col("refers_to"),
        col("profile"), col("__shard").as(shardCol))
  }

  /** The WARC export's DIGEST frame: responses AND revisit records, so
    * a flipped refers-to or a dropped revisit record fails the manifest
    * recount like any payload corruption. Revisit rows digest as
    * (key, url, 0, "revisit:"+refers_to, profile bytes, 0, shard) — the
    * response row shape. Used at both manifest publish and
    * validateShardsContent (the two must agree or every recount
    * fails); a pure-response export digests identically to before
    * revisit support (the revisit frame contributes zero rows, and its
    * pass skips every block by length). */
  private def warcDigestFrame(spark: SparkSession, dir: String,
                              keyCol: String, shardCol: String): DataFrame = {
    val resp = warcShardFrame(spark, dir, keyCol, shardCol)
    val rev = warcRevisitFrame(spark, dir, keyCol, shardCol)
      .select(col(keyCol), col("url"), lit(0).as("status"),
        concat(lit("revisit:"), col("refers_to")).as("mime"),
        encode(col("profile"), "UTF-8").as("payload"),
        lit(0L).as("payload_len"), col(shardCol))
    resp.unionByName(rev)
  }

  /** (shard, qualified file uri) for every data file of a WARC-family
    * export — shared listing behind the warc and wet shard frames. */
  private def shardFileUris(spark: SparkSession, dir: String,
                            shardCol: String, only: Set[Long])
      : Seq[(Long, String)] = {
    val (hfs, root) = fs(spark, dir)
    dataFileList(shardListing(hfs,
      hfs.listStatus(root).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$shardCol=") &&
        !st.getPath.getName.endsWith("__HIVE_DEFAULT_PARTITION__")),
      shardCol))
      .map { case (rel, p) =>
        (rel.stripPrefix(s"$shardCol=").takeWhile(_ != '/').toLong,
          hfs.makeQualified(p).toString)
      }
      .filter { case (shard, _) => only.isEmpty || only.contains(shard) }
  }

  /** WET shard directory as a DataFrame — one task per file, one record
    * in memory at a time; without `text` in `wanted`, every conversion
    * body is skipped by length (a key/url scan allocates zero text
    * bytes). Text decodes STRICTLY ([[strictUtf8]]). */
  private def wetShardFrame(spark: SparkSession, dir: String,
                            keyCol: String, shardCol: String,
                            only: Set[Long] = Set.empty,
                            wanted: Set[String] = Set.empty): DataFrame = {
    import spark.implicits._
    val files = shardFileUris(spark, dir, shardCol, only)
    val legal = Set(keyCol, shardCol, "url", "text", "text_len")
    val unknown = wanted -- legal
    require(unknown.isEmpty,
      s"readWetShards: unknown columns ${unknown.mkString(",")}; " +
        s"export has ${legal.mkString(",")}")
    val readPayload = wanted.isEmpty || wanted("text")
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val rows = spark.createDataset(files)
      .repartition(readTasks(spark, files.size))
      .flatMap { case (shard, uri) =>
        wetFileRecords(confB.value.value, uri, readPayload)
          .map { case (key, url, body, tlen) =>
            (key, url, if (body == null) null else strictUtf8(body),
              tlen, shard) }
      }
      .toDF("__key", "url", "text", "text_len", "__shard")
    val all = Seq(
      keyCol -> col("__key").as(keyCol),
      "url" -> col("url"), "text" -> col("text"),
      "text_len" -> col("text_len"),
      shardCol -> col("__shard").as(shardCol))
    rows.select(all.collect {
      case (n, c) if wanted.isEmpty || wanted(n) || n == keyCol ||
        n == shardCol => c
    }: _*)
  }

  /** Read named shards of a WET export (all when `shards` is empty) —
    * the [[readWarcShards]] contract on the extracted-text container:
    * only named shards' files open; a non-empty `columns` prunes at the
    * record level (a key/url scan never allocates a text byte); `text`
    * is the strictly-decoded UTF-8 conversion payload, `text_len` its
    * BYTE length. Output: (key, url, text, text_len, shard).
    * `splitRecords > 0` record-splits the scan exactly like
    * [[readWarcShards]] (CDX slices of ≤N records as task units). */
  def readWetShards(spark: SparkSession, dir: String,
                    shards: Seq[Long] = Nil,
                    shardCol: String = "shard",
                    columns: Seq[String] = Nil,
                    splitRecords: Int = 0): DataFrame = {
    val tree = manifestTree(spark, dir)
    require(Option(tree.get("format")).map(_.asText).contains("wet"),
      s"manifest at $dir is not a writeWetShards export")
    val key = Option(tree.get("key")).map(_.asText).getOrElse("key")
    if (splitRecords > 0)
      wetSliceFrame(spark, dir, key, shardCol, shards.toSet, columns.toSet,
        splitRecords)
    else
      wetShardFrame(spark, dir, key, shardCol, shards.toSet, columns.toSet)
  }

  /** Read named shards of a WARC export (all shards when `shards` is
    * empty) — the [[readShards]] contract for the crawl-container format:
    * only the named shards' files are opened; a non-empty `columns`
    * prunes at the record level, so a metadata scan (url/status/mime)
    * never allocates a single payload byte. The key and shard columns
    * are identity and always present. Output: (key, url, status, mime,
    * payload, payload_len, shard).
    *
    * `splitRecords` > 0 turns the scan RECORD-SPLIT: the CDX sidecars
    * slice each container into runs of ≤ `splitRecords` records, and
    * each slice becomes its own unit of work — so ONE huge (even
    * unsharded) container parallelizes across the cluster instead of
    * serializing onto one task. Slices align to record bounds by
    * construction (gzip exports are one member per record, so a slice's
    * byte range is a self-contained member sequence a task stream-parses
    * with zero per-record seeks). Default 0 keeps one task per file —
    * right when shard files are already cluster-width. */
  def readWarcShards(spark: SparkSession, dir: String,
                     shards: Seq[Long] = Nil,
                     shardCol: String = "shard",
                     columns: Seq[String] = Nil,
                     splitRecords: Int = 0): DataFrame = {
    val tree = manifestTree(spark, dir)
    require(Option(tree.get("format")).map(_.asText).contains("warc"),
      s"manifest at $dir is not a writeWarcShards export")
    val key = Option(tree.get("key")).map(_.asText).getOrElse("key")
    if (splitRecords > 0)
      warcSliceFrame(spark, dir, key, shardCol, shards.toSet, columns.toSet,
        splitRecords)
    else
      warcShardFrame(spark, dir, key, shardCol, shards.toSet, columns.toSet)
  }

  /** Byte-bounded view of an open stream — a CDX slice's framing. EOF
    * after exactly `remaining` bytes, so the multi-member gunzip and the
    * WARC parser both stop at the slice edge instead of running into the
    * next task's records. */
  private final class SliceInputStream(in: java.io.InputStream,
                                       private var remaining: Long)
      extends java.io.InputStream {
    override def read(): Int =
      if (remaining <= 0) -1
      else { val b = in.read(); if (b >= 0) remaining -= 1; b }
    override def read(buf: Array[Byte], off: Int, len: Int): Int =
      if (remaining <= 0) -1
      else {
        val n = in.read(buf, off, math.min(len.toLong, remaining).toInt)
        if (n > 0) remaining -= n
        n
      }
    override def available(): Int =
      math.min(remaining, Int.MaxValue.toLong).toInt
    override def close(): Unit = in.close()
  }

  /** The record-split WARC scan behind `readWarcShards(splitRecords)`:
    * stage 1 walks each container's CDX sidecar (streamed, constant
    * memory) and emits one (shard, uri, startOffset, byteLen) SLICE per
    * `splitRecords` run; stage 2 spreads the slices across tasks, each
    * seeking once and stream-parsing its byte range — [[warcResponses]]
    * framing, record-level payload pruning, one record in memory at a
    * time. Both stages live in one lazy plan: the sidecar walk is a
    * metadata job proportional to record COUNT, never payload bytes. */
  /** Stage 1 of the record-split scans, format-neutral: walk each
    * container's CDX sidecar (streamed, constant memory — a metadata job
    * proportional to record COUNT, never payload bytes) and emit one
    * (shard, container uri, startOffset, byteLen) SLICE per
    * `splitRecords` run, spread cluster-wide (same-file slices hash
    * apart on their start offset — the whole point of the split). */
  private def cdxSlices(spark: SparkSession, dir: String, shardCol: String,
                        only: Set[Long], splitRecords: Int)
      : Dataset[(Long, String, Long, Long)] = {
    import spark.implicits._
    val (hfs, root) = fs(spark, dir)
    val files = shardListing(hfs,
      hfs.listStatus(root).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$shardCol=") &&
        !st.getPath.getName.endsWith("__HIVE_DEFAULT_PARTITION__")),
      shardCol)
      .filter { case (shard, _, _) => only.isEmpty || only.contains(shard) }
      .flatMap { case (shard, _, fs_) => fs_.map { f =>
        val cdxP = new Path(f.getPath.getParent, s".${f.getPath.getName}.cdx")
        require(hfs.exists(cdxP),
          s"record-split read needs the CDX sidecar beside " +
            s"${f.getPath} — the export predates it; re-export or read " +
            "with splitRecords = 0")
        (shard, hfs.makeQualified(f.getPath).toString,
          hfs.makeQualified(cdxP).toString)
      } }
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    spark.createDataset(files)
      .repartition(readTasks(spark, files.size))
      .flatMap { case (shard, dataUri, cdxUri) =>
        val conf = confB.value.value
        val p = new Path(cdxUri)
        val in = p.getFileSystem(conf).open(p)
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try src.getLines().map { line =>
          val n = mapper.readTree(line)
          (n.get("offset").asLong, n.get("length").asLong)
        }.grouped(splitRecords).map { run =>
          val start = run.head._1
          (shard, dataUri, start, run.last._1 + run.last._2 - start)
        }.toVector
        finally in.close()
      }
      .repartition(math.max(64, spark.sparkContext.defaultParallelism * 2),
        col("_2"), col("_3"))
  }

  /** Stage 2 of the record-split scans: one seek into the container,
    * then a byte-bounded stream-parse of the slice (gzip members align
    * to record bounds, so zero per-record seeks); the stream closes on
    * exhaustion AND task completion. */
  private def sliceRecords[T](conf: org.apache.hadoop.conf.Configuration,
                              uri: String, start: Long, len: Long,
                              parse: java.io.InputStream => Iterator[T])
      : Iterator[T] = {
    val p = new Path(uri)
    val raw = p.getFileSystem(conf).open(p)
    raw.seek(start)
    val bounded = new SliceInputStream(raw, len)
    val in: java.io.InputStream =
      if (uri.endsWith(".gz")) new java.util.zip.GZIPInputStream(bounded)
      else bounded
    val it = parse(in)
    new Iterator[T] {
      private var closed = false
      private def closeOnce(): Unit =
        if (!closed) { closed = true; try in.close() finally () }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) closeOnce()
        h
      }
      override def next(): T = it.next()
    }
  }

  /** The record-split WET scan behind `readWetShards(splitRecords)` —
    * the [[warcSliceFrame]] shape on conversion records. */
  private def wetSliceFrame(spark: SparkSession, dir: String,
                            keyCol: String, shardCol: String,
                            only: Set[Long], wanted: Set[String],
                            splitRecords: Int): DataFrame = {
    import spark.implicits._
    val legal = Set(keyCol, shardCol, "url", "text", "text_len")
    val unknown = wanted -- legal
    require(unknown.isEmpty,
      s"readWetShards: unknown columns ${unknown.mkString(",")}; " +
        s"export has ${legal.mkString(",")}")
    val readPayload = wanted.isEmpty || wanted("text")
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    cdxSlices(spark, dir, shardCol, only, splitRecords)
      .flatMap { case (shard, uri, start, len) =>
        sliceRecords(confB.value.value, uri, start, len,
          in => warcConversions(in, readPayload))
          .map { case (key, url, body, tlen) =>
            (key, url, if (body == null) null else strictUtf8(body),
              tlen, shard) }
      }
      .toDF("__key", "url", "text", "text_len", "__shard")
      .select({
        val all = Seq(
          keyCol -> col("__key").as(keyCol),
          "url" -> col("url"), "text" -> col("text"),
          "text_len" -> col("text_len"),
          shardCol -> col("__shard").as(shardCol))
        all.collect {
          case (n, c) if wanted.isEmpty || wanted(n) || n == keyCol ||
            n == shardCol => c
        }
      }: _*)
  }

  private def warcSliceFrame(spark: SparkSession, dir: String,
                             keyCol: String, shardCol: String,
                             only: Set[Long], wanted: Set[String],
                             splitRecords: Int): DataFrame = {
    import spark.implicits._
    val legal = Set(keyCol, shardCol, "url", "status", "mime", "payload",
      "payload_len")
    val unknown = wanted -- legal
    require(unknown.isEmpty,
      s"readWarcShards: unknown columns ${unknown.mkString(",")}; " +
        s"export has ${legal.mkString(",")}")
    val readPayload = wanted.isEmpty || wanted("payload")
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    cdxSlices(spark, dir, shardCol, only, splitRecords)
      .flatMap { case (shard, uri, start, len) =>
        sliceRecords(confB.value.value, uri, start, len,
          in => warcResponses(in, readPayload))
          .map { case (key, url, status, mime, body, plen) =>
            (key, url, status, mime, body, plen, shard) }
      }
      .toDF("__key", "url", "status", "mime", "payload", "payload_len",
        "__shard")
      .select({
        val all = Seq(
          keyCol -> col("__key").as(keyCol),
          "url" -> col("url"), "status" -> col("status"),
          "mime" -> col("mime"), "payload" -> col("payload"),
          "payload_len" -> col("payload_len"),
          shardCol -> col("__shard").as(shardCol))
        all.collect {
          case (n, c) if wanted.isEmpty || wanted(n) || n == keyCol ||
            n == shardCol => c
        }
      }: _*)
  }

  /** The CDX sidecar rows of a WARC export, with the owning container
    * file threaded through as `__uri` — the one parse of the sidecar
    * layout, shared by [[readWarcRecordIndex]] (drops `__uri`) and
    * [[readWarcRecords]] (seeks on it). */
  private def cdxFrame(spark: SparkSession, dir: String,
                       only: Set[Long], shardCol: String): DataFrame = {
    import spark.implicits._
    val tree = manifestTree(spark, dir)
    // both WARC-family formats carry the same sidecar shape; the keyed
    // FETCHERS gate on the specific format (cdxFormatKey), the index
    // itself is format-neutral
    require(Option(tree.get("format")).map(_.asText)
        .exists(f => f == "warc" || f == "wet"),
      s"manifest at $dir is not a WARC-family (warc/wet) export")
    require(Option(tree.get("cdx")).exists(_.asBoolean),
      s"the WARC-family export at $dir predates the CDX record index — " +
        "re-export to get keyed record access")
    val (hfs, root) = fs(spark, dir)
    val files = shardListing(hfs,
      hfs.listStatus(root).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$shardCol=") &&
        !st.getPath.getName.endsWith("__HIVE_DEFAULT_PARTITION__")),
      shardCol)
      .filter { case (shard, _, _) => only.isEmpty || only.contains(shard) }
      .flatMap { case (shard, _, fs_) => fs_.map { f =>
        val warc = hfs.makeQualified(f.getPath)
        val cdxP = new Path(f.getPath.getParent, s".${f.getPath.getName}.cdx")
        require(hfs.exists(cdxP),
          s"writeWarcShards CDX sidecar missing for $warc — " +
            "the export is corrupt or was pruned by a dot-file-stripping copy")
        (shard, warc.toString, hfs.makeQualified(cdxP).toString)
      } }
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    spark.createDataset(files)
      .repartition(readTasks(spark, files.size))
      .flatMap { case (shard, warcUri, cdxUri) =>
        val conf = confB.value.value
        val p = new Path(cdxUri)
        val in = p.getFileSystem(conf).open(p)
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try src.getLines().map { line =>
          val n = mapper.readTree(line)
          (n.get("key").asText, n.get("url").asText, shard, warcUri,
            n.get("offset").asLong, n.get("length").asLong)
        }.toVector // sidecar is metadata-sized; the payloads stay on disk
        finally in.close()
      }
      .toDF("key", "url", "shard", "__uri", "offset", "length")
  }

  /** The export's record index as a DataFrame — (key, url, shard,
    * offset, length), one row per record — response AND revisit records
    * both index (an export written with `revisitOfCol` interleaves the
    * two kinds; the CDX covers every keyed record) — read from the
    * dot-hidden CDX sidecars [[writeWarcShards]] writes beside each
    * container. Metadata-scaled (no payload byte is touched): the
    * url-dedup/blocklist passes that only need (key, url) run here
    * instead of a record-level container scan. Payload fetches of
    * revisit keys refuse in [[readWarcRecords]] (revisits carry no
    * payload) — read them via [[readWarcRevisits]]. */
  def readWarcRecordIndex(spark: SparkSession, dir: String,
                          shards: Seq[Long] = Nil,
                          shardCol: String = "shard"): DataFrame =
    cdxFrame(spark, dir, shards.toSet, shardCol)
      .select("key", "url", "shard", "offset", "length")

  /** Fetch NAMED records of a WARC export by key — one seek + one
    * member read per record, never a shard scan: the CDX sidecar maps
    * each key to its container file and (offset, length), gzip exports
    * are one MEMBER per record so the byte range is a self-contained
    * gunzip unit, and rows co-locate per container file (sorted by
    * offset, so a task's reads walk each file forward). This is the
    * selective re-read path a 100 TB crawl store needs — pulling k
    * records costs O(k) reads regardless of corpus size, and a single
    * huge container's selective reads PARALLELIZE across tasks even
    * though its sequential scan is one task. Output matches
    * [[readWarcShards]]: (key, url, status, mime, payload, payload_len,
    * shard). Unknown keys return no row (validate against
    * [[readWarcRecordIndex]] when presence matters). A key naming a
    * REVISIT record refuses loudly by name — revisits carry no payload
    * for this reader to fetch; read them via [[readWarcRevisits]] /
    * [[readWarcRevisitStream]]. */
  def readWarcRecords(spark: SparkSession, dir: String,
                      keys: Seq[String],
                      shardCol: String = "shard"): DataFrame = {
    import spark.implicits._
    val keyCol = cdxFormatKey(spark, dir, "warc", "readWarcRecords")
    cdxMemberBytes(spark, dir, keys, shardCol)
      .map { case (key, _, shard, uri, off, buf, gz) =>
        val recs = parseMember(buf, gz, in => warcResponses(in, true))
        if (recs.isEmpty) {
          // the member holds no response record — if it is a REVISIT the
          // CDX is fine and the CALLER asked for the wrong reader; say
          // so instead of surfacing a corruption-style cdx mismatch
          val revs = parseMember(buf, gz, warcRevisits)
          require(!revs.exists(_._1 == key),
            s"readWarcRecords: key '$key' names a REVISIT record " +
              s"(refers_to=${revs.find(_._1 == key).map(_._3).getOrElse("?")}) " +
              "— revisit records carry no payload to fetch; read them " +
              "via readWarcRevisits/readWarcRevisitStream")
        }
        require(recs.length == 1 && recs.head._1 == key,
          s"cdx mismatch at $uri:$off — expected one record for key " +
            s"'$key', got ${recs.map(_._1).mkString(",")}")
        val (k, u, st, mime, body, plen) = recs.head
        (k, u, st, mime, body, plen, shard)
      }
      .toDF(keyCol, "url", "status", "mime", "payload", "payload_len",
        shardCol)
  }

  /** [[readWarcRecords]] for the WET container: fetch named conversion
    * records by key — one seek + one member read each, spread across
    * tasks by (file, offset). Output matches [[readWetShards]]:
    * (key, url, text, text_len, shard). */
  def readWetRecords(spark: SparkSession, dir: String,
                     keys: Seq[String],
                     shardCol: String = "shard"): DataFrame = {
    import spark.implicits._
    val keyCol = cdxFormatKey(spark, dir, "wet", "readWetRecords")
    cdxMemberBytes(spark, dir, keys, shardCol)
      .map { case (key, _, shard, uri, off, buf, gz) =>
        val recs = parseMember(buf, gz, in => warcConversions(in, true))
        require(recs.length == 1 && recs.head._1 == key,
          s"cdx mismatch at $uri:$off — expected one record for key " +
            s"'$key', got ${recs.map(_._1).mkString(",")}")
        val (k, u, body, tlen) = recs.head
        (k, u, strictUtf8(body), tlen, shard)
      }
      .toDF(keyCol, "url", "text", "text_len", shardCol)
  }

  /** Manifest format gate for the keyed-fetch readers (a WET dir fed to
    * the response fetch would fail with a confusing zero-record
    * mismatch); returns the export's key column name. */
  private def cdxFormatKey(spark: SparkSession, dir: String,
                           want: String, caller: String): String = {
    val tree = manifestTree(spark, dir)
    require(Option(tree.get("format")).map(_.asText).contains(want),
      s"$caller: manifest at $dir is not a $want export")
    Option(tree.get("key")).map(_.asText).getOrElse("key")
  }

  /** One self-contained member per row, parsed off a byte array (gzip
    * exports are one member per record); close() releases the member's
    * native Inflater immediately — the underlying stream is a byte
    * array, nothing shared to protect. */
  private def parseMember[T](buf: Array[Byte], gz: Boolean,
                             parse: java.io.InputStream => Iterator[T])
      : Vector[T] = {
    val raw = new java.io.ByteArrayInputStream(buf)
    val in: java.io.InputStream =
      if (gz) new java.util.zip.GZIPInputStream(raw) else raw
    try parse(in).toVector finally in.close()
  }

  /** The keyed-fetch seek machinery shared by the warc and wet record
    * readers: CDX rows for the requested keys, hashed on (uri, offset)
    * so ONE huge container's reads spread across tasks, each partition
    * walking its files forward between reopens, one seek + one bounded
    * read per record. Emits (key, url, shard, uri, offset, member
    * bytes, isGzip). */
  private def cdxMemberBytes(spark: SparkSession, dir: String,
                             keys: Seq[String], shardCol: String)
      : Dataset[(String, String, Long, String, Long, Array[Byte], Boolean)] = {
    import spark.implicits._
    require(keys.nonEmpty, "keyed record fetch: pass at least one key")
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    cdxFrame(spark, dir, Set.empty, shardCol)
      .filter(col("key").isin(keys: _*))
      .repartition(readTasks(spark, keys.size), col("__uri"), col("offset"))
      .sortWithinPartitions(col("__uri"), col("offset"))
      .select("key", "url", "shard", "__uri", "offset", "length")
      .as[(String, String, Long, String, Long, Long)]
      .mapPartitions { it =>
        val conf = confB.value.value
        var curUri: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def closeIn(): Unit = if (in != null) { in.close(); in = null }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeIn()))
        it.map { case (key, url, shard, uri, off, len) =>
          if (uri != curUri) {
            closeIn()
            val p = new Path(uri)
            in = p.getFileSystem(conf).open(p)
            curUri = uri
          }
          require(len <= Int.MaxValue,
            s"cdx record of $len bytes exceeds one read buffer")
          in.seek(off)
          val buf = new Array[Byte](len.toInt)
          in.readFully(buf)
          (key, url, shard, uri, off, buf, uri.endsWith(".gz"))
        }
      }
  }

  /** STREAMING WARC ingest: new `.warc`/`.warc.gz` files landing under
    * `dir` (recursive) arrive as micro-batches of parsed response
    * records — Spark's file source supplies exactly-once file tracking
    * (checkpointed file log), [[warcResponses]] supplies the record
    * framing, so the incremental crawl pipeline composes directly:
    * `readWarcStream(...) → foreachBatch { mojibake gate → htmlExtract →
    * flaggers → appendShards(epoch = batchId) }` is exactly-once end to
    * end. Output schema matches [[readWarcShards]] minus the manifest
    * shard column: (key, url, status, mime, payload, payload_len, path).
    *
    * RECORD-GRANULAR memory: the binaryFile source supplies only FILE
    * TRACKING here — the projection keeps `path` alone, which the
    * binaryFile format prunes to a metadata listing (no `content`
    * column requested → the source reads no byte) — and the records
    * are then streamed off the filesystem by [[warcFileRecords]], one
    * record in memory at a time. A multi-GiB or unsharded foreign WARC
    * therefore neither hits binaryFile's 2 GiB single-cell ceiling nor
    * OOMs an executor; its only cost is PARALLELISM (one sequential
    * task per file), so shard crawl dumps for throughput, not for
    * memory. `maxFilesPerTrigger` is the ingest-rate lever. Also works
    * as a BATCH reader over a manifest-less directory of foreign WARCs
    * (`spark.read` path) via `streaming = false`. */
  def readWarcStream(spark: SparkSession, dir: String,
                     glob: String = "*.warc*",
                     streaming: Boolean = true,
                     options: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    containerPathSource(spark, dir, glob, streaming, options)
      .flatMap { path =>
        warcFileRecords(confB.value.value, path, readPayload = true)
          .map { case (key, url, status, mime, body, plen) =>
            (key, url, status, mime, body, plen, path) }
      }
      .toDF("key", "url", "status", "mime", "payload", "payload_len", "path")
  }

  /** [[readWarcStream]] for the WET container: the same checkpointed
    * path-only file tracking (no content column materialized, records
    * streamed one at a time off the filesystem), conversion records
    * surfacing as (key, url, text, text_len, path) with the
    * [[readWetShards]] strict-UTF-8 decode. The default glob matches
    * this writer's `part-00000.warc.wet[.gz]` files and Common Crawl's
    * `*.warc.wet.gz` naming. `streaming = false` returns the same frame
    * as a batch scan over the identical code path. */
  def readWetStream(spark: SparkSession, dir: String,
                    glob: String = "*.wet*",
                    streaming: Boolean = true,
                    options: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    containerPathSource(spark, dir, glob, streaming, options)
      .flatMap { path =>
        wetFileRecords(confB.value.value, path, readPayload = true)
          .map { case (key, url, body, tlen) =>
            (key, url, strictUtf8(body), tlen, path) }
      }
      .toDF("key", "url", "text", "text_len", "path")
  }

  /** [[readWarcStream]]'s `revisit` twin: the same checkpointed
    * path-only file tracking, surfacing revisit records as (key, url,
    * refers_to, profile, path) — so a streaming crawl ingest can feed
    * the crawler's own dup signal to the incremental-dedup path in the
    * same micro-batch cadence as the response rows. */
  def readWarcRevisitStream(spark: SparkSession, dir: String,
                            glob: String = "*.warc*",
                            streaming: Boolean = true,
                            options: Map[String, String] = Map.empty)
      : DataFrame = {
    import spark.implicits._
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    containerPathSource(spark, dir, glob, streaming, options)
      .flatMap { path =>
        warcRevisitFileRecords(confB.value.value, path)
          .map { case (key, url, refersTo, profile) =>
            (key, url, refersTo, profile, path) }
      }
      .toDF("key", "url", "refers_to", "profile", "path")
  }

  /** The WARC-family file-tracking source: a `binaryFile` scan used for
    * PATHS ONLY (the content column is never selected, so the 2 GiB
    * single-cell ceiling and whole-file memory never apply) — streaming
    * mode rides the checkpointed file log for exactly-once file
    * delivery; batch mode is the same path-pruned scan. */
  private def containerPathSource(spark: SparkSession, dir: String,
                                  glob: String, streaming: Boolean,
                                  options: Map[String, String])
      : Dataset[String] = {
    import spark.implicits._
    // binaryFile's schema is FIXED by the format, but the streaming file
    // source still demands it be declared up front (no inference pass)
    val binSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")
    val reader =
      if (streaming)
        spark.readStream.format("binaryFile")
          .schema(binSchema)
          .option("pathGlobFilter", glob)
          .option("recursiveFileLookup", "true")
          .options(options)
          .load(dir)
      else
        spark.read.format("binaryFile")
          .option("pathGlobFilter", glob)
          .option("recursiveFileLookup", "true")
          .options(options)
          .load(dir)
    reader.select(col("path")).as[String]
  }
}
