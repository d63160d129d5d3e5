package graft.ext

import org.apache.spark.sql.{Column, DataFrame}

/** Scan fan-out for compute-heavy passes over under-split sources
  * (guide §2.5 "input skew": one huge unsplittable file → repartition
  * immediately after the read).
  *
  * A parquet file with a single row group yields a single scan task no
  * matter the core count — row groups are atomic split units — so every
  * map-side expression over it (tokenization, vector math, per-column
  * canonicalization) serializes onto one core. The bench fixtures are
  * exactly this shape: every sf table ships as one row group, so a
  * "parallel" 32-core pass was running 1-wide before the first exchange.
  *
  * [[fanOutScan]] adds ONE exchange of the (pruned) input when — and only
  * when — the source's actual split count is below half the session's
  * shuffle parallelism. On well-split inputs (any real 100 TB table:
  * thousands of row groups) the condition is false and the plan is
  * untouched — there the exchange would move the payload to buy
  * parallelism the scan already has. The partition count is bounded by
  * the session's `spark.sql.shuffle.partitions`, never a constant, so the
  * driver's lower-core bench runs fan out to THEIR width. AQE never
  * coalesces a user-numbered repartition, so the downstream compute keeps
  * its width even when the shuffled bytes look tiny (the r17 pinForMining
  * lesson).
  *
  * Two exchange flavors:
  *   - `fanOutScan(df, key)` hash-partitions on the caller's key (a doc/
  *     vec id — unique or near-unique, so 20–100× more distinct values
  *     than partitions spreads evenly, guide §2.5). Preferred: a HASH
  *     exchange ships rows as-is, while a keyless round-robin first pays a
  *     LOCAL SORT of its input (`spark.sql.execution.sortBeforeRepartition`,
  *     on by default so retried tasks reproduce their row-to-partition
  *     assignment) — sorting full document rows costs more than the
  *     exchange itself on text corpora (measured r21: the x08/x112 shingle
  *     family).
  *   - `fanOutScan(df)` keeps the round-robin form for callers with no
  *     natural key (generic frames, e.g. Audit.profileFrame). Round-robin
  *     is deterministic under retry thanks to that same local sort.
  *
  * Every consumer downstream of a fan-out is order- and partition-
  * insensitive (aggregates, equi-joins, sorted collects) — callers feeding
  * order- or partition-SENSITIVE operators (rand(),
  * monotonically_increasing_id, unsorted collect_list/first) must not use
  * this.
  */
object Par {
  def fanOutScan(df: DataFrame): DataFrame = fanOut(df, None)
  def fanOutScan(df: DataFrame, key: Column): DataFrame = fanOut(df, Some(key))

  private def fanOut(df: DataFrame, key: Option[Column]): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sessionState.conf.numShufflePartitions
    // Decide from the analyzed plan's leaves AFTER cache substitution, not
    // from df.rdd: planning the physical RDD here would run the whole
    // analyzer/optimizer/planner a second time per call (measured as
    // +0.5–3 s regressions on operators that build probe plans repeatedly,
    // r20 b1), and it would fire on MemoryStream batches. withCachedData
    // (rather than analyzed) means a persisted frame's leaves are already
    // InMemoryRelations here, so the all-file-relation check below makes
    // the helper a no-op on cached data — where the cached blocks are
    // already split and the exchange is pure overhead. Only
    // all-file-relation plans qualify; split count is estimated from file
    // bytes vs maxPartitionBytes — an OVERestimate for single-row-group
    // files (row groups are atomic, so the true task count can be lower),
    // which only makes the fan-out trigger more conservative, never at
    // scale.
    val leaves = df.queryExecution.withCachedData.collectLeaves()
    val rels = leaves.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    if (rels.isEmpty || rels.size != leaves.size) return df
    val maxPB = spark.sessionState.conf.filesMaxPartitionBytes
    // Saturating sum, and bail out on any default/unknown leaf size: a
    // stats-less relation reports defaultSizeInBytes (Long.MaxValue), which
    // raw summation overflows into a NEGATIVE total — est=1 would fire the
    // trigger and bytes>>14 clamps to 4, repartitioning an arbitrarily
    // large frame down to 4 partitions.
    val unknownFloor = Long.MaxValue / 4
    var bytes = 0L
    var unknown = false
    rels.foreach { r =>
      val s = r.relation.sizeInBytes
      if (s < 0 || s >= unknownFloor) unknown = true
      else bytes = math.min(unknownFloor, bytes + s)
    }
    if (unknown || bytes >= unknownFloor) return df
    val est = math.max(1L, bytes / maxPB)
    if (est * 2 <= target) {
      // Partition count follows the INPUT SIZE (~16 KB of source bytes
      // per task, clamped to [4, shuffle parallelism]): the compute-heavy
      // passes this helper serves want one task per core at the bench SF
      // — COMPRESSED bytes badly understate per-row compute (tokenize,
      // vector math), so the per-task quantum must be small; 128 KB/task
      // fanned the 594 KB documents fixture only 4 wide and re-serialized
      // the tokenize passes (measured +0.5–2 s on the shingle/sketch
      // family). The tiny correctness SFs (50-row sf0.001 frames) still
      // stay at the 4-task floor instead of 32 empty tasks per query —
      // measured as whole minutes across a 300-query Verify sweep.
      val n = math.max(4L, math.min(target.toLong, bytes >> 14)).toInt
      key match {
        case Some(k) => df.repartition(n, k)
        case None => df.repartition(n)
      }
    } else df
  }
}
