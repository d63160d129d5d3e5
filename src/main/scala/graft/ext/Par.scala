package graft.ext

import org.apache.spark.sql.DataFrame

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
  * [[fanOutScan]] adds ONE round-robin exchange of the (pruned) input
  * when — and only when — the source's actual split count is below half
  * the session's shuffle parallelism. On well-split inputs (any real
  * 100 TB table: thousands of row groups) the condition is false and the
  * plan is untouched — there the exchange would move the payload to buy
  * parallelism the scan already has. The partition count is the session's
  * `spark.sql.shuffle.partitions`, never a constant, so the driver's
  * lower-core bench runs fan out to THEIR width. AQE never coalesces a
  * user-numbered repartition, so the downstream compute keeps its width
  * even when the shuffled bytes look tiny (the r17 pinForMining lesson).
  *
  * Round-robin assignment is deterministic under retry
  * (`spark.sql.execution.sortBeforeRepartition`, on by default) and every
  * consumer below is order-insensitive (aggregates, equi-joins, sorted
  * collects) — callers feeding order- or partition-SENSITIVE operators
  * (rand(), monotonically_increasing_id, unsorted collect_list/first)
  * must not use this.
  */
object Par {
  def fanOutScan(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sessionState.conf.numShufflePartitions
    // Decide from the ANALYZED plan's leaves, not from df.rdd: planning
    // the physical RDD here would run the whole analyzer/optimizer/
    // planner a second time per call (measured as +0.5–3 s regressions
    // on operators that build probe plans repeatedly, r20 b1), and it
    // would fire on MemoryStream batches and cached frames where the
    // exchange is pure overhead. Only all-file-relation plans qualify;
    // split count is estimated from file bytes vs maxPartitionBytes —
    // an OVERestimate for single-row-group files (row groups are atomic,
    // so the true task count can be lower), which only makes the fan-out
    // trigger more conservative, never at scale.
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val rels = leaves.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    if (rels.isEmpty || rels.size != leaves.size) return df
    val maxPB = spark.sessionState.conf.filesMaxPartitionBytes
    val bytes = rels.map(r => math.max(0L, r.relation.sizeInBytes)).sum
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
      df.repartition(n)
    } else df
  }
}
