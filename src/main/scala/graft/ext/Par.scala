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
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    val cur = df.rdd.getNumPartitions
    if (cur * 2 <= target) df.repartition(target) else df
  }
}
