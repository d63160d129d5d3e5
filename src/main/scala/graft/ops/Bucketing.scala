package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location: the shuffle-elimination tool for REPEATED
  * large-to-large equi-joins — the fact-to-fact shape (lineitem ⋈ orders)
  * where neither side broadcasts and a per-query shuffle of both sides is
  * the dominant cost at 100 TB.
  *
  * Writing both sides `bucketBy(n, key).sortBy(key)` pins each side's
  * layout to `hash(key) mod n` files per partition; a later equi-join of
  * two tables bucketed on the join key with the SAME bucket count reads
  * matching buckets pairwise — NO Exchange on either side of the
  * SortMergeJoin (BucketingSpec pins the plan), every query, forever. The
  * shuffle is paid ONCE at write time, amortized across every downstream
  * join — the static sibling of AQE's runtime choices and the persisted
  * sibling of `repartition` co-location, which lasts only one plan.
  *
  * Bucketed layout lives in the session catalog (`saveAsTable` — bucketing
  * is metadata the reader must trust, so path-based `parquet(dir)` writes
  * cannot carry it). Use for curated, repeatedly-joined artifacts (the
  * exported corpus keyed by doc_id, span tables keyed by app); one-shot
  * joins should keep the plain shuffle — a bucketed write costs exactly
  * that shuffle anyway. */
object Bucketing {

  /** Write `df` bucketed and sorted by `key` as catalog table `table`
    * (replacing it). `buckets` must match across every table this one will
    * join against — bucket-join co-location requires equal counts (or an
    * integer multiple with `spark.sql.bucketing.coalesceBucketsInJoin`). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(df.columns.contains(key),
      s"bucket key '$key' not in ${df.columns.mkString(",")}")
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucket-count tables on their bucket key: with
    * co-located layouts the planner emits a SortMergeJoin with ZERO
    * exchanges (and, with `sortBy` layouts, no per-task sort of the
    * larger side's rows beyond the bucket-file merge). Row-identical to
    * the plain join of the same frames. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
