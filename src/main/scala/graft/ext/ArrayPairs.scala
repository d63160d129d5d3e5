package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared postings-list pair expansion: every ordered element pair (earlier
  * array position first) of an array column, as one flattened array —
  * `explode` it to get one row per pair. The off-by-one-sensitive slice
  * arithmetic (`slice` is 1-based, so the elements AFTER index i start at
  * i + 2) lives in exactly one place; Dedup postings, MinHash-LSH buckets,
  * sign-LSH buckets, and the media frame-fingerprint join all expand
  * through here. */
object ArrayPairs {
  def orderedPairs(ids: Column)(pair: (Column, Column) => Column): Column =
    flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + lit(2), size(ids)), b => pair(a, b))))
}
