package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column scan pruning: interleave
  * the bits of two min-max-normalized dimensions into one sort key, so a
  * range-partitioned, sorted write yields parquet row groups whose min/max
  * statistics are NARROW on BOTH columns at once — a filter on either
  * dimension (or both) prunes row groups, where a single-column sort only
  * serves its own column. At 100 TB this is the difference between
  * scanning a whole table and scanning the few files a two-dimensional
  * predicate actually touches.
  *
  * Everything is integer Column arithmetic (shifts, masks, DIV) — fully
  * codegen'd, no UDFs, and exactly reproducible by any engine with 64-bit
  * integer ops (the x196 oracle recomputes z-values in DuckDB).
  */
object Zorder {

  /** Spread the low 16 bits of `x` so bit i lands at position 2·i — the
    * classic mask ladder, in Column ops. Input must already be masked to
    * 16 bits ([[normalize16]] guarantees it). */
  private def spread16(x: Column): Column = {
    val s1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Min-max normalization of `c` onto [0, 65535] in pure BIGINT
    * arithmetic: `((c - lo) * 65535) div (hi - lo)`, with a degenerate
    * (constant) dimension collapsing to 0. `c` must lie in [lo, hi] —
    * the bounds come from the same frame's own aggregate. */
  private def normalize16(c: Column, lo: Column, hi: Column): Column =
    when(hi > lo,
      call_function("div", (c.cast("long") - lo) * lit(65535L), hi - lo))
      .otherwise(lit(0L))

  /** The 32-bit z-value of two normalized dimensions: `a`'s bits at even
    * positions, `b`'s at odd. */
  def zvalue2(a: Column, aLo: Column, aHi: Column,
              b: Column, bLo: Column, bHi: Column): Column =
    spread16(normalize16(a, aLo, aHi))
      .bitwiseOR(shiftleft(spread16(normalize16(b, bLo, bHi)), 1))

  /** `df` with a `zval` column over two integral dimensions. The bounds
    * come from one EAGER aggregate over `df` (a 1-row job at call time)
    * and enter the plan as literals — the z expression stays a pure
    * codegen'd function of the two columns with no join attached, and the
    * overflow check runs on the driver: ranges wider than 2^47 would make
    * `(c - lo) * 65535` wrap BIGINT in non-ANSI mode and cluster garbage
    * (an earlier in-plan `when`/`raise_error` guard cost 9× on the sort —
    * measured — which is why the check is driver-side). */
  def withZValue(df: DataFrame, colA: String, colB: String): DataFrame = {
    require(!df.columns.contains("zval"),
      "withZValue/clusterByZ reserve a 'zval' column (clusterByZ DROPS it " +
        "after sorting — an input column of that name would be lost); " +
        "rename yours first")
    val b = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    if (b.isNullAt(0) || b.isNullAt(2)) // empty (or all-null) frame
      return df.withColumn("zval", lit(0L))
    val (alo, ahi, blo, bhi) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    // The range itself can wrap Long (alo near MinValue, ahi near
    // MaxValue), which would make a naive `ahi - alo <= bound` check pass
    // on a negative wrapped value — compute it exactly and treat overflow
    // as the same refusal.
    def rangeOf(lo: Long, hi: Long): Long =
      try Math.subtractExact(hi, lo)
      catch { case _: ArithmeticException => Long.MaxValue }
    require(rangeOf(alo, ahi) <= Long.MaxValue / 65535L &&
      rangeOf(blo, bhi) <= Long.MaxValue / 65535L,
      "zorder: a dimension range exceeds 2^47 — (c-lo)*65535 would " +
        "overflow BIGINT; pre-bucket the column first")
    df.withColumn("zval", zvalue2(
      col(colA), lit(alo), lit(ahi), col(colB), lit(blo), lit(bhi)))
  }

  /** `df` clustered for a two-dimensional layout: range-partitioned and
    * sorted by z-value, so each output partition (and the parquet row
    * groups inside it) covers a small rectangle of (colA, colB) space —
    * write the result with any sink and both columns' footer statistics
    * prune. The z column is dropped; it is a layout key, not data. */
  def clusterByZ(df: DataFrame, colA: String, colB: String,
                 numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1")
    withZValue(df, colA, colB)
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
  }
}
