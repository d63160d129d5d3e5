package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonicalization helpers for oracle (DuckDB) hash-parity.
  *
  * Large double sums are order-dependent at ~n·eps relative error, which can
  * flip a rounded digit between engines. Casting each addend to an exact
  * decimal first makes the aggregation associative and bit-identical in both
  * engines; the final cast back to double is a deterministic IEEE conversion.
  */
object Canon {
  /** Exact decimal sum of a double column, emitted as double.
    * DuckDB twin: CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE). */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)
}
