package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark-side transform over the testdata dir plus an
  * optional DuckDB-equivalent oracle SQL (driver hash-matches the two at
  * sf0.01). Queries without an oracle get the driver's weaker rows-only check.
  *
  * Determinism contract (SURVEY.md §2.3): every query ends in a total-order
  * `orderBy`; float aggregations are canonicalized (exact decimal sums or
  * explicit rounding) so Spark and DuckDB produce bit-identical values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
