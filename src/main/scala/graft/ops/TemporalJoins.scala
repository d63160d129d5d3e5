package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, re-expressed as
  * shuffle-friendly compositions (SURVEY §2.2 / builder brief: "compose
  * existing ops if semantics allow" beats a custom physical operator here).
  */
object TemporalJoins {

  /** As-of join: for every left row, the single latest right row of the same
    * key with `rightTs <= leftTs` (inclusive). Implemented as the classic
    * union + ignore-nulls running-last window:
    *
    *   - tag right rows 0 and left rows 1, union on (key, ts, tag, tieId);
    *   - per key, ordered by (ts, tag, tieId), `last(value, ignoreNulls)`
    *     over the unbounded-preceding frame carries the newest right value
    *     forward; right-before-left at equal ts makes the match inclusive,
    *     and tieId makes duplicate right timestamps deterministic (greatest
    *     id wins);
    *   - keep the left rows.
    *
    * One shuffle on the key, one sort per key partition — never a per-row
    * range probe, never a nested loop. Left rows with no earlier right row
    * get nulls (left-outer semantics).
    *
    * @param valueCols right-side columns to carry (qualified names in the
    *                  output as given)
    */
  def joinAsOf(left: DataFrame, leftKey: String, leftTs: String, leftId: String,
               right: DataFrame, rightKey: String, rightTs: String, rightId: String,
               valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns
    val l = left.select(
      Seq(col(leftKey).as("_k"), col(leftTs).as("_t"), lit(1).as("_tag"),
        col(leftId).as("_tie")) ++
        lCols.map(c => col(c)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      Seq(col(rightKey).as("_k"), col(rightTs).as("_t"), lit(0).as("_tag"),
        col(rightId).as("_tie")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col(_)): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_tag").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (Seq(col("_k"), col("_t"), col("_tag"), col("_tie")) ++
          lCols.map(col(_)) ++
          valueCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)
    carried.filter(col("_tag") === 1).drop("_k", "_t", "_tag", "_tie")
  }

  /** Range join: left rows matched to right rows of the same key with
    * `rightTs ∈ [leftTs, leftTs + windowMs)`. Implemented as a bucketed
    * equi-join: right rows land in time bucket `rightTs div windowMs`; each
    * left row probes its own bucket and the next (a window of width W can
    * only span two W-aligned buckets), then the exact range predicate
    * filters. One equi-join shuffle — never a broadcast nested loop. */
  def joinRange(left: DataFrame, leftKey: String, leftTs: String,
                right: DataFrame, rightKey: String, rightTs: String,
                windowMs: Long): DataFrame = {
    val l = left
      .withColumn("_bucket",
        explode(array(col(leftTs).divide(windowMs).cast("long"),
          col(leftTs).divide(windowMs).cast("long") + 1)))
      .withColumnRenamed(leftKey, "_k")
    val r = right
      .withColumn("_rbucket", col(rightTs).divide(windowMs).cast("long"))
      .withColumnRenamed(rightKey, "_rk")
    l.join(r, col("_k") === col("_rk") && col("_bucket") === col("_rbucket"))
      .filter(col(rightTs) >= col(leftTs) && col(rightTs) < col(leftTs) + windowMs)
      .drop("_bucket", "_rbucket", "_rk")
      .withColumnRenamed("_k", leftKey)
  }
}
