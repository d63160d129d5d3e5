package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponentially-discounted aggregation, generalizing the reference's
  * discounted state average (qubole/streaminglens
  * `helper/StreamingLensReportingHelper.scala:180-197`): the most recent
  * observation gets weight 1, the next `discount`, then `discount²`, …, and
  * the score is the weighted mean.
  */
object Discounted {

  /** Per-key discounted mean of `valueCol`, most-recent-first by `orderCols`.
    *
    * `row_number` over the key descending by `orderCols` gives the recency
    * rank (1 = newest, matching the reference's `(1 to n).reverse` zip at
    * `StreamingLensReportingHelper.scala:186-188`); weight = discount^(rank−1).
    * The score is rounded to 4 decimals — pinned here AND in the DuckDB
    * oracle so float summation-order noise cannot flip the hash.
    *
    * Output: `keyCol`, `score: double` (round 4), `n: long`.
    */
  def discountedMean(df: DataFrame, keyCol: String, orderCols: Seq[String],
                     valueCol: String, discount: Double): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col(_).desc): _*)
    df
      .withColumn("rn", row_number().over(w))
      .withColumn("wt", pow(lit(discount), col("rn") - 1))
      .groupBy(col(keyCol))
      .agg(
        round(sum(col(valueCol) * col("wt")) / sum(col("wt")), 4).as("score"),
        count(lit(1)).as("n"))
  }
}
