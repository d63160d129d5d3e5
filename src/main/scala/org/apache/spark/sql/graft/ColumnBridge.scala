package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters, so graft's
  * native Catalyst expressions can surface as `Column`s. Same namespace
  * technique the reference uses for `SparkEnv` access
  * (ref `org/apache/spark/sql/streaming/qubole/.../StreamingLensMetricsReporter.scala:19,54`).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
