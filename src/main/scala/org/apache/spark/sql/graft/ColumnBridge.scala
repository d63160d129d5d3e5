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

/** Imperative SQL-function registration for sessions created without
  * `spark.sql.extensions` (the extensions path is [[graft.GraftExtensions]]).
  * Needs the sql namespace: `sessionState.functionRegistry` is private[sql]. */
object FunctionRegistration {
  def registerGraftFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", exprs => {
          require(exprs.length == 2,
            s"graft_dot requires exactly 2 arguments, got ${exprs.length}")
          DotProductExpr(exprs(0), exprs(1))
        }, "scala_udf")
}
