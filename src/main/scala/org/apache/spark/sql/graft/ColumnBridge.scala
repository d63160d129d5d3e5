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

/** Bridge for Dataset internals the public API does not expose: freeing the
  * storage blocks behind a `localCheckpoint(eager = true)`. `Dataset
  * .unpersist()` only uncaches CacheManager entries (from `persist()`), so a
  * checkpoint-per-round loop (e.g. iterative label propagation) would leak
  * executor storage linearly with rounds without this. */
object DatasetInternals {

  /** Unpersist the RDD backing a locally-checkpointed Dataset. No-op for
    * frames that are not checkpoint-backed. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.collectFirst {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
      }.foreach(_.unpersist(blocking = false))
}

/** Imperative SQL-function registration for sessions created without
  * `spark.sql.extensions` (the extensions path is [[graft.GraftExtensions]]).
  * Needs the sql namespace: `sessionState.functionRegistry` is private[sql]. */
object FunctionRegistration {

  /** Integer literal argument of a SQL function call (widths/counts must be
    * plan-time constants — they size codegen'd loops). */
  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  /** The SQL builders, shared by temp registration and the extensions path
    * (public: `graft.GraftExtensions` lives outside this package tree). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { exprs =>
      require(exprs.length == 2,
        s"graft_dot requires exactly 2 arguments, got ${exprs.length}")
      DotProductExpr(exprs(0), exprs(1))
    },
    "graft_shingle_hash" -> { exprs =>
      require(exprs.length == 2,
        s"graft_shingle_hash requires (tokens, n), got ${exprs.length} arguments")
      ShingleHashExpr(exprs(0), litInt(exprs(1), "graft_shingle_hash", "n"))
    },
    "graft_minhash_bands" -> { exprs =>
      require(exprs.length == 3,
        s"graft_minhash_bands requires (shingles, k, bands), got ${exprs.length} arguments")
      MinHashBandsExpr(exprs(0),
        litInt(exprs(1), "graft_minhash_bands", "k"),
        litInt(exprs(2), "graft_minhash_bands", "bands"))
    },
    "graft_token_window_hash" -> { exprs =>
      require(exprs.length == 2,
        s"graft_token_window_hash requires (tokens, w), got ${exprs.length} arguments")
      TokenWindowHashExpr(exprs(0), litInt(exprs(1), "graft_token_window_hash", "w"))
    },
    "graft_simhash" -> { exprs =>
      require(exprs.length == 1,
        s"graft_simhash requires exactly 1 argument, got ${exprs.length}")
      SimHashExpr(exprs(0))
    },
    "graft_sorted_intersect" -> { exprs =>
      require(exprs.length == 2,
        s"graft_sorted_intersect requires exactly 2 arguments, got ${exprs.length}")
      SortedIntersectCountExpr(exprs(0), exprs(1))
    },
    "graft_srp_sketch" -> { exprs =>
      require(exprs.length == 2,
        s"graft_srp_sketch requires (vector, nBits), got ${exprs.length} arguments")
      SrpSketchExpr(exprs(0), litInt(exprs(1), "graft_srp_sketch", "nBits"))
    },
    "graft_deflate_len" -> { exprs =>
      require(exprs.length == 1,
        s"graft_deflate_len requires exactly 1 argument, got ${exprs.length}")
      DeflateLenExpr(exprs(0))
    })

  def registerGraftFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
