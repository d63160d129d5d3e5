package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Centered matrix-vector product: `y_j = dot(x, row_j) − offset_j` — the
  * PCA projection kernel (graft.ext.Pca), with the mean folded into the
  * per-component offsets (`offset_j = dot(μ, row_j)`) so the centering
  * costs nothing per row. Native codegen'd for the same reason as
  * [[DotProductExpr]]: this runs once per corpus vector on the projection
  * pass. The k×dim matrix rides as a flattened constructor parameter
  * (k·dim doubles — 8 KB at 16×64), broadcast by task serialization. */
case class MatVecExpr(child: Expression, flat: Array[Double],
                      offsets: Array[Double]) extends UnaryExpression
    with ExpectsInputTypes {

  require(offsets.nonEmpty && flat.length % offsets.length == 0,
    s"flat length ${flat.length} must be k=${offsets.length} × dim")

  // Array fields make the case-class equals/hashCode reference-based,
  // which would defeat Catalyst canonicalization (two projections built
  // from the same model would never compare equal, blocking subexpression
  // elimination). Content equality restores it.
  override def equals(other: Any): Boolean = other match {
    case MatVecExpr(c, f, o) =>
      c == child && java.util.Arrays.equals(f, flat) &&
        java.util.Arrays.equals(o, offsets)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(flat)),
      Integer.valueOf(java.util.Arrays.hashCode(offsets)))

  private def floatOrDoubleArray =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))

  override def inputTypes: Seq[AbstractDataType] = Seq(floatOrDoubleArray)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_matvec"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    MatVecExpr.compute(a.asInstanceOf[ArrayData], flat, offsets, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("mvFlat", flat, "double[]")
    val offRef = ctx.addReferenceObj("mvOff", offsets, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.MatVecExpr.compute(" +
        s"$c, $flatRef, $offRef, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecExpr =
    copy(child = newChild)
}

object MatVecExpr {
  def compute(vec: ArrayData, flat: Array[Double], offsets: Array[Double],
              isFloat: Boolean): ArrayData = {
    val k = offsets.length
    val dim = flat.length / k
    val n = vec.numElements()
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      var i = 0
      val lim = math.min(dim, n)
      while (i < lim) {
        val xv = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        acc += xv * flat(j * dim + i)
        i += 1
      }
      out(j) = acc - offsets(j)
      j += 1
    }
    new GenericArrayData(out)
  }
}
