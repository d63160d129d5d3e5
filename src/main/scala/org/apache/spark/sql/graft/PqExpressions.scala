package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, TypeCollection}

/** Product-quantization kernels (graft.ext.Pq), as native codegen'd
  * expressions so both the encode pass and the ADC scoring scan stay inside
  * whole-stage codegen — the same motivation as [[DotProductExpr]]: the
  * declarative `transform`/`aggregate` formulation is interpreted per
  * element, and these two kernels sit on the corpus-sized hot paths (encode
  * touches every vector once; ADC touches every candidate pair).
  *
  * The codebook rides each expression as a flattened `Array[Double]`
  * constructor parameter (m·k·subDim doubles ≈ 8 KB at the defaults) — task
  * serialization broadcasts it exactly like a literal, so no join or shuffle
  * carries codebook bytes.
  */

/** PQ encode: nearest codebook entry per subspace → `array<int>` of `m`
  * codes. Assignment mirrors `Ivf.clusterOf`'s rule — argmax(x·c − |c|²/2)
  * (= argmin L2) with lowest-code tie-break — so Pq and Ivf quantizers make
  * identical choices on identical inputs. */
case class PqCodeExpr(child: Expression, flat: Array[Double], m: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(m >= 1 && k >= 1, s"need m >= 1 and k >= 1, got m=$m k=$k")
  require(flat.length % (m * k) == 0,
    s"flat codebook length ${flat.length} must be m*k*subDim")

  // content (not reference) equality on the Array field — see MatVecExpr:
  // required for Catalyst canonicalization/subexpression elimination
  override def equals(other: Any): Boolean = other match {
    case PqCodeExpr(c, f, mm, kk) =>
      c == child && mm == m && kk == k && java.util.Arrays.equals(f, flat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(m), Integer.valueOf(k),
      Integer.valueOf(java.util.Arrays.hashCode(flat)))

  private def floatOrDoubleArray =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))

  override def inputTypes: Seq[AbstractDataType] = Seq(floatOrDoubleArray)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_code"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // constants of the codebook, hoisted out of the per-row encode loop
  // (recomputing |c|² per row would double the arithmetic of the
  // corpus-sized encode pass); transient — rebuilt after task
  // deserialization on first use
  @transient private lazy val halfNorms2: Array[Double] =
    PqCodeExpr.halfNorms2Of(flat, m, k)

  override def nullSafeEval(a: Any): Any =
    PqCodeExpr.compute(a.asInstanceOf[ArrayData], flat, halfNorms2, m, k,
      elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("pqHalfN2", halfNorms2, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.PqCodeExpr.compute(" +
        s"$c, $flatRef, $normRef, $m, $k, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodeExpr =
    copy(child = newChild)
}

object PqCodeExpr {
  /** `|codebook[s][c]|² / 2` in code-index layout — the constant term of
    * the argmax(x·c − |c|²/2) assignment score. */
  def halfNorms2Of(flat: Array[Double], m: Int, k: Int): Array[Double] = {
    val subDim = flat.length / (m * k)
    val out = new Array[Double](m * k)
    var idx = 0
    while (idx < out.length) {
      var n2 = 0.0
      var i = 0
      while (i < subDim) { val v = flat(idx * subDim + i); n2 += v * v; i += 1 }
      out(idx) = n2 / 2
      idx += 1
    }
    out
  }

  /** Tight-loop nearest-centroid-per-subspace, shared by eval and codegen.
    * A vector shorter than m·subDim is padded with zeros implicitly (reads
    * beyond its end contribute 0 to the dot product). */
  def compute(vec: ArrayData, flat: Array[Double], halfNorms2: Array[Double],
              m: Int, k: Int, isFloat: Boolean): ArrayData = {
    val subDim = flat.length / (m * k)
    val n = vec.numElements()
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        val base = (s * k + c) * subDim
        var dot = 0.0
        var i = 0
        while (i < subDim) {
          val pos = s * subDim + i
          val xv =
            if (pos >= n) 0.0
            else if (isFloat) vec.getFloat(pos).toDouble
            else vec.getDouble(pos)
          dot += xv * flat(base + i)
          i += 1
        }
        val score = dot - halfNorms2(s * k + c)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}

/** Per-query ADC lookup table: `lut[s*k + c] = dot(query_subspace_s,
  * codebook[s][c])` as one `array<double>` of m·k entries. Evaluated once
  * per QUERY row (the broadcast side of the ADC join), never per pair. */
case class PqLutExpr(child: Expression, flat: Array[Double], m: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(m >= 1 && k >= 1, s"need m >= 1 and k >= 1, got m=$m k=$k")
  require(flat.length % (m * k) == 0,
    s"flat codebook length ${flat.length} must be m*k*subDim")

  // content (not reference) equality on the Array field — see MatVecExpr
  override def equals(other: Any): Boolean = other match {
    case PqLutExpr(c, f, mm, kk) =>
      c == child && mm == m && kk == k && java.util.Arrays.equals(f, flat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(m), Integer.valueOf(k),
      Integer.valueOf(java.util.Arrays.hashCode(flat)))

  private def floatOrDoubleArray =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))

  override def inputTypes: Seq[AbstractDataType] = Seq(floatOrDoubleArray)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_pq_lut"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    PqLutExpr.compute(a.asInstanceOf[ArrayData], flat, m, k, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.PqLutExpr.compute(" +
        s"$c, $flatRef, $m, $k, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

object PqLutExpr {
  def compute(vec: ArrayData, flat: Array[Double], m: Int, k: Int,
              isFloat: Boolean): ArrayData = {
    val subDim = flat.length / (m * k)
    val n = vec.numElements()
    val lut = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val base = (s * k + c) * subDim
        var dot = 0.0
        var i = 0
        while (i < subDim) {
          val pos = s * subDim + i
          val xv =
            if (pos >= n) 0.0
            else if (isFloat) vec.getFloat(pos).toDouble
            else vec.getDouble(pos)
          dot += xv * flat(base + i)
          i += 1
        }
        lut(s * k + c) = dot
        c += 1
      }
      s += 1
    }
    new GenericArrayData(lut)
  }
}

/** ADC gather-sum: `Σ_s lut[s*k + codes[s]]` — the asymmetric-distance
  * kernel of the candidate scan. With `lut` the per-query dot table this is
  * the approximate `query · reconstruct(x)`; with a per-model squared-norm
  * table it is `|reconstruct(x)|²`. m table lookups and adds per pair —
  * versus dim multiplies for the exact dot — is PQ's entire speed story. */
case class PqAdcExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(k >= 1, s"need k >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqAdcExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.PqAdcExpr.compute($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

object PqAdcExpr {
  def compute(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    val nLut = lut.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      val idx = s * k + codes.getInt(s)
      if (idx < nLut) acc += lut.getDouble(idx)
      s += 1
    }
    acc
  }
}

object PqFunctions {
  import org.apache.spark.sql.Column

  /** Codegen'd PQ encode of an embedding column → `array<int>` of m codes. */
  def pqCodeF(vec: Column, model: graft.ext.Pq.PqModel): Column =
    ColumnBridge.column(PqCodeExpr(ColumnBridge.expression(vec),
      model.flat, model.m, model.k))

  /** Codegen'd per-query ADC lookup table → `array<double>` of m·k dots. */
  def pqLutF(vec: Column, model: graft.ext.Pq.PqModel): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(vec),
      model.flat, model.m, model.k))

  /** Codegen'd ADC gather-sum of a codes column against a LUT column. */
  def pqAdcF(codes: Column, lut: Column, k: Int): Column =
    ColumnBridge.column(PqAdcExpr(ColumnBridge.expression(codes),
      ColumnBridge.expression(lut), k))
}
