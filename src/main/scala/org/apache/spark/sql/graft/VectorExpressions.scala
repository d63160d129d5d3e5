package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, TypeCollection}

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

/** Native expression producing the DISTINCT hashed word-`n`-gram shingle
  * set of a token array, as a sorted `array<long>`.
  *
  * The declarative formulation (`transform(sequence(...), i =>
  * concat_ws(...))` + `array_distinct`) is interpreted per element (Spark
  * never codegens lambdas) and materializes every shingle STRING, which then
  * rides the postings shuffle. This expression does one tight loop per row
  * — token hashes once, 64-bit chained window hashes, sort + dedup — and
  * emits 8-byte keys, so downstream groupBy-shingle shuffles carry longs
  * instead of ~30-byte strings. Hash collisions across distinct shingles
  * (~q²/2⁶⁴) are the standard similarity-join trade and cannot
  * realistically perturb a Jaccard count.
  */
case class ShingleHashExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hash"

  override def nullSafeEval(a: Any): Any =
    ShingleHashExpr.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.ShingleHashExpr.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)
}

object ShingleHashExpr {
  /** Tight-loop shingle hashing, shared by eval and codegen. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    // hash each token's UTF8 bytes once ...
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      th(i) =
        if (s == null) 0L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    // ... then chain-hash each n-window (token boundaries preserved by
    // construction: windows combine token HASHES, never raw bytes)
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}

/** Native expression producing the `bandsN` LSH band hashes of a hashed
  * shingle set in one pass: k MinHash minima (min over shingles of a
  * seed-chained 64-bit hash per permutation), then each band of `r = k /
  * bandsN` consecutive minima chain-hashed to one bucket key.
  *
  * Doing this inside a single map-side expression removes the whole
  * explode → 64-aggregate → groupBy(doc_id) signature SHUFFLE from the
  * MinHash-LSH plan: signatures never leave the row they came from. At
  * 100 TB that is one fewer full pass of the exploded shingle set over the
  * network — banding becomes scan-local work.
  */
case class MinHashBandsExpr(child: Expression, k: Int, bandsN: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1 && bandsN >= 1 && k % bandsN == 0,
    s"signature length $k must be a positive multiple of band count $bandsN")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_bands"

  override def nullSafeEval(a: Any): Any =
    MinHashBandsExpr.compute(a.asInstanceOf[ArrayData], k, bandsN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.MinHashBandsExpr.compute($c, $k, $bandsN);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

object MinHashBandsExpr {
  /** Empty shingle set → empty band array (the doc cannot collide). */
  def compute(shs: ArrayData, k: Int, bandsN: Int): ArrayData = {
    val m = shs.numElements()
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < m) {
      val g = shs.getLong(i)
      var p = 0
      while (p < k) {
        val h = XXH64.hashLong(g, p)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    val r = k / bandsN
    val out = new Array[Long](bandsN)
    var j = 0
    while (j < bandsN) {
      var h = 42L
      var q = 0
      while (q < r) { h = XXH64.hashLong(mins(j * r + q), h); q += 1 }
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native POSITIONAL window hashes: element `i` of the output is the
  * chained 64-bit hash of tokens `i .. i + w - 1` — [[ShingleHashExpr]]'s
  * window loop WITHOUT the sort/dedup tail, so the position survives (the
  * x100/x134 exact-substring family needs (pos, hash), not the set). One
  * tight loop per row: token bytes hash once, each window chains `w`
  * `hashLong` steps — no per-window string building, no slice/array_join
  * allocation, no interpreted lambda (the SQL formulation paid all three
  * per position; at w = 50 that was ~50 UTF8 copies per token). Token
  * boundaries are preserved by construction (windows combine token
  * HASHES); equal token sequences hash equal, so occurrence counting is
  * collision-equivalent to counting the window strings — the same trade
  * every hashed-key family member makes. Fewer than `w` tokens → empty
  * array. */
case class TokenWindowHashExpr(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 1, s"window width must be >= 1, got $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_token_window_hash"

  override def nullSafeEval(a: Any): Any =
    TokenWindowHashExpr.compute(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenWindowHashExpr.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashExpr =
    copy(child = newChild)
}

object TokenWindowHashExpr {
  /** Tight-loop positional window hashing, shared by eval and codegen. */
  def compute(toks: ArrayData, w: Int): ArrayData = {
    val m = toks.numElements()
    if (m < w) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      th(i) =
        if (s == null) 0L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val out = new Array[Long](m - w + 1)
    i = 0
    while (i <= m - w) {
      var h = 42L
      var j = 0
      while (j < w) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native sorted-merge intersection count of two SORTED DISTINCT long
  * arrays (the form [[ShingleHashExpr]] emits). One O(|a|+|b|) merge pass
  * per pair inside whole-stage codegen — the declarative
  * `size(array_intersect(a, b))` builds a hash set per row interpreted,
  * which is the hot inner loop of any verify-join similarity plan.
  * Inputs that are not sorted-distinct produce unspecified counts; every
  * graft caller passes ShingleHashExpr output, which is.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.SortedIntersectCountExpr.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Native 64-bit SimHash of a token array: per token, a 64-bit hash votes
  * ±1 on every bit position; the signature sets bit j iff the vote sum is
  * positive. One map-side loop per document — the aggregate formulation
  * (explode → 64 conditional sums → groupBy(doc)) pays a full shuffle of
  * the exploded token stream for the same arithmetic. Token hashing is
  * XXH64 with seed 42 over the UTF8 bytes — bit-identical to Spark's
  * `xxhash64(tok)`, so signatures match the aggregate formulation exactly.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any =
    SimHashExpr.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SimHashExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  def compute(toks: ArrayData): Long = {
    val counts = new Array[Int](64)
    val m = toks.numElements()
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Native signed-random-projection (SRP) sketch of an embedding vector:
  * bit `j` of the result is set iff `Σᵢ vᵢ·plane(j,i) > 0`, where
  * `plane(j,i) = ±1` is bit `j` of a deterministic 64-bit hash of the
  * dimension index `i` — every row on every executor derives the same
  * hyperplanes from the index alone, so the sketch needs no broadcast
  * state. Hamming distance between sketches estimates the angle:
  * `P(bit agrees) = 1 − θ/π` (Charikar's SimHash-for-cosine). One hash +
  * `nBits` adds per vector element, map-side, inside codegen.
  */
case class SrpSketchExpr(child: Expression, nBits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1, 64], got $nBits")

  // def, not val: TypeCollection is not serializable (see DotProductExpr)
  private def floatOrDoubleArray =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))

  override def inputTypes: Seq[AbstractDataType] = Seq(floatOrDoubleArray)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_srp_sketch"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    SrpSketchExpr.compute(a.asInstanceOf[ArrayData], elemIsFloat, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SrpSketchExpr.compute($c, $elemIsFloat, $nBits);")

  override protected def withNewChildInternal(newChild: Expression): SrpSketchExpr =
    copy(child = newChild)
}

object SrpSketchExpr {
  def compute(v: ArrayData, isFloat: Boolean, nBits: Int): Long = {
    val d = v.numElements()
    val acc = new Array[Double](nBits)
    var i = 0
    while (i < d) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      // one hash per element: bit j of the word is plane j's ±1 at index i
      val w = XXH64.hashLong(i.toLong, 1337L)
      var j = 0
      while (j < nBits) {
        acc(j) += (if (((w >>> j) & 1L) == 1L) x else -x)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < nBits) {
      if (acc(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Column-level entry points for graft's native vector expressions. */
/** DEFLATE-compressed byte length of a string's UTF-8 bytes — the
  * compressibility quality signal (Gopher/RefinedWeb use it to flag
  * templated/repetitive text that n-gram repetition ratios under-count and
  * natural text that they over-count). Level 6, raw-deflate (nowrap), so
  * the number is a pure function of the bytes on a given JDK zlib;
  * engine-specific → the catalog row is rows-only with an x108b bound
  * gate. Per-task state: one ThreadLocal (Deflater, 8 KiB sink) pair
  * reused via reset() — no per-row allocation, no native-handle churn on
  * a 100 TB scan. The sink is write-only scratch: deflate() output is
  * DISCARDED, only the produced-byte count accumulates. */
case class DeflateLenExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(a: Any): Any =
    DeflateLenExpr.compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.DeflateLenExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpr =
    copy(child = newChild)
}

object DeflateLenExpr {
  private val state =
    new ThreadLocal[(java.util.zip.Deflater, Array[Byte])] {
      override def initialValue(): (java.util.zip.Deflater, Array[Byte]) =
        (new java.util.zip.Deflater(6, true), new Array[Byte](8192))
    }

  def compute(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    val (d, sink) = state.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0
    while (!d.finished()) total += d.deflate(sink)
    total
  }
}

object VectorFunctions {
  /** Codegen'd dot product of two `array<float>` columns, as a double. */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd L2 norm. */
  def normF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))

  /** Codegen'd sorted distinct hashed n-gram shingles of a token array. */
  def shingleHashF(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashExpr(ColumnBridge.expression(toks), n))

  /** Codegen'd map-side MinHash-LSH band hashes of a hashed shingle set. */
  def minHashBandsF(shs: Column, k: Int, bandsN: Int): Column =
    ColumnBridge.column(MinHashBandsExpr(ColumnBridge.expression(shs), k, bandsN))

  /** Codegen'd map-side 64-bit SimHash of a token array. */
  def tokenWindowHashF(toks: Column, w: Int): Column =
    ColumnBridge.column(TokenWindowHashExpr(ColumnBridge.expression(toks), w))

  def simHashF(toks: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(toks)))

  /** Codegen'd sorted-merge intersection count of two sorted distinct
    * `array<long>` columns. */
  def sortedIntersectF(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd map-side signed-random-projection sketch of an embedding. */
  def srpSketchF(vec: Column, nBits: Int): Column =
    ColumnBridge.column(SrpSketchExpr(ColumnBridge.expression(vec), nBits))

  /** Codegen'd DEFLATE-compressed byte length of a string column. */
  def deflateLenF(text: Column): Column =
    ColumnBridge.column(DeflateLenExpr(ColumnBridge.expression(text)))
}
