package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, MatVecExpr}

/** Principal-component projection for embedding columns — the standard
  * dimensionality-reduction pass of a large-scale embedding pipeline
  * (64 → 16 dims before ANN indexing quarters every downstream shuffle,
  * index, and distance computation; also the whitening precursor of OPQ).
  *
  * Shape: training is driver-side on the ONE seeded sample definition
  * ([[Ivf.collectSample]] — the same sample IVF and PQ train on), so the
  * model is deterministic and tiny (k×dim doubles); the projection is one
  * map-side pass through the codegen'd [[MatVecExpr]] kernel with the mean
  * folded into per-component offsets — no shuffle, no UDF, whatever the
  * corpus size. The eigen-solver is orthogonal (simultaneous power)
  * iteration with Gram–Schmidt re-orthonormalization on the 64×64 sample
  * covariance — fixed iteration count, deterministic basis init, and a
  * sign convention (largest-|coordinate| entry positive), so components
  * cannot flip between runs or engines. On a near-uniform spectrum
  * (adjacent eigenvalue ratios → 1, the fixture's case) individual
  * eigenvectors converge slowly but the spanned SUBSPACE — what variance
  * capture depends on — converges fast; per-vector residuals are asserted
  * RELATIVELY in PcaSpec.
  */
object Pca {

  /** A trained PCA model: sample mean, the k orthonormal components
    * (row-major `flat`, each row unit-norm), their eigenvalues (sample
    * variances along each component, descending), and the total sample
    * variance (trace of the covariance) — `explained.sum / totalVar` is
    * the variance-explained ratio. */
  final case class PcaModel(mean: Array[Double], flat: Array[Double],
                            explained: Array[Double], totalVar: Double) {
    def k: Int = explained.length
    def dim: Int = if (explained.isEmpty) 0 else flat.length / explained.length
    def isEmpty: Boolean = explained.isEmpty
  }

  /** Train a k-component model on the seeded sample. Empty corpus → empty
    * model (callers short-circuit). `iters` is the orthogonal-iteration
    * count; the 300 default buys convergence margin on near-degenerate
    * spectra (adjacent eigenvalues within ~1e-3 of each other, where
    * per-round contraction is slow) and is still sub-millisecond on a
    * 64-dim covariance. */
  def train(emb: DataFrame, nComponents: Int, iters: Int = 300,
            sampleCap: Int = Ivf.defaultSampleCap): PcaModel =
    trainFromSample(Ivf.collectSample(emb, sampleCap), nComponents, iters)

  /** [[train]] on a PRE-COLLECTED [[Ivf.collectSample]] sample — pipelines
    * training several sample-based models (PCA at multiple k, PQ codebooks,
    * IVF centroids) collect the one seeded sample once and fan it out, so
    * the corpus-wide sampling job never repeats per model. */
  def trainFromSample(sample: Array[Array[Double]], nComponents: Int,
                      iters: Int = 300): PcaModel = {
    require(nComponents >= 1, s"need nComponents >= 1, got $nComponents")
    if (sample.isEmpty)
      return PcaModel(Array.emptyDoubleArray, Array.emptyDoubleArray,
        Array.emptyDoubleArray, 0.0)
    val dim = sample.iterator.map(_.length).max
    val k = math.min(nComponents, dim)
    val n = sample.length
    val mean = new Array[Double](dim)
    sample.foreach { v =>
      var i = 0
      while (i < v.length) { mean(i) += v(i); i += 1 }
    }
    var i = 0
    while (i < dim) { mean(i) /= n; i += 1 }
    // sample covariance (biased 1/n — only ratios matter downstream)
    val cov = Array.ofDim[Double](dim, dim)
    // preallocated centered-row scratch (identical values/order to the old
    // per-row tabulate — r21 drops the per-sample allocation, not the math)
    val dScratch = new Array[Double](dim)
    sample.foreach { v =>
      var j = 0
      while (j < dim) {
        dScratch(j) = (if (j < v.length) v(j) else 0.0) - mean(j); j += 1
      }
      var a = 0
      while (a < dim) {
        val da = dScratch(a)
        val rowA = cov(a)
        var b = a
        while (b < dim) { rowA(b) += da * dScratch(b); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < dim) {
      var b = a
      while (b < dim) {
        cov(a)(b) /= n
        cov(b)(a) = cov(a)(b)
        b += 1
      }
      a += 1
    }
    val totalVar = (0 until dim).map(j => cov(j)(j)).sum
    // orthogonal iteration: B ← orth(C·B), deterministic basis init
    var basis = Array.tabulate(k)(j => Array.tabulate(dim)(i => if (i == j) 1.0 else 0.0))
    for (_ <- 1 to iters) {
      val mul = basis.map(matVec(cov, _))
      basis = gramSchmidt(mul)
    }
    // eigenvalues, descending order enforced, sign convention applied
    val withEig = basis.map { b =>
      val cb = matVec(cov, b)
      val eig = dot(b, cb)
      (signFix(b), eig)
    }.sortBy { case (_, e) => -e }
    PcaModel(mean, withEig.flatMap(_._1.toSeq), withEig.map(_._2), totalVar)
  }

  /** Left-to-right dot product — the exact summation order of the old
    * `zip.map.sum` chain (sequential fold), so every model this file
    * trains stays BIT-IDENTICAL to the pre-r21 kernels (PcaSpec pins
    * round-trips); the while form just drops the boxing and the three
    * intermediate arrays per call. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
    m.map(row => dot(row, v))

  /** Gram–Schmidt with re-normalization; a vector that collapses to ~zero
    * (degenerate covariance) is replaced by the zero vector and carries
    * zero variance. */
  private def gramSchmidt(vs: Array[Array[Double]]): Array[Array[Double]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    vs.foreach { v0 =>
      val v = v0.clone()
      out.foreach { u =>
        val d = dot(v, u)
        var i = 0
        while (i < v.length) { v(i) -= d * u(i); i += 1 }
      }
      val nrm = math.sqrt(dot(v, v))
      out += (if (nrm < 1e-12) new Array[Double](v.length) else v.map(_ / nrm))
    }
    out.toArray
  }

  /** Deterministic sign: the largest-|coordinate| entry is positive. */
  private def signFix(v: Array[Double]): Array[Double] = {
    var best = 0
    var i = 1
    while (i < v.length) { if (math.abs(v(i)) > math.abs(v(best))) best = i; i += 1 }
    if (v(best) < 0) v.map(-_) else v
  }

  /** The codegen'd projection column: `array<double>` of k centered
    * principal coordinates. */
  def projectCol(vec: Column, model: PcaModel): Column = {
    val offsets = Array.tabulate(model.k) { j =>
      val dim = model.dim
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += model.mean(i) * model.flat(j * dim + i); i += 1 }
      acc
    }
    ColumnBridge.column(MatVecExpr(ColumnBridge.expression(vec),
      model.flat, offsets))
  }

  /** Project every vector: ONE map-side pass → (vec_id, proj). Empty
    * model → zero rows, schema-complete. */
  def project(emb: DataFrame, model: PcaModel): DataFrame =
    if (model.isEmpty)
      emb.filter(lit(false))
        .select(col("vec_id"), lit(Array.emptyDoubleArray).as("proj"))
    else
      emb.select(col("vec_id"), projectCol(col("embedding"), model).as("proj"))

  /** Persist a trained model as a tiny parquet directory — the
    * [[Pq.savePqIndex]] shape for the one trained artifact that could not
    * previously be frozen: train once on the curation cluster, ship the
    * directory, and every scoring cluster projects through the identical
    * [[MatVecExpr]] plan. Layout: `components` holds one row per principal
    * component (rank, eigenvalue, the dim-length row vector); `meta` holds
    * the mean and total variance. Exact doubles round-trip through parquet,
    * so a reloaded model is BIT-IDENTICAL (PcaSpec pins save→load→project
    * parity). Empty model → schema-complete empty writes. */
  def savePcaModel(model: PcaModel, dir: String,
                   spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    (0 until model.k).map { j =>
      (j, model.explained(j),
        model.flat.slice(j * model.dim, (j + 1) * model.dim).toSeq)
    }.toDF("j", "eig", "component").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/components")
    Seq((model.mean.toSeq, model.totalVar)).toDF("mean", "total_var")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/meta")
  }

  /** Reload a [[savePcaModel]] directory: two one-small-file driver reads
    * (k×dim + dim doubles), ready for [[project]]/[[projectCol]]. */
  def loadPcaModel(spark: org.apache.spark.sql.SparkSession,
                   dir: String): PcaModel = {
    val meta = spark.read.parquet(s"$dir/meta").collect()
    val comps = spark.read.parquet(s"$dir/components").orderBy("j").collect()
    if (meta.isEmpty || comps.isEmpty)
      return PcaModel(Array.emptyDoubleArray, Array.emptyDoubleArray,
        Array.emptyDoubleArray, 0.0)
    val m = meta(0)
    // name-based access throughout (matching the meta read) — a future
    // column reorder/addition in savePcaModel must not silently swap
    // eigenvalues and component vectors
    PcaModel(
      m.getSeq[Double](m.fieldIndex("mean")).toArray,
      comps.flatMap(r => r.getSeq[Double](r.fieldIndex("component"))),
      comps.map(r => r.getDouble(r.fieldIndex("eig"))),
      m.getDouble(m.fieldIndex("total_var")))
  }
}
