package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("training is deterministic, components orthonormal, eigenvalues sorted") {
    val m1 = Pca.train(emb, 8)
    val m2 = Pca.train(emb, 8)
    assert(m1.flat.toSeq === m2.flat.toSeq)
    assert(m1.explained.toSeq === m2.explained.toSeq)
    assert(m1.k === 8 && m1.dim === 64)
    // descending, positive eigenvalues
    assert(m1.explained.zip(m1.explained.drop(1)).forall { case (a, b) => a >= b })
    assert(m1.explained.forall(_ > 0.0))
    // orthonormal rows
    val comps = m1.flat.grouped(m1.dim).toArray
    for (a <- comps.indices; b <- a until comps.length) {
      val d = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"<c$a,c$b> = $d")
    }
  }

  test("components are eigenvectors: C·v = λ·v on a locally-computed covariance") {
    val model = Pca.train(emb, 4)
    val sample = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = 64
    val mean = Array.tabulate(dim)(j => sample.map(_(j)).sum / sample.length)
    val cov = Array.tabulate(dim, dim) { (a, b) =>
      sample.map(v => (v(a) - mean(a)) * (v(b) - mean(b))).sum / sample.length
    }
    val comps = model.flat.grouped(dim).toArray
    comps.zip(model.explained).foreach { case (v, eig) =>
      val cv = cov.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
      // relative residual: near-degenerate eigenvalue PAIRS (the uniform
      // fixture spectrum) bound per-vector convergence; the subspace — and
      // with it vᵀCv — converges far faster
      val resid = math.sqrt(cv.zip(v).map { case (a, b) => (a - eig * b) * (a - eig * b) }.sum)
      assert(resid < 1e-2 * eig, s"|C·v − λ·v| = $resid for λ = $eig")
    }
  }

  test("projection matches a local centered dot product and is shuffle-free") {
    val model = Pca.train(emb, 8)
    val proj = Pca.project(emb, model)
    val rows = proj.orderBy("vec_id").limit(3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val raw = emb.filter(col("vec_id") <= rows.keys.max).orderBy("vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val dim = model.dim
    rows.foreach { case (id, got) =>
      val v = raw(id)
      val expect = Array.tabulate(model.k) { j =>
        (0 until dim).map(i => (v(i) - model.mean(i)) * model.flat(j * dim + i)).sum
      }
      got.zip(expect).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-9, s"vec $id: $g vs $e")
      }
    }
    // map-only plan: no exchange anywhere
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection plans a shuffle:\n$plan")
  }

  test("projection stays map-only under AQE (x123's bench twin config)") {
    // the Bench AQE twin re-runs the catalog with adaptive execution on;
    // r11 measured x123 at 4.9× its default-pass self there. The projection
    // itself must stay a shuffle-free map pass under AQE — any Exchange
    // here means AQE re-planned the MatVecExpr projection.
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val model = Pca.train(emb, 8)
      val proj = Pca.project(emb, model)
      proj.write.format("noop").mode("overwrite").save()
      val plan = proj.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"projection shuffles under AQE:\n$plan")
      assert(proj.count() === emb.count())
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("empty corpus is total") {
    val none = emb.filter(lit(false))
    val model = Pca.train(none, 8)
    assert(model.isEmpty)
    assert(Pca.project(none, model).count() === 0L)
  }

  test("savePcaModel → loadPcaModel round-trips bit-identically and projects identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pca-idx").toString
    try {
      val model = Pca.train(emb, 8)
      Pca.savePcaModel(model, dir, spark)
      val re = Pca.loadPcaModel(spark, dir)
      // doubles round-trip parquet exactly — the reloaded model must be
      // BIT-identical, so the shipped projector cannot drift from training
      assert(re.mean.toSeq === model.mean.toSeq)
      assert(re.flat.toSeq === model.flat.toSeq)
      assert(re.explained.toSeq === model.explained.toSeq)
      assert(re.totalVar === model.totalVar)
      val a = Pca.project(emb, model).orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      val b = Pca.project(emb, re).orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      assert(a.toSeq === b.toSeq)
      // the x123b-style variance gate holds on the RELOADED model: the
      // spectrum still explains a positive, <=1 fraction of total variance
      val ratio = re.explained.sum / re.totalVar
      assert(ratio > 0.0 && ratio <= 1.0 + 1e-12, s"variance ratio $ratio")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("empty model persistence is total") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pca-empty").toString
    try {
      val model = Pca.train(emb.filter(lit(false)), 8)
      Pca.savePcaModel(model, dir, spark)
      val re = Pca.loadPcaModel(spark, dir)
      assert(re.isEmpty)
      assert(Pca.project(emb.filter(lit(false)), re).count() === 0L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
