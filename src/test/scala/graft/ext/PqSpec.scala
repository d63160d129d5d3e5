package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("training is deterministic and codes are in range") {
    val m1 = Pq.train(emb, m = 8, k = 16, iters = 2)
    val m2 = Pq.train(emb, m = 8, k = 16, iters = 2)
    assert(m1.flat.toSeq === m2.flat.toSeq)
    assert(m1.subDim === 8)
    val codes = Pq.encode(emb, m1)
    assert(codes.count() === emb.count())
    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 16).count()
    assert(bad === 0L)
    // every row carries exactly m codes and a positive reconstruction norm
    assert(codes.filter(size(col("codes")) =!= 8).count() === 0L)
    assert(codes.filter(col("rnorm") <= 0.0).count() === 0L)
  }

  test("codegen'd encode/LUT/ADC agree with a local reference computation") {
    val model = Pq.train(emb, m = 8, k = 16, iters = 2)
    val rows = emb.orderBy("vec_id").limit(5)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val sparkCodes = Pq.encode(emb, model)
      .filter(col("vec_id") <= rows.map(_._1).max)
      .orderBy("vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    def localCode(v: Array[Double]): Array[Int] =
      Array.tabulate(model.m) { s =>
        (0 until model.k).minBy { c =>
          // argmin L2 == argmax(x·c − |c|²/2); compute L2 directly here so
          // the test re-derives the rule independently of the kernel
          var d2 = 0.0
          var i = 0
          while (i < model.subDim) {
            val pos = s * model.subDim + i
            val x = if (pos < v.length) v(pos) else 0.0
            val cb = model.flat((s * model.k + c) * model.subDim + i)
            d2 += (x - cb) * (x - cb)
            i += 1
          }
          d2
        }
      }
    rows.foreach { case (id, v) =>
      assert(sparkCodes(id).toSeq === localCode(v).toSeq, s"codes differ for vec $id")
    }
    // ADC of (query LUT, corpus codes) equals dot(query, reconstruction)
    val (qid, qv) = rows.head
    val top = Pq.pqTopK(emb, qid, 3, model).collect()
    assert(top.length === 3)
    val recon = sparkCodes.map { case (id, cs) =>
      id -> Array.tabulate(model.m * model.subDim) { p =>
        val s = p / model.subDim
        model.flat((s * model.k + cs(s)) * model.subDim + p % model.subDim)
      }
    }
    val qn = math.sqrt(qv.map(x => x * x).sum)
    top.filter(r => recon.contains(r.getLong(0))).foreach { r =>
      val rv = recon(r.getLong(0))
      val rn = math.max(math.sqrt(rv.map(x => x * x).sum), 1e-12)
      val expect = qv.zip(rv).map { case (a, b) => a * b }.sum / (qn * rn)
      assert(math.abs(r.getDouble(1) - expect) < 1e-4,
        s"ADC cosine ${r.getDouble(1)} vs local $expect")
    }
  }

  test("refined IVF-PQ retrieval overlaps the exact baseline (recall sanity)") {
    val q = emb.filter(col("vec_id") % 10 === 0)
    val c = emb.filter(col("vec_id") % 10 =!= 0)
    val exact = Similarity.crossTopK(q, c, 3, 0.2)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val appr = Pq.ivfPqCrossTopK(q, c, 3, 0.2, m = 16, k = 16, refine = 16)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert((exact & appr).size >= (exact.size * 0.8).toInt,
      s"recall ${(exact & appr).size}/${exact.size}")
    // refined scores are TRUE cosines: spot-check one row
    val one = Pq.ivfPqCrossTopK(q, c, 3, 0.2, m = 16, k = 16, refine = 16)
      .orderBy("query_id", "rnk").limit(1).collect().head
    val qv = emb.filter(col("vec_id") === one.getLong(0))
      .select("embedding").collect().head.getSeq[Float](0).map(_.toDouble)
    val cv = emb.filter(col("vec_id") === one.getLong(1))
      .select("embedding").collect().head.getSeq[Float](0).map(_.toDouble)
    val cosExp = qv.zip(cv).map { case (a, b) => a * b }.sum /
      (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(cv.map(x => x * x).sum))
    assert(math.abs(one.getDouble(2) - cosExp) < 1e-5)
  }

  test("pqRetriever: batch parity with the one-shot path, close() releases") {
    val q = emb.filter(col("vec_id") % 10 === 0)
    val c = emb.filter(col("vec_id") % 10 =!= 0)
    val oneShot = Pq.ivfPqCrossTopK(q, c, 3, 0.2, m = 16, k = 16, refine = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val r = Pq.pqRetriever(c, kTop = 3, minCos = 0.2, m = 16, k = 16, refine = 16)
    try {
      val batch = r(q)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch === oneShot)
      // split the query batch: per-query results depend only on the query
      // row and the static corpus state, so the union matches
      val h1 = r(q.filter(col("vec_id") < 250))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val h2 = r(q.filter(col("vec_id") >= 250))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert((h1 ++ h2) === oneShot)
    } finally r.close()
  }

  test("savePqIndex/loadPqIndex round-trips: identical probes pre/post reload") {
    val q = emb.filter(col("vec_id") % 10 === 0)
    val c = emb.filter(col("vec_id") % 10 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-index").toString
    try {
      val built = Pq.buildPqIndex(c, m = 16, k = 16)
      Pq.savePqIndex(built, dir)
      val loaded = Pq.loadPqIndex(spark, dir)
      assert(loaded.model.flat.toSeq === built.model.flat.toSeq)
      assert(loaded.model.m === built.model.m && loaded.model.k === built.model.k
        && loaded.model.subDim === built.model.subDim)
      assert(loaded.centroids.map(_.toSeq).toSeq === built.centroids.map(_.toSeq).toSeq)
      assert(loaded.indexed.count() === built.indexed.count())
      // pure compressed-domain probe (refine = 0, no raw vectors at all):
      // built and reloaded index answer identically
      val pre = Pq.retrieverFromPqIndex(built, 3, 0.0)(q)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val post = Pq.retrieverFromPqIndex(loaded, 3, 0.0)(q)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(pre.nonEmpty && pre === post)
      // refined probe over the loaded index matches the one-shot path
      val refined = Pq.retrieverFromPqIndex(loaded, 3, 0.2,
        refine = 16, refineSrc = Some(c))(q)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val oneShot = Pq.ivfPqCrossTopK(q, c, 3, 0.2, m = 16, k = 16, refine = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(refined === oneShot)
      // empty index round-trips too
      val edir = s"$dir/empty"
      Pq.savePqIndex(Pq.buildPqIndex(emb.filter(lit(false))), edir)
      val eloaded = Pq.loadPqIndex(spark, edir)
      assert(eloaded.indexed.count() === 0L)
      assert(Pq.retrieverFromPqIndex(eloaded, 3, 0.0)(q).count() === 0L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("appendToIndex: append ≡ frozen-codebook rebuild; reload parity; recall holds") {
    val q = emb.filter(col("vec_id") % 10 === 0)
    val base = emb.filter(col("vec_id") % 10 =!= 0 && col("vec_id") % 3 =!= 1)
    val batch = emb.filter(col("vec_id") % 10 =!= 0 && col("vec_id") % 3 === 1)
    val corpus = base.unionByName(batch)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-append").toString
    try {
      val built = Pq.buildPqIndex(base, m = 16, k = 16)
      Pq.savePqIndex(built, dir)
      // a FRESH index already carries the export-sink manifest
      val fresh = Export.validateShards(spark, s"$dir/encoded", "cluster")
      assert(fresh.values.sum === built.indexed.count())
      val counts = Pq.appendToIndex(spark,
        batch.select(col("vec_id"), col("embedding")), dir)
      val appended = Pq.loadPqIndex(spark, dir)
      // codebooks and coarse centroids stay FROZEN through the append
      assert(appended.model.flat.toSeq === built.model.flat.toSeq)
      assert(appended.centroids.zip(built.centroids).forall {
        case (a, b) => a.sameElements(b) })
      // append ≡ rebuild: the appended table equals the frozen-model
      // encode+assign of the union (multi-assign rows and all)
      val na = Ivf.resolveAssign(0, built.centroids.length)
      val rebuiltIndexed = Ivf.assignTop(
        corpus.select(col("vec_id"), col("embedding")),
        built.centroids, na)
        .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
        .join(Pq.encode(corpus, built.model), "vec_id")
        .select(col("vec_id"), col("cluster"), col("codes"), col("rnorm"))
      def rowsOf(df: org.apache.spark.sql.DataFrame) = df
        .select(col("vec_id"), col("cluster"), col("codes"), col("rnorm"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1),
          r.getSeq[Int](2).toList, r.getDouble(3))).toSet
      val gotRows = rowsOf(appended.indexed)
      assert(counts.values.sum === gotRows.size)
      assert(gotRows === rowsOf(rebuiltIndexed))
      // probe parity on several queries, pure compressed domain
      val rebuilt = Pq.PqIndex(built.model, built.centroids, rebuiltIndexed)
      val probeQ = q.limit(3)
      val a = Pq.retrieverFromPqIndex(appended, 3, 0.0)(probeQ)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val b = Pq.retrieverFromPqIndex(rebuilt, 3, 0.0)(probeQ)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a.nonEmpty && a === b)
      // the x119b recall contract holds on the APPENDED index: refined
      // retrieval vs the exact per-query top-3 over the same corpus
      val refined = Pq.retrieverFromPqIndex(appended, 3, 0.0,
        refine = 16, refineSrc = Some(corpus))(probeQ)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val qids = probeQ.select("vec_id").collect().map(_.getLong(0))
      val exact = qids.flatMap { qid =>
        Similarity.cosineTopK(corpus.unionByName(q.filter(col("vec_id") === qid)),
          qid, 3).collect().map(r => (qid, r.getLong(0)))
      }.toSet
      val hit = (refined & exact).size
      assert(hit * 10 >= exact.size * 5,
        s"appended-index refined recall too low: $hit/${exact.size}")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("pqStats reports full code utilization and bounded error on the fixture") {
    val model = Pq.train(emb, m = 16, k = 16)
    val rows = Pq.pqStats(emb, model).collect()
    assert(rows.length === 16)
    rows.foreach { r =>
      assert(r.getLong(1) >= 8, s"subspace ${r.getInt(0)} uses only ${r.getLong(1)} codes")
      assert(r.getDouble(2) <= 0.5)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 0.8)
    }
    // the error figure is corpus-level: identical on every row
    assert(rows.map(_.getDouble(3)).distinct.length === 1)
  }

  test("empty corpus is total end to end") {
    val none = emb.filter(lit(false))
    val model = Pq.train(none)
    assert(model.isEmpty)
    assert(Pq.encode(none, model).count() === 0L)
    assert(Pq.pqTopK(none, 0L, 5, model).count() === 0L)
    assert(Pq.ivfPqCrossTopK(emb, none, 3, 0.2).count() === 0L)
    val r = Pq.pqRetriever(none, 3, 0.2)
    try assert(r(emb).count() === 0L) finally r.close()
  }
}
