package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("training is deterministic and assigns every vector to a valid cell") {
    val c1 = Ivf.trainCentroids(emb, k = 8, iters = 2)
    val c2 = Ivf.trainCentroids(emb, k = 8, iters = 2)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    val clusters = Ivf.assign(emb, c1)
      .select("cluster").distinct().collect().map(_.getInt(0)).sorted
    assert(clusters.forall(c => c >= 0 && c < 8))
    val total = Ivf.assign(emb, c1).count()
    assert(total === emb.count())
  }

  test("sampled training mirrors distributed Lloyd when the sample covers the corpus") {
    // sampleCap >= n: same init, same assignment rule, same means — only
    // floating summation order differs, so centroids agree to ~1e-9
    val local = Ivf.trainCentroids(emb, k = 8, iters = 2, sampleCap = 1 << 16)
    val dist = Ivf.trainCentroids(emb, k = 8, iters = 2, sampleCap = 0)
    val maxDiff = local.zip(dist).flatMap { case (a, b) =>
      a.zip(b).map { case (x, y) => math.abs(x - y) }
    }.max
    assert(maxDiff < 1e-9, s"sampled vs distributed centroid drift $maxDiff")
    // a strict sub-corpus sample still yields k usable centroids that
    // assign every vector to a valid cell
    val sub = Ivf.trainCentroids(emb, k = 8, iters = 2, sampleCap = 64)
    assert(sub.length === 8)
    assert(Ivf.assign(emb, sub).filter(col("cluster") < 0 || col("cluster") >= 8).count() === 0L)
    // deterministic
    val sub2 = Ivf.trainCentroids(emb, k = 8, iters = 2, sampleCap = 64)
    assert(sub.map(_.toSeq).toSeq === sub2.map(_.toSeq).toSeq)
  }

  test("ivf top-k overlaps the exact top-k (recall sanity)") {
    val exact = Similarity.cosineTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Ivf.ivfTopK(emb, 0L, 10, nClusters = 8, iters = 2, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(approx.size === 10)
    // probing half the cells of near-uniform vectors: expect solid overlap
    assert((exact & approx).size >= 4,
      s"recall too low: ${(exact & approx).size}/10")
  }

  test("a prebuilt index answers multiple queries without retraining") {
    val idx = Ivf.buildIndex(emb, nClusters = 8, iters = 2)
    idx.assigned.persist()
    try {
      val r0 = Ivf.topK(idx, 0L, 5, nProbe = 8)
        .collect().map(_.getLong(0)).toSeq
      val r1 = Ivf.topK(idx, 1L, 5, nProbe = 8)
        .collect().map(_.getLong(0)).toSeq
      assert(r0.length === 5 && r1.length === 5)
      assert(!r0.contains(0L) && !r1.contains(1L)) // query excluded
      // full-probe against the same index matches the one-shot operator
      val oneShot = Ivf.ivfTopK(emb, 0L, 5, nClusters = 8, iters = 2, nProbe = 8)
        .collect().map(_.getLong(0)).toSeq
      assert(r0 === oneShot)
    } finally idx.assigned.unpersist()
  }

  test("assignTop with nAssign=1 matches the single-cell assignment") {
    val c = Ivf.trainCentroids(emb, k = 8, iters = 2)
    val single = Ivf.assign(emb, c).select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val top1 = Ivf.assignTop(emb, c, nAssign = 1)
      .select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(top1 === single)
    // nAssign=2 indexes every vector exactly twice, under two distinct cells
    val top2 = Ivf.assignTop(emb, c, nAssign = 2)
    assert(top2.count() === emb.count() * 2)
    assert(top2.groupBy("vec_id").count().filter(col("count") =!= 2).count() === 0L)
    assert(top2.select("vec_id", "cluster").distinct().count() === emb.count() * 2)
  }

  test("adaptiveClusters scales k with corpus size, floored at 8 and capped at 2^16") {
    assert(Ivf.adaptiveClusters(0) === 8)
    assert(Ivf.adaptiveClusters(500) === 8)           // ceil(500/64) = 8
    assert(Ivf.adaptiveClusters(2000) === 32)         // ceil(2000/64)
    assert(Ivf.adaptiveClusters(1000000) === 15625)   // ceil(1e6/64)
    assert(Ivf.adaptiveClusters(Long.MaxValue) === (1 << 16))
    assert(Ivf.adaptiveClusters(1000, targetCell = 100) === 10)
    intercept[IllegalArgumentException](Ivf.adaptiveClusters(10, targetCell = 0))
  }

  test("ivfBucketStats audits the adaptive candidate plan with zero drops on the fixture") {
    val r = Ivf.ivfBucketStats(emb).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_over_cap") === 0L)
    assert(r(0).getAs[Long]("dropped_candidates") === 0L)
    assert(r(0).getAs[Long]("kept_candidates") > 0L)
    assert(r(0).getAs[Long]("max_bucket") <= Similarity.defaultMaxBucket)
  }

  test("ivfCosinePairs reports only exact-verified pairs and recalls most of them") {
    val exact = Similarity.cosinePairs(emb, 0.35)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val appr = Ivf.ivfCosinePairs(emb, 0.35, nClusters = 8, iters = 2)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // candidates are exact-cosine verified, so no false positives ever
    assert(appr.subsetOf(exact))
    assert(exact.nonEmpty)
    val recall = (exact & appr).size.toDouble / exact.size
    assert(recall >= 0.7, s"ivf pair recall $recall (${appr.size}/${exact.size})")
  }

  test("probing all cells recovers the exact top-k") {
    val exact = Similarity.cosineTopK(emb, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Ivf.ivfTopK(emb, 0L, 10, nClusters = 8, iters = 2, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === exact)
  }

  test("topKWithin filters candidates inside the probed cells, query unfiltered") {
    import org.apache.spark.sql.functions.col
    val index = Ivf.buildIndex(emb, nClusters = 8, iters = 2)
    // all-ids filter ≡ unfiltered probe
    val allIds = emb.select(col("vec_id"))
    val unfiltered = Ivf.topK(index, 0L, 10, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaAll = Ivf.topKWithin(index, 0L, 10, nProbe = 8, allIds)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaAll === unfiltered)
    // a real metadata filter: probing ALL cells must equal the exact
    // filtered ranking (x114's brute path restricted to the same set)
    val src3 = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("source") === "src3").select(col("doc_id").as("vec_id"))
    val allowed = src3.collect().map(_.getLong(0)).toSet
    val got = Ivf.topKWithin(index, 0L, 10, nProbe = 8, src3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty && got.forall { case (id, _) => allowed.contains(id) })
    val exact = Similarity.cosineTopKWithin(emb, 0L, 10, src3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === exact)
    // empty candidate set: total, zero rows
    assert(Ivf.topKWithin(index, 0L, 10, 8, src3.limit(0)).count() === 0L)
  }

  test("IVF paths return empty/zero results on an empty corpus instead of crashing") {
    val none = emb.filter(col("vec_id") < 0)
    assert(Ivf.ivfCosinePairs(none, 0.35).collect().isEmpty)
    assert(Ivf.ivfCosinePairs(none, 0.35).columns.toSeq === Seq("ia", "ib", "cos"))
    val cross = Ivf.ivfCrossTopK(emb.limit(5), none, kTop = 3, minCos = 0.2)
    assert(cross.collect().isEmpty)
    assert(cross.columns.toSeq === Seq("query_id", "vec_id", "cos", "rnk"))
    val stats = Ivf.ivfBucketStats(none).collect()
    assert(stats.length === 1)
    assert(stats(0).getAs[Long]("kept_candidates") === 0L)
  }

  test("a persisted cluster-partitioned index prunes probe scans to the probed cells") {
    val idx = Ivf.buildIndex(emb, nClusters = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    try {
      idx.assigned.write.mode("overwrite").partitionBy("cluster").parquet(dir)
      val back = spark.read.parquet(dir)
      val probe = back.filter(col("cluster").isin(1, 3))
      // the cell filter must become a PARTITION filter (directory pruning,
      // the IO shape the IvfIndex scaladoc promises), not a row predicate
      val scan = probe.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString("\n")
      val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
      assert(partFilters.contains("cluster"),
        s"cluster probe did not land in PartitionFilters:\n$scan")
      // and the probed rows are exactly the cells' population
      val want = idx.assigned.filter(col("cluster").isin(1, 3)).count()
      assert(probe.count() === want)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("saveIndex/loadIndex round-trips: identical probes, pruned scans") {
    val idx = Ivf.buildIndex(emb, nClusters = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf-saveload").toString
    try {
      Ivf.saveIndex(idx, dir)
      val back = Ivf.loadIndex(spark, dir)
      // centroid matrix round-trips exactly (doubles through parquet)
      assert(back.centroids.length === idx.centroids.length)
      assert(back.centroids.zip(idx.centroids).forall {
        case (a, b) => a.sameElements(b) })
      // probe results are identical pre/post reload, for several queries
      for (qid <- Seq(0L, 7L, 42L)) {
        val before = Ivf.topK(idx, qid, kTop = 5, nProbe = 3)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val after = Ivf.topK(back, qid, kTop = 5, nProbe = 3)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(after === before, s"probe drifted after reload for qid=$qid")
      }
      // the reloaded probe prunes on the cluster partition column
      val probe = back.assigned.filter(col("cluster").isin(1, 3))
      val scan = probe.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString("\n")
      val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
      assert(partFilters.contains("cluster"),
        s"reloaded probe did not land in PartitionFilters:\n$scan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("appendToIndex: append ≡ frozen-centroid rebuild; reload parity; recall holds") {
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    val idx = Ivf.buildIndex(half1, nClusters = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf-append").toString
    try {
      Ivf.saveIndex(idx, dir)
      // a FRESH index already carries the export-sink manifest: validation
      // and appendToIndex's guards are active before any epoch lands
      assert(Export.validateShards(spark, s"$dir/assigned", "cluster")
        .values.sum === half1.count())
      val counts = Ivf.appendToIndex(spark,
        half2.select(col("vec_id"), col("embedding")), dir)
      assert(counts.values.sum === emb.count())
      val appended = Ivf.loadIndex(spark, dir)
      // centroids stay FROZEN through the append
      assert(appended.centroids.zip(idx.centroids).forall {
        case (a, b) => a.sameElements(b) })
      // reload parity: the appended table is exactly the frozen-centroid
      // assignment of the union (vec_id → cluster, every row present once)
      val rebuilt = Ivf.IvfIndex(idx.centroids,
        Ivf.assign(emb.select(col("vec_id"), col("embedding")), idx.centroids)
          .withColumn("nrm", Similarity.norm(col("embedding"))))
      val gotAssign = appended.assigned.select("vec_id", "cluster")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val wantAssign = rebuilt.assigned.select("vec_id", "cluster")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(gotAssign === wantAssign)
      // probe parity: append ≡ rebuild on the union, several queries
      for (qid <- Seq(0L, 7L, 42L)) {
        val a = Ivf.topK(appended, qid, kTop = 5, nProbe = 3)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val b = Ivf.topK(rebuilt, qid, kTop = 5, nProbe = 3)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(a === b, s"appended vs rebuilt probe drifted for qid=$qid")
      }
      // the x67 recall contract on the APPENDED index: probe half the
      // cells, expect the x67-floor share of the exact neighbors
      val exact = Similarity.cosineTopK(emb, 0L, 10)
        .collect().map(_.getLong(0)).toSet
      val approx = Ivf.topK(appended, 0L, 10, nProbe = 4)
        .collect().map(_.getLong(0)).toSet
      assert((exact & approx).size >= 4,
        s"appended-index recall too low: ${(exact & approx).size}/10")
      // appended epoch files live under the pruned cluster layout and the
      // export-sink manifest validates the written state
      assert(Export.validateShards(spark, s"$dir/assigned", "cluster") === counts)
      // a second append keeps all contracts (epochs accumulate)
      val again = Ivf.appendToIndex(spark,
        emb.filter(col("vec_id") === 0L).select(col("vec_id"), col("embedding")),
        dir)
      assert(again.values.sum === emb.count() + 1)
      assert(Export.committedEpochs(spark, s"$dir/assigned") === Set(1L, 2L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("appendToIndex refuses an empty index instead of faking assignments") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val idx = Ivf.buildIndex(empty, nClusters = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf-append-empty").toString
    try {
      Ivf.saveIndex(idx, dir)
      val e = intercept[IllegalArgumentException] {
        Ivf.appendToIndex(spark, emb.select(col("vec_id"), col("embedding")), dir)
      }
      assert(e.getMessage.contains("no centroids"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("retrieverFromIndex probes a reloaded index identically to the live one") {
    val idx = Ivf.buildIndex(emb, nClusters = 8, iters = 2)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val dir = java.nio.file.Files.createTempDirectory("ivf-retr").toString
    try {
      Ivf.saveIndex(idx, dir)
      val live = Ivf.retrieverFromIndex(idx, kTop = 3, minCos = 0.2)(queries)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(live.nonEmpty)
      val reloaded = Ivf.retrieverFromIndex(
          Ivf.loadIndex(spark, dir), kTop = 3, minCos = 0.2)(queries)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(reloaded === live)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("an EMPTY index saves, reloads, and answers probes with zero rows") {
    val none = emb.filter(col("vec_id") < 0)
    val idx = Ivf.buildIndex(none, nClusters = 8, iters = 2)
    assert(idx.centroids.isEmpty)
    assert(idx.assigned.collect().isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("ivf-empty").toString
    try {
      Ivf.saveIndex(idx, dir)
      val back = Ivf.loadIndex(spark, dir)
      assert(back.centroids.isEmpty)
      assert(back.assigned.collect().isEmpty)
      assert(back.assigned.columns.contains("cluster"))
      val probe = Ivf.retrieverFromIndex(back, kTop = 3, minCos = 0.2)(emb.limit(5))
      assert(probe.collect().isEmpty)
      assert(probe.columns.toSeq === Seq("query_id", "vec_id", "cos", "rnk"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ivfRetriever is a closeable handle: close releases state, probes still work") {
    val retrieve = Ivf.ivfRetriever(emb, kTop = 3, minCos = 0.2,
      nClusters = 8, iters = 2)
    val q = emb.limit(5)
    val before = retrieve(q).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(before.nonEmpty)
    retrieve.close()
    retrieve.close() // idempotent
    // post-close probes recompute the corpus state but answer identically
    val after = retrieve(q).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(after === before)
  }

  test("ivfCrossTopK matches the exact contract and holds recall at defaults") {
    val q = emb.filter(col("vec_id") % 10 === 0)
    val c = emb.filter(col("vec_id") % 10 =!= 0)
    val exact = Similarity.crossTopK(q, c, kTop = 3, minCos = 0.2)
    val appr = Ivf.ivfCrossTopK(q, c, kTop = 3, minCos = 0.2)
    assert(appr.columns.toSeq === exact.columns.toSeq)
    val rows = appr.collect()
    // multi-assignment must not duplicate (query, candidate) pairs
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
    assert(rows.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 3))
    assert(rows.forall(r => r.getDouble(2) >= 0.2))
    // a found pair's cosine is EXACT (cells only prune candidates)
    val exactMap = exact.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val hits = keys.filter(exactMap.contains)
    assert(hits.forall(k => exactMap(k) === rows(keys.indexOf(k)).getDouble(2)))
    val recall = hits.length.toDouble / exactMap.size
    assert(recall >= 0.8, s"ivf cross recall $recall (${hits.length}/${exactMap.size})")
    // probing every cell with full assignment recovers the exact result
    val full = Ivf.ivfCrossTopK(q, c, kTop = 3, minCos = 0.2,
      nClusters = 8, nProbe = 8, nAssign = 8)
    assert(full.orderBy("query_id", "rnk").collect().toSeq ===
      exact.orderBy("query_id", "rnk").collect().toSeq)
  }
}
