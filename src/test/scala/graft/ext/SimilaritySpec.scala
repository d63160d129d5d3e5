package graft.ext

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  /** Deterministic synthetic corpus: consecutive (2i, 2i+1) pairs are
    * planted near-duplicates (cos ≥ ~0.999); distinct base vectors are
    * near-orthogonal random Gaussians, so at threshold 0.9 the exact pair
    * set is essentially the planted pairs. */
  private def syntheticEmb(n: Int, dim: Int = 16, seed: Long = 7L) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n / 2).flatMap { i =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val near = base.map(v => v + (rnd.nextGaussian() * 0.01).toFloat)
      Seq((2L * i, base), (2L * i + 1, near))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("adaptiveBits sizes band width to the corpus") {
    // exact power of two: log2(512000/500) = 10
    assert(Similarity.adaptiveBits(512000L, 500L) === 10)
    // one past the boundary rounds UP (buckets must not exceed the target)
    assert(Similarity.adaptiveBits(512001L, 500L) === 11)
    // verification-scale corpora clamp to the 4-bit floor
    assert(Similarity.adaptiveBits(2000L, 500L) === 4)
    assert(Similarity.adaptiveBits(10L, 1000L) === 4)
    // and the ceiling stops runaway widths
    assert(Similarity.adaptiveBits(Long.MaxValue, 1L) === 24)
  }

  test("bandingRecall matches the closed form at known points") {
    // identical vectors always collide
    assert(Similarity.bandingRecall(1.0, 8, 1) === 1.0)
    // orthogonal vectors: p = 1/2, one 4-bit table -> 1/16
    assert(math.abs(Similarity.bandingRecall(0.0, 4, 1) - 1.0 / 16) < 1e-12)
    // more tables only help
    assert(Similarity.bandingRecall(0.5, 6, 16) > Similarity.bandingRecall(0.5, 6, 8))
  }

  test("auto band width holds recall where fixed 4-bit banding collapses past 16*maxBucket") {
    val emb = syntheticEmb(600)
    val exact = pairSet(Similarity.cosinePairs(emb, 0.9))
    assert(exact.size >= 250, s"planted pairs missing: ${exact.size}")
    val maxBucket = 30 // n=600 > 16*30: the regime VERDICT r4 flagged
    val auto = pairSet(
      Similarity.lshCosinePairs(emb, 0.9, dim = 16, maxBucket = maxBucket))
    val fixed = pairSet(
      Similarity.lshCosinePairs(emb, 0.9, dim = 16, maxBucket = maxBucket,
        bitsPerTable = 4))
    val recallAuto = (exact & auto).size.toDouble / exact.size
    val recallFixed = (exact & fixed).size.toDouble / exact.size
    assert(recallAuto >= 0.9, s"adaptive-width recall $recallAuto")
    // the fixed-width plan's buckets outgrow the cap and get dropped
    assert(recallFixed < recallAuto,
      s"expected fixed-width collapse, got fixed=$recallFixed auto=$recallAuto")
    // ... and the audit query makes the difference driver-visible: the
    // fixed-width plan drops far more buckets/candidates than the adaptive
    // one (whose over-cap tail is skew outliers, not the operating regime)
    val autoStats = Similarity.lshBucketStats(emb, dim = 16, maxBucket = maxBucket).head()
    val fixedStats = Similarity.lshBucketStats(emb, dim = 16, maxBucket = maxBucket,
      bitsPerTable = 4).head()
    assert(fixedStats.getAs[Long]("n_over_cap") > 4 * autoStats.getAs[Long]("n_over_cap"))
    assert(fixedStats.getAs[Long]("dropped_candidates") >
      4 * autoStats.getAs[Long]("dropped_candidates"))
  }

  test("srpCosinePairs auto band width reduces to the 16x4 plan at verification scale") {
    val emb = syntheticEmb(200)
    val auto = pairSet(Similarity.srpCosinePairs(emb, 0.9))
    val explicit = pairSet(Similarity.srpCosinePairs(emb, 0.9, bandsN = 16))
    assert(auto === explicit)
    assert(auto.nonEmpty)
  }

  test("bucket stats: kept and dropped candidates partition the same volume across caps") {
    val emb = syntheticEmb(200)
    // pin bandsN so both audits see the identical banding
    val loose = Similarity.srpBucketStats(emb, bandsN = 16, maxBucket = 1000000).head()
    val tight = Similarity.srpBucketStats(emb, bandsN = 16, maxBucket = 3).head()
    def vol(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("kept_candidates") + r.getAs[Long]("dropped_candidates")
    assert(vol(loose) === vol(tight))
    assert(loose.getAs[Long]("n_over_cap") === 0L)
    assert(loose.getAs[Long]("dropped_candidates") === 0L)
    assert(tight.getAs[Long]("n_over_cap") > 0L)
  }

  test("LSH pair paths return empty (not throw) on an empty corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.lshCosinePairs(empty, 0.5, dim = 16).count() === 0L)
    assert(Similarity.srpCosinePairs(empty, 0.5).count() === 0L)
  }

  test("srpCosinePairs single-band edge (64-bit bucket mask) stays a subset of exact") {
    val emb = syntheticEmb(100)
    val exact = pairSet(Similarity.cosinePairs(emb, 0.9))
    val oneBand = pairSet(Similarity.srpCosinePairs(emb, 0.9, bandsN = 1))
    assert(oneBand.subsetOf(exact))
  }

  test("knnGraph matches a brute-force top-k over the exact pair set") {
    val emb = syntheticEmb(60)
    val k = 3
    // brute force from the exact symmetric pair list
    val pairs = Similarity.cosinePairs(emb, 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sym = pairs.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
    val want = sym.groupBy(_._1).toSeq.flatMap { case (v, es) =>
      es.sortBy { case (_, nb, c) => (-c, nb) }.take(k)
        .zipWithIndex.map { case ((_, nb, c), i) => (v, nb, c, i + 1) }
    }.toSet
    val got = Similarity.knnGraph(emb, k, 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === want)
  }

  test("srpKnnGraph recalls the planted near-dup edge for every vector") {
    val emb = syntheticEmb(100)
    // at cos >= 0.9 each vector's neighborhood is exactly its planted twin
    val exact = Similarity.knnGraph(emb, 3, 0.9)
      .select("vec_id", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val appr = Similarity.srpKnnGraph(emb, 3, 0.9)
      .select("vec_id", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // near-dup sketches collide in essentially every band — full edge recall
    assert((exact -- appr).isEmpty)
    // and the approx graph never invents edges below the similarity floor
    assert(appr.subsetOf(
      Similarity.srpCosinePairs(emb, 0.9).select("ia", "ib").collect()
        .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
        .toSet))
  }

  test("crossTopK matches brute force over the split corpus") {
    val emb = syntheticEmb(80)
    val qs = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 10 === 0)
    val cs = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 10 =!= 0)
    val all = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cosOf(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val raw = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      java.math.BigDecimal.valueOf(raw)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val qIds = all.keys.filter(_ % 10 == 0).toSeq
    val cIds = all.keys.filter(_ % 10 != 0).toSeq
    val want = qIds.flatMap { q =>
      cIds.map(c => (q, c, cosOf(all(q), all(c))))
        .filter(_._3 >= 0.2)
        .sortBy { case (_, c, s) => (-s, c) }
        .take(3).zipWithIndex.map { case ((_, c, s), i) => (q, c, s, i + 1) }
    }.toSet
    val got = Similarity.crossTopK(qs, cs, 3, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === want)
  }

  test("srpCrossTopK finds each query's planted twin and never scores below the floor") {
    val emb = syntheticEmb(100)
    // queries = even ids (the base vectors); their planted twin (id+1) sits
    // in the corpus side at cos ~0.999 — top-1 for every query
    val qs = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 0)
    val cs = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 2 =!= 0)
    val got = Similarity.srpCrossTopK(qs, cs, 1, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.size === 50)
    got.foreach { case (q, nb, cos) =>
      assert(nb === q + 1, s"query $q matched $nb, expected its twin")
      assert(cos >= 0.9)
    }
    // and the approximate result is a subset of the exact one
    val exact = Similarity.crossTopK(qs, cs, 1, 0.9)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(t => (t._1, t._2)).toSet.subsetOf(exact))
  }

  test("crossTopK stays total on empty query and corpus sides") {
    val emb = syntheticEmb(20)
    assert(Similarity.crossTopK(emb.limit(0), emb, 3, 0.2).count() === 0L)
    assert(Similarity.crossTopK(emb, emb.limit(0), 3, 0.2).count() === 0L)
    assert(Similarity.srpCrossTopK(emb.limit(0), emb, 3, 0.2).count() === 0L)
    assert(Similarity.srpCrossTopK(emb, emb.limit(0), 3, 0.2).count() === 0L)
  }

  test("cosineTopKWithin restricts candidates but not the query") {
    val d = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, d)
    val src3 = graft.Tables.documents(spark, d)
      .filter(org.apache.spark.sql.functions.col("source") === "src3")
      .select(org.apache.spark.sql.functions.col("doc_id").as("vec_id"))
    val allowed = src3.collect().map(_.getLong(0)).toSet
    // query 0 is NOT in src3 — the query vector must still resolve
    assert(!allowed.contains(0L))
    val got = Similarity.cosineTopKWithin(emb, 0L, 10, src3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty && got.forall { case (id, _) => allowed.contains(id) })
    // equals the unfiltered ranking restricted to the candidate set
    val brute = Similarity.cosineTopK(emb, 0L, Int.MaxValue - 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filter { case (id, _) => allowed.contains(id) }.take(10)
    assert(got.toSeq === brute.toSeq)
    // empty candidate set: total, zero rows
    assert(Similarity.cosineTopKWithin(emb, 0L, 10, src3.limit(0)).count() === 0L)
  }

  test("cosinePairs row ceiling fails fast and Long.MaxValue maxRows does not overflow the probe") {
    val emb = syntheticEmb(20)
    val e = intercept[IllegalArgumentException] {
      Similarity.cosinePairs(emb, 0.9, maxRows = 10L)
    }
    assert(e.getMessage.contains("lshCosinePairs"))
    // maxRows = Long.MaxValue used to wrap the probe limit negative
    assert(Similarity.cosinePairs(emb, 0.9, maxRows = Long.MaxValue).count() >= 10L)
  }
}
