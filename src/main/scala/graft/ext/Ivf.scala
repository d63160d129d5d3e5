package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions.dotF

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path complementing sign-LSH ([[Similarity.lshTopK]]):
  *
  *   1. train k centroids with a deterministic mini k-means (seeded init,
  *      a few Lloyd iterations — centroid state is k×dim doubles, safely
  *      driver-side; assignments stay distributed);
  *   2. assign every vector to its nearest centroid (one scan, the argmin
  *      over k codegen'd dot products);
  *   3. at query time, probe only the `nProbe` nearest cells and run exact
  *      cosine inside them.
  *
  * At 100 TB the partition-by-cell layout means a probe touches
  * nProbe/k of the data; training is ONE bounded-sample scan (driver-local
  * Lloyd — see [[trainCentroids]]). All distributed scoring goes through
  * the codegen'd dot-product expression.
  */
object Ivf {

  /** Nearest-centroid id expression: argmax_j of (x·c_j − |c_j|²/2), which
    * orders identically to squared euclidean distance. Ties break to the
    * lowest cluster id (deterministic). */
  private def clusterOf(centroids: Array[Array[Double]]) = {
    require(centroids.nonEmpty, "clusterOf needs at least one centroid")
    if (centroids.length == 1) lit(0) // greatest() needs >= 2 args
    else {
      val scored = centroids.zipWithIndex.map { case (c, j) =>
        val norm2 = c.map(x => x * x).sum
        struct((dotF(col("embedding"), typedLit(c.toSeq)) - lit(norm2 / 2)).as("score"),
          lit(-j).as("negj"))
      }
      -greatest(scored.toIndexedSeq: _*).getField("negj")
    }
  }

  /** Deterministic mini k-means over the embedding column. Init picks the k
    * vectors with the smallest seeded hash of vec_id (spread pseudo-randomly,
    * reproducible, corpus-partitioning independent).
    *
    * Training modes — Lloyd rounds are inherently sequential (round i+1's
    * assignment depends on round i's means), so the question is what each
    * round scans:
    *
    *   - `sampleCap > 0` (the default, and the 100 TB shape): ONE distributed
    *     job collects the `sampleCap` vectors with the smallest seeded hash
    *     (`TakeOrderedAndProject` — per-partition top-K, no sort shuffle),
    *     then every Lloyd round runs DRIVER-LOCAL over the sample. Cluster
    *     scans: 1, independent of `iters`. Coarse-quantizer centroids
    *     converge on a small uniform sample (this is how IVF indexes are
    *     trained in practice); the default cap of 65,536 × 64-dim floats is
    *     ~16 MB of driver memory.
    *   - `sampleCap = 0`: exact distributed Lloyd — `iters + 1` corpus scans,
    *     collecting k×dim doubles per round. Only worth it when the corpus
    *     is small and bit-exact full-data means matter.
    *
    * COST WARNING for `sampleCap = 0` at scale: each of the `iters` rounds
    * is a FULL corpus scan (assignment + posexplode + per-(cluster, pos)
    * average) ending in a synchronous driver `collect()` of the k×dim
    * cluster means — the collect itself is bounded (k×dim rows, never
    * corpus rows), but the loop serializes `iters` cluster-wide jobs with
    * a driver round-trip between each, so at 100 TB the wall-clock is
    * `iters × (full scan + shuffle)` with zero cross-round pipelining. Do
    * not flip this on for a large corpus; the sampled default trains the
    * same coarse quantizer from ONE bounded job.
    *
    * Both modes share the init ordering, the argmax assignment with
    * lowest-id tie-break, and the empty-cluster rule (an empty cluster
    * keeps its centroid), so `sampleCap ≥ n` differs from `sampleCap = 0`
    * only by floating summation order. */
  def trainCentroids(emb: DataFrame, k: Int, iters: Int,
                     sampleCap: Int = defaultSampleCap): Array[Array[Double]] = {
    if (sampleCap > 0) {
      require(sampleCap >= k, s"sampleCap=$sampleCap must be >= k=$k")
      lloydTrain(collectSample(emb, sampleCap), k, iters)
    } else {
      val hashed = emb
        .select(col("vec_id"), col("embedding"))
        .withColumn("h", xxhash64(lit(7L), col("vec_id")))
        .orderBy(col("h"), col("vec_id"))
      val initRows = hashed.limit(k).select(col("embedding")).collect()
      // empty corpus: zero centroids, same as lloydTrain's short-circuit —
      // entering the Lloyd loop would crash in clusterOf
      if (initRows.isEmpty) return Array.empty
      var centroids = initRows.map(_.getSeq[Float](0).map(_.toDouble).toArray)
      for (_ <- 1 to iters) {
        val means = emb
          .withColumn("cluster", clusterOf(centroids))
          .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("cluster"), col("pos"))
          .agg(avg(col("v")).as("m"))
          .collect()
        val next = centroids.map(_.clone())
        means.foreach { r: Row =>
          next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
        }
        centroids = next
      }
      centroids
    }
  }

  /** The ONE definition of the training sample: the `sampleCap` vectors
    * with the smallest seeded vec_id hash (`TakeOrderedAndProject` — a
    * per-partition top-K, no sort shuffle), collected to the driver. Every
    * sampled-training entry point goes through here, so sample order — and
    * with it the claimed bit-exactness across paths — cannot fork. Public
    * so pipelines training several sample-based models (IVF + PQ + PCA at
    * several k) can collect once and fan the sample out via the
    * `trainFromSample` twins. */
  def collectSample(emb: DataFrame, sampleCap: Int): Array[Array[Double]] =
    emb.select(col("vec_id"), col("embedding"))
      .withColumn("h", xxhash64(lit(7L), col("vec_id")))
      .orderBy(col("h"), col("vec_id"))
      .limit(sampleCap).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** [[trainCentroids]]' sampled mode on a PRE-COLLECTED
    * [[collectSample]] sample (the `trainFromSample` twin for the coarse
    * quantizer). */
  def trainCentroidsFromSample(sample: Array[Array[Double]], k: Int,
                               iters: Int): Array[Array[Double]] =
    lloydTrain(sample, k, iters)

  /** The ONE definition of driver-local training: first-k init in sample
    * order, `iters` Lloyd rounds. An empty sample (empty corpus) yields
    * zero centroids — callers short-circuit to an empty result instead of
    * crashing inside a Lloyd round. */
  private[ext] def lloydTrain(sample: Array[Array[Double]], k: Int,
                         iters: Int): Array[Array[Double]] = {
    if (sample.isEmpty) return Array.empty
    var centroids = sample.take(k).map(_.clone())
    for (_ <- 1 to iters) centroids = lloydRoundLocal(sample, centroids)
    centroids
  }

  /** Typed empty frame for the short-circuits above. */
  private[ext] def emptyFrame(df: DataFrame, fields: (String, String)*): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(fields.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.DataType.fromDDL(t))
    })
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.emptyRDD[Row], schema)
  }

  /** Driver-side Lloyd round mirroring the distributed one: assign by
    * argmax(x·c − |c|²/2) with lowest-cluster tie-break, recompute means,
    * keep the old centroid for empty clusters. */
  private def lloydRoundLocal(sample: Array[Array[Double]],
                              centroids: Array[Array[Double]]): Array[Array[Double]] = {
    val dim = centroids(0).length
    val norm2 = centroids.map(_.map(x => x * x).sum)
    val sums = Array.fill(centroids.length)(new Array[Double](dim))
    val counts = new Array[Long](centroids.length)
    sample.foreach { v =>
      var best = 0; var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < centroids.length) {
        val c = centroids(j)
        var dot = 0.0; var i = 0
        while (i < dim) { dot += v(i) * c(i); i += 1 }
        val score = dot - norm2(j) / 2
        if (score > bestScore) { bestScore = score; best = j }
        j += 1
      }
      var i = 0
      while (i < dim) { sums(best)(i) += v(i); i += 1 }
      counts(best) += 1
    }
    centroids.indices.toArray.map { j =>
      if (counts(j) == 0) centroids(j).clone()
      else sums(j).map(_ / counts(j))
    }
  }

  /** Default training-sample ceiling: bounds driver state (~16 MB at 64-dim
    * float) and makes training cost independent of corpus size. */
  val defaultSampleCap: Int = 1 << 16

  /** Default target cell population for [[adaptiveClusters]]: small enough
    * that per-cell pair volume stays bounded, large enough that a cell holds
    * a meaningful neighborhood for the SRP bands to mine. */
  val defaultTargetCell: Long = 64L

  /** Corpus-adaptive coarse-cell count — the [[Similarity.adaptiveBits]]
    * argument applied to the quantizer: at FIXED k the per-cell population
    * is n·nAssign/k, so cell-local candidate volume is Θ(n²·nAssign²/k) —
    * quadratic in corpus size. Sizing k ≈ n/targetCell pins the expected
    * cell population, making candidate volume O(n·targetCell·nAssign²) —
    * linear in n. Floored at 8 (fewer cells just degrades to plain banding)
    * and capped at 2^16 (the centroid matrix is k×dim doubles of driver
    * state and a k-way codegen'd argmax per row: 65k cells × 64 dims ≈
    * 32 MB, the sane ceiling — beyond that, shard the corpus first). */
  def adaptiveClusters(n: Long, targetCell: Long = defaultTargetCell): Int = {
    require(n >= 0 && targetCell > 0,
      s"adaptiveClusters needs n >= 0 and targetCell > 0, got n=$n target=$targetCell")
    math.min(1 << 16, math.max(8, math.ceil(n.toDouble / targetCell).toLong)).toInt
  }

  /** Vectors with their IVF cell assignment. An empty quantizer (trained on
    * an empty corpus) assigns nothing — zero rows, schema-complete — so the
    * build/save/load path stays total end to end. */
  def assign(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    if (centroids.isEmpty)
      emb.filter(lit(false)).withColumn("cluster", lit(0))
    else emb.withColumn("cluster", clusterOf(centroids))

  /** A built IVF index: the k×dim centroid matrix (driver-side, tiny) plus
    * the cell-assigned, norm-carrying vector table. The production shape is
    * train ONCE / probe MANY: `assigned` is what a pipeline persists —
    * written `partitionBy("cluster")`, a probe's scan prunes to nProbe/k of
    * the files before any compute. */
  final case class IvfIndex(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Train the coarse quantizer and assign every vector once. The norm
    * rides as a withColumn on the assigned frame — a join-back would
    * re-evaluate the k-way argmax in both branches plus pay a shuffle. */
  def buildIndex(emb: DataFrame, nClusters: Int = 16, iters: Int = 3,
                 sampleCap: Int = defaultSampleCap): IvfIndex = {
    val centroids = trainCentroids(emb, nClusters, iters, sampleCap)
    IvfIndex(centroids,
      assign(emb, centroids)
        .withColumn("nrm", Similarity.norm(col("embedding"))))
  }

  /** Persist a built index so build-once/probe-many survives the session —
    * the index shape a 100 TB corpus requires (training + assignment are
    * the expensive pass; probes are cheap and repeated). Layout:
    *   - `dir/assigned`: the vector table written `partitionBy("cluster")`,
    *     so a reloaded probe's cell filter prunes to nProbe/k of the FILES
    *     (PartitionFilters — asserted in IvfSpec);
    *   - `dir/centroids`: the k×dim matrix as one tiny parquet
    *     (cluster_id, centroid) — self-describing, no side manifest.
    * Both writes go through Spark's Hadoop FS layer, so any local/HDFS/S3A
    * URI works (the Export lesson). */
  def saveIndex(index: IvfIndex, dir: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    if (index.centroids.isEmpty) {
      // Empty index (empty corpus): partitionBy over zero rows writes NO
      // cluster=... directories, so a reload could not even resolve the
      // partition column. Write the empty assigned table UNPARTITIONED but
      // schema-complete — loadIndex reads `cluster` as an ordinary column
      // there — mirroring writeShards' empty-export handling.
      index.assigned
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("cluster").cast("int").as("cluster"))
        .limit(0)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$dir/assigned")
      Seq.empty[(Int, Seq[Double])].toDF("cluster_id", "centroid")
        .coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$dir/centroids")
      return
    }
    // the assigned table lands through the export sink: same cluster=N
    // layout probes prune on, PLUS the writeShards manifest (per-cluster
    // counts, bytes, content digests, per-file checksums) — so a fresh
    // index validates with Export.validateShards immediately and
    // [[appendToIndex]]'s schema-drift/self-healing guards are active from
    // the FIRST append, not only after one epoch has republished a manifest
    Export.writeShards(
      index.assigned
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cluster")),
      s"$dir/assigned", shardCol = "cluster")
    index.centroids.zipWithIndex
      .map { case (c, j) => (j, c.toSeq) }.toSeq
      .toDF("cluster_id", "centroid")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/centroids")
  }

  /** Reload a [[saveIndex]] index. The centroid matrix is a one-small-file
    * driver read; the assigned table is lazy — nothing scans until a probe,
    * and the probe's cell filter prunes on the partition column. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$dir/centroids")
      .orderBy("cluster_id")
      .collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
    val assigned = spark.read.parquet(s"$dir/assigned")
      // partition-directory values read back type-inferred — normalize to
      // the int type assign() produces, and restore the column order
      .select(col("vec_id"), col("embedding"), col("cluster").cast("int").as("cluster"),
        col("nrm"))
    IvfIndex(centroids, assigned)
  }

  /** Assign a NEW vector batch to a persisted index's FROZEN centroids and
    * append it into `dir/assigned` — the daily-ingest ANN path, which
    * previously required a full rebuild. The coarse quantizer stays as
    * trained (new vectors inherit the existing cell geometry — the recall
    * contract the x67 gate pins is about probe coverage, not batch
    * membership), the batch pays only its OWN assignment pass, and the
    * write lands through [[Export.appendShards]]'s staged epoch commit
    * with `cluster` as the shard column: same `cluster=N` directory layout
    * probes already prune on, plus the manifest/self-healing/schema-drift
    * contracts of the export sink (a failed append retracts on retry; the
    * republished manifest re-derives from the full written state and
    * doubles as `Export.validateShards` input for the index). A reloaded
    * index then probes the union exactly as a frozen-centroid rebuild
    * would (IvfSpec pins append ≡ rebuild parity and the recall floor on
    * an appended index). Refuses an empty index — there is no quantizer
    * to assign against; build/retrain instead. Returns the per-cluster
    * row counts of the UNION (the republished manifest). */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession,
                    batch: DataFrame, dir: String): Map[Long, Long] = {
    val centroids = spark.read.parquet(s"$dir/centroids")
      .orderBy("cluster_id")
      .collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
    require(centroids.nonEmpty,
      s"appendToIndex: index at $dir has no centroids (empty index) — " +
        "buildIndex/saveIndex on the first real corpus instead")
    val rows = assign(batch.select(col("vec_id"), col("embedding")), centroids)
      .withColumn("nrm", Similarity.norm(col("embedding")))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cluster"))
    Export.appendShards(rows, s"$dir/assigned", shardCol = "cluster")
  }

  /** Approximate top-k against a prebuilt index: exact cosine restricted to
    * the `nProbe` cells nearest the query vector. */
  def topK(index: IvfIndex, queryId: Long, kTop: Int, nProbe: Int): DataFrame =
    probeTopK(index, queryId, kTop, nProbe, None)

  /** [[topK]] restricted to a candidate id set — the x114 metadata filter
    * on the IVF path. The semi-join applies to the ASSIGNED table inside
    * the probed cells only, so with a cluster-partitioned persisted index
    * the probe still prunes files FIRST and the filter cuts what little it
    * scanned — predicate pushdown composed with cell pruning. The query
    * vector resolves from the unfiltered index. */
  def topKWithin(index: IvfIndex, queryId: Long, kTop: Int, nProbe: Int,
                 candIds: DataFrame, candIdCol: String = "vec_id"): DataFrame =
    probeTopK(index, queryId, kTop, nProbe,
      Some(candIds.select(col(candIdCol).as("vec_id"))))

  private def probeTopK(index: IvfIndex, queryId: Long, kTop: Int,
                        nProbe: Int, cand: Option[DataFrame]): DataFrame = {
    val n = index.assigned
    val qRows = n.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"), col("nrm").as("qnrm")).take(1)
    require(qRows.nonEmpty, s"ivf topK: no embedding with vec_id=$queryId")
    val q = qRows.head
    val qe = q.getSeq[Float](0).map(_.toDouble).toArray
    val probed = index.centroids.zipWithIndex
      .map { case (c, j) =>
        val dot = c.zip(qe).map { case (a, b) => a * b }.sum
        val norm2 = c.map(x => x * x).sum
        (j, dot - norm2 / 2)
      }
      .sortBy { case (j, s) => (-s, j) }
      .take(nProbe).map(_._1)
    val base = n.filter(col("vec_id") =!= queryId &&
      col("cluster").isin(probed.toIndexedSeq: _*))
    cand.fold(base)(c => base.join(c, Seq("vec_id"), "left_semi"))
      .select(col("vec_id"),
        round(dotF(col("embedding"), typedLit(qe.toSeq)) / (col("nrm") * lit(q.getDouble(1))), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(kTop)
  }

  /** One-shot convenience: build the index and answer a single query. For
    * repeated queries, [[buildIndex]] once and [[topK]] against it. */
  def ivfTopK(emb: DataFrame, queryId: Long, kTop: Int,
              nClusters: Int = 16, iters: Int = 3, nProbe: Int = 4): DataFrame =
    topK(buildIndex(emb, nClusters, iters), queryId, kTop, nProbe)

  /** Top-`nAssign` nearest-centroid structs, best first. Same score as
    * [[clusterOf]] (x·c_j − |c_j|²/2 orders like squared euclidean); ties
    * break to the lowest cluster id, so nAssign=1 matches [[clusterOf]]. */
  private[ext] def topCells(centroids: Array[Array[Double]], nAssign: Int) = {
    val scored = centroids.zipWithIndex.map { case (c, j) =>
      val norm2 = c.map(x => x * x).sum
      struct((dotF(col("embedding"), typedLit(c.toSeq)) - lit(norm2 / 2)).as("score"),
        lit(-j).as("negj"))
    }
    // ascending (score, negj) reversed = (score desc, cluster id asc on ties)
    slice(reverse(array_sort(array(scored.toIndexedSeq: _*))), 1, nAssign)
  }

  /** Multi-assignment: each vector indexed under its `nAssign` nearest
    * cells. One exploded row per (vector, cell) — the standard fix for
    * near-neighbor pairs straddling a cell boundary (each pair only needs
    * ONE shared cell among the two top-`nAssign` sets to be found). */
  def assignTop(emb: DataFrame, centroids: Array[Array[Double]],
                nAssign: Int): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
        explode(topCells(centroids, math.min(nAssign, centroids.length))).as("sc"))
      .select(col("vec_id"), col("embedding"), (-col("sc.negj")).as("cluster"))

  /** Cell-partitioned near-pair search — the MID-COSINE scale path that
    * plain banding cannot reach ([[Similarity.adaptiveBits]]: holding
    * recall at mid cosine while shrinking buckets needs unbounded tables).
    * Composition: coarse-quantizer cells bound the candidate universe
    * (bucket sizes shrink ~k-fold, so candidate volume gains a 1/k factor
    * and k grows with the corpus), and NARROW 4-bit SRP bands inside each
    * cell keep per-band collision probability — and with it mid-cosine
    * recall — high. Multi-assignment (`nAssign` cells per vector) heals
    * boundary splits; candidates share (cell, band, bucket), verified by
    * exact cosine. Same output contract as [[Similarity.lshCosinePairs]];
    * recall vs the exact baseline is driver-visible via the x43 gate.
    *
    * Scale knobs: `nClusters = 0` (default) derives k from a corpus count —
    * [[adaptiveClusters]], k ≈ n/targetCell — exactly how
    * [[Similarity.adaptiveBits]] keeps band-bucket volume linear; a pinned
    * k is quadratic-at-scale and exists for experiments only. `bandsN`
    * wide (16×4 bits) because cells already bound bucket size. `nAssign`
    * is the dominant RECALL knob (index duplication factor — measured on
    * the near-uniform sf0.01 corpus at cos 0.35: 2→0.54, 3→0.73, 4→0.86
    * with 16 cells; near-uniform data is the coarse quantizer's hard case,
    * clustered real corpora do better); `nAssign = 0` (default) scales it
    * as max(3, ceil(log2 k)) — see [[resolveAssign]] — compensating the
    * cell-overlap recall lost to smaller cells. */
  def ivfCosinePairs(emb: DataFrame, threshold: Double,
                     nClusters: Int = 0, iters: Int = 3, nAssign: Int = 0,
                     bandsN: Int = 16,
                     maxBucket: Int = Similarity.defaultMaxBucket,
                     sampleCap: Int = defaultSampleCap,
                     targetCell: Long = defaultTargetCell): DataFrame = {
    val (k, centroids) = resolveAndTrain(emb, nClusters, iters, sampleCap, targetCell)
    if (centroids.isEmpty)
      return emptyFrame(emb, "ia" -> "bigint", "ib" -> "bigint", "cos" -> "double")
    val na = resolveAssign(nAssign, k)
    val buckets = cellBuckets(emb, centroids, na, bandsN)
      .observe("graft_ivf_bucket_cap",
        count(when(size(col("ids")) > maxBucket, 1)).as("dropped_buckets"))
      .filter(size(col("ids")) <= maxBucket)
    val cands = buckets
      .select(explode(ArrayPairs.orderedPairs(col("ids")) { (a, b) =>
        struct(a.as("ia"), b.as("ib"))
      }).as("p"))
      .select(col("p.ia").as("ia"), col("p.ib").as("ib"))
      .dropDuplicates("ia", "ib")
    Similarity.verifyCosine(cands, emb, threshold)
  }

  /** `nAssign = 0` → max(3, ceil(log2 k)): the multi-assignment factor
    * grows with the cell count because smaller cells split more true
    * neighborhoods across boundaries. Measured recall at cos 0.35 on the
    * near-uniform synthetic corpus (its hard case): k=8/na=3 → 0.886-0.903
    * (sf0.001/0.01), k=16/na=4 → 0.879, k=32/na=5 → 0.860 (sf0.1) — all
    * above the x43 floor of 0.8. Candidate volume under this rule is
    * O(n · targetCell · log2²(n/targetCell)): quasi-linear in corpus size
    * where any pinned (k, na) is quadratic. */
  private[ext] def resolveAssign(nAssign: Int, k: Int): Int =
    if (nAssign > 0) nAssign
    else math.max(3, math.ceil(math.log(k.toDouble) / math.log(2.0)).toInt)

  /** `nClusters = 0` → corpus-adaptive k (the [[Similarity]] `resolveBits`
    * pattern); explicit k pins a plan. */
  private def resolveClusters(emb: DataFrame, nClusters: Int,
                              targetCell: Long): Int =
    if (nClusters > 0) nClusters
    else emb.count() match {
      case 0L => 8 // empty corpus: no pairs regardless; keep the floor
      case n  => adaptiveClusters(n, targetCell)
    }

  /** Resolve the adaptive k AND train, in ONE cluster job where possible:
    * with sampled training (`sampleCap > 0`) the sample is collected
    * first, and when it came back smaller than `sampleCap` the limit did
    * not truncate — the sample IS the corpus and its size is the exact n,
    * so the separate `count()` job (a second full scan at 100 TB) is
    * skipped; only a corpus that overflows the cap pays the count.
    * `sampleCap = 0` falls back to resolveClusters + exact distributed
    * Lloyd. Sample order and Lloyd rounds are the shared
    * [[collectSample]]/[[lloydTrain]] definitions, so both tiers of every
    * IVF entry point train identically by construction. */
  private[ext] def resolveAndTrain(emb: DataFrame, nClusters: Int, iters: Int,
                              sampleCap: Int, targetCell: Long):
      (Int, Array[Array[Double]]) = {
    if (sampleCap <= 0) {
      val k = resolveClusters(emb, nClusters, targetCell)
      return (k, trainCentroids(emb, k, iters, sampleCap))
    }
    resolveAndTrainFromSample(emb, collectSample(emb, sampleCap),
      nClusters, iters, sampleCap, targetCell)
  }

  /** [[resolveAndTrain]] with a PRE-COLLECTED sample — for composites that
    * train several models on the one seeded sample (IVF-PQ builds train
    * coarse centroids AND codebooks), so the corpus-wide sampling job runs
    * once, not once per model. */
  private[ext] def resolveAndTrainFromSample(emb: DataFrame,
      sample: Array[Array[Double]], nClusters: Int, iters: Int,
      sampleCap: Int, targetCell: Long): (Int, Array[Array[Double]]) = {
    val k =
      if (nClusters > 0) nClusters
      else if (sample.length == 0) 8
      else if (sample.length < sampleCap) adaptiveClusters(sample.length, targetCell)
      else emb.count() match {
        case 0L => 8
        case n  => adaptiveClusters(n, targetCell)
      }
    require(sampleCap >= k, s"sampleCap=$sampleCap must be >= k=$k")
    (k, lloydTrain(sample, k, iters))
  }

  /** Per-(cell, band) collision-bucket postings: each vector SRP-sketched
    * once (BELOW the cell explode — after it the sketch would compute
    * nAssign×), multi-assigned to its `nAssign` nearest cells, banded, and
    * grouped into sorted postings lists. Shared by [[ivfCosinePairs]] and
    * the [[ivfBucketStats]] audit so the audited plan IS the candidate
    * plan. */
  private def cellBuckets(emb: DataFrame, centroids: Array[Array[Double]],
                          nAssign: Int, bandsN: Int): DataFrame = {
    val sk = emb
      .select(col("vec_id"), col("embedding"),
        org.apache.spark.sql.graft.VectorFunctions
          .srpSketchF(col("embedding"), Similarity.srpBits).as("sketch"))
      .select(col("vec_id"), col("sketch"),
        explode(topCells(centroids, math.min(nAssign, centroids.length))).as("sc"))
      .select(col("vec_id"), col("sketch"), (-col("sc.negj")).as("cluster"))
    Similarity.bandedSketch(sk, Seq("vec_id", "cluster"), bandsN)
      .groupBy(col("cluster"), col("t"), col("bucket"))
      .agg(sort_array(collect_set(col("vec_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
  }

  /** Batch retrieval against IVF cells — the index-probe alternative to
    * [[Similarity.srpCrossTopK]] for query batches at corpus scale: the
    * corpus is assigned once to k coarse cells (train ONCE, probe MANY —
    * persisted `partitionBy("cluster")` the scan prunes to the probed
    * cells), each query probes only its `nProbe` nearest cells, and exact
    * cosine runs on the (query, cell-member) candidates — an equi-join on
    * the cell id, never queries × corpus. Candidate volume is
    * O(queries · nProbe · targetCell): linear in the query batch and
    * independent of corpus size once k scales ([[adaptiveClusters]]).
    * Same output contract as [[Similarity.crossTopK]] (query_id, vec_id,
    * cos, rnk); recall vs the exact baseline is driver-visible via the
    * x67 gate.
    *
    * Versus the SRP-banded path: banding keys candidates on sketch
    * collisions (recall concentrated on HIGH cosine), cell probing keys
    * them on coarse-quantizer locality (holds recall into the mid-cosine
    * range but pays centroid training). The corpus side is MULTI-ASSIGNED
    * (`nAssign` cells per vector, the x42 boundary-split fix): a true
    * neighbor is found when ANY of its cells is probed, which on the
    * near-uniform synthetic corpus (the quantizer's hard case) lifts
    * measured recall from 0.41–0.61 single-assigned to 0.93–0.98 at the
    * defaults. `nProbe = 0` / `nAssign = 0` both scale as
    * max(3, ceil(log2 k)), so per-query candidate volume is
    * O(targetCell · log² k) — index duplication buys recall at a
    * logarithmic, not linear, storage factor. */
  def ivfCrossTopK(queries: DataFrame, corpus: DataFrame,
                   kTop: Int, minCos: Double,
                   nClusters: Int = 0, iters: Int = 3, nProbe: Int = 0,
                   nAssign: Int = 0,
                   sampleCap: Int = defaultSampleCap,
                   targetCell: Long = defaultTargetCell): DataFrame = {
    val (k, centroids) = resolveAndTrain(corpus, nClusters, iters, sampleCap, targetCell)
    if (centroids.isEmpty)
      return emptyFrame(corpus, "query_id" -> "bigint", "vec_id" -> "bigint",
        "cos" -> "double", "rnk" -> "int")
    val na = resolveAssign(nAssign, k)
    val c = assignTop(corpus, centroids, na)
      .withColumn("nrm", Similarity.norm(col("embedding")))
    probeAgainstCells(queries, c, centroids, resolveAssign(nProbe, k), kTop, minCos)
  }

  /** The query-side half of IVF batch retrieval, shared by the one-shot
    * [[ivfCrossTopK]] and the build-once [[ivfRetriever]]: assign each
    * query to its `np` nearest cells, equi-join the cell-assigned corpus,
    * exact cosine on the cell-join candidates, rank per query. */
  private def probeAgainstCells(queries: DataFrame, corpusAssigned: DataFrame,
                                centroids: Array[Array[Double]], np: Int,
                                kTop: Int, minCos: Double): DataFrame = {
    // the plan below broadcasts the raw query frame (embeddings included):
    // enforce the crossTopK contract instead of merely citing it, or a
    // corpus-sized query batch OOMs executors / trips the broadcast limit
    Similarity.requireBroadcastableBatch(queries, "ivfCrossTopK",
      "Probe in bounded batches, or use ivfCosinePairs for all-pairs work.")
    // The pair dedup (multi-assignment duplicates a (query, candidate)
    // pair once per shared cell; the dot must run once per pair) shuffles
    // NARROW 16-byte id pairs only — a first cut carried BOTH embeddings
    // (≈ 1 KB+ per candidate row) through the dropDuplicates exchange,
    // which dominated the probe at sf0.1 and scales with candidate volume.
    // Vectors re-attach after the dedup: the corpus side by vec_id (one
    // row per vector — multi-assign repeats the embedding per cell row),
    // the query side broadcast (the batch is broadcastable by the
    // crossTopK contract).
    val qCells = assignTop(queries, centroids, np)
      .select(col("vec_id").as("query_id"), col("cluster"))
    val cands = qCells
      .join(corpusAssigned.select(col("cluster"), col("vec_id")), "cluster")
      .select(col("query_id"), col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
    val corpusVecs = corpusAssigned
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .dropDuplicates("vec_id")
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), Similarity.norm(col("embedding")).as("qnrm"))
    cands.join(corpusVecs, "vec_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        round(Similarity.dot(col("embedding"), col("qe")) / (col("nrm") * col("qnrm")), 6).as("cos"))
      .filter(col("cos") >= minCos)
      .transform(Similarity.rankPerQuery(kTop))
  }

  /** Build the IVF retrieval state ONCE and return the per-batch probe —
    * the [[Similarity.srpRetriever]] build/apply split for the cell-probe
    * path: centroids train up front, the corpus is multi-assigned and
    * PERSISTED, and the returned function answers ANY query frame — a
    * batch table or each `foreachBatch` micro-batch — with the identical
    * plan tail as [[ivfCrossTopK]]. A query's result depends only on its
    * own row and the static corpus state, so streaming output ≡ batch
    * output on the same rows (StreamingSpec). Pair with
    * [[saveIndex]]/[[loadIndex]] to also survive sessions: a loaded
    * index's `assigned` frame (cluster-partition-pruned scans) drops in as
    * the corpus side via [[retrieverFromIndex]]. */
  def ivfRetriever(corpus: DataFrame, kTop: Int, minCos: Double,
                   nClusters: Int = 0, iters: Int = 3, nProbe: Int = 0,
                   nAssign: Int = 0,
                   sampleCap: Int = defaultSampleCap,
                   targetCell: Long = defaultTargetCell): Retriever = {
    val (k, centroids) = resolveAndTrain(corpus, nClusters, iters, sampleCap, targetCell)
    if (centroids.isEmpty)
      return new Retriever(_ =>
        emptyFrame(corpus, "query_id" -> "bigint", "vec_id" -> "bigint",
          "cos" -> "double", "rnk" -> "int"))
    val na = resolveAssign(nAssign, k)
    val np = resolveAssign(nProbe, k)
    val c = assignTop(corpus, centroids, na)
      .withColumn("nrm", Similarity.norm(col("embedding")))
      .persist()
    new Retriever(
      queries => probeAgainstCells(queries, c, centroids, np, kTop, minCos),
      () => c.unpersist())
  }

  /** Per-batch probe over a PERSISTED/RELOADED index ([[loadIndex]]): the
    * index's single-assigned table is the corpus side directly — cell
    * filters prune to the probed partitions on a reloaded index. Recall
    * equals `nAssign = 1` retrieval; corpora indexed for retrieval should
    * be built with multi-assignment via [[ivfRetriever]] when boundary
    * recall matters more than index size. */
  def retrieverFromIndex(index: IvfIndex, kTop: Int, minCos: Double,
                         nProbe: Int = 0): Retriever = {
    if (index.centroids.isEmpty)
      // a (reloaded) empty index answers every probe with zero rows
      return new Retriever(_ =>
        emptyFrame(index.assigned, "query_id" -> "bigint", "vec_id" -> "bigint",
          "cos" -> "double", "rnk" -> "int"))
    val np = resolveAssign(nProbe, index.centroids.length)
    // no close action: the corpus side is the index's own (typically
    // disk-backed) assigned table, not state this retriever persisted
    new Retriever(queries =>
      probeAgainstCells(queries, index.assigned, index.centroids, np, kTop, minCos))
  }

  /** Bucket-distribution audit for the IVF pair path — the
    * [[Similarity.srpBucketStats]] companion for cell-scoped buckets: one
    * row with collision-bucket count, the largest bucket, buckets a
    * `maxBucket` cap would drop, and candidate-pair volume kept vs dropped.
    * Same knob resolution as [[ivfCosinePairs]], so the audited plan is the
    * plan the pair query runs; candidate counts land in the bench artifact
    * so a k/bits regression is diagnosable from artifacts alone. */
  def ivfBucketStats(emb: DataFrame, nClusters: Int = 0, iters: Int = 3,
                     nAssign: Int = 0, bandsN: Int = 16,
                     maxBucket: Int = Similarity.defaultMaxBucket,
                     sampleCap: Int = defaultSampleCap,
                     targetCell: Long = defaultTargetCell): DataFrame = {
    val (k, centroids) = resolveAndTrain(emb, nClusters, iters, sampleCap, targetCell)
    if (centroids.isEmpty)
      // the stats contract is ONE aggregate row; an empty corpus audits to zeros
      return emb.sparkSession.range(1).select(
        lit(0L).as("n_buckets"), lit(0L).as("max_bucket"),
        lit(0L).as("n_over_cap"), lit(0L).as("kept_candidates"),
        lit(0L).as("dropped_candidates"))
    val na = resolveAssign(nAssign, k)
    Similarity.postingsStats(cellBuckets(emb, centroids, na, bandsN), maxBucket)
  }
}
