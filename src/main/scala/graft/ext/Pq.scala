package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PqFunctions

/** Product quantization — the memory-compressed ANN index family
  * (Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
  * Search", PAMI 2011; the FAISS IVFPQ shape).
  *
  * The embedding space is split into `m` subspaces; each subspace gets its
  * own `k`-centroid codebook (per-subspace Lloyd on the SAME seeded sample
  * as [[Ivf]] training); a vector encodes to `m` small codes — at the
  * defaults (m=8, k=16) 8 bytes instead of 64 floats, a 32× smaller index.
  * Query scoring is asymmetric (ADC): the query builds an m·k lookup table
  * of subspace dots ONCE, and every candidate costs m table-gathers
  * instead of a dim-length dot product.
  *
  * Why this matters at 100 TB: the scored corpus artifact shrinks 32×
  * (codes ride shuffles and scans instead of raw vectors), and the scoring
  * scan is bandwidth-bound on 8-byte rows. All three kernels (encode, LUT,
  * gather-sum) are native codegen'd expressions
  * ([[org.apache.spark.sql.graft.PqCodeExpr]] and friends) — no UDFs, no
  * interpreted lambdas, whole-stage codegen end to end.
  *
  * Correctness posture: training is deterministic (seeded sample order +
  * fixed Lloyd rounds — the [[Ivf]] rule), so codes and ADC scores are
  * reproducible; ADC is an APPROXIMATION of the true cosine, so catalog
  * entries are rows-only with driver-visible recall gates vs the exact
  * paths (the x19/x67 pattern), and the refined variant re-ranks its
  * shortlist with EXACT cosine so reported scores are true cosines.
  */
object Pq {

  /** A trained PQ model: `flat` is the m·k·subDim codebook matrix laid out
    * `[(s·k + c)·subDim + i]` — the layout all three kernels index. Tiny
    * (8 KB at defaults): rides task serialization like a literal. */
  final case class PqModel(m: Int, k: Int, subDim: Int, flat: Array[Double]) {
    def isEmpty: Boolean = flat.isEmpty

    /** `|codebook[s][c]|²` in ADC-LUT layout — gather-summed over a row's
      * codes it yields `|reconstruct(x)|²`, the norm the approximate
      * cosine needs, without touching the original vector. */
    lazy val norms2: Array[Double] = {
      val out = new Array[Double](m * k)
      var idx = 0
      while (idx < out.length) {
        var n2 = 0.0
        var i = 0
        while (i < subDim) { val v = flat(idx * subDim + i); n2 += v * v; i += 1 }
        out(idx) = n2
        idx += 1
      }
      out
    }
  }

  /** Defaults: 8 subspaces × 16 centroids = 8-byte codes on the 64-dim
    * fixture (subDim 8). m must divide the vector dim. */
  val defaultM: Int = 8
  val defaultK: Int = 16

  /** Train per-subspace codebooks on the seeded driver sample — the ONE
    * sample definition ([[Ivf.collectSample]]), sliced per subspace, each
    * slice through the ONE Lloyd definition ([[Ivf.lloydTrain]]): PQ and
    * IVF training cannot fork. Vectors shorter than the max dim are
    * zero-padded (the kernels read missing positions as 0). A sample
    * smaller than `k` yields that many centroids, padded by repeating the
    * first (a duplicate centroid can only tie, and ties break to the
    * lowest code — harmless). Empty corpus → empty model; callers
    * short-circuit. */
  def train(emb: DataFrame, m: Int = defaultM, k: Int = defaultK,
            iters: Int = 3, sampleCap: Int = Ivf.defaultSampleCap): PqModel = {
    require(sampleCap > 0, s"PQ training is sample-based; sampleCap=$sampleCap")
    trainFromSample(Ivf.collectSample(emb, sampleCap), m, k, iters)
  }

  /** [[train]] on a PRE-COLLECTED sample — IVF-PQ builds (and any pipeline
    * training several sample-based models) pass the one seeded
    * [[Ivf.collectSample]] sample to every training so the corpus-wide
    * sampling job runs once. */
  def trainFromSample(sample: Array[Array[Double]],
      m: Int, k: Int, iters: Int = 3): PqModel = {
    require(m >= 1 && k >= 1, s"need m >= 1 and k >= 1, got m=$m k=$k")
    if (sample.isEmpty) return PqModel(m, k, 0, Array.emptyDoubleArray)
    val dim = sample.iterator.map(_.length).max
    require(dim % m == 0, s"subspace count m=$m must divide dim=$dim")
    val subDim = dim / m
    val flat = new Array[Double](m * k * subDim)
    var s = 0
    while (s < m) {
      val sub = sample.map { v =>
        Array.tabulate(subDim) { i =>
          val pos = s * subDim + i
          if (pos < v.length) v(pos) else 0.0
        }
      }
      val cb = Ivf.lloydTrain(sub, k, iters)
      var c = 0
      while (c < k) {
        val src = if (c < cb.length) cb(c) else cb(0)
        System.arraycopy(src, 0, flat, (s * k + c) * subDim, subDim)
        c += 1
      }
      s += 1
    }
    PqModel(m, k, subDim, flat)
  }

  /** The reconstruction-norm column for a codes column: gather-sum the
    * model's squared-norm LUT, floored away from zero so a vector that
    * quantizes to the origin cannot divide-by-zero the cosine. */
  private def rnormOf(codes: Column, model: PqModel): Column =
    greatest(sqrt(PqFunctions.pqAdcF(codes, typedLit(model.norms2.toSeq), model.k)),
      lit(1e-12))

  /** Encode every vector: ONE map-side pass, no shuffle — output
    * `(vec_id, codes, rnorm)` is the persistable 8-bytes-per-vector index
    * artifact. Empty model (empty corpus) → zero rows, schema-complete. */
  def encode(emb: DataFrame, model: PqModel): DataFrame =
    if (model.isEmpty)
      emb.filter(lit(false))
        .select(col("vec_id"), lit(Array.emptyIntArray).as("codes"),
          lit(0.0).as("rnorm"))
    else
      emb.select(col("vec_id"),
          PqFunctions.pqCodeF(col("embedding"), model).as("codes"))
        .withColumn("rnorm", rnormOf(col("codes"), model))

  /** Single-query ADC top-k over the encoded corpus: the query row is
    * broadcast with its LUT computed ON THE EXECUTOR ([[PqFunctions.pqLutF]]
    * — no driver fetch, the [[Similarity.cosineTopK]] shape), and the scan
    * ranks `approx_cos = adc / (|q|·|recon(x)|)`. Rows-only (approximate
    * scores); recall vs exact is the catalog gate. */
  def pqTopK(emb: DataFrame, queryId: Long, kTop: Int,
             model: PqModel): DataFrame = {
    if (model.isEmpty)
      return Ivf.emptyFrame(emb, "vec_id" -> "bigint", "acos" -> "double")
    val codes = encode(emb, model)
    val q = emb.filter(col("vec_id") === queryId)
      .select(PqFunctions.pqLutF(col("embedding"), model).as("lut"),
        Similarity.norm(col("embedding")).as("qnrm"))
    codes.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(PqFunctions.pqAdcF(col("codes"), col("lut"), model.k) /
          (col("qnrm") * col("rnorm")), 6).as("acos"))
      .orderBy(col("acos").desc, col("vec_id").asc)
      .limit(kTop)
  }

  /** IVF-PQ batch retrieval (the FAISS IndexIVFPQ composition): coarse
    * cells bound the candidate universe ([[Ivf]] multi-assign — a true
    * neighbor needs ONE shared cell), PQ codes make each candidate cost m
    * gathers, and an optional refine stage re-ranks the ADC shortlist with
    * EXACT cosine.
    *
    * Scale shape: the corpus pass assigns + encodes in ONE scan (no
    * join-back); candidates are an equi-join on the cell id, never
    * queries × corpus; the ADC shortlist is `refine·kTop` rows per query,
    * so the refine join back to original vectors touches O(queries·kTop)
    * rows — the index scan itself never reads a raw vector. With
    * `refine = 0` the ADC ranking is final (`cos` is approximate); with
    * refine on, reported `cos` is TRUE cosine on the shortlist.
    * Output contract matches [[Ivf.ivfCrossTopK]]: (query_id, vec_id,
    * cos, rnk). */
  def ivfPqCrossTopK(queries: DataFrame, corpus: DataFrame,
                     kTop: Int, minCos: Double,
                     nClusters: Int = 0, iters: Int = 3, nProbe: Int = 0,
                     nAssign: Int = 0, m: Int = defaultM, k: Int = defaultK,
                     refine: Int = 4,
                     sampleCap: Int = Ivf.defaultSampleCap,
                     targetCell: Long = Ivf.defaultTargetCell): DataFrame = {
    // PQ codebooks are sample-trained by construction, so the plain-IVF
    // "sampleCap = 0 -> exact distributed Lloyd" escape hatch cannot apply
    // to the IVF-PQ composites; reject the config loudly rather than
    // returning a silently empty result
    require(sampleCap > 0,
      s"IVF-PQ is sample-trained; sampleCap=$sampleCap must be > 0")
    // ONE corpus-wide sampling job feeds both trainings
    val sample = Ivf.collectSample(corpus, sampleCap)
    val (nc, centroids) = Ivf.resolveAndTrainFromSample(
      corpus, sample, nClusters, iters, sampleCap, targetCell)
    val model = trainFromSample(sample, m, k, iters)
    if (centroids.isEmpty || model.isEmpty)
      return Ivf.emptyFrame(corpus, "query_id" -> "bigint", "vec_id" -> "bigint",
        "cos" -> "double", "rnk" -> "int")
    val na = Ivf.resolveAssign(nAssign, nc)
    // one corpus scan: multi-assign to cells AND encode
    val indexed = Ivf.assignTop(corpus, centroids, na)
      .select(col("vec_id"), col("cluster"),
        PqFunctions.pqCodeF(col("embedding"), model).as("codes"))
      .withColumn("rnorm", rnormOf(col("codes"), model))
    probePq(queries, Some(corpus), indexed, centroids, model,
      Ivf.resolveAssign(nProbe, nc), kTop, minCos, refine)
  }

  /** The query-side half, shared by [[ivfPqCrossTopK]], [[pqRetriever]] and
    * [[retrieverFromPqIndex]]: per-query LUT + cell probes, cell equi-join,
    * ADC rank, optional exact refine. `refineSrc` is the raw-vector store
    * the refine join consults (None with `refine <= 0` — the pure
    * compressed-domain path a loaded index can run without any raw
    * vectors). */
  private def probePq(queries: DataFrame, refineSrc: Option[DataFrame],
                      indexed: DataFrame, centroids: Array[Array[Double]],
                      model: PqModel, np: Int, kTop: Int, minCos: Double,
                      refine: Int): DataFrame = {
    require(refine <= 0 || refineSrc.nonEmpty,
      "refine > 0 needs the raw-vector corpus frame")
    // the per-query LUT frame (m·k doubles per row) broadcasts below:
    // enforce the crossTopK contract instead of merely citing it
    Similarity.requireBroadcastableBatch(queries, "ivfPqCrossTopK",
      "Probe in bounded batches against the built index (pqRetriever).")
    // The candidate dedup (multi-assignment duplicates a (query, candidate)
    // pair once per shared cell; the ADC must run once per pair) shuffles
    // NARROW 16-byte id pairs only. A first cut deduped after attaching the
    // per-query LUT (m·k doubles ≈ 2 KB) and the codes to every candidate
    // row — at sf0.1 that pushed ~1.4 GB through the dropDuplicates
    // exchange and dominated the whole retrieval (x119 ~4.8 s); the same
    // blowup scales with candidate volume, so at 100 TB it would be the
    // bottleneck shuffle. Codes re-attach by vec_id after the dedup, and
    // the LUT table (one row per QUERY — the batch is broadcastable by the
    // crossTopK contract) broadcasts so the ADC stays compute-local.
    val qCells = queries
      .select(col("vec_id").as("query_id"),
        explode(Ivf.topCells(centroids, math.min(np, centroids.length))).as("sc"))
      .select(col("query_id"), (-col("sc.negj")).as("cluster"))
    val qLut = queries.select(col("vec_id").as("query_id"),
      PqFunctions.pqLutF(col("embedding"), model).as("lut"),
      Similarity.norm(col("embedding")).as("qnrm"))
    val cands = qCells.join(indexed.select(col("cluster"), col("vec_id")), "cluster")
      .select(col("query_id"), col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
    // one row per vec_id (multi-assign repeats codes per cell row)
    val codes = indexed.select(col("vec_id"), col("codes"), col("rnorm"))
      .dropDuplicates("vec_id")
    val scored = cands.join(codes, "vec_id").join(broadcast(qLut), "query_id")
      .select(col("query_id"), col("vec_id"),
        round(PqFunctions.pqAdcF(col("codes"), col("lut"), model.k) /
          (col("qnrm") * col("rnorm")), 6).as("acos"))
    if (refine <= 0) {
      scored.filter(col("acos") >= minCos)
        .select(col("query_id"), col("vec_id"), col("acos").as("cos"))
        .transform(Similarity.rankPerQuery(kTop))
    } else {
      // ADC shortlist of refine·kTop per query, then TRUE cosine on the
      // shortlist only — the minCos filter applies to the exact score
      val ws = Window.partitionBy(col("query_id"))
        .orderBy(col("acos").desc, col("vec_id"))
      val shortlist = scored
        .withColumn("srnk", row_number().over(ws))
        .filter(col("srnk") <= refine * kTop)
        .select(col("query_id"), col("vec_id"))
      val emb = refineSrc.get.select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
      // query vectors come from the QUERIES frame — queries are not
      // (necessarily) corpus members
      val qe = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"), Similarity.norm(col("embedding")).as("qnrm"))
      shortlist
        .join(emb, "vec_id")
        .join(qe, "query_id")
        .select(col("query_id"), col("vec_id"),
          round(Similarity.dot(col("embedding"), col("qe")) /
            (col("nrm") * col("qnrm")), 6).as("cos"))
        .filter(col("cos") >= minCos)
        .transform(Similarity.rankPerQuery(kTop))
    }
  }

  /** Build the IVF-PQ retrieval state ONCE and return the per-batch probe
    * — the [[Ivf.ivfRetriever]] build/apply split with the compressed
    * index: centroids + codebooks train up front, the corpus is assigned,
    * encoded, and PERSISTED (codes, not vectors — the persisted state is
    * ~32× smaller than the raw corpus side of [[Ivf.ivfRetriever]]), and
    * the returned [[Retriever]] answers any query frame with the identical
    * plan tail as [[ivfPqCrossTopK]]. With `refine > 0` the original
    * corpus frame is consulted per batch for the shortlist re-rank only.
    * `close()` releases the persisted index. */
  def pqRetriever(corpus: DataFrame, kTop: Int, minCos: Double,
                  nClusters: Int = 0, iters: Int = 3, nProbe: Int = 0,
                  nAssign: Int = 0, m: Int = defaultM, k: Int = defaultK,
                  refine: Int = 4,
                  sampleCap: Int = Ivf.defaultSampleCap,
                  targetCell: Long = Ivf.defaultTargetCell): Retriever = {
    // PQ codebooks are sample-trained by construction, so the plain-IVF
    // "sampleCap = 0 -> exact distributed Lloyd" escape hatch cannot apply
    // to the IVF-PQ composites; reject the config loudly rather than
    // returning a silently empty result
    require(sampleCap > 0,
      s"IVF-PQ is sample-trained; sampleCap=$sampleCap must be > 0")
    // ONE corpus-wide sampling job feeds both trainings
    val sample = Ivf.collectSample(corpus, sampleCap)
    val (nc, centroids) = Ivf.resolveAndTrainFromSample(
      corpus, sample, nClusters, iters, sampleCap, targetCell)
    val model = trainFromSample(sample, m, k, iters)
    if (centroids.isEmpty || model.isEmpty) {
      val empty = Ivf.emptyFrame(corpus, "query_id" -> "bigint",
        "vec_id" -> "bigint", "cos" -> "double", "rnk" -> "int")
      return new Retriever(_ => empty)
    }
    val na = Ivf.resolveAssign(nAssign, nc)
    val indexed = Ivf.assignTop(corpus, centroids, na)
      .select(col("vec_id"), col("cluster"),
        PqFunctions.pqCodeF(col("embedding"), model).as("codes"))
      .withColumn("rnorm", rnormOf(col("codes"), model))
      .persist()
    val np = Ivf.resolveAssign(nProbe, nc)
    new Retriever(
      queries => probePq(queries, Some(corpus), indexed, centroids, model,
        np, kTop, minCos, refine),
      () => { indexed.unpersist(); () })
  }

  /** A built IVF-PQ index: codebooks + coarse centroids (driver-side,
    * tiny) plus the encoded, cell-assigned codes table — NO raw vectors.
    * At the catalog defaults the persisted artifact is ~16 bytes + a
    * cell id per vector: the index a 100 TB corpus can afford to
    * replicate to every probe site. */
  final case class PqIndex(model: PqModel, centroids: Array[Array[Double]],
                           indexed: DataFrame)

  /** Train coarse cells + codebooks and encode the corpus in ONE scan —
    * the build half of build-once/probe-many. */
  def buildPqIndex(corpus: DataFrame, nClusters: Int = 0, iters: Int = 3,
                   nAssign: Int = 0, m: Int = defaultM, k: Int = defaultK,
                   sampleCap: Int = Ivf.defaultSampleCap,
                   targetCell: Long = Ivf.defaultTargetCell): PqIndex = {
    // PQ codebooks are sample-trained by construction, so the plain-IVF
    // "sampleCap = 0 -> exact distributed Lloyd" escape hatch cannot apply
    // to the IVF-PQ composites; reject the config loudly rather than
    // returning a silently empty result
    require(sampleCap > 0,
      s"IVF-PQ is sample-trained; sampleCap=$sampleCap must be > 0")
    // ONE corpus-wide sampling job feeds both trainings
    val sample = Ivf.collectSample(corpus, sampleCap)
    val (nc, centroids) = Ivf.resolveAndTrainFromSample(
      corpus, sample, nClusters, iters, sampleCap, targetCell)
    val model = trainFromSample(sample, m, k, iters)
    if (centroids.isEmpty || model.isEmpty)
      return PqIndex(model, centroids,
        Ivf.emptyFrame(corpus, "vec_id" -> "bigint", "cluster" -> "int",
          "codes" -> "array<int>", "rnorm" -> "double"))
    val na = Ivf.resolveAssign(nAssign, nc)
    PqIndex(model, centroids,
      Ivf.assignTop(corpus, centroids, na)
        .select(col("vec_id"), col("cluster").cast("int").as("cluster"),
          PqFunctions.pqCodeF(col("embedding"), model).as("codes"))
        .withColumn("rnorm", rnormOf(col("codes"), model)))
  }

  /** Persist a built IVF-PQ index — the [[Ivf.saveIndex]] layout with
    * codes instead of vectors:
    *   - `dir/encoded`: (vec_id, codes, rnorm) through the EXPORT SINK
    *     with `cluster` as the shard column — the same `cluster=N` layout
    *     probes prune on, PLUS the writeShards manifest (per-cell counts,
    *     digests, per-file checksums), so a fresh index validates with
    *     `Export.validateShards` immediately and [[appendToIndex]]'s
    *     schema-drift/self-healing guards hold from the first append
    *     (the [[Ivf.saveIndex]] rationale);
    *   - `dir/codebooks`: one tiny parquet of (s, c, centroid) rows plus
    *     the (m, k, subDim) shape on every row — self-describing;
    *   - `dir/centroids`: the coarse-quantizer matrix, [[Ivf.saveIndex]]'s
    *     format.
    * Empty index: unpartitioned schema-complete writes (the
    * [[Ivf.saveIndex]] empty rule). */
  def savePqIndex(index: PqIndex, dir: String): Unit = {
    val spark = index.indexed.sparkSession
    import spark.implicits._
    val model = index.model
    if (index.centroids.isEmpty || model.isEmpty) {
      index.indexed.limit(0)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$dir/encoded")
      Seq.empty[(Int, Int, Int, Int, Int, Seq[Double])]
        .toDF("s", "c", "m", "k", "sub_dim", "centroid").coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$dir/codebooks")
      Seq.empty[(Int, Seq[Double])].toDF("cluster_id", "centroid").coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$dir/centroids")
      return
    }
    Export.writeShards(
      index.indexed
        .select(col("vec_id"), col("codes"), col("rnorm"), col("cluster")),
      s"$dir/encoded", shardCol = "cluster")
    (for (s <- 0 until model.m; c <- 0 until model.k) yield {
      val base = (s * model.k + c) * model.subDim
      (s, c, model.m, model.k, model.subDim,
        model.flat.slice(base, base + model.subDim).toSeq)
    }).toDF("s", "c", "m", "k", "sub_dim", "centroid").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/codebooks")
    index.centroids.zipWithIndex
      .map { case (c, j) => (j, c.toSeq) }.toSeq
      .toDF("cluster_id", "centroid").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/centroids")
  }

  /** Encode a NEW batch against a persisted index's FROZEN codebooks and
    * coarse quantizer and land it through the export sink —
    * [[Ivf.appendToIndex]]'s PQ counterpart, the daily-ingest path. The
    * codebooks are frozen BY DESIGN (stored codes and ADC tables are only
    * comparable under one codebook set), which is exactly what makes
    * append sound: append ≡ rebuild-with-the-same-models over the union,
    * pinned by PqSpec. Codebooks + centroids are driver reads (tiny); the
    * batch encodes map-side and appends as an epoch into the manifest'd
    * `dir/encoded` export (schema drift refused, failed appends
    * self-heal, counts republished). `nAssign` must match the build's
    * (both default to the corpus-independent [[Ivf.resolveAssign]] of the
    * index's own cell count, so defaults always agree). */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession,
                    batch: DataFrame, dir: String,
                    nAssign: Int = 0): Map[Long, Long] = {
    val index = loadPqIndex(spark, dir)
    require(index.centroids.nonEmpty && !index.model.isEmpty,
      s"appendToIndex: index at $dir is empty — buildPqIndex/savePqIndex " +
        "on the first real corpus instead")
    val na = Ivf.resolveAssign(nAssign, index.centroids.length)
    val rows = Ivf.assignTop(
      batch.select(col("vec_id"), col("embedding")), index.centroids, na)
      .select(col("vec_id"),
        col("cluster").cast("int").as("cluster"),
        PqFunctions.pqCodeF(col("embedding"), index.model).as("codes"))
      .withColumn("rnorm", rnormOf(col("codes"), index.model))
      // parquet reads arrays back containsNull=true; align the batch's
      // non-null codes type so the append schema gate compares values,
      // not codegen nullability
      .select(col("vec_id"), col("codes").cast("array<int>").as("codes"),
        col("rnorm"), col("cluster"))
    Export.appendShards(rows, s"$dir/encoded", shardCol = "cluster")
  }

  /** Reload a [[savePqIndex]] index: codebooks + centroids are one-small-
    * file driver reads; the encoded table is lazy and cell-partition-
    * pruned on probe. */
  def loadPqIndex(spark: org.apache.spark.sql.SparkSession, dir: String): PqIndex = {
    val cbRows = spark.read.parquet(s"$dir/codebooks")
      .orderBy("s", "c").collect()
    val model =
      if (cbRows.isEmpty) PqModel(defaultM, defaultK, 0, Array.emptyDoubleArray)
      else {
        val h = cbRows.head
        val (m, k, subDim) = (h.getInt(h.fieldIndex("m")),
          h.getInt(h.fieldIndex("k")), h.getInt(h.fieldIndex("sub_dim")))
        val flat = new Array[Double](m * k * subDim)
        cbRows.foreach { r =>
          val base = (r.getInt(0) * k + r.getInt(1)) * subDim
          val cent = r.getSeq[Double](r.fieldIndex("centroid"))
          var i = 0
          while (i < subDim) { flat(base + i) = cent(i); i += 1 }
        }
        PqModel(m, k, subDim, flat)
      }
    val centroids = spark.read.parquet(s"$dir/centroids")
      .orderBy("cluster_id").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
    val indexed = spark.read.parquet(s"$dir/encoded")
      .select(col("vec_id"), col("cluster").cast("int").as("cluster"),
        col("codes"), col("rnorm"))
    PqIndex(model, centroids, indexed)
  }

  /** Per-batch probe over a built or RELOADED index. With `refine > 0`
    * pass the raw-vector corpus as `refineSrc` (the shortlist re-rank
    * fetches O(queries·kTop) vectors from it); `refine = 0` needs no raw
    * vectors at all — the loaded codes table answers alone. */
  def retrieverFromPqIndex(index: PqIndex, kTop: Int, minCos: Double,
                           nProbe: Int = 0, refine: Int = 0,
                           refineSrc: Option[DataFrame] = None): Retriever = {
    if (index.centroids.isEmpty || index.model.isEmpty) {
      val empty = Ivf.emptyFrame(index.indexed, "query_id" -> "bigint",
        "vec_id" -> "bigint", "cos" -> "double", "rnk" -> "int")
      return new Retriever(_ => empty)
    }
    val np = Ivf.resolveAssign(nProbe, index.centroids.length)
    new Retriever(queries =>
      probePq(queries, refineSrc, index.indexed, index.centroids,
        index.model, np, kTop, minCos, refine))
  }

  /** Index-quality audit — the [[Ivf.ivfBucketStats]] counterpart for the
    * product quantizer, the table a production deployment watches for
    * codebook collapse (dead codes / one dominant code = the quantizer
    * stopped discriminating and ADC ranking degrades silently): one row
    * per subspace with the number of distinct codes in use, the share of
    * the most-popular code, and the corpus mean relative reconstruction
    * error (identical across rows — it is a corpus-level figure carried
    * on the audit table). One encode pass + one m-way explode; the
    * reconstruction error never materializes a reconstructed vector
    * (`|x−r|² = |x|² + |r|² − 2·x·r` with both right-hand dots ADC
    * gather-sums). */
  def pqStats(emb: DataFrame, model: PqModel): DataFrame = {
    if (model.isEmpty)
      return Ivf.emptyFrame(emb, "s" -> "int", "codes_used" -> "bigint",
        "top_share" -> "double", "mean_rel_err" -> "double")
    val coded = emb.select(col("embedding"),
        PqFunctions.pqCodeF(col("embedding"), model).as("codes"))
      .withColumn("lut", PqFunctions.pqLutF(col("embedding"), model))
      .withColumn("xr", PqFunctions.pqAdcF(col("codes"), col("lut"), model.k))
      .withColumn("r2", PqFunctions.pqAdcF(col("codes"),
        typedLit(model.norms2.toSeq), model.k))
      .withColumn("x2", Similarity.dot(col("embedding"), col("embedding")))
      .withColumn("rel_err",
        sqrt(greatest(col("x2") + col("r2") - lit(2.0) * col("xr"), lit(0.0))) /
          sqrt(greatest(col("x2"), lit(1e-24))))
    coded
      .select(posexplode(col("codes")).as(Seq("s", "c")), col("rel_err"))
      .groupBy(col("s"), col("c"))
      .agg(count(lit(1)).as("n"), sum(col("rel_err")).as("err_sum"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("codes_used"),
        round(max(col("n")).cast("double") / sum(col("n")), 6).as("top_share"),
        round(sum(col("err_sum")) / sum(col("n")), 6).as("mean_rel_err"))
      .orderBy("s")
  }
}
