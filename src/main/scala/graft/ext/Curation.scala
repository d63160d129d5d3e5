package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end curation compositions — the pipelines a training-data team
  * actually runs, assembled from the operator library with every stage
  * keeping its own documented scale posture.
  */
object Curation {

  /** Semantic curation: exact text dedup → embedding near-dup clustering
    * over the SURVIVORS → one highest-quality canonical per cluster
    * (lowest-id tie-break), non-clustered survivors passing through.
    * Output: (`doc_id`, `source`, `score`) of every kept document.
    *
    * `pairSource` mines near-dup pairs (`ia`, `ib`[, `cos`]) from the
    * surviving vectors — inject [[Similarity.cosinePairs]] for the exact
    * oracle-checkable baseline (fail-fast bounded), or
    * [[Similarity.srpCosinePairs]] / [[Ivf.ivfCosinePairs]] at corpus
    * scale: the downstream (clusters → canonical pick → anti-join) is
    * identical, which is exactly why the miner is a parameter.
    *
    * Scale shape: dedup is the 32-byte-key hash agg (x01), clustering is
    * O(component-diameter) label propagation with the local union-find
    * fast tier ([[Dedup.dupClusters]]), the pick is one partial-agg argmax
    * ([[Dedup.canonicalPick]]), and the final joins key on doc_id. Requires
    * `docs.idCol` and `emb.vec_id` to share an id space. */
  def semanticCurate(docs: DataFrame, emb: DataFrame,
                     pairSource: DataFrame => DataFrame,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    // keep and scored are each consumed by TWO branches of the pipeline
    // (semi-join + anti-join; canonical pick + final join) — persist them
    // so the corpus-wide dedup aggregate and quality scan run once, not
    // twice. They are SCRATCH, not build-once artifacts: the result is
    // eagerly materialized (localCheckpoint severs its lineage to them),
    // then both are unpersisted in the finally — the dupClusters shape —
    // so repeated invocations in one session cannot leak cached frames.
    val keep = docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("doc_id")).select("doc_id")
      .persist()
    val scored = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.qualityScore(col(textCol)).as("score"))
      .persist()
    try {
      val vecs = emb.join(keep.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi")
      val clusters = Dedup.dupClusters(
        pairSource(vecs).select(col("ia"), col("ib")))
      val picks = Dedup.canonicalPick(clusters, scored, "doc_id", "score")
        .select(col("keep_id").as("doc_id"))
      val kept = keep
        .join(clusters.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .union(picks)
      val result = kept
        .join(docs.select(col(idCol).as("doc_id"), col("source")), "doc_id")
        .join(scored, "doc_id")
        .select(col("doc_id"), col("source"), col("score"))
        .persist()
      // Eager: materialize the (id, source, score) result rows NOW, while
      // keep/scored are still cached, then release both in the finally.
      // persist + count rather than localCheckpoint: lineage survives, so
      // a lost executor recomputes blocks (through the then-uncached
      // scratch plans) instead of failing on an unrecoverable checkpoint
      // block, and the logical plan stays visible to plan-contract tests.
      // The cached result itself is reclaimed by the context cleaner when
      // the returned frame becomes unreachable, not held for the session.
      result.count()
      result
    } finally {
      keep.unpersist()
      scored.unpersist()
    }
  }

  /** The md5-derived-uniform train/val/test hash of an id — deterministic,
    * map-side, engine-portable (DuckDB mirrors it as
    * `CAST('0x' || substr(md5(id), 1, 8) AS BIGINT) % 10`): bucket 0 →
    * test, 1 → val, else train (~10/10/80). Shared by the x125
    * cluster-atomic split and [[splitAssigner]], so batch and incremental
    * assignment cannot drift. */
  def hashSplit(id: Column): Column = {
    val bucket =
      conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("bigint") % 10
    when(bucket === 0, "test").when(bucket === 1, "val").otherwise("train")
  }

  /** Build-once split assignment for a GROWING corpus — the x125
    * leakage-safe split kept STABLE across corpus versions: freeze the
    * reference corpus's near-dup flagger ([[Dedup.nearDupFlagger]]) and
    * its (id → split) table, then each increment batch inherits the split
    * of the reference document it near-duplicates (best Jaccard, ties to
    * the lowest ref id) — a new copy of a train document can never land
    * in eval — while genuinely novel documents fall through to the same
    * [[hashSplit]] of their own id the batch split uses (a novel doc is
    * its own cluster in x125 terms). Output per batch row:
    * (doc_id, split, inherited).
    *
    * Scale: the reference is shingled ONCE into capped persisted postings;
    * per batch the work is one postings join, a batch-keyed rank window,
    * and one keyed join against the (persisted) split table. The best
    * match is taken among references that HAVE a split entry, so a
    * partial refSplits table degrades to the next-best covered match
    * rather than mis-hashing a known near-dup as novel. Known trade of
    * incremental assignment: a new doc that near-duplicates reference
    * docs sitting in DIFFERENT splits inherits only the best covered
    * match's split — the periodic full x125 recompute is the
    * reconciliation for that drift. `close()` releases postings and the
    * split table. */
  def splitAssigner(reference: DataFrame, refSplits: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id",
                    n: Int = 3, threshold: Double = 0.6,
                    maxDf: Int = Int.MaxValue): Retriever = {
    val flag = Dedup.nearDupFlagger(reference, textCol, idCol, n, threshold,
      maxDf)
    val splits = refSplits
      .select(col(idCol).as("ref_id"), col("split").as("ref_split"))
      .persist()
    new Retriever(batch => {
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("jacc").desc, col("ref_id"))
      // join splits BEFORE the best-match rank: if refSplits covers only
      // part of the reference corpus, a doc whose best match carries no
      // split entry must inherit from its best COVERED match, not fall
      // through to the hash as if it were novel
      val best = flag(batch)
        .join(splits, "ref_id")
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
        .select(col("doc_id"), col("ref_split"), lit(true).as("inherited"))
      batch.select(col(idCol).as("doc_id"))
        .join(best, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("ref_split"), hashSplit(col("doc_id"))).as("split"),
          coalesce(col("inherited"), lit(false)).as("inherited"))
    }, () => { flag.close(); splits.unpersist() })
  }
}
