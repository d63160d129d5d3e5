package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The semantic-curation composition: exact-path behavior pinned against a
  * hand-checkable fixture shape, and the pluggable-miner contract (swap in
  * the banded scale path, same downstream). */
class CurationSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("semanticCurate keeps one canonical per cluster plus all loners") {
    val docs = Tables.documents(spark, d)
    val emb = Tables.embeddings(spark, d)
    val out = Curation.semanticCurate(docs, emb,
      vecs => Similarity.cosinePairs(vecs, threshold = 0.35))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // kept ids are unique and every kept id is an exact-dedup survivor
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    val survivors = docs.groupBy(col("text")).agg(min(col("doc_id")).as("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(survivors.contains))
    // reconstruct the clusters independently; exactly one member kept per
    // cluster, and it is the quality argmax (lowest id on ties)
    val vecs = emb.join(
      docs.groupBy(col("text")).agg(min(col("doc_id")).as("vec_id"))
        .select("vec_id"), Seq("vec_id"), "left_semi")
    val clusters = Dedup.dupClusters(
      Similarity.cosinePairs(vecs, threshold = 0.35).select(col("ia"), col("ib")))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val scoreOf = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val keptSet = ids.toSet
    clusters.groupBy(_._2).foreach { case (_, members) =>
      val ms = members.map(_._1)
      val keptMembers = ms.filter(keptSet.contains)
      assert(keptMembers.length === 1, s"cluster $ms kept $keptMembers")
      val best = ms.maxBy(id => (scoreOf(id), -id))
      assert(keptMembers.head === best)
    }
    // loners (survivors in no cluster) all pass through
    val clustered = clusters.map(_._1).toSet
    assert((survivors -- clustered).forall(keptSet.contains))
  }

  test("the miner is pluggable: SRP-banded source runs the same downstream") {
    val docs = Tables.documents(spark, d)
    val emb = Tables.embeddings(spark, d)
    val exact = Curation.semanticCurate(docs, emb,
      vecs => Similarity.cosinePairs(vecs, threshold = 0.35)).collect()
    val banded = Curation.semanticCurate(docs, emb,
      vecs => Similarity.srpCosinePairs(vecs, threshold = 0.35)).collect()
    assert(banded.map(_.schema.fieldNames.toSeq).headOption ===
      exact.map(_.schema.fieldNames.toSeq).headOption)
    // banding can only MISS pairs (recall < 1), so fewer/equal merges and
    // at least as many kept documents — never fewer
    assert(banded.length >= exact.length)
  }

  test("splitAssigner: near-dups inherit the reference split, novel docs hash") {
    import spark.implicits._
    val ref = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")
    ).toDF("doc_id", "text")
    val refSplits = Seq((1L, "test"), (2L, "train")).toDF("doc_id", "split")
    val assigner = Curation.splitAssigner(ref, refSplits)
    try {
      val batch = Seq(
        (10L, "alpha beta gamma delta epsilon zeta"), // exact copy of ref 1
        (11L, "one two three four five six seven"),   // jacc 0.8 vs ref 2
        (12L, "completely different words here entirely") // novel
      ).toDF("doc_id", "text")
      val out = assigner(batch).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
      assert(out(10L) === (("test", true)))
      assert(out(11L) === (("train", true)))
      // the novel doc falls through to the SAME hash the batch split uses
      val expected = Seq(12L).toDF("id")
        .select(Curation.hashSplit(col("id"))).head.getString(0)
      assert(out(12L) === ((expected, false)))
      // empty batch is total
      assert(assigner(batch.filter(lit(false))).count() === 0)
    } finally assigner.close()
  }

  test("splitAssigner: a doc matching two reference docs takes the best match") {
    import spark.implicits._
    // doc 13 vs ref 1: shingle Jaccard 0.6; vs ref 2: 0.33 — at a 0.3
    // threshold BOTH flag, and the assigner must inherit from the better
    val ref = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y")
    ).toDF("doc_id", "text")
    val refSplits = Seq((1L, "val"), (2L, "train")).toDF("doc_id", "split")
    val assigner = Curation.splitAssigner(ref, refSplits, threshold = 0.3)
    try {
      val out = assigner(Seq((13L, "a b c d e g")).toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out(13L) === "val")
    } finally assigner.close()

    // a PARTIAL split table: the best match (ref 1) has no split entry,
    // so the doc must inherit from its best COVERED match (ref 2), not
    // fall through to the hash as if it were novel
    val partial = Seq((2L, "train")).toDF("doc_id", "split")
    val assigner2 = Curation.splitAssigner(ref, partial, threshold = 0.3)
    try {
      val out = assigner2(Seq((13L, "a b c d e g")).toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
        .toMap
      assert(out(13L) === (("train", true)))
    } finally assigner2.close()
  }
}
