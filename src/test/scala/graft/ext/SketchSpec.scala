package graft.ext

import graft.SparkSpec

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    ("s0", "alpha beta gamma delta epsilon zeta eta theta"),
    ("s0", "iota kappa lambda mu nu xi omicron pi"),
    ("s1", "alpha beta gamma delta epsilon zeta eta theta"), // copy of s0 doc 1
    ("s2", "one two three four five six seven eight nine")
  ).toDF("source", "text")

  test("identical trigram sets estimate exactly 1.0; disjoint exactly 0") {
    val est = Sketch.pairEstimates(
        Sketch.sketches(Sketch.docTrigrams(corpus)))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    // s0 strictly CONTAINS s1's trigrams (s0 has a second doc): est in (0, 1)
    assert(est(("s0", "s1")) > 0L && est(("s0", "s1")) < 1000000L)
    // disjoint vocabularies
    assert(est(("s0", "s2")) === 0L && est(("s1", "s2")) === 0L)
    // a source compared with an exact copy of itself estimates exactly 1.0
    val twin = corpus.filter($"source" === "s1")
      .union(Seq(("s9", "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("source", "text"))
    val e2 = Sketch.pairEstimates(Sketch.sketches(Sketch.docTrigrams(twin)))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    assert(e2(("s1", "s9")) === 1000000L)
  }

  test("sketch is the bottom-k: capping k keeps the smallest hashes only") {
    val tris = Sketch.docTrigrams(corpus.filter($"source" === "s0"))
    val full = Sketch.sketches(tris, k = 1000).collect().map(_.getLong(1)).sorted
    val k3 = Sketch.sketches(tris, k = 3).collect().map(_.getLong(1)).sorted
    assert(k3.toSeq === full.take(3).toSeq)
  }

  test("overlapFlagger detects which frozen source a batch came from") {
    val flagger = Sketch.overlapFlagger(corpus)
    try {
      val batch = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text")
      val got = flagger(batch).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
      // the batch IS an s1 doc: full overlap with s1, partial with s0 (a
      // superset sketch), zero with s2
      assert(got("s1") === 1000000L)
      assert(got("s0") > 0L && got("s0") < 1000000L)
      assert(got("s2") === 0L)
    } finally flagger.close()
  }

  test("save/load round-trip reproduces the in-memory flagger") {
    val dir = java.nio.file.Files.createTempDirectory("sketch-idx").toString
    Sketch.saveSketchIndex(corpus, dir)
    val mem = Sketch.overlapFlagger(corpus)
    val loaded = Sketch.loadOverlapFlagger(spark, dir)
    try {
      val batch = Seq((1L, "iota kappa lambda mu nu xi omicron pi"))
        .toDF("doc_id", "text")
      val a = mem(batch).collect().map(_.toSeq).toSet
      val b = loaded(batch).collect().map(_.toSeq).toSet
      assert(a == b && a.nonEmpty)
    } finally { mem.close(); loaded.close() }
  }
}
