package graft.ext

import graft.SparkSpec

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(rows: (Long, String)*) =
    Dedup.winnowFingerprints(rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("detection guarantee: a shared window+k-1 token run shares a fingerprint") {
    // the 6-token run "p q r s t u" is embedded in fully different contexts
    val f = fps(
      1L -> "alpha beta p q r s t u gamma delta",
      2L -> "one two three p q r s t u four five six")
    val a = f.filter(_._1 == 1L).map(_._2).toSet
    val b = f.filter(_._1 == 2L).map(_._2).toSet
    assert((a & b).nonEmpty, "shared run produced no shared fingerprint")
  }

  test("shift robustness: a long inserted prefix does not erase matches") {
    val doc = "the winnowing scheme selects local minima over hash windows " +
      "and keeps every document slice detectable"
    val shifted = "completely unrelated preamble text sits here first " + doc
    val f = fps(1L -> doc, 2L -> shifted)
    val a = f.filter(_._1 == 1L).map(_._2).toSet
    val b = f.filter(_._1 == 2L).map(_._2).toSet
    // every fingerprint of the original survives in the shifted copy
    assert((a -- b).isEmpty, s"shift lost fingerprints: ${a -- b}")
    val pairs = Dedup.winnowPairs(
      Seq(1L -> doc, 2L -> shifted).toDF("doc_id", "text")).collect()
    assert(pairs.length == 1 && pairs(0).getLong(2) >= a.size)
  }

  test("short docs stay in domain with their global minimum") {
    val f = fps(1L -> "just four tokens here") // 2 three-grams < window 4
    assert(f.length == 1)
  }

  test("the df cap drops corpus-wide fingerprints") {
    val clones = (1L to 6L).map(i => i -> ("same shared boilerplate text " +
      "everywhere again and again with plenty of repeated tokens to select"))
    val df = clones.toDF("doc_id", "text")
    // df of every fingerprint is 6: cap 4 kills all pairs, cap 8 keeps them
    assert(Dedup.winnowPairs(df, maxDf = 4L).count() == 0L)
    assert(Dedup.winnowPairs(df, maxDf = 8L).count() == 15L) // C(6,2)
  }

  test("flagger corpus-self probe flags exactly the winnowPairs doc set") {
    val corpus = Seq(
      1L -> "alpha beta p q r s t u gamma delta epsilon",
      2L -> "one two three p q r s t u four five six",
      3L -> "fully unrelated content with nothing shared at all here"
    ).toDF("doc_id", "text")
    val flagger = Dedup.winnowFlagger(corpus)
    try {
      val flagged = flagger(corpus).collect().map(_.getLong(0)).toSet
      val inPairs = Dedup.winnowPairs(corpus).collect()
        .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
      assert(flagged == inPairs)
    } finally flagger.close()
  }

  test("saved index reloads to an identical flagger") {
    val run = (1 to 16).map(i => s"run$i").mkString(" ")
    val corpus = Seq(
      1L -> s"alpha beta $run gamma delta epsilon",
      2L -> "one two three completely different four five six").toDF("doc_id", "text")
    val batch = Seq(9L -> s"noise prefix $run noise suffix words")
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("winnow-idx").toString
    try {
      Dedup.saveWinnowIndex(corpus, dir)
      val mem = Dedup.winnowFlagger(corpus)
      val loaded = Dedup.loadWinnowFlagger(spark, dir)
      try {
        val a = mem(batch).orderBy("doc_id").collect().map(_.toSeq).toSeq
        val b = loaded(batch).orderBy("doc_id").collect().map(_.toSeq).toSeq
        assert(a == b && a.nonEmpty)
      } finally { mem.close(); loaded.close() }
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("fingerprint volume is the winnowing density, not the gram count") {
    // a 200-token doc of distinct tokens: expected fingerprints ≈
    // 2·n_grams/(window+1) — assert well under the gram count
    val toks = (1 to 200).map(i => s"tok$i").mkString(" ")
    val n = fps(1L -> toks).length
    assert(n < 198 && n > 198 / 5, s"unexpected density: $n of 198 grams")
  }
}
