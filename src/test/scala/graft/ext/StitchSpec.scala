package graft.ext

import graft.SparkSpec

class StitchSpec extends SparkSpec {
  import spark.implicits._

  // A document split across three records with a 3-token overlap at each
  // seam, plus an unrelated doc and a doc equal to a bare seam.
  private val corpus = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta",
    2L -> "zeta eta theta iota kappa lambda mu",      // continues 1
    3L -> "kappa lambda mu nu xi omicron pi",          // continues 2
    4L -> "totally unrelated content sits over here",
    5L -> "zeta eta"                                    // bare seam fragment: <= k tokens
  ).toDF("doc_id", "text")

  test("stitchPairs finds exactly the directed seams") {
    val got = Stitch.stitchPairs(corpus, k = 3)
      .select("prev_id", "next_id").as[(Long, Long)].collect().toSet
    // doc 2's tail "kappa lambda mu" == doc 3's head; doc 1's tail
    // "zeta eta" is only 2 tokens of overlap at k=3? No: tail of 1 =
    // "epsilon zeta eta", head of 2 = "zeta eta theta" — NOT equal.
    assert(got == Set((2L, 3L)))
  }

  test("a shared k-token seam pairs; k+1 does not overreach") {
    val df = Seq(
      10L -> "one two three four five six",
      11L -> "four five six seven eight nine").toDF("doc_id", "text")
    assert(Stitch.stitchPairs(df, k = 3).select("prev_id", "next_id")
      .as[(Long, Long)].collect().toSet == Set((10L, 11L)))
    assert(Stitch.stitchPairs(df, k = 4).count() == 0L)
  }

  test("docs with <= k tokens never pair (proper prefix/suffix rule)") {
    val df = Seq(
      20L -> "seam tok run",              // exactly k tokens
      21L -> "seam tok run continues on").toDF("doc_id", "text")
    assert(Stitch.stitchPairs(df, k = 3).count() == 0L)
  }

  test("the df cap drops boilerplate seams on both sides") {
    // 6 docs ending in the same footer + 6 starting with it
    val enders = (1L to 6L).map(i => i -> s"unique body $i common footer here")
    val starters = (11L to 16L).map(i => i -> s"common footer here body $i tail")
    val df = (enders ++ starters).toDF("doc_id", "text")
    assert(Stitch.stitchPairs(df, k = 3, maxDf = 4L).count() == 0L)
    assert(Stitch.stitchPairs(df, k = 3, maxDf = 8L).count() == 36L)
  }

  test("hash candidates verify on the overlap string") {
    // same doc on both sides: self-pair excluded even though hashes match
    val df = Seq(30L -> "x y z x y z").toDF("doc_id", "text")
    assert(Stitch.stitchPairs(df, k = 3).count() == 0L)
  }

  test("stitchChains labels components and head/tail roles") {
    val chains = Stitch.stitchChains(corpus, k = 3)
      .as[(Long, Long, Boolean, Boolean)].collect().toSet
    // single chain 2 -> 3: rep is min id 2; 2 is head, 3 is tail
    assert(chains == Set((2L, 2L, true, false), (3L, 2L, false, true)))
  }

  test("a three-link chain marks exactly one head and one tail") {
    val df = Seq(
      1L -> "a b c d e f",
      2L -> "d e f g h i",
      3L -> "g h i j k l").toDF("doc_id", "text")
    val chains = Stitch.stitchChains(df, k = 3)
      .as[(Long, Long, Boolean, Boolean)].collect().toSet
    assert(chains == Set(
      (1L, 1L, true, false), (2L, 1L, false, false), (3L, 1L, false, true)))
  }

  test("flagger corpus-self probe flags exactly the stitchPairs doc set") {
    val flagger = Stitch.stitchFlagger(corpus, k = 3)
    try {
      val flagged = flagger(corpus).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // doc 2 has one successor (3), doc 3 one predecessor (2)
      assert(flagged == Set((2L, 0L, 1L), (3L, 1L, 0L)))
    } finally flagger.close()
  }

  test("flagger probes a NEW batch against the frozen corpus") {
    val flagger = Stitch.stitchFlagger(corpus, k = 3)
    try {
      val batch = Seq(
        100L -> "xi omicron pi rho sigma tau", // continues corpus doc 3's tail
        101L -> "nothing shared with anything here").toDF("doc_id", "text")
      val got = flagger(batch).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((100L, 1L, 0L)))
    } finally flagger.close()
  }

  test("stitchScrub drops exactly the k-token seam from continuation docs") {
    val got = Stitch.stitchScrub(corpus, k = 3)
      .as[(Long, Long, Long, String)].collect().toSet
    // only doc 3 continues another doc; its 3-token head is the seam
    assert(got == Set((3L, 1L, 7L, "nu xi omicron pi")))
    // a doc continuing TWO predecessors still drops only the one shared head
    val df = Seq(
      1L -> "a b seam tok run",
      2L -> "c d seam tok run",
      3L -> "seam tok run body continues here").toDF("doc_id", "text")
    val multi = Stitch.stitchScrub(df, k = 3)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(multi == Set((3L, 2L, 6L, "body continues here")))
  }

  test("save/load round-trip reproduces the in-memory flagger") {
    val dir = java.nio.file.Files.createTempDirectory("stitch-idx").toString
    Stitch.saveStitchIndex(corpus, dir, k = 3)
    val mem = Stitch.stitchFlagger(corpus, k = 3)
    val loaded = Stitch.loadStitchFlagger(spark, dir)
    try {
      val a = mem(corpus).collect().map(_.toSeq).toSet
      val b = loaded(corpus).collect().map(_.toSeq).toSet
      assert(a == b && a.nonEmpty)
    } finally { mem.close(); loaded.close() }
  }
}
