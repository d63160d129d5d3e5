package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the in-engine text models: the Naive-Bayes quality scorer (x96 /
  * [[TextAnalysis.nbScorer]]), the duplicated-block scrub (x97), the
  * deterministic weighted sample (x98), and the count-min heavy hitters
  * (x99/x99b / [[TextAnalysis.cmsHeavyHitters]]). The synthetic corpus
  * draws every source from one vocabulary, so the class-separation and
  * scrub semantics that the catalog rows cannot demonstrate are pinned
  * here on crafted data.
  */
class TextModelSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- nbScorer --------------------------------------------------------

  test("language profiles are pluggable: swapped set changes predictions, default intact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog is happy"),
      (2L, "de kat en de hond zijn blij en tevreden"),
      (3L, "le chat et les chiens des villes"))
      .toDF("doc_id", "text")
    def guesses(p: Seq[(String, Seq[String])]) =
      docs.select(col("doc_id"), TextAnalysis.langGuess(col("text"), p).as("g"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // default 4-profile set: doc 2's Dutch has no profile — it lands on
    // whatever stopwords collide; the swapped set must FIX that without
    // any plan change
    val default = guesses(TextAnalysis.langProfiles)
    assert(default(1L) === "en" && default(3L) === "fr")
    val withNl = (TextAnalysis.langProfiles ++
      Seq("nl" -> Seq("de", "het", "een", "en", "zijn"))).sortBy(_._1)
    val swapped = guesses(withNl)
    assert(swapped(2L) === "nl", s"nl profile must win on Dutch: $swapped")
    assert(swapped(1L) === "en" && swapped(3L) === "fr",
      "existing predictions must not drift when a profile is added")
    // langScores exposes one column per profile, in profile order
    assert(TextAnalysis.langScores(col("text"), withNl).map(_._1) ===
      withNl.map(_._1))
    // malformed profile sets refuse loudly
    intercept[IllegalArgumentException](
      TextAnalysis.langGuess(col("text"), Nil))
    intercept[IllegalArgumentException](
      TextAnalysis.langGuess(col("text"),
        Seq("en" -> Seq("the"), "en" -> Seq("a"))))
    intercept[IllegalArgumentException](
      TextAnalysis.langGuess(col("text"), Seq("xx" -> Nil)))
  }

  test("nbScorer separates classes with distinct vocabularies") {
    val ref = docs(1L -> "cat feline purr whiskers", 2L -> "feline cat purr",
      3L -> "purr whiskers feline cat")
    val crawl = docs(10L -> "dog canine bark growl", 11L -> "canine dog bark",
      12L -> "bark growl canine dog", 13L -> "dog bark")
    val score = TextAnalysis.nbScorer(ref, crawl)
    try {
      // held-out docs from each side classify correctly despite the
      // crawl-leaning prior (3 vs 4 docs)
      val got = score(docs(100L -> "cat purr feline", 101L -> "dog bark canine"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      assert(got(100L) === true)
      assert(got(101L) === false)
      // OOV-only doc rides the class-size correction + prior, not a crash
      val oov = score(docs(200L -> "zebra quagga")).collect()
      assert(oov.length === 1 && oov(0).getLong(1) === 2L)
    } finally score.close()
  }

  test("nbScorer corpus-self scoring reproduces the batch x96 rows") {
    val d = "/root/testdata/sf0.001"
    val all = graft.Tables.documents(spark, d)
    val expected = graft.SparkEntry.queries("x96_nb_quality_score")(spark, d)
      .select("doc_id", "llr_micro", "score_micro", "pred_ref")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sorted.toSeq
    assert(expected.nonEmpty)
    val score = TextAnalysis.nbScorer(
      all.filter(col("source") === "src0"), all.filter(col("source") =!= "src0"))
    try {
      val got = score(all)
        .select("doc_id", "llr_micro", "score_micro", "pred_ref")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .sorted.toSeq
      assert(got === expected)
    } finally score.close()
  }

  test("nbScorer with an empty class yields an empty, schema-complete scorer") {
    val score = TextAnalysis.nbScorer(docs(), docs(1L -> "dog bark"))
    try {
      val out = score(docs(5L -> "anything at all"))
      assert(out.columns.toSeq ===
        Seq("doc_id", "n_tok", "llr_micro", "score_micro", "pred_ref"))
      assert(out.count() === 0L)
    } finally score.close()
  }

  // ---- x97 block scrub -------------------------------------------------

  test("x97 semantics: shared 16-token blocks drop, unique text survives") {
    import spark.implicits._
    val block = (1 to 16).map(i => s"w$i").mkString(" ") // one full block
    val rows = Seq(
      (0L, block + " unique tail one", "en", "srcA", 1L),
      (1L, block + " other tail words", "en", "srcB", 1L),
      (2L, "completely unshared text here", "en", "srcC", 1L),
      (3L, block, "en", "srcD", 1L), // every block boilerplate -> empty
      (4L, "", "en", "srcE", 1L)) // blank -> 0 blocks, total output
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // the catalog fn reads from a dir: round-trip the crafted frame
    val dir = java.nio.file.Files.createTempDirectory("x97spec").toString
    try {
      rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = graft.SparkEntry.queries("x97_block_scrub")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(out.length === 5)
      val byId = out.map(t => t._1 -> t).toMap
      // docs 0/1 share the leading block: it drops, tails survive
      assert(byId(0L)._4 === "unique tail one")
      assert(byId(1L)._4 === "other tail words")
      assert(byId(0L)._2 === 2L && byId(0L)._3 === 1L)
      // unshared doc unchanged
      assert(byId(2L)._4 === "completely unshared text here")
      // all-boilerplate doc comes back empty, not missing
      assert(byId(3L)._2 === 1L && byId(3L)._3 === 0L && byId(3L)._4 === "")
      // blank doc: zero blocks, present
      assert(byId(4L)._2 === 0L && byId(4L)._4 === "")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("blockScrubber scrubs against the FROZEN corpus block set") {
    val block = (1 to 16).map(i => s"b$i").mkString(" ")
    val corpus = docs(1L -> (block + " alpha beta"), 2L -> (block + " gamma"))
    val scrub = TextAnalysis.blockScrubber(corpus)
    try {
      // corpus boilerplate drops from a NEW doc; its unique tail survives
      val out = scrub(docs(10L -> (block + " fresh words here")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(out.toSeq === Seq((10L, 2L, 1L, "fresh words here")))
      // a block repeated only WITHIN the batch is not frozen boilerplate
      val novel = (1 to 16).map(i => s"n$i").mkString(" ")
      val out2 = scrub(docs(20L -> novel, 21L -> novel))
        .collect().map(r => (r.getLong(0), r.getString(3))).toMap
      assert(out2(20L) === novel && out2(21L) === novel)
      // blank docs stay total
      val out3 = scrub(docs(30L -> " ")).collect()
      assert(out3.length === 1 && out3(0).getLong(1) === 0L)
    } finally scrub.close()
  }

  test("blockScrubber corpus-self scrubbing reproduces the batch x97 rows") {
    val d = "/root/testdata/sf0.001"
    val all = graft.Tables.documents(spark, d)
    val expected = graft.SparkEntry.queries("x97_block_scrub")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    assert(expected.nonEmpty)
    val scrub = TextAnalysis.blockScrubber(all)
    try {
      val got = scrub(all)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sorted.toSeq
      assert(got === expected)
    } finally scrub.close()
  }

  // ---- x106 intra-doc scrub --------------------------------------------

  test("intraDocScrub keeps first occurrences in order, per doc only") {
    val byId = TextAnalysis.intraDocScrub(docs(
      // "a b" repeats 3x inside the doc; survivors rejoin in order
      1L -> "a b c d a b e f a b",
      // same content in ANOTHER doc is untouched (no corpus state)
      2L -> "a b c d",
      // doc shorter than one block passes through whole
      3L -> "solo",
      // blank doc is out of domain
      4L -> "  "), blockTokens = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(byId(1L) === ((5L, 3L, "a b c d e f")))
    assert(byId(2L) === ((2L, 2L, "a b c d")))
    assert(byId(3L) === ((1L, 1L, "solo")))
    assert(!byId.contains(4L))
    // the partial TAIL block dedups by its own (short) content, not padding
    val tail = TextAnalysis.intraDocScrub(docs(10L -> "x y z x"), blockTokens = 3)
      .collect()(0)
    assert(tail.getLong(1) === 2L && tail.getLong(2) === 2L &&
      tail.getString(3) === "x y z x")
  }

  test("intraDocScrub is identity when no block repeats, at any block size") {
    val d = "/root/testdata/sf0.001"
    val base = graft.Tables.documents(spark, d)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), concat_ws(" ",
        split(trim(col("text")), "\\s+")).as("norm"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // sf0.001 has no repeated 8-token blocks: scrub at the production
    // default must be the identity rewrite
    val out = TextAnalysis.intraDocScrub(
      graft.Tables.documents(spark, d), blockTokens = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
    assert(out.nonEmpty && out.length === base.size)
    out.foreach { case (id, (nb, nk, txt)) =>
      assert(nb === nk, s"doc $id dropped a block at size 8")
      assert(txt === base(id), s"doc $id text changed")
    }
  }

  // ---- x108 deflate compressibility ------------------------------------

  test("deflateLen orders repetitive < natural < incompressible and is stable") {
    import spark.implicits._
    val rep = ("spam " * 200).trim                 // templated stutter
    val nat = (1 to 200).map(i => s"w${i % 37} t${(i * 7) % 53}").mkString(" ")
    val rnd = {                                    // mojibake stand-in:
      val r = new scala.util.Random(42)            // deterministic pseudo-
      (1 to 1000).map(_ => r.nextPrintableChar()).mkString  // random bytes
    }
    val out = Seq((1L, rep), (2L, nat), (3L, rnd)).toDF("doc_id", "text")
      .select(col("doc_id"), octet_length(col("text")).as("nb"),
        TextAnalysis.deflateLen(col("text")).as("dl"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    def ppm(t: (Int, Int)) = t._2 * 1000000L / t._1
    assert(ppm(out(1L)) < ppm(out(2L)), "repetition must compress best")
    assert(ppm(out(2L)) < ppm(out(3L)), "natural must beat random chars")
    assert(out.values.forall { case (nb, dl) => dl > 0 && dl <= nb + 64 })
    // same input → same bytes (ThreadLocal reuse must not leak state)
    val again = Seq((1L, rep), (2L, nat), (3L, rnd)).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.deflateLen(col("text")).as("dl"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(again === out.map { case (k, (_, dl)) => k -> dl })
    // null stays null
    val n = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(TextAnalysis.deflateLen(col("text"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("intraDocScrub is idempotent on random repetitive docs") {
    // kept blocks (except a final partial) are all exactly B tokens, so
    // re-splitting the rejoined text reproduces the kept block sequence —
    // scrubbing a scrubbed doc must be the identity. A tiny alphabet
    // forces heavy block collisions.
    val rnd = new scala.util.Random(7)
    val fixtures = (1 to 40).map { i =>
      i.toLong -> (1 to (1 + rnd.nextInt(40)))
        .map(_ => s"t${rnd.nextInt(4)}").mkString(" ")
    }
    for (b <- Seq(1, 2, 3, 5)) {
      val once = TextAnalysis.intraDocScrub(docs(fixtures: _*), blockTokens = b)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      if (b <= 3) // at B=5 a 4-letter alphabet rarely repeats a block
        assert(once.values.exists { case (nb, nk, _) => nk < nb },
          s"B=$b fixture never exercised a drop")
      val again = TextAnalysis.intraDocScrub(
        docs(once.toSeq.map { case (id, (_, _, t)) => id -> t }: _*),
        blockTokens = b)
        .collect().map(r => (r.getLong(0), (r.getLong(2), r.getString(3)))).toMap
      once.foreach { case (id, (_, nk, t)) =>
        assert(again(id) === ((nk, t)), s"B=$b doc $id not idempotent")
      }
    }
  }

  // ---- round-9 totality ------------------------------------------------

  test("intraDocScrub, corpusDigest, and cmsMonitor stay total on empty input") {
    import spark.implicits._
    val empty = docs().filter(col("doc_id") > 0)
    assert(TextAnalysis.intraDocScrub(empty).count() === 0L)
    val dig = Export.corpusDigest(
      Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text"))
    assert(dig.count() === 0L &&
      dig.columns.toSeq === Seq("source", "n_docs", "xor_digest", "sum_digest"))
    val mon = TextAnalysis.cmsMonitor()
    mon.ingest(empty)                      // empty batch: no-op, no crash
    assert(mon.totalCount === 0L && mon.estimate("anything") === 0L)
  }

  // ---- x98 weighted sample ---------------------------------------------

  test("x98 is deterministic and ranks by the A-ES key") {
    val d = "/root/testdata/sf0.001"
    val run1 = graft.SparkEntry.queries("x98_weighted_sample")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val run2 = graft.SparkEntry.queries("x98_weighted_sample")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run1 === run2) // content-hash uniforms: no run-to-run jitter
    assert(run1.length === 50)
    assert(run1.map(_._1) === (1L to 50L)) // dense ranks
    assert(run1.map(_._2).distinct.length === 50) // without replacement
    // keys are non-increasing in rank order (ties broken by doc_id)
    assert(run1.map(_._4).sliding(2).forall(p => p.head >= p.last))
  }

  test("A-ES key is monotone in the weight for a fixed uniform") {
    import spark.implicits._
    // same text -> same md5-derived uniform; only the weight differs
    val frame = Seq((1L, "same text", 10L), (2L, "same text", 1000L))
      .toDF("doc_id", "text", "wt")
      .select(col("doc_id"),
        expr("""CAST(CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT)
                AS DOUBLE)""").as("v"), col("wt"))
      .select(col("doc_id"),
        expr("CAST(round(ln((v + 1) / 4294967297.0) / wt * 1e9) AS BIGINT)")
          .as("key_nano"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // higher weight -> key closer to 0 -> ranked earlier
    assert(frame(2L) > frame(1L))
  }

  // ---- cmsHeavyHitters -------------------------------------------------

  test("cmsHeavyHitters matches exact counts on a small corpus") {
    val d = docs(1L -> "a a a b b c", 2L -> "a b c c d", 3L -> "a e")
    val out = TextAnalysis.cmsHeavyHitters(d, k = 10)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._2).toSeq === Seq("a", "b", "c", "d", "e"))
    assert(out.map(_._3).toSeq === Seq(5L, 3L, 3L, 1L, 1L))
    // at this scale the sketch is far wider than the vocab: est == exact
    assert(out.forall(t => t._4 === t._3))
    // slack = ceil(eps * totalCount) = ceil(1e-4 * 12) = 1, on every row
    assert(out.forall(t => t._5 === 1L))
  }

  test("cmsHeavyHitters on an empty corpus is empty and schema-complete") {
    val out = TextAnalysis.cmsHeavyHitters(docs(1L -> "   "))
    assert(out.columns.toSeq === Seq("rnk", "tok", "exact_cnt", "est_cnt", "slack"))
    assert(out.count() === 0L)
  }

  test("sourceUnigramKl: identical distributions score 0, drift scores > 0") {
    import spark.implicits._
    val corpus = Seq(
      ("s0", "x y"), ("s0", "y x"),          // P(x)=P(y)=1/2
      ("s1", "x y x y"),                      // same distribution
      ("s2", "z z z y")                       // drifted: z-heavy
    ).toDF("source", "text").withColumn("doc_id", lit(0L))
    val got = TextAnalysis.sourceUnigramKl(corpus).orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bySrc = got.map(t => t._1 -> t).toMap
    // s0 and s1 both have corpus-marginal... not exactly: the corpus
    // includes s2's z mass, so even x/y sources drift a little — but s0
    // and s1 share one distribution, hence one KL value
    assert(bySrc("s0")._4 === bySrc("s1")._4)
    assert(bySrc("s2")._4 > bySrc("s0")._4)
    assert(got.forall(_._4 >= 0L))
    assert(bySrc("s0")._2 === 4L && bySrc("s0")._3 === 2L) // n_tokens, vocab
  }

  test("sourceUnigramKl matches the hand formula in tenth-micro-nats") {
    import spark.implicits._
    // A: a=2 b=1 (N=3);  B: a=1 b=3 (N=4);  corpus: a=3 b=4 (N=7)
    val corpus = Seq(("A", "a a b"), ("B", "a b b b"))
      .toDF("source", "text")
    def lt(cst: Long, ns: Long, ct: Long): Long =
      math.floor(math.log(cst.toDouble * 7.0 / (ns.toDouble * ct.toDouble)) * 1e7 + 0.5).toLong
    val expA = math.max(0L, 2L * lt(2, 3, 3) + 1L * lt(1, 3, 4)) / 3L
    val expB = math.max(0L, 1L * lt(1, 4, 3) + 3L * lt(3, 4, 4)) / 4L
    val got = TextAnalysis.sourceUnigramKl(corpus).orderBy("source")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("A" -> expA, "B" -> expB))
  }

  test("blocklistScreen counts whole-word hits for word AND symbol-edged terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "learn c++ today and pay $x now"), // both symbol terms, word-adjacent
      (2L, "the c++11 standard and tax law"), // c++ inside a longer token: no hit
      (3L, "plain bad words bad again"),      // word term, twice
      (4L, "notbad embedded badly"))          // substrings must not match
      .toDF("doc_id", "text")
    // "BAD" uppercase in the list: matching is case-insensitive both ways
    val got = TextAnalysis.blocklistScreen(docs,
        Seq("sym" -> Seq("c++", "$x"), "word" -> Seq("BAD")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (1L, 2L, 0L, true),  // c++ and $x both hit as whole terms
      (2L, 0L, 0L, false), // \b would have matched inside c++11; lookarounds don't
      (3L, 0L, 2L, true),
      (4L, 0L, 0L, false)))
  }
}
