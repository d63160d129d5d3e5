package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, sum, when}

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: (Long, String)*) =
    TextAnalysis.repetitionStats(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("duplicate lines count occurrences after the first, with their chars") {
    val m = stats(
      1L -> "alpha beta\ngamma\nalpha beta\n  \nalpha beta\ndelta",
      2L -> "one\ntwo\nthree")
    val r1 = m(1L)
    assert(r1.getAs[Long]("n_lines") == 5L)       // blank line dropped
    assert(r1.getAs[Long]("dup_line_cnt") == 2L)  // 2 extra "alpha beta"
    assert(r1.getAs[Long]("dup_line_chars") == 20L) // 2 × 10 chars
    assert(r1.getAs[Long]("dup_line_ppm") == 400000L)
    val r2 = m(2L)
    assert(r2.getAs[Long]("dup_line_cnt") == 0L)
    assert(r2.getAs[Long]("dup_line_chars") == 0L)
  }

  test("top bigram multiplicity and duplicate trigrams match brute force") {
    // "a b a b a b" → bigrams: [a b, b a, a b, b a, a b] → top "a b" ×3
    //               → trigrams: [a b a, b a b, a b a, b a b] → 2 dup
    val m = stats(1L -> "a b a b a b")
    val r = m(1L)
    assert(r.getAs[Long]("n_bigrams") == 5L)
    assert(r.getAs[Long]("top_bigram_cnt") == 3L)
    assert(r.getAs[Long]("top_bigram_ppm") == 600000L)
    assert(r.getAs[Long]("n_trigrams") == 4L)
    assert(r.getAs[Long]("dup_trigram_cnt") == 2L)
    assert(r.getAs[Long]("dup_trigram_ppm") == 500000L)
  }

  test("degenerate docs are total: one token, unique text, blank filtered") {
    val m = stats(1L -> "solo", 2L -> "all tokens fully distinct here",
      3L -> "   ")
    assert(!m.contains(3L))
    val r1 = m(1L)
    assert(r1.getAs[Long]("n_bigrams") == 0L)
    assert(r1.getAs[Long]("top_bigram_cnt") == 0L)
    assert(r1.getAs[Long]("top_bigram_ppm") == 0L)
    assert(r1.getAs[Long]("n_trigrams") == 0L)
    val r2 = m(2L)
    assert(r2.getAs[Long]("top_bigram_cnt") == 1L) // all distinct → max 1
    assert(r2.getAs[Long]("dup_trigram_cnt") == 0L)
  }

  test("one map-only projection: no shuffle in the plan") {
    val df = TextAnalysis.repetitionStats(
      Seq((1L, "a b c")).toDF("doc_id", "text"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"x137 shuffles:\n$p")
  }

  private def verdicts(rows: (Long, String)*) =
    TextAnalysis.filterVerdicts(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("reasons"), r.getAs[Boolean]("keep"))).toMap

  test("every filter rule fires on its crafted doc and only there") {
    val m = verdicts(
      1L -> "the quick brown fox jumps over the lazy dog today", // clean
      2L -> "the of cats here",                                  // too_short
      3L -> ("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa the " +
             "bbbbbbbbbbbbbbbbbbbbbbbbbb of xxxxxxxxxxxxxxxxxxxx"), // word_length
      4L -> "the cat !!! ### $$$ %%% ^^^ &&& *** (((",           // symbol_heavy
      5L -> "quick brown fox jumps high fast",                   // no_stopword
      6L -> Seq.fill(20)("the cat").mkString(" "),               // rep bigram+trigram
      7L -> Seq.fill(7)("the vv ww xx yy zz").mkString(" "))     // rep trigram only
    assert(m(1L) == (0L, true))
    assert(m(2L) == (1L, false))
    assert(m(3L) == (4L, false))
    assert(m(4L) == (8L, false))
    assert(m(5L) == (16L, false))
    assert(m(6L) == (96L, false)) // 32 + 64: stuck loop trips both
    assert(m(7L) == (64L, false))
  }

  test("repetition rules are exempt below the 10-n-gram sample floor") {
    // 3 tokens → 2 bigrams, 1 trigram: top bigram is trivially 50% but the
    // sample floor keeps the repetition bits silent
    val m = verdicts(1L -> "the cat cat sat on")
    assert(m(1L) == (0L, true))
  }

  test("passthrough columns ride the verdict projection for rollups") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the dog", "web"),
      (2L, "no stopwords here whatsoever friends", "web"),
      (3L, "the tiny", "books")).toDF("doc_id", "text", "source")
    val v = TextAnalysis.filterVerdicts(df, passthrough = Seq("source"))
    assert(v.columns.toSeq ==
      Seq("doc_id", "source", "n_tokens", "reasons", "keep"))
    val bySrc = v.groupBy("source")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("web" -> 1L, "books" -> 0L))
    // still map-only with passthrough
    val p = v.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"passthrough added a shuffle:\n$p")
  }

  test("filter verdict plan is map-only: no shuffle") {
    val df = TextAnalysis.filterVerdicts(
      Seq((1L, "the cat sat")).toDF("doc_id", "text"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"x140 shuffles:\n$p")
  }

  test("streaming parity: the same projection applies to a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.repetitionStats(
        in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("x137_stream")
      .outputMode("append").start()
    try {
      in.addData(1L -> "a b a b a b", 2L -> "x\nx\ny")
      q.processAllAvailable()
      val batch = stats(1L -> "a b a b a b", 2L -> "x\nx\ny")
      val got = spark.table("x137_stream").collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(got.keySet == batch.keySet)
      got.foreach { case (k, r) =>
        assert(r.toSeq == batch(k).toSeq, s"doc $k stream/batch drift")
      }
    } finally q.stop()
  }
}
