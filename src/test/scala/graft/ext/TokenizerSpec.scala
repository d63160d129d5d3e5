package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The pluggable tokenizer seam (`TextAnalysis.tokens(text, mode)`): the
  * whitespace default is the catalog contract and stays byte-identical;
  * the script/codepoint modes are the non-spaced-script escape hatch,
  * pinned here on CJK-shaped text — under the ws contract such text
  * degrades to one-token documents, silently distorting every
  * token-derived signal, which is exactly the behavior documented (and
  * escaped) by these modes. */
class TokenizerSpec extends SparkSpec {

  private def run(mode: String, texts: String*): Seq[Seq[String]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(TextAnalysis.tokens(col("text"), mode).as("t"))
      .collect().toSeq.map(_.getSeq[String](0))
  }

  test("ws mode is the unchanged catalog contract") {
    assert(run("ws", "the quick fox", "  ", "") ===
      Seq(Seq("the", "quick", "fox"), Seq(), Seq()))
    // non-spaced CJK degrades to ONE token under ws — the documented
    // distortion the alternate modes exist to escape
    assert(run("ws", "我爱自然语言") === Seq(Seq("我爱自然语言")))
  }

  test("script mode splits CJK per codepoint, keeps Latin runs whole") {
    assert(run("script", "我爱 natural language 处理") ===
      Seq(Seq("我", "爱", "natural", "language", "处", "理")))
    // pure-Latin text tokenizes exactly like ws mode
    assert(run("script", "hello, world!") === Seq(Seq("hello,", "world!")))
    assert(run("script", "") === Seq(Seq()))
    // Hangul and kana are also per-codepoint (non-spaced scripts)
    assert(run("script", "한국어です") === Seq(Seq("한", "국", "어", "で", "す")))
  }

  test("codepoint mode is the universal fallback, astral-safe") {
    assert(run("codepoint", "ab c") === Seq(Seq("a", "b", "c")))
    // an astral codepoint (U+1F389) is ONE token, not two surrogate halves
    assert(run("codepoint", "a🎉b") ===
      Seq(Seq("a", "🎉", "b")))
    assert(run("codepoint", "") === Seq(Seq()))
  }

  test("tokenCount matches tokens size in every mode; unknown mode refuses") {
    import spark.implicits._
    val df = Seq("我爱 natural 处理", "", "plain words here").toDF("text")
    for (m <- Seq("ws", "script", "codepoint")) {
      val got = df.select(TextAnalysis.tokenCount(col("text"), m).as("n"),
        size(TextAnalysis.tokens(col("text"), m)).as("s")).collect()
      got.foreach(r => assert(r.getInt(0) === r.getInt(1), s"mode $m"))
    }
    intercept[IllegalArgumentException](TextAnalysis.tokens(col("text"), "bpe"))
  }

  test("Bpe.decodeIds inverts the encode stream, independent of row order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the merger emerged here"),
      (2L, "remember the ember"),
      (3L, "x")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", nMerges = 4)
    assert(merges.nonEmpty)
    val symsOf = docs
      .select(col("doc_id"),
        filter(split(Bpe.applyMerges(TextAnalysis.tokens(col("text")),
          merges), " "), x => x =!= "\u00b7\u00a7\u00b7").as("ss"))
    val vocab = symsOf.select(explode(col("ss")).as("sym"))
      .groupBy(col("sym")).agg(count(lit(1)).as("cnt"))
      .withColumn("tok_id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("sym"))).cast("long"))
      .select(col("sym"), col("tok_id"))
    val enc = symsOf
      .select(col("doc_id"), posexplode(col("ss")).as(Seq("pos", "sym")))
      .join(vocab, "sym")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("tok_id"))
    // scramble the stream's row order: decode must re-sort by pos itself
    val scrambled = enc.orderBy(col("tok_id"), col("pos").desc)
    val got = Bpe.decodeIds(scrambled, vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "themergeremergedhere",
      2L -> "remembertheember",
      3L -> "x"))
  }
}
