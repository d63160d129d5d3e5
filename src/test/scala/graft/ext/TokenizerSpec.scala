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
}
