package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Fixture cases for the trafilatura-lite HTML extractor: nested tags,
  * entities, script/style/comment removal, the link-density boundary, and
  * degenerate inputs. */
class HtmlSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def extract(html: String, maxLinkPct: Int = 40): (Long, Long, String) = {
    import spark.implicits._
    val df: DataFrame = Seq((1L, html)).toDF("doc_id", "html")
    val r = TextAnalysis.htmlExtract(df, maxLinkPct = maxLinkPct).head()
    (r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("script, style, comments and the whole head are dropped") {
    val (_, _, text) = extract(
      "<html><head><title>T</title><style>p{a:1}</style></head><body>" +
        "<script type=\"text/javascript\">if (a<b) { x(\"</p>\"); }</script>" +
        "<!-- a comment with <p>tags</p> inside -->" +
        "<p>real content here</p>" +
        "<style media=\"print\">div { color: red }</style></body></html>")
    assert(text === "real content here")
  }

  test("nested inline tags strip; block tags split") {
    val (nb, nk, text) = extract(
      "<div><p>alpha <b>bold <i>deep</i></b> end</p><p>beta</p></div>")
    assert((nb, nk) === (2L, 2L))
    assert(text === "alpha bold deep end beta")
  }

  test("entities decode once, single-pass (&amp;lt; stays &lt; as text)") {
    val (_, _, text) = extract(
      "<p>a &lt;tag&gt; &quot;q&quot; it&#39;s &nbsp; b &amp; c &amp;lt; d</p>")
    assert(text === "a <tag> \"q\" it's b & c &lt; d")
  }

  test("unknown entities pass through undecoded") {
    val (_, _, text) = extract("<p>&copy; &hellip; &#8230; x</p>")
    assert(text === "&copy; &hellip; &#8230; x")
  }

  test("link-density: nav dies, paragraph with inline citation survives") {
    val (nb, nk, text) = extract(
      "<nav><a href=\"/\">home</a> <a href=\"/b\">browse</a></nav>" +
        "<p>long enough body text with one <a href=\"/r\">link</a> inside</p>")
    assert((nb, nk) === (2L, 1L))
    assert(text === "long enough body text with one link inside")
  }

  test("link-density boundary is inclusive (alen*100 == pct*vlen keeps)") {
    // visible "aaaa bbbbb" = 10 chars, anchor "aaaa" = 4 chars -> exactly
    // 40% at the default threshold: kept; at 39 it must drop
    val html = "<p><a href=\"/x\">aaaa</a> bbbbb</p>"
    assert(extract(html)._3 === "aaaa bbbbb")
    assert(extract(html, maxLinkPct = 39)._3 === "")
  }

  test("anchor inner markup strips before density counting") {
    // anchor shows "ab" (2 visible chars) despite the nested <b> tags
    val (_, nk, _) = extract(
      "<p><a href=\"/\"><b>a</b>b</a> plus surrounding content text</p>")
    assert(nk === 1L)
  }

  test("blocks of pure whitespace or pure markup do not count") {
    val (nb, nk, text) = extract(
      "<div>  </div><div><img src=\"x.png\"/></div><p>kept</p>")
    assert((nb, nk) === (1L, 1L))
    assert(text === "kept")
  }

  test("plain text without any tags is one kept block") {
    val (nb, nk, text) = extract("no markup at all")
    assert((nb, nk) === (1L, 1L))
    assert(text === "no markup at all")
  }

  test("empty html yields zero blocks and empty text") {
    val (nb, nk, text) = extract("")
    assert((nb, nk) === (0L, 0L))
    assert(text === "")
  }

  test("whitespace normalizes: newlines and runs collapse to single spaces") {
    val (_, _, text) = extract("<p>a\n   b\t\tc</p>")
    assert(text === "a b c")
  }

  test("case-insensitive tags: <P>, <SCRIPT>, <BR/> all recognized") {
    val (nb, _, text) = extract(
      "<SCRIPT>var x;</SCRIPT><P>one</P><DIV>two<BR/>three</DIV>")
    assert(nb === 3L)
    assert(text === "one two three")
  }
}
