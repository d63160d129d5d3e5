package graft.ext

import graft.SparkSpec

/** Fixture cases for URL canonicalization: every rule, its boundaries,
  * and the pass-through contract for non-URL values. */
class UrlSpec extends SparkSpec {

  private def norm(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u")
      .select(TextAnalysis.urlNormalize(org.apache.spark.sql.functions.col("u")))
      .head().getString(0)
  }

  private def host(u: String): Option[String] = {
    import spark.implicits._
    Option(Seq(u).toDF("u")
      .select(TextAnalysis.urlHost(org.apache.spark.sql.functions.col("u")))
      .head().getString(0))
  }

  test("scheme and host lowercase; path and query case kept") {
    assert(norm("HTTPS://WWW.Example.COM/Docs/Item?Q=Aa") ===
      "https://www.example.com/Docs/Item?Q=Aa")
  }

  test("default ports strip; non-default ports stay") {
    assert(norm("http://a.com:80/x") === "http://a.com/x")
    assert(norm("https://a.com:443/x") === "https://a.com/x")
    assert(norm("http://a.com:8080/x") === "http://a.com:8080/x")
    assert(norm("https://a.com:80/x") === "https://a.com:80/x")
  }

  test("userinfo drops") {
    assert(norm("http://user:pw@a.com/x") === "http://a.com/x")
    assert(host("http://user:pw@a.com:8080/x") === Some("a.com"))
  }

  test("fragment drops; trailing slash trims except root") {
    assert(norm("http://a.com/x/#frag") === "http://a.com/x")
    assert(norm("http://a.com/") === "http://a.com/")
    assert(norm("http://a.com/x/?q=1") === "http://a.com/x?q=1")
  }

  test("ALL trailing slashes trim (multi-slash variants collapse)") {
    assert(norm("http://a.com/p//") === "http://a.com/p")
    assert(norm("http://a.com/p///") === "http://a.com/p")
    assert(norm("http://a.com/p//?q=1") === "http://a.com/p?q=1")
    // and the repair is a fixed point: re-normalizing cannot drift
    assert(norm(norm("http://a.com/p//")) === norm("http://a.com/p//"))
  }

  test("utm params die in every position; separators re-tidy") {
    assert(norm("http://a.com/x?utm_source=f&ref=h&utm_medium=r") ===
      "http://a.com/x?ref=h")
    assert(norm("http://a.com/x?utm_a=1&utm_b=2") === "http://a.com/x")
    assert(norm("http://a.com/x?utm_a=1&utm_b=2&c=3") === "http://a.com/x?c=3")
    assert(norm("http://a.com/x?a=1&utm_b=2") === "http://a.com/x?a=1")
  }

  test("utm kill is case-insensitive (UTM_SOURCE / Utm_campaign die)") {
    assert(norm("http://a.com/x?UTM_SOURCE=f&ref=h") === "http://a.com/x?ref=h")
    assert(norm("http://a.com/x?Utm_campaign=y") === "http://a.com/x")
    assert(norm("http://a.com/x?a=1&uTm_b=2") === "http://a.com/x?a=1")
  }

  test("a param merely containing 'utm_' survives (anchored kill)") {
    assert(norm("http://a.com/x?butm_x=1") === "http://a.com/x?butm_x=1")
  }

  test("values without an authority pass through unchanged") {
    assert(norm("not a url") === "not a url")
    assert(norm("mailto:a@b.com") === "mailto:a@b.com")
    assert(host("not a url") === None)
  }

  test("urlNormalize is idempotent and host-stable on 400 generated URLs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // seeded component generators spanning the rule space: schemes,
    // userinfo, case-mixed hosts, default/odd/absent ports, paths with
    // and without trailing slashes, queries with utm in every position,
    // fragments — plus raw non-URL strings
    val rnd = new scala.util.Random(7)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    val urls = (1 to 400).map { i =>
      if (i % 10 == 0) pick(Seq("plain text", "mailto:a@b.c", "", "a/b?c=1"))
      else {
        val scheme = pick(Seq("http", "HTTP", "https", "HTTPS", "ftp"))
        val user = pick(Seq("", "u@", "u:p@"))
        val host = pick(Seq("a.com", "A.Example.COM", "x-y.org"))
        val port = pick(Seq("", ":80", ":443", ":8080"))
        val path = pick(Seq("", "/", "/p", "/p/", "/p//", "/p/q", "/p/q/",
          "/p/q//"))
        val query = pick(Seq("", "?a=1", "?utm_s=1", "?utm_s=1&b=2",
          "?b=2&utm_s=1", "?utm_a=1&utm_b=2", "?butm_x=1&a=2",
          "?UTM_S=1&b=2", "?Utm_a=1"))
        val frag = pick(Seq("", "#f", "#a/b?c"))
        s"$scheme://$user$host$port$path$query$frag"
      }
    }
    val df = urls.toDF("u").select(
      col("u"),
      TextAnalysis.urlNormalize(col("u")).as("n1"),
      TextAnalysis.urlNormalize(TextAnalysis.urlNormalize(col("u"))).as("n2"),
      TextAnalysis.urlHost(col("u")).as("h0"),
      TextAnalysis.urlHost(TextAnalysis.urlNormalize(col("u"))).as("h1"))
    val bad = df.filter(!(col("n1") <=> col("n2")) ||
      !(col("h0") <=> col("h1"))).collect()
    assert(bad.isEmpty, "normalization not a fixed point for:\n" +
      bad.map(_.toString).mkString("\n"))
  }

  test("canonical collisions: case/port/utm/fragment variants collapse") {
    val variants = Seq(
      "HTTP://A.com:80/x?utm_s=1",
      "http://a.COM/x#top",
      "http://a.com/x/")
    assert(variants.map(norm).distinct === Seq("http://a.com/x"))
  }
}
