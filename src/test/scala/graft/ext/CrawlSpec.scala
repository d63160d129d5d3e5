package graft.ext

import graft.SparkSpec

class CrawlSpec extends SparkSpec {

  private def frontier(rows: (String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("host", "url", "prio")
  }

  test("frontierWaves ranks by priority desc with url tiebreak, per host") {
    val f = frontier(
      ("a.com", "https://a.com/1", 10L),
      ("a.com", "https://a.com/2", 30L),
      ("a.com", "https://a.com/3", 20L),
      ("b.com", "https://b.com/x", 5L))
    val got = Chats.sortedRows(Crawl.frontierWaves(f, perHostPerWave = 2))
    assert(got === Seq(
      ("a.com", "https://a.com/2", 30L, 1L, 0L),
      ("a.com", "https://a.com/3", 20L, 2L, 0L),
      ("a.com", "https://a.com/1", 10L, 3L, 1L),
      ("b.com", "https://b.com/x", 5L, 1L, 0L)))
  }

  test("frontierWaves: equal priorities break ties on url (total order)") {
    val f = frontier(
      ("a.com", "https://a.com/b", 7L),
      ("a.com", "https://a.com/a", 7L))
    val got = Chats.sortedRows(Crawl.frontierWaves(f, perHostPerWave = 8))
    assert(got.map(_._2) === Seq("https://a.com/a", "https://a.com/b"))
  }

  test("frontierWaves maxPerHost caps the per-host frontier before waves") {
    val f = frontier((1 to 10).map(i =>
      ("a.com", f"https://a.com/$i%02d", (100 - i).toLong)): _*)
    val got = Crawl.frontierWaves(f, perHostPerWave = 2, maxPerHost = 5)
      .collect()
    assert(got.length === 5)
    assert(got.map(_.getAs[Long]("wave")).max === 2L)
  }

  test("frontierWaves honors non-default column names") {
    import spark.implicits._
    val f = Seq(
      ("a.com", "https://a.com/1", 10L),
      ("a.com", "https://a.com/2", 30L),
      ("b.com", "https://b.com/x", 5L)).toDF("h", "u", "p")
    val got = Chats.sortedRows(Crawl.frontierWaves(f, hostCol = "h",
      urlCol = "u", prioCol = "p", perHostPerWave = 1))
    assert(got === Seq(
      ("a.com", "https://a.com/2", 30L, 1L, 0L),
      ("a.com", "https://a.com/1", 10L, 2L, 1L),
      ("b.com", "https://b.com/x", 5L, 1L, 0L)))
  }

  test("frontierWaves refuses nonpositive knobs and missing columns") {
    val f = frontier(("a.com", "u", 1L))
    intercept[IllegalArgumentException] {
      Crawl.frontierWaves(f, perHostPerWave = 0)
    }
    intercept[IllegalArgumentException] {
      Crawl.frontierWaves(f.drop("prio"))
    }
  }
}

/** Row extraction shared by the frontier cases. */
private object Chats {
  def sortedRows(df: org.apache.spark.sql.DataFrame)
      : Seq[(String, String, Long, Long, Long)] =
    df.orderBy("host", "host_rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
}
