package graft.ops

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {

  test("joinAsOf: inclusive match, tie-break, and left-outer nulls") {
    import spark.implicits._
    val left = Seq(
      ("u", 5L, 100L),   // after right@5 (inclusive) -> picks it
      ("u", 4L, 101L),   // before any right -> nulls
      ("u", 20L, 102L),  // picks newest right <= 20 (ts 10, max id on tie)
      ("v", 50L, 103L))  // other key, no right rows -> nulls
      .toDF("k", "ts", "lid")
    val right = Seq(
      ("u", 5L, 1L, 500.0),
      ("u", 10L, 2L, 600.0),
      ("u", 10L, 3L, 700.0), // duplicate ts: greatest rid wins
      ("u", 30L, 4L, 800.0))
      .toDF("k", "ts2", "rid", "price")
    val got = TemporalJoins.joinAsOf(
      left, "k", "ts", "lid", right, "k", "ts2", "rid",
      valueCols = Seq("rid", "price"))
      .orderBy("lid")
      .collect()
      .map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq === Seq(
      (100L, Some(1L), Some(500.0)),
      (101L, None, None),
      (102L, Some(3L), Some(700.0)),
      (103L, None, None)))
  }

  test("joinRange: window edges are [t, t+W) and keys do not mix") {
    import spark.implicits._
    val left = Seq(("u", 100L, 1L), ("v", 100L, 2L)).toDF("k", "ts", "lid")
    val right = Seq(
      ("u", 99L),   // before -> excluded
      ("u", 100L),  // at start -> included
      ("u", 149L),  // inside -> included
      ("u", 150L),  // at end (exclusive) -> excluded
      ("v", 120L))  // other key
      .toDF("rk", "rts")
    val got = TemporalJoins.joinRange(left, "k", "ts", right, "rk", "rts", windowMs = 50L)
      .groupBy("lid").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L))
  }

  test("joinRange matches a brute-force theta join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(300)((if (rnd.nextBoolean()) "a" else "b", rnd.nextLong(1000), rnd.nextLong(1000000)))
    val df = rows.toDF("k", "ts", "id")
    val r2 = df.select($"k".as("rk"), $"ts".as("rts"))
    val bucketed = TemporalJoins.joinRange(df, "k", "ts", r2, "rk", "rts", windowMs = 77L)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = rows.map { case (k, t, id) =>
      id -> rows.count { case (k2, t2, _) => k2 == k && t2 >= t && t2 < t + 77L }.toLong
    }.toMap
    assert(bucketed === brute)
  }

  test("joinAsOf matches a brute-force scan on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val lefts = (0 until 120).map(i => (if (rnd.nextBoolean()) "a" else "b", rnd.nextLong(200), i.toLong))
    val rights = (0 until 60).map(i => (if (rnd.nextBoolean()) "a" else "b", rnd.nextLong(200), i.toLong, rnd.nextDouble()))
    val got = TemporalJoins.joinAsOf(
      lefts.toDF("k", "ts", "lid"), "k", "ts", "lid",
      rights.toDF("k", "ts2", "rid", "v"), "k", "ts2", "rid",
      valueCols = Seq("rid", "v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val brute = lefts.map { case (k, t, lid) =>
      val cands = rights.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2, r._3))._3)) // newest ts, greatest rid
    }.toMap
    assert(got === brute)
  }
}
