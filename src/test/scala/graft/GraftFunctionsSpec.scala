package graft

import org.apache.spark.sql.graft.FunctionRegistration

class GraftFunctionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL after registration") {
    FunctionRegistration.registerGraftFunctions(spark)
    val got = spark.sql(
      """SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |                 array(cast(3.0 as float), cast(4.0 as float))) AS d""".stripMargin)
      .head().getDouble(0)
    assert(got === 11.0)
  }

  test("graft_dot mixes float and double arrays") {
    FunctionRegistration.registerGraftFunctions(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(cast(2.0 as float)), array(cast(5.0 as double))) AS d")
      .head().getDouble(0)
    assert(got === 10.0)
  }

  test("all graft functions are callable from SQL after registration") {
    FunctionRegistration.registerGraftFunctions(spark)
    val row = spark.sql(
      """SELECT size(graft_shingle_hash(array('a','b','c','d'), 2)) AS nsh,
        |       size(graft_minhash_bands(graft_shingle_hash(array('a','b','c','d'), 2), 64, 32)) AS nb,
        |       graft_simhash(array('x','y')) AS sh,
        |       size(graft_token_window_hash(array('a','b','c','d'), 2)) AS nw""".stripMargin).head()
    assert(row.getInt(0) === 3)
    assert(row.getInt(1) === 32)
    assert(row.getInt(3) === 3)
    // simhash of a token list equals the Dedup operator's output
    import spark.implicits._
    val viaOp = graft.ext.Dedup.simHash(Seq((1L, "x y")).toDF("doc_id", "text"),
      "text", "doc_id").head().getLong(1)
    assert(row.getLong(2) === viaOp)
    // deflate length from SQL equals the Column-API expression
    val s = "spam spam spam spam spam"
    val viaSql = spark.sql(s"SELECT graft_deflate_len('$s')").head().getInt(0)
    val viaCol = Seq(Tuple1(s)).toDF("text")
      .select(graft.ext.TextAnalysis.deflateLen(org.apache.spark.sql.functions.col("text")))
      .head().getInt(0)
    assert(viaSql === viaCol && viaSql > 0)
  }

  test("simHash blank/null contract: blank text → 0L, null text → null") {
    // Pins the documented degenerate-doc contract so the rows-only x09
    // catalog output is intentional: a whitespace-only doc has an EMPTY
    // token stream (zero bit-votes → signature 0), and a null doc carries
    // no signal at all (null propagates, row retained for the caller to
    // filter or keep).
    import spark.implicits._
    val d = Seq((1L, "   "), (2L, ""), (3L, null: String), (4L, "x y"))
      .toDF("doc_id", "text")
    val got = graft.ext.Dedup.simHash(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L) === Some(0L))
    assert(got(2L) === Some(0L))
    assert(got(3L) === None)
    assert(got(4L).exists(_ !== 0L))
    assert(got.size === 4) // every input doc emits exactly one row
  }

  test("shingleHashF: sorted distinct hashes; token boundaries matter; short docs empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions.split
    import org.apache.spark.sql.graft.VectorFunctions.shingleHashF
    def hashes(text: String, n: Int): Seq[Long] =
      Seq(text).toDF("t").select(shingleHashF(split($"t", " "), n).as("h"))
        .head().getSeq[Long](0)
    // "a b c d" has 2-grams {a b, b c, c d}; repeated windows dedupe
    assert(hashes("a b c d", 2).length === 3)
    assert(hashes("a b a b a b", 2).length === 2) // {a b, b a}
    val h = hashes("a b c", 2)
    assert(h === h.sorted)
    assert(hashes("a", 2).isEmpty)
    // boundary-sensitivity: ("ab","c") vs ("a","bc") share no window hash
    assert(hashes("ab c", 2).toSet.intersect(hashes("a bc", 2).toSet).isEmpty)
    // determinism across rows/plans
    assert(hashes("x y z", 2) === hashes("x y z", 2))
  }

  test("tokenWindowHashF: positional, boundary-sensitive, shingleHash-consistent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.split
    import org.apache.spark.sql.graft.VectorFunctions.{shingleHashF, tokenWindowHashF}
    def hashes(text: String, w: Int): Seq[Long] =
      Seq(text).toDF("t").select(tokenWindowHashF(split($"t", " "), w).as("h"))
        .head().getSeq[Long](0)
    // one hash per window START; position is the index — no sort, no dedup
    assert(hashes("a b c d", 2).length === 3)
    assert(hashes("a b a b", 2).length === 3) // repeated window KEEPS both slots
    val rep = hashes("a b a b", 2)
    assert(rep(0) === rep(2) && rep(0) != rep(1)) // "a b" at 0 and 2, "b a" at 1
    // equal token sequences hash equal across docs and offsets
    assert(hashes("x s1 s2 s3", 3)(1) === hashes("s1 s2 s3 y", 3)(0))
    // boundary-sensitivity: ("ab","c") vs ("a","bc") differ
    assert(hashes("ab c", 2)(0) != hashes("a bc", 2)(0))
    // short/blank: fewer than w tokens → empty
    assert(hashes("a", 2).isEmpty)
    // same window loop as shingleHashF: the sorted distinct positional
    // hashes ARE the shingle set (one definition, two access patterns)
    val pos = hashes("a b c d e", 2)
    val sh = Seq("a b c d e").toDF("t")
      .select(shingleHashF(split($"t", " "), 2).as("h")).head().getSeq[Long](0)
    assert(pos.distinct.sorted === sh)
  }

  test("minHashBandsF: band count, determinism, identical sets collide, empty set empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions.split
    import org.apache.spark.sql.graft.VectorFunctions.{minHashBandsF, shingleHashF}
    def bandsOf(text: String): Seq[Long] =
      Seq(text).toDF("t")
        .select(minHashBandsF(shingleHashF(split($"t", " "), 3), 64, 32).as("b"))
        .head().getSeq[Long](0)
    val a = bandsOf("w1 w2 w3 w4 w5 w6")
    assert(a.length === 32)
    assert(a === bandsOf("w1 w2 w3 w4 w5 w6"))
    // a near-identical doc shares most bands, a disjoint doc none
    val near = bandsOf("w1 w2 w3 w4 w5 zz")
    assert(a.zip(near).count { case (x, y) => x == y } >= 8)
    val far = bandsOf("q1 q2 q3 q4 q5 q6")
    assert(a.zip(far).forall { case (x, y) => x != y })
    assert(bandsOf("a b").isEmpty) // < n tokens => no shingles => no bands
  }
}
