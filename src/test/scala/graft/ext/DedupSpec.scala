package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exactDedup keeps the minimum id per distinct content") {
    val d = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val got = Dedup.exactDedup(d, "text", "doc_id")
      .orderBy("keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L), (3L, 1L)))
  }

  test("ngramJaccardPairs: identical docs give jacc 1.0, disjoint give no pair") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely here now today"))
    val got = Dedup.ngramJaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, 2L, 1.0)))
  }

  test("minHashLshPairs finds every pair the exact shingle join finds (recall 1 on near-dups)") {
    // near-duplicates: one word changed out of 12 => high shingle jaccard
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val d = docs(
      (1L, base),
      (2L, base.replace("w7", "zz")),
      (3L, base),
      (4L, "unrelated totally other content with many different words"))
    val exact = Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(d, "text", "doc_id", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh === exact)
  }

  test("minhash jaccard values equal the exact computation on candidates") {
    val base = "a b c d e f g h i j k l m n o p"
    val d = docs((1L, base), (2L, base + " q"), (3L, base))
    val exact = Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Dedup.minHashLshPairs(d, "text", "doc_id", 3, 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(lsh === exact)
  }

  test("simHash: identical docs collide; near-identical docs are hamming-close") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = docs(
      (1L, base),
      (2L, base),
      (3L, base.replace("tok15", "changed")),
      (4L, (100 to 130).map(i => s"other$i").mkString(" ")))
    val sigs = Dedup.simHash(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(1L) === sigs(2L))
    assert(hamming(sigs(1L), sigs(3L)) <= 12, s"near-dup hamming ${hamming(sigs(1L), sigs(3L))}")
    assert(hamming(sigs(1L), sigs(4L)) > 12, s"unrelated hamming ${hamming(sigs(1L), sigs(4L))}")
  }

  test("shingleArray guards docs shorter than n tokens") {
    import spark.implicits._
    val got = docs((1L, "only two"), (2L, "one"), (3L, ""))
      .select(Dedup.shingleArray(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(got.forall(_.isEmpty))
  }
}
