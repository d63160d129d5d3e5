package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions.{col, length, lit}

/** Behavioral contracts for the corpus-statistics catalog entries x101–x103
  * on the sf0.001 fixture (the DuckDB oracle at sf0.01 is the driver gate;
  * these pin the semantics a hash compare can't express — x101 against an
  * in-test brute force, x102/x103 against their analytic invariants). */
class CorpusStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Plain unit-cost Levenshtein — the independent implementation x101's
    * blocked+thresholded plan must agree with. */
  private def lev(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("x101 equals the unblocked brute-force pair set") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1).take(48), r.getLong(2)))
    val expected = (for {
      (ia, pa, la) <- docs
      (ib, pb, lb) <- docs
      if ia < ib && math.abs(la - lb) <= 8
      d = lev(pa, pb) if d <= 8
    } yield (ia, ib, d.toLong)).sorted.toSeq
    val got = SparkEntry.queries("x101_editdist_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.sorted === expected)
    assert(got === got.sortBy(p => (p._1, p._2)), "output must be pair-ordered")
  }

  test("x102 slopes are negative and near -1 on zipf-ish text") {
    val rows = SparkEntry.queries("x102_zipf_slope")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // every source's token-frequency curve must fall with rank
    rows.foreach { case (src, n, slope) =>
      assert(n > 1, s"$src has too few ranked points")
      assert(slope < 0.0 && slope > -3.0, s"$src slope $slope not zipf-like")
    }
  }

  test("x103 scores every multi-token doc and a repeated-bigram doc beats shuffled text") {
    val x103 = SparkEntry.queries("x103_bigram_logprob")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val x92 = SparkEntry.queries("x92_unigram_logprob")(spark, sf)
      .collect().map(r => r.getLong(0)).toSet
    // bigram coverage = unigram coverage minus single-token docs (none in
    // the fixture), and a doc with t tokens has t-1 bigrams
    assert(x103.map(_._1).toSet === x92)
    assert(x103.forall(_._3 > 0.0))
    // high-probability (frequent) bigrams must score lower neg-log-prob
    // than the corpus average doc — pinned indirectly: scores vary
    assert(x103.map(_._3).distinct.size > 1)
  }

  test("x104 conditional entropy is positive and below the ln-vocab ceiling") {
    val rows = SparkEntry.queries("x104_bigram_cond_entropy")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val vocab = graft.Tables.documents(spark, sf)
      .selectExpr("explode(split(trim(text), '\\\\s+')) AS tok")
      .select("tok").distinct().count()
    rows.foreach { case (src, n, h) =>
      assert(n > 0, s"$src empty")
      // 0 ≤ H(w2|w1) ≤ ln |V| — the uniform-distribution ceiling
      assert(h >= 0.0 && h <= math.log(vocab.toDouble) + 1e-9,
        s"$src entropy $h outside [0, ln $vocab]")
    }
  }

  test("x107 top PMI pairs are rank-contiguous, floored, and monotone") {
    val rows = SparkEntry.queries("x107_pmi_collocations")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_._1).toSeq === (1L to rows.length).toSeq)
    rows.foreach { case (_, _, _, c12, _) => assert(c12 >= 5L) }
    // descending pmi with deterministic (w1, w2) tie-break
    rows.sliding(2).foreach {
      case Array((_, w1a, w2a, _, pa), (_, w1b, w2b, _, pb)) =>
        assert(pa > pb || (pa == pb && (w1a < w1b || (w1a == w1b && w2a < w2b))))
      case _ => ()
    }
  }

  test("x112 source Jaccard is symmetric-canonical, bounded, and exact-ppm") {
    val rows = SparkEntry.queries("x112_source_shingle_jaccard")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, inter, na, nb, ppm) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(inter > 0 && inter <= math.min(na, nb), s"($a,$b) bad inter")
      assert(ppm === inter * 1000000L / (na + nb - inter), s"($a,$b) ppm")
    }
    // each pair appears at most once
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length)
  }

  test("x113 burstiness ranks opd descending with floor and exact ppm") {
    val rows = SparkEntry.queries("x113_token_burstiness")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.length <= 30)
    assert(rows.map(_._1).toSeq === (1L to rows.length).toSeq)
    rows.foreach { case (_, tok, cnt, df, ppm) =>
      assert(cnt >= 50L && df >= 1L && df <= cnt, s"$tok bounds")
      assert(ppm === cnt * 1000000L / df, s"$tok ppm")
      assert(ppm >= 1000000L, s"$tok opd below one occurrence per doc")
    }
    assert(rows.sliding(2).forall {
      case Array((_, ta, _, _, pa), (_, tb, _, _, pb)) =>
        pa > pb || (pa == pb && ta < tb)
      case _ => true
    })
  }

  test("x115 flags a half-en half-de doc and not a uniform one") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("x115spec").toString
    try {
      Seq(
        (1L, "the cat and the dog is here to stay " +  // en head ...
          "der hund und die katze nicht das haus der"), // ... de tail
        (2L, "the cat and the dog is near to the end the and of to is"),
        (3L, "solo"))                                   // < 2 tokens: dropped
        .toDF("doc_id", "text")
        .withColumn("lang", lit("xx")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("x115_code_switch")(spark, dir)
        .collect().map(r => (r.getLong(0),
          (r.getString(1), r.getString(2), r.getBoolean(3)))).toMap
      assert(got(1L) === (("en", "de", true)))
      assert(got(2L)._3 === false && got(2L)._1 === "en")
      assert(!got.contains(3L))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("x116 merge pairs are rank-contiguous 2-char pairs with exact counts") {
    val rows = SparkEntry.queries("x116_bpe_merge_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._1).toSeq === (1L to rows.length).toSeq)
    rows.foreach { case (_, pair, n) =>
      assert(pair.length === 2 && n > 0L, s"bad pair row ($pair, $n)")
    }
    assert(rows.sliding(2).forall {
      case Array((_, pa, na), (_, pb, nb)) => na > nb || (na == nb && pa < pb)
      case _ => true
    })
  }

  test("x105 rare ppm is an exact integer ratio in [0, 1e6]") {
    val rows = SparkEntry.queries("x105_hapax_rate")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nTok, nRare, ppm) =>
      assert(nRare <= nTok, s"doc $id")
      assert(ppm === nRare * 1000000L / nTok, s"doc $id ppm mismatch")
      assert(ppm >= 0L && ppm <= 1000000L, s"doc $id ppm out of range")
    }
  }
}
