package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target docs speak "wiki", raw noise speaks "spam" — disjoint vocab so
  // the importance ratio must separate them cleanly
  private val corpus = Seq(
    (1L, "wiki article facts history science", "en"),
    (2L, "wiki science facts article notes", "en"),
    (3L, "wiki history notes science facts", "en"),
    (4L, "spam buy now cheap deal", "xx"),
    (5L, "spam deal cheap buy click", "xx"),
    (6L, "wiki facts spam deal mixed bag", "xx")
  ).toDF("doc_id", "text", "lang")

  test("target-like docs out-score off-target docs") {
    val w = TextAnalysis.dsirWeights(corpus, $"lang" === "en", buckets = 512)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("w_mean"))
      .toMap
    val target = Seq(1L, 2L, 3L).map(w)
    val noise = Seq(4L, 5L).map(w)
    assert(target.min > noise.max,
      s"no separation: target=$target noise=$noise")
    // the mixed doc sits between the pure classes
    assert(w(6L) < target.min && w(6L) > noise.min)
  }

  test("n_feat counts unigrams plus bigrams") {
    val w = TextAnalysis.dsirWeights(corpus, $"lang" === "en")
      .filter($"doc_id" === 1L).collect()(0)
    assert(w.getAs[Long]("n_feat") == 9L) // 5 tokens + 4 bigrams
  }

  test("frozen scorer reproduces the one-shot weights on its own corpus") {
    val scorer = TextAnalysis.dsirScorer(corpus, $"lang" === "en", buckets = 512)
    try {
      val applied = scorer(corpus).orderBy("doc_id").collect()
      val oneShot = TextAnalysis
        .dsirWeights(corpus, $"lang" === "en", buckets = 512)
        .orderBy("doc_id").collect()
      assert(applied.map(_.toSeq).toSeq == oneShot.map(_.toSeq).toSeq)
    } finally scorer.close()
  }

  test("unseen features score the frozen zero-count ratio") {
    val scorer = TextAnalysis.dsirScorer(corpus, $"lang" === "en", buckets = 512)
    try {
      val novel = Seq((9L, "zzqx vvwp qqrr")).toDF("doc_id", "text")
      val r = scorer(novel).collect()(0)
      // all 5 features (3 unigrams + 2 bigrams) unseen → identical q, so
      // the sum is exactly n_feat × w_mean with zero remainder
      assert(r.getAs[Long]("n_feat") == 5L)
      assert(r.getAs[Long]("w_sum") == 5L * r.getAs[Long]("w_mean"))
      // zero-count ratio = ln((tr+B)/(tt+B)) > 0 since tr > tt
      assert(r.getAs[Long]("w_mean") > 0L)
    } finally scorer.close()
  }

  test("the score join broadcasts the bucket table, never the corpus") {
    val df = TextAnalysis.dsirWeights(corpus, $"lang" === "en")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"no broadcast score join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-sized feature stream shuffled for the score join:\n$p")
  }

  test("streaming parity: the frozen scorer applies to a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val scorer = TextAnalysis.dsirScorer(corpus, $"lang" === "en", buckets = 512)
    try {
      val in = MemoryStream[(Long, String)]
      val q = scorer(in.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName("dsir_stream")
        .outputMode("complete").start()
      try {
        val batch = Seq(7L -> "wiki facts spam deal mixed bag",
          8L -> "zzqx vvwp qqrr")
        in.addData(batch: _*)
        q.processAllAvailable()
        val streamed = spark.table("dsir_stream").orderBy("doc_id")
          .collect().map(_.toSeq).toSeq
        val direct = scorer(batch.toDF("doc_id", "text")).orderBy("doc_id")
          .collect().map(_.toSeq).toSeq
        assert(streamed == direct && streamed.size == 2)
      } finally q.stop()
    } finally scorer.close()
  }

  test("empty corpus is total") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(TextAnalysis.dsirWeights(empty, $"lang" === "en").count() == 0L)
    val scorer = TextAnalysis.dsirScorer(empty, $"lang" === "en")
    try assert(scorer(corpus).count() == 0L)
    finally scorer.close()
  }
}
