package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val fixture = docs(
    1L -> "a b c d e f g h",          // 8 tokens
    2L -> "one two three",            // 3
    3L -> ("t " * 30).trim,           // 30 — straddles at capacity 8
    4L -> "   ",                      // blank: out of domain
    5L -> "x y z w v u t s r q",      // 10
    6L -> "lone")                     // 1

  test("plan is the seeded order's exclusive prefix sum") {
    val plan = Pack.packPlan(fixture, capacity = 8L, seed = 7L)
    // textbook single-window reference on the same base frame
    val ref = fixture
      .filter(length(trim($"text")) > 0)
      .select($"doc_id", TextAnalysis.wsTokenCount($"text").cast("long").as("n"),
        md5(concat($"doc_id".cast("string"), lit(":7"))).as("okey"))
      .withColumn("cb", coalesce(sum($"n").over(
        Window.orderBy($"okey", $"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"cb").as[(Long, Long)].collect().toMap
    val got = plan.select($"doc_id", $"cum_before").as[(Long, Long)]
      .collect().toMap
    assert(got == ref)
    assert(!got.contains(4L)) // blank doc filtered
    // derived columns are consistent
    val bad = plan.filter(
      $"start_seq" =!= expr("cum_before div 8") ||
      $"start_off" =!= pmod($"cum_before", lit(8L)) ||
      $"end_seq" =!= expr("(cum_before + n_tokens - 1) div 8") ||
      $"n_segs" =!= $"end_seq" - $"start_seq" + 1).count()
    assert(bad == 0)
  }

  test("layout is deterministic in the seed and permuted by it") {
    val a1 = Pack.packPlan(fixture, 8L, seed = 7L).orderBy("doc_id").collect()
    val a2 = Pack.packPlan(fixture, 8L, seed = 7L).orderBy("doc_id").collect()
    val b = Pack.packPlan(fixture, 8L, seed = 8L).orderBy("doc_id").collect()
    assert(a1.sameElements(a2))
    assert(!a1.sameElements(b)) // 5 docs: P(same md5 order) ≈ 1/120
  }

  test("bucket width does not change the layout") {
    val w2 = Pack.packPlan(fixture, 8L, 7L, bucketHexChars = 2)
      .orderBy("doc_id").collect()
    val w1 = Pack.packPlan(fixture, 8L, 7L, bucketHexChars = 1)
      .orderBy("doc_id").collect()
    val w4 = Pack.packPlan(fixture, 8L, 7L, bucketHexChars = 4)
      .orderBy("doc_id").collect()
    assert(w2.sameElements(w1) && w2.sameElements(w4))
  }

  test("segments tile every document and every non-final sequence") {
    val plan = Pack.packPlan(fixture, capacity = 8L, seed = 7L)
    val segs = Pack.packSegments(plan, capacity = 8L).cache()
    // per-doc: slices cover [0, n_tokens) contiguously
    val perDoc = segs.groupBy("doc_id")
      .agg(sum("seg_len").as("tot"), min("doc_off").as("mn"),
        collect_list(struct($"doc_off", $"seg_len")).as("sl"))
      .join(plan.select($"doc_id", $"n_tokens"), "doc_id")
    assert(perDoc.filter($"tot" =!= $"n_tokens" || $"mn" =!= 0L).count() == 0)
    perDoc.select($"sl").as[Seq[(Long, Long)]].collect().foreach { sl =>
      val sorted = sl.sortBy(_._1)
      sorted.zip(sorted.drop(1)).foreach { case ((o1, l1), (o2, _)) =>
        assert(o1 + l1 == o2, s"non-contiguous doc slices: $sorted")
      }
    }
    // per-seq: gate holds, and a straddling doc (doc 3, 30 tokens at
    // capacity 8) has interior slices of exactly capacity
    val gate = Pack.capacityGate(segs, 8L).collect()(0)
    assert(gate.getAs[Boolean]("capacity_ok"))
    val mid = segs.filter($"doc_id" === 3L && $"doc_off" > 0L)
      .filter($"seq_id" < segs.filter($"doc_id" === 3L).agg(max("seq_id"))
        .as[Long].collect()(0))
    assert(mid.count() >= 1)
    assert(mid.filter($"seg_len" =!= 8L).count() == 0)
    segs.unpersist()
  }

  test("rehydration reproduces the shuffled corpus token stream exactly") {
    val plan = Pack.packPlan(fixture, capacity = 8L, seed = 7L)
    val segs = Pack.packSegments(plan, capacity = 8L)
    val seqs = Pack.rehydrate(segs, fixture)
      .orderBy("seq_id").collect()
    // every non-final sequence rehydrates to exactly capacity tokens
    seqs.dropRight(1).foreach { r =>
      val n = r.getAs[String]("seq_text").split("\\s+").length
      assert(n == 8, s"seq ${r.getAs[Long]("seq_id")} has $n tokens")
    }
    // concatenating sequences in order reproduces the doc stream in the
    // seeded shuffle order — packing loses nothing and reorders nothing
    val stream = seqs.map(_.getAs[String]("seq_text")).mkString(" ")
    val expected = plan.orderBy("cum_before").collect()
      .map(_.getAs[Long]("doc_id"))
      .map(id => fixture.filter($"doc_id" === id).collect()(0)
        .getAs[String]("text").trim.split("\\s+").mkString(" "))
      .mkString(" ")
    assert(stream == expected)
  }

  test("gate rejects a corrupted layout and passes the empty corpus") {
    val plan = Pack.packPlan(fixture, 8L, 7L)
    val segs = Pack.packSegments(plan, 8L)
    val broken = segs.withColumn("seg_len",
      when($"seq_id" === 0L && $"seq_off" === 0L, $"seg_len" + 1L)
        .otherwise($"seg_len"))
    assert(!Pack.capacityGate(broken, 8L).collect()(0)
      .getAs[Boolean]("capacity_ok"))
    val empty = Pack.capacityGate(
      Pack.packSegments(Pack.packPlan(docs(), 8L, 7L), 8L), 8L).collect()(0)
    assert(empty.getAs[Long]("n_seqs") == 0L)
    assert(empty.getAs[Boolean]("capacity_ok"))
  }

  test("streaming packer fed in key order reproduces the batch plan") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val batchPlan = Pack.packPlan(fixture, capacity = 8L, seed = 7L)
      .orderBy("cum_before").collect()
    val ordered = batchPlan.map(r => r.getAs[Long]("doc_id") ->
      fixture.filter($"doc_id" === r.getAs[Long]("doc_id"))
        .collect()(0).getAs[String]("text"))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.streamingPacker(
        in.toDF().toDF("doc_id", "text"), capacity = 8L, shards = 1)
      .writeStream.format("memory").queryName("pack_stream")
      .outputMode("append").start()
    try {
      // one micro-batch per doc, in the batch planner's key order —
      // arrival order then IS the batch order, so coordinates must match
      ordered.foreach { d => in.addData(d); q.processAllAvailable() }
      val streamed = spark.table("pack_stream")
        .select("doc_id", "n_tokens", "cum_before", "start_seq",
          "start_off", "end_seq", "n_segs")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val batch = Pack.packPlan(fixture, capacity = 8L, seed = 7L)
        .select("doc_id", "n_tokens", "cum_before", "start_seq",
          "start_off", "end_seq", "n_segs")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming packer carries lane state across uneven multi-doc chops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // plan-order delivery under a surrogate rank key (the packer sorts
    // within a batch by doc_id, and plan order is not doc_id-monotonic) —
    // the x135c catalog gate's replay shape, pinned here at fixture scale
    val plan = Pack.packPlan(fixture, capacity = 8L, seed = 7L)
      .orderBy("cum_before").collect()
    val texts = fixture.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val feed = plan.zipWithIndex.map { case (r, rank) =>
      (rank.toLong, texts(r.getAs[Long]("doc_id"))) }.toSeq
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.streamingPacker(
        in.toDF().toDF("doc_id", "text"), capacity = 8L, shards = 1)
      .writeStream.format("memory").queryName("pack_stream_chops")
      .outputMode("append").start()
    try {
      // three UNEVEN chops: the cumulative count must carry across
      // micro-batch boundaries (one-doc-per-batch cannot check that)
      Seq(feed.take(2), feed.slice(2, 3), feed.drop(3))
        .foreach { c => in.addData(c); q.processAllAvailable() }
      val streamed = spark.table("pack_stream_chops")
        .orderBy("doc_id")
        .select("n_tokens", "cum_before", "start_seq", "start_off",
          "end_seq", "n_segs")
        .collect().map(_.toSeq).toSeq
      val batch = plan.map(r => Seq(
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_before"),
        r.getAs[Long]("start_seq"), r.getAs[Long]("start_off"),
        r.getAs[Long]("end_seq"), r.getAs[Long]("n_segs"))).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("prefix sum is two-phase: doc windows partition by bucket, only the " +
       "bucket-subtotal window is single-partition") {
    val plan = Pack.packPlan(fixture, capacity = 8L, seed = 7L)
    val p = plan.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(bucket"), s"no bucketed window:\n$p")
    val singles = "SinglePartition".r.findAllIn(p).length
    assert(singles == 1, s"expected exactly 1 single-partition exchange " +
      s"(the <=256-row bucket cumsum), got $singles:\n$p")
  }
}
