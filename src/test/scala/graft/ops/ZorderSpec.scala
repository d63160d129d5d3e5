package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Zorder]]: the Morton arithmetic against a plain-Scala reference, and
  * the layout claim itself — a z-clustered write yields files narrow on
  * BOTH dimensions where a random layout is wide on both. */
class ZorderSpec extends SparkSpec {

  private def refSpread(x: Long): Long = {
    var v = 0L
    var i = 0
    while (i < 16) { v |= ((x >> i) & 1L) << (2 * i); i += 1 }
    v
  }

  private def refZ(a: Long, alo: Long, ahi: Long,
                   b: Long, blo: Long, bhi: Long): Long = {
    def norm(x: Long, lo: Long, hi: Long): Long =
      if (hi > lo) (x - lo) * 65535L / (hi - lo) else 0L
    refSpread(norm(a, alo, ahi)) | (refSpread(norm(b, blo, bhi)) << 1)
  }

  test("zvalue2 matches the bitwise reference over the full corner set") {
    import spark.implicits._
    // corners, degenerate dims, and a deterministic pseudo-random sweep
    val vals = (Seq((0L, 0L), (0L, 999L), (999L, 0L), (999L, 999L),
      (1L, 1L), (500L, 250L)) ++
      (1 to 200).map(i => ((i * 2654435761L) % 1000, (i * 40503L) % 1000)))
    val df = vals.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
      Zorder.zvalue2(col("a"), lit(0L), lit(999L),
        col("b"), lit(0L), lit(999L)).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    vals.foreach { case (a, b) =>
      assert(got((a, b)) === refZ(a, 0L, 999L, b, 0L, 999L), s"($a,$b)")
    }
    // a constant dimension collapses to 0 instead of dividing by zero
    val const = Seq((5L, 7L)).toDF("a", "b")
      .select(Zorder.zvalue2(col("a"), lit(5L), lit(5L),
        col("b"), lit(0L), lit(15L)).as("z")).head.getLong(0)
    assert(const === refSpread(7L * 65535L / 15L) << 1)
  }

  test("withZValue bounds come from the frame itself and zval is total") {
    import spark.implicits._
    val df = Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 15L, 150L))
      .toDF("id", "a", "b")
    val z = Zorder.withZValue(df, "a", "b").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("zval")).toMap
    assert(z(1L) === refZ(10L, 10L, 20L, 100L, 100L, 200L))
    assert(z(2L) === refZ(20L, 10L, 20L, 200L, 100L, 200L))
    assert(z(3L) === refZ(15L, 10L, 20L, 150L, 100L, 200L))
  }

  test("zval name collisions and overflow-wide ranges refuse loudly") {
    import spark.implicits._
    // a pre-existing zval column would be silently dropped by clusterByZ
    val clash = Seq((1L, 2L, 3L)).toDF("a", "b", "zval")
    val e = intercept[IllegalArgumentException](
      Zorder.withZValue(clash, "a", "b"))
    assert(e.getMessage.contains("zval"))
    // a dimension range beyond 2^47 would overflow (c-lo)*65535: the
    // driver-side bounds check refuses at CALL time instead of clustering
    // garbage
    val wide = Seq((0L, 1L), (Long.MaxValue - 1L, 2L)).toDF("a", "b")
    val e2 = intercept[IllegalArgumentException](
      Zorder.withZValue(wide, "a", "b"))
    assert(e2.getMessage.contains("2^47"))
    // an empty frame is total: zval attaches as 0, no rows, no crash
    assert(Zorder.withZValue(
      spark.emptyDataset[(Long, Long)].toDF("a", "b"), "a", "b")
      .count() === 0L)
  }

  test("a predicate on either dimension prunes parquet reads on the z layout") {
    // The CONSUMER-side proof the layout test can't give: run a real
    // filtered count over the written files and measure what the parquet
    // reader actually DECODED (task input recordsRead) — row-group
    // min/max pruning must let the z layout skip most of the data on a
    // narrow predicate on EITHER dimension, while the random layout's
    // every-file-spans-everything stats force a full decode.
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_partkey"), col("l_suppkey"))
    val base = java.nio.file.Files.createTempDirectory("graft-zprune").toString
    def recordsRead(action: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            acc.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        action
        // listener delivery is async: poll until the counter stabilizes
        var last = -1L
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (System.nanoTime() < deadline && acc.get() != last) {
          last = acc.get(); Thread.sleep(150)
        }
        acc.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    try {
      // many small files -> many row groups, so stats-range pruning has
      // units to skip; identical file count on both layouts
      Zorder.clusterByZ(li, "l_partkey", "l_suppkey", 16)
        .write.mode("overwrite").parquet(s"$base/z")
      li.repartition(16).write.mode("overwrite").parquet(s"$base/r")
      val total = li.count()
      val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).head
      def narrow(lo: Long, hi: Long): (Long, Long) =
        (lo, lo + math.max(1L, (hi - lo) / 20))
      for (dim <- Seq("l_partkey", "l_suppkey")) {
        val (lo, hi) =
          if (dim == "l_partkey") narrow(b.getLong(0), b.getLong(1))
          else narrow(b.getLong(2), b.getLong(3))
        def run(dir: String): Long = recordsRead {
          spark.read.parquet(dir)
            .filter(col(dim).between(lo, hi)).count()
        }
        val (zRead, rRead) = (run(s"$base/z"), run(s"$base/r"))
        // random layout: every file's stats span the predicate -> full decode
        assert(rRead >= (total * 0.9).toLong,
          s"$dim: random layout unexpectedly pruned ($rRead of $total)")
        // z layout: a 5% slice on either dimension must skip well over half
        assert(zRead <= (total * 0.5).toLong,
          s"$dim: z layout did not prune ($zRead of $total read)")
      }
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("a z-clustered write is narrow on BOTH dimensions per file where a " +
    "random layout is wide") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey"), col("l_suppkey"))
    // per-file normalized range sum: Σ_files (awidth_f/awidth + bwidth_f/bwidth)
    def score(dir: String): Double = {
      val withFile = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
      val per = withFile.groupBy(col("f")).agg(
        (max(col("l_partkey")) - min(col("l_partkey"))).as("ar"),
        (max(col("l_suppkey")) - min(col("l_suppkey"))).as("br"))
      val tot = withFile.agg(
        (max(col("l_partkey")) - min(col("l_partkey"))).as("aw"),
        (max(col("l_suppkey")) - min(col("l_suppkey"))).as("bw")).head
      val (aw, bw) = (tot.getLong(0).toDouble, tot.getLong(1).toDouble)
      per.collect().map(r =>
        r.getLong(1) / math.max(aw, 1.0) + r.getLong(2) / math.max(bw, 1.0)).sum
    }
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      Zorder.clusterByZ(li, "l_partkey", "l_suppkey", 8)
        .write.mode("overwrite").parquet(s"$base/clustered")
      li.repartition(8) // round-robin: every file spans both full ranges
        .write.mode("overwrite").parquet(s"$base/random")
      val (zs, rs) = (score(s"$base/clustered"), score(s"$base/random"))
      // random: ~2.0 per file. z-order: each of 8 curve segments covers a
      // small rectangle. Demand a 2× improvement — far from the noise.
      assert(zs < 0.5 * rs, s"z-clustered file ranges not narrow: $zs vs $rs")
      // the layout key does not leak into the data
      assert(!spark.read.parquet(s"$base/clustered").columns.contains("zval"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
