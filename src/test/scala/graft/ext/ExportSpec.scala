package graft.ext

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** The export sink's loader contract: shard directories, a manifest whose
  * counts come from the written files, and partition-pruned shard reads. */
class ExportSpec extends SparkSpec {

  test("writeShards lays out shard directories with a complete manifest") {
    val curated = SparkEntry.queries("x73_curation_pipeline")(
      spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    try {
      val counts = Export.writeShards(curated, dir)
      // manifest counts equal the curated row count, shard by shard
      val want = curated.groupBy(col("shard")).agg(count(lit(1)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts === want)
      // directory layout is shard=N partitions
      val parts = new java.io.File(dir).listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard=")).sorted
      assert(parts.nonEmpty)
      assert(parts.toSet === want.keySet.map(s => s"shard=$s"))
      // the manifest file parses and totals correctly
      val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_graft_manifest.json")), "UTF-8")
      assert(manifest.contains(s""""total": ${want.values.sum}"""))
      // the manifest round-trips through the loader-side reader
      assert(Export.readManifest(dir) === want)
      // a shard-selective read prunes to those partitions
      val two = want.keySet.toSeq.sorted.take(2)
      val probe = Export.readShards(spark, dir, two)
      val scan = probe.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString("\n")
      val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
      assert(partFilters.contains("shard"), s"no partition pruning:\n$scan")
      assert(probe.count() === two.map(want).sum)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("writeShards rejects a frame without the shard column") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Export.writeShards(df, "/tmp/never-written")
    }
    assert(e.getMessage.contains("shard"))
  }
}
