package graft.analyzer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model._
import graft.ops.{Classify, Spans}

/** The per-batch critical-path analysis pipeline — the reference's
  * `StreamingQueryAnalyzer.analyze` → `StreamingCriticalPathAnalyzer`
  * (ref `analyzer/StreamingCriticalPathAnalyzer.scala:30-87`) as one
  * declarative plan over the span tables:
  *
  *   1. batch running time reconstructed from progress
  *      (`numInputRows / processedRowsPerSecond · 1000`,
  *      ref `analyzer/StreamingQueryAnalyzer.scala:118-129`);
  *   2. jobs grouped by sql-execution id (null ⇒ singleton group,
  *      ref `helper/JobOverlapHelper.scala:35-45`), then each group split
  *      into serial islands of overlapping jobs
  *      (ref `helper/JobOverlapHelper.scala:83-106`, via the
  *      nested-interval-correct [[graft.ops.Spans.splitOverlapping]]);
  *   3. estimatedTimeSpentInJobs = Σ island wall-clock spans;
  *      criticalPathForAllJobs  = Σ island max(per-job critical time)
  *      (ref `helper/JobOverlapHelper.scala:72-81`);
  *   4. criticalTime = (brt − estimatedTimeSpentInJobs) + criticalPath
  *      (ref `analyzer/StreamingCriticalPathAnalyzer.scala:30-49`);
  *   5. SLA classification, total (`Classify.slaState`), with the
  *      zero-progress guard ⇒ NONEWBATCHES
  *      (ref `analyzer/StreamingQueryAnalyzer.scala:118-128`).
  *
  * Scale: every step is a key-partitioned aggregation on
  * (queryId, batchId[, group]); nothing is global, nothing collects.
  */
object BatchAnalyzer {

  /** Integer state ordinal expression (ref `common/StreamingState.scala`). */
  private def ordinalOf(state: org.apache.spark.sql.Column) =
    Classify.stateOrdinals.foldLeft(lit(-1)) { case (acc, (name, ord)) =>
      when(state === name, ord).otherwise(acc)
    }

  /** Full pipeline: spans + progress + SLA config → one result per batch. */
  def analyze(jobs: Dataset[JobSpan],
              stages: Dataset[StageSpan],
              progress: Dataset[BatchProgress],
              slas: Dataset[QuerySla],
              defaultSlaMillis: Long = 120000L,
              lowFrac: Double = 0.3,
              highFrac: Double = 0.7): Dataset[CriticalPathResult] = {
    val spark = jobs.sparkSession
    import spark.implicits._

    val jobCt = CriticalPath.perJob(stages).toDF("jobId", "jobCriticalTime")

    // Jobs of streaming batches, with per-job critical times and the
    // group key: sql-execution id, or a singleton group for null
    // (ref JobOverlapHelper.scala:37-44).
    val batchJobs = jobs.toDF()
      .filter(col("queryId").isNotNull && col("batchId").isNotNull)
      .join(jobCt, Seq("jobId"), "left")
      .na.fill(0L, Seq("jobCriticalTime"))
      .withColumn("grp",
        coalesce(col("sqlExecutionId").cast("string"),
          concat(lit("solo-"), col("jobId"))))
      .withColumn("gkey",
        concat_ws("|", col("queryId"), col("batchId"), col("grp")))

    // Serial islands inside each group (overlap-aware split).
    val islandJobs = Spans.splitOverlapping(
      batchJobs.withColumnRenamed("startTime", "start_ms")
        .withColumnRenamed("endTime", "end_ms"),
      keyCol = "gkey", idCol = "jobId")

    val perIsland = islandJobs
      .groupBy(col("queryId"), col("batchId"), col("gkey"), col("island"))
      .agg(
        (max(col("end_ms")) - min(col("start_ms"))).as("islandSpan"),
        max(col("jobCriticalTime")).as("islandCriticalPath"))

    val perBatch = perIsland
      .groupBy(col("queryId"), col("batchId"))
      .agg(
        sum(col("islandSpan")).as("estimatedTimeSpentInJobs"),
        sum(col("islandCriticalPath")).as("criticalPathForAllJobs"))

    // Batch running time from progress (ref StreamingQueryAnalyzer:118-129).
    val withBrt = progress.toDF()
      .withColumn("batchRunningTime",
        when(col("numInputRows") > 0 && col("processedRowsPerSecond") > 0,
          (col("numInputRows") / col("processedRowsPerSecond") * 1000).cast("long"))
          .otherwise(lit(0L)))

    val slaLookup = slas.toDF()
      .select(col("queryIdent"), col("slaMillis"))

    val joined = withBrt
      .join(perBatch, Seq("queryId", "batchId"), "left")
      .join(broadcast(slaLookup), col("queryId") === col("queryIdent"), "left")
      .na.fill(0L, Seq("estimatedTimeSpentInJobs", "criticalPathForAllJobs"))
      .withColumn("sla", coalesce(col("slaMillis"), lit(defaultSlaMillis)))
      .withColumn("criticalTime",
        when(col("batchRunningTime") === 0L, lit(0L))
          .otherwise(col("batchRunningTime") - col("estimatedTimeSpentInJobs")
            + col("criticalPathForAllJobs")))

    val classified = joined
      .withColumn("streamingQueryState",
        when(col("numInputRows") === 0 || col("processedRowsPerSecond") === 0,
          "NONEWBATCHES")
          .otherwise(Classify.slaState(
            col("batchRunningTime"), col("criticalTime"),
            col("sla").cast("double"), lowFrac, highFrac)))

    classified
      .select(
        col("queryId"), col("batchId"),
        col("sla").as("expectedMicroBatchSLA"),
        col("batchRunningTime"), col("criticalTime"),
        col("streamingQueryState"),
        ordinalOf(col("streamingQueryState")).as("stateOrdinal"))
      .as[CriticalPathResult]
  }
}
