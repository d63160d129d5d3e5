package graft.analyzer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Builds the span tables (T1/T2/T6 of SURVEY.md §1.1) from a raw
  * scheduler-event Dataset — the declarative equivalent of the reference's
  * listener handlers mutating `StreamingAppTracker`'s maps
  * (ref `listener/StreamingAppListener.scala:39-217`).
  *
  * Every builder is one hash aggregation keyed by the entity id: partial
  * (map-side) aggregation collapses the per-event rows before the shuffle,
  * so at 100 TB of telemetry each table costs a single key-partitioned
  * shuffle of pre-combined partials.
  */
object SpanBuilder {

  /** Job spans: correlate jobStart/jobEnd, carrying the streaming FKs from
    * the start event (ref `StreamingAppListener.scala:39-81`). */
  def jobSpans(events: Dataset[SchedulerEvent]): Dataset[JobSpan] = {
    import events.sparkSession.implicits._
    events.toDF()
      .filter(col("kind").isin("jobStart", "jobEnd") && col("jobId").isNotNull)
      .groupBy(col("jobId"))
      .agg(
        min(when(col("kind") === "jobStart", col("time"))).as("startTime"),
        max(when(col("kind") === "jobEnd", col("time"))).as("endTime"),
        // FKs ride on jobStart only; max over the group recovers them.
        max(col("sqlExecutionId")).as("sqlExecutionId"),
        max(col("queryId")).as("queryId"),
        max(col("batchId")).as("batchId"))
      // In-flight jobs (no jobEnd in the snapshot yet) would deserialize
      // null into JobSpan's primitive endTime and crash the analysis —
      // a live monitoring tool snapshots mid-batch routinely. Completed
      // work only.
      .filter(col("startTime").isNotNull && col("endTime").isNotNull)
      .select(col("jobId"), col("startTime"), col("endTime"),
        col("sqlExecutionId"), col("queryId"), col("batchId"))
      .as[JobSpan]
  }

  /** Stage spans incl. the longest single task, the input to the critical
    * path (ref `StreamingAppListener.scala:110-142,144-192` and sparklens
    * `StageTimeSpan.updateTasks`). Stage→job comes from the jobStart's
    * stageIds (T3 `stageIDToJobID`). */
  def stageSpans(events: Dataset[SchedulerEvent]): Dataset[StageSpan] = {
    import events.sparkSession.implicits._
    val stageToJob = events.toDF()
      .filter(col("kind") === "jobStart")
      .select(col("jobId"), explode(col("stageIds")).as("stageId"))
    val stageAgg = events.toDF()
      .filter(col("stageId").isNotNull &&
        col("kind").isin("stageSubmitted", "stageCompleted", "taskEnd"))
      .groupBy(col("stageId"))
      .agg(
        min(when(col("kind") === "stageSubmitted", col("time"))).as("startTime"),
        max(when(col("kind") === "stageCompleted", col("time"))).as("endTime"),
        first(when(col("kind") === "stageSubmitted", col("parentStageIds")),
          ignoreNulls = true).as("parentStageIds"),
        max(coalesce(col("numTasks"), lit(0))).as("numTasks"),
        max(when(col("kind") === "taskEnd", coalesce(col("durationMs"), lit(0L)))
          .otherwise(lit(0L))).as("maxTaskDurationMs"),
        sum(when(col("kind") === "taskEnd", coalesce(col("durationMs"), lit(0L)))
          .otherwise(lit(0L))).as("totalTaskDurationMs"))
    stageAgg
      .join(stageToJob, "stageId")
      // Same in-flight guard as jobSpans: stages without a completion event
      // yet must not reach StageSpan's primitive Long fields.
      .filter(col("startTime").isNotNull && col("endTime").isNotNull)
      .select(col("stageId"), col("jobId"), col("startTime"), col("endTime"),
        coalesce(col("parentStageIds"), array().cast("array<int>")).as("parentStageIds"),
        col("numTasks"), col("maxTaskDurationMs"), col("totalTaskDurationMs"))
      .as[StageSpan]
  }

  /** Executor spans (ref `StreamingAppListener.scala:194-217`). */
  def executorSpans(events: Dataset[SchedulerEvent]): Dataset[ExecutorSpan] = {
    import events.sparkSession.implicits._
    events.toDF()
      .filter(col("kind").isin("executorAdded", "executorRemoved") &&
        col("executorId").isNotNull)
      .groupBy(col("executorId"))
      .agg(
        max(col("host")).as("host"),
        max(coalesce(col("cores"), lit(0))).as("cores"),
        min(when(col("kind") === "executorAdded", col("time"))).as("startTime"),
        max(when(col("kind") === "executorRemoved", col("time"))).as("endTime"))
      .select(col("executorId"), col("host"), col("cores"),
        col("startTime"), col("endTime"))
      .as[ExecutorSpan]
  }

  /** Job→executor bridge rows (T5 `jobIdToExecutorId`,
    * ref `StreamingAppTracker.scala:37`): which executors ran tasks of which
    * job, from taskEnd events resolved through the stage→job mapping. */
  def jobExecutors(events: Dataset[SchedulerEvent]): DataFrame = {
    val stageToJob = events.toDF()
      .filter(col("kind") === "jobStart")
      .select(col("jobId"), explode(col("stageIds")).as("stageId"))
    events.toDF()
      .filter(col("kind") === "taskEnd" &&
        col("executorId").isNotNull && col("stageId").isNotNull)
      .select(col("stageId"), col("executorId"))
      .join(stageToJob, "stageId")
      .select(col("jobId"), col("executorId"))
      .distinct()
  }

  /** Executors active in one batch — the reference's semi-join chain
    * (ref `common/MicroBatchContext.scala:96-99,123-129`): executors whose
    * id appears among the batch's jobs' executors. */
  def batchExecutors(executors: Dataset[ExecutorSpan], jobs: Dataset[JobSpan],
                     jobExec: DataFrame, queryId: String,
                     batchId: Long): Dataset[ExecutorSpan] = {
    import executors.sparkSession.implicits._
    val batchJobs = jobs.toDF()
      .filter(col("queryId") === queryId && col("batchId") === batchId)
      .select(col("jobId"))
    executors.toDF()
      .join(
        jobExec.join(batchJobs, Seq("jobId"), "left_semi")
          .select(col("executorId")),
        Seq("executorId"), "left_semi")
      .as[ExecutorSpan]
  }

  /** Batch progress rows from the progress stream
    * (ref `QueryInsightsManager.scala:198-204`). */
  def batchProgress(events: Dataset[ProgressEvent]): Dataset[BatchProgress] = {
    import events.sparkSession.implicits._
    events.toDF()
      .filter(col("kind") === "progress" && col("batchId").isNotNull)
      .select(col("queryId"), col("batchId"), col("timestamp"),
        col("numInputRows"), col("processedRowsPerSecond"))
      .as[BatchProgress]
  }
}
