package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Curation, Dedup, Export, Ivf, Multimodal, Pack, Retrieval, Similarity, TextAnalysis}

/** LLM-training-data-pipeline query surface over `documents` and
  * `embeddings` (SURVEY.md §7.2 step 5), split by family:
  * [[DedupQueries]], [[SimilarityQueries]], [[TextQueries]],
  * [[MediaQueries]], [[PackingQueries]], [[BehavioralQueries]];
  * shared frames in [[ExtShared]]. This aggregator preserves the
  * original public surface (the registered defs and the bench
  * shared-frame hooks). */
object ExtQueries {
  val defs: Seq[QueryDef] =
    DedupQueries.defs ++ SimilarityQueries.defs ++ TextQueries.defs ++ MediaQueries.defs ++ PackingQueries.defs ++ BehavioralQueries.defs ++ AuditQueries.defs ++ ChatQueries.defs

  /** Bench hooks, forwarded (see [[ExtShared]]). */
  def clearSharedFrames(): Unit = ExtShared.clearSharedFrames()
  def sharedFrameTags: Set[String] = ExtShared.sharedFrameTags
  def sharedFrameBuildSecs: Map[String, Double] = ExtShared.sharedFrameBuildSecs
}
