package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, LocalLimit, LocalRelation, LogicalPlan, Join, Project, SubqueryAlias, Window => LWindow}

/** Catalog-wide plan guard: EVERY entry's optimized plan is swept for the
  * two scale-killer shapes a single-entry pin cannot future-proof —
  * unconditioned cartesian joins and unpartitioned unbounded windows.
  * A new entry that reintroduces either fails HERE with its name, not in
  * a 100 TB postmortem. (VERDICT r16 "next round" #8: the per-entry
  * PlanSpec pins, generalized.)
  *
  * Allowlists are per-entry and justified inline; an allowlisted entry
  * that STOPS exhibiting the shape also fails, so the list cannot rot. */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Statically bounded output: Catalyst's own maxRows propagation
    * (limits, one-row aggregates, literal relations, and everything
    * row-preserving above them). 64 Ki rows is far above every bounded
    * frame here (top-k survivors, k-row samples) and far below any
    * data-sized frame. */
  private def bounded(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= 65536L)

  /** Unconditioned joins where NEITHER side is statically bounded NOR
    * author-asserted small — the shape that blows up at scale. Allowed:
    * a side with maxRows <= 64Ki (limit-k/one-row-agg/literal), and a
    * side under an explicit broadcast() hint (the single-query-row /
    * tiny-dim annotate, where the author asserts the bound Catalyst
    * cannot see — e.g. a filter to one vec_id). */
  private def cartesians(p: LogicalPlan): Seq[Join] =
    p.collect {
      case j: Join if j.condition.isEmpty &&
        !bounded(j.left) && !bounded(j.right) &&
        !j.hint.leftHint.exists(_.strategy.contains(
          org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) &&
        !j.hint.rightHint.exists(_.strategy.contains(
          org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) => j
    }

  /** Windows with an empty partition spec over an input Catalyst cannot
    * statically bound: every row lands on ONE partition. Acceptable only
    * over frames bounded by construction (vocab, histogram, per-source
    * aggregates) — which is what the allowlist certifies. */
  private def unpartitionedWindows(p: LogicalPlan): Seq[LWindow] =
    p.collect {
      case w: LWindow if w.partitionSpec.isEmpty && !bounded(w.child) => w
    }

  // Entries ALLOWED an unpartitioned window over a statically-unbounded
  // input, each with the bound that makes the single partition safe at
  // 100 TB. The sweep fails BOTH ways: an entry here that stops having
  // one (stale list) and an entry not here that gains one.
  private val windowAllowlist: Map[String, String] = Map(
    "x32_sequence_packing" ->
      "global contiguous-fill pack order IS the semantic; the entry's own doc names the scale form (partition the window by a source/shard key)",
    "x95_vocab_coverage" ->
      "rank over the (tok, cnt) vocabulary aggregate - |V|-bounded, never docs",
    "x76_source_quality_drift" ->
      "midrank cumsum over the quality-score HISTOGRAM - bounded by the 10001-value score range",
    "x79_source_epochs" ->
      "rank over per-source aggregate rows - |sources|-bounded",
    "x81_source_token_kl" ->
      "corpus-total window over per-source aggregate rows - |sources|-bounded",
    "x84_shard_balance" ->
      "rank over per-shard stats - |shards|-bounded",
    "x157_bpe_encode" ->
      "rank over symbol counts - |V|-bounded merge table",
    "x206_bpe_decode" ->
      "same vocab-id rank as x157 (|V|-bounded); the decode itself sorts inside collected arrays, never a window",
    "x165_funnel_latency" ->
      "cumsum over lat-div-B bucket SUBTOTALS - range/B rows (the r17 two-phase rewrite; PlanSpec pins the in-bucket window is bkt-partitioned)",
    "x212_chat_packed_masks" ->
      "packPlan's phase-1 cumsum over pack-bucket SUBTOTALS - <=16^bucketHexChars rows by construction (the same two-phase shape x135 runs behind its shared-frame materialization; the span and in-bucket windows are conv/bucket-partitioned)",
    "x215_chat_token_ids" ->
      "chatVocab id rank over symbol counts - |V|-bounded (the x157 vocab discipline); the position cumsum is conv-partitioned",
    "x217_chat_packed_token_masks" ->
      "packPlan's phase-1 cumsum over pack-bucket SUBTOTALS - <=16^bucketHexChars rows (the x212 shape in token units); span and in-bucket windows conv/bucket-partitioned",
    "x218_chat_packed_token_ids" ->
      "chatVocab |V|-bounded id rank + packPlan phase-1 bucket-subtotal cumsum (x157 + x212 shapes composed); all other windows conv/bucket-partitioned")

  test("no catalog entry plans an unconditioned non-one-row cartesian join") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      if (cartesians(plan).nonEmpty) bad += name
    }
    assert(bad.isEmpty,
      s"entries planning a cartesian join: ${bad.mkString(", ")}")
  }

  test("unpartitioned unbounded windows appear only on allowlisted entries") {
    val found = scala.collection.mutable.Map.empty[String, Int]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      val n = unpartitionedWindows(plan).size
      if (n > 0) found += name -> n
    }
    val unexpected = found.keySet -- windowAllowlist.keySet
    val stale = windowAllowlist.keySet -- found.keySet
    assert(unexpected.isEmpty,
      "entries with an unpartitioned window NOT in the allowlist " +
        s"(justify or repartition): ${unexpected.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      "allowlisted entries no longer have an unpartitioned window " +
        s"(prune the list): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
