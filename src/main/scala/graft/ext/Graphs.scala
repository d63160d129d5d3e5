package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators over (src, dst) edge frames — the keyed-join
  * power-iteration shape: every round is one join + hash aggregate on the
  * 8-byte node key, no driver collects, no per-node loops.
  */
object Graphs {

  /** Damped PageRank in EXACT integer micro-units (d = 0.85): each
    * iteration computes `r_j div outdeg → sum → ×850000 div 1e6 + 150000`,
    * so every iteration is bit-identical cross-engine (an oracle unrolls
    * the same recurrence). Dangling-node mass is dropped (the standard
    * simplification). Input contracts: `edges(src, dst)`,
    * `nodes(vec_id)`; output `(vec_id, pr)` with pr in micro-units.
    *
    * LINEAGE: an uncheckpointed loop builds an `iters`-deep lazy join
    * chain — fine for a handful of rounds over a persisted edge frame, but
    * at high iteration counts (or a corpus where each round's frames no
    * longer fit the shuffle cache) the linearly-deepening plan invites
    * re-execution and optimizer blowup. Past `checkpointFrom` iterations,
    * each round eagerly `localCheckpoint`s its rank frame, so plan depth
    * stays CONSTANT across rounds (GraphsSpec pins this) at the cost of
    * one node-sized materialization per round. */
  def pageRankMicro(edges: DataFrame, nodes: DataFrame, iters: Int,
                    checkpointFrom: Int = 3): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // materialize the (src, dst, outdeg) frame ONCE: localCheckpoint
    // truncates only the RANK lineage below, so without this the outdeg
    // aggregate (and the edge scan, when the input is unpersisted) would
    // re-execute inside every iteration's plan. localCheckpoint (not
    // persist+count) is DELIBERATE, same trade as the rank-frame
    // checkpoint below: the blocks live in non-replicated executor
    // storage, so losing an executor mid-loop fails the job instead of
    // recomputing — acceptable because the loop is minutes-bounded and a
    // retry restarts from the persisted edge input, while keeping lineage
    // would put the full edge-scan plan back under every iteration
    val eJoin = edges
      .select(col("src"), col("dst"))
      .join(edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
    val e = if (iters > 0) eJoin.localCheckpoint(true) else eJoin
    var pr = nodes.select(col("vec_id")).withColumn("pr", lit(1000000L))
    for (i <- 1 to iters) {
      val contrib = e
        .join(pr.select(col("vec_id").as("src"), col("pr")), "src")
        .select(col("dst").as("vec_id"), expr("pr div outdeg").as("c"))
        .groupBy(col("vec_id")).agg(sum(col("c")).as("inflow"))
      pr = nodes.select(col("vec_id")).join(contrib, Seq("vec_id"), "left")
        .select(col("vec_id"), expr(
          """CAST(150000 + CAST(850000 AS DECIMAL(38,0)) *
             coalesce(inflow, 0L) DIV 1000000 AS BIGINT)""").as("pr"))
      // truncate only once the chain is actually deep — the early rounds'
      // plans are shallow and need no eager materialization
      if (i > checkpointFrom) pr = pr.localCheckpoint(true)
    }
    pr
  }
}
