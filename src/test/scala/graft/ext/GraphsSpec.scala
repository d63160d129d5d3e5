package graft.ext

import graft.SparkSpec

class GraphsSpec extends SparkSpec {

  private def frame(edges: Seq[(Long, Long)], nodes: Seq[Long]) = {
    import spark.implicits._
    (edges.toDF("src", "dst"), nodes.toDF("vec_id"))
  }

  test("pageRankMicro fixed point: a symmetric 2-cycle keeps every rank at 1e6") {
    val (e, n) = frame(Seq((1L, 2L), (2L, 1L)), Seq(1L, 2L))
    val got = Graphs.pageRankMicro(e, n, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("pageRankMicro: an isolated node settles at the 150000 teleport floor") {
    val (e, n) = frame(Seq((1L, 2L), (2L, 1L)), Seq(1L, 2L, 3L))
    val got = Graphs.pageRankMicro(e, n, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(3L) === 150000L)
    assert(got(1L) === got(2L))
  }

  test("checkpointing is value-neutral: iters above the threshold match an unchecked run") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    val (e, n) = frame(edges, nodes)
    // checkpointFrom high enough that no round checkpoints
    val plain = Graphs.pageRankMicro(e, n, iters = 5, checkpointFrom = 99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val checked = Graphs.pageRankMicro(e, n, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(checked === plain)
  }

  test("plan depth stays constant across iteration counts (lineage truncation)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val nodes = Seq(1L, 2L, 3L)
    val (e, n) = frame(edges, nodes)
    def planSize(iters: Int): Int =
      Graphs.pageRankMicro(e, n, iters)
        .queryExecution.optimizedPlan.collect { case p => p }.size
    // uncheckpointed, 8 iterations would plan ~2.7x the nodes of 4; with
    // per-round truncation the returned frame's plan is the same size
    // whatever the iteration count
    assert(planSize(4) === planSize(8))
    // and the checkpointed plan is SHALLOW — a handful of nodes, not a
    // join chain
    assert(planSize(8) < 10)
  }
}
