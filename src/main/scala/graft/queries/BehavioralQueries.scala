package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Curation, Dedup, Export, Ivf, Multimodal, Pack, Retrieval, Similarity, TextAnalysis}

/** Behavioral-events catalog entries: funnels, retention, transitions, and their streaming parity gates.
  *
  * Split from the original monolithic ExtQueries catalog — entries
  * verbatim; shared frames and helpers live in [[ExtShared]]. */
object BehavioralQueries {
  import ExtShared._

  val defs: Seq[QueryDef] = Seq(

    // x161 — event funnel (view → click → purchase): the sequence-match
    // analysis the q-series sessions/sweep-lines don't cover — per user,
    // the EARLIEST strictly-ordered completion (first view, first click
    // after it, first purchase after that; the standard greedy funnel
    // simplification) and a 24 h completion verdict. Three keyed filters +
    // min-aggregates + left joins — every stage shuffles on user_id only,
    // no windows over the event stream, no state. All-BIGINT epoch-ms →
    // full hash-match.
    QueryDef("x161_event_funnel",
      (s, d) => eventFunnelBatch(s, d).orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
                   v AS (SELECT user_id, min(ms) AS t1_ms FROM e
                         WHERE event_type = 'view' GROUP BY 1),
                   c AS (SELECT e.user_id, min(ms) AS t2_ms
                         FROM e JOIN v USING (user_id)
                         WHERE event_type = 'click' AND ms > v.t1_ms GROUP BY 1),
                   p AS (SELECT e.user_id, min(ms) AS t3_ms
                         FROM e JOIN c USING (user_id)
                         WHERE event_type = 'purchase' AND ms > c.t2_ms GROUP BY 1)
              SELECT v.user_id, v.t1_ms, c.t2_ms, p.t3_ms,
                     (p.t3_ms IS NOT NULL AND p.t3_ms - v.t1_ms <= 86400000)
                       AS completed_24h
              FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
              ORDER BY user_id""")),

    // x162 — cohort retention: users cohorted by first-active epoch-day,
    // distinct active users per (cohort_day, day offset) — the classic
    // retention triangle. Two keyed aggregates (first-day per user, then
    // (cohort, offset) distinct-user counts); integer epoch-day arithmetic
    // → full hash-match.
    QueryDef("x162_cohort_retention",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), expr("ms div 86400000").as("day"))
        val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        e.join(cohort, "user_id")
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy("cohort_day", "offset_days")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
                   c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
              SELECT c.cohort_day, e.day - c.cohort_day AS offset_days,
                     CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
              FROM e JOIN c USING (user_id)
              GROUP BY 1, 2 ORDER BY cohort_day, offset_days""")),

    // x163 — event-type transition matrix: per user, each event's successor
    // under the total (ms, event_id) order; counts and exact row-share ppm
    // per (from, to) — the first-order Markov behavior model (what follows
    // what) complementing x161's fixed funnel. ONE lead window partitioned
    // by user (the natural key — no global sort), then a 25-row aggregate.
    QueryDef("x163_event_transitions",
      (s, d) => {
        val t = transitionCountsBatch(s, d)
        val totals = t.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
        t.join(totals, "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            expr("n * 1000000 div tot").as("p_ppm"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
                     epoch_ms(ts) AS ms FROM events),
                   l AS (SELECT event_type AS from_type,
                           lead(event_type) OVER (PARTITION BY user_id
                             ORDER BY ms, event_id) AS to_type
                         FROM e),
                   t AS (SELECT from_type, to_type, count(*) AS n FROM l
                         WHERE to_type IS NOT NULL GROUP BY 1, 2),
                   tt AS (SELECT from_type, sum(n) AS tot FROM t GROUP BY 1)
              SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
                     CAST(t.n * 1000000 // tt.tot AS BIGINT) AS p_ppm
              FROM t JOIN tt USING (from_type)
              ORDER BY from_type, to_type""")),

    // x164 — doc/embedding alignment report: the integrity gate an
    // embedding-dependent pipeline (ANN, SemDeDup, clustering) checks
    // BEFORE trusting its joins — documents and vectors matched by id,
    // counts of each side's orphans, coverage in exact ppm. Two anti-join
    // counts + one semi count, all on 8-byte ids. The sf0.1 fixture
    // deliberately covers only 40% of docs, so the report is non-trivial.
    QueryDef("x164_alignment_report",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"))
        val vecs = Tables.embeddings(s, d).select(col("vec_id"))
        val matched = docs.join(vecs.withColumnRenamed("vec_id", "doc_id"),
          Seq("doc_id"), "left_semi")
        docs.agg(count(lit(1)).as("n_docs"))
          .crossJoin(broadcast(vecs.agg(count(lit(1)).as("n_vecs"))))
          .crossJoin(broadcast(matched.agg(count(lit(1)).as("n_matched"))))
          .select(col("n_docs"), col("n_vecs"), col("n_matched"),
            (col("n_docs") - col("n_matched")).as("docs_without_vec"),
            (col("n_vecs") - col("n_matched")).as("vecs_without_doc"),
            expr("""CAST(CASE WHEN n_docs > 0
                         THEN n_matched * 1000000 div n_docs ELSE 0 END
                    AS BIGINT)""").as("doc_coverage_ppm"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents),
                   v AS (SELECT vec_id FROM embeddings),
                   m AS (SELECT count(*) AS nm FROM d
                         WHERE doc_id IN (SELECT vec_id FROM v)),
                   nd AS (SELECT count(*) AS nd FROM d),
                   nv AS (SELECT count(*) AS nv FROM v)
              SELECT CAST(nd AS BIGINT) AS n_docs, CAST(nv AS BIGINT) AS n_vecs,
                     CAST(nm AS BIGINT) AS n_matched,
                     CAST(nd - nm AS BIGINT) AS docs_without_vec,
                     CAST(nv - nm AS BIGINT) AS vecs_without_doc,
                     CAST(CASE WHEN nd > 0 THEN nm * 1000000 // nd ELSE 0 END
                       AS BIGINT) AS doc_coverage_ppm
              FROM m, nd, nv""")),

    // x165 — funnel conversion latency: exact order statistics (min, p50,
    // p90 as k-th smallest, max) and the integral mean of t3 − t1 over
    // COMPLETED x161 funnels — the latency readout behind the funnel's
    // boolean verdict. Rank window runs over per-user aggregate rows (one
    // row per completed user, not per event); k-th-order-statistic
    // percentiles dodge every interpolation ambiguity (the x24 idiom).
    QueryDef("x165_funnel_latency",
      (s, d) => {
        val fun = graft.SparkEntry.queries("x161_event_funnel")(s, d)
          .filter(col("t3_ms").isNotNull)
          .select((col("t3_ms") - col("t1_ms")).as("lat"))
        // TWO-PHASE order statistics (the Pack.packPlan bucket-subtotal
        // idiom): at ms resolution latencies are near-unique, so a plain
        // (lat, cnt) histogram approaches users-sized and an
        // `orderBy(lat)` window over it is a users-sized single
        // partition. Instead (1) bucket latencies by `lat div B` and
        // cumsum the BUCKET SUBTOTALS — the only unpartitioned window,
        // bounded by range/B rows (a 24 h ms-resolution window is ~1.3 k
        // buckets at B = 65536), never by user count; (2) rank inside
        // each bucket with a bkt-PARTITIONED window and add the bucket's
        // base offset. Global cum = off + in-bucket cum, exactly the
        // one-window cumsum's value, so the k-th-smallest reads (and the
        // oracle hash) are unchanged.
        val B = 65536L
        val hist = fun
          .groupBy(expr(s"lat div $B").as("bkt"), col("lat"))
          .agg(count(lit(1)).as("cnt"))
        val bsub = hist.groupBy(col("bkt")).agg(sum(col("cnt")).as("bcnt"))
        val woff = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        // total `n` via a second window over the SAME subtotal rows (not
        // a crossJoin of a separate aggregate, which would recompute the
        // whole funnel subtree a second time)
        val wall = Window.partitionBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val offs = bsub
          .withColumn("off", coalesce(sum(col("bcnt")).over(woff), lit(0L)))
          .withColumn("n", sum(col("bcnt")).over(wall))
          .select(col("bkt"), col("off"), col("n"))
        val win = Window.partitionBy(col("bkt")).orderBy(col("lat"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist
          .withColumn("cumin", sum(col("cnt")).over(win))
          .join(broadcast(offs), "bkt")
          .withColumn("cum", col("off") + col("cumin"))
          .agg(coalesce(max(col("cum")), lit(0L)).as("n_completed"),
            min(col("lat")).as("min_ms"),
            min(when(col("cum") >= expr("(n + 1) div 2"), col("lat")))
              .as("p50_ms"),
            min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("lat")))
              .as("p90_ms"),
            max(col("lat")).as("max_ms"),
            expr("CAST(sum(lat * cnt) div sum(cnt) AS BIGINT)").as("mean_ms"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
                   v AS (SELECT user_id, min(ms) AS t1 FROM e
                         WHERE event_type = 'view' GROUP BY 1),
                   c AS (SELECT e.user_id, min(ms) AS t2 FROM e JOIN v USING (user_id)
                         WHERE event_type = 'click' AND ms > v.t1 GROUP BY 1),
                   p AS (SELECT e.user_id, min(ms) AS t3 FROM e JOIN c USING (user_id)
                         WHERE event_type = 'purchase' AND ms > c.t2 GROUP BY 1),
                   lat AS (SELECT p.t3 - v.t1 AS lat
                           FROM p JOIN v USING (user_id)),
                   rk AS (SELECT lat, row_number() OVER (ORDER BY lat) AS r,
                            count(*) OVER () AS n
                          FROM lat)
              SELECT CAST(count(*) AS BIGINT) AS n_completed,
                     CAST(min(lat) AS BIGINT) AS min_ms,
                     CAST(min(CASE WHEN r = (n + 1) // 2 THEN lat END) AS BIGINT) AS p50_ms,
                     CAST(min(CASE WHEN r = (9 * n + 9) // 10 THEN lat END) AS BIGINT) AS p90_ms,
                     CAST(max(lat) AS BIGINT) AS max_ms,
                     CAST(sum(lat) // count(*) AS BIGINT) AS mean_ms
              FROM rk""")),

    // x161b — streaming funnel parity gate: replay the sf event stream in
    // ts order through a REAL MemoryStream query (funnelMonitor, two
    // uneven micro-batch chops) and assert the converged per-user rows
    // equal the batch x161 frame — the StreamingSpec chop-parity contract
    // made driver-visible as an oracle-checked boolean, so a drift between
    // the incremental and batch funnels fails the correctness gate, not
    // only CI. Bounded: one events collect + per-user emissions.
    QueryDef("x161b_funnel_stream_gate",
      (s, d) => {
        import s.implicits._
        val expected = eventFunnelBatch(s, d).collect()
          .map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3),
            r.getBoolean(4))).toSet
        val rows = orderedEventRows(s, d)
        val acc = replayMonitor(s,
          Seq(rows.take(rows.length / 3), rows.drop(rows.length / 3)),
          graft.streaming.StreamingOps.funnelMonitor(_)) { r =>
          (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3),
            r.getBoolean(4))
        }
        // the LAST emission per user is the converged funnel row
        val last = acc.zipWithIndex.groupBy(_._1._1)
          .map { case (_, g) => g.maxBy(_._2)._1 }.toSet
        Seq((last == expected) && expected.nonEmpty)
          .toDF("funnel_stream_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS funnel_stream_ok")),

    // x163b — streaming transition parity gate: the x163 analog — replay
    // in three uneven chops (boundary-straddling pairs must still emit),
    // aggregate the emitted (from, to) increments, and assert equality
    // with the batch transition counts.
    QueryDef("x163b_transition_stream_gate",
      (s, d) => {
        import s.implicits._
        val expected = transitionCountsBatch(s, d).collect()
          .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
        val rows = orderedEventRows(s, d)
        // three uneven chops: boundary-straddling pairs must still emit
        val acc = replayMonitor(s,
          Seq(rows.take(rows.length / 3),
            rows.slice(rows.length / 3, rows.length / 2),
            rows.drop(rows.length / 2)),
          graft.streaming.StreamingOps.transitionMonitor(_)) { r =>
          (r.getString(1), r.getString(2))
        }
        val counts = acc.groupBy(identity)
          .map { case (k, g) => k -> g.size.toLong }
        Seq((counts == expected) && expected.nonEmpty)
          .toDF("transition_stream_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS transition_stream_ok")),

    // x161c — OUT-OF-ORDER funnel parity gate: the x161b replay with each
    // chop SHUFFLED (seeded — deterministic) through the event-time-
    // BUFFERED monitor. Two far-future sentinel events (an unused user, a
    // type the funnel ignores) advance the watermark past every real
    // event and force the batch where the armed event-time timeouts drain
    // the buffers — so the gate asserts the watermark-buffered path
    // converges to the exact batch x161 rows under delivery disorder the
    // unbuffered monitor cannot absorb.
    QueryDef("x161c_funnel_ooo_gate",
      (s, d) => {
        import s.implicits._
        val expected = eventFunnelBatch(s, d).collect()
          .map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3),
            r.getBoolean(4))).toSet
        val rows = orderedEventRows(s, d)
        val rnd = new scala.util.Random(42)
        val maxMs = rows.map(_._3).max
        val sentinel = rows.map(_._1).max + 1
        // two shuffled chops (not three): each extra chop costs a full
        // state-store micro-batch round — disorder coverage is identical
        val acc = replayMonitor(s,
          Seq(rnd.shuffle(rows.take(rows.length / 2)),
            rnd.shuffle(rows.drop(rows.length / 2)),
            Seq((sentinel, "sentinel", maxMs + 10L * 86400000L, 0L)),
            Seq((sentinel, "sentinel", maxMs + 20L * 86400000L, 1L))),
          df => graft.streaming.StreamingOps
            .funnelMonitorBuffered(df, lateness = "1 minute")) { r =>
          (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3),
            r.getBoolean(4))
        }
        val last = acc.zipWithIndex.groupBy(_._1._1)
          .map { case (_, g) => g.maxBy(_._2)._1 }.toSet
        Seq((last == expected) && expected.nonEmpty)
          .toDF("funnel_ooo_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS funnel_ooo_ok")),

    // x163c — OUT-OF-ORDER transition parity gate: the x163b contract
    // under shuffled delivery through the buffered monitor — the union of
    // emissions must aggregate to exactly the batch x163 counts once the
    // sentinel-driven watermark drains every buffer.
    QueryDef("x163c_transition_ooo_gate",
      (s, d) => {
        import s.implicits._
        val expected = transitionCountsBatch(s, d).collect()
          .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
        val rows = orderedEventRows(s, d)
        val rnd = new scala.util.Random(42)
        val maxMs = rows.map(_._3).max
        val sentinel = rows.map(_._1).max + 1
        // two shuffled chops — the funnel gate's rationale
        val acc = replayMonitor(s,
          Seq(rnd.shuffle(rows.take(rows.length / 2)),
            rnd.shuffle(rows.drop(rows.length / 2)),
            Seq((sentinel, "sentinel", maxMs + 10L * 86400000L, 0L)),
            Seq((sentinel, "sentinel", maxMs + 20L * 86400000L, 1L))),
          df => graft.streaming.StreamingOps
            .transitionMonitorBuffered(df, lateness = "1 minute")) { r =>
          (r.getString(1), r.getString(2))
        }
        val counts = acc.groupBy(identity)
          .map { case (k, g) => k -> g.size.toLong }
        Seq((counts == expected) && expected.nonEmpty)
          .toDF("transition_ooo_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS transition_ooo_ok")),
  )
}
