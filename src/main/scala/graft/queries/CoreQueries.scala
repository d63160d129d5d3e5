package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Canon._

/** Declared query surface Q1–Q15 (SURVEY.md §2.3) — each generalizes a
  * reference operator (cited per query) onto the driver testdata tables.
  *
  * Scale notes (100 TB design intent, verified via .explain on every query):
  * filters/projections push into the parquet scan; dimension joins broadcast;
  * fact-fact joins shuffle on their keys and rely on AQE for skew; aggregates
  * are partial+final hash aggregation (map-side combine) for free.
  */
object CoreQueries {

  val defs: Seq[QueryDef] = Seq(

    // Q1 — projection-on-ingest (ref QueryInsightsManager.scala:198-204)
    QueryDef("q01_project",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy("event_id"),
      Some("SELECT event_id, user_id, value FROM events ORDER BY event_id")),

    // Q2 — range filter / batch slice (ref MicroBatchContext.scala:93-95)
    QueryDef("q02_range_filter",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey").between(100, 500))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem WHERE l_orderkey BETWEEN 100 AND 500
              ORDER BY l_orderkey, l_linenumber""")),

    // Q3 — null/empty guards (ref StreamingAppListener.scala:49-56)
    QueryDef("q03_null_guard",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_totalprice") > 150000 && col("o_orderstatus").isNotNull)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              WHERE o_totalprice > 150000 AND o_orderstatus IS NOT NULL
              ORDER BY o_orderkey""")),

    // Q4 — string-match dispatch (ref StreamingLensReportingHelper.scala:143-175)
    QueryDef("q04_case_dispatch",
      (s, d) => Tables.part(s, d)
        .withColumn("reco",
          when(col("p_type").contains("ECONOMY"), "budget")
            .when(col("p_type").contains("PROMO"), "promo")
            .when(col("p_size") > 20, "bulky")
            .otherwise("standard"))
        .select(col("p_partkey"), col("p_type"), col("p_size"), col("reco"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_type, p_size,
              CASE WHEN p_type LIKE '%ECONOMY%' THEN 'budget'
                   WHEN p_type LIKE '%PROMO%' THEN 'promo'
                   WHEN p_size > 20 THEN 'bulky'
                   ELSE 'standard' END AS reco
              FROM part ORDER BY p_partkey""")),

    // Q5 — equi-join lookup chain (ref StreamingAppListener.scala:93-106).
    // lineitem⋈orders shuffles on the shared key; customer is a broadcast dim.
    QueryDef("q05_join_chain",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o  = Tables.orders(s, d)
        val c  = Tables.customer(s, d)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
                  col("c_name"), col("l_extendedprice"), col("o_totalprice"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, o_custkey, c_name, l_extendedprice, o_totalprice
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              ORDER BY l_orderkey, l_linenumber""")),

    // Q6a — semi-join membership (ref MicroBatchContext.scala:97-99)
    QueryDef("q06_semi_join",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
              ORDER BY c_custkey""")),

    // Q6b — anti-join variant
    QueryDef("q06_anti_join",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
              ORDER BY c_custkey""")),

    // Q7 — left-outer + coalesce default (ref QueryProgressListener.scala:36-38)
    QueryDef("q07_outer_coalesce",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
              col("c_nationkey") === col("n_nationkey") && col("n_regionkey") < 2, "left_outer")
        .select(col("c_custkey"), coalesce(col("n_name"), lit("UNKNOWN")).as("nation_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, coalesce(n_name, 'UNKNOWN') AS nation_name
              FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey AND n_regionkey < 2
              ORDER BY c_custkey""")),

    // Q8 — group wall-clock span (ref JobOverlapHelper.scala:72-75)
    QueryDef("q08_group_span",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg((max(col("ms")) - min(col("ms"))).as("span_ms"), count(lit(1)).as("n"))
        .orderBy("user_id"),
      Some("""SELECT user_id, max(epoch_ms(ts)) - min(epoch_ms(ts)) AS span_ms, count(*) AS n
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // Q9 — aggregate roll-up, TPC-H Q1 shape (ref StreamingAppListener.scala:117-136)
    QueryDef("q09_tpch_q1",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / count(*) AS avg_qty,
              count(*) AS n
              FROM lineitem GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    // Q10 — two-level aggregation (ref JobOverlapHelper.scala:77-81)
    QueryDef("q10_two_level_agg",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(max(col("o_totalprice")).as("m"))
        .agg(dsum(col("m")).as("total_of_max"), count(lit(1)).as("n_cust")),
      Some("""SELECT CAST(SUM(CAST(m AS DECIMAL(30,6))) AS DOUBLE) AS total_of_max, count(*) AS n_cust
              FROM (SELECT max(o_totalprice) AS m FROM orders GROUP BY o_custkey) t""")),

    // Q11 — sweep-line max concurrency (ref MicroBatchContext.scala:35-78).
    // Spans explode into ±1 deltas; running sum is partitioned by event_type
    // so no single-partition global window exists at scale.
    QueryDef("q11_sweepline",
      (s, d) => graft.ops.Spans.maxConcurrency(
        Tables.events(s, d)
          .select(col("event_type"), col("ms").as("start_ms"),
                  (col("ms") + expr("cast(round(value * 1000) as long)")).as("end_ms")),
        keyCol = "event_type")
        .orderBy("event_type"),
      Some("""WITH spans AS (
                SELECT event_type, epoch_ms(ts) AS s, epoch_ms(ts) + CAST(round(value * 1000) AS BIGINT) AS e
                FROM events),
              deltas AS (
                SELECT event_type, s AS t, 1 AS delta FROM spans
                UNION ALL
                SELECT event_type, e AS t, -1 AS delta FROM spans),
              run AS (
                SELECT event_type, SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta DESC) AS c
                FROM deltas)
              SELECT event_type, CAST(max(c) AS BIGINT) AS max_concurrency
              FROM run GROUP BY event_type ORDER BY event_type""")),

    // Q11b — same semantics via the two-phase bucketed running sum, the
    // formulation that survives a key whose event count exceeds one
    // executor's sort budget (same oracle as Q11 by construction).
    QueryDef("q11_sweepline_scalable",
      (s, d) => graft.ops.Spans.maxConcurrencyScalable(
        Tables.events(s, d)
          .select(col("event_type"), col("ms").as("start_ms"),
                  (col("ms") + expr("cast(round(value * 1000) as long)")).as("end_ms")),
        keyCol = "event_type")
        .orderBy("event_type"),
      Some("""WITH spans AS (
                SELECT event_type, epoch_ms(ts) AS s, epoch_ms(ts) + CAST(round(value * 1000) AS BIGINT) AS e
                FROM events),
              deltas AS (
                SELECT event_type, s AS t, 1 AS delta FROM spans
                UNION ALL
                SELECT event_type, e AS t, -1 AS delta FROM spans),
              run AS (
                SELECT event_type, SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta DESC) AS c
                FROM deltas)
              SELECT event_type, CAST(max(c) AS BIGINT) AS max_concurrency
              FROM run GROUP BY event_type ORDER BY event_type""")),

    // Q12 — session/island split, gaps-and-islands (ref JobOverlapHelper.scala:83-106)
    QueryDef("q12_islands",
      (s, d) => graft.ops.Spans.sessionize(
        Tables.events(s, d).select(col("user_id"), col("event_id"), col("ms")),
        keyCol = "user_id", tsCol = "ms", idCol = "event_id", gapMs = 300000L)
        .orderBy("user_id", "island"),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
              f AS (SELECT user_id, event_id, ms,
                      CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 300000 THEN 1 ELSE 0 END AS flag
                    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
              i AS (SELECT user_id, ms,
                      CAST(SUM(flag) OVER (PARTITION BY user_id ORDER BY ms, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
                    FROM f)
              SELECT user_id, island, count(*) AS n_events, min(ms) AS start_ms, max(ms) AS end_ms
              FROM i GROUP BY user_id, island ORDER BY user_id, island""")),

    // Q13 — exponentially-discounted mean (ref StreamingLensReportingHelper.scala:180-197)
    QueryDef("q13_discounted",
      (s, d) => graft.ops.Discounted.discountedMean(
        Tables.events(s, d).select(col("user_id"), col("event_id"), col("ms"), col("value")),
        keyCol = "user_id", orderCols = Seq("ms", "event_id"), valueCol = "value", discount = 0.95)
        .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, value,
                row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
              FROM events),
              w AS (SELECT user_id, value, power(0.95, rn - 1) AS wt FROM e)
              SELECT user_id, round(SUM(value * wt) / SUM(wt), 4) AS score, count(*) AS n
              FROM w GROUP BY user_id ORDER BY user_id""")),

    // Q14 — threshold CASE classifier (ref StreamingCriticalPathAnalyzer.scala:60-87),
    // made total (the reference match is non-exhaustive; SURVEY §2.1-G).
    QueryDef("q14_classifier",
      (s, d) => Tables.orders(s, d)
        .withColumn("state", graft.ops.Classify.slaState(
          brt = col("o_totalprice"), ct = col("o_totalprice") * 0.8, sla = lit(400000.0)))
        .groupBy(col("state"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("state"),
      Some("""SELECT CASE WHEN o_totalprice <= 0.3::DOUBLE * 400000.0::DOUBLE THEN 'OVERPROVISIONED'
                          WHEN o_totalprice <= 0.7::DOUBLE * 400000.0::DOUBLE THEN 'OPTIMUM'
                          WHEN o_totalprice * 0.8 <= 0.7::DOUBLE * 400000.0::DOUBLE THEN 'UNDERPROVISIONED'
                          ELSE 'UNHEALTHY' END AS state,
                     count(*) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
              FROM orders GROUP BY 1 ORDER BY state""")),

    // Q26 — as-of join (beyond the reference, builder brief): for each
    // event, the latest order of the same customer at or before the event.
    // Union + ignore-nulls running-last window — one shuffle, no range probe.
    // The oracle mirrors the same formulation (DuckDB's ASOF JOIN leaves
    // ties unspecified; this pins greatest-order-key-wins).
    QueryDef("q26_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"), col("event_id"), col("ms"))
        val ord = Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"),
          col("o_totalprice"))
        graft.ops.TemporalJoins.joinAsOf(
          ev, "user_id", "ms", "event_id",
          ord, "o_custkey", "order_ms", "o_orderkey",
          valueCols = Seq("o_orderkey", "o_totalprice"))
          .select(col("event_id"), col("user_id"), col("ms"),
            col("o_orderkey").as("last_order_key"),
            col("o_totalprice").as("last_order_price"))
          .orderBy("event_id")
      },
      Some("""WITH u AS (
                SELECT user_id AS k, epoch_ms(ts) AS t, 1 AS tag, event_id AS tie,
                       event_id, user_id, epoch_ms(ts) AS ms,
                       NULL::BIGINT AS okey, NULL::DOUBLE AS oprice
                FROM events
                UNION ALL
                SELECT o_custkey, epoch_ms(o_orderdate), 0, o_orderkey,
                       NULL, NULL, NULL, o_orderkey, o_totalprice
                FROM orders),
              c AS (
                SELECT *,
                  last_value(okey IGNORE NULLS) OVER w AS last_order_key,
                  last_value(oprice IGNORE NULLS) OVER w AS last_order_price
                FROM u
                WINDOW w AS (PARTITION BY k ORDER BY t, tag, tie
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              SELECT event_id, user_id, ms, last_order_key, last_order_price
              FROM c WHERE tag = 1 ORDER BY event_id""")),

    // Q27 — range join (beyond the reference): per event, how many events of
    // the same user fall in the following hour (incl. itself). Bucketed
    // equi-join — each left row probes two hour-aligned buckets — no
    // nested loop.
    QueryDef("q27_range_join",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"), col("event_id"), col("ms"))
        val other = Tables.events(s, d)
          .select(col("user_id").as("o_user"), col("ms").as("o_ms"))
        graft.ops.TemporalJoins.joinRange(
          ev, "user_id", "ms",
          other, "o_user", "o_ms",
          windowMs = 3600000L)
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_near"))
          .orderBy("event_id")
      },
      Some("""SELECT a.event_id, count(*) AS n_near
              FROM events a JOIN events b
                ON b.user_id = a.user_id
               AND epoch_ms(b.ts) >= epoch_ms(a.ts)
               AND epoch_ms(b.ts) < epoch_ms(a.ts) + 3600000
              GROUP BY 1 ORDER BY 1""")),

    // Q15a — top-k (ref JobOverlapHelper.scala:87; TakeOrderedAndProject at scale)
    QueryDef("q15_topk",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM
              (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10) t
              ORDER BY o_orderkey""")),

    // Q15b — keep-last-N per group (ref QueryInsightsManager.scala:241-243)
    QueryDef("q15_keep_last_n",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"),
                  unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"), col("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS order_ms, rn FROM
              (SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders) t
              WHERE rn <= 3 ORDER BY o_custkey, rn"""))
  )
}
