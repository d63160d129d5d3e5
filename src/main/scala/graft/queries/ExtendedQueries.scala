package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Canon._

/** Declared query surface Q16–Q25 (SURVEY.md §2.3) — the general-surface
  * operators the reference lacks but a capability-parity engine must expose
  * (SURVEY §2.2): distinct/collect_set, timestamp arithmetic, string
  * split/extract, JSON render/parse, max_by, set operations, rollup, ranking
  * windows + frames, count-distinct, and time-bucket windows.
  *
  * Scale notes: all are single-shuffle groupBy/window plans; the windows
  * partition by real keys (event_type/user_id), never a global ORDER BY
  * without PARTITION BY except the final small-result determinism sorts.
  */
object ExtendedQueries {

  private def events(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)

  val defs: Seq[QueryDef] = Seq(

    // Q16a — distinct (ref MicroBatchContext.scala:123-129)
    QueryDef("q16_distinct",
      (s, d) => events(s, d).select(col("user_id")).distinct().orderBy("user_id"),
      Some("SELECT DISTINCT user_id FROM events ORDER BY user_id")),

    // Q16b — collect_set canonicalized to a sorted comma-joined string: the
    // driver's comparator sorts columns in pandas, which cannot hash an array
    // cell, so the set rides as one deterministic scalar per group.
    QueryDef("q16_collect_set",
      (s, d) => events(s, d)
        .groupBy(col("event_type"))
        .agg(expr("array_join(transform(sort_array(collect_set(user_id)), x -> cast(x as string)), ',')").as("users"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
                     array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users,
                     count(DISTINCT user_id) AS n_users
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Q17 — timestamp parse/arithmetic + duration format
    // (ref StreamingQueryAnalyzer.scala:118-141; QueryInsightsManager.scala:228-232)
    QueryDef("q17_time_arith",
      (s, d) => {
        val durMs = expr("cast(round(value * 1000) as long)")
        events(s, d).select(
          col("event_id"),
          col("ms"),
          unix_millis(date_trunc("hour", timestamp_millis(col("ms")))).as("hour_ms"),
          concat(
            lpad(expr("cast(round(value * 1000) as long) div 1000").cast("string"), 2, "0"), lit("s "),
            lpad((durMs % 1000).cast("string"), 3, "0"), lit("ms")).as("dur"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, epoch_ms(ts) AS ms,
                     epoch_ms(date_trunc('hour', ts)) AS hour_ms,
                     lpad(CAST(CAST(round(value * 1000) AS BIGINT) // 1000 AS VARCHAR), 2, '0')
                       || 's ' ||
                     lpad(CAST(CAST(round(value * 1000) AS BIGINT) % 1000 AS VARCHAR), 3, '0')
                       || 'ms' AS dur
              FROM events ORDER BY event_id""")),

    // Q18 — string split/extract (ref BatchDescription.scala:28-39)
    QueryDef("q18_string_ops",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        element_at(split(col("text"), " "), 1).as("first_word"),
        element_at(split(col("text"), " "), -1).as("last_word"),
        length(col("text")).as("n_chars_calc"),
        upper(substring(col("text"), 1, 10)).as("head10"),
        regexp_extract(col("source"), "(\\d+)", 1).as("src_num"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     string_split(text, ' ')[1] AS first_word,
                     string_split(text, ' ')[-1] AS last_word,
                     length(text) AS n_chars_calc,
                     upper(substr(text, 1, 10)) AS head10,
                     coalesce(regexp_extract(source, '(\d+)', 1), '') AS src_num
              FROM documents ORDER BY doc_id""")),

    // Q19 — JSON render + parse (ref StreamingLensReportingHelper.scala:80-92).
    // Parse side is a SCHEMA'D from_json — one parse per row into a typed
    // struct — not per-field get_json_object walks (each walk re-parses the
    // whole document; with N extracted fields that is N full parses: the
    // difference between one SerDe pass and N at 100 TB).
    QueryDef("q19_json",
      (s, d) => events(s, d).select(
        col("event_id"),
        to_json(struct(col("event_id"), col("event_type"))).as("js"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                     CAST(to_json(struct_pack(event_id := event_id, event_type := event_type)) AS VARCHAR) AS js,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events ORDER BY event_id""")),

    // Q20 — last-value gauge via max_by (ref StreamingLensMetricsReporter.scala:66-68);
    // the struct ordering key makes the pick total even on timestamp ties.
    QueryDef("q20_max_by",
      (s, d) => events(s, d)
        .groupBy(col("user_id"))
        .agg(max_by(col("value"), struct(col("ms"), col("event_id"))).as("last_value"),
             max(col("ms")).as("last_ms"))
        .orderBy("user_id"),
      Some("""SELECT user_id, value AS last_value, last_ms FROM (
                SELECT user_id, value,
                       max(epoch_ms(ts)) OVER (PARTITION BY user_id) AS last_ms,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
                FROM events) t
              WHERE rn = 1 ORDER BY user_id""")),

    // Q21 — set operations (absent in ref, SURVEY §2.2)
    QueryDef("q21_set_ops",
      (s, d) => {
        val o = Tables.orders(s, d)
        val a = o.filter(col("o_totalprice") > 200000).select(col("o_custkey"))
        val b = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        a.intersect(b).withColumn("op", lit("intersect"))
          .union(a.except(b).withColumn("op", lit("except")))
          .union(a.union(b).distinct().withColumn("op", lit("union")))
          .select(col("op"), col("o_custkey"))
          .orderBy("op", "o_custkey")
      },
      Some("""WITH a AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
                   b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
              SELECT 'intersect' AS op, o_custkey FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
              UNION ALL
              SELECT 'except' AS op, o_custkey FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
              UNION ALL
              SELECT 'union' AS op, o_custkey FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
              ORDER BY op, o_custkey""")),

    // Q22 — rollup (absent in ref, SURVEY §2.2)
    QueryDef("q22_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
                     count(*) AS n
              FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // Q23 — ranking windows + frames (absent in ref, SURVEY §2.2)
    QueryDef("q23_rank_windows",
      (s, d) => {
        val byVal = Window.partitionBy(col("event_type"))
          .orderBy(col("value").desc, col("event_id").asc)
        val byTime = Window.partitionBy(col("event_type"))
          .orderBy(col("ms").asc, col("event_id").asc)
        events(s, d).select(
          col("event_id"), col("event_type"),
          rank().over(byVal).as("rnk"),
          dense_rank().over(byVal).as("drnk"),
          round(lag(col("value"), 1).over(byTime), 4).as("prev_value"),
          round(lead(col("value"), 1).over(byTime), 4).as("next_value"),
          round(avg(col("value")).over(byTime.rowsBetween(-2, 0)), 4).as("mov_avg"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type,
                     rank() OVER wv AS rnk,
                     dense_rank() OVER wv AS drnk,
                     round(lag(value, 1) OVER wt, 4) AS prev_value,
                     round(lead(value, 1) OVER wt, 4) AS next_value,
                     round(avg(value) OVER (PARTITION BY event_type
                       ORDER BY epoch_ms(ts), event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
              FROM events
              WINDOW wv AS (PARTITION BY event_type ORDER BY value DESC, event_id),
                     wt AS (PARTITION BY event_type ORDER BY epoch_ms(ts), event_id)
              ORDER BY event_id""")),

    // Q24a — exact count-distinct (hash-matched)
    QueryDef("q24_count_distinct",
      (s, d) => events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Q24b — approx_count_distinct (HLL++); engine-estimate differs from
    // DuckDB's sketch, so no oracle — driver records a rows-only check.
    QueryDef("q24_approx_distinct",
      (s, d) => events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
             countDistinct(col("user_id")).as("exact_users"))
        .orderBy("event_type"),
      None),

    // Q28 — correlated-subquery shape (orders above their customer's mean),
    // decorrelated as a window aggregate: one shuffle on the key instead of
    // a per-row subquery.
    QueryDef("q28_above_customer_avg",
      (s, d) => {
        import org.apache.spark.sql.types.{DecimalType, DoubleType}
        val w = Window.partitionBy(col("o_custkey"))
        // exact decimal sum / count instead of avg(): double summation order
        // differs across engines and flips the round-4 digit (Canon.dsum
        // pattern)
        val custAvg = sum(col("o_totalprice").cast(DecimalType(30, 6))).over(w)
          .cast(DoubleType) / count(lit(1)).over(w)
        Tables.orders(s, d)
          .withColumn("cust_avg", custAvg)
          .filter(col("o_totalprice") > col("cust_avg"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            // floor(x*1e4+0.5) idiom: round() disagrees across engines on
            // half-boundary doubles
            (floor(col("cust_avg") * 10000.0 + 0.5) / 10000.0).as("cust_avg"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
                     floor(cust_avg * 10000.0 + 0.5) / 10000.0 AS cust_avg
              FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (PARTITION BY o_custkey) AS DOUBLE)
                             / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
                    FROM orders) t
              WHERE o_totalprice > cust_avg
              ORDER BY o_orderkey""")),

    // Q29 — pivot: per-user event-type count matrix (wide-format report, the
    // transpose shape absent in the reference; values pinned so the output
    // schema is static and plannable).
    QueryDef("q29_pivot",
      (s, d) => events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy("user_id"),
      Some("""SELECT user_id,
                     count(*) FILTER (WHERE event_type = 'click') AS click,
                     count(*) FILTER (WHERE event_type = 'error') AS error,
                     count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                     count(*) FILTER (WHERE event_type = 'signup') AS signup,
                     count(*) FILTER (WHERE event_type = 'view') AS view
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // Q30 — exact interpolated percentiles per group (order statistics are
    // engine-comparable, unlike accumulation-order-sensitive sums; floor
    // idiom guards the last rounded digit).
    QueryDef("q30_percentiles",
      (s, d) => events(s, d)
        .groupBy(col("event_type"))
        .agg(
          (floor(expr("percentile(value, 0.5)") * 10000.0 + 0.5) / 10000.0).as("p50"),
          (floor(expr("percentile(value, 0.95)") * 10000.0 + 0.5) / 10000.0).as("p95"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
                     floor(quantile_cont(value, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
                     floor(quantile_cont(value, 0.95) * 10000.0 + 0.5) / 10000.0 AS p95,
                     count(*) AS n
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Q30b — approx percentiles: the operator a 100 TB user actually calls
    // (exact `percentile` buffers every value per group; the approx sketch
    // is bounded-memory and merge-combinable). The estimate is
    // engine-specific, so no oracle — rows-only, pinned by the gate below.
    QueryDef("q30_approx_percentiles",
      (s, d) => events(s, d)
        .groupBy(col("event_type"))
        .agg(
          expr("approx_percentile(value, 0.5, 1000)").as("ap50"),
          expr("approx_percentile(value, 0.95, 1000)").as("ap95"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      None),

    // Q30c — the approx-percentile error-bound GATE (the q24/x19 pattern),
    // stated on RANKS, the sketch's actual contract: accuracy=1000 bounds
    // rank error at 1/1000, so the returned value's rank interval
    // [#(v < ap)/n, #(v <= ap)/n] must straddle the target percentile
    // within +/-0.02 (20x slack). A value-window gate would false-fail on
    // small/gappy groups: approx_percentile returns a DATA value while
    // exact `percentile` interpolates between ranks. One boolean row,
    // hash-matched against a constant-true oracle.
    QueryDef("q30_approx_percentile_gate",
      (s, d) => {
        // null values are invisible to approx_percentile, so they must be
        // invisible to the rank denominators too — filter once, up front,
        // on BOTH sides (a >4% null fraction would otherwise deflate le50
        // below the bound and false-fail the constant-true oracle)
        val nonNull = events(s, d).filter(col("value").isNotNull)
        val ap = nonNull
          .groupBy(col("event_type"))
          .agg(expr("approx_percentile(value, 0.5, 1000)").as("ap50"),
               expr("approx_percentile(value, 0.95, 1000)").as("ap95"))
        nonNull.join(broadcast(ap), "event_type")
          .groupBy(col("event_type"))
          .agg(
            (sum(when(col("value") < col("ap50"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("lt50"),
            (sum(when(col("value") <= col("ap50"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("le50"),
            (sum(when(col("value") < col("ap95"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("lt95"),
            (sum(when(col("value") <= col("ap95"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("le95"))
          .agg(coalesce(
            expr("every(lt50 <= 0.52 AND le50 >= 0.48 AND " +
              "lt95 <= 0.97 AND le95 >= 0.93)"),
            lit(true)).as("approx_percentile_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS approx_percentile_ok")),

    // Q31 — skew-safe two-phase salted aggregation (graft.ops.Skew): the
    // pre-cast to decimal makes the partial sums associative, so the salted
    // result is bit-identical to a direct GROUP BY — which is exactly what
    // the oracle computes.
    QueryDef("q31_salted_agg",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val in = Tables.lineitem(s, d).select(
          col("l_suppkey"), col("l_quantity").cast(DecimalType(30, 6)).as("q"))
        graft.ops.Skew.saltedSumCount(in, "l_suppkey", "q")
          .select(col("l_suppkey"), col("sum").cast("double").as("sum_qty"), col("n"))
          .orderBy("l_suppkey")
      },
      Some("""SELECT l_suppkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
                     count(*) AS n
              FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""")),

    // Q32 — skew-safe salted equi-join, PROFILE-DRIVEN (graft.ops.Skew
    // .autoSaltedJoin): the x133 skew profile decides whether salting is
    // worth its replication cost — l_orderkey is uniform, so on this
    // fixture the operator takes the plain-join path (SkewSpec pins the
    // salted path on a skewed fixture). Row-identical to the plain join
    // the oracle runs either way; ties in the determinism sort are exact
    // duplicate rows, so order within them cannot affect the value compare.
    QueryDef("q32_salted_join",
      (s, d) => {
        val big = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
        val small = Tables.orders(s, d)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        graft.ops.Skew.autoSaltedJoin(big, small, "l_orderkey")
          .orderBy("l_orderkey", "l_quantity", "o_orderpriority")
      },
      Some("""SELECT l_orderkey, l_quantity, o_orderpriority
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              ORDER BY 1, 2, 3""")),

    // Q25a — tumbling time window (README micro-batch premise, README.md:5)
    QueryDef("q25_tumbling_window",
      (s, d) => events(s, d)
        .groupBy(window(timestamp_millis(col("ms")), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_millis(col("window.start")).as("win_start_ms"),
                col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start_ms", "event_type"),
      Some("""SELECT (epoch_ms(ts) // 600000) * 600000 AS win_start_ms, event_type,
                     count(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
              FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Q25b — sliding window 10min/5min: each event lands in exactly two
    // windows (floor-to-5min and that minus 5min), mirrored in the oracle.
    QueryDef("q25_sliding_window",
      (s, d) => events(s, d)
        .groupBy(window(timestamp_millis(col("ms")), "10 minutes", "5 minutes"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("window.start")).as("win_start_ms"),
                col("event_type"), col("n"))
        .orderBy("win_start_ms", "event_type"),
      Some("""WITH b AS (SELECT (epoch_ms(ts) // 300000) * 300000 AS w1, event_type FROM events),
                   x AS (SELECT w1 AS ws, event_type FROM b
                         UNION ALL SELECT w1 - 300000, event_type FROM b)
              SELECT ws AS win_start_ms, event_type, count(*) AS n
              FROM x GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
