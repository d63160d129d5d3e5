package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Audit

/** Data-audit catalog entries: the pre-training reads a pipeline runs
  * before committing a corpus to an expensive job — per-column profiling
  * and relational integrity. Library surface in [[graft.ext.Audit]]. */
object AuditQueries {

  private def check(name: String, bad: DataFrame): DataFrame =
    bad.agg(count(lit(1)).as("n_bad"))
      .select(lit(name).as("check_name"), col("n_bad"))

  val defs: Seq[QueryDef] = Seq(

    // x194 — the generic per-column table profile (the DESCRIBE every
    // engine grows): one aggregation pass over lineitem emitting, per
    // column, row/null/exact-distinct counts and canonicalized min/max
    // (integrals as-is, doubles quantized to integer micros — monotone,
    // so min/max commute — timestamps as epoch millis, all rendered as
    // strings for a uniform schema). Exactness: every value the oracle
    // compares is a BIGINT or a raw string; no float ever renders.
    // Scale: one mergeable-stats pass + one long-format distinct pass
    // (never the N-branch multi-distinct Expand — 22× slower measured);
    // the 100 TB form — approx_count_distinct folded into the one
    // mergeable pass — is real code: Audit.approxProfile, catalog x198.
    QueryDef("x194_table_profile",
      (s, d) => ExtShared.profileShared(s, d),
      Some("""WITH l AS (SELECT * FROM lineitem)
              SELECT 'l_discount' AS col_name, count(*) AS n_rows,
                     count(*) - count(l_discount) AS n_null,
                     count(DISTINCT l_discount) AS n_distinct,
                     CAST(min(CAST(round(l_discount * 1000000) AS BIGINT)) AS VARCHAR) AS min_c,
                     CAST(max(CAST(round(l_discount * 1000000) AS BIGINT)) AS VARCHAR) AS max_c
              FROM l
              UNION ALL
              SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
                     count(DISTINCT l_extendedprice),
                     CAST(min(CAST(round(l_extendedprice * 1000000) AS BIGINT)) AS VARCHAR),
                     CAST(max(CAST(round(l_extendedprice * 1000000) AS BIGINT)) AS VARCHAR)
              FROM l
              UNION ALL
              SELECT 'l_linenumber', count(*), count(*) - count(l_linenumber),
                     count(DISTINCT l_linenumber),
                     CAST(min(CAST(l_linenumber AS BIGINT)) AS VARCHAR),
                     CAST(max(CAST(l_linenumber AS BIGINT)) AS VARCHAR)
              FROM l
              UNION ALL
              SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
                     count(DISTINCT l_linestatus), min(l_linestatus), max(l_linestatus)
              FROM l
              UNION ALL
              SELECT 'l_orderkey', count(*), count(*) - count(l_orderkey),
                     count(DISTINCT l_orderkey),
                     CAST(min(CAST(l_orderkey AS BIGINT)) AS VARCHAR),
                     CAST(max(CAST(l_orderkey AS BIGINT)) AS VARCHAR)
              FROM l
              UNION ALL
              SELECT 'l_partkey', count(*), count(*) - count(l_partkey),
                     count(DISTINCT l_partkey),
                     CAST(min(CAST(l_partkey AS BIGINT)) AS VARCHAR),
                     CAST(max(CAST(l_partkey AS BIGINT)) AS VARCHAR)
              FROM l
              UNION ALL
              SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
                     count(DISTINCT l_quantity),
                     CAST(min(CAST(round(l_quantity * 1000000) AS BIGINT)) AS VARCHAR),
                     CAST(max(CAST(round(l_quantity * 1000000) AS BIGINT)) AS VARCHAR)
              FROM l
              UNION ALL
              SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
                     count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag)
              FROM l
              UNION ALL
              SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
                     count(DISTINCT l_shipdate),
                     CAST(min(epoch_ms(l_shipdate)) AS VARCHAR),
                     CAST(max(epoch_ms(l_shipdate)) AS VARCHAR)
              FROM l
              UNION ALL
              SELECT 'l_suppkey', count(*), count(*) - count(l_suppkey),
                     count(DISTINCT l_suppkey),
                     CAST(min(CAST(l_suppkey AS BIGINT)) AS VARCHAR),
                     CAST(max(CAST(l_suppkey AS BIGINT)) AS VARCHAR)
              FROM l
              UNION ALL
              SELECT 'l_tax', count(*), count(*) - count(l_tax),
                     count(DISTINCT l_tax),
                     CAST(min(CAST(round(l_tax * 1000000) AS BIGINT)) AS VARCHAR),
                     CAST(max(CAST(round(l_tax * 1000000) AS BIGINT)) AS VARCHAR)
              FROM l
              ORDER BY col_name""")),

    // x197 — per-shard profile ROLLUP: compute mergeable-profile partials
    // per source (the artifact a 100 TB pipeline persists per shard/day —
    // typed carriers, so the merge orders numerically, never on a string
    // rendering), then merge them WITHOUT touching the data again. The
    // oracle computes the direct whole-table statistics — hash equality IS
    // the proof that rollup ≡ direct, the mergeability contract.
    QueryDef("x197_profile_rollup",
      (s, d) => Audit.mergePartials(
        Audit.profilePartials(Tables.documents(s, d), "source")),
      Some("""SELECT 'doc_id' AS col_name, count(*) AS n_rows,
                     count(*) - count(doc_id) AS n_null,
                     CAST(min(CAST(doc_id AS BIGINT)) AS VARCHAR) AS min_c,
                     CAST(max(CAST(doc_id AS BIGINT)) AS VARCHAR) AS max_c
              FROM documents
              UNION ALL
              SELECT 'lang', count(*), count(*) - count(lang),
                     min(lang), max(lang) FROM documents
              UNION ALL
              SELECT 'n_chars', count(*), count(*) - count(n_chars),
                     CAST(min(CAST(n_chars AS BIGINT)) AS VARCHAR),
                     CAST(max(CAST(n_chars AS BIGINT)) AS VARCHAR)
              FROM documents
              UNION ALL
              SELECT 'source', count(*), count(*) - count(source),
                     min(source), max(source) FROM documents
              UNION ALL
              SELECT 'text', count(*), count(*) - count(text),
                     min(text), max(text) FROM documents
              ORDER BY col_name""")),

    // x194b — streaming profile parity gate: the mergeable profile subset
    // (row/null counts, canonical min/max — everything but exact distinct,
    // which is non-mergeable by nature; streams carry an HLL beside it,
    // the x192 pattern) replayed through a REAL MemoryStream complete-mode
    // aggregation in two uneven chops must converge to the batch
    // mergeableProfile of the same rows — incremental ≡ batch, the x161b
    // discipline on the audit family. Bounded: one documents collect.
    QueryDef("x194b_profile_stream_gate",
      (s, d) => {
        import s.implicits._
        val batch = Tables.documents(s, d).select(
          col("doc_id"), col("n_chars"), col("lang"),
          ((col("doc_id") % 9).cast("double") * lit(0.5)).as("dscore"))
        val expected = Audit.mergeableProfile(batch).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getString(3), r.getString(4))).toSet
        val rows = batch.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        val got = {
          val ss = s.newSession()
          ss.conf.set("spark.sql.shuffle.partitions", "2")
          ss.conf.set("spark.sql.adaptive.enabled", "false")
          implicit val sq: org.apache.spark.sql.SQLContext = ss.sqlContext
          import ss.implicits._
          val mem = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(Long, Long, String, Double)]
          var last: Array[org.apache.spark.sql.Row] = Array.empty
          val q = Audit.mergeableProfile(
              mem.toDF().toDF("doc_id", "n_chars", "lang", "dscore"))
            .writeStream
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              val snap = b.collect(); last = snap; ()
            }
            .outputMode("complete").start()
          try Seq(rows.take(rows.length / 3), rows.drop(rows.length / 3))
            .foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
          finally q.stop()
          last.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getString(3), r.getString(4))).toSet
        }
        Seq((got == expected) && expected.nonEmpty)
          .toDF("profile_stream_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS profile_stream_ok")),

    // x198 — the single-scan approx profile (the documented 100 TB form of
    // x194, made real): mergeable statistics AND HLL++ approx distinct in
    // ONE aggregation pass — no second long-format pass, every statistic
    // partial-aggregates map-side. Rows-only by design: HLL estimates are
    // engine-specific (DuckDB's HLL differs); x198b is the companion gate.
    QueryDef("x198_approx_profile",
      (s, d) => ExtShared.approxProfileShared(s, d),
      None),

    // x198b — approx-profile bound gate (the x99b discipline): the exact
    // x194 profile and the one-scan x198 profile must agree EXACTLY on
    // every mergeable statistic (rows, nulls, min, max), and each HLL
    // distinct estimate must sit within 5×rsd relative error of the exact
    // count (rsd=0.05 → ±25 % — generous because HLL++'s rsd is a standard
    // deviation, not a hard bound; observed error at this scale is < 5 %).
    // Bounded: both sides are the SHARED persisted profile frames (x194's
    // exact rows, x198's approx rows — the gate checks the very frames
    // those entries report), |columns| rows each.
    QueryDef("x198b_approx_profile_gate",
      (s, d) => {
        import s.implicits._
        val rsd = 0.05
        val exact = ExtShared.profileShared(s, d).collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
            r.getLong(3), r.getString(4), r.getString(5)))).toMap
        val approx = ExtShared.approxProfileShared(s, d).collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
            r.getLong(3), r.getString(4), r.getString(5)))).toMap
        val ok = exact.nonEmpty && exact.keySet == approx.keySet &&
          exact.forall { case (c, (n, nn, nd, mn, mx)) =>
            val (an, ann, and, amn, amx) = approx(c)
            an == n && ann == nn && amn == mn && amx == mx &&
              math.abs(and - nd) <= math.max(2.0, 5 * rsd * nd)
          }
        Seq(ok).toDF("approx_profile_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS approx_profile_ok")),

    // x195 — relational integrity audit: orphan foreign keys (NULL FK
    // counts as its own orphan — it can never match), duplicate primary
    // keys, and NULL key columns across the order/customer/lineitem
    // relations, one (check_name, n_bad) row each. All-declarative:
    // anti-joins on pruned key columns (small parent sides broadcast),
    // key-only self-aggregations — the shapes that stay cheap at 100 TB.
    // The synthetic tables audit clean on five of six checks; the sixth —
    // duplicate (l_orderkey, l_linenumber) pairs — is a REAL property of
    // the generator the audit surfaces (oracle recomputes it exactly).
    // Dirty-fixture behavior is pinned in AuditSpec.
    QueryDef("x195_integrity_audit",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        check("lineitem_dup_line",
          Audit.duplicateKeys(li, Seq("l_orderkey", "l_linenumber")))
          .unionByName(check("lineitem_null_orderkey",
            li.filter(col("l_orderkey").isNull)))
          .unionByName(check("lineitem_orphan_orderkey",
            Audit.orphans(li, "l_orderkey", ord, "o_orderkey")))
          .unionByName(check("orders_dup_orderkey",
            Audit.duplicateKeys(ord, Seq("o_orderkey"))))
          .unionByName(check("orders_null_custkey",
            ord.filter(col("o_custkey").isNull)))
          .unionByName(check("orders_orphan_custkey",
            Audit.orphans(ord, "o_custkey", cust, "c_custkey")))
          .orderBy("check_name")
      },
      Some("""SELECT 'lineitem_dup_line' AS check_name,
                     (SELECT count(*) FROM (SELECT l_orderkey, l_linenumber
                        FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1)) AS n_bad
              UNION ALL
              SELECT 'lineitem_null_orderkey',
                     (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
              UNION ALL
              SELECT 'lineitem_orphan_orderkey',
                     (SELECT count(*) FROM lineitem
                      WHERE l_orderkey IS NULL OR l_orderkey NOT IN
                        (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))
              UNION ALL
              SELECT 'orders_dup_orderkey',
                     (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                        GROUP BY 1 HAVING count(*) > 1))
              UNION ALL
              SELECT 'orders_null_custkey',
                     (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
              UNION ALL
              SELECT 'orders_orphan_custkey',
                     (SELECT count(*) FROM orders
                      WHERE o_custkey IS NULL OR o_custkey NOT IN
                        (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL))
              ORDER BY check_name""")),
  )
}
