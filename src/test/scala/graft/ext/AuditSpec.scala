package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Audit]]: the profile's canonicalization and the integrity checks'
  * dirty-fixture behavior (the catalog's TPC-H tables audit clean, so the
  * violations are exercised here). */
class AuditSpec extends SparkSpec {

  test("profile reports nulls, cardinality, and canonical min/max per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), Some(2.5), Some(true)),
      (2L, None, Some(-0.25), Some(false)),
      (2L, Some("a"), None, None))
      .toDF("id", "s", "x", "flag")
    val p = Audit.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("flag", "id", "s", "x"))
    p.values.foreach(r => assert(r.getAs[Long]("n_rows") === 3L))
    val id = p("id")
    assert(id.getAs[Long]("n_null") === 0L)
    assert(id.getAs[Long]("n_distinct") === 2L)
    assert(id.getAs[String]("min_c") === "1" && id.getAs[String]("max_c") === "2")
    val s = p("s")
    assert(s.getAs[Long]("n_null") === 1L)
    assert(s.getAs[Long]("n_distinct") === 2L)
    assert(s.getAs[String]("min_c") === "a" && s.getAs[String]("max_c") === "b")
    val x = p("x") // doubles quantize to integer micros
    assert(x.getAs[Long]("n_null") === 1L)
    assert(x.getAs[String]("min_c") === "-250000")
    assert(x.getAs[String]("max_c") === "2500000")
    val f = p("flag") // booleans canonicalize to 0/1
    assert(f.getAs[String]("min_c") === "0" && f.getAs[String]("max_c") === "1")
    // all-null column: min/max are null, distinct 0
    val an = Audit.profile(
      Seq((1L, None: Option[String]), (2L, None)).toDF("id", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(an("v").getAs[Long]("n_null") === 2L)
    assert(an("v").getAs[Long]("n_distinct") === 0L)
    assert(an("v").getAs[String]("min_c") === null)
  }

  test("orphans keeps null and unmatched foreign keys, drops matched ones") {
    import spark.implicits._
    val child = Seq((Some(1L), "a"), (Some(9L), "b"), (None, "c"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 2L).toDF("pk")
    val bad = Audit.orphans(child, "fk", parent, "pk")
      .select("payload").as[String].collect().toSet
    assert(bad === Set("b", "c")) // 9 unmatched, null never matches
    // child and parent sharing the key NAME must not make the join
    // condition ambiguous (the common self-named-id case)
    val sameName = Audit.orphans(
      Seq((1L, "a"), (9L, "b")).toDF("id", "payload"),
      "id", Seq(1L).toDF("id"), "id")
      .select("payload").as[String].collect().toSet
    assert(sameName === Set("b"))
  }

  test("duplicateKeys reports violating key tuples with multiplicity") {
    import spark.implicits._
    val df = Seq((1L, 1, "x"), (1L, 1, "y"), (1L, 2, "z"), (2L, 1, "w"))
      .toDF("k1", "k2", "v")
    val dup = Audit.duplicateKeys(df, Seq("k1", "k2")).collect()
    assert(dup.length === 1)
    assert(dup.head.getAs[Long]("k1") === 1L)
    assert(dup.head.getAs[Int]("k2") === 1)
    assert(dup.head.getAs[Long]("n_rows") === 2L)
  }

  test("profile partials merge to exactly the direct mergeable profile, " +
    "numeric order preserved") {
    import spark.implicits._
    // values chosen so lexicographic merge of renderings would be WRONG:
    // min(9, 10) = 9 numerically but "10" < "9" as strings
    val df = Seq(
      (9L, Some("b"), "g1"), (10L, None, "g2"), (100L, Some("a"), "g2"))
      .toDF("v", "s", "grp")
    val direct = Audit.mergeableProfile(df).collect().map(_.toSeq).toSet
    val rolled = Audit.mergePartials(Audit.profilePartials(df, "grp"))
      .collect().map(_.toSeq).toSet
    assert(rolled === direct)
    val v = Audit.mergePartials(Audit.profilePartials(df, "grp"))
      .filter(col("col_name") === "v").head
    assert(v.getAs[String]("min_c") === "9" && v.getAs[String]("max_c") === "100")
    // merging a SUBSET of partials profiles that subset
    val sub = Audit.mergePartials(
      Audit.profilePartials(df, "grp").filter(col("grp") === "g2"))
      .filter(col("col_name") === "v").head
    assert(sub.getAs[String]("min_c") === "10")
  }

  test("integrity audit matches the catalog tables' real state, orphan " +
    "anti-joins broadcast") {
    val res = graft.SparkEntry.queries("x195_integrity_audit")(
      spark, "/root/testdata/sf0.001")
    val rows = res.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size === 6)
    // referential integrity and null keys are clean in the synthetic data…
    Seq("lineitem_orphan_orderkey", "orders_orphan_custkey",
      "lineitem_null_orderkey", "orders_null_custkey",
      "orders_dup_orderkey").foreach(k =>
      assert(rows(k) === 0L, s"$k nonzero: $rows"))
    // …but the generator REUSES line numbers within an order — a genuine
    // dataset property the audit surfaces (and the DuckDB oracle
    // recomputes exactly). Pin that it is detected, not its magnitude.
    assert(rows("lineitem_dup_line") > 0L, s"dup-line check went blind: $rows")
    // the orphan anti-joins broadcast their key-only parent sides
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val ord = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val plan = Audit.orphans(li, "l_orderkey", ord, "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftanti"), plan)
  }
}
