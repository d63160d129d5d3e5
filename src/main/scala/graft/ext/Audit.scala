package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset auditing: the pre-training data-quality reads a pipeline runs
  * before committing a corpus to an expensive job — a per-column profile
  * (nulls, cardinality, range) and relational integrity checks (orphan
  * foreign keys, duplicate primary keys). Both are plain declarative
  * aggregations: Catalyst sees every filter and join, so the checks ride
  * whatever pushdown/broadcast the table shapes allow.
  *
  * Scale notes: [[profile]] is one aggregation pass for the mergeable
  * statistics plus one long-format pass for the exact distinct counts
  * (explode to (col, value), two-phase aggregate — deliberately NOT a
  * multi-distinct aggregate, whose N-branch Expand multiplies the row
  * count by the column count; see profileFrame). At 100 TB use
  * [[approxProfile]] — HLL distinct folded into the mergeable pass, the
  * whole profile in a single scan — or per-shard sketches (x192 pattern).
  * [[orphans]]/[[duplicateKeys]] are an anti-join and a
  * self-aggregation on the key columns only — column pruning reaches the
  * scan, and a small parent side broadcasts.
  */
object Audit {

  /** Canonical BIGINT-or-STRING rendering for min/max so the profile's
    * schema is uniform across column types AND engine-exact: integrals
    * pass through, floats/doubles quantize to integer micros (monotone, so
    * min/max commute with it), timestamps to epoch millis, booleans to
    * 0/1, strings stay themselves; anything else renders as its string
    * cast. */
  private def canon(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => c.cast("bigint")
    case FloatType | DoubleType =>
      // NaN casts to 0 in non-ANSI mode, which would silently corrupt the
      // min (and the max of an all-negative column) — map it to NULL so
      // the aggregates skip it. ±Infinity and |v| > ~9.2e12 saturate at
      // the BIGINT bounds (non-ANSI double→long cast clamps): a profile
      // min/max of ±Long bounds means "out of micros range", not a value.
      when(isnan(c.cast("double")), lit(null).cast("bigint"))
        .otherwise(round(c.cast("double") * lit(1e6)).cast("bigint"))
    case BooleanType => c.cast("bigint")
    case TimestampType | TimestampNTZType => unix_millis(c.cast("timestamp"))
    case DateType => unix_date(c).cast("bigint")
    case StringType => c
    case _ => c.cast("string")
  }

  /** A value carrier that is INJECTIVE per column — all a distinct count
    * needs — at the cheapest representation per type: integrals/booleans/
    * timestamps/dates as raw 8-byte longs (epoch numbers for temporals —
    * the default timestamp→string cast runs a java.time formatter per
    * value, measured ~25 % of the whole pass on a 3-timestamp table),
    * floats/doubles as raw doubles (Java's round-trip toString was the
    * next-largest cost), strings as themselves; only exotic types pay a
    * string render. One typed slot populates per column; a NULL input
    * stays NULL (never a struct of nulls) so distinct counts keep
    * skipping it. Shared by the exact long-format distinct pass and the
    * HLL pass so both count the same value space. Grouping equality on
    * raw doubles normalizes NaN and -0.0 the same way both engines'
    * distinct hashing does. */
  private def injective(f: StructField): Column = {
    val nl = lit(null).cast("bigint")
    val nd = lit(null).cast("double")
    val ns = lit(null).cast("string")
    val (vl, vd, vs) = f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | BooleanType =>
        (col(f.name).cast("bigint"), nd, ns)
      case TimestampType | TimestampNTZType =>
        (unix_micros(col(f.name).cast("timestamp")), nd, ns)
      case DateType => (unix_date(col(f.name)).cast("bigint"), nd, ns)
      case FloatType | DoubleType => (nl, col(f.name).cast("double"), ns)
      case StringType => (nl, nd, col(f.name))
      case _ => (nl, nd, col(f.name).cast("string"))
    }
    when(col(f.name).isNotNull,
      struct(vl.as("vl"), vd.as("vd"), vs.as("vs")))
  }

  /** Does [[canon]] render this type as a STRING (vs a bigint)? String
    * min/max buffers are not HashAggregate-mutable, and ONE of them in an
    * aggregate list demotes the whole global aggregate to interpreted
    * SortAggregate (the x198 lesson, measured 2.4×) — so the profile
    * passes below split on exactly this predicate. */
  private def canonIsString(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | BooleanType | TimestampType | TimestampNTZType |
         DateType => false
    case _ => true
  }

  /** Per-column profile of `df` in ONE aggregation: row count, null count,
    * exact distinct count, and canonicalized min/max ([[canon]]) rendered
    * as strings. One output row per column, ordered by name. */
  def profile(df: DataFrame): DataFrame = profileFrame(df, distinct = true)

  /** [[profile]] minus the distinct counts — every remaining statistic is
    * MERGEABLE (counts add, min/min and max/max compose), so this form
    * runs as a streaming complete-mode aggregation or a per-shard rollup
    * unchanged. Exact distinct is the one non-mergeable read: in streams
    * or shard rollups carry an HLL sketch beside it (the x192 pattern)
    * instead. */
  def mergeableProfile(df: DataFrame): DataFrame =
    profileFrame(df, distinct = false)

  /** The 100 TB form of [[profile]], made real rather than a comment: ONE
    * aggregation pass computing the mergeable statistics AND an HLL++
    * `approx_count_distinct` per column (itself mergeable — partial
    * aggregation combines sketches map-side), so the whole profile is a
    * single scan with no second long-format distinct pass. Same schema as
    * [[profile]]; `n_distinct` is approximate with relative standard
    * deviation `rsd` (HLL++ guarantee — probabilistic, not a hard bound;
    * the x198b catalog gate checks it against the exact pass). Each
    * column's HLL hashes its own cheapest injective representation —
    * bigint for integrals/temporals, raw double, the string itself —
    * which counts the same value space as the exact pass's [[injective]]
    * struct carrier (the per-type slot mapping is injective) without
    * paying a struct projection+hash per row in the aggregate. */
  def approxProfile(df: DataFrame, rsd: Double = 0.05): DataFrame = {
    val fields = df.schema.fields.toSeq.sortBy(_.name)
    require(fields.nonEmpty, "approxProfile of a zero-column frame")
    def acdChild(f: StructField): Column = f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | BooleanType =>
        col(f.name).cast("bigint")
      case TimestampType | TimestampNTZType =>
        unix_micros(col(f.name).cast("timestamp"))
      case DateType => unix_date(col(f.name)).cast("bigint")
      case FloatType | DoubleType => col(f.name).cast("double")
      case StringType => col(f.name)
      case _ => col(f.name).cast("string")
    }
    // Counts + HLL sketches + NUMERIC-canon min/max in one codegen'd
    // HashAggregate pass (HLL++ buffers are fixed-width, so they stay
    // hash-aggregable); STRING-canon min/max — the buffers that demote a
    // global aggregate to interpreted SortAggregate — run as a second
    // column-pruned pass over just those columns, crossJoined back (both
    // are one-row frames). See [[canonIsString]].
    val strFields =
      if (df.isStreaming) Seq.empty[StructField]
      else fields.filter(f => canonIsString(f.dataType))
    val splitSet = strFields.map(_.name).toSet
    // Fan-out + ReuseExchange: see profileFrame.
    val src = Par.fanOutScan(df)
    val aggsA = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        (count(lit(1)) - count(c)).as(s"${f.name}__nnull"),
        approx_count_distinct(acdChild(f), rsd).as(s"${f.name}__nd")) ++
        (if (splitSet.contains(f.name)) Nil
         else Seq(
           min(canon(c, f.dataType)).cast("string").as(s"${f.name}__min"),
           max(canon(c, f.dataType)).cast("string").as(s"${f.name}__max")))
    }
    val one0 = src.agg(aggsA.head, aggsA.tail: _*)
    val one =
      if (strFields.isEmpty) one0
      else {
        val aggsB = strFields.flatMap { f =>
          val c = col(f.name)
          Seq(
            min(canon(c, f.dataType)).cast("string").as(s"${f.name}__min"),
            max(canon(c, f.dataType)).cast("string").as(s"${f.name}__max"))
        }
        one0.crossJoin(src.agg(aggsB.head, aggsB.tail: _*))
      }
    one
      .select(explode(array(fields.map(f => struct(
        lit(f.name).as("col_name"),
        col(s"${f.name}__n").as("n_rows"),
        col(s"${f.name}__nnull").as("n_null"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__min").as("min_c"),
        col(s"${f.name}__max").as("max_c"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy("col_name")
  }

  private def profileFrame(df: DataFrame, distinct: Boolean): DataFrame = {
    val fields = df.schema.fields.toSeq.sortBy(_.name)
    require(fields.nonEmpty, "profile of a zero-column frame")
    // Same split as approxProfile: counts + numeric-canon min/max stay in
    // one codegen'd HashAggregate; string-canon min/max (SortAggregate-
    // forcing buffers) run as a second column-pruned pass, crossJoined
    // back (both one-row frames). See [[canonIsString]]. STREAMING frames
    // keep the original single aggregate: a complete-mode stream supports
    // exactly one aggregation (x194b runs mergeableProfile that way), and
    // the SortAggregate penalty is per-micro-batch increments there, not
    // a corpus scan. Both shapes compute identical rows.
    val strFields =
      if (df.isStreaming) Seq.empty[StructField]
      else fields.filter(f => canonIsString(f.dataType))
    val splitSet = strFields.map(_.name).toSet
    // Fan a starved single-split scan out across the cores (no-op for
    // streams and for well-split 100 TB inputs); the identical exchange
    // subtree under every pass below is deduped by ReuseExchange, so the
    // source is scanned+shuffled once however many passes consume it.
    val src = Par.fanOutScan(df)
    val aggsA = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        (count(lit(1)) - count(c)).as(s"${f.name}__nnull")) ++
        (if (splitSet.contains(f.name)) Nil
         else Seq(
           min(canon(c, f.dataType)).cast("string").as(s"${f.name}__min"),
           max(canon(c, f.dataType)).cast("string").as(s"${f.name}__max")))
    }
    val one = {
      val a = src.agg(aggsA.head, aggsA.tail: _*)
      if (strFields.isEmpty) a
      else {
        val aggsB = strFields.flatMap { f =>
          val c = col(f.name)
          Seq(
            min(canon(c, f.dataType)).cast("string").as(s"${f.name}__min"),
            max(canon(c, f.dataType)).cast("string").as(s"${f.name}__max"))
        }
        a.crossJoin(src.agg(aggsB.head, aggsB.tail: _*))
      }
    }
    val stats = one.select(explode(array(fields.map(f => struct(
        lit(f.name).as("col_name"),
        col(s"${f.name}__n").as("n_rows"),
        col(s"${f.name}__nnull").as("n_null"),
        col(s"${f.name}__min").as("min_c"),
        col(s"${f.name}__max").as("max_c"))): _*)).as("p"))
      .select(col("p.*"))
    if (!distinct) return stats.orderBy("col_name")
    // Exact distincts via ONE long-format pass, NOT a multi-distinct
    // aggregate: N countDistinct columns in one agg plan as an N-branch
    // Expand (row count × column count with every branch dragging the
    // whole aggregate list — measured 22 s on 600 k × 11 columns where
    // this shape runs in ~1 s). Values render via [[injective]], then
    // two-phase aggregate: (col, value) partial-dedups map-side, count
    // per col.
    val kv = src.select(explode(array(fields.map(f => struct(
        lit(f.name).as("c"),
        injective(f).as("v"))): _*)).as("kv"))
      .select(col("kv.c").as("c"), col("kv.v").as("v"))
    val distincts = kv.groupBy(col("c"))
      .agg(count_distinct(col("v")).as("n_distinct"))
    stats.join(distincts, stats("col_name") === distincts("c"), "left")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_c"), col("max_c"))
      .orderBy("col_name")
  }

  /** Per-group mergeable-profile PARTIALS: for each `groupCol` value and
    * each column, the row/null counts and canonical min/max — numeric
    * canonicals in typed BIGINT carrier columns, strings in their own, so
    * the later merge orders numerically, never lexicographically on a
    * rendering ("10" < "9" is the trap). This is the per-shard/per-day
    * artifact a 100 TB pipeline persists; [[mergePartials]] rolls any
    * subset up without touching the data again. */
  def profilePartials(df: DataFrame, groupCol: String): DataFrame = {
    require(df.columns.contains(groupCol),
      s"profilePartials: no '$groupCol' column in ${df.columns.mkString(",")}")
    val fields = df.schema.fields.toSeq.sortBy(_.name)
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val isStr = f.dataType == StringType
      val k = canon(c, f.dataType)
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        (count(lit(1)) - count(c)).as(s"${f.name}__nnull"),
        (if (isStr) lit(null).cast("bigint") else min(k))
          .as(s"${f.name}__minb"),
        (if (isStr) lit(null).cast("bigint") else max(k))
          .as(s"${f.name}__maxb"),
        (if (isStr) min(k) else lit(null).cast("string"))
          .as(s"${f.name}__mins"),
        (if (isStr) max(k) else lit(null).cast("string"))
          .as(s"${f.name}__maxs"))
    }
    df.groupBy(col(groupCol).as("__group"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__group"), explode(array(fields.map(f => struct(
        lit(f.name).as("col_name"),
        col(s"${f.name}__n").as("n_rows"),
        col(s"${f.name}__nnull").as("n_null"),
        col(s"${f.name}__minb").as("min_b"),
        col(s"${f.name}__maxb").as("max_b"),
        col(s"${f.name}__mins").as("min_s"),
        col(s"${f.name}__maxs").as("max_s"))): _*)).as("p"))
      .select(col("__group").as(groupCol), col("p.*"))
  }

  /** Roll [[profilePartials]] up to the [[mergeableProfile]] shape:
    * counts add, mins/maxes compose on the TYPED carriers, and only the
    * merged result renders to the uniform string schema. Merging every
    * group reproduces the direct whole-table profile exactly (the x197
    * oracle contract); merging a subset profiles that subset. */
  def mergePartials(partials: DataFrame): DataFrame =
    partials.groupBy(col("col_name"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_null")).as("n_null"),
        min(col("min_b")).as("min_b"), max(col("max_b")).as("max_b"),
        min(col("min_s")).as("min_s"), max(col("max_s")).as("max_s"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        coalesce(col("min_b").cast("string"), col("min_s")).as("min_c"),
        coalesce(col("max_b").cast("string"), col("max_s")).as("max_c"))
      .orderBy("col_name")

  /** Child rows whose `childKey` has no match in `parent.parentKey` — the
    * orphan-foreign-key frame, NULL keys included (a NULL FK can never
    * match and is its own violation). Anti-join on the key columns only. */
  def orphans(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
    // own alias for the parent key: childKey == parentKey (the common
    // self-named-id case) would otherwise make the join condition
    // ambiguous between the two sides
    val keys = parent.select(col(parentKey).as("__graft_parent_key"))
      .na.drop().distinct()
    child.join(keys,
      child(childKey) === keys("__graft_parent_key"), "left_anti")
  }

  /** Key tuples appearing more than once — the duplicate-primary-key
    * frame: one row per violating key with its multiplicity. */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "duplicateKeys needs at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)
  }
}
