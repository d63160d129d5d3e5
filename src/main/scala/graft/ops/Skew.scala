package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A hot grouping key routes all its rows to one reduce task; salting
  * splits each key into `buckets` sub-keys aggregated in parallel, then a
  * second (tiny — one row per (key, salt)) aggregation combines the
  * partials. Only algebraic aggregates decompose this way; the helpers
  * below cover the sums/counts/min/max the engine uses. AQE's skew-join
  * handling covers joins; this covers aggregations.
  */
object Skew {

  /** Row-spreading salt: a HASH of the position id, not a row-content hash
    * and not the raw position.
    *   - Not content: byte-identical rows are exactly the classic hot-key
    *     shape (duplicate logs, dedup inputs), and a content hash sends
    *     them all to ONE bucket, silently defeating the salt. It also
    *     never touches column types (a whole-row hash rejects MapType).
    *   - Not raw position: monotonically_increasing_id is partitionId·2³³
    *     + offset, and 2³³ mod any power-of-two bucket count is 0 — raw
    *     mod degrades to offset-in-partition, so many small partitions
    *     would all salt to bucket 0. Hashing first mixes both components.
    * The salt is position-dependent (indeterminate under partition-layout
    * change); Spark re-executes indeterminate map stages wholesale on
    * fetch failure rather than reusing partial output, and every operator
    * here is salt-VALUE-agnostic — the combine phase erases it. */
  private def salt(buckets: Int): Column = {
    require(buckets >= 1, s"salt buckets must be >= 1, got $buckets")
    pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong)).cast("int")
  }

  /** Internal salt column name — underscored + branded so it cannot collide
    * with (or silently drop) a user column. */
  private val SaltCol = "__graft_salt"

  /** sum(valueCol) + count per key, computed skew-safely. Identical result
    * to a direct groupBy — associativity makes the two-phase split exact. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     buckets: Int = 16): DataFrame =
    df
      .withColumn(SaltCol, salt(buckets))
      .groupBy(col(keyCol), col(SaltCol))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pcnt")).as("n"))

  /** Skew-safe equi-join: the hot (big) side gets a row-spreading salt, the
    * small side is replicated across all `buckets` salt values, and the
    * join keys on (key, salt) — so a hot key's rows split across `buckets`
    * reduce tasks instead of landing on one straggler. Row-identical to the
    * plain equi-join (each big row matches exactly the replica carrying its
    * salt); the cost is a `buckets`× blowup of the SMALL side only. AQE's
    * runtime skew split covers moderate cases; this is the explicit form
    * for pipelines that pre-partition or run with AQE off.
    *
    * Default is 8 buckets: enough to split a hot key across 8 reduce tasks
    * (an 8× straggler cut) at half the replication cost of the earlier 16 —
    * a hot key so large that 8-way splitting still straggles warrants an
    * explicit higher bucket count from the caller, measured against the
    * small side's replicated size. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    require(!big.columns.contains(SaltCol) && !small.columns.contains(SaltCol),
      s"input already carries a $SaltCol column")
    val salted = big.withColumn(SaltCol, salt(buckets).cast("int"))
    val replicated = small
      .withColumn(SaltCol, explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** PROFILE-DRIVEN skew-safe equi-join — [[saltedJoin]] with [[skewProfile]]
    * (x133) deciding WHICH keys pay for salting, instead of replicating the
    * small side ×`buckets` unconditionally (16× replication on a uniform
    * corpus bought nothing). One bounded pre-job runs the profile on the
    * big side (a 16-byte-per-key hash aggregate + a `kTop`-row driver
    * collect — the [[graft.ext.Ivf]] sampled-training shape, never corpus
    * rows); the ≤ `kTop` keys with `salt_recommended` become a literal
    * hot-key list:
    *   - no hot keys → the PLAIN equi-join, zero salting overhead
    *     (SkewSpec pins the plan);
    *   - hot keys → only THEIR big-side rows take a spreading salt and only
    *     THEIR small-side rows replicate ×`buckets`; everything else joins
    *     on salt 0 exactly once.
    * Row-identical to the plain join in every case. A key outside the kTop
    * hottest that still exceeds the fair share cannot exist (counts are
    * descending), so the profile's cut is sound. */
  def autoSaltedJoin(big: DataFrame, small: DataFrame, key: String,
                     buckets: Int = 8, parallelism: Int = 32,
                     kTop: Int = 10): DataFrame = {
    require(!big.columns.contains(SaltCol) && !small.columns.contains(SaltCol),
      s"input already carries a $SaltCol column")
    val hot = skewProfile(big, key, kTop, parallelism)
      .filter(col("salt_recommended")).select(col(key)).collect().map(_.get(0))
    if (hot.isEmpty) big.join(small, Seq(key))
    else {
      val salted = big.withColumn(SaltCol,
        when(col(key).isin(hot.toSeq: _*), salt(buckets)).otherwise(lit(0))
          .cast("int"))
      val replicated = small.withColumn(SaltCol,
        explode(when(col(key).isin(hot.toSeq: _*),
          sequence(lit(0), lit(buckets - 1))).otherwise(array(lit(0)))))
      salted.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
    }
  }

  /** min/max per key, skew-safely. */
  def saltedMinMax(df: DataFrame, keyCol: String, valueCol: String,
                   buckets: Int = 16): DataFrame =
    df
      .withColumn(SaltCol, salt(buckets))
      .groupBy(col(keyCol), col(SaltCol))
      .agg(min(col(valueCol)).as("_pmin"), max(col(valueCol)).as("_pmax"))
      .groupBy(col(keyCol))
      .agg(min(col("_pmin")).as("min"), max(col("_pmax")).as("max"))

  /** The key-skew PROFILE that decides whether [[saltedSumCount]]/
    * [[saltedJoin]] are worth their cost before a shuffle is planned: the `kTop` hottest
    * keys with exact row counts, each key's corpus share in exact ppm, and
    * a `salt_recommended` verdict — true when the key's share exceeds
    * `1/parallelism` (a single reduce task would carry more than one
    * task's fair slice, i.e. the key IS a straggler at that width). The
    * verdict compares `n * parallelism > total` in exact integers — no
    * floored-ppm threshold, so it is exact for ANY parallelism, including
    * ones that don't divide 1,000,000 (the reported `share_ppm` column is
    * still floor-divided, display only). One hash aggregate over (key) —
    * 16 bytes a row at any scale — then a kTop-row TakeOrderedAndProject;
    * integer-exact everywhere, so the report hash-matches across
    * engines. */
  def skewProfile(df: DataFrame, keyCol: String, kTop: Int = 10,
                  parallelism: Int = 32): DataFrame = {
    require(kTop >= 1 && parallelism >= 1,
      s"need kTop >= 1 and parallelism >= 1, got $kTop/$parallelism")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("n"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 DIV total AS BIGINT)")
          .as("share_ppm"),
        (expr("CAST(n AS DECIMAL(38,0))") * parallelism > col("total"))
          .as("salt_recommended"))
      .orderBy(col("n").desc, col(keyCol)).limit(kTop)
  }
}
