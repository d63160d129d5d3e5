package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier scheduling — the step between URL canonicalization
  * (x200) / frontier dedup (x201) and the fetcher fleet: decide WHAT to
  * fetch in what order without hammering any single host.
  */
object Crawl {

  /** Politeness-wave assignment: within each host, rank URLs by
    * (`prioCol` desc, `urlCol` asc — a total order, so the schedule is
    * a pure function of the frontier), then cut the ranking into waves
    * of `perHostPerWave` URLs. A polite fetcher fleet processes wave 0
    * across ALL hosts, then wave 1, … — every host serves at most
    * `perHostPerWave` fetches per round regardless of how skewed the
    * frontier is toward one domain. Output: (`host`, `url`, `prio`,
    * `host_rank` 1-based, `wave` 0-based).
    *
    * Scale: ONE shuffle keyed on host; the rank window is
    * host-partitioned (never global). A mega-host (the en.wikipedia case
    * — one host holding a double-digit share of the frontier) serializes
    * its own ranking onto one task: if that bites, cap the frontier per
    * host FIRST (`maxPerHost`). The cap plans as a two-phase
    * WindowGroupLimit (measured, SOAK.md frontier-skew): each MAP
    * partition truncates a host's rows to the cap BEFORE the shuffle, so
    * the straggler task's input is bounded by cap × map-partitions
    * instead of the host's full frontier — the property that matters
    * when one host holds billions of URLs. The price is an extra
    * map-side sort pass: at a 300k-row mega host (10× soak) that
    * overhead DOMINATES (capped 2.0 s vs uncapped 0.3 s, both flat in
    * data size), so leave the cap off until per-host cardinality
    * threatens task memory; the politeness schedule itself is inherently
    * a per-host sequence either way. */
  def frontierWaves(urls: DataFrame,
                    hostCol: String = "host",
                    urlCol: String = "url",
                    prioCol: String = "prio",
                    perHostPerWave: Int = 8,
                    maxPerHost: Int = Int.MaxValue): DataFrame = {
    require(perHostPerWave > 0,
      s"frontierWaves: perHostPerWave must be positive, got $perHostPerWave")
    require(maxPerHost > 0,
      s"frontierWaves: maxPerHost must be positive, got $maxPerHost")
    Seq(hostCol, urlCol, prioCol).foreach(c =>
      require(urls.columns.contains(c),
        s"frontierWaves needs columns $hostCol, $urlCol, $prioCol; " +
          s"missing '$c'"))
    // the rank window runs over the RENAMED projection below
    val w = Window.partitionBy(col("host"))
      .orderBy(col("prio").desc, col("url"))
    urls
      .select(col(hostCol).as("host"), col(urlCol).as("url"),
        col(prioCol).as("prio"))
      .withColumn("host_rank", row_number().over(w).cast("long"))
      .filter(col("host_rank") <= maxPerHost)
      // floor over an exact small-integer ratio (rank < 2^53): integer
      // wave index without leaving codegen'd arithmetic
      .withColumn("wave",
        floor((col("host_rank") - 1) / lit(perHostPerWave)).cast("long"))
  }
}
