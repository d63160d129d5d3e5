package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Curation, Dedup, Export, Ivf, Multimodal, Pack, Retrieval, Similarity, TextAnalysis}

/** LLM-training-data-pipeline query surface over `documents` and
  * `embeddings` (builder brief; SURVEY.md §7.2 step 5): deduplication
  * (exact, n-gram Jaccard, MinHash-LSH, SimHash), similarity search
  * (brute-force + LSH), text analysis (tokens, language-ID, quality,
  * fingerprints), and multimodal binary plumbing.
  *
  * Engine-specific hashing (xxhash64, CRC32, LSH hyperplanes) cannot be
  * mirrored in DuckDB, so those queries carry no oracle (driver records a
  * rows-only check) and are pinned by unit tests instead; everything else
  * hash-matches an oracle.
  */
object ExtQueries {

  /** Shared oracle for x07/x08: exact word-3-gram Jaccard pairs ≥ 0.6.
    * x08's LSH path exact-verifies candidates with recall 1−(1−j²)^32
    * (≈ 1 − 6e-7 at j=0.6), so both produce the identical pair set. */
  private val jaccardOracle =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
       s AS (SELECT doc_id,
               list_distinct(list_transform(range(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
             FROM t WHERE len(toks) >= 3),
       z AS (SELECT doc_id, len(sh) AS n FROM s),
       e AS (SELECT doc_id, unnest(sh) AS g FROM s),
       p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
             FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
       SELECT ia, ib, round(CAST(inter AS DOUBLE) / (za.n + zb.n - inter), 4) AS jacc
       FROM p JOIN z za ON za.doc_id = p.ia JOIN z zb ON zb.doc_id = p.ib
       WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6
       ORDER BY ia, ib"""

  /** Shared CTE prefix of the x138/x139 DSIR oracles: hashed unigram+bigram
    * feature buckets (md5 hex-cast — bit-identical to Spark's
    * conv(substring(md5,1,6),16,10)), Laplace log-ratio per bucket in
    * integer micro-nats. */
  private val dsirOracleBase =
    """WITH d AS (SELECT doc_id, (lang = 'en') AS tgt,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE length(trim(text)) > 0),
          f AS (SELECT doc_id, tgt,
                  unnest(list_concat(toks,
                    list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1]))) AS g
                FROM d),
          h AS (SELECT doc_id, tgt,
                  CAST(('0x' || substr(md5(g), 1, 6))::BIGINT % 4096
                       AS BIGINT) AS b
                FROM f),
          c AS (SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
                  count(*) AS cr FROM h GROUP BY b),
          t AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM c),
          lr AS (SELECT b,
                   CAST(round((ln((ct + 1) / (CAST(tt AS DOUBLE) + 4096.0))
                               - ln((cr + 1) / (CAST(tr AS DOUBLE) + 4096.0)))
                              * 1e6) AS BIGINT) AS q
                 FROM c CROSS JOIN t)"""

  /** 32-token chunks at stride 24, chunk index carried — shared by x22
    * (chunk emission) and x38 (boilerplate-chunk detection).
    * posexplode_outer + null filter on the OUTPUT attribute (the
    * InferFiltersFromGenerate dodge — see Dedup.explodedShingles). */
  private def tokenChunks(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        when(size(col("toks")) > 0,
          expr("""transform(sequence(0, cast(floor((size(toks) - 1) / 24) as int)),
                            i -> array_join(slice(toks, i * 24 + 1, 32), ' '))"""))
          .otherwise(array().cast("array<string>")).as("chunks"))
      .select(col("doc_id"), posexplode_outer(col("chunks")).as(Seq("chunk_no", "chunk")))
      .filter(col("chunk").isNotNull)
      .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"), col("chunk"))

  /** Single-pass pair-recall gate shared by x40/x43/x51/x55: ONE scan of
    * the exact set — left join against the approx set with a hit marker,
    * then count / count(marker) in the same aggregate — where separate
    * `hits` and `tot` aggregates would each re-run the quadratic exact
    * subtree (and the approx side once more). tot = 0 (nothing to recall
    * at this SF/threshold) is vacuous success, not failure. Both sides
    * carry distinct keys by construction; the approx side is re-deduped so
    * an upstream change cannot silently inflate the left join. */
  private def recallGate(exact: DataFrame, appr: DataFrame,
                         keys: Seq[String], floor: Double): DataFrame =
    exact.join(appr.dropDuplicates(keys).withColumn("hit", lit(1)), keys, "left")
      .agg(count(lit(1)).as("tot"), count(col("hit")).as("hits"))
      .select((col("tot") === 0L ||
        col("hits").cast("double") >= col("tot").cast("double") * floor)
        .as("recall_ok"))

  /** Expensive-subtree reuse across catalog entries — the
    * compute-once/consume-many shape of a real pipeline DAG (the pair set,
    * graph, or flag frame is ONE artifact with several consumers), applied
    * to the catalog: built on first use per (session, sfDir, tag),
    * persisted, returned verbatim afterwards. The tag pins EVERY knob of
    * the shared frame — a consumer with different knobs gets its own tag.
    *
    * Sharing is only ever between an operator entry and consumers of the
    * SAME logical computation (its gates, its downstream composites) —
    * never across algorithm variants: x08/x36 deliberately recompute x07's
    * pair set by different algorithms and stay independent, as does the
    * x12 LSH path. */
  private val frameCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]
  private def sharedFrame(s: SparkSession, d: String, tag: String)
                         (mk: => DataFrame): DataFrame =
    frameCache.getOrElseUpdate((s, d, tag), timedBuild(d, tag) {
      val f = mk.persist()
      // Materialize the cache NOW, inside the timed build, so the one-time
      // cost is attributable to the frame rather than smeared into whatever
      // consumer plan first forces it (count() populates every partition of
      // a freshly-persisted frame; consumers then read cached blocks).
      f.count()
      f
    })

  /** Wall-clock of each shared build (frames AND driver-value trainings),
    * keyed by the dir-qualified tag ([[sharedFrameTags]]'s format). A
    * measurement harness diffs [[sharedFrameTags]] around a timed query,
    * reads the new tags' build seconds here, and reports them as
    * first-class `frame:<tag>` entries instead of folding one-time build
    * cost into whichever catalog query happened to force it. Rebuilds
    * (e.g. the Bench AQE twin after [[clearSharedFrames]]) overwrite. */
  private val buildSecs = scala.collection.concurrent.TrieMap.empty[String, Double]
  def sharedFrameBuildSecs: Map[String, Double] = buildSecs.toMap
  private def qualifiedTag(d: String, tag: String): String =
    s"${d.replaceAll("/+$", "").split('/').last}:$tag"
  private def timedBuild[T](d: String, tag: String)(mk: => T): T = {
    val t0 = System.nanoTime()
    val v = mk
    buildSecs.put(qualifiedTag(d, tag), (System.nanoTime() - t0) / 1e9)
    v
  }

  /** The tags of every shared frame currently cached — lets a measurement
    * harness attribute each frame's one-time build cost to the catalog
    * query that first forced it (Bench diffs this set around each timed
    * query; without the attribution, whichever query alphabetically first
    * touches an expensive shared subtree looks like a regression whenever
    * the catalog's run order shifts). */
  /** Tags are DIR-QUALIFIED (`sf0.1:jacc-n3-t06`): frames are cached per
    * (session, dir, tag), so the warm-up pass at the tiny SF builds its
    * own entries and the timed pass at the bench SF builds distinct ones —
    * an unqualified tag set made the timed pass's diff come up empty
    * (every bare tag already present from warm-up) and silently blanked
    * the default pass's attribution block. */
  def sharedFrameTags: Set[String] = {
    def base(d: String) = d.replaceAll("/+$", "").split('/').last
    frameCache.keySet.map { case (_, d, tag) => s"${base(d)}:$tag" }.toSet ++
      // driver-VALUE caches (BPE merge training, PCA models) attribute the
      // same way as frame builds: their one-time training cost lands in
      // whichever timed query first forces them, and without a tag that
      // cost migrates invisibly when the catalog's run order shifts
      mergesCache.keySet.map { case (_, d, n) => s"${base(d)}:bpe-train-n$n" } ++
      pcaCache.keySet.map { case (_, d, k) => s"${base(d)}:pca-model-k$k" } ++
      sampleCache.keySet.map { case (_, d, c) => s"${base(d)}:emb-sample-n$c" }
  }

  /** x80's export scratch location: ONE deterministic dir per sf-dir
    * (Overwrite reuse bounds disk) with a single process-wide cleanup
    * hook, however many times the query runs in this JVM. */
  private val scratchDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private lazy val scratchHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchDirs.values().forEach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))))
  private def exportScratchDir(sfDir: String, tag: String = "x80"): String = {
    scratchHook
    scratchDirs.computeIfAbsent(s"$tag:$sfDir", _ =>
      java.nio.file.Files.createTempDirectory(s"graft-$tag-export").toString)
  }

  /** Drop every shared frame (unpersist + forget). For measurement
    * harnesses that re-run the catalog under a different runtime config
    * (Bench's AQE twin): without this, the second pass would read the
    * first pass's cached blocks and measure cache hits instead of its own
    * execution. */
  def clearSharedFrames(): Unit = {
    frameCache.values.foreach(_.unpersist())
    frameCache.clear()
    mergesCache.clear()
    pcaCache.clear()
    sampleCache.clear()
  }

  /** x138/x139's shared DSIR weight frame — the per-doc importance scores
    * computed once (target = lang 'en', 4096 hashed buckets), consumed by
    * the weight report and the selection. */
  private def dsirShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "dsir-b4096-en") {
      TextAnalysis.dsirWeights(Tables.documents(s, d),
        isTarget = col("lang") === "en", buckets = 4096)
    }

  /** x135/x135b/x136/x75's shared packing layout — ONE deterministic
    * artifact (the two-phase prefix-sum plan) with four consumers: the
    * per-doc plan, the segment explode, the capacity gate, and the
    * budget-curve evaluation (cum_before is capacity-independent, so one
    * layout serves every budget). Catalog knobs: capacity 128 (small
    * enough that sf-corpus docs straddle boundaries), seed 42. */
  private def packPlanShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "pack-plan-c128-s42") {
      Pack.packPlan(Tables.documents(s, d), capacity = 128L, seed = 42L)
    }

  /** x29 (pairs), x45 (removal), x48 (gate): the bipartite contamination
    * pair set — decontaminate once, reuse the flag frame. */
  private def contaminationShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "contam-n3-min3") {
      val docs = Tables.documents(s, d)
      Dedup.contaminationPairs(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        "text", "doc_id", n = 3, minShared = 3L)
    }

  /** x99 (heavy hitters) and x99b (bound gate): ONE sketch build + exact
    * candidate aggregate — the gate checks the very estimates x99 reports,
    * so sharing is the point (recallGate's relationship to its pair
    * frames), unlike x91 which re-derives its expectation independently.
    * The gate sorts AFTER the operator ("x99_" < "x99b"), so in Bench's
    * name-ordered pass the operator pays the build and the gate times the
    * cached 20-row frame — the attribution every shared pair keeps. */
  private def cmsShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "cms-hh-k20") {
      TextAnalysis.cmsHeavyHitters(
        Tables.documents(s, d).filter(length(trim(col("text"))) > 0))
    }

  /** x47 (flags) and x48 (superset gate): the Bloom-flagged train set. */
  private def bloomFlaggedShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "bloom-n3-min3") {
      val docs = Tables.documents(s, d)
      Dedup.bloomContamination(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        "text", "doc_id", n = 3, minShared = 3L)
    }

  /** x73 (catalog entry) and x80 (export round-trip): the end-to-end
    * curation pipeline — exact dedup → eval holdout → per-source relative
    * quality filter → decontamination → deterministic content-hash
    * sharding. See the x73 catalog comment for the stage-by-stage design. */
  private def curationPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val keepIds = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val train = docs.join(keepIds, Seq("doc_id"), "left_semi")
      .filter(col("doc_id") % 7 =!= 0)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id"))
    val quality = train
      .withColumn("score", TextAnalysis.qualityScore(col("text")))
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") <= 0.5)
    val flagged = Dedup.contaminationPairs(
        quality, docs.filter(col("doc_id") % 7 === 0),
        "text", "doc_id", n = 3, minShared = 3L)
      .select(col("train_id").as("doc_id")).distinct()
    val ws = Window.partitionBy(col("shard")).orderBy(col("ok"), col("doc_id"))
    quality.join(flagged, Seq("doc_id"), "left_anti")
      .withColumn("ok", md5(col("text")))
      .withColumn("shard",
        expr("CAST(instr('0123456789abcdef', substring(ok, 1, 1)) - 1 AS BIGINT)"))
      .withColumn("pos", row_number().over(ws))
      .select(col("doc_id"), col("source"), col("score"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  private val curationOracle: String = {
    val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
    s"""WITH dd AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
            base AS (SELECT d.doc_id, d.text, d.source FROM documents d
                     JOIN dd ON dd.doc_id = d.doc_id WHERE d.doc_id % 7 <> 0),
            m AS (SELECT doc_id, source, text, floor((
                    least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                  + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                  + (1.0 - least(CAST(p AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                  + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                  ) * 10000.0 + 0.5) / 10000.0 AS score
                FROM (SELECT doc_id, source, text,
                        CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                        length(text) AS ch,
                        len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS p,
                        len(regexp_extract_all(text, '[A-Z]')) AS u,
                        len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                      FROM base) t),
            r AS (SELECT doc_id, source, text, score,
                    percent_rank() OVER (PARTITION BY source
                      ORDER BY score DESC, doc_id) AS pr
                  FROM m),
            qf AS (SELECT doc_id, source, text, score FROM r WHERE pr <= 0.5),
            tt AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
            ss AS (SELECT doc_id,
                     list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
                   FROM tt WHERE len(toks) >= 3),
            ee AS (SELECT doc_id, unnest(sh) AS g FROM ss),
            flag AS (SELECT DISTINCT doc_id FROM (
                       SELECT tr.doc_id AS doc_id, ev.doc_id AS eval_id
                       FROM (SELECT e.doc_id, e.g FROM ee e JOIN qf ON qf.doc_id = e.doc_id) tr
                       JOIN (SELECT doc_id, g FROM ee WHERE doc_id % 7 = 0) ev
                         ON tr.g = ev.g
                       GROUP BY 1, 2 HAVING count(*) >= 3)),
            clean AS (SELECT qf.* FROM qf
                      WHERE doc_id NOT IN (SELECT doc_id FROM flag))
        SELECT doc_id, source, score,
               CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT) AS shard,
               row_number() OVER (PARTITION BY substring(md5(text), 1, 1)
                 ORDER BY md5(text), doc_id) AS pos
        FROM clean ORDER BY shard, pos"""
  }

  /** The word-3-gram hashed-shingle table — the ENTIRE shingle family's
    * shared upstream scan (x07/x08/x36 pair mining, x59 novelty, x72
    * calibration, and the pair-set consumers behind them): tokenize + hash
    * once, persist, fan out. Sharing the INPUT frame is orthogonal to the
    * never-share-across-algorithm-variants rule — each variant still runs
    * its own candidate generation and verification over it. */
  private def shinglesShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "hashed-shingles-n3")(
      Dedup.hashedShingles(Tables.documents(s, d), "text", "doc_id", n = 3))

  /** x73 (catalog entry) and x80 (export round-trip): ONE persisted run of
    * the curation pipeline — the export query's cost is the write+read
    * round-trip, not a second execution of the whole upstream. */
  private def curationShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "x73-curation")(curationPipeline(s, d))

  /** x92 (unigram log-prob), x93 (TF-IDF), x95 (vocab coverage), x102
    * (Zipf slope) and x103 (bigram vocab size): ONE exploded
    * (doc_id, source, tok) frame — x92 alone consumes it twice (vocab
    * aggregate + score join), x93 three times (tf, df, doc count).
    * Input-frame sharing, same as [[shinglesShared]] — orthogonal to the
    * never-share-across-algorithm-variants rule. */
  private def tokensShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "tokens-exploded")(
      Tables.documents(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok")))

  /** x103 (bigram log-prob) and x104 (conditional bigram entropy): ONE
    * exploded (doc_id, source, w1, w2) adjacent-pair frame — the bigram
    * explode is the corpus-sized pass, so the two consumers share it the
    * way x92/x93 share [[tokensShared]]. Single-token docs contribute no
    * rows (both consumers treat them as out of domain, like blank docs
    * in x92). */
  private def bigramsShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "bigrams-exploded")(
      Tables.documents(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), col("source"),
          explode(expr(
            """transform(sequence(0, size(t) - 2),
                         i -> struct(t[i] AS w1, t[i + 1] AS w2))"""))
            .as("b"))
        .select(col("doc_id"), col("source"),
          col("b.w1").as("w1"), col("b.w2").as("w2")))

  /** DuckDB translation of [[TextAnalysis.langGuess]]: per-profile stopword
    * hit counts and the greatest/alphabetical-tie-break CASE fold — shared
    * by the x04 and x115 oracles so the two gates cannot drift from each
    * other (or from a langProfiles edit). */
  private def oracleLangHits(textExpr: String): Seq[(String, String)] =
    TextAnalysis.langProfiles.map { case (code, words) =>
      code ->
        s"len(regexp_extract_all(lower($textExpr), '\\b(${words.mkString("|")})\\b'))"
    }
  private def oracleLangCase(textExpr: String): String = {
    val hits = oracleLangHits(textExpr)
    val best = hits.map(_._2).mkString("greatest(", ", ", ")")
    hits.init.reverse.foldLeft(s"'${hits.last._1}'") {
      case (acc, (code, e)) => s"CASE WHEN $e = $best THEN '$code' ELSE $acc END"
    }
  }

  /** x110 (Heaps curve) and x112 (source Jaccard): ONE exploded
    * (doc_id, source, tri) word-trigram frame — the trigram explode is
    * the corpus-sized pass, so the two consumers share it the way
    * x92/x93 share [[tokensShared]] (the superset rule: each consumer
    * projects the columns it needs). */
  /** x112 (catalog row) and x151b (sketch-accuracy gate): the EXACT
    * per-source-pair shingle Jaccard — full distinct-(source, trigram)
    * postings self-join. */
  private def sourceShingleJaccard(s: SparkSession, d: String): DataFrame = {
    val g = trigramsShared(s, d)
      .select(col("source"), col("tri").as("sh"))
      .distinct()
    val n = g.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    g.select(col("source").as("source_a"), col("sh"))
      .join(g.select(col("source").as("source_b"), col("sh")), "sh")
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("inter"))
      .join(n.select(col("source").as("source_a"), col("ns").as("n_a")),
        "source_a")
      .join(n.select(col("source").as("source_b"), col("ns").as("n_b")),
        "source_b")
      .select(col("source_a"), col("source_b"), col("inter"),
        col("n_a"), col("n_b"),
        expr("inter * 1000000 div (n_a + n_b - inter)").as("jacc_ppm"))
  }

  /** x151 (estimator row) and x151b (gate): per-source BOTTOM-K minhash
    * sketches (k = 256 smallest md5-48 trigram hashes — deterministic AND
    * engine-portable, so even the "approximate" path hash-matches its
    * oracle) and the standard single-sketch pairwise Jaccard estimate:
    * rank the UNION of two sketches, keep the k smallest, estimate
    * J ≈ |kept ∩ both| / k_used with k_used = min(k, |union|). The scale
    * answer to x112's full postings self-join: per-source state is k
    * 8-byte hashes (mergeable — bottom-k of a union is the bottom-k of
    * concatenated sketches), pair estimates run on k-row frames, and the
    * sources×sources pair seed is a broadcast nested loop over the tiny
    * source list (the x53 deliberate-bounded shape). */
  private def sourceSketchJaccard(s: SparkSession, d: String): DataFrame =
    graft.ext.Sketch.pairEstimates(
      graft.ext.Sketch.sketches(
        trigramsShared(s, d).select(col("source"), col("tri"))))

  /** Shared CTE prefix of the x151/x151b oracles: distinct per-source
    * trigram hashes, bottom-256 sketches, per-pair union ranking and the
    * estimate — mirrors [[sourceSketchJaccard]] exactly. */
  private val sketchJaccOracle =
    """WITH t AS (SELECT source, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents WHERE length(trim(text)) > 0),
          g0 AS (SELECT DISTINCT source,
                   toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] AS sh
                 FROM t, unnest(range(0, len(toks) - 2)) AS u(i)
                 WHERE len(toks) >= 3),
          g AS (SELECT DISTINCT source,
                  ('0x' || substr(md5(sh), 1, 12))::BIGINT AS h FROM g0),
          bk AS (SELECT source, h FROM (SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS r
                 FROM g) WHERE r <= 256),
          srcs AS (SELECT DISTINCT source FROM bk),
          prs AS (SELECT a.source AS sa, b.source AS sb
                  FROM srcs a JOIN srcs b ON a.source < b.source),
          contrib AS (
            SELECT prs.sa, prs.sb, bk.h, 1 AS ia, 0 AS ib
            FROM prs JOIN bk ON bk.source = prs.sa
            UNION ALL
            SELECT prs.sa, prs.sb, bk.h, 0, 1
            FROM prs JOIN bk ON bk.source = prs.sb),
          merged AS (SELECT sa, sb, h, max(ia) AS ia, max(ib) AS ib
                     FROM contrib GROUP BY 1, 2, 3),
          ranked AS (SELECT sa, sb, ia, ib,
                       row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS r
                     FROM merged),
          est AS (SELECT sa, sb, CAST(count(*) AS BIGINT) AS k_used,
                    CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS est_inter
                  FROM ranked WHERE r <= 256 GROUP BY 1, 2)
       """

  private def trigramsShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "trigrams-exploded")(
      Tables.documents(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), col("source"),
          explode(expr(
            """transform(sequence(0, size(t) - 3),
                         i -> concat_ws(' ', t[i], t[i + 1], t[i + 2]))"""))
            .as("tri")))

  /** x90 (sample) and x91 (quota gate): ONE ranked cell assignment —
    * deterministic k-means cells (k pinned for the fixture; production uses
    * the adaptive k ≈ n/targetCell sizing) joined to quality scores and
    * ranked per cell. The centroids cache separately (driver-side k×dim
    * doubles, deterministic) so the x91 gate can re-derive cell populations
    * INDEPENDENTLY of this frame's window path. */
  private val centroidCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Array[Array[Double]]]
  private def diverseCentroids(s: SparkSession, d: String): Array[Array[Double]] =
    centroidCache.getOrElseUpdate((s, d),
      Ivf.trainCentroidsFromSample(embSampleShared(s, d), k = 16, iters = 2))
  private def diverseRankedShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "diverse-k16-ranked") {
      val quality = Tables.documents(s, d)
        .select(col("doc_id").as("vec_id"),
          TextAnalysis.qualityScore(col("text")).as("score"))
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("score").desc, col("vec_id"))
      Ivf.assign(Tables.embeddings(s, d), diverseCentroids(s, d))
        .join(quality, "vec_id")
        .select(col("vec_id"), col("cluster"), col("score"))
        .withColumn("rnk", row_number().over(w))
    }

  /** x07 (pairs) and x25 (clusters): the uncapped exact Jaccard pair set
    * (maxDf disabled — the oracle contract; see the x07 comment). */
  private def jaccardPairsShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "jacc-n3-t06-uncapped")(
      Dedup.ngramJaccardPairsOf(shinglesShared(s, d),
        threshold = 0.6, maxDf = Int.MaxValue))

  /** The exact quadratic baseline mined ONCE at the catalog's LOWEST
    * threshold (0.2, the x49 floor): the same algorithm at 0.35 produces a
    * strict SUBSET (the threshold only filters verified cosines — Spark
    * orders NaN above every double, so degenerate rows survive the filter
    * identically), so every 0.35 consumer derives from this persisted
    * superset by a filter instead of paying a second quadratic pass. */
  private def cosinePairs02Shared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "cos-t02-exact")(
      Similarity.cosinePairs(Tables.embeddings(s, d), threshold = 0.2))

  /** x11 (pairs), x40/x43 (gate exact sides), x46 (cluster source): the
    * exact cosine-0.35 pair set — a filter over the 0.2 superset. */
  private def cosinePairs035Shared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "cos-t035-exact")(
      cosinePairs02Shared(s, d).filter(col("cos") >= 0.35))

  /** x25 (clusters) and x65 (source-spread audit): the transitive closure
    * over the uncapped Jaccard pair set. */
  private def jacClustersShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "jacc-n3-t06-clusters")(
      Dedup.dupClusters(jaccardPairsShared(s, d)))

  /** x46 (clusters) and x61 (purity audit): the transitive closure over the
    * exact cosine pair set — the iterative min-label propagation runs
    * once. */
  private def embClustersShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "cos-t035-clusters")(
      Dedup.dupClusters(cosinePairs035Shared(s, d).select(col("ia"), col("ib"))))

  /** x58's split and x125b's naive side: the per-source md5-order
    * stratified split (integer-arithmetic boundaries — see x58's entry for
    * the float-vs-decimal ceiling rationale). */
  private def stratifiedSplit(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("ok"), col("doc_id"))
    val wn = Window.partitionBy(col("source"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), md5(col("text")).as("ok"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .select(col("doc_id"), col("source"),
        when((col("rn") - 1) * 10 < col("n"), lit("test"))
          .when((col("rn") - 1) * 5 < col("n"), lit("val"))
          .otherwise(lit("train")).as("split"))
  }

  /** x125/x125b: leakage-safe train/val/test assignment — every doc keyed
    * by its near-dup CLUSTER (singletons are their own cluster), the split
    * decided by a uniform hash of the cluster rep (x98's md5-derived-
    * uniform idiom), so an entire cluster lands in ONE split and a
    * near-dup pair can never straddle the train/eval boundary. Scale: one
    * keyed left join against the (dup-sized, persisted) cluster frame,
    * then map-side hashing — no rank window, no global ordering at any
    * corpus size; the trade vs x58 is hash-approximate (not exact-ceil)
    * proportions, which is what cluster atomicity costs. */
  private def clusterSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"))
      .join(jacClustersShared(s, d), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_rep"), col("doc_id")).as("cluster_rep"))
      .select(col("doc_id"), col("cluster_rep"),
        graft.ext.Curation.hashSplit(col("cluster_rep")).as("split"))

  /** The SRP-banded pair set mined once at 0.2 (candidate generation is
    * threshold-independent — the [[cosinePairs02Shared]] superset rule). */
  private def srpPairs02Shared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "srp-t02")(
      Similarity.srpCosinePairs(Tables.embeddings(s, d), threshold = 0.2))

  /** x12 (pairs) and x17's LSH dedup twin: the hyperplane-table LSH pair
    * set at 0.35, mined once (identical knobs in both consumers). */
  private def lshPairs035Shared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "lsh-t035")(
      Similarity.lshCosinePairs(Tables.embeddings(s, d), threshold = 0.35))

  /** x39 (pairs) and x40 (gate approx side): filter over the 0.2 superset. */
  private def srpPairs035Shared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "srp-t035")(
      srpPairs02Shared(s, d).filter(col("cos") >= 0.35))

  /** x42 (pairs) and x43 (gate approx side). */
  private def ivfPairs035Shared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "ivf-t035-adaptive")(
      Ivf.ivfCosinePairs(Tables.embeddings(s, d), threshold = 0.35))

  /** x49 (graph) and x51 (gate exact side): rank the shared 0.2 exact pair
    * superset — the quadratic baseline runs once for x11/x40/x43/x46/x49. */
  private def knnGraphShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "knn-k5-c02-exact")(
      Similarity.knnFromPairs(cosinePairs02Shared(s, d), kTop = 5))

  /** x50 (graph) and x51 (gate approx side): rank the shared SRP 0.2 pair
    * superset — one banded mining pass serves x39/x40/x50/x51. */
  private def srpKnnGraphShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "knn-k5-c02-srp")(
      Similarity.knnFromPairs(srpPairs02Shared(s, d), kTop = 5))

  /** x53 (retrieval) and x55 (gate exact side). */
  private def crossTopKShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "cross-k3-c02-exact") {
      val emb = Tables.embeddings(s, d)
      Similarity.crossTopK(
        emb.filter(col("vec_id") % 10 === 0),
        emb.filter(col("vec_id") % 10 =!= 0), kTop = 3, minCos = 0.2)
    }

  /** x54 (retrieval) and x55 (gate approx side). */
  private def srpCrossTopKShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "cross-k3-c02-srp") {
      val emb = Tables.embeddings(s, d)
      Similarity.srpCrossTopK(
        emb.filter(col("vec_id") % 10 === 0),
        emb.filter(col("vec_id") % 10 =!= 0), kTop = 3, minCos = 0.2)
    }

  /** x66 (retrieval) and x67 (gate approx side). */
  private def ivfCrossTopKShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "cross-k3-c02-ivf") {
      val emb = Tables.embeddings(s, d)
      Ivf.ivfCrossTopK(
        emb.filter(col("vec_id") % 10 === 0),
        emb.filter(col("vec_id") % 10 =!= 0), kTop = 3, minCos = 0.2)
    }

  /** x116 (merge-pair table) and x117 (iteration 2): the occurrence-
    * weighted token-TYPE vocabulary — the one corpus-sized aggregate of
    * BPE training; every iteration re-derives pair counts from this
    * |V|-row frame, never from the token stream. */
  private def vocabShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "vocab-counts")(
      tokensShared(s, d).groupBy(col("tok")).agg(count(lit(1)).as("cnt")))

  /** x118 (compressed-domain top-k) and x118b (recall gate): ONE PQ
    * train + encode + ADC scan. m=16 on the 64-dim fixture → 4-dim
    * subspaces, 16-byte codes (16× compression). */
  private def pqTopKShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "pq-topk-q0-m16") {
      val emb = Tables.embeddings(s, d)
      graft.ext.Pq.pqTopK(emb, queryId = 0L, kTop = 10,
        graft.ext.Pq.trainFromSample(embSampleShared(s, d), m = 16, k = 16))
    }

  /** x119 (IVF-PQ retrieval) and x119b (gate approx side). refine=16:
    * ADC shortlist of 48/query, exact re-rank — measured recall 0.93 at
    * sf0.01 (vs 0.24 unrefined), the FAISS IVFPQ+refine operating
    * point. */
  private def ivfPqCrossTopKShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "cross-k3-c02-ivfpq") {
      val emb = Tables.embeddings(s, d)
      graft.ext.Pq.ivfPqCrossTopK(
        emb.filter(col("vec_id") % 10 === 0),
        emb.filter(col("vec_id") % 10 =!= 0), kTop = 3, minCos = 0.2,
        m = 16, k = 16, refine = 16)
    }

  /** x120 (audit table) and x120b (health gate): ONE train + encode +
    * stats aggregate — the gate checks the very figures x120 reports
    * (the x99/x99b relationship). */
  private def pqStatsShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "pq-stats-m16") {
      val emb = Tables.embeddings(s, d)
      graft.ext.Pq.pqStats(emb,
        graft.ext.Pq.trainFromSample(embSampleShared(s, d), m = 16, k = 16))
    }

  /** x121 (merge table), x122 (fertility) and x126 (compression curve):
    * ONE 4-iteration BPE training run. Driver-side value cache parallel
    * to [[sharedFrame]] (merges + curve are tiny local Seqs, not frames),
    * cleared by [[clearSharedFrames]] so the Bench AQE twin re-trains
    * under its own config instead of timing a cache hit. */
  private val mergesCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int), (Seq[String], Seq[Long])]
  private def bpeTrainedShared(s: SparkSession, d: String,
                               nMerges: Int = 4): (Seq[String], Seq[Long]) =
    mergesCache.getOrElseUpdate((s, d, nMerges),
      timedBuild(d, s"bpe-train-n$nMerges")(
        graft.ext.Bpe.trainWithCurve(Tables.documents(s, d), "text", nMerges)))
  private def bpeMergesShared(s: SparkSession, d: String): Seq[String] =
    bpeTrainedShared(s, d)._1

  /** The ONE seeded driver sample every sample-based training consumes
    * (PCA k16 AND k32, the PQ m16 codebooks, the diverse-subsample
    * centroids): [[graft.ext.Ivf.collectSample]] is a corpus scan, and
    * before this cache each model training re-ran it — five identical
    * scans per catalog pass. Driver-value cache (the [[bpeMergesShared]]
    * pattern), its one-time cost attributed as its own `frame:` tag. */
  private val sampleCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int), Array[Array[Double]]]
  private def embSampleShared(s: SparkSession, d: String,
      cap: Int = graft.ext.Ivf.defaultSampleCap): Array[Array[Double]] =
    sampleCache.getOrElseUpdate((s, d, cap),
      timedBuild(d, s"emb-sample-n$cap")(
        graft.ext.Ivf.collectSample(Tables.embeddings(s, d), cap)))

  /** x123 (projection) and x123b (variance gate): ONE PCA training run
    * (driver-value cache, the [[bpeMergesShared]] pattern) and ONE
    * projected frame. */
  private val pcaCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int), graft.ext.Pca.PcaModel]
  private def pcaModelShared(s: SparkSession, d: String,
                             k: Int = 16): graft.ext.Pca.PcaModel =
    pcaCache.getOrElseUpdate((s, d, k),
      timedBuild(d, s"pca-model-k$k")(
        graft.ext.Pca.trainFromSample(embSampleShared(s, d), nComponents = k)))
  private def pcaProjShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "pca-proj-k16")(
      graft.ext.Pca.project(Tables.embeddings(s, d), pcaModelShared(s, d))
        .select(col("vec_id"), expr("transform(proj, y -> round(y, 6))").as("proj")))

  /** x124 (reranked retrieval) and x124b (recall gate): ONE
    * project → shortlist → exact-rerank run at 32 components. 32, not
    * x123's 16: the x124b-style evaluation run at 16 components scores
    * 1–3/10 on this corpus (near-uniform spectrum — the tail dimensions
    * carry over 60% of the signal), which is precisely the unsafe-
    * reduction verdict this evaluation exists to deliver before a
    * pipeline commits to a reduced-dim index. */
  private def pcaRerankShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "pca-rerank-q0-k32") {
      val emb = Tables.embeddings(s, d)
      val proj = graft.ext.Pca.project(emb, pcaModelShared(s, d, k = 32))
      val q = proj.filter(col("vec_id") === 0L).select(col("proj").as("qp"))
      val shortlist = proj.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          (Similarity.dot(col("proj"), col("qp")) /
            (Similarity.norm(col("proj")) * Similarity.norm(col("qp")))).as("c"))
        .orderBy(col("c").desc, col("vec_id")).limit(40)
        .select(col("vec_id"))
      Similarity.cosineTopKWithin(emb, queryId = 0L, kTop = 10, shortlist)
    }

  /** x161's batch funnel frame, shared with the x161b streaming-parity
    * gate (which must compare against the EXACT batch plan, not a copy
    * that could drift). Unordered; consumers sort. */
  private def eventFunnelBatch(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ms"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ms")).as("t1_ms"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ms") > col("t1_ms"))
      .groupBy(col("user_id")).agg(min(col("ms")).as("t2_ms"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ms") > col("t2_ms"))
      .groupBy(col("user_id")).agg(min(col("ms")).as("t3_ms"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t1_ms"), col("t2_ms"), col("t3_ms"),
        (col("t3_ms").isNotNull &&
          col("t3_ms") - col("t1_ms") <= 86400000L).as("completed_24h"))
  }

  /** x163's per-(from, to) transition counts, shared with the x163b
    * streaming-parity gate (same no-drift rule as [[eventFunnelBatch]]). */
  private def transitionCountsBatch(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ms"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** The event stream as driver-side rows in (ms, event_id) order — the
    * ts-ordered delivery both streaming monitors contract on. Bounded by
    * the fixture event table (100 k rows at sf0.1); the gates replay it
    * through a real MemoryStream in uneven chops. */
  private def orderedEventRows(s: SparkSession, d: String): Seq[(Long, String, Long, Long)] =
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ms"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._3, r._4)).toSeq

  /** The x161b/x163b replay harness, defined ONCE: feed the chopped event
    * rows through `monitor` via a real MemoryStream query, collecting
    * every emission decoded by `decode`. One shared lifecycle (foreachBatch
    * accumulator, processAllAvailable per chop, stop in finally) so a fix
    * to one gate's replay cannot silently miss the other. */
  private def replayMonitor[T: scala.reflect.ClassTag](s: SparkSession,
      chops: Seq[Seq[(Long, String, Long, Long)]],
      monitor: DataFrame => DataFrame)(
      decode: org.apache.spark.sql.Row => T): Seq[T] = {
    // The replay's cost is dominated by per-micro-batch state-store task
    // overhead (a fixed price × shuffle partitions × chops, independent of
    // the fixture's row count) — pin the gate's stateful shuffle to a few
    // partitions so the parity check stays far inside the per-query
    // budget. The override lives on a CLONED session (same SparkContext,
    // isolated SQLConf), so a query running concurrently on the shared
    // session — a parallel bench twin — never sees it. Note newSession()
    // starts from the BASE SparkConf, not the shared session's runtime
    // conf: the replay always runs with the pins below regardless of what
    // the caller set at runtime — deliberate, because these gates check
    // batch-parity SEMANTICS, and e.g. adaptive re-planning only adds
    // per-micro-batch overhead to every state-store round (measured 2×
    // on the 5-chop out-of-order replays under the bench's AQE twin).
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    import ss.implicits._
    implicit val sq = ss.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long, Long)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[T]
    val query = monitor(
        mem.toDF().toDF("user_id", "event_type", "ms", "event_id"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val got = batch.collect().map(decode)
        acc.synchronized { acc ++= got }
        ()
      }
      .outputMode("append").start()
    try chops.foreach { c => mem.addData(c); query.processAllAvailable() }
    finally query.stop()
    acc.toSeq
  }

  /** x178/x179's shared related-packing layout: the multi-member near-dup
    * clusters' cluster-contiguous pack coordinates (capacity 128), every
    * window partitioned by cluster_rep — consumed by the per-doc plan and
    * the segment explode. */
  private def relatedPlanShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "related-pack-c128") {
      val toks = Tables.documents(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).cast("long").as("n_tokens"))
      val w = Window.partitionBy(col("cluster_rep"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      toks.join(jacClustersShared(s, d), "doc_id")
        .withColumn("cum_before",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("cluster_rep"), col("n_tokens"),
          col("cum_before"),
          expr("cum_before div 128").as("start_seq"),
          pmod(col("cum_before"), lit(128L)).as("start_off"),
          expr("(cum_before + n_tokens - 1) div 128").as("end_seq"))
    }

  /** x166/x167's shared pixel-fingerprint frame: each doc rendered as a
    * REAL 9×8 grayscale PNG (first 72 char codes as luma, cyclic —
    * deterministic and engine-reproducible), pushed through the FULL
    * pixel chain: pngEncode → pngPixels decode → luma → dHash. The
    * oracle recomputes the hash from char codes directly (it never sees a
    * PNG), so a hash-match proves the encode → decode → hash pipeline is
    * pixel-exact — the catalog-level twin of MultimodalSpec's raster
    * round-trip tests. */
  private def pixelDHashShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "pixel-dhash-9x8") {
      import s.implicits._
      val media = Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            // CODEPOINTS, not UTF-16 units: the oracle indexes with
            // substr/ord (codepoint semantics), and the two diverge on any
            // astral char — cyclic length AND sample values both shift
            val cps = text.codePoints().toArray
            val px = new Array[Byte](72)
            var i = 0
            while (i < 72) {
              px(i) = (cps(i % cps.length) % 256).toByte
              i += 1
            }
            Multimodal.MediaFile(id, "image",
              Multimodal.MediaCodecs.pngEncode(Multimodal.Raster(9, 8, 1, px)),
              Map.empty)
          }
        }
      Multimodal.perceptualHashes(media)
    }

  /** x181/x182's shared video frame-fingerprint frame: each doc rendered
    * as a REAL 2-frame 9×8 uncompressed AVI (frame f's luma = char codes
    * starting at cyclic offset f*72 — frame 0 is exactly x166's image),
    * pushed through the FULL video chain: aviEncode mux → aviFrames
    * container parse → per-frame luma → dHash. The oracle recomputes each
    * frame's hash from char codes directly (it never sees an AVI), so a
    * hash match proves the mux → demux → raster → hash pipeline is
    * pixel-exact — video near-dup on PIXELS, not x31's compressed-byte
    * blocks. */
  private def videoDHashShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "video-dhash-9x8x2") {
      import s.implicits._
      val media = Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            // codepoint indexing — the pixelDHashShared rationale
            val cps = text.codePoints().toArray
            val frames = (0 until 2).map { f =>
              val px = new Array[Byte](72)
              var i = 0
              while (i < 72) {
                px(i) = (cps((f * 72 + i) % cps.length) % 256).toByte
                i += 1
              }
              Multimodal.Raster(9, 8, 1, px)
            }
            Multimodal.MediaFile(id, "video",
              Multimodal.MediaCodecs.aviEncode(frames), Map.empty)
          }
        }
      Multimodal.videoFrameHashes(media)
    }

  /** x172/x173's shared audio-fingerprint frame — the x166 pattern on the
    * audio axis: each doc rendered as a REAL PCM16 mono WAV (130 samples
    * from char codes, exactly 2 per envelope window), pushed through the
    * full wavEncode → wavSamples parse → energy-envelope fingerprint
    * chain; the oracle recomputes the envelope from char codes without
    * ever seeing a WAV. */
  private def audioFpShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "audio-fp-130") {
      import s.implicits._
      val media = Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            // codepoint indexing — the pixelDHashShared rationale
            val cps = text.codePoints().toArray
            val sm = new Array[Short](130)
            var i = 0
            while (i < 130) {
              sm(i) = (((cps(i % cps.length) % 256) - 128) * 256).toShort
              i += 1
            }
            Multimodal.MediaFile(id, "audio",
              Multimodal.MediaCodecs.wavEncode(sm), Map.empty)
          }
        }
      Multimodal.audioFingerprints(media)
    }

  /** x168/x168b's shared matryoshka retrieval frame: query vec 0's exact
    * cosine top-10 at each embedding PREFIX length (8/16/32/64 dims) —
    * the MRL truncation evaluation run once, consumed by the ranking
    * report and the overlap verdict. */
  private def matryoshkaShared(s: SparkSession, d: String): DataFrame =
    sharedFrame(s, d, "matryoshka-topk-q0") {
      val emb = Tables.embeddings(s, d)
      Seq(8, 16, 32, 64).map { m =>
        val e = expr(s"transform(slice(embedding, 1, $m), x -> CAST(x AS DOUBLE))")
        val sliced = emb.filter(col("vec_id") =!= 0L)
          .select(col("vec_id"), e.as("e"))
        val qs = emb.filter(col("vec_id") === 0L).select(e.as("qe"))
        sliced.crossJoin(broadcast(qs))
          .select(lit(m.toLong).as("m"), col("vec_id"),
            round(Similarity.dot(col("e"), col("qe")) /
              (Similarity.norm(col("e")) * Similarity.norm(col("qe"))), 6)
              .as("cos"))
          .orderBy(col("cos").desc, col("vec_id")).limit(10)
      }.reduce(_ unionAll _)
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("m"))
            .orderBy(col("cos").desc, col("vec_id"))))
    }

  /** The x121/x122 oracle's shared CTE chain: re-derive `n` BPE merges in
    * pure SQL — the exact recurrence [[graft.ext.Bpe.train]] runs as Spark
    * jobs, unrolled (iteration i: pair counts of s(i-1) → argmax m(i) →
    * replace into s(i)). Ends with vocab symbol frames s0..s(n) and merge
    * CTEs m1..m(n) in scope. */
  private def bpeOracleCtes(n: Int): String = {
    // wrapped-symbol representation ("·t· ·h· ·e·"): anchors the literal
    // replace to whole-symbol boundaries — see the graft.ext.Bpe scaladoc
    val base =
      """WITH t AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
                    FROM documents WHERE length(trim(text)) > 0),
              v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
              s0 AS (SELECT cnt, array_to_string(list_transform(
                       range(0, length(tok)),
                       i -> '·' || substr(tok, i + 1, 1) || '·'), ' ') AS sym
                     FROM v)"""
    val iters = (1 to n).map { i =>
      s"""p$i AS (SELECT syms[j + 1] || ' ' || syms[j + 2] AS pair, cnt
                  FROM (SELECT cnt, string_split(sym, ' ') AS syms FROM s${i - 1}),
                       unnest(range(0, len(syms) - 1)) AS u(j)
                  WHERE len(syms) >= 2),
          m$i AS (SELECT pair
                  FROM (SELECT pair, sum(cnt) AS n FROM p$i GROUP BY pair)
                  ORDER BY n DESC, replace(pair, '·', '') LIMIT 1),
          s$i AS (SELECT cnt, replace(sym,
                    coalesce((SELECT pair FROM m$i), chr(1)),
                    coalesce((SELECT replace(pair, '· ·', '') FROM m$i), '')) AS sym
                  FROM s${i - 1})"""
    }
    (base +: iters).mkString(",\n")
  }

  /** Shared CTE prefix of the x144/x145 stitch oracles: per-doc k-token
    * head/tail strings (k = 3, proper prefix/suffix only), 48-bit
    * md5-derived keys (bit-identical to Spark's conv(substring(md5,1,12),
    * 16,10)), and the per-side df ≤ 16 cap. */
  private val stitchPairsOracle =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents WHERE length(trim(text)) > 0),
            e AS (SELECT doc_id,
                    array_to_string(toks[1:3], ' ') AS head,
                    array_to_string(toks[(len(toks)-2):len(toks)], ' ') AS tail
                  FROM t WHERE len(toks) > 3),
            tl AS (SELECT doc_id, tail AS ov,
                     ('0x' || substr(md5(tail), 1, 12))::BIGINT AS h FROM e),
            hd AS (SELECT doc_id, head AS ov,
                     ('0x' || substr(md5(head), 1, 12))::BIGINT AS h FROM e),
            tk AS (SELECT tl.* FROM tl JOIN (SELECT h FROM tl GROUP BY h
                     HAVING count(*) <= 16) ct USING (h)),
            hk AS (SELECT hd.* FROM hd JOIN (SELECT h FROM hd GROUP BY h
                     HAVING count(*) <= 16) ch USING (h))
       """

  val defs: Seq[QueryDef] = Seq(

    // x01 — exact dedup: one surviving id per distinct content.
    QueryDef("x01_exact_dedup",
      (s, d) => Dedup.exactDedup(Tables.documents(s, d), "text", "doc_id")
        .orderBy("keep_id"),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
              FROM documents GROUP BY text ORDER BY keep_id""")),

    // x02 — per-language corpus stats.
    QueryDef("x02_text_stats",
      (s, d) => Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("sum_chars"),
          round(avg(length(col("text"))), 2).as("avg_chars"),
          round(avg(TextAnalysis.wsTokenCount(col("text"))), 2).as("avg_words"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
                     CAST(sum(length(text)) AS BIGINT) AS sum_chars,
                     round(avg(length(text)), 2) AS avg_chars,
                     round(avg(CASE WHEN length(trim(text)) = 0 THEN 0
                               ELSE len(string_split_regex(trim(text), '\s+')) END), 2) AS avg_words
              FROM documents GROUP BY lang ORDER BY lang""")),

    // x03 — per-doc token counting: whitespace + BPE-ish pre-tokenizer.
    QueryDef("x03_token_count",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).cast("long").as("ws_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS ws_tokens,
                     CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
                     CAST(length(text) AS BIGINT) AS n_chars_calc
              FROM documents ORDER BY doc_id""")),

    // x04 — heuristic language-ID via stopword profiles (argmax,
    // alphabetical tie-break — mirrored CASE order in the oracle).
    QueryDef("x04_lang_id",
      (s, d) => {
        val scores = TextAnalysis.langScores(col("text"))
        Tables.documents(s, d).select(
          Seq(col("doc_id"), TextAnalysis.langGuess(col("text")).as("lang_guess")) ++
            scores.map { case (code, c) => c.cast("long").as(s"s_$code") }: _*)
          .orderBy("doc_id")
      },
      Some {
        val hits = oracleLangHits("text")
        s"""SELECT doc_id, ${oracleLangCase("text")} AS lang_guess,
                   ${hits.map { case (c, e) => s"CAST($e AS BIGINT) AS s_$c" }.mkString(", ")}
            FROM documents ORDER BY doc_id"""
      }),

    // x05 — document quality score.
    QueryDef("x05_quality_score",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("score"))
        .orderBy("doc_id"),
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""SELECT doc_id, floor((
                 least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
               + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
               + (1.0 - least(CAST(p AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
               + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
               ) * 10000.0 + 0.5) / 10000.0 AS score
            FROM (SELECT doc_id,
                    CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                    length(text) AS ch,
                    len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS p,
                    len(regexp_extract_all(text, '[A-Z]')) AS u,
                    len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                  FROM documents) t
            ORDER BY doc_id"""
      }),

    // x06a — md5 content fingerprint + routing bucket.
    QueryDef("x06_fingerprint",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        substring(TextAnalysis.fingerprint(col("text")), 1, 4).as("bucket"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(lower(trim(text))) AS fp,
                     substr(md5(lower(trim(text))), 1, 4) AS bucket
              FROM documents ORDER BY doc_id""")),

    // x06b — order-sensitive rolling-hash fingerprint (engine hash → rows-only).
    QueryDef("x06_rolling_fp",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), TextAnalysis.rollingHash(col("text")).as("rolling_fp"))
        .orderBy("doc_id"),
      None),

    // x07 — exact n-gram Jaccard near-dup pairs (shingle join, no all-pairs).
    // maxDf disabled here: the DuckDB oracle is uncapped, so the
    // oracle-checked entry must honor the full "exact" contract at any sf —
    // the skew cap is the production default, pinned by DedupSpec instead.
    QueryDef("x07_ngram_jaccard",
      (s, d) => jaccardPairsShared(s, d).orderBy("ia", "ib"),
      Some(jaccardOracle)),

    // x08 — MinHash-LSH near-dedup, exact-verified: same contract as x07,
    // found via banded signature buckets instead of the full shingle join.
    // The df cap is CORPUS-ADAPTIVE, max(64, n/10): orders of magnitude
    // above any real shingle/bucket df on the fixtures (max observed df is
    // 25 at sf0.1 — DedupSpec pins that the cap is not binding, so the
    // oracle contract stays exact), while bounding the one quadratic
    // blowup a viral boilerplate shingle could cause at scale. n comes
    // from the persisted shingle frame — a cached-block count, not a scan.
    // A BINDING cap is not silent: the df audit below runs over the same
    // persisted frame (one small aggregate — the inline observe() counter
    // is AQE-swallowed, per Dedup.postingsDfStats) and warns on stderr
    // when any shingle df reaches the cap, i.e. whenever the entry's
    // result could diverge from the exact-oracle contract.
    QueryDef("x08_minhash_lsh",
      (s, d) => {
        val sh = shinglesShared(s, d)
        val cap = math.min(math.max(64L, sh.count() / 10L), Int.MaxValue.toLong).toInt
        val audit = Dedup.postingsDfStatsOf(sh, maxDf = cap).head()
        if (audit.getLong(2) > 0L)
          System.err.println(
            s"graft x08: df cap $cap BINDING — ${audit.getLong(2)} shingles " +
              s"over cap (max_df ${audit.getLong(1)}); pairs dropped, result " +
              "is no longer exact vs the uncapped oracle")
        Dedup.minHashLshPairsOf(sh, threshold = 0.6, maxDf = cap)
          .orderBy("ia", "ib")
      },
      Some(jaccardOracle)),

    // x36 — prefix-filtered exact Jaccard: same pair set as x07 (same
    // oracle proves it), found by indexing only each doc's rarest-first
    // prefix — the exact answer to boilerplate-shingle blowup that the
    // approximate maxDf cap only approximates.
    QueryDef("x36_jaccard_prefix",
      (s, d) => Dedup.ngramJaccardPairsPrefixOf(shinglesShared(s, d),
        threshold = 0.6).orderBy("ia", "ib"),
      Some(jaccardOracle)),

    // x09 — SimHash fingerprints (engine hash → rows-only; unit-tested).
    QueryDef("x09_simhash",
      (s, d) => Dedup.simHash(Tables.documents(s, d), "text", "doc_id")
        .orderBy("doc_id"),
      None),

    // x10 — exact cosine top-k against vec_id 0 (brute-force baseline).
    QueryDef("x10_cosine_topk",
      (s, d) => Similarity.cosineTopK(Tables.embeddings(s, d), queryId = 0L, kTop = 10)
        .orderBy(col("cos").desc, col("vec_id").asc),
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              SELECT vec_id,
                     round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS cos
              FROM embeddings e, q WHERE e.vec_id <> 0
              ORDER BY cos DESC, vec_id LIMIT 10""")),

    // x11 — exact cosine near-dup pairs above threshold.
    QueryDef("x11_cosine_pairs",
      (s, d) => cosinePairs035Shared(s, d).orderBy("ia", "ib"),
      Some("""SELECT a.vec_id AS ia, b.vec_id AS ib,
                     round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
              ORDER BY ia, ib""")),

    // x12 — LSH-bucketed approximate pairs (scale path; recall measured in
    // tests against x11 → rows-only here).
    QueryDef("x12_lsh_cosine_pairs",
      (s, d) => lshPairs035Shared(s, d).orderBy("ia", "ib"),
      None),

    // x13 — LSH multi-probe approximate top-k for one query (rows-only).
    QueryDef("x13_lsh_topk",
      (s, d) => Similarity.lshTopK(Tables.embeddings(s, d), queryId = 0L, kTop = 10)
        .orderBy(col("cos").desc, col("vec_id").asc),
      None),

    // x18 — per-language top terms: token explode → (lang, token) counts →
    // rank window → top 5 per language. The fan-out/aggregate/top-k shape of
    // a corpus vocabulary report.
    QueryDef("x18_top_terms",
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("tok").asc)
        Tables.documents(s, d)
          .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy(col("lang"), col("tok"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("lang"), col("rnk").cast("long").as("rnk"), col("tok"), col("n"))
          .orderBy("lang", "rnk")
      },
      Some("""SELECT lang, rnk, tok, n FROM (
                SELECT lang, tok, count(*) AS n,
                       row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, tok) AS rnk
                FROM (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
                      FROM documents WHERE length(trim(text)) > 0) t
                GROUP BY lang, tok) r
              WHERE rnk <= 5 ORDER BY lang, rnk""")),

    // x25 — connected-component dup clusters over the exact Jaccard pairs:
    // cluster-level dedup needs the transitive closure, not pairwise keeps.
    // Oracle: DuckDB recursive CTE computing reachability → min per node.
    QueryDef("x25_dup_clusters",
      (s, d) => jacClustersShared(s, d).orderBy("doc_id"),
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                pairs AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                e AS (SELECT ia AS a, ib AS b FROM pairs
                      UNION SELECT ib, ia FROM pairs),
                r AS (SELECT a AS id, a AS reach FROM e
                      UNION
                      SELECT r.id, e.b FROM r JOIN e ON e.a = r.reach)
              SELECT id AS doc_id, min(reach) AS cluster_rep
              FROM r GROUP BY id ORDER BY doc_id""")),

    // x35 — canonical-document pick: near-dup clusters (x25 machinery) ×
    // quality scores (x05 formula); each cluster keeps its highest-quality
    // member, ties to the lowest doc id. The curation step that turns a
    // pair list into "which copy do we train on".
    QueryDef("x35_canonical_pick",
      (s, d) => {
        val scored = Tables.documents(s, d).select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("score"))
        // same clusters as x25 (same pairs, same algorithm) — shared frame
        Dedup.canonicalPick(jacClustersShared(s, d), scored, "doc_id", "score")
          .orderBy("cluster_rep")
      },
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH RECURSIVE
              t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
              sh AS (SELECT doc_id,
                       list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                     FROM t WHERE len(toks) >= 3),
              z AS (SELECT doc_id, len(s) AS n FROM sh),
              ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
              p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                    FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                    GROUP BY 1, 2),
              pairs AS (SELECT ia, ib
                        FROM p JOIN z za ON za.doc_id = p.ia
                               JOIN z zb ON zb.doc_id = p.ib
                        WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
              e AS (SELECT ia AS a, ib AS b FROM pairs
                    UNION SELECT ib, ia FROM pairs),
              r AS (SELECT a AS id, a AS reach FROM e
                    UNION
                    SELECT r.id, e.b FROM r JOIN e ON e.a = r.reach),
              c AS (SELECT id AS doc_id, min(reach) AS cluster_rep
                    FROM r GROUP BY id),
              q AS (SELECT doc_id, floor((
                      least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                    + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                    + (1.0 - least(CAST(pu AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                    + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                    ) * 10000.0 + 0.5) / 10000.0 AS score
                  FROM (SELECT doc_id,
                          CASE WHEN length(trim(text)) = 0 THEN 0
                               ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                          length(text) AS ch,
                          len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS pu,
                          len(regexp_extract_all(text, '[A-Z]')) AS u,
                          len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                        FROM documents) raw),
              win AS (SELECT c.cluster_rep, c.doc_id, q.score,
                      row_number() OVER (PARTITION BY c.cluster_rep
                                         ORDER BY q.score DESC, c.doc_id ASC) AS rn,
                      count(*) OVER (PARTITION BY c.cluster_rep) AS n_members,
                      max(q.score) OVER (PARTITION BY c.cluster_rep) AS best_score
                    FROM c JOIN q USING (doc_id))
            SELECT cluster_rep, doc_id AS keep_id, n_members, best_score
            FROM win WHERE rn = 1 ORDER BY cluster_rep"""
      }),

    // x37 — intra-document repetition signals (Gopher-style quality
    // filters): duplicate-bigram fraction and most-common-token share.
    // Distinct bigrams count through the hashed-shingle expression (8-byte
    // keys; collision-equivalent to string distinct, as x07).
    QueryDef("x37_repetition",
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        val base = t.select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(org.apache.spark.sql.graft.VectorFunctions.shingleHashF(col("toks"), 2))
            .cast("long").as("nd2"))
        val top = t.select(col("doc_id"), explode_outer(col("toks")).as("tok"))
          .filter(col("tok").isNotNull)
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
        base.join(top, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            when(col("n_tokens") >= 2,
              floor((lit(1.0) - col("nd2").cast("double") / (col("n_tokens") - 1))
                * 10000.0 + 0.5) / 10000.0)
              .otherwise(0.0).as("dup_bigram_frac"),
            when(col("n_tokens") >= 1,
              floor(coalesce(col("top_c"), lit(0L)).cast("double") / col("n_tokens")
                * 10000.0 + 0.5) / 10000.0)
              .otherwise(0.0).as("top_token_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                         FROM documents WHERE length(trim(text)) > 0),
                   b AS (SELECT doc_id, len(toks) AS n,
                           CASE WHEN len(toks) >= 2
                                THEN len(list_distinct(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i+1])))
                                ELSE 0 END AS nd2
                         FROM t),
                   u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
                   cc AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
                   m AS (SELECT doc_id, max(c) AS top_c FROM cc GROUP BY 1)
              SELECT d.doc_id, CAST(coalesce(b.n, 0) AS BIGINT) AS n_tokens,
                     CASE WHEN coalesce(b.n, 0) >= 2
                          THEN floor((1.0 - CAST(b.nd2 AS DOUBLE) / (b.n - 1)) * 10000.0 + 0.5) / 10000.0
                          ELSE 0.0 END AS dup_bigram_frac,
                     CASE WHEN coalesce(b.n, 0) >= 1
                          THEN floor(CAST(coalesce(m.top_c, 0) AS DOUBLE) / b.n * 10000.0 + 0.5) / 10000.0
                          ELSE 0.0 END AS top_token_frac
              FROM documents d
              LEFT JOIN b USING (doc_id) LEFT JOIN m USING (doc_id)
              ORDER BY doc_id""")),

    // x38 — boilerplate-chunk detection (CCNet-style): a 32-token chunk
    // (x22's shape) appearing verbatim in ≥2 distinct docs is boilerplate;
    // per doc, how many chunks survive. Chunks group on xxhash64 of the
    // chunk text, so the shuffle carries 8-byte keys (count semantics
    // collision-equivalent to grouping the strings).
    QueryDef("x38_chunk_boiler",
      (s, d) => {
        val ch = tokenChunks(Tables.documents(s, d))
          .select(col("doc_id"), xxhash64(col("chunk")).as("h"))
        val dfC = ch.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("nd"))
        ch.join(dfC, "h")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_boiler"))
          .select(col("doc_id"), col("n_chunks"), col("n_boiler"),
            (col("n_chunks") - col("n_boiler")).as("n_kept"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                         FROM documents WHERE length(trim(text)) > 0),
                   c AS (SELECT doc_id, unnest(range(0, len(toks), 24)) AS o, toks FROM t),
                   k AS (SELECT doc_id, array_to_string(toks[(o+1):(o+32)], ' ') AS chunk FROM c),
                   dd AS (SELECT chunk, count(DISTINCT doc_id) AS nd FROM k GROUP BY 1)
              SELECT k.doc_id, count(*) AS n_chunks,
                     CAST(sum(CASE WHEN dd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
                     count(*) - CAST(sum(CASE WHEN dd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
              FROM k JOIN dd USING (chunk)
              GROUP BY k.doc_id ORDER BY doc_id""")),

    // x39 — SRP-sketch near-pairs: one native 64-bit sign-random-projection
    // sketch per vector, banded map-side, exact-cosine verified. Engine
    // hashing → rows-only; recall vs the exact x11 baseline is pinned in
    // SimilaritySpec and driver-visible through x40.
    QueryDef("x39_srp_pairs",
      (s, d) => srpPairs035Shared(s, d).orderBy("ia", "ib"),
      None),

    // x40 — SRP recall gate: |srp ∩ exact| / |exact| over the x11 pair set,
    // as an oracle-checkable boolean (both sides deterministic).
    QueryDef("x40_srp_recall",
      (s, d) => recallGate(
        cosinePairs035Shared(s, d).select(col("ia"), col("ib")),
        srpPairs035Shared(s, d).select(col("ia"), col("ib")),
        Seq("ia", "ib"), floor = 0.85),
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")),

    // x41 — LSH bucket-distribution audit gate: both sign-LSH candidate
    // paths (hyperplane tables, SRP sketch bands) report whether any bucket
    // outgrew the cap — the silent-recall-cliff witness made a driver-visible
    // CORRECTNESS row. With corpus-adaptive band width (Similarity
    // .adaptiveBits) expected bucket size stays at maxBucket/4, so a red row
    // means the adaptive sizing failed, not that the corpus grew.
    QueryDef("x41_lsh_bucket_stats",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val lsh = Similarity.lshBucketStats(emb)
          .select((col("n_over_cap") === 0L).as("lsh_no_drops"))
        val srp = Similarity.srpBucketStats(emb)
          .select((col("n_over_cap") === 0L).as("srp_no_drops"))
        lsh.crossJoin(srp)
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS lsh_no_drops, CAST(1 AS BOOLEAN) AS srp_no_drops")),

    // x42 — IVF-cell-partitioned near-pairs: coarse cells bound the
    // candidate universe, narrow SRP bands inside each cell keep mid-cosine
    // recall — the corpus-scale composition the banding math alone cannot
    // reach (engine hashing → rows-only; recall gated by x43). Cell count
    // is corpus-adaptive (Ivf.adaptiveClusters: k ≈ n/64, nAssign bumps
    // 3→4 past the k=8 floor) — a pinned k made candidate volume quadratic
    // again, measured as the r6 9.5 s regression at sf0.1.
    QueryDef("x42_ivf_cosine_pairs",
      (s, d) => ivfPairs035Shared(s, d).orderBy("ia", "ib"),
      None),

    // x43 — recall gate for x42 vs the exact x11 pair set (the x19/x20
    // pattern): cell-overlap × band recall, floor set from measurement at
    // verification SFs (adaptive knobs: 0.903 / 0.886 / 0.860 at
    // sf0.001 / 0.01 / 0.1). tot=0 (no exact pairs) is vacuous success.
    QueryDef("x43_ivf_pairs_recall",
      (s, d) => recallGate(
        cosinePairs035Shared(s, d).select(col("ia"), col("ib")),
        ivfPairs035Shared(s, d).select(col("ia"), col("ib")),
        Seq("ia", "ib"), floor = 0.8),
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")),

    // x46 — semantic dup clusters (the SemDeDup shape): transitive closure
    // over embedding near-dup pairs — cluster-level dedup for vectors,
    // composing x11's pair machinery with x25's min-label propagation. The
    // exact pair source is the oracle row; a production pipeline swaps in
    // ivfCosinePairs (x42) as the candidate source, same downstream shape.
    QueryDef("x46_embedding_dup_clusters",
      (s, d) => embClustersShared(s, d)
        .select(col("doc_id").as("vec_id"), col("cluster_rep"))
        .orderBy("vec_id"),
      Some("""WITH RECURSIVE
                p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
                      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35),
                e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
                r AS (SELECT a AS id, a AS reach FROM e
                      UNION
                      SELECT r.id, e.b FROM r JOIN e ON e.a = r.reach)
              SELECT id AS vec_id, min(reach) AS cluster_rep
              FROM r GROUP BY id ORDER BY vec_id""")),

    // x29 — benchmark decontamination: the eval split (doc_id % 7 == 0)
    // checked for 3-gram leakage against the training split (pair frame
    // computed once and shared with x45/x48 — contaminationShared).
    QueryDef("x29_contamination",
      (s, d) => contaminationShared(s, d).orderBy("train_id", "eval_id"),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                   s AS (SELECT doc_id,
                           list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
                         FROM t WHERE len(toks) >= 3),
                   e AS (SELECT doc_id, unnest(sh) AS g FROM s),
                   tr AS (SELECT * FROM e WHERE doc_id % 7 <> 0),
                   ev AS (SELECT * FROM e WHERE doc_id % 7 = 0)
              SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id, count(*) AS n_shared
              FROM tr JOIN ev ON tr.g = ev.g
              GROUP BY 1, 2 HAVING count(*) >= 3
              ORDER BY 1, 2""")),

    // x44 — per-source token-budget mixture sampling: the data-mixing
    // primitive of a training run. Docs fill each source's token budget
    // greedily in deterministic content-hash order (md5 — reproducible,
    // engine-portable, no RNG state); a doc is taken while the EXCLUSIVE
    // running token total is under budget, so the first doc of a source is
    // always taken and the last may overflow (standard greedy fill). The
    // per-source window parallelizes across sources; a single mega-source
    // shards the window by a hash-bucket sub-key, same mitigation as x32.
    QueryDef("x44_token_budget_mix",
      (s, d) => {
        val w = Window.partitionBy(col("source")).orderBy(col("ok"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"),
            md5(col("text")).as("ok"))
          .withColumn("cum", sum(col("toks")).over(w) - col("toks"))
          .filter(col("cum") < 64)
          .select(col("doc_id"), col("source"), col("toks"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, source, md5(text) AS ok,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks
                   FROM documents),
                 c AS (SELECT doc_id, source, toks,
                     CAST(sum(toks) OVER (PARTITION BY source ORDER BY ok, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS BIGINT) AS cum
                   FROM t)
              SELECT doc_id, source, toks FROM c WHERE cum < 64 ORDER BY doc_id""")),

    // x45 — decontaminated training split: the removal step completing x29.
    // Train docs with >= 3 shared 3-gram shingles against any eval doc are
    // anti-joined out; at scale the anti join keys on doc_id (8 bytes) and
    // the contamination side is the (small) flagged-id set.
    QueryDef("x45_decontaminated_train",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val flagged = contaminationShared(s, d)
          .select(col("train_id").as("doc_id")).distinct()
        docs.filter(col("doc_id") % 7 =!= 0)
          .join(flagged, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("source"), col("lang"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                   s AS (SELECT doc_id,
                           list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
                         FROM t WHERE len(toks) >= 3),
                   e AS (SELECT doc_id, unnest(sh) AS g FROM s),
                   tr AS (SELECT * FROM e WHERE doc_id % 7 <> 0),
                   ev AS (SELECT * FROM e WHERE doc_id % 7 = 0),
                   bad AS (SELECT tr.doc_id FROM tr JOIN ev ON tr.g = ev.g
                           GROUP BY tr.doc_id, ev.doc_id HAVING count(*) >= 3)
              SELECT d.doc_id, d.source, d.lang FROM documents d
              WHERE d.doc_id % 7 <> 0
                AND d.doc_id NOT IN (SELECT DISTINCT doc_id FROM bad)
              ORDER BY d.doc_id""")),

    // x47 — Bloom-filter decontamination: the 100 TB shape of x29. The eval
    // corpus's shingle hashes serialize into ONE Bloom filter (distributed
    // aggregate); the train side is flagged by a scan-local membership test
    // — no train-side shuffle, no join. Flagged set is a SUPERSET of the
    // exact one (no false negatives); fp bits are engine-hash-specific →
    // rows-only, with the superset property gated by x48.
    QueryDef("x47_bloom_decontaminate",
      (s, d) => bloomFlaggedShared(s, d).orderBy("doc_id"),
      None),

    // x48 — Bloom superset gate: every train doc the EXACT bipartite scan
    // flags (>= 3 shingles shared with a single eval doc) must also be
    // flagged by the Bloom pass (such a doc has >= 3 shingles in the eval
    // corpus union, and Bloom has no false negatives). A red row means the
    // filter build or the membership expression is broken.
    QueryDef("x48_bloom_superset_gate",
      (s, d) => {
        val exact = contaminationShared(s, d)
          .select(col("train_id").as("doc_id")).distinct()
        val bloom = bloomFlaggedShared(s, d).select(col("doc_id"))
        exact.join(bloom, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("missed"))
          .select((col("missed") === 0L).as("superset_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS superset_ok")),

    // x49 — exact kNN graph: every vector's top-5 neighbors at cosine
    // >= 0.2 — the corpus-wide neighborhood structure clustering/SemDeDup/
    // diversity sampling consume. Quadratic baseline (oracle row); x50 is
    // the bucket-bounded production path. The minCos floor is what makes a
    // sublinear path possible at all.
    QueryDef("x49_knn_graph",
      (s, d) => knnGraphShared(s, d).orderBy("vec_id", "rnk"),
      Some("""WITH p AS (SELECT a.vec_id AS va, b.vec_id AS nb,
                     round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                  b.embedding::DOUBLE[]), 6) AS cos
                   FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
                 r AS (SELECT va, nb, cos,
                     row_number() OVER (PARTITION BY va ORDER BY cos DESC, nb) AS rnk
                   FROM p WHERE cos >= 0.2)
              SELECT va AS vec_id, nb, cos, rnk FROM r
              WHERE rnk <= 5 ORDER BY vec_id, rnk""")),

    // x50 — approximate kNN graph via SRP-sketch banded candidates: one
    // candidate-generation pass serves every vector's neighborhood (engine
    // hashing → rows-only; recall gated by x51).
    QueryDef("x50_srp_knn_graph",
      (s, d) => srpKnnGraphShared(s, d).orderBy("vec_id", "rnk"),
      None),

    // x51 — kNN-graph recall gate: fraction of exact kNN edges the SRP
    // graph recovers. Exact edges concentrate at the top of each
    // neighborhood (high cos → high band-collision probability), so edge
    // recall sits above the mid-cosine pair floor; measured 0.887 / 0.895 /
    // 0.923 at sf0.001 / 0.01 / 0.1 — floor 0.8 (tot=0 vacuous success).
    QueryDef("x51_knn_recall",
      (s, d) => recallGate(
        knnGraphShared(s, d).select(col("vec_id"), col("nb")),
        srpKnnGraphShared(s, d).select(col("vec_id"), col("nb")),
        Seq("vec_id", "nb"), floor = 0.8),
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")),

    // x52 — deterministic content-hash sharding: the reproducible global
    // shuffle of a training run. Shard = first md5 hex digit (16 shards;
    // scale takes more digits), position = rank within shard by (md5,
    // doc_id). Pure scan expressions + a per-shard window — the shard key
    // IS the x32 window mitigation, built in: no global sort anywhere, and
    // content addressing keeps the assignment stable under corpus
    // re-partitioning (doc_id renumbering changes nothing but tie-breaks).
    QueryDef("x52_content_shards",
      (s, d) => {
        val w = Window.partitionBy(col("shard")).orderBy(col("ok"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), md5(col("text")).as("ok"))
          .withColumn("shard",
            expr("CAST(instr('0123456789abcdef', substring(ok, 1, 1)) - 1 AS BIGINT)"))
          .withColumn("pos", row_number().over(w))
          .select(col("doc_id"), col("shard"), col("pos"))
          .orderBy("shard", "pos")
      },
      Some("""SELECT doc_id,
                     CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT) AS shard,
                     row_number() OVER (PARTITION BY substring(md5(text), 1, 1)
                       ORDER BY md5(text), doc_id) AS pos
              FROM documents ORDER BY shard, pos""")),

    // x53 — exact batch retrieval: every query vector's top-3 corpus
    // neighbors at cosine >= 0.2 — the "embed a batch, look each one up"
    // shape. The query batch (vec_id % 10 = 0) broadcasts against one scan
    // of the rest; per-query rank window. Production-exact while the batch
    // is broadcastable; x54 is the banded path for corpus-sized batches.
    QueryDef("x53_cross_topk",
      (s, d) => crossTopKShared(s, d).orderBy("query_id", "rnk"),
      Some("""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
                 c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
                 p AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                     round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                  c.embedding::DOUBLE[]), 6) AS cos
                   FROM q CROSS JOIN c),
                 r AS (SELECT query_id, vec_id, cos,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, vec_id) AS rnk
                   FROM p WHERE cos >= 0.2)
              SELECT query_id, vec_id, cos, rnk FROM r
              WHERE rnk <= 3 ORDER BY query_id, rnk""")),

    // x54 — approximate batch retrieval: both sides SRP-banded, candidates
    // from a (band, bucket) equi-join against capped corpus postings —
    // never queries × corpus (engine hashing → rows-only; recall gated by
    // x55).
    QueryDef("x54_srp_cross_topk",
      (s, d) => srpCrossTopKShared(s, d).orderBy("query_id", "rnk"),
      None),

    // x55 — retrieval recall gate: fraction of exact (query, neighbor)
    // edges the banded path recovers. Same concentration argument as x51
    // (exact edges sit at the top of each result list where band collision
    // probability is highest); floor 0.8, tot=0 vacuous success.
    QueryDef("x55_cross_recall",
      (s, d) => recallGate(
        crossTopKShared(s, d).select(col("query_id"), col("vec_id")),
        srpCrossTopKShared(s, d).select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), floor = 0.8),
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")),

    // x56 — bucket-drop audit gate for the batch-retrieval banded path: the
    // x41 pattern applied to x54's corpus side. srpCrossTopK silently drops
    // over-cap corpus postings (a query whose true neighbors sat in a
    // dropped mega-bucket would lose them invisibly) — this row makes that
    // cliff a driver-visible boolean, alongside the inline
    // graft_srp_cross_bucket_cap observe counter.
    QueryDef("x56_cross_bucket_gate",
      (s, d) => Similarity.srpBucketStats(
        Tables.embeddings(s, d).filter(col("vec_id") % 10 =!= 0))
        .select((col("n_over_cap") === 0L).as("cross_no_drops")),
      Some("SELECT CAST(1 AS BOOLEAN) AS cross_no_drops")),

    // x57 — per-source RELATIVE quality filter (the CCNet-style bucket
    // idea): a fixed global threshold over-prunes weak sources and
    // under-prunes strong ones, so each doc is ranked against its OWN
    // source and the top half survives. percent_rank = (rank-1)/(n-1) is
    // exact integer division in double — cross-engine safe. Per-source
    // window: the natural partition key; a mega-source shards the window
    // by a hash sub-key (the x32/x44 mitigation).
    QueryDef("x57_source_quality_filter",
      (s, d) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(col("score").desc, col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            TextAnalysis.qualityScore(col("text")).as("score"))
          .withColumn("pr", percent_rank().over(w))
          .filter(col("pr") <= 0.5)
          .select(col("doc_id"), col("source"), col("score"))
          .orderBy("doc_id")
      },
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH q AS (SELECT doc_id, source, floor((
                 least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
               + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
               + (1.0 - least(CAST(p AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
               + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
               ) * 10000.0 + 0.5) / 10000.0 AS score
             FROM (SELECT doc_id, source,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                     length(text) AS ch,
                     len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS p,
                     len(regexp_extract_all(text, '[A-Z]')) AS u,
                     len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                   FROM documents) t),
              r AS (SELECT doc_id, source, score,
                      percent_rank() OVER (PARTITION BY source
                        ORDER BY score DESC, doc_id) AS pr
                    FROM q)
            SELECT doc_id, source, score FROM r WHERE pr <= 0.5 ORDER BY doc_id"""
      }),

    // x58 — stratified content-hash split: train/val/test held out PER
    // SOURCE at exact ceil proportions (10% test, 10% val), assignment by
    // deterministic md5 order so the split survives doc_id renumbering and
    // corpus re-partitioning. The boundary test is INTEGER arithmetic —
    // (rn-1)*10 < n ⟺ rn ≤ ⌈n/10⌉ — because ceil(n * 0.1) differs between
    // decimal and binary float engines at n = 30 (3.0000000000000004 in
    // double rounds the ceiling up).
    QueryDef("x58_stratified_split",
      (s, d) => stratifiedSplit(s, d).orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, source, md5(text) AS ok FROM documents),
                   r AS (SELECT doc_id, source,
                           row_number() OVER (PARTITION BY source ORDER BY ok, doc_id) AS rn,
                           count(*) OVER (PARTITION BY source) AS n
                         FROM t)
              SELECT doc_id, source,
                     CASE WHEN (rn - 1) * 10 < n THEN 'test'
                          WHEN (rn - 1) * 5 < n THEN 'val'
                          ELSE 'train' END AS split
              FROM r ORDER BY doc_id""")),

    // x59 — shingle novelty: per doc, the fraction of its distinct 3-gram
    // shingles whose corpus-wide FIRST appearance (min doc_id) is the doc
    // itself — "how much new content does this doc contribute", the
    // doc-level signal dedup pipelines threshold on. One postings aggregate
    // (min per 8-byte shingle hash) + one equi-join back: never all-pairs,
    // same skew caveats as x07's postings.
    QueryDef("x59_shingle_novelty",
      (s, d) => {
        val sh = shinglesShared(s, d)
          .select(col("doc_id"), explode_outer(col("shs")).as("g"))
          .filter(col("g").isNotNull)
        val first = sh.groupBy(col("g")).agg(min(col("doc_id")).as("first_id"))
        sh.join(first, "g")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("first_id") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
          .select(col("doc_id"), col("n_shingles"), col("n_novel"),
            (floor(col("n_novel").cast("double") / col("n_shingles") * 10000.0 + 0.5)
              / 10000.0).as("novelty"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                   s AS (SELECT doc_id,
                           list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
                         FROM t WHERE len(toks) >= 3),
                   e AS (SELECT doc_id, unnest(sh) AS g FROM s),
                   f AS (SELECT g, min(doc_id) AS first_id FROM e GROUP BY 1)
              SELECT e.doc_id, count(*) AS n_shingles,
                     CAST(sum(CASE WHEN f.first_id = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
                     floor(CAST(sum(CASE WHEN f.first_id = e.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                           / count(*) * 10000.0 + 0.5) / 10000.0 AS novelty
              FROM e JOIN f USING (g) GROUP BY e.doc_id ORDER BY doc_id""")),

    // x60 — out-of-vocabulary rate against the corpus top-K vocabulary:
    // the tokenizer-coverage diagnostic (how much of each doc a fixed vocab
    // fails to cover). Vocab = two-stage hash agg + deterministic
    // (count desc, token) cut; the per-token membership probe is a
    // BROADCAST left join (the vocab is small by construction), so the
    // token stream never shuffles for it. K = 10 here: the synthetic corpus
    // has 31 distinct tokens, and a vocab that covers everything would make
    // every OOV rate vacuously zero (the x40 tot=0 lesson).
    QueryDef("x60_oov_rate",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok").asc).limit(10)
          .select(col("tok"), lit(1).as("inv"))
        toks.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            (floor(col("n_oov").cast("double") / col("n_tokens") * 10000.0 + 0.5)
              / 10000.0).as("oov_rate"))
          .orderBy("doc_id")
      },
      Some("""WITH e AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
                         FROM documents WHERE length(trim(text)) > 0),
                   v AS (SELECT tok FROM (SELECT tok, count(*) AS cnt FROM e GROUP BY 1
                                          ORDER BY cnt DESC, tok LIMIT 10)),
                   j AS (SELECT e.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
                         FROM e LEFT JOIN v ON e.tok = v.tok)
              SELECT doc_id, count(*) AS n_tokens, CAST(sum(oov) AS BIGINT) AS n_oov,
                     floor(CAST(sum(oov) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS oov_rate
              FROM j GROUP BY 1 ORDER BY doc_id""")),

    // x61 — label purity of semantic dup clusters: for each x46 cluster,
    // member count, distinct labels, and the majority-label count — the
    // consistency audit run before trusting near-dup clusters for
    // dedup/curation (a low-purity cluster means the similarity threshold
    // is merging semantically distinct content). Exact integer arithmetic
    // end-to-end; two-level hash agg over the (tiny) cluster frame.
    QueryDef("x61_cluster_label_purity",
      (s, d) => {
        val clusters = embClustersShared(s, d)
          .select(col("doc_id").as("vec_id"), col("cluster_rep"))
        clusters
          .join(Tables.embeddings(s, d).select(col("vec_id"), col("label")), "vec_id")
          .groupBy(col("cluster_rep"), col("label"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("cluster_rep"))
          .agg(sum(col("c")).as("n_members"),
            count(lit(1)).as("n_labels"),
            max(col("c")).as("majority_n"))
          .orderBy("cluster_rep")
      },
      Some("""WITH RECURSIVE
                p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
                      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35),
                e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
                r AS (SELECT a AS id, a AS reach FROM e
                      UNION
                      SELECT r.id, e.b FROM r JOIN e ON e.a = r.reach),
                cl AS (SELECT id AS vec_id, min(reach) AS cluster_rep FROM r GROUP BY id),
                bl AS (SELECT cl.cluster_rep, emb.label, count(*) AS c
                       FROM cl JOIN embeddings emb USING (vec_id) GROUP BY 1, 2)
              SELECT cluster_rep, CAST(sum(c) AS BIGINT) AS n_members,
                     count(*) AS n_labels, CAST(max(c) AS BIGINT) AS majority_n
              FROM bl GROUP BY 1 ORDER BY cluster_rep""")),

    // x62 — kNN label-agreement rate: for every vector in the exact kNN
    // graph, does the MAJORITY label of its neighbors (ties to the lowest
    // label) match its own? The embedding-quality eval a pipeline runs
    // before trusting vectors for dedup/search — low agreement means the
    // embedding space does not respect the labels. Exact integers + one
    // rank window partitioned by vec_id.
    QueryDef("x62_knn_label_agreement",
      (s, d) => {
        val labels = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
        val perVec = knnGraphShared(s, d).select(col("vec_id"), col("nb"))
          .join(labels.withColumnRenamed("label", "own"), "vec_id")
          .join(labels.select(col("vec_id").as("nb"), col("label").as("nb_label")), "nb")
          .groupBy(col("vec_id"), col("own"), col("nb_label"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("c").desc, col("nb_label").asc)
        perVec.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .agg(count(lit(1)).as("n_vectors"),
            sum(when(col("nb_label") === col("own"), 1L).otherwise(0L)).as("n_agree"))
          .select(col("n_vectors"), col("n_agree"),
            (floor(col("n_agree").cast("double") / col("n_vectors") * 10000.0 + 0.5)
              / 10000.0).as("agreement"))
      },
      Some("""WITH p AS (SELECT a.vec_id AS va, b.vec_id AS nb,
                     round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                  b.embedding::DOUBLE[]), 6) AS cos
                   FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
                 g AS (SELECT va AS vec_id, nb FROM (
                         SELECT va, nb, row_number() OVER (PARTITION BY va
                           ORDER BY cos DESC, nb) AS rnk
                         FROM p WHERE cos >= 0.2) WHERE rnk <= 5),
                 c AS (SELECT g.vec_id, own.label AS own, nl.label AS nb_label,
                         count(*) AS c
                       FROM g JOIN embeddings own ON own.vec_id = g.vec_id
                              JOIN embeddings nl ON nl.vec_id = g.nb
                       GROUP BY 1, 2, 3),
                 m AS (SELECT vec_id, own, nb_label FROM (
                         SELECT vec_id, own, nb_label, row_number() OVER (
                           PARTITION BY vec_id ORDER BY c DESC, nb_label) AS rk
                         FROM c) WHERE rk = 1)
              SELECT count(*) AS n_vectors,
                     CAST(sum(CASE WHEN nb_label = own THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
                     floor(CAST(sum(CASE WHEN nb_label = own THEN 1 ELSE 0 END) AS DOUBLE)
                           / count(*) * 10000.0 + 0.5) / 10000.0 AS agreement
              FROM m""")),

    // x63 — inter-source duplication matrix: near-dup pair counts per
    // unordered source pair — "which sources syndicate each other", the
    // provenance diagnostic behind source-level dedup decisions. Two
    // 8-byte-key joins onto the shared pair set; the matrix is at most
    // |sources|² rows.
    QueryDef("x63_source_overlap",
      (s, d) => {
        val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
        jaccardPairsShared(s, d)
          .join(src.select(col("doc_id").as("ia"), col("source").as("src_a")), "ia")
          .join(src.select(col("doc_id").as("ib"), col("source").as("src_b")), "ib")
          .select(least(col("src_a"), col("src_b")).as("source_lo"),
            greatest(col("src_a"), col("src_b")).as("source_hi"))
          .groupBy(col("source_lo"), col("source_hi"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("source_lo", "source_hi")
      },
      Some(s"""WITH jp AS ($jaccardOracle)
              SELECT least(da.source, db.source) AS source_lo,
                     greatest(da.source, db.source) AS source_hi,
                     count(*) AS n_pairs
              FROM jp JOIN documents da ON da.doc_id = jp.ia
                      JOIN documents db ON db.doc_id = jp.ib
              GROUP BY 1, 2 ORDER BY source_lo, source_hi""")),

    // x64 — vocabulary coverage curve: what fraction of all token
    // occurrences the top-k tokens cover, at k = 5/10/25 — the Zipf
    // diagnostic sizing a tokenizer vocabulary. Only the top max(k) ranks
    // matter, so the candidate cut is `limit(25)` — TakeOrderedAndProject,
    // a distributed per-partition top-K with NO global sort — and the rank
    // window then runs over a constant-25-row frame (top-25 ranks under the
    // total order equal global ranks). Cumulative sums stay in exact
    // integers until the final rounded division.
    QueryDef("x64_vocab_coverage",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val top = counts.orderBy(col("cnt").desc, col("tok").asc).limit(25)
        val w = Window.orderBy(col("cnt").desc, col("tok").asc)
        val ranked = top
          .withColumn("rk", row_number().over(w))
          .withColumn("cum", sum(col("cnt"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        ranked.filter(col("rk").isin(5, 10, 25))
          .crossJoin(counts.agg(sum(col("cnt")).as("tot")))
          .select(col("rk").cast("long").as("k"), col("cum"), col("tot"),
            (floor(col("cum").cast("double") / col("tot") * 10000.0 + 0.5)
              / 10000.0).as("coverage"))
          .orderBy("k")
      },
      Some("""WITH c AS (SELECT tok, count(*) AS cnt
                         FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
                               FROM documents WHERE length(trim(text)) > 0)
                         GROUP BY 1),
                   r AS (SELECT row_number() OVER (ORDER BY cnt DESC, tok) AS rk,
                           CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                         FROM c),
                   t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM c)
              SELECT rk AS k, cum, tot,
                     floor(CAST(cum AS DOUBLE) / tot * 10000.0 + 0.5) / 10000.0 AS coverage
              FROM r, t WHERE rk IN (5, 10, 25) ORDER BY k""")),

    // x65 — near-dup cluster source spread: for every x25 dup cluster, how
    // many member docs and how many DISTINCT sources carry the content —
    // separates intra-source duplication (re-crawls) from cross-source
    // syndication, the provenance view of the dedup decision. One 8-byte
    // join onto the shared cluster frame + an integer-only hash agg. (The
    // exact-text variant of this audit is vacuous on the fixture — the
    // synthetic corpus has zero byte-identical documents, x01 keeps 500 of
    // 500 — so the operator is defined over near-dup clusters, which
    // exist at every SF.)
    QueryDef("x65_dup_source_spread",
      (s, d) => {
        val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
        jacClustersShared(s, d)
          .join(src, "doc_id")
          .groupBy(col("cluster_rep"))
          .agg(count(lit(1)).as("n_members"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy("cluster_rep")
      },
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                jp AS (SELECT ia, ib FROM p
                       JOIN z za ON za.doc_id = p.ia JOIN z zb ON zb.doc_id = p.ib
                       WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                e AS (SELECT ia AS a, ib AS b FROM jp UNION SELECT ib, ia FROM jp),
                r AS (SELECT a AS id, a AS reach FROM e
                      UNION
                      SELECT r.id, e.b FROM r JOIN e ON e.a = r.reach),
                cl AS (SELECT id AS doc_id, min(reach) AS cluster_rep FROM r GROUP BY id)
              SELECT cluster_rep, count(*) AS n_members,
                     count(DISTINCT d.source) AS n_sources
              FROM cl JOIN documents d USING (doc_id)
              GROUP BY 1 ORDER BY cluster_rep""")),

    // x34 — per-source curation report: the provenance-mix table a corpus
    // pipeline reviews before training (doc counts, language spread, size,
    // quality). avg quality goes through exact INTEGER units (the per-doc
    // score is 4dp by construction, so score·10⁴ is integral) — a double
    // avg would depend on engine summation order.
    QueryDef("x34_source_stats",
      (s, d) => {
        val q4 = floor(TextAnalysis.qualityScore(col("text")) * 10000.0 + 0.5).cast("long")
        Tables.documents(s, d)
          .select(col("source"), col("lang"), length(col("text")).as("ch"), q4.as("q4"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("lang")).as("n_langs"),
            (floor(avg(col("ch")) * 100.0 + 0.5) / 100.0).as("avg_chars"),
            (floor(sum(col("q4")).cast("double") / count(lit(1)) + 0.5) / 10000.0)
              .as("avg_quality"))
          .orderBy("source")
      },
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""SELECT source, count(*) AS n_docs,
                   count(DISTINCT lang) AS n_langs,
                   floor(avg(ch) * 100.0 + 0.5) / 100.0 AS avg_chars,
                   floor(CAST(sum(q4) AS DOUBLE) / count(*) + 0.5) / 10000.0 AS avg_quality
            FROM (SELECT source, lang, length(text) AS ch,
                    CAST(floor((
                        least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                      + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                      + (1.0 - least(CAST(p AS DOUBLE) / greatest(CAST(ch2 AS DOUBLE), 1.0), 1.0)) * 0.2
                      + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch2 AS DOUBLE), 1.0), 1.0)) * 0.1
                      ) * 10000.0 + 0.5) AS BIGINT) AS q4
                  FROM (SELECT source, lang, text,
                          CASE WHEN length(trim(text)) = 0 THEN 0
                               ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                          length(text) AS ch2,
                          len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS p,
                          len(regexp_extract_all(text, '[A-Z]')) AS u,
                          len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                        FROM documents) t) z
            GROUP BY source ORDER BY source"""
      }),

    // x21 — deterministic stratified sampling: hash the CONTENT into 16
    // buckets (md5 first hex digit) and keep a per-language bucket quota —
    // the reproducible corpus-mixing primitive of a training-data pipeline
    // (rerunnable, no RNG state; at 100 TB it is a pure scan filter that
    // pushes nothing to the driver).
    QueryDef("x21_stratified_sample",
      (s, d) => {
        val bucket = (expr("instr('0123456789abcdef', substring(md5(text), 1, 1))") - 1).cast("long")
        val quota = when(col("lang") === "en", 8).when(col("lang") === "de", 4).otherwise(2)
        Tables.documents(s, d)
          .withColumn("bucket", bucket)
          .filter(col("bucket") < quota)
          .select(col("doc_id"), col("lang"), col("bucket"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
                     CAST(strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS BIGINT) AS bucket
              FROM documents
              WHERE strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 <
                    CASE WHEN lang = 'en' THEN 8 WHEN lang = 'de' THEN 4 ELSE 2 END
              ORDER BY doc_id""")),

    // x22 — overlapping token-window chunking (context-window preparation):
    // x22 — token-window chunking (shared tokenChunks helper).
    QueryDef("x22_chunking",
      (s, d) => tokenChunks(Tables.documents(s, d)).orderBy("doc_id", "chunk_no"),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                         FROM documents WHERE length(trim(text)) > 0),
                   c AS (SELECT doc_id, unnest(range(0, len(toks), 24)) AS o, toks FROM t)
              SELECT doc_id, o // 24 AS chunk_no,
                     array_to_string(toks[(o+1):(o+32)], ' ') AS chunk
              FROM c ORDER BY doc_id, chunk_no""")),

    // x23 — TF-IDF top terms per document: tf from the (doc, tok) counts,
    // df from distinct docs per tok, idf = ln(N/df); ranking on the ROUNDED
    // score (unrounded float compare across engines would flip rank ties).
    QueryDef("x23_tfidf",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        val dfCounts = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val nDocs = tf.select(countDistinct(col("doc_id")).as("n_docs"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("tok").asc)
        tf.join(dfCounts, "tok")
          .crossJoin(broadcast(nDocs))
          .withColumn("tfidf",
            floor(col("tf") * log(col("n_docs").cast("double") / col("df")) * 10000.0 + 0.5) / 10000.0)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("rnk").cast("long").as("rnk"), col("tok"), col("tfidf"))
          .orderBy("doc_id", "rnk")
      },
      Some("""WITH e AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
                         FROM documents WHERE length(trim(text)) > 0),
                   tf AS (SELECT doc_id, tok, count(*) AS tf FROM e GROUP BY 1, 2),
                   df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
                   n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
                   x AS (SELECT tf.doc_id, tf.tok,
                                floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 10000.0 + 0.5) / 10000.0 AS tfidf
                         FROM tf JOIN df USING (tok) CROSS JOIN n)
              SELECT doc_id, rnk, tok, tfidf FROM (
                SELECT doc_id, tok, tfidf,
                       row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rnk
                FROM x) r
              WHERE rnk <= 3 ORDER BY doc_id, rnk""")),

    // x24 — corpus length histogram per language (100-char buckets): the
    // distribution sanity report every ingestion pipeline runs.
    QueryDef("x24_length_histogram",
      (s, d) => Tables.documents(s, d)
        .groupBy(col("lang"),
          expr("(length(text) div 100) * 100").cast("long").as("len_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "len_bucket"),
      Some("""SELECT lang, (length(text) // 100) * 100 AS len_bucket, count(*) AS n
              FROM documents GROUP BY 1, 2 ORDER BY 1, 2""")),

    // x26 — per-group quota sampling: keep N docs per language, picked by a
    // deterministic content-hash order (reproducible, no RNG; the per-source
    // quota primitive of corpus mixing). rank window per group — one shuffle.
    QueryDef("x26_group_quota_sample",
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("text")).asc, col("doc_id").asc)
        Tables.documents(s, d)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 20)
          .select(col("lang"), col("rnk").cast("long").as("rnk"), col("doc_id"))
          .orderBy("lang", "rnk")
      },
      Some("""SELECT lang, rnk, doc_id FROM (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rnk
                FROM documents) t
              WHERE rnk <= 20 ORDER BY lang, rnk""")),

    // x27 — text normalization: lowercase, strip punctuation, collapse
    // whitespace, trim — the canonical pre-dedup cleanup pass, pure codegen'd
    // string expressions over the scan.
    QueryDef("x27_normalize",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9\\s]", ""), "\\s+", " ")).as("norm"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm
              FROM documents ORDER BY doc_id""")),

    // x28 — PII-style redaction: mask email-shaped and long-digit-run tokens
    // (the compliance scrub of a training corpus). regexp_replace replaces
    // ALL matches in Spark; DuckDB needs the 'g' flag for the same.
    QueryDef("x28_redact",
      (s, d) => {
        val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        Tables.documents(s, d).select(
          col("doc_id"),
          regexp_replace(regexp_replace(col("text"),
            emailPat, "<EMAIL>"), "\\d{6,}", "<NUM>").as("redacted"),
          (length(col("text")) -
            length(regexp_replace(col("text"), emailPat, ""))).cast("long")
            .as("email_chars"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\d{6,}', '<NUM>', 'g') AS redacted,
                     CAST(length(text) - length(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '', 'g')) AS BIGINT)
                       AS email_chars
              FROM documents ORDER BY doc_id""")),

    // x17 — embedding-cosine near-dup dedup: survivors have no lower-id
    // neighbor above the threshold (min-id representative per dup pair).
    QueryDef("x17_embedding_dedup",
      (s, d) => Similarity.embeddingDedupOf(Tables.embeddings(s, d),
        cosinePairs035Shared(s, d)).orderBy("vec_id"),
      Some("""SELECT vec_id FROM embeddings e
              WHERE NOT EXISTS (
                SELECT 1 FROM embeddings o
                WHERE o.vec_id < e.vec_id
                  AND round(list_cosine_similarity(o.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) >= 0.35)
              ORDER BY vec_id""")),

    // x17b — the production-scale twin of x17: candidate pairs from the LSH
    // bucket equi-join instead of the exact all-pairs join (rows-only;
    // recall vs the exact form asserted in DedupSpec).
    QueryDef("x17_embedding_dedup_lsh",
      (s, d) => Similarity.embeddingDedupOf(Tables.embeddings(s, d),
        lshPairs035Shared(s, d)).orderBy("vec_id"),
      None),

    // x19 — driver-visible recall gate for the approximate top-k paths:
    // |approx ∩ exact|/k as a floor-checked boolean, so ANN quality is a
    // green/red CORRECTNESS row instead of a test-internal assertion. The
    // floors are deliberately conservative (LSH multi-table recall at mid
    // cosine ≈ 0.75 analytically; IVF probes 4/16 cells).
    QueryDef("x19_lsh_recall",
      (s, d) => {
        val exact = Similarity.cosineTopK(Tables.embeddings(s, d), 0L, 10)
          .select(col("vec_id"))
        val appr = Similarity.lshTopK(Tables.embeddings(s, d), 0L, 10)
          .select(col("vec_id"))
        exact.join(appr, Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("hits"))
          .select((col("hits") >= 5).as("recall_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")),

    // x20 — same gate for IVF ANN. The synthetic near-uniform embeddings
    // have little cluster structure (the hard case for a coarse quantizer),
    // so the gate probes half the cells: measured 7/10 at sf0.01, floor 5.
    QueryDef("x20_ivf_recall",
      (s, d) => {
        val exact = Similarity.cosineTopK(Tables.embeddings(s, d), 0L, 10)
          .select(col("vec_id"))
        val appr = Ivf.ivfTopK(Tables.embeddings(s, d), 0L, 10, nProbe = 8)
          .select(col("vec_id"))
        exact.join(appr, Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("hits"))
          .select((col("hits") >= 5).as("recall_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")),

    // x16 — IVF ANN: coarse-quantizer cells (deterministic mini k-means),
    // probe the nearest cells, exact cosine inside them (rows-only; recall
    // vs the exact x10 measured in tests).
    QueryDef("x16_ivf_topk",
      (s, d) => Ivf.ivfTopK(Tables.embeddings(s, d), queryId = 0L, kTop = 10)
        .orderBy(col("cos").desc, col("vec_id").asc),
      None),

    // x30 — Shannon entropy of the token distribution per language, from
    // exact integer counts: H = ln(N) − (Σ cᵢ·ln cᵢ)/N. A corpus-diversity
    // gauge (low entropy = repetitive/boilerplate text).
    QueryDef("x30_token_entropy",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
        counts
          .groupBy(col("lang"))
          .agg(sum(col("c")).as("n_tokens"),
               sum(col("c").cast("double") * log(col("c").cast("double"))).as("clc"),
               count(lit(1)).as("n_distinct"))
          .select(col("lang"), col("n_tokens"), col("n_distinct"),
            (floor((log(col("n_tokens").cast("double")) -
              col("clc") / col("n_tokens")) * 10000.0 + 0.5) / 10000.0).as("entropy"))
          .orderBy("lang")
      },
      Some("""WITH c AS (SELECT lang, tok, count(*) AS c
                         FROM (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
                               FROM documents WHERE length(trim(text)) > 0) t
                         GROUP BY 1, 2)
              SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
                     floor((ln(CAST(sum(c) AS DOUBLE)) -
                            sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / sum(c))
                           * 10000.0 + 0.5) / 10000.0 AS entropy
              FROM c GROUP BY lang ORDER BY lang""")),

    // x31 — media near-dup via frame-fingerprint Jaccard: two media match
    // when their sampled-block md5 sets overlap above the threshold — the
    // binary-content analog of shingle dedup (catches payloads sharing a
    // long common prefix, e.g. re-encodes with appended metadata).
    QueryDef("x31_media_near_dup",
      (s, d) => {
        val media = Tables.documents(s, d).select(
          col("doc_id").as("media_id"), col("text").as("content"))
        // set size rides inside the postings structs (the Dedup.scala
        // pattern): a sizes join-back or self-join would re-evaluate the
        // whole frame-hash subtree per branch
        val fr = Multimodal.sampleFrames(media, "content", "media_id",
            blockBytes = 32, stride = 2)
          .select(col("media_id"), md5(col("frame_bytes")).as("fh"))
          .distinct()
          .withColumn("n", count(lit(1))
            .over(Window.partitionBy(col("media_id"))))
        val pairs = fr
          .groupBy(col("fh"))
          .agg(sort_array(collect_set(struct(col("media_id"), col("n")))).as("ids"))
          .filter(size(col("ids")) > 1)
          .select(explode(graft.ext.ArrayPairs.orderedPairs(col("ids")) { (a, b) =>
            struct(a.getField("media_id").as("ia"), a.getField("n").as("na"),
              b.getField("media_id").as("ib"), b.getField("n").as("nb"))
          }).as("p"))
          .groupBy(col("p.ia").as("ia"), col("p.na").as("na"),
            col("p.ib").as("ib"), col("p.nb").as("nb"))
          .agg(count(lit(1)).as("inter"))
        pairs
          .withColumn("jacc",
            col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .filter(col("jacc") >= 0.2)
          .select(col("ia"), col("ib"), (floor(col("jacc") * 10000.0 + 0.5) / 10000.0).as("jacc"))
          .orderBy("ia", "ib")
      },
      Some("""WITH d AS (SELECT doc_id AS media_id, text,
                     greatest(CAST(ceil(length(text) / 32.0) AS BIGINT) - 1, 0) AS e
                   FROM documents),
                 l AS (SELECT media_id,
                     list_distinct(list_transform(range(0, e + 1, 2),
                       i -> md5(substr(text, CAST(i * 32 + 1 AS BIGINT), 32)))) AS fr
                   FROM d),
                 f AS (SELECT media_id, unnest(fr) AS fh FROM l),
                 z AS (SELECT media_id, len(fr) AS n FROM l),
                 p AS (SELECT a.media_id AS ia, b.media_id AS ib, count(*) AS inter
                       FROM f a JOIN f b ON a.fh = b.fh AND a.media_id < b.media_id
                       GROUP BY 1, 2)
              SELECT ia, ib, floor(CAST(inter AS DOUBLE) / (za.n + zb.n - inter) * 10000.0 + 0.5) / 10000.0 AS jacc
              FROM p JOIN z za ON za.media_id = p.ia JOIN z zb ON zb.media_id = p.ib
              WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.2
              ORDER BY ia, ib""")),

    // x32 — sequence packing: assign docs (in doc_id order) to fixed-budget
    // training sequences by exclusive running token count div budget — the
    // deterministic contiguous-fill packing of a pretraining data loader.
    // One window cumsum + one aggregation; the window's global order is the
    // doc_id sort the pack order REQUIRES (at scale: pack per source shard
    // — partition the window by a shard key — exactly how loaders do it).
    QueryDef("x32_sequence_packing",
      (s, d) => {
        val w = Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("doc_id"),
            TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"))
          .withColumn("cum", sum(col("toks")).over(w) - col("toks"))
          .withColumn("seq_id", expr("cum div 512"))
          .groupBy(col("seq_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy("seq_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks
                   FROM documents),
                 c AS (SELECT doc_id, toks,
                     sum(toks) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS cum
                   FROM t)
              SELECT CAST(cum // 512 AS BIGINT) AS seq_id, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens,
                     min(doc_id) AS first_doc, max(doc_id) AS last_doc
              FROM c GROUP BY 1 ORDER BY 1""")),

    // x33 — int8 embedding quantization report: per-vector max-abs scale,
    // quantized q_i = floor(v_i/scale + 0.5), summarized as (sum, min, max)
    // so the whole int8 codebook is oracle-checkable without array columns.
    // The storage op that turns a 100 TB float32 embedding table into 25 TB.
    QueryDef("x33_quantize_int8",
      (s, d) => {
        val maxAbs = expr("array_max(transform(embedding, v -> abs(cast(v as double))))")
        Tables.embeddings(s, d)
          .withColumn("max_abs", maxAbs)
          .withColumn("scale", col("max_abs") / 127.0)
          .withColumn("q", when(col("max_abs") === 0.0,
              expr("transform(embedding, v -> 0)"))
            .otherwise(expr(
              "transform(embedding, v -> cast(floor(cast(v as double) / (max_abs / 127.0) + 0.5) as int))")))
          .select(col("vec_id"),
            size(col("q")).cast("long").as("n_dims"),
            expr("aggregate(q, 0L, (acc, x) -> acc + x)").as("q_sum"),
            expr("array_min(q)").cast("long").as("q_min"),
            expr("array_max(q)").cast("long").as("q_max"),
            (floor(col("scale") * 1e8 + 0.5) / 1e8).as("scale"))
          .orderBy("vec_id")
      },
      Some("""WITH q AS (
                SELECT vec_id,
                       list_max(list_transform(embedding, v -> abs(v::DOUBLE))) AS max_abs,
                       CASE WHEN list_max(list_transform(embedding, v -> abs(v::DOUBLE))) = 0
                            THEN list_transform(embedding, v -> 0)
                            ELSE list_transform(embedding, v ->
                              CAST(floor(v::DOUBLE / (list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0) + 0.5) AS INTEGER))
                       END AS qv
                FROM embeddings)
              SELECT vec_id, CAST(len(qv) AS BIGINT) AS n_dims,
                     CAST(list_sum(qv) AS BIGINT) AS q_sum,
                     CAST(list_min(qv) AS BIGINT) AS q_min,
                     CAST(list_max(qv) AS BIGINT) AS q_max,
                     floor(max_abs / 127.0 * 1e8 + 0.5) / 1e8 AS scale
              FROM q ORDER BY vec_id""")),

    // x14 — multimodal feature extraction through the typed mapPartitions
    // seam. Schema/bytes/sha are real and oracle-checked; width/height are
    // the header parse and NULL for non-container payloads (document text
    // is never a PNG/JPEG/GIF, so the oracle pins the all-null contract —
    // "unknown", never a synthetic fake); pixel decode runs for PNG inputs
    // (MultimodalSpec pins exact pixels).
    QueryDef("x14_multimodal_features",
      (s, d) => {
        val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, d))
        Multimodal.extractFeatures(media).toDF()
          .select(col("media_id"), col("kind"), col("n_bytes"), col("sha"),
            col("width"), col("height"), col("sample_rate"), col("duration_ms"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
                     CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                     CAST(strlen(text) AS BIGINT) AS n_bytes,
                     sha256(text) AS sha,
                     CAST(NULL AS INTEGER) AS width,
                     CAST(NULL AS INTEGER) AS height,
                     CAST(NULL AS INTEGER) AS sample_rate,
                     CAST(NULL AS BIGINT) AS duration_ms
              FROM documents ORDER BY media_id""")),

    // x183 — compressed-audio header info through the SAME features row:
    // each doc synthesized as a REAL audio container chosen by doc_id % 3
    // (PCM WAV / Layer III MP3 frame stream / FLAC STREAMINFO — all built
    // by the MediaCodecs writers, all parsed back header-exactly by
    // audioInfo with NO sample decode), surfacing (sample_rate,
    // duration_ms) in the x14 features row. The oracle recomputes both
    // from the synthesis arithmetic WITHOUT ever seeing a container, so
    // the MP3 frame walk and FLAC STREAMINFO unpack are exact-checked.
    QueryDef("x183_audio_info",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              // codepoint length — the pixelDHashShared rationale
              val len = text.codePointCount(0, text.length).toLong
              val content = (id % 3) match {
                case 0 =>
                  Multimodal.MediaCodecs.wavEncode(
                    new Array[Short]((1 + len % 1000).toInt),
                    8000 + (id % 8).toInt * 1000)
                case 1 =>
                  Multimodal.MediaCodecs.mp3Encode((1 + id % 5).toInt)
                case _ =>
                  Multimodal.MediaCodecs.flacEncode(48000, 1 + len * 37 % 100000)
              }
              Multimodal.MediaFile(id, "audio", content, Map.empty)
            }
          }
        Multimodal.extractFeatures(media).toDF()
          .select(col("media_id").as("doc_id"), col("sample_rate"),
            col("duration_ms"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, length(text) AS n
                         FROM documents WHERE length(text) > 0)
              SELECT doc_id,
                     CAST(CASE doc_id % 3
                          WHEN 0 THEN 8000 + (doc_id % 8) * 1000
                          WHEN 1 THEN 44100
                          ELSE 48000 END AS INTEGER) AS sample_rate,
                     CAST(CASE doc_id % 3
                          WHEN 0 THEN ((1 + n % 1000) * 1000)
                                      // (8000 + (doc_id % 8) * 1000)
                          WHEN 1 THEN ((1 + doc_id % 5) * 1152 * 1000) // 44100
                          ELSE ((1 + (n * 37) % 100000) * 1000) // 48000
                          END AS BIGINT) AS duration_ms
              FROM d ORDER BY doc_id""")),

    // x184 — video container info: the x183 discipline on the video axis.
    // Each doc synthesized as a REAL AVI with per-doc dimensions, frame
    // count, and frame rate; videoInfo reads all four fields from the
    // avih MainAVIHeader ALONE (no movi walk, no frame decode — so it is
    // header-exact even for compressed codecs aviFrames refuses), and the
    // features row surfaces them (width/height/n_frames/duration_ms). The
    // oracle recomputes everything from the synthesis arithmetic,
    // including the two chained integer floors in duration (µs-per-frame
    // = 1000000 div fps, then frames × that div 1000).
    QueryDef("x184_video_info",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val w = 3 + (id % 5).toInt
              val h = 2 + (id % 3).toInt
              val nf = 1 + (id % 4).toInt
              val fps = 5 + (id % 6).toInt
              Multimodal.MediaFile(id, "video",
                Multimodal.MediaCodecs.aviEncode(
                  Seq.fill(nf)(Multimodal.Raster(w, h, 1, new Array[Byte](w * h))),
                  fps),
                Map.empty)
            }
          }
        Multimodal.extractFeatures(media).toDF()
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("n_frames"), col("duration_ms"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     CAST(3 + doc_id % 5 AS INTEGER) AS width,
                     CAST(2 + doc_id % 3 AS INTEGER) AS height,
                     CAST(1 + doc_id % 4 AS INTEGER) AS n_frames,
                     CAST((1 + doc_id % 4) * (1000000 // (5 + doc_id % 6))
                          // 1000 AS BIGINT) AS duration_ms
              FROM documents ORDER BY doc_id""")),

    // x188 — MP4/ISO-BMFF header info: the x184 discipline on the
    // container modern crawls actually carry. Each doc synthesized as a
    // REAL header-only MP4 (ftyp + fully nested moov, built by
    // MediaCodecs.mp4Encode) with per-doc dimensions, sample count,
    // timescale, and duration — alternating mvhd version 0/1 by doc_id so
    // BOTH the 32-bit and 64-bit time-field layouts are exercised through
    // the catalog, not just the spec. videoInfo reads everything from the
    // moov box walk alone (tkhd 16.16 dims, stsz sample count, mvhd
    // timescale+duration — no sample decode), and the oracle recomputes
    // all four fields from the synthesis arithmetic, including the
    // floored duration division.
    QueryDef("x188_mp4_info",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              Multimodal.MediaFile(id, "video",
                Multimodal.MediaCodecs.mp4Encode(
                  w = 16 + (id % 9).toInt,
                  h = 9 + (id % 7).toInt,
                  nFrames = 1 + (id % 6).toInt,
                  timescale = 600 * (1 + id % 4).toInt,
                  durationUnits = 500 + (id * 37) % 10000,
                  version = (id % 2).toInt),
                Map.empty)
            }
          }
        Multimodal.extractFeatures(media).toDF()
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("n_frames"), col("duration_ms"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     CAST(16 + doc_id % 9 AS INTEGER) AS width,
                     CAST(9 + doc_id % 7 AS INTEGER) AS height,
                     CAST(1 + doc_id % 6 AS INTEGER) AS n_frames,
                     CAST((500 + (doc_id * 37) % 10000) * 1000
                          // (600 * (1 + doc_id % 4)) AS BIGINT) AS duration_ms
              FROM documents ORDER BY doc_id""")),

    // x189 — the tokenizer seam exercised end-to-end: each doc's text is
    // deterministically mixed with a CJK fragment (Han digits, offset and
    // length keyed by doc_id — non-spaced script, exactly what degrades
    // the whitespace contract to one-token runs), then counted under all
    // three TextAnalysis tokenizer modes. The ws count sees the CJK
    // fragment as ONE token; the script mode splits it into per-codepoint
    // tokens while keeping Latin runs whole; the codepoint fallback
    // splits everything. The oracle recomputes all three in DuckDB (RE2
    // \p{Han} classes ≡ Java \p{IsHan} on these codepoints), so the seam
    // is hash-checked, not just gated.
    QueryDef("x189_script_tokens", {
      val cjk = "一二三四五六七八九十"
      (s: SparkSession, d: String) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            concat(expr("substr(text, 1, 40)"), lit(" "),
              expr(s"substr('$cjk', cast(doc_id % 6 as int) + 1, 4)"))
              .as("t"))
          .select(col("doc_id"),
            TextAnalysis.tokenCount(col("t"), "ws").cast("long").as("n_ws"),
            TextAnalysis.tokenCount(col("t"), "script").cast("long")
              .as("n_script"),
            TextAnalysis.tokenCount(col("t"), "codepoint").cast("long")
              .as("n_cp"))
          .orderBy("doc_id")
    },
      Some(s"""WITH m AS (
                SELECT doc_id,
                       substr(text, 1, 40) || ' ' ||
                       substr('一二三四五六七八九十',
                              CAST(doc_id % 6 AS INT) + 1, 4) AS t
                FROM documents)
              SELECT doc_id,
                     CAST(CASE WHEN length(trim(t)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(t), '\\s+'))
                          END AS BIGINT) AS n_ws,
                     CAST(len(regexp_extract_all(t,
                       '[\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Hangul}]|[^\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Hangul}\\s]+'))
                       AS BIGINT) AS n_script,
                     CAST(len(regexp_extract_all(t, '[^\\s]')) AS BIGINT)
                       AS n_cp
              FROM m ORDER BY doc_id""")),

    // x190 — JSONL training-shard export round-trip: the x80 discipline
    // on the format actual dataloaders consume. documents sharded by
    // doc_id % 8 → writeJsonlShards (gzip line-JSON + the shared
    // manifest: counts/bytes/files, content digests recounted from the
    // WRITTEN .json.gz files, per-file xxhash64 checksums, recorded DDL
    // schema) → validateShardsContent (the DEEP gate: listing + digest
    // recount + byte-checksum recount, format-dispatched off the
    // manifest) → readJsonlShards under the recorded schema → canonical
    // order. The oracle reads the PRE-export table, so a lost shard, an
    // encode/decode type drift, or a gzip-member corruption all fail the
    // row/hash compare.
    QueryDef("x190_jsonl_roundtrip",
      (s, d) => {
        val dir = exportScratchDir(d, "x190-jsonl")
        val counts = Export.writeJsonlShards(
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"), col("lang"), col("text"),
              (col("doc_id") % 8).cast("int").as("shard")),
          dir)
        val manifest = Export.validateShardsContent(s, dir)
        require(manifest == counts,
          s"jsonl manifest/written-counts mismatch: $manifest vs $counts")
        Export.readJsonlShards(s, dir)
          .select(col("doc_id"), col("source"), col("lang"), col("text"),
            col("shard"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, lang, text,
                     CAST(doc_id % 8 AS BIGINT) AS shard
              FROM documents ORDER BY doc_id""")),

    // x185 — dedup-channel overlap report: how the TEXT near-dup channel
    // (x07's exact shingle-Jaccard pairs) and the PIXEL channel (x167's
    // Hamming ≤ 3 dHash pairs over the doc-rendered images) agree — the
    // diagnostic a curation pipeline reads before trusting one channel to
    // stand in for the other (a 'both' majority says byte-cheap pixel
    // dedup captures the text dups; channel-only pairs say each modality
    // sees dups the other is blind to). One full-outer join of two SPARSE
    // pair sets on the pair key, then a 3-row aggregate; both inputs ride
    // their existing shared frames. Oracle recomputes BOTH channels from
    // scratch and joins them the same way.
    QueryDef("x185_dedup_channel_overlap",
      (s, d) => {
        val text = jaccardPairsShared(s, d)
          .select(col("ia"), col("ib"), lit(1).as("t"))
        val pixel = Dedup.hammingNearDupPairsOf(
            pixelDHashShared(s, d).filter(col("phash").isNotNull),
            "phash", hMax = 3, idCol = "media_id")
          .select(col("ia"), col("ib"), lit(1).as("p"))
        text.join(pixel, Seq("ia", "ib"), "full_outer")
          .select(when(col("t").isNotNull && col("p").isNotNull, lit("both"))
            .when(col("t").isNotNull, lit("text_only"))
            .otherwise(lit("pixel_only")).as("channel"))
          .groupBy(col("channel")).agg(count(lit(1)).as("n_pairs"))
          .orderBy("channel")
      },
      Some("""WITH jt AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
                   js AS (SELECT doc_id,
                       list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                         AS sh
                     FROM jt WHERE len(toks) >= 3),
                   jz AS (SELECT doc_id, len(sh) AS n FROM js),
                   je AS (SELECT doc_id, unnest(sh) AS g FROM js),
                   jp AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                            count(*) AS inter
                          FROM je a JOIN je b
                            ON a.g = b.g AND a.doc_id < b.doc_id
                          GROUP BY 1, 2),
                   tpairs AS (SELECT ia, ib
                              FROM jp JOIN jz za ON za.doc_id = jp.ia
                                JOIN jz zb ON zb.doc_id = jp.ib
                              WHERE CAST(inter AS DOUBLE)
                                    / (za.n + zb.n - inter) >= 0.6),
                   pd AS (SELECT doc_id, text, length(text) AS n
                          FROM documents WHERE length(text) > 0),
                   pg AS (SELECT doc_id, gy.range AS gy, gx.range AS gx,
                            ord(substr(text,
                              CAST(((gy.range * 9 + gx.range) % n) + 1
                                   AS BIGINT), 1)) % 256 AS v
                          FROM pd, range(0, 8) gy, range(0, 9) gx),
                   byts AS (SELECT a.doc_id, a.gy AS row_no,
                              CAST(sum(CASE WHEN b.v > a.v THEN 1 << a.gx
                                       ELSE 0 END) AS BIGINT) AS bits
                            FROM pg a JOIN pg b ON a.doc_id = b.doc_id
                              AND a.gy = b.gy AND b.gx = a.gx + 1
                            WHERE a.gx < 8 GROUP BY 1, 2),
                   ph AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                            CAST(sum(bit_count(xor(a.bits, b.bits)))
                                 AS BIGINT) AS ham
                          FROM byts a JOIN byts b
                            ON a.row_no = b.row_no AND a.doc_id < b.doc_id
                          GROUP BY 1, 2),
                   ppairs AS (SELECT ia, ib FROM ph WHERE ham <= 3),
                   u AS (SELECT CASE WHEN t.ia IS NOT NULL
                                      AND p.ia IS NOT NULL THEN 'both'
                                     WHEN t.ia IS NOT NULL THEN 'text_only'
                                     ELSE 'pixel_only' END AS channel
                         FROM tpairs t FULL OUTER JOIN ppairs p
                           ON t.ia = p.ia AND t.ib = p.ib)
              SELECT channel, CAST(count(*) AS BIGINT) AS n_pairs
              FROM u GROUP BY 1 ORDER BY channel""")),

    // x186 — containment (excerpt/quote) pair mining: the near-dup family
    // member symmetric Jaccard cannot express — containment of the
    // SMALLER side |A∩B| / min(|A|,|B|) ≥ 0.9 surfaces a verbatim excerpt
    // of a much longer doc (jacc ≈ |A|/|B|, invisible to x07 at any
    // useful threshold) — the dedup a training corpus needs against
    // quote-heavy crawl. Same one-evaluation postings join as x07, same
    // shared shingle frame; x146's verify grade already scores
    // containment on FOUND pairs — this entry is the finder.
    QueryDef("x186_containment_pairs",
      (s, d) => Dedup.containmentPairsOf(shinglesShared(s, d), threshold = 0.9)
        .orderBy("ia", "ib"),
      Some("""WITH t AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
                   s AS (SELECT doc_id,
                       list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                         AS sh
                     FROM t WHERE len(toks) >= 3),
                   z AS (SELECT doc_id, len(sh) AS n FROM s),
                   e AS (SELECT doc_id, unnest(sh) AS g FROM s),
                   p AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                           count(*) AS inter
                         FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
              SELECT ia, ib,
                     round(CAST(inter AS DOUBLE) / least(za.n, zb.n), 4) AS cont
              FROM p JOIN z za ON za.doc_id = p.ia
                JOIN z zb ON zb.doc_id = p.ib
              WHERE CAST(inter AS DOUBLE) / least(za.n, zb.n) >= 0.9
              ORDER BY ia, ib""")),

    // x187 — prefix-filtered containment: same pair set as x186 (the same
    // oracle proves it), found by probing each doc's rarest-first shingle
    // PREFIX against the full postings instead of joining all postings
    // pairwise — the exact scale answer to boilerplate-df blowup for the
    // asymmetric metric (the larger side of an excerpt pair cannot be
    // prefix-pruned, so prefix ⋈ full, not prefix ⋈ prefix).
    QueryDef("x187_containment_prefix",
      (s, d) => Dedup.containmentPairsPrefixOf(shinglesShared(s, d),
          threshold = 0.9).orderBy("ia", "ib"),
      Some("""WITH t AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
                   s AS (SELECT doc_id,
                       list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                         AS sh
                     FROM t WHERE len(toks) >= 3),
                   z AS (SELECT doc_id, len(sh) AS n FROM s),
                   e AS (SELECT doc_id, unnest(sh) AS g FROM s),
                   p AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                           count(*) AS inter
                         FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
              SELECT ia, ib,
                     round(CAST(inter AS DOUBLE) / least(za.n, zb.n), 4) AS cont
              FROM p JOIN z za ON za.doc_id = p.ia
                JOIN z zb ON zb.doc_id = p.ib
              WHERE CAST(inter AS DOUBLE) / least(za.n, zb.n) >= 0.9
              ORDER BY ia, ib""")),

    // x186b — streaming containment-flagging parity gate: the x161b
    // discipline on the excerpt guard. Freeze the EVEN docs as the
    // containmentFlagger's reference index, replay the ODD docs through a
    // REAL MemoryStream query in two uneven chops, and assert the union
    // of per-batch flags equals the batch x186-style pair set restricted
    // to odd-even pairs (oriented stream-side first) — the StreamingSpec
    // ingest-parity contract made oracle-visible, so a drift between the
    // frozen-index probe and the batch pair miner fails the correctness
    // gate, not only CI. Each batch's flags depend only on its own rows +
    // the frozen postings, so streaming ≡ batch on the same rows; exact
    // double equality holds because both paths run the identical
    // containment arithmetic on the identical shingle sets.
    QueryDef("x186b_containment_stream_gate",
      (s, d) => {
        import s.implicits._
        implicit val sq = s.sqlContext
        val docs = Tables.documents(s, d)
        val expected = Dedup.containmentPairs(docs, "text", "doc_id",
            n = 3, threshold = 0.8)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .collect { case (a, b, c) if a % 2 != b % 2 =>
            if (a % 2 == 1) (a, b, c) else (b, a, c) }.toSet
        val flag = Dedup.containmentFlagger(
          docs.filter(col("doc_id") % 2 === 0), "text", "doc_id",
          n = 3, threshold = 0.8)
        try {
          val rows = docs.filter(col("doc_id") % 2 =!= 0)
            .select(col("doc_id"), col("text")).collect()
            .map(r => (r.getLong(0), r.getString(1))).toSeq
          val mem = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(Long, String)]
          val acc = scala.collection.mutable.Set.empty[(Long, Long, Double)]
          val query = mem.toDF().toDF("doc_id", "text").writeStream
            .foreachBatch { (batch: DataFrame, _: Long) =>
              val got = flag(batch).collect()
                .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
              acc.synchronized { acc ++= got }
              ()
            }
            .outputMode("append").start()
          // two uneven chops: the second batch must flag against the
          // frozen index exactly as the first did, never against itself
          try {
            mem.addData(rows.take(rows.length / 3))
            query.processAllAvailable()
            mem.addData(rows.drop(rows.length / 3))
            query.processAllAvailable()
          } finally query.stop()
          Seq((acc.toSet == expected) && expected.nonEmpty)
            .toDF("containment_stream_ok")
        } finally flag.close()
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS containment_stream_ok")),

    // x15 — deterministic frame sampling: every 2nd 32-CHARACTER block of
    // the payload, fingerprinted. Pure column expressions (no UDF).
    // Character blocks, not bytes: DuckDB's substr is character-indexed and
    // it cannot md5 blobs, so byte blocks would silently diverge on the
    // first non-ASCII document. The byte path stays available on binary
    // columns (unit-tested), just not oracle-checkable.
    QueryDef("x15_frame_sample",
      (s, d) => {
        val media = Tables.documents(s, d).select(
          col("doc_id").as("media_id"), col("text").as("content"))
        Multimodal.sampleFrames(media, "content", "media_id", blockBytes = 32, stride = 2)
          .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
                  md5(col("frame_bytes")).as("frame_md5"))
          .orderBy("media_id", "frame_no")
      },
      Some("""WITH d AS (SELECT doc_id AS media_id, text,
                     greatest(CAST(ceil(length(text) / 32.0) AS BIGINT) - 1, 0) AS e
                   FROM documents),
                 l AS (SELECT media_id,
                     list_transform(range(0, e + 1, 2),
                       i -> md5(substr(text, CAST(i * 32 + 1 AS BIGINT), 32))) AS fr
                   FROM d)
              SELECT media_id, generate_subscripts(fr, 1) - 1 AS frame_no,
                     unnest(fr) AS frame_md5
              FROM l ORDER BY media_id, frame_no""")),

    // x66 — IVF batch retrieval: the index-probe twin of x54. Corpus
    // assigned once to coarse cells, queries probe their nProbe nearest
    // cells, exact cosine on the cell-join candidates — never queries ×
    // corpus (centroid training is engine hashing → rows-only; recall
    // gated by x67).
    QueryDef("x66_ivf_cross_topk",
      (s, d) => ivfCrossTopKShared(s, d).orderBy("query_id", "rnk"),
      None),

    // x67 — IVF retrieval recall gate: fraction of exact (query, neighbor)
    // edges the cell-probe path recovers; same single-scan gate shape as
    // x55, floor 0.8, tot=0 vacuous success.
    QueryDef("x67_ivf_cross_recall",
      (s, d) => recallGate(
        crossTopKShared(s, d).select(col("query_id"), col("vec_id")),
        ivfCrossTopKShared(s, d).select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), floor = 0.8),
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")),

    // x68 — per-language length trim: drop the shortest and longest 5% of
    // each language before training (the classic outlier filter — ultra-
    // short docs are boilerplate, ultra-long are concatenation junk). The
    // cut is EXACT integer arithmetic — rank > ceil(n/20), computed as
    // (n + 19) div 20, dodging any decimal-vs-binary percentile ambiguity
    // — with doc_id as the deterministic tie-break. Per-language windows
    // shuffle once on the natural partition key.
    QueryDef("x68_length_trim",
      (s, d) => {
        val wl = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
        val wn = Window.partitionBy(col("lang"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .withColumn("rn", row_number().over(wl))
          .withColumn("n", count(lit(1)).over(wn))
          .withColumn("cut", expr("(n + 19) div 20"))
          .filter(col("rn") > col("cut") && col("rn") <= col("n") - col("cut"))
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars, doc_id) AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
                   FROM documents)
              SELECT doc_id, lang, n_chars FROM t
              WHERE rn > (n + 19) // 20 AND rn <= n - (n + 19) // 20
              ORDER BY doc_id""")),

    // x69 — graded contamination: x29's boolean flag widened to a per-doc
    // overlap FRACTION (share of a train doc's distinct shingles seen
    // anywhere in the eval corpus) so pipelines can threshold/down-weight
    // instead of hard-dropping. Eval shingle set broadcast (benchmarks are
    // the small side by construction); the train side aggregates scan-side.
    QueryDef("x69_contamination_fraction",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.contaminationFraction(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          "text", "doc_id", n = 3)
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                   s AS (SELECT doc_id,
                           list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
                         FROM t WHERE len(toks) >= 3),
                   e AS (SELECT doc_id, unnest(sh) AS g FROM s),
                   ev AS (SELECT DISTINCT g FROM e WHERE doc_id % 7 = 0),
                   tr AS (SELECT doc_id, g FROM e WHERE doc_id % 7 <> 0)
              SELECT tr.doc_id AS doc_id, count(*) AS n_shingles,
                     count(ev.g) AS n_shared,
                     round(CAST(count(ev.g) AS DOUBLE) / count(*), 6) AS frac_shared
              FROM tr LEFT JOIN ev ON tr.g = ev.g
              GROUP BY 1 ORDER BY 1""")),

    // x70 — tokenizer fertility per language: subword tokens per word and
    // chars per subword token — the cost model of a tokenizer over a
    // multilingual corpus (a high-fertility language pays more sequence
    // length per word). Exact integer sums, one division at the end.
    QueryDef("x70_token_fertility",
      (s, d) => Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(
          sum(TextAnalysis.wsTokenCount(col("text")).cast("long")).as("n_words"),
          sum(TextAnalysis.bpeTokenCount(col("text")).cast("long")).as("n_bpe"),
          sum(length(col("text")).cast("long")).as("n_chars"))
        .withColumn("fertility",
          round(col("n_bpe").cast("double") / col("n_words"), 6))
        .withColumn("chars_per_token",
          round(col("n_chars").cast("double") / col("n_bpe"), 6))
        .orderBy("lang"),
      Some("""SELECT lang,
                     CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_words,
                     CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_bpe,
                     CAST(sum(length(text)) AS BIGINT) AS n_chars,
                     round(CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS DOUBLE)
                           / sum(CASE WHEN length(trim(text)) = 0 THEN 0
                                 ELSE len(string_split_regex(trim(text), '\s+')) END), 6) AS fertility,
                     round(CAST(sum(length(text)) AS DOUBLE)
                           / sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))), 6) AS chars_per_token
              FROM documents GROUP BY lang ORDER BY lang""")),

    // x71 — label-centroid similarity matrix: pairwise cosine between
    // per-label mean embeddings — the class-separation audit of an
    // embedding space (two labels whose centroids cosine ≈ 1 are not
    // separable; a label far from all others may be mislabeled data).
    // cos(mean_a, mean_b) = cos(sum_a, sum_b), so no division happens
    // until the end; elements are quantized to round(v·1e6) BIGINTs first,
    // making every sum/product EXACT integer arithmetic (decimal(38,0)
    // here, HUGEINT in the oracle) — immune to float summation order,
    // which a cross-engine avg() of floats is not. Scale shape: one scan →
    // map-side partial agg to k·dim rows; the k×k pairwise stage is
    // driver-trivial.
    QueryDef("x71_label_centroid_sim",
      (s, d) => {
        val cent = Tables.embeddings(s, d)
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(col("label"), col("pos"),
            expr("cast(round(cast(v as double) * 1000000) as decimal(38,0))").as("qv"))
          .groupBy(col("label"), col("pos"))
          .agg(sum(col("qv")).as("s"))
        val norms = cent.groupBy(col("label"))
          .agg(sum(col("s") * col("s")).as("n2"))
        val dots = cent.select(col("label").as("la"), col("pos"), col("s").as("sa"))
          .join(cent.select(col("label").as("lb"), col("pos"), col("s").as("sb")), "pos")
          .filter(col("la") < col("lb"))
          .groupBy(col("la"), col("lb"))
          .agg(sum(col("sa") * col("sb")).as("dot"))
        dots
          .join(norms.select(col("label").as("la"), col("n2").as("n2a")), "la")
          .join(norms.select(col("label").as("lb"), col("n2").as("n2b")), "lb")
          .select(col("la"), col("lb"),
            round(col("dot").cast("double") /
              sqrt(col("n2a").cast("double") * col("n2b").cast("double")), 6).as("cos"))
          .orderBy("la", "lb")
      },
      Some("""WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
                     unnest(embedding) AS v FROM embeddings),
                   q AS (SELECT label, pos,
                     CAST(round(v::DOUBLE * 1000000) AS HUGEINT) AS qv FROM e),
                   c AS (SELECT label, pos, sum(qv) AS s FROM q GROUP BY 1, 2),
                   n AS (SELECT label, sum(s * s) AS n2 FROM c GROUP BY 1),
                   p AS (SELECT a.label AS la, b.label AS lb, sum(a.s * b.s) AS dot
                         FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
                         GROUP BY 1, 2)
              SELECT la, lb, round(CAST(dot AS DOUBLE)
                       / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6) AS cos
              FROM p JOIN n na ON na.label = p.la JOIN n nb ON nb.label = p.lb
              ORDER BY la, lb""")),

    // x72 — MinHash calibration gate: the sketch-quality audit the x08/x19
    // family presumes. With one row per signature slot (bands = k = 64),
    // the matching-band fraction of a pair is an unbiased Jaccard estimate
    // (sd = sqrt(J(1-J)/64) ≈ 0.06); this gate computes it for every EXACT
    // pair (x07's set, jacc ≥ 0.6) and asserts the estimator tracks truth —
    // mean |est−jacc| ≤ 0.05, max ≤ 0.2 (measured 0.016-0.02 / 0.05-0.09 at
    // sf0.01/0.1; a broken hash or band slicing lands ≈ 0.3+ immediately).
    // n=0 pairs is vacuous success. Engine-specific hashing → boolean row.
    QueryDef("x72_minhash_calibration",
      (s, d) => {
        val sigs = shinglesShared(s, d)
          .filter(col("n_sh") > 0)
          .select(col("doc_id"),
            org.apache.spark.sql.graft.VectorFunctions
              .minHashBandsF(col("shs"), 64, 64).as("sig"))
        jaccardPairsShared(s, d)
          .join(sigs.select(col("doc_id").as("ia"), col("sig").as("siga")), "ia")
          .join(sigs.select(col("doc_id").as("ib"), col("sig").as("sigb")), "ib")
          .select(abs(col("jacc") -
            expr("aggregate(zip_with(siga, sigb, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
              .cast("double") / 64.0).as("ae"))
          .agg(count(lit(1)).as("n"), avg(col("ae")).as("mae"), max(col("ae")).as("max_ae"))
          .select((col("n") === 0L ||
            (col("mae") <= 0.05 && col("max_ae") <= 0.2)).as("calibration_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS calibration_ok")),

    // x73 — the END-TO-END curation pipeline as one artifact: exact dedup →
    // eval holdout → per-source relative quality filter (top half) →
    // decontamination against the held-out eval set → deterministic
    // content-hash sharding. Every stage is an operator proven above
    // (x01/x57/x29/x45/x52); this entry witnesses that they COMPOSE — the
    // "switch your pipeline to this library" query — and the whole chain is
    // one DuckDB-oracle row set. Scale: each stage keeps its own posture
    // (hash agg / per-source window / 8-byte-key bipartite join + anti-join
    // / scan-local shard key); nothing in the composition adds a shuffle
    // beyond the stages themselves.
    QueryDef("x73_curation_pipeline",
      (s, d) => curationShared(s, d),
      Some(curationOracle)),

    // x80 — the export sink's ROUND-TRIP on the board as an oracle row:
    QueryDef("x80_export_roundtrip",
      (s, d) => {
        // The full loop a training run actually exercises: curate (x73's
        // SHARED output frame — the export sink's cost is the round-trip,
        // not a second run of the whole pipeline) → writeShards
        // (partitioned parquet + Hadoop-FS manifest) → loader
        // validateShards (per-shard file count + byte integrity) →
        // readShards of EVERY manifest shard → canonical order. The oracle
        // is x73's SQL verbatim, so the round-trip is hash-checked against
        // the pre-export frame — a lost shard, a short manifest, or a
        // type-drifting partition column all fail the row/hash compare.
        // One STABLE scratch dir per sf-dir (Overwrite mode reuses it), so
        // repeated invocations in one JVM — warm-up, timed, AQE passes —
        // bound disk use and register exactly one cleanup hook.
        val dir = exportScratchDir(d)
        val counts = Export.writeShards(curationShared(s, d), dir)
        val manifest = Export.validateShards(s, dir)
        require(manifest == counts,
          s"manifest/written-counts mismatch: $manifest vs $counts")
        Export.readShards(s, dir, manifest.keySet.toSeq.sorted)
          .select(col("doc_id"), col("source"), col("score"),
            // partition-directory values read back type-inferred (int)
            col("shard").cast("long").as("shard"), col("pos"))
          .orderBy("shard", "pos")
      },
      Some(curationOracle)),

    // x74 — embedding-space audit: the validation row that runs BEFORE any
    // ANN/dedup work trusts a 100 TB embedding table — dimension
    // consistency (a single mis-dimensioned vector breaks every dot
    // product), zero-vector count (cosine undefined), and the norm²
    // distribution envelope. Elements quantize to round(v·1e3) BIGINTs so
    // all sums are exact integers (the x71 trick) — one scan, one
    // single-row aggregate, no shuffle beyond the final combine.
    QueryDef("x74_embedding_audit",
      (s, d) => Tables.embeddings(s, d)
        .select(
          size(col("embedding")).cast("long").as("dims"),
          expr("""aggregate(transform(embedding,
                    v -> cast(round(cast(v as double) * 1000) as bigint)),
                  0L, (acc, x) -> acc + x * x)""").as("n2q"))
        .agg(
          count(lit(1)).as("n_vecs"),
          min(col("dims")).as("dims_min"),
          max(col("dims")).as("dims_max"),
          sum(when(col("n2q") === 0L, 1L).otherwise(0L)).as("n_zero"),
          min(col("n2q")).as("n2q_min"),
          max(col("n2q")).as("n2q_max"),
          sum(col("n2q")).as("n2q_sum")),
      Some("""WITH q AS (SELECT len(embedding) AS dims,
                     list_sum(list_transform(embedding,
                       v -> CAST(round(v::DOUBLE * 1000) AS BIGINT)
                          * CAST(round(v::DOUBLE * 1000) AS BIGINT))) AS n2q
                   FROM embeddings)
              SELECT count(*) AS n_vecs,
                     CAST(min(dims) AS BIGINT) AS dims_min,
                     CAST(max(dims) AS BIGINT) AS dims_max,
                     CAST(sum(CASE WHEN n2q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
                     CAST(min(n2q) AS BIGINT) AS n2q_min,
                     CAST(max(n2q) AS BIGINT) AS n2q_max,
                     CAST(sum(n2q) AS BIGINT) AS n2q_sum
              FROM q""")),

    // x75 — packing-efficiency curve: the x135 packPlan layout evaluated
    // at several sequence budgets at once — n_seqs, packed tokens, and the
    // utilization fraction per budget — the diagnostic that picks a
    // training sequence length (too-long budgets waste capacity on the
    // final partial fill of each sequence; the curve makes the trade
    // visible). The curve runs off the SHARED two-phase prefix-sum
    // coordinates (Pack.packPlan — cum_before is capacity-independent, so
    // the x135 frame serves every budget): no global unpartitioned window
    // anywhere, the bounded-window layout a 100 TB user runs as-is.
    // Budgets explode off the computed running total (a per-budget branch
    // would re-run the whole layout three times). x32 keeps the textbook
    // doc_id-ordered global-cumsum form for contrast; this entry is the
    // scale path.
    QueryDef("x75_packing_efficiency",
      (s, d) => packPlanShared(s, d)
        .select(col("doc_id"), col("n_tokens").as("toks"),
          col("cum_before").as("cum"))
        .withColumn("budget",
          explode(array(lit(128L), lit(512L), lit(2048L))))
        .withColumn("seq_id", expr("cum div budget"))
        .groupBy(col("budget"), col("seq_id"))
        .agg(sum(col("toks")).as("seq_toks"))
        .groupBy(col("budget"))
        .agg(count(lit(1)).as("n_seqs"), sum(col("seq_toks")).as("n_tokens"))
        .select(col("budget"), col("n_seqs"), col("n_tokens"),
          round(col("n_tokens").cast("double") /
            (col("n_seqs") * col("budget")).cast("double"), 6).as("utilization"))
        .orderBy("budget"),
      Some("""WITH t AS (SELECT doc_id,
                     CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                 c AS (SELECT doc_id, toks,
                     CAST(coalesce(sum(toks) OVER (ORDER BY okey, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cum
                   FROM t),
                 b AS (SELECT unnest([128, 512, 2048]) AS budget),
                 s AS (SELECT b.budget, CAST(c.cum // b.budget AS BIGINT) AS seq_id,
                              sum(c.toks) AS seq_toks
                       FROM c CROSS JOIN b GROUP BY 1, 2)
              SELECT CAST(budget AS BIGINT) AS budget,
                     count(*) AS n_seqs,
                     CAST(sum(seq_toks) AS BIGINT) AS n_tokens,
                     round(CAST(sum(seq_toks) AS DOUBLE)
                           / (count(*) * budget), 6) AS utilization
              FROM s GROUP BY budget ORDER BY budget""")),

    // x76 — per-source quality drift: each source's quality distribution
    // vs the whole corpus as an exact Mann-Whitney AUC (the probability a
    // random doc of the source out-scores a random corpus doc; 0.5 = no
    // drift). The ranking is HISTOGRAM-BASED — the score lives on a
    // bounded 1e4 grid, so midranks come from a cumulative sum over the
    // ≤ 10,001-row histogram (broadcast back to the per-source counts),
    // never a global sort of the corpus: the scalable substitute for a
    // corpus-wide rank window. Doubled midranks (2·cum + cnt + 1) keep
    // tie-averaging in integers; the one unpartitioned window runs over
    // the histogram, not the data.
    QueryDef("x76_source_quality_drift",
      (s, d) => {
        val q = Tables.documents(s, d)
          .select(col("source"), TextAnalysis.qualityScoreInt(col("text")).as("q"))
        val hist = q.groupBy(col("q")).agg(count(lit(1)).as("cnt"))
        val wcum = Window.orderBy(col("q"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranks = hist
          .withColumn("cum", coalesce(sum(col("cnt")).over(wcum), lit(0L)))
          .select(col("q"), (col("cum") * 2 + col("cnt") + 1).as("mr2"))
        val tot = hist.agg(sum(col("cnt")).as("n_total"))
        q.groupBy(col("source"), col("q")).agg(count(lit(1)).as("scnt"))
          .join(broadcast(ranks), "q")
          .groupBy(col("source"))
          .agg(sum(col("scnt") * col("mr2")).as("r2"),
            sum(col("scnt")).as("n_docs"))
          .crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"),
            // degenerate split (one source IS the corpus) → no comparison
            // population → AUC undefined: null in BOTH engines (Spark's
            // non-ANSI /0 null vs DuckDB inf would otherwise disagree)
            when(col("n_total") === col("n_docs"), lit(null).cast("double"))
              .otherwise(
                round((col("r2") - col("n_docs") * (col("n_docs") + 1)).cast("double")
                  / (lit(2.0) * col("n_docs").cast("double")
                     * (col("n_total") - col("n_docs")).cast("double")), 6))
              .as("auc"))
          .orderBy("source")
      },
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH tq AS (SELECT source, CAST(floor((
                  least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                + (1.0 - least(CAST(p AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                ) * 10000.0 + 0.5) AS BIGINT) AS q
              FROM (SELECT source,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                      length(text) AS ch,
                      len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS p,
                      len(regexp_extract_all(text, '[A-Z]')) AS u,
                      len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                    FROM documents) t),
                h AS (SELECT q, count(*) AS cnt FROM tq GROUP BY q),
                r AS (SELECT q, 2 * COALESCE(sum(cnt) OVER (ORDER BY q
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        + cnt + 1 AS mr2
                      FROM h),
                n AS (SELECT count(*) AS n_total FROM tq),
                sq AS (SELECT source, q, count(*) AS scnt FROM tq GROUP BY 1, 2),
                agg AS (SELECT sq.source, sum(sq.scnt * r.mr2) AS r2,
                               sum(sq.scnt) AS n_docs
                        FROM sq JOIN r USING (q) GROUP BY 1)
            SELECT agg.source, CAST(agg.n_docs AS BIGINT) AS n_docs,
                   round(CAST(agg.r2 - agg.n_docs * (agg.n_docs + 1) AS DOUBLE)
                         / (2.0 * agg.n_docs
                            * NULLIF(n.n_total - agg.n_docs, 0)), 6) AS auc
            FROM agg, n ORDER BY source"""
      }),

    // x77 — incremental dedup: the DAILY-CRAWL shape — a new batch
    // (doc_id % 5 = 0) deduplicated against the existing corpus AND
    // against itself, each new doc labeled kept / dup_corpus / dup_batch.
    // Keys on the ORDER-INSENSITIVE bag-of-words fingerprint (byte-exact
    // fingerprints find zero dups on this fixture — every text is unique —
    // while shuffled-template docs share token sets: 10 corpus dups at
    // sf0.01); the dup_batch branch is pinned by a DedupSpec fixture.
    QueryDef("x77_incremental_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.incrementalDedup(
          docs.filter(col("doc_id") % 5 === 0),
          docs.filter(col("doc_id") % 5 =!= 0),
          "text", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH f AS (SELECT doc_id,
                     md5(array_to_string(list_sort(list_distinct(
                       CASE WHEN length(trim(text)) = 0 THEN []
                            ELSE string_split_regex(trim(text), '\s+') END)), ' ')) AS fp
                   FROM documents),
                   c AS (SELECT DISTINCT fp FROM f WHERE doc_id % 5 <> 0),
                   b AS (SELECT doc_id, fp,
                           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
                         FROM f WHERE doc_id % 5 = 0)
              SELECT b.doc_id,
                     CASE WHEN c.fp IS NOT NULL THEN 'dup_corpus'
                          WHEN b.rn > 1 THEN 'dup_batch'
                          ELSE 'kept' END AS status
              FROM b LEFT JOIN c USING (fp) ORDER BY doc_id""")),

    // x78 — hard quality rules (the Gopher/Dolma-style rule bundle): word
    // count bounds, mean word length bounds, symbol ratio, digit ratio —
    // each as a per-doc boolean with the conjunction. EVERY rule is
    // integer cross-multiplication (mean-word-length ∈ [2,12] ⟺
    // 2·words ≤ nonspace_chars ≤ 12·words; ratio ≤ 0.3 ⟺ 10·cnt ≤
    // 3·chars) — no float compares anywhere, so the booleans cannot drift
    // cross-engine. Scan-local, codegen'd, zero shuffle.
    QueryDef("x78_quality_rules",
      (s, d) => {
        val words = TextAnalysis.wsTokenCount(col("text")).cast("long")
        val chars = length(col("text")).cast("long")
        val nonspace = length(regexp_replace(col("text"), "\\s", "")).cast("long")
        val symbols = size(regexp_extract_all(col("text"),
          lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")
        val digits = size(regexp_extract_all(col("text"),
          lit("[0-9]"), lit(0))).cast("long")
        Tables.documents(s, d)
          .select(col("doc_id"),
            words.as("n_words"),
            (words >= 10 && words <= 1000).as("wc_ok"),
            (nonspace >= words * 2 && nonspace <= words * 12).as("mwl_ok"),
            (symbols * 10 <= chars * 3).as("sym_ok"),
            (digits * 10 <= chars * 3).as("dig_ok"))
          .withColumn("pass",
            col("wc_ok") && col("mwl_ok") && col("sym_ok") && col("dig_ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, w AS n_words,
                     (w >= 10 AND w <= 1000) AS wc_ok,
                     (ns >= 2 * w AND ns <= 12 * w) AS mwl_ok,
                     (10 * sy <= 3 * ch) AS sym_ok,
                     (10 * dg <= 3 * ch) AS dig_ok,
                     ((w >= 10 AND w <= 1000) AND (ns >= 2 * w AND ns <= 12 * w)
                      AND (10 * sy <= 3 * ch) AND (10 * dg <= 3 * ch)) AS pass
              FROM (SELECT doc_id,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS w,
                      CAST(length(text) AS BIGINT) AS ch,
                      CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS ns,
                      CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS sy,
                      CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS dg
                    FROM documents) t
              ORDER BY doc_id""")),

    // x79 — quality-weighted epoch assignment: the data-recipe step that
    // UP-SAMPLES good sources (the x44 token-budget mix bounds, this one
    // repeats): sources ranked by mean quality (exact integer score sums;
    // the one double division is identical IEEE in both engines, ties
    // broken by source name), top quarter trains 3 epochs, top half 2,
    // rest 1; each doc emits one row per epoch via a sequence explode.
    // The rank runs over the ~|sources| aggregate rows, never the docs.
    QueryDef("x79_source_epochs",
      (s, d) => {
        val perSrc = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(sum(TextAnalysis.qualityScoreInt(col("text"))).as("qsum"),
            count(lit(1)).as("n"))
        val wr = Window.orderBy(
          (col("qsum").cast("double") / col("n").cast("double")).desc,
          col("source"))
        val wn = Window.partitionBy(lit(1))
        val epochs = perSrc
          .withColumn("rnk", row_number().over(wr))
          .withColumn("nsrc", count(lit(1)).over(wn))
          .select(col("source"),
            when(col("rnk") * 4 <= col("nsrc"), 3L)
              .when(col("rnk") * 2 <= col("nsrc"), 2L)
              .otherwise(1L).as("n_epochs"))
        Tables.documents(s, d).select(col("doc_id"), col("source"))
          .join(broadcast(epochs), "source")
          .select(col("doc_id"), col("source"),
            explode(expr("sequence(1L, n_epochs)")).as("epoch"))
          .orderBy("doc_id", "epoch")
      },
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH q AS (SELECT doc_id, source, CAST(floor((
                  least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                + (1.0 - least(CAST(p AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                ) * 10000.0 + 0.5) AS BIGINT) AS qi
              FROM (SELECT doc_id, source,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                      length(text) AS ch,
                      len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS p,
                      len(regexp_extract_all(text, '[A-Z]')) AS u,
                      len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                    FROM documents) t),
                ps AS (SELECT source, sum(qi) AS qsum, count(*) AS n FROM q GROUP BY 1),
                r AS (SELECT source,
                        row_number() OVER (ORDER BY CAST(qsum AS DOUBLE) / n DESC, source) AS rnk,
                        count(*) OVER () AS nsrc
                      FROM ps),
                e AS (SELECT source,
                        CASE WHEN rnk * 4 <= nsrc THEN 3
                             WHEN rnk * 2 <= nsrc THEN 2
                             ELSE 1 END AS n_epochs
                      FROM r)
            SELECT d.doc_id, d.source, CAST(unnest(range(1, e.n_epochs + 1)) AS BIGINT) AS epoch
            FROM documents d JOIN e USING (source)
            ORDER BY doc_id, epoch"""
      }),

    // x81 — per-source token-distribution KL divergence vs the corpus:
    // KL(p_src ‖ p_corpus) = (Σc·ln c − Σc·ln C)/n − ln n + ln N over the
    // (source, token) counts — the VOCABULARY-drift companion of x76's
    // quality drift (a source can hold quality while its token mix walks
    // away from the corpus). The (source, token) aggregate is evaluated
    // ONCE: the corpus-wide token count rides as a window over it
    // (partition by token — a join back to a derived histogram would
    // re-evaluate the whole aggregate subtree per branch), and N comes
    // from a second window over the ~|sources| aggregate rows. The x30
    // exact-count-ln-then-round trick keeps the float math cross-engine
    // comparable; p is absolutely continuous wrt q by construction (every
    // source token IS a corpus token), so no infinite terms exist.
    QueryDef("x81_source_token_kl",
      (s, d) => {
        val st = Tables.documents(s, d)
          .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
        st.withColumn("cc", sum(col("c")).over(Window.partitionBy(col("tok"))))
          .groupBy(col("source"))
          .agg(sum(col("c")).as("n_tokens"),
            sum(col("c").cast("double") * log(col("c").cast("double"))).as("clc"),
            sum(col("c").cast("double") * log(col("cc").cast("double"))).as("clcc"))
          .withColumn("n_total",
            sum(col("n_tokens")).over(Window.partitionBy(lit(1))))
          .select(col("source"), col("n_tokens"),
            (floor(((col("clc") - col("clcc")) / col("n_tokens").cast("double")
              - log(col("n_tokens").cast("double"))
              + log(col("n_total").cast("double"))) * 10000.0 + 0.5) / 10000.0).as("kl"))
          .orderBy("source")
      },
      Some("""WITH e AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
                         FROM documents WHERE length(trim(text)) > 0),
                  st AS (SELECT source, tok, count(*) AS c FROM e GROUP BY 1, 2),
                  ct AS (SELECT tok, sum(c) AS cc FROM st GROUP BY 1),
                  n AS (SELECT sum(cc) AS n_total FROM ct)
              SELECT st.source, CAST(sum(st.c) AS BIGINT) AS n_tokens,
                     floor(((sum(CAST(st.c AS DOUBLE) * ln(CAST(st.c AS DOUBLE)))
                            - sum(CAST(st.c AS DOUBLE) * ln(CAST(ct.cc AS DOUBLE))))
                              / CAST(sum(st.c) AS DOUBLE)
                            - ln(CAST(sum(st.c) AS DOUBLE))
                            + ln(CAST(n.n_total AS DOUBLE))) * 10000.0 + 0.5)
                       / 10000.0 AS kl
              FROM st JOIN ct USING (tok), n
              GROUP BY st.source, n.n_total ORDER BY source""")),

    // x82 — language-ID confusion matrix: stored `lang` label vs the x04
    // n-gram predictor, as (lang, lang_guess, n) cells — the label-quality
    // audit a curation pipeline runs before trusting EITHER signal for
    // filtering (a hot off-diagonal cell means mislabeled source data or a
    // profile gap). One hash aggregate over the scan; the matrix is at
    // most |langs|² rows.
    QueryDef("x82_lang_confusion",
      (s, d) => Tables.documents(s, d)
        .groupBy(col("lang"), TextAnalysis.langGuess(col("text")).as("lang_guess"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_guess"),
      Some {
        val hits = TextAnalysis.langProfiles.map { case (code, words) =>
          code -> s"CAST(len(regexp_extract_all(lower(text), '\\b(${words.mkString("|")})\\b')) AS BIGINT)"
        }
        val best = hits.map(_._2).mkString("greatest(", ", ", ")")
        val cases = hits.init.reverse.foldLeft(s"'${hits.last._1}'") {
          case (acc, (code, e)) => s"CASE WHEN $e = $best THEN '$code' ELSE $acc END"
        }
        s"""SELECT lang, $cases AS lang_guess, count(*) AS n
            FROM documents GROUP BY 1, 2 ORDER BY lang, lang_guess"""
      }),

    // x83 — near-dup threshold yield curve: pair counts at Jaccard ≥
    // 0.6/0.7/0.8/0.9 from the ONE shared uncapped pair set — the
    // threshold-tuning diagnostic behind every dedup rollout (how much
    // more collapses as the bar drops). Conditional sums over the persisted
    // x07 frame: no re-mining, one aggregate row, coalesced so an empty
    // pair set reads as zeros rather than nulls.
    QueryDef("x83_jaccard_threshold_curve",
      (s, d) => jaccardPairsShared(s, d)
        .agg(
          count(lit(1)).as("n_06"),
          coalesce(sum(when(col("jacc") >= 0.7, 1L).otherwise(0L)), lit(0L)).as("n_07"),
          coalesce(sum(when(col("jacc") >= 0.8, 1L).otherwise(0L)), lit(0L)).as("n_08"),
          coalesce(sum(when(col("jacc") >= 0.9, 1L).otherwise(0L)), lit(0L)).as("n_09")),
      Some(s"""WITH jp AS ($jaccardOracle)
              SELECT count(*) AS n_06,
                     CAST(coalesce(sum(CASE WHEN jacc >= 0.7 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_07,
                     CAST(coalesce(sum(CASE WHEN jacc >= 0.8 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_08,
                     CAST(coalesce(sum(CASE WHEN jacc >= 0.9 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_09
              FROM jp""")),

    // x84 — shard balance audit: per x52 content-hash shard, doc and token
    // counts plus each shard's parts-per-million share of the corpus — the
    // operational companion of the export sink (an unbalanced shard is a
    // dataloader straggler; md5 sharding should sit near 62,500 ppm each
    // on 16 shards). Shares are integer ppm (exact cross-engine, no float
    // division); totals ride as a window over the 16 aggregate rows.
    QueryDef("x84_shard_balance",
      (s, d) => {
        val wAll = Window.partitionBy(lit(1))
        Tables.documents(s, d)
          .select(
            expr("CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT)").as("shard"),
            TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
          .withColumn("total_docs", sum(col("n_docs")).over(wAll))
          .withColumn("total_tokens", sum(col("n_tokens")).over(wAll))
          .withColumn("doc_ppm", expr("n_docs * 1000000 div total_docs"))
          .withColumn("token_ppm", expr("n_tokens * 1000000 div total_tokens"))
          .select(col("shard"), col("n_docs"), col("n_tokens"),
            col("doc_ppm").cast("long").as("doc_ppm"),
            col("token_ppm").cast("long").as("token_ppm"))
          .orderBy("shard")
      },
      Some("""WITH t AS (SELECT
                     CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT) AS shard,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks
                   FROM documents),
                  g AS (SELECT shard, count(*) AS n_docs, sum(toks) AS n_tokens
                        FROM t GROUP BY 1)
              SELECT shard, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
                     CAST(n_docs * 1000000 // sum(n_docs) OVER () AS BIGINT) AS doc_ppm,
                     CAST(n_tokens * 1000000 // sum(n_tokens) OVER () AS BIGINT) AS token_ppm
              FROM g ORDER BY shard""")),

    // x85 — SEMANTIC curation pipeline: the embedding-side twin of x73's
    // shingle pipeline, composing x01 + x11 + x46 + x35 machinery — exact
    // text dedup → embedding near-dup clusters over the SURVIVORS
    // (documents ⋈ embeddings on the aligned doc_id/vec_id) → one
    // highest-quality canonical per cluster (lowest-id tie-break) →
    // non-clustered survivors pass through. The exact quadratic pair
    // baseline keeps this oracle-checkable; at scale the candidate source
    // swaps to srpCosinePairs/ivfCosinePairs (same downstream — the x46
    // lesson), and every stage keeps its own documented posture.
    QueryDef("x85_semantic_curation",
      (s, d) => Curation.semanticCurate(
          Tables.documents(s, d), Tables.embeddings(s, d),
          vecs => Similarity.cosinePairs(vecs, threshold = 0.35))
        .orderBy("doc_id"),
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH RECURSIVE
              dd AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
              sv AS (SELECT e.vec_id, e.embedding FROM embeddings e
                     JOIN dd ON dd.doc_id = e.vec_id),
              p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
                    FROM sv a JOIN sv b ON a.vec_id < b.vec_id
                    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                       b.embedding::DOUBLE[]), 6) >= 0.35),
              e2 AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
              r AS (SELECT a AS id, a AS reach FROM e2
                    UNION
                    SELECT r.id, e2.b FROM r JOIN e2 ON e2.a = r.reach),
              cl AS (SELECT id AS doc_id, min(reach) AS rep FROM r GROUP BY id),
              q AS (SELECT doc_id, floor((
                      least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                    + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                    + (1.0 - least(CAST(pn AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                    + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                    ) * 10000.0 + 0.5) / 10000.0 AS score
                  FROM (SELECT doc_id,
                          CASE WHEN length(trim(text)) = 0 THEN 0
                               ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                          length(text) AS ch,
                          len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS pn,
                          len(regexp_extract_all(text, '[A-Z]')) AS u,
                          len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                        FROM documents) t),
              pick AS (SELECT doc_id FROM (
                         SELECT cl.doc_id,
                                row_number() OVER (PARTITION BY cl.rep
                                  ORDER BY q.score DESC, cl.doc_id) AS rn
                         FROM cl JOIN q USING (doc_id)) z
                       WHERE rn = 1),
              kept AS (SELECT doc_id FROM dd
                       WHERE doc_id NOT IN (SELECT doc_id FROM cl)
                       UNION SELECT doc_id FROM pick)
            SELECT k.doc_id, d.source, q.score
            FROM kept k JOIN documents d USING (doc_id) JOIN q USING (doc_id)
            ORDER BY doc_id"""
      }),

    // x86 — head-duplicate detection: docs sharing their first 8 tokens —
    // the PARTIAL re-crawl/truncation family that whole-text (x01),
    // bag-of-words (x77), and shingle (x07) dedup each miss or over-match
    // (a doc cut mid-way keeps its head verbatim; a template keeps its
    // head while the tail varies). Group key is the 8-token head string;
    // both per-group stats ride one window partition (a single shuffle on
    // the head — at scale hash the head to an 8-byte key first, the x07
    // postings trick).
    QueryDef("x86_head_dup",
      (s, d) => {
        val heads = Tables.documents(s, d)
          .select(col("doc_id"),
            concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 8)).as("head"))
          .filter(length(col("head")) > 0)
        val w = Window.partitionBy(col("head"))
        heads
          .withColumn("n_same_head", count(lit(1)).over(w))
          .withColumn("head_rep", min(col("doc_id")).over(w))
          .filter(col("n_same_head") >= 2)
          .select(col("doc_id"), col("head_rep"), col("n_same_head"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id,
                     array_to_string((string_split_regex(trim(text), '\s+'))[1:8], ' ') AS head
                   FROM documents WHERE length(trim(text)) > 0),
                  g AS (SELECT doc_id, head,
                          count(*) OVER (PARTITION BY head) AS n_same_head,
                          min(doc_id) OVER (PARTITION BY head) AS head_rep
                        FROM h)
              SELECT doc_id, head_rep, n_same_head
              FROM g WHERE n_same_head >= 2 ORDER BY doc_id"""))
    ,

    // x87 — per-source exact-dup rate: docs, distinct contents, dup count
    // and integer-ppm dup rate per source — "which source re-crawls
    // itself", the provenance report that decides where dedup budget goes
    // (x65 answers the cross-source question for NEAR dups; this one is
    // the within-source exact rate). Distinct counting keys on the
    // 256-bit content hash, never the raw text — the x01 shuffle posture.
    QueryDef("x87_source_dup_rate",
      (s, d) => Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(sha2(col("text"), 256)).as("n_distinct"))
        .withColumn("n_dups", col("n_docs") - col("n_distinct"))
        .withColumn("dup_ppm", expr("n_dups * 1000000 div n_docs"))
        .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs,
                     count(DISTINCT sha256(text)) AS n_distinct,
                     count(*) - count(DISTINCT sha256(text)) AS n_dups,
                     CAST((count(*) - count(DISTINCT sha256(text))) * 1000000
                          // count(*) AS BIGINT) AS dup_ppm
              FROM documents GROUP BY source ORDER BY source""")),

    // x88 — SEMANTIC eval contamination: train vectors too cosine-similar
    // to ANY held-out eval vector (vec_id % 7 = 0, the x29 holdout
    // convention) — the embedding-space complement of shingle
    // decontamination (paraphrased leaks share no n-grams but sit next to
    // the eval point in embedding space). The eval side is the SMALL side
    // by contract (a benchmark suite): its norm-carrying vectors broadcast
    // and the train side — the 100 TB side — aggregates per vec_id in one
    // scan, no train-side shuffle of vectors. A corpus-sized "eval" set
    // belongs on srpCrossTopK/ivfCrossTopK instead (same flag, banded/
    // celled candidates). Output: flagged train vecs with how many eval
    // neighbors and the max cosine.
    QueryDef("x88_semantic_contamination",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val evalN = Similarity.withNorms(emb.filter(col("vec_id") % 7 === 0))
          .select(col("vec_id").as("eval_id"), col("embedding").as("ee"),
            col("nrm").as("enrm"))
        Similarity.withNorms(emb.filter(col("vec_id") % 7 =!= 0))
          .crossJoin(broadcast(evalN))
          .select(col("vec_id"),
            round(Similarity.dot(col("embedding"), col("ee"))
              / (col("nrm") * col("enrm")), 6).as("cos"))
          .filter(col("cos") >= 0.35)
          .groupBy(col("vec_id"))
          .agg(count(lit(1)).as("n_close"), max(col("cos")).as("max_cos"))
          .orderBy("vec_id")
      },
      Some("""WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 = 0),
                  tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 <> 0),
                  p AS (SELECT tr.vec_id,
                          round(list_cosine_similarity(tr.embedding::DOUBLE[],
                                                       ev.embedding::DOUBLE[]), 6) AS cos
                        FROM tr CROSS JOIN ev)
              SELECT vec_id, count(*) AS n_close, max(cos) AS max_cos
              FROM p WHERE cos >= 0.35
              GROUP BY vec_id ORDER BY vec_id""")),

    // x89 — corpus VERSION diff: the incremental-snapshot primitive (x77
    // labels one arriving batch against a static corpus; this one diffs two
    // whole corpus versions — the nightly "what changed" report an
    // incremental pipeline keys its recompute off). Doc-level status by
    // CONTENT: a new-version doc is `retained` when its content existed
    // anywhere in the old version (under any doc_id), else `added`; an
    // old-version doc whose content vanished is `removed`. All joins key on
    // the 256-bit content hash computed map-side — at 100 TB the text never
    // shuffles, only 32-byte keys do, and each side is one scan.
    QueryDef("x89_corpus_diff",
      (s, d) => {
        // NULL text is excluded on BOTH engines up front: sha2(NULL) keys
        // would silently pass Spark's anti-join while a NOT IN/NOT EXISTS
        // oracle three-values away every removed row — a diff over
        // contentless docs is meaningless anyway.
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val oldV = docs.filter(col("doc_id") % 3 =!= 2)
          .select(col("doc_id"), sha2(col("text"), 256).as("h"))
        val newV = docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"), sha2(col("text"), 256).as("h"))
        val oldC = oldV.select("h").distinct()
        val newC = newV.select("h").distinct()
        newV.join(oldC, Seq("h"), "left_semi")
          .select(col("doc_id"), lit("retained").as("status"))
          .union(newV.join(oldC, Seq("h"), "left_anti")
            .select(col("doc_id"), lit("added").as("status")))
          .union(oldV.join(newC, Seq("h"), "left_anti")
            .select(col("doc_id"), lit("removed").as("status")))
          .orderBy("doc_id", "status")
      },
      Some("""WITH oldv AS (SELECT doc_id, text FROM documents
                            WHERE doc_id % 3 <> 2 AND text IS NOT NULL),
                  newv AS (SELECT doc_id, text FROM documents
                            WHERE doc_id % 3 <> 0 AND text IS NOT NULL)
              SELECT doc_id, status FROM (
                SELECT doc_id,
                       CASE WHEN EXISTS (SELECT 1 FROM oldv o WHERE o.text = newv.text)
                            THEN 'retained' ELSE 'added' END AS status
                FROM newv
                UNION ALL
                SELECT doc_id, 'removed' AS status FROM oldv
                WHERE NOT EXISTS (SELECT 1 FROM newv n WHERE n.text = oldv.text))
              ORDER BY doc_id, status""")),

    // x90 — cell-diverse subsample: per-IVF-cell top-q by quality — the
    // diversity-aware curation cut (a pure quality top-N collapses onto the
    // densest region of embedding space; a per-cell quota keeps every
    // neighborhood represented, the flip side of SemDeDup's per-cluster
    // drop). k-means training is engine-specific, so rows-only; the x91
    // gate pins the quota contract. Scale: training is one bounded-sample
    // scan, assignment one codegen'd argmax scan, the quality join moves
    // (id, score) pairs only, and the rank window partitions by cell — at
    // corpus scale k grows as n/targetCell (adaptiveClusters), keeping
    // per-cell sort volume pinned.
    QueryDef("x90_cell_diverse_sample",
      (s, d) => diverseRankedShared(s, d)
        .filter(col("rnk") <= 8)
        .select(col("vec_id"), col("cluster"), col("rnk"))
        .orderBy("cluster", "rnk"),
      None),

    // x91 — the x90 quota GATE: every cell keeps exactly min(cell size, q)
    // docs — the boolean contract an engine-specific clustering can still
    // be held to (the x43/x48 pattern). The expected populations are
    // re-derived from the RAW assignment + quality semi-join, NOT from the
    // ranked frame x90 filters — two independent paths to the same count,
    // so a broken window order, rank duplication, or dropped join rows in
    // the shared frame fails the gate instead of passing by construction.
    QueryDef("x91_diverse_sample_gate",
      (s, d) => {
        val kept = diverseRankedShared(s, d)
          .filter(col("rnk") <= 8)
          .groupBy(col("cluster")).agg(count(lit(1)).as("n_kept"))
        val expect = Ivf.assign(Tables.embeddings(s, d), diverseCentroids(s, d))
          .join(Tables.documents(s, d).select(col("doc_id").as("vec_id")),
            Seq("vec_id"), "left_semi")
          .groupBy(col("cluster"))
          .agg(least(count(lit(1)), lit(8L)).as("n_want"))
        expect.join(kept, Seq("cluster"), "full")
          .agg(coalesce(
            expr("every(coalesce(n_kept, 0) = coalesce(n_want, -1))"),
            lit(true)).as("diverse_sample_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS diverse_sample_ok")),

    // x92 — corpus-unigram log-probability score: each doc's mean
    // -ln p(token) under the corpus's OWN unigram distribution — the
    // CCNet-style LM-score proxy (a doc of corpus-typical tokens scores
    // low, rare-token noise scores high) that ranks quality WITHOUT an
    // external model. Per-token -ln p quantizes to an integer micro-nat
    // BIGINT before summing (the x71 trick), so the cross-engine compare
    // is exact-integer arithmetic up to the final division. Scale: the
    // unigram table is one hash agg (vocab-sized, tiny next to the
    // corpus); the score join re-keys token strings — at 100 TB hash them
    // to 8 bytes first (the x07 postings trick) and broadcast the head of
    // the vocab; the total-token count rides along as a broadcast scalar.
    QueryDef("x92_unigram_logprob",
      (s, d) => {
        val toks = tokensShared(s, d)
        val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val total = uni.agg(sum(col("cnt")).as("total"))
        toks.join(uni, "tok").crossJoin(broadcast(total))
          .select(col("doc_id"),
            expr("CAST(round(-ln(cnt / total) * 1e6) AS BIGINT)").as("q"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tok"),
            (floor(sum(col("q")).cast("double") / count(lit(1)) / 100.0 + 0.5) / 10000.0)
              .as("avg_neglogp"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS tok
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
                  n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c),
                  s AS (SELECT doc_id,
                          CAST(round(-ln(CAST(cnt AS DOUBLE) / total) * 1e6) AS BIGINT) AS q
                        FROM t JOIN c USING (tok) CROSS JOIN n)
              SELECT doc_id, count(*) AS n_tok,
                     floor(CAST(sum(q) AS DOUBLE) / count(*) / 100.0 + 0.5) / 10000.0
                       AS avg_neglogp
              FROM s GROUP BY doc_id ORDER BY doc_id""")),

    // x93 — TF-IDF top terms per doc: the keyword/topic primitive (domain
    // tagging, index previews, per-source topic drift all start here). IDF
    // quantizes to integer micro-nats and the score stays tf × that BIGINT
    // — all-integer, so the cross-engine compare is exact with zero
    // floating summation anywhere. Scale: tf is a (doc, token) hash agg,
    // df a vocab-sized one; the rank window partitions by doc_id (the
    // natural key — no global sort); token join keys re-hash to 8 bytes at
    // 100 TB (x07 trick).
    QueryDef("x93_tfidf_terms",
      (s, d) => {
        val toks = tokensShared(s, d)
        val tf = toks.groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val df_ = toks.groupBy(col("tok"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val nd = toks.agg(countDistinct(col("doc_id")).cast("double").as("nd"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf_micro").desc, col("tok"))
        tf.join(df_, "tok").crossJoin(broadcast(nd))
          .select(col("doc_id"), col("tok"),
            (col("tf") * expr("CAST(round(ln(nd / df) * 1e6) AS BIGINT)"))
              .as("tfidf_micro"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("tok"), col("tfidf_micro"), col("rnk"))
          .orderBy("doc_id", "rnk")
      },
      Some("""WITH t AS (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS tok
                   FROM documents WHERE length(trim(text)) > 0),
                  tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
                  df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY tok),
                  n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd FROM t),
                  sc AS (SELECT doc_id, tok,
                           tf * CAST(round(ln(nd / CAST(df AS DOUBLE)) * 1e6) AS BIGINT)
                             AS tfidf_micro
                         FROM tf JOIN df USING (tok) CROSS JOIN n),
                  r AS (SELECT doc_id, tok, tfidf_micro,
                          row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_micro DESC, tok) AS rnk
                        FROM sc)
              SELECT doc_id, tok, tfidf_micro, rnk
              FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""")),

    // x94 — temperature-sampled mixture weights: per-source sampling
    // probability w_s ∝ n_s^α (α = 0.5 — the multilingual-corpus upweighting
    // of small sources), the knob that turns corpus token counts into a
    // training sampler's per-source weights. The sqrt quantizes to integer
    // micro-units per source BEFORE the normalizing sum, so the denominator
    // is an exact BIGINT sum and every weight an exact integer division —
    // no cross-engine float-accumulation drift. One vocab-free aggregate:
    // per-source token counts (16 rows) then arithmetic.
    QueryDef("x94_mixture_weights",
      (s, d) => {
        val perSource = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(sum(TextAnalysis.wsTokenCount(col("text"))).as("n_tok"))
          .withColumn("q", expr("CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT)"))
        val denom = perSource.agg(sum(col("q")).as("qsum"))
        perSource.crossJoin(broadcast(denom))
          .select(col("source"), col("n_tok"),
            // widen the ppm multiply: q*1e6 overflows BIGINT once a
            // source's q passes ~9.2e12 (≈ 8.5e13 corpus tokens — inside
            // the 100 TB envelope); DECIMAL(38,0) keeps it exact
            expr("CAST(CAST(q AS DECIMAL(38,0)) * 1000000 DIV qsum AS BIGINT)")
              .as("weight_ppm"))
          .orderBy("source")
      },
      // n_tok must CAST: DuckDB sum() yields HUGEINT, which pandas widens to
      // float64 — value-equal but hash-different vs Spark's BIGINT (r9/r10).
      Some("""WITH t AS (SELECT source,
                     CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tok
                   FROM documents GROUP BY source),
                  qq AS (SELECT source, n_tok,
                           CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT) AS q
                         FROM t),
                  dn AS (SELECT sum(q) AS qsum FROM qq)
              SELECT source, n_tok,
                     CAST(CAST(q AS HUGEINT) * 1000000 // qsum AS BIGINT) AS weight_ppm
              FROM qq CROSS JOIN dn ORDER BY source""")),

    // x95 — vocabulary coverage curve: the fraction of all token
    // OCCURRENCES covered by the top-k token TYPES (k = 1/10/100/1000) —
    // the statistic that sizes a tokenizer vocab or a stopword list.
    // Cumulative sums stay exact BIGINTs over the vocab-sized (not
    // corpus-sized) aggregate; fractions are exact integer ppm divisions.
    // The rank window is unpartitioned but runs over the VOCAB aggregate —
    // the x84 shape, bounded rows — and only ranks ≤ 1000 survive the
    // window, so the sort payload is the vocab table, not the corpus.
    QueryDef("x95_vocab_coverage",
      (s, d) => {
        val toks = tokensShared(s, d)
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val total = vocab.agg(sum(col("cnt")).as("total"))
        val w = Window.orderBy(col("cnt").desc, col("tok"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wr = Window.orderBy(col("cnt").desc, col("tok"))
        val ranked = vocab
          .withColumn("cum", sum(col("cnt")).over(w))
          .withColumn("rnk", row_number().over(wr))
          .filter(col("rnk").isin(1, 10, 100, 1000))
        ranked.crossJoin(broadcast(total))
          .select(col("rnk").cast("long").as("top_k"),
            // same DECIMAL(38,0) widening as x94: cum approaches total, so
            // cum*1e6 overflows BIGINT past ~9.2e12 corpus tokens
            expr("CAST(CAST(cum AS DECIMAL(38,0)) * 1000000 DIV total AS BIGINT)")
              .as("coverage_ppm"))
          .orderBy("top_k")
      },
      Some("""WITH t AS (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS tok
                   FROM documents WHERE length(trim(text)) > 0),
                  v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
                  n AS (SELECT sum(cnt) AS total FROM v),
                  r AS (SELECT cnt,
                          sum(cnt) OVER (ORDER BY cnt DESC, tok
                            ROWS UNBOUNDED PRECEDING) AS cum,
                          row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
                        FROM v)
              SELECT CAST(rnk AS BIGINT) AS top_k,
                     CAST(CAST(cum AS HUGEINT) * 1000000 // total AS BIGINT)
                       AS coverage_ppm
              FROM r CROSS JOIN n
              WHERE rnk IN (1, 10, 100, 1000) ORDER BY top_k""")),

    // x96 — Naive-Bayes reference-vs-crawl quality score: the CCNet/fastText
    // filter shape with the classifier TRAINED AND APPLIED in-engine. One
    // source (`src0`) plays the curated reference corpus, the rest the
    // crawl; per-token Laplace-smoothed log-likelihood ratios quantize to
    // integer micro-nats (the x92 trick) so each doc's score is an EXACT
    // BIGINT sum — bit-identical cross-engine. The synthetic corpus draws
    // every source from one vocabulary, so in-sample predictions ride the
    // prior (all-crawl); TextModelSpec pins real class separation on crafted
    // data, and `TextAnalysis.nbScorer` is the build-once streaming twin.
    // Scale: training is two vocab-sized hash aggs over one token scan;
    // scoring joins tokens to the (tiny next to the corpus) llr table —
    // hash tokens to 8 bytes and broadcast the vocab head at 100 TB — and
    // the per-doc sum is a hash agg on doc_id. The class bit rides the
    // scan (no token-stream join against the docs table); no windows, no
    // pairs anywhere.
    QueryDef("x96_nb_quality_score",
      (s, d) => {
        val tk = Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"), (col("source") === "src0").as("is_ref"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val perTok = tk.groupBy(col("tok")).agg(
          sum(when(col("is_ref"), 1L).otherwise(0L)).as("cnt_r"),
          sum(when(col("is_ref"), 0L).otherwise(1L)).as("cnt_c"))
        val tot = perTok.agg(sum(col("cnt_r")).as("n_r"),
          sum(col("cnt_c")).as("n_c"), count(lit(1)).as("v"))
        val llr = perTok.crossJoin(broadcast(tot))
          .select(col("tok"),
            expr("""CAST(round(ln((CAST(cnt_r + 1 AS DOUBLE) / (n_r + v)) /
                                  (CAST(cnt_c + 1 AS DOUBLE) / (n_c + v))) * 1e6)
                    AS BIGINT)""").as("llr"))
        val prior = Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .agg(expr("""CAST(round(ln(
                    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS DOUBLE) /
                    sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END)) * 1e6)
                  AS BIGINT)""").as("prior"))
        tk.join(llr, "tok")
          .groupBy(col("doc_id"), col("is_ref"))
          .agg(sum(col("llr")).as("llr_micro"))
          .crossJoin(broadcast(prior))
          .select(col("doc_id"), col("is_ref"), col("llr_micro"),
            (col("llr_micro") + col("prior")).as("score_micro"),
            ((col("llr_micro") + col("prior")) > 0).as("pred_ref"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS tok
                   FROM documents WHERE length(trim(text)) > 0),
                  cls AS (SELECT doc_id, source = 'src0' AS is_ref FROM documents),
                  tk AS (SELECT t.doc_id, tok, is_ref FROM t JOIN cls USING (doc_id)),
                  pt AS (SELECT tok,
                           sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cnt_r,
                           sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cnt_c
                         FROM tk GROUP BY tok),
                  tot AS (SELECT sum(cnt_r) AS n_r, sum(cnt_c) AS n_c,
                            count(*) AS v FROM pt),
                  llr AS (SELECT tok,
                            CAST(round(ln((CAST(cnt_r + 1 AS DOUBLE) / (n_r + v)) /
                                          (CAST(cnt_c + 1 AS DOUBLE) / (n_c + v))) * 1e6)
                              AS BIGINT) AS llr
                          FROM pt CROSS JOIN tot),
                  pr AS (SELECT CAST(round(ln(
                           CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS DOUBLE) /
                           sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END)) * 1e6)
                           AS BIGINT) AS prior
                         FROM documents WHERE length(trim(text)) > 0),
                  sc AS (SELECT doc_id, is_ref, sum(llr) AS s
                         FROM tk JOIN llr USING (tok) GROUP BY 1, 2)
              SELECT doc_id, is_ref, CAST(s AS BIGINT) AS llr_micro,
                     CAST(s + prior AS BIGINT) AS score_micro,
                     (s + prior) > 0 AS pred_ref
              FROM sc CROSS JOIN pr ORDER BY doc_id""")),

    // x97 — duplicated-block scrub: the C4 "remove any repeated span" rule
    // as a REWRITE (most of the dedup family reports or drops whole docs;
    // this one returns cleaned text). Docs split into NON-overlapping
    // 16-token blocks (x22's chunker overlaps for retrieval; scrubbing
    // must partition the text so removal never eats unshared words);
    // any block whose exact content occurs >= 2 times corpus-wide (within-
    // or cross-doc) is boilerplate and every occurrence is dropped; the
    // survivors rejoin in block order. Totality: docs whose every block is
    // boilerplate (exact dups) come back with scrub_text = '' rather than
    // vanishing. Scale: one shuffle keyed on block content for the
    // occurrence count — hash blocks to 8 bytes at 100 TB (the x07 postings
    // trick; a 64-bit collision wrongly drops ~one block per 10^19 pairs)
    // — and a doc_id hash agg for the rebuild; the rank-free rebuild sorts
    // WITHIN each doc's collected block array, never globally.
    QueryDef("x97_block_scrub",
      (s, d) => {
        val b = TextAnalysis.tokenBlocks(Tables.documents(s, d))
        val occ = b.groupBy(col("block")).agg(count(lit(1)).as("occ"))
        val kept = b.join(occ, "block").filter(col("occ") < 2)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_kept"),
            expr("""array_join(transform(array_sort(collect_list(struct(block_no, block))),
                                         x -> x.block), ' ')""").as("scrub_text"))
        val nb = b.groupBy(col("doc_id")).agg(count(lit(1)).as("n_blocks"))
        Tables.documents(s, d).select(col("doc_id"))
          .join(nb, Seq("doc_id"), "left")
          .join(kept, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("scrub_text"), lit("")).as("scrub_text"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
                  b AS (SELECT doc_id, i AS block_no,
                          array_to_string(list_slice(toks, i * 16 + 1,
                            least(i * 16 + 16, len(toks))), ' ') AS block
                        FROM t, unnest(range(0, CAST((len(toks) + 15) // 16 AS BIGINT)))
                          AS u(i)),
                  occ AS (SELECT block, count(*) AS occ FROM b GROUP BY block),
                  keep AS (SELECT b.doc_id, b.block_no, b.block
                           FROM b JOIN occ USING (block) WHERE occ < 2),
                  agg AS (SELECT doc_id, count(*) AS n_kept,
                            string_agg(block, ' ' ORDER BY block_no) AS scrub_text
                          FROM keep GROUP BY doc_id),
                  nb AS (SELECT doc_id, count(*) AS n_blocks FROM b GROUP BY doc_id)
              SELECT d.doc_id, coalesce(nb.n_blocks, 0) AS n_blocks,
                     coalesce(agg.n_kept, 0) AS n_kept,
                     coalesce(agg.scrub_text, '') AS scrub_text
              FROM documents d LEFT JOIN nb ON nb.doc_id = d.doc_id
              LEFT JOIN agg ON agg.doc_id = d.doc_id
              ORDER BY d.doc_id""")),

    // x98 — deterministic weighted sample (Efraimidis–Spirakis): top-50
    // docs without replacement with inclusion probability ∝ n_chars — the
    // quality-weighted subcorpus cut (x21/x26/x90 sample uniformly,
    // stratified, or diversity-first; none weight by a score). The A-ES
    // key ln(u)/w uses a uniform DERIVED FROM md5 OF THE CONTENT (x52's
    // determinism trick widened from one hex digit to 32 bits), so the
    // sample is reproducible across engines, runs, and partitionings —
    // no rand(), no seed plumbing. The key quantizes to integer nano units
    // before ranking (a 1-ulp cross-engine ln() difference only matters
    // within 1e-9 of a rounding boundary). Scale: scan-local key compute +
    // distributed top-k (TakeOrderedAndProject — map-side partial top-50
    // per partition, NO global sort, NO single-partition window); the rank
    // column is a window over the 50 survivors only.
    QueryDef("x98_weighted_sample",
      (s, d) => {
        val keyed = Tables.documents(s, d)
          .select(col("doc_id"), greatest(col("n_chars"), lit(1L)).as("wt"),
            expr("""CAST(CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT)
                    AS DOUBLE)""").as("v"))
          .select(col("doc_id"), col("wt"),
            expr("CAST(round(ln((v + 1) / 4294967297.0) / wt * 1e9) AS BIGINT)")
              .as("key_nano"))
          .orderBy(col("key_nano").desc, col("doc_id")).limit(50)
        val w = Window.orderBy(col("key_nano").desc, col("doc_id"))
        keyed.withColumn("rnk", row_number().over(w).cast("long"))
          .select(col("rnk"), col("doc_id"), col("wt"), col("key_nano"))
          .orderBy("rnk")
      },
      Some("""WITH w AS (SELECT doc_id, greatest(n_chars, 1) AS wt,
                     CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS DOUBLE) AS v
                   FROM documents),
                  k AS (SELECT doc_id, wt,
                          CAST(round(ln((v + 1) / 4294967297.0) / wt * 1e9) AS BIGINT)
                            AS key_nano
                        FROM w),
                  r AS (SELECT doc_id, wt, key_nano,
                          row_number() OVER (ORDER BY key_nano DESC, doc_id) AS rnk
                        FROM k)
              SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, wt, key_nano
              FROM r WHERE rnk <= 50 ORDER BY rnk""")),

    // x99 — count-min-sketch heavy hitters: the top-20 tokens' counts
    // estimated from ONE mergeable ~1.5 MB sketch (map-side partial
    // sketches merge associatively — the 100 TB path where even the
    // vocab-sized exact aggregate is worth skipping on a monitoring tick).
    // Candidates come from the exact aggregate here so the x99b gate can
    // compare; a production probe-only tick reuses the sketch bytes.
    // Sketch bits are engine-hash-specific → rows-only, bounds gated by
    // x99b. The two driver collects are bounded and deliberate: one sketch
    // row (~1.5 MB) + k candidate rows.
    QueryDef("x99_cms_heavy_hitters",
      (s, d) => cmsShared(s, d).orderBy("rnk"),
      None),

    // x99b — CMS error-bound gate: a count-min estimate NEVER undercounts,
    // and overcounts by more than eps·N with probability < 1−confidence
    // per probe (Cormode–Muthukrishnan). Both bounds checked for every
    // probed token against the `slack` budget the build itself computed
    // (⌈eps·totalCount⌉ riding the shared frame — no second corpus scan,
    // no independently-hardcoded eps to drift). The sketch seed is fixed,
    // so the outcome is deterministic — no flaky-gate risk. The q24/x19
    // pattern: an engine-specific sketch pinned by an engine-independent
    // contract.
    QueryDef("x99b_cms_bound_gate",
      (s, d) => cmsShared(s, d)
        .agg(coalesce(
          expr("every(est_cnt >= exact_cnt AND est_cnt <= exact_cnt + slack)"),
          lit(true)).as("cms_bounds_ok")),
      Some("SELECT CAST(1 AS BOOLEAN) AS cms_bounds_ok")),

    // x100 — exact-substring dedup (Lee et al. 2022): any 50-token
    // substring occurring ≥2× corpus-wide flags every window of it —
    // the standard complement to MinHash (x08) in production pipelines.
    // OVERLAPPING stride-1 windows are the point: x97's fixed blocks miss
    // repeats straddling a block boundary (DedupSpec pins a fixture only
    // x100 catches). x38's plan shape: window hashes (8-byte keys, the
    // window string never shuffles) → corpus-wide occurrence counts →
    // per-doc summary with the interval-union token coverage a Lee-rule
    // scrub would touch. Hash-key counting is collision-equivalent to the
    // oracle's string counting (the x38 contract).
    QueryDef("x100_substring_dedup",
      (s, d) => graft.ext.Dedup.substringDupStats(
          Tables.documents(s, d), "text", "doc_id",
          windowTokens = 50, minOcc = 2L)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                         FROM documents WHERE length(trim(text)) > 0),
                   w AS (SELECT doc_id, i AS pos,
                           array_to_string(toks[(i+1):(i+50)], ' ') AS win
                         FROM t, unnest(range(0, len(toks))) AS u(i)
                         WHERE i + 50 <= len(toks)),
                   c AS (SELECT win, count(*) AS occ FROM w GROUP BY win),
                   j AS (SELECT w.doc_id, w.pos, (c.occ >= 2) AS dup
                         FROM w JOIN c USING (win)),
                   s AS (SELECT doc_id, count(*) AS nw,
                           sum(CASE WHEN dup THEN 1 ELSE 0 END) AS nd
                         FROM j GROUP BY doc_id),
                   cov AS (SELECT doc_id, sum(contrib) AS nt
                           FROM (SELECT doc_id,
                                   greatest(0, pos + 50 - greatest(pos,
                                     coalesce(max(pos + 50) OVER (
                                       PARTITION BY doc_id ORDER BY pos
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)))
                                     AS contrib
                                 FROM j WHERE dup)
                           GROUP BY doc_id)
              SELECT d.doc_id,
                     CAST(coalesce(s.nw, 0) AS BIGINT) AS n_windows,
                     CAST(coalesce(s.nd, 0) AS BIGINT) AS n_dup_windows,
                     CAST(coalesce(cov.nt, 0) AS BIGINT) AS n_dup_tokens,
                     coalesce(s.nd, 0) > 0 AS has_dup
              FROM documents d
              LEFT JOIN s USING (doc_id) LEFT JOIN cov USING (doc_id)
              ORDER BY doc_id""")),

    // x101 — bounded edit-distance near-dup pairs: typo-level duplicate
    // detection on the normalized 48-char head (the x36 family extended to
    // EDIT distance — shingle/minhash dedup misses single-character
    // corruption, OCR noise, and near-identical template fills that
    // levenshtein catches). Sound two-level blocking: a qualifying pair
    // must satisfy |n_chars diff| <= 8, so rows equi-join on width-8
    // length bands with the probe side exploded to band ±1 (band distance
    // > 1 implies length distance > 8 — the Q27 bucketed range-join shape,
    // NO cartesian, pinned in PlanSpec); the in-band compare is Spark's
    // THRESHOLDED levenshtein (early-exits past the budget, returns -1 —
    // O(d·len) per pair, not O(len²)). Scale: pair fan-out is per-band
    // quadratic, not corpus-quadratic; the 48-char key caps the DP at
    // 48×8 cells; band keys are 8-byte longs.
    QueryDef("x101_editdist_neardup",
      (s, d) => {
        val dMax = 8
        // band on length(text), not the table's n_chars column: the
        // flagger twin (Dedup.editDistFlagger) has only the text, and the
        // pinned parity between the two must not hinge on the dataset
        // invariant n_chars == length(text)
        val keyed = Tables.documents(s, d)
          .select(col("doc_id"), substring(col("text"), 1, 48).as("p"),
            length(col("text")).as("lc"))
        val a = keyed.select(col("doc_id").as("doc_a"), col("p").as("pa"),
          col("lc").as("la"),
          explode(expr(s"""array(lc div $dMax - 1, lc div $dMax,
                                 lc div $dMax + 1)""")).as("band"))
        val b = keyed.select(col("doc_id").as("doc_b"), col("p").as("pb"),
          col("lc").as("lb"), expr(s"lc div $dMax").as("band"))
        a.join(b, "band")
          .filter(col("doc_a") < col("doc_b") &&
            abs(col("la") - col("lb")) <= dMax)
          .select(col("doc_a"), col("doc_b"),
            expr(s"levenshtein(pa, pb, $dMax)").cast("long").as("dist"))
          .filter(col("dist") >= 0)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH d AS (SELECT doc_id, substr(text, 1, 48) AS p,
                     length(text) AS lc
                   FROM documents)
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
              FROM d a JOIN d b
                ON a.doc_id < b.doc_id AND abs(a.lc - b.lc) <= 8
              WHERE levenshtein(a.p, b.p) <= 8
              ORDER BY doc_a, doc_b""")),

    // x102 — Zipf slope per source: OLS slope of ln(freq) on ln(rank)
    // over each source's top-200 token types — the corpus-health scalar
    // (natural text tracks slope ≈ −1; templated/spammy sources flatten
    // or steepen it). Exactness: ln(rank) and ln(freq) quantize to
    // integer TENTH-micro-nats (1e5) BEFORE the regression, so Σx, Σy,
    // Σxy, Σx² are exact BIGINTs on both engines (|n·Σxy| ≈ 2.6e16 even
    // at ln(freq) = 27.6, a 1e12-count token — 350× inside BIGINT; the
    // x94 quantize-before-the-sum rule), and the slope is ONE double
    // division of identical integers + the x92 floor half-up idiom
    // (floor, not round: round() halves on NEGATIVE values are an
    // engine-semantics trap). Scale: per-source vocab hash agg, rank
    // window partitioned by source over the VOCAB aggregate (the x95
    // bounded-window shape), 200 rows per source into closed-form sums.
    QueryDef("x102_zipf_slope",
      (s, d) => {
        val freq = tokensShared(s, d)
          .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("cnt").desc, col("tok"))
        val pts = freq.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 200)
          .select(col("source"),
            expr("CAST(round(ln(CAST(rnk AS DOUBLE)) * 1e5) AS BIGINT)").as("x"),
            expr("CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e5) AS BIGINT)").as("y"))
        pts.groupBy(col("source"))
          .agg(count(lit(1)).as("n_ranks"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("source"), col("n_ranks"),
            (floor(((col("n_ranks") * col("sxy") - col("sx") * col("sy"))
              .cast("double")
              / (col("n_ranks") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) * 1e6 + 0.5) / 1e6).as("slope_zipf"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source,
                     unnest(string_split_regex(trim(text), '\s+')) AS tok
                   FROM documents WHERE length(trim(text)) > 0),
                  f AS (SELECT source, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
                  r AS (SELECT source, tok, cnt,
                          row_number() OVER (PARTITION BY source
                                             ORDER BY cnt DESC, tok) AS rnk
                        FROM f),
                  p AS (SELECT source,
                          CAST(round(ln(CAST(rnk AS DOUBLE)) * 1e5) AS BIGINT) AS x,
                          CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e5) AS BIGINT) AS y
                        FROM r WHERE rnk <= 200),
                  a AS (SELECT source, count(*) AS n_ranks,
                          sum(x) AS sx, sum(y) AS sy,
                          sum(x * y) AS sxy, sum(x * x) AS sxx
                        FROM p GROUP BY source)
              SELECT source, n_ranks,
                     floor(CAST(n_ranks * sxy - sx * sy AS DOUBLE)
                           / CAST(n_ranks * sxx - sx * sx AS DOUBLE)
                           * 1e6 + 0.5) / 1e6 AS slope_zipf
              FROM a ORDER BY source""")),

    // x103 — bigram-LM quality score: average Laplace-smoothed corpus-
    // bigram negative log-prob per doc — the x92 signal with ONE token of
    // context, which separates shuffled/templated word soup that unigram
    // statistics score identically (P(w2|w1) = (c12+1)/(c1+V)). Exactness:
    // per-bigram −ln P quantizes to integer micro-nats, the per-doc mean
    // is exact BIGINT sums + the x92 floor idiom. Scale: the bigram hash
    // agg is the one big shuffle (≈ token-count keys; 8-byte re-hash at
    // 100 TB per the x07 trick); CONTEXT counts derive from the bigram
    // table itself (sum over w1 — no second corpus pass); V rides the
    // shared vocab agg; the scoring joins are key-bounded and partial-agg
    // friendly. Single-token docs have no bigram and drop, like blank
    // docs in x92.
    QueryDef("x103_bigram_logprob",
      (s, d) => {
        val bi = bigramsShared(s, d)
        val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
        val v = tokensShared(s, d)
          .agg(countDistinct(col("tok")).cast("double").as("vsz"))
        bi.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
          .crossJoin(broadcast(v))
          .select(col("doc_id"),
            expr("CAST(round(-ln((c12 + 1) / (c1 + vsz)) * 1e6) AS BIGINT)")
              .as("q"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_big"),
            (floor(sum(col("q")).cast("double") / count(lit(1)) / 100.0 + 0.5)
              / 10000.0).as("avg_neglogp2"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
                  b AS (SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
                        FROM t, unnest(range(0, len(toks) - 1)) AS u(i)
                        WHERE len(toks) >= 2),
                  c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
                  c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
                  v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS vsz
                        FROM (SELECT unnest(string_split_regex(trim(text), '\s+'))
                                AS tok
                              FROM documents WHERE length(trim(text)) > 0)),
                  sc AS (SELECT doc_id,
                           CAST(round(-ln((c12 + 1) / (c1 + vsz)) * 1e6)
                                AS BIGINT) AS q
                         FROM b JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
                         CROSS JOIN v)
              SELECT doc_id, count(*) AS n_big,
                     floor(CAST(sum(q) AS DOUBLE) / count(*) / 100.0 + 0.5)
                       / 10000.0 AS avg_neglogp2
              FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // x104 — conditional bigram entropy per source: H(w2|w1) =
    // −Σ (c12/N)·ln(c12/c1) — the sequence-structure companion to x30's
    // unigram token entropy (a source whose bigrams are predictable given
    // context reads as templated even when its unigram mix looks natural).
    // Exactness: per-bigram-TYPE −ln(c12/c1) quantizes to integer
    // micro-nats once, then weights by the exact count c12 — the weighted
    // sum Σ c12·q widens to DECIMAL(38,0) (HUGEINT on the oracle side, the
    // x94 widening) so a 1e12-count bigram times a 3e7 micro-nat quantum
    // stays exact — and ONE double division closes it with the x92 floor
    // idiom. Scale: both aggs are vocab²-sized (not corpus-sized) after
    // the shared bigram explode; output is one row per source.
    QueryDef("x104_bigram_cond_entropy",
      (s, d) => {
        val c12 = bigramsShared(s, d)
          .groupBy(col("source"), col("w1"), col("w2"))
          .agg(count(lit(1)).as("c12"))
        val c1 = c12.groupBy(col("source"), col("w1"))
          .agg(sum(col("c12")).as("c1"))
        c12.join(c1, Seq("source", "w1"))
          .select(col("source"), col("c12"),
            expr("""CAST(round(-ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
                               * 1e6) AS BIGINT)""").as("q"))
          .groupBy(col("source"))
          .agg(sum(col("c12")).as("n_big"),
            (floor(sum(expr("CAST(c12 AS DECIMAL(38,0)) * q")).cast("double")
              / sum(col("c12")).cast("double") / 100.0 + 0.5) / 10000.0)
              .as("h2_cond"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT doc_id, source,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
                  b AS (SELECT source, toks[i + 1] AS w1, toks[i + 2] AS w2
                        FROM t, unnest(range(0, len(toks) - 1)) AS u(i)
                        WHERE len(toks) >= 2),
                  c12 AS (SELECT source, w1, w2, count(*) AS c12
                          FROM b GROUP BY 1, 2, 3),
                  c1 AS (SELECT source, w1, sum(c12) AS c1
                         FROM c12 GROUP BY 1, 2),
                  q AS (SELECT source, c12,
                          CAST(round(-ln(CAST(c12 AS DOUBLE)
                                         / CAST(c1 AS DOUBLE)) * 1e6)
                               AS BIGINT) AS q
                        FROM c12 JOIN c1 USING (source, w1))
              SELECT source, CAST(sum(c12) AS BIGINT) AS n_big,
                     floor(CAST(sum(CAST(c12 AS HUGEINT) * q) AS DOUBLE)
                           / CAST(sum(c12) AS DOUBLE) / 100.0 + 0.5)
                       / 10000.0 AS h2_cond
              FROM q GROUP BY source ORDER BY source""")),

    // x105 — hapax/rare-token rate per doc: the fraction (exact integer
    // ppm) of a doc's token occurrences whose CORPUS-WIDE count is ≤ 2 —
    // the cheap OCR-garbage/mojibake detector (corrupt bytes explode into
    // once-seen tokens; natural text keeps rare mass low). The inverse of
    // x60's OOV-vs-top-100 probe: x60 asks "how much is common", this asks
    // "how much is nearly unique". Exactness: counting + ONE integer ppm
    // division (the x94 rule — no float ratio anywhere). Scale: vocab
    // hash agg + a key-bounded token join, both partial-agg friendly;
    // the rare set is the vocab TAIL so no broadcast assumption is made.
    QueryDef("x105_hapax_rate",
      (s, d) => {
        val toks = tokensShared(s, d)
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        toks.join(vocab, "tok")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tok"),
            sum(when(col("cnt") <= 2, 1L).otherwise(0L)).as("n_rare"))
          .select(col("doc_id"), col("n_tok"), col("n_rare"),
            expr("CAST(n_rare * 1000000 div n_tok AS BIGINT)").as("rare_ppm"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS tok
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
                  a AS (SELECT doc_id, count(*) AS n_tok,
                          sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS n_rare
                        FROM t JOIN c USING (tok) GROUP BY doc_id)
              SELECT doc_id, n_tok, CAST(n_rare AS BIGINT) AS n_rare,
                     CAST(n_rare * 1000000 // n_tok AS BIGINT) AS rare_ppm
              FROM a ORDER BY doc_id""")),

    // x106 — intra-doc repeated-block scrub: drop any block whose content
    // already appeared EARLIER IN THE SAME DOC (keep-first), rejoin
    // survivors in order — the within-document companion to x97's
    // corpus-wide C4 rule (a generation loop repeating one phrase 40×
    // inside a single doc never reaches corpus-level minOcc at 100 TB,
    // but is exactly what repetition-collapse scrubbing exists to kill).
    // Block=2 pins the fixture (181/500 sf0.01 docs exercise the rewrite;
    // production default is 8). Scale: ONE map-only projection — no
    // shuffle, no state, streaming-safe as-is.
    QueryDef("x106_intradoc_scrub",
      (s, d) => TextAnalysis.intraDocScrub(
          Tables.documents(s, d), blockTokens = 2)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
                  b AS (SELECT doc_id,
                          list_transform(range(0, CAST(ceil(len(toks)/2.0) AS INT)),
                            i -> array_to_string(toks[i*2+1 : least(len(toks),(i+1)*2)], ' ')) AS blocks
                        FROM t),
                  k AS (SELECT doc_id, blocks,
                          list_filter(range(0, len(blocks)),
                            i -> list_position(blocks, blocks[i+1]) = i + 1) AS keep_idx
                        FROM b)
              SELECT doc_id, CAST(len(blocks) AS BIGINT) AS n_blocks,
                     CAST(len(keep_idx) AS BIGINT) AS n_kept,
                     array_to_string(list_transform(keep_idx, i -> blocks[i+1]), ' ')
                       AS scrub_text
              FROM k ORDER BY doc_id""")),

    // x107 — top-50 PMI collocations: ln(c12·N / (c1·c2)) over the corpus
    // bigram table with a count floor (c12 ≥ 5 kills the rare-pair PMI
    // explosion) — the collocation miner (multi-word terms, boilerplate
    // phrases) every corpus report carries. Marginals come from the bigram
    // table itself (c1 = Σ_w2 c12, c2 = Σ_w1 c12), so the whole operator
    // is ONE extra pass over the vocab²-sized x103/x104 aggregate — no new
    // corpus scan. Exactness: the PMI double is computed with an identical
    // association order in both engines and quantized via the sign-safe
    // floor(x·1e6 + 0.5) idiom (PMI can be negative — round()'s
    // negative-half behavior is the x102 engine trap). Top-50 is a
    // distributed TakeOrderedAndProject with (pmi, w1, w2) total order, so
    // the SET is deterministic under ties.
    QueryDef("x107_pmi_collocations",
      (s, d) => {
        val c12 = bigramsShared(s, d)
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
        val c2 = c12.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
        val n = c12.agg(sum(col("c12")).cast("double").as("nb"))
        val w = Window.orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
        c12.filter(col("c12") >= 5)
          .join(c1, "w1").join(c2, "w2")
          .crossJoin(broadcast(n))
          .select(col("w1"), col("w2"), col("c12"),
            expr("""CAST(floor(ln(CAST(c12 AS DOUBLE) * nb
                                  / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))
                               * 1e6 + 0.5) AS BIGINT)""").as("pmi_micro"))
          .orderBy(col("pmi_micro").desc, col("w1"), col("w2")).limit(50)
          .withColumn("rnk", row_number().over(w).cast("long"))
          .select(col("rnk"), col("w1"), col("w2"), col("c12"), col("pmi_micro"))
          .orderBy("rnk")
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
                  b AS (SELECT toks[i + 1] AS w1, toks[i + 2] AS w2
                        FROM t, unnest(range(0, len(toks) - 1)) AS u(i)
                        WHERE len(toks) >= 2),
                  c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
                  c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
                  c2 AS (SELECT w2, sum(c12) AS c2 FROM c12 GROUP BY w2),
                  n AS (SELECT CAST(sum(c12) AS DOUBLE) AS nb FROM c12),
                  p AS (SELECT w1, w2, c12,
                          CAST(floor(ln(CAST(c12 AS DOUBLE) * nb
                                        / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))
                                     * 1e6 + 0.5) AS BIGINT) AS pmi_micro
                        FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
                        WHERE c12 >= 5)
              SELECT row_number() OVER (ORDER BY pmi_micro DESC, w1, w2) AS rnk,
                     w1, w2, c12, pmi_micro
              FROM p ORDER BY rnk LIMIT 50""")),

    // x108 — compressibility quality signal: DEFLATE length of each doc's
    // UTF-8 bytes + the integer-ppm compression ratio. Gopher/RefinedWeb's
    // missing third repetition probe: x37's n-gram ratios count EXACT
    // repeats, x102/x104 model token structure — deflate catches byte-level
    // templating and (at the other end) incompressible mojibake in one
    // scalar. Scale: codegen'd native expression, per-task Deflater reuse,
    // map-only — no shuffle at any corpus size. Compressed bytes are
    // zlib-version-specific → rows-only, pinned by the x108b gate +
    // TextModelSpec crafted-text ordering.
    QueryDef("x108_deflate_ratio",
      (s, d) => Tables.documents(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          TextAnalysis.deflateLen(col("text")).cast("long").as("deflate_len"))
        .select(col("doc_id"), col("n_bytes"), col("deflate_len"),
          expr("deflate_len * 1000000 div n_bytes").as("ratio_ppm"))
        .orderBy("doc_id"),
      None),

    // x108b — deterministic bound gate over the engine-specific bytes:
    // every ratio positive and under the stored-block ceiling (1.2e6 ppm
    // covers DEFLATE's worst-case overhead at the fixture's ≥128-byte
    // docs), corpus present, and the word-soup corpus compresses on
    // average (mean < 1e6 ppm) — the x99b exact-vs-sketch gate pattern.
    QueryDef("x108b_deflate_bound_gate",
      (s, d) => {
        val r = Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .select(octet_length(col("text")).cast("long").as("n_bytes"),
            TextAnalysis.deflateLen(col("text")).cast("long").as("dl"))
          .select(col("n_bytes"), col("dl"),
            expr("dl * 1000000 div n_bytes").as("ppm"))
        // mean in DOUBLE: a LONG sum·1e6 would overflow past ~9 TB of
        // compressed bytes (the sums themselves are safe to 9 EB)
        r.agg(count(lit(1)).as("n"), min(col("ppm")).as("mn"),
            max(col("ppm")).as("mx"),
            (sum(col("dl")).cast("double") * 1e6
              / sum(col("n_bytes")).cast("double")).as("mean_ppm"))
          .select((col("n") > 0 && col("mn") > 0 && col("mx") <= 1200000L &&
            col("mean_ppm") < 1000000L).as("deflate_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS deflate_ok"))
,
    // x109 — order-invariant corpus digest per source: (n, xor-fold,
    // mod-2⁶¹ sum) of a 60-bit md5 hash of each id:text pair — the
    // corpus-equality check for export/load (x80's row-hash compare needs
    // the whole frame in one engine; this needs three BIGINTs per group
    // and merges across shards by xor/modsum/add). Exactness: integer
    // folds only; 15 hex chars keep the hash signed-BIGINT-safe in both
    // engines (the x98 0x-cast trick widened to 60 bits).
    QueryDef("x109_corpus_digest",
      (s, d) => Export.corpusDigest(Tables.documents(s, d))
        .orderBy("source"),
      Some("""WITH h AS (SELECT source,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                         || coalesce(text, '')), 1, 15)
                          AS BIGINT) AS h
                   FROM documents)
              SELECT source, count(*) AS n_docs, bit_xor(h) AS xor_digest,
                     CAST(sum(CAST(h AS HUGEINT)) % 2305843009213693952
                          AS BIGINT) AS sum_digest
              FROM h GROUP BY source ORDER BY source""")),

    // x110 — Heaps'-law vocab growth curve: distinct word-TRIGRAM types in
    // the corpus prefix doc_id ≤ ⌊max_id·p/100⌋ for p ∈ {10,25,50,100} —
    // the "is more data still adding new content?" sizing curve for
    // tokenizer/dedup planning (saturation ⇒ the tail is recombination,
    // not novelty; the fixture's 31-word unigram vocab saturates at 10%,
    // so the curve runs on trigram types — 16k at sf0.01). Scale: the
    // curve does NOT do one count-distinct per threshold over the corpus —
    // each type carries its FIRST-appearance doc (vocab-sized agg), and
    // every threshold is a conditional sum over that one table; thresholds
    // are fractions of the ID RANGE (no global rank window). String
    // trigrams keep the count exactly engine-portable; a 100 TB run swaps
    // in shingleHashF's 8-byte keys (collision odds ~|V|²/2⁶⁵).
    QueryDef("x110_heaps_curve",
      (s, d) => {
        val tri = trigramsShared(s, d).select(col("doc_id"), col("tri"))
        val firsts = tri.groupBy(col("tri")).agg(min(col("doc_id")).as("first_doc"))
        // id ceiling from the persisted shared frame — a cache read, not
        // a second corpus-sized trigram pass
        val m = tri.agg(max(col("doc_id")).as("mx"))
        firsts.crossJoin(broadcast(m))
          .select(col("first_doc"), col("mx"),
            explode(expr("array(10, 25, 50, 100)")).as("pct"))
          .groupBy(col("pct"), col("mx"))
          .agg(sum(when(col("first_doc") <= expr("mx * pct div 100"), 1L)
            .otherwise(0L)).as("vocab"))
          .select(col("pct").cast("long").as("pct"),
            expr("mx * pct div 100").as("id_ceil"), col("vocab"))
          .orderBy("pct")
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
                  g AS (SELECT doc_id,
                          toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] AS tri
                        FROM t, unnest(range(0, len(toks) - 2)) AS u(i)
                        WHERE len(toks) >= 3),
                  v AS (SELECT tri, min(doc_id) AS first_doc FROM g GROUP BY tri),
                  m AS (SELECT max(doc_id) AS mx FROM g),
                  p AS (SELECT unnest([10, 25, 50, 100]) AS pct)
              SELECT CAST(pct AS BIGINT) AS pct,
                     CAST(mx * pct // 100 AS BIGINT) AS id_ceil,
                     CAST((SELECT count(*) FROM v
                           WHERE first_doc <= mx * pct // 100) AS BIGINT) AS vocab
              FROM p CROSS JOIN m ORDER BY pct""")),

    // x111 — SimHash banded near-dup pairs: Hamming ≤ 3 over the 64-bit
    // x09 signatures via the 4×16-bit band split — the constant-space
    // dedup tier (one long per doc) between x01's exact hash and x08's
    // shingle-postings MinHash. Complete for hMax ≤ 3 by pigeonhole;
    // 8-byte packed band keys; bucket cap with the graft_simhash_bucket_cap
    // drop audit. Signature bits engine-specific → rows-only; x111b +
    // DedupSpec pin the semantics.
    QueryDef("x111_simhash_neardup",
      (s, d) => Dedup.simHashNearDupPairs(Tables.documents(s, d))
        .orderBy("ia", "ib"),
      None),

    // x111b — in-engine completeness gate: banded pair set ≡ bounded
    // brute-force all-pairs Hamming scan over the same signatures (the
    // x19/x99b exact-vs-sketch pattern; brute force is the fail-fast
    // bounded baseline tier, never the scale path).
    QueryDef("x111b_simhash_band_gate",
      (s, d) => Dedup.simHashBandCompletenessGate(Tables.documents(s, d))
        .select(col("band_complete")),
      Some("SELECT CAST(1 AS BOOLEAN) AS band_complete"))
,
    // x112 — source-level shingle Jaccard matrix: |A∩B|/|A∪B| over each
    // source's DISTINCT trigram set — content overlap between sources
    // even when no single doc near-dups (x63 counts near-dup PAIRS across
    // sources; this measures shared phrasing mass — the "two crawls of
    // the same site" detector that drives source-level dedup decisions).
    // Exactness: set counts + ONE integer ppm division (the x94 rule).
    // Scale: distinct (source, shingle) is vocab×sources-sized; the
    // intersection self-join emits ≤ C(|sources|,2) rows per shingle —
    // linear in vocab, never doc-quadratic; pairs with zero overlap are
    // absent by construction. String trigrams keep the oracle exact; a
    // 100 TB run swaps in shingleHashF's 8-byte keys.
    QueryDef("x112_source_shingle_jaccard",
      (s, d) => sourceShingleJaccard(s, d).orderBy("source_a", "source_b"),
      Some("""WITH t AS (SELECT source, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
                  g AS (SELECT DISTINCT source,
                          toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] AS sh
                        FROM t, unnest(range(0, len(toks) - 2)) AS u(i)
                        WHERE len(toks) >= 3),
                  n AS (SELECT source, count(*) AS ns FROM g GROUP BY source),
                  i AS (SELECT a.source AS source_a, b.source AS source_b,
                          count(*) AS inter
                        FROM g a JOIN g b ON a.sh = b.sh AND a.source < b.source
                        GROUP BY 1, 2)
              SELECT source_a, source_b, inter, na.ns AS n_a, nb.ns AS n_b,
                     CAST(inter * 1000000 // (na.ns + nb.ns - inter) AS BIGINT)
                       AS jacc_ppm
              FROM i JOIN n na ON i.source_a = na.source
                     JOIN n nb ON i.source_b = nb.source
              ORDER BY source_a, source_b""")),

    // x113 — token burstiness: occurrences-per-containing-doc (exact
    // integer ppm) for every token above a count floor, top-30 — the
    // Church/Gale burstiness signal separating TEMPLATE tokens (massive
    // counts inside few docs — navigation chrome, boilerplate headers)
    // from topically spread vocabulary; the per-TOKEN complement of x37's
    // per-DOC repetition ratio. Scale: one vocab-sized hash agg
    // (count + count_distinct doc_id per token — partial-agg friendly),
    // then a distributed top-30; counting + ONE ppm division (x94 rule).
    QueryDef("x113_token_burstiness",
      (s, d) => {
        val w = Window.orderBy(col("opd_ppm").desc, col("tok"))
        tokensShared(s, d)
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("df"))
          .filter(col("cnt") >= 50)
          .select(col("tok"), col("cnt"), col("df"),
            expr("cnt * 1000000 div df").as("opd_ppm"))
          .orderBy(col("opd_ppm").desc, col("tok")).limit(30)
          .withColumn("rnk", row_number().over(w).cast("long"))
          .select(col("rnk"), col("tok"), col("cnt"), col("df"), col("opd_ppm"))
          .orderBy("rnk")
      },
      Some("""WITH t AS (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS tok
                   FROM documents WHERE length(trim(text)) > 0),
                  a AS (SELECT tok, count(*) AS cnt,
                          count(DISTINCT doc_id) AS df
                        FROM t GROUP BY tok),
                  b AS (SELECT tok, cnt, df,
                          CAST(cnt * 1000000 // df AS BIGINT) AS opd_ppm
                        FROM a WHERE cnt >= 50)
              SELECT row_number() OVER (ORDER BY opd_ppm DESC, tok) AS rnk,
                     tok, cnt, df, opd_ppm
              FROM b ORDER BY rnk LIMIT 30""")),

    // x114 — metadata-filtered similarity search: exact cosine top-10 to
    // query vec 0 among docs whose source = 'src3' only — the filtered
    // retrieval shape ("nearest docs under THIS license / from THIS
    // domain") pipelines run far more often than unfiltered top-k. The
    // source predicate lands as a left-semi join BEFORE any distance math
    // (filter cuts the scan, not just the ranking); at scale the same
    // pre-filter composes in front of the srp/ivf retrievers.
    QueryDef("x114_filtered_topk",
      (s, d) => Similarity.cosineTopKWithin(
          Tables.embeddings(s, d), queryId = 0L, kTop = 10,
          Tables.documents(s, d).filter(col("source") === "src3")
            .select(col("doc_id").as("vec_id")))
        .orderBy(col("cos").desc, col("vec_id").asc),
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              SELECT e.vec_id,
                     round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS cos
              FROM embeddings e
                JOIN documents dd ON dd.doc_id = e.vec_id AND dd.source = 'src3',
                q
              WHERE e.vec_id <> 0
              ORDER BY cos DESC, vec_id LIMIT 10""")),

    // x115 — code-switching detector: language-guess each HALF of a doc
    // (token-boundary split) and flag halves that disagree — the
    // mixed-language/mid-doc-switch probe a doc-level lang id (x04)
    // structurally cannot see (a 50/50 en/de doc gets one confident wrong
    // label; its halves disagree loudly). Same total argmax formula as
    // x04 applied per half; docs need ≥ 2 tokens so both halves are
    // non-empty. Scale: scan-local scoring — one stopword regexp per
    // language profile per half (4 profiles → 8 regexp evals/row before
    // codegen subexpression reuse), no agg or join; the orderBy is the
    // catalog's presentation sort, dropped by a production pipeline.
    QueryDef("x115_code_switch",
      (s, d) => Tables.documents(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"),
          expr("array_join(slice(t, 1, (size(t) + 1) div 2), ' ')").as("h1"),
          expr("""array_join(slice(t, (size(t) + 1) div 2 + 1,
                             size(t) - (size(t) + 1) div 2), ' ')""").as("h2"))
        .select(col("doc_id"),
          TextAnalysis.langGuess(col("h1")).as("lang_head"),
          TextAnalysis.langGuess(col("h2")).as("lang_tail"))
        .withColumn("switched", col("lang_head") =!= col("lang_tail"))
        .orderBy("doc_id"),
      Some {
        s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                 FROM documents WHERE length(trim(text)) > 0),
                h AS (SELECT doc_id,
                        array_to_string(toks[1 : (len(toks) + 1) // 2], ' ') AS h1,
                        array_to_string(toks[(len(toks) + 1) // 2 + 1 : len(toks)], ' ') AS h2
                      FROM t WHERE len(toks) >= 2)
            SELECT doc_id, ${oracleLangCase("h1")} AS lang_head,
                   ${oracleLangCase("h2")} AS lang_tail,
                   ${oracleLangCase("h1")} <> ${oracleLangCase("h2")} AS switched
            FROM h ORDER BY doc_id"""
      }),

    // x116 — BPE merge-pair table: occurrence-weighted adjacent character
    // pair counts, top-20 — the FIRST iteration of byte-pair-encoding
    // tokenizer training run in-engine (the argmax pair IS the first BPE
    // merge; re-running after applying a merge iterates the training).
    // Exactness: pure integer counting. Scale: the char-pair explode runs
    // over the VOCAB (token TYPES weighted by their counts), not the
    // corpus token stream — the explode is |V|·avg_len rows however many
    // trillions of token occurrences the corpus holds; rides the shared
    // token explode + one vocab agg. ASCII-pair semantics match the
    // fixture; production swaps substr for a byte-level slice.
    QueryDef("x116_bpe_merge_pairs",
      (s, d) => {
        val w = Window.orderBy(col("n").desc, col("pair"))
        vocabShared(s, d)
          .filter(length(col("tok")) >= 2)
          .select(explode(expr(
            """transform(sequence(0, length(tok) - 2),
                         i -> substr(tok, i + 1, 2))""")).as("pair"),
            col("cnt"))
          .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("pair")).limit(20)
          .withColumn("rnk", row_number().over(w).cast("long"))
          .select(col("rnk"), col("pair"), col("n").cast("long").as("n"))
          .orderBy("rnk")
      },
      Some("""WITH t AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
                   FROM documents WHERE length(trim(text)) > 0),
                  v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
                  p AS (SELECT substr(tok, i + 1, 2) AS pair, cnt
                        FROM v, unnest(range(0, length(tok) - 1)) AS u(i)
                        WHERE length(tok) >= 2),
                  a AS (SELECT pair, sum(cnt) AS n FROM p GROUP BY pair)
              SELECT row_number() OVER (ORDER BY n DESC, pair) AS rnk, pair,
                     CAST(n AS BIGINT) AS n
              FROM a ORDER BY rnk LIMIT 20""")),

    // x117 — BPE training iteration 2: take iteration 1's argmax pair (the
    // first BPE merge — x116's rank-1 row), APPLY it to the vocabulary's
    // symbol sequences (space-joined chars; `replace` merges left-to-right
    // non-overlapping occurrences, the standard BPE apply), and recount
    // adjacent SYMBOL pairs — rank 1 here is the second merge. Two-symbol
    // pairs are emitted space-separated ("m er"), the unambiguous merge
    // notation. Exactness: the merge choice is a total order (count desc,
    // pair asc) and `replace` semantics agree between engines, so the
    // whole iteration hash-matches. Scale: both iterations run over the
    // |V|-row vocab frame (shared with x116) — corpus size enters only
    // through the one token-count aggregate; the top-1 merge is a
    // broadcast crossJoin (one row), never a shuffle.
    QueryDef("x117_bpe_merge_iter2",
      (s, d) => {
        val vocab = vocabShared(s, d)
        val top1 = vocab.filter(length(col("tok")) >= 2)
          .select(explode(expr(
            """transform(sequence(0, length(tok) - 2),
                         i -> substr(tok, i + 1, 2))""")).as("pair"), col("cnt"))
          .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("pair")).limit(1)
          .select(col("pair"))
        val w = Window.orderBy(col("n").desc, col("p2"))
        vocab
          .withColumn("sym", expr(
            """concat_ws(' ', transform(sequence(0, length(tok) - 1),
                                        i -> substr(tok, i + 1, 1)))"""))
          .crossJoin(broadcast(top1))
          .withColumn("sym2", expr(
            "replace(sym, concat(substr(pair, 1, 1), ' ', substr(pair, 2, 1)), pair)"))
          .select(col("cnt"), split(col("sym2"), " ").as("syms"))
          .filter(size(col("syms")) >= 2)
          .select(explode(expr(
            """transform(sequence(0, size(syms) - 2),
                         i -> concat(syms[i], ' ', syms[i + 1]))""")).as("p2"),
            col("cnt"))
          .groupBy(col("p2")).agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("p2")).limit(20)
          .withColumn("rnk", row_number().over(w).cast("long"))
          .select(col("rnk"), col("p2").as("pair"), col("n").cast("long").as("n"))
          .orderBy("rnk")
      },
      Some("""WITH t AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
                   FROM documents WHERE length(trim(text)) > 0),
                  v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
                  sp AS (SELECT cnt, array_to_string(list_transform(
                           range(0, length(tok)), i -> substr(tok, i + 1, 1)), ' ') AS sym
                         FROM v),
                  p1 AS (SELECT substr(tok, i + 1, 2) AS pair, cnt
                         FROM v, unnest(range(0, length(tok) - 1)) AS u(i)
                         WHERE length(tok) >= 2),
                  top1 AS (SELECT pair
                           FROM (SELECT pair, sum(cnt) AS n FROM p1 GROUP BY pair)
                           ORDER BY n DESC, pair LIMIT 1),
                  m AS (SELECT cnt, replace(sym,
                          substr(pair, 1, 1) || ' ' || substr(pair, 2, 1), pair) AS sym2
                        FROM sp, top1),
                  sy AS (SELECT cnt, string_split(sym2, ' ') AS syms FROM m),
                  p2 AS (SELECT syms[i + 1] || ' ' || syms[i + 2] AS pair, cnt
                         FROM sy, unnest(range(0, len(syms) - 1)) AS u(i)
                         WHERE len(syms) >= 2),
                  a AS (SELECT pair, sum(cnt) AS n FROM p2 GROUP BY pair)
              SELECT row_number() OVER (ORDER BY n DESC, pair) AS rnk, pair,
                     CAST(n AS BIGINT) AS n
              FROM a ORDER BY rnk LIMIT 20""")),

    // x118 — PQ compressed-domain similarity search: the corpus encoded to
    // m=16 4-bit-ish codes (16 bytes vs 256 — the index artifact a 100 TB
    // corpus can actually afford to scan), ranked by the ADC gather-sum
    // against the query's executor-computed lookup table. Scores are
    // APPROXIMATE cosines (rows-only); the x118b gate pins quality. The
    // near-uniform synthetic embeddings are PQ's documented hard case
    // (cosines concentrate in a narrow band), so raw-ADC overlap with the
    // exact top-10 is modest — the production path is x119's
    // shortlist + exact-refine composition.
    QueryDef("x118_pq_topk",
      (s, d) => pqTopKShared(s, d).orderBy(col("acos").desc, col("vec_id")),
      None),

    // x118b — raw-ADC recall gate: overlap with the exact x10 top-10,
    // floor 2/10 (measured 5/10 at sf0.01; conservative for the
    // uniform-embedding worst case across SFs).
    QueryDef("x118b_pq_adc_recall",
      (s, d) => {
        val exact = Similarity.cosineTopK(Tables.embeddings(s, d), 0L, 10)
          .select(col("vec_id"))
        pqTopKShared(s, d).select(col("vec_id"))
          .join(exact, Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("hits"))
          .select((col("hits") >= 2).as("recall_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")),

    // x119 — IVF-PQ batch retrieval (the FAISS IndexIVFPQ + refine
    // composition): coarse cells bound candidates (equi-join on cell id,
    // never queries × corpus), the in-cell scan ranks 16-byte PQ codes by
    // ADC (m gathers per pair, no raw-vector IO), and the top refine·kTop
    // shortlist per query is re-ranked with EXACT cosine — so reported
    // scores are true cosines and only O(queries·kTop) original vectors
    // are ever read. Engine-specific (trained quantizers) → rows-only;
    // recall pinned by x119b.
    QueryDef("x119_ivfpq_cross_topk",
      (s, d) => ivfPqCrossTopKShared(s, d).orderBy("query_id", "rnk"),
      None),

    // x119b — IVF-PQ retrieval recall gate vs the exact x53 baseline:
    // same single-scan gate shape and 0.8 floor as the plain-IVF x67
    // (measured 0.93 at sf0.01), tot=0 vacuous success.
    QueryDef("x119b_ivfpq_cross_recall",
      (s, d) => recallGate(
        crossTopKShared(s, d).select(col("query_id"), col("vec_id")),
        ivfPqCrossTopKShared(s, d).select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), floor = 0.8),
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")),

    // x120 — PQ codebook-health audit (the x41/ivfBucketStats counterpart
    // for the product quantizer): per-subspace distinct codes in use,
    // share of the dominant code, corpus mean relative reconstruction
    // error — the table that catches codebook collapse before ADC ranking
    // silently degrades. Engine-specific (trained codebooks) →
    // rows-only; bounds pinned by x120b.
    QueryDef("x120_pq_stats",
      (s, d) => pqStatsShared(s, d).orderBy("s"),
      None),

    // x120b — codebook-health gate: every subspace uses ≥ k/2 codes, no
    // code holds a majority, and mean relative reconstruction error is
    // bounded (measured: 16/16 codes used, top share ≈ 0.1, rel err
    // ≈ 0.57–0.59 across all three fixture SFs).
    QueryDef("x120b_pq_stats_gate",
      (s, d) => {
        pqStatsShared(s, d)
          .agg(min(col("codes_used")).as("min_used"),
            max(col("top_share")).as("max_share"),
            max(col("mean_rel_err")).as("err"))
          .select((col("min_used") >= 8 && col("max_share") <= 0.5 &&
            col("err") < 0.8).as("health_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS health_ok")),

    // x121 — BPE merge TABLE, 4 training iterations: the x116/x117
    // recurrence generalized to the driver loop a real tokenizer build
    // runs (Bpe.train — every iteration a |V|-row job, one-row argmax
    // collects). The oracle re-derives all four merges in pure SQL (the
    // same recurrence unrolled as CTEs), so the whole training loop
    // HASH-matches engine-to-engine.
    QueryDef("x121_bpe_merge_table",
      (s, d) => {
        import s.implicits._
        bpeMergesShared(s, d).zipWithIndex
          .map { case (p, i) => ((i + 1).toLong, p) }
          .toDF("iter", "pair").orderBy("iter")
      },
      Some(s"""${bpeOracleCtes(4)}
              SELECT iter, replace(pair, '·', '') AS pair FROM (
                SELECT CAST(1 AS BIGINT) AS iter, pair FROM m1
                UNION ALL SELECT 2, pair FROM m2
                UNION ALL SELECT 3, pair FROM m3
                UNION ALL SELECT 4, pair FROM m4)
              ORDER BY iter""")),

    // x122 — corpus fertility under the LEARNED tokenizer: apply the x121
    // merge table to every document (one map-side projection of chained
    // literal replaces — no shuffle however large the corpus) and count
    // BPE tokens per source. x70 measures fertility under a FIXED
    // tokenizer; this is the token-budget figure for the tokenizer the
    // corpus itself trained. The "§" sentinel keeps merges from crossing
    // token boundaries (Bpe.applyMerges). The oracle re-derives the
    // merges in SQL and applies them with the same replace chain —
    // end-to-end train + apply hash-match.
    QueryDef("x122_bpe_fertility",
      (s, d) => {
        val merges = bpeMergesShared(s, d)
        Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .select(col("source"),
            graft.ext.Bpe.bpeTokenCount(
              TextAnalysis.tokens(col("text")), merges).as("n_bpe"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_bpe")).cast("long").as("bpe_tokens"))
          .orderBy("source")
      },
      Some(s"""${bpeOracleCtes(4)},
              docsym AS (SELECT source, array_to_string(list_transform(
                           string_split_regex(trim(text), '\\s+'),
                           t -> array_to_string(list_transform(range(0, length(t)),
                                  i -> '·' || substr(t, i + 1, 1) || '·'), ' ')), ' ·§· ') AS sym
                         FROM documents WHERE length(trim(text)) > 0),
              applied AS (SELECT source,
                            replace(replace(replace(replace(sym,
                              coalesce((SELECT pair FROM m1), chr(1)),
                              coalesce((SELECT replace(pair, '· ·', '') FROM m1), '')),
                              coalesce((SELECT pair FROM m2), chr(1)),
                              coalesce((SELECT replace(pair, '· ·', '') FROM m2), '')),
                              coalesce((SELECT pair FROM m3), chr(1)),
                              coalesce((SELECT replace(pair, '· ·', '') FROM m3), '')),
                              coalesce((SELECT pair FROM m4), chr(1)),
                              coalesce((SELECT replace(pair, '· ·', '') FROM m4), '')) AS sym
                          FROM docsym)
              SELECT source, count(*) AS n_docs,
                     CAST(sum(len(list_filter(string_split(sym, ' '), x -> x <> '·§·'))) AS BIGINT)
                       AS bpe_tokens
              FROM applied GROUP BY source ORDER BY source""")),

    // x123 — PCA projection: every embedding reduced 64 → 16 dims through
    // the codegen'd centered mat-vec kernel — the dimensionality-reduction
    // pass that quarters every downstream ANN shuffle/index/distance at
    // 100 TB. Training is driver-side on the shared seeded sample
    // (deterministic orthogonal iteration, sign-fixed components);
    // projection is ONE map-side pass, no shuffle. Trained components
    // engine-specific → rows-only; solver quality pinned by x123b.
    // Output is exploded to scalar (vec_id, j, y) rows: the driver's compare
    // harness sorts every result frame, and an ARRAY column is unsortable
    // there (r9/r10 oracle error) — scalars also make the rows-only count a
    // real n×k coverage check rather than n opaque blobs.
    QueryDef("x123_pca_project",
      (s, d) => pcaProjShared(s, d)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "y")))
        .orderBy("vec_id", "j"),
      None),

    // x123b — PCA solver gate: variance explained by 16/64 components is
    // ≥ the uniform-spectrum floor (0.25; measured 0.31–0.38 — the
    // near-uniform fixture IS the floor case) and ≤ 1; eigenvalues
    // non-increasing; and the PROJECTED per-component variance equals the
    // eigenvalue (|Δ| < 1e-3) — the end-to-end check that the distributed
    // projection agrees with the driver-side eigendecomposition (exact in
    // the sample-covers-corpus regime of the fixtures).
    QueryDef("x123b_pca_variance_gate",
      (s, d) => {
        import s.implicits._
        val model = pcaModelShared(s, d)
        val ratio = model.explained.sum / model.totalVar
        val mono = model.explained.zip(model.explained.drop(1))
          .forall { case (a, b) => a >= b - 1e-12 }
        val eig = model.explained.zipWithIndex
          .map { case (e, j) => (j, e) }.toSeq.toDF("j", "eig")
        pcaProjShared(s, d)
          .select(posexplode(col("proj")).as(Seq("j", "y")))
          .groupBy(col("j"))
          .agg((avg(col("y") * col("y")) - avg(col("y")) * avg(col("y"))).as("v"))
          .join(broadcast(eig), "j")
          .agg(max(abs(col("v") - col("eig"))).as("md"))
          .select((lit(ratio) >= 0.25 && lit(ratio) <= 1.000001 &&
            lit(mono) && col("md") < 0.001).as("pca_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS pca_ok")),

    // x124 — reduced-dim retrieval with exact rerank: coarse top-40 in the
    // 32-component projected space (half the bytes per distance), then
    // TRUE cosine on the shortlist only — the dimensionality-reduction
    // retrieval composition (and the x119 refine pattern on the PCA
    // axis). Reported scores are exact cosines; ordering engine-specific
    // → rows-only, recall pinned by x124b.
    QueryDef("x124_pca_rerank_topk",
      (s, d) => pcaRerankShared(s, d).orderBy(col("cos").desc, col("vec_id")),
      None),

    // x124b — reduction-safety gate: overlap with the exact full-space
    // top-10, floor 7/10 (measured 9–10/10 at 32 components across SFs;
    // the same evaluation at 16 components scores 1–3/10 — the unsafe-
    // reduction verdict this gate exists to catch).
    QueryDef("x124b_pca_rerank_recall",
      (s, d) => {
        val exact = Similarity.cosineTopK(Tables.embeddings(s, d), 0L, 10)
          .select(col("vec_id"))
        exact.join(pcaRerankShared(s, d).select(col("vec_id")),
            Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("hits"))
          .select((col("hits") >= 7).as("recall_ok"))
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS recall_ok")),

    // x125 — leakage-safe (cluster-atomic) train/val/test split: under
    // x58's naive per-doc split roughly 1 in 5 near-dup pairs ends up
    // straddling the train/eval boundary (6 of 25 on the sf0.01 fixture)
    // — the eval set then scores memorization, not generalization. This split keys on the x25 dup
    // cluster instead, so all copies of a document travel together.
    // Oracle: the full x25 recursive closure + the same md5-uniform hash,
    // end-to-end hash-match.
    QueryDef("x125_cluster_split",
      (s, d) => clusterSplit(s, d).orderBy("doc_id"),
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                pairs AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                eadj AS (SELECT ia AS a, ib AS b FROM pairs
                         UNION SELECT ib, ia FROM pairs),
                r AS (SELECT a AS id, a AS reach FROM eadj
                      UNION
                      SELECT r.id, eadj.b FROM r JOIN eadj ON eadj.a = r.reach),
                cl AS (SELECT id AS doc_id, min(reach) AS cluster_rep FROM r GROUP BY id),
                a AS (SELECT d.doc_id,
                        coalesce(cl.cluster_rep, d.doc_id) AS cluster_rep
                      FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id)
              SELECT doc_id, cluster_rep,
                     CASE CAST('0x' || substr(md5(CAST(cluster_rep AS VARCHAR)), 1, 8) AS BIGINT) % 10
                       WHEN 0 THEN 'test' WHEN 1 THEN 'val' ELSE 'train' END AS split
              FROM a ORDER BY doc_id""")),

    // x125b — split-leakage audit, fully oracle-checked: the count of
    // near-dup pairs straddling splits under the naive x58 assignment
    // (non-zero on any corpus with near-dups — the hazard) vs under the
    // cluster-atomic x125 assignment (zero BY CONSTRUCTION — both engines
    // recount it from scratch rather than trusting the construction).
    // Scale: the pair frame is dup-sized, the two split joins are keyed,
    // and the naive side reuses x58's own documented window cost.
    QueryDef("x125b_split_leakage_gate",
      (s, d) => {
        val pairs = jaccardPairsShared(s, d).select(col("ia"), col("ib"))
        def crossCount(sp: DataFrame): DataFrame =
          pairs
            .join(sp.select(col("doc_id").as("ia"), col("split").as("sa")), "ia")
            .join(sp.select(col("doc_id").as("ib"), col("split").as("sb")), "ib")
            .filter(col("sa") =!= col("sb"))
            .agg(count(lit(1)).as("n"))
        crossCount(stratifiedSplit(s, d)).select(col("n").as("naive_cross_pairs"))
          .crossJoin(crossCount(clusterSplit(s, d))
            .select(col("n").as("cluster_cross_pairs")))
          .select(col("naive_cross_pairs"), col("cluster_cross_pairs"),
            (col("cluster_cross_pairs") === 0 && col("naive_cross_pairs") > 0)
              .as("split_ok"))
      },
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                pairs AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                eadj AS (SELECT ia AS a, ib AS b FROM pairs
                         UNION SELECT ib, ia FROM pairs),
                r AS (SELECT a AS id, a AS reach FROM eadj
                      UNION
                      SELECT r.id, eadj.b FROM r JOIN eadj ON eadj.a = r.reach),
                cl AS (SELECT id AS doc_id, min(reach) AS cluster_rep FROM r GROUP BY id),
                cs AS (SELECT d.doc_id,
                         CASE CAST('0x' || substr(md5(CAST(
                                coalesce(cl.cluster_rep, d.doc_id) AS VARCHAR)), 1, 8)
                              AS BIGINT) % 10
                           WHEN 0 THEN 'test' WHEN 1 THEN 'val' ELSE 'train' END AS split
                       FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
                ns0 AS (SELECT doc_id, source, md5(text) AS ok FROM documents),
                ns1 AS (SELECT doc_id,
                          row_number() OVER (PARTITION BY source ORDER BY ok, doc_id) AS rn,
                          count(*) OVER (PARTITION BY source) AS n
                        FROM ns0),
                ns AS (SELECT doc_id,
                         CASE WHEN (rn - 1) * 10 < n THEN 'test'
                              WHEN (rn - 1) * 5 < n THEN 'val'
                              ELSE 'train' END AS split
                       FROM ns1),
                ncross AS (SELECT count(*) AS n FROM pairs
                           JOIN ns a ON a.doc_id = pairs.ia
                           JOIN ns b ON b.doc_id = pairs.ib
                           WHERE a.split <> b.split),
                ccross AS (SELECT count(*) AS n FROM pairs
                           JOIN cs a ON a.doc_id = pairs.ia
                           JOIN cs b ON b.doc_id = pairs.ib
                           WHERE a.split <> b.split)
              SELECT ncross.n AS naive_cross_pairs, ccross.n AS cluster_cross_pairs,
                     (ccross.n = 0 AND ncross.n > 0) AS split_ok
              FROM ncross, ccross""")),

    // x126 — BPE compression curve: corpus token total under each PREFIX
    // of the x121 merge table (0..4 merges) — the marginal-compression
    // figure ("what does one more merge buy") that sizes a vocabulary.
    // The totals come from the training run itself (|V|-row aggregates
    // over the chain's persisted vocab frames — Bpe.trainWithCurve, one
    // shared training for x121/x122/x126), NOT from re-applying merge
    // prefixes to the corpus: a first cut did the latter and was the
    // catalog's most expensive query (5 corpus scans, ~5 s at sf0.1);
    // this is corpus-size-independent. The oracle recomputes each total
    // from ITS replayed vocab recurrence (Σ cnt · symbols-per-type), and
    // BpeSpec pins type-table ≡ corpus-apply equality.
    QueryDef("x126_bpe_compression_curve",
      (s, d) => {
        import s.implicits._
        // early-stopped training (a corpus with fewer than 4 possible
        // merges) pads the curve by repeating the final total — "no
        // further compression available" — matching the oracle's fixed 5
        // prefixes, whose chr(1)-guarded replaces likewise carry the
        // vocab frames forward unchanged once the merge CTEs go empty
        val curve = bpeTrainedShared(s, d)._2
        val padded = curve ++ Seq.fill(5 - curve.length)(curve.last)
        padded.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }
          .toDF("n_merges", "total_tokens").orderBy("n_merges")
      },
      Some(s"""${bpeOracleCtes(4)}
              SELECT n_merges, total_tokens FROM (
                SELECT CAST(0 AS BIGINT) AS n_merges,
                       CAST(coalesce(sum(cnt * len(string_split(sym, ' '))), 0) AS BIGINT) AS total_tokens
                FROM s0
                UNION ALL SELECT 1, CAST(coalesce(sum(cnt * len(string_split(sym, ' '))), 0) AS BIGINT) FROM s1
                UNION ALL SELECT 2, CAST(coalesce(sum(cnt * len(string_split(sym, ' '))), 0) AS BIGINT) FROM s2
                UNION ALL SELECT 3, CAST(coalesce(sum(cnt * len(string_split(sym, ' '))), 0) AS BIGINT) FROM s3
                UNION ALL SELECT 4, CAST(coalesce(sum(cnt * len(string_split(sym, ' '))), 0) AS BIGINT) FROM s4
              ) ORDER BY n_merges""")),

    // x127 — BM25 top-k lexical retrieval: the standard lexical ranker run
    // in-engine over the documents table for a literal query ("dup vector
    // stream" — one rare, two mid-frequency terms, so idf actually
    // discriminates). ONE token scan with the term filter pushed into it,
    // two matched-doc-sized aggregates, and a TakeOrderedAndProject top-10
    // (no global sort; the 10-row rank window is free). Per-(doc, term)
    // contributions quantize to integer micro-units BEFORE the per-doc sum
    // (the x92/x96 trick) — exact BIGINT scores, hash-matched oracle.
    QueryDef("x127_bm25_topk",
      (s, d) => {
        val scored = Retrieval.bm25(Tables.documents(s, d),
          Seq("dup", "vector", "stream"))
        scored.orderBy(col("score_micro").desc, col("doc_id")).limit(10)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("score_micro").desc, col("doc_id"))))
          .select(col("doc_id"), col("n_hit_terms"), col("score_micro"), col("rnk"))
          .orderBy("rnk")
      },
      Some("""WITH u AS (SELECT doc_id, trim(text) AS t FROM documents
                     WHERE length(trim(text)) > 0),
                  dl AS (SELECT doc_id, len(string_split_regex(t, '\s+')) AS dl FROM u),
                  st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
                  tk AS (SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS tok FROM u),
                  tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
                         WHERE tok IN ('dup', 'vector', 'stream') GROUP BY 1, 2),
                  df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
                  c AS (SELECT tf.doc_id,
                          CAST(round(
                            ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
                            (CAST(tf AS DOUBLE) * 2.2) /
                            (CAST(tf AS DOUBLE) + 1.2 *
                              (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
                            * 1e6) AS BIGINT) AS c_micro
                        FROM tf JOIN df USING (tok)
                             JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st),
                  sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
                           CAST(sum(c_micro) AS BIGINT) AS score_micro
                         FROM c GROUP BY doc_id)
              SELECT doc_id, n_hit_terms, score_micro,
                     CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rnk
              FROM sc QUALIFY rnk <= 10 ORDER BY rnk""")),

    // x128 — hybrid retrieval by reciprocal-rank fusion: the x127 lexical
    // ranking fused with an exact-cosine semantic ranking against query
    // vector 0 (documents and embeddings share the aligned doc_id/vec_id),
    // RRF k=60. Each side ranks only its own TOP-100 SHORTLIST
    // (TakeOrderedAndProject, then a 100-row window) — the shape that
    // survives 100 TB, where the semantic shortlist comes from srp/ivf
    // retrieval instead of a full-corpus rank; ids absent from one list
    // contribute 0, exactly RRF's contract. Fusion terms are exact
    // integers (round(1e9/(60+rnk))), so the oracle hash-matches.
    QueryDef("x128_hybrid_rrf",
      (s, d) => {
        val lex = Retrieval.bm25(Tables.documents(s, d),
            Seq("dup", "vector", "stream"))
          .orderBy(col("score_micro").desc, col("doc_id")).limit(100)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("score_micro").desc, col("doc_id"))))
          .select(col("doc_id"), col("rnk"))
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") === 0L)
          .select(col("embedding").as("qe"),
            Similarity.norm(col("embedding")).as("qnrm"))
        val sem = emb.filter(col("vec_id") =!= 0L)
          .crossJoin(broadcast(q))
          .select(col("vec_id").as("doc_id"),
            round(Similarity.dot(col("embedding"), col("qe")) /
              (Similarity.norm(col("embedding")) * col("qnrm")), 6).as("cos"))
          .orderBy(col("cos").desc, col("doc_id")).limit(100)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("cos").desc, col("doc_id"))))
          .select(col("doc_id"), col("rnk"))
        Retrieval.rrfFuse(lex, sem, "doc_id")
          .orderBy(col("rrf_micro").desc, col("doc_id")).limit(10)
      },
      Some("""WITH u AS (SELECT doc_id, trim(text) AS t FROM documents
                     WHERE length(trim(text)) > 0),
                  dl AS (SELECT doc_id, len(string_split_regex(t, '\s+')) AS dl FROM u),
                  st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
                  tk AS (SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS tok FROM u),
                  tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
                         WHERE tok IN ('dup', 'vector', 'stream') GROUP BY 1, 2),
                  df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
                  c AS (SELECT tf.doc_id,
                          CAST(round(
                            ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
                            (CAST(tf AS DOUBLE) * 2.2) /
                            (CAST(tf AS DOUBLE) + 1.2 *
                              (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
                            * 1e6) AS BIGINT) AS c_micro
                        FROM tf JOIN df USING (tok)
                             JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st),
                  sc AS (SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro
                         FROM c GROUP BY doc_id),
                  lex AS (SELECT doc_id,
                            row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rnk
                          FROM sc QUALIFY rnk <= 100),
                  qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
                  sem AS (SELECT vec_id AS doc_id,
                            row_number() OVER (ORDER BY
                              round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) DESC,
                              vec_id) AS rnk
                          FROM embeddings e CROSS JOIN qv q
                          WHERE e.vec_id <> 0 QUALIFY rnk <= 100)
              SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
                     coalesce(CAST(round(1e9 / (60 + lex.rnk)) AS BIGINT), 0) +
                     coalesce(CAST(round(1e9 / (60 + sem.rnk)) AS BIGINT), 0) AS rrf_micro
              FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
              ORDER BY rrf_micro DESC, doc_id LIMIT 10""")),

    // x129 — hard-negative mining: each query vector's top-3 highest-cosine
    // OTHER-label corpus vectors — the near-miss negatives a contrastive
    // embedding trainer batches with each positive. Query batch (vec_id <
    // 10) broadcasts against one corpus scan with the label filter riding
    // the scan before the per-query rank window (the x53 crossTopK shape
    // plus one column compare); corpus-sized query sets route through
    // srpCrossTopK candidates with the same filter.
    QueryDef("x129_hard_negatives",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.hardNegativeTopK(emb.filter(col("vec_id") < 10), emb, kTop = 3)
          .orderBy("query_id", "rnk")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
                     FROM embeddings WHERE vec_id < 10),
                  s AS (SELECT q.query_id, e.vec_id, e.label,
                          round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS cos
                        FROM embeddings e CROSS JOIN q
                        WHERE e.label <> q.qlabel),
                  r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, vec_id) AS INT) AS rnk FROM s)
              SELECT query_id, vec_id, label, cos, rnk
              FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""")),

    // x130 — multi-query BM25 batch retrieval: a QUERY TABLE (five term
    // lists) scored in one pass — the lexical analog of x53's embedding
    // batch retrieval, and the one-shot face of `Retrieval.bm25Retriever`
    // (whose build-once postings answer streaming micro-batches with this
    // identical plan — StreamingSpec pins parity). The corpus-sized
    // postings frame joins the BROADCAST distinct (query, term) rows —
    // one posting-list scan serves every query — then exact micro-unit
    // sums per (query, doc) and a per-query rank window.
    QueryDef("x130_bm25_cross_topk",
      (s, d) => {
        import s.implicits._
        val qs = Seq(
          (0L, Seq("dup", "vector")), (1L, Seq("stream", "batch")),
          (2L, Seq("customer", "query")), (3L, Seq("merge", "sort", "window")),
          (4L, Seq("data")))
          .toDF("query_id", "terms")
        Retrieval.bm25CrossTopK(Tables.documents(s, d), qs, kTop = 3)
          .orderBy("query_id", "rnk")
      },
      Some("""WITH qs AS (SELECT * FROM (VALUES
                     (0, ['dup', 'vector']), (1, ['stream', 'batch']),
                     (2, ['customer', 'query']), (3, ['merge', 'sort', 'window']),
                     (4, ['data'])) AS v(query_id, terms)),
                  qt AS (SELECT CAST(query_id AS BIGINT) AS query_id,
                           unnest(list_distinct(terms)) AS tok FROM qs),
                  u AS (SELECT doc_id, trim(text) AS t FROM documents
                        WHERE length(trim(text)) > 0),
                  dl AS (SELECT doc_id, len(string_split_regex(t, '\s+')) AS dl FROM u),
                  st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
                  tk AS (SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS tok FROM u),
                  tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
                  df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
                  c AS (SELECT qt.query_id, tf.doc_id,
                          CAST(round(
                            ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
                            (CAST(tf AS DOUBLE) * 2.2) /
                            (CAST(tf AS DOUBLE) + 1.2 *
                              (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
                            * 1e6) AS BIGINT) AS c_micro
                        FROM qt JOIN tf USING (tok) JOIN df USING (tok)
                             JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st),
                  sc AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
                           CAST(sum(c_micro) AS BIGINT) AS score_micro
                         FROM c GROUP BY 1, 2),
                  r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY score_micro DESC, doc_id) AS INT) AS rnk FROM sc)
              SELECT query_id, doc_id, n_hit_terms, score_micro, rnk
              FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""")),

    // x131 — contrastive triplet assembly: per anchor, the nearest
    // same-label positive and the nearest other-label hard negative
    // (x129's rank-1) with the exact integer cosine margin — the
    // (anchor, positive, negative) rows an embedding trainer consumes,
    // margin as the batch-sampler difficulty signal. One corpus scan, one
    // rank window over (query, same-label) — no second scoring pass.
    QueryDef("x131_contrastive_triplets",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.contrastiveTriplets(emb.filter(col("vec_id") < 10), emb)
          .orderBy("query_id")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
                     FROM embeddings WHERE vec_id < 10),
                  s AS (SELECT q.query_id, e.vec_id, (e.label = q.qlabel) AS same,
                          round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS cos
                        FROM embeddings e CROSS JOIN q
                        WHERE e.vec_id <> q.query_id),
                  r AS (SELECT *, row_number() OVER (PARTITION BY query_id, same
                          ORDER BY cos DESC, vec_id) AS rnk FROM s),
                  p AS (SELECT query_id,
                          max(CASE WHEN same THEN vec_id END) AS pos_id,
                          max(CASE WHEN same THEN cos END) AS pos_cos,
                          max(CASE WHEN NOT same THEN vec_id END) AS neg_id,
                          max(CASE WHEN NOT same THEN cos END) AS neg_cos
                        FROM r WHERE rnk = 1 GROUP BY query_id)
              SELECT query_id, pos_id, pos_cos, neg_id, neg_cos,
                     CAST(round((pos_cos - neg_cos) * 1e6) AS BIGINT) AS margin_micro
              FROM p ORDER BY query_id""")),

    // x132 — pseudo-relevance-feedback retrieval (RM3/Rocchio-lite): seed
    // BM25 → top-3 feedback docs → the 2 highest Σ tf·idf_micro NEW terms
    // in them → re-scored BM25 over seeds ∪ expansion, top-10. The whole
    // two-stage chain is ONE lazy plan (expansion terms flow as a frame,
    // no driver collect); every stage quantizes to exact integers, so the
    // chosen terms — and the final ranking — hash-match the unrolled SQL.
    QueryDef("x132_bm25_prf",
      (s, d) => Retrieval.bm25Prf(Tables.documents(s, d), Seq("dup", "vector"))
        .orderBy("rnk"),
      Some("""WITH u AS (SELECT doc_id, trim(text) AS t FROM documents
                     WHERE length(trim(text)) > 0),
                  dl AS (SELECT doc_id, len(string_split_regex(t, '\s+')) AS dl FROM u),
                  st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
                  tk AS (SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS tok FROM u),
                  tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
                  df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
                  c1 AS (SELECT tf.doc_id,
                           CAST(round(
                             ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
                             (CAST(tf AS DOUBLE) * 2.2) /
                             (CAST(tf AS DOUBLE) + 1.2 *
                               (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
                             * 1e6) AS BIGINT) AS c_micro
                         FROM tf JOIN df USING (tok)
                              JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st
                         WHERE tok IN ('dup', 'vector')),
                  s1 AS (SELECT doc_id, sum(c_micro) AS score
                         FROM c1 GROUP BY doc_id),
                  fb AS (SELECT doc_id FROM s1
                         QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 3),
                  ex AS (SELECT tok,
                           sum(tf * CAST(round(ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) /
                                                        (CAST(df AS DOUBLE) + 0.5)) * 1e6) AS BIGINT)) AS w
                         FROM tf JOIN df USING (tok) CROSS JOIN st
                         WHERE doc_id IN (SELECT doc_id FROM fb)
                           AND tok NOT IN ('dup', 'vector')
                         GROUP BY tok
                         QUALIFY row_number() OVER (ORDER BY w DESC, tok) <= 2),
                  terms AS (SELECT 'dup' AS tok UNION SELECT 'vector'
                            UNION SELECT tok FROM ex),
                  c2 AS (SELECT tf.doc_id,
                           CAST(round(
                             ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
                             (CAST(tf AS DOUBLE) * 2.2) /
                             (CAST(tf AS DOUBLE) + 1.2 *
                               (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
                             * 1e6) AS BIGINT) AS c_micro
                         FROM tf JOIN terms USING (tok) JOIN df USING (tok)
                              JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st),
                  s2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
                           CAST(sum(c_micro) AS BIGINT) AS score_micro
                         FROM c2 GROUP BY doc_id)
              SELECT doc_id, n_hit_terms, score_micro,
                     CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rnk
              FROM s2 QUALIFY rnk <= 10 ORDER BY rnk""")),

    // x133 — key-skew profile: the report that decides whether q31/q32's
    // salting is worth its cost BEFORE the shuffle is planned — hottest
    // keys, exact ppm shares, and a salt_recommended verdict (share >
    // 1/parallelism ⇒ one reduce task would carry more than its fair
    // slice). One 16-byte-per-key hash aggregate at any scale, then a
    // kTop-row TakeOrderedAndProject; integer-exact → full hash-match.
    QueryDef("x133_skew_profile",
      (s, d) => graft.ops.Skew.skewProfile(
          Tables.events(s, d), "event_type", kTop = 5, parallelism = 32)
        .orderBy(col("n").desc, col("event_type")),
      Some("""WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type),
                  t AS (SELECT sum(n) AS total FROM c)
              SELECT event_type, CAST(n AS BIGINT) AS n,
                     CAST(CAST(n AS HUGEINT) * 1000000 // total AS BIGINT) AS share_ppm,
                     (CAST(n AS HUGEINT) * 32 > total) AS salt_recommended
              FROM c CROSS JOIN t
              ORDER BY n DESC, event_type LIMIT 5""")),

    // x134 — exact-substring scrub: x100's flags made actionable, the Lee
    // et al. 2022 rule as x97-style text surgery — the corpus-wide FIRST
    // occurrence of each duplicated 50-token window keeps its text, every
    // other occurrence's tokens are removed, survivors rejoin in order
    // (within-doc repeats scrub too; fully-duplicated docs return '').
    // Linear plan: per-hash argmin aggregate → scrub-volume-sized covered-
    // position explode → anti-join on the token stream → ordered rebuild.
    // Canonical selection groups on the window HASH, collision-equivalent
    // to the oracle's string grouping (the x38/x100 contract).
    QueryDef("x134_substring_scrub",
      (s, d) => graft.ext.Dedup.substringScrub(
          Tables.documents(s, d), "text", "doc_id",
          windowTokens = 50, minOcc = 2L)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                         FROM documents WHERE length(trim(text)) > 0),
                   w AS (SELECT doc_id, i AS pos,
                           array_to_string(toks[(i+1):(i+50)], ' ') AS win
                         FROM t, unnest(range(0, len(toks))) AS u(i)
                         WHERE i + 50 <= len(toks)),
                   cw AS (SELECT doc_id, pos,
                            count(*) OVER (PARTITION BY win) AS occ,
                            row_number() OVER (PARTITION BY win
                                               ORDER BY doc_id, pos) AS rn
                          FROM w),
                   sw AS (SELECT doc_id, pos FROM cw WHERE occ >= 2 AND rn > 1),
                   cov AS (SELECT DISTINCT doc_id, pos + j AS p
                           FROM sw, unnest(range(0, 50)) AS v(j)),
                   tok AS (SELECT doc_id, i AS p, toks[i+1] AS tok
                           FROM t, unnest(range(0, len(toks))) AS u(i)),
                   kept AS (SELECT tok.doc_id, count(*) AS n_kept,
                              string_agg(tok.tok, ' ' ORDER BY tok.p) AS scrub_text
                            FROM tok LEFT JOIN cov
                              ON tok.doc_id = cov.doc_id AND tok.p = cov.p
                            WHERE cov.p IS NULL GROUP BY tok.doc_id),
                   tot AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id)
              SELECT d.doc_id,
                     CAST(coalesce(tot.n_tokens, 0) AS BIGINT) AS n_tokens,
                     CAST(coalesce(tot.n_tokens, 0) - coalesce(kept.n_kept, 0) AS BIGINT)
                       AS n_scrubbed,
                     coalesce(kept.scrub_text, '') AS scrub_text
              FROM documents d
              LEFT JOIN tot USING (doc_id) LEFT JOIN kept USING (doc_id)
              ORDER BY d.doc_id""")),

    // x135 — sequence-pack plan: the GPT-style concat-and-chunk layout as
    // a deterministic function of (corpus, capacity, seed) — each doc's
    // shuffle position (md5 order key, engine-portable), exclusive prefix
    // token count, and the [start_seq, end_seq] interval it occupies at
    // capacity 128. The textbook global running-sum window is a single-
    // partition sort at 100 TB; Pack.packPlan computes the identical
    // prefix sum in two phases (256-bucket subtotal cumsum — the only
    // single-partition window, ≤256 rows — then within-bucket windows
    // hash-partitioned by the key prefix, so bucket order refines key
    // order). All-BIGINT output → full hash-match.
    QueryDef("x135_pack_plan",
      (s, d) => packPlanShared(s, d).orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
                     len(string_split_regex(trim(text), '\s+')) AS n,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT doc_id, n,
                          CAST(coalesce(sum(n) OVER (ORDER BY okey, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS cb
                        FROM t)
              SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                     CAST(cb AS BIGINT) AS cum_before,
                     CAST(cb // 128 AS BIGINT) AS start_seq,
                     CAST(cb % 128 AS BIGINT) AS start_off,
                     CAST((cb + n - 1) // 128 AS BIGINT) AS end_seq,
                     CAST((cb + n - 1) // 128 - cb // 128 + 1 AS BIGINT)
                       AS n_segs
              FROM c ORDER BY doc_id""")),

    // x136 — packed segments: the x135 plan exploded into the shard-
    // writer's input — one row per (sequence, document-slice), slices
    // tiling both the sequence's [0,128) and the document's [0,n_tokens)
    // token intervals. The explode is bounded per doc by n_tokens/capacity
    // (never corpus-scale fan-out) and adds no shuffle beyond the plan's.
    QueryDef("x136_pack_segments",
      (s, d) => Pack.packSegments(packPlanShared(s, d), capacity = 128L)
        .orderBy("seq_id", "seq_off", "doc_id"),
      Some("""WITH t AS (SELECT doc_id,
                     len(string_split_regex(trim(text), '\s+')) AS n,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT doc_id, n,
                          CAST(coalesce(sum(n) OVER (ORDER BY okey, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS cb
                        FROM t),
                  seg AS (SELECT doc_id, n, cb, cb // 128 AS ss,
                            cb % 128 AS so, u.s AS seq_id
                          FROM c, unnest(range(cb // 128,
                                               (cb + n - 1) // 128 + 1))
                            AS u(s))
              SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
                     CAST(CASE WHEN seq_id = ss THEN so ELSE 0 END AS BIGINT)
                       AS seq_off,
                     CAST(CASE WHEN seq_id = ss THEN 0
                               ELSE seq_id * 128 - cb END AS BIGINT)
                       AS doc_off,
                     CAST(least(cb + n, (seq_id + 1) * 128)
                          - greatest(cb, seq_id * 128) AS BIGINT) AS seg_len
              FROM seg ORDER BY seq_id, seq_off, doc_id""")),

    // x135b — packing capacity gate: every sequence except the last is
    // filled to EXACTLY capacity tokens and none exceeds it — the
    // invariant a fixed-shape training loader depends on. One
    // groupBy(seq_id) over the shared segments + a broadcast one-row max
    // frame; empty corpus is vacuous success.
    QueryDef("x135b_pack_capacity_gate",
      (s, d) => Pack.capacityGate(
        Pack.packSegments(packPlanShared(s, d), capacity = 128L),
        capacity = 128L),
      Some("""WITH t AS (SELECT doc_id,
                     len(string_split_regex(trim(text), '\s+')) AS n,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT doc_id, n,
                          CAST(coalesce(sum(n) OVER (ORDER BY okey, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS cb
                        FROM t),
                  seg AS (SELECT cb // 128 AS ss, u.s AS seq_id,
                            least(cb + n, (u.s + 1) * 128)
                              - greatest(cb, u.s * 128) AS seg_len
                          FROM c, unnest(range(cb // 128,
                                               (cb + n - 1) // 128 + 1))
                            AS u(s)),
                  per AS (SELECT seq_id, sum(seg_len) AS n_tok
                          FROM seg GROUP BY 1),
                  m AS (SELECT max(seq_id) AS mx, count(*) AS n_all FROM per)
              SELECT CAST(coalesce(max(n_all), 0) AS BIGINT) AS n_seqs,
                     coalesce(bool_and((n_tok = 128 OR seq_id = mx)
                                       AND n_tok <= 128), true)
                       AS capacity_ok
              FROM per CROSS JOIN m""")),

    // x142 — pack rehydration: the packing family closed end-to-end —
    // x136's layout coordinates joined back to the corpus, token arrays
    // sliced at (doc_off, seg_len), sequences reassembled in slice order.
    // Two keyed shuffles (doc_id slice join, seq_id regroup with state
    // bounded by capacity tokens); ordered reassembly via a sorted struct
    // array, no window. Hash-match includes the rebuilt sequence text.
    QueryDef("x142_pack_rehydrate",
      (s, d) => Pack.rehydrate(
          Pack.packSegments(packPlanShared(s, d), capacity = 128L),
          Tables.documents(s, d))
        .orderBy("seq_id"),
      Some("""WITH t AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks,
                     len(string_split_regex(trim(text), '\s+')) AS n,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT doc_id, n,
                          CAST(coalesce(sum(n) OVER (ORDER BY okey, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS cb
                        FROM t),
                  seg AS (SELECT doc_id, n, cb, cb // 128 AS ss,
                            cb % 128 AS so, u.s AS seq_id
                          FROM c, unnest(range(cb // 128,
                                               (cb + n - 1) // 128 + 1))
                            AS u(s)),
                  sl AS (SELECT seg.seq_id,
                           CASE WHEN seq_id = ss THEN so ELSE 0 END AS seq_off,
                           CASE WHEN seq_id = ss THEN 0
                                ELSE seq_id * 128 - cb END AS doc_off,
                           least(cb + seg.n, (seq_id + 1) * 128)
                             - greatest(cb, seq_id * 128) AS seg_len,
                           t.toks
                         FROM seg JOIN t USING (doc_id))
              SELECT CAST(seq_id AS BIGINT) AS seq_id,
                     CAST(count(*) AS BIGINT) AS n_slices,
                     string_agg(array_to_string(
                       toks[(doc_off + 1):(doc_off + seg_len)], ' '),
                       ' ' ORDER BY seq_off) AS seq_text
              FROM sl GROUP BY seq_id ORDER BY seq_id""")),

    // x137 — Gopher repetition filters: per-doc duplicate-line count +
    // chars, top-2-gram multiplicity, duplicate-3-gram count, each with
    // its exact floored-ppm fraction (Rae et al. 2021's within-document
    // repetition signals — the quality filter that catches stuck
    // generation loops and boilerplate stutter BEFORE any corpus-level
    // dedup). ONE map-only HOF projection — no shuffle, no corpus state;
    // duplicates via array_distinct size deltas, multiplicities via a
    // sorted-array adjacent-run walk. All-BIGINT → full hash-match.
    QueryDef("x137_repetition_stats",
      (s, d) => TextAnalysis.repetitionStats(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, text FROM documents
                         WHERE length(trim(text)) > 0),
                  l AS (SELECT doc_id,
                          unnest(list_filter(list_transform(
                            string_split(text, chr(10)), x -> trim(x)),
                            x -> length(x) > 0)) AS line
                        FROM d),
                  lc AS (SELECT doc_id, line, count(*) AS c
                         FROM l GROUP BY 1, 2),
                  lst AS (SELECT doc_id, sum(c) AS n_lines,
                            sum(c - 1) AS dup_cnt,
                            sum((c - 1) * length(line)) AS dup_chars
                          FROM lc GROUP BY 1),
                  t AS (SELECT doc_id,
                          string_split_regex(trim(text), '\s+') AS toks
                        FROM d),
                  b AS (SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] AS g
                        FROM t, unnest(range(0, len(toks) - 1)) AS u(i)),
                  bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
                  bst AS (SELECT doc_id, sum(c) AS n_big, max(c) AS top_cnt
                          FROM bc GROUP BY 1),
                  tr AS (SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2]
                                        || ' ' || toks[i + 3] AS g
                         FROM t, unnest(range(0, len(toks) - 2)) AS u(i)),
                  tc AS (SELECT doc_id, g, count(*) AS c FROM tr GROUP BY 1, 2),
                  tst AS (SELECT doc_id, sum(c) AS n_tri,
                            sum(c - 1) AS dup_tri
                          FROM tc GROUP BY 1)
              SELECT d.doc_id,
                     CAST(coalesce(n_lines, 0) AS BIGINT) AS n_lines,
                     CAST(coalesce(dup_cnt, 0) AS BIGINT) AS dup_line_cnt,
                     CAST(coalesce(dup_chars, 0) AS BIGINT) AS dup_line_chars,
                     CAST(CASE WHEN coalesce(n_lines, 0) = 0 THEN 0
                               ELSE 1000000 * dup_cnt // n_lines END AS BIGINT)
                       AS dup_line_ppm,
                     CAST(coalesce(n_big, 0) AS BIGINT) AS n_bigrams,
                     CAST(coalesce(top_cnt, 0) AS BIGINT) AS top_bigram_cnt,
                     CAST(CASE WHEN coalesce(n_big, 0) = 0 THEN 0
                               ELSE 1000000 * top_cnt // n_big END AS BIGINT)
                       AS top_bigram_ppm,
                     CAST(coalesce(n_tri, 0) AS BIGINT) AS n_trigrams,
                     CAST(coalesce(dup_tri, 0) AS BIGINT) AS dup_trigram_cnt,
                     CAST(CASE WHEN coalesce(n_tri, 0) = 0 THEN 0
                               ELSE 1000000 * dup_tri // n_tri END AS BIGINT)
                       AS dup_trigram_ppm
              FROM d LEFT JOIN lst USING (doc_id)
                     LEFT JOIN bst USING (doc_id)
                     LEFT JOIN tst USING (doc_id)
              ORDER BY d.doc_id""")),

    // x138 — DSIR importance weights (Xie et al. 2023): per-doc hashed-
    // n-gram log-likelihood ratio of the target distribution (lang 'en')
    // against the raw corpus — the data-selection score behind importance
    // resampling. Features are md5-hashed unigram+bigram buckets (4096 —
    // fixed-size tables at any corpus scale, engine-portable ids);
    // per-bucket Laplace log-ratios quantize once to integer micro-nats,
    // per-doc sums are exact BIGINTs → full hash-match.
    QueryDef("x138_dsir_weights",
      (s, d) => dsirShared(s, d).orderBy("doc_id"),
      Some(s"""$dsirOracleBase
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
                     CAST(sum(q) AS BIGINT) AS w_sum,
                     CAST(sum(q) // count(*) AS BIGINT) AS w_mean
              FROM h JOIN lr USING (b) GROUP BY doc_id ORDER BY doc_id""")),

    // x139 — DSIR selection: the deterministic top-100 docs by per-feature
    // mean importance (ties broken by doc_id) — the "keep the most
    // target-like slice" step. TakeOrderedAndProject over the shared
    // weight frame: k rows cross any corpus size.
    QueryDef("x139_dsir_select",
      (s, d) => dsirShared(s, d)
        .orderBy(col("w_mean").desc, col("doc_id")).limit(100),
      Some(s"""$dsirOracleBase,
                  w AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
                          CAST(sum(q) AS BIGINT) AS w_sum,
                          CAST(sum(q) // count(*) AS BIGINT) AS w_mean
                        FROM h JOIN lr USING (b) GROUP BY doc_id)
              SELECT doc_id, n_feat, w_sum, w_mean FROM w
              ORDER BY w_mean DESC, doc_id LIMIT 100""")),

    // x140 — composite quality-filter verdict: the C4/Gopher rule battery
    // as one keep/drop + reason bitmask per doc (1 too_short, 2 too_long,
    // 4 word_length, 8 symbol_heavy, 16 no_stopword, 32 repetitive_bigram,
    // 64 repetitive_trigram). Every threshold an exact integer cross-
    // multiplication — no ppm rounding, no doubles → full hash-match. Same
    // map-only no-shuffle shape as x137.
    QueryDef("x140_filter_verdicts",
      (s, d) => TextAnalysis.filterVerdicts(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, text,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
                  base AS (SELECT doc_id, len(toks) AS n,
                     length(regexp_replace(trim(text), '\s+', '', 'g'))
                       AS tok_chars,
                     length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                       AS sym_chars,
                     length(text) AS n_chars,
                     len(list_intersect(toks,
                       ['the', 'a', 'of', 'to', 'and'])) > 0 AS has_stop
                   FROM d),
                  b AS (SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] AS g
                        FROM d, unnest(range(0, len(toks) - 1)) AS u(i)),
                  bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
                  bst AS (SELECT doc_id, sum(c) AS n_big, max(c) AS top_cnt
                          FROM bc GROUP BY 1),
                  tr AS (SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2]
                                        || ' ' || toks[i + 3] AS g
                         FROM d, unnest(range(0, len(toks) - 2)) AS u(i)),
                  tc AS (SELECT doc_id, g, count(*) AS c FROM tr GROUP BY 1, 2),
                  tst AS (SELECT doc_id, sum(c) AS n_tri, sum(c - 1) AS dup_tri
                          FROM tc GROUP BY 1),
                  v AS (SELECT base.doc_id, n,
                          (CASE WHEN n < 5 THEN 1 ELSE 0 END)
                        + (CASE WHEN n > 50000 THEN 2 ELSE 0 END)
                        + (CASE WHEN tok_chars < 2 * n
                                  OR tok_chars > 12 * n THEN 4 ELSE 0 END)
                        + (CASE WHEN sym_chars * 10 > n_chars
                                THEN 8 ELSE 0 END)
                        + (CASE WHEN NOT has_stop THEN 16 ELSE 0 END)
                        + (CASE WHEN coalesce(n_big, 0) >= 10
                                 AND coalesce(top_cnt, 0) * 5 > n_big
                                THEN 32 ELSE 0 END)
                        + (CASE WHEN coalesce(n_tri, 0) >= 10
                                 AND coalesce(dup_tri, 0) * 10 > n_tri * 3
                                THEN 64 ELSE 0 END) AS reasons
                        FROM base LEFT JOIN bst USING (doc_id)
                                  LEFT JOIN tst USING (doc_id))
              SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                     CAST(reasons AS BIGINT) AS reasons,
                     reasons = 0 AS keep
              FROM v ORDER BY doc_id""")),

    // x141 — per-source corpus health: the x140 battery rolled up to the
    // report a pipeline owner actually reads — per source, doc and token
    // volume, keep count, and each rule's drop count (bitmask tests,
    // integer-exact). One extra hash aggregate over the map-only verdict
    // projection; output is sources-sized.
    QueryDef("x141_source_health",
      (s, d) => TextAnalysis.filterVerdicts(Tables.documents(s, d),
          passthrough = Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(expr("IF((reasons & 1) > 0, 1L, 0L)")).as("n_too_short"),
          sum(expr("IF((reasons & 2) > 0, 1L, 0L)")).as("n_too_long"),
          sum(expr("IF((reasons & 4) > 0, 1L, 0L)")).as("n_word_length"),
          sum(expr("IF((reasons & 8) > 0, 1L, 0L)")).as("n_symbol_heavy"),
          sum(expr("IF((reasons & 16) > 0, 1L, 0L)")).as("n_no_stopword"),
          sum(expr("IF((reasons & 32) > 0, 1L, 0L)")).as("n_rep_bigram"),
          sum(expr("IF((reasons & 64) > 0, 1L, 0L)")).as("n_rep_trigram"))
        .orderBy("source"),
      Some("""WITH d AS (SELECT doc_id, source, text,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
                  base AS (SELECT doc_id, source, len(toks) AS n,
                     length(regexp_replace(trim(text), '\s+', '', 'g'))
                       AS tok_chars,
                     length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                       AS sym_chars,
                     length(text) AS n_chars,
                     len(list_intersect(toks,
                       ['the', 'a', 'of', 'to', 'and'])) > 0 AS has_stop
                   FROM d),
                  b AS (SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] AS g
                        FROM d, unnest(range(0, len(toks) - 1)) AS u(i)),
                  bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
                  bst AS (SELECT doc_id, sum(c) AS n_big, max(c) AS top_cnt
                          FROM bc GROUP BY 1),
                  tr AS (SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2]
                                        || ' ' || toks[i + 3] AS g
                         FROM d, unnest(range(0, len(toks) - 2)) AS u(i)),
                  tc AS (SELECT doc_id, g, count(*) AS c FROM tr GROUP BY 1, 2),
                  tst AS (SELECT doc_id, sum(c) AS n_tri, sum(c - 1) AS dup_tri
                          FROM tc GROUP BY 1),
                  v AS (SELECT base.doc_id, source, n,
                          (CASE WHEN n < 5 THEN 1 ELSE 0 END)
                        + (CASE WHEN n > 50000 THEN 2 ELSE 0 END)
                        + (CASE WHEN tok_chars < 2 * n
                                  OR tok_chars > 12 * n THEN 4 ELSE 0 END)
                        + (CASE WHEN sym_chars * 10 > n_chars
                                THEN 8 ELSE 0 END)
                        + (CASE WHEN NOT has_stop THEN 16 ELSE 0 END)
                        + (CASE WHEN coalesce(n_big, 0) >= 10
                                 AND coalesce(top_cnt, 0) * 5 > n_big
                                THEN 32 ELSE 0 END)
                        + (CASE WHEN coalesce(n_tri, 0) >= 10
                                 AND coalesce(dup_tri, 0) * 10 > n_tri * 3
                                THEN 64 ELSE 0 END) AS reasons
                        FROM base LEFT JOIN bst USING (doc_id)
                                  LEFT JOIN tst USING (doc_id))
              SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(CASE WHEN reasons = 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_kept,
                     CAST(sum(n) AS BIGINT) AS n_tokens,
                     CAST(sum(CASE WHEN (reasons & 1) > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_too_short,
                     CAST(sum(CASE WHEN (reasons & 2) > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_too_long,
                     CAST(sum(CASE WHEN (reasons & 4) > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_word_length,
                     CAST(sum(CASE WHEN (reasons & 8) > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_symbol_heavy,
                     CAST(sum(CASE WHEN (reasons & 16) > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_no_stopword,
                     CAST(sum(CASE WHEN (reasons & 32) > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_rep_bigram,
                     CAST(sum(CASE WHEN (reasons & 64) > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_rep_trigram
              FROM v GROUP BY source ORDER BY source""")),

    // x143 — winnowing near-dup pairs (Schleimer et al. 2003 MOSS): hash
    // every token 3-gram, keep each 4-wide window's MINIMUM hash, pair
    // docs sharing ≥2 selected fingerprints. The local-min selection gives
    // the detection guarantee (any shared ≥6-token run yields a shared
    // fingerprint) and shift robustness x97's block grid lacks. md5-derived
    // 48-bit hashes are engine-portable → full hash-match; the pair join
    // follows the x07 postings discipline with a df ≤ 64 fingerprint cap.
    QueryDef("x143_winnow_pairs",
      (s, d) => graft.ext.Dedup.winnowPairs(Tables.documents(s, d))
        .orderBy("ia", "ib"),
      Some("""WITH t AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents WHERE length(trim(text)) > 0),
                  gh AS (SELECT doc_id, i,
                           ('0x' || substr(md5(toks[i + 1] || ' ' ||
                              toks[i + 2] || ' ' || toks[i + 3]), 1, 12))
                             ::BIGINT AS h
                         FROM t, unnest(range(0, len(toks) - 2)) AS u(i)
                         WHERE len(toks) >= 3),
                  n AS (SELECT doc_id, count(*) AS ng FROM gh GROUP BY 1),
                  sel AS (SELECT gh.doc_id, i, ng,
                            min(h) OVER (PARTITION BY gh.doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
                          FROM gh JOIN n USING (doc_id)),
                  fps AS (SELECT DISTINCT doc_id, fp
                          FROM sel WHERE i <= ng - 4
                          UNION
                          SELECT gh.doc_id, min(h) AS fp
                          FROM gh JOIN n USING (doc_id)
                          WHERE ng < 4 GROUP BY gh.doc_id),
                  df AS (SELECT fp, count(*) AS df FROM fps GROUP BY fp),
                  kept AS (SELECT doc_id, fps.fp
                           FROM fps JOIN df USING (fp) WHERE df.df <= 64),
                  p AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                          count(*) AS n_shared
                        FROM kept a JOIN kept b USING (fp)
                        WHERE a.doc_id < b.doc_id
                        GROUP BY 1, 2)
              SELECT ia, ib, CAST(n_shared AS BIGINT) AS n_shared
              FROM p WHERE n_shared >= 2 ORDER BY ia, ib""")),

    // x144 — crawl-split stitch pairs: directed continuation seams (one
    // doc's k-token TAIL = another's k-token HEAD — the boundary a record
    // splitter or sliding-window chunk export leaves). One head + one tail
    // row per doc (8-byte md5-48 keys), df-capped both sides (a viral
    // footer is not a seam), candidates string-verified — exact
    // cross-engine, shuffle 2 rows/doc at any corpus size. k=3 exercises
    // the fixture's seams; production crawls run k ≈ 20–50.
    QueryDef("x144_stitch_pairs",
      (s, d) => graft.ext.Stitch.stitchPairs(Tables.documents(s, d))
        .orderBy("prev_id", "next_id"),
      Some(stitchPairsOracle +
        """SELECT tk.doc_id AS prev_id, hk.doc_id AS next_id,
                  tk.ov AS overlap
           FROM tk JOIN hk ON tk.h = hk.h AND tk.ov = hk.ov
             AND tk.doc_id <> hk.doc_id
           ORDER BY prev_id, next_id""")),

    // x145 — stitch chains: connected components over the x144 seams (the
    // x25 two-tier union-find/min-label machinery) + per-member roles:
    // is_head (no incoming seam — the reassembled doc starts here) and
    // is_tail (no outgoing). The regroup key + ordering hints a
    // repartition-and-merge reassembly pass needs.
    QueryDef("x145_stitch_chains",
      (s, d) => graft.ext.Stitch.stitchChains(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("WITH RECURSIVE " + stitchPairsOracle.trim.stripPrefix("WITH") +
        """,
             p AS (SELECT tk.doc_id AS prev_id, hk.doc_id AS next_id
                   FROM tk JOIN hk ON tk.h = hk.h AND tk.ov = hk.ov
                     AND tk.doc_id <> hk.doc_id),
             u AS (SELECT least(prev_id, next_id) AS ia,
                          greatest(prev_id, next_id) AS ib
                   FROM p GROUP BY 1, 2),
             ed AS (SELECT ia AS a, ib AS b FROM u
                    UNION SELECT ib, ia FROM u),
             r AS (SELECT a AS id, a AS reach FROM ed
                   UNION
                   SELECT r.id, ed.b FROM r JOIN ed ON ed.a = r.reach),
             comp AS (SELECT id AS doc_id, min(reach) AS chain_rep
                      FROM r GROUP BY id)
           SELECT c.doc_id, c.chain_rep,
                  c.doc_id NOT IN (SELECT next_id FROM p) AS is_head,
                  c.doc_id NOT IN (SELECT prev_id FROM p) AS is_tail
           FROM comp c ORDER BY doc_id""")),

    // x146 — token-multiset F1 + containment over the x07 candidate pairs:
    // the VERIFY grade for near-dup candidates. Multiset min-counting keeps
    // repeated tokens honest where shingle sets collapse them, and the two
    // asymmetric containments expose quote/excerpt relations symmetric
    // Jaccard hides. Tokens explode only for docs IN a pair (semi-join
    // first); exact integer ppm via div → full cross-engine hash-match.
    QueryDef("x146_pair_token_f1",
      (s, d) => graft.ext.Dedup.pairTokenOverlap(
          Tables.documents(s, d), jaccardPairsShared(s, d))
        .orderBy("ia", "ib"),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                         FROM documents),
                   sh AS (SELECT doc_id,
                            list_distinct(list_transform(range(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                          FROM t WHERE len(toks) >= 3),
                   z AS (SELECT doc_id, len(s) AS n FROM sh),
                   ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                   pc AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                          FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                          GROUP BY 1, 2),
                   pr AS (SELECT ia, ib
                          FROM pc JOIN z za ON za.doc_id = pc.ia
                                  JOIN z zb ON zb.doc_id = pc.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                   tk AS (SELECT doc_id,
                            unnest(string_split_regex(trim(text), '\s+')) AS tok
                          FROM documents WHERE length(trim(text)) > 0),
                   tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
                   nn AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY 1),
                   ov AS (SELECT pr.ia, pr.ib,
                            CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS ov
                          FROM pr JOIN tf a ON a.doc_id = pr.ia
                                  JOIN tf b ON b.doc_id = pr.ib AND b.tok = a.tok
                          GROUP BY 1, 2)
              SELECT pr.ia, pr.ib,
                     CAST(coalesce(na.n, 0) AS BIGINT) AS n_a,
                     CAST(coalesce(nb.n, 0) AS BIGINT) AS n_b,
                     CAST(coalesce(ov.ov, 0) AS BIGINT) AS overlap,
                     CAST(CASE WHEN coalesce(na.n, 0) + coalesce(nb.n, 0) = 0
                          THEN 0 ELSE 2000000 * coalesce(ov.ov, 0)
                               // (coalesce(na.n, 0) + coalesce(nb.n, 0)) END
                       AS BIGINT) AS f1_ppm,
                     CAST(CASE WHEN coalesce(na.n, 0) = 0 THEN 0
                          ELSE 1000000 * coalesce(ov.ov, 0) // na.n END
                       AS BIGINT) AS cont_a_ppm,
                     CAST(CASE WHEN coalesce(nb.n, 0) = 0 THEN 0
                          ELSE 1000000 * coalesce(ov.ov, 0) // nb.n END
                       AS BIGINT) AS cont_b_ppm
              FROM pr LEFT JOIN ov ON ov.ia = pr.ia AND ov.ib = pr.ib
                   LEFT JOIN nn na ON na.doc_id = pr.ia
                   LEFT JOIN nn nb ON nb.doc_id = pr.ib
              ORDER BY pr.ia, pr.ib""")),

    // x147 — Dirichlet query-likelihood retrieval (Zhai/Lafferty): the
    // language-modeling ranker beside x127's BM25, same query terms for
    // side-by-side comparison. Same pushed-down plan shape (isin filter on
    // the exploded scan, cf from the same filtered rows, broadcast stats);
    // micro-nat quantization before the sum → exact integer scores.
    QueryDef("x147_ql_topk",
      (s, d) => graft.ext.Retrieval.qlTopK(Tables.documents(s, d),
          Seq("dup", "vector", "stream"))
        .orderBy("rnk"),
      Some("""WITH u AS (SELECT doc_id, trim(text) AS t FROM documents
                         WHERE length(trim(text)) > 0),
                   dl AS (SELECT doc_id, len(string_split_regex(t, '\s+')) AS dl FROM u),
                   st AS (SELECT sum(dl) AS sum_dl FROM dl),
                   tk AS (SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS tok FROM u),
                   tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
                          WHERE tok IN ('dup', 'vector', 'stream') GROUP BY 1, 2),
                   cf AS (SELECT tok, sum(tf) AS cf FROM tf GROUP BY tok),
                   c AS (SELECT tf.doc_id,
                           CAST(round(ln(1.0 + CAST(tf AS DOUBLE) * CAST(sum_dl AS DOUBLE) /
                             (300.0 * CAST(cf AS DOUBLE))) * 1e6) AS BIGINT) AS c_micro,
                           CAST(round(ln(CAST(dl AS DOUBLE) + 300.0) * 1e6) AS BIGINT) AS norm_micro
                         FROM tf JOIN cf USING (tok)
                              JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st),
                   sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
                            CAST(sum(c_micro) - 3 * min(norm_micro) AS BIGINT) AS score_micro
                          FROM c GROUP BY doc_id)
              SELECT doc_id, n_hit_terms, score_micro,
                     CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rnk
              FROM sc QUALIFY rnk <= 10 ORDER BY rnk""")),

    // x148 — per-source unigram KL drift vs the corpus: the mixture-health
    // scalar (which source's language has wandered). One corpus token pass;
    // C_t is the second-level aggregate of the (source, tok) counts.
    // Tenth-micro-nat floor-half-up quantization before the weighted sum,
    // DECIMAL(38,0) accumulation, 0-clamp before the integral div (Spark
    // truncates, DuckDB floors on negatives) → exact cross-engine.
    QueryDef("x148_source_kl",
      (s, d) => graft.ext.TextAnalysis.sourceUnigramKl(Tables.documents(s, d))
        .orderBy("source"),
      Some("""WITH tk AS (SELECT source,
                            unnest(string_split_regex(trim(text), '\s+')) AS tok
                          FROM documents WHERE length(trim(text)) > 0),
                   st AS (SELECT source, tok, count(*) AS c_st
                          FROM tk GROUP BY 1, 2),
                   ct AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t
                          FROM st GROUP BY 1),
                   ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
                            CAST(count(*) AS BIGINT) AS vocab_s
                          FROM st GROUP BY 1),
                   nt AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot FROM ns),
                   l AS (SELECT st.source, st.c_st, ns.n_s, ns.vocab_s,
                           CAST(floor(ln((CAST(c_st AS DOUBLE) * CAST(n_tot AS DOUBLE)) /
                             (CAST(n_s AS DOUBLE) * CAST(c_t AS DOUBLE))) * 1e7
                             + 0.5) AS BIGINT) AS l_tmn
                         FROM st JOIN ct USING (tok) JOIN ns USING (source)
                              CROSS JOIN nt)
              SELECT source, min(n_s) AS n_tokens, min(vocab_s) AS vocab,
                     CAST(greatest(sum(c_st * l_tmn), 0) // min(n_s) AS BIGINT)
                       AS kl_tmn
              FROM l GROUP BY source ORDER BY source""")),

    // x149 — curriculum stages: each source's docs quartiled by unigram-LM
    // difficulty (the x92 mean −ln p in integer micro-nats; stage 1 = the
    // easiest/most-typical quarter, 4 = the hardest tail), rolled up to the
    // per-(source, stage) mixing table difficulty-staged training reads.
    // Difficulty is an exact integral div of the x92 micro-nat sum; ntile
    // runs per-source over a total order (difficulty, doc_id), so stages
    // are bit-deterministic. Scale: one corpus token pass (the shared x92
    // frame), then a per-source sort — the distributed sort shape — over
    // doc-level rows only; output is sources×4.
    QueryDef("x149_curriculum_stages",
      (s, d) => {
        val toks = tokensShared(s, d)
        val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val total = uni.agg(sum(col("cnt")).as("total"))
        val per = toks.join(uni, "tok").crossJoin(broadcast(total))
          .select(col("doc_id"), col("source"),
            expr("CAST(round(-ln(cnt / total) * 1e6) AS BIGINT)").as("q"))
          .groupBy(col("doc_id"), col("source"))
          .agg(count(lit(1)).as("n_tok"),
            expr("CAST(sum(q) div count(1) AS BIGINT)").as("d_micro"))
        per
          .withColumn("stage", ntile(4).over(
            Window.partitionBy(col("source"))
              .orderBy(col("d_micro"), col("doc_id"))))
          .groupBy(col("source"), col("stage"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            min(col("d_micro")).as("min_d_micro"),
            max(col("d_micro")).as("max_d_micro"))
          .orderBy("source", "stage")
      },
      Some("""WITH t AS (SELECT doc_id, source,
                     unnest(string_split_regex(trim(text), '\s+')) AS tok
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
                  n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c),
                  q AS (SELECT doc_id, source,
                          CAST(round(-ln(CAST(cnt AS DOUBLE) / total) * 1e6) AS BIGINT) AS q
                        FROM t JOIN c USING (tok) CROSS JOIN n),
                  per AS (SELECT doc_id, source,
                            CAST(count(*) AS BIGINT) AS n_tok,
                            CAST(sum(q) // count(*) AS BIGINT) AS d_micro
                          FROM q GROUP BY doc_id, source),
                  st AS (SELECT source, n_tok, d_micro,
                           CAST(ntile(4) OVER (PARTITION BY source
                             ORDER BY d_micro, doc_id) AS INT) AS stage
                         FROM per)
              SELECT source, stage, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                     min(d_micro) AS min_d_micro, max(d_micro) AS max_d_micro
              FROM st GROUP BY source, stage ORDER BY source, stage""")),

    // x150 — cluster labels (corpus cartography): each x46 semantic cluster
    // labeled by its top-3 TF-IDF terms, treating the CLUSTER as the
    // pseudo-document (tf over member texts, df = clusters containing the
    // term, idf over the cluster count) — the map-of-the-corpus readout
    // that turns anonymous embedding clusters into named topics. Integer
    // micro-nat idf × BIGINT tf (the x93 exactness contract); the rank
    // window partitions by cluster. Scale: member tokens aggregate to
    // (cluster, tok) in one pass over CLUSTERED docs only (semantic
    // clusters are tiny vs the corpus); df/idf are cluster-vocab-sized.
    QueryDef("x150_cluster_labels",
      (s, d) => {
        val clusters = embClustersShared(s, d)
          .select(col("doc_id"), col("cluster_rep"))
        val tf = tokensShared(s, d).select(col("doc_id"), col("tok"))
          .join(clusters, "doc_id")
          .groupBy(col("cluster_rep"), col("tok")).agg(count(lit(1)).as("tf"))
        val df_ = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val nc = clusters.agg(countDistinct(col("cluster_rep"))
          .cast("double").as("nc"))
        val members = clusters.groupBy(col("cluster_rep"))
          .agg(count(lit(1)).as("n_members"))
        val w = Window.partitionBy(col("cluster_rep"))
          .orderBy(col("tfidf_micro").desc, col("tok"))
        tf.join(df_, "tok").crossJoin(broadcast(nc))
          .select(col("cluster_rep"), col("tok"),
            (col("tf") * expr("CAST(round(ln(nc / df) * 1e6) AS BIGINT)"))
              .as("tfidf_micro"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .join(broadcast(members), "cluster_rep")
          .select(col("cluster_rep"), col("n_members"), col("rnk"),
            col("tok"), col("tfidf_micro"))
          .orderBy("cluster_rep", "rnk")
      },
      Some("""WITH RECURSIVE
                p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
                      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35),
                e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
                r AS (SELECT a AS id, a AS reach FROM e
                      UNION
                      SELECT r.id, e.b FROM r JOIN e ON e.a = r.reach),
                comp AS (SELECT id AS doc_id, min(reach) AS cluster_rep
                         FROM r GROUP BY id),
                mem AS (SELECT cluster_rep, CAST(count(*) AS BIGINT) AS n_members
                        FROM comp GROUP BY 1),
                t AS (SELECT doc_id,
                        unnest(string_split_regex(trim(text), '\s+')) AS tok
                      FROM documents WHERE length(trim(text)) > 0),
                tf AS (SELECT comp.cluster_rep, t.tok, count(*) AS tf
                       FROM t JOIN comp USING (doc_id) GROUP BY 1, 2),
                df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
                n AS (SELECT CAST(count(DISTINCT cluster_rep) AS DOUBLE) AS nc
                      FROM comp),
                sc AS (SELECT cluster_rep, tok,
                         CAST(tf * CAST(round(ln(nc / CAST(df AS DOUBLE)) * 1e6) AS BIGINT) AS BIGINT)
                           AS tfidf_micro
                       FROM tf JOIN df USING (tok) CROSS JOIN n),
                rr AS (SELECT cluster_rep, tok, tfidf_micro,
                         row_number() OVER (PARTITION BY cluster_rep
                           ORDER BY tfidf_micro DESC, tok) AS rnk
                       FROM sc)
              SELECT rr.cluster_rep, mem.n_members, rr.rnk, rr.tok,
                     rr.tfidf_micro
              FROM rr JOIN mem USING (cluster_rep) WHERE rnk <= 3
              ORDER BY cluster_rep, rnk""")),

    // x151 — bottom-k minhash corpus-overlap sketches: x112's source-pair
    // Jaccard WITHOUT the full postings self-join — per-source state is 256
    // 8-byte hashes (mergeable), pair estimates run on k-row frames. The
    // md5-derived sketch is deterministic AND engine-portable, so this
    // "approximate" operator still fully hash-matches its oracle; its
    // accuracy against exact x112 is gated by x151b.
    QueryDef("x151_source_sketch_jaccard",
      (s, d) => sourceSketchJaccard(s, d).orderBy("source_a", "source_b"),
      Some(sketchJaccOracle +
        """SELECT sa AS source_a, sb AS source_b, k_used, est_inter,
                  CAST(est_inter * 1000000 // k_used AS BIGINT) AS est_ppm
           FROM est ORDER BY source_a, source_b""")),

    // x151b — sketch-accuracy gate: the x151 estimate within 0.12 (ppm) of
    // the exact x112 Jaccard on EVERY source pair (measured max error at
    // the fixtures: 0.075 at sf0.1, 0.038 at sf0.01 — k=256 puts 4σ within
    // the bound). Pairs the exact join misses (inter = 0) compare against
    // 0. One boolean row; both sides deterministic, so even the gate
    // hash-matches.
    QueryDef("x151b_sketch_jaccard_gate",
      (s, d) => {
        val est = sourceSketchJaccard(s, d)
          .select(col("source_a"), col("source_b"), col("est_ppm"))
        val exact = sourceShingleJaccard(s, d)
          .select(col("source_a"), col("source_b"), col("jacc_ppm"))
        est.join(exact, Seq("source_a", "source_b"), "left")
          .select(abs(col("est_ppm") - coalesce(col("jacc_ppm"), lit(0L)))
            .as("err"))
          .agg(count(lit(1)).as("n_pairs"), max(col("err")).as("max_err_ppm"))
          .select(col("n_pairs"), col("max_err_ppm"),
            (col("max_err_ppm") <= 120000L).as("ok"))
      },
      Some(sketchJaccOracle.trim +
        """,
          n AS (SELECT source, count(*) AS ns FROM g0 GROUP BY source),
          i AS (SELECT a.source AS sa, b.source AS sb, count(*) AS inter
                FROM g0 a JOIN g0 b ON a.sh = b.sh AND a.source < b.source
                GROUP BY 1, 2),
          ex AS (SELECT sa, sb,
                   CAST(inter * 1000000 // (na.ns + nb.ns - inter) AS BIGINT)
                     AS jacc_ppm
                 FROM i JOIN n na ON i.sa = na.source
                        JOIN n nb ON i.sb = nb.source),
          err AS (SELECT abs(CAST(est_inter * 1000000 // k_used AS BIGINT) -
                             coalesce(ex.jacc_ppm, 0)) AS err
                  FROM est LEFT JOIN ex ON ex.sa = est.sa AND ex.sb = est.sb)
       SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(max(err) AS BIGINT) AS max_err_ppm,
              max(err) <= 120000 AS ok
       FROM err""")),

    // x152 — multi-query QL batch retrieval: a query TABLE of term lists
    // scored against the corpus in one pass (x130's batch shape on the
    // query-likelihood axis): QL postings (cf + dl attached) join the
    // BROADCAST exploded (query, term) rows, exact micro-nat sums per
    // (query, doc), per-query rank window. `Retrieval.qlRetriever` is the
    // build-once streaming twin (StreamingSpec parity).
    QueryDef("x152_ql_cross_topk",
      (s, d) => {
        import s.implicits._
        val queries = Seq(
          (0L, Seq("dup", "vector", "stream")),
          (1L, Seq("graph", "join"))).toDF("query_id", "terms")
        graft.ext.Retrieval.qlCrossTopK(Tables.documents(s, d), queries,
            kTop = 5)
          .orderBy("query_id", "rnk")
      },
      Some("""WITH q AS (SELECT * FROM (VALUES
                     (0, ['dup', 'vector', 'stream']),
                     (1, ['graph', 'join'])) AS v(query_id, terms)),
                   qt AS (SELECT query_id,
                            CAST(len(list_distinct(terms)) AS BIGINT) AS nq,
                            unnest(list_distinct(terms)) AS tok FROM q),
                   u AS (SELECT doc_id, trim(text) AS t FROM documents
                         WHERE length(trim(text)) > 0),
                   dl AS (SELECT doc_id, len(string_split_regex(t, '\s+')) AS dl FROM u),
                   st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
                   tk AS (SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS tok FROM u),
                   tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
                          WHERE tok IN (SELECT DISTINCT tok FROM qt) GROUP BY 1, 2),
                   cf AS (SELECT tok, sum(tf) AS cf FROM tf GROUP BY tok),
                   c AS (SELECT qt.query_id, qt.nq, tf.doc_id,
                           CAST(round(ln(1.0 + CAST(tf AS DOUBLE) * CAST(sum_dl AS DOUBLE) /
                             (300.0 * CAST(cf AS DOUBLE))) * 1e6) AS BIGINT) AS c_micro,
                           CAST(round(ln(CAST(dl AS DOUBLE) + 300.0) * 1e6) AS BIGINT) AS norm_micro
                         FROM tf JOIN cf USING (tok) JOIN qt USING (tok)
                              JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st),
                   sc AS (SELECT query_id, doc_id,
                            CAST(count(*) AS BIGINT) AS n_hit_terms,
                            CAST(sum(c_micro) - min(nq) * min(norm_micro) AS BIGINT)
                              AS score_micro
                          FROM c GROUP BY query_id, doc_id)
              SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
                     n_hit_terms, score_micro,
                     CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY score_micro DESC, doc_id) AS INT) AS rnk
              FROM sc QUALIFY rnk <= 5 ORDER BY query_id, rnk""")),

    // x153 — dedup impact per source: what deduplication actually COSTS
    // each source — docs removed by exact dedup (x01's min-id-per-content
    // rule), docs removed as non-canonical near-dup cluster members (the
    // x35 quality-argmax pick; exact-removed docs don't double-count), and
    // the surviving token volume in exact ppm. The accounting report a
    // pipeline owner reads before retraining mixture weights on the
    // deduped corpus. Scale: content-hash window (32-byte keys), the
    // shared x25 cluster frame, one sources-sized rollup.
    QueryDef("x153_dedup_impact",
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextAnalysis.wsTokenCount(col("text")).cast("long").as("n_tok"),
          sha2(col("text"), 256).as("ch"))
        val exFlag = base
          .withColumn("kid", min(col("doc_id")).over(
            Window.partitionBy(col("ch"))))
          .select(col("doc_id"), (col("doc_id") =!= col("kid")).as("ex"))
        val scored = Tables.documents(s, d).select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("score"))
        val picks = Dedup.canonicalPick(jacClustersShared(s, d), scored,
            "doc_id", "score")
          .select(col("keep_id").as("doc_id"))
        val nrFlag = jacClustersShared(s, d).select(col("doc_id"))
          .join(picks, Seq("doc_id"), "left_anti")
          .withColumn("nr0", lit(true))
        base.join(exFlag, "doc_id").join(nrFlag, Seq("doc_id"), "left")
          .select(col("source"), col("n_tok"), col("ex"),
            (coalesce(col("nr0"), lit(false)) && !col("ex")).as("nr"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            sum(expr("IF(ex, 1L, 0L)")).as("n_exact_removed"),
            sum(expr("IF(nr, 1L, 0L)")).as("n_neardup_removed"),
            sum(expr("IF(NOT ex AND NOT nr, n_tok, 0L)")).as("tokens_kept"))
          .withColumn("kept_ppm",
            expr("tokens_kept * 1000000 div greatest(n_tokens, 1L)"))
          .orderBy("source")
      },
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH RECURSIVE
              t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
              sh AS (SELECT doc_id,
                       list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                     FROM t WHERE len(toks) >= 3),
              z AS (SELECT doc_id, len(s) AS n FROM sh),
              ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
              p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                    FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                    GROUP BY 1, 2),
              pairs AS (SELECT ia, ib
                        FROM p JOIN z za ON za.doc_id = p.ia
                               JOIN z zb ON zb.doc_id = p.ib
                        WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
              e AS (SELECT ia AS a, ib AS b FROM pairs
                    UNION SELECT ib, ia FROM pairs),
              r AS (SELECT a AS id, a AS reach FROM e
                    UNION
                    SELECT r.id, e.b FROM r JOIN e ON e.a = r.reach),
              c AS (SELECT id AS doc_id, min(reach) AS cluster_rep
                    FROM r GROUP BY id),
              q AS (SELECT doc_id, floor((
                      least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                    + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                    + (1.0 - least(CAST(pu AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                    + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                    ) * 10000.0 + 0.5) / 10000.0 AS score
                  FROM (SELECT doc_id,
                          CASE WHEN length(trim(text)) = 0 THEN 0
                               ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                          length(text) AS ch,
                          len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS pu,
                          len(regexp_extract_all(text, '[A-Z]')) AS u,
                          len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                        FROM documents) raw),
              win AS (SELECT c.cluster_rep, c.doc_id, q.score,
                      row_number() OVER (PARTITION BY c.cluster_rep
                                         ORDER BY q.score DESC, c.doc_id ASC) AS rn
                    FROM c JOIN q USING (doc_id)),
              nonpick AS (SELECT doc_id FROM win WHERE rn > 1),
              exd AS (SELECT d.doc_id FROM documents d
                      JOIN (SELECT text, min(doc_id) AS kid
                            FROM documents GROUP BY text) k
                        ON d.text = k.text AND d.doc_id <> k.kid),
              base AS (SELECT doc_id, source,
                         CASE WHEN length(trim(text)) = 0 THEN 0
                              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok
                       FROM documents),
              fl AS (SELECT b.source, b.n_tok,
                       b.doc_id IN (SELECT doc_id FROM exd) AS ex_f,
                       (b.doc_id IN (SELECT doc_id FROM nonpick))
                         AND NOT (b.doc_id IN (SELECT doc_id FROM exd)) AS nr_f
                     FROM base b)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN ex_f THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_removed,
                   CAST(sum(CASE WHEN nr_f THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_removed,
                   CAST(sum(CASE WHEN NOT ex_f AND NOT nr_f THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept,
                   CAST(sum(CASE WHEN NOT ex_f AND NOT nr_f THEN n_tok ELSE 0 END) * 1000000
                        // greatest(sum(n_tok), 1) AS BIGINT) AS kept_ppm
            FROM fl GROUP BY source ORDER BY source"""
      }),

    // x154 — stitch seam scrub: the x144 family's actionable member (the
    // x134 shape for continuation seams) — every doc with an incoming seam
    // drops its first k tokens (they duplicate the predecessor's tail), so
    // a chain reassembled head-first carries each seam's tokens exactly
    // once. One row per affected doc; hash-match includes the rebuilt
    // text.
    QueryDef("x154_stitch_scrub",
      (s, d) => graft.ext.Stitch.stitchScrub(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(stitchPairsOracle +
        """, sp AS (SELECT tk.doc_id AS prev_id, hk.doc_id AS next_id
                    FROM tk JOIN hk ON tk.h = hk.h AND tk.ov = hk.ov
                      AND tk.doc_id <> hk.doc_id),
            fl AS (SELECT next_id AS doc_id, CAST(count(*) AS BIGINT) AS n_prev
                   FROM sp GROUP BY 1)
           SELECT fl.doc_id, fl.n_prev,
                  CAST(len(t.toks) AS BIGINT) AS n_tok,
                  array_to_string(t.toks[4:len(t.toks)], ' ') AS scrub_text
           FROM fl JOIN t ON t.doc_id = fl.doc_id
           ORDER BY fl.doc_id""")),

    // x155 — epoch/repeat-factor schedule: x94's sqrt-smoothed mixture
    // weights turned into the per-source REPEAT TABLE a multi-epoch
    // training run consumes (the LLaMA-style data schedule): for a token
    // budget of 2× the corpus, each source's target token draw and its
    // repeat factor in exact centi-epochs (over-weighted small sources
    // repeat > 1×, big sources sample < 1×). Pure integer arithmetic over
    // the sources-sized x94 frame — DECIMAL(38,0) for the ppm multiply,
    // truncated div both engines.
    QueryDef("x155_epoch_schedule",
      (s, d) => {
        val perSource = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(sum(TextAnalysis.wsTokenCount(col("text"))).as("n_tok"))
          .withColumn("q", expr(
            "CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT)"))
        val denom = perSource.agg(sum(col("q")).as("qsum"),
          sum(col("n_tok")).as("total_tok"))
        perSource.crossJoin(broadcast(denom))
          .select(col("source"), col("n_tok"),
            expr("CAST(CAST(q AS DECIMAL(38,0)) * 1000000 DIV qsum AS BIGINT)")
              .as("weight_ppm"))
          .crossJoin(broadcast(denom.select(col("total_tok"))))
          .withColumn("target_tok", expr(
            "CAST(CAST(2 * total_tok AS DECIMAL(38,0)) * weight_ppm DIV 1000000 AS BIGINT)"))
          .withColumn("epochs_centi", expr(
            "target_tok * 100 div greatest(n_tok, 1L)"))
          .select(col("source"), col("n_tok"), col("weight_ppm"),
            col("target_tok"), col("epochs_centi"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source,
                     CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tok
                   FROM documents GROUP BY source),
                  qq AS (SELECT source, n_tok,
                           CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT) AS q
                         FROM t),
                  dn AS (SELECT sum(q) AS qsum,
                           CAST(sum(n_tok) AS BIGINT) AS total_tok FROM qq),
                  w AS (SELECT source, n_tok,
                          CAST(CAST(q AS HUGEINT) * 1000000 // qsum AS BIGINT) AS weight_ppm,
                          total_tok
                        FROM qq CROSS JOIN dn),
                  tg AS (SELECT source, n_tok, weight_ppm,
                           CAST(CAST(2 * total_tok AS HUGEINT) * weight_ppm // 1000000 AS BIGINT)
                             AS target_tok
                         FROM w)
              SELECT source, n_tok, weight_ppm, target_tok,
                     CAST(target_tok * 100 // greatest(n_tok, 1) AS BIGINT) AS epochs_centi
              FROM tg ORDER BY source""")),

    // x156 — epoch expansion: the x155 schedule MATERIALIZED into training
    // rows — every doc repeats floor(epochs/1) times plus one more for a
    // deterministic md5-selected fraction of its source (bucket(doc) <
    // epochs_centi % 100 of 100 buckets — the x21 quota idiom, so the
    // fractional epoch is a reproducible subset, not a random draw).
    // Output (doc_id, source, copy_no). Scale: per-source scalars
    // broadcast; the explode emits exactly the schedule's row count (≈
    // budget/avg-doc), no shuffle beyond the sources-sized join.
    QueryDef("x156_epoch_expand",
      (s, d) => {
        val sched = graft.SparkEntry.queries("x155_epoch_schedule")(s, d)
          .select(col("source"), col("epochs_centi"))
        Tables.documents(s, d).select(col("doc_id"), col("source"))
          .join(broadcast(sched), "source")
          .withColumn("bucket",
            pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 12),
              16, 10).cast("long"), lit(100L)))
          .withColumn("copies",
            expr("epochs_centi div 100 + IF(bucket < epochs_centi % 100, 1L, 0L)"))
          .filter(col("copies") > 0)
          .select(col("doc_id"), col("source"),
            explode(expr("sequence(1L, copies)")).as("copy_no"))
          .orderBy("doc_id", "copy_no")
      },
      Some("""WITH t AS (SELECT source,
                     CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tok
                   FROM documents GROUP BY source),
                  qq AS (SELECT source, n_tok,
                           CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT) AS q
                         FROM t),
                  dn AS (SELECT sum(q) AS qsum,
                           CAST(sum(n_tok) AS BIGINT) AS total_tok FROM qq),
                  w AS (SELECT source, n_tok,
                          CAST(CAST(q AS HUGEINT) * 1000000 // qsum AS BIGINT) AS weight_ppm,
                          total_tok
                        FROM qq CROSS JOIN dn),
                  tg AS (SELECT source,
                           CAST(CAST(2 * total_tok AS HUGEINT) * weight_ppm // 1000000 AS BIGINT)
                             AS target_tok, n_tok
                         FROM w),
                  sched AS (SELECT source,
                              CAST(target_tok * 100 // greatest(n_tok, 1) AS BIGINT)
                                AS epochs_centi
                            FROM tg),
                  docs AS (SELECT d.doc_id, d.source, sched.epochs_centi,
                             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12))::BIGINT % 100
                               AS bucket
                           FROM documents d JOIN sched USING (source)),
                  cp AS (SELECT doc_id, source,
                           epochs_centi // 100 +
                             (CASE WHEN bucket < epochs_centi % 100 THEN 1 ELSE 0 END)
                             AS copies
                         FROM docs)
              SELECT doc_id, source, CAST(u.c AS BIGINT) AS copy_no
              FROM cp, unnest(range(1, copies + 1)) AS u(c)
              WHERE copies > 0
              ORDER BY doc_id, copy_no""")),

    // x157 — BPE encode to token IDS: the tokenizer family's terminal step
    // (x116/x121 train the merges, x122 counts fertility — this emits the
    // actual (doc, pos, tok_id) stream a training shard materializes).
    // Vocab ids are deterministic: every merged symbol ranked by corpus
    // count desc, symbol asc (the vocab-sized x95 bounded window). The
    // merge application is the x122 map-side nested-replace projection (no
    // shuffle); the id join keys on the symbol. The catalog row encodes
    // the doc_id % 25 == 0 sample (the oracle replays the FULL train +
    // encode chain on it — the whole-loop hash-match discipline of x121).
    QueryDef("x157_bpe_encode",
      (s, d) => {
        val merges = bpeMergesShared(s, d)
        val symsOf = Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"),
            filter(split(graft.ext.Bpe.applyMerges(
              TextAnalysis.tokens(col("text")), merges), " "),
              x => x =!= "·§·").as("ss"))
        val vocab = symsOf.select(explode(col("ss")).as("sym"))
          .groupBy(col("sym")).agg(count(lit(1)).as("cnt"))
          .withColumn("tok_id", row_number().over(
            Window.orderBy(col("cnt").desc, col("sym"))).cast("long"))
          .select(col("sym"), col("tok_id"))
        symsOf.filter(col("doc_id") % 25 === 0)
          .select(col("doc_id"), posexplode(col("ss")).as(Seq("pos", "sym")))
          .join(vocab, "sym")
          .select(col("doc_id"), col("pos").cast("long").as("pos"),
            col("tok_id"))
          .orderBy("doc_id", "pos")
      },
      Some(s"""${bpeOracleCtes(4)},
              docsym AS (SELECT doc_id, array_to_string(list_transform(
                           string_split_regex(trim(text), '\\s+'),
                           t -> array_to_string(list_transform(range(0, length(t)),
                                  i -> '·' || substr(t, i + 1, 1) || '·'), ' ')), ' ·§· ') AS sym
                         FROM documents WHERE length(trim(text)) > 0),
              applied AS (SELECT doc_id,
                            replace(replace(replace(replace(sym,
                              coalesce((SELECT pair FROM m1), chr(1)),
                              coalesce((SELECT replace(pair, '· ·', '') FROM m1), '')),
                              coalesce((SELECT pair FROM m2), chr(1)),
                              coalesce((SELECT replace(pair, '· ·', '') FROM m2), '')),
                              coalesce((SELECT pair FROM m3), chr(1)),
                              coalesce((SELECT replace(pair, '· ·', '') FROM m3), '')),
                              coalesce((SELECT pair FROM m4), chr(1)),
                              coalesce((SELECT replace(pair, '· ·', '') FROM m4), '')) AS sym
                          FROM docsym),
              symlist AS (SELECT doc_id,
                            list_filter(string_split(sym, ' '), x -> x <> '·§·') AS ss
                          FROM applied),
              voc AS (SELECT sym, count(*) AS cnt
                      FROM (SELECT unnest(ss) AS sym FROM symlist) GROUP BY sym),
              vid AS (SELECT sym,
                        CAST(row_number() OVER (ORDER BY cnt DESC, sym) AS BIGINT) AS tok_id
                      FROM voc),
              enc AS (SELECT doc_id, i AS pos, ss[i + 1] AS sym
                      FROM symlist, unnest(range(0, len(ss))) AS u(i)
                      WHERE doc_id % 25 = 0)
              SELECT enc.doc_id, CAST(enc.pos AS BIGINT) AS pos, vid.tok_id
              FROM enc JOIN vid USING (sym) ORDER BY enc.doc_id, enc.pos""")),

    // x158 — retrieval quality metrics (the eval harness the similarity
    // family reports into): for each query vector (vec_id < 20), exact-
    // cosine-rank the corpus (self excluded), and score label agreement IR
    // metrics within the top-50 candidate pool — first same-label hit
    // rank, reciprocal rank (micro), precision@5 (ppm). Label = the
    // embeddings table's ground-truth class, so this measures what x55's
    // recall gate cannot: whether the METRIC SPACE ranks semantically-same
    // items first. Pool-bounded by construction (queries broadcast, rank
    // window per query, metrics on ≤ 50 rows/query) — the shape that
    // survives when the pool comes from IVF/SRP retrieval instead of the
    // exact scorer. Exact integer metrics → full hash-match.
    QueryDef("x158_retrieval_label_metrics",
      (s, d) => {
        import graft.ext.Similarity.{dot, withNorms}
        val emb = Tables.embeddings(s, d)
        val labels = emb.select(col("vec_id"), col("label"))
        val q = withNorms(emb.filter(col("vec_id") < 20))
          .join(labels, "vec_id")
          .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
            col("embedding").as("qe"), col("nrm").as("qnrm"))
        val pool = withNorms(emb).join(labels, "vec_id")
          .crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("qlabel"), col("vec_id"), col("label"),
            round(dot(col("embedding"), col("qe")) / (col("nrm") * col("qnrm")), 6)
              .as("cos"))
          .withColumn("r", row_number().over(
            Window.partitionBy(col("query_id"))
              .orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("r") <= 50)
        pool.groupBy(col("query_id"))
          .agg(min(when(col("label") === col("qlabel"), col("r")))
              .as("fh"),
            sum(when(col("r") <= 5 && col("label") === col("qlabel"), 1L)
              .otherwise(0L)).as("h5"))
          .select(col("query_id"),
            coalesce(col("fh").cast("long"), lit(0L)).as("first_hit"),
            expr("CAST(coalesce(1000000 div CAST(fh AS BIGINT), 0) AS BIGINT)")
              .as("rr_micro"),
            (col("h5") * lit(200000L)).as("p5_ppm"))
          .orderBy("query_id")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe,
                     label AS qlabel
                   FROM embeddings WHERE vec_id < 20),
                  sc AS (SELECT q.query_id, q.qlabel, e.vec_id, e.label,
                           round(list_cosine_similarity(e.embedding::DOUBLE[],
                             q.qe::DOUBLE[]), 6) AS cos
                         FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
                  rk AS (SELECT query_id, qlabel, vec_id, label,
                           row_number() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, vec_id) AS r
                         FROM sc),
                  pool AS (SELECT * FROM rk WHERE r <= 50),
                  m AS (SELECT query_id,
                          min(CASE WHEN label = qlabel THEN r END) AS fh,
                          CAST(sum(CASE WHEN r <= 5 AND label = qlabel
                            THEN 1 ELSE 0 END) AS BIGINT) AS h5
                        FROM pool GROUP BY query_id)
              SELECT query_id,
                     CAST(coalesce(fh, 0) AS BIGINT) AS first_hit,
                     CAST(coalesce(1000000 // fh, 0) AS BIGINT) AS rr_micro,
                     CAST(h5 * 200000 AS BIGINT) AS p5_ppm
              FROM m ORDER BY query_id""")),

    // x159 — PageRank over the exact kNN graph (graph centrality as a data
    // curation signal: high-rank vectors sit in dense, well-connected
    // semantic neighborhoods — the corpus's "representative" examples; low
    // ranks are outliers). Five damped power iterations (d = 0.85) in
    // EXACT integer micro-units via Graphs.pageRankMicro: each iteration
    // is one keyed join + hash aggregate over the 5-out-degree edge list
    // (no driver collect, no per-node loops) with the quantization order
    // fixed as r_j div outdeg → sum → ×850000 div 1e6, so every iteration
    // is bit-identical cross-engine (the oracle unrolls the same five).
    // Past 3 iterations each round localCheckpoints, so the plan does not
    // deepen with the iteration count (GraphsSpec pins constant depth);
    // the oracle row proves checkpointing is value-neutral. Dangling-node
    // mass is dropped (the standard simplification — both engines
    // identically). Output: the top-20 hub report.
    QueryDef("x159_knn_pagerank",
      (s, d) => {
        val edges = knnGraphShared(s, d)
          .select(col("vec_id").as("src"), col("nb").as("dst"))
        val nodes = Tables.embeddings(s, d).select(col("vec_id"))
        val pr = graft.ext.Graphs.pageRankMicro(edges, nodes, iters = 5)
        pr.orderBy(col("pr").desc, col("vec_id")).limit(20)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("pr").desc, col("vec_id"))))
          .select(col("rnk"), col("vec_id"), col("pr").as("pr_micro"))
          .orderBy("rnk")
      },
      Some {
        val iters = (1 to 5).map { i =>
          s"""c$i AS (SELECT e.dst AS vec_id, sum(r${i - 1}.pr // e.outdeg) AS inflow
                      FROM e JOIN r${i - 1} ON r${i - 1}.vec_id = e.src
                      GROUP BY e.dst),
              r$i AS (SELECT n.vec_id,
                        CAST(150000 + CAST(850000 AS HUGEINT) *
                          coalesce(c$i.inflow, 0) // 1000000 AS BIGINT) AS pr
                      FROM nodes n LEFT JOIN c$i USING (vec_id))"""
        }.mkString(",\n")
        s"""WITH p AS (SELECT a.vec_id AS va, b.vec_id AS nb,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6) AS cos
                 FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
               rr AS (SELECT va, nb,
                   row_number() OVER (PARTITION BY va ORDER BY cos DESC, nb) AS rnk
                 FROM p WHERE cos >= 0.2),
               ed AS (SELECT va AS src, nb AS dst FROM rr WHERE rnk <= 5),
               nodes AS (SELECT vec_id FROM embeddings),
               od AS (SELECT src, count(*) AS outdeg FROM ed GROUP BY src),
               e AS (SELECT ed.src, ed.dst, od.outdeg FROM ed JOIN od USING (src)),
               r0 AS (SELECT vec_id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
               $iters,
               top AS (SELECT vec_id, pr,
                         CAST(row_number() OVER (ORDER BY pr DESC, vec_id) AS INT) AS rnk
                       FROM r5)
            SELECT rnk, vec_id, pr AS pr_micro
            FROM top WHERE rnk <= 20 ORDER BY rnk"""
      }),

    // x160 — blocklist screening: the C4/RefinedWeb word-list rule with
    // configurable categories (the catalog row uses fixture-vocabulary
    // placeholder lists; production swaps in real lists without touching
    // the map-only plan). Word-boundary regexp counts per category + an
    // any-category flag — one projection, no shuffle.
    QueryDef("x160_blocklist_screen",
      (s, d) => graft.ext.TextAnalysis.blocklistScreen(
          Tables.documents(s, d),
          Seq("infra" -> Seq("stream", "vector", "graph"),
              "query" -> Seq("merge", "sort", "join")))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CAST(len(regexp_extract_all(lower(text),
                       '\b(stream|vector|graph)\b')) AS BIGINT) AS hits_infra,
                     CAST(len(regexp_extract_all(lower(text),
                       '\b(merge|sort|join)\b')) AS BIGINT) AS hits_query,
                     (len(regexp_extract_all(lower(text),
                        '\b(stream|vector|graph)\b')) > 0 OR
                      len(regexp_extract_all(lower(text),
                        '\b(merge|sort|join)\b')) > 0) AS flagged
              FROM documents ORDER BY doc_id""")),

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
        // rank + global count windows over ONE ROW PER COMPLETED USER (a
        // per-user aggregate, never the event stream); ties in `lat` make
        // the k-th VALUE tie-order-invariant, so the unqualified orderBy
        // is value-deterministic
        fun
          .withColumn("r", row_number().over(Window.orderBy(col("lat"))))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(lit(1))))
          .agg(count(lit(1)).as("n_completed"),
            min(col("lat")).as("min_ms"),
            min(when(col("r") === expr("(n + 1) div 2"), col("lat")))
              .as("p50_ms"),
            min(when(col("r") === expr("(9 * n + 9) div 10"), col("lat")))
              .as("p90_ms"),
            max(col("lat")).as("max_ms"),
            expr("CAST(sum(lat) div count(1) AS BIGINT)").as("mean_ms"))
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

    // x166 — pixel-level perceptual fingerprints: every doc rendered as a
    // REAL 9×8 grayscale PNG and pushed through the full pixel pipeline
    // (pngEncode → pure-JVM pngPixels decode → luma → 64-bit dHash),
    // reported as the hash's 8 row-bytes so the DuckDB oracle — which
    // recomputes the same dHash from char codes WITHOUT ever seeing a
    // PNG — hash-matches: the oracle-checked proof that pixel decode is
    // exact, not a byte-stream proxy. One map-side pass per doc.
    QueryDef("x166_pixel_dhash",
      (s, d) => pixelDHashShared(s, d)
        .filter(col("phash").isNotNull)
        .select(col("media_id").as("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 7), g -> shiftright(phash, 8 * g) & 255L)"))
            .as(Seq("row_no", "bits")))
        .select(col("doc_id"), col("row_no").cast("long").as("row_no"),
          col("bits"))
        .orderBy("doc_id", "row_no"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   g AS (SELECT doc_id, gy.range AS gy, gx.range AS gx,
                           ord(substr(text,
                             CAST(((gy.range * 9 + gx.range) % n) + 1 AS BIGINT),
                             1)) % 256 AS v
                         FROM d, range(0, 8) gy, range(0, 9) gx),
                   p AS (SELECT a.doc_id, a.gy, a.gx,
                           CASE WHEN b.v > a.v THEN 1 << a.gx ELSE 0 END AS bit
                         FROM g a JOIN g b ON a.doc_id = b.doc_id
                           AND a.gy = b.gy AND b.gx = a.gx + 1
                         WHERE a.gx < 8)
              SELECT doc_id, CAST(gy AS BIGINT) AS row_no,
                     CAST(sum(bit) AS BIGINT) AS bits
              FROM p GROUP BY 1, 2 ORDER BY doc_id, row_no""")),

    // x167 — pixel near-dup pairs: banded Hamming pairing over the x166
    // dHashes through the SAME 4×16-bit machinery as text SimHash (x111)
    // — complete for hamming ≤ 3 by pigeonhole, bucket-capped, one
    // bit_count(xor) per candidate. The oracle brute-forces hamming from
    // its independently-computed row-bytes, so the banded pair set is
    // EXACT-checked, not gated: re-encoded payloads pair only via pixels,
    // which the x31 compressed-byte fingerprints cannot do.
    QueryDef("x167_phash_hamming_pairs",
      (s, d) => Dedup.hammingNearDupPairsOf(
          pixelDHashShared(s, d).filter(col("phash").isNotNull),
          "phash", hMax = 3, idCol = "media_id")
        .orderBy("ia", "ib"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   g AS (SELECT doc_id, gy.range AS gy, gx.range AS gx,
                           ord(substr(text,
                             CAST(((gy.range * 9 + gx.range) % n) + 1 AS BIGINT),
                             1)) % 256 AS v
                         FROM d, range(0, 8) gy, range(0, 9) gx),
                   byts AS (SELECT a.doc_id, a.gy AS row_no,
                              CAST(sum(CASE WHEN b.v > a.v THEN 1 << a.gx
                                       ELSE 0 END) AS BIGINT) AS bits
                            FROM g a JOIN g b ON a.doc_id = b.doc_id
                              AND a.gy = b.gy AND b.gx = a.gx + 1
                            WHERE a.gx < 8 GROUP BY 1, 2),
                   h AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                           CAST(sum(bit_count(xor(a.bits, b.bits))) AS BIGINT)
                             AS ham
                         FROM byts a JOIN byts b
                           ON a.row_no = b.row_no AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
              SELECT ia, ib, ham FROM h WHERE ham <= 3 ORDER BY ia, ib""")),

    // x181 — video frame fingerprints: every doc rendered as a REAL
    // 2-frame uncompressed AVI and pushed through the full video pipeline
    // (aviEncode mux → pure-JVM aviFrames demux → per-frame luma →
    // 64-bit dHash), reported as each frame hash's 8 row-bytes so the
    // DuckDB oracle — which recomputes the same per-frame dHash from char
    // codes WITHOUT ever seeing an AVI — hash-matches: the oracle-checked
    // proof that container demux + frame raster decode are pixel-exact.
    // One map-side pass per doc; frames enumerate inside the partition.
    QueryDef("x181_video_frame_dhash",
      (s, d) => videoDHashShared(s, d)
        .select(col("media_id").as("doc_id"), col("frame_no"),
          posexplode(expr(
            "transform(sequence(0, 7), g -> shiftright(phash, 8 * g) & 255L)"))
            .as(Seq("row_no", "bits")))
        .select(col("doc_id"), col("frame_no"),
          col("row_no").cast("long").as("row_no"), col("bits"))
        .orderBy("doc_id", "frame_no", "row_no"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   g AS (SELECT doc_id, f.range AS f, gy.range AS gy,
                           gx.range AS gx,
                           ord(substr(text,
                             CAST(((f.range * 72 + gy.range * 9 + gx.range)
                                   % n) + 1 AS BIGINT),
                             1)) % 256 AS v
                         FROM d, range(0, 2) f, range(0, 8) gy, range(0, 9) gx),
                   p AS (SELECT a.doc_id, a.f, a.gy, a.gx,
                           CASE WHEN b.v > a.v THEN 1 << a.gx ELSE 0 END AS bit
                         FROM g a JOIN g b ON a.doc_id = b.doc_id
                           AND a.f = b.f AND a.gy = b.gy AND b.gx = a.gx + 1
                         WHERE a.gx < 8)
              SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
                     CAST(gy AS BIGINT) AS row_no,
                     CAST(sum(bit) AS BIGINT) AS bits
              FROM p GROUP BY 1, 2, 3 ORDER BY doc_id, frame_no, row_no""")),

    // x182 — video near-dup pairs on PIXELS: videos pair when the TOTAL
    // Hamming distance over their aligned frame dHashes is ≤ 3 (the x167
    // contract summed across frames). Mining rides the same 4×16-bit band
    // machinery: total ≤ 3 implies frame-0 hamming ≤ 3, so banding
    // frame 0 at hMax=3 is COMPLETE by pigeonhole; candidates then verify
    // the exact total with one bit_count per remaining frame. The oracle
    // brute-forces the total from its independently-computed row-bytes,
    // so the banded pair set is EXACT-checked — re-muxed payloads pair
    // only via pixels, which x31's compressed-byte blocks cannot do.
    QueryDef("x182_video_near_dup",
      (s, d) => {
        val vh = videoDHashShared(s, d)
        val f0 = vh.filter(col("frame_no") === 0L)
          .select(col("media_id"), col("phash"))
        val f1 = vh.filter(col("frame_no") === 1L)
          .select(col("media_id"), col("phash").as("h1"))
        Dedup.hammingNearDupPairsOf(f0, "phash", hMax = 3, idCol = "media_id")
          .join(f1.select(col("media_id").as("ia"), col("h1").as("h1a")), "ia")
          .join(f1.select(col("media_id").as("ib"), col("h1").as("h1b")), "ib")
          .select(col("ia"), col("ib"),
            (col("ham") + expr("CAST(bit_count(h1a ^ h1b) AS BIGINT)"))
              .as("ham"))
          .filter(col("ham") <= 3)
          .orderBy("ia", "ib")
      },
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   g AS (SELECT doc_id, f.range AS f, gy.range AS gy,
                           gx.range AS gx,
                           ord(substr(text,
                             CAST(((f.range * 72 + gy.range * 9 + gx.range)
                                   % n) + 1 AS BIGINT),
                             1)) % 256 AS v
                         FROM d, range(0, 2) f, range(0, 8) gy, range(0, 9) gx),
                   byts AS (SELECT a.doc_id, a.f, a.gy,
                              CAST(sum(CASE WHEN b.v > a.v THEN 1 << a.gx
                                       ELSE 0 END) AS BIGINT) AS bits
                            FROM g a JOIN g b ON a.doc_id = b.doc_id
                              AND a.f = b.f AND a.gy = b.gy
                              AND b.gx = a.gx + 1
                            WHERE a.gx < 8 GROUP BY 1, 2, 3),
                   h AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                           CAST(sum(bit_count(xor(a.bits, b.bits))) AS BIGINT)
                             AS ham
                         FROM byts a JOIN byts b
                           ON a.f = b.f AND a.gy = b.gy
                             AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
              SELECT ia, ib, ham FROM h WHERE ham <= 3 ORDER BY ia, ib""")),

    // x168 — matryoshka (MRL) truncation retrieval: query vec 0's exact
    // cosine top-10 computed at each embedding PREFIX length (8/16/32/64
    // dims) — the evaluation a pipeline runs before committing to
    // truncated-embedding indexes (half the dims = half of every
    // downstream shuffle/index/distance — IF the ranking survives).
    // Broadcast query row per prefix, TakeOrderedAndProject top-10, rank
    // window over the 40 survivor rows only.
    QueryDef("x168_matryoshka_topk",
      (s, d) => matryoshkaShared(s, d).orderBy("m", "rnk"),
      Some("""WITH m AS (SELECT unnest([8, 16, 32, 64]) AS m),
                   q AS (SELECT m.m, embedding[1:m.m]::DOUBLE[] AS qe
                         FROM embeddings, m WHERE vec_id = 0),
                   sc AS (SELECT q.m, e.vec_id,
                            round(list_cosine_similarity(
                              e.embedding[1:q.m]::DOUBLE[], q.qe), 6) AS cos
                          FROM embeddings e, q WHERE e.vec_id <> 0),
                   rk AS (SELECT m, vec_id, cos,
                            CAST(row_number() OVER (PARTITION BY m
                              ORDER BY cos DESC, vec_id) AS INT) AS rnk
                          FROM sc)
              SELECT CAST(m AS BIGINT) AS m, vec_id, cos, rnk
              FROM rk WHERE rnk <= 10 ORDER BY m, rnk""")),

    // x168b — truncation-safety verdict: overlap@10 of each prefix's
    // top-10 with the full-dim top-10, the scalar that says which prefix
    // is safe to index at. Tiny self-join over the 40-row shared frame.
    QueryDef("x168b_matryoshka_overlap",
      (s, d) => {
        val f = matryoshkaShared(s, d)
        f.filter(col("m") =!= 64L)
          .join(f.filter(col("m") === 64L).select(col("vec_id")),
            Seq("vec_id"), "left_semi")
          .groupBy(col("m")).agg(count(lit(1)).as("overlap_at_10"))
          .orderBy("m")
      },
      Some("""WITH m AS (SELECT unnest([8, 16, 32, 64]) AS m),
                   q AS (SELECT m.m, embedding[1:m.m]::DOUBLE[] AS qe
                         FROM embeddings, m WHERE vec_id = 0),
                   sc AS (SELECT q.m, e.vec_id,
                            round(list_cosine_similarity(
                              e.embedding[1:q.m]::DOUBLE[], q.qe), 6) AS cos
                          FROM embeddings e, q WHERE e.vec_id <> 0),
                   rk AS (SELECT m, vec_id,
                            row_number() OVER (PARTITION BY m
                              ORDER BY cos DESC, vec_id) AS rnk
                          FROM sc),
                   top AS (SELECT m, vec_id FROM rk WHERE rnk <= 10)
              SELECT CAST(a.m AS BIGINT) AS m, count(*) AS overlap_at_10
              FROM top a JOIN top f ON f.m = 64 AND f.vec_id = a.vec_id
              WHERE a.m <> 64 GROUP BY 1 ORDER BY m""")),

    // x169 — length-bucketed batching report: docs assigned to
    // power-of-two token buckets (the dynamic-batching layout that
    // replaces one global pad-to-max), with the padding overhead each
    // bucket pays — the loader diagnostic that picks bucket boundaries.
    // Integer CASE ladder (no float log2 — engines disagree at exact
    // powers), one hash aggregate over ≤ 10 buckets.
    QueryDef("x169_length_buckets",
      (s, d) => {
        val n = TextAnalysis.wsTokenCount(col("text")).cast("long")
        Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"), n.as("n"))
          .withColumn("bucket",
            when(col("n") <= 16, 16L).when(col("n") <= 32, 32L)
              .when(col("n") <= 64, 64L).when(col("n") <= 128, 128L)
              .when(col("n") <= 256, 256L).when(col("n") <= 512, 512L)
              .when(col("n") <= 1024, 1024L).when(col("n") <= 2048, 2048L)
              .when(col("n") <= 4096, 4096L).otherwise(8192L))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
          .select(col("bucket"), col("n_docs"), col("n_tokens"),
            (col("bucket") * col("n_docs") - col("n_tokens")).as("n_padding"),
            expr("CAST(n_tokens * 1000000 div (bucket * n_docs) AS BIGINT)")
              .as("fill_ppm"))
          .orderBy("bucket")
      },
      Some("""WITH t AS (SELECT doc_id,
                     CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
                   FROM documents WHERE length(trim(text)) > 0),
                   b AS (SELECT doc_id, n,
                           CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
                                WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                                WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                                WHEN n <= 1024 THEN 1024 WHEN n <= 2048 THEN 2048
                                WHEN n <= 4096 THEN 4096 ELSE 8192 END AS bucket
                         FROM t)
              SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
                     CAST(sum(n) AS BIGINT) AS n_tokens,
                     CAST(bucket * count(*) - sum(n) AS BIGINT) AS n_padding,
                     CAST(sum(n) * 1000000 // (bucket * count(*)) AS BIGINT)
                       AS fill_ppm
              FROM b GROUP BY bucket ORDER BY bucket""")),

    // x170 — T5-style span-corruption plan: a DETERMINISTIC noise mask
    // (position p starts a 3-token masked span iff its seeded md5 bucket
    // hits — the DSIR md5-portable idiom, ~5% starts → ~15% masked), with
    // the per-doc corruption accounting a denoising-objective loader
    // needs: masked tokens, contiguous spans (= sentinels inserted), and
    // the resulting input length. Keyed lag windows per doc, never global.
    QueryDef("x170_span_corruption",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
        Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"),
            TextAnalysis.wsTokenCount(col("text")).cast("long").as("n"))
          .select(col("doc_id"), col("n"),
            posexplode(expr("sequence(1, n)")).as(Seq("i", "p")))
          .withColumn("st", (expr(
            """CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':',
               CAST(p AS STRING))), 1, 6), 16, 10) AS BIGINT)""") % 20 === 0)
            .cast("int"))
          .withColumn("mask", greatest(col("st"),
            coalesce(lag(col("st"), 1).over(w), lit(0)),
            coalesce(lag(col("st"), 2).over(w), lit(0))))
          .withColumn("span_start",
            (col("mask") === 1 &&
              coalesce(lag(col("mask"), 1).over(w), lit(0)) === 0).cast("int"))
          .groupBy(col("doc_id"))
          .agg(max(col("n")).as("n_tokens"),
            sum(col("mask")).cast("long").as("n_masked"),
            sum(col("span_start")).cast("long").as("n_spans"))
          .select(col("doc_id"), col("n_tokens"), col("n_masked"),
            col("n_spans"),
            (col("n_tokens") - col("n_masked") + col("n_spans"))
              .as("input_len"),
            expr("CAST(n_masked * 1000000 div n_tokens AS BIGINT)")
              .as("mask_ppm"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
                   FROM documents WHERE length(trim(text)) > 0),
                   pos AS (SELECT doc_id, n, unnest(range(0, n)) + 1 AS p
                           FROM t),
                   st AS (SELECT doc_id, n, p,
                            CASE WHEN ('0x' || substr(md5(doc_id || ':' || p), 1, 6))::BIGINT
                                 % 20 = 0 THEN 1 ELSE 0 END AS s
                          FROM pos),
                   mk AS (SELECT doc_id, n, p, s,
                            greatest(s,
                              coalesce(lag(s, 1) OVER dw, 0),
                              coalesce(lag(s, 2) OVER dw, 0)) AS mask
                          FROM st
                          WINDOW dw AS (PARTITION BY doc_id ORDER BY p)),
                   sp AS (SELECT doc_id, n, p, mask,
                            CASE WHEN mask = 1 AND
                              coalesce(lag(mask, 1) OVER dw, 0) = 0
                              THEN 1 ELSE 0 END AS span_start
                          FROM mk
                          WINDOW dw AS (PARTITION BY doc_id ORDER BY p))
              SELECT doc_id, max(n) AS n_tokens,
                     CAST(sum(mask) AS BIGINT) AS n_masked,
                     CAST(sum(span_start) AS BIGINT) AS n_spans,
                     CAST(max(n) - sum(mask) + sum(span_start) AS BIGINT)
                       AS input_len,
                     CAST(sum(mask) * 1000000 // max(n) AS BIGINT) AS mask_ppm
              FROM sp GROUP BY doc_id ORDER BY doc_id""")),

    // x171 — preference-pair construction (the DPO/RLHF data-prep shape
    // on this corpus): within each source, docs ranked by integer quality
    // score, best paired against worst (rank i vs rank n+1-i) with the
    // exact score margin — deterministic chosen/rejected pairs with no
    // random draw. Keyed rank windows per source + one keyed self-join.
    QueryDef("x171_preference_pairs",
      (s, d) => {
        val ws = Window.partitionBy(col("source"))
          .orderBy(col("q").desc, col("doc_id"))
        val wn = Window.partitionBy(col("source"))
        val ranked = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            TextAnalysis.qualityScoreInt(col("text")).as("q"))
          .withColumn("rnk", row_number().over(ws).cast("long"))
          .withColumn("n", count(lit(1)).over(wn))
        ranked.as("a")
          .join(ranked.as("b"),
            col("a.source") === col("b.source") &&
              col("b.rnk") === col("a.n") + 1 - col("a.rnk") &&
              col("a.rnk") < col("b.rnk"))
          .select(col("a.source").as("source"), col("a.rnk").as("pair_no"),
            col("a.doc_id").as("chosen_id"), col("b.doc_id").as("rejected_id"),
            (col("a.q") - col("b.q")).as("margin"))
          .orderBy("source", "pair_no")
      },
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH tq AS (SELECT source, doc_id, CAST(floor((
                  least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                + (1.0 - least(CAST(p AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                ) * 10000.0 + 0.5) AS BIGINT) AS q
              FROM (SELECT source, doc_id,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+')) END AS w,
                      length(text) AS ch,
                      len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS p,
                      len(regexp_extract_all(text, '[A-Z]')) AS u,
                      len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                    FROM documents) t),
              rk AS (SELECT source, doc_id, q,
                       CAST(row_number() OVER (PARTITION BY source
                         ORDER BY q DESC, doc_id) AS BIGINT) AS rnk,
                       count(*) OVER (PARTITION BY source) AS n
                     FROM tq)
            SELECT a.source AS source, a.rnk AS pair_no, a.doc_id AS chosen_id,
                   b.doc_id AS rejected_id,
                   CAST(a.q - b.q AS BIGINT) AS margin
            FROM rk a JOIN rk b ON a.source = b.source
              AND b.rnk = a.n + 1 - a.rnk AND a.rnk < b.rnk
            ORDER BY a.source, pair_no"""
      }),

    // x172 — audio envelope fingerprints: the x166 discipline on the
    // audio axis — every doc rendered as a REAL PCM16 mono WAV (130
    // samples from char codes), parsed back through the container walk
    // and fingerprinted from the energy envelope (65 windows of exactly
    // 2 samples, sign-of-adjacent-diff bits). Reported as row-bytes; the
    // oracle recomputes from char codes without ever seeing a WAV, so a
    // hash-match proves the container parse is sample-exact.
    QueryDef("x172_audio_fingerprint",
      (s, d) => audioFpShared(s, d)
        .filter(col("afp").isNotNull)
        .select(col("media_id").as("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 7), g -> shiftright(afp, 8 * g) & 255L)"))
            .as(Seq("row_no", "bits")))
        .select(col("doc_id"), col("row_no").cast("long").as("row_no"),
          col("bits"))
        .orderBy("doc_id", "row_no"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   sm AS (SELECT doc_id, i.range AS i,
                            abs((ord(substr(text,
                              CAST((i.range % n) + 1 AS BIGINT), 1)) % 256
                              - 128) * 256) AS a
                          FROM d, range(0, 130) i),
                   env AS (SELECT doc_id, i // 2 AS w,
                             CAST(sum(a) AS BIGINT) AS e
                           FROM sm GROUP BY 1, 2),
                   p AS (SELECT a.doc_id, a.w,
                           CASE WHEN c.e > a.e THEN 1 << CAST(a.w % 8 AS INT)
                                ELSE 0 END AS bit
                         FROM env a JOIN env c
                           ON a.doc_id = c.doc_id AND c.w = a.w + 1
                         WHERE a.w < 64)
              SELECT doc_id, CAST(w // 8 AS BIGINT) AS row_no,
                     CAST(sum(bit) AS BIGINT) AS bits
              FROM p GROUP BY 1, 2 ORDER BY doc_id, row_no""")),

    // x173 — audio near-dup pairs: banded Hamming over the x172
    // fingerprints through the SAME generalized x111 machinery as text
    // SimHash and pixel dHash — one pair miner, three modalities. Exact
    // oracle (brute-force Hamming from the independent row-bytes).
    QueryDef("x173_audio_hamming_pairs",
      (s, d) => Dedup.hammingNearDupPairsOf(
          audioFpShared(s, d).filter(col("afp").isNotNull),
          "afp", hMax = 3, idCol = "media_id")
        .orderBy("ia", "ib"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   sm AS (SELECT doc_id, i.range AS i,
                            abs((ord(substr(text,
                              CAST((i.range % n) + 1 AS BIGINT), 1)) % 256
                              - 128) * 256) AS a
                          FROM d, range(0, 130) i),
                   env AS (SELECT doc_id, i // 2 AS w,
                             CAST(sum(a) AS BIGINT) AS e
                           FROM sm GROUP BY 1, 2),
                   byts AS (SELECT a.doc_id, CAST(a.w // 8 AS BIGINT) AS row_no,
                              CAST(sum(CASE WHEN c.e > a.e
                                THEN 1 << CAST(a.w % 8 AS INT)
                                ELSE 0 END) AS BIGINT) AS bits
                            FROM env a JOIN env c
                              ON a.doc_id = c.doc_id AND c.w = a.w + 1
                            WHERE a.w < 64 GROUP BY 1, 2),
                   h AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                           CAST(sum(bit_count(xor(a.bits, b.bits))) AS BIGINT)
                             AS ham
                         FROM byts a JOIN byts b
                           ON a.row_no = b.row_no AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
              SELECT ia, ib, ham FROM h WHERE ham <= 3 ORDER BY ia, ib""")),

    // x177 — pixel-dedup threshold yield curve: cumulative pair counts at
    // Hamming radius 0..3 over the x166 dHashes — the x83 threshold-tuning
    // read on the perceptual axis (how much more a looser radius removes),
    // derived from ONE banded mining pass, no re-mining per radius.
    QueryDef("x177_phash_threshold_curve",
      (s, d) => Dedup.hammingNearDupPairsOf(
          pixelDHashShared(s, d), "phash", hMax = 3, idCol = "media_id")
        .select(explode(expr("sequence(ham, 3)")).as("h_max"))
        .groupBy(col("h_max")).agg(count(lit(1)).as("n_pairs"))
        .select(col("h_max").cast("long").as("h_max"), col("n_pairs"))
        .orderBy("h_max"),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) > 0),
                   g AS (SELECT doc_id, gy.range AS gy, gx.range AS gx,
                           ord(substr(text,
                             CAST(((gy.range * 9 + gx.range) % n) + 1 AS BIGINT),
                             1)) % 256 AS v
                         FROM d, range(0, 8) gy, range(0, 9) gx),
                   byts AS (SELECT a.doc_id, a.gy AS row_no,
                              CAST(sum(CASE WHEN b.v > a.v THEN 1 << a.gx
                                       ELSE 0 END) AS BIGINT) AS bits
                            FROM g a JOIN g b ON a.doc_id = b.doc_id
                              AND a.gy = b.gy AND b.gx = a.gx + 1
                            WHERE a.gx < 8 GROUP BY 1, 2),
                   h AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                           CAST(sum(bit_count(xor(a.bits, b.bits))) AS BIGINT)
                             AS ham
                         FROM byts a JOIN byts b
                           ON a.row_no = b.row_no AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
              SELECT CAST(t.range AS BIGINT) AS h_max, count(*) AS n_pairs
              FROM h, range(0, 4) t WHERE h.ham <= t.range
              GROUP BY 1 ORDER BY h_max""")),

    // x178 — related-document packing (the in-context-pretraining layout):
    // docs of each multi-member near-dup cluster packed CLUSTER-
    // CONTIGUOUSLY into that cluster's own sequence space, so a training
    // context window sees related documents together — the ICLM idea
    // expressed with EVERY window partitioned by cluster_rep (state
    // bounded by the largest cluster, never corpus-wide; singletons keep
    // the standard x135 global layout and are out of scope here). One
    // keyed join to the shared cluster frame + one keyed cumsum.
    QueryDef("x178_related_packing",
      (s, d) => relatedPlanShared(s, d)
        .select(col("doc_id"), col("cluster_rep"), col("n_tokens"),
          col("cum_before"), col("start_seq").as("seq_no"), col("start_off"))
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                pairs AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                eadj AS (SELECT ia AS a, ib AS b FROM pairs
                         UNION SELECT ib, ia FROM pairs),
                r AS (SELECT a AS id, a AS reach FROM eadj
                      UNION
                      SELECT r.id, eadj.b FROM r JOIN eadj ON eadj.a = r.reach),
                cl AS (SELECT id AS doc_id, min(reach) AS cluster_rep FROM r GROUP BY id),
                m AS (SELECT cl.doc_id, cl.cluster_rep,
                        CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT)
                          AS n_tokens
                      FROM cl JOIN documents d ON d.doc_id = cl.doc_id
                      WHERE length(trim(d.text)) > 0),
                c AS (SELECT doc_id, cluster_rep, n_tokens,
                        CAST(coalesce(sum(n_tokens) OVER (
                          PARTITION BY cluster_rep ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS BIGINT) AS cb
                      FROM m)
              SELECT doc_id, cluster_rep, n_tokens, cb AS cum_before,
                     CAST(cb // 128 AS BIGINT) AS seq_no,
                     CAST(cb % 128 AS BIGINT) AS start_off
              FROM c ORDER BY doc_id""")),

    // x179 — related-packing segments: the x178 layout exploded into the
    // shard-writer's input (the x136 shape in per-cluster sequence
    // spaces): one row per (cluster, sequence, doc-slice), slices tiling
    // both each sequence's [0, 128) and each document's token interval.
    // Same bounded explode (n_segs ≤ n_tokens/128 + 1 per doc) and one
    // keyed join back for the cluster key — no new shuffle class.
    QueryDef("x179_related_segments",
      (s, d) => {
        val plan = relatedPlanShared(s, d)
        Pack.packSegments(plan, capacity = 128L)
          .join(plan.select(col("doc_id"), col("cluster_rep")), "doc_id")
          .select(col("cluster_rep"), col("seq_id").as("seq_no"),
            col("doc_id"), col("seq_off"), col("doc_off"), col("seg_len"))
          .orderBy("cluster_rep", "seq_no", "seq_off", "doc_id")
      },
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                pairs AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                eadj AS (SELECT ia AS a, ib AS b FROM pairs
                         UNION SELECT ib, ia FROM pairs),
                r AS (SELECT a AS id, a AS reach FROM eadj
                      UNION
                      SELECT r.id, eadj.b FROM r JOIN eadj ON eadj.a = r.reach),
                cl AS (SELECT id AS doc_id, min(reach) AS cluster_rep FROM r GROUP BY id),
                m AS (SELECT cl.doc_id, cl.cluster_rep,
                        CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT) AS n
                      FROM cl JOIN documents d ON d.doc_id = cl.doc_id
                      WHERE length(trim(d.text)) > 0),
                c AS (SELECT doc_id, cluster_rep, n,
                        CAST(coalesce(sum(n) OVER (
                          PARTITION BY cluster_rep ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS BIGINT) AS cb
                      FROM m),
                seg AS (SELECT doc_id, cluster_rep, n, cb, cb // 128 AS ss,
                          cb % 128 AS so, u.s AS seq_no
                        FROM c, unnest(range(cb // 128,
                                             (cb + n - 1) // 128 + 1)) AS u(s))
              SELECT cluster_rep, CAST(seq_no AS BIGINT) AS seq_no, doc_id,
                     CAST(CASE WHEN seq_no = ss THEN so ELSE 0 END AS BIGINT)
                       AS seq_off,
                     CAST(CASE WHEN seq_no = ss THEN 0
                               ELSE seq_no * 128 - cb END AS BIGINT) AS doc_off,
                     CAST(least(cb + n, (seq_no + 1) * 128)
                          - greatest(cb, seq_no * 128) AS BIGINT) AS seg_len
              FROM seg ORDER BY cluster_rep, seq_no, seq_off, doc_id""")),

    // x180 — related-packing rehydration: the x179 segments materialized
    // into training rows per (cluster, sequence) — the x142 shard-writer
    // step in per-cluster sequence spaces, completing the related family's
    // plan → segments → text chain. Slice join co-partitions on doc_id,
    // reassembly groups on the (cluster, seq) key with per-group state
    // bounded by the 128-token capacity; hash-match includes the rebuilt
    // text.
    QueryDef("x180_related_rehydrate",
      (s, d) => {
        val plan = relatedPlanShared(s, d)
        Pack.packSegments(plan, capacity = 128L)
          .join(plan.select(col("doc_id"), col("cluster_rep")), "doc_id")
          .join(Tables.documents(s, d).select(col("doc_id"),
            TextAnalysis.tokens(col("text")).as("toks")), Seq("doc_id"))
          .select(col("cluster_rep"), col("seq_id").as("seq_no"),
            col("seq_off"),
            expr("""array_join(slice(toks, CAST(doc_off + 1 AS INT),
                                     CAST(seg_len AS INT)), ' ')""").as("seg"))
          .groupBy(col("cluster_rep"), col("seq_no"))
          .agg(count(lit(1)).as("n_slices"),
            collect_list(struct(col("seq_off"), col("seg"))).as("parts"))
          .select(col("cluster_rep"), col("seq_no"), col("n_slices"),
            expr("array_join(transform(array_sort(parts), p -> p.seg), ' ')")
              .as("seq_text"))
          .orderBy("cluster_rep", "seq_no")
      },
      Some("""WITH RECURSIVE
                t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
                sh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                       FROM t WHERE len(toks) >= 3),
                z AS (SELECT doc_id, len(s) AS n FROM sh),
                ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
                p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
                pairs AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                eadj AS (SELECT ia AS a, ib AS b FROM pairs
                         UNION SELECT ib, ia FROM pairs),
                r AS (SELECT a AS id, a AS reach FROM eadj
                      UNION
                      SELECT r.id, eadj.b FROM r JOIN eadj ON eadj.a = r.reach),
                cl AS (SELECT id AS doc_id, min(reach) AS cluster_rep FROM r GROUP BY id),
                m AS (SELECT cl.doc_id, cl.cluster_rep,
                        CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT) AS n
                      FROM cl JOIN documents d ON d.doc_id = cl.doc_id
                      WHERE length(trim(d.text)) > 0),
                c AS (SELECT doc_id, cluster_rep, n,
                        CAST(coalesce(sum(n) OVER (
                          PARTITION BY cluster_rep ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS BIGINT) AS cb
                      FROM m),
                seg AS (SELECT doc_id, cluster_rep, n, cb, cb // 128 AS ss,
                          cb % 128 AS so, u.s AS seq_no
                        FROM c, unnest(range(cb // 128,
                                             (cb + n - 1) // 128 + 1)) AS u(s)),
                sl AS (SELECT seg.cluster_rep, seg.seq_no,
                         CASE WHEN seq_no = ss THEN so ELSE 0 END AS seq_off,
                         CASE WHEN seq_no = ss THEN 0
                              ELSE seq_no * 128 - cb END AS doc_off,
                         least(cb + seg.n, (seq_no + 1) * 128)
                           - greatest(cb, seq_no * 128) AS seg_len,
                         t.toks
                       FROM seg JOIN t USING (doc_id))
              SELECT cluster_rep, CAST(seq_no AS BIGINT) AS seq_no,
                     CAST(count(*) AS BIGINT) AS n_slices,
                     string_agg(array_to_string(
                       toks[(doc_off + 1):(doc_off + seg_len)], ' '),
                       ' ' ORDER BY seq_off) AS seq_text
              FROM sl GROUP BY 1, 2 ORDER BY cluster_rep, seq_no""")),

    // x174 — packing attention accounting: what fraction of causal
    // attention pairs inside the x135 packed sequences stay WITHIN one
    // document — the diagnostic behind the "attention-mask vs plain
    // concat" packing decision (a low within-doc fraction means plain
    // concatenation trains mostly on cross-document noise). Two keyed
    // aggregates over the shared segments frame; exact integer pair
    // arithmetic.
    QueryDef("x174_pack_attention",
      (s, d) => Pack.packSegments(packPlanShared(s, d), capacity = 128L)
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_slices"),
          sum(col("seg_len")).as("t"),
          sum(expr("seg_len * (seg_len + 1) div 2")).as("within"))
        .agg(count(lit(1)).as("n_seqs"),
          sum(col("n_slices")).as("n_slices"),
          sum(col("within")).as("within_pairs"),
          sum(expr("t * (t + 1) div 2")).as("total_pairs"))
        .select(col("n_seqs"), col("n_slices"),
          expr("CAST(n_slices * 1000000 div n_seqs AS BIGINT)")
            .as("slices_per_seq_ppm"),
          col("within_pairs"), col("total_pairs"),
          expr("CAST(within_pairs * 1000000 div total_pairs AS BIGINT)")
            .as("within_doc_ppm")),
      Some("""WITH t AS (SELECT doc_id,
                     len(string_split_regex(trim(text), '\s+')) AS n,
                     md5(doc_id || ':42') AS okey
                   FROM documents WHERE length(trim(text)) > 0),
                  c AS (SELECT doc_id, n,
                          CAST(coalesce(sum(n) OVER (ORDER BY okey, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS cb
                        FROM t),
                  seg AS (SELECT u.s AS seq_id,
                            least(cb + n, (u.s + 1) * 128)
                              - greatest(cb, u.s * 128) AS seg_len
                          FROM c, unnest(range(cb // 128,
                                               (cb + n - 1) // 128 + 1))
                            AS u(s)),
                  per AS (SELECT seq_id, count(*) AS n_slices,
                            sum(seg_len) AS t,
                            sum(seg_len * (seg_len + 1) // 2) AS within
                          FROM seg GROUP BY 1)
              SELECT CAST(count(*) AS BIGINT) AS n_seqs,
                     CAST(sum(n_slices) AS BIGINT) AS n_slices,
                     CAST(sum(n_slices) * 1000000 // count(*) AS BIGINT)
                       AS slices_per_seq_ppm,
                     CAST(sum(within) AS BIGINT) AS within_pairs,
                     CAST(sum(t * (t + 1) // 2) AS BIGINT) AS total_pairs,
                     CAST(sum(within) * 1000000 // sum(t * (t + 1) // 2)
                       AS BIGINT) AS within_doc_ppm
              FROM per""")),

    // x175 — quality × length joint histogram: the 2-D curation heatmap
    // (x169's length buckets × 5 integer quality bands) read before
    // setting joint thresholds — short-and-high-quality vs
    // long-and-low-quality populations are invisible to the two marginal
    // histograms. One hash aggregate over ≤ 50 cells.
    QueryDef("x175_quality_length_grid",
      (s, d) => {
        val n = TextAnalysis.wsTokenCount(col("text")).cast("long")
        Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .select(n.as("n"), TextAnalysis.qualityScoreInt(col("text")).as("q"))
          .withColumn("len_bucket",
            when(col("n") <= 16, 16L).when(col("n") <= 32, 32L)
              .when(col("n") <= 64, 64L).when(col("n") <= 128, 128L)
              .when(col("n") <= 256, 256L).when(col("n") <= 512, 512L)
              .otherwise(1024L))
          .withColumn("q_band", expr("q div 2000"))
          .groupBy(col("len_bucket"), col("q_band"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
          .orderBy("len_bucket", "q_band")
      },
      Some {
        val stopPat = TextAnalysis.langProfiles.flatMap(_._2).mkString("|")
        s"""WITH tq AS (SELECT CAST(w AS BIGINT) AS n, CAST(floor((
                  least(CAST(w AS DOUBLE) / 100.0, 1.0) * 0.4
                + least(CAST(st AS DOUBLE) / greatest(CAST(w AS DOUBLE), 1.0), 1.0) * 0.3
                + (1.0 - least(CAST(p AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.2
                + (1.0 - least(CAST(u AS DOUBLE) / greatest(CAST(ch AS DOUBLE), 1.0), 1.0)) * 0.1
                ) * 10000.0 + 0.5) AS BIGINT) AS q
              FROM (SELECT len(string_split_regex(trim(text), '\\s+')) AS w,
                      length(text) AS ch,
                      len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS p,
                      len(regexp_extract_all(text, '[A-Z]')) AS u,
                      len(regexp_extract_all(lower(text), '\\b($stopPat)\\b')) AS st
                    FROM documents WHERE length(trim(text)) > 0) t),
              b AS (SELECT CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
                           WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                           WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                           ELSE 1024 END AS len_bucket,
                         q // 2000 AS q_band, n
                    FROM tq)
            SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
                   CAST(q_band AS BIGINT) AS q_band,
                   count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
            FROM b GROUP BY 1, 2 ORDER BY len_bucket, q_band"""
      }),

    // x176 — near-dup degree distribution: how many docs participate in
    // 1, 2, … near-dup pairs (the x07 pair set's degree histogram) — the
    // shape that distinguishes isolated re-posts (degree 1 spikes) from
    // template families (heavy tail). Two keyed aggregates over the
    // shared pair frame.
    QueryDef("x176_dup_degree_histogram",
      (s, d) => jaccardPairsShared(s, d)
        .select(explode(array(col("ia"), col("ib"))).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
        .groupBy(col("deg")).agg(count(lit(1)).as("n_docs"))
        .orderBy("deg"),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                         FROM documents),
                   s AS (SELECT doc_id,
                           list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
                         FROM t WHERE len(toks) >= 3),
                   z AS (SELECT doc_id, len(sh) AS n FROM s),
                   e AS (SELECT doc_id, unnest(sh) AS g FROM s),
                   p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                         FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
                         GROUP BY 1, 2),
                   pr AS (SELECT ia, ib
                          FROM p JOIN z za ON za.doc_id = p.ia
                                 JOIN z zb ON zb.doc_id = p.ib
                          WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.6),
                   d AS (SELECT ia AS doc_id FROM pr
                         UNION ALL SELECT ib FROM pr),
                   dg AS (SELECT doc_id, count(*) AS deg FROM d GROUP BY 1)
              SELECT CAST(deg AS BIGINT) AS deg, count(*) AS n_docs
              FROM dg GROUP BY deg ORDER BY deg"""))
  )
}
