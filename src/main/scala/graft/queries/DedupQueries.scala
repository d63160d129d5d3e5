package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Curation, Dedup, Export, Ivf, Multimodal, Pack, Retrieval, Similarity, TextAnalysis}

/** Deduplication & decontamination catalog entries: exact/n-gram-Jaccard/MinHash-LSH/SimHash/containment near-dup mining, clusters, scrubbing, stitching, contamination screens.
  *
  * Split from the original monolithic ExtQueries catalog — entries
  * verbatim; shared frames and helpers live in [[ExtShared]]. */
object DedupQueries {
  import ExtShared._

  val defs: Seq[QueryDef] = Seq(

    // x01 — exact dedup: one surviving id per distinct content.
    QueryDef("x01_exact_dedup",
      (s, d) => Dedup.exactDedup(Tables.documents(s, d), "text", "doc_id")
        .orderBy("keep_id"),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
              FROM documents GROUP BY text ORDER BY keep_id""")),

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
      (s, d) => containmentPairsShared(s, d).orderBy("ia", "ib"),
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
        // the expected pair set IS x186's shared mined frame (the
        // cmsShared relationship — the gate checks the very pairs x186
        // reports, no re-mine), restricted to odd-even pairs in-plan;
        // the frozen reference postings derive from the same SHARED
        // corpus shingle frame, so the corpus is tokenized+hashed once
        // for the whole family
        val sh = shinglesShared(s, d)
        val expected = containmentPairsShared(s, d)
          .filter(col("ia") % 2 =!= col("ib") % 2)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .map { case (a, b, c) =>
            if (a % 2 == 1) (a, b, c) else (b, a, c) }.toSet
        val flag = Dedup.containmentFlaggerOf(
          sh.filter(col("doc_id") % 2 === 0), "text", "doc_id",
          n = 3, threshold = 0.9)
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
          // The PRIMARY parity above runs at 0.9 — intentionally the
          // shared frame's threshold (sharing IS the contract, see
          // containmentPairsShared). The gate's original threshold was
          // 0.8, so a SECONDARY batch-mode parity case keeps the
          // boundary pairs in [0.8, 0.9) covered: same frozen-index
          // discipline, fresh 0.8 mine as the expectation — over a
          // deterministic 40 % sub-universe (doc_id % 5 < 2), which is
          // SOUND because containment is pairwise (a pair's score never
          // depends on other docs, so restricted-universe pairs equal
          // full-corpus pairs with both members in the universe) and
          // keeps the extra mine inside the bench budget.
          val uni = col("doc_id") % 5 < 2
          val flag08 = Dedup.containmentFlaggerOf(
            sh.filter(uni && col("doc_id") % 2 === 0), "text", "doc_id",
            n = 3, threshold = 0.8)
          val boundaryOk = try {
            val exp08 = Dedup.containmentPairsOf(sh.filter(uni),
                threshold = 0.8)
              .filter(col("ia") % 2 =!= col("ib") % 2)
              .collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
              .map { case (a, b, c) =>
                if (a % 2 == 1) (a, b, c) else (b, a, c) }.toSet
            val got08 = flag08(docs.filter(uni && col("doc_id") % 2 =!= 0)
              .select(col("doc_id"), col("text"))).collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
            got08 == exp08 && exp08.nonEmpty
          } finally flag08.close()
          Seq((acc.toSet == expected) && expected.nonEmpty && boundaryOk)
            .toDF("containment_stream_ok")
        } finally flag.close()
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS containment_stream_ok")),

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
        // ONE aggregate computes n_blocks, n_kept AND the kept-block
        // rebuild from the same occ-joined rows (r21; the kept/nb split
        // re-ran the tokenize subtree once per aggregate — 3 tokenize
        // passes in the r20 plan). collect_list skips the CASE WHEN's
        // nulls, so the rebuild collects exactly the occ<2 rows the old
        // filter kept; a doc whose every block is boilerplate aggregates
        // to n_kept=0 / scrub_text='' — the same rows the old shape's
        // left-join coalesce produced.
        val b = TextAnalysis.tokenBlocks(Tables.documents(s, d))
        val occ = b.groupBy(col("block")).agg(count(lit(1)).as("occ"))
        val agg = b.join(occ, "block")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_blocks"),
            count(when(col("occ") < 2, 1)).as("n_kept"),
            expr("""array_join(transform(array_sort(collect_list(
                      CASE WHEN occ < 2 THEN struct(block_no, block) END)),
                                         x -> x.block), ' ')""").as("scrub_text"))
        Tables.documents(s, d).select(col("doc_id"))
          .join(agg, Seq("doc_id"), "left")
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
    // levenshtein catches). Blocking is Dedup.editDistPairs' sound
    // width-8 length banding (probe side exploded to band ±1 — the Q27
    // bucketed range-join shape, NO cartesian, pinned in PlanSpec); the
    // in-band compare is Spark's THRESHOLDED levenshtein (early-exits
    // past the budget, returns -1 — O(d·len) per pair; the 48-char key
    // caps the DP at 48×8 cells). The measured scale trait — in-band
    // candidates quadratic in band occupancy, and why the published
    // filters (PassJoin, ED-Join prefix) degenerate at this 17% relative
    // threshold — is documented with numbers on editDistPairs. Lengths
    // compare on length(text), not the table's n_chars column: the
    // flagger twin (Dedup.editDistFlagger) has only the text, and the
    // pinned parity between the two must not hinge on the dataset
    // invariant n_chars == length(text).
    QueryDef("x101_editdist_neardup",
      (s, d) => Dedup.editDistPairs(Tables.documents(s, d), dMax = 8)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH d AS (SELECT doc_id, substr(text, 1, 48) AS p,
                     length(text) AS lc
                   FROM documents)
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
              FROM d a JOIN d b
                ON a.doc_id < b.doc_id AND abs(a.lc - b.lc) <= 8
              WHERE levenshtein(a.p, b.p) <= 8
              ORDER BY doc_a, doc_b""")),

    // x101b — the SCALE form of x101 as a callable, oracle-checked entry:
    // grouped banding (groupCols = source) prepends the group key to the
    // length-band join, so candidate volume is quadratic in PER-GROUP band
    // occupancy instead of corpus band occupancy — the scaladoc's "run
    // typo dedup per source/template subset" guidance as code (r16 weak
    // mark #1). Semantics: exactly x101's pair set RESTRICTED to
    // same-source pairs (DedupSpec pins the restriction equality; the
    // oracle recomputes it independently). Growth arriving as NEW groups
    // (new crawl snapshots/sources) costs linear work — measured in
    // SOAK.md's grouped-banding section.
    QueryDef("x101b_editdist_grouped",
      (s, d) => Dedup.editDistPairs(Tables.documents(s, d), dMax = 8,
          groupCols = Seq("source"))
        .orderBy("doc_a", "doc_b"),
      Some("""WITH d AS (SELECT doc_id, source, substr(text, 1, 48) AS p,
                     length(text) AS lc
                   FROM documents)
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
              FROM d a JOIN d b
                ON a.doc_id < b.doc_id AND a.source = b.source
                   AND abs(a.lc - b.lc) <= 8
              WHERE levenshtein(a.p, b.p) <= 8
              ORDER BY doc_a, doc_b""")),

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
              FROM dg GROUP BY deg ORDER BY deg""")),
  )
}
