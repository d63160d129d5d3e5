package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Curation, Dedup, Export, Ivf, Multimodal, Pack, Retrieval, Similarity, TextAnalysis}

/** Text-analysis catalog entries: token/language/quality stats, n-gram language models, BPE, sketches (CMS, xxhash digests), per-source health.
  *
  * Split from the original monolithic ExtQueries catalog — entries
  * verbatim; shared frames and helpers live in [[ExtShared]]. */
object TextQueries {

  // x203's deterministic accent suffix: four 2-byte chars (e,o,u,s accents)
  // + one 3-byte char (ellipsis), so both mojibake signature widths appear.
  private val MojibakeSuffix =
    " Caf\u00e9 n\u00ba \u00fcber stra\u00dfe\u2026"
  import ExtShared._

  val defs: Seq[QueryDef] = Seq(

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

    // x04b — pluggable-profile gate: langGuess with the default set
    // WIDENED by one profile ('nl', appended last in tie-break order)
    // must change a doc's prediction ONLY to 'nl', and only when the nl
    // score strictly beats the previous best — i.e. swapping profile
    // sets is a pure parameter of the same plan, with no collateral
    // drift on docs the new profile doesn't win. The catalog's x04 rows
    // stay hash-stable because the default set is untouched.
    QueryDef("x04b_lang_profiles_gate",
      (s, d) => {
        import s.implicits._
        val nl = Seq("nl" -> Seq("de", "het", "een", "en", "zijn"))
        val widened = TextAnalysis.langProfiles ++ nl
        val oldBest = greatest(
          TextAnalysis.langScores(col("text")).map(_._2): _*)
        val nlScore = TextAnalysis.langScores(col("text"), widened)
          .toMap.apply("nl")
        val bad = Tables.documents(s, d).select(
            TextAnalysis.langGuess(col("text")).as("g0"),
            TextAnalysis.langGuess(col("text"), widened).as("g1"),
            oldBest.as("b0"), nlScore.as("snl"))
          .filter(col("g1") =!= col("g0") &&
            (col("g1") =!= "nl" || col("snl") <= col("b0")))
          .count()
        Seq(bad == 0L).toDF("lang_profiles_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS lang_profiles_ok")),

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

    // x206 — BPE DECODE round trip: the tokenizer loop closed. Rebuild
    // x157's id stream (same shared merges, same deterministic vocab),
    // then reconstruct each sampled doc from NOTHING BUT (pos, tok_id) +
    // the vocab — Bpe.decodeIds: broadcast id→symbol join, array_sort on
    // collected (pos, sym) structs (no window, no single partition),
    // wrapper strip. Word boundaries are not represented in the id
    // stream (boundary-markerless tokenizer), so the invariant is
    // character preservation: decode(encode(text)) equals the
    // whitespace-stripped text, which the oracle computes as a pure
    // function of `documents` — so an id collision, a vocab drift, a
    // lost position, or a merge-table change anywhere in the
    // train→encode→decode loop fails the hash.
    QueryDef("x206_bpe_decode",
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
        val enc = symsOf.filter(col("doc_id") % 25 === 0)
          .select(col("doc_id"), posexplode(col("ss")).as(Seq("pos", "sym")))
          .join(vocab, "sym")
          .select(col("doc_id"), col("pos").cast("long").as("pos"),
            col("tok_id"))
        val expected = Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0 && col("doc_id") % 25 === 0)
          .select(col("doc_id"),
            concat_ws("", TextAnalysis.tokens(col("text"))).as("want"))
        graft.ext.Bpe.decodeIds(enc, vocab)
          .join(expected, "doc_id")
          .select(col("doc_id"), col("decoded"),
            (col("decoded") === col("want")).as("roundtrip_ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     regexp_replace(trim(text), '\s+', '', 'g') AS decoded,
                     CAST(1 AS BOOLEAN) AS roundtrip_ok
              FROM documents
              WHERE length(trim(text)) > 0 AND doc_id % 25 = 0
              ORDER BY doc_id""")),

    // x192 — mergeable-sketch distinct-shingle cardinality: per-source
    // Datasketches-HLL(lgK=12) sketches of 3-token shingles, estimates
    // beside exact counts, and a '<ALL>' corpus row whose estimate comes
    // from UNIONING the per-source sketches rather than re-scanning — the
    // 100 TB distinct-count pattern (per-shard sketch artifacts, roll-ups
    // by union). Rows-only: the estimate is engine-specific (DuckDB's
    // approx_count_distinct is a different HLL); pinned by the x192b
    // bound gate, the x99b pattern.
    QueryDef("x192_hll_shingle_card",
      (s, d) => hllShinglesShared(s, d).orderBy("source"),
      None),

    // x192b — HLL error-bound gate: Datasketches HLL at lgK=12 carries
    // sigma = 1.04/sqrt(4096) = 1.6% relative standard error; every
    // per-source estimate AND the sketch-union corpus estimate must sit
    // within 5% (> 3 sigma) of its exact count, checked in INTEGER
    // arithmetic (|est-exact|*20 <= exact). Hashing is fixed-seed, so the
    // outcome is deterministic per dataset - no flaky-gate risk (measured
    // worst across sf0.001/0.01/0.1: 2.6%).
    QueryDef("x192b_hll_bound_gate",
      (s, d) => hllShinglesShared(s, d)
        .agg(coalesce(
          expr("every(abs(est_shingles - exact_shingles) * 20 <= exact_shingles)"),
          lit(true)).as("hll_bounds_ok")),
      Some("SELECT CAST(1 AS BOOLEAN) AS hll_bounds_ok")),

    // x199 — HTML main-content extraction (trafilatura-lite): every real
    // crawl starts as HTML, and this is the operator that turns it into
    // the `text` column everything else consumes. Each document is wrapped
    // in a synthesized page — head with title/style/script, a nav bar, an
    // HTML comment, the doc text as an escaped paragraph (every third doc
    // gains an inline citation link), an entity-bearing second paragraph,
    // a link-farm aside, and a footer — and TextAnalysis.htmlExtract must
    // recover exactly the content paragraphs: head/comment/script/style
    // die whole, nav/aside/footer die under the 40 % link-density rule,
    // the paragraphs (inline link included) survive with entities decoded.
    // The oracle replicates the extraction character-for-character in
    // DuckDB SQL — possible because the patterns stay inside the
    // RE2-compatible subset (one engine split: DuckDB's regexp_extract_all
    // yields NULL on zero matches where Spark yields [], hence the
    // coalesce on the oracle's anchor length). Scan-local: no shuffle.
    QueryDef("x199_html_extract",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val escT = regexp_replace(regexp_replace(regexp_replace(col("text"),
          "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
        val inlineRef = when(col("doc_id") % 3 === 0,
          lit(" See <a href=\"/ref\">the reference</a> for details."))
          .otherwise(lit(""))
        val html = concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><style>body{margin:0}</style>" +
            "<script>if (a<b) { track(\"&x\"); }</script></head><body>" +
            "<nav><a href=\"/\">home</a> <a href=\"/all\">all docs</a></nav>" +
            "<!-- rendered by graft -->" +
            "<div id=\"main\"><p>"),
          escT, inlineRef,
          lit("</p><p>Tags: &lt;"), col("lang"),
          lit("&gt; &amp; more</p></div>" +
            "<aside><a href=\"/a\">one</a> <a href=\"/b\">two</a></aside>" +
            "<footer>&copy; corpus <a href=\"/tos\">terms</a> " +
            "<a href=\"/priv\">privacy</a></footer></body></html>"))
        graft.ext.TextAnalysis.htmlExtract(
          docs.select(col("doc_id"), html.as("html")))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
                SELECT doc_id,
                  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
                  '</title><style>body{margin:0}</style>' ||
                  '<script>if (a<b) { track("&x"); }</script></head><body>' ||
                  '<nav><a href="/">home</a> <a href="/all">all docs</a></nav>' ||
                  '<!-- rendered by graft -->' ||
                  '<div id="main"><p>' ||
                  replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
                  CASE WHEN doc_id % 3 = 0
                    THEN ' See <a href="/ref">the reference</a> for details.'
                    ELSE '' END ||
                  '</p><p>Tags: &lt;' || lang || '&gt; &amp; more</p></div>' ||
                  '<aside><a href="/a">one</a> <a href="/b">two</a></aside>' ||
                  '<footer>&copy; corpus <a href="/tos">terms</a> ' ||
                  '<a href="/priv">privacy</a></footer></body></html>' AS html
                FROM documents),
              c AS (
                SELECT doc_id, regexp_replace(html,
                  '(?is)<head\b[^>]*>.*?</head\s*>|<!--.*?-->|<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>',
                  ' ', 'g') AS ch FROM h),
              b AS (
                SELECT doc_id, string_split_regex(ch,
                  '(?i)<(?:/?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|blockquote|section|article|header|footer|nav|aside|main|figure|figcaption|pre|form|title|body|html)\b[^>]*|br\s*/?)>') AS blocks
                FROM c),
              t AS (
                SELECT doc_id, list_filter(list_transform(blocks, bl ->
                    struct_pack(
                      v := trim(regexp_replace(
                        replace(replace(replace(replace(replace(replace(replace(
                          regexp_replace(bl, '(?s)<[^>]*>', ' ', 'g'),
                          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                          '&#39;', ''''), '&apos;', ''''), '&nbsp;', ' '),
                          '&amp;', '&'),
                        '\s+', ' ', 'g')),
                      a := coalesce(length(trim(regexp_replace(
                        replace(replace(replace(replace(replace(replace(replace(
                          regexp_replace(array_to_string(
                            regexp_extract_all(bl, '(?is)<a\b[^>]*>(.*?)</a\s*>', 1),
                            ' '), '(?s)<[^>]*>', ' ', 'g'),
                          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                          '&#39;', ''''), '&apos;', ''''), '&nbsp;', ' '),
                          '&amp;', '&'),
                        '\s+', ' ', 'g'))), 0))),
                  tt -> length(tt.v) > 0) AS vb
                FROM b)
              SELECT doc_id,
                CAST(len(vb) AS BIGINT) AS n_blocks,
                CAST(len(list_filter(vb, tt -> tt.a * 100 <= 40 * length(tt.v))) AS BIGINT) AS n_kept,
                array_to_string(list_transform(
                  list_filter(vb, tt -> tt.a * 100 <= 40 * length(tt.v)),
                  tt -> tt.v), ' ') AS main_text
              FROM t ORDER BY doc_id""")),

    // x200 — URL canonicalization (the cc-net ingest rule set): synthesized
    // crawl URLs exercising every rule — mixed-case scheme/host, explicit
    // default ports, utm_* tracking params in leading/trailing/only
    // positions, fragments, trailing slashes — normalized by
    // TextAnalysis.urlNormalize (scheme+host lowercase, default port off,
    // userinfo off, fragment off, utm killed with separators re-tidied,
    // non-root trailing slash trimmed), plus the bare lowercased host.
    // Scan-local regex chains in the RE2 subset; the oracle replicates
    // them in DuckDB (replacement backrefs spell \\1 there, $1 in Spark;
    // DuckDB regexp_replace needs the explicit 'g' flag Spark defaults to).
    QueryDef("x200_url_canon",
      (s, d) => {
        val id = col("doc_id")
        val scheme = when(id % 2 === 0, lit("HTTP")).otherwise(lit("https"))
        val port = when(id % 2 === 0, lit(":80")).otherwise(lit(":443"))
        val host = concat(
          when(id % 5 === 0, upper(col("source"))).otherwise(col("source")),
          lit(".Example.COM"))
        val path = concat(lit("/docs/item"), (id % 100).cast("string"),
          when(id % 3 === 0, lit("//")).otherwise(lit("")))
        val query = when(id % 4 === 0,
            lit("?utm_source=feed&ref=home&utm_medium=rss"))
          .when(id % 4 === 1, lit("?ref=home"))
          .when(id % 4 === 2, lit("?UTM_Campaign=x"))
          .otherwise(lit(""))
        val frag = when(id % 7 === 0, lit("#section-2")).otherwise(lit(""))
        val raw = concat(scheme, lit("://"), host, port, path, query, frag)
        Tables.documents(s, d)
          .select(id.as("doc_id"), raw.as("url_raw"))
          .select(col("doc_id"),
            graft.ext.TextAnalysis.urlNormalize(col("url_raw"))
              .as("url_canon"),
            graft.ext.TextAnalysis.urlHost(col("url_raw")).as("host"))
          .orderBy("doc_id")
      },
      Some("""WITH r AS (
                SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) ||
                  '://' ||
                  (CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END) ||
                  '.Example.COM' ||
                  (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END) ||
                  '/docs/item' || CAST(doc_id % 100 AS VARCHAR) ||
                  (CASE WHEN doc_id % 3 = 0 THEN '//' ELSE '' END) ||
                  (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=home&utm_medium=rss'
                        WHEN doc_id % 4 = 1 THEN '?ref=home'
                        WHEN doc_id % 4 = 2 THEN '?UTM_Campaign=x'
                        ELSE '' END) ||
                  (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)
                  AS url_raw
                FROM documents),
              p AS (
                SELECT doc_id, url_raw,
                  lower(regexp_extract(url_raw,
                    '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                  regexp_replace(lower(regexp_extract(url_raw,
                    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                    '^[^@]*@', '') AS hostport,
                  regexp_extract(url_raw,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest
                FROM r),
              n AS (
                SELECT doc_id, scheme,
                  CASE WHEN scheme = 'http'
                         THEN regexp_replace(hostport, ':80$', '')
                       WHEN scheme = 'https'
                         THEN regexp_replace(hostport, ':443$', '')
                       ELSE hostport END AS host,
                  regexp_replace(hostport, ':\d+$', '') AS bare_host,
                  regexp_replace(regexp_replace(rest, '#.*$', ''),
                    '\?.*$', '') AS path0,
                  regexp_extract(regexp_replace(rest, '#.*$', ''),
                    '\?(.*)$', 1) AS q0
                FROM p),
              f AS (
                SELECT doc_id, scheme, host, bare_host,
                  regexp_replace(path0, '^(/.+?)/+$', '\1') AS path1,
                  regexp_replace(regexp_replace(q0,
                    '(^|&)(?i:utm_)[^&]*', '', 'g'), '^&+', '') AS q1
                FROM n)
              SELECT doc_id,
                scheme || '://' || host || path1 ||
                  (CASE WHEN length(q1) = 0 THEN '' ELSE '?' || q1 END)
                  AS url_canon,
                bare_host AS host
              FROM f ORDER BY doc_id""")),

    // x201 — per-host URL dedup stats: the read a crawl pipeline takes
    // right after canonicalization — per host, how many raw URLs collapse
    // onto how many canonical ones (the dup volume tracking params and
    // case variants were hiding). One groupBy over the x200 projection;
    // count_distinct partial-aggregates map-side.
    QueryDef("x201_url_dedup_stats",
      (s, d) => graft.SparkEntry.queries("x200_url_canon")(s, d)
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_urls"),
          count_distinct(col("url_canon")).as("n_canonical"),
          (count(lit(1)) - count_distinct(col("url_canon"))).as("n_dup"))
        .orderBy("host"),
      Some("""WITH r AS (
                SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) ||
                  '://' ||
                  (CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END) ||
                  '.Example.COM' ||
                  (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END) ||
                  '/docs/item' || CAST(doc_id % 100 AS VARCHAR) ||
                  (CASE WHEN doc_id % 3 = 0 THEN '//' ELSE '' END) ||
                  (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=home&utm_medium=rss'
                        WHEN doc_id % 4 = 1 THEN '?ref=home'
                        WHEN doc_id % 4 = 2 THEN '?UTM_Campaign=x'
                        ELSE '' END) ||
                  (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)
                  AS url_raw
                FROM documents),
              p AS (
                SELECT doc_id, url_raw,
                  lower(regexp_extract(url_raw,
                    '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                  regexp_replace(lower(regexp_extract(url_raw,
                    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                    '^[^@]*@', '') AS hostport,
                  regexp_extract(url_raw,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest
                FROM r),
              n AS (
                SELECT doc_id, scheme,
                  CASE WHEN scheme = 'http'
                         THEN regexp_replace(hostport, ':80$', '')
                       WHEN scheme = 'https'
                         THEN regexp_replace(hostport, ':443$', '')
                       ELSE hostport END AS host,
                  regexp_replace(hostport, ':\d+$', '') AS bare_host,
                  regexp_replace(regexp_replace(rest, '#.*$', ''),
                    '\?.*$', '') AS path0,
                  regexp_extract(regexp_replace(rest, '#.*$', ''),
                    '\?(.*)$', 1) AS q0
                FROM p),
              f AS (
                SELECT doc_id, scheme, host, bare_host,
                  regexp_replace(path0, '^(/.+?)/+$', '\1') AS path1,
                  regexp_replace(regexp_replace(q0,
                    '(^|&)(?i:utm_)[^&]*', '', 'g'), '^&+', '') AS q1
                FROM n),
              c AS (
                SELECT bare_host AS host,
                  scheme || '://' || f.host || path1 ||
                    (CASE WHEN length(q1) = 0 THEN '' ELSE '?' || q1 END)
                    AS url_canon
                FROM f)
              SELECT host, count(*) AS n_urls,
                count(DISTINCT url_canon) AS n_canonical,
                count(*) - count(DISTINCT url_canon) AS n_dup
              FROM c GROUP BY host ORDER BY host""")),

    // x203 — encoding validity + mojibake repair: the stage between WARC
    // payload bytes and htmlExtract. Two damage classes, both synthesized
    // deterministically so the oracle is pure arithmetic (the x183/x188/
    // x191 discipline — DuckDB has no cp1252 codec, so it recomputes the
    // EXPECTED repair output from the clean source instead of replaying
    // the repair): (1) double encoding — even docs' text is corrupted by
    // the exact upstream failure (UTF-8 bytes mis-decoded as cp1252:
    // latin1 one-char-per-byte + the 27 cp1252 glyph remaps), carrying a
    // five-char accent suffix so 2-byte (C3/C2 lead) AND 3-byte (E2 lead,
    // the curly-quote class) signatures both appear; mojibakeRepair must
    // recover the clean string exactly and leave odd (clean) docs
    // UNTOUCHED; (2) invalid bytes — doc_id%3 stray C3 lead bytes
    // appended to the clean UTF-8 payload, counted by the codegen'd
    // strict-table byte scan, with the clean payload pinned at zero.
    // Scan-local codegen end to end: translate/regexp/encode chains + a
    // native Expression, no UDF, no shuffle.
    QueryDef("x203_mojibake_repair",
      (s, d) => {
        val clean = concat(substring(col("text"), 1, 48),
          lit(MojibakeSuffix))
        val corrupt = when(col("doc_id") % 2 === 0,
          translate(decode(encode(clean, "UTF-8"), "ISO-8859-1"),
            "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008a\u008b\u008c\u008e\u0091\u0092\u0093\u0094\u0095\u0096\u0097\u0098\u0099\u009a\u009b\u009c\u009e\u009f",
            "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"))
          .otherwise(clean)
        val junk = when(col("doc_id") % 3 === 0,
            lit(Array.emptyByteArray))
          .when(col("doc_id") % 3 === 1, lit(Array(0xC3.toByte)))
          .otherwise(lit(Array(0xC3.toByte, 0xC3.toByte)))
        Tables.documents(s, d)
          .select(col("doc_id"), clean.as("clean"), corrupt.as("corrupt"),
            junk.as("junk"))
          .select(col("doc_id"),
            TextAnalysis.mojibakeScore(col("corrupt")).cast("long")
              .as("n_sig"),
            TextAnalysis.mojibakeRepair(col("corrupt")).as("repaired"),
            (TextAnalysis.mojibakeRepair(col("corrupt")) === col("clean"))
              .as("fixed"),
            TextAnalysis.utf8InvalidBytes(
              concat(encode(col("clean"), "UTF-8"), col("junk")))
              .cast("long").as("n_invalid"),
            TextAnalysis.utf8InvalidBytes(encode(col("clean"), "UTF-8"))
              .cast("long").as("n_invalid_clean"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
                     CAST(CASE WHEN doc_id % 2 = 0 THEN 5 ELSE 0 END
                       AS BIGINT) AS n_sig,
                     substr(text, 1, 48) ||
                       '$MojibakeSuffix' AS repaired,
                     CAST(1 AS BOOLEAN) AS fixed,
                     CAST(doc_id % 3 AS BIGINT) AS n_invalid,
                     CAST(0 AS BIGINT) AS n_invalid_clean
              FROM documents ORDER BY doc_id""")),

    // x204 — per-source encoding health: the operational read right after
    // x203 (which sources ship damaged text, and is it repairable) — the
    // x201 relationship (canonicalize -> per-host stats) applied to the
    // encoding stage. Same deterministic corruption as x203 (even docs
    // cp1252-double-encoded), aggregated per source: docs carrying
    // mojibake signatures, total signature volume, and docs the gated
    // repair actually rewrites. Scan-local scoring + one groupBy;
    // count/sum partial-aggregate map-side. Oracle is pure synthesis
    // arithmetic (even-id counts and the 5-signature suffix).
    QueryDef("x204_encoding_health",
      (s, d) => {
        val clean = concat(substring(col("text"), 1, 48),
          lit(MojibakeSuffix))
        val corrupt = when(col("doc_id") % 2 === 0,
          translate(decode(encode(clean, "UTF-8"), "ISO-8859-1"),
            "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008a\u008b\u008c\u008e\u0091\u0092\u0093\u0094\u0095\u0096\u0097\u0098\u0099\u009a\u009b\u009c\u009e\u009f",
            "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"))
          .otherwise(clean)
        Tables.documents(s, d)
          .select(col("source"), corrupt.as("t"))
          .select(col("source"),
            TextAnalysis.mojibakeScore(col("t")).cast("long").as("sig"),
            (TextAnalysis.mojibakeRepair(col("t")) =!= col("t"))
              .cast("long").as("rep"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("sig") > 0, 1L).otherwise(0L)).as("n_mojibake"),
            sum(col("sig")).as("n_signatures"),
            sum(col("rep")).as("n_repaired"))
          .orderBy("source")
      },
      Some("""SELECT source,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_mojibake,
                     CAST(5 * sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_signatures,
                     CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_repaired
              FROM documents GROUP BY source ORDER BY source""")),
  )
}
