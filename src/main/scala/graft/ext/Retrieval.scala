package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical and hybrid retrieval over the document corpus: BM25 scoring
  * (Robertson/Spärck Jones — the standard of-the-shelf lexical ranker) and
  * reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) for
  * combining a lexical and a semantic ranking — the retrieval front end a
  * training-data pipeline needs for eval-set mining, dedup triage, and
  * RAG-corpus curation.
  *
  * Scale shape: BM25 is ONE token scan with the query-term filter pushed
  * into it (an `isin` over a literal handful of terms — the scan prunes to
  * matching rows before any shuffle), two tiny aggregates over matched
  * docs, and a corpus-sized-but-2-column length frame; nothing quadratic,
  * no windows over the corpus. Fusion is a join of two (id, rank) frames.
  *
  * Determinism: every per-(doc, term) contribution quantizes to integer
  * micro-units (`round(x * 1e6)` BIGINT) BEFORE the per-doc sum — the
  * x92/x96 trick — so scores are exact integer sums, bit-identical
  * cross-engine, and rank ties break on doc id. */
object Retrieval {

  /** BM25 scores for `terms` over `docs(textCol)`: one row per document
    * matching at least one term — (`doc_id`, `n_hit_terms`, `score_micro`).
    *
    * Corpus statistics (N, avgdl) are computed over the tokenizable
    * universe (`length(trim(text)) > 0`), document length in whitespace
    * tokens. idf is the Lucene-style non-negative variant
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`; term weight is
    * `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`. Each term's
    * contribution quantizes to micro-units before the sum (see object
    * scaladoc). */
  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val (dl, stats, tokenizable) = corpusStats(docs, textCol, idCol)
    // the term filter rides the exploded scan: `isin` over a literal list —
    // only matching (doc, term) rows survive into the aggregate
    val tf = tokenizable
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("c_micro", contributionMicro(k1, b))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c_micro")).as("score_micro"))
  }

  /** [[bm25]] over a PREBUILT [[buildPostings]] postings frame (columns
    * `idCol`, `tok`, `tf`, `df`, `dl`) plus its one-row stats. Selection-
    * identical to [[bm25]]: postings' per-term `df` equals the filtered-tf
    * df for every matched term (both count the docs containing the term),
    * `tf`/`dl` and the (n_docs, sum_dl) totals are the same values, and
    * the contribution is the shared [[contributionMicro]] — so a catalog
    * that persists ONE postings frame serves every BM25 entry point from
    * cache instead of re-tokenizing the corpus per query (r21). */
  def bm25Of(postings: DataFrame, stats: DataFrame, terms: Seq[String],
             k1: Double = 1.2, b: Double = 0.75,
             idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    postings.filter(col("tok").isin(terms: _*))
      .crossJoin(broadcast(stats))
      .withColumn("c_micro", contributionMicro(k1, b))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c_micro")).as("score_micro"))
  }

  /** The one-row (n_docs, sum_dl) totals recomputed from a postings frame
    * — identical to [[corpusStats]]'s stats: postings hold one row per
    * (tokenizable doc, distinct term), so distinct (id, dl) is exactly the
    * per-doc length frame (every tokenizable doc has ≥ 1 token). */
  def statsOfPostings(postings: DataFrame, idCol: String = "doc_id"): DataFrame =
    postings.select(col(idCol), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  /** (per-doc lengths, corpus totals, tokenizable docs) — the corpus-side
    * statistics both BM25 entry points build on. */
  private def corpusStats(docs: DataFrame, textCol: String,
                          idCol: String): (DataFrame, DataFrame, DataFrame) = {
    // Fan a starved single-split scan out across the cores (Par scaladoc);
    // both tokenize passes below consume the SAME exchange via
    // ReuseExchange, so the corpus is scanned once either way.
    val tokenizable = Par.fanOutScan(docs, col(idCol))
      .filter(length(trim(col(textCol))) > 0)
    // dl from the codegen'd token count — no second tokenize of the corpus
    val dl = tokenizable.select(col(idCol),
      TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    (dl, stats, tokenizable)
  }

  /** The per-(doc, term) BM25 contribution in integer micro-units, over
    * columns `tf`, `df`, `dl`, `n_docs`, `sum_dl` — ONE definition shared
    * by [[bm25]] and [[bm25Retriever]] so the two paths cannot drift (and
    * so the SQL oracles mirror a single expression). */
  private def contributionMicro(k1: Double, b: Double): Column = expr(
    s"""CAST(round(
          ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
          (CAST(tf AS DOUBLE) * ${k1 + 1.0}) /
          (CAST(tf AS DOUBLE) + $k1 *
            (${1.0 - b} + $b * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
          * 1e6) AS BIGINT)""")

  /** Build the BM25 corpus state ONCE — postings with df and doc length
    * attached, plus the corpus totals — and return the per-batch scorer:
    * the [[Similarity.srpRetriever]] build/apply split for LEXICAL
    * retrieval. The query frame is (`query_id`, `terms` array<string>);
    * each batch broadcasts its distinct (query, term) rows against the
    * persisted postings (corpus-sized, partitioned by term — the posting-
    * list scan), sums exact micro-unit contributions per (query, doc), and
    * ranks top-`kTop` per query. A query's result depends only on its own
    * row and the static corpus state, so streaming output ≡ batch output
    * on the same rows (StreamingSpec). Output: (`query_id`, doc id,
    * `n_hit_terms`, `score_micro`, `rnk`). `close()` releases the
    * persisted postings. */
  def bm25Retriever(docs: DataFrame, kTop: Int,
                    k1: Double = 1.2, b: Double = 0.75,
                    textCol: String = "text",
                    idCol: String = "doc_id"): Retriever = {
    val (postings, stats) = buildPostings(docs, textCol, idCol)
    val postingsP = postings.persist()
    val statsP = stats.persist()
    new Retriever(
      scoreBatch(postingsP, statsP, kTop, k1, b, idCol),
      () => { postingsP.unpersist(); statsP.unpersist() })
  }

  /** One-shot multi-query BM25 retrieval: [[bm25Retriever]]'s exact plan
    * without the build/apply persistence split — the catalog-entry shape
    * (nothing cached beyond the query's own run). */
  def bm25CrossTopK(docs: DataFrame, queries: DataFrame, kTop: Int,
                    k1: Double = 1.2, b: Double = 0.75,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val (postings, stats) = buildPostings(docs, textCol, idCol)
    scoreBatch(postings, stats, kTop, k1, b, idCol)(queries)
  }

  /** [[bm25CrossTopK]] over a PREBUILT (postings, stats) pair — the
    * cached-frame entry (see [[bm25Of]]). */
  def bm25CrossTopKOf(postings: DataFrame, stats: DataFrame,
                      queries: DataFrame, kTop: Int,
                      k1: Double = 1.2, b: Double = 0.75,
                      idCol: String = "doc_id"): DataFrame =
    scoreBatch(postings, stats, kTop, k1, b, idCol)(queries)

  /** The corpus-side (postings, stats) pair as a public build — what the
    * catalog's shared postings frame materializes once (r21). */
  def bm25Postings(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): (DataFrame, DataFrame) =
    buildPostings(docs, textCol, idCol)

  /** Corpus-side BM25 state: postings (doc, term, tf) with the term's df
    * and the doc's length attached, plus the (n_docs, sum_dl) totals. */
  private def buildPostings(docs: DataFrame, textCol: String,
                            idCol: String): (DataFrame, DataFrame) = {
    val (dl, stats, tokenizable) = corpusStats(docs, textCol, idCol)
    val tf = tokenizable
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    // ONE per-term aggregate carries BOTH background statistics — df
    // (BM25's) and cf (QL's) — so a single shared postings frame serves
    // both rankers (r21); each scorer's plan prunes the column it
    // ignores. cf over all (id, tok) rows equals cf over any term-filtered
    // subset that retains the term: docs without the term contribute no
    // rows either way.
    val postings = tf
      .join(tf.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf")), "tok")
      .join(dl, idCol)
    (postings, stats)
  }

  private def scoreBatch(postings: DataFrame, stats: DataFrame, kTop: Int,
                         k1: Double, b: Double,
                         idCol: String): DataFrame => DataFrame = queries =>
    scoreTerms(postings, stats, kTop, k1, b, idCol)(
      queries.select(col("query_id"),
        explode(array_distinct(col("terms"))).as("tok")))

  /** [[scoreBatch]] over an already-exploded (`query_id`, `tok`) frame —
    * the entry [[bm25Prf]] uses to feed PLAN-DERIVED terms (no driver
    * collect between expansion and re-scoring). */
  private def scoreTerms(postings: DataFrame, stats: DataFrame, kTop: Int,
                         k1: Double, b: Double,
                         idCol: String): DataFrame => DataFrame = qt =>
    // postings scan ⋈ broadcast query terms — the scale direction
    postings.join(broadcast(qt), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("c_micro", contributionMicro(k1, b))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c_micro")).as("score_micro"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_micro").desc, col(idCol))))
      .filter(col("rnk") <= kTop)

  /** Pseudo-relevance-feedback retrieval (the RM3/Rocchio-lite loop): BM25
    * for the seed terms → top-`kDocs` feedback documents → the `kExpand`
    * highest Σ tf·idf_micro NEW terms in those documents → one re-scored
    * BM25 over seeds ∪ expansion, top-`kTop`. The whole two-stage chain is
    * ONE lazy plan — the expansion terms flow as a FRAME into the second
    * scoring (no driver collect), so Catalyst sees and schedules the full
    * pipeline. Exactness: idf quantizes to micro-units and the expansion
    * weight is an exact integer Σ tf·idf_micro with (weight desc, term)
    * tie-break, so the chosen terms — and therefore the final ranking —
    * are bit-deterministic cross-engine. Cost: the feedback-doc term
    * aggregate runs over `kDocs` documents, not the corpus; stage-2 is one
    * more posting-list join. */
  def bm25Prf(docs: DataFrame, seedTerms: Seq[String],
              kDocs: Int = 3, kExpand: Int = 2, kTop: Int = 10,
              k1: Double = 1.2, b: Double = 0.75,
              textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val (postings, stats) = buildPostings(docs, textCol, idCol)
    bm25PrfOf(postings, stats, seedTerms, kDocs, kExpand, kTop, k1, b, idCol)
  }

  /** [[bm25Prf]] over a PREBUILT (postings, stats) pair — the r21
    * structural-reuse entry: a pipeline that persists its postings (the
    * catalog's shared frame) runs the whole PRF chain on the cached
    * table, so the three postings references (seed scoring, expansion,
    * final scoring) are cache scans in the STATIC plan instead of three
    * corpus tokenizes deduplicated only by runtime exchange reuse. */
  def bm25PrfOf(postings: DataFrame, stats: DataFrame, seedTerms: Seq[String],
                kDocs: Int = 3, kExpand: Int = 2, kTop: Int = 10,
                k1: Double = 1.2, b: Double = 0.75,
                idCol: String = "doc_id"): DataFrame = {
    require(seedTerms.nonEmpty, "bm25Prf needs at least one seed term")
    val prfSession = postings.sparkSession
    import prfSession.implicits._
    // Stage-1 seed scoring runs off the SAME postings stage-2 uses —
    // calling bm25(docs, ...) here re-built tf/df/dl from a second
    // corpus tokenize (r20; two redundant passes measured on x132).
    // scoreTerms over postings is selection-identical: postings' per-term
    // df equals bm25's filtered-tf df for every matched term, the
    // contribution expression is the shared contributionMicro, and the
    // (score desc, id) tie-break matches the orderBy+limit.
    val seedQt = seedTerms.distinct.toDF("tok")
      .select(lit(0L).as("query_id"), col("tok"))
    val feedback = scoreTerms(postings, stats, kDocs, k1, b, idCol)(seedQt)
      .select(col(idCol))
    val idfMicro = expr(
      """CAST(round(ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) /
                              (CAST(df AS DOUBLE) + 0.5)) * 1e6) AS BIGINT)""")
    val expansion = postings
      .join(broadcast(feedback), idCol)
      .filter(!col("tok").isin(seedTerms: _*))
      .crossJoin(broadcast(stats))
      .groupBy(col("tok"))
      .agg(sum(col("tf") * idfMicro).as("w"))
      .orderBy(col("w").desc, col("tok")).limit(kExpand)
      .select(col("tok"))
    val qt = seedTerms.distinct.toDF("tok").union(expansion).distinct()
      .select(lit(0L).as("query_id"), col("tok"))
    scoreTerms(postings, stats, kTop, k1, b, idCol)(qt)
      .select(col(idCol), col("n_hit_terms"), col("score_micro"), col("rnk"))
  }

  /** Reciprocal-rank-fusion term for a rank column: `round(1e9/(k + rnk))`
    * as an exact BIGINT (null rank — id absent from that ranking —
    * contributes 0). */
  def rrfTerm(rnk: Column, k: Int = 60): Column =
    coalesce(round(lit(1e9) / (lit(k.toDouble) + rnk)).cast("long"), lit(0L))

  /** Fuse two (id, rank) frames by reciprocal-rank fusion: full outer on
    * the id, `rrf_micro = Σ round(1e9/(k+rank))` over the rankings each id
    * appears in. Column contracts: `left(idCol, "rnk")`,
    * `right(idCol, "rnk")`. */
  def rrfFuse(left: DataFrame, right: DataFrame, idCol: String,
              k: Int = 60): DataFrame = {
    val l = left.select(col(idCol), col("rnk").as("rnk_l"))
    val r = right.select(col(idCol), col("rnk").as("rnk_r"))
    l.join(r, Seq(idCol), "full_outer")
      .select(col(idCol),
        (rrfTerm(col("rnk_l"), k) + rrfTerm(col("rnk_r"), k)).as("rrf_micro"))
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai/Lafferty 2001 —
    * the language-modeling ranker beside BM25's probabilistic one): top-`kTop`
    * docs by `log p(q|d)` with `p(t|d) = (tf + μ·p(t|C)) / (dl + μ)`,
    * `p(t|C) = cf_t / |C|`. Scores are RANK-EQUIVALENT to the full query
    * likelihood — the doc-independent `Σ_t ln(μ·p(t|C))` constant is
    * dropped, leaving per matched term `ln(1 + tf·|C| / (μ·cf))` minus the
    * per-doc length norm `|q|·ln(dl + μ)`; as usual for posting-list
    * retrieval only docs matching ≥ 1 term are candidates.
    *
    * Same plan shape as [[bm25]]: the term `isin` filter rides the exploded
    * scan, `cf` is one tiny aggregate over the SAME filtered rows (the sum
    * over all docs of a query term's tf IS its collection frequency — no
    * second corpus pass), stats broadcast. Both log factors quantize to
    * integer micro-nats BEFORE the sum (the object's determinism contract),
    * so `score_micro` is an exact integer cross-engine. `mu` defaults to
    * 300 — the classic 500–2000 range assumes web-length docs; set it
    * relative to the corpus avgdl. Output: (`doc_id`, `n_hit_terms`,
    * `score_micro`, `rnk`), ties on doc id. */
  /** Build the QL corpus state ONCE — postings with each term's collection
    * frequency and the doc length attached, plus corpus totals — and return
    * the per-batch scorer: [[bm25Retriever]]'s build/apply split for the
    * language-modeling ranker. Query frame contract: (`query_id`, `terms`
    * array<string>); output (`query_id`, doc id, `n_hit_terms`,
    * `score_micro`, `rnk`), per-query rank, ties on doc id. A query's
    * result depends only on its own row and the static corpus state, so
    * streaming output ≡ batch output on the same rows (StreamingSpec). */
  def qlRetriever(docs: DataFrame, kTop: Int, mu: Double = 300.0,
                  textCol: String = "text",
                  idCol: String = "doc_id"): Retriever = {
    require(mu > 0, s"Dirichlet mu must be positive, got $mu")
    val (postings, stats) = buildPostings(docs, textCol, idCol)
    val postingsP = postings.persist()
    val statsP = stats.persist()
    new Retriever(
      qlScoreBatch(postingsP, statsP, kTop, mu, idCol),
      () => { postingsP.unpersist(); statsP.unpersist() })
  }

  /** One-shot multi-query QL retrieval: [[qlRetriever]]'s exact plan
    * without the persistence split — the catalog-entry shape. */
  def qlCrossTopK(docs: DataFrame, queries: DataFrame, kTop: Int,
                  mu: Double = 300.0, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(mu > 0, s"Dirichlet mu must be positive, got $mu")
    val (postings, stats) = buildPostings(docs, textCol, idCol)
    qlScoreBatch(postings, stats, kTop, mu, idCol)(queries)
  }

  /** [[qlCrossTopK]] over a PREBUILT (postings, stats) pair — the
    * cached-frame entry (see [[bm25Of]]). */
  def qlCrossTopKOf(postings: DataFrame, stats: DataFrame,
                    queries: DataFrame, kTop: Int, mu: Double = 300.0,
                    idCol: String = "doc_id"): DataFrame = {
    require(mu > 0, s"Dirichlet mu must be positive, got $mu")
    qlScoreBatch(postings, stats, kTop, mu, idCol)(queries)
  }

  /** The per-(doc, term) QL contribution in integer micro-nats, over
    * columns `tf`, `cf`, `sum_dl` — ONE definition shared by [[qlTopK]]
    * and the batch paths so the two cannot drift (the [[contributionMicro]]
    * rule for the LM ranker). */
  private def qlContributionMicro(mu: Double): Column = expr(
    s"""CAST(round(ln(1.0 + CAST(tf AS DOUBLE) * CAST(sum_dl AS DOUBLE) /
          ($mu * CAST(cf AS DOUBLE))) * 1e6) AS BIGINT)""")

  /** The per-doc QL length norm `ln(dl + mu)` in integer micro-nats. */
  private def qlNormMicro(mu: Double): Column = expr(
    s"CAST(round(ln(CAST(dl AS DOUBLE) + $mu) * 1e6) AS BIGINT)")

  private def qlScoreBatch(postings: DataFrame, stats: DataFrame, kTop: Int,
                           mu: Double,
                           idCol: String): DataFrame => DataFrame = queries => {
    val qt = queries.select(col("query_id"),
      size(array_distinct(col("terms"))).cast("long").as("nq"),
      explode(array_distinct(col("terms"))).as("tok"))
    postings.join(broadcast(qt), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("c_micro", qlContributionMicro(mu))
      .withColumn("norm_micro", qlNormMicro(mu))
      .groupBy(col("query_id"), col("nq"), col(idCol), col("norm_micro"))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c_micro")).as("m_micro"))
      .select(col("query_id"), col(idCol), col("n_hit_terms"),
        (col("m_micro") - col("nq") * col("norm_micro")).as("score_micro"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_micro").desc, col(idCol))))
      .filter(col("rnk") <= kTop)
  }

  def qlTopK(docs: DataFrame, terms: Seq[String], mu: Double = 300.0,
             kTop: Int = 10, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val (postings, stats) = buildPostings(docs, textCol, idCol)
    qlTopKOf(postings, stats, terms, mu, kTop, idCol)
  }

  /** [[qlTopK]] over a PREBUILT [[buildPostings]] (postings, stats) pair —
    * the cached-frame entry (see [[bm25Of]]); postings' `cf` equals the
    * filtered build's (docs without a term contribute no rows to its Σ tf
    * either way). */
  def qlTopKOf(postings: DataFrame, stats: DataFrame, terms: Seq[String],
               mu: Double = 300.0, kTop: Int = 10,
               idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "qlTopK needs at least one query term")
    require(mu > 0, s"Dirichlet mu must be positive, got $mu")
    val nTerms = terms.distinct.size
    postings.filter(col("tok").isin(terms: _*))
      .crossJoin(broadcast(stats))
      .withColumn("c_micro", qlContributionMicro(mu))
      .withColumn("norm_micro", qlNormMicro(mu))
      .groupBy(col(idCol), col("norm_micro"))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c_micro")).as("m_micro"))
      .select(col(idCol), col("n_hit_terms"),
        (col("m_micro") - lit(nTerms.toLong) * col("norm_micro"))
          .as("score_micro"))
      // top-k as TakeOrderedAndProject (no global window over the matched
      // set); the rank window then runs over kTop rows only
      .orderBy(col("score_micro").desc, col(idCol)).limit(kTop)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score_micro").desc, col(idCol))))
  }
}
