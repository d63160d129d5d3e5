package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: lay the corpus out as fixed-capacity
  * token sequences (the GPT-style "concatenate and chunk" packer — every
  * training example is exactly `capacity` tokens, documents are shuffled
  * deterministically, and a document straddling a boundary is split across
  * consecutive sequences). The packer answers the two questions a training
  * shard-writer asks: "where does each document land?" ([[packPlan]]) and
  * "which document slices make up each sequence?" ([[packSegments]]).
  *
  * Layout is a pure function of (corpus, capacity, seed): each kept doc gets
  * the order key `md5(doc_id ':' seed)` (engine-portable — DuckDB's md5 of
  * the same string matches byte-for-byte, so the oracle reproduces the
  * shuffle), docs are laid end-to-end in key order, and sequence `s` covers
  * token interval [s·capacity, (s+1)·capacity).
  *
  * SCALE: the textbook implementation — one global running-sum window over
  * the whole corpus — is a SINGLE-PARTITION sort on 100 TB and never
  * finishes. This packer computes the same prefix sum in two phases: docs
  * hash into `16^bucketHexChars` buckets by the LEADING hex chars of the
  * order key (so bucket-numeric order refines key order — lowercase hex is
  * ASCII-ordered), phase 1 aggregates one token subtotal per bucket and
  * cumsums that tiny frame (the only single-partition window, ≤ `16^n`
  * rows), phase 2 cumsums WITHIN each bucket under
  * `Window.partitionBy(bucket)` and adds the broadcast bucket offset. Every
  * corpus-sized structure is hash-partitioned; widen `bucketHexChars` to 3–4
  * (4096 / 65536 buckets) when one bucket of documents no longer fits a
  * task. Determinism does not depend on the bucket count — any width yields
  * the identical layout.
  */
object Pack {

  /** Per-document packing coordinates: deterministic shuffle position,
    * exclusive prefix token count `cum_before`, and the derived sequence
    * interval. Blank docs are out of domain (filtered, like x92); every
    * output column is an exact BIGINT so cross-engine hashes match.
    *
    * Output: `doc_id, n_tokens, cum_before, start_seq, start_off, end_seq,
    * n_segs` where `start_seq = cum_before div capacity`, `start_off =
    * cum_before mod capacity`, `end_seq = (cum_before + n_tokens - 1) div
    * capacity` and `n_segs = end_seq - start_seq + 1`.
    *
    * The length UNIT is pluggable: by default each doc weighs its
    * whitespace token count of `textCol`; pass `lengthCol` to pack by a
    * PRECOMPUTED additive length instead (BPE token counts, character
    * counts — the x212 chat packer packs rendered conversations by
    * chars so the x209 loss-mask spans stay in the same coordinate
    * space). Rows with non-positive length are out of domain either
    * way; `n_tokens` keeps its name as "length units". */
  def packPlan(docs: DataFrame, capacity: Long = 2048L, seed: Long = 42L,
               bucketHexChars: Int = 2, textCol: String = "text",
               idCol: String = "doc_id",
               lengthCol: Option[String] = None): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(bucketHexChars >= 1 && bucketHexChars <= 8,
      s"bucketHexChars must be in [1,8], got $bucketHexChars")
    lengthCol.foreach(c => require(docs.columns.contains(c),
      s"packPlan: lengthCol '$c' not in ${docs.columns.mkString(",")}"))
    val sized = lengthCol match {
      case Some(c) => docs
        .filter(col(c) > 0)
        .select(col(idCol).cast("long").as("doc_id"),
          col(c).cast("long").as("n_tokens"))
      case None => docs
        .filter(length(trim(col(textCol))) > 0)
        .select(col(idCol).cast("long").as("doc_id"),
          TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("n_tokens"))
    }
    val base = sized
      .withColumn("okey",
        md5(concat(col("doc_id").cast("string"), lit(":" + seed))))
      .withColumn("bucket",
        conv(substring(col("okey"), 1, bucketHexChars), 16, 10).cast("long"))
    // Phase 1: one subtotal row per bucket; the exclusive cumsum runs on
    // this ≤ 16^bucketHexChars-row frame only.
    val bucketOff = base.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("btok"))
      .withColumn("boff",
        coalesce(sum(col("btok")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("boff"))
    // Phase 2: within-bucket exclusive cumsum (hash-partitioned by bucket)
    // plus the broadcast bucket offset = the global exclusive prefix sum.
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(col("okey"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_in", coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .join(broadcast(bucketOff), Seq("bucket"))
      .select(col("doc_id"), col("n_tokens"),
        (col("boff") + col("cum_in")).as("cum_before"))
      .select(col("doc_id"), col("n_tokens"), col("cum_before"),
        expr(s"cum_before div ${capacity}L").as("start_seq"),
        pmod(col("cum_before"), lit(capacity)).as("start_off"),
        expr(s"(cum_before + n_tokens - 1) div ${capacity}L").as("end_seq"))
      .withColumn("n_segs", col("end_seq") - col("start_seq") + lit(1L))
  }

  /** Explode a [[packPlan]] into the shard-writer's input: one row per
    * (sequence, document-slice). `seq_off` is the slice's token offset
    * within the sequence, `doc_off` its offset within the document,
    * `seg_len` its length; slices of one sequence tile [0, capacity) and
    * slices of one document tile [0, n_tokens) — both invariants pinned by
    * PackSpec and the x135b gate. Shape: one `explode(sequence(...))` per
    * doc (array sized n_segs — bounded by n_tokens/capacity, so a 1 M-token
    * doc at capacity 2048 explodes to ~500 rows, never corpus-scale), then
    * arithmetic; no extra shuffle beyond the plan's.
    */
  def packSegments(plan: DataFrame, capacity: Long = 2048L): DataFrame =
    plan
      .withColumn("seq_id",
        explode(expr("sequence(start_seq, end_seq)")))
      .select(
        col("seq_id"),
        col("doc_id"),
        when(col("seq_id") === col("start_seq"), col("start_off"))
          .otherwise(lit(0L)).as("seq_off"),
        when(col("seq_id") === col("start_seq"), lit(0L))
          .otherwise(col("seq_id") * capacity - col("cum_before"))
          .as("doc_off"),
        (least(col("cum_before") + col("n_tokens"),
               (col("seq_id") + lit(1L)) * capacity) -
         greatest(col("cum_before"), col("seq_id") * capacity))
          .as("seg_len"))

  /** Materialize packed sequences: join a [[packSegments]] frame back to
    * the corpus, slice each document's token array at (doc_off, seg_len),
    * and reassemble every sequence's text in slice order — the final
    * shard-writer step that turns layout coordinates into training rows.
    * Two shuffles, both keyed and bounded: the slice join co-partitions on
    * `doc_id` (corpus-sized, 8-byte key), the reassembly groups on
    * `seq_id` with per-group state bounded by `capacity` tokens (the
    * collect_list can never exceed one sequence). Output: (`seq_id`,
    * `n_slices`, `seq_text`), ordered reassembly via a sorted
    * (seq_off, slice) struct array — no window needed. */
  def rehydrate(segments: DataFrame, docs: DataFrame,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    segments
      .join(docs.select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks")), Seq("doc_id"))
      .select(col("seq_id"), col("seq_off"),
        expr("""array_join(slice(toks, CAST(doc_off + 1 AS INT),
                                 CAST(seg_len AS INT)), ' ')""").as("seg"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_slices"),
        collect_list(struct(col("seq_off"), col("seg"))).as("parts"))
      .select(col("seq_id"), col("n_slices"),
        expr("array_join(transform(array_sort(parts), p -> p.seg), ' ')")
          .as("seq_text"))

  /** Boolean packing invariant over a [[packSegments]] frame: every
    * sequence except the last is filled to EXACTLY `capacity` tokens and
    * none exceeds it. One groupBy(seq_id) + a broadcast one-row max frame;
    * empty corpus is vacuous success. */
  def capacityGate(segments: DataFrame, capacity: Long = 2048L): DataFrame = {
    val per = segments.groupBy(col("seq_id"))
      .agg(sum(col("seg_len")).as("n_tok"))
    val mx = per.agg(max(col("seq_id")).as("mx"),
      count(lit(1)).as("n_seqs_all"))
    per.crossJoin(broadcast(mx))
      .agg(
        coalesce(max(col("n_seqs_all")), lit(0L)).as("n_seqs"),
        coalesce(bool_and((col("n_tok") === capacity ||
            col("seq_id") === col("mx")) && col("n_tok") <= capacity),
          lit(true)).as("capacity_ok"))
  }
}
