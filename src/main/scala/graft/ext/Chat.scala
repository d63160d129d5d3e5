package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversational / SFT data assembly — the multi-turn surface an
  * instruction-tuning pipeline needs between raw turn logs and the
  * packer: render ordered turns into one training string, validate the
  * conversation shape (alternation, role bookends, empty turns), and
  * compute the character spans supervised-finetuning loss masks train
  * on (assistant turns train, everything else is context).
  *
  * Rendering convention (the fixed serialization every function here
  * shares, so spans computed from turn arithmetic index into the
  * rendered string exactly): each turn serializes to
  * `<|role|>` + text + `<|end|>`, turns concatenated in `idxCol` order
  * with no separator. Markers are pinned — a training pipeline that
  * wants different control tokens re-renders; it must NOT get a
  * half-configurable template whose spans silently disagree with the
  * renderer.
  *
  * Scale shape: everything is keyed by conversation — one groupBy for
  * rendering, keyed windows (lag / bounded running sum) for validation
  * and spans. No global window, no driver state; a conversation's turn
  * list is the only per-group payload (bounded by dialog length, not
  * corpus size). All expressions are built-in codegen'd functions — no
  * UDFs.
  */
object Chat {

  /** One turn's rendered form. Character count = len(role) + len(text)
    * + [[MarkerOverhead]]. */
  private def piece(role: Column, text: Column): Column =
    concat(lit("<|"), role, lit("|>"), text, lit("<|end|>"))

  /** `<|` + `|>` + `<|end|>` — the per-turn marker characters around
    * (role, text). */
  val MarkerOverhead: Int = 11

  /** Characters between a turn's start and its text: `<|` + role +
    * `|>`. */
  private def headLen(role: Column): Column = length(role) + lit(4)

  private def checkCols(turns: DataFrame, cols: Seq[String],
                        caller: String): Unit =
    cols.foreach(c => require(turns.columns.contains(c),
      s"$caller needs columns ${cols.mkString(", ")}; missing '$c'"))

  /** Render each conversation's turns (ordered by `idxCol`) into ONE
    * training string. Output: (`conv_id`, `n_turns`, `n_chars`,
    * `rendered`) — one row per conversation.
    *
    * One hash aggregate per conversation; the sort is per-group
    * (`sort_array` over the collected turn structs — dialog-length
    * bounded, never a shuffle of its own). Ties on `idxCol` order by
    * (role, text) struct comparison, so rendering is deterministic even
    * on dirty inputs — but duplicate indexes are a shape violation
    * [[validateConversations]] reports (`unique_idx`). */
  def renderConversations(turns: DataFrame,
                          convCol: String = "conv_id",
                          idxCol: String = "turn_idx",
                          roleCol: String = "role",
                          textCol: String = "text"): DataFrame = {
    checkCols(turns, Seq(convCol, idxCol, roleCol, textCol),
      "renderConversations")
    turns
      .groupBy(col(convCol).as("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        array_join(
          transform(
            sort_array(collect_list(struct(
              col(idxCol).as("i"), col(roleCol).as("r"),
              col(textCol).as("t")))),
            t => piece(t.getField("r"), t.getField("t"))),
          "").as("rendered"))
      .select(col("conv_id"), col("n_turns"),
        length(col("rendered")).cast("long").as("n_chars"), col("rendered"))
  }

  /** Per-conversation shape verdicts — the gate between raw turn logs
    * and training: (`conv_id`, `n_turns`, `starts_user`,
    * `ends_assistant`, `alternates`, `no_empty`, `unique_idx`, `valid`).
    *
    * - `starts_user` / `ends_assistant`: role bookends by `idxCol`
    *   order (an SFT example must open with context and close with a
    *   supervised turn).
    * - `alternates`: no two consecutive turns share a role (lag window
    *   keyed by conversation).
    * - `no_empty`: every turn has non-whitespace text.
    * - `unique_idx`: turn indexes are distinct (a duplicate index makes
    *   order — and therefore the rendered bytes — data-dependent).
    * - `valid` = all of the above.
    *
    * Roles beyond `userRole`/`assistantRole` (tool, system) are legal
    * anywhere in the middle; only the bookends are role-pinned. */
  def validateConversations(turns: DataFrame,
                            convCol: String = "conv_id",
                            idxCol: String = "turn_idx",
                            roleCol: String = "role",
                            textCol: String = "text",
                            userRole: String = "user",
                            assistantRole: String = "assistant"): DataFrame = {
    checkCols(turns, Seq(convCol, idxCol, roleCol, textCol),
      "validateConversations")
    // the lag window runs over the RENAMED projection below
    val w = Window.partitionBy(col("conv_id")).orderBy(col("idx"))
    turns
      .select(col(convCol).as("conv_id"), col(idxCol).as("idx"),
        col(roleCol).as("role"), col(textCol).as("text"))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        (min_by(col("role"), col("idx")) === lit(userRole))
          .as("starts_user"),
        (max_by(col("role"), col("idx")) === lit(assistantRole))
          .as("ends_assistant"),
        (count(when(col("prev_role") === col("role"), 1)) === 0)
          .as("alternates"),
        (count(when(length(trim(col("text"))) === 0 ||
          col("text").isNull, 1)) === 0).as("no_empty"),
        (count(lit(1)) === countDistinct(col("idx"))).as("unique_idx"))
      .select(col("conv_id"), col("n_turns"), col("starts_user"),
        col("ends_assistant"), col("alternates"), col("no_empty"),
        col("unique_idx"),
        (col("starts_user") && col("ends_assistant") && col("alternates") &&
          col("no_empty") && col("unique_idx")).as("valid"))
  }

  /** Character spans of each turn's TEXT inside the
    * [[renderConversations]] string, with the SFT loss-mask flag.
    * Output: one row per turn — (`conv_id`, `turn_idx`, `role`,
    * `span_start` 0-based inclusive, `span_end` exclusive, `trainable` =
    * role == `assistantRole`). `substring(rendered, span_start + 1,
    * span_end - span_start)` is exactly the turn's text (ChatSpec pins
    * the invariant corpus-wide against the rendered strings).
    *
    * The only window is the per-conversation running sum of rendered
    * piece lengths (rows-bounded lag cumsum, dialog-length bounded) — the
    * same discipline as the x135 pack plan. Spans are CHARACTER offsets
    * (codepoints), the unit both Spark `length` and the downstream
    * tokenizer-offset join speak. */
  def lossMaskSpans(turns: DataFrame,
                    convCol: String = "conv_id",
                    idxCol: String = "turn_idx",
                    roleCol: String = "role",
                    textCol: String = "text",
                    assistantRole: String = "assistant"): DataFrame = {
    checkCols(turns, Seq(convCol, idxCol, roleCol, textCol),
      "lossMaskSpans")
    // the cumsum window runs over the RENAMED projection below
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    turns
      .select(col(convCol).as("conv_id"), col(idxCol).as("turn_idx"),
        col(roleCol).as("role"), col(textCol).as("text"))
      .withColumn("piece_len",
        (length(col("role")) + length(col("text")) + lit(MarkerOverhead))
          .cast("long"))
      .withColumn("span_start",
        (coalesce(sum(col("piece_len")).over(w), lit(0L)) +
          headLen(col("role"))).cast("long"))
      .select(col("conv_id"), col("turn_idx"), col("role"),
        col("span_start"),
        (col("span_start") + length(col("text"))).cast("long")
          .as("span_end"),
        (col("role") === lit(assistantRole)).as("trainable"))
  }

  /** Context-window trimming: per conversation, flag the LONGEST SUFFIX
    * of turns whose total rendered length fits `budget` characters — the
    * standard chat-window policy (drop oldest turns first, never split a
    * turn). Output: every input turn plus `suffix_cost` (the rendered
    * cost of this turn and everything after it, the quantity compared to
    * the budget) and `kept`. A conversation whose LAST turn alone
    * exceeds the budget keeps nothing — the caller decides whether that
    * is a drop or an error.
    *
    * One conversation-keyed reverse running sum (rows-bounded, dialog-
    * length bounded) — no global window, no UDFs. Costs are rendered
    * piece lengths ([[renderConversations]]' serialization), so trimming
    * then rendering is guaranteed to fit the budget. */
  def trimToBudget(turns: DataFrame, budget: Long,
                   convCol: String = "conv_id",
                   idxCol: String = "turn_idx",
                   roleCol: String = "role",
                   textCol: String = "text"): DataFrame = {
    require(budget > 0, s"trimToBudget: budget must be positive, got $budget")
    checkCols(turns, Seq(convCol, idxCol, roleCol, textCol), "trimToBudget")
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .select(col(convCol).as("conv_id"), col(idxCol).as("turn_idx"),
        col(roleCol).as("role"), col(textCol).as("text"))
      .withColumn("piece_len",
        (length(col("role")) + length(col("text")) + lit(MarkerOverhead))
          .cast("long"))
      .withColumn("suffix_cost", sum(col("piece_len")).over(w))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("suffix_cost"), (col("suffix_cost") <= budget).as("kept"))
  }

  /** The packed-SFT artifact: [[lossMaskSpans]] carried THROUGH the
    * [[Pack.packPlan]] concat-and-chunk packer in CHARACTER space, so a
    * fixed-shape dataloader gets, per packed sequence, the trainable
    * [start, end) ranges to mask loss with. Conversations pack by their
    * rendered length (computed as the SUM of piece lengths — the
    * rendered strings themselves are never materialized here), spans
    * intersect each (sequence, conversation-slice) segment and shift
    * into sequence coordinates. Output: (`seq_id`, `conv_id`,
    * `turn_idx`, `seq_start`, `seq_end`) — one row per surviving
    * (assistant turn × segment) overlap; a span cut by a sequence
    * boundary yields one clipped row per side.
    *
    * Scale shape: the length frame is one keyed aggregate; the plan is
    * packPlan's two-phase bucket cumsum (the only single-partition
    * window is the ≤16^bucketHexChars bucket-subtotal frame); the final
    * join keys on conversation with both sides conversation-bounded
    * (segments per conversation ≤ n_chars/capacity + 1, spans per
    * conversation ≤ dialog length). */
  def packedLossMasks(turns: DataFrame,
                      capacity: Long = 2048L,
                      seed: Long = 42L,
                      convCol: String = "conv_id",
                      idxCol: String = "turn_idx",
                      roleCol: String = "role",
                      textCol: String = "text",
                      assistantRole: String = "assistant"): DataFrame = {
    checkCols(turns, Seq(convCol, idxCol, roleCol, textCol),
      "packedLossMasks")
    val lens = turns
      .select(col(convCol).as("conv_id"),
        (length(col(roleCol)) + length(col(textCol)) + lit(MarkerOverhead))
          .cast("long").as("piece_len"))
      .groupBy(col("conv_id"))
      .agg(sum(col("piece_len")).as("n_chars"))
    val segs = Pack.packSegments(
      Pack.packPlan(lens, capacity, seed, idCol = "conv_id",
        lengthCol = Some("n_chars")),
      capacity)
      .withColumnRenamed("doc_id", "conv_id")
    val spans = lossMaskSpans(turns, convCol, idxCol, roleCol, textCol,
      assistantRole)
      .filter(col("trainable"))
    spans.join(segs, "conv_id")
      .select(col("seq_id"), col("conv_id"), col("turn_idx"),
        greatest(col("span_start"), col("doc_off")).as("o_start"),
        least(col("span_end"), col("doc_off") + col("seg_len")).as("o_end"),
        col("seq_off"), col("doc_off"))
      .filter(col("o_start") < col("o_end"))
      .select(col("seq_id"), col("conv_id"), col("turn_idx"),
        (col("seq_off") + col("o_start") - col("doc_off")).as("seq_start"),
        (col("seq_off") + col("o_end") - col("doc_off")).as("seq_end"))
  }

  // ------------------------------------------------------------------
  // TOKEN-space SFT output — the loss-mask family composed with the
  // in-engine BPE tokenizer (graft.ext.Bpe), so a trainer that consumes
  // token ids gets masks in the SAME unit. Token layout per turn:
  // one control token `<|role|>`, then the BPE symbols of the turn's
  // text under the trained merge table, then one control token
  // `<|end|>` — so a turn costs bpeTokenCount(text) + 2 tokens and the
  // trainable range of an assistant turn is exactly its text tokens
  // (control tokens are context, mirroring the character-space contract
  // where spans cover text only). Control markers can never collide
  // with BPE symbols: trained symbols stay wrapped in '·' markers
  // ("·er·"), control markers are not.
  // ------------------------------------------------------------------

  /** Per-turn token-symbol array: [`<|role|>`] ++ BPE symbols of text ++
    * [`<|end|>`]. Empty/whitespace-only text contributes only the two
    * control tokens. Map-side only (the applyMerges nested-replace
    * projection — no shuffle, whatever the corpus size). */
  private def turnSymbols(role: Column, text: Column,
                          merges: Seq[String]): Column = {
    val textSyms = when(length(trim(text)) === 0,
      array().cast("array<string>"))
      .otherwise(filter(
        split(Bpe.applyMerges(TextAnalysis.tokens(text), merges), " "),
        s => s =!= "·§·"))
    concat(array(concat(lit("<|"), role, lit("|>"))), textSyms,
      array(lit("<|end|>")))
  }

  /** The projected per-turn frame every token-space function shares:
    * (`conv_id`, `turn_idx`, `role`, `syms`, `cost` = size(syms)). */
  private def turnSymFrame(turns: DataFrame, merges: Seq[String],
                           convCol: String, idxCol: String,
                           roleCol: String, textCol: String): DataFrame =
    turns
      .select(col(convCol).as("conv_id"), col(idxCol).as("turn_idx"),
        col(roleCol).as("role"),
        turnSymbols(col(roleCol), col(textCol), merges).as("syms"))
      .withColumn("cost", size(col("syms")).cast("long"))

  /** Deterministic id table over the chat corpus's token symbols
    * (control markers included): (`sym`, `tok_id`), ranked by corpus
    * count desc then symbol asc — the x157 vocab discipline, so ids are
    * a pure function of the corpus + merge table. The ranking window is
    * global but |V|-bounded (vocabulary-sized, never corpus-sized). */
  def chatVocab(turns: DataFrame, merges: Seq[String],
                convCol: String = "conv_id",
                idxCol: String = "turn_idx",
                roleCol: String = "role",
                textCol: String = "text"): DataFrame = {
    checkCols(turns, Seq(convCol, idxCol, roleCol, textCol), "chatVocab")
    turnSymFrame(turns, merges, convCol, idxCol, roleCol, textCol)
      .select(explode(col("syms")).as("sym"))
      .groupBy(col("sym")).agg(count(lit(1)).as("cnt"))
      .withColumn("tok_id", row_number().over(
        Window.orderBy(col("cnt").desc, col("sym"))).cast("long"))
      .select(col("sym"), col("tok_id"))
  }

  /** The per-conversation TOKEN-ID stream a trainer reads: (`conv_id`,
    * `pos` 0-based over the whole conversation, `tok_id` from
    * [[chatVocab]]). Turn order is `idxCol`; each turn's tokens are
    * contiguous at base = sum of prior turn costs (conversation-keyed
    * rows-bounded cumsum — the lossMaskSpans window in token units).
    * The id join keys on the symbol against the |V|-bounded vocab. */
  def encodeConversations(turns: DataFrame, merges: Seq[String],
                          convCol: String = "conv_id",
                          idxCol: String = "turn_idx",
                          roleCol: String = "role",
                          textCol: String = "text"): DataFrame = {
    checkCols(turns, Seq(convCol, idxCol, roleCol, textCol),
      "encodeConversations")
    val syms = turnSymFrame(turns, merges, convCol, idxCol, roleCol, textCol)
    val vocab = chatVocab(turns, merges, convCol, idxCol, roleCol, textCol)
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    syms
      .withColumn("base", coalesce(sum(col("cost")).over(w), lit(0L)))
      .select(col("conv_id"), col("base"),
        posexplode(col("syms")).as(Seq("i", "sym")))
      .join(broadcast(vocab), "sym")
      .select(col("conv_id"), (col("base") + col("i")).as("pos"),
        col("tok_id"))
  }

  /** [[lossMaskSpans]] in TOKEN units: one row per turn — (`conv_id`,
    * `turn_idx`, `role`, `tok_start` 0-based inclusive, `tok_end`
    * exclusive, `trainable`). `tok_start` skips the turn's `<|role|>`
    * control token; the range covers exactly the turn's text tokens, so
    * ids [tok_start, tok_end) of the [[encodeConversations]] stream
    * decode to the turn's text (ChatSpec pins the invariant). Same
    * single conversation-keyed cumsum window. */
  def tokenLossMasks(turns: DataFrame, merges: Seq[String],
                     convCol: String = "conv_id",
                     idxCol: String = "turn_idx",
                     roleCol: String = "role",
                     textCol: String = "text",
                     assistantRole: String = "assistant"): DataFrame = {
    checkCols(turns, Seq(convCol, idxCol, roleCol, textCol),
      "tokenLossMasks")
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    turnSymFrame(turns, merges, convCol, idxCol, roleCol, textCol)
      .withColumn("tok_start",
        coalesce(sum(col("cost")).over(w), lit(0L)) + lit(1L))
      .select(col("conv_id"), col("turn_idx"), col("role"),
        col("tok_start"),
        (col("tok_start") + col("cost") - lit(2L)).as("tok_end"),
        (col("role") === lit(assistantRole)).as("trainable"))
  }

  /** The conversation→segment layout shared by [[packedTokenMasks]] and
    * [[packedTokenIds]]: conversations packed by their TOKEN cost
    * (sum of per-turn costs) through the x135 two-phase packer. */
  private def tokenSegments(syms: DataFrame, capacity: Long,
                            seed: Long): DataFrame = {
    val lens = syms.groupBy(col("conv_id"))
      .agg(sum(col("cost")).as("n_toks"))
    Pack.packSegments(
      Pack.packPlan(lens, capacity, seed, idCol = "conv_id",
        lengthCol = Some("n_toks")),
      capacity)
      .withColumnRenamed("doc_id", "conv_id")
  }

  /** [[packedLossMasks]] in TOKEN units — the mask artifact matching
    * [[packedTokenIds]]' sequences: conversations pack by token count
    * (packPlan lengthCol = token cost), assistant-turn token ranges
    * intersect each (sequence, conversation-slice) segment and shift
    * into sequence coordinates. Output: (`seq_id`, `conv_id`,
    * `turn_idx`, `seq_start`, `seq_end`) in token units; a range cut by
    * a sequence boundary yields one clipped row per side. */
  def packedTokenMasks(turns: DataFrame, merges: Seq[String],
                       capacity: Long = 2048L,
                       seed: Long = 42L,
                       convCol: String = "conv_id",
                       idxCol: String = "turn_idx",
                       roleCol: String = "role",
                       textCol: String = "text",
                       assistantRole: String = "assistant"): DataFrame = {
    checkCols(turns, Seq(convCol, idxCol, roleCol, textCol),
      "packedTokenMasks")
    val syms = turnSymFrame(turns, merges, convCol, idxCol, roleCol, textCol)
    val segs = tokenSegments(syms, capacity, seed)
    val spans = tokenLossMasks(turns, merges, convCol, idxCol, roleCol,
      textCol, assistantRole)
      .filter(col("trainable"))
    spans.join(segs, "conv_id")
      .select(col("seq_id"), col("conv_id"), col("turn_idx"),
        greatest(col("tok_start"), col("doc_off")).as("o_start"),
        least(col("tok_end"), col("doc_off") + col("seg_len")).as("o_end"),
        col("seq_off"), col("doc_off"))
      .filter(col("o_start") < col("o_end"))
      .select(col("seq_id"), col("conv_id"), col("turn_idx"),
        (col("seq_off") + col("o_start") - col("doc_off")).as("seq_start"),
        (col("seq_off") + col("o_end") - col("doc_off")).as("seq_end"))
  }

  /** The packed TOKEN-ID sequences themselves — the training shard a
    * fixed-shape dataloader reads next to [[packedTokenMasks]]:
    * (`seq_id`, `pos` 0-based within the sequence, `tok_id`). Each
    * conversation's [[encodeConversations]] stream lands at its
    * segments' sequence coordinates; the join keys on conversation with
    * both sides conversation-bounded (tokens per conversation ≤ dialog
    * token count, segments per conversation ≤ n_toks/capacity + 1). */
  def packedTokenIds(turns: DataFrame, merges: Seq[String],
                     capacity: Long = 2048L,
                     seed: Long = 42L,
                     convCol: String = "conv_id",
                     idxCol: String = "turn_idx",
                     roleCol: String = "role",
                     textCol: String = "text"): DataFrame = {
    checkCols(turns, Seq(convCol, idxCol, roleCol, textCol),
      "packedTokenIds")
    val syms = turnSymFrame(turns, merges, convCol, idxCol, roleCol, textCol)
    val segs = tokenSegments(syms, capacity, seed)
    encodeConversations(turns, merges, convCol, idxCol, roleCol, textCol)
      .join(segs, "conv_id")
      .filter(col("pos") >= col("doc_off") &&
        col("pos") < col("doc_off") + col("seg_len"))
      .select(col("seq_id"),
        (col("seq_off") + col("pos") - col("doc_off")).as("pos"),
        col("tok_id"))
  }
}
