package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Chat, Crawl, Dedup}
import ExtShared.{bpeMergesShared, bpeOracleCtes}

/** Conversational/SFT + crawl-frontier catalog entries (x207–x209,
  * x211): render multi-turn conversations into training strings,
  * validate conversation shape, compute loss-mask spans, and schedule a
  * politeness-bounded crawl frontier. All over deterministic turn/URL
  * synthesis from `documents`, fully DuckDB-replicable → every entry is
  * a hash-match oracle row. */
object ChatQueries {

  /** Deterministic multi-turn synthesis from `documents` — 4 turns per
    * conversation (conv_id = doc_id div 4, turn_idx = doc_id % 4),
    * alternating user/assistant by index parity, with three INJECTED
    * shape violations so the x208 verdicts exercise every rule at every
    * SF: odd multiples of 17 force a double-`user` (alternation break,
    * sometimes an ends-with-user break at turn 3), multiples of 23 force
    * an empty turn, multiples of 31 are DROPPED (missing turns — length
    * variance and missing-bookend cases), and doc_id ≡ 41 (mod 164)
    * duplicates its row verbatim (unique_idx break; identical duplicate
    * rows keep every downstream order-tie deterministic). The oracle SQL
    * replicates this synthesis exactly ([[turnsSql]]). */
  private[graft] def synthTurns(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .filter(col("doc_id") % 31 =!= 0)
      .select(
        expr("doc_id div 4").as("conv_id"),
        (col("doc_id") % 4).cast("int").as("turn_idx"),
        when(col("doc_id") % 17 === 0, lit("user"))
          .when(col("doc_id") % 2 === 0, lit("user"))
          .otherwise(lit("assistant")).as("role"),
        when(col("doc_id") % 23 === 0, lit(""))
          .otherwise(substring(col("text"), 1, 80)).as("text"),
        col("doc_id"))
    base.union(base.filter(col("doc_id") % 164 === 41))
      .drop("doc_id")
  }

  /** The synthesis above as a DuckDB CTE body (shared by all oracles). */
  private val turnsSql: String =
    """base AS (SELECT doc_id // 4 AS conv_id,
              CAST(doc_id % 4 AS INT) AS turn_idx,
              CASE WHEN doc_id % 17 = 0 THEN 'user'
                   WHEN doc_id % 2 = 0 THEN 'user'
                   ELSE 'assistant' END AS role,
              CASE WHEN doc_id % 23 = 0 THEN ''
                   ELSE substring(text, 1, 80) END AS text,
              doc_id
            FROM documents WHERE doc_id % 31 <> 0),
       turns AS (SELECT conv_id, turn_idx, role, text FROM base
                 UNION ALL
                 SELECT conv_id, turn_idx, role, text FROM base
                 WHERE doc_id % 164 = 41)"""

  /** Shared DuckDB CTE suffix for the TOKEN-space entries (x215–x218):
    * per-turn BPE symbol lists under the x157-trained 4-merge table —
    * `<|role|>` head + text symbols + `<|end|>` tail, empty text
    * contributing only the control tokens — and the deterministic
    * (count desc, sym asc) vocab id table over every symbol. Composes
    * after `bpeOracleCtes(4)` (which opens the WITH and trains m1..m4
    * on `documents`) and [[turnsSql]]. */
  private val chatTokSql: String =
    """tsym AS (SELECT conv_id, turn_idx, role,
                  CASE WHEN length(trim(text)) = 0 THEN NULL
                       ELSE array_to_string(list_transform(
                              string_split_regex(trim(text), '\s+'),
                              t -> array_to_string(list_transform(range(0, length(t)),
                                     i -> '·' || substr(t, i + 1, 1) || '·'), ' ')),
                            ' ·§· ')
                  END AS sym
                FROM turns),
       tap AS (SELECT conv_id, turn_idx, role,
                 replace(replace(replace(replace(sym,
                   coalesce((SELECT pair FROM m1), chr(1)),
                   coalesce((SELECT replace(pair, '· ·', '') FROM m1), '')),
                   coalesce((SELECT pair FROM m2), chr(1)),
                   coalesce((SELECT replace(pair, '· ·', '') FROM m2), '')),
                   coalesce((SELECT pair FROM m3), chr(1)),
                   coalesce((SELECT replace(pair, '· ·', '') FROM m3), '')),
                   coalesce((SELECT pair FROM m4), chr(1)),
                   coalesce((SELECT replace(pair, '· ·', '') FROM m4), '')) AS sym
               FROM tsym),
       tls AS (SELECT conv_id, turn_idx, role,
                 CASE WHEN sym IS NULL THEN ['<|' || role || '|>', '<|end|>']
                      ELSE ['<|' || role || '|>'] ||
                           list_filter(string_split(sym, ' '), x -> x <> '·§·') ||
                           ['<|end|>'] END AS syms
               FROM tap),
       cvoc AS (SELECT sym, count(*) AS cnt
                FROM (SELECT unnest(syms) AS sym FROM tls) GROUP BY sym),
       cvid AS (SELECT sym,
                  CAST(row_number() OVER (ORDER BY cnt DESC, sym) AS BIGINT) AS tok_id
                FROM cvoc)"""

  /** The per-turn token-range chain shared by x216/x217: cost and
    * exclusive prefix sum per conversation. */
  private val tokRangeSql: String =
    """tc AS (SELECT conv_id, turn_idx, role,
                CAST(len(syms) AS BIGINT) AS cost FROM tls),
       tr AS (SELECT conv_id, turn_idx, role, cost,
                COALESCE(CAST(sum(cost) OVER (PARTITION BY conv_id
                  ORDER BY turn_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) AS prev
              FROM tc)"""

  /** The md5 pack-plan + segment chain shared by x217/x218 (capacity
    * 48 token units — conversations run ~40–70 tokens, so most cross a
    * sequence boundary and the clipped-range path is exercised at every
    * SF). The x212 arithmetic with n = token cost. */
  private val tokSegSql: String =
    """lens AS (SELECT conv_id, CAST(sum(len(syms)) AS BIGINT) AS n
                FROM tls GROUP BY conv_id),
       k AS (SELECT conv_id, n,
               md5(CAST(conv_id AS VARCHAR) || ':42') AS okey
             FROM lens),
       cc AS (SELECT conv_id, n,
                CAST(COALESCE(sum(n) OVER (ORDER BY okey, conv_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cb
              FROM k),
       seg AS (SELECT conv_id, n, cb, cb // 48 AS ss,
                 cb % 48 AS so, u.s AS seq_id
               FROM cc, unnest(range(cb // 48, (cb + n - 1) // 48 + 1))
                 AS u(s)),
       segs AS (SELECT CAST(seq_id AS BIGINT) AS seq_id, conv_id,
                  CAST(CASE WHEN seq_id = ss THEN so
                       ELSE 0 END AS BIGINT) AS seq_off,
                  CAST(CASE WHEN seq_id = ss THEN 0
                       ELSE seq_id * 48 - cb END AS BIGINT) AS doc_off,
                  CAST(least(cb + n, (seq_id + 1) * 48)
                       - greatest(cb, seq_id * 48) AS BIGINT) AS seg_len
                FROM seg)"""

  val defs: Seq[QueryDef] = Seq(

    // x207 — conversation rendering: ordered turns → ONE training string
    // per conversation under the pinned <|role|>text<|end|> serialization
    // (the string the packer and the x209 spans index into). One hash
    // aggregate per conversation, per-group sort_array — no window, no
    // global sort except the output order. Duplicate-index rows are
    // byte-identical by synthesis, so tie order cannot change the bytes.
    QueryDef("x207_chat_render",
      (s, d) => Chat.renderConversations(synthTurns(s, d))
        .orderBy("conv_id"),
      Some(s"""WITH $turnsSql
               SELECT conv_id, count(*) AS n_turns,
                      CAST(length(string_agg('<|' || role || '|>' || text || '<|end|>',
                        '' ORDER BY turn_idx)) AS BIGINT) AS n_chars,
                      string_agg('<|' || role || '|>' || text || '<|end|>',
                        '' ORDER BY turn_idx) AS rendered
               FROM turns GROUP BY conv_id ORDER BY conv_id""")),

    // x208 — conversation shape verdicts: the gate between raw turn logs
    // and SFT training. Bookends via min_by/max_by on the turn index,
    // alternation via a conversation-keyed lag window, emptiness and
    // index uniqueness as plain aggregates — one shuffle on conv_id
    // total. The synthesis injects every violation class (see
    // synthTurns), so all five rules flip both ways at every SF.
    QueryDef("x208_chat_validate",
      (s, d) => Chat.validateConversations(synthTurns(s, d))
        .orderBy("conv_id"),
      Some(s"""WITH $turnsSql,
                 l AS (SELECT conv_id, turn_idx, role, text,
                         lag(role) OVER (PARTITION BY conv_id
                           ORDER BY turn_idx) AS prev_role
                       FROM turns)
               SELECT conv_id, count(*) AS n_turns,
                      min_by(role, turn_idx) = 'user' AS starts_user,
                      max_by(role, turn_idx) = 'assistant' AS ends_assistant,
                      count(CASE WHEN prev_role = role THEN 1 END) = 0 AS alternates,
                      count(CASE WHEN length(trim(text)) = 0 THEN 1 END) = 0 AS no_empty,
                      count(*) = count(DISTINCT turn_idx) AS unique_idx,
                      (min_by(role, turn_idx) = 'user'
                       AND max_by(role, turn_idx) = 'assistant'
                       AND count(CASE WHEN prev_role = role THEN 1 END) = 0
                       AND count(CASE WHEN length(trim(text)) = 0 THEN 1 END) = 0
                       AND count(*) = count(DISTINCT turn_idx)) AS valid
               FROM l GROUP BY conv_id ORDER BY conv_id""")),

    // x208b — streaming conversation-shape parity gate: replay the x208
    // turns through a REAL MemoryStream query into
    // StreamingOps.conversationMonitor in two chops with the DELIVERY
    // ORDER SHUFFLED (seeded) — the monitor recomputes verdicts from
    // accumulated per-conversation state, so arrival order must be
    // irrelevant by construction; the converged last emission per
    // conversation must equal the batch x208 frame. The x161b discipline
    // on the SFT surface, driver-visible. Replay runs on a cloned
    // session with pinned shuffle partitions (the replayMonitor
    // rationale: state-store rounds price per partition per chop).
    QueryDef("x208b_chat_stream_gate",
      (s, d) => {
        val expected = Chat.validateConversations(synthTurns(s, d))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
            r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
            r.getBoolean(6), r.getBoolean(7))).toSet
        val rows = synthTurns(s, d).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
            r.getString(3))).toSeq
        val shuffled = new scala.util.Random(11).shuffle(rows)
        // the replay runs on a cloned session scoped to this block so
        // its implicits never collide with the result-building session's
        val ok = {
          val ss = s.newSession()
          ss.conf.set("spark.sql.shuffle.partitions", "2")
          ss.conf.set("spark.sql.adaptive.enabled", "false")
          implicit val sq = ss.sqlContext
          import ss.implicits._
          val mem = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(Long, Int, String, String)]
          val acc = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean,
              Boolean)]
          val query = graft.streaming.StreamingOps.conversationMonitor(
              mem.toDF().toDF("conv_id", "turn_idx", "role", "text"))
            .writeStream
            .foreachBatch { (b: DataFrame, _: Long) =>
              val got = b.collect().map(r => (r.getLong(0), r.getLong(1),
                r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
                r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))
              acc.synchronized { acc ++= got }
              ()
            }
            .outputMode("append").start()
          try Seq(shuffled.take(shuffled.length / 3),
              shuffled.drop(shuffled.length / 3))
            .foreach { c => mem.addData(c); query.processAllAvailable() }
          finally query.stop()
          val last = acc.zipWithIndex.groupBy(_._1._1)
            .map { case (_, g) => g.maxBy(_._2)._1 }.toSet
          last == expected && expected.nonEmpty
        }
        import s.implicits._
        Seq(ok).toDF("chat_stream_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS chat_stream_ok")),

    // x209 — SFT loss-mask spans: 0-based character spans of each turn's
    // text inside the x207 rendered string, trainable = assistant. The
    // only window is the conversation-keyed rows-bounded cumsum of piece
    // lengths (dialog-length bounded — the x135 pack-plan discipline).
    // ChatSpec pins the substring invariant corpus-wide; here the oracle
    // recomputes the span arithmetic independently. Duplicate-index rows
    // tie in the cumsum frame, but their pieces are byte-identical so
    // the two possible prefix sums form the same row SET — the output
    // order (conv, idx, span_start) is total either way.
    QueryDef("x209_loss_mask_spans",
      (s, d) => Chat.lossMaskSpans(synthTurns(s, d))
        .orderBy("conv_id", "turn_idx", "span_start"),
      Some(s"""WITH $turnsSql,
                 p AS (SELECT conv_id, turn_idx, role, text,
                         CAST(length(role) + length(text) + 11 AS BIGINT) AS piece_len
                       FROM turns),
                 c AS (SELECT conv_id, turn_idx, role, text,
                         COALESCE(CAST(sum(piece_len) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS BIGINT), 0) AS prev
                       FROM p)
               SELECT conv_id, turn_idx, role,
                      prev + length(role) + 4 AS span_start,
                      prev + length(role) + 4 + length(text) AS span_end,
                      role = 'assistant' AS trainable
               FROM c ORDER BY conv_id, turn_idx, span_start""")),

    // x211 — crawl-frontier politeness waves: canonical URLs synthesized
    // from documents (7 hosts per source via doc_id mod), priority =
    // n_chars; within each host, rank by (priority desc, url) and cut
    // into waves of ≤3 — wave w is what a polite crawler fetches from
    // that host in round w. The only shuffle keys on host; the rank
    // window is host-partitioned (see Crawl.frontierWaves for the
    // mega-host posture). Full hash-match.
    QueryDef("x211_crawl_frontier",
      (s, d) => Crawl.frontierWaves(
        Tables.documents(s, d).select(
          concat(col("source"), (col("doc_id") % 7).cast("string"),
            lit(".example.com")).as("host"),
          concat(lit("https://"), col("source"),
            (col("doc_id") % 7).cast("string"),
            lit(".example.com/p/"), col("doc_id").cast("string")).as("url"),
          col("n_chars").as("prio")),
        perHostPerWave = 3)
        .orderBy("host", "host_rank"),
      Some("""WITH u AS (SELECT source || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
                       'https://' || source || CAST(doc_id % 7 AS VARCHAR) ||
                         '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
                       n_chars AS prio
                     FROM documents),
                 r AS (SELECT host, url, prio,
                         row_number() OVER (PARTITION BY host
                           ORDER BY prio DESC, url) AS host_rank
                       FROM u)
              SELECT host, url, prio, CAST(host_rank AS BIGINT) AS host_rank,
                     CAST((host_rank - 1) // 3 AS BIGINT) AS wave
              FROM r ORDER BY host, host_rank""")),

    // x213 — context-window trimming: per conversation, the longest
    // suffix of turns whose rendered cost fits a 200-char budget (the
    // drop-oldest-first chat-window policy; a turn is never split). One
    // conversation-keyed reverse running sum; the 200-char budget keeps
    // some-but-not-all turns of most conversations at every SF, so the
    // kept flag flips both ways on the hash path. text is dropped from
    // the output (suffix_cost pins it transitively via piece lengths).
    QueryDef("x213_chat_window_trim",
      (s, d) => graft.ext.Chat.trimToBudget(synthTurns(s, d), budget = 200L)
        .drop("text")
        .orderBy("conv_id", "turn_idx", "suffix_cost"),
      Some(s"""WITH $turnsSql,
                 p AS (SELECT conv_id, turn_idx, role,
                         CAST(length(role) + length(text) + 11 AS BIGINT) AS piece_len
                       FROM turns),
                 c AS (SELECT conv_id, turn_idx, role,
                         CAST(sum(piece_len) OVER (PARTITION BY conv_id
                           ORDER BY turn_idx DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS BIGINT) AS suffix_cost
                       FROM p)
               SELECT conv_id, turn_idx, role, suffix_cost,
                      suffix_cost <= 200 AS kept
               FROM c ORDER BY conv_id, turn_idx, suffix_cost""")),

    // x212 — packed SFT with loss masks: the x209 spans carried THROUGH
    // the x135 packer in character space — per packed sequence, the
    // trainable [start,end) ranges a fixed-shape dataloader masks loss
    // with. Conversations pack by rendered length (sum of piece lengths,
    // never materializing strings), spans intersect their
    // (sequence, slice) segments and shift into sequence coordinates; a
    // span cut by a sequence boundary yields one clipped row per side
    // (capacity 256 forces many such cuts at every SF). The oracle
    // replays the whole composition — x209's span cumsum, x135's
    // md5-keyed two-phase pack arithmetic, x136's segment explode, the
    // interval intersection — as one DuckDB chain.
    QueryDef("x212_chat_packed_masks",
      (s, d) => Chat.packedLossMasks(synthTurns(s, d), capacity = 256L)
        .orderBy("seq_id", "conv_id", "turn_idx", "seq_start"),
      Some(s"""WITH $turnsSql,
                 p AS (SELECT conv_id, turn_idx, role, text,
                         CAST(length(role) + length(text) + 11 AS BIGINT) AS piece_len
                       FROM turns),
                 c AS (SELECT conv_id, turn_idx, role, text, piece_len,
                         COALESCE(CAST(sum(piece_len) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS BIGINT), 0) AS prev
                       FROM p),
                 spans AS (SELECT conv_id, turn_idx,
                             prev + length(role) + 4 AS span_start,
                             prev + length(role) + 4 + length(text) AS span_end
                           FROM c WHERE role = 'assistant'),
                 lens AS (SELECT conv_id, CAST(sum(piece_len) AS BIGINT) AS n
                          FROM p GROUP BY conv_id),
                 k AS (SELECT conv_id, n,
                         md5(CAST(conv_id AS VARCHAR) || ':42') AS okey
                       FROM lens),
                 cc AS (SELECT conv_id, n,
                          CAST(COALESCE(sum(n) OVER (ORDER BY okey, conv_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS cb
                        FROM k),
                 seg AS (SELECT conv_id, n, cb, cb // 256 AS ss,
                           cb % 256 AS so, u.s AS seq_id
                         FROM cc, unnest(range(cb // 256,
                                               (cb + n - 1) // 256 + 1))
                           AS u(s)),
                 segs AS (SELECT CAST(seq_id AS BIGINT) AS seq_id, conv_id,
                            CAST(CASE WHEN seq_id = ss THEN so
                                 ELSE 0 END AS BIGINT) AS seq_off,
                            CAST(CASE WHEN seq_id = ss THEN 0
                                 ELSE seq_id * 256 - cb END AS BIGINT) AS doc_off,
                            CAST(least(cb + n, (seq_id + 1) * 256)
                                 - greatest(cb, seq_id * 256) AS BIGINT) AS seg_len
                          FROM seg)
               SELECT g.seq_id, g.conv_id, sp.turn_idx,
                      g.seq_off + greatest(sp.span_start, g.doc_off)
                        - g.doc_off AS seq_start,
                      g.seq_off + least(sp.span_end, g.doc_off + g.seg_len)
                        - g.doc_off AS seq_end
               FROM segs g JOIN spans sp USING (conv_id)
               WHERE greatest(sp.span_start, g.doc_off)
                     < least(sp.span_end, g.doc_off + g.seg_len)
               ORDER BY seq_id, conv_id, turn_idx, seq_start""")),

    // x215 — conversation TOKEN-ID stream: the x209/x212 chat family
    // composed with the x157 BPE tokenizer. Each turn encodes as one
    // <|role|> control token + the text's BPE symbols under the shared
    // 4-merge table + one <|end|> control token; ids come from the
    // deterministic (count desc, sym asc) vocab over the whole chat
    // corpus (control markers included — they can never collide with
    // trained symbols, which stay ·-wrapped). Positions are the
    // conversation-keyed cumsum of turn costs. The oracle replays the
    // ENTIRE chain — BPE training on documents, per-turn merge
    // application, vocab ranking, position arithmetic — in DuckDB (the
    // x121/x157 whole-loop hash discipline). Output sampled to
    // conv_id % 25 (the x157 rationale: the full stream is
    // corpus-token-sized); vocab and positions are computed over the
    // FULL corpus either way.
    QueryDef("x215_chat_token_ids",
      (s, d) => Chat.encodeConversations(synthTurns(s, d),
        bpeMergesShared(s, d))
        .filter(col("conv_id") % 25 === 0)
        .orderBy("conv_id", "pos"),
      Some(s"""${bpeOracleCtes(4)},
               $turnsSql,
               $chatTokSql,
               tbase AS (SELECT conv_id, turn_idx, syms,
                           COALESCE(CAST(sum(len(syms)) OVER (
                             PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                             AS BIGINT), 0) AS base
                         FROM tls),
               enc AS (SELECT conv_id, base + i AS pos, syms[i + 1] AS sym
                       FROM tbase, unnest(range(0, len(syms))) AS u(i))
               SELECT enc.conv_id, CAST(enc.pos AS BIGINT) AS pos, cvid.tok_id
               FROM enc JOIN cvid USING (sym)
               WHERE enc.conv_id % 25 = 0
               ORDER BY conv_id, pos""")),

    // x216 — TOKEN-space loss masks: x209's spans in the unit a trainer
    // actually consumes. One row per turn with [tok_start, tok_end)
    // covering exactly the turn's TEXT tokens inside the x215 stream
    // (tok_start skips the <|role|> control token; control tokens are
    // context, mirroring the character-space contract). Same single
    // conversation-keyed cumsum window; the oracle recomputes the token
    // costs from the replayed merge table.
    QueryDef("x216_chat_token_masks",
      (s, d) => Chat.tokenLossMasks(synthTurns(s, d), bpeMergesShared(s, d))
        .orderBy("conv_id", "turn_idx", "tok_start"),
      Some(s"""${bpeOracleCtes(4)},
               $turnsSql,
               $chatTokSql,
               $tokRangeSql
               SELECT conv_id, turn_idx, role, prev + 1 AS tok_start,
                      prev + cost - 1 AS tok_end,
                      role = 'assistant' AS trainable
               FROM tr ORDER BY conv_id, turn_idx, tok_start""")),

    // x217 — packed TOKEN masks: the x212 packer run in TOKEN units
    // (packPlan lengthCol = per-conversation token cost, capacity 48)
    // emitting per-sequence trainable token ranges — the mask artifact
    // matching x218's packed id sequences. A range cut by a sequence
    // boundary yields one clipped row per side (capacity 48 vs ~40–70
    // token conversations forces cuts at every SF). The oracle replays
    // BPE train + token costs + the md5 two-phase pack + the interval
    // intersection as one chain.
    QueryDef("x217_chat_packed_token_masks",
      (s, d) => Chat.packedTokenMasks(synthTurns(s, d),
        bpeMergesShared(s, d), capacity = 48L)
        .orderBy("seq_id", "conv_id", "turn_idx", "seq_start"),
      Some(s"""${bpeOracleCtes(4)},
               $turnsSql,
               $chatTokSql,
               $tokRangeSql,
               spans AS (SELECT conv_id, turn_idx, prev + 1 AS tok_start,
                           prev + cost - 1 AS tok_end
                         FROM tr WHERE role = 'assistant'
                           AND cost > 2),
               $tokSegSql
               SELECT g.seq_id, g.conv_id, sp.turn_idx,
                      g.seq_off + greatest(sp.tok_start, g.doc_off)
                        - g.doc_off AS seq_start,
                      g.seq_off + least(sp.tok_end, g.doc_off + g.seg_len)
                        - g.doc_off AS seq_end
               FROM segs g JOIN spans sp USING (conv_id)
               WHERE greatest(sp.tok_start, g.doc_off)
                     < least(sp.tok_end, g.doc_off + g.seg_len)
               ORDER BY seq_id, conv_id, turn_idx, seq_start""")),

    // x218 — packed TOKEN-ID sequences: the training shard itself.
    // Every conversation's x215 id stream lands at its x217 segments'
    // sequence coordinates — (seq_id, pos, tok_id) with pos tiling
    // [0, 48) in every full sequence. The conv-keyed join is bounded on
    // both sides (tokens ≤ dialog token count, segments ≤ n/48 + 1 per
    // conversation). Output sampled to seq_id % 25 (corpus-token-sized
    // otherwise); the pack plan, vocab, and positions are computed over
    // the FULL corpus.
    QueryDef("x218_chat_packed_token_ids",
      (s, d) => Chat.packedTokenIds(synthTurns(s, d),
        bpeMergesShared(s, d), capacity = 48L)
        .filter(col("seq_id") % 25 === 0)
        .orderBy("seq_id", "pos"),
      Some(s"""${bpeOracleCtes(4)},
               $turnsSql,
               $chatTokSql,
               $tokSegSql,
               tbase AS (SELECT conv_id, turn_idx, syms,
                           COALESCE(CAST(sum(len(syms)) OVER (
                             PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                             AS BIGINT), 0) AS base
                         FROM tls),
               enc AS (SELECT conv_id, base + i AS pos, syms[i + 1] AS sym
                       FROM tbase, unnest(range(0, len(syms))) AS u(i))
               SELECT g.seq_id,
                      CAST(g.seq_off + enc.pos - g.doc_off AS BIGINT) AS pos,
                      cvid.tok_id
               FROM enc JOIN cvid USING (sym) JOIN segs g USING (conv_id)
               WHERE enc.pos >= g.doc_off AND enc.pos < g.doc_off + g.seg_len
                 AND g.seq_id % 25 = 0
               ORDER BY seq_id, pos""")),

    // x219 — conversation-level dedup: x01's exact dedup run over the
    // x207 rendered strings. SFT corpora duplicate whole conversations
    // with trivial drift — here every 13th conversation reappears with
    // conv_id offset by 1e6 and turn indexes shifted by 10, which
    // renders BYTE-IDENTICALLY (rendering depends on turn ORDER, not
    // index values), so those clusters dedup together at every SF
    // (keep_id = the original, n_copies = 2). A composition, not a new
    // miner: renderConversations → sha2 groupBy.
    QueryDef("x219_conv_dedup",
      (s, d) => {
        val t = synthTurns(s, d)
        val shifted = t.filter(col("conv_id") % 13 === 0)
          .select((col("conv_id") + lit(1000000L)).as("conv_id"),
            (col("turn_idx") + lit(10)).cast("int").as("turn_idx"),
            col("role"), col("text"))
        Dedup.exactDedup(
          Chat.renderConversations(t.union(shifted)), "rendered", "conv_id")
          .orderBy("keep_id")
      },
      Some(s"""WITH $turnsSql,
                 allt AS (SELECT conv_id, turn_idx, role, text FROM turns
                          UNION ALL
                          SELECT conv_id + 1000000,
                                 CAST(turn_idx + 10 AS INT), role, text
                          FROM turns WHERE conv_id % 13 = 0),
                 r AS (SELECT conv_id,
                         string_agg('<|' || role || '|>' || text || '<|end|>',
                           '' ORDER BY turn_idx) AS rendered
                       FROM allt GROUP BY conv_id)
               SELECT min(conv_id) AS keep_id, count(*) AS n_copies
               FROM r GROUP BY rendered ORDER BY keep_id""")),

    // x220 — WARC revisit ingest: the crawler's OWN dup signal as rows.
    // A crawl export where every doc_id ≡ 1 (mod 4) also emits a
    // `revisit` record re-fetching doc_id−1 (writeWarcShards
    // revisitOfCol; Common Crawl identical-payload-digest profile) —
    // read back SPLIT BY KIND: readWarcShards must see only responses,
    // readWarcRevisits surfaces (key, url, refers_to) rows, exactly the
    // incoming→canonical pair shape x77/x89 consume. Output: per source,
    // response count, revisit count, and the count of revisits whose
    // refers_to round-tripped to the expected target key (n_refers_ok ≡
    // n_revisit on the hash path — a flipped refers-to fails the
    // oracle). One record's headers in memory at a time on both read
    // paths; the revisit scan allocates zero payload bytes.
    QueryDef("x220_warc_revisit_stats",
      (s, d) => {
        val dir = ExtShared.exportScratchDir(d, "x220-revisit")
        val docs = Tables.documents(s, d)
        val responses = docs.select(
          concat(lit("doc-"),
            lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
          concat(lit("https://"), col("source"), lit(".example.com/d"),
            col("doc_id").cast("string")).as("url"),
          lit(200).cast("int").as("status"),
          lit("text/html").as("mime"),
          encode(substring(col("text"), 1, 48), "UTF-8").as("payload"),
          (col("doc_id") % 8).cast("int").as("shard"),
          lit(null).cast("string").as("revisit_of"))
        val revisits = docs.filter(col("doc_id") % 4 === 1).select(
          concat(lit("rev-"),
            lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
          concat(lit("https://"), col("source"), lit(".example.com/d"),
            (col("doc_id") - 1).cast("string")).as("url"),
          lit(0).cast("int").as("status"),
          lit("").as("mime"),
          lit(null).cast("binary").as("payload"),
          (col("doc_id") % 8).cast("int").as("shard"),
          concat(lit("doc-"),
            lpad((col("doc_id") - 1).cast("string"), 12, "0"))
            .as("revisit_of"))
        val counts = graft.ext.Export.writeWarcShards(
          responses.unionByName(revisits), dir, compression = "gzip",
          revisitOfCol = Some("revisit_of"))
        require(counts.values.sum > 0, "x220: empty export")
        val resp = graft.ext.Export.readWarcShards(s, dir,
          columns = Seq("url"))
          .select(regexp_extract(col("url"), "https://([^.]+)\\.example", 1)
            .as("source"))
          .groupBy("source").agg(count(lit(1)).as("n_response"))
        val rev = graft.ext.Export.readWarcRevisits(s, dir)
          .select(regexp_extract(col("url"), "https://([^.]+)\\.example", 1)
            .as("source"),
            (col("refers_to") === concat(lit("doc-"),
              lpad((expr("CAST(substring(key, 5, 12) AS BIGINT)") - 1)
                .cast("string"), 12, "0"))).cast("long").as("ok"))
          .groupBy("source").agg(count(lit(1)).as("n_revisit"),
            sum(col("ok")).as("n_refers_ok"))
        resp.join(rev, Seq("source"), "left")
          .select(col("source"), col("n_response"),
            coalesce(col("n_revisit"), lit(0L)).as("n_revisit"),
            coalesce(col("n_refers_ok"), lit(0L)).as("n_refers_ok"))
          .orderBy("source")
      },
      Some("""WITH r AS (SELECT source, count(*) AS n_response
                         FROM documents GROUP BY source),
                   v AS (SELECT source, count(*) AS n_revisit
                         FROM documents WHERE doc_id % 4 = 1 GROUP BY source)
              SELECT r.source, r.n_response,
                     COALESCE(v.n_revisit, 0) AS n_revisit,
                     COALESCE(v.n_revisit, 0) AS n_refers_ok
              FROM r LEFT JOIN v USING (source) ORDER BY source""")),

    // x220b — streaming revisit-ingest parity gate: the x202b/x210b
    // discipline on the revisit reader, completing the rule that EVERY
    // container read path has a driver-visible stream gate. Re-read the
    // x220 export's revisit records through a REAL file-source streaming
    // query (readWarcRevisitStream: checkpointed path-only binaryFile
    // tracking + the revisit parser) in ≥2 micro-batches and assert the
    // streamed record set equals the batch readWarcRevisits read.
    QueryDef("x220b_revisit_stream_gate",
      (s, d) => {
        import s.implicits._
        // reuse the x220 scratch export — build it if this entry runs
        // first (same deterministic writer either way)
        val dir = ExtShared.exportScratchDir(d, "x220b-revisit")
        val docs = Tables.documents(s, d)
        val responses = docs.filter(col("doc_id") % 2 === 0).select(
          concat(lit("doc-"),
            lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
          concat(lit("https://"), col("source"), lit(".example.com/d"),
            col("doc_id").cast("string")).as("url"),
          lit(200).cast("int").as("status"),
          lit("text/html").as("mime"),
          encode(substring(col("text"), 1, 32), "UTF-8").as("payload"),
          (col("doc_id") % 4).cast("int").as("shard"),
          lit(null).cast("string").as("revisit_of"))
        val revisits = docs.filter(col("doc_id") % 4 === 1).select(
          concat(lit("rev-"),
            lpad(col("doc_id").cast("string"), 12, "0")).as("key"),
          concat(lit("https://"), col("source"), lit(".example.com/d"),
            (col("doc_id") - 1).cast("string")).as("url"),
          lit(0).cast("int").as("status"),
          lit("").as("mime"),
          lit(null).cast("binary").as("payload"),
          (col("doc_id") % 4).cast("int").as("shard"),
          concat(lit("doc-"),
            lpad((col("doc_id") - 1).cast("string"), 12, "0"))
            .as("revisit_of"))
        graft.ext.Export.writeWarcShards(
          responses.unionByName(revisits), dir, compression = "gzip",
          revisitOfCol = Some("revisit_of"))
        def keyOf(r: org.apache.spark.sql.Row) =
          (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
        val expected = graft.ext.Export.readWarcRevisits(s, dir)
          .select(col("key"), col("url"), col("refers_to"), col("profile"))
          .collect().map(keyOf).toSet
        val acc = scala.collection.mutable.Set
          .empty[(String, String, String, String)]
        val q = graft.ext.Export.readWarcRevisitStream(s, dir,
            options = Map("maxFilesPerTrigger" -> "2")).writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            val got = b.select(col("key"), col("url"), col("refers_to"),
              col("profile")).collect().map(keyOf)
            acc.synchronized { acc ++= got }
            ()
          }
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        Seq(acc.toSet == expected && expected.nonEmpty)
          .toDF("revisit_stream_ok")
      },
      Some("SELECT CAST(1 AS BOOLEAN) AS revisit_stream_ok")),

    // x223 — the TRAINING SHARD ON DISK, end to end: x218's packed
    // token-id sequences grouped into per-sequence int64 arrays, written
    // through the TFRecord export (real tf.train.Example framing, masked
    // CRC32C, manifest digest gates), read back, re-exploded, and the
    // READ-BACK is what gets hashed — against x218's own whole-chain
    // oracle (the container round trip is identity, so the same SQL
    // adjudicates; a proto encode bug, a CRC drift, a lost sequence, or
    // any upstream tokenizer/pack drift fails one hash). This is the
    // repo's full story on one row: raw turns → BPE → vocab → pack →
    // dataloader-format shard → bytes → back.
    QueryDef("x223_token_shard_roundtrip",
      (s, d) => {
        val dir = ExtShared.exportScratchDir(d, "x223-tokshard")
        val packed = Chat.packedTokenIds(synthTurns(s, d),
          bpeMergesShared(s, d), capacity = 48L)
        val seqs = packed
          .groupBy(col("seq_id"))
          .agg(array_sort(collect_list(struct(col("pos"), col("tok_id"))))
            .as("ps"))
          .select(col("seq_id"),
            transform(col("ps"), x => x.getField("tok_id")).as("tok_ids"),
            (col("seq_id") % 8).cast("int").as("shard"))
        val counts = graft.ext.Export.writeTfrecordShards(seqs, dir,
          compression = "gzip")
        require(counts.values.sum > 0, "x223: empty shard export")
        graft.ext.Export.readTfrecordShards(s, dir)
          .select(col("seq_id"),
            posexplode(col("tok_ids")).as(Seq("pos", "tok_id")))
          .filter(col("seq_id") % 25 === 0)
          .select(col("seq_id"), col("pos").cast("long").as("pos"),
            col("tok_id"))
          .orderBy("seq_id", "pos")
      },
      Some(s"""${bpeOracleCtes(4)},
               $turnsSql,
               $chatTokSql,
               $tokSegSql,
               tbase AS (SELECT conv_id, turn_idx, syms,
                           COALESCE(CAST(sum(len(syms)) OVER (
                             PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                             AS BIGINT), 0) AS base
                         FROM tls),
               enc AS (SELECT conv_id, base + i AS pos, syms[i + 1] AS sym
                       FROM tbase, unnest(range(0, len(syms))) AS u(i))
               SELECT g.seq_id,
                      CAST(g.seq_off + enc.pos - g.doc_off AS BIGINT) AS pos,
                      cvid.tok_id
               FROM enc JOIN cvid USING (sym) JOIN segs g USING (conv_id)
               WHERE enc.pos >= g.doc_off AND enc.pos < g.doc_off + g.seg_len
                 AND g.seq_id % 25 = 0
               ORDER BY seq_id, pos""")))
}
