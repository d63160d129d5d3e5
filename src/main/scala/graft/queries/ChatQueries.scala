package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Chat, Crawl}

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
               ORDER BY seq_id, conv_id, turn_idx, seq_start""")))
}
