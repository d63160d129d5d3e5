package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application, run in-engine
  * (Sennrich/Haddow/Birch, "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016 — the standard LLM tokenizer-training loop).
  *
  * Scale shape: the ONLY corpus-sized pass is the token-type count
  * (`vocabSyms`); every training iteration is a job over the |V|-row vocab
  * frame (pair count → argmax → apply merge), so training cost is
  * independent of corpus token count — the property that makes in-engine
  * BPE training viable at 100 TB (|V| stays ~millions however many
  * trillions of occurrences the corpus holds). The argmax collect is one
  * row per iteration; the running symbol frame is persisted per iteration
  * and its predecessor released, so the `replace` chain never recomputes
  * from scratch.
  *
  * Symbol sequences are space-joined (tokens are whitespace-split, so no
  * symbol contains a space); a merge "s1 s2" applies as the literal
  * left-to-right non-overlapping `replace("s1 s2" → "s1s2")` — exactly the
  * simultaneous merge the reference BPE implementation performs, and
  * identical string semantics in Spark and DuckDB, which is what lets the
  * catalog entries hash-match an unrolled SQL oracle (x121/x122).
  *
  * Determinism: merge choice is the total order (count desc, pair asc);
  * ties cannot fork across engines or runs.
  */
object Bpe {

  /** The occurrence-weighted token-type vocabulary with each type's
    * initial symbol sequence (space-joined characters). */
  private def vocabSyms(docs: DataFrame, textCol: String): DataFrame =
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), charSplit(col("tok")).as("sym"))

  /** Space-joined character sequence of a string column. */
  private def charSplit(t: Column): Column =
    concat_ws(" ", transform(sequence(lit(0), length(t) - lit(1)),
      i => t.substr(i + lit(1), lit(1))))

  /** Adjacent symbol pairs of a symbol frame, occurrence-weighted. */
  private def pairCounts(syms: DataFrame): DataFrame =
    syms
      .select(col("cnt"), split(col("sym"), " ").as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ss")) - lit(2)),
        i => concat_ws(" ", element_at(col("ss"), i + lit(1)),
          element_at(col("ss"), i + lit(2))))).as("pair"),
        col("cnt"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))

  /** One merge applied to a symbol-sequence column: literal left-to-right
    * non-overlapping replace of "s1 s2" with "s1s2". */
  private def applyOne(sym: Column, pair: String): Column =
    call_function("replace", sym, lit(pair), lit(pair.replace(" ", "")))

  /** Train `nMerges` BPE merges. Returns the merge table in merge order —
    * each entry the space-separated symbol pair ("e r", then "m er", ...).
    * Stops early when no pair remains (vocabulary fully merged). */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[String] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var syms = vocabSyms(docs, textCol).persist()
    try {
      var i = 0
      var done = false
      while (i < nMerges && !done) {
        val top = pairCounts(syms)
          .orderBy(col("n").desc, col("pair")).limit(1)
          .select(col("pair")).collect()
        if (top.isEmpty) done = true
        else {
          val pair = top.head.getString(0)
          merges += pair
          val next = syms
            .withColumn("sym", applyOne(col("sym"), pair))
            .persist()
          next.count() // materialize before releasing the predecessor
          syms.unpersist()
          syms = next
        }
        i += 1
      }
      merges.toSeq
    } finally syms.unpersist()
  }

  /** Apply a merge table to a token-array column: ONE map-side projection
    * chaining the merges as nested literal replaces over the space-joined
    * character sequence — no shuffle, whatever the corpus size. Token
    * boundaries are preserved by joining tokens with the "§" sentinel
    * symbol: a trained merge never contains "§" (training is per-token),
    * so merges cannot cross token boundaries. (A corpus whose tokens
    * themselves contain "§" would need a wider sentinel; the fixture —
    * and any whitespace-tokenized ASCII corpus — cannot.) */
  def applyMerges(tokens: Column, merges: Seq[String]): Column = {
    val spaced = concat_ws(" § ", transform(tokens, t => charSplit(t)))
    merges.foldLeft(spaced)((acc, p) => applyOne(acc, p))
  }

  /** Per-document token count under a trained BPE tokenizer: the symbol
    * count of the merged sequence, separators excluded — the fertility
    * figure ("how many tokens will MY tokenizer produce on this corpus")
    * that drives training-cost and token-budget estimates (x70's
    * fixed-tokenizer fertility, under the LEARNED tokenizer instead). */
  def bpeTokenCount(tokens: Column, merges: Seq[String]): Column =
    size(filter(split(applyMerges(tokens, merges), " "), s => s =!= "§"))
}
