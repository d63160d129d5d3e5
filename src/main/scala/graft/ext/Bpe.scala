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
  * Symbol representation: every symbol is WRAPPED in "·" markers and
  * symbols are space-joined — "the" starts as "·t· ·h· ·e·". A merge
  * (s1, s2) applies as the literal left-to-right non-overlapping
  * `replace("·s1· ·s2·" → "·s1s2·")`. The wrapping is what makes a plain
  * string replace EXACTLY the reference whole-symbol merge: the pattern
  * is anchored to both symbols' own start and end markers, so s1 cannot
  * match the SUFFIX of a longer merged symbol (after merging (h,e),
  * "·t· ·he·" does NOT match pattern "·t· ·h·"), and because each symbol
  * owns its delimiters — no shared separator is consumed — consecutive
  * occurrences all merge in one pass ("·a· ·a· ·a· ·a·" → "·aa· ·aa·",
  * the reference's simultaneous left-to-right behavior). Identical
  * literal-replace semantics in Spark and DuckDB are what let the
  * catalog entries hash-match an unrolled SQL oracle (x121/x122). The
  * marker must not occur in corpus tokens (any whitespace-tokenized
  * ASCII corpus qualifies; a corpus containing "·" needs a different
  * sentinel).
  *
  * Determinism: merge choice is the total order (count desc, DISPLAY
  * pair asc — the marker-stripped form, matching reference BPE's
  * ordering); ties cannot fork across engines or runs.
  */
object Bpe {

  /** The occurrence-weighted token-type vocabulary with each type's
    * initial symbol sequence (space-joined wrapped characters). */
  private def vocabSyms(docs: DataFrame, textCol: String): DataFrame =
    Par.fanOutScan(docs, col(textCol))
      .filter(length(trim(col(textCol))) > 0)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      // Sentinel guard: a token containing the symbol marker '·' or the
      // boundary sentinel '§' would silently corrupt merge training and
      // every downstream applyMerges/bpeTokenCount. raise_error makes the
      // corpus-contract violation loud at the one place every training
      // pass already reads each token type — a |V|-level check, free next
      // to the charSplit transform on the same row.
      .select(col("cnt"),
        when(col("tok").rlike("[·§]"),
          raise_error(concat(lit("graft.ext.Bpe: token contains reserved " +
            "sentinel '·' or '§' — retokenize or substitute sentinels: "),
            col("tok"))))
          .otherwise(charSplit(col("tok"))).as("sym"))

  /** Space-joined wrapped-character sequence of a string column:
    * "ab" → "·a· ·b·". */
  private def charSplit(t: Column): Column =
    concat_ws(" ", transform(sequence(lit(0), length(t) - lit(1)),
      i => concat(lit("·"), t.substr(i + lit(1), lit(1)), lit("·"))))

  /** Adjacent symbol pairs of a symbol frame, occurrence-weighted. Pair
    * keys stay in wrapped form ("·a· ·b·") — [[applyOne]] consumes them
    * verbatim; [[display]] strips the markers for the public merge
    * table. */
  private def pairCounts(syms: DataFrame): DataFrame =
    syms
      .select(col("cnt"), split(col("sym"), " ").as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ss")) - lit(2)),
        i => concat_ws(" ", element_at(col("ss"), i + lit(1)),
          element_at(col("ss"), i + lit(2))))).as("pair"),
        col("cnt"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))

  /** Wrapped pair → merged wrapped symbol: "·s1· ·s2·" → "·s1s2·" (the
    * only "· ·" in a wrapped pair is the junction — symbols contain
    * neither markers nor spaces). */
  private def merged(pair: String): String = pair.replace("· ·", "")

  /** Display form of a wrapped pair: "·s1· ·s2·" → "s1 s2". */
  private def display(pair: String): String = pair.replace("·", "")

  /** Display pair → wrapped pattern: "s1 s2" → "·s1· ·s2·" (symbols never
    * contain spaces, so the single space splits unambiguously). */
  private def wrapped(displayPair: String): String = {
    val Array(s1, s2) = displayPair.split(' ')
    s"·${s1}· ·${s2}·"
  }

  /** One merge applied to a symbol-sequence column: literal left-to-right
    * non-overlapping whole-symbol replace (see the object scaladoc for
    * why the wrapping makes this exact). */
  private def applyOne(sym: Column, wrappedPair: String): Column =
    call_function("replace", sym, lit(wrappedPair), lit(merged(wrappedPair)))

  /** Train `nMerges` BPE merges. Returns the merge table in merge order,
    * in display form — each entry the space-separated symbol pair
    * ("e r", then "m er", ...). Stops early when no pair remains
    * (vocabulary fully merged). */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[String] =
    trainWithCurve(docs, textCol, nMerges)._1

  /** [[train]] plus the compression curve it implies: element `i` of the
    * second result is the corpus token total after the first `i` merges
    * (element 0 = character count). Each point is a |V|-row aggregate over
    * the training chain's already-persisted vocab frame (Σ cnt · symbols
    * per type — merges never cross token boundaries, so the type-table
    * total equals the corpus-apply total), NOT a corpus scan: the curve
    * costs nothing extra at any corpus size, where re-deriving it by
    * applying merge prefixes to every document would cost one corpus pass
    * per prefix. BpeSpec pins type-table ≡ corpus-apply equality. */
  def trainWithCurve(docs: DataFrame, textCol: String,
                     nMerges: Int): (Seq[String], Seq[Long]) = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    val curve = scala.collection.mutable.ArrayBuffer.empty[Long]
    def total(frame: DataFrame): Long = frame
      .agg(coalesce(sum(col("cnt") * size(split(col("sym"), " "))), lit(0L)))
      .head().getLong(0)
    var syms = vocabSyms(docs, textCol).persist()
    try {
      curve += total(syms)
      var i = 0
      var done = false
      while (i < nMerges && !done) {
        // tie order on the DISPLAY pair, not the wrapped form: "·" sorts
        // above ASCII, so wrapped-form ordering would invert ties between
        // prefix-related candidates and fork from reference BPE (BpeSpec's
        // localBpe orders display pairs)
        val top = pairCounts(syms)
          .orderBy(col("n").desc, translate(col("pair"), "·", ""))
          .limit(1).select(col("pair")).collect()
        if (top.isEmpty) done = true
        else {
          val pair = top.head.getString(0)
          merges += display(pair)
          val next = syms
            .withColumn("sym", applyOne(col("sym"), pair))
            .persist()
          // the curve aggregate doubles as the materializer: one |V|-row
          // job both caches the new frame and measures it, before the
          // predecessor is released
          curve += total(next)
          syms.unpersist()
          syms = next
        }
        i += 1
      }
      (merges.toSeq, curve.toSeq)
    } finally syms.unpersist()
  }

  /** Apply a merge table (display form, as [[train]] returns) to a
    * token-array column: ONE map-side projection chaining the merges as
    * nested literal replaces over the wrapped symbol sequence — no
    * shuffle, whatever the corpus size. Token boundaries are preserved by
    * joining tokens with the "·§·" sentinel symbol: a trained merge never
    * contains "§" (training is per-token), so merges cannot cross token
    * boundaries. (A corpus whose tokens contain "§" or "·" would need
    * different sentinels; the fixture — and any whitespace-tokenized
    * ASCII corpus — cannot.) */
  def applyMerges(tokens: Column, merges: Seq[String]): Column = {
    val spaced = concat_ws(" ·§· ", transform(tokens, t => charSplit(t)))
    merges.foldLeft(spaced)((acc, p) => applyOne(acc, wrapped(p)))
  }

  /** Per-document token count under a trained BPE tokenizer: the symbol
    * count of the merged sequence, separators excluded — the fertility
    * figure ("how many tokens will MY tokenizer produce on this corpus")
    * that drives training-cost and token-budget estimates (x70's
    * fixed-tokenizer fertility, under the LEARNED tokenizer instead).
    * An empty token array counts 0 (guarded — a split of the empty
    * string would otherwise yield one phantom empty symbol). */
  def bpeTokenCount(tokens: Column, merges: Seq[String]): Column =
    when(size(tokens) === 0, lit(0)).otherwise(
      size(filter(split(applyMerges(tokens, merges), " "), s => s =!= "·§·")))

  /** DECODE a token-id stream back to text — the inverse of the x157
    * encode, and the integrity check a training shard wants before it
    * ships: ids + vocab must preserve every character in order. `enc` is
    * the encode output (`idCol`, `pos`, `tok_id`); `vocab` the id table
    * (`sym`, `tok_id`). Per doc: ids join back to their symbols
    * (broadcast — the vocab is |V|-sized by construction), positions
    * sort INSIDE the collected array (array_sort on (pos, sym) structs —
    * no window, no single partition), wrappers strip off. Word
    * boundaries are not represented in the id stream (the `·§·`
    * separators are dropped at encode, like a boundary-markerless
    * tokenizer), so the decode reconstructs the WHITESPACE-STRIPPED
    * text: decode(encode(text)) = concat of text's tokens — exactly what
    * the x206 oracle pins. */
  def decodeIds(enc: DataFrame, vocab: DataFrame,
                idCol: String = "doc_id"): DataFrame =
    enc.join(broadcast(vocab.select(col("tok_id"), col("sym"))), "tok_id")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("sym"))))
        .as("seq"))
      .select(col(idCol),
        translate(
          array_join(transform(col("seq"), t => t.getField("sym")), ""),
          "·", "").as("decoded"))
}
