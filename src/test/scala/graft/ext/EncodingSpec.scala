package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Utf8Data

/** Fixtures for the crawl-encoding stage: the strict invalid-UTF-8 byte
  * table, and cp1252/latin1 double-encoding detection + repair with its
  * passthrough guarantees. */
class EncodingSpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("invalidBytes: strict table over the classic fixtures") {
    // clean: ASCII, 2/3/4-byte sequences (é, €, emoji)
    assert(Utf8Data.invalidBytes("hello".getBytes("UTF-8")) === 0)
    assert(Utf8Data.invalidBytes("héllo €".getBytes("UTF-8")) === 0)
    assert(Utf8Data.invalidBytes(bytes(0xF0, 0x9F, 0x92, 0x96)) === 0)
    assert(Utf8Data.invalidBytes(Array.emptyByteArray) === 0)
    // truncated multibyte at EOF: every byte of the broken tail counts
    // (the lead, then its stranded continuation as an orphan)
    assert(Utf8Data.invalidBytes(bytes(0xC3)) === 1)
    assert(Utf8Data.invalidBytes(bytes('a', 0xE2, 0x80)) === 2)
    // a run of stray leads counts each
    assert(Utf8Data.invalidBytes(bytes(0xC3, 0xC3, 0xC3)) === 3)
    // orphan continuation bytes count each
    assert(Utf8Data.invalidBytes(bytes(0x80, 0xBF)) === 2)
    // overlong encoding: C0 80 is never legal — lead rejected, then the
    // continuation is an orphan
    assert(Utf8Data.invalidBytes(bytes(0xC0, 0x80)) === 2)
    assert(Utf8Data.invalidBytes(bytes(0xC1, 0xBF)) === 2)
    // surrogate code point ED A0 80 (U+D800): first continuation out of
    // ED's 80-9F window → lead + two orphans
    assert(Utf8Data.invalidBytes(bytes(0xED, 0xA0, 0x80)) === 3)
    // above U+10FFFF: F4 90 outside F4's 80-8F window
    assert(Utf8Data.invalidBytes(bytes(0xF4, 0x90, 0x80, 0x80)) === 4)
    // F5-FF are never leads
    assert(Utf8Data.invalidBytes(bytes(0xF5, 0xFE, 0xFF)) === 3)
    // damage embedded in clean text counts only the damage
    val mixed = "ok ".getBytes("UTF-8") ++ bytes(0xC3) ++
      " fine é".getBytes("UTF-8")
    assert(Utf8Data.invalidBytes(mixed) === 1)
  }

  test("utf8InvalidBytes column = the static table, codegen path") {
    import spark.implicits._
    val df = Seq(
      ("clean", "héllo".getBytes("UTF-8")),
      ("trunc", "caf".getBytes("UTF-8") ++ bytes(0xC3)),
      ("orphans", bytes(0x80, 0x80, 0x41)))
      .toDF("name", "payload")
    val got = df.select(col("name"),
      TextAnalysis.utf8InvalidBytes(col("payload")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map("clean" -> 0, "trunc" -> 1, "orphans" -> 2))
  }

  private def repair(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(TextAnalysis.mojibakeRepair(col("t"))).head().getString(0)
  }

  private def score(s: String): Int = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(TextAnalysis.mojibakeScore(col("t"))).head().getInt(0)
  }

  /** The upstream failure this stage undoes: UTF-8 bytes read back one
    * char per byte through cp1252 (latin1 + the 27 glyph remaps). */
  private def corrupt(clean: String): String = {
    val b = clean.getBytes("UTF-8")
    val cp1252 = Map(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ',
      0x84 -> '„', 0x85 -> '…', 0x86 -> '†',
      0x87 -> '‡', 0x88 -> 'ˆ', 0x89 -> '‰',
      0x8a -> 'Š', 0x8b -> '‹', 0x8c -> 'Œ',
      0x8e -> 'Ž', 0x91 -> '‘', 0x92 -> '’',
      0x93 -> '“', 0x94 -> '”', 0x95 -> '•',
      0x96 -> '–', 0x97 -> '—', 0x98 -> '˜',
      0x99 -> '™', 0x9a -> 'š', 0x9b -> '›',
      0x9c -> 'œ', 0x9e -> 'ž', 0x9f -> 'Ÿ')
    b.map { x =>
      val u = x & 0xff
      cp1252.getOrElse(u, u.toChar)
    }.mkString
  }

  test("mojibakeRepair undoes the cp1252 double encoding exactly") {
    // the curly-quote class (3-byte sequences through cp1252 glyphs)
    val quotes = "it’s “fine” — really…"
    assert(corrupt(quotes) !== quotes)
    assert(repair(corrupt(quotes)) === quotes)
    // the latin1 accent class (2-byte sequences)
    val accents = "Café nº über straße"
    assert(repair(corrupt(accents)) === accents)
    // euro sign: 3-byte lead E2 + cp1252 glyphs in both continuations
    assert(repair(corrupt("price €5")) === "price €5")
    // signatures count one per damaged char
    assert(score(corrupt("éü")) === 2)
    assert(score(corrupt("…")) === 1)
  }

  test("mojibakeRepair passthrough: clean text is untouched, repair is idempotent") {
    // plain ASCII and genuine accents are no-ops (no signature)
    assert(repair("plain ascii text") === "plain ascii text")
    val clean = "Café straße résumé"
    assert(score(clean) === 0)
    assert(repair(clean) === clean)
    // genuine CJK/emoji (not latin1-representable) passes through even
    // if a stray signature-shaped pair existed elsewhere
    val cjk = "Ã© 日本語"
    assert(repair(cjk) === cjk)
    // a signature whose recovered bytes do NOT decode (Â° ok, stray Ã
    // truncated) must pass through rather than half-repair
    val unrepairable = "Â°Ã"
    assert(score(unrepairable) >= 1)
    assert(repair(unrepairable) === unrepairable)
    // idempotence on the repaired output
    val q = corrupt("it’s — fine…")
    assert(repair(repair(q)) === repair(q))
  }
}
