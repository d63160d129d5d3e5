package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  /** Local reference BPE: the Sennrich recurrence on an in-memory vocab —
    * independent of the DataFrame implementation under test. */
  private def localBpe(texts: Seq[String], n: Int): Seq[String] = {
    var vocab: Map[List[String], Long] = texts
      .flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (tok, c) => tok.map(_.toString).toList -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.nonEmpty) {
        val (p, _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a + " " + b) }
        out += s"${p._1} ${p._2}"
        def merge(syms: List[String]): List[String] = syms match {
          case a :: b :: rest if (a, b) == p => (a + b) :: merge(rest)
          case a :: rest => a :: merge(rest)
          case Nil => Nil
        }
        vocab = vocab.groupBy { case (syms, _) => merge(syms) }
          .view.mapValues(_.values.sum).toMap
      }
    }
    out.toSeq
  }

  test("train matches an independent local reference implementation") {
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val expected = localBpe(texts, 6)
    val got = Bpe.train(docs, "text", 6)
    assert(got === expected)
    // deterministic
    assert(Bpe.train(docs, "text", 6) === expected)
  }

  test("applyMerges merges left-to-right without crossing token boundaries") {
    import spark.implicits._
    val df = Seq("aaa ab", "ba ab").toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("toks"))
    // merge "a a": "aaa" = a a a -> (aa) a  (leftmost-first, non-overlap);
    // "ab" untouched; boundary between tokens never merges
    val merged = df.select(Bpe.applyMerges(col("toks"), Seq("a a")).as("m"))
      .collect().map(_.getString(0))
    assert(merged.toSeq === Seq("·aa· ·a· ·§· ·a· ·b·", "·b· ·a· ·§· ·a· ·b·"))
    val counts = df.select(Bpe.bpeTokenCount(col("toks"), Seq("a a")).as("n"))
      .collect().map(_.getInt(0))
    assert(counts.toSeq === Seq(4, 4))
  }

  test("merges are whole-symbol anchored: no fusing across symbol boundaries") {
    import spark.implicits._
    // crafted so iteration 1 learns (h,e) and iteration 2 learns (t,h):
    // "the" is then the symbol sequence [t, he], which contains NO (t,h)
    // adjacency — a naive unanchored string replace of "t h" would fuse
    // the standalone t with the h inside symbol "he", silently diverging
    // from reference BPE from iteration 2 on
    val text = (Seq.fill(10)("he") ++ Seq.fill(6)("th") ++ Seq("the")).mkString(" ")
    val docs = Seq(text).toDF("text")
    val expected = localBpe(Seq(text), 3)
    assert(expected === Seq("h e", "t h", "t he")) // the reference path
    assert(Bpe.train(docs, "text", 3) === expected)
    // and application: "the" under merges (h,e),(t,h) stays [t, he]
    val merged = spark.range(1)
      .select(Bpe.applyMerges(array(lit("the")), Seq("h e", "t h")).as("m"))
      .collect().head.getString(0)
    assert(merged === "·t· ·he·")
  }

  test("bpeTokenCount shrinks with more merges and floors at token count") {
    val toks = docs.filter(length(trim(col("text"))) > 0)
      .select(TextAnalysis.tokens(col("text")).as("toks"))
    val merges = Bpe.train(docs, "text", 6)
    val none = toks.select(sum(Bpe.bpeTokenCount(col("toks"), Nil)).as("s"))
      .collect().head.getLong(0)
    val some = toks.select(sum(Bpe.bpeTokenCount(col("toks"), merges)).as("s"))
      .collect().head.getLong(0)
    val words = toks.select(sum(size(col("toks"))).as("s"))
      .collect().head.getLong(0)
    assert(none > some, s"merges did not reduce token count: $none -> $some")
    assert(some >= words, "BPE tokens cannot drop below whole-word count")
  }

  test("trainWithCurve: type-table totals equal corpus-apply totals, non-increasing") {
    val (merges, curve) = Bpe.trainWithCurve(docs, "text", 4)
    assert(curve.length === merges.length + 1)
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a })
    // the |V|-row type-table totals the curve is built from must equal
    // what actually applying each merge prefix to every document counts —
    // the equality x126's engine-vs-oracle hash depends on
    val toks = docs.filter(length(trim(col("text"))) > 0)
      .select(TextAnalysis.tokens(col("text")).as("toks"))
    for (i <- 0 to merges.length) {
      val applied = toks
        .agg(sum(Bpe.bpeTokenCount(col("toks"), merges.take(i))))
        .head().getLong(0)
      assert(applied === curve(i), s"prefix $i")
    }
  }

  test("empty corpus and zero merges are total") {
    import spark.implicits._
    assert(Bpe.train(docs.filter(lit(false)), "text", 3) === Seq.empty)
    assert(Bpe.train(docs, "text", 0) === Seq.empty)
    // a blank doc (empty token array) counts ZERO BPE tokens, not a
    // phantom empty symbol
    val blank = Seq("").toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(Bpe.bpeTokenCount(col("toks"), Seq("a b")).as("n"))
      .collect().head.getInt(0)
    assert(blank === 0)
  }
}
