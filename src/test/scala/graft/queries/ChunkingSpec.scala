package graft.queries

import graft.SparkSpec

/** The x22 chunking query against a Scala brute force on random documents:
  * contiguous 32-token windows at stride 24, chunk index carried, blank
  * docs excluded. */
class ChunkingSpec extends SparkSpec {

  test("x22 chunking equals brute force on random token lists") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docsSeq = (1L to 40L).map { id =>
      val n = rnd.nextInt(120) // includes 0 -> blank doc
      (id, (1 to n).map(i => s"t${rnd.nextInt(50)}").mkString(" "))
    }
    val expected = docsSeq.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) Nil
      else (0 until toks.length by 24).zipWithIndex.map { case (off, cno) =>
        (id, cno.toLong, toks.slice(off, off + 32).mkString(" "))
      }
    }.sorted

    val dir = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    docsSeq.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = ExtQueries.defs.find(_.name == "x22_chunking").get
      .fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
    assert(got === expected)
  }
}
