package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design (100 TB): brute-force cosine is the exact baseline — a
  * broadcast of the query vector against a scan, no shuffle, fully
  * codegen'd higher-order expressions. The scale path is LSH bucketing
  * (random hyperplane signs): vectors shuffle once on a 16-bit bucket key
  * and only bucket-local (plus near-bucket multi-probe) candidates pay the
  * exact cosine. All arithmetic is double-precision regardless of the
  * float32 storage type, and scores are rounded before any order-by/limit
  * so the top-k cut is deterministic.
  */
object Similarity {

  /** Double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Double-precision L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against the embedding of `queryId`. The single
    * query row broadcasts; `orderBy(limit)` compiles to
    * TakeOrderedAndProject (no global sort materialization). Rounded to 6
    * decimals before ranking, vec_id tie-break. */
  def cosineTopK(emb: DataFrame, queryId: Long, kTop: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(kTop)
  }

  /** Exact all-pairs above a cosine threshold. Quadratic by construction —
    * the exact baseline for verifying the LSH path; at scale use
    * [[lshCosinePairs]]. The theta self-join executes as a broadcast
    * nested-loop at test scale; for larger exact runs, block on coarse
    * norm/quantization keys first. */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"), round(cosine(col("ea"), col("eb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Fixed random hyperplanes (seeded, deterministic) for sign-LSH. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Banded sign-LSH, same amplification idea as MinHash banding: `tables`
    * independent bucket tables of `planesPerTable` sign bits each. A pair is
    * a candidate if it collides in ANY table: recall ≈ 1−(1−p^r)^b with
    * p = 1 − θ/π. At cosine 0.4 with r=4, b=8 that's ≈ 0.75 — tunable via
    * the two knobs; a single wide bucket (e.g. 16 bits) has ~zero recall at
    * mid cosine and exists only for near-duplicate vectors. */
  val tables = 8
  val planesPerTable = 4

  /** Exploded (vec_id, table, bucket) rows: one row per bucket table. */
  def lshBands(emb: DataFrame, dim: Int): DataFrame = {
    val planes = hyperplanes(tables * planesPerTable, dim)
    val bandCols = (0 until tables).map { t =>
      val bucket = (0 until planesPerTable).foldLeft(lit(0)) { (acc, j) =>
        acc + when(dot(col("embedding"), typedLit(planes(t * planesPerTable + j))) > 0,
          lit(1 << j)).otherwise(lit(0))
      }
      struct(lit(t).as("t"), bucket.as("bucket"))
    }
    emb.select(col("vec_id"), col("embedding"),
        explode(array(bandCols: _*)).as("tb"))
      .select(col("vec_id"), col("embedding"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
  }

  /** Approximate near-pairs: candidates collide in ≥1 LSH bucket table
    * (equi-join on (table, bucket) — never all-pairs), then exact cosine
    * verification. Recall < 1 by construction; the exact companion query is
    * the baseline for measuring it. */
  def lshCosinePairs(emb: DataFrame, threshold: Double, dim: Int = 64): DataFrame = {
    val bands = lshBands(emb, dim)
    val a = bands.select(col("vec_id").as("ia"), col("embedding").as("ea"),
      col("t"), col("bucket"))
    val b = bands.select(col("vec_id").as("ib"), col("embedding").as("eb"),
      col("t").as("t_b"), col("bucket").as("bucket_b"))
    a.join(b, col("t") === col("t_b") && col("bucket") === col("bucket_b") &&
        col("ia") < col("ib"))
      .select(col("ia"), col("ib"), col("ea"), col("eb"))
      .dropDuplicates("ia", "ib")
      .select(col("ia"), col("ib"), round(cosine(col("ea"), col("eb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Approximate top-k for one query: candidates share ≥1 bucket table with
    * the query (broadcast semi-join on (table, bucket)), exact cosine on the
    * candidates only. */
  def lshTopK(emb: DataFrame, queryId: Long, kTop: Int, dim: Int = 64): DataFrame = {
    val bands = lshBands(emb, dim)
    val qBands = bands.filter(col("vec_id") === queryId)
      .select(col("t").as("qt"), col("bucket").as("qbucket"))
    val qVec = emb.filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    bands.filter(col("vec_id") =!= queryId)
      .join(broadcast(qBands), col("t") === col("qt") && col("bucket") === col("qbucket"), "left_semi")
      .select(col("vec_id"), col("embedding"))
      .dropDuplicates("vec_id")
      .crossJoin(broadcast(qVec))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(kTop)
  }
}
