package graft.ops

import graft.SparkSpec

class DiscountedSpec extends SparkSpec {

  private def score(values: Seq[Double], discount: Double): Double = {
    import spark.implicits._
    val df = values.zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "seq", "v")
    Discounted.discountedMean(df, "k", Seq("seq"), "v", discount)
      .head().getDouble(1)
  }

  test("matches the closed form (newest weight 1, then d, d², …)") {
    // values in arrival order 10, 20, 30 (seq asc) => recency order 30,20,10
    val d = 0.5
    val expected = (30 * 1.0 + 20 * 0.5 + 10 * 0.25) / (1.0 + 0.5 + 0.25)
    assert(math.abs(score(Seq(10.0, 20.0, 30.0), d) - expected) < 1e-4)
  }

  test("discount=1 degenerates to the plain mean") {
    assert(math.abs(score(Seq(1.0, 2.0, 3.0, 4.0), 1.0) - 2.5) < 1e-9)
  }

  test("result lies within [min, max] of the inputs") {
    val r = score(Seq(5.0, 100.0, 7.0, 3.0), 0.9)
    assert(r >= 3.0 && r <= 100.0)
  }

  test("single value is returned as-is") {
    assert(score(Seq(7.5), 0.5) === 7.5)
  }
}
