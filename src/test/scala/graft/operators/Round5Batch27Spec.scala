package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 27. */
class Round5Batch27Spec extends SparkSpec {

  private def revenues: Array[Double] =
    graft.Tables(spark, sf("sf0.001")).orders
      .groupBy("o_custkey").agg(sum("o_totalprice").as("rev"))
      .collect().map(r => BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble).sorted

  test("lorenz deciles: matches direct sorted cumulative shares") {
    val xs = revenues
    val n = xs.length
    val total = xs.sum
    val cum = xs.scanLeft(0.0)(_ + _).drop(1)
    val got = Registry.byName("a96_lorenz_deciles")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("boundary_rank"),
        r.getAs[Double]("cum_share"))).sortBy(_._1)
    assert(got.length == 10)
    got.foreach { case (k, b, share) =>
      assert(b == k * n / 10, s"decile $k boundary")
      val expected = if (b == 0) 0.0 else cum(b.toInt - 1) / total
      assert(math.abs(share - expected) < 1e-5,
        s"decile $k: got $share expected $expected")
    }
    // Lorenz curve is convex increasing, ends at 1
    assert(got.map(_._3).sliding(2).forall { case Array(a, b) => a <= b })
    assert(math.abs(got.last._3 - 1.0) < 1e-9)
  }

  test("gumbel: matches direct block-maxima MoM fit") {
    val maxima = graft.Tables(spark, sf("sf0.001")).orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("y"))
      .groupBy(trunc(col("day"), "month")).agg(max("y").as("ymax"))
      .collect().map(_.getLong(1).toDouble)
    val n = maxima.length
    val m = maxima.sum / n
    val s2 = maxima.map(y => (y - m) * (y - m)).sum / (n - 1)
    val beta = math.sqrt(s2) * math.sqrt(6.0) / math.Pi
    val mu = m - 0.5772156649015329 * beta
    val mx = maxima.max
    val p = 1.0 - math.exp(-math.exp(-((mx - mu) / beta)))
    val got = Registry.byName("w29_gumbel_maxima")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n_months") == n)
    assert(math.abs(got.getAs[Double]("mu") - mu) < 1e-4)
    assert(math.abs(got.getAs[Double]("beta") - beta) < 1e-4)
    assert(got.getAs[Long]("observed_max") == mx.toLong)
    assert(math.abs(got.getAs[Double]("p_exceed_max") - p) < 1e-5)
    assert(p > 0.0 && p < 1.0)
  }

  test("eb shrinkage: posteriors shrink toward the prior mean") {
    val counts = graft.Tables(spark, sf("sf0.001")).orders
      .groupBy("o_custkey").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val xs = counts.map(_._2.toDouble)
    val n = xs.length
    val m = xs.sum / n
    val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
    assert(v > m, "fixture must be overdispersed for gamma-Poisson MoM")
    val beta = m / (v - m); val alpha = m * beta
    val got = Registry.byName("a92_eb_shrinkage")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("x"),
        r.getAs[Double]("posterior_mean")))
    assert(got.nonEmpty && got.forall(_._1 <= 20))
    got.foreach { case (k, x, post) =>
      val expected = (x + alpha) / (1.0 + beta)
      assert(math.abs(post - expected) < 1e-5, s"cust $k")
      // shrinkage: posterior sits strictly between x and the prior mean
      val lo = math.min(x.toDouble, m); val hi = math.max(x.toDouble, m)
      assert(post >= lo - 1e-9 && post <= hi + 1e-9,
        s"cust $k: $post outside [$lo, $hi]")
    }
  }
}
