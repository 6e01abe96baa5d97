package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 24. */
class Round5Batch24Spec extends SparkSpec {

  private def values: Array[Double] =
    graft.Tables(spark, sf("sf0.001")).events
      .select(col("value")).collect().map(_.getDouble(0))

  test("jarque-bera: matches direct moment recompute") {
    val xs = values
    val n = xs.length.toDouble
    val mu = xs.sum / n
    val m2 = xs.map(x => math.pow(x - mu, 2)).sum / n
    val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
    val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
    val skew = m3 / (m2 * math.sqrt(m2))
    val exk = m4 / (m2 * m2) - 3.0
    val jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    val got = Registry.byName("a88_jarque_bera")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n") == xs.length)
    assert(math.abs(got.getAs[Double]("skewness") - skew) < 1e-4)
    assert(math.abs(got.getAs[Double]("ex_kurtosis") - exk) < 1e-4)
    assert(math.abs(got.getAs[Double]("jb") - jb) / math.max(jb, 1.0) < 1e-3)
  }

  test("bartlett: matches direct recompute over event_type groups") {
    val rows = graft.Tables(spark, sf("sf0.001")).events
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val groups = rows.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val k = groups.size
    val nn = rows.length
    def variance(g: Array[Double]): Double = {
      val m = g.sum / g.length
      g.map(x => (x - m) * (x - m)).sum / (g.length - 1)
    }
    val sp2 = groups.map(g => (g.length - 1) * variance(g.toArray)).sum /
      (nn - k).toDouble
    val sln = groups.map(g =>
      (g.length - 1) * math.log(variance(g.toArray))).sum
    val sinv = groups.map(g => 1.0 / (g.length - 1)).sum
    val c = 1.0 + (sinv - 1.0 / (nn - k)) / (3.0 * (k - 1))
    val chi2 = ((nn - k) * math.log(sp2) - sln) / c
    val got = Registry.byName("a89_bartlett_test")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n") == nn && got.getAs[Long]("k") == k)
    assert(math.abs(got.getAs[Double]("chi2") - chi2) / chi2 < 1e-6,
      s"got=${got.getAs[Double]("chi2")} expected=$chi2")
    assert(math.abs(got.getAs[Double]("c") - c) < 1e-9)
  }

  test("durbin-watson: matches direct OLS residual recompute") {
    val daily = graft.Tables(spark, sf("sf0.001")).orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("y")).orderBy("day")
      .collect().map(_.getLong(1).toDouble)
    val n = daily.length
    val xs = (1 to n).map(_.toDouble)
    val sx = xs.sum; val sy = daily.sum
    val sxy = xs.zip(daily).map { case (a, b) => a * b }.sum
    val sxx = xs.map(x => x * x).sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val e = xs.zip(daily).map { case (x, y) => y - (a + b * x) }
    val dw = e.sliding(2).map { case Seq(p, q) => (q - p) * (q - p) }.sum /
      e.map(v => v * v).sum
    val got = Registry.byName("w28_durbin_watson")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("slope") - b) < 1e-5)
    assert(math.abs(got.getAs[Double]("dw") - dw) < 1e-5,
      s"got=${got.getAs[Double]("dw")} expected=$dw")
    // no-autocorrelation null centers DW at 2; sanity band
    assert(got.getAs[Double]("dw") > 0.0 && got.getAs[Double]("dw") < 4.0)
  }

  test("good-turing: mass conservation and gap handling") {
    val rows = Registry.byName("t_good_turing")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("r"), r.getAs[Long]("n_r"),
        r.getAs[Double]("r_star"), r.getAs[Double]("p_gt")))
    assert(rows.nonEmpty)
    val byR = rows.map(t => t._1 -> t).toMap
    val nn = rows.map(t => t._1 * t._2).sum.toDouble
    rows.foreach { case (r, nr, rstar, pgt) =>
      byR.get(r + 1) match {
        case Some((_, nr2, _, _)) =>
          val expected = (r + 1).toDouble * nr2 / nr
          assert(math.abs(rstar - expected) < 1e-5, s"r=$r")
          assert(math.abs(pgt - rstar / nn) < 1e-9)
        case None => // gap or max r: adjusted count must be 0
          assert(rstar == 0.0, s"r=$r had no r+1 stratum but r_star=$rstar")
      }
    }
    // GT redistributes mass downward: total adjusted mass < 1
    val mass = rows.map { case (_, nr, _, pgt) => nr * pgt }.sum
    assert(mass > 0.0 && mass < 1.0, s"mass=$mass")
  }
}
