package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 26. */
class Round5Batch26Spec extends SparkSpec {

  test("capture-recapture: chapman estimate from direct flag recompute") {
    val o = graft.Tables(spark, sf("sf0.001")).orders
      .select(col("o_custkey"), col("o_orderdate").cast("date")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val lo = o.map(_._2).min
    val hi = o.map(_._2).max
    val mid = lo.plusDays(java.time.temporal.ChronoUnit.DAYS.between(lo, hi) / 2)
    val early = o.filter(_._2.isBefore(mid)).map(_._1).toSet
    val late = o.filterNot(_._2.isBefore(mid)).map(_._1).toSet
    val (n1, n2, m) = (early.size, late.size, (early intersect late).size)
    val nHat = (n1 + 1).toDouble * (n2 + 1) / (m + 1) - 1.0
    val got = Registry.byName("a94_capture_recapture")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n1") == n1 && got.getAs[Long]("n2") == n2 &&
      got.getAs[Long]("m") == m)
    assert(math.abs(got.getAs[Double]("n_hat") - nHat) < 1e-6)
    // estimate should bracket the true population reasonably
    val truth = o.map(_._1).distinct.length
    assert(math.abs(got.getAs[Double]("n_hat") - truth) / truth < 0.1)
  }

  test("dispersion index: matches direct daily-count recompute") {
    val daily = graft.Tables(spark, sf("sf0.001")).events
      .groupBy(col("ts").cast("date")).agg(count(lit(1)).as("y"))
      .collect().map(_.getLong(1).toDouble)
    val n = daily.length
    val mean = daily.sum / n
    val s2 = daily.map(y => (y - mean) * (y - mean)).sum / (n - 1)
    val got = Registry.byName("a91_dispersion_index")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("dispersion") - s2 / mean) < 1e-5)
    assert(math.abs(got.getAs[Double]("chi2") - (n - 1) * s2 / mean) < 1e-3)
  }

  test("elasticity: matches direct log-log OLS recompute") {
    val rows = graft.Tables(spark, sf("sf0.001")).lineitem
      .select(col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => (math.log(r.getDouble(0) / r.getDouble(1)),
        math.log(r.getDouble(1))))
    val n = rows.length.toDouble
    val su = rows.map(_._1).sum; val sv = rows.map(_._2).sum
    val suv = rows.map(t => t._1 * t._2).sum
    val suu = rows.map(t => t._1 * t._1).sum
    val svv = rows.map(t => t._2 * t._2).sum
    val b = (n * suv - su * sv) / (n * suu - su * su)
    val r2 = (n * suv - su * sv) * (n * suv - su * sv) /
      ((n * suu - su * su) * (n * svv - sv * sv))
    val got = Registry.byName("e_price_elasticity")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n") == rows.length)
    assert(math.abs(got.getAs[Double]("elasticity") - b) < 1e-4,
      s"got=${got.getAs[Double]("elasticity")} expected=$b")
    assert(math.abs(got.getAs[Double]("r2") - r2) < 1e-4)
    // demand curves slope down
    assert(got.getAs[Double]("elasticity") < 0.0)
  }

  test("negative sampling: probabilities sum to 1 and follow c^0.75") {
    val rows = Registry.byName("t_negative_sampling_table")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("c"), r.getAs[Double]("w"),
        r.getAs[Double]("p_neg")))
    assert(rows.nonEmpty)
    rows.foreach { case (c, w, _) =>
      assert(math.abs(w - math.pow(c.toDouble, 0.75)) < 1e-5, s"c=$c w=$w")
    }
    val mass = rows.map(_._3).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"mass=$mass")
    // damping: probability ratio grows slower than count ratio
    val sorted = rows.sortBy(_._1)
    val (cLo, _, pLo) = sorted.head
    val (cHi, _, pHi) = sorted.last
    if (cHi > cLo)
      assert(pHi / pLo < cHi.toDouble / cLo, "3/4 damping not applied")
  }
}
