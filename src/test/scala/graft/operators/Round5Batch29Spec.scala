package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 29. */
class Round5Batch29Spec extends SparkSpec {

  test("multiple testing: z/p/BH match a direct recompute") {
    val rows = graft.Tables(spark, sf("sf0.001")).events
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val n = rows.length
    val mu = rows.map(_._2).sum / n
    val sigma = math.sqrt(
      rows.map(t => (t._2 - mu) * (t._2 - mu)).sum / (n - 1))
    def phiTail(az: Double): Double = {
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val poly = ((((1.330274429 * t - 1.821255978) * t + 1.781477937) *
        t - 0.356563782) * t + 0.319381530) * t
      math.exp(-az * az / 2.0) * 0.3989422804014327 * poly
    }
    val groups = rows.groupBy(_._1).map { case (k, vs) =>
      val m = vs.map(_._2).sum / vs.length
      val z = (m - mu) * math.sqrt(vs.length.toDouble) / sigma
      (k, z, 2.0 * phiTail(math.abs(z)))
    }.toSeq
    val k = groups.size
    val sorted = groups.sortBy(g => (g._3, g._1))
    // BH step-up: adj_i = min_{j>=i} p_j * k / j, capped at 1
    val raw = sorted.zipWithIndex.map { case ((_, _, p), i) =>
      p * k / (i + 1) }
    val adj = raw.scanRight(Double.MaxValue)(math.min).init
      .map(math.min(_, 1.0))
    val expected = sorted.map(_._1).zip(adj).toMap
    val got = Registry.byName("a95_multiple_testing_fdr")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getAs[Double]("z"),
        r.getAs[Double]("p"), r.getAs[Double]("p_bh")))
    assert(got.length == k)
    got.foreach { case (et, z, p, pbh) =>
      val (_, ze, pe) = groups.find(_._1 == et).get
      assert(math.abs(z - ze) < 1e-5, s"$et z")
      assert(math.abs(p - pe) < 1e-8, s"$et p")
      assert(math.abs(pbh - expected(et)) < 1e-8, s"$et p_bh")
      assert(pbh >= p - 1e-12, s"$et BH must not shrink p")
    }
  }

  test("dow seasonality: matches direct ANOVA decomposition") {
    val daily = graft.Tables(spark, sf("sf0.001")).orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(dayofweek(col("day")).as("dow"), col("y"))
      .collect().map(r => (r.getInt(0), r.getLong(1).toDouble))
    val n = daily.length
    val s = daily.map(_._2).sum
    val q = daily.map(t => t._2 * t._2).sum
    val cell = daily.groupBy(_._1).values.map { g =>
      // mirror the engine's DECIMAL(30,0) per-term rounding
      math.rint(math.pow(g.map(_._2).sum, 2) / g.size)
    }.sum
    val ssb = cell - s * s / n
    val ssw = q - cell
    val strength = 1.0 - ssw / (q - s * s / n)
    val f = (ssb / 6.0) / (ssw / (n - 7))
    val got = Registry.byName("w30_dow_seasonality")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n_days") == n)
    assert(math.abs(got.getAs[Double]("strength") - strength) < 1e-4)
    assert(math.abs(got.getAs[Double]("f_stat") - f) / math.abs(f) < 1e-3)
    assert(got.getAs[Double]("strength") >= 0.0 &&
      got.getAs[Double]("strength") <= 1.0)
  }
}
