package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 41. */
class Round5Batch41Spec extends SparkSpec {

  test("interrupted time series: matches direct two-segment OLS") {
    val daily = graft.Tables(spark, sf("sf0.001")).orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("y")).orderBy("day")
      .collect().map(_.getLong(1).toDouble)
    val n = daily.length
    val brk = n / 2
    def fit(pts: Seq[(Double, Double)]): (Double, Double) = {
      val m = pts.length
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val b = (m * sxy - sx * sy) / (m * sxx - sx * sx)
      ((sy - b * sx) / m, b)
    }
    val pts = daily.zipWithIndex.map { case (y, i) => ((i + 1).toDouble, y) }
    val (a0, b0) = fit(pts.filter(_._1 <= brk).toSeq)
    val (a1, b1) = fit(pts.filter(_._1 > brk).toSeq)
    val got = Registry.byName("w34_interrupted_time_series")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("breakpoint_t") == brk)
    assert(math.abs(got.getAs[Double]("slope_pre") - b0) < 1e-4)
    assert(math.abs(got.getAs[Double]("slope_post") - b1) < 1e-4)
    assert(math.abs(got.getAs[Double]("slope_change") - (b1 - b0)) < 1e-4)
    val lvl = (a1 + b1 * (brk + 1)) - (a0 + b0 * (brk + 1))
    assert(math.abs(got.getAs[Double]("level_change") - lvl) < 1e-3,
      s"got=${got.getAs[Double]("level_change")} expected=$lvl")
  }

  test("generalization ladder: suppression falls monotonically with level") {
    val got = Registry.byName("p17_generalization_ladder")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("n_groups"),
        r.getAs[Long]("min_group"), r.getAs[Long]("suppressed_ppm")))
      .sortBy(_._1)
    assert(got.length == 4)
    // coarser levels => fewer groups, bigger minimum, less suppression
    got.sliding(2).foreach {
      case Array((_, g1, _, s1), (_, g2, _, s2)) =>
        assert(g2 <= g1, "group count must shrink as QI coarsens")
        assert(s2 <= s1, "suppression cost must fall as QI coarsens")
      case _ =>
    }
    // the fully-suppressed level has |segments| groups and zero suppression
    val top = got.last
    assert(top._2 == 5 && top._4 == 0L,
      s"level 3 should collapse to the 5 segments: $top")
    // the raw level (full phone) is hopeless: everything suppressed
    assert(got.head._4 == 1000000L)
  }
}
