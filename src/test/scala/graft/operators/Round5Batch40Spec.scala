package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 40. */
class Round5Batch40Spec extends SparkSpec {

  test("meta-analysis: matches direct inverse-variance pooling") {
    val rows = graft.Tables(spark, sf("sf0.001")).events
      .select(col("event_type"), (col("user_id") % 2).as("arm"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val segs = rows.groupBy(_._1).map { case (k, vs) =>
      def arm(a: Long) = vs.filter(_._2 == a).map(_._3)
      def mv(xs: Array[Double]) = {
        val m = xs.sum / xs.length
        (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1), xs.length)
      }
      val (m0, v0, n0) = mv(arm(0)); val (m1, v1, n1) = mv(arm(1))
      (k, m1 - m0, v0 / n0 + v1 / n1)
    }.toSeq
    val k = segs.size
    val sw = segs.map(s => 1.0 / s._3).sum
    val swd = segs.map(s => s._2 / s._3).sum
    val swdd = segs.map(s => s._2 * s._2 / s._3).sum
    val pooled = swd / sw
    val qh = swdd - swd * swd / sw
    val i2 = math.max(0.0, (qh - (k - 1)) / qh)
    val got = Registry.byName("a100_meta_analysis")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("k") == k)
    assert(math.abs(got.getAs[Double]("pooled_effect") - pooled) < 1e-4)
    assert(math.abs(got.getAs[Double]("pooled_se") - 1.0 / math.sqrt(sw))
      < 1e-5)
    assert(math.abs(got.getAs[Double]("q_het") - qh) < 1e-3)
    assert(math.abs(got.getAs[Double]("i2") - i2) < 1e-3)
    assert(got.getAs[Double]("i2") >= 0.0 && got.getAs[Double]("i2") < 1.0)
  }

  test("deseasonalized z-score: residual mean 0, flags only 3-sigma days") {
    val got = Registry.byName("w33_deseasonalized_zscore")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Double]("deseason"), r.getAs[Double]("z"),
        r.getAs[Boolean]("is_anomaly")))
    assert(got.nonEmpty)
    val zs = got.map(_._2)
    val zbar = zs.sum / zs.length
    assert(math.abs(zbar) < 1e-2, s"z mean $zbar")
    got.foreach { case (_, z, flag) =>
      assert(flag == (math.abs(z) > 3.0))
    }
    // the z sample variance should be ~1 by construction
    val zvar = zs.map(z => (z - zbar) * (z - zbar)).sum / (zs.length - 1)
    assert(math.abs(zvar - 1.0) < 0.05, s"z var $zvar")
  }
}
