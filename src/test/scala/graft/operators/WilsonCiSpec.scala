package graft.operators

import graft.{Registry, SparkSpec}

/** Wilson interval properties: coverage shape at the regimes where the
  * Wald interval degenerates.
  */
class WilsonCiSpec extends SparkSpec {

  test("intervals bracket p_hat, stay in [0,1], and never collapse") {
    val rows = Registry.byName("a41_wilson_proportion_ci")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, n) = (r.getLong(1), r.getLong(2))
      val ph = r.getDouble(3)
      val (lo, hi) = (r.getDouble(4), r.getDouble(5))
      assert(ph == k.toDouble / n.toDouble)
      assert(lo >= 0.0 && hi <= 1.0 + 1e-12)
      assert(lo <= ph && ph <= hi)
      // Wilson never has zero width on finite n — the Wald failure mode
      assert(hi - lo > 0.0)
    }
  }

  test("extreme proportion: k = n gives a humble interval, not [1, 1]") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // replicate the formula on a tiny frame: 3/3 successes
    val k = 3.0; val n = 3.0; val z = 1.96
    val ph = k / n
    val denom = 1.0 + z * z / n
    val center = ph + z * z / (2.0 * n)
    val rad = z * math.sqrt(ph * (1.0 - ph) / n + z * z / (4.0 * n * n))
    val lo = (center - rad) / denom
    assert(lo < 0.5 && lo > 0.35) // ≈ 0.44: wide, as it should be
  }
}
