package graft.operators

import graft.SparkSpec

/** Poisson-bootstrap invariants pinned on constructed order tables. */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def ordersDir(rows: Seq[(Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("boot").toString
    rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("degenerate corpus: every replicate mean equals the constant") {
    // all prices identical → every weighted mean is exactly the price,
    // so the CI collapses onto the point estimate
    val dir = ordersDir((1L to 400L).map(i => (i, "1-URGENT", 123.45)))
    val r = graft.Registry.byName("a36_poisson_bootstrap_ci")
      .run(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 400L)
    // 123.45 dollars = 123450 milli
    assert(row.getLong(2) == 123450L, s"point ${row.getLong(2)}")
    assert(row.getLong(3) == 123450L && row.getLong(4) == 123450L)
  }

  test("varied corpus: CI brackets the point estimate and is proper") {
    val dir = ordersDir((1L to 500L).map(i =>
      (i, if (i % 2 == 0) "A" else "B", 100.0 + (i % 97))))
    val rows = graft.Registry.byName("a36_poisson_bootstrap_ci")
      .run(spark, dir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (point, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo < hi, s"degenerate CI [$lo, $hi]")
      assert(lo <= point && point <= hi,
        s"point $point outside CI [$lo, $hi]")
      // ±97/2 value spread over n=250 → bootstrap SE ≈ 28/√250 ≈ 1.8;
      // the 95% CI must be a few SE wide, not absurd
      assert(hi - lo < 20000L, s"CI too wide: ${hi - lo} milli")
    }
  }

  test("weights are a unit-mean distribution over the hash range") {
    // expected weight from the inverse-CDF thresholds themselves:
    // Σ k · P(w = k) must round-trip to ~1.0 (the Poisson(1) mean)
    val t = Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L,
      999917L, 1000000L)
    val probs = t.zip(0L +: t).map { case (hi, lo) => (hi - lo) / 1e6 }
    assert(math.abs(probs.sum - 1.0) < 1e-9)
    val ev = probs.zipWithIndex.map { case (p, k) => p * k }.sum
    assert(math.abs(ev - 1.0) < 2e-3, s"E[w] = $ev")
  }
}
