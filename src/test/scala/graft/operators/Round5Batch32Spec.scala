package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for batch 32. */
class Round5Batch32Spec extends SparkSpec {

  test("hll set ops: I-E estimates track the exact set algebra") {
    val got = Registry.byName("a97_hll_set_ops")
      .run(spark, sf("sf0.001")).collect().head
    val (ea, eb, eu, ei) = (got.getAs[Double]("approx_a"),
      got.getAs[Double]("approx_b"), got.getAs[Double]("approx_union"),
      got.getAs[Double]("approx_inter"))
    val (xa, xb, xu, xi) = (got.getAs[Long]("exact_a"),
      got.getAs[Long]("exact_b"), got.getAs[Long]("exact_union"),
      got.getAs[Long]("exact_inter"))
    // sanity of the exact algebra itself
    assert(xa + xb - xi == xu, "inclusion-exclusion must hold exactly")
    assert(xi > 0 && xi < math.min(xa, xb), "overlap must be partial")
    // 512 registers => ~4.6% standard error; allow 4 sigma
    def close(est: Double, exact: Long): Unit =
      assert(math.abs(est - exact) / exact < 0.20, s"$est vs $exact")
    close(ea, xa); close(eb, xb); close(eu, xu)
    // intersection inherits three estimates' error; just demand sane band
    assert(ei > 0.0 && math.abs(ei - xi) / xi < 0.5, s"$ei vs $xi")
    val j = got.getAs[Double]("approx_jaccard")
    assert(j > 0.0 && j < 1.0)
    // union estimate never below max of the parts
    assert(eu >= math.max(ea, eb) - 1e-9, "max-merge monotonicity")
  }
}
