package graft.dedup

import graft.{Registry, SparkSpec}

/** Invariants for the LSH threshold sweep. */
class LshSweepSpec extends SparkSpec {

  test("lsh sweep: recall rises and exact-pair count falls with threshold") {
    val got = Registry.byName("d24b_lsh_threshold_sweep")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("t_ppm"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_ppm")))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // monotonicity along the curve: raising the threshold can only
    // shrink the exact set and (weakly) raise banding recall on it
    got.sliding(2).foreach {
      case Array((_, e1, h1, r1), (_, e2, h2, r2)) =>
        assert(e2 <= e1, "exact pairs must shrink with threshold")
        assert(h2 <= h1, "hits cannot grow when the target set shrinks")
        assert(r2 >= r1, "banding recall improves on more-similar pairs")
      case _ =>
    }
    // the 0.8 row must agree with d24's single-point audit
    val d24 = Registry.byName("d24_lsh_recall_audit")
      .run(spark, sf("sf0.001")).collect().head
    val at08 = got.find(_._1 == 800000L).get
    assert(at08._2 == d24.getAs[Long]("n_exact"), "n_exact @0.8")
    assert(at08._3 == d24.getAs[Long]("n_hits"), "n_hits @0.8")
  }
}
