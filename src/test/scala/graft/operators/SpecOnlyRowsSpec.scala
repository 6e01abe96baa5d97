package graft.operators

import graft.{Registry, SparkEntry, SparkSpec}

/** Contract of the two spec-only registry rows (see [[graft.Q.specOnly]]):
  * each is approximate/engine-specific by design, each has a hash-green
  * replayable twin in the driver's dump, and each must hold its OWN
  * guarantee here — the spec IS the verification the oracle can't do.
  * (a16's ±2% HLL++ error bound is asserted in HeavyHittersSpec.)
  */
class SpecOnlyRowsSpec extends SparkSpec {

  test("spec-only rows are exactly {a16, p7}, each with its twin dumped") {
    val specOnly = Registry.all.filter(_.specOnly).map(_.name).toSet
    assert(specOnly == Set("a16_approx_distinct", "p7_bernoulli_sample"))
    // withdrawn from the driver surface…
    specOnly.foreach(n => assert(!SparkEntry.queries.contains(n)))
    // …but still runnable, and the replayable twins stay oracle-checked
    specOnly.foreach(n => assert(Registry.byName.contains(n)))
    Seq("a16b_hll_distinct", "p7b_deterministic_sample").foreach { t =>
      assert(SparkEntry.queries.contains(t) &&
        SparkEntry.oracleSql.contains(t), s"twin $t must stay dumped")
    }
  }

  test("p7 Bernoulli sample: seed-reproducible, unbiased, a true subset") {
    val run1 = Registry.byName("p7_bernoulli_sample")
      .run(spark, sf("sf0.01")).collect().map(_.getLong(0)).sorted
    val run2 = Registry.byName("p7_bernoulli_sample")
      .run(spark, sf("sf0.01")).collect().map(_.getLong(0)).sorted
    assert(run1.sameElements(run2), "seeded sample must replay bit-equal")
    val total = spark.read
      .parquet(sf("sf0.01") + "/orders.parquet").count()
    // Bernoulli(0.1): observed fraction within ±25% relative of nominal
    // (binomial σ at n=15k is ~0.25% absolute — this band is generous)
    val frac = run1.length.toDouble / total
    assert(frac > 0.075 && frac < 0.125, s"sample fraction $frac off 0.1")
    // a sample is a SUBSET: every sampled key exists in the base table
    val base = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(run1.forall(base.contains))
    assert(run1.distinct.length == run1.length, "without-replacement")
  }
}
