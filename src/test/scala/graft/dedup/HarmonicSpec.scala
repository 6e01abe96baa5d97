package graft.dedup

import graft.SparkSpec

/** Harmonic centrality on a 5-node chain where every distance is known
  * in closed form.
  */
class HarmonicSpec extends SparkSpec {
  import spark.implicits._

  test("chain interior accumulates more harmonic mass than endpoints") {
    val dir = java.nio.file.Files.createTempDirectory("harm").toString
    (1 to 5).map(i => (i.toLong, 1, s"s$i"))
      .toDF("s_suppkey", "s_nationkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = graft.Registry.byName("d19_harmonic_centrality")
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact integer-unit truths on the 1—2—3—4—5 chain (radius 3):
    // node 3: 2/d1 + 2/d2 → 3,000,000; node 1: 1+1/2+1/3 → 1,833,333
    assert(got(3L) == 3000000L, s"mid: ${got(3L)}")
    assert(got(1L) == 1833333L && got(5L) == 1833333L, s"ends: $got")
    assert(got(2L) == 2833333L && got(4L) == 2833333L, s"near-ends: $got")
  }
}
