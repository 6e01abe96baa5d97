package graft.dedup

import graft.SparkSpec

/** Link prediction on a basket fixture where the wedge truth is exact. */
class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  test("predicts exactly the non-adjacent wedge pair, exact jaccard") {
    // baskets: (A,B) ×2 and (B,C) ×2 → pruned edges A–B, B–C; the only
    // prediction is (A,C) through B: cn=1, deg A=1, deg C=1 → J=1
    val li = Seq(
      (1L, 101L), (1L, 102L), (2L, 101L), (2L, 102L),
      (3L, 102L), (3L, 103L), (4L, 102L), (4L, 103L),
      // a once-only pair (A,D) must be pruned by weight >= 2
      (5L, 101L), (5L, 104L),
    ).toDF("l_orderkey", "l_partkey")
    val got = LinkPrediction.predict(li).collect()
    assert(got.length == 1, got.mkString(";"))
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == ((101L, 103L)))
    assert(r.getLong(2) == 1L) // cn through 102
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L)
    assert(r.getLong(5) == 1000000L)
  }
}
