package graft.dedup

import graft.SparkSpec

/** Brandes dependency on a diamond — the σ-weighted split the chain
  * oracle cannot exercise — plus seed exclusion and depth truncation.
  */
class BetweennessSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
      depth: Int = Betweenness.MaxDepth): Map[Long, Long] =
    Betweenness.sampled(edges.toDF("src", "dst"),
        seeds.toDF("id"), depth)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("diamond: path counts split the dependency correctly") {
    // s(0) → a(1), b(2) → t(3) → x(4): σ(t)=2, σ(x)=2
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val got = run(edges, Seq(0L))
    // real Brandes: δ(a)=δ(b)=(1/2)(1+δ(t)), δ(t)=(2/2)(1+0)=1 → all 1
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L,
      4L -> 0L))
  }

  test("seed never appears in the output") {
    val got = run(Seq((0L, 1L), (1L, 2L)), Seq(0L))
    assert(!got.contains(0L))
    assert(got == Map(1L -> 1000000L, 2L -> 0L))
  }

  test("depth truncation: nodes beyond maxDepth are unreached") {
    val chain = (0L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = run(chain, Seq(0L), depth = 3)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == 2000000L && got(2L) == 1000000L && got(3L) == 0L)
  }

  test("two seeds accumulate") {
    // path 0-1-2, seeds at both ends: node 1 brokers for both
    val got = run(Seq((0L, 1L), (1L, 2L)), Seq(0L, 2L))
    // from seed 0: δ(1)=1, δ(2)=0; from seed 2: δ(1)=1, δ(0)=0
    assert(got == Map(0L -> 0L, 1L -> 2000000L, 2L -> 0L))
  }
}
