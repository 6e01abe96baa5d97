package graft.dedup

import graft.SparkSpec

/** Correctness of the large-star/small-star loop on hand-computable
  * graphs (chains stress O(log n) convergence; stars, forests, isolated
  * nodes cover the contract edges).
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)],
      nodes: Option[Seq[Long]] = None): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    val n = nodes.map(_.toDF("id"))
    ConnectedComponents.run(e, n).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("single chain collapses to min label") {
    val got = cc((1L to 9L).sliding(2).map(s => (s(1), s.head)).toSeq)
    assert(got == (1L to 9L).map(_ -> 1L).toMap)
  }

  test("two components stay separate") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("star graph, self-loops and duplicate edges tolerated") {
    val got = cc(Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 5L), (5L, 1L), (1L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("isolated nodes from the node universe become singletons") {
    val got = cc(Seq((1L, 2L)), Some(Seq(1L, 2L, 7L, 8L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 8L))
  }

  test("long chain (diameter 63) converges within iteration budget") {
    val got = cc((100L to 163L).sliding(2).map(s => (s.head, s(1))).toSeq)
    assert(got.values.toSet == Set(100L))
  }
}
