package graft.dedup

import graft.SparkSpec

class ColoringSpec extends SparkSpec {
  import spark.implicits._

  private def color(edges: Seq[(Long, Long)], nodes: Seq[Long])
      : Map[Long, Long] =
    Coloring.run(edges.toDF("a", "b"), nodes.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("colorings are proper and greedy-minimal") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val got = color(edges, Seq(1L, 2L, 3L, 4L))
    // every node colors within 4 rounds on this graph
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    edges.foreach { case (a, b) => assert(got(a) != got(b)) }
    // the triangle needs 3 colors, node 4 reuses a low one
    assert(Set(got(1L), got(2L), got(3L)) == Set(1L, 2L, 3L))
    assert(got(4L) <= 2L)
  }

  test("an isolated node colors 1 in round one") {
    val got = Coloring.run(
      Seq.empty[(Long, Long)].toDF("a", "b"), Seq(9L).toDF("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((9L, 1L, 1)))
  }
}
