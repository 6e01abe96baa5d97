package graft.similarity

import graft.SparkSpec

/** Propagation semantics on a graph whose structure is known: two
  * dense clusters, one seed each, plus tie-break and isolation cases.
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def prop(edges: Seq[(Long, Long)],
      seeds: Seq[(Long, Option[Int], Boolean)]): Map[Long, Option[Int]] = {
    val e = edges.toDF("a", "b")
    val s = seeds.toDF("vec_id", "lbl", "is_seed")
    LabelPropagation.run(e, s).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
  }

  test("two clusters flood from their seeds; bridge ties break low") {
    // cliques {1,2,3} (seed 1 -> label 10) and {5,6,7} (seed 5 -> 20),
    // bridge node 4 adjacent to both cliques symmetrically
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (5L, 6L), (6L, 7L), (5L, 7L), (3L, 4L), (4L, 5L))
    val seeds = Seq(
      (1L, Some(10), true), (2L, None, false), (3L, None, false),
      (4L, None, false), (5L, Some(20), true), (6L, None, false),
      (7L, None, false))
    val got = prop(edges, seeds)
    assert(got(2L).contains(10) && got(3L).contains(10))
    assert(got(6L).contains(20) && got(7L).contains(20))
    // node 4 sees one vote of each label: tie breaks to the smaller
    assert(got(4L).contains(10))
    // seeds stay clamped
    assert(got(1L).contains(10) && got(5L).contains(20))
  }

  test("nodes with no labelled reachable neighbour stay null") {
    val got = prop(Seq((1L, 2L), (8L, 9L)),
      Seq((1L, Some(1), true), (2L, None, false),
        (8L, None, false), (9L, None, false)))
    assert(got(2L).contains(1))
    assert(got(8L).isEmpty && got(9L).isEmpty)
  }

  test("propagation is partition-independent") {
    val edges = (1L to 30L).sliding(2).map(s => (s.head, s(1))).toSeq
    val seeds = (1L to 30L).map(i =>
      (i, if (i == 1L) Some(7) else None, i == 1L))
    val e7 = edges.toDF("a", "b").repartition(7)
    val e2 = edges.toDF("a", "b").repartition(2)
    val s = seeds.toDF("vec_id", "lbl", "is_seed")
    val a = LabelPropagation.run(e7, s).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1))).sorted
    val b = LabelPropagation.run(e2, s).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1))).sorted
    assert(a.sameElements(b))
    // a chain seeded at one end labels exactly Rounds hops
    val labelled = a.filter(_._2 == 7).map(_._1).toSet
    assert(labelled == (1L to (1L + LabelPropagation.Rounds)).toSet)
  }
}
