package graft.dedup

import graft.SparkSpec

/** Modularity numerators on a hand graph where Q is known in closed
  * form, plus the ordering property the metric exists for: the true
  * community structure scores above a shuffled partition.
  */
class ModularitySpec extends SparkSpec {
  import spark.implicits._

  // two triangles {1,2,3} and {4,5,6} joined by the bridge 3-4: m = 7,
  // each triangle has e_c = 3 and degree sum 7
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))

  private def qnums(labels: Seq[(Long, Long)]): Map[Long, Long] = {
    Modularity.run(edges.toDF("a", "b"), labels.toDF("n", "community"))
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
  }

  test("two-triangle graph matches the closed-form numerators") {
    val got = qnums(Seq(1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, 5L -> 1L, 6L -> 1L))
    // q_num_c = 4m·e_c − d_c² = 4·7·3 − 49 = 35 per triangle;
    // Q = (35 + 35) / (4·49) = 5/14
    assert(got == Map(0L -> 35L, 1L -> 35L))
  }

  test("true communities beat a split that crosses the bridge") {
    val good = qnums(Seq(1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, 5L -> 1L, 6L -> 1L)).values.sum
    val bad = qnums(Seq(1L -> 0L, 2L -> 0L, 4L -> 0L,
      3L -> 1L, 5L -> 1L, 6L -> 1L)).values.sum
    assert(good > bad)
  }

  test("single community scores zero exactly") {
    // e_c = m and d_c = 2m ⇒ 4m·m − 4m² = 0
    val got = qnums((1L to 6L).map(_ -> 0L))
    assert(got == Map(0L -> 0L))
  }
}
