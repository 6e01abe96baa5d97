package graft.dedup

import graft.SparkSpec

/** Newman degree assortativity on graphs with known r. */
class AssortativitySpec extends SparkSpec {
  import spark.implicits._

  private def r(edges: Seq[(Long, Long)]): Option[Double] = {
    val row = Assortativity.run(edges.toDF("src", "dst")).collect().head
    if (row.isNullAt(1)) None else Some(row.getDouble(1))
  }

  test("star graph is perfectly disassortative: r = -1") {
    // hub 0 to leaves 1..5: every edge pairs deg 5 with deg 1
    val star = (1L to 5L).map(l => (0L, l))
    assert(r(star).contains(-1.0))
  }

  test("disjoint regular components of different degree: r = +1") {
    // triangle (all deg 2) + K4 (all deg 3): within every edge the
    // endpoint degrees are EQUAL, across components they differ → +1
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val k4 = (for {
      a <- 10L to 13L; b <- 10L to 13L if a < b
    } yield (a, b))
    assert(math.abs(r(tri ++ k4).get - 1.0) < 1e-12)
  }

  test("degree-regular graph has undefined r (NULL, not a crash)") {
    val k4 = (for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b))
    assert(r(k4).isEmpty)
  }

  test("edge count is the directed count") {
    val star = (1L to 5L).map(l => (0L, l))
    val row = Assortativity.run(star.toDF("src", "dst")).collect().head
    assert(row.getLong(0) == 10L)
  }
}
