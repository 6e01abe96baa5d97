package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HyperBall invariants on a known graph. */
class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  test("path graph: N(r) grows by the true ball sizes, within HLL error") {
    // path 0-1-2-...-9: |ball(v,r)| = min(v,r) + min(9-v,r) + 1
    val edges = (0L to 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val nodes = (0L to 9L).toDF("id")
    val got = HyperBall.neighborhoodFunction(edges, nodes, rounds = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    def exactNf(r: Int): Double = (0 to 9).map(v =>
      math.min(v, r) + math.min(9 - v, r) + 1).sum.toDouble
    (0 to 3).foreach { r =>
      val e = exactNf(r)
      assert(math.abs(got(r) - e) / e < 0.15,
        s"r=$r approx ${got(r)} vs exact $e")
    }
    // the curve is monotone non-decreasing
    assert((0 to 2).forall(r => got(r) <= got(r + 1) + 1e-9))
  }

  test("disconnected cliques saturate at clique size") {
    // two disjoint triangles: every ball saturates at 3 by r=1
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L).toDF("id")
    val got = HyperBall.neighborhoodFunction(edges, nodes, rounds = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1) - 18.0) / 18.0 < 0.15)
    assert(math.abs(got(2) - got(1)) < 1e-9, "saturated: r=2 equals r=1")
  }
}
